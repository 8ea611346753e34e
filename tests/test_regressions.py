"""Regression cases ported from the reference's bugs.rs suite."""

import pytest

from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.types import SearchParams

from .utils import TestCollectionClient, TestContext


@pytest.fixture()
def ctx():
    c = TestContext()
    yield c
    c.close()


def test_numeric_string_field_searchable_and_filterable(ctx):
    """bugs.rs test_bug_1: a digits-only string value must stay a STRING
    field — fulltext-searchable by term AND string-enum filterable —
    including after commit + reload."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents([{"id": "4084278", "ec_order_id": "3235693"}])

    def check(client):
        out = client.search(
            {"term": "3235693", "properties": ["ec_order_id"]}
        )
        assert out.count == 1
        out = client.search(
            {"term": "", "where": {"ec_order_id": "3235693"}}
        )
        assert out.count == 1

    check(coll)
    ctx.commit_all()
    check(coll)
    ctx2 = ctx.reload()
    try:
        check(TestCollectionClient(
            ctx2, coll.collection_id, coll.write_key, coll.read_key
        ))
    finally:
        ctx2.orama.stop()


def test_commit_batch_size_one(tmp_path):
    """bugs.rs test_bug_2: a reader committing after EVERY op must not
    break ingestion or search."""
    cfg = OramacoreConfig()
    cfg.data_dir = str(tmp_path)
    cfg.auth.master_api_key = "mk"
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.insert_batch_commit_size = 1
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=False)
    try:
        coll = orama.write_side.create_collection("mk", "c")
        orama.write_side.create_index("c", coll.write_api_key, "main")
        orama.write_side.insert_documents(
            "c", "main", coll.write_api_key,
            [{"number": 55}, {"number": 42}],
        )
        orama.write_side.embedding_queue.flush_and_wait()
        orama.read_side.pump()
        out = orama.read_side.search(
            "c", coll.read_api_key,
            SearchParams.from_json({"term": "", "where": {"number": 42}}),
        )
        assert out.count == 1
    finally:
        orama.stop()
