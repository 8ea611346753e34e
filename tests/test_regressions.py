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


def test_shared_executor_no_cross_collection_cache_collision(ctx):
    """Review finding: ReadSide's shared batch executor cached device
    slabs keyed on the index GENERATION alone — two collections whose
    indexes reach the same generation number reused each other's slab,
    scoring queries against the wrong corpus."""
    a = ctx.create_collection()
    a.create_index().insert_documents(
        [{"id": "a1", "t": "apple orchard harvest"}]
    )
    b = ctx.create_collection()
    b.create_index().insert_documents(
        [{"id": "b1", "t": "zebra savanna stripes"}]
    )
    from oramacore_tpu.types import SearchParams

    def batch(coll, term):
        return ctx.reader.search_batch(
            coll.collection_id, coll.read_key,
            [SearchParams.from_json({"term": term})],
        )[0]

    # interleave batches so the shared executor flips between indexes
    # with equal generations
    for _ in range(2):
        out_a = batch(a, "apple")
        assert [h.id.split(":", 1)[1] for h in out_a.hits] == ["a1"]
        out_b = batch(b, "zebra")
        assert [h.id.split(":", 1)[1] for h in out_b.hits] == ["b1"]
        assert batch(a, "zebra").count == 0
        assert batch(b, "apple").count == 0


def test_v1_doc_id_map_migration_survives_two_restarts(tmp_path):
    """Review finding: a legacy v1 info.json carries doc_id_map inline;
    loading marked it clean, so the first v2 commit dropped the map
    (never writing the per-index msgpack) and the SECOND restart lost
    upsert/delete-by-id semantics."""
    import json as _json
    import os
    import shutil

    from oramacore_tpu.config import OramacoreConfig
    from oramacore_tpu.runtime import build_orama
    from oramacore_tpu.types import SearchParams

    def cfg():
        c = OramacoreConfig()
        c.data_dir = str(tmp_path)
        c.auth.master_api_key = "mk"
        c.writer_side.insert_batch_commit_size = 10_000_000
        c.reader_side.insert_batch_commit_size = 10_000_000
        return c

    orama = build_orama(cfg(), sync_embeddings=True, start_consumer=False)
    coll = orama.write_side.create_collection("mk", "c")
    orama.write_side.create_index("c", coll.write_api_key, "main")
    orama.write_side.insert_documents(
        "c", "main", coll.write_api_key, [{"id": "x", "t": "original"}]
    )
    orama.write_side.commit()
    orama.read_side.pump()
    orama.read_side.commit(force=True)
    orama.stop()

    # rewrite the writer info.json as LEGACY v1: doc_id_map inline,
    # no per-index msgpack files
    info_path = os.path.join(str(tmp_path), "writer", "info.json")
    info = _json.load(open(info_path))
    for c in info["collections"].values():
        for idx in c["indexes"].values():
            idx["doc_id_map"] = {"x": 0}
    info.pop("v", None)
    _json.dump(info, open(info_path, "w"))
    shutil.rmtree(
        os.path.join(str(tmp_path), "writer", "doc_maps"),
        ignore_errors=True,
    )

    # restart 1: loads the inline map, commits (must WRITE the msgpack)
    orama = build_orama(cfg(), sync_embeddings=True, start_consumer=False)
    assert orama.write_side.collections["c"].indexes["main"].doc_id_map == {
        "x": 0
    }
    orama.write_side.commit()
    orama.stop()

    # restart 2: the map must still be there; an upsert REPLACES
    orama = build_orama(cfg(), sync_embeddings=True, start_consumer=False)
    try:
        idx = orama.write_side.collections["c"].indexes["main"]
        assert idx.doc_id_map == {"x": 0}
        stats = orama.write_side.insert_documents(
            "c", "main", coll.write_api_key, [{"id": "x", "t": "replaced"}]
        )
        assert stats.replaced == 1 and stats.inserted == 0
    finally:
        orama.stop()


def test_hook_fetch_blocks_private_targets_by_default():
    """Review finding: with no allowlist the brokered fetch proxied ANY
    url through the parent process — including loopback and the cloud
    metadata endpoint (SSRF). Private targets now require an explicit
    allowlist entry."""
    from oramacore_tpu.ai.hooks import HooksRuntime

    rt = HooksRuntime()
    assert not rt.domain_allowed("http://127.0.0.1:8080/v1/secrets")
    assert not rt.domain_allowed("http://localhost/admin")
    assert not rt.domain_allowed("http://169.254.169.254/latest/meta-data/")
    assert not rt.domain_allowed("http://10.0.0.5/internal")
    # explicit allowlisting opts in
    rt2 = HooksRuntime(allowed_domains=["127.0.0.1"])
    assert rt2.domain_allowed("http://127.0.0.1:9999/x")
    # public hostnames stay reachable with no allowlist (resolution
    # failures deny, so use a numeric public address)
    assert rt.domain_allowed("http://93.184.216.34/")  # example.com's IP


def test_device_lru_concurrent_mutation_safe():
    """Round-3 review finding: executor device caches are mutated from
    read-concurrent searches; DeviceLru must survive threaded
    get/put/evict storms without KeyError and keep its bound."""
    import threading

    from oramacore_tpu.index.search_exec import _MISS, DeviceLru

    lru = DeviceLru(4, group=lambda k: k[0])
    errors = []

    def worker(uid):
        try:
            for gen in range(300):
                key = (uid, gen)
                if lru.get(key) is _MISS:
                    lru.put(key, ("slab", uid, gen))
                for other in range(4):
                    lru.get((other, gen))  # hit/miss churn
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(u,)) for u in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
        assert not t.is_alive(), "DeviceLru worker deadlocked"
    assert not errors, errors[:1]
    assert len(lru._d) <= 4
    # stale-group purge: at most one generation survives per uid
    uids = [k[0] for k in lru._d]
    assert len(uids) == len(set(uids))


def test_impact_cap_logs_deprecation(caplog, tmp_path):
    """v3 doc-sorted ranges make impact_cap a lowest-doc-id cap; boot
    must warn loudly (config.ReaderSideConfig.impact_cap docs)."""
    import logging

    from oramacore_tpu.config import OramacoreConfig
    from oramacore_tpu.runtime import build_orama

    cfg = OramacoreConfig()
    cfg.data_dir = str(tmp_path)
    cfg.auth.master_api_key = "mk"
    cfg.reader_side.impact_cap = 8192
    with caplog.at_level(logging.WARNING, logger="oramacore_tpu.read"):
        orama = build_orama(cfg, sync_embeddings=True, start_consumer=False)
        orama.stop()
    assert any("impact_cap" in r.message and "DEPRECATED" in r.message
               for r in caplog.records)


def test_numeric_string_field_fulltext_and_filter_after_reload(tmp_path):
    """Reference bugs.rs test_bug_1: a digit-only string value (e.g. an
    order id) must stay a STRING field — term-searchable on its property
    AND usable as a string filter — including after commit + reload."""
    from tests.utils import TestContext

    ctx = TestContext(data_dir=str(tmp_path))
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(
            [{"id": "4084278", "ec_order_id": "3235693"}]
        )
        ctx.commit_all()
        ctx = ctx.reload()
        coll.ctx = ctx  # re-bind the fluent client to the reloaded pair
        out = coll.search(
            {"term": "3235693", "properties": ["ec_order_id"]}
        )
        assert out.count == 1
        out = coll.search({"term": "", "where": {"ec_order_id": "3235693"}})
        assert out.count == 1
    finally:
        ctx.close()


def test_commit_threshold_one_does_not_wedge(tmp_path):
    """Reference bugs.rs test_bug_2: insert_batch_commit_size=1 commits
    on every applied op without deadlocking or losing docs."""
    from tests.utils import TestContext

    ctx = TestContext(data_dir=str(tmp_path))
    try:
        ctx.config.reader_side.insert_batch_commit_size = 1
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([{"number": 55}, {"number": 42}])
        ctx.pump()
        out = coll.search({"term": "", "where": {"number": {"eq": 42}}})
        assert out.count == 1
    finally:
        ctx.close()
