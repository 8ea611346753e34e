"""Batch-get edge cases (reference tests/batch_get_documents.rs) and the
geo add/delete/commit/reload matrix (reference tests/geosearch.rs).
"""

import pytest

from .utils import TestContext, ids_of


@pytest.fixture()
def ctx():
    c = TestContext()
    yield c
    c.close()


def _batch_get(coll, ids):
    return coll.ctx.reader.batch_get_documents(coll.collection_id, coll.read_key, ids)


def test_batch_get_edge_cases(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "doc1", "title": "First"},
            {"id": "doc2", "title": "Second"},
            {"id": "doc3", "title": "Third"},
        ]
    )

    # success + multiple
    out = _batch_get(coll, ["doc1", "doc3"])
    assert set(out) == {"doc1", "doc3"}
    assert out["doc1"]["title"] == "First"

    # empty request
    assert _batch_get(coll, []) == {}

    # non-existent mixed in -> absent, not an error
    out = _batch_get(coll, ["doc2", "nope"])
    assert set(out) == {"doc2"}

    # all missing
    assert _batch_get(coll, ["x", "y"]) == {}

    # duplicates collapse (batch_get_documents.rs:144)
    out = _batch_get(coll, ["doc1", "doc1", "doc1"])
    assert list(out) == ["doc1"]

    # deleted docs are absent
    idx.delete_documents(["doc2"])
    out = _batch_get(coll, ["doc1", "doc2"])
    assert set(out) == {"doc1"}

    # after commit
    ctx.commit_all()
    out = _batch_get(coll, ["doc1", "doc3"])
    assert set(out) == {"doc1", "doc3"}


def test_batch_get_http_cap():
    """>1000 ids is a 400 (reference types.rs:707 validate)."""
    from .test_http_api import auth, create_coll

    import asyncio
    import tempfile

    from aiohttp.test_utils import TestClient, TestServer

    from oramacore_tpu.config import OramacoreConfig
    from oramacore_tpu.runtime import build_orama
    from oramacore_tpu.server import ApiServer

    async def run():
        with tempfile.TemporaryDirectory() as tmp:
            cfg = OramacoreConfig()
            cfg.data_dir = tmp
            cfg.auth.master_api_key = "test-master-key"
            orama = build_orama(cfg, sync_embeddings=True, start_consumer=True)
            server = ApiServer(cfg, orama.write_side, orama.read_side)
            tc = TestClient(TestServer(server.app))
            await tc.start_server()
            try:
                body = await create_coll(tc)
                resp = await tc.post(
                    "/v1/collections/c1/documents/batch-get",
                    json={"ids": [str(i) for i in range(1001)]},
                    headers=auth(body["read_api_key"]),
                )
                assert resp.status == 400
                out = await resp.json()
                assert "Maximum is 1000" in out["error"]
            finally:
                await tc.close()
                orama.stop()

    asyncio.run(run())


GEO_DOCS = [
    {"id": "milan", "name": "office", "loc": {"lat": 45.46, "lon": 9.19}},
    {"id": "rome", "name": "office", "loc": {"lat": 41.90, "lon": 12.49}},
]

NEAR_MILAN = {
    "where": {
        "loc": {
            "radius": {
                "coordinates": {"lat": 45.0, "lon": 9.0},
                "value": 100,
                "unit": "km",
            }
        }
    }
}


def _near_milan(coll):
    return coll.search({"term": "office", **NEAR_MILAN})


def test_geo_add_delete_search_no_commit(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(GEO_DOCS)
    assert ids_of(_near_milan(coll)) == ["milan"]
    idx.delete_documents(["milan"])
    assert ids_of(_near_milan(coll)) == []


def test_geo_add_delete_commit_reload_search(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(GEO_DOCS)
    idx.delete_documents(["milan"])
    ctx2 = ctx.reload()
    try:
        from oramacore_tpu.types import SearchParams

        out = ctx2.reader.search(
            coll.collection_id, coll.read_key,
            SearchParams.from_json({"term": "office", **NEAR_MILAN}),
        )
        assert ids_of(out) == []
        # rome still findable
        out = ctx2.reader.search(
            coll.collection_id, coll.read_key,
            SearchParams.from_json({"term": "office"}),
        )
        assert ids_of(out) == ["rome"]
    finally:
        ctx2.orama.stop()


def test_geo_add_commit_delete_search_no_commit(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(GEO_DOCS)
    ctx.commit_all()
    idx.delete_documents(["milan"])
    assert ids_of(_near_milan(coll)) == []


def test_geo_add_commit_delete_commit_reload_search(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(GEO_DOCS)
    ctx.commit_all()
    idx.delete_documents(["milan"])
    ctx2 = ctx.reload()
    try:
        from oramacore_tpu.types import SearchParams

        out = ctx2.reader.search(
            coll.collection_id, coll.read_key,
            SearchParams.from_json({"term": "office", **NEAR_MILAN}),
        )
        assert ids_of(out) == []
    finally:
        ctx2.orama.stop()


def test_geo_add_delete_add_again_search(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(GEO_DOCS)
    idx.delete_documents(["milan"])
    idx.insert_documents(
        [{"id": "milan", "name": "office", "loc": {"lat": 45.46, "lon": 9.19}}]
    )
    assert ids_of(_near_milan(coll)) == ["milan"]
