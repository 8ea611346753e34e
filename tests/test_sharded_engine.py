"""Doc-id-sharded search WIRED INTO THE ENGINE (VERDICT r1 #2): the fused
fulltext path dispatches a shard_map step over an 8-device CPU mesh with
collective df/top-k, and results are identical to the single-device path
— including filters, thresholds, OMC, pagination, and the HTTP API.
"""

import asyncio
import tempfile

import numpy as np
import pytest

from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.types import SearchParams

MASTER = "mk"

DOCS = []
_rng = np.random.default_rng(7)
_WORDS = ["orange", "banana", "apple", "grape", "melon", "kiwi", "plum",
          "pear", "fig", "cherry"]
for i in range(200):
    words = _rng.choice(_WORDS, size=_rng.integers(2, 6))
    DOCS.append({
        "id": str(i),
        "t": " ".join(words.tolist()),
        "n": int(i % 7),
        "flag": bool(i % 3 == 0),
        "_omc": 2.0 if i % 31 == 0 else None,
    })
for d in DOCS:
    if d["_omc"] is None:
        d.pop("_omc")

QUERIES = [
    {"term": "orange banana"},
    {"term": "apple", "limit": 5},
    {"term": "grape melon", "offset": 3, "limit": 4},
    {"term": "kiwi plum", "threshold": 1.0},
    {"term": "cherry", "where": {"n": {"gt": 3}}},
    {"term": "fig pear", "where": {"flag": True}},
    {"term": "zz nothing"},
    # hybrid: the fused mesh step (BM25 + vector + global-span fusion)
    {"mode": "hybrid", "term": "orange banana", "similarity": 0.1},
    {"mode": "hybrid", "term": "kiwi plum cherry", "similarity": 0.0,
     "limit": 6},
    {"mode": "hybrid", "term": "melon", "similarity": 0.1,
     "where": {"n": {"lte": 3}}},
    # fused facets on the mesh (packed per-shard bitmaps)
    {"term": "orange",
     "facets": {"flag": {"true": True, "false": True}}},
    {"term": "apple banana", "where": {"n": {"lt": 5}},
     "facets": {"n": {"ranges": [{"from": 0, "to": 3},
                                 {"from": 3, "to": 7}]}}},
    # hybrid facets on the mesh (per-shard bitmap from the hybrid step)
    {"mode": "hybrid", "term": "orange banana", "similarity": 0.1,
     "facets": {"flag": {"true": True, "false": True}}},
    {"mode": "hybrid", "term": "apple", "similarity": 0.0,
     "where": {"n": {"lt": 5}},
     "facets": {"n": {"ranges": [{"from": 0, "to": 3},
                                 {"from": 3, "to": 7}]}}},
    # fused sort-by on the mesh (per-shard stable top-k + host merge)
    {"term": "orange banana", "limit": 12,
     "sort_by": {"property": "n", "order": "asc"}},
    {"term": "apple", "limit": 12, "where": {"flag": True},
     "sort_by": {"property": "n", "order": "desc"}},
    # vectorized match-all (presence mask) incl. sorted browse
    {"term": "", "limit": 15},
    {"term": "", "limit": 15, "where": {"n": {"gt": 2}}},
    {"term": "", "limit": 15,
     "facets": {"flag": {"true": True, "false": True}}},
    {"term": "", "limit": 15,
     "sort_by": {"property": "n", "order": "desc"}},
]


def _build(tmp, shards):
    cfg = OramacoreConfig()
    cfg.data_dir = tmp
    cfg.auth.master_api_key = MASTER
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.sharded_shards = shards
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=False)
    coll = orama.write_side.create_collection(MASTER, "c")
    orama.write_side.create_index("c", coll.write_api_key, "main")
    orama.write_side.insert_documents("c", "main", coll.write_api_key, DOCS)
    orama.write_side.embedding_queue.flush_and_wait()
    orama.read_side.pump()
    return orama, coll


def test_sharded_engine_matches_single_device():
    import jax

    assert len(jax.devices()) >= 8, "conftest provides 8 virtual devices"
    with tempfile.TemporaryDirectory() as t1, \
            tempfile.TemporaryDirectory() as t2:
        single, coll_s = _build(t1, 0)
        sharded, coll_m = _build(t2, 8)
        try:
            assert sharded.read_side.sharded_mesh is not None
            for q in QUERIES:
                p = SearchParams.from_json(dict(q))
                a = single.read_side.search("c", coll_s.read_api_key, p)
                p2 = SearchParams.from_json(dict(q))
                b = sharded.read_side.search("c", coll_m.read_api_key, p2)
                assert a.count == b.count, q
                assert [h.id for h in a.hits] == [h.id for h in b.hits], q
                for ha, hb in zip(a.hits, b.hits):
                    assert hb.score == pytest.approx(ha.score, rel=1e-4), q
                for f in (q.get("facets") or {}):
                    assert a.facets[f].values == b.facets[f].values, q
            # committed state too (searches span committed + live layers)
            single.read_side.commit(force=True)
            sharded.read_side.commit(force=True)
            for q in QUERIES:
                a = single.read_side.search(
                    "c", coll_s.read_api_key, SearchParams.from_json(dict(q))
                )
                b = sharded.read_side.search(
                    "c", coll_m.read_api_key, SearchParams.from_json(dict(q))
                )
                assert [h.id for h in a.hits] == [h.id for h in b.hits], q
        finally:
            single.stop()
            sharded.stop()


def test_sharded_engine_through_http_api():
    """insert -> commit -> search through the HTTP API on an 8-device
    mesh, results identical to the single-device engine."""
    from aiohttp.test_utils import TestClient, TestServer

    from oramacore_tpu.server import ApiServer

    async def run():
        with tempfile.TemporaryDirectory() as t1, \
                tempfile.TemporaryDirectory() as t2:
            single, coll_s = _build(t1, 0)
            sharded, coll_m = _build(t2, 8)
            single.read_side.commit(force=True)
            sharded.read_side.commit(force=True)
            srv = ApiServer(sharded.config, sharded.write_side,
                            sharded.read_side)
            tc = TestClient(TestServer(srv.app))
            await tc.start_server()
            try:
                for q in QUERIES:
                    resp = await tc.post(
                        "/v1/collections/c/search", json=dict(q),
                        headers={
                            "Authorization": f"Bearer {coll_m.read_api_key}"
                        },
                    )
                    assert resp.status == 200, await resp.text()
                    body = await resp.json()
                    ref = single.read_side.search(
                        "c", coll_s.read_api_key,
                        SearchParams.from_json(dict(q)),
                    )
                    got_ids = [h["id"] for h in body["hits"]]
                    want_ids = [h.id for h in ref.hits]
                    assert got_ids == want_ids, q
                    assert body["count"] == ref.count, q
            finally:
                await tc.close()
                single.stop()
                sharded.stop()

    asyncio.run(run())


def test_sharded_engine_group_by_matches_single_device(monkeypatch):
    """Termful group-by rides the fused mesh kernel (r5:
    ShardedStringExec.search_topk_grouped — shard-local
    (gid, -score, doc) sorts + one 2-key merge sort per group): groups,
    per-group ranked pages, main hits and counts must equal the
    single-device engine — string, bool, NUMERIC and multi-property
    keys, incl. OMC docs and tombstones."""
    import jax

    from oramacore_tpu.parallel import engine as eng

    assert len(jax.devices()) >= 8
    mesh_calls = []
    orig = eng.ShardedStringExec.search_topk_grouped

    def spy(self, *a, **kw):
        mesh_calls.append(True)
        return orig(self, *a, **kw)

    monkeypatch.setattr(eng.ShardedStringExec, "search_topk_grouped", spy)
    with tempfile.TemporaryDirectory() as t1, \
            tempfile.TemporaryDirectory() as t2:
        single, coll_s = _build(t1, 0)
        sharded, coll_m = _build(t2, 8)
        try:
            assert sharded.read_side.sharded_mesh is not None
            for w, c in ((single.write_side, coll_s),
                         (sharded.write_side, coll_m)):
                w.delete_documents(
                    "c", "main", c.write_api_key,
                    [str(i) for i in range(0, 200, 17)],
                )
            single.read_side.pump()
            sharded.read_side.pump()
            single.read_side.commit(force=True)
            sharded.read_side.commit(force=True)
            for q in (
                {"term": "orange banana",
                 "groupBy": {"properties": ["flag"], "maxResults": 4}},
                {"term": "apple",
                 "groupBy": {"properties": ["n"], "maxResults": 3}},
                {"term": "grape melon",
                 "groupBy": {"properties": ["flag", "n"],
                             "maxResults": 2}},
            ):
                a = single.read_side.search(
                    "c", coll_s.read_api_key,
                    SearchParams.from_json(dict(q)),
                )
                b = sharded.read_side.search(
                    "c", coll_m.read_api_key,
                    SearchParams.from_json(dict(q)),
                )
                ga = {
                    tuple(g.values): [
                        (h.id, round(h.score, 4)) for h in g.result
                    ]
                    for g in (a.groups or [])
                }
                gb = {
                    tuple(g.values): [
                        (h.id, round(h.score, 4)) for h in g.result
                    ]
                    for g in (b.groups or [])
                }
                assert set(ga) == set(gb), (q, set(ga), set(gb))
                for combo in ga:
                    pa, pb = ga[combo], gb[combo]
                    assert len(pa) == len(pb), (q, combo, pa, pb)
                    sa = [s for _, s in pa]
                    sb = [s for _, s in pb]
                    assert np.allclose(sa, sb, atol=1e-3), (
                        q, combo, pa, pb,
                    )
                    # tie runs may reorder between kernel shapes
                    i = 0
                    while i < len(sa):
                        j = i
                        while j + 1 < len(sa) and abs(
                            sa[j + 1] - sa[i]
                        ) <= 1e-3:
                            j += 1
                        assert {d for d, _ in pa[i:j + 1]} == {
                            d for d, _ in pb[i:j + 1]
                        }, (q, combo, pa, pb)
                        i = j + 1
                assert b.count == a.count, q
                assert ga, q
            assert mesh_calls, "mesh grouped step did not engage"
        finally:
            single.stop()
            sharded.stop()
