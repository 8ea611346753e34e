"""Sharded pruned HYBRID parity (parallel/engine.search_topk_hybrid_
int8_pruned).

The 10M-tier hybrid on the 8-device CPU mesh: fulltext candidates
nominate per doc shard, the IVF probe scans units on their round-robin
owners, the global top-V rows route to their doc % D owner, and BM25F +
cosine are both exact on the per-shard candidate union (doc-aligned
int8 copy), fused under a pmax'd global span. With exhaustive budgets
(C >= corpus, nprobe >= units) this must match the single-device pruned
hybrid exactly (same candidate set, same exact rescore — only float
association order differs).

Reference semantics: token_score.rs:357-422 min-max hybrid fusion.
"""

import tempfile

import numpy as np
import pytest

import oramacore_tpu.index.vector_index as vi
from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.types import SearchParams

from .test_sharded_pruned import _assert_hits_match

MASTER = "mk"

_SYL = ["ba", "de", "fi", "go", "ku", "lo", "mi", "na", "po", "ra",
        "su", "ti"]
VOCAB = ["apple", "banana", "cherry", "fig", "grape", "kiwi", "lemon",
         "mango"] + [a + b for a in _SYL for b in _SYL]

DOCS = []
_rng = np.random.default_rng(43)
for i in range(700):
    words = _rng.choice(VOCAB, size=5, replace=False).tolist()
    d = {"id": str(i), "t": " ".join(words), "n": i}
    if i % 11 == 0:
        d["_omc"] = 1.4
    DOCS.append(d)

QUERIES = [
    {"mode": "hybrid", "term": "apple banana", "similarity": 0.3,
     "limit": 10},
    {"mode": "hybrid", "term": "mango kiwi lemon", "similarity": 0.45,
     "limit": 10},
    {"mode": "hybrid", "term": "fig grape", "similarity": 0.2,
     "offset": 2, "limit": 5},
    {"mode": "hybrid", "term": "cherry", "similarity": 0.9, "limit": 10},
]


def _build(tmp, shards):
    cfg = OramacoreConfig()
    cfg.data_dir = tmp
    cfg.auth.master_api_key = MASTER
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.sharded_shards = shards
    cfg.reader_side.pruning = "on"
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=False)
    coll = orama.write_side.create_collection(MASTER, "c")
    orama.write_side.create_index("c", coll.write_api_key, "main")
    orama.write_side.insert_documents("c", "main", coll.write_api_key, DOCS)
    orama.write_side.embedding_queue.flush_and_wait()
    orama.read_side.pump()
    return orama, coll


@pytest.fixture()
def ivf_mode(monkeypatch):
    monkeypatch.setattr(vi, "IVF_MIN_ROWS", 600)
    monkeypatch.setattr(vi, "IVF_NPROBE", 10_000)  # clamps to all units


def test_sharded_pruned_hybrid_matches_single_device(ivf_mode):
    import jax

    assert len(jax.devices()) >= 8
    with tempfile.TemporaryDirectory() as t1, \
            tempfile.TemporaryDirectory() as t2:
        single, coll_s = _build(t1, 0)
        sharded, coll_m = _build(t2, 8)
        try:
            assert sharded.read_side.sharded_mesh is not None
            single.read_side.commit(force=True)
            sharded.read_side.commit(force=True)
            # both stacks must actually be in int8/IVF mode
            for orama in (single, sharded):
                c = orama.read_side.collections["c"]
                ridx = next(iter(c.indexes.values()))
                assert ridx.vector is not None
                assert ridx.vector._ivf is not None
            engaged = 0
            for q in QUERIES:
                a = single.read_side.search(
                    "c", coll_s.read_api_key,
                    SearchParams.from_json(dict(q)),
                )
                b = sharded.read_side.search(
                    "c", coll_m.read_api_key,
                    SearchParams.from_json(dict(q)),
                )
                # int8 quantization is identical on both sides; only
                # float association order differs
                _assert_hits_match(a, b, q, tol=2e-3)
                if b.hits:
                    engaged += 1
                    # both rode the pruned kernels: counts are flagged
                    assert a.count_estimated and b.count_estimated, q
            assert engaged >= 3
        finally:
            single.stop()
            sharded.stop()


def test_sharded_hybrid_filtered_rides_pruned_mesh(ivf_mode):
    """Filtered hybrid on the mesh at the IVF tier rides the SHARDED
    pruned kernel with a doc-sharded mask (round-3 session 4): the small
    filter becomes the per-shard candidate lists, so results AND counts
    are exact (no estimate flag), and out-of-filter docs never
    surface."""
    import jax

    from oramacore_tpu.parallel import engine as eng

    assert len(jax.devices()) >= 8
    calls = []
    orig = eng.ShardedStringExec.search_topk_hybrid_int8_pruned

    def spy(self, *a, **kw):
        calls.append(kw.get("mask"))
        return orig(self, *a, **kw)

    eng.ShardedStringExec.search_topk_hybrid_int8_pruned = spy
    try:
        with tempfile.TemporaryDirectory() as t:
            orama, coll = _build(t, 8)
            try:
                orama.read_side.commit(force=True)
                res = orama.read_side.search(
                    "c", coll.read_api_key,
                    SearchParams.from_json({
                        "mode": "hybrid", "term": "apple",
                        "similarity": 0.3,
                        "limit": 10, "where": {"n": {"lt": 350}},
                    }),
                )
                assert res.hits
                assert all(
                    int(h.id.split(":")[-1]) < 350 for h in res.hits
                )
                # small filter -> cand-given -> exact counts, no flag
                assert not res.count_estimated
                assert any(m is not None for m in calls)
                # and the unfiltered twin stays a flagged estimate
                res2 = orama.read_side.search(
                    "c", coll.read_api_key,
                    SearchParams.from_json({
                        "mode": "hybrid", "term": "apple",
                        "similarity": 0.3,
                        "limit": 10,
                    }),
                )
                assert res2.hits and res2.count_estimated
            finally:
                orama.stop()
    finally:
        eng.ShardedStringExec.search_topk_hybrid_int8_pruned = orig


@pytest.mark.parametrize("shards", [0, 8])
def test_batched_pruned_hybrid_matches_per_query(ivf_mode, shards):
    """Hybrid batches at the int8/IVF tier ride the pruned candidate-
    union kernel (read._search_batch_index hybrid_pruned branch): B
    with-prefix plans in one dispatch, single-device or on the mesh.
    Each batch result must equal its per-query twin (same kernel, B=1
    vs B=N padding only changes float association order)."""
    import jax

    if shards:
        assert len(jax.devices()) >= shards
    with tempfile.TemporaryDirectory() as t:
        orama, coll = _build(t, shards)
        try:
            orama.read_side.commit(force=True)
            batch = [SearchParams.from_json(dict(q)) for q in QUERIES]
            outs = orama.read_side.search_batch(
                "c", coll.read_api_key, batch
            )
            assert len(outs) == len(QUERIES)
            for q, b in zip(QUERIES, outs):
                a = orama.read_side.search(
                    "c", coll.read_api_key,
                    SearchParams.from_json(dict(q)),
                )
                _assert_hits_match(a, b, q, tol=2e-3)
                if b.hits:
                    assert b.count_estimated, q
        finally:
            orama.stop()


def test_hybrid_exact_count_takes_dense_path(ivf_mode):
    """The hybrid kernels have no exact-count dispatch: an exactCount
    request must route to the dense exact path (per-query AND batch)
    and return unflagged counts."""
    with tempfile.TemporaryDirectory() as t:
        orama, coll = _build(t, 0)
        try:
            orama.read_side.commit(force=True)
            q = {"mode": "hybrid", "term": "apple", "similarity": 0.3,
                 "limit": 10, "exactCount": True}
            res = orama.read_side.search(
                "c", coll.read_api_key, SearchParams.from_json(dict(q)),
            )
            assert res.hits and not res.count_estimated
            outs = orama.read_side.search_batch(
                "c", coll.read_api_key,
                [SearchParams.from_json(dict(q)),
                 SearchParams.from_json(dict(q, term="fig grape"))],
            )
            assert all(
                not r.count_estimated for r in outs if r.hits
            )
            # and the pruned twin (no exactCount) is flagged
            res2 = orama.read_side.search(
                "c", coll.read_api_key,
                SearchParams.from_json({
                    "mode": "hybrid", "term": "apple",
                    "similarity": 0.3, "limit": 10,
                }),
            )
            assert res2.count_estimated
        finally:
            orama.stop()


def test_sharded_pruned_hybrid_facets_parity(ivf_mode):
    """Mesh HYBRID facet searches ride the sharded sort-based facet
    path (parallel/engine._get_facet_vec_reps_step): the probe's owned
    top-V docs join each shard's fulltext reps and the psum'd
    histograms must equal the single-device pruned facet counts — the
    last mesh facet gap (VERDICT r3 #5)."""
    import jax

    from oramacore_tpu.parallel import engine as eng

    assert len(jax.devices()) >= 8
    vec_calls = []
    orig = eng.ShardedStringExec.facet_counts_pruned

    def spy(self, *a, **kw):
        vec_calls.append(kw.get("vec") is not None)
        return orig(self, *a, **kw)

    eng.ShardedStringExec.facet_counts_pruned = spy
    try:
        with tempfile.TemporaryDirectory() as t1, \
                tempfile.TemporaryDirectory() as t2:
            single, coll_s = _build(t1, 0)
            sharded, coll_m = _build(t2, 8)
            try:
                single.read_side.commit(force=True)
                sharded.read_side.commit(force=True)
                for q in (
                    {"mode": "hybrid", "term": "apple banana",
                     "similarity": 0.45, "limit": 10, "facets": {
                         "n": {"ranges": [{"from": 0, "to": 300},
                                          {"from": 300, "to": 700}]},
                     }},
                    {"mode": "hybrid", "term": "mango kiwi lemon",
                     "similarity": 0.5, "limit": 10,
                     "where": {"n": {"lt": 350}},
                     "facets": {
                         "n": {"ranges": [{"from": 0, "to": 699}]},
                     }},
                ):
                    a = single.read_side.search(
                        "c", coll_s.read_api_key,
                        SearchParams.from_json(dict(q)),
                    )
                    b = sharded.read_side.search(
                        "c", coll_m.read_api_key,
                        SearchParams.from_json(dict(q)),
                    )
                    for f in q["facets"]:
                        assert a.facets[f].values == b.facets[f].values, (
                            q, f, a.facets[f].values, b.facets[f].values,
                        )
                assert vec_calls and all(vec_calls), vec_calls
            finally:
                single.stop()
                sharded.stop()
    finally:
        eng.ShardedStringExec.facet_counts_pruned = orig
