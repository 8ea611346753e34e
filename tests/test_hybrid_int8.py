"""Fused hybrid over the int8/IVF vector layout (the >=2M-row tier).

Reference semantics under test: token_score.rs:357-422 hybrid fusion with
the vector side bounded by `limit` candidates (EmbeddingStorage.search),
here probed from the int8 packed clusters inside the same dispatch as
BM25 scoring (ops/hybrid.py hybrid_search_topk_packed_int8 /
hybrid_finalize_topk_int8).
"""

import numpy as np
import pytest

import oramacore_tpu.index.vector_index as vi
from oramacore_tpu.index.vector_index import VectorIndex, VectorIndexConfig
from oramacore_tpu.ops.vector import l2_normalize
from oramacore_tpu.types import SearchParams

from .utils import TestContext, ids_of


@pytest.fixture()
def ivf_ctx(monkeypatch):
    # force the IVF/int8 layout at test scale
    monkeypatch.setattr(vi, "IVF_MIN_ROWS", 600)
    monkeypatch.setattr(vi, "IVF_NPROBE", 16)
    ctx = TestContext()
    yield ctx
    ctx.close()


# 144 distinct two-syllable words: enough entropy that 5-word docs are
# unique (ties would make ranking comparisons tie-break noise)
_SYL = ["ba", "de", "fi", "go", "ku", "lo", "mi", "na", "po", "ra", "su", "ti"]
VOCAB = ["apple", "banana", "cherry", "fig", "grape", "kiwi", "lemon",
         "mango"] + [a + b for a in _SYL for b in _SYL]


def _docs(n, seed=0):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        words = rng.choice(VOCAB, size=5, replace=False)
        docs.append({"id": str(i), "t": " ".join(words)})
    return docs


def _build(ctx, n=900):
    coll = ctx.create_collection()
    idx = coll.create_index()
    docs = _docs(n)
    for s in range(0, n, 300):
        idx.insert_documents(docs[s : s + 300])
    ctx.commit_all()
    return coll, idx


def _read_index(ctx, coll):
    c = ctx.reader.collections[coll.collection_id]
    return next(iter(c.indexes.values()))


def test_engine_hybrid_int8_fused_parity(ivf_ctx):
    """Hybrid search on an IVF-sized index runs the fused int8 path and
    ranks like the separate-dispatch host-fusion fallback."""
    ctx = ivf_ctx
    coll, _ = _build(ctx)
    ridx = _read_index(ctx, coll)
    assert ridx.vector is not None and ridx.vector._ivf is not None
    assert ridx.vector.int8_device_rows() is not None

    # similarity 0.45: only genuinely related docs pass the vector
    # threshold, so the fused (256-candidate) and fallback
    # (limit-bounded) paths capture the SAME vector contributor set and
    # scores become comparable
    queries = ["apple banana", "mango kiwi lemon", "fig grape"]
    fused_out = [
        coll.search({"mode": "hybrid", "term": q, "similarity": 0.45})
        for q in queries
    ]
    # force the fallback (separate vector + fulltext + host fusion)
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(VectorIndex, "int8_device_rows", lambda self: None)
        fallback_out = [
            coll.search({"mode": "hybrid", "term": q, "similarity": 0.45})
            for q in queries
        ]
    for q, f, fb in zip(queries, fused_out, fallback_out):
        assert f.hits, f"no hits for {q!r}"
        f_ids = ids_of(f)
        fb_ids = ids_of(fb)
        # int8 vector scores vs f32-reranked differ at ~1e-3 (tie-level
        # reordering), and the fused path probes MORE vector candidates
        # than the fallback's limit-bounded side — so compare the clear
        # winner plus overall page overlap, not exact order
        assert f_ids[0] == fb_ids[0], (q, f_ids, fb_ids)
        overlap = len(set(f_ids) & set(fb_ids)) / max(len(fb_ids), 1)
        assert overlap >= 0.5, (q, f_ids, fb_ids)
        # scores of docs on both pages agree to quantization tolerance
        f_scores = {h.id: h.score for h in f.hits}
        fb_scores = {h.id: h.score for h in fb.hits}
        for did in set(f_scores) & set(fb_scores):
            assert f_scores[did] == pytest.approx(
                fb_scores[did], abs=5e-3
            ), (q, did)


def test_engine_hybrid_int8_with_filter(ivf_ctx):
    """Where-filters push down into the int8 probe (per-query doc mask)."""
    ctx = ivf_ctx
    coll = ctx.create_collection()
    idx = coll.create_index()
    n = 700
    docs = _docs(n, seed=3)
    for d in docs:
        d["grp"] = int(d["id"]) % 2
    for s in range(0, n, 350):
        idx.insert_documents(docs[s : s + 350])
    ctx.commit_all()
    ridx = _read_index(ctx, coll)
    assert ridx.vector._ivf is not None

    out = coll.search({
        "mode": "hybrid", "term": "apple banana", "similarity": 0.05,
        "where": {"grp": {"eq": 1}}, "limit": 20,
    })
    assert out.hits
    assert all(int(i) % 2 == 1 for i in ids_of(out))


def test_batch_hybrid_int8_matches_per_query(ivf_ctx):
    """A homogeneous hybrid batch over an IVF-sized index rides the
    shared BM25 pass + int8 fused tail and matches per-query results."""
    ctx = ivf_ctx
    coll, _ = _build(ctx, n=800)
    ridx = _read_index(ctx, coll)
    assert ridx.vector._ivf is not None

    queries = ["apple banana", "cherry fig", "mango lemon", "kiwi grape"]
    params = [
        SearchParams.from_json(
            {"mode": "hybrid", "term": q, "similarity": 0.05}
        )
        for q in queries
    ]
    results = ctx.reader.search_batch(coll.collection_id, coll.read_key, params)
    for p, batch_result in zip(params, results):
        single = ctx.reader.search(coll.collection_id, coll.read_key, p)
        assert ids_of(single) == ids_of(batch_result)
        for hs, hb in zip(single.hits, batch_result.hits):
            assert hb.score == pytest.approx(hs.score, rel=1e-3)


def test_int8_tail_kernel_matches_flat_tail():
    """Kernel-level: hybrid_finalize_topk_int8 with full probe coverage
    reproduces hybrid_finalize_topk (bf16 flat rows) up to int8
    quantization error."""
    import jax.numpy as jnp

    from oramacore_tpu.ops.hybrid import (
        hybrid_finalize_topk,
        hybrid_finalize_topk_int8,
    )

    rng = np.random.default_rng(0)
    n, dim, cap, B, k = 512, 32, 512, 4, 16
    rows = l2_normalize(rng.normal(size=(n, dim)).astype(np.float32))
    row_doc = np.arange(n, dtype=np.int32)
    q = l2_normalize(rng.normal(size=(B, dim)).astype(np.float32))
    # shared BM25 side: sparse random scores
    scores = np.zeros((B, cap), np.float32)
    scores[:, :64] = rng.random((B, 64)).astype(np.float32)
    matched = (scores > 0).astype(np.float32)
    thr = np.zeros(B, np.float32)
    sim = np.full(B, 0.0, np.float32)

    vals_f, ids_f, counts_f = hybrid_finalize_topk(
        jnp.asarray(scores), jnp.asarray(matched), jnp.asarray(thr),
        jnp.asarray(rows, jnp.bfloat16), jnp.asarray(row_doc),
        jnp.ones(n, bool), jnp.asarray(q), jnp.asarray(sim),
        jnp.zeros((1, 1), bool), jnp.ones((1,), jnp.float32),
        cap=cap, k=k, has_mask=False, has_omc=False,
        has_rescale=False, rescale_lo=0.0, rescale_hi=1.0,
    )

    # int8 layout: one cluster per 64 rows, probe them ALL (exhaustive)
    from oramacore_tpu.ops.vector import quantize_rows_int8
    import jax

    q_i8, scales = jax.jit(quantize_rows_int8)(jnp.asarray(rows))
    window = 64
    unit_starts = np.arange(0, n, window, dtype=np.int32)
    unit_cen = np.stack([
        l2_normalize(rows[s : s + window].mean(axis=0)) for s in unit_starts
    ])
    vals_i, ids_i, counts_i = hybrid_finalize_topk_int8(
        jnp.asarray(scores), jnp.asarray(matched), jnp.asarray(thr),
        q_i8, scales, jnp.asarray(row_doc),
        jnp.asarray(unit_cen), jnp.asarray(unit_starts),
        jnp.asarray(q), jnp.asarray(sim),
        jnp.zeros((1, 1), bool), jnp.ones((1,), jnp.float32),
        cap=cap, k=k, V=n, nprobe=len(unit_starts), window=window,
        has_mask=False, has_omc=False,
        has_rescale=False, rescale_lo=0.0, rescale_hi=1.0,
    )
    vals_f, ids_f = np.asarray(vals_f), np.asarray(ids_f)
    vals_i, ids_i = np.asarray(vals_i), np.asarray(ids_i)
    for b in range(B):
        f_top = [d for d, v in zip(ids_f[b], vals_f[b]) if v > -1e29]
        i_top = [d for d, v in zip(ids_i[b], vals_i[b]) if v > -1e29]
        overlap = len(set(f_top[:10]) & set(i_top[:10]))
        assert overlap >= 8, (b, f_top[:10], i_top[:10])
        # fused scores agree to quantization tolerance on common docs
        f_map = dict(zip(ids_f[b].tolist(), vals_f[b].tolist()))
        i_map = dict(zip(ids_i[b].tolist(), vals_i[b].tolist()))
        for d in set(f_map) & set(i_map):
            assert abs(f_map[d] - i_map[d]) < 0.05, (b, d)


def test_engine_hybrid_int8_with_champion_rows(ivf_ctx, monkeypatch):
    """Heavy terms route through champion dense rows inside the fused
    int8 hybrid dispatch; ranking matches the no-champion plan."""
    import oramacore_tpu.index.string_index as si

    monkeypatch.setattr(si, "CHAMPION_MIN", 64)
    ctx = ivf_ctx
    coll = ctx.create_collection()
    idx = coll.create_index()
    n = 700
    docs = _docs(n, seed=9)
    for d in docs:
        d["t"] = d["t"] + " ubiquitous"  # heavy shared term
    for s in range(0, n, 350):
        idx.insert_documents(docs[s : s + 350])
    ctx.commit_all()
    ridx = _read_index(ctx, coll)
    assert ridx.vector._ivf is not None
    ridx.string.slab()
    assert any(
        term == "ubiquit" or "ubiquit" in term
        for (_p, term) in ridx.string._champ_map
    ), "expected a champion row for the heavy term"

    q = "apple ubiquitous"
    with_champ = coll.search({"mode": "hybrid", "term": q, "similarity": 0.45})
    # disable champions: clear the map so plans fall back to ranges
    ridx.string._champ_map = {}
    no_champ = coll.search({"mode": "hybrid", "term": q, "similarity": 0.45})
    assert ids_of(with_champ) == ids_of(no_champ)
    for hc, hn in zip(with_champ.hits, no_champ.hits):
        assert hc.score == pytest.approx(hn.score, rel=1e-4)
