"""Parity tests for the pruned (candidate + exact-rescore) BM25F path.

The pruned kernels (ops/pruned.py) must match the dense reference
kernels (ops/bm25.py, ops/hybrid.py) exactly whenever the nomination
prefixes + candidate budget cover the whole corpus, and with high top-k
overlap when they do not (the VERDICT r2 done-criterion is >=0.95
overlap at 10M docs; benches/hybrid10m_bench.py measures that tier on
hardware).

v3 layout: main ranges are DOC-SORTED (the rescore streams them with
cumsum + binary-searched prefix-sum gathers — no device sort); phase-1
nomination reads impact-prefix side blocks.
"""

from __future__ import annotations

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from oramacore_tpu.ops.bm25 import MAX_RANGE_LEN, bm25_search_topk_packed
from oramacore_tpu.ops.pruned import (
    estimate_match_count,
    pruned_fulltext_topk,
)

LCH = 4096
WCH = 128


def build_corpus(n_docs, n_terms, seed=0, zipf=1.1, max_df=None,
                 prefix_len=1024):
    """Synthetic single-field slab: DOC-SORTED per-term ranges (the
    engine's v3 _pack_segment layout) + impact-prefix side blocks for
    terms longer than prefix_len."""
    rng = np.random.default_rng(seed)
    w = 1.0 / (np.arange(1, n_terms + 1) ** zipf)
    df = np.maximum((w / w.sum() * n_docs * 6).astype(np.int64), 1)
    df = np.minimum(df, max_df or n_docs)
    tstart = np.zeros(n_terms + 1, np.int64)
    np.cumsum(df, out=tstart[1:])
    P = int(tstart[-1])
    p_doc = np.empty(P, np.int32)
    p_tf = np.empty(P, np.float32)
    p_etf = np.empty(P, np.float32)
    p_flen = np.empty(P, np.float32)
    for t in range(n_terms):
        s, n = int(tstart[t]), int(df[t])
        docs = np.sort(
            rng.choice(n_docs, size=n, replace=False).astype(np.int32)
        )
        # geometric term frequencies (real text is zipf-ish)
        tf = np.minimum(rng.geometric(0.55, size=n), 12).astype(np.float32)
        etf = np.minimum(tf, rng.integers(0, 3, size=n)).astype(np.float32)
        fl = rng.uniform(5.0, 60.0, size=n).astype(np.float32)
        p_doc[s:s + n] = docs
        p_tf[s:s + n] = tf
        p_etf[s:s + n] = etf
        p_flen[s:s + n] = fl
    # impact-prefix side blocks appended after the CSR region
    pre = {}
    pd, pt, pe, pf = [], [], [], []
    off = P
    for t in range(n_terms):
        s, n = int(tstart[t]), int(df[t])
        if n > prefix_len:
            imp = p_tf[s:s + n] / np.maximum(p_flen[s:s + n], 1e-9)
            sel = np.argpartition(-imp, prefix_len)[:prefix_len] + s
            pd.append(p_doc[sel])
            pt.append(p_tf[sel])
            pe.append(p_etf[sel])
            pf.append(p_flen[sel])
            pre[t] = (off, prefix_len)
            off += prefix_len
        else:
            pre[t] = (s, n)
    if pd:
        p_doc = np.concatenate([p_doc] + pd)
        p_tf = np.concatenate([p_tf] + pt)
        p_etf = np.concatenate([p_etf] + pe)
        p_flen = np.concatenate([p_flen] + pf)
    pad = np.zeros(MAX_RANGE_LEN, np.float32)
    return {
        "p_doc": np.concatenate([p_doc, pad.astype(np.int32)]),
        "p_tf": np.concatenate([p_tf, pad]),
        "p_etf": np.concatenate([p_etf, pad]),
        "p_flen": np.concatenate([p_flen, np.ones_like(pad)]),
        "df": df,
        "tstart": tstart,
        "pre": pre,
        "n_docs": n_docs,
    }


def build_plans(corpus, queries_terms, avg_flen=30.0, b=0.75):
    """(full idesc+fdesc, pre idesc+fdesc, idf, worklist) for a batch of
    term-id queries. Mirrors PrunedPlanMixin._pruned_host_inputs."""
    df, tstart, pre = corpus["df"], corpus["tstart"], corpus["pre"]
    B = len(queries_terms)
    T = max(len(q) for q in queries_terms)
    NR = 1
    st = np.zeros((B, T, NR), np.int32)
    ln = np.zeros((B, T, NR), np.int32)
    w = np.zeros((B, T, NR), np.float32)
    fb = np.full((B, T, NR), b, np.float32)
    av = np.full((B, T, NR), avg_flen, np.float32)
    pre_st = np.zeros((B, T, 1), np.int32)
    pre_ln = np.zeros((B, T, 1), np.int32)
    idf = np.zeros((B, T), np.float32)
    n = float(corpus["n_docs"])
    wl = []
    for bi, terms in enumerate(queries_terms):
        for ti, t in enumerate(terms):
            s0, n0 = int(tstart[t]), int(df[t])
            st[bi, ti, 0] = s0
            ln[bi, ti, 0] = n0
            w[bi, ti, 0] = 1.0
            ps, pl = pre[int(t)]
            pre_st[bi, ti, 0] = ps
            pre_ln[bi, ti, 0] = pl
            d = max(float(n0), 1.0)
            idf[bi, ti] = np.log1p((n - d + 0.5) / (d + 0.5))
            off = 0
            while off < n0:
                take = min(n0 - off, LCH)
                wl.append((bi, ti, s0 + off, take, 1.0, b, avg_flen))
                off += take
    W = max(WCH, ((len(wl) + WCH - 1) // WCH) * WCH)
    wl_i = np.zeros((4, W), np.int32)
    wl_f = np.zeros((3, W), np.float32)
    wl_f[2, :] = 1.0
    for j, (bb, tt, s0, l0, w0, b0, a0) in enumerate(wl):
        wl_i[:, j] = (bb, tt, s0, l0)
        wl_f[:, j] = (w0, b0, a0)
    full_idesc = np.stack([st, ln])
    full_fdesc = np.stack([w, fb, av])
    pre_idesc = np.stack([pre_st, pre_ln])
    pre_fdesc = np.stack([
        np.ones((B, T, 1), np.float32),
        np.full((B, T, 1), b, np.float32),
        np.full((B, T, 1), avg_flen, np.float32),
    ])
    return full_idesc, full_fdesc, pre_idesc, pre_fdesc, idf, wl_i, wl_f


def dense_reference(corpus, full_idesc, full_fdesc, thr, omc, k, exact=False,
                    mask=None):
    """The dense fused kernel as ground truth."""
    B = full_idesc.shape[1]
    lr = 8
    while lr < int(full_idesc[1].max()):
        lr *= 2
    scalars = np.stack([
        np.full((B,), float(corpus["n_docs"]), np.float32),
        np.asarray(thr, np.float32),
    ])
    cap = corpus["n_docs"]
    capb = 128
    while capb < cap:
        capb *= 2
    has_omc = omc is not None
    omc_arr = np.ones((capb,), np.float32)
    if has_omc:
        omc_arr[: len(omc)] = omc
    has_mask = mask is not None
    if has_mask:
        mask_arr = np.zeros((B, capb), bool)
        mask_arr[:, : len(mask)] = mask[None, :]
    else:
        mask_arr = np.zeros((1, 1), bool)
    vals, ids, counts = bm25_search_topk_packed(
        jnp.asarray(corpus["p_doc"]), jnp.asarray(corpus["p_tf"]),
        jnp.asarray(corpus["p_etf"]), jnp.asarray(corpus["p_flen"]),
        jnp.asarray(full_idesc), jnp.asarray(full_fdesc),
        jnp.asarray(scalars),
        jnp.asarray(mask_arr), jnp.asarray(omc_arr),
        lr=lr, exact=exact, cap=capb, k=k,
        has_mask=has_mask, has_omc=True,
    )
    return np.asarray(vals), np.asarray(ids), np.asarray(counts)


def run_pruned(corpus, plans, thr, omc, k, C, lp=1024, exact=False,
               mask=None, cand_given=False):
    full_idesc, full_fdesc, pre_idesc, pre_fdesc, idf, wl_i, wl_f = plans
    B, T = idf.shape
    cap = corpus["n_docs"]
    has_omc = omc is not None
    omc_arr = (
        np.ones((cap,), np.float32) if has_omc else np.ones((1,), np.float32)
    )
    if has_omc:
        omc_arr[: len(omc)] = omc
    lp_b = 8
    while lp_b < max(int(pre_idesc[1].max()), 8):
        lp_b *= 2
    has_filter = mask is not None
    fmask_arr = np.ones((1,), np.float32)
    cand_in = None
    if has_filter:
        fmask_arr = np.zeros((cap,), np.float32)
        fmask_arr[: len(mask)] = mask
        if cand_given:
            sel = np.nonzero(mask)[0].astype(np.int32)
            assert len(sel) <= C
            cand_np = np.full((B, C), cap, np.int32)
            cand_np[:, : len(sel)] = sel[None, :]
            cand_in = jnp.asarray(cand_np)
    vals, ids, counts = pruned_fulltext_topk(
        jnp.asarray(corpus["p_doc"]), jnp.asarray(corpus["p_tf"]),
        jnp.asarray(corpus["p_etf"]), jnp.asarray(corpus["p_flen"]),
        jnp.asarray(pre_idesc), jnp.asarray(pre_fdesc),
        jnp.asarray(wl_i), jnp.asarray(wl_f),
        jnp.asarray(idf),
        jnp.full((B,), float(cap), jnp.float32),
        jnp.asarray(np.asarray(thr, np.float32)),
        jnp.asarray(omc_arr),
        None,
        jnp.asarray(fmask_arr), cand_in,
        lp=lp_b, lch=LCH, cap=cap, C=C, k=k, T=T,
        exact=exact, has_omc=has_omc,
        has_filter=has_filter, cand_given=cand_given,
    )
    return np.asarray(vals), np.asarray(ids), np.asarray(counts)


def assert_topk_equal(vd, idd, vp, idp, tol=2e-5):
    """Ranked parity allowing id swaps among tied scores."""
    assert np.allclose(vd, vp, rtol=tol, atol=tol), (vd, vp)
    for b in range(vd.shape[0]):
        i = 0
        K = vd.shape[1]
        while i < K:
            j = i
            while j + 1 < K and abs(vd[b, j + 1] - vd[b, i]) <= tol * max(
                abs(vd[b, i]), 1.0
            ):
                j += 1
            assert set(idd[b, i:j + 1].tolist()) == set(
                idp[b, i:j + 1].tolist()
            ), (b, i, j, idd[b], idp[b])
            i = j + 1


def test_pruned_exact_when_candidates_cover_corpus():
    # prefix_len > every df -> prefixes span whole ranges; C spans the
    # corpus -> pruned must equal dense EXACTLY
    corpus = build_corpus(n_docs=1500, n_terms=64, seed=1, prefix_len=10**9)
    queries = [[0, 3, 10], [1, 2], [5, 20, 40], [7]]
    plans = build_plans(corpus, queries)
    thr = [0.0, 2.0, 0.0, 0.0]
    omc = np.ones(1500, np.float32)
    omc[::7] = 1.5
    vd, idd, cd = dense_reference(corpus, plans[0], plans[1], thr, omc, 10)
    vp, idp, cp = run_pruned(corpus, plans, thr, omc, 10, C=2048)
    assert_topk_equal(vd, idd, vp, idp)
    # C covers the corpus -> candidate counts equal the exact counts
    assert np.array_equal(cd, cp)


def test_pruned_exact_mode_and_no_omc():
    corpus = build_corpus(n_docs=800, n_terms=32, seed=3, prefix_len=10**9)
    queries = [[0, 1], [4, 9]]
    plans = build_plans(corpus, queries)
    vd, idd, _ = dense_reference(
        corpus, plans[0], plans[1], [0.0, 0.0], None, 8, exact=True
    )
    vp, idp, _ = run_pruned(
        corpus, plans, [0.0, 0.0], None, 8, C=1024, exact=True
    )
    assert_topk_equal(vd, idd, vp, idp)


def test_pruned_overlap_at_scale():
    """Impact-prefix blocks + C < corpus: top-10 overlap vs dense must
    be >= 0.95 on zipf data."""
    corpus = build_corpus(
        n_docs=30000, n_terms=48, seed=7, max_df=12000, prefix_len=2048
    )
    rng = np.random.default_rng(11)
    queries = [list(rng.choice(24, size=3, replace=False)) for _ in range(16)]
    plans = build_plans(corpus, queries)
    thr = [0.0] * len(queries)
    vd, idd, _ = dense_reference(corpus, plans[0], plans[1], thr, None, 10)
    vp, idp, _ = run_pruned(corpus, plans, thr, None, 10, C=1024)
    overlaps = [
        len(set(idd[b].tolist()) & set(idp[b].tolist())) / 10.0
        for b in range(len(queries))
    ]
    assert np.mean(overlaps) >= 0.95, overlaps


def build_ivf(n_docs, D=16, n_clusters=8, window=64, seed=5):
    """Tiny packed int8/IVF layout: one row per doc."""
    rng = np.random.default_rng(seed)
    cen = rng.normal(size=(n_clusters, D)).astype(np.float32)
    cen /= np.linalg.norm(cen, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n_docs)
    rows = cen[assign] + 0.15 * rng.normal(size=(n_docs, D)).astype(
        np.float32
    )
    rows /= np.linalg.norm(rows, axis=1, keepdims=True)
    perm = np.argsort(assign, kind="stable")
    packed = rows[perm]
    amax = np.abs(packed).max(axis=1)
    scales = np.maximum(amax, 1e-12) / 127.0
    q = np.clip(np.round(packed / scales[:, None]), -127, 127).astype(
        np.int8
    )
    row_doc = perm.astype(np.int32)
    doc2row = np.full(n_docs + 1, -1, np.int32)
    doc2row[row_doc] = np.arange(n_docs, dtype=np.int32)
    counts = np.bincount(assign, minlength=n_clusters)
    starts = np.zeros(n_clusters + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    unit_starts, unit_cluster = [], []
    for c in range(n_clusters):
        for j in range(0, max(int(counts[c]), 1), window):
            unit_starts.append(int(starts[c]) + j)
            unit_cluster.append(c)
    return {
        "mat_i8": q,
        "scales": scales.astype(np.float32),
        "row_doc": row_doc,
        "unit_cen": cen[np.asarray(unit_cluster)],
        "unit_starts": np.asarray(unit_starts, np.int32),
        "doc2row": doc2row,
        "window": window,
        "n_units": len(unit_starts),
    }


def test_pruned_hybrid_parity():
    """Full-coverage pruned hybrid == dense fused int8 hybrid."""
    from oramacore_tpu.ops.hybrid import hybrid_search_topk_packed_int8
    from oramacore_tpu.ops.pruned import pruned_hybrid_topk_int8

    n_docs = 700
    corpus = build_corpus(n_docs=n_docs, n_terms=24, seed=9,
                          prefix_len=10**9)
    ivf = build_ivf(n_docs)
    rng = np.random.default_rng(13)
    B = 4
    queries = [[0, 2, 5], [1, 3], [4, 8], [0, 7]]
    (full_idesc, full_fdesc, pre_idesc, pre_fdesc, idf, wl_i, wl_f) = (
        build_plans(corpus, queries)
    )
    qvecs = rng.normal(size=(B, 16)).astype(np.float32)
    qvecs /= np.linalg.norm(qvecs, axis=1, keepdims=True)
    sims = np.full((B,), 0.1, np.float32)
    thr = np.zeros((B,), np.float32)

    lr = 8
    while lr < int(full_idesc[1].max()):
        lr *= 2
    capb = 128
    while capb < n_docs:
        capb *= 2
    scalars = np.stack([
        np.full((B,), float(n_docs), np.float32), thr, sims,
    ])
    # dense ground truth: probe ALL units with a candidate budget
    # covering the corpus so its vector side is exact too
    vd, idd, _ = hybrid_search_topk_packed_int8(
        jnp.asarray(corpus["p_doc"]), jnp.asarray(corpus["p_tf"]),
        jnp.asarray(corpus["p_etf"]), jnp.asarray(corpus["p_flen"]),
        jnp.asarray(full_idesc), jnp.asarray(full_fdesc),
        jnp.asarray(scalars),
        jnp.asarray(ivf["mat_i8"]), jnp.asarray(ivf["scales"]),
        jnp.asarray(ivf["row_doc"]), jnp.asarray(ivf["unit_cen"]),
        jnp.asarray(ivf["unit_starts"]),
        jnp.asarray(qvecs),
        jnp.zeros((1, 1), bool), jnp.ones((1,), jnp.float32),
        lr=lr, exact=False, cap=capb, k=10,
        V=1024, nprobe=ivf["n_units"], window=ivf["window"],
        has_mask=False, has_omc=False,
        has_rescale=False, rescale_lo=0.0, rescale_hi=1.0,
    )
    vp, idp, _ = pruned_hybrid_topk_int8(
        jnp.asarray(corpus["p_doc"]), jnp.asarray(corpus["p_tf"]),
        jnp.asarray(corpus["p_etf"]), jnp.asarray(corpus["p_flen"]),
        jnp.asarray(pre_idesc), jnp.asarray(pre_fdesc),
        jnp.asarray(wl_i), jnp.asarray(wl_f),
        jnp.asarray(idf),
        jnp.full((B,), float(n_docs), jnp.float32),
        jnp.asarray(thr),
        jnp.asarray(ivf["mat_i8"]), jnp.asarray(ivf["scales"]),
        jnp.asarray(ivf["row_doc"]), jnp.asarray(ivf["unit_cen"]),
        jnp.asarray(ivf["unit_starts"]), jnp.asarray(ivf["doc2row"]),
        jnp.asarray(qvecs), jnp.asarray(sims),
        jnp.ones((1,), jnp.float32),
        lp=4096, lch=LCH, cap=n_docs, C=1024, k=10, T=idf.shape[1],
        exact=False, has_omc=False,
        V=1024, nprobe=ivf["n_units"], window=ivf["window"],
        has_rescale=False, rescale_lo=0.0, rescale_hi=1.0,
    )
    assert_topk_equal(np.asarray(vd), np.asarray(idd),
                      np.asarray(vp), np.asarray(idp), tol=5e-3)


def run_pruned_bs(corpus, plans, thr, omc, k, nom_accum=False,
                  hp=None, C=1024, lp=None):
    """Drive the v4 kernel (ops/pruned.py pruned_fulltext_topk_bs): the
    test harness's full ranges are already unsplit (NR=1), so they feed
    rng_i/rng_f directly."""
    from oramacore_tpu.ops.pruned import pruned_fulltext_topk_bs

    full_idesc, full_fdesc, pre_idesc, pre_fdesc, idf, _wi, _wf = plans
    B, T = idf.shape
    cap = corpus["n_docs"]
    has_omc = omc is not None
    omc_arr = (
        np.ones((cap,), np.float32) if has_omc else np.ones((1,), np.float32)
    )
    if has_omc:
        omc_arr[: len(omc)] = omc
    if hp is None:
        hp = max(int(pre_idesc[1].max()), 8)
    lp_b = 8
    while lp_b < max(int(pre_idesc[1].max()), 8):
        lp_b *= 2
    bs = 4
    while (1 << bs) < int(full_idesc[1].max()) + 1:
        bs += 4
    vals, ids, counts = pruned_fulltext_topk_bs(
        jnp.asarray(corpus["p_doc"]), jnp.asarray(corpus["p_tf"]),
        jnp.asarray(corpus["p_flen"]),
        jnp.asarray(pre_idesc[0]), jnp.asarray(pre_idesc[1]),
        jnp.asarray(full_idesc), jnp.asarray(full_fdesc),
        jnp.asarray(idf),
        jnp.asarray(np.asarray(thr, np.float32)),
        jnp.asarray(omc_arr), None,
        jnp.asarray(pre_fdesc) if nom_accum else None,
        hp=hp, cap=cap, k=k, bs_steps=bs, has_omc=has_omc,
        nom_accum=nom_accum, lp=(lp or lp_b) if nom_accum else 0,
        C=C if nom_accum else 0,
    )
    return np.asarray(vals), np.asarray(ids), np.asarray(counts)


@pytest.mark.parametrize("nom_accum", [False, True])
def test_pruned_bs_exact_when_candidates_cover_corpus(nom_accum):
    """v4 parity: when nomination covers every matching doc (whole-range
    prefixes; slice hp / accum C span them) the binary-search rescore
    must equal the dense kernel EXACTLY — scores, ids, verified counts.
    Exercises thresholds and OMC through the same dispatch."""
    corpus = build_corpus(n_docs=1500, n_terms=64, seed=1, prefix_len=10**9)
    queries = [[0, 3, 10], [1, 2], [5, 20, 40], [7]]
    plans = build_plans(corpus, queries)
    thr = [0.0, 2.0, 0.0, 0.0]
    omc = np.ones(1500, np.float32)
    omc[::7] = 1.5
    vd, idd, cd = dense_reference(corpus, plans[0], plans[1], thr, omc, 10)
    vp, idp, cp = run_pruned_bs(
        corpus, plans, thr, omc, 10, nom_accum=nom_accum, C=2048
    )
    assert_topk_equal(vd, idd, vp, idp)
    assert np.array_equal(cd, cp)


@pytest.mark.parametrize("nom_accum", [False, True])
def test_pruned_bs_overlap_at_scale(nom_accum):
    """v4 with real impact-prefix blocks + bounded budgets: top-10
    overlap vs dense >= 0.95 on zipf data (the VERDICT r2 bar)."""
    corpus = build_corpus(
        n_docs=30000, n_terms=48, seed=7, max_df=12000, prefix_len=2048
    )
    rng = np.random.default_rng(11)
    queries = [list(rng.choice(24, size=3, replace=False)) for _ in range(16)]
    plans = build_plans(corpus, queries)
    thr = [0.0] * len(queries)
    vd, idd, _ = dense_reference(corpus, plans[0], plans[1], thr, None, 10)
    vp, idp, _ = run_pruned_bs(
        corpus, plans, thr, None, 10, nom_accum=nom_accum, hp=2048, C=1024
    )
    overlaps = [
        len(set(idd[b].tolist()) & set(idp[b].tolist())) / 10.0
        for b in range(len(queries))
    ]
    assert np.mean(overlaps) >= 0.95, overlaps


def test_pruned_bs_split_ranges_parity():
    """The v4 rescore searches UNSPLIT ranges: feeding it a plan whose
    token was split at a small MAX_RANGE_LEN and re-coalesced
    (search_exec._pruned_bs_inputs) must match the dense kernel run on
    the split plan."""
    from oramacore_tpu.index.search_exec import PrunedPlanMixin
    from oramacore_tpu.index.string_index import QueryPlan

    corpus = build_corpus(n_docs=2000, n_terms=16, seed=21,
                          prefix_len=10**9)
    queries = [[0, 1], [2, 0]]
    plans = build_plans(corpus, queries)
    full_idesc, full_fdesc = plans[0], plans[1]
    # split every range into <=257-posting pieces (doc order preserved)
    B, T = plans[4].shape
    split = []
    for b in range(B):
        rows = []
        for t in range(T):
            s0 = int(full_idesc[0][b, t, 0])
            ln = int(full_idesc[1][b, t, 0])
            parts = []
            off = 0
            while off < ln:
                take = min(257, ln - off)
                parts.append((s0 + off, take))
                off += take
            rows.append(parts)
        split.append(rows)
    NR = max(len(p) for rows in split for p in rows)
    st = np.zeros((B, T, NR), np.int32)
    ln_ = np.zeros((B, T, NR), np.int32)
    w = np.zeros((B, T, NR), np.float32)
    fb = np.full((B, T, NR), 0.75, np.float32)
    av = np.full((B, T, NR), 30.0, np.float32)
    qplans = []
    for b in range(B):
        for t in range(T):
            for r, (s0, l0) in enumerate(split[b][t]):
                st[b, t, r] = s0
                ln_[b, t, r] = l0
                w[b, t, r] = 1.0
        # splits of one span share its ordinal (0 — one span per token
        # here); _pruned_bs_inputs only re-joins same-span pieces
        span_ord = np.where(ln_[b] > 0, 0, -1).astype(np.int32)
        qplans.append(QueryPlan(
            starts=st[b], lens=ln_[b], weights=w[b], field_b=fb[b],
            avg_flen=av[b], n_tokens=T, max_range_len=257,
            range_span=span_ord,
        ))
    rng_i, rng_f, bs = PrunedPlanMixin._pruned_bs_inputs(qplans)
    # coalescing must recover the unsplit spans
    assert rng_i.shape[3] == 1
    assert np.array_equal(
        rng_i[1][:B, :, 0], full_idesc[1][:, :, 0]
    )
    vd, idd, _ = dense_reference(
        corpus, np.stack([st, ln_]), np.stack([w, fb, av]),
        [0.0, 0.0], None, 8,
    )
    from oramacore_tpu.ops.pruned import pruned_fulltext_topk_bs

    idf = plans[4]
    pre_idesc = plans[2]
    vp, idp, _ = pruned_fulltext_topk_bs(
        jnp.asarray(corpus["p_doc"]), jnp.asarray(corpus["p_tf"]),
        jnp.asarray(corpus["p_flen"]),
        jnp.asarray(pre_idesc[0]), jnp.asarray(pre_idesc[1]),
        jnp.asarray(rng_i[:, :B]), jnp.asarray(rng_f[:, :B]),
        jnp.asarray(idf),
        jnp.zeros((B,), jnp.float32),
        jnp.ones((1,), jnp.float32), None, None,
        hp=max(int(pre_idesc[1].max()), 8), cap=2000, k=8,
        bs_steps=bs, has_omc=False,
    )
    assert_topk_equal(vd, idd, np.asarray(vp), np.asarray(idp))


def test_pruned_bs_inputs_never_merges_distinct_spans():
    """Regression (advisor r3, medium): _pruned_bs_inputs must NOT
    re-join slab-adjacent ranges that belong to DIFFERENT spans
    (consecutive committed segments of one term, or a committed tail
    abutting the live region) — after doc-id resurrection their
    concatenation is not globally doc-sorted and the binary-search
    rescore would silently return wrong tf. Only MAX_RANGE_LEN split
    pieces (same range_span ordinal) may merge; plans without
    range_span never merge."""
    from oramacore_tpu.index.search_exec import PrunedPlanMixin
    from oramacore_tpu.index.string_index import QueryPlan

    def plan(starts_lens, span_ords):
        nr = len(starts_lens)
        st = np.zeros((1, nr), np.int32)
        ln = np.zeros((1, nr), np.int32)
        for r, (s, l) in enumerate(starts_lens):
            st[0, r], ln[0, r] = s, l
        kw = dict(
            starts=st, lens=ln,
            weights=np.ones((1, nr), np.float32),
            field_b=np.full((1, nr), 0.75, np.float32),
            avg_flen=np.full((1, nr), 30.0, np.float32),
            n_tokens=1, max_range_len=int(ln.max()),
        )
        if span_ords is not None:
            kw["range_span"] = np.asarray([span_ords], np.int32)
        return QueryPlan(**kw)

    # adjacent + identical params, DIFFERENT spans -> two ranges
    rng_i, _, _ = PrunedPlanMixin._pruned_bs_inputs(
        [plan([(100, 50), (150, 30)], [0, 1])]
    )
    kept = rng_i[1][0, 0]
    assert sorted(kept[kept > 0].tolist()) == [30, 50]
    # adjacent + identical params, SAME span (splits) -> one range
    rng_i, _, _ = PrunedPlanMixin._pruned_bs_inputs(
        [plan([(100, 50), (150, 30)], [0, 0])]
    )
    kept = rng_i[1][0, 0]
    assert kept[kept > 0].tolist() == [80]
    # no range_span on the plan -> never merge
    rng_i, _, _ = PrunedPlanMixin._pruned_bs_inputs(
        [plan([(100, 50), (150, 30)], None)]
    )
    kept = rng_i[1][0, 0]
    assert sorted(kept[kept > 0].tolist()) == [30, 50]


def test_pruned_bs_hybrid_parity():
    """Full-coverage v4 hybrid == dense fused int8 hybrid."""
    from oramacore_tpu.ops.hybrid import hybrid_search_topk_packed_int8
    from oramacore_tpu.ops.pruned import pruned_hybrid_topk_int8_bs

    n_docs = 700
    corpus = build_corpus(n_docs=n_docs, n_terms=24, seed=9,
                          prefix_len=10**9)
    ivf = build_ivf(n_docs)
    rng = np.random.default_rng(13)
    B = 4
    queries = [[0, 2, 5], [1, 3], [4, 8], [0, 7]]
    (full_idesc, full_fdesc, pre_idesc, pre_fdesc, idf, _wi, _wf) = (
        build_plans(corpus, queries)
    )
    qvecs = rng.normal(size=(B, 16)).astype(np.float32)
    qvecs /= np.linalg.norm(qvecs, axis=1, keepdims=True)
    sims = np.full((B,), 0.1, np.float32)
    thr = np.zeros((B,), np.float32)

    lr = 8
    while lr < int(full_idesc[1].max()):
        lr *= 2
    capb = 128
    while capb < n_docs:
        capb *= 2
    scalars = np.stack([
        np.full((B,), float(n_docs), np.float32), thr, sims,
    ])
    vd, idd, _ = hybrid_search_topk_packed_int8(
        jnp.asarray(corpus["p_doc"]), jnp.asarray(corpus["p_tf"]),
        jnp.asarray(corpus["p_etf"]), jnp.asarray(corpus["p_flen"]),
        jnp.asarray(full_idesc), jnp.asarray(full_fdesc),
        jnp.asarray(scalars),
        jnp.asarray(ivf["mat_i8"]), jnp.asarray(ivf["scales"]),
        jnp.asarray(ivf["row_doc"]), jnp.asarray(ivf["unit_cen"]),
        jnp.asarray(ivf["unit_starts"]),
        jnp.asarray(qvecs),
        jnp.zeros((1, 1), bool), jnp.ones((1,), jnp.float32),
        lr=lr, exact=False, cap=capb, k=10,
        V=1024, nprobe=ivf["n_units"], window=ivf["window"],
        has_mask=False, has_omc=False,
        has_rescale=False, rescale_lo=0.0, rescale_hi=1.0,
    )
    bs = 4
    while (1 << bs) < int(full_idesc[1].max()) + 1:
        bs += 4
    vp, idp, _ = pruned_hybrid_topk_int8_bs(
        jnp.asarray(corpus["p_doc"]), jnp.asarray(corpus["p_tf"]),
        jnp.asarray(corpus["p_flen"]),
        jnp.asarray(pre_idesc[0]), jnp.asarray(pre_idesc[1]),
        jnp.asarray(full_idesc), jnp.asarray(full_fdesc),
        jnp.asarray(idf), jnp.asarray(thr),
        jnp.asarray(ivf["mat_i8"]), jnp.asarray(ivf["scales"]),
        jnp.asarray(ivf["row_doc"]), jnp.asarray(ivf["unit_cen"]),
        jnp.asarray(ivf["unit_starts"]), jnp.asarray(ivf["doc2row"]),
        jnp.asarray(qvecs), jnp.asarray(sims),
        jnp.ones((1,), jnp.float32),
        hp=max(int(pre_idesc[1].max()), 8), cap=n_docs, k=10,
        bs_steps=bs, has_omc=False,
        V=1024, nprobe=ivf["n_units"], window=ivf["window"],
        has_rescale=False, rescale_lo=0.0, rescale_hi=1.0,
    )
    assert_topk_equal(np.asarray(vd), np.asarray(idd),
                      np.asarray(vp), np.asarray(idp), tol=5e-3)


def test_estimate_match_count():
    assert estimate_match_count(1000, [1000]) == 1000
    assert estimate_match_count(1000, []) == 0
    est = estimate_match_count(1000, [500, 500])
    assert est == 750


def _naive_counts(corpus, queries_terms, thr, exact=False):
    """Ground-truth counts: distinct docs whose distinct matched-token
    count clears max(thr, 1) — tf (or exact tf) must be positive."""
    tf_src = corpus["p_etf"] if exact else corpus["p_tf"]
    out = []
    for terms, t0 in zip(queries_terms, thr):
        per_doc = {}
        for ti, t in enumerate(terms):
            s, n = int(corpus["tstart"][t]), int(corpus["df"][t])
            for j in range(s, s + n):
                if tf_src[j] > 0:
                    per_doc.setdefault(int(corpus["p_doc"][j]), set()).add(ti)
        need = max(float(t0), 1.0)
        out.append(sum(1 for s_ in per_doc.values() if len(s_) >= need))
    return np.asarray(out, np.int32)


@pytest.mark.parametrize("exact", [False, True])
def test_pruned_exact_counts_kernel(exact):
    """The opt-in counting dispatch (ops/pruned.py pruned_exact_counts)
    returns EXACT corpus-wide match counts: cross-token doc overlap
    deduped, exact-mode zero-tf postings excluded, thresholds applied as
    min distinct matched tokens."""
    from oramacore_tpu.ops.pruned import pruned_exact_counts

    corpus = build_corpus(n_docs=1200, n_terms=32, seed=5, prefix_len=10**9)
    queries = [[0, 1, 2], [3, 4], [0], [5, 6, 7]]
    thr = [0.0, 2.0, 0.0, 3.0]
    plans = build_plans(corpus, queries)
    _, _, _, _, idf, wl_i, wl_f = plans
    B, T = idf.shape
    counts = np.asarray(
        pruned_exact_counts(
            jnp.asarray(corpus["p_doc"]), jnp.asarray(corpus["p_tf"]),
            jnp.asarray(corpus["p_etf"]),
            jnp.asarray(wl_i),
            jnp.asarray(np.asarray(thr, np.float32)),
            lch=LCH, cap=corpus["n_docs"], T=T, exact=exact,
        )
    )
    want = _naive_counts(corpus, queries, thr, exact=exact)
    assert np.array_equal(counts, want), (counts, want)


def test_pruned_exact_counts_matches_dense_counts():
    """Exact counts must equal the dense kernel's counts (same keep
    semantics: score > 0 <=> at least one matched token)."""
    from oramacore_tpu.ops.pruned import pruned_exact_counts

    corpus = build_corpus(n_docs=900, n_terms=24, seed=9, prefix_len=10**9)
    queries = [[0, 2, 4], [1, 3]]
    thr = [0.0, 0.0]
    plans = build_plans(corpus, queries)
    full_idesc, full_fdesc, _, _, idf, wl_i, wl_f = plans
    B, T = idf.shape
    _, _, cd = dense_reference(corpus, full_idesc, full_fdesc, thr, None, 8)
    counts = np.asarray(
        pruned_exact_counts(
            jnp.asarray(corpus["p_doc"]), jnp.asarray(corpus["p_tf"]),
            jnp.asarray(corpus["p_etf"]),
            jnp.asarray(wl_i),
            jnp.asarray(np.asarray(thr, np.float32)),
            lch=LCH, cap=corpus["n_docs"], T=T, exact=False,
        )
    )
    assert np.array_equal(counts, cd), (counts, cd)


# ---------------------------------------------------------------------------
# Filtered pruning (round 3): masked nomination/rescore + cand-given mode
# ---------------------------------------------------------------------------


def test_pruned_filtered_masked_parity():
    """Masked mode (filter larger than the candidate budget would be in
    production; here C covers the corpus so parity is EXACT): scores use
    the filtered-df IDF and counts equal the dense filtered counts."""
    corpus = build_corpus(n_docs=1500, n_terms=64, seed=5, prefix_len=10**9)
    rng = np.random.default_rng(17)
    mask = rng.random(1500) < 0.55
    queries = [[0, 3, 10], [1, 2], [5, 20, 40], [7]]
    plans = build_plans(corpus, queries)
    thr = [0.0, 2.0, 0.0, 0.0]
    omc = np.ones(1500, np.float32)
    omc[::5] = 1.4
    vd, idd, cd = dense_reference(
        corpus, plans[0], plans[1], thr, omc, 10, mask=mask
    )
    vp, idp, cp = run_pruned(
        corpus, plans, thr, omc, 10, C=2048, mask=mask
    )
    assert_topk_equal(vd, idd, vp, idp)
    assert np.array_equal(cd, cp)
    # every returned hit is inside the filter
    for b in range(idp.shape[0]):
        for v, d in zip(vp[b], idp[b]):
            if np.isfinite(v) and v > 0:
                assert mask[d], (b, d)


def test_pruned_filtered_cand_given_parity():
    """Small filters become the candidate set (phase 1 skipped): exact
    results and exact counts at ANY candidate budget >= |filter|."""
    corpus = build_corpus(n_docs=1500, n_terms=64, seed=6, prefix_len=10**9)
    rng = np.random.default_rng(23)
    sel = rng.choice(1500, size=90, replace=False)
    mask = np.zeros(1500, bool)
    mask[sel] = True
    queries = [[0, 3, 10], [1, 2], [4, 9]]
    plans = build_plans(corpus, queries)
    thr = [0.0, 2.0, 0.0]
    vd, idd, cd = dense_reference(
        corpus, plans[0], plans[1], thr, None, 8, mask=mask
    )
    vp, idp, cp = run_pruned(
        corpus, plans, thr, None, 8, C=128, mask=mask, cand_given=True
    )
    assert_topk_equal(vd, idd, vp, idp)
    assert np.array_equal(cd, cp)


def test_pruned_filtered_exact_mode():
    """exact=True + filter: exact-tf postings only, within the mask."""
    corpus = build_corpus(n_docs=800, n_terms=32, seed=8, prefix_len=10**9)
    rng = np.random.default_rng(29)
    mask = rng.random(800) < 0.4
    queries = [[0, 1], [4, 9]]
    plans = build_plans(corpus, queries)
    vd, idd, cd = dense_reference(
        corpus, plans[0], plans[1], [0.0, 0.0], None, 8, exact=True,
        mask=mask,
    )
    vp, idp, cp = run_pruned(
        corpus, plans, [0.0, 0.0], None, 8, C=1024, exact=True, mask=mask
    )
    assert_topk_equal(vd, idd, vp, idp)
    assert np.array_equal(cd, cp)


def _naive_counts_filtered(corpus, queries_terms, thr, mask, exact=False):
    tf_src = corpus["p_etf"] if exact else corpus["p_tf"]
    out = []
    for terms, t0 in zip(queries_terms, thr):
        per_doc = {}
        for ti, t in enumerate(terms):
            s, n = int(corpus["tstart"][t]), int(corpus["df"][t])
            for j in range(s, s + n):
                d = int(corpus["p_doc"][j])
                if tf_src[j] > 0 and mask[d]:
                    per_doc.setdefault(d, set()).add(ti)
        need = max(float(t0), 1.0)
        out.append(sum(1 for s_ in per_doc.values() if len(s_) >= need))
    return np.asarray(out, np.int32)


def test_pruned_exact_counts_kernel_filtered():
    """The counting dispatch under a filter counts matches WITHIN the
    filter only (dense filtered-count semantics)."""
    from oramacore_tpu.ops.pruned import pruned_exact_counts

    corpus = build_corpus(n_docs=900, n_terms=40, seed=9, prefix_len=10**9)
    rng = np.random.default_rng(31)
    mask = rng.random(900) < 0.5
    queries = [[0, 2, 5], [1, 3], [7]]
    thr = [0.0, 2.0, 0.0]
    plans = build_plans(corpus, queries)
    _, _, _, _, _, wl_i, wl_f = plans
    fmask = np.zeros(900, np.float32)
    fmask[mask] = 1.0
    got = np.asarray(pruned_exact_counts(
        jnp.asarray(corpus["p_doc"]), jnp.asarray(corpus["p_tf"]),
        jnp.asarray(corpus["p_etf"]),
        jnp.asarray(wl_i), jnp.asarray(np.asarray(thr, np.float32)),
        jnp.asarray(fmask),
        lch=LCH, cap=900, T=3, exact=False, has_filter=True,
    ))
    want = _naive_counts_filtered(corpus, queries, thr, mask)
    assert np.array_equal(got, want), (got, want)


def test_pruned_filtered_empty_filter():
    """An all-False filter returns no hits and zero counts."""
    corpus = build_corpus(n_docs=500, n_terms=16, seed=10, prefix_len=10**9)
    mask = np.zeros(500, bool)
    queries = [[0, 1]]
    plans = build_plans(corpus, queries)
    vp, idp, cp = run_pruned(
        corpus, plans, [0.0], None, 8, C=64, mask=mask, cand_given=True
    )
    assert not np.any(np.isfinite(vp) & (vp > 0))
    assert cp[0] == 0


def test_rescore_bsearch_bucket_index_parity():
    """The bucket-index window (boff) changes ROUNDS, never results:
    windowed and full binary searches must return bit-identical
    scores/matched for random doc-sorted ranges and candidates
    (search_exec._pruned_bs_boff contract)."""
    import jax.numpy as jnp

    from oramacore_tpu.ops.pruned import _rescore_bsearch

    rng = np.random.default_rng(3)
    cap = 2048
    P = 8000
    p_doc = np.zeros(P, np.int32)
    p_tf = np.zeros(P, np.float32)
    p_fl = np.ones(P, np.float32)
    st = np.zeros((2, 2, 2), np.int32)
    ln = np.zeros((2, 2, 2), np.int32)
    off = 0
    for b in range(2):
        for t in range(2):
            for r in range(2):
                n = int(rng.integers(30, 1200))
                docs = np.sort(
                    rng.choice(cap, size=n, replace=False)
                ).astype(np.int32)
                p_doc[off:off + n] = docs
                p_tf[off:off + n] = rng.integers(1, 5, n)
                st[b, t, r] = off
                ln[b, t, r] = n
                off += n
    w = rng.uniform(0.5, 2.0, (2, 2, 2)).astype(np.float32)
    fb = np.full((2, 2, 2), 0.75, np.float32)
    av = np.ones((2, 2, 2), np.float32)
    idf = rng.uniform(0.5, 3.0, (2, 2)).astype(np.float32)
    cand = np.sort(
        rng.choice(cap + 1, size=(2, 128)), axis=1
    ).astype(np.int32)  # incl. cap sentinels

    # flat-table triple (r5 format): one row per range, per-range
    # shift — uniform K here, mixed resolutions via a halved-K row for
    # one range (exercises the per-range shift path)
    K = 64
    sh = int(np.log2(cap // K))
    rows = [np.zeros(2, np.int32)]   # dummy row
    base = np.zeros((2, 2, 2), np.int32)
    shift = np.full((2, 2, 2), int(np.log2(cap)), np.int32)
    total = 2
    mx = 1
    for b in range(2):
        for t in range(2):
            for r in range(2):
                s0, n = int(st[b, t, r]), int(ln[b, t, r])
                sh_r = sh + 1 if (b, t, r) == (0, 1, 1) else sh
                K_r = cap >> sh_r
                grid = np.arange(1, K_r, dtype=np.int64) << sh_r
                row = np.empty(K_r + 1, np.int32)
                row[0] = 0
                if K_r > 1:
                    row[1:K_r] = np.searchsorted(p_doc[s0:s0 + n], grid)
                row[K_r] = n
                base[b, t, r] = total
                shift[b, t, r] = sh_r
                rows.append(row)
                total += K_r + 1
                mx = max(mx, int(np.diff(row).max()))
    flat = np.concatenate(rows + [np.zeros(1, np.int32)])
    steps2 = 4
    while (1 << steps2) < mx + 1:
        steps2 += 4

    args = [jnp.asarray(a) for a in (
        p_doc, p_tf, p_fl, st, ln, w, fb, av, idf, cand,
    )]
    sa, ma = _rescore_bsearch(*args, bs_steps=12)
    sb, mb = _rescore_bsearch(
        *args, bs_steps=steps2,
        boff=(jnp.asarray(flat), jnp.asarray(base),
              jnp.asarray(shift)),
        cap=cap,
    )
    assert np.array_equal(np.asarray(ma), np.asarray(mb))
    assert np.array_equal(np.asarray(sa), np.asarray(sb))
    assert steps2 < 12  # the windows actually cut rounds
