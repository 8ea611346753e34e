"""Pruned BM25F scoring for huge corpora: candidates + exact rescore.

The dense scoring path (ops/bm25.py) accumulates every posting into a
(B, cap) score matrix. At cap ~ 10M the per-token aggregation is a
scatter-add measured at ~43M postings/s on TPU v5e (benches/RESULTS.md
"Batched fused hybrid at 10M docs") — a 350k-df term costs ~9 ms per
query. TPUs have no fast scatter; the reference stays fast at scale via
FST/postings locality instead
(src/collection_manager/sides/read/index/string_field.rs:19-28).

This module replaces the dense accumulator with a TPU-native two-phase
plan that never scatters into the doc space:

- PHASE 1 (candidates): score only the IMPACT-ORDERED PREFIX of each
  posting range (commit stores postings highest-normalized-TF first,
  index/string_index.py _pack_segment). Per-doc partial scores come from
  a sort + segmented-sum over the (doc, token)-keyed prefix
  contributions — cumsum tricks on sorted keys, no scatter. The top-C
  partial scorers become the candidate set. This is the fix for the
  recall-0.04 `impact_cap` footgun (benches/RESULTS.md): prefix-partial
  scores ONLY nominate candidates, they never rank the final result.

- PHASE 2 (exact rescore): stream the FULL posting ranges of every query
  token in chunks; each chunk sorts by doc id, prefix-sums the
  contributions, and every candidate's total is a two-gather difference
  of the prefix sums at its binary-searched lower/upper bounds.
  Candidate scores, per-token accumulators, saturation and
  matched-token counts are all EXACT — sort + cumsum + gathers replace
  the scatter entirely.

Result quality: the final top-k is exact iff every true top-k doc made
the candidate set; a miss requires a doc to rank below top-C on
prefix-partial score yet inside the true top-k. Parity is asserted
exactly for C >= corpus (tests) and as >=0.95 top-10 overlap at scale
(benches/hybrid10m_bench.py --pruned).

Known approximations (documented, all bounded):
- phase-1 nomination ranks with a HOST idf from posting-range lengths
  (nomination-only; the rescore recomputes idf on device). Multi-field
  df is EXACT: duplicates across fields subtract via earlier-span
  binary-search membership (_rescore_worklist nre/bs_steps);
- total match `counts` over the corpus cannot be known without a full
  aggregation — the kernel returns the count of verified candidates (a
  lower bound); callers may substitute the union-probability estimate
  (search_exec.estimate_match_count);
- per-query filters (where-filters and tombstone alive-masks) gather
  the mask per posting in BOTH phases, so contributions and df exclude
  out-of-filter docs — the same filtered-df IDF the dense path computes
  (collect_contributions_with_filter, token_score.rs:229-251). A filter
  selecting <= C docs skips phase 1 entirely: the filtered doc set IS
  the candidate list, making results and counts exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .bm25 import K1

NEG_INF = -1e30


def _seg_totals_sorted(keys: jax.Array, vals: jax.Array):
    """Segmented sums over runs of equal (sorted) keys, scatter-free
    AND gather-free.

    keys int32[B, M] non-decreasing along axis 1; vals f32[B, M]
    NON-NEGATIVE (every caller feeds ntf or saturated-BM25 partials,
    both >= 0 — the invariant that makes the cummax trick valid).
    Returns (is_end bool[B, M], totals f32[B, M]) where totals[i] holds
    the full run sum at each run-END position (junk elsewhere).

    The run base is the PREVIOUS run's end cumsum, propagated with one
    cummax over the (non-decreasing, since vals >= 0) cumsum masked to
    run ends — no take_along_axis. The earlier formulation gathered
    the run-start exclusive cumsum with a (B, M) take_along_axis,
    which XLA lowers to elementwise HBM gathers at ~70M elem/s on TPU:
    446 ms of a 517 ms nominator at (64, 196k) (r5 hardware split,
    benches/RESULTS.md round-5) — the gather WAS the v4 kernel's
    dominant cost, misattributed to the sort in round 4.
    """
    B, M = keys.shape
    cs = jnp.cumsum(vals, axis=1)
    is_end = jnp.concatenate(
        [keys[:, 1:] != keys[:, :-1], jnp.ones((B, 1), bool)], axis=1
    )
    end_cs = jnp.where(is_end, cs, NEG_INF)
    prev = jnp.concatenate(
        [jnp.full((B, 1), NEG_INF, cs.dtype), end_cs[:, :-1]], axis=1
    )
    prev = jax.lax.cummax(prev, axis=1)
    base = jnp.where(prev > NEG_INF / 2, prev, 0.0)
    totals = cs - base
    return is_end, totals


def _lower_bound(sorted_vals: jax.Array, queries: jax.Array) -> jax.Array:
    """Vectorized lower_bound: first index where sorted_vals >= query.

    sorted_vals int32[B, C] ascending (any C), queries int32[B, L].
    Returns int32[B, L] in [0, C]. log2(C) gather rounds — the
    scatter-free join of postings onto sorted key tables (uniform binary
    search with an upper-guard so C need not be a power of two).
    """
    B, C = sorted_vals.shape
    pos = jnp.zeros(queries.shape, jnp.int32)
    step = 1
    while step * 2 <= C:
        step *= 2
    while step >= 1:
        probe = pos + step
        pv = jnp.take_along_axis(
            sorted_vals, jnp.minimum(probe, C) - 1, axis=1
        )
        pos = jnp.where((probe <= C) & (pv < queries), probe, pos)
        step >>= 1
    return pos


def _prefix_candidates(
    p_doc, tf_src, p_flen,
    pre_starts, pre_lens,      # int32[B, T, NPR] (lens <= lp)
    pre_w, pre_fb, pre_av,     # f32[B, T, NPR]
    idf,                       # f32[B, T]
    fmask=None,                # f32[cap(+pad)] filter (1 = doc allowed)
    *,
    lp: int, cap: int, C: int,
):
    """Phase 1: top-C candidate docs per query from impact prefixes.

    Returns cand int32[B, C] sorted ascending; `cap` marks empty slots.
    """
    B, T, NPR = pre_starts.shape
    TT = 1
    while TT < T + 1:
        TT *= 2
    assert cap * TT + TT < 2**31, "doc-id x token key overflows int32"

    flat = pre_starts.reshape(-1)
    docs = jax.vmap(lambda s: jax.lax.dynamic_slice(p_doc, (s,), (lp,)))(
        flat
    ).reshape(B, T, NPR, lp)
    tf = jax.vmap(lambda s: jax.lax.dynamic_slice(tf_src, (s,), (lp,)))(
        flat
    ).reshape(B, T, NPR, lp)
    fl = jax.vmap(lambda s: jax.lax.dynamic_slice(p_flen, (s,), (lp,)))(
        flat
    ).reshape(B, T, NPR, lp)

    # dynamic_slice CLAMPS starts within lp of the slab end (reads the
    # window at P - lp instead): slot j then holds posting s_eff + j,
    # and the range's own postings live at slots [shift, shift + len)
    # where shift = s - s_eff (advisor r3: unshifted masks nominated
    # wrong doc ids near the tail)
    P = p_doc.shape[0]
    s_eff = jnp.clip(flat, 0, max(P - lp, 0))
    shift = (flat - s_eff).reshape(B, T, NPR)[:, :, :, None]
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, lp), 3)
    valid = (slot >= shift) & (slot < shift + pre_lens[:, :, :, None])
    fb = pre_fb[:, :, :, None]
    denom = (1.0 - fb) + fb * fl / jnp.maximum(pre_av[:, :, :, None], 1e-9)
    ntf = pre_w[:, :, :, None] * tf / jnp.maximum(denom, 1e-9)
    keep = valid & (tf > 0)
    if fmask is not None:
        # filtered searches nominate only in-filter docs (out-of-filter
        # prefix entries must not burn candidate slots)
        keep = keep & (
            jnp.take(fmask, jnp.clip(docs, 0, fmask.shape[0] - 1)) > 0.0
        )
    ntf = jnp.where(keep, ntf, 0.0)
    docs = jnp.where(keep, docs, cap)
    tok = jax.lax.broadcasted_iota(jnp.int32, (1, T, 1, 1), 1)
    key = docs * TT + tok                                   # (B, T, NPR, lp)

    M = T * NPR * lp
    key = key.reshape(B, M)
    ntf = ntf.reshape(B, M)
    key_s, ntf_s = jax.lax.sort((key, ntf), dimension=1, num_keys=1)

    # per-(doc, token) accumulation -> saturation. Scans are ~25 ms
    # EACH at (64, 196k) on v5e (r5 micro) — every one avoided counts:
    # with NPR == 1 a term's prefix has DISTINCT docs (one segment, one
    # block), so (doc, token) keys are unique and the token-level
    # segmented sum is the identity (duplicate sentinel keys die on the
    # key_s < cap*TT guard below).
    if NPR == 1:
        t_end = jnp.ones(key_s.shape, bool)
        t_acc = ntf_s
    else:
        t_end, t_acc = _seg_totals_sorted(key_s, ntf_s)
    tok_s = jnp.clip(key_s - (key_s // TT) * TT, 0, T - 1)
    # per-element idf via a T-way select chain — take_along_axis here
    # is a (B, M) elementwise gather (~70M elem/s on TPU, the same
    # pathology as the old seg-sum base gather); T <= 8 compares fuse
    # into the surrounding elementwise work for free
    idf_s = jnp.zeros_like(t_acc)
    for _t in range(T):
        idf_s = idf_s + jnp.where(tok_s == _t, idf[:, _t, None], 0.0)
    sat = idf_s * (K1 + 1.0) * t_acc / (K1 + t_acc)
    sat = jnp.where(t_end & (t_acc > 0.0) & (key_s < cap * TT), sat, 0.0)

    # per-doc partial score: a doc's run in the (doc, token)-sorted
    # order has at most T*NPR entries, so for small plans the run
    # total is a windowed sum of T*NPR-1 shifted adds (elementwise,
    # fuses) instead of a cumsum+cummax scan pair
    dkey = key_s // TT
    WRUN = T * NPR
    if WRUN <= 8:
        d_end = jnp.concatenate(
            [dkey[:, 1:] != dkey[:, :-1], jnp.ones((B, 1), bool)],
            axis=1,
        )
        d_tot = sat
        for _k in range(1, WRUN):
            same = dkey[:, _k:] == dkey[:, :-_k]
            shifted = jnp.where(same, sat[:, :-_k], 0.0)
            d_tot = d_tot + jnp.pad(shifted, ((0, 0), (_k, 0)))
    else:
        d_end, d_tot = _seg_totals_sorted(dkey, sat)
    part = jnp.where(d_end & (d_tot > 0.0) & (dkey < cap), d_tot, NEG_INF)

    if C > part.shape[1]:  # tiny prefix pools: pad up to the budget
        padn = C - part.shape[1]
        part = jnp.pad(part, ((0, 0), (0, padn)), constant_values=NEG_INF)
        dkey = jnp.pad(dkey, ((0, 0), (0, padn)), constant_values=cap)
    _, pi = jax.lax.top_k(part, C)
    pv = jnp.take_along_axis(part, pi, axis=1)
    cand = jnp.take_along_axis(dkey, pi, axis=1)
    cand = jnp.where(pv > NEG_INF / 2, cand, cap)
    cand = jax.lax.sort(cand, dimension=1)
    # safety dedup (top-C of doc-run-ends is already unique per doc)
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), bool), cand[:, 1:] == cand[:, :-1]], axis=1
    )
    cand = jnp.where(dup, cap, cand)
    return jax.lax.sort(cand, dimension=1)


def _rescore_worklist(
    p_doc, tf_src, p_flen,
    wl_i,                      # int32[4, W]: b, t, start, len (len <= lch)
    wl_f,                      # f32[3, W]: weight, field_b, avg_flen
    n_docs,                    # f32[B] corpus size (for the IDF)
    cand,                      # int32[B, C] sorted ascending (cap = empty)
    wl_prev=None,              # int32[2, W, NRE]: earlier-FIELD spans
    fmask=None,                # f32[cap(+pad)] filter (1 = doc allowed)
    *,
    lch: int, C: int, T: int, wch: int = 128,
    nre: int = 0, bs_steps: int = 0,
    axis_name=None,
):
    """Phase 2: EXACT BM25F scores + matched-token counts for the
    candidate set, streaming a PACKED WORKLIST of (query, token, chunk)
    entries — work is proportional to the batch's REAL postings, not to
    a (B, T, NR, LR) padded grid (small-df terms in a batch with one
    373k-df term previously paid the 131k-slot bucket).

    Ranges are DOC-SORTED at commit (string_index._pack_segment), so a
    gathered chunk is already sorted: contributions resolve with a
    cumsum + two binary-searched prefix-sum gathers per candidate — no
    device sort, no scatter, no one-hot (a per-chunk lax.sort measured
    ~30 ms/query at the 10M tier: TPU sorts are the enemy; an earlier
    (B, L, C) one-hot matvec was worse still).

    Per-entry results reduce onto (B*T) rows with one small one-hot
    matmul; the per-token document frequency is counted in the same
    stream (postings with tf_src > 0 — exact within a field, whose
    ranges are doc-disjoint; exact-mode df over exact_tf comes free).

    MULTI-FIELD df (nre > 0): the reference's corpus_df is the UNION of
    docs across fields (token_score.rs corpus_docs set), so a posting
    whose doc already appeared in an EARLIER field's span of the same
    token must not count again. wl_prev carries each entry's earlier
    doc-sorted spans; membership is a bs_steps-round uniform binary
    search with global slab gathers — duplicates subtract from df.

    Under a doc-sharded mesh (axis_name set, parallel/engine.py) the
    slab, worklist and candidates are all SHARD-LOCAL (docs live in
    exactly one shard), so only the document frequency needs a
    collective: one psum over the mesh axis turns the per-shard df into
    the global df before the IDF — scores stay shard-local and exact.
    Returns (scores f32[B, C], matched f32[B, C])."""
    W = wl_i.shape[1]
    B = cand.shape[0]
    assert W % wch == 0
    BT = B * T
    iot = jax.lax.broadcasted_iota(jnp.int32, (1, lch), 1)
    sentinel = jnp.int32(2**30)
    cand_hi = jnp.minimum(cand + 1, sentinel)

    def step(carry, j):
        acc_bt, df_bt = carry
        bw = jax.lax.dynamic_slice(wl_i[0], (j * wch,), (wch,))
        tw = jax.lax.dynamic_slice(wl_i[1], (j * wch,), (wch,))
        st = jax.lax.dynamic_slice(wl_i[2], (j * wch,), (wch,))
        ln = jax.lax.dynamic_slice(wl_i[3], (j * wch,), (wch,))
        ww = jax.lax.dynamic_slice(wl_f[0], (j * wch,), (wch,))
        fbw = jax.lax.dynamic_slice(wl_f[1], (j * wch,), (wch,))
        avw = jax.lax.dynamic_slice(wl_f[2], (j * wch,), (wch,))
        docs = jax.vmap(
            lambda x: jax.lax.dynamic_slice(p_doc, (x,), (lch,))
        )(st)
        tf = jax.vmap(
            lambda x: jax.lax.dynamic_slice(tf_src, (x,), (lch,))
        )(st)
        fl = jax.vmap(
            lambda x: jax.lax.dynamic_slice(p_flen, (x,), (lch,))
        )(st)
        validm = iot < ln[:, None]
        denom = (1.0 - fbw[:, None]) + fbw[:, None] * fl / jnp.maximum(
            avw[:, None], 1e-9
        )
        ntf = ww[:, None] * tf / jnp.maximum(denom, 1e-9)
        keepm = validm & (tf > 0)
        if fmask is not None:
            # filtered-IDF semantics (ops/bm25.py:22, token_score.rs
            # collect_contributions_with_filter): out-of-filter postings
            # contribute nothing AND do not count toward df, so the IDF
            # below is the exact filtered-df IDF
            keepm = keepm & (
                jnp.take(fmask, jnp.clip(docs, 0, fmask.shape[0] - 1))
                > 0.0
            )
        ntf = jnp.where(keepm, ntf, 0.0)
        dkey = jnp.where(validm, docs, sentinel)  # suffix stays sorted
        pref = jnp.concatenate(
            [jnp.zeros((wch, 1), jnp.float32), jnp.cumsum(ntf, axis=1)],
            axis=1,
        )                                               # (wch, lch + 1)
        cw = jnp.take(cand, bw, axis=0)                 # (wch, C)
        cwhi = jnp.take(cand_hi, bw, axis=0)
        lb = _lower_bound(dkey, cw)
        ub = _lower_bound(dkey, cwhi)
        contrib = (
            jnp.take_along_axis(pref, ub, axis=1)
            - jnp.take_along_axis(pref, lb, axis=1)
        )                                               # (wch, C)
        df_inc = jnp.sum(keepm, axis=1).astype(jnp.float32)
        if nre:
            # subtract postings whose doc already appeared in an EARLIER
            # field's span of the same token (union df)
            seen = jnp.zeros((wch, lch), bool)
            for e in range(nre):
                st_e = jax.lax.dynamic_slice(
                    wl_prev[0], (j * wch, e), (wch, 1)
                )                                       # (wch, 1)
                ln_e = jax.lax.dynamic_slice(
                    wl_prev[1], (j * wch, e), (wch, 1)
                )
                pos = jnp.zeros((wch, lch), jnp.int32)
                bstep = 1 << (bs_steps - 1)
                while bstep >= 1:
                    cpos = pos + bstep
                    ok = cpos <= ln_e
                    v = jnp.take(
                        p_doc,
                        jnp.clip(st_e + cpos - 1, 0, p_doc.shape[0] - 1),
                    )
                    pos = jnp.where(ok & (v < docs), cpos, pos)
                    bstep >>= 1
                at = jnp.clip(st_e + pos, 0, p_doc.shape[0] - 1)
                hit = (pos < ln_e) & (jnp.take(p_doc, at) == docs) & (
                    ln_e > 0
                ) & (jnp.take(tf_src, at) > 0)  # exact-mode: a doc with
                # exact_tf=0 in the earlier field never counted there
                seen = seen | hit
            df_inc = df_inc - jnp.sum(
                (seen & keepm).astype(jnp.float32), axis=1
            )
        g = jax.nn.one_hot(bw * T + tw, BT, dtype=jnp.float32)
        acc_bt = acc_bt + jnp.einsum(
            "wc,wg->gc", contrib, g, preferred_element_type=jnp.float32
        )
        df_bt = df_bt + jnp.dot(
            df_inc, g, preferred_element_type=jnp.float32,
        )
        return (acc_bt, df_bt), None

    (acc_bt, df_bt), _ = jax.lax.scan(
        step,
        (jnp.zeros((BT, C), jnp.float32), jnp.zeros((BT,), jnp.float32)),
        jnp.arange(W // wch),
    )
    acc = acc_bt.reshape(B, T, C)
    if axis_name is not None:
        df_bt = jax.lax.psum(df_bt, axis_name)
    df = jnp.maximum(df_bt.reshape(B, T), 1.0)  # corpus_df = max(1, ...)
    idf_dev = jnp.log1p((n_docs[:, None] - df + 0.5) / (df + 0.5))
    present = acc > 0.0
    sat = idf_dev[:, :, None] * (K1 + 1.0) * acc / (K1 + acc)
    scores = jnp.sum(jnp.where(present, sat, 0.0), axis=1)
    matched = jnp.sum(present.astype(jnp.float32), axis=1)
    return scores, matched


@functools.partial(
    jax.jit,
    static_argnames=("lp", "lch", "cap", "C", "k", "T", "exact", "has_omc",
                     "nre", "bs_steps", "has_filter", "cand_given"),
)
def pruned_fulltext_topk(
    p_doc, p_tf, p_exact_tf, p_flen,
    pre_idesc,    # int32[2, B, T, NPR] impact-prefix ranges (lens <= lp)
    pre_fdesc,    # f32[3, B, T, NPR] weights, field_b, avg_flen
    wl_i,         # int32[4, W] rescore worklist: b, t, start, len<=lch
    wl_f,         # f32[3, W] weight, field_b, avg_flen per entry
    idf,          # f32[B, T] host IDF — ONLY ranks phase-1 nominations
    n_docs,       # f32[B] corpus size (device-exact IDF in the rescore)
    thr_counts,   # f32[B] min distinct matched tokens
    omc,          # f32[cap] (dummy (1,) when has_omc=False)
    wl_prev=None, # int32[2, W, NRE] earlier-field spans (multi-field df)
    fmask=None,   # f32[cap] filter mask (dummy (1,) when has_filter=False)
    cand_in=None, # int32[B, C] caller-supplied candidates (small filters)
    *,
    lp: int, lch: int, cap: int, C: int, k: int, T: int,
    exact: bool, has_omc: bool, nre: int = 0, bs_steps: int = 0,
    has_filter: bool = False, cand_given: bool = False,
):
    """Fused pruned full-text search: ONE dispatch, (B, k) results.

    Returns (vals f32[B, k], ids int32[B, k], cand_counts int32[B]) —
    cand_counts is the number of verified candidates passing threshold,
    a LOWER bound on the corpus-wide match count.

    Filtered searches (has_filter): nomination and rescore gather the
    mask per posting, so contributions AND df exclude out-of-filter docs
    — the exact filtered-df IDF of the dense path (ops/bm25.py:186).
    When the filter selects <= C docs the caller passes them AS the
    candidate set (cand_given; sorted ascending, cap-padded) and phase 1
    is skipped entirely: every in-filter doc is verified, so the result
    AND the count are exact.
    """
    tf_src = p_exact_tf if exact else p_tf
    fm = fmask if has_filter else None
    if cand_given:
        cand = cand_in
    else:
        cand = _prefix_candidates(
            p_doc, tf_src, p_flen,
            pre_idesc[0], pre_idesc[1],
            pre_fdesc[0], pre_fdesc[1], pre_fdesc[2],
            idf, fm, lp=lp, cap=cap, C=C,
        )
    scores, matched = _rescore_worklist(
        p_doc, tf_src, p_flen, wl_i, wl_f,
        n_docs, cand, wl_prev, fm, lch=lch, C=C, T=T,
        nre=nre, bs_steps=bs_steps,
    )
    keep = (
        (matched >= thr_counts[:, None]) & (scores > 0.0) & (cand < cap)
    )
    if has_omc:
        omc_c = jnp.take(omc, jnp.clip(cand, 0, omc.shape[0] - 1))
        s = scores * omc_c
    else:
        s = scores
    counts = jnp.sum(keep, axis=1).astype(jnp.int32)
    s = jnp.where(keep, s, -jnp.inf)
    vals, ci = jax.lax.top_k(s, k)
    ids = jnp.take_along_axis(cand, ci, axis=1)
    return vals, ids, counts


@functools.partial(
    jax.jit,
    static_argnames=(
        "lp", "lch", "cap", "C", "k", "T", "exact", "has_omc",
        "V", "nprobe", "window", "has_rescale", "rescale_lo", "rescale_hi",
        "nre", "bs_steps", "has_filter", "cand_given",
    ),
)
def pruned_hybrid_topk_int8(
    p_doc, p_tf, p_exact_tf, p_flen,
    pre_idesc, pre_fdesc, wl_i, wl_f,
    idf, n_docs, thr_counts,
    mat_i8,       # int8[N, D] packed by cluster
    scales,       # f32[N]
    row_doc,      # int32[N] packed row -> doc id
    unit_cen,     # f32[U, D]
    unit_starts,  # int32[U]
    doc2row,      # int32[cap + 1] doc id -> packed row (-1 = no vector)
    queries,      # f32[B, dim] L2-normalized
    sim,          # f32[B] similarity threshold
    omc,          # f32[cap] (dummy (1,) when has_omc=False)
    wl_prev=None, # int32[2, W, NRE] earlier-field spans (multi-field df)
    fmask=None,   # f32[cap] filter mask (dummy (1,) when has_filter=False)
    cand_in=None, # int32[B, Ct] caller-supplied candidates (small filters)
    *,
    lp: int, lch: int, cap: int, C: int, k: int, T: int,
    exact: bool, has_omc: bool,
    V: int, nprobe: int, window: int,
    has_rescale: bool, rescale_lo: float, rescale_hi: float,
    nre: int = 0, bs_steps: int = 0,
    has_filter: bool = False, cand_given: bool = False,
):
    """Fused pruned hybrid over the int8/IVF vector layout.

    Candidates = fulltext prefix top-C UNION the IVF probe's top-V rows;
    both sides are then scored EXACTLY on the candidate set (BM25F via
    the streaming rescore, cosine via an int8 row gather) and fused with
    the reference's min-max-over-span semantics (token_score.rs:357-422)
    — the span is the candidate max, which equals the global max
    whenever each side's argmax is a candidate (it nominated them).

    Filtered searches (has_filter): the fulltext side nominates and
    rescores under the mask (exact filtered-df IDF); IVF probe hits
    outside the filter are dropped before the union. With cand_given the
    caller supplies the (small) filtered doc set as the candidate list —
    every in-filter doc is scored exactly on both sides (the probe still
    runs, only to fold better rows of multi-vector docs).
    """
    from .vector import ivf_int8_topk

    B = queries.shape[0]
    tf_src = p_exact_tf if exact else p_tf
    fm = fmask if has_filter else None

    # vector candidate nomination (IVF probe)
    v_vals, v_rows = ivf_int8_topk(
        queries, mat_i8, scales, unit_cen, unit_starts,
        k=V, nprobe=nprobe, window=window,
    )
    v_docs = jnp.where(
        (v_rows >= 0) & (v_vals > NEG_INF / 2),
        jnp.take(row_doc, jnp.clip(v_rows, 0, row_doc.shape[0] - 1)),
        cap,
    )
    if fm is not None:
        # out-of-filter probe hits must not become candidates (cap means
        # empty; a cap id clipped onto a real doc's mask slot is harmless
        # because every consumer below also requires v_docs < cap)
        v_docs = jnp.where(
            jnp.take(fm, jnp.clip(v_docs, 0, fm.shape[0] - 1)) > 0.0,
            v_docs, cap,
        )

    if cand_given:
        cand = cand_in
        Ct = cand_in.shape[1]
    else:
        # fulltext candidate nomination
        ft_cand = _prefix_candidates(
            p_doc, tf_src, p_flen,
            pre_idesc[0], pre_idesc[1],
            pre_fdesc[0], pre_fdesc[1], pre_fdesc[2],
            idf, fm, lp=lp, cap=cap, C=C,
        )
        # union: sort, mask duplicates to cap, sort again (Ct is small)
        Ct = C + V
        cand = jnp.concatenate([ft_cand, v_docs], axis=1)
        cand = jax.lax.sort(cand, dimension=1)
        dup = jnp.concatenate(
            [jnp.zeros((B, 1), bool), cand[:, 1:] == cand[:, :-1]], axis=1
        )
        cand = jnp.where(dup, cap, cand)
        cand = jax.lax.sort(cand, dimension=1)

    # exact BM25F over the union
    scores, matched = _rescore_worklist(
        p_doc, tf_src, p_flen, wl_i, wl_f,
        n_docs, cand, wl_prev, fm, lch=lch, C=Ct, T=T,
        nre=nre, bs_steps=bs_steps,
    )

    # exact vector score per candidate: gather the doc's int8 row
    rows_c = jnp.take(doc2row, jnp.clip(cand, 0, doc2row.shape[0] - 1))
    safe_rows = jnp.clip(rows_c, 0, mat_i8.shape[0] - 1)
    tiles = jnp.take(mat_i8, safe_rows, axis=0)             # (B, Ct, D)
    sc_c = jnp.take(scales, safe_rows)                      # (B, Ct)
    vec = jnp.einsum(
        "bcd,bd->bc",
        tiles.astype(jnp.bfloat16),
        queries.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * sc_c
    vec = jnp.where((rows_c >= 0) & (cand < cap), vec, 0.0)
    # multi-vector docs: a probe hit may come from a better row than the
    # doc2row representative — fold the probe's own values in (max)
    pos_v = _lower_bound(cand, v_docs)
    posc_v = jnp.minimum(pos_v, Ct - 1)
    hit_v = (
        jnp.take_along_axis(cand, posc_v, axis=1) == v_docs
    ) & (v_docs < cap)
    probe_vals = jnp.where(hit_v, v_vals, 0.0)

    def fold_probe(vec_b, pos_b, val_b):
        return vec_b.at[pos_b].max(val_b)

    vec = jax.vmap(fold_probe)(vec, posc_v, probe_vals)
    if has_rescale:
        vec = jnp.clip(
            (vec - rescale_lo) / (rescale_hi - rescale_lo), 0.0, 1.0
        )
    vec = jnp.where(vec >= sim[:, None], vec, 0.0)

    # reference min-max fusion over the shared span (ops/hybrid.py _fuse)
    ft_keep = (
        (scores > 0.0) & (matched >= thr_counts[:, None]) & (cand < cap)
    )
    vc_keep = (vec > 0.0) & (cand < cap)
    ft = jnp.where(ft_keep, scores, 0.0)
    vc = jnp.where(vc_keep, vec, 0.0)
    hi = jnp.maximum(jnp.max(ft, axis=1), jnp.max(vc, axis=1))
    span = jnp.where(hi > 0.0, hi, 1.0)
    fused = (ft + vc) / span[:, None]
    if has_omc:
        omc_c = jnp.take(omc, jnp.clip(cand, 0, omc.shape[0] - 1))
        fused = fused * omc_c
    present = ft_keep | vc_keep
    counts = jnp.sum(present, axis=1).astype(jnp.int32)
    s = jnp.where(present, fused, -jnp.inf)
    vals, ci = jax.lax.top_k(s, k)
    ids = jnp.take_along_axis(cand, ci, axis=1)
    return vals, ids, counts


@functools.partial(
    jax.jit, static_argnames=("lch", "cap", "T", "exact", "has_filter")
)
def pruned_exact_counts(
    p_doc, p_tf, p_exact_tf,
    wl_i,         # int32[4, W]: b, t, start, len<=lch (the rescore worklist)
    thr_counts,   # f32[B] min distinct matched tokens
    fmask=None,   # f32[cap] filter mask (dummy (1,) when has_filter=False)
    *,
    lch: int, cap: int, T: int, exact: bool, has_filter: bool = False,
):
    """EXACT corpus-wide match counts for the pruned path — an OPT-IN
    second dispatch (reader_side.pruned_exact_counts / "exactCount").

    The pruned top-k kernel cannot know the total match count without a
    full aggregation (its counts are a verified-candidate lower bound;
    callers substitute the union-probability estimate). This kernel does
    that aggregation scatter-free: gather every worklist posting, ONE
    global 3-key sort by (query, doc, token), then count distinct docs
    whose distinct-matched-token run length clears the query threshold —
    run boundaries + cumsum/cummax tricks, matching the reference's
    exact counting (uniq of token_score.rs score-map keys).

    Dedup correctness leans on the same invariants as the rescore:
    within one (field, term) range docs are unique and chunks of a range
    are doc-disjoint; duplicates only arise ACROSS tokens and ACROSS
    fields of the same token, which the (b, doc, t) / (b, doc) run
    grouping collapses exactly.

    Cost: a 1-D multi-operand sort over all of the batch's postings
    (~20M elem/s on TPU v5e, benches/RESULTS.md "sort" note) — that is
    why it is a second, opt-in dispatch rather than part of the hot
    path. Returns counts int32[B]."""
    tf_src = p_exact_tf if exact else p_tf
    return _exact_counts_core(
        p_doc, tf_src, wl_i, thr_counts,
        fmask if has_filter else None, lch=lch, cap=cap, T=T,
    )


def _exact_counts_core(
    p_doc, tf_src, wl_i, thr_counts, fmask=None,
    *,
    lch: int, cap: int, T: int, axis_name=None,
):
    """The counting body of pruned_exact_counts, reusable inside a
    shard_map step: docs live in exactly one shard of the doc-sharded
    mesh, so per-shard counts are disjoint and one psum over the mesh
    axis yields the exact global counts (parallel/engine.py)."""
    B = thr_counts.shape[0]
    bw, tw, st, ln = wl_i[0], wl_i[1], wl_i[2], wl_i[3]
    docs = jax.vmap(
        lambda x: jax.lax.dynamic_slice(p_doc, (x,), (lch,))
    )(st)                                                   # (W, lch)
    tf = jax.vmap(
        lambda x: jax.lax.dynamic_slice(tf_src, (x,), (lch,))
    )(st)
    iot = jax.lax.broadcasted_iota(jnp.int32, (1, lch), 1)
    valid = (iot < ln[:, None]) & (tf > 0)
    if fmask is not None:
        # filtered searches count matches WITHIN the filter only
        valid = valid & (
            jnp.take(fmask, jnp.clip(docs, 0, fmask.shape[0] - 1)) > 0.0
        )
    bk = jnp.where(valid, bw[:, None], B).reshape(-1)
    dk = jnp.where(valid, docs, cap).reshape(-1)
    tk = jnp.where(valid, tw[:, None], T).reshape(-1)
    bk, dk, tk = jax.lax.sort((bk, dk, tk), dimension=0, num_keys=3)

    validk = bk < B
    same_doc = (bk[1:] == bk[:-1]) & (dk[1:] == dk[:-1])
    new_tok = jnp.concatenate(
        [jnp.ones((1,), bool), ~(same_doc & (tk[1:] == tk[:-1]))]
    ) & validk
    is_end = jnp.concatenate(
        [~same_doc, jnp.ones((1,), bool)]
    ) & validk
    # distinct tokens in a (b, doc) group = inclusive distinct-triple
    # cumsum at the group end minus its value at the PREVIOUS group end
    # (s is non-decreasing, so a shifted cummax over end-masked s
    # recovers the previous end without any scatter)
    s = jnp.cumsum(new_tok.astype(jnp.int32))
    e = jnp.where(is_end, s, 0)
    prev_end_s = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jax.lax.cummax(e)[:-1]]
    )
    tokcnt = (s - prev_end_s).astype(jnp.float32)
    thr_b = jnp.take(thr_counts, jnp.minimum(bk, B - 1))
    hit = is_end & (tokcnt >= jnp.maximum(thr_b, 1.0))
    counts = jax.vmap(
        lambda i: jnp.sum(jnp.where(bk == i, hit, False))
    )(jnp.arange(B)).astype(jnp.int32)
    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
    return counts


def _sliced_candidates(p_doc, pre_starts, pre_lens, *, hp: int, cap: int):
    """v4 phase 1: candidate docs by SLICING impact-ordered prefix heads.

    The hardware verdict on the v3 nominator (benches/RESULTS.md
    "Round-4 session 1") showed its (B, T*NPR*lp) accumulation sort is
    wasted work at the 10M tier: the rescore below is so cheap per
    candidate that a LARGER un-scored candidate pool beats a smaller
    accumulated one. Each (token, prefix-range) contributes its first
    `hp` postings' doc ids (commit stores side blocks highest-impact
    first, string_index._build_prefix_blocks); the only sort left is
    the (B, C) id sort for the ascending/dedup layout the rescore's
    binary searches need. A doc that would only nominate via cross-token
    accumulation is covered by the larger head budget instead
    (hp * T * NPR candidates vs v3's C=1024).

    CAVEAT (advisor r3): impact side blocks exist only for terms with
    df > string_index.PREFIX_LEN; a mid-size term's prefix range is its
    whole DOC-SORTED range, so when that range exceeds hp this mode
    takes the hp LOWEST DOC IDS — a systematic doc-id recall bias, not
    an impact order. PRUNED_BS_ACCUM=True (the default) is unaffected
    (it scores full lp-deep prefixes); treat slice mode as a
    measured-opt-in for corpora whose query terms are all heavy.

    Returns cand int32[B, T*NPR*hp] ascending; `cap` marks empty slots.
    """
    B, T, NPR = pre_starts.shape
    flat = pre_starts.reshape(-1)
    docs = jax.vmap(lambda s: jax.lax.dynamic_slice(p_doc, (s,), (hp,)))(
        flat
    ).reshape(B, T, NPR, hp)
    # account for dynamic_slice's end-of-slab clamp (see
    # _prefix_candidates): slot j holds posting s_eff + j, the range's
    # own postings sit at [shift, shift + len)
    P = p_doc.shape[0]
    s_eff = jnp.clip(flat, 0, max(P - hp, 0))
    shift = (flat - s_eff).reshape(B, T, NPR)[:, :, :, None]
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, hp), 3)
    valid = (slot >= shift) & (slot < shift + pre_lens[:, :, :, None])
    docs = jnp.where(valid, docs, cap)
    cand = jax.lax.sort(docs.reshape(B, T * NPR * hp), dimension=1)
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), bool), cand[:, 1:] == cand[:, :-1]], axis=1
    )
    cand = jnp.where(dup, cap, cand)
    return jax.lax.sort(cand, dimension=1)


def _rescore_bsearch(
    p_doc, tf_src, p_flen,
    rng_st, rng_ln,            # int32[B, T, NR] UNSPLIT doc-sorted ranges
    rng_w, rng_fb, rng_av,     # f32[B, T, NR]
    idf,                       # f32[B, T] EXACT host IDF (see gating)
    cand,                      # int32[B, C] ascending (cap = empty)
    *,
    bs_steps: int,
    boff=None,                 # (flat int32[L], base int32[B, T, NR],
    #                            shift int32[B, T, NR]) static tables
    cap: int = 0,              # pow2 doc-space bound (with boff only)
):
    """v4 phase 2: binary-search EACH CANDIDATE into its ranges.

    The v3 rescore streamed every posting of every query token
    (O(batch postings)) and could therefore never beat the dense kernel
    — measured 45 vs 47 QPS at 10.49M docs / 134M postings
    (benches/RESULTS.md "Round-4 session 1"). This kernel inverts the
    join: ranges are DOC-SORTED at commit (string_index._pack_segment),
    so each candidate's tf resolves with ONE uniform binary search per
    (token, range) — O(B*T*NR*C*log len) random gathers, independent of
    the posting counts. Ranges here are UNSPLIT (plan builders split at
    MAX_RANGE_LEN for the dense kernel's window gather; the split
    pieces are re-coalesced by the caller so NR stays the real span
    count and doc order stays global within each range).

    df/IDF comes from the HOST (range lengths), which is exact exactly
    when the caller gates this kernel: single-(field,term)-span tokens
    (nre == 0 — ranges of one token are doc-disjoint), non-exact tf
    (every stored posting has tf >= 1), unfiltered. Everything else
    keeps the v3 streaming rescore, whose df is counted on device.

    boff (optional, with pow2 `cap`): STATIC per-range bucket-offset
    tables as (flat, base, shift) — range (b, t, r)'s offsets row
    starts at flat[base[b, t, r]] with per-range resolution
    K_r = cap >> shift[b, t, r]; flat[base + j] = count of the range's
    postings with doc < j << shift (search_exec._pruned_bs_boff builds
    rows lazily per slab generation, device-resident). The binary
    search then runs only inside the candidate's bucket window
    [lo, hi), cutting rounds from log2(range len) to log2(max bucket
    span) — the bsearch chain is HBM-latency-bound, so round count IS
    the rescore cost. Results are bit-identical with or without boff.

    Returns (scores f32[B, C], matched f32[B, C])."""
    P = p_doc.shape[0]
    cq = cand[:, None, None, :]                        # (B, 1, 1, C)
    st = rng_st[..., None]                             # (B, T, NR, 1)
    ln = rng_ln[..., None]
    shape4 = cq.shape[:1] + st.shape[1:3] + cq.shape[-1:]
    if boff is not None:
        flat, b_base, b_shift = boff
        j = jax.lax.shift_right_logical(
            jnp.broadcast_to(cq, shape4), b_shift[..., None]
        )
        at_j = b_base[..., None] + j
        pos = jnp.take(flat, at_j)
        hi = jnp.take(flat, at_j + 1)
    else:
        pos = jnp.zeros(shape4, jnp.int32)             # (B, T, NR, C)
        hi = ln
    step = 1 << (bs_steps - 1)
    while step >= 1:
        probe = pos + step
        ok = probe <= hi
        v = jnp.take(p_doc, jnp.clip(st + probe - 1, 0, P - 1))
        pos = jnp.where(ok & (v < cq), probe, pos)
        step >>= 1
    at = jnp.clip(st + pos, 0, P - 1)
    hit = (pos < ln) & (jnp.take(p_doc, at) == cq)
    tf = jnp.where(hit, jnp.take(tf_src, at), 0.0)
    fl = jnp.take(p_flen, at)
    fb = rng_fb[..., None]
    denom = (1.0 - fb) + fb * fl / jnp.maximum(rng_av[..., None], 1e-9)
    ntf = rng_w[..., None] * tf / jnp.maximum(denom, 1e-9)
    acc = jnp.sum(ntf, axis=2)                         # (B, T, C)
    present = acc > 0.0
    sat = idf[:, :, None] * (K1 + 1.0) * acc / (K1 + acc)
    scores = jnp.sum(jnp.where(present, sat, 0.0), axis=1)
    matched = jnp.sum(present.astype(jnp.float32), axis=1)
    return scores, matched


@functools.partial(
    jax.jit,
    static_argnames=("hp", "cap", "k", "bs_steps", "has_omc",
                     "cand_given", "nom_accum", "lp", "C"),
)
def pruned_fulltext_topk_bs(
    p_doc, p_tf, p_flen,
    pre_starts, pre_lens,      # int32[B, T, NPR] impact-prefix ranges
    rng_i,                     # int32[2, B, T, NR] unsplit start/len
    rng_f,                     # f32[3, B, T, NR] weight, field_b, avg
    idf,                       # f32[B, T] exact host IDF
    thr_counts,                # f32[B] min distinct matched tokens
    omc,                       # f32[cap] (dummy (1,) when has_omc=False)
    cand_in=None,              # int32[B, C] caller candidates (optional)
    pre_fdesc=None,            # f32[3, B, T, NPR] (nom_accum only)
    boff=None,                 # int32[B, T, NR, K+1] bucket offsets
    *,
    hp: int, cap: int, k: int, bs_steps: int,
    has_omc: bool, cand_given: bool = False,
    nom_accum: bool = False, lp: int = 0, C: int = 0,
):
    """Fused v4 pruned full-text search: ONE dispatch, (B, k) results.

    Nomination is either head-sliced (no accumulation sort; hp postings
    per prefix range become candidates directly) or the v3 accumulated
    partial-score nominator (nom_accum=True: sort + segmented-sum over
    lp-deep prefixes, top-C partial scorers — more robust when impact
    prefixes are flat, e.g. uniform-tf corpora). Both feed the
    per-candidate binary-search rescore — work O(B*T*NR*(C log len)),
    independent of posting counts, the design adopted from the round-4
    hardware verdict (benches/RESULTS.md). Gating (caller-enforced,
    search_exec.search_topk_pruned): nre == 0, non-exact tf, no filter
    mask — everything else takes the v3 streaming kernel.

    Returns (vals f32[B, k], ids int32[B, k], cand_counts int32[B])."""
    if cand_given:
        cand = cand_in
    elif nom_accum:
        cand = _prefix_candidates(
            p_doc, p_tf, p_flen,
            pre_starts, pre_lens,
            pre_fdesc[0], pre_fdesc[1], pre_fdesc[2],
            idf, None, lp=lp, cap=cap, C=C,
        )
    else:
        cand = _sliced_candidates(
            p_doc, pre_starts, pre_lens, hp=hp, cap=cap
        )
    scores, matched = _rescore_bsearch(
        p_doc, p_tf, p_flen,
        rng_i[0], rng_i[1], rng_f[0], rng_f[1], rng_f[2],
        idf, cand, bs_steps=bs_steps, boff=boff, cap=cap,
    )
    keep = (
        (matched >= thr_counts[:, None]) & (scores > 0.0) & (cand < cap)
    )
    if has_omc:
        omc_c = jnp.take(omc, jnp.clip(cand, 0, omc.shape[0] - 1))
        s = scores * omc_c
    else:
        s = scores
    counts = jnp.sum(keep, axis=1).astype(jnp.int32)
    s = jnp.where(keep, s, -jnp.inf)
    vals, ci = jax.lax.top_k(s, k)
    ids = jnp.take_along_axis(cand, ci, axis=1)
    return vals, ids, counts


@functools.partial(
    jax.jit,
    static_argnames=(
        "hp", "cap", "k", "bs_steps", "has_omc",
        "V", "nprobe", "window", "has_rescale", "rescale_lo", "rescale_hi",
        "cand_given", "nom_accum", "lp", "C",
    ),
)
def pruned_hybrid_topk_int8_bs(
    p_doc, p_tf, p_flen,
    pre_starts, pre_lens, rng_i, rng_f,
    idf, thr_counts,
    mat_i8, scales, row_doc, unit_cen, unit_starts, doc2row,
    queries, sim, omc,
    cand_in=None,
    pre_fdesc=None,
    boff=None,                 # int32[B, T, NR, K+1] bucket offsets
    *,
    hp: int, cap: int, k: int, bs_steps: int, has_omc: bool,
    V: int, nprobe: int, window: int,
    has_rescale: bool, rescale_lo: float, rescale_hi: float,
    cand_given: bool = False,
    nom_accum: bool = False, lp: int = 0, C: int = 0,
):
    """Fused v4 pruned hybrid over the int8/IVF vector layout: the
    fulltext side uses head-sliced nomination + binary-search rescore
    (pruned_fulltext_topk_bs), the vector side is unchanged from v3
    (IVF probe nominations + exact int8 row gather), fusion is the
    reference min-max-over-span (token_score.rs:357-422). Same gating
    as the fulltext v4 kernel."""
    from .vector import ivf_int8_topk

    B = queries.shape[0]
    v_vals, v_rows = ivf_int8_topk(
        queries, mat_i8, scales, unit_cen, unit_starts,
        k=V, nprobe=nprobe, window=window,
    )
    v_docs = jnp.where(
        (v_rows >= 0) & (v_vals > NEG_INF / 2),
        jnp.take(row_doc, jnp.clip(v_rows, 0, row_doc.shape[0] - 1)),
        cap,
    )
    if cand_given:
        cand = cand_in
        Ct = cand_in.shape[1]
    else:
        if nom_accum:
            ft_cand = _prefix_candidates(
                p_doc, p_tf, p_flen,
                pre_starts, pre_lens,
                pre_fdesc[0], pre_fdesc[1], pre_fdesc[2],
                idf, None, lp=lp, cap=cap, C=C,
            )
        else:
            ft_cand = _sliced_candidates(
                p_doc, pre_starts, pre_lens, hp=hp, cap=cap
            )
        Ct = ft_cand.shape[1] + V
        cand = jnp.concatenate([ft_cand, v_docs], axis=1)
        cand = jax.lax.sort(cand, dimension=1)
        dup = jnp.concatenate(
            [jnp.zeros((B, 1), bool), cand[:, 1:] == cand[:, :-1]], axis=1
        )
        cand = jnp.where(dup, cap, cand)
        cand = jax.lax.sort(cand, dimension=1)

    scores, matched = _rescore_bsearch(
        p_doc, p_tf, p_flen,
        rng_i[0], rng_i[1], rng_f[0], rng_f[1], rng_f[2],
        idf, cand, bs_steps=bs_steps, boff=boff, cap=cap,
    )

    rows_c = jnp.take(doc2row, jnp.clip(cand, 0, doc2row.shape[0] - 1))
    safe_rows = jnp.clip(rows_c, 0, mat_i8.shape[0] - 1)
    tiles = jnp.take(mat_i8, safe_rows, axis=0)             # (B, Ct, D)
    sc_c = jnp.take(scales, safe_rows)                      # (B, Ct)
    vec = jnp.einsum(
        "bcd,bd->bc",
        tiles.astype(jnp.bfloat16),
        queries.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) * sc_c
    vec = jnp.where((rows_c >= 0) & (cand < cap), vec, 0.0)
    pos_v = _lower_bound(cand, v_docs)
    posc_v = jnp.minimum(pos_v, Ct - 1)
    hit_v = (
        jnp.take_along_axis(cand, posc_v, axis=1) == v_docs
    ) & (v_docs < cap)
    probe_vals = jnp.where(hit_v, v_vals, 0.0)

    def fold_probe(vec_b, pos_b, val_b):
        return vec_b.at[pos_b].max(val_b)

    vec = jax.vmap(fold_probe)(vec, posc_v, probe_vals)
    if has_rescale:
        vec = jnp.clip(
            (vec - rescale_lo) / (rescale_hi - rescale_lo), 0.0, 1.0
        )
    vec = jnp.where(vec >= sim[:, None], vec, 0.0)

    ft_keep = (
        (scores > 0.0) & (matched >= thr_counts[:, None]) & (cand < cap)
    )
    vc_keep = (vec > 0.0) & (cand < cap)
    ft = jnp.where(ft_keep, scores, 0.0)
    vc = jnp.where(vc_keep, vec, 0.0)
    hi = jnp.maximum(jnp.max(ft, axis=1), jnp.max(vc, axis=1))
    span = jnp.where(hi > 0.0, hi, 1.0)
    fused = (ft + vc) / span[:, None]
    if has_omc:
        omc_c = jnp.take(omc, jnp.clip(cand, 0, omc.shape[0] - 1))
        fused = fused * omc_c
    present = ft_keep | vc_keep
    counts = jnp.sum(present, axis=1).astype(jnp.int32)
    s = jnp.where(present, fused, -jnp.inf)
    vals, ci = jax.lax.top_k(s, k)
    ids = jnp.take_along_axis(cand, ci, axis=1)
    return vals, ids, counts


def estimate_match_count(n_docs: float, dfs) -> int:
    """Union-probability estimate of the corpus-wide match count for the
    pruned path (the dense path counts exactly; a pruned search would
    need a full aggregation). Independence assumption:
    E[|union|] = N * (1 - prod_t (1 - df_t / N))."""
    import numpy as np

    n = max(float(n_docs), 1.0)
    miss = 1.0
    for df in dfs:
        miss *= max(0.0, 1.0 - float(df) / n)
    return int(round(n * (1.0 - miss)))



# ---------------------------------------------------------------------------
# v4 facet path: ONE global (doc, token) sort per query, then per-field
# histograms off the run-end representatives. The v3 worklist/histogram
# kernel (streamed earlier-span membership probes) measured 4.8 s/query
# on TPU v5e vs the dense bitmap's ~21 ms, while the exact-counts global
# sort costs ~5 ms/query over the same postings (benches/RESULTS.md
# "Round-4 session 1") — on this hardware one big sort beats many
# binary-search probe rounds. Splitting reps from the histogram lets a
# multi-facet query pay the sort ONCE: the (docs, rep) pair stays
# device-resident and each facet field is a cheap chunked one-hot
# matmul over it. Reference semantics: facet.rs (distinct matched docs
# per bucket; number ranges inclusive at both ends,
# NumberField.range_counts).


def _match_reps_core(p_doc, tf_src, wl_i, thr, fmask=None, *,
                     lch: int, cap: int):
    """Distinct matched docs of a pruned plan as sorted run-end reps.

    Gathers every worklist posting ((W, lch) dynamic slices), flattens,
    then ONE 2-key (doc, token) lax.sort. Each doc's postings form a
    run; rep[i] = 1.0 at the run END iff the run's distinct-token count
    clears thr (thr <= 1 accepts any match — the cumsum/cummax
    distinct-counting trick from _exact_counts_core). Duplicates across
    tokens and across fields of one token collapse exactly: within one
    (field, term) range docs are unique, so equal (doc, token) pairs
    only arise across fields and equal docs across tokens — both merged
    by the sort. Returns (docs_sorted int32[N], rep f32[N]), N = W*lch.

    Shard-complete under doc-sharding: a doc's postings all live in its
    doc % D shard, so per-shard runs are whole and per-shard reps are
    doc-disjoint (parallel/engine.py facet steps psum the histograms)."""
    tw, st, ln = wl_i[1], wl_i[2], wl_i[3]
    docs = jax.vmap(
        lambda x: jax.lax.dynamic_slice(p_doc, (x,), (lch,))
    )(st)                                                   # (W, lch)
    tf = jax.vmap(
        lambda x: jax.lax.dynamic_slice(tf_src, (x,), (lch,))
    )(st)
    iot = jax.lax.broadcasted_iota(jnp.int32, (1, lch), 1)
    valid = (iot < ln[:, None]) & (tf > 0)
    if fmask is not None:
        valid = valid & (
            jnp.take(fmask, jnp.clip(docs, 0, fmask.shape[0] - 1)) > 0.0
        )
    dk = jnp.where(valid, docs, cap).reshape(-1)
    tk = jnp.where(valid, tw[:, None], jnp.int32(2 ** 30)).reshape(-1)
    dk, tk = jax.lax.sort((dk, tk), dimension=0, num_keys=2)
    validk = dk < cap
    same_doc = dk[1:] == dk[:-1]
    new_tok = jnp.concatenate(
        [jnp.ones((1,), bool), ~(same_doc & (tk[1:] == tk[:-1]))]
    ) & validk
    is_end = jnp.concatenate(
        [~same_doc, jnp.ones((1,), bool)]
    ) & validk
    s = jnp.cumsum(new_tok.astype(jnp.int32))
    e = jnp.where(is_end, s, 0)
    prev_end = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jax.lax.cummax(e)[:-1]]
    )
    tokcnt = (s - prev_end).astype(jnp.float32)
    rep = (is_end & (tokcnt >= jnp.maximum(thr, 1.0))).astype(
        jnp.float32
    )
    return dk, rep


@functools.partial(
    jax.jit, static_argnames=("lch", "cap", "exact", "has_filter")
)
def pruned_match_reps(
    p_doc, p_tf, p_exact_tf,
    wl_i,         # int32[4, W]: b(=0), t, start, len<=lch
    thr,          # f32[] min distinct matched tokens (<=1 = any)
    fmask,        # f32[cap] alive mask (dummy (1,) when has_filter=False)
    *,
    lch: int, cap: int, exact: bool, has_filter: bool = False,
):
    """Phase A of the sort-based facet path (single device). The
    returned (docs, rep) stay on device; phase B (pruned_facet_hist)
    consumes them once per facet field. rep.sum() is also the EXACT
    corpus-wide match count — a thresholded/filtered-aware byproduct."""
    tf_src = p_exact_tf if exact else p_tf
    return _match_reps_core(
        p_doc, tf_src, wl_i, thr, fmask if has_filter else None,
        lch=lch, cap=cap,
    )


def _facet_hist_core(docs, rep, bucket, bounds, *,
                     G: int, numeric: bool, ch: int = 262144,
                     axis_name=None):
    """Phase B body: chunked scan of one-hot matmuls over the run-end
    reps — (ch,) weights x (ch, G) membership per step, MXU work, no
    scatter. Sentinel docs (doc == cap) carry rep == 0, so the clipped
    gather contributes nothing. Reusable inside a shard_map step (psum
    over the mesh axis when axis_name is set).

    Hardware-tuned (TPU v5e, RESULTS.md round-4 session 4): 32768-chunk
    steps measured ~4 ms EACH (182 ms/field over a 1.5M worklist) —
    per-step overhead, not traffic, dominated. 262144 chunks + bf16
    one-hot membership (0/1 exact; accumulation stays f32) amortize it;
    counts below 2^24 stay exact."""
    N = docs.shape[0]
    while N % ch:
        ch >>= 1
    ch = min(ch, N)
    gidx = jnp.arange(G, dtype=jnp.int32)

    def step(acc, j):
        d = jax.lax.dynamic_slice(docs, (j * ch,), (ch,))
        w = jax.lax.dynamic_slice(rep, (j * ch,), (ch,))
        v = jnp.take(bucket, jnp.clip(d, 0, bucket.shape[0] - 1))
        if numeric:
            member = (
                (v[:, None] >= bounds[None, :, 0])
                & (v[:, None] <= bounds[None, :, 1])
            ).astype(jnp.bfloat16)                       # (ch, G)
        else:
            member = (
                v[:, None] == gidx[None, :]
            ).astype(jnp.bfloat16)                       # (ch, G)
        acc = acc + jnp.dot(
            w.astype(jnp.bfloat16), member,
            preferred_element_type=jnp.float32,
        )
        return acc, None

    counts, _ = jax.lax.scan(
        step, jnp.zeros((G,), jnp.float32), jnp.arange(N // ch)
    )
    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
    return counts


@functools.partial(jax.jit, static_argnames=("G", "numeric"))
def pruned_facet_hist(docs, rep, bucket, bounds, *, G: int,
                      numeric: bool):
    """Phase B of the sort-based facet path (single device): facet
    counts f32[G] for ONE field off device-resident (docs, rep).
    `bucket` is int32[cap] value ids (-1 = none) for string/bool facets
    or f32[cap] raw values (NaN = missing) compared against inclusive
    [from, to] `bounds` f32[G, 2] for number facets."""
    return _facet_hist_core(docs, rep, bucket, bounds, G=G,
                            numeric=numeric)


def _facet_hist_multi_core(docs, rep, pair_docs, pair_vals, bounds, *,
                           G: int, numeric: bool, M: int,
                           ch: int = 262144, axis_name=None):
    """Phase B for MULTI-VALUED facet columns: per chunk of run-end
    reps, binary-search each doc into the doc-sorted deduped
    (pair_docs, pair_vals) table (filter_fields pair_table) and probe
    its <= M rows. String/bool buckets accumulate one one-hot matmul
    per probe row (pairs are distinct, so a doc adds once per DISTINCT
    value — value_counts semantics); number ranges OR the probes first
    (a doc counts once per range however many values land in it —
    range_counts semantics). pair_docs must be padded with a sentinel
    larger than any doc id (not the docs' own `cap` sentinel)."""
    N = docs.shape[0]
    while N % ch:
        ch >>= 1
    ch = min(ch, N)
    P = pair_docs.shape[0]
    gidx = jnp.arange(G, dtype=jnp.int32)

    def step(acc, j):
        d = jax.lax.dynamic_slice(docs, (j * ch,), (ch,))
        w = jax.lax.dynamic_slice(rep, (j * ch,), (ch,))
        pos = _lower_bound(pair_docs[None], d[None])[0]      # (ch,)
        if numeric:
            member = jnp.zeros((ch, G), bool)
        for jj in range(M):
            pj = jnp.clip(pos + jj, 0, P - 1)
            pd = jnp.take(pair_docs, pj)
            pv = jnp.take(pair_vals, pj)
            valid = (pd == d) & (pos + jj < P)
            if numeric:
                member = member | (
                    valid[:, None]
                    & (pv[:, None] >= bounds[None, :, 0])
                    & (pv[:, None] <= bounds[None, :, 1])
                )
            else:
                onehot = (
                    (pv.astype(jnp.int32)[:, None] == gidx[None, :])
                    & valid[:, None]
                ).astype(jnp.bfloat16)                       # (ch, G)
                acc2 = jnp.dot(
                    w.astype(jnp.bfloat16), onehot,
                    preferred_element_type=jnp.float32,
                )
                acc = acc + acc2
        if numeric:
            acc = acc + jnp.dot(
                w.astype(jnp.bfloat16), member.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        return acc, None

    counts, _ = jax.lax.scan(
        step, jnp.zeros((G,), jnp.float32), jnp.arange(N // ch)
    )
    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
    return counts


@functools.partial(jax.jit, static_argnames=("G", "numeric", "M"))
def pruned_facet_hist_multi(docs, rep, pair_docs, pair_vals, bounds, *,
                            G: int, numeric: bool, M: int):
    """Single-device multi-valued phase B (see _facet_hist_multi_core)."""
    return _facet_hist_multi_core(
        docs, rep, pair_docs, pair_vals, bounds,
        G=G, numeric=numeric, M=M,
    )


# Hybrid extension of the sort-based facet path. A hybrid search's
# match set is ft_keep | vec_keep (ops/hybrid._fuse, reference
# token_score.rs:357-422): docs matched by the fulltext side (clearing
# any threshold) UNION docs whose best vector row survives the
# similarity floor. At the int8/IVF tier the vector side is
# candidate-bounded (top-V probe rows, like the dense int8 kernel's
# scatter-max), so the extra facet work is one V-element sort + a
# binary-search dedup against the fulltext reps — no dense bitmap.


def _vec_reps_core(vdocs, docs_ft, rep_ft, cap: int):
    """One rep per DISTINCT vector-candidate doc not already counted by
    the fulltext reps. vdocs int32[V] (cap = invalid sentinel); docs_ft
    int32[N] ascending with run-end flags rep_ft f32[N]
    (_match_reps_core output). Returns (vd int32[V], vrep f32[V]).

    A doc present in the fulltext worklist but FAILING its threshold
    carries rep 0 at its run end — the membership test below therefore
    lets the vector side count it, exactly matching _fuse (vec_keep is
    not threshold-gated)."""
    vd = jax.lax.sort(vdocs)
    is_end = jnp.concatenate(
        [vd[1:] != vd[:-1], jnp.ones((1,), bool)]
    ) & (vd < cap)
    # last occurrence of vd in docs_ft (== its run end) via
    # lower_bound(vd + 1) - 1; sentinel rows (vd == cap) die on is_end
    ub = _lower_bound(docs_ft[None], (vd + 1)[None])[0] - 1
    ubc = jnp.maximum(ub, 0)
    member = (
        (ub >= 0)
        & (jnp.take(docs_ft, ubc) == vd)
        & (jnp.take(rep_ft, ubc) > 0.0)
    )
    return vd, (is_end & ~member).astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "V", "nprobe", "window", "cap", "pad", "has_filter",
        "has_rescale", "rescale_lo", "rescale_hi",
    ),
)
def pruned_hybrid_match_reps(
    docs_ft, rep_ft,   # phase-A fulltext reps (pruned_match_reps)
    mat_i8, scales, row_doc, unit_cen, unit_starts,
    query,             # f32[1, dim] L2-normalized
    sim,               # f32[] similarity floor
    fmask,             # f32[cap] alive mask (dummy (1,) if !has_filter)
    *,
    V: int, nprobe: int, window: int, cap: int, pad: int,
    has_filter: bool, has_rescale: bool,
    rescale_lo: float, rescale_hi: float,
):
    """HYBRID phase A tail: probe the IVF layout for the query's top-V
    rows (the same candidate bound the dense int8 kernel scatter-maxes,
    ops/hybrid._vector_dense_scores_int8), keep rows clearing the
    similarity floor, dedup their doc ids against the fulltext reps, and
    append them (padded to `pad` sentinel slots so phase B's chunking
    invariant holds) — the combined (docs, rep) pair feeds the SAME
    per-field pruned_facet_hist dispatches."""
    from .vector import ivf_int8_topk_masked

    if has_filter:
        mask2d = (fmask > 0.0)[None, :]
    else:
        mask2d = jnp.ones((1, 1), bool)
    vals, rows = ivf_int8_topk_masked(
        query, mat_i8, scales, row_doc, unit_cen, unit_starts, mask2d,
        k=V, nprobe=nprobe, window=window, has_mask=has_filter,
    )
    vals, rows = vals[0], rows[0]
    if has_rescale:
        vals = jnp.clip(
            (vals - rescale_lo) / (rescale_hi - rescale_lo), 0.0, 1.0
        )
    # dense-kernel membership: row valid, >= similarity, and > 0 after
    # rescale (a scatter-max of 0 never sets vec_keep in _fuse)
    keep = (rows >= 0) & (vals >= sim) & (vals > 0.0)
    vd = jnp.where(
        keep,
        jnp.take(row_doc, jnp.clip(rows, 0, row_doc.shape[0] - 1)),
        cap,
    )
    vd, vrep = _vec_reps_core(vd, docs_ft, rep_ft, cap)
    vd = jnp.concatenate([vd, jnp.full((pad - V,), cap, jnp.int32)])
    vrep = jnp.concatenate(
        [vrep, jnp.zeros((pad - V,), jnp.float32)]
    )
    return (
        jnp.concatenate([docs_ft, vd]),
        jnp.concatenate([rep_ft, vrep]),
    )
