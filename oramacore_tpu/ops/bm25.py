"""BM25F scoring on TPU.

Scoring semantics follow the reference exactly
(src/collection_manager/bm25.rs:78-126 and
src/collection_manager/sides/read/index/token_score.rs:186-303):

    idf(t)   = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))        # Lucene-style
    ntf      = tf / (1 - b + b * field_len / avg_field_len)   # per field
    S_t(d)   = sum_f w_f * ntf_{t,f,d}                        # cross-field
    score_t  = idf(t) * (k+1) * S_t / (k + S_t)
    score(d) = sum_t score_t(d)
    threshold: keep d only if (# distinct query tokens matched) >= thr

TPU-first design notes (measured on TPU v5e):
- postings ranges are CONTIGUOUS, so they are fetched with vmapped
  `dynamic_slice` (XLA gather-of-slices → sequential DMA). An
  elementwise `take` formulation was 16x slower (random-gather path).
- per-token aggregation into the dense doc space uses a chunked one-hot
  matmul on the MXU for small doc capacities (~3x faster than XLA
  scatter) and falls back to scatter-add for large capacities where the
  one-hot FLOPs would dominate.
- the filter mask applies to the DENSE accumulator (not per posting), so
  corpus df / IDF are still computed over the filtered doc set
  (reference collect_contributions_with_filter semantics) without a
  per-posting random gather.
- the slab must be padded with MAX_RANGE_LEN trailing zeros so
  dynamic_slice never clamps (clamping would silently shift a window);
  plan builders split ranges longer than MAX_RANGE_LEN.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

K1 = 1.2  # reference k parameter (token_score.rs:283)

MAX_RANGE_LEN = 131072   # ranges longer than this are split at plan time
ONEHOT_CAP_MAX = 32768   # one-hot matmul aggregation up to this doc capacity
ONEHOT_CHUNK = 2048


class PostingsDevice(NamedTuple):
    """Committed+live postings slab resident in HBM."""

    doc: jax.Array       # int32[P]   internal doc id per posting
    tf: jax.Array        # float32[P] term frequency
    exact_tf: jax.Array  # float32[P] surface-form-exact term frequency
    flen: jax.Array      # float32[P] field length of (doc, field)


def round_up_pow2(n: int, lo: int = 8) -> int:
    c = lo
    while c < n:
        c *= 2
    return c


def _aggregate_dense(docs, ntf, cap: int):
    """Per-token dense aggregation: acc[b, c] = sum of ntf where doc==c.

    docs int32[B, L] (cap = overflow slot), ntf f32[B, L].
    """
    B, L = docs.shape
    if cap <= ONEHOT_CAP_MAX:
        ch = min(ONEHOT_CHUNK, L)
        if L % ch:
            pad = ch - (L % ch)
            docs = jnp.pad(docs, ((0, 0), (0, pad)), constant_values=cap)
            ntf = jnp.pad(ntf, ((0, 0), (0, pad)))
            L = docs.shape[1]

        def chunk(c, i):
            d = jax.lax.dynamic_slice(docs, (0, i * ch), (B, ch))
            v = jax.lax.dynamic_slice(ntf, (0, i * ch), (B, ch))
            # f32 one-hot: the matrix is 0/1 so the matmul is EXACT —
            # bf16 here loses ~1e-3 relative accuracy on ntf (measured)
            onehot = jax.nn.one_hot(d, cap, dtype=jnp.float32)
            return (
                c
                + jnp.einsum(
                    "bl,blc->bc",
                    v,
                    onehot,
                    preferred_element_type=jnp.float32,
                ),
                None,
            )

        acc, _ = jax.lax.scan(chunk, jnp.zeros((B, cap), jnp.float32),
                              jnp.arange(L // ch))
        return acc

    def scatter_one(docs_b, ntf_b):
        acc = jnp.zeros((cap + 1,), jnp.float32)
        return acc.at[docs_b].add(ntf_b)[:cap]

    return jax.vmap(scatter_one)(docs, ntf)


@functools.partial(
    jax.jit,
    static_argnames=("exact", "cap", "lr", "axis_name", "has_champ"),
)
def bm25_score_batch(
    p_doc: jax.Array,        # int32[P + MAX_RANGE_LEN pad]
    p_tf: jax.Array,         # float32[...]
    p_exact_tf: jax.Array,   # float32[...]
    p_flen: jax.Array,       # float32[...]
    starts: jax.Array,       # int32[B, T, NR] posting-range starts
    lens: jax.Array,         # int32[B, T, NR] posting-range lengths (<= lr)
    weights: jax.Array,      # float32[B, T, NR] field boost per range
    field_b: jax.Array,      # float32[B, T, NR] BM25 b per range's field
    avg_flen: jax.Array,     # float32[B, T, NR] avg field len per range's field
    n_docs: jax.Array,       # float32[B] total docs (corpus size per query)
    doc_mask: jax.Array,     # bool[B, cap] filter mask (True = doc allowed)
    champs: jax.Array = None,     # f32[C, cap] champion rows (has_champ)
    ch_idx: jax.Array = None,     # int32[B, T, NC] champion row per slot
    ch_w: jax.Array = None,       # f32[B, T, NC] weight per champion slot
    *,
    lr: int,                 # static: max range length bucket
    exact: bool,
    cap: int,                # static: doc-id capacity (scores width)
    axis_name=None,          # static: mesh axis for GLOBAL df (doc sharding)
    has_champ: bool = False,  # static: champion rows present
):
    """Score a batch of queries against one index's postings slab.

    Returns (scores f32[B, cap], matched_tokens f32[B, cap]).

    Under shard_map with doc-id sharding, pass axis_name so the per-token
    document frequency (hence IDF) is psum-reduced over the mesh axis —
    every other term of the formula is shard-local because each doc's
    postings live entirely in its shard.
    """
    B, T, NR = starts.shape
    LR = int(lr)
    tf_src = p_exact_tf if exact else p_tf

    slot = jax.lax.broadcasted_iota(jnp.int32, (1, NR, LR), 2)  # (1, NR, LR)

    def slice_all(flat_starts):
        d = jax.vmap(lambda s: jax.lax.dynamic_slice(p_doc, (s,), (LR,)))(flat_starts)
        t = jax.vmap(lambda s: jax.lax.dynamic_slice(tf_src, (s,), (LR,)))(flat_starts)
        f = jax.vmap(lambda s: jax.lax.dynamic_slice(p_flen, (s,), (LR,)))(flat_starts)
        return d, t, f

    def per_token(tok_carry, tok_in):
        scores, matched = tok_carry
        if has_champ:
            st, ln, wt, fb, av, ci, cw = tok_in
        else:
            st, ln, wt, fb, av = tok_in  # each (B, NR)

        docs, tf, flen = slice_all(st.reshape(-1))
        docs = docs.reshape(B, NR, LR)
        tf = tf.reshape(B, NR, LR)
        flen = flen.reshape(B, NR, LR)
        valid = slot < ln[:, :, None]        # (B, NR, LR)

        b_ = fb[:, :, None]
        denom = (1.0 - b_) + b_ * flen / jnp.maximum(av[:, :, None], 1e-9)
        ntf = wt[:, :, None] * tf / jnp.maximum(denom, 1e-9)
        keep = valid & (tf > 0)
        ntf = jnp.where(keep, ntf, 0.0)
        # invalid slots aggregate into the overflow bucket `cap`
        docs = jnp.where(keep, docs, cap)

        acc = _aggregate_dense(
            docs.reshape(B, NR * LR), ntf.reshape(B, NR * LR), cap
        )  # (B, cap) == S_t per doc
        if has_champ:
            # champion rows: one dense add replaces a heavy term's whole
            # posting-range scan (ci (B, NC); -1 = empty slot)
            rows = jnp.take(
                champs, jnp.clip(ci, 0, champs.shape[0] - 1), axis=0
            )  # (B, NC, cap)
            w_eff = jnp.where(ci >= 0, cw, 0.0)
            acc = acc + jnp.einsum(
                "bnc,bn->bc", rows, w_eff,
                preferred_element_type=jnp.float32,
            )
        acc = jnp.where(doc_mask, acc, 0.0)  # filtered-IDF semantics
        present = acc > 0.0
        df = jnp.sum(present, axis=1).astype(jnp.float32)  # (B,)
        if axis_name is not None:
            df = jax.lax.psum(df, axis_name)  # global df over doc shards
        df = jnp.maximum(df, 1.0)  # corpus_df = max(1, ...) token_score.rs:275
        idf = jnp.log1p((n_docs - df + 0.5) / (df + 0.5))  # (B,)
        sat = idf[:, None] * (K1 + 1.0) * acc / (K1 + acc)
        sat = jnp.where(present, sat, 0.0)
        return (scores + sat, matched + present.astype(jnp.float32)), None

    init = (
        jnp.zeros((B, cap), jnp.float32),
        jnp.zeros((B, cap), jnp.float32),
    )
    # scan over tokens: move token axis to front
    tok_inputs = (
        jnp.moveaxis(starts, 1, 0),
        jnp.moveaxis(lens, 1, 0),
        jnp.moveaxis(weights, 1, 0),
        jnp.moveaxis(field_b, 1, 0),
        jnp.moveaxis(avg_flen, 1, 0),
    )
    if has_champ:
        tok_inputs = tok_inputs + (
            jnp.moveaxis(ch_idx, 1, 0),
            jnp.moveaxis(ch_w, 1, 0),
        )
    (scores, matched), _ = jax.lax.scan(per_token, init, tok_inputs)
    return scores, matched


@functools.partial(jax.jit, static_argnames=("k",))
def masked_topk(
    scores: jax.Array,        # float32[B, cap]
    matched: jax.Array,       # float32[B, cap] distinct-token match count
    thr_counts: jax.Array,    # float32[B] min distinct tokens (0 = no threshold)
    filter_mask: jax.Array,   # bool[B, cap] or bool[1, cap]
    omc: jax.Array,           # float32[cap] score multipliers (1.0 default)
    *,
    k: int,
):
    """Apply threshold + filter mask + OMC multipliers, then top-k."""
    s = scores * omc[None, :]
    keep = (matched >= thr_counts[:, None]) & filter_mask & (scores > 0.0)
    s = jnp.where(keep, s, -jnp.inf)
    vals, idx = jax.lax.top_k(s, k)
    return vals, idx


@functools.partial(
    jax.jit, static_argnames=("exact", "cap", "lr", "k")
)
def bm25_search_topk(
    p_doc, p_tf, p_exact_tf, p_flen,
    starts, lens, weights, field_b, avg_flen,
    n_docs, doc_mask,
    thr_counts,          # float32[B] min distinct tokens (0 = no threshold)
    omc,                 # float32[cap] score multipliers
    *,
    lr: int, exact: bool, cap: int, k: int,
):
    """Fused scoring + threshold + OMC + top-k: one device dispatch, only
    (B, k) results come back to the host."""
    scores, matched = bm25_score_batch(
        p_doc, p_tf, p_exact_tf, p_flen, starts, lens, weights, field_b,
        avg_flen, n_docs, doc_mask, lr=lr, exact=exact, cap=cap,
    )
    s = scores * omc[None, :]
    keep = (matched >= thr_counts[:, None]) & (scores > 0.0)
    s = jnp.where(keep, s, -jnp.inf)
    vals, idx = jax.lax.top_k(s, k)
    return vals, idx


@functools.partial(
    jax.jit,
    static_argnames=(
        "exact", "cap", "lr", "k", "has_mask", "has_omc", "has_champ",
        "with_bitmap",
    ),
)
def bm25_search_topk_packed(
    p_doc, p_tf, p_exact_tf, p_flen,
    idesc,               # int32[2, B, T, NR]: starts, lens
    fdesc,               # float32[3, B, T, NR]: weights, field_b, avg_flen
    scalars,             # float32[2, B]: n_docs, thr_counts
    doc_mask,            # bool[B, cap] (dummy (1,1) when has_mask=False)
    omc,                 # float32[cap] (dummy (1,) when has_omc=False)
    champs=None,         # f32[C, cap] champion rows (has_champ)
    ch_idx=None,         # int32[B, T, NC]
    ch_w=None,           # f32[B, T, NC]
    *,
    lr: int, exact: bool, cap: int, k: int,
    has_mask: bool, has_omc: bool, has_champ: bool = False,
    with_bitmap: bool = False,
):
    """Transfer-minimized fused search: 3 small H2D arrays per call (plus
    mask/omc only when actually used).

    with_bitmap additionally returns the full match set as PACKED BITS
    (uint8[B, cap/8], np.packbits bit order) — 32x smaller than the
    dense f32 score vector the non-fused path ships to the host, and no
    per-doc Python dict on arrival. Facet counting consumes it directly
    (ReadSide._compute_facets doc-mask path; reference facets iterate
    the score map, facet.rs)."""
    starts, lens = idesc[0], idesc[1]
    weights, field_b, avg_flen = fdesc[0], fdesc[1], fdesc[2]
    n_docs, thr_counts = scalars[0], scalars[1]
    B = starts.shape[0]
    mask = doc_mask if has_mask else jnp.ones((B, cap), bool)
    scores, matched = bm25_score_batch(
        p_doc, p_tf, p_exact_tf, p_flen, starts, lens, weights, field_b,
        avg_flen, n_docs, mask, champs, ch_idx, ch_w,
        lr=lr, exact=exact, cap=cap, has_champ=has_champ,
    )
    s = scores * omc[None, :] if has_omc else scores
    keep = (matched >= thr_counts[:, None]) & (scores > 0.0)
    counts = jnp.sum(keep, axis=1).astype(jnp.int32)  # exact match counts
    s = jnp.where(keep, s, -jnp.inf)
    from .vector import topk_2level

    vals, idx = topk_2level(s, k)
    if with_bitmap:
        bits = jnp.packbits(keep, axis=1)
        return vals, idx, counts, bits
    return vals, idx, counts


NEG_F32 = -3.0e38  # sentinel below any real f32 sort value


@functools.partial(
    jax.jit,
    static_argnames=(
        "exact", "cap", "lr", "k", "has_mask", "has_omc", "desc",
    ),
)
def bm25_search_sorted_packed(
    p_doc, p_tf, p_exact_tf, p_flen,
    idesc, fdesc, scalars,
    doc_mask,            # bool[B, cap] (dummy (1,1) when has_mask=False)
    omc,                 # float32[cap] (dummy (1,) when has_omc=False)
    svals,               # float32[cap] sort column (NaN = doc lacks it)
    *,
    lr: int, exact: bool, cap: int, k: int,
    has_mask: bool, has_omc: bool, desc: bool,
):
    """Fused SORT-BY search: score + threshold + sort-field top-k in one
    dispatch. The non-fused path ships a dense (cap,) score vector to
    the host and lexsorts the whole hit set (O(hits log hits) — seconds
    at 10M matches); here only two (k,) pages cross the boundary.

    Order semantics (shared with ReadSide._sort_by_field): matched docs
    WITH the sort field ordered by (value asc|desc, doc id asc — XLA
    top_k is stable, picking the lower index on ties), then matched docs
    WITHOUT the field in doc-id order. Returns
    (docs1, vals1, scores1, docs2, valid2, scores2, counts): the
    with-field page (vals1 > NEG_F32/2 marks real entries), the
    missing-field page, and exact match counts.
    """
    starts, lens = idesc[0], idesc[1]
    weights, field_b, avg_flen = fdesc[0], fdesc[1], fdesc[2]
    n_docs, thr_counts = scalars[0], scalars[1]
    B = starts.shape[0]
    mask = doc_mask if has_mask else jnp.ones((B, cap), bool)
    scores, matched = bm25_score_batch(
        p_doc, p_tf, p_exact_tf, p_flen, starts, lens, weights, field_b,
        avg_flen, n_docs, mask, lr=lr, exact=exact, cap=cap,
    )
    s = scores * omc[None, :] if has_omc else scores
    keep = (matched >= thr_counts[:, None]) & (scores > 0.0)
    counts = jnp.sum(keep, axis=1).astype(jnp.int32)
    have = ~jnp.isnan(svals)
    present = keep & have[None, :]
    key1 = jnp.where(
        present, svals[None, :] if desc else -svals[None, :], NEG_F32
    )
    vals1, docs1 = jax.lax.top_k(key1, k)
    sc1 = jnp.take_along_axis(s, docs1, axis=1)
    # matched docs WITHOUT the field: doc-id ascending
    iota = jax.lax.broadcasted_iota(jnp.float32, (1, cap), 1)
    key2 = jnp.where(keep & ~have[None, :], -iota, NEG_F32)
    vals2, docs2 = jax.lax.top_k(key2, k)
    sc2 = jnp.take_along_axis(s, docs2, axis=1)
    return (
        docs1, vals1, sc1,
        docs2, vals2 > NEG_F32 / 2, sc2,
        counts,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "exact", "cap", "lr", "k", "R", "G", "has_mask", "has_omc",
    ),
)
def bm25_search_grouped_packed(
    p_doc, p_tf, p_exact_tf, p_flen,
    idesc, fdesc, scalars,
    doc_mask,            # bool[B, cap] (dummy (1,1) when has_mask=False)
    omc,                 # float32[cap] (dummy (1,) when has_omc=False)
    gid,                 # int32[cap] group ids (-1 = doc lacks the field)
    *,
    lr: int, exact: bool, cap: int, k: int, R: int, G: int,
    has_mask: bool, has_omc: bool,
):
    """Fused GROUP-BY search: score + threshold + main top-k + per-group
    top-R pages in ONE dispatch. The host path ships a dense score dict
    and walks per-doc value dicts over the full hit set
    (ReadSide._collect_group_values / _build_groups — O(hits) python,
    seconds at 10M matches; reference read/index/group.rs builds the
    same per-combo doc lists on CPU); here only (B, k) + (B, G, R)
    pages cross the boundary.

    Per-group top-R via ONE global (gid, -score, doc) 3-key sort + run
    slicing: group g's page is the first R entries of its run, read
    with a (B, G*R) gather off the per-group run starts (G binary
    searches). O(cap log cap) INDEPENDENT of G — the previous
    masked-merge scan was O(cap*G) and measured 812 ms @G=64 at the
    10M tier (r4 session 3); the sort design subsumes it at every G
    and lifts the G ceiling (r5, VERDICT r4 #5). Tie order matches the
    host path: score desc then doc asc (the doc iota is the third sort
    key). Docs without the group field (gid -1) sort to the G sentinel
    run and drop, like _build_groups skipping docs with no value."""
    starts, lens = idesc[0], idesc[1]
    weights, field_b, avg_flen = fdesc[0], fdesc[1], fdesc[2]
    n_docs, thr_counts = scalars[0], scalars[1]
    B = starts.shape[0]
    mask = doc_mask if has_mask else jnp.ones((B, cap), bool)
    scores, matched = bm25_score_batch(
        p_doc, p_tf, p_exact_tf, p_flen, starts, lens, weights, field_b,
        avg_flen, n_docs, mask, lr=lr, exact=exact, cap=cap,
    )
    s = scores * omc[None, :] if has_omc else scores
    keep = (matched >= thr_counts[:, None]) & (scores > 0.0)
    counts = jnp.sum(keep, axis=1).astype(jnp.int32)
    s = jnp.where(keep, s, -jnp.inf)
    from .vector import topk_2level

    vals, idx = topk_2level(s, k)

    if G <= 16:
        # small group spaces: the masked-merge scan beats the global
        # sort (hardware @10M: 364 ms sort-path vs 175 ms scan @G=8;
        # the sort wins from ~G=20 up and is G-independent — 370 ms
        # @G=64 vs 812 ms scan, RESULTS.md round-5)
        ch = min(cap, 1 << max(9, 21 - (max(G, 1) - 1).bit_length()))
        garange = jnp.arange(G, dtype=jnp.int32)
        init = (
            jnp.full((B, G, R), -jnp.inf, jnp.float32),
            jnp.zeros((B, G, R), jnp.int32),
        )

        def step(carry, ci):
            cv, cd = carry
            off = ci * ch
            gid_c = jax.lax.dynamic_slice(gid, (off,), (ch,))
            s_c = jax.lax.dynamic_slice(s, (0, off), (B, ch))
            gm = gid_c[None, :] == garange[:, None]
            sk = jnp.where(gm[None], s_c[:, None, :], -jnp.inf)
            v, i = jax.lax.top_k(jnp.concatenate([cv, sk], axis=2), R)
            d_new = jnp.broadcast_to(
                (off + jax.lax.iota(jnp.int32, ch))[None, None, :],
                (B, G, ch),
            )
            d = jnp.take_along_axis(
                jnp.concatenate([cd, d_new], axis=2), i, axis=2
            )
            return (v, d), None

        (gvals, gdocs), _ = jax.lax.scan(
            step, init, jnp.arange(cap // ch)
        )
        return vals, idx, counts, gvals, gdocs

    gidk = jnp.where(
        keep & (gid[None, :] >= 0), gid[None, :], jnp.int32(G)
    )
    neg = jnp.where(gidk < G, -s, jnp.inf)
    diota = jnp.broadcast_to(
        jax.lax.iota(jnp.int32, cap)[None, :], (B, cap)
    )
    gk, ns, dd = jax.lax.sort(
        (gidk, neg, diota), dimension=1, num_keys=3
    )
    # run starts of groups 0..G (G = end of the last real run): uniform
    # lower_bound over the sorted gid row — log2(cap) rounds of tiny
    # (B, G+1) gathers
    queries = jnp.arange(G + 1, dtype=jnp.int32)[None, :]
    pos = jnp.zeros((B, G + 1), jnp.int32)
    step_ = 1
    while step_ * 2 <= cap:
        step_ *= 2
    while step_ >= 1:
        probe = pos + step_
        pv = jnp.take_along_axis(
            gk, jnp.minimum(probe, cap) - 1, axis=1
        )
        pos = jnp.where((probe <= cap) & (pv < queries), probe, pos)
        step_ >>= 1
    g_start = pos[:, :G]                                  # (B, G)
    g_end = pos[:, 1:]                                    # (B, G)
    page_ix = g_start[:, :, None] + jnp.arange(R, dtype=jnp.int32)
    in_run = page_ix < g_end[:, :, None]
    clip = jnp.minimum(page_ix, cap - 1).reshape(B, G * R)
    gvals = jnp.where(
        in_run,
        -jnp.take_along_axis(ns, clip, axis=1).reshape(B, G, R),
        -jnp.inf,
    )
    gdocs = jnp.where(
        in_run,
        jnp.take_along_axis(dd, clip, axis=1).reshape(B, G, R),
        0,
    )
    return vals, idx, counts, gvals, gdocs


# ---------------------------------------------------------------------------
# Shared (term-deduplicated) batched scoring.
#
# A batch of queries repeats terms — especially the heavy ones. Scoring
# per (query, token) re-scans a heavy term's postings once PER QUERY.
# This path scores each UNIQUE token once into a dense per-token row,
# then distributes rows to queries with a (B, U) assignment matmul on
# the MXU:
#
#     acc_u   = aggregate(postings of unique token u)        # (U, cap)
#     sat_u   = idf(df_u) * (k+1) * acc_u / (k + acc_u)
#     scores  = A @ sat        A[b, u] = multiplicity of u in query b
#     matched = A @ (acc_u > 0)
#
# EXACT for unfiltered searches (a per-query filter changes each query's
# df, so filtered searches use the per-query path). Unique tokens are
# processed in chunks so the (CU, cap) rows stay within HBM budget.
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("lr", "cap", "cu", "exact", "axis_name")
)
def bm25_shared_partial(
    p_doc, p_tf, p_exact_tf, p_flen,
    u_starts,    # int32[U, NR] posting ranges of unique tokens (U % cu == 0)
    u_lens,      # int32[U, NR]
    u_weights,   # f32[U, NR]
    u_field_b,   # f32[U, NR]
    u_avg,       # f32[U, NR]
    token_map,   # int32[B, T] unique-token index per query slot (U = padding)
    n_docs,      # f32[] corpus size
    scores_in,   # f32[B, cap] accumulated scores from previous length classes
    matched_in,  # f32[B, cap]
    *,
    lr: int, cap: int, cu: int, exact: bool,
    axis_name=None,  # mesh axis for GLOBAL df under doc-id sharding
):
    U, NR = u_starts.shape
    B, T = token_map.shape
    LR = int(lr)
    tf_src = p_exact_tf if exact else p_tf
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, NR, LR), 2)

    def chunk_step(carry, ci):
        scores, matched = carry
        st = jax.lax.dynamic_slice(u_starts, (ci * cu, 0), (cu, NR))
        ln = jax.lax.dynamic_slice(u_lens, (ci * cu, 0), (cu, NR))
        wt = jax.lax.dynamic_slice(u_weights, (ci * cu, 0), (cu, NR))
        fb = jax.lax.dynamic_slice(u_field_b, (ci * cu, 0), (cu, NR))
        av = jax.lax.dynamic_slice(u_avg, (ci * cu, 0), (cu, NR))

        flat = st.reshape(-1)
        docs = jax.vmap(lambda s: jax.lax.dynamic_slice(p_doc, (s,), (LR,)))(flat).reshape(cu, NR, LR)
        tf = jax.vmap(lambda s: jax.lax.dynamic_slice(tf_src, (s,), (LR,)))(flat).reshape(cu, NR, LR)
        flen = jax.vmap(lambda s: jax.lax.dynamic_slice(p_flen, (s,), (LR,)))(flat).reshape(cu, NR, LR)
        valid = slot < ln[:, :, None]
        b_ = fb[:, :, None]
        denom = (1.0 - b_) + b_ * flen / jnp.maximum(av[:, :, None], 1e-9)
        ntf = wt[:, :, None] * tf / jnp.maximum(denom, 1e-9)
        keep = valid & (tf > 0)
        ntf = jnp.where(keep, ntf, 0.0)
        docs = jnp.where(keep, docs, cap)
        acc = _aggregate_dense(
            docs.reshape(cu, NR * LR), ntf.reshape(cu, NR * LR), cap
        )  # (cu, cap)
        present = (acc > 0.0).astype(jnp.float32)
        df = jnp.sum(present, axis=1)
        if axis_name is not None:
            df = jax.lax.psum(df, axis_name)  # global df over doc shards
        df = jnp.maximum(df, 1.0)
        idf = jnp.log1p((n_docs - df + 0.5) / (df + 0.5))
        sat = idf[:, None] * (K1 + 1.0) * acc / (K1 + acc) * present

        # assignment: A[b, j] = # of slots t with token_map[b, t] == ci*cu + j
        uid = ci * cu + jax.lax.broadcasted_iota(jnp.int32, (1, 1, cu), 2)
        A = jnp.sum(
            (token_map[:, :, None] == uid).astype(jnp.float32), axis=1
        )  # (B, cu)
        scores = scores + jnp.dot(A, sat, preferred_element_type=jnp.float32)
        matched = matched + jnp.dot(
            A, present, preferred_element_type=jnp.float32
        )
        return (scores, matched), None

    (scores, matched), _ = jax.lax.scan(
        chunk_step, (scores_in, matched_in), jnp.arange(U // cu)
    )
    return scores, matched


def _champion_acc(champs, ch_rows, ch_w):
    """(U, cap) accumulated normalized TF for champion tokens: each token
    sums its per-field champion rows (ch_rows (U, NC), -1 = empty)."""
    rows = jnp.take(
        champs, jnp.clip(ch_rows, 0, champs.shape[0] - 1), axis=0
    )  # (U, NC, cap)
    w_eff = jnp.where(ch_rows >= 0, ch_w, 0.0)
    return jnp.einsum(
        "unc,un->uc", rows, w_eff, preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("cap",))
def bm25_shared_champions(
    champs,       # f32[C, cap] champion rows (normalized TF, unweighted)
    ch_rows,      # int32[U, NC] champion rows per champion token
    ch_w,         # f32[U, NC] weights (boost * field weight)
    entry_token,  # int32[U] GLOBAL unique-token id of each entry
    token_map,    # int32[B, T] unique-token index per query slot
    n_docs,       # f32[]
    scores_in,    # f32[B, cap]
    matched_in,   # f32[B, cap]
    *,
    cap: int,
):
    """Shared-path champion class: heavy tokens score from precomputed
    dense rows (no posting gather), then distribute to queries via the
    same assignment matmul as the ranged classes. Only tokens FULLY
    covered by champions route here (partial live/ranged coverage falls
    back to the ranged classes, keeping matched-token counts exact)."""
    acc = _champion_acc(champs, ch_rows, ch_w)       # (U, cap)
    present = (acc > 0.0).astype(jnp.float32)
    df = jnp.maximum(jnp.sum(present, axis=1), 1.0)
    idf = jnp.log1p((n_docs - df + 0.5) / (df + 0.5))
    sat = idf[:, None] * (K1 + 1.0) * acc / (K1 + acc) * present
    A = jnp.sum(
        (token_map[:, :, None] == entry_token[None, None, :]).astype(
            jnp.float32
        ),
        axis=1,
    )  # (B, U)
    scores = scores_in + jnp.dot(A, sat, preferred_element_type=jnp.float32)
    matched = matched_in + jnp.dot(
        A, present, preferred_element_type=jnp.float32
    )
    return scores, matched


@functools.partial(jax.jit, static_argnames=("cap",))
def bm25_shared_champions_masked(
    champs, ch_rows, ch_w, entry_token, token_map,
    doc_mask,    # bool[B, cap]
    n_docs, scores_in, matched_in,
    *,
    cap: int,
):
    """Champion class under per-query filters: per-(query, token) df via
    one MXU matmul (bm25_shared_partial_masked semantics)."""
    mask_f = doc_mask.astype(jnp.float32)
    acc = _champion_acc(champs, ch_rows, ch_w)
    present = (acc > 0.0).astype(jnp.float32)
    g = (K1 + 1.0) * acc / (K1 + acc) * present
    df = jnp.maximum(
        jnp.dot(present, mask_f.T, preferred_element_type=jnp.float32), 1.0
    )  # (U, B)
    idf = jnp.log1p((n_docs - df + 0.5) / (df + 0.5))
    A = jnp.sum(
        (token_map[:, :, None] == entry_token[None, None, :]).astype(
            jnp.float32
        ),
        axis=1,
    )
    W = A * idf.T
    scores = scores_in + jnp.dot(W, g, preferred_element_type=jnp.float32)
    matched = matched_in + jnp.dot(
        A, present, preferred_element_type=jnp.float32
    )
    return scores * mask_f, matched * mask_f


@functools.partial(jax.jit, static_argnames=("k",))
def finalize_topk(scores, matched, thr_counts, omc, *, k: int):
    """Threshold + OMC + top-k + exact match counts in one dispatch."""
    from .vector import topk_2level

    s = scores * omc[None, :]
    keep = (matched >= thr_counts[:, None]) & (scores > 0.0)
    counts = jnp.sum(keep, axis=1).astype(jnp.int32)
    s = jnp.where(keep, s, -jnp.inf)
    vals, idx = topk_2level(s, k)
    return vals, idx, counts


@functools.partial(
    jax.jit, static_argnames=("lr", "cap", "cu", "exact", "axis_name")
)
def bm25_shared_partial_masked(
    p_doc, p_tf, p_exact_tf, p_flen,
    u_starts, u_lens, u_weights, u_field_b, u_avg,
    token_map,   # int32[B, T]
    doc_mask,    # bool[B, cap] per-query filter masks
    n_docs,      # f32[]
    scores_in, matched_in,
    *,
    lr: int, cap: int, cu: int, exact: bool,
    axis_name=None,  # mesh axis for GLOBAL filtered df under doc sharding
):
    """Shared term-dedup scoring WITH per-query filters, still exact:
    per-(query, token) filtered document frequencies come from one extra
    MXU matmul per chunk (df[b,u] = present_u · mask_b), so the IDF is
    computed over each query's filtered doc set while every unique
    token's postings are still gathered and aggregated exactly once."""
    U, NR = u_starts.shape
    B, T = token_map.shape
    LR = int(lr)
    tf_src = p_exact_tf if exact else p_tf
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, NR, LR), 2)
    mask_f = doc_mask.astype(jnp.float32)  # (B, cap)

    def chunk_step(carry, ci):
        scores, matched = carry
        st = jax.lax.dynamic_slice(u_starts, (ci * cu, 0), (cu, NR))
        ln = jax.lax.dynamic_slice(u_lens, (ci * cu, 0), (cu, NR))
        wt = jax.lax.dynamic_slice(u_weights, (ci * cu, 0), (cu, NR))
        fb = jax.lax.dynamic_slice(u_field_b, (ci * cu, 0), (cu, NR))
        av = jax.lax.dynamic_slice(u_avg, (ci * cu, 0), (cu, NR))
        flat = st.reshape(-1)
        docs = jax.vmap(lambda s: jax.lax.dynamic_slice(p_doc, (s,), (LR,)))(flat).reshape(cu, NR, LR)
        tf = jax.vmap(lambda s: jax.lax.dynamic_slice(tf_src, (s,), (LR,)))(flat).reshape(cu, NR, LR)
        flen = jax.vmap(lambda s: jax.lax.dynamic_slice(p_flen, (s,), (LR,)))(flat).reshape(cu, NR, LR)
        valid = slot < ln[:, :, None]
        b_ = fb[:, :, None]
        denom = (1.0 - b_) + b_ * flen / jnp.maximum(av[:, :, None], 1e-9)
        ntf = wt[:, :, None] * tf / jnp.maximum(denom, 1e-9)
        keep = valid & (tf > 0)
        ntf = jnp.where(keep, ntf, 0.0)
        docs = jnp.where(keep, docs, cap)
        acc = _aggregate_dense(
            docs.reshape(cu, NR * LR), ntf.reshape(cu, NR * LR), cap
        )
        present = (acc > 0.0).astype(jnp.float32)       # (cu, cap)
        g = (K1 + 1.0) * acc / (K1 + acc) * present      # saturation w/o idf

        # per-(query, token) filtered df: (cu, cap) @ (cap, B)
        df = jnp.dot(present, mask_f.T, preferred_element_type=jnp.float32)
        if axis_name is not None:
            df = jax.lax.psum(df, axis_name)
        df = jnp.maximum(df, 1.0)                        # (cu, B)
        idf = jnp.log1p((n_docs - df + 0.5) / (df + 0.5))

        uid = ci * cu + jax.lax.broadcasted_iota(jnp.int32, (1, 1, cu), 2)
        A = jnp.sum(
            (token_map[:, :, None] == uid).astype(jnp.float32), axis=1
        )                                                # (B, cu)
        W = A * idf.T                                    # (B, cu)
        scores = scores + jnp.dot(W, g, preferred_element_type=jnp.float32)
        matched = matched + jnp.dot(
            A, present, preferred_element_type=jnp.float32
        )
        return (scores, matched), None

    (scores, matched), _ = jax.lax.scan(
        chunk_step, (scores_in, matched_in), jnp.arange(U // cu)
    )
    # the per-query mask zeroes contributions of filtered-out docs
    scores = scores * mask_f
    matched = matched * mask_f
    return scores, matched
