"""Fused hybrid (BM25F + vector) scoring: ONE device dispatch per batch.

Reference semantics (token_score.rs:357-422): run fulltext and vector
scoring, min-max normalize over BOTH score sets (min folded from 0.0 —
all kept scores are non-negative), sum, then OMC multipliers
(search.rs:342). The round-1 build issued 2-3 separate device calls per
hybrid query plus host-side dict fusion; on the tunneled TPU each
dispatch costs 30-90 ms, so fusing everything into one jitted call is
the difference between ~17 QPS and fulltext-class throughput.

Layout: BM25 uses the packed postings slab + range descriptors
(ops/bm25.py); the vector side is the flat row matrix (bf16[N, dim]) with
row->doc scatter-max onto the same dense doc space; fusion, threshold,
OMC and top-k all happen in-register before a single (B, k) transfer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .bm25 import bm25_score_batch

NEG_INF = -1e30


def _vector_dense_scores(
    vec_matrix,   # bf16[N, dim] L2-normalized rows
    vec_doc,      # int32[N] doc id per row
    vec_valid,    # bool[N]
    queries,      # f32[B, dim] L2-normalized query vectors
    sim,          # f32[B] similarity threshold per query
    *,
    cap: int,
    has_rescale: bool,
    rescale_lo: float,
    rescale_hi: float,
):
    """(B, cap) vector scores: max over a doc's rows, 0 below threshold."""
    sims = jnp.dot(
        queries.astype(jnp.bfloat16),
        vec_matrix.T,
        preferred_element_type=jnp.float32,
    )  # (B, N)
    if has_rescale:
        sims = jnp.clip(
            (sims - rescale_lo) / (rescale_hi - rescale_lo), 0.0, 1.0
        )
    keep = vec_valid[None, :] & (sims >= sim[:, None])
    sims = jnp.where(keep, sims, 0.0)
    rows = jnp.where(vec_valid, vec_doc, cap)  # invalid -> overflow slot

    def scatter_max(sims_b):
        acc = jnp.zeros((cap + 1,), jnp.float32)
        return acc.at[rows].max(sims_b)[:cap]

    return jax.vmap(scatter_max)(sims)


def _fuse(bm25, matched, vec, thr_counts, doc_mask, omc, *, has_omc: bool):
    """Min-max fusion + threshold + OMC. Returns (fused, present)."""
    ft_keep = (bm25 > 0.0) & (matched >= thr_counts[:, None]) & doc_mask
    vec_keep = (vec > 0.0) & doc_mask
    ft = jnp.where(ft_keep, bm25, 0.0)
    vc = jnp.where(vec_keep, vec, 0.0)
    # reference min-max folds lo from 0.0 and both sets share the span
    hi = jnp.maximum(
        jnp.max(ft, axis=1), jnp.max(vc, axis=1)
    )  # (B,)
    span = jnp.where(hi > 0.0, hi, 1.0)
    fused = (ft + vc) / span[:, None]
    if has_omc:
        fused = fused * omc[None, :]
    present = ft_keep | vec_keep
    return jnp.where(present, fused, -jnp.inf), present


@functools.partial(
    jax.jit,
    static_argnames=(
        "lr", "exact", "cap", "k", "has_mask", "has_omc",
        "has_rescale", "rescale_lo", "rescale_hi", "with_bitmap",
    ),
)
def hybrid_search_topk_packed(
    p_doc, p_tf, p_exact_tf, p_flen,
    idesc,       # int32[2, B, T, NR]: starts, lens
    fdesc,       # float32[3, B, T, NR]: weights, field_b, avg_flen
    scalars,     # float32[3, B]: n_docs, thr_counts, similarity
    vec_matrix,  # bf16[N, dim]
    vec_doc,     # int32[N]
    vec_valid,   # bool[N]
    queries,     # f32[B, dim]
    doc_mask,    # bool[B, cap] (dummy (1,1) when has_mask=False)
    omc,         # f32[cap] (dummy (1,) when has_omc=False)
    *,
    lr: int, exact: bool, cap: int, k: int,
    has_mask: bool, has_omc: bool,
    has_rescale: bool, rescale_lo: float, rescale_hi: float,
    with_bitmap: bool = False,
):
    """Returns (vals f32[B, k], ids int32[B, k], counts int32[B]);
    with_bitmap appends the match set as packed bits (uint8[B, cap/8],
    ops/bm25.py semantics) for fused facet counting."""
    starts, lens = idesc[0], idesc[1]
    weights, field_b, avg_flen = fdesc[0], fdesc[1], fdesc[2]
    n_docs, thr_counts, sim = scalars[0], scalars[1], scalars[2]
    B = starts.shape[0]
    mask = doc_mask if has_mask else jnp.ones((B, cap), bool)

    bm25, matched = bm25_score_batch(
        p_doc, p_tf, p_exact_tf, p_flen, starts, lens, weights, field_b,
        avg_flen, n_docs, mask, lr=lr, exact=exact, cap=cap,
    )
    vec = _vector_dense_scores(
        vec_matrix, vec_doc, vec_valid, queries, sim,
        cap=cap, has_rescale=has_rescale,
        rescale_lo=rescale_lo, rescale_hi=rescale_hi,
    )
    fused, present = _fuse(
        bm25, matched, vec, thr_counts, mask, omc, has_omc=has_omc
    )
    counts = jnp.sum(present, axis=1).astype(jnp.int32)
    from .vector import topk_2level

    vals, idx = topk_2level(fused, k)
    if with_bitmap:
        return vals, idx, counts, jnp.packbits(present, axis=1)
    return vals, idx, counts


def _vector_dense_scores_int8(
    mat_i8,       # int8[N, D] packed by cluster
    scales,       # f32[N]
    row_doc,      # int32[N]
    unit_cen,     # f32[U, D]
    unit_starts,  # int32[U]
    queries,      # f32[B, dim]
    sim,          # f32[B]
    doc_mask,     # bool[B, cap] (dummy when has_mask=False)
    *,
    cap: int,
    V: int,
    nprobe: int,
    window: int,
    has_mask: bool,
    has_rescale: bool,
    rescale_lo: float,
    rescale_hi: float,
):
    """(B, cap) vector scores for the int8/IVF tier: probe the top-nprobe
    cluster units, keep the top-V candidate rows per query, scatter-max
    onto the dense doc space. Candidate-bounded like the reference's
    vector side (EmbeddingStorage.search takes `limit`); scores are the
    quantized int8 dots (the f32 rerank needs host rows — documented
    recall ceiling 0.9785 at 10M, benches/RESULTS.md)."""
    from .vector import ivf_int8_topk_masked

    B = queries.shape[0]
    mask = doc_mask if has_mask else jnp.ones((B, 1), bool)
    vals, rows = ivf_int8_topk_masked(
        queries, mat_i8, scales, row_doc, unit_cen, unit_starts, mask,
        k=V, nprobe=nprobe, window=window, has_mask=has_mask,
    )  # (B, V)
    if has_rescale:
        vals = jnp.clip(
            (vals - rescale_lo) / (rescale_hi - rescale_lo), 0.0, 1.0
        )
    keep = (rows >= 0) & (vals >= sim[:, None]) & (vals > NEG_INF / 2)
    vals = jnp.where(keep, vals, 0.0)
    docs = jnp.where(
        keep,
        jnp.take(row_doc, jnp.clip(rows, 0, row_doc.shape[0] - 1)),
        cap,  # overflow slot
    )

    def scatter_max(vals_b, docs_b):
        acc = jnp.zeros((cap + 1,), jnp.float32)
        return acc.at[docs_b].max(vals_b)[:cap]

    return jax.vmap(scatter_max)(vals, docs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "lr", "exact", "cap", "k", "V", "nprobe", "window",
        "has_mask", "has_omc", "has_rescale", "rescale_lo", "rescale_hi",
        "has_champ", "with_bitmap",
    ),
)
def hybrid_search_topk_packed_int8(
    p_doc, p_tf, p_exact_tf, p_flen,
    idesc, fdesc,
    scalars,      # float32[3, B]: n_docs, thr_counts, similarity
    mat_i8, scales, row_doc, unit_cen, unit_starts,
    queries,      # f32[B, dim]
    doc_mask, omc,
    champs=None, ch_idx=None, ch_w=None,   # champion dense rows
    *,
    lr: int, exact: bool, cap: int, k: int,
    V: int, nprobe: int, window: int,
    has_mask: bool, has_omc: bool,
    has_rescale: bool, rescale_lo: float, rescale_hi: float,
    has_champ: bool = False,
    with_bitmap: bool = False,
):
    """Fused hybrid for int8/IVF-tier vector indexes (the >=2M-row
    layout): BM25 ranged scoring + IVF candidate probe + fusion + OMC +
    top-k, one dispatch. Champion rows replace heavy terms' posting
    scans with dense row-adds — at 10M-doc caps the scatter-add
    aggregation runs ~43M elems/s, so a 393k-posting term costs ~9 ms
    scattered vs one bandwidth-bound row read."""
    starts, lens = idesc[0], idesc[1]
    weights, field_b, avg_flen = fdesc[0], fdesc[1], fdesc[2]
    n_docs, thr_counts, sim = scalars[0], scalars[1], scalars[2]
    B = starts.shape[0]
    mask = doc_mask if has_mask else jnp.ones((B, cap), bool)

    bm25, matched = bm25_score_batch(
        p_doc, p_tf, p_exact_tf, p_flen, starts, lens, weights, field_b,
        avg_flen, n_docs, mask,
        champs, ch_idx, ch_w,
        lr=lr, exact=exact, cap=cap, has_champ=has_champ,
    )
    vec = _vector_dense_scores_int8(
        mat_i8, scales, row_doc, unit_cen, unit_starts, queries, sim,
        doc_mask, cap=cap, V=V, nprobe=nprobe, window=window,
        has_mask=has_mask, has_rescale=has_rescale,
        rescale_lo=rescale_lo, rescale_hi=rescale_hi,
    )
    fused, present = _fuse(
        bm25, matched, vec, thr_counts, mask, omc, has_omc=has_omc
    )
    counts = jnp.sum(present, axis=1).astype(jnp.int32)
    from .vector import topk_2level

    vals, idx = topk_2level(fused, k)
    if with_bitmap:
        return vals, idx, counts, jnp.packbits(present, axis=1)
    return vals, idx, counts


@functools.partial(
    jax.jit,
    static_argnames=(
        "cap", "k", "V", "nprobe", "window", "has_mask", "has_omc",
        "has_rescale", "rescale_lo", "rescale_hi",
    ),
)
def hybrid_finalize_topk_int8(
    scores, matched, thr_counts,
    mat_i8, scales, row_doc, unit_cen, unit_starts,
    queries, sim, doc_mask, omc,
    *,
    cap: int, k: int, V: int, nprobe: int, window: int,
    has_mask: bool, has_omc: bool,
    has_rescale: bool, rescale_lo: float, rescale_hi: float,
):
    """Batched-hybrid tail over the int8/IVF layout for the shared
    (term-dedup) BM25 path."""
    B = scores.shape[0]
    mask = doc_mask if has_mask else jnp.ones((B, cap), bool)
    vec = _vector_dense_scores_int8(
        mat_i8, scales, row_doc, unit_cen, unit_starts, queries, sim,
        doc_mask, cap=cap, V=V, nprobe=nprobe, window=window,
        has_mask=has_mask, has_rescale=has_rescale,
        rescale_lo=rescale_lo, rescale_hi=rescale_hi,
    )
    fused, present = _fuse(
        scores, matched, vec, thr_counts, mask, omc, has_omc=has_omc
    )
    counts = jnp.sum(present, axis=1).astype(jnp.int32)
    from .vector import topk_2level

    vals, idx = topk_2level(fused, k)
    return vals, idx, counts


@functools.partial(
    jax.jit,
    static_argnames=(
        "cap", "k", "has_mask", "has_omc",
        "has_rescale", "rescale_lo", "rescale_hi",
    ),
)
def hybrid_finalize_topk(
    scores,      # f32[B, cap] accumulated shared BM25 scores
    matched,     # f32[B, cap]
    thr_counts,  # f32[B]
    vec_matrix, vec_doc, vec_valid,
    queries,     # f32[B, dim]
    sim,         # f32[B]
    doc_mask,    # bool[B, cap] (dummy when has_mask=False)
    omc,         # f32[cap] (dummy when has_omc=False)
    *,
    cap: int, k: int, has_mask: bool, has_omc: bool,
    has_rescale: bool, rescale_lo: float, rescale_hi: float,
):
    """Batched-hybrid tail for the shared (term-dedup) BM25 path: vector
    matmul + fusion + OMC + top-k in one dispatch."""
    B = scores.shape[0]
    mask = doc_mask if has_mask else jnp.ones((B, cap), bool)
    vec = _vector_dense_scores(
        vec_matrix, vec_doc, vec_valid, queries, sim,
        cap=cap, has_rescale=has_rescale,
        rescale_lo=rescale_lo, rescale_hi=rescale_hi,
    )
    fused, present = _fuse(
        scores, matched, vec, thr_counts, mask, omc, has_omc=has_omc
    )
    counts = jnp.sum(present, axis=1).astype(jnp.int32)
    from .vector import topk_2level

    vals, idx = topk_2level(fused, k)
    return vals, idx, counts
