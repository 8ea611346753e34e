"""Vector similarity search on TPU: batched bf16 matmul + fused top-k.

Replaces the reference's HNSW graph traversal
(`oramacore_fields::embedding::EmbeddingStorage`, consumed at
read/index/embedding_field.rs:7-14) with the TPU-native formulation:
cosine similarity over L2-normalized vectors is a single large matmul on
the MXU. A `lax.scan` over row tiles keeps the (B, N) score matrix out of
HBM — each tile's scores merge into a running top-k in registers/VMEM.
Filters push down as a per-row multiplier gathered from the doc mask
(reference pushes DocumentFilter into HNSW traversal,
embedding_field.rs:53-61).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def topk_2level(s: jax.Array, k: int, group: int = 128):
    """Exact top-k via two-level selection: max-pool into groups, top-k
    over group maxima, rescan only the winning groups. Replaces a full
    sort of n elements with sorts of n/group and k*group — the TPU's
    top_k lowers to bitonic sort, so this is the difference between
    sorting 64k lanes and sorting 512 (measured: the chunk-merge sort was
    the flat-search bottleneck at 1M rows, not the MXU matmul).

    Exact when k <= n/group (each of the true top-k lives in some group
    whose max is >= it, and we rescan k whole groups)."""
    B, n = s.shape
    # below ~16k lanes a single bitonic sort wins over the extra gathers
    if n < 16384 or n % group or n // group < k:
        return jax.lax.top_k(s, k)
    sg = s.reshape(B, n // group, group)
    gmax = jnp.max(sg, axis=2)
    _, gi = jax.lax.top_k(gmax, k)                      # (B, k) group ids
    cand = jnp.take_along_axis(sg, gi[:, :, None], axis=1).reshape(B, k * group)
    cv, ci = jax.lax.top_k(cand, k)
    grp = jnp.take_along_axis(gi, ci // group, axis=1)
    return cv, grp * group + (ci % group)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def flat_cosine_topk(
    queries: jax.Array,    # f32[B, D] L2-normalized query vectors
    matrix: jax.Array,     # bf16[N, D] L2-normalized corpus rows (padded)
    row_valid: jax.Array,  # bool[N] False for padding / filtered rows
    *,
    k: int,
    chunk: int = 65536,
) -> tuple[jax.Array, jax.Array]:
    """Exact cosine top-k rows. Returns (scores f32[B, k], rows int32[B, k])."""
    B, D = queries.shape
    N = matrix.shape[0]
    assert N % chunk == 0, "matrix rows must be padded to a chunk multiple"
    n_chunks = N // chunk

    q = queries.astype(jnp.bfloat16)

    def body(carry, i):
        vals, rows = carry
        tile = jax.lax.dynamic_slice(matrix, (i * chunk, 0), (chunk, D))
        valid = jax.lax.dynamic_slice(row_valid, (i * chunk,), (chunk,))
        s = jnp.dot(q, tile.T, preferred_element_type=jnp.float32)  # (B, chunk)
        s = jnp.where(valid[None, :], s, NEG_INF)
        # two-level exact top-k inside the chunk, then merge with carry
        tv, ti = topk_2level(s, k)
        ti = ti + i * chunk
        cat_v = jnp.concatenate([vals, tv], axis=1)
        cat_r = jnp.concatenate([rows, ti], axis=1)
        new_v, sel = jax.lax.top_k(cat_v, k)
        new_r = jnp.take_along_axis(cat_r, sel, axis=1)
        return (new_v, new_r), None

    init = (
        jnp.full((B, k), NEG_INF, jnp.float32),
        jnp.full((B, k), -1, jnp.int32),
    )
    (vals, rows), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
    return vals, rows


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def flat_cosine_topk_filtered(
    queries: jax.Array,     # f32[B, D]
    matrix: jax.Array,      # bf16[N, D]
    row_doc: jax.Array,     # int32[N] doc id per row (multi-vector docs)
    doc_mask: jax.Array,    # bool[cap] filter mask over doc ids
    row_valid: jax.Array,   # bool[N]
    *,
    k: int,
    chunk: int = 65536,
):
    """Top-k with a doc-level filter mask pushed down to rows."""
    mask_by_row = jnp.take(doc_mask, jnp.clip(row_doc, 0, doc_mask.shape[0] - 1))
    return flat_cosine_topk(
        queries, matrix, row_valid & mask_by_row, k=k, chunk=chunk
    )


# ---------------------------------------------------------------------------
# int8 quantized corpus kernels — the 10M x 768-d tier.
#
# A 10M x 768 f32 matrix is 30 GB and bf16 is 15 GB: neither fits one
# v5e chip's 16 GB HBM. Per-row symmetric int8 quantization (row stored
# as q_i8 with scale s = max|v| / 127, v ≈ s * q_i8) brings the corpus to
# 7.7 GB, and cosine becomes score = s * dot(q, q_i8) — one bf16 matmul
# over int8 rows cast in-registers (HBM reads stay int8). Measured recall
# impact of the quantization is ~zero at recall@10 (see benches/RESULTS).
#
# Batched throughput uses the FULL int8 scan (MXU-dense, HBM-bound at
# ~8 GB/query-batch); clustered IVF probing only wins at small batches
# where per-query bytes gathered (B * nprobe * window * D) undercut the
# full-scan's corpus read. Both are provided; the bench documents the
# crossover. IVF probe units are SUB-BLOCKS of a cluster (a cluster
# larger than the window splits into several units sharing its centroid),
# so oversized clusters are covered without padding memory or spill.
# ---------------------------------------------------------------------------

def quantize_rows_int8(rows):
    """Per-row symmetric int8 quantization (device fn, jit-safe).
    Returns (q int8[N, D], scale f32[N])."""
    amax = jnp.max(jnp.abs(rows), axis=1)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(rows / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def int8_scan_topk(
    queries: jax.Array,   # f32[B, D] L2-normalized
    mat_i8: jax.Array,    # int8[N, D] quantized rows (padded rows scale 0)
    scales: jax.Array,    # f32[N] per-row scales (0 = padding)
    *,
    k: int,
    chunk: int = 524288,
):
    """Exact top-k over the whole quantized corpus: lax.scan over row
    tiles, bf16 matmul (int8 cast in-registers), per-tile two-level
    selection merged into a running (B, k) carry."""
    B, D = queries.shape
    N = mat_i8.shape[0]
    assert N % chunk == 0, "pad rows to a chunk multiple"
    q = queries.astype(jnp.bfloat16)

    def body(carry, i):
        vals, rows = carry
        tile = jax.lax.dynamic_slice(mat_i8, (i * chunk, 0), (chunk, D))
        sc = jax.lax.dynamic_slice(scales, (i * chunk,), (chunk,))
        s = jnp.dot(
            q, tile.astype(jnp.bfloat16).T, preferred_element_type=jnp.float32
        ) * sc[None, :]
        s = jnp.where(sc[None, :] > 0, s, NEG_INF)
        tv, ti = topk_2level(s, k)
        ti = ti + i * chunk
        cat_v = jnp.concatenate([vals, tv], axis=1)
        cat_r = jnp.concatenate([rows, ti], axis=1)
        new_v, sel = jax.lax.top_k(cat_v, k)
        new_r = jnp.take_along_axis(cat_r, sel, axis=1)
        return (new_v, new_r), None

    init = (
        jnp.full((B, k), NEG_INF, jnp.float32),
        jnp.full((B, k), -1, jnp.int32),
    )
    (vals, rows), _ = jax.lax.scan(body, init, jnp.arange(N // chunk))
    return vals, rows


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "window"))
def ivf_int8_topk(
    queries: jax.Array,      # f32[B, D] L2-normalized
    mat_i8: jax.Array,       # int8[N, D] rows PACKED by cluster (no padding)
    scales: jax.Array,       # f32[N]
    unit_centroids: jax.Array,  # f32[U, D] sub-block centroids (normalized)
    unit_starts: jax.Array,  # int32[U] packed start row of each sub-block
    *,
    k: int,
    nprobe: int,
    window: int,             # static: rows scanned per probed unit
):
    """Low-latency clustered search over the packed int8 corpus. Probe
    units are cluster SUB-BLOCKS (window rows each): a big cluster's
    units share its centroid, so it gets proportionally many probes; a
    window overrunning into the next cluster just scores extra candidate
    rows (never wrong, packed layout has no junk)."""
    B, D = queries.shape
    N = mat_i8.shape[0]
    _, probe = jax.lax.top_k(
        jnp.dot(
            queries.astype(jnp.bfloat16),
            unit_centroids.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        ),
        nprobe,
    )  # (B, nprobe)

    def per_query(qv, probes):
        qv = qv.astype(jnp.bfloat16)

        def body(carry, ui):
            vals, rows = carry
            start = jnp.minimum(jnp.take(unit_starts, ui), N - window)
            tile = jax.lax.dynamic_slice(mat_i8, (start, 0), (window, D))
            sc = jax.lax.dynamic_slice(scales, (start,), (window,))
            s = jnp.dot(
                tile.astype(jnp.bfloat16), qv,
                preferred_element_type=jnp.float32,
            ) * sc
            s = jnp.where(sc > 0, s, NEG_INF)
            tile_rows = (
                jax.lax.broadcasted_iota(jnp.int32, (window, 1), 0).squeeze(-1)
                + start
            )
            cat_v = jnp.concatenate([vals, s])
            cat_r = jnp.concatenate([rows, tile_rows])
            new_v, sel = jax.lax.top_k(cat_v, k)
            new_r = jnp.take(cat_r, sel)
            return (new_v, new_r), None

        init = (
            jnp.full((k,), NEG_INF, jnp.float32),
            jnp.full((k,), -1, jnp.int32),
        )
        (vals, rows), _ = jax.lax.scan(body, init, probes)
        return vals, rows

    return jax.vmap(per_query)(queries, probe)


@functools.partial(
    jax.jit, static_argnames=("k", "nprobe", "window", "has_mask")
)
def ivf_int8_topk_masked(
    queries: jax.Array,      # f32[B, D] L2-normalized
    mat_i8: jax.Array,       # int8[N, D] rows packed by cluster
    scales: jax.Array,       # f32[N] (0 = padding)
    row_doc: jax.Array,      # int32[N] doc id per row
    unit_centroids: jax.Array,  # f32[U, D]
    unit_starts: jax.Array,  # int32[U]
    doc_mask: jax.Array,     # bool[B, cap] per-query doc filter
    *,
    k: int,
    nprobe: int,
    window: int,
    has_mask: bool,
):
    """`ivf_int8_topk` with a PER-QUERY doc-level filter pushed down into
    the probe scan (the hybrid path needs per-query where-filters; the
    shared-scales trick in VectorIndex.search only supports one mask per
    dispatch)."""
    B, D = queries.shape
    N = mat_i8.shape[0]
    cap = doc_mask.shape[1]
    _, probe = jax.lax.top_k(
        jnp.dot(
            queries.astype(jnp.bfloat16),
            unit_centroids.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        ),
        nprobe,
    )

    def per_query(qv, probes, mask_b):
        qv = qv.astype(jnp.bfloat16)

        def body(carry, ui):
            vals, rows = carry
            start = jnp.minimum(jnp.take(unit_starts, ui), N - window)
            tile = jax.lax.dynamic_slice(mat_i8, (start, 0), (window, D))
            sc = jax.lax.dynamic_slice(scales, (start,), (window,))
            s = jnp.dot(
                tile.astype(jnp.bfloat16), qv,
                preferred_element_type=jnp.float32,
            ) * sc
            keep = sc > 0
            if has_mask:
                docs_w = jax.lax.dynamic_slice(row_doc, (start,), (window,))
                keep = keep & jnp.take(
                    mask_b, jnp.clip(docs_w, 0, cap - 1)
                )
            s = jnp.where(keep, s, NEG_INF)
            tile_rows = (
                jax.lax.broadcasted_iota(jnp.int32, (window, 1), 0).squeeze(-1)
                + start
            )
            cat_v = jnp.concatenate([vals, s])
            cat_r = jnp.concatenate([rows, tile_rows])
            new_v, sel = jax.lax.top_k(cat_v, k)
            new_r = jnp.take(cat_r, sel)
            return (new_v, new_r), None

        init = (
            jnp.full((k,), NEG_INF, jnp.float32),
            jnp.full((k,), -1, jnp.int32),
        )
        (vals, rows), _ = jax.lax.scan(body, init, probes)
        return vals, rows

    return jax.vmap(per_query)(queries, probe, doc_mask)


def l2_normalize(x, axis=-1, eps=1e-12):
    import numpy as np

    n = np.linalg.norm(x, axis=axis, keepdims=True)
    return x / np.maximum(n, eps)


# ---------------------------------------------------------------------------
# IVF (clustered) pruning for large corpora — centroid assign on insert,
# probe top-nprobe lists on query (SURVEY §7 phase 3; reference parity
# target: recall@10 >= 0.95 at 10M x 768-d).
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("nprobe",))
def top_centroids(
    queries: jax.Array,     # f32[B, D] normalized
    centroids: jax.Array,   # f32[C, D] normalized
    *,
    nprobe: int,
):
    s = jnp.dot(
        queries.astype(jnp.bfloat16),
        centroids.astype(jnp.bfloat16).T,
        preferred_element_type=jnp.float32,
    )
    return jax.lax.top_k(s, nprobe)  # (scores, centroid ids)


@functools.partial(jax.jit, static_argnames=("k", "rows_per_probe"))
def ivf_gather_topk(
    queries: jax.Array,      # f32[B, D]
    matrix: jax.Array,       # bf16[N, D] rows grouped by cluster
    row_valid: jax.Array,    # bool[N]
    list_starts: jax.Array,  # int32[C] start row of each cluster block
    probe_ids: jax.Array,    # int32[B, nprobe] clusters to scan per query
    *,
    k: int,
    rows_per_probe: int,     # static: padded rows scanned per cluster
):
    """Scan only the probed clusters' row blocks; fused top-k merge.

    Cluster blocks are padded to `rows_per_probe` rows at build time so the
    gather is regular (static shapes, no recompile per query).
    """
    B, D = queries.shape
    q = queries.astype(jnp.bfloat16)
    nprobe = probe_ids.shape[1]

    def per_query(qv, probes):
        def body(carry, ci):
            vals, rows = carry
            start = jnp.take(list_starts, ci)
            tile = jax.lax.dynamic_slice(
                matrix, (start, 0), (rows_per_probe, D)
            )
            valid = jax.lax.dynamic_slice(row_valid, (start,), (rows_per_probe,))
            s = jnp.dot(
                qv[None, :], tile.T, preferred_element_type=jnp.float32
            )[0]
            s = jnp.where(valid, s, NEG_INF)
            tile_rows = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (rows_per_probe, 1), 0
                ).squeeze(-1)
                + start
            )
            cat_v = jnp.concatenate([vals, s])
            cat_r = jnp.concatenate([rows, tile_rows])
            new_v, sel = jax.lax.top_k(cat_v, k)
            new_r = jnp.take(cat_r, sel)
            return (new_v, new_r), None

        init = (
            jnp.full((k,), NEG_INF, jnp.float32),
            jnp.full((k,), -1, jnp.int32),
        )
        (vals, rows), _ = jax.lax.scan(body, init, probes)
        return vals, rows

    return jax.vmap(per_query)(q, probe_ids)
