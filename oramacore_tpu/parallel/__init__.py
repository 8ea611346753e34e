"""Multi-chip scale-out: doc-id-sharded search over a device mesh.

The reference scales reads by replicating whole indexes to N reader
processes and merging per-index results (SURVEY §2.9). On TPU we go
further: one logical index SHARDS its postings/vectors by doc id across
chips (`jax.sharding.Mesh` + shard_map); each chip scores its shard
locally and a collective top-k merge rides ICI:

    mesh axes: ('q', 'd') — queries data-parallel over 'q',
                             documents sharded over 'd'
    per-chip:   BM25F scatter-score over the local postings shard,
                cosine matmul over the local vector shard, local top-k
    collective: all_gather of per-shard top-k over 'd', final top-k

This file is also the target of the driver's `dryrun_multichip` check
(__graft_entry__.py): it must jit + run one full hybrid search step over
an N-device mesh on tiny shapes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.bm25 import K1, _aggregate_dense


class ShardedIndexArrays(NamedTuple):
    """One logical index laid out as [n_shards, ...] stacked shards.

    Postings within shard s reference LOCAL doc slots [0, cap); the
    global doc id is shard_doc_base[s] + local slot (range partitioning).
    """

    p_doc: jax.Array      # int32[D, P] local doc slot per posting
    p_tf: jax.Array       # f32[D, P]
    p_flen: jax.Array     # f32[D, P]
    vec_matrix: jax.Array  # bf16[D, N, dim] L2-normalized vector rows
    vec_doc: jax.Array    # int32[D, N] local doc slot per row
    vec_valid: jax.Array  # bool[D, N]
    doc_base: jax.Array   # int32[D] global doc-id base per shard


def build_mesh(n_q: int, n_d: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_q * n_d, (
        f"need {n_q * n_d} devices, have {len(devices)}"
    )
    arr = np.asarray(devices[: n_q * n_d]).reshape(n_q, n_d)
    return Mesh(arr, axis_names=("q", "d"))


def make_sharded_search_step(mesh: Mesh, *, lr: int, cap: int, k: int):
    """Build the jitted sharded hybrid search step for a fixed shape bucket.

    Inputs (global shapes; sharding annotated in the spec):
      postings slabs  [D, P]           sharded over 'd'
      vec matrix      [D, N, dim]      sharded over 'd'
      starts/lens/weights/avg  [B, T, NR]  replicated over 'd', split over 'q'
      queries         [B, dim]
      n_docs          f32[]            total corpus size (for IDF)
    Output: (doc_ids int32[B, k], scores f32[B, k]) global top-k.
    """
    D = mesh.shape["d"]

    def local_bm25(p_doc, p_tf, p_flen, starts, lens, weights, avg, n_docs):
        B, T, NR = starts.shape
        slot = jax.lax.broadcasted_iota(jnp.int32, (1, NR, lr), 2)

        def per_token(carry, tok_in):
            scores = carry
            st, ln, wt, av = tok_in
            B = st.shape[0]
            flat = jnp.clip(st.reshape(-1), 0, p_doc.shape[0] - lr)
            docs = jax.vmap(
                lambda s: jax.lax.dynamic_slice(p_doc, (s,), (lr,))
            )(flat).reshape(B, -1, lr)
            tf = jax.vmap(
                lambda s: jax.lax.dynamic_slice(p_tf, (s,), (lr,))
            )(flat).reshape(B, -1, lr)
            flen = jax.vmap(
                lambda s: jax.lax.dynamic_slice(p_flen, (s,), (lr,))
            )(flat).reshape(B, -1, lr)
            valid = slot < ln[:, :, None]
            denom = 0.25 + 0.75 * flen / jnp.maximum(av[:, :, None], 1e-9)
            ntf = wt[:, :, None] * tf / jnp.maximum(denom, 1e-9)
            keep = valid & (tf > 0)
            ntf = jnp.where(keep, ntf, 0.0)
            docs = jnp.where(keep, docs, cap)

            acc = _aggregate_dense(
                docs.reshape(B, -1), ntf.reshape(B, -1), cap
            )
            present = acc > 0.0
            # df is GLOBAL across shards: collective sum over 'd'
            df_local = jnp.sum(present, axis=1).astype(jnp.float32)
            df = jax.lax.psum(df_local, axis_name="d")
            df = jnp.maximum(df, 1.0)
            idf = jnp.log1p((n_docs - df + 0.5) / (df + 0.5))
            sat = idf[:, None] * (K1 + 1.0) * acc / (K1 + acc)
            sat = jnp.where(present, sat, 0.0)
            return scores + sat, None

        init = jnp.zeros((B, cap), jnp.float32)
        tok_inputs = (
            jnp.moveaxis(starts, 1, 0),
            jnp.moveaxis(lens, 1, 0),
            jnp.moveaxis(weights, 1, 0),
            jnp.moveaxis(avg, 1, 0),
        )
        scores, _ = jax.lax.scan(per_token, init, tok_inputs)
        return scores

    def step(
        p_doc, p_tf, p_flen,          # [D, P]
        vec_matrix, vec_doc, vec_valid,  # [D, N, dim], [D, N], [D, N]
        doc_base,                      # [D]
        starts, lens, weights, avg,    # [B, T, NR]
        queries,                       # [B, dim]
        n_docs,                        # f32[]
        alpha,                         # f32[] hybrid fulltext/vector mix
    ):
        def shard_fn(
            p_doc, p_tf, p_flen, vec_matrix, vec_doc, vec_valid, doc_base,
            starts, lens, weights, avg, queries, n_docs, alpha,
        ):
            # shard-local arrays arrive with leading dim 1 — drop it
            p_doc = p_doc[0]
            p_tf = p_tf[0]
            p_flen = p_flen[0]
            vec_matrix = vec_matrix[0]
            vec_doc = vec_doc[0]
            vec_valid = vec_valid[0]
            base = doc_base[0]

            bm25 = local_bm25(
                p_doc, p_tf, p_flen, starts, lens, weights, avg, n_docs
            )  # (B, cap)

            # vector scores scattered onto the same local doc space
            sims = jnp.dot(
                queries.astype(jnp.bfloat16),
                vec_matrix.T,
                preferred_element_type=jnp.float32,
            )  # (B, N)
            sims = jnp.where(vec_valid[None, :], sims, 0.0)
            rows = jnp.where(vec_valid, vec_doc, cap)

            def scatter_max(sims_b):
                acc = jnp.zeros((cap + 1,), jnp.float32)
                return acc.at[rows].max(sims_b)[:cap]

            vec_scores = jax.vmap(scatter_max)(sims)

            combined = alpha * bm25 + (1.0 - alpha) * vec_scores
            local_vals, local_idx = jax.lax.top_k(combined, k)  # (B, k)
            local_ids = local_idx + base

            # collective top-k merge over ICI: gather all shards' candidates
            all_vals = jax.lax.all_gather(local_vals, "d", axis=1)  # (B, D, k)
            all_ids = jax.lax.all_gather(local_ids, "d", axis=1)
            B = all_vals.shape[0]
            flat_vals = all_vals.reshape(B, D * k)
            flat_ids = all_ids.reshape(B, D * k)
            vals, sel = jax.lax.top_k(flat_vals, k)
            ids = jnp.take_along_axis(flat_ids, sel, axis=1)
            return ids, vals

        return shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P("d", None), P("d", None), P("d", None),
                P("d", None, None), P("d", None), P("d", None),
                P("d"),
                P("q", None, None), P("q", None, None),
                P("q", None, None), P("q", None, None),
                P("q", None),
                P(), P(),
            ),
            out_specs=(P("q", None), P("q", None)),
            check_vma=False,
        )(
            p_doc, p_tf, p_flen, vec_matrix, vec_doc, vec_valid, doc_base,
            starts, lens, weights, avg, queries, n_docs, alpha,
        )

    return jax.jit(step)


def make_toy_sharded_index(
    n_shards: int, postings_per_shard: int, rows_per_shard: int,
    cap: int, dim: int, seed: int = 0,
) -> ShardedIndexArrays:
    """Tiny synthetic sharded index for dry-runs and tests."""
    rng = np.random.default_rng(seed)
    D = n_shards
    p_doc = rng.integers(0, cap, (D, postings_per_shard)).astype(np.int32)
    p_tf = rng.integers(1, 4, (D, postings_per_shard)).astype(np.float32)
    p_flen = rng.integers(5, 50, (D, postings_per_shard)).astype(np.float32)
    mat = rng.normal(size=(D, rows_per_shard, dim)).astype(np.float32)
    mat /= np.maximum(np.linalg.norm(mat, axis=-1, keepdims=True), 1e-9)
    vec_doc = rng.integers(0, cap, (D, rows_per_shard)).astype(np.int32)
    vec_valid = np.ones((D, rows_per_shard), bool)
    doc_base = (np.arange(D) * cap).astype(np.int32)
    return ShardedIndexArrays(
        p_doc=jnp.asarray(p_doc),
        p_tf=jnp.asarray(p_tf),
        p_flen=jnp.asarray(p_flen),
        vec_matrix=jnp.asarray(mat, jnp.bfloat16),
        vec_doc=jnp.asarray(vec_doc),
        vec_valid=jnp.asarray(vec_valid),
        doc_base=jnp.asarray(doc_base),
    )
