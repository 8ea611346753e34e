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

TPU-first design: instead of the reference's per-doc hash maps, postings
live as flat device arrays (doc, tf, exact_tf, field_len per posting).
A query batch carries padded posting-range descriptors; the kernel
gathers postings, computes length-normalized TFs on the VPU, scatter-adds
into a dense per-token accumulator over the doc space, derives the
corpus document frequency with a dense reduction, applies IDF saturation
and accumulates — one fused XLA computation per (B, T, NR, LR, cap)
shape bucket, compiled once and reused.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

K1 = 1.2  # reference k parameter (token_score.rs:283)


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


@functools.partial(
    jax.jit,
    static_argnames=("exact", "cap", "lr"),
)
def bm25_score_batch(
    p_doc: jax.Array,        # int32[P]
    p_tf: jax.Array,         # float32[P]
    p_exact_tf: jax.Array,   # float32[P]
    p_flen: jax.Array,       # float32[P]
    starts: jax.Array,       # int32[B, T, NR] posting-range starts
    lens: jax.Array,         # int32[B, T, NR] posting-range lengths (<= LR)
    weights: jax.Array,      # float32[B, T, NR] field boost per range
    field_b: jax.Array,      # float32[B, T, NR] BM25 b per range's field
    avg_flen: jax.Array,     # float32[B, T, NR] avg field len per range's field
    n_docs: jax.Array,       # float32[B] total docs (corpus size per query)
    doc_mask: jax.Array,     # bool[B, cap] filter mask (True = doc allowed);
                             # pushed into scoring so corpus df / IDF are
                             # computed over the FILTERED doc set (reference
                             # collect_contributions_with_filter semantics)
    *,
    lr: int,                 # static: max range length (LR)
    exact: bool,
    cap: int,                # static: doc-id capacity (scores width)
):
    """Score a batch of queries against one index's postings slab.

    Returns (scores f32[B, cap], matched_tokens f32[B, cap]).
    """
    B, T, NR = starts.shape
    LR = int(lr)

    slot = jax.lax.broadcasted_iota(jnp.int32, (1, NR, LR), 2)  # (1, NR, LR)

    def per_token(tok_carry, tok_in):
        scores, matched = tok_carry
        st, ln, wt, fb, av = tok_in  # each (B, NR)

        idx = st[:, :, None] + slot          # (B, NR, LR)
        valid = slot < ln[:, :, None]        # (B, NR, LR)
        safe_idx = jnp.clip(idx, 0, p_doc.shape[0] - 1)

        docs = jnp.take(p_doc, safe_idx, axis=0)
        tf = jnp.take(p_exact_tf if exact else p_tf, safe_idx, axis=0)
        flen = jnp.take(p_flen, safe_idx, axis=0)

        b_ = fb[:, :, None]
        denom = (1.0 - b_) + b_ * flen / jnp.maximum(av[:, :, None], 1e-9)
        ntf = wt[:, :, None] * tf / jnp.maximum(denom, 1e-9)
        safe_docs = jnp.clip(docs, 0, cap - 1)
        allowed = jnp.take_along_axis(
            doc_mask, safe_docs.reshape(B, -1), axis=1
        ).reshape(docs.shape)
        keep = valid & (tf > 0) & allowed
        ntf = jnp.where(keep, ntf, 0.0)
        # invalid slots scatter into the overflow bucket `cap`
        docs = jnp.where(keep, docs, cap)

        def scatter_one(docs_b, ntf_b):
            acc = jnp.zeros((cap + 1,), jnp.float32)
            return acc.at[docs_b.reshape(-1)].add(ntf_b.reshape(-1))[:cap]

        acc = jax.vmap(scatter_one)(docs, ntf)  # (B, cap) == S_t per doc
        present = acc > 0.0
        df = jnp.sum(present, axis=1).astype(jnp.float32)  # (B,)
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
    """Apply threshold + filter mask + OMC multipliers, then top-k.

    Returns (values f32[B, k], indices int32[B, k]); masked-out docs get
    score 0 and may appear with value<=0 — callers drop non-positive hits.
    """
    s = scores * omc[None, :]
    keep = (matched >= thr_counts[:, None]) & filter_mask & (scores > 0.0)
    s = jnp.where(keep, s, -jnp.inf)
    vals, idx = jax.lax.top_k(s, k)
    return vals, idx
