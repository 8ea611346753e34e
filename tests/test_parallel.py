"""Multi-chip sharded search tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    scores, matched = jax.jit(
        lambda *a: fn(*a)
    )(*args)
    assert scores.shape[0] == 4


def test_sharded_matches_single_device_bm25():
    """The doc-sharded step must produce the same global top-k as an
    unsharded evaluation of the same data."""
    import jax.numpy as jnp

    from oramacore_tpu.parallel import (
        build_mesh,
        make_sharded_search_step,
        make_toy_sharded_index,
    )

    n_d, CAP, DIM, K, LR = 4, 128, 32, 8, 16
    mesh = build_mesh(1, n_d)
    idx = make_toy_sharded_index(
        n_shards=n_d, postings_per_shard=256, rows_per_shard=64,
        cap=CAP, dim=DIM, seed=3,
    )
    step = make_sharded_search_step(mesh, lr=LR, cap=CAP, k=K)
    B, T, NR = 2, 3, 2
    rng = np.random.default_rng(7)
    starts = jnp.asarray(rng.integers(0, 256 - LR, (B, T, NR)).astype(np.int32))
    lens = jnp.asarray(rng.integers(1, LR, (B, T, NR)).astype(np.int32))
    weights = jnp.ones((B, T, NR), jnp.float32)
    avg = jnp.full((B, T, NR), 25.0, jnp.float32)
    q = rng.normal(size=(B, DIM)).astype(np.float32)
    q /= np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-9)
    n_docs = float(CAP * n_d)

    ids, vals = step(
        idx.p_doc, idx.p_tf, idx.p_flen,
        idx.vec_matrix, idx.vec_doc, idx.vec_valid, idx.doc_base,
        starts, lens, weights, avg, jnp.asarray(q),
        jnp.float32(n_docs), jnp.float32(1.0),  # pure BM25
    )
    ids, vals = np.asarray(ids), np.asarray(vals)

    # host reference: replay the same scoring math globally
    p_doc = np.asarray(idx.p_doc)
    p_tf = np.asarray(idx.p_tf)
    p_flen = np.asarray(idx.p_flen)
    K1 = 1.2
    scores = np.zeros((B, CAP * n_d), np.float32)
    for b in range(B):
        for t in range(T):
            acc = np.zeros(CAP * n_d, np.float32)
            for s in range(n_d):
                for r in range(NR):
                    st, ln = int(starts[b, t, r]), int(lens[b, t, r])
                    for p in range(st, min(st + ln, 256)):
                        tf = p_tf[s, p]
                        if tf <= 0:
                            continue
                        denom = 0.25 + 0.75 * p_flen[s, p] / 25.0
                        acc[s * CAP + p_doc[s, p]] += tf / denom
            present = acc > 0
            df = max(present.sum(), 1.0)
            idf = np.log1p((n_docs - df + 0.5) / (df + 0.5))
            scores[b] += np.where(present, idf * (K1 + 1) * acc / (K1 + acc), 0.0)

    for b in range(B):
        expected = np.sort(scores[b])[::-1][:K]
        np.testing.assert_allclose(vals[b], expected, atol=1e-3)


@pytest.mark.parametrize("n", [2, 4])
def test_dryrun_small_meshes(n):
    import __graft_entry__ as ge

    ge.dryrun_multichip(n)
