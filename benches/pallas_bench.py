"""Pallas kernel validation + timing on the real TPU.

Compares three ways to produce (docs, ntf) windows from the postings
slab — the input of BM25's dense aggregation stage:
  1. xla-2stage: vmapped dynamic_slice gathers, then elementwise ntf
  2. pallas-gather + XLA ntf (ops/pallas_gather.py)
  3. pallas-fused: DMA + in-VMEM ntf (ops/pallas_score.py)

Usage: python benches/pallas_bench.py [--windows 2048] [--w 1024]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=2048)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--postings", type=int, default=64 * 1024 * 1024)
    args = ap.parse_args()
    NS, W, P = args.windows, args.w, args.postings

    import jax
    import jax.numpy as jnp

    from oramacore_tpu.ops import pallas_gather, pallas_score

    print(f"device={jax.devices()[0]} NS={NS} W={W} P={P:,}",
          file=sys.stderr)
    rng = np.random.default_rng(0)
    p_doc = jnp.asarray(rng.integers(0, 1 << 20, P + W).astype(np.int32))
    p_tf = jnp.asarray(rng.integers(0, 4, P + W).astype(np.float32))
    p_flen = jnp.asarray(rng.uniform(1, 50, P + W).astype(np.float32))
    starts = jnp.asarray(
        (rng.integers(0, P // 1024, NS) * 1024).astype(np.int32)
    )
    b = rng.uniform(0.3, 0.9, NS)
    avg = rng.uniform(5, 40, NS)
    params = jnp.asarray(np.stack([
        rng.uniform(0.5, 2.0, NS), 1.0 - b, b / avg, np.zeros(NS),
    ], axis=1).astype(np.float32))

    @jax.jit
    def xla_2stage(p_doc, p_tf, p_flen, starts, params):
        docs = jax.vmap(
            lambda s: jax.lax.dynamic_slice(p_doc, (s,), (W,))
        )(starts)
        tf = jax.vmap(
            lambda s: jax.lax.dynamic_slice(p_tf, (s,), (W,))
        )(starts)
        fl = jax.vmap(
            lambda s: jax.lax.dynamic_slice(p_flen, (s,), (W,))
        )(starts)
        ntf = params[:, 0:1] * tf / jnp.maximum(
            params[:, 1:2] + params[:, 2:3] * fl, 1e-9
        )
        return docs, ntf

    def timed(name, fn):
        out = fn()
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        iters = 10
        t = time.perf_counter()
        for _ in range(iters):
            out = fn()
            jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        dt = (time.perf_counter() - t) / iters
        mb = NS * W * 4 * 3 / 2**20  # 3 input streams
        print(f"{name:14s} {dt * 1000:8.2f} ms  "
              f"({mb / dt / 1024:.1f} GiB/s input-side)")
        return out

    d1, n1 = timed("xla-2stage", lambda: xla_2stage(
        p_doc, p_tf, p_flen, starts, params))
    timed("pallas-gather", lambda: pallas_gather.gather_windows(
        p_doc, starts, w=W, rows_per_program=8))
    d3, n3 = timed("pallas-fused", lambda: pallas_score.score_windows(
        p_doc, p_tf, p_flen, starts, params, w=W, rows_per_program=8))

    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d3))
    np.testing.assert_allclose(
        np.asarray(n1), np.asarray(n3), rtol=1e-5, atol=1e-6
    )
    print("PARITY OK (fused == 2-stage)")


if __name__ == "__main__":
    main()
