"""BASELINE config 4: clustered ANN at 10M x 768-d, recall@10 vs exact.

Design constraints this bench embodies (TPU v5e, 16 GB HBM, axon tunnel):
- f32 corpus = 30 GB, bf16 = 15 GB -> neither fits. Per-row symmetric
  int8 (ops/vector.py quantize_rows_int8) = 7.7 GB, fits with headroom.
- The tunnel makes bulk H2D/D2H infeasible (~minutes for 100s of MB), so
  the corpus NEVER exists off-device: chunks are generated on-device from
  deterministic jax.random keys, assigned/quantized/scattered on-device,
  and ground truth is computed by REGENERATING chunks (f32 exact scan).
- Batched throughput = full int8 scan (MXU-dense, reads the 7.7 GB
  corpus once per batch). IVF probing reads B * nprobe * window * D
  bytes, so it only wins at small batches; the bench measures both and
  reports the crossover honestly.

Usage: python benches/vec10m_bench.py [--chunks 20] [--queries 256]
       (20 chunks x 524288 rows = 10.49M; --chunks 2 for a smoke run)
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CH = 524288
D = 768
KC_TRUE = 1024          # true mixture components in the synthetic data
SIGMA = 0.037           # intra-cluster dot ~ 0.7 (clustered, not trivial)
C = 4096                # IVF centroids
WINDOW = 2048           # rows per probe unit (cluster sub-block)
LLOYD_ITERS = 8
SAMPLE = 262144
K = 10


def log(msg):
    print(f"[vec10m +{time.perf_counter() - T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.perf_counter()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=20)
    ap.add_argument("--queries", type=int, default=256)
    args = ap.parse_args()
    NCHUNK = args.chunks
    N = NCHUNK * CH
    Q = args.queries

    import jax
    import jax.numpy as jnp

    from oramacore_tpu.ops.vector import (
        int8_scan_topk, ivf_int8_topk, quantize_rows_int8, topk_2level,
    )

    dev = jax.devices()[0]
    log(f"device {dev}; N={N:,} D={D} -> int8 corpus "
        f"{N * D / 2**30:.2f} GiB")

    root = jax.random.PRNGKey(20260816)
    k_centers, k_chunks, k_query, k_kmeans = jax.random.split(root, 4)

    # true mixture centers (device-resident, regenerated nowhere else).
    # NOTE: every jitted fn below takes its device arrays as ARGUMENTS —
    # closing over a large jax.Array embeds it as an HLO constant, which
    # stalls compilation for minutes (measured in this environment).
    centers = jax.random.normal(k_centers, (KC_TRUE, D), jnp.float32)
    centers = centers / jnp.linalg.norm(centers, axis=1, keepdims=True)

    @jax.jit
    def gen_chunk(centers, ci):
        kc = jax.random.fold_in(k_chunks, ci)
        ka, kn = jax.random.split(kc)
        assign = jax.random.randint(ka, (CH,), 0, KC_TRUE)
        rows = jnp.take(centers, assign, axis=0) + SIGMA * jax.random.normal(
            kn, (CH, D), jnp.float32
        )
        return rows / jnp.linalg.norm(rows, axis=1, keepdims=True)

    # ---- queries: same mixture ------------------------------------------
    ka, kn = jax.random.split(k_query)
    q_assign = jax.random.randint(ka, (Q,), 0, KC_TRUE)
    queries = jnp.take(centers, q_assign, axis=0) + SIGMA * jax.random.normal(
        kn, (Q, D), jnp.float32
    )
    queries = queries / jnp.linalg.norm(queries, axis=1, keepdims=True)
    queries.block_until_ready()
    log("queries ready")

    # ---- IVF centroids: k-means on an on-device sample ------------------
    ks, kinit = jax.random.split(k_kmeans)
    s_assign = jax.random.randint(ks, (SAMPLE,), 0, KC_TRUE)
    sample = jnp.take(centers, s_assign, axis=0) + SIGMA * jax.random.normal(
        jax.random.fold_in(ks, 1), (SAMPLE, D), jnp.float32
    )
    sample = sample / jnp.linalg.norm(sample, axis=1, keepdims=True)
    cen = sample[jax.random.choice(kinit, SAMPLE, (C,), replace=False)]

    # Lloyd accumulation via chunked one-hot matmuls on the MXU —
    # segment_sum lowers to scatter-add, which is pathologically slow on
    # TPU at this size (measured r1: scatter ~3x+ slower than one-hot)
    LB = 16384

    @jax.jit
    def lloyd(sample, cen):
        def blk(carry, i):
            sums, cnt = carry
            rows = jax.lax.dynamic_slice(sample, (i * LB, 0), (LB, D))
            a = jnp.argmax(
                jnp.dot(rows.astype(jnp.bfloat16),
                        cen.astype(jnp.bfloat16).T,
                        preferred_element_type=jnp.float32),
                axis=1,
            )
            onehot = jax.nn.one_hot(a, C, dtype=jnp.bfloat16)  # (LB, C)
            sums = sums + jnp.dot(
                onehot.T, rows.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            cnt = cnt + jnp.sum(onehot.astype(jnp.float32), axis=0)
            return (sums, cnt), None

        init = (jnp.zeros((C, D), jnp.float32), jnp.zeros((C,), jnp.float32))
        (sums, cnt), _ = jax.lax.scan(blk, init, jnp.arange(SAMPLE // LB))
        new = jnp.where(
            cnt[:, None] > 0,
            sums / jnp.maximum(cnt[:, None], 1.0),
            cen,
        )
        return new / jnp.maximum(
            jnp.linalg.norm(new, axis=1, keepdims=True), 1e-9
        )

    for _ in range(LLOYD_ITERS):
        cen = lloyd(sample, cen)
    cen.block_until_ready()
    log(f"k-means done ({C} centroids, {LLOYD_ITERS} iters on "
        f"{SAMPLE:,} sample)")

    # ---- pass 1: assignments (host) + f32 exact ground truth -------------
    @jax.jit
    def assign_and_gt(centers, cen, queries, ci):
        rows = gen_chunk(centers, ci)
        a = jnp.argmax(
            jnp.dot(rows.astype(jnp.bfloat16), cen.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32),
            axis=1,
        ).astype(jnp.int32)
        s = jnp.dot(queries, rows.T, preferred_element_type=jnp.float32)
        gv, gi = topk_2level(s, K)
        return a, gv, gi

    assignment = np.empty(N, np.int32)
    gt_v = np.full((Q, K * NCHUNK), -1e30, np.float32)
    gt_i = np.full((Q, K * NCHUNK), -1, np.int64)
    for ci in range(NCHUNK):
        a, gv, gi = assign_and_gt(centers, cen, queries, ci)
        assignment[ci * CH:(ci + 1) * CH] = np.asarray(a)
        gt_v[:, ci * K:(ci + 1) * K] = np.asarray(gv)
        gt_i[:, ci * K:(ci + 1) * K] = np.asarray(gi, np.int64) + ci * CH
        if ci % 5 == 0:
            log(f"pass1 chunk {ci + 1}/{NCHUNK}")
    order = np.argsort(-gt_v, axis=1)[:, :K]
    gt_ids = np.take_along_axis(gt_i, order, axis=1)  # (Q, 10) original ids
    log("pass1 done: assignments + f32 exact ground truth")

    # ---- packed layout (host bookkeeping only: 10M ints) -----------------
    perm = np.argsort(assignment, kind="stable")      # packed -> original
    counts = np.bincount(assignment, minlength=C)
    starts = np.zeros(C + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.empty(N, np.int64)
    pos[perm] = np.arange(N)                          # original -> packed
    # probe units: sub-blocks of WINDOW rows sharing the cluster centroid
    unit_starts, unit_cluster = [], []
    for c in range(C):
        n = int(counts[c])
        st = int(starts[c])
        for j in range(0, max(n, 0), WINDOW):
            unit_starts.append(st + j)
            unit_cluster.append(c)
    unit_starts = np.asarray(unit_starts, np.int32)
    unit_cluster = np.asarray(unit_cluster, np.int64)
    U = len(unit_starts)
    log(f"layout: {U} probe units, max cluster {counts.max()}, "
        f"mean {counts.mean():.0f}")

    # ---- pass 2: quantize + scatter into the packed device buffer --------
    @jax.jit
    def quant_chunk(centers, ci):
        return quantize_rows_int8(gen_chunk(centers, ci))

    scatter = jax.jit(
        lambda buf, p, rows: buf.at[p].set(rows), donate_argnums=(0,)
    )
    scatter_s = jax.jit(
        lambda buf, p, v: buf.at[p].set(v), donate_argnums=(0,)
    )
    buf = jnp.zeros((N, D), jnp.int8)
    scales = jnp.zeros((N,), jnp.float32)
    for ci in range(NCHUNK):
        qrows, qs = quant_chunk(centers, ci)
        p = jnp.asarray(pos[ci * CH:(ci + 1) * CH])
        buf = scatter(buf, p, qrows)
        scales = scatter_s(scales, p, qs)
        if ci % 5 == 0:
            log(f"pass2 chunk {ci + 1}/{NCHUNK}")
    buf.block_until_ready()
    log("pass2 done: packed int8 corpus resident in HBM")

    unit_cen = jnp.take(cen, jnp.asarray(unit_cluster), axis=0)
    unit_st = jnp.asarray(unit_starts)

    def recall_of(ids_packed):
        ids = perm[np.maximum(np.asarray(ids_packed, np.int64), 0)]
        hits = 0
        for qi in range(Q):
            got = []
            seen = set()
            for r, pk in zip(ids[qi], np.asarray(ids_packed[qi])):
                if pk < 0 or r in seen:
                    continue
                seen.add(r)
                got.append(r)
                if len(got) == K:
                    break
            hits += len(set(got) & set(gt_ids[qi].tolist()))
        return hits / (Q * K)

    results = []

    # ---- exact int8 full scan --------------------------------------------
    CHUNK_SCAN = 262144
    fv, fi = int8_scan_topk(queries, buf, scales, k=K, chunk=CHUNK_SCAN)
    fv.block_until_ready()
    iters = 5
    t = time.perf_counter()
    for _ in range(iters):
        fv, fi = int8_scan_topk(queries, buf, scales, k=K, chunk=CHUNK_SCAN)
        fv.block_until_ready()
    dt = (time.perf_counter() - t) / iters
    r = recall_of(fi)
    log(f"int8 FULL SCAN: recall@10={r:.4f} batch={Q} lat={dt * 1000:.1f}ms "
        f"qps={Q / dt:.0f}")
    results.append(("int8-full-scan", "-", r, Q / dt, dt * 1000 / Q))

    # ---- IVF sweep ---------------------------------------------------------
    for nprobe in (4, 8, 16, 32, 64):
        iv, ii = ivf_int8_topk(
            queries, buf, scales, unit_cen, unit_st,
            k=4 * K, nprobe=nprobe, window=WINDOW,
        )
        iv.block_until_ready()
        t = time.perf_counter()
        for _ in range(iters):
            iv, ii = ivf_int8_topk(
                queries, buf, scales, unit_cen, unit_st,
                k=4 * K, nprobe=nprobe, window=WINDOW,
            )
            iv.block_until_ready()
        dt = (time.perf_counter() - t) / iters
        r = recall_of(ii)
        log(f"IVF nprobe={nprobe}: recall@10={r:.4f} batch={Q} "
            f"lat={dt * 1000:.1f}ms qps={Q / dt:.0f}")
        results.append((f"ivf-int8", nprobe, r, Q / dt, dt * 1000 / Q))

    # ---- small-batch latency (B=8) ----------------------------------------
    q8 = queries[:8]
    for nprobe in (16, 32):
        iv, ii = ivf_int8_topk(
            q8, buf, scales, unit_cen, unit_st,
            k=4 * K, nprobe=nprobe, window=WINDOW,
        )
        iv.block_until_ready()
        t = time.perf_counter()
        for _ in range(iters):
            iv, ii = ivf_int8_topk(
                q8, buf, scales, unit_cen, unit_st,
                k=4 * K, nprobe=nprobe, window=WINDOW,
            )
            iv.block_until_ready()
        dt = (time.perf_counter() - t) / iters
        log(f"IVF B=8 nprobe={nprobe}: lat={dt * 1000:.1f}ms "
            f"qps={8 / dt:.0f}")
        results.append((f"ivf-int8-b8", nprobe, None, 8 / dt, dt * 1000 / 8))

    print("\n| path | nprobe | recall@10 | QPS | ms/query |")
    print("|---|---|---|---|---|")
    for name, npb, r, qps, ms in results:
        rs = f"{r:.4f}" if r is not None else "-"
        print(f"| {name} | {npb} | {rs} | {qps:.0f} | {ms:.3f} |")


if __name__ == "__main__":
    main()
