"""Batched fused hybrid at the 10M tier: BM25F + int8 IVF vector probe +
fusion + top-k in ONE dispatch (ops/hybrid.py hybrid_search_topk_packed_int8).

Extends BASELINE config 4 (10M x 768-d vectors) with a text side: a
synthetic zipf postings slab over the same 10.49M docs, built ON DEVICE
(the axon tunnel makes bulk H2D infeasible — same constraint as
vec10m_bench.py). Measures end-to-end fused hybrid QPS per batch size.

Memory budget (v5e, 16 GiB):
  int8 corpus 10.49M x 768            7.5 GiB
  postings slab 128M x (doc,tf,flen)  1.5 GiB  (p_exact_tf aliases p_tf)
  dense (B, cap) score arrays         ~0.7 GiB per array at B=16
so B<=16 for the BM25-dense fusion tier.

Usage: python benches/hybrid10m_bench.py [--chunks 20] (2 = smoke run)
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CH = 524288
D = 768
KC_TRUE = 1024
SIGMA = 0.037
C = 4096                 # IVF centroids
WINDOW = 2048
LLOYD_ITERS = 4
SAMPLE = 262144
V_TERMS = 65536          # vocabulary size
P_CHUNK = 8 * 1024 * 1024

T0 = time.perf_counter()


def log(msg):
    print(f"[hyb10m +{time.perf_counter() - T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=20)
    ap.add_argument("--postings", type=int, default=128 * 1024 * 1024)
    args = ap.parse_args()
    NCHUNK = args.chunks
    N = NCHUNK * CH
    P = (args.postings // P_CHUNK) * P_CHUNK

    import jax
    import jax.numpy as jnp

    from oramacore_tpu.ops.bm25 import MAX_RANGE_LEN
    from oramacore_tpu.ops.hybrid import hybrid_search_topk_packed_int8
    from oramacore_tpu.ops.vector import quantize_rows_int8

    dev = jax.devices()[0]
    log(f"device {dev}; N={N:,} docs, P={P:,} postings, D={D}")

    root = jax.random.PRNGKey(20260816)
    k_centers, k_chunks, k_query, k_kmeans, k_post = jax.random.split(root, 5)

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

    # ---- IVF centroids (k-means on an on-device sample) ------------------
    ks, kinit = jax.random.split(k_kmeans)
    s_assign = jax.random.randint(ks, (SAMPLE,), 0, KC_TRUE)
    sample = jnp.take(centers, s_assign, axis=0) + SIGMA * jax.random.normal(
        jax.random.fold_in(ks, 1), (SAMPLE, D), jnp.float32
    )
    sample = sample / jnp.linalg.norm(sample, axis=1, keepdims=True)
    cen = sample[jax.random.choice(kinit, SAMPLE, (C,), replace=False)]
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
            onehot = jax.nn.one_hot(a, C, dtype=jnp.bfloat16)
            sums = sums + jnp.dot(
                onehot.T, rows.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            cnt = cnt + jnp.sum(onehot.astype(jnp.float32), axis=0)
            return (sums, cnt), None

        init = (jnp.zeros((C, D), jnp.float32), jnp.zeros((C,), jnp.float32))
        (sums, cnt), _ = jax.lax.scan(blk, init, jnp.arange(SAMPLE // LB))
        new = jnp.where(cnt[:, None] > 0,
                        sums / jnp.maximum(cnt[:, None], 1.0), cen)
        return new / jnp.maximum(
            jnp.linalg.norm(new, axis=1, keepdims=True), 1e-9
        )

    for _ in range(LLOYD_ITERS):
        cen = lloyd(sample, cen)
    cen.block_until_ready()
    log("k-means done")

    # ---- pass 1: cluster assignments (host bookkeeping) ------------------
    @jax.jit
    def assign_chunk(centers, cen, ci):
        rows = gen_chunk(centers, ci)
        return jnp.argmax(
            jnp.dot(rows.astype(jnp.bfloat16), cen.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32),
            axis=1,
        ).astype(jnp.int32)

    assignment = np.empty(N, np.int32)
    for ci in range(NCHUNK):
        assignment[ci * CH:(ci + 1) * CH] = np.asarray(
            assign_chunk(centers, cen, ci)
        )
    perm = np.argsort(assignment, kind="stable")
    counts = np.bincount(assignment, minlength=C)
    starts = np.zeros(C + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.empty(N, np.int64)
    pos[perm] = np.arange(N)
    unit_starts, unit_cluster = [], []
    for c in range(C):
        st = int(starts[c])
        for j in range(0, max(int(counts[c]), 0), WINDOW):
            unit_starts.append(st + j)
            unit_cluster.append(c)
    unit_starts = np.asarray(unit_starts, np.int32)
    log(f"layout: {len(unit_starts)} probe units")

    # ---- pass 2: quantize + pack the vector corpus -----------------------
    @jax.jit
    def quant_chunk(centers, ci):
        return quantize_rows_int8(gen_chunk(centers, ci))

    scatter = jax.jit(lambda b, p, r: b.at[p].set(r), donate_argnums=(0,))
    scatter_s = jax.jit(lambda b, p, v: b.at[p].set(v), donate_argnums=(0,))
    buf = jnp.zeros((N, D), jnp.int8)
    scales = jnp.zeros((N,), jnp.float32)
    for ci in range(NCHUNK):
        qrows, qs = quant_chunk(centers, ci)
        p = jnp.asarray(pos[ci * CH:(ci + 1) * CH])
        buf = scatter(buf, p, qrows)
        scales = scatter_s(scales, p, qs)
    buf.block_until_ready()
    row_doc = jnp.asarray(perm.astype(np.int32))  # packed row -> doc id
    unit_cen = jnp.take(cen, jnp.asarray(unit_cluster), axis=0)
    unit_st = jnp.asarray(unit_starts)
    log("int8 vector corpus resident")

    # ---- synthetic zipf postings slab, generated on device ---------------
    # term t owns the contiguous posting range [tstart[t], tstart[t]+df[t])
    ranks = np.arange(V_TERMS, dtype=np.float64)
    w = 1.0 / (ranks + 50.0)
    df = np.maximum((w / w.sum() * P).astype(np.int64), 1)
    df[0] += P - df.sum()  # exact total
    tstart = np.zeros(V_TERMS + 1, np.int64)
    np.cumsum(df, out=tstart[1:])
    PAD = MAX_RANGE_LEN
    gen_post = jax.jit(
        lambda key, i: (
            jax.random.randint(
                jax.random.fold_in(key, i), (P_CHUNK,), 0, N, jnp.int32
            ),
            (1.0 + (jax.random.uniform(
                jax.random.fold_in(key, 10_000 + i), (P_CHUNK,)
            ) * 3).astype(jnp.int32)).astype(jnp.float32),
            (5.0 + jax.random.uniform(
                jax.random.fold_in(key, 20_000 + i), (P_CHUNK,)
            ) * 45.0).astype(jnp.float32),
        )
    )
    upd = jax.jit(
        lambda b, v, o: jax.lax.dynamic_update_slice(b, v, (o,)),
        static_argnums=(2,), donate_argnums=(0,),
    )
    p_doc = jnp.zeros((P + PAD,), jnp.int32)
    p_tf = jnp.zeros((P + PAD,), jnp.float32)
    p_flen = jnp.ones((P + PAD,), jnp.float32)
    for i in range(P // P_CHUNK):
        d_, t_, f_ = gen_post(k_post, i)
        p_doc = upd(p_doc, d_, i * P_CHUNK)
        p_tf = upd(p_tf, t_, i * P_CHUNK)
        p_flen = upd(p_flen, f_, i * P_CHUNK)
    p_doc.block_until_ready()
    log(f"postings slab resident ({(P + PAD) * 12 / 2**30:.2f} GiB)")

    # ---- query plans: 3 mid-frequency zipf terms per query ---------------
    AVG_FLEN = 27.5

    def build_plans(B, T=3, seed=7):
        # log-uniform ranks in [10, 5000): df from ~90k down to ~350.
        # seeded per call so the ranged and champion modes score the
        # SAME queries (a shared rng drew different term sets per mode)
        rng = np.random.default_rng(seed + B)
        term_ids = np.exp(
            rng.uniform(np.log(10), np.log(5000), size=(B, T))
        ).astype(np.int64)
        NR = int(max(
            (df[t] + MAX_RANGE_LEN - 1) // MAX_RANGE_LEN
            for t in term_ids.ravel()
        ))
        st = np.zeros((B, T, NR), np.int32)
        ln = np.zeros((B, T, NR), np.int32)
        for b in range(B):
            for t in range(T):
                tid = term_ids[b, t]
                s0, n = int(tstart[tid]), int(df[tid])
                ri = 0
                while n > 0:
                    take = min(n, MAX_RANGE_LEN)
                    st[b, t, ri] = s0
                    ln[b, t, ri] = take
                    s0 += take
                    n -= take
                    ri += 1
        idesc = np.stack([st, ln])
        fdesc = np.stack([
            np.ones((B, T, NR), np.float32),
            np.full((B, T, NR), 0.75, np.float32),
            np.full((B, T, NR), AVG_FLEN, np.float32),
        ])
        scalars = np.stack([
            np.full((B,), float(N), np.float32),
            np.zeros((B,), np.float32),          # threshold count
            np.full((B,), 0.3, np.float32),      # vector similarity
        ])
        lr = int(min(
            round(2 ** np.ceil(np.log2(max(ln.max(), 8)))), MAX_RANGE_LEN
        ))
        return idesc, fdesc, scalars, lr

    # queries from the same mixture as the corpus
    ka, kn = jax.random.split(k_query)
    q_assign = jax.random.randint(ka, (64,), 0, KC_TRUE)
    qvecs = jnp.take(centers, q_assign, axis=0) + SIGMA * jax.random.normal(
        kn, (64, D), jnp.float32
    )
    qvecs = qvecs / jnp.linalg.norm(qvecs, axis=1, keepdims=True)

    # ---- champion rows for heavy terms (CHAMPION_MIN analog) -------------
    # The engine precomputes dense normalized-TF rows for terms with
    # >= 32,768 postings at commit; a heavy term then costs one
    # bandwidth-bound row read instead of scattering its postings
    # (~43M postings/s at cap=10M). Build rows for the heaviest terms.
    CHAMPION_MIN = 32768
    # MAX_CHAMPIONS=64 as in the engine: at cap=10.49M each dense row is
    # 42 MiB, so the champion matrix is bounded at 2.7 GiB HBM
    n_champ = min(int(np.searchsorted(-df, -CHAMPION_MIN)), 64)
    champ_terms = list(range(n_champ))
    AVG = 27.5

    t_ch = time.perf_counter()
    # flatten every champion term's ranges; ONE jitted scan builds all
    # rows on device (a host loop would round-trip the multi-GiB rows
    # buffer through the tunnel on every donation)
    ch_starts, ch_lens, ch_cids = [], [], []
    for ci, t_id in enumerate(champ_terms):
        s0, n_p = int(tstart[t_id]), int(df[t_id])
        while n_p > 0:
            take = min(n_p, MAX_RANGE_LEN)
            ch_starts.append(s0)
            ch_lens.append(take)
            ch_cids.append(ci)
            s0 += take
            n_p -= take

    @jax.jit
    def build_champs(p_doc, p_tf, p_flen, starts_a, lens_a, cids_a):
        def body(buf, x):
            start, length, ci = x
            d = jax.lax.dynamic_slice(p_doc, (start,), (MAX_RANGE_LEN,))
            tf = jax.lax.dynamic_slice(p_tf, (start,), (MAX_RANGE_LEN,))
            fl = jax.lax.dynamic_slice(p_flen, (start,), (MAX_RANGE_LEN,))
            valid = (
                jax.lax.broadcasted_iota(
                    jnp.int32, (MAX_RANGE_LEN, 1), 0
                ).squeeze(-1) < length
            ) & (tf > 0)
            ntf = jnp.where(
                valid, tf / jnp.maximum(0.25 + 0.75 * fl / AVG, 1e-9), 0.0
            )
            row = jnp.zeros((N + 1,), jnp.float32).at[
                jnp.where(valid, d, N)
            ].add(ntf)[:N]
            return buf.at[ci].add(row), None

        buf, _ = jax.lax.scan(
            body, jnp.zeros((n_champ, N), jnp.float32),
            (starts_a, lens_a, cids_a),
        )
        return buf

    rows_buf = build_champs(
        p_doc, p_tf, p_flen,
        jnp.asarray(ch_starts, jnp.int32),
        jnp.asarray(ch_lens, jnp.int32),
        jnp.asarray(ch_cids, jnp.int32),
    )
    rows_buf.block_until_ready()
    log(f"built {n_champ} champion rows from {len(ch_starts)} ranges "
        f"({n_champ * N * 4 / 2**30:.2f} GiB) in "
        f"{time.perf_counter() - t_ch:.1f}s")

    def build_plans_champ(B, T=3):
        """Same queries as build_plans(B) (same seed); champion-eligible
        terms route to dense rows, the rest keep posting ranges."""
        idesc, fdesc, scalars, lr = build_plans(B, T)
        st, ln = idesc[0].copy(), idesc[1].copy()
        NC = 1
        ch_idx = np.full((B, T, NC), -1, np.int32)
        ch_w = np.zeros((B, T, NC), np.float32)
        # recover term ids from range starts (first range start = tstart)
        for b in range(B):
            for t in range(T):
                tid = int(np.searchsorted(tstart, st[b, t, 0], "right")) - 1
                if tid < n_champ and ln[b, t, 0] > 0:
                    ch_idx[b, t, 0] = tid
                    ch_w[b, t, 0] = 1.0
                    st[b, t, :] = 0
                    ln[b, t, :] = 0
        lr2 = int(min(
            round(2 ** np.ceil(np.log2(max(ln.max(), 8)))), MAX_RANGE_LEN
        ))
        return np.stack([st, ln]), fdesc, scalars, lr2, ch_idx, ch_w

    dummy_mask = jnp.zeros((1, 1), bool)
    dummy_omc = jnp.ones((1,), jnp.float32)
    results = []
    for B in (8, 16):
        for champs in (False, True):
            if champs:
                idesc, fdesc, scalars, lr, ch_idx, ch_w = (
                    build_plans_champ(B)
                )
                n_routed = int((ch_idx >= 0).sum())
                if n_routed == 0:
                    continue
                log(f"B={B} champions: {n_routed}/{B * 3} tokens routed "
                    "to dense rows")
            else:
                idesc, fdesc, scalars, lr = build_plans(B)
                ch_idx = ch_w = None
            qb = qvecs[:B]

            def run():
                return hybrid_search_topk_packed_int8(
                    p_doc, p_tf, p_tf, p_flen,
                    jnp.asarray(idesc), jnp.asarray(fdesc),
                    jnp.asarray(scalars),
                    buf, scales, row_doc, unit_cen, unit_st, qb,
                    dummy_mask, dummy_omc,
                    rows_buf if champs else None,
                    jnp.asarray(ch_idx) if champs else None,
                    jnp.asarray(ch_w) if champs else None,
                    lr=lr, exact=False, cap=N, k=16,
                    V=256, nprobe=8, window=WINDOW,
                    has_mask=False, has_omc=False,
                    has_rescale=False, rescale_lo=0.0, rescale_hi=1.0,
                    has_champ=champs,
                )

            t_c = time.perf_counter()
            try:
                vals, ids, cnts = run()
                vals.block_until_ready()
            except Exception as e:  # HBM headroom varies with B
                log(f"B={B} champ={champs}: SKIPPED ({type(e).__name__})")
                continue
            log(f"B={B} champ={champs}: compiled+first run in "
                f"{time.perf_counter() - t_c:.1f}s; "
                f"sample counts {np.asarray(cnts)[:4].tolist()}")
            iters = 5
            t = time.perf_counter()
            for _ in range(iters):
                vals, ids, cnts = run()
                vals.block_until_ready()
            dt = (time.perf_counter() - t) / iters
            name = "champion" if champs else "ranged"
            log(f"B={B} {name}: lat={dt * 1000:.1f}ms qps={B / dt:.0f}")
            results.append((B, name, B / dt, dt * 1000, dt * 1000 / B))
            sample_v = np.asarray(vals)[0, :3]
            log(f"  top scores q0: {np.round(sample_v, 4).tolist()}")

    print("\n| batch | path | QPS | batch latency (ms) | ms/query |")
    print("|---|---|---|---|---|")
    for B, name, qps, lat, msq in results:
        print(f"| {B} | {name} | {qps:.0f} | {lat:.1f} | {msq:.2f} |")


if __name__ == "__main__":
    main()
