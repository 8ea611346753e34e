"""Batched fused hybrid + fulltext at the 10M tier: dense (ranged) vs
PRUNED two-phase kernels (ops/pruned.py).

Extends BASELINE config 4 (10M x 768-d vectors) with a text side: a
synthetic zipf postings slab over the same 10.49M docs, built ON DEVICE
(the axon tunnel makes bulk H2D infeasible — same constraint as
vec10m_bench.py), then IMPACT-ORDERED per term with one global device
sort (the engine's _pack_segment layout) so the pruned path's phase-1
prefixes are meaningful.

Modes (--mode):
  ranged    dense fused hybrid (round-2 kernel; the 43-46 QPS baseline)
  champion  dense + champion rows (round-2 negative result, kept for
            the record)
  pruned    pruned hybrid (candidates + exact rescore) + top-16 overlap
            vs the ranged kernel on identical queries
  ft        dense fulltext vs pruned fulltext + overlap
  counts    the opt-in exact counting dispatch (pruned_exact_counts):
            one global (query, doc, token) sort over the batch's
            postings -- measures the per-search cost of exactCount
  filtered  filtered pruned scoring (round-3 session 4): a ~50%% random
            mask through masked nomination+rescore (exact filtered-df
            IDF), and a 1k-doc small filter through the cand-given path
            (the filtered set IS the candidate list -- exact results)
  facets    pruned-tier facet counting (pruned_facet_counts): 64-bucket
            histograms off the rescore worklist, one-hot matmuls, no
            dense kernel / bitmap / sort
  all       everything

Memory budget (v5e, 16 GiB): int8 corpus 7.5 GiB + slab 1.5 GiB; the
dense modes add (B, cap) f32 score arrays (~0.7 GiB per array at B=16 —
their B ceiling); the pruned modes add only (B, C) candidate state so
they run at B=64-256.

Usage: python benches/hybrid10m_bench.py [--chunks 20] [--mode all]
(--chunks 2 = smoke run)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CH = 524288
D = 768
KC_TRUE = 1024
SIGMA = 0.037
C_IVF = 4096             # IVF centroids
WINDOW = 2048
LLOYD_ITERS = 4
SAMPLE = 262144
V_TERMS = 65536          # vocabulary size
P_CHUNK = 8 * 1024 * 1024

# pruned-path knobs. The synthetic corpus is iid-uniform tf in {1,2,3} —
# the known WORST case for impact-prefix nomination (real text tf is
# zipf; a true top-k doc here needs mid contributions on ALL terms, so
# nomination needs DEEP prefixes) — budgets run wide: LP=64k = the top
# ~18% of a 373k-df term, C=2k candidates rescored exactly. The engine's
# default block depth for real corpora is PREFIX_LEN=8192.
LP = 65536               # impact-prefix length per token
C_FT = 2048              # fulltext candidate budget
C_HY = 2048              # hybrid fulltext candidates
V_HY = 256               # hybrid vector candidates
LCH = 32768              # rescore streaming chunk

T0 = time.perf_counter()


def log(msg):
    print(f"[hyb10m +{time.perf_counter() - T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    global LP
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=20)
    ap.add_argument("--postings", type=int, default=128 * 1024 * 1024)
    ap.add_argument("--lp", type=int, default=LP,
                    help="impact-prefix depth (side blocks built for "
                         "df > lp; engine default PREFIX_LEN is 8192)")
    ap.add_argument("--tf", choices=["uniform", "zipf"],
                    default="uniform",
                    help="posting tf distribution: 'uniform' iid{1,2,3}"
                         " (the impact-prefix WORST case: no impact "
                         "signal) or 'zipf' P(tf>=k)=k^-1.5 capped 64 "
                         "(real-text-like concentration)")
    ap.add_argument("--mode", default="all",
                    help="comma-separated list of modes, or 'all'")
    ap.add_argument("--kb", type=int, default=1024,
                    help="bsb/bshb bucket-offset resolution (engine "
                         "PRUNED_BS_BUCKETS analog; higher = fewer "
                         "rescore rounds, bigger tables)")
    args = ap.parse_args()
    NCHUNK = args.chunks
    N = NCHUNK * CH
    P = (args.postings // P_CHUNK) * P_CHUNK
    LP = args.lp
    KNOWN = ["ranged", "champion", "pruned", "ft", "counts", "filtered",
             "facets", "bs", "bsh", "bsb", "bshb", "groups", "micro",
             "split"]
    modes = (
        ["ranged", "champion", "pruned", "ft", "counts", "filtered",
         "facets", "bs", "bsh", "groups"]
        if args.mode == "all" else args.mode.split(",")
    )
    for m in modes:
        if m not in KNOWN:
            ap.error(f"unknown mode {m!r} (known: {KNOWN})")

    import jax

    if os.environ.get("ORAMACORE_BENCH_CPU") == "1":  # smoke runs
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from oramacore_tpu.ops.bm25 import MAX_RANGE_LEN, bm25_search_topk_packed
    from oramacore_tpu.ops.hybrid import hybrid_search_topk_packed_int8
    from oramacore_tpu.ops.pruned import (
        pruned_fulltext_topk,
        pruned_hybrid_topk_int8,
    )
    from oramacore_tpu.ops.vector import quantize_rows_int8

    dev = jax.devices()[0]
    log(f"device {dev}; N={N:,} docs, P={P:,} postings, D={D}, "
        f"tf={args.tf}, lp={LP}")

    root = jax.random.PRNGKey(20260816)
    k_centers, k_chunks, k_query, k_kmeans, k_post = jax.random.split(root, 5)

    # ---- synthetic zipf postings slab, DOC-SORTED per term by
    # construction (engine v3 _pack_segment layout): term t's doc ids
    # are a stratified uniform sample doc_j = floor((j + u_j) * N / df)
    # — sorted with zero sort work. tf/flen are iid as before. ---------
    ranks = np.arange(V_TERMS, dtype=np.float64)
    w = 1.0 / (ranks + 50.0)
    df = np.maximum((w / w.sum() * P).astype(np.int64), 1)
    df[0] += P - df.sum()  # exact total
    tstart = np.zeros(V_TERMS + 1, np.int64)
    np.cumsum(df, out=tstart[1:])
    PAD = MAX_RANGE_LEN
    tstart_dev = jnp.asarray(tstart.astype(np.int32))
    df_dev = jnp.asarray(df.astype(np.int32))

    def _gen_chunk_sorted(key, i):
        idx = jnp.arange(P_CHUNK, dtype=jnp.int32) + i * P_CHUNK
        term = (
            jnp.searchsorted(tstart_dev, idx, side="right").astype(jnp.int32)
            - 1
        )
        local = idx - jnp.take(tstart_dev, term)
        dfv = jnp.take(df_dev, term).astype(jnp.float32)
        u = jax.random.uniform(jax.random.fold_in(key, i), (P_CHUNK,))
        doc = jnp.minimum(
            ((local.astype(jnp.float32) + u) * (float(N) / dfv)).astype(
                jnp.int32
            ),
            N - 1,
        )
        u_tf = jax.random.uniform(
            jax.random.fold_in(key, 10_000 + i), (P_CHUNK,),
            minval=1e-6,
        )
        if args.tf == "zipf":
            # discrete power law P(tf >= k) = k^-1.5, capped at 64 —
            # real-text-like tf concentration (impact prefixes carry
            # signal; contrast with the uniform worst case)
            tf = jnp.minimum(
                jnp.floor(u_tf ** (-1.0 / 1.5)), 64.0
            ).astype(jnp.float32)
        else:
            tf = (1.0 + (u_tf * 3).astype(jnp.int32)).astype(
                jnp.float32
            )
        fl = (5.0 + jax.random.uniform(
            jax.random.fold_in(key, 20_000 + i), (P_CHUNK,)
        ) * 45.0).astype(jnp.float32)
        return doc, tf, fl

    gen_post = jax.jit(_gen_chunk_sorted)

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
    log(f"doc-sorted postings slab resident "
        f"({(P + PAD) * 12 / 2**30:.2f} GiB)")

    # ---- impact-prefix side blocks for heavy terms (engine
    # _build_prefix_blocks analog): top-LP postings by tf/flen per term
    # with df > LP, appended after the slab. Selection via top_k over a
    # padded pow2 window per term, scanned per window bucket. ----------
    heavy = [int(t) for t in np.nonzero(df > LP)[0]]
    heavy.sort(key=lambda t: int(tstart[t]))
    pre_ranges = {}
    pre_off = P + PAD
    n_heavy = len(heavy)
    if n_heavy:
        pre_buf_d = jnp.zeros((n_heavy * LP,), jnp.int32)
        pre_buf_t = jnp.zeros((n_heavy * LP,), jnp.float32)
        pre_buf_f = jnp.ones((n_heavy * LP,), jnp.float32)
        buckets = {}
        for hi, t in enumerate(heavy):
            L = LP * 2
            while L < df[t]:
                L *= 2
            buckets.setdefault(L, []).append((hi, t))
            pre_ranges[t] = (pre_off + hi * LP, LP)
        t_s = time.perf_counter()
        for L, pairs in sorted(buckets.items()):

            @jax.jit
            def build_blocks(doc, tf, fl, bd, bt, bf, st_a, ln_a, out_a,
                             L=L):
                iot = jax.lax.broadcasted_iota(
                    jnp.int32, (L, 1), 0
                ).squeeze(-1)

                def row(carry, x):
                    bd, bt, bf = carry
                    st, ln, out = x
                    d = jax.lax.dynamic_slice(doc, (st,), (L,))
                    t = jax.lax.dynamic_slice(tf, (st,), (L,))
                    f = jax.lax.dynamic_slice(fl, (st,), (L,))
                    imp = jnp.where(
                        iot < ln, t / jnp.maximum(f, 1e-9), -1.0
                    )
                    _, sel = jax.lax.top_k(imp, LP)
                    bd = jax.lax.dynamic_update_slice(
                        bd, jnp.take(d, sel), (out,)
                    )
                    bt = jax.lax.dynamic_update_slice(
                        bt, jnp.take(t, sel), (out,)
                    )
                    bf = jax.lax.dynamic_update_slice(
                        bf, jnp.take(f, sel), (out,)
                    )
                    return (bd, bt, bf), None

                (bd, bt, bf), _ = jax.lax.scan(
                    row, (bd, bt, bf), (st_a, ln_a, out_a)
                )
                return bd, bt, bf

            st_a = jnp.asarray(
                [int(tstart[t]) for _hi, t in pairs], jnp.int32
            )
            ln_a = jnp.asarray([int(df[t]) for _hi, t in pairs], jnp.int32)
            out_a = jnp.asarray([hi * LP for hi, _t in pairs], jnp.int32)
            pre_buf_d, pre_buf_t, pre_buf_f = build_blocks(
                p_doc, p_tf, p_flen, pre_buf_d, pre_buf_t, pre_buf_f,
                st_a, ln_a, out_a,
            )
        pre_buf_d.block_until_ready()
        cat = jax.jit(
            lambda a, b: jnp.concatenate([a, b]), donate_argnums=(0,)
        )
        p_doc = cat(p_doc, pre_buf_d)
        p_tf = cat(p_tf, pre_buf_t)
        p_flen = cat(p_flen, pre_buf_f)
        p_doc.block_until_ready()
        log(f"{n_heavy} impact-prefix blocks built in "
            f"{time.perf_counter() - t_s:.1f}s "
            f"({n_heavy * LP * 12 / 2**20:.0f} MiB)")

    needs_vectors = bool(
        set(modes) - {"ft", "counts", "facets", "bs", "bsb", "groups",
                      "micro", "split"}
    )
    buf = scales = row_doc = doc2row = unit_cen = unit_st = None
    if needs_vectors:
        # ---- vector corpus -------------------------------------------------
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

        # IVF centroids (k-means on an on-device sample)
        ks, kinit = jax.random.split(k_kmeans)
        s_assign = jax.random.randint(ks, (SAMPLE,), 0, KC_TRUE)
        sample = jnp.take(centers, s_assign, axis=0) + SIGMA * jax.random.normal(
            jax.random.fold_in(ks, 1), (SAMPLE, D), jnp.float32
        )
        sample = sample / jnp.linalg.norm(sample, axis=1, keepdims=True)
        cen = sample[jax.random.choice(kinit, SAMPLE, (C_IVF,), replace=False)]
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
                onehot = jax.nn.one_hot(a, C_IVF, dtype=jnp.bfloat16)
                sums = sums + jnp.dot(
                    onehot.T, rows.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                cnt = cnt + jnp.sum(onehot.astype(jnp.float32), axis=0)
                return (sums, cnt), None

            init = (jnp.zeros((C_IVF, D), jnp.float32),
                    jnp.zeros((C_IVF,), jnp.float32))
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
        counts = np.bincount(assignment, minlength=C_IVF)
        starts = np.zeros(C_IVF + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        pos = np.empty(N, np.int64)
        pos[perm] = np.arange(N)
        unit_starts, unit_cluster = [], []
        for c in range(C_IVF):
            st = int(starts[c])
            for j in range(0, max(int(counts[c]), 0), WINDOW):
                unit_starts.append(st + j)
                unit_cluster.append(c)
        unit_starts = np.asarray(unit_starts, np.int32)
        log(f"layout: {len(unit_starts)} probe units")

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
        doc2row = jnp.asarray(
            np.concatenate([pos.astype(np.int32), [-1]])
        )  # doc id -> packed row (sentinel for cap)
        unit_cen = jnp.take(cen, jnp.asarray(unit_cluster), axis=0)
        unit_st = jnp.asarray(unit_starts)
        log("int8 vector corpus resident")

    # ---- query plans: 3 mid-frequency zipf terms per query ---------------
    AVG_FLEN = 27.5

    def term_sets(B, T=3, seed=7):
        # log-uniform ranks in [10, 5000): df from ~300k down to ~3.5k.
        rng = np.random.default_rng(seed + B)
        return np.exp(
            rng.uniform(np.log(10), np.log(5000), size=(B, T))
        ).astype(np.int64)

    def build_plans(B, T=3, seed=7, term_ids=None):
        if term_ids is None:
            term_ids = term_sets(B, T, seed)
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
        return idesc, fdesc, scalars, lr, term_ids

    def build_pruned_plans(B, T=3, seed=7, term_ids=None):
        """pre (impact-block prefixes) + worklist + host idf for the
        pruned kernels (ops/pruned.py v3 API)."""
        idesc, fdesc, scalars, lr, term_ids = build_plans(
            B, T, seed, term_ids
        )
        pre_st = np.zeros((B, T, 1), np.int32)
        pre_ln = np.zeros((B, T, 1), np.int32)
        idf = np.zeros((B, T), np.float32)
        wl = []
        for b in range(B):
            for t in range(T):
                tid = int(term_ids[b, t])
                if tid in pre_ranges:
                    ps, pl = pre_ranges[tid]
                else:
                    ps, pl = int(tstart[tid]), int(df[tid])
                pre_st[b, t, 0] = ps
                pre_ln[b, t, 0] = pl
                d = max(float(df[tid]), 1.0)
                idf[b, t] = np.log1p((N - d + 0.5) / (d + 0.5))
                s0, n0 = int(tstart[tid]), int(df[tid])
                off = 0
                while off < n0:
                    take = min(n0 - off, LCH)
                    wl.append((b, t, s0 + off, take))
                    off += take
        WCH = 128
        W = max(WCH, ((len(wl) + WCH - 1) // WCH) * WCH)
        wl_i = np.zeros((4, W), np.int32)
        wl_f = np.zeros((3, W), np.float32)
        wl_f[0, :len(wl)] = 1.0
        wl_f[1, :] = 0.75
        wl_f[2, :] = AVG_FLEN
        for j, (bb, tt, s0, l0) in enumerate(wl):
            wl_i[:, j] = (bb, tt, s0, l0)
        pre_idesc = np.stack([pre_st, pre_ln])
        pre_fdesc = np.stack([
            np.ones((B, T, 1), np.float32),
            np.full((B, T, 1), 0.75, np.float32),
            np.full((B, T, 1), AVG_FLEN, np.float32),
        ])
        return (idesc, fdesc, scalars, lr, pre_idesc, pre_fdesc, idf,
                wl_i, wl_f, term_ids)

    # queries from the same mixture as the corpus
    def build_bs_plans(B, T=3, seed=7, term_ids=None):
        """v4 plans: UNSPLIT doc-sorted ranges + impact prefixes."""
        _i, _f, scalars, _lr, term_ids = build_plans(
            B, T, seed, term_ids
        )
        pre_st = np.zeros((B, T, 1), np.int32)
        pre_ln = np.zeros((B, T, 1), np.int32)
        rng_st = np.zeros((B, T, 1), np.int32)
        rng_ln = np.zeros((B, T, 1), np.int32)
        idf = np.zeros((B, T), np.float32)
        for b in range(B):
            for t in range(T):
                tid = int(term_ids[b, t])
                if tid in pre_ranges:
                    ps, pl = pre_ranges[tid]
                else:
                    ps, pl = int(tstart[tid]), int(df[tid])
                pre_st[b, t, 0] = ps
                pre_ln[b, t, 0] = pl
                rng_st[b, t, 0] = int(tstart[tid])
                rng_ln[b, t, 0] = int(df[tid])
                d = max(float(df[tid]), 1.0)
                idf[b, t] = np.log1p((N - d + 0.5) / (d + 0.5))
        rng_i = np.stack([rng_st, rng_ln])
        rng_f = np.stack([
            np.ones((B, T, 1), np.float32),
            np.full((B, T, 1), 0.75, np.float32),
            np.full((B, T, 1), AVG_FLEN, np.float32),
        ])
        pre_f = np.stack([
            np.ones((B, T, 1), np.float32),
            np.full((B, T, 1), 0.75, np.float32),
            np.full((B, T, 1), AVG_FLEN, np.float32),
        ])
        bs = 4
        while (1 << bs) < int(rng_ln.max()) + 1:
            bs += 4
        pre_idesc = np.stack([pre_st, pre_ln])
        return (pre_idesc, pre_f, rng_i, rng_f, idf,
                scalars, bs, term_ids)

    qvecs = None
    if needs_vectors:
        ka, kn = jax.random.split(k_query)
        NQ = 512
        q_assign = jax.random.randint(ka, (NQ,), 0, KC_TRUE)
        qvecs = jnp.take(centers, q_assign, axis=0) + SIGMA * (
            jax.random.normal(kn, (NQ, D), jnp.float32)
        )
        qvecs = qvecs / jnp.linalg.norm(qvecs, axis=1, keepdims=True)

    dummy_mask = jnp.zeros((1, 1), bool)
    dummy_omc = jnp.ones((1,), jnp.float32)
    results = []

    def timeit(fn, variants, iters=5):
        """fn(variant) -> arrays; cycles distinct inputs per iteration
        (the axon terminal memoizes identical input buffers)."""
        out = fn(variants[0])
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        t = time.perf_counter()
        for i in range(iters):
            out = fn(variants[i % len(variants)])
            jax.tree_util.tree_leaves(out)[0].block_until_ready()
        return (time.perf_counter() - t) / iters

    def overlap(ids_a, ids_b, k):
        return float(np.mean([
            len(set(ids_a[b, :k].tolist()) & set(ids_b[b, :k].tolist())) / k
            for b in range(ids_a.shape[0])
        ]))

    # ---------------- dense hybrid (ranged / champion) ----------------
    ranged_ids = {}   # B -> ids (ground truth for pruned overlap)
    if "ranged" in modes or "pruned" in modes:
        for B in (8, 16):
            variants = []
            for s in range(3):
                idesc, fdesc, scalars, lr, tids = build_plans(B, seed=7 + s)
                variants.append((
                    jnp.asarray(idesc), jnp.asarray(fdesc),
                    jnp.asarray(scalars), lr, qvecs[:B],
                ))

            def run(v):
                idesc, fdesc, scalars, lr, qb = v
                return hybrid_search_topk_packed_int8(
                    p_doc, p_tf, p_tf, p_flen,
                    idesc, fdesc, scalars,
                    buf, scales, row_doc, unit_cen, unit_st, qb,
                    dummy_mask, dummy_omc,
                    lr=lr, exact=False, cap=N, k=16,
                    V=V_HY, nprobe=8, window=WINDOW,
                    has_mask=False, has_omc=False,
                    has_rescale=False, rescale_lo=0.0, rescale_hi=1.0,
                )

            try:
                dt = timeit(run, variants)
            except Exception as e:
                log(f"hybrid ranged B={B}: SKIPPED ({type(e).__name__}: {e})")
                continue
            _, ids, _ = run(variants[0])
            ranged_ids[B] = np.asarray(ids)
            log(f"hybrid ranged B={B}: lat={dt * 1000:.1f}ms "
                f"qps={B / dt:.0f}")
            results.append((B, "hybrid-ranged", B / dt, dt * 1000))

    # ---------------- pruned hybrid ----------------
    if "pruned" in modes:
        for B in (8, 16, 64, 128):
            variants = []
            for s in range(3):
                (idesc, fdesc, scalars, lr, pre_idesc, pre_fdesc, idf,
                 wl_i, wl_f, tids) = build_pruned_plans(B, seed=7 + s)
                variants.append((
                    jnp.asarray(pre_idesc), jnp.asarray(pre_fdesc),
                    jnp.asarray(wl_i), jnp.asarray(wl_f),
                    jnp.asarray(idf), qvecs[:B],
                    jnp.asarray(scalars[2][:B]),
                ))

            def run_p(v):
                pre_i, pre_f, wli, wlf, idf_a, qb, sims = v
                return pruned_hybrid_topk_int8(
                    p_doc, p_tf, p_tf, p_flen,
                    pre_i, pre_f, wli, wlf,
                    idf_a,
                    jnp.full((qb.shape[0],), float(N), jnp.float32),
                    jnp.zeros((qb.shape[0],), jnp.float32),
                    buf, scales, row_doc, unit_cen, unit_st, doc2row,
                    qb, sims, dummy_omc,
                    lp=LP, lch=LCH, cap=N,
                    C=C_HY, k=16, T=idf_a.shape[1],
                    exact=False, has_omc=False,
                    V=V_HY, nprobe=8, window=WINDOW,
                    has_rescale=False, rescale_lo=0.0, rescale_hi=1.0,
                )

            try:
                dt = timeit(run_p, variants)
            except Exception as e:
                log(f"hybrid pruned B={B}: SKIPPED ({type(e).__name__}: {e})")
                continue
            _, idsp, _ = run_p(variants[0])
            note = ""
            if B in ranged_ids:
                ov = overlap(ranged_ids[B], np.asarray(idsp), 16)
                note = f" overlap@16={ov:.3f}"
            log(f"hybrid pruned B={B}: lat={dt * 1000:.1f}ms "
                f"qps={B / dt:.0f}{note}")
            results.append((B, "hybrid-pruned" + note, B / dt, dt * 1000))

    # ---------------- fulltext dense vs pruned ----------------
    if "ft" in modes:
        ft_ids = {}
        for B in (8,):
            variants = []
            for s in range(3):
                idesc, fdesc, scalars, lr, tids = build_plans(B, seed=7 + s)
                variants.append((
                    jnp.asarray(idesc), jnp.asarray(fdesc),
                    jnp.asarray(scalars[:2]), lr,
                ))

            def run_d(v):
                idesc, fdesc, scalars2, lr = v
                return bm25_search_topk_packed(
                    p_doc, p_tf, p_tf, p_flen,
                    idesc, fdesc, scalars2,
                    dummy_mask, dummy_omc,
                    lr=lr, exact=False, cap=N, k=16,
                    has_mask=False, has_omc=False,
                )

            try:
                dt = timeit(run_d, variants)
                _, ids, _ = run_d(variants[0])
                ft_ids[B] = np.asarray(ids)
                log(f"fulltext dense B={B}: lat={dt * 1000:.1f}ms "
                    f"qps={B / dt:.0f}")
                results.append((B, "ft-dense", B / dt, dt * 1000))
            except Exception as e:
                log(f"fulltext dense B={B}: SKIPPED ({type(e).__name__})")

        for B in (8, 64, 256):
            variants = []
            for s in range(3):
                (idesc, fdesc, scalars, lr, pre_idesc, pre_fdesc, idf,
                 wl_i, wl_f, tids) = build_pruned_plans(B, seed=7 + s)
                variants.append((
                    jnp.asarray(pre_idesc), jnp.asarray(pre_fdesc),
                    jnp.asarray(wl_i), jnp.asarray(wl_f),
                    jnp.asarray(idf),
                ))

            def run_pf(v):
                pre_i, pre_f, wli, wlf, idf_a = v
                B_ = idf_a.shape[0]
                return pruned_fulltext_topk(
                    p_doc, p_tf, p_tf, p_flen,
                    pre_i, pre_f, wli, wlf,
                    idf_a,
                    jnp.full((B_,), float(N), jnp.float32),
                    jnp.zeros((B_,), jnp.float32),
                    dummy_omc,
                    lp=LP, lch=LCH, cap=N,
                    C=C_FT, k=16, T=idf_a.shape[1],
                    exact=False, has_omc=False,
                )

            try:
                dt = timeit(run_pf, variants)
            except Exception as e:
                log(f"fulltext pruned B={B}: SKIPPED "
                    f"({type(e).__name__}: {e})")
                continue
            _, idsp, _ = run_pf(variants[0])
            note = ""
            if B in ft_ids:
                ov = overlap(ft_ids[B], np.asarray(idsp), 16)
                note = f" overlap@16={ov:.3f}"
            log(f"fulltext pruned B={B}: lat={dt * 1000:.1f}ms "
                f"qps={B / dt:.0f}{note}")
            results.append((B, "ft-pruned" + note, B / dt, dt * 1000))

    # ---------------- v4: binary-search rescore (bs) ----------------
    # ---------------- v4 phase split (r5): where do the ms go? --------
    if "split" in modes:
        import functools as _ft

        from oramacore_tpu.ops.pruned import (
            _prefix_candidates,
            _rescore_bsearch,
            pruned_fulltext_topk_bs,
        )

        nom_jit = jax.jit(_ft.partial(
            _prefix_candidates, lp=LP, cap=N, C=1024,
        ))

        def _resc(p_doc, tf_src, p_flen, rng_i, rng_f, idf_a, cand,
                  bs_steps):
            return _rescore_bsearch(
                p_doc, tf_src, p_flen,
                rng_i[0], rng_i[1], rng_f[0], rng_f[1], rng_f[2],
                idf_a, cand, bs_steps=bs_steps,
            )

        resc_jit = jax.jit(_resc, static_argnames=("bs_steps",))

        for B in (8, 64):
            variants = []
            for s in range(3):
                (pre_i, pre_f, rng_i, rng_f, idf, scalars, bs,
                 _t) = build_bs_plans(B, seed=7 + s)
                variants.append((
                    jnp.asarray(pre_i), jnp.asarray(pre_f),
                    jnp.asarray(rng_i), jnp.asarray(rng_f),
                    jnp.asarray(idf), bs,
                ))

            def run_nom(v):
                pre_i, pre_f, _ri, _rf, idf_a, _bs = v
                return nom_jit(
                    p_doc, p_tf, p_flen, pre_i[0], pre_i[1],
                    pre_f[0], pre_f[1], pre_f[2], idf_a,
                )

            # fixed candidate set per variant so the rescore arm times
            # ONLY the rescore
            cands = [run_nom(v) for v in variants]
            jax.block_until_ready(cands)

            def run_resc(v, cand):
                _pi, _pf, rng_i, rng_f, idf_a, bs = v
                return resc_jit(
                    p_doc, p_tf, p_flen, rng_i, rng_f, idf_a, cand,
                    bs_steps=bs,
                )

            def run_full(v):
                pre_i, pre_f, rng_i, rng_f, idf_a, bs = v
                B_ = idf_a.shape[0]
                return pruned_fulltext_topk_bs(
                    p_doc, p_tf, p_flen,
                    pre_i[0], pre_i[1], rng_i, rng_f, idf_a,
                    jnp.zeros((B_,), jnp.float32),
                    dummy_omc, None, pre_f,
                    hp=1, cap=N, k=16, bs_steps=bs,
                    has_omc=False, nom_accum=True, lp=LP, C=1024,
                )

            # timing-method sanity: block_until_ready vs a
            # data-dependent device_get (CLAUDE.md: block_until_ready
            # on small outputs may not round-trip the tunnel)
            def timeit_get(fn, vs, iters=5):
                out = fn(vs[0])
                float(np.asarray(
                    jax.tree_util.tree_leaves(out)[0]
                ).ravel()[0])
                t = time.perf_counter()
                for i in range(iters):
                    out = fn(vs[i % len(vs)])
                    float(np.asarray(
                        jax.tree_util.tree_leaves(out)[0]
                    ).ravel()[0])
                return (time.perf_counter() - t) / iters

            dt_n = timeit(run_nom, variants)
            dt_ng = timeit_get(run_nom, variants)
            log(f"split B={B}: nominator {dt_n * 1000:.1f}ms "
                f"(device_get {dt_ng * 1000:.1f}ms)")
            rv = list(zip(variants, cands))
            dt_r = timeit(lambda vc: run_resc(*vc), rv)
            dt_rg = timeit_get(lambda vc: run_resc(*vc), rv)
            log(f"split B={B}: rescore bs={variants[0][5]} "
                f"{dt_r * 1000:.1f}ms (device_get {dt_rg * 1000:.1f}ms)")
            dt_f = timeit(run_full, variants)
            dt_fg = timeit_get(run_full, variants)
            log(f"split B={B}: full bs kernel {dt_f * 1000:.1f}ms "
                f"(device_get {dt_fg * 1000:.1f}ms) "
                f"nom+resc={1000 * (dt_n + dt_r):.1f}ms")

    if "bs" in modes:
        from oramacore_tpu.ops.pruned import pruned_fulltext_topk_bs

        # dense ground truth for overlap
        bs_truth = {}
        for B in (8,):
            idesc, fdesc, scalars, lr, tids = build_plans(B, seed=7)
            _, ids, _ = bm25_search_topk_packed(
                p_doc, p_tf, p_tf, p_flen,
                jnp.asarray(idesc), jnp.asarray(fdesc),
                jnp.asarray(scalars[:2]),
                dummy_mask, dummy_omc,
                lr=lr, exact=False, cap=N, k=16,
                has_mask=False, has_omc=False,
            )
            bs_truth[B] = np.asarray(ids)
        log("bs: dense ground truth ready")

        for nom, knob in (("slice", 2048), ("slice", 8192),
                          ("accum", 1024), ("accum", 2048)):
            for B in (8, 64, 256):
                variants = []
                for s in range(5):
                    (pre_i, pre_f, rng_i, rng_f, idf, scalars, bs,
                     _t) = build_bs_plans(B, seed=7 + s)
                    variants.append((
                        jnp.asarray(pre_i), jnp.asarray(pre_f),
                        jnp.asarray(rng_i), jnp.asarray(rng_f),
                        jnp.asarray(idf), bs,
                    ))

                def run_bs(v):
                    pre_i, pre_f, rng_i, rng_f, idf_a, bs = v
                    B_ = idf_a.shape[0]
                    return pruned_fulltext_topk_bs(
                        p_doc, p_tf, p_flen,
                        pre_i[0], pre_i[1], rng_i, rng_f,
                        idf_a,
                        jnp.zeros((B_,), jnp.float32),
                        dummy_omc, None,
                        pre_f if nom == "accum" else None,
                        hp=knob if nom == "slice" else 1,
                        cap=N, k=16, bs_steps=bs,
                        has_omc=False, nom_accum=(nom == "accum"),
                        lp=LP if nom == "accum" else 0,
                        C=knob if nom == "accum" else 0,
                    )

                try:
                    dt = timeit(run_bs, variants)
                except Exception as e:
                    log(f"ft-bs-{nom}{knob} B={B}: SKIPPED "
                        f"({type(e).__name__}: {e})")
                    continue
                _, idsb, _ = run_bs(variants[0])
                note = ""
                if B in bs_truth:
                    ov = overlap(bs_truth[B], np.asarray(idsb), 16)
                    note = f" overlap@16={ov:.3f}"
                log(f"ft-bs-{nom}{knob} B={B}: lat={dt * 1000:.1f}ms "
                    f"qps={B / dt:.0f}{note}")
                results.append(
                    (B, f"ft-bs-{nom}{knob}" + note, B / dt, dt * 1000)
                )

    # ---------------- v4 hybrid: bs rescore + IVF probe (bsh) ----------
    if "bsh" in modes:
        from oramacore_tpu.ops.pruned import pruned_hybrid_topk_int8_bs

        bsh_truth = dict(ranged_ids)
        if not bsh_truth:
            for B in (8,):
                idesc, fdesc, scalars, lr, tids = build_plans(B, seed=7)
                _, ids, _ = hybrid_search_topk_packed_int8(
                    p_doc, p_tf, p_tf, p_flen,
                    jnp.asarray(idesc), jnp.asarray(fdesc),
                    jnp.asarray(scalars),
                    buf, scales, row_doc, unit_cen, unit_st, qvecs[:B],
                    dummy_mask, dummy_omc,
                    lr=lr, exact=False, cap=N, k=16,
                    V=V_HY, nprobe=8, window=WINDOW,
                    has_mask=False, has_omc=False,
                    has_rescale=False, rescale_lo=0.0, rescale_hi=1.0,
                )
                bsh_truth[B] = np.asarray(ids)
            log("bsh: dense hybrid ground truth ready")

        for B in (8, 64, 128, 256):
            variants = []
            for s_ in range(5):
                (pre_i, pre_f, rng_i, rng_f, idf, scalars, bs,
                 _t) = build_bs_plans(B, seed=7 + s_)
                variants.append((
                    jnp.asarray(pre_i), jnp.asarray(pre_f),
                    jnp.asarray(rng_i), jnp.asarray(rng_f),
                    jnp.asarray(idf), qvecs[:B],
                    jnp.asarray(scalars[2][:B]), bs,
                ))

            def run_bsh(v):
                pre_i, pre_f, rng_i, rng_f, idf_a, qb, sims, bs = v
                B_ = idf_a.shape[0]
                return pruned_hybrid_topk_int8_bs(
                    p_doc, p_tf, p_flen,
                    pre_i[0], pre_i[1], rng_i, rng_f,
                    idf_a, jnp.zeros((B_,), jnp.float32),
                    buf, scales, row_doc, unit_cen, unit_st, doc2row,
                    qb, sims, dummy_omc, None, pre_f,
                    hp=1, cap=N, k=16, bs_steps=bs, has_omc=False,
                    V=V_HY, nprobe=8, window=WINDOW,
                    has_rescale=False, rescale_lo=0.0, rescale_hi=1.0,
                    nom_accum=True, lp=LP, C=1024,
                )

            try:
                dt = timeit(run_bsh, variants)
            except Exception as e:
                log(f"hybrid bs B={B}: SKIPPED ({type(e).__name__}: {e})")
                continue
            _, idsb, _ = run_bsh(variants[0])
            note = ""
            if B in bsh_truth:
                ov = overlap(bsh_truth[B], np.asarray(idsb), 16)
                note = f" overlap@16={ov:.3f}"
            log(f"hybrid bs B={B}: lat={dt * 1000:.1f}ms "
                f"qps={B / dt:.0f}{note}")
            results.append((B, "hybrid-bs" + note, B / dt, dt * 1000))

    # ------- v4 + bucket-offset rescore index (bsb / bshb) -------------
    # A/B for the engine's PRUNED_BS_BUCKETS path (search_exec.
    # _pruned_bs_boff): boff tables cut the rescore's binary-search
    # rounds from log2(range len) to log2(max bucket span). The engine
    # builds boff on host from its slab copy; here the slab is
    # device-only, so boff is built ON DEVICE with the same vectorized
    # searchsorted (outside the timed loop — it is plan-build cost).
    # cap must be pow2 for the bucket shift, so these arms pass the
    # padded CAPP (semantics unchanged: no doc id >= N exists).
    if "bsb" in modes or "bshb" in modes:
        import functools

        CAPP = 1 << (N - 1).bit_length()
        KB = args.kb
        STRIDE_B = CAPP // KB

        @functools.partial(jax.jit, static_argnames=("steps",))
        def boff_dev(p_doc_, st, ln, steps):
            grid = jnp.arange(1, KB, dtype=jnp.int32) * STRIDE_B
            g = grid[None, None, None, :]
            stq = st[..., None]
            lnq = ln[..., None]
            pos = jnp.zeros(st.shape + (KB - 1,), jnp.int32)
            step = 1 << (steps - 1)
            while step >= 1:
                probe = pos + step
                ok = probe <= lnq
                v = jnp.take(p_doc_, jnp.clip(stq + probe - 1, 0, P - 1))
                pos = jnp.where(ok & (v < g), probe, pos)
                step >>= 1
            z = jnp.zeros(st.shape + (1,), jnp.int32)
            return jnp.concatenate([z, pos, lnq], axis=-1)

        def build_bsb_variants(B, n=5):
            """(variant list, bucketed steps) for batch size B. boff is
            the kernel's r5 flat-table triple (flat, base, shift) —
            here built uniform-K on device and flattened row-major with
            identity bases (the ENGINE builds per-range-resolution rows
            host-side, search_exec._pruned_bs_boff)."""
            raw = []
            span = 1
            sh_const = int(np.log2(CAPP // KB))
            for s_ in range(n):
                (pre_i, pre_f, rng_i, rng_f, idf, _sc, bs,
                 _t) = build_bs_plans(B, seed=7 + s_)
                st_d = jnp.asarray(rng_i[0])
                ln_d = jnp.asarray(rng_i[1])
                boff = boff_dev(p_doc, st_d, ln_d, bs)
                sp = int(jnp.max(boff[..., 1:] - boff[..., :-1]))
                span = max(span, sp)
                Bv, Tv, NRv = rng_i.shape[1:]
                flat = jnp.concatenate(
                    [boff.reshape(-1), jnp.zeros((1,), jnp.int32)]
                )
                base = (
                    jnp.arange(Bv * Tv * NRv, dtype=jnp.int32)
                    * (KB + 1)
                ).reshape(Bv, Tv, NRv)
                shift = jnp.full((Bv, Tv, NRv), sh_const, jnp.int32)
                raw.append((jnp.asarray(pre_i), jnp.asarray(pre_f),
                            jnp.asarray(rng_i), jnp.asarray(rng_f),
                            jnp.asarray(idf), (flat, base, shift), bs))
            sb = 4
            while (1 << sb) < span + 1:
                sb += 4
            return raw, sb

    if "bsb" in modes:
        from oramacore_tpu.ops.pruned import pruned_fulltext_topk_bs

        bsb_truth = {}
        for B in (8,):
            idesc, fdesc, scalars, lr, tids = build_plans(B, seed=7)
            _, ids, _ = bm25_search_topk_packed(
                p_doc, p_tf, p_tf, p_flen,
                jnp.asarray(idesc), jnp.asarray(fdesc),
                jnp.asarray(scalars[:2]),
                dummy_mask, dummy_omc,
                lr=lr, exact=False, cap=N, k=16,
                has_mask=False, has_omc=False,
            )
            bsb_truth[B] = np.asarray(ids)
        log("bsb: dense ground truth ready")

        for B in (8, 64, 256, 512):
            try:
                variants, sb = build_bsb_variants(B)
            except Exception as e:
                log(f"ft-bsb B={B}: boff build SKIPPED "
                    f"({type(e).__name__}: {e})")
                continue
            log(f"ft-bsb B={B}: max-span steps {sb} "
                f"(unbucketed {variants[0][6]})")

            def run_bsb(v, use_boff=True, sb_=sb):
                pre_i, pre_f, rng_i, rng_f, idf_a, boff, bs = v
                B_ = idf_a.shape[0]
                return pruned_fulltext_topk_bs(
                    p_doc, p_tf, p_flen,
                    pre_i[0], pre_i[1], rng_i, rng_f,
                    idf_a, jnp.zeros((B_,), jnp.float32),
                    dummy_omc, None, pre_f,
                    boff if use_boff else None,
                    hp=1, cap=CAPP, k=16,
                    bs_steps=sb_ if use_boff else bs,
                    has_omc=False, nom_accum=True, lp=LP, C=1024,
                )

            for arm, use in (("bsb", True), ("bs-ab", False)):
                try:
                    dt = timeit(lambda v: run_bsb(v, use), variants)
                except Exception as e:
                    log(f"ft-{arm} B={B}: SKIPPED "
                        f"({type(e).__name__}: {e})")
                    continue
                _, idsb, _ = run_bsb(variants[0], use)
                note = ""
                if B in bsb_truth:
                    ov = overlap(bsb_truth[B], np.asarray(idsb), 16)
                    note = f" overlap@16={ov:.3f}"
                if use and B in bsb_truth:
                    _, ids0, _ = run_bsb(variants[0], False)
                    same = bool(np.array_equal(np.asarray(idsb),
                                               np.asarray(ids0)))
                    note += f" ids==unbucketed:{same}"
                log(f"ft-{arm} B={B}: lat={dt * 1000:.1f}ms "
                    f"qps={B / dt:.0f}{note}")
                results.append(
                    (B, f"ft-{arm}" + note, B / dt, dt * 1000)
                )

    if "bshb" in modes:
        from oramacore_tpu.ops.pruned import pruned_hybrid_topk_int8_bs

        bshb_truth = dict(ranged_ids)
        if not bshb_truth:
            for B in (8,):
                idesc, fdesc, scalars, lr, tids = build_plans(B, seed=7)
                _, ids, _ = hybrid_search_topk_packed_int8(
                    p_doc, p_tf, p_tf, p_flen,
                    jnp.asarray(idesc), jnp.asarray(fdesc),
                    jnp.asarray(scalars),
                    buf, scales, row_doc, unit_cen, unit_st, qvecs[:B],
                    dummy_mask, dummy_omc,
                    lr=lr, exact=False, cap=N, k=16,
                    V=V_HY, nprobe=8, window=WINDOW,
                    has_mask=False, has_omc=False,
                    has_rescale=False, rescale_lo=0.0, rescale_hi=1.0,
                )
                bshb_truth[B] = np.asarray(ids)
            log("bshb: dense hybrid ground truth ready")

        for B in (8, 64, 256):
            try:
                variants, sb = build_bsb_variants(B)
            except Exception as e:
                log(f"hybrid-bsb B={B}: boff build SKIPPED "
                    f"({type(e).__name__}: {e})")
                continue
            hvariants = [
                v + (qvecs[:B], jnp.zeros((B,), jnp.float32))
                for v in variants
            ]
            log(f"hybrid-bsb B={B}: max-span steps {sb} "
                f"(unbucketed {variants[0][6]})")

            def run_bshb(v, use_boff=True, sb_=sb):
                (pre_i, pre_f, rng_i, rng_f, idf_a, boff, bs,
                 qb, sims) = v
                B_ = idf_a.shape[0]
                return pruned_hybrid_topk_int8_bs(
                    p_doc, p_tf, p_flen,
                    pre_i[0], pre_i[1], rng_i, rng_f,
                    idf_a, jnp.zeros((B_,), jnp.float32),
                    buf, scales, row_doc, unit_cen, unit_st, doc2row,
                    qb, sims, dummy_omc, None, pre_f,
                    boff if use_boff else None,
                    hp=1, cap=CAPP, k=16,
                    bs_steps=sb_ if use_boff else bs,
                    has_omc=False,
                    V=V_HY, nprobe=8, window=WINDOW,
                    has_rescale=False, rescale_lo=0.0, rescale_hi=1.0,
                    nom_accum=True, lp=LP, C=1024,
                )

            for arm, use in (("bshb", True), ("bsh-ab", False)):
                try:
                    dt = timeit(lambda v: run_bshb(v, use), hvariants)
                except Exception as e:
                    log(f"hybrid-{arm} B={B}: SKIPPED "
                        f"({type(e).__name__}: {e})")
                    continue
                _, idsb, _ = run_bshb(hvariants[0], use)
                note = ""
                if B in bshb_truth:
                    ov = overlap(bshb_truth[B], np.asarray(idsb), 16)
                    note = f" overlap@16={ov:.3f}"
                log(f"hybrid-{arm} B={B}: lat={dt * 1000:.1f}ms "
                    f"qps={B / dt:.0f}{note}")
                results.append(
                    (B, f"hybrid-{arm}" + note, B / dt, dt * 1000)
                )

    # ---------------- fused group-by at 10M (groups) --------------------
    if "groups" in modes:
        from oramacore_tpu.ops.bm25 import bm25_search_grouped_packed

        k_grp = jax.random.fold_in(root, 777)
        for G in (8, 64):
            gid = jax.random.randint(k_grp, (N,), -1, G, dtype=jnp.int32)
            gid.block_until_ready()
            for B in (1, 8):
                variants = []
                for s_ in range(3):
                    idesc, fdesc, scalars, lr, _t = build_plans(
                        B, seed=7 + s_
                    )
                    variants.append((
                        jnp.asarray(idesc), jnp.asarray(fdesc),
                        jnp.asarray(scalars[:2]), lr,
                    ))

                def run_g(v):
                    idesc, fdesc, scalars2, lr = v
                    return bm25_search_grouped_packed(
                        p_doc, p_tf, p_tf, p_flen,
                        idesc, fdesc, scalars2,
                        dummy_mask, dummy_omc, gid,
                        lr=lr, exact=False, cap=N, k=16, R=8, G=G,
                        has_mask=False, has_omc=False,
                    )

                try:
                    dt = timeit(run_g, variants)
                except Exception as e:
                    log(f"grouped G={G} B={B}: SKIPPED "
                        f"({type(e).__name__}: {e})")
                    continue
                log(f"grouped G={G} B={B}: lat={dt * 1000:.1f}ms "
                    f"qps={B / dt:.0f}")
                results.append(
                    (B, f"grouped-g{G}", B / dt, dt * 1000)
                )

    # ---------------- primitive microbenches ----------------
    if "micro" in modes:
        key_m = jax.random.PRNGKey(99)

        def mtime(f, variants, iters=5):
            out = f(variants[0])
            jax.tree_util.tree_leaves(out)[0].block_until_ready()
            t = time.perf_counter()
            for i in range(iters):
                out = f(variants[i % len(variants)])
                jax.tree_util.tree_leaves(out)[0].block_until_ready()
            return (time.perf_counter() - t) / iters

        # (B, M) axis-1 two-operand sorts (the v3 nominator's shape)
        for (Bm, M) in ((8, 196608), (8, 24576), (64, 24576),
                        (1, 9437184)):
            ks = [jax.random.fold_in(key_m, i) for i in range(3)]
            vs = [
                (jax.random.randint(k, (Bm, M), 0, N),
                 jax.random.uniform(k, (Bm, M)))
                for k in ks
            ]
            f = jax.jit(
                lambda kv: jax.lax.sort(kv, dimension=1, num_keys=1)
            )
            dt = mtime(f, vs)
            log(f"micro sort ({Bm},{M}) 2-op: {dt * 1000:.2f}ms "
                f"({Bm * M / dt / 1e6:.0f}M elem/s)")

        # random gathers into the 134M slab (the bsearch probe shape).
        # p_doc MUST be a jit ARGUMENT: a device-array closure gets
        # serialized into the tunnel's remote_compile request and the
        # 536 MB payload dies with HTTP 413 (round-4 session 4).
        for sz in (262144, 2097152, 8388608):
            ks = [jax.random.fold_in(key_m, 100 + i) for i in range(3)]
            vs = [jax.random.randint(k, (sz,), 0, P) for k in ks]
            g = jax.jit(lambda pd, i: jnp.take(pd, i).sum())
            dt = mtime(lambda v: g(p_doc, v), vs)
            log(f"micro gather {sz}: {dt * 1000:.2f}ms "
                f"({sz / dt / 1e6:.0f}M elem/s)")

        # sequential-round gathers (bsearch dependency chain): 20 rounds
        for (Bm, C_) in ((8, 4096), (64, 4096), (8, 24576)):
            ks = [jax.random.fold_in(key_m, 200 + i) for i in range(3)]
            vs = [jax.random.randint(k, (Bm, 3, 1, C_), 0, N) for k in ks]

            def chain(pd, cq):
                pos = jnp.zeros(cq.shape, jnp.int32)
                step = 1 << 19
                while step >= 1:
                    v = jnp.take(pd, jnp.clip(pos + step, 0, P - 1))
                    pos = jnp.where(v < cq, pos + step, pos)
                    step >>= 1
                return pos.sum()

            f = jax.jit(chain)
            dt = mtime(lambda v: f(p_doc, v), vs)
            n_g = Bm * 3 * C_ * 20
            log(f"micro bsearch-chain B={Bm} C={C_}: {dt * 1000:.2f}ms "
                f"({n_g / dt / 1e6:.0f}M probes/s)")

        # top_k over wide rows (the nomination/top-k tail)
        for (Bm, M, kk) in ((8, 196608, 2048), (8, 24576, 16)):
            ks = [jax.random.fold_in(key_m, 300 + i) for i in range(3)]
            vs = [jax.random.uniform(k, (Bm, M)) for k in ks]
            f = jax.jit(lambda x: jax.lax.top_k(x, kk))
            dt = mtime(f, vs)
            log(f"micro top_k ({Bm},{M})->k={kk}: {dt * 1000:.2f}ms")

    if "counts" in modes:
        from oramacore_tpu.ops.pruned import pruned_exact_counts

        for B in (8, 64):
            variants = []
            for s_ in range(3):
                (_idesc, _fdesc, _scalars, _lr, _pi, _pf, idf,
                 wl_i, _wl_f, _tids) = build_pruned_plans(B, seed=7 + s_)
                variants.append((jnp.asarray(wl_i), idf.shape[1]))

            def run_cnt(v):
                wli, T_ = v
                B_ = B
                return pruned_exact_counts(
                    p_doc, p_tf, p_tf, wli,
                    jnp.zeros((B_,), jnp.float32),
                    lch=LCH, cap=N, T=T_, exact=False,
                )

            try:
                dt = timeit(run_cnt, variants)
            except Exception as e:
                log(f"exact counts B={B}: SKIPPED "
                    f"({type(e).__name__}: {e})")
                continue
            cnts = np.asarray(run_cnt(variants[0]))
            log(f"exact counts B={B}: lat={dt * 1000:.1f}ms "
                f"qps={B / dt:.0f} sample={cnts[:4].tolist()}")
            results.append((B, "exact-counts", B / dt, dt * 1000))

    # ---------------- filtered pruned (masked + cand-given) ----------
    if "filtered" in modes:
        k_mask = jax.random.fold_in(root, 777)
        fmask = (
            jax.random.uniform(k_mask, (N,)) < 0.5
        ).astype(jnp.float32)
        fmask.block_until_ready()
        log("50% random filter mask resident on device")

        for B in (8, 64, 256):
            variants = []
            for s_ in range(3):
                (idesc, fdesc, scalars, lr, pre_idesc, pre_fdesc, idf,
                 wl_i, wl_f, tids) = build_pruned_plans(B, seed=7 + s_)
                variants.append((
                    jnp.asarray(pre_idesc), jnp.asarray(pre_fdesc),
                    jnp.asarray(wl_i), jnp.asarray(wl_f),
                    jnp.asarray(idf),
                ))

            def run_fm(v):
                pre_i, pre_f, wli, wlf, idf_a = v
                B_ = idf_a.shape[0]
                return pruned_fulltext_topk(
                    p_doc, p_tf, p_tf, p_flen,
                    pre_i, pre_f, wli, wlf,
                    idf_a,
                    jnp.full((B_,), float(N), jnp.float32),
                    jnp.zeros((B_,), jnp.float32),
                    dummy_omc, None, fmask, None,
                    lp=LP, lch=LCH, cap=N,
                    C=C_FT, k=16, T=idf_a.shape[1],
                    exact=False, has_omc=False, has_filter=True,
                )

            try:
                dt = timeit(run_fm, variants)
            except Exception as e:
                log(f"ft filtered-50% B={B}: SKIPPED "
                    f"({type(e).__name__}: {e})")
                continue
            log(f"ft filtered-50% B={B}: lat={dt * 1000:.1f}ms "
                f"qps={B / dt:.0f}")
            results.append((B, "ft-filtered-50%", B / dt, dt * 1000))

        # small filter: 1k docs -> cand-given (EXACT filtered search)
        rng_f = np.random.default_rng(55)
        small_ids = np.sort(
            rng_f.choice(N, size=1024, replace=False)
        ).astype(np.int32)
        small_mask_np = np.zeros((N,), np.float32)
        small_mask_np[small_ids] = 1.0
        small_mask = jnp.asarray(small_mask_np)
        del small_mask_np
        small_mask.block_until_ready()
        for B in (8, 64, 256):
            variants = []
            for s_ in range(3):
                (idesc, fdesc, scalars, lr, pre_idesc, pre_fdesc, idf,
                 wl_i, wl_f, tids) = build_pruned_plans(B, seed=7 + s_)
                cand_np = np.broadcast_to(
                    small_ids[None, :], (idf.shape[0], 1024)
                ).copy()
                variants.append((
                    jnp.asarray(pre_idesc), jnp.asarray(pre_fdesc),
                    jnp.asarray(wl_i), jnp.asarray(wl_f),
                    jnp.asarray(idf), jnp.asarray(cand_np),
                ))

            def run_cg(v):
                pre_i, pre_f, wli, wlf, idf_a, cand_a = v
                B_ = idf_a.shape[0]
                return pruned_fulltext_topk(
                    p_doc, p_tf, p_tf, p_flen,
                    pre_i, pre_f, wli, wlf,
                    idf_a,
                    jnp.full((B_,), float(N), jnp.float32),
                    jnp.zeros((B_,), jnp.float32),
                    dummy_omc, None, small_mask, cand_a,
                    lp=LP, lch=LCH, cap=N,
                    C=1024, k=16, T=idf_a.shape[1],
                    exact=False, has_omc=False,
                    has_filter=True, cand_given=True,
                )

            try:
                dt = timeit(run_cg, variants)
            except Exception as e:
                log(f"ft small-filter-exact B={B}: SKIPPED "
                    f"({type(e).__name__}: {e})")
                continue
            log(f"ft small-filter-exact B={B}: lat={dt * 1000:.1f}ms "
                f"qps={B / dt:.0f}")
            results.append(
                (B, "ft-small-filter-exact", B / dt, dt * 1000)
            )

        # filtered pruned hybrid at the int8 tier (50% mask)
        for B in (8, 64):
            variants = []
            for s_ in range(3):
                (idesc, fdesc, scalars, lr, pre_idesc, pre_fdesc, idf,
                 wl_i, wl_f, tids) = build_pruned_plans(B, seed=7 + s_)
                variants.append((
                    jnp.asarray(pre_idesc), jnp.asarray(pre_fdesc),
                    jnp.asarray(wl_i), jnp.asarray(wl_f),
                    jnp.asarray(idf), qvecs[:B],
                    jnp.asarray(scalars[2][:B]),
                ))

            def run_hf(v):
                pre_i, pre_f, wli, wlf, idf_a, qb, sims = v
                return pruned_hybrid_topk_int8(
                    p_doc, p_tf, p_tf, p_flen,
                    pre_i, pre_f, wli, wlf,
                    idf_a,
                    jnp.full((qb.shape[0],), float(N), jnp.float32),
                    jnp.zeros((qb.shape[0],), jnp.float32),
                    buf, scales, row_doc, unit_cen, unit_st, doc2row,
                    qb, sims, dummy_omc, None, fmask, None,
                    lp=LP, lch=LCH, cap=N,
                    C=C_HY, k=16, T=idf_a.shape[1],
                    exact=False, has_omc=False,
                    V=V_HY, nprobe=8, window=WINDOW,
                    has_rescale=False, rescale_lo=0.0, rescale_hi=1.0,
                    has_filter=True,
                )

            try:
                dt = timeit(run_hf, variants)
            except Exception as e:
                log(f"hybrid filtered-50% B={B}: SKIPPED "
                    f"({type(e).__name__}: {e})")
                continue
            log(f"hybrid filtered-50% B={B}: lat={dt * 1000:.1f}ms "
                f"qps={B / dt:.0f}")
            results.append((B, "hybrid-filtered-50%", B / dt, dt * 1000))

    # ---------------- pruned-tier facet counting (sort-based v4) -------
    if "facets" in modes:
        from oramacore_tpu.ops.pruned import (
            pruned_facet_hist,
            pruned_match_reps,
        )

        G = 64
        k_fac = jax.random.fold_in(root, 888)
        bucket = jax.random.randint(k_fac, (N,), 0, G, dtype=jnp.int32)
        bucket.block_until_ready()
        bounds0 = jnp.zeros((G, 2), jnp.float32)
        variants = []
        for s_ in range(3):
            (_i, _f, _sc, _lr, _pi, _pf, idf,
             wl_i, _wf, _tids) = build_pruned_plans(1, seed=31 + s_)
            variants.append(jnp.asarray(wl_i))

        def run_reps(wli):
            return pruned_match_reps(
                p_doc, p_tf, p_tf, wli,
                jnp.float32(0.0), jnp.ones((1,), jnp.float32),
                lch=LCH, cap=N, exact=False, has_filter=False,
            )

        try:
            dt_reps = timeit(run_reps, variants)
            reps = [run_reps(v) for v in variants]
            for d_, r_ in reps:
                r_.block_until_ready()

            def run_hist(v):
                d_, r_ = v
                return pruned_facet_hist(
                    d_, r_, bucket, bounds0, G=G, numeric=False,
                )

            dt_hist = timeit(run_hist, reps)
            c = np.asarray(run_hist(reps[0]))
            log(f"facet reps (sort) per query: lat={dt_reps * 1000:.1f}ms")
            log(f"facet hist (G=64) per field: lat={dt_hist * 1000:.1f}ms "
                f"sum={c.sum():.0f}")
            log(f"facet 1-field total: {(dt_reps + dt_hist) * 1000:.1f}ms "
                f"(v3 dud kernel: 4829.6ms; dense bitmap: ~21ms)")
            results.append(
                (1, "facet-sort-reps", 1 / dt_reps, dt_reps * 1000)
            )
            results.append(
                (1, "facet-sort-hist-g64", 1 / dt_hist, dt_hist * 1000)
            )

            # the TRUE A/B arm: the dense-bitmap facet route END TO END
            # per query at B=1 — dense scoring dispatch WITH the packed
            # match bits, the cap/8 D2H, the host unpackbits and the
            # host bincount off the bucket column (the engine's
            # fulltext_facets flow). The earlier "~21ms" record was the
            # device portion at B=8 amortization only.
            bucket_h = np.asarray(bucket)
            dvs = []
            for s_ in range(3):
                idesc, fdesc, scalars2, lr, _t = build_plans(
                    1, seed=31 + s_
                )
                dvs.append((
                    jnp.asarray(idesc), jnp.asarray(fdesc),
                    jnp.asarray(scalars2[:2]), lr,
                ))

            def run_dense_facet(v):
                idesc, fdesc, scalars2, lr = v
                out = bm25_search_topk_packed(
                    p_doc, p_tf, p_tf, p_flen,
                    idesc, fdesc, scalars2,
                    dummy_mask, dummy_omc,
                    lr=lr, exact=False, cap=N, k=16,
                    has_mask=False, has_omc=False, with_bitmap=True,
                )
                bits = np.asarray(out[3][0])          # D2H cap/8
                m = np.unpackbits(bits)[:N].astype(bool)
                return np.bincount(bucket_h[m], minlength=G)

            cd = run_dense_facet(dvs[0])   # warm the compile
            t_ = time.perf_counter()
            for i_ in range(5):
                cd = run_dense_facet(dvs[i_ % len(dvs)])
            dt_dense = (time.perf_counter() - t_) / 5
            log(f"facet dense-bitmap e2e per query: "
                f"lat={dt_dense * 1000:.1f}ms sum={cd.sum():.0f} "
                f"(device dispatch + D2H + host unpack/bincount)")
            results.append(
                (1, "facet-dense-bitmap-e2e", 1 / dt_dense,
                 dt_dense * 1000)
            )
        except Exception as e:
            log(f"facet sort mode SKIPPED ({type(e).__name__}: {e})")

    # ---------------- champion mode (round-2 record) ----------------
    if "champion" in modes:
        CHAMPION_MIN = 32768
        n_champ = min(int(np.searchsorted(-df, -CHAMPION_MIN)), 64)
        champ_terms = list(range(n_champ))
        t_ch = time.perf_counter()
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
                    valid,
                    tf / jnp.maximum(0.25 + 0.75 * fl / AVG_FLEN, 1e-9),
                    0.0,
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

        try:
            rows_buf = build_champs(
                p_doc, p_tf, p_flen,
                jnp.asarray(ch_starts, jnp.int32),
                jnp.asarray(ch_lens, jnp.int32),
                jnp.asarray(ch_cids, jnp.int32),
            )
            rows_buf.block_until_ready()
            log(f"built {n_champ} champion rows in "
                f"{time.perf_counter() - t_ch:.1f}s")
            for B in (8,):
                idesc, fdesc, scalars, lr, term_ids = build_plans(B)
                st, ln = idesc[0].copy(), idesc[1].copy()
                ch_idx = np.full((B, 3, 1), -1, np.int32)
                ch_w = np.zeros((B, 3, 1), np.float32)
                for b in range(B):
                    for t in range(3):
                        tid = int(term_ids[b, t])
                        if tid < n_champ and ln[b, t, 0] > 0:
                            ch_idx[b, t, 0] = tid
                            ch_w[b, t, 0] = 1.0
                            st[b, t, :] = 0
                            ln[b, t, :] = 0
                lr2 = int(min(
                    round(2 ** np.ceil(np.log2(max(ln.max(), 8)))),
                    MAX_RANGE_LEN,
                ))
                if int((ch_idx >= 0).sum()) == 0:
                    continue

                def run_c():
                    return hybrid_search_topk_packed_int8(
                        p_doc, p_tf, p_tf, p_flen,
                        jnp.asarray(np.stack([st, ln])), jnp.asarray(fdesc),
                        jnp.asarray(scalars),
                        buf, scales, row_doc, unit_cen, unit_st, qvecs[:B],
                        dummy_mask, dummy_omc,
                        rows_buf, jnp.asarray(ch_idx), jnp.asarray(ch_w),
                        lr=lr2, exact=False, cap=N, k=16,
                        V=V_HY, nprobe=8, window=WINDOW,
                        has_mask=False, has_omc=False,
                        has_rescale=False, rescale_lo=0.0, rescale_hi=1.0,
                        has_champ=True,
                    )

                dt = timeit(lambda _v: run_c(), [0], iters=3)
                log(f"hybrid champion B={B}: lat={dt * 1000:.1f}ms "
                    f"qps={B / dt:.0f}")
                results.append((B, "hybrid-champion", B / dt, dt * 1000))
            del rows_buf
        except Exception as e:
            log(f"champion mode SKIPPED ({type(e).__name__}: {e})")

    print("\n| batch | path | QPS | batch latency (ms) |")
    print("|---|---|---|---|")
    for B, name, qps, lat in results:
        print(f"| {B} | {name} | {qps:.0f} | {lat:.1f} |")


if __name__ == "__main__":
    main()
