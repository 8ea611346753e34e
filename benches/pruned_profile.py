"""Hardware profile of the pruned-path phases at the 10M tier, plus the
v4 kernel prototypes (slice/shallow nomination + gather rescore).

Round-4 motivation (benches/RESULTS.md "hardware verdict"): the v3
pruned kernels measured EQUAL to the dense scatter path (~45 QPS at
B=8) because
  - phase 1 sorts (B, T*NPR*lp) prefix contributions (lp=65536 in the
    bench -> a 1.5M-element 2-key sort per dispatch), and
  - phase 2 streams the FULL posting ranges (same traffic as dense)
    with ~15 uniform-binary-search take_along_axis rounds per chunk,
while the sort-based exact-counts kernel handled the same postings in
~5 ms/query. This script isolates each cost on hardware and times the
v4 prototypes:

  A. primitives: random-gather + lax.sort throughput at the sizes the
     kernels actually use;
  B. phase 1 (accumulate-nomination) at lp in {65536, 8192, 2048, 1024};
  C. phase 2 (streaming rescore) alone;
  D. gather-rescore prototype: binary-search each CANDIDATE into each
     doc-sorted range — O(B*T*NR*C*log2 len) random gathers, no
     streaming, host-exact df/IDF (single-field unfiltered plans);
  E. fused prototype (shallow nomination + gather rescore) vs the dense
     ground truth: latency + top-16 overlap.

Usage: python benches/pruned_profile.py  (TPU; ORAMACORE_BENCH_CPU=1
for a tiny smoke run)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SMOKE = os.environ.get("ORAMACORE_BENCH_CPU") == "1"
N = 131072 if SMOKE else 10_485_760
P = 2_097_152 if SMOKE else 134_217_728
V_TERMS = 4096 if SMOKE else 65536
P_CHUNK = P // 16
LP_STORE = 65536 if not SMOKE else 4096   # stored impact-prefix depth
T0 = time.time()


def log(msg):
    print(f"[profile + {time.time() - T0:6.1f}s] {msg}", flush=True)


def main():
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/oramacore_tpu_jax_cache"
    )
    import jax

    if SMOKE:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from oramacore_tpu.ops.bm25 import (
        K1, MAX_RANGE_LEN, bm25_search_topk_packed,
    )
    from oramacore_tpu.ops.pruned import (
        _prefix_candidates, _rescore_worklist,
    )

    log(f"device {jax.devices()[0]}; N={N:,} P={P:,}")
    root = jax.random.PRNGKey(20260818)
    k_post = jax.random.fold_in(root, 3)

    # ---- doc-sorted zipf slab (hybrid10m_bench construction) ----------
    ranks = np.arange(V_TERMS, dtype=np.float64)
    w = 1.0 / (ranks + 50.0)
    df = np.maximum((w / w.sum() * P).astype(np.int64), 1)
    df[0] += P - df.sum()
    tstart = np.zeros(V_TERMS + 1, np.int64)
    np.cumsum(df, out=tstart[1:])
    PAD = MAX_RANGE_LEN
    tstart_dev = jnp.asarray(tstart.astype(np.int32))
    df_dev = jnp.asarray(df.astype(np.int32))

    def _gen_chunk(key, i):
        idx = jnp.arange(P_CHUNK, dtype=jnp.int32) + i * P_CHUNK
        term = jnp.searchsorted(
            tstart_dev, idx, side="right"
        ).astype(jnp.int32) - 1
        local = idx - jnp.take(tstart_dev, term)
        dfv = jnp.take(df_dev, term).astype(jnp.float32)
        u = jax.random.uniform(jax.random.fold_in(key, i), (P_CHUNK,))
        doc = jnp.minimum(
            ((local.astype(jnp.float32) + u) * (float(N) / dfv)).astype(
                jnp.int32
            ),
            N - 1,
        )
        tf = (1.0 + (jax.random.uniform(
            jax.random.fold_in(key, 10_000 + i), (P_CHUNK,)
        ) * 3).astype(jnp.int32)).astype(jnp.float32)
        fl = (5.0 + jax.random.uniform(
            jax.random.fold_in(key, 20_000 + i), (P_CHUNK,)
        ) * 45.0).astype(jnp.float32)
        return doc, tf, fl

    gen_post = jax.jit(_gen_chunk)
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
    log("slab resident")

    # ---- impact-prefix blocks (top-LP_STORE per heavy term) -----------
    heavy = [int(t) for t in np.nonzero(df > LP_STORE)[0]]
    heavy.sort(key=lambda t: int(tstart[t]))
    pre_ranges = {}
    pre_off = P + PAD
    if heavy:
        nh = len(heavy)
        bd = jnp.zeros((nh * LP_STORE,), jnp.int32)
        bt = jnp.zeros((nh * LP_STORE,), jnp.float32)
        bf = jnp.ones((nh * LP_STORE,), jnp.float32)
        buckets = {}
        for hi, t in enumerate(heavy):
            L = LP_STORE * 2
            while L < df[t]:
                L *= 2
            buckets.setdefault(L, []).append((hi, t))
            pre_ranges[t] = (pre_off + hi * LP_STORE, LP_STORE)
        for L, pairs in sorted(buckets.items()):

            @jax.jit
            def build(doc, tf, fl, bd, bt, bf, st_a, ln_a, out_a, L=L):
                iot = jnp.arange(L, dtype=jnp.int32)

                def row(carry, x):
                    bd, bt, bf = carry
                    st, ln, out = x
                    d = jax.lax.dynamic_slice(doc, (st,), (L,))
                    t = jax.lax.dynamic_slice(tf, (st,), (L,))
                    f = jax.lax.dynamic_slice(fl, (st,), (L,))
                    imp = jnp.where(iot < ln, t / jnp.maximum(f, 1e-9), -1.0)
                    _, sel = jax.lax.top_k(imp, LP_STORE)
                    bd = jax.lax.dynamic_update_slice(
                        bd, jnp.take(d, sel), (out,))
                    bt = jax.lax.dynamic_update_slice(
                        bt, jnp.take(t, sel), (out,))
                    bf = jax.lax.dynamic_update_slice(
                        bf, jnp.take(f, sel), (out,))
                    return (bd, bt, bf), None

                (bd, bt, bf), _ = jax.lax.scan(
                    row, (bd, bt, bf), (st_a, ln_a, out_a))
                return bd, bt, bf

            st_a = jnp.asarray([int(tstart[t]) for _h, t in pairs], jnp.int32)
            ln_a = jnp.asarray([int(df[t]) for _h, t in pairs], jnp.int32)
            out_a = jnp.asarray(
                [hi * LP_STORE for hi, _t in pairs], jnp.int32)
            bd, bt, bf = build(p_doc, p_tf, p_flen, bd, bt, bf,
                               st_a, ln_a, out_a)
        bd.block_until_ready()
        cat = jax.jit(lambda a, b: jnp.concatenate([a, b]),
                      donate_argnums=(0,))
        p_doc = cat(p_doc, bd)
        p_tf = cat(p_tf, bt)
        p_flen = cat(p_flen, bf)
        p_doc.block_until_ready()
        log(f"{len(heavy)} impact blocks resident")

    AVG_FLEN = 27.5
    SLAB = int(p_doc.shape[0])

    def term_sets(B, T=3, seed=7):
        rng = np.random.default_rng(seed + B)
        hi = min(5000, V_TERMS - 1)
        return np.exp(
            rng.uniform(np.log(10), np.log(hi), size=(B, T))
        ).astype(np.int64)

    def build_plans(B, T=3, seed=7):
        term_ids = term_sets(B, T, seed)
        NR = int(max(
            (df[t] + MAX_RANGE_LEN - 1) // MAX_RANGE_LEN
            for t in term_ids.ravel()))
        st = np.zeros((B, T, NR), np.int32)
        ln = np.zeros((B, T, NR), np.int32)
        idf = np.zeros((B, T), np.float32)
        for b in range(B):
            for t in range(T):
                tid = term_ids[b, t]
                s0, n = int(tstart[tid]), int(df[tid])
                idf[b, t] = np.log1p((N - n + 0.5) / (n + 0.5))
                ri = 0
                while n > 0:
                    take = min(n, MAX_RANGE_LEN)
                    st[b, t, ri] = s0
                    ln[b, t, ri] = take
                    s0 += take
                    n -= take
                    ri += 1
        return term_ids, st, ln, idf

    def pre_plan(term_ids, lp):
        """Nomination prefix ranges clipped at lp (impact block when the
        term has one, else the head of its doc-sorted range)."""
        B, T = term_ids.shape
        pst = np.zeros((B, T, 1), np.int32)
        pln = np.zeros((B, T, 1), np.int32)
        for b in range(B):
            for t in range(T):
                tid = int(term_ids[b, t])
                if tid in pre_ranges and df[tid] > lp:
                    ps, pl = pre_ranges[tid]
                else:
                    ps, pl = int(tstart[tid]), int(df[tid])
                pst[b, t, 0] = ps
                pln[b, t, 0] = min(int(pl), lp)
        return pst, pln

    def worklist(term_ids, LCH=32768):
        B, T = term_ids.shape
        wl = []
        for b in range(B):
            for t in range(T):
                tid = int(term_ids[b, t])
                s0, n0 = int(tstart[tid]), int(df[tid])
                off = 0
                while off < n0:
                    take = min(n0 - off, LCH)
                    wl.append((b, t, s0 + off, take))
                    off += take
        W = max(128, ((len(wl) + 127) // 128) * 128)
        wl_i = np.zeros((4, W), np.int32)
        wl_f = np.zeros((3, W), np.float32)
        wl_f[0, :len(wl)] = 1.0
        wl_f[1, :] = 0.75
        wl_f[2, :] = AVG_FLEN
        for j, row in enumerate(wl):
            wl_i[:, j] = row
        return wl_i, wl_f

    def timeit(fn, variants, iters=6):
        out = fn(variants[0])
        jax.tree_util.tree_leaves(out)[0].block_until_ready()
        t = time.perf_counter()
        for i in range(iters):
            out = fn(variants[i % len(variants)])
            jax.tree_util.tree_leaves(out)[0].block_until_ready()
        return (time.perf_counter() - t) / iters

    # =========== A. primitives =========================================
    kg = jax.random.fold_in(root, 77)
    for M in (262_144, 1_048_576, 4_194_304):
        if SMOKE and M > 1_048_576:
            continue
        idx_vs = [
            jax.random.randint(jax.random.fold_in(kg, i), (M,), 0, P)
            for i in range(3)
        ]
        g = jax.jit(lambda ix: jnp.sum(jnp.take(p_doc, ix)))
        dt = timeit(g, idx_vs)
        log(f"A gather {M / 1e6:.1f}M random: {dt * 1e3:7.2f} ms "
            f"({M / dt / 1e6:.0f}M/s)")
    for (Bs, Ms) in ((8, 196_608), (8, 24_576), (8, 6_144), (1, 147_456)):
        key_vs = [
            jax.random.randint(
                jax.random.fold_in(kg, 100 + i), (Bs, Ms), 0, 1 << 30)
            for i in range(3)
        ]
        val = jnp.zeros((Bs, Ms), jnp.float32)
        s = jax.jit(lambda kk: jax.lax.sort(
            (kk, val), dimension=1, num_keys=1)[0])
        dt = timeit(s, key_vs)
        log(f"A sort ({Bs},{Ms}) 1key+1val: {dt * 1e3:7.2f} ms "
            f"({Bs * Ms / dt / 1e6:.0f}M/s)")

    # =========== B/C. current phases in isolation ======================
    B = 8
    term_ids, st, ln, idf = build_plans(B)
    wl_i, wl_f = worklist(term_ids)
    log(f"workload: B={B} T=3 worklist entries={int((wl_i[3] > 0).sum())} "
        f"postings={int(wl_i[3].sum()):,}")

    C = 2048
    for lp in (65536, 8192, 2048, 1024):
        if lp > LP_STORE:
            continue
        pst, pln = pre_plan(term_ids, lp)
        ph1 = jax.jit(lambda ps, pl, idf_d, lp=lp: _prefix_candidates(
            p_doc, p_tf, p_flen,
            ps, pl,
            jnp.ones(ps.shape, jnp.float32),
            jnp.full(ps.shape, 0.75, jnp.float32),
            jnp.full(ps.shape, AVG_FLEN, jnp.float32),
            idf_d, None, lp=lp, cap=N, C=C))
        vs = []
        for s_ in range(3):
            ti2, _, _, idf2 = build_plans(B, seed=7 + s_)
            ps2, pl2 = pre_plan(ti2, lp)
            vs.append((jnp.asarray(ps2[:, :, 0]), jnp.asarray(pl2[:, :, 0]),
                       jnp.asarray(idf2)))
        dt = timeit(lambda v: ph1(v[0][:, :, None], v[1][:, :, None], v[2]),
                    vs)
        log(f"B phase1 accum-nominate lp={lp:6d} C={C}: {dt * 1e3:7.2f} ms")

    cand0 = jnp.zeros((B, C), jnp.int32)  # phase-2 cost is cand-agnostic
    ph2 = jax.jit(lambda wli, wlf, nd, cd: _rescore_worklist(
        p_doc, p_tf, p_flen, wli, wlf, nd, cd,
        lch=32768, C=C, T=3))
    vs = []
    for s_ in range(3):
        ti2, _, _, _ = build_plans(B, seed=7 + s_)
        wli2, wlf2 = worklist(ti2)
        vs.append((jnp.asarray(wli2), jnp.asarray(wlf2),
                   jnp.full((B,), float(N), jnp.float32), cand0))
    dt = timeit(lambda v: ph2(*v), vs)
    log(f"C phase2 streaming rescore C={C}: {dt * 1e3:7.2f} ms")

    # =========== D/E. v4 prototype =====================================
    LOG2 = 1
    while (1 << LOG2) < MAX_RANGE_LEN + 1:
        LOG2 += 1

    import functools

    @functools.partial(
        jax.jit,
        static_argnames=("lp", "C", "k", "cap", "T", "NR"),
    )
    def proto_topk(pst, pln, starts, lens, idf, thr,
                   *, lp, C, k, cap, T, NR):
        """Shallow accumulate-nomination + gather rescore."""
        Bq = pst.shape[0]
        cand = _prefix_candidates(
            p_doc, p_tf, p_flen,
            pst, pln,
            jnp.ones(pst.shape, jnp.float32),
            jnp.full(pst.shape, 0.75, jnp.float32),
            jnp.full(pst.shape, AVG_FLEN, jnp.float32),
            idf, None, lp=lp, cap=cap, C=C)
        # gather rescore: binary-search each candidate into each range
        st_e = starts[..., None]                       # (B, T, NR, 1)
        ln_e = lens[..., None]
        cnd = cand[:, None, None, :]                   # (B, 1, 1, C)
        pos = jnp.zeros((Bq, T, NR, C), jnp.int32)
        step = 1 << (LOG2 - 1)
        while step >= 1:
            probe = pos + step
            okp = probe <= ln_e
            v = jnp.take(p_doc, jnp.clip(st_e + probe - 1, 0, SLAB - 1))
            pos = jnp.where(okp & (v < cnd), probe, pos)
            step >>= 1
        at = jnp.clip(st_e + pos, 0, SLAB - 1)
        found = (pos < ln_e) & (jnp.take(p_doc, at) == cnd) & (cnd < cap)
        tf = jnp.where(found, jnp.take(p_tf, at), 0.0)
        fl = jnp.where(found, jnp.take(p_flen, at), 1.0)
        denom = 0.25 + 0.75 * fl / AVG_FLEN
        ntf = tf / denom
        acc = jnp.sum(ntf, axis=2)                     # (B, T, C)
        present = acc > 0.0
        sat = idf[:, :, None] * (K1 + 1.0) * acc / (K1 + acc)
        scores = jnp.sum(jnp.where(present, sat, 0.0), axis=1)
        matched = jnp.sum(present, axis=1).astype(jnp.float32)
        keep = (matched >= thr[:, None]) & (scores > 0.0) & (cand < cap)
        s = jnp.where(keep, scores, -jnp.inf)
        vals, ci = jax.lax.top_k(s, k)
        ids = jnp.take_along_axis(cand, ci, axis=1)
        counts = jnp.sum(keep, axis=1).astype(jnp.int32)
        return vals, ids, counts

    # dense ground truth for overlap
    def dense_ids(Bq, seed):
        ti, st_, ln_, _ = build_plans(Bq, seed=seed)
        NR = st_.shape[2]
        idesc = np.stack([st_, ln_])
        fdesc = np.stack([
            np.ones((Bq, 3, NR), np.float32),
            np.full((Bq, 3, NR), 0.75, np.float32),
            np.full((Bq, 3, NR), AVG_FLEN, np.float32)])
        scalars = np.stack([
            np.full((Bq,), float(N), np.float32),
            np.zeros((Bq,), np.float32)])
        lr = int(min(2 ** int(np.ceil(np.log2(max(ln_.max(), 8)))),
                     MAX_RANGE_LEN))
        vals, ids, _cnt = bm25_search_topk_packed(
            p_doc, p_tf, p_tf, p_flen,
            jnp.asarray(idesc), jnp.asarray(fdesc), jnp.asarray(scalars),
            jnp.zeros((1, 1), bool), jnp.ones((1,), jnp.float32),
            lr=lr, exact=False, cap=N, k=16, has_mask=False, has_omc=False)
        return np.asarray(ids)

    def overlap(a, b, k=16):
        return float(np.mean([
            len(set(a[i, :k].tolist()) & set(b[i, :k].tolist())) / k
            for i in range(a.shape[0])]))

    for Bq in (8, 16, 64):
        if SMOKE and Bq > 8:
            continue
        truth = dense_ids(Bq, seed=7)
        for lp, Cc in ((2048, 2048), (2048, 1024), (1024, 1024),
                       (4096, 2048)):
            if lp > LP_STORE:
                continue
            vs = []
            for s_ in range(3):
                ti, st_, ln_, idf_ = build_plans(Bq, seed=7 + s_)
                pst, pln = pre_plan(ti, lp)
                vs.append((
                    jnp.asarray(pst), jnp.asarray(pln),
                    jnp.asarray(st_), jnp.asarray(ln_),
                    jnp.asarray(idf_),
                    jnp.zeros((Bq,), jnp.float32),
                    st_.shape[2]))
            run = lambda v, lp=lp, Cc=Cc: proto_topk(
                v[0], v[1], v[2], v[3], v[4], v[5],
                lp=lp, C=Cc, k=16, cap=N, T=3, NR=v[6])
            dt = timeit(run, vs)
            _, ids, _ = run(vs[0])
            ov = overlap(np.asarray(ids), truth)
            log(f"E proto B={Bq} lp={lp} C={Cc}: {dt * 1e3:7.2f} ms "
                f"({Bq / dt:.0f} QPS) overlap@16={ov:.3f}")

    log("done")


if __name__ == "__main__":
    main()
