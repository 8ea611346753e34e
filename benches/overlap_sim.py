"""Offline overlap@k simulator for the v4 pruned nominator.

Maps the overlap@16 frontier over (lp, C) — the impact-prefix depth and
the candidate budget — WITHOUT hardware: it replicates
benches/hybrid10m_bench.py's synthetic corpus LAW (stratified doc ids,
zipf or uniform tf, uniform flen, log-uniform query ranks) and the
engine's nomination/rescore semantics (ops/pruned.py
_prefix_candidates + exact rescore) in numpy, materializing only the
T=3 query terms' ranges per query (<= ~400k postings each).

Overlap is a pure function of the corpus law and (lp, C) — hardware
only determines QPS. Running 256 queries here gives far tighter CIs
than the device bench's 8-query arms, so the lp sweep on the tunnel
can be spent on the QPS axis alone at pre-chosen frontier points.

Usage:
    python benches/overlap_sim.py --tf zipf --queries 256 \
        --lp 4096,8192,16384,32768,65536 --C 1024,2048,4096

Reference behavior being tuned: the reference's top_k pruning is a
committed-posting cursor walk (token_score.rs:357-422); this build's
TPU design nominates from impact prefixes and rescores exactly, so
recall vs the dense kernel is the parity axis to protect (bar: >=0.95
overlap@16 at 10.49M docs).
"""

from __future__ import annotations

import argparse
import sys
from itertools import islice

import numpy as np

K1 = 1.2
B_PARAM = 0.75
AVG_FLEN = 27.5
V_TERMS = 65536
K_AT = 16


def corpus_law(P: int):
    """df per term: the bench's truncated zipf w=1/(rank+50)."""
    ranks = np.arange(V_TERMS, dtype=np.float64)
    w = 1.0 / (ranks + 50.0)
    df = np.maximum((w / w.sum() * P).astype(np.int64), 1)
    df[0] += P - df.sum()
    return df


def gen_term(rng, tid: int, df: np.ndarray, N: int, tf_mode: str):
    """Materialize one term's postings: (doc, tf, flen), doc-sorted."""
    n = int(df[tid])
    u = rng.random(n)
    doc = np.minimum(((np.arange(n) + u) * (N / n)).astype(np.int64),
                     N - 1)
    u_tf = np.clip(rng.random(n), 1e-6, None)
    if tf_mode == "zipf":
        tf = np.minimum(np.floor(u_tf ** (-1.0 / 1.5)), 64.0)
    else:
        tf = 1.0 + np.floor(u_tf * 3.0)
    fl = 5.0 + rng.random(n) * 45.0
    return doc, tf.astype(np.float64), fl


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_485_760)
    ap.add_argument("--postings", type=int, default=134_217_728)
    ap.add_argument("--tf", choices=["uniform", "zipf"], default="zipf")
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--lp", default="4096,8192,16384,32768,65536")
    ap.add_argument("--C", default="1024,2048,4096")
    ap.add_argument("--W", default="",
                    help="budgeted-allocation arms: comma-separated "
                         "TOTAL prefix widths per query (depths d_t "
                         "allocated across terms, sum d_t <= W)")
    ap.add_argument("--cascade", default="",
                    help="two-pass certificate-cascade arms: "
                         "'lp1:C1:lp2:C2,...' — pass 1 nominates at "
                         "lp1/C1, rescores exactly, and PROVES the "
                         "top-16 exact when every non-candidate's "
                         "upper bound (partial + absent-term prefix "
                         "minima) is below the 16th exact score; "
                         "unproven queries escalate to lp2/C2")
    ap.add_argument("--T", type=int, default=3)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    N = args.docs
    df = corpus_law(args.postings)
    lps = [int(x) for x in args.lp.split(",")]
    Cs = [int(x) for x in args.C.split(",")]
    lp_max = max(lps)

    # query terms: the bench's log-uniform rank draw (term_sets)
    qrng = np.random.default_rng(args.seed + args.queries)
    tids = np.exp(qrng.uniform(np.log(10), np.log(5000),
                               size=(args.queries, args.T))
                  ).astype(np.int64)

    # candidate RANKING keys under test (how the top-C is picked from
    # the prefix-accumulated pool):
    #   part   — partial sum only (the shipped nominator)
    #   ub     — partial + sum_{absent terms} m_t: the MaxScore-style
    #            upper bound (m_t = min contribution in t's prefix);
    #            zero extra device cost (one more segmented sum)
    #   ub0.5  — partial + 0.5 * absent mass (calibrated midpoint)
    rank_keys = ["part", "ub", "ub0.5"]
    # block ORDER under test: tf/flen (the shipped impact heuristic)
    # vs sat (true contribution order — computable at commit)
    orders = ["tf/fl", "sat"]

    Ws = [int(x) for x in args.W.split(",")] if args.W else []
    cascades = []
    if args.cascade:
        for spec in args.cascade.split(","):
            lp1, C1, lp2, C2 = (int(x) for x in spec.split(":"))
            cascades.append((lp1, C1, lp2, C2))
    grng = np.random.default_rng(20260816)
    miss = {}
    nom_miss = {}
    wid_used = {}
    casc_miss = {}
    casc_esc = {}

    for qi in range(args.queries):
        terms = []
        for t in range(args.T):
            tid = int(tids[qi, t])
            doc, tf, fl = gen_term(grng, tid, df, N, args.tf)
            d = max(float(df[tid]), 1.0)
            idf = np.log1p((N - d + 0.5) / (d + 0.5))
            denom = (1.0 - B_PARAM) + B_PARAM * fl / AVG_FLEN
            ntf = tf / denom                       # w = 1.0
            sat = idf * (K1 + 1.0) * ntf / (K1 + ntf)
            o_imp = np.argsort(-(tf / np.maximum(fl, 1e-9)),
                               kind="stable")
            o_sat = np.argsort(-sat, kind="stable")
            terms.append((doc, sat, {"tf/fl": o_imp, "sat": o_sat}))

        # exact scores over the union of the terms' docs
        all_doc = np.concatenate([t[0] for t in terms])
        all_sat = np.concatenate([t[1] for t in terms])
        u_doc, inv = np.unique(all_doc, return_inverse=True)
        tot = np.bincount(inv, weights=all_sat)
        k_top = min(K_AT, len(u_doc))
        top_idx = np.argpartition(-tot, k_top - 1)[:k_top]
        truth = set(u_doc[top_idx].tolist())
        exact_order = u_doc[np.argsort(-tot)]

        for ordk in orders:
            for lp in lps:
                pr_doc = np.concatenate([
                    t[0][t[2][ordk][:min(lp, len(t[0]))]] for t in terms
                ])
                pr_sat = np.concatenate([
                    t[1][t[2][ordk][:min(lp, len(t[1]))]] for t in terms
                ])
                # m_t: min contribution inside each term's prefix
                m = np.array([
                    t[1][t[2][ordk][:min(lp, len(t[1]))]].min()
                    if len(t[1]) else 0.0 for t in terms
                ])
                pr_m = np.concatenate([
                    np.full(min(lp, len(t[0])), m[ti])
                    for ti, t in enumerate(terms)
                ])
                pu, pinv = np.unique(pr_doc, return_inverse=True)
                ptot = np.bincount(pinv, weights=pr_sat)
                # per-doc present-term m mass (each term's docs unique)
                pm = np.bincount(pinv, weights=pr_m)
                absent_mass = m.sum() - pm
                tarr = np.fromiter(truth, np.int64, len(truth))
                ti = np.searchsorted(pu, tarr)
                inpool = (ti < len(pu)) & (pu[np.minimum(ti, len(pu) - 1)] == tarr)
                nom_miss.setdefault((ordk, lp), []).append(
                    int((~inpool).sum())
                )
                keyvals = {
                    "part": ptot,
                    "ub": ptot + absent_mass,
                    "ub0.5": ptot + 0.5 * absent_mass,
                }
                for rk in rank_keys:
                    order = np.argsort(-keyvals[rk], kind="stable")
                    for C in Cs:
                        cand = set(pu[order[:C]].tolist())
                        got = list(islice(
                            (d_ for d_ in exact_order if d_ in cand),
                            K_AT))
                        miss.setdefault((ordk, lp, rk, C), []).append(
                            sum(1 for d_ in truth
                                if d_ not in set(got))
                        )
        # ---- two-pass certificate cascade arms (sat order: the
        # absent-doc bound needs contribution-ordered blocks) ----
        for lp1, C1, lp2, C2 in cascades:
            def nominate(lp, C):
                pr_doc = np.concatenate([
                    t[0][t[2]["sat"][:min(lp, len(t[0]))]]
                    for t in terms
                ])
                pr_sat = np.concatenate([
                    t[1][t[2]["sat"][:min(lp, len(t[1]))]]
                    for t in terms
                ])
                m = np.array([
                    t[1][t[2]["sat"][:min(lp, len(t[1]))]].min()
                    if min(lp, len(t[1])) else 0.0 for t in terms
                ])
                # m_t = 0 when the prefix holds the WHOLE term (no
                # absent posting can exist below it)
                full = np.array([len(t[1]) <= lp for t in terms])
                m = np.where(full, 0.0, m)
                pr_m = np.concatenate([
                    np.full(min(lp, len(t[0])), m[ti])
                    for ti, t in enumerate(terms)
                ])
                pu, pinv = np.unique(pr_doc, return_inverse=True)
                ptot = np.bincount(pinv, weights=pr_sat)
                pm = np.bincount(pinv, weights=pr_m)
                order = np.argsort(-ptot, kind="stable")
                cand = pu[order[:C]]
                ub = ptot + (m.sum() - pm)
                # bound over non-candidates (in-pool) + out-of-pool
                if len(pu) > C:
                    U = max(float(ub[order[C:]].max()), float(m.sum()))
                else:
                    U = float(m.sum())
                return set(cand.tolist()), U

            cand1, U = nominate(lp1, C1)
            got1 = list(islice(
                (d_ for d_ in exact_order if d_ in cand1), K_AT))
            # exact scores of the rescored candidates; theta = 16th
            got_scores = sorted(
                (float(tot[np.searchsorted(u_doc, d_)]) for d_ in got1),
                reverse=True,
            )
            theta = got_scores[K_AT - 1] if len(got_scores) >= K_AT \
                else -1.0
            key = (lp1, C1, lp2, C2)
            if U < theta * (1.0 - 1e-6):
                casc_esc.setdefault(key, []).append(0)
                final = got1
            else:
                casc_esc.setdefault(key, []).append(1)
                cand2, _ = nominate(lp2, C2)
                both = cand1 | cand2
                final = list(islice(
                    (d_ for d_ in exact_order if d_ in both), K_AT))
            casc_miss.setdefault(key, []).append(
                sum(1 for d_ in truth if d_ not in set(final))
            )

        # ---- budgeted-width allocation arms (sat order): sum of the
        # per-term prefix depths d_t is capped by W instead of a fixed
        # per-term lp — the nominator sort then runs at width W ----
        for W in Ws:
            sat_ord = [t[1][t[2]["sat"]] for t in terms]
            docs_ord = [t[0][t[2]["sat"]] for t in terms]
            nterm = len(terms)
            for alloc in ("eq", "thr", "thr2"):
                if alloc == "eq":
                    base = W // nterm
                    d = [min(base, len(s)) for s in sat_ord]
                    # redistribute leftovers to unsaturated terms
                    left = W - sum(d)
                    for ti in np.argsort([len(s) for s in sat_ord])[::-1]:
                        if left <= 0:
                            break
                        extra = min(left, len(sat_ord[ti]) - d[ti])
                        d[ti] += extra
                        left -= extra
                elif alloc == "thr":
                    # exact waterfilling: global top-W by contribution
                    allv = np.concatenate(sat_ord)
                    if len(allv) > W:
                        tau = np.partition(allv, len(allv) - W)[
                            len(allv) - W
                        ]
                        d = [int((s >= tau).sum()) for s in sat_ord]
                    else:
                        d = [len(s) for s in sat_ord]
                else:
                    # sketch waterfilling: depths from log2-spaced
                    # quantile sketches, rounded up to the next pow2
                    # (what the engine can do from commit-time
                    # metadata); may overshoot W by <2x
                    allv = np.concatenate(sat_ord)
                    if len(allv) > W:
                        tau = np.partition(allv, len(allv) - W)[
                            len(allv) - W
                        ]
                        d = []
                        for s in sat_ord:
                            n_ = int((s >= tau).sum())
                            if n_ >= len(s):
                                d.append(len(s))
                            else:
                                p = 1
                                while p < n_:
                                    p *= 2
                                d.append(min(p, len(s)))
                    else:
                        d = [len(s) for s in sat_ord]
                pr_doc = np.concatenate([
                    docs_ord[ti][:d[ti]] for ti in range(nterm)
                ])
                pr_sat = np.concatenate([
                    sat_ord[ti][:d[ti]] for ti in range(nterm)
                ])
                pu, pinv = np.unique(pr_doc, return_inverse=True)
                ptot = np.bincount(pinv, weights=pr_sat)
                tarr = np.fromiter(truth, np.int64, len(truth))
                ti = np.searchsorted(pu, tarr)
                inpool = (ti < len(pu)) & (pu[np.minimum(ti, len(pu) - 1)] == tarr)
                nom_miss.setdefault((alloc, W), []).append(
                    int((~inpool).sum())
                )
                wid_used.setdefault((alloc, W), []).append(int(sum(d)))
                order = np.argsort(-ptot, kind="stable")
                for C in Cs:
                    cand = set(pu[order[:C]].tolist())
                    got = list(islice(
                        (d_ for d_ in exact_order if d_ in cand),
                        K_AT))
                    miss.setdefault((alloc, W, "part", C), []).append(
                        sum(1 for d_ in truth if d_ not in set(got))
                    )
        if (qi + 1) % 32 == 0:
            print(f"  {qi + 1}/{args.queries} queries",
                  file=sys.stderr, flush=True)

    Q = args.queries
    print(f"tf={args.tf} N={N:,} P={args.postings:,} T={args.T} "
          f"queries={Q}")
    print(f"{'order':>6} {'lp':>6} {'rank':>6} {'C':>6} "
          f"{'overlap@16':>10} {'nom-floor':>10}")
    for ordk in orders:
        for lp in lps:
            floor = 1.0 - np.mean(nom_miss[(ordk, lp)]) / K_AT
            for rk in rank_keys:
                for C in Cs:
                    ov = 1.0 - np.mean(miss[(ordk, lp, rk, C)]) / K_AT
                    print(f"{ordk:>6} {lp:>6} {rk:>6} {C:>6} "
                          f"{ov:>10.4f} {floor:>10.4f}")
    if cascades:
        print(f"{'cascade':>22} {'overlap@16':>10} {'esc-rate':>8}")
        for key in cascades:
            ov = 1.0 - np.mean(casc_miss[key]) / K_AT
            er = np.mean(casc_esc[key])
            lab = f"{key[0]}:{key[1]}->{key[2]}:{key[3]}"
            print(f"{lab:>22} {ov:>10.4f} {er:>8.3f}")
    if Ws:
        print(f"{'alloc':>6} {'W':>7} {'C':>6} {'overlap@16':>10} "
              f"{'nom-floor':>10} {'mean-width':>10}")
        for W in Ws:
            for alloc in ("eq", "thr", "thr2"):
                floor = 1.0 - np.mean(nom_miss[(alloc, W)]) / K_AT
                mw = np.mean(wid_used[(alloc, W)])
                for C in Cs:
                    ov = 1.0 - np.mean(
                        miss[(alloc, W, "part", C)]
                    ) / K_AT
                    print(f"{alloc:>6} {W:>7} {C:>6} {ov:>10.4f} "
                          f"{floor:>10.4f} {mw:>10.0f}")


if __name__ == "__main__":
    main()
