"""Champion-row bench: heavy-term queries with and without the dense
precomputed rows (fused single-query path, real TPU)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import oramacore_tpu.index.string_index as si
    from oramacore_tpu.index.search_exec import StringSearchTopK

    rng = np.random.default_rng(0)
    n = 300_000
    vocab = [f"w{i}" for i in range(20_000)]
    idx = si.StringIndex(index_bigrams=False)
    # "the" in every doc (300k postings -> champion), plus zipf tail
    zipf = np.minimum(rng.zipf(1.3, size=(n, 6)) - 1, len(vocab) - 1)
    t0 = time.perf_counter()
    for d in range(n):
        toks = [("the", [])] + [(vocab[int(z)], []) for z in zipf[d]]
        idx.index_text(d, "body", toks)
    print(f"[champ] ingest {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    idx.commit()
    idx.slab()
    print(f"[champ] commit {time.perf_counter()-t0:.1f}s; champions: "
          f"{len(idx._champ_map)}", file=sys.stderr)

    queries = [["the", vocab[int(rng.integers(100, 3000))]]
               for _ in range(32)]
    for use in (False, True):
        ex = StringSearchTopK()
        plans = [idx.plan_query(q, ["body"], {}, use_champions=use)
                 for q in queries]
        # warm EVERY shape bucket (champions shrink per-plan LR buckets,
        # so different tail terms hit different compiled variants)
        for p in plans:
            ex.search_topk(idx, [p], [n], n, k=10)
        t0 = time.perf_counter()
        for p in plans:
            ex.search_topk(idx, [p], [n], n, k=10)
        dt = (time.perf_counter() - t0) / len(plans)
        print(f"[champ] use_champions={use}: {dt*1000:.1f} ms/query "
              f"({1/dt:.0f} qps single-query)", file=sys.stderr)
        # batched: one dispatch for all 32 queries — the tunnel cost
        # amortizes and the device-side scan-vs-row difference shows
        ex.search_topk(idx, plans, [n] * len(plans), n, k=10)
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            ex.search_topk(idx, plans, [n] * len(plans), n, k=10)
        bdt = (time.perf_counter() - t0) / iters
        print(f"[champ] use_champions={use} BATCHED(32): "
              f"{bdt*1000:.1f} ms/batch ({32/bdt:.0f} qps)", file=sys.stderr)


if __name__ == "__main__":
    main()
