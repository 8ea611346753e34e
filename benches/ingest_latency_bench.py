"""Commit -> searchable latency at increasing corpus sizes (VERDICT r2
next #3 done-criterion: steady-state latency must be O(live), not
O(corpus) — round 2 measured a 256 s one-shot full merge at 200k docs).

Steady state = corpus committed across segments; a fresh batch of live
docs arrives; measure (commit + slab rebuild + device slab refresh)
until the new docs are searchable. With the committed-portion cache +
incremental device append (index/string_index.py slab_split,
search_exec._get_device_slab) the latency is flat in corpus size.

Runs on CPU or TPU: python benches/ingest_latency_bench.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from oramacore_tpu.index.search_exec import StringSearchTopK  # noqa: E402
from oramacore_tpu.index.string_index import StringIndex  # noqa: E402

WORDS = [f"w{i:04d}" for i in range(4000)]
TOK = 20
LIVE_BATCH = 1000


def feed(idx, rng, start, n):
    for d in range(start, start + n):
        toks = rng.choice(WORDS, size=TOK)
        idx.index_text(d, "t", [(t, []) for t in toks])


def measure(n_docs, rng):
    idx = StringIndex(index_bigrams=False)
    ex = StringSearchTopK()
    done = 0
    while done < n_docs:
        feed(idx, rng, done, min(5000, n_docs - done))
        done += min(5000, n_docs - done)
        idx.commit()
    # warm device slab for the committed corpus
    ex._get_device_slab(idx)

    lats = []
    for trial in range(3):
        feed(idx, rng, done, LIVE_BATCH)
        done += LIVE_BATCH
        t0 = time.perf_counter()
        idx.commit()
        ex._get_device_slab(idx)  # committed-append + pad concat
        # plan a query over the fresh slab (range resolution path)
        idx.plan_query(["w0001", "w0002"], ["t"], {})
        lats.append(time.perf_counter() - t0)
    return min(lats)


def main():
    rng = np.random.default_rng(0)
    out = {}
    for n in (25_000, 50_000, 100_000, 200_000):
        lat = measure(n, rng)
        out[n] = lat
        print(f"[ingest-lat] corpus={n:>7,} commit->searchable "
              f"{lat * 1000:.0f} ms", file=sys.stderr, flush=True)
    sizes = sorted(out)
    growth = out[sizes[-1]] / max(out[sizes[0]], 1e-9)
    print(json.dumps({
        "metric": "commit_to_searchable_ms_at_200k",
        "value": round(out[200_000] * 1000, 1),
        "unit": "ms",
        "latency_by_corpus": {str(k): round(v * 1000, 1)
                              for k, v in out.items()},
        "growth_8x_corpus": round(growth, 2),
    }))


if __name__ == "__main__":
    main()
