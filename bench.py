"""Benchmark driver: games.json BM25 batched search QPS on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "qps", "vs_baseline": N}

Baseline: the reference publishes no absolute numbers; its stated target
is >1,000 QPS for simple queries (/root/reference/benches/README.md:97-99).
vs_baseline is measured QPS / 1000.

Measured path: batched fulltext search over the committed games.json index
— query planning (host), fused BM25F scoring + threshold/filter mask +
top-k (device), hit-id assembly (host). Document hydration is excluded
(reference criterion benches measure the search core as well).
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oramacore_tpu_jax_cache")

import numpy as np


def _probe_device(timeout_s: int = 150):
    """The tunneled TPU can wedge (any device op hangs forever — a 6h
    outage was observed mid-round-3). Probe it in a SUBPROCESS with a
    hard timeout so the bench fails fast and honestly instead of
    hanging the round driver. Returns None when healthy, else an error
    string distinguishing a hang from a fast failure."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(float((jnp.ones((64,64))@jnp.ones((64,64))).sum()))"],
            timeout=timeout_s, capture_output=True,
        )
        if out.returncode == 0:
            return None
        tail = out.stderr.decode(errors="replace").strip()[-300:]
        return f"device probe exited rc={out.returncode}: {tail}"
    except subprocess.TimeoutExpired:
        return (f"tpu tunnel unreachable (device op hung >{timeout_s}s); "
                "see benches/RESULTS.md round-3 outage note")


def main():
    cpu_smoke = "--cpu-smoke" in sys.argv
    if cpu_smoke:
        # correctness/plumbing check without hardware: forces the CPU
        # backend, tiny batch count (numbers are NOT comparable)
        import jax

        jax.config.update("jax_platforms", "cpu")
    probe_err = None if cpu_smoke else _probe_device()
    if probe_err is not None:
        print(json.dumps({
            "metric": "games_json_bm25_batched_qps",
            "value": 0,
            "unit": "qps",
            "vs_baseline": 0,
            "error": probe_err,
        }))
        sys.exit(3)
    import jax

    from oramacore_tpu.index.search_exec import SharedBatchExecutor
    from oramacore_tpu.index.string_index import StringIndex
    from oramacore_tpu.ops.bm25 import masked_topk, round_up_pow2
    from oramacore_tpu.types import Locale
    from oramacore_tpu.utils.tokenizer import TextParser

    docs = json.load(open("/root/reference/benches/games.json"))
    parser = TextParser(Locale.EN)

    t0 = time.time()
    sidx = StringIndex()
    for i, d in enumerate(docs):
        sidx.index_text(i, "title", parser.tokenize_and_stem(d["title"]))
        sidx.index_text(i, "description", parser.tokenize_and_stem(d["description"]))
    sidx.commit()
    index_time = time.time() - t0

    n = len(docs)
    cap = round_up_pow2(n, 128)
    ex = SharedBatchExecutor()

    # DISTINCT realistic queries: 2-3 word combos drawn from the corpus
    # vocabulary (duplicated query lists would overstate the term-dedup win)
    rng = np.random.default_rng(42)
    vocab = sorted(
        {w for d in docs for w in parser.tokenize(d["description"])[:40]
         if len(w) > 3}
    )[:2000]
    B = 16384
    WARMUP = 2
    iters = 20
    if cpu_smoke:
        B, WARMUP, iters = 512, 1, 3
    # ONE DISTINCT batch per run (warmup + timed): the axon terminal
    # MEMOIZES executions with identical input buffers
    # (benches/RESULTS.md round-3 note) — re-running any batch would
    # time cache hits, not searches. Shapes are identical across
    # batches, so everything shares one compilation.
    batches = []
    seen = set()
    stem_cache = {}
    for _ in range(WARMUP + iters):
        token_lists = []
        while len(token_lists) < B:
            nwords = int(rng.integers(2, 4))
            q = " ".join(rng.choice(vocab, nwords, replace=False))
            if q in seen:
                continue
            seen.add(q)
            toks = []
            for w in q.split(" "):
                parsed = stem_cache.get(w)
                if parsed is None:
                    parsed = parser.tokenize_and_stem(w)
                    stem_cache[w] = parsed
                for t, v in parsed:
                    toks.append(t)
                    toks.extend(v)
            token_lists.append(toks)
        batches.append(token_lists)
    n_unique = len({t for toks in batches[0] for t in toks})
    print(f"[bench] {len(batches)}x{B} distinct queries, "
          f"{n_unique} unique tokens in batch 0", file=sys.stderr)

    def run_batch(i):
        return ex.search_topk_shared(
            sidx, batches[i], ["title", "description"], {}, n, cap, k=10
        )

    # warmup (compile)
    for i in range(WARMUP):
        run_batch(i)

    lat = []
    t0 = time.perf_counter()
    for i in range(iters):
        t1 = time.perf_counter()
        run_batch(WARMUP + i)
        lat.append(time.perf_counter() - t1)
    total = time.perf_counter() - t0
    qps = iters * B / total
    lat_ms = np.asarray(lat) * 1000 / B  # per-query latency within batch

    print(
        f"[bench] device={jax.devices()[0]} index_time={index_time:.2f}s "
        f"batch={B} iters={iters} p50={np.percentile(lat_ms, 50):.3f}ms/q "
        f"p99={np.percentile(lat_ms, 99):.3f}ms/q batch_lat_p50="
        f"{np.percentile(np.asarray(lat) * 1000, 50):.1f}ms",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "games_json_bm25_batched_qps",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
