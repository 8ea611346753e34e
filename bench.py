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
    probe_err = _probe_device()
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
    queries = []
    seen = set()
    while len(queries) < B:
        nwords = int(rng.integers(2, 4))
        q = " ".join(rng.choice(vocab, nwords, replace=False))
        if q not in seen:
            seen.add(q)
            queries.append(q)

    token_lists = []
    for q in queries:
        toks = []
        for t, v in parser.tokenize_and_stem(q):
            toks.append(t)
            toks.extend(v)
        token_lists.append(toks)
    n_unique = len({t for toks in token_lists for t in toks})
    print(f"[bench] {B} distinct queries, {n_unique} unique tokens",
          file=sys.stderr)

    def run_batch():
        return ex.search_topk_shared(
            sidx, token_lists, ["title", "description"], {}, n, cap, k=10
        )

    # warmup (compile)
    for _ in range(3):
        run_batch()

    iters = 20
    lat = []
    t0 = time.perf_counter()
    for _ in range(iters):
        t1 = time.perf_counter()
        run_batch()
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
