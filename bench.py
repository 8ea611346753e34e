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

Tunnel-flakiness policy (VERDICT r4 #2): the tunneled TPU can wedge for
minutes-to-hours and recover (observed r3/r4). A single probe turned two
rounds of real hardware wins into 0-QPS driver records. This driver now
retries through a bounded window — fresh probe subprocess every
PROBE_INTERVAL_S for up to RETRY_WINDOW_S — and runs the measured bench
itself in a subprocess with a hard timeout so a mid-bench hang is retried
instead of hanging the round driver. Every attempt (timestamp, rc, note)
is recorded in the error field of a final 0-QPS report.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oramacore_tpu_jax_cache")

import numpy as np

RETRY_WINDOW_S = 35 * 60     # keep trying this long before reporting 0
PROBE_INTERVAL_S = 4 * 60    # spacing between probe attempts
PROBE_TIMEOUT_S = 150        # one device op must finish within this
BENCH_TIMEOUT_S = 25 * 60    # full inner bench budget (compile included)


def _probe_device(timeout_s: int = PROBE_TIMEOUT_S):
    """One device-health probe in a fresh subprocess with a hard timeout
    (a wedged tunnel hangs ANY device op forever). Returns None when
    healthy, else an error string distinguishing a hang from a fast
    failure."""
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
        return f"probe rc={out.returncode}: {tail}"
    except subprocess.TimeoutExpired:
        return f"probe hung >{timeout_s}s"


def run_bench(cpu_smoke: bool):
    """The measured bench body. Runs in the CURRENT process (invoked as
    `bench.py --inner` by the retry orchestrator, or directly for
    --cpu-smoke). Prints the final JSON line itself; partial results are
    emitted when the device dies after >=3 timed iterations."""
    if cpu_smoke:
        # correctness/plumbing check without hardware: forces the CPU
        # backend, tiny batch count (numbers are NOT comparable)
        import jax

        jax.config.update("jax_platforms", "cpu")
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
    partial_err = None
    t0 = time.perf_counter()
    try:
        for i in range(iters):
            t1 = time.perf_counter()
            run_batch(WARMUP + i)
            lat.append(time.perf_counter() - t1)
    except Exception as e:  # device died mid-bench: salvage what ran
        partial_err = f"{type(e).__name__}: {e}"[:200]
        if len(lat) < 3:
            raise
    total = sum(lat)
    qps = len(lat) * B / total
    lat_ms = np.asarray(lat) * 1000 / B  # per-query latency within batch

    print(
        f"[bench] device={jax.devices()[0]} index_time={index_time:.2f}s "
        f"batch={B} iters={len(lat)}/{iters} "
        f"p50={np.percentile(lat_ms, 50):.3f}ms/q "
        f"p99={np.percentile(lat_ms, 99):.3f}ms/q batch_lat_p50="
        f"{np.percentile(np.asarray(lat) * 1000, 50):.1f}ms",
        file=sys.stderr,
    )
    report = {
        "metric": "games_json_bm25_batched_qps",
        "value": round(qps, 1),
        "unit": "qps",
        "vs_baseline": round(qps / 1000.0, 3),
    }
    if partial_err is not None:
        report["partial"] = f"{len(lat)}/{iters} iters; {partial_err}"
    print(json.dumps(report))


def main():
    if "--cpu-smoke" in sys.argv:
        run_bench(cpu_smoke=True)
        return
    if "--inner" in sys.argv:
        run_bench(cpu_smoke=False)
        return

    # Orchestrator: retry probe+bench through the window. The bench
    # subprocess prints the JSON line; we forward the LAST stdout line
    # that parses as a JSON object with the metric key.
    deadline = time.monotonic() + RETRY_WINDOW_S
    attempts = []
    attempt_no = 0
    while True:
        attempt_no += 1
        stamp = time.strftime("%H:%M:%S")
        err = _probe_device()
        if err is not None:
            attempts.append(f"[{stamp}] attempt {attempt_no}: {err}")
            print(f"[bench] {attempts[-1]}", file=sys.stderr)
        else:
            print(f"[bench] [{stamp}] attempt {attempt_no}: probe ok, "
                  f"running bench", file=sys.stderr)
            try:
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--inner"],
                    timeout=BENCH_TIMEOUT_S, capture_output=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                )
                sys.stderr.write(out.stderr.decode(errors="replace")[-4000:])
                line = None
                for ln in out.stdout.decode(errors="replace").splitlines():
                    ln = ln.strip()
                    if ln.startswith("{"):
                        try:
                            obj = json.loads(ln)
                        except json.JSONDecodeError:
                            continue
                        if obj.get("metric"):
                            line = ln
                if line is not None:
                    print(line)
                    return
                tail = out.stderr.decode(errors="replace").strip()[-300:]
                attempts.append(
                    f"[{stamp}] attempt {attempt_no}: bench rc="
                    f"{out.returncode}, no JSON: {tail}")
            except subprocess.TimeoutExpired:
                attempts.append(
                    f"[{stamp}] attempt {attempt_no}: bench hung "
                    f">{BENCH_TIMEOUT_S}s")
            print(f"[bench] {attempts[-1]}", file=sys.stderr)
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            break
        time.sleep(min(PROBE_INTERVAL_S, max(remaining, 1)))

    print(json.dumps({
        "metric": "games_json_bm25_batched_qps",
        "value": 0,
        "unit": "qps",
        "vs_baseline": 0,
        "error": ("tpu tunnel unreachable through "
                  f"{RETRY_WINDOW_S // 60}-min retry window: "
                  + " | ".join(attempts[-8:])),
    }))
    sys.exit(3)


if __name__ == "__main__":
    main()
