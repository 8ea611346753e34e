"""Search profiling driver — the reference's search_flamegraph analog
(src/bin/search_flamegraph.rs): loads games.json, runs batched searches
under jax.profiler so kernel time is attributable in TensorBoard/XProf.

Usage: python scripts/profile_search.py [trace_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oramacore_tpu_jax_cache")

import numpy as np


def main():
    import jax

    from oramacore_tpu.index.search_exec import SharedBatchExecutor
    from oramacore_tpu.index.string_index import StringIndex
    from oramacore_tpu.types import Locale
    from oramacore_tpu.utils.tokenizer import TextParser

    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/oramacore_trace"
    docs = json.load(open("/root/reference/benches/games.json"))
    parser = TextParser(Locale.EN)
    sidx = StringIndex()
    for i, d in enumerate(docs):
        sidx.index_text(i, "title", parser.tokenize_and_stem(d["title"]))
        sidx.index_text(i, "description", parser.tokenize_and_stem(d["description"]))
    sidx.commit()

    rng = np.random.default_rng(0)
    vocab = sorted({w for d in docs for w in parser.tokenize(d["description"])
                    if len(w) > 3})[:2000]
    B = 2048
    token_lists = []
    for _ in range(B):
        q = " ".join(rng.choice(vocab, 2, replace=False))
        toks = []
        for t, v in parser.tokenize_and_stem(q):
            toks.append(t)
            toks.extend(v)
        token_lists.append(toks)

    ex = SharedBatchExecutor()
    n = len(docs)
    # warm / compile outside the trace
    ex.search_topk_shared(sidx, token_lists, ["title", "description"], {},
                          n, n, k=10)

    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        for _ in range(5):
            ex.search_topk_shared(
                sidx, token_lists, ["title", "description"], {}, n, n, k=10
            )
        dt = time.perf_counter() - t0
    print(f"traced 5 batches of {B} in {dt*1000:.1f} ms "
          f"({5*B/dt:.0f} qps); trace at {trace_dir}")


if __name__ == "__main__":
    main()
