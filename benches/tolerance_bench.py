"""Fuzzy-match (tolerance) host-time bench at large vocabularies.

VERDICT r2 next #8 done-criterion: tolerance query on a 2M-term vocab
under 50 ms host time with bounded memory. The matcher is
`StringIndex._fuzzy_match` — length-bucketed uint32 codepoint matrices
+ a vectorized banded Wagner-Fischer across the length-band-filtered
candidate set (reference analog: the FST fuzzy walker in
src/collection_manager/sides/read/index/string_field.rs — here the
sorted term table takes the FST's place and the DP is vectorized
instead of automaton-guided).

Pure host path (no device): run anywhere.

    python benches/tolerance_bench.py [--vocab 2000000]
"""
from __future__ import annotations

import argparse
import string
import sys
import time
import tracemalloc

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from oramacore_tpu.index.string_index import StringIndex  # noqa: E402


def synth_vocab(n: int, rng: np.random.Generator):
    """n distinct terms with a realistic length distribution (3-16
    chars, zipf-ish letter mix) — generated vectorized."""
    letters = np.frombuffer(
        string.ascii_lowercase.encode(), np.uint8
    )
    lens = np.clip(rng.poisson(7.0, n) + 3, 3, 16)
    total = int(lens.sum())
    flat = letters[rng.integers(0, 26, total)]
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    blob = flat.tobytes()
    terms = [
        blob[offs[i]:offs[i + 1]].decode() for i in range(n)
    ]
    # de-dup while keeping count: suffix duplicates with a counter
    seen = set()
    out = []
    for i, t in enumerate(terms):
        if t in seen:
            t = f"{t}{i % 100}"
            if t in seen:
                t = f"{t}x{i}"
        seen.add(t)
        out.append(t)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vocab", type=int, default=2_000_000)
    ap.add_argument("--queries", type=int, default=24)
    ap.add_argument("--tolerance", type=int, default=2)
    args = ap.parse_args()

    rng = np.random.default_rng(11)
    t0 = time.perf_counter()
    vocab = synth_vocab(args.vocab, rng)
    print(f"vocab: {len(vocab):,} terms in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    idx = StringIndex()
    # Bypass document ingest: install the vocabulary directly in the
    # slab-facing structures _fuzzy_match/_term_matrix consult.
    idx._slab_terms_by_field = {"title": vocab}
    idx._slab_live_terms = {}
    idx._slab_ranges = {}
    idx._slab_live_ranges = {}
    idx._dirty = False
    idx._slab_committed = ()

    tracemalloc.start()
    t0 = time.perf_counter()
    idx._term_matrix("title")
    build = time.perf_counter() - t0
    cur, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    mats = idx._term_matrix_cache["title"]
    mat_bytes = sum(m.nbytes for _t, m, *_rest in mats)
    print(f"matrix build: {build * 1000:.0f} ms, "
          f"{len(mats)} buckets, matrices {mat_bytes / 1e6:.0f} MB "
          f"(peak traced {peak / 1e6:.0f} MB)", flush=True)

    # queries: mutations of real vocab terms (1-2 edits) + misses
    qs = []
    for i in range(args.queries):
        t = vocab[int(rng.integers(0, len(vocab)))]
        pos = int(rng.integers(0, len(t)))
        c = chr(ord("a") + int(rng.integers(0, 26)))
        qs.append(t[:pos] + c + t[pos + 1:] if i % 3 else t[:-1])

    # warm one query (first call may touch caches)
    idx._fuzzy_match("title", qs[0], args.tolerance)

    times = []
    nhits = []
    for q in qs:
        t0 = time.perf_counter()
        hits = idx._fuzzy_match("title", q, args.tolerance)
        times.append(time.perf_counter() - t0)
        nhits.append(len(hits))
    times_ms = np.asarray(times) * 1e3
    print(f"tolerance={args.tolerance} over {len(qs)} queries: "
          f"p50={np.percentile(times_ms, 50):.1f} ms "
          f"mean={times_ms.mean():.1f} ms "
          f"max={times_ms.max():.1f} ms "
          f"hits mean={np.mean(nhits):.1f}", flush=True)
    ok = np.percentile(times_ms, 50) < 50.0
    print(f"bar(<50ms p50 @ {args.vocab:,} vocab): "
          f"{'PASS' if ok else 'FAIL'}")


if __name__ == "__main__":
    main()
