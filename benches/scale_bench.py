"""Scale benchmarks on the real TPU (BASELINE.json configs 1-4).

Run:  python benches/scale_bench.py [bm25_1m|vector_1m|hybrid|all]
Writes results to benches/RESULTS.md-ready lines on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/oramacore_tpu_jax_cache")

import numpy as np


def synth_corpus_postings(n_docs: int, vocab: int, postings_per_doc: int, seed=0):
    """Synthetic postings with a zipf-ish term distribution, packed CSR."""
    rng = np.random.default_rng(seed)
    # term frequencies ~ zipf: term t has weight 1/(t+1)
    weights = 1.0 / np.arange(1, vocab + 1)
    weights /= weights.sum()
    print(f"[synth] drawing {n_docs * postings_per_doc:,} postings...",
          file=sys.stderr)
    terms = rng.choice(vocab, size=n_docs * postings_per_doc, p=weights)
    docs = np.repeat(np.arange(n_docs, dtype=np.int32), postings_per_doc)
    # sort by term → CSR
    order = np.argsort(terms, kind="stable")
    terms_s, docs_s = terms[order], docs[order]
    starts = np.searchsorted(terms_s, np.arange(vocab))
    lens = np.diff(np.append(starts, len(terms_s))).astype(np.int32)
    tf = rng.integers(1, 4, len(docs_s)).astype(np.float32)
    flen = np.full(len(docs_s), float(postings_per_doc), np.float32)
    return docs_s.astype(np.int32), tf, flen, starts.astype(np.int64), lens


def bench_bm25_1m(n_docs=1_000_000, vocab=100_000, ppd=40, B=256, T=4):
    import jax.numpy as jnp

    from oramacore_tpu.index.search_exec import StringSearchTopK
    from oramacore_tpu.index.string_index import QueryPlan, StringIndex, _CommittedField, FieldStats

    docs, tf, flen, starts, lens = synth_corpus_postings(n_docs, vocab, ppd)
    idx = StringIndex()
    terms = [f"t{i}" for i in range(vocab)]
    idx._committed["body"] = [_CommittedField(
        terms=terms,
        starts=starts, lens=lens,
        doc=docs, tf=tf, exact_tf=tf, flen=flen,
        stats=FieldStats(doc_count=n_docs, sum_len=float(flen.sum())),
    )]
    idx._stats["body"] = FieldStats(n_docs, float(flen.sum()))

    rng = np.random.default_rng(1)
    ex = StringSearchTopK()
    # realistic queries: mix of common (low ids) and rare terms
    def make_plans():
        plans = []
        for _ in range(B):
            toks = [f"t{int(rng.zipf(1.3))+10}" for _ in range(T)]
            plans.append(idx.plan_query(toks, ["body"], {}))
        return plans

    from oramacore_tpu.index.search_exec import SharedBatchExecutor

    rngq = np.random.default_rng(1)
    token_sets = [
        [f"t{int(rngq.zipf(1.3))+10}" for _ in range(T)] for _ in range(B)
    ]
    n_unique = len({t for toks in token_sets for t in toks})
    print(f"[bm25_1m] {B} queries x {T} tokens, {n_unique} unique terms "
          f"(shared exact scoring)", file=sys.stderr)

    shared = SharedBatchExecutor()
    t0 = time.perf_counter()
    shared.search_topk_shared(idx, token_sets, ["body"], {}, n_docs,
                              cap=n_docs, k=10)
    compile_t = time.perf_counter() - t0
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        vals, ids, _ = shared.search_topk_shared(
            idx, token_sets, ["body"], {}, n_docs, cap=n_docs, k=10
        )
    dt = (time.perf_counter() - t0) / iters
    qps = B / dt
    print(f"[bm25_1m shared-exact] compile {compile_t:.1f}s batch {B} "
          f"lat {dt*1000:.1f}ms qps {qps:.0f}", file=sys.stderr)

    # cross-check vs the per-query exact path on a subset
    sub = 8
    plans = [idx.plan_query(toks, ["body"], {}) for toks in token_sets[:sub]]
    ev, ei, _ = ex.search_topk(idx, plans, [n_docs] * sub, n_docs, k=10)
    agree = []
    for b in range(sub):
        agree.append(len(set(ei[b].tolist()) & set(ids[b].tolist())) / 10.0)
    overlap = float(np.mean(agree))
    print(f"[bm25_1m] shared vs per-query top-10 overlap: {overlap:.3f}",
          file=sys.stderr)
    return {"metric": "bm25_1m_docs_qps", "value": round(qps, 1),
            "unit": "qps", "exact": True,
            "per_query_overlap": round(overlap, 3)}


def bench_vector_1m(n=1_000_000, dim=384, B=64, k=10):
    from oramacore_tpu.index.vector_index import VectorIndex, VectorIndexConfig
    from oramacore_tpu.ops.vector import l2_normalize

    rng = np.random.default_rng(0)
    print(f"[vector_1m] building {n:,}x{dim} corpus...", file=sys.stderr)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    vecs = l2_normalize(vecs)
    idx = VectorIndex(VectorIndexConfig(dim=dim))
    idx._committed_matrix = vecs
    idx._committed_docs = np.arange(n, dtype=np.int32)
    idx._gen += 1

    queries = l2_normalize(rng.normal(size=(B, dim)).astype(np.float32))
    t0 = time.perf_counter()
    idx.search(list(queries), limit=k, similarity=-1.0)
    compile_t = time.perf_counter() - t0
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        idx.search(list(queries), limit=k, similarity=-1.0)
    dt = (time.perf_counter() - t0) / iters
    qps = B / dt
    print(f"[vector_1m flat-exact] compile {compile_t:.1f}s batch {B} "
          f"lat {dt*1000:.1f}ms qps {qps:.0f}", file=sys.stderr)

    # IVF variant
    print("[vector_1m] building IVF...", file=sys.stderr)
    t0 = time.perf_counter()
    idx._build_ivf()
    print(f"[vector_1m] IVF build {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    idx.search(list(queries), limit=k, similarity=-1.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        got = idx.search(list(queries), limit=k, similarity=-1.0)
    dt_ivf = (time.perf_counter() - t0) / iters
    qps_ivf = B / dt_ivf

    # recall of IVF vs exact on a query subset
    sub = queries[:8]
    exact_sets = []
    scores = vecs @ sub.T  # (n, 8) — host, slow but fine for 8
    for i in range(8):
        exact_sets.append(set(np.argsort(-scores[:, i])[:k].tolist()))
    recalls = []
    for i, q in enumerate(sub):
        got = idx.search([q], limit=k, similarity=-1.0)
        approx = set(sorted(got, key=got.get, reverse=True)[:k])
        recalls.append(len(approx & exact_sets[i]) / k)
    recall = float(np.mean(recalls))
    print(f"[vector_1m IVF] lat {dt_ivf*1000:.1f}ms qps {qps_ivf:.0f} "
          f"recall@10 {recall:.3f}", file=sys.stderr)
    return {
        "metric": "vector_1m_384d",
        "flat_qps": round(qps, 1),
        "ivf_qps": round(qps_ivf, 1),
        "ivf_recall_at_10": round(recall, 3),
    }


def bench_hybrid_filtered(n=200_000, dim=128, B=64, k=10):
    """BASELINE config 3: hybrid BM25+vector with filter predicates,
    end-to-end through the read side."""
    import tempfile

    from oramacore_tpu.config import OramacoreConfig
    from oramacore_tpu.runtime import build_orama
    from oramacore_tpu.types import SearchParams

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as tmp:
        cfg = OramacoreConfig()
        cfg.data_dir = tmp
        cfg.auth.master_api_key = "mk"
        cfg.writer_side.insert_batch_commit_size = 10**9
        cfg.reader_side.insert_batch_commit_size = 10**9
        orama = build_orama(cfg, sync_embeddings=True, start_consumer=False)
        coll = orama.write_side.create_collection("mk", "c")
        orama.write_side.create_index("c", coll.write_api_key, "main")
        words = [f"w{i}" for i in range(2000)]
        print(f"[hybrid] ingesting {n:,} docs...", file=sys.stderr)
        t0 = time.perf_counter()
        batch = []
        for i in range(n):
            batch.append({
                "id": str(i),
                "text": " ".join(rng.choice(words, 12)),
                "price": float(rng.integers(1, 1000)),
                "cat": f"c{int(rng.integers(0, 20))}",
            })
            if len(batch) == 5000:
                orama.write_side.insert_documents(
                    "c", "main", coll.write_api_key, batch)
                batch = []
        if batch:
            orama.write_side.insert_documents("c", "main", coll.write_api_key, batch)
        orama.write_side.embedding_queue.flush_and_wait(timeout=600)
        orama.read_side.pump()
        ingest_t = time.perf_counter() - t0
        print(f"[hybrid] ingest {ingest_t:.1f}s "
              f"({n/ingest_t:.0f} docs/s) commit...", file=sys.stderr)
        t0 = time.perf_counter()
        orama.read_side.commit(force=True)
        print(f"[hybrid] commit {time.perf_counter()-t0:.1f}s", file=sys.stderr)

        queries = [
            SearchParams.from_json({
                "term": " ".join(rng.choice(words, 2)),
                "mode": "hybrid", "similarity": 0.0,
                "where": {"price": {"lt": float(rng.integers(100, 900))}},
                "limit": k,
            })
            for _ in range(B)
        ]
        # warm
        for q in queries[:4]:
            orama.read_side.search("c", coll.read_api_key, q)
        # sequential latency
        t0 = time.perf_counter()
        for q in queries[:16]:
            orama.read_side.search("c", coll.read_api_key, q)
        seq_ms = (time.perf_counter() - t0) / 16 * 1000
        # concurrent serving throughput (16 workers pipeline the tunnel
        # round-trips, as a real server's executor pool does)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(16) as pool:
            t0 = time.perf_counter()
            list(pool.map(
                lambda q: orama.read_side.search("c", coll.read_api_key, q),
                queries,
            ))
            dt = time.perf_counter() - t0
        qps = B / dt
        print(f"[hybrid+filter {n//1000}k docs] {qps:.0f} qps concurrent, "
              f"seq latency {seq_ms:.0f} ms/query e2e", file=sys.stderr)

        # BATCHED API comparison (VERDICT r1 #7 done-criterion: batched
        # hybrid within 2x of batched fulltext at 200k docs). Homogeneous
        # hybrid batches ride the shared term-dedup BM25 pass + the fused
        # vector/fusion/top-k tail; fulltext batches the shared pass alone.
        BB = 256
        terms = [" ".join(rng.choice(words, 2)) for _ in range(BB)]
        hq = [SearchParams.from_json({
            "term": t, "mode": "hybrid", "similarity": 0.0, "limit": k,
        }) for t in terms]
        fq = [SearchParams.from_json({"term": t, "limit": k}) for t in terms]

        def timed_batch(params):
            orama.read_side.search_batch("c", coll.read_api_key, params)
            iters = 5
            t0 = time.perf_counter()
            for _ in range(iters):
                orama.read_side.search_batch("c", coll.read_api_key, params)
            return BB / ((time.perf_counter() - t0) / iters)

        ft_qps = timed_batch(fq)
        hy_qps = timed_batch(hq)
        print(f"[batched {n//1000}k docs, B={BB}] fulltext {ft_qps:.0f} qps, "
              f"hybrid {hy_qps:.0f} qps (ratio {ft_qps/max(hy_qps,1):.2f}x)",
              file=sys.stderr)
        orama.stop()
        return {"metric": "hybrid_filtered_200k_qps", "value": round(qps, 1),
                "unit": "qps", "seq_latency_ms": round(seq_ms, 1),
                "ingest_docs_per_s": round(n / ingest_t, 1),
                "batched_fulltext_qps": round(ft_qps, 1),
                "batched_hybrid_qps": round(hy_qps, 1)}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = []
    if which in ("bm25_1m", "all"):
        out.append(bench_bm25_1m())
    if which in ("vector_1m", "all"):
        out.append(bench_vector_1m())
    if which in ("hybrid", "all"):
        out.append(bench_hybrid_filtered())
    for o in out:
        print(json.dumps(o))


if __name__ == "__main__":
    main()
