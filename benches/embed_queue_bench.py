"""EmbeddingQueue throughput with the TRAINED encoder (VERDICT r2 #4).

Measures the production ingest path for real-model embeddings: N docs
submitted through `write.EmbeddingQueue` (batched, grouped by model —
reference src/collection_manager/sides/write/embedding.rs:126) with the
in-image trained checkpoint `models/semantic-mini` registered as a
`flax:<model>` backend, counting `index_embedding` ops out the op log.

Also records the raw encoder throughput (no queue) for the same texts,
so queue overhead is visible, plus the default hash-encoder queue rate
for context.

Runs on whatever backend JAX resolves: the round driver's TPU when the
tunnel is live, CPU otherwise (the printed line names the platform).

Usage: python benches/embed_queue_bench.py [--docs 2048] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPTS = {
    "mini": ("SemanticMini", 128,
             os.path.join(REPO, "models", "semantic-mini")),
    "base": ("SemanticBase", 256,
             os.path.join(REPO, "models", "semantic-base")),
}

WORDS = (
    "car automobile doctor physician storm melody purchase warning "
    "appointment collection engine wheel clinic thunder song market"
).split()


def make_texts(n: int, tokens: int = 24) -> list:
    import numpy as np

    rng = np.random.default_rng(7)
    return [
        " ".join(rng.choice(WORDS, size=tokens).tolist()) for _ in range(n)
    ]


class _CountingSender:
    def __init__(self):
        self.n = 0

    def send(self, op):
        self.n += 1


def run_queue(model: str, texts, batch_limit: int = 256) -> float:
    from oramacore_tpu.write import EmbeddingQueue
    import oramacore_tpu.embeddings as emb

    svc = emb.EmbeddingsService()
    sender = _CountingSender()
    q = EmbeddingQueue(svc, sender, batch_limit=batch_limit)
    # warm the encoder/compile outside the timed window
    svc.calculate_embeddings(texts[:2], emb.Intent.PASSAGE, model)
    t0 = time.perf_counter()
    q.submit_many([
        ("c", "i", i, model, t) for i, t in enumerate(texts)
    ])
    q.flush_and_wait(timeout=600)
    while sender.n < len(texts):  # flush returns when the queue drains;
        time.sleep(0.005)         # the LAST batch may still be processing
    dt = time.perf_counter() - t0
    q.stop()
    assert sender.n == len(texts), (sender.n, len(texts))
    return len(texts) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2048)
    ap.add_argument("--model", choices=["mini", "base"], default="base")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/oramacore_tpu_jax_cache"
    )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    platform = jax.devices()[0].platform

    import oramacore_tpu.embeddings as emb
    from oramacore_tpu.embeddings.flax_encoder import (
        load_flax_encoder,
        register_flax_backend,
    )

    name, dim, ckpt = CKPTS[args.model]
    emb.register_model(emb.ModelInfo(name, dim, 64, backend="flax"))
    assert register_flax_backend(ckpt, model_name=name)

    texts = make_texts(args.docs)

    # raw encoder (no queue, one big batch path inside the encoder)
    enc = load_flax_encoder(ckpt)
    enc.encode(texts[:2])
    t0 = time.perf_counter()
    enc.encode(texts)
    raw = len(texts) / (time.perf_counter() - t0)

    trained = run_queue(name, texts)
    hash_rate = run_queue(emb.DEFAULT_MODEL, texts)

    print(
        f'{{"bench": "embed_queue", "platform": "{platform}", '
        f'"model": "{name}", '
        f'"docs": {len(texts)}, '
        f'"trained_queue_docs_per_s": {trained:.0f}, '
        f'"trained_raw_docs_per_s": {raw:.0f}, '
        f'"hash_queue_docs_per_s": {hash_rate:.0f}}}'
    )


if __name__ == "__main__":
    main()
