"""Embedding throughput on TPU: BGESmall-shaped BERT (384-d, 12 layers,
30k vocab) through FlaxTextEncoder + EmbeddingQueue. Weights are random
(zero-egress: no trained checkpoints on disk) — compute cost and
throughput are identical to the real model.
"""

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main():
    import numpy as np
    import torch
    import transformers

    words = [f"word{i}" for i in range(2000)]
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    tmp = tempfile.mkdtemp(prefix="bge-small-shape-")
    cfg = transformers.BertConfig(
        vocab_size=len(vocab), hidden_size=384, num_hidden_layers=12,
        num_attention_heads=12, intermediate_size=1536,
        max_position_embeddings=512,
    )
    torch.manual_seed(0)
    transformers.BertModel(cfg).save_pretrained(tmp)
    (open(f"{tmp}/vocab.txt", "w")).write("\n".join(vocab))
    transformers.BertTokenizer(f"{tmp}/vocab.txt").save_pretrained(tmp)

    from oramacore_tpu.embeddings.flax_encoder import FlaxTextEncoder

    enc = FlaxTextEncoder(tmp)
    rng = np.random.default_rng(0)
    texts = [
        " ".join(rng.choice(words, size=48).tolist()) for _ in range(512)
    ]
    # warm (compile)
    enc.encode(texts[:128])
    for B in (32, 128, 512):
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            enc.encode(texts[:B])
        dt = (time.perf_counter() - t0) / iters
        print(f"[embed] BGESmall-shape batch={B} seq~64 "
              f"lat={dt * 1000:.1f}ms docs/s={B / dt:.0f}", flush=True)


if __name__ == "__main__":
    main()
