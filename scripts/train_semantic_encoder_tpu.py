"""Train a LARGER semantic encoder ON-TPU (VERDICT r3 next #6).

The first trained checkpoint (models/semantic-mini: 2 layers, 128-d,
torch on the 1-core host CPU) proved the behavioral axis — semantic
retrieval passes on trained weights and fails on the hash encoder
(tests/test_semantic_encoder.py). This script scales the capability the
TPU-native way: the SAME BERT-family architecture the engine's
inference path runs (embeddings/flax_encoder.FlaxTextEncoder), trained
as a pure-JAX/optax InfoNCE loop jitted onto the TPU — one compiled
train step, fixed (2B, L) batch shapes, in-batch negatives.

Why from scratch: zero egress means no downloadable weights (reference
ships 8 ONNX models, src/python/embeddings.rs:12-93; we can't). The
corpus is the synonym-structured generator from
scripts/train_semantic_encoder.py widened with a second concept tier,
so the encoder must learn synonymy (hash/lexical encoders cannot — no
shared tokens between surface forms).

Output: an HF-format checkpoint (default models/semantic-base:
6 layers, 256-d, 8 heads) written via torch save_pretrained so
FlaxTextEncoder/AutoModel load it exactly like semantic-mini; register
with ai.embeddings_model_paths.

Usage:
    python scripts/train_semantic_encoder_tpu.py [--steps 1200]
        [--batch 256] [--layers 6] [--dim 256] [--out models/semantic-base]

(Runs on the tunneled TPU by default; pass --cpu to force the CPU
backend for smoke runs.)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.train_semantic_encoder import CONCEPTS, FILLER, build_tokenizer

# second concept tier: more synonym groups so the widened model has
# something to earn its capacity on (original word lists)
CONCEPTS_EXTRA = {
    "angry": ["angry", "furious", "irate", "livid"],
    "begin": ["begin", "start", "commence", "initiate"],
    "end": ["end", "finish", "conclude", "terminate"],
    "sad": ["sad", "unhappy", "sorrowful", "gloomy"],
    "rich": ["rich", "wealthy", "affluent", "prosperous"],
    "poor": ["poor", "broke", "destitute", "impoverished"],
    "beautiful": ["beautiful", "pretty", "gorgeous", "lovely"],
    "ugly": ["ugly", "hideous", "unsightly", "grotesque"],
    "dark": ["dark", "dim", "murky", "shadowy"],
    "loud": ["loud", "noisy", "deafening", "thunderous"],
    "quiet": ["quiet", "silent", "hushed", "muted"],
    "wet": ["wet", "damp", "soaked", "moist"],
    "dry": ["dry", "arid", "parched", "dehydrated"],
    "hot": ["hot", "scorching", "sweltering", "blazing"],
    "danger": ["danger", "peril", "hazard", "threat"],
    "safe": ["safe", "secure", "protected", "sheltered"],
    "walk": ["walk", "stroll", "amble", "saunter"],
    "run": ["run", "sprint", "dash", "jog"],
    "talk": ["talk", "speak", "converse", "chat"],
    "look": ["look", "gaze", "stare", "glance"],
    "eat": ["eat", "consume", "devour", "ingest"],
    "sleep": ["sleep", "slumber", "doze", "nap"],
    "think": ["think", "ponder", "contemplate", "reflect"],
    "make": ["make", "build", "construct", "create"],
    "break": ["break", "shatter", "fracture", "smash"],
    "help": ["help", "assist", "aid", "support"],
    "error": ["error", "mistake", "fault", "blunder"],
    "idea": ["idea", "notion", "concept", "thought"],
    "place": ["place", "location", "spot", "site"],
    "trip": ["trip", "journey", "voyage", "expedition"],
    "rain": ["rain", "drizzle", "downpour", "shower"],
    "hill": ["hill", "mound", "knoll", "rise"],
}


def all_concepts():
    merged = dict(CONCEPTS)
    merged.update(CONCEPTS_EXTRA)
    return merged


def sample_pair(rng, concepts, names):
    """Two texts over the SAME concept sequence, independently realized
    (the generator from train_semantic_encoder.sample_pair widened to
    the merged concept set)."""
    k = rng.integers(3, 7)
    seq = rng.choice(len(names), size=k, replace=False)

    def realize():
        words = [concepts[names[c]][rng.integers(0, 4)] for c in seq]
        for _ in range(rng.integers(0, 3)):
            words.insert(
                rng.integers(0, len(words) + 1),
                FILLER[rng.integers(0, len(FILLER))],
            )
        return " ".join(words)

    return realize(), realize()


# --------------------------------------------------------------------------
# Pure-JAX BERT (the exact forward FlaxTextEncoder runs, with params as an
# argument so jax.grad differentiates through it)
# --------------------------------------------------------------------------


def init_params(rng, *, vocab, dim, layers, heads, inter, max_len):
    import jax
    import jax.numpy as jnp

    def dense(key, fan_in, fan_out):
        return (
            jax.random.normal(key, (fan_in, fan_out), jnp.float32)
            * (2.0 / (fan_in + fan_out)) ** 0.5,
            jnp.zeros((fan_out,), jnp.float32),
        )

    keys = iter(jax.random.split(rng, 16 * layers + 8))
    p = {
        "tok_emb": jax.random.normal(
            next(keys), (vocab, dim), jnp.float32) * 0.02,
        "pos_emb": jax.random.normal(
            next(keys), (max_len, dim), jnp.float32) * 0.02,
        "type_emb": jnp.zeros((2, dim), jnp.float32),
        "emb_ln_g": jnp.ones((dim,), jnp.float32),
        "emb_ln_b": jnp.zeros((dim,), jnp.float32),
        "layers": [],
    }
    for _ in range(layers):
        qw, qb = dense(next(keys), dim, dim)
        kw, kb = dense(next(keys), dim, dim)
        vw, vb = dense(next(keys), dim, dim)
        ow, ob = dense(next(keys), dim, dim)
        w1, b1 = dense(next(keys), dim, inter)
        w2, b2 = dense(next(keys), inter, dim)
        p["layers"].append({
            "q_w": qw, "q_b": qb, "k_w": kw, "k_b": kb,
            "v_w": vw, "v_b": vb, "o_w": ow, "o_b": ob,
            "attn_ln_g": jnp.ones((dim,), jnp.float32),
            "attn_ln_b": jnp.zeros((dim,), jnp.float32),
            "ffn_w1": w1, "ffn_b1": b1, "ffn_w2": w2, "ffn_b2": b2,
            "ffn_ln_g": jnp.ones((dim,), jnp.float32),
            "ffn_ln_b": jnp.zeros((dim,), jnp.float32),
        })
    return p


def forward(p, input_ids, attention_mask, *, heads):
    """Mean-pooled L2-normalized BERT forward — numerically the same
    graph as FlaxTextEncoder._forward (flax_encoder.py:89-133)."""
    import jax
    import jax.numpy as jnp

    B, L = input_ids.shape
    D = p["tok_emb"].shape[1]
    hd = D // heads

    x = (
        jnp.take(p["tok_emb"], input_ids, axis=0)
        + p["pos_emb"][None, :L]
        + p["type_emb"][0][None, None, :]
    )

    def ln(x, g, b, eps=1e-12):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + eps) * g + b

    x = ln(x, p["emb_ln_g"], p["emb_ln_b"])
    neg = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
    for layer in p["layers"]:
        q = (x @ layer["q_w"] + layer["q_b"]).reshape(B, L, heads, hd)
        k = (x @ layer["k_w"] + layer["k_b"]).reshape(B, L, heads, hd)
        v = (x @ layer["v_w"] + layer["v_b"]).reshape(B, L, heads, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        att = jax.nn.softmax(att + neg, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, L, D)
        x = ln(x + ctx @ layer["o_w"] + layer["o_b"],
               layer["attn_ln_g"], layer["attn_ln_b"])
        ffn = jax.nn.gelu(x @ layer["ffn_w1"] + layer["ffn_b1"])
        x = ln(x + ffn @ layer["ffn_w2"] + layer["ffn_b2"],
               layer["ffn_ln_g"], layer["ffn_ln_b"])
    mask = attention_mask[:, :, None].astype(x.dtype)
    pooled = jnp.sum(x * mask, axis=1) / jnp.maximum(
        jnp.sum(mask, axis=1), 1e-9
    )
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9
    )


def save_hf_checkpoint(params, tok, out, *, dim, layers, heads, inter,
                       max_len):
    """Write the trained jax params as an HF torch checkpoint — the
    exact inverse of flax_encoder._convert_bert_weights, so
    FlaxTextEncoder round-trips them."""
    import torch
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=tok.vocab_size, hidden_size=dim,
        num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=inter, max_position_embeddings=max_len,
    )
    model = BertModel(cfg)
    sd = model.state_dict()

    def put(name, arr, transpose=False):
        t = torch.from_numpy(np.asarray(arr, np.float32))
        if transpose:
            t = t.T.contiguous()
        assert sd[name].shape == t.shape, (name, sd[name].shape, t.shape)
        sd[name] = t

    put("embeddings.word_embeddings.weight", params["tok_emb"])
    put("embeddings.position_embeddings.weight", params["pos_emb"])
    put("embeddings.token_type_embeddings.weight", params["type_emb"])
    put("embeddings.LayerNorm.weight", params["emb_ln_g"])
    put("embeddings.LayerNorm.bias", params["emb_ln_b"])
    for i, lp in enumerate(params["layers"]):
        pre = f"encoder.layer.{i}."
        put(pre + "attention.self.query.weight", lp["q_w"], True)
        put(pre + "attention.self.query.bias", lp["q_b"])
        put(pre + "attention.self.key.weight", lp["k_w"], True)
        put(pre + "attention.self.key.bias", lp["k_b"])
        put(pre + "attention.self.value.weight", lp["v_w"], True)
        put(pre + "attention.self.value.bias", lp["v_b"])
        put(pre + "attention.output.dense.weight", lp["o_w"], True)
        put(pre + "attention.output.dense.bias", lp["o_b"])
        put(pre + "attention.output.LayerNorm.weight", lp["attn_ln_g"])
        put(pre + "attention.output.LayerNorm.bias", lp["attn_ln_b"])
        put(pre + "intermediate.dense.weight", lp["ffn_w1"], True)
        put(pre + "intermediate.dense.bias", lp["ffn_b1"])
        put(pre + "output.dense.weight", lp["ffn_w2"], True)
        put(pre + "output.dense.bias", lp["ffn_b2"])
        put(pre + "output.LayerNorm.weight", lp["ffn_ln_g"])
        put(pre + "output.LayerNorm.bias", lp["ffn_ln_b"])
    model.load_state_dict(sd)
    model.save_pretrained(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--inter", type=int, default=1024)
    ap.add_argument("--max-len", type=int, default=64)
    ap.add_argument("--lr", type=float, default=6e-4)
    ap.add_argument("--out", default="models/semantic-base")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    print(f"device: {jax.devices()[0]}", flush=True)

    concepts = all_concepts()
    names = sorted(concepts)
    # tokenizer over the merged vocabulary (same HF format as
    # semantic-mini so the engine's loaders need nothing new)
    import scripts.train_semantic_encoder as base

    base.CONCEPTS = concepts  # build_tokenizer reads the module global
    tok = build_tokenizer(args.out)
    rng = np.random.default_rng(0)

    L = 32  # fixed train-time length bucket: one compiled step

    def make_batch():
        pairs = [sample_pair(rng, concepts, names)
                 for _ in range(args.batch)]
        texts = [p[0] for p in pairs] + [p[1] for p in pairs]
        enc = tok(texts, padding="max_length", truncation=True,
                  max_length=L, return_tensors="np")
        return (enc["input_ids"].astype(np.int32),
                enc["attention_mask"].astype(np.int32))

    params = init_params(
        jax.random.PRNGKey(0), vocab=tok.vocab_size, dim=args.dim,
        layers=args.layers, heads=args.heads, inter=args.inter,
        max_len=args.max_len,
    )
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(100, args.steps // 10),
        decay_steps=args.steps,
    )
    opt = optax.adamw(sched, weight_decay=0.01)
    opt_state = opt.init(params)
    temp = 0.05
    B = args.batch

    def loss_fn(p, ids, mask):
        emb = forward(p, ids, mask, heads=args.heads)
        a, b = emb[:B], emb[B:]
        logits = (a @ b.T) / temp
        labels = jnp.arange(B)
        loss = (
            optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
            + optax.softmax_cross_entropy_with_integer_labels(
                logits.T, labels).mean()
        ) / 2
        acc = jnp.mean(jnp.argmax(logits, axis=1) == labels)
        return loss, acc

    @jax.jit
    def train_step(p, s, ids, mask):
        (loss, acc), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, ids, mask)
        updates, s = opt.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss, acc

    t0 = time.time()
    for step in range(args.steps):
        ids, mask = make_batch()
        params, opt_state, loss, acc = train_step(
            params, opt_state, jnp.asarray(ids), jnp.asarray(mask)
        )
        if step % 50 == 0 or step == args.steps - 1:
            print(
                f"step {step}: loss={float(loss):.4f} "
                f"pair-acc={float(acc):.3f} "
                f"({time.time() - t0:.0f}s)", flush=True,
            )

    # validation: synonyms beat cross-concept for BOTH tiers
    def emb_of(words):
        enc = tok(words, padding="max_length", truncation=True,
                  max_length=L, return_tensors="np")
        return np.asarray(forward(
            params, jnp.asarray(enc["input_ids"].astype(np.int32)),
            jnp.asarray(enc["attention_mask"].astype(np.int32)),
            heads=args.heads,
        ))

    e = emb_of(["car", "automobile", "doctor", "walk", "stroll", "rain"])
    syn1 = float(e[0] @ e[1])
    cross1 = float(e[0] @ e[2])
    syn2 = float(e[3] @ e[4])
    cross2 = float(e[3] @ e[5])
    print(f"cos(car, automobile)={syn1:.3f} cos(car, doctor)={cross1:.3f}")
    print(f"cos(walk, stroll)={syn2:.3f} cos(walk, rain)={cross2:.3f}")
    assert syn1 > cross1 + 0.2 and syn2 > cross2 + 0.2, \
        "training failed to separate concepts"

    save_hf_checkpoint(
        params, tok, args.out, dim=args.dim, layers=args.layers,
        heads=args.heads, inter=args.inter, max_len=args.max_len,
    )
    print(f"saved checkpoint to {args.out}", flush=True)

    # round-trip proof: the engine's inference path loads the checkpoint
    # and reproduces the trained embeddings
    from oramacore_tpu.embeddings.flax_encoder import FlaxTextEncoder

    enc2 = FlaxTextEncoder(args.out)
    v = np.stack(enc2.encode(["car", "automobile", "doctor"]))
    assert float(v[0] @ v[1]) > float(v[0] @ v[2]) + 0.2
    print("FlaxTextEncoder round-trip OK", flush=True)


if __name__ == "__main__":
    main()
