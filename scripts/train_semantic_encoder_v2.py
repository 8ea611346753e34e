"""Train the SCALED in-image text encoder — pure JAX/optax (VERDICT r3
next-round #6: "train a 4-6 layer / wider encoder on-device").

v2 over scripts/train_semantic_encoder.py (the 2-layer torch toy):
- 4 layers x 256 hidden x 8 heads x 1024 FFN (~3.5M params) vs
  2 x 128 x 4 x 256 (~0.6M)
- the TRAINING loop is the serving math: gradients flow through the
  same `bert_forward` the engine's FlaxTextEncoder executes at query
  time (flax_encoder.py) — train/serve parity by construction, and the
  loop runs on whatever jax backend is live (TPU when the tunnel is
  up; `--platform cpu` forces the host)
- 2x the concept inventory, 6 surface forms each, plus hard negatives
  (same concept sequence with ONE concept substituted) inside the
  InfoNCE batch
- checkpoint saved HF-torch-format (models/semantic-base) so
  load_flax_encoder/embeddings_model_paths consume it unchanged; torch
  is touched only for the final save

Reference behavior: the reference ships real multi-layer ONNX encoders
and runs them in CI (src/python/embeddings.rs:12-93); zero egress means
this build must TRAIN its capability proof instead of downloading it.

Usage:
    python scripts/train_semantic_encoder_v2.py [--steps 1500]
        [--platform cpu|default] [--out models/semantic-base]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# concept -> surface forms (original word lists; 6 forms each where
# natural). Two texts are positives iff they realize the SAME concept
# sequence through independently drawn forms.
CONCEPTS = {
    "vehicle": ["car", "automobile", "vehicle", "auto", "sedan", "motorcar"],
    "home": ["house", "home", "residence", "dwelling", "abode", "household"],
    "doctor": ["doctor", "physician", "medic", "clinician", "practitioner"],
    "buy": ["buy", "purchase", "acquire", "obtain", "procure"],
    "fast": ["fast", "quick", "rapid", "speedy", "swift", "brisk"],
    "big": ["big", "large", "huge", "enormous", "giant", "massive"],
    "cold": ["cold", "chilly", "freezing", "frosty", "icy"],
    "food": ["food", "meal", "cuisine", "dish", "fare"],
    "money": ["money", "cash", "currency", "funds", "capital"],
    "happy": ["happy", "glad", "joyful", "cheerful", "delighted"],
    "road": ["road", "street", "avenue", "highway", "boulevard", "lane"],
    "child": ["child", "kid", "youngster", "minor", "juvenile"],
    "work": ["work", "job", "occupation", "employment", "profession"],
    "smart": ["smart", "clever", "intelligent", "bright", "brainy"],
    "storm": ["storm", "tempest", "squall", "gale", "cyclone"],
    "boat": ["boat", "ship", "vessel", "craft", "ferry"],
    "teacher": ["teacher", "instructor", "tutor", "educator", "lecturer"],
    "song": ["song", "tune", "melody", "track", "ballad", "anthem"],
    "fight": ["fight", "battle", "combat", "clash", "skirmish", "duel"],
    "tired": ["tired", "weary", "exhausted", "fatigued", "drained"],
    "book": ["book", "novel", "volume", "tome", "paperback"],
    "light": ["light", "lamp", "glow", "beam", "lantern"],
    "water": ["water", "aqua", "liquid", "fluid"],
    "friend": ["friend", "companion", "buddy", "pal", "comrade", "ally"],
    "old": ["old", "ancient", "aged", "antique", "elderly", "vintage"],
    "small": ["small", "tiny", "little", "miniature", "petite", "compact"],
    "strong": ["strong", "sturdy", "powerful", "robust", "mighty"],
    "wind": ["wind", "breeze", "gust", "draft", "zephyr"],
    "shoe": ["shoe", "sneaker", "boot", "footwear", "loafer"],
    "phone": ["phone", "handset", "mobile", "cellphone", "smartphone"],
    "garden": ["garden", "yard", "lawn", "plot", "grove"],
    "cheap": ["cheap", "inexpensive", "affordable", "budget", "bargain"],
    # --- v2 additions ---
    "sad": ["sad", "unhappy", "sorrowful", "gloomy", "mournful"],
    "angry": ["angry", "furious", "irate", "enraged", "livid"],
    "start": ["start", "begin", "commence", "initiate", "launch"],
    "stop": ["stop", "halt", "cease", "terminate", "quit"],
    "talk": ["talk", "speak", "converse", "chat", "discuss"],
    "walk": ["walk", "stroll", "hike", "march", "amble"],
    "look": ["look", "glance", "gaze", "stare", "peek"],
    "loud": ["loud", "noisy", "deafening", "thunderous", "booming"],
    "quiet": ["quiet", "silent", "hushed", "muted", "still"],
    "beautiful": ["beautiful", "gorgeous", "stunning", "lovely", "pretty"],
    "ugly": ["ugly", "hideous", "unsightly", "grotesque"],
    "rich": ["rich", "wealthy", "affluent", "prosperous", "opulent"],
    "poor": ["poor", "destitute", "impoverished", "needy", "broke"],
    "hot": ["hot", "scorching", "sweltering", "blazing", "torrid"],
    "wet": ["wet", "damp", "soaked", "moist", "drenched"],
    "dry": ["dry", "arid", "parched", "dehydrated"],
    "danger": ["danger", "hazard", "peril", "threat", "risk"],
    "safe": ["safe", "secure", "protected", "sheltered"],
    "doctor2": ["nurse", "caregiver", "paramedic", "orderly"],
    "law": ["law", "statute", "regulation", "ordinance", "decree"],
    "crime": ["crime", "offense", "felony", "misdeed", "violation"],
    "forest": ["forest", "woods", "woodland", "grove2", "thicket"],
    "mountain": ["mountain", "peak", "summit", "ridge", "alp"],
    "river": ["river", "stream", "creek", "brook", "tributary"],
    "city": ["city", "town", "metropolis", "municipality", "borough"],
    "war": ["war", "conflict", "warfare", "hostilities", "campaign"],
    "peace": ["peace", "truce", "armistice", "harmony", "calm"],
    "animal": ["animal", "creature", "beast", "critter", "fauna"],
    "plant": ["plant", "flora", "vegetation", "shrub", "herb"],
    "sick": ["sick", "ill", "unwell", "ailing", "infirm"],
    "healthy": ["healthy", "fit", "well", "hale", "sound"],
    "funny": ["funny", "hilarious", "amusing", "comical", "witty"],
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


def sample_pair(rng, names):
    """Two texts realizing the SAME concept sequence through
    independently drawn surface forms (plus filler noise). One batch
    slot in 4 is a HARD negative pair source: the sampler also returns
    the sequence so the batch builder can inject a one-concept-swapped
    sibling (its InfoNCE row must prefer the true positive)."""
    k = rng.integers(3, 6)
    seq = rng.choice(len(names), size=k, replace=False)

    def realize(s):
        words = [
            CONCEPTS[names[c]][rng.integers(0, len(CONCEPTS[names[c]]))]
            for c in s
        ]
        for _ in range(rng.integers(0, 2)):
            words.insert(
                rng.integers(0, len(words) + 1),
                FILLER[rng.integers(0, len(FILLER))],
            )
        return " ".join(words)

    return realize(seq), realize(seq), seq


def init_params(rng, *, vocab, D, layers, H, FF, max_pos):
    """BERT-schema params in the flax_encoder layout (q_w etc. are
    (D, D) right-multiply — the transpose of torch's Linear.weight)."""
    import jax
    import jax.numpy as jnp

    keys = iter(jax.random.split(rng, 16 + layers * 16))

    def norm(shape, s=0.02):
        return (jax.random.normal(next(keys), shape) * s).astype(
            jnp.float32
        )

    p = {
        "tok_emb": norm((vocab, D)),
        "pos_emb": norm((max_pos, D)),
        "type_emb": norm((2, D)),
        "emb_ln_g": jnp.ones((D,)),
        "emb_ln_b": jnp.zeros((D,)),
        "layers": [],
    }
    for _ in range(layers):
        p["layers"].append({
            "q_w": norm((D, D)), "q_b": jnp.zeros((D,)),
            "k_w": norm((D, D)), "k_b": jnp.zeros((D,)),
            "v_w": norm((D, D)), "v_b": jnp.zeros((D,)),
            "o_w": norm((D, D)), "o_b": jnp.zeros((D,)),
            "attn_ln_g": jnp.ones((D,)), "attn_ln_b": jnp.zeros((D,)),
            "ffn_w1": norm((D, FF)), "ffn_b1": jnp.zeros((FF,)),
            "ffn_w2": norm((FF, D)), "ffn_b2": jnp.zeros((D,)),
            "ffn_ln_g": jnp.ones((D,)), "ffn_ln_b": jnp.zeros((D,)),
        })
    return p


def save_hf_checkpoint(params, out_dir, *, H, max_pos, vocab_size):
    """jax params → HF BertModel torch checkpoint (the format
    load_flax_encoder consumes)."""
    import torch
    from transformers import BertConfig, BertModel

    D = int(np.asarray(params["tok_emb"]).shape[1])
    FF = int(np.asarray(params["layers"][0]["ffn_w1"]).shape[1])
    cfg = BertConfig(
        vocab_size=vocab_size, hidden_size=D,
        num_hidden_layers=len(params["layers"]),
        num_attention_heads=H, intermediate_size=FF,
        max_position_embeddings=max_pos,
    )
    model = BertModel(cfg)
    sd = model.state_dict()

    def put(name, arr, transpose=False):
        a = np.asarray(arr)
        if transpose:
            a = a.T
        sd[name] = torch.from_numpy(np.ascontiguousarray(a))

    put("embeddings.word_embeddings.weight", params["tok_emb"])
    put("embeddings.position_embeddings.weight", params["pos_emb"])
    put("embeddings.token_type_embeddings.weight", params["type_emb"])
    put("embeddings.LayerNorm.weight", params["emb_ln_g"])
    put("embeddings.LayerNorm.bias", params["emb_ln_b"])
    for i, lay in enumerate(params["layers"]):
        pre = f"encoder.layer.{i}."
        put(pre + "attention.self.query.weight", lay["q_w"], True)
        put(pre + "attention.self.query.bias", lay["q_b"])
        put(pre + "attention.self.key.weight", lay["k_w"], True)
        put(pre + "attention.self.key.bias", lay["k_b"])
        put(pre + "attention.self.value.weight", lay["v_w"], True)
        put(pre + "attention.self.value.bias", lay["v_b"])
        put(pre + "attention.output.dense.weight", lay["o_w"], True)
        put(pre + "attention.output.dense.bias", lay["o_b"])
        put(pre + "attention.output.LayerNorm.weight", lay["attn_ln_g"])
        put(pre + "attention.output.LayerNorm.bias", lay["attn_ln_b"])
        put(pre + "intermediate.dense.weight", lay["ffn_w1"], True)
        put(pre + "intermediate.dense.bias", lay["ffn_b1"])
        put(pre + "output.dense.weight", lay["ffn_w2"], True)
        put(pre + "output.dense.bias", lay["ffn_b2"])
        put(pre + "output.LayerNorm.weight", lay["ffn_ln_g"])
        put(pre + "output.LayerNorm.bias", lay["ffn_ln_b"])
    model.load_state_dict(sd)
    model.save_pretrained(out_dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seq", type=int, default=16)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--ffn", type=int, default=1024)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default="models/semantic-base")
    ap.add_argument("--platform", default="cpu",
                    choices=["cpu", "default"],
                    help="'default' uses the live jax backend (TPU "
                         "through the tunnel when up); 'cpu' forces "
                         "the host")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    print(f"backend: {jax.devices()}", flush=True)

    tok = build_tokenizer(args.out)
    names = list(CONCEPTS)
    rng = np.random.default_rng(0)

    params = init_params(
        jax.random.PRNGKey(0), vocab=tok.vocab_size, D=args.hidden,
        layers=args.layers, H=args.heads, FF=args.ffn, max_pos=64,
    )
    n_par = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"{args.layers}L x {args.hidden}d x {args.heads}h "
          f"({n_par / 1e6:.2f}M params)", flush=True)

    warmup = min(100, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=warmup,
        decay_steps=max(args.steps, warmup + 1),
    )
    opt = optax.adamw(sched, weight_decay=0.01)
    opt_state = opt.init(params)
    TEMP = 0.05

    def loss_fn(p, ids_a, m_a, ids_b, m_b):
        za = __import__(
            "oramacore_tpu.embeddings.flax_encoder",
            fromlist=["bert_forward"],
        ).bert_forward(p, ids_a, m_a, n_heads=args.heads)
        zb = __import__(
            "oramacore_tpu.embeddings.flax_encoder",
            fromlist=["bert_forward"],
        ).bert_forward(p, ids_b, m_b, n_heads=args.heads)
        logits = za @ zb.T / TEMP
        labels = jnp.arange(logits.shape[0])
        l1 = optax.softmax_cross_entropy_with_integer_labels(
            logits, labels
        ).mean()
        l2 = optax.softmax_cross_entropy_with_integer_labels(
            logits.T, labels
        ).mean()
        acc = jnp.mean(jnp.argmax(logits, axis=1) == labels)
        return (l1 + l2) / 2, acc

    @jax.jit
    def train_step(p, st, ids_a, m_a, ids_b, m_b):
        (loss, acc), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p, ids_a, m_a, ids_b, m_b)
        upd, st = opt.update(grads, st, p)
        return optax.apply_updates(p, upd), st, loss, acc

    def encode_batch(texts):
        enc = tok(texts, padding="max_length", truncation=True,
                  max_length=args.seq, return_tensors="np")
        return (jnp.asarray(enc["input_ids"]),
                jnp.asarray(enc["attention_mask"]))

    def make_batch():
        """3/4 independent pairs + 1/4 hard-negative triples: the
        swapped sibling joins side B as another row, so row i's InfoNCE
        softmax must beat a text differing in ONE concept."""
        a_texts, b_texts = [], []
        for _ in range(args.batch):
            ta, tb, seq = sample_pair(rng, names)
            if rng.random() < 0.25 and len(a_texts) + 2 <= args.batch:
                swapped = seq.copy()
                pos = rng.integers(0, len(swapped))
                choices = [c for c in range(len(names))
                           if c not in swapped]
                swapped[pos] = choices[rng.integers(0, len(choices))]
                _, tneg, _ = sample_pair(rng, names)
                tneg = " ".join(
                    CONCEPTS[names[c]][rng.integers(
                        0, len(CONCEPTS[names[c]])
                    )] for c in swapped
                )
                a_texts.append(ta)
                b_texts.append(tb)
                # the hard negative enters as its own (self-pair) row
                a_texts.append(tneg)
                b_texts.append(tneg)
            else:
                a_texts.append(ta)
                b_texts.append(tb)
        a_texts = a_texts[:args.batch]
        b_texts = b_texts[:args.batch]
        return encode_batch(a_texts) + encode_batch(b_texts)

    t0 = time.perf_counter()
    for step in range(args.steps):
        ids_a, m_a, ids_b, m_b = make_batch()
        params, opt_state, loss, acc = train_step(
            params, opt_state, ids_a, m_a, ids_b, m_b
        )
        if step % 100 == 0 or step == args.steps - 1:
            print(f"step {step}: loss={float(loss):.4f} "
                  f"pair-acc={float(acc):.3f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)

    # validation: synonym similarity must beat cross-concept similarity
    from oramacore_tpu.embeddings.flax_encoder import bert_forward

    def embed_texts(texts):
        ids, m = encode_batch(texts)
        return np.asarray(bert_forward(params, ids, m,
                                       n_heads=args.heads))

    probes = embed_texts(["car", "automobile", "doctor", "storm",
                          "nurse", "paramedic"])
    syn = float(probes[0] @ probes[1])
    cross = float(probes[0] @ probes[2])
    syn2 = float(probes[4] @ probes[5])
    print(f"cos(car, automobile)={syn:.3f}  cos(car, doctor)={cross:.3f}"
          f"  cos(nurse, paramedic)={syn2:.3f}", flush=True)
    assert syn > cross + 0.2, "training failed to separate concepts"

    save_hf_checkpoint(params, args.out, H=args.heads, max_pos=64,
                       vocab_size=tok.vocab_size)
    print(f"saved checkpoint to {args.out}")


if __name__ == "__main__":
    main()
