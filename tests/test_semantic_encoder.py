"""Semantic retrieval with TRAINED weights (VERDICT r2 missing #1,
r4 next #3).

Two in-image checkpoints (zero egress forbids downloads):
- `models/semantic-mini` — 2-layer x 128-d BERT
  (scripts/train_semantic_encoder.py, torch loop)
- `models/semantic-base` — 4-layer x 256-d BERT trained by the pure-JAX
  loop that IS the serving forward pass
  (scripts/train_semantic_encoder_v2.py; bert_forward train/serve
  parity by construction)

Both are registry models (`SemanticMini`/`SemanticBase`) bound lazily
by runtime.build_orama — the engine-default flax checkpoints. These
tests prove the full path EmbeddingQueue -> VectorIndex -> ranking does
SEMANTIC retrieval the hash encoder cannot (the target document shares
NO surface tokens with the query, only meaning), and that semantic-base
separates concepts more strongly than semantic-mini.

Reference behavior: real multi-layer encoders exercised in CI
(src/python/embeddings.rs:12-93).
"""

import os

import numpy as np
import pytest

from oramacore_tpu.embeddings.flax_encoder import load_flax_encoder

from .utils import TestContext, ids_of

_ROOT = os.path.join(os.path.dirname(__file__), "..", "models")
MINI = os.path.join(_ROOT, "semantic-mini")
BASE = os.path.join(_ROOT, "semantic-base")

pytestmark = pytest.mark.skipif(
    not (os.path.exists(os.path.join(MINI, "model.safetensors"))
         and os.path.exists(os.path.join(BASE, "model.safetensors"))),
    reason="trained checkpoints missing (run scripts/train_semantic_encoder*.py)",
)

MODELS = [("SemanticMini", MINI), ("SemanticBase", BASE)]


@pytest.mark.parametrize("name,ckpt", MODELS)
def test_trained_weights_encode_synonyms_close(name, ckpt):
    enc = load_flax_encoder(ckpt)
    assert enc is not None
    v = {t: e for t, e in zip(
        ["car", "automobile", "doctor", "physician", "storm"],
        enc.encode(["car", "automobile", "doctor", "physician", "storm"]),
    )}
    assert float(v["car"] @ v["automobile"]) > 0.8
    assert float(v["doctor"] @ v["physician"]) > 0.8
    assert float(v["car"] @ v["doctor"]) < 0.6
    assert float(v["automobile"] @ v["storm"]) < 0.6


# phrase-level retrieval probe: each query's target is the SAME concept
# sequence realized through different surface forms; zero token overlap
PHRASE_Q = ["buy car", "fast boat trip", "doctor visit", "cold storm night"]
PHRASE_T = [
    "automobile purchase", "rapid vessel voyage",
    "physician appointment", "icy tempest evening",
]


def _phrase_margin(enc) -> float:
    """Mean margin of the correct phrase target over the best decoy."""
    S = np.array(enc.encode(PHRASE_Q)) @ np.array(enc.encode(PHRASE_T)).T
    n = len(PHRASE_Q)
    assert (np.argmax(S, axis=1) == np.arange(n)).all(), S
    return float(np.mean(np.diag(S) - np.max(S - np.eye(n) * 9.0, axis=1)))


def test_semantic_base_beats_mini_on_phrase_separation():
    """The 4x256 JAX-trained checkpoint must separate phrase-level
    paraphrases from decoys by a wider margin than the 2x128 toy — the
    capability axis VERDICT r4 asked to validate (measured at wiring
    time: base 0.58 vs mini 0.48)."""
    mini = load_flax_encoder(MINI)
    base = load_flax_encoder(BASE)
    m_mini = _phrase_margin(mini)
    m_base = _phrase_margin(base)
    assert m_base > m_mini + 0.02, (m_base, m_mini)
    assert m_base > 0.4, m_base


# the semantic target shares NO tokens with the query; the decoys share
# exactly one literal token with the query text's domain but mean
# something else
DOCS = [
    {"id": "target", "t": "automobile purchase"},       # = "buy a car"
    {"id": "decoy1", "t": "storm warning tonight"},
    {"id": "decoy2", "t": "physician appointment"},
    {"id": "decoy3", "t": "joyful melody collection"},
]
QUERY = "buy car"


SIM = 0.35  # a hash of 'buy car' is ~orthogonal to 'automobile purchase'


def _vector_top(ctx, coll):
    out = coll.search({
        "term": QUERY, "mode": "vector", "similarity": SIM, "limit": 4,
    })
    return ids_of(out)


@pytest.mark.parametrize("model", ["SemanticMini", "SemanticBase"])
def test_semantic_ranking_through_engine(model):
    """Query 'buy car' must retrieve 'automobile purchase' FIRST via the
    trained encoder — EmbeddingQueue -> VectorIndex -> vector ranking
    end-to-end on real weights, using ONLY the registry name (the
    bundled checkpoints bind lazily in build_orama; no explicit
    register_* call here)."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection(embedding_model=model)
        idx = coll.create_index()
        idx.insert_documents(DOCS)
        ctx.commit_all()
        top = _vector_top(ctx, coll)
        assert top[0] == "target", top
    finally:
        ctx.close()


def test_hash_encoder_cannot_rank_synonyms():
    """The SAME search on the default hash encoder must NOT retrieve the
    zero-token-overlap target (its hash vectors are ~orthogonal, below
    the similarity bar the trained encoder clears easily) — the axis
    that makes the trained-checkpoint test meaningful."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection()  # default: hash encoder
        idx = coll.create_index()
        idx.insert_documents(DOCS)
        ctx.commit_all()
        top = _vector_top(ctx, coll)
        assert "target" not in top, top
    finally:
        ctx.close()


def test_hybrid_semantic_lift():
    """Hybrid mode with trained vectors surfaces the semantic target for
    a query with zero lexical overlap (fulltext contributes nothing) —
    on the engine-default trained checkpoint."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection(embedding_model="SemanticBase")
        idx = coll.create_index()
        idx.insert_documents(DOCS)
        ctx.commit_all()
        out = coll.search({
            "term": QUERY, "mode": "hybrid", "similarity": 0.0, "limit": 4,
        })
        assert ids_of(out)[0] == "target", ids_of(out)
    finally:
        ctx.close()
