"""Flax TPU encoder exercised end-to-end with a REAL BERT checkpoint
(locally created — zero-egress environments cannot download trained
weights, so correctness is proven by PARITY against torch's BertModel
running the SAME weights; reference keeps real ONNX models in CI,
SURVEY §4).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

@pytest.fixture(autouse=True, scope="module")
def _restore_backend_registry():
    """register_flax_backend mutates the global backend/model registries;
    other tests rely on 'flax' being absent (hash fallback)."""
    import oramacore_tpu.embeddings as emb

    backends = dict(emb._BACKENDS)
    models = dict(emb.MODELS)
    yield
    emb._BACKENDS.clear()
    emb._BACKENDS.update(backends)
    emb.MODELS.clear()
    emb.MODELS.update(models)


VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] the quick brown fox jumps over lazy "
    "dog search engine vector hybrid orange banana apple fruit salad "
    "wireless headphones noise cancelling price cheap expensive "
    "##s ##ing ##ed a an of to in is was"
).split()


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    """Tiny randomly-initialized BERT saved as a real HF checkpoint."""
    path = tmp_path_factory.mktemp("tiny-bert")
    cfg = transformers.BertConfig(
        vocab_size=len(VOCAB),
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    model.eval()
    model.save_pretrained(path)
    vocab_file = path / "vocab.txt"
    vocab_file.write_text("\n".join(VOCAB))
    tok = transformers.BertTokenizer(str(vocab_file))
    tok.save_pretrained(path)
    return str(path), model, tok


def test_flax_forward_matches_torch(checkpoint):
    """The jitted jax forward (embeddings -> blocks -> mean pool -> L2)
    must reproduce torch BertModel + mean pooling on the same weights."""
    path, model, tok = checkpoint
    from oramacore_tpu.embeddings.flax_encoder import FlaxTextEncoder

    enc = FlaxTextEncoder(path)
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "wireless headphones noise cancelling",
        "orange banana apple fruit salad",
    ]
    ours = np.stack(enc.encode(texts))

    with torch.no_grad():
        t = tok(texts, padding=True, truncation=True, max_length=64,
                return_tensors="pt")
        out = model(**t).last_hidden_state
        mask = t["attention_mask"].unsqueeze(-1).float()
        pooled = (out * mask).sum(1) / mask.sum(1).clamp(min=1e-9)
        ref = torch.nn.functional.normalize(pooled, dim=-1).numpy()

    # bf16-free f32 path: near-exact parity
    cos = np.sum(ours * ref, axis=1)
    assert np.all(cos > 0.9999), cos


def test_flax_backend_through_engine(checkpoint, tmp_path):
    """Vector + hybrid search through the full engine with the flax
    transformer backend (not the hash encoder)."""
    path, _, _ = checkpoint
    from oramacore_tpu.config import OramacoreConfig
    from oramacore_tpu.embeddings import MODELS, ModelInfo, register_model
    from oramacore_tpu.runtime import build_orama
    from oramacore_tpu.types import SearchParams

    register_model(ModelInfo("tiny-flax-32", 32, seq_len=32, backend="flax"))
    cfg = OramacoreConfig()
    cfg.data_dir = str(tmp_path)
    cfg.auth.master_api_key = "mk"
    cfg.ai.embeddings_model = "tiny-flax-32"
    cfg.ai.embeddings_model_path = path
    cfg.writer_side.default_embedding_model = "tiny-flax-32"
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.insert_batch_commit_size = 10_000_000
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=False)
    try:
        coll = orama.write_side.create_collection(
            "mk", "c", embedding_model="tiny-flax-32"
        )
        orama.write_side.create_index("c", coll.write_api_key, "main")
        orama.write_side.insert_documents(
            "c", "main", coll.write_api_key,
            [
                {"id": "1", "t": "the quick brown fox"},
                {"id": "2", "t": "wireless headphones noise cancelling"},
                {"id": "3", "t": "orange banana fruit salad"},
            ],
        )
        orama.write_side.embedding_queue.flush_and_wait()
        orama.read_side.pump()
        idx = orama.read_side.collections["c"].indexes["main"]
        assert idx.vector is not None and idx.vector.config.dim == 32
        assert idx.vector.n_rows() == 3
        # identical text embeds identically -> its own vector is rank 1
        out = orama.read_side.search(
            "c", coll.read_api_key,
            SearchParams.from_json({
                "mode": "vector", "term": "wireless headphones noise cancelling",
                "similarity": 0.0,
            }),
        )
        assert out.hits and out.hits[0].id.endswith(":2")
        assert out.hits[0].score == pytest.approx(1.0, abs=1e-3)
        # hybrid also runs through the fused path with the flax backend
        out = orama.read_side.search(
            "c", coll.read_api_key,
            SearchParams.from_json({
                "mode": "hybrid", "term": "orange banana fruit salad",
                "similarity": 0.0,
            }),
        )
        assert out.hits and out.hits[0].id.endswith(":3")
    finally:
        orama.stop()


def test_per_model_backend_binding():
    """A checkpoint registered for one model binds only that registry
    entry; other flax models keep the shared/hash fallback (reference
    keeps a per-model registry, embeddings/models.py)."""
    import numpy as np

    from oramacore_tpu import embeddings as emb

    calls = []

    def fake_backend(texts, info):
        calls.append((info.name, list(texts)))
        return [np.full(info.dim, 0.5, np.float32) for _ in texts]

    emb.register_backend("flax:BGESmall", fake_backend)
    try:
        svc = emb.EmbeddingsService()
        out = svc.calculate_embeddings(["hello"], emb.Intent.QUERY, "BGESmall")
        assert calls and calls[0][0] == "BGESmall"
        assert out[0][0].shape == (384,)
        # a different flax model does NOT hit the bound checkpoint
        n_before = len(calls)
        svc.calculate_embeddings(["hello"], emb.Intent.QUERY, "BGEBase")
        assert len(calls) == n_before
    finally:
        emb._BACKENDS.pop("flax:BGESmall", None)


def test_config_per_model_paths_field():
    from oramacore_tpu.config import OramacoreConfig

    cfg = OramacoreConfig()
    assert cfg.ai.embeddings_model_paths == {}
    cfg.ai.embeddings_model_paths = {"BGESmall": "/weights/bge-small"}
    assert cfg.ai.embeddings_model_paths["BGESmall"] == "/weights/bge-small"
