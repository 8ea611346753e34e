"""Flax/JAX BERT-family text encoder — TPU-native embedding inference.

Replaces the reference's ONNX/fastembed GPU inference
(src/python/scripts/src/embeddings/: fastembed/onnxruntime + mean
pooling) with a pure-JAX encoder that runs on the TPU: HF BERT-family
weights (BGE, E5, MiniLM are all BERT encoders) are converted from a
local `transformers` checkpoint to jax arrays once, and the forward pass
(embeddings → N transformer blocks → mean pooling → L2 norm) is one
jitted function with bucketed sequence lengths.

Weights must already be on disk (zero-egress environments cannot
download); `load_flax_encoder` returns None when unavailable and callers
fall back to the hash backend.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger("oramacore_tpu.embeddings.flax")


def _convert_bert_weights(state_dict) -> Dict:
    """Torch BERT state dict → nested jax param dict."""
    import jax.numpy as jnp

    def g(name):
        return jnp.asarray(state_dict[name].numpy())

    params = {
        "tok_emb": g("embeddings.word_embeddings.weight"),
        "pos_emb": g("embeddings.position_embeddings.weight"),
        "type_emb": g("embeddings.token_type_embeddings.weight"),
        "emb_ln_g": g("embeddings.LayerNorm.weight"),
        "emb_ln_b": g("embeddings.LayerNorm.bias"),
        "layers": [],
    }
    i = 0
    while f"encoder.layer.{i}.attention.self.query.weight" in state_dict:
        p = f"encoder.layer.{i}."
        params["layers"].append(
            {
                "q_w": g(p + "attention.self.query.weight").T,
                "q_b": g(p + "attention.self.query.bias"),
                "k_w": g(p + "attention.self.key.weight").T,
                "k_b": g(p + "attention.self.key.bias"),
                "v_w": g(p + "attention.self.value.weight").T,
                "v_b": g(p + "attention.self.value.bias"),
                "o_w": g(p + "attention.output.dense.weight").T,
                "o_b": g(p + "attention.output.dense.bias"),
                "attn_ln_g": g(p + "attention.output.LayerNorm.weight"),
                "attn_ln_b": g(p + "attention.output.LayerNorm.bias"),
                "ffn_w1": g(p + "intermediate.dense.weight").T,
                "ffn_b1": g(p + "intermediate.dense.bias"),
                "ffn_w2": g(p + "output.dense.weight").T,
                "ffn_b2": g(p + "output.dense.bias"),
                "ffn_ln_g": g(p + "output.LayerNorm.weight"),
                "ffn_ln_b": g(p + "output.LayerNorm.bias"),
            }
        )
        i += 1
    return params


def bert_forward(params: Dict, input_ids, attention_mask, *,
                 n_heads: int):
    """Functional BERT-family forward: embeddings → blocks → mean pool
    → L2 norm. Shared by inference (FlaxTextEncoder) and the in-image
    contrastive training loop (scripts/train_semantic_encoder_v2.py) so
    the trained weights run EXACTLY the serving math (reference keeps
    train/serve parity via ONNX export, embeddings.py:45)."""
    import jax
    import jax.numpy as jnp

    p = params
    B, L = input_ids.shape
    H = n_heads
    D = p["tok_emb"].shape[1]
    hd = D // H

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
        q = (x @ layer["q_w"] + layer["q_b"]).reshape(B, L, H, hd)
        k = (x @ layer["k_w"] + layer["k_b"]).reshape(B, L, H, hd)
        v = (x @ layer["v_w"] + layer["v_b"]).reshape(B, L, H, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        att = jax.nn.softmax(att + neg, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, L, D)
        x = ln(x + ctx @ layer["o_w"] + layer["o_b"],
               layer["attn_ln_g"], layer["attn_ln_b"])
        ffn = jax.nn.gelu(x @ layer["ffn_w1"] + layer["ffn_b1"])
        x = ln(x + ffn @ layer["ffn_w2"] + layer["ffn_b2"],
               layer["ffn_ln_g"], layer["ffn_ln_b"])

    # mean pooling over attended tokens (reference embeddings.py)
    mask = attention_mask[:, :, None].astype(x.dtype)
    pooled = jnp.sum(x * mask, axis=1) / jnp.maximum(
        jnp.sum(mask, axis=1), 1e-9
    )
    return pooled / jnp.maximum(
        jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9
    )


class FlaxTextEncoder:
    """Batched mean-pooled BERT encoder, jitted per (B, L) bucket."""

    def __init__(self, model_path: str, n_heads: Optional[int] = None):
        from transformers import AutoConfig, AutoModel, AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(
            model_path, local_files_only=True
        )
        cfg = AutoConfig.from_pretrained(model_path, local_files_only=True)
        model = AutoModel.from_pretrained(
            model_path, local_files_only=True
        )
        self.n_heads = n_heads or cfg.num_attention_heads
        self.dim = cfg.hidden_size
        self.max_len = min(cfg.max_position_embeddings, 512)
        self.params = _convert_bert_weights(model.state_dict())
        del model

    @partial(__import__("jax").jit, static_argnums=(0,))
    def _forward(self, input_ids, attention_mask):
        return bert_forward(
            self.params, input_ids, attention_mask, n_heads=self.n_heads
        )

    def encode(self, texts: List[str]) -> List[np.ndarray]:
        import jax.numpy as jnp

        from ..ops.bm25 import round_up_pow2

        if not texts:
            return []
        enc = self.tokenizer(
            list(texts), padding=True, truncation=True,
            max_length=self.max_len, return_tensors="np",
        )
        ids = enc["input_ids"]
        mask = enc["attention_mask"]
        B, L = ids.shape
        Lb = min(round_up_pow2(L, 16), self.max_len)
        Bb = round_up_pow2(B, 1)
        ids_p = np.zeros((Bb, Lb), ids.dtype)
        mask_p = np.zeros((Bb, Lb), mask.dtype)
        ids_p[:B, :L] = ids[:, :Lb]
        mask_p[:B, :L] = mask[:, :Lb]
        out = self._forward(jnp.asarray(ids_p), jnp.asarray(mask_p))
        return [np.asarray(v) for v in np.asarray(out[:B])]


_ENCODERS: Dict[str, FlaxTextEncoder] = {}


def load_flax_encoder(model_path: str) -> Optional[FlaxTextEncoder]:
    """Load (and cache) an encoder; None when weights/tokenizer missing."""
    if model_path in _ENCODERS:
        return _ENCODERS[model_path]
    try:
        enc = FlaxTextEncoder(model_path)
        _ENCODERS[model_path] = enc
        return enc
    except Exception as e:  # noqa: BLE001
        logger.warning("flax encoder unavailable for %s: %s", model_path, e)
        return None


def register_flax_backend(model_path: str,
                          model_name: Optional[str] = None) -> bool:
    """Register the 'flax' embeddings backend bound to a local checkpoint.

    With `model_name`, the checkpoint binds to that registry entry only
    (backend key "flax:<name>" — the per-model registry of the reference,
    src/python/scripts/src/embeddings/models.py model groups); without
    it, it becomes the shared default for every flax-backed model.
    Returns False (leaving the hash fallback) when loading fails."""
    enc = load_flax_encoder(model_path)
    if enc is None:
        return False
    from . import MODELS, ModelInfo, register_backend

    def backend(texts, info: ModelInfo):
        return enc.encode(list(texts))

    if model_name is not None:
        info = MODELS.get(model_name)
        dim = getattr(enc, "dim", None)
        if info is not None and dim is not None and info.dim != dim:
            logger.warning(
                "checkpoint %s has hidden size %s but model %s expects "
                "%s-d vectors; registering anyway",
                model_path, dim, model_name, info.dim,
            )
        register_backend(f"flax:{model_name}", backend)
    else:
        register_backend("flax", backend)
    return True


def register_flax_backend_lazy(model_path: str, model_name: str) -> None:
    """Bind a registry entry to a local checkpoint WITHOUT loading it:
    the encoder (and the `transformers` import behind it) loads on the
    first embedding request for that model. Used by runtime.build_orama
    for the bundled in-image trained checkpoints
    (models/semantic-{mini,base}) so engine boot stays fast for
    deployments that never select them. Falls back to the hash backend
    per call when the checkpoint cannot load."""
    from . import register_backend

    def backend(texts, info):
        enc = load_flax_encoder(model_path)
        if enc is None:
            from . import _hash_backend

            return _hash_backend(texts, info)
        return enc.encode(list(texts))

    register_backend(f"flax:{model_name}", backend)
