"""Native C++ hash-embedding encoder parity with the Python oracle.

The native encoder reimplements blake2b-8 (RFC 7693) + splitmix64 +
the feature-hash layout of embeddings.hash_encode; any hash or layout
drift scatters features into different buckets, so allclose on the
normalized vectors is a strong end-to-end check (including multi-block
blake2b via >128-byte words).
"""

import numpy as np
import pytest

from oramacore_tpu.embeddings import MODELS, _hash_backend, hash_encode
from oramacore_tpu.native import load_hash_encoder, native_hash_encode_batch

lib = load_hash_encoder()
pytestmark = pytest.mark.skipif(lib is None, reason="no C++ toolchain")

CASES = [
    "The quick brown fox jumps over the lazy dog",
    "action RPG with open world exploration and crafting 2024",
    "a",
    "",
    "!!! ??? ---",
    "repeated repeated repeated words words",
    "x" * 500,  # single word > 128 bytes: multi-block blake2b
    ("w " * 300).strip(),  # many bigrams
    "MIXED Case And DIGITS 123 456seven",
]


def test_encode_parity_on_cases():
    for dim in (64, 384):
        want = np.stack([hash_encode(t, dim) for t in CASES])
        got = native_hash_encode_batch(lib, CASES, dim)
        assert np.allclose(got, want, atol=1e-6), dim


def test_encode_parity_on_corpus():
    import json

    docs = json.load(open("/root/reference/benches/games.json"))
    texts = [d["description"] for d in docs[:200] if d["description"].isascii()]
    assert len(texts) > 100
    want = np.stack([hash_encode(t, 128) for t in texts])
    got = native_hash_encode_batch(lib, texts, 128)
    assert np.allclose(got, want, atol=1e-6)


def test_backend_routes_non_ascii_to_oracle():
    info = MODELS["builtin-minihash-384"]
    texts = ["plain ascii text", "caffè è buonissimo ☕", "日本語のテキスト"]
    got = _hash_backend(texts, info)
    for t, v in zip(texts, got):
        assert np.allclose(v, hash_encode(t, info.dim), atol=1e-6), t
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5 or not np.any(v)
