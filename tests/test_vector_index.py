import numpy as np
import pytest

from oramacore_tpu.embeddings import (
    EmbeddingsService,
    Intent,
    chunk_text,
    hash_encode,
)
from oramacore_tpu.index.vector_index import VectorIndex, VectorIndexConfig
from oramacore_tpu.ops.vector import l2_normalize


def mk_index(dim=16):
    return VectorIndex(VectorIndexConfig(dim=dim, model="test"))


def rand_vecs(n, dim, seed=0):
    rng = np.random.default_rng(seed)
    return l2_normalize(rng.normal(size=(n, dim)).astype(np.float32))


def brute_force(query, matrix, docs, k):
    scores = matrix @ query
    per_doc = {}
    for s, d in zip(scores, docs):
        per_doc[int(d)] = max(per_doc.get(int(d), -2.0), float(s))
    return sorted(per_doc.items(), key=lambda kv: -kv[1])[:k]


@pytest.mark.parametrize("committed", [False, True])
def test_flat_search_matches_bruteforce(committed):
    dim = 16
    idx = mk_index(dim)
    vecs = rand_vecs(100, dim)
    for i in range(100):
        idx.insert(i, [vecs[i]])
    if committed:
        idx.commit()
    q = vecs[7] * 0.9 + rand_vecs(1, dim, seed=9)[0] * 0.1
    q = l2_normalize(q)
    got = idx.search([q], limit=5, similarity=-1.0)
    expected = dict(brute_force(q, vecs, list(range(100)), 20))
    top_got = sorted(got.items(), key=lambda kv: -kv[1])[:5]
    top_exp = sorted(expected.items(), key=lambda kv: -kv[1])[:5]
    assert [d for d, _ in top_got] == [d for d, _ in top_exp]
    for (d1, s1), (d2, s2) in zip(top_got, top_exp):
        assert s1 == pytest.approx(s2, abs=2e-2)  # bf16 matmul tolerance


def test_multi_vector_docs_max_score():
    dim = 8
    idx = mk_index(dim)
    a = l2_normalize(np.ones(dim, np.float32))
    b = l2_normalize(-np.ones(dim, np.float32))
    idx.insert(0, [a, b])  # doc 0 has two chunks
    idx.insert(1, [b])
    got = idx.search([a], limit=2, similarity=-1.0)
    assert got[0] == pytest.approx(1.0, abs=1e-2)
    assert got[1] == pytest.approx(-1.0, abs=1e-2)


def test_similarity_threshold():
    dim = 8
    idx = mk_index(dim)
    a = l2_normalize(np.ones(dim, np.float32))
    idx.insert(0, [a])
    idx.insert(1, [l2_normalize(rand_vecs(1, dim, 3)[0])])
    got = idx.search([a], limit=10, similarity=0.95)
    assert 0 in got and 1 not in got


def test_filter_mask_pushdown():
    dim = 8
    idx = mk_index(dim)
    vecs = rand_vecs(20, dim)
    for i in range(20):
        idx.insert(i, [vecs[i]])
    mask = np.zeros(32, bool)
    mask[5] = True
    got = idx.search([vecs[3]], limit=5, similarity=-1.0, filter_mask=mask)
    assert set(got.keys()) == {5}


def test_delete_live():
    dim = 8
    idx = mk_index(dim)
    vecs = rand_vecs(4, dim)
    for i in range(4):
        idx.insert(i, [vecs[i]])
    idx.delete_doc_live(2)
    got = idx.search([vecs[2]], limit=4, similarity=-1.0)
    assert 2 not in got


def test_commit_with_tombstones():
    dim = 8
    idx = mk_index(dim)
    vecs = rand_vecs(4, dim)
    for i in range(4):
        idx.insert(i, [vecs[i]])
    idx.commit(deleted={1})
    got = idx.search([vecs[1]], limit=4, similarity=-1.0)
    assert 1 not in got and len(got) == 3


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------

def test_chunking_overlap():
    text = " ".join(f"w{i}" for i in range(1000))
    chunks = chunk_text(text, seq_len=512, overlap=0.02)
    assert len(chunks) == 2
    # 2% overlap: second chunk starts at 501
    assert chunks[1].split()[0] == "w501"


def test_hash_encoder_similarity_contract():
    a = hash_encode("the quick brown fox jumps", 384)
    b = hash_encode("a quick brown fox leaps", 384)
    c = hash_encode("quantum chromodynamics lattice gauge", 384)
    assert a @ b > a @ c
    assert np.linalg.norm(a) == pytest.approx(1.0, abs=1e-5)


def test_embeddings_service_multivector():
    svc = EmbeddingsService()
    long_text = " ".join(f"token{i}" for i in range(1200))
    out = svc.calculate_embeddings([long_text, "short"], Intent.PASSAGE)
    assert len(out) == 2
    assert len(out[0]) == 3  # 1200 tokens / ~502 step
    assert len(out[1]) == 1
    assert out[0][0].shape == (384,)


def test_e5_intent_prefix_changes_vector():
    svc = EmbeddingsService()
    # E5 models fall back to the hash backend in tests; prefix still applies
    q = svc.calculate_embeddings(["hello"], Intent.QUERY, "MultilingualE5Small")
    p = svc.calculate_embeddings(["hello"], Intent.PASSAGE, "MultilingualE5Small")
    assert not np.allclose(q[0][0], p[0][0])
