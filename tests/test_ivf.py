"""IVF clustered vector search: recall vs exact (BASELINE config 4)."""

import numpy as np
import pytest

import oramacore_tpu.index.vector_index as vi
from oramacore_tpu.index.vector_index import VectorIndex, VectorIndexConfig
from oramacore_tpu.ops.vector import l2_normalize


@pytest.fixture()
def small_ivf(monkeypatch):
    monkeypatch.setattr(vi, "IVF_MIN_ROWS", 2000)
    monkeypatch.setattr(vi, "IVF_NPROBE", 8)
    yield


def clustered_corpus(n, dim, n_clusters=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = l2_normalize(rng.normal(size=(n_clusters, dim)).astype(np.float32))
    assign = rng.integers(0, n_clusters, n)
    vecs = centers[assign] + 0.15 * rng.normal(size=(n, dim)).astype(np.float32)
    return l2_normalize(vecs.astype(np.float32))


def test_ivf_activates_and_recall(small_ivf):
    dim, n = 32, 4000
    vecs = clustered_corpus(n, dim)
    idx = VectorIndex(VectorIndexConfig(dim=dim))
    for i in range(n):
        idx.insert(i, [vecs[i]])
    idx.commit()
    assert idx._ivf is not None, "IVF should build above the row threshold"

    rng = np.random.default_rng(7)
    queries = l2_normalize(
        vecs[rng.choice(n, 20)] + 0.05 * rng.normal(size=(20, dim)).astype(np.float32)
    )
    k = 10
    recalls = []
    for q in queries:
        exact = set(np.argsort(-(vecs @ q))[:k].tolist())
        got = idx.search([q], limit=k, similarity=-1.0)
        approx = set(
            d for d, _ in sorted(got.items(), key=lambda kv: -kv[1])[:k]
        )
        recalls.append(len(exact & approx) / k)
    mean_recall = float(np.mean(recalls))
    assert mean_recall >= 0.95, f"IVF recall@10 {mean_recall:.3f} < 0.95"


def test_ivf_with_live_inserts_falls_back_to_flat(small_ivf):
    dim, n = 16, 2500
    vecs = clustered_corpus(n, dim, seed=3)
    idx = VectorIndex(VectorIndexConfig(dim=dim))
    for i in range(n):
        idx.insert(i, [vecs[i]])
    idx.commit()
    assert idx._ivf is not None
    # live insert after commit → search must still see both layers
    new_vec = l2_normalize(np.ones(dim, np.float32))
    idx.insert(n, [new_vec])
    got = idx.search([new_vec], limit=5, similarity=-1.0)
    assert n in got
    assert got[n] == pytest.approx(1.0, abs=2e-2)


def test_ivf_filter_pushdown(small_ivf):
    dim, n = 16, 2500
    vecs = clustered_corpus(n, dim, seed=4)
    idx = VectorIndex(VectorIndexConfig(dim=dim))
    for i in range(n):
        idx.insert(i, [vecs[i]])
    idx.commit()
    mask = np.zeros(n, bool)
    mask[:100] = True
    got = idx.search([vecs[50]], limit=10, similarity=-1.0, filter_mask=mask)
    assert got and all(d < 100 for d in got)
    assert 50 in got


def test_ivf_oversized_cluster_splits_into_units(small_ivf, monkeypatch):
    dim, n = 16, 3000
    rng = np.random.default_rng(9)
    # 95% of vectors IDENTICAL -> k-means cannot split them across
    # centroids, so that cluster is far larger than the probe window
    hub = l2_normalize(rng.normal(size=(1, dim)).astype(np.float32))
    rest = l2_normalize(rng.normal(size=(n // 20, dim)).astype(np.float32))
    vecs = np.concatenate([
        np.repeat(hub, n - len(rest), axis=0),
        rest,
    ])
    idx = VectorIndex(VectorIndexConfig(dim=dim))
    for i in range(len(vecs)):
        idx.insert(i, [vecs[i]])
    idx.commit()
    # few centroids -> the hub cluster must span MULTIPLE probe units
    idx._build_ivf(n_centroids=4)
    assert idx._ivf is not None
    n_units = len(idx._ivf["unit_starts"])
    assert n_units > 4, "oversized cluster must split into sub-block units"
    # a query equal to a vector deep in the oversized cluster still finds
    # SOME identical hub vector at ~1.0 (all hub rows are identical, so
    # any unit of the cluster returns a perfect match)
    got = idx.search([vecs[0]], limit=5, similarity=-1.0)
    assert got, "expected hits"
    assert max(got.values()) >= 0.95
    # the distinct tail vectors are individually reachable too
    tail_doc = n - 1
    got = idx.search([vecs[tail_doc]], limit=5, similarity=-1.0)
    assert tail_doc in got and got[tail_doc] >= 0.95


def test_int8_rerank_matches_exact_scores(small_ivf):
    """Candidates from the int8 probe are reranked against the original
    f32 rows: top-10 docs AND scores match the flat exact scan."""
    dim, n = 32, 4000
    vecs = clustered_corpus(n, dim, seed=11)
    idx = VectorIndex(VectorIndexConfig(dim=dim))
    for i in range(n):
        idx.insert(i, [vecs[i]])
    idx.commit()
    assert idx._ivf is not None

    rng = np.random.default_rng(5)
    queries = l2_normalize(
        vecs[rng.choice(n, 10)]
        + 0.05 * rng.normal(size=(10, dim)).astype(np.float32)
    )
    k = 10
    for q in queries:
        exact_scores = vecs @ q
        exact_top = np.argsort(-exact_scores)[:k]
        got = idx.search([q], limit=k, similarity=-1.0)
        ranked = sorted(got.items(), key=lambda kv: -kv[1])[:k]
        overlap = len({d for d, _ in ranked} & set(exact_top.tolist()))
        assert overlap >= k - 1  # candidate set nearly exact
        for d, s in ranked:
            # scores are the f32 exact values, not quantized estimates
            assert abs(s - float(exact_scores[d])) < 5e-3, (d, s)
