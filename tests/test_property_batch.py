"""Randomized batch-vs-sequential equivalence (round-3 session 4).

`search_batch` must return exactly what per-query `search` returns for
EVERY batch — whether it rode the shared term-dedup pass, the pruned
kernels, the fused sorted dispatch, or fell back per query. Random
batches mix terms, filters, thresholds, exact mode, sorts (homogeneous
and mixed), offsets and empty terms over a corpus with tombstones and
missing sort fields.
"""

import numpy as np
import pytest

from oramacore_tpu.types import SearchParams

from .utils import TestContext

WORDS = ["red", "blue", "green", "fast", "slow", "big", "small", "old",
         "new", "round", "flat", "deep"]


@pytest.fixture(scope="module")
def ctx_corpus():
    ctx = TestContext()
    rng = np.random.default_rng(404)
    coll = ctx.create_collection()
    idx = coll.create_index()
    docs = []
    for i in range(180):
        d = {"id": str(i),
             "t": " ".join(rng.choice(WORDS, size=5, replace=False)),
             "n": int(i % 6)}
        if rng.random() < 0.75:
            d["price"] = float(rng.integers(0, 5))
        docs.append(d)
    idx.insert_documents(docs)
    ctx.commit_all()
    idx.delete_documents(
        [str(i) for i in rng.choice(180, size=25, replace=False)]
    )
    yield ctx, coll
    ctx.close()


def _rand_query(rng, sort_cfg):
    q = {}
    r = rng.random()
    if r < 0.12:
        q["term"] = ""
    else:
        n = int(rng.integers(1, 4))
        q["term"] = " ".join(rng.choice(WORDS, size=n, replace=False))
        if rng.random() < 0.15 and n > 1:
            q["threshold"] = 0.6
        if rng.random() < 0.15:
            q["exact"] = True
    if rng.random() < 0.35:
        q["where"] = {"n": {"lt": int(rng.integers(1, 6))}}
    if sort_cfg is not None:
        q["sort_by"] = dict(sort_cfg)
    q["limit"] = int(rng.integers(1, 15))
    if rng.random() < 0.3:
        q["offset"] = int(rng.integers(0, 5))
    return q


def test_random_batches_match_sequential(ctx_corpus):
    ctx, coll = ctx_corpus
    rng = np.random.default_rng(99)
    for trial in range(25):
        r = rng.random()
        if r < 0.35:
            sort_cfg = {
                "property": "price",
                "order": "desc" if rng.random() < 0.5 else "asc",
            }
            batch = [_rand_query(rng, sort_cfg) for _ in range(4)]
        elif r < 0.45:
            # mixed sorts: forced per-query fallback must still agree
            batch = [
                _rand_query(rng, {"property": "price", "order": "asc"}),
                _rand_query(rng, {"property": "price", "order": "desc"}),
                _rand_query(rng, None),
            ]
        else:
            batch = [_rand_query(rng, None) for _ in range(5)]
        # homogeneity the shared path requires; randomize it batch-wide
        if rng.random() < 0.5:
            for q in batch:
                q.pop("exact", None)
        seq = [
            ctx.reader.search(
                coll.collection_id, coll.read_key,
                SearchParams.from_json(dict(q)),
            )
            for q in batch
        ]
        got = ctx.reader.search_batch(
            coll.collection_id, coll.read_key,
            [SearchParams.from_json(dict(q)) for q in batch],
        )
        for s, g, q in zip(seq, got, batch):
            assert [h.id for h in s.hits] == [h.id for h in g.hits], (
                trial, q, [h.id for h in s.hits], [h.id for h in g.hits],
            )
            for hs, hg in zip(s.hits, g.hits):
                assert hg.score == pytest.approx(hs.score, rel=1e-4), (
                    trial, q,
                )
            if not s.count_estimated and not g.count_estimated:
                assert s.count == g.count, (trial, q)
