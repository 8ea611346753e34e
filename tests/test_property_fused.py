"""Randomized equivalence for the fused search paths (round-3 session 4).

Oracle: appending `group_by` with maxResults > 64 to any search
forces the legacy dense dict flow (fused_ok=False; r5 note — a plain
group_by no longer forces anything, the device group path covers it)
WITHOUT changing the ranked page, the match count, or facet values —
so every random search must agree with its group_by-forced twin
across:

- fused facet bitmaps (fulltext + hybrid, filtered quirk included)
- fused sort-by (device sort column, fieldless tail, ties)
- vectorized match-all (empty term: paging/count/facets/sorted browse)
- tombstone presence masks

Randomization covers missing fields, deletes, filters, thresholds,
offsets and both sort directions.
"""

import numpy as np
import pytest

from .utils import TestContext

WORDS = ["red", "blue", "green", "fast", "slow", "big", "small", "old",
         "new", "round"]
CATS = ["a", "b", "c"]


@pytest.fixture(scope="module")
def ctx_corpus():
    ctx = TestContext()
    rng = np.random.default_rng(2026)
    coll = ctx.create_collection()
    idx = coll.create_index()
    docs = []
    for i in range(220):
        d = {"id": str(i),
             "t": " ".join(rng.choice(WORDS, size=4, replace=False))}
        if rng.random() < 0.8:
            d["price"] = float(rng.integers(0, 7))  # many ties
        if rng.random() < 0.9:
            d["cat"] = str(rng.choice(CATS))
        d["n"] = int(i % 6)
        docs.append(d)
    idx.insert_documents(docs)
    ctx.commit_all()
    gone = [str(i) for i in rng.choice(220, size=30, replace=False)]
    idx.delete_documents(gone)
    yield ctx, coll
    ctx.close()


def _random_query(rng):
    q = {}
    r = rng.random()
    if r < 0.25:
        q["term"] = ""                      # match-all browse
    else:
        n = int(rng.integers(1, 4))
        q["term"] = " ".join(rng.choice(WORDS, size=n, replace=False))
        if rng.random() < 0.2 and n > 1:
            q["threshold"] = 0.6
    if rng.random() < 0.4:
        q["where"] = {"n": {"lt": int(rng.integers(1, 6))}}
    if rng.random() < 0.35:
        q["sort_by"] = {
            "property": "price",
            "order": "desc" if rng.random() < 0.5 else "asc",
        }
    if rng.random() < 0.35:
        q["facets"] = {"cat": {}}
    q["limit"] = int(rng.integers(1, 25))
    if rng.random() < 0.3:
        q["offset"] = int(rng.integers(0, 8))
    if rng.random() < 0.2:
        q["mode"] = "hybrid"
        q["similarity"] = 0.2
    return q


def test_fused_paths_match_forced_dense(ctx_corpus):
    ctx, coll = ctx_corpus
    rng = np.random.default_rng(77)
    for trial in range(40):
        q = _random_query(rng)
        fused = coll.search(dict(q))
        forced = coll.search({**q, "group_by": {
            "properties": ["cat"], "max_results": 100}})
        fids = [(h.id, round(h.score, 5)) for h in fused.hits]
        dids = [(h.id, round(h.score, 5)) for h in forced.hits]
        assert fids == dids, (trial, q, fids, dids)
        if not fused.count_estimated and not forced.count_estimated:
            assert fused.count == forced.count, (trial, q)
        if "facets" in q:
            assert (fused.facets["cat"].values
                    == forced.facets["cat"].values), (trial, q)
