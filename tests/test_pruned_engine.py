"""Engine-level parity for the pruned two-phase scoring path.

With `reader_side.pruning = "on"` the ReadSide routes eligible fused
searches through ops/pruned.py (search_exec.PrunedPlanMixin). On small
corpora the prefix (8192) and candidate budget (1024) cover everything,
so hits and scores must match the dense path EXACTLY; match counts are
union-probability estimates on the pruned path (documented in
config.ReaderSideConfig.pruning) and are only sanity-checked.
"""

import numpy as np
import pytest

import oramacore_tpu.index.vector_index as vi
from oramacore_tpu.types import SearchParams

from .utils import TestContext, ids_of

_SYL = ["ba", "de", "fi", "go", "ku", "lo", "mi", "na", "po", "ra", "su",
        "ti"]
VOCAB = ["apple", "banana", "cherry", "fig", "grape", "kiwi", "lemon",
         "mango"] + [a + b for a in _SYL for b in _SYL]


def _docs(n, seed=0):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        words = rng.choice(VOCAB, size=6, replace=False)
        docs.append({
            "id": str(i),
            "t": " ".join(words),
            "_omc": 1.5 if i % 9 == 0 else 1.0,
        })
    return docs


def _search_both(ctx, coll, params):
    """Run the same search with pruning off then on."""
    ctx.reader.config.reader_side.pruning = "off"
    dense = coll.search(dict(params))
    ctx.reader.config.reader_side.pruning = "on"
    try:
        pruned = coll.search(dict(params))
    finally:
        ctx.reader.config.reader_side.pruning = "off"
    return dense, pruned


def _assert_hits_equal(dense, pruned):
    assert ids_of(dense) == ids_of(pruned)
    ds = [h.score for h in dense.hits]
    ps = [h.score for h in pruned.hits]
    assert np.allclose(ds, ps, rtol=1e-5, atol=1e-6), (ds, ps)


def test_pruned_fulltext_engine_parity():
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(_docs(500))
        ctx.commit_all()

        for params in (
            {"term": "apple banana", "limit": 10},
            {"term": "apple kude bade", "limit": 10, "threshold": 0.6},
            {"term": "apple", "limit": 5, "exact": True},
            {"term": "cherry grape", "limit": 10,
             "boost": {"t": 2.0}},
        ):
            dense, pruned = _search_both(ctx, coll, params)
            _assert_hits_equal(dense, pruned)
            # pruned counts are estimates but never below the hit count
            assert pruned.count >= len(pruned.hits)
            assert not dense.count_estimated
            # thresholded queries fall back to the dense exact path
            if params.get("threshold") is None:
                assert pruned.count_estimated, params
            else:
                assert not pruned.count_estimated, params
    finally:
        ctx.close()


def test_pruned_skips_filtered_searches():
    """Filters fall back to the dense path (filtered-df IDF semantics)
    — results must match regardless of the pruning flag."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = _docs(300)
        for i, d in enumerate(docs):
            d["n"] = i % 7
        idx.insert_documents(docs)
        ctx.commit_all()
        params = {
            "term": "apple banana",
            "limit": 10,
            "where": {"n": {"lt": 4}},
        }
        dense, pruned = _search_both(ctx, coll, params)
        _assert_hits_equal(dense, pruned)
        assert dense.count == pruned.count  # same (dense) path
    finally:
        ctx.close()


def test_pruned_hybrid_int8_engine_parity(monkeypatch):
    monkeypatch.setattr(vi, "IVF_MIN_ROWS", 600)
    monkeypatch.setattr(vi, "IVF_NPROBE", 16)
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = _docs(900, seed=3)
        for s in range(0, 900, 300):
            idx.insert_documents(docs[s:s + 300])
        ctx.commit_all()
        params = {
            "term": "apple banana",
            "mode": "hybrid",
            "limit": 10,
            "similarity": 0.05,
        }
        dense, pruned = _search_both(ctx, coll, params)
        # the IVF probe nominates identical vector candidates on both
        # paths and the fulltext budget covers the corpus -> identical
        # rankings; scores may differ only via the fusion span source
        assert ids_of(dense)[:5] == ids_of(pruned)[:5]
        ds = [h.score for h in dense.hits]
        ps = [h.score for h in pruned.hits]
        assert np.allclose(ds, ps, rtol=1e-3, atol=1e-4), (ds, ps)
    finally:
        ctx.close()


def test_pruned_pagination_and_match_all():
    """Deep pagination beyond the candidate budget falls back to dense;
    empty term (match-all) never routes through pruning."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(_docs(200))
        ctx.commit_all()
        dense, pruned = _search_both(
            ctx, coll, {"term": "apple", "limit": 5, "offset": 400}
        )
        assert ids_of(dense) == ids_of(pruned)
        dense, pruned = _search_both(ctx, coll, {"term": "", "limit": 3})
        assert dense.count == pruned.count == 200
    finally:
        ctx.close()


def test_pruned_with_engaged_prefix_blocks():
    """A term with df > PREFIX_LEN (8192) gets an impact-prefix side
    block at commit; the pruned path must nominate from the block and
    still agree with the dense path on the top page."""
    import oramacore_tpu.index.string_index as si

    ctx = TestContext()
    try:
        # keep everything in ONE segment (the per-collection operation
        # threshold would otherwise auto-commit at 10k ops and split the
        # heavy term across segments — each below PREFIX_LEN, correctly
        # covered WHOLE by the nomination pool instead of via a block)
        ctx.config.reader_side.operation_threshold = 10**9
        coll = ctx.create_collection()
        idx = coll.create_index()
        rng = np.random.default_rng(17)
        n = 11000
        batch = []
        for i in range(n):
            words = ["common"]  # df 11000 > PREFIX_LEN
            if i % 3 == 0:
                words.append("secondary")
            # i-dependent field length de-ties scores (tie groups order
            # arbitrarily between the dense and candidate top-k)
            words += [f"u{i}x{j}" for j in range(i % 23)]
            batch.append({"id": str(i), "t": " ".join(words)})
            if len(batch) == 2000:
                idx.insert_documents(batch)
                batch = []
        if batch:
            idx.insert_documents(batch)
        ctx.commit_all()
        ridx = next(iter(
            ctx.reader.collections[coll.collection_id].indexes.values()
        ))
        # the side block exists for the heavy term
        sidx = ridx.string
        sidx.slab()
        assert any(
            term == "common" for (_p, term) in sidx._slab_prefix_ranges
        ), "prefix block missing for heavy term"
        for params in (
            {"term": "common secondary", "limit": 10},
            {"term": "common", "limit": 10},
        ):
            dense, pruned = _search_both(ctx, coll, params)
            ds = [h.score for h in dense.hits]
            ps = [h.score for h in pruned.hits]
            # rank-for-rank score parity (the top ranks are a large
            # exact-tie group — 'common secondary' docs with minimal
            # field length — whose members order arbitrarily, so id
            # equality is not meaningful here; the scores are)
            assert np.allclose(ds, ps, rtol=1e-4), (params, ds, ps)
            assert len(ps) == 10 and pruned.count >= len(ps)
    finally:
        ctx.close()


def test_pruned_multi_field_union_df_parity():
    """Two string fields with overlapping vocabulary: the pruned path's
    device df must equal the dense path's cross-field UNION df
    (reference token_score.rs corpus_docs set) — a posting whose doc
    already matched in an earlier field must not double-count."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        rng = np.random.default_rng(23)
        docs = []
        for i in range(400):
            w1 = rng.choice(VOCAB, size=4, replace=False).tolist()
            # heavy overlap: the SAME words often appear in both fields
            w2 = rng.choice(w1 + VOCAB[:8], size=3, replace=False).tolist()
            docs.append({
                "id": str(i),
                "title": " ".join(w1),
                "body": " ".join(w2) + f" u{i}",
            })
        idx.insert_documents(docs)
        ctx.commit_all()
        for params in (
            {"term": "apple banana", "limit": 10},
            {"term": "cherry", "limit": 10},
            {"term": "grape kiwi mango", "limit": 10,
             "boost": {"title": 2.0}},
            {"term": "apple", "limit": 10, "exact": True},
        ):
            dense, pruned = _search_both(ctx, coll, params)
            _assert_hits_equal(dense, pruned)
    finally:
        ctx.close()


def test_pruned_exact_count_opt_in():
    """"exactCount": true (or reader_side.pruned_exact_counts) runs the
    counting dispatch: pruned counts EQUAL the dense counts exactly —
    including multi-field doc dedup — and the result is no longer
    flagged count_estimated. Thresholded queries become pruned-eligible
    under exact counts (the estimate was the only blocker)."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        rng = np.random.default_rng(31)
        docs = []
        for i in range(400):
            w1 = rng.choice(VOCAB, size=4, replace=False).tolist()
            w2 = rng.choice(w1 + VOCAB[:8], size=3, replace=False).tolist()
            docs.append({
                "id": str(i),
                "title": " ".join(w1),
                "body": " ".join(w2) + f" u{i}",
            })
        idx.insert_documents(docs)
        ctx.commit_all()
        for params in (
            {"term": "apple banana", "limit": 10},
            {"term": "cherry", "limit": 10},
            {"term": "apple", "limit": 10, "exact": True},
            {"term": "apple banana cherry", "limit": 10,
             "threshold": 0.6},
        ):
            dense, pruned = _search_both(
                ctx, coll, {**params, "exactCount": True}
            )
            _assert_hits_equal(dense, pruned)
            assert pruned.count == dense.count, params
            assert not pruned.count_estimated, params
        # config-level default engages it too
        ctx.reader.config.reader_side.pruning = "on"
        ctx.reader.config.reader_side.pruned_exact_counts = True
        try:
            viacfg = coll.search({"term": "apple banana", "limit": 10})
        finally:
            ctx.reader.config.reader_side.pruning = "off"
            ctx.reader.config.reader_side.pruned_exact_counts = False
        dense = coll.search({"term": "apple banana", "limit": 10})
        assert viacfg.count == dense.count
        assert not viacfg.count_estimated
    finally:
        ctx.close()
