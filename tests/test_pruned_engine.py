"""Engine-level parity for the pruned two-phase scoring path.

With `reader_side.pruning = "on"` the ReadSide routes eligible fused
searches through ops/pruned.py (search_exec.PrunedPlanMixin). On small
corpora the prefix (65536 default since r5) and candidate budget cover
everything, so hits and scores must match the dense path EXACTLY; match counts are
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


def _spy_pruned(monkeypatch):
    """Record search_topk_pruned calls (the single-device pruned
    dispatch) so tests can prove the pruned path actually engaged."""
    from oramacore_tpu.index import search_exec

    calls = []
    orig = search_exec.PrunedPlanMixin.search_topk_pruned

    def spy(self, *a, **kw):
        calls.append({"mask": kw.get("mask")})
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "search_topk_pruned", spy
    )
    return calls


def test_pruned_filtered_small_filter_exact(monkeypatch):
    """A where-filter selecting <= PRUNED_CANDIDATES docs rides the
    pruned path in cand-given mode: the filtered doc set IS the
    candidate list, so hits AND counts are exact (not estimate-flagged)
    — filtered-df IDF semantics match the dense path bit-for-bit."""
    calls = _spy_pruned(monkeypatch)
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
        assert dense.count == pruned.count
        assert not pruned.count_estimated  # cand-given counts are exact
        assert len(calls) == 1 and calls[0]["mask"] is not None
    finally:
        ctx.close()


def test_pruned_filtered_large_filter(monkeypatch):
    """A filter wider than the candidate budget uses masked nomination:
    hits match dense (budget covers this corpus), counts are flagged
    estimates."""
    from oramacore_tpu.index import search_exec

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "PRUNED_CANDIDATES", 128
    )
    calls = _spy_pruned(monkeypatch)
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = _docs(400, seed=5)
        for i, d in enumerate(docs):
            d["n"] = i % 7
        idx.insert_documents(docs)
        ctx.commit_all()
        params = {
            "term": "apple banana",
            "limit": 10,
            "where": {"n": {"lt": 5}},  # ~285 in-filter docs > C=128
        }
        dense, pruned = _search_both(ctx, coll, params)
        _assert_hits_equal(dense, pruned)
        assert pruned.count_estimated
        assert pruned.count >= len(pruned.hits)
        assert len(calls) == 1 and calls[0]["mask"] is not None
    finally:
        ctx.close()


def test_pruned_tombstones_stay_pruned(monkeypatch):
    """Deletes must NOT silently demote the index to the dense path:
    the tombstone alive-mask rides the pruned kernels as a filter, and
    deleted docs never surface."""
    calls = _spy_pruned(monkeypatch)
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = _docs(300, seed=9)
        idx.insert_documents(docs)
        ctx.commit_all()
        # delete a third of the docs AFTER the commit -> tombstones
        gone = [str(i) for i in range(0, 300, 3)]
        idx.delete_documents(gone)
        params = {"term": "apple banana", "limit": 20}
        dense, pruned = _search_both(ctx, coll, params)
        _assert_hits_equal(dense, pruned)
        assert not set(ids_of(pruned)) & set(gone)
        assert len(calls) == 1 and calls[0]["mask"] is not None
    finally:
        ctx.close()


def test_pruned_filtered_threshold_small_filter(monkeypatch):
    """Thresholded queries are pruned-eligible when the small-filter
    cand-given path applies (thresholds are applied exactly there and
    the count is exact, so no estimate caveat)."""
    calls = _spy_pruned(monkeypatch)
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = _docs(300, seed=13)
        for i, d in enumerate(docs):
            d["n"] = i % 3
        idx.insert_documents(docs)
        ctx.commit_all()
        params = {
            "term": "apple banana cherry",
            "limit": 10,
            "threshold": 0.6,
            "where": {"n": {"eq": 1}},
        }
        dense, pruned = _search_both(ctx, coll, params)
        _assert_hits_equal(dense, pruned)
        assert dense.count == pruned.count
        assert not pruned.count_estimated
        assert len(calls) == 1 and calls[0]["mask"] is not None
    finally:
        ctx.close()


def test_pruned_filtered_hybrid_int8(monkeypatch):
    """Filtered hybrid at the int8/IVF tier rides the pruned kernels:
    the filter masks the fulltext side (filtered-df IDF) and drops
    out-of-filter probe hits; with a small filter both sides are exact
    over the filtered set."""
    monkeypatch.setattr(vi, "IVF_MIN_ROWS", 600)
    monkeypatch.setattr(vi, "IVF_NPROBE", 16)
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = _docs(900, seed=3)
        for i, d in enumerate(docs):
            d["n"] = i % 5
        for s in range(0, 900, 300):
            idx.insert_documents(docs[s:s + 300])
        ctx.commit_all()
        params = {
            "term": "apple banana",
            "mode": "hybrid",
            "limit": 10,
            "similarity": 0.05,
            "where": {"n": {"lt": 3}},
        }
        dense, pruned = _search_both(ctx, coll, params)
        assert ids_of(dense)[:5] == ids_of(pruned)[:5]
        ds = [h.score for h in dense.hits]
        ps = [h.score for h in pruned.hits]
        assert np.allclose(ds, ps, rtol=1e-3, atol=1e-4), (ds, ps)
        for h in pruned.hits:
            assert int(str(h.id).rsplit(":", 1)[-1]) % 5 < 3
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


def test_pruned_with_engaged_prefix_blocks(monkeypatch):
    """A term with df > PREFIX_LEN gets an impact-prefix side block at
    commit; the pruned path must nominate from the block and still
    agree with the dense path on the top page. PREFIX_LEN is pinned to
    8192 here (the engine default is 65536 since r5 — a 65k-df test
    corpus would be too slow on CPU)."""
    import oramacore_tpu.index.string_index as si

    monkeypatch.setattr(si, "PREFIX_LEN", 8192)
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


def _assert_hits_tieaware(dense, pruned, tol=1e-4):
    """Ranked parity allowing id swaps among NEAR-TIED scores: the
    pruned worklist accumulates contributions with a per-chunk f32
    cumsum whose rounding differs from the dense scatter's by up to
    ~1e-6 relative on many-range tolerance plans, legally reordering
    ties."""
    ds = [h.score for h in dense.hits]
    ps = [h.score for h in pruned.hits]
    assert len(ds) == len(ps), (ds, ps)
    assert np.allclose(ds, ps, rtol=tol, atol=tol), (ds, ps)
    i, K = 0, len(ds)
    da, pa = ids_of(dense), ids_of(pruned)
    while i < K:
        j = i
        while j + 1 < K and abs(ds[j + 1] - ds[i]) <= tol * max(
            abs(ds[i]), 1e-9
        ):
            j += 1
        if j < K - 1:
            assert set(da[i:j + 1]) == set(pa[i:j + 1]), (i, j, da, pa)
        i = j + 1


def test_pruned_tolerance_parity(monkeypatch):
    """Tolerance searches ride the pruned path (round-3 session 4): the
    with_prefix plan keeps fuzzy variant ranges uncoalesced and the
    rescore's earlier-span dedup subtracts docs matched by SEVERAL
    variant terms of one token — df (hence IDF and scores) must equal
    the dense path exactly, including docs containing multiple variants
    across multiple fields."""
    calls = _spy_pruned(monkeypatch)
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = []
        for i in range(240):
            words = ["apple" if i % 3 == 0 else "apples",
                     "maple" if i % 4 == 0 else "cherry"]
            # docs where SEVERAL variants of the fuzzy token co-occur,
            # in one field and across fields
            t = " ".join(words)
            b = "apple appl grape" if i % 5 == 0 else "banana"
            docs.append({"id": str(i), "t": t, "b": b})
        idx.insert_documents(docs)
        ctx.commit_all()
        for params in (
            {"term": "appl", "tolerance": 1, "limit": 15},
            {"term": "aple grape", "tolerance": 2, "limit": 15},
            {"term": "apple banana", "tolerance": 1, "limit": 15,
             "boost": {"t": 2.0}},
        ):
            dense, pruned = _search_both(ctx, coll, params)
            _assert_hits_tieaware(dense, pruned)
            assert pruned.count >= len(pruned.hits)
        assert len(calls) == 3  # all three rode the pruned path
    finally:
        ctx.close()


def test_pruned_tolerance_range_guard(monkeypatch):
    """A fuzzy token exploding past PRUNED_MAX_RANGES variant ranges
    falls back to the dense path (correct results, no pruned call)."""
    import oramacore_tpu.read as read_mod

    monkeypatch.setattr(read_mod, "PRUNED_MAX_RANGES", 1)
    calls = _spy_pruned(monkeypatch)
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(_docs(200, seed=21))
        ctx.commit_all()
        params = {"term": "bade", "tolerance": 2, "limit": 10}
        dense, pruned = _search_both(ctx, coll, params)
        _assert_hits_equal(dense, pruned)
        assert not calls  # guard forced the dense path
    finally:
        ctx.close()


def test_pruned_facet_counts_parity(monkeypatch):
    """Facet searches at the pruned tier count buckets straight off the
    rescore worklist (ops/pruned.py pruned_facet_counts — no dense
    kernel, no bitmap): counts must equal the dense/bitmap path for
    string, bool and number-range facets, incl. the unfiltered-rescore
    quirk, tombstones, and tolerance variants."""
    from oramacore_tpu.index import search_exec

    device_calls = []
    orig = search_exec.PrunedPlanMixin.facet_counts_pruned

    def spy(self, *a, **kw):
        device_calls.append(True)
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "facet_counts_pruned", spy
    )
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = []
        for i in range(300):
            d = {
                "id": str(i),
                "t": ("apple banana" if i % 3 == 0 else "apple cherry")
                     + (" grape" if i % 7 == 0 else ""),
                "cat": ["a", "b", "c"][i % 3],
                "flag": bool(i % 2),
                "n": i % 5,
            }
            if i % 11 == 0:
                d.pop("cat")  # docs without the facet field
            docs.append(d)
        idx.insert_documents(docs)
        ctx.commit_all()
        idx.delete_documents([str(i) for i in range(0, 300, 10)])
        for params in (
            {"term": "apple banana", "limit": 10, "facets": {
                "cat": {},
                "flag": {"true": True, "false": True},
                "n": {"ranges": [{"from": 0, "to": 2},
                                 {"from": 2, "to": 4}]},
            }},
            # filtered: the quirk counts facets over UNFILTERED matches
            {"term": "apple grape", "limit": 10,
             "where": {"n": {"lt": 3}}, "facets": {"cat": {}}},
            # tolerance variants dedup before bucketing
            {"term": "aple", "tolerance": 1, "limit": 10,
             "facets": {"flag": {"true": True, "false": True}}},
        ):
            dense, pruned = _search_both(ctx, coll, params)
            for f in params["facets"]:
                assert dense.facets[f].values == pruned.facets[f].values, (
                    params, f, dense.facets[f].values,
                    pruned.facets[f].values,
                )
        assert len(device_calls) >= 3
    finally:
        ctx.close()


def test_pruned_facets_multivalued_device_parity(monkeypatch):
    """Multi-valued facet fields ride the device path too (doc-sorted
    deduped pair tables + bounded per-doc probes,
    ops/pruned.pruned_facet_hist_multi): a doc counts once per DISTINCT
    string value (value_counts semantics, duplicate values collapse)
    and once per number range however many of its values land in it
    (range_counts semantics)."""
    from oramacore_tpu.index import search_exec

    device_calls = []
    orig = search_exec.PrunedPlanMixin.facet_counts_pruned

    def spy(self, *a, **kw):
        device_calls.append(True)
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "facet_counts_pruned", spy
    )
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([
            {"id": str(i), "t": "apple banana",
             # duplicate "x" on odd docs: dedup must count it once
             "tags": ["x", "y", "x"] if i % 2 else ["x"],
             "sizes": [i % 5, (i % 5) + 3]}
            for i in range(60)
        ])
        ctx.commit_all()
        idx.delete_documents([str(i) for i in range(0, 60, 9)])
        params = {"term": "apple", "limit": 5, "facets": {
            "tags": {},
            "sizes": {"ranges": [{"from": 0, "to": 3},
                                 {"from": 4, "to": 7}]},
        }}
        dense, pruned = _search_both(ctx, coll, params)
        for f in params["facets"]:
            assert dense.facets[f].values == pruned.facets[f].values, (
                f, dense.facets[f].values, pruned.facets[f].values,
            )
        assert device_calls
    finally:
        ctx.close()


def test_pruned_facets_multivalued_budget_falls_back(monkeypatch):
    """A doc holding more values than PRUNED_FACET_MULTI_MAX keeps the
    bitmap/dict flow — results stay correct and the device facet path
    is not used."""
    from oramacore_tpu.index import search_exec

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "PRUNED_FACET_MULTI_MAX", 2
    )
    device_calls = []
    orig = search_exec.PrunedPlanMixin.facet_counts_pruned

    def spy(self, *a, **kw):
        device_calls.append(True)
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "facet_counts_pruned", spy
    )
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([
            {"id": str(i), "t": "apple banana",
             "tags": ["x", "y", "z"] if i % 2 else ["x"]}
            for i in range(60)
        ])
        ctx.commit_all()
        params = {"term": "apple", "limit": 5, "facets": {"tags": {}}}
        dense, pruned = _search_both(ctx, coll, params)
        assert dense.facets["tags"].values == pruned.facets["tags"].values
        assert dense.facets["tags"].values == {"x": 60, "y": 30, "z": 30}
        assert not device_calls
    finally:
        ctx.close()

def test_pruned_facets_thresholded(monkeypatch):
    """Thresholded facet searches ride the sort-based device path when
    scoring itself took the pruned plan (exactCount makes thresholded
    queries pruned-eligible): the reps kernel counts distinct matched
    tokens per doc run, so bucket counts include only docs clearing the
    threshold — equal to the dense path's."""
    from oramacore_tpu.index import search_exec

    device_calls = []
    orig = search_exec.PrunedPlanMixin.facet_counts_pruned

    def spy(self, *a, **kw):
        device_calls.append(kw.get("thr"))
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "facet_counts_pruned", spy
    )
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([
            {"id": str(i),
             "t": ("apple banana cherry" if i % 5 == 0
                   else "apple banana" if i % 2 == 0 else "apple"),
             "cat": ["a", "b"][i % 2]}
            for i in range(240)
        ])
        ctx.commit_all()
        params = {
            "term": "apple banana cherry", "threshold": 0.6,
            "exactCount": True, "limit": 10, "facets": {"cat": {}},
        }
        dense, pruned = _search_both(ctx, coll, params)
        assert dense.facets["cat"].values == pruned.facets["cat"].values
        assert dense.count == pruned.count
        assert device_calls and device_calls[-1] > 0.0
    finally:
        ctx.close()


def test_pruned_facets_thresholded_no_exact_count(monkeypatch):
    """Thresholded facet searches WITHOUT exactCount ride the pruned
    path too (read.search facet_thr_exact): the scoring estimate can't
    model the min-matched-tokens constraint, so the response count
    comes from phase A's rep sum (facet_match_count) — exact, equal to
    the dense path, and NOT flagged estimated. Filters other than
    tombstones disable the exception (the facet quirk's unfiltered set
    would diverge from the search's)."""
    from oramacore_tpu.index import search_exec

    device_calls = []
    orig = search_exec.PrunedPlanMixin.facet_counts_pruned

    def spy(self, *a, **kw):
        device_calls.append(kw.get("thr"))
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "facet_counts_pruned", spy
    )
    pruned_spies = _spy_pruned(monkeypatch)
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        # randomized text (no score ties — tie ORDER between the dense
        # and pruned top-k is unspecified) + guaranteed multi-token docs
        # so the threshold actually bites
        docs = _docs(240, seed=33)
        for i, d in enumerate(docs):
            if i % 5 == 0:
                # varying tf so thresholded hits have distinct scores
                # varying tf AND flen: any exact (tf, flen) duplicate
                # pair ties exactly, and cross-path tie order is
                # unspecified float noise
                d["t"] = " ".join(
                    ["apple"] * (1 + i % 3)
                    + ["banana"] * (1 + (i // 3) % 2)
                    + ["cherry"]
                ) + " " + d["t"] + " " + " ".join(["pad"] * (i % 13))
            d["cat"] = ["a", "b"][i % 2]
            d["n"] = i % 7
        idx.insert_documents(docs)
        ctx.commit_all()
        # tombstones apply on both the scoring and the reps side
        idx.delete_documents([str(i) for i in range(0, 240, 11)])
        params = {
            "term": "apple banana cherry", "threshold": 0.6,
            "limit": 10, "facets": {"cat": {}},
        }
        dense, pruned = _search_both(ctx, coll, params)
        _assert_hits_equal(dense, pruned)
        assert dense.facets["cat"].values == pruned.facets["cat"].values
        assert dense.count == pruned.count
        assert not dense.count_estimated
        assert not pruned.count_estimated  # rep-sum override, not est.
        assert device_calls and device_calls[-1] > 0.0
        assert pruned_spies  # scoring itself took the pruned kernel

        # with a where-filter the exception must NOT apply: the search
        # falls back to the dense thresholded path (correct results)
        device_calls.clear()
        pruned_spies.clear()
        fparams = dict(params)
        fparams["where"] = {"n": {"lt": 5}}
        dense_f, pruned_f = _search_both(ctx, coll, fparams)
        _assert_hits_equal(dense_f, pruned_f)
        assert dense_f.count == pruned_f.count
        assert dense_f.facets["cat"].values == pruned_f.facets["cat"].values
        assert not device_calls  # facet device path declined
    finally:
        ctx.close()


def test_pruned_facets_reps_cached_across_fields(monkeypatch):
    """A multi-facet query pays the global sort ONCE: phase A
    (pruned_match_reps) runs one time, phase B (pruned_facet_hist) once
    per facet field off the cached device-resident reps."""
    import oramacore_tpu.ops.pruned as prmod

    reps_calls = []
    hist_calls = []
    orig_reps = prmod.pruned_match_reps
    orig_hist = prmod.pruned_facet_hist

    def spy_reps(*a, **kw):
        reps_calls.append(True)
        return orig_reps(*a, **kw)

    def spy_hist(*a, **kw):
        hist_calls.append(True)
        return orig_hist(*a, **kw)

    monkeypatch.setattr(prmod, "pruned_match_reps", spy_reps)
    monkeypatch.setattr(prmod, "pruned_facet_hist", spy_hist)
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([
            {"id": str(i), "t": "apple banana",
             "cat": ["a", "b", "c"][i % 3], "flag": bool(i % 2),
             "n": i % 4}
            for i in range(120)
        ])
        ctx.commit_all()
        params = {"term": "apple", "limit": 5, "facets": {
            "cat": {}, "flag": {"true": True, "false": True},
            "n": {"ranges": [{"from": 0, "to": 2}]},
        }}
        dense, pruned = _search_both(ctx, coll, params)
        for f in params["facets"]:
            assert dense.facets[f].values == pruned.facets[f].values
        assert len(reps_calls) == 1, reps_calls
        assert len(hist_calls) == 3, hist_calls
    finally:
        ctx.close()


def test_pruned_hybrid_facets_parity(monkeypatch):
    """HYBRID facet searches at the int8/IVF tier ride the sort-based
    pruned facet path (ops/pruned.pruned_hybrid_match_reps): the match
    set is ft | top-V probe rows clearing the similarity floor — the
    same candidate-bounded membership the dense int8 bitmap kernel
    packs (ops/hybrid._fuse present) — so bucket counts must equal the
    forced-dense path for string/bool/number facets, incl. tombstones
    and the filters quirk (facets over UNFILTERED matches)."""
    from oramacore_tpu.index import search_exec

    monkeypatch.setattr(vi, "IVF_MIN_ROWS", 600)
    monkeypatch.setattr(vi, "IVF_NPROBE", 16)
    vec_calls = []
    orig = search_exec.PrunedPlanMixin.facet_counts_pruned

    def spy(self, *a, **kw):
        vec_calls.append(kw.get("vec") is not None)
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "facet_counts_pruned", spy
    )
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = []
        rng = np.random.default_rng(7)
        for i in range(900):
            words = rng.choice(VOCAB, size=5, replace=False)
            d = {
                "id": str(i),
                "t": " ".join(words),
                "cat": ["a", "b", "c"][i % 3],
                "flag": bool(i % 2),
                "n": i % 5,
            }
            if i % 13 == 0:
                d.pop("cat")
            docs.append(d)
        for s in range(0, 900, 300):
            idx.insert_documents(docs[s:s + 300])
        ctx.commit_all()
        ridx = next(iter(
            ctx.reader.collections[coll.collection_id].indexes.values()
        ))
        assert ridx.vector is not None and ridx.vector._ivf is not None
        idx.delete_documents([str(i) for i in range(0, 900, 10)])
        for params in (
            {"mode": "hybrid", "term": "apple banana",
             "similarity": 0.45, "limit": 10, "facets": {
                 "cat": {},
                 "flag": {"true": True, "false": True},
                 "n": {"ranges": [{"from": 0, "to": 2},
                                  {"from": 2, "to": 4}]},
             }},
            # filters quirk: facets count UNFILTERED matches
            {"mode": "hybrid", "term": "mango kiwi",
             "similarity": 0.5, "limit": 10,
             "where": {"n": {"lt": 3}}, "facets": {"cat": {}}},
        ):
            dense, pruned = _search_both(ctx, coll, params)
            for f in params["facets"]:
                assert dense.facets[f].values == pruned.facets[f].values, (
                    params, f, dense.facets[f].values,
                    pruned.facets[f].values,
                )
        assert vec_calls and all(vec_calls), vec_calls
    finally:
        ctx.close()


def test_pruned_hybrid_facets_thresholded_device(monkeypatch):
    """Thresholded HYBRID facet searches ride the device facet path
    (read.search facet_thr_exact): the reps kernel thresholds the
    fulltext side's distinct-token runs and unions the IVF probe's
    matches (_fuse semantics), so facet counts AND the response count
    (phase A's rep sum via facet_match_count) are exact — the hybrid
    scoring kernels alone couldn't model the min-matched-tokens
    constraint in their count estimate, which used to force the dense
    bitmap flow here."""
    from oramacore_tpu.index import search_exec

    monkeypatch.setattr(vi, "IVF_MIN_ROWS", 600)
    monkeypatch.setattr(vi, "IVF_NPROBE", 16)
    device_calls = []
    orig = search_exec.PrunedPlanMixin.facet_counts_pruned

    def spy(self, *a, **kw):
        device_calls.append(kw.get("thr"))
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "facet_counts_pruned", spy
    )
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        rng = np.random.default_rng(9)
        idx.insert_documents([
            {"id": str(i),
             "t": " ".join(rng.choice(VOCAB, size=5, replace=False)),
             "cat": ["a", "b"][i % 2]}
            for i in range(700)
        ])
        ctx.commit_all()
        params = {"mode": "hybrid", "term": "apple banana cherry",
                  "similarity": 0.45, "threshold": 0.6, "limit": 10,
                  "facets": {"cat": {}}}
        dense, pruned = _search_both(ctx, coll, params)
        assert dense.facets["cat"].values == pruned.facets["cat"].values
        assert dense.count == pruned.count
        assert not pruned.count_estimated
        assert device_calls and device_calls[-1] > 0.0
    finally:
        ctx.close()


def test_pruned_bs_bucket_index_engages(monkeypatch):
    """Eligible pruned searches ship the bucket-offset tables
    (search_exec._pruned_bs_boff) and the v4 results stay equal to the
    dense path — the windows change round count, never results."""
    from oramacore_tpu.index import search_exec

    calls = []
    orig = search_exec.PrunedPlanMixin._pruned_bs_boff

    def spy(self, index, rng_i, capb, bs_steps):
        out = orig(self, index, rng_i, capb, bs_steps)
        calls.append(out[0] is not None)  # flat table built
        return out

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "_pruned_bs_boff", spy
    )
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(_docs(400, seed=5))
        ctx.commit_all()
        params = {"term": "apple banana", "limit": 10}
        dense, pruned = _search_both(ctx, coll, params)
        _assert_hits_equal(dense, pruned)
        assert calls  # boff built for the v4 dispatch
    finally:
        ctx.close()


def test_pruned_facets_with_sort_by(monkeypatch):
    """sort_by + facets rides the device facet path (r5 widening,
    VERDICT r4 #4): facet counting needs only a query plan — phase A's
    reps are exact over the full worklist — so the ranking is free to
    be the fused sorted dispatch. Facet counts AND sorted hit order
    must equal the forced-dense path."""
    from oramacore_tpu.index import search_exec

    device_calls = []
    orig = search_exec.PrunedPlanMixin.facet_counts_pruned

    def spy(self, *a, **kw):
        device_calls.append(True)
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "facet_counts_pruned", spy
    )
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = []
        for i in range(300):
            docs.append({
                "id": str(i),
                "t": "apple banana" if i % 3 == 0 else "apple cherry",
                "cat": ["a", "b", "c"][i % 3],
                "n": i % 50,
            })
        idx.insert_documents(docs)
        ctx.commit_all()
        idx.delete_documents([str(i) for i in range(0, 300, 10)])
        for direction in ("asc", "desc"):
            params = {
                "term": "apple banana", "limit": 10,
                "sort_by": {"property": "n", "order": direction.upper()},
                "facets": {"cat": {}, "n": {"ranges": [
                    {"from": 0, "to": 20}, {"from": 20, "to": 49},
                ]}},
            }
            dense, pruned = _search_both(ctx, coll, params)
            assert ids_of(dense) == ids_of(pruned)
            for f in params["facets"]:
                assert dense.facets[f].values == pruned.facets[f].values
        assert device_calls
    finally:
        ctx.close()


def test_pruned_facets_with_group_by(monkeypatch):
    """group_by + facets rides the device facet path too: the grouped
    ranking takes its own dispatch (fused or host) while facet counting
    runs off the on-demand plan. Groups and facet counts must equal the
    forced-dense path."""
    from oramacore_tpu.index import search_exec

    device_calls = []
    orig = search_exec.PrunedPlanMixin.facet_counts_pruned

    def spy(self, *a, **kw):
        device_calls.append(True)
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "facet_counts_pruned", spy
    )
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = []
        for i in range(300):
            docs.append({
                "id": str(i),
                "t": "apple banana" if i % 3 == 0 else "apple cherry",
                "cat": ["a", "b", "c"][i % 3],
                "flag": bool(i % 2),
            })
        idx.insert_documents(docs)
        ctx.commit_all()
        params = {
            "term": "apple", "limit": 5,
            "group_by": {"properties": ["cat"], "max_results": 3},
            "facets": {"flag": {"true": True, "false": True}},
        }
        dense, pruned = _search_both(ctx, coll, params)
        for f in params["facets"]:
            assert dense.facets[f].values == pruned.facets[f].values
        dg = {tuple(g.values): [h.id for h in g.result]
              for g in (dense.groups or [])}
        pg = {tuple(g.values): [h.id for h in g.result]
              for g in (pruned.groups or [])}
        assert dg and dg == pg
        assert device_calls
    finally:
        ctx.close()


def test_pruned_facets_vector_mode(monkeypatch):
    """Vector-mode facet searches at the int8/IVF tier ride the device
    facet path with a vec-only phase A (no text worklist): counts must
    equal the host dict flow when the match set fits both candidate
    bounds (the host flow is limit*4-bounded, the device path
    HYBRID_INT8_CANDIDATES-bounded — the similarity floor here keeps
    matches well under both)."""
    from oramacore_tpu.index import search_exec

    monkeypatch.setattr(vi, "IVF_MIN_ROWS", 600)
    monkeypatch.setattr(vi, "IVF_NPROBE", 16)
    vec_only_calls = []
    orig = search_exec.PrunedPlanMixin.facet_counts_pruned

    def spy(self, *a, **kw):
        vec_only_calls.append(kw.get("vec_only", False))
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "facet_counts_pruned", spy
    )
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        rng = np.random.default_rng(11)
        docs = []
        for i in range(900):
            words = rng.choice(VOCAB, size=5, replace=False)
            docs.append({
                "id": str(i),
                "t": " ".join(words),
                "cat": ["a", "b", "c"][i % 3],
                "n": i % 5,
            })
        for s in range(0, 900, 300):
            idx.insert_documents(docs[s:s + 300])
        ctx.commit_all()
        ridx = next(iter(
            ctx.reader.collections[coll.collection_id].indexes.values()
        ))
        assert ridx.vector is not None and ridx.vector._ivf is not None
        params = {
            "mode": "vector", "term": docs[5]["t"],
            "similarity": 0.9, "limit": 32,
            "facets": {"cat": {}, "n": {"ranges": [
                {"from": 0, "to": 2}, {"from": 2, "to": 4},
            ]}},
        }
        dense, pruned = _search_both(ctx, coll, params)
        assert ids_of(dense) == ids_of(pruned)
        for f in params["facets"]:
            assert dense.facets[f].values == pruned.facets[f].values, (
                f, dense.facets[f].values, pruned.facets[f].values,
            )
        assert vec_only_calls and all(vec_only_calls), vec_only_calls
    finally:
        ctx.close()


def test_pruned_hybrid_exact_count_facets(monkeypatch):
    """exactCount HYBRID facet searches ride the pruned path (r5):
    phase A's rep sum is the exact |ft ∪ vec| count, so the pruned
    hybrid scoring kernel becomes eligible (its own estimate is
    replaced) and the dense bitmap route dies. Hits, facet counts AND
    the response count must equal the forced-dense path exactly."""
    from oramacore_tpu.index import search_exec

    monkeypatch.setattr(vi, "IVF_MIN_ROWS", 600)
    monkeypatch.setattr(vi, "IVF_NPROBE", 16)
    device_calls = []
    orig = search_exec.PrunedPlanMixin.facet_counts_pruned

    def spy(self, *a, **kw):
        device_calls.append(True)
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "facet_counts_pruned", spy
    )
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        rng = np.random.default_rng(13)
        docs = []
        for i in range(900):
            words = rng.choice(VOCAB, size=5, replace=False)
            docs.append({
                "id": str(i),
                "t": " ".join(words),
                "cat": ["a", "b", "c"][i % 3],
            })
        for s in range(0, 900, 300):
            idx.insert_documents(docs[s:s + 300])
        ctx.commit_all()
        idx.delete_documents([str(i) for i in range(0, 900, 10)])
        params = {
            "mode": "hybrid", "term": "apple banana",
            "similarity": 0.45, "limit": 10, "exactCount": True,
            "facets": {"cat": {}},
        }
        dense, pruned = _search_both(ctx, coll, params)
        _assert_hits_equal(dense, pruned)
        assert dense.count == pruned.count, (dense.count, pruned.count)
        for f in params["facets"]:
            assert dense.facets[f].values == pruned.facets[f].values
        assert device_calls
    finally:
        ctx.close()


def test_pruned_facets_wide_string_column(monkeypatch):
    """String facets up to 1024 distinct values ride the device path
    (r5: the hist kernel is G-independent to 1024 — 72 ms at a 2M
    worklist on hardware): counts must equal the dense flow for a
    300-value column."""
    from oramacore_tpu.index import search_exec

    device_calls = []
    orig = search_exec.PrunedPlanMixin.facet_counts_pruned

    def spy(self, *a, **kw):
        device_calls.append(True)
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        search_exec.PrunedPlanMixin, "facet_counts_pruned", spy
    )
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = [{
            "id": str(i),
            "t": "apple banana" if i % 2 else "apple cherry",
            "cat": f"v{i % 300:03d}",
        } for i in range(600)]
        idx.insert_documents(docs)
        ctx.commit_all()
        params = {"term": "apple banana", "limit": 10,
                  "facets": {"cat": {}}}
        dense, pruned = _search_both(ctx, coll, params)
        assert dense.facets["cat"].values == pruned.facets["cat"].values
        assert len(dense.facets["cat"].values) > 128
        assert device_calls
    finally:
        ctx.close()
