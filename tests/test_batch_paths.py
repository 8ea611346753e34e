"""Batched-search coverage (VERDICT r2 weak #9: silent downgrades).

The shared term-dedup batch path now covers exact mode, tolerance,
phrase_boost and multi-index collections; remaining fallbacks
(facets/groups/sort, mixed configs) increment the
search_batch_fallbacks_total metric and log the reason.
"""

import numpy as np
import pytest

from oramacore_tpu.metrics import BATCH_FALLBACKS
from oramacore_tpu.types import SearchParams

from .utils import TestContext

_WORDS = ["orange", "banana", "apple", "grape", "melon", "kiwi", "plum",
          "pear", "fig", "cherry", "lime", "date"]


def _docs(n, seed=3):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        words = rng.choice(_WORDS, size=int(rng.integers(2, 6)),
                           replace=False).tolist()
        words += [f"z{i}w{j}" for j in range(4 * i)]
        docs.append({"id": str(i), "t": " ".join(words), "n": int(i % 5)})
    return docs


def _params(batch):
    return [SearchParams.from_json(dict(q)) for q in batch]


def _assert_matches_sequential(ctx, coll, batch):
    seq = [
        ctx.reader.search(
            coll.collection_id, coll.read_key,
            SearchParams.from_json(dict(q)),
        )
        for q in batch
    ]
    got = ctx.reader.search_batch(
        coll.collection_id, coll.read_key, _params(batch)
    )
    for s, g, q in zip(seq, got, batch):
        assert [h.id for h in s.hits] == [h.id for h in g.hits], q
        for hs, hg in zip(s.hits, g.hits):
            assert hg.score == pytest.approx(hs.score, rel=1e-4), q
        assert s.count == g.count, q


def test_batch_exact_mode():
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = _docs(80)
        docs.append({"id": "x1", "t": "running shoes", "n": 0})
        docs.append({"id": "x2", "t": "runs shoe", "n": 0})
        idx.insert_documents(docs)
        ctx.commit_all()
        _assert_matches_sequential(ctx, coll, [
            {"term": "running", "exact": True, "limit": 5},
            {"term": "apple banana", "exact": True, "limit": 5},
            {"term": "orange", "exact": True, "limit": 5},
        ])
    finally:
        ctx.close()


def test_batch_tolerance():
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(_docs(60))
        ctx.commit_all()
        _assert_matches_sequential(ctx, coll, [
            {"term": "aple", "tolerance": 1, "limit": 5},
            {"term": "bananna", "tolerance": 1, "limit": 5},
            {"term": "oronge kiwi", "tolerance": 1, "limit": 5},
        ])
    finally:
        ctx.close()


def test_batch_phrase_boost():
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = _docs(60)
        docs.append({"id": "p1", "t": "orange banana smoothie", "n": 0})
        docs.append({"id": "p2", "t": "banana then some orange", "n": 0})
        idx.insert_documents(docs)
        ctx.commit_all()
        _assert_matches_sequential(ctx, coll, [
            {"term": "orange banana", "phrase_boost": 2.5, "limit": 8},
            {"term": "kiwi plum", "phrase_boost": 2.5, "limit": 8},
        ])
    finally:
        ctx.close()


def test_batch_multi_index():
    """Multi-index collections batch per index and merge by score —
    previously a silent per-query fallback."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx1 = coll.create_index("one")
        idx2 = coll.create_index("two")
        docs = _docs(60, seed=5)
        idx1.insert_documents(docs[:30])
        idx2.insert_documents([
            {**d, "id": "b" + d["id"]} for d in docs[30:]
        ])
        ctx.commit_all()
        before = dict(BATCH_FALLBACKS._values)
        _assert_matches_sequential(ctx, coll, [
            {"term": "orange banana", "limit": 8},
            {"term": "apple", "limit": 8},
            {"term": "kiwi plum fig", "limit": 8},
        ])
        # the multi-index batch must NOT have fallen back
        assert BATCH_FALLBACKS._values == before
    finally:
        ctx.close()


def test_batch_fallback_metric():
    """Unsupported batches (facets) fall back per-query AND count it."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(_docs(20))
        ctx.commit_all()
        key = (("reason", "facets_groups"),)
        before = BATCH_FALLBACKS._values.get(key, 0.0)
        ctx.reader.search_batch(
            coll.collection_id, coll.read_key,
            _params([
                {"term": "orange",
                 "facets": {"n": {"ranges": [{"from": 0, "to": 3}]}}},
                {"term": "banana"},
            ]),
        )
        assert BATCH_FALLBACKS._values.get(key, 0.0) == before + 1
    finally:
        ctx.close()


def test_batch_pruned_routing():
    """Batched fulltext rides the pruned two-phase kernels when
    pruning engages (the dense shared pass is scatter-bound at the
    multi-million-doc tier): hits/scores match the dense per-query
    path, counts are flagged estimates, and exactCount (or the config
    default) switches them to exact counts."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(_docs(120))
        ctx.commit_all()
        batch = [
            {"term": "orange banana", "limit": 10},
            {"term": "apple", "limit": 5},
            {"term": "grape melon", "limit": 10},
        ]
        # dense per-query ground truth
        ctx.reader.config.reader_side.pruning = "off"
        seq = [
            ctx.reader.search(
                coll.collection_id, coll.read_key,
                SearchParams.from_json(dict(q)),
            )
            for q in batch
        ]
        ctx.reader.config.reader_side.pruning = "on"
        try:
            got = ctx.reader.search_batch(
                coll.collection_id, coll.read_key, _params(batch)
            )
            for s, g, q in zip(seq, got, batch):
                assert [h.id for h in s.hits] == [h.id for h in g.hits], q
                for hs, hg in zip(s.hits, g.hits):
                    assert hg.score == pytest.approx(hs.score, rel=1e-4), q
                assert g.count_estimated, q
                assert g.count >= len(g.hits), q
            # exactCount per search -> exact counts batch-wide
            exact_batch = [{**q, "exactCount": True} for q in batch]
            got = ctx.reader.search_batch(
                coll.collection_id, coll.read_key, _params(exact_batch)
            )
            for s, g, q in zip(seq, got, batch):
                assert [h.id for h in s.hits] == [h.id for h in g.hits], q
                assert g.count == s.count, q
                assert not g.count_estimated, q
            # thresholds are pruned-eligible only under exact counts
            thr_batch = [
                {"term": "orange banana kiwi", "limit": 10,
                 "threshold": 0.6, "exactCount": True},
                {"term": "apple grape", "limit": 10, "threshold": 0.5,
                 "exactCount": True},
            ]
            ctx.reader.config.reader_side.pruning = "off"
            thr_seq = [
                ctx.reader.search(
                    coll.collection_id, coll.read_key,
                    SearchParams.from_json(dict(q)),
                )
                for q in thr_batch
            ]
            ctx.reader.config.reader_side.pruning = "on"
            got = ctx.reader.search_batch(
                coll.collection_id, coll.read_key, _params(thr_batch)
            )
            for s, g, q in zip(thr_seq, got, thr_batch):
                assert [h.id for h in s.hits] == [h.id for h in g.hits], q
                assert g.count == s.count, q
        finally:
            ctx.reader.config.reader_side.pruning = "auto"
    finally:
        ctx.close()


def test_batch_pruned_with_tombstones():
    """Deletes must not demote BATCHED search to the dense path: the
    cached tombstone alive-mask is shared by every query in the batch
    (identity), rides the pruned kernels as a filter, and deleted docs
    never surface. Small alive sets take the cand-given path (exact
    counts, no estimate flag)."""
    from oramacore_tpu.index import search_exec

    calls = []
    orig = search_exec.PrunedPlanMixin.search_topk_pruned

    def spy(self, *a, **kw):
        calls.append(kw.get("mask"))
        return orig(self, *a, **kw)

    search_exec.PrunedPlanMixin.search_topk_pruned = spy
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(_docs(120))
        ctx.commit_all()
        gone = [str(i) for i in range(0, 120, 3)]
        idx.delete_documents(gone)
        batch = [
            {"term": "orange banana", "limit": 10},
            {"term": "apple", "limit": 8},
            {"term": "grape melon", "limit": 10},
        ]
        ctx.reader.config.reader_side.pruning = "off"
        seq = [
            ctx.reader.search(
                coll.collection_id, coll.read_key,
                SearchParams.from_json(dict(q)),
            )
            for q in batch
        ]
        ctx.reader.config.reader_side.pruning = "on"
        try:
            got = ctx.reader.search_batch(
                coll.collection_id, coll.read_key, _params(batch)
            )
        finally:
            ctx.reader.config.reader_side.pruning = "auto"
        assert len(calls) == 1 and calls[0] is not None
        for s, g, q in zip(seq, got, batch):
            assert [h.id for h in s.hits] == [h.id for h in g.hits], q
            for hs, hg in zip(s.hits, g.hits):
                assert hg.score == pytest.approx(hs.score, rel=1e-4), q
            # 80 alive docs <= PRUNED_CANDIDATES -> cand-given: exact
            assert g.count == s.count, q
            assert not g.count_estimated, q
            assert not set(h.id for h in g.hits) & set(gone), q
    finally:
        search_exec.PrunedPlanMixin.search_topk_pruned = orig
        ctx.close()


def test_batch_pruned_per_query_filters_keep_dense():
    """Distinct per-query where-filters cannot share one mask: the batch
    keeps the dense shared path and results still match sequential."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(_docs(100))
        ctx.commit_all()
        batch = [
            {"term": "orange", "limit": 10, "where": {"n": {"eq": 1}}},
            {"term": "orange", "limit": 10, "where": {"n": {"lt": 3}}},
        ]
        ctx.reader.config.reader_side.pruning = "on"
        try:
            _assert_matches_sequential(ctx, coll, batch)
        finally:
            ctx.reader.config.reader_side.pruning = "auto"
    finally:
        ctx.close()


def test_alive_mask_cache_identity_and_invalidation():
    """ReadIndex.alive_mask is cached by (cap, tombstone_version):
    stable identity between mutations (the batch shared-mask check
    relies on it), fresh array after a delete AND after a resurrection
    discard that changes membership but not size."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(_docs(20))
        ctx.commit_all()
        ridx = next(iter(
            ctx.reader.collections[coll.collection_id].indexes.values()
        ))
        assert ridx.alive_mask() is None
        idx.delete_documents(["3"])
        m1 = ridx.alive_mask()
        assert m1 is ridx.alive_mask()  # cached identity
        deleted_internal = next(iter(ridx.deleted))
        assert not m1[deleted_internal]
        idx.delete_documents(["7"])
        m2 = ridx.alive_mask()
        assert m2 is not m1
        assert m2.sum() == m1.sum() - 1
    finally:
        ctx.close()


def test_batch_sorted_matches_sequential():
    """Homogeneous sorted batches ride the fused sort kernel in ONE
    dispatch — order, counts and scores must equal the sequential
    per-query path (same kernel) including filters, thresholds,
    tombstones, offsets and fieldless docs."""
    from oramacore_tpu.index import search_exec

    calls = []
    orig = search_exec.StringSearchTopK.search_topk_sorted

    def spy(self, *a, **kw):
        calls.append(len(a[1]) if len(a) > 1 else None)
        return orig(self, *a, **kw)

    search_exec.StringSearchTopK.search_topk_sorted = spy
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = _docs(80)
        for i, d in enumerate(docs):
            if i % 4 != 0:
                d["price"] = float(i % 9)
        idx.insert_documents(docs)
        ctx.commit_all()
        idx.delete_documents(["5", "11"])
        batch = [
            {"term": "orange", "limit": 10,
             "sort_by": {"property": "price", "order": "asc"}},
            {"term": "banana", "limit": 10, "offset": 3,
             "sort_by": {"property": "price", "order": "asc"}},
            {"term": "apple grape", "limit": 10,
             "where": {"n": {"lt": 3}},
             "sort_by": {"property": "price", "order": "asc"}},
        ]
        calls.clear()
        _assert_matches_sequential(ctx, coll, batch)
        # sequential = 3 single-plan calls; the batch = ONE 3-plan call
        assert sorted(calls) == [1, 1, 1, 3], calls
        # mixed sort directions fall back per-query (still correct)
        mixed = [
            {"term": "orange", "limit": 5,
             "sort_by": {"property": "price", "order": "asc"}},
            {"term": "orange", "limit": 5,
             "sort_by": {"property": "price", "order": "desc"}},
        ]
        _assert_matches_sequential(ctx, coll, mixed)
    finally:
        search_exec.StringSearchTopK.search_topk_sorted = orig
        ctx.close()


def test_batch_tolerance_pruned_routing():
    """Homogeneous tolerance batches ride the pruned kernels when
    pruning engages (session 4: variant-range union df on device):
    near-tie-aware parity vs the dense per-query path."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(_docs(120))
        ctx.commit_all()
        batch = [
            {"term": "aple", "tolerance": 1, "limit": 8},
            {"term": "bananna", "tolerance": 1, "limit": 8},
            {"term": "oronge kiwi", "tolerance": 1, "limit": 8},
        ]
        ctx.reader.config.reader_side.pruning = "off"
        seq = [
            ctx.reader.search(
                coll.collection_id, coll.read_key,
                SearchParams.from_json(dict(q)),
            )
            for q in batch
        ]
        ctx.reader.config.reader_side.pruning = "on"
        try:
            got = ctx.reader.search_batch(
                coll.collection_id, coll.read_key, _params(batch)
            )
        finally:
            ctx.reader.config.reader_side.pruning = "auto"
        for s, g, q in zip(seq, got, batch):
            ss = [h.score for h in s.hits]
            gs = [h.score for h in g.hits]
            assert np.allclose(ss, gs, rtol=1e-4, atol=1e-5), (q, ss, gs)
            # tie-aware id comparison (f32 association on variant plans)
            i, K = 0, len(ss)
            sa = [h.id for h in s.hits]
            ga = [h.id for h in g.hits]
            while i < K:
                j = i
                while j + 1 < K and abs(ss[j + 1] - ss[i]) <= 1e-4 * max(
                    abs(ss[i]), 1e-9
                ):
                    j += 1
                if j < K - 1:
                    assert set(sa[i:j + 1]) == set(ga[i:j + 1]), (q, sa, ga)
                i = j + 1
            assert g.count >= len(g.hits), q
    finally:
        ctx.close()

def test_batch_exact_counts_sliced():
    """A batch past PRUNED_COUNTS_SLICE queries dispatches the
    exact-counts kernel in <= 8-query slices (its global sort is
    superlinear in flat length — 39.6 ms @B=8 vs 12.4 s @B=64 on TPU
    v5e): counts stay exact and match the per-query dense path."""
    import oramacore_tpu.ops.pruned as prmod
    from oramacore_tpu.index import search_exec

    dispatch_b = []
    orig = prmod.pruned_exact_counts

    def spy(p_doc, p_tf, p_etf, wl_i, thr, *a, **kw):
        dispatch_b.append(int(thr.shape[0]))
        return orig(p_doc, p_tf, p_etf, wl_i, thr, *a, **kw)

    prmod.pruned_exact_counts = spy
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(_docs(150))
        ctx.commit_all()
        S = search_exec.PrunedPlanMixin.PRUNED_COUNTS_SLICE
        terms = [w for w in _WORDS for _ in (0, 1)][: 2 * S + 4]  # B=20
        batch = [
            {"term": f"{t} {_WORDS[(i + 1) % len(_WORDS)]}",
             "limit": 5, "exactCount": True}
            for i, t in enumerate(terms)
        ]
        ctx.reader.config.reader_side.pruning = "off"
        seq = [
            ctx.reader.search(
                coll.collection_id, coll.read_key,
                SearchParams.from_json(dict(q)),
            )
            for q in batch
        ]
        ctx.reader.config.reader_side.pruning = "on"
        try:
            got = ctx.reader.search_batch(
                coll.collection_id, coll.read_key, _params(batch)
            )
        finally:
            ctx.reader.config.reader_side.pruning = "auto"
        for s, g, q in zip(seq, got, batch):
            assert [h.id for h in s.hits] == [h.id for h in g.hits], q
            assert g.count == s.count, q
            assert not g.count_estimated, q
        # the batch went out in ceil(B/S) slices of exactly S queries
        assert dispatch_b, "exact-counts kernel never dispatched"
        assert all(b == S for b in dispatch_b), dispatch_b
        assert len(dispatch_b) >= -(-len(batch) // S)
    finally:
        prmod.pruned_exact_counts = orig
        ctx.close()

def test_batch_pruned_bs_split():
    """v4 batched dispatches split at PRUNED_BS_BATCH plans (accum1024
    measured 106 QPS @B=64 vs 72 @B=256): results equal the unsplit
    per-query path and the kernel sees <= 64-plan batches."""
    import oramacore_tpu.ops.pruned as prmod
    from oramacore_tpu.index import search_exec

    PM = search_exec.PrunedPlanMixin
    dispatch_b = []
    orig = prmod.pruned_fulltext_topk_bs

    def spy(p_doc, p_tf, p_flen, pre_st, *a, **kw):
        dispatch_b.append(int(pre_st.shape[0]))
        return orig(p_doc, p_tf, p_flen, pre_st, *a, **kw)

    prmod.pruned_fulltext_topk_bs = spy
    # tiny corpora have tiny nominator sort widths, which the adaptive
    # chunker would run unsplit — pin the budget so chunking engages
    budget = PM.PRUNED_BS_SORT_BUDGET
    PM.PRUNED_BS_SORT_BUDGET = 0
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(_docs(130))
        ctx.commit_all()
        B = PM.PRUNED_BS_BATCH + 6
        batch = [
            {"term": f"{_WORDS[i % len(_WORDS)]} "
                     f"{_WORDS[(i + 2) % len(_WORDS)]}", "limit": 5}
            for i in range(B)
        ]
        ctx.reader.config.reader_side.pruning = "on"
        try:
            seq = [
                ctx.reader.search(
                    coll.collection_id, coll.read_key,
                    SearchParams.from_json(dict(q)),
                )
                for q in batch
            ]
            dispatch_b.clear()
            got = ctx.reader.search_batch(
                coll.collection_id, coll.read_key, _params(batch)
            )
        finally:
            ctx.reader.config.reader_side.pruning = "auto"
        assert dispatch_b, "bs kernel never dispatched"
        assert all(b <= PM.PRUNED_BS_BATCH for b in dispatch_b), dispatch_b
        assert len(dispatch_b) >= 2
        for s, g, q in zip(seq, got, batch):
            assert [h.id for h in s.hits] == [h.id for h in g.hits], q
    finally:
        PM.PRUNED_BS_SORT_BUDGET = budget
        prmod.pruned_fulltext_topk_bs = orig
        ctx.close()


def test_batch_pruned_bs_small_width_unsplit():
    """The adaptive chunker (_pruned_bs_chunk): batches whose nominator
    sort width fits PRUNED_BS_SORT_BUDGET dispatch UNSPLIT even past
    PRUNED_BS_BATCH plans — at the engine-default lp=8192 the (256,
    24576) shape measured FASTEST (zipf arm, RESULTS.md round-4
    session 5)."""
    import oramacore_tpu.ops.pruned as prmod
    from oramacore_tpu.index import search_exec

    PM = search_exec.PrunedPlanMixin
    dispatch_b = []
    orig = prmod.pruned_fulltext_topk_bs

    def spy(p_doc, p_tf, p_flen, pre_st, *a, **kw):
        dispatch_b.append(int(pre_st.shape[0]))
        return orig(p_doc, p_tf, p_flen, pre_st, *a, **kw)

    prmod.pruned_fulltext_topk_bs = spy
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(_docs(130))
        ctx.commit_all()
        B = PM.PRUNED_BS_BATCH + 6
        batch = [
            {"term": f"{_WORDS[i % len(_WORDS)]} "
                     f"{_WORDS[(i + 2) % len(_WORDS)]}", "limit": 5}
            for i in range(B)
        ]
        ctx.reader.config.reader_side.pruning = "on"
        try:
            got = ctx.reader.search_batch(
                coll.collection_id, coll.read_key, _params(batch)
            )
        finally:
            ctx.reader.config.reader_side.pruning = "auto"
        assert got is not None
        # ONE unsplit dispatch (the batch path pads B to its shape
        # bucket, so the kernel may see a padded batch)
        assert len(dispatch_b) == 1 and dispatch_b[0] >= B, dispatch_b
    finally:
        prmod.pruned_fulltext_topk_bs = orig
        ctx.close()


def test_batch_hybrid_bs_split(monkeypatch):
    """v4 batched HYBRID dispatches split at PRUNED_BS_BATCH plans
    (hybrid-bs measured 97 QPS @B=64 vs 69 @B=128 on TPU v5e,
    RESULTS.md round-4 session 3): results equal the per-query path
    and the kernel sees <= 64-plan batches."""
    import oramacore_tpu.index.vector_index as vi
    import oramacore_tpu.ops.pruned as prmod
    from oramacore_tpu.index import search_exec

    monkeypatch.setattr(vi, "IVF_MIN_ROWS", 600)
    monkeypatch.setattr(vi, "IVF_NPROBE", 16)
    PM = search_exec.PrunedPlanMixin
    dispatch_b = []
    orig = prmod.pruned_hybrid_topk_int8_bs

    def spy(p_doc, p_tf, p_flen, pre_st, *a, **kw):
        dispatch_b.append(int(pre_st.shape[0]))
        return orig(p_doc, p_tf, p_flen, pre_st, *a, **kw)

    prmod.pruned_hybrid_topk_int8_bs = spy
    monkeypatch.setattr(PM, "PRUNED_BS_SORT_BUDGET", 0)
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = _docs(700, seed=5)
        for s in range(0, 700, 350):
            idx.insert_documents(docs[s:s + 350])
        ctx.commit_all()
        B = PM.PRUNED_BS_BATCH + 4
        batch = [
            {"term": f"{_WORDS[i % len(_WORDS)]} "
                     f"{_WORDS[(i + 3) % len(_WORDS)]}",
             "mode": "hybrid", "limit": 5, "similarity": 0.05}
            for i in range(B)
        ]
        ctx.reader.config.reader_side.pruning = "on"
        try:
            seq = [
                ctx.reader.search(
                    coll.collection_id, coll.read_key,
                    SearchParams.from_json(dict(q)),
                )
                for q in batch
            ]
            dispatch_b.clear()
            got = ctx.reader.search_batch(
                coll.collection_id, coll.read_key, _params(batch)
            )
        finally:
            ctx.reader.config.reader_side.pruning = "auto"
        assert dispatch_b, "hybrid bs kernel never dispatched"
        assert all(b <= PM.PRUNED_BS_BATCH for b in dispatch_b), dispatch_b
        assert len(dispatch_b) >= 2
        for s, g, q in zip(seq, got, batch):
            assert [h.id for h in s.hits] == [h.id for h in g.hits], q
    finally:
        prmod.pruned_hybrid_topk_int8_bs = orig
        ctx.close()
