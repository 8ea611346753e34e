"""Fused GROUP-BY parity (ops/bm25.py bm25_search_grouped_packed).

The device path returns the main top-k page + per-group top-R pages in
ONE dispatch; the host flow ships a dense score dict and walks per-doc
value dicts (_collect_group_values/_build_groups — reference
read/index/group.rs semantics). Both must produce identical groups:
same value combos, same per-group ranked ids/scores (ties doc-asc),
same main hits and counts.
"""

import numpy as np
import pytest

from oramacore_tpu.read import ReadSide

from .utils import TestContext

_COLORS = ["red", "blue", "green", "black", None]
_WORDS = ["shoe", "boot", "heel", "flat", "strap", "sole", "lace"]


def _docs(n, seed=11):
    rng = np.random.default_rng(seed)
    docs = []
    for i in range(n):
        words = rng.choice(_WORDS, size=int(rng.integers(2, 5)),
                           replace=False).tolist()
        words += [f"f{i}x{j}" for j in range(i % 13)]
        d = {"id": str(i), "t": " ".join(words),
             "flag": bool(i % 3 == 0), "price": int(i % 4)}
        color = _COLORS[i % len(_COLORS)]
        if color is not None:
            d["color"] = color
        if i % 9 == 0:
            d["_omc"] = 1.5
        docs.append(d)
    return docs


def _groups_of(res):
    return {
        tuple(g.values): [(h.id, round(h.score, 5)) for h in g.result]
        for g in (res.groups or [])
    }


def _assert_groups_match(a, b, q=None, tol=1e-4):
    ga, gb = _groups_of(a), _groups_of(b)
    assert set(ga) == set(gb), (q, set(ga), set(gb))
    for combo in ga:
        pa, pb = ga[combo], gb[combo]
        assert len(pa) == len(pb), (q, combo, pa, pb)
        sa = [s for _, s in pa]
        sb = [s for _, s in pb]
        assert np.allclose(sa, sb, rtol=tol, atol=tol), (q, combo, pa, pb)
        # tie runs: equal-score spans may order ids differently
        i = 0
        while i < len(sa):
            j = i
            while j + 1 < len(sa) and abs(sa[j + 1] - sa[i]) <= tol * max(
                abs(sa[i]), 1.0
            ):
                j += 1
            if j < len(sa) - 1 or len(sa) < len(ga[combo]):
                assert {d for d, _ in pa[i:j + 1]} == {
                    d for d, _ in pb[i:j + 1]
                }, (q, combo, pa, pb)
            i = j + 1


def _search_both(ctx, coll, params, monkeypatch):
    """Run the same grouped search via the host flow then the fused
    device flow, asserting each actually took its path."""
    fused_calls = []
    from oramacore_tpu.index import search_exec

    orig = search_exec.StringSearchTopK.search_topk_grouped

    def spy(self, *a, **kw):
        fused_calls.append(True)
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        search_exec.StringSearchTopK, "search_topk_grouped", spy
    )
    orig_spec = ReadSide._device_group_spec
    monkeypatch.setattr(
        ReadSide, "_device_group_spec", lambda self, idx, params: None
    )
    host = coll.search(dict(params))
    assert not fused_calls
    monkeypatch.setattr(ReadSide, "_device_group_spec", orig_spec)
    fused = coll.search(dict(params))
    assert fused_calls, "device group path did not engage"
    return host, fused


@pytest.fixture()
def ctx():
    c = TestContext()
    yield c
    c.close()


def _setup(ctx, n=140):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(_docs(n))
    ctx.commit_all()
    return coll, idx


def test_fused_groups_string_parity(ctx, monkeypatch):
    coll, _ = _setup(ctx)
    for params in (
        {"term": "shoe boot", "limit": 10,
         "groupBy": {"properties": ["color"], "maxResults": 5}},
        {"term": "heel", "limit": 3,
         "groupBy": {"properties": ["color"], "maxResults": 2}},
        {"term": "strap sole lace", "limit": 10, "threshold": 0.67,
         "groupBy": {"properties": ["color"], "maxResults": 4}},
    ):
        host, fused = _search_both(ctx, coll, params, monkeypatch)
        _assert_groups_match(host, fused, params)
        assert host.count == fused.count, params
        assert [h.id for h in host.hits] == [h.id for h in fused.hits], (
            params
        )


def test_fused_groups_bool_filtered_tombstones(ctx, monkeypatch):
    coll, idx = _setup(ctx)
    idx.delete_documents([str(i) for i in range(0, 140, 10)])
    params = {
        "term": "shoe", "limit": 5,
        "where": {"price": {"gte": 1}},
        "groupBy": {"properties": ["flag"], "maxResults": 6},
    }
    host, fused = _search_both(ctx, coll, params, monkeypatch)
    _assert_groups_match(host, fused, params)
    assert host.count == fused.count
    # groups are over the FILTERED set (unlike the facet quirk)
    for g in fused.groups:
        for h in g.result:
            n = int(h.id.split(":", 1)[1])
            assert n % 4 >= 1 and n % 10 != 0


def test_fused_groups_number_parity(ctx, monkeypatch):
    """Numeric group keys ride the device path (r5 widening: distinct
    slab values -> group ids, filter_fields.group_id_column) with
    host-identical groups."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(_docs(400))
    ctx.commit_all()
    for q in ("shoe", "boot heel"):
        params = {"term": q, "groupBy": {"properties": ["price"],
                                         "maxResults": 4}}
        host, fused = _search_both(ctx, coll, params, monkeypatch)
        _assert_groups_match(host, fused, q)
        assert [h.id for h in host.hits] == [h.id for h in fused.hits]


def test_fused_groups_multi_property_parity(ctx, monkeypatch):
    """Multi-property combos ride the device path (mixed-radix combined
    ids + cartesian tuple labels): same combos, same pages as the host
    cartesian flow — including docs missing one of the properties
    (dropped, like _build_groups)."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(_docs(400))
    ctx.commit_all()
    for props in (["color", "flag"], ["flag", "price"],
                  ["color", "flag", "price"]):
        params = {"term": "shoe", "groupBy": {"properties": props,
                                              "maxResults": 3}}
        host, fused = _search_both(ctx, coll, params, monkeypatch)
        _assert_groups_match(host, fused, props)


def test_fused_groups_fallbacks(ctx, monkeypatch):
    """Ineligible shapes keep the host flow and stay correct:
    multi-valued column, maxResults > 64 (numbers and multi-property
    combos engage the device path since r5)."""
    from oramacore_tpu.index import search_exec

    fused_calls = []
    orig = search_exec.StringSearchTopK.search_topk_grouped

    def spy(self, *a, **kw):
        fused_calls.append(True)
        return orig(self, *a, **kw)

    monkeypatch.setattr(
        search_exec.StringSearchTopK, "search_topk_grouped", spy
    )
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents([
        {"id": str(i), "t": "shoe", "n": i % 3,
         "color": ["red", "blue"][i % 2],
         "tags": ["a", "b"] if i % 2 else ["a"]}
        for i in range(30)
    ])
    ctx.commit_all()
    for params in (
        {"term": "shoe", "groupBy": {"properties": ["tags"]}},
        {"term": "shoe", "groupBy": {"properties": ["color", "tags"]}},
        {"term": "shoe",
         "groupBy": {"properties": ["color"], "maxResults": 100}},
    ):
        out = coll.search(dict(params))
        assert out.groups, params
        assert not fused_calls, params


def _search_both_matchall(ctx, coll, params, monkeypatch):
    """Host dict flow vs the vectorized match-all group flow
    (read._matchall_group_pages), asserting each took its path."""
    vec_calls = []
    orig_pages = ReadSide._matchall_group_pages

    def spy(m, gid, G, R):
        vec_calls.append(True)
        return orig_pages(m, gid, G, R)

    orig_spec = ReadSide._device_group_spec
    monkeypatch.setattr(
        ReadSide, "_device_group_spec", lambda self, idx, params: None
    )
    host = coll.search(dict(params))
    monkeypatch.setattr(ReadSide, "_device_group_spec", orig_spec)
    monkeypatch.setattr(
        ReadSide, "_matchall_group_pages", staticmethod(spy)
    )
    vec = coll.search(dict(params))
    assert vec_calls, "vectorized match-all group path did not engage"
    return host, vec


def test_matchall_groups_parity(ctx, monkeypatch):
    """MATCH-ALL (empty term) group-by rides the vectorized presence-
    mask flow instead of the O(corpus) per-doc dict walk: same groups,
    same doc-asc pages, same counts — tombstones and filters
    included."""
    coll, idx = _setup(ctx)
    idx.delete_documents([str(i) for i in range(0, 140, 11)])
    for params in (
        {"term": "", "limit": 10,
         "groupBy": {"properties": ["color"], "maxResults": 5}},
        {"term": "", "limit": 5, "where": {"price": {"gte": 2}},
         "groupBy": {"properties": ["flag"], "maxResults": 6}},
    ):
        host, vec = _search_both_matchall(ctx, coll, params, monkeypatch)
        _assert_groups_match(host, vec, params)
        assert host.count == vec.count, params
        assert [h.id for h in host.hits] == [h.id for h in vec.hits], (
            params
        )


def test_matchall_groups_page_budget(ctx, monkeypatch):
    """The chunked scan stops early once every group page is full and
    still returns the FIRST maxResults docs per group in doc order."""
    coll, _ = _setup(ctx, n=140)
    params = {"term": "", "limit": 3,
              "groupBy": {"properties": ["color"], "maxResults": 2}}
    host, vec = _search_both_matchall(ctx, coll, params, monkeypatch)
    _assert_groups_match(host, vec, params)
    for g in vec.groups or []:
        assert len(g.result) <= 2
