"""Behavioral depth for group-by / sort / facets / filter trees, modeled
on the reference suites (groupby.rs 1,144 LoC, filter.rs 986, sort.rs,
facets.rs): multi-valued cartesian groups, group limits, sort edge
cases, boundary-inclusive ranges, nested boolean trees.
"""

import pytest

from .utils import TestContext


@pytest.fixture()
def ctx():
    c = TestContext()
    yield c
    c.close()


def ids_of(result):
    return [h.id.split(":", 1)[1] for h in result.hits]


def catalog(ctx):
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents([
        {"id": "1", "t": "shirt alpha", "color": "red", "size": "m",
         "price": 10.0, "stock": True, "tags": ["sale", "new"]},
        {"id": "2", "t": "shirt beta", "color": "red", "size": "l",
         "price": 20.0, "stock": False, "tags": ["sale"]},
        {"id": "3", "t": "shirt gamma", "color": "blue", "size": "m",
         "price": 30.0, "stock": True, "tags": ["new"]},
        {"id": "4", "t": "shirt delta", "color": "blue", "size": "l",
         "price": 40.0, "stock": True, "tags": []},
        {"id": "5", "t": "shirt epsilon", "color": "green", "size": "m",
         "price": 50.0, "stock": False, "tags": ["clearance"]},
    ])
    return coll, idx


# ---------------------------------------------------------------------------
# group-by
# ---------------------------------------------------------------------------

def test_group_by_multi_property_cartesian(ctx):
    coll, idx = catalog(ctx)
    out = coll.search({
        "term": "shirt",
        "groupBy": {"properties": ["color", "size"], "maxResults": 10},
    })
    combos = {tuple(g.values) for g in out.groups}
    assert ("red", "m") in combos and ("red", "l") in combos
    assert ("blue", "m") in combos and ("green", "m") in combos
    # every group's hits actually carry that combo
    for g in out.groups:
        for h in g.result:
            doc = h.document
            assert doc["color"] == g.values[0]
            assert doc["size"] == g.values[1]


def test_group_by_multivalued_field_doc_in_many_groups(ctx):
    coll, idx = catalog(ctx)
    out = coll.search({
        "term": "shirt",
        "groupBy": {"properties": ["tags"], "maxResults": 10},
    })
    by_tag = {tuple(g.values)[0]: set(ids_of_group(g)) for g in out.groups}
    assert "1" in by_tag["sale"] and "1" in by_tag["new"]  # doc in 2 groups
    assert by_tag["clearance"] == {"5"}
    # doc 4 (empty tags) appears in no group
    assert all("4" not in members for members in by_tag.values())


def ids_of_group(g):
    return [h.id.split(":", 1)[1] for h in g.result]


def test_group_by_max_results_caps_each_group(ctx):
    coll, idx = catalog(ctx)
    out = coll.search({
        "term": "shirt",
        "groupBy": {"properties": ["color"], "maxResults": 1},
    })
    assert out.groups
    for g in out.groups:
        assert len(g.result) == 1


def test_group_by_boolean_property(ctx):
    coll, idx = catalog(ctx)
    out = coll.search({
        "term": "shirt",
        "groupBy": {"properties": ["stock"], "maxResults": 10},
    })
    vals = {tuple(g.values)[0]: set(ids_of_group(g)) for g in out.groups}
    assert vals[True] == {"1", "3", "4"}
    assert vals[False] == {"2", "5"}


def test_group_by_respects_filters(ctx):
    coll, idx = catalog(ctx)
    out = coll.search({
        "term": "shirt",
        "where": {"price": {"lte": 30}},
        "groupBy": {"properties": ["color"], "maxResults": 10},
    })
    all_members = {m for g in out.groups for m in ids_of_group(g)}
    assert all_members == {"1", "2", "3"}


# ---------------------------------------------------------------------------
# sort
# ---------------------------------------------------------------------------

def test_sort_desc_and_asc(ctx):
    coll, idx = catalog(ctx)
    out = coll.search({
        "term": "shirt",
        "sortBy": {"property": "price", "order": "desc"},
    })
    assert ids_of(out) == ["5", "4", "3", "2", "1"]
    out = coll.search({
        "term": "shirt",
        "sortBy": {"property": "price", "order": "asc"},
    })
    assert ids_of(out) == ["1", "2", "3", "4", "5"]


def test_sort_missing_field_docs_rank_last(ctx):
    coll, idx = catalog(ctx)
    idx.insert_documents([{"id": "nofield", "t": "shirt zeta"}])
    out = coll.search({
        "term": "shirt",
        "sortBy": {"property": "price", "order": "asc"},
    })
    assert ids_of(out)[-1] == "nofield"


def test_sort_with_pagination_is_consistent(ctx):
    coll, idx = catalog(ctx)
    p1 = coll.search({
        "term": "shirt", "limit": 2,
        "sortBy": {"property": "price", "order": "asc"},
    })
    p2 = coll.search({
        "term": "shirt", "limit": 2, "offset": 2,
        "sortBy": {"property": "price", "order": "asc"},
    })
    p3 = coll.search({
        "term": "shirt", "limit": 2, "offset": 4,
        "sortBy": {"property": "price", "order": "asc"},
    })
    assert ids_of(p1) + ids_of(p2) + ids_of(p3) == ["1", "2", "3", "4", "5"]


def test_sort_by_bool(ctx):
    coll, idx = catalog(ctx)
    out = coll.search({
        "term": "shirt",
        "sortBy": {"property": "stock", "order": "desc"},
    })
    got = ids_of(out)
    assert set(got[:3]) == {"1", "3", "4"}  # stock=True first under desc


# ---------------------------------------------------------------------------
# facets
# ---------------------------------------------------------------------------

def test_facet_number_range_boundaries_inclusive(ctx):
    coll, idx = catalog(ctx)
    out = coll.search({
        "term": "shirt",
        "facets": {"price": {"ranges": [
            {"from": 10, "to": 30},   # inclusive both ends: docs 1,2,3
            {"from": 30, "to": 50},   # docs 3,4,5 (30 in both ranges)
        ]}},
    })
    values = out.facets["price"].values
    assert values["10-30"] == 3
    assert values["30-50"] == 3


def test_multiple_facets_one_query(ctx):
    coll, idx = catalog(ctx)
    out = coll.search({
        "term": "shirt",
        "facets": {
            "color": {},
            "stock": {"true": True, "false": True},
        },
    })
    assert out.facets["color"].values == {"red": 2, "blue": 2, "green": 1}
    assert out.facets["stock"].values == {"true": 3, "false": 2}


def test_facet_counts_follow_matches_not_corpus(ctx):
    coll, idx = catalog(ctx)
    idx.insert_documents([
        {"id": "hat", "t": "wool hat", "color": "red", "price": 5.0},
    ])
    out = coll.search({"term": "shirt", "facets": {"color": {}}})
    # the hat is red but doesn't match "shirt": not counted
    assert out.facets["color"].values["red"] == 2


# ---------------------------------------------------------------------------
# filter trees
# ---------------------------------------------------------------------------

def test_nested_and_or_not_tree_e2e(ctx):
    coll, idx = catalog(ctx)
    out = coll.search({
        "term": "shirt",
        "where": {
            "or": [
                {"and": [{"color": "red"}, {"stock": True}]},   # doc 1
                {"price": {"gte": 45}},                          # doc 5
            ],
        },
    })
    assert set(ids_of(out)) == {"1", "5"}
    out = coll.search({
        "term": "shirt",
        "where": {"not": {"color": "blue"}},
    })
    assert set(ids_of(out)) == {"1", "2", "5"}


def test_between_and_string_list_filters(ctx):
    coll, idx = catalog(ctx)
    out = coll.search({
        "term": "shirt",
        "where": {"price": {"between": [15, 45]}},
    })
    assert set(ids_of(out)) == {"2", "3", "4"}
    out = coll.search({
        "term": "shirt",
        "where": {"color": ["red", "green"]},
    })
    assert set(ids_of(out)) == {"1", "2", "5"}


def test_filters_survive_commit_and_reload(ctx):
    coll, idx = catalog(ctx)
    ctx2 = ctx.reload()
    try:
        from oramacore_tpu.types import SearchParams

        out = ctx2.reader.search(
            coll.collection_id, coll.read_key,
            SearchParams.from_json({
                "term": "shirt",
                "where": {"and": [{"size": "m"}, {"stock": True}]},
            }),
        )
        assert {h.id.split(":", 1)[1] for h in out.hits} == {"1", "3"}
    finally:
        ctx2.orama.stop()


def test_threshold_with_filters(ctx):
    coll, idx = catalog(ctx)
    out = coll.search({
        "term": "shirt alpha",
        "threshold": 1.0,              # every token must match
        "where": {"stock": True},
    })
    assert ids_of(out) == ["1"]


# ---------------------------------------------------------------------------
# fulltext behaviors from the reference suite not yet covered e2e
# (fulltext_search.rs: tolerance, exact multi-term, unknown property on
# multi-index collections, stopword-only queries)
# ---------------------------------------------------------------------------

def test_tolerance_fuzzy_e2e(ctx):
    """A typo'd query matches with tolerance (fulltext_search.rs
    test_fulltext_tolerance); without tolerance it does not."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents([
        {"id": "1", "t": "chocolate brownie recipe"},
        {"id": "2", "t": "vanilla pudding"},
    ])
    miss = coll.search({"term": "chocolat"})  # stem may still differ
    hit = coll.search({"term": "chocolqte", "tolerance": 1})
    assert ids_of(hit) == ["1"]
    strict = coll.search({"term": "chocolqte"})
    assert strict.count == 0
    # committed state keeps tolerance working
    ctx.commit_all()
    hit = coll.search({"term": "chocolqte", "tolerance": 1})
    assert ids_of(hit) == ["1"]


def test_exact_multi_terms_e2e(ctx):
    """Exact mode matches surface forms only, per token
    (fulltext_search.rs test_fulltext_exact_multi_terms)."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents([
        {"id": "1", "t": "running shoes store"},
        {"id": "2", "t": "run shoe stores"},
    ])
    # stems collide ("run"/"running"), exact separates them
    loose = coll.search({"term": "running shoes"})
    assert loose.count == 2
    exact = coll.search({"term": "running shoes", "exact": True})
    assert ids_of(exact) == ["1"]
    exact2 = coll.search({"term": "run shoe", "exact": True})
    assert ids_of(exact2) == ["2"]


def test_unknown_property_on_multi_index_collection(ctx):
    """Searching a property that exists in only ONE index of a
    collection must not error — indexes lacking it contribute nothing
    (fulltext_search.rs
    test_fulltext_ignore_unknown_property_on_multi_index_collection)."""
    coll = ctx.create_collection()
    idx_a = coll.create_index("books")
    idx_b = coll.create_index("movies")
    idx_a.insert_documents([{"id": "b1", "title": "dune the novel"}])
    idx_b.insert_documents([{"id": "m1", "director": "denis villeneuve",
                             "name": "dune the film"}])
    out = coll.search({"term": "dune", "properties": ["title"]})
    assert ids_of(out) == ["b1"]
    out = coll.search({"term": "villeneuve", "properties": ["director"]})
    assert ids_of(out) == ["m1"]
    # both indexes contribute on '*'
    out = coll.search({"term": "dune"})
    assert {i for i in ids_of(out)} == {"b1", "m1"}


def test_deep_pagination_is_stable_across_commit(ctx):
    """Page windows tile the result set without overlap or gaps, before
    and after commit (fulltext_search.rs test_fulltext_search_offset)."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents([
        {"id": str(i), "t": "common word " + " ".join(f"x{j}" for j in range(i % 3))}
        for i in range(25)
    ])

    def pages():
        seen = []
        for off in range(0, 30, 7):
            out = coll.search({"term": "common", "limit": 7, "offset": off})
            seen.extend(ids_of(out))
        return seen

    before = pages()
    assert len(before) == 25 and len(set(before)) == 25
    ctx.commit_all()
    after = pages()
    assert len(after) == 25 and len(set(after)) == 25


def test_facets_counted_on_term_matched_set(ctx):
    """Facets count only docs matching the term (reference facets.rs
    test_facets_should_based_on_term — doc 3 doesn't match and must not
    be counted)."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "text": "text", "flag": True, "number": 1},
            {"id": "2", "text": "text text", "flag": False, "number": 2},
            {"id": "3", "text": "another", "flag": True, "number": 1},
        ]
    )
    out = coll.search(
        {
            "term": "text",
            "facets": {
                "flag": {"true": True, "false": True},
                "number": {"ranges": [{"from": 0, "to": 10}]},
            },
        }
    )
    assert out.count == 2
    assert out.facets["flag"].values == {"true": 1, "false": 1}
    assert list(out.facets["number"].values.values()) == [2]


def test_empty_term_sort_with_filter_same_key_value(ctx):
    """Empty term + sortBy on a column where every hit shares the key +
    filter (reference sort.rs test_sort_with_filter_same_key_value:
    the filtered-out doc must not leak into the sorted hits)."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "name": "Document One", "number": 2, "is_active": True},
            {"id": "2", "name": "Document Two", "number": 2, "is_active": False},
            {"id": "3", "name": "Document Three", "number": 2, "is_active": True},
        ]
    )
    out = coll.search(
        {
            "term": "",
            "sortBy": {"property": "number", "order": "ASC"},
            "where": {"is_active": True},
        }
    )
    assert out.count == 2
    got = set(ids_of(out))
    assert got == {"1", "3"}


def test_facets_ride_the_fused_bitmap_path(ctx):
    """Fulltext facet searches stay on the fused dispatch (round-3
    session 4): the kernel returns the match set as packed bits
    (ops/bm25.py with_bitmap) and facet counting consumes the unpacked
    mask — no dense score vector crosses the device boundary. With
    filters, the unfiltered-rescore quirk runs a SECOND bitmap
    dispatch over the alive set. Tombstoned docs never count."""
    from oramacore_tpu.index import search_exec

    bitmap_calls = []
    orig = search_exec.StringSearchTopK.search_topk

    def spy(self, *a, **kw):
        if kw.get("with_bitmap"):
            bitmap_calls.append(True)
        return orig(self, *a, **kw)

    search_exec.StringSearchTopK.search_topk = spy
    try:
        coll, _ = catalog(ctx)
        # unfiltered facet search: ONE bitmap dispatch
        out = coll.search({
            "term": "shirt",
            "limit": 10,
            "facets": {"color": {}},
        })
        assert len(bitmap_calls) == 1
        reds = out.facets["color"].values.get("red", 0)
        assert reds == 2  # docs 1 and 2 match "shirt" and are red
        # filtered facet search: facets count the UNFILTERED match set
        # (reference search.rs:345-396 quirk) -> second bitmap dispatch
        bitmap_calls.clear()
        out = coll.search({
            "term": "shirt",
            "limit": 10,
            "where": {"size": "m"},
            "facets": {"color": {}},
        })
        assert len(bitmap_calls) == 2
        assert out.facets["color"].values.get("red", 0) == 2  # unfiltered
        assert all(h.document["size"] == "m" for h in out.hits)
        # group_by disables the fused path (needs the dense score set);
        # facet results must still be identical
        bitmap_calls.clear()
        out2 = coll.search({
            "term": "shirt",
            "limit": 10,
            "facets": {"color": {}},
            "group_by": {"properties": ["size"]},
        })
        assert not bitmap_calls
        assert out2.facets["color"].values == out.facets["color"].values \
            or out2.facets["color"].values.get("red") == 2
    finally:
        search_exec.StringSearchTopK.search_topk = orig


def test_facets_bitmap_excludes_tombstones(ctx):
    from oramacore_tpu.index import search_exec

    bitmap_calls = []
    orig = search_exec.StringSearchTopK.search_topk

    def spy(self, *a, **kw):
        if kw.get("with_bitmap"):
            bitmap_calls.append(True)
        return orig(self, *a, **kw)

    search_exec.StringSearchTopK.search_topk = spy
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([
            {"id": str(i), "t": "widget common", "c": "a" if i % 2 else "b"}
            for i in range(20)
        ])
        ctx.commit_all()
        idx.delete_documents([str(i) for i in range(0, 20, 4)])  # 5 gone
        out = coll.search({
            "term": "widget", "limit": 5, "facets": {"c": {}},
        })
        assert bitmap_calls  # fused bitmap engaged despite tombstones
        vals = out.facets["c"].values
        assert sum(vals.values()) == 15
        assert out.count == 15
    finally:
        search_exec.StringSearchTopK.search_topk = orig


def test_fused_sort_by_field_parity(ctx):
    """Sorted fulltext searches ride ONE fused dispatch (ops/bm25.py
    bm25_search_sorted_packed): the sort column lives on device and only
    two (k,) pages return — order must equal the host path exactly:
    (value, doc-id asc) per direction, fieldless matches after in doc
    order, filters/thresholds respected, scores = BM25 (omc-multiplied)."""
    from oramacore_tpu.index import search_exec

    calls = []
    orig = search_exec.StringSearchTopK.search_topk_sorted

    def spy(self, *a, **kw):
        calls.append(True)
        return orig(self, *a, **kw)

    search_exec.StringSearchTopK.search_topk_sorted = spy
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = []
        for i in range(60):
            d = {"id": str(i), "t": "widget common stuff"}
            if i % 5 != 0:           # every 5th doc lacks the field
                d["price"] = float(i % 7)  # many ties
            if i % 3 == 0:
                d["_omc"] = 1.5
            docs.append(d)
        idx.insert_documents(docs)
        ctx.commit_all()
        idx.delete_documents(["7", "14"])  # tombstones

        def expected(order, where=None, limit=20, offset=0):
            alive = [d for d in docs if d["id"] not in ("7", "14")]
            if where:
                alive = [d for d in alive if where(d)]
            withf = [d for d in alive if "price" in d]
            withf.sort(key=lambda d: (
                -d["price"] if order == "desc" else d["price"],
                int(d["id"]),
            ))
            without = sorted(
                (d for d in alive if "price" not in d),
                key=lambda d: int(d["id"]),
            )
            return [d["id"] for d in withf + without][offset:offset + limit]

        for order in ("asc", "desc"):
            for where, pred in (
                (None, None),
                ({"price": {"lt": 4}},
                 lambda d: "price" in d and d["price"] < 4),
            ):
                for offset in (0, 5):
                    q = {
                        "term": "widget",
                        "limit": 20,
                        "offset": offset,
                        "sort_by": {"property": "price", "order": order},
                    }
                    if where:
                        q["where"] = where
                    out = coll.search(q)
                    got = [h.id.split(":", 1)[1] for h in out.hits]
                    want = expected(order, pred, 20, offset)
                    assert got == want, (order, where, offset, got, want)
                    assert out.count == len(
                        [d for d in docs
                         if d["id"] not in ("7", "14")
                         and (pred is None or pred(d))]
                    )
        # unfiltered searches took the fused sorted dispatch
        assert calls
        # omc multiplies the reported score, not the order
        out = coll.search({
            "term": "widget", "limit": 3,
            "sort_by": {"property": "price", "order": "asc"},
        })
        assert all(h.score > 0 for h in out.hits)
    finally:
        search_exec.StringSearchTopK.search_topk_sorted = orig


def test_fused_sort_fallbacks(ctx):
    """Group-by, facets, pin rules and missing columns keep the host
    sort path — results stay correct (no fused dispatch)."""
    from oramacore_tpu.index import search_exec

    calls = []
    orig = search_exec.StringSearchTopK.search_topk_sorted

    def spy(self, *a, **kw):
        calls.append(True)
        return orig(self, *a, **kw)

    search_exec.StringSearchTopK.search_topk_sorted = spy
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([
            {"id": str(i), "t": "widget", "price": float(i),
             "cat": "a" if i % 2 else "b"}
            for i in range(10)
        ])
        ctx.commit_all()
        out = coll.search({
            "term": "widget", "limit": 5,
            "sort_by": {"property": "price", "order": "desc"},
            "facets": {"cat": {}},
        })
        assert [h.id.split(":", 1)[1] for h in out.hits] == [
            "9", "8", "7", "6", "5"
        ]
        assert sum(out.facets["cat"].values.values()) == 10
        out = coll.search({
            "term": "widget", "limit": 5,
            "sort_by": {"property": "nosuchfield", "order": "asc"},
        })
        assert len(out.hits) == 5  # doc order (all lack the column)
        assert not calls
    finally:
        search_exec.StringSearchTopK.search_topk_sorted = orig


def test_hybrid_facets_ride_the_fused_bitmap_path(ctx):
    """Hybrid facet searches stay fused too (ops/hybrid.py with_bitmap):
    facet counts must equal the dense path's (same query with group_by
    added forces the dense dict flow — its facets are the oracle)."""
    from oramacore_tpu.index import search_exec

    bitmap_calls = []
    orig = search_exec.HybridSearchTopK.search_topk_hybrid

    def spy(self, *a, **kw):
        if kw.get("with_bitmap"):
            bitmap_calls.append(True)
        return orig(self, *a, **kw)

    search_exec.HybridSearchTopK.search_topk_hybrid = spy
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([
            {"id": str(i), "t": f"gadget {'red' if i % 3 else 'blue'}",
             "color": "red" if i % 3 else "blue"}
            for i in range(40)
        ])
        ctx.commit_all()
        q = {
            "term": "gadget red", "mode": "hybrid", "limit": 10,
            "similarity": 0.1, "facets": {"color": {}},
        }
        fused = coll.search(dict(q))
        assert bitmap_calls, "hybrid facet search did not use the bitmap"
        dense = coll.search({**q, "group_by": {"properties": ["color"]}})
        assert fused.facets["color"].values == dense.facets["color"].values
        assert fused.count == dense.count
        # filtered: the quirk counts facets over the UNFILTERED matches
        bitmap_calls.clear()
        q2 = {**q, "where": {"color": "red"}}
        fused_f = coll.search(dict(q2))
        dense_f = coll.search(
            {**q2, "group_by": {"properties": ["color"]}}
        )
        assert (fused_f.facets["color"].values
                == dense_f.facets["color"].values)
        assert len(bitmap_calls) == 2  # main + unfiltered quirk pass
    finally:
        search_exec.HybridSearchTopK.search_topk_hybrid = orig


def test_matchall_vectorized_paths(ctx):
    """Empty-term (match-all) searches page/count/facet/sort over the
    vectorized presence mask instead of an O(corpus) python dict:
    results must equal the legacy dict flow (forced via group_by) for
    plain, filtered, faceted, sorted and tombstoned match-alls."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    docs = []
    for i in range(50):
        d = {"id": str(i), "t": f"thing {i}", "n": i % 5,
             "cat": "x" if i % 2 else "y"}
        if i % 4 != 0:
            d["price"] = float(i % 6)
        docs.append(d)
    idx.insert_documents(docs)
    ctx.commit_all()
    idx.delete_documents(["3", "8"])

    # plain match-all: doc order, exact count
    out = coll.search({"term": "", "limit": 10})
    assert len(out.hits) == 10
    assert out.count == 48
    assert [h.id.split(":", 1)[1] for h in out.hits] == [
        "0", "1", "2", "4", "5", "6", "7", "9", "10", "11"
    ]
    # filter-only search (reference bugs.rs test_bug_1)
    out = coll.search({"term": "", "limit": 50, "where": {"n": {"eq": 1}}})
    ids = {h.id.split(":", 1)[1] for h in out.hits}
    assert ids == {str(i) for i in range(50)
                   if i % 5 == 1 and str(i) not in ("3", "8")}
    assert out.count == len(ids)
    # facets over the match-all mask
    out = coll.search({"term": "", "limit": 5, "facets": {"cat": {}}})
    assert sum(out.facets["cat"].values.values()) == 48
    # sorted match-all (browse): field order then fieldless by id
    out = coll.search({
        "term": "", "limit": 12,
        "sort_by": {"property": "price", "order": "desc"},
    })
    got = [h.id.split(":", 1)[1] for h in out.hits]
    alive = [d for d in docs if d["id"] not in ("3", "8")]
    withf = sorted(
        (d for d in alive if "price" in d),
        key=lambda d: (-d["price"], int(d["id"])),
    )
    without = sorted(
        (d for d in alive if "price" not in d), key=lambda d: int(d["id"])
    )
    want = [d["id"] for d in withf + without][:12]
    assert got == want, (got, want)
    # group_by keeps the dict flow and must agree on counts
    out2 = coll.search({
        "term": "", "limit": 5, "facets": {"cat": {}},
        "group_by": {"properties": ["cat"]},
    })
    assert out.count == 48 and out2.count == 48
