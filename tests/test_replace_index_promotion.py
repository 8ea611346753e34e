"""Field-type promotion through temp-index replacement, per type.

Reference: six dedicated suites (replace_index_{number,bool,date,
geopoint,string_filter,string}_promotion.rs) assert the same flow per
field type: runtime index with data -> temp index -> typed docs into the
temp -> commit -> replace (promote) -> field searchable/filterable ->
commit -> reload -> data persists.
"""

import pytest

from oramacore_tpu.types import SearchParams

from .utils import TestCollectionClient, TestContext, ids_of


@pytest.fixture()
def ctx():
    c = TestContext()
    yield c
    c.close()


CASES = {
    "number": {
        "docs": [{"id": str(i), "name": f"item-{i}", "price": 10.0 * (i + 1)}
                 for i in range(8)],
        "query": {"term": "item",
                  "where": {"price": {"between": [30.0, 50.0]}}},
        "expect": {"2", "3", "4"},
    },
    "bool": {
        "docs": [{"id": str(i), "name": f"item-{i}", "active": i % 2 == 0}
                 for i in range(6)],
        "query": {"term": "item", "where": {"active": True}},
        "expect": {"0", "2", "4"},
    },
    "date": {
        "docs": [{"id": str(i), "name": f"item-{i}",
                  "created": f"2024-0{i + 1}-15T00:00:00Z"}
                 for i in range(6)],
        "query": {"term": "item",
                  "where": {"created": {"between": ["2024-03-01T00:00:00Z",
                                                   "2024-05-01T00:00:00Z"]}}},
        "expect": {"2", "3"},
    },
    "geopoint": {
        "docs": [
            {"id": "0", "name": "rome", "loc": {"lat": 41.9, "lon": 12.5}},
            {"id": "1", "name": "milan", "loc": {"lat": 45.46, "lon": 9.19}},
            {"id": "2", "name": "naples", "loc": {"lat": 40.85, "lon": 14.27}},
        ],
        "query": {"term": "rome naples milan", "where": {"loc": {
            "radius": {"coordinates": {"lat": 41.9, "lon": 12.5},
                       "value": 250, "unit": "km"}
        }}},
        "expect": {"0", "2"},
    },
    "string_filter": {
        "docs": [{"id": str(i), "name": f"item-{i}",
                  "color": ["red", "blue", "green"][i % 3]}
                 for i in range(6)],
        "query": {"term": "item", "where": {"color": "blue"}},
        "expect": {"1", "4"},
    },
    "string": {
        "docs": [{"id": str(i),
                  "name": ["alpha thing", "beta thing", "gamma thing"][i]}
                 for i in range(3)],
        "query": {"term": "beta"},
        "expect": {"1"},
    },
}


@pytest.mark.parametrize("kind", sorted(CASES))
def test_field_promotion_from_temp_index(ctx, kind):
    case = CASES[kind]
    coll = ctx.create_collection()
    runtime = coll.create_index("main")
    runtime.insert_documents(
        [{"id": "original-1", "name": "original thing", "price": 100.0}]
    )

    temp = ctx.writer.create_temporary_index(
        coll.collection_id, coll.write_key, "main"
    )
    ctx.pump()
    ctx.writer.insert_documents(
        coll.collection_id, temp.index_id, coll.write_key, case["docs"]
    )
    ctx.pump()
    # commit while the temp index exists (reference step 4)
    ctx.commit_all()

    ctx.writer.replace_index(
        coll.collection_id, coll.write_key, "main", temp.index_id
    )
    ctx.pump()

    def check(client):
        out = client.search(case["query"])
        assert {h.id.split(":", 1)[1] for h in out.hits} == case["expect"], kind
        # the pre-promotion doc is gone with the replaced index
        out2 = client.search({"term": "original"})
        assert out2.count == 0

    check(coll)
    # commit after promotion and verify again (reference step 7)
    ctx.commit_all()
    check(coll)
    # reload from disk and verify persistence (reference step 8)
    ctx2 = ctx.reload()
    try:
        c2 = TestCollectionClient(
            ctx2, coll.collection_id, coll.write_key, coll.read_key
        )
        check(c2)
    finally:
        ctx2.orama.stop()


def test_promoted_index_accepts_new_documents(ctx):
    """After promotion the runtime id keeps accepting inserts and the
    doc-id map carried over from the temp index."""
    coll = ctx.create_collection()
    runtime = coll.create_index("main")
    runtime.insert_documents([{"id": "a", "t": "old content"}])
    temp = ctx.writer.create_temporary_index(
        coll.collection_id, coll.write_key, "main"
    )
    ctx.writer.insert_documents(
        coll.collection_id, temp.index_id, coll.write_key,
        [{"id": "b", "t": "fresh content"}],
    )
    ctx.writer.replace_index(
        coll.collection_id, coll.write_key, "main", temp.index_id
    )
    ctx.pump()
    runtime.insert_documents([{"id": "c", "t": "fresh addendum"}])
    out = coll.search({"term": "fresh"})
    assert {h.id.split(":", 1)[1] for h in out.hits} == {"b", "c"}
    # upsert of a doc first written in the temp index replaces, not dups
    runtime.insert_documents([{"id": "b", "t": "fresh rewrite"}])
    out = coll.search({"term": "fresh"})
    assert {h.id.split(":", 1)[1] for h in out.hits} == {"b", "c"}
    out = coll.search({"term": "rewrite"})
    assert ids_of(out) == ["b"]
