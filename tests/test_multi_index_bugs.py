"""Multi-index edge cases mirroring the reference's regression suite
(src/tests/multi_index.rs:169-520): cross-index field type mismatches,
deleted indexes named in the search request, committed-only filter
fields, and cross-index sort interleaving.
"""

import pytest

from .utils import TestContext, ids_of


@pytest.fixture()
def ctx():
    c = TestContext()
    yield c
    c.close()


def test_field_type_mismatch_across_indexes(ctx):
    """Same field name indexed as number in one index and string in the
    other (multi_index.rs:169 test_field_type_mismatch_bug): a typed
    filter must apply where the type matches and contribute nothing —
    not an error — where it doesn't."""
    coll = ctx.create_collection()
    idx1 = coll.create_index()
    idx2 = coll.create_index()
    idx1.insert_documents(
        [
            {"id": "doc1", "text": "item", "value": 10},
            {"id": "doc2", "text": "item", "value": 20},
        ]
    )
    idx2.insert_documents(
        [
            {"id": "doc3", "text": "item", "value": "hello"},
            {"id": "doc4", "text": "item", "value": "world"},
        ]
    )

    assert coll.search({"term": "item"}).count == 4

    # Number filter: only index-1 has numeric "value"; index-2 must not
    # error and must not match.
    out = coll.search({"term": "item", "where": {"value": {"gte": 15}}})
    assert out.count == 1
    assert ids_of(out) == ["doc2"]

    # String filter: only index-2 has string-filter "value".
    out = coll.search({"term": "item", "where": {"value": "hello"}})
    assert out.count == 1
    assert ids_of(out) == ["doc3"]

    # Same behavior from committed state.
    ctx.commit_all()
    out = coll.search({"term": "item", "where": {"value": {"gte": 15}}})
    assert ids_of(out) == ["doc2"]
    out = coll.search({"term": "item", "where": {"value": "hello"}})
    assert ids_of(out) == ["doc3"]


def test_deleted_index_named_in_search(ctx):
    """Searching with an `indexes` list naming a deleted index
    (multi_index.rs:278 test_deleted_index_validation_bug): the search
    must succeed and return only live-index documents."""
    coll = ctx.create_collection()
    idx1 = coll.create_index()
    idx2 = coll.create_index()
    idx1.insert_documents([{"id": "1", "text": "test document one"}])
    idx2.insert_documents([{"id": "2", "text": "test document two"}])

    ctx.writer.delete_index(coll.collection_id, coll.write_key, idx2.index_id)
    ctx.pump()

    out = coll.search({"term": "test", "indexes": [idx1.index_id, idx2.index_id]})
    assert out.count == 1
    assert ids_of(out) == ["1"]

    # A never-existing index id still errors.
    import pytest as _pytest

    from oramacore_tpu.read import ReadError

    with _pytest.raises(ReadError):
        coll.search({"term": "test", "indexes": ["no-such-index"]})

    # The deleted-id tombstone survives commit + reload.
    ctx2 = ctx.reload()
    try:
        coll2 = ctx2.reader.collections[coll.collection_id]
        assert idx2.index_id in coll2.deleted_indexes
        out = ctx2.reader.search(
            coll.collection_id, coll.read_key,
            __import__("oramacore_tpu.types", fromlist=["SearchParams"])
            .SearchParams.from_json(
                {"term": "test", "indexes": [idx1.index_id, idx2.index_id]}
            ),
        )
        assert len(out.hits) == 1
    finally:
        ctx2.orama.stop()


def test_committed_only_field_filter(ctx):
    """Filter on a field whose data lives only in the committed layer
    (multi_index.rs:350 test_committed_only_field_filter_bug)."""
    coll = ctx.create_collection()
    idx = coll.create_index()
    idx.insert_documents(
        [
            {"id": "1", "text": "test", "status": "active"},
            {"id": "2", "text": "test", "status": "inactive"},
        ]
    )
    ctx.commit_all()

    out = coll.search({"term": "test", "where": {"status": "active"}})
    assert out.count == 1
    assert ids_of(out) == ["1"]


def test_multi_index_sort_interleaves(ctx):
    """sortBy must produce a single global order across indexes
    (multi_index.rs:406 test_multi_index_sorting_bug)."""
    coll = ctx.create_collection()
    idx1 = coll.create_index()
    idx2 = coll.create_index()
    idx1.insert_documents(
        [
            {"id": "doc1", "text": "item", "priority": 1},
            {"id": "doc2", "text": "item", "priority": 3},
        ]
    )
    idx2.insert_documents(
        [
            {"id": "doc3", "text": "item", "priority": 2},
            {"id": "doc4", "text": "item", "priority": 4},
        ]
    )

    out = coll.search({"term": "item", "sortBy": {"property": "priority", "order": "ASC"}})
    assert out.count == 4
    assert ids_of(out) == ["doc1", "doc3", "doc2", "doc4"]

    out = coll.search({"term": "item", "sortBy": {"property": "priority", "order": "DESC"}})
    assert out.count == 4
    assert ids_of(out) == ["doc4", "doc2", "doc3", "doc1"]

    # Mixed committed/live: commit, add a doc to each index, re-sort.
    ctx.commit_all()
    idx1.insert_documents([{"id": "doc5", "text": "item", "priority": 0}])
    idx2.insert_documents([{"id": "doc6", "text": "item", "priority": 5}])
    out = coll.search({"term": "item", "sortBy": {"property": "priority", "order": "ASC"}})
    assert ids_of(out) == ["doc5", "doc1", "doc3", "doc2", "doc4", "doc6"]


def test_facets_with_different_shaped_indexes(ctx):
    """Facets over a multi-index collection where only one index carries
    the faceted field (facets.rs test_facets_with_different_shaped_index)."""
    coll = ctx.create_collection()
    idx1 = coll.create_index()
    idx2 = coll.create_index()
    idx1.insert_documents(
        [
            {"id": "a", "text": "thing", "genre": "rpg"},
            {"id": "b", "text": "thing", "genre": "fps"},
        ]
    )
    idx2.insert_documents([{"id": "c", "text": "thing"}])

    out = coll.search(
        {"term": "thing", "facets": {"genre": {}}}
    )
    assert out.count == 3
    vals = out.facets["genre"].values
    assert vals.get("rpg") == 1 and vals.get("fps") == 1
