"""Document + entity lifecycle semantics across commit boundaries.

Mirrors the reference suites with no prior counterpart here:
- update_docs.rs — updating a doc must retire its OLD terms/vectors/
  filter values everywhere (live layer, committed segments, after
  commit, after reload);
- replace_doc_on_insert.rs — re-inserting an existing user id replaces
  the document silently (upsert), including across the live/committed
  boundary;
- delete_doc.rs — deletes exclude docs from search/counts/facets in
  every state (live, committed, deleted-then-committed, after reload),
  and delete -> reinsert resurrects cleanly;
- entity_lifecycle.rs — delete a collection or index and recreate it
  under the SAME id: the new incarnation must not leak data from the
  old one, including after a full reload from disk.
"""

import numpy as np

from .utils import TestContext, ids_of, wait_for


def _facet_count(res, field, key):
    return res.facets[field].values.get(key, 0)


def test_update_retires_old_terms_every_state():
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([
            {"id": "a", "t": "zebra quagga", "n": 1},
            {"id": "b", "t": "walrus", "n": 2},
        ])
        # live-layer update: old term must stop matching immediately
        ctx.writer.update_documents(
            coll.collection_id, idx.index_id, coll.write_key,
            [{"id": "a", "t": "alpaca llama", "n": 7}],
        )
        ctx.pump()
        assert ids_of(coll.search({"term": "zebra"})) == []
        assert ids_of(coll.search({"term": "alpaca"})) == ["a"]
        # filter values updated too
        assert ids_of(
            coll.search({"term": "alpaca", "where": {"n": {"eq": 7}}})
        ) == ["a"]
        assert ids_of(
            coll.search({"term": "", "where": {"n": {"eq": 1}}})
        ) == []

        # committed update: doc lives in a committed segment, the update
        # arrives in the live layer — old committed postings must lose
        ctx.commit_all()
        ctx.writer.update_documents(
            coll.collection_id, idx.index_id, coll.write_key,
            [{"id": "a", "t": "heron stork", "n": 9}],
        )
        ctx.pump()
        assert ids_of(coll.search({"term": "alpaca"})) == []
        assert ids_of(coll.search({"term": "heron"})) == ["a"]
        # and across another commit + reload
        ctx.commit_all()
        ctx = ctx.reload()
        coll2 = _reopen(ctx, coll)
        assert ids_of(coll2.search({"term": "alpaca"})) == []
        assert ids_of(coll2.search({"term": "zebra"})) == []
        assert ids_of(coll2.search({"term": "heron"})) == ["a"]
        assert ids_of(
            coll2.search({"term": "", "where": {"n": {"eq": 9}}})
        ) == ["a"]
    finally:
        ctx.close()


def _reopen(ctx, coll):
    from .utils import TestCollectionClient

    return TestCollectionClient(
        ctx, coll.collection_id, coll.write_key, coll.read_key
    )


def test_insert_same_id_replaces_silently():
    """replace_doc_on_insert.rs: insert with an existing user id is an
    upsert — one doc, new content, stable count."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([{"id": "x", "t": "original badger"}])
        idx.insert_documents([{"id": "x", "t": "replacement ferret"}])
        res = coll.search({"term": "ferret"})
        assert ids_of(res) == ["x"]
        assert coll.search({"term": "badger"}).count == 0
        # the old version is gone from the docstore page too
        assert res.hits[0].document["t"] == "replacement ferret"
        # replace across the committed boundary
        ctx.commit_all()
        idx.insert_documents([{"id": "x", "t": "third marmot"}])
        assert ids_of(coll.search({"term": "marmot"})) == ["x"]
        assert coll.search({"term": "ferret"}).count == 0
        ctx.commit_all()
        assert ids_of(coll.search({"term": "marmot"})) == ["x"]
        assert coll.search({"term": "ferret"}).count == 0
        # document_count never exceeded 1 for the id
        st = coll.stats()
        assert st["document_count"] == 1
    finally:
        ctx.close()


def test_delete_matrix_live_committed_reload():
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        docs = [
            {"id": str(i), "t": f"otter w{i % 3}", "s": f"g{i % 2}"}
            for i in range(12)
        ]
        idx.insert_documents(docs)
        # live delete
        idx.delete_documents(["0", "1"])
        res = coll.search({"term": "otter", "limit": 20})
        assert set(ids_of(res)) == {str(i) for i in range(2, 12)}
        assert res.count == 10
        # facets exclude deleted docs
        res = coll.search({
            "term": "otter", "limit": 20,
            "facets": {"s": {}},
        })
        assert _facet_count(res, "s", "g0") == 5  # 2,4,6,8,10
        # committed delete: commit first, then delete from segments
        ctx.commit_all()
        idx.delete_documents(["2", "3"])
        res = coll.search({"term": "otter", "limit": 20})
        assert set(ids_of(res)) == {str(i) for i in range(4, 12)}
        assert res.count == 8
        # delete -> reinsert the same id resurrects with new content
        idx.insert_documents([{"id": "2", "t": "phoenix", "s": "g0"}])
        assert ids_of(coll.search({"term": "phoenix"})) == ["2"]
        assert "2" not in ids_of(coll.search({"term": "otter", "limit": 20}))
        # everything holds after commit + reload
        ctx.commit_all()
        ctx = ctx.reload()
        coll2 = _reopen(ctx, coll)
        res = coll2.search({"term": "otter", "limit": 20})
        assert set(ids_of(res)) == {str(i) for i in range(4, 12)}
        assert ids_of(coll2.search({"term": "phoenix"})) == ["2"]
        st = coll2.stats()
        assert st["document_count"] == 9  # 12 - 4 deleted + 1 reinsert
    finally:
        ctx.close()


def test_delete_all_documents_then_search():
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(
            [{"id": str(i), "t": "vole"} for i in range(5)]
        )
        ctx.commit_all()
        idx.delete_documents([str(i) for i in range(5)])
        res = coll.search({"term": "vole", "limit": 10})
        assert res.count == 0 and not res.hits
        ctx.commit_all()  # full merge with everything deleted
        res = coll.search({"term": "vole", "limit": 10})
        assert res.count == 0 and not res.hits
        # the index accepts new docs afterwards
        idx.insert_documents([{"id": "n", "t": "vole returns"}])
        assert ids_of(coll.search({"term": "vole"})) == ["n"]
    finally:
        ctx.close()


def test_collection_recreate_same_id_no_leak():
    """entity_lifecycle.rs: delete a collection, recreate it under the
    same id — the new one starts empty and the old docs never reappear,
    including after a reload from the same data dir."""
    from oramacore_tpu.types import SearchParams

    ctx = TestContext()
    try:
        coll = ctx.create_collection(collection_id="lifecycle")
        idx = coll.create_index("main")
        idx.insert_documents([{"id": "old", "t": "ghost data"}])
        ctx.commit_all()
        assert coll.search({"term": "ghost"}).count == 1

        ctx.writer.delete_collection(ctx.config.auth.master_api_key,
                                     "lifecycle")
        ctx.pump()
        # recreate under the same id
        coll2 = ctx.create_collection(collection_id="lifecycle")
        idx2 = coll2.create_index("main")
        idx2.insert_documents([{"id": "new", "t": "fresh data"}])
        res = coll2.search({"term": "ghost"})
        assert res.count == 0
        assert ids_of(coll2.search({"term": "fresh"})) == ["new"]
        # survives commit + reload (stale snapshots must not resurrect)
        ctx.commit_all()
        ctx = ctx.reload()
        coll3 = _reopen(ctx, coll2)
        assert coll3.search({"term": "ghost"}).count == 0
        assert ids_of(coll3.search({"term": "fresh"})) == ["new"]
    finally:
        ctx.close()


def test_index_delete_and_recreate_same_id():
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index("main")
        idx.insert_documents([{"id": "a", "t": "mammoth"}])
        ctx.commit_all()
        ctx.writer.delete_index(coll.collection_id, coll.write_key, "main")
        ctx.pump()
        res = coll.search({"term": "mammoth"})
        assert res.count == 0
        idx2 = coll.create_index("main")
        idx2.insert_documents([{"id": "b", "t": "dodo"}])
        assert ids_of(coll.search({"term": "dodo"})) == ["b"]
        assert coll.search({"term": "mammoth"}).count == 0
        ctx.commit_all()
        ctx = ctx.reload()
        coll2 = _reopen(ctx, coll)
        assert coll2.search({"term": "mammoth"}).count == 0
        assert ids_of(coll2.search({"term": "dodo"})) == ["b"]
    finally:
        ctx.close()


def test_update_changes_vector_ranking():
    """Updating a doc's text re-embeds it: vector search follows the
    NEW content (update_docs.rs vector-side assertions)."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([
            {"id": "a", "t": "red crimson scarlet"},
            {"id": "b", "t": "blue azure navy"},
        ])
        r1 = coll.search({"mode": "vector", "term": "red crimson scarlet",
                          "similarity": 0.1})
        assert ids_of(r1)[0] == "a"
        # swap the contents
        ctx.writer.update_documents(
            coll.collection_id, idx.index_id, coll.write_key,
            [{"id": "a", "t": "blue azure navy"},
             {"id": "b", "t": "red crimson scarlet"}],
        )
        ctx.pump()
        r2 = coll.search({"mode": "vector", "term": "red crimson scarlet",
                          "similarity": 0.1})
        assert ids_of(r2)[0] == "b"
        ctx.commit_all()
        r3 = coll.search({"mode": "vector", "term": "red crimson scarlet",
                          "similarity": 0.1})
        assert ids_of(r3)[0] == "b"
    finally:
        ctx.close()


def test_delete_missing_field_no_underflow():
    """Docs lacking a field interleaved with deletes + commits must not
    underflow per-field doc counts (reference delete_doc.rs:175
    test_delete_document_missing_field_underflow — the sequence below
    panicked the reference's field bookkeeping)."""
    from .utils import TestContext

    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(
            [
                {"id": "song_1", "title": "First Song", "artist": "Artist A"},
                {"id": "song_2", "title": "Second Song", "artist": "Artist B"},
            ]
        )
        ctx.commit_all()
        # drop the "artist" field's doc count to 0
        idx.delete_documents(["song_1", "song_2"])
        idx.insert_documents(
            [
                {"id": "song_3", "title": "Third Song"},  # no artist
                {"id": "song_4", "title": "Fourth Song", "artist": "Artist D"},
            ]
        )
        ctx.commit_all()
        idx.delete_documents(["song_3"])
        # this insert + commit triggered the reference panic
        idx.insert_documents(
            [{"id": "song_5", "title": "Fifth", "artist": "Artist E"}]
        )
        ctx.commit_all()
        out = coll.search({"term": "song"})
        assert out.count == 1  # only song_4's title contains "song"
        out = coll.search({"term": "artist"})
        assert out.count == 2  # song_4 + song_5
    finally:
        ctx.close()


def test_writer_stats_decrement_after_delete():
    """Writer-side document counts decrement on delete (reference
    delete_doc.rs test_writeside_stats_decrements_after_delete)."""
    from .utils import TestContext

    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(
            [
                {"id": "1", "text": "First document"},
                {"id": "2", "text": "Second document"},
                {"id": "3", "text": "Third document"},
            ]
        )
        wcoll = ctx.writer.collections[coll.collection_id]
        wi = wcoll.indexes[idx.index_id]
        assert len(wi.doc_id_map) == 3
        st = ctx.writer.collection_stats(wcoll)
        assert st["document_count"] == 3
        assert st["indexes"][0]["document_count"] == 3
        idx.delete_documents(["2"])
        assert len(wi.doc_id_map) == 2
        assert ctx.writer.collection_stats(wcoll)["document_count"] == 2
        # deleting an unknown id is a no-op
        idx.delete_documents(["nope"])
        assert len(wi.doc_id_map) == 2
    finally:
        ctx.close()
