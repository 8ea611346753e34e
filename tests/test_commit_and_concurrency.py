"""Commit-threshold, concurrency and shutdown tests (reference:
src/tests/commit.rs, concurrency.rs:13, shutdown.rs)."""

import threading

from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.types import SearchParams

from .utils import TestContext, ids_of, wait_for


def test_commit_after_operation_limit_reached(tmp_path):
    """Batch size 5, insert 30 docs → auto-commits happen
    (reference commit.rs:10 semantics, scaled down)."""
    cfg = OramacoreConfig()
    cfg.data_dir = str(tmp_path)
    cfg.auth.master_api_key = "mk"
    cfg.writer_side.insert_batch_commit_size = 5
    cfg.reader_side.insert_batch_commit_size = 5
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=False)
    try:
        coll = orama.write_side.create_collection("mk", "c")
        orama.write_side.create_index("c", coll.write_api_key, "main")
        for i in range(30):
            orama.write_side.insert_documents(
                "c", "main", coll.write_api_key,
                [{"id": str(i), "t": f"doc {i} common"}],
            )
        orama.write_side.embedding_queue.flush_and_wait()
        orama.read_side.pump()
        # read side auto-committed at least once
        assert orama.read_side.committed_offset > 0
        out = orama.read_side.search(
            "c", coll.read_api_key, SearchParams.from_json({"term": "common"})
        )
        assert out.count == 30
        # reload picks up committed state + replays the tail
        orama.write_side.commit()
        orama.read_side.commit(force=True)
        orama.stop()
        orama2 = build_orama(cfg, sync_embeddings=True, start_consumer=False)
        out = orama2.read_side.search(
            "c", coll.read_api_key, SearchParams.from_json({"term": "common"})
        )
        assert out.count == 30
        orama2.stop()
    finally:
        try:
            orama.stop()
        except Exception:
            pass


def test_insert_create_collection_concurrency():
    """Interleave inserts with collection creation on worker threads
    (reference concurrency.rs:13)."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        errors = []

        def inserter(worker):
            try:
                for i in range(20):
                    ctx.writer.insert_documents(
                        coll.collection_id, idx.index_id, coll.write_key,
                        [{"id": f"w{worker}-{i}", "t": f"worker {worker} doc"}],
                    )
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        def creator(n):
            try:
                for i in range(5):
                    ctx.writer.create_collection("master-key-test", f"side-{n}-{i}")
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=inserter, args=(w,)) for w in range(3)]
        threads += [threading.Thread(target=creator, args=(n,)) for n in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert errors == []
        ctx.pump()
        out = coll.search({"term": "worker", "limit": 100})
        assert out.count == 60
        assert len(ctx.reader.collections) == 1 + 10
    finally:
        ctx.close()


def test_shutdown_commits_everything(tmp_path):
    """Graceful shutdown force-commits both sides (reference shutdown.rs,
    lib.rs:178-185)."""
    cfg = OramacoreConfig()
    cfg.data_dir = str(tmp_path)
    cfg.auth.master_api_key = "mk"
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.insert_batch_commit_size = 10_000_000
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=True)
    coll = orama.write_side.create_collection("mk", "c")
    orama.write_side.create_index("c", coll.write_api_key, "main")
    orama.write_side.insert_documents(
        "c", "main", coll.write_api_key, [{"id": "1", "t": "survivor"}]
    )
    orama.write_side.embedding_queue.flush_and_wait()
    wait_for(lambda: orama.read_side.collections.get("c") is not None
             and orama.read_side.collections["c"].document_count() == 1)
    # no explicit commit calls — stop() must flush
    orama.stop()

    orama2 = build_orama(cfg, sync_embeddings=True, start_consumer=False)
    out = orama2.read_side.search(
        "c", coll.read_api_key, SearchParams.from_json({"term": "survivor"})
    )
    assert out.count == 1
    orama2.stop()


def test_index_id_reuse_after_delete():
    """Deleting and recreating an index with the same id must not leak
    old docs (reference index_id_reuse_bug.rs)."""
    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index("main")
        idx.insert_documents([{"id": "1", "t": "old world"}])
        assert coll.search({"term": "old"}).count == 1
        ctx.writer.delete_index(coll.collection_id, coll.write_key, "main")
        ctx.pump()
        idx2 = coll.create_index("main")
        idx2.insert_documents([{"id": "1", "t": "new world"}])
        assert coll.search({"term": "old"}).count == 0
        out = coll.search({"term": "new"})
        assert ids_of(out) == ["1"]
    finally:
        ctx.close()


def test_per_collection_operation_threshold(tmp_path):
    """A collection exceeding operation_threshold ops gets committed on
    its own (reference read/mod.rs:100-113 CommitScope::SelectedCollection)."""
    import os

    cfg = OramacoreConfig()
    cfg.data_dir = str(tmp_path)
    cfg.auth.master_api_key = "mk"
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.operation_threshold = 10
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=False)
    try:
        coll = orama.write_side.create_collection("mk", "busy")
        orama.write_side.create_index("busy", coll.write_api_key, "main")
        orama.write_side.insert_documents(
            "busy", "main", coll.write_api_key,
            [{"id": str(i), "t": f"doc {i}"} for i in range(20)],
        )
        orama.write_side.embedding_queue.flush_and_wait()
        orama.read_side.pump()
        # the per-collection threshold fired: index snapshot generation
        # dir exists (offset-N layout with a CURRENT pointer)
        idx_dir = os.path.join(
            cfg.data_dir, "reader", "collections", "busy", "indexes", "main"
        )
        assert os.path.exists(os.path.join(idx_dir, "CURRENT.json"))
        import json
        cur = json.load(open(os.path.join(idx_dir, "CURRENT.json")))
        gen = os.path.join(idx_dir, f"offset-{cur['offset']}")
        assert os.path.exists(os.path.join(gen, "index.json"))
        # but the GLOBAL offset did not advance (only full commits move it)
        assert orama.read_side.committed_offset == 0
    finally:
        orama.stop()


def test_concurrent_search_during_ingest():
    """Searches racing op application must never crash (live-layer dicts
    are guarded by the read-side RW state lock)."""
    import threading

    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([{"id": "seed", "t": "race condition target"}])
        errors = []
        stop = threading.Event()

        def searcher():
            while not stop.is_set():
                try:
                    coll.search({"term": "race target"})
                except Exception as e:  # noqa: BLE001
                    errors.append(e)
                    return

        def ingester():
            try:
                for i in range(100):
                    ctx.writer.insert_documents(
                        coll.collection_id, idx.index_id, coll.write_key,
                        [{"id": f"r{i}", "t": f"race doc {i} target"}],
                    )
                    ctx.pump()
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        threads = [threading.Thread(target=searcher) for _ in range(3)]
        ing = threading.Thread(target=ingester)
        for t in threads:
            t.start()
        ing.start()
        ing.join()
        stop.set()
        for t in threads:
            t.join()
        assert errors == []
        out = coll.search({"term": "race", "limit": 200})
        assert out.count == 101
    finally:
        ctx.close()


def test_deleted_index_snapshot_dirs_are_gced(tmp_path):
    import os

    from oramacore_tpu.config import OramacoreConfig
    from oramacore_tpu.runtime import build_orama

    cfg = OramacoreConfig()
    cfg.data_dir = str(tmp_path)
    cfg.auth.master_api_key = "mk"
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.insert_batch_commit_size = 10_000_000
    orama = build_orama(cfg, sync_embeddings=True, start_consumer=False)
    try:
        coll = orama.write_side.create_collection("mk", "c")
        for iid in ("keep", "drop"):
            orama.write_side.create_index("c", coll.write_api_key, iid)
            orama.write_side.insert_documents(
                "c", iid, coll.write_api_key, [{"id": "1", "t": f"in {iid}"}]
            )
        orama.write_side.embedding_queue.flush_and_wait()
        orama.read_side.pump()
        orama.read_side.commit(force=True)
        idx_root = os.path.join(
            cfg.data_dir, "reader", "collections", "c", "indexes"
        )
        assert sorted(os.listdir(idx_root)) == ["drop", "keep"]
        orama.write_side.delete_index("c", coll.write_api_key, "drop")
        orama.read_side.pump()
        orama.read_side.commit(force=True)
        assert os.listdir(idx_root) == ["keep"], "deleted index dir GC'd"
    finally:
        orama.stop()


def test_empty_index_reload():
    """commit.rs test_empty_index_reload: an index with no documents
    commits and reloads cleanly."""
    from .utils import TestCollectionClient, TestContext

    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        coll.create_index()
        ctx.commit_all()
        ctx2 = ctx.reload()
        try:
            c2 = TestCollectionClient(
                ctx2, coll.collection_id, coll.write_key, coll.read_key
            )
            stats = c2.stats()
            assert stats["document_count"] == 0
            assert len(stats["indexes"]) == 1
            # still usable after the empty reload
            ctx2.writer.insert_documents(
                coll.collection_id, stats["indexes"][0]["id"],
                coll.write_key, [{"id": "1", "t": "post-reload doc"}],
            )
            ctx2.pump()
            assert c2.search({"term": "post-reload"}).count == 1
        finally:
            ctx2.orama.stop()
    finally:
        ctx.close()


def test_empty_collection_reload():
    """commit.rs test_empty_collection_reload: a collection with no
    indexes commits and reloads."""
    from .utils import TestCollectionClient, TestContext

    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        ctx.commit_all()
        ctx2 = ctx.reload()
        try:
            c2 = TestCollectionClient(
                ctx2, coll.collection_id, coll.write_key, coll.read_key
            )
            stats = c2.stats()
            assert stats["indexes"] == []
        finally:
            ctx2.orama.stop()
    finally:
        ctx.close()


def test_commit_partial_fields():
    """commit.rs test_collection_commit_partial_fields: after a first
    doc with every field type, later docs touch ONE field each with a
    commit in between — only dirty fields compact, and every field
    stays queryable across reload."""
    from .utils import TestCollectionClient, TestContext

    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([{
            "id": "full", "text": "alpha words", "number": 0,
            "boolean": True, "geo": {"lat": 10.0, "lon": 20.0},
            "date": "2024-01-01T00:00:00Z",
        }])
        ctx.commit_all()
        partials = [
            {"id": "p-text", "text": "alpha partial"},
            {"id": "p-number", "number": 7},
            {"id": "p-boolean", "boolean": True},
            {"id": "p-geo", "geo": {"lat": 10.1, "lon": 20.1}},
            {"id": "p-date", "date": "2024-06-01T00:00:00Z"},
        ]
        for doc in partials:
            idx.insert_documents([doc])
            ctx.commit_all()  # compacts only the dirty field(s)

        def check(client):
            assert client.search({"term": "alpha"}).count == 2
            assert client.search(
                {"term": "", "where": {"number": 7}}
            ).count == 1
            assert client.search(
                {"term": "", "where": {"boolean": True}}
            ).count == 2
            out = client.search({"term": "", "where": {"geo": {
                "radius": {"coordinates": {"lat": 10.0, "lon": 20.0},
                           "value": 50, "unit": "km"}}}})
            assert out.count == 2
            assert client.search({"term": "", "where": {"date": {
                "gte": "2024-05-01T00:00:00Z"}}}).count == 1

        check(coll)
        ctx2 = ctx.reload()
        try:
            check(TestCollectionClient(
                ctx2, coll.collection_id, coll.write_key, coll.read_key
            ))
        finally:
            ctx2.orama.stop()
    finally:
        ctx.close()


def test_collection_continue_commit():
    """commit.rs test_collection_continue_commit: commit, keep
    inserting, commit again — both layers merge and survive reload."""
    from .utils import TestCollectionClient, TestContext

    ctx = TestContext()
    try:
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents([{"id": "1", "t": "first wave"}])
        ctx.commit_all()
        idx.insert_documents([{"id": "2", "t": "second wave"}])
        ctx.commit_all()
        idx.insert_documents([{"id": "3", "t": "third wave uncommitted"}])
        assert coll.search({"term": "wave"}).count == 3
        ctx2 = ctx.reload()  # reload commits pending state first
        try:
            c2 = TestCollectionClient(
                ctx2, coll.collection_id, coll.write_key, coll.read_key
            )
            assert c2.search({"term": "wave"}).count == 3
            for t, i in [("first", "1"), ("second", "2"), ("third", "3")]:
                out = c2.search({"term": t})
                assert [h.id.split(":", 1)[1] for h in out.hits] == [i]
        finally:
            ctx2.orama.stop()
    finally:
        ctx.close()


def test_concurrent_pruned_search_during_commits():
    """Round-3 slab incrementalism race check: searches on the PRUNED
    path race live inserts + commits (committed-portion cache swap +
    device-slab append under the build lock) without errors and with a
    consistent final state."""
    import threading

    from .utils import TestContext

    ctx = TestContext()
    try:
        ctx.reader.config.reader_side.pruning = "on"
        coll = ctx.create_collection()
        idx = coll.create_index()
        idx.insert_documents(
            [{"id": str(i), "t": f"alpha beta w{i % 13}"}
             for i in range(300)]
        )
        ctx.commit_all()
        stop = threading.Event()
        errors = []

        from oramacore_tpu.types import SearchParams

        def searcher():
            # search WITHOUT pumping: op application is single-consumer
            # in production (start_consumer thread); the TestContext
            # pump-on-search convenience is not safe from many threads
            while not stop.is_set():
                try:
                    out = ctx.reader.search(
                        coll.collection_id, coll.read_key,
                        SearchParams.from_json(
                            {"term": "alpha", "limit": 5}
                        ),
                    )
                    assert out.count >= 300 - 50
                except Exception as e:  # noqa: BLE001
                    errors.append(e)
                    return

        def churner():
            n = 300
            for round_ in range(6):
                idx.insert_documents(
                    [{"id": str(n + i), "t": f"alpha gamma w{i % 7}"}
                     for i in range(40)]
                )
                n += 40
                ctx.commit_all()
            stop.set()

        threads = [threading.Thread(target=searcher) for _ in range(3)]
        ch = threading.Thread(target=churner)
        for t in threads:
            t.start()
        ch.start()
        # generous join: on this 1-core host a concurrent pytest run can
        # stretch the 6 commit rounds well past 2 minutes; closing the
        # context while the churner still inserts shuts the writer's
        # tokenize pool under it ("cannot schedule new futures")
        ch.join(timeout=420)
        assert not ch.is_alive(), "churner did not finish; host overloaded"
        stop.set()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors[:1]
        out = coll.search({"term": "alpha", "limit": 5})
        assert out.count == 300 + 6 * 40
    finally:
        ctx.reader.config.reader_side.pruning = "off"
        ctx.close()
