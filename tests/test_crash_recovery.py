"""Crash-replay idempotency: per-collection commits must survive a crash
without double-applying replayed ops (reference offset-N snapshot dirs +
replay dedup, read/index/mod.rs:466-719, read/mod.rs:511-517).

Round-1 bug: commit_collection persisted snapshots WITHOUT advancing the
global offset; on crash + reload, ops since the last global commit
replayed against a snapshot that already contained them, doubling term
frequencies and duplicating filter rows.
"""

import json
import os

from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.types import SearchParams


def _writer_cfg(tmp_path, stream):
    cfg = OramacoreConfig()
    cfg.data_dir = str(tmp_path / "writer-node")
    cfg.role = "writer"
    cfg.auth.master_api_key = "mk"
    cfg.writer_side.output = {"type": "file-stream", "path": stream}
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    return cfg

def _reader_cfg(tmp_path, stream):
    cfg = OramacoreConfig()
    cfg.data_dir = str(tmp_path / "reader-node")
    cfg.role = "reader"
    cfg.reader_side.input = {"type": "file-stream", "path": stream}
    cfg.reader_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.operation_threshold = 10_000_000
    return cfg


def test_replay_after_partial_commit_is_idempotent(tmp_path):
    stream = str(tmp_path / "ops.stream")
    writer = build_orama(_writer_cfg(tmp_path, stream), sync_embeddings=True)
    rcfg = _reader_cfg(tmp_path, stream)
    reader = build_orama(rcfg, start_consumer=False)
    try:
        w = writer.write_side
        coll = w.create_collection("mk", "c")
        w.create_index("c", coll.write_api_key, "main")
        w.insert_documents(
            "c", "main", coll.write_api_key,
            [
                {"id": str(i), "t": "orange orange banana fruit salad",
                 "n": i}
                for i in range(8)
            ],
        )
        w.embedding_queue.flush_and_wait()
        r = reader.read_side
        r.pump()
        params = SearchParams.from_json({"term": "orange banana"})
        before = r.search("c", coll.read_api_key, params)
        assert before.count == 8

        # per-collection commit: snapshot persisted, GLOBAL offset stays 0
        r.commit_collection("c")
        assert r.committed_offset == 0
        assert r.collections["c"].committed_offset > 0

        # CRASH: abandon the reader without stop() (no final commit) and
        # reload from the same data dir — the full stream replays from
        # offset 0 against the already-committed snapshot
        reader2 = build_orama(rcfg, start_consumer=False)
        r2 = reader2.read_side
        try:
            assert r2.collections["c"].document_count() == 8
            r2.pump()  # replays everything; dedup must skip it all
            after = r2.search("c", coll.read_api_key, params)
            assert after.count == 8
            # byte-identical scores: tf must NOT have doubled
            b = {h.id: h.score for h in before.hits}
            a = {h.id: h.score for h in after.hits}
            assert a == b
            # a fresh doc after recovery still applies normally
            w.insert_documents(
                "c", "main", coll.write_api_key,
                [{"id": "new", "t": "orange grove"}],
            )
            w.embedding_queue.flush_and_wait()
            r2.pump()
            assert r2.collections["c"].document_count() == 9
        finally:
            reader2.stop()
    finally:
        writer.stop()


def test_snapshot_generations_and_current_pointer(tmp_path):
    """Commits write offset-N generation dirs; CURRENT points at the
    newest; at most one previous generation is retained."""
    stream = str(tmp_path / "ops.stream")
    writer = build_orama(_writer_cfg(tmp_path, stream), sync_embeddings=True)
    rcfg = _reader_cfg(tmp_path, stream)
    reader = build_orama(rcfg, start_consumer=False)
    try:
        w = writer.write_side
        coll = w.create_collection("mk", "c")
        w.create_index("c", coll.write_api_key, "main")
        r = reader.read_side
        idx_dir = os.path.join(
            rcfg.data_dir, "reader", "collections", "c", "indexes", "main"
        )
        gens_seen = []
        for round_no in range(3):
            w.insert_documents(
                "c", "main", coll.write_api_key,
                [{"id": f"{round_no}", "t": f"round {round_no} text"}],
            )
            w.embedding_queue.flush_and_wait()
            r.pump()
            r.commit_collection("c")
            cur = json.load(open(os.path.join(idx_dir, "CURRENT.json")))
            gens_seen.append(cur["offset"])
        assert gens_seen == sorted(set(gens_seen)), "offsets must increase"
        on_disk = sorted(
            int(n.split("-", 1)[1])
            for n in os.listdir(idx_dir)
            if n.startswith("offset-")
        )
        assert on_disk == sorted(gens_seen)[-2:], "keep current + 1 previous"
        # clean commit (no new ops) does not churn generations
        r.commit_collection("c")
        cur = json.load(open(os.path.join(idx_dir, "CURRENT.json")))
        assert cur["offset"] == gens_seen[-1]
    finally:
        reader.stop()
        writer.stop()


def test_torn_snapshot_falls_back_to_previous_generation(tmp_path):
    """A generation dir missing its index.json (crash mid-save, CURRENT
    not yet repointed... or repointed but files torn) must not brick the
    index: load falls back to the newest loadable generation."""
    stream = str(tmp_path / "ops.stream")
    writer = build_orama(_writer_cfg(tmp_path, stream), sync_embeddings=True)
    rcfg = _reader_cfg(tmp_path, stream)
    reader = build_orama(rcfg, start_consumer=False)
    try:
        w = writer.write_side
        coll = w.create_collection("mk", "c")
        w.create_index("c", coll.write_api_key, "main")
        w.insert_documents(
            "c", "main", coll.write_api_key, [{"id": "1", "t": "alpha beta"}]
        )
        w.embedding_queue.flush_and_wait()
        r = reader.read_side
        r.pump()
        r.commit_collection("c")
        w.insert_documents(
            "c", "main", coll.write_api_key, [{"id": "2", "t": "alpha gamma"}]
        )
        w.embedding_queue.flush_and_wait()
        r.pump()
        r.commit_collection("c")

        idx_dir = os.path.join(
            rcfg.data_dir, "reader", "collections", "c", "indexes", "main"
        )
        cur = json.load(open(os.path.join(idx_dir, "CURRENT.json")))
        # tear the current generation: drop its index.json
        os.unlink(os.path.join(idx_dir, f"offset-{cur['offset']}", "index.json"))

        reader2 = build_orama(rcfg, start_consumer=False)
        try:
            r2 = reader2.read_side
            # falls back to gen 1 (one doc), then replay restores doc 2
            r2.pump()
            out = r2.search(
                "c", coll.read_api_key, SearchParams.from_json({"term": "alpha"})
            )
            assert out.count == 2
        finally:
            reader2.stop()
    finally:
        reader.stop()
        writer.stop()
