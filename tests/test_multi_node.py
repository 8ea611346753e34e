"""Multi-node CQRS: writer-only + reader-only over the durable
file-stream op log (the RabbitMQ-streams-equivalent deployment,
reference lib.rs:234-307 + operation/rabbit.rs)."""

import time

from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.types import SearchParams

from .utils import wait_for


def test_writer_and_reader_as_separate_nodes(tmp_path):
    stream_path = str(tmp_path / "ops.stream")

    wcfg = OramacoreConfig()
    wcfg.data_dir = str(tmp_path / "writer-node")
    wcfg.role = "writer"
    wcfg.auth.master_api_key = "mk"
    wcfg.writer_side.output = {"type": "file-stream", "path": stream_path}
    wcfg.writer_side.insert_batch_commit_size = 10_000_000
    writer_node = build_orama(wcfg, sync_embeddings=True)
    assert writer_node.read_side is None

    rcfg = OramacoreConfig()
    rcfg.data_dir = str(tmp_path / "reader-node")
    rcfg.role = "reader"
    rcfg.reader_side.input = {"type": "file-stream", "path": stream_path}
    rcfg.reader_side.insert_batch_commit_size = 10_000_000
    reader_node = build_orama(rcfg, start_consumer=True)
    assert reader_node.write_side is None

    try:
        w = writer_node.write_side
        coll = w.create_collection("mk", "c")
        w.create_index("c", coll.write_api_key, "main")
        w.insert_documents(
            "c", "main", coll.write_api_key,
            [{"id": "1", "t": "replicated across nodes", "n": 7}],
        )
        w.embedding_queue.flush_and_wait()

        r = reader_node.read_side

        def converged():
            c = r.collections.get("c")
            return c is not None and c.document_count() == 1

        wait_for(converged)
        out = r.search(
            "c", coll.read_api_key, SearchParams.from_json({"term": "replicated"})
        )
        assert out.count == 1
        assert out.hits[0].document["n"] == 7

        # second reader replays the whole stream independently
        r2cfg = OramacoreConfig()
        r2cfg.data_dir = str(tmp_path / "reader-node-2")
        r2cfg.role = "reader"
        r2cfg.reader_side.input = {"type": "file-stream", "path": stream_path}
        reader2 = build_orama(r2cfg, start_consumer=True)
        try:
            r2 = reader2.read_side
            wait_for(
                lambda: r2.collections.get("c") is not None
                and r2.collections["c"].document_count() == 1
            )
            out = r2.search(
                "c", coll.read_api_key,
                SearchParams.from_json({"term": "replicated"}),
            )
            assert out.count == 1
        finally:
            reader2.stop()

        # reader restart resumes from committed offset without re-applying
        reader_node.read_side.commit(force=True)
        committed = reader_node.read_side.committed_offset
        reader_node.stop()
        reader_re = build_orama(rcfg, start_consumer=True)
        try:
            assert reader_re.read_side.committed_offset == committed
            w.insert_documents(
                "c", "main", coll.write_api_key,
                [{"id": "2", "t": "post-restart doc"}],
            )
            w.embedding_queue.flush_and_wait()
            r3 = reader_re.read_side
            wait_for(lambda: r3.collections["c"].document_count() == 2)
            out = r3.search(
                "c", coll.read_api_key,
                SearchParams.from_json({"term": "post restart"}),
            )
            assert out.count == 1
        finally:
            reader_re.stop()
    finally:
        writer_node.stop()
