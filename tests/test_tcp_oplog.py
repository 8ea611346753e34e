"""Networked op-log transport: TCP tail of the writer's durable file
stream with reconnect/backoff (reference operation/rabbit.rs semantics —
HA producer log + consumers starting from stored offsets).
"""

import time

from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.oplog import (
    Operation,
    TcpLogServer,
    TcpOperationReceiver,
    FileStreamSender,
)
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.types import SearchParams

from .utils import wait_for


def test_tcp_transport_basics(tmp_path):
    path = str(tmp_path / "ops.stream")
    sender = FileStreamSender(path, fsync=True)
    server = TcpLogServer(path, "127.0.0.1", 0)
    try:
        sender.send(Operation("kv_insert", None, {"key": "a", "value": 1}))
        sender.send(Operation("kv_insert", None, {"key": "b", "value": 2}))
        rx = TcpOperationReceiver("127.0.0.1", server.port, start_offset=0)
        got = [rx.recv(timeout=2.0) for _ in range(2)]
        assert [o for o, _ in got] == [1, 2]
        assert got[1][1].body["key"] == "b"
        # live tail: a new op arrives over the open connection
        sender.send(Operation("kv_insert", None, {"key": "c", "value": 3}))
        off, op = rx.recv(timeout=2.0)
        assert off == 3 and op.body["key"] == "c"
        # offset-resume: a fresh consumer from offset 2 sees only op 3
        rx2 = TcpOperationReceiver("127.0.0.1", server.port, start_offset=2)
        off, op = rx2.recv(timeout=2.0)
        assert off == 3
        rx.close()
        rx2.close()
    finally:
        server.close()
        sender.close()


def test_consumer_reconnects_with_backoff(tmp_path):
    """Consumer started BEFORE the server comes up must connect once it
    does; a server restart mid-stream must not lose or duplicate ops."""
    path = str(tmp_path / "ops.stream")
    sender = FileStreamSender(path)
    sender.send(Operation("kv_insert", None, {"key": "x", "value": 1}))

    rx = TcpOperationReceiver("127.0.0.1", 1, start_offset=0)  # nothing there
    assert rx.recv(timeout=0.3) is None  # backs off, no crash

    server = TcpLogServer(path, "127.0.0.1", 0)
    rx.port = server.port
    off, op = rx.recv(timeout=5.0)
    assert off == 1 and op.body["key"] == "x"

    # kill the server; consumer sees the drop and reconnects to a new one
    server.close()
    sender.send(Operation("kv_insert", None, {"key": "y", "value": 2}))
    server2 = TcpLogServer(path, "127.0.0.1", 0)
    rx.port = server2.port
    try:
        off, op = rx.recv(timeout=10.0)
        assert off == 2 and op.body["key"] == "y"
    finally:
        rx.close()
        server2.close()
        sender.close()


def test_writer_reader_nodes_over_tcp_survive_reader_restart(tmp_path):
    stream = str(tmp_path / "ops.stream")

    wcfg = OramacoreConfig()
    wcfg.data_dir = str(tmp_path / "writer-node")
    wcfg.role = "writer"
    wcfg.auth.master_api_key = "mk"
    wcfg.writer_side.output = {
        "type": "tcp-stream", "path": stream, "host": "127.0.0.1", "port": 0,
        "fsync": True,
    }
    wcfg.writer_side.insert_batch_commit_size = 10_000_000
    writer = build_orama(wcfg, sync_embeddings=True)
    port = writer.write_side.op_sender.tcp_server.port

    rcfg = OramacoreConfig()
    rcfg.data_dir = str(tmp_path / "reader-node")
    rcfg.role = "reader"
    rcfg.reader_side.input = {
        "type": "tcp-stream", "host": "127.0.0.1", "port": port,
    }
    rcfg.reader_side.insert_batch_commit_size = 10_000_000
    reader = build_orama(rcfg, start_consumer=True)
    try:
        w = writer.write_side
        coll = w.create_collection("mk", "c")
        w.create_index("c", coll.write_api_key, "main")
        w.insert_documents(
            "c", "main", coll.write_api_key,
            [{"id": "1", "t": "replicated over tcp", "n": 1}],
        )
        w.embedding_queue.flush_and_wait()
        r = reader.read_side
        wait_for(
            lambda: r.collections.get("c") is not None
            and r.collections["c"].document_count() == 1
        )
        out = r.search(
            "c", coll.read_api_key, SearchParams.from_json({"term": "tcp"})
        )
        assert out.count == 1

        # reader restart: commit, stop, rebuild — resumes from its offset
        r.commit(force=True)
        committed = r.committed_offset
        reader.stop()
        w.insert_documents(
            "c", "main", coll.write_api_key,
            [{"id": "2", "t": "after reader restart"}],
        )
        w.embedding_queue.flush_and_wait()
        reader2 = build_orama(rcfg, start_consumer=True)
        try:
            r2 = reader2.read_side
            assert r2.committed_offset == committed
            wait_for(lambda: r2.collections["c"].document_count() == 2)
            out = r2.search(
                "c", coll.read_api_key,
                SearchParams.from_json({"term": "restart"}),
            )
            assert out.count == 1
        finally:
            reader2.stop()
    finally:
        writer.stop()
