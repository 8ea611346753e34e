"""Multi-process TCP-oplog durability (VERDICT r2 next #6): one writer,
TWO reader nodes — one an OS subprocess that gets SIGKILLed mid-stream
and restarted — must converge to byte-identical search results.

The in-process reader is the control; the subprocess reader exercises
the real recovery path: tail resume from the committed offset, replay
dedup per collection/index, torn-state tolerance after an unclean death
(reference rabbit.rs:37-90 HA semantics + read/mod.rs:511-517 replay).
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

import pytest

from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.types import SearchParams

from .utils import wait_for

READER_SCRIPT = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import build_orama
from oramacore_tpu.types import SearchParams

data_dir, port, status_file = sys.argv[1], int(sys.argv[2]), sys.argv[3]
cfg = OramacoreConfig()
cfg.data_dir = data_dir
cfg.role = "reader"
cfg.reader_side.input = {{
    "type": "tcp-stream", "host": "127.0.0.1", "port": port,
}}
cfg.reader_side.insert_batch_commit_size = 200  # commit often mid-stream
node = build_orama(cfg, start_consumer=True)
r = node.read_side
while True:
    status = {{"count": 0, "offset": int(r.committed_offset), "hits": None}}
    try:
        coll = r.collections.get("c")
        if coll is not None:
            status["count"] = coll.document_count()
            out = r.search(
                "c", sys.argv[4],
                SearchParams.from_json({{"term": "alpha beta", "limit": 10}}),
            )
            status["hits"] = [[h.id, round(h.score, 6)] for h in out.hits]
            status["total"] = out.count
    except Exception as e:  # noqa: BLE001
        status["error"] = str(e)
    tmp = status_file + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(status, fh)
    os.replace(tmp, status_file)
    time.sleep(0.1)
"""


def test_kill9_reader_converges_byte_identical(tmp_path):
    stream = str(tmp_path / "ops.stream")
    wcfg = OramacoreConfig()
    wcfg.data_dir = str(tmp_path / "writer-node")
    wcfg.role = "writer"
    wcfg.auth.master_api_key = "mk"
    wcfg.writer_side.output = {
        "type": "tcp-stream", "path": stream, "host": "127.0.0.1",
        "port": 0, "fsync": True,
    }
    wcfg.writer_side.insert_batch_commit_size = 10_000_000
    writer = build_orama(wcfg, sync_embeddings=True)
    port = writer.write_side.op_sender.tcp_server.port

    # in-process control reader
    ccfg = OramacoreConfig()
    ccfg.data_dir = str(tmp_path / "control-reader")
    ccfg.role = "reader"
    ccfg.reader_side.input = {
        "type": "tcp-stream", "host": "127.0.0.1", "port": port,
    }
    ccfg.reader_side.insert_batch_commit_size = 10_000_000
    control = build_orama(ccfg, start_consumer=True)

    script = tmp_path / "reader_proc.py"
    script.write_text(READER_SCRIPT.format(repo=os.getcwd()))
    status_file = str(tmp_path / "status.json")
    sub_dir = str(tmp_path / "sub-reader")

    def read_status():
        try:
            with open(status_file) as fh:
                return json.load(fh)
        except Exception:  # noqa: BLE001
            return {}

    def spawn(read_key):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        return subprocess.Popen(
            [sys.executable, str(script), sub_dir, str(port), status_file,
             read_key],
            env=env,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )

    proc = None
    try:
        w = writer.write_side
        coll = w.create_collection("mk", "c")
        w.create_index("c", coll.write_api_key, "main")
        proc = spawn(coll.read_api_key)

        words = ["alpha", "beta", "gamma", "delta", "epsilon"]
        total = 0
        for batch in range(12):
            docs = [
                {
                    "id": str(total + i),
                    "t": " ".join(
                        words[(total + i + j) % 5] for j in range(3)
                    ) + f" u{total + i}",
                    "n": (total + i) % 7,
                }
                for i in range(100)
            ]
            w.insert_documents("c", "main", coll.write_api_key, docs)
            total += 100
            w.embedding_queue.flush_and_wait()
            if batch == 4:
                # SIGKILL the subprocess reader MID-STREAM (it has seen
                # some ops — possibly mid-commit — but not all).
                # Generous deadline: a fresh JAX subprocess can take
                # minutes just to import on a loaded single-core host
                # (r4 verdict: this test flaked purely from CPU
                # contention with the old 4 s budget).
                wait_for(lambda: read_status().get("count", 0) > 100,
                         attempts=6000, delay=0.05)
                os.kill(proc.pid, signal.SIGKILL)
                proc.wait(timeout=30)
        # restart the killed reader: it must resume from its committed
        # offset and replay the tail without duplicating applied ops
        os.unlink(status_file)
        proc = spawn(coll.read_api_key)

        r = control.read_side
        wait_for(
            lambda: r.collections.get("c") is not None
            and r.collections["c"].document_count() == total,
            attempts=6000, delay=0.05,
        )
        # the restarted subprocess pays the JAX import again — same
        # load-tolerant budget as the boot wait above
        wait_for(lambda: read_status().get("count", 0) == total,
                 attempts=6000, delay=0.05)

        ctrl_out = r.search(
            "c", coll.read_api_key,
            SearchParams.from_json({"term": "alpha beta", "limit": 10}),
        )
        ctrl_hits = [[h.id, round(h.score, 6)] for h in ctrl_out.hits]
        sub = read_status()
        # byte-identical convergence: same hit ids, same scores (to the
        # serialized precision), same total match count
        assert sub["hits"] == ctrl_hits, (sub["hits"], ctrl_hits)
        assert sub["total"] == ctrl_out.count
    finally:
        if proc is not None and proc.poll() is None:
            proc.kill()  # exact PID only — never pattern-match kills
            proc.wait(timeout=30)
        control.stop()
        writer.stop()
