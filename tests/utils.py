"""Test harness mirroring the reference's TestContext shape
(src/tests/utils.rs): a REAL writer+reader pair in-process over the
in-memory op channel, tempdir data dirs, `wait_for` convergence polling,
and `reload()` round-trips.
"""

from __future__ import annotations

import shutil
import tempfile
import time
from typing import Any, Callable, Dict, List, Optional

from oramacore_tpu.config import OramacoreConfig
from oramacore_tpu.runtime import Orama, build_orama
from oramacore_tpu.types import SearchParams

MASTER_KEY = "master-key-test"


def wait_for(fn: Callable[[], Any], attempts: int = 2000, delay: float = 0.002):
    """Poll until fn() returns truthy / stops raising
    (reference utils.rs:238-260)."""
    last_exc = None
    for _ in range(attempts):
        try:
            out = fn()
            if out or out is None:
                return out
        except AssertionError as e:
            last_exc = e
        time.sleep(delay)
    if last_exc:
        raise last_exc
    raise TimeoutError("wait_for did not converge")


class TestContext:
    def __init__(self, data_dir: Optional[str] = None, llm_resolve_mode=None):
        import threading

        self._pump_lock = threading.Lock()
        self._own_dir = data_dir is None
        self.data_dir = data_dir or tempfile.mkdtemp(prefix="oramacore-test-")
        self.config = self._make_config(self.data_dir)
        self.orama: Orama = build_orama(
            self.config, sync_embeddings=True, start_consumer=False,
            llm_resolve_mode=llm_resolve_mode,
        )
        self._n = 0

    @staticmethod
    def _make_config(data_dir: str) -> OramacoreConfig:
        cfg = OramacoreConfig()
        cfg.data_dir = data_dir
        cfg.auth.master_api_key = MASTER_KEY
        # huge commit thresholds so tests control commits (utils.rs:87-162)
        cfg.writer_side.insert_batch_commit_size = 10_000_000
        cfg.reader_side.insert_batch_commit_size = 10_000_000
        return cfg

    @property
    def writer(self):
        return self.orama.write_side

    @property
    def reader(self):
        return self.orama.read_side

    def pump(self):
        """Deliver all pending ops to the read side. Serialized: op
        application is single-consumer in production (the start_consumer
        thread); tests calling pump from several threads (searchers +
        ingesters) must not interleave applies."""
        with self._pump_lock:
            self.orama.write_side.embedding_queue.flush_and_wait()
            return self.orama.read_side.pump()

    # -- fluent helpers (reference TestCollectionClient) -----------------

    def create_collection(self, **kwargs) -> "TestCollectionClient":
        self._n += 1
        cid = kwargs.pop("collection_id", f"coll-{self._n}")
        coll = self.writer.create_collection(MASTER_KEY, cid, **kwargs)
        self.pump()
        return TestCollectionClient(self, cid, coll.write_api_key, coll.read_api_key)

    def commit_all(self):
        self.pump()
        self.writer.commit()
        self.reader.commit(force=True)

    def reload(self) -> "TestContext":
        """Stop everything and rebuild both sides from the same data dirs
        (reference utils.rs:299-313)."""
        self.commit_all()
        self.orama.stop()
        new = TestContext.__new__(TestContext)
        import threading

        new._pump_lock = threading.Lock()
        new._own_dir = self._own_dir
        new.data_dir = self.data_dir
        new.config = self._make_config(self.data_dir)
        new.orama = build_orama(new.config, sync_embeddings=True, start_consumer=False)
        new._n = self._n
        return new

    def close(self):
        self.orama.stop()
        if self._own_dir:
            shutil.rmtree(self.data_dir, ignore_errors=True)


class TestCollectionClient:
    def __init__(self, ctx: TestContext, collection_id: str, write_key: str, read_key: str):
        self.ctx = ctx
        self.collection_id = collection_id
        self.write_key = write_key
        self.read_key = read_key
        self._n = 0

    def create_index(self, index_id: Optional[str] = None, **kwargs) -> "TestIndexClient":
        self._n += 1
        iid = index_id or f"index-{self._n}"
        self.ctx.writer.create_index(self.collection_id, self.write_key, iid, **kwargs)
        self.ctx.pump()
        return TestIndexClient(self, iid)

    def search(self, params: Dict[str, Any]):
        self.ctx.pump()
        return self.ctx.reader.search(
            self.collection_id, self.read_key, SearchParams.from_json(params)
        )

    def stats(self):
        return self.ctx.reader.collection_stats(self.collection_id, self.read_key)


class TestIndexClient:
    def __init__(self, coll: TestCollectionClient, index_id: str):
        self.coll = coll
        self.index_id = index_id

    def insert_documents(self, docs: List[Dict[str, Any]]):
        stats = self.coll.ctx.writer.insert_documents(
            self.coll.collection_id, self.index_id, self.coll.write_key, docs
        )
        self.coll.ctx.pump()
        return stats

    def delete_documents(self, user_ids: List[str]):
        n = self.coll.ctx.writer.delete_documents(
            self.coll.collection_id, self.index_id, self.coll.write_key, user_ids
        )
        self.coll.ctx.pump()
        return n

    def insert_pin_rule(self, rule: Dict[str, Any]):
        self.coll.ctx.writer.insert_pin_rule(
            self.coll.collection_id, self.coll.write_key, rule
        )
        self.coll.ctx.pump()


def ids_of(result) -> List[str]:
    """User doc ids of hits (reference extrapolate_ids_from_result)."""
    return [h.id.split(":", 1)[1] for h in result.hits]
