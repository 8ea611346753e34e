"""Read side (query): CQRS query side.

Reference: src/collection_manager/sides/read/ — ReadSide facade
(mod.rs:159: op-log consumer w/ offset dedup :511-517, search :621,
commit w/ thresholds :394), CollectionReader (collection.rs:116),
search orchestration (search.rs:104-501), sort + pin rules (sort.rs),
facets (facet.rs), groups (group.rs).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import threading
import time
from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Dict, List, Optional, Sequence, Set, Tuple

import numpy as np

from ..config import OramacoreConfig
from ..embeddings import EmbeddingsService, Intent
from ..index.search_exec import PrunedPlanMixin, StringSearchExecutor

# fuzzy plans beyond this many ranges per token keep the dense path
# (the pruned worklist's earlier-span dedup costs NRE binary searches
# per posting)
PRUNED_MAX_RANGES = 48
from ..oplog import Operation, OperationReceiver
from ..storage.docstore import DocumentStore
from ..storage.files import atomic_write_json, read_json
from ..storage.kv import KV
from ..types import (
    AutoMode,
    FacetResult,
    FulltextMode,
    GroupedResult,
    HybridMode,
    SearchMode,
    SearchParams,
    SearchResult,
    SearchResultHit,
    VectorMode,
    WhereFilter,
)
from ..utils.tokenizer import NLPService
from ..utils.trace import span
from .pin_rules import Consequence, apply_promotions, apply_rules
from .read_index import ReadIndex


class ReadError(Exception):
    def __init__(self, message: str, status: int = 400):
        super().__init__(message)
        self.status = status


class CollectionReader:
    def __init__(
        self,
        collection_id: str,
        read_api_key: str,
        default_locale: str,
        embedding_model: str,
        nlp: NLPService,
        data_dir: str,
        description: Optional[str] = None,
        mcp_description: Optional[str] = None,
        write_api_key: Optional[str] = None,
    ):
        self.collection_id = collection_id
        self.read_api_key = read_api_key
        # the collection's WRITE key also grants reads (reference
        # api_key_chain.rs test_write_api_key_to_search)
        self.write_api_key = write_api_key
        self.default_locale = default_locale
        self.embedding_model = embedding_model
        self.description = description
        self.mcp_description = mcp_description
        self.nlp = nlp
        self.data_dir = data_dir
        self.indexes: Dict[str, ReadIndex] = {}
        self.aliases: Dict[str, str] = {}  # temp id -> runtime id after replace
        # ids of deleted indexes: a search naming one skips it instead of
        # 404ing (reference read/collection.rs calculate_index_to_search_on
        # validates against ALL indexes incl. deleted, then the search loop
        # skips them — tests/multi_index.rs:278)
        self.deleted_indexes: Set[str] = set()
        self.doc_storage = DocumentStore(os.path.join(data_dir, "docstore"))
        self.hooks: Dict[str, str] = {}
        self.pin_rules: Dict[str, Dict[str, Any]] = {}
        self.shelves: Dict[str, Dict[str, Any]] = {}
        self.values: Dict[str, str] = {}
        self._executors: Dict[str, StringSearchExecutor] = {}
        self._sharded_executors: Dict[str, Any] = {}
        # op-log offset covered by this collection's persisted snapshots;
        # ops at or below it are replays and must be skipped (reference
        # read/mod.rs:511-517 dedup, here per-collection so that
        # commit_collection — which does not advance the global offset —
        # stays idempotent under crash-replay)
        self.committed_offset = 0
        # persistent internal doc id -> ReadIndex (maintained on op apply;
        # hit hydration must not rebuild it per query — O(corpus))
        self.doc_index: Dict[int, ReadIndex] = {}

    def resolve_index(self, index_id: str) -> Optional[ReadIndex]:
        real = self.aliases.get(index_id, index_id)
        return self.indexes.get(real)

    def executor(self, index_id: str):
        from ..index.search_exec import HybridSearchTopK

        ex = self._executors.get(index_id)
        if ex is None:
            ex = self._executors[index_id] = HybridSearchTopK()
        return ex

    def runtime_indexes(self) -> List[ReadIndex]:
        return [i for i in self.indexes.values()]

    def document_count(self) -> int:
        return sum(i.document_count() for i in self.indexes.values())


ResolveModeFn = Callable[[str], str]


class ReadSide:
    """Applies the op stream and serves searches."""

    def __init__(
        self,
        config: OramacoreConfig,
        receiver_factory: Callable[[int], OperationReceiver],
        embeddings: EmbeddingsService,
        nlp: NLPService,
        llm_resolve_mode: Optional[ResolveModeFn] = None,
    ):
        self.config = config
        if config.reader_side.impact_cap:
            import logging

            logging.getLogger("oramacore_tpu.read").warning(
                "reader_side.impact_cap is DEPRECATED and now harmful: "
                "since the v3 slab layout, ranges are doc-sorted, so "
                "the cap keeps an arbitrary (lowest-doc-id) prefix — "
                "recall on capped terms will collapse. Use "
                "reader_side.pruning instead (exact candidate rescore)."
            )
        # per-search scratch (fused counts / OMC-applied / estimated
        # flags) is THREAD-LOCAL: searches run concurrently under the RW
        # lock's read side, so shared instance attributes race across
        # the whole search duration
        self._tls = threading.local()
        self.embeddings = embeddings
        self.nlp = nlp
        self.llm_resolve_mode = llm_resolve_mode
        self.data_dir = os.path.join(config.data_dir, "reader")
        os.makedirs(self.data_dir, exist_ok=True)
        self.collections: Dict[str, CollectionReader] = {}
        self.kv = KV(os.path.join(self.data_dir, "kv.msgpack"))
        self.committed_offset = 0
        self.live_offset = 0
        self._commit_lock = threading.Lock()
        self._lock = threading.RLock()
        # op application (writes) vs searches (reads) on the live layer:
        # reference semantics via instrumented RW lock (lock.rs analog)
        from ..utils.locks import InstrumentedRWLock

        self._state_lock = InstrumentedRWLock("read-side-state")
        self._ops_since_commit = 0
        # per-collection commit thresholds (reference read/mod.rs:100-113)
        self._coll_ops_since_commit: Dict[str, int] = {}
        self._coll_last_commit: Dict[str, float] = {}
        self._load()
        self.receiver = receiver_factory(self.committed_offset)
        self._stop = False
        self._consumer: Optional[threading.Thread] = None
        from .analytics import AnalyticsLog

        self.analytics = AnalyticsLog(
            os.path.join(self.data_dir, "analytics.jsonl"),
            enabled=config.reader_side.analytics_enabled,
        )
        # sandboxed hook runtime, attached by the AI service when present
        self.hooks_runtime = None
        # doc-id-sharded search over a device mesh (SURVEY §5.8): the
        # fused fulltext path dispatches one shard_map step per query
        # batch when a mesh is configured
        self.sharded_mesh = None
        n_sh = config.reader_side.sharded_shards
        if n_sh and n_sh > 1:
            import jax

            devs = jax.devices()
            if len(devs) >= n_sh:
                from ..parallel.engine import build_engine_mesh

                self.sharded_mesh = build_engine_mesh(n_sh, devs)
            else:
                import logging

                logging.getLogger("oramacore_tpu.read").warning(
                    "sharded_shards=%d but only %d devices; sharded "
                    "search disabled", n_sh, len(devs),
                )

    # ------------------------------------------------------------------
    # Op consumption (SURVEY §3.3)
    # ------------------------------------------------------------------

    def start(self):
        """Spawn the op consumer loop (reference read/mod.rs:1159)."""
        if self._consumer is None:
            self._consumer = threading.Thread(
                target=self._consume_loop, name="op-consumer", daemon=True
            )
            self._consumer.start()

    def _consume_loop(self):
        while not self._stop:
            item = self.receiver.recv(timeout=0.1)
            if item is None:
                continue
            offset, op = item
            try:
                self.update(offset, op)
            except Exception:  # noqa: BLE001
                import traceback

                traceback.print_exc()

    def pump(self, max_ops: Optional[int] = None) -> int:
        """Synchronously drain pending ops (test harness path)."""
        n = 0
        while max_ops is None or n < max_ops:
            item = self.receiver.recv(timeout=0)
            if item is None:
                break
            self.update(*item)
            n += 1
        return n

    def update(self, offset: int, op: Operation):
        # replay dedup (reference read/mod.rs:511-517)
        if offset <= self.committed_offset and offset <= self.live_offset:
            return
        if offset <= self.live_offset:
            return
        self.live_offset = offset
        with self._state_lock.write(f"apply {op.kind}"):
            self._apply(offset, op)
        from ..metrics import OPERATION_COUNT

        OPERATION_COUNT.inc({"kind": op.kind})
        self._ops_since_commit += 1
        if op.collection:
            n = self._coll_ops_since_commit.get(op.collection, 0) + 1
            self._coll_ops_since_commit[op.collection] = n
            now = time.time()
            last = self._coll_last_commit.setdefault(op.collection, now)
            rs = self.config.reader_side
            if n >= rs.operation_threshold or now - last >= rs.time_threshold:
                # CommitScope::SelectedCollection analog
                self.commit_collection(op.collection)
        if self._ops_since_commit >= self.config.reader_side.insert_batch_commit_size:
            self.commit()

    # index DATA ops dedup per-index (an index may reload from an OLDER
    # snapshot generation than the collection manifest when its current
    # generation is torn — see ReadIndex.load fallback)
    _INDEX_DATA_OPS = frozenset(
        {"create_field", "index_document", "index_embedding",
         "delete_documents"}
    )

    def _apply(self, offset: int, op: Operation):
        kind = op.kind
        cid = op.collection
        b = op.body
        # per-collection replay dedup: a collection committed via
        # commit_collection persists data the GLOBAL offset doesn't cover;
        # after a crash those ops replay and would double-apply (tf
        # re-accumulation, duplicate filter rows, clobbered readers)
        if cid and kind not in self._INDEX_DATA_OPS:
            existing = self.collections.get(cid)
            if existing is not None and offset <= existing.committed_offset:
                return
        if kind == "create_collection":
            self.collections[cid] = CollectionReader(
                collection_id=cid,
                read_api_key=b["read_api_key"],
                default_locale=b.get("default_locale", "english"),
                embedding_model=b.get("embedding_model", "builtin-minihash-384"),
                nlp=self.nlp,
                data_dir=os.path.join(self.data_dir, "collections", cid),
                description=b.get("description"),
                mcp_description=b.get("mcp_description"),
                write_api_key=b.get("write_api_key"),
            )
            return
        if kind == "delete_collection":
            coll = self.collections.pop(cid, None)
            if coll is not None:
                shutil.rmtree(coll.data_dir, ignore_errors=True)
            return
        if kind in ("kv_insert", "kv_delete"):
            if kind == "kv_insert":
                self.kv.insert(b["key"], b["value"])
            else:
                self.kv.remove(b["key"])
            return
        coll = self.collections.get(cid)
        if coll is None:
            return
        if kind == "create_index":
            ridx = ReadIndex(
                b["index"], b.get("locale", coll.default_locale),
                b.get("embedding_model", coll.embedding_model), self.nlp,
            )
            ridx.field_params = dict(b.get("field_params") or {})
            ridx.string.index_bigrams = bool(b.get("phrase", True))
            coll.indexes[b["index"]] = ridx
            return
        if kind == "delete_index":
            dropped = coll.indexes.pop(b["index"], None)
            coll.deleted_indexes.add(b["index"])
            if dropped is not None:
                for d in dropped.doc_user_ids:
                    coll.doc_index.pop(d, None)
            coll._executors.pop(b["index"], None)
            coll._sharded_executors.pop(b["index"], None)
            return
        if kind == "replace_index":
            # promote temp to runtime id, alias old temp id (index/mod.rs:864)
            temp = coll.indexes.pop(b["temp"], None)
            if temp is not None:
                old = coll.indexes.pop(b["target"], None)
                if old is not None:
                    coll.doc_storage.remove(old.doc_user_ids.keys())
                    for d in old.doc_user_ids:
                        coll.doc_index.pop(d, None)
                    # temp's docs stay bound to the promoted object
                    for d in temp.doc_user_ids:
                        coll.doc_index[d] = temp
                temp.index_id = b["target"]
                coll.indexes[b["target"]] = temp
                coll.aliases[b["temp"]] = b["target"]
                # the promoted index must be REWRITTEN under its new
                # snapshot dir: a clean index skips save at commit while
                # the GC removes the old temp-named dir — without this a
                # reload after promote+commit would lose the index
                temp.dirty = True
                coll._executors.pop(b["target"], None)
                coll._executors.pop(b["temp"], None)
                coll._sharded_executors.pop(b["target"], None)
                coll._sharded_executors.pop(b["temp"], None)
            return
        if kind == "update_read_api_key":
            coll.read_api_key = b["read_api_key"]
            return
        if kind == "hook_insert":
            coll.hooks[b["name"]] = b["code"]
            return
        if kind == "hook_delete":
            coll.hooks.pop(b["name"], None)
            return
        if kind == "pin_rule_insert":
            coll.pin_rules[b["id"]] = b
            return
        if kind == "pin_rule_delete":
            coll.pin_rules.pop(b["id"], None)
            return
        if kind == "shelf_insert":
            coll.shelves[b["id"]] = b
            return
        if kind == "shelf_delete":
            coll.shelves.pop(b["id"], None)
            return
        if kind == "value_set":
            coll.values[b["key"]] = b["value"]
            return
        if kind == "value_delete":
            coll.values.pop(b["key"], None)
            return
        idx = coll.resolve_index(b.get("index", ""))
        if idx is None:
            return
        if offset <= idx.committed_offset:
            return  # replayed data op already in this index's snapshot
        if kind == "create_field":
            idx.apply_create_field(b)
        elif kind == "index_document":
            idx.apply_index_document(b)
            coll.doc_index[int(b["doc_id"])] = idx
            raw = b.get("raw")
            if raw is not None:
                coll.doc_storage.insert(
                    int(b["doc_id"]), json.dumps(raw).encode()
                )
        elif kind == "index_embedding":
            idx.apply_index_embedding(b)
        elif kind == "delete_documents":
            idx.apply_delete_documents(b)
            for d in b["doc_ids"]:
                coll.doc_index.pop(int(d), None)
            coll.doc_storage.remove(int(d) for d in b["doc_ids"])

    # ------------------------------------------------------------------
    # Auth
    # ------------------------------------------------------------------

    def check_read_key(self, collection_id: str, key: Optional[str]) -> CollectionReader:
        """ApiKey or JWT bearer (reference read/mod.rs:904, ReadApiKey
        types.rs:613: CustomerClaims scoped to the collection)."""
        coll = self.collections.get(collection_id)
        if coll is None:
            raise ReadError(f"collection {collection_id!r} not found", 404)
        if key == coll.read_api_key or key == self.config.auth.master_api_key:
            return coll
        # the collection's write key grants reads too (reference key
        # chain: api_key_chain.rs test_write_api_key_to_search)
        if key is not None and key == coll.write_api_key:
            return coll
        jwt_manager = getattr(self, "jwt_manager", None)
        if key and jwt_manager is not None and jwt_manager.looks_like_jwt(key):
            try:
                claims = jwt_manager.customer_claims(key)
            except Exception as e:  # noqa: BLE001
                raise ReadError(f"invalid jwt: {e}", 401)
            # explicit collection binding required (reference
            # collection.rs check_read_api_key: claims.orak must equal the
            # collection's read api key). A validly-signed token without a
            # binding must NOT grant cross-collection reads.
            orak = claims.raw.get("orak")
            if orak is not None:
                if orak != coll.read_api_key:
                    raise ReadError("jwt not valid for this collection", 401)
            elif claims.collection_id != collection_id:
                raise ReadError(
                    "jwt not bound to this collection (missing or wrong "
                    "collection claim)", 401,
                )
            return coll
        raise ReadError("invalid read api key", 401)

    # ------------------------------------------------------------------
    # Search (SURVEY §3.4)
    # ------------------------------------------------------------------

    def resolve_mode(self, mode: SearchMode) -> SearchMode:
        if isinstance(mode, AutoMode):
            choice = "fulltext"
            if self.llm_resolve_mode is not None:
                try:
                    choice = self.llm_resolve_mode(mode.term) or "fulltext"
                except Exception:  # noqa: BLE001
                    choice = "fulltext"
            if choice == "vector":
                return VectorMode(mode.term)
            if choice == "hybrid":
                return HybridMode(mode.term)
            return FulltextMode(mode.term)
        return mode

    def search(
        self,
        collection_id: str,
        read_key: Optional[str],
        params: SearchParams,
    ) -> SearchResult:
        coll = self.check_read_key(collection_id, read_key)
        t0 = time.perf_counter()
        with span("search", collection=collection_id, mode=params.mode_str,
                  term=params.term[:40]):
            with self._state_lock.read("search"):
                return self._search_locked(
                    coll, collection_id, read_key, params, t0
                )

    def _search_locked(self, coll, collection_id, read_key, params, t0):
        # reset ONCE per search; per-index scoring ORs it (a multi-index
        # collection where only one index pruned must still flag the
        # response count as estimated)
        self._tls.count_estimated = False
        self._tls.facet_thr_exact = False
        # BeforeSearch hook may rewrite the search params (read/mod.rs:642);
        # per-collection secret is passed to hooks (read/mod.rs:656-660)
        if self.hooks_runtime is not None:
            code = coll.hooks.get("BeforeSearch")
            if code:
                secret = None
                svc = getattr(self, "secrets_service", None)
                if svc is not None:
                    secret = svc.get_for_collection(collection_id)
                out = self.hooks_runtime.exec_hook(
                    collection_id, "BeforeSearch",
                    code, {"term": params.term, "limit": params.limit,
                           "secret": secret},
                )
                if isinstance(out, dict):
                    if out.get("term") is not None:
                        params.mode.term = str(out["term"])
                    if out.get("limit") is not None:
                        params.limit = int(out["limit"])

        mode = self.resolve_mode(params.mode)

        # select indexes
        if params.indexes is not None:
            indexes = []
            for iid in params.indexes:
                idx = coll.resolve_index(iid.value)
                if idx is None:
                    # a deleted index named in the request is skipped, not an
                    # error (reference search loop excludes deleted indexes
                    # after validation passes — tests/multi_index.rs:278)
                    if iid.value in coll.deleted_indexes:
                        continue
                    raise ReadError(f"index {iid.value!r} not found", 404)
                indexes.append(idx)
        else:
            indexes = coll.runtime_indexes()

        # pin rules triggered by the term (search.rs:257-281)
        consequences: List[Consequence] = []
        if coll.pin_rules:
            for idx in indexes:
                consequences.extend(
                    apply_rules(list(coll.pin_rules.values()), mode.term, idx.parser)
                )

        all_scores: Dict[int, float] = {}
        fused_counts: Optional[int] = None
        facet_results: Dict[str, FacetResult] = {}
        group_values_by_doc: Dict[int, Dict[str, List[Any]]] = {}
        filter_fields_seen: Set[str] = set()
        has_filter = not params.where.is_empty()

        for idx in indexes:
            cap = idx.cap()
            for f in idx.filters.all_fields():
                filter_fields_seen.add(f)
            with span("filter", index=idx.index_id):
                filter_mask = (
                    idx.filters.eval_where(params.where, cap)
                    if has_filter else None
                )
                mask = idx.combined_mask(filter_mask)
            # fused low-latency path: only top candidates + exact counts
            # cross the device boundary when nothing downstream needs the
            # dense score set. Fulltext FACET searches stay fused too:
            # the kernel ships the match set as packed bits (uint8
            # [cap/8], ops/bm25.py with_bitmap) instead of a dense f32
            # score vector + host dict — facet counting consumes the
            # unpacked mask directly (single-device; the sharded
            # executor keeps the dense path).
            # facet counting at the PRUNED tier (ops/pruned.py
            # pruned_match_reps + pruned_facet_hist): ONE global
            # (doc, token) sort per query, distinct matched docs per
            # bucket off the run-end reps — no dense kernel, no bitmap.
            # Needs a term (match-all uses the presence mask) and every
            # facet field device-compatible (strings <= 1024 values;
            # multi-valued via pair tables <= 8 values/doc). Thresholded queries ride it too (the reps
            # kernel counts distinct matched tokens per doc run) — they
            # reach here only when scoring itself took the pruned path
            # (exactCount or small-filter, _pruned_eligible).
            device_facet_specs = None
            # HYBRID facet searches ride the pruned facet path at the
            # int8/IVF tier too (single device AND mesh): the vector
            # side's membership is candidate-bounded there (top-V probe
            # rows, ops/pruned.pruned_hybrid_match_reps), so the dense
            # bitmap kernel — the one remaining 10M-tier scatter for
            # faceted hybrids — is skipped. exactCount hybrids ride it
            # too when no where-filter applies: phase A's rep sum IS
            # the exact |ft ∪ vec| count (r5; filtered exactCount keeps
            # the bitmap — the quirk's unfiltered set differs from the
            # search's filtered count).
            hybrid_ivf_facets = (
                isinstance(mode, HybridMode)
                and (not params.exact_count or not has_filter)
                and idx.vector is not None
                and idx.vector._ivf is not None
                and not idx.vector._live_rows
            )
            # VECTOR-mode facet searches at the int8/IVF tier: the
            # match set is the candidate-bounded top-V probe clearing
            # the similarity floor — identical to the dense int8
            # kernel's scatter-max set — so the reps machinery counts
            # it with a vec-only phase A (no text worklist).
            # Single-device (the mesh keeps the host dict flow).
            vector_ivf_facets = (
                isinstance(mode, VectorMode)
                and self.sharded_mesh is None
                and idx.vector is not None
                and idx.vector._ivf is not None
                and not idx.vector._live_rows
            )
            # THRESHOLDED facet searches ride the device facet path
            # too: the reps kernel counts distinct matched tokens per
            # doc run (ops/pruned._match_reps_core), so phase A's
            # rep.sum() is the EXACT thresholded match count — it
            # replaces the scoring kernel's estimate (which cannot
            # model the min-matched-tokens constraint, the reason
            # _pruned_eligible normally rejects thresholds). Needs the
            # facet quirk's set == the search's set: no where-filter
            # (tombstone alive-masks apply on both sides).
            thr_exact_candidate = (
                getattr(mode, "threshold", None) is not None
                and not has_filter
            )
            # r5 widening (VERDICT r4 #4): sort_by+facets,
            # facets+group_by, vector-mode facets and exactCount
            # hybrids all ride the device facet path — facet counting
            # needs only a QUERY PLAN (phase A's reps are exact over
            # the full worklist), not the scoring dispatch, so the
            # ranking path is free to be fused-sorted / grouped / a
            # host dict. The plan is built on demand in the facet
            # block when scoring didn't stash one.
            if (
                bool(params.facets)
                and (isinstance(mode, FulltextMode) or hybrid_ivf_facets
                     or vector_ivf_facets)
                and mode.term.strip()
                and self._pruned_eligible(
                    idx, None, 16, mode, params, mesh_ok=True,
                    exact_counts=(
                        params.exact_count
                        and isinstance(mode, FulltextMode)
                    ) or thr_exact_candidate,
                )
            ):
                device_facet_specs = self._device_facet_specs(
                    idx, params
                )
            pruned_facets = device_facet_specs is not None
            # the reps sum substitutes the search's count only for
            # scoring shapes whose own count would be estimated (the
            # pruned scoring kernels); sorted/grouped/host-dict
            # rankings already produce exact counts
            scoring_pruned_shape = (
                params.group_by is None and params.sort_by is None
            )
            self._tls.facet_thr_exact = bool(
                pruned_facets and thr_exact_candidate
                and scoring_pruned_shape
            )
            # exactCount hybrids: phase A's rep sum is the exact
            # |ft ∪ vec| count, so the hybrid pruned scoring kernel
            # (whose own count is an estimate) becomes eligible
            self._tls.facet_exact_count = bool(
                pruned_facets and isinstance(mode, HybridMode)
                and params.exact_count and not has_filter
                and scoring_pruned_shape
            )
            # hybrid facets ride the packed bitmap on one chip AND on
            # the mesh (flat tier: sharded hybrid step returns per-shard
            # bits; int8/IVF tier returns None there and the
            # single-device int8 fused bitmap path takes over)
            fulltext_facets = (
                bool(params.facets)
                and not pruned_facets
                and isinstance(mode, (FulltextMode, HybridMode))
            )
            # fused SORT-BY (ops/bm25.py bm25_search_sorted_packed):
            # the non-fused sort path ships a dense score vector and
            # lexsorts the whole hit set on the host — fused, the sort
            # column lives on device and only two (k,) pages return.
            # Single index + fulltext + a number/date/bool column;
            # pin rules keep the host path (promoted docs may need
            # scores outside the returned page).
            fused_sort = (
                params.sort_by is not None
                and len(indexes) == 1
                and isinstance(mode, FulltextMode)
                and (not params.facets or pruned_facets)
                and params.group_by is None
                and not consequences
                and params.limit + params.offset <= 512
                and any(
                    params.sort_by.property in group
                    for group in (idx.filters.numbers, idx.filters.dates,
                                  idx.filters.bools)
                )
            )
            # fused GROUP-BY (ops/bm25.py bm25_search_grouped_packed):
            # main top-k + per-group top-R pages in one dispatch — the
            # host flow ships a dense score dict and walks per-doc value
            # dicts over the full hit set (seconds at 10M). Single
            # index + single single-valued string/bool property,
            # term-ful fulltext, no facets/sort/pins, single device
            # (ref group.rs builds per-combo doc lists on CPU).
            # MATCH-ALL group-by (empty term) takes a vectorized host
            # flow off the presence mask + the same group-id column
            # (numpy chunk scans, _matchall_group_pages) instead of the
            # O(corpus)-python per-doc dict walk — mesh-independent, so
            # the sharded gate lifts for it.
            device_group_spec = None
            if (
                params.group_by is not None
                and params.group_by.max_results <= 64
                and params.sort_by is None
                and (not params.facets or pruned_facets)
                and not consequences
                and len(indexes) == 1
                and isinstance(mode, FulltextMode)
            ):
                # termful group-by rides the fused kernel on ONE chip
                # AND the mesh (r5: ShardedStringExec.search_topk_grouped
                # — shard-local sorts + one 2-key merge sort per group);
                # match-all keeps the vectorized host flow everywhere
                device_group_spec = self._device_group_spec(idx, params)
            fused_ok = (
                (not params.facets or fulltext_facets or pruned_facets)
                and (params.group_by is None
                     or device_group_spec is not None)
                and (params.sort_by is None or fused_sort)
            )
            est_before = self._tls.count_estimated
            with span("token_scores", index=idx.index_id,
                      fused=fused_ok):
                scores = self._token_scores(
                    coll, idx, mode, params, mask, fused_ok=fused_ok,
                    want_bitmap=fulltext_facets,
                    sort_spec=params.sort_by if fused_sort else None,
                    group_spec=device_group_spec,
                )
            device_groups = getattr(self._tls, "grouped_pages", None)
            match_mask = self._tls.match_mask
            if self._tls.fused_count is not None:
                fused_counts = fused_counts + self._tls.fused_count                     if fused_counts is not None else self._tls.fused_count
            # OMC multipliers (search.rs:342, apply_omc_multipliers :39).
            # The fused fulltext path applies them on-device BEFORE top-k
            # (self._tls.omc_applied); other paths apply here.
            if idx.omc and not self._tls.omc_applied:
                for d in list(scores.keys()):
                    m = idx.omc.get(d)
                    if m is not None:
                        scores[d] *= m
            all_scores.update(scores)

            if params.facets:
                # facet quirk (search.rs:345-396): with filters present,
                # facets are computed over the UNFILTERED scored doc set
                facet_scores = None
                if pruned_facets and self._tls.pruned_plan is None:
                    # the ranking took a non-pruned dispatch (fused
                    # sort / fused group-by / host dict / vector mode)
                    # — build the facet plan now; phase A's reps are
                    # exact over the full worklist regardless of how
                    # the ranking ran (r5 eligibility widening)
                    self._build_facet_plan(idx, mode, params)
                if (pruned_facets
                        and self._tls.pruned_plan is not None
                        and (not isinstance(mode, (HybridMode,
                                                   VectorMode))
                             or self._tls.hybrid_q is not None)):
                    exact_n = self._pruned_facet_counts(
                        coll, idx, mode, device_facet_specs,
                        facet_results,
                        want_count=(self._tls.facet_thr_exact
                                    or self._tls.facet_exact_count),
                    )
                    if exact_n is not None:
                        # thresholded search: the scoring kernel's
                        # count estimate can't model the min-matched-
                        # tokens constraint — replace this index's
                        # contribution with phase A's exact rep sum
                        # and roll back its count_estimated flag
                        if self._tls.fused_count is not None:
                            fused_counts = (
                                (fused_counts or 0)
                                - self._tls.fused_count
                            )
                        fused_counts = (fused_counts or 0) + exact_n
                        self._tls.count_estimated = est_before
                    elif (self._tls.facet_thr_exact
                          or self._tls.facet_exact_count):
                        # the eligibility gate promised an exact
                        # thresholded count via the device facet path,
                        # but the reps never landed for this plan
                        # (advisor r4: the pruned estimate cannot model
                        # min-matched-tokens and may be badly inflated)
                        # — recount densely so the premise violation
                        # never ships a wrong number
                        logging.getLogger("oramacore_tpu.read").warning(
                            "facet_thr_exact premise violated (no reps "
                            "for plan); dense recount for %s", idx.uid,
                        )
                        prev_fc = self._tls.fused_count
                        dense = self._token_scores(
                            coll, idx, mode, params, mask,
                            fused_ok=False,
                        )
                        if prev_fc is not None:
                            fused_counts = (
                                (fused_counts or 0) - prev_fc
                            )
                        fused_counts = (fused_counts or 0) + len(dense)
                        self._tls.count_estimated = est_before
                elif pruned_facets:
                    # the ranking declined pruning (deep page, fuzzy
                    # range-guard replan, ...) — no pruned plan and no
                    # bitmap was requested, so count via the dense dict
                    facet_scores = self._token_scores(
                        coll, idx, mode, params,
                        idx.alive_mask() if has_filter else mask,
                        fused_ok=False,
                    )
                elif match_mask is not None:
                    if has_filter:
                        # second bitmap dispatch over the alive set
                        unfiltered = self._token_scores(
                            coll, idx, mode, params, idx.alive_mask(),
                            fused_ok=True, want_bitmap=True,
                        )
                        facet_scores = (
                            self._tls.match_mask
                            if self._tls.match_mask is not None
                            else unfiltered
                        )
                    else:
                        facet_scores = match_mask
                elif has_filter:
                    facet_scores = self._token_scores(
                        coll, idx, mode, params, idx.alive_mask()
                    )
                else:
                    facet_scores = scores
                if facet_scores is not None:
                    self._compute_facets(
                        idx, params, facet_scores, facet_results
                    )

            if params.group_by and device_groups is None:
                self._collect_group_values(idx, params, scores, group_values_by_doc)

        # error semantics (search.rs:434-460)
        if not all_scores and has_filter:
            for cond in _walk_filter_keys(params.where):
                if cond not in filter_fields_seen:
                    raise ReadError(f"filter field {cond!r} not found", 400)
        if params.facets:
            missing = [f for f in params.facets if f not in facet_results]
            if missing:
                raise ReadError(f"facet fields not found: {missing}", 400)

        count = fused_counts if fused_counts is not None else len(all_scores)

        # resolve user-id -> internal for pin rules across indexes
        resolve: Dict[str, int] = {}
        if consequences:
            for idx in indexes:
                resolve.update(idx.user_to_internal)

        with span("rank", n_scores=len(all_scores)):
            ranked = self._rank(
                indexes, all_scores, params, consequences, resolve
            )
        page = ranked[params.offset : params.offset + params.limit]

        groups = None
        if params.group_by:
            if device_groups is not None:
                # fused pages: hydrate each non-empty group directly
                labels, pages = device_groups
                groups = []
                for g, gpage in enumerate(pages):
                    if not gpage:
                        continue
                    lab = labels[g]
                    groups.append(GroupedResult(
                        # multi-property combos carry tuple labels
                        values=(list(lab) if isinstance(lab, tuple)
                                else [lab]),
                        result=self._hydrate(coll, indexes, gpage),
                    ))
                groups.sort(key=lambda gr: [str(v) for v in gr.values])
            else:
                groups = self._build_groups(
                    coll, indexes, all_scores, group_values_by_doc,
                    params, consequences, resolve,
                )

        with span("hydrate", n=len(page)):
            hits = self._hydrate(coll, indexes, page)

        # TransformDocumentAfterSearch hook (search.rs:158-179)
        if self.hooks_runtime is not None:
            code = coll.hooks.get("TransformDocumentAfterSearch")
            if code:
                for h in hits:
                    if h.document is None:
                        continue
                    out = self.hooks_runtime.exec_hook(
                        collection_id, "TransformDocumentAfterSearch",
                        code, h.document,
                    )
                    if isinstance(out, dict):
                        h.document = out

        self.analytics.add_search_event(
            collection_id,
            mode=params.mode_str,
            term=params.term,
            duration_ms=(time.perf_counter() - t0) * 1000,
            has_filter=has_filter,
            has_facets=bool(params.facets),
            has_groups=params.group_by is not None,
            has_sorting=params.sort_by is not None,
            has_pin_rules=bool(consequences),
            has_pinned_results=bool(consequences) and bool(hits),
            results_count=count,
            visitor_id=params.user_id,
        )
        return SearchResult(
            hits=hits,
            count=count,
            facets=facet_results if params.facets else None,
            groups=groups,
            count_estimated=getattr(self._tls, "count_estimated", False),
        )

    # -- scoring ---------------------------------------------------------

    def _token_scores(
        self,
        coll: CollectionReader,
        idx: ReadIndex,
        mode: SearchMode,
        params: SearchParams,
        mask: Optional[np.ndarray],
        fused_ok: bool = False,
        want_bitmap: bool = False,
        sort_spec=None,
        group_spec=None,
    ) -> Dict[int, float]:
        self._tls.fused_count = None
        self._tls.omc_applied = False
        self._tls.match_mask = None
        self._tls.sorted_ranked = None
        self._tls.pruned_plan = None
        self._tls.pruned_thr = None
        self._tls.hybrid_q = None
        self._tls.facet_vec_only = False
        self._tls.grouped_pages = None
        # NOTE: count_estimated is reset once per search (and ORs
        # across a collection's indexes), not per index
        if isinstance(mode, (FulltextMode,)):
            return self._fulltext_scores(
                coll, idx, mode, params, mask, fused_ok=fused_ok,
                omc_in_kernel=True, want_bitmap=want_bitmap,
                sort_spec=sort_spec, group_spec=group_spec,
            )
        if isinstance(mode, VectorMode):
            return self._vector_scores(idx, mode.term, mode.similarity, params, mask)
        if isinstance(mode, HybridMode):
            # Fully-fused hybrid (token_score.rs:357-422 semantics): BM25 +
            # vector matmul + min-max fusion + OMC + top-k in ONE dispatch.
            if fused_ok:
                out = self._hybrid_fused(
                    coll, idx, mode, params, mask,
                    want_bitmap=want_bitmap,
                )
                if out is not None:
                    return out
            # fallback: separate vector + fulltext passes, host fusion
            # (IVF-sized vector indexes, multi-chunk query embeddings,
            # tolerance, or result sets needed downstream)
            vec = self._vector_scores(idx, mode.term, mode.similarity, params, mask)
            # omc_in_kernel=False: the reference applies OMC AFTER hybrid
            # fusion (search.rs:342), so the ft side must stay raw here
            ft = self._fulltext_scores(
                coll, idx,
                FulltextMode(mode.term, mode.threshold, mode.exact, mode.tolerance),
                params, mask,
                # a facet search promised a bitmap: the fused hybrid
                # declined, so facets fall back to the FULL score dicts
                fused_ok=fused_ok and not want_bitmap,
                omc_in_kernel=False,
            )
            ft_count = self._tls.fused_count
            out = _normalize_and_combine(vec, ft)
            if ft_count is not None:
                # union estimate: exact ft count + vector-only candidates
                self._tls.fused_count = ft_count + sum(
                    1 for d in vec if d not in ft
                )
            return out
        raise ReadError(f"unsupported mode {mode!r}", 400)

    def _hybrid_fused(
        self,
        coll: CollectionReader,
        idx: ReadIndex,
        mode: HybridMode,
        params: SearchParams,
        mask: Optional[np.ndarray],
        want_bitmap: bool = False,
    ) -> Optional[Dict[int, float]]:
        """One-dispatch hybrid; returns None when the fused path doesn't
        apply (no vector index, IVF mode, multi-chunk query embedding, or
        no string fields) so the caller falls back. want_bitmap (facet
        searches) additionally stashes the match set on
        self._tls.match_mask (pruning + champions disabled for it)."""
        if idx.vector is None:
            return None
        cap = idx.cap()
        k = min(max(2 * (params.limit + params.offset), 16), cap)
        # ONE eligibility decision drives both the plan shape
        # (with_prefix: uncoalesced ranges + field spans) and the
        # dispatch below — recomputing it could route a coalesced
        # no-prefix plan into the pruned kernel. On the mesh, pruning
        # applies exactly at the int8/IVF tier (the sharded pruned
        # hybrid replaces the dense tail there; flat-mode sharded
        # hybrid keeps the dense kernel + coalesced plan).
        is_ivf = (
            idx.vector._ivf is not None and not idx.vector._live_rows
        )
        # the hybrid kernels have no exact-count dispatch — an
        # exactCount request keeps the dense exact path UNLESS the
        # small-filter cand-given path applies (its counts are exact)
        mask_sel = (
            int(np.count_nonzero(mask)) if mask is not None else None
        )
        small_filter = (
            mask_sel is not None
            and mask_sel <= PrunedPlanMixin.PRUNED_CANDIDATES
        )
        use_pruned = (
            not want_bitmap
            and self._pruned_eligible(
                idx, mask, k, mode, params, mesh_ok=is_ivf,
                mask_sel=mask_sel,
            )
            # exactCount: pruned needs an exact count source — the
            # small-filter cand-given path, or the device facet path's
            # rep sum (facet_exact_count, r5)
            and (not params.exact_count or small_filter
                 or getattr(self._tls, "facet_exact_count", False))
        )
        planned = self._plan_fulltext(
            idx, mode, params, with_prefix=use_pruned,
        )
        if planned is None:
            return None
        tokens, plan = planned
        if use_pruned and plan.starts.shape[1] > PRUNED_MAX_RANGES:
            use_pruned = False
            planned = self._plan_fulltext(idx, mode, params)
            if planned is None:
                return None
            tokens, plan = planned
        targets = self.embeddings.calculate_embeddings(
            [mode.term], Intent.QUERY, idx.embedding_model
        )[0]
        if len(targets) != 1:
            return None
        from ..ops.vector import l2_normalize

        q = l2_normalize(np.asarray(targets[0], np.float32).reshape(1, -1))
        thr = None
        if mode.threshold is not None:
            thr = float(math.floor(len(tokens) * mode.threshold))
        omc_arr = idx.omc_array()
        out = None
        if self.sharded_mesh is not None:
            # doc-sharded fused hybrid over the mesh (SURVEY §5.8)
            sharded = self._fused_executor(coll, idx)
            if use_pruned and is_ivf:
                # 10M tier on the mesh: sharded pruned hybrid (per-shard
                # candidate union + exact rescore, no dense tail)
                mask_kw = {}
                if mask is not None:
                    mask_kw = dict(
                        mask=mask,
                        mask_key=self._mask_cache_key(idx, params),
                    )
                out = sharded.search_topk_hybrid_int8_pruned(
                    idx.string, [plan], [idx.document_count()], cap, k,
                    idx.vector, q, [mode.similarity],
                    exact=mode.exact,
                    thresholds=[thr] if thr is not None else None,
                    omc=omc_arr, omc_key=(idx.uid, idx.omc_version),
                    rescale=idx.vector.config.score_rescale,
                    **mask_kw,
                )
                if out is not None:
                    # hybrid pruned facets (search() device_facet_specs)
                    self._tls.pruned_plan = plan
                    self._tls.pruned_thr = thr
                    self._tls.hybrid_q = q
                    if not small_filter:
                        self._tls.count_estimated = True
            else:
                out = sharded.search_topk_hybrid(
                    idx.string, [plan], [idx.document_count()], cap, k,
                    idx.vector, q, [mode.similarity],
                    exact=mode.exact,
                    doc_masks=[mask] if mask is not None else None,
                    thresholds=[thr] if thr is not None else None,
                    omc=omc_arr, omc_key=(idx.uid, idx.omc_version),
                    rescale=idx.vector.config.score_rescale,
                    with_bitmap=want_bitmap,
                )
                if want_bitmap and out is not None:
                    self._tls.match_mask = out[3][0]
                    out = out[:3]
        if out is None:
            vec_rows = idx.vector.flat_device_rows()
            ex = coll.executor(idx.index_id)
            if vec_rows is not None:
                out = ex.search_topk_hybrid(
                    idx.string, [plan], [idx.document_count()], cap, k,
                    vec_rows, q, [mode.similarity],
                    exact=mode.exact,
                    doc_masks=[mask] if mask is not None else None,
                    thresholds=[thr] if thr is not None else None,
                    omc=omc_arr, omc_key=(idx.uid, idx.omc_version),
                    rescale=idx.vector.config.score_rescale,
                    with_bitmap=want_bitmap,
                )
                if want_bitmap and out is not None:
                    self._tls.match_mask = out[3][0]
                    out = out[:3]
            else:
                # IVF-sized vector index: fused hybrid over the int8
                # packed layout (candidate probe inside the dispatch);
                # champion rows replace heavy terms' posting scans —
                # at multi-million-doc caps the scatter aggregation is
                # the bottleneck (~43M postings/s)
                vec_int8 = idx.vector.int8_device_rows()
                if vec_int8 is None:
                    return None
                if use_pruned:
                    # pruned hybrid: candidate union + exact rescore, no
                    # dense doc-space accumulators (the 10M-tier path)
                    if not small_filter:
                        self._tls.count_estimated = True
                    # hybrid pruned facets (search() device_facet_specs)
                    self._tls.pruned_plan = plan
                    self._tls.pruned_thr = thr
                    self._tls.hybrid_q = q
                    mask_kw = {}
                    if mask is not None:
                        mask_kw = dict(
                            mask=mask,
                            mask_key=self._mask_cache_key(idx, params),
                        )
                    from ..ops.bm25 import round_up_pow2

                    capb = round_up_pow2(cap, 128)
                    out = ex.search_topk_hybrid_int8_pruned(
                        idx.string, [plan], [idx.document_count()], cap,
                        k, vec_int8, idx.vector.int8_doc2row(capb), q,
                        [mode.similarity],
                        exact=mode.exact,
                        thresholds=[thr] if thr is not None else None,
                        omc=omc_arr, omc_key=(idx.uid, idx.omc_version),
                        rescale=idx.vector.config.score_rescale,
                        **mask_kw,
                    )
                else:
                    # champion rows bake non-exact tf — skip for exact
                    # and for facet bitmaps (membership must match the
                    # plain scorer exactly)
                    if not mode.exact and not want_bitmap:
                        champ_planned = self._plan_fulltext(
                            idx, mode, params, use_champions=True
                        )
                        if champ_planned is not None:
                            _, plan = champ_planned
                    out = ex.search_topk_hybrid_int8(
                        idx.string, [plan], [idx.document_count()], cap, k,
                        vec_int8, q, [mode.similarity],
                        exact=mode.exact,
                        doc_masks=[mask] if mask is not None else None,
                        thresholds=[thr] if thr is not None else None,
                        omc=omc_arr, omc_key=(idx.uid, idx.omc_version),
                        rescale=idx.vector.config.score_rescale,
                        with_bitmap=want_bitmap,
                    )
                    if want_bitmap and out is not None:
                        self._tls.match_mask = out[3][0]
                        out = out[:3]
        vals, ids, counts = out
        self._tls.fused_count = int(counts[0])
        self._tls.omc_applied = omc_arr is not None
        return {
            int(d): float(v)
            for v, d in zip(vals[0], ids[0])
            if v > float("-inf") and v > 0
        }

    def _pruned_eligible(self, idx: ReadIndex, mask, k: int,
                         mode=None, params=None,
                         exact_counts: bool = False,
                         mesh_ok: bool = False,
                         mask_sel: Optional[int] = None) -> bool:
        """Pruned two-phase scoring (ops/pruned.py) eligibility: the
        dense path keeps impact_cap opt-ins and deep pagination beyond
        the candidate budget. FILTERED searches (where-filters AND
        tombstone alive-masks) ride the pruned kernels single-device:
        the mask gathers into nomination + rescore (exact filtered-df
        IDF, ops/bm25.py:22 semantics), and a filter selecting <=
        PRUNED_CANDIDATES docs becomes the candidate set itself (exact
        results AND counts). The sharded mesh runs the same filtered
        pruned paths (parallel/engine passes the doc-sharded mask into
        per-shard nomination + rescore; small filters shard the
        cand-given set).
        Additionally (the kernel's documented preconditions):
        - tolerance IS eligible: with_prefix plans keep fuzzy variant
          ranges uncoalesced (doc-sorted per range) and the rescore's
          earlier-span subtraction dedups a doc matched by several
          variant terms of one token (exact union df) — callers fall
          back to dense only when a fuzzy token explodes past
          PRUNED_MAX_RANGES ranges (plan-size guard below);
        - no match threshold UNLESS the caller runs the exact counting
          dispatch or the small-filter cand-given path applies (the
          scoring kernel applies thresholds exactly; only the count
          estimate fails to model the min-matched-tokens constraint,
          and both of those make the count exact)."""
        cfg = self.config.reader_side
        if cfg.pruning == "off":
            return False
        if cfg.impact_cap:
            return False
        if self.sharded_mesh is not None and not mesh_ok:
            return False
        if k > 512:
            return False
        small_filter = (
            mask_sel is not None
            and mask_sel <= PrunedPlanMixin.PRUNED_CANDIDATES
        )
        if mode is not None:
            if (getattr(mode, "threshold", None) is not None
                    and not exact_counts and not small_filter
                    and not getattr(self._tls, "facet_thr_exact",
                                    False)):
                # facet_thr_exact: search() verified the device facet
                # path will run for this index, whose phase-A reps give
                # the exact thresholded count (see the facet gate)
                return False
        if cfg.pruning == "on":
            return True
        return idx.cap() >= cfg.pruned_min_docs

    def _device_facet_specs(self, idx: ReadIndex, params: SearchParams):
        """Per-facet device specs for the pruned facet kernel, or None
        when ANY requested facet can't take the device path (a doc
        holding more values than the bounded-probe budget, >256 string
        values, unknown field) — the search then uses the bitmap/dict
        facet flows. Multi-valued columns ship doc-sorted deduped
        (doc, value) pair tables ("mcat"/"mnum" specs,
        filter_fields.pair_table + ops/pruned.pruned_facet_hist_multi).
        Each entry: (name, spec_tuple, spec_key, labels)."""
        cap = idx.cap()
        mmax = PrunedPlanMixin.PRUNED_FACET_MULTI_MAX
        out = []
        for name, facet in params.facets.items():
            if facet.kind == "number" and name in idx.filters.numbers:
                col = idx.filters.numbers[name]
                bounds = np.asarray(
                    [(r.from_, r.to) for r in facet.ranges], np.float64
                ).reshape(-1, 2).astype(np.float32)
                labels = [
                    f"{_fmt_num(r.from_)}-{_fmt_num(r.to)}"
                    for r in facet.ranges
                ]
                if col.single_valued():
                    vals, present = col.dense_values(cap)
                    arr = np.where(
                        present, vals, np.nan
                    ).astype(np.float32)
                    spec = ("num", arr, bounds)
                else:
                    pd, pv, m = col.pair_table(cap)
                    if m > mmax:
                        return None
                    spec = ("mnum", pd, pv.astype(np.float32), bounds, m)
                out.append((
                    name, spec,
                    ("facet", idx.uid, name, col.version), labels,
                ))
            elif facet.kind == "bool" and name in idx.filters.bools:
                col = idx.filters.bools[name]
                if col.single_valued():
                    spec = ("cat", col.dense_id_column(cap), 2, True)
                else:
                    pd, pv, m = col.pair_table(cap)
                    if m > mmax:
                        return None
                    spec = ("mcat", pd, pv.astype(np.int32), 2, m, True)
                out.append((
                    name, spec,
                    ("facet", idx.uid, name, col.version),
                    ["false", "true"],
                ))
            elif facet.kind == "string" and name in idx.filters.strings:
                col = idx.filters.strings[name]
                # 1024: the hist kernel is G-independent to there
                # (68.7 ms @G=64 == 71.6 ms @G=1024 at a 2M worklist,
                # r5 hardware micro — bandwidth-bound on the worklist,
                # not the one-hot width)
                if len(col._values) > 1024:
                    return None
                G = max(len(col._values), 1)
                if col.single_valued():
                    spec = ("cat", col.dense_id_column(cap), G, False)
                else:
                    pd, pv, m = col.pair_table(cap)
                    if m > mmax:
                        return None
                    spec = ("mcat", pd, pv.astype(np.int32), G, m, False)
                out.append((
                    name, spec,
                    ("facet", idx.uid, name, col.version),
                    list(col._values),
                ))
            else:
                return None
        return out

    # combined group-id space ceiling for the device group-by: the
    # sort-based kernel is O(cap log cap) independent of G, so G only
    # bounds the page-extraction gather and the host label product
    DEVICE_GROUP_MAX = 1024

    def _device_group_spec(self, idx: ReadIndex, params: SearchParams):
        """Device spec for the fused group-by kernel, or None when any
        group property can't take the device path (multi-valued,
        too many distinct values, unknown field) — the search then
        keeps the host dict flow (_collect_group_values/_build_groups).
        Covers single- AND multi-property combos over string, bool and
        number columns (r5 widening, VERDICT r4 #5; reference group.rs
        groups on any filterable value combination): each property
        yields a per-doc id column, combined ids are the mixed-radix
        product (any missing property -> -1, like _build_groups
        skipping docs without a value), and the label list is the
        cartesian tuple product capped at DEVICE_GROUP_MAX.
        Returns (ids int32[cap], n_groups, labels, cache_key) — labels
        are raw values for one property, tuples for several."""
        cap = idx.cap()
        per_prop = []
        versions = []
        for prop in params.group_by.properties:
            if prop in idx.filters.strings:
                col = idx.filters.strings[prop]
                if not col.single_valued():
                    return None
                g = max(len(col._values), 1)
                if g > self.DEVICE_GROUP_MAX:
                    return None
                per_prop.append(
                    (col.dense_id_column(cap), g, list(col._values))
                )
            elif prop in idx.filters.bools:
                col = idx.filters.bools[prop]
                if not col.single_valued():
                    return None
                per_prop.append(
                    (col.dense_id_column(cap), 2, [False, True])
                )
            elif prop in idx.filters.numbers:
                col = idx.filters.numbers[prop]
                if not col.single_valued():
                    return None
                got = col.group_id_column(cap, self.DEVICE_GROUP_MAX)
                if got is None:
                    return None
                ids, labels = got
                per_prop.append((ids, max(len(labels), 1), labels))
            else:
                return None
            versions.append(col.version)
        G = 1
        for _ids, g, _l in per_prop:
            G *= g
        if G > self.DEVICE_GROUP_MAX:
            return None
        key = ("gid", idx.uid, tuple(params.group_by.properties),
               tuple(versions))
        if len(per_prop) == 1:
            ids, g, labels = per_prop[0]
            return ids, g, labels, key
        combined = np.zeros(cap, np.int64)
        missing = np.zeros(cap, bool)
        for ids, g, _l in per_prop:
            combined = combined * g + np.maximum(ids, 0)
            missing |= ids < 0
        combined = np.where(missing, -1, combined).astype(np.int32)
        labels: List[Tuple] = [()]
        for _ids, _g, lv in per_prop:
            labels = [c + (v,) for c in labels for v in lv]
        return combined, G, labels, key

    @staticmethod
    def _matchall_group_pages(m: np.ndarray, gid: np.ndarray, G: int,
                              R: int):
        """Per-group first-R (doc, 0.0) pages for a MATCH-ALL group-by:
        chunked numpy scans over the presence mask + group-id column —
        typically one chunk fills every page; the host dict flow walked
        per-doc value dicts over the whole corpus (seconds at 10M).
        Order within a group is doc-ascending, the host flow's stable
        order for all-equal (zero) scores."""
        CH = 262144
        pages: list = [[] for _ in range(G)]
        remaining = G * R
        cap = len(m)
        for s in range(0, cap, CH):
            sel = np.flatnonzero(m[s:s + CH]) + s
            if not len(sel):
                continue
            g = gid[sel]
            keep = g >= 0
            sel, g = sel[keep], g[keep]
            if not len(sel):
                continue
            order = np.argsort(g, kind="stable")
            gs, ds = g[order], sel[order]
            starts = np.searchsorted(gs, np.arange(G))
            ends = np.searchsorted(gs, np.arange(G), side="right")
            for gi in range(G):
                take = R - len(pages[gi])
                if take <= 0 or starts[gi] >= ends[gi]:
                    continue
                got = ds[starts[gi]:min(ends[gi], starts[gi] + take)]
                pages[gi].extend((int(d), 0.0) for d in got)
                remaining -= len(got)
            if remaining <= 0:
                break
        return pages

    def _build_facet_plan(self, idx: ReadIndex, mode, params):
        """Stash a pruned plan (+ thr / query embedding) for DEVICE
        facet counting when the ranking dispatch didn't produce one
        (fused sort, fused group-by, host-dict fallbacks, vector mode).
        Phase A's reps are exact over the plan's full worklist, so the
        facet counts are independent of how the ranking ran. Leaves
        self._tls.pruned_plan None on failure (the caller falls back to
        the dense facet flows)."""
        self._tls.facet_vec_only = False
        if isinstance(mode, VectorMode):
            # no text worklist: phase A is the vec-only candidate probe
            targets = self.embeddings.calculate_embeddings(
                [mode.term], Intent.QUERY, idx.embedding_model
            )[0]
            if len(targets) != 1 or idx.vector is None:
                return
            from ..ops.vector import l2_normalize

            self._tls.hybrid_q = l2_normalize(
                np.asarray(targets[0], np.float32).reshape(1, -1)
            )
            self._tls.pruned_plan = ("vec-facets", object())
            self._tls.pruned_thr = None
            self._tls.facet_vec_only = True
            return
        planned = self._plan_fulltext(idx, mode, params)
        if planned is None:
            return
        tokens, plan = planned
        thr = None
        if getattr(mode, "threshold", None) is not None:
            thr = float(math.floor(len(tokens) * mode.threshold))
        if isinstance(mode, HybridMode):
            targets = self.embeddings.calculate_embeddings(
                [mode.term], Intent.QUERY, idx.embedding_model
            )[0]
            if len(targets) != 1 or idx.vector is None:
                return
            from ..ops.vector import l2_normalize

            self._tls.hybrid_q = l2_normalize(
                np.asarray(targets[0], np.float32).reshape(1, -1)
            )
        self._tls.pruned_plan = plan
        self._tls.pruned_thr = thr

    def _pruned_facet_counts(self, coll, idx: ReadIndex, mode,
                             specs, facet_results,
                             want_count: bool = False):
        """Device facet counting over the pruned plan (the facet quirk
        counts UNFILTERED matches, so only the tombstone alive-mask
        applies). HYBRID searches widen the match set with the IVF
        probe's top-V docs clearing the similarity floor — the query
        embedding is reused from the scoring dispatch
        (self._tls.hybrid_q).

        want_count: additionally return phase A's rep sum — the EXACT
        match count under the search's threshold and tombstones (the
        thresholded facet searches' count source; None otherwise)."""
        plan = self._tls.pruned_plan
        amask = idx.alive_mask()
        akey = (
            ("alive", idx.uid, idx.cap(), idx.tombstone_version)
            if amask is not None else None
        )
        # the EXACT thr the scoring kernel applied (floor(len(tokens) *
        # threshold), stashed alongside the plan) — rederiving it from
        # plan.starts.shape[0] only agrees while plan tokens ==
        # tokenizer tokens (advisor r4: a future plan-shape change
        # would silently desynchronize the count from the hit set)
        thr = self._tls.pruned_thr
        thr = float(thr) if thr is not None else 0.0
        vec = None
        if isinstance(mode, (HybridMode, VectorMode)):
            # the caller gates on hybrid_q being stashed (search())
            vec = (
                idx.vector, self._tls.hybrid_q,
                float(mode.similarity),
                idx.vector.config.score_rescale,
            )
        extra = {}
        if getattr(self._tls, "facet_vec_only", False):
            # vector-mode facets: phase A is the vec-only probe (no
            # text worklist; single-device executor only)
            extra["vec_only"] = True
        ex = self._fused_executor(coll, idx)
        for name, spec, skey, labels in specs:
            counts = ex.facet_counts_pruned(
                idx.string, plan, idx.cap(), spec, skey,
                exact=getattr(mode, "exact", False),
                mask=amask, mask_key=akey, thr=thr,
                vec=vec, **extra,
            )
            keep_zeros = (
                spec[0] in ("num", "mnum")
                or (spec[0] == "cat" and spec[3])
                or (spec[0] == "mcat" and spec[5])
            )
            values = {
                lab: int(round(c))
                for lab, c in zip(labels, counts)
                if keep_zeros or int(round(c))
            }
            prev = facet_results.get(name)
            if prev:
                for k2, v2 in values.items():
                    prev.values[k2] = prev.values.get(k2, 0) + v2
                prev.count = len(prev.values)
            else:
                facet_results[name] = FacetResult(
                    count=len(values), values=values
                )
        if want_count:
            return ex.facet_match_count(plan)
        return None

    @staticmethod
    def _mask_cache_key(idx: ReadIndex, params: SearchParams):
        """Stable device-cache key for a combined mask that is PURELY the
        tombstone alive-mask (no where-filter): tombstone_version bumps
        on every deleted-set mutation (incl. resurrection discards and
        commit clears), so (uid, cap, tombstone_version) never aliases
        two different masks. Ad-hoc where-filters return None (uploaded
        per query, like the dense path's doc_masks)."""
        if params is not None and not params.where.is_empty():
            return None
        if not idx.deleted:
            return None
        return ("alive", idx.uid, idx.cap(), idx.tombstone_version)

    def _plan_fulltext(self, idx: ReadIndex, mode, params: SearchParams,
                       use_champions: bool = False,
                       with_prefix: bool = False):
        """Tokenize + build the padded posting-range plan for a fulltext
        or hybrid query. Returns (tokens, plan) or None (no string
        fields searchable)."""
        parser = idx.parser
        parsed = parser.tokenize_and_stem(mode.term)
        if mode.exact:
            tokens = [t for t, _ in parsed]
        else:
            tokens = []
            for t, variants in parsed:
                tokens.append(t)
                tokens.extend(variants)
        if not tokens:
            tokens = [""]
        # properties: specified (string fields only) or all string fields
        # date-shaped string fields remain string SCORE fields
        # (reference write/index/mod.rs:812 keeps both)
        def _searchable(t):
            return t.startswith("string") or t == "date"

        if params.properties is not None:
            props = [
                p for p in params.properties
                if _searchable(idx.field_types.get(p, ""))
            ]
        else:
            props = [
                p for p, t in idx.field_types.items() if _searchable(t)
            ]
        if not props:
            return None
        fp = {
            p_: (float(v.get("weight", 1.0)), float(v.get("b", 0.75)))
            for p_, v in idx.field_params.items()
        } if idx.field_params else None
        # phrase capability: the query's consecutive-surface-token bigrams
        # score as extra weighted tokens (adjacency shadow terms in the
        # index; reference SearchParams phrase_boost knob)
        plan_tokens = list(tokens)
        token_weights = None
        # (skipped under an explicit match threshold: bigram matches would
        # inflate matched-token counts against the real-token denominator)
        if params.phrase_boost and params.phrase_boost != 1.0 \
                and getattr(mode, "threshold", None) is None:
            from ..index.string_index import BIGRAM_SEP

            surfaces = [t for t, _ in parsed]
            bigrams = [
                a + BIGRAM_SEP + b for a, b in zip(surfaces, surfaces[1:])
            ]
            if bigrams:
                token_weights = [1.0] * len(plan_tokens) + [
                    float(params.phrase_boost)
                ] * len(bigrams)
                plan_tokens = plan_tokens + bigrams
        plan = idx.string.plan_query(
            plan_tokens, props, params.boost,
            tolerance=(0 if mode.exact else mode.tolerance) or None,
            # impact_cap truncation points don't align to the sharded
            # executor's boundary prefix (and the mesh doesn't need the
            # knob — work is already 1/D per chip)
            impact_cap=None if self.sharded_mesh is not None
            else self.config.reader_side.impact_cap,
            field_params=fp,
            token_weights=token_weights,
            use_champions=use_champions,
            with_prefix=with_prefix,
        )
        return tokens, plan

    def _fulltext_scores(
        self,
        coll: CollectionReader,
        idx: ReadIndex,
        mode: FulltextMode,
        params: SearchParams,
        mask: Optional[np.ndarray],
        fused_ok: bool = False,
        omc_in_kernel: bool = False,
        want_bitmap: bool = False,
        sort_spec=None,
        group_spec=None,
    ) -> Dict[int, float]:
        """When fused_ok, returns only the top candidates (enough for the
        requested page) via one fused device call and stashes the exact
        match count on self._tls.fused_count — only (k,) results cross
        the tunnel instead of dense (cap,) score vectors. With
        omc_in_kernel, OMC multipliers apply on-device before top-k (sets
        self._tls.omc_applied so callers don't double-apply).

        want_bitmap (facet searches): the fused dispatch also returns
        the FULL match set as packed bits, stashed on
        self._tls.match_mask as bool[cap] — pruning and champion rows
        are disabled for it (the pruned kernel has no dense match set;
        champion membership could drift from the plain scorer)."""
        # empty term = match-all (reference fulltext_search.rs
        # test_fulltext_empty_term returns every doc; bugs.rs test_bug_1
        # relies on it for filter-only searches)
        if not mode.term.strip():
            # match-all (reference fulltext_search.rs
            # test_fulltext_empty_term; bugs.rs test_bug_1 filter-only
            # searches). Fused-eligible match-alls page/count/facet/sort
            # over the VECTORIZED presence mask — the dict comprehension
            # below is O(corpus) python per query (seconds at 10M);
            # group-by keeps it (it walks per-doc values).
            self._tls.fused_count = None
            self._tls.omc_applied = False
            cap = idx.cap()
            m = idx.present_mask()
            if mask is not None:
                m = m & mask[:cap]
            if fused_ok:
                self._tls.match_mask = m
                self._tls.fused_count = int(np.count_nonzero(m))
                # 2x page margin like the fused term path (pin rules can
                # push items past the page, sort.rs:25-46)
                need = max(2 * (params.limit + params.offset), 16)
                if sort_spec is not None:
                    ranked = self._sorted_matchall(
                        idx, m, sort_spec, need
                    )
                    self._tls.sorted_ranked = ranked
                    return {d: v for d, v in ranked}
                if group_spec is not None:
                    # vectorized match-all group-by: per-group first-R
                    # pages off the presence mask (doc-asc = the host
                    # flow's stable zero-score order)
                    gid_col, n_groups, labels, _gkey = group_spec
                    self._tls.grouped_pages = (
                        labels,
                        self._matchall_group_pages(
                            m, gid_col, n_groups,
                            params.group_by.max_results,
                        ),
                    )
                page = np.flatnonzero(m)[:need]
                return {int(d): 0.0 for d in page}
            alive = idx.alive_doc_ids()
            if mask is not None:
                return {
                    d: 0.0 for d in alive if d < len(mask) and mask[d]
                }
            return {d: 0.0 for d in alive}
        cap = idx.cap()
        k = min(max(2 * (params.limit + params.offset), 16), cap)
        want_exact_counts = bool(
            getattr(params, "exact_count", False)
            or self.config.reader_side.pruned_exact_counts
        )
        mask_sel = (
            int(np.count_nonzero(mask)) if mask is not None else None
        )
        use_pruned = (
            fused_ok and not want_bitmap and sort_spec is None
            and group_spec is None
            and self._pruned_eligible(
                idx, mask, k, mode, params,
                exact_counts=want_exact_counts,
                mesh_ok=True, mask_sel=mask_sel,
            )
        )
        # champion rows apply only on the single-device fused DENSE path
        # (the pruned/sharded/hybrid executors consume ranged plans)
        planned = self._plan_fulltext(
            idx, mode, params,
            use_champions=fused_ok and not use_pruned and not want_bitmap
            and sort_spec is None and group_spec is None
            and self.sharded_mesh is None and not mode.exact,
            with_prefix=use_pruned,
        )
        if planned is None:
            return {}
        tokens, plan = planned
        if use_pruned and plan.starts.shape[1] > PRUNED_MAX_RANGES:
            # a fuzzy token exploded into too many variant ranges for
            # the worklist's earlier-span dedup — take the dense path
            use_pruned = False
            planned = self._plan_fulltext(idx, mode, params)
            if planned is None:
                return {}
            tokens, plan = planned
        ex = self._fused_executor(coll, idx) if fused_ok else coll.executor(
            idx.index_id
        )
        if fused_ok:
            thr = None
            if mode.threshold is not None:
                thr = float(math.floor(len(tokens) * mode.threshold))
            omc_arr = idx.omc_array() if omc_in_kernel else None
            if use_pruned:
                self._tls.pruned_plan = plan
                self._tls.pruned_thr = thr
                small_filter = (
                    mask_sel is not None
                    and mask_sel <= PrunedPlanMixin.PRUNED_CANDIDATES
                )
                if not want_exact_counts and not small_filter:
                    self._tls.count_estimated = True
                mask_kw = {}
                if mask is not None:
                    mask_kw = dict(
                        mask=mask,
                        mask_key=self._mask_cache_key(idx, params),
                    )
                vals, ids, counts = ex.search_topk_pruned(
                    idx.string, [plan], [idx.document_count()], cap, k=k,
                    exact=mode.exact,
                    thresholds=[thr] if thr is not None else None,
                    omc=omc_arr, omc_key=(idx.uid, idx.omc_version),
                    exact_counts=want_exact_counts,
                    **mask_kw,
                )
            elif sort_spec is not None:
                # fused sort-by: the sort column rides the device; the
                # returned page is already in field order
                prop = sort_spec.property
                col = None
                for group in (idx.filters.numbers, idx.filters.dates,
                              idx.filters.bools):
                    col = group.get(prop)
                    if col is not None:
                        break
                # version BEFORE the snapshot: a concurrent column
                # mutation then caches under an already-stale key
                # (harmless) instead of stale values under the current
                # key
                col_ver = col.version
                vals_h, present_h = col.dense_values(cap)
                ranked, counts = ex.search_topk_sorted(
                    idx.string, [plan], [idx.document_count()], cap, k=k,
                    sort_vals=vals_h, sort_present=present_h,
                    svals_key=("svals", idx.uid, prop, col_ver),
                    desc=sort_spec.order == "desc",
                    exact=mode.exact,
                    doc_masks=[mask] if mask is not None else None,
                    thresholds=[thr] if thr is not None else None,
                    omc=omc_arr, omc_key=(idx.uid, idx.omc_version),
                )
                self._tls.sorted_ranked = ranked[0]
                self._tls.fused_count = int(counts[0])
                self._tls.omc_applied = omc_arr is not None
                return {int(d): float(v) for d, v in ranked[0]}
            elif group_spec is not None:
                # fused group-by: the group-id column rides the device;
                # only the main page + (G, R) group pages come back
                gid_col, n_groups, labels, gkey = group_spec
                vals, ids, counts, group_pages = ex.search_topk_grouped(
                    idx.string, [plan], [idx.document_count()], cap,
                    k=k,
                    gid_col=gid_col, gid_key=gkey, n_groups=n_groups,
                    max_results=params.group_by.max_results,
                    exact=mode.exact,
                    doc_masks=[mask] if mask is not None else None,
                    thresholds=[thr] if thr is not None else None,
                    omc=omc_arr, omc_key=(idx.uid, idx.omc_version),
                )
                self._tls.grouped_pages = (labels, group_pages[0])
            else:
                # only the single-device executor takes with_bitmap
                # (want_bitmap is gated on sharded_mesh is None)
                bitmap_kw = {"with_bitmap": True} if want_bitmap else {}
                out = ex.search_topk(
                    idx.string, [plan], [idx.document_count()], cap, k=k,
                    exact=mode.exact,
                    doc_masks=[mask] if mask is not None else None,
                    thresholds=[thr] if thr is not None else None,
                    omc=omc_arr, omc_key=(idx.uid, idx.omc_version),
                    **bitmap_kw,
                )
                vals, ids, counts = out[:3]
                if want_bitmap:
                    self._tls.match_mask = out[3][0]
            self._tls.fused_count = int(counts[0])
            self._tls.omc_applied = omc_arr is not None
            return {
                int(d): float(v)
                for v, d in zip(vals[0], ids[0])
                if v > 0
            }
        scores, matched = ex.score(
            idx.string, [plan], [idx.document_count()], cap,
            exact=mode.exact,
            doc_masks=[mask] if mask is not None else None,
        )
        s, m = scores[0], matched[0]
        if mode.threshold is not None:
            thr = math.floor(len(tokens) * mode.threshold)
            keep = (s > 0) & (m >= thr)
        else:
            keep = s > 0
        nz = np.nonzero(keep)[0]
        return {int(d): float(s[d]) for d in nz}

    def _fused_executor(self, coll: CollectionReader, idx: ReadIndex):
        """Executor for the fused fulltext path: the doc-sharded mesh
        executor when a mesh is configured, the single-device one
        otherwise. Both share the search_topk contract."""
        if self.sharded_mesh is None:
            return coll.executor(idx.index_id)
        ex = coll._sharded_executors.get(idx.index_id)
        if ex is None:
            from ..parallel.engine import ShardedStringExec

            ex = coll._sharded_executors[idx.index_id] = ShardedStringExec(
                self.sharded_mesh
            )
        return ex

    def _vector_scores(
        self,
        idx: ReadIndex,
        term: str,
        similarity: float,
        params: SearchParams,
        mask: Optional[np.ndarray],
    ) -> Dict[int, float]:
        if idx.vector is None:
            return {}
        targets = self.embeddings.calculate_embeddings(
            [term], Intent.QUERY, idx.embedding_model
        )[0]
        limit = max(params.limit + params.offset, params.limit)
        return idx.vector.search(
            targets, limit=limit, similarity=similarity,
            filter_mask=mask, cap=idx.cap(),
        )

    # -- facets ----------------------------------------------------------

    def _compute_facets(
        self,
        idx: ReadIndex,
        params: SearchParams,
        scores,  # Dict[int, float] | bool[cap] match mask (fused bitmap)
        out: Dict[str, FacetResult],
    ):
        cap = idx.cap()
        if isinstance(scores, np.ndarray):
            # fused-bitmap path: the device already computed the match
            # set (ops/bm25.py with_bitmap) — no host dict round-trip
            doc_mask = np.zeros(cap, bool)
            n = min(len(scores), cap)
            doc_mask[:n] = scores[:n]
        else:
            doc_mask = np.zeros(cap, bool)
            if scores:
                dd = np.fromiter(scores.keys(), np.int64, len(scores))
                doc_mask[dd[dd < cap]] = True
        for name, facet in params.facets.items():
            if facet.kind == "number" and name in idx.filters.numbers:
                ranges = [(r.from_, r.to) for r in facet.ranges]
                counts = idx.filters.numbers[name].range_counts(ranges, doc_mask)
                values = {
                    f"{_fmt_num(r.from_)}-{_fmt_num(r.to)}": c
                    for r, c in zip(facet.ranges, counts)
                }
                prev = out.get(name)
                if prev:
                    for k, v in values.items():
                        prev.values[k] = prev.values.get(k, 0) + v
                    prev.count = len(prev.values)
                else:
                    out[name] = FacetResult(count=len(values), values=values)
            elif facet.kind == "bool" and name in idx.filters.bools:
                counts = idx.filters.bools[name].counts(doc_mask)
                prev = out.get(name)
                if prev:
                    for k, v in counts.items():
                        prev.values[k] = prev.values.get(k, 0) + v
                    prev.count = len(prev.values)
                else:
                    out[name] = FacetResult(count=len(counts), values=dict(counts))
            elif facet.kind == "string" and name in idx.filters.strings:
                counts = idx.filters.strings[name].value_counts(doc_mask)
                prev = out.get(name)
                if prev:
                    for k, v in counts.items():
                        prev.values[k] = prev.values.get(k, 0) + v
                    prev.count = len(prev.values)
                else:
                    out[name] = FacetResult(count=len(counts), values=counts)

    # -- groups -----------------------------------------------------------

    def _collect_group_values(
        self,
        idx: ReadIndex,
        params: SearchParams,
        scores: Dict[int, float],
        out: Dict[int, Dict[str, List[Any]]],
    ):
        docs = list(scores.keys())
        docs_arr = np.asarray(docs, np.int64)
        for prop in params.group_by.properties:
            if prop in idx.filters.strings:
                vals = idx.filters.strings[prop].doc_values(docs)
                for d, vs in vals.items():
                    out.setdefault(d, {}).setdefault(prop, []).extend(vs)
            elif prop in idx.filters.numbers:
                col = idx.filters.numbers[prop]
                dd, vv = col.slab()
                sel = np.isin(dd, docs_arr)  # vectorized over the slab
                for d, v in zip(dd[sel].tolist(), vv[sel].tolist()):
                    out.setdefault(d, {}).setdefault(prop, []).append(v)
            elif prop in idx.filters.bools:
                col = idx.filters.bools[prop]
                dd, vv = col.slab()
                sel = np.isin(dd, docs_arr)
                for d, v in zip(dd[sel].tolist(), vv[sel].tolist()):
                    out.setdefault(d, {}).setdefault(prop, []).append(bool(v))

    def _build_groups(
        self,
        coll: CollectionReader,
        indexes: List[ReadIndex],
        all_scores: Dict[int, float],
        group_values: Dict[int, Dict[str, List[Any]]],
        params: SearchParams,
        consequences: List[Consequence],
        resolve: Dict[str, int],
    ) -> List[GroupedResult]:
        props = params.group_by.properties
        max_results = params.group_by.max_results
        groups: Dict[Tuple, List[int]] = {}
        for d in all_scores:
            vals = group_values.get(d)
            if not vals or any(p not in vals for p in props):
                continue
            # cartesian product over multi-valued fields
            combos: List[Tuple] = [()]
            for p in props:
                combos = [c + (v,) for c in combos for v in vals[p]]
            for combo in combos:
                groups.setdefault(combo, []).append(d)
        out: List[GroupedResult] = []
        for combo, docs in groups.items():
            if params.sort_by is not None:
                scoped = {d: all_scores[d] for d in docs}
                ranked_pairs = self._sort_by_field(indexes, scoped, params.sort_by)
            else:
                ranked = sorted(docs, key=lambda d: -all_scores[d])
                ranked_pairs = [(d, all_scores[d]) for d in ranked]
            if consequences:
                group_set = set(docs)
                filtered_cons = [
                    Consequence([
                        p for p in c.promote
                        if resolve.get(p.doc_id) in group_set
                    ])
                    for c in consequences
                ]
                filtered_cons = [c for c in filtered_cons if c.promote]
                ranked_pairs = apply_promotions(
                    filtered_cons, resolve, all_scores, ranked_pairs
                )
            page = ranked_pairs[:max_results]
            hits = self._hydrate(coll, indexes, page)
            out.append(GroupedResult(values=list(combo), result=hits))
        out.sort(key=lambda g: [str(v) for v in g.values])
        return out

    # -- ranking -----------------------------------------------------------

    def _rank(
        self,
        indexes: List[ReadIndex],
        scores: Dict[int, float],
        params: SearchParams,
        consequences: List[Consequence],
        resolve: Dict[str, int],
    ) -> List[Tuple[int, float]]:
        top_count = params.limit + params.offset
        if consequences:
            top_count *= 2  # pin rules can push items past the page (sort.rs:25-46)
        if params.sort_by is not None:
            pre = getattr(self._tls, "sorted_ranked", None)
            # fused sort-by already ranked the page on device (field
            # order incl. the fieldless tail); consequences are empty by
            # the fused_sort eligibility rule
            ranked = (
                pre if pre is not None
                else self._sort_by_field(indexes, scores, params.sort_by)
            )
            ranked = ranked[:top_count] if top_count < len(ranked) else ranked
        else:
            ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:top_count]
        return apply_promotions(consequences, resolve, scores, ranked)

    def _sorted_matchall(
        self,
        idx: ReadIndex,
        m: np.ndarray,
        sort_by,
        need: int,
    ) -> List[Tuple[int, float]]:
        """First `need` docs of the match-all set in sort-field order —
        (value, doc asc) then fieldless docs by id, all vectorized and
        truncated (no O(matches) python list)."""
        cap = idx.cap()
        out: List[Tuple[int, float]] = []
        mm = m.copy()
        for group in (idx.filters.numbers, idx.filters.dates,
                      idx.filters.bools):
            col = group.get(sort_by.property)
            if col is None:
                continue
            vals, presentv = col.dense_values(cap)
            sel = mm & presentv[:cap]
            docs_w = np.flatnonzero(sel)
            keys = vals[docs_w]
            order = np.lexsort((
                docs_w, -keys if sort_by.order == "desc" else keys,
            ))
            out = [(int(d), 0.0) for d in docs_w[order[:need]]]
            mm = mm & ~sel
            break
        if len(out) < need:
            out += [
                (int(d), 0.0)
                for d in np.flatnonzero(mm)[: need - len(out)]
            ]
        return out

    def _sort_by_field(
        self,
        indexes: List[ReadIndex],
        scores: Dict[int, float],
        sort_by,
    ) -> List[Tuple[int, float]]:
        """Vectorized sort-by: dense doc->value caches per column (built
        once per column change), then O(hits log hits) argsort — no
        O(corpus) Python loops on the query path."""
        prop, order = sort_by.property, sort_by.order
        docs = np.fromiter(scores.keys(), np.int64, len(scores))
        key_vals = np.zeros(len(docs), np.float64)
        have = np.zeros(len(docs), bool)
        for idx in indexes:
            cap = idx.cap()
            for group in (idx.filters.numbers, idx.filters.dates, idx.filters.bools):
                col = group.get(prop)
                if col is None:
                    continue
                vals, present = col.dense_values(cap)
                in_cap = docs < cap
                hit = np.zeros(len(docs), bool)
                hit[in_cap] = present[docs[in_cap]]
                take = hit & ~have
                key_vals[take] = vals[docs[take]]
                have |= hit
        present_docs = docs[have]
        present_keys = key_vals[have]
        # ties within a sort value break by doc id ASCENDING in both
        # directions — the same order the fused device path produces
        # (XLA top_k is stable: lower index first on equal keys)
        idx_order = np.lexsort((
            present_docs,
            -present_keys if order == "desc" else present_keys,
        ))
        ordered = present_docs[idx_order].tolist()
        missing = np.sort(docs[~have]).tolist()
        # docs without the sort field rank after sorted ones
        return [(d, scores[d]) for d in ordered] + [
            (d, scores[d]) for d in missing
        ]

    # -- hydration ----------------------------------------------------------

    def _hydrate(
        self,
        coll: CollectionReader,
        indexes: List[ReadIndex],
        page: List[Tuple[int, float]],
    ) -> List[SearchResultHit]:
        blobs = coll.doc_storage.get_documents_by_ids([d for d, _ in page])
        # persistent doc->index map: O(page), not O(corpus) per query
        doc_index = coll.doc_index
        hits = []
        for d, score in page:
            idx = doc_index.get(d)
            user_id = idx.doc_user_ids.get(d, str(d)) if idx else str(d)
            iid = idx.index_id if idx else ""
            raw = blobs.get(d)
            doc = json.loads(raw) if raw else None
            hits.append(
                SearchResultHit(id=f"{iid}:{user_id}", score=score, document=doc)
            )
        return hits

    # ------------------------------------------------------------------
    # Stats / docs API
    # ------------------------------------------------------------------

    def collection_stats(self, collection_id: str, read_key: Optional[str]) -> Dict[str, Any]:
        coll = self.check_read_key(collection_id, read_key)
        return {
            "id": coll.collection_id,
            "document_count": coll.document_count(),
            "description": coll.description,
            "default_locale": coll.default_locale,
            "indexes": [i.stats() for i in coll.indexes.values()],
        }

    def filterable_fields(self, collection_id: str, read_key: Optional[str]) -> Dict[str, str]:
        coll = self.check_read_key(collection_id, read_key)
        out: Dict[str, str] = {}
        for idx in coll.indexes.values():
            out.update(idx.filters.all_fields())
        return out

    def batch_get_documents(
        self, collection_id: str, read_key: Optional[str], user_ids: Sequence[str]
    ) -> Dict[str, Dict[str, Any]]:
        """Documents keyed by user doc id; missing/deleted ids are simply
        absent and duplicate request ids collapse to one entry (reference
        read/mod.rs batch_get_documents -> HashMap<String, Document>,
        tests/batch_get_documents.rs:144)."""
        coll = self.check_read_key(collection_id, read_key)
        internal: Dict[str, int] = {}
        for idx in coll.indexes.values():
            for uid in user_ids:
                d = idx.user_to_internal.get(uid)
                if d is not None:
                    internal[uid] = d
        blobs = coll.doc_storage.get_documents_by_ids(list(internal.values()))
        out: Dict[str, Dict[str, Any]] = {}
        for uid, d in internal.items():
            v = blobs.get(d)
            if v is not None:
                out[uid] = json.loads(v)
        return out

    # ------------------------------------------------------------------
    # Commit / load (SURVEY §5.4)
    # ------------------------------------------------------------------

    def _commit_collection_memory(self, coll: CollectionReader):
        """Phase 1 of a commit (REQUIRES the state WRITE lock): merge live
        layers into committed structures and capture manifest snapshots.
        Returns (dirty indexes to save, manifest dict)."""
        offset = self.live_offset
        to_save = []
        for iid, idx in coll.indexes.items():
            if idx.dirty:
                idx.commit_memory(offset)
                to_save.append((iid, idx))
            else:
                idx.committed_offset = offset
        coll.committed_offset = offset
        manifest = {
            "collection_id": coll.collection_id,
            "read_api_key": coll.read_api_key,
            "write_api_key": coll.write_api_key,
            "default_locale": coll.default_locale,
            "embedding_model": coll.embedding_model,
            "description": coll.description,
            "mcp_description": coll.mcp_description,
            "aliases": dict(coll.aliases),
            "deleted_indexes": sorted(coll.deleted_indexes),
            "hooks": dict(coll.hooks),
            "pin_rules": dict(coll.pin_rules),
            "shelves": dict(coll.shelves),
            "values": dict(coll.values),
            "indexes": list(coll.indexes.keys()),
            "committed_offset": offset,
        }
        return to_save, manifest

    def _commit_collection_io(self, coll, to_save, manifest):
        """Phase 2: file I/O, outside the state lock (searches proceed).

        Doc storage commits FIRST: index snapshots record the committed
        offset, and replay dedup skips doc_storage.insert for ops at or
        below it — if the snapshot landed before the doc blobs, a crash
        in between would lose raw documents forever (orphan blobs from
        the reverse order are harmless)."""
        coll.doc_storage.commit()
        for iid, idx in to_save:
            idx.save(os.path.join(coll.data_dir, "indexes", iid))
        atomic_write_json(
            os.path.join(coll.data_dir, "collection.json"), manifest
        )
        # GC snapshot dirs of deleted/replaced indexes (they are
        # unreferenced once the manifest omits them)
        idx_root = os.path.join(coll.data_dir, "indexes")
        if os.path.isdir(idx_root):
            live = set(manifest["indexes"])
            for name in os.listdir(idx_root):
                if name not in live:
                    shutil.rmtree(
                        os.path.join(idx_root, name), ignore_errors=True
                    )

    def commit_collection(self, collection_id: str):
        """Commit ONE collection's indexes + doc storage (per-collection
        threshold path, CommitScope::SelectedCollection analog). The global
        offset only advances on full commits; replay safety comes from the
        collection's committed_offset in its manifest."""
        coll = self.collections.get(collection_id)
        if coll is None:
            return
        with self._commit_lock:
            with self._state_lock.write("commit_collection"):
                to_save, manifest = self._commit_collection_memory(coll)
            self._commit_collection_io(coll, to_save, manifest)
            self._coll_ops_since_commit[collection_id] = 0
            self._coll_last_commit[collection_id] = time.time()

    def commit(self, force: bool = False):
        from ..metrics import COMMIT_TIME

        t0 = time.perf_counter()
        with span("commit"), self._commit_lock:
            # phase 1 under the state write lock: in-memory merges mutate
            # structures concurrent searches iterate (live dicts,
            # tombstones) — ADVICE r1: commits must exclude searches
            with span("commit_memory"), self._state_lock.write("commit"):
                offset = self.live_offset
                work = [
                    (coll, *self._commit_collection_memory(coll))
                    for coll in self.collections.values()
                ]
            # phase 2: file I/O with searches running
            with span("commit_io"):
                for coll, to_save, manifest in work:
                    self._commit_collection_io(coll, to_save, manifest)
            self.kv.commit()
            atomic_write_json(
                os.path.join(self.data_dir, "read.info.json"),
                {"v": 1, "offset": offset},
            )
            self.committed_offset = offset
            self._ops_since_commit = 0
            now = time.time()
            for cid in self.collections:
                self._coll_ops_since_commit[cid] = 0
                self._coll_last_commit[cid] = now
        COMMIT_TIME.observe(time.perf_counter() - t0)

    def _load(self):
        info = read_json(os.path.join(self.data_dir, "read.info.json"))
        if info:
            self.committed_offset = info.get("offset", 0)
            self.live_offset = self.committed_offset
        # collections are loaded even without a global read.info.json:
        # commit_collection persists them independently, and their
        # committed_offset keeps replay from offset 0 idempotent
        coll_root = os.path.join(self.data_dir, "collections")
        if not os.path.isdir(coll_root):
            return
        for cid in os.listdir(coll_root):
            cdir = os.path.join(coll_root, cid)
            meta = read_json(os.path.join(cdir, "collection.json"))
            if not meta:
                continue
            coll = CollectionReader(
                collection_id=meta["collection_id"],
                read_api_key=meta["read_api_key"],
                write_api_key=meta.get("write_api_key"),
                default_locale=meta.get("default_locale", "english"),
                embedding_model=meta.get("embedding_model", "builtin-minihash-384"),
                nlp=self.nlp,
                data_dir=cdir,
                description=meta.get("description"),
                mcp_description=meta.get("mcp_description"),
            )
            coll.aliases = dict(meta.get("aliases", {}))
            coll.deleted_indexes = set(meta.get("deleted_indexes", []))
            coll.hooks = dict(meta.get("hooks", {}))
            coll.pin_rules = dict(meta.get("pin_rules", {}))
            coll.shelves = dict(meta.get("shelves", {}))
            coll.values = dict(meta.get("values", {}))
            coll.committed_offset = int(meta.get("committed_offset", 0))
            for iid in meta.get("indexes", []):
                idx = ReadIndex.load(os.path.join(cdir, "indexes", iid), self.nlp)
                if idx is not None:
                    coll.indexes[iid] = idx
                    for d in idx.doc_user_ids:
                        coll.doc_index[d] = idx
            self.collections[cid] = coll

    def stop(self):
        self._stop = True
        if self._consumer:
            self._consumer.join(timeout=5)
        self.commit(force=True)


# ---------------------------------------------------------------------------

def _normalize_and_combine(
    vector: Dict[int, float], fulltext: Dict[int, float]
) -> Dict[int, float]:
    """Hybrid fusion (token_score.rs:393-422): min-max over BOTH sets,
    normalize each, sum."""
    vmax = max(vector.values(), default=0.0)
    fmax = max(fulltext.values(), default=0.0)
    hi = max(vmax, fmax, 0.0)
    vmin = min(vector.values(), default=0.0)
    fmin = min(fulltext.values(), default=0.0)
    lo = min(vmin, fmin, 0.0)
    span = hi - lo
    if span <= 0:
        span = 1.0
    out = {d: (s - lo) / span for d, s in fulltext.items()}
    for d, s in vector.items():
        out[d] = out.get(d, 0.0) + (s - lo) / span
    return out


def _walk_filter_keys(where: WhereFilter) -> List[str]:
    keys = [c.path for c in where.conditions]
    for sub in where.and_ + where.or_:
        keys.extend(_walk_filter_keys(sub))
    if where.not_:
        keys.extend(_walk_filter_keys(where.not_))
    return keys


def _fmt_num(x) -> str:
    if isinstance(x, float) and x.is_integer():
        return str(int(x))
    return str(x)


# ---------------------------------------------------------------------------
# Batched search — TPU-native first-class API (no reference counterpart:
# the reference serves one query per request; batching is where the TPU
# wins, so the engine exposes it directly).
# ---------------------------------------------------------------------------

def _can_use_shared(params_list: List[SearchParams]):
    """(kind, None) with kind in 'fulltext' | 'hybrid' | 'vector' when
    the batch can ride the term-dedup shared device path, else
    (None, reason) -> per-query fallback (reason feeds the
    search_batch_fallbacks_total metric — no silent downgrades).

    exact / tolerance / phrase_boost are supported when HOMOGENEOUS
    across the batch (the shared path dedups tokens batch-wide, so the
    per-token matching config must agree)."""
    first = params_list[0]
    kinds = set()
    for p in params_list:
        if isinstance(p.mode, FulltextMode) and p.mode_str in (
            "fulltext", "default"
        ):
            kinds.add("fulltext")
        elif isinstance(p.mode, HybridMode):
            kinds.add("hybrid")
        elif isinstance(p.mode, VectorMode):
            kinds.add("vector")
        else:
            return None, "mode"
        if p.facets or p.group_by:
            return None, "facets_groups"
        if (p.sort_by is None) != (first.sort_by is None) or (
            p.sort_by is not None
            and (p.sort_by.property != first.sort_by.property
                 or p.sort_by.order != first.sort_by.order)
        ):
            return None, "mixed_sort"
        if getattr(p.mode, "exact", False) != getattr(
            first.mode, "exact", False
        ):
            return None, "mixed_exact"
        if getattr(p.mode, "tolerance", None) != getattr(
            first.mode, "tolerance", None
        ):
            return None, "mixed_tolerance"
        if p.phrase_boost != first.phrase_boost:
            return None, "mixed_phrase_boost"
        if not p.mode.term.strip():
            return None, "empty_term"  # match-all: single-path semantics
        if p.properties != first.properties or p.boost != first.boost:
            return None, "mixed_properties_boost"
        if isinstance(p.mode, VectorMode) and not p.where.is_empty():
            return None, "vector_filter"
    if len(kinds) != 1:
        return None, "mixed_modes"
    kind = kinds.pop()
    if first.sort_by is not None:
        # homogeneous sorted batches ride the fused sort kernel in one
        # dispatch (B plans; _search_batch_sorted); only fulltext sorts
        if kind != "fulltext":
            return None, "sorted_non_fulltext"
        return "sorted", None
    return kind, None


def _search_batch(
    self: "ReadSide",
    collection_id: str,
    read_key: Optional[str],
    params_list: List[SearchParams],
) -> List[SearchResult]:
    """Execute many queries in one device pass when they are homogeneous
    plain fulltext searches (term-dedup shared scoring); falls back to
    per-query execution otherwise."""
    from ..metrics import BATCH_FALLBACKS

    coll = self.check_read_key(collection_id, read_key)
    if not params_list:
        return []
    indexes = coll.runtime_indexes()
    if indexes:
        shared_kind, reason = _can_use_shared(params_list)
    else:
        shared_kind, reason = None, "no_indexes"
    if shared_kind == "vector" and len(indexes) != 1:
        shared_kind, reason = None, "vector_multi_index"
    if shared_kind is None:
        import logging

        BATCH_FALLBACKS.inc({"reason": reason or "unknown"})
        logging.getLogger("oramacore_tpu.read").info(
            "search_batch fell back to per-query execution: %s", reason
        )
        return [self.search(collection_id, read_key, p) for p in params_list]
    with self._state_lock.read("search_batch"):
        out = _search_batch_locked(
            self, coll, indexes, params_list, shared_kind
        )
    if out is None:  # no searchable string fields → per-query fallback
        BATCH_FALLBACKS.inc({"reason": "no_string_fields"})
        return [self.search(collection_id, read_key, p) for p in params_list]
    return out


def _search_batch_vector(
    self: "ReadSide",
    coll: CollectionReader,
    indexes,
    params_list: List[SearchParams],
) -> Optional[List[SearchResult]]:
    """Homogeneous pure-vector batch: ONE embeddings call + ONE device
    top-k dispatch for all B queries (flat bf16 or IVF/int8 layout),
    then per-query threshold/rescale/hydration."""
    idx = indexes[0]
    if idx.vector is None or idx.vector.n_rows() == 0:
        return [
            SearchResult(hits=[], count=0) for _ in params_list
        ]
    all_targets = self.embeddings.calculate_embeddings(
        [p.mode.term for p in params_list], Intent.QUERY,
        idx.embedding_model,
    )
    if any(len(t) != 1 for t in all_targets):
        return None  # multi-chunk query embeddings: per-query fallback
    queries = np.stack([np.asarray(t[0], np.float32) for t in all_targets])
    limit = max(p.limit + p.offset for p in params_list)
    score_maps = idx.vector.search_many(
        queries, limit=limit,
        similarities=[p.mode.similarity for p in params_list],
    )
    alive = idx.alive_mask()
    results: List[SearchResult] = []
    for p, scores in zip(params_list, score_maps):
        if alive is not None:
            scores = {
                d: s for d, s in scores.items()
                if d < len(alive) and alive[d]
            }
        # OMC multipliers after scoring (search.rs:342 semantics)
        if idx.omc:
            for d in list(scores.keys()):
                m = idx.omc.get(d)
                if m is not None:
                    scores[d] *= m
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        page = ranked[p.offset : p.offset + p.limit]
        hits = self._hydrate(coll, indexes, page)
        results.append(SearchResult(hits=hits, count=len(scores)))
    return results


def _search_batch_locked(
    self: "ReadSide",
    coll: CollectionReader,
    indexes,
    params_list: List[SearchParams],
    shared_kind: str = "fulltext",
) -> Optional[List[SearchResult]]:
    # a stale facet_thr_exact from a prior single search on this thread
    # must not widen batch eligibility (batches never run the facet-reps
    # count override)
    self._tls.facet_thr_exact = False
    if shared_kind == "vector":
        return _search_batch_vector(self, coll, indexes, params_list)
    if shared_kind == "sorted":
        return _search_batch_sorted(self, coll, indexes, params_list)
    # multi-index batches run the shared executor per index and merge
    # the per-query top-k by score (the single-query path's cross-index
    # merge, search.rs:283-501 semantics) — previously a silent
    # per-query fallback (VERDICT r2 weak #9)
    per_index = []
    for idx in indexes:
        out = _search_batch_index(self, coll, idx, params_list, shared_kind)
        if out is not None:
            per_index.append(out)
    if not per_index:
        return None
    results: List[SearchResult] = []
    for qi, p in enumerate(params_list):
        pairs: List[Tuple[int, float]] = []
        count = 0
        estimated = False
        for (idx_pairs, counts, est) in per_index:
            pairs.extend(idx_pairs[qi])
            count += int(counts[qi])
            estimated = estimated or est
        # canonical (-score, doc) order — the per-query path's ranking
        # (_search_locked), so ties break identically to sequential
        # searches (on the mesh the raw device order is shard order)
        pairs.sort(key=lambda kv: (-kv[1], kv[0]))
        page = pairs[p.offset: p.offset + p.limit]
        hits = self._hydrate(coll, indexes, page)
        results.append(SearchResult(
            hits=hits, count=count, count_estimated=estimated,
        ))
    return results


def _search_batch_sorted(
    self: "ReadSide",
    coll: CollectionReader,
    indexes,
    params_list: List[SearchParams],
) -> Optional[List[SearchResult]]:
    """Homogeneous SORTED fulltext batch: B ranged plans through the
    fused sort kernel (search_exec.search_topk_sorted) — one dispatch,
    pages already in field order (the per-query fused-sort semantics:
    value + doc-asc, fieldless tail, exact counts). Single index,
    number/date/bool column, shallow pages; anything else returns None
    for the per-query fallback."""
    if len(indexes) != 1:
        return None
    idx = indexes[0]
    first = params_list[0]
    sb = first.sort_by
    col = None
    for group in (idx.filters.numbers, idx.filters.dates,
                  idx.filters.bools):
        col = group.get(sb.property)
        if col is not None:
            break
    if col is None:
        return None
    if any(p.limit + p.offset > 512 for p in params_list):
        return None
    cap = idx.cap()
    plans = []
    thr_list: List[Optional[float]] = []
    for p in params_list:
        planned = self._plan_fulltext(idx, p.mode, p)
        if planned is None:
            return None
        p_tokens, plan = planned
        plans.append(plan)
        thr_list.append(
            float(np.floor(len(p_tokens) * p.mode.threshold))
            if p.mode.threshold is not None else None
        )
    doc_masks = None
    if any(not p.where.is_empty() for p in params_list) or idx.deleted:
        doc_masks = []
        for p in params_list:
            fm = (
                idx.filters.eval_where(p.where, cap)
                if not p.where.is_empty() else None
            )
            doc_masks.append(idx.combined_mask(fm))
    if self.sharded_mesh is not None:
        ex = self._fused_executor(coll, idx)
    else:
        ex = getattr(self, "_shared_executor", None)
        if ex is None:
            from ..index.search_exec import SharedBatchExecutor

            ex = self._shared_executor = SharedBatchExecutor()
    col_ver = col.version  # read BEFORE the snapshot (stale-key safety)
    vals_h, present_h = col.dense_values(cap)
    max_k = max(p.limit + p.offset for p in params_list)
    ranked, counts = ex.search_topk_sorted(
        idx.string, plans, [idx.document_count()] * len(plans),
        cap, k=max(max_k, 1),
        sort_vals=vals_h, sort_present=present_h,
        svals_key=("svals", idx.uid, sb.property, col_ver),
        desc=sb.order == "desc",
        exact=bool(getattr(first.mode, "exact", False)),
        doc_masks=doc_masks,
        thresholds=(
            thr_list if any(t is not None for t in thr_list) else None
        ),
        omc=idx.omc_array(), omc_key=(idx.uid, idx.omc_version),
    )
    results: List[SearchResult] = []
    for qi, p in enumerate(params_list):
        page = [
            (d, v) for d, v in ranked[qi]
            if d in idx.doc_user_ids
        ][p.offset: p.offset + p.limit]
        hits = self._hydrate(coll, indexes, page)
        results.append(SearchResult(
            hits=hits, count=int(counts[qi]), count_estimated=False,
        ))
    return results


def _search_batch_index(
    self: "ReadSide",
    coll: CollectionReader,
    idx,
    params_list: List[SearchParams],
    shared_kind: str,
):
    """One index's share of a batched search: returns
    (pairs_per_query, counts) or None when the index has no searchable
    string fields."""
    from ..index.search_exec import SharedBatchExecutor

    first = params_list[0]
    if first.properties is not None:
        props = [
            p for p in first.properties
            if idx.field_types.get(p, "").startswith("string")
        ]
    else:
        props = [p for p, t in idx.field_types.items() if t.startswith("string")]
    if not props:
        return None

    exact = bool(getattr(first.mode, "exact", False))
    tolerance = getattr(first.mode, "tolerance", None)
    parser = idx.parser
    token_lists: List[List[str]] = []
    thresholds: List[float] = []
    token_weight_of: Dict[str, float] = {}
    for p in params_list:
        parsed = parser.tokenize_and_stem(p.mode.term)
        toks: List[str] = []
        for t, variants in parsed:
            toks.append(t)
            if not exact:  # exact matches surface forms only
                toks.extend(variants)
        if not toks:
            toks = [""]
        thresholds.append(
            float(np.floor(len(toks) * p.mode.threshold))
            if p.mode.threshold is not None else 0.0
        )
        # phrase capability: adjacency-bigram shadow tokens with the
        # phrase_boost weight (skipped under an explicit threshold —
        # same rule as _plan_fulltext)
        if p.phrase_boost and p.phrase_boost != 1.0 \
                and p.mode.threshold is None:
            from ..index.string_index import BIGRAM_SEP

            surfaces = [t for t, _ in parsed]
            for a, b in zip(surfaces, surfaces[1:]):
                bg = a + BIGRAM_SEP + b
                toks.append(bg)
                token_weight_of[bg] = float(p.phrase_boost)
        token_lists.append(toks)

    ex = getattr(self, "_shared_executor", None)
    if ex is None:
        ex = self._shared_executor = SharedBatchExecutor()
    max_k = max(p.limit + p.offset for p in params_list)
    cap = idx.cap()
    doc_masks = None
    if any(not p.where.is_empty() for p in params_list) or idx.deleted:
        doc_masks = []
        for p in params_list:
            fm = (
                idx.filters.eval_where(p.where, cap)
                if not p.where.is_empty() else None
            )
            doc_masks.append(idx.combined_mask(fm))
    fp = {
        p_: (float(v.get("weight", 1.0)), float(v.get("b", 0.75)))
        for p_, v in idx.field_params.items()
    } if idx.field_params else None
    # hybrid batch: one embeddings call for all B terms, then the shared
    # BM25 pass + fused vector/fusion/top-k tail
    hybrid_args = {}
    if shared_kind == "hybrid":
        if idx.vector is None:
            return None
        vec_rows = idx.vector.flat_device_rows()
        vec_int8 = None
        if vec_rows is None:
            # IVF-sized index: batched hybrid over the int8 packed layout
            vec_int8 = idx.vector.int8_device_rows()
            if vec_int8 is None:
                return None
        all_targets = self.embeddings.calculate_embeddings(
            [p.mode.term for p in params_list], Intent.QUERY,
            idx.embedding_model,
        )
        if any(len(t) != 1 for t in all_targets):
            return None  # multi-chunk query embeddings: fall back
        from ..ops.vector import l2_normalize

        q = l2_normalize(
            np.stack([np.asarray(t[0], np.float32) for t in all_targets])
        )
        hybrid_args = dict(
            vec_rows=vec_rows,
            vec_rows_int8=vec_int8,
            queries=q,
            similarities=[p.mode.similarity for p in params_list],
            rescale=idx.vector.config.score_rescale,
        )

    # pruned batched fulltext: at the multi-million-doc tier the dense
    # shared pass is scatter-bound (~43M postings/s), so eligible
    # batches ride the two-phase candidate+rescore kernels instead —
    # the SAME executor batch API the per-query path uses, B plans in
    # one dispatch (single-device PrunedPlanMixin or the sharded
    # engine's search_topk_pruned on a mesh)
    want_exact_counts = bool(
        self.config.reader_side.pruned_exact_counts
        or any(getattr(p, "exact_count", False) for p in params_list)
    )
    # hybrid batches are pruned-eligible only at the int8/IVF tier (the
    # flat dense tail is already fast there) and have no exact-count
    # dispatch (the hybrid kernel's counts are estimate-floored)
    hybrid_pruned = (
        shared_kind == "hybrid"
        and hybrid_args
        and hybrid_args.get("vec_rows") is None
        and hybrid_args.get("vec_rows_int8") is not None
        and all(p.mode.threshold is None for p in params_list)
        # the hybrid kernel has no exact-count dispatch: honor an
        # exactCount request with the dense tail instead
        and not want_exact_counts
    )
    # one mask shared by EVERY query in the batch (identity check — the
    # cached tombstone alive-mask is the common case at scale: deletes
    # without where-filters) still rides the pruned kernels
    # single-device; per-query where-masks keep the dense path
    shared_mask = None
    if doc_masks is not None:
        m0 = doc_masks[0]
        if m0 is not None and all(m is m0 for m in doc_masks):
            shared_mask = m0
    shared_mask_key = (
        self._mask_cache_key(idx, first) if shared_mask is not None
        else None
    )
    if (
        (shared_kind == "fulltext" or hybrid_pruned)
        and (doc_masks is None or shared_mask is not None)
        and max_k <= 512
        and self._pruned_eligible(
            idx, shared_mask, max_k, mode=first.mode, params=first,
            exact_counts=want_exact_counts and not hybrid_pruned,
            mesh_ok=True,
        )
        and (hybrid_pruned or want_exact_counts
             or all(p.mode.threshold is None for p in params_list))
    ):
        small_shared = (
            shared_mask is not None
            and int(np.count_nonzero(shared_mask))
            <= PrunedPlanMixin.PRUNED_CANDIDATES
        )
        mask_kw = {}
        if shared_mask is not None:
            mask_kw = dict(mask=shared_mask, mask_key=shared_mask_key)
        plans = []
        thr_list: List[Optional[float]] = []
        for p in params_list:
            planned = self._plan_fulltext(idx, p.mode, p, with_prefix=True)
            if planned is None:
                plans = None
                break
            p_tokens, plan = planned
            if plan.starts.shape[1] > PRUNED_MAX_RANGES:
                # a fuzzy token exploded past the variant-range budget:
                # the whole batch keeps the dense shared path
                plans = None
                break
            plans.append(plan)
            thr_list.append(
                float(np.floor(len(p_tokens) * p.mode.threshold))
                if p.mode.threshold is not None else None
            )
        if plans and hybrid_pruned:
            # batched pruned HYBRID: B with-prefix plans through the
            # candidate-union kernel (ops/pruned.py
            # pruned_hybrid_topk_int8), one dispatch on one chip or the
            # mesh — the batch analog of the per-query int8 branch in
            # _hybrid_fused
            n_list = [idx.document_count()] * len(plans)
            if self.sharded_mesh is not None:
                pex = self._fused_executor(coll, idx)
                out = pex.search_topk_hybrid_int8_pruned(
                    idx.string, plans, n_list, cap, max(max_k, 1),
                    idx.vector, hybrid_args["queries"],
                    hybrid_args["similarities"], exact=exact,
                    omc=idx.omc_array(),
                    omc_key=(idx.uid, idx.omc_version),
                    rescale=hybrid_args["rescale"],
                    **mask_kw,
                )
            else:
                from ..ops.bm25 import round_up_pow2

                pex = coll.executor(idx.index_id)
                out = pex.search_topk_hybrid_int8_pruned(
                    idx.string, plans, n_list, cap, max(max_k, 1),
                    hybrid_args["vec_rows_int8"],
                    idx.vector.int8_doc2row(round_up_pow2(cap, 128)),
                    hybrid_args["queries"],
                    hybrid_args["similarities"], exact=exact,
                    omc=idx.omc_array(),
                    omc_key=(idx.uid, idx.omc_version),
                    rescale=hybrid_args["rescale"],
                    **mask_kw,
                )
            if out is not None:
                vals, ids, counts = out
                pairs_per_query = [
                    [
                        (int(d), float(v))
                        for v, d in zip(vals[qi], ids[qi])
                        if v > 0 and int(d) in idx.doc_user_ids
                    ]
                    for qi in range(len(params_list))
                ]
                return pairs_per_query, counts, not small_shared
        elif plans:
            if self.sharded_mesh is not None:
                pex = self._fused_executor(coll, idx)
            else:
                pex = coll.executor(idx.index_id)
            out = pex.search_topk_pruned(
                idx.string, plans,
                [idx.document_count()] * len(plans),
                cap, k=max(max_k, 1), exact=exact,
                thresholds=(
                    thr_list if any(t is not None for t in thr_list)
                    else None
                ),
                omc=idx.omc_array(), omc_key=(idx.uid, idx.omc_version),
                exact_counts=want_exact_counts,
                **mask_kw,
            )
            vals, ids, counts = out
            pairs_per_query = [
                [
                    (int(d), float(v))
                    for v, d in zip(vals[qi], ids[qi])
                    if v > 0 and int(d) in idx.doc_user_ids
                ]
                for qi in range(len(params_list))
            ]
            return pairs_per_query, counts, (
                not want_exact_counts and not small_shared
            )

    # OMC multipliers apply on-device before top-k (ADVICE r1: applying
    # them to the post-top-k candidate set can drop boosted docs)
    out = None
    if self.sharded_mesh is not None:
        # the batched API rides the mesh (VERDICT r2 weak #2): shared
        # term-dedup scoring per doc shard with psum'd global df, one
        # finalize + all_gather top-k merge; hybrid tails shard the flat
        # OR int8/IVF vector layouts (ensure_vectors_int8)
        sharded = getattr(self, "_shared_executor_sharded", None)
        if sharded is None:
            from ..parallel.engine import ShardedBatchExec

            sharded = self._shared_executor_sharded = ShardedBatchExec(
                self.sharded_mesh
            )
        out = sharded.search_topk_shared(
            idx.string, token_lists, props, first.boost,
            idx.document_count(), cap, max(max_k, 1),
            thresholds=thresholds,
            exact=exact,
            tolerance=tolerance,
            impact_cap=self.config.reader_side.impact_cap,
            doc_masks=doc_masks,
            field_params=fp,
            omc=idx.omc_array(),
            omc_key=(idx.uid, idx.omc_version),
            token_weight_of=token_weight_of or None,
            vector_index=idx.vector if shared_kind == "hybrid" else None,
            queries=hybrid_args.get("queries"),
            similarities=hybrid_args.get("similarities"),
            rescale=hybrid_args.get("rescale"),
        )
    if out is None:
        out = ex.search_topk_shared(
            idx.string, token_lists, props, first.boost,
            idx.document_count(), cap, max(max_k, 1),
            thresholds=thresholds,
            exact=exact,
            tolerance=tolerance,
            impact_cap=self.config.reader_side.impact_cap,
            doc_masks=doc_masks,
            field_params=fp,
            omc=idx.omc_array(),
            omc_key=(idx.uid, idx.omc_version),
            token_weight_of=token_weight_of or None,
            **hybrid_args,
        )
    vals, ids, counts = out
    pairs_per_query: List[List[Tuple[int, float]]] = []
    for qi in range(len(params_list)):
        pairs_per_query.append([
            (int(d), float(v))
            for v, d in zip(vals[qi], ids[qi])
            if v > 0 and int(d) in idx.doc_user_ids
        ])
    # exact match counts from the device (not capped at top-k)
    return pairs_per_query, counts, False


ReadSide.search_batch = _search_batch
