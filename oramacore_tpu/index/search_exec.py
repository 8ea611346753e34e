"""Executor: runs BM25F query plans on the device with shape bucketing.

Pads (B, T, NR, LR, cap) to pow-2 buckets so XLA compiles each shape
once; caches the device-resident postings slab per index generation.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.bm25 import bm25_score_batch, round_up_pow2
from .string_index import QueryPlan, StringIndex

# vector-candidate budget per query for the fused int8 hybrid tail: a
# fixed quality knob (like nprobe), deliberately NOT derived from the
# page size so the per-query and batched paths retrieve identical
# candidate sets (reference bounds its vector side by `limit`;
# EmbeddingStorage.search semantics)
HYBRID_INT8_CANDIDATES = 256

_MISS = object()


class DeviceLru:
    """Bounded keyed LRU for device-resident arrays, safe under the
    read-concurrent search path (searches share a read lock, so cache
    mutations race without this lock). `group` maps a key to a
    stale-group id: inserting a key purges other keys of the same group
    first (stale generations of one index can never be queried again)."""

    def __init__(self, maxsize: int, group=None):
        import threading
        from collections import OrderedDict

        self._d: "OrderedDict" = OrderedDict()
        self._lock = threading.Lock()
        self.maxsize = maxsize
        self._group = group

    def get(self, key):
        """Cached value, or the module-level _MISS sentinel."""
        with self._lock:
            if key in self._d:
                self._d.move_to_end(key)
                return self._d[key]
            return _MISS

    def put(self, key, value):
        with self._lock:
            if self._group is not None:
                g = self._group(key)
                for k in [
                    k for k in self._d
                    if k != key and self._group(k) == g
                ]:
                    del self._d[k]
            self._d[key] = value
            while len(self._d) > self.maxsize:
                self._d.popitem(last=False)
        return value


class StringSearchExecutor:
    """Caches device slabs and executes batched BM25F scoring."""

    # bounded multi-slot device caches: ONE executor can serve several
    # indexes (the shared batched executor, multi-index collections), so
    # single-slot caches would thrash a full O(corpus) re-upload per
    # index per batch
    MAX_CACHED_SLABS = 4

    def __init__(self):
        import threading

        # one thread uploads a missing slab; concurrent searches on the
        # same fresh generation wait instead of duplicating full-corpus
        # H2D through the tunnel
        self._build_lock = threading.Lock()
        self._slabs = DeviceLru(
            self.MAX_CACHED_SLABS, group=lambda k: k[0]
        )  # (uid, gen) -> device slab
        # committed-portion device cache: stable between commits, so a
        # live-layer generation bump uploads only the live rows and
        # device-concatenates (O(live) H2D instead of re-uploading the
        # whole slab through the tunnel — VERDICT r2 weak #5)
        self._comms = DeviceLru(
            self.MAX_CACHED_SLABS, group=lambda k: k[0]
        )  # (uid, committed_key) -> arrays

    def _get_device_slab(self, index: StringIndex):
        # key the HBM cache on (index uid, slab generation) — generation
        # alone collides across different StringIndex objects (executors
        # can be shared across indexes/collections), and id(numpy array)
        # can be recycled after free (stale-slab scoring bug)
        comm, live, ck = index.slab_split()
        gen = (index.uid, index.generation)  # read AFTER slab build
        cached = self._slabs.get(gen)
        if cached is not _MISS:
            return cached
        from ..ops.bm25 import MAX_RANGE_LEN

        self._build_lock.acquire()
        try:
            cached = self._slabs.get(gen)
            if cached is not _MISS:
                return cached
            ckey = (index.uid, ck)
            comm_dev = self._comms.get(ckey)
            if comm_dev is _MISS:
                comm_dev = (
                    tuple(jnp.asarray(a) for a in comm)
                    if comm is not None else None
                )
                self._comms.put(ckey, comm_dev)
            pads = (
                np.zeros(MAX_RANGE_LEN, np.int32),
                np.zeros(MAX_RANGE_LEN, np.float32),
                np.zeros(MAX_RANGE_LEN, np.float32),
                np.zeros(MAX_RANGE_LEN, np.float32),
            )
            out = []
            for i in range(4):
                parts = []
                if comm_dev is not None:
                    parts.append(comm_dev[i])
                if live is not None:
                    parts.append(jnp.asarray(live[i]))
                parts.append(jnp.asarray(pads[i]))
                out.append(
                    parts[0] if len(parts) == 1 else jnp.concatenate(parts)
                )
            return self._slabs.put(gen, tuple(out))
        finally:
            self._build_lock.release()

    def score(
        self,
        index: StringIndex,
        plans: Sequence[QueryPlan],
        n_docs: Sequence[float],
        cap: int,
        exact: bool = False,
        doc_masks: Optional[Sequence[Optional[np.ndarray]]] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Score B queries; returns (scores f32[B, cap], matched f32[B, cap])
        as numpy arrays."""
        p_doc, p_tf, p_etf, p_flen = self._get_device_slab(index)

        B = len(plans)
        Bb = round_up_pow2(B, 1)
        T = max(p.starts.shape[0] for p in plans)
        Tb = round_up_pow2(T, 1)
        NR = max(p.starts.shape[1] for p in plans)
        NRb = round_up_pow2(NR, 1)
        LR = max(p.max_range_len for p in plans)
        LRb = round_up_pow2(LR, 8)
        capb = round_up_pow2(cap, 128)

        starts = np.zeros((Bb, Tb, NRb), np.int32)
        lens = np.zeros((Bb, Tb, NRb), np.int32)
        weights = np.zeros((Bb, Tb, NRb), np.float32)
        field_b = np.full((Bb, Tb, NRb), 0.75, np.float32)
        avg_flen = np.ones((Bb, Tb, NRb), np.float32)
        nd = np.ones((Bb,), np.float32)
        masks = np.ones((Bb, capb), bool)
        for i, p in enumerate(plans):
            t, r = p.starts.shape
            starts[i, :t, :r] = p.starts
            lens[i, :t, :r] = p.lens
            weights[i, :t, :r] = p.weights
            field_b[i, :t, :r] = p.field_b
            avg_flen[i, :t, :r] = p.avg_flen
            nd[i] = max(float(n_docs[i]), 1.0)
            if doc_masks is not None and doc_masks[i] is not None:
                m = doc_masks[i]
                masks[i, : len(m)] = m
                masks[i, len(m):] = False

        scores, matched = bm25_score_batch(
            p_doc, p_tf, p_etf, p_flen,
            jnp.asarray(starts), jnp.asarray(lens), jnp.asarray(weights),
            jnp.asarray(field_b), jnp.asarray(avg_flen), jnp.asarray(nd),
            jnp.asarray(masks),
            lr=LRb, exact=exact, cap=capb,
        )
        return np.asarray(scores[:B, :cap]), np.asarray(matched[:B, :cap])


# ---------------------------------------------------------------------------
# Host reference scorer (numpy) — parity oracle for the TPU path.
# Mirrors the reference algorithm literally (bm25.rs + token_score.rs).
# ---------------------------------------------------------------------------

def host_bm25_reference(
    index: StringIndex,
    tokens: Sequence[str],
    properties: Sequence[str],
    boost: Dict[str, float],
    n_docs: float,
    threshold: Optional[float] = None,
    exact: bool = False,
    tolerance: Optional[int] = None,
    k1: float = 1.2,
    doc_mask: Optional[np.ndarray] = None,
) -> Dict[int, float]:
    p_doc, p_tf, p_etf, p_flen = index.slab()
    scores: Dict[int, float] = {}
    masks: Dict[int, int] = {}

    for term_index, token in enumerate(tokens):
        # collect contributions across fields
        contribs: Dict[int, float] = {}
        for path in properties:
            stats = index.field_stats(path)
            if stats.doc_count == 0:
                continue
            w = boost.get(path, 1.0)
            avg = stats.avg_len or 1.0
            tol = 0 if exact else tolerance
            for (start, length) in index._match_terms(path, token, tol):
                for p in range(start, start + length):
                    tf = float(p_etf[p] if exact else p_tf[p])
                    if tf <= 0:
                        continue
                    if doc_mask is not None and not doc_mask[int(p_doc[p])]:
                        continue
                    flen = float(p_flen[p])
                    ntf = tf / (1.0 - 0.75 + 0.75 * flen / avg)
                    d = int(p_doc[p])
                    contribs[d] = contribs.get(d, 0.0) + w * ntf
        if not contribs:
            continue
        df = max(len(contribs), 1)
        idf = float(np.log1p((n_docs - df + 0.5) / (df + 0.5)))
        for d, s in contribs.items():
            term_score = idf * (k1 + 1.0) * s / (k1 + s)
            scores[d] = scores.get(d, 0.0) + term_score
            masks[d] = masks.get(d, 0) | (1 << term_index)

    if threshold is not None:
        thr = int(np.floor(len(tokens) * threshold))
        scores = {
            d: s
            for d, s in scores.items()
            if bin(masks.get(d, 0)).count("1") >= thr
        }
    return scores


class _PlanBatch:
    """Padded descriptor arrays for a batch of plans (host side)."""

    __slots__ = ("starts", "lens", "weights", "field_b", "avg_flen", "nd",
                 "masks", "LRb", "capb", "B", "ch_idx", "ch_w", "has_champ")

    def __init__(self, plans, n_docs, cap, doc_masks=None):
        from ..ops.bm25 import round_up_pow2

        B = len(plans)
        Bb = round_up_pow2(B, 1)
        T = max(p.starts.shape[0] for p in plans)
        Tb = round_up_pow2(T, 1)
        NR = max(p.starts.shape[1] for p in plans)
        NRb = round_up_pow2(NR, 1)
        LR = max(p.max_range_len for p in plans)
        self.LRb = round_up_pow2(LR, 8)
        self.capb = round_up_pow2(cap, 128)
        self.B = B
        self.starts = np.zeros((Bb, Tb, NRb), np.int32)
        self.lens = np.zeros((Bb, Tb, NRb), np.int32)
        self.weights = np.zeros((Bb, Tb, NRb), np.float32)
        self.field_b = np.full((Bb, Tb, NRb), 0.75, np.float32)
        self.avg_flen = np.ones((Bb, Tb, NRb), np.float32)
        self.nd = np.ones((Bb,), np.float32)
        self.masks = np.ones((Bb, self.capb), bool)
        # champion slots (heavy-term dense rows)
        self.has_champ = any(p.champ_idx is not None for p in plans)
        if self.has_champ:
            NC = max(
                p.champ_idx.shape[1] for p in plans
                if p.champ_idx is not None
            )
            NCb = round_up_pow2(NC, 1)
            self.ch_idx = np.full((Bb, Tb, NCb), -1, np.int32)
            self.ch_w = np.zeros((Bb, Tb, NCb), np.float32)
        else:
            self.ch_idx = self.ch_w = None
        for i, p in enumerate(plans):
            t, r = p.starts.shape
            self.starts[i, :t, :r] = p.starts
            self.lens[i, :t, :r] = p.lens
            self.weights[i, :t, :r] = p.weights
            self.field_b[i, :t, :r] = p.field_b
            self.avg_flen[i, :t, :r] = p.avg_flen
            self.nd[i] = max(float(n_docs[i]), 1.0)
            if self.has_champ and p.champ_idx is not None:
                tc, nc = p.champ_idx.shape
                self.ch_idx[i, :tc, :nc] = p.champ_idx
                self.ch_w[i, :tc, :nc] = p.champ_w
            if doc_masks is not None and doc_masks[i] is not None:
                m = doc_masks[i]
                self.masks[i, : len(m)] = m
                self.masks[i, len(m):] = False


class StringSearchTopK(StringSearchExecutor):
    """Fused path: scoring + threshold + OMC + top-k in ONE device call;
    only (B, k) values/ids transfer back."""

    @staticmethod
    def _omc_group(key):
        # omc_key is (index uid, omc version): stale versions of the
        # same index can never be requested again
        omc_key, _capb = key
        if isinstance(omc_key, tuple) and len(omc_key) == 2:
            return ("omc", omc_key[0])
        return ("omc", omc_key)

    def __init__(self):
        super().__init__()
        # device-resident OMC multipliers, keyed on (version, capb) so the
        # f32[cap] array doesn't cross the tunnel on every query; bounded
        # multi-slot (the shared batched executor serves many indexes)
        self._omc_dev = DeviceLru(
            2 * self.MAX_CACHED_SLABS, group=self._omc_group
        )
        # device-resident champion matrices, keyed on (uid, gen, capb)
        self._champ_dev = DeviceLru(
            self.MAX_CACHED_SLABS, group=lambda k: k[0]
        )
        # device-resident filter masks AND sort columns, keyed by the
        # caller (tombstone alive-masks are stable between deletes, sort
        # columns between column mutations — neither should cross the
        # tunnel per query; ad-hoc where-filters pass mask_key=None and
        # upload each time, like the dense path's doc_masks). Keys are
        # (caller_key_tuple, capb); the GROUP strips the trailing
        # version component so a put purges the stale version instead of
        # letting 40MB-at-10M arrays linger until LRU eviction.
        self._fmask_dev = DeviceLru(
            2 * self.MAX_CACHED_SLABS,
            group=lambda k: (
                k[0][:-1] if isinstance(k[0], tuple) else k[0]
            ),
        )

    def _get_device_champs(self, index: StringIndex, capb: int):
        key = (index.uid, index.generation, capb)
        cached = self._champ_dev.get(key)
        if cached is not _MISS:
            return cached
        mat = index._champ_matrix
        if mat is None:
            return None
        padded = np.zeros((mat.shape[0], capb), np.float32)
        padded[:, : min(mat.shape[1], capb)] = mat[:, :capb]
        return self._champ_dev.put(key, jnp.asarray(padded))

    def _get_device_omc(self, omc: np.ndarray, omc_key: Optional[int], capb: int):
        key = (omc_key, capb) if omc_key is not None else None
        if key is not None:
            cached = self._omc_dev.get(key)
            if cached is not _MISS:
                return cached
        arr = np.ones((capb,), np.float32)
        arr[: min(len(omc), capb)] = omc[:capb]
        dev = jnp.asarray(arr)
        if key is not None:
            self._omc_dev.put(key, dev)
        return dev

    def _get_device_fmask(self, mask: np.ndarray, mask_key, capb: int):
        """Filter mask as f32[capb] on device (1.0 = doc allowed; the
        padding beyond cap stays 0 so padded doc ids never match)."""
        key = (mask_key, capb) if mask_key is not None else None
        if key is not None:
            cached = self._fmask_dev.get(key)
            if cached is not _MISS:
                return cached
        arr = np.zeros((capb,), np.float32)
        n = min(len(mask), capb)
        arr[:n] = mask[:n]
        dev = jnp.asarray(arr)
        if key is not None:
            self._fmask_dev.put(key, dev)
        return dev

    def search_topk(
        self,
        index: StringIndex,
        plans: Sequence[QueryPlan],
        n_docs: Sequence[float],
        cap: int,
        k: int,
        exact: bool = False,
        doc_masks: Optional[Sequence[Optional[np.ndarray]]] = None,
        thresholds: Optional[Sequence[float]] = None,  # distinct-token counts
        omc: Optional[np.ndarray] = None,              # f32[<=cap]
        omc_key: Optional[int] = None,                 # cache key (version)
        with_bitmap: bool = False,                     # + packed match bits
    ) -> Tuple[np.ndarray, ...]:
        from ..ops.bm25 import bm25_search_topk_packed, round_up_pow2

        p_doc, p_tf, p_etf, p_flen = self._get_device_slab(index)
        pb = _PlanBatch(plans, n_docs, cap, doc_masks)
        Bb = pb.starts.shape[0]
        # pack descriptors to minimize H2D round-trips (tunnel latency)
        idesc = np.stack([pb.starts, pb.lens])
        fdesc = np.stack([pb.weights, pb.field_b, pb.avg_flen])
        scalars = np.stack([pb.nd, np.zeros((Bb,), np.float32)])
        if thresholds is not None:
            for i, t in enumerate(thresholds):
                scalars[1, i] = t or 0.0
        has_mask = doc_masks is not None and any(
            m is not None for m in doc_masks
        )
        has_omc = omc is not None
        mask_arr = pb.masks if has_mask else np.zeros((1, 1), bool)
        if has_omc:
            omc_arr = self._get_device_omc(omc, omc_key, pb.capb)
        else:
            omc_arr = jnp.ones((1,), jnp.float32)
        kb = min(round_up_pow2(k, 8), pb.capb)
        champs_dev = (
            self._get_device_champs(index, pb.capb) if pb.has_champ else None
        )
        has_champ = champs_dev is not None
        out = bm25_search_topk_packed(
            p_doc, p_tf, p_etf, p_flen,
            jnp.asarray(idesc), jnp.asarray(fdesc), jnp.asarray(scalars),
            jnp.asarray(mask_arr), omc_arr,
            champs_dev,
            jnp.asarray(pb.ch_idx) if has_champ else None,
            jnp.asarray(pb.ch_w) if has_champ else None,
            lr=pb.LRb, exact=exact, cap=pb.capb, k=kb,
            has_mask=has_mask, has_omc=has_omc, has_champ=has_champ,
            with_bitmap=with_bitmap,
        )
        vals, idx, counts = out[:3]
        res = (
            np.asarray(vals[: pb.B, :k]),
            np.asarray(idx[: pb.B, :k]),
            np.asarray(counts[: pb.B]),
        )
        if with_bitmap:
            # packed match set: unpack host-side to bool[cap] per query
            bits = np.asarray(out[3][: pb.B])
            masks = np.unpackbits(bits, axis=1)[:, :cap].astype(bool)
            return res + (masks,)
        return res

    def _get_device_svals(self, vals: np.ndarray, present: np.ndarray,
                          svals_key, capb: int):
        """Sort column as f32[capb] on device, NaN where the doc lacks
        the field (and in the padding). Cached by the caller's version
        key so the column crosses the tunnel once per mutation."""
        key = (svals_key, capb) if svals_key is not None else None
        if key is not None:
            cached = self._fmask_dev.get(key)
            if cached is not _MISS:
                return cached
        arr = np.full((capb,), np.nan, np.float32)
        n = min(len(vals), capb)
        arr[:n] = vals[:n].astype(np.float32)
        arr[:n][~present[:n]] = np.nan
        dev = jnp.asarray(arr)
        if key is not None:
            dev = self._fmask_dev.put(key, dev)
        return dev

    def search_topk_sorted(
        self,
        index: StringIndex,
        plans: Sequence[QueryPlan],
        n_docs: Sequence[float],
        cap: int,
        k: int,
        sort_vals: np.ndarray,      # f64[cap] column values
        sort_present: np.ndarray,   # bool[cap]
        svals_key,                  # device-cache key (None = no cache)
        desc: bool,
        exact: bool = False,
        doc_masks: Optional[Sequence[Optional[np.ndarray]]] = None,
        thresholds: Optional[Sequence[float]] = None,
        omc: Optional[np.ndarray] = None,
        omc_key: Optional[int] = None,
    ) -> Tuple[List[List[Tuple[int, float]]], np.ndarray]:
        """Fused sort-by search (ops/bm25.py bm25_search_sorted_packed):
        per query, a ranked [(doc, score)] list in sort-field order —
        with-field matches by (value, doc) then fieldless matches by
        doc — plus exact match counts. Only 2*(B, k) pages cross the
        device boundary instead of a dense score vector."""
        from ..ops.bm25 import (
            NEG_F32,
            bm25_search_sorted_packed,
            round_up_pow2,
        )

        p_doc, p_tf, p_etf, p_flen = self._get_device_slab(index)
        pb = _PlanBatch(plans, n_docs, cap, doc_masks)
        idesc = np.stack([pb.starts, pb.lens])
        fdesc = np.stack([pb.weights, pb.field_b, pb.avg_flen])
        scalars = np.stack([pb.nd, np.zeros((pb.starts.shape[0],),
                                            np.float32)])
        if thresholds is not None:
            for i, t in enumerate(thresholds):
                scalars[1, i] = t or 0.0
        has_mask = doc_masks is not None and any(
            m is not None for m in doc_masks
        )
        has_omc = omc is not None
        mask_arr = pb.masks if has_mask else np.zeros((1, 1), bool)
        omc_arr = (
            self._get_device_omc(omc, omc_key, pb.capb)
            if has_omc else jnp.ones((1,), jnp.float32)
        )
        svals_dev = self._get_device_svals(
            sort_vals, sort_present, svals_key, pb.capb
        )
        kb = min(round_up_pow2(k, 8), pb.capb)
        docs1, vals1, sc1, docs2, ok2, sc2, counts = (
            bm25_search_sorted_packed(
                p_doc, p_tf, p_etf, p_flen,
                jnp.asarray(idesc), jnp.asarray(fdesc),
                jnp.asarray(scalars),
                jnp.asarray(mask_arr), omc_arr, svals_dev,
                lr=pb.LRb, exact=exact, cap=pb.capb, k=kb,
                has_mask=has_mask, has_omc=has_omc, desc=desc,
            )
        )
        docs1 = np.asarray(docs1[: pb.B])
        ok1 = np.asarray(vals1[: pb.B]) > NEG_F32 / 2
        sc1 = np.asarray(sc1[: pb.B])
        docs2 = np.asarray(docs2[: pb.B])
        ok2 = np.asarray(ok2[: pb.B])
        sc2 = np.asarray(sc2[: pb.B])
        ranked: List[List[Tuple[int, float]]] = []
        for b in range(pb.B):
            row = [
                (int(d), float(v))
                for d, v in zip(docs1[b][ok1[b]], sc1[b][ok1[b]])
            ]
            row += [
                (int(d), float(v))
                for d, v in zip(docs2[b][ok2[b]], sc2[b][ok2[b]])
            ]
            ranked.append(row[:k])
        return ranked, np.asarray(counts[: pb.B])

    def _get_device_gid(self, ids: np.ndarray, gid_key, capb: int):
        """Group-id column as int32[capb] on device (-1 = doc lacks the
        field, incl. the padding). Cached by the caller's version key."""
        key = (gid_key, capb) if gid_key is not None else None
        if key is not None:
            cached = self._fmask_dev.get(key)
            if cached is not _MISS:
                return cached
        arr = np.full((capb,), -1, np.int32)
        n = min(len(ids), capb)
        arr[:n] = ids[:n]
        dev = jnp.asarray(arr)
        if key is not None:
            dev = self._fmask_dev.put(key, dev)
        return dev

    def search_topk_grouped(
        self,
        index: StringIndex,
        plans: Sequence[QueryPlan],
        n_docs: Sequence[float],
        cap: int,
        k: int,
        gid_col: np.ndarray,        # int32[cap] group ids (-1 = none)
        gid_key,                    # device-cache key (None = no cache)
        n_groups: int,
        max_results: int,
        exact: bool = False,
        doc_masks: Optional[Sequence[Optional[np.ndarray]]] = None,
        thresholds: Optional[Sequence[float]] = None,
        omc: Optional[np.ndarray] = None,
        omc_key: Optional[int] = None,
    ):
        """Fused GROUP-BY search (ops/bm25.py
        bm25_search_grouped_packed): per query, the main top-k page,
        the exact match count, and per-group top-`max_results`
        [(doc, score)] pages — one dispatch, no dense score dict, no
        host walk of per-doc group values (reference group.rs builds
        per-combo doc lists on CPU). Returns
        (vals, ids, counts, group_pages) with group_pages[b][g] a
        ranked list for group id g < n_groups."""
        from ..ops.bm25 import bm25_search_grouped_packed, round_up_pow2

        p_doc, p_tf, p_etf, p_flen = self._get_device_slab(index)
        pb = _PlanBatch(plans, n_docs, cap, doc_masks)
        Bb = pb.starts.shape[0]
        idesc = np.stack([pb.starts, pb.lens])
        fdesc = np.stack([pb.weights, pb.field_b, pb.avg_flen])
        scalars = np.stack([pb.nd, np.zeros((Bb,), np.float32)])
        if thresholds is not None:
            for i, t in enumerate(thresholds):
                scalars[1, i] = t or 0.0
        has_mask = doc_masks is not None and any(
            m is not None for m in doc_masks
        )
        has_omc = omc is not None
        mask_arr = pb.masks if has_mask else np.zeros((1, 1), bool)
        omc_arr = (
            self._get_device_omc(omc, omc_key, pb.capb)
            if has_omc else jnp.ones((1,), jnp.float32)
        )
        gid_dev = self._get_device_gid(gid_col, gid_key, pb.capb)
        kb = min(round_up_pow2(k, 8), pb.capb)
        Gb = round_up_pow2(max(n_groups, 1), 8)
        Rb = min(round_up_pow2(max_results, 8), pb.capb)
        vals, ids, counts, gvals, gdocs = bm25_search_grouped_packed(
            p_doc, p_tf, p_etf, p_flen,
            jnp.asarray(idesc), jnp.asarray(fdesc), jnp.asarray(scalars),
            jnp.asarray(mask_arr), omc_arr, gid_dev,
            lr=pb.LRb, exact=exact, cap=pb.capb, k=kb, R=Rb, G=Gb,
            has_mask=has_mask, has_omc=has_omc,
        )
        gvals = np.asarray(gvals[: pb.B, :n_groups])
        gdocs = np.asarray(gdocs[: pb.B, :n_groups])
        group_pages = [
            [
                [
                    (int(d), float(v))
                    for d, v in zip(gdocs[b, g], gvals[b, g])
                    if np.isfinite(v)
                ][:max_results]
                for g in range(n_groups)
            ]
            for b in range(pb.B)
        ]
        return (
            np.asarray(vals[: pb.B, :k]),
            np.asarray(ids[: pb.B, :k]),
            np.asarray(counts[: pb.B]),
            group_pages,
        )


class PrunedPlanMixin(StringSearchTopK):
    """Shared helpers for the pruned (candidate + exact rescore) path:
    prefix descriptors are derived from the SAME plans as the dense path
    (commit stores every range impact-ordered, string_index._pack_segment,
    so each range's first `lp` postings ARE its top-impact prefix)."""

    # nomination clip for plans built WITHOUT with_prefix (a fallback
    # path — eligible pruned searches always carry with_prefix plans
    # whose prefix ranges come from the commit-time blocks, depth
    # string_index.PREFIX_LEN = 65536 since r5)
    PRUNED_PREFIX = 8192
    PRUNED_CANDIDATES = 1024
    # multi-valued device facets: max DISTINCT values one doc may hold
    # (pair-table probes per hist chunk scale with it); columns above
    # the bound keep the host facet flows
    PRUNED_FACET_MULTI_MAX = 8
    PRUNED_LCH = 32768   # rescore worklist chunk length
    PRUNED_WCH = 128     # worklist entries per scan step
    # exact-counts batch slice: the kernel's global sort is superlinear
    # in flat length (39.6 ms @B=8 vs 12.4 s @B=64 on TPU v5e,
    # benches/RESULTS.md round-4 session 1) — dispatch <= 8 queries at
    # a time and the B=64 batch costs ~8 x 40 ms instead of 12.4 s
    PRUNED_COUNTS_SLICE = 8
    # v4 batched dispatch chunk: accum1024 measured 106 QPS @B=64 vs
    # 72 @B=256 (RESULTS.md round-4 session 2) — larger bs batches are
    # dispatched as B=64 chunks (v3 shapes are NOT split; their
    # pathology is the inverse)
    PRUNED_BS_BATCH = 64
    # ...but the real limit is the NOMINATOR SORT WIDTH, not B: at
    # lp=65536 the (256, 196608) sort regressed (75 vs 110 QPS @B=64 =
    # 12.6M elements) while at the engine-default lp=8192 the (256,
    # 24576) shape was the FASTEST measured (522 vs 427 QPS @B=64 —
    # zipf arm, RESULTS.md round-4 session 5). Chunks grow past
    # PRUNED_BS_BATCH while chunk * T * NPR * lp stays within this
    # budget (16M ~= the largest measured-good width).
    PRUNED_BS_SORT_BUDGET = 16 * 1024 * 1024
    # v4 binary-search rescore (ops/pruned.py pruned_*_bs): eligible
    # searches (single-span tokens, non-exact tf, unfiltered) rescore
    # candidates with per-candidate binary searches into unsplit
    # doc-sorted ranges — O(C log len) instead of O(postings). Knobs:
    PRUNED_BS = True          # dispatch eligible searches to v4
    PRUNED_BS_ACCUM = True    # nominate via accumulated partial scores
    PRUNED_BS_HP = 2048       # head slice per prefix range (slice mode)
    PRUNED_BS_C = 1024        # candidate budget (accum mode)
    PRUNED_BS_BUCKETS = 1024  # rescore bucket-index resolution

    @classmethod
    def _pruned_host_inputs(cls, plans, n_docs, thresholds):
        """Host arrays for the pruned kernels:
        (pre_idesc, pre_fdesc, wl_i, wl_f, idf, nd, thr, dfs, lp, T).

        The rescore WORKLIST packs only REAL (query, token, chunk) work
        (ops/pruned.py _rescore_worklist); the nomination prefixes come
        from the plans' impact-prefix ranges (side blocks built at
        commit) with a clipped-main-range fallback for plans built
        without `with_prefix`."""
        B = len(plans)
        Bb = round_up_pow2(B, 1)
        T = max(p.starts.shape[0] for p in plans)
        Tb = round_up_pow2(T, 1)
        # small-corpus clamp (r5 mesh compile audit): the worklist
        # chunk width drives the compiled kernel's inner shapes — a
        # 16-doc dryrun corpus otherwise compiles 32768-wide chunk ops
        # (13.7 s token_scores span, all compile). Pow2 ladder keeps
        # the shape-key census logarithmic; the 10M tier still lands
        # on PRUNED_LCH.
        max_rl = max(
            (int(p.lens.max()) if p.lens.size else 1) for p in plans
        )
        lch = min(cls.PRUNED_LCH, round_up_pow2(max_rl, 128))

        # --- nomination prefixes -----------------------------------------
        def pre_of(p):
            if p.pre_starts is not None:
                return (p.pre_starts, p.pre_lens, p.pre_weights,
                        p.pre_field_b, p.pre_avg)
            return (p.starts, np.minimum(p.lens, cls.PRUNED_PREFIX),
                    p.weights, p.field_b, p.avg_flen)

        NPR = max(1, max(pre_of(p)[0].shape[1] for p in plans))
        NPRb = round_up_pow2(NPR, 1)
        pre_st = np.zeros((Bb, Tb, NPRb), np.int32)
        pre_ln = np.zeros((Bb, Tb, NPRb), np.int32)
        pre_w = np.zeros((Bb, Tb, NPRb), np.float32)
        pre_fb = np.full((Bb, Tb, NPRb), 0.75, np.float32)
        pre_av = np.ones((Bb, Tb, NPRb), np.float32)
        lp = 8
        nd = np.ones((Bb,), np.float32)
        dfs = np.zeros((Bb, Tb), np.float64)
        # --- rescore worklist --------------------------------------------
        wl = []        # (b, t, start, len, w, fb, av)
        wl_earlier = []  # per entry: [(span_start, span_len), ...] of
        #                  EARLIER FIELDS of the same token (union df)
        max_span = 0
        for i, p in enumerate(plans):
            nd[i] = max(float(n_docs[i]), 1.0)
            ps, pl, pw, pf, pa = pre_of(p)
            t_, r_ = ps.shape
            pre_st[i, :t_, :r_] = ps
            pre_ln[i, :t_, :r_] = pl
            pre_w[i, :t_, :r_] = pw
            pre_fb[i, :t_, :r_] = pf
            pre_av[i, :t_, :r_] = pa
            if pl.size:
                lp = max(lp, int(pl.max()))
            t_n, r_n = p.starts.shape
            for t in range(t_n):
                # earlier spans of the SAME TOKEN (any field or
                # tolerance-variant term) except the range's own
                # (field, term) — doc-disjoint by construction — so the
                # device df subtraction dedups across fields AND fuzzy
                # variants (exact union df)
                spans_t = (p.spans[t] if p.spans is not None
                           and t < len(p.spans) else [])
                for r in range(r_n):
                    ln = int(p.lens[t, r])
                    if ln <= 0:
                        continue
                    dfs[i, t] += ln
                    s0 = int(p.starts[t, r])
                    w0 = float(p.weights[t, r])
                    b0 = float(p.field_b[t, r])
                    a0 = float(p.avg_flen[t, r])
                    so = (
                        int(p.range_span[t, r])
                        if p.range_span is not None else -1
                    )
                    if so >= 0:
                        me = spans_t[so][:2]
                        earlier = [
                            (rs, rl)
                            for (fo, to, rs, rl) in spans_t[:so]
                            if (fo, to) != me
                        ]
                    else:
                        earlier = []
                    for (_rs, rl) in earlier:
                        max_span = max(max_span, rl)
                    off = 0
                    while off < ln:
                        take = min(ln - off, lch)
                        wl.append((i, t, s0 + off, take, w0, b0, a0))
                        wl_earlier.append(earlier)
                        off += take
        lp = round_up_pow2(lp, 8)
        # pow2-bucket W like every other static dim: the worklist length
        # varies with each batch's matched postings, and an unbucketed W
        # means a fresh XLA compile per novel shape
        W = round_up_pow2(max(len(wl), 1), cls.PRUNED_WCH)
        wl_i = np.zeros((4, W), np.int32)
        wl_f = np.zeros((3, W), np.float32)
        wl_f[2, :] = 1.0
        for j, (b, t, s0, ln, w0, b0, a0) in enumerate(wl):
            wl_i[:, j] = (b, t, s0, ln)
            wl_f[:, j] = (w0, b0, a0)
        # multi-field union-df spans (ops/pruned.py _rescore_worklist)
        nre = max((len(e) for e in wl_earlier), default=0)
        nre = round_up_pow2(nre, 1) if nre else 0
        wl_prev = None
        bs_steps = 0
        if nre:
            wl_prev = np.zeros((2, W, nre), np.int32)
            for j, earlier in enumerate(wl_earlier):
                for e, (rs, rl) in enumerate(earlier):
                    wl_prev[0, j, e] = rs
                    wl_prev[1, j, e] = rl
            bs_steps = 4
            while (1 << bs_steps) < max_span + 1:
                bs_steps += 4  # bucket compiles: steps in {4,8,...}
        # clamp to the corpus size: tolerance sums VARIANT ranges, so the
        # raw host df can exceed nd (duplicate docs across variants) and
        # a negative nomination idf would filter out every candidate —
        # nomination-only; the rescore recomputes the deduped df on
        # device
        d = np.minimum(np.maximum(dfs, 1.0), nd[:, None])
        idf = np.where(
            dfs > 0,
            np.log1p((nd[:, None] - d + 0.5) / (d + 0.5)),
            0.0,
        ).astype(np.float32)
        thr = np.zeros((Bb,), np.float32)
        if thresholds is not None:
            for i, t in enumerate(thresholds):
                thr[i] = t or 0.0
        pre_idesc = np.stack([pre_st, pre_ln])
        pre_fdesc = np.stack([pre_w, pre_fb, pre_av])
        return (pre_idesc, pre_fdesc, wl_i, wl_f, idf, nd, thr, dfs,
                int(lp), int(Tb), wl_prev, int(nre), int(bs_steps))

    @classmethod
    def _pruned_bs_inputs(cls, plans):
        """Host arrays for the v4 binary-search rescore
        (ops/pruned.py _rescore_bsearch): UNSPLIT doc-sorted ranges per
        (query, token). Plan builders split ranges at MAX_RANGE_LEN for
        the dense kernel's window gather; splitting preserves doc order,
        so adjacent splits with identical field params re-coalesce here
        and each coalesced range stays globally doc-sorted — NR becomes
        the real span count and one binary search resolves a candidate.

        Returns (rng_i int32[2, Bb, Tb, NRU], rng_f f32[3, Bb, Tb, NRU],
        bs_steps) or None when any coalesced range would still exceed
        the int32 probe budget (never in practice)."""
        B = len(plans)
        Bb = round_up_pow2(B, 1)
        T = max(p.starts.shape[0] for p in plans)
        Tb = round_up_pow2(T, 1)
        per = []  # [b][t] -> list of (start, len, w, fb, av)
        nru = 1
        max_len = 1
        for p in plans:
            rows = []
            t_n, r_n = p.starts.shape
            for t in range(t_n):
                items = sorted(
                    (
                        (int(p.starts[t, r]), int(p.lens[t, r]),
                         float(p.weights[t, r]), float(p.field_b[t, r]),
                         float(p.avg_flen[t, r]),
                         int(p.range_span[t, r])
                         if p.range_span is not None else -1 - r)
                        for r in range(r_n)
                        if int(p.lens[t, r]) > 0
                    ),
                )
                merged: list = []
                m_span: list = []
                for s0, ln, w0, b0, a0, so in items:
                    # only re-join pieces SPLIT FROM THE SAME SPAN
                    # (range_span ordinal): raw start-adjacency could
                    # merge two distinct doc-sorted ranges (consecutive
                    # segments of one term, or a committed tail abutting
                    # the live region) whose concatenation is NOT
                    # globally doc-sorted — _rescore_bsearch would then
                    # silently return wrong tf (the hazard
                    # string_index._pack_segment documents). Plans built
                    # without range_span never merge (so >= 0 distinct
                    # sentinel per row above).
                    if merged and m_span[-1] == so and so >= 0 \
                            and merged[-1][0] + merged[-1][1] == s0 \
                            and merged[-1][2:] == (w0, b0, a0):
                        prev = merged[-1]
                        merged[-1] = (prev[0], prev[1] + ln, w0, b0, a0)
                    else:
                        merged.append((s0, ln, w0, b0, a0))
                        m_span.append(so)
                rows.append(merged)
                nru = max(nru, len(merged))
                for m in merged:
                    max_len = max(max_len, m[1])
            per.append(rows)
        NRU = round_up_pow2(nru, 1)
        rng_st = np.zeros((Bb, Tb, NRU), np.int32)
        rng_ln = np.zeros((Bb, Tb, NRU), np.int32)
        rng_w = np.zeros((Bb, Tb, NRU), np.float32)
        rng_fb = np.full((Bb, Tb, NRU), 0.75, np.float32)
        rng_av = np.ones((Bb, Tb, NRU), np.float32)
        for i, rows in enumerate(per):
            for t, merged in enumerate(rows):
                for r, (s0, ln, w0, b0, a0) in enumerate(merged):
                    rng_st[i, t, r] = s0
                    rng_ln[i, t, r] = ln
                    rng_w[i, t, r] = w0
                    rng_fb[i, t, r] = b0
                    rng_av[i, t, r] = a0
        bs_steps = 4
        while (1 << bs_steps) < max_len + 1:
            bs_steps += 4  # bucket compiles: steps in {4, 8, ...}
        rng_i = np.stack([rng_st, rng_ln])
        rng_f = np.stack([rng_w, rng_fb, rng_av])
        return rng_i, rng_f, int(bs_steps)

    def _pruned_bs_chunk(self, plans) -> int:
        """Batched v4 dispatch chunk size: PRUNED_BS_BATCH doubled while
        the chunk's accum-nominator sort width (chunk * T * NPR * lp)
        stays within PRUNED_BS_SORT_BUDGET — the measured shape limit
        (see the constants' provenance comments)."""
        # The batched dispatch pads T*NPR and lp INDEPENDENTLY to the
        # batch maxima, so the true sort width is max(T*NPR) * max(lp)
        # — not max over plans of (T*NPR*lp) (advisor r4: a chunk could
        # exceed the budget when the widest-(T*NPR) plan is not the
        # deepest-prefix plan).
        max_tnpr = 0
        max_lpq = 0
        for pl in plans:
            if pl.pre_lens is not None and pl.pre_lens.size:
                lpq = round_up_pow2(max(8, int(pl.pre_lens.max())), 8)
                t_npr = pl.pre_lens.shape[0] * pl.pre_lens.shape[1]
                max_tnpr = max(max_tnpr, t_npr)
                max_lpq = max(max_lpq, lpq)
        width = max_tnpr * max_lpq
        S = self.PRUNED_BS_BATCH
        if width:
            while width * (S * 2) <= self.PRUNED_BS_SORT_BUDGET:
                S *= 2
        return S

    # bucket-span target for the static flat tables: per-range
    # resolution K_r = capb >> shift_r sized so the expected postings
    # per bucket is ~this many (rescore rounds = log2(max span))
    PRUNED_BS_SPAN = 16

    def _pruned_bs_boff(self, index, rng_i, capb: int,
                        bs_steps: int):
        """STATIC per-range bucket-offset tables for the v4
        binary-search rescore (r5 design; replaces the per-batch
        (B, T, NR, K+1) host-searchsorted tables). Each distinct
        committed range gets one device-resident offsets row at its own
        resolution K_r = capb >> shift_r (sized for ~PRUNED_BS_SPAN
        postings per bucket), built lazily on first use and cached by
        (index.uid, generation) — so a batch ships only (B, T, NR)
        int32 base/shift arrays (~2 KB) instead of re-searchsorting and
        re-uploading megabyte tables per batch. Rescore rounds drop
        from log2(range len) to log2(max engaged span): the kb=8192 A/B
        measured 520 -> 579 QPS @B=64 at the 10M tier (RESULTS.md
        round-5). Results are bit-identical to the unbucketed search.

        flat[0:2] is a zero dummy row: empty ranges point at it with a
        full-width shift so pos == hi == 0 and nothing probes.

        Returns (flat_dev | None, base, shift, steps) — (None, None,
        None, bs_steps) when any span unexpectedly crosses the
        committed/live slab boundary."""
        comm, live, _ck = index.slab_split()
        n_comm = len(comm[0]) if comm is not None else 0
        gen = (index.uid, index.generation)
        state = getattr(self, "_boff_flat", None)
        if state is None or state["key"] != gen:
            state = {
                "key": gen,
                "spans": {},
                "rows": [np.zeros(2, np.int32)],  # dummy row at 0
                "total": 2,
                "dev": None,
            }
            self._boff_flat = state
        spans = state["spans"]
        full_shift = max(capb.bit_length() - 1, 0)
        rng_st, rng_ln = rng_i[0], rng_i[1]
        Bb, Tb, NRU = rng_st.shape
        base = np.zeros((Bb, Tb, NRU), np.int32)
        shift = np.full((Bb, Tb, NRU), full_shift, np.int32)
        max_span = 1
        for b in range(Bb):
            for t in range(Tb):
                for r in range(NRU):
                    ln = int(rng_ln[b, t, r])
                    if ln <= 0:
                        continue  # dummy row
                    s0 = int(rng_st[b, t, r])
                    hit = spans.get((s0, ln))
                    if hit is None:
                        if s0 < n_comm:
                            seg = comm[0][s0:s0 + ln]
                        elif live is not None:
                            seg = live[0][s0 - n_comm:s0 - n_comm + ln]
                        else:
                            seg = np.zeros(0, np.int32)
                        if len(seg) != ln:
                            return None, None, None, bs_steps
                        # K_r = capb >> sh, sized for ~SPAN postings
                        # per bucket: span ~= ln * 2^sh / capb
                        sh = full_shift
                        while sh > 0 and (
                            ln << sh
                        ) > capb * self.PRUNED_BS_SPAN:
                            sh -= 1
                        K = max(capb >> sh, 1)
                        grid = np.arange(1, K, dtype=np.int64) << sh
                        row = np.empty(K + 1, np.int32)
                        row[0] = 0
                        if K > 1:
                            row[1:K] = np.searchsorted(seg, grid)
                        row[K] = ln
                        hit = (state["total"], sh,
                               int(np.diff(row).max()))
                        spans[(s0, ln)] = hit
                        state["rows"].append(row)
                        state["total"] += K + 1
                        state["dev"] = None
                    base[b, t, r] = hit[0]
                    shift[b, t, r] = hit[1]
                    max_span = max(max_span, hit[2])
        if state["dev"] is None:
            # pow2-padded upload: the kernel's flat operand shape only
            # changes on pow2 crossings (a per-new-term recompile would
            # be a first-query stall); the zero tail also absorbs the
            # sentinel candidate's at_j + 1 read past the last row
            flat = np.concatenate(state["rows"])
            Lp = 1
            while Lp < len(flat) + 1:
                Lp <<= 1
            buf = np.zeros(Lp, np.int32)
            buf[:len(flat)] = flat
            state["dev"] = jnp.asarray(buf)
        steps = 4
        while (1 << steps) < max_span + 1:
            steps += 4  # bucket compiles: steps in {4, 8, ...}
        return state["dev"], base, shift, steps

    @staticmethod
    def _pruned_counts(cand_counts, dfs, nd, thresholds, B,
                       sel_frac: float = 1.0):
        """Corpus-wide match counts for the pruned path: the union-
        probability estimate (ops/pruned.py estimate_match_count),
        floored by the verified-candidate lower bound. Thresholded
        queries keep the lower bound (the union estimate ignores the
        min-matched-tokens constraint). Filtered searches scale the
        estimate by the filter's selectivity (independence assumption —
        the host dfs are unfiltered range lengths)."""
        from ..ops.pruned import estimate_match_count

        out = np.asarray(cand_counts[:B]).copy()
        for i in range(B):
            thr_i = 0.0
            if thresholds is not None and i < len(thresholds):
                thr_i = thresholds[i] or 0.0
            if thr_i <= 0.0:
                est = estimate_match_count(
                    float(nd[i]), [d for d in dfs[i] if d > 0]
                )
                out[i] = max(int(out[i]), int(round(est * sel_frac)))
        return out

    def _facet_worklist(self, plan: QueryPlan, lch: int):
        """Worklist for the sort-based facet/reps kernel: every main
        range of the plan chunked to lch, each row carrying its token
        index (distinct-token counting groups the global (doc, token)
        sort by it — ops/pruned._match_reps_core). Returns wl_i
        int32[4, W]."""
        T, NR = plan.starts.shape
        wl = []
        for t in range(T):
            for r in range(NR):
                ln = int(plan.lens[t, r])
                if ln <= 0:
                    continue
                s0 = int(plan.starts[t, r])
                off = 0
                while off < ln:
                    take = min(ln - off, lch)
                    wl.append((0, t, s0 + off, take))
                    off += take
        W = round_up_pow2(max(len(wl), 1), 2)
        wl_i = np.zeros((4, W), np.int32)
        for j, row in enumerate(wl):
            wl_i[:, j] = row
        return wl_i

    def facet_counts_pruned(
        self,
        index: StringIndex,
        plan: QueryPlan,
        cap: int,
        spec,                     # ("cat", ids int32[cap], G)
        #                         | ("num", vals f32[cap] NaN-missing,
        #                            bounds f32[G, 2])
        spec_key,                 # device-cache key for the column
        exact: bool = False,
        mask: Optional[np.ndarray] = None,
        mask_key=None,
        thr: float = 0.0,
        vec=None,
        vec_only: bool = False,
    ) -> np.ndarray:
        """Facet counts over a pruned-tier fulltext OR hybrid search:
        distinct matched docs per bucket, sort-based (ops/pruned
        pruned_match_reps + pruned_facet_hist — the v3 streamed
        membership kernel was a measured hardware dud, RESULTS.md
        "Round-4 session 1"). The per-plan (docs, rep) pair is computed
        ONCE and cached device-resident for the search's remaining
        facet fields. `mask` is the facet quirk's alive-mask
        (tombstones); where-filters never reach here (facets count the
        UNFILTERED match set). `thr` = min distinct matched tokens
        (thresholded facets). `vec` = (vector_index, q f32[1, dim],
        similarity, rescale) for HYBRID searches at the int8/IVF tier:
        the match set widens to ft | top-V probe rows clearing the
        similarity floor (ops/pruned.pruned_hybrid_match_reps)."""
        from ..ops.pruned import (
            pruned_facet_hist, pruned_hybrid_match_reps,
            pruned_match_reps,
        )

        capb = round_up_pow2(cap, 128)
        has_filter = mask is not None
        fmask_arr = jnp.ones((1,), jnp.float32)
        if has_filter:
            fmask_arr = self._get_device_fmask(mask, mask_key, capb)
        # one-slot reps cache: the slot holds a strong ref to the plan,
        # so the `is` identity check can never alias a recycled id()
        reps_key = (index.uid, mask_key, has_filter, exact,
                    float(thr), capb, vec is not None, vec_only)
        slot = getattr(self, "_facet_reps_slot", None)
        if slot is not None and slot[1] is plan and slot[0] == reps_key:
            docs_dev, rep_dev = slot[2], slot[3]
        else:
            if vec_only:
                # vector-mode facets: no text worklist — phase A is the
                # probe alone, deduped against an all-sentinel (sorted)
                # ft reps array by pruned_hybrid_match_reps below
                assert vec is not None
                docs_dev = jnp.full((self.PRUNED_LCH,), capb, jnp.int32)
                rep_dev = jnp.zeros((self.PRUNED_LCH,), jnp.float32)
            else:
                p_doc, p_tf, p_etf, _p_flen = self._get_device_slab(
                    index
                )
                wl_i = self._facet_worklist(plan, self.PRUNED_LCH)
                docs_dev, rep_dev = pruned_match_reps(
                    p_doc, p_tf, p_etf, jnp.asarray(wl_i),
                    jnp.float32(thr), fmask_arr,
                    lch=self.PRUNED_LCH, cap=capb, exact=exact,
                    has_filter=has_filter,
                )
            if vec is not None:
                vector_index, q, sim_v, rescale = vec
                (mat_i8, v_scales, row_doc, unit_cen, unit_starts,
                 window, nprobe) = vector_index.int8_device_rows()
                V = round_up_pow2(
                    min(HYBRID_INT8_CANDIDATES, int(mat_i8.shape[0])), 8
                )
                docs_dev, rep_dev = pruned_hybrid_match_reps(
                    docs_dev, rep_dev,
                    mat_i8, v_scales, row_doc, unit_cen, unit_starts,
                    jnp.asarray(np.asarray(q, np.float32)),
                    jnp.float32(sim_v), fmask_arr,
                    V=V, nprobe=nprobe, window=window, cap=capb,
                    pad=self.PRUNED_LCH, has_filter=has_filter,
                    has_rescale=rescale is not None,
                    rescale_lo=float(rescale[0]) if rescale else 0.0,
                    rescale_hi=float(rescale[1]) if rescale else 1.0,
                )
            self._facet_reps_slot = (reps_key, plan, docs_dev, rep_dev)
        kind = spec[0]
        if kind in ("mcat", "mnum"):
            # multi-valued column: doc-sorted deduped (doc, value) pair
            # table + bounded per-doc probes (filter_fields.pair_table)
            numeric = kind == "mnum"
            pair_docs, pair_vals = spec[1], spec[2]
            if numeric:
                bounds = spec[3]
                G, M = bounds.shape[0], int(spec[4])
                bounds_dev = jnp.asarray(bounds.astype(np.float32))
            else:
                G, M = int(spec[3]), int(spec[4])
                bounds_dev = jnp.zeros((G, 2), jnp.float32)
            col_key = (spec_key, capb) if spec_key is not None else None
            pair_dev = _MISS
            if col_key is not None:
                pair_dev = self._fmask_dev.get(col_key)
            if pair_dev is _MISS:
                # sentinel row (> any doc id, != the docs' cap sentinel)
                # keeps the binary search total on empty/last runs
                pd = np.concatenate(
                    [pair_docs, np.full((1,), 2 ** 30, np.int32)]
                )
                pv = np.concatenate([
                    pair_vals,
                    np.zeros((1,), pair_vals.dtype),
                ])
                pair_dev = (jnp.asarray(pd), jnp.asarray(pv))
                if col_key is not None:
                    pair_dev = self._fmask_dev.put(col_key, pair_dev)
            from ..ops.pruned import pruned_facet_hist_multi

            counts = pruned_facet_hist_multi(
                docs_dev, rep_dev, pair_dev[0], pair_dev[1], bounds_dev,
                G=G, numeric=numeric, M=max(M, 1),
            )
            return np.asarray(counts)
        return self._facet_hist_single(
            spec, spec_key, capb, docs_dev, rep_dev
        )

    def facet_match_count(self, plan) -> Optional[int]:
        """EXACT match count of the search whose facet counting just
        ran: phase A's rep sum (one rep per distinct doc clearing the
        threshold under the alive mask — ops/pruned._match_reps_core).
        The count source for THRESHOLDED pruned facet searches, whose
        scoring-kernel estimate cannot model the min-matched-tokens
        constraint (read._pruned_facet_counts want_count). None when
        the reps slot doesn't hold this plan."""
        slot = getattr(self, "_facet_reps_slot", None)
        if slot is None or slot[1] is not plan:
            return None
        # int32 accumulation: an f32 sum of 1.0s is only exact to 2^24
        # matched docs (advisor r4) — above that tier the "exact" count
        # would silently drift
        return int(jnp.sum(slot[3].astype(jnp.int32)))

    def _facet_hist_single(self, spec, spec_key, capb,
                           docs_dev, rep_dev) -> np.ndarray:
        """Single-valued phase B of facet_counts_pruned: resolve the
        device column ("num" raw values / "cat" value ids) and run one
        pruned_facet_hist dispatch over the cached reps."""
        from ..ops.pruned import pruned_facet_hist

        kind = spec[0]
        if kind == "num":
            vals = spec[1]
            bounds = spec[2]
            G = bounds.shape[0]
            col_key = (spec_key, capb) if spec_key is not None else None
            col_dev = _MISS
            if col_key is not None:
                col_dev = self._fmask_dev.get(col_key)
            if col_dev is _MISS:
                arr = np.full((capb,), np.nan, np.float32)
                arr[: min(len(vals), capb)] = vals[:capb]
                col_dev = jnp.asarray(arr)
                if col_key is not None:
                    col_dev = self._fmask_dev.put(col_key, col_dev)
            bounds_dev = jnp.asarray(bounds.astype(np.float32))
            numeric = True
        else:
            ids = spec[1]
            G = int(spec[2])
            col_key = (spec_key, capb) if spec_key is not None else None
            col_dev = _MISS
            if col_key is not None:
                col_dev = self._fmask_dev.get(col_key)
            if col_dev is _MISS:
                arr = np.full((capb,), -1, np.int32)
                arr[: min(len(ids), capb)] = ids[:capb]
                col_dev = jnp.asarray(arr)
                if col_key is not None:
                    col_dev = self._fmask_dev.put(col_key, col_dev)
            bounds_dev = jnp.zeros((G, 2), jnp.float32)
            numeric = False
        counts = pruned_facet_hist(
            docs_dev, rep_dev, col_dev, bounds_dev, G=G,
            numeric=numeric,
        )
        return np.asarray(counts)

    def _pruned_mask_inputs(self, mask, mask_key, cap, capb, Bb, C):
        """Device inputs for a FILTERED pruned search: the f32 mask (and
        when the filter selects <= C docs, the filtered doc ids AS the
        candidate set — phase 1 skipped, results and counts exact).
        Returns (fmask_arr, cand_in, cand_given, sel)."""
        fmask_arr = self._get_device_fmask(mask, mask_key, capb)
        sel = int(np.count_nonzero(mask[:cap]))
        cand_in = None
        cand_given = False
        if sel <= C:
            ids = np.nonzero(mask[:cap])[0].astype(np.int32)
            cand_np = np.full((Bb, C), capb, np.int32)
            if len(ids):
                cand_np[:, : len(ids)] = ids[None, :]
            cand_in = jnp.asarray(cand_np)
            cand_given = True
        return fmask_arr, cand_in, cand_given, sel

    def _exact_counts_sliced(self, kernel, p_doc, p_tf, p_etf, wl_i,
                             thr, fmask_arr, *, B, capb, Tb, exact,
                             has_filter):
        """Dispatch the exact-counts kernel in <= PRUNED_COUNTS_SLICE
        query slices: its ONE global 3-key sort over the batch's flat
        postings blows up superlinearly with length on TPU v5e — 39.6 ms
        at B=8 vs 12.4 s at B=64 (benches/RESULTS.md round-4 session 1,
        VERDICT r3 #5). Slices share one compile shape per worklist-width
        bucket (padded to S queries)."""
        S = self.PRUNED_COUNTS_SLICE
        if B <= S:
            return np.asarray(kernel(
                p_doc, p_tf, p_etf,
                jnp.asarray(wl_i), jnp.asarray(thr), fmask_arr,
                lch=self.PRUNED_LCH, cap=capb, T=Tb, exact=exact,
                has_filter=has_filter,
            ))[:B]
        bw, ln = wl_i[0], wl_i[3]
        counts = np.zeros((B,), np.int32)
        for s0 in range(0, B, S):
            cols = np.nonzero((bw >= s0) & (bw < s0 + S) & (ln > 0))[0]
            Ws = round_up_pow2(max(len(cols), 1), 2)
            wls = np.zeros((4, Ws), np.int32)
            wls[:, : len(cols)] = wl_i[:, cols]
            wls[0, : len(cols)] -= s0
            thrs = np.zeros((S,), np.float32)
            take = min(S, B - s0)
            thrs[:take] = thr[s0:s0 + take]
            c = np.asarray(kernel(
                p_doc, p_tf, p_etf,
                jnp.asarray(wls), jnp.asarray(thrs), fmask_arr,
                lch=self.PRUNED_LCH, cap=capb, T=Tb, exact=exact,
                has_filter=has_filter,
            ))
            counts[s0:s0 + take] = c[:take]
        return counts

    def search_topk_pruned(
        self,
        index: StringIndex,
        plans: Sequence[QueryPlan],
        n_docs: Sequence[float],
        cap: int,
        k: int,
        exact: bool = False,
        thresholds: Optional[Sequence[float]] = None,
        omc: Optional[np.ndarray] = None,
        omc_key: Optional[int] = None,
        exact_counts: bool = False,
        mask: Optional[np.ndarray] = None,
        mask_key=None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Pruned fulltext search, single-device. Callers gate
        eligibility (ReadSide._pruned_eligible).

        exact_counts=True runs a SECOND dispatch over the same worklist
        (ops/pruned.py pruned_exact_counts) so the returned counts are
        the exact corpus-wide match counts instead of the estimate+
        lower-bound blend — opt-in, costs a global sort of the batch's
        postings.

        mask (bool[cap], True = allowed) applies one filter to ALL plans
        — the per-query path's combined tombstone+where mask (the dense
        path's filtered-df IDF semantics hold exactly). When the mask
        selects <= PRUNED_CANDIDATES docs the filtered set itself is the
        candidate list and results AND counts are exact (callers detect
        that case from the mask popcount, ReadSide._fulltext_scores)."""
        from ..ops.pruned import pruned_exact_counts, pruned_fulltext_topk

        p_doc, p_tf, p_etf, p_flen = self._get_device_slab(index)
        B = len(plans)
        capb = round_up_pow2(cap, 128)
        (pre_idesc, pre_fdesc, wl_i, wl_f, idf, nd, thr, dfs, lp, Tb,
         wl_prev, nre, bs_steps) = (
            self._pruned_host_inputs(plans, n_docs, thresholds)
        )
        has_omc = omc is not None
        if has_omc:
            omc_arr = self._get_device_omc(omc, omc_key, capb)
        else:
            omc_arr = jnp.ones((1,), jnp.float32)
        # small-corpus clamp (r5 mesh compile audit): a candidate
        # budget past the doc space only inflates compiled shapes (C >=
        # cap already nominates every doc, so results are unchanged)
        C = min(self.PRUNED_CANDIDATES, round_up_pow2(cap, 8))
        has_filter = mask is not None
        fmask_arr = jnp.ones((1,), jnp.float32)
        cand_in = None
        cand_given = False
        sel = None
        if has_filter:
            fmask_arr, cand_in, cand_given, sel = self._pruned_mask_inputs(
                mask, mask_key, cap, capb, idf.shape[0], C
            )
        use_bs = (
            self.PRUNED_BS and not exact and not has_filter and nre == 0
        )
        if use_bs and B > self._pruned_bs_chunk(plans):
            # measured non-monotonicity: accum1024 runs 106 QPS @B=64
            # but 72 @B=256 on TPU v5e (RESULTS.md round-4 session 2) —
            # dispatch larger batches as chunks whose nominator sort
            # width fits PRUNED_BS_SORT_BUDGET (at the r5 default
            # lp=65536 a B=64 chunk is the measured-fastest shape:
            # 592/577/599 QPS at B=64/256/512, RESULTS.md round-5). v3
            # shapes are NOT split (their pathology is the inverse:
            # 12 QPS @B=64, 47 @B=256).
            S = self._pruned_bs_chunk(plans)
            parts = [
                self.search_topk_pruned(
                    index, plans[i:i + S], n_docs[i:i + S], cap, k,
                    exact=exact,
                    thresholds=(
                        thresholds[i:i + S] if thresholds is not None
                        else None
                    ),
                    omc=omc, omc_key=omc_key, exact_counts=exact_counts,
                )
                for i in range(0, B, S)
            ]
            return (
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
                np.concatenate([p[2] for p in parts]),
            )
        if use_bs:
            # v4: exact host IDF (single-span tokens, unfiltered,
            # stemmed tf >= 1 — range lengths ARE the df) + per-candidate
            # binary-search rescore over unsplit ranges
            from ..ops.pruned import pruned_fulltext_topk_bs

            rng_i, rng_f, rbs_steps = self._pruned_bs_inputs(plans)
            bflat, bbase, bshift, rbs_steps = self._pruned_bs_boff(
                index, rng_i, capb, rbs_steps
            )
            if self.PRUNED_BS_ACCUM:
                Cb = min(self.PRUNED_BS_C, round_up_pow2(cap, 8))
            else:
                Cb = pre_idesc.shape[2] * pre_idesc.shape[3] * \
                    self.PRUNED_BS_HP
            kb = min(round_up_pow2(k, 8), Cb)
            vals, ids, cand_counts = pruned_fulltext_topk_bs(
                p_doc, p_tf, p_flen,
                jnp.asarray(pre_idesc[0]), jnp.asarray(pre_idesc[1]),
                jnp.asarray(rng_i), jnp.asarray(rng_f),
                jnp.asarray(idf), jnp.asarray(thr),
                omc_arr, None,
                jnp.asarray(pre_fdesc) if self.PRUNED_BS_ACCUM else None,
                (bflat, jnp.asarray(bbase), jnp.asarray(bshift))
                if bflat is not None else None,
                hp=self.PRUNED_BS_HP, cap=capb, k=kb,
                bs_steps=rbs_steps, has_omc=has_omc,
                nom_accum=self.PRUNED_BS_ACCUM,
                lp=lp if self.PRUNED_BS_ACCUM else 0,
                C=Cb if self.PRUNED_BS_ACCUM else 0,
            )
        else:
            kb = min(round_up_pow2(k, 8), C)
            vals, ids, cand_counts = pruned_fulltext_topk(
                p_doc, p_tf, p_etf, p_flen,
                jnp.asarray(pre_idesc), jnp.asarray(pre_fdesc),
                jnp.asarray(wl_i), jnp.asarray(wl_f),
                jnp.asarray(idf), jnp.asarray(nd), jnp.asarray(thr),
                omc_arr,
                jnp.asarray(wl_prev) if wl_prev is not None else None,
                fmask_arr, cand_in,
                lp=lp, lch=self.PRUNED_LCH, cap=capb, C=C, k=kb, T=Tb,
                exact=exact, has_omc=has_omc, nre=nre, bs_steps=bs_steps,
                has_filter=has_filter, cand_given=cand_given,
            )
        if cand_given:
            # every in-filter doc was verified: counts are exact
            counts = np.asarray(cand_counts[:B])
        elif exact_counts:
            counts = self._exact_counts_sliced(
                pruned_exact_counts, p_doc, p_tf, p_etf, wl_i, thr,
                fmask_arr, B=B, capb=capb, Tb=Tb, exact=exact,
                has_filter=has_filter,
            )
        else:
            sel_frac = 1.0
            if sel is not None:
                sel_frac = sel / max(float(nd[0]), 1.0)
            counts = self._pruned_counts(
                cand_counts, dfs, nd, thresholds, B, sel_frac=sel_frac
            )
        return (
            np.asarray(vals[:B, :k]),
            np.asarray(ids[:B, :k]),
            counts,
        )



class HybridSearchTopK(PrunedPlanMixin):
    """Fused hybrid: BM25F + vector matmul + min-max fusion + threshold +
    OMC + top-k in ONE device dispatch (VERDICT r1 #7: the 2-3-dispatch
    hybrid path capped out at 17 QPS behind tunnel latency)."""

    def search_topk_hybrid(
        self,
        index: StringIndex,
        plans: Sequence[QueryPlan],
        n_docs: Sequence[float],
        cap: int,
        k: int,
        vec_rows,                 # (matrix, row_doc, row_valid) device arrays
        queries: np.ndarray,      # f32[B, dim] L2-normalized query vectors
        similarities: Sequence[float],
        exact: bool = False,
        doc_masks: Optional[Sequence[Optional[np.ndarray]]] = None,
        thresholds: Optional[Sequence[float]] = None,
        omc: Optional[np.ndarray] = None,
        omc_key: Optional[int] = None,
        rescale: Optional[Tuple[float, float]] = None,
        with_bitmap: bool = False,
    ) -> Tuple[np.ndarray, ...]:
        from ..ops.hybrid import hybrid_search_topk_packed
        from ..ops.bm25 import round_up_pow2

        p_doc, p_tf, p_etf, p_flen = self._get_device_slab(index)
        pb = _PlanBatch(plans, n_docs, cap, doc_masks)
        Bb = pb.starts.shape[0]
        idesc = np.stack([pb.starts, pb.lens])
        fdesc = np.stack([pb.weights, pb.field_b, pb.avg_flen])
        scalars = np.stack([
            pb.nd, np.zeros((Bb,), np.float32), np.zeros((Bb,), np.float32),
        ])
        if thresholds is not None:
            for i, t in enumerate(thresholds):
                scalars[1, i] = t or 0.0
        for i, s in enumerate(similarities):
            scalars[2, i] = s
        has_mask = doc_masks is not None and any(
            m is not None for m in doc_masks
        )
        mask_arr = pb.masks if has_mask else np.zeros((1, 1), bool)
        has_omc = omc is not None
        if has_omc:
            omc_arr = self._get_device_omc(omc, omc_key, pb.capb)
        else:
            omc_arr = jnp.ones((1,), jnp.float32)
        q = np.zeros((Bb, queries.shape[1]), np.float32)
        q[: len(queries)] = queries
        matrix, row_doc, row_valid = vec_rows
        kb = min(round_up_pow2(k, 8), pb.capb)
        out = hybrid_search_topk_packed(
            p_doc, p_tf, p_etf, p_flen,
            jnp.asarray(idesc), jnp.asarray(fdesc), jnp.asarray(scalars),
            matrix, row_doc, row_valid, jnp.asarray(q),
            jnp.asarray(mask_arr), omc_arr,
            lr=pb.LRb, exact=exact, cap=pb.capb, k=kb,
            has_mask=has_mask, has_omc=has_omc,
            has_rescale=rescale is not None,
            rescale_lo=float(rescale[0]) if rescale else 0.0,
            rescale_hi=float(rescale[1]) if rescale else 1.0,
            with_bitmap=with_bitmap,
        )
        vals, idx, counts = out[:3]
        res = (
            np.asarray(vals[: pb.B, :k]),
            np.asarray(idx[: pb.B, :k]),
            np.asarray(counts[: pb.B]),
        )
        if with_bitmap:
            bits = np.asarray(out[3][: pb.B])
            masks = np.unpackbits(bits, axis=1)[:, :cap].astype(bool)
            return res + (masks,)
        return res


    def search_topk_hybrid_int8(
        self,
        index: StringIndex,
        plans: Sequence[QueryPlan],
        n_docs: Sequence[float],
        cap: int,
        k: int,
        vec_int8,                 # VectorIndex.int8_device_rows() tuple
        queries: np.ndarray,      # f32[B, dim] L2-normalized query vectors
        similarities: Sequence[float],
        exact: bool = False,
        doc_masks: Optional[Sequence[Optional[np.ndarray]]] = None,
        thresholds: Optional[Sequence[float]] = None,
        omc: Optional[np.ndarray] = None,
        omc_key: Optional[int] = None,
        rescale: Optional[Tuple[float, float]] = None,
        candidates: Optional[int] = None,  # V rows per query (default 4k)
        with_bitmap: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Fused hybrid over the int8/IVF vector layout (>=2M rows): the
        vector side probes top-nprobe cluster units for top-V candidate
        rows, scatter-maxed onto the dense doc space, fused with BM25 in
        the same dispatch (ops/hybrid.py)."""
        from ..ops.hybrid import hybrid_search_topk_packed_int8
        from ..ops.bm25 import round_up_pow2

        p_doc, p_tf, p_etf, p_flen = self._get_device_slab(index)
        pb = _PlanBatch(plans, n_docs, cap, doc_masks)
        Bb = pb.starts.shape[0]
        idesc = np.stack([pb.starts, pb.lens])
        fdesc = np.stack([pb.weights, pb.field_b, pb.avg_flen])
        scalars = np.stack([
            pb.nd, np.zeros((Bb,), np.float32), np.zeros((Bb,), np.float32),
        ])
        if thresholds is not None:
            for i, t in enumerate(thresholds):
                scalars[1, i] = t or 0.0
        for i, s in enumerate(similarities):
            scalars[2, i] = s
        has_mask = doc_masks is not None and any(
            m is not None for m in doc_masks
        )
        mask_arr = pb.masks if has_mask else np.zeros((1, 1), bool)
        has_omc = omc is not None
        if has_omc:
            omc_arr = self._get_device_omc(omc, omc_key, pb.capb)
        else:
            omc_arr = jnp.ones((1,), jnp.float32)
        q = np.zeros((Bb, queries.shape[1]), np.float32)
        q[: len(queries)] = queries
        mat_i8, scales, row_doc, unit_cen, unit_starts, window, nprobe = (
            vec_int8
        )
        kb = min(round_up_pow2(k, 8), pb.capb)
        V = round_up_pow2(
            min(candidates or HYBRID_INT8_CANDIDATES, int(mat_i8.shape[0])), 8
        )
        champs_dev = (
            self._get_device_champs(index, pb.capb) if pb.has_champ else None
        )
        has_champ = champs_dev is not None
        out = hybrid_search_topk_packed_int8(
            p_doc, p_tf, p_etf, p_flen,
            jnp.asarray(idesc), jnp.asarray(fdesc), jnp.asarray(scalars),
            mat_i8, scales, row_doc, unit_cen, unit_starts,
            jnp.asarray(q),
            jnp.asarray(mask_arr), omc_arr,
            champs_dev,
            jnp.asarray(pb.ch_idx) if has_champ else None,
            jnp.asarray(pb.ch_w) if has_champ else None,
            lr=pb.LRb, exact=exact, cap=pb.capb, k=kb,
            V=V, nprobe=nprobe, window=window,
            has_mask=has_mask, has_omc=has_omc,
            has_rescale=rescale is not None,
            rescale_lo=float(rescale[0]) if rescale else 0.0,
            rescale_hi=float(rescale[1]) if rescale else 1.0,
            has_champ=has_champ,
            with_bitmap=with_bitmap,
        )
        vals, idx, counts = out[:3]
        res = (
            np.asarray(vals[: pb.B, :k]),
            np.asarray(idx[: pb.B, :k]),
            np.asarray(counts[: pb.B]),
        )
        if with_bitmap:
            bits = np.asarray(out[3][: pb.B])
            masks = np.unpackbits(bits, axis=1)[:, :cap].astype(bool)
            return res + (masks,)
        return res


    def search_topk_hybrid_int8_pruned(
        self,
        index: StringIndex,
        plans: Sequence[QueryPlan],
        n_docs: Sequence[float],
        cap: int,
        k: int,
        vec_int8,                 # VectorIndex.int8_device_rows() tuple
        doc2row,                  # VectorIndex.int8_doc2row(capb) device
        queries: np.ndarray,
        similarities: Sequence[float],
        exact: bool = False,
        thresholds: Optional[Sequence[float]] = None,
        omc: Optional[np.ndarray] = None,
        omc_key: Optional[int] = None,
        rescale: Optional[Tuple[float, float]] = None,
        candidates: Optional[int] = None,
        mask: Optional[np.ndarray] = None,
        mask_key=None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Pruned fused hybrid over the int8/IVF layout: fulltext prefix
        candidates UNION the IVF probe's top-V rows, both sides scored
        exactly on that set (ops/pruned.py pruned_hybrid_topk_int8) —
        no dense (B, cap) accumulators, so batches scale past the dense
        tier's HBM ceiling.

        mask: one bool[cap] filter for ALL plans (per-query path). Small
        filters (<= PRUNED_CANDIDATES docs) become the candidate set —
        both sides exact over the whole filtered set."""
        from ..ops.pruned import pruned_hybrid_topk_int8

        p_doc, p_tf, p_etf, p_flen = self._get_device_slab(index)
        B = len(plans)
        capb = round_up_pow2(cap, 128)
        (pre_idesc, pre_fdesc, wl_i, wl_f, idf, nd, thr, dfs, lp, Tb,
         wl_prev, nre, bs_steps) = (
            self._pruned_host_inputs(plans, n_docs, thresholds)
        )
        mat_i8, v_scales, row_doc, unit_cen, unit_starts, window, nprobe = (
            vec_int8
        )
        V = round_up_pow2(
            min(candidates or HYBRID_INT8_CANDIDATES, int(mat_i8.shape[0])),
            8,
        )
        C = self.PRUNED_CANDIDATES
        has_omc = omc is not None
        if has_omc:
            omc_arr = self._get_device_omc(omc, omc_key, capb)
        else:
            omc_arr = jnp.ones((1,), jnp.float32)
        Bb = idf.shape[0]
        has_filter = mask is not None
        fmask_arr = jnp.ones((1,), jnp.float32)
        cand_in = None
        cand_given = False
        sel = None
        if has_filter:
            fmask_arr, cand_in, cand_given, sel = self._pruned_mask_inputs(
                mask, mask_key, cap, capb, Bb, C
            )
        Ct = C if cand_given else C + V
        q = np.zeros((Bb, queries.shape[1]), np.float32)
        q[: len(queries)] = queries
        sims = np.zeros((Bb,), np.float32)
        for i, s in enumerate(similarities):
            sims[i] = s
        use_bs = (
            self.PRUNED_BS and not exact and not has_filter and nre == 0
        )
        if use_bs and B > self._pruned_bs_chunk(plans):
            # same measured non-monotonicity as fulltext: hybrid-bs runs
            # 97 QPS @B=64 but 69 @B=128 on TPU v5e (RESULTS.md round-4
            # session 3) — dispatch larger batches as sort-width-bounded
            # chunks (_pruned_bs_chunk; engine-default lp=8192 batches
            # run unsplit, the measured-fastest shape).
            S = self._pruned_bs_chunk(plans)
            parts = [
                self.search_topk_hybrid_int8_pruned(
                    index, plans[i:i + S], n_docs[i:i + S], cap, k,
                    vec_int8, doc2row, queries[i:i + S],
                    similarities[i:i + S],
                    exact=exact,
                    thresholds=(
                        thresholds[i:i + S] if thresholds is not None
                        else None
                    ),
                    omc=omc, omc_key=omc_key, rescale=rescale,
                    candidates=candidates,
                )
                for i in range(0, B, S)
            ]
            return (
                np.concatenate([p[0] for p in parts]),
                np.concatenate([p[1] for p in parts]),
                np.concatenate([p[2] for p in parts]),
            )
        if use_bs:
            from ..ops.pruned import pruned_hybrid_topk_int8_bs

            rng_i, rng_f, rbs_steps = self._pruned_bs_inputs(plans)
            bflat, bbase, bshift, rbs_steps = self._pruned_bs_boff(
                index, rng_i, capb, rbs_steps
            )
            if self.PRUNED_BS_ACCUM:
                Cb = min(self.PRUNED_BS_C, round_up_pow2(cap, 8))
            else:
                Cb = pre_idesc.shape[2] * pre_idesc.shape[3] * \
                    self.PRUNED_BS_HP
            kb = min(round_up_pow2(k, 8), Cb + V)
            vals, ids, cand_counts = pruned_hybrid_topk_int8_bs(
                p_doc, p_tf, p_flen,
                jnp.asarray(pre_idesc[0]), jnp.asarray(pre_idesc[1]),
                jnp.asarray(rng_i), jnp.asarray(rng_f),
                jnp.asarray(idf), jnp.asarray(thr),
                mat_i8, v_scales, row_doc, unit_cen, unit_starts,
                doc2row,
                jnp.asarray(q), jnp.asarray(sims), omc_arr,
                None,
                jnp.asarray(pre_fdesc) if self.PRUNED_BS_ACCUM else None,
                (bflat, jnp.asarray(bbase), jnp.asarray(bshift))
                if bflat is not None else None,
                hp=self.PRUNED_BS_HP, cap=capb, k=kb,
                bs_steps=rbs_steps, has_omc=has_omc,
                V=V, nprobe=nprobe, window=window,
                has_rescale=rescale is not None,
                rescale_lo=float(rescale[0]) if rescale else 0.0,
                rescale_hi=float(rescale[1]) if rescale else 1.0,
                nom_accum=self.PRUNED_BS_ACCUM,
                lp=lp if self.PRUNED_BS_ACCUM else 0,
                C=Cb if self.PRUNED_BS_ACCUM else 0,
            )
        else:
            kb = min(round_up_pow2(k, 8), Ct)
            vals, ids, cand_counts = pruned_hybrid_topk_int8(
                p_doc, p_tf, p_etf, p_flen,
                jnp.asarray(pre_idesc), jnp.asarray(pre_fdesc),
                jnp.asarray(wl_i), jnp.asarray(wl_f),
                jnp.asarray(idf), jnp.asarray(nd), jnp.asarray(thr),
                mat_i8, v_scales, row_doc, unit_cen, unit_starts, doc2row,
                jnp.asarray(q), jnp.asarray(sims), omc_arr,
                jnp.asarray(wl_prev) if wl_prev is not None else None,
                fmask_arr, cand_in,
                lp=lp, lch=self.PRUNED_LCH, cap=capb, C=C, k=kb, T=Tb,
                exact=exact, has_omc=has_omc, nre=nre, bs_steps=bs_steps,
                V=V, nprobe=nprobe, window=window,
                has_rescale=rescale is not None,
                rescale_lo=float(rescale[0]) if rescale else 0.0,
                rescale_hi=float(rescale[1]) if rescale else 1.0,
                has_filter=has_filter, cand_given=cand_given,
            )
        if cand_given:
            counts = np.asarray(cand_counts[:B])
        else:
            sel_frac = 1.0
            if sel is not None:
                sel_frac = sel / max(float(nd[0]), 1.0)
            counts = self._pruned_counts(
                cand_counts, dfs, nd, thresholds, B, sel_frac=sel_frac
            )
        return (
            np.asarray(vals[:B, :k]),
            np.asarray(ids[:B, :k]),
            counts,
        )


SHARED_LENGTH_CLASSES = (1024, 16384, 131072)
SHARED_CHUNK_BY_CLASS = {1024: 64, 16384: 16, 131072: 8}


def analyze_shared_batch(
    index: StringIndex,
    tokens_per_query: Sequence[Sequence[str]],
    properties: Sequence[str],
    boost: Dict[str, float],
    field_params: Optional[Dict[str, Tuple[float, float]]],
    exact: bool,
    tolerance: Optional[int],
    impact_cap: Optional[int],
    use_champions: bool = True,
    token_weight_of: Optional[Dict[str, float]] = None,
):
    """Host-side analysis shared by the single-device and mesh batched
    executors: dedup the batch's tokens, resolve posting ranges, route
    fully-champion-covered tokens (optional), and partition the rest
    into range-length classes. Returns
    (u_ranges, u_champs, token_map_global (B, T), classes, B, T)."""
    from .string_index import DEFAULT_B

    B = len(tokens_per_query)
    # vectorized dedup + (B, T) token-map fill: at B=16k the per-(query,
    # token) Python loops were ~half the host cost of a batch
    flat: List[str] = []
    q_lens = np.empty(B, np.int32)
    for b, toks in enumerate(tokens_per_query):
        q_lens[b] = len(toks)
        flat.extend(toks)
    T = max(1, int(q_lens.max()) if B else 1)
    uniq_arr, inverse = np.unique(np.asarray(flat, dtype=str), return_inverse=True)
    token_map_global = np.full((B, T), -1, np.int32)
    rows = np.repeat(np.arange(B, dtype=np.int32), q_lens)
    q_starts = (np.cumsum(q_lens, dtype=np.int64) - q_lens).astype(np.int32)
    cols = (
        np.arange(int(q_lens.sum()), dtype=np.int32)
        - np.repeat(q_starts, q_lens)
    )
    token_map_global[rows, cols] = inverse.astype(np.int32)

    u_ranges: List[List[Tuple[int, int, float, float, float]]] = []
    u_champs: List[Optional[List[Tuple[int, float]]]] = []
    tol = 0 if exact else tolerance
    for tok in uniq_arr.tolist():
        ranges: List[Tuple[int, int, float, float, float]] = []
        champ_slots: List[Tuple[int, float]] = []
        champ_covers: List[frozenset] = []
        for path in properties:
            stats = index._stats.get(path)
            if stats is None or stats.doc_count == 0:
                continue
            fw, fb = (field_params or {}).get(path, (1.0, DEFAULT_B))
            w = boost.get(path, 1.0) * fw
            if token_weight_of:
                w *= token_weight_of.get(tok, 1.0)
            avg = stats.avg_len or 1.0
            champ_skip = None
            if use_champions and not exact and not tol:
                ci = index._champ_map.get((path, tok))
                if ci is not None and abs(fb - DEFAULT_B) < 1e-9:
                    c_avg, covered = index._champ_meta[ci]
                    if abs(c_avg - avg) < 1e-6 * max(avg, 1.0):
                        champ_slots.append((ci, w))
                        champ_skip = covered
                        champ_covers.append(covered)
            for (start, length) in index._match_terms(path, tok, tol):
                if champ_skip is not None and \
                        (start, length) in champ_skip:
                    continue
                if impact_cap is not None and length > impact_cap:
                    length = impact_cap
                from ..ops.bm25 import MAX_RANGE_LEN

                while length > MAX_RANGE_LEN:
                    ranges.append((start, MAX_RANGE_LEN, w, fb, avg))
                    start += MAX_RANGE_LEN
                    length -= MAX_RANGE_LEN
                ranges.append((start, length, w, fb, avg))
        if champ_slots and ranges:
            # partial coverage: revert champions to their ranges
            from ..ops.bm25 import MAX_RANGE_LEN

            for covered, (ci, w) in zip(champ_covers, champ_slots):
                avg_c = index._champ_meta[ci][0]
                for (c_start, c_len) in covered:
                    start, length = c_start, c_len
                    if impact_cap is not None and length > impact_cap:
                        length = impact_cap
                    while length > MAX_RANGE_LEN:
                        ranges.append(
                            (start, MAX_RANGE_LEN, w, DEFAULT_B, avg_c)
                        )
                        start += MAX_RANGE_LEN
                        length -= MAX_RANGE_LEN
                    ranges.append((start, length, w, DEFAULT_B, avg_c))
            champ_slots = []
        u_ranges.append(ranges)
        u_champs.append(champ_slots or None)

    classes: Dict[int, List[int]] = {c: [] for c in SHARED_LENGTH_CLASSES}
    for ui, ranges in enumerate(u_ranges):
        if u_champs[ui] is not None:
            continue  # champion class handles this token
        ml = max((l for (_, l, *_rest) in ranges), default=0)
        for c in SHARED_LENGTH_CLASSES:
            if ml <= c:
                classes[c].append(ui)
                break
    return u_ranges, u_champs, token_map_global, classes, B, T


def pack_shared_class(u_ranges, uids, token_map_global, B, T, cu):
    """Padded per-class descriptor arrays for the shared kernels:
    (st, ln, wt, fb, av (Up, NRb), tmap (B, T), lrb)."""
    Up = max(cu, ((len(uids) + cu - 1) // cu) * cu)
    NR = max(1, max(len(u_ranges[u]) for u in uids))
    NRb = round_up_pow2(NR, 1)
    st = np.zeros((Up, NRb), np.int32)
    ln = np.zeros((Up, NRb), np.int32)
    wt = np.zeros((Up, NRb), np.float32)
    fb = np.full((Up, NRb), 0.75, np.float32)
    av = np.ones((Up, NRb), np.float32)
    local_of = {}
    for li, ui in enumerate(uids):
        local_of[ui] = li
        for ri, (s0, l0, w0, b0, a0) in enumerate(u_ranges[ui][:NRb]):
            st[li, ri] = s0
            ln[li, ri] = l0
            wt[li, ri] = w0
            fb[li, ri] = b0
            av[li, ri] = a0
    # vectorized global→local uid gather (the (B, T) Python loop was a
    # top host cost at B=16k)
    n_glob = int(token_map_global.max()) + 1 if token_map_global.size else 0
    lut = np.full(max(n_glob, 1) + 1, Up, np.int32)  # last slot: g == -1
    for ui, li in local_of.items():
        if ui < n_glob:
            lut[ui] = li
    tmap = lut[token_map_global]  # -1 indexes the sentinel last slot
    lrb = round_up_pow2(max(1, int(ln.max())), 8)
    return st, ln, wt, fb, av, tmap, int(lrb)


class SharedBatchExecutor(StringSearchTopK):
    """Term-deduplicated batched scoring: each unique query token is
    scored once into dense per-token rows; a (B, U) assignment matmul
    distributes rows to queries. Exact for unfiltered searches. Unique
    tokens are partitioned into range-length classes so each device call
    has homogeneous static shapes."""

    LENGTH_CLASSES = SHARED_LENGTH_CLASSES
    CHUNK_BY_CLASS = SHARED_CHUNK_BY_CLASS

    def search_topk_shared(
        self,
        index: StringIndex,
        tokens_per_query: Sequence[Sequence[str]],
        properties: Sequence[str],
        boost: Dict[str, float],
        n_docs: float,
        cap: int,
        k: int,
        thresholds: Optional[Sequence[float]] = None,
        exact: bool = False,
        tolerance: Optional[int] = None,
        impact_cap: Optional[int] = None,
        doc_masks: Optional[Sequence[Optional[np.ndarray]]] = None,
        field_params: Optional[Dict[str, Tuple[float, float]]] = None,
        omc: Optional[np.ndarray] = None,
        omc_key: Optional[int] = None,
        vec_rows=None,                 # hybrid: (matrix, row_doc, row_valid)
        queries: Optional[np.ndarray] = None,   # hybrid: f32[B, dim]
        similarities: Optional[Sequence[float]] = None,
        rescale: Optional[Tuple[float, float]] = None,
        vec_rows_int8=None,            # hybrid: int8_device_rows() tuple
        candidates: Optional[int] = None,       # int8 tail: V per query
        token_weight_of: Optional[Dict[str, float]] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        from ..ops.bm25 import (
            bm25_shared_partial,
            bm25_shared_partial_masked,
            finalize_topk,
            round_up_pow2,
        )

        p_doc, p_tf, p_etf, p_flen = self._get_device_slab(index)
        capb = round_up_pow2(cap, 128)

        # champion tokens: FULLY covered by precomputed dense rows (any
        # live/uncovered range falls the whole token back to ranged
        # scanning, keeping matched-token counts exact)
        u_ranges, u_champs, token_map_global, classes, B, T = (
            analyze_shared_batch(
                index, tokens_per_query, properties, boost, field_params,
                exact, tolerance, impact_cap,
                token_weight_of=token_weight_of,
            )
        )

        has_masks = doc_masks is not None and any(
            m is not None for m in doc_masks
        )
        mask_dev = None
        if has_masks:
            masks = np.ones((B, capb), bool)
            for i, m in enumerate(doc_masks):
                if m is not None:
                    masks[i, : len(m)] = m
                    masks[i, len(m):] = False
            mask_dev = jnp.asarray(masks)

        scores = jnp.zeros((B, capb), jnp.float32)
        matched = jnp.zeros((B, capb), jnp.float32)

        for lr_class, uids in classes.items():
            if not uids:
                continue
            cu = self.CHUNK_BY_CLASS[lr_class]
            st, ln, wt, fb, av, tmap, lrb = pack_shared_class(
                u_ranges, uids, token_map_global, B, T, cu
            )
            if has_masks:
                scores, matched = bm25_shared_partial_masked(
                    p_doc, p_tf, p_etf, p_flen,
                    jnp.asarray(st), jnp.asarray(ln), jnp.asarray(wt),
                    jnp.asarray(fb), jnp.asarray(av), jnp.asarray(tmap),
                    mask_dev,
                    jnp.float32(max(n_docs, 1.0)),
                    scores, matched,
                    lr=int(lrb), cap=capb, cu=cu, exact=exact,
                )
            else:
                scores, matched = bm25_shared_partial(
                    p_doc, p_tf, p_etf, p_flen,
                    jnp.asarray(st), jnp.asarray(ln), jnp.asarray(wt),
                    jnp.asarray(fb), jnp.asarray(av), jnp.asarray(tmap),
                    jnp.float32(max(n_docs, 1.0)),
                    scores, matched,
                    lr=int(lrb), cap=capb, cu=cu, exact=exact,
                )

        # ---- champion class: dense rows, zero posting gathers ------------
        champ_uids = [ui for ui, c in enumerate(u_champs) if c]
        if champ_uids:
            from ..ops.bm25 import (
                bm25_shared_champions,
                bm25_shared_champions_masked,
            )

            champs_dev = self._get_device_champs(index, capb)
            NC = max(len(u_champs[ui]) for ui in champ_uids)
            ch_rows = np.full((len(champ_uids), NC), -1, np.int32)
            ch_w = np.zeros((len(champ_uids), NC), np.float32)
            entry_token = np.asarray(champ_uids, np.int32)
            for ei, ui in enumerate(champ_uids):
                for cj, (ci, w) in enumerate(u_champs[ui]):
                    ch_rows[ei, cj] = ci
                    ch_w[ei, cj] = w
            if has_masks:
                scores, matched = bm25_shared_champions_masked(
                    champs_dev, jnp.asarray(ch_rows), jnp.asarray(ch_w),
                    jnp.asarray(entry_token),
                    jnp.asarray(token_map_global), mask_dev,
                    jnp.float32(max(n_docs, 1.0)), scores, matched,
                    cap=capb,
                )
            else:
                scores, matched = bm25_shared_champions(
                    champs_dev, jnp.asarray(ch_rows), jnp.asarray(ch_w),
                    jnp.asarray(entry_token),
                    jnp.asarray(token_map_global),
                    jnp.float32(max(n_docs, 1.0)), scores, matched,
                    cap=capb,
                )

        thr = np.zeros((B,), np.float32)
        if thresholds is not None:
            for i, t in enumerate(thresholds):
                thr[i] = t or 0.0
        has_omc = omc is not None
        if has_omc:
            omc_dev = self._get_device_omc(omc, omc_key, capb)
        else:
            omc_dev = jnp.ones((capb,), jnp.float32)
        kb = min(round_up_pow2(k, 8), capb)
        if vec_rows_int8 is not None:
            # batched-hybrid tail over the int8/IVF layout
            from ..ops.hybrid import hybrid_finalize_topk_int8

            (mat_i8, v_scales, row_doc, unit_cen, unit_starts, window,
             nprobe) = vec_rows_int8
            sims = np.asarray(similarities, np.float32)
            V = round_up_pow2(
                min(candidates or HYBRID_INT8_CANDIDATES, int(mat_i8.shape[0])), 8
            )
            vals, idx, counts = hybrid_finalize_topk_int8(
                scores, matched, jnp.asarray(thr),
                mat_i8, v_scales, row_doc, unit_cen, unit_starts,
                jnp.asarray(np.asarray(queries, np.float32)),
                jnp.asarray(sims),
                mask_dev if has_masks else jnp.zeros((1, 1), bool),
                omc_dev if has_omc else jnp.ones((1,), jnp.float32),
                cap=capb, k=kb, V=V, nprobe=nprobe, window=window,
                has_mask=has_masks, has_omc=has_omc,
                has_rescale=rescale is not None,
                rescale_lo=float(rescale[0]) if rescale else 0.0,
                rescale_hi=float(rescale[1]) if rescale else 1.0,
            )
        elif vec_rows is not None:
            # batched-hybrid tail: vector matmul + min-max fusion + OMC +
            # top-k fused into one dispatch (ops/hybrid.py)
            from ..ops.hybrid import hybrid_finalize_topk

            matrix, row_doc, row_valid = vec_rows
            sims = np.asarray(similarities, np.float32)
            vals, idx, counts = hybrid_finalize_topk(
                scores, matched, jnp.asarray(thr),
                matrix, row_doc, row_valid,
                jnp.asarray(np.asarray(queries, np.float32)),
                jnp.asarray(sims),
                mask_dev if has_masks else jnp.zeros((1, 1), bool),
                omc_dev if has_omc else jnp.ones((1,), jnp.float32),
                cap=capb, k=kb, has_mask=has_masks, has_omc=has_omc,
                has_rescale=rescale is not None,
                rescale_lo=float(rescale[0]) if rescale else 0.0,
                rescale_hi=float(rescale[1]) if rescale else 1.0,
            )
        else:
            vals, idx, counts = finalize_topk(
                scores, matched, jnp.asarray(thr), omc_dev, k=kb
            )
        return (
            np.asarray(vals[:, :k]),
            np.asarray(idx[:, :k]),
            np.asarray(counts[:B]),
        )
