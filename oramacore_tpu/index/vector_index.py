"""Per-field vector storage: live host buffer + committed device matrix.

Replaces `oramacore_fields::embedding::EmbeddingStorage` (insert/delete/
search with similarity threshold + DocumentFilter; embedding_field.rs:
63-146). Multi-vector documents (chunked embeddings, op.rs:144) map to
multiple matrix rows sharing a doc id; a doc's score is the max over its
rows (and over multiple query target vectors).

Flat exact search = fused bf16 matmul + top-k (ops/vector.py). An IVF
clustered mode activates automatically past a row-count threshold:
k-means centroids are trained at commit time, rows are grouped into
padded cluster blocks, and queries scan only the top-nprobe clusters.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bm25 import round_up_pow2
from ..ops.vector import (
    flat_cosine_topk,
    flat_cosine_topk_filtered,
    ivf_gather_topk,
    l2_normalize,
    top_centroids,
)

# Measured on TPU v5e: flat exact (one MXU matmul) beats IVF probe scans
# up to ~1M rows; clustered pruning pays off past a few million rows.
IVF_MIN_ROWS = 2_000_000
IVF_NPROBE = 32


@dataclass
class VectorIndexConfig:
    dim: int
    model: str = "builtin-minihash-384"
    score_rescale: Optional[Tuple[float, float]] = None  # e.g. E5 (0.7, 1.0)


class VectorIndex:
    _UIDS = __import__("itertools").count(1)

    def __init__(self, config: VectorIndexConfig):
        # process-unique id: executor device caches key on (uid, _gen) —
        # generation alone collides across index objects (every index
        # starts at 0; executors are shared across indexes/collections)
        self.uid = next(VectorIndex._UIDS)
        self.config = config
        self._live_rows: List[np.ndarray] = []
        self._live_docs: List[int] = []
        # committed rows live in a capacity-doubling backing buffer so
        # thresholded commits during a long ingest append in amortized
        # O(live) instead of reconcatenating O(corpus) per commit (the
        # string index's segmented-commit principle applied here);
        # _committed_matrix/_committed_docs below stay exact-length views
        self._buf_matrix = np.zeros((0, config.dim), np.float32)
        self._buf_docs = np.zeros(0, np.int32)
        self._n_committed = 0
        # device slab cache
        self._dev: Optional[Tuple] = None
        self._dev_gen = -1
        self._gen = 0
        # IVF state (built at commit when large enough)
        self._ivf: Optional[dict] = None

    # exact-length views over the backing buffer: every consumer
    # (engine partitioners, snapshots, IVF build) sees precisely the
    # committed rows; assignment replaces the buffer slack-free
    @property
    def _committed_matrix(self) -> np.ndarray:
        return self._buf_matrix[: self._n_committed]

    @_committed_matrix.setter
    def _committed_matrix(self, arr: np.ndarray) -> None:
        self._buf_matrix = np.ascontiguousarray(arr, np.float32)
        self._n_committed = len(self._buf_matrix)

    @property
    def _committed_docs(self) -> np.ndarray:
        return self._buf_docs[: self._n_committed]

    @_committed_docs.setter
    def _committed_docs(self, arr: np.ndarray) -> None:
        self._buf_docs = np.ascontiguousarray(arr, np.int32)

    # ------------------------------------------------------------------
    # Write path
    # ------------------------------------------------------------------

    def insert(self, doc_id: int, vectors: Sequence[np.ndarray]) -> None:
        for v in vectors:
            v = np.asarray(v, np.float32).reshape(-1)
            if v.shape[0] != self.config.dim:
                raise ValueError(
                    f"dim mismatch: got {v.shape[0]}, want {self.config.dim}"
                )
            self._live_rows.append(l2_normalize(v))
            self._live_docs.append(doc_id)
        self._gen += 1

    def delete_doc_live(self, doc_id: int) -> None:
        keep = [i for i, d in enumerate(self._live_docs) if d != doc_id]
        if len(keep) != len(self._live_docs):
            self._live_rows = [self._live_rows[i] for i in keep]
            self._live_docs = [self._live_docs[i] for i in keep]
            self._gen += 1

    def n_rows(self) -> int:
        return len(self._committed_docs) + len(self._live_docs)

    def commit(self, deleted: Optional[set] = None) -> None:
        m = len(self._live_docs)
        n = self._n_committed
        # does any delete actually touch this field's rows?
        drop_c = drop_l = None
        live_docs = (
            np.asarray(self._live_docs, np.int32) if m else None
        )
        if deleted:
            dd = np.fromiter(deleted, np.int32, len(deleted))
            if n:
                drop_c = np.isin(self._buf_docs[:n], dd)
                if not drop_c.any():
                    drop_c = None
            if m:
                drop_l = np.isin(live_docs, dd)
                if not drop_l.any():
                    drop_l = None
        if not m and drop_c is None:
            return  # nothing to fold in: committed state + IVF stand
        if drop_c is not None or drop_l is not None:
            # rebuild without the deleted rows (delete/merge path)
            parts_m = [
                self._buf_matrix[:n][~drop_c] if drop_c is not None
                else self._buf_matrix[:n]
            ]
            parts_d = [
                self._buf_docs[:n][~drop_c] if drop_c is not None
                else self._buf_docs[:n]
            ]
            if m:
                lm = np.stack(self._live_rows)
                if drop_l is not None:
                    lm, live_docs = lm[~drop_l], live_docs[~drop_l]
                parts_m.append(lm)
                parts_d.append(live_docs)
            self._committed_matrix = np.concatenate(parts_m)
            self._committed_docs = np.concatenate(parts_d)
        else:
            # append-only fast path: amortized O(live) per commit
            need = n + m
            if need > len(self._buf_docs):
                cap = max(need, 2 * len(self._buf_docs), 1024)
                nm = np.zeros((cap, self.config.dim), np.float32)
                nm[:n] = self._buf_matrix[:n]
                nd = np.zeros(cap, np.int32)
                nd[:n] = self._buf_docs[:n]
                self._buf_matrix, self._buf_docs = nm, nd
            self._buf_matrix[n:need] = np.stack(self._live_rows)
            self._buf_docs[n:need] = live_docs
            self._n_committed = need
        self._live_rows, self._live_docs = [], []
        self._gen += 1
        self._ivf = None
        if self._n_committed >= IVF_MIN_ROWS:
            self._build_ivf()

    # ------------------------------------------------------------------
    # IVF build (host k-means on a sample, device assignment)
    # ------------------------------------------------------------------

    def _build_ivf(self, n_centroids: Optional[int] = None) -> None:
        """Large-corpus layout: per-row symmetric INT8 quantization (4x
        the rows per GiB of HBM — a 10M x 768 corpus is 7.5 GiB int8 vs
        30 GiB f32, which does not fit a 16 GiB chip) + rows PACKED by
        k-means cluster with SUB-BLOCK probe units: a cluster larger
        than the window splits into several units sharing its centroid,
        so load imbalance costs neither padding memory nor spill scans
        (window overrun into the next cluster just scores extra valid
        candidates). Measured at 10.5M x 768 (benches/RESULTS.md):
        recall@10 0.977 at 4.7k QPS with nprobe=8."""
        mat = self._committed_matrix
        n = len(mat)
        dim = mat.shape[1]
        c = n_centroids or max(64, int(np.sqrt(n)))
        rng = np.random.default_rng(0)
        sample_idx = rng.choice(n, min(n, c * 64), replace=False)
        sample = np.ascontiguousarray(mat[sample_idx])
        centroids = sample[rng.choice(len(sample), c, replace=False)].copy()
        # Lloyd iterations with chunked one-hot matmuls on the MXU
        # (segment_sum lowers to scatter-add — pathologically slow on TPU)
        sample_dev = jnp.asarray(sample)
        cen = jnp.asarray(centroids)
        lb = min(16384, len(sample))
        ns = (len(sample) // lb) * lb

        @jax.jit
        def lloyd(sample_dev, cen):
            def blk(carry, i):
                sums, cnt = carry
                rows = jax.lax.dynamic_slice(sample_dev, (i * lb, 0), (lb, dim))
                a = jnp.argmax(
                    jnp.dot(rows.astype(jnp.bfloat16),
                            cen.astype(jnp.bfloat16).T,
                            preferred_element_type=jnp.float32),
                    axis=1,
                )
                oh = jax.nn.one_hot(a, c, dtype=jnp.bfloat16)
                sums = sums + jnp.dot(
                    oh.T, rows.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )
                cnt = cnt + jnp.sum(oh.astype(jnp.float32), axis=0)
                return (sums, cnt), None

            (sums, cnt), _ = jax.lax.scan(
                blk,
                (jnp.zeros((c, dim), jnp.float32), jnp.zeros((c,), jnp.float32)),
                jnp.arange(max(ns // lb, 1)),
            )
            new = jnp.where(cnt[:, None] > 0, sums / jnp.maximum(cnt[:, None], 1.0), cen)
            return new / jnp.maximum(
                jnp.linalg.norm(new, axis=1, keepdims=True), 1e-9
            )

        for _ in range(8):
            cen = lloyd(sample_dev, cen)
        centroids = np.asarray(cen)

        # assign ALL rows (device matmul, chunked)
        assign = np.empty(n, np.int32)
        step = 262144
        cen_dev = jnp.asarray(centroids, jnp.bfloat16)
        for s in range(0, n, step):
            block_rows = jnp.asarray(mat[s:s + step], jnp.bfloat16)
            assign[s:s + step] = np.asarray(
                jnp.argmax(
                    jnp.dot(block_rows, cen_dev.T,
                            preferred_element_type=jnp.float32),
                    axis=1,
                )
            )

        # pack rows by cluster; quantize int8 per row (vectorized host)
        order = np.argsort(assign, kind="stable")
        packed = np.ascontiguousarray(mat[order])
        amax = np.abs(packed).max(axis=1)
        scales = (np.maximum(amax, 1e-12) / 127.0).astype(np.float32)
        q = np.clip(
            np.round(packed / scales[:, None]), -127, 127
        ).astype(np.int8)
        docs = self._committed_docs[order].astype(np.int32)

        # probe units: cluster sub-blocks of `window` rows sharing the
        # cluster centroid — big clusters get proportionally many probes
        counts = np.bincount(assign, minlength=c)
        starts = np.zeros(c + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        window = int(min(
            2048, round_up_pow2(max(int(2 * max(counts.mean(), 1)), 128), 128)
        ))
        window = min(window, int(round_up_pow2(max(n // 2, 1), 1)))
        window = max(min(window, n), 1)
        unit_starts, unit_cluster = [], []
        for ci in range(c):
            cnt = int(counts[ci])
            st = int(starts[ci])
            for j in range(0, max(cnt, 0), window):
                unit_starts.append(st + j)
                unit_cluster.append(ci)
        self._ivf = {
            "q": q,
            "scales": scales,
            "docs": docs,
            "unit_cen": np.ascontiguousarray(centroids[unit_cluster]),
            "unit_starts": np.asarray(unit_starts, np.int32),
            "window": window,
            # packed row -> original committed row, for the f32 rerank
            "perm": order.astype(np.int64),
        }
        self._gen += 1

    # ------------------------------------------------------------------
    # Search
    # ------------------------------------------------------------------

    def _device_slab(self):
        if self._dev_gen != self._gen:
            if self._ivf is not None and not self._live_rows:
                # int8 packed layout: quantized rows + per-row scales +
                # doc ids (for filter pushdown) + probe-unit table
                self._dev = (
                    jnp.asarray(self._ivf["q"]),          # int8[N, D]
                    jnp.asarray(self._ivf["docs"]),       # int32[N]
                    jnp.asarray(self._ivf["scales"]),     # f32[N]
                    jnp.asarray(self._ivf["unit_cen"], jnp.float32),
                    jnp.asarray(self._ivf["unit_starts"]),
                    True,
                    None,
                )
            else:
                parts_m = [self._committed_matrix]
                parts_d = [self._committed_docs]
                if self._live_rows:
                    parts_m.append(np.stack(self._live_rows))
                    parts_d.append(np.asarray(self._live_docs, np.int32))
                matrix = np.concatenate(parts_m)
                docs = np.concatenate(parts_d)
                n = len(matrix)
                chunk = self._chunk_for(n)
                n_pad = max(chunk, round_up_pow2(max(n, 1), chunk))
                pm = np.zeros((n_pad, self.config.dim), np.float32)
                pm[:n] = matrix
                pd = np.zeros(n_pad, np.int32)
                pd[:n] = docs
                valid = np.zeros(n_pad, bool)
                valid[:n] = True
                self._dev = (
                    jnp.asarray(pm, jnp.bfloat16),
                    jnp.asarray(pd),
                    jnp.asarray(valid),
                    None,
                    None,
                    False,
                    None,
                )
            self._dev_gen = self._gen
        return self._dev

    def flat_device_rows(self):
        """(matrix bf16[N, dim], row_doc i32[N], row_valid bool[N]) device
        arrays for the fused hybrid path, or None in IVF mode (the fused
        kernel scans flat rows; IVF-sized indexes use the probe path)."""
        (matrix, row_doc, row_valid, _c, _s, is_ivf, _sp) = self._device_slab()
        if is_ivf:
            return None
        return matrix, row_doc, row_valid

    def int8_device_rows(self):
        """Int8/IVF layout for the fused hybrid path at the >=2M-row
        tier: (mat_i8, scales, row_doc, unit_cen, unit_starts, window,
        nprobe), or None when not in IVF mode."""
        (mat, row_doc, scales, centroids, starts, is_ivf,
         _sp) = self._device_slab()
        if not is_ivf:
            return None
        nprobe = min(IVF_NPROBE, int(centroids.shape[0]))
        return (
            mat, scales, row_doc, centroids, starts,
            int(self._ivf["window"]), nprobe,
        )

    def int8_doc2row(self, cap: int):
        """doc id -> packed int8 row (device int32[cap+1], -1 = no
        vector) for the pruned hybrid's candidate rescore. Multi-vector
        docs keep ONE representative row (last write wins); rows the IVF
        probe nominates are folded back exactly in the kernel
        (ops/pruned.py pruned_hybrid_topk_int8 fold_probe)."""
        if self._ivf is None:
            return None
        key = (self._gen, cap)
        cached = getattr(self, "_doc2row_dev", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        arr = np.full(cap + 1, -1, np.int32)
        docs = self._ivf["docs"]
        sel = docs < cap
        arr[docs[sel]] = np.arange(len(docs), dtype=np.int32)[sel]
        dev = jnp.asarray(arr)
        self._doc2row_dev = (key, dev)
        return dev

    @staticmethod
    def _chunk_for(n: int) -> int:
        if n <= 8192:
            return 1024
        if n <= 262144:
            return 16384
        return 65536

    def _topk_rows(self, q: np.ndarray, limit: int,
                   filter_mask: Optional[np.ndarray]):
        """One batched device dispatch over already-normalized query rows
        q f32[B, dim]: returns (vals f32[B, k] — f32-reranked in IVF
        mode, rows i32[B, k], row_doc host array, spill_hits or None)."""
        (matrix, row_doc, row_valid, centroids, starts, is_ivf,
         spill_dev) = self._device_slab()
        k = min(
            round_up_pow2(max(limit * 4, 16), 16),
            int(matrix.shape[0]),
        )

        if is_ivf:
            # int8 packed path: filters push down by zeroing the per-row
            # scale (scale 0 == invalid row in the kernel)
            from ..ops.vector import ivf_int8_topk

            scales = row_valid  # f32[N] in the int8 layout
            if filter_mask is not None:
                mask_rows = jnp.take(
                    jnp.asarray(filter_mask),
                    jnp.clip(row_doc, 0, len(filter_mask) - 1),
                )
                scales = jnp.where(mask_rows, scales, 0.0)
            nprobe = min(IVF_NPROBE, int(centroids.shape[0]))
            vals, rows = ivf_int8_topk(
                jnp.asarray(q), matrix, scales, centroids, starts,
                k=k, nprobe=nprobe, window=self._ivf["window"],
            )
        else:
            chunk = int(matrix.shape[0]) if int(matrix.shape[0]) < 1024 else self._chunk_for(int(matrix.shape[0]))
            if int(matrix.shape[0]) % chunk:
                chunk = int(matrix.shape[0])
            if filter_mask is not None:
                vals, rows = flat_cosine_topk_filtered(
                    jnp.asarray(q), matrix, row_doc,
                    jnp.asarray(filter_mask), row_valid, k=k, chunk=chunk,
                )
            else:
                vals, rows = flat_cosine_topk(
                    jnp.asarray(q), matrix, row_valid, k=k, chunk=chunk
                )

        vals = np.array(vals)  # writable copy (rerank mutates)
        rows = np.asarray(rows)
        row_doc_h = np.asarray(row_doc)

        if is_ivf:
            # f32 RERANK of the candidates: int8 quantization only picks
            # the candidate set (4x over-retrieval); final scores come
            # from the original committed f32 rows, so ranking quality
            # matches the exact path (recall ceiling was 0.9785 on raw
            # int8 scores at 10M — see benches/RESULTS.md)
            perm = self._ivf["perm"]
            mat_h = self._committed_matrix
            for bi in range(vals.shape[0]):
                # never resurrect filtered-out / padding slots (-inf)
                valid = (rows[bi] >= 0) & (vals[bi] > -1e29)
                if not valid.any():
                    continue
                orig = perm[rows[bi][valid]]
                exact = mat_h[orig] @ q[bi]
                vals[bi][valid] = exact.astype(np.float32)

        spill_hits = None
        if is_ivf and spill_dev is not None:
            # overflow rows of oversized clusters: scanned exactly
            sp_m, sp_d, sp_v = spill_dev
            sv = sp_v
            if filter_mask is not None:
                sv = sp_v & jnp.take(
                    jnp.asarray(filter_mask),
                    jnp.clip(sp_d, 0, len(filter_mask) - 1),
                )
            s_vals, s_rows = flat_cosine_topk(
                jnp.asarray(q), sp_m, sv, k=min(k, int(sp_m.shape[0])),
                chunk=int(sp_m.shape[0]) if int(sp_m.shape[0]) < 65536
                else 65536,
            )
            spill_hits = (np.asarray(s_vals), np.asarray(s_rows),
                          np.asarray(sp_d))
        return vals, rows, row_doc_h, spill_hits

    def _absorb_rows(self, out: Dict[int, float], vals_b, rows_b,
                     doc_lookup, similarity: float) -> None:
        rescale = self.config.score_rescale
        for vi in range(len(vals_b)):
            s = float(vals_b[vi])
            r = int(rows_b[vi])
            if r < 0 or s <= -1e29:
                continue
            if rescale is not None:
                lo, hi = rescale
                s = (s - lo) / (hi - lo)
                s = min(max(s, 0.0), 1.0)
            if s < similarity:
                continue
            d = int(doc_lookup[r])
            if s > out.get(d, -1.0):
                out[d] = s

    def search(
        self,
        targets: Sequence[np.ndarray],   # query vectors (multi-chunk query)
        limit: int,
        similarity: float,
        filter_mask: Optional[np.ndarray] = None,  # bool[cap] over doc ids
        cap: Optional[int] = None,
    ) -> Dict[int, float]:
        """doc -> score (max over rows & targets), score >= similarity."""
        if self.n_rows() == 0 or not targets:
            return {}
        q = np.stack([
            l2_normalize(np.asarray(t, np.float32).reshape(-1))
            for t in targets
        ])
        vals, rows, row_doc_h, spill_hits = self._topk_rows(
            q, limit, filter_mask
        )
        out: Dict[int, float] = {}
        for bi in range(vals.shape[0]):
            self._absorb_rows(out, vals[bi], rows[bi], row_doc_h, similarity)
        if spill_hits is not None:
            s_vals, s_rows, sp_d = spill_hits
            for bi in range(s_vals.shape[0]):
                self._absorb_rows(out, s_vals[bi], s_rows[bi], sp_d, similarity)
        return out

    def search_many(
        self,
        queries: np.ndarray,             # f32[B, dim], one vector per query
        limit: int,
        similarities: Sequence[float],
    ) -> List[Dict[int, float]]:
        """B independent single-vector queries in ONE device dispatch
        (the batched-search API tier; no per-query filters here — the
        caller falls back per-query when filters are present)."""
        B = len(queries)
        if self.n_rows() == 0 or B == 0:
            return [{} for _ in range(B)]
        q = l2_normalize(np.asarray(queries, np.float32))
        vals, rows, row_doc_h, spill_hits = self._topk_rows(q, limit, None)
        outs: List[Dict[int, float]] = []
        for bi in range(B):
            out: Dict[int, float] = {}
            self._absorb_rows(
                out, vals[bi], rows[bi], row_doc_h, similarities[bi]
            )
            if spill_hits is not None:
                s_vals, s_rows, sp_d = spill_hits
                self._absorb_rows(
                    out, s_vals[bi], s_rows[bi], sp_d, similarities[bi]
                )
            outs.append(out)
        return outs


# ---------------------------------------------------------------------------
# Persistence
# ---------------------------------------------------------------------------

def save_vector_index(vidx: VectorIndex, path_prefix: str) -> None:
    import os

    os.makedirs(os.path.dirname(path_prefix) or ".", exist_ok=True)
    from ..storage.files import savez_snapshot

    tmp = path_prefix + ".npz.tmp"
    with open(tmp, "wb") as fh:
        savez_snapshot(
            fh,
            matrix=vidx._committed_matrix,
            docs=vidx._committed_docs,
            dim=np.asarray([vidx.config.dim]),
        )
    os.replace(tmp, path_prefix + ".npz")


def load_vector_index(path_prefix: str, config: VectorIndexConfig) -> VectorIndex:
    import os

    vidx = VectorIndex(config)
    p = path_prefix + ".npz"
    if os.path.exists(p):
        with np.load(p) as arrays:
            vidx._committed_matrix = arrays["matrix"]
            vidx._committed_docs = arrays["docs"]
        vidx._gen += 1
        if len(vidx._committed_docs) >= IVF_MIN_ROWS:
            vidx._build_ivf()
    return vidx
