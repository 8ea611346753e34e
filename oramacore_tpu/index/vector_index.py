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
    def __init__(self, config: VectorIndexConfig):
        self.config = config
        self._live_rows: List[np.ndarray] = []
        self._live_docs: List[int] = []
        self._committed_matrix = np.zeros((0, config.dim), np.float32)
        self._committed_docs = np.zeros(0, np.int32)
        # device slab cache
        self._dev: Optional[Tuple] = None
        self._dev_gen = -1
        self._gen = 0
        # IVF state (built at commit when large enough)
        self._ivf: Optional[dict] = None

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
        parts_m = [self._committed_matrix]
        parts_d = [self._committed_docs]
        if self._live_rows:
            parts_m.append(np.stack(self._live_rows))
            parts_d.append(np.asarray(self._live_docs, np.int32))
        matrix = np.concatenate(parts_m)
        docs = np.concatenate(parts_d)
        if deleted:
            keep = ~np.isin(docs, np.fromiter(deleted, np.int32, len(deleted)))
            matrix, docs = matrix[keep], docs[keep]
        self._committed_matrix = np.ascontiguousarray(matrix)
        self._committed_docs = np.ascontiguousarray(docs)
        self._live_rows, self._live_docs = [], []
        self._gen += 1
        self._ivf = None
        if len(docs) >= IVF_MIN_ROWS:
            self._build_ivf()

    # ------------------------------------------------------------------
    # IVF build (host k-means on a sample, device assignment)
    # ------------------------------------------------------------------

    def _build_ivf(self, n_centroids: Optional[int] = None) -> None:
        mat = self._committed_matrix
        n = len(mat)
        c = n_centroids or max(64, int(np.sqrt(n)))
        rng = np.random.default_rng(0)
        # k-means++ style init on a sample, few Lloyd iterations on device
        sample = mat[rng.choice(n, min(n, c * 64), replace=False)]
        centroids = sample[rng.choice(len(sample), c, replace=False)].copy()
        mat_dev = jnp.asarray(mat, jnp.bfloat16)
        for _ in range(8):
            cen_dev = jnp.asarray(centroids, jnp.bfloat16)
            assign = np.asarray(
                jnp.argmax(
                    jnp.dot(mat_dev, cen_dev.T, preferred_element_type=jnp.float32),
                    axis=1,
                )
            )
            sums = np.zeros((c, mat.shape[1]), np.float32)
            np.add.at(sums, assign, mat)
            counts = np.bincount(assign, minlength=c).astype(np.float32)
            nonempty = counts > 0
            centroids[nonempty] = l2_normalize(
                sums[nonempty] / counts[nonempty, None]
            )
        # group rows into padded cluster blocks. Cluster sizes are
        # imbalanced (up to ~4x the mean), so padding every block to the
        # max would multiply HBM/upload cost; instead blocks are bounded
        # at ~2x the mean and overflow rows SPILL into a flat tail matrix
        # that every query scans exactly (bounded extra matmul work,
        # zero recall loss).
        order = np.argsort(assign, kind="stable")
        counts = np.bincount(assign, minlength=c)
        mean = max(1.0, float(counts.mean()))
        block = int(round_up_pow2(max(128, int(2 * mean)), 128))
        padded = np.zeros((c * block, mat.shape[1]), np.float32)
        padded_docs = np.zeros(c * block, np.int32)
        valid = np.zeros(c * block, bool)
        starts = np.arange(c, dtype=np.int32) * block
        spill_rows = []
        pos = 0
        for ci in range(c):
            rows = order[pos : pos + counts[ci]]
            pos += counts[ci]
            head, tail = rows[:block], rows[block:]
            s = ci * block
            padded[s : s + len(head)] = mat[head]
            padded_docs[s : s + len(head)] = self._committed_docs[head]
            valid[s : s + len(head)] = True
            if len(tail):
                spill_rows.append(tail)
        if spill_rows:
            spill_idx = np.concatenate(spill_rows)
            spill_matrix = np.ascontiguousarray(mat[spill_idx])
            spill_docs = self._committed_docs[spill_idx].astype(np.int32)
        else:
            spill_matrix = np.zeros((0, mat.shape[1]), np.float32)
            spill_docs = np.zeros(0, np.int32)
        self._ivf = {
            "centroids": centroids,
            "matrix": padded,
            "docs": padded_docs,
            "valid": valid,
            "starts": starts,
            "block": block,
            "spill_matrix": spill_matrix,
            "spill_docs": spill_docs,
        }
        self._gen += 1

    # ------------------------------------------------------------------
    # Search
    # ------------------------------------------------------------------

    def _device_slab(self):
        if self._dev_gen != self._gen:
            if self._ivf is not None and not self._live_rows:
                matrix = self._ivf["matrix"]
                docs = self._ivf["docs"]
                valid = self._ivf["valid"]
                spill = self._ivf["spill_matrix"]
                n_sp = len(spill)
                if n_sp:
                    chunk = self._chunk_for(n_sp)
                    sp_pad = max(chunk, round_up_pow2(max(n_sp, 1), chunk))
                    spm = np.zeros((sp_pad, self.config.dim), np.float32)
                    spm[:n_sp] = spill
                    spd = np.zeros(sp_pad, np.int32)
                    spd[:n_sp] = self._ivf["spill_docs"]
                    spv = np.zeros(sp_pad, bool)
                    spv[:n_sp] = True
                    spill_dev = (
                        jnp.asarray(spm, jnp.bfloat16), jnp.asarray(spd),
                        jnp.asarray(spv),
                    )
                else:
                    spill_dev = None
                self._dev = (
                    jnp.asarray(matrix, jnp.bfloat16),
                    jnp.asarray(docs, jnp.int32),
                    jnp.asarray(valid),
                    jnp.asarray(self._ivf["centroids"], jnp.float32),
                    jnp.asarray(self._ivf["starts"], jnp.int32),
                    True,
                    spill_dev,
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

    @staticmethod
    def _chunk_for(n: int) -> int:
        if n <= 8192:
            return 1024
        if n <= 262144:
            return 16384
        return 65536

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
        (matrix, row_doc, row_valid, centroids, starts, is_ivf,
         spill_dev) = self._device_slab()
        q = np.stack([l2_normalize(np.asarray(t, np.float32).reshape(-1)) for t in targets])
        k = min(
            round_up_pow2(max(limit * 4, 16), 16),
            int(matrix.shape[0]),
        )

        if is_ivf:
            _, probes = top_centroids(
                jnp.asarray(q), centroids, nprobe=min(IVF_NPROBE, len(np.asarray(starts)))
            )
            vals, rows = ivf_gather_topk(
                jnp.asarray(q), matrix, row_valid
                if filter_mask is None
                else row_valid
                & jnp.take(
                    jnp.asarray(filter_mask),
                    jnp.clip(row_doc, 0, len(filter_mask) - 1),
                ),
                starts, probes, k=k,
                rows_per_probe=self._ivf["block"],
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

        vals = np.asarray(vals)
        rows = np.asarray(rows)
        row_doc_h = np.asarray(row_doc)

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
        rescale = self.config.score_rescale
        out: Dict[int, float] = {}

        def absorb(vals_a, rows_a, doc_lookup):
            for bi in range(vals_a.shape[0]):
                for vi in range(vals_a.shape[1]):
                    s = float(vals_a[bi, vi])
                    r = int(rows_a[bi, vi])
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

        absorb(vals, rows, row_doc_h)
        if spill_hits is not None:
            absorb(*spill_hits)
        return out


# ---------------------------------------------------------------------------
# Persistence
# ---------------------------------------------------------------------------

def save_vector_index(vidx: VectorIndex, path_prefix: str) -> None:
    import os

    os.makedirs(os.path.dirname(path_prefix) or ".", exist_ok=True)
    tmp = path_prefix + ".npz.tmp"
    with open(tmp, "wb") as fh:
        np.savez_compressed(
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
