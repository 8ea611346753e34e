"""Doc-id-sharded ENGINE search over a device mesh.

This is the production integration of the sharded step (parallel/__init__
holds the standalone demo + driver dryrun): a real committed StringIndex
is partitioned by doc id across mesh devices at slab-build time, and the
fused fulltext path (scoring + threshold + OMC + top-k + exact counts)
executes as ONE shard_map dispatch with XLA collectives over ICI:

    shard assignment  doc -> shard = doc % D, local slot = doc // D
                      (mod-sharding balances load as doc ids grow;
                      global id reconstructs as slot * D + shard)
    per chip          BM25F over the local postings shard (every posting
                      of a doc lives in its shard, so TF/length terms are
                      shard-local)
    collectives       psum of per-token df (global IDF), psum of match
                      counts, all_gather of per-shard top-k + final top-k

The reference scales reads by replicating whole indexes to N reader
processes (SURVEY §2.9, lib.rs:234-307); this axis — one logical index
spread over chips — has no reference counterpart and is the TPU-native
scale-out story (SURVEY §5.8). Shard layout is DERIVED from the committed
slab (vectorized O(P) partition at build), so snapshots stay
layout-independent: the same on-disk index loads on any mesh size.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..index.string_index import QueryPlan, StringIndex
from ..ops.bm25 import MAX_RANGE_LEN, bm25_score_batch, round_up_pow2


def build_engine_mesh(n_shards: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_shards, (
        f"sharded_shards={n_shards} but only {len(devices)} devices"
    )
    return Mesh(np.asarray(devices[:n_shards]), axis_names=("d",))


class ShardedStringExec:
    """Doc-sharded executor with the same search_topk contract as
    StringSearchTopK: (vals f32[B,k], GLOBAL ids i32[B,k], counts i32[B])."""

    # a sharded executor may serve several indexes (multi-index batch
    # loops); keep a couple of sharded slabs resident instead of
    # re-partitioning per index per batch
    MAX_CACHED = 2

    def __init__(self, mesh: Mesh):
        from ..index.search_exec import DeviceLru

        self.mesh = mesh
        self.D = int(mesh.shape["d"])
        # (uid, gen) -> (dev slab 4-tuple, boundaries, bprefix).
        # BOUNDARY-indexed shard prefix (VERDICT r2 weak #4: a dense
        # (D, P+1) prefix matrix cost O(D*P) host RAM — ~4.3 GB at the
        # 134M-posting tier). Query plans only ever reference stored
        # range boundaries (+ their MAX_RANGE_LEN split grid), so the
        # prefix needs values at those ~#terms positions only:
        # bprefix[s, i] = # postings with shard==s before boundary i.
        self._slabs = DeviceLru(self.MAX_CACHED, group=lambda k: k[0])
        # vector layouts: flat (uid, gen) / int8 ("i8", uid, gen)
        self._vecs = DeviceLru(
            2 * self.MAX_CACHED,
            group=lambda k: (k[0], k[1]) if isinstance(k[0], str)
            else ("flat", k[0]),
        )
        self._steps: Dict[Tuple, object] = {}
        self._lock = threading.Lock()
        self._omc_dev: Optional[Tuple[int, int, object]] = None
        # device-resident doc-sharded filter masks + sort columns keyed
        # by the caller (tombstone alive-masks are stable between
        # deletes, sort columns between mutations); ad-hoc where-masks
        # pass mask_key=None and re-partition per query. Group strips
        # the trailing version so stale versions purge on put.
        self._fmask_dev = DeviceLru(
            8,
            group=lambda k: (
                k[0][:-1] if isinstance(k[0], tuple) else k[0]
            ),
        )

    # ------------------------------------------------------------------
    # Sharded slab build (at commit / generation change)
    # ------------------------------------------------------------------

    def ensure_slab(self, index: StringIndex):
        """Partition + upload the index's slab (cached); returns
        (dev_slab_4tuple, boundaries, bprefix) for this index."""
        from ..index.search_exec import _MISS

        slab = index.slab()
        # (uid, generation): generation alone collides across index
        # objects when an executor outlives/serves several indexes
        gen = (index.uid, index.generation)
        cached = self._slabs.get(gen)
        if cached is not _MISS:
            return cached
        with self._lock:  # one thread partitions; others wait
            cached = self._slabs.get(gen)
            if cached is not _MISS:
                return cached
            p_doc, p_tf, p_etf, p_flen = slab
            D = self.D
            P_total = len(p_doc)
            shard = (p_doc.astype(np.int64) % D).astype(np.int32)
            counts = np.bincount(shard, minlength=D)
            # boundary set: every stored range start, the MAX_RANGE_LEN
            # split grid inside over-long ranges (plan_query splits at
            # that stride), and the slab end
            bset = {0, P_total}
            for rngs in index.all_range_lists():
                for (rs, rl) in rngs:
                    bset.add(rs)
                    off = MAX_RANGE_LEN
                    while off < rl:
                        bset.add(rs + off)
                        off += MAX_RANGE_LEN
                    bset.add(rs + rl)
            boundaries = np.fromiter(sorted(bset), np.int64, len(bset))
            # per-(shard, boundary-interval) posting counts -> prefix;
            # chunked so peak host memory stays O(chunk), not O(P)
            bcounts = np.zeros((D, len(boundaries)), np.int64)
            CH_ = 8 * 1024 * 1024
            for s0 in range(0, P_total, CH_):
                e0 = min(s0 + CH_, P_total)
                bid = np.searchsorted(
                    boundaries, np.arange(s0, e0), side="right"
                ) - 1
                np.add.at(bcounts, (shard[s0:e0], bid), 1)
            bprefix = np.zeros((D, len(boundaries)), np.int64)
            np.cumsum(bcounts[:, :-1], axis=1, out=bprefix[:, 1:])
            max_p = int(counts.max()) if P_total else 1
            Pb = round_up_pow2(max(max_p, 1), 1024) + MAX_RANGE_LEN
            docs_l = np.zeros((D, Pb), np.int32)
            tf_l = np.zeros((D, Pb), np.float32)
            etf_l = np.zeros((D, Pb), np.float32)
            flen_l = np.ones((D, Pb), np.float32)
            for s in range(D):
                sel = shard == s
                n = int(counts[s])
                docs_l[s, :n] = (p_doc[sel].astype(np.int64) // D).astype(
                    np.int32
                )
                tf_l[s, :n] = p_tf[sel]
                etf_l[s, :n] = p_etf[sel]
                flen_l[s, :n] = p_flen[sel]
            sharding = NamedSharding(self.mesh, P("d", None))
            dev = tuple(
                jax.device_put(a, sharding)
                for a in (docs_l, tf_l, etf_l, flen_l)
            )
            return self._slabs.put(gen, (dev, boundaries, bprefix))

    @staticmethod
    def _shard_ranges_on(boundaries, bprefix, D,
                         starts: np.ndarray, lens: np.ndarray):
        """Map global (B, T, NR) ranges onto per-shard local sub-ranges
        -> (D, B, T, NR) starts/lens. Plan offsets must land on stored
        boundaries (range starts/ends + the MAX_RANGE_LEN split grid) —
        a non-boundary offset (e.g. an impact_cap truncation) raises;
        callers disable impact_cap on the mesh."""
        shape = starts.shape
        st = starts.reshape(-1).astype(np.int64)
        en = st + lens.reshape(-1).astype(np.int64)
        bi = np.searchsorted(boundaries, st)
        be = np.searchsorted(boundaries, en)
        if not (
            np.all(np.take(boundaries, np.minimum(
                bi, len(boundaries) - 1)) == st)
            and np.all(np.take(boundaries, np.minimum(
                be, len(boundaries) - 1)) == en)
        ):
            raise ValueError(
                "sharded plan offsets must align to stored range "
                "boundaries (is impact_cap enabled on a mesh?)"
            )
        s_st = bprefix[:, bi]                        # (D, B*T*NR)
        s_ln = bprefix[:, be] - s_st
        return (
            s_st.reshape((D,) + shape).astype(np.int32),
            s_ln.reshape((D,) + shape).astype(np.int32),
        )

    # ------------------------------------------------------------------
    # Compiled sharded step (cached per static-shape bucket)
    # ------------------------------------------------------------------

    def _get_step(self, *, lr, cap_l, k, exact, has_mask, has_omc,
                  with_bitmap=False):
        key = (lr, cap_l, k, exact, has_mask, has_omc, with_bitmap)
        step = self._steps.get(key)
        if step is not None:
            return step
        mesh, D = self.mesh, self.D

        def shard_fn(p_doc, p_tf, p_etf, p_flen, starts, lens,
                     weights, field_b, avg, n_docs, thr, mask, omc):
            B = weights.shape[0]
            m = mask[0] if has_mask else jnp.ones((B, cap_l), bool)
            scores, matched = bm25_score_batch(
                p_doc[0], p_tf[0], p_etf[0], p_flen[0],
                starts[0], lens[0], weights, field_b, avg, n_docs, m,
                lr=lr, exact=exact, cap=cap_l, axis_name="d",
            )
            s = scores * omc[0][None, :] if has_omc else scores
            keep = (matched >= thr[:, None]) & (scores > 0.0)
            counts = jax.lax.psum(
                jnp.sum(keep, axis=1).astype(jnp.int32), "d"
            )
            s = jnp.where(keep, s, -jnp.inf)
            local_vals, local_idx = jax.lax.top_k(s, k)
            sid = jax.lax.axis_index("d").astype(jnp.int32)
            local_ids = local_idx * D + sid          # global doc ids
            all_vals = jax.lax.all_gather(local_vals, "d", axis=1)
            all_ids = jax.lax.all_gather(local_ids, "d", axis=1)
            flat_vals = all_vals.reshape(B, D * k)
            flat_ids = all_ids.reshape(B, D * k)
            vals, sel = jax.lax.top_k(flat_vals, k)
            ids = jnp.take_along_axis(flat_ids, sel, axis=1)
            if with_bitmap:
                # per-shard packed match bits, stacked on the lead axis;
                # the host reinterleaves doc d = slot * D + shard
                bits = jnp.packbits(keep, axis=1)[None]  # (1, B, cap_l/8)
                return vals, ids, counts, bits
            return vals, ids, counts

        out_specs = (P(None, None), P(None, None), P(None))
        if with_bitmap:
            out_specs = out_specs + (P("d", None, None),)
        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P("d", None), P("d", None), P("d", None), P("d", None),
                P("d", None, None, None), P("d", None, None, None),
                P(None, None, None), P(None, None, None),
                P(None, None, None), P(None), P(None),
                P("d", None, None) if has_mask else P(None, None),
                P("d", None) if has_omc else P(None),
            ),
            out_specs=out_specs,
            check_vma=False,
        )
        step = jax.jit(fn)
        self._steps[key] = step
        return step

    def _get_sorted_step(self, *, lr, cap_l, k, exact, has_mask,
                         has_omc, desc):
        key = ("sorted", lr, cap_l, k, exact, has_mask, has_omc, desc)
        step = self._steps.get(key)
        if step is not None:
            return step
        from ..ops.bm25 import NEG_F32

        mesh, D = self.mesh, self.D

        def shard_fn(p_doc, p_tf, p_etf, p_flen, starts, lens,
                     weights, field_b, avg, n_docs, thr, mask, omc,
                     svals):
            B = weights.shape[0]
            m = mask[0] if has_mask else jnp.ones((B, cap_l), bool)
            scores, matched = bm25_score_batch(
                p_doc[0], p_tf[0], p_etf[0], p_flen[0],
                starts[0], lens[0], weights, field_b, avg, n_docs, m,
                lr=lr, exact=exact, cap=cap_l, axis_name="d",
            )
            s = scores * omc[0][None, :] if has_omc else scores
            keep = (matched >= thr[:, None]) & (scores > 0.0)
            counts = jax.lax.psum(
                jnp.sum(keep, axis=1).astype(jnp.int32), "d"
            )
            sv = svals[0]
            have = ~jnp.isnan(sv)
            present = keep & have[None, :]
            key1 = jnp.where(
                present, sv[None, :] if desc else -sv[None, :], NEG_F32
            )
            v1, i1 = jax.lax.top_k(key1, k)
            sc1 = jnp.take_along_axis(s, i1, axis=1)
            sid = jax.lax.axis_index("d").astype(jnp.int32)
            g1 = i1 * D + sid
            # fieldless matched tail, ordered by GLOBAL doc id
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, cap_l), 1)
            gdoc = (iota * D + sid).astype(jnp.float32)
            key2 = jnp.where(keep & ~have[None, :], -gdoc, NEG_F32)
            v2, i2 = jax.lax.top_k(key2, k)
            sc2 = jnp.take_along_axis(s, i2, axis=1)
            g2 = i2 * D + sid
            gather = lambda a: jax.lax.all_gather(  # noqa: E731
                a, "d", axis=1
            ).reshape(B, D * k)
            return (gather(v1), gather(g1), gather(sc1),
                    gather(v2), gather(g2), gather(sc2), counts)

        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P("d", None), P("d", None), P("d", None), P("d", None),
                P("d", None, None, None), P("d", None, None, None),
                P(None, None, None), P(None, None, None),
                P(None, None, None), P(None), P(None),
                P("d", None, None) if has_mask else P(None, None),
                P("d", None) if has_omc else P(None),
                P("d", None),
            ),
            out_specs=(
                P(None, None), P(None, None), P(None, None),
                P(None, None), P(None, None), P(None, None), P(None),
            ),
            check_vma=False,
        )
        step = jax.jit(fn)
        self._steps[key] = step
        return step

    def _get_grouped_step(self, *, lr, cap_l, k, G, R, exact,
                          has_mask, has_omc):
        """Fused GROUP-BY over the mesh (r5, VERDICT r4 #5 mesh
        parity): each shard scores its doc slice (psum'd df), sorts it
        by (gid, -score, global doc) — the single-device sort kernel's
        key — slices its per-group first-R pages off the run starts,
        and the (B, G, D, R) gathered pages merge with one 2-key sort
        per group so the final order is (-score, doc asc) globally,
        identical to the host flow and the single-device kernel."""
        key = ("grouped", lr, cap_l, k, G, R, exact, has_mask, has_omc)
        step = self._steps.get(key)
        if step is not None:
            return step
        mesh, D = self.mesh, self.D

        def shard_fn(p_doc, p_tf, p_etf, p_flen, starts, lens,
                     weights, field_b, avg, n_docs, thr, mask, omc,
                     gid):
            B = weights.shape[0]
            m = mask[0] if has_mask else jnp.ones((B, cap_l), bool)
            scores, matched = bm25_score_batch(
                p_doc[0], p_tf[0], p_etf[0], p_flen[0],
                starts[0], lens[0], weights, field_b, avg, n_docs, m,
                lr=lr, exact=exact, cap=cap_l, axis_name="d",
            )
            s = scores * omc[0][None, :] if has_omc else scores
            keep = (matched >= thr[:, None]) & (scores > 0.0)
            counts = jax.lax.psum(
                jnp.sum(keep, axis=1).astype(jnp.int32), "d"
            )
            s = jnp.where(keep, s, -jnp.inf)
            local_vals, local_idx = jax.lax.top_k(s, k)
            sid = jax.lax.axis_index("d").astype(jnp.int32)
            local_ids = local_idx * D + sid
            all_vals = jax.lax.all_gather(local_vals, "d", axis=1)
            all_ids = jax.lax.all_gather(local_ids, "d", axis=1)
            vals, sel = jax.lax.top_k(all_vals.reshape(B, D * k), k)
            ids = jnp.take_along_axis(
                all_ids.reshape(B, D * k), sel, axis=1
            )
            # ---- per-group pages: local 3-key sort + run slicing ----
            gidl = gid[0]
            gidk = jnp.where(
                keep & (gidl[None, :] >= 0), gidl[None, :], jnp.int32(G)
            )
            neg = jnp.where(gidk < G, -s, jnp.inf)
            iota = jax.lax.broadcasted_iota(jnp.int32, (1, cap_l), 1)
            gdoc = jnp.broadcast_to(iota * D + sid, (B, cap_l))
            gk, ns, dd = jax.lax.sort(
                (gidk, neg, gdoc), dimension=1, num_keys=3
            )
            queries = jnp.arange(G + 1, dtype=jnp.int32)[None, :]
            pos = jnp.zeros((B, G + 1), jnp.int32)
            step_ = 1
            while step_ * 2 <= cap_l:
                step_ *= 2
            while step_ >= 1:
                probe = pos + step_
                pv = jnp.take_along_axis(
                    gk, jnp.minimum(probe, cap_l) - 1, axis=1
                )
                pos = jnp.where(
                    (probe <= cap_l) & (pv < queries), probe, pos
                )
                step_ >>= 1
            g_start = pos[:, :G]
            g_end = pos[:, 1:]
            page_ix = g_start[:, :, None] + jnp.arange(
                R, dtype=jnp.int32
            )
            in_run = page_ix < g_end[:, :, None]
            clip = jnp.minimum(page_ix, cap_l - 1).reshape(B, G * R)
            pns = jnp.where(
                in_run,
                jnp.take_along_axis(ns, clip, axis=1).reshape(B, G, R),
                jnp.inf,
            )
            pdd = jnp.where(
                in_run,
                jnp.take_along_axis(dd, clip, axis=1).reshape(B, G, R),
                0,
            )
            ans = jax.lax.all_gather(pns, "d", axis=2).reshape(
                B, G, D * R
            )
            add = jax.lax.all_gather(pdd, "d", axis=2).reshape(
                B, G, D * R
            )
            mns, mdd = jax.lax.sort((ans, add), dimension=2, num_keys=2)
            head_ns = mns[:, :, :R]
            fin = jnp.isfinite(head_ns)
            gvals = jnp.where(fin, -head_ns, -jnp.inf)
            gdocs = jnp.where(fin, mdd[:, :, :R], 0)
            return vals, ids, counts, gvals, gdocs

        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P("d", None), P("d", None), P("d", None), P("d", None),
                P("d", None, None, None), P("d", None, None, None),
                P(None, None, None), P(None, None, None),
                P(None, None, None), P(None), P(None),
                P("d", None, None) if has_mask else P(None, None),
                P("d", None) if has_omc else P(None),
                P("d", None),
            ),
            out_specs=(
                P(None, None), P(None, None), P(None),
                P(None, None, None), P(None, None, None),
            ),
            check_vma=False,
        )
        step = jax.jit(fn)
        self._steps[key] = step
        return step

    def search_topk_sorted(
        self,
        index: StringIndex,
        plans: Sequence[QueryPlan],
        n_docs: Sequence[float],
        cap: int,
        k: int,
        sort_vals: np.ndarray,
        sort_present: np.ndarray,
        svals_key,
        desc: bool,
        exact: bool = False,
        doc_masks: Optional[Sequence[Optional[np.ndarray]]] = None,
        thresholds: Optional[Sequence[float]] = None,
        omc: Optional[np.ndarray] = None,
        omc_key: Optional[int] = None,
    ):
        """Fused sort-by over the mesh — the single-device
        search_topk_sorted contract (ranked [(doc, score)] rows in
        (value, doc-asc) order with the fieldless tail, exact counts):
        each shard takes its stable top-k per ordering, the host merges
        the D sorted pages by (value, global doc id)."""
        from ..index.search_exec import _MISS
        from ..ops.bm25 import NEG_F32

        dev_slab, boundaries, bprefix = self.ensure_slab(index)
        D = self.D
        B = len(plans)
        T = max(p.starts.shape[0] for p in plans)
        NR = max(p.starts.shape[1] for p in plans)
        Tb = round_up_pow2(T, 1)
        NRb = round_up_pow2(NR, 1)
        g_starts = np.zeros((B, Tb, NRb), np.int32)
        g_lens = np.zeros((B, Tb, NRb), np.int32)
        weights = np.zeros((B, Tb, NRb), np.float32)
        field_b = np.full((B, Tb, NRb), 0.75, np.float32)
        avg = np.ones((B, Tb, NRb), np.float32)
        nd = np.ones((B,), np.float32)
        thr = np.zeros((B,), np.float32)
        for i, p in enumerate(plans):
            t, r = p.starts.shape
            g_starts[i, :t, :r] = p.starts
            g_lens[i, :t, :r] = p.lens
            weights[i, :t, :r] = p.weights
            field_b[i, :t, :r] = p.field_b
            avg[i, :t, :r] = p.avg_flen
            nd[i] = max(float(n_docs[i]), 1.0)
            if thresholds is not None and thresholds[i]:
                thr[i] = thresholds[i]
        s_starts, s_lens = self._shard_ranges_on(
            boundaries, bprefix, D, g_starts, g_lens
        )
        lr = round_up_pow2(max(int(s_lens.max()), 1), 8)
        cap_l = round_up_pow2((cap + D - 1) // D, 128)
        kb = min(round_up_pow2(k, 8), cap_l)
        has_mask = doc_masks is not None and any(
            m is not None for m in doc_masks
        )
        if has_mask:
            gm = np.ones((B, cap), bool)
            for i, m in enumerate(doc_masks):
                if m is not None:
                    gm[i, : len(m)] = m
                    gm[i, len(m):] = False
            mask_arr = self._partition_docs_axis(gm, cap_l, False)
        else:
            mask_arr = np.zeros((1, 1), bool)
        has_omc = omc is not None
        if has_omc:
            go = np.ones((cap,), np.float32)
            go[: min(len(omc), cap)] = omc[:cap]
            omc_arr = self._partition_docs_axis(go, cap_l, np.float32(1.0))
        else:
            omc_arr = np.zeros((1,), np.float32)
        # sharded sort column (NaN = missing/padding), device-cached
        ckey = (svals_key, cap_l) if svals_key is not None else None
        sv_dev = _MISS
        if ckey is not None:
            sv_dev = self._fmask_dev.get(ckey)
        if sv_dev is _MISS:
            sv = np.full((cap,), np.nan, np.float32)
            n = min(len(sort_vals), cap)
            sv[:n] = sort_vals[:n].astype(np.float32)
            sv[:n][~sort_present[:n]] = np.nan
            part = self._partition_docs_axis(sv, cap_l, np.float32(np.nan))
            sv_dev = jax.device_put(
                part, NamedSharding(self.mesh, P("d", None))
            )
            if ckey is not None:
                sv_dev = self._fmask_dev.put(ckey, sv_dev)

        step = self._get_sorted_step(
            lr=int(lr), cap_l=int(cap_l), k=int(kb), exact=exact,
            has_mask=has_mask, has_omc=has_omc, desc=desc,
        )
        p_doc, p_tf, p_etf, p_flen = dev_slab
        sh = NamedSharding(self.mesh, P("d", None, None, None))
        v1, g1, sc1, v2, g2, sc2, counts = step(
            p_doc, p_tf, p_etf, p_flen,
            jax.device_put(s_starts, sh), jax.device_put(s_lens, sh),
            jnp.asarray(weights), jnp.asarray(field_b), jnp.asarray(avg),
            jnp.asarray(nd), jnp.asarray(thr),
            jax.device_put(
                mask_arr, NamedSharding(self.mesh, P("d", None, None))
            ) if has_mask else jnp.asarray(mask_arr),
            jax.device_put(
                omc_arr, NamedSharding(self.mesh, P("d", None))
            ) if has_omc else jnp.asarray(omc_arr),
            sv_dev,
        )
        v1 = np.asarray(v1); g1 = np.asarray(g1); sc1 = np.asarray(sc1)
        v2 = np.asarray(v2); g2 = np.asarray(g2); sc2 = np.asarray(sc2)
        ranked = []
        for b in range(B):
            ok1 = v1[b] > NEG_F32 / 2
            # both directions merge by (-key, doc) ascending: key encodes
            # the direction on device, so -key restores value order
            o = np.lexsort((g1[b][ok1], -v1[b][ok1]))
            row = [
                (int(d), float(v))
                for d, v in zip(g1[b][ok1][o][:k], sc1[b][ok1][o][:k])
            ]
            if len(row) < k:
                ok2 = v2[b] > NEG_F32 / 2
                o2 = np.argsort(g2[b][ok2], kind="stable")
                row += [
                    (int(d), float(v))
                    for d, v in zip(
                        g2[b][ok2][o2][: k - len(row)],
                        sc2[b][ok2][o2][: k - len(row)],
                    )
                ]
            ranked.append(row)
        return ranked, np.asarray(counts[:B])

    # ------------------------------------------------------------------
    # Host-side partitioning of per-doc arrays (masks / OMC)
    # ------------------------------------------------------------------

    def _partition_docs_axis(self, arr: np.ndarray, cap_l: int, fill):
        """Global per-doc array [..., cap] -> sharded [D, ..., cap_l]
        (doc d lands at [d % D, ..., d // D])."""
        D = self.D
        lead = arr.shape[:-1]
        cap = arr.shape[-1]
        padded = np.full(lead + (cap_l * D,), fill, arr.dtype)
        padded[..., :cap] = arr
        # global index = slot * D + shard -> reshape to (..., cap_l, D)
        resh = padded.reshape(lead + (cap_l, D))
        return np.moveaxis(resh, -1, 0)  # (D, ..., cap_l)

    # ------------------------------------------------------------------
    # Vector side (hybrid over the mesh): rows partition by doc % D like
    # the postings, so a doc's fused score is entirely shard-local
    # ------------------------------------------------------------------

    def ensure_vectors(self, vector_index):
        """Partition the flat vector rows across the mesh. Returns the
        device tuple, or None when the index is absent / in int8/IVF
        mode (hybrid callers fall back or take the int8 path)."""
        if vector_index is None:
            return None
        # (uid, gen): bare generations collide across vector indexes
        # served by one shared executor (two indexes at gen 3 would
        # silently reuse each other's corpus)
        from ..index.search_exec import _MISS

        gen = (getattr(vector_index, "uid", id(vector_index)),
               vector_index._gen)
        out = self._vecs.get(gen)
        if out is not _MISS:
            return out if out is not False else None
        with self._lock:  # one thread partitions; others wait
            out = self._vecs.get(gen)
            if out is not _MISS:
                return out if out is not False else None
            return self._ensure_vectors_locked(vector_index, gen)

    def _ensure_vectors_locked(self, vector_index, gen):
        if vector_index._ivf is not None and not vector_index._live_rows:
            self._vecs.put(gen, False)
            return None
        parts_m = [vector_index._committed_matrix]
        parts_d = [vector_index._committed_docs]
        if vector_index._live_rows:
            parts_m.append(np.stack(vector_index._live_rows))
            parts_d.append(np.asarray(vector_index._live_docs, np.int32))
        matrix = np.concatenate(parts_m)
        docs = np.concatenate(parts_d).astype(np.int64)
        D = self.D
        shard = (docs % D).astype(np.int32)
        counts = np.bincount(shard, minlength=D)
        nb = round_up_pow2(max(int(counts.max()), 1), 128)
        mat_l = np.zeros((D, nb, matrix.shape[1]), np.float32)
        doc_l = np.zeros((D, nb), np.int32)
        valid_l = np.zeros((D, nb), bool)
        for s in range(D):
            sel = shard == s
            n = int(counts[s])
            mat_l[s, :n] = matrix[sel]
            doc_l[s, :n] = (docs[sel] // D).astype(np.int32)
            valid_l[s, :n] = True
        sh2 = NamedSharding(self.mesh, P("d", None))
        sh3 = NamedSharding(self.mesh, P("d", None, None))
        return self._vecs.put(gen, (
            jax.device_put(mat_l.astype(np.float32), sh3),
            jax.device_put(doc_l, sh2),
            jax.device_put(valid_l, sh2),
        ))

    def _get_hybrid_step(self, *, lr, cap_l, k, exact, has_mask, has_omc,
                         has_rescale, rescale_lo, rescale_hi,
                         with_bitmap=False):
        key = ("hy", lr, cap_l, k, exact, has_mask, has_omc,
               has_rescale, rescale_lo, rescale_hi, with_bitmap)
        step = self._steps.get(key)
        if step is not None:
            return step
        mesh, D = self.mesh, self.D

        def shard_fn(p_doc, p_tf, p_etf, p_flen, starts, lens,
                     weights, field_b, avg, n_docs, thr, sim,
                     vec_m, vec_d, vec_v, queries, mask, omc):
            from ..ops.hybrid import _vector_dense_scores

            B = weights.shape[0]
            m = mask[0] if has_mask else jnp.ones((B, cap_l), bool)
            bm25, matched = bm25_score_batch(
                p_doc[0], p_tf[0], p_etf[0], p_flen[0],
                starts[0], lens[0], weights, field_b, avg, n_docs, m,
                lr=lr, exact=exact, cap=cap_l, axis_name="d",
            )
            vec = _vector_dense_scores(
                vec_m[0].astype(jnp.bfloat16), vec_d[0], vec_v[0],
                queries, sim, cap=cap_l, has_rescale=has_rescale,
                rescale_lo=rescale_lo, rescale_hi=rescale_hi,
            )
            # min-max fusion with a GLOBAL span: the max must be pmaxed
            # over the doc shards or per-shard scores are incomparable
            ft_keep = (bm25 > 0.0) & (matched >= thr[:, None]) & m
            vec_keep = (vec > 0.0) & m
            ft = jnp.where(ft_keep, bm25, 0.0)
            vc = jnp.where(vec_keep, vec, 0.0)
            hi = jax.lax.pmax(
                jnp.maximum(jnp.max(ft, axis=1), jnp.max(vc, axis=1)), "d"
            )
            span = jnp.where(hi > 0.0, hi, 1.0)
            fused = (ft + vc) / span[:, None]
            if has_omc:
                fused = fused * omc[0][None, :]
            present = ft_keep | vec_keep
            fused = jnp.where(present, fused, -jnp.inf)
            counts = jax.lax.psum(
                jnp.sum(present, axis=1).astype(jnp.int32), "d"
            )
            local_vals, local_idx = jax.lax.top_k(fused, k)
            sid = jax.lax.axis_index("d").astype(jnp.int32)
            local_ids = local_idx * D + sid
            all_vals = jax.lax.all_gather(local_vals, "d", axis=1)
            all_ids = jax.lax.all_gather(local_ids, "d", axis=1)
            flat_vals = all_vals.reshape(B, D * k)
            flat_ids = all_ids.reshape(B, D * k)
            vals, sel = jax.lax.top_k(flat_vals, k)
            ids = jnp.take_along_axis(flat_ids, sel, axis=1)
            if with_bitmap:
                # per-shard packed match bits over the LOCAL doc slots,
                # stacked on the lead axis (global doc = slot*D + shard;
                # the host reinterleaves — same contract as _get_step)
                bits = jnp.packbits(present, axis=1)[None]
                return vals, ids, counts, bits
            return vals, ids, counts

        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P("d", None), P("d", None), P("d", None), P("d", None),
                P("d", None, None, None), P("d", None, None, None),
                P(None, None, None), P(None, None, None),
                P(None, None, None), P(None), P(None), P(None),
                P("d", None, None), P("d", None), P("d", None),
                P(None, None),
                P("d", None, None) if has_mask else P(None, None),
                P("d", None) if has_omc else P(None),
            ),
            out_specs=(
                (P(None, None), P(None, None), P(None), P("d", None, None))
                if with_bitmap
                else (P(None, None), P(None, None), P(None))
            ),
            check_vma=False,
        )
        step = jax.jit(fn)
        self._steps[key] = step
        return step

    # ------------------------------------------------------------------
    # Public search (StringSearchTopK-compatible contract)
    # ------------------------------------------------------------------

    def search_topk(
        self,
        index: StringIndex,
        plans: Sequence[QueryPlan],
        n_docs: Sequence[float],
        cap: int,
        k: int,
        exact: bool = False,
        doc_masks: Optional[Sequence[Optional[np.ndarray]]] = None,
        thresholds: Optional[Sequence[float]] = None,
        omc: Optional[np.ndarray] = None,
        omc_key: Optional[int] = None,
        with_bitmap: bool = False,
    ) -> Tuple[np.ndarray, ...]:
        dev_slab, boundaries, bprefix = self.ensure_slab(index)
        D = self.D
        B = len(plans)
        T = max(p.starts.shape[0] for p in plans)
        NR = max(p.starts.shape[1] for p in plans)
        Tb = round_up_pow2(T, 1)
        NRb = round_up_pow2(NR, 1)
        g_starts = np.zeros((B, Tb, NRb), np.int32)
        g_lens = np.zeros((B, Tb, NRb), np.int32)
        weights = np.zeros((B, Tb, NRb), np.float32)
        field_b = np.full((B, Tb, NRb), 0.75, np.float32)
        avg = np.ones((B, Tb, NRb), np.float32)
        nd = np.ones((B,), np.float32)
        thr = np.zeros((B,), np.float32)
        for i, p in enumerate(plans):
            t, r = p.starts.shape
            g_starts[i, :t, :r] = p.starts
            g_lens[i, :t, :r] = p.lens
            weights[i, :t, :r] = p.weights
            field_b[i, :t, :r] = p.field_b
            avg[i, :t, :r] = p.avg_flen
            nd[i] = max(float(n_docs[i]), 1.0)
            if thresholds is not None and thresholds[i]:
                thr[i] = thresholds[i]
        s_starts, s_lens = self._shard_ranges_on(
            boundaries, bprefix, D, g_starts, g_lens
        )
        # shard axis first: (D, B, T, NR)
        lr = round_up_pow2(max(int(s_lens.max()), 1), 8)
        cap_l = round_up_pow2((cap + D - 1) // D, 128)
        kb = min(round_up_pow2(k, 8), cap_l)

        has_mask = doc_masks is not None and any(
            m is not None for m in doc_masks
        )
        if has_mask:
            gm = np.ones((B, cap), bool)
            for i, m in enumerate(doc_masks):
                if m is not None:
                    gm[i, : len(m)] = m
                    gm[i, len(m):] = False
            mask_arr = self._partition_docs_axis(gm, cap_l, False)
            # padding slots (global id >= cap) must stay False
        else:
            mask_arr = np.zeros((1, 1), bool)
        has_omc = omc is not None
        if has_omc:
            go = np.ones((cap,), np.float32)
            go[: min(len(omc), cap)] = omc[:cap]
            omc_arr = self._partition_docs_axis(go, cap_l, np.float32(1.0))
        else:
            omc_arr = np.zeros((1,), np.float32)

        step = self._get_step(
            lr=int(lr), cap_l=int(cap_l), k=int(kb), exact=exact,
            has_mask=has_mask, has_omc=has_omc, with_bitmap=with_bitmap,
        )
        p_doc, p_tf, p_etf, p_flen = dev_slab
        sh = NamedSharding(self.mesh, P("d", None, None, None))
        out = step(
            p_doc, p_tf, p_etf, p_flen,
            jax.device_put(s_starts, sh), jax.device_put(s_lens, sh),
            jnp.asarray(weights), jnp.asarray(field_b), jnp.asarray(avg),
            jnp.asarray(nd), jnp.asarray(thr),
            jax.device_put(
                mask_arr, NamedSharding(self.mesh, P("d", None, None))
            ) if has_mask else jnp.asarray(mask_arr),
            jax.device_put(
                omc_arr, NamedSharding(self.mesh, P("d", None))
            ) if has_omc else jnp.asarray(omc_arr),
        )
        vals, ids, counts = out[:3]
        bitmaps = None
        if with_bitmap:
            # (D, B, cap_l/8) per-shard bits -> bool[B, cap] with global
            # doc d at shard d % D, slot d // D
            bits = np.asarray(out[3])
            shard_bools = np.unpackbits(bits, axis=2)[:, :, :cap_l]
            inter = np.ascontiguousarray(
                shard_bools.transpose(1, 2, 0)
            ).reshape(B, cap_l * D)
            bitmaps = inter[:, :cap].astype(bool)
        vals = np.asarray(vals[:, :k])
        ids = np.asarray(ids[:, :k])
        # padding slots score -inf; global ids beyond cap can only appear
        # with -inf values, which callers drop (v > 0)
        if with_bitmap:
            return vals, ids, np.asarray(counts[:B]), bitmaps
        return vals, ids, np.asarray(counts[:B])

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
        """Mesh analog of search_exec.search_topk_grouped (same return
        contract): shard-local (gid, -score, doc) sorts + run slicing,
        merged across shards with one 2-key sort per group
        (_get_grouped_step). The group-id column doc-shards like the
        slab and caches on device by (gid_key, cap_l)."""
        dev_slab, boundaries, bprefix = self.ensure_slab(index)
        D = self.D
        B = len(plans)
        T = max(p.starts.shape[0] for p in plans)
        NR = max(p.starts.shape[1] for p in plans)
        Tb = round_up_pow2(T, 1)
        NRb = round_up_pow2(NR, 1)
        g_starts = np.zeros((B, Tb, NRb), np.int32)
        g_lens = np.zeros((B, Tb, NRb), np.int32)
        weights = np.zeros((B, Tb, NRb), np.float32)
        field_b = np.full((B, Tb, NRb), 0.75, np.float32)
        avg = np.ones((B, Tb, NRb), np.float32)
        nd = np.ones((B,), np.float32)
        thr = np.zeros((B,), np.float32)
        for i, p in enumerate(plans):
            t, r = p.starts.shape
            g_starts[i, :t, :r] = p.starts
            g_lens[i, :t, :r] = p.lens
            weights[i, :t, :r] = p.weights
            field_b[i, :t, :r] = p.field_b
            avg[i, :t, :r] = p.avg_flen
            nd[i] = max(float(n_docs[i]), 1.0)
            if thresholds is not None and thresholds[i]:
                thr[i] = thresholds[i]
        s_starts, s_lens = self._shard_ranges_on(
            boundaries, bprefix, D, g_starts, g_lens
        )
        lr = round_up_pow2(max(int(s_lens.max()), 1), 8)
        cap_l = round_up_pow2((cap + D - 1) // D, 128)
        kb = min(round_up_pow2(k, 8), cap_l)
        Gb = round_up_pow2(max(n_groups, 1), 8)
        Rb = min(round_up_pow2(max_results, 8), cap_l)

        has_mask = doc_masks is not None and any(
            m is not None for m in doc_masks
        )
        if has_mask:
            gm = np.ones((B, cap), bool)
            for i, m in enumerate(doc_masks):
                if m is not None:
                    gm[i, : len(m)] = m
                    gm[i, len(m):] = False
            mask_arr = self._partition_docs_axis(gm, cap_l, False)
        else:
            mask_arr = np.zeros((1, 1), bool)
        has_omc = omc is not None
        if has_omc:
            go = np.ones((cap,), np.float32)
            go[: min(len(omc), cap)] = omc[:cap]
            omc_arr = self._partition_docs_axis(go, cap_l, np.float32(1.0))
        else:
            omc_arr = np.zeros((1,), np.float32)

        from ..index.search_exec import _MISS

        sh1 = NamedSharding(self.mesh, P("d", None))
        gkey = (gid_key, cap_l) if gid_key is not None else None
        gid_dev = _MISS
        if gkey is not None:
            gid_dev = self._fmask_dev.get(gkey)
        if gid_dev is _MISS:
            gcol = np.full((cap,), -1, np.int32)
            gcol[: min(len(gid_col), cap)] = gid_col[:cap]
            gid_dev = jax.device_put(
                self._partition_docs_axis(gcol, cap_l, np.int32(-1)),
                sh1,
            )
            if gkey is not None:
                gid_dev = self._fmask_dev.put(gkey, gid_dev)

        step = self._get_grouped_step(
            lr=int(lr), cap_l=int(cap_l), k=int(kb), G=int(Gb),
            R=int(Rb), exact=exact, has_mask=has_mask, has_omc=has_omc,
        )
        p_doc, p_tf, p_etf, p_flen = dev_slab
        sh4 = NamedSharding(self.mesh, P("d", None, None, None))
        vals, ids, counts, gvals, gdocs = step(
            p_doc, p_tf, p_etf, p_flen,
            jax.device_put(s_starts, sh4), jax.device_put(s_lens, sh4),
            jnp.asarray(weights), jnp.asarray(field_b), jnp.asarray(avg),
            jnp.asarray(nd), jnp.asarray(thr),
            jax.device_put(
                mask_arr, NamedSharding(self.mesh, P("d", None, None))
            ) if has_mask else jnp.asarray(mask_arr),
            jax.device_put(omc_arr, sh1)
            if has_omc else jnp.asarray(omc_arr),
            gid_dev,
        )
        gvals = np.asarray(gvals[:B, :n_groups])
        gdocs = np.asarray(gdocs[:B, :n_groups])
        group_pages = [
            [
                [
                    (int(d), float(v))
                    for d, v in zip(gdocs[b, g], gvals[b, g])
                    if np.isfinite(v) and int(d) < cap
                ][:max_results]
                for g in range(n_groups)
            ]
            for b in range(B)
        ]
        return (
            np.asarray(vals[:B, :k]),
            np.asarray(ids[:B, :k]),
            np.asarray(counts[:B]),
            group_pages,
        )

    # ------------------------------------------------------------------
    # Int8/IVF vector sharding (the >=2M-row tier): probe UNITS partition
    # round-robin across shards, each shard storing its units' window
    # rows window-aligned (boundary rows duplicate — exactness over a few
    # KB). Unit centroids replicate (small), so every shard computes the
    # SAME global top-nprobe probe selection with no collective; each
    # shard scans only the units it owns and the per-shard top-V merge is
    # exact (a shard contributes at most V of the global top-V).
    # ------------------------------------------------------------------

    def ensure_vectors_int8(self, vector_index):
        """Partition the packed int8/IVF layout across the mesh. Returns
        the device tuple, or None when not in int8/IVF mode."""
        if vector_index is None or vector_index._ivf is None \
                or vector_index._live_rows:
            return None
        from ..index.search_exec import _MISS

        gen = ("i8", getattr(vector_index, "uid", id(vector_index)),
               vector_index._gen)
        out = self._vecs.get(gen)
        if out is not _MISS:
            return out
        with self._lock:  # one thread partitions; others wait
            out = self._vecs.get(gen)
            if out is not _MISS:
                return out
            return self._ensure_vectors_int8_locked(vector_index, gen)

    def _ensure_vectors_int8_locked(self, vector_index, gen):
        ivf = vector_index._ivf
        D = self.D
        q = ivf["q"]
        scales = ivf["scales"]
        docs = ivf["docs"]
        unit_starts = ivf["unit_starts"]
        window = int(ivf["window"])
        N, dim = q.shape
        U = len(unit_starts)
        per_shard = (U + D - 1) // D
        nb = max(per_shard * window, window)
        mat_l = np.zeros((D, nb, dim), np.int8)
        sc_l = np.zeros((D, nb), np.float32)
        doc_l = np.zeros((D, nb), np.int32)
        unit_local = np.zeros(U, np.int32)
        for u in range(U):
            s = u % D
            j = u // D
            unit_local[u] = j
            st = min(int(unit_starts[u]), max(N - window, 0))
            en = min(st + window, N)
            n = en - st
            mat_l[s, j * window: j * window + n] = q[st:en]
            sc_l[s, j * window: j * window + n] = scales[st:en]
            doc_l[s, j * window: j * window + n] = docs[st:en]
        sh2 = NamedSharding(self.mesh, P("d", None))
        sh3 = NamedSharding(self.mesh, P("d", None, None))
        return self._vecs.put(gen, (
            jax.device_put(mat_l, sh3),
            jax.device_put(sc_l, sh2),
            jax.device_put(doc_l, sh2),
            jnp.asarray(np.asarray(ivf["unit_cen"], np.float32)),
            jnp.asarray((np.arange(U) % D).astype(np.int32)),   # owner
            jnp.asarray(unit_local),
            window,
        ))

    def ensure_vectors_int8_pruned(self, vector_index, cap_l: int):
        """Doc-aligned int8 partition for the sharded PRUNED hybrid: the
        probe partition above packs rows by IVF unit (unit u -> shard
        u % D), so a doc's vector row and its postings live on DIFFERENT
        shards. The pruned rescore scores candidates on their doc % D
        owner, which therefore needs a second copy of the int8 rows laid
        out by doc shard: (my_mat int8[D, nb, dim], my_sc f32[D, nb],
        d2r int32[D, cap_l + 1]) with d2r[local doc] = local row or -1.
        Multi-vector docs keep ONE representative row (last write wins,
        matching VectorIndex.int8_doc2row); probe hits fold back in the
        kernel. Returns None when not in int8/IVF mode."""
        if vector_index is None or vector_index._ivf is None \
                or vector_index._live_rows:
            return None
        from ..index.search_exec import _MISS

        gen = ("i8p", getattr(vector_index, "uid", id(vector_index)),
               vector_index._gen, cap_l)
        out = self._vecs.get(gen)
        if out is not _MISS:
            return out
        with self._lock:
            out = self._vecs.get(gen)
            if out is not _MISS:
                return out
            ivf = vector_index._ivf
            D = self.D
            q, scales, docs = ivf["q"], ivf["scales"], ivf["docs"]
            dim = q.shape[1]
            shard = docs % D
            nb = max(int(np.bincount(shard, minlength=D).max()), 1)
            my_mat = np.zeros((D, nb, dim), np.int8)
            my_sc = np.zeros((D, nb), np.float32)
            d2r = np.full((D, cap_l + 1), -1, np.int32)
            for s in range(D):
                sel = np.nonzero(shard == s)[0]
                n = len(sel)
                my_mat[s, :n] = q[sel]
                my_sc[s, :n] = scales[sel]
                ld = docs[sel] // D
                ok = ld < cap_l
                # ascending original-row order: later rows of a multi-
                # vector doc overwrite earlier ones (int8_doc2row parity)
                d2r[s, ld[ok]] = np.arange(n, dtype=np.int32)[ok]
            sh2 = NamedSharding(self.mesh, P("d", None))
            sh3 = NamedSharding(self.mesh, P("d", None, None))
            return self._vecs.put(gen, (
                jax.device_put(my_mat, sh3),
                jax.device_put(my_sc, sh2),
                jax.device_put(d2r, sh2),
            ))

    def search_topk_hybrid(
        self,
        index: StringIndex,
        plans: Sequence[QueryPlan],
        n_docs: Sequence[float],
        cap: int,
        k: int,
        vector_index,                 # engine VectorIndex (flat mode)
        queries: np.ndarray,          # f32[B, dim] L2-normalized
        similarities: Sequence[float],
        exact: bool = False,
        doc_masks: Optional[Sequence[Optional[np.ndarray]]] = None,
        thresholds: Optional[Sequence[float]] = None,
        omc: Optional[np.ndarray] = None,
        omc_key: Optional[int] = None,
        rescale: Optional[Tuple[float, float]] = None,
        with_bitmap: bool = False,
    ):
        """Doc-sharded fused hybrid over the mesh; returns None when the
        vector index can't shard (int8/IVF mode) so callers fall back.
        with_bitmap appends the reassembled bool[B, cap] match set
        (facet searches — same contract as search_topk)."""
        vecs = self.ensure_vectors(vector_index)
        if vecs is None:
            return None
        dev_slab, boundaries, bprefix = self.ensure_slab(index)
        D = self.D
        B = len(plans)
        T = max(p.starts.shape[0] for p in plans)
        NR = max(p.starts.shape[1] for p in plans)
        Tb = round_up_pow2(T, 1)
        NRb = round_up_pow2(NR, 1)
        g_starts = np.zeros((B, Tb, NRb), np.int32)
        g_lens = np.zeros((B, Tb, NRb), np.int32)
        weights = np.zeros((B, Tb, NRb), np.float32)
        field_b = np.full((B, Tb, NRb), 0.75, np.float32)
        avg = np.ones((B, Tb, NRb), np.float32)
        nd = np.ones((B,), np.float32)
        thr = np.zeros((B,), np.float32)
        sim = np.zeros((B,), np.float32)
        for i, p in enumerate(plans):
            t, r = p.starts.shape
            g_starts[i, :t, :r] = p.starts
            g_lens[i, :t, :r] = p.lens
            weights[i, :t, :r] = p.weights
            field_b[i, :t, :r] = p.field_b
            avg[i, :t, :r] = p.avg_flen
            nd[i] = max(float(n_docs[i]), 1.0)
            if thresholds is not None and thresholds[i]:
                thr[i] = thresholds[i]
            sim[i] = similarities[i]
        s_starts, s_lens = self._shard_ranges_on(
            boundaries, bprefix, D, g_starts, g_lens
        )
        lr = round_up_pow2(max(int(s_lens.max()), 1), 8)
        cap_l = round_up_pow2((cap + D - 1) // D, 128)
        kb = min(round_up_pow2(k, 8), cap_l)
        has_mask = doc_masks is not None and any(
            m is not None for m in doc_masks
        )
        if has_mask:
            gm = np.ones((B, cap), bool)
            for i, m in enumerate(doc_masks):
                if m is not None:
                    gm[i, : len(m)] = m
                    gm[i, len(m):] = False
            mask_arr = self._partition_docs_axis(gm, cap_l, False)
        else:
            mask_arr = np.zeros((1, 1), bool)
        has_omc = omc is not None
        if has_omc:
            go = np.ones((cap,), np.float32)
            go[: min(len(omc), cap)] = omc[:cap]
            omc_arr = self._partition_docs_axis(go, cap_l, np.float32(1.0))
        else:
            omc_arr = np.zeros((1,), np.float32)
        step = self._get_hybrid_step(
            lr=int(lr), cap_l=int(cap_l), k=int(kb), exact=exact,
            has_mask=has_mask, has_omc=has_omc,
            has_rescale=rescale is not None,
            rescale_lo=float(rescale[0]) if rescale else 0.0,
            rescale_hi=float(rescale[1]) if rescale else 1.0,
            with_bitmap=with_bitmap,
        )
        p_doc, p_tf, p_etf, p_flen = dev_slab
        vec_m, vec_d, vec_v = vecs
        sh4 = NamedSharding(self.mesh, P("d", None, None, None))
        out = step(
            p_doc, p_tf, p_etf, p_flen,
            jax.device_put(s_starts, sh4), jax.device_put(s_lens, sh4),
            jnp.asarray(weights), jnp.asarray(field_b), jnp.asarray(avg),
            jnp.asarray(nd), jnp.asarray(thr), jnp.asarray(sim),
            vec_m, vec_d, vec_v,
            jnp.asarray(np.asarray(queries, np.float32)),
            jax.device_put(
                mask_arr, NamedSharding(self.mesh, P("d", None, None))
            ) if has_mask else jnp.asarray(mask_arr),
            jax.device_put(
                omc_arr, NamedSharding(self.mesh, P("d", None))
            ) if has_omc else jnp.asarray(omc_arr),
        )
        vals, ids, counts = out[:3]
        result = (
            np.asarray(vals[:, :k]),
            np.asarray(ids[:, :k]),
            np.asarray(counts[:B]),
        )
        if with_bitmap:
            # (D, B, cap_l/8) per-shard bits -> bool[B, cap]: global doc
            # d lives at shard d % D, slot d // D (same as search_topk)
            bits = np.asarray(out[3])
            shard_bools = np.unpackbits(bits, axis=2)[:, :, :cap_l]
            inter = np.ascontiguousarray(
                shard_bools.transpose(1, 2, 0)
            ).reshape(B, cap_l * D)
            result = result + (inter[:, :cap].astype(bool),)
        return result

    # ------------------------------------------------------------------
    # Sharded pruned scoring: the 10M-tier two-phase path (ops/pruned.py)
    # on the mesh. Every phase is shard-local — a doc's postings,
    # impact-prefix entries and candidate slot all live in its doc % D
    # shard — so the only collectives are a df psum (global IDF inside
    # the rescore), a counts psum and the final all_gather top-k merge.
    # Each shard nominates its own top-C candidates, making the global
    # candidate pool D*C deep (richer than the single-chip budget).
    # ------------------------------------------------------------------

    @staticmethod
    def _shard_pre_ranges(boundaries, bprefix, D,
                          starts: np.ndarray, lens: np.ndarray, clip: int):
        """Map nomination-prefix ranges onto per-shard sub-ranges.
        Unlike _shard_ranges_on, ENDS need not land on stored
        boundaries (plan_query clips oversize LIVE ranges at
        PREFIX_LEN): ends align UP to the next boundary — a superset of
        the same term's postings, which only enriches nomination — and
        local lens clip to the per-shard prefix budget."""
        shape = starts.shape
        st = starts.reshape(-1).astype(np.int64)
        en = st + lens.reshape(-1).astype(np.int64)
        nb = len(boundaries)
        bi = np.searchsorted(boundaries, st)
        if not np.all(
            np.take(boundaries, np.minimum(bi, nb - 1)) == st
        ):
            raise ValueError(
                "prefix-range starts must align to stored boundaries"
            )
        be = np.searchsorted(boundaries, en)  # first boundary >= end
        s_st = bprefix[:, bi]
        s_ln = bprefix[:, np.minimum(be, nb - 1)] - s_st
        s_ln = np.clip(s_ln, 0, clip)
        return (
            s_st.reshape((D,) + shape).astype(np.int32),
            s_ln.reshape((D,) + shape).astype(np.int32),
        )

    def _get_pruned_step(self, *, lp, lch, cap_l, C, k, T, exact,
                         has_omc, nre, bs_steps,
                         has_filter=False, cand_given=False,
                         use_bs=False, nom_accum=True, hp=0):
        key = ("pruned", lp, lch, cap_l, C, k, T, exact, has_omc, nre,
               bs_steps, has_filter, cand_given, use_bs, nom_accum, hp)
        step = self._steps.get(key)
        if step is not None:
            return step
        from ..ops.pruned import (
            _prefix_candidates, _rescore_bsearch, _rescore_worklist,
            _sliced_candidates,
        )

        mesh, D = self.mesh, self.D

        def shard_fn(p_doc, p_tf, p_etf, p_flen,
                     pre_st, pre_ln, pre_w, pre_fb, pre_av,
                     rng_st, rng_ln, rng_f,
                     wl_i, wl_f, wl_prev, idf, nd, thr, omc,
                     fmask, cand_in):
            tf_src = p_etf[0] if exact else p_tf[0]
            # the filter mask is doc-sharded like the slab: shard-local
            # gathers give the exact filtered-df IDF after the df psum
            fm = fmask[0] if has_filter else None
            if cand_given:
                # small filters: each shard's slice of the filtered doc
                # set IS its candidate list (docs live in one shard, so
                # per-shard verified counts psum to the exact count)
                cand = cand_in[0]
            elif use_bs and not nom_accum:
                cand = _sliced_candidates(
                    p_doc[0], pre_st[0], pre_ln[0], hp=hp, cap=cap_l
                )
            else:
                cand = _prefix_candidates(
                    p_doc[0], tf_src, p_flen[0],
                    pre_st[0], pre_ln[0], pre_w, pre_fb, pre_av,
                    idf, fm, lp=lp, cap=cap_l, C=C,
                )
            if use_bs:
                # v4 rescore: per-candidate binary searches into the
                # shard's slices of the UNSPLIT doc-sorted spans — the
                # same kernel generation the single-device path
                # dispatches (ops/pruned._rescore_bsearch); df/IDF is
                # exact from the host under the shared gate (nre == 0,
                # unfiltered, non-exact tf), so no psum is needed
                scores, matched = _rescore_bsearch(
                    p_doc[0], tf_src, p_flen[0],
                    rng_st[0], rng_ln[0],
                    rng_f[0], rng_f[1], rng_f[2],
                    idf, cand, bs_steps=bs_steps,
                )
            else:
                scores, matched = _rescore_worklist(
                    p_doc[0], tf_src, p_flen[0], wl_i[0], wl_f[0],
                    nd, cand, wl_prev[0] if nre else None, fm,
                    lch=lch, C=C, T=T, nre=nre, bs_steps=bs_steps,
                    axis_name="d",
                )
            keep = (
                (matched >= thr[:, None]) & (scores > 0.0)
                & (cand < cap_l)
            )
            if has_omc:
                omc_c = jnp.take(omc[0], jnp.clip(cand, 0, cap_l - 1))
                s = scores * omc_c
            else:
                s = scores
            counts = jax.lax.psum(
                jnp.sum(keep, axis=1).astype(jnp.int32), "d"
            )
            s = jnp.where(keep, s, -jnp.inf)
            local_vals, ci = jax.lax.top_k(s, k)
            sid = jax.lax.axis_index("d").astype(jnp.int32)
            local_ids = jnp.take_along_axis(cand, ci, axis=1) * D + sid
            B = s.shape[0]
            all_vals = jax.lax.all_gather(local_vals, "d", axis=1)
            all_ids = jax.lax.all_gather(local_ids, "d", axis=1)
            flat_vals = all_vals.reshape(B, D * k)
            flat_ids = all_ids.reshape(B, D * k)
            vals, sel = jax.lax.top_k(flat_vals, k)
            ids = jnp.take_along_axis(flat_ids, sel, axis=1)
            return vals, ids, counts

        in_specs = (
            P("d", None), P("d", None), P("d", None), P("d", None),
            P("d", None, None, None), P("d", None, None, None),
            P(None, None, None), P(None, None, None),
            P(None, None, None),
            P("d", None, None, None) if use_bs else P(None, None, None),
            P("d", None, None, None) if use_bs else P(None, None, None),
            P(None, None, None, None) if use_bs else P(None, None, None),
            P("d", None, None), P("d", None, None),
            P("d", None, None, None) if nre else P(None, None, None),
            P(None, None), P(None), P(None),
            P("d", None) if has_omc else P(None),
            P("d", None) if has_filter else P(None),
            P("d", None, None) if cand_given else P(None, None),
        )
        fn = shard_map(
            shard_fn, mesh=mesh, in_specs=in_specs,
            out_specs=(P(None, None), P(None, None), P(None)),
            check_vma=False,
        )
        step = jax.jit(fn)
        self._steps[key] = step
        return step

    def _pruned_bs_shard_inputs(self, boundaries, bprefix, plans):
        """Per-shard UNSPLIT doc-sorted ranges for the v4 binary-search
        rescore: the single-device coalescing
        (search_exec.PrunedPlanMixin._pruned_bs_inputs) recovers each
        stored span, whose start/end land on stored boundaries, so
        _shard_ranges_on maps them to shard-local sub-ranges — each
        still sorted by LOCAL doc id (a doc-sorted range filtered to
        docs with doc % D == sid stays sorted under doc // D).

        Returns (s_rng_st (D, Bb, Tb, NRU), s_rng_ln, rng_f
        (3, Bb, Tb, NRU), bs_steps) — bs_steps bucketed on the SHARD
        max sub-range length (~1/D of the global)."""
        from ..index.search_exec import PrunedPlanMixin as PM

        rng_i, rng_f, _ = PM._pruned_bs_inputs(plans)
        s_rng_st, s_rng_ln = self._shard_ranges_on(
            boundaries, bprefix, self.D, rng_i[0], rng_i[1]
        )
        max_len = int(s_rng_ln.max()) if s_rng_ln.size else 1
        bs_steps = 4
        while (1 << bs_steps) < max_len + 1:
            bs_steps += 4
        return s_rng_st, s_rng_ln, rng_f, int(bs_steps)

    def _get_pruned_counts_step(self, *, lch, cap_l, T, exact,
                                has_filter=False):
        key = ("pruned_counts", lch, cap_l, T, exact, has_filter)
        step = self._steps.get(key)
        if step is not None:
            return step
        from ..ops.pruned import _exact_counts_core

        def shard_fn(p_doc, p_tf, p_etf, wl_i, thr, fmask):
            tf_src = p_etf[0] if exact else p_tf[0]
            return _exact_counts_core(
                p_doc[0], tf_src, wl_i[0], thr,
                fmask[0] if has_filter else None,
                lch=lch, cap=cap_l, T=T, axis_name="d",
            )

        fn = shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(
                P("d", None), P("d", None), P("d", None),
                P("d", None, None), P(None),
                P("d", None) if has_filter else P(None),
            ),
            out_specs=P(None),
            check_vma=False,
        )
        step = jax.jit(fn)
        self._steps[key] = step
        return step

    def _pruned_shard_inputs(
        self,
        boundaries, bprefix,
        plans: Sequence[QueryPlan],
        n_docs: Sequence[float],
        cap: int,
        thresholds: Optional[Sequence[float]],
        omc: Optional[np.ndarray],
    ):
        """Host prep shared by the sharded pruned fulltext and hybrid
        paths: nomination prefixes, per-shard rescore worklists,
        earlier-field spans, host IDF, thresholds, OMC partition.
        Returns a dict of ready arrays + static dims."""
        from ..index.search_exec import PrunedPlanMixin as PM

        D = self.D
        B = len(plans)
        Bb = round_up_pow2(B, 1)
        T = max(p.starts.shape[0] for p in plans)
        Tb = round_up_pow2(T, 1)
        # small-corpus clamps (r5 mesh compile audit): the worklist
        # chunk width and candidate budget drive the compiled shard_map
        # shapes — a dryrun-size corpus otherwise compiles 32768-wide
        # chunk ops and (B, 1024) candidate state (13.6 s token_scores,
        # all compile). Pow2 ladders; the 10M tier is unchanged, and
        # C >= per-shard cap nominates every doc so results hold.
        max_rl = max(
            (int(p.lens.max()) if p.lens.size else 1) for p in plans
        )
        lch = min(PM.PRUNED_LCH, round_up_pow2(max_rl, 128))
        cap_l = round_up_pow2((cap + D - 1) // D, 128)
        # clamp by the GLOBAL cap, not cap_l: the small-filter
        # cand-given gate compares the filter's GLOBAL selection count
        # against C, and the read side flags those counts exact under
        # the unclamped constant — a per-shard clamp desynchronized
        # the two (filtered-mesh count regression, r5)
        C = min(PM.PRUNED_CANDIDATES, round_up_pow2(cap, 8))

        # ---- nomination prefixes: global descriptors -> per-shard ----
        def pre_of(p):
            if p.pre_starts is not None:
                return (p.pre_starts, p.pre_lens, p.pre_weights,
                        p.pre_field_b, p.pre_avg)
            return (p.starts, np.minimum(p.lens, PM.PRUNED_PREFIX),
                    p.weights, p.field_b, p.avg_flen)

        NPR = max(1, max(pre_of(p)[0].shape[1] for p in plans))
        NPRb = round_up_pow2(NPR, 1)
        pre_st = np.zeros((Bb, Tb, NPRb), np.int32)
        pre_ln = np.zeros((Bb, Tb, NPRb), np.int32)
        pre_w = np.zeros((Bb, Tb, NPRb), np.float32)
        pre_fb = np.full((Bb, Tb, NPRb), 0.75, np.float32)
        pre_av = np.ones((Bb, Tb, NPRb), np.float32)
        nd = np.ones((Bb,), np.float32)
        thr = np.zeros((Bb,), np.float32)
        dfs = np.zeros((Bb, Tb), np.float64)
        for i, p in enumerate(plans):
            nd[i] = max(float(n_docs[i]), 1.0)
            if (thresholds is not None and i < len(thresholds)
                    and thresholds[i]):
                thr[i] = thresholds[i]
            ps, pl, pw, pf, pa = pre_of(p)
            t_, r_ = ps.shape
            pre_st[i, :t_, :r_] = ps
            pre_ln[i, :t_, :r_] = pl
            pre_w[i, :t_, :r_] = pw
            pre_fb[i, :t_, :r_] = pf
            pre_av[i, :t_, :r_] = pa
            dfs[i, :p.lens.shape[0]] = (
                p.lens.astype(np.float64).sum(axis=1)
            )
        # clamped like search_exec._pruned_host_inputs: tolerance sums
        # variant ranges, so raw df can exceed nd (nomination-only)
        d_ = np.minimum(np.maximum(dfs, 1.0), nd[:, None])
        idf = np.where(
            dfs > 0,
            np.log1p((nd[:, None] - d_ + 0.5) / (d_ + 0.5)),
            0.0,
        ).astype(np.float32)
        s_pre_st, s_pre_ln = self._shard_pre_ranges(
            boundaries, bprefix, D, pre_st, pre_ln,
            clip=PM.PRUNED_PREFIX,
        )
        lp = round_up_pow2(max(int(s_pre_ln.max()), 8), 8)

        # ---- main ranges + earlier-field spans -> per-shard worklists
        NRm = max(p.starts.shape[1] for p in plans)
        NRmb = round_up_pow2(NRm, 1)
        g_starts = np.zeros((Bb, Tb, NRmb), np.int32)
        g_lens = np.zeros((Bb, Tb, NRmb), np.int32)
        for i, p in enumerate(plans):
            t_, r_ = p.starts.shape
            g_starts[i, :t_, :r_] = p.starts
            g_lens[i, :t_, :r_] = p.lens
        s_starts, s_lens = self._shard_ranges_on(
            boundaries, bprefix, D, g_starts, g_lens
        )
        # flat span table (multi-field union df): spans are unsplit
        # stored ranges, so they map per shard like any other range
        sp_st_l, sp_ln_l = [], []
        span_base: Dict[Tuple[int, int], int] = {}
        for i, p in enumerate(plans):
            if p.spans is None:
                continue
            for t, spans_t in enumerate(p.spans):
                span_base[(i, t)] = len(sp_st_l)
                for (_fo, _to, rs, rl) in spans_t:
                    sp_st_l.append(rs)
                    sp_ln_l.append(rl)
        if sp_st_l:
            s_sp_st, s_sp_ln = self._shard_ranges_on(
                boundaries, bprefix, D,
                np.asarray(sp_st_l, np.int32),
                np.asarray(sp_ln_l, np.int32),
            )
        else:
            s_sp_st = s_sp_ln = np.zeros((D, 0), np.int64)

        per_shard = []  # [(wl rows, earlier flat-span ids per row)]
        max_e = 0
        nre = 0
        max_span = 0
        for s in range(D):
            rows = []
            for i, p in enumerate(plans):
                t_n, r_n = p.starts.shape
                for t in range(t_n):
                    spans_t = (
                        p.spans[t] if p.spans is not None
                        and t < len(p.spans) else []
                    )
                    base = span_base.get((i, t), 0)
                    for r in range(r_n):
                        lln = int(s_lens[s, i, t, r])
                        if lln <= 0:
                            continue
                        so = (
                            int(p.range_span[t, r])
                            if p.range_span is not None else -1
                        )
                        # earlier spans of the same token except the
                        # range's own (field, term): union df across
                        # fields AND tolerance variants
                        if so >= 0:
                            me = spans_t[so][:2]
                            earlier = [
                                base + e for e in range(so)
                                if spans_t[e][:2] != me
                            ]
                        else:
                            earlier = []
                        for eid in earlier:
                            max_span = max(
                                max_span, int(s_sp_ln[s, eid])
                            )
                        nre = max(nre, len(earlier))
                        ls = int(s_starts[s, i, t, r])
                        w0 = float(p.weights[t, r])
                        b0 = float(p.field_b[t, r])
                        a0 = float(p.avg_flen[t, r])
                        off = 0
                        while off < lln:
                            take = min(lln - off, lch)
                            rows.append(
                                (i, t, ls + off, take, w0, b0, a0,
                                 earlier)
                            )
                            off += take
            per_shard.append(rows)
            max_e = max(max_e, len(rows))
        W = round_up_pow2(max(max_e, 1), PM.PRUNED_WCH)
        nre = round_up_pow2(nre, 1) if nre else 0
        wl_i = np.zeros((D, 4, W), np.int32)
        wl_f = np.zeros((D, 3, W), np.float32)
        wl_f[:, 2, :] = 1.0
        wl_prev = (
            np.zeros((D, 2, W, nre), np.int32) if nre
            else np.zeros((1, 1, 1), np.int32)
        )
        for s, rows in enumerate(per_shard):
            for j, (b, t, ls, ll, w0, b0, a0, earlier) in enumerate(rows):
                wl_i[s, :, j] = (b, t, ls, ll)
                wl_f[s, :, j] = (w0, b0, a0)
                if nre:
                    for e, eid in enumerate(earlier):
                        wl_prev[s, 0, j, e] = int(s_sp_st[s, eid])
                        wl_prev[s, 1, j, e] = int(s_sp_ln[s, eid])
        bs_steps = 0
        if nre:
            bs_steps = 4
            while (1 << bs_steps) < max_span + 1:
                bs_steps += 4

        has_omc = omc is not None
        if has_omc:
            go = np.ones((cap,), np.float32)
            go[: min(len(omc), cap)] = omc[:cap]
            omc_arr = self._partition_docs_axis(
                go, cap_l, np.float32(1.0)
            )
        else:
            omc_arr = np.zeros((1,), np.float32)

        return dict(
            B=B, Bb=Bb, Tb=Tb, lch=lch, cap_l=int(cap_l), C=C,
            lp=int(lp), nre=int(nre), bs_steps=int(bs_steps),
            s_pre_st=s_pre_st, s_pre_ln=s_pre_ln,
            pre_w=pre_w, pre_fb=pre_fb, pre_av=pre_av,
            wl_i=wl_i, wl_f=wl_f, wl_prev=wl_prev,
            idf=idf, nd=nd, thr=thr, dfs=dfs,
            has_omc=has_omc, omc_arr=omc_arr,
        )

    def _get_facet_reps_step(self, *, lch, cap_l, has_filter):
        """Phase A of the mesh sort-based facet path: per-shard
        (doc, token) sort + run-end reps (ops/pruned._match_reps_core;
        shard-complete — a doc's postings all live in its doc % D
        shard). Outputs stay sharded on device for phase B."""
        key = ("facet_reps", lch, cap_l, has_filter)
        step = self._steps.get(key)
        if step is not None:
            return step
        from ..ops.pruned import _match_reps_core

        def shard_fn(p_doc, p_tf, wl_i, thr, fmask):
            docs, rep = _match_reps_core(
                p_doc[0], p_tf[0], wl_i[0], thr,
                fmask[0] if has_filter else None,
                lch=lch, cap=cap_l,
            )
            return docs[None], rep[None]

        fn = shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(
                P("d", None), P("d", None),
                P("d", None, None), P(),
                P("d", None) if has_filter else P(None),
            ),
            out_specs=(P("d", None), P("d", None)),
            check_vma=False,
        )
        step = jax.jit(fn)
        self._steps[key] = step
        return step

    def _get_facet_vec_reps_step(self, *, cap_l, V, nprobe, window,
                                 pad, has_filter, has_rescale,
                                 rescale_lo, rescale_hi):
        """HYBRID phase-A tail on the mesh: the IVF probe scans each
        unit on its round-robin owner (the ensure_vectors_int8 layout),
        the global top-V rows route to their doc % D owner via one
        all_gather — exactly the sharded pruned hybrid's probe
        (_get_pruned_hybrid_step) — then each shard dedups its owned
        probe docs against its fulltext reps (ops/pruned._vec_reps_core;
        shard-complete: a doc's postings AND its facet slot live in its
        doc % D shard) and appends them to the sharded (docs, rep)
        pair. `pad` keeps phase B's chunking invariant."""
        key = ("facet_vreps", cap_l, V, nprobe, window, pad,
               has_filter, has_rescale, rescale_lo, rescale_hi)
        step = self._steps.get(key)
        if step is not None:
            return step
        from ..ops.pruned import _vec_reps_core

        mesh, D = self.mesh, self.D
        NEG_INF = -1e30

        def shard_fn(docs_ft, rep_ft, mat8, sc8, doc8,
                     unit_cen, owner, unit_local,
                     query, sim, fmask):
            sid = jax.lax.axis_index("d").astype(jnp.int32)
            mat_l, sc_l, doc_l = mat8[0], sc8[0], doc8[0]
            dim = mat_l.shape[1]
            nloc = mat_l.shape[0]
            qv = query[0].astype(jnp.bfloat16)
            _, probes = jax.lax.top_k(
                jnp.dot(
                    qv, unit_cen.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32,
                ),
                nprobe,
            )

            def body(carry, u):
                vals, docs = carry
                own = jnp.take(owner, u) == sid
                j = jnp.take(unit_local, u)
                start = jnp.minimum(j * window, nloc - window)
                tile = jax.lax.dynamic_slice(
                    mat_l, (start, 0), (window, dim)
                )
                sc = jax.lax.dynamic_slice(sc_l, (start,), (window,))
                dg = jax.lax.dynamic_slice(doc_l, (start,), (window,))
                s = jnp.dot(
                    tile.astype(jnp.bfloat16), qv,
                    preferred_element_type=jnp.float32,
                ) * sc
                s = jnp.where(own & (sc > 0), s, NEG_INF)
                cat_v = jnp.concatenate([vals, s])
                cat_d = jnp.concatenate([docs, dg])
                new_v, sel = jax.lax.top_k(cat_v, V)
                new_d = jnp.take(cat_d, sel)
                return (new_v, new_d), None

            init = (
                jnp.full((V,), NEG_INF, jnp.float32),
                jnp.full((V,), -1, jnp.int32),
            )
            (lv, ld), _ = jax.lax.scan(body, init, probes)
            av = jax.lax.all_gather(lv, "d").reshape(D * V)
            ad = jax.lax.all_gather(ld, "d").reshape(D * V)
            gv, sel = jax.lax.top_k(av, V)
            gd = jnp.take(ad, sel)
            if has_rescale:
                gv = jnp.clip(
                    (gv - rescale_lo) / (rescale_hi - rescale_lo),
                    0.0, 1.0,
                )
            keep = (gd >= 0) & (gv >= sim) & (gv > 0.0)
            own_doc = keep & ((gd % D) == sid)
            vd = jnp.where(own_doc, gd // D, cap_l)
            if has_filter:
                vd = jnp.where(
                    jnp.take(
                        fmask[0], jnp.clip(vd, 0, cap_l - 1)
                    ) > 0.0,
                    vd, cap_l,
                )
            vd, vrep = _vec_reps_core(vd, docs_ft[0], rep_ft[0], cap_l)
            vd = jnp.concatenate(
                [vd, jnp.full((pad - V,), cap_l, jnp.int32)]
            )
            vrep = jnp.concatenate(
                [vrep, jnp.zeros((pad - V,), jnp.float32)]
            )
            return (
                jnp.concatenate([docs_ft[0], vd])[None],
                jnp.concatenate([rep_ft[0], vrep])[None],
            )

        fn = shard_map(
            shard_fn, mesh=mesh,
            in_specs=(
                P("d", None), P("d", None),
                P("d", None, None), P("d", None), P("d", None),
                P(None, None), P(None), P(None),
                P(None, None), P(),
                P("d", None) if has_filter else P(None),
            ),
            out_specs=(P("d", None), P("d", None)),
            check_vma=False,
        )
        step = jax.jit(fn)
        self._steps[key] = step
        return step

    def _get_facet_hist_step(self, *, G, numeric):
        """Phase B: per-shard chunked one-hot matmul histograms off the
        sharded (docs, rep), psum'd to exact global counts."""
        key = ("facet_hist", G, numeric)
        step = self._steps.get(key)
        if step is not None:
            return step
        from ..ops.pruned import _facet_hist_core

        def shard_fn(docs, rep, bucket, bounds):
            return _facet_hist_core(
                docs[0], rep[0], bucket[0], bounds,
                G=G, numeric=numeric, axis_name="d",
            )

        fn = shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(
                P("d", None), P("d", None),
                P("d", None), P(None, None),
            ),
            out_specs=P(None),
            check_vma=False,
        )
        step = jax.jit(fn)
        self._steps[key] = step
        return step

    def _get_facet_hist_multi_step(self, *, G, numeric, M):
        """Phase B for MULTI-VALUED facet columns on the mesh: per-shard
        bounded pair-table probes (ops/pruned._facet_hist_multi_core),
        psum'd to exact global counts — shard-complete because a doc's
        reps AND its pair rows both live in its doc % D shard."""
        key = ("facet_hist_multi", G, numeric, M)
        step = self._steps.get(key)
        if step is not None:
            return step
        from ..ops.pruned import _facet_hist_multi_core

        def shard_fn(docs, rep, pair_docs, pair_vals, bounds):
            return _facet_hist_multi_core(
                docs[0], rep[0], pair_docs[0], pair_vals[0], bounds,
                G=G, numeric=numeric, M=M, axis_name="d",
            )

        fn = shard_map(
            shard_fn, mesh=self.mesh,
            in_specs=(
                P("d", None), P("d", None),
                P("d", None), P("d", None), P(None, None),
            ),
            out_specs=P(None),
            check_vma=False,
        )
        step = jax.jit(fn)
        self._steps[key] = step
        return step

    def facet_counts_pruned(
        self,
        index: StringIndex,
        plan,
        cap: int,
        spec,
        spec_key,
        exact: bool = False,
        mask: Optional[np.ndarray] = None,
        mask_key=None,
        thr: float = 0.0,
        vec=None,
    ) -> np.ndarray:
        """Mesh facet counting over the pruned plan — the single-device
        search_exec contract: distinct matched docs per bucket,
        sort-based (per-shard (doc, token) sort + run-end reps, then a
        psum'd histogram; ops/pruned._match_reps_core /
        _facet_hist_core). A doc's postings all live in its doc % D
        shard, so shard-local runs are whole and the psum of per-shard
        histograms is exact. The sharded (docs, rep) pair is computed
        ONCE per plan and cached device-resident for the search's
        remaining facet fields. `vec` = (vector_index, q, similarity,
        rescale) for HYBRID searches at the int8/IVF tier — the probe's
        owned top-V docs join each shard's reps
        (_get_facet_vec_reps_step)."""
        from ..index.search_exec import (
            HYBRID_INT8_CANDIDATES, PrunedPlanMixin as PM, _MISS,
        )

        dev_slab, boundaries, bprefix = self.ensure_slab(index)
        D = self.D
        lch = PM.PRUNED_LCH
        if plan is not None and getattr(plan, "lens", None) is not None \
                and plan.lens.size:
            # small-corpus compile clamp (see _pruned_shard_inputs)
            lch = min(lch, round_up_pow2(int(plan.lens.max()), 128))
        cap_l = round_up_pow2((cap + D - 1) // D, 128)
        p_doc, p_tf, p_etf, _p_flen = dev_slab
        has_filter = mask is not None

        # one-slot reps cache: the slot holds a strong ref to the plan,
        # so the `is` identity check can never alias a recycled id()
        reps_key = (index.uid, mask_key, has_filter, bool(exact),
                    float(thr), int(cap_l), vec is not None)
        slot = getattr(self, "_facet_reps_slot", None)
        if slot is not None and slot[1] is plan and slot[0] == reps_key:
            docs_dev, rep_dev = slot[2], slot[3]
        else:
            T, NR = plan.starts.shape
            s_st, s_ln = self._shard_ranges_on(
                boundaries, bprefix, D, plan.starts[None],
                plan.lens[None],
            )
            per_shard = []
            max_rows = 0
            for sh in range(D):
                rows = []
                for t in range(T):
                    for r in range(NR):
                        lln = int(s_ln[sh, 0, t, r])
                        if lln <= 0:
                            continue
                        ls = int(s_st[sh, 0, t, r])
                        off = 0
                        while off < lln:
                            take = min(lln - off, lch)
                            rows.append((t, ls + off, take))
                            off += take
                per_shard.append(rows)
                max_rows = max(max_rows, len(rows))
            W = round_up_pow2(max(max_rows, 1), 2)
            wl_i = np.zeros((D, 4, W), np.int32)
            for sh, rows in enumerate(per_shard):
                for j, (t, ls, ll) in enumerate(rows):
                    wl_i[sh, 1, j] = t
                    wl_i[sh, 2, j] = ls
                    wl_i[sh, 3, j] = ll
            fmask_dev = jnp.ones((1,), jnp.float32)
            if has_filter:
                # C=0: the cand-given branch can't trigger (only the
                # sharded mask upload is wanted here)
                fmask_dev, _c, _cg, _sel = (
                    self._pruned_mask_shard_inputs(
                        mask, mask_key, cap, cap_l, 1, 0
                    )
                )
            reps_step = self._get_facet_reps_step(
                lch=lch, cap_l=int(cap_l), has_filter=has_filter,
            )
            sh3 = NamedSharding(self.mesh, P("d", None, None))
            docs_dev, rep_dev = reps_step(
                p_doc, p_etf if exact else p_tf,
                jax.device_put(wl_i, sh3), jnp.float32(thr), fmask_dev,
            )
            if vec is not None:
                vector_index, q, sim_v, rescale = vec
                vecs8 = self.ensure_vectors_int8(vector_index)
                mat8, sc8, doc8, unit_cen, owner, unit_local, window = (
                    vecs8
                )
                V = round_up_pow2(
                    min(HYBRID_INT8_CANDIDATES,
                        int(mat8.shape[0] * mat8.shape[1]),
                        round_up_pow2(cap, 8)), 8
                )
                from ..index.vector_index import IVF_NPROBE

                nprobe = min(IVF_NPROBE, int(unit_cen.shape[0]))
                vstep = self._get_facet_vec_reps_step(
                    cap_l=int(cap_l), V=V, nprobe=int(nprobe),
                    # pad must hold the V probe rows (lch can clamp
                    # below V on small corpora — r5 compile clamps)
                    window=int(window), pad=max(lch, V),
                    has_filter=has_filter,
                    has_rescale=rescale is not None,
                    rescale_lo=float(rescale[0]) if rescale else 0.0,
                    rescale_hi=float(rescale[1]) if rescale else 1.0,
                )
                docs_dev, rep_dev = vstep(
                    docs_dev, rep_dev, mat8, sc8, doc8,
                    unit_cen, owner, unit_local,
                    jnp.asarray(np.asarray(q, np.float32)),
                    jnp.float32(sim_v), fmask_dev,
                )
            self._facet_reps_slot = (reps_key, plan, docs_dev, rep_dev)

        sh1 = NamedSharding(self.mesh, P("d", None))
        kind = spec[0]
        if kind in ("mcat", "mnum"):
            # multi-valued column: the doc-sorted deduped pair table
            # shards by doc % D (global doc order keeps each shard's
            # local ids ascending), padded with a sentinel > any local
            # id so the per-shard binary search stays total
            numeric = kind == "mnum"
            if numeric:
                bounds = jnp.asarray(spec[3].astype(np.float32))
                G, M = int(spec[3].shape[0]), int(spec[4])
            else:
                bounds = jnp.zeros((int(spec[3]), 2), jnp.float32)
                G, M = int(spec[3]), int(spec[4])
            ckey = (spec_key, cap_l) if spec_key is not None else None
            pair_dev = _MISS
            if ckey is not None:
                pair_dev = self._fmask_dev.get(ckey)
            if pair_dev is _MISS:
                gd, gv = spec[1], spec[2]
                shard = gd % D
                pl = max(int(np.bincount(shard, minlength=D).max())
                         if len(gd) else 0, 0) + 1
                pd = np.full((D, pl), 2 ** 30, np.int32)
                pv = np.zeros((D, pl), gv.dtype)
                for s in range(D):
                    sel = shard == s
                    n = int(np.count_nonzero(sel))
                    pd[s, :n] = gd[sel] // D
                    pv[s, :n] = gv[sel]
                pair_dev = (
                    jax.device_put(pd, sh1), jax.device_put(pv, sh1),
                )
                if ckey is not None:
                    pair_dev = self._fmask_dev.put(ckey, pair_dev)
            mstep = self._get_facet_hist_multi_step(
                G=G, numeric=numeric, M=max(M, 1),
            )
            counts = mstep(
                docs_dev, rep_dev, pair_dev[0], pair_dev[1], bounds
            )
            return np.asarray(counts)
        numeric = kind == "num"
        ckey = (spec_key, cap_l) if spec_key is not None else None
        col_dev = _MISS
        if ckey is not None:
            col_dev = self._fmask_dev.get(ckey)
        if col_dev is _MISS:
            if numeric:
                arr = spec[1].astype(np.float32)
                part = self._partition_docs_axis(
                    arr[:cap], cap_l, np.float32(np.nan)
                )
            else:
                part = self._partition_docs_axis(
                    spec[1][:cap].astype(np.int32), cap_l, np.int32(-1)
                )
            col_dev = jax.device_put(part, sh1)
            if ckey is not None:
                col_dev = self._fmask_dev.put(ckey, col_dev)
        if numeric:
            bounds = jnp.asarray(spec[2].astype(np.float32))
            G = int(spec[2].shape[0])
        else:
            bounds = jnp.zeros((int(spec[2]), 2), jnp.float32)
            G = int(spec[2])

        hist_step = self._get_facet_hist_step(G=G, numeric=numeric)
        counts = hist_step(docs_dev, rep_dev, col_dev, bounds)
        return np.asarray(counts)

    def facet_match_count(self, plan) -> Optional[int]:
        """Mesh analog of search_exec.facet_match_count: the global rep
        sum over the doc-sharded phase-A reps (per-shard runs are whole
        and doc-disjoint, so one cross-shard sum is the exact
        thresholded match count). None when the reps slot doesn't hold
        this plan."""
        slot = getattr(self, "_facet_reps_slot", None)
        if slot is None or slot[1] is not plan:
            return None
        # int32 accumulation (advisor r4): per-shard f32 partials can
        # each approach 2^24 on the 8-shard mesh — sum exactly
        return int(jnp.sum(slot[3].astype(jnp.int32)))

    def _pruned_mask_shard_inputs(self, mask, mask_key, cap, cap_l,
                                  Bb, C):
        """Doc-sharded device inputs for a FILTERED pruned search: the
        (D, cap_l) f32 mask (doc d at [d % D, d // D], cached on device
        when mask_key is stable), and for filters selecting <= C docs
        the per-shard slices of the filtered doc set as cand lists
        (sorted local ids, cap_l-padded). Returns
        (fmask_dev, cand_in_dev, cand_given, sel)."""
        from ..index.search_exec import _MISS

        sh1 = NamedSharding(self.mesh, P("d", None))
        key = (mask_key, cap_l) if mask_key is not None else None
        fm = _MISS
        if key is not None:
            fm = self._fmask_dev.get(key)
        if fm is _MISS:
            part = self._partition_docs_axis(
                mask[:cap].astype(np.float32), cap_l, 0.0
            )
            fm = jax.device_put(part, sh1)
            if key is not None:
                fm = self._fmask_dev.put(key, fm)
        sel = int(np.count_nonzero(mask[:cap]))
        cand_in = None
        cand_given = False
        if sel <= C:
            ids = np.nonzero(mask[:cap])[0].astype(np.int32)
            cand_np = np.full((self.D, Bb, C), cap_l, np.int32)
            for sh in range(self.D):
                loc = ids[ids % self.D == sh] // self.D
                cand_np[sh, :, : len(loc)] = loc[None, :]
            cand_in = jax.device_put(
                cand_np, NamedSharding(self.mesh, P("d", None, None))
            )
            cand_given = True
        return fm, cand_in, cand_given, sel

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
        omc_key=None,
        exact_counts: bool = False,
        mask: Optional[np.ndarray] = None,
        mask_key=None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Pruned fulltext over the mesh — same contract as
        search_exec.PrunedPlanMixin.search_topk_pruned (GLOBAL doc ids,
        counts are estimate-floored lower bounds unless exact_counts;
        mask is one bool[cap] filter shared by every plan, doc-sharded
        like the slab so the filtered-df psum stays exact; a small
        filter becomes the per-shard candidate lists — results AND
        counts exact). Plans must be built with_prefix
        (ReadSide._plan_fulltext) and without impact_cap (enforced by
        boundary alignment)."""
        from ..index.search_exec import PrunedPlanMixin as PM

        dev_slab, boundaries, bprefix = self.ensure_slab(index)
        h = self._pruned_shard_inputs(
            boundaries, bprefix, plans, n_docs, cap, thresholds, omc
        )
        B, Tb, lch, cap_l, C = h["B"], h["Tb"], h["lch"], h["cap_l"], h["C"]
        nre, has_omc = h["nre"], h["has_omc"]
        wl_i, wl_f, wl_prev, thr = (
            h["wl_i"], h["wl_f"], h["wl_prev"], h["thr"]
        )
        has_filter = mask is not None
        fmask_dev = None
        cand_in = None
        cand_given = False
        sel = None
        if has_filter:
            fmask_dev, cand_in, cand_given, sel = (
                self._pruned_mask_shard_inputs(
                    mask, mask_key, cap, cap_l, h["idf"].shape[0], C
                )
            )
        # v4 dispatch mirrors the single-device gate
        # (search_exec.search_topk_pruned use_bs): single-span tokens,
        # non-exact tf, unfiltered — both stacks run the SAME kernel
        # generation (VERDICT r3 #1)
        use_bs = (
            PM.PRUNED_BS and not exact and not has_filter and nre == 0
        )
        rng_dummy3 = jnp.zeros((1, 1, 1), jnp.int32)
        s_rng_st = s_rng_ln = rng_f_in = rng_dummy3
        bs_steps = h["bs_steps"]
        hp = 0
        if use_bs:
            s_rng_st, s_rng_ln, rng_f_in, bs_steps = (
                self._pruned_bs_shard_inputs(boundaries, bprefix, plans)
            )
            if PM.PRUNED_BS_ACCUM:
                C = min(PM.PRUNED_BS_C,
                        round_up_pow2(cap_l, 8))
            else:
                hp = PM.PRUNED_BS_HP
                C = (h["s_pre_st"].shape[2] * h["s_pre_st"].shape[3]
                     * hp)
        kb = min(round_up_pow2(k, 8), C)

        step = self._get_pruned_step(
            lp=h["lp"], lch=lch, cap_l=cap_l, C=C, k=int(kb),
            T=int(Tb), exact=exact, has_omc=has_omc, nre=nre,
            bs_steps=bs_steps,
            has_filter=has_filter, cand_given=cand_given,
            use_bs=use_bs, nom_accum=PM.PRUNED_BS_ACCUM, hp=hp,
        )
        p_doc, p_tf, p_etf, p_flen = dev_slab
        sh4 = NamedSharding(self.mesh, P("d", None, None, None))
        sh3 = NamedSharding(self.mesh, P("d", None, None))
        dummy_f = jnp.ones((1,), jnp.float32)
        vals, ids, cand_counts = step(
            p_doc, p_tf, p_etf, p_flen,
            jax.device_put(h["s_pre_st"], sh4),
            jax.device_put(h["s_pre_ln"], sh4),
            jnp.asarray(h["pre_w"]), jnp.asarray(h["pre_fb"]),
            jnp.asarray(h["pre_av"]),
            jax.device_put(s_rng_st, sh4) if use_bs else rng_dummy3,
            jax.device_put(s_rng_ln, sh4) if use_bs else rng_dummy3,
            jnp.asarray(rng_f_in) if use_bs else rng_dummy3,
            jax.device_put(wl_i, sh3), jax.device_put(wl_f, sh3),
            jax.device_put(wl_prev, sh4) if nre else jnp.asarray(wl_prev),
            jnp.asarray(h["idf"]), jnp.asarray(h["nd"]),
            jnp.asarray(thr),
            jax.device_put(
                h["omc_arr"], NamedSharding(self.mesh, P("d", None))
            ) if has_omc else jnp.asarray(h["omc_arr"]),
            fmask_dev if has_filter else dummy_f,
            cand_in if cand_given else jnp.zeros((1, 1), jnp.int32),
        )
        if cand_given:
            counts = np.asarray(cand_counts[:B])
        elif exact_counts:
            cstep = self._get_pruned_counts_step(
                lch=lch, cap_l=int(cap_l), T=int(Tb), exact=exact,
                has_filter=has_filter,
            )
            S = PM.PRUNED_COUNTS_SLICE
            if B <= S:
                counts = np.asarray(
                    cstep(
                        p_doc, p_tf, p_etf,
                        jax.device_put(wl_i, sh3), jnp.asarray(thr),
                        fmask_dev if has_filter else dummy_f,
                    )
                )[:B]
            else:
                # the counts kernel's per-shard global sort is
                # superlinear in flat length (search_exec
                # _exact_counts_sliced rationale) — dispatch <= S query
                # slices, one compile shape per worklist-width bucket
                counts = np.zeros((B,), np.int32)
                D = self.D
                for s0 in range(0, B, S):
                    take = min(S, B - s0)
                    cols = [
                        np.nonzero(
                            (wl_i[sh, 0] >= s0) & (wl_i[sh, 0] < s0 + S)
                            & (wl_i[sh, 3] > 0)
                        )[0]
                        for sh in range(D)
                    ]
                    Ws = round_up_pow2(
                        max(max((len(c) for c in cols), default=0), 1), 2
                    )
                    wls = np.zeros((D, 4, Ws), np.int32)
                    for sh in range(D):
                        cc = cols[sh]
                        wls[sh, :, : len(cc)] = wl_i[sh][:, cc]
                        wls[sh, 0, : len(cc)] -= s0
                    thrs = np.zeros((S,), np.float32)
                    thrs[:take] = np.asarray(thr)[s0:s0 + take]
                    c = np.asarray(
                        cstep(
                            p_doc, p_tf, p_etf,
                            jax.device_put(wls, sh3),
                            jnp.asarray(thrs),
                            fmask_dev if has_filter else dummy_f,
                        )
                    )
                    counts[s0:s0 + take] = c[:take]
        else:
            sel_frac = 1.0
            if sel is not None:
                sel_frac = sel / max(float(h["nd"][0]), 1.0)
            counts = PM._pruned_counts(
                cand_counts, h["dfs"], h["nd"], thresholds, B,
                sel_frac=sel_frac,
            )
        return (
            np.asarray(vals[:B, :k]),
            np.asarray(ids[:B, :k]),
            counts,
        )

    # ------------------------------------------------------------------
    # Sharded pruned HYBRID (int8/IVF tier): the 10M-tier hybrid on the
    # mesh. Fulltext candidates nominate per doc shard (as above); the
    # IVF probe scans each unit on its round-robin owner and the global
    # top-V rows route back to their doc % D owner via one all_gather;
    # BM25F and cosine are then both EXACT on the per-shard candidate
    # union (the cosine via the doc-aligned int8 copy,
    # ensure_vectors_int8_pruned), fused under a pmax'd global span.
    # Replaces the dense scatter tail exactly where multiple chips are
    # needed (VERDICT r2 weak #3 tail: "sharded hybrid keeps its dense
    # tail"). Reference semantics: token_score.rs:357-422 min-max span.
    # ------------------------------------------------------------------

    def _get_pruned_hybrid_step(self, *, lp, lch, cap_l, C, k, T, exact,
                                has_omc, nre, bs_steps, V, nprobe,
                                window, has_rescale, rescale_lo,
                                rescale_hi,
                                has_filter=False, cand_given=False,
                                use_bs=False, nom_accum=True, hp=0):
        key = ("pruned_hy8", lp, lch, cap_l, C, k, T, exact, has_omc,
               nre, bs_steps, V, nprobe, window, has_rescale,
               rescale_lo, rescale_hi, has_filter, cand_given,
               use_bs, nom_accum, hp)
        step = self._steps.get(key)
        if step is not None:
            return step
        from ..ops.pruned import (
            _lower_bound, _prefix_candidates, _rescore_bsearch,
            _rescore_worklist, _sliced_candidates,
        )

        mesh, D = self.mesh, self.D
        NEG_INF = -1e30
        Ct = C if cand_given else C + V

        def shard_fn(p_doc, p_tf, p_etf, p_flen,
                     pre_st, pre_ln, pre_w, pre_fb, pre_av,
                     rng_st, rng_ln, rng_f,
                     wl_i, wl_f, wl_prev, idf, nd, thr,
                     mat8, sc8, doc8, unit_cen, owner, unit_local,
                     my_mat, my_sc, d2r,
                     queries, sim, omc, fmask, cand_in):
            sid = jax.lax.axis_index("d").astype(jnp.int32)
            tf_src = p_etf[0] if exact else p_tf[0]
            B = queries.shape[0]
            fm = fmask[0] if has_filter else None

            if cand_given:
                ft_cand = None  # small filter: cand_in IS the full set
            elif use_bs and not nom_accum:
                ft_cand = _sliced_candidates(
                    p_doc[0], pre_st[0], pre_ln[0], hp=hp, cap=cap_l
                )
            else:
                # fulltext nomination: shard-local top-C (local doc ids)
                ft_cand = _prefix_candidates(
                    p_doc[0], tf_src, p_flen[0],
                    pre_st[0], pre_ln[0], pre_w, pre_fb, pre_av,
                    idf, fm, lp=lp, cap=cap_l, C=C,
                )

            # IVF probe: global unit selection (centroids replicate),
            # each unit scanned by its owner, global top-V via
            # all_gather (same scanned-row set as the single-chip probe)
            mat_l, sc_l, doc_l = mat8[0], sc8[0], doc8[0]
            dim = mat_l.shape[1]
            nloc = mat_l.shape[0]
            _, probes = jax.lax.top_k(
                jnp.dot(
                    queries.astype(jnp.bfloat16),
                    unit_cen.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32,
                ),
                nprobe,
            )

            def per_query(qv, pr):
                qv = qv.astype(jnp.bfloat16)

                def body(carry, u):
                    vals, docs = carry
                    own = jnp.take(owner, u) == sid
                    j = jnp.take(unit_local, u)
                    start = jnp.minimum(j * window, nloc - window)
                    tile = jax.lax.dynamic_slice(
                        mat_l, (start, 0), (window, dim)
                    )
                    sc = jax.lax.dynamic_slice(sc_l, (start,), (window,))
                    dg = jax.lax.dynamic_slice(doc_l, (start,), (window,))
                    s = jnp.dot(
                        tile.astype(jnp.bfloat16), qv,
                        preferred_element_type=jnp.float32,
                    ) * sc
                    s = jnp.where(own & (sc > 0), s, NEG_INF)
                    cat_v = jnp.concatenate([vals, s])
                    cat_d = jnp.concatenate([docs, dg])
                    new_v, sel = jax.lax.top_k(cat_v, V)
                    new_d = jnp.take(cat_d, sel)
                    return (new_v, new_d), None

                init = (
                    jnp.full((V,), NEG_INF, jnp.float32),
                    jnp.full((V,), -1, jnp.int32),
                )
                (vals, docs), _ = jax.lax.scan(body, init, pr)
                return vals, docs

            lv, ld = jax.vmap(per_query)(queries, probes)
            av = jax.lax.all_gather(lv, "d", axis=1).reshape(B, D * V)
            ad = jax.lax.all_gather(ld, "d", axis=1).reshape(B, D * V)
            gv, sel = jax.lax.top_k(av, V)      # raw cosines (no rescale)
            gd = jnp.take_along_axis(ad, sel, axis=1)
            keep_p = (gd >= 0) & (gv > NEG_INF / 2)
            own_doc = keep_p & ((gd % D) == sid)
            my_vdocs = jnp.where(own_doc, gd // D, cap_l)  # (B, V) local
            if fm is not None:
                # out-of-filter probe hits never become candidates (and
                # in cand-given mode never fold onto filter docs)
                my_vdocs = jnp.where(
                    jnp.take(
                        fm, jnp.clip(my_vdocs, 0, cap_l - 1)
                    ) > 0.0,
                    my_vdocs, cap_l,
                )

            if cand_given:
                cand = cand_in[0]
            else:
                # candidate union (sorted; cap_l marks empty + dups)
                cand = jnp.concatenate([ft_cand, my_vdocs], axis=1)
                cand = jax.lax.sort(cand, dimension=1)
                dup = jnp.concatenate(
                    [jnp.zeros((B, 1), bool),
                     cand[:, 1:] == cand[:, :-1]],
                    axis=1,
                )
                cand = jnp.where(dup, cap_l, cand)
                cand = jax.lax.sort(cand, dimension=1)

            # exact BM25F over the union
            if use_bs:
                # v4: per-candidate binary searches into the shard's
                # slices of the unsplit spans; host IDF is exact under
                # the gate (nre == 0, unfiltered, non-exact tf)
                scores, matched = _rescore_bsearch(
                    p_doc[0], tf_src, p_flen[0],
                    rng_st[0], rng_ln[0],
                    rng_f[0], rng_f[1], rng_f[2],
                    idf, cand, bs_steps=bs_steps,
                )
            else:
                # global df via psum
                scores, matched = _rescore_worklist(
                    p_doc[0], tf_src, p_flen[0], wl_i[0], wl_f[0],
                    nd, cand, wl_prev[0] if nre else None, fm,
                    lch=lch, C=Ct, T=T, nre=nre, bs_steps=bs_steps,
                    axis_name="d",
                )

            # exact cosine per candidate: doc-aligned int8 row gather
            rows_c = jnp.take(
                d2r[0], jnp.clip(cand, 0, d2r[0].shape[0] - 1)
            )
            safe = jnp.clip(rows_c, 0, my_mat[0].shape[0] - 1)
            tiles = jnp.take(my_mat[0], safe, axis=0)   # (B, Ct, dim)
            sc_c = jnp.take(my_sc[0], safe)
            vec = jnp.einsum(
                "bcd,bd->bc",
                tiles.astype(jnp.bfloat16),
                queries.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ) * sc_c
            vec = jnp.where((rows_c >= 0) & (cand < cap_l), vec, 0.0)
            # multi-vector docs: fold the probe's own (possibly better)
            # row values back in — int8_doc2row keeps one representative
            pos_v = _lower_bound(cand, my_vdocs)
            posc = jnp.minimum(pos_v, Ct - 1)
            hit_v = (
                jnp.take_along_axis(cand, posc, axis=1) == my_vdocs
            ) & (my_vdocs < cap_l)
            probe_vals = jnp.where(hit_v, gv, 0.0)

            def fold_probe(vec_b, pos_b, val_b):
                return vec_b.at[pos_b].max(val_b)

            vec = jax.vmap(fold_probe)(vec, posc, probe_vals)
            if has_rescale:
                vec = jnp.clip(
                    (vec - rescale_lo) / (rescale_hi - rescale_lo),
                    0.0, 1.0,
                )
            vec = jnp.where(vec >= sim[:, None], vec, 0.0)

            # min-max fusion: span is the GLOBAL candidate max (pmax)
            ft_keep = (
                (scores > 0.0) & (matched >= thr[:, None])
                & (cand < cap_l)
            )
            vc_keep = (vec > 0.0) & (cand < cap_l)
            ft = jnp.where(ft_keep, scores, 0.0)
            vc = jnp.where(vc_keep, vec, 0.0)
            hi = jax.lax.pmax(
                jnp.maximum(jnp.max(ft, axis=1), jnp.max(vc, axis=1)),
                "d",
            )
            span = jnp.where(hi > 0.0, hi, 1.0)
            fused = (ft + vc) / span[:, None]
            if has_omc:
                omc_c = jnp.take(omc[0], jnp.clip(cand, 0, cap_l - 1))
                fused = fused * omc_c
            present = ft_keep | vc_keep
            counts = jax.lax.psum(
                jnp.sum(present, axis=1).astype(jnp.int32), "d"
            )
            s = jnp.where(present, fused, -jnp.inf)
            local_vals, ci = jax.lax.top_k(s, k)
            local_ids = jnp.take_along_axis(cand, ci, axis=1) * D + sid
            all_vals = jax.lax.all_gather(local_vals, "d", axis=1)
            all_ids = jax.lax.all_gather(local_ids, "d", axis=1)
            vals, sel2 = jax.lax.top_k(all_vals.reshape(B, D * k), k)
            ids = jnp.take_along_axis(
                all_ids.reshape(B, D * k), sel2, axis=1
            )
            return vals, ids, counts

        in_specs = (
            P("d", None), P("d", None), P("d", None), P("d", None),
            P("d", None, None, None), P("d", None, None, None),
            P(None, None, None), P(None, None, None),
            P(None, None, None),
            P("d", None, None, None) if use_bs else P(None, None, None),
            P("d", None, None, None) if use_bs else P(None, None, None),
            P(None, None, None, None) if use_bs else P(None, None, None),
            P("d", None, None), P("d", None, None),
            P("d", None, None, None) if nre else P(None, None, None),
            P(None, None), P(None), P(None),
            P("d", None, None), P("d", None), P("d", None),
            P(None, None), P(None), P(None),
            P("d", None, None), P("d", None), P("d", None),
            P(None, None), P(None),
            P("d", None) if has_omc else P(None),
            P("d", None) if has_filter else P(None),
            P("d", None, None) if cand_given else P(None, None),
        )
        fn = shard_map(
            shard_fn, mesh=mesh, in_specs=in_specs,
            out_specs=(P(None, None), P(None, None), P(None)),
            check_vma=False,
        )
        step = jax.jit(fn)
        self._steps[key] = step
        return step

    def search_topk_hybrid_int8_pruned(
        self,
        index: StringIndex,
        plans: Sequence[QueryPlan],
        n_docs: Sequence[float],
        cap: int,
        k: int,
        vector_index,                  # engine VectorIndex (int8/IVF)
        queries: np.ndarray,           # f32[B, dim] L2-normalized
        similarities: Sequence[float],
        exact: bool = False,
        thresholds: Optional[Sequence[float]] = None,
        omc: Optional[np.ndarray] = None,
        omc_key=None,
        rescale: Optional[Tuple[float, float]] = None,
        candidates: Optional[int] = None,
        mask: Optional[np.ndarray] = None,
        mask_key=None,
    ):
        """Pruned fused hybrid over the mesh — the contract of
        search_exec.HybridSearchTopK.search_topk_hybrid_int8_pruned
        (GLOBAL doc ids; counts are estimate-floored lower bounds;
        mask is one bool[cap] filter shared by every plan — small
        filters become the per-shard candidate lists with exact counts).
        Returns None when the vector index is not in int8/IVF mode."""
        from ..index.search_exec import (
            HYBRID_INT8_CANDIDATES, PrunedPlanMixin as PM,
        )

        probe = self.ensure_vectors_int8(vector_index)
        if probe is None:
            return None
        dev_slab, boundaries, bprefix = self.ensure_slab(index)
        h = self._pruned_shard_inputs(
            boundaries, bprefix, plans, n_docs, cap, thresholds, omc
        )
        B, Bb, Tb, lch, cap_l, C = (
            h["B"], h["Bb"], h["Tb"], h["lch"], h["cap_l"], h["C"]
        )
        nre, has_omc = h["nre"], h["has_omc"]
        wl_i, wl_f, wl_prev, thr = (
            h["wl_i"], h["wl_f"], h["wl_prev"], h["thr"]
        )
        doc_aligned = self.ensure_vectors_int8_pruned(
            vector_index, cap_l
        )
        if doc_aligned is None:
            return None
        mat8, sc8, doc8, unit_cen, owner, unit_local, window = probe
        my_mat, my_sc, d2r = doc_aligned
        from ..index.vector_index import IVF_NPROBE

        nprobe = min(IVF_NPROBE, int(unit_cen.shape[0]))
        V = round_up_pow2(
            min(candidates or HYBRID_INT8_CANDIDATES,
                int(mat8.shape[0] * mat8.shape[1]),
                round_up_pow2(cap, 8)),
            8,
        )
        has_filter = mask is not None
        fmask_dev = None
        cand_in = None
        cand_given = False
        sel = None
        if has_filter:
            fmask_dev, cand_in, cand_given, sel = (
                self._pruned_mask_shard_inputs(
                    mask, mask_key, cap, cap_l, Bb, C
                )
            )
        # v4 dispatch mirrors the single-device gate (VERDICT r3 #1)
        use_bs = (
            PM.PRUNED_BS and not exact and not has_filter and nre == 0
        )
        rng_dummy3 = jnp.zeros((1, 1, 1), jnp.int32)
        s_rng_st = s_rng_ln = rng_f_in = rng_dummy3
        bs_steps = h["bs_steps"]
        hp = 0
        if use_bs:
            s_rng_st, s_rng_ln, rng_f_in, bs_steps = (
                self._pruned_bs_shard_inputs(boundaries, bprefix, plans)
            )
            if PM.PRUNED_BS_ACCUM:
                C = min(PM.PRUNED_BS_C,
                        round_up_pow2(cap_l, 8))
            else:
                hp = PM.PRUNED_BS_HP
                C = (h["s_pre_st"].shape[2] * h["s_pre_st"].shape[3]
                     * hp)
        Ct = C if cand_given else C + V
        kb = min(round_up_pow2(k, 8), Ct)
        q = np.zeros((Bb, queries.shape[1]), np.float32)
        q[: len(queries)] = queries
        sims = np.zeros((Bb,), np.float32)
        for i, s in enumerate(similarities):
            sims[i] = s

        step = self._get_pruned_hybrid_step(
            lp=h["lp"], lch=lch, cap_l=cap_l, C=C, k=int(kb),
            T=int(Tb), exact=exact, has_omc=has_omc, nre=nre,
            bs_steps=bs_steps, V=int(V), nprobe=int(nprobe),
            window=int(window),
            has_rescale=rescale is not None,
            rescale_lo=float(rescale[0]) if rescale else 0.0,
            rescale_hi=float(rescale[1]) if rescale else 1.0,
            has_filter=has_filter, cand_given=cand_given,
            use_bs=use_bs, nom_accum=PM.PRUNED_BS_ACCUM, hp=hp,
        )
        p_doc, p_tf, p_etf, p_flen = dev_slab
        sh4 = NamedSharding(self.mesh, P("d", None, None, None))
        sh3 = NamedSharding(self.mesh, P("d", None, None))
        vals, ids, cand_counts = step(
            p_doc, p_tf, p_etf, p_flen,
            jax.device_put(h["s_pre_st"], sh4),
            jax.device_put(h["s_pre_ln"], sh4),
            jnp.asarray(h["pre_w"]), jnp.asarray(h["pre_fb"]),
            jnp.asarray(h["pre_av"]),
            jax.device_put(s_rng_st, sh4) if use_bs else rng_dummy3,
            jax.device_put(s_rng_ln, sh4) if use_bs else rng_dummy3,
            jnp.asarray(rng_f_in) if use_bs else rng_dummy3,
            jax.device_put(wl_i, sh3), jax.device_put(wl_f, sh3),
            jax.device_put(wl_prev, sh4) if nre else jnp.asarray(wl_prev),
            jnp.asarray(h["idf"]), jnp.asarray(h["nd"]),
            jnp.asarray(thr),
            mat8, sc8, doc8, unit_cen, owner, unit_local,
            my_mat, my_sc, d2r,
            jnp.asarray(q), jnp.asarray(sims),
            jax.device_put(
                h["omc_arr"], NamedSharding(self.mesh, P("d", None))
            ) if has_omc else jnp.asarray(h["omc_arr"]),
            fmask_dev if has_filter else jnp.ones((1,), jnp.float32),
            cand_in if cand_given else jnp.zeros((1, 1), jnp.int32),
        )
        if cand_given:
            counts = np.asarray(cand_counts[:B])
        else:
            sel_frac = 1.0
            if sel is not None:
                sel_frac = sel / max(float(h["nd"][0]), 1.0)
            counts = PM._pruned_counts(
                cand_counts, h["dfs"], h["nd"], thresholds, B,
                sel_frac=sel_frac,
            )
        return (
            np.asarray(vals[:B, :k]),
            np.asarray(ids[:B, :k]),
            counts,
        )


class ShardedBatchExec(ShardedStringExec):
    """SharedBatchExecutor contract over the doc-sharded mesh (VERDICT r2
    weak #2: the batched API — the headline throughput path — previously
    ran on one chip). Each unique token's postings are scored once PER
    SHARD into local dense rows (global df via psum inside
    ops/bm25.bm25_shared_partial), the assignment matmul distributes
    shard-locally, and one finalize step does threshold + OMC + local
    top-k + all_gather merge. Champion tokens revert to ranged classes
    (champion rows are global-doc-space dense; partitioning them is
    pointless when the ranged classes already amortize)."""

    def _get_shared_step(self, *, lr, cap_l, cu, exact, has_mask):
        key = ("shb", lr, cap_l, cu, exact, has_mask)
        step = self._steps.get(key)
        if step is not None:
            return step
        from ..ops.bm25 import bm25_shared_partial, bm25_shared_partial_masked

        mesh = self.mesh

        def shard_fn(p_doc, p_tf, p_etf, p_flen, st, ln, wt, fb, av,
                     tmap, nd, mask, scores, matched):
            if has_mask:
                s, m = bm25_shared_partial_masked(
                    p_doc[0], p_tf[0], p_etf[0], p_flen[0],
                    st[0], ln[0], wt, fb, av, tmap, mask[0], nd,
                    scores[0], matched[0],
                    lr=lr, cap=cap_l, cu=cu, exact=exact, axis_name="d",
                )
            else:
                s, m = bm25_shared_partial(
                    p_doc[0], p_tf[0], p_etf[0], p_flen[0],
                    st[0], ln[0], wt, fb, av, tmap, nd,
                    scores[0], matched[0],
                    lr=lr, cap=cap_l, cu=cu, exact=exact, axis_name="d",
                )
            return s[None], m[None]

        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P("d", None), P("d", None), P("d", None), P("d", None),
                P("d", None, None), P("d", None, None),
                P(None, None), P(None, None), P(None, None),
                P(None, None), P(),
                P("d", None, None) if has_mask else P(None, None),
                P("d", None, None), P("d", None, None),
            ),
            out_specs=(P("d", None, None), P("d", None, None)),
            check_vma=False,
        )
        step = jax.jit(fn)
        self._steps[key] = step
        return step

    def _get_finalize_step(self, *, cap_l, k, has_omc):
        key = ("fin", cap_l, k, has_omc)
        step = self._steps.get(key)
        if step is not None:
            return step
        mesh, D = self.mesh, self.D

        def shard_fn(scores, matched, thr, omc):
            s0, m0 = scores[0], matched[0]
            B = s0.shape[0]
            s = s0 * omc[0][None, :] if has_omc else s0
            keep = (m0 >= thr[:, None]) & (s0 > 0.0)
            counts = jax.lax.psum(
                jnp.sum(keep, axis=1).astype(jnp.int32), "d"
            )
            s = jnp.where(keep, s, -jnp.inf)
            local_vals, local_idx = jax.lax.top_k(s, k)
            sid = jax.lax.axis_index("d").astype(jnp.int32)
            local_ids = local_idx * D + sid
            all_vals = jax.lax.all_gather(local_vals, "d", axis=1)
            all_ids = jax.lax.all_gather(local_ids, "d", axis=1)
            vals, sel = jax.lax.top_k(all_vals.reshape(B, D * k), k)
            ids = jnp.take_along_axis(all_ids.reshape(B, D * k), sel, axis=1)
            return vals, ids, counts

        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P("d", None, None), P("d", None, None), P(None),
                P("d", None) if has_omc else P(None),
            ),
            out_specs=(P(None, None), P(None, None), P(None)),
            check_vma=False,
        )
        step = jax.jit(fn)
        self._steps[key] = step
        return step

    def _get_hybrid_tail_step(self, *, cap_l, k, has_omc, has_mask,
                              has_rescale, rescale_lo, rescale_hi):
        key = ("hyt", cap_l, k, has_omc, has_mask,
               has_rescale, rescale_lo, rescale_hi)
        step = self._steps.get(key)
        if step is not None:
            return step
        from ..ops.hybrid import _vector_dense_scores

        mesh, D = self.mesh, self.D

        def shard_fn(scores, matched, thr, sim, vec_m, vec_d, vec_v,
                     queries, mask, omc):
            s0, m0 = scores[0], matched[0]
            B = s0.shape[0]
            mloc = mask[0] if has_mask else jnp.ones((B, cap_l), bool)
            vec = _vector_dense_scores(
                vec_m[0].astype(jnp.bfloat16), vec_d[0], vec_v[0],
                queries, sim, cap=cap_l, has_rescale=has_rescale,
                rescale_lo=rescale_lo, rescale_hi=rescale_hi,
            )
            ft_keep = (s0 > 0.0) & (m0 >= thr[:, None]) & mloc
            vec_keep = (vec > 0.0) & mloc
            ft = jnp.where(ft_keep, s0, 0.0)
            vc = jnp.where(vec_keep, vec, 0.0)
            hi = jax.lax.pmax(
                jnp.maximum(jnp.max(ft, axis=1), jnp.max(vc, axis=1)), "d"
            )
            span = jnp.where(hi > 0.0, hi, 1.0)
            fused = (ft + vc) / span[:, None]
            if has_omc:
                fused = fused * omc[0][None, :]
            present = ft_keep | vec_keep
            counts = jax.lax.psum(
                jnp.sum(present, axis=1).astype(jnp.int32), "d"
            )
            fused = jnp.where(present, fused, -jnp.inf)
            local_vals, local_idx = jax.lax.top_k(fused, k)
            sid = jax.lax.axis_index("d").astype(jnp.int32)
            local_ids = local_idx * D + sid
            all_vals = jax.lax.all_gather(local_vals, "d", axis=1)
            all_ids = jax.lax.all_gather(local_ids, "d", axis=1)
            vals, sel = jax.lax.top_k(all_vals.reshape(B, D * k), k)
            ids = jnp.take_along_axis(all_ids.reshape(B, D * k), sel, axis=1)
            return vals, ids, counts

        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P("d", None, None), P("d", None, None), P(None), P(None),
                P("d", None, None), P("d", None), P("d", None),
                P(None, None),
                P("d", None, None) if has_mask else P(None, None),
                P("d", None) if has_omc else P(None),
            ),
            out_specs=(P(None, None), P(None, None), P(None)),
            check_vma=False,
        )
        step = jax.jit(fn)
        self._steps[key] = step
        return step

    def _get_hybrid_int8_tail_step(self, *, cap_l, k, V, nprobe, window,
                                   has_omc, has_mask, has_rescale,
                                   rescale_lo, rescale_hi):
        key = ("hy8", cap_l, k, V, nprobe, window, has_omc, has_mask,
               has_rescale, rescale_lo, rescale_hi)
        step = self._steps.get(key)
        if step is not None:
            return step
        mesh, D = self.mesh, self.D
        NEG_INF = -1e30

        def shard_fn(scores, matched, thr, sim, queries,
                     mat8, sc8, doc8, unit_cen, owner, unit_local,
                     mask, omc):
            s0, m0 = scores[0], matched[0]
            B = s0.shape[0]
            mloc = mask[0] if has_mask else jnp.ones((B, cap_l), bool)
            sid = jax.lax.axis_index("d").astype(jnp.int32)
            mat_l, sc_l, doc_l = mat8[0], sc8[0], doc8[0]
            dim = mat_l.shape[1]
            nloc = mat_l.shape[0]
            # global probe selection: unit centroids replicate, so every
            # shard picks the SAME top-nprobe units with no collective
            _, probes = jax.lax.top_k(
                jnp.dot(
                    queries.astype(jnp.bfloat16),
                    unit_cen.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32,
                ),
                nprobe,
            )  # (B, nprobe)

            def per_query(qv, pr):
                qv = qv.astype(jnp.bfloat16)

                def body(carry, u):
                    vals, docs = carry
                    own = jnp.take(owner, u) == sid
                    j = jnp.take(unit_local, u)
                    start = jnp.minimum(j * window, nloc - window)
                    tile = jax.lax.dynamic_slice(
                        mat_l, (start, 0), (window, dim)
                    )
                    sc = jax.lax.dynamic_slice(sc_l, (start,), (window,))
                    dg = jax.lax.dynamic_slice(doc_l, (start,), (window,))
                    s = jnp.dot(
                        tile.astype(jnp.bfloat16), qv,
                        preferred_element_type=jnp.float32,
                    ) * sc
                    s = jnp.where(own & (sc > 0), s, NEG_INF)
                    cat_v = jnp.concatenate([vals, s])
                    cat_d = jnp.concatenate([docs, dg])
                    new_v, sel = jax.lax.top_k(cat_v, V)
                    new_d = jnp.take(cat_d, sel)
                    return (new_v, new_d), None

                init = (
                    jnp.full((V,), NEG_INF, jnp.float32),
                    jnp.full((V,), -1, jnp.int32),
                )
                (vals, docs), _ = jax.lax.scan(body, init, pr)
                return vals, docs

            lv, ld = jax.vmap(per_query)(queries, probes)  # (B, V) local
            av = jax.lax.all_gather(lv, "d", axis=1).reshape(B, D * V)
            ad = jax.lax.all_gather(ld, "d", axis=1).reshape(B, D * V)
            gv, sel = jax.lax.top_k(av, V)
            gd = jnp.take_along_axis(ad, sel, axis=1)
            if has_rescale:
                gv = jnp.clip(
                    (gv - rescale_lo) / (rescale_hi - rescale_lo), 0.0, 1.0
                )
            keep = (gd >= 0) & (gv >= sim[:, None]) & (gv > NEG_INF / 2)
            gv = jnp.where(keep, gv, 0.0)
            # route candidates to their owning doc shard's local space
            own_doc = keep & ((gd % D) == sid)
            slot = jnp.where(own_doc, gd // D, cap_l)

            def scatter_max(vals_b, slots_b):
                acc = jnp.zeros((cap_l + 1,), jnp.float32)
                return acc.at[slots_b].max(vals_b)[:cap_l]

            vec = jax.vmap(scatter_max)(
                jnp.where(own_doc, gv, 0.0), slot
            )
            vec = jnp.where(mloc, vec, 0.0)
            ft_keep = (s0 > 0.0) & (m0 >= thr[:, None]) & mloc
            vec_keep = vec > 0.0
            ft = jnp.where(ft_keep, s0, 0.0)
            hi = jax.lax.pmax(
                jnp.maximum(jnp.max(ft, axis=1), jnp.max(vec, axis=1)), "d"
            )
            span = jnp.where(hi > 0.0, hi, 1.0)
            fused = (ft + vec) / span[:, None]
            if has_omc:
                fused = fused * omc[0][None, :]
            present = ft_keep | vec_keep
            counts = jax.lax.psum(
                jnp.sum(present, axis=1).astype(jnp.int32), "d"
            )
            fused = jnp.where(present, fused, -jnp.inf)
            local_vals, local_idx = jax.lax.top_k(fused, k)
            local_ids = local_idx * D + sid
            all_vals = jax.lax.all_gather(local_vals, "d", axis=1)
            all_ids = jax.lax.all_gather(local_ids, "d", axis=1)
            vals, sel2 = jax.lax.top_k(all_vals.reshape(B, D * k), k)
            ids = jnp.take_along_axis(
                all_ids.reshape(B, D * k), sel2, axis=1
            )
            return vals, ids, counts

        fn = shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(
                P("d", None, None), P("d", None, None), P(None), P(None),
                P(None, None),
                P("d", None, None), P("d", None), P("d", None),
                P(None, None), P(None), P(None),
                P("d", None, None) if has_mask else P(None, None),
                P("d", None) if has_omc else P(None),
            ),
            out_specs=(P(None, None), P(None, None), P(None)),
            check_vma=False,
        )
        step = jax.jit(fn)
        self._steps[key] = step
        return step

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
        vector_index=None,             # hybrid: engine VectorIndex
        queries: Optional[np.ndarray] = None,
        similarities: Optional[Sequence[float]] = None,
        rescale: Optional[Tuple[float, float]] = None,
        candidates: Optional[int] = None,
        token_weight_of: Optional[Dict[str, float]] = None,
    ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Mesh-sharded batched search. Returns None when a hybrid batch
        can't shard its vector layout (callers fall back)."""
        from ..index.search_exec import (
            SHARED_CHUNK_BY_CLASS,
            analyze_shared_batch,
            pack_shared_class,
        )

        hybrid = vector_index is not None
        vecs = vec8t = None
        if hybrid:
            vecs = self.ensure_vectors(vector_index)
            if vecs is None:
                vec8t = self.ensure_vectors_int8(vector_index)
                if vec8t is None:
                    return None
        dev_slab, boundaries, bprefix = self.ensure_slab(index)
        D = self.D
        u_ranges, _champs, token_map_global, classes, B, T = (
            analyze_shared_batch(
                index, tokens_per_query, properties, boost, field_params,
                # impact_cap cutpoints don't align to the boundary
                # prefix; the mesh spreads work 1/D per chip instead
                exact, tolerance, None, use_champions=False,
                token_weight_of=token_weight_of,
            )
        )
        cap_l = round_up_pow2((cap + D - 1) // D, 128)
        kb = min(round_up_pow2(k, 8), cap_l)

        has_masks = doc_masks is not None and any(
            m is not None for m in doc_masks
        )
        sh3 = NamedSharding(self.mesh, P("d", None, None))
        sh2 = NamedSharding(self.mesh, P("d", None))
        if has_masks:
            gm = np.ones((B, cap), bool)
            for i, m in enumerate(doc_masks):
                if m is not None:
                    gm[i, : len(m)] = m
                    gm[i, len(m):] = False
            mask_dev = jax.device_put(
                self._partition_docs_axis(gm, cap_l, False), sh3
            )
        else:
            mask_dev = jnp.zeros((1, 1), bool)
        has_omc = omc is not None
        if has_omc:
            go = np.ones((cap,), np.float32)
            go[: min(len(omc), cap)] = omc[:cap]
            omc_dev = jax.device_put(
                self._partition_docs_axis(go, cap_l, np.float32(1.0)), sh2
            )
        else:
            omc_dev = jnp.ones((1,), jnp.float32)

        # sharded device-side zeros (a host np.zeros + device_put here
        # costs two O(D*B*cap_l) host allocations + H2D per batch)
        zkey = ("zeros", B, cap_l)
        zfn = self._steps.get(zkey)
        if zfn is None:
            zfn = self._steps[zkey] = jax.jit(
                lambda: jnp.zeros((D, B, cap_l), jnp.float32),
                out_shardings=sh3,
            )
        scores = zfn()
        matched = zfn()
        p_doc, p_tf, p_etf, p_flen = dev_slab
        for lr_class, uids in classes.items():
            if not uids:
                continue
            cu = SHARED_CHUNK_BY_CLASS[lr_class]
            st, ln, wt, fb, av, tmap, _lrb = pack_shared_class(
                u_ranges, uids, token_map_global, B, T, cu
            )
            s_st, s_ln = self._shard_ranges_on(
                boundaries, bprefix, D, st, ln
            )  # (D, Up, NRb)
            lrb = round_up_pow2(max(1, int(s_ln.max())), 8)
            step = self._get_shared_step(
                lr=int(lrb), cap_l=int(cap_l), cu=cu, exact=exact,
                has_mask=has_masks,
            )
            scores, matched = step(
                p_doc, p_tf, p_etf, p_flen,
                jax.device_put(s_st, sh3), jax.device_put(s_ln, sh3),
                jnp.asarray(wt), jnp.asarray(fb), jnp.asarray(av),
                jnp.asarray(tmap), jnp.float32(max(n_docs, 1.0)),
                mask_dev, scores, matched,
            )

        thr = np.zeros((B,), np.float32)
        if thresholds is not None:
            for i, t in enumerate(thresholds):
                thr[i] = t or 0.0
        if not hybrid:
            step = self._get_finalize_step(
                cap_l=int(cap_l), k=int(kb), has_omc=has_omc,
            )
            vals, ids, counts = step(
                scores, matched, jnp.asarray(thr), omc_dev
            )
        else:
            q = np.asarray(queries, np.float32)
            sims = np.asarray(similarities, np.float32)
            if vecs is not None:
                step = self._get_hybrid_tail_step(
                    cap_l=int(cap_l), k=int(kb), has_omc=has_omc,
                    has_mask=has_masks,
                    has_rescale=rescale is not None,
                    rescale_lo=float(rescale[0]) if rescale else 0.0,
                    rescale_hi=float(rescale[1]) if rescale else 1.0,
                )
                vec_m, vec_d, vec_v = vecs
                vals, ids, counts = step(
                    scores, matched, jnp.asarray(thr), jnp.asarray(sims),
                    vec_m, vec_d, vec_v, jnp.asarray(q),
                    mask_dev, omc_dev,
                )
            else:
                (mat8, sc8, doc8, unit_cen, owner, unit_local,
                 window) = vec8t
                from ..index.search_exec import HYBRID_INT8_CANDIDATES

                V = round_up_pow2(
                    min(candidates or HYBRID_INT8_CANDIDATES,
                        int(mat8.shape[0] * mat8.shape[1]),
                        round_up_pow2(cap, 8)), 8
                )
                from ..index.vector_index import IVF_NPROBE

                nprobe = min(IVF_NPROBE, int(unit_cen.shape[0]))
                step = self._get_hybrid_int8_tail_step(
                    cap_l=int(cap_l), k=int(kb), V=int(V),
                    nprobe=int(nprobe), window=int(window),
                    has_omc=has_omc, has_mask=has_masks,
                    has_rescale=rescale is not None,
                    rescale_lo=float(rescale[0]) if rescale else 0.0,
                    rescale_hi=float(rescale[1]) if rescale else 1.0,
                )
                vals, ids, counts = step(
                    scores, matched, jnp.asarray(thr), jnp.asarray(sims),
                    jnp.asarray(q), mat8, sc8, doc8, unit_cen, owner,
                    unit_local, mask_dev, omc_dev,
                )
        return (
            np.asarray(vals[:, :k]),
            np.asarray(ids[:, :k]),
            np.asarray(counts[:B]),
        )
