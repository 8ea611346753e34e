"""Pallas fused BM25 window scoring: DMA posting windows and compute
normalized TF in VMEM — tf/flen windows never round-trip through HBM.

The default scoring path (ops/bm25.py) fetches posting ranges with
vmapped `dynamic_slice` and computes
    ntf = w * tf / ((1 - b) + b * flen / avg)
as a separate XLA stage, which materializes the gathered tf and flen
windows in HBM between the two. This kernel folds the two stages: each
program double-buffers async HBM→VMEM copies of its (doc, tf, flen)
windows and computes ntf while the next window's DMAs are in flight,
writing only (docs, ntf) back — 2 output streams instead of 3 plus the
refetch (ROADMAP round-3 item 1; gather-only variant measured
environment-bound on the axon tunnel, see ops/pallas_gather.py).

Same Mosaic constraints as the gather kernel: 1-D HBM slices start at
multiples of 1024, so callers align starts down and mask the leading
slots downstream (tf=0 padding never contributes, but the leading slots
of an aligned window can belong to a neighboring term's range).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_gather import ALIGN, align_down  # noqa: F401  (re-export)


@functools.partial(jax.jit, static_argnames=("w", "rows_per_program"))
def score_windows(
    p_doc: jax.Array,           # int32[P + pad] postings: doc ids
    p_tf: jax.Array,            # f32[P + pad] term frequencies
    p_flen: jax.Array,          # f32[P + pad] field length per posting
    aligned_starts: jax.Array,  # int32[NS] window starts (ALIGN multiples)
    params: jax.Array,          # f32[NS, 4]: weight, 1-b, b/avg, unused
    *,
    w: int,                     # window length, multiple of ALIGN
    rows_per_program: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Returns (docs int32[NS, w], ntf f32[NS, w]) where
    ntf[i] = weight * tf / ((1-b) + (b/avg) * flen) for window i."""
    assert w % ALIGN == 0, "window must be a multiple of the HBM alignment"
    ns = aligned_starts.shape[0]
    assert ns % rows_per_program == 0

    def kernel(starts_ref, params_ref, pdoc_ref, ptf_ref, pflen_ref,
               docs_out_ref, ntf_out_ref):
        pid = pl.program_id(0)

        def body(tf_buf, fl_buf, sems):
            # scratch is 1-D with windows at slot*w offsets: DMAs into a
            # row of a 2-D VMEM buffer violate the (8, 128) tiling
            def copies(i, slot):
                s0 = pl.multiple_of(
                    starts_ref[pid * rows_per_program + i], ALIGN
                )
                dst = pl.multiple_of(slot * w, ALIGN)
                return (
                    pltpu.make_async_copy(
                        pdoc_ref.at[pl.ds(s0, w)],
                        docs_out_ref.at[pl.ds(i * w, w)],
                        sems.at[0, slot],
                    ),
                    pltpu.make_async_copy(
                        ptf_ref.at[pl.ds(s0, w)],
                        tf_buf.at[pl.ds(dst, w)],
                        sems.at[1, slot],
                    ),
                    pltpu.make_async_copy(
                        pflen_ref.at[pl.ds(s0, w)],
                        fl_buf.at[pl.ds(dst, w)],
                        sems.at[2, slot],
                    ),
                )

            for c in copies(0, 0):
                c.start()

            def loop(i, _):
                slot = jax.lax.rem(i, 2)

                @pl.when(i + 1 < rows_per_program)
                def _():
                    for c in copies(i + 1, jax.lax.rem(i + 1, 2)):
                        c.start()

                for c in copies(i, slot):
                    c.wait()
                base = (pid * rows_per_program + i) * 4
                wt = params_ref[base]
                one_minus_b = params_ref[base + 1]
                b_over_avg = params_ref[base + 2]
                src = pl.ds(pl.multiple_of(slot * w, ALIGN), w)
                tf = tf_buf[src]
                fl = fl_buf[src]
                denom = one_minus_b + b_over_avg * fl
                ntf = wt * tf / jnp.maximum(denom, 1e-9)
                ntf_out_ref[pl.ds(i * w, w)] = ntf
                return 0

            jax.lax.fori_loop(0, rows_per_program, loop, 0)

        pl.run_scoped(
            body,
            pltpu.VMEM((2 * w,), jnp.float32),
            pltpu.VMEM((2 * w,), jnp.float32),
            pltpu.SemaphoreType.DMA((3, 2)),
        )

    docs, ntf = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ns // rows_per_program,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(
                    (rows_per_program * w,), lambda i, *_: (i,),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (rows_per_program * w,), lambda i, *_: (i,),
                    memory_space=pltpu.VMEM,
                ),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((ns * w,), jnp.int32),
            jax.ShapeDtypeStruct((ns * w,), jnp.float32),
        ],
    )(
        # 1-D scalar-prefetch arrays: SMEM pads the last dim to 128
        # lanes, so multi-dim layouts waste ~32x the scalar budget
        aligned_starts.reshape(-1),
        params.reshape(-1),
        p_doc, p_tf, p_flen,
    )
    return docs.reshape(ns, w), ntf.reshape(ns, w)


def host_score_windows(p_doc, p_tf, p_flen, aligned_starts, params, w):
    """Numpy oracle for the kernel."""
    import numpy as np

    docs = np.stack([p_doc[s : s + w] for s in aligned_starts])
    tf = np.stack([p_tf[s : s + w] for s in aligned_starts])
    fl = np.stack([p_flen[s : s + w] for s in aligned_starts])
    wt = params[:, 0:1]
    omb = params[:, 1:2]
    boa = params[:, 2:3]
    ntf = wt * tf / np.maximum(omb + boa * fl, 1e-9)
    return docs, ntf.astype(np.float32)
