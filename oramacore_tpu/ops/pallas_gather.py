"""Pallas DMA range-gather: fetch posting windows with explicit
double-buffered HBM→VMEM DMAs.

The default scoring path fetches posting ranges with vmapped
`dynamic_slice` (XLA gather-of-slices). This kernel is the hand-scheduled
alternative: each program issues async DMA copies for its windows,
overlapping the next window's transfer with the previous one's wait.

Mosaic constraints (discovered on TPU v5e):
- 1-D HBM slices must start at multiples of 1024 (int32 tiling) — callers
  align window starts down to 1024 and carry the intra-window offset;
  `pl.multiple_of` conveys the proof to the compiler.
- DMA destinations into 2-D VMEM rows violate (8, 128) tiling; the
  output is laid out 1-D and windows land at i*W offsets.

Measured: on the axon-tunneled v5e both paths are environment-bound and
equal (~37 ms / 34 MB); on directly-attached hardware the DMA pipeline
is the speed-of-light path for large window sets.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALIGN = 1024  # HBM slice alignment for int32/float32 1-D memrefs


def align_down(start: int) -> int:
    return start & ~(ALIGN - 1)


@functools.partial(jax.jit, static_argnames=("w", "rows_per_program"))
def gather_windows(
    src: jax.Array,             # 1-D slab, padded by >= w at the end
    aligned_starts: jax.Array,  # int32[NS], multiples of ALIGN
    *,
    w: int,                     # window length, multiple of ALIGN
    rows_per_program: int = 16,
) -> jax.Array:
    """Returns (NS, w) windows: src[aligned_starts[i] : +w]."""
    assert w % ALIGN == 0, "window must be a multiple of the HBM alignment"
    ns = aligned_starts.shape[0]
    assert ns % rows_per_program == 0

    def kernel(starts_ref, src_ref, out_ref):
        pid = pl.program_id(0)

        def body(sems):
            def get(i, slot):
                s0 = pl.multiple_of(
                    starts_ref[pid * rows_per_program + i], ALIGN
                )
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds(s0, w)],
                    out_ref.at[pl.ds(i * w, w)],
                    sems.at[slot],
                )

            get(0, 0).start()

            def loop(i, _):
                @pl.when(i + 1 < rows_per_program)
                def _():
                    get(i + 1, (i + 1) % 2).start()

                get(i, i % 2).wait()
                return 0

            jax.lax.fori_loop(0, rows_per_program, loop, 0)

        pl.run_scoped(body, pltpu.SemaphoreType.DMA((2,)))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ns // rows_per_program,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (rows_per_program * w,), lambda i, *_: (i,),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((ns * w,), src.dtype),
        # 1-D scalar prefetch: SMEM pads the last dim to 128 lanes, so a
        # (grid, rows) layout would waste ~32x the scalar budget and OOM
        # SMEM at a few thousand windows
    )(aligned_starts.reshape(-1), src)
    return out.reshape(ns, w)
