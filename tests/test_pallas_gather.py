"""Pallas DMA gather correctness (interpret mode on CPU; the compiled
path is validated on the TPU in benches)."""

import numpy as np
import pytest


def test_gather_windows_interpret(monkeypatch):
    import jax
    from jax.experimental import pallas as pl

    # run the pallas kernel in interpreter mode on CPU
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    from oramacore_tpu.ops import pallas_gather

    rng = np.random.default_rng(0)
    P, W, NS = 1 << 16, 1024, 32
    src = rng.integers(0, 1000, P + W).astype(np.int32)
    starts = (rng.integers(0, P // 1024, NS) * 1024).astype(np.int32)
    out = pallas_gather.gather_windows(
        jax.numpy.asarray(src), jax.numpy.asarray(starts),
        w=W, rows_per_program=8,
    )
    out = np.asarray(out)
    for i in range(NS):
        np.testing.assert_array_equal(out[i], src[starts[i] : starts[i] + W])


def test_align_down():
    from oramacore_tpu.ops.pallas_gather import align_down

    assert align_down(0) == 0
    assert align_down(1023) == 0
    assert align_down(1024) == 1024
    assert align_down(5000) == 4096
