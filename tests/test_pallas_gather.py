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


def test_score_windows_interpret(monkeypatch):
    """Fused gather+ntf kernel matches the numpy oracle (interpret mode;
    compiled path validated on TPU in benches/pallas_bench.py)."""
    import jax
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    from oramacore_tpu.ops import pallas_score

    rng = np.random.default_rng(1)
    P, W, NS = 1 << 16, 1024, 16
    p_doc = rng.integers(0, 5000, P + W).astype(np.int32)
    p_tf = rng.integers(0, 4, P + W).astype(np.float32)
    p_flen = rng.uniform(1, 50, P + W).astype(np.float32)
    starts = (rng.integers(0, P // 1024, NS) * 1024).astype(np.int32)
    b = rng.uniform(0.3, 0.9, NS)
    avg = rng.uniform(5, 40, NS)
    params = np.stack([
        rng.uniform(0.5, 2.0, NS),      # weight
        1.0 - b,                        # 1 - b
        b / avg,                        # b / avg
        np.zeros(NS),
    ], axis=1).astype(np.float32)

    docs, ntf = pallas_score.score_windows(
        jax.numpy.asarray(p_doc), jax.numpy.asarray(p_tf),
        jax.numpy.asarray(p_flen), jax.numpy.asarray(starts),
        jax.numpy.asarray(params), w=W, rows_per_program=8,
    )
    exp_docs, exp_ntf = pallas_score.host_score_windows(
        p_doc, p_tf, p_flen, starts, params, W
    )
    np.testing.assert_array_equal(np.asarray(docs), exp_docs)
    np.testing.assert_allclose(np.asarray(ntf), exp_ntf, rtol=1e-5)
