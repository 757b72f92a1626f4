"""AWQ op: outlier-channel protection, never-worse guarantee, GPTQ
stacking, scaled int4 serving path."""

import numpy as np
import pytest

import jax.numpy as jnp

from vlm_compression_tpu.ops.awq import (
    apply_awq,
    awq_int4_matmul,
    awq_rtn_quantize,
    awq_search,
    unscale_weight,
)
from vlm_compression_tpu.ops.gptq import gptq_quantize, rtn_quantize


def _outlier_calib(units=16, cols=32, n=512, seed=0, outliers=3):
    """A few input channels carry 20x activations (the AWQ motivation)."""
    rng = np.random.RandomState(seed)
    X = rng.standard_normal((n, cols))
    X[:, :outliers] *= 20.0
    H = (2.0 / n) * X.T @ X
    W = rng.standard_normal((units, cols)).astype(np.float32)
    scaler_row = (X ** 2).sum(0)
    return (jnp.asarray(W), jnp.asarray(H, jnp.float32),
            jnp.asarray(scaler_row, jnp.float32))


def _obs_loss(W, Wq, H):
    D = np.asarray(W, np.float64) - np.asarray(Wq, np.float64)
    return float(np.einsum("ui,ij,uj->", D, np.asarray(H, np.float64), D))


def test_awq_beats_plain_rtn_on_outliers():
    W, H, sr = _outlier_calib()
    sc = awq_search(W, sr, H, bits=4, groupsize=8)
    assert sc.s.shape == (32,)
    wq = awq_rtn_quantize(W, sc.s, bits=4, groupsize=8)
    l_awq = _obs_loss(W, wq, H)
    l_rtn = _obs_loss(W, rtn_quantize(W, bits=4, groupsize=8), H)
    assert l_awq < l_rtn, (l_awq, l_rtn)
    # outlier channels get up-scaled relative to the median channel
    s = np.asarray(sc.s)
    assert s[:3].min() > np.median(s[3:])


def test_awq_never_worse_than_identity():
    """The injected all-ones candidate caps the loss at plain RTN."""
    W, H, sr = _outlier_calib(seed=5, outliers=0)  # no outliers
    sc = awq_search(W, sr, H, bits=4, groupsize=8)
    wq = awq_rtn_quantize(W, sc.s, bits=4, groupsize=8)
    l_awq = _obs_loss(W, wq, H)
    l_rtn = _obs_loss(W, rtn_quantize(W, bits=4, groupsize=8), H)
    assert l_awq <= l_rtn * (1 + 1e-6)


def test_awq_gptq_stacking():
    """AWQ scaling + GPTQ on the transformed problem beats plain GPTQ on
    outlier-heavy calibration data."""
    W, H, sr = _outlier_calib(seed=7)
    sc = awq_search(W, sr, H, bits=4, groupsize=8)
    Ws, Hs = apply_awq(W, H, sc.s)
    res = gptq_quantize(Ws, Hs, bits=4, groupsize=8, blocksize=16)
    wq = unscale_weight(res.weight, sc.s)
    l_stack = _obs_loss(W, wq, H)
    l_gptq = _obs_loss(
        W, gptq_quantize(W, H, bits=4, groupsize=8, blocksize=16).weight, H)
    assert l_stack < l_gptq, (l_stack, l_gptq)


def test_awq_int4_serving_path():
    """Scaled-space int4 storage + activation compensation reproduces the
    fake-quant matmul."""
    from vlm_compression_tpu.ops.gptq import gptq_to_int4_params

    W, H, sr = _outlier_calib(seed=9)
    sc = awq_search(W, sr, H, bits=4, groupsize=8)
    Ws, Hs = apply_awq(W, H, sc.s)
    res = gptq_quantize(Ws, Hs, bits=4, groupsize=8, sym=True, blocksize=16)
    packed, scale = gptq_to_int4_params(res)
    x = jnp.asarray(np.random.RandomState(0).standard_normal((4, 32)),
                    jnp.float32)
    y = awq_int4_matmul(x, packed, scale, sc.s)
    y_ref = x @ unscale_weight(res.weight, sc.s).T
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
