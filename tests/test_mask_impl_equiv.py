"""The bisection rank-selection path must be BIT-IDENTICAL to the sorted
formulation (VCT_MASK_IMPL) — random metrics, stress ties, degenerate k."""

import numpy as np
import pytest

import jax.numpy as jnp

from vlm_compression_tpu.ops import masks as M


def _both(fn_name, metric, *args):
    fn = getattr(M, fn_name)
    old = M._RANK_IMPL
    try:
        M._RANK_IMPL = "sort"
        a = np.asarray(fn(jnp.asarray(metric), *args))
        M._RANK_IMPL = "bisect"
        b = np.asarray(fn(jnp.asarray(metric), *args))
    finally:
        M._RANK_IMPL = old
    return a, b


def _metrics(rng, shape, ties):
    m = np.abs(rng.standard_normal(shape)).astype(np.float32)
    if ties:
        m[..., 5 % shape[-1]] = m[..., 2 % shape[-1]]  # duplicated columns
        m[0, :] = 0.125                                # a fully-tied row
        m[..., 9 % shape[-1]] = 0.0                    # pruned-weight zeros
    return m


@pytest.mark.parametrize("ties", [False, True])
@pytest.mark.parametrize("sparsity", [0.0, 0.27, 0.5, 1.0])
def test_unstructured_equivalence(ties, sparsity):
    rng = np.random.default_rng(3)
    for shape in [(8, 16), (5, 33), (1, 7)]:
        m = _metrics(rng, shape, ties)
        a, b = _both("unstructured_mask", m, sparsity)
        np.testing.assert_array_equal(a, b, err_msg=f"{shape} s={sparsity}")


@pytest.mark.parametrize("ties", [False, True])
def test_unstructured_round_equivalence(ties):
    rng = np.random.default_rng(4)
    m = _metrics(rng, (6, 18), ties)
    fn = M.unstructured_mask
    old = M._RANK_IMPL
    try:
        M._RANK_IMPL = "sort"
        a = np.asarray(fn(jnp.asarray(m), 0.25, rounding="round"))
        M._RANK_IMPL = "bisect"
        b = np.asarray(fn(jnp.asarray(m), 0.25, rounding="round"))
    finally:
        M._RANK_IMPL = old
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("ties", [False, True])
@pytest.mark.parametrize("sparsity", [0.0, 0.5, 0.9])
def test_flat_threshold_equivalence(ties, sparsity):
    rng = np.random.default_rng(5)
    m = _metrics(rng, (7, 12), ties)
    a, b = _both("flat_threshold_mask", m, sparsity)
    np.testing.assert_array_equal(a, b, err_msg=f"s={sparsity}")


@pytest.mark.parametrize("ties", [False, True])
@pytest.mark.parametrize("sparsity", [0.0, 0.33, 0.5])
def test_global_threshold_equivalence(ties, sparsity):
    rng = np.random.default_rng(6)
    m = _metrics(rng, (6, 11), ties)
    # global pruner magnitude scores are SIGNED (round-4 parity finding)
    m[1] = -np.abs(m[1])
    a, b = _both("global_threshold_mask", m, sparsity)
    np.testing.assert_array_equal(a, b, err_msg=f"s={sparsity}")
