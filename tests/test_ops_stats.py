"""Calibration statistics vs the reference's hook recurrences (torch oracle)."""

import jax.numpy as jnp
import numpy as np
import torch

from vlm_compression_tpu.ops.stats import (
    finalize_hessian,
    init_calib_stats,
    update_calib_stats,
)


class TorchWrappedOracle:
    """Reference recurrences: wanda_pruner.py:68-81, dsnot_pruner.py:79-104,
    sparsegpt_pruner.py:68-79 — one `add_batch` per calibration sample."""

    def __init__(self, cols):
        self.scaler_row = torch.zeros(cols, dtype=torch.float64)
        self.sum_metric_row = torch.zeros(cols, dtype=torch.float64)
        self.mean = torch.zeros(cols, 1, dtype=torch.float64)
        self.var = torch.zeros(cols, 1, dtype=torch.float64)
        self.H = torch.zeros(cols, cols, dtype=torch.float64)
        self.nsamples = 0
        self.ntokens = 0

    def add_batch(self, inp):  # inp: (tokens, cols)
        t = torch.from_numpy(inp).double().t()  # (cols, tokens)
        tmp = 1
        mean_i = t.mean(dim=1, keepdim=True)
        var_i = t.var(dim=1, unbiased=False, keepdim=True)
        num = t.shape[1]
        if self.ntokens == 0:
            self.var, self.mean = var_i, mean_i
        else:
            self.var = (self.var * self.ntokens + var_i * num) / (self.ntokens + num)
            self.mean = (self.mean * self.ntokens + mean_i * num) / (self.ntokens + num)
        self.ntokens += num

        self.scaler_row *= self.nsamples / (self.nsamples + tmp)
        self.sum_metric_row *= self.nsamples / (self.nsamples + tmp)
        self.H *= self.nsamples / (self.nsamples + tmp)
        self.nsamples += tmp
        self.scaler_row += torch.norm(t, p=2, dim=1) ** 2 / self.nsamples
        self.sum_metric_row += t.sum(dim=1) / self.nsamples
        s = (2 / self.nsamples) ** 0.5 * t
        self.H += s.matmul(s.t())


def test_stats_match_reference_recurrences():
    rng = np.random.default_rng(0)
    n_samples, tokens, cols = 12, 7, 5
    xs = rng.standard_normal((n_samples, tokens, cols)).astype(np.float32)

    oracle = TorchWrappedOracle(cols)
    for i in range(n_samples):
        oracle.add_batch(xs[i])

    # fold in two uneven batches — the pure accumulator is batch-shape
    # independent for scaler/sum/H
    stats = init_calib_stats(cols, with_hessian=True)
    stats = update_calib_stats(stats, jnp.asarray(xs[:5]))
    stats = update_calib_stats(stats, jnp.asarray(xs[5:]))

    np.testing.assert_allclose(
        np.asarray(stats.scaler_row), oracle.scaler_row.numpy(), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(stats.sum_metric_row), oracle.sum_metric_row.numpy(),
        rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(finalize_hessian(stats)), oracle.H.numpy(), rtol=1e-4, atol=1e-5)


def test_var_matches_per_sample_updates():
    """DSnoT's var is a token-weighted mean of per-update variances; feeding
    one sample per update reproduces the bs=1 reference exactly."""
    rng = np.random.default_rng(1)
    n_samples, tokens, cols = 6, 9, 4
    xs = rng.standard_normal((n_samples, tokens, cols)).astype(np.float32)

    oracle = TorchWrappedOracle(cols)
    for i in range(n_samples):
        oracle.add_batch(xs[i])

    stats = init_calib_stats(cols)
    for i in range(n_samples):
        stats = update_calib_stats(stats, jnp.asarray(xs[i][None]))

    np.testing.assert_allclose(
        np.asarray(stats.var), oracle.var[:, 0].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(stats.mean), oracle.mean[:, 0].numpy(), rtol=1e-4, atol=1e-5)


def test_token_mask_excludes_padding():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 3)).astype(np.float32)
    tm = np.array([[1, 1, 0, 0], [1, 1, 1, 0]], np.float32)

    stats = init_calib_stats(3)
    stats = update_calib_stats(stats, jnp.asarray(x), token_mask=jnp.asarray(tm))

    valid = np.concatenate([x[0, :2], x[1, :3]], axis=0)
    np.testing.assert_allclose(
        np.asarray(stats.ssq), (valid ** 2).sum(0), rtol=1e-5)
    assert int(stats.ntokens) == 5
