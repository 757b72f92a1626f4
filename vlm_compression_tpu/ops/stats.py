"""Calibration statistics as pure fold functions.

The reference gathers per-linear input statistics with forward hooks and a
stateful ``WrappedGPT`` (wanda_pruner.py:51-81, dsnot_pruner.py:53-104,
sparsegpt_pruner.py:52-79).  Here the same quantities are sufficient
statistics in a pytree, updated by a pure function that the calibration
engine folds over batches *inside* jit — no hooks, no host round-trips, and
all samples of a batch are processed in one fused pass.

Quantities (all fp32, per input column):
  scaler_row      = Σ_tokens x² / n_samples          (Wanda ‖X‖₂² statistic)
  sum_metric_row  = Σ_tokens x  / n_samples          (DSnoT signed metric)
  mean, var       = token-weighted mean of per-update means/variances
                    (DSnoT regrowth de-weighting)
  hessian         = (2 / n_samples) Σ XᵀX            (SparseGPT)

`n_samples` counts calibration *samples* (sequences), matching the
reference's per-sample hook accounting (its hooks fire once per sample at
calibration batch size 1).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class CalibStats(NamedTuple):
    nsamples: jnp.ndarray        # () int32 — calibration samples folded in
    ntokens: jnp.ndarray         # () int32 — total tokens folded in
    ssq: jnp.ndarray             # (in,) Σ x²  over all tokens
    ssum: jnp.ndarray            # (in,) Σ x   over all tokens
    var_acc: jnp.ndarray         # (in,) Σ_updates var_u · tokens_u
    mean_acc: jnp.ndarray        # (in,) Σ_updates mean_u · tokens_u
    hessian: Optional[jnp.ndarray]  # (in, in) Σ XᵀX, or None if not needed

    # -- derived (final) quantities ---------------------------------------
    @property
    def scaler_row(self) -> jnp.ndarray:
        return self.ssq / jnp.maximum(self.nsamples, 1).astype(jnp.float32)

    @property
    def sum_metric_row(self) -> jnp.ndarray:
        return self.ssum / jnp.maximum(self.nsamples, 1).astype(jnp.float32)

    @property
    def mean(self) -> jnp.ndarray:
        return self.mean_acc / jnp.maximum(self.ntokens, 1).astype(jnp.float32)

    @property
    def var(self) -> jnp.ndarray:
        return self.var_acc / jnp.maximum(self.ntokens, 1).astype(jnp.float32)


def init_calib_stats(in_features: int, with_hessian: bool = False) -> CalibStats:
    z = jnp.zeros((in_features,), jnp.float32)
    h = jnp.zeros((in_features, in_features), jnp.float32) if with_hessian else None
    return CalibStats(
        nsamples=jnp.zeros((), jnp.int32),
        ntokens=jnp.zeros((), jnp.int32),
        ssq=z,
        ssum=z,
        var_acc=z,
        mean_acc=z,
        hessian=h,
    )


def update_calib_stats(stats: CalibStats, x: jnp.ndarray,
                       token_mask: Optional[jnp.ndarray] = None) -> CalibStats:
    """Fold one batch of activations into the statistics.

    x          : (batch, tokens, in) activations feeding the linear.
    token_mask : optional (batch, tokens) 1/0 validity mask (padding).

    Per-update mean/var follow the reference recurrence
    (dsnot_pruner.py:88-94): variance is computed over this update's valid
    tokens and folded in weighted by token count.
    """
    x = x.astype(jnp.float32)
    if x.ndim == 2:
        x = x[None]
    b, t, d = x.shape
    if token_mask is not None:
        m = token_mask.astype(jnp.float32)[..., None]      # (b, t, 1)
        x = x * m
        n_tok = jnp.sum(token_mask).astype(jnp.int32)
        n_tok_f = jnp.maximum(n_tok, 1).astype(jnp.float32)
    else:
        n_tok = jnp.asarray(b * t, jnp.int32)
        n_tok_f = jnp.asarray(b * t, jnp.float32)

    flat = x.reshape(b * t, d)
    ssq_u = jnp.sum(flat * flat, axis=0)
    ssum_u = jnp.sum(flat, axis=0)
    mean_u = ssum_u / n_tok_f
    var_u = ssq_u / n_tok_f - mean_u * mean_u

    new = CalibStats(
        nsamples=stats.nsamples + b,
        ntokens=stats.ntokens + n_tok,
        ssq=stats.ssq + ssq_u,
        ssum=stats.ssum + ssum_u,
        var_acc=stats.var_acc + var_u * n_tok_f,
        mean_acc=stats.mean_acc + mean_u * n_tok_f,
        hessian=None,
    )
    if stats.hessian is not None:
        # Σ XᵀX — one MXU matmul per update.  Precision pinned (default
        # HIGHEST, shared VCT_OBS_PRECISION knob): DEFAULT-precision f32
        # dots go through reduced-precision fast paths (~1e-3 relative on
        # TPU and on this CPU backend's oneDNN), which systematically
        # perturbs every OBS Hessian off-diagonal vs the reference's fp32
        # torch.matmul — measured 2.7e-4 relative H error flipping up to
        # 33% of SparseGPT mask bits on correlated inputs (round 5).
        from vlm_compression_tpu.ops.sparsegpt import _PRECISION

        h = stats.hessian + jax.lax.dot_general(
            flat, flat, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PRECISION,
        )
        new = new._replace(hessian=h)
    return new


def finalize_hessian(stats: CalibStats) -> jnp.ndarray:
    """H = (2/n_samples) Σ XᵀX — the reference's running-average telescopes to
    exactly this (sparsegpt_pruner.py:68-79)."""
    if stats.hessian is None:
        raise ValueError("stats were initialised without a Hessian")
    return stats.hessian * (2.0 / jnp.maximum(stats.nsamples, 1).astype(jnp.float32))
