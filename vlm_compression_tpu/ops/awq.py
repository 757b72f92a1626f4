"""AWQ: activation-aware weight scaling for low-bit quantization
(beyond-reference).

Salient input channels (large activations) suffer most from weight
quantization.  AWQ rescales per input channel before quantizing —
``W' = W·diag(s)`` with the activation stream compensating ``x' = x/s`` —
so salient channels get finer effective grids.  The scale exponent is
searched per layer: ``s_j = sx_j^α / wmax_j^(1−α)`` (sx = RMS activation
magnitude from the calibration ``scaler_row`` statistic the Wanda sweep
already accumulates; wmax = per-channel weight absmax), α ∈ [0, 1]
chosen to minimize the OBS objective ``Σ_u (W−Ŵ) H (W−Ŵ)ᵀ`` on the
calibration Hessian — no extra data passes.

Composes with both quantizers:
  * ``awq_rtn_quantize`` — scale → round-to-nearest → unscale (the
    classic AWQ recipe);
  * ``apply_awq`` → ``gptq_quantize`` on the scaled problem (the Hessian
    transforms as ``diag(1/s)·H·diag(1/s)`` because the effective input
    is x/s), then ``unscale_weight`` — AWQ+GPTQ stacking.

Serving keeps weights in SCALED space (codes + grid scales) plus the
(in,)-vector ``s``; ``awq_int4_matmul`` divides activations by ``s`` on
the way into the dot (one fused elementwise op, no extra HBM traffic).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vlm_compression_tpu.ops.gptq import _find_params


class AWQScales(NamedTuple):
    s: jnp.ndarray        # (in,) per-channel scales (scaled space = W·s)
    alpha: jnp.ndarray    # () chosen exponent
    losses: jnp.ndarray   # (n_alphas,) OBS loss per candidate


def _rtn_grouped(W, bits, groupsize, sym):
    """RTN fake-quant of (units, cols) with grouped grids; returns deq."""
    units, cols = W.shape
    maxq = (1 << bits) - 1
    if groupsize <= 0 or cols % groupsize != 0:
        groupsize = cols
    slabs = W.reshape(units, cols // groupsize, groupsize)

    def one(slab):
        sc, zc = _find_params(slab, maxq, sym)
        q = jnp.clip(jnp.round(slab / sc[:, None]) + zc[:, None], 0, maxq)
        return sc[:, None] * (q - zc[:, None])

    return jax.vmap(one, in_axes=1, out_axes=1)(slabs).reshape(units, cols)


@functools.partial(jax.jit,
                   static_argnames=("bits", "groupsize", "sym", "n_alphas"))
def awq_search(weight_um: jnp.ndarray, scaler_row: jnp.ndarray,
               hessian: jnp.ndarray, bits: int = 4, groupsize: int = 128,
               sym: bool = True, n_alphas: int = 21) -> AWQScales:
    """Grid-search α on the OBS objective.  α = 0 → s ∝ 1/wmax (weight
    equalization only); the all-ones candidate (plain RTN) is injected so
    AWQ never does worse than no scaling."""
    W = weight_um.astype(jnp.float32)
    H = hessian.astype(jnp.float32)
    sx = jnp.sqrt(jnp.maximum(scaler_row.astype(jnp.float32), 1e-12))
    wmax = jnp.maximum(jnp.max(jnp.abs(W), axis=0), 1e-12)
    alphas = jnp.linspace(0.0, 1.0, n_alphas)

    def candidate(alpha):
        s = jnp.power(sx, alpha) / jnp.power(wmax, 1.0 - alpha)
        s = s / jnp.sqrt(jnp.max(s) * jnp.min(s))       # AWQ normalization
        return jnp.clip(s, 1e-4, 1e4)

    cand = jax.vmap(candidate)(alphas)                   # (A, in)
    cand = jnp.concatenate([cand, jnp.ones((1, W.shape[1]))], axis=0)

    def loss_of(s):
        deq = _rtn_grouped(W * s[None, :], bits, groupsize, sym) / s[None, :]
        D = W - deq
        return jnp.einsum("ui,ij,uj->", D, H, D,
                          precision=jax.lax.Precision.HIGHEST)

    losses = jax.lax.map(loss_of, cand)                  # bounds memory
    best = jnp.argmin(losses)
    alpha = jnp.where(best < n_alphas,
                      alphas[jnp.minimum(best, n_alphas - 1)], -1.0)
    return AWQScales(s=cand[best], alpha=alpha, losses=losses)


def apply_awq(weight_um: jnp.ndarray, hessian: jnp.ndarray,
              s: jnp.ndarray):
    """(W·diag(s), diag(1/s)·H·diag(1/s)) — the scaled problem whose
    inputs are x/s; feed to gptq_quantize / rtn, then unscale_weight."""
    W = weight_um.astype(jnp.float32) * s[None, :]
    H = hessian.astype(jnp.float32) / (s[:, None] * s[None, :])
    return W, H


def unscale_weight(weight_scaled: jnp.ndarray, s: jnp.ndarray):
    return weight_scaled / s[None, :]


@functools.partial(jax.jit, static_argnames=("bits", "groupsize", "sym"))
def awq_rtn_quantize(weight_um: jnp.ndarray, s: jnp.ndarray,
                     bits: int = 4, groupsize: int = 128,
                     sym: bool = True) -> jnp.ndarray:
    """Classic AWQ: fake-quant weights in ORIGINAL space."""
    W = weight_um.astype(jnp.float32)
    deq = _rtn_grouped(W * s[None, :], bits, groupsize, sym) / s[None, :]
    return deq.astype(weight_um.dtype)


def awq_int4_matmul(x: jnp.ndarray, packed: jnp.ndarray,
                    scale: jnp.ndarray, s: jnp.ndarray,
                    mask=None) -> jnp.ndarray:
    """y = (x/s) @ dequant(packed, scale): int4 weights stored in scaled
    space, activation compensation fused into the operand read."""
    from vlm_compression_tpu.ops.quant import int4_matmul

    return int4_matmul(x / s.astype(x.dtype), packed, scale, mask=mask)
