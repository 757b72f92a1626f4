"""Decode-time KV cache storage, shared by every autoregressive tower.

The flax idiom (first ``mutable("cache")`` apply over a full-length dummy
creates the buffers; later calls write step k/v at ``cache_index``) was
repeated inline in t5/llama/opt — factored here, plus an **int8 mode**
(beyond-reference, production serving): cached keys/values are stored as
int8 codes with one fp32 absmax scale per (batch, slot, head), halving
persistent decode memory vs bf16 (4× vs fp32).  Dequantization happens on
read as a fused elementwise op; attention math is unchanged (the
round-trip error is per-token-per-head absmax int8, ~0.3% RMS).

The reference threads HF ``past_key_values`` (modeling_t5.py:491-653,
modeling_llama.py:161-280) and has no quantized-cache option.

``cache_index`` remains the only integer leaf, so speculative decoding's
cache rollback (models/generation._rollback_cache_index) works unchanged
for both storage modes.

**Per-row mode** (``per_row=True``, beyond-reference): ``cache_index``
is (b,)-shaped and every row writes at its own frontier (vmapped slice
updates).  Plain greedy decode gains nothing (all rows advance by 1 —
keep the scalar index, whose contiguous update is cheaper than a
scatter); speculative decoding at batch > 1 gains the full per-row
acceptance: with a shared index the batch can only advance by the
MINIMUM accepted length across rows, with per-row indices each row
commits its own accepted prefix.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_kv(x):
    """(b, n, h, d) → int8 codes + fp32 scales (b, n, h)."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(a, 1e-8) / 127.0
    codes = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                     -127, 127).astype(jnp.int8)
    return codes, scale


def dequantize_kv(codes, scales, dtype):
    return (codes.astype(jnp.float32) * scales[..., None]).astype(dtype)


def _row_update(buf, upd, cur):
    """Write ``upd`` (b, n, ...) into ``buf`` (b, N, ...) starting at the
    per-row slot ``cur`` (b,) — the vmapped dynamic_update_slice behind
    per-row caches."""
    zeros = (0,) * (buf.ndim - 2)
    return jax.vmap(
        lambda bf, up, c: jax.lax.dynamic_update_slice(
            bf, up, (c,) + zeros))(buf, upd, cur)


def cache_kv(mod, k, v, int8: bool = False, per_row: bool = False):
    """Create/advance the decode cache inside an ``nn.compact`` module.

    k/v are this step's (b, n, h, d) projections.  Returns
    ``(k_all, v_all, cur, initialized)``: the full-length cache contents
    (dequantized in int8 mode), the write position BEFORE this step
    (scalar, or (b,) with ``per_row``), and whether the cache already
    existed (False during the shape-init pass, where k/v pass through
    untouched and define the buffer length).
    """
    initialized = mod.has_variable("cache", "cached_key")
    ishape = (k.shape[0],) if per_row else ()
    ci = mod.variable("cache", "cache_index",
                      lambda: jnp.zeros(ishape, jnp.int32))
    upd = (_row_update if per_row else
           lambda buf, u, c: jax.lax.dynamic_update_slice(
               buf, u, (0, c) + (0,) * (buf.ndim - 2)))
    if not int8:
        ck = mod.variable("cache", "cached_key",
                          lambda: jnp.zeros(k.shape, k.dtype))
        cv = mod.variable("cache", "cached_value",
                          lambda: jnp.zeros(v.shape, v.dtype))
        if not initialized:
            return k, v, ci.value, False
        cur = ci.value
        k_all = upd(ck.value, k, cur)
        v_all = upd(cv.value, v, cur)
        ck.value, cv.value = k_all, v_all
        ci.value = cur + k.shape[1]
        return k_all, v_all, cur, True

    def zc(x):
        return lambda: jnp.zeros(x.shape, jnp.int8)

    def zs(x):
        return lambda: jnp.zeros(x.shape[:-1], jnp.float32)

    # "cached_key" doubles as the int8 code buffer so initialized-checks
    # and cache-length introspection stay uniform across modes
    ck = mod.variable("cache", "cached_key", zc(k))
    cks = mod.variable("cache", "cached_key_scale", zs(k))
    cv = mod.variable("cache", "cached_value", zc(v))
    cvs = mod.variable("cache", "cached_value_scale", zs(v))
    if not initialized:
        return k, v, ci.value, False
    cur = ci.value
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    ck.value = upd(ck.value, kq, cur)
    cks.value = upd(cks.value, ks, cur)
    cv.value = upd(cv.value, vq, cur)
    cvs.value = upd(cvs.value, vs, cur)
    ci.value = cur + k.shape[1]
    k_all = dequantize_kv(ck.value, cks.value, k.dtype)
    v_all = dequantize_kv(cv.value, cvs.value, v.dtype)
    return k_all, v_all, cur, True


def step_visibility_mask(cur, n, max_len, prev_mask=None):
    """Per-query causal visibility over the cache: query cur+i sees slots
    j ≤ cur+i (stays correct for multi-token cache priming, the property
    speculative decoding's chunked verify relies on).  ``cur`` is the
    scalar cache index, or (b,) per-row indices (per-row caches)."""
    qpos = jnp.reshape(cur, (-1, 1)) + jnp.arange(n)[None]     # (1|b, n)
    vis = (jnp.arange(max_len)[None, None, None, :]
           <= qpos[:, None, :, None])                  # (1|b, 1, n, max)
    step = jnp.where(vis, 0.0, -1e9)
    return step if prev_mask is None else prev_mask + step
