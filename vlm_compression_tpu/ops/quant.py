"""Int8 weight quantization — the TPU-native counterpart of the
reference's optional bitsandbytes path (peft/tuners/lora.py:505-637:
``Linear8bitLt``/``MergedLinear8bitLt``, reached via ``load_in_8bit``).

Per-OUTPUT-channel absmax symmetric quantization (bitsandbytes' vector-wise
scheme for weights): for kernel ``W (in, out)``,

    scale_j = max_i |W_ij| / 127        q_ij = round(W_ij / scale_j) ∈ int8
    W_ij ≈ q_ij · scale_j

The dequantized matmul runs as int8-weight × activation with the per-column
scale folded into the OUTPUT (y_j = (x @ q)_j · scale_j) — one fp32 scale
multiply per output element instead of dequantizing W in HBM.  Masks
compose freely: zeroed weights quantize to 0, and the masked path applies
the bool/packed mask to q before the product exactly like the fp path.

``quantize_params_tree`` converts a variables tree in place-of: every 2-D
``kernel`` becomes int8 with a ``kernel_scale`` sibling; SparseLinear
detects the int8 dtype and uses the scaled product.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray):
    """(in, out) float → (q int8 (in, out), scale f32 (out,))."""
    a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scale = jnp.maximum(a, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale[None, :]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_weight(q: jnp.ndarray, scale: jnp.ndarray,
                      dtype=jnp.float32) -> jnp.ndarray:
    return (q.astype(jnp.float32) * scale[None, :]).astype(dtype)


def int8_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                mask=None) -> jnp.ndarray:
    """y = (x @ (q ⊙ mask)) · scale, scale applied to the output column.

    The int8 weight feeds the MXU directly (int8 inputs accumulate in
    int32/float32); only the per-output scale multiply happens at fp32.
    """
    qf = q.astype(x.dtype)
    if mask is not None:
        from vlm_compression_tpu.ops.bitmask import is_packed, unpack_mask

        if is_packed(mask):
            mask = unpack_mask(mask, q.shape[0])
        qf = jnp.where(mask, qf, jnp.zeros((), qf.dtype))
    y = jax.lax.dot_general(
        x, qf, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (y * scale).astype(x.dtype)


def quantize_params_tree(params: dict, min_size: int = 0) -> dict:
    """Quantize every 2-D ``kernel`` ≥ min_size elements to int8 +
    ``kernel_scale``.  Biases/norms/embeddings stay in their dtype."""
    if not isinstance(params, dict):
        return params
    out = {}
    for k, v in params.items():
        if isinstance(v, dict):
            new = quantize_params_tree(v, min_size)
            out[k] = new
        else:
            out[k] = v
    kern = out.get("kernel")
    if (kern is not None and getattr(kern, "ndim", 0) == 2
            and kern.dtype != jnp.int8 and kern.size >= min_size
            and jnp.issubdtype(kern.dtype, jnp.floating)):
        q, s = quantize_weight(kern)
        out["kernel"] = q
        out["kernel_scale"] = s
    return out


def dequantize_params_tree(params: dict, dtype=jnp.float32) -> dict:
    """Inverse of quantize_params_tree (lossy: returns q·scale)."""
    if not isinstance(params, dict):
        return params
    out = {k: dequantize_params_tree(v, dtype) if isinstance(v, dict) else v
           for k, v in params.items()}
    if "kernel" in out and getattr(out["kernel"], "dtype", None) == jnp.int8 \
            and "kernel_scale" in out:
        out["kernel"] = dequantize_weight(out["kernel"],
                                          out.pop("kernel_scale"), dtype)
    return out
