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


def _int8_matmul_ref(x, q, mask):
    """XLA fallback: expand to float (XLA may or may not fuse the convert
    into the dot — the Pallas path below guarantees the int8 weights stay
    int8 in HBM and expand per-tile in VMEM)."""
    qf = q.astype(x.dtype)
    if mask is not None:
        from vlm_compression_tpu.ops.bitmask import is_packed, unpack_mask
        from vlm_compression_tpu.ops.masked_linear import infer_pack_group

        if is_packed(mask):
            mask = unpack_mask(mask, q.shape[0],
                               infer_pack_group(q.shape[0], mask.shape[0]))
        qf = jnp.where(mask, qf, jnp.zeros((), qf.dtype))
    return jax.lax.dot_general(
        x, qf, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _int8_matmul_pallas(x2, q, packed):
    """y2 = x2 @ dequant-in-VMEM(q [⊙ packed-mask]).  Weight tiles travel
    HBM→VMEM as int8 (half of bf16 bytes, quarter of fp32) and expand on
    the VPU right before the MXU; the packed-mask variant also expands
    2-bit/weight mask words there (same interleave as masked_matmul_packed)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from vlm_compression_tpu.ops.masked_linear import _pick

    m, k = x2.shape
    _, n = q.shape
    bm = _pick(m, (256, 128, 64, 32, 16, 8))
    bn = _pick(n, (512, 256, 128))
    # packed masks pin bk to their pack group (128 = 2-bit, 256 = 1-bit)
    if packed is not None:
        from vlm_compression_tpu.ops.masked_linear import infer_pack_group

        bk = infer_pack_group(k, packed.shape[0])
    else:
        bk = 128
    if bm is None or bn is None or k % bk != 0:
        return None

    def kernel(*refs):
        if packed is not None:
            x_ref, w_ref, m_ref, o_ref, acc_ref = refs
        else:
            x_ref, w_ref, o_ref, acc_ref = refs

        @pl.when(pl.program_id(2) == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        w = w_ref[:].astype(x_ref.dtype)
        if packed is not None:
            words = pltpu.repeat(m_ref[:], w.shape[0] // 8, axis=0)
            shift = (jax.lax.broadcasted_iota(jnp.uint32, w.shape, 0)
                     // jnp.uint32(8))
            bits = (words >> shift) & jnp.uint32(1)
            w = jnp.where(bits == jnp.uint32(1), w, jnp.zeros((), w.dtype))
        acc_ref[:] += jnp.dot(x_ref[:], w,
                              preferred_element_type=jnp.float32)

        @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, l: (i, l)),
        pl.BlockSpec((bk, bn), lambda i, j, l: (l, j)),
    ]
    args = [x2, q]
    if packed is not None:
        in_specs.append(pl.BlockSpec((8, bn), lambda i, j, l: (l, j)))
        args.append(packed)
    return pl.pallas_call(
        kernel,
        grid=(m // bm, n // bn, k // bk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x2.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(*args)


# Pallas path is OPT-IN: it keeps weight tiles int8 in HBM (half of bf16
# bytes) and expands them in VMEM, but the int8→float relayout inside the
# kernel measured 8× slower than XLA's expand+dot at (256×2048×2048) on a
# v5e — int8 VMEM tiles are 32-sublane, float 8/16-sublane, and Mosaic's
# cross-tiling convert is expensive.  XLA's fallback is the measured-fast
# default; flip this for memory-bound serving where HBM bytes dominate.
_USE_PALLAS_INT8 = False


def use_pallas_int8_matmul(enable: bool) -> None:
    global _USE_PALLAS_INT8
    _USE_PALLAS_INT8 = enable


def int8_matmul(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                mask=None) -> jnp.ndarray:
    """y = (x @ (q ⊙ mask)) · scale, scale applied to the output column.

    Weights live in HBM as int8 (4× smaller than fp32 at rest).  The
    compute path is XLA expand+dot by default; `use_pallas_int8_matmul`
    selects the fused per-tile VMEM expansion (see note above).
    """
    from vlm_compression_tpu.ops.bitmask import is_packed

    lead = x.shape[:-1]
    out = None
    if (_USE_PALLAS_INT8 and jax.default_backend() == "tpu"
            and (mask is None or is_packed(mask))):
        x2 = x.reshape(-1, x.shape[-1])
        out = _int8_matmul_pallas(x2, q, mask)
        if out is not None:
            out = out.reshape(*lead, q.shape[1])
    if out is None:
        out = _int8_matmul_ref(x, q, mask)
    return (out * scale).astype(x.dtype)


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


# ---------------------------------------------------------------------------
# Int4 weight-only quantization (beyond-reference; the reference's
# bitsandbytes era predates 4-bit inference).  Grouped absmax symmetric:
# each (group input rows × output column) block gets its own scale, which
# is what keeps 4-bit usable (a single per-column scale clips too hard).
# Storage is two nibbles per uint8 byte — adjacent input rows 2i / 2i+1
# share a byte (low/high nibble) — because this build's native S4 dtype
# does not materialize; 4 bits/weight at rest either way, an 8× reduction
# vs fp32 and 4× vs bf16 on the HBM weight stream.
# ---------------------------------------------------------------------------

INT4_GROUP = 128


def quantize_weight_int4(w: jnp.ndarray, group: int = INT4_GROUP):
    """(in, out) float → (packed uint8 (in/2, out), scale f32 (in/g, out)).

    Requires in % group == 0 (all tower linears are 128-multiples).
    q ∈ [-7, 7]; byte = nibble(row 2i) | nibble(row 2i+1) << 4."""
    K, N = w.shape
    if K % group or group % 2:
        raise ValueError(f"in_features {K} not a multiple of group {group}")
    wf = w.astype(jnp.float32).reshape(K // group, group, N)
    a = jnp.max(jnp.abs(wf), axis=1)
    scale = jnp.maximum(a, 1e-12) / 7.0                     # (K/g, N)
    q = jnp.clip(jnp.round(wf / scale[:, None, :]), -7, 7)
    q = q.astype(jnp.int32).reshape(K, N)
    lo = q[0::2] & 0xF
    hi = q[1::2] & 0xF
    return (lo | (hi << 4)).astype(jnp.uint8), scale


def unpack_int4(packed: jnp.ndarray, dtype=jnp.int8) -> jnp.ndarray:
    """(in/2, out) uint8 → (in, out) sign-extended int values."""
    p = packed.astype(jnp.int32)
    lo = p & 0xF
    hi = (p >> 4) & 0xF
    lo = lo - 16 * (lo >= 8)
    hi = hi - 16 * (hi >= 8)
    k2, n = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * k2, n).astype(dtype)


def dequantize_weight_int4(packed: jnp.ndarray, scale: jnp.ndarray,
                           dtype=jnp.float32) -> jnp.ndarray:
    K = 2 * packed.shape[0]
    g = K // scale.shape[0]
    q = unpack_int4(packed, jnp.float32).reshape(K // g, g, scale.shape[1])
    return (q * scale[:, None, :]).reshape(K, -1).astype(dtype)


def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                mask=None) -> jnp.ndarray:
    """y = x @ (dequant(packed, scale) [⊙ mask]).

    Grouped scales vary along the CONTRACTED axis, so they cannot be
    folded into the output like the int8 per-column scale — the weight
    dequantizes on the way into the dot.  XLA fuses the unpack+scale into
    the dot's operand read; HBM traffic stays at 4 bits/weight."""
    K = 2 * packed.shape[0]
    eff = dequantize_weight_int4(packed, scale, x.dtype)
    if mask is not None:
        from vlm_compression_tpu.ops.bitmask import is_packed, unpack_mask
        from vlm_compression_tpu.ops.masked_linear import infer_pack_group

        if is_packed(mask):
            mask = unpack_mask(mask, K, infer_pack_group(K, mask.shape[0]))
        eff = jnp.where(mask, eff, jnp.zeros((), eff.dtype))
    return jax.lax.dot_general(
        x, eff, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def quantize_params_tree_int4(params: dict, group: int = INT4_GROUP,
                              min_size: int = 0) -> dict:
    """Every 2-D ``kernel`` (≥ min_size elements, in-dim a group multiple)
    → ``kernel_q4`` (nibble-packed uint8) + 2-D ``kernel_scale``.  The
    float ``kernel`` entry is REMOVED (SparseLinear detects ``kernel_q4``
    and skips declaring it)."""
    if not isinstance(params, dict):
        return params
    out = {}
    for k, v in params.items():
        out[k] = (quantize_params_tree_int4(v, group, min_size)
                  if isinstance(v, dict) else v)
    kern = out.get("kernel")
    if (kern is not None and getattr(kern, "ndim", 0) == 2
            and kern.size >= min_size and kern.shape[0] % group == 0
            and jnp.issubdtype(kern.dtype, jnp.floating)):
        q, s = quantize_weight_int4(kern, group)
        del out["kernel"]
        out["kernel_q4"] = q
        out["kernel_scale"] = s
    return out


def int8_matmul_dynamic(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                        mask=None) -> jnp.ndarray:
    """True int8×int8 product: activations quantize per-ROW (absmax
    symmetric) at runtime, the int8×int8 dot accumulates in int32 on the
    MXU (double the bf16 rate on v5e-class chips), and the rank-1 outer
    product of (row activation scale) × (column weight scale) rescales the
    int32 result.

    This is the W8A8 half of the reference's bitsandbytes LLM.int8 scheme
    WITHOUT the fp16 outlier decomposition — accurate enough for towers
    without emergent outlier features (ViT, small/medium LMs); prefer
    `int8_matmul` (W8 only) where activation outliers matter.
    """
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    ax = jnp.max(jnp.abs(x2), axis=1)
    sx = jnp.maximum(ax, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x2 / sx[:, None]), -127, 127).astype(jnp.int8)
    qw = q
    if mask is not None:
        from vlm_compression_tpu.ops.bitmask import is_packed, unpack_mask
        from vlm_compression_tpu.ops.masked_linear import infer_pack_group

        if is_packed(mask):
            mask = unpack_mask(mask, q.shape[0],
                               infer_pack_group(q.shape[0], mask.shape[0]))
        qw = jnp.where(mask, q, jnp.zeros((), q.dtype))
    acc = jax.lax.dot_general(
        xq, qw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx[:, None] * scale[None, :]
    return y.reshape(*lead, q.shape[1]).astype(x.dtype)


def int8_matmul_outlier(x: jnp.ndarray, q: jnp.ndarray, scale: jnp.ndarray,
                        mask=None, num_outliers: int = 32) -> jnp.ndarray:
    """W8A8 with mixed-precision outlier decomposition — the full
    LLM.int8 scheme (Dettmers et al. 2022) the reference reaches through
    bitsandbytes ``Linear8bitLt`` (peft/tuners/lora.py:505-637).

    TPU-native twist: bitsandbytes thresholds outlier COLUMNS dynamically
    (``|x| > 6.0``), which produces data-dependent shapes XLA can't
    compile.  Here the ``num_outliers`` highest-magnitude activation
    feature columns (static k) stay in float and multiply dequantized
    weight rows; the remaining columns are zeroed BEFORE per-row absmax
    quantization, so emergent outlier features no longer blow up the
    int8 scale of everything else.  Two extra skinny matmul + gathers,
    all static shapes.
    """
    lead = x.shape[:-1]
    K, N = q.shape
    x2 = x.reshape(-1, K).astype(jnp.float32)
    k = min(int(num_outliers), K)
    col_mag = jnp.max(jnp.abs(x2), axis=0)                 # (K,)
    _, idx = jax.lax.top_k(col_mag, k)                     # static k
    x_out = jnp.take(x2, idx, axis=1)                      # (M, k)
    w_rows = jnp.take(q, idx, axis=0).astype(jnp.float32) * scale[None, :]
    if mask is not None:
        from vlm_compression_tpu.ops.bitmask import is_packed, unpack_mask
        from vlm_compression_tpu.ops.masked_linear import infer_pack_group

        if is_packed(mask):
            mask = unpack_mask(mask, K, infer_pack_group(K, mask.shape[0]))
        w_rows = jnp.where(jnp.take(mask, idx, axis=0), w_rows, 0.0)
    y_out = jnp.dot(x_out, w_rows, preferred_element_type=jnp.float32)
    # zero the outlier columns so they neither re-enter the int8 product
    # nor inflate the per-row activation scales
    keep = jnp.ones((K,), bool).at[idx].set(False)
    x_rest = jnp.where(keep[None, :], x2, 0.0)
    y_int = int8_matmul_dynamic(x_rest, q, scale, mask).astype(jnp.float32)
    y = y_int.reshape(-1, N) + y_out
    return y.reshape(*lead, N).astype(x.dtype)


# When enabled, SparseLinear's int8 paths use the W8A8 dynamic product
# (per-row activation quantization + int8×int8 MXU) instead of the
# weight-only expand+dot — measured 7.8× faster at 2048³ on a v5e, at the
# cost of activation rounding error.  _INT8_OUTLIERS > 0 switches to the
# outlier-decomposed variant (int8_matmul_outlier) for towers with
# emergent outlier features.
_DYNAMIC_INT8 = False
_INT8_OUTLIERS = 0


def set_int8_outliers(k: int) -> None:
    global _INT8_OUTLIERS
    _INT8_OUTLIERS = int(k)


def int8_outliers() -> int:
    return _INT8_OUTLIERS


def select_int8_matmul():
    """The active int8 product for SparseLinear's quantized paths:
    weight-only expand+dot (default) → W8A8 dynamic (`use_dynamic_int8`)
    → W8A8 + outlier decomposition (`set_int8_outliers(k>0)`)."""
    import functools

    if not _DYNAMIC_INT8:
        return int8_matmul
    if _INT8_OUTLIERS > 0:
        return functools.partial(int8_matmul_outlier,
                                 num_outliers=_INT8_OUTLIERS)
    return int8_matmul_dynamic


def use_dynamic_int8(enable: bool) -> None:
    global _DYNAMIC_INT8
    _DYNAMIC_INT8 = enable


def dynamic_int8_enabled() -> bool:
    return _DYNAMIC_INT8
