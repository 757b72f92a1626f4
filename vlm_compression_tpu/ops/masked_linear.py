"""Fused masked matmul — the sparse forward path.

The reference applies masks by materializing ``(W + BA·α/r)·mask`` in HBM
every forward (peft/tuners/lora.py:359-382).  On TPU that costs a full
weight-sized HBM round-trip per layer per step.  Here the mask multiply
happens on the *tile in VMEM* right before it enters the MXU — a Pallas
blocked matmul whose W-tile is masked in registers, so sparsity costs
nothing at the memory system level.

Three mathematical modes (mirroring lora.py semantics):
  dense       y = x · W                      (teacher path: mask+LoRA bypassed)
  masked      y = x · (W ⊙ M)               (pruned model, no adapters)
  sparse_lora y = x · ((W + A·B·s) ⊙ M)     (SparseLoRA: mask over the sum)
  lora        y = x · (W ⊙ M) + (x·A)·B·s   (ablation: mask on base only)

Layout: x (..., in), W (in, out), mask (in, out) bool True=keep,
A (in, r), B (r, out).  Autodiff works through both the XLA reference path
and the Pallas path (custom VJP re-uses the same kernel with transposes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------------
# XLA reference implementations (always correct; used for autodiff fallback,
# CPU tests, and shape cases the kernel doesn't tile).
# ---------------------------------------------------------------------------


def _matmul(x, w):
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def masked_matmul_ref(x, w, mask):
    return _matmul(x, jnp.where(mask, w, jnp.zeros((), w.dtype)))


def sparse_lora_matmul_ref(x, w, mask, lora_a, lora_b, scale):
    delta = jnp.dot(lora_a.astype(jnp.float32), lora_b.astype(jnp.float32))
    eff = (w.astype(jnp.float32) + scale * delta)
    eff = jnp.where(mask, eff, 0.0).astype(w.dtype)
    return _matmul(x, eff)


def lora_matmul_ref(x, w, mask, lora_a, lora_b, scale):
    base = masked_matmul_ref(x, w, mask)
    z = _matmul(_matmul(x, lora_a), lora_b)
    return base + (scale * z.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas fused kernel: y[M,N] = x[M,K] @ (W[K,N] ⊙ mask[K,N])
# Grid (M/bm, N/bn, K/bk); fp32 VMEM accumulator; mask applied to the W tile
# in VMEM so the masked weight never exists in HBM.
# ---------------------------------------------------------------------------


def _mm_kernel(x_ref, w_ref, m_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = jnp.where(m_ref[:], w_ref[:], jnp.zeros((), w_ref.dtype))
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _pick(dim, candidates):
    for c in candidates:
        if dim % c == 0:
            return c
    return None


def _masked_matmul_pallas(x2, w, mask, tiles=None):
    m, k = x2.shape
    k2, n = w.shape
    if tiles is not None:
        bm, bn, bk = tiles
        if m % bm or n % bn or k % bk:
            return None
    else:
        # tile order from an on-chip sweep at (4096, 2048, 2048) bf16:
        # bm1024/bn512/bk512 ≈ 4.8 ms vs 7.6 ms at the old 256/512/512;
        # per-shape tuning lives in ops/autotune.py
        bm = _pick(m, (1024, 512, 256, 128, 64, 32, 16, 8))
        bn = _pick(n, (512, 256, 128))
        bk = _pick(k, (512, 1024, 256, 128))
        if bm is None or bn is None or bk is None:
            return None
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        _mm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, l: (i, l)),
            pl.BlockSpec((bk, bn), lambda i, j, l: (l, j)),
            pl.BlockSpec((bk, bn), lambda i, j, l: (l, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x2.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x2, w, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def masked_matmul(x, w, mask):
    """y = x @ (w ⊙ mask), mask never materialized against HBM."""
    return _masked_matmul_fwd_impl(x, w, mask)


# Dispatch policy:
#   "auto" (default) — per-shape decisions from ops/autotune.py (tuned
#           on-chip and cached; unknown shapes fall back to XLA's fused
#           where+dot, which is never wrong, just sometimes slower)
#   True  — always try the Pallas kernel with heuristic tiles
#   False — always the XLA reference path
_USE_PALLAS = "auto"


def use_pallas_masked_matmul(enable) -> None:
    """enable ∈ {True, False, "auto"}."""
    global _USE_PALLAS
    _USE_PALLAS = enable


def _masked_matmul_fwd_impl(x, w, mask):
    if _USE_PALLAS is False or jax.default_backend() != "tpu":
        return masked_matmul_ref(x, w, mask)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if _USE_PALLAS == "auto":
        from vlm_compression_tpu.ops.autotune import lookup_masked_matmul

        dec = lookup_masked_matmul(x2.shape[0], w.shape[0], w.shape[1],
                                   str(x.dtype))
        if dec is None or dec["backend"] != "pallas":
            return masked_matmul_ref(x, w, mask)
        out = _masked_matmul_pallas(x2, w, mask, tuple(dec["tiles"]))
    else:
        out = _masked_matmul_pallas(x2, w, mask)
    if out is None:
        return masked_matmul_ref(x, w, mask)
    return out.reshape(*lead, w.shape[1])


def _masked_matmul_fwd(x, w, mask):
    return _masked_matmul_fwd_impl(x, w, mask), (x, w, mask)


def _masked_matmul_bwd(res, g):
    x, w, mask = res
    # dx = g @ (W⊙M)ᵀ ; dW = M ⊙ (xᵀ g)
    wm = jnp.where(mask, w, jnp.zeros((), w.dtype))
    dx = jax.lax.dot_general(
        g, wm, (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    dw = jax.lax.dot_general(
        x2, g2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dw = jnp.where(mask, dw, 0.0).astype(w.dtype)
    return dx, dw, None


masked_matmul.defvjp(_masked_matmul_fwd, _masked_matmul_bwd)


# ---------------------------------------------------------------------------
# Bit-packed mask variant: y = x @ (W ⊙ unpack(M)); the mask travels as
# uint32 words (16 rows per word — sublane-aligned layout, ops/bitmask.py)
# and is expanded INSIDE the kernel tile in VMEM — 1/4 the mask HBM
# traffic of a bool mask, ~12.5% instead of 50% extra bytes on the bf16
# weight stream.
# ---------------------------------------------------------------------------


def _mm_packed_kernel(x_ref, w_ref, m_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = w_ref[:]
    # interleaved layout (ops/bitmask.py): tile row r ↔ packed row r % 8,
    # bit r // 8.  pltpu.repeat TILES its input (output row r = input row
    # r % nrows), which is exactly the word lookup; the shift is iota//8.
    # Works for both GROUP=128 (bits 0..15) and GROUP=256 (bits 0..31):
    # the repeat factor is the tile's row count / 8.
    words = pltpu.repeat(m_ref[:], w.shape[0] // 8, axis=0)  # (bk, bn) u32
    shift = (jax.lax.broadcasted_iota(jnp.uint32, w.shape, 0)
             // jnp.uint32(8))
    bits = (words >> shift) & jnp.uint32(1)
    w = jnp.where(bits == jnp.uint32(1), w, jnp.zeros((), w.dtype))
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _masked_matmul_packed_pallas(x2, w, packed, group: int = 128):
    m, k = x2.shape
    k2, n = w.shape
    bm = _pick(m, (256, 128, 64, 32, 16, 8))
    bn = _pick(n, (512, 256, 128))
    bk = group  # pinned: the packed layout interleaves within GROUP rows
    if bm is None or bn is None or k % bk != 0:
        return None
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        _mm_packed_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, l: (i, l)),
            pl.BlockSpec((bk, bn), lambda i, j, l: (l, j)),
            pl.BlockSpec((8, bn), lambda i, j, l: (l, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x2.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(x2, w, packed)


def infer_pack_group(k_rows: int, packed_rows: int) -> int:
    """Recover the pack layout (128 = 2-bit, 256 = 1-bit) from shapes."""
    from vlm_compression_tpu.ops import bitmask

    for g in (bitmask.GROUP, bitmask.GROUP_1BIT):
        if bitmask.packed_rows(k_rows, g) == packed_rows:
            return g
    raise ValueError(f"packed mask rows {packed_rows} do not match any "
                     f"layout for {k_rows} weight rows")


def masked_matmul_packed_ref(x, w, packed, group: int = None):
    from vlm_compression_tpu.ops.bitmask import unpack_mask

    group = group or infer_pack_group(w.shape[0], packed.shape[0])
    return masked_matmul_ref(x, w, unpack_mask(packed, w.shape[0], group))


@jax.custom_vjp
def masked_matmul_packed(x, w, packed):
    """y = x @ (w ⊙ unpack(packed)); mask unpacked per-tile in VMEM.
    The pack layout (GROUP=128 2-bit / GROUP=256 1-bit) is inferred from
    the packed array's row count."""
    return _masked_matmul_packed_impl(x, w, packed)


def _masked_matmul_packed_impl(x, w, packed):
    group = infer_pack_group(w.shape[0], packed.shape[0])
    if jax.default_backend() != "tpu":
        return masked_matmul_packed_ref(x, w, packed, group)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = _masked_matmul_packed_pallas(x2, w, packed, group)
    if out is None:
        return masked_matmul_packed_ref(x, w, packed, group)
    return out.reshape(*lead, w.shape[1])


def _masked_matmul_packed_fwd(x, w, packed):
    return _masked_matmul_packed_impl(x, w, packed), (x, w, packed)


def _masked_matmul_packed_bwd(res, g):
    from vlm_compression_tpu.ops.bitmask import unpack_mask

    x, w, packed = res
    group = infer_pack_group(w.shape[0], packed.shape[0])
    mask = unpack_mask(packed, w.shape[0], group)
    dx, dw, _ = _masked_matmul_bwd((x, w, mask), g)
    return dx, dw, None


masked_matmul_packed.defvjp(_masked_matmul_packed_fwd,
                            _masked_matmul_packed_bwd)


# ---------------------------------------------------------------------------
# Fused sparse-LoRA kernel: y = x @ ((W + s·A·B) ⊙ M).
# The masked merged weight is never materialized in HBM: each (bk, bn)
# W-tile is combined with its rank-r delta (a (bk,r)·(r,bn) matmul — tiny
# next to the main contraction) and masked in VMEM, then fed to the MXU.
# The XLA reference path instead writes the full (W + AB)⊙M to HBM every
# forward (reference peft/tuners/lora.py:359-382 semantics).
# ---------------------------------------------------------------------------


def _mm_lora_kernel(scale, x_ref, w_ref, m_ref, a_ref, b_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    delta = jnp.dot(a_ref[:].astype(jnp.float32),
                    b_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32)
    eff = w_ref[:].astype(jnp.float32) + scale * delta
    # fp32 merge then cast — bit-identical to sparse_lora_matmul_ref
    eff = jnp.where(m_ref[:], eff, 0.0).astype(w_ref.dtype)
    acc_ref[:] += jnp.dot(x_ref[:], eff, preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _sparse_lora_pallas(x2, w, mask, lora_a, lora_b, scale, tiles=None):
    m, k = x2.shape
    k2, n = w.shape
    r = lora_a.shape[1]
    if r > 128:  # rank tile rides along un-blocked; keep it one lane-tile
        return None
    if tiles is not None:
        bm, bn, bk = tiles
        if m % bm or n % bn or k % bk:
            return None
    else:
        bm = _pick(m, (1024, 512, 256, 128, 64, 32, 16, 8))
        bn = _pick(n, (512, 256, 128))
        bk = _pick(k, (512, 1024, 256, 128))
        if bm is None or bn is None or bk is None:
            return None
    grid = (m // bm, n // bn, k // bk)
    try:
        return pl.pallas_call(
            functools.partial(_mm_lora_kernel, float(scale)),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, l: (i, l)),
                pl.BlockSpec((bk, bn), lambda i, j, l: (l, j)),
                pl.BlockSpec((bk, bn), lambda i, j, l: (l, j)),
                pl.BlockSpec((bk, r), lambda i, j, l: (l, 0)),
                pl.BlockSpec((r, bn), lambda i, j, l: (0, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, l: (i, j)),
            out_shape=jax.ShapeDtypeStruct((m, n), x2.dtype),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(x2, w, mask, lora_a, lora_b)
    except Exception:
        # trace-time validation failures only (bad block specs etc.);
        # Mosaic COMPILE errors surface later, outside this frame — the
        # "auto" path avoids them because tuning compiled the same
        # (shape, tiles) first, but forced use_pallas_masked_matmul(True)
        # can still fail at jit-compile time on unsupported layouts
        return None


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def sparse_lora_matmul(x, w, mask, lora_a, lora_b, scale):
    """y = x @ ((w + a·b·scale) ⊙ mask), merged weight never hits HBM.

    Dispatch mirrors :func:`masked_matmul` but consults the op's OWN
    decision family (``ops/autotune.py`` ``"lora:"`` keys — the per-call
    adapter merge shifts the Pallas/XLA crossover away from the plain
    masked decisions); unknown shapes and non-TPU backends use the XLA
    reference.  ``scale`` is a static float (``lora_alpha / r``).
    """
    return _sparse_lora_fwd_impl(x, w, mask, lora_a, lora_b, scale)


def _sparse_lora_fwd_impl(x, w, mask, lora_a, lora_b, scale):
    if _USE_PALLAS is False or jax.default_backend() != "tpu":
        return sparse_lora_matmul_ref(x, w, mask, lora_a, lora_b, scale)
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    tiles = None
    if _USE_PALLAS == "auto":
        from vlm_compression_tpu.ops.autotune import lookup_sparse_lora

        dec = lookup_sparse_lora(x2.shape[0], w.shape[0], w.shape[1],
                                 str(x.dtype))
        if dec is None or dec["backend"] != "pallas":
            return sparse_lora_matmul_ref(x, w, mask, lora_a, lora_b, scale)
        tiles = tuple(dec["tiles"])
    out = _sparse_lora_pallas(x2, w, mask, lora_a, lora_b, scale, tiles)
    if out is None:
        return sparse_lora_matmul_ref(x, w, mask, lora_a, lora_b, scale)
    return out.reshape(*lead, w.shape[1])


def _sparse_lora_fwd(x, w, mask, lora_a, lora_b, scale):
    return (_sparse_lora_fwd_impl(x, w, mask, lora_a, lora_b, scale),
            (x, w, mask, lora_a, lora_b))


def _sparse_lora_bwd(scale, res, g):
    x, w, mask, lora_a, lora_b = res
    # E = (W + s·A·B) ⊙ M;  dx = g Eᵀ;  Gm = M ⊙ (xᵀ g);
    # dW = Gm;  dA = s · Gm Bᵀ;  dB = s · Aᵀ Gm
    delta = jnp.dot(lora_a.astype(jnp.float32), lora_b.astype(jnp.float32))
    eff = jnp.where(mask, w.astype(jnp.float32) + scale * delta, 0.0)
    dx = jax.lax.dot_general(
        g, eff.astype(w.dtype), (((g.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    x2 = x.reshape(-1, x.shape[-1])
    g2 = g.reshape(-1, g.shape[-1])
    gm = jax.lax.dot_general(
        x2, g2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    gm = jnp.where(mask, gm, 0.0)
    da = (scale * jnp.dot(gm, lora_b.astype(jnp.float32).T)
          ).astype(lora_a.dtype)
    db = (scale * jnp.dot(lora_a.astype(jnp.float32).T, gm)
          ).astype(lora_b.dtype)
    return dx, gm.astype(w.dtype), None, da, db


sparse_lora_matmul.defvjp(_sparse_lora_fwd, _sparse_lora_bwd)


def merge_sparse_lora(w, mask, lora_a, lora_b, scale, sparse: bool = True):
    """Merge adapters into the base weight (lora.py:384-394).

    sparse=True:  W += (A·B·scale) ⊙ M       (stays sparse)
    sparse=False: W = W ⊙ M + A·B·scale      (densifies — ablation)
    """
    delta = scale * jnp.dot(lora_a.astype(jnp.float32), lora_b.astype(jnp.float32))
    w32 = w.astype(jnp.float32)
    if sparse:
        out = w32 + jnp.where(mask, delta, 0.0)
    else:
        out = jnp.where(mask, w32, 0.0) + delta
    return out.astype(w.dtype)
