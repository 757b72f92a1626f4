"""GPTQ: OBS-style post-training weight quantization (beyond-reference).

The quantization twin of SparseGPT — same calibration Hessians, same
damped-Cholesky/inverse prelude, same blocked column sweep with error
feedback (reference ``sparsegpt_pruner.py:81-215`` establishes the OBS
sweep; GPTQ replaces "zero the pruned column" with "round the column to
its grid point" and feeds the rounding error forward through
``W[:, i:] -= err · Hinv[i, i:]``).  The reference repo has no
quantization beyond bitsandbytes int8 loading; this module gives the
framework calibration-aware int4/int8 weights that compose with the
pruning pipeline.

Capabilities:
  * symmetric or asymmetric grids, 2–8 bits, grouped scales along the
    input dimension (``groupsize`` columns per (unit, group) scale,
    recomputed from the error-corrected weights when the sweep enters
    the group — the GPTQ "dynamic groups" behavior);
  * ``act_order`` (desc_act): sweep columns in decreasing Hessian-diagonal
    order.  Scale groups follow the SWEEP order and ``perm`` is returned,
    so dequantization is exact: ``W[:, perm[j]] = scale[:, j//G]·(codes[:, j]
    − zero[:, j//G])``;
  * joint sparse+quant: pass ``sparsity`` (or n:m) and one sweep both
    prunes and quantizes — pruned entries are exactly zero (their code is
    the zero point), kept entries land on the grid, and BOTH error kinds
    feed forward (the SparseGPT paper's joint compression mode);
  * a vmapped equal-shape batched variant, like
    ``sparsegpt_prune_batched``.

Layout: unit-major ``(units, in)``; Hessian ``(in, in)``; fp32 math.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vlm_compression_tpu.ops.sparsegpt import (
    _cholesky_inverse,
    _clamp_infs,
    damped_cholesky,
)


class GPTQResult(NamedTuple):
    weight: jnp.ndarray     # (units, in) fake-quant weights, ORIGINAL order
    codes: jnp.ndarray      # (units, in) uint8 grid codes, SWEEP order
    scale: jnp.ndarray      # (units, ngroups) fp32
    zero: jnp.ndarray       # (units, ngroups) fp32 (integer-valued)
    perm: jnp.ndarray       # (in,) int32 sweep order (identity w/o act_order)
    keep_mask: jnp.ndarray  # (units, in) bool, ORIGINAL order
    losses: jnp.ndarray     # (units,) accumulated OBS losses


def _find_params(x: jnp.ndarray, maxq: int, sym: bool):
    """Per-unit quantization grid over a (units, G) slab — the GPTQ
    quantizer semantics: ranges stretched to include 0, symmetric ranges
    centered on 0, degenerate all-zero slabs get a [-1, 1] grid."""
    xmin = jnp.minimum(jnp.min(x, axis=1), 0.0)
    xmax = jnp.maximum(jnp.max(x, axis=1), 0.0)
    if sym:
        xmax = jnp.maximum(jnp.abs(xmin), xmax)
        xmin = -xmax
    degenerate = (xmin == 0) & (xmax == 0)
    xmin = jnp.where(degenerate, -1.0, xmin)
    xmax = jnp.where(degenerate, 1.0, xmax)
    scale = (xmax - xmin) / maxq
    if sym:
        zero = jnp.full_like(scale, (maxq + 1) // 2)
    else:
        zero = jnp.round(-xmin / scale)
    return scale, zero


def _quantize_col(w, scale, zero, maxq):
    q = jnp.clip(jnp.round(w / scale) + zero, 0, maxq)
    return q, scale * (q - zero)


def _gptq_impl(
    weight_um: jnp.ndarray,
    hessian: jnp.ndarray,
    bits: int = 4,
    groupsize: int = 128,
    sym: bool = True,
    act_order: bool = False,
    sparsity=0.0,
    prune_n: int = 0,
    prune_m: int = 0,
    blocksize: int = 128,
    percdamp: float = 0.01,
) -> GPTQResult:
    W = weight_um.astype(jnp.float32)
    H = hessian.astype(jnp.float32)
    units, cols = W.shape
    out_dtype = weight_um.dtype
    maxq = (1 << bits) - 1

    # --- dead columns (prelude shared with sparsegpt_prune) --------------
    diag = jnp.diagonal(H)
    dead = diag == 0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    W = jnp.where(dead[None, :], 0.0, W)

    # --- act_order: permute BEFORE factorization -------------------------
    if act_order:
        if prune_n:
            raise ValueError("act_order is incompatible with n:m groups")
        perm = jnp.argsort(-jnp.diagonal(H), stable=True).astype(jnp.int32)
        W = W[:, perm]
        H = H[perm][:, perm]
    else:
        perm = jnp.arange(cols, dtype=jnp.int32)

    H = _clamp_infs(H)
    damp = percdamp * jnp.mean(jnp.diagonal(H))
    L = damped_cholesky(H, damp)
    Hinv_full = _clamp_infs(_cholesky_inverse(L))
    damp2 = percdamp * jnp.mean(jnp.abs(jnp.diagonal(Hinv_full)))
    Hinv = damped_cholesky(Hinv_full, damp2).T  # upper factor

    # --- group / block geometry ------------------------------------------
    import warnings

    if groupsize <= 0:
        groupsize = cols                      # explicit per-tensor grids
    elif cols % groupsize != 0:
        warnings.warn(
            f"gptq: groupsize {groupsize} does not divide in_features "
            f"{cols}; falling back to ONE per-tensor grid per row "
            f"(coarser than requested)", stacklevel=2)
        groupsize = cols
    if cols % blocksize != 0:
        blocksize = cols
    if blocksize % groupsize == 0:
        pass  # scales recomputed at group entry inside blocks
    elif groupsize % blocksize == 0:
        pass  # group spans whole blocks; entry check still i1+i % G == 0
    else:
        warnings.warn(
            f"gptq: groupsize {groupsize} incompatible with blocksize "
            f"{blocksize} (neither divides the other); falling back to "
            f"ONE per-tensor grid per row", stacklevel=2)
        groupsize = cols
    G = groupsize
    B = blocksize
    nblocks = cols // B
    ngroups = cols // G
    sparsity = jnp.asarray(sparsity, jnp.float32)
    col_ids = jnp.arange(cols)
    unstructured = prune_n == 0

    def block_step(carry, b):
        W, losses, szbuf, scale_cur, zero_cur = carry
        i1 = b * B
        W1 = jax.lax.dynamic_slice(W, (0, i1), (units, B))
        Hinv1 = jax.lax.dynamic_slice(Hinv, (i1, i1), (B, B))
        d1 = jnp.diagonal(Hinv1)

        if unstructured:
            # per-block prune mask from block-entry weights
            # (sparsegpt_pruner.py:183-186); sparsity=0 → keep everything
            tmp = W1 * W1 / (d1[None, :] ** 2)
            flat = jnp.sort(tmp.reshape(-1))
            k = jnp.floor(tmp.size * sparsity).astype(jnp.int32)
            thresh = jnp.where(k > 0, flat[jnp.clip(k, 0, tmp.size - 1)],
                               -jnp.inf)
            prune1 = tmp <= thresh
        else:
            prune1 = jnp.zeros((units, B), bool)

        bi = jnp.arange(B)

        def col_body(i, c):
            W1, Q1, C1, Err1, L1, prune1, szbuf, scale_cur, zero_cur = c
            j = i1 + i  # global sweep column

            def new_group(ops):
                # szbuf packs scale and zero as one buffer so this is ONE
                # dynamic_update_slice — a twin-scatter pair with shared
                # indices trips a variadic-scatter check in the TPU
                # backend's scatter emitter (observed SIGABRT)
                szbuf, _sc, _zc = ops
                if G <= B:
                    # group lives inside the block: W1 carries the
                    # error-fed-forward state of columns ≥ i
                    slab = jax.lax.dynamic_slice(W1, (0, i), (units, G))
                else:
                    # G % B == 0 → group entry only at i == 0, where the
                    # outer carry W is current for every column ≥ i1
                    slab = jax.lax.dynamic_slice(W, (0, j), (units, G))
                sc, zc = _find_params(slab, maxq, sym)
                szbuf = jax.lax.dynamic_update_slice(
                    szbuf, jnp.stack([sc, zc], 1)[:, :, None], (0, 0, j // G))
                return szbuf, sc, zc

            szbuf, scale_cur, zero_cur = jax.lax.cond(
                j % G == 0, new_group, lambda ops: ops,
                (szbuf, scale_cur, zero_cur))

            if prune_n != 0:
                def set_group(prune1):
                    grp = jax.lax.dynamic_slice(W1, (0, i), (units, prune_m))
                    dg = jax.lax.dynamic_slice(d1, (i,), (prune_m,))
                    met = grp * grp / (dg[None, :] ** 2)
                    order = jnp.argsort(met, axis=-1, stable=True)
                    rank = jnp.argsort(order, axis=-1, stable=True)
                    gmask = rank < prune_n
                    return jax.lax.dynamic_update_slice(prune1, gmask, (0, i))

                prune1 = jax.lax.cond(i % prune_m == 0, set_group,
                                      lambda p: p, prune1)

            w = W1[:, i]
            d = Hinv1[i, i]
            code, deq = _quantize_col(w, scale_cur, zero_cur, maxq)
            pruned = prune1[:, i]
            q = jnp.where(pruned, 0.0, deq)
            code = jnp.where(pruned, zero_cur, code)
            Q1 = Q1.at[:, i].set(q)
            C1 = C1.at[:, i].set(code)
            L1 = L1.at[:, i].set((w - q) ** 2 / (d * d))
            err = (w - q) / d
            row = jnp.where(bi >= i, Hinv1[i, :], 0.0)
            W1 = W1 - err[:, None] * row[None, :]
            Err1 = Err1.at[:, i].set(err)
            return (W1, Q1, C1, Err1, L1, prune1, szbuf, scale_cur,
                    zero_cur)

        z = jnp.zeros((units, B), jnp.float32)
        (W1, Q1, C1, Err1, L1, prune1, szbuf, scale_cur,
         zero_cur) = jax.lax.fori_loop(
            0, B, col_body,
            (W1, z, z, z, z, prune1, szbuf, scale_cur, zero_cur))

        W = jax.lax.dynamic_update_slice(W, Q1, (0, i1))
        losses = losses + jnp.sum(L1, axis=1) / 2.0
        hrows = jax.lax.dynamic_slice(Hinv, (i1, 0), (B, cols))
        hrows = jnp.where(col_ids[None, :] >= i1 + B, hrows, 0.0)
        W = W - jnp.dot(Err1, hrows, preferred_element_type=jnp.float32)
        return (W, losses, szbuf, scale_cur, zero_cur), (C1, prune1)

    init = (
        W,
        jnp.zeros((units,), jnp.float32),
        jnp.zeros((units, 2, ngroups), jnp.float32),
        jnp.ones((units,), jnp.float32),
        jnp.zeros((units,), jnp.float32),
    )
    (W, losses, szbuf, _, _), (code_blocks, prune_blocks) = jax.lax.scan(
        block_step, init, jnp.arange(nblocks))
    codes = jnp.moveaxis(code_blocks, 0, 1).reshape(units, cols)
    prune_mask = jnp.moveaxis(prune_blocks, 0, 1).reshape(units, cols)

    # --- back to original column order (static no-op w/o act_order) ------
    if act_order:
        inv = jnp.zeros((cols,), jnp.int32).at[perm].set(
            jnp.arange(cols, dtype=jnp.int32))
        W_orig = jnp.take(W, inv, axis=1)
        keep_orig = jnp.take(~prune_mask, inv, axis=1)
    else:
        W_orig, keep_orig = W, ~prune_mask

    return GPTQResult(
        weight=W_orig.astype(out_dtype),
        codes=codes.astype(jnp.uint8),
        scale=szbuf[:, 0],
        zero=szbuf[:, 1],
        perm=perm,
        keep_mask=keep_orig,
        losses=losses,
    )


gptq_quantize = functools.partial(
    jax.jit,
    static_argnames=("bits", "groupsize", "sym", "act_order", "prune_n",
                     "prune_m", "blocksize"),
)(_gptq_impl)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "groupsize", "sym", "act_order", "prune_n",
                     "prune_m", "blocksize"),
)
def gptq_quantize_batched(
    weights_um: jnp.ndarray,   # (G, units, in)
    hessians: jnp.ndarray,     # (G, in, in)
    bits: int = 4,
    groupsize: int = 128,
    sym: bool = True,
    act_order: bool = False,
    sparsity=0.0,
    prune_n: int = 0,
    prune_m: int = 0,
    blocksize: int = 128,
    percdamp: float = 0.01,
) -> GPTQResult:
    """Equal-shape linears quantized as one vmapped program (the T5 q/k/v/o
    grouping that makes the SparseGPT sweep fast applies identically)."""
    fn = functools.partial(
        _gptq_impl, bits=bits, groupsize=groupsize, sym=sym,
        act_order=act_order, sparsity=sparsity, prune_n=prune_n,
        prune_m=prune_m, blocksize=blocksize, percdamp=percdamp)
    return jax.vmap(fn)(weights_um, hessians)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "groupsize", "sym", "act_order", "prune_n",
                     "prune_m", "blocksize"),
)
def gptq_quantize_group(
    kernels_io,                # tuple of (in, units) Flax-layout kernels
    stats,                     # tuple of matching CalibStats
    bits: int = 4,
    groupsize: int = 128,
    sym: bool = True,
    act_order: bool = False,
    sparsity=0.0,
    prune_n: int = 0,
    prune_m: int = 0,
    blocksize: int = 128,
    percdamp: float = 0.01,
):
    """One-dispatch GPTQ for an equal-shape group: transpose, Hessian
    finalize, stack, (vmapped) sweep, unstack and re-layout all inside a
    single jitted program — the same dispatch-residue collapse as
    ``sparsegpt_prune_group`` (see BENCH_NOTES "Round-5 residue levers").
    Returns ``(keep_mask_io, fake_quant_kernel_io, mean_loss)`` per
    member; the full GPTQResult (codes/scales/perm for int4 bridging)
    stays available via ``gptq_quantize``/``gptq_quantize_batched``."""
    from vlm_compression_tpu.ops.stats import finalize_hessian

    kw = dict(bits=bits, groupsize=groupsize, sym=sym, act_order=act_order,
              sparsity=sparsity, prune_n=prune_n, prune_m=prune_m,
              blocksize=blocksize, percdamp=percdamp)
    if len(kernels_io) == 1:
        res = _gptq_impl(kernels_io[0].T, finalize_hessian(stats[0]), **kw)
        return ((res.keep_mask.T, res.weight.T, jnp.mean(res.losses)),)
    ws = jnp.stack([k.T for k in kernels_io])
    hs = jnp.stack([finalize_hessian(s) for s in stats])
    res = jax.vmap(functools.partial(_gptq_impl, **kw))(ws, hs)
    return tuple(
        (res.keep_mask[i].T, res.weight[i].T, jnp.mean(res.losses[i]))
        for i in range(len(kernels_io)))


def gptq_dequantize(codes: jnp.ndarray, scale: jnp.ndarray,
                    zero: jnp.ndarray, perm: jnp.ndarray,
                    keep_mask: Optional[jnp.ndarray] = None,
                    dtype=jnp.float32) -> jnp.ndarray:
    """Exact reconstruction of the fake-quant weights from stored codes:
    ``W[:, perm[j]] = scale[:, j//G] · (codes[:, j] − zero[:, j//G])``
    (then the keep mask re-asserts pruned zeros for joint sparse+quant
    results whose zero-point happens to sit off 0 only through float
    round-trip — exact in practice, mask applied for belt-and-braces)."""
    units, cols = codes.shape
    G = cols // scale.shape[1]
    g = jnp.arange(cols) // G
    w_sweep = scale[:, g] * (codes.astype(jnp.float32) - zero[:, g])
    W = jnp.zeros((units, cols), jnp.float32).at[:, perm].set(w_sweep)
    if keep_mask is not None:
        W = jnp.where(keep_mask, W, 0.0)
    return W.astype(dtype)


def rtn_quantize(weight_um: jnp.ndarray, bits: int = 4,
                 groupsize: int = 128, sym: bool = True) -> jnp.ndarray:
    """Round-to-nearest baseline on the same grid (no error feedback) —
    the control GPTQ must beat on calibration loss."""
    W = weight_um.astype(jnp.float32)
    units, cols = W.shape
    maxq = (1 << bits) - 1
    if groupsize <= 0 or cols % groupsize != 0:
        groupsize = cols
    slabs = W.reshape(units, cols // groupsize, groupsize)

    def one(slab):  # (units, G)
        scale, zero = _find_params(slab, maxq, sym)
        q = jnp.clip(jnp.round(slab / scale[:, None]) + zero[:, None],
                     0, maxq)
        return scale[:, None] * (q - zero[:, None])

    out = jax.vmap(one, in_axes=1, out_axes=1)(slabs)
    return out.reshape(units, cols).astype(weight_um.dtype)


def gptq_to_int4_params(res: GPTQResult):
    """Bridge a symmetric 4-bit, identity-order GPTQ result into the
    framework's int4 at-rest storage: returns ``(kernel_q4, kernel_scale)``
    exactly as ``ops.quant.quantize_params_tree_int4`` lays them out
    ((in/2, out) nibble-packed two's-complement + (in/G, out) scales), so
    ``SparseLinear``'s existing ``kernel_q4`` path and
    ``ops.quant.int4_matmul`` serve GPTQ weights with no new kernel.

    The sym grid's zero point is 8, so ``code − 8 ∈ [−8, 7]`` IS the
    signed int4 value and ``scale·(code−8)`` reproduces the fake-quant
    weights bit-exactly — including the exact zeros of a joint
    sparse+quant sweep (pruned codes sit on the zero point).

    Requires bits=4, sym=True, act_order=False (codes in original column
    order); raises otherwise.
    """
    import numpy as np

    codes = np.asarray(res.codes)
    zero = np.asarray(res.zero)
    perm = np.asarray(res.perm)
    if codes.max() > 15:
        raise ValueError("gptq_to_int4_params requires bits=4")
    if not (zero == 8).all():
        raise ValueError("gptq_to_int4_params requires sym grids (zero=8)")
    if not (perm == np.arange(perm.size)).all():
        raise ValueError("gptq_to_int4_params requires act_order=False")
    units, cols = codes.shape
    if cols % 2:
        raise ValueError("in_features must be even")
    q = (codes.astype(np.int32) - 8).T         # (in, out), values −8..7
    lo = q[0::2] & 0xF
    hi = q[1::2] & 0xF
    packed = jnp.asarray((lo | (hi << 4)).astype(np.uint8))
    scale = jnp.asarray(np.asarray(res.scale).T)   # (in/G, out)
    return packed, scale
