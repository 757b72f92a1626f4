"""Fused flash attention — the shared attention core of every tower.

Every tower in the reference materializes the full score matrix in HBM:
``scores = q·kᵀ (+bias) → softmax → ·v`` (eva_vit.py:90-141,
modeling_t5.py:491-653, modeling_llama.py:161-280).  XLA cannot fuse a
softmax BETWEEN two matmuls, so at prefill/training shapes the
(b, h, n, m) probability tensor makes two full HBM round-trips per
layer.  This kernel computes attention blockwise with an online softmax
(the flash-attention recurrence): scores only ever exist as a
(block_q, block_k) tile in VMEM, and HBM traffic drops from
O(b·h·n·m) to O(b·h·n·d).

Semantics match the towers' naive path exactly:
  s   = (q · kᵀ) * scale + Σ bias_i          (fp32 on the MXU)
  p   = softmax(s, axis=-1)                   (fp32)
  out = p.astype(v.dtype) · v                 (MXU, fp32 accumulate)

Bias terms are ADDITIVE fp32 arrays broadcastable to (b, h, n, m) —
the towers' relative-position bias (1, h, n, m) and padding/causal
masks (b, 1, 1, m) pass through unmaterialized at their broadcast
shape; the kernel indexes the original small array per tile.

Layout: q (b, n, h, d), k/v (b, m, h, d) — the layout every tower
already has after the head reshape, so integration costs one transpose
to (b, h, n, d) which XLA folds into the projection's output layout.

Backward: Pallas flash kernels (dq, dk/dv, and one dbias pass per
additive bias) — each recomputes the score tile in VMEM from the saved
log-sum-exp, so the (n, m) probability matrix never exists in HBM in
either pass, for biased (T5's trainable rel-pos) and bias-free towers
alike.  Gradients are the exact VJP of the naive reference up to dot
rounding.  Non-trainable biases (padding masks ending in constants)
cost nothing: each dbias is a standalone pallas_call that XLA DCEs
when its cotangent is unused.

Dispatch mirrors ops/masked_linear.py exactly: "auto" consults the
per-shape "attn:" decisions tuned on-chip (ops/autotune.py) — a shape
runs the kernel only after a measured win; unknown shapes, decode
steps (q_len < 128) and CPU use the XLA reference.  False forces the
reference, True forces the kernel (interpret mode off-TPU — the tests).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9  # matches the towers' additive-mask constant

# per-row scalars (lse, delta) move through pallas_call as (b, h, n, 8)
# arrays — broadcast copies along a size-8 lane dim — because Mosaic
# rejects blocks whose last two dims are not (divisible by 8, divisible
# by 128 or equal to the array dim); a (1, 1, bq) block on a (b, h, n)
# array fails that check on real TPUs (the interpreter does not check)
LSE_LANES = 8


# ---------------------------------------------------------------------------
# Naive reference (always correct; CPU path, decode path, backward).
# ---------------------------------------------------------------------------


def mha_reference(q, k, v, biases: Sequence[jax.Array] = (),
                  scale: float = 1.0, causal: bool = False):
    """q (b,n,h,d), k/v (b,m,h,d), biases broadcastable to (b,h,n,m)."""
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    for bias in biases:
        s = s + bias.astype(jnp.float32)
    if causal:
        n, m = s.shape[-2], s.shape[-1]
        # query i attends keys j ≤ i + (m - n) (aligned right, the decode
        # priming convention every tower uses)
        vis = (jnp.arange(m)[None, :] <= jnp.arange(n)[:, None] + (m - n))
        s = jnp.where(vis[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v)


# ---------------------------------------------------------------------------
# Pallas flash kernel.
# Grid (b, h, n/bq, m/bk); the kv dimension is innermost-sequential and
# carries the online-softmax state (m, l, acc) in VMEM scratch.
# ---------------------------------------------------------------------------


def _mask_tile(s, q_i, kv_i, bq, bk, causal, causal_off, kv_len):
    """NEG_INF-mask a (bq, bk) score tile: causal visibility (REAL
    right-aligned offsets) and padded kv columns (col ≥ kv_len — padded
    k rows are zeros, so scores there would otherwise be exp(0-lse))."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    keep = None
    if causal:
        keep = (kv_i * bk + cols) <= (q_i * bq + rows + causal_off)
    if kv_len is not None:
        pad_ok = (kv_i * bk + cols) < kv_len
        keep = pad_ok if keep is None else (keep & pad_ok)
    return s if keep is None else jnp.where(keep, s, NEG_INF)


def _flash_kernel(*refs, scale: float, causal: bool, nbias: int,
                  bq: int, bk: int, causal_off: int, kv_len):
    q_ref, k_ref, v_ref = refs[:3]
    bias_refs = refs[3:3 + nbias]
    o_ref, lse_ref = refs[3 + nbias:5 + nbias]
    acc_ref, m_ref, l_ref = refs[5 + nbias:]

    kv_i = pl.program_id(3)
    q_i = pl.program_id(2)  # hoisted: program_id inside a pl.when body
    # sits in a lax.cond branch the interpreter cannot substitute

    @pl.when(kv_i == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if causal:
        # skip blocks strictly above the (right-aligned) diagonal;
        # causal_off = m - n in REAL (unpadded) positions
        run = kv_i * bk <= q_i * bq + (bq - 1) + causal_off
    else:
        run = True

    @pl.when(run)
    def _():
        q = q_ref[0, 0]                                  # (bq, d)
        k = k_ref[0, 0]                                  # (bk, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (bq, bk)
        for b_ref in bias_refs:
            s = s + b_ref[0, 0].astype(jnp.float32)      # (bq|1, bk)
        s = _mask_tile(s, q_i, kv_i, bq, bk, causal, causal_off, kv_len)

        m_prev = m_ref[:, :1]                            # (bq, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)                           # (bq, bk) fp32
        alpha = jnp.exp(m_prev - m_new)                  # (bq, 1)
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bq, d)
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kv_i == pl.num_programs(3) - 1)
    def _():
        # fully-masked rows (all-NEG_INF, l→uniform) match the reference:
        # NEG_INF keeps m finite, so l ≥ bk·exp(0) > 0 — no 0/0
        o_ref[0, 0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)
        # log-sum-exp per row, saved for the Pallas backward; stored with
        # a size-LSE_LANES trailing dim (broadcast copies) because Mosaic
        # requires the last two block dims to be (8k, =array) — a bare
        # (1, 1, bq) block fails to lower on real TPUs
        lse_ref[0, 0] = jnp.broadcast_to(
            m_ref[:, :1] + jnp.log(l_ref[:, :1]), lse_ref.shape[2:])


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bias_spec(bias, bq, bk, order=("b", "h", "q", "k")):
    """BlockSpec for a bias broadcastable to (b, h, n_pad, m_pad):
    size-1 axes pin their block dim to 1 and index to 0.  ``order``
    names the grid dims outermost-first (backward kernels permute)."""
    bb, bh, bn, bm = bias.shape
    blk = (1, 1, bq if bn > 1 else 1, bk if bm > 1 else 1)
    pos = {d: i for i, d in enumerate(order)}

    def idx(*pids):
        return (pids[pos["b"]] if bb > 1 else 0,
                pids[pos["h"]] if bh > 1 else 0,
                pids[pos["q"]] if bn > 1 else 0,
                pids[pos["k"]] if bm > 1 else 0)

    return pl.BlockSpec(blk, idx)


def _geom(q, k, block_q, block_k):
    b, n, h, d = q.shape
    m = k.shape[1]
    bq = min(block_q, _round_up(n, 128))
    bk = min(block_k, _round_up(m, 128))
    return (b, n, h, d, m, bq, bk, _round_up(n, bq), _round_up(m, bk),
            _round_up(d, 128))


def _to_bhnd(x, length, d_pad):
    x = jnp.transpose(x, (0, 2, 1, 3))  # (b, h, len, d)
    return jnp.pad(x, ((0, 0), (0, 0), (0, length - x.shape[2]),
                       (0, d_pad - x.shape[3])))


def _pad_biases(biases, n_pad, m_pad):
    # size-1 query/key dims stay size 1 (broadcast in the kernel tile);
    # zero-padding them would silently bias only the first row/column
    return [jnp.pad(jnp.asarray(x, jnp.float32),
                    [(0, 0), (0, 0),
                     (0, (n_pad - x.shape[2]) if x.shape[2] > 1 else 0),
                     (0, (m_pad - x.shape[3]) if x.shape[3] > 1 else 0)])
            for x in biases]


def _flash_attention_pallas(q, k, v, biases, scale, causal,
                            block_q: int = 256, block_k: int = 256,
                            interpret: bool = False,
                            return_lse: bool = False):
    """q (b,n,h,d) → out (b,n,h,d).  Pads n/m to block multiples and d to
    a lane multiple (128); padded kv columns are masked with NEG_INF
    inside the kernel, padded q rows / d columns are sliced off."""
    b, n, h, d, m, bq, bk, n_pad, m_pad, d_pad = _geom(q, k, block_q,
                                                       block_k)
    qp = _to_bhnd(q, n_pad, d_pad)
    kp = _to_bhnd(k, m_pad, d_pad)
    vp = _to_bhnd(v, m_pad, d_pad)
    biases = _pad_biases(biases, n_pad, m_pad)

    grid = (b, h, n_pad // bq, m_pad // bk)
    kern = functools.partial(
        _flash_kernel, scale=float(scale), causal=causal,
        nbias=len(biases), bq=bq, bk=bk, causal_off=m - n,
        kv_len=(m if m_pad > m else None))
    out, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d_pad), lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bk, d_pad), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, bk, d_pad), lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
        ] + [_bias_spec(x, bq, bk) for x in biases],
        out_specs=(
            pl.BlockSpec((1, 1, bq, d_pad),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, bq, LSE_LANES),
                         lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, n_pad, d_pad), q.dtype),
            jax.ShapeDtypeStruct((b, h, n_pad, LSE_LANES), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, d_pad), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, *biases)
    out = jnp.transpose(out[:, :, :n, :d], (0, 2, 1, 3))
    # lse sliced to real n (lane 0 of the broadcast copies): padded-row
    # values are irrelevant in the backward (zero-padded g annihilates
    # their contributions), and a real-length lse lets the SPMD sharding
    # rule share the n factor
    return (out, lse[:, :, :n, 0]) if return_lse else out


# ---------------------------------------------------------------------------
# Pallas backward kernels: standard flash backward —
#   p  = exp(s − lse);  delta = rowsum(g ⊙ out)
#   dv = pᵀ·g;  ds = p ⊙ (g·vᵀ − delta);  dq = ds·k·scale;  dk = dsᵀ·q·scale
#   dbias_i = ds summed over the axes bias_i broadcasts (∂s/∂bias = 1)
# Each recomputes the score tile in VMEM (one extra q·kᵀ per tile — the
# rematerialization trade), so the (n, m) probability matrix never exists
# in HBM in either pass.  Biases enter the recompute (s must match the
# forward bit-for-bit) and each bias gets its own dbias pallas_call —
# standalone, so XLA's DCE deletes it when the cotangent is unused (the
# towers' padding masks terminate in constants; only T5's trainable
# rel-pos bias actually pays for its gradient pass).
# ---------------------------------------------------------------------------


def _recompute_tile(q, k, bias_tiles, lse_row, q_i, kv_i, *, scale,
                    causal, bq, bk, causal_off, kv_len):
    """Score tile → p (softmax numerators over the saved lse)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    for b in bias_tiles:
        s = s + b.astype(jnp.float32)
    s = _mask_tile(s, q_i, kv_i, bq, bk, causal, causal_off, kv_len)
    return jnp.exp(s - lse_row)


def _flash_dq_kernel(*refs, scale, causal, nbias, bq, bk, causal_off,
                     kv_len):
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref = refs[:6]
    bias_refs = refs[6:6 + nbias]
    dq_ref, acc_ref = refs[6 + nbias:]
    kv_i = pl.program_id(3)
    q_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    run = (kv_i * bk <= q_i * bq + (bq - 1) + causal_off) if causal \
        else True

    @pl.when(run)
    def _():
        q, k, v, g = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], g_ref[0, 0]
        p = _recompute_tile(q, k, [b[0, 0] for b in bias_refs],
                            lse_ref[0, 0][:, :1], q_i, kv_i, scale=scale,
                            causal=causal, bq=bq, bk=bk,
                            causal_off=causal_off, kv_len=kv_len)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bq, bk)
        ds = p * (dp - delta_ref[0, 0][:, :1]) * scale
        acc_ref[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(kv_i == pl.num_programs(3) - 1)
    def _():
        dq_ref[0, 0] = acc_ref[:].astype(dq_ref.dtype)


def _flash_dkv_kernel(*refs, scale, causal, nbias, bq, bk, causal_off,
                      kv_len):
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref = refs[:6]
    bias_refs = refs[6:6 + nbias]
    dk_ref, dv_ref, dk_acc, dv_acc = refs[6 + nbias:]
    q_i = pl.program_id(3)                  # sequential: q blocks
    kv_i = pl.program_id(2)

    @pl.when(q_i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    run = (kv_i * bk <= q_i * bq + (bq - 1) + causal_off) if causal \
        else True

    @pl.when(run)
    def _():
        q, k, v, g = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], g_ref[0, 0]
        p = _recompute_tile(q, k, [b[0, 0] for b in bias_refs],
                            lse_ref[0, 0][:, :1], q_i, kv_i, scale=scale,
                            causal=causal, bq=bq, bk=bk,
                            causal_off=causal_off, kv_len=kv_len)
        dv_acc[:] += jax.lax.dot_general(
            p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bk, d)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0][:, :1]) * scale
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bk, d)

    @pl.when(q_i == pl.num_programs(3) - 1)
    def _():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_dbias_kernel(*refs, scale, causal, nbias, bq, bk, causal_off,
                        kv_len, order, n_kept, keep_q):
    """dbias for ONE bias: ds summed over this bias's broadcast axes.

    ``order`` names the 4 grid dims outermost-first (a permutation of
    ("b", "h", "q", "k")): the first ``n_kept`` are the bias's real
    (size > 1) dims, the rest are its broadcast dims — innermost, so the
    VMEM accumulator sees all contributions to one output block
    consecutively (Pallas's output-revisit rule).  ``keep_q``: whether
    the bias has a real query dim; if not, ds rows are summed in-tile
    and the output block is a single row."""
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref = refs[:6]
    bias_refs = refs[6:6 + nbias]
    db_ref, acc_ref = refs[6 + nbias:]
    pos = {d: i for i, d in enumerate(order)}
    q_i = pl.program_id(pos["q"])
    kv_i = pl.program_id(pos["k"])
    red = list(range(n_kept, 4))

    def conj(fn):
        c = None
        for p_ in red:
            e = fn(p_)
            c = e if c is None else c & e
        return c

    # no reduced grid dims → each output block is visited exactly once
    first = conj(lambda p_: pl.program_id(p_) == 0) if red else None
    last = conj(lambda p_: pl.program_id(p_)
                == pl.num_programs(p_) - 1) if red else None

    def init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if red:
        pl.when(first)(init)
    else:
        init()

    run = (kv_i * bk <= q_i * bq + (bq - 1) + causal_off) if causal \
        else True

    @pl.when(run)
    def _():
        q, k, v, g = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], g_ref[0, 0]
        p = _recompute_tile(q, k, [b[0, 0] for b in bias_refs],
                            lse_ref[0, 0][:, :1], q_i, kv_i, scale=scale,
                            causal=causal, bq=bq, bk=bk,
                            causal_off=causal_off, kv_len=kv_len)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta_ref[0, 0][:, :1])       # no scale: ∂s/∂b = 1
        if keep_q:
            acc_ref[:] += ds
        else:
            acc_ref[0:1] += jnp.sum(ds, axis=0, keepdims=True)

    def write():
        db_ref[0, 0] = (acc_ref[:] if keep_q
                        else acc_ref[0:1]).astype(db_ref.dtype)

    if red:
        pl.when(last)(write)
    else:
        write()


def _ordspec(kind, bq, bk, d_pad, order):
    """BlockSpec for a q/k-shaped or row-scalar operand under a grid whose
    dims are named by ``order`` (a permutation of ("b","h","q","k"))."""
    pos = {d: i for i, d in enumerate(order)}
    if kind == "q":
        blk, want = (1, 1, bq, d_pad), ("b", "h", "q")
    elif kind == "k":
        blk, want = (1, 1, bk, d_pad), ("b", "h", "k")
    else:  # per-row scalar (lse/delta)
        blk, want = (1, 1, bq, LSE_LANES), ("b", "h", "q")

    def idx(*pids):
        return tuple(pids[pos[w]] for w in want) + (0,)

    return pl.BlockSpec(blk, idx)


def _flash_backward_pallas(q, k, v, out, lse, g, biases, scale, causal,
                           block_q: int = 256, block_k: int = 256,
                           interpret: bool = False):
    """(dq, dk, dv, [dbias...]) in the caller's layouts; ``lse`` is the
    (b, h, n) log-sum-exp from the forward kernel (re-padded here).
    Every bias must have a real key dim (shape[3] > 1) — the caller
    falls back to the reference VJP otherwise."""
    b, n, h, d, m, bq, bk, n_pad, m_pad, d_pad = _geom(q, k, block_q,
                                                       block_k)
    qp = _to_bhnd(q, n_pad, d_pad)
    kp = _to_bhnd(k, m_pad, d_pad)
    vp = _to_bhnd(v, m_pad, d_pad)
    gp = _to_bhnd(g, n_pad, d_pad)
    biases_p = _pad_biases(biases, n_pad, m_pad)

    def row4(x):
        # (b, h, n) per-row scalars → (b, h, n_pad, LSE_LANES) broadcast
        # copies (Mosaic's block-shape rule; see LSE_LANES)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad - x.shape[2])))
        return jnp.broadcast_to(x[..., None], x.shape + (LSE_LANES,))

    lse = row4(lse)
    # delta = rowsum(g ⊙ out): O(b·h·n·d) elementwise, fused by XLA
    delta = row4(jnp.einsum("bnhd,bnhd->bhn", g.astype(jnp.float32),
                            out.astype(jnp.float32)))
    args = (qp, kp, vp, gp, lse, delta) + tuple(biases_p)

    kw = dict(scale=float(scale), causal=causal, nbias=len(biases_p),
              bq=bq, bk=bk, causal_off=m - n,
              kv_len=(m if m_pad > m else None))
    sizes = {"b": b, "h": h, "q": n_pad // bq, "k": m_pad // bk}

    def inspecs(order):
        return ([_ordspec("q", bq, bk, d_pad, order),
                 _ordspec("k", bq, bk, d_pad, order),
                 _ordspec("k", bq, bk, d_pad, order),
                 _ordspec("q", bq, bk, d_pad, order),
                 _ordspec("r", bq, bk, d_pad, order),
                 _ordspec("r", bq, bk, d_pad, order)]
                + [_bias_spec(x, bq, bk, order) for x in biases_p])

    order1 = ("b", "h", "q", "k")           # kv innermost-sequential
    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, **kw),
        grid=tuple(sizes[d] for d in order1),
        in_specs=inspecs(order1),
        out_specs=_ordspec("q", bq, bk, d_pad, order1),
        out_shape=jax.ShapeDtypeStruct((b, h, n_pad, d_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(*args)

    order2 = ("b", "h", "k", "q")           # q blocks innermost-sequential
    kspec2 = _ordspec("k", bq, bk, d_pad, order2)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, **kw),
        grid=tuple(sizes[d] for d in order2),
        in_specs=inspecs(order2),
        out_specs=(kspec2, kspec2),
        out_shape=(jax.ShapeDtypeStruct((b, h, m_pad, d_pad), k.dtype),
                   jax.ShapeDtypeStruct((b, h, m_pad, d_pad), v.dtype)),
        scratch_shapes=[pltpu.VMEM((bk, d_pad), jnp.float32),
                        pltpu.VMEM((bk, d_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(*args)

    # one standalone dbias pallas_call per bias: kept dims lead the grid,
    # broadcast dims iterate innermost into a VMEM accumulator.  Unused
    # cotangents (padding masks ending in constants) are DCE'd whole.
    dbiases = []
    for i, bias in enumerate(biases_p):
        bb, bh, bn = bias.shape[0] > 1, bias.shape[1] > 1, bias.shape[2] > 1
        kept = [dd for dd, yes in (("b", bb), ("h", bh), ("q", bn))
                if yes] + ["k"]
        red = [dd for dd, yes in (("b", bb), ("h", bh), ("q", bn))
               if not yes]
        order = tuple(kept + red)
        pos = {dd: j for j, dd in enumerate(order)}
        out_blk = (1, 1, bq if bn else 1, bk)

        def oidx(*pids, bb=bb, bh=bh, bn=bn, pos=pos):
            return (pids[pos["b"]] if bb else 0,
                    pids[pos["h"]] if bh else 0,
                    pids[pos["q"]] if bn else 0,
                    pids[pos["k"]])

        db = pl.pallas_call(
            functools.partial(_flash_dbias_kernel, **kw, order=order,
                              n_kept=len(kept), keep_q=bn),
            grid=tuple(sizes[dd] for dd in order),
            in_specs=inspecs(order),
            out_specs=pl.BlockSpec(out_blk, oidx),
            out_shape=jax.ShapeDtypeStruct(bias.shape, jnp.float32),
            scratch_shapes=[pltpu.VMEM((bq if bn else 8, bk),
                                       jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=tuple(
                    ["parallel"] * len(kept) + ["arbitrary"] * len(red))),
            interpret=interpret,
        )(*args)
        ob = biases[i].shape
        dbiases.append(db[:, :, :ob[2], :ob[3]].astype(biases[i].dtype))

    def back(x, length):
        return jnp.transpose(x[:, :, :length, :d], (0, 2, 1, 3))

    return back(dq, n), back(dk, m), back(dv, m), dbiases


# ---------------------------------------------------------------------------
# SPMD partitioning: a pallas_call is a custom call GSPMD cannot split on
# its own — without rules it would all-gather q/k/v and run FULL attention
# on every chip of a tensor-parallel mesh.  Attention is embarrassingly
# parallel over (batch, heads) — exactly the axes the Megatron-style
# rules shard — so custom_partitioning declares: keep b (dim 0 of q) and
# h (dim 2) sharded, replicate n/m/d, and run the kernel per shard.
# ---------------------------------------------------------------------------


def _bh_of(arg_shapes):
    """(batch, head) mesh axes from q's sharding, if any."""
    qs = getattr(arg_shapes[0], "sharding", None)
    spec = getattr(qs, "spec", None)
    if spec is None:
        return None, None
    b = spec[0] if len(spec) > 0 else None
    h = spec[2] if len(spec) > 2 else None
    return b, h


def _bias_rule(i, pattern):
    bb, bh, bn = pattern
    return " ".join(["b" if bb else f"u{i}0", "h" if bh else f"u{i}1",
                     "n" if bn else f"u{i}2", "m"])


@functools.lru_cache(maxsize=None)
def _partitioned_fwd(scale, causal, blocks, interpret, bias_patterns):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    @custom_partitioning
    def fwd(q, k, v, *biases):
        return _flash_attention_pallas(
            q, k, v, list(biases), scale, causal,
            block_q=blocks[0], block_k=blocks[1], interpret=interpret,
            return_lse=True)

    def _shardings(mesh, b, h):
        qkv = NamedSharding(mesh, P(b, None, h, None))
        bias_sh = tuple(
            NamedSharding(mesh, P(b if bb else None, h if bh else None,
                                  None, None))
            for bb, bh, _ in bias_patterns)
        out = (NamedSharding(mesh, P(b, None, h, None)),
               NamedSharding(mesh, P(b, h, None)))
        return (qkv, qkv, qkv) + bias_sh, out

    def infer(mesh, arg_shapes, result_shape):
        b, h = _bh_of(arg_shapes)
        return _shardings(mesh, b, h)[1]

    def partition(mesh, arg_shapes, result_shape):
        b, h = _bh_of(arg_shapes)
        arg_sh, res_sh = _shardings(mesh, b, h)

        def lower_fn(q, k, v, *biases):
            return _flash_attention_pallas(
                q, k, v, list(biases), scale, causal,
                block_q=blocks[0], block_k=blocks[1],
                interpret=interpret, return_lse=True)

        return mesh, lower_fn, res_sh, arg_sh

    rule = ", ".join(["b n h d", "b m h d", "b m h d"]
                     + [_bias_rule(i, p) for i, p in
                        enumerate(bias_patterns)]) + " -> b n h d, b h n"
    fwd.def_partition(partition=partition,
                      infer_sharding_from_operands=infer,
                      sharding_rule=rule)
    return fwd


def _flat_axes(*entries):
    """Flatten PartitionSpec entries (str | tuple | None) into a tuple of
    mesh axis names."""
    out = []
    for e in entries:
        if e is None:
            continue
        if isinstance(e, (tuple, list)):
            out.extend(e)
        else:
            out.append(e)
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _partitioned_bwd(scale, causal, blocks, interpret, bias_patterns):
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def run(q, k, v, out, lse, g, *biases):
        dq, dk, dv, dbs = _flash_backward_pallas(
            q, k, v, out, lse, g, list(biases), scale, causal,
            block_q=blocks[0], block_k=blocks[1], interpret=interpret)
        return (dq, dk, dv, *dbs)

    @custom_partitioning
    def bwd(q, k, v, out, lse, g, *biases):
        return run(q, k, v, out, lse, g, *biases)

    def _shardings(mesh, b, h):
        x = NamedSharding(mesh, P(b, None, h, None))
        r = NamedSharding(mesh, P(b, h, None))
        bias_sh = tuple(
            NamedSharding(mesh, P(b if bb else None, h if bh else None,
                                  None, None))
            for bb, bh, _ in bias_patterns)
        return (x, x, x, x, r, x) + bias_sh, (x, x, x) + bias_sh

    def infer(mesh, arg_shapes, result_shape):
        b, h = _bh_of(arg_shapes)
        return _shardings(mesh, b, h)[1]

    def partition(mesh, arg_shapes, result_shape):
        b, h = _bh_of(arg_shapes)
        arg_sh, res_sh = _shardings(mesh, b, h)

        def lower_fn(q, k, v, out, lse, g, *biases):
            outs = run(q, k, v, out, lse, g, *biases)
            dq, dk, dv = outs[:3]
            # a dbias reduces over every axis its bias broadcasts; when
            # that axis is sharded the per-shard partial sums need a psum
            # (each shard's kernel saw only its local batch/head slice)
            dbs = []
            for db, (bb, bh, _) in zip(outs[3:], bias_patterns):
                axes = _flat_axes(None if bb else b, None if bh else h)
                dbs.append(jax.lax.psum(db, axes) if axes else db)
            return (dq, dk, dv, *dbs)

        return mesh, lower_fn, res_sh, arg_sh

    in_rule = ", ".join(["b n h d", "b m h d", "b m h d", "b n h d",
                         "b h n", "b n h d"]
                        + [_bias_rule(i, p) for i, p in
                           enumerate(bias_patterns)])
    out_rule = ", ".join(["b n h d", "b m h d", "b m h d"]
                         + [_bias_rule(i, p) for i, p in
                            enumerate(bias_patterns)])
    bwd.def_partition(
        partition=partition, infer_sharding_from_operands=infer,
        sharding_rule=f"{in_rule} -> {out_rule}")
    return bwd


def _bias_patterns(biases):
    return tuple((x.shape[0] > 1, x.shape[1] > 1, x.shape[2] > 1)
                 for x in biases)


# ---------------------------------------------------------------------------
# custom_vjp wrapper: flash forward; backward = Pallas flash kernels —
# O(n) memory end to end, including dbias for additive biases (T5's
# trainable rel-pos).  Only a per-query bias (key dim 1 — no tower
# produces one) falls back to the recompute-reference VJP.
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash_attention(q, k, v, biases, scale, causal, interpret, blocks):
    fwd = _partitioned_fwd(scale, causal, blocks, interpret,
                           _bias_patterns(biases))
    return fwd(q, k, v, *biases)[0]


def _flash_fwd(q, k, v, biases, scale, causal, interpret, blocks):
    fwd = _partitioned_fwd(scale, causal, blocks, interpret,
                           _bias_patterns(biases))
    out, lse = fwd(q, k, v, *biases)
    return out, (q, k, v, biases, out, lse)


def _flash_bwd(scale, causal, interpret, blocks, res, g):
    q, k, v, biases, out, lse = res
    if all(x.shape[3] > 1 for x in biases):
        outs = _partitioned_bwd(scale, causal, blocks, interpret,
                                _bias_patterns(biases))(
            q, k, v, out, lse, g, *biases)
        return outs[0], outs[1], outs[2], list(outs[3:])
    # per-query bias (key dim 1): exact recompute-reference VJP
    _, vjp = jax.vjp(
        lambda q_, k_, v_, bs: mha_reference(q_, k_, v_, bs, scale, causal),
        q, k, v, tuple(biases))
    dq, dk, dv, dbs = vjp(g)
    return dq, dk, dv, list(dbs)


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Public dispatching API.
# ---------------------------------------------------------------------------

# "auto" — per-shape decisions from ops/autotune.py ("attn:" family),
#          the same doctrine as masked_matmul: a shape runs the Pallas
#          kernel only after an on-chip measurement recorded a win for
#          it; unknown shapes, decode steps, CPU → the XLA reference
#          (never wrong, sometimes slower).  `--autotune` or
#          scripts/chip_validation.py tunes the flagship classes.
# True    — force the kernel (interpret mode off-TPU; used by tests)
# False   — always the reference
_USE_FLASH = "auto"
_MIN_Q_LEN = 128


def use_flash_attention(enable) -> None:
    """enable ∈ {True, False, "auto"}."""
    global _USE_FLASH
    _USE_FLASH = enable


def attention_core(q, k, v, biases: Sequence[Optional[jax.Array]] = (),
                   scale: float = 1.0, causal: bool = False):
    """Shared attention core for every tower.

    q (b, n, h, d) · k/v (b, m, h, d) → (b, n, h, d); ``biases`` are
    additive fp32 terms broadcastable to (b, h, n, m) (None entries are
    dropped).  ``scale`` multiplies q·kᵀ (T5 passes 1.0 — its init folds
    the scale); ``causal`` applies the right-aligned causal mask.
    """
    biases = [x.reshape((1,) * (4 - x.ndim) + x.shape) if x.ndim < 4 else x
              for x in biases if x is not None]
    blocks = (256, 256)
    use = _USE_FLASH
    if use == "auto":
        use = False
        if jax.default_backend() == "tpu" and q.shape[1] >= _MIN_Q_LEN:
            from vlm_compression_tpu.ops.autotune import lookup_attention

            b, n, h, d = q.shape
            dec = lookup_attention(b, h, n, k.shape[1], d, str(q.dtype),
                                   bool(causal))
            use = dec is not None and dec["backend"] == "pallas"
            if use and dec["tiles"]:
                blocks = tuple(dec["tiles"])
        interpret = False
    else:
        interpret = bool(use) and jax.default_backend() != "tpu"
    if causal and q.shape[1] > k.shape[1]:
        # right-aligned causal with n > m gives early queries ZERO
        # visible keys; the kernel's block skip would leave l = 0 (NaN
        # rows) where the reference defines the uniform average.  No
        # tower produces this shape — keep the exact semantics anyway.
        use = False
    if not use:
        return mha_reference(q, k, v, biases, scale, causal)
    return _flash_attention(q, k, v, biases, float(scale), bool(causal),
                            interpret, blocks)
