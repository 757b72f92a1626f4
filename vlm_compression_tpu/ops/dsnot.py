"""DSnoT — training-free mask refinement (dsnot_pruner.py:313-770).

Two branches, matching the reference's *observed* semantics:

Unstructured (dsnot_pruner.py:553-751): the reference's per-cycle mask
update is a scatter quartet whose second pair provably restores the first
pair's slots to their pre-update values (verified against torch: for every
row, `prune_values` is identically False and `regrow_values` identically
True, i.e. the prune candidate ends kept and the regrow candidate ends
pruned — exactly their initial states).  The final mask therefore equals
the **initial-metric mask**; only `reconstruction_error` bookkeeping
evolves, and it has no observable output.  We return the initial mask
directly — bit-identical results at zero cycles.

n:m (dsnot_pruner.py:407-552): a real refinement.  Per cycle, each unit
(row) regrows the pruned column whose signed metric `W·E[x]` best cancels
the row's reconstruction error (two-pointer over the sorted candidate
list), and re-prunes the weakest *kept* column within the same m-block so
the n:m structure is preserved.  Rows stop when the error's sign would
flip or |error| falls under `update_threshold`.  Implemented as one
`lax.while_loop` with all rows advanced in parallel.

Layout: unit-major ``(units, in)``; masks returned True = keep.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vlm_compression_tpu.ops import masks as mask_ops


def return_reorder_indice(x: jnp.ndarray) -> jnp.ndarray:
    """Reorder indices so negatives keep relative order and positives flip
    (dsnot_pruner.py:1881-1924) — used to build the pruning candidate list."""
    rows, n = x.shape
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float64 if jax.config.jax_enable_x64
                                      else jnp.float32), (rows, n))
    inf = jnp.inf
    pos_idx = jnp.where(x > 0, idx, inf)
    neg_idx = jnp.where(x < 0, idx, inf)
    pos_sorted = jnp.sort(pos_idx, axis=1)
    neg_sorted = jnp.sort(neg_idx, axis=1)
    pos_sorted = jnp.flip(pos_sorted, axis=1)
    neg_sorted = jnp.where(jnp.isinf(neg_sorted), 0.0, neg_sorted)
    pos_sorted = jnp.where(jnp.isinf(pos_sorted), 0.0, pos_sorted)
    return (pos_sorted + neg_sorted).astype(jnp.int32)


def dsnot_initial_metric(weight_um, scaler_row, hessian=None,
                         initial_method: str = "wanda"):
    """Initial importance per reference (dsnot_pruner.py:368-405)."""
    W = weight_um.astype(jnp.float32)
    if initial_method == "wanda":
        return jnp.abs(W) * jnp.sqrt(scaler_row)[None, :]
    if initial_method == "magnitude":
        return jnp.abs(W)
    if initial_method == "sparsegpt":
        # single unconditional damping (no retry loop in this path)
        H = hessian.astype(jnp.float32)
        diag = jnp.diagonal(H)
        dead = diag == 0
        H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
        W = jnp.where(dead[None, :], 0.0, W)
        damp = 0.01 * jnp.mean(jnp.diagonal(H))
        H = H + damp * jnp.eye(H.shape[0], dtype=H.dtype)
        L = jnp.linalg.cholesky(H)
        eye = jnp.eye(H.shape[0], dtype=H.dtype)
        hinv = jax.scipy.linalg.cho_solve((L, True), eye)
        U = jnp.linalg.cholesky(hinv).T
        # note: single power of the diagonal here (dsnot_pruner.py:404)
        return W * W / jnp.diagonal(U)[None, :]
    raise ValueError(initial_method)


class DSnoTResult(NamedTuple):
    keep_mask: jnp.ndarray
    cycles: jnp.ndarray  # () int32 — refinement cycles actually run


@functools.partial(jax.jit, static_argnames=(
    "prune_n", "prune_m", "max_cycle_time", "without_same_sign",
    "pow_of_var_regrowing", "without_dsnot", "initial_method"))
def dsnot_refine_mask(
    weight_um: jnp.ndarray,
    scaler_row: jnp.ndarray,
    sum_metric_row: jnp.ndarray,
    var: jnp.ndarray,
    sparsity,
    prune_n: int = 0,
    prune_m: int = 0,
    max_cycle_time: int = 50,
    update_threshold: float = 0.1,
    pow_of_var_regrowing: float = 1.0,
    without_same_sign: bool = True,
    without_dsnot: bool = False,
    initial_method: str = "wanda",
    hessian=None,
) -> DSnoTResult:
    W = weight_um.astype(jnp.float32)
    units, n_in = W.shape
    dsnot_metric = W * sum_metric_row[None, :].astype(jnp.float32)
    initial_metric = dsnot_initial_metric(W, scaler_row, hessian, initial_method)

    if prune_n == 0:
        # Unstructured: the reference loop cannot change the mask (see module
        # docstring) — final mask is the initial-metric mask with round().
        keep = mask_ops.unstructured_mask(initial_metric, sparsity, rounding="round")
        return DSnoTResult(keep_mask=keep, cycles=jnp.zeros((), jnp.int32))

    # ---------------- n:m branch -----------------------------------------
    m, n = prune_m, prune_n
    assert n_in % m == 0
    g = initial_metric.reshape(units, n_in // m, m)
    order = jnp.argsort(g, axis=-1, stable=True)
    rank = jnp.argsort(order, axis=-1, stable=True)
    pruned0 = (rank < n).reshape(units, n_in)          # True = pruned initially

    # metric_for_regrowing: DSnoT metric, zeroed at kept columns
    metric_regrow = jnp.where(pruned0, dsnot_metric, 0.0)
    recon_err = jnp.sum(metric_regrow, axis=1, keepdims=True)    # (units, 1)
    init_sign = jnp.sign(recon_err)
    if pow_of_var_regrowing:
        metric_regrow = metric_regrow / jnp.power(var[None, :], pow_of_var_regrowing)
    regrow_order = jnp.argsort(metric_regrow, axis=1, stable=True)  # (units, in)

    # initial_metric with pruned columns promoted to +inf; used to pick the
    # weakest kept column of a block, with consumed slots promoted too.
    init_metric_work = jnp.where(pruned0, jnp.inf, initial_metric)
    max_val = jnp.max(init_metric_work, axis=1, keepdims=True) + 1.0  # = inf

    rows = jnp.arange(units)

    def cond(state):
        _, _, _, update_mask, ptrs, cycle = state
        return jnp.any(update_mask) & (cycle <= max_cycle_time)

    def body(state):
        pruned, imetric, err, update_mask, ptrs, cycle = state
        side = (err > 0).astype(jnp.int32)[:, 0]                # (units,)
        # clamp: a pointer that has walked past either end (reference UB —
        # torch.gather would raise) re-reads the boundary candidate instead
        ptr = jnp.clip(ptrs[rows, side], 0, n_in - 1)           # (units,)
        regrow_col = regrow_order[rows, ptr]                    # (units,)
        regrow_metric = dsnot_metric[rows, regrow_col]

        block_start = regrow_col - regrow_col % m
        blk_idx = block_start[:, None] + jnp.arange(m)[None, :]  # (units, m)
        blk_metric = jnp.take_along_axis(imetric, blk_idx, axis=1)
        prune_off = jnp.argmin(blk_metric, axis=1)
        prune_col = block_start + prune_off
        prune_metric = dsnot_metric[rows, prune_col]

        err_col = err[:, 0]
        err_after = err_col + prune_metric - regrow_metric
        upd = update_mask[:, 0]
        upd = upd & (init_sign[:, 0] == jnp.sign(err_after)) \
                  & (jnp.abs(err_col) > update_threshold)

        imetric = imetric.at[rows, prune_col].set(max_val[:, 0])
        pruned = pruned.at[rows, prune_col].set(upd)
        pruned = pruned.at[rows, regrow_col].set(~upd)

        err_col = err_col + jnp.where(upd, prune_metric - regrow_metric, 0.0)
        step = jnp.where(side == 0, 1, -1)
        ptrs = ptrs.at[rows, side].add(step)
        return (pruned, imetric, err_col[:, None], upd[:, None], ptrs, cycle + 1)

    ptrs0 = jnp.stack(
        [jnp.zeros((units,), jnp.int32),
         jnp.full((units,), n_in - 1, jnp.int32)], axis=1)
    update0 = jnp.ones((units, 1), bool)
    state = (pruned0, init_metric_work, recon_err, update0, ptrs0, jnp.int32(1))
    pruned, _, _, _, _, cycle = jax.lax.while_loop(cond, body, state)
    return DSnoTResult(keep_mask=~pruned, cycles=cycle - 1)
