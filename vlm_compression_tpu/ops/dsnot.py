"""DSnoT — training-free mask refinement (dsnot_pruner.py:313-770).

Two branches, matching the reference's *exact* loop semantics:

Unstructured (dsnot_pruner.py:553-751): per cycle, each unit (row) draws a
regrow candidate from the two-pointer walk over the signed-metric-sorted
FULL column list (pruned columns carry `W·E[x]`, kept columns carry 0) and
a prune candidate from the wanda-ordered kept-column list reordered by
`return_reorder_indice`.  The reference's scatter quartet nets out to an
unconditional `mask[prune]=keep, mask[regrow]=pruned` for EVERY row every
cycle (regrow wins when the two candidates alias) — including rows whose
`update_mask` is already False — while the reconstruction error advances
only where `update_mask` holds.  Because the regrow pointer can walk into
the zero-metric (kept) region, initially-kept columns can end pruned: the
loop is NOT a no-op, and per-row density is not conserved.  Pointers that
the reference would walk off the list (torch.gather raises — UB it never
hits at production widths) are clamped to the boundary instead.

n:m (dsnot_pruner.py:407-552): per cycle, each row regrows the pruned
column whose signed metric best cancels the row's reconstruction error
(two-pointer over the sorted candidate list), and re-prunes the weakest
*kept* column within the same m-block so the n:m structure is preserved.
Rows stop when the error's sign would flip or |error| falls under
`update_threshold`; the mask scatters, as in the reference, still apply to
stopped rows.  Implemented as one `lax.while_loop` with all rows advanced
in parallel.

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


# torch-CPU topk(largest=False, k=1) tie index for an all-equal row of width
# m (quickselect pivot accident, probed per width on torch 2.x CPU).  The
# reference picks its re-prune column with topk over an m-block of the
# consumed-slot-promoted initial metric (dsnot_pruner.py:515-523); once every
# slot of a block is +inf the "min" index is this implementation artifact,
# and bit-for-bit parity requires reproducing it.  Unlisted widths fall back
# to 0 (torch's own behavior at width >= 64, and argmin's everywhere).
_TORCH_TOPK_TIE_IDX = {2: 0, 3: 0, 4: 2, 5: 2, 6: 3, 7: 5, 8: 6, 9: 7,
                       10: 8, 12: 9, 16: 10, 24: 15, 32: 22}


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
        keep0 = mask_ops.unstructured_mask(initial_metric, sparsity,
                                           rounding="round")
        if without_dsnot:
            return DSnoTResult(keep_mask=keep0, cycles=jnp.zeros((), jnp.int32))
        return _dsnot_unstructured(
            W, dsnot_metric, initial_metric, ~keep0, scaler_row, var,
            max_cycle_time=max_cycle_time, update_threshold=update_threshold,
            pow_of_var_regrowing=pow_of_var_regrowing,
            without_same_sign=without_same_sign)

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
        # fully-consumed block (all +inf): match torch topk's tie index
        all_inf = jnp.all(jnp.isposinf(blk_metric), axis=1)
        prune_off = jnp.where(all_inf, _TORCH_TOPK_TIE_IDX.get(m, 0), prune_off)
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


def _reorder_indice(vals: jnp.ndarray, valid_len) -> jnp.ndarray:
    """`return_reorder_indice` (dsnot_pruner.py:1881-1924) over the first
    `valid_len` entries of each row of `vals`: negatives keep their relative
    order, positives are appended in flipped order, zero-valued slots map to
    index 0 (the reference quirk).  Output width matches `vals`; slots at or
    past `valid_len` are forced to 0 (never gathered in defined behavior)."""
    rows, n = vals.shape
    j = jnp.arange(n)[None, :]
    valid = j < valid_len
    inf = jnp.inf
    idxf = j.astype(jnp.float32)
    neg_asc = jnp.sort(jnp.where(valid & (vals < 0), idxf, inf), axis=1)
    pos_asc = jnp.sort(jnp.where(valid & (vals > 0), idxf, inf), axis=1)
    n_neg = jnp.sum(valid & (vals < 0), axis=1, keepdims=True)
    n_pos = jnp.sum(valid & (vals > 0), axis=1, keepdims=True)
    # positives occupy output slots [valid_len - n_pos, valid_len) in
    # descending index order: slot j reads ascending rank valid_len - 1 - j
    pos_rank = jnp.clip(valid_len - 1 - j, 0, n - 1)
    pos_at = jnp.take_along_axis(pos_asc, jnp.broadcast_to(pos_rank, (rows, n)),
                                 axis=1)
    out = jnp.where(j < n_neg, neg_asc,
                    jnp.where(j >= valid_len - n_pos, pos_at, 0.0))
    out = jnp.where(valid & jnp.isfinite(out), out, 0.0)
    return out.astype(jnp.int32)


def _dsnot_unstructured(W, dsnot_metric, initial_metric, pruned0,
                        scaler_row, var, *, max_cycle_time, update_threshold,
                        pow_of_var_regrowing, without_same_sign):
    """The reference's unstructured regrow/prune loop (dsnot_pruner.py:553-751).

    See the module docstring for the netted-out scatter semantics this
    implements.  `pruned0` is the initial True=pruned mask from the
    round()-count initial-metric sort."""
    units, n_in = W.shape
    rows = jnp.arange(units)
    # kept count — identical for every row (round(n·ratio) columns pruned)
    res_num = jnp.sum((~pruned0[0]).astype(jnp.int32))

    # Regrow candidates: full-width stable sort of the signed metric with
    # kept columns zeroed (then de-weighted by var^pow) — dsnot_pruner.py:600-615.
    metric_regrow = jnp.where(pruned0, dsnot_metric, 0.0)
    recon_err = jnp.sum(metric_regrow, axis=1)                 # (units,)
    init_sign = jnp.sign(recon_err)
    if pow_of_var_regrowing:
        metric_regrow = metric_regrow / jnp.power(var[None, :],
                                                  pow_of_var_regrowing)
    regrow_order = jnp.argsort(metric_regrow, axis=1, stable=True)

    # Prune candidates: kept columns ascending by wanda metric, reordered by
    # the sign trick on their signed metrics — dsnot_pruner.py:583-596.
    wanda_m = jnp.abs(W) * jnp.sqrt(scaler_row)[None, :]
    wanda_m = jnp.where(pruned0, jnp.inf, wanda_m)
    wanda_order = jnp.argsort(wanda_m, axis=1, stable=True)    # (units, n)
    cand_vals = jnp.take_along_axis(dsnot_metric, wanda_order, axis=1)
    reorder = _reorder_indice(cand_vals, res_num)
    prune_list = jnp.take_along_axis(wanda_order, reorder, axis=1)

    def cond(state):
        _, _, upd, _, _, cycle = state
        return jnp.any(upd) & (cycle < max_cycle_time)

    def body(state):
        pruned, err, upd, gptr, pptr, cycle = state
        s_g = (err > 0).astype(jnp.int32)
        pg = jnp.clip(gptr[rows, s_g], 0, n_in - 1)
        g = regrow_order[rows, pg]
        gm = dsnot_metric[rows, g]
        gptr = gptr.at[rows, s_g].add(jnp.where(s_g == 0, 1, -1))

        s_p = (err < 0).astype(jnp.int32)
        # prune_list is only res_num entries wide (the kept columns);
        # clamp to ITS boundary so an exhausted pointer re-reads the
        # boundary element instead of aliasing through _reorder_indice's
        # forced-0 slots onto wanda_order[:, 0]
        pp = jnp.clip(pptr[rows, s_p], 0, res_num - 1)
        p = prune_list[rows, pp]
        pm = dsnot_metric[rows, p]
        pptr = pptr.at[rows, s_p].add(jnp.where(s_p == 0, 1, -1))

        err_after = err + pm - gm
        upd = upd & (jnp.abs(err) > update_threshold)
        if not without_same_sign:
            upd = upd & (init_sign == jnp.sign(err_after))

        # the scatter quartet nets to: prune candidate kept, regrow candidate
        # pruned, for every row; regrow wins when the candidates alias
        pruned = pruned.at[rows, p].set(False)
        pruned = pruned.at[rows, g].set(True)

        err = err + jnp.where(upd, pm - gm, 0.0)
        return (pruned, err, upd, gptr, pptr, cycle + 1)

    gptr0 = jnp.stack([jnp.zeros((units,), jnp.int32),
                       jnp.full((units,), n_in - 1, jnp.int32)], axis=1)
    pptr0 = jnp.stack([jnp.zeros((units,), jnp.int32),
                       jnp.broadcast_to(res_num - 1, (units,)).astype(jnp.int32)],
                      axis=1)
    upd0 = jnp.ones((units,), bool)
    state = (pruned0, recon_err, upd0, gptr0, pptr0, jnp.int32(0))
    pruned, _, _, _, _, cycle = jax.lax.while_loop(cond, body, state)
    return DSnoTResult(keep_mask=~pruned, cycles=cycle)
