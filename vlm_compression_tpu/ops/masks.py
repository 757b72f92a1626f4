"""Mask extraction kernels (unstructured per-unit top-k, n:m structured).

Semantics match the reference bit-for-bit at fp32 (wanda_pruner.py:323-341):
  * metrics are `(units, in)` (unit-major layout, see ops/__init__);
  * masks are boolean with **True = keep**;
  * unstructured: per output unit, prune the `int(in * sparsity)` columns
    with the smallest metric, ties broken by *stable ascending sort* —
    i.e. among equal metrics the lowest column indices are pruned first
    (torch.sort(stable=True) then take the first k indices);
  * n:m: within every group of `m` consecutive input columns prune the `n`
    smallest (torch.topk(largest=False): lowest indices win ties).
"""

from __future__ import annotations

import os as _os

import jax
import jax.numpy as jnp

# Rank-selection implementation.  "bisect" (default): per-row value-space
# bisection finds the k-th smallest metric, then a cumsum over the tied
# values reproduces the stable lowest-index-first tie order — no sort.
# Measured on-chip (round 5, XL shapes): 1.2-2.8x faster than the double
# stable argsort, bit-identical masks; the wanda phase's mask kernels were
# its largest component (~6 of 9.6 s).  "sort" restores the argsort path
# (the reference's literal formulation) for A/B.
_RANK_IMPL = _os.environ.get("VCT_MASK_IMPL", "bisect")


def _kth_smallest_rows(metric: jnp.ndarray, k, iters: int = 45) -> jnp.ndarray:
    """Per-row k-th smallest value (1-indexed k) by value-space bisection.

    45 rolled halvings of [row_min, row_max] converge below fp32 ulp for
    any realistic metric range (same doctrine as sparsegpt._bisect_quantile
    — and unlike jnp.sort, the lowering is KB-scale HLO and the runtime is
    bandwidth-, not sort-network-, bound).  ±inf metric entries would stall
    the interval; callers with possibly-infinite metrics should use
    VCT_MASK_IMPL=sort."""
    lo = jnp.min(metric, axis=-1)
    hi = jnp.max(metric, axis=-1)

    def body(_, c):
        lo, hi = c
        mid = 0.5 * (lo + hi)
        enough = jnp.sum(metric <= mid[:, None], axis=-1) >= k
        return jnp.where(enough, lo, mid), jnp.where(enough, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    # SNAP to an actual metric value: fp midpoint rounding can leave `hi`
    # one ulp past the true k-th smallest.  After convergence the interval
    # (lo, hi] isolates at most one distinct value, so the k-th smallest
    # is either lo itself (when ≥ k values already sit at/below lo — e.g.
    # a fully-tied row, or k = 0) or the smallest value above lo.
    cnt_lo = jnp.sum(metric <= lo[:, None], axis=-1)
    above = jnp.min(jnp.where(metric > lo[:, None], metric,
                              jnp.asarray(jnp.inf, metric.dtype)), axis=-1)
    return jnp.where(cnt_lo >= k, lo, above)


def _prune_k_smallest_stable(metric: jnp.ndarray, k) -> jnp.ndarray:
    """Keep-mask pruning the k smallest per row, ties by LOWEST index
    first (= stable-ascending-sort semantics), without sorting."""
    t = _kth_smallest_rows(metric, k)[:, None]
    lt = metric < t
    eq = metric == t
    need = k - jnp.sum(lt, axis=-1, keepdims=True)
    csum = jnp.cumsum(eq.astype(jnp.int32), axis=-1)
    return ~(lt | (eq & (csum <= need)))


def wanda_metric(weight_um: jnp.ndarray, scaler_row: jnp.ndarray) -> jnp.ndarray:
    """|W| · sqrt(E‖X_col‖²) — Wanda importance (wanda_pruner.py:319)."""
    return jnp.abs(weight_um.astype(jnp.float32)) * jnp.sqrt(scaler_row)[None, :]


def _stable_rank_ascending(metric: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """rank[i] = position of element i in a stable ascending sort along axis."""
    order = jnp.argsort(metric, axis=axis, stable=True)
    return jnp.argsort(order, axis=axis, stable=True)


def unstructured_mask(metric: jnp.ndarray, sparsity, *,
                      rounding: str = "floor") -> jnp.ndarray:
    """Per-unit unstructured keep-mask.

    metric   : (units, in) importance, fp32.
    sparsity : scalar in [0, 1] (python or traced).
    rounding : 'floor' (Wanda/SparseGPT: int(in*s)) or 'round' (DSnoT).
    """
    n_in = metric.shape[-1]
    if rounding == "floor":
        k = jnp.floor(n_in * jnp.asarray(sparsity, jnp.float32)).astype(jnp.int32)
    elif rounding == "round":
        # torch's round() is banker's rounding on .5 — jnp.round matches.
        k = jnp.round(n_in * jnp.asarray(sparsity, jnp.float32)).astype(jnp.int32)
    else:
        raise ValueError(rounding)
    if _RANK_IMPL == "bisect":
        return _prune_k_smallest_stable(metric, k)
    rank = _stable_rank_ascending(metric, axis=-1)
    return rank >= k  # True = keep


def nm_structured_mask(metric: jnp.ndarray, n: int, m: int) -> jnp.ndarray:
    """n-of-m structured keep-mask along the input dim (axis -1).

    Requires in % m == 0 (true for every transformer linear here).
    """
    units, n_in = metric.shape
    assert n_in % m == 0, f"in={n_in} not divisible by m={m}"
    g = metric.reshape(units, n_in // m, m)
    rank = _stable_rank_ascending(g, axis=-1)
    keep = rank >= n
    return keep.reshape(units, n_in)


def global_threshold_mask(metric: jnp.ndarray, sparsity: float) -> jnp.ndarray:
    """Keep-mask pruning the globally-smallest fraction of entries (flat)."""
    flat = metric.reshape(-1)
    k = jnp.floor(flat.shape[0] * jnp.asarray(sparsity, jnp.float32)).astype(jnp.int32)
    if _RANK_IMPL == "bisect":
        return _prune_k_smallest_stable(flat[None, :], k)[0].reshape(
            metric.shape)
    rank = _stable_rank_ascending(flat, axis=0)
    return (rank >= k).reshape(metric.shape)


def mask_density(mask: jnp.ndarray) -> jnp.ndarray:
    """Fraction of kept weights (reference check_sparsity audits)."""
    return jnp.mean(mask.astype(jnp.float32))


def flat_threshold_mask(metric: jnp.ndarray, sparsity) -> jnp.ndarray:
    """Per-tensor *value*-threshold keep-mask (ViT wanda variant,
    wanda_pruner.py:682-684): thres = sorted_flat[int(numel·s)], prune
    strictly-below (`metric < thres` — ties at the threshold are KEPT,
    unlike SparseGPT's `<=`)."""
    k = jnp.floor(metric.size * jnp.asarray(sparsity, jnp.float32)).astype(jnp.int32)
    kc = jnp.clip(k, 0, metric.size - 1)
    if _RANK_IMPL == "bisect":
        # sorted_flat[kc] = the (kc+1)-th smallest value
        thres = _kth_smallest_rows(metric.reshape(1, -1), kc + 1)[0]
        return metric >= thres
    flat = jnp.sort(metric.reshape(-1))
    thres = flat[kc]
    return metric >= thres


def apply_mask(weight: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero pruned weights, preserving dtype."""
    return jnp.where(mask, weight, jnp.zeros((), weight.dtype))


def ria_metric(weight_um: jnp.ndarray, scaler_row: jnp.ndarray,
               alpha: float = 0.5) -> jnp.ndarray:
    """RIA: Relative Importance and Activations (Zhang et al., 2024 —
    "Plug-and-Play: An Efficient Post-training Pruning Method for LLMs").

    RI_ij = |W_ij| / Σ_i |W_ij| + |W_ij| / Σ_j |W_ij|   (row+col relative)
    RIA_ij = RI_ij · (sqrt(E‖X_j‖²))^α                  (α = 0.5 default)

    A beyond-reference method: same sufficient statistics as Wanda, so it
    rides the identical calibration sweep; often stronger than Wanda at
    ≥50% sparsity because relative (per-row/col) magnitude protects small
    but locally-important weights."""
    w = jnp.abs(weight_um.astype(jnp.float32))
    row_sum = jnp.sum(w, axis=1, keepdims=True)   # per unit (output row)
    col_sum = jnp.sum(w, axis=0, keepdims=True)   # per input column
    ri = w / jnp.maximum(row_sum, 1e-30) + w / jnp.maximum(col_sum, 1e-30)
    act = jnp.sqrt(scaler_row)[None, :] ** alpha
    return ri * act


def transposable_nm_mask(metric: jnp.ndarray, n: int, m: int) -> jnp.ndarray:
    """n:m keep-mask valid in BOTH orientations (Hubara et al. 2021,
    "Accelerated Sparse Neural Training": masks whose transpose is also
    n:m, so W and Wᵀ products share one sparsity pattern — relevant for
    sparse TRAINING, where the backward pass multiplies by Wᵀ).

    Convention matches ``nm_structured_mask``: PRUNE n of every m, i.e.
    each tile row and column keeps at most ``m − n`` entries.

    Greedy 2-approximation per m×m tile: visit entries by descending
    metric; keep one iff its tile-row and tile-column each still have
    fewer than ``m − n`` kept.  The greedy may keep FEWER than the
    one-sided mask would (a tile can saturate at ≥ (m−n)·m/2 keeps
    instead of (m−n)·m — realized sparsity can exceed n/m; acceptable for
    the transposable setting, which trades density for the two-sided
    constraint).  Runs as a fixed m²-step `fori_loop` vmapped over tiles
    (no data-dependent shapes).  Requires units % m == 0 and in % m == 0.
    """
    units, n_in = metric.shape
    assert units % m == 0 and n_in % m == 0, (units, n_in, m)
    n = m - n  # keep-limit per tile row/column
    t = metric.astype(jnp.float32).reshape(units // m, m, n_in // m, m)
    tiles = t.transpose(0, 2, 1, 3).reshape(-1, m, m)     # (T, m, m)

    order = jnp.argsort(-tiles.reshape(-1, m * m), axis=-1)  # desc

    def one_tile(ordr):
        def body(i, carry):
            keep, rows, cols = carry
            flat = ordr[i]
            r, c = flat // m, flat % m
            ok = (rows[r] < n) & (cols[c] < n)
            keep = keep.at[r, c].set(ok)
            rows = rows.at[r].add(ok.astype(jnp.int32))
            cols = cols.at[c].add(ok.astype(jnp.int32))
            return keep, rows, cols

        keep0 = jnp.zeros((m, m), bool)
        z = jnp.zeros((m,), jnp.int32)
        keep, _, _ = jax.lax.fori_loop(0, m * m, body, (keep0, z, z))
        return keep

    keep_tiles = jax.vmap(one_tile)(order)
    keep = keep_tiles.reshape(units // m, n_in // m, m, m)
    return keep.transpose(0, 2, 1, 3).reshape(units, n_in)


def hybrid_tile_mask(metric: jnp.ndarray, target_sparsity: float,
                     n: int = 2, m: int = 4, tile: int = 64) -> jnp.ndarray:
    """Tile-level hybrid sparsity (PATCH, arXiv 2509.23410 — beyond the
    reference): the most salient (tile x tile) weight tiles stay fully
    DENSE, the rest take an n:m structured mask, with the dense-tile
    budget chosen so overall sparsity hits ``target_sparsity``.

    Hybrid layouts keep accuracy-critical tiles exact while the sparse
    tiles still admit the structured-kernel speedups; a tile-granular
    mask is also exactly what the packed-mask Pallas consumer likes
    (whole tiles of 1-bits cost nothing to expand).

    metric (units, in) saliency (higher = keep); dims need not divide
    ``tile`` (edge tiles are smaller, weighted by true element count).
    Fraction of n:m tiles f solves f·(1 − n/m) = target_sparsity;
    target_sparsity must be ≤ (1 − n/m).
    """
    u, k = metric.shape
    frac_nm = target_sparsity / (1.0 - n / m)
    if frac_nm > 1.0 + 1e-6:
        raise ValueError(
            f"target {target_sparsity} unreachable with {n}:{m} tiles")
    tu = -(-u // tile)
    tk = -(-k // tile)
    pad_u, pad_k = tu * tile - u, tk * tile - k
    mp = jnp.pad(metric, ((0, pad_u), (0, pad_k)))
    tiles = mp.reshape(tu, tile, tk, tile).transpose(0, 2, 1, 3)
    saliency = jnp.sum(jnp.abs(tiles), axis=(-1, -2)).reshape(-1)
    n_tiles = tu * tk
    n_sparse = int(round(frac_nm * n_tiles))
    # least-salient tiles take the n:m mask
    rank = _stable_rank_ascending(saliency, axis=0)
    tile_sparse = rank < n_sparse                       # (tu*tk,)
    nm = nm_structured_mask(metric, n, m)
    tile_map = tile_sparse.reshape(tu, tk)
    elem_sparse = jnp.repeat(jnp.repeat(tile_map, tile, axis=0), tile,
                             axis=1)[:u, :k]
    return jnp.where(elem_sparse, nm, True)
