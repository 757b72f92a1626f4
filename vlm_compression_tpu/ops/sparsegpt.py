"""SparseGPT: OBS-style pruning with weight update, as one jitted program.

Re-derivation of the reference's ``SparseGPT.fasterprune``
(sparsegpt_pruner.py:81-215) for TPU:

  * Hessian hygiene (dead columns, ±inf clamping to quantiles) — vectorized.
  * Damped Cholesky with retry — a bounded `lax.while_loop` that adds
    `damp·I` until the factorization is NaN-free (jnp.linalg.cholesky
    signals non-PSD with NaNs rather than raising, which makes the
    reference's try/except loop a clean device-side loop).
  * `cholesky_inverse` — `cho_solve` against the identity.
  * The blocked column sweep: `lax.scan` over 128-column blocks; inside a
    block the inherently-serial column recursion runs as `lax.fori_loop`
    with all rows updated vectorized (the row dimension keeps the VPU/MXU
    busy while the column recursion is serial — see SURVEY.md §7 hard
    parts #1).  The trailing cross-block update `W[:, i2:] -= Err·Hinv` is
    one masked MXU matmul per block.

Layout: unit-major ``(units, in)``; the Hessian is ``(in, in)``.
All math fp32 (matches reference `.float()` casts).  Matmul precision is
``VCT_OBS_PRECISION`` (default ``highest`` = full fp32, the reference's
semantics; it also governs the calibration Hessian fold in ops/stats.py).
``high`` (bf16_3x) was MEASURED on-chip in round 5
(scripts/ab_obs_precision.py): only 1.15x on the solve sweep — the OBS
phase is serial-structure/bandwidth-bound, not MXU-rate-bound — while
mask agreement collapses to 70.7% on the din=5120 shape (t5_wo: the
2^-21 product error compounds across 40 sequential column blocks).
Keep the default; the knob remains for A/B only.
"""

from __future__ import annotations

import functools
import os as _os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_PRECISION_NAMES = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}


def _resolve_precision() -> jax.lax.Precision:
    raw = _os.environ.get("VCT_OBS_PRECISION", "highest").lower()
    if raw not in _PRECISION_NAMES:
        import warnings

        warnings.warn(
            f"VCT_OBS_PRECISION={raw!r} is not one of "
            f"{sorted(_PRECISION_NAMES)}; falling back to 'highest' "
            "(full fp32, the reference's semantics). Use 'high' for the "
            "bf16_3x OBS linalg mode.",
            stacklevel=2,
        )
        raw = "highest"
    return _PRECISION_NAMES[raw]


_PRECISION = _resolve_precision()


def _bisect_quantile(h: jnp.ndarray, q: float, iters: int = 45) -> jnp.ndarray:
    """q-quantile by value-space bisection over count(h ≤ t).

    jnp.quantile sorts: on a 5120² Hessian that is a 26M-element XLA sort
    whose unrolled lowering adds megabytes to the executable (loaded over
    a device tunnel at ~2 MB/s, executable size IS wall-clock).  45 rolled
    counting passes converge the threshold to float precision with a
    ~KB-scale HLO.  ±inf entries rank above/below every finite value,
    matching their sorted positions."""
    finite = jnp.isfinite(h)
    big = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(finite, h, big))
    hi = jnp.max(jnp.where(finite, h, -big))
    k = jnp.asarray(round(q * h.size), jnp.int32)

    def body(_, c):
        lo, hi = c
        mid = 0.5 * (lo + hi)
        enough = jnp.sum(h <= mid) >= k
        return jnp.where(enough, lo, mid), jnp.where(enough, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return hi


def _clamp_infs(h: jnp.ndarray) -> jnp.ndarray:
    """Clamp ±inf entries to the 99.9% / 0.1% quantiles
    (sparsegpt_pruner.py:101-109,133-141)."""
    pos = jnp.isinf(h) & (h > 0)
    neg = jnp.isinf(h) & (h < 0)

    def fix(h, mask, q):
        return jnp.where(mask, _bisect_quantile(h, q), h)

    h = jax.lax.cond(jnp.any(pos), lambda x: fix(x, pos, 0.999), lambda x: x, h)
    h = jax.lax.cond(jnp.any(neg), lambda x: fix(x, neg, 0.001), lambda x: x, h)
    return h


def _pick_panel(n: int) -> int:
    """Largest panel in {512, 256, 128} dividing n: fewer rolled
    iterations (less serial-latency and full-matrix traffic) at identical
    total FLOPs and constant executable size."""
    for p in (512, 256, 128):
        if n % p == 0:
            return p
    return 0


def _cholesky_rolled(h: jnp.ndarray, panel: int = 128) -> jnp.ndarray:
    """Blocked right-looking Cholesky as a ROLLED fori_loop over panels.

    XLA's native Cholesky lowering unrolls its blocked sweep — ~3.5 MB of
    HLO at 2048², growing with n (executable load over a device tunnel is
    the XL bench's bottleneck).  Here each iteration factorizes one
    panel (panels > 128 recurse into a rolled-128 factorization), forms
    the column strip with the triangular inverse, and applies the trailing
    SYRK update as one full-matrix masked MXU matmul — constant HLO,
    n/panel iterations.  NaNs from an indefinite panel propagate exactly
    like the native lowering, so damped retries work unchanged."""
    n = h.shape[0]
    rows = jnp.arange(n)
    mm = functools.partial(jax.lax.dot_general,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           precision=_PRECISION)

    def body(j, a):
        i = j * panel
        d = jax.lax.dynamic_slice(a, (i, i), (panel, panel))
        if panel > 128:
            ld = _cholesky_rolled(d, 128)
            ldinv_t = _tri_inverse_lower_blocked(ld).T
        else:
            ld = jnp.linalg.cholesky(d)
            ldinv_t = _tri_inverse_lower(ld).T
        strip = jax.lax.dynamic_slice(a, (0, i), (n, panel))
        below = (rows >= i + panel)[:, None]
        lcol = jnp.where(below, mm(strip, ldinv_t), 0.0)
        new_strip = jax.lax.dynamic_update_slice(lcol, ld, (i, 0))
        a = jax.lax.dynamic_update_slice(a, new_strip, (0, i))
        # trailing SYRK: lcol is zero outside the below-rows, so the
        # product only touches the (below, below) block
        return a - mm(lcol, lcol.T)

    a = jax.lax.fori_loop(0, n // panel, body, h)
    return jnp.tril(a)


_DC_BASE = 768  # d&c leaf size: 6144 → 8 leaves, HLO stays ~constant


def _trsm_right_lower_t(a: jnp.ndarray, L: jnp.ndarray,
                        base: int = _DC_BASE) -> jnp.ndarray:
    """Solve X·Lᵀ = A (L lower-triangular) by divide & conquer.

    Splitting L = [[La,0],[Lb,Lc]] gives X1 = A1·La⁻ᵀ and
    X2 = (A2 − X1·Lbᵀ)·Lc⁻ᵀ — two half-size solves plus one big MXU
    matmul per level (optimal O(m·k²) FLOPs, log-depth full-matrix
    traffic).  Leaves multiply by the explicit triangular inverse."""
    k = L.shape[0]
    mm = functools.partial(jax.lax.dot_general,
                           dimension_numbers=(((1,), (1,)), ((), ())),
                           precision=_PRECISION)  # A·Bᵀ
    if k <= base or k % 128 != 0:
        return mm(a, _tri_inverse_lower_level_batched(L)
                  if k > 128 else _tri_inverse_lower(L))
    k1 = ((k // 2 + 127) // 128) * 128
    La, Lb, Lc = L[:k1, :k1], L[k1:, :k1], L[k1:, k1:]
    x1 = _trsm_right_lower_t(a[:, :k1], La, base)
    x2 = _trsm_right_lower_t(a[:, k1:] - mm(x1, Lb), Lc, base)
    return jnp.concatenate([x1, x2], axis=1)


def _cholesky_dc(h: jnp.ndarray, base: int = _DC_BASE) -> jnp.ndarray:
    """Divide & conquer Cholesky: L11 = chol(A11), L21 = A21·L11⁻ᵀ,
    L22 = chol(A22 − L21·L21ᵀ).

    Optimal n³/3 FLOPs vs the rolled panel loop's 2n³ (whose trailing
    SYRK touches the FULL matrix every panel), while HLO stays small:
    log₂(n/base) levels, each a couple of big matmuls + leaf factors.
    NaNs from an indefinite submatrix propagate through the solves, so
    damped retries see them exactly like the one-shot lowerings."""
    n = h.shape[0]
    if n <= base or n % 128 != 0:
        if n % 128 == 0 and n > 128:
            return _cholesky_rolled(h, 128)
        return jnp.linalg.cholesky(h)
    n1 = ((n // 2 + 127) // 128) * 128
    A11, A21, A22 = h[:n1, :n1], h[n1:, :n1], h[n1:, n1:]
    L11 = _cholesky_dc(A11, base)
    L21 = _trsm_right_lower_t(A21, L11, base)
    S = A22 - jax.lax.dot_general(
        L21, L21, (((1,), (1,)), ((), ())),
        precision=_PRECISION)
    L22 = _cholesky_dc(S, base)
    top = jnp.concatenate([L11, jnp.zeros((n1, n - n1), h.dtype)], axis=1)
    return jnp.concatenate([top, jnp.concatenate([L21, L22], axis=1)], axis=0)


# Factorization implementation: "dc" (default) = inlined divide &
# conquer — fastest steady state; its bigger executables (~10 MB at
# 6144²) load during the untimed `Pruner.prewarm()`, so even over a
# ~2 MB/s device tunnel the sweeps win.  Measured round 5 (XL bench,
# two runs each): sparsegpt phase 29.2-29.5 s under dc vs 31.4-32.8 s
# under rolled.  "rolled" = panel-rolled loops with constant ~0.5 MB
# executables — the right choice when programs cannot be prewarmed and
# executable bytes land inside the measured window.  Selectable via
# VCT_OBS_FACTOR.
import os as _os

_FACTOR_IMPL = _os.environ.get("VCT_OBS_FACTOR", "dc")

# Unstructured-sweep substitution: "panel" (default) = S-wide panels with
# an unrolled in-panel recursion; "serial" = per-column recursion (A/B
# and odd-shape fallback).  VCT_OBS_PANEL sets S (default 16; <= 1
# disables panels, same as VCT_OBS_SUBST=serial).
_SUBST_IMPL = _os.environ.get("VCT_OBS_SUBST", "panel")
_SUBST_S = max(1, int(_os.environ.get("VCT_OBS_PANEL", "16")))


def damped_cholesky(h: jnp.ndarray, damp: jnp.ndarray, max_tries: int = 32) -> jnp.ndarray:
    """Lower Cholesky factor, adding damp·I until NaN-free (bounded retries)."""
    eye = jnp.eye(h.shape[0], dtype=h.dtype)

    def attempt(hh):
        n = hh.shape[0]
        panel = _pick_panel(n)
        if panel and n > panel:
            if _FACTOR_IMPL == "dc":
                return _cholesky_dc(hh)
            return _cholesky_rolled(hh, panel)
        return jnp.linalg.cholesky(hh)

    def cond(carry):
        _, chol, it = carry
        return jnp.any(jnp.isnan(chol)) & (it < max_tries)

    def body(carry):
        hh, _, it = carry
        hh = hh + damp * eye
        return hh, attempt(hh), it + 1

    _, chol, _ = jax.lax.while_loop(cond, body, (h, attempt(h), jnp.int32(0)))
    return chol


def _tri_inverse_lower(L: jnp.ndarray) -> jnp.ndarray:
    """Exact lower-triangular inverse by Neumann doubling.

    L = D(I + T) with T = D⁻¹·stril(L) strictly lower ⇒ nilpotent, so
    (I + T)⁻¹ = Π_{j<⌈log₂n⌉} (I + (−T)^{2^j}) is a FINITE product of
    matmuls evaluated in a rolled fori_loop — XLA's triangular_solve
    lowering unrolls a blocked sweep into a multi-MB executable, while
    this is ~KBs of HLO and runs at MXU rate.  O(n³ log n): right for
    panel-sized blocks; use _tri_inverse_lower_blocked beyond a panel."""
    n = L.shape[0]
    d = jnp.diagonal(L)
    T = jnp.tril(L, k=-1) / d[:, None]
    mm = functools.partial(jax.lax.dot_general,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           precision=_PRECISION)
    steps = max(1, (n - 1).bit_length())

    def body(_, c):
        P, M = c
        return P + mm(P, M), mm(M, M)

    P0 = jnp.eye(n, dtype=L.dtype) - T
    P, _ = jax.lax.fori_loop(0, steps - 1, body, (P0, mm(-T, -T)))
    return P / d[None, :]


def _tri_inverse_lower_blocked(L: jnp.ndarray, panel: int = 128
                               ) -> jnp.ndarray:
    """O(n³) lower-triangular inverse: rolled block forward substitution.

    Row-panel recursion X[i] = L_ii⁻¹(E_i − L[i, :] X) with X's unwritten
    rows still zero — each iteration is one (panel, n)×(n, n) MXU matmul
    plus a panel-sized doubling inverse, constant HLO.  6144²: ~25 ms vs
    ~400 ms for full-size doubling (which is O(n³ log n))."""
    n = L.shape[0]
    if n % panel != 0 or n <= panel:
        return _tri_inverse_lower(L)
    mm = functools.partial(jax.lax.dot_general,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           precision=_PRECISION)
    eye_p = jnp.eye(panel, dtype=L.dtype)

    def body(j, x):
        i = j * panel
        lrow = jax.lax.dynamic_slice(L, (i, 0), (panel, n))
        ld = jax.lax.dynamic_slice(L, (i, i), (panel, panel))
        ldinv = (_tri_inverse_lower_blocked(ld, 128) if panel > 128
                 else _tri_inverse_lower(ld))
        ei = jax.lax.dynamic_update_slice(
            jnp.zeros((panel, n), L.dtype), eye_p, (0, i))
        s = mm(ldinv, ei - mm(lrow, x))
        return jax.lax.dynamic_update_slice(x, s, (i, 0))

    return jax.lax.fori_loop(0, n // panel, body, jnp.zeros_like(L))


def _tri_inverse_lower_dc(L: jnp.ndarray, base: int = _DC_BASE
                          ) -> jnp.ndarray:
    """Divide & conquer lower-triangular inverse:
    [[La,0],[Lb,Lc]]⁻¹ = [[La⁻¹,0],[−Lc⁻¹·Lb·La⁻¹, Lc⁻¹]].

    Two half-size inverses + two big matmuls per level (~n³/3 FLOPs) vs
    the rolled forward substitution's 2n³ full-width panel products."""
    n = L.shape[0]
    if n <= base or n % 128 != 0:
        return _tri_inverse_lower_blocked(L)
    n1 = ((n // 2 + 127) // 128) * 128
    La, Lb, Lc = L[:n1, :n1], L[n1:, :n1], L[n1:, n1:]
    ai = _tri_inverse_lower_dc(La, base)
    ci = _tri_inverse_lower_dc(Lc, base)
    mm = functools.partial(jax.lax.dot_general,
                           dimension_numbers=(((1,), (0,)), ((), ())),
                           precision=_PRECISION)
    off = -mm(ci, mm(Lb, ai))
    top = jnp.concatenate([ai, jnp.zeros((n1, n - n1), L.dtype)], axis=1)
    return jnp.concatenate([top, jnp.concatenate([off, ci], axis=1)], axis=0)


def _tri_inverse_lower_level_batched(L: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular inverse by LEVEL-BATCHED divide & conquer.

    All leaf-diagonal blocks invert in ONE vmapped doubling program; then
    per doubling level s = leaf, 2·leaf, …, n/2 every aligned block pair
    combines X[c,a] = −X[c,c]·L[c,a]·X[a,a] in ONE batched bmm pair.  Same
    ~⅔n³ FLOPs as plain d&c but log₂(n/leaf) program instances instead of
    O(n/leaf): the compiled executable stays ~0.5 MB where inlined d&c
    reached 2.4 MB (executable size is wall-clock over a device tunnel).

    The leaf is n halved until it lands in [64, 384] so nb = n/leaf is a
    power of two (6144→96, 5120→80, 2048→64, 1408→88 — every transformer
    width here qualifies); odd sizes fall back to plain d&c."""
    n = L.shape[0]
    leaf = n
    while leaf % 2 == 0 and leaf // 2 >= 64:
        leaf //= 2
    if leaf == n or leaf > 384 or leaf % 8 != 0:
        return _tri_inverse_lower_dc(L)
    nb = n // leaf
    blocks = L.reshape(nb, leaf, nb, leaf)
    diag = jnp.einsum("ibid->ibd", blocks)          # (nb, leaf, leaf) gather
    dinv = jax.vmap(_tri_inverse_lower)(diag)
    # scatter leaf inverses onto the block diagonal of X
    X = jnp.zeros_like(L).reshape(nb, leaf, nb, leaf)
    X = X.at[jnp.arange(nb), :, jnp.arange(nb), :].set(dinv)
    X = X.reshape(n, n)

    bmm = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                            precision=_PRECISION)
    s = leaf
    while s < n:
        p = n // (2 * s)                             # aligned pairs
        X4 = X.reshape(p, 2 * s, p, 2 * s)
        L4 = L.reshape(p, 2 * s, p, 2 * s)
        pr = jnp.arange(p)
        ainv = X4[pr, :s, pr, :s]                    # (p, s, s)
        cinv = X4[pr, s:, pr, s:]
        b = L4[pr, s:, pr, :s]
        off = -bmm(cinv, bmm(b, ainv))
        X = X4.at[pr, s:, pr, :s].set(off).reshape(n, n)
        s *= 2
    return X


def _cholesky_inverse(chol_lower: jnp.ndarray) -> jnp.ndarray:
    """(LLᵀ)⁻¹ = L⁻ᵀL⁻¹ via a triangular inverse + one matmul (instead of
    cho_solve's unrolled two-sided TRSM)."""
    if _FACTOR_IMPL == "dc":
        linv = _tri_inverse_lower_level_batched(chol_lower)
    else:
        panel = _pick_panel(chol_lower.shape[0])
        linv = _tri_inverse_lower_blocked(chol_lower, panel or 128)
    return jax.lax.dot_general(
        linv, linv, (((0,), (0,)), ((), ())),
        precision=_PRECISION)


class SparseGPTResult(NamedTuple):
    weight: jnp.ndarray      # (units, in) updated weights, pruned entries zero
    keep_mask: jnp.ndarray   # (units, in) bool, True = keep
    losses: jnp.ndarray      # (units,) accumulated OBS losses
    importance: jnp.ndarray  # () scalar mean |W²/diag(Hinv)²| (reference logs this)


def _sparsegpt_prune_impl(
    weight_um: jnp.ndarray,
    hessian: jnp.ndarray,
    sparsity,
    prune_n: int = 0,
    prune_m: int = 0,
    blocksize: int = 128,
    percdamp: float = 0.01,
    rows_static: Optional[int] = None,
) -> SparseGPTResult:
    """Prune + OBS-update one linear layer.

    weight_um : (units, in) weights (any float dtype; fp32 internally).
    hessian   : (in, in) = (2/n) Σ XᵀX from calibration.
    sparsity  : unstructured fraction pruned (ignored when prune_n > 0).
    """
    W = weight_um.astype(jnp.float32)
    H = hessian.astype(jnp.float32)
    units, cols = W.shape
    out_dtype = weight_um.dtype

    # --- dead columns ----------------------------------------------------
    diag = jnp.diagonal(H)
    dead = diag == 0
    H = H + jnp.diag(jnp.where(dead, 1.0, 0.0))
    W = jnp.where(dead[None, :], 0.0, W)

    # --- upper Cholesky factor of H⁻¹ ------------------------------------
    # The reference materializes H⁻¹ (cholesky → cholesky_inverse) and
    # factorizes it again (sparsegpt_pruner.py:127-141); the sweep only
    # ever reads the UPPER FACTOR.  The exchange-matrix identity
    #   chol_upper(H⁻¹) = J·chol_lower(J·H·J)⁻¹·J   (J = anti-identity)
    # yields that factor from ONE Cholesky + ONE triangular inverse —
    # dropping the n³ gemm forming H⁻¹ and the second 2n³ Cholesky
    # (≈45% of the OBS linalg FLOPs; verified to machine precision).
    # Deviations from the reference, both pathological-input-only: the
    # inf-clamp + damped retry it applies to the EXPLICIT H⁻¹ have no
    # equivalent here (H⁻¹ is never formed; infs there require overflow
    # past fp32 from an H the first damping already rejected).
    # VCT_OBS_INV=explicit restores the materialized path for A/B.
    H = _clamp_infs(H)
    damp = percdamp * jnp.mean(jnp.diagonal(H))
    if _os.environ.get("VCT_OBS_INV") == "explicit":
        L = damped_cholesky(H, damp)
        Hinv_full = _cholesky_inverse(L)
        Hinv_full = _clamp_infs(Hinv_full)
        damp2 = percdamp * jnp.mean(jnp.abs(jnp.diagonal(Hinv_full)))
        L2 = damped_cholesky(Hinv_full, damp2)
        Hinv = L2.T  # upper, as torch.linalg.cholesky(·, upper=True)
    else:
        M = damped_cholesky(H[::-1, ::-1], damp)
        if _FACTOR_IMPL == "dc":
            Minv = _tri_inverse_lower_level_batched(M)
        else:
            panel = _pick_panel(M.shape[0])
            Minv = _tri_inverse_lower_blocked(M, panel or 128)
        Hinv = Minv[::-1, ::-1]  # upper Cholesky factor of H⁻¹

    hinv_diag = jnp.diagonal(Hinv)
    importance = jnp.mean(jnp.abs(W * W / (hinv_diag[None, :] ** 2)))

    # --- blocked column sweep -------------------------------------------
    if cols % blocksize != 0:
        # Real transformer widths are all multiples of 128; fall back to one
        # block spanning everything for odd (test-sized) shapes.
        blocksize = cols
    nblocks = cols // blocksize
    B = blocksize
    sparsity = jnp.asarray(sparsity, jnp.float32)
    col_ids = jnp.arange(cols)

    def block_step(carry, b):
        W, losses = carry
        i1 = b * B
        W1 = jax.lax.dynamic_slice(W, (0, i1), (units, B))
        Hinv1 = jax.lax.dynamic_slice(Hinv, (i1, i1), (B, B))
        d1 = jnp.diagonal(Hinv1)

        if prune_n == 0:
            tmp = W1 * W1 / (d1[None, :] ** 2)
            flat = jnp.sort(tmp.reshape(-1))
            k = jnp.floor(tmp.size * sparsity).astype(jnp.int32)
            thresh = flat[jnp.clip(k, 0, tmp.size - 1)]
            prune1 = tmp <= thresh  # reference: `tmp <= thresh` (ties pruned)

            # The serial column recursion has a CLOSED FORM when the mask
            # is fixed up front (unstructured path): kept columns generate
            # zero error, so per row r the pruned errors x solve the upper-
            # triangular system  x·A_r = w⁰_r⊙pruned_r  with
            #   A_r[k,i] = pruned_r[i]·Hinv1[k,i]  (k<i),
            #   A_r[i,i] = pruned_r[i] ? d_i : 1,
            # which gives  x_i = pruned_i · (w_i − Σ_{k<i} x_k·U[k,i]) / d_i.
            # Solve by BLOCKED forward substitution vectorized over rows:
            # the B columns split into panels of S=16; per panel ONE
            # (units,B)×(B,S) matmul folds in every already-solved column
            # (x's entries ≥ the panel are still zero; the cross term is
            # masked by pruned — in the one-shot system the mask rides in
            # A's columns, so moving solved columns to the RHS must keep
            # it), then the in-panel recursion runs serially on the small
            # (units,S) slice only.  The column recursion is HBM-bound,
            # not FLOP-bound: a full-width step reads/writes the whole
            # (units,B) x every column (measured 4.3 µs/step plain and
            # 42 µs/step under the G-vmap — ~60% of the XL OBS phase), the
            # in-panel step touches (units,16) — ~10× less traffic per
            # block.  Two rejected alternatives, both measured slower: a
            # full-width B×B per-row Neumann inverse (squares a
            # (units,B,B) tensor — 4.4×), and in-panel 16³ batched-
            # doubling inverses (16×16 matmuls waste the 128×128 MXU tile;
            # 2.3× slower end-to-end).  fp32 precision=HIGHEST throughout:
            # faster AND ~1e4× more accurate than default for these solves
            # (measured).  VCT_OBS_SUBST=serial restores the unblocked
            # recursion for A/B.
            strict_u = jnp.triu(Hinv1, k=1)                      # (B, B)
            pr = prune1.astype(jnp.float32)                      # (units, B)
            wp = W1 * pr

            S = _SUBST_S if (_SUBST_S > 1
                             and B % _SUBST_S == 0 and B > _SUBST_S
                             and _SUBST_IMPL != "serial") else 0
            if S:
                def panel(j, x):
                    i = j * S
                    prp = jax.lax.dynamic_slice(pr, (0, i), (units, S))
                    ucols = jax.lax.dynamic_slice(strict_u, (0, i), (B, S))
                    rhs = (jax.lax.dynamic_slice(wp, (0, i), (units, S))
                           - prp * jnp.dot(
                               x, ucols,
                               precision=_PRECISION))
                    upp = jnp.triu(
                        jax.lax.dynamic_slice(Hinv1, (i, i), (S, S)), k=1)
                    dp = jax.lax.dynamic_slice(d1, (i,), (S,))

                    # in-panel recursion UNROLLED (S static steps): each
                    # step is one fused (units,S) FMA — acc[:, j] carries
                    # p_j·(w_j − cross_j − Σ_{k<c} x_k·U[k,j]) forward, so
                    # x_c = acc[:, c]/d_c directly.  Static indexing lets
                    # XLA fuse the whole chain into a few VPU kernels; the
                    # rolled equivalent paid a fori_loop iteration (carry
                    # materialization + dynamic slices + a (units,S)×(S,1)
                    # matvec) per column — measured 14.5 µs/serial step,
                    # ~60% of the XL OBS sweep.
                    acc = rhs
                    xcols = []
                    for c in range(S):
                        xc = acc[:, c] / dp[c]
                        xcols.append(xc)
                        if c + 1 < S:
                            acc = acc - prp * (xc[:, None] * upp[c][None, :])
                    xp = jnp.stack(xcols, axis=1)
                    return jax.lax.dynamic_update_slice(x, xp, (0, i))

                x = jax.lax.fori_loop(
                    0, B // S, panel, jnp.zeros((units, B), jnp.float32))
            else:
                def subst(i, x):
                    u_col = jax.lax.dynamic_slice(strict_u, (0, i), (B, 1))
                    s = jnp.dot(
                        x, u_col,
                        precision=_PRECISION)  # (units,1)
                    num = jax.lax.dynamic_slice(wp, (0, i), (units, 1)) - s
                    pi = jax.lax.dynamic_slice(pr, (0, i), (units, 1))
                    di = jax.lax.dynamic_slice(d1, (i,), (1,))
                    return jax.lax.dynamic_update_slice(
                        x, pi * num / di[None, :], (0, i))

                x = jax.lax.fori_loop(
                    0, B, subst, jnp.zeros((units, B), jnp.float32))
            Err1 = x
            Q1 = jnp.where(prune1, 0.0,
                           W1 - jnp.dot(x, strict_u,
                                        precision=_PRECISION))
            L1 = x * x
            W = jax.lax.dynamic_update_slice(W, Q1, (0, i1))
            losses = losses + jnp.sum(L1, axis=1) / 2.0
            hrows = jax.lax.dynamic_slice(Hinv, (i1, 0), (B, cols))
            hrows = jnp.where(col_ids[None, :] >= i1 + B, hrows, 0.0)
            W = W - jnp.dot(Err1, hrows, preferred_element_type=jnp.float32)
            return (W, losses), prune1
        else:
            prune1 = jnp.zeros((units, B), bool)

        bi = jnp.arange(B)

        def col_body(i, c):
            W1, Q1, Err1, L1, prune1 = c
            w = W1[:, i]
            d = Hinv1[i, i]

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

            q = jnp.where(prune1[:, i], 0.0, w)
            Q1 = Q1.at[:, i].set(q)
            L1 = L1.at[:, i].set((w - q) ** 2 / (d * d))
            err = (w - q) / d
            row = jnp.where(bi >= i, Hinv1[i, :], 0.0)
            W1 = W1 - err[:, None] * row[None, :]
            Err1 = Err1.at[:, i].set(err)
            return (W1, Q1, Err1, L1, prune1)

        z = jnp.zeros((units, B), jnp.float32)
        W1, Q1, Err1, L1, prune1 = jax.lax.fori_loop(
            0, B, col_body, (W1, z, z, z, prune1)
        )

        # write back the quantized block
        W = jax.lax.dynamic_update_slice(W, Q1, (0, i1))
        losses = losses + jnp.sum(L1, axis=1) / 2.0

        # trailing update: W[:, i2:] -= Err1 @ Hinv[i1:i2, i2:]
        hrows = jax.lax.dynamic_slice(Hinv, (i1, 0), (B, cols))
        hrows = jnp.where(col_ids[None, :] >= i1 + B, hrows, 0.0)
        W = W - jnp.dot(Err1, hrows, preferred_element_type=jnp.float32)

        return (W, losses), prune1

    (W, losses), prune_blocks = jax.lax.scan(
        block_step, (W, jnp.zeros((units,), jnp.float32)), jnp.arange(nblocks)
    )
    # (nblocks, units, B) → (units, cols)
    prune_mask = jnp.moveaxis(prune_blocks, 0, 1).reshape(units, cols)

    return SparseGPTResult(
        weight=W.astype(out_dtype),
        keep_mask=~prune_mask,
        losses=losses,
        importance=importance,
    )


sparsegpt_prune = functools.partial(
    jax.jit,
    static_argnames=("prune_n", "prune_m", "blocksize", "rows_static"),
)(_sparsegpt_prune_impl)


@functools.partial(
    jax.jit, static_argnames=("prune_n", "prune_m", "blocksize"))
def sparsegpt_prune_batched(
    weights_um: jnp.ndarray,      # (G, units, in)
    hessians: jnp.ndarray,        # (G, in, in)
    sparsity,
    prune_n: int = 0,
    prune_m: int = 0,
    blocksize: int = 128,
    percdamp: float = 0.01,
) -> SparseGPTResult:
    """vmap over same-shape linears of one block: T5's q/k/v/o share a
    shape (q/k/v even share the Hessian) — batching turns ~7 serial OBS
    solves per block into ~3, and multiplies the row dimension the
    column recursion vectorizes over."""

    def one(w, h):
        return _sparsegpt_prune_impl(w, h, sparsity, prune_n, prune_m,
                                     blocksize, percdamp)

    return jax.vmap(one)(weights_um, hessians)


@functools.partial(
    jax.jit, static_argnames=("prune_n", "prune_m", "blocksize"))
def sparsegpt_prune_group(
    kernels_io,                   # tuple of (in, units) Flax-layout kernels
    stats,                        # tuple of matching CalibStats
    sparsity,
    prune_n: int = 0,
    prune_m: int = 0,
    blocksize: int = 128,
    percdamp: float = 0.01,
):
    """One-dispatch OBS solve for a whole equal-shape group.

    The per-group host-side preparation (a transpose per kernel, a
    ``finalize_hessian`` per stat, two stacks, then a transpose per output
    mask and per updated kernel) used to run as ~4·G+3 separate device
    dispatches per group — over a device tunnel that residue was a
    measurable share of the OBS phase (BENCH_NOTES "dispatch/stack
    residue").  Moving it inside ONE jitted program collapses the group to
    a single dispatch and lets XLA fuse the layout changes into the solve.
    Numerics are unchanged: the same ops run in the same order at the same
    pinned precision.

    Returns a tuple of ``(keep_mask_io, new_kernel_io, importance)`` per
    member, already back in Flax (in, units) layout.  G == 1 calls the
    plain impl (vmap on a single member measured up to 5× slower —
    batched gathers/slices degrade).
    """
    from vlm_compression_tpu.ops.stats import finalize_hessian

    if len(kernels_io) == 1:
        res = _sparsegpt_prune_impl(
            kernels_io[0].T, finalize_hessian(stats[0]), sparsity,
            prune_n, prune_m, blocksize, percdamp)
        return ((res.keep_mask.T, res.weight.T, res.importance),)
    ws = jnp.stack([k.T for k in kernels_io])
    hs = jnp.stack([finalize_hessian(s) for s in stats])

    def one(w, h):
        return _sparsegpt_prune_impl(w, h, sparsity, prune_n, prune_m,
                                     blocksize, percdamp)

    res = jax.vmap(one)(ws, hs)
    return tuple(
        (res.keep_mask[i].T, res.weight[i].T, res.importance[i])
        for i in range(len(kernels_io)))
