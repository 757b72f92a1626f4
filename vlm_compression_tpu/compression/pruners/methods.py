"""Per-block mask functions: the score→mask(→update) core of each method.

Each factory returns a MaskFn for the calibration engine.  Kernels arrive
in Flax layout (in, out); all scoring runs unit-major (out, in) to mirror
the reference math, and keep-masks are returned back in (in, out).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vlm_compression_tpu.compression.calibrate import BlockPruneResult
from vlm_compression_tpu.ops.dsnot import dsnot_refine_mask
from vlm_compression_tpu.ops.masks import (
    flat_threshold_mask,
    nm_structured_mask,
    unstructured_mask,
    wanda_metric,
)
from vlm_compression_tpu.ops.stats import finalize_hessian


def _make_throttle():
    """(throttle, enqueue) pair bounding in-flight OBS/GPTQ solves.

    Bounded in-flight window instead of a hard sync per group: each OBS
    solve holds H + Hinv + fp32 weight copies (~0.5 GB on XL FFN shapes),
    so unbounded queueing OOMs a 16 GB chip — but a FULL sync per group
    idles the device for a host round-trip (+ the next group's stacking
    dispatches) ~350 times per XL sweep.  The default window of 2 keeps
    the device fed while bounding transient memory (4 measured to regress
    6× from HBM pressure — see BENCH_NOTES); the deque persists across
    blocks (the engine memoizes each mask fn per tower), so the NEXT
    block's stats fold also overlaps the previous block's tail solves.
    ``VCT_OBS_INFLIGHT`` overrides the window."""
    import collections
    import os

    inflight = collections.deque()
    window = max(1, int(os.environ.get("VCT_OBS_INFLIGHT", "2")))

    def throttle():
        while len(inflight) >= window:
            jax.block_until_ready(inflight.popleft())

    return throttle, inflight.append


def wanda_mask_fn(prune_n: int = 0, prune_m: int = 0,
                  flat_threshold: bool = False, metric: str = "wanda",
                  ria_alpha: float = 0.5, hybrid_tile: int = 0):
    """Wanda |W|·sqrt(E‖X‖²).  flat_threshold=True selects the per-tensor
    value-threshold variant used for the ViT (wanda_pruner.py:682-684);
    False the per-unit top-k used for language towers (:330-337).
    metric="ria" swaps in the RIA importance (beyond-reference; same
    statistics, same sweep).  hybrid_tile > 0 with n:m set selects
    PATCH-style tile-level hybrid masks (salient tiles dense, the rest
    n:m, hitting the layer's target sparsity overall)."""
    from vlm_compression_tpu.ops.masks import hybrid_tile_mask, ria_metric

    @functools.partial(jax.jit, static_argnames=("sparsity",))
    def one(kernel, scaler_row, sparsity):
        if metric == "ria":
            met = ria_metric(kernel.T, scaler_row, alpha=ria_alpha)
        else:
            met = wanda_metric(kernel.T, scaler_row)
        if prune_n > 0 and hybrid_tile > 0:
            keep = hybrid_tile_mask(met, float(sparsity), prune_n,
                                    prune_m, tile=hybrid_tile)
        elif prune_n > 0:
            keep = nm_structured_mask(met, prune_n, prune_m)
        elif flat_threshold:
            keep = flat_threshold_mask(met, sparsity)
        else:
            keep = unstructured_mask(met, sparsity)
        return keep.T, jnp.mean(jnp.abs(met))

    def fn(kernels, stats, sparsities):
        masks, imps = {}, {}
        for p, k in kernels.items():
            # importances stay device-side (no float() sync per linear)
            masks[p], imps[p] = one(k, stats[p].scaler_row,
                                    float(sparsities[p]))
        return BlockPruneResult(masks, {}, imps)

    return fn


def sparsegpt_mask_fn(prune_n: int = 0, prune_m: int = 0,
                      blocksize: int = 128, percdamp: float = 0.01):
    """OBS prune-with-update; always writes updated kernels
    (sparsegpt_pruner.py:213-215 assigns weight.data unconditionally)."""

    from vlm_compression_tpu.ops.sparsegpt import sparsegpt_prune_group

    import os
    import time

    throttle, enqueue = _make_throttle()

    def fn(kernels, stats, sparsities):
        dbg = os.environ.get("VCT_DEBUG_TIMING")
        # group equal-(shape, sparsity) linears and solve them as ONE
        # vmapped OBS program (T5 q/k/v/o share a shape; q/k/v share the
        # Hessian): ~7 serial solves per block become ~3.  The whole
        # group — stack, Hessian finalize, solve, unstack, re-layout —
        # is ONE dispatch (sparsegpt_prune_group).
        groups = {}
        for p, k in kernels.items():
            groups.setdefault((k.shape, float(sparsities[p])),
                              []).append(p)
        masks, new_k, imps = {}, {}, {}
        for (shape, sp), paths in groups.items():
            throttle()
            # t0 AFTER the throttle wait so dbg lines time THIS group's
            # stack/dispatch(+sync), not a previous group's in-flight tail
            t0 = time.perf_counter()
            out = sparsegpt_prune_group(
                tuple(kernels[p] for p in paths),
                tuple(stats[p] for p in paths),
                sp, prune_n=prune_n, prune_m=prune_m,
                blocksize=blocksize, percdamp=percdamp)
            enqueue(out[-1][1])
            if dbg:
                jax.block_until_ready(out[-1][1])
                print(f"      [dbg] obs G={len(paths)} {shape} "
                      f"{time.perf_counter() - t0:.2f}s", flush=True)
            for (keep, w, imp), p in zip(out, paths):
                masks[p] = keep
                new_k[p] = w
                imps[p] = imp
        return BlockPruneResult(masks, new_k, imps)

    return fn


def dsnot_mask_fn(prune_n: int = 0, prune_m: int = 0,
                  initial_method: str = "wanda",
                  max_cycle_time: int = 50,
                  update_threshold: float = 0.1,
                  pow_of_var_regrowing: float = 1.0,
                  without_same_sign: bool = True,
                  without_dsnot: bool = False):
    def fn(kernels, stats, sparsities):
        masks, imps = {}, {}
        for p, k in kernels.items():
            s = stats[p]
            h = (finalize_hessian(s) if (initial_method == "sparsegpt"
                                         and s.hessian is not None) else None)
            res = dsnot_refine_mask(
                k.T, s.scaler_row, s.sum_metric_row, s.var,
                sparsities[p], prune_n=prune_n, prune_m=prune_m,
                max_cycle_time=max_cycle_time,
                update_threshold=update_threshold,
                pow_of_var_regrowing=pow_of_var_regrowing,
                without_same_sign=without_same_sign,
                without_dsnot=without_dsnot,
                initial_method=initial_method, hessian=h)
            masks[p] = res.keep_mask.T
            imps[p] = jnp.mean(jnp.abs(wanda_metric(k.T, s.scaler_row)))
        return BlockPruneResult(masks, {}, imps)

    return fn


def softmask_mask_fn(prune_n: int = 0, prune_m: int = 0,
                     steps: int = 48, lr: float = 0.1,
                     tau_start: float = 2.0, tau_end: float = 0.05):
    """Annealed Hessian-guided soft-mask n:m (beyond-reference;
    ops/softmask.py).  Requires n:m (the relaxation is per m-group);
    logits init from the Wanda metric, objective from the calibration
    Hessians, no-regression fallback to the init mask."""
    if prune_n <= 0 or prune_m <= 0:
        raise ValueError("softmask pruning is n:m only — set "
                         "--prune_n/--prune_m (e.g. 2:4)")

    from vlm_compression_tpu.ops.softmask import (
        softmask_nm_prune,
        softmask_nm_prune_batched,
    )

    def fn(kernels, stats, sparsities):
        # equal-shape linears (q/k/v/o per block) anneal as ONE vmapped
        # program, mirroring the SparseGPT grouping
        groups = {}
        for p, k in kernels.items():
            groups.setdefault(k.shape, []).append(p)
        masks, imps = {}, {}
        for shape, paths in groups.items():
            if len(paths) == 1:
                p = paths[0]
                s = stats[p]
                keep, err_t, err_i = softmask_nm_prune(
                    kernels[p].T, finalize_hessian(s), prune_n, prune_m,
                    init_metric=wanda_metric(kernels[p].T, s.scaler_row),
                    steps=steps, lr=lr, tau_start=tau_start,
                    tau_end=tau_end)
                keep, err_t, err_i = keep[None], err_t[None], err_i[None]
            else:
                ws = jnp.stack([kernels[p].T for p in paths])
                hs = jnp.stack([finalize_hessian(stats[p]) for p in paths])
                ms = jnp.stack([wanda_metric(kernels[p].T,
                                             stats[p].scaler_row)
                                for p in paths])
                keep, err_t, err_i = softmask_nm_prune_batched(
                    ws, hs, prune_n, prune_m, init_metrics=ms,
                    steps=steps, lr=lr, tau_start=tau_start,
                    tau_end=tau_end)
            for i, p in enumerate(paths):
                masks[p] = keep[i].T
                # importance: the achieved OBS-error improvement ratio
                imps[p] = err_i[i] / jnp.maximum(err_t[i], 1e-20)
        return BlockPruneResult(masks, {}, imps)

    return fn


def gptq_fn(prune_n: int = 0, prune_m: int = 0, bits: int = 4,
            groupsize: int = 128, sym: bool = True, act_order: bool = False,
            blocksize: int = 128, percdamp: float = 0.01,
            awq: bool = False):
    """GPTQ quantization as a calibration-engine method (beyond-reference;
    ops/gptq.py).  sparsity == 0 → quantize-only (all-True keep masks);
    sparsity > 0 or n:m → JOINT sparse+quant in one OBS sweep.  Reuses the
    Hessians the unified fold already accumulates — no extra data passes.
    Equal-shape linears batch into one vmapped program exactly like the
    SparseGPT path."""

    from vlm_compression_tpu.ops.awq import (apply_awq, awq_search,
                                             unscale_weight)
    from vlm_compression_tpu.ops.gptq import (gptq_quantize,
                                              gptq_quantize_batched,
                                              gptq_quantize_group)

    _throttle, _enqueue = _make_throttle()

    def fn(kernels, stats, sparsities):
        groups = {}
        for p, k in kernels.items():
            groups.setdefault((k.shape, float(sparsities[p])), []).append(p)
        masks, new_k, imps = {}, {}, {}
        for (shape, sp), paths in groups.items():
            kw = dict(bits=bits, groupsize=groupsize, sym=sym,
                      act_order=act_order, sparsity=sp, prune_n=prune_n,
                      prune_m=prune_m, blocksize=blocksize,
                      percdamp=percdamp)
            if awq:
                # AWQ scale search on the same stats, GPTQ on the scaled
                # problem, fake-quant back in original space.  Equal-shape
                # linears batch into ONE search+sweep program (one host
                # sync per group, not per linear) like the plain path.
                _throttle()
                search = functools.partial(awq_search, bits=bits,
                                           groupsize=groupsize, sym=sym)
                if len(paths) == 1:
                    p = paths[0]
                    h = finalize_hessian(stats[p])
                    sc = search(kernels[p].T, stats[p].scaler_row, h)
                    ws, hs = apply_awq(kernels[p].T, h, sc.s)
                    res = gptq_quantize(ws, hs, **kw)
                    res = jax.tree.map(lambda a: a[None], res)
                    s_all = sc.s[None]
                else:
                    ws = jnp.stack([kernels[p].T for p in paths])
                    hs = jnp.stack([finalize_hessian(stats[p])
                                    for p in paths])
                    srs = jnp.stack([stats[p].scaler_row for p in paths])
                    sc = jax.vmap(search)(ws, srs, hs)
                    wsc, hsc = jax.vmap(apply_awq)(ws, hs, sc.s)
                    res = gptq_quantize_batched(wsc, hsc, **kw)
                    s_all = sc.s
                _enqueue(res.weight)
                for i, p in enumerate(paths):
                    masks[p] = res.keep_mask[i].T
                    new_k[p] = unscale_weight(
                        res.weight[i], s_all[i]).astype(kernels[p].dtype).T
                    imps[p] = jnp.mean(res.losses[i])
                continue
            _throttle()
            out = gptq_quantize_group(
                tuple(kernels[p] for p in paths),
                tuple(stats[p] for p in paths), **kw)
            _enqueue(out[-1][1])
            for (keep, w, imp), p in zip(out, paths):
                masks[p] = keep
                new_k[p] = w
                imps[p] = imp
        return BlockPruneResult(masks, new_k, imps)

    return fn
