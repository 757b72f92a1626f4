"""Layerwise calibration engine.

The TPU-native replacement for the reference's hook + Catcher machinery
(wanda_pruner.py:238-354): instead of trapping block-0 inputs with a raised
exception and replaying bs=1 samples through forward hooks, each tower
exposes

  * a ``stem`` — everything before block 0, run once over the (batched)
    calibration set;
  * addressable blocks — applied per-layer through their param subtrees,
    with the ``calib`` collection capturing every SparseLinear's input.

Per block the engine then does exactly what the reference does, but batched
and jitted:

  1. fold calibration statistics over all batches (one fused pass);
  2. score + mask (+ OBS-update for SparseGPT) every linear in the block;
  3. replay the batches through the *pruned* block to produce the next
     block's inputs (reference wanda_pruner.py:343-347).

Sparsity keys are '/'-joined param paths (e.g.
``encoder/blocks_3/self_attn/q``) — the allocator emits the same keys.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vlm_compression_tpu.ops.stats import CalibStats, init_calib_stats

# Zero CalibStats per (in_features, with_hessian), shared process-wide.
# Stats are folded FUNCTIONALLY (update_calib_stats never mutates), so one
# zeros pytree can seed every path/block/sweep — the per-(path, block)
# `init_calib_stats` calls were ~7 fresh device allocations per block
# (including a (d, d) Hessian zeros each), thousands of tiny dispatches
# over a device tunnel per sweep.  Memory held: one (d,d) fp32 per distinct
# width (~100 MB at d=5120), alive for the process — the sweep already
# held the same arrays per-block transiently.
_ZERO_STATS_CACHE: dict = {}


def cached_zero_stats(in_features: int, with_hessian: bool) -> CalibStats:
    key = (int(in_features), bool(with_hessian))
    st = _ZERO_STATS_CACHE.get(key)
    if st is None:
        st = init_calib_stats(in_features, with_hessian=with_hessian)
        _ZERO_STATS_CACHE[key] = st
    return st


# ---------------------------------------------------------------------------
# variable-tree helpers
# ---------------------------------------------------------------------------


def linear_paths(params_subtree) -> List[Tuple[str, ...]]:
    """Every SparseLinear in a block = every dict holding a 2-D `kernel`
    (discovery moved off the masks tree: masks are optional now)."""
    paths = []

    def walk(node, prefix):
        if isinstance(node, dict) or hasattr(node, "items"):
            if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2:
                paths.append(prefix)
                return
            for k, v in node.items():
                walk(v, prefix + (k,))

    walk(params_subtree, ())
    return sorted(paths)


def tree_get(tree, path: Sequence[str]):
    for p in path:
        tree = tree[p]
    return tree


def tree_set(tree, path: Sequence[str], value):
    """Functional set on nested dicts; creates missing intermediate nodes
    (mask subtrees may not pre-exist)."""
    if not path:
        return value
    head, rest = path[0], path[1:]
    new = dict(tree) if isinstance(tree, dict) else {}
    new[head] = tree_set(new.get(head, {}), rest, value)
    return new


# ---------------------------------------------------------------------------
# tower adapters
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TowerAdapter:
    """Binds a tower's blocks to the engine.

    block_fn(block_vars, x, side, mode, capture) -> (out, captured)
      captured: {linear_path: activations} when capture=True
    stem_fn(variables, batch) -> (x0, side)
      side: extra inputs every block needs (attention biases, encoder
      outputs).  A "token_mask" key, if present, EXCLUDES masked
      positions from the calibration stats — an opt-in no built-in
      adapter sets: the reference's hooks accumulate over every
      position including pads (wanda_pruner.py:68-81), and mask
      parity requires the same.
    stem_key: optional process-wide identity of the stem COMPUTATION
      (module structure + dataflow-mode flags).  When set, the engine
      reuses one jitted stem per key across prune calls — a fresh
      jax.jit object re-traces and re-uploads its executable even with a
      warm disk cache (see adapters._BLOCK_JIT_CACHE), and the stems
      otherwise compile INSIDE the timed sweep on a cold process.
    """

    name: str
    block_names: List[str]
    block_fn: Callable
    stem_fn: Callable
    # where the blocks live inside the tower's variables
    subtree: Tuple[str, ...] = ()
    stem_key: Optional[tuple] = None


# One jitted stem per stem_key (see TowerAdapter.stem_key).  The cached jit
# wraps the FIRST stem_fn seen for a key; callers guarantee equal keys ⇒
# identical computation (keys carry module type, frozen config, and every
# mode flag the closure branches on).
_STEM_JIT_CACHE: dict = {}


def _stem_jit(adapter: TowerAdapter):
    if adapter.stem_key is None:
        return jax.jit(lambda v, b: adapter.stem_fn(v, b))
    f = _STEM_JIT_CACHE.get(adapter.stem_key)
    if f is None:
        f = jax.jit(adapter.stem_fn)
        _STEM_JIT_CACHE[adapter.stem_key] = f
    return f


def _collect_captured(aux) -> Dict[Tuple[str, ...], jnp.ndarray]:
    out = {}

    def walk(node, prefix):
        for k, v in node.items():
            if k == "input":
                # sow stores a tuple of sown values
                out[prefix] = v[0] if isinstance(v, (tuple, list)) else v
            else:
                walk(v, prefix + (k,))

    walk(aux, ())
    return out


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class BlockPruneResult:
    masks: Dict[Tuple[str, ...], jnp.ndarray]       # keep-masks (in, out)
    new_kernels: Dict[Tuple[str, ...], jnp.ndarray]  # updated weights or {}
    importances: Dict[Tuple[str, ...], float]


MaskFn = Callable[..., BlockPruneResult]
# signature: mask_fn(kernels: {path: (in,out)}, stats: {path: CalibStats},
#                    sparsities: {path: float}) -> BlockPruneResult


def _mask_shape_keys(adapter, params_subtree, sparsity_for):
    """Distinct (shape, dtype, sparsity, group) tuples of a tower's linears
    — per-block group sizes must match the mask fn's batching (sparsegpt
    vmaps equal-(shape, sparsity) linears of one block)."""
    shapes = {}
    for bname in adapter.block_names:
        bp = params_subtree.get(bname)
        if bp is None:
            continue
        counts = {}
        for p in linear_paths(bp):
            k = tree_get(bp, p)["kernel"]
            key = (k.shape, str(k.dtype),
                   float(sparsity_for("/".join(
                       adapter.subtree + (bname,) + p))))
            counts[key] = counts.get(key, 0) + 1
        for key, g in counts.items():
            shapes[key + (g,)] = True
    return list(shapes)


def _warm_mask_shape(mask_fn, with_hessian, shape, dtype, sp, g):
    from vlm_compression_tpu.ops.stats import init_calib_stats

    try:
        st = init_calib_stats(shape[0], with_hessian=with_hessian)
        if with_hessian and st.hessian is not None:
            st = st._replace(
                hessian=jnp.eye(shape[0], dtype=jnp.float32),
                nsamples=jnp.ones((), jnp.int32))
        kernels = {("warm", str(i)): jnp.zeros(shape, dtype)
                   for i in range(g)}
        mask_fn(kernels=kernels,
                stats={k: st for k in kernels},
                sparsities={k: sp for k in kernels})
    except Exception:  # noqa: BLE001 — warm-up must never break a sweep
        pass


def _fold_warm_inputs(adapter, variables, batch0, with_hessian):
    """Shape-derivation HALF of the fold-program warm.  Runs synchronously
    (the sweep pops block subtrees as it goes — a background read of the
    full tree would race); eval_shape is pure tracing, no device work."""
    shapes = jax.eval_shape(
        lambda v, b: adapter.stem_fn(v, b), variables, batch0)
    x0, side = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    params = variables["params"]
    masks = variables.get("masks", {})
    for p in adapter.subtree:
        params = params[p]
        masks = masks.get(p, {}) if isinstance(masks, dict) else {}
    bname = adapter.block_names[0]
    bparams = params[bname]
    bmasks = masks.get(bname, {}) if isinstance(masks, dict) else {}
    bvars = {"params": bparams, "masks": bmasks}
    stats = {
        p: init_calib_stats(
            int(tree_get(bparams, p)["kernel"].shape[0]),
            with_hessian=with_hessian)
        for p in linear_paths(bparams)}
    return bvars, x0, side, stats, bname


def _warm_fold_programs(adapter, bvars, x0, side, stats, bname,
                        with_hessian, mode):
    """Execution HALF: run block 0's capture and replay programs once so
    their executables compile/load before the sweep reaches the tower."""
    try:
        adapter.block_fn(bvars, x0, side, stats, mode=mode, capture=True,
                         with_hessian=with_hessian, block_name=bname)
        adapter.block_fn(bvars, x0, side, None, mode=mode, capture=False,
                         block_name=bname)
    except Exception:  # noqa: BLE001 — warm-up must never break a sweep
        pass


def start_global_prewarm(specs):
    """Warm EVERY tower's executables concurrently, up front.

    specs: list of dicts with keys adapter, params (tower subtree),
    mask_fn, sparsity_for, with_hessian, and optionally variables + batch0
    (enables fold/replay-program warming) and mode.

    Loading a cached executable over a device tunnel costs 8-45 s EACH
    (measured; fresh compiles 90-115 s) — serialized per-tower at sweep
    entry they dominated the XL bench.  One shared thread pool makes the
    total ≈ max instead of ≈ sum, overlapped with the first tower's
    compute.  Returns a Thread to pass as calibrate_and_prune_tower's
    ``warm_thread`` (idempotent join)."""
    import threading

    jobs = []
    for spec in specs:
        mask_fn = spec["mask_fn"]
        wh = spec["with_hessian"]
        for key in _mask_shape_keys(spec["adapter"], spec["params"],
                                    spec["sparsity_for"]):
            jobs.append((_warm_mask_shape, (mask_fn, wh) + tuple(key)))
        if spec.get("variables") is not None and spec.get("batch0") is not None:
            try:
                inputs = _fold_warm_inputs(spec["adapter"], spec["variables"],
                                           spec["batch0"], wh)
            except Exception:  # noqa: BLE001 — warm-up must never break
                inputs = None
            if inputs is not None:
                jobs.append((_warm_fold_programs,
                             (spec["adapter"],) + inputs
                             + (wh, spec.get("mode", "masked"))))
    if not jobs:
        return None

    def work():
        # XLA compilation releases the GIL: compiling the distinct shapes
        # concurrently collapses sum-of-compiles to ~max-of-compiles
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(len(jobs), 10)) as ex:
            list(ex.map(lambda j: j[0](*j[1]), jobs))

    t = threading.Thread(target=work, daemon=True)
    t.start()
    return t


def _start_mask_prewarm(adapter, new_params, mask_fn, sparsity_for,
                        with_hessian):
    """Single-tower mask-program prewarm (used when no global prewarm was
    provided)."""
    return start_global_prewarm([dict(adapter=adapter, params=new_params,
                                      mask_fn=mask_fn,
                                      sparsity_for=sparsity_for,
                                      with_hessian=with_hessian)])


def fuse_batch_dicts(batches: Sequence[dict]) -> Sequence[dict]:
    """Concatenate a list of equal-schema batch dicts into one (see the
    batch-fusion note in calibrate_and_prune_tower).  Array values concat
    on axis 0; non-arrays keep the first batch's value.  Returns the input
    unchanged when fusion is not applicable."""
    if len(batches) <= 1:
        return batches
    first = batches[0]
    if any(set(b.keys()) != set(first.keys()) for b in batches):
        return batches
    out = {}
    for k, v in first.items():
        vals = [b[k] for b in batches]
        if (getattr(v, "ndim", 0) > 0
                and all(getattr(y, "shape", None) == v.shape for y in vals)):
            out[k] = jnp.concatenate(vals, axis=0)
        else:
            out[k] = v
    return [out]


def calibrate_and_prune_tower(
    adapter: TowerAdapter,
    variables: dict,
    batches: Sequence,                 # list of model-input batches
    mask_fn: MaskFn,
    sparsity_for: Callable[[str], float],
    with_hessian: bool = False,
    lora_model: bool = True,
    mode: str = "masked",
    progress: Optional[Callable[[str], None]] = None,
    warm_thread=None,
    return_outputs: bool = False,
    stats_sink: Optional[dict] = None,
) -> dict:
    """Run the layer sweep; returns updated `variables` (masks + kernels).

    lora_model=False additionally zeroes pruned weights in place and
    SKIPS writing masks — zeroed weights already encode the sparsity, and
    a bool mask per kernel would cost half the parameter memory again
    (reference wanda_pruner.py:339-341 zeroes weights exactly in this
    case; its `module.mask` attr is never consulted without LoRA).

    TAKES OWNERSHIP of ``variables``: as each block's kernels are
    rewritten, the old block subtree is dropped from the input tree so the
    superseded arrays free immediately — otherwise a full-tower sweep
    holds old+new kernels simultaneously (OOMs FlanT5-XL on one chip).
    """
    write_masks = lora_model
    params = variables["params"]
    masks = variables.get("masks", {})
    for p in adapter.subtree:
        params = params[p]
        masks = masks.get(p, {}) if isinstance(masks, dict) else {}
    # `owned_*` are the dicts inside `variables` — we pop each block's entry
    # once replaced so superseded arrays free mid-sweep; `new_*` are our
    # working copies that accumulate the pruned blocks.  No other copy may
    # exist or it pins every old kernel (observed ~70 MB/block on XL).
    owned_params, owned_masks = params, masks
    new_params, new_masks = dict(params), dict(masks)
    del params, masks

    # 1. stem over all batches
    stem = _stem_jit(adapter)
    xs, sides = [], []
    for b in batches:
        x0, side = stem(variables, b)
        xs.append(x0)
        sides.append(side)

    # FUSE equal-shape batches into one: the sweep then runs ONE fold and
    # ONE replay dispatch per block instead of len(batches) — dispatch
    # round-trips are a real cost over a device tunnel, and bigger batch
    # dims fill the MXU better.  Statistics are sums over samples/tokens,
    # so concatenation is exact.  Skipped when shapes differ (ragged
    # calibration data) or for a single batch.
    if len(xs) > 1:
        same = all(x.shape == xs[0].shape for x in xs) and all(
            jax.tree_util.tree_structure(s) ==
            jax.tree_util.tree_structure(sides[0]) for s in sides)
        if same:
            try:
                fused_side = jax.tree_util.tree_map(
                    lambda *a: (jnp.concatenate(a, axis=0)
                                if getattr(a[0], "ndim", 0) > 0
                                and all(y.shape == a[0].shape for y in a)
                                and a[0].shape[0] == xs[0].shape[0]
                                else a[0]),
                    *sides)
                xs = [jnp.concatenate(xs, axis=0)]
                sides = [fused_side]
            except Exception:  # noqa: BLE001 — ragged sides: keep per-batch
                pass

    # block_fns arrive pre-jitted from the adapter (one compilation per
    # block *structure*, shared across all blocks of a stack)
    jit_block = adapter.block_fn

    # pre-warm mask-kernel compiles concurrently with the first stats
    # passes: SparseGPT's OBS program compiles in ~90 s per distinct shape
    # on a cold cache — serialized, that dominates sweep wall-clock.  A
    # caller-provided warm_thread (start_global_prewarm over every tower)
    # supersedes the single-tower warm.
    if warm_thread is None:
        warm_thread = _start_mask_prewarm(adapter, new_params, mask_fn,
                                          sparsity_for, with_hessian)

    # progress densities are emitted with a 2-block LAG: float() on a
    # density scalar waits for that block's mask programs, and a per-block
    # hard sync would re-serialize the pipelined OBS dispatch (the mask fns
    # keep a bounded in-flight window — see methods.sparsegpt_mask_fn)
    pending_progress: List[tuple] = []

    def _flush_progress(keep: int = 0):
        while len(pending_progress) > keep:
            i, d = pending_progress.pop(0)
            progress(f"[{adapter.name}] block {i + 1}/"
                     f"{len(adapter.block_names)} density={float(d):.3f}")

    for bi, bname in enumerate(adapter.block_names):
        bparams = new_params[bname]
        bmasks = new_masks.get(bname, {})
        lpaths = linear_paths(bparams)

        # 2a. fold stats over batches — the fold happens INSIDE the jitted
        # block apply (one dispatch per block×batch; the token mask only
        # applies to activations with the same token dimension, handled in
        # adapters._fold_captured_stats).  Stats are pre-initialized from
        # the kernel shapes so every fold call shares ONE program (an
        # empty-stats first call would compile a second structure, and each
        # distinct executable costs seconds to load over a device tunnel).
        import os as _os
        import time as _time

        _dbg = _os.environ.get("VCT_DEBUG_TIMING")
        _t0 = _time.perf_counter()
        stats: Dict[Tuple[str, ...], CalibStats] = {
            p: cached_zero_stats(
                int(tree_get(bparams, p)["kernel"].shape[0]),
                with_hessian)
            for p in lpaths}
        for x, side in zip(xs, sides):
            bvars = {"params": bparams, "masks": bmasks}
            _, stats = jit_block(bvars, x, side, stats, mode=mode,
                                 capture=True, with_hessian=with_hessian,
                                 block_name=bname)
        if _dbg:
            jax.block_until_ready(stats)
            print(f"    [dbg] stats {_time.perf_counter() - _t0:.2f}s",
                  flush=True)
            _t0 = _time.perf_counter()

        # 2b. score + mask (+ update)
        if warm_thread is not None:
            warm_thread.join()
            warm_thread = None
        kernels = {p: tree_get(bparams, p)["kernel"] for p in lpaths}
        skeys = {p: "/".join(adapter.subtree + (bname,) + p) for p in lpaths}
        sparsities = {p: sparsity_for(skeys[p]) for p in lpaths}
        if stats_sink is not None:
            # test/debug hook: pre-mask kernel + Wanda input statistic per
            # linear, so parity tests can evaluate the importance METRIC at
            # mask positions that differ from the reference (tie-flip
            # doctrine: flipped bits must be genuine metric ties, not
            # systematic drift).  numpy copies — nothing device-side pinned.
            import numpy as _np

            from vlm_compression_tpu.ops.stats import finalize_hessian

            for p in lpaths:
                stats_sink[skeys[p]] = (
                    _np.asarray(kernels[p]),
                    _np.asarray(stats[p].scaler_row),
                    (_np.asarray(finalize_hessian(stats[p]))
                     if stats[p].hessian is not None else None),
                )
        result = mask_fn(kernels=kernels, stats=stats, sparsities=sparsities)
        if _dbg:
            jax.block_until_ready(result.masks)
            print(f"    [dbg] masks {_time.perf_counter() - _t0:.2f}s",
                  flush=True)
            _t0 = _time.perf_counter()

        for p in lpaths:
            keep = result.masks[p]
            if write_masks:
                bmasks = tree_set(bmasks, p, {"mask": keep})
            kern = result.new_kernels.get(p)
            if kern is None and not lora_model:
                kern = jnp.where(keep, kernels[p],
                                 jnp.zeros((), kernels[p].dtype))
            if kern is not None:
                leaf = dict(tree_get(bparams, p))
                leaf["kernel"] = kern.astype(kernels[p].dtype)
                bparams = tree_set(bparams, p, leaf)

        new_params[bname] = bparams
        new_masks[bname] = bmasks
        # release the superseded block subtree (ownership note above);
        # unreplaced leaves (biases, norms) stay shared with bparams
        owned_params.pop(bname, None)
        owned_masks.pop(bname, None)

        # 3. replay through the pruned block
        bvars = {"params": bparams, "masks": bmasks}
        xs = [jit_block(bvars, x, side, None, mode=mode, capture=False,
                        block_name=bname)[0]
              for x, side in zip(xs, sides)]
        if _dbg:
            jax.block_until_ready(xs)
            print(f"    [dbg] replay {_time.perf_counter() - _t0:.2f}s",
                  flush=True)

        if progress:
            pending_progress.append((bi, jnp.mean(jnp.stack(
                [result.masks[p].mean() for p in lpaths]))))
            _flush_progress(keep=2)

    if progress:
        _flush_progress()

    # write back into the full variable tree (new_params/new_masks are copies
    # of the subtree dicts, so non-block keys are preserved)
    out = dict(variables)
    out["params"] = tree_set(variables["params"], adapter.subtree, new_params)
    if write_masks:
        out["masks"] = tree_set(variables.get("masks", {}), adapter.subtree,
                                new_masks)
    if return_outputs:
        # xs are the per-batch activations replayed through every PRUNED
        # block: the next tower's stem can consume them instead of
        # re-running this tower (valid whenever that stem would run this
        # tower in the same mode the sweep replayed it in)
        return out, xs
    return out
