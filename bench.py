"""Headline benchmark: Wanda + SparseGPT mask computation wall-clock for
InstructBLIP-FlanT5-XL (EVA-ViT-g + Q-Former + FlanT5-XL), 128 calibration
samples — the driver BASELINE target is <= 120 s for the pair of layer
sweeps on a TPU v4-8 (BASELINE.md "Targets").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": 120/N,
   "detail": {..., "flops": F, "flops_per_s": F/N, "mfu": ...}}

Methodology: the timed window covers the mask sweeps only — one-time XLA
compilation is excluded, as is standard for JAX benchmarks (production
reuses the persistent compile cache; the reference's torch path has no
compile step to exclude).  Exclusion is enforced two ways so it holds on
a COLD process with a COLD disk cache (the r02 regression: a refactor
changed every tower-forward program hash and ~110 s of compiles landed
inside the Wanda window):
  1. ``Pruner.prewarm()`` compiles/loads every mask-kernel executable;
  2. an untimed full shadow prune compiles everything else (stems, block
     fold/replay) — process-wide program caches (adapters._BLOCK_JIT_CACHE,
     calibrate._STEM_JIT_CACHE) guarantee the timed pass reuses the very
     same executables.

Set VCT_BENCH_SCALE=tiny for a CPU smoke run.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

# Persistent compilation cache: repeat bench runs skip XLA compiles (the
# dominant first-run cost over a remote device tunnel).
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if os.environ.get("VCT_BENCH_SCALE") == "tiny":
    # CPU smoke run.  The image's sitecustomize pins JAX_PLATFORMS to the
    # TPU tunnel at interpreter start, so the env var alone is ineffective;
    # backend init is lazy, so this override works if no device was touched.
    jax.config.update("jax_platforms", "cpu")

BASELINE_S = 120.0

# Peak dense bf16 matmul throughput per chip, FLOP/s (public specs).
_PEAK_BF16 = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v4": 275e12,
    "TPU v5p": 459e12,
    "TPU v5": 459e12,
    "TPU v6 lite": 918e12,   # v6e/Trillium
}


def _chip_peak_flops() -> float:
    kind = jax.devices()[0].device_kind
    for k, v in _PEAK_BF16.items():
        if kind.startswith(k):
            return v
    return 197e12  # conservative default


def _rand_params(shapes, seed=0, chunk: int = 128):
    """Per-leaf N(0, 0.02) without tracing the model forward.  Leaves are
    generated in fixed-size chunks: one fused program per chunk bounds both
    the dispatch count (~4k leaves would cost a minute one-by-one over the
    device tunnel) and the fp32 temporaries live at once."""
    leaves, treedef = jax.tree_util.tree_flatten(shapes)

    def make(i, s):
        k = jax.random.fold_in(jax.random.key(seed), i)
        if jnp.issubdtype(s.dtype, jnp.floating):
            return (0.02 * jax.random.normal(k, s.shape)).astype(s.dtype)
        if s.dtype == jnp.bool_:
            return jnp.ones(s.shape, s.dtype)
        return jnp.zeros(s.shape, s.dtype)

    out = []
    for start in range(0, len(leaves), chunk):
        part = leaves[start: start + chunk]
        gen = jax.jit(lambda idx0=start, ss=tuple(part): [
            make(idx0 + j, s) for j, s in enumerate(ss)])
        out.extend(gen())
    return jax.tree_util.tree_unflatten(treedef, out)


# ---------------------------------------------------------------------------
# FLOPs model (matmul FLOPs; VERDICT r2 item 4 — report MFU, not wall-clock)
# ---------------------------------------------------------------------------


def _linear_flops(subtree_shapes, tokens: int, passes: int = 2,
                  hessian: bool = True, obs: bool = False) -> int:
    """Matmul FLOPs of sweeping one tower's 2-D linears: `passes` forward
    passes (capture + replay) at 2·T·din·dout each, the XᵀX Hessian fold
    (unified fold rides along for every method — towers._MethodMixin), and
    optionally the SparseGPT OBS work per linear (Cholesky + blocked
    triangular inverse ≈ (4/3)·din³, sequential weight update ≈
    2·din²·dout).  Estimate, not a count: ±10 %."""
    total = 0

    def walk(node):
        nonlocal total
        if isinstance(node, dict) or hasattr(node, "items"):
            k = node.get("kernel") if hasattr(node, "get") else None
            if k is not None and getattr(k, "ndim", 0) == 2:
                din, dout = int(k.shape[0]), int(k.shape[1])
                total += passes * 2 * tokens * din * dout
                if hessian:
                    total += 2 * tokens * din * din
                if obs:
                    total += (4 * din ** 3) // 3 + 2 * din * din * dout
                return
            for v in node.values():
                walk(v)

    walk(subtree_shapes)
    return total


def _sweep_flops(shapes, cfg, n_calib: int, txt: int, lbl: int,
                 obs: bool) -> int:
    """One full joint V+L sweep (ViT + T5 encoder + T5 decoder)."""
    params = shapes["params"]
    seq_v = (cfg.vit.img_size // cfg.vit.patch_size) ** 2 + 1
    seq_e = cfg.qformer.num_query_tokens + txt
    t_v, t_e, t_d = n_calib * seq_v, n_calib * seq_e, n_calib * lbl
    f = 0
    f += _linear_flops(params["visual_encoder"], t_v, obs=obs)
    f += _linear_flops(params["t5_model"]["encoder"], t_e, obs=obs)
    f += _linear_flops(params["t5_model"]["decoder"], t_d, obs=obs)
    # Q-Former runs once per LLM sweep inside the (chained) encoder stem
    f += _linear_flops(params.get("qformer", {}), t_e, passes=1,
                       hessian=False)
    # attention-score matmuls (QKᵀ + AV = 4·T·seq·d per block per pass)
    f += 2 * cfg.vit.depth * 4 * t_v * seq_v * cfg.vit.embed_dim
    f += 2 * cfg.t5.num_layers * 4 * t_e * seq_e * cfg.t5.d_model
    f += 2 * cfg.t5.num_decoder_layers * 4 * t_d * (lbl + seq_e) \
        * cfg.t5.d_model
    # ViT patch-embed conv stem (runs once per ViT sweep)
    f += 2 * t_v * (3 * cfg.vit.patch_size ** 2) * cfg.vit.embed_dim
    return int(f)


# ---------------------------------------------------------------------------
# timer fence
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _fence_prog(n_leaves: int):
    """Sum of each leaf's first element: ONE program whose inputs are ALL
    floating leaves, so XLA cannot start it before every producer has
    finished — no reliance on the backend executing in dispatch order
    (VERDICT r2 weak #8; jax.block_until_ready is a no-op on the axon
    tunnel, see BENCH_NOTES)."""
    return jax.jit(lambda ls: sum(
        l.reshape(-1)[0].astype(jnp.float32) for l in ls))


def _sync(tree) -> float:
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                        jnp.floating)]
    if not leaves:
        return 0.0
    return float(_fence_prog(len(leaves))(leaves))


def main():
    scale = os.environ.get("VCT_BENCH_SCALE", "xl")
    from vlm_compression_tpu.compression import load_pruner
    from vlm_compression_tpu.compression.pruners.base import FlaxModel
    from vlm_compression_tpu.models.blip2_t5_instruct import (
        Blip2T5Instruct,
        Blip2T5InstructConfig,
    )

    if scale == "tiny":
        cfg = Blip2T5InstructConfig.tiny()
        n_calib, bs, txt, lbl = 8, 4, 6, 4
        vit_spec, t5_spec = "2-0.5-1.0-1.0", "2-0.5-1.0-1.0"
    else:
        cfg = Blip2T5InstructConfig.flan_t5_xl()
        n_calib, bs, txt, lbl = 128, 16, 40, 12
        vit_spec, t5_spec = "39-0.5-1.0-1.0", "24-0.5-1.0-1.0"

    model = Blip2T5Instruct(cfg)
    img = cfg.vit.img_size
    ex = dict(
        image=jnp.zeros((1, img, img, 3), jnp.float32),
        input_ids=jnp.zeros((1, txt), jnp.int32),
        attention_mask=jnp.ones((1, txt), jnp.int32),
        labels=jnp.ones((1, lbl), jnp.int32),
        qformer_input_ids=jnp.zeros((1, txt), jnp.int32),
        qformer_attention_mask=jnp.ones((1, txt), jnp.int32),
    )
    # dense-mode init: no masks collection is created — zeroed weights
    # already encode sparsity on the non-LoRA path, and all-True bool masks
    # would cost ~3.4 GB extra on the XL composition
    shapes = jax.eval_shape(
        lambda r: model.init(r, **ex, vit_mode="dense", llm_mode="dense",
                             qformer_mode="dense"), jax.random.key(0))

    rng = jax.random.key(42)
    batches = []
    for i in range(n_calib // bs):
        k = jax.random.fold_in(rng, i)
        ki, kt, kl_, kq = jax.random.split(k, 4)
        batches.append(dict(
            image=jax.random.normal(ki, (bs, img, img, 3), jnp.float32),
            input_ids=jax.random.randint(kt, (bs, txt), 3, 2000, jnp.int32),
            attention_mask=jnp.ones((bs, txt), jnp.int32),
            labels=jax.random.randint(kl_, (bs, lbl), 3, 2000, jnp.int32),
            qformer_input_ids=jax.random.randint(
                kq, (bs, txt), 3, 2000, jnp.int32),
            qformer_attention_mask=jnp.ones((bs, txt), jnp.int32),
        ))
    jax.block_until_ready(batches)

    common = dict(
        vit_prune_spec=vit_spec, t5_prune_spec=t5_spec,
        num_samples=n_calib,
    )

    import gc

    def run(pruner_name, shadow: bool):
        # fresh params per pass so only ONE copy of the ~8 GB model is
        # resident (the prune pass itself rewrites kernels functionally)
        variables = dict(_rand_params(shapes))
        pruner = load_pruner(pruner_name, FlaxModel(model, variables),
                             batches, **common)
        # preload mask-kernel executables (Pruner.prewarm): over the device
        # tunnel the OBS programs alone are ~50 MB of serialized executable
        # whose upload would otherwise land inside the timed sweep
        pruner.prewarm()
        del variables
        if shadow:
            # untimed full pass: compiles/loads every remaining executable
            # (stems, fold/replay) into the process-wide program caches the
            # timed pass reuses — robust to a cold persistent disk cache
            fm, _ = pruner.prune(lora_model=False)
            _sync(fm.variables)
            pruner.model = None
            del fm
            gc.collect()
            pruner.model = FlaxModel(model, dict(_rand_params(shapes)))
        # drain the async queue (param generation) before starting the
        # timer — see _fence_prog docstring
        _sync(pruner.model.variables)
        t0 = time.perf_counter()
        fm, _ = pruner.prune(lora_model=False)
        _sync(fm.variables)
        dt = time.perf_counter() - t0
        del fm, pruner
        gc.collect()
        return dt

    # the shadow pass is only needed once: Wanda and SparseGPT share every
    # stem/fold/replay program (unified fold), and prewarm covers each
    # method's own mask kernels (r02 evidence: sparsegpt_s held 47.2→47.6 s
    # across rounds while the first-run wanda_s absorbed all cold compiles)
    t_wanda = run("blipt5_wanda_pruner", shadow=True)
    t_sgpt = run("blipt5_sparsegpt_pruner", shadow=False)

    f_wanda = _sweep_flops(shapes, cfg, n_calib, txt, lbl, obs=False)
    f_sgpt = _sweep_flops(shapes, cfg, n_calib, txt, lbl, obs=True)
    peak = _chip_peak_flops()
    total = t_wanda + t_sgpt
    flops = f_wanda + f_sgpt
    print(json.dumps({
        "metric": "instructblip_t5xl_wanda+sparsegpt_mask_wallclock",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / total, 3),
        "detail": {"wanda_s": round(t_wanda, 2),
                   "sparsegpt_s": round(t_sgpt, 2),
                   "scale": scale, "backend": jax.default_backend(),
                   "flops": flops,
                   "flops_per_s": round(flops / total / 1e12, 2),
                   "mfu": round(flops / total / peak, 4),
                   "mfu_wanda": round(f_wanda / t_wanda / peak, 4),
                   "mfu_sparsegpt": round(f_sgpt / t_sgpt / peak, 4),
                   "peak_tflops": peak / 1e12},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
