"""Headline benchmark: Wanda + SparseGPT mask computation wall-clock for
InstructBLIP-FlanT5-XL (EVA-ViT-g + Q-Former + FlanT5-XL), 128 calibration
samples — the driver BASELINE target is <= 120 s for the pair of layer
sweeps on a TPU v4-8 (BASELINE.md "Targets").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": 120/N}

Set VCT_BENCH_SCALE=tiny for a CPU smoke run.
"""

from __future__ import annotations

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

BASELINE_S = 120.0


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

    def _sync(tree):
        """Force completion of every queued device op.  On the axon tunnel
        backend ``jax.block_until_ready`` returns without waiting
        (measured); materializing a device-side scalar is the only
        reliable barrier.  The TPU stream executes programs in dispatch
        order, so reducing a few leaves spread across the tree (enqueued
        after all prune work) fences everything before it."""
        leaves = [l for l in jax.tree_util.tree_leaves(tree)
                  if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                            jnp.floating)]
        picks = leaves[:: max(1, len(leaves) // 8)][:8]
        acc = jax.jit(lambda ls: sum(jnp.sum(l) for l in ls))(
            [l.ravel()[:2] for l in picks])
        return float(acc)

    def run(pruner_name):
        # fresh params per pruner so only ONE copy of the ~9 GB model is
        # resident (the prune pass itself rewrites kernels functionally)
        variables = dict(_rand_params(shapes))
        pruner = load_pruner(pruner_name, FlaxModel(model, variables),
                             batches, **common)
        # preload mask-kernel executables (Pruner.prewarm): over the device
        # tunnel the OBS programs alone are ~50 MB of serialized executable
        # whose upload would otherwise land inside the timed sweep
        pruner.prewarm()
        # drain the async queue (param/batch generation) before starting
        # the timer — see _sync docstring
        _sync(variables)
        del variables
        t0 = time.perf_counter()
        fm, _ = pruner.prune(lora_model=False)
        _sync(fm.variables)
        dt = time.perf_counter() - t0
        del fm, pruner
        gc.collect()
        return dt

    t_wanda = run("blipt5_wanda_pruner")
    t_sgpt = run("blipt5_sparsegpt_pruner")

    total = t_wanda + t_sgpt
    print(json.dumps({
        "metric": "instructblip_t5xl_wanda+sparsegpt_mask_wallclock",
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": round(BASELINE_S / total, 3),
        "detail": {"wanda_s": round(t_wanda, 2),
                   "sparsegpt_s": round(t_sgpt, 2),
                   "scale": scale, "backend": jax.default_backend()},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
