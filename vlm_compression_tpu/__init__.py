"""vlm_compression_tpu — TPU-native VLM compression framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the RESSA
reference (Shwai-He/VLM-Compression): calibration-based one-shot pruning
(Wanda / SparseGPT / DSnoT / magnitude / random / first- and zeroth-order
global pruners) of vision-language towers, SparseLoRA adapters whose merged
weights stay sparse, and RESSA retraining with cross-modality knowledge
distillation — all expressed as pure functions over parameter pytrees,
jitted over `jax.sharding.Mesh`es, with Pallas TPU kernels on the hot paths.

Layering (mirrors reference lavis/ layering, see SURVEY.md §1):
  common/       registry, config trees, logging, distributed init
  parallel/     mesh + sharding rules (data/tensor axes over ICI)
  ops/          device kernels: masks, calibration statistics, OBS solver,
                DSnoT refinement, fused masked matmul (Pallas)
  models/       Flax towers (EVA-ViT-g, Q-Former, T5, LLaMA, OPT) + BLIP-2 /
                InstructBLIP compositions; all forwards take a `mode` switch
                (dense teacher / masked / sparse-LoRA) instead of the
                reference's per-module `dense` flag threading
  peft/         LoRA / SparseLoRA parameter trees and merge ops
  compression/  pruner registry + calibration engine + sparsity allocator
  tasks/        train/eval task logic incl. RESSA KD retraining
  runners/      epoch/iter runners, checkpointing (orbax), eval orchestration
  datasets/     builders, dataset item classes, processors
  evaluation/   VQA / caption / retrieval metric suites
  cli/          train/evaluate entry points mirroring the reference CLI
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # Honor an explicit CPU request even on images whose sitecustomize
    # pins a TPU backend at interpreter start (backend init is lazy, so
    # this works as long as no devices were touched) — the same handling
    # as tests/conftest.py and __graft_entry__.py, so CLI entry points
    # are CPU-runnable: JAX_PLATFORMS=cpu python -m vlm_compression_tpu
    # .cli.train ...
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

from vlm_compression_tpu.common.registry import registry  # noqa: F401


def load_pruner(name, model, data_loader, cfg=None, **kw):
    """Top-level convenience re-export (heavy imports stay lazy)."""
    from vlm_compression_tpu.compression import load_pruner as _lp

    return _lp(name, model, data_loader, cfg, **kw)


def load_model(*args, **kw):
    from vlm_compression_tpu.models import load_model as _lm

    return _lm(*args, **kw)


def load_model_and_preprocess(*args, **kw):
    from vlm_compression_tpu.models import load_model_and_preprocess as _lmp

    return _lmp(*args, **kw)
