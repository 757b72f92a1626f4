"""Pruner base classes + the BLIP-T5 joint orchestration.

Mirrors the reference's layer-wise pruner family
(pruners/layer_single_base_pruner.py:10-108 for the spec fields;
wanda_pruner.py:948-1039 for the V+L orchestration): prune specs are
``"<num_layers>-<keep_ratio>-<attn_keep>-<ffn_keep>"`` strings whose second
field is the keep ratio (sparsity = 1 − keep), the ViT is pruned first,
then the language encoder, then the decoder, each tower calibrated with
upstream towers in dense mode for the LoRA path (see adapters docstring).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Callable, Dict, Iterable, Optional, Sequence

import flax.linen as nn

from vlm_compression_tpu.compression import adapters as A
from vlm_compression_tpu.compression.calibrate import calibrate_and_prune_tower


def convert_spec_to_list(spec: Optional[str]):
    """'24-0.5-1.0-1.0' → (24, 0.5, 1.0, 1.0) (base_pruner.py:65-71)."""
    if spec is None:
        return None
    parts = spec.split("-")
    return (int(parts[0]), float(parts[1]), float(parts[2]), float(parts[3]))


@dataclasses.dataclass
class FlaxModel:
    """What pruners operate on: a module + its variable collections."""

    module: nn.Module
    variables: dict


class UniformSparsity(dict):
    """sparsity_for that returns one ratio for every key
    (layer_single_base_pruner.py:251-255)."""

    def __init__(self, ratio: float):
        super().__init__()
        self.ratio = float(ratio)

    def __call__(self, key: str) -> float:
        return self.ratio

    def __missing__(self, key):
        return self.ratio


class DictSparsity:
    def __init__(self, mapping: Dict[str, float]):
        self.mapping = mapping

    def __call__(self, key: str) -> float:
        return float(self.mapping[key])


class BasePruner:
    """API: prune(lora_model=...) -> (FlaxModel, sparsity_dict)."""

    pruner_name = "base"

    def __init__(self, model: FlaxModel, data_loader: Iterable, **kw):
        self.model = model
        self.data_loader = data_loader

    def prune(self, lora_model: bool = True):
        raise NotImplementedError


class LayerWisePrunerBase(BasePruner):
    """Shared machinery for Wanda/SparseGPT/DSnoT pruner trios.

    Subclasses define:
      with_hessian: bool — accumulate XᵀX during calibration
      make_mask_fn(lora_model) -> MaskFn for the engine
    """

    with_hessian = False
    owl_m: float = 5.0  # OWL outlier threshold (score_method owl_*)

    def __init__(self, model: FlaxModel, data_loader,
                 prune_spec: Optional[str] = None,
                 t5_prune_spec: Optional[str] = None,
                 vit_prune_spec: Optional[str] = None,
                 num_samples: int = 64,
                 prune_n: int = 0, prune_m: int = 0,
                 sparsity_ratio_granularity: Optional[str] = None,
                 max_sparsity_per_layer: float = 0.8,
                 score_method: str = "obd_avg",
                 num_data_first_stage: int = 32,
                 num_noise: int = 1,
                 noise_eps: float = 1e-3,
                 sparsity_dict: Optional[Dict[str, float]] = None,
                 t5_model_prefix: str = "t5_model",
                 vit_model_prefix: str = "visual_encoder",
                 **kw):
        super().__init__(model, data_loader)
        self.prune_spec = prune_spec
        self.t5_prune_spec = t5_prune_spec
        self.vit_prune_spec = vit_prune_spec
        self.num_samples = num_samples
        self.prune_n, self.prune_m = prune_n, prune_m
        self.sparsity_ratio_granularity = sparsity_ratio_granularity
        self.max_sparsity_per_layer = max_sparsity_per_layer
        self.score_method = score_method
        self.num_data_first_stage = num_data_first_stage
        self.num_noise = num_noise
        self.noise_eps = noise_eps
        self.sparsity_dict = sparsity_dict
        self.t5_model_prefix = t5_model_prefix
        self.vit_model_prefix = vit_model_prefix
        # method-specific knobs (DSnoT cycles, SparseGPT damping, …) are
        # class attributes on the method mixin; accept overrides by name
        for k, v in kw.items():
            if hasattr(type(self), k):
                setattr(self, k, v)

    # ------------------------------------------------------------------
    def batches(self) -> Sequence:
        """Up to num_samples calibration samples, as provided batches."""
        out, n = [], 0
        for b in self.data_loader:
            out.append(b)
            first = next(iter(b.values()))
            n += first.shape[0]
            if n >= self.num_samples:
                break
        return out

    def make_mask_fn(self, lora_model: bool) -> Callable:
        raise NotImplementedError

    def get_sparsity(self, original_sparsity: float,
                     granularity: Optional[str] = None):
        """Uniform / yaml-dict sparsity; non-uniform allocation arrives with
        the LayerSparsity allocator (compression/allocator.py)."""
        if self.sparsity_dict:
            return DictSparsity(self.sparsity_dict)
        if granularity in (None, "none"):
            return UniformSparsity(original_sparsity)
        from vlm_compression_tpu.compression.allocator import LayerSparsity

        alloc = LayerSparsity(
            model=self.model,
            data_loader=self.data_loader,
            original_sparsity=original_sparsity,
            granularity=granularity,
            max_sparsity_per_layer=self.max_sparsity_per_layer,
            score_method=self.score_method,
            num_data=self.num_data_first_stage,
            num_noise=self.num_noise,
            noise_eps=self.noise_eps,
            prefixes=self._allocation_prefixes(),
            owl_m=self.owl_m,
        )
        return DictSparsity(alloc.return_sparsity())

    def _allocation_prefixes(self):
        return None

    # ------------------------------------------------------------------
    def _prewarm_towers(self):
        """(params_subtree_path, tower_tag, keep_ratio) per tower this
        pruner will sweep — overridden by each orchestration base."""
        return []

    def _prewarm_adapters(self):
        """Tower adapters mirroring the ones prune() will build, for
        warming the fold/replay block programs — overridden where the
        orchestration base supports it.  The stems here are only
        eval_shape'd, and the expensive block jits are shared process-wide
        (adapters._BLOCK_JIT_CACHE), so warmed programs ARE the sweep's."""
        return []

    def prewarm(self, join: bool = True):
        """Load/compile every mask-kernel executable this pruner will use,
        concurrently, BEFORE the sweep.

        Over a remote-device tunnel, executable deserialization+upload is
        bandwidth-serialized at ~2 MB/s and the SparseGPT OBS programs sum
        to ~50 MB — paid serially at each shape's first solve if not
        warmed (measured ~45 s of the XL sweep).  The OBS/DSnoT kernels
        are module-level jitted functions and make_mask_fn is memoized per
        tower, so programs warmed here are the very executables the sweep
        calls.  Limitation: wanda jits sparsity as a static argument, so
        under a non-uniform allocator (--sparsity_ratio_granularity) only
        the uniform-ratio wanda program is warmed.  Returns the warm
        thread (already joined unless join=False).
        """
        import threading
        from concurrent.futures import ThreadPoolExecutor

        from vlm_compression_tpu.compression.calibrate import (
            _fold_warm_inputs,
            _warm_fold_programs,
            _warm_mask_shape,
            fuse_batch_dicts,
            linear_paths,
            tree_get,
        )

        variables = self.model.variables
        jobs = {}
        fold_jobs = []
        adapters = self._prewarm_adapters()
        if adapters:
            # fold/replay programs key on the FUSED calibration batch
            # shapes (the sweep fuses equal-shape batches)
            try:
                batch0 = fuse_batch_dicts(self.batches())[0]
            except Exception:  # noqa: BLE001 — no data: skip fold warm
                batch0 = None
            if batch0 is not None:
                for ad in adapters:
                    try:
                        inputs = _fold_warm_inputs(ad, variables, batch0,
                                                   self.with_hessian)
                    except Exception:  # noqa: BLE001 — shape mismatch: skip
                        continue
                    fold_jobs.append((ad,) + inputs
                                     + (self.with_hessian, "masked"))
        for subtree, tower, keep in self._prewarm_towers():
            if keep is None or keep >= 1.0:
                continue
            params = variables["params"]
            for p in subtree:
                params = params.get(p, {})
            mask_fn = self.make_mask_fn(True, tower=tower)
            for bname, bparams in params.items():
                if not isinstance(bparams, dict):
                    continue
                counts = {}
                for lp in linear_paths(bparams):
                    kern = tree_get(bparams, lp)["kernel"]
                    key = (kern.shape, str(kern.dtype))
                    counts[key] = counts.get(key, 0) + 1
                for (shape, dt), g in counts.items():
                    # tower in the key: the vit (flat-threshold) and llm
                    # (per-unit top-k) mask fns are DIFFERENT programs even
                    # at equal shapes
                    jobs[(tower, shape, dt, 1.0 - keep, g)] = mask_fn

        if not jobs and not fold_jobs:
            return None

        def work():
            tasks = ([(lambda it=it: _warm_mask_shape(
                        it[1], self.with_hessian, *it[0][1:]))
                      for it in jobs.items()]
                     + [(lambda fj=fj: _warm_fold_programs(*fj))
                        for fj in fold_jobs])
            with ThreadPoolExecutor(max_workers=min(len(tasks), 10)) as ex:
                list(ex.map(lambda t: t(), tasks))

        t = threading.Thread(target=work, daemon=True)
        t.start()
        # the engine's per-tower self-warm would re-EXECUTE the warm solves
        # inside the sweep; remember this thread so _prune_tower hands it
        # over instead (joining an already-finished thread is free)
        self._prewarm_thread = t
        if join:
            t.join()
        return t

    def _prune_tower(self, adapter, variables, batches, sparsity_for,
                     lora_model):
        return calibrate_and_prune_tower(
            adapter, variables, batches,
            mask_fn=self.make_mask_fn(lora_model),
            sparsity_for=sparsity_for,
            with_hessian=self.with_hessian,
            lora_model=lora_model,
            progress=logging.info,
        )
