"""Global magnitude-class pruners for the joint V+L model.

Counterpart of ``lavis/compression/pruners/global_pruner.py``: one-shot or
iterative global pruning across both towers with the schedule
``p_i = p^(iteration/i)`` (reference :157-199), thresholded either globally
over the concatenated scores, per-model, or per-layer (reference
:109-148), with weights zeroed in place and — unlike the reference, which
only zeroes weights — the keep-masks also written to the ``masks``
collection so the sparse forward stays mask-driven.

Registry parity: ``blipt5_mag_pruner`` (SIGNED weight value — the
reference's :242-243 returns ``v.data.float()`` with no abs, so the
most-negative weights prune first; replicated for bit-parity, with
``blipt5_absmag_pruner`` as the beyond-reference |W| variant),
``blipt5_rand_pruner``, ``blipt5_aobd_pruner`` (|W|·|ḡ| first-order),
``blipt5_mezo_pruner`` (zeroth-order per-layer scalar scores — note the
reference's MeZO variant scores each layer with a *single scalar*, so
thresholding keeps or drops whole layers; replicated faithfully,
reference :345-383).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.compression.allocator import (
    select_prunable_keys,
    _tree_get,
    _tree_set,
)
from vlm_compression_tpu.compression.pruners.base import (
    FlaxModel,
    LayerWisePrunerBase,
    convert_spec_to_list,
)


def _kth_smallest_threshold(all_scores: jnp.ndarray, k: int):
    """Value of the k-th smallest element (torch.topk(..., largest=False)
    threshold semantics, reference :124-127)."""
    if k <= 0:
        return -jnp.inf
    return jnp.sort(all_scores)[k - 1]


def global_mask(scores: Dict[str, jnp.ndarray], p: float,
                max_sparsity_per_layer: float = 1.0) -> Dict[str, jnp.ndarray]:
    """One threshold over the concatenation; per-key top-(1−max_sparsity)
    elements promoted to +max to guarantee survival (reference :109-133)."""
    promoted = {}
    fmax = jnp.finfo(jnp.float32).max
    for k, v in scores.items():
        v = v.astype(jnp.float32)
        num_protect = int(v.size * (1.0 - max_sparsity_per_layer))
        if num_protect > 0:
            thr = jnp.sort(v.ravel())[-num_protect]
            v = jnp.where(v >= thr, fmax, v)
        promoted[k] = v
    flat = jnp.concatenate([v.ravel() for v in promoted.values()])
    k = int(p * flat.size)
    thr = _kth_smallest_threshold(flat, k)
    return {key: v > thr for key, v in promoted.items()}


def layerwise_mask(scores: Dict[str, jnp.ndarray], p: float
                   ) -> Dict[str, jnp.ndarray]:
    """Per-layer threshold (reference :135-148)."""
    out = {}
    for k, v in scores.items():
        v = v.astype(jnp.float32)
        kk = int(p * v.size)
        thr = _kth_smallest_threshold(v.ravel(), kk)
        out[k] = v > thr
    return out


class BlipT5GlobalPruner(LayerWisePrunerBase):
    """Base: iterative schedule + masking modes; subclasses supply scores."""

    pruner_name = "blipt5_global_pruner"

    def __init__(self, model, data_loader, is_global: bool = False,
                 prune_per_model: bool = False, iteration: int = 1,
                 seed: int = 0, **kw):
        super().__init__(model, data_loader, **kw)
        self.is_global = is_global
        self.prune_per_model = prune_per_model
        self.iteration = iteration
        self.seed = seed

    # subclass hook ----------------------------------------------------
    def compute_importance(self, variables, keys: Sequence[Tuple[str, ...]],
                           batches) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    # ------------------------------------------------------------------
    def prune(self, lora_model: bool = True):
        module = self.model.module
        variables = dict(self.model.variables)
        if self.t5_prune_spec is None or self.vit_prune_spec is None:
            return self.model, None
        vit_keep = convert_spec_to_list(self.vit_prune_spec)[1]
        t5_keep = convert_spec_to_list(self.t5_prune_spec)[1]
        # reference :216: only meaningful when the two ratios agree
        keep = min(vit_keep, t5_keep)
        target_sparsity = 1.0 - keep

        params = variables["params"]
        keys = select_prunable_keys(
            params, prefixes=(self.vit_model_prefix, self.t5_model_prefix))
        skeys = {"/".join(k): k for k in keys}
        batches = self.batches()

        masks: Optional[Dict[str, jnp.ndarray]] = None
        for i in range(1, self.iteration + 1):
            p_i = target_sparsity ** (self.iteration / i)
            imp = self.compute_importance(variables, keys, batches)
            if masks is not None:
                imp = {k: imp[k] * masks[k].astype(imp[k].dtype)
                       for k in imp}

            if self.is_global and not self.prune_per_model:
                masks = global_mask(imp, p_i, 1.0)
            elif self.is_global and self.prune_per_model:
                vis = {k: v for k, v in imp.items()
                       if k.startswith(self.vit_model_prefix)}
                lang = {k: v for k, v in imp.items()
                        if k.startswith(self.t5_model_prefix)}
                masks = {**global_mask(vis, p_i, 1.0),
                         **global_mask(lang, p_i, 1.0)}
            else:
                masks = layerwise_mask(imp, p_i)

            # zero pruned weights (reference :190-194) + set keep-masks
            new_params, new_masks = params, variables.get("masks", {})
            for ks, path in skeys.items():
                m = jnp.broadcast_to(
                    masks[ks], _tree_get(params, path)["kernel"].shape)
                leaf = dict(_tree_get(new_params, path))
                leaf["kernel"] = jnp.where(
                    m, leaf["kernel"], jnp.zeros((), leaf["kernel"].dtype))
                new_params = _tree_set(new_params, path, leaf)
                new_masks = _tree_set(new_masks, path, {"mask": m})
            params = new_params
            variables = {**variables, "params": new_params,
                         "masks": new_masks}
            logging.info("%s: step %d target sparsity %.4f",
                         self.pruner_name, i, p_i)

        self.model = FlaxModel(module, variables)
        return self.model, None


@registry.register_pruner("blipt5_mag_pruner")
class BlipT5MagPruner(BlipT5GlobalPruner):
    """NOTE: the reference scores by the SIGNED weight value, not |W|
    (global_pruner.py:242-243 returns ``v.data.float()`` with no abs), so
    the most-negative weights prune first — replicated verbatim for
    bit-parity (proven by test_reference_alloc_parity.py)."""

    pruner_name = "blipt5_mag_pruner"

    def compute_importance(self, variables, keys, batches):
        p = variables["params"]
        return {"/".join(k):
                _tree_get(p, k)["kernel"].astype(jnp.float32) for k in keys}


@registry.register_pruner("blipt5_absmag_pruner")
class BlipT5AbsMagPruner(BlipT5GlobalPruner):
    """Beyond-reference: magnitude pruning by |W| — what ``mag`` usually
    means.  The reference-parity ``blipt5_mag_pruner`` above replicates
    the reference's signed scoring verbatim; use this variant when you
    want the conventional semantics rather than bit-parity."""

    pruner_name = "blipt5_absmag_pruner"

    def compute_importance(self, variables, keys, batches):
        p = variables["params"]
        return {"/".join(k):
                jnp.abs(_tree_get(p, k)["kernel"].astype(jnp.float32))
                for k in keys}


@registry.register_pruner("blipt5_rand_pruner")
class BlipT5RandPruner(BlipT5GlobalPruner):
    pruner_name = "blipt5_rand_pruner"

    def compute_importance(self, variables, keys, batches):
        p = variables["params"]
        root = jax.random.key(self.seed)
        return {"/".join(k): jax.random.normal(
            jax.random.fold_in(root, i),
            _tree_get(p, k)["kernel"].shape, jnp.float32)
            for i, k in enumerate(keys)}


@registry.register_pruner("blipt5_aobd_pruner")
class BlipT5AObdPruner(BlipT5GlobalPruner):
    """First-order |W|·|ḡ| with full score tensors (needed for global
    thresholding — unlike the allocator, sums don't suffice here)."""

    pruner_name = "blipt5_aobd_pruner"

    def compute_importance(self, variables, keys, batches):
        module = self.model.module
        frozen = {k: v for k, v in variables.items() if k != "params"}
        params = variables["params"]

        def loss(p, batch):
            return module.apply({"params": p, **frozen}, **batch)["loss"]

        @jax.jit
        def grad_abs(p, batch):
            g = jax.grad(loss)(p, batch)
            return {"/".join(k): jnp.abs(
                _tree_get(g, k)["kernel"].astype(jnp.float32)) for k in keys}

        acc = None
        for b in batches:
            ga = grad_abs(params, b)
            acc = ga if acc is None else {
                k: acc[k] + ga[k] for k in acc}
        nb = max(len(batches), 1)
        return {"/".join(k): jnp.abs(
            _tree_get(params, k)["kernel"].astype(jnp.float32))
            * (acc["/".join(k)] / nb) for k in keys}


@registry.register_pruner("blipt5_mezo_pruner")
class BlipT5MezoPruner(BlipT5GlobalPruner):
    """Zeroth-order: one scalar |projected grad| per layer (reference
    :322-383) — thresholding therefore keeps/drops whole layers."""

    pruner_name = "blipt5_mezo_pruner"
    noise_eps = 1e-3
    # test hook: noise_fn((leaf, batch, noise), key_str, shape) -> ndarray
    # replays externally-generated Gaussians (reference-parity tests)
    noise_fn = None

    def compute_importance(self, variables, keys, batches):
        module = self.model.module
        frozen = {k: v for k, v in variables.items() if k != "params"}
        params = variables["params"]
        eps = self.noise_eps
        injected = self.noise_fn is not None

        cache = {}

        def projected_grad(k, z_or_rng, batch):
            if k not in cache:
                def f(p, zr, batch, _k=k):
                    def pert(scale):
                        leaf = dict(_tree_get(p, _k))
                        w = leaf["kernel"]
                        z = (zr if injected else
                             jax.random.normal(zr, w.shape, jnp.float32))
                        leaf["kernel"] = (w.astype(jnp.float32)
                                          + scale * eps * z).astype(w.dtype)
                        return _tree_set(p, _k, leaf)
                    l1 = module.apply(
                        {"params": pert(+1.0), **frozen}, **batch)["loss"]
                    l2 = module.apply(
                        {"params": pert(-1.0), **frozen}, **batch)["loss"]
                    return (l1 - l2) / (2.0 * eps)
                cache[k] = jax.jit(f)
            return cache[k](params, z_or_rng, batch)

        root = jax.random.key(self.seed)
        out = {}
        for li, k in enumerate(keys):
            acc = 0.0
            # sample budget consumed per noise eval, reference :345-360
            accum = 0
            for bi, b in enumerate(batches):
                if accum >= self.num_samples:
                    break
                for ni in range(self.num_noise):
                    if accum >= self.num_samples:
                        break
                    if injected:
                        zr = jnp.asarray(self.noise_fn(
                            (li, bi, ni), "/".join(k),
                            _tree_get(params, k)["kernel"].shape),
                            jnp.float32)
                    else:
                        zr = jax.random.fold_in(
                            root, (li * 997 + bi) * 31 + ni)
                    acc += abs(float(projected_grad(k, zr, b)))
                    accum += int(next(iter(b.values())).shape[0])
            out["/".join(k)] = jnp.full((1, 1), acc, jnp.float32)
        return out
