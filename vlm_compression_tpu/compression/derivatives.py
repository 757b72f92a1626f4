"""Data-derivative and activation collection helpers.

Counterpart of the reference's structural-pruning legacy utilities
(``runner_base.py:444-615`` + ``base_task.get_data_derivative``
:208-260): per-parameter squared-gradient (diagonal Fisher) accumulation
and per-linear activation norms — both as pure jitted folds instead of
module-wide forward hooks."""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


def get_data_derivative(module, variables: dict, batches: Sequence,
                        loss_fn: Optional[Callable] = None,
                        power: int = 2) -> Dict:
    """Mean |∂loss/∂θ|^power per parameter leaf (power=2 → diagonal
    Fisher, power=1 → first-order saliency; reference base_task.py:208-260
    computes the per-logit fisher batch by batch)."""
    loss_fn = loss_fn or (
        lambda v, b: module.apply(v, **b)["loss"])
    frozen = {k: v for k, v in variables.items() if k != "params"}

    @jax.jit
    def fold(acc, params, batch):
        g = jax.grad(lambda p: loss_fn({"params": p, **frozen}, batch)
                     )(params)
        return jax.tree_util.tree_map(
            lambda a, gg: a + jnp.abs(gg.astype(jnp.float32)) ** power,
            acc, g)

    params = variables["params"]
    acc = jax.tree_util.tree_map(
        lambda x: jnp.zeros(x.shape, jnp.float32), params)
    n = 0
    for b in batches:
        acc = fold(acc, params, b)
        n += 1
    return jax.tree_util.tree_map(lambda a: a / max(n, 1), acc)


def get_activations(module, variables: dict, batches: Sequence,
                    apply_kwargs: Optional[dict] = None
                    ) -> Dict[Tuple[str, ...], jnp.ndarray]:
    """Mean ℓ₂ activation norm per input column for every SparseLinear
    (reference get_activations registers hooks on every module,
    runner_base.py:497-615; here the layers' calib sowing provides the
    same signal in one pass)."""
    from vlm_compression_tpu.ops.stats import (
        init_calib_stats,
        update_calib_stats,
    )

    kw = dict(apply_kwargs or {})

    @jax.jit
    def capture(batch):
        _, aux = module.apply(variables, **batch, mutable=["calib"], **kw)
        out = {}

        def walk(node, prefix):
            for k, v in node.items():
                if k == "input":
                    out[prefix] = v[0] if isinstance(v, (tuple, list)) else v
                elif isinstance(v, dict):
                    walk(v, prefix + (k,))

        walk(aux["calib"], ())
        return out

    stats = {}
    for b in batches:
        captured = capture(b)
        for path, act in captured.items():
            st = stats.get(path) or init_calib_stats(act.shape[-1])
            stats[path] = update_calib_stats(st, act)
    return {p: s.scaler_row for p, s in stats.items()}


def convert_activation_to_importance(activations: Dict, square: bool = True
                                     ) -> Dict:
    """Per-unit importance from activation statistics
    (runner_base.py:709-769)."""
    return {p: (a if square else jnp.sqrt(jnp.maximum(a, 0.0)))
            for p, a in activations.items()}
