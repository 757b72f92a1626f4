"""LR schedules + optimizer factory.

Counterpart of ``lavis/common/optims.py`` (linear_warmup_cosine_lr /
linear_warmup_step_lr, reference :13-96) and the AdamW construction with
weight-decay / no-decay param groups (``runner_base.py:114-144``).

The reference mutates ``optimizer.param_groups[...]["lr"]`` imperatively per
step; here each scheduler is a pure function ``lr(cur_epoch, cur_step)`` so
the value can be fed to the jitted train step as a scalar argument (no
recompilation, no host↔device chatter beyond one float).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import optax

from vlm_compression_tpu.common.registry import registry


@registry.register_lr_scheduler("linear_warmup_cosine_lr")
@dataclasses.dataclass
class LinearWarmupCosineLRScheduler:
    """Step-wise linear warmup during epoch 0, epoch-wise cosine after
    (reference optims.py:56-95)."""

    max_epoch: int
    min_lr: float
    init_lr: float
    warmup_steps: int = 0
    warmup_start_lr: float = -1.0

    def __post_init__(self):
        if self.warmup_start_lr < 0:
            self.warmup_start_lr = self.init_lr

    def __call__(self, cur_epoch: int, cur_step: int) -> float:
        if cur_epoch == 0:
            return min(
                self.init_lr,
                self.warmup_start_lr
                + (self.init_lr - self.warmup_start_lr)
                * cur_step / max(self.warmup_steps, 1),
            )
        return (self.init_lr - self.min_lr) * 0.5 * (
            1.0 + math.cos(math.pi * cur_epoch / self.max_epoch)
        ) + self.min_lr


@registry.register_lr_scheduler("linear_warmup_step_lr")
@dataclasses.dataclass
class LinearWarmupStepLRScheduler:
    """Warmup then exponential epoch decay (reference optims.py:13-53)."""

    max_epoch: int
    min_lr: float
    init_lr: float
    decay_rate: float = 1.0
    warmup_steps: int = 0
    warmup_start_lr: float = -1.0

    def __post_init__(self):
        if self.warmup_start_lr < 0:
            self.warmup_start_lr = self.init_lr

    def __call__(self, cur_epoch: int, cur_step: int) -> float:
        if cur_epoch == 0:
            return min(
                self.init_lr,
                self.warmup_start_lr
                + (self.init_lr - self.warmup_start_lr)
                * cur_step / max(self.warmup_steps, 1),
            )
        return max(self.min_lr, self.init_lr * self.decay_rate ** cur_epoch)


def make_lr_scheduler(run_cfg: Any):
    """Build from a run-config namespace/dict (reference runner_base.py:156-187)."""
    get = (run_cfg.get if hasattr(run_cfg, "get")
           else lambda k, d=None: getattr(run_cfg, k, d))
    name = get("lr_sched", "linear_warmup_cosine_lr")
    cls = registry.get_lr_scheduler_class(name)
    kw = dict(
        max_epoch=int(get("max_epoch", 1)),
        min_lr=float(get("min_lr", 0.0)),
        init_lr=float(get("init_lr", 1e-4)),
        warmup_steps=int(get("warmup_steps", 0)),
        warmup_start_lr=float(get("warmup_lr", -1.0)),
    )
    if name == "linear_warmup_step_lr":
        kw["decay_rate"] = float(get("lr_decay_rate", 1.0))
    return cls(**kw)


def _no_decay(path, leaf) -> bool:
    """Reference split (runner_base.py:122-133): no weight decay for
    parameters of rank < 2 (biases, norm scales) — name-based `.bias`
    matching becomes rank-based on a pytree."""
    if hasattr(leaf, "ndim") and leaf.ndim < 2:
        return True
    last = str(path[-1].key) if path and hasattr(path[-1], "key") else ""
    return last in ("bias", "scale", "embedding_ln")


def make_adamw(weight_decay: float = 0.05,
               beta2: float = 0.999,
               injectable_lr: bool = True) -> optax.GradientTransformation:
    """AdamW with decay/no-decay groups; lr is injected per step via
    ``optax.inject_hyperparams`` so the scheduler stays host-side."""

    def tx(lr):
        return optax.chain(
            optax.scale_by_adam(b2=beta2),
            optax.add_decayed_weights(
                weight_decay,
                mask=lambda params: jax.tree_util.tree_map_with_path(
                    lambda p, x: not _no_decay(p, x), params),
            ),
            optax.scale(-lr),
        )

    if injectable_lr:
        return optax.inject_hyperparams(tx)(lr=0.0)
    return tx


__all__ = [
    "LinearWarmupCosineLRScheduler",
    "LinearWarmupStepLRScheduler",
    "make_lr_scheduler",
    "make_adamw",
]
