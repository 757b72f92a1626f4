"""RunnerIter — iteration-based training with inner epochs.

Counterpart of ``lavis/runners/runner_iter.py:24-317``: training is
measured in iterations; ``max_iters`` is split into inner epochs of
``iters_per_inner_epoch`` steps, each followed by optional validation and
an iter-stamped checkpoint."""

from __future__ import annotations

import logging
from typing import Dict

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.runners.runner_base import RunnerBase, _get


@registry.register_runner("runner_iter")
class RunnerIter(RunnerBase):
    @property
    def max_iters(self) -> int:
        return int(_get(self.run_cfg, "max_iters", 100))

    @property
    def iters_per_inner_epoch(self) -> int:
        return int(_get(self.run_cfg, "iters_per_inner_epoch",
                        self.max_iters))

    def train(self, prune_retrain: bool = False) -> Dict:
        self._load_checkpoint_if_resume()
        n_inner = max(1, self.max_iters // self.iters_per_inner_epoch)
        stats_all = {}
        start = self.start_epoch
        for inner in range(start, n_inner):
            # reuse the epoch loop with iters_per_epoch pinned
            self.run_cfg["iters_per_epoch"] = self.iters_per_inner_epoch
            stats = self.train_epoch(inner)
            self.log_stats(stats, split_name="train")
            stats_all[inner] = stats
            self._save_checkpoint(
                f"iter{(inner + 1) * self.iters_per_inner_epoch}")
            if self.dataloaders.get("val") is not None:
                metrics = self.eval_epoch("val")
                self.log_stats(metrics or {}, split_name="val")
            if prune_retrain:
                break
        self.model.variables = {**self.model.variables,
                                "lora": self.train_state.lora}
        logging.info("RunnerIter: %d inner epochs done", len(stats_all))
        return stats_all
