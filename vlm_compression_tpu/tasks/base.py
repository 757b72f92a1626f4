"""BaseTask — model/dataset construction + generic train/eval loops.

Counterpart of ``lavis/tasks/base_task.py:21-132``: ``build_model`` via the
model registry, ``build_datasets`` via dataset builders (with
``max_train_samples`` split across datasets, reference :37-71), a generic
evaluation loop, and per-host result saving with host-0 merge
(reference :355-393).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Iterable, Optional

from vlm_compression_tpu.common.registry import registry


class BaseTask:
    def __init__(self, **kwargs):
        self.inst_id_key = "instance_id"

    @classmethod
    def setup_task(cls, cfg=None, **kwargs):
        return cls()

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    def build_model(self, cfg):
        model_cfg = cfg.model_cfg
        # the reference gates mixed precision per RUN config
        # (run_cfg.amp → autocast, runner_base.py:146-154); thread it
        # into the model dtype policy (factory.apply_dtype_policy)
        run_cfg = getattr(cfg, "run_cfg", None)
        if run_cfg is not None and hasattr(run_cfg, "get") \
                and run_cfg.get("amp") is not None \
                and hasattr(model_cfg, "get") \
                and model_cfg.get("amp") is None:
            try:
                model_cfg["amp"] = bool(run_cfg.get("amp"))
            except TypeError:
                pass
        from vlm_compression_tpu.compression.pruners.base import FlaxModel
        from vlm_compression_tpu.models.factory import build_model

        module, variables = build_model(model_cfg)
        return FlaxModel(module, variables)

    def build_datasets(self, cfg, max_train_samples: Optional[int] = None):
        """name → {split: dataset}; the train-sample cap is split evenly
        across datasets (reference base_task.py:47-66)."""
        datasets = {}
        datasets_cfg = cfg.datasets_cfg
        names = list(datasets_cfg)
        per_ds = (max_train_samples // max(len(names), 1)
                  if max_train_samples else None)
        for name in names:
            builder = registry.get_builder_class(name)(datasets_cfg[name])
            datasets[name] = builder.build_datasets(max_train_samples=per_ds)
        return datasets

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------
    def valid_step(self, model, samples) -> Iterable[Dict[str, Any]]:
        raise NotImplementedError

    def before_evaluation(self, model, dataset, **kwargs):
        pass

    def after_evaluation(self, val_result, **kwargs):
        return None

    def evaluation(self, model, data_loader, cuda_enabled=None):
        results = []
        for samples in data_loader:
            results.extend(self.valid_step(model=model, samples=samples))
        return results

    # ------------------------------------------------------------------
    # result IO: per-host JSON shard + host-0 merge (base_task.py:355-393)
    # ------------------------------------------------------------------
    @staticmethod
    def save_result(result, result_dir, filename, remove_duplicate="",
                    rank=None, world=None):
        """rank/world default to the real process grid; the multi-host
        dryrun passes them explicitly to exercise the shard+merge path
        with a simulated process_count > 1."""
        import jax

        os.makedirs(result_dir, exist_ok=True)
        real_grid = rank is None
        rank = jax.process_index() if rank is None else rank
        world = jax.process_count() if world is None else world
        shard = os.path.join(result_dir, f"{filename}_rank{rank}.json")
        with open(shard, "w") as f:
            json.dump(result, f)

        # on a real multi-process grid, every shard must exist before the
        # merge (reference base_task.py:366-367 barriers here); simulated
        # rank/world callers orchestrate their own ordering
        if real_grid and jax.process_count() > 1:
            from vlm_compression_tpu.common.dist import barrier

            barrier()

        final = os.path.join(result_dir, f"{filename}.json")
        if rank == 0:
            merged, seen = [], set()
            for r in range(world):
                p = os.path.join(result_dir, f"{filename}_rank{r}.json")
                if not os.path.exists(p):
                    continue
                with open(p) as f:
                    part = json.load(f)
                for item in part:
                    if remove_duplicate:
                        key = item.get(remove_duplicate)
                        if key in seen:
                            continue
                        seen.add(key)
                    merged.append(item)
            with open(final, "w") as f:
                json.dump(merged, f)
            logging.info("result file saved to %s", final)
        return final
