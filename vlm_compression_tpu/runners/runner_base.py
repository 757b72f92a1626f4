"""RunnerBase — train/eval orchestration over a device mesh.

Counterpart of ``lavis/runners/runner_base.py`` (SURVEY.md §2.5).  The
reference's DDP object, GradScaler, and per-rank samplers disappear: the
train step is ONE pjit'd SPMD program over a ``("data", "model")`` mesh
(gradient psum implicit), AMP is bf16 params + fp32 loss by construction,
and data sharding is (rank, world) slicing in the DataLoader.

Kept API surface: ``train(prune_retrain=)``, ``evaluate(skip_reload=)``,
``get_dataloader_for_importance_computation(num_data, batch_size)``,
checkpoint save/resume/reload-best (orbax), JSONL stats to
``output_dir/log.txt`` (reference :986-998).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

from vlm_compression_tpu.common.logger import MetricLogger, SmoothedValue
from vlm_compression_tpu.common.optims import make_adamw, make_lr_scheduler
from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.datasets.loaders import (
    DataLoader,
    IterLoader,
    MultiIterLoader,
    concat_datasets,
    reorg_datasets_by_split,
)
from vlm_compression_tpu.parallel.mesh import (
    MeshConfig,
    data_sharding,
    make_mesh,
)
from vlm_compression_tpu.tasks.retrain import RessaTrainState


def _concat_micro_batches(micro):
    """Stack accum prepared micro-batches along the batch dim, padding
    ragged sequence lengths (labels with -100, everything else with 0)."""
    out = {}
    for k in micro[0]:
        if not isinstance(micro[0][k], (np.ndarray, jax.Array)):
            continue
        arrs = [np.asarray(m[k]) for m in micro]
        if arrs[0].ndim >= 2:
            max_len = max(a.shape[1] for a in arrs)
            fill = -100 if k == "labels" else 0
            arrs = [np.pad(a, [(0, 0), (0, max_len - a.shape[1])]
                           + [(0, 0)] * (a.ndim - 2),
                           constant_values=fill)
                    if a.shape[1] != max_len else a for a in arrs]
        out[k] = np.concatenate(arrs, axis=0)
    return out


def _get(cfg, key, default=None):
    if cfg is None:
        return default
    if hasattr(cfg, "get"):
        v = cfg.get(key, default)
    else:
        v = getattr(cfg, key, default)
    return default if v is None else v


@registry.register_runner("runner_base")
class RunnerBase:
    def __init__(self, cfg, task, model, datasets: Dict, job_id: str = "job",
                 prepare_batch: Optional[Callable] = None,
                 mesh=None):
        """model: FlaxModel (module + variables); datasets: {name: {split:
        dataset}}; prepare_batch(samples) -> model kwargs (tokenization)."""
        self.config = cfg
        self.run_cfg = cfg.run_cfg if hasattr(cfg, "run_cfg") else cfg
        self.task = task
        self.model = model
        self.datasets = datasets
        self.job_id = job_id
        self.prepare_batch = prepare_batch or (lambda s: s)
        self.mesh = mesh or make_mesh(MeshConfig(
            data=-1, model=int(_get(self.run_cfg, "model_parallel", 1))))

        self.start_epoch = 0
        self.max_epoch = int(_get(self.run_cfg, "max_epoch", 1))
        self.output_dir = _get(self.run_cfg, "output_dir", "output/" + job_id)
        os.makedirs(os.path.join(self.output_dir, "result"), exist_ok=True)

        self._dataloaders = None
        self._train_state = None
        self._train_step = None
        self._lr_sched = None
        self._tx = None

    # ------------------------------------------------------------------
    # lazy pieces
    # ------------------------------------------------------------------
    @property
    def tx(self):
        if self._tx is None:
            self._tx = make_adamw(
                weight_decay=float(_get(self.run_cfg, "weight_decay", 0.05)),
                beta2=float(_get(self.run_cfg, "beta2", 0.999)))
        return self._tx

    @property
    def lr_scheduler(self):
        if self._lr_sched is None:
            self._lr_sched = make_lr_scheduler(self.run_cfg)
        return self._lr_sched

    @property
    def train_state(self) -> RessaTrainState:
        if self._train_state is None:
            self._train_state = RessaTrainState.create(
                self.model.variables, self.tx)
        return self._train_state

    @property
    def accum_grad_iters(self) -> int:
        return int(_get(self.run_cfg, "accum_grad_iters", 1))

    @property
    def train_step(self):
        if self._train_step is None:
            import inspect

            kw = {}
            if "accum_grad_iters" in inspect.signature(
                    self.task.make_train_step).parameters:
                kw["accum_grad_iters"] = self.accum_grad_iters
            step = self.task.make_train_step(self.model.module, self.tx, **kw)
            # no donation: the state's frozen params/masks leaves are shared
            # with model.variables (donating would delete them); only the
            # small lora/opt_state buffers are rewritten per step
            self._train_step = jax.jit(step)
        return self._train_step

    @property
    def dataloaders(self) -> Dict[str, Any]:
        """split → loader; train datasets concatenated (or ratio-sampled
        when ``train_dataset_ratios`` is set, reference :833-912)."""
        if self._dataloaders is None:
            by_split = reorg_datasets_by_split(self.datasets)
            out = {}
            rank, world = jax.process_index(), jax.process_count()
            bs_train = int(_get(self.run_cfg, "batch_size_train", 8))
            bs_eval = int(_get(self.run_cfg, "batch_size_eval", 8))
            ratios = _get(self.run_cfg, "train_dataset_ratios")
            for split, dss in by_split.items():
                is_train = split == "train"
                bs = bs_train if is_train else bs_eval
                if is_train and ratios:
                    loaders = [DataLoader(d, bs, shuffle=True,
                                          drop_last=True, rank=rank,
                                          world_size=world) for d in dss]
                    out[split] = MultiIterLoader(loaders, ratios)
                else:
                    ds = dss[0] if len(dss) == 1 else concat_datasets(dss)
                    dl = DataLoader(ds, bs, shuffle=is_train,
                                    drop_last=is_train, rank=rank,
                                    world_size=world)
                    out[split] = IterLoader(dl) if is_train else dl
            self._dataloaders = out
        return self._dataloaders

    # ------------------------------------------------------------------
    # calibration loader (reference :659-707)
    # ------------------------------------------------------------------
    def get_dataloader_for_importance_computation(
            self, num_data: int = 128, power: int = 2, batch_size: int = 1):
        by_split = reorg_datasets_by_split(self.datasets)
        dss = by_split.get("train") or next(iter(by_split.values()))
        ds = dss[0] if len(dss) == 1 else concat_datasets(dss)
        dl = DataLoader(ds, batch_size, shuffle=False)
        n_batches = max(1, num_data // batch_size)

        prepared = []
        for i, b in enumerate(dl):
            if i >= n_batches:
                break
            prepared.append(self.prepare_batch(b))
        return prepared

    def get_last_activations(self, num_data: int = 128, power: int = 2,
                             batch_size: int = 16) -> Dict[str, Any]:
        """Final model outputs over the first test split
        (reference runner_base.py:617-656 → base_task.get_activations
        :162-206): raw texts + logits, padded to a common length."""
        import numpy as np

        by_split = reorg_datasets_by_split(self.datasets)
        splits = _get(self.run_cfg, "test_splits") or list(by_split)
        dss = by_split.get(splits[0]) or next(iter(by_split.values()))
        ds = dss[0] if len(dss) == 1 else concat_datasets(dss)
        dl = DataLoader(ds, batch_size, shuffle=False)

        texts, logits_list = [], []
        seen = 0
        for raw in dl:
            texts.extend(t_in + t_out for t_in, t_out in zip(
                raw["text_input"],
                raw.get("text_output", raw["text_input"])))
            batch = self.prepare_batch(raw)
            out = self.model.module.apply(self.model.variables, **batch)
            logits_list.append(np.asarray(out["logits"], np.float32))
            seen += logits_list[-1].shape[0]
            if seen >= num_data:
                break
        max_len = max(l.shape[1] for l in logits_list)
        padded = [np.pad(l, ((0, 0), (0, max_len - l.shape[1]), (0, 0)))
                  for l in logits_list]
        return {"texts": texts, "logits": np.concatenate(padded, axis=0)}

    # ------------------------------------------------------------------
    # training (reference :373-431)
    # ------------------------------------------------------------------
    def train(self, prune_retrain: bool = False) -> Dict[str, Any]:
        best_agg, best_epoch = -1e18, 0
        self._load_checkpoint_if_resume()
        stats_all = {}
        for epoch in range(self.start_epoch, self.max_epoch):
            stats = self.train_epoch(epoch)
            self.log_stats(stats, split_name="train")
            stats_all[epoch] = stats

            val = self.dataloaders.get("val")
            # honor run_cfg.valid_splits when set (reference
            # runner_base.py:314-320: empty list = skip validation —
            # e.g. KD retraining, whose task has no valid_step)
            vsplits = _get(self.run_cfg, "valid_splits", None)
            if vsplits is not None and "val" not in vsplits:
                val = None
            if val is not None:
                metrics = self.eval_epoch("val")
                agg = float(metrics.get("agg_metrics", 0.0)) if metrics else 0.0
                if agg > best_agg:
                    best_agg, best_epoch = agg, epoch
                    self._save_checkpoint(epoch, is_best=True)
                self.log_stats(metrics or {}, split_name="val")
            else:
                self._save_checkpoint(epoch, is_best=False)

            if prune_retrain:
                break   # reference :420-421: one epoch under RESSA
        # fold trained lora back into model variables
        self.model.variables = {
            **self.model.variables,
            "lora": self.train_state.lora,
        }
        return stats_all

    def train_epoch(self, epoch: int) -> Dict[str, str]:
        loader = self.dataloaders["train"]
        iters = int(_get(self.run_cfg, "iters_per_epoch", 0)) or len(loader)
        accum = self.accum_grad_iters
        # ``iters`` counts micro-iterations like the reference
        # (base_task.py:262-353 steps the optimizer every accum iters);
        # the fused step consumes accum loader batches at once.  Trailing
        # iters % accum micro-iterations produce no optimizer step — the
        # reference's step-every-k loop drops them the same way.
        opt_steps = max(1, iters // accum)
        logger = MetricLogger(delimiter="  ")
        logger.add_meter("lr", SmoothedValue(window_size=1, fmt="{value:.6f}"))
        logger.add_meter("loss", SmoothedValue(window_size=1,
                                               fmt="{value:.4f}"))
        state = self.train_state
        sharding = data_sharding(self.mesh)
        it = iter(loader)
        for i in logger.log_every(range(opt_steps),
                                  int(_get(self.run_cfg, "log_freq", 50)),
                                  f"Train: data epoch: [{epoch}]"):
            def pull():
                # train loaders are usually cycling IterLoaders; guard
                # plain finite loaders so accum can't StopIteration
                # mid-epoch
                nonlocal it
                try:
                    return next(it)
                except StopIteration:
                    it = iter(loader)
                    return next(it)

            if accum == 1:
                batch = self.prepare_batch(pull())
            else:
                micro = [self.prepare_batch(pull()) for _ in range(accum)]
                batch = _concat_micro_batches(micro)
            batch = {k: jax.device_put(v, sharding)
                     for k, v in batch.items()
                     if isinstance(v, (np.ndarray, jax.Array))}
            # lr follows the reference's per-micro-iteration schedule,
            # sampled at the first micro index of the fused step
            lr = self.lr_scheduler(epoch, i * accum)
            state, metrics = self.train_step(state, batch, lr)
            logger.update(loss=float(metrics["loss"]), lr=lr)
        self._train_state = state
        logger.synchronize_between_processes()
        return {k: f"{m.global_avg:.3f}" for k, m in logger.meters.items()}

    # ------------------------------------------------------------------
    # evaluation (reference :433-459, :787-824)
    # ------------------------------------------------------------------
    def evaluate(self, cur_epoch="best", skip_reload: bool = False
                 ) -> Dict[str, Any]:
        results = {}
        if not skip_reload and cur_epoch == "best":
            self._reload_best_model()
        for split in _get(self.run_cfg, "test_splits", ["test"]):
            if split in self.dataloaders:
                results[split] = self.eval_epoch(split)
        return results

    def eval_epoch(self, split: str):
        loader = self.dataloaders[split]
        self.task.before_evaluation(model=self.model,
                                    dataset=self.datasets)
        results = self.task.evaluation(self.model, loader)
        # model-size accounting the reference threads into the metric
        # report (vqa.py:135-137,163-164; set by train.py:365-406).
        # Computed once per runner: masks and base weights are frozen
        # during retraining (only LoRA factors train), so the counts
        # cannot change between eval epochs — no per-epoch device sweep.
        sizes = getattr(self, "_model_sizes", None)
        if sizes is None:
            sizes = {}
            variables = getattr(self.model, "variables", None)
            if isinstance(variables, dict) and "params" in variables:
                from vlm_compression_tpu.compression.peft_io import (
                    model_size_accounting,
                )

                sizes = model_size_accounting(variables)
            self._model_sizes = sizes
        return self.task.after_evaluation(
            val_result=results, split_name=split, epoch="eval",
            result_dir=os.path.join(self.output_dir, "result"), **sizes)

    # ------------------------------------------------------------------
    # checkpointing (orbax; reference :914-984)
    # ------------------------------------------------------------------
    def _ckpt_dir(self, tag):
        return os.path.abspath(
            os.path.join(self.output_dir, f"checkpoint_{tag}"))

    def _save_checkpoint(self, cur_epoch, is_best: bool = False):
        if jax.process_index() != 0:
            return
        import orbax.checkpoint as ocp

        state = self.train_state
        payload = {"lora": state.lora, "opt_state": state.opt_state,
                   "step": state.step, "masks": state.masks}
        path = self._ckpt_dir("best" if is_best else cur_epoch)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, payload, force=True)
        ckptr.wait_until_finished()
        with open(os.path.join(self.output_dir, "checkpoint_meta.json"),
                  "w") as f:
            epoch = cur_epoch if isinstance(cur_epoch, int) else -1
            json.dump({"epoch": epoch, "tag": str(cur_epoch),
                       "best": bool(is_best)}, f)
        logging.info("Saved checkpoint to %s", path)

    def _load_checkpoint_if_resume(self):
        path = _get(self.run_cfg, "resume_ckpt_path")
        if not path:
            return
        import orbax.checkpoint as ocp

        state = self.train_state
        template = {"lora": state.lora, "opt_state": state.opt_state,
                    "step": state.step, "masks": state.masks}
        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(path), template)
        self._train_state = state.replace(
            lora=restored["lora"], opt_state=restored["opt_state"],
            step=restored["step"], masks=restored["masks"])
        meta = os.path.join(os.path.dirname(os.path.abspath(path)),
                            "checkpoint_meta.json")
        if os.path.exists(meta):
            with open(meta) as f:
                self.start_epoch = json.load(f).get("epoch", 0) + 1
        logging.info("Resumed from %s (start_epoch=%d)", path,
                     self.start_epoch)

    def _reload_best_model(self):
        path = self._ckpt_dir("best")
        if not os.path.exists(path):
            return
        import orbax.checkpoint as ocp

        state = self.train_state
        template = {"lora": state.lora, "opt_state": state.opt_state,
                    "step": state.step, "masks": state.masks}
        restored = ocp.StandardCheckpointer().restore(path, template)
        self._train_state = state.replace(lora=restored["lora"],
                                          masks=restored["masks"])
        self.model.variables = {**self.model.variables,
                                "lora": restored["lora"],
                                "masks": restored["masks"]}

    # ------------------------------------------------------------------
    def log_stats(self, stats: Dict, split_name: str = "train"):
        if jax.process_index() != 0:
            return
        with open(os.path.join(self.output_dir, "log.txt"), "a") as f:
            f.write(json.dumps(
                {f"{split_name}_{k}": v for k, v in (stats or {}).items()})
                + "\n")
