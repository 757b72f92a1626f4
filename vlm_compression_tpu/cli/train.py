"""RESSA pipeline CLI: prune → retrain (SparseLoRA + KD) → evaluate → save.

Counterpart of the reference's ``train.py`` (:33-286 flags, :309-714 flow):

  python -m vlm_compression_tpu.cli.train --cfg-path cfg.yaml \
      --prune --pruning_method blipt5_wanda_pruner \
      --t5_prune_spec 24-0.5-1.0-1.0 --vit_prune_spec 39-0.5-1.0-1.0 \
      --train --sparse --tune_opt LVQ --lora_r_l 8 --lora_r_v 4 --lora_r_q 2 \
      --kl_weight 0.1 --T 1 --evaluate --save_pruned_model

Differences by design: models consume token ids (tokenization in the
collator), pruning is functional over variable pytrees, and the "three
runners" of the reference collapse into one runner + explicit phases.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time

import jax
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="RESSA prune/retrain/evaluate")
    p.add_argument("--cfg-path", default=None)
    # separate configs for the prune calibration loader and the eval stage
    # (reference train.py builds three Runner configs: train.py:538 swaps in
    # prune_cfg_path, :651 eval_cfg_path)
    p.add_argument("--prune-cfg-path", default=None)
    p.add_argument("--eval-cfg-path", default=None)
    p.add_argument("--options", nargs="+", default=None)
    p.add_argument("--job_id", default=None)

    # phases
    p.add_argument("--prune", action="store_true")
    p.add_argument("--train", action="store_true")
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--save_pruned_model", action="store_true")

    # pruning (reference train.py:33-286)
    p.add_argument("--pruning_method", default="blipt5_wanda_pruner")
    p.add_argument("--prune_spec", default=None)
    p.add_argument("--t5_prune_spec", default=None)
    p.add_argument("--vit_prune_spec", default=None)
    p.add_argument("--prune_n", type=int, default=0)
    p.add_argument("--prune_m", type=int, default=0)
    p.add_argument("--num_data_for_prune", type=int, default=128)
    p.add_argument("--prune_batch_size", type=int, default=1)
    p.add_argument("--sparsity_ratio_granularity", default=None)
    p.add_argument("--score_method", default="obd_avg")
    p.add_argument("--num_data_first_stage", type=int, default=32)
    p.add_argument("--num_noise", type=int, default=1)
    p.add_argument("--noise_eps", type=float, default=1e-3)
    p.add_argument("--max_sparsity_per_layer", type=float, default=0.8)
    p.add_argument("--owl_m", type=float, default=5.0,
                   help="OWL outlier threshold for score_method owl_*")
    p.add_argument("--softmask_steps", type=int, default=48,
                   help="annealing steps for *_softmask_pruner "
                        "(beyond-reference trainable n:m masks)")
    p.add_argument("--softmask_lr", type=float, default=0.1)
    p.add_argument("--hybrid_tile", type=int, default=0,
                   help="with --prune_n/m: PATCH-style tile-level hybrid "
                        "masks — the most salient (t x t) weight tiles "
                        "stay dense, the rest take n:m (wanda/ria only)")
    p.add_argument("--gptq_bits", type=int, default=4,
                   help="*_gptq_pruner grid bits (beyond-reference "
                        "calibration-aware quantization; keep-ratio 1.0 "
                        "= quantize-only, else joint sparse+quant)")
    p.add_argument("--gptq_group", type=int, default=128,
                   help="*_gptq_pruner scale group size (0 = per-tensor "
                        "row grids)")
    p.add_argument("--gptq_asym", action="store_true",
                   help="asymmetric GPTQ grids (default symmetric)")
    p.add_argument("--gptq_actorder", action="store_true",
                   help="GPTQ desc_act column ordering")
    p.add_argument("--gptq_awq", action="store_true",
                   help="AWQ per-channel scale search before GPTQ "
                        "(protects salient activation channels)")
    p.add_argument("--sparsity_dict", default=None)
    p.add_argument("--t5_model_prefix", default="t5_model")
    p.add_argument("--vit_model_prefix", default="visual_encoder")
    p.add_argument("--initial_method", default="wanda")   # DSnoT
    p.add_argument("--max_cycle_time", type=int, default=50)
    p.add_argument("--update_threshold", type=float, default=0.1)
    p.add_argument("--pow_of_var_regrowing", type=float, default=1.0)

    # SparseLoRA (train.py:410-486)
    p.add_argument("--tune_opt", default="LVQ")
    p.add_argument("--lora_r_l", type=int, default=8)
    p.add_argument("--lora_r_v", type=int, default=4)
    p.add_argument("--lora_r_q", type=int, default=2)
    p.add_argument("--lora_alpha", type=float, default=16.0)
    p.add_argument("--sparse", action="store_true",
                   help="SparseLoRA merge (mask over W+BA); off = plain "
                        "LoRA ablation that densifies")

    # KD (image_text_retrain.py:25-26, train.py:589-590)
    p.add_argument("--kl_weight", type=float, default=0.01)
    p.add_argument("--T", type=float, default=2.0)
    p.add_argument("--max_train_samples", type=int, default=None)

    p.add_argument("--pack_masks", action="store_true",
                   help="bit-pack keep-masks after prune/merge (2 bits "
                        "per weight, 4x less HBM than bool masks); the "
                        "masked forward expands words per-tile in VMEM "
                        "(ops/bitmask.py)")
    p.add_argument("--pack_masks_group", type=int, default=128,
                   choices=(128, 256),
                   help="pack layout: 128 = 2 bits/weight, 256 = 1 "
                        "bit/weight (all 32 bits per word)")
    p.add_argument("--model_size", default=None)
    p.add_argument("--tiny", action="store_true",
                   help="tiny towers (tests / smoke runs)")
    p.add_argument("--autotune", action="store_true",
                   help="tune the masked-matmul AND fused sparse-LoRA "
                        "dispatch on-chip before retraining (cached at "
                        "~/.cache/vct/autotune.json)")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv=None):
    from vlm_compression_tpu.common.config import Config
    from vlm_compression_tpu.models.model_zoo import (
        default_config_path)
    from vlm_compression_tpu.compression import load_pruner
    from vlm_compression_tpu.compression.pruners.base import FlaxModel
    from vlm_compression_tpu.datasets.tokenization import load_tokenizer
    from vlm_compression_tpu.models.factory import build_model
    from vlm_compression_tpu.runners.runner_base import RunnerBase, _get
    from vlm_compression_tpu.tasks import setup_task
    from vlm_compression_tpu.tasks.preparers import (
        make_t5_batch_preparer,
        make_vicuna_batch_preparer,
    )
    from vlm_compression_tpu.tasks.retrain import (
        apply_masks_to_params,
        merge_lora_into_params,
    )

    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    np.random.seed(args.seed)

    cfg = Config(cfg_path=args.cfg_path, options=args.options,
                 defaults=default_config_path)
    # materialize sections so CLI mutations stick (the properties return
    # fresh empty nodes for missing sections)
    for section in ("model", "datasets", "run"):
        if section not in cfg.config:
            cfg.config[section] = {}
    run_cfg = cfg.run_cfg
    model_cfg = cfg.model_cfg
    if args.model_size:
        model_cfg["model_type"] = args.model_size
    if args.tiny:
        model_cfg["tiny"] = True
    model_cfg["tune_opt"] = args.tune_opt
    model_cfg["lora_r_l"] = args.lora_r_l
    model_cfg["lora_r_v"] = args.lora_r_v
    model_cfg["lora_r_q"] = args.lora_r_q
    model_cfg["lora_alpha"] = args.lora_alpha

    from vlm_compression_tpu.common.profiling import PhaseTimer

    job_id = args.job_id or time.strftime("%Y%m%d%H%M%S")
    output_dir = _get(run_cfg, "output_dir", f"output/{job_id}")
    os.makedirs(output_dir, exist_ok=True)
    stats = {"job_id": job_id}
    timer = PhaseTimer()

    task = setup_task(cfg)
    if args.kl_weight is not None:
        task.kl_weight = args.kl_weight
        task.T = args.T

    module, variables = build_model(model_cfg, seed=args.seed)
    model = FlaxModel(module, variables)
    arch = _get(model_cfg, "arch", "blip2_t5_instruct")

    tok = load_tokenizer(_get(model_cfg, "tokenizer_path"),
                         vocab_size=(module.cfg.t5.vocab_size
                                     if hasattr(module.cfg, "t5")
                                     else module.cfg.llm.vocab_size))
    qtok = load_tokenizer(_get(model_cfg, "qformer_tokenizer_path"),
                          vocab_size=module.cfg.qformer.vocab_size)
    if arch == "blip2_t5_instruct":
        prepare = make_t5_batch_preparer(
            tok, qtok, module.cfg.max_txt_len, module.cfg.max_output_txt_len)
    else:
        prepare = make_vicuna_batch_preparer(
            tok, qtok, module.cfg.max_txt_len, module.cfg.max_output_txt_len)

    datasets = task.build_datasets(cfg, max_train_samples=args.max_train_samples)
    runner = RunnerBase(cfg, task, model, datasets, job_id=job_id,
                        prepare_batch=prepare)

    sparsity_dict_loaded = None
    if args.sparsity_dict:
        import yaml

        with open(args.sparsity_dict) as f:
            sparsity_dict_loaded = yaml.safe_load(f)

    if args.prune:
        t0 = time.perf_counter()
        timer_ctx = timer.phase("prune")
        timer_ctx.__enter__()
        # calibration data may come from its own config (reference
        # train.py:538: the prune runner is built on prune_cfg_path, forced
        # non-distributed — here the sweep is one SPMD program either way)
        prune_runner = runner
        if args.prune_cfg_path:
            pcfg = Config(cfg_path=args.prune_cfg_path, options=args.options,
                          defaults=default_config_path)
            ptask = setup_task(pcfg)
            pdatasets = ptask.build_datasets(pcfg)
            prune_runner = RunnerBase(pcfg, ptask, model, pdatasets,
                                      job_id=job_id, prepare_batch=prepare)
        batches = prune_runner.get_dataloader_for_importance_computation(
            num_data=args.num_data_for_prune,
            batch_size=args.prune_batch_size)
        import jax.numpy as jnp

        jbatches = [
            {k: jnp.asarray(v) for k, v in b.items()
             if isinstance(v, np.ndarray) and v.dtype != object}
            for b in batches]
        pruner = load_pruner(
            args.pruning_method, model, jbatches,
            prune_spec=args.prune_spec,
            t5_prune_spec=args.t5_prune_spec,
            vit_prune_spec=args.vit_prune_spec,
            prune_n=args.prune_n, prune_m=args.prune_m,
            num_samples=args.num_data_for_prune,
            sparsity_ratio_granularity=args.sparsity_ratio_granularity,
            score_method=args.score_method,
            num_data_first_stage=args.num_data_first_stage,
            num_noise=args.num_noise, noise_eps=args.noise_eps,
            max_sparsity_per_layer=args.max_sparsity_per_layer,
            owl_m=args.owl_m,
            hybrid_tile=args.hybrid_tile,
            sparsity_dict=sparsity_dict_loaded,
            t5_model_prefix=args.t5_model_prefix,
            vit_model_prefix=args.vit_model_prefix,
            initial_method=args.initial_method,
            max_cycle_time=args.max_cycle_time,
            update_threshold=args.update_threshold,
            pow_of_var_regrowing=args.pow_of_var_regrowing,
            softmask_steps=args.softmask_steps,
            softmask_lr=args.softmask_lr,
            gptq_bits=args.gptq_bits, gptq_group=args.gptq_group,
            gptq_sym=not args.gptq_asym,
            gptq_actorder=args.gptq_actorder, gptq_awq=args.gptq_awq)
        model, sparsity_mapping = pruner.prune(lora_model=args.train)
        timer_ctx.__exit__(None, None, None)
        runner.model = model
        stats["prune_seconds"] = round(time.perf_counter() - t0, 2)
        if sparsity_mapping:
            import yaml

            with open(os.path.join(output_dir,
                                   f"sparsity_dict_{job_id}.yaml"),
                      "w") as f:
                yaml.safe_dump(sparsity_mapping, f)
        logging.info("prune done in %.1fs", stats["prune_seconds"])

    if args.train:
        if args.autotune:
            import jax as _jax

            if _jax.default_backend() == "tpu":
                from vlm_compression_tpu.ops.autotune import (
                    autotune_attention,
                    autotune_masked_matmul,
                    autotune_sparse_lora,
                )

                autotune_masked_matmul(verbose=False)
                # the SparseLoRA forward is the hot op during KD retraining
                autotune_sparse_lora(verbose=False)
                autotune_attention(verbose=False)
            else:
                logging.info("--autotune skipped: not on a TPU backend")
        t0 = time.perf_counter()
        with timer.phase("retrain"):
            runner._train_state = None  # rebuild on (possibly pruned) model
            runner.train(prune_retrain=True)
        # merge LoRA into base weights; sparse merge keeps sparsity
        # (train.py:626-637 + lora.py:384-394)
        v = runner.model.variables
        merged = merge_lora_into_params(
            v["params"], v.get("masks", {}), v.get("lora", {}),
            sparse=args.sparse, alpha=args.lora_alpha)
        if args.sparse:
            # re-assert W[~mask] = 0 (reference train.py:634-637)
            merged = apply_masks_to_params(merged, v.get("masks", {}))
        runner.model.variables = {
            "params": merged, "masks": v.get("masks", {})}
        stats["train_seconds"] = round(time.perf_counter() - t0, 2)

    if args.pack_masks and runner.model.variables.get("masks"):
        from vlm_compression_tpu.ops.bitmask import pack_masks_tree

        v = dict(runner.model.variables)
        v["masks"] = pack_masks_tree(v["masks"],
                                     group=args.pack_masks_group)
        runner.model.variables = v
        logging.info("masks bit-packed (%d bits/weight)",
                     256 // args.pack_masks_group)

    if args.evaluate:
        t0 = time.perf_counter()
        # evaluation may use its own config tree (reference train.py:651)
        if args.eval_cfg_path:
            ecfg = Config(cfg_path=args.eval_cfg_path, options=args.options,
                          defaults=default_config_path)
            etask = setup_task(ecfg)
            edatasets = etask.build_datasets(ecfg)
            runner = RunnerBase(ecfg, etask, runner.model, edatasets,
                                job_id=job_id, prepare_batch=prepare)
        results = runner.evaluate(skip_reload=True)
        stats["eval_seconds"] = round(time.perf_counter() - t0, 2)
        stats["eval_results"] = results

    if args.save_pruned_model:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(output_dir,
                                            f"pruned_{job_id}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, runner.model.variables, force=True)
        ckptr.wait_until_finished()
        stats["pruned_checkpoint"] = path

    # reference train.py:695-707 artifact: per-phase wall-clock + memory
    timer.dump(output_dir, job_id,
               extra={k: v for k, v in stats.items()
                      if isinstance(v, (int, float, str))})
    with open(os.path.join(output_dir,
                           f"training_statistics_{job_id}.json"), "w") as f:
        json.dump(stats, f, indent=2, default=str)
    logging.info("stats: %s", {k: v for k, v in stats.items()
                               if k != "eval_results"})
    return stats


if __name__ == "__main__":
    main()
