"""Evaluation CLIs.

``main_prune_eval`` mirrors ``evaluate_old.py:199-392`` (optionally prune
without LoRA, save the pruned model + stats, then run the eval suite);
``main_eval_checkpoint`` mirrors ``evaluate_new.py:229-262`` (evaluate a
saved checkpoint, dropping ``lora``/``mask`` entries so the merged sparse
weights stand alone).

  python -m vlm_compression_tpu.cli.evaluate --cfg-path eval.yaml \
      --pruned_checkpoint output/.../pruned_job [--strip_lora_masks]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="evaluate (optionally prune)")
    p.add_argument("--cfg-path", default=None)
    p.add_argument("--options", nargs="+", default=None)
    p.add_argument("--job_id", default=None)
    p.add_argument("--prune", action="store_true")
    p.add_argument("--pruning_method", default="blipt5_wanda_pruner")
    p.add_argument("--t5_prune_spec", default=None)
    p.add_argument("--vit_prune_spec", default=None)
    p.add_argument("--prune_n", type=int, default=0)
    p.add_argument("--prune_m", type=int, default=0)
    p.add_argument("--num_data_for_prune", type=int, default=128)
    p.add_argument("--prune_batch_size", type=int, default=1)
    p.add_argument("--pruned_checkpoint", default=None)
    # per-tower pruned checkpoints (reference evaluate_old loads ViT/T5
    # state dicts separately, interpolating ViT position embeddings when
    # image sizes differ)
    p.add_argument("--vit_pruned_checkpoint", default=None)
    p.add_argument("--t5_pruned_checkpoint", default=None)
    p.add_argument("--strip_lora_masks", action="store_true",
                   help="drop lora/mask entries from the restored "
                        "checkpoint (evaluate_new.py:229-262)")
    # sparsity-allocator knobs (evaluate_old passes the same surface as
    # train.py)
    p.add_argument("--sparsity_ratio_granularity", default=None)
    p.add_argument("--score_method", default="obd_avg")
    p.add_argument("--num_data_first_stage", type=int, default=32)
    p.add_argument("--num_noise", type=int, default=1)
    p.add_argument("--max_sparsity_per_layer", type=float, default=0.8)
    p.add_argument("--owl_m", type=float, default=5.0,
                   help="OWL outlier threshold for score_method owl_*")
    p.add_argument("--sparsity_dict", default=None)
    p.add_argument("--t5_model_prefix", default="t5_model")
    p.add_argument("--vit_model_prefix", default="visual_encoder")
    p.add_argument("--power", type=int, default=2)
    # DSnoT knobs
    p.add_argument("--initial_method", default="wanda")
    p.add_argument("--without_DSnoT", dest="without_dsnot",
                   action="store_true")
    # global-pruner family knobs (blipt5_{mag,rand,aobd,mezo}_pruner)
    p.add_argument("--is_global", action="store_true")
    p.add_argument("--prune_per_model", action="store_true")
    p.add_argument("--iteration", type=int, default=1)
    p.add_argument("--save_pruned_model", action="store_true")
    p.add_argument("--quantize_int8", action="store_true",
                   help="per-output-channel absmax int8 weights for the "
                        "eval (TPU-native counterpart of the reference's "
                        "bitsandbytes load_in_8bit path)")
    p.add_argument("--w8a8", action="store_true",
                   help="with --quantize_int8: also quantize activations "
                        "per-row at runtime (int8xint8 on the MXU, "
                        "measured 7.8x faster than bf16 at 2048^3)")
    p.add_argument("--autotune", action="store_true",
                   help="tune the masked-matmul dispatch for this "
                        "host's chip before evaluating (per-shape "
                        "XLA-vs-Pallas decisions, cached at "
                        "~/.cache/vct/autotune.json)")
    p.add_argument("--int8_outliers", type=int, default=0,
                   help="with --w8a8: keep the k highest-magnitude "
                        "activation feature columns in float (LLM.int8 "
                        "outlier decomposition, static-k TPU variant; "
                        "try 16-64 for towers with emergent outliers)")
    p.add_argument("--quantize_int4", action="store_true",
                   help="grouped absmax int4 weights (nibble-packed, "
                        "4 bits/weight at rest — beyond-reference; "
                        "mutually exclusive with --quantize_int8)")
    p.add_argument("--int4_group", type=int, default=128,
                   help="input rows per int4 scale group")
    p.add_argument("--speculative_gamma", type=int, default=0,
                   help="serve with speculative decoding: the masked "
                        "student drafts k tokens, the DENSE teacher "
                        "verifies in one chunked pass (answers = the "
                        "teacher's greedy decode; overrides num_beams)")
    p.add_argument("--kv_cache_int8", action="store_true",
                   help="store decode KV caches as int8 codes + absmax "
                        "scales (half the persistent decode memory)")
    p.add_argument("--kv_cache_per_row", action="store_true",
                   help="per-row decode cache frontiers: speculative "
                        "decoding commits each row's own accepted "
                        "prefix instead of the batch minimum")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--model_size", default=None)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def strip_lora_masks(variables: dict) -> dict:
    """Keep only params (+ all-True masks implied): the reference filters
    state-dict keys containing 'lora' or 'mask' when loading a RESSA
    checkpoint for plain evaluation."""
    return {"params": variables["params"]}


def _graft_tower_checkpoints(module, variables, vit_path=None, t5_path=None,
                             vit_prefix="visual_encoder",
                             t5_prefix="t5_model"):
    """Load per-tower pruned checkpoints into the composite model
    (reference train.py:369-400 / evaluate_old: tower state dicts loaded
    with prefix rewriting; ViT position embeddings interpolated when the
    checkpoint was trained at a different image size)."""
    import orbax.checkpoint as ocp

    from vlm_compression_tpu.models.eva_vit import interpolate_pos_embed

    ck = ocp.StandardCheckpointer()

    def sub(tree, prefix):
        # accept either a whole-model tree (graft the prefix subtree) or a
        # bare tower tree
        node = tree.get("params", tree)
        return node.get(prefix, node)

    params = dict(variables["params"])
    if vit_path:
        loaded = sub(ck.restore(os.path.abspath(vit_path)), vit_prefix)
        pe = loaded.get("pos_embed")
        want = params[vit_prefix]["pos_embed"]
        if pe is not None and pe.shape != want.shape:
            loaded = dict(loaded, pos_embed=interpolate_pos_embed(
                pe, want.shape[1] - 1))
        params[vit_prefix] = loaded
    if t5_path:
        params[t5_prefix] = sub(ck.restore(os.path.abspath(t5_path)),
                                t5_prefix)
    variables["params"] = params
    return variables


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

    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    cfg = Config(cfg_path=args.cfg_path, options=args.options,
                 defaults=default_config_path)
    for section in ("model", "datasets", "run"):
        if section not in cfg.config:
            cfg.config[section] = {}
    model_cfg = cfg.model_cfg
    if args.tiny:
        model_cfg["tiny"] = True
    if args.model_size:
        model_cfg["model_type"] = args.model_size
    if args.kv_cache_int8:
        model_cfg["kv_cache_int8"] = True
    if args.kv_cache_per_row:
        model_cfg["kv_cache_per_row"] = True
    if args.speculative_gamma:
        cfg.run_cfg["speculative_gamma"] = args.speculative_gamma

    job_id = args.job_id or time.strftime("%Y%m%d%H%M%S")
    output_dir = _get(cfg.run_cfg, "output_dir", f"output/{job_id}")
    os.makedirs(output_dir, exist_ok=True)

    task = setup_task(cfg)
    pretrained = None
    if args.pruned_checkpoint:
        import orbax.checkpoint as ocp

        pretrained = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.pruned_checkpoint))
        if args.strip_lora_masks:
            pretrained = strip_lora_masks(pretrained)
    module, variables = build_model(model_cfg, seed=args.seed,
                                    pretrained_variables=pretrained)
    if args.vit_pruned_checkpoint or args.t5_pruned_checkpoint:
        variables = _graft_tower_checkpoints(
            module, dict(variables),
            vit_path=args.vit_pruned_checkpoint,
            t5_path=args.t5_pruned_checkpoint,
            vit_prefix=args.vit_model_prefix,
            t5_prefix=args.t5_model_prefix)
    model = FlaxModel(module, variables)
    arch = _get(model_cfg, "arch", "blip2_t5_instruct")

    vocab = None          # language-tower vocab (zoo towers vary)
    for attr in ("t5", "llm", "med", "text", "gpt"):
        sub = getattr(module.cfg, attr, None)
        if sub is not None and hasattr(sub, "vocab_size"):
            vocab = sub.vocab_size
            break
    tok = load_tokenizer(_get(model_cfg, "tokenizer_path"),
                         vocab_size=vocab)
    qtok = (load_tokenizer(_get(model_cfg, "qformer_tokenizer_path"),
                           vocab_size=module.cfg.qformer.vocab_size)
            if hasattr(module.cfg, "qformer") else tok)
    # generation-driven tasks need tokenizers for decode
    if hasattr(task, "tokenizer"):
        task.tokenizer = tok
        task.qformer_tokenizer = qtok
    if arch == "blip2_t5_instruct":
        prepare = make_t5_batch_preparer(tok, qtok)
    elif arch == "blip2_vicuna_instruct":
        prepare = make_vicuna_batch_preparer(tok, qtok)
    else:
        prepare = None    # legacy-zoo tasks tokenize inside valid_step

    datasets = task.build_datasets(cfg)
    runner = RunnerBase(cfg, task, model, datasets, job_id=job_id,
                        prepare_batch=prepare)
    stats = {"job_id": job_id}

    if args.prune:
        import jax
        import jax.numpy as jnp
        import numpy as np

        t0 = time.perf_counter()
        batches = runner.get_dataloader_for_importance_computation(
            num_data=args.num_data_for_prune, power=args.power,
            batch_size=args.prune_batch_size)
        jbatches = [
            {k: jnp.asarray(v) for k, v in b.items()
             if isinstance(v, np.ndarray) and v.dtype != object}
            for b in batches]
        sparsity_dict_loaded = None
        if args.sparsity_dict:
            import yaml

            with open(args.sparsity_dict) as f:
                sparsity_dict_loaded = yaml.safe_load(f)
        pruner = load_pruner(
            args.pruning_method, model, jbatches,
            t5_prune_spec=args.t5_prune_spec,
            vit_prune_spec=args.vit_prune_spec,
            prune_n=args.prune_n, prune_m=args.prune_m,
            num_samples=args.num_data_for_prune,
            sparsity_ratio_granularity=args.sparsity_ratio_granularity,
            score_method=args.score_method,
            num_data_first_stage=args.num_data_first_stage,
            num_noise=args.num_noise,
            max_sparsity_per_layer=args.max_sparsity_per_layer,
            owl_m=args.owl_m,
            sparsity_dict=sparsity_dict_loaded,
            t5_model_prefix=args.t5_model_prefix,
            vit_model_prefix=args.vit_model_prefix,
            initial_method=args.initial_method,
            without_dsnot=args.without_dsnot,
            is_global=args.is_global,
            prune_per_model=args.prune_per_model,
            iteration=args.iteration)
        # evaluate_old.py:329 prunes WITHOUT the LoRA wrapper: weights
        # physically zeroed
        model, _ = pruner.prune(lora_model=False)
        runner.model = model
        stats["prune_seconds"] = round(time.perf_counter() - t0, 2)
        if args.save_pruned_model:
            import orbax.checkpoint as ocp

            path = os.path.abspath(
                os.path.join(output_dir, f"pruned_{job_id}"))
            ck = ocp.StandardCheckpointer()
            ck.save(path, model.variables, force=True)
            ck.wait_until_finished()
            stats["pruned_checkpoint"] = path

    if args.quantize_int8:
        from vlm_compression_tpu.ops.quant import (
            quantize_params_tree,
            use_dynamic_int8,
        )

        v = dict(runner.model.variables)
        v["params"] = quantize_params_tree(v["params"])
        runner.model.variables = v
        if args.w8a8:
            use_dynamic_int8(True)
            if args.int8_outliers:
                from vlm_compression_tpu.ops.quant import set_int8_outliers

                set_int8_outliers(args.int8_outliers)
        logging.info(
            "weights quantized to int8%s%s",
            " + W8A8 dynamic activations" if args.w8a8 else "",
            f" + {args.int8_outliers} outlier columns"
            if args.w8a8 and args.int8_outliers else "")

    if args.quantize_int4:
        if args.quantize_int8:
            raise SystemExit("--quantize_int4 and --quantize_int8 are "
                             "mutually exclusive")
        from vlm_compression_tpu.ops.quant import quantize_params_tree_int4

        v = dict(runner.model.variables)
        v["params"] = quantize_params_tree_int4(v["params"],
                                                group=args.int4_group)
        runner.model.variables = v
        logging.info("weights quantized to int4 (group=%d, nibble-packed)",
                     args.int4_group)

    if args.autotune:
        import jax as _jax

        from vlm_compression_tpu.ops.autotune import (
            autotune_attention, autotune_masked_matmul)

        if _jax.default_backend() == "tpu":
            autotune_masked_matmul(verbose=False)
            autotune_attention(verbose=False)
        else:
            logging.info("--autotune skipped: not on a TPU backend")

    results = runner.evaluate(skip_reload=True)
    stats["eval_results"] = results
    with open(os.path.join(output_dir, f"eval_stats_{job_id}.json"),
              "w") as f:
        json.dump(stats, f, indent=2, default=str)
    return stats


if __name__ == "__main__":
    main()
