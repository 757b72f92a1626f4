"""WoodFisher / distillation-merge evaluation CLI.

Counterpart of the reference's experimental ``evaluate.py`` (433 LoC, the
"WoodFisher/fisher-inverse variant", SURVEY §2.8).  Note the upstream
script is NOT runnable: it references ``WoodFisher``,
``vit_modify_with_weight_init``, ``t5_modify_with_weight_init`` and
``qformer_pruning`` which are defined nowhere in the snapshot.  This CLI
implements the surface those calls describe:

  * importance scoring: ``--get_derivative_info`` (diagonal Fisher,
    evaluate.py:277-301), ``--get_activation_info`` (:305-323), or
    WoodFisher block Fisher-inverse when ``--distillation_init`` contains
    ``woodfisher`` (:258-276) — scores split per tower by the
    ``visual_encoder``/``t5_model`` prefixes;
  * ``unstrct`` distillation inits → unstructured zeroing of the
    lowest-importance weights at ``--distill_merge_ratio``;
  * ``--distilled_block_ids`` → block merging (sum/mean, optional
    ``--distilled_block_weights``, ``--permute_before_merge``,
    ``--modules_to_merge``) producing a shallower tower.  A ``|`` in the
    spec splits it into ``vit_ids|t5_ids``; otherwise both towers use the
    same grouping (clipped to each tower's depth);
  * artifact dumps mirroring :360-404: ``--save_pruned_indices``,
    ``--save_importance_measure``, ``--save_final_activations`` (npz
    instead of .pth), each exiting after the save;
  * original/compressed parameter accounting surfaced to the eval metrics
    (evaluate.py:406-427) and a final ``runner.evaluate(skip_reload=True)``.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="woodfisher/distill evaluate")
    p.add_argument("--cfg-path", default=None)
    p.add_argument("--options", nargs="+", default=None)
    p.add_argument("--job_id", default=None)
    # distillation / merging (reference evaluate.py:40-96)
    p.add_argument("--side_pretrained_weight", default=None)
    p.add_argument("--vit_side_pretrained_weight", default=None)
    p.add_argument("--distillation_init", default="sum")
    p.add_argument("--distilled_block_ids", default=None)
    p.add_argument("--distilled_block_weights", default=None)
    p.add_argument("--modules_to_merge", default=".*")
    p.add_argument("--permute_before_merge", action="store_true")
    p.add_argument("--permute_on_block_before_merge", action="store_true")
    p.add_argument("--vit_ffn_ratio", type=float, default=1.0)
    p.add_argument("--distilled_merge_ratio", type=float, default=0.5)
    p.add_argument("--distill_merge_ratio", type=float, default=0.5)
    p.add_argument("--exact", action="store_true")
    p.add_argument("--normalization", action="store_true")
    p.add_argument("--metric", default="dot")
    p.add_argument("--to_one", action="store_true")
    p.add_argument("--importance", action="store_true")
    # scoring data (reference :135-160)
    p.add_argument("--num_data", type=int, default=64)
    p.add_argument("--power", type=int, default=2)
    p.add_argument("--num_logits", type=int, default=1)
    p.add_argument("--get_derivative_info", action="store_true")
    p.add_argument("--get_activation_info", action="store_true")
    p.add_argument("--use_input_activation", action="store_true")
    p.add_argument("--vision_weight", type=float, default=0.0)
    # artifacts (reference :160-190)
    p.add_argument("--save_pruned_indices", action="store_true")
    p.add_argument("--vit_pruned_indices", default=None)
    p.add_argument("--t5_pruned_indices", default=None)
    p.add_argument("--save_importance_measure", action="store_true")
    p.add_argument("--vit_importance_measure", default=None)
    p.add_argument("--t5_importance_measure", default=None)
    p.add_argument("--save_final_activations", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def _split_by_tower(scores):
    vit = {p[1:]: s for p, s in scores.items() if p[0] == "visual_encoder"}
    t5 = {p[1:]: s for p, s in scores.items() if p[0] == "t5_model"}
    return vit, t5


def _merge_spec_for(spec: str, tower: str):
    if spec is None:
        return None
    if "|" in spec:
        vit_spec, t5_spec = spec.split("|", 1)
        return vit_spec if tower == "vit" else t5_spec
    return spec


def _clip_groups(groups, depth):
    out = []
    for g in groups:
        ids = [i for i in g if 0 <= i < depth]
        if ids:
            out.append(ids)
    return out


def main(argv=None):
    import jax
    import numpy as np

    from vlm_compression_tpu.common.config import Config
    from vlm_compression_tpu.models.model_zoo import (
        default_config_path)
    from vlm_compression_tpu.compression.derivatives import (
        convert_activation_to_importance,
        get_activations,
        get_data_derivative,
    )
    from vlm_compression_tpu.compression.distill_merge import (
        count_nonzero,
        count_params,
        merge_tower_blocks,
        parse_block_ids,
        parse_block_weights,
        prune_by_importance,
    )
    from vlm_compression_tpu.compression.pruners.base import FlaxModel
    from vlm_compression_tpu.compression.woodfisher import WoodFisher
    from vlm_compression_tpu.datasets.tokenization import load_tokenizer
    from vlm_compression_tpu.models.factory import build_model
    from vlm_compression_tpu.runners.runner_base import RunnerBase, _get
    from vlm_compression_tpu.tasks import setup_task
    from vlm_compression_tpu.tasks.preparers import make_t5_batch_preparer

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
    job_id = args.job_id or time.strftime("%Y%m%d%H%M%S")
    output_dir = _get(cfg.run_cfg, "output_dir", f"output/{job_id}")
    os.makedirs(output_dir, exist_ok=True)

    task = setup_task(cfg)
    module, variables = build_model(model_cfg, seed=args.seed)
    model = FlaxModel(module, variables)
    tok = load_tokenizer(_get(model_cfg, "tokenizer_path"),
                         vocab_size=module.cfg.t5.vocab_size)
    qtok = load_tokenizer(_get(model_cfg, "qformer_tokenizer_path"),
                          vocab_size=module.cfg.qformer.vocab_size)
    if hasattr(task, "tokenizer"):
        task.tokenizer = tok
        task.qformer_tokenizer = qtok
    prepare = make_t5_batch_preparer(tok, qtok)
    datasets = task.build_datasets(cfg)
    runner = RunnerBase(cfg, task, model, datasets, job_id=job_id,
                        prepare_batch=prepare)

    orig_total_size = count_params(variables["params"])

    # ---- importance scores (evaluate.py:250-327) -------------------------
    vit_scores = t5_scores = None
    init = args.distillation_init or ""
    if "woodfisher" in init and args.get_derivative_info:
        batches = runner.get_dataloader_for_importance_computation(
            num_data=args.num_data, power=args.power, batch_size=1)
        wf = WoodFisher(model, batches, num_samples=args.num_data,
                        fisher_damp=1e-3, fisher_parts=5,
                        include=lambda p: p[0] in ("visual_encoder",
                                                   "t5_model"))
        scores = wf.compute_fisher_inv_and_importance_score()
        vit_scores, t5_scores = _split_by_tower(scores)
    elif args.get_derivative_info:
        batches = runner.get_dataloader_for_importance_computation(
            num_data=args.num_data, power=args.power, batch_size=1)
        tree = get_data_derivative(module, dict(model.variables), batches,
                                   power=args.power)
        flat = {
            tuple(str(k.key) for k in kp): leaf
            for kp, leaf in jax.tree_util.tree_leaves_with_path(tree)}
        vit_scores, t5_scores = _split_by_tower(flat)
    elif args.get_activation_info:
        batches = runner.get_dataloader_for_importance_computation(
            num_data=args.num_data, power=args.power, batch_size=1)
        acts = get_activations(module, dict(model.variables), batches)
        imp = convert_activation_to_importance(
            acts, square=not args.use_input_activation)
        vit_scores = {p[1:]: s for p, s in imp.items()
                      if p and p[0] == "visual_encoder"}
        t5_scores = {p[1:]: s for p, s in imp.items()
                     if p and p[0] == "t5_model"}

    # loadable precomputed measures (evaluate.py:333-355)
    if args.vit_importance_measure:
        vit_scores = {tuple(k.split("/")): v for k, v in
                      np.load(args.vit_importance_measure).items()}
    if args.t5_importance_measure:
        t5_scores = {tuple(k.split("/")): v for k, v in
                     np.load(args.t5_importance_measure).items()}

    # ---- tower modification ---------------------------------------------
    params = dict(variables["params"])
    pruned_indices = {"vit": None, "t5": None}
    new_cfg = module.cfg
    if "unstrct" in init and vit_scores is not None:
        keep = 1.0 - args.distill_merge_ratio
        new_vit, vit_idx = prune_by_importance(params["visual_encoder"],
                                               vit_scores, keep_ratio=keep)
        new_t5, t5_idx = prune_by_importance(params["t5_model"],
                                             t5_scores, keep_ratio=keep)
        params["visual_encoder"], params["t5_model"] = new_vit, new_t5
        pruned_indices = {"vit": vit_idx, "t5": t5_idx}
    elif args.distilled_block_ids:
        permute = (args.permute_before_merge
                   or args.permute_on_block_before_merge)
        vit_groups = _clip_groups(
            parse_block_ids(_merge_spec_for(args.distilled_block_ids, "vit")),
            module.cfg.vit.depth)
        params["visual_encoder"] = merge_tower_blocks(
            params["visual_encoder"], vit_groups,
            parse_block_weights(
                _merge_spec_for(args.distilled_block_weights, "vit"),
                vit_groups),
            modules_to_merge=args.modules_to_merge, permute=permute)
        t5_spec = _merge_spec_for(args.distilled_block_ids, "t5")
        enc = dict(params["t5_model"]["encoder"])
        dec = dict(params["t5_model"]["decoder"])
        enc_groups = _clip_groups(parse_block_ids(t5_spec),
                                  module.cfg.t5.num_layers)
        dec_groups = _clip_groups(parse_block_ids(t5_spec),
                                  module.cfg.t5.num_decoder_layers)
        wts = parse_block_weights(
            _merge_spec_for(args.distilled_block_weights, "t5"), enc_groups)
        enc = merge_tower_blocks(enc, enc_groups, wts,
                                 modules_to_merge=args.modules_to_merge,
                                 permute=permute)
        dec = merge_tower_blocks(dec, dec_groups, None,
                                 modules_to_merge=args.modules_to_merge,
                                 permute=permute)
        t5p = dict(params["t5_model"])
        t5p["encoder"], t5p["decoder"] = enc, dec
        params["t5_model"] = t5p
        new_cfg = dataclasses.replace(
            module.cfg,
            vit=dataclasses.replace(module.cfg.vit, depth=len(vit_groups)),
            t5=dataclasses.replace(module.cfg.t5,
                                   num_layers=len(enc_groups),
                                   num_decoder_layers=len(dec_groups)))

    if new_cfg is not module.cfg:
        module = type(module)(new_cfg)
    variables = dict(variables)
    # tree surgery produces host numpy leaves; jit closes over params, and
    # indexing a numpy constant with a tracer (rel-pos bucket lookup) fails
    variables["params"] = jax.tree_util.tree_map(
        lambda x: x if hasattr(x, "devices") else jax.numpy.asarray(x),
        params)
    model = FlaxModel(module, variables)
    runner.model = model

    # ---- artifact dumps (evaluate.py:360-404) ----------------------------
    def _dump(folder, payload):
        os.makedirs(folder, exist_ok=True)
        path = os.path.join(folder, f"{job_id}.npz")
        np.savez(path, **payload)
        print(path)
        return path

    if args.save_final_activations:
        outputs = runner.get_last_activations(num_data=args.num_data,
                                              power=args.power)
        return _dump(os.path.join(output_dir, "final_activations"),
                     {"logits": outputs["logits"],
                      "texts": np.asarray(outputs["texts"], object)})
    if args.save_pruned_indices:
        payload = {}
        for tower, idx in pruned_indices.items():
            for p, v in (idx or {}).items():
                payload[f"{tower}:{'/'.join(p)}"] = v
        return _dump(os.path.join(output_dir, "pruned_indices"), payload)
    if args.save_importance_measure:
        payload = {}
        for tower, sc in (("vit", vit_scores), ("t5", t5_scores)):
            for p, v in (sc or {}).items():
                payload[f"{tower}:{'/'.join(p)}"] = np.asarray(v)
        return _dump(os.path.join(output_dir, "importance_measure"), payload)

    # ---- size accounting + eval (evaluate.py:406-433) --------------------
    if "unstrct" in init:
        distilled_total_size = count_nonzero(params)
    else:
        distilled_total_size = count_params(params)
    runner.orig_total_size = orig_total_size
    runner.distilled_total_size = distilled_total_size

    results = runner.evaluate(skip_reload=True)
    stats = {"job_id": job_id, "orig_total_size": orig_total_size,
             "distilled_total_size": distilled_total_size,
             "eval_results": results}
    with open(os.path.join(output_dir, f"woodfisher_stats_{job_id}.json"),
              "w") as f:
        json.dump(stats, f, indent=2, default=str)
    return stats


if __name__ == "__main__":
    main()
