"""Shared launcher logic for the scripts/t5 and scripts/vicuna grids.

The reference encodes its experiment matrix in per-method subprocess
wrappers (scripts/T5/wanda.py:12-33 maps pruner name → registry method +
sparsity-ratio granularity + score method; :69-102 loops the zero-shot
eval suite).  Same matrix here, composed against this framework's CLIs
(no torchrun: one process drives the chip/mesh).
"""

from __future__ import annotations

import subprocess
import sys

# pruner name → (registry method, granularity, score_method)
# (reference scripts/T5/{wanda,sparsegpt,dsnot,ecoflap_*,mag,rand}.py)
METHOD_MATRIX = {
    "wanda": ("blipt5_wanda_pruner", "none", "obd_avg"),
    "sparsegpt": ("blipt5_sparsegpt_pruner", "none", "obd_avg"),
    "dsnot": ("blipt5_dsnot_pruner", "none", "obd_avg"),
    # EcoFLaP: Wanda masks under a non-uniform per-block budget scored by
    # zeroth-order (MeZO) or first-order gradients
    "zeroth": ("blipt5_wanda_pruner", "block", "olmezo-gradient_sum"),
    "first": ("blipt5_wanda_pruner", "block", "aobd_sum"),
    "mag": ("blipt5_mag_pruner", "none", "obd_avg"),
    "rand": ("blipt5_rand_pruner", "none", "obd_avg"),
}

EVAL_TASKS = ["okvqa_zeroshot_flant5xl_eval", "gqa_zeroshot_flant5xl_eval",
              "nocaps_flant5xl_eval", "vqav2_zeroshot_flant5xl_eval",
              "ret_flickr_eval"]


def _run(cmd):
    print("+", " ".join(cmd), flush=True)
    rc = subprocess.call(cmd)
    if rc != 0:
        sys.exit(rc)


def prune_and_eval(pruner: str, t5_ratio: float, vit_ratio: float,
                   prune_n: int = 0, prune_m: int = 0,
                   instruct: bool = True, model_size: str = "xl",
                   family: str = "t5", extra=()):
    """evaluate_old-style flow: prune + save, then the zero-shot suite
    (reference scripts/T5/wanda.py:52-102)."""
    method, gran, score = METHOD_MATRIX[pruner]
    prune_cfg = ("configs/projects/eval/prune_stage2_t5_instruct.yaml"
                 if instruct else "configs/projects/eval/prune_stage2.yaml")
    if family == "vicuna":
        prune_cfg = "configs/projects/eval/prune_stage2_vicuna_instruct.yaml"
    tag = (f"{pruner}_{t5_ratio}_{vit_ratio}" if prune_n == 0
           else f"{pruner}_{prune_n}:{prune_m}")
    job_id = f"prune-{model_size}-{tag}"
    cmd = [sys.executable, "-m", "vlm_compression_tpu.cli.evaluate",
           "--cfg-path", prune_cfg,
           "--prune", "--pruning_method", method, "--save_pruned_model",
           "--t5_prune_spec", f"24-{t5_ratio}-1.0-1.0",
           "--vit_prune_spec", f"39-{vit_ratio}-1.0-1.0",
           "--prune_n", str(prune_n), "--prune_m", str(prune_m),
           "--model_size", model_size, "--job_id", job_id,
           "--score_method", score,
           "--sparsity_ratio_granularity", gran,
           # pin the output dir: the checkpoint path below must match what
           # the CLI derives from run.output_dir (the prune_stage2 configs
           # otherwise point at their own output dirs)
           "--options", f"run.output_dir=output/{job_id}",
           *extra]
    if family == "vicuna":
        cmd += ["--t5_model_prefix", "llm_model"]
    _run(cmd)

    ckpt = f"output/{job_id}/pruned_{job_id}"
    for task in EVAL_TASKS:
        if family == "vicuna":
            task = task.replace("_flant5xl_eval", "_vicuna_instruct_eval")
            if task == "ret_flickr_eval":
                continue  # scripts/Vicuna/evaluate.py skips retrieval
        elif instruct:
            task = task.replace("_eval", "_instruct_eval")
        _run([sys.executable, "-m", "vlm_compression_tpu.cli.evaluate",
              "--cfg-path", f"configs/projects/eval/{task}.yaml",
              "--pruned_checkpoint", ckpt,
              "--job_id", f"{job_id}-{task}"])


def train_ressa(pruner: str, t5_ratio: float, vit_ratio: float,
                kl_weight: float = 0.1, prune_n: int = 0, prune_m: int = 0,
                max_train_samples: int = 25000, instruct: bool = True,
                model_size: str = "xl", tune_opt: str = "LVQ",
                lora_r_v: int = 4, lora_r_l: int = 8, lora_r_q: int = 2,
                family: str = "t5", extra=()):
    """train.py flow: prune → SparseLoRA+KD retrain → merge → eval → save
    (reference scripts/T5/train.py:40-102)."""
    method, gran, score = METHOD_MATRIX[pruner]
    train_cfg = ("configs/projects/train/continue_stage2_cc3m_t5_instruct"
                 ".yaml" if instruct else
                 "configs/projects/train/continue_stage2_cc3m.yaml")
    if family == "vicuna":
        train_cfg = ("configs/projects/train/"
                     "continue_stage2_vicuna_instruct.yaml")
    tag = (f"{pruner}_{kl_weight}_{t5_ratio}_{vit_ratio}" if prune_n == 0
           else f"{pruner}_{kl_weight}_{prune_n}:{prune_m}")
    job_id = (f"ressa-{model_size}-{tag}_{tune_opt}_"
              f"{max_train_samples}_{lora_r_v}_{lora_r_l}_{lora_r_q}")
    cmd = [sys.executable, "-m", "vlm_compression_tpu.cli.train",
           "--cfg-path", train_cfg,
           "--prune", "--pruning_method", method,
           "--t5_prune_spec", f"24-{t5_ratio}-1.0-1.0",
           "--vit_prune_spec", f"39-{vit_ratio}-1.0-1.0",
           "--prune_n", str(prune_n), "--prune_m", str(prune_m),
           "--num_data_for_prune", "128", "--prune_batch_size", "1",
           "--train", "--sparse", "--tune_opt", tune_opt,
           "--lora_r_v", str(lora_r_v), "--lora_r_l", str(lora_r_l),
           "--lora_r_q", str(lora_r_q), "--lora_alpha", "16",
           "--kl_weight", str(kl_weight), "--T", "1",
           "--max_train_samples", str(max_train_samples),
           "--score_method", score,
           "--sparsity_ratio_granularity", gran,
           "--model_size", model_size, "--job_id", job_id,
           "--save_pruned_model", *extra]
    if family == "vicuna":
        cmd += ["--t5_model_prefix", "llm_model"]
    _run(cmd)
    return job_id


def eval_checkpoint(ckpt: str, family: str = "t5", instruct: bool = True,
                    strip: bool = True, extra=()):
    """evaluate_new-style flow: the zero-shot suite on a saved RESSA
    checkpoint, lora/mask entries stripped."""
    for task in EVAL_TASKS:
        if family == "vicuna":
            task = task.replace("_flant5xl_eval", "_vicuna_instruct_eval")
            if task == "ret_flickr_eval":
                continue
        elif instruct:
            task = task.replace("_eval", "_instruct_eval")
        cmd = [sys.executable, "-m", "vlm_compression_tpu.cli.evaluate",
               "--cfg-path", f"configs/projects/eval/{task}.yaml",
               "--pruned_checkpoint", ckpt, *extra]
        if strip:
            cmd.append("--strip_lora_masks")
        _run(cmd)
