"""One launcher-emitted command, executed end-to-end (VERDICT r4 #8).

`scripts/t5/train.py` composes a `python -m vlm_compression_tpu.cli.train`
command encoding the full RESSA pipeline (prune → SparseLoRA+KD retrain →
merge → eval → save — reference scripts/T5/train.py:40-102).  The launcher
grid is parse-tested in test_launchers.py; here ONE composed command is
actually EXECUTED, as a subprocess on the 8-device virtual CPU mesh, with
only environment-reality rewrites (tiny towers/data in place of the
reference corpora, 2-layer prune specs in place of 24/39), and the
artifact set is asserted against the reference's contract
(/root/reference/train.py:677-714): pruned checkpoint, sparsity-dict
yaml, training-statistics yaml, evaluate.txt.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

sys.path.insert(0, os.path.join(REPO, "scripts"))


def _write_fixture(root):
    from PIL import Image

    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    anns = []
    for i in range(8):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            img_dir / f"i{i}.jpg")
        anns.append({"image": f"i{i}.jpg", "caption": f"cap number {i}",
                     "image_id": i})
    with open(root / "ann.json", "w") as f:
        json.dump(anns, f)

    ds = {
        "coco_caption": {
            "build_info": {
                "annotations": {"train": [str(root / "ann.json")],
                                "val": [str(root / "ann.json")]},
                "images": {"storage": str(img_dir)},
            },
            "vis_processor": {
                "train": {"name": "blip_image_eval", "image_size": 28},
                "eval": {"name": "blip_image_eval", "image_size": 28},
            },
        },
    }
    train_cfg = {
        "model": {"arch": "blip2_t5_instruct", "tiny": True},
        "datasets": ds,
        "run": {
            "task": "image_text_retrain",
            # divisible by the 8-device data axis (pjit train step)
            "batch_size_train": 8, "batch_size_eval": 8,
            # KD retraining has no valid_step; eval runs via eval.yaml
            "valid_splits": [],
            "max_epoch": 1, "iters_per_epoch": 2,
            "init_lr": 1e-3, "min_lr": 1e-4, "warmup_steps": 1,
            "log_freq": 1,
            "output_dir": str(root / "out"),
        },
    }
    eval_cfg = {
        "model": {"arch": "blip2_t5_instruct", "tiny": True},
        "datasets": ds,
        "run": {
            "task": "captioning",
            "batch_size_train": 8, "batch_size_eval": 8,
            "max_len": 6, "min_len": 1, "num_beams": 1,
            "test_splits": ["val"],
            "output_dir": str(root / "out"),
        },
    }
    with open(root / "train.yaml", "w") as f:
        yaml.safe_dump(train_cfg, f)
    with open(root / "eval.yaml", "w") as f:
        yaml.safe_dump(eval_cfg, f)
    return str(root / "train.yaml"), str(root / "eval.yaml")


def test_launcher_command_executes_end_to_end(tmp_path):
    import launch_lib

    cmds = []
    orig = launch_lib._run
    launch_lib._run = lambda cmd: cmds.append(cmd)
    try:
        # "first" = EcoFLaP first-order: wanda masks under a non-uniform
        # per-block budget (aobd_sum scores) — exercises the allocator so
        # the sparsity-dict yaml artifact is produced
        job_id = launch_lib.train_ressa(
            "first", t5_ratio=0.5, vit_ratio=0.5, kl_weight=0.1,
            max_train_samples=8)
    finally:
        launch_lib._run = orig
    (cmd,) = cmds
    assert cmd[1:3] == ["-m", "vlm_compression_tpu.cli.train"]

    train_yaml, eval_yaml = _write_fixture(tmp_path)

    # environment-reality rewrites ONLY — every pipeline flag the launcher
    # composed (method, score, granularity, tune_opt, ranks, kl, sparse,
    # save) rides through unchanged
    argv = cmd[3:]

    def set_flag(name, value):
        i = argv.index(name)
        argv[i + 1] = value

    set_flag("--cfg-path", train_yaml)
    set_flag("--t5_prune_spec", "2-0.5-1.0-1.0")
    set_flag("--vit_prune_spec", "2-0.5-1.0-1.0")
    set_flag("--num_data_for_prune", "4")
    set_flag("--prune_batch_size", "2")
    argv += ["--tiny", "--num_data_first_stage", "4",
             "--evaluate", "--eval-cfg-path", eval_yaml]

    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8 "
                  "--xla_backend_optimization_level=0",
    )
    r = subprocess.run([sys.executable, "-m", "vlm_compression_tpu.cli"
                        ".train", *argv],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=3000)
    assert r.returncode == 0, (r.stdout[-4000:], r.stderr[-4000:])

    # the reference's artifact contract (train.py:677-714)
    out = str(tmp_path / "out")
    assert os.path.isdir(os.path.join(out, f"pruned_{job_id}")), (
        os.listdir(out))
    with open(os.path.join(out, f"sparsity_dict_{job_id}.yaml")) as f:
        sdict = yaml.safe_load(f)
    assert sdict and all(0.0 <= v <= 1.0 for v in sdict.values())
    with open(os.path.join(
            out, "training_statistics", f"{job_id}.yaml")) as f:
        tstats = yaml.safe_load(f)
    assert tstats["prune_seconds"] > 0 and tstats["retrain_seconds"] > 0, (
        tstats)
    with open(os.path.join(
            out, f"training_statistics_{job_id}.json")) as f:
        stats = json.load(f)
    assert stats["prune_seconds"] > 0 and stats["train_seconds"] > 0
    with open(os.path.join(out, "evaluate.txt")) as f:
        ev = f.read()
    assert "CIDEr" in ev or "agg_metrics" in ev, ev
