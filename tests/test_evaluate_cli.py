"""evaluate CLI: prune-and-eval + checkpoint-eval with stripping."""

import json
import os

import numpy as np
import pytest
import yaml

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalcli")
    img_dir = root / "images"
    img_dir.mkdir()
    from PIL import Image

    rng = np.random.RandomState(0)
    anns = []
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            img_dir / f"i{i}.jpg")
        anns.append({"image": f"i{i}.jpg", "question": f"what is {i}?",
                     "question_id": i, "answer": ["yes"] * 10})
    with open(root / "vqa.json", "w") as f:
        json.dump(anns, f)

    cfg = {
        "model": {"arch": "blip2_t5_instruct", "tiny": True},
        "datasets": {
            "coco_vqa": {
                "build_info": {
                    "annotations": {
                        "train": [str(root / "vqa.json")],
                        "val": [str(root / "vqa.json")],
                    },
                    "images": {"storage": str(img_dir)},
                },
                "vis_processor": {
                    "train": {"name": "blip_image_eval", "image_size": 28},
                    "eval": {"name": "blip_image_eval", "image_size": 28},
                },
                "text_processor": {
                    "train": {"name": "blip_question"},
                    "eval": {"name": "blip_question"},
                },
            },
        },
        "run": {
            "task": "vqa",
            "batch_size_train": 4, "batch_size_eval": 4,
            "num_beams": 1, "max_len": 4,
            "test_splits": ["val"],
            "output_dir": str(root / "out"),
        },
    }
    path = root / "cfg.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return root, str(path)


def test_evaluate_cli_prune_and_eval(workdir):
    from vlm_compression_tpu.cli.evaluate import main

    root, cfg_path = workdir
    stats = main([
        "--cfg-path", cfg_path, "--job_id", "ev1", "--tiny",
        "--prune", "--pruning_method", "blipt5_wanda_pruner",
        "--t5_prune_spec", "2-0.5-1.0-1.0",
        "--vit_prune_spec", "2-0.5-1.0-1.0",
        "--num_data_for_prune", "2", "--prune_batch_size", "2",
        "--save_pruned_model",
    ])
    assert "prune_seconds" in stats
    assert "val" in stats["eval_results"]
    assert "agg_metrics" in stats["eval_results"]["val"]
    assert os.path.isdir(stats["pruned_checkpoint"])

    # phase 2: evaluate the saved checkpoint with lora/mask stripping
    stats2 = main([
        "--cfg-path", cfg_path, "--job_id", "ev2", "--tiny",
        "--pruned_checkpoint", stats["pruned_checkpoint"],
        "--strip_lora_masks",
    ])
    assert "val" in stats2["eval_results"]


def test_evaluate_cli_tower_checkpoints_and_knobs(workdir):
    """Per-tower checkpoint grafting + the evaluate_old knob surface."""
    from vlm_compression_tpu.cli.evaluate import main

    root, cfg_path = workdir
    stats = main([
        "--cfg-path", cfg_path, "--job_id", "ev3", "--tiny",
        "--prune", "--pruning_method", "blipt5_dsnot_pruner",
        "--t5_prune_spec", "2-0.5-1.0-1.0",
        "--vit_prune_spec", "2-0.5-1.0-1.0",
        "--initial_method", "magnitude",
        "--num_data_for_prune", "2", "--prune_batch_size", "2",
        "--power", "2", "--save_pruned_model",
    ])
    assert os.path.isdir(stats["pruned_checkpoint"])

    # graft the saved model's towers into a fresh run (whole-model trees
    # are accepted: the prefix subtree is extracted)
    stats2 = main([
        "--cfg-path", cfg_path, "--job_id", "ev4", "--tiny",
        "--vit_pruned_checkpoint", stats["pruned_checkpoint"],
        "--t5_pruned_checkpoint", stats["pruned_checkpoint"],
    ])
    assert "val" in stats2["eval_results"]


def test_interpolate_pos_embed():
    import jax.numpy as jnp
    import numpy as np

    from vlm_compression_tpu.models.eva_vit import interpolate_pos_embed

    pe = jnp.asarray(np.random.default_rng(0).standard_normal((1, 17, 8)),
                     jnp.float32)
    out = interpolate_pos_embed(pe, 49)           # 4x4 grid -> 7x7
    assert out.shape == (1, 50, 8)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(pe[:, 0]))
    # same size = identity
    assert interpolate_pos_embed(pe, 16) is pe


def test_evaluate_cli_int8(workdir):
    from vlm_compression_tpu.cli.evaluate import main

    root, cfg_path = workdir
    stats = main([
        "--cfg-path", cfg_path, "--job_id", "evq", "--tiny",
        "--quantize_int8",
    ])
    assert "val" in stats["eval_results"]


def test_evaluate_cli_w8a8_outliers(workdir):
    from vlm_compression_tpu.cli.evaluate import main
    from vlm_compression_tpu.ops import quant as Q

    root, cfg_path = workdir
    try:
        stats = main([
            "--cfg-path", cfg_path, "--job_id", "evq8", "--tiny",
            "--quantize_int8", "--w8a8", "--int8_outliers", "8",
        ])
        assert "val" in stats["eval_results"]
        assert Q.dynamic_int8_enabled() and Q.int8_outliers() == 8
    finally:
        Q.use_dynamic_int8(False)
        Q.set_int8_outliers(0)


def test_evaluate_cli_int4(workdir):
    from vlm_compression_tpu.cli.evaluate import main

    root, cfg_path = workdir
    # tiny tower dims are small: shrink the scale group so kernels qualify
    stats = main([
        "--cfg-path", cfg_path, "--job_id", "evq4", "--tiny",
        "--quantize_int4", "--int4_group", "8",
    ])
    assert "val" in stats["eval_results"]


def test_cli_serving_flags_parse_and_wire():
    """--speculative_gamma / --kv_cache_int8: flags parse and reach the
    model/run configs (the factory flips kv_cache_int8 on every tower
    config that has it)."""
    from vlm_compression_tpu.cli.evaluate import parse_args
    from vlm_compression_tpu.models.factory import build_model_config

    args = parse_args(["--cfg-path", "x.yaml", "--speculative_gamma", "4",
                       "--kv_cache_int8", "--tiny"])
    assert args.speculative_gamma == 4 and args.kv_cache_int8
    arch, cfg = build_model_config({"tiny": True, "kv_cache_int8": True})
    assert cfg.t5.kv_cache_int8
