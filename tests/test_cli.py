"""CLI pipeline: prune → RESSA retrain → merge → save, tiny end-to-end."""

import json
import os

import numpy as np
import pytest
import yaml

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    img_dir = root / "images"
    img_dir.mkdir()
    from PIL import Image

    rng = np.random.RandomState(0)
    anns = []
    for i in range(8):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            img_dir / f"i{i}.jpg")
        anns.append({"image": f"i{i}.jpg", "caption": f"cap number {i}",
                     "image_id": i})
    with open(root / "ann.json", "w") as f:
        json.dump(anns, f)

    cfg = {
        "model": {"arch": "blip2_t5_instruct", "tiny": True},
        "datasets": {
            "coco_caption": {
                "build_info": {
                    "annotations": {"train": [str(root / "ann.json")]},
                    "images": {"storage": str(img_dir)},
                },
                "vis_processor": {
                    "train": {"name": "blip_image_eval", "image_size": 28},
                },
            },
        },
        "run": {
            "task": "image_text_retrain",
            "batch_size_train": 8, "batch_size_eval": 8,
            "max_epoch": 1, "iters_per_epoch": 2,
            "init_lr": 1e-3, "min_lr": 1e-4, "warmup_steps": 1,
            "log_freq": 1,
            "output_dir": str(root / "out"),
        },
    }
    cfg_path = root / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return root, str(cfg_path)


def test_cli_prune_train_save(workdir):
    from vlm_compression_tpu.cli.train import main

    root, cfg_path = workdir
    stats = main([
        "--cfg-path", cfg_path, "--job_id", "testjob",
        "--prune", "--pruning_method", "blipt5_wanda_pruner",
        "--t5_prune_spec", "2-0.5-1.0-1.0",
        "--vit_prune_spec", "2-0.5-1.0-1.0",
        "--num_data_for_prune", "4", "--prune_batch_size", "2",
        "--train", "--sparse", "--tune_opt", "LVQ",
        "--lora_r_l", "4", "--lora_r_v", "2", "--lora_r_q", "2",
        "--kl_weight", "0.1", "--T", "1",
        "--save_pruned_model", "--tiny",
    ])
    assert "prune_seconds" in stats and "train_seconds" in stats
    assert os.path.isdir(stats["pruned_checkpoint"])
    out = str(root / "out")
    assert os.path.exists(os.path.join(
        out, "training_statistics_testjob.json"))
    # sparsity preserved after sparse merge: pruned block density ≈ 0.5
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(stats["pruned_checkpoint"])
    dens = []

    def walk(node, path=()):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            elif k == "mask" and any(p.startswith("blocks_") for p in path):
                dens.append(float(np.mean(v)))

    walk(restored["masks"])
    assert dens and np.mean(dens) == pytest.approx(0.5, abs=0.05)

    # merged kernels are zero where masks are False (SparseLoRA invariant)
    def check(params, masks, path=()):
        for k, v in params.items():
            if isinstance(v, dict):
                check(v, masks.get(k, {}) if isinstance(masks, dict) else {},
                      path + (k,))
            elif (k == "kernel"
                  and any(p.startswith("blocks_") for p in path)
                  and isinstance(masks, dict) and "mask" in masks):
                m = np.asarray(masks["mask"])
                w = np.asarray(v, np.float32)
                assert np.all(w[~m] == 0), "/".join(path)

    check(restored["params"], restored["masks"])


def test_cli_pack_masks(workdir):
    """--pack_masks bit-packs the saved masks; the packed model still runs."""
    from vlm_compression_tpu.cli.train import main

    root, cfg_path = workdir
    stats = main([
        "--cfg-path", cfg_path, "--job_id", "packjob",
        "--prune", "--pruning_method", "blipt5_wanda_pruner",
        "--t5_prune_spec", "2-0.5-1.0-1.0",
        "--vit_prune_spec", "2-0.5-1.0-1.0",
        "--num_data_for_prune", "4", "--prune_batch_size", "2",
        "--train", "--sparse", "--tune_opt", "LVQ",
        "--lora_r_l", "4", "--lora_r_v", "2", "--lora_r_q", "2",
        "--pack_masks", "--save_pruned_model", "--tiny",
    ])
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(stats["pruned_checkpoint"])

    found = []

    def walk(node, path=()):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            elif k == "mask" and any(p.startswith("blocks_") for p in path):
                found.append(v)

    walk(restored["masks"])
    assert found and all(np.asarray(m).dtype == np.uint32 for m in found)

    # packed model forward == bool-mask forward
    import jax
    import jax.numpy as jnp

    from vlm_compression_tpu.models.blip2_t5_instruct import (
        Blip2T5Instruct,
        Blip2T5InstructConfig,
    )
    from vlm_compression_tpu.ops.bitmask import unpack_masks_tree

    model = Blip2T5Instruct(Blip2T5InstructConfig.tiny())
    img = model.cfg.vit.img_size
    batch = dict(
        image=jnp.zeros((1, img, img, 3), jnp.float32),
        input_ids=jnp.zeros((1, 6), jnp.int32),
        attention_mask=jnp.ones((1, 6), jnp.int32),
        labels=jnp.ones((1, 4), jnp.int32),
    )
    # orbax restores train-time shardings (params 8-way, masks packed on
    # one device); normalize everything to host arrays for the parity check
    restored = jax.tree.map(lambda a: jnp.asarray(np.asarray(a)), restored)
    vp = {"params": restored["params"], "masks": restored["masks"]}
    out_packed = model.apply(vp, **batch)
    vb = {"params": restored["params"],
          "masks": unpack_masks_tree(restored["masks"])}
    out_bool = model.apply(vb, **batch)
    np.testing.assert_allclose(np.asarray(out_packed["loss"]),
                               np.asarray(out_bool["loss"]),
                               rtol=1e-5, atol=1e-6)


def test_cli_separate_prune_cfg(workdir):
    """--prune-cfg-path builds the calibration loader from its own config
    tree (reference train.py:538)."""
    from vlm_compression_tpu.cli.train import main

    root, cfg_path = workdir
    stats = main([
        "--cfg-path", cfg_path, "--prune-cfg-path", cfg_path,
        "--job_id", "sepcfg",
        "--prune", "--pruning_method", "blipt5_wanda_pruner",
        "--t5_prune_spec", "2-0.5-1.0-1.0",
        "--vit_prune_spec", "2-0.5-1.0-1.0",
        "--num_data_for_prune", "4", "--prune_batch_size", "2",
        "--tiny",
    ])
    assert "prune_seconds" in stats
