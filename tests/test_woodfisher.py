"""WoodFisher importance + distill/merge evaluate CLI (reference
evaluate.py, the fisher-inverse experimental variant)."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest
import yaml

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow



# ---------------------------------------------------------------------------
# WoodFisher estimator math
# ---------------------------------------------------------------------------

def test_sherman_morrison_matches_dense_inverse():
    """The SM recursion must equal inv(damp·I + (1/N)ΣggT) per block."""
    from vlm_compression_tpu.compression.woodfisher import _chunk, _sm_fold

    rng = np.random.default_rng(0)
    n, c, damp = 12, 6, 1e-2
    grads = rng.standard_normal((n, c)).astype(np.float32)

    finv0 = jnp.broadcast_to(jnp.eye(c) / damp, (1, c, c)).copy()
    finv = _sm_fold(finv0, jnp.asarray(grads)[:, None, :], n)[0]

    dense = damp * np.eye(c) + grads.T @ grads / n
    np.testing.assert_allclose(np.asarray(finv), np.linalg.inv(dense),
                               rtol=2e-3, atol=2e-4)


def test_chunk_pads_and_reshapes():
    from vlm_compression_tpu.compression.woodfisher import _chunk

    flat = jnp.arange(10, dtype=jnp.float32).reshape(1, 10)
    out = _chunk(flat, 4)
    assert out.shape == (1, 3, 4)
    assert float(out[0, 2, 2]) == 0.0  # padded tail


def test_woodfisher_scores_on_tiny_model():
    from vlm_compression_tpu.compression.pruners.base import FlaxModel
    from vlm_compression_tpu.compression.woodfisher import WoodFisher
    from vlm_compression_tpu.models.factory import build_model, example_batch

    module, variables = build_model({"arch": "blip2_t5_instruct",
                                     "tiny": True}, seed=0)
    batch = {k: jnp.concatenate([v, v]) for k, v in
             example_batch("blip2_t5_instruct", module.cfg).items()}
    wf = WoodFisher(FlaxModel(module, variables), [batch], num_samples=2,
                    include=lambda p: p[0] == "visual_encoder",
                    max_chunk=16)
    scores = wf.compute_fisher_inv_and_importance_score()
    assert scores, "no scores collected"
    for path, s in scores.items():
        assert path[0] == "visual_encoder"
        assert np.all(np.isfinite(np.asarray(s)))
        assert np.all(np.asarray(s) >= 0)


# ---------------------------------------------------------------------------
# distill/merge tree surgery
# ---------------------------------------------------------------------------

def test_parse_block_ids_and_weights():
    from vlm_compression_tpu.compression.distill_merge import (
        parse_block_ids,
        parse_block_weights,
    )

    groups = parse_block_ids("0,1;2-4;5")
    assert groups == [[0, 1], [2, 3, 4], [5]]
    ws = parse_block_weights("0.3,0.7;1,1,1;1", groups)
    assert ws[0] == [0.3, 0.7]
    assert parse_block_weights(None, groups)[1] == pytest.approx([1 / 3] * 3)


def test_merge_tower_blocks_mean_and_gate():
    from vlm_compression_tpu.compression.distill_merge import (
        merge_tower_blocks,
    )

    tower = {
        "blocks_0": {"mlp": {"fc1": {"kernel": np.ones((2, 4), np.float32)}},
                     "ln": {"scale": np.full((2,), 2.0, np.float32)}},
        "blocks_1": {"mlp": {"fc1": {"kernel": np.full((2, 4), 3.0,
                                                       np.float32)}},
                     "ln": {"scale": np.full((2,), 4.0, np.float32)}},
        "embed": {"kernel": np.zeros((2, 2), np.float32)},
    }
    merged = merge_tower_blocks(tower, [[0, 1]])
    assert set(merged) == {"blocks_0", "embed"}
    np.testing.assert_allclose(merged["blocks_0"]["mlp"]["fc1"]["kernel"],
                               np.full((2, 4), 2.0))
    # regex gate: only fc1 merges, ln keeps block 0's value
    merged = merge_tower_blocks(tower, [[0, 1]], modules_to_merge="fc1")
    np.testing.assert_allclose(merged["blocks_0"]["ln"]["scale"],
                               np.full((2,), 2.0))


def test_permutation_alignment_recovers_shuffle():
    """A unit-shuffled copy of a block must merge losslessly after
    permute alignment: merged == original."""
    from vlm_compression_tpu.compression.distill_merge import (
        merge_tower_blocks,
    )

    rng = np.random.default_rng(1)
    k1 = rng.standard_normal((4, 8)).astype(np.float32)
    b1 = rng.standard_normal((8,)).astype(np.float32)
    k2 = rng.standard_normal((8, 4)).astype(np.float32)
    perm = rng.permutation(8)
    block0 = {"mlp": {"fc1": {"kernel": k1, "bias": b1},
                      "fc2": {"kernel": k2}}}
    block1 = {"mlp": {"fc1": {"kernel": k1[:, perm], "bias": b1[perm]},
                      "fc2": {"kernel": k2[perm, :]}}}
    tower = {"blocks_0": block0, "blocks_1": block1}
    merged = merge_tower_blocks(tower, [[0, 1]], permute=True)
    np.testing.assert_allclose(merged["blocks_0"]["mlp"]["fc1"]["kernel"],
                               k1, rtol=1e-5)
    np.testing.assert_allclose(merged["blocks_0"]["mlp"]["fc2"]["kernel"],
                               k2, rtol=1e-5)


def test_prune_by_importance_zeroes_lowest():
    from vlm_compression_tpu.compression.distill_merge import (
        prune_by_importance,
    )

    params = {"lin": {"kernel": np.arange(1, 9, dtype=np.float32
                                          ).reshape(2, 4)}}
    scores = {("lin", "kernel"): np.arange(8, dtype=np.float32
                                           ).reshape(2, 4)}
    new, idx = prune_by_importance(params, scores, keep_ratio=0.5)
    assert (new["lin"]["kernel"].reshape(-1)[:4] == 0).all()
    assert (new["lin"]["kernel"].reshape(-1)[4:] != 0).all()
    np.testing.assert_array_equal(idx[("lin", "kernel")], [0, 1, 2, 3])


# ---------------------------------------------------------------------------
# CLI end-to-end (tiny model, synthetic VQA data)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("wfcli")
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
                    "annotations": {"train": [str(root / "vqa.json")],
                                    "val": [str(root / "vqa.json")]},
                    "images": {"storage": str(img_dir)},
                },
                "vis_processor": {
                    "train": {"name": "blip_image_eval", "image_size": 28},
                    "eval": {"name": "blip_image_eval", "image_size": 28}},
                "text_processor": {
                    "train": {"name": "blip_question"},
                    "eval": {"name": "blip_question"}},
            },
        },
        "run": {"task": "vqa", "batch_size_train": 2, "batch_size_eval": 2,
                "num_beams": 1, "max_len": 4, "test_splits": ["val"],
                "output_dir": str(root / "out")},
    }
    path = root / "cfg.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return root, str(path)


def test_woodfisher_cli_unstructured_prune_eval(workdir):
    from vlm_compression_tpu.cli.evaluate_woodfisher import main

    root, cfg_path = workdir
    stats = main([
        "--cfg-path", cfg_path, "--job_id", "wf1", "--tiny",
        "--distillation_init", "unstrct_woodfisher",
        "--get_derivative_info", "--num_data", "2",
        "--distill_merge_ratio", "0.5",
    ])
    assert stats["distilled_total_size"] < stats["orig_total_size"]
    assert "val" in stats["eval_results"]


def test_woodfisher_cli_block_merge_eval(workdir):
    from vlm_compression_tpu.cli.evaluate_woodfisher import main

    root, cfg_path = workdir
    stats = main([
        "--cfg-path", cfg_path, "--job_id", "wf2", "--tiny",
        "--distilled_block_ids", "0,1", "--permute_before_merge",
    ])
    # two blocks merged into one per tower: fewer params
    assert stats["distilled_total_size"] < stats["orig_total_size"]
    assert "val" in stats["eval_results"]


def test_woodfisher_cli_save_importance(workdir):
    from vlm_compression_tpu.cli.evaluate_woodfisher import main

    root, cfg_path = workdir
    path = main([
        "--cfg-path", cfg_path, "--job_id", "wf3", "--tiny",
        "--get_activation_info", "--num_data", "2",
        "--save_importance_measure",
    ])
    assert os.path.exists(path)
    data = np.load(path)
    assert any(k.startswith("vit:") for k in data.files)
