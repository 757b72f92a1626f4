"""RunnerBase: one RESSA retrain epoch end-to-end on synthetic data,
checkpoint round-trip, calibration loader."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_compression_tpu.common.config import ConfigNode
from vlm_compression_tpu.compression.pruners.base import FlaxModel
from vlm_compression_tpu.datasets.items import CaptionDataset
from vlm_compression_tpu.datasets.processors import load_processor
from vlm_compression_tpu.datasets.tokenization import SimpleTokenizer
from vlm_compression_tpu.models.blip2_t5_instruct import (
    Blip2T5Instruct,
    Blip2T5InstructConfig,
)
from vlm_compression_tpu.models.eva_vit import EvaViTConfig
from vlm_compression_tpu.models.qformer import QFormerConfig
from vlm_compression_tpu.models.t5 import T5Config
from vlm_compression_tpu.runners.runner_base import RunnerBase
from vlm_compression_tpu.tasks.preparers import make_t5_batch_preparer
from vlm_compression_tpu.tasks.retrain import ImageTextRetrainTask

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("runner")
    img_dir = root / "images"
    img_dir.mkdir()
    from PIL import Image

    rng = np.random.RandomState(0)
    anns = []
    for i in range(8):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            img_dir / f"i{i}.jpg")
        anns.append({"image": f"i{i}.jpg", "caption": f"caption number {i}",
                     "image_id": i})
    with open(root / "ann.json", "w") as f:
        json.dump(anns, f)

    ds = CaptionDataset(load_processor("blip_image_eval", {"image_size": 28}),
                        load_processor("blip_caption"),
                        str(img_dir), [str(root / "ann.json")])

    cfg = Blip2T5InstructConfig(
        vit=EvaViTConfig.tiny(lora_rank=2),
        qformer=QFormerConfig.tiny(lora_rank=2),
        t5=T5Config.tiny(lora_rank=4),
    )
    model = Blip2T5Instruct(cfg)
    tok = SimpleTokenizer(vocab_size=cfg.t5.vocab_size)
    prepare = make_t5_batch_preparer(tok, max_txt_len=8, max_output_len=8)
    batch = prepare(ds.collater([ds[0], ds[1]]))
    variables = dict(model.init(
        jax.random.key(0), **{k: jnp.asarray(v) for k, v in batch.items()},
        vit_mode="sparse_lora", llm_mode="sparse_lora",
        qformer_mode="sparse_lora"))
    return root, ds, model, variables, prepare


def _runner(root, ds, model, variables, prepare, **over):
    # batch sizes divisible by the 8-device data axis of the test mesh
    run = dict(task="image_text_retrain", batch_size_train=8,
               batch_size_eval=8, max_epoch=1, init_lr=1e-3, min_lr=1e-4,
               warmup_steps=2, iters_per_epoch=3, log_freq=1,
               output_dir=str(root / "out"), kl_weight=0.1, T=1.0)
    run.update(over)
    cfg = ConfigNode({"run": run})
    cfg.run_cfg = cfg["run"]
    task = ImageTextRetrainTask(kl_weight=0.1, T=1.0)
    # the jitted step donates the train state — give each runner its own
    # copies so the module-scoped fixture arrays survive
    fresh = jax.tree_util.tree_map(jnp.copy, dict(variables))
    return RunnerBase(cfg, task, FlaxModel(model, fresh),
                      {"cap": {"train": ds}}, job_id="t",
                      prepare_batch=prepare)


def test_train_one_epoch_and_checkpoint(setup):
    root, ds, model, variables, prepare = setup
    runner = _runner(root, ds, model, variables, prepare)
    stats = runner.train(prune_retrain=True)
    assert 0 in stats and "loss" in stats[0]
    assert float(stats[0]["loss"]) > 0
    # lora folded back into model variables
    assert "lora" in runner.model.variables
    # checkpoint written (no val split → per-epoch checkpoint)
    assert os.path.isdir(os.path.join(runner.output_dir, "checkpoint_0"))
    # log.txt JSONL
    with open(os.path.join(runner.output_dir, "log.txt")) as f:
        rec = json.loads(f.readline())
    assert any(k.startswith("train_") for k in rec)


def test_checkpoint_resume(setup):
    root, ds, model, variables, prepare = setup
    r1 = _runner(root, ds, model, variables, prepare,
                 output_dir=str(root / "out2"))
    r1.train(prune_retrain=True)
    lora1 = r1.train_state.lora

    r2 = _runner(root, ds, model, variables, prepare,
                 output_dir=str(root / "out3"),
                 resume_ckpt_path=str(root / "out2" / "checkpoint_0"))
    r2._load_checkpoint_if_resume()
    for a, b in zip(jax.tree_util.tree_leaves(lora1),
                    jax.tree_util.tree_leaves(r2.train_state.lora)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_calibration_loader(setup):
    root, ds, model, variables, prepare = setup
    runner = _runner(root, ds, model, variables, prepare)
    batches = runner.get_dataloader_for_importance_computation(
        num_data=4, batch_size=2)
    assert len(batches) == 2
    assert batches[0]["image"].shape[0] == 2
    assert "input_ids" in batches[0]

    # batches feed the pruner directly
    from vlm_compression_tpu.compression import load_pruner

    jbatches = [{k: jnp.asarray(v) for k, v in b.items()} for b in batches]
    pruner = load_pruner(
        "blipt5_wanda_pruner", FlaxModel(model, dict(variables)), jbatches,
        t5_prune_spec="2-0.5-1.0-1.0", vit_prune_spec="2-0.5-1.0-1.0",
        num_samples=4)
    fm, _ = pruner.prune(lora_model=True)
    assert fm is not None
