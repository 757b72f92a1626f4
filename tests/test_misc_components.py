"""RunnerIter, stage-2 pretrain task, predict_class, adapter IO."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_compression_tpu.common.optims import make_adamw
from vlm_compression_tpu.compression.peft_io import (
    adapter_state,
    attach_adapter_state,
    count_parameters,
    load_adapter,
    print_trainable_parameters,
    remaining_parameter_fraction,
    save_adapter,
)
from vlm_compression_tpu.models.blip2_t5_instruct import (
    Blip2T5Instruct,
    Blip2T5InstructConfig,
    predict_class_t5,
)
from vlm_compression_tpu.models.eva_vit import EvaViTConfig
from vlm_compression_tpu.models.qformer import QFormerConfig
from vlm_compression_tpu.models.t5 import T5Config
from vlm_compression_tpu.tasks.pretrain import ImageTextPretrainTask
from vlm_compression_tpu.tasks.retrain import RessaTrainState

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow



@pytest.fixture(scope="module")
def tiny_lora():
    cfg = Blip2T5InstructConfig(
        vit=EvaViTConfig.tiny(lora_rank=2),
        qformer=QFormerConfig.tiny(lora_rank=2),
        t5=T5Config.tiny(lora_rank=4),
    )
    model = Blip2T5Instruct(cfg)
    b = 2
    batch = dict(
        image=jnp.ones((b, 28, 28, 3), jnp.float32) * 0.1,
        input_ids=jnp.ones((b, 6), jnp.int32),
        attention_mask=jnp.ones((b, 6), jnp.int32),
        labels=jnp.ones((b, 5), jnp.int32),
        qformer_input_ids=jnp.ones((b, 6), jnp.int32),
        qformer_attention_mask=jnp.ones((b, 6), jnp.int32),
    )
    variables = dict(model.init(
        jax.random.key(0), **batch, vit_mode="sparse_lora",
        llm_mode="sparse_lora", qformer_mode="sparse_lora"))
    return model, variables, batch


def test_pretrain_task_step(tiny_lora):
    model, variables, batch = tiny_lora
    tx = make_adamw()
    state = RessaTrainState.create(variables, tx)
    task = ImageTextPretrainTask()
    step = jax.jit(task.make_train_step(model, tx))
    state, metrics = step(state, batch, 1e-3)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_predict_class_prefers_target(tiny_lora):
    model, variables, batch = tiny_lora
    cands = jnp.asarray([[5, 9, -100], [7, 2, -100], [11, 3, 8]], jnp.int32)
    nll = predict_class_t5(model, variables, batch["image"],
                           batch["input_ids"], batch["attention_mask"],
                           cands, batch["qformer_input_ids"],
                           batch["qformer_attention_mask"])
    assert nll.shape == (2, 3)
    assert np.all(np.isfinite(np.asarray(nll)))
    # longer candidate accumulates more summed CE on a random model
    assert np.all(np.asarray(nll)[:, 2] > np.asarray(nll)[:, :2].min(1))


def test_adapter_roundtrip(tiny_lora, tmp_path):
    model, variables, batch = tiny_lora
    st = adapter_state(variables)
    assert set(st) == {"lora", "masks"}
    path = save_adapter(variables, tmp_path / "adapter")
    restored = load_adapter(path, st)
    for a, b2 in zip(jax.tree_util.tree_leaves(st),
                     jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
    re = attach_adapter_state({"params": variables["params"]}, restored)
    out = model.apply(re, **batch, vit_mode="sparse_lora",
                      llm_mode="sparse_lora", qformer_mode="sparse_lora")
    assert np.isfinite(float(out["loss"]))


def test_parameter_accounting(tiny_lora):
    model, variables, batch = tiny_lora
    c = count_parameters(variables)
    assert 0 < c["trainable"] < c["total"]
    msg = print_trainable_parameters(variables)
    assert "trainable%" in msg
    assert remaining_parameter_fraction(variables) == pytest.approx(1.0)
    # knock out half of one mask
    masks = variables["masks"]
    import copy

    def first_mask_path(tree, path=()):
        for k, v in tree.items():
            if k == "mask":
                return path
            if isinstance(v, dict):
                r = first_mask_path(v, path + (k,))
                if r is not None:
                    return r
        return None

    p = first_mask_path(masks)
    node = masks
    for kk in p:
        node = node[kk]
    m = node["mask"]
    node["mask"] = m.at[: m.shape[0] // 2].set(False)
    frac = remaining_parameter_fraction(variables)
    assert frac < 1.0


def test_runner_iter_smoke(tiny_lora, tmp_path):
    from vlm_compression_tpu.common.config import ConfigNode
    from vlm_compression_tpu.compression.pruners.base import FlaxModel
    from vlm_compression_tpu.runners.runner_iter import RunnerIter
    from vlm_compression_tpu.tasks.retrain import ImageTextRetrainTask

    model, variables, batch = tiny_lora

    class DS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {k: np.asarray(v[i % 2]) for k, v in batch.items()}

        def collater(self, items):
            return {k: np.stack([it[k] for it in items]) for k in items[0]}

    run = dict(task="image_text_retrain", batch_size_train=8,
               max_iters=4, iters_per_inner_epoch=2, init_lr=1e-3,
               min_lr=1e-4, warmup_steps=1, log_freq=1,
               output_dir=str(tmp_path / "out"))
    cfg = ConfigNode({"run": run})
    cfg.run_cfg = cfg["run"]
    fresh = jax.tree_util.tree_map(jnp.copy, dict(variables))
    runner = RunnerIter(cfg, ImageTextRetrainTask(), FlaxModel(model, fresh),
                        {"d": {"train": DS()}}, job_id="it",
                        prepare_batch=lambda s: s)
    stats = runner.train()
    assert len(stats) == 2  # two inner epochs
    import os

    assert os.path.isdir(os.path.join(runner.output_dir, "checkpoint_iter2"))


def test_data_derivatives_and_activations(tiny_lora):
    from vlm_compression_tpu.compression.derivatives import (
        convert_activation_to_importance,
        get_activations,
        get_data_derivative,
    )

    model, variables, batch = tiny_lora
    fisher = get_data_derivative(model, variables, [batch], power=2)
    leaves = jax.tree_util.tree_leaves(fisher)
    assert leaves and all(np.all(np.asarray(x) >= 0) for x in leaves)

    acts = get_activations(model, variables, [batch])
    assert acts
    any_path = next(iter(acts))
    assert acts[any_path].ndim == 1
    imp = convert_activation_to_importance(acts, square=False)
    assert np.all(np.asarray(imp[any_path]) >= 0)


def test_aux_tuners():
    from vlm_compression_tpu.compression.tuners import (
        BottleneckAdapter,
        BottleneckConfig,
        PrefixTuning,
        PrefixTuningConfig,
        PromptTuning,
        PromptTuningConfig,
    )

    x = jnp.ones((2, 5, 16))
    mask = jnp.ones((2, 5), jnp.int32)
    pt = PromptTuning(PromptTuningConfig(num_virtual_tokens=3, token_dim=16))
    v = pt.init(jax.random.key(0), x, mask)
    out, m = pt.apply(v, x, mask)
    assert out.shape == (2, 8, 16) and m.shape == (2, 8)

    pf = PrefixTuning(PrefixTuningConfig(num_virtual_tokens=4, token_dim=16,
                                         num_layers=2, num_heads=2,
                                         encoder_hidden_size=8))
    v = pf.init(jax.random.key(0), 2)
    kv = pf.apply(v, 2)
    assert kv.shape == (2, 2, 2, 4, 2, 8)

    ba = BottleneckAdapter(BottleneckConfig(bottleneck_size=4))
    v = ba.init(jax.random.key(0), x)
    out = ba.apply(v, x)
    assert out.shape == x.shape


def test_model_size_accounting_counts_masked_kernels():
    import numpy as np

    from vlm_compression_tpu.compression.peft_io import model_size_accounting

    mask = np.zeros((4, 8), bool)
    mask[:2] = True                      # 16 of 32 kept
    variables = {
        "params": {"enc": {"q": {"kernel": np.zeros((4, 8)),
                                 "bias": np.zeros((8,))},
                           "ln": {"scale": np.zeros((4,))}}},
        "masks": {"enc": {"q": {"mask": mask}}},
    }
    s = model_size_accounting(variables)
    assert s["orig_total_size"] == 32 + 8 + 4
    assert s["distilled_total_size"] == 16 + 8 + 4


def test_vqa_task_reports_model_size(tmp_path):
    import json

    from vlm_compression_tpu.tasks.vqa import VQATask

    task = VQATask()
    res = [{"question_id": 1, "answer": "blue",
            "gt_answers": ["blue"] * 10}]
    (tmp_path / "result").mkdir()
    metrics = task.after_evaluation(
        res, split_name="val", result_dir=str(tmp_path / "result"),
        orig_total_size=4_000_000_000, distilled_total_size=2_000_000_000)
    assert metrics["orig_size"] == "4.000 B"
    assert metrics["dist_size"] == "2.000 B"
    assert metrics["agg_metrics"] == 100.0
    logged = (tmp_path / "evaluate.txt").read_text()
    assert "orig_size" in logged and json.loads(logged.splitlines()[-1])


def test_model_size_accounting_zeroed_weights_no_masks():
    """lora_model=False prunes zero weights and skip masks — survivors
    must come from count_nonzero, not mask shapes."""
    import numpy as np

    from vlm_compression_tpu.compression.peft_io import model_size_accounting

    k = np.ones((4, 8), np.float32)
    k[2:] = 0.0                                   # half pruned, no mask
    s = model_size_accounting({"params": {"q": {"kernel": k}}})
    assert s["orig_total_size"] == 32
    assert s["distilled_total_size"] == 16


def test_model_size_accounting_packed_masks():
    import numpy as np

    from vlm_compression_tpu.compression.peft_io import model_size_accounting
    from vlm_compression_tpu.ops.bitmask import pack_mask

    rng = np.random.default_rng(0)
    mask = rng.random((128, 8)) < 0.25
    import jax.numpy as jnp

    variables = {
        "params": {"q": {"kernel": np.ones((128, 8), np.float32)}},
        "masks": {"q": {"mask": pack_mask(jnp.asarray(mask))}},
    }
    s = model_size_accounting(variables)
    assert s["orig_total_size"] == 128 * 8
    assert s["distilled_total_size"] == int(mask.sum())


def test_model_size_accounting_int4_kernels():
    import numpy as np

    from vlm_compression_tpu.compression.peft_io import model_size_accounting
    from vlm_compression_tpu.ops.quant import quantize_params_tree_int4

    rng = np.random.default_rng(1)
    w = rng.standard_normal((128, 8)).astype(np.float32)
    qp = quantize_params_tree_int4({"q": {"kernel": w}})
    s = model_size_accounting({"params": qp})
    # kernel_q4 counts its unpacked numel; kernel_scale is excluded
    assert s["orig_total_size"] == 128 * 8
    assert 0 < s["distilled_total_size"] <= 128 * 8
