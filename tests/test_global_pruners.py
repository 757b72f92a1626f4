"""Global pruner family: mag/rand/aobd/mezo on the tiny joint model."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_compression_tpu.compression import load_pruner
from vlm_compression_tpu.compression.pruners.base import FlaxModel
from vlm_compression_tpu.compression.pruners.global_pruner import (
    global_mask,
    layerwise_mask,
)
from vlm_compression_tpu.models.blip2_t5_instruct import (
    Blip2T5Instruct,
    Blip2T5InstructConfig,
)


def _tiny_blip():
    cfg = Blip2T5InstructConfig.tiny()
    model = Blip2T5Instruct(cfg)
    b = 2
    batch = dict(
        image=jnp.ones((b, 28, 28, 3), jnp.float32) * 0.2,
        input_ids=jnp.arange(b * 6, dtype=jnp.int32).reshape(b, 6) % 50,
        attention_mask=jnp.ones((b, 6), jnp.int32),
        labels=(jnp.arange(b * 5, dtype=jnp.int32).reshape(b, 5) % 50) + 1,
        qformer_input_ids=jnp.ones((b, 6), jnp.int32),
        qformer_attention_mask=jnp.ones((b, 6), jnp.int32),
    )
    variables = dict(model.init(jax.random.key(0), **batch))
    return model, variables, batch


def _block_density(variables):
    """Weighted density over block-linear kernels (nonzero fraction)."""
    num = den = 0

    def walk(node, in_block=False):
        nonlocal num, den
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, in_block or k.startswith("blocks_"))
            elif k == "kernel" and getattr(v, "ndim", 0) == 2 and in_block:
                num += int(jnp.sum(v != 0))
                den += v.size

    walk(variables["params"])
    return num / den


def test_global_mask_threshold_semantics():
    scores = {"a": jnp.asarray([[1.0, 2.0], [3.0, 4.0]]),
              "b": jnp.asarray([[5.0, 6.0], [7.0, 8.0]])}
    masks = global_mask(scores, p=0.5, max_sparsity_per_layer=1.0)
    # 4 of 8 dropped: exactly scores > 4 survive
    assert not bool(masks["a"].any())
    assert bool(masks["b"].all())


def test_layerwise_mask_per_layer_budget():
    scores = {"a": jnp.asarray(np.random.RandomState(0).rand(8, 8)),
              "b": jnp.asarray(np.random.RandomState(1).rand(8, 8))}
    masks = layerwise_mask(scores, p=0.25)
    for m in masks.values():
        assert float(m.mean()) == pytest.approx(0.75, abs=0.02)


@pytest.mark.parametrize("name,kwargs", [
    ("blipt5_mag_pruner", {}),
    ("blipt5_mag_pruner", {"is_global": True}),
    ("blipt5_mag_pruner", {"is_global": True, "prune_per_model": True}),
    ("blipt5_absmag_pruner", {}),
    ("blipt5_rand_pruner", {}),
    ("blipt5_aobd_pruner", {}),
])
def test_global_pruners_hit_sparsity(name, kwargs):
    model, variables, batch = _tiny_blip()
    pruner = load_pruner(
        name, FlaxModel(model, variables), [batch],
        t5_prune_spec="2-0.5-1.0-1.0", vit_prune_spec="2-0.5-1.0-1.0",
        num_samples=2, **kwargs)
    fm, _ = pruner.prune()
    d = _block_density(fm.variables)
    assert d == pytest.approx(0.5, abs=0.05)
    # forward still runs on the pruned variables
    out = model.apply(fm.variables, **batch)
    assert np.isfinite(float(out["loss"]))


def test_iterative_schedule_monotone():
    model, variables, batch = _tiny_blip()
    pruner = load_pruner(
        "blipt5_mag_pruner", FlaxModel(model, variables), [batch],
        t5_prune_spec="2-0.5-1.0-1.0", vit_prune_spec="2-0.5-1.0-1.0",
        num_samples=2, iteration=3)
    fm, _ = pruner.prune()
    assert _block_density(fm.variables) == pytest.approx(0.5, abs=0.05)


@pytest.mark.slow
def test_mezo_pruner_layer_granular():
    model, variables, batch = _tiny_blip()
    # scalar-per-layer scores only discriminate under global thresholding
    # (the reference's layerwise path crashes on 1-element score tensors)
    pruner = load_pruner(
        "blipt5_mezo_pruner", FlaxModel(model, variables), [batch],
        t5_prune_spec="2-0.5-1.0-1.0", vit_prune_spec="2-0.5-1.0-1.0",
        num_samples=1, num_noise=1, is_global=True)
    fm, _ = pruner.prune()
    # scalar-per-layer scores → every layer's mask fully kept or fully
    # dropped (weights can contain stray exact zeros from bf16 init)
    fracs = []

    def walk(node, in_block=False):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, in_block or k.startswith("blocks_"))
            elif k == "mask" and in_block:
                frac = float(jnp.mean(v))
                assert frac in (0.0, 1.0)
                fracs.append(frac)

    walk(fm.variables["masks"])
    assert 0.0 in fracs and 1.0 in fracs  # some layers dropped, some kept


def test_masks_collection_matches_zeroed_weights():
    model, variables, batch = _tiny_blip()
    pruner = load_pruner(
        "blipt5_mag_pruner", FlaxModel(model, variables), [batch],
        t5_prune_spec="2-0.5-1.0-1.0", vit_prune_spec="2-0.5-1.0-1.0",
        num_samples=2)
    fm, _ = pruner.prune()

    def walk(p, m, in_block=False):
        for k, v in p.items():
            if isinstance(v, dict):
                walk(v, m.get(k, {}) if isinstance(m, dict) else {},
                     in_block or k.startswith("blocks_"))
            elif k == "kernel" and getattr(v, "ndim", 0) == 2 and in_block:
                mask = m.get("mask")
                if mask is not None:
                    np.testing.assert_array_equal(
                        np.asarray(v) != 0,
                        np.asarray(mask) & (np.asarray(v) != 0))
                    # pruned positions are exactly zero
                    assert not np.any(np.asarray(v)[~np.asarray(mask)])

    walk(fm.variables["params"], fm.variables["masks"])
