"""Multi-chip sharding of the FULL RESSA train step on the 8-device mesh:
data x tensor axes, sharded masks, KD teacher+student+update in one pjit
program (what the driver's dryrun_multichip validates, as a test)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vlm_compression_tpu.common.optims import make_adamw
from vlm_compression_tpu.models.blip2_t5_instruct import (
    Blip2T5Instruct,
    Blip2T5InstructConfig,
)
from vlm_compression_tpu.models.eva_vit import EvaViTConfig
from vlm_compression_tpu.models.qformer import QFormerConfig
from vlm_compression_tpu.models.t5 import T5Config
from vlm_compression_tpu.parallel.mesh import (
    DEFAULT_RULES,
    MeshConfig,
    make_mesh,
    mask_rules,
    shard_params,
)
from vlm_compression_tpu.tasks.retrain import (
    RessaTrainState,
    make_kd_train_step,
)

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow



def test_kd_step_on_data_model_mesh(devices8):
    mesh = make_mesh(MeshConfig(data=4, model=2), devices8)
    cfg = Blip2T5InstructConfig(
        vit=EvaViTConfig.tiny(lora_rank=2),
        qformer=QFormerConfig.tiny(lora_rank=2),
        t5=T5Config.tiny(lora_rank=4),
    )
    model = Blip2T5Instruct(cfg)
    b = 8
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

    with mesh:
        params = shard_params(variables["params"], mesh, DEFAULT_RULES)
        masks = shard_params(variables["masks"], mesh, mask_rules())
        lora = shard_params(variables["lora"], mesh)
        tx = make_adamw()
        state = RessaTrainState.create(
            {"params": params, "masks": masks, "lora": lora}, tx)
        dsh = NamedSharding(mesh, P("data"))
        sbatch = {k: jax.device_put(v, dsh) for k, v in batch.items()}
        step = jax.jit(make_kd_train_step(model, tx, kl_weight=0.1, T=1.0))
        state, metrics = step(state, sbatch, 1e-3)
        state, metrics = step(state, sbatch, 1e-3)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 2
    # at least one kernel leaf actually sharded over the model axis
    sharded = False
    for leaf in jax.tree_util.tree_leaves(state.params):
        if hasattr(leaf, "sharding") and hasattr(leaf.sharding, "spec"):
            if any(ax == "model" for ax in leaf.sharding.spec if ax):
                sharded = True
                break
    assert sharded, "no kernel sharded on the model axis"


def test_sharded_generate_beam_search():
    """Serving path over the mesh: beam-search generate with
    tensor-sharded tower params + data-sharded batch produces the same
    tokens as the unsharded run (GSPMD inserts the collectives)."""
    from vlm_compression_tpu.models.blip2_t5_instruct import generate_t5
    from vlm_compression_tpu.models.generation import GenerationConfig

    cfg = Blip2T5InstructConfig(
        vit=EvaViTConfig.tiny(),
        qformer=QFormerConfig.tiny(),
        t5=T5Config.tiny(),
    )
    model = Blip2T5Instruct(cfg)
    b = 4
    img = jnp.ones((b, cfg.vit.img_size, cfg.vit.img_size, 3), jnp.float32)
    ids = jnp.ones((b, 5), jnp.int32)
    mask = jnp.ones((b, 5), jnp.int32)
    variables = dict(model.init(
        jax.random.key(0), img, ids, mask, jnp.ones((b, 4), jnp.int32),
        ids, mask))
    gen_cfg = GenerationConfig(num_beams=3, max_length=6)

    ref = np.asarray(generate_t5(model, variables, img, ids, mask, ids,
                                 mask, gen_cfg=gen_cfg))

    mesh = make_mesh(MeshConfig(data=4, model=2))
    dsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def shard(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = shard(v)
            elif k == "kernel" and getattr(v, "ndim", 0) == 2 \
                    and v.shape[1] % 2 == 0:
                out[k] = jax.device_put(
                    v, NamedSharding(mesh, P(None, "model")))
            else:
                out[k] = jax.device_put(v, rep)
        return out

    sharded_vars = dict(variables)
    sharded_vars["params"] = shard(variables["params"])
    with mesh:
        got = np.asarray(generate_t5(
            model, sharded_vars,
            jax.device_put(img, dsh), jax.device_put(ids, dsh),
            jax.device_put(mask, dsh), jax.device_put(ids, dsh),
            jax.device_put(mask, dsh), gen_cfg=gen_cfg))
    np.testing.assert_array_equal(got, ref)


def test_multislice_mesh_kd_step():
    """Multi-slice layout: a DCN replica axis over 2 virtual slices x
    (2 data x 2 model) in-slice; one KD step runs and the loss matches
    the flat-mesh run (gradients all-reduce across the replica axis)."""
    from vlm_compression_tpu.parallel.mesh import data_sharding

    cfg = Blip2T5InstructConfig(
        vit=EvaViTConfig.tiny(lora_rank=4),
        qformer=QFormerConfig.tiny(lora_rank=2),
        t5=T5Config.tiny(lora_rank=8),
    )
    model = Blip2T5Instruct(cfg)
    b = 8
    batch = dict(
        image=jnp.ones((b, cfg.vit.img_size, cfg.vit.img_size, 3),
                       jnp.float32) * 0.1,
        input_ids=jnp.ones((b, 6), jnp.int32),
        attention_mask=jnp.ones((b, 6), jnp.int32),
        labels=jnp.ones((b, 5), jnp.int32),
        qformer_input_ids=jnp.ones((b, 4), jnp.int32),
        qformer_attention_mask=jnp.ones((b, 4), jnp.int32),
    )
    variables = dict(model.init(
        jax.random.key(0), **batch, vit_mode="sparse_lora",
        llm_mode="sparse_lora", qformer_mode="sparse_lora"))

    mesh = make_mesh(MeshConfig(data=2, model=2, dcn_data=2))
    assert mesh.axis_names == ("replica", "data", "model")
    assert dict(mesh.shape) == {"replica": 2, "data": 2, "model": 2}

    tx = make_adamw()
    with mesh:
        params = shard_params(variables["params"], mesh, DEFAULT_RULES)
        masks = shard_params(variables["masks"], mesh, mask_rules())
        lora = shard_params(variables["lora"], mesh)
        state = RessaTrainState.create(
            {"params": params, "masks": masks, "lora": lora}, tx)
        step = jax.jit(make_kd_train_step(model, tx, kl_weight=0.1, T=1.0))
        dsh = data_sharding(mesh)
        sharded = {k: jax.device_put(v, dsh) for k, v in batch.items()}
        state2, metrics = step(state, sharded, 1e-3)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_fsdp_rules_kd_step_matches_replicated():
    """FSDP layout (params sharded over the data axis, gathered
    just-in-time by GSPMD) must produce the same loss as replicated
    params."""
    from vlm_compression_tpu.parallel.mesh import FSDP_RULES, data_sharding

    cfg = Blip2T5InstructConfig(
        vit=EvaViTConfig.tiny(lora_rank=4),
        qformer=QFormerConfig.tiny(lora_rank=2),
        t5=T5Config.tiny(lora_rank=8),
    )
    model = Blip2T5Instruct(cfg)
    b = 8
    batch = dict(
        image=jnp.ones((b, cfg.vit.img_size, cfg.vit.img_size, 3),
                       jnp.float32) * 0.1,
        input_ids=jnp.ones((b, 6), jnp.int32),
        attention_mask=jnp.ones((b, 6), jnp.int32),
        labels=jnp.ones((b, 5), jnp.int32),
        qformer_input_ids=jnp.ones((b, 4), jnp.int32),
        qformer_attention_mask=jnp.ones((b, 4), jnp.int32),
    )
    variables = dict(model.init(
        jax.random.key(0), **batch, vit_mode="sparse_lora",
        llm_mode="sparse_lora", qformer_mode="sparse_lora"))
    tx = make_adamw()

    losses = {}
    for name, rules in (("replicated", None), ("fsdp", FSDP_RULES)):
        mesh = make_mesh(MeshConfig(data=4, model=2))
        with mesh:
            params = (shard_params(variables["params"], mesh, rules)
                      if rules else variables["params"])
            masks = (shard_params(variables["masks"], mesh,
                                  mask_rules(FSDP_RULES))
                     if rules else variables["masks"])
            state = RessaTrainState.create(
                {"params": params, "masks": masks,
                 "lora": variables["lora"]}, tx)
            step = jax.jit(make_kd_train_step(model, tx, kl_weight=0.1,
                                              T=1.0))
            sharded = {k: jax.device_put(v, data_sharding(mesh))
                       for k, v in batch.items()}
            _, metrics = step(state, sharded, 1e-3)
            losses[name] = float(metrics["loss"])
    assert losses["fsdp"] == pytest.approx(losses["replicated"], abs=1e-4)
