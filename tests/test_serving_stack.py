"""The full serving story chained end-to-end on one tiny model:

    calibration prune (Wanda, 50%) → int8 KV decode cache →
    speculative decoding (pruned student drafts, dense teacher verifies)

Each piece is unit-tested elsewhere; this pins the COMPOSITION a user
of the reference would actually deploy — and that the speculative
output still equals the dense teacher's greedy decode after real masks
make draft and target genuinely different networks."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlm_compression_tpu.compression import load_pruner
from vlm_compression_tpu.compression.pruners.base import FlaxModel
from vlm_compression_tpu.models.blip2_t5_instruct import (
    Blip2T5Instruct, Blip2T5InstructConfig, generate_t5)
from vlm_compression_tpu.models.eva_vit import EvaViTConfig
from vlm_compression_tpu.models.generation import GenerationConfig
from vlm_compression_tpu.models.qformer import QFormerConfig
from vlm_compression_tpu.models.t5 import T5Config

pytestmark = pytest.mark.slow


def test_prune_int8kv_speculative_serving():
    rng = jax.random.PRNGKey(7)
    cfg = Blip2T5InstructConfig(
        vit=EvaViTConfig.tiny(param_dtype="float32", dtype="float32"),
        qformer=QFormerConfig.tiny(dtype="float32"),
        t5=T5Config.tiny(param_dtype="float32", dtype="float32",
                         kv_cache_int8=True),
    )
    module = Blip2T5Instruct(cfg)
    batch = dict(
        image=jax.random.normal(rng, (2, 28, 28, 3)),
        input_ids=jnp.ones((2, 6), jnp.int32),
        attention_mask=jnp.ones((2, 6), jnp.int32),
        labels=jax.random.randint(rng, (2, 4), 1, cfg.t5.vocab_size),
        qformer_input_ids=jnp.ones((2, 6), jnp.int32),
        qformer_attention_mask=jnp.ones((2, 6), jnp.int32),
    )
    variables = module.init(rng, **batch)

    # 1. calibration prune: REAL masks so student != teacher
    pruner = load_pruner(
        "blipt5_wanda_pruner", FlaxModel(module, variables), [batch],
        t5_prune_spec="2-0.5-1.0-1.0", vit_prune_spec="2-0.5-1.0-1.0",
        num_samples=2)
    pruned, _ = pruner.prune(lora_model=True)
    t5_mask = pruned.variables["masks"]["t5_model"]["encoder"][
        "blocks_0"]["self_attn"]["q"]["mask"]
    assert abs(float(np.asarray(t5_mask).mean()) - 0.5) < 0.05

    # 2+3. int8 KV cache + speculative serve: masked student drafts,
    # dense teacher verifies — output == dense greedy, exactly
    gcfg = GenerationConfig(num_beams=1, max_length=8, eos_token_id=1,
                            pad_token_id=0)
    ids = jnp.asarray([[4, 5, 6, 7, 8], [9, 10, 11, 12, 13]], jnp.int32)
    mask = jnp.ones((2, 5), jnp.int32)
    want = generate_t5(module, pruned.variables, batch["image"], ids, mask,
                       ids, mask, gen_cfg=gcfg, llm_mode="dense")
    got = generate_t5(module, pruned.variables, batch["image"], ids, mask,
                      ids, mask, gen_cfg=gcfg, llm_mode="dense",
                      draft_llm_mode="masked", speculative_gamma=3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # the pruned student really is a different network (masks bite):
    # its own greedy decode may differ from the teacher's
    student = generate_t5(module, pruned.variables, batch["image"], ids,
                          mask, ids, mask, gen_cfg=gcfg,
                          llm_mode="masked")
    assert student.shape == want.shape

    # int8 cache variables actually existed during the decode
    cfg_fp = dataclasses.replace(cfg, t5=dataclasses.replace(
        cfg.t5, kv_cache_int8=False))
    fp = generate_t5(Blip2T5Instruct(cfg_fp), pruned.variables,
                     batch["image"], ids, mask, ids, mask, gen_cfg=gcfg,
                     llm_mode="dense")
    # tiny logits gaps dwarf the 0.3% KV round-trip: same tokens
    np.testing.assert_array_equal(np.asarray(want), np.asarray(fp))
