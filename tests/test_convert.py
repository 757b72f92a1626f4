"""Checkpoint converters: HF logits parity (T5, LLaMA) + structural parity
(EVA ViT, Q-Former, composite) against our init trees."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_compression_tpu.models.convert import (
    convert_eva_vit,
    convert_instructblip,
    convert_llama,
    convert_qformer,
    convert_t5,
)
from vlm_compression_tpu.models.llama import LlamaConfig, LlamaForCausalLM
from vlm_compression_tpu.models.t5 import T5Config, T5ForConditionalGeneration

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow



def _tree_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = tuple(np.shape(v))
    return out


def test_t5_logits_match_hf():
    transformers = pytest.importorskip("transformers")
    import torch

    hf_cfg = transformers.T5Config(
        vocab_size=96, d_model=16, d_kv=8, d_ff=32, num_layers=2,
        num_decoder_layers=2, num_heads=2, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, use_cache=False, dropout_rate=0.0)
    torch.manual_seed(0)
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()

    cfg = T5Config.tiny(relative_attention_num_buckets=8,
                        relative_attention_max_distance=16,
                        param_dtype="float32", dtype="float32")
    model = T5ForConditionalGeneration(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_t5(sd, 2, 2, tie_word_embeddings=False)

    ids = np.array([[4, 9, 12, 3, 7, 1]], np.int64)
    dec = np.array([[0, 5, 8]], np.int64)
    mask = np.ones_like(ids)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids),
                 attention_mask=torch.tensor(mask),
                 decoder_input_ids=torch.tensor(dec)).logits.numpy()

    variables = model.init(jax.random.key(0), jnp.asarray(ids, jnp.int32),
                           jnp.asarray(mask, jnp.int32),
                           decoder_input_ids=jnp.asarray(dec, jnp.int32))
    got = model.apply({"params": params,
                       "masks": dict(variables)["masks"]},
                      jnp.asarray(ids, jnp.int32),
                      jnp.asarray(mask, jnp.int32),
                      decoder_input_ids=jnp.asarray(dec, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_llama_converter_matches_hf():
    transformers = pytest.importorskip("transformers")
    import torch

    hf_cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, use_cache=False,
        tie_word_embeddings=False)
    torch.manual_seed(1)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_llama(sd, num_layers=2)

    cfg = LlamaConfig.tiny(param_dtype="float32", dtype="float32")
    model = LlamaForCausalLM(cfg)
    ids = np.array([[1, 5, 9, 3, 7, 2]], np.int64)
    variables = model.init(jax.random.key(0), jnp.asarray(ids, jnp.int32))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    got = model.apply({"params": params,
                       "masks": dict(variables)["masks"]},
                      jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def _fake_sd_from_shapes(shapes: dict, seed=0):
    rng = np.random.RandomState(seed)
    return {k: rng.randn(*s).astype(np.float32) for k, s in shapes.items()}


def test_eva_vit_structural():
    from vlm_compression_tpu.models.eva_vit import EvaViT, EvaViTConfig

    cfg = EvaViTConfig.tiny(param_dtype="float32")
    model = EvaViT(cfg)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 28, 28, 3), jnp.float32))
    want = _tree_shapes(dict(variables)["params"])

    d = cfg.embed_dim
    sd_shapes = {"cls_token": (1, 1, d), "pos_embed": (1, 5, d),
                 "patch_embed.proj.weight": (d, 3, 14, 14),
                 "patch_embed.proj.bias": (d,)}
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        sd_shapes.update({
            b + "norm1.weight": (d,), b + "norm1.bias": (d,),
            b + "norm2.weight": (d,), b + "norm2.bias": (d,),
            b + "attn.qkv.weight": (3 * d, d),
            b + "attn.q_bias": (d,), b + "attn.v_bias": (d,),
            b + "attn.proj.weight": (d, d), b + "attn.proj.bias": (d,),
            b + "mlp.fc1.weight": (cfg.mlp_hidden_dim, d),
            b + "mlp.fc1.bias": (cfg.mlp_hidden_dim,),
            b + "mlp.fc2.weight": (d, cfg.mlp_hidden_dim),
            b + "mlp.fc2.bias": (d,),
        })
    params = convert_eva_vit(_fake_sd_from_shapes(sd_shapes), cfg.depth)
    got = _tree_shapes(params)
    assert got == want


def test_qformer_structural():
    from vlm_compression_tpu.models.qformer import QFormer, QFormerConfig

    cfg = QFormerConfig.tiny(param_dtype="float32")
    model = QFormer(cfg)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 5, cfg.encoder_width)),
        jnp.ones((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32))
    want = _tree_shapes(dict(variables)["params"])

    h, inter = cfg.hidden_size, cfg.intermediate_size
    sd_shapes = {
        "embeddings.word_embeddings.weight": (cfg.vocab_size, h),
        "embeddings.position_embeddings.weight":
            (cfg.max_position_embeddings, h),
        "embeddings.LayerNorm.weight": (h,),
        "embeddings.LayerNorm.bias": (h,),
    }

    def att(prefix, kv_dim):
        return {
            prefix + ".self.query.weight": (h, h),
            prefix + ".self.query.bias": (h,),
            prefix + ".self.key.weight": (h, kv_dim),
            prefix + ".self.key.bias": (h,),
            prefix + ".self.value.weight": (h, kv_dim),
            prefix + ".self.value.bias": (h,),
            prefix + ".output.dense.weight": (h, h),
            prefix + ".output.dense.bias": (h,),
            prefix + ".output.LayerNorm.weight": (h,),
            prefix + ".output.LayerNorm.bias": (h,),
        }

    for i in range(cfg.num_layers):
        b = f"encoder.layer.{i}"
        sd_shapes.update(att(b + ".attention", h))
        if i % cfg.cross_attention_freq == 0:
            sd_shapes.update(att(b + ".crossattention", cfg.encoder_width))
        for inter_name, out_name in ((".intermediate", ".output"),
                                     (".intermediate_query",
                                      ".output_query")):
            sd_shapes.update({
                b + inter_name + ".dense.weight": (inter, h),
                b + inter_name + ".dense.bias": (inter,),
                b + out_name + ".dense.weight": (h, inter),
                b + out_name + ".dense.bias": (h,),
                b + out_name + ".LayerNorm.weight": (h,),
                b + out_name + ".LayerNorm.bias": (h,),
            })
    qt = np.zeros((1, cfg.num_query_tokens, h), np.float32)
    params = convert_qformer(_fake_sd_from_shapes(sd_shapes),
                             cfg.num_layers, cfg.cross_attention_freq,
                             query_tokens=qt)
    got = _tree_shapes(params)
    assert got == want


def test_instructblip_composite_structural():
    from vlm_compression_tpu.models.factory import build_model

    module, variables = build_model({"arch": "blip2_t5_instruct",
                                     "tiny": True})
    want = _tree_shapes(variables["params"])

    # build a composite sd from the structural pieces above via inverse maps
    # — here we simply check the converter accepts per-tower dicts and the
    # resulting keys are a subset with matching shapes (ln_vision/t5_proj)
    sd = {
        "ln_vision.weight": np.zeros((module.cfg.vit.embed_dim,), np.float32),
        "ln_vision.bias": np.zeros((module.cfg.vit.embed_dim,), np.float32),
        "t5_proj.weight": np.zeros(
            (module.cfg.t5.d_model, module.cfg.qformer.hidden_size),
            np.float32),
        "t5_proj.bias": np.zeros((module.cfg.t5.d_model,), np.float32),
    }
    params = convert_instructblip(sd, module.cfg)
    got = _tree_shapes(params)
    for k, s in got.items():
        assert k in want and want[k] == s, k
