"""int8 decode KV cache (beyond-reference serving feature).

The reference threads HF past_key_values in bf16/f32
(modeling_t5.py:491-653); here the cache can store int8 codes + absmax
scales (models/kvcache.py).  Quantization error must stay small, decode
must stay coherent with the full-precision path, and speculative
decoding's cache_index rollback must keep working."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from vlm_compression_tpu.models.generation import (
    GenerationConfig, make_t5_step, t5_generate)
from vlm_compression_tpu.models.kvcache import dequantize_kv, quantize_kv
from vlm_compression_tpu.models.t5 import T5Config, T5ForConditionalGeneration
from vlm_compression_tpu.models.llama import LlamaConfig, LlamaForCausalLM
import pytest


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 7, 4, 32)) * 3.0, jnp.float32)
    codes, scales = quantize_kv(x)
    assert codes.dtype == jnp.int8 and scales.shape == (2, 7, 4)
    back = dequantize_kv(codes, scales, jnp.float32)
    rel = float(jnp.linalg.norm(back - x) / jnp.linalg.norm(x))
    assert rel < 0.006  # per-(token,head) absmax int8: ~0.3% RMS


@pytest.mark.slow  # int8 cache fast-covered by the llama variant
def test_t5_decode_int8_matches_full_logits():
    """One decode step: int8-cached logits close to full-precision (the
    only difference is the KV round-trip)."""
    cfg = T5Config.tiny(dtype="float32", param_dtype="float32")
    cfg8 = dataclasses.replace(cfg, kv_cache_int8=True)
    model, model8 = (T5ForConditionalGeneration(c) for c in (cfg, cfg8))
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)))
    amask = jnp.ones((2, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, amask,
                        jnp.zeros((2, 3), jnp.int32))
    enc = model.apply(params, ids, None, amask, "masked",
                      method=model.encode)

    outs = []
    for m in (model, model8):
        step, cache = make_t5_step(m, params, enc, amask, "masked", 8)
        tok = jnp.zeros((2, 1), jnp.int32)
        logits1, cache = step(tok, cache)
        logits2, _ = step(jnp.full((2, 1), 5, jnp.int32), cache)
        outs.append(np.asarray(logits2))
    np.testing.assert_allclose(outs[0], outs[1], atol=0.02, rtol=0.05)


def test_t5_generate_int8_cache_end_to_end():
    cfg = T5Config.tiny(dtype="float32", param_dtype="float32",
                        kv_cache_int8=True)
    model = T5ForConditionalGeneration(cfg)
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 6)))
    amask = jnp.ones((2, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, amask,
                        jnp.zeros((2, 3), jnp.int32))
    gcfg = GenerationConfig(max_length=8, eos_token_id=1, pad_token_id=0)
    seqs = t5_generate(model, params, ids, amask, cfg=gcfg)
    assert seqs.shape == (2, 8)
    # tiny random logit gaps dwarf the 0.3% KV error: sequences match
    full = t5_generate(
        T5ForConditionalGeneration(
            dataclasses.replace(cfg, kv_cache_int8=False)),
        params, ids, amask, cfg=gcfg)
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(full))


def _llama_decode_logits(cfg, params, prime_ids, positions_prime, tok,
                         pos_tok):
    """Prime the cache with a chunk, take one more step; rotary positions
    passed explicitly so the cached-slot offsets are exercised."""
    model = LlamaForCausalLM(cfg)
    _, cvars = model.apply(
        params, jnp.zeros((2, 12), jnp.int32), decode=True,
        mutable=["cache"])
    cache = cvars["cache"]
    logits, cvars = model.apply(
        {**params, "cache": cache}, prime_ids, decode=True,
        positions=positions_prime, mutable=["cache"])
    cache = cvars["cache"]
    logits, _ = model.apply(
        {**params, "cache": cache}, tok, decode=True, positions=pos_tok,
        mutable=["cache"])
    return np.asarray(logits)


def test_llama_decode_int8_matches_full_logits():
    """Multi-token priming + one cached step through the llama path:
    int8-cached logits must track the full-precision cache closely (a
    misplaced scale slot or position offset would blow this apart)."""
    cfg = LlamaConfig.tiny(dtype="float32", param_dtype="float32")
    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(3)
    prime = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 5)))
    params = model.init(jax.random.PRNGKey(0), prime)
    pos_p = jnp.broadcast_to(jnp.arange(5)[None], (2, 5))
    tok = jnp.asarray(rng.integers(1, cfg.vocab_size, (2, 1)))
    pos_t = jnp.full((2, 1), 5, jnp.int32)

    full = _llama_decode_logits(cfg, params, prime, pos_p, tok, pos_t)
    q8 = _llama_decode_logits(
        dataclasses.replace(cfg, kv_cache_int8=True),
        params, prime, pos_p, tok, pos_t)
    assert full.shape == (2, 1, cfg.vocab_size)
    np.testing.assert_allclose(q8, full, atol=0.02, rtol=0.05)
    # int8 cache variables actually exist in the quantized run
    m8 = LlamaForCausalLM(dataclasses.replace(cfg, kv_cache_int8=True))
    _, cvars = m8.apply(params, jnp.zeros((2, 12), jnp.int32),
                        decode=True, mutable=["cache"])
    leaves = [jax.tree_util.keystr(p)
              for p, _ in jax.tree_util.tree_leaves_with_path(
                  cvars["cache"])]
    assert any("cached_key_scale" in s for s in leaves)
