"""Generation cross-validated against HF ``transformers`` (VERDICT
round-1 item 3): a tiny random T5 goes through the checkpoint converter,
then ``t5_generate`` must reproduce ``hf.generate`` token-for-token for
greedy and beam-search configs with repetition/length penalties and
min_length — the knobs the reference passes to HF generate
(blip2_t5_instruct.py:415-427)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_compression_tpu.models.convert import convert_t5
from vlm_compression_tpu.models.generation import GenerationConfig
from vlm_compression_tpu.models.t5 import T5Config, T5ForConditionalGeneration

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow


transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def pair():
    import torch

    hf_cfg = transformers.T5Config(
        vocab_size=96, d_model=16, d_kv=8, d_ff=32, num_layers=2,
        num_decoder_layers=2, num_heads=2, relative_attention_num_buckets=8,
        relative_attention_max_distance=16, feed_forward_proj="gated-gelu",
        tie_word_embeddings=False, use_cache=True, dropout_rate=0.0,
        decoder_start_token_id=0, pad_token_id=0, eos_token_id=1)
    torch.manual_seed(0)
    hf = transformers.T5ForConditionalGeneration(hf_cfg).eval()

    cfg = T5Config.tiny(relative_attention_num_buckets=8,
                        relative_attention_max_distance=16,
                        param_dtype="float32", dtype="float32")
    model = T5ForConditionalGeneration(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_t5(sd, 2, 2, tie_word_embeddings=False)

    ids = np.array([[4, 9, 12, 3, 7, 1], [30, 22, 9, 41, 2, 1]], np.int64)
    mask = np.ones_like(ids)
    variables = dict(model.init(
        jax.random.key(0), jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32),
        decoder_input_ids=jnp.zeros((2, 1), jnp.int32)))
    variables = jax.tree.map(jnp.asarray,
                             {"params": params, "masks": variables["masks"]})
    return hf, model, variables, ids, mask


CONFIGS = [
    # (name, kwargs shared between HF generate and GenerationConfig)
    ("greedy", dict(num_beams=1, max_length=10, min_length=1)),
    ("beam5", dict(num_beams=5, max_length=10, min_length=1)),
    ("beam5_minlen", dict(num_beams=5, max_length=12, min_length=6)),
    ("beam3_repetition", dict(num_beams=3, max_length=10, min_length=1,
                              repetition_penalty=1.5)),
    ("beam5_length_penalty", dict(num_beams=5, max_length=12, min_length=2,
                                  length_penalty=2.0)),
]


@pytest.mark.parametrize("name,kw", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_generate_matches_hf(pair, name, kw):
    import torch

    from vlm_compression_tpu.models.generation import t5_generate

    hf, model, variables, ids, mask = pair
    with torch.no_grad():
        ref = hf.generate(input_ids=torch.tensor(ids),
                          attention_mask=torch.tensor(mask),
                          early_stopping=False, do_sample=False,
                          **kw).numpy()
    cfg = GenerationConfig(decoder_start_token_id=0, pad_token_id=0,
                           eos_token_id=1, **kw)
    got = np.asarray(t5_generate(model, variables,
                                 jnp.asarray(ids, jnp.int32),
                                 jnp.asarray(mask, jnp.int32), cfg=cfg))
    # HF trims to the longest finished hypothesis; ours is fixed-width
    # pad-filled — compare up to the HF width and require pad beyond it
    width = ref.shape[1]
    np.testing.assert_array_equal(got[:, :width], ref,
                                  err_msg=f"config {name}")
    if got.shape[1] > width:
        # everything past an EOS must be pad
        for row in got:
            row = list(row)
            if 1 in row:
                tail = row[row.index(1) + 1:]
                assert all(t == 0 for t in tail)


# ---------------------------------------------------------------------------
# decoder-only (LLaMA/Vicuna path)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def llama_pair():
    import torch

    from vlm_compression_tpu.models.convert import convert_llama
    from vlm_compression_tpu.models.llama import (
        LlamaConfig,
        LlamaForCausalLM,
    )

    hf_cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, bos_token_id=2,
        eos_token_id=1, pad_token_id=0, tie_word_embeddings=False,
        attn_implementation="eager")
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig.tiny(param_dtype="float32", dtype="float32")
    model = LlamaForCausalLM(cfg)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_llama(sd, 2)
    ids = np.array([[2, 14, 9, 22, 7], [2, 30, 41, 8, 5]], np.int64)
    variables = dict(model.init(jax.random.key(0),
                                jnp.asarray(ids, jnp.int32),
                                jnp.ones_like(jnp.asarray(ids, jnp.int32))))
    variables = jax.tree.map(jnp.asarray,
                             {"params": params, "masks": variables["masks"]})
    return hf, model, variables, ids


@pytest.mark.parametrize("num_beams", [1, 3])
def test_decoder_only_generate_matches_hf(llama_pair, num_beams):
    import dataclasses

    import torch

    from vlm_compression_tpu.models.generation import (
        beam_search,
        greedy_generate,
    )
    from vlm_compression_tpu.models.llama import make_causal_step

    hf, model, variables, ids = llama_pair
    new_tokens = 6
    with torch.no_grad():
        ref = hf.generate(input_ids=torch.tensor(ids),
                          attention_mask=torch.ones_like(torch.tensor(ids)),
                          max_new_tokens=new_tokens, num_beams=num_beams,
                          do_sample=False, early_stopping=False).numpy()

    b, L = ids.shape
    prefix_ids = jnp.asarray(ids[:, :-1], jnp.int32)
    prefix_embeds = model.apply(variables, prefix_ids,
                                method=model.embed_tokens)
    prefix_mask = jnp.ones((b, L - 1), jnp.int32)
    start = jnp.asarray(ids[:, -1], jnp.int32)
    max_len = new_tokens + 1     # start token + generated
    cfg = GenerationConfig(num_beams=num_beams, max_length=max_len,
                           min_length=0, decoder_start_token_id=-1,
                           pad_token_id=0, eos_token_id=1)
    if num_beams > 1:
        prefix_embeds = jnp.repeat(prefix_embeds, num_beams, axis=0)
        prefix_mask = jnp.repeat(prefix_mask, num_beams, axis=0)
        start_b = jnp.repeat(start, num_beams, axis=0)
    else:
        start_b = start
    step, cache = make_causal_step(model, variables, prefix_embeds,
                                   prefix_mask, max_decode_len=max_len)

    def step_with_start(tokens, c):
        tok = jnp.where(tokens[:, 0] == -1, start_b, tokens[:, 0])
        return step(tok[:, None], c)

    if num_beams > 1:
        seqs, _ = beam_search(step_with_start, cache, b, cfg)
    else:
        seqs, _ = greedy_generate(step_with_start, cache, b, cfg)
    seqs = np.asarray(seqs.at[:, 0].set(start))
    # HF returns [prompt ⊕ generated]; ours is [last-prompt-token ⊕ gen]
    want = ref[:, L - 1:]
    width = min(want.shape[1], seqs.shape[1])
    np.testing.assert_array_equal(seqs[:, :width], want[:, :width])
