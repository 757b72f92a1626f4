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
