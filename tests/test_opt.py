"""OPT tower: HF logits parity + loss path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_compression_tpu.models.opt import (
    OPTConfig,
    OPTForCausalLM,
    convert_opt,
)


@pytest.mark.slow  # HF-parity oracle; forward fast-covered by test_opt_loss_and_modes
def test_opt_matches_hf():
    transformers = pytest.importorskip("transformers")
    import torch

    hf_cfg = transformers.OPTConfig(
        vocab_size=96, hidden_size=16, ffn_dim=32, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=64,
        do_layer_norm_before=True, word_embed_proj_dim=16,
        use_cache=False, activation_function="relu", dropout=0.0)
    torch.manual_seed(3)
    hf = transformers.OPTForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_opt(sd, num_layers=2)

    cfg = OPTConfig.tiny(param_dtype="float32", dtype="float32")
    model = OPTForCausalLM(cfg)
    ids = np.array([[2, 5, 9, 3, 7, 4]], np.int64)
    mask = np.ones_like(ids)
    variables = model.init(jax.random.key(0), jnp.asarray(ids, jnp.int32))
    with torch.no_grad():
        ref = hf(torch.tensor(ids),
                 attention_mask=torch.tensor(mask)).logits.numpy()
    got = model.apply({"params": params,
                       "masks": dict(variables)["masks"]},
                      jnp.asarray(ids, jnp.int32),
                      jnp.asarray(mask, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=3e-4, atol=3e-4)


def test_opt_loss_and_modes():
    cfg = OPTConfig.tiny()
    model = OPTForCausalLM(cfg)
    ids = jnp.asarray([[2, 5, 9, 3]], jnp.int32)
    variables = dict(model.init(jax.random.key(0), ids))
    out = model.apply(variables, ids, labels=ids)
    assert np.isfinite(float(out["loss"]))
    dense = model.apply(variables, ids, mode="dense")
    masked = model.apply(variables, ids, mode="masked")
    np.testing.assert_allclose(np.asarray(dense), np.asarray(masked),
                               rtol=1e-4, atol=1e-5)


def test_blip2_opt_forward():
    from vlm_compression_tpu.models.blip2_opt import (
        Blip2OPT,
        Blip2OPTConfig,
    )

    cfg = Blip2OPTConfig.tiny()
    model = Blip2OPT(cfg)
    b = 2
    batch = dict(
        image=jnp.ones((b, 28, 28, 3), jnp.float32) * 0.1,
        text_input_ids=jnp.asarray([[2, 5, 9, 3], [2, 8, 4, 1]], jnp.int32),
        text_attention_mask=jnp.ones((b, 4), jnp.int32),
        labels=jnp.asarray([[-100, 5, 9, 2], [-100, 8, 4, 2]], jnp.int32),
    )
    variables = dict(model.init(jax.random.key(0), **batch))
    out = model.apply(variables, **batch)
    assert np.isfinite(float(out["loss"]))
    teacher = model.apply({"params": variables["params"]}, **batch,
                          vit_mode="dense", llm_mode="dense",
                          qformer_mode="dense")
    assert np.isfinite(float(teacher["loss"]))


@pytest.mark.slow  # generate machinery fast-covered by t5/vicuna generate tests
def test_generate_opt_shapes():
    """BLIP-2-OPT generate (reference blip2_opt.py:171-286 parity
    surface): greedy and beam decodes over the primed OPT KV cache."""
    from vlm_compression_tpu.models.blip2_opt import (
        Blip2OPT,
        Blip2OPTConfig,
        generate_opt,
    )
    from vlm_compression_tpu.models.generation import GenerationConfig

    cfg = Blip2OPTConfig.tiny()
    m = Blip2OPT(cfg)
    b = 2
    batch = dict(image=jnp.ones((b, 28, 28, 3), jnp.float32) * 0.1,
                 text_input_ids=jnp.ones((b, 5), jnp.int32),
                 text_attention_mask=jnp.ones((b, 5), jnp.int32),
                 labels=jnp.ones((b, 5), jnp.int32))
    v = dict(m.init(jax.random.key(0), **batch))
    for beams in (1, 2):
        seqs = generate_opt(
            m, v, batch["image"], batch["text_input_ids"],
            batch["text_attention_mask"],
            gen_cfg=GenerationConfig(num_beams=beams, max_length=5,
                                     eos_token_id=2, pad_token_id=1))
        assert seqs.shape == (2, 5)
        # the seed column is the real last prompt token
        assert np.all(np.asarray(seqs)[:, 0] == 1)


@pytest.mark.slow  # vqa-generate integration fast-covered by the t5 family
def test_vqa_task_generates_with_opt():
    from vlm_compression_tpu.compression.pruners.base import FlaxModel
    from vlm_compression_tpu.datasets.tokenization import SimpleTokenizer
    from vlm_compression_tpu.models.blip2_opt import (
        Blip2OPT,
        Blip2OPTConfig,
    )
    from vlm_compression_tpu.tasks.vqa import VQATask

    cfg = Blip2OPTConfig.tiny()
    m = Blip2OPT(cfg)
    b = 2
    batch = dict(image=jnp.ones((b, 28, 28, 3), jnp.float32) * 0.1,
                 text_input_ids=jnp.ones((b, 5), jnp.int32),
                 text_attention_mask=jnp.ones((b, 5), jnp.int32),
                 labels=jnp.ones((b, 5), jnp.int32))
    v = dict(m.init(jax.random.key(0), **batch))
    task = VQATask(num_beams=2, max_len=4,
                   tokenizer=SimpleTokenizer(vocab_size=96),
                   prompt="Question: {} Short answer:")
    res = task.valid_step(FlaxModel(m, v), {
        "image": np.ones((b, 28, 28, 3), np.float32),
        "text_input": ["what is it?", "who?"],
        "question_id": [1, 2],
    })
    assert len(res) == 2 and all("answer" in r for r in res)
