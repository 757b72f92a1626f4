"""LLaMA tower + InstructBLIP-Vicuna: forward, HF parity, cache decode,
generation, pruning, and KD training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_compression_tpu.models.blip2_vicuna_instruct import (
    Blip2VicunaInstruct,
    Blip2VicunaInstructConfig,
    generate_vicuna,
)
from vlm_compression_tpu.models.generation import GenerationConfig
from vlm_compression_tpu.models.llama import (
    LlamaConfig,
    LlamaForCausalLM,
    make_causal_step,
)

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow



def _tiny_llama():
    cfg = LlamaConfig.tiny()
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray([[1, 5, 9, 3, 7, 2], [1, 8, 4, 4, 6, 2]], jnp.int32)
    mask = jnp.ones_like(ids)
    variables = dict(model.init(jax.random.key(0), ids, mask))
    return model, variables, ids, mask


def _tiny_vicuna():
    cfg = Blip2VicunaInstructConfig.tiny()
    model = Blip2VicunaInstruct(cfg)
    b = 2
    batch = dict(
        image=jnp.ones((b, 28, 28, 3), jnp.float32) * 0.1,
        text_input_ids=jnp.asarray(
            [[1, 5, 9, 3, 7, 0], [1, 8, 4, 4, 0, 0]], jnp.int32),
        text_attention_mask=jnp.asarray(
            [[1, 1, 1, 1, 1, 0], [1, 1, 1, 1, 0, 0]], jnp.int32),
        labels=jnp.asarray(
            [[-100, -100, 3, 7, 2, -100], [-100, 4, 4, 2, -100, -100]],
            jnp.int32),
        qformer_input_ids=jnp.ones((b, 4), jnp.int32),
        qformer_attention_mask=jnp.ones((b, 4), jnp.int32),
    )
    variables = dict(model.init(jax.random.key(0), **batch))
    return model, variables, batch


def test_llama_forward_and_loss():
    model, variables, ids, mask = _tiny_llama()
    out = model.apply(variables, ids, mask, labels=ids)
    assert out["logits"].shape == (2, 6, 96)
    assert np.isfinite(float(out["loss"]))
    # dense vs masked identical while masks are all-True
    dense = model.apply(variables, ids, mask, mode="dense")
    masked = model.apply(variables, ids, mask, mode="masked")
    np.testing.assert_allclose(np.asarray(dense), np.asarray(masked),
                               rtol=1e-4, atol=1e-5)


def test_llama_matches_hf_transformers():
    """Same weights → same logits as HF LlamaForCausalLM (fp32)."""
    transformers = pytest.importorskip("transformers")
    import torch

    hf_cfg = transformers.LlamaConfig(
        vocab_size=96, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, use_cache=False,
        tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig.tiny(param_dtype="float32", dtype="float32")
    model = LlamaForCausalLM(cfg)
    ids_np = np.array([[1, 5, 9, 3, 7, 2]], np.int64)
    variables = model.init(jax.random.key(0),
                           jnp.asarray(ids_np, jnp.int32))

    sd = hf.state_dict()

    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    params = {"embed_tokens": {"embedding": t2j(sd["model.embed_tokens.weight"])},
              "final_norm": {"scale": t2j(sd["model.norm.weight"])},
              "lm_head": {"kernel": t2j(sd["lm_head.weight"]).T}}
    for i in range(2):
        p = f"model.layers.{i}."
        params[f"blocks_{i}"] = {
            "input_ln": {"scale": t2j(sd[p + "input_layernorm.weight"])},
            "post_attn_ln": {
                "scale": t2j(sd[p + "post_attention_layernorm.weight"])},
            "self_attn": {
                "q_proj": {"kernel": t2j(sd[p + "self_attn.q_proj.weight"]).T},
                "k_proj": {"kernel": t2j(sd[p + "self_attn.k_proj.weight"]).T},
                "v_proj": {"kernel": t2j(sd[p + "self_attn.v_proj.weight"]).T},
                "o_proj": {"kernel": t2j(sd[p + "self_attn.o_proj.weight"]).T},
            },
            "mlp": {
                "gate_proj": {"kernel": t2j(sd[p + "mlp.gate_proj.weight"]).T},
                "up_proj": {"kernel": t2j(sd[p + "mlp.up_proj.weight"]).T},
                "down_proj": {"kernel": t2j(sd[p + "mlp.down_proj.weight"]).T},
            },
        }
    variables = {"params": params, "masks": dict(variables)["masks"]}

    with torch.no_grad():
        ref = hf(torch.tensor(ids_np)).logits.numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(ids_np, jnp.int32)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_llama_cached_decode_matches_full():
    model, variables, ids, mask = _tiny_llama()
    full = model.apply(variables, ids)          # (2, 6, V)

    embeds = model.apply(variables, ids[:, :3], method=model.embed_tokens)
    step, cache = make_causal_step(model, variables, embeds,
                                   jnp.ones((2, 3), jnp.int32),
                                   max_decode_len=3)
    outs = []
    for t in range(3, 6):
        logits, cache = step(ids[:, t: t + 1], cache)
        outs.append(logits[:, 0])
    stepped = jnp.stack(outs, axis=1)
    # cached logits at position t must match full forward positions 3..5
    np.testing.assert_allclose(np.asarray(stepped),
                               np.asarray(full[:, 3:6]),
                               rtol=2e-2, atol=2e-3)


def test_vicuna_forward_loss():
    model, variables, batch = _tiny_vicuna()
    out = model.apply(variables, **batch)
    assert np.isfinite(float(out["loss"]))
    # teacher mode runs from params alone
    t = model.apply({"params": variables["params"]}, **batch,
                    vit_mode="dense", llm_mode="dense", qformer_mode="dense")
    assert np.isfinite(float(t["loss"]))


def test_vicuna_generate_shapes():
    model, variables, batch = _tiny_vicuna()
    prompt = jnp.asarray([[0, 1, 5, 9], [1, 8, 4, 4]], jnp.int32)
    pmask = jnp.asarray([[0, 1, 1, 1], [1, 1, 1, 1]], jnp.int32)
    for beams in (1, 2):
        seqs = generate_vicuna(
            model, variables, batch["image"], prompt, pmask,
            batch["qformer_input_ids"], batch["qformer_attention_mask"],
            gen_cfg=GenerationConfig(max_length=5, num_beams=beams,
                                     eos_token_id=2, pad_token_id=0))
        assert seqs.shape == (2, 5)
        np.testing.assert_array_equal(np.asarray(seqs[:, 0]),
                                      np.asarray(prompt[:, -1]))


def test_vicuna_wanda_prune_end_to_end():
    from vlm_compression_tpu.compression import load_pruner
    from vlm_compression_tpu.compression.pruners.base import FlaxModel

    model, variables, batch = _tiny_vicuna()
    pruner = load_pruner(
        "blipt5_wanda_pruner", FlaxModel(model, variables), [batch],
        t5_prune_spec="2-0.5-1.0-1.0", vit_prune_spec="2-0.5-1.0-1.0",
        num_samples=2, t5_model_prefix="llm_model")
    fm, _ = pruner.prune(lora_model=True)

    dens = []

    def walk(node, path=()):
        for k, v in node.items():
            if k == "mask" and any(p.startswith("blocks_") for p in path):
                dens.append(float(jnp.mean(v)))
            elif isinstance(v, dict):
                walk(v, path + (k,))

    walk(fm.variables["masks"]["llm_model"])
    assert dens and np.mean(dens) == pytest.approx(0.5, abs=0.05)
    out = model.apply(fm.variables, **batch)
    assert np.isfinite(float(out["loss"]))


def test_vicuna_kd_train_step():
    from vlm_compression_tpu.common.optims import make_adamw
    from vlm_compression_tpu.tasks.retrain import (
        RessaTrainState,
        make_kd_train_step,
    )

    cfg = Blip2VicunaInstructConfig(
        vit=__import__("vlm_compression_tpu.models.eva_vit",
                       fromlist=["EvaViTConfig"]).EvaViTConfig.tiny(
                           lora_rank=4),
        qformer=__import__("vlm_compression_tpu.models.qformer",
                           fromlist=["QFormerConfig"]).QFormerConfig.tiny(
                               lora_rank=2),
        llm=LlamaConfig.tiny(lora_rank=8),
    )
    model = Blip2VicunaInstruct(cfg)
    _, _, batch = _tiny_vicuna()
    variables = dict(model.init(
        jax.random.key(0), **batch, vit_mode="sparse_lora",
        llm_mode="sparse_lora", qformer_mode="sparse_lora"))
    tx = make_adamw()
    state = RessaTrainState.create(variables, tx)
    step = jax.jit(make_kd_train_step(model, tx, kl_weight=0.1, T=1.0))
    state, metrics = step(state, batch, 1e-3)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_predict_class_vicuna_ranking_surface():
    """predict_class counterpart for the decoder-only composition
    (reference blip2_vicuna_instruct.predict_class :445-583)."""
    from vlm_compression_tpu.models.blip2_vicuna_instruct import (
        Blip2VicunaInstruct,
        Blip2VicunaInstructConfig,
        predict_class_vicuna,
    )

    cfg = Blip2VicunaInstructConfig.tiny()
    m = Blip2VicunaInstruct(cfg)
    b = 2
    batch = dict(image=jnp.ones((b, 28, 28, 3), jnp.float32) * 0.1,
                 text_input_ids=jnp.ones((b, 6), jnp.int32),
                 text_attention_mask=jnp.ones((b, 6), jnp.int32),
                 labels=jnp.ones((b, 6), jnp.int32),
                 qformer_input_ids=jnp.ones((b, 4), jnp.int32),
                 qformer_attention_mask=jnp.ones((b, 4), jnp.int32))
    v = dict(m.init(jax.random.key(0), **batch))
    # duplicate candidate 0 as candidate 2: scores must match exactly
    cands = jnp.asarray([[5, 9, 0], [7, 2, 0], [5, 9, 0]], jnp.int32)
    cmask = jnp.asarray([[1, 1, 0], [1, 1, 0], [1, 1, 0]], jnp.int32)
    nll = np.asarray(predict_class_vicuna(
        m, v, batch["image"], batch["text_input_ids"],
        batch["text_attention_mask"], cands, cmask,
        batch["qformer_input_ids"], batch["qformer_attention_mask"]))
    assert nll.shape == (2, 3)
    assert np.all(np.isfinite(nll))
    np.testing.assert_allclose(nll[:, 0], nll[:, 2], rtol=1e-6)
    # distinct candidates score differently on a random model
    assert np.all(np.abs(nll[:, 0] - nll[:, 1]) > 1e-6)


def test_vqa_rank_step_vicuna():
    """VQATask answer-list ranking drives the decoder-only path too."""
    from vlm_compression_tpu.compression.pruners.base import FlaxModel
    from vlm_compression_tpu.datasets.tokenization import SimpleTokenizer
    from vlm_compression_tpu.models.blip2_vicuna_instruct import (
        Blip2VicunaInstruct,
        Blip2VicunaInstructConfig,
    )
    from vlm_compression_tpu.tasks.vqa import VQATask

    cfg = Blip2VicunaInstructConfig.tiny()
    m = Blip2VicunaInstruct(cfg)
    b = 2
    batch = dict(image=jnp.ones((b, 28, 28, 3), jnp.float32) * 0.1,
                 text_input_ids=jnp.ones((b, 6), jnp.int32),
                 text_attention_mask=jnp.ones((b, 6), jnp.int32),
                 labels=jnp.ones((b, 6), jnp.int32),
                 qformer_input_ids=jnp.ones((b, 4), jnp.int32),
                 qformer_attention_mask=jnp.ones((b, 4), jnp.int32))
    v = dict(m.init(jax.random.key(0), **batch))
    task = VQATask(tokenizer=SimpleTokenizer(vocab_size=96), max_len=4)
    task.answer_list = ["yes", "no", "maybe"]
    res = task.valid_step(FlaxModel(m, v), {
        "image": np.ones((b, 28, 28, 3), np.float32),
        "text_input": ["is it?", "really?"],
        "question_id": [1, 2],
    })
    assert len(res) == 2
    assert all(r["answer"] in task.answer_list for r in res)
