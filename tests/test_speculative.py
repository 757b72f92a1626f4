"""Speculative decoding: draft-and-verify greedy must reproduce the
target model's plain greedy output token-for-token, for ANY draft.

Reference has no speculative path (HF generate, blip2_t5_instruct.py:
299-432) — this is a beyond-reference serving feature; correctness is
defined against our own greedy_generate (itself HF-parity tested)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlm_compression_tpu.models.generation import (
    GenerationConfig, greedy_generate, make_t5_step, speculative_generate,
    t5_generate, t5_speculative_generate)
from vlm_compression_tpu.models.t5 import T5Config, T5ForConditionalGeneration


def _t5(seed=0):
    cfg = T5Config.tiny(dtype="float32", param_dtype="float32")
    model = T5ForConditionalGeneration(cfg)
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 7)))
    amask = jnp.asarray([[1] * 7, [1] * 5 + [0] * 2])
    params = model.init(jax.random.PRNGKey(seed), ids, amask,
                        jnp.zeros((2, 3), jnp.int32))
    return model, params, ids, amask


def _steps(model, params, ids, amask, gcfg, gamma, mode="masked"):
    enc = model.apply(params, ids, None, amask, mode, method=model.encode)
    max_len = gcfg.max_length + gamma + 1
    return make_t5_step(model, params, enc, amask, mode, max_len), enc


# two combos, not the 2×2 product: each (gamma, rep) pair is a distinct
# compiled program and the plain/penalized branches are both covered
@pytest.mark.parametrize("gamma,rep,minlen", [(4, 1.0, 1), (2, 1.3, 4)])
def test_matches_greedy_same_model(gamma, rep, minlen):
    """Draft == target: every proposal accepted, output == greedy, and
    the verify count collapses to ~max_length/gamma rounds."""
    model, params, ids, amask = _t5(0)
    gcfg = GenerationConfig(max_length=12, min_length=minlen,
                            repetition_penalty=rep, eos_token_id=1,
                            pad_token_id=0)
    (dstep, dcache), _ = _steps(model, params, ids, amask, gcfg, gamma)
    (tstep, tcache), _ = _steps(model, params, ids, amask, gcfg, gamma)
    seqs, lengths, stats = speculative_generate(
        dstep, dcache, tstep, tcache, 2, gcfg, gamma=gamma)

    want, _ = greedy_generate(*_steps(model, params, ids, amask, gcfg, 0)[0],
                              2, gcfg)
    # greedy ran with a longer cache in _steps; rebuild exactly
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(want)[:, :12])
    assert int(stats["rounds"]) <= int(np.ceil(11 / gamma)) + 1
    assert int(stats["committed"]) >= 11 or bool(
        jnp.any(seqs == gcfg.eos_token_id))


@pytest.mark.slow  # strictly weaker than the heterogeneous-draft exactness tests
def test_matches_greedy_with_weak_draft():
    """A DIFFERENT (differently-initialized) draft model: acceptance is
    partial but the output must still be the target's greedy sequence."""
    model, params, ids, amask = _t5(1)
    _, params_draft, _, _ = _t5(99)
    gcfg = GenerationConfig(max_length=10, eos_token_id=1, pad_token_id=0)
    (dstep, dcache), _ = _steps(model, params_draft, ids, amask, gcfg, 3)
    (tstep, tcache), _ = _steps(model, params, ids, amask, gcfg, 3)
    seqs, _, stats = speculative_generate(
        dstep, dcache, tstep, tcache, 2, gcfg, gamma=3)

    want, _ = greedy_generate(*_steps(model, params, ids, amask, gcfg, 0)[0],
                              2, gcfg)
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(want)[:, :10])
    assert int(stats["rounds"]) >= 1


def test_self_speculative_t5_wrapper():
    """draft_mode=masked / target_mode=dense over ONE variables dict —
    output equals dense-mode greedy t5_generate."""
    model, params, ids, amask = _t5(2)
    gcfg = GenerationConfig(max_length=9, eos_token_id=1, pad_token_id=0)
    seqs, lengths, stats = t5_speculative_generate(
        model, params, ids, amask, cfg=gcfg, draft_mode="masked",
        target_mode="dense", gamma=3)
    want = t5_generate(model, params, ids, amask, cfg=gcfg, mode="dense")
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(want))
    assert seqs.shape == (2, 9)
    # tiny random weights: masked == dense (no masks applied), so every
    # proposal is accepted and rounds stay at the γ-commit floor
    assert int(stats["rounds"]) <= int(np.ceil(8 / 3)) + 1


def test_speculative_is_jittable():
    model, params, ids, amask = _t5(3)
    gcfg = GenerationConfig(max_length=8, eos_token_id=1, pad_token_id=0)

    @jax.jit
    def run(params, ids, amask):
        return t5_speculative_generate(model, params, ids, amask, cfg=gcfg,
                                       gamma=2)[0]

    seqs = run(params, ids, amask)
    want = t5_generate(model, params, ids, amask, cfg=gcfg, mode="dense")
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(want))


def test_sampling_mode_matches_target_distribution():
    """Rejection-sampling mode: committed tokens are EXACT samples from
    the processed target distribution regardless of the draft.  Checked
    empirically with synthetic position-independent logits and 8192
    parallel rows: total variation between the first-token histogram and
    softmax(target/temp) must be within sampling noise."""
    V, B = 8, 8192
    rng = np.random.default_rng(42)
    t_logits = jnp.asarray(rng.standard_normal(V) * 1.5, jnp.float32)
    d_logits = jnp.asarray(rng.standard_normal(V) * 1.5, jnp.float32)

    def make_step(logits):
        def step(tokens, cache):
            b, n = tokens.shape
            out = jnp.broadcast_to(logits[None, None], (b, n, V))
            cache = dict(cache, cache_index=cache["cache_index"] + n)
            return out, cache
        return step

    cache0 = {"cache_index": jnp.zeros((), jnp.int32)}
    gcfg = GenerationConfig(max_length=2, do_sample=True, temperature=0.7,
                            top_p=1.0, eos_token_id=V + 5, pad_token_id=0)
    seqs, _, stats = speculative_generate(
        make_step(d_logits), cache0, make_step(t_logits), cache0,
        B, gcfg, gamma=1, rng=jax.random.key(7))
    first = np.asarray(seqs[:, 1])
    hist = np.bincount(first, minlength=V) / B
    want = np.asarray(jax.nn.softmax(t_logits / 0.7))
    tv = 0.5 * np.abs(hist - want).sum()
    assert tv < 0.03, (tv, hist, want)
    # the DRAFT distribution must NOT fit (the test has power)
    want_d = np.asarray(jax.nn.softmax(d_logits / 0.7))
    tv_d = 0.5 * np.abs(hist - want_d).sum()
    assert tv_d > 0.1, "draft and target too similar for this test"


def test_sampling_mode_top_p_and_multiround():
    """gamma=3, top_p<1, L=8 with a synthetic pair: every emitted token
    must lie in the target's top-p nucleus at temperature tau."""
    V, B = 16, 512
    rng = np.random.default_rng(3)
    t_logits = jnp.asarray(rng.standard_normal(V) * 2.0, jnp.float32)
    d_logits = jnp.asarray(rng.standard_normal(V) * 2.0, jnp.float32)

    def make_step(logits):
        def step(tokens, cache):
            b, n = tokens.shape
            out = jnp.broadcast_to(logits[None, None], (b, n, V))
            return out, dict(cache,
                             cache_index=cache["cache_index"] + n)
        return step

    cache0 = {"cache_index": jnp.zeros((), jnp.int32)}
    tau, topp = 0.8, 0.7
    gcfg = GenerationConfig(max_length=8, do_sample=True, temperature=tau,
                            top_p=topp, eos_token_id=V + 5, pad_token_id=0)
    seqs, _, stats = speculative_generate(
        make_step(d_logits), cache0, make_step(t_logits), cache0,
        B, gcfg, gamma=3, rng=jax.random.key(11))
    from vlm_compression_tpu.models.generation import top_p_filter
    allowed = np.asarray(top_p_filter(t_logits[None] / tau, topp)[0]) > -1e6
    emitted = np.asarray(seqs[:, 1:]).ravel()
    assert np.all(allowed[emitted]), "token outside the target nucleus"
    assert int(stats["committed"]) == 7 * 1 or int(stats["rounds"]) >= 3


def _vicuna_setup(seed=0):
    from vlm_compression_tpu.models.blip2_vicuna_instruct import (
        Blip2VicunaInstruct, Blip2VicunaInstructConfig)

    cfg = Blip2VicunaInstructConfig.tiny()
    model = Blip2VicunaInstruct(cfg)
    b = 2
    batch = dict(image=jnp.ones((b, 28, 28, 3), jnp.float32) * 0.1,
                 text_input_ids=jnp.ones((b, 6), jnp.int32),
                 text_attention_mask=jnp.ones((b, 6), jnp.int32),
                 labels=jnp.full((b, 6), -100, jnp.int32),
                 qformer_input_ids=jnp.ones((b, 6), jnp.int32),
                 qformer_attention_mask=jnp.ones((b, 6), jnp.int32))
    variables = dict(model.init(jax.random.PRNGKey(seed), **batch))
    return model, variables, batch


@pytest.mark.slow
def test_vicuna_speculative_matches_greedy():
    """Decoder-only (prefix-primed cache): speculative must equal plain
    greedy under the target mode — exercises the cache_offset rollback
    and the multi-token chunk positions in make_causal_step."""
    from vlm_compression_tpu.models.blip2_vicuna_instruct import (
        generate_vicuna)

    model, variables, batch = _vicuna_setup(4)
    gcfg = GenerationConfig(num_beams=1, max_length=7, eos_token_id=2,
                            pad_token_id=0)
    prompt = jnp.asarray([[5, 6, 7, 8], [9, 10, 11, 12]], jnp.int32)
    pmask = jnp.ones((2, 4), jnp.int32)
    want = generate_vicuna(model, variables, batch["image"], prompt, pmask,
                           batch["qformer_input_ids"],
                           batch["qformer_attention_mask"],
                           gen_cfg=gcfg, llm_mode="dense")
    got = generate_vicuna(model, variables, batch["image"], prompt, pmask,
                          batch["qformer_input_ids"],
                          batch["qformer_attention_mask"],
                          gen_cfg=gcfg, llm_mode="dense",
                          draft_llm_mode="masked", speculative_gamma=3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.slow
def test_opt_speculative_matches_greedy():
    from vlm_compression_tpu.models.blip2_opt import (
        Blip2OPT, Blip2OPTConfig, generate_opt)

    cfg = Blip2OPTConfig.tiny()
    model = Blip2OPT(cfg)
    b = 2
    batch = dict(image=jnp.ones((b, 28, 28, 3), jnp.float32) * 0.1,
                 text_input_ids=jnp.ones((b, 6), jnp.int32),
                 text_attention_mask=jnp.ones((b, 6), jnp.int32),
                 labels=jnp.full((b, 6), -100, jnp.int32))
    variables = dict(model.init(jax.random.PRNGKey(5), **batch))
    gcfg = GenerationConfig(num_beams=1, max_length=7, eos_token_id=2,
                            pad_token_id=1)
    prompt = jnp.asarray([[5, 6, 7, 8], [9, 10, 11, 12]], jnp.int32)
    pmask = jnp.ones((2, 4), jnp.int32)
    want = generate_opt(model, variables, batch["image"], prompt, pmask,
                        gen_cfg=gcfg, llm_mode="dense")
    got = generate_opt(model, variables, batch["image"], prompt, pmask,
                       gen_cfg=gcfg, llm_mode="dense",
                       draft_llm_mode="masked", speculative_gamma=2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_quantized_draft_variables():
    """The wall-clock pairing: an int8-QUANTIZED student tree drafts
    (cheaper steps on the MXU via w8a8), the bf16 teacher verifies —
    output still exactly the teacher's greedy decode."""
    from vlm_compression_tpu.ops.quant import quantize_params_tree

    model, params, ids, amask = _t5(6)
    qparams = dict(params)
    qparams["params"] = quantize_params_tree(params["params"])
    gcfg = GenerationConfig(max_length=9, eos_token_id=1, pad_token_id=0)
    seqs, _, stats = t5_speculative_generate(
        model, params, ids, amask, cfg=gcfg, gamma=3,
        draft_mode="masked", target_mode="dense",
        draft_variables=qparams)
    want = t5_generate(model, params, ids, amask, cfg=gcfg, mode="dense")
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(want))
    assert int(stats["rounds"]) >= 1


# ---------------------------------------------------------------------------
# heterogeneous drafts: a genuinely SMALLER model drafts for the big one
# (the tier that wins wall-clock on TPU — same-size masked drafts cost the
# same MXU FLOPs as the dense target; see BENCH_NOTES "Serving decode")
# ---------------------------------------------------------------------------


def _t5_small_draft(vocab, seed=7):
    cfg = T5Config.tiny(vocab_size=vocab, d_model=8, d_kv=4, d_ff=16,
                        num_layers=1, num_decoder_layers=1, num_heads=2,
                        dtype="float32", param_dtype="float32")
    model = T5ForConditionalGeneration(cfg)
    ids = jnp.zeros((2, 7), jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), ids,
                        jnp.ones((2, 7), jnp.int32),
                        jnp.zeros((2, 3), jnp.int32))
    return model, params


@pytest.mark.slow  # hetero exactness fast-gated by test_heterogeneous_draft_guards
def test_heterogeneous_t5_draft_exact():
    """A 1-layer d_model=8 draft T5 drafting for the 2-layer d_model=16
    target: output must equal the target's own dense greedy sequence."""
    model, params, ids, amask = _t5(3)
    draft, dparams = _t5_small_draft(model.cfg.vocab_size)
    gcfg = GenerationConfig(max_length=11, eos_token_id=1, pad_token_id=0)
    seqs, _, stats = t5_speculative_generate(
        model, params, ids, amask, cfg=gcfg, gamma=3,
        target_mode="dense", draft_mode="dense",
        draft_model=draft, draft_variables=dparams)
    want = t5_generate(model, params, ids, amask, cfg=gcfg, mode="dense")
    np.testing.assert_array_equal(np.asarray(seqs), np.asarray(want))
    assert int(stats["rounds"]) >= 1


def test_heterogeneous_draft_guards():
    model, params, ids, amask = _t5(4)
    draft, dparams = _t5_small_draft(model.cfg.vocab_size + 1)
    gcfg = GenerationConfig(max_length=6, eos_token_id=1, pad_token_id=0)
    with pytest.raises(ValueError, match="vocab"):
        t5_speculative_generate(model, params, ids, amask, cfg=gcfg,
                                draft_model=draft, draft_variables=dparams)
    draft2, dparams2 = _t5_small_draft(model.cfg.vocab_size)
    with pytest.raises(ValueError, match="draft_variables"):
        t5_speculative_generate(model, params, ids, amask, cfg=gcfg,
                                draft_model=draft2)


@pytest.mark.slow  # hetero exactness fast-gated by test_heterogeneous_draft_guards
def test_heterogeneous_causal_draft_exact():
    """Smaller LLaMA drafts for a bigger one through its OWN embedding of
    the same prompt; committed output == target's greedy decode."""
    from vlm_compression_tpu.models.generation import (
        causal_speculative_generate)
    from vlm_compression_tpu.models.llama import (LlamaConfig,
                                                  LlamaForCausalLM,
                                                  make_causal_step)

    rng = np.random.default_rng(0)
    tcfg = LlamaConfig.tiny(dtype="float32", param_dtype="float32")
    target = LlamaForCausalLM(tcfg)
    prompt = jnp.asarray(rng.integers(2, tcfg.vocab_size, (2, 6)),
                         jnp.int32)
    pmask = jnp.asarray([[1] * 6, [0] * 2 + [1] * 4], jnp.int32)
    tparams = target.init(jax.random.PRNGKey(0), prompt)
    dcfg = LlamaConfig.tiny(hidden_size=8, intermediate_size=16,
                            num_layers=1, num_heads=2,
                            dtype="float32", param_dtype="float32")
    draft = LlamaForCausalLM(dcfg)
    dparams = draft.init(jax.random.PRNGKey(5), prompt)

    gcfg = GenerationConfig(max_length=9, eos_token_id=-2, pad_token_id=0)
    seqs, _, stats = causal_speculative_generate(
        target, tparams, prompt, pmask, cfg=gcfg, gamma=3,
        target_mode="dense", draft_mode="dense",
        draft_model=draft, draft_variables=dparams)

    # expected: plain greedy over the target with the same priming
    emb = target.apply(tparams, prompt[:, :-1], method=target.embed_tokens)
    step, cache = make_causal_step(target, tparams, emb, pmask[:, :-1],
                                   mode="dense",
                                   max_decode_len=gcfg.max_length)
    start = prompt[:, -1]

    def stepw(tok, c):
        return step(jnp.where(tok == -1, start[:, None], tok), c)

    import dataclasses as _dc
    want, _ = greedy_generate(
        stepw, cache, 2, _dc.replace(gcfg, decoder_start_token_id=-1))
    want = np.array(want)
    want[:, 0] = np.asarray(start)
    np.testing.assert_array_equal(np.asarray(seqs), want)
    assert int(stats["rounds"]) >= 1
