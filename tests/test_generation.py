"""Generation: cache consistency, processor parity vs HF, beam optimality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_compression_tpu.models.generation import (
    GenerationConfig,
    apply_repetition_penalty,
    beam_search,
    greedy_generate,
    make_t5_step,
    t5_generate,
    tile_cache,
    top_p_filter,
)
from vlm_compression_tpu.models.t5 import (
    T5Config,
    T5ForConditionalGeneration,
    shift_right,
)

# compile-heavy: excluded from the fast suite (pytest -m "not slow")
pytestmark = pytest.mark.slow



def _tiny_t5():
    cfg = T5Config.tiny()
    model = T5ForConditionalGeneration(cfg)
    b = 2
    input_ids = jnp.arange(b * 6, dtype=jnp.int32).reshape(b, 6) % 50
    mask = jnp.ones((b, 6), jnp.int32)
    variables = model.init(jax.random.key(0), input_ids, mask,
                           decoder_input_ids=input_ids[:, :3])
    return model, dict(variables), input_ids, mask


def test_cached_decode_matches_full_forward():
    """Step-by-step KV-cached logits must equal the one-shot full forward."""
    model, variables, input_ids, mask = _tiny_t5()
    dec_ids = jnp.asarray([[0, 7, 19, 3], [0, 11, 2, 40]], jnp.int32)

    enc = model.apply(variables, input_ids, None, mask, "masked",
                      method=model.encode)
    full = model.apply(variables, dec_ids, enc, None, mask,
                       method=model.decode)  # (b, 4, V)

    step, cache = make_t5_step(model, variables, enc, mask,
                               max_decode_len=4)
    outs = []
    for t in range(4):
        logits, cache = step(dec_ids[:, t: t + 1], cache)
        outs.append(logits[:, 0])
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full),
                               rtol=2e-2, atol=2e-3)


def test_greedy_matches_manual_argmax_rollout():
    model, variables, input_ids, mask = _tiny_t5()
    cfg = GenerationConfig(max_length=6, eos_token_id=1,
                           decoder_start_token_id=0, pad_token_id=0,
                           min_length=1)
    enc = model.apply(variables, input_ids, None, mask, "masked",
                      method=model.encode)
    step, cache = make_t5_step(model, variables, enc, mask,
                               max_decode_len=cfg.max_length)
    seqs, _ = greedy_generate(step, cache, 2, cfg)

    # manual cacheless rollout
    cur = jnp.zeros((2, 1), jnp.int32)
    for t in range(1, 6):
        logits = model.apply(variables, cur, enc, None, mask,
                             method=model.decode)
        nxt = jnp.argmax(logits[:, -1].at[..., 1].add(
            0.0 if t >= cfg.min_length else -1e7), axis=-1)
        cur = jnp.concatenate([cur, nxt[:, None].astype(jnp.int32)], axis=1)
    # compare until first EOS per row
    for b in range(2):
        ref = np.asarray(cur[b])
        got = np.asarray(seqs[b])
        for t in range(1, 6):
            assert got[t] == ref[t]
            if ref[t] == 1:
                break


def test_repetition_penalty_matches_hf():
    transformers = pytest.importorskip("transformers")
    import torch

    proc = transformers.RepetitionPenaltyLogitsProcessor(penalty=1.5)
    rng = np.random.RandomState(0)
    logits = rng.randn(2, 11).astype(np.float32)
    seqs = np.array([[3, 5, 5, 0], [1, 2, 0, 0]])
    ref = proc(torch.tensor(seqs), torch.tensor(logits)).numpy()
    valid = np.ones_like(seqs, bool)
    got = apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(seqs), jnp.asarray(valid), 1.5)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-6)


def test_top_p_matches_hf():
    transformers = pytest.importorskip("transformers")
    import torch

    warper = transformers.TopPLogitsWarper(top_p=0.8)
    rng = np.random.RandomState(1)
    logits = rng.randn(3, 17).astype(np.float32)
    ref = warper(None, torch.tensor(logits)).numpy()
    got = np.asarray(top_p_filter(jnp.asarray(logits), 0.8))
    # same kept set (filtered entries are large-negative in both)
    np.testing.assert_array_equal(got < -1e6, ref < -1e6)
    kept = ref > -1e6
    np.testing.assert_allclose(got[kept], ref[kept], rtol=1e-6)


def test_beam_search_finds_higher_likelihood_than_greedy():
    """On a crafted step function greedy is suboptimal; beam must win.

    Vocab {0:pad, 1:eos, 2, 3}. From start, token 2 has prob .55 but leads
    to a low-prob continuation; token 3 has .45 then certain eos."""
    logp_first = jnp.log(jnp.asarray([1e-9, 1e-9, 0.55, 0.45 - 2e-9]))

    def step_fn(tokens, cache):
        t = tokens[:, 0]
        after2 = jnp.log(jnp.asarray([1e-9, 0.3, 0.35, 0.35]))
        after3 = jnp.log(jnp.asarray([1e-9, 1.0 - 3e-9, 1e-9, 1e-9]))
        row = jnp.where(t[:, None] == 2, after2,
                        jnp.where(t[:, None] == 3, after3,
                                  logp_first[None]))
        return row[:, None, :], cache

    cfg = GenerationConfig(max_length=4, num_beams=2, eos_token_id=1,
                           decoder_start_token_id=0, pad_token_id=0,
                           min_length=1, length_penalty=1.0)
    seqs, scores = beam_search(step_fn, {}, 1, cfg)
    # best finished hypothesis: [start, 3, eos] with lp .45*1.0
    assert seqs[0, 1] == 3 and seqs[0, 2] == 1


def test_t5_generate_end_to_end_beam():
    model, variables, input_ids, mask = _tiny_t5()
    cfg = GenerationConfig(max_length=5, num_beams=3, eos_token_id=1,
                           decoder_start_token_id=0, pad_token_id=0,
                           repetition_penalty=1.5)
    seqs = t5_generate(model, variables, input_ids, mask, cfg=cfg)
    assert seqs.shape == (2, 5)
    assert np.asarray(seqs)[:, 0].tolist() == [0, 0]


def test_tile_cache_shapes():
    cache = {"layer": {"cached_key": jnp.zeros((2, 4, 2, 3)),
                       "cache_index": jnp.zeros((), jnp.int32)}}
    tiled = tile_cache(cache, 3)
    assert tiled["layer"]["cached_key"].shape == (6, 4, 2, 3)
    assert tiled["layer"]["cache_index"].shape == ()


def test_greedy_generate_do_sample_smoke():
    """Nucleus sampling through the public generate path (regression:
    a stray draft_step reference broke every do_sample generation)."""
    from vlm_compression_tpu.models.t5 import (
        T5Config, T5ForConditionalGeneration)

    cfg = T5Config.tiny(dtype="float32", param_dtype="float32")
    model = T5ForConditionalGeneration(cfg)
    ids = jnp.ones((2, 5), jnp.int32)
    amask = jnp.ones((2, 5), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, amask,
                        jnp.zeros((2, 3), jnp.int32))
    gcfg = GenerationConfig(max_length=7, do_sample=True, top_p=0.9,
                            temperature=0.8)
    seqs = t5_generate(model, params, ids, amask, cfg=gcfg,
                       rng=jax.random.key(1))
    assert seqs.shape == (2, 7)
    assert int(seqs.max()) < cfg.vocab_size


def test_repetition_penalty_ignores_negative_sentinel():
    """The decoder-only paths keep -1 in seqs[:, 0] as a start sentinel;
    it must not penalize anything (the scatter would wrap it to vocab id
    V-1 — confirmed bug)."""
    from vlm_compression_tpu.models.generation import (
        apply_repetition_penalty)

    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    seqs = jnp.asarray([[-1, 1, 0, 0]])
    valid = jnp.asarray([[True, True, False, False]])
    out = apply_repetition_penalty(logits, seqs, valid, 2.0)
    # token 1 penalized (present), token 3 (== V-1) untouched
    np.testing.assert_allclose(np.asarray(out)[0],
                               [1.0, 1.0, 3.0, 4.0])
