"""Per-row decode cache (beyond-reference serving feature).

With a batch-shared ``cache_index`` (the flax idiom), speculative
decoding can only advance the whole batch by the MINIMUM accepted
length across rows.  ``kv_cache_per_row`` gives every row its own
frontier — (b,)-shaped cache_index, vmapped slice updates, per-row
visibility masks and T5 rel-pos bias rows — so each row commits its own
accepted prefix.  Invariants:

  * greedy decode is unchanged (all rows advance by 1 either way)
  * speculative output stays token-identical to the target's greedy
    decode (exactness never depended on the frontier being shared)
  * per-row needs no MORE verify rounds than shared, and fewer when
    rows disagree (the whole point)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlm_compression_tpu.models.generation import (
    GenerationConfig, _cache_index_ndim, speculative_generate,
    t5_generate, t5_speculative_generate)
from vlm_compression_tpu.models.kvcache import (cache_kv,
    step_visibility_mask)
from vlm_compression_tpu.models.llama import (LlamaConfig,
    LlamaForCausalLM, make_causal_step)
from vlm_compression_tpu.models.t5 import (T5Config,
    T5ForConditionalGeneration)

pytestmark = pytest.mark.slow


def test_step_visibility_mask_per_row():
    """(b,) cur → per-row visibility: row r's query i sees slots
    ≤ cur[r]+i."""
    cur = jnp.asarray([0, 3])
    m = step_visibility_mask(cur, 2, 6)
    assert m.shape == (2, 1, 2, 6)
    vis = np.asarray(m[:, 0] == 0.0)
    # row 0: queries at 0,1 — row 1: queries at 3,4
    assert vis[0, 0].tolist() == [True, False, False, False, False, False]
    assert vis[0, 1].tolist() == [True, True, False, False, False, False]
    assert vis[1, 0].tolist() == [True] * 4 + [False, False]
    assert vis[1, 1].tolist() == [True] * 5 + [False]


def test_cache_kv_per_row_writes():
    """Rows write at their own frontiers; the scalar mode is the
    degenerate equal-frontier case."""
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, k, v):
            return cache_kv(self, k, v, per_row=True)

    m = M()
    k0 = jnp.zeros((2, 4, 1, 2))
    vars0 = m.init(jax.random.key(0), k0, k0)
    cache = vars0["cache"]
    assert cache["cache_index"].shape == (2,)
    # row 0 writes at slot 0, row 1 at slot 2
    cache = {**cache, "cache_index": jnp.asarray([0, 2], jnp.int32)}
    step_k = jnp.ones((2, 1, 1, 2))
    (k_all, _, cur, init), cvars = m.apply(
        {"cache": cache}, step_k, step_k, mutable=["cache"])
    assert init and cur.tolist() == [0, 2]
    got = np.asarray(k_all[:, :, 0, 0])
    assert got[0].tolist() == [1, 0, 0, 0]
    assert got[1].tolist() == [0, 0, 1, 0]
    assert cvars["cache"]["cache_index"].tolist() == [1, 3]


def _tiny_t5(per_row):
    cfg = T5Config.tiny(dtype="float32", param_dtype="float32")
    cfg = dataclasses.replace(cfg, kv_cache_per_row=per_row)
    model = T5ForConditionalGeneration(cfg)
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (3, 6)))
    amask = jnp.ones((3, 6), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids, amask,
                        jnp.zeros((3, 3), jnp.int32))
    return model, dict(params), ids, amask


def test_t5_greedy_per_row_matches_shared():
    gcfg = GenerationConfig(max_length=10, eos_token_id=1, pad_token_id=0)
    model, params, ids, amask = _tiny_t5(False)
    model_pr, _, _, _ = _tiny_t5(True)
    shared = t5_generate(model, params, ids, amask, cfg=gcfg)
    per_row = t5_generate(model_pr, params, ids, amask, cfg=gcfg)
    np.testing.assert_array_equal(np.asarray(shared), np.asarray(per_row))


def test_t5_speculative_per_row_exact_and_no_slower():
    """Per-row speculative output == target greedy (exactness), with
    verify rounds ≤ the batch-shared run — and the repetition-penalty /
    min-length processors riding the per-row frontier."""
    gcfg = GenerationConfig(max_length=12, min_length=3,
                            repetition_penalty=1.3, eos_token_id=1,
                            pad_token_id=0)
    model, params, ids, amask = _tiny_t5(False)
    model_pr, _, _, _ = _tiny_t5(True)

    greedy = t5_generate(model, params, ids, amask, cfg=gcfg,
                         mode="dense")
    sh_seqs, _, sh_stats = t5_speculative_generate(
        model, params, ids, amask, cfg=gcfg, gamma=3)
    pr_seqs, _, pr_stats = t5_speculative_generate(
        model_pr, params, ids, amask, cfg=gcfg, gamma=3)

    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(sh_seqs))
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(pr_seqs))
    assert int(pr_stats["rounds"]) <= int(sh_stats["rounds"])


def test_per_row_strictly_fewer_rounds_on_disagreeing_rows():
    """A noisy draft accepts differently per row; shared caches advance
    by the minimum, per-row caches don't — pinned seed where per-row
    finishes in strictly fewer verify rounds, both exactly greedy."""
    cfg = T5Config.tiny(dtype="float32", param_dtype="float32")
    model = T5ForConditionalGeneration(cfg)
    model_pr = T5ForConditionalGeneration(
        dataclasses.replace(cfg, kv_cache_per_row=True))
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 6)))
    amask = jnp.ones((4, 6), jnp.int32)
    params = dict(model.init(jax.random.PRNGKey(0), ids, amask,
                             jnp.zeros((4, 3), jnp.int32)))
    noise = jax.tree_util.tree_map(
        lambda x: x + 0.02 * jax.random.normal(
            jax.random.key(1), x.shape, x.dtype)
        if x.dtype == jnp.float32 else x, params["params"])

    gcfg = GenerationConfig(max_length=16, eos_token_id=1, pad_token_id=0)
    greedy = t5_generate(model, params, ids, amask, cfg=gcfg, mode="dense")
    sh, _, shs = t5_speculative_generate(
        model, params, ids, amask, cfg=gcfg, gamma=3,
        draft_variables={"params": noise})
    pr, _, prs = t5_speculative_generate(
        model_pr, params, ids, amask, cfg=gcfg, gamma=3,
        draft_variables={"params": noise})
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(sh))
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(pr))
    assert int(prs["rounds"]) < int(shs["rounds"])  # 9 vs 11 at this seed


def test_llama_speculative_per_row_exact():
    """Decoder-only path: per-row caches through make_causal_step
    (rotary positions at per-row frontiers, primed-prefix offset)."""
    from vlm_compression_tpu.models.generation import greedy_generate

    cfg = LlamaConfig.tiny(dtype="float32", param_dtype="float32")
    rng = np.random.default_rng(5)
    b, p = 2, 4
    prime = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, p)))
    model = LlamaForCausalLM(cfg)
    params = model.init(jax.random.PRNGKey(0), prime)
    emb = model.apply(params, prime, method=model.embed_tokens)
    gcfg = GenerationConfig(max_length=10, eos_token_id=1, pad_token_id=0,
                            decoder_start_token_id=int(prime[0, -1]))

    def run(per_row, gamma):
        c = dataclasses.replace(cfg, kv_cache_per_row=per_row)
        m = LlamaForCausalLM(c)
        extra = gamma * (2 if per_row else 1) + 1
        step, cache = make_causal_step(
            m, params, emb[:, :-1], None, mode="dense",
            max_decode_len=gcfg.max_length + extra)
        assert _cache_index_ndim(cache) == (1 if per_row else 0)
        if gamma == 0:
            return greedy_generate(step, cache, b, gcfg)[0]
        return speculative_generate(step, cache, step, cache, b, gcfg,
                                    gamma=gamma, cache_offset=p - 1)[0]

    greedy = run(False, 0)
    np.testing.assert_array_equal(np.asarray(run(False, 3)),
                                  np.asarray(greedy))
    np.testing.assert_array_equal(np.asarray(run(True, 3)),
                                  np.asarray(greedy))
