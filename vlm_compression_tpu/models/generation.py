"""Autoregressive decoding: greedy, nucleus sampling, beam search.

TPU-native replacement for the HF ``generate`` the reference inherits
(blip2_t5_instruct.py:299-432 calls ``t5_model.generate`` with
``num_beams=5, repetition_penalty, length_penalty, min/max length``):
a single jittable ``lax.while_loop`` over a KV-cached step function,
so one compilation covers a whole decode regardless of output length.

All entry points operate on a generic ``step_fn(tokens, cache) ->
(logits, cache)`` closure — the same machinery drives the T5 decoder and
the decoder-only towers (LLaMA/OPT).  ``make_t5_step`` builds the closure
for ``T5ForConditionalGeneration``.

Semantics matched to HF:
  * repetition penalty: logits of tokens already generated are divided by
    the penalty when positive, multiplied when negative
    (HF RepetitionPenaltyLogitsProcessor)
  * length penalty: finished-hypothesis score = sum-logprob / len**penalty
    (HF BeamHypotheses.add)
  * min_length: EOS logit forced to -inf below min length
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1.0e7


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_length: int = 32
    min_length: int = 1
    num_beams: int = 1
    repetition_penalty: float = 1.0
    length_penalty: float = 1.0
    top_p: float = 0.9
    temperature: float = 1.0
    decoder_start_token_id: int = 0
    eos_token_id: int = 1
    pad_token_id: int = 0
    do_sample: bool = False


# Jit cache for the public generate entry points, keyed by every static
# ingredient (model — flax modules hash by their config fields —,
# GenerationConfig (frozen), modes, gamma).  WITHOUT this, each call
# re-traces the whole tower on the host: measured 2.74 s/call eager vs
# 25 ms jitted at T5-base decode (108×) — the decode step itself runs at
# ~83% of HBM peak once compiled, so the eager path was ~99% Python.
# jax.jit's own cache further keys on argument shapes/pytree structure
# (None vs array operands compile separately, as they must).
_JIT_GEN_CACHE: dict = {}


def _jit_entry(key, make):
    fn = _JIT_GEN_CACHE.get(key)
    if fn is None:
        fn = _JIT_GEN_CACHE[key] = jax.jit(make())
    return fn


# ---------------------------------------------------------------------------
# logits processors
# ---------------------------------------------------------------------------


def apply_repetition_penalty(logits, seqs, valid, penalty: float):
    """HF semantics on already-generated tokens.

    logits (..., V); seqs (..., L) token ids; valid (..., L) bool."""
    if penalty == 1.0:
        return logits
    bk = logits.shape[:-1]
    v = logits.shape[-1]
    flat_logits = logits.reshape(-1, v)
    flat_seqs = seqs.reshape(-1, seqs.shape[-1])
    # negative ids (the decoder-only paths' -1 start sentinel) must not
    # penalize anything — the scatter would wrap them to vocab id V-1
    valid = valid & (seqs >= 0)
    flat_valid = valid.reshape(-1, seqs.shape[-1])
    rows = jnp.arange(flat_seqs.shape[0])[:, None]
    present = jnp.zeros(flat_logits.shape, bool).at[
        rows, flat_seqs].max(flat_valid)
    penalized = jnp.where(flat_logits > 0, flat_logits / penalty,
                          flat_logits * penalty)
    out = jnp.where(present, penalized, flat_logits)
    return out.reshape(*bk, v)


def mask_min_length(logits, cur_len, min_length, eos_token_id):
    """Force EOS out while below min_length (cur_len = #generated so far)."""
    block = cur_len < min_length
    return logits.at[..., eos_token_id].add(
        jnp.where(block, NEG_INF, 0.0))


def top_p_filter(logits, top_p: float):
    """Nucleus filtering: keep the smallest set with cumprob ≥ top_p."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens whose *preceding* cumulative mass < top_p
    keep_sorted = (cum - probs) < top_p
    # threshold value = smallest kept logit
    thr = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1,
                  keepdims=True)
    return jnp.where(logits >= thr, logits, NEG_INF)


# ---------------------------------------------------------------------------
# greedy / sampling
# ---------------------------------------------------------------------------


def greedy_generate(step_fn, cache, batch_size: int, cfg: GenerationConfig,
                    rng: Optional[jax.Array] = None):
    """Returns (sequences (b, max_length), lengths).  sequences start with
    decoder_start and are pad-filled after EOS."""
    L = cfg.max_length
    seqs = jnp.full((batch_size, L), cfg.pad_token_id, jnp.int32)
    seqs = seqs.at[:, 0].set(cfg.decoder_start_token_id)
    finished = jnp.zeros((batch_size,), bool)
    if rng is None:
        rng = jax.random.key(0)

    def cond(state):
        i, _, finished, _, _ = state
        return (i < L) & ~jnp.all(finished)

    def body(state):
        i, seqs, finished, cache, rng = state
        tok = jax.lax.dynamic_slice(seqs, (0, i - 1), (batch_size, 1))
        logits, cache = step_fn(tok, cache)
        logits = logits[:, -1, :].astype(jnp.float32)
        logits = apply_repetition_penalty(
            logits, seqs, jnp.arange(L)[None, :] < i,
            cfg.repetition_penalty)
        logits = mask_min_length(logits, i, cfg.min_length, cfg.eos_token_id)
        if cfg.do_sample:
            rng, sub = jax.random.split(rng)
            filtered = top_p_filter(logits / cfg.temperature, cfg.top_p)
            nxt = jax.random.categorical(sub, filtered, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = jnp.where(finished, cfg.pad_token_id, nxt).astype(jnp.int32)
        seqs = jax.lax.dynamic_update_slice(seqs, nxt[:, None], (0, i))
        finished = finished | (nxt == cfg.eos_token_id)
        return i + 1, seqs, finished, cache, rng

    _, seqs, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1), seqs, finished, cache, rng))
    lengths = jnp.sum(seqs != cfg.pad_token_id, axis=-1)
    return seqs, lengths


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------


def _gather_beams(tree, beam_idx, batch_size, num_beams):
    """Reindex (b*k, ...) cache entries by per-batch beam origin."""
    flat_idx = (jnp.arange(batch_size)[:, None] * num_beams
                + beam_idx).reshape(-1)

    def g(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and \
                x.shape[0] == batch_size * num_beams:
            return x[flat_idx]
        return x

    return jax.tree_util.tree_map(g, tree)


def beam_search(step_fn, cache, batch_size: int, cfg: GenerationConfig):
    """Returns (best sequences (b, max_length), best scores (b,)).

    cache leaves must already be tiled to leading dim b*num_beams (use
    ``tile_cache``)."""
    K, L = cfg.num_beams, cfg.max_length
    seqs = jnp.full((batch_size, K, L), cfg.pad_token_id, jnp.int32)
    seqs = seqs.at[:, :, 0].set(cfg.decoder_start_token_id)
    # only beam 0 is live initially — others duplicate it
    live_scores = jnp.tile(
        jnp.array([0.0] + [NEG_INF] * (K - 1))[None], (batch_size, 1))
    fin_seqs = jnp.zeros_like(seqs)
    fin_scores = jnp.full((batch_size, K), NEG_INF)

    def cond(state):
        i, _, live_scores, _, fin_scores, _ = state
        if cfg.length_penalty > 0:
            best_possible = live_scores / (L ** cfg.length_penalty)
        else:
            best_possible = live_scores / (i ** cfg.length_penalty)
        improvable = jnp.any(
            best_possible.max(-1) > fin_scores.min(-1), axis=None)
        return (i < L) & improvable

    def body(state):
        i, seqs, live_scores, fin_seqs, fin_scores, cache = state
        tok = jax.lax.dynamic_slice(
            seqs, (0, 0, i - 1), (batch_size, K, 1)).reshape(-1, 1)
        logits, cache = step_fn(tok, cache)
        logits = logits[:, -1, :].astype(jnp.float32).reshape(
            batch_size, K, -1)
        V = logits.shape[-1]
        # HF beam search applies the logits processors AFTER log_softmax
        # (generation/utils.py beam_search: processors act on the
        # log-softmaxed scores — so e.g. repetition penalty scales
        # negative log-probs), unlike greedy where they act on raw
        # logits.  Matching that asymmetry is required for
        # token-for-token parity (tests/test_generation_hf_parity.py).
        logp = jax.nn.log_softmax(logits, axis=-1)
        logp = apply_repetition_penalty(
            logp, seqs, jnp.arange(L)[None, None, :] < i,
            cfg.repetition_penalty)
        logp = mask_min_length(logp, i, cfg.min_length, cfg.eos_token_id)

        cand = live_scores[..., None] + logp            # (b, K, V)
        flat = cand.reshape(batch_size, K * V)
        top_scores, top_idx = jax.lax.top_k(flat, 2 * K)
        beam_origin = top_idx // V                       # (b, 2K)
        token = (top_idx % V).astype(jnp.int32)

        # grow candidate sequences
        cand_seqs = jnp.take_along_axis(
            seqs, beam_origin[..., None], axis=1)        # (b, 2K, L)
        cand_seqs = jax.lax.dynamic_update_slice(
            cand_seqs, token[..., None].astype(jnp.int32),
            (0, 0, i))

        is_eos = token == cfg.eos_token_id
        # finished candidates: length-penalized score, merge into fin pool
        lp = ((i + 1).astype(jnp.float32)) ** cfg.length_penalty
        eos_scores = jnp.where(is_eos, top_scores / lp, NEG_INF)
        all_fin_scores = jnp.concatenate([fin_scores, eos_scores], axis=1)
        all_fin_seqs = jnp.concatenate([fin_seqs, cand_seqs], axis=1)
        top_fin_scores, fin_idx = jax.lax.top_k(all_fin_scores, K)
        fin_seqs = jnp.take_along_axis(
            all_fin_seqs, fin_idx[..., None], axis=1)
        fin_scores = top_fin_scores

        # live candidates: top K among non-eos
        live_cand = jnp.where(is_eos, NEG_INF, top_scores)
        new_live_scores, live_idx = jax.lax.top_k(live_cand, K)
        seqs = jnp.take_along_axis(cand_seqs, live_idx[..., None], axis=1)
        origin = jnp.take_along_axis(beam_origin, live_idx, axis=1)
        cache = _gather_beams(cache, origin, batch_size, K)

        return i + 1, seqs, new_live_scores, fin_seqs, fin_scores, cache

    state = (jnp.asarray(1), seqs, live_scores, fin_seqs, fin_scores, cache)
    i, seqs, live_scores, fin_seqs, fin_scores, _ = jax.lax.while_loop(
        cond, body, state)

    # if nothing finished, fall back to live beams
    none_fin = jnp.all(fin_scores == NEG_INF, axis=-1)
    lp = i.astype(jnp.float32) ** cfg.length_penalty
    fin_seqs = jnp.where(none_fin[:, None, None], seqs, fin_seqs)
    fin_scores = jnp.where(none_fin[:, None], live_scores / lp, fin_scores)
    best = jnp.argmax(fin_scores, axis=-1)
    out = jnp.take_along_axis(fin_seqs, best[:, None, None], axis=1)[:, 0]
    return out, jnp.max(fin_scores, axis=-1)


def tile_cache(cache, num_beams: int):
    """Repeat every (b, ...) cache leaf to (b*num_beams, ...)."""
    def t(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jnp.repeat(x, num_beams, axis=0)
        return x

    return jax.tree_util.tree_map(t, cache)


# ---------------------------------------------------------------------------
# T5 wiring
# ---------------------------------------------------------------------------


def make_t5_step(model, variables, enc_out, enc_mask, mode: str = "masked",
                 max_decode_len: int = 32):
    """Build (step_fn, cache) for ``T5ForConditionalGeneration``.

    enc_out/enc_mask may already be beam-tiled; the cache is created by a
    mutable("cache") init pass over a full-length dummy."""
    b = enc_out.shape[0]
    dummy = jnp.zeros((b, max_decode_len), jnp.int32)
    _, cvars = model.apply(
        variables, dummy, enc_out, None, enc_mask, mode=mode, decode=True,
        max_decode_len=max_decode_len, mutable=["cache"],
        method=model.decode)
    cache = cvars["cache"]

    def step_fn(tokens, cache):
        logits, cvars = model.apply(
            {**variables, "cache": cache}, tokens, enc_out, None, enc_mask,
            mode=mode, decode=True, max_decode_len=max_decode_len,
            mutable=["cache"], method=model.decode)
        return logits, cvars["cache"]

    return step_fn, cache


def t5_generate(model, variables, input_ids=None, attention_mask=None,
                inputs_embeds=None, cfg: Optional[GenerationConfig] = None,
                mode: str = "masked", rng=None):
    """Full encode→decode generate for a bare T5 (HF .generate parity).

    Jit-cached per (model, cfg, mode): repeat calls dispatch one compiled
    program (see _JIT_GEN_CACHE)."""
    cfg = cfg or GenerationConfig(
        decoder_start_token_id=model.cfg.decoder_start_token_id,
        pad_token_id=model.cfg.pad_token_id)

    def make():
        def run(variables, input_ids, attention_mask, inputs_embeds, rng):
            enc_out = model.apply(
                variables, input_ids, inputs_embeds, attention_mask, mode,
                method=model.encode)
            b = enc_out.shape[0]
            if cfg.num_beams > 1:
                enc_out_t = jnp.repeat(enc_out, cfg.num_beams, axis=0)
                mask_t = (jnp.repeat(attention_mask, cfg.num_beams, axis=0)
                          if attention_mask is not None else None)
                step, cache = make_t5_step(model, variables, enc_out_t,
                                           mask_t, mode, cfg.max_length)
                seqs, scores = beam_search(step, cache, b, cfg)
                return seqs
            step, cache = make_t5_step(model, variables, enc_out,
                                       attention_mask, mode,
                                       cfg.max_length)
            seqs, _ = greedy_generate(step, cache, b, cfg, rng)
            return seqs

        return run

    fn = _jit_entry(("t5_generate", model, cfg, mode), make)
    return fn(variables, input_ids, attention_mask, inputs_embeds, rng)


# ---------------------------------------------------------------------------
# speculative decoding (draft-and-verify greedy)
# ---------------------------------------------------------------------------


def _rollback_cache_index(cache, idx):
    """Set every flax decode-cache ``cache_index`` (the only integer
    leaves — 0-d, or (b,) for per-row caches) to ``idx``.  Stale
    cached_key/value slots beyond the index are overwritten before any
    query can see them: slots fill sequentially from the index and the
    per-query causal visibility only admits slots ≤ the query position."""

    def fix(x):
        if getattr(x, "ndim", None) in (0, 1) and \
                jnp.issubdtype(x.dtype, jnp.integer):
            return jnp.broadcast_to(jnp.asarray(idx, x.dtype), x.shape)
        return x

    return jax.tree_util.tree_map(fix, cache)


def _cache_index_ndim(cache):
    """0 for batch-shared caches, 1 for per-row caches."""
    ndims = {x.ndim for x in jax.tree_util.tree_leaves(cache)
             if jnp.issubdtype(x.dtype, jnp.integer) and x.ndim <= 1}
    return max(ndims) if ndims else 0


def speculative_generate(draft_step, draft_cache, target_step, target_cache,
                         batch_size: int, cfg: GenerationConfig,
                         gamma: int = 4, rng=None, cache_offset: int = 0):
    """Draft-and-verify decoding (speculative decoding).

    With ``cfg.do_sample`` the classic rejection-sampling rule runs
    instead of argmax agreement: draft token x ~ q is accepted with
    probability min(1, p(x)/q(x)); the first rejection resamples from
    norm(max(p − q, 0)).  Each committed token is then an EXACT sample
    from the processed target distribution p (temperature + top-p +
    penalties applied identically to the autoregressive sampling path),
    regardless of the draft.

    Greedy mode (``do_sample=False``):

    The draft model proposes ``gamma`` tokens one step at a time; the
    target model scores the whole proposal in ONE chunked forward (the
    KV caches support multi-token priming), and the longest prefix whose
    target argmax agrees with the proposal is committed.  Output is
    **exactly** the target model's greedy_generate sequence — the draft
    only decides how many target tokens each verify call yields — so the
    natural pairing in this framework is draft = the compressed student
    (``mode="masked"``/quantized) and target = the dense teacher
    (``mode="dense"``), which already share one variables dict in the
    RESSA setup (tasks/retrain.py).

    Exactness caveat: "exact" means exact given deterministic logits.
    The chunked verify is a DIFFERENT compiled program than the
    single-token greedy step, so on TPU (default-precision matmuls,
    accumulation-order differences ~1e-2 in the logits) an argmax whose
    top-2 gap sits below that noise can flip — observed only on
    random-init tiny towers, where near-uniform logits make ties
    common; trained models' top-1 margins dwarf it.  CPU runs are
    bit-deterministic across both programs.

    Both caches must be allocated with ``max_decode_len ≥ max_length +
    gamma + 1`` (``max_length + 2·gamma + 1`` for per-row caches; the
    last verify chunk may run past ``max_length`` — the surplus is
    sliced off).  With batch-shared caches (0-d ``cache_index``) rows
    advance together by the MINIMUM accepted length across the batch;
    **per-row caches** ((b,)-shaped ``cache_index``, cfg
    ``kv_cache_per_row`` on the towers — detected here automatically)
    let every row commit its own accepted prefix, recovering the full
    acceptance rate at batch > 1.  Commits are capped at ``gamma`` per
    round (the classic γ+1 bonus token is skipped: the draft cache never
    ingested its own final proposal, and committing past it would leave
    a KV hole).

    ``cache_offset``: number of cache slots already primed (the causal
    towers prime the prompt prefix; T5's decoder cache starts empty).

    Returns (sequences (b, max_length), lengths, stats) where stats =
    {"rounds": verify calls, "committed": total committed tokens summed
    over rows} — mean accepted per round per row =
    committed / (rounds · b).
    """
    if gamma < 1:
        raise ValueError("gamma must be >= 1")
    per_row = _cache_index_ndim(draft_cache) == 1
    if per_row != (_cache_index_ndim(target_cache) == 1):
        raise ValueError("draft and target caches must agree on per-row")
    L, G = cfg.max_length, gamma
    # per-row: a row stalls at most at cur = L−1+G (it only advances
    # while cur < L), and the draft still writes G scratch tokens past
    # it while slower rows catch up
    Lg = L + (2 * G if per_row else G) + 1
    b_idx = jnp.arange(batch_size)
    seqs = jnp.full((batch_size, Lg), cfg.pad_token_id, jnp.int32)
    seqs = seqs.at[:, 0].set(cfg.decoder_start_token_id)
    finished = jnp.zeros((batch_size,), bool)
    jarange = jnp.arange(G + 1)
    if rng is None:
        rng = jax.random.key(0)
    V = 1
    if cfg.do_sample:
        # vocab size, statically (the q distributions ride the carry)
        V = jax.eval_shape(draft_step, jnp.zeros((batch_size, 1),
                                                 jnp.int32),
                           draft_cache)[0].shape[-1]

    # ``cur`` is (b,) throughout; batch-shared mode keeps all rows equal
    # (the commit length is min-reduced), so cur[0] indexes shared caches

    def cond(state):
        cur, _, finished = state[0], state[1], state[2]
        return jnp.any((cur < L) & ~finished)

    def body(state):
        (cur, seqs, finished, dcache, tcache, n_committed, rounds,
         rng) = state
        last = jnp.take_along_axis(seqs, (cur - 1)[:, None], axis=1)

        # ---- draft phase: gamma single steps, same logits processors as
        # the autoregressive path (in greedy mode the draft's choices only
        # affect the accept rate; in sampling mode its DISTRIBUTION q
        # enters the rejection rule, so it must be the processed one)
        def dbody(t, carry):
            d, qd, dcache, seqs_h, rng = carry
            prev = jax.lax.dynamic_slice(
                d, (0, jnp.maximum(t - 1, 0)), (batch_size, 1))
            tok = jnp.where(t == 0, last, prev)
            logits, dcache = draft_step(tok, dcache)
            logits = logits[:, -1, :].astype(jnp.float32)
            logits = apply_repetition_penalty(
                logits, seqs_h,
                jnp.arange(Lg)[None, :] < (cur + t)[:, None],
                cfg.repetition_penalty)
            logits = mask_min_length(logits, cur + t, cfg.min_length,
                                     cfg.eos_token_id)
            if cfg.do_sample:
                rng, sub = jax.random.split(rng)
                qlog = top_p_filter(logits / cfg.temperature, cfg.top_p)
                nxt = jax.random.categorical(sub, qlog).astype(jnp.int32)
                qd = jax.lax.dynamic_update_slice(
                    qd, jax.nn.softmax(qlog, axis=-1)[:, None],
                    (0, t, 0))
            else:
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            d = jax.lax.dynamic_update_slice(d, nxt[:, None], (0, t))
            seqs_h = seqs_h.at[b_idx, cur + t].set(nxt)
            return d, qd, dcache, seqs_h, rng

        d0 = jnp.zeros((batch_size, G), jnp.int32)
        qd0 = jnp.zeros((batch_size, G, V if cfg.do_sample else 1),
                        jnp.float32)
        d, qd, dcache, seqs_h, rng = jax.lax.fori_loop(
            0, G, dbody, (d0, qd0, dcache, seqs, rng))

        # ---- verify: one chunked target forward over [last, d_1..d_γ]
        chunk = jnp.concatenate([last, d], axis=1)          # (b, G+1)
        tlogits, tcache = target_step(chunk, tcache)
        tlogits = tlogits.astype(jnp.float32)               # (b, G+1, V)
        valid = (jnp.arange(Lg)[None, None, :]
                 < (cur[:, None] + jarange[None, :])
                 [..., None])                               # (b, G+1, Lg)
        tlogits = apply_repetition_penalty(
            tlogits,
            jnp.broadcast_to(seqs_h[:, None, :], (batch_size, G + 1, Lg)),
            valid, cfg.repetition_penalty)
        tlogits = tlogits.at[..., cfg.eos_token_id].add(
            jnp.where(cur[:, None] + jarange[None, :] < cfg.min_length,
                      NEG_INF, 0.0))

        if cfg.do_sample:
            # rejection sampling (Leviathan et al.): accept x ~ q with
            # prob min(1, p(x)/q(x)); first rejection resamples from
            # norm(max(p − q, 0)) — committed tokens are exact samples
            # from the processed target distribution p
            plog = top_p_filter(tlogits[:, :G] / cfg.temperature,
                                cfg.top_p)
            pd = jax.nn.softmax(plog, axis=-1)              # (b, G, V)
            p_at = jnp.take_along_axis(pd, d[..., None], -1)[..., 0]
            q_at = jnp.take_along_axis(qd, d[..., None], -1)[..., 0]
            rng, sub, sub2 = jax.random.split(rng, 3)
            u = jax.random.uniform(sub, (batch_size, G))
            acc = (u * jnp.maximum(q_at, 1e-20) < p_at).astype(jnp.int32)
            k = jnp.sum(jnp.cumprod(acc, axis=1), axis=1)   # (b,) 0..G
            res = jnp.maximum(pd - qd, 0.0)
            res_sum = jnp.sum(res, axis=-1, keepdims=True)
            res = jnp.where(res_sum > 0, res / res_sum, pd)
            r = jax.random.categorical(
                sub2, jnp.log(jnp.maximum(res, 1e-20)))     # (b, G)
            jg = jnp.arange(G)[None, :]
            mixed = jnp.where(jg == k[:, None], r, d)
            t = jnp.concatenate(
                [mixed, jnp.full((batch_size, 1), cfg.pad_token_id,
                                 jnp.int32)], axis=1)       # (b, G+1)
        else:
            t = jnp.argmax(tlogits, axis=-1).astype(jnp.int32)  # (b, G+1)
            # longest agreeing prefix per row
            match = (t[:, :G] == d).astype(jnp.int32)
            k = jnp.sum(jnp.cumprod(match, axis=1), axis=1)     # (b,)

        # per-row commit length: k accepted + 1 target token, capped at
        # G; rows already finished (or past L in per-row mode) commit 0
        done = finished | (per_row & (cur >= L))
        n = jnp.where(done, 0, jnp.minimum(k + 1, G))           # (b,)
        if not per_row:
            # batch-shared cache: advance by the minimum across live rows
            n = jnp.broadcast_to(
                jnp.min(jnp.where(done, G, n)), (batch_size,))

        # commit the first n_b tokens of each row (pad once finished)
        eos_hit = t == cfg.eos_token_id
        fin_before = finished[:, None] | (
            jnp.cumsum(eos_hit, axis=1) - eos_hit > 0)
        committed = jnp.where(fin_before, cfg.pad_token_id, t)
        pos = cur[:, None] + jarange[None, :]                # (b, G+1)
        take = jarange[None, :] < n[:, None]
        upd = jnp.where(take, committed,
                        jnp.take_along_axis(seqs, pos, axis=1))
        seqs = seqs.at[b_idx[:, None], pos].set(upd)
        finished = finished | jnp.any(
            take & (committed == cfg.eos_token_id), axis=1)

        # roll both caches back to the committed frontier
        # (cache_offset = slots already holding a primed prompt prefix,
        # e.g. make_causal_step's p — rewinding into it would be fatal)
        frontier = cache_offset + cur + n - 1
        idx = frontier if per_row else frontier[0]
        dcache = _rollback_cache_index(dcache, idx)
        tcache = _rollback_cache_index(tcache, idx)
        return (cur + n, seqs, finished, dcache, tcache,
                n_committed + jnp.sum(n), rounds + 1, rng)

    state = (jnp.ones((batch_size,), jnp.int32), seqs, finished,
             draft_cache, target_cache, jnp.asarray(0), jnp.asarray(0),
             rng)
    _, seqs, _, _, _, n_committed, rounds, _ = jax.lax.while_loop(
        cond, body, state)
    seqs = seqs[:, :L]
    lengths = jnp.sum(seqs != cfg.pad_token_id, axis=-1)
    return seqs, lengths, {"rounds": rounds, "committed": n_committed}


def t5_speculative_generate(model, variables, input_ids=None,
                            attention_mask=None, inputs_embeds=None,
                            cfg: Optional[GenerationConfig] = None,
                            draft_mode: str = "masked",
                            target_mode: str = "dense", gamma: int = 4,
                            rng=None, draft_variables=None,
                            draft_model=None):
    """Self-speculative T5 generate: the compressed student
    (``draft_mode``) drafts, the dense teacher (``target_mode``) verifies
    — one variables dict, two forward modes, exactly the RESSA pairing.
    Output tokens are identical to greedy ``t5_generate`` under
    ``target_mode``.

    Wall-clock speedup needs the draft's STEP to be cheaper than the
    target's.  Three draft tiers, cheapest step first:

    * ``draft_model`` — a genuinely SMALLER T5 (fewer layers / narrower
      d_model; only the vocab must match).  It runs its own encoder over
      ``input_ids`` and decodes against its own encoding; the target
      still commits every token, so output exactness is unaffected —
      the draft only sets the accept rate.  This is the tier that wins
      wall-clock on TPU: a same-size masked draft costs the same MXU
      FLOPs as the dense target, and serving measurements
      (BENCH_NOTES "Serving decode") show same-size drafts LOSE.
    * ``draft_variables`` — same architecture, cheaper weights (e.g. an
      int8 tree from ops/quant.quantize_params_tree serving w8a8).
    * ``draft_mode`` — same weights dict, masked/compressed forward
      (zero extra memory; no step-cost win on the MXU).
    """
    cfg = cfg or GenerationConfig(
        decoder_start_token_id=model.cfg.decoder_start_token_id,
        pad_token_id=model.cfg.pad_token_id)
    if draft_model is not None:
        if draft_model.cfg.vocab_size != model.cfg.vocab_size:
            raise ValueError(
                "draft/target vocab mismatch: "
                f"{draft_model.cfg.vocab_size} vs {model.cfg.vocab_size}")
        if draft_variables is None:
            raise ValueError("draft_model requires draft_variables")
        if input_ids is None:
            # inputs_embeds live in the TARGET's d_model; a narrower
            # draft cannot consume them (blip2 wrappers pass input_ids)
            raise ValueError("heterogeneous draft needs input_ids")

    def make():
        def run(variables, input_ids, attention_mask, inputs_embeds,
                draft_variables, rng):
            enc_out = model.apply(
                variables, input_ids, inputs_embeds, attention_mask,
                target_mode, method=model.encode)
            b = enc_out.shape[0]
            max_len = cfg.max_length + gamma * (
                2 if model.cfg.kv_cache_per_row else 1) + 1
            if draft_model is not None:
                d_enc = draft_model.apply(
                    draft_variables, input_ids, None, attention_mask,
                    draft_mode, method=draft_model.encode)
                dstep, dcache = make_t5_step(
                    draft_model, draft_variables, d_enc, attention_mask,
                    draft_mode, max_len)
            else:
                # the draft decodes against the TARGET encoding (one
                # encoder pass): it only sets the accept rate, never the
                # committed output
                dstep, dcache = make_t5_step(
                    model, (variables if draft_variables is None
                            else draft_variables),
                    enc_out, attention_mask, draft_mode, max_len)
            tstep, tcache = make_t5_step(model, variables, enc_out,
                                         attention_mask, target_mode,
                                         max_len)
            return speculative_generate(dstep, dcache, tstep, tcache, b,
                                        cfg, gamma=gamma, rng=rng)

        return run

    fn = _jit_entry(
        ("t5_spec", model, cfg, draft_mode, target_mode, gamma,
         draft_model), make)
    return fn(variables, input_ids, attention_mask, inputs_embeds,
              draft_variables, rng)


def causal_speculative_generate(model, variables, prompt_input_ids,
                                prompt_attention_mask=None,
                                cfg: Optional[GenerationConfig] = None,
                                gamma: int = 4, rng=None,
                                target_mode: str = "dense",
                                draft_mode: str = "masked",
                                draft_model=None, draft_variables=None):
    """Bare decoder-only (LLaMA/Vicuna/OPT) speculative serving.

    Like ``t5_speculative_generate`` but for the causal families: the
    prompt primes both KV caches, the last prompt token seeds the loop.
    With ``draft_model`` a genuinely SMALLER causal LM (same vocab, any
    width/depth) drafts — it primes its OWN cache by embedding the same
    prompt tokens through its own table — while the big target commits
    every token, so output is exactly the target's greedy sequence.
    Text-only prompts (token ids); the blip2 wrappers keep same-model
    drafts because their prefix holds image queries at the target's
    hidden size.

    Both models' cfgs must agree on ``kv_cache_per_row``.
    """
    from vlm_compression_tpu.models.llama import make_causal_step

    cfg = cfg or GenerationConfig()
    if draft_model is not None:
        if draft_model.cfg.vocab_size != model.cfg.vocab_size:
            raise ValueError(
                "draft/target vocab mismatch: "
                f"{draft_model.cfg.vocab_size} vs {model.cfg.vocab_size}")
        if draft_variables is None:
            raise ValueError("draft_model requires draft_variables")

    def make():
        def run(variables, prompt_input_ids, prompt_attention_mask,
                draft_variables, rng):
            b = prompt_input_ids.shape[0]
            per_row = getattr(model.cfg, "kv_cache_per_row", False)
            max_len = cfg.max_length + gamma * (2 if per_row else 1) + 1
            start = prompt_input_ids[:, -1].astype(jnp.int32)

            def prime(m, v, mode):
                emb = m.apply(v, prompt_input_ids[:, :-1],
                              method=m.embed_tokens)
                mask = (prompt_attention_mask[:, :-1].astype(jnp.int32)
                        if prompt_attention_mask is not None else None)
                return make_causal_step(m, v, emb, mask, mode=mode,
                                        max_decode_len=max_len), emb.shape[1]

            if draft_model is not None:
                (dstep, dcache), p = prime(draft_model, draft_variables,
                                           draft_mode)
            else:
                (dstep, dcache), p = prime(
                    model, (variables if draft_variables is None
                            else draft_variables), draft_mode)
            (tstep, tcache), _ = prime(model, variables, target_mode)

            def chunk_start(step):
                def f(tokens, c):
                    return step(jnp.where(tokens == -1, start[:, None],
                                          tokens), c)
                return f

            gcfg = dataclasses.replace(cfg, decoder_start_token_id=-1)
            seqs, lengths, stats = speculative_generate(
                chunk_start(dstep), dcache, chunk_start(tstep), tcache, b,
                gcfg, gamma=gamma, rng=rng, cache_offset=p)
            return seqs.at[:, 0].set(start), lengths, stats

        return run

    fn = _jit_entry(
        ("causal_spec", model, cfg, gamma, target_mode, draft_mode,
         draft_model), make)
    return fn(variables, prompt_input_ids, prompt_attention_mask,
              draft_variables, rng)
