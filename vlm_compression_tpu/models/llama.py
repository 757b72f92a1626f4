"""LLaMA / Vicuna decoder-only tower.

Re-design of the reference's modified HF copy
(``lavis/models/blip2_models/modeling_llama.py``: LlamaMLP :143-160,
LlamaAttention :162-253, both threading a ``dense`` flag): RMSNorm,
rotary position embeddings, SwiGLU MLP, all linears ``SparseLinear`` so
Wanda/SparseGPT/DSnoT masks and SparseLoRA adapters apply uniformly.
Supports the same KV-cache decode protocol as the T5 decoder (see
``generation.py``) and a blockwise layout (``layers_i``… named
``blocks_i``) addressable by the calibration engine.
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vlm_compression_tpu.models.layers import SparseLinear
from vlm_compression_tpu.ops.attention import attention_core
from vlm_compression_tpu.models.kvcache import (cache_kv,
    step_visibility_mask)


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    max_position_embeddings: int = 2048
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    pad_token_id: int = 0
    bos_token_id: int = 1
    eos_token_id: int = 2
    param_dtype: str = "bfloat16"
    dtype: str = "bfloat16"
    lora_rank: int = 0
    lora_alpha: float = 16.0
    # int8 decode KV cache: codes + per-(batch,slot,head) absmax
    # scales — halves persistent decode memory vs bf16 (kvcache.py)
    kv_cache_int8: bool = False
    kv_cache_per_row: bool = False
    use_remat: bool = False   # jax.checkpoint per block (training path)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def vicuna_7b(**kw) -> "LlamaConfig":
        return LlamaConfig(**kw)

    @staticmethod
    def vicuna_13b(**kw) -> "LlamaConfig":
        d = dict(hidden_size=5120, intermediate_size=13824, num_layers=40,
                 num_heads=40)
        d.update(kw)
        return LlamaConfig(**d)

    @staticmethod
    def tiny(**kw) -> "LlamaConfig":
        d = dict(vocab_size=96, hidden_size=16, intermediate_size=32,
                 num_layers=2, num_heads=2, max_position_embeddings=64)
        d.update(kw)
        return LlamaConfig(**d)


class LlamaRMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        return (x32 * jax.lax.rsqrt(var + self.eps) * scale).astype(x.dtype)


def rotary_tables(head_dim: int, max_len: int, theta: float):
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2) / head_dim))
    t = np.arange(max_len)
    freqs = np.outer(t, inv)                              # (L, d/2)
    emb = np.concatenate([freqs, freqs], axis=-1)          # (L, d)
    return jnp.asarray(np.cos(emb), jnp.float32), \
        jnp.asarray(np.sin(emb), jnp.float32)


def rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rotary(q, k, cos, sin, positions):
    """q/k (b, n, h, d); positions (b, n)."""
    c = cos[positions][:, :, None, :]   # (b, n, 1, d)
    s = sin[positions][:, :, None, :]
    q2 = q.astype(jnp.float32)
    k2 = k.astype(jnp.float32)
    q_out = q2 * c + rotate_half(q2) * s
    k_out = k2 * c + rotate_half(k2) * s
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


class LlamaAttention(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, mask, positions, mode="masked",
                 decode: bool = False):
        cfg = self.cfg
        pdt = jnp.dtype(cfg.param_dtype)
        hd = cfg.head_dim

        def sl(name):
            return SparseLinear(cfg.hidden_size, use_bias=False,
                                param_dtype=pdt, lora_rank=cfg.lora_rank,
                                lora_alpha=cfg.lora_alpha, name=name)

        b, n, _ = x.shape
        q = sl("q_proj")(x, mode=mode).reshape(b, n, cfg.num_heads, hd)
        k = sl("k_proj")(x, mode=mode).reshape(b, n, cfg.num_heads, hd)
        v = sl("v_proj")(x, mode=mode).reshape(b, n, cfg.num_heads, hd)

        cos, sin = rotary_tables(hd, cfg.max_position_embeddings,
                                 cfg.rope_theta)
        q, k = apply_rotary(q, k, cos, sin, positions)

        if decode:
            k, v, cur, is_init = cache_kv(self, k, v,
                                          int8=cfg.kv_cache_int8,
                                          per_row=cfg.kv_cache_per_row)
            if is_init:
                mask = step_visibility_mask(cur, n, k.shape[1], mask)

        out = attention_core(q, k, v, [mask],
                             scale=float(hd) ** -0.5).reshape(
            b, n, cfg.hidden_size)
        return sl("o_proj")(out, mode=mode)


class LlamaMLP(nn.Module):
    """SwiGLU (reference modeling_llama.py:143-160)."""
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, mode="masked"):
        cfg = self.cfg
        pdt = jnp.dtype(cfg.param_dtype)

        def sl(features, name):
            return SparseLinear(features, use_bias=False, param_dtype=pdt,
                                lora_rank=cfg.lora_rank,
                                lora_alpha=cfg.lora_alpha, name=name)

        gate = nn.silu(sl(cfg.intermediate_size, "gate_proj")(x, mode=mode))
        up = sl(cfg.intermediate_size, "up_proj")(x, mode=mode)
        return sl(cfg.hidden_size, "down_proj")(gate * up, mode=mode)


class LlamaBlock(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, mask=None, positions=None, mode="masked",
                 decode: bool = False):
        cfg = self.cfg
        h = LlamaRMSNorm(cfg.rms_norm_eps, name="input_ln")(x)
        x = x + LlamaAttention(cfg, name="self_attn")(
            h, mask, positions, mode=mode, decode=decode)
        h = LlamaRMSNorm(cfg.rms_norm_eps, name="post_attn_ln")(x)
        x = x + LlamaMLP(cfg, name="mlp")(h, mode=mode)
        return x


class LlamaForCausalLM(nn.Module):
    """Decoder-only LM with the blockwise layout the calibration engine
    addresses as ``model/blocks_i`` (reference decoder-only prune loop:
    wanda_pruner.py:1032-1039 walks ``{prefix}.model.layers``)."""

    cfg: LlamaConfig

    def setup(self):
        cfg = self.cfg
        pdt = jnp.dtype(cfg.param_dtype)
        self.embed_tokens_table = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, param_dtype=pdt,
            embedding_init=nn.initializers.normal(0.02), name="embed_tokens")
        self.blocks = [LlamaBlock(cfg, name=f"blocks_{i}")
                       for i in range(cfg.num_layers)]
        self.final_norm = LlamaRMSNorm(cfg.rms_norm_eps, name="final_norm")
        self.lm_head = SparseLinear(cfg.vocab_size, use_bias=False,
                                    param_dtype=pdt, name="lm_head")

    def embed_tokens(self, ids):
        return self.embed_tokens_table(ids).astype(jnp.dtype(self.cfg.dtype))

    def backbone(self, inputs_embeds, attention_mask=None, positions=None,
                 mode="masked", decode: bool = False):
        x = inputs_embeds
        b, n, _ = x.shape
        if positions is None:
            if attention_mask is not None and not decode:
                positions = jnp.maximum(
                    jnp.cumsum(attention_mask, axis=-1) - 1, 0)
            else:
                positions = jnp.broadcast_to(jnp.arange(n)[None], (b, n))
        if decode:
            # causality comes from the cache index; attention_mask (if
            # given) must cover the FULL cache length and masks pad slots
            mask = None
            if attention_mask is not None:
                mask = jnp.where(
                    attention_mask[:, None, None, :].astype(bool), 0.0, -1e9)
        else:
            i = jnp.arange(n)[:, None]
            j = jnp.arange(n)[None, :]
            mask = jnp.where(j <= i, 0.0, -1e9)[None, None]
            if attention_mask is not None:
                mask = mask + jnp.where(
                    attention_mask[:, None, None, :].astype(bool), 0.0, -1e9)
        for blk in self.blocks:
            if self.cfg.use_remat and not decode:
                x = nn.remat(
                    lambda m, xx, mm, pp, mo, de: m(xx, mm, pp, mode=mo,
                                                    decode=de),
                    static_argnums=(4, 5))(blk, x, mask, positions, mode,
                                           decode)
            else:
                x = blk(x, mask, positions, mode=mode, decode=decode)
        return self.final_norm(x)

    def logits(self, hidden, mode="masked"):
        return self.lm_head(hidden.astype(jnp.float32),
                            mode=mode).astype(jnp.float32)

    def __call__(self, input_ids=None, attention_mask=None,
                 inputs_embeds=None, labels=None, positions=None,
                 mode="masked", decode: bool = False):
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        h = self.backbone(inputs_embeds, attention_mask, positions,
                          mode=mode, decode=decode)
        logits = self.logits(h, mode)
        if labels is None:
            return logits
        # causal shift: predict token t+1 at position t
        shift_logits = logits[:, :-1]
        shift_labels = labels[:, 1:]
        from vlm_compression_tpu.models.t5 import cross_entropy_loss

        return {"loss": cross_entropy_loss(shift_logits, shift_labels),
                "logits": logits}


def _first_cache_index(cache):
    for k in sorted(cache):
        v = cache[k]
        if k == "cache_index":
            return v
        if isinstance(v, dict):
            r = _first_cache_index(v)
            if r is not None:
                return r
    return None


def make_causal_step(model, variables, prefix_embeds, prefix_mask=None,
                     mode: str = "masked", max_decode_len: int = 32):
    """(step_fn, cache) for generation.py.

    The prompt prefix — all tokens EXCEPT the last one — is fed once to
    prime the KV cache; the caller then runs the decode loop with
    ``decoder_start_token_id`` set to the LAST prompt token, so the loop's
    first step produces the first generated token.  Prompts are assumed
    right-aligned (no left padding); ``prefix_mask`` (b, p) masks pad slots
    of the prefix inside the cache for the whole decode.
    """
    b, p, _ = prefix_embeds.shape
    total = p + max_decode_len
    dummy = jnp.zeros((b, total, prefix_embeds.shape[-1]),
                      prefix_embeds.dtype)
    _, cvars = model.apply(
        variables, inputs_embeds=dummy, mode=mode, decode=True,
        mutable=["cache"])
    cache = cvars["cache"]

    if prefix_mask is not None:
        full_mask = jnp.concatenate(
            [prefix_mask.astype(jnp.int32),
             jnp.ones((b, max_decode_len), jnp.int32)], axis=1)
        # left-padded prompts: rotary positions count only valid tokens
        prime_pos = jnp.maximum(
            jnp.cumsum(prefix_mask.astype(jnp.int32), axis=-1) - 1, 0)
        valid_count = jnp.sum(prefix_mask.astype(jnp.int32), axis=-1)
    else:
        full_mask = None
        prime_pos = jnp.broadcast_to(jnp.arange(p)[None], (b, p))
        valid_count = jnp.full((b,), p, jnp.int32)

    _, cvars = model.apply(
        {**variables, "cache": cache}, inputs_embeds=prefix_embeds,
        attention_mask=full_mask, positions=prime_pos, mode=mode,
        decode=True, mutable=["cache"])
    cache = cvars["cache"]

    def step_fn(tokens, cache):
        cur = _first_cache_index(cache)
        bsz = tokens.shape[0]
        reps = bsz // b
        vc = jnp.repeat(valid_count, reps, axis=0) if reps > 1 else valid_count
        # multi-token chunks (speculative verify) take consecutive
        # positions from the cache frontier
        positions = ((vc + (cur - p))[:, None]
                     + jnp.arange(tokens.shape[1])[None, :])
        mask = full_mask
        if mask is not None and reps > 1:
            mask = jnp.repeat(mask, reps, axis=0)
        logits, cvars = model.apply(
            {**variables, "cache": cache}, input_ids=tokens,
            attention_mask=mask, positions=positions, mode=mode,
            decode=True, mutable=["cache"])
        return logits, cvars["cache"]

    return step_fn, cache
