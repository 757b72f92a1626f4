"""FlanT5 encoder-decoder language tower (Flax).

Re-design of the reference's modified HF T5 copy
(lavis/models/blip2_models/modeling_t5.py: `dense` threaded through
T5DenseGatedActDense :306-341 and T5Attention :491-653).  v1.1 micro-arch:
RMSNorm (no bias, fp32 variance), gated-GELU FFN (wi_0 ⊙ gelu · wi_1 → wo),
no attention scaling (folded into init), relative-position buckets on the
first self-attention layer of each stack, untied lm_head for Flan-T5.

All projections are SparseLinear (LoRA targets ``.q,.k,.v,.o,.wi_0,.wi_1,
.wo`` — scripts/T5/train.py:57).  Encoder-decoder attention masks follow HF
semantics (−inf additive on pad positions, causal in the decoder).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vlm_compression_tpu.models.layers import SparseLinear
from vlm_compression_tpu.ops.attention import attention_core
from vlm_compression_tpu.models.kvcache import (cache_kv,
    step_visibility_mask)


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 2048
    d_kv: int = 64
    d_ff: int = 5120
    num_layers: int = 24
    num_decoder_layers: int = 24
    num_heads: int = 32
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    tie_word_embeddings: bool = False
    decoder_start_token_id: int = 0
    pad_token_id: int = 0
    param_dtype: str = "bfloat16"
    dtype: str = "bfloat16"
    lora_rank: int = 0
    lora_alpha: float = 16.0
    # int8 decode KV cache: codes + per-(batch,slot,head) absmax
    # scales — halves persistent decode memory vs bf16 (kvcache.py)
    kv_cache_int8: bool = False
    kv_cache_per_row: bool = False
    # rematerialize each block's activations in the backward pass —
    # trades FLOPs for memory so dense-teacher + student + grads fit XL
    # towers on one chip (SURVEY §7 hard part 5); training path only
    # (the KV-cached decode path never differentiates)
    use_remat: bool = False

    @staticmethod
    def flan_t5_xl(**kw) -> "T5Config":
        return T5Config(**kw)

    @staticmethod
    def flan_t5_xxl(**kw) -> "T5Config":
        d = dict(d_model=4096, d_ff=10240, num_layers=24,
                 num_decoder_layers=24, num_heads=64)
        d.update(kw)
        return T5Config(**d)

    @staticmethod
    def tiny(**kw) -> "T5Config":
        d = dict(vocab_size=96, d_model=16, d_kv=8, d_ff=32, num_layers=2,
                 num_decoder_layers=2, num_heads=2)
        d.update(kw)
        return T5Config(**d)


class RMSNorm(nn.Module):
    """T5LayerNorm: scale-only, fp32 variance, no mean subtraction."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],),
                           jnp.float32)
        x32 = x.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        y = x32 * jax.lax.rsqrt(var + self.eps)
        return (y * scale).astype(x.dtype)


def relative_position_bucket(rel_pos, bidirectional: bool, num_buckets: int,
                             max_distance: int):
    """HF T5 bucketing (log-spaced beyond num_buckets//2)."""
    ret = jnp.zeros_like(rel_pos)
    n = -rel_pos
    if bidirectional:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5RelPosBias(nn.Module):
    cfg: T5Config
    bidirectional: bool

    @nn.compact
    def __call__(self, q_len: int, k_len: int):
        cfg = self.cfg
        emb = self.param(
            "rel_embedding", nn.initializers.normal(1.0),
            (cfg.relative_attention_num_buckets, cfg.num_heads), jnp.float32)
        ctx = jnp.arange(q_len)[:, None]
        mem = jnp.arange(k_len)[None, :]
        buckets = relative_position_bucket(
            mem - ctx, self.bidirectional,
            cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance)
        bias = emb[buckets]                       # (q, k, heads)
        return jnp.transpose(bias, (2, 0, 1))[None]  # (1, heads, q, k)


class T5Attention(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x, kv, position_bias, mask, mode="masked",
                 decode: bool = False):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        pdt = jnp.dtype(cfg.param_dtype)

        def sl(name):
            return SparseLinear(inner, use_bias=False, param_dtype=pdt,
                                lora_rank=cfg.lora_rank,
                                lora_alpha=cfg.lora_alpha, name=name)

        kv_in = kv if kv is not None else x
        q = sl("q")(x, mode=mode)
        b, n, _ = q.shape
        q = q.reshape(b, n, cfg.num_heads, cfg.d_kv)

        if decode and kv is not None and \
                self.has_variable("cache", "cross_key"):
            # cross-attention k/v over the STATIC encoder output were
            # projected once during the cache-init pass (make_t5_step
            # decodes a dummy with the real enc_out) — HF caches these in
            # past_key_values (modeling_t5.py:514-538); without this,
            # every decode step re-projects enc_len rows in every layer
            k = self.get_variable("cache", "cross_key")
            v = self.get_variable("cache", "cross_value")
        else:
            k = sl("k")(kv_in, mode=mode)
            v = sl("v")(kv_in, mode=mode)
            m = k.shape[1]
            k = k.reshape(b, m, cfg.num_heads, cfg.d_kv)
            v = v.reshape(b, m, cfg.num_heads, cfg.d_kv)
            if decode and kv is not None:
                self.variable("cache", "cross_key", lambda: k)
                self.variable("cache", "cross_value", lambda: v)

        # KV-cached single-step decoding (self-attention only): the flax
        # idiom — first mutable("cache") apply over the full max_len dummy
        # creates the buffers, later calls write step k/v at cache_index.
        # Replaces HF's past_key_values threading (modeling_t5.py:491-653).
        if decode and kv is None:
            k, v, cur, is_init = cache_kv(self, k, v,
                                          int8=cfg.kv_cache_int8,
                                          per_row=cfg.kv_cache_per_row)
            if is_init:
                max_len = k.shape[1]
                mask = step_visibility_mask(cur, n, max_len, mask)
                if position_bias is not None:
                    if cfg.kv_cache_per_row:
                        # each row decodes at its own frontier → its own
                        # bias rows: (b, h, n, max_len)
                        position_bias = jax.vmap(
                            lambda c: jax.lax.dynamic_slice(
                                position_bias[0], (0, c, 0),
                                (cfg.num_heads, n, max_len)))(cur)
                    else:
                        position_bias = jax.lax.dynamic_slice(
                            position_bias, (0, 0, cur, 0),
                            (1, cfg.num_heads, n, max_len))

        # no 1/sqrt(d): T5 folds it into init
        out = attention_core(q, k, v, [position_bias, mask],
                             scale=1.0).reshape(b, n, inner)
        return SparseLinear(cfg.d_model, use_bias=False, param_dtype=pdt,
                            lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                            name="o")(out, mode=mode)


class T5FFN(nn.Module):
    """Gated-GELU FFN (modeling_t5.py:306-341)."""
    cfg: T5Config

    @nn.compact
    def __call__(self, x, mode="masked"):
        cfg = self.cfg
        pdt = jnp.dtype(cfg.param_dtype)

        def sl(features, name):
            return SparseLinear(features, use_bias=False, param_dtype=pdt,
                                lora_rank=cfg.lora_rank,
                                lora_alpha=cfg.lora_alpha, name=name)

        gate = nn.gelu(sl(cfg.d_ff, "wi_0")(x, mode=mode), approximate=True)
        up = sl(cfg.d_ff, "wi_1")(x, mode=mode)
        return sl(cfg.d_model, "wo")(gate * up, mode=mode)


class T5Block(nn.Module):
    cfg: T5Config
    is_decoder: bool

    @nn.compact
    def __call__(self, x, enc_out=None, self_bias=None, self_mask=None,
                 cross_mask=None, mode="masked", decode: bool = False):
        cfg = self.cfg
        h = RMSNorm(cfg.layer_norm_epsilon, name="ln_self")(x)
        x = x + T5Attention(cfg, name="self_attn")(
            h, None, self_bias, self_mask, mode=mode, decode=decode)
        if self.is_decoder:
            h = RMSNorm(cfg.layer_norm_epsilon, name="ln_cross")(x)
            x = x + T5Attention(cfg, name="cross_attn")(
                h, enc_out, None, cross_mask, mode=mode)
        h = RMSNorm(cfg.layer_norm_epsilon, name="ln_ffn")(x)
        x = x + T5FFN(cfg, name="ffn")(h, mode=mode)
        return x


def extend_mask(attention_mask):
    """(b, k) 1/0 → additive (b, 1, 1, k) float32."""
    if attention_mask is None:
        return None
    return jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, -1e9)


def causal_mask(q_len, k_len=None):
    k_len = k_len or q_len
    i = jnp.arange(q_len)[:, None]
    j = jnp.arange(k_len)[None, :]
    return jnp.where(j <= i + (k_len - q_len), 0.0, -1e9)[None, None]


def _apply_block(blk, x, enc_out, bias, cmask, mode, decode,
                 use_remat: bool):
    """One transformer block, optionally under jax.checkpoint (flax
    function-form nn.remat keeps the block's scope/param names intact).
    The KV-cached decode path stays un-remat'd: it mutates the cache
    collection and is never differentiated."""
    if use_remat and not decode:
        fn = nn.remat(
            lambda m, xx, eo, bb, cm, mo, de: m(
                xx, enc_out=eo, self_bias=bb, cross_mask=cm, mode=mo,
                decode=de),
            static_argnums=(5, 6))
        return fn(blk, x, enc_out, bias, cmask, mode, decode)
    return blk(x, enc_out=enc_out, self_bias=bias, cross_mask=cmask,
               mode=mode, decode=decode)


class T5Encoder(nn.Module):
    cfg: T5Config

    def setup(self):
        cfg = self.cfg
        self.rel_bias = T5RelPosBias(cfg, bidirectional=True, name="rel_bias")
        self.blocks = [T5Block(cfg, is_decoder=False, name=f"blocks_{i}")
                       for i in range(cfg.num_layers)]
        self.final_norm = RMSNorm(cfg.layer_norm_epsilon, name="final_norm")

    def __call__(self, inputs_embeds, attention_mask=None, mode="masked"):
        x = inputs_embeds
        bias = self.rel_bias(x.shape[1], x.shape[1])
        mask = extend_mask(attention_mask)
        if mask is not None:
            bias = bias + mask
        for blk in self.blocks:
            x = _apply_block(blk, x, None, bias, None, mode, False,
                             self.cfg.use_remat)
        return self.final_norm(x)


class T5Decoder(nn.Module):
    cfg: T5Config

    def setup(self):
        cfg = self.cfg
        self.rel_bias = T5RelPosBias(cfg, bidirectional=False, name="rel_bias")
        self.blocks = [T5Block(cfg, is_decoder=True, name=f"blocks_{i}")
                       for i in range(cfg.num_decoder_layers)]
        self.final_norm = RMSNorm(cfg.layer_norm_epsilon, name="final_norm")

    def __call__(self, inputs_embeds, enc_out, dec_mask=None, enc_mask=None,
                 mode="masked", decode: bool = False,
                 max_decode_len: Optional[int] = None):
        x = inputs_embeds
        n = x.shape[1]
        if decode:
            # cache path: causality comes from the per-layer cache_index;
            # the full (L, L) bias is computed once and row-sliced inside
            # the attention at its cache position
            length = max_decode_len or n
            bias = self.rel_bias(length, length)
        else:
            bias = self.rel_bias(n, n) + causal_mask(n)
            if dec_mask is not None:
                bias = bias + extend_mask(dec_mask)
        cmask = extend_mask(enc_mask)
        for blk in self.blocks:
            x = _apply_block(blk, x, enc_out, bias, cmask, mode, decode,
                             self.cfg.use_remat)
        return self.final_norm(x)


class T5ForConditionalGeneration(nn.Module):
    """Seq2seq LM head model.

    __call__ returns logits; `loss` computes the label-masked CE matching the
    reference training objective (labels == -100 ignored).
    """

    cfg: T5Config

    def setup(self):
        cfg = self.cfg
        pdt = jnp.dtype(cfg.param_dtype)
        self.shared = nn.Embed(cfg.vocab_size, cfg.d_model, param_dtype=pdt,
                               embedding_init=nn.initializers.normal(1.0),
                               name="shared")
        self.encoder = T5Encoder(cfg, name="encoder")
        self.decoder = T5Decoder(cfg, name="decoder")
        if not cfg.tie_word_embeddings:
            self.lm_head = SparseLinear(cfg.vocab_size, use_bias=False,
                                        param_dtype=pdt, name="lm_head")

    def encode(self, input_ids=None, inputs_embeds=None, attention_mask=None,
               mode="masked"):
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        return self.encoder(inputs_embeds, attention_mask, mode=mode)

    def embed_tokens(self, ids):
        return self.shared(ids).astype(jnp.dtype(self.cfg.dtype))

    def decode(self, decoder_input_ids, enc_out, dec_mask=None, enc_mask=None,
               mode="masked", decode=False, max_decode_len=None):
        x = self.embed_tokens(decoder_input_ids)
        h = self.decoder(x, enc_out, dec_mask, enc_mask, mode=mode,
                         decode=decode, max_decode_len=max_decode_len)
        if self.cfg.tie_word_embeddings:
            h = h * (self.cfg.d_model ** -0.5)
            logits = self.shared.attend(h.astype(self.shared.embedding.dtype))
        else:
            logits = self.lm_head(h, mode=mode)
        return logits.astype(jnp.float32)

    def __call__(self, input_ids=None, attention_mask=None,
                 decoder_input_ids=None, decoder_attention_mask=None,
                 inputs_embeds=None, labels=None, mode="masked"):
        """HF parity (modeling_t5.py:1793+): with ``labels``, decoder inputs
        default to the shifted labels and the result is a loss+logits dict."""
        if labels is not None and decoder_input_ids is None:
            decoder_input_ids = shift_right(
                labels, self.cfg.decoder_start_token_id, self.cfg.pad_token_id)
            if decoder_attention_mask is None:
                decoder_attention_mask = (labels != -100).astype(jnp.int32)
        enc = self.encode(input_ids, inputs_embeds, attention_mask, mode=mode)
        logits = self.decode(decoder_input_ids, enc, decoder_attention_mask,
                             attention_mask, mode=mode)
        if labels is None:
            return logits
        return {"loss": cross_entropy_loss(logits, labels), "logits": logits}


def shift_right(labels, decoder_start_token_id=0, pad_token_id=0):
    """HF `_shift_right`: labels → decoder inputs."""
    shifted = jnp.concatenate(
        [jnp.full(labels.shape[:-1] + (1,), decoder_start_token_id,
                  labels.dtype), labels[..., :-1]], axis=-1)
    return jnp.where(shifted == -100, pad_token_id, shifted)


def cross_entropy_loss(logits, labels, ignore_index=-100):
    """Token-mean CE over non-ignored labels (HF CrossEntropyLoss default)."""
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    n = jnp.maximum(valid.sum(), 1)
    return -(ll * valid).sum() / n
