"""Q-Former bridge (Flax) — BERT with interleaved cross-attention.

Re-design of the reference's HF-BERT-derived Q-Former
(lavis/models/blip2_models/Qformer.py:51-804): 32 learned query tokens
attend jointly with instruction text through self-attention; every
``cross_attention_freq``-th layer additionally cross-attends the *query*
positions to the frozen vision features; query and text positions use
separate FFN stacks (Qformer.py:429-470).  Post-LN BERT micro-structure.

All linears are SparseLinear (the reference targets
``.query/.key/.value/.dense`` for LoRA — scripts/T5/train.py:59).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from vlm_compression_tpu.models.layers import SparseLinear
from vlm_compression_tpu.ops.attention import attention_core


@dataclasses.dataclass(frozen=True)
class QFormerConfig:
    vocab_size: int = 30523            # bert-base-uncased + [DEC] token
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    cross_attention_freq: int = 2
    encoder_width: int = 1408          # vision feature dim
    num_query_tokens: int = 32
    layer_norm_eps: float = 1e-12
    param_dtype: str = "float32"
    dtype: str = "bfloat16"
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @staticmethod
    def tiny(**kw) -> "QFormerConfig":
        d = dict(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                 intermediate_size=32, encoder_width=16, num_query_tokens=4,
                 max_position_embeddings=32)
        d.update(kw)
        return QFormerConfig(**d)


def _sl(cfg, features, name):
    return SparseLinear(features, param_dtype=jnp.dtype(cfg.param_dtype),
                        lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                        name=name)


class BertSelfAttention(nn.Module):
    cfg: QFormerConfig
    is_cross: bool = False

    @nn.compact
    def __call__(self, x, kv, mask, mode="masked"):
        cfg = self.cfg
        h, d = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        q = _sl(cfg, h * d, "query")(x, mode=mode)
        k = _sl(cfg, h * d, "key")(kv, mode=mode)
        v = _sl(cfg, h * d, "value")(kv, mode=mode)
        b, n, _ = q.shape
        m = kv.shape[1]
        q = q.reshape(b, n, h, d)
        k = k.reshape(b, m, h, d)
        v = v.reshape(b, m, h, d)
        bias = None if mask is None else jnp.where(mask, 0.0, -1e9)
        out = attention_core(q, k, v, [bias],
                             scale=float(d) ** -0.5).reshape(b, n, h * d)
        return out


class BertAttention(nn.Module):
    cfg: QFormerConfig
    is_cross: bool = False

    @nn.compact
    def __call__(self, x, kv, mask, mode="masked"):
        cfg = self.cfg
        ctx = BertSelfAttention(cfg, self.is_cross, name="self")(
            x, kv if kv is not None else x, mask, mode=mode)
        out = _sl(cfg, cfg.hidden_size, "output_dense")(ctx, mode=mode)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                            name="output_ln")(out + x).astype(x.dtype)


class BertFFN(nn.Module):
    cfg: QFormerConfig

    @nn.compact
    def __call__(self, x, mode="masked"):
        cfg = self.cfg
        h = _sl(cfg, cfg.intermediate_size, "intermediate_dense")(x, mode=mode)
        h = nn.gelu(h, approximate=False)
        out = _sl(cfg, cfg.hidden_size, "output_dense")(h, mode=mode)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                            name="output_ln")(out + x).astype(x.dtype)


class QFormerLayer(nn.Module):
    cfg: QFormerConfig
    has_cross_attention: bool

    @nn.compact
    def __call__(self, x, self_mask, image_embeds, image_mask,
                 query_length: int, mode="masked"):
        cfg = self.cfg
        x = BertAttention(cfg, name="attention")(x, None, self_mask, mode=mode)
        if query_length > 0:
            q_part = x[:, :query_length]
            if self.has_cross_attention:
                q_part = BertAttention(cfg, is_cross=True,
                                       name="crossattention")(
                    q_part, image_embeds, image_mask, mode=mode)
            q_out = BertFFN(cfg, name="ffn_query")(q_part, mode=mode)
            if x.shape[1] > query_length:
                t_out = BertFFN(cfg, name="ffn")(x[:, query_length:], mode=mode)
                return jnp.concatenate([q_out, t_out], axis=1)
            return q_out
        return BertFFN(cfg, name="ffn")(x, mode=mode)


class QFormer(nn.Module):
    """Bridge.  __call__(image_embeds, text_ids?, text_mask?) → hidden states.

    Returns the full [query; text] sequence; callers slice the first
    ``num_query_tokens`` positions for projection into the LLM
    (blip2_t5_instruct.py:158-176).
    """

    cfg: QFormerConfig

    def setup(self):
        cfg = self.cfg
        pdt = jnp.dtype(cfg.param_dtype)
        self.query_tokens = self.param(
            "query_tokens", nn.initializers.truncated_normal(0.02),
            (1, cfg.num_query_tokens, cfg.hidden_size), pdt)
        self.word_embeddings = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                        param_dtype=pdt, name="word_embeddings")
        self.position_embeddings = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, param_dtype=pdt,
            name="position_embeddings")
        self.emb_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                   dtype=jnp.float32, name="emb_ln")
        self.layers = [
            QFormerLayer(cfg, has_cross_attention=(i % cfg.cross_attention_freq == 0),
                         name=f"layers_{i}")
            for i in range(cfg.num_layers)
        ]

    def embed(self, text_ids: Optional[jnp.ndarray]):
        """Queries (+ optional embedded text): block-0 input.

        LayerNorm runs over the *concatenated* [query; text] sequence
        (Qformer.py:100-107 applies LayerNorm after the cat).
        """
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        q = self.query_tokens.astype(jnp.float32)
        if text_ids is not None:
            te = self.word_embeddings(text_ids)
            pos = self.position_embeddings(jnp.arange(text_ids.shape[1]))
            te = (te + pos[None]).astype(jnp.float32)
            b = text_ids.shape[0]
            x = jnp.concatenate(
                [jnp.broadcast_to(q, (b, q.shape[1], q.shape[2])), te], axis=1)
        else:
            x = q
        return self.emb_ln(x).astype(dt)

    def embed_text_only(self, text_ids):
        """Text embeddings WITHOUT query tokens (stage-1 ITC text branch,
        reference blip2_qformer.py forward_text)."""
        te = self.word_embeddings(text_ids)
        pos = self.position_embeddings(jnp.arange(text_ids.shape[1]))
        x = (te + pos[None]).astype(jnp.float32)
        return self.emb_ln(x).astype(jnp.dtype(self.cfg.dtype))

    def forward_text(self, text_ids, text_mask=None, causal: bool = False,
                     mode: str = "masked"):
        """Text-only encoder pass (query_length=0 → cross-attention and the
        query FFN are skipped)."""
        x = self.embed_text_only(text_ids)
        n = x.shape[1]
        if text_mask is not None:
            m = text_mask[:, None, None, :].astype(bool)
        else:
            m = jnp.ones((x.shape[0], 1, 1, n), bool)
        if causal:
            cm = (jnp.arange(n)[None, :] <= jnp.arange(n)[:, None])
            m = m & cm[None, None]
        for layer in self.layers:
            x = layer(x, m, None, None, 0, mode=mode)
        return x

    def forward_multimodal(self, image_embeds, text_ids, text_mask=None,
                           causal_text: bool = False, mode: str = "masked"):
        """[queries ⊕ text] with image cross-attention.  causal_text=True
        gives the stage-1 LM pattern: queries bidirectional among
        themselves, text attends queries + causal self (the reference's
        BertLMHeadModel with query past_key_values)."""
        cfg = self.cfg
        x = self.embed(text_ids)
        b = image_embeds.shape[0]
        if x.shape[0] == 1 and b > 1:
            x = jnp.broadcast_to(x, (b,) + x.shape[1:])
        ql = cfg.num_query_tokens
        n = x.shape[1]
        tmask = (text_mask if text_mask is not None
                 else jnp.ones((b, n - ql), jnp.int32))
        valid = jnp.concatenate(
            [jnp.ones((b, ql), tmask.dtype), tmask], axis=1)
        m = valid[:, None, None, :].astype(bool)
        if causal_text:
            i = jnp.arange(n)[:, None]
            j = jnp.arange(n)[None, :]
            # queries visible to everyone; text causal; query rows never
            # reach text columns (j < ql covers them, j <= i can't)
            struct = (j < ql) | (j <= i)
            m = m & struct[None, None]
        img = image_embeds.astype(x.dtype)
        for layer in self.layers:
            x = layer(x, m, img, None, ql, mode=mode)
        return x

    def __call__(self, image_embeds, text_ids=None, text_mask=None,
                 mode: str = "masked"):
        cfg = self.cfg
        x = self.embed(text_ids)
        b = image_embeds.shape[0]
        if x.shape[0] == 1 and b > 1:
            x = jnp.broadcast_to(x, (b,) + x.shape[1:])
        ql = cfg.num_query_tokens
        if text_mask is not None:
            full_mask = jnp.concatenate(
                [jnp.ones((b, ql), text_mask.dtype), text_mask], axis=1)
            self_mask = full_mask[:, None, None, :].astype(bool)
        else:
            self_mask = None
        img = image_embeds.astype(x.dtype)
        for layer in self.layers:
            x = layer(x, self_mask, img, None, ql, mode=mode)
        return x
