"""MED: Multimodal mixture of Encoder-Decoder BERT (BLIP-1 / ALBEF text side).

Counterpart of the reference's ``lavis/models/med.py`` (1,416 LoC, an HF
BERT fork).  One module serves all three BLIP text roles by static flags
(med.py's ``mode`` arg: "text" / "multimodal" / "decoder"):

  * text encoder           — bidirectional self-attention only;
  * fusion encoder         — + cross-attention to image features in every
                             layer (BLIP) or the top half (ALBEF's
                             ``fusion_layer``);
  * causal LM decoder      — causal self-attention + cross-attention with
                             a tied LM head.

Post-LN BERT micro-structure; all linears SparseLinear.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlm_compression_tpu.models.layers import SparseLinear
from vlm_compression_tpu.ops.attention import attention_core


@dataclasses.dataclass(frozen=True)
class MedConfig:
    vocab_size: int = 30524            # bert-base + [DEC]/[ENC] tokens
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    encoder_width: int = 768           # vision feature dim
    fusion_start: int = 0              # first layer with cross-attention
    layer_norm_eps: float = 1e-12
    param_dtype: str = "float32"
    dtype: str = "bfloat16"
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @staticmethod
    def tiny(**kw) -> "MedConfig":
        d = dict(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                 intermediate_size=32, encoder_width=16,
                 max_position_embeddings=32)
        d.update(kw)
        return MedConfig(**d)


def _sl(cfg, features, name):
    return SparseLinear(features, param_dtype=jnp.dtype(cfg.param_dtype),
                        lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                        name=name)


class MedAttention(nn.Module):
    cfg: MedConfig

    @nn.compact
    def __call__(self, x, kv, mask, mode="masked"):
        cfg = self.cfg
        h = cfg.num_heads
        d = cfg.hidden_size // h
        q = _sl(cfg, h * d, "query")(x, mode=mode)
        k = _sl(cfg, h * d, "key")(kv, mode=mode)
        v = _sl(cfg, h * d, "value")(kv, mode=mode)
        b, n, _ = x.shape
        m = kv.shape[1]
        bias = None if mask is None else jnp.where(mask, 0.0, -1e9)
        ctx = attention_core(
            q.reshape(b, n, h, d), k.reshape(b, m, h, d),
            v.reshape(b, m, h, d), [bias],
            scale=float(d) ** -0.5).reshape(b, n, h * d)
        out = _sl(cfg, cfg.hidden_size, "output_dense")(ctx, mode=mode)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                            name="output_ln")(out + x).astype(x.dtype)


class MedLayer(nn.Module):
    cfg: MedConfig
    has_cross: bool

    @nn.compact
    def __call__(self, x, self_mask, enc_states, enc_mask, mode="masked"):
        cfg = self.cfg
        x = MedAttention(cfg, name="attention")(x, x, self_mask, mode=mode)
        if self.has_cross and enc_states is not None:
            x = MedAttention(cfg, name="crossattention")(
                x, enc_states.astype(x.dtype), enc_mask, mode=mode)
        h = _sl(cfg, cfg.intermediate_size, "intermediate_dense")(x, mode=mode)
        h = nn.gelu(h, approximate=False)
        out = _sl(cfg, cfg.hidden_size, "ffn_output_dense")(h, mode=mode)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                            name="ffn_output_ln")(out + x).astype(x.dtype)


class MedBert(nn.Module):
    """BERT trunk.  ``__call__(ids, mask, enc_states?, causal?)`` → hidden.

    ``lm_logits(hidden)`` applies the tied LM head (decoder role);
    ``inputs_embeds`` bypasses the embedding lookup (ALBEF MLM path).
    """

    cfg: MedConfig

    def setup(self):
        cfg = self.cfg
        pdt = jnp.dtype(cfg.param_dtype)
        self.word_embeddings = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                                        param_dtype=pdt,
                                        name="word_embeddings")
        self.position_embeddings = nn.Embed(cfg.max_position_embeddings,
                                            cfg.hidden_size, param_dtype=pdt,
                                            name="position_embeddings")
        self.emb_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                   dtype=jnp.float32, name="emb_ln")
        self.layers = [MedLayer(cfg, has_cross=(i >= cfg.fusion_start),
                                name=f"layers_{i}")
                       for i in range(cfg.num_layers)]
        self.lm_transform = _sl(cfg, cfg.hidden_size, "lm_transform")
        self.lm_transform_ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                            dtype=jnp.float32,
                                            name="lm_transform_ln")

    def embed(self, input_ids):
        te = self.word_embeddings(input_ids)
        pos = self.position_embeddings(jnp.arange(input_ids.shape[1]))
        x = (te + pos[None]).astype(jnp.float32)
        return self.emb_ln(x).astype(jnp.dtype(self.cfg.dtype))

    def __call__(self, input_ids=None, attention_mask=None,
                 encoder_hidden_states=None, encoder_attention_mask=None,
                 causal: bool = False, inputs_embeds=None,
                 start_layer: int = 0, mode: str = "masked"):
        x = inputs_embeds if inputs_embeds is not None else self.embed(
            input_ids)
        b, n = x.shape[:2]
        if attention_mask is not None:
            m = attention_mask[:, None, None, :].astype(bool)
        else:
            m = jnp.ones((b, 1, 1, n), bool)
        if causal:
            cm = jnp.arange(n)[None, :] <= jnp.arange(n)[:, None]
            m = m & cm[None, None]
        em = None
        if encoder_hidden_states is not None:
            if encoder_attention_mask is not None:
                em = encoder_attention_mask[:, None, None, :].astype(bool)
        for layer in self.layers[start_layer:]:
            x = layer(x, m, encoder_hidden_states, em, mode=mode)
        return x

    def lm_logits(self, hidden, mode: str = "masked"):
        """Tied LM head (med BertLMPredictionHead: transform + decoder
        sharing the word embedding)."""
        h = self.lm_transform(hidden, mode=mode)
        h = nn.gelu(h, approximate=False)
        h = self.lm_transform_ln(h)
        emb = self.word_embeddings.embedding.astype(jnp.float32)
        return jnp.dot(h, emb.T)


def lm_loss(logits, labels, label_mask=None, label_smoothing: float = 0.1):
    """Shifted causal LM loss (med decoder; reference uses 0.1 smoothing)."""
    logits = logits[:, :-1]
    targets = labels[:, 1:]
    mask = (label_mask[:, 1:] if label_mask is not None
            else (targets >= 0)).astype(jnp.float32)
    vocab = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(targets, 0, vocab - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    smooth = -jnp.mean(logp, axis=-1)
    loss = (1 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), 1.0)
