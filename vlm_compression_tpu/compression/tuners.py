"""Auxiliary parameter-efficient tuners: prompt / prefix / bottleneck.

Counterpart of the vendored PEFT's non-LoRA tuners
(lavis/peft/src/peft/tuners/{prompt_tuning.py, prefix_tuning.py,
p_tuning.py, bottleneck.py} — present in the reference but unused by the
RESSA scripts).  Functional flax equivalents:

  * ``PromptTuning``: ``num_virtual_tokens`` learned embeddings prepended
    to ``inputs_embeds`` (optionally initialized from token embeddings)
  * ``PrefixTuning``: learned per-layer key/value prefixes produced by a
    two-layer MLP over prefix embeddings (the reference's
    ``PrefixEncoder``), returned as a cache-like tree the attention
    modules can consume
  * ``BottleneckAdapter``: down-project → nonlinearity → up-project
    residual adapter
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PromptTuningConfig:
    num_virtual_tokens: int = 20
    token_dim: int = 768


class PromptTuning(nn.Module):
    cfg: PromptTuningConfig

    @nn.compact
    def __call__(self, inputs_embeds, attention_mask=None):
        cfg = self.cfg
        prompt = self.param(
            "prompt_embeddings", nn.initializers.normal(0.02),
            (cfg.num_virtual_tokens, cfg.token_dim), jnp.float32)
        b = inputs_embeds.shape[0]
        p = jnp.broadcast_to(prompt[None].astype(inputs_embeds.dtype),
                             (b,) + prompt.shape)
        out = jnp.concatenate([p, inputs_embeds], axis=1)
        if attention_mask is not None:
            ones = jnp.ones((b, cfg.num_virtual_tokens),
                            attention_mask.dtype)
            return out, jnp.concatenate([ones, attention_mask], axis=1)
        return out, None


@dataclasses.dataclass(frozen=True)
class PrefixTuningConfig:
    num_virtual_tokens: int = 20
    token_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    encoder_hidden_size: int = 768
    prefix_projection: bool = True


class PrefixTuning(nn.Module):
    """Produces (num_layers, 2, b, tokens, heads, head_dim) prefix k/v."""

    cfg: PrefixTuningConfig

    @nn.compact
    def __call__(self, batch_size: int):
        cfg = self.cfg
        head_dim = cfg.token_dim // cfg.num_heads
        tokens = jnp.arange(cfg.num_virtual_tokens)
        emb = nn.Embed(cfg.num_virtual_tokens, cfg.token_dim,
                       name="prefix_embedding")(tokens)
        if cfg.prefix_projection:
            h = nn.Dense(cfg.encoder_hidden_size, name="proj_in")(emb)
            h = jnp.tanh(h)
            kv = nn.Dense(cfg.num_layers * 2 * cfg.token_dim,
                          name="proj_out")(h)
        else:
            kv = nn.Dense(cfg.num_layers * 2 * cfg.token_dim,
                          name="kv")(emb)
        kv = kv.reshape(cfg.num_virtual_tokens, cfg.num_layers, 2,
                        cfg.num_heads, head_dim)
        kv = jnp.transpose(kv, (1, 2, 0, 3, 4))     # (L, 2, T, H, D)
        return jnp.broadcast_to(
            kv[:, :, None], (cfg.num_layers, 2, batch_size,
                             cfg.num_virtual_tokens, cfg.num_heads,
                             head_dim))


@dataclasses.dataclass(frozen=True)
class BottleneckConfig:
    bottleneck_size: int = 64
    non_linearity: str = "relu"
    scaling: float = 1.0


class BottleneckAdapter(nn.Module):
    cfg: BottleneckConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        act = {"relu": nn.relu, "gelu": nn.gelu,
               "tanh": jnp.tanh}[cfg.non_linearity]
        h = nn.Dense(cfg.bottleneck_size, name="down")(x)
        h = act(h)
        h = nn.Dense(x.shape[-1], name="up")(h)
        return x + cfg.scaling * h
