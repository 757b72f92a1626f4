"""OPT decoder-only tower (BLIP-2-OPT language model).

Counterpart of ``lavis/models/blip2_models/modeling_opt.py`` (1,113 LoC,
the one reference tower WITHOUT the ``dense`` flag — SURVEY.md §2.3):
learned positional embeddings with the OPT +2 offset, pre-LayerNorm
blocks, ReLU FFN, biased linears, final LayerNorm.  All linears are
``SparseLinear`` so the compression stack applies uniformly (an upgrade
over the reference, which cannot teacher-forward this tower).
Shares the KV-cache decode protocol of ``llama.py``.
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
class OPTConfig:
    vocab_size: int = 50272
    hidden_size: int = 2560
    ffn_dim: int = 10240
    num_layers: int = 32
    num_heads: int = 32
    max_position_embeddings: int = 2048
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    bos_token_id: int = 2
    eos_token_id: int = 2
    param_dtype: str = "bfloat16"
    dtype: str = "bfloat16"
    lora_rank: int = 0
    lora_alpha: float = 16.0
    # int8 decode KV cache: codes + per-(batch,slot,head) absmax
    # scales — halves persistent decode memory vs bf16 (kvcache.py)
    kv_cache_int8: bool = False
    kv_cache_per_row: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @staticmethod
    def opt_2_7b(**kw) -> "OPTConfig":
        return OPTConfig(**kw)

    @staticmethod
    def opt_6_7b(**kw) -> "OPTConfig":
        d = dict(hidden_size=4096, ffn_dim=16384, num_layers=32,
                 num_heads=32)
        d.update(kw)
        return OPTConfig(**d)

    @staticmethod
    def tiny(**kw) -> "OPTConfig":
        d = dict(vocab_size=96, hidden_size=16, ffn_dim=32, num_layers=2,
                 num_heads=2, max_position_embeddings=64)
        d.update(kw)
        return OPTConfig(**d)


class OPTAttention(nn.Module):
    cfg: OPTConfig

    @nn.compact
    def __call__(self, x, mask, mode="masked", decode: bool = False):
        cfg = self.cfg
        pdt = jnp.dtype(cfg.param_dtype)
        hd = cfg.head_dim

        def sl(name):
            return SparseLinear(cfg.hidden_size, use_bias=True,
                                param_dtype=pdt, lora_rank=cfg.lora_rank,
                                lora_alpha=cfg.lora_alpha, name=name)

        b, n, _ = x.shape
        # OPT scales the QUERY by 1/sqrt(d) before the product
        q = (sl("q_proj")(x, mode=mode) * (hd ** -0.5)).reshape(
            b, n, cfg.num_heads, hd)
        k = sl("k_proj")(x, mode=mode).reshape(b, n, cfg.num_heads, hd)
        v = sl("v_proj")(x, mode=mode).reshape(b, n, cfg.num_heads, hd)

        if decode:
            k, v, cur, is_init = cache_kv(self, k, v,
                                          int8=cfg.kv_cache_int8,
                                          per_row=cfg.kv_cache_per_row)
            if is_init:
                mask = step_visibility_mask(cur, n, k.shape[1], mask)

        out = attention_core(q, k, v, [mask], scale=1.0).reshape(
            b, n, cfg.hidden_size)
        return sl("out_proj")(out, mode=mode)


class OPTBlock(nn.Module):
    cfg: OPTConfig

    @nn.compact
    def __call__(self, x, mask=None, mode="masked", decode: bool = False):
        cfg = self.cfg

        def ln(name):
            return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                dtype=jnp.float32, name=name)

        h = ln("self_attn_ln")(x).astype(x.dtype)
        x = x + OPTAttention(cfg, name="self_attn")(h, mask, mode=mode,
                                                    decode=decode)
        h = ln("final_ln")(x).astype(x.dtype)
        h = nn.relu(SparseLinear(cfg.ffn_dim,
                                 param_dtype=jnp.dtype(cfg.param_dtype),
                                 lora_rank=cfg.lora_rank,
                                 lora_alpha=cfg.lora_alpha,
                                 name="fc1")(h, mode=mode))
        h = SparseLinear(cfg.hidden_size,
                         param_dtype=jnp.dtype(cfg.param_dtype),
                         lora_rank=cfg.lora_rank,
                         lora_alpha=cfg.lora_alpha,
                         name="fc2")(h, mode=mode)
        return x + h


class OPTForCausalLM(nn.Module):
    cfg: OPTConfig

    def setup(self):
        cfg = self.cfg
        pdt = jnp.dtype(cfg.param_dtype)
        self.embed_tokens_table = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, param_dtype=pdt,
            embedding_init=nn.initializers.normal(0.02), name="embed_tokens")
        # OPT learned positions carry a +2 offset (HF OPTLearnedPositional)
        self.embed_positions = nn.Embed(
            cfg.max_position_embeddings + 2, cfg.hidden_size,
            param_dtype=pdt, embedding_init=nn.initializers.normal(0.02),
            name="embed_positions")
        self.blocks = [OPTBlock(cfg, name=f"blocks_{i}")
                       for i in range(cfg.num_layers)]
        self.final_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                       dtype=jnp.float32, name="final_norm")
        self.lm_head = SparseLinear(cfg.vocab_size, use_bias=False,
                                    param_dtype=pdt, name="lm_head")

    def embed_tokens(self, ids):
        return self.embed_tokens_table(ids).astype(jnp.dtype(self.cfg.dtype))

    def __call__(self, input_ids=None, attention_mask=None,
                 inputs_embeds=None, labels=None, positions=None,
                 mode="masked", decode: bool = False):
        cfg = self.cfg
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        b, n, _ = inputs_embeds.shape
        if positions is None:
            if attention_mask is not None and not decode:
                positions = jnp.maximum(
                    jnp.cumsum(attention_mask, axis=-1) - 1, 0)
            else:
                positions = jnp.broadcast_to(jnp.arange(n)[None], (b, n))
        pos_emb = self.embed_positions(positions + 2).astype(
            inputs_embeds.dtype)
        x = inputs_embeds + pos_emb

        if decode:
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
            x = blk(x, mask, mode=mode, decode=decode)
        x = self.final_norm(x).astype(jnp.float32)
        logits = self.lm_head(x, mode=mode).astype(jnp.float32)
        if labels is None:
            return logits
        from vlm_compression_tpu.models.t5 import cross_entropy_loss

        return {"loss": cross_entropy_loss(logits[:, :-1], labels[:, 1:]),
                "logits": logits}


def convert_opt(sd, num_layers: int):
    """HF OPTForCausalLM state dict → our tree (decoder.* prefix)."""
    def g(k):
        for p in ("model.decoder.", "decoder.", "model."):
            if p + k in sd:
                return np.asarray(sd[p + k])
        return np.asarray(sd[k])

    def lin(name):
        out = {"kernel": g(name + ".weight").T}
        b = None
        for p in ("model.decoder.", "decoder.", "model.", ""):
            if p + name + ".bias" in sd:
                b = np.asarray(sd[p + name + ".bias"])
                break
        if b is not None:
            out["bias"] = b
        return out

    def ln(name):
        return {"scale": g(name + ".weight"), "bias": g(name + ".bias")}

    p = {
        "embed_tokens": {"embedding": g("embed_tokens.weight")},
        "embed_positions": {"embedding": g("embed_positions.weight")},
        "final_norm": ln("final_layer_norm"),
        "lm_head": {"kernel": np.asarray(sd["lm_head.weight"]).T},
    }
    for i in range(num_layers):
        b = f"layers.{i}."
        p[f"blocks_{i}"] = {
            "self_attn_ln": ln(b + "self_attn_layer_norm"),
            "final_ln": ln(b + "final_layer_norm"),
            "self_attn": {k: lin(b + f"self_attn.{k}")
                          for k in ("q_proj", "k_proj", "v_proj",
                                    "out_proj")},
            "fc1": lin(b + "fc1"),
            "fc2": lin(b + "fc2"),
        }
    return p
