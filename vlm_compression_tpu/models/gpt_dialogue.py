"""GPT-2 dialogue model for AVSD (legacy LAVIS zoo).

Counterpart of ``lavis/models/gpt_models/gpt_dialogue.py``: a GPT-2 LM
whose input sequence is [projected video features ⊕ token embeddings];
loss = token CE (+ MSE regression of the next video feature through
``video_ff_out``, gpt_dialogue.py:82-94).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.models.layers import SparseLinear
from vlm_compression_tpu.ops.attention import attention_core


@dataclasses.dataclass(frozen=True)
class GPTDialogueConfig:
    vocab_size: int = 50264            # gpt2 + dialogue special tokens
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    n_positions: int = 1024
    len_video_ft: int = 4224
    layer_norm_eps: float = 1e-5
    param_dtype: str = "float32"
    dtype: str = "bfloat16"
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @staticmethod
    def base(**kw) -> "GPTDialogueConfig":
        return GPTDialogueConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "GPTDialogueConfig":
        d = dict(vocab_size=64, n_embd=16, n_layer=2, n_head=2,
                 n_positions=64, len_video_ft=8)
        d.update(kw)
        return GPTDialogueConfig(**d)


def _sl(cfg, features, name):
    return SparseLinear(features, param_dtype=jnp.dtype(cfg.param_dtype),
                        lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                        name=name)


class GPT2Block(nn.Module):
    cfg: GPTDialogueConfig

    @nn.compact
    def __call__(self, x, mode="masked"):
        cfg = self.cfg
        h = cfg.n_head
        d = cfg.n_embd // h
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="ln_1")(x).astype(x.dtype)
        qkv = _sl(cfg, 3 * cfg.n_embd, "c_attn")(y, mode=mode)
        b, n, _ = x.shape
        q, k, v = jnp.split(qkv.reshape(b, n, 3, h, d), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        ctx = attention_core(q, k, v, scale=float(d) ** -0.5,
                             causal=True).reshape(b, n, h * d)
        x = x + _sl(cfg, cfg.n_embd, "c_proj")(ctx, mode=mode)
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="ln_2")(x).astype(x.dtype)
        hdn = nn.gelu(_sl(cfg, 4 * cfg.n_embd, "mlp_fc")(y, mode=mode),
                      approximate=True)
        return x + _sl(cfg, cfg.n_embd, "mlp_proj")(hdn, mode=mode)


@registry.register_model("gpt_dialogue")
class GPTDialogue(nn.Module):
    cfg: GPTDialogueConfig

    def setup(self):
        cfg = self.cfg
        pdt = jnp.dtype(cfg.param_dtype)
        self.wte = nn.Embed(cfg.vocab_size, cfg.n_embd, param_dtype=pdt,
                            name="wte")
        self.wpe = nn.Embed(cfg.n_positions, cfg.n_embd, param_dtype=pdt,
                            name="wpe")
        self.video_ff = SparseLinear(cfg.n_embd, name="video_ff")
        self.video_ff_out = SparseLinear(cfg.len_video_ft,
                                         name="video_ff_out")
        self.blocks = [GPT2Block(cfg, name=f"h_{i}")
                       for i in range(cfg.n_layer)]
        self.ln_f = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                 dtype=jnp.float32, name="ln_f")

    def trunk(self, input_embs, mode="masked"):
        n = input_embs.shape[1]
        x = (input_embs + self.wpe(jnp.arange(n))[None]).astype(
            jnp.dtype(self.cfg.dtype))
        for blk in self.blocks:
            x = blk(x, mode=mode)
        return self.ln_f(x)

    def __call__(self, input_ids, video_fts=None, labels=None,
                 token_type_ids=None, mode: str = "masked"):
        cfg = self.cfg
        tok = self.wte(input_ids).astype(jnp.float32)
        if token_type_ids is not None:
            # segment embeddings (cap/speaker1/speaker2) share the token
            # embedding table, like the reference GPT dialogue model
            tok = tok + self.wte(token_type_ids).astype(jnp.float32)
        n_vid = 0
        if video_fts is not None:
            vid = self.video_ff(video_fts.astype(jnp.float32), mode=mode)
            tok = jnp.concatenate([vid, tok], axis=1)
            n_vid = video_fts.shape[1]
        hidden = self.trunk(tok, mode=mode)
        emb = self.wte.embedding.astype(jnp.float32)
        logits = jnp.dot(hidden[:, n_vid:], emb.T)
        out = {"logits": logits}
        if labels is not None:
            lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            tgt = labels[:, 1:]
            msk = (tgt >= 0).astype(jnp.float32)
            nll = -jnp.take_along_axis(
                lp, jnp.clip(tgt, 0, cfg.vocab_size - 1)[..., None],
                -1)[..., 0]
            loss = jnp.sum(nll * msk) / jnp.maximum(jnp.sum(msk), 1.0)
            if video_fts is not None:
                vlog = self.video_ff_out(hidden[:, :n_vid], mode=mode)
                vloss = jnp.mean(
                    (vlog[:, :-1] - video_fts[:, 1:].astype(jnp.float32))
                    ** 2)
                loss = loss + vloss
                out["video_loss"] = vloss
            out["loss"] = loss
        return out
