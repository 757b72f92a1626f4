"""CLIP / EVA-CLIP (legacy LAVIS zoo).

Counterpart of the reference's ``lavis/models/clip_models/`` (~3,600 LoC,
the OpenCLIP fork) and ``eva_clip`` variants: a contrastive dual encoder —
ViT visual tower with a linear projection + causal text transformer with
EOT pooling and a text projection, learned logit scale.  ``eva_clip``
swaps the visual tower for EVA-ViT (models/eva_vit.py).

forward(samples) → InfoNCE loss over in-batch pairs; ``extract_features``
returns normalized embeddings; retrieval uses plain feature similarity
(clip_models retrieval has no ITM re-ranking stage).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.models.eva_vit import EvaViT, EvaViTConfig
from vlm_compression_tpu.models.layers import SparseLinear
from vlm_compression_tpu.ops.attention import attention_core
from vlm_compression_tpu.models.vit import ViT, ViTConfig


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = 77
    layer_norm_eps: float = 1e-5
    param_dtype: str = "float32"
    dtype: str = "bfloat16"
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @staticmethod
    def tiny(**kw) -> "ClipTextConfig":
        d = dict(vocab_size=64, width=16, layers=2, heads=2,
                 context_length=16)
        d.update(kw)
        return ClipTextConfig(**d)


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    vit: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    text: ClipTextConfig = dataclasses.field(default_factory=ClipTextConfig)
    embed_dim: int = 512
    use_eva: bool = False
    eva: Optional[EvaViTConfig] = None

    @staticmethod
    def base(**kw) -> "ClipConfig":
        return ClipConfig(**kw)

    @staticmethod
    def eva_clip_g(**kw) -> "ClipConfig":
        d = dict(use_eva=True, eva=EvaViTConfig.eva_clip_g(),
                 embed_dim=1024)
        d.update(kw)
        return ClipConfig(**d)

    @staticmethod
    def tiny(**kw) -> "ClipConfig":
        d = dict(vit=ViTConfig.tiny(), text=ClipTextConfig.tiny(),
                 embed_dim=8)
        d.update(kw)
        return ClipConfig(**d)

    @staticmethod
    def tiny_eva(**kw) -> "ClipConfig":
        d = dict(use_eva=True, eva=EvaViTConfig.tiny(),
                 vit=ViTConfig.tiny(), text=ClipTextConfig.tiny(),
                 embed_dim=8)
        d.update(kw)
        return ClipConfig(**d)


def _sl(cfg: ClipTextConfig, features, name, use_bias=True):
    return SparseLinear(features, use_bias=use_bias,
                        param_dtype=jnp.dtype(cfg.param_dtype),
                        lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                        name=name)


class ClipTextBlock(nn.Module):
    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, x, mode="masked"):
        cfg = self.cfg
        h = cfg.heads
        d = cfg.width // h
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="ln_1")(x).astype(x.dtype)
        qkv = _sl(cfg, 3 * cfg.width, "qkv")(y, mode=mode)
        b, n, _ = x.shape
        q, k, v = jnp.split(qkv.reshape(b, n, 3, h, d), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        ctx = attention_core(q, k, v, scale=float(d) ** -0.5,
                             causal=True).reshape(b, n, h * d)
        x = x + _sl(cfg, cfg.width, "proj")(ctx, mode=mode)
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="ln_2")(x).astype(x.dtype)
        hdn = _sl(cfg, 4 * cfg.width, "fc")(y, mode=mode)
        hdn = nn.gelu(hdn, approximate=True)
        return x + _sl(cfg, cfg.width, "c_proj")(hdn, mode=mode)


class ClipTextEncoder(nn.Module):
    cfg: ClipTextConfig
    embed_dim: int

    @nn.compact
    def __call__(self, text_ids, mode="masked"):
        cfg = self.cfg
        pdt = jnp.dtype(cfg.param_dtype)
        tok = nn.Embed(cfg.vocab_size, cfg.width, param_dtype=pdt,
                       name="token_embedding")(text_ids)
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.width), pdt)
        x = (tok + pos[None, :text_ids.shape[1]]).astype(jnp.dtype(cfg.dtype))
        for i in range(cfg.layers):
            x = ClipTextBlock(cfg, name=f"resblocks_{i}")(x, mode=mode)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="ln_final")(x)
        # EOT pooling: highest token id marks end-of-text (OpenCLIP)
        eot = jnp.argmax(text_ids, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return _sl(cfg, self.embed_dim, "text_projection",
                   use_bias=False)(pooled.astype(jnp.float32), mode=mode)


@registry.register_model("clip")
@registry.register_model("clip_feature_extractor")
class Clip(nn.Module):
    cfg: ClipConfig

    def setup(self):
        cfg = self.cfg
        if cfg.use_eva:
            self.visual = EvaViT(cfg.eva, name="visual")
            width = cfg.eva.embed_dim
        else:
            self.visual = ViT(cfg.vit, name="visual")
            width = cfg.vit.embed_dim
        self.visual_projection = SparseLinear(cfg.embed_dim, use_bias=False,
                                              name="visual_projection")
        self.text = ClipTextEncoder(cfg.text, cfg.embed_dim, name="text")
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(jnp.log(1 / 0.07)), ())

    def encode_image(self, image, mode="masked"):
        feats = self.visual(image, mode=mode)
        emb = self.visual_projection(feats[:, 0].astype(jnp.float32),
                                     mode=mode)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def encode_text(self, text_ids, mode="masked"):
        emb = self.text(text_ids, mode=mode)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def __call__(self, image, input_ids, attention_mask=None,
                 mode: str = "masked"):
        fi = self.encode_image(image, mode=mode)
        ft = self.encode_text(input_ids, mode=mode)
        scale = jnp.exp(jnp.clip(self.logit_scale, None, jnp.log(100.0)))
        logits = scale * fi @ ft.T
        n = logits.shape[0]
        labels = jnp.arange(n)
        ce = lambda s: jnp.mean(
            -jnp.take_along_axis(jax.nn.log_softmax(s, axis=-1),
                                 labels[:, None], axis=-1))
        loss = 0.5 * (ce(logits) + ce(logits.T))
        return {"loss": loss, "logits": logits,
                "image_features": fi, "text_features": ft}

    def extract_features(self, image=None, input_ids=None,
                         mode: str = "masked"):
        out = {}
        if image is not None:
            out["image_features"] = self.encode_image(image, mode=mode)
        if input_ids is not None:
            out["text_features"] = self.encode_text(input_ids, mode=mode)
        return out


@registry.register_model("eva_clip")
@registry.register_model("eva_clip_feature_extractor")
class EvaClip(Clip):
    """EVA-CLIP: Clip with the EVA-ViT-g visual tower (reference
    eva_clip registry names)."""
