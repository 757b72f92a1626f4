"""Plain (timm-style) ViT — the BLIP-1 / ALBEF vision tower.

Counterpart of the reference's ``lavis/models/vit.py`` (527 LoC: ViT-B/16
and ViT-L/16 with fused qkv, CLS token, learned pos embed, pre-LN blocks,
``vit.py:58-230``).  Every linear is a SparseLinear so the legacy zoo is
prunable with the same machinery as the RESSA towers.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from vlm_compression_tpu.models.layers import SparseLinear
from vlm_compression_tpu.ops.attention import attention_core


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    layer_norm_eps: float = 1e-6
    param_dtype: str = "float32"
    dtype: str = "bfloat16"
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @staticmethod
    def base(**kw) -> "ViTConfig":
        return ViTConfig(**kw)

    @staticmethod
    def large(**kw) -> "ViTConfig":
        d = dict(embed_dim=1024, depth=24, num_heads=16)
        d.update(kw)
        return ViTConfig(**d)

    @staticmethod
    def tiny(**kw) -> "ViTConfig":
        d = dict(img_size=28, patch_size=14, embed_dim=16, depth=2,
                 num_heads=2)
        d.update(kw)
        return ViTConfig(**d)


def _sl(cfg, features, name, use_bias=True):
    return SparseLinear(features, use_bias=use_bias,
                        param_dtype=jnp.dtype(cfg.param_dtype),
                        lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                        name=name)


class ViTAttention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, mode="masked"):
        cfg = self.cfg
        h = cfg.num_heads
        d = cfg.embed_dim // h
        qkv = _sl(cfg, 3 * cfg.embed_dim, "qkv")(x, mode=mode)
        b, n, _ = x.shape
        q, k, v = jnp.split(qkv.reshape(b, n, 3, h, d), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        out = attention_core(q, k, v,
                             scale=float(d) ** -0.5).reshape(b, n, h * d)
        return _sl(cfg, cfg.embed_dim, "proj")(out, mode=mode)


class ViTBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, mode="masked"):
        cfg = self.cfg
        hidden = int(cfg.embed_dim * cfg.mlp_ratio)
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="norm1")(x).astype(x.dtype)
        x = x + ViTAttention(cfg, name="attn")(y, mode=mode)
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="norm2")(x).astype(x.dtype)
        h = _sl(cfg, hidden, "fc1")(y, mode=mode)
        h = nn.gelu(h, approximate=False)
        return x + _sl(cfg, cfg.embed_dim, "fc2")(h, mode=mode)


class ViT(nn.Module):
    """forward(images) → (b, 1+patches, embed_dim); CLS at position 0."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, images, mode: str = "masked"):
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        pdt = jnp.dtype(cfg.param_dtype)
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    param_dtype=pdt, name="patch_embed")(images)
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.embed_dim), pdt)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.num_patches + 1, cfg.embed_dim), pdt)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.embed_dim)), x], axis=1)
        x = (x + pos).astype(dt)
        for i in range(cfg.depth):
            x = ViTBlock(cfg, name=f"blocks_{i}")(x, mode=mode)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="norm")(x)
        return x.astype(dt)
