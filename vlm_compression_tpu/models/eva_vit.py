"""EVA ViT-g vision tower (Flax).

Re-design of the reference's timm-style EVA encoder
(lavis/models/eva_vit.py:44-208,406-501): 39 blocks, embed 1408,
16 heads × 88 head-dim, mlp hidden int(1408·4.3637)=6144, patch 14,
fused qkv with *separate* q/v biases (k bias fixed at zero), pre-LN blocks,
no final norm in the BLIP-2 path (num_classes=0 returns raw block output —
eva_vit.py:406-411; BLIP-2 applies its own ln_vision).

TPU notes: params live in bf16 (reference converts to fp16 for CUDA —
eva_vit.py:474-501; bf16 is the TPU-native half type), attention softmax
accumulates in fp32, and every linear is a SparseLinear so the pruning /
SparseLoRA machinery applies uniformly.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlm_compression_tpu.models.layers import SparseLinear
from vlm_compression_tpu.ops.attention import attention_core


@dataclasses.dataclass(frozen=True)
class EvaViTConfig:
    img_size: int = 224
    patch_size: int = 14
    embed_dim: int = 1408
    depth: int = 39
    num_heads: int = 16
    mlp_hidden_dim: int = 6144          # int(1408 * 4.3637)
    layer_norm_eps: float = 1e-6
    param_dtype: str = "bfloat16"
    dtype: str = "bfloat16"
    lora_rank: int = 0                  # rank for all target linears (V tower)
    lora_alpha: float = 16.0
    use_remat: bool = False

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @staticmethod
    def eva_clip_g(**kw) -> "EvaViTConfig":
        return EvaViTConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "EvaViTConfig":
        d = dict(img_size=28, patch_size=14, embed_dim=16, depth=2,
                 num_heads=2, mlp_hidden_dim=32)
        d.update(kw)
        return EvaViTConfig(**d)


class EvaAttention(nn.Module):
    cfg: EvaViTConfig

    @nn.compact
    def __call__(self, x, mode="masked"):
        cfg = self.cfg
        b, n, c = x.shape
        dim = cfg.embed_dim
        head_dim = dim // cfg.num_heads
        pdt = jnp.dtype(cfg.param_dtype)

        qkv = SparseLinear(3 * dim, use_bias=False, param_dtype=pdt,
                           lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                           name="qkv")(x, mode=mode)
        # fused projection, but bias only on q and v (eva_vit.py:90-141)
        q_bias = self.param("q_bias", nn.initializers.zeros, (dim,), pdt)
        v_bias = self.param("v_bias", nn.initializers.zeros, (dim,), pdt)
        bias = jnp.concatenate(
            [q_bias, jnp.zeros_like(q_bias), v_bias]).astype(qkv.dtype)
        qkv = qkv + bias

        qkv = qkv.reshape(b, n, 3, cfg.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, d)

        out = attention_core(q, k, v, scale=head_dim ** -0.5)
        out = out.reshape(b, n, dim)
        return SparseLinear(dim, param_dtype=pdt, lora_rank=cfg.lora_rank,
                            lora_alpha=cfg.lora_alpha, name="proj")(out, mode=mode)


class EvaMlp(nn.Module):
    cfg: EvaViTConfig

    @nn.compact
    def __call__(self, x, mode="masked"):
        cfg = self.cfg
        pdt = jnp.dtype(cfg.param_dtype)
        h = SparseLinear(cfg.mlp_hidden_dim, param_dtype=pdt,
                         lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                         name="fc1")(x, mode=mode)
        h = nn.gelu(h, approximate=False)
        return SparseLinear(cfg.embed_dim, param_dtype=pdt,
                            lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                            name="fc2")(h, mode=mode)


class EvaBlock(nn.Module):
    cfg: EvaViTConfig

    @nn.compact
    def __call__(self, x, mode="masked"):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
            param_dtype=jnp.float32, name=name)
        x = x + EvaAttention(cfg, name="attn")(
            ln("norm1")(x).astype(x.dtype), mode=mode)
        x = x + EvaMlp(cfg, name="mlp")(
            ln("norm2")(x).astype(x.dtype), mode=mode)
        return x


class EvaViT(nn.Module):
    """Vision tower.  __call__(images (b,h,w,3)) → (b, 1+patches, embed).

    setup-style so the calibration engine can run the stem alone
    (``apply(..., method=EvaViT.embed)``) and then drive blocks one at a
    time through their param subtrees (``params["blocks_<i>"]``) — the
    TPU-native replacement for the reference's Catcher-exception input
    trapping (wanda_pruner.py:238-268).
    """

    cfg: EvaViTConfig

    def setup(self):
        cfg = self.cfg
        pdt = jnp.dtype(cfg.param_dtype)
        self.patch_embed = nn.Conv(
            cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
            param_dtype=pdt, dtype=jnp.dtype(cfg.dtype), name="patch_embed")
        self.cls_token = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, cfg.embed_dim), pdt)
        self.pos_embed = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, cfg.num_patches + 1, cfg.embed_dim), pdt)
        self.blocks = [EvaBlock(cfg, name=f"blocks_{i}")
                       for i in range(cfg.depth)]

    def embed(self, images):
        """Patchify + cls + positions: the input to block 0."""
        cfg = self.cfg
        dt = jnp.dtype(cfg.dtype)
        x = self.patch_embed(images.astype(dt))
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.embed_dim)
        cls = jnp.broadcast_to(self.cls_token, (b, 1, cfg.embed_dim))
        x = jnp.concatenate([cls.astype(dt), x], axis=1)
        return x + self.pos_embed.astype(dt)

    def __call__(self, images, mode: str = "masked"):
        x = self.embed(images)
        for blk in self.blocks:
            if self.cfg.use_remat:
                x = nn.remat(lambda m, xx, mo: m(xx, mo),
                             static_argnums=(2,))(blk, x, mode)
            else:
                x = blk(x, mode)
        # BLIP-2 path: no final norm (eva_vit.py:406-411)
        return x


def _bicubic_resize_axis(x, out_size: int, axis: int):
    """Cubic-convolution resample along one axis, exactly matching torch's
    `F.interpolate(mode="bicubic", align_corners=False)`: A = -0.75, source
    index (i + 0.5)·scale − 0.5, border-replicated taps."""
    import numpy as np

    x = np.moveaxis(np.asarray(x, np.float64), axis, 0)
    in_size = x.shape[0]
    if in_size == out_size:
        return np.moveaxis(x, 0, axis)
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0
    A = -0.75
    cc1 = lambda u: (A + 2) * u ** 3 - (A + 3) * u ** 2 + 1          # noqa: E731
    cc2 = lambda u: A * u ** 3 - 5 * A * u ** 2 + 8 * A * u - 4 * A  # noqa: E731
    w = np.stack([cc2(1 + t), cc1(t), cc1(1 - t), cc2(2 - t)])       # (4, out)
    out = np.zeros((out_size,) + x.shape[1:], np.float64)
    for tap in range(4):
        idx = np.clip(i0 + tap - 1, 0, in_size - 1)
        out += w[tap].reshape((-1,) + (1,) * (x.ndim - 1)) * x[idx]
    return np.moveaxis(out, 0, axis)


def interpolate_pos_embed(pos_embed, num_patches: int):
    """Resize a (1, 1+old_patches, dim) position table to a new patch count
    (reference eva_vit.py:432-453: keep the cls slot, bicubic-resize the
    square patch grid).  Used when loading a tower checkpoint trained at a
    different image size (reference train.py:377-400).  Host-side numpy,
    bit-matched to the reference's torch bicubic (fp32 output)."""
    import math

    import numpy as np

    old = pos_embed.shape[1] - 1
    if old == num_patches:
        return pos_embed
    dim = pos_embed.shape[-1]
    cls_tok, grid = pos_embed[:, :1], pos_embed[:, 1:]
    g0 = int(math.sqrt(old))
    g1 = int(math.sqrt(num_patches))
    if g0 * g0 != old or g1 * g1 != num_patches:
        raise ValueError(f"non-square patch grids: {old} -> {num_patches}")
    grid = np.asarray(grid, np.float32).reshape(1, g0, g0, dim)
    grid = _bicubic_resize_axis(grid, g1, axis=1)
    grid = _bicubic_resize_axis(grid, g1, axis=2)
    grid = jnp.asarray(grid.reshape(1, g1 * g1, dim), jnp.float32)
    return jnp.concatenate(
        [jnp.asarray(cls_tok), grid.astype(pos_embed.dtype)], axis=1)
