"""ALPRO video-text models + TimeSformer encoder (legacy LAVIS zoo).

Counterparts of ``lavis/models/timesformer/`` (~2,000 LoC) and
``lavis/models/alpro_models/`` (alpro_retrieval.py, alpro_qa.py).

TimeSformer: divided space-time attention (timesformer/vit.py:134-230) —
per block, (1) temporal attention across frames at each spatial location
with a learned output gate (``temporal_fc``), (2) spatial attention within
each frame (CLS attends the full sequence), (3) MLP.

ALPRO: TimeSformer video tower + BERT (MedBert) text tower; retrieval =
in-batch VTC + hard-negative VTM (alpro_retrieval.py:100-133), QA = fused
CLS → answer classifier (alpro_qa.py:53+).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.models.blip1 import _itc_loss
from vlm_compression_tpu.models.layers import SparseLinear
from vlm_compression_tpu.ops.attention import attention_core
from vlm_compression_tpu.models.med import MedBert, MedConfig


@dataclasses.dataclass(frozen=True)
class TimeSformerConfig:
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_frames: int = 8
    layer_norm_eps: float = 1e-6
    param_dtype: str = "float32"
    dtype: str = "bfloat16"
    lora_rank: int = 0
    lora_alpha: float = 16.0

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @staticmethod
    def tiny(**kw) -> "TimeSformerConfig":
        d = dict(img_size=28, patch_size=14, embed_dim=16, depth=2,
                 num_heads=2, num_frames=2)
        d.update(kw)
        return TimeSformerConfig(**d)


def _sl(cfg, features, name):
    return SparseLinear(features, param_dtype=jnp.dtype(cfg.param_dtype),
                        lora_rank=cfg.lora_rank, lora_alpha=cfg.lora_alpha,
                        name=name)


def _mha(cfg, x, kv, name_q, name_k, name_v, name_o, mode):
    h = cfg.num_heads
    d = cfg.embed_dim // h
    q = _sl(cfg, h * d, name_q)(x, mode=mode)
    k = _sl(cfg, h * d, name_k)(kv, mode=mode)
    v = _sl(cfg, h * d, name_v)(kv, mode=mode)
    b, n, _ = x.shape
    m = kv.shape[1]
    out = attention_core(
        q.reshape(b, n, h, d), k.reshape(b, m, h, d),
        v.reshape(b, m, h, d), scale=float(d) ** -0.5).reshape(b, n, h * d)
    return _sl(cfg, cfg.embed_dim, name_o)(out, mode=mode)


class TimeSformerBlock(nn.Module):
    cfg: TimeSformerConfig

    @nn.compact
    def __call__(self, x, n_frames: int, mode="masked"):
        """x: (b, 1 + T*P, d) with CLS first."""
        cfg = self.cfg
        b, n, dim = x.shape
        p = (n - 1) // n_frames

        # (1) temporal attention per spatial location (no CLS)
        xt = x[:, 1:].reshape(b, n_frames, p, dim)
        xt = jnp.moveaxis(xt, 2, 1).reshape(b * p, n_frames, dim)
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="temporal_norm1")(xt).astype(x.dtype)
        t_out = _mha(cfg, y, y, "t_q", "t_k", "t_v", "t_proj", mode)
        t_out = _sl(cfg, cfg.embed_dim, "temporal_fc")(t_out, mode=mode)
        xt = (xt + t_out).reshape(b, p, n_frames, dim)
        xt = jnp.moveaxis(xt, 1, 2).reshape(b, n_frames * p, dim)
        x = jnp.concatenate([x[:, :1], xt], axis=1)

        # (2) spatial attention (CLS attends everything; patch tokens
        # attend within their frame + CLS — the reference repeats CLS per
        # frame; full attention over [CLS ⊕ frame] per frame)
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="norm1")(x).astype(x.dtype)
        cls = y[:, :1]
        spat = y[:, 1:].reshape(b * n_frames, p, dim)
        cls_rep = jnp.repeat(cls, n_frames, axis=0)
        frame = jnp.concatenate([cls_rep, spat], axis=1)
        s_out = _mha(cfg, frame, frame, "q", "k", "v", "proj", mode)
        new_cls = s_out[:, 0].reshape(b, n_frames, dim).mean(axis=1,
                                                             keepdims=True)
        new_spat = s_out[:, 1:].reshape(b, n_frames * p, dim)
        x = x + jnp.concatenate([new_cls, new_spat], axis=1)

        # (3) MLP
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         name="norm2")(x).astype(x.dtype)
        hdn = nn.gelu(_sl(cfg, int(cfg.embed_dim * cfg.mlp_ratio),
                          "fc1")(y, mode=mode), approximate=False)
        return x + _sl(cfg, cfg.embed_dim, "fc2")(hdn, mode=mode)


class TimeSformer(nn.Module):
    """forward(video (b, T, H, W, 3)) → (b, 1 + T·patches, d)."""

    cfg: TimeSformerConfig

    @nn.compact
    def __call__(self, video, mode: str = "masked"):
        cfg = self.cfg
        pdt = jnp.dtype(cfg.param_dtype)
        b, t = video.shape[:2]
        frames = video.reshape((b * t,) + video.shape[2:])
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    param_dtype=pdt, name="patch_embed")(frames)
        p = x.shape[1] * x.shape[2]
        x = x.reshape(b, t * p, cfg.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.embed_dim), pdt)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, cfg.num_patches + 1, cfg.embed_dim), pdt)
        time_embed = self.param("time_embed", nn.initializers.normal(0.02),
                                (1, cfg.num_frames, cfg.embed_dim), pdt)
        spat = (x.reshape(b, t, p, cfg.embed_dim)
                + pos[:, None, 1:, :]
                + time_embed[:, :t, None, :]).reshape(b, t * p,
                                                      cfg.embed_dim)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls + pos[:, :1], (b, 1, cfg.embed_dim)),
             spat], axis=1).astype(jnp.dtype(cfg.dtype))
        for i in range(cfg.depth):
            x = TimeSformerBlock(cfg, name=f"blocks_{i}")(x, t, mode=mode)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                            name="norm")(x).astype(jnp.dtype(cfg.dtype))


@dataclasses.dataclass(frozen=True)
class AlproConfig:
    timesformer: TimeSformerConfig = dataclasses.field(
        default_factory=TimeSformerConfig)
    med: MedConfig = dataclasses.field(
        default_factory=lambda: MedConfig(fusion_start=6))
    embed_dim: int = 256
    num_classes: int = 2

    @staticmethod
    def base(**kw) -> "AlproConfig":
        return AlproConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "AlproConfig":
        d = dict(timesformer=TimeSformerConfig.tiny(),
                 med=MedConfig.tiny(fusion_start=1), embed_dim=8)
        d.update(kw)
        return AlproConfig(**d)


class AlproBase(nn.Module):
    cfg: AlproConfig

    def setup(self):
        cfg = self.cfg
        self.visual_encoder = TimeSformer(cfg.timesformer,
                                          name="visual_encoder")
        self.text_encoder = MedBert(cfg.med, name="text_encoder")
        self.vision_proj = SparseLinear(cfg.embed_dim, name="vision_proj")
        self.text_proj = SparseLinear(cfg.embed_dim, name="text_proj")
        self.itm_head = SparseLinear(2, param_dtype=jnp.float32,
                                     name="itm_head")
        self.temp = self.param("temp", nn.initializers.constant(0.07), ())

    def encode_video(self, video, mode="masked"):
        return self.visual_encoder(video, mode=mode)

    def unimodal_text(self, ids, mask, mode="masked"):
        cfg = self.cfg.med
        x = self.text_encoder.embed(ids)
        m = (mask[:, None, None, :].astype(bool) if mask is not None
             else None)
        for layer in self.text_encoder.layers[:cfg.fusion_start]:
            x = layer(x, m, None, None, mode=mode)
        return x

    def fuse(self, text_hidden, mask, video_embeds, mode="masked"):
        vm = jnp.ones(video_embeds.shape[:2], jnp.int32)
        return self.text_encoder(
            inputs_embeds=text_hidden, attention_mask=mask,
            encoder_hidden_states=video_embeds, encoder_attention_mask=vm,
            start_layer=self.cfg.med.fusion_start, mode=mode)

    def itm_logits(self, text_hidden, mask, video_embeds, mode="masked"):
        """VTM logits for the retrieval rerank (alpro_retrieval.py:330-338)."""
        fused = self.fuse(text_hidden, mask, video_embeds, mode=mode)
        return self.itm_head(fused[:, 0].astype(jnp.float32), mode=mode)

    def vtc_feats(self, video, ids, mask, mode="masked"):
        vid = self.visual_encoder(video, mode=mode)
        txt = self.unimodal_text(ids, mask, mode=mode)
        fv = self.vision_proj(vid[:, 0].astype(jnp.float32), mode=mode)
        ft = self.text_proj(txt[:, 0].astype(jnp.float32), mode=mode)
        fv = fv / jnp.linalg.norm(fv, axis=-1, keepdims=True)
        ft = ft / jnp.linalg.norm(ft, axis=-1, keepdims=True)
        return fv, ft, vid, txt


@registry.register_model("alpro_retrieval")
class AlproRetrieval(AlproBase):
    """In-batch VTC + hard-negative VTM (alpro_retrieval.py:65-149)."""

    def __call__(self, video, input_ids, attention_mask=None,
                 mode: str = "masked"):
        fv, ft, vid, txt = self.vtc_feats(video, input_ids, attention_mask,
                                          mode=mode)
        temp = jnp.clip(self.temp, 1e-3, 0.5)
        loss_vtc, sim_v2t, _ = _itc_loss(fv, ft, temp)
        n = fv.shape[0]
        neg = jnp.argmax(sim_v2t - 1e9 * jnp.eye(n), axis=1)

        def vtm(txt_h, msk, v):
            fused = self.fuse(txt_h, msk, v, mode=mode)
            return self.itm_head(fused[:, 0].astype(jnp.float32), mode=mode)

        logits = jnp.concatenate(
            [vtm(txt, attention_mask, vid),
             vtm(txt[neg], attention_mask[neg], vid),
             vtm(txt, attention_mask, vid[neg])], axis=0)
        labels = jnp.concatenate(
            [jnp.ones(n, jnp.int32), jnp.zeros(2 * n, jnp.int32)])
        lp = jax.nn.log_softmax(logits, axis=-1)
        loss_vtm = -jnp.mean(
            jnp.take_along_axis(lp, labels[:, None], axis=-1))
        return {"loss": loss_vtc + loss_vtm, "loss_vtc": loss_vtc,
                "loss_vtm": loss_vtm}


@registry.register_model("alpro_qa")
class AlproQA(AlproBase):
    """Fused CLS → answer classifier (alpro_qa.py:53+)."""

    def setup(self):
        super().setup()
        self.classifier = SparseLinear(self.cfg.num_classes,
                                       param_dtype=jnp.float32,
                                       name="classifier")

    def __call__(self, video, input_ids, attention_mask=None, labels=None,
                 mode: str = "masked"):
        vid = self.visual_encoder(video, mode=mode)
        txt = self.unimodal_text(input_ids, attention_mask, mode=mode)
        fused = self.fuse(txt, attention_mask, vid, mode=mode)
        logits = self.classifier(fused[:, 0].astype(jnp.float32), mode=mode)
        out = {"logits": logits, "predictions": jnp.argmax(logits, -1)}
        if labels is not None:
            lp = jax.nn.log_softmax(logits, axis=-1)
            out["loss"] = -jnp.mean(
                jnp.take_along_axis(lp, labels[:, None], axis=-1))
        return out
