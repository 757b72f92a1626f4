"""ALBEF model family (legacy LAVIS zoo).

Counterpart of the reference's ``lavis/models/albef_models/`` (~2,100 LoC):
albef_pretrain / albef_retrieval / albef_vqa / albef_nlvr /
albef_classification / albef_feature_extractor.

ALBEF = ViT-B/16 + a 12-layer BERT whose TOP HALF carries cross-attention
to the image ("fusion layers", layer 6+), trained with ITC (unimodal
halves) + ITM (fused CLS) + MLM.  The MED trunk (models/med.py) expresses
this with ``fusion_start = num_layers // 2`` and the ``start_layer``
argument for running the unimodal and fusion halves separately.  Momentum
distillation / queues are pretraining infra; the distill=False losses are
implemented (same simplification as models/blip1.py, documented there).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.models.blip1 import _itc_loss
from vlm_compression_tpu.models.layers import SparseLinear
from vlm_compression_tpu.models.med import MedBert, MedConfig, lm_loss
from vlm_compression_tpu.models.vit import ViT, ViTConfig


@dataclasses.dataclass(frozen=True)
class AlbefConfig:
    vit: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    med: MedConfig = dataclasses.field(
        default_factory=lambda: MedConfig(fusion_start=6))
    embed_dim: int = 256
    num_classes: int = 2
    max_txt_len: int = 30
    alpha: float = 0.4                 # distill mixing (config parity)

    @staticmethod
    def base(**kw) -> "AlbefConfig":
        return AlbefConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "AlbefConfig":
        d = dict(vit=ViTConfig.tiny(),
                 med=MedConfig.tiny(fusion_start=1),
                 embed_dim=8, max_txt_len=8)
        d.update(kw)
        return AlbefConfig(**d)


class AlbefBase(nn.Module):
    cfg: AlbefConfig

    def setup(self):
        cfg = self.cfg
        self.visual_encoder = ViT(cfg.vit, name="visual_encoder")
        self.text_encoder = MedBert(cfg.med, name="text_encoder")
        self.vision_proj = SparseLinear(cfg.embed_dim, name="vision_proj")
        self.text_proj = SparseLinear(cfg.embed_dim, name="text_proj")
        self.itm_head = SparseLinear(2, param_dtype=jnp.float32,
                                     name="itm_head")
        self.temp = self.param("temp", nn.initializers.constant(0.07), ())

    def encode_image(self, image, mode="masked"):
        return self.visual_encoder(image, mode=mode)

    def unimodal_text(self, ids, mask, mode="masked"):
        """Bottom (pre-fusion) half only: no encoder states supplied, run
        layers [0, fusion_start)."""
        cfg = self.cfg.med
        x = self.text_encoder.embed(ids)
        m = (mask[:, None, None, :].astype(bool) if mask is not None
             else None)
        for layer in self.text_encoder.layers[:cfg.fusion_start]:
            x = layer(x, m, None, None, mode="masked" if mode is None
                      else mode)
        return x

    def fuse(self, text_hidden, mask, image_embeds, mode="masked"):
        img_mask = jnp.ones(image_embeds.shape[:2], jnp.int32)
        return self.text_encoder(
            inputs_embeds=text_hidden, attention_mask=mask,
            encoder_hidden_states=image_embeds,
            encoder_attention_mask=img_mask,
            start_layer=self.cfg.med.fusion_start, mode=mode)

    def itc_feats(self, image, ids, mask, mode="masked"):
        img = self.encode_image(image, mode=mode)
        txt = self.unimodal_text(ids, mask, mode=mode)
        fi = self.vision_proj(img[:, 0].astype(jnp.float32), mode=mode)
        ft = self.text_proj(txt[:, 0].astype(jnp.float32), mode=mode)
        fi = fi / jnp.linalg.norm(fi, axis=-1, keepdims=True)
        ft = ft / jnp.linalg.norm(ft, axis=-1, keepdims=True)
        return fi, ft, img, txt

    def itm_logits(self, text_hidden, mask, image_embeds, mode="masked"):
        fused = self.fuse(text_hidden, mask, image_embeds, mode=mode)
        return self.itm_head(fused[:, 0].astype(jnp.float32), mode=mode)


@registry.register_model("albef_feature_extractor")
class AlbefFeatureExtractor(AlbefBase):
    def __call__(self, image=None, input_ids=None, attention_mask=None,
                 extract_mode: str = "multimodal", mode: str = "masked"):
        if extract_mode == "all":
            # init-time: touch every branch so all params materialize
            out = dict(self(image, extract_mode="image", mode=mode))
            out.update(self(input_ids=input_ids,
                            attention_mask=attention_mask,
                            extract_mode="text", mode=mode))
            out.update(self(image, input_ids, attention_mask,
                            extract_mode="multimodal", mode=mode))
            return out
        if extract_mode == "image":
            img = self.encode_image(image, mode=mode)
            emb = self.vision_proj(img[:, 0].astype(jnp.float32), mode=mode)
            return {"image_embeds": img,
                    "image_features": emb / jnp.linalg.norm(
                        emb, axis=-1, keepdims=True)}
        if extract_mode == "text":
            txt = self.unimodal_text(input_ids, attention_mask, mode=mode)
            emb = self.text_proj(txt[:, 0].astype(jnp.float32), mode=mode)
            return {"text_embeds": txt,
                    "text_features": emb / jnp.linalg.norm(
                        emb, axis=-1, keepdims=True)}
        img = self.encode_image(image, mode=mode)
        txt = self.unimodal_text(input_ids, attention_mask, mode=mode)
        return {"multimodal_embeds": self.fuse(txt, attention_mask, img,
                                               mode=mode)}


@registry.register_model("albef_retrieval")
class AlbefRetrieval(AlbefBase):
    """ITC + hard-negative ITM (albef_retrieval.py, distill=False)."""

    def __call__(self, image, input_ids, attention_mask=None,
                 mode: str = "masked"):
        fi, ft, img, txt = self.itc_feats(image, input_ids, attention_mask,
                                          mode=mode)
        temp = jnp.clip(self.temp, 1e-3, 0.5)
        loss_itc, sim_i2t, _ = _itc_loss(fi, ft, temp)
        n = fi.shape[0]
        neg = jnp.argmax(sim_i2t - 1e9 * jnp.eye(n), axis=1)
        pos = self.itm_logits(txt, attention_mask, img, mode=mode)
        neg_t = self.itm_logits(txt[neg], attention_mask[neg], img,
                                mode=mode)
        neg_i = self.itm_logits(txt, attention_mask, img[neg], mode=mode)
        logits = jnp.concatenate([pos, neg_t, neg_i], axis=0)
        labels = jnp.concatenate(
            [jnp.ones(n, jnp.int32), jnp.zeros(2 * n, jnp.int32)])
        lp = jax.nn.log_softmax(logits, axis=-1)
        loss_itm = -jnp.mean(
            jnp.take_along_axis(lp, labels[:, None], axis=-1))
        return {"loss": loss_itc + loss_itm, "loss_itc": loss_itc,
                "loss_itm": loss_itm}


@registry.register_model("albef_pretrain")
class AlbefPretrain(AlbefBase):
    """ITC + ITM + MLM (albef_pretrain.py, distill=False).  The MLM pass
    re-embeds ``mlm_input_ids`` (pre-masked by the caller) and scores all
    positions with the tied LM head."""

    def __call__(self, image, input_ids, attention_mask=None,
                 mlm_input_ids=None, mlm_labels=None, mode: str = "masked"):
        out = AlbefRetrieval.__call__(self, image, input_ids,
                                      attention_mask, mode=mode)
        if mlm_input_ids is not None:
            img = self.encode_image(image, mode=mode)
            txt = self.unimodal_text(mlm_input_ids, attention_mask,
                                     mode=mode)
            fused = self.fuse(txt, attention_mask, img, mode=mode)
            logits = self.text_encoder.lm_logits(fused, mode=mode)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            msk = (mlm_labels >= 0).astype(jnp.float32)
            tgt = jnp.clip(mlm_labels, 0, logits.shape[-1] - 1)
            nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
            loss_mlm = jnp.sum(nll * msk) / jnp.maximum(jnp.sum(msk), 1.0)
            out["loss_mlm"] = loss_mlm
            out["loss"] = out["loss"] + loss_mlm
        return out


@registry.register_model("albef_vqa")
class AlbefVQA(AlbefBase):
    """Question fused with image; answers scored/generated by a causal
    decoder pass over the fused states (albef_vqa.py; same shared-trunk
    decoder arrangement as models/blip1.BlipVQA)."""

    def question_states(self, image, q_ids, q_mask, mode="masked"):
        img = self.encode_image(image, mode=mode)
        txt = self.unimodal_text(q_ids, q_mask, mode=mode)
        return self.fuse(txt, q_mask, img, mode=mode)

    def __call__(self, image, input_ids, attention_mask=None, labels=None,
                 mode: str = "masked"):
        q_states = self.question_states(image, input_ids, attention_mask,
                                        mode=mode)
        a_ids = labels
        hidden = self.text_encoder(
            a_ids, None, q_states,
            (attention_mask if attention_mask is not None
             else jnp.ones(q_states.shape[:2], jnp.int32)),
            causal=True, mode=mode)
        logits = self.text_encoder.lm_logits(hidden, mode=mode)
        out = {"logits": logits}
        if labels is not None:
            out["loss"] = lm_loss(logits, labels,
                                  (labels >= 0).astype(jnp.int32))
        return out

    def rank_answers(self, image, q_ids, q_mask, cand_ids, cand_mask,
                     mode: str = "masked"):
        q_states = self.question_states(image, q_ids, q_mask, mode=mode)
        b = q_states.shape[0]
        k = cand_ids.shape[0]
        qs = jnp.repeat(q_states, k, axis=0)
        qm = jnp.repeat(q_mask, k, axis=0)
        ids = jnp.tile(cand_ids, (b, 1))
        msk = jnp.tile(cand_mask, (b, 1))
        hidden = self.text_encoder(ids, msk, qs, qm, causal=True, mode=mode)
        logits = self.text_encoder.lm_logits(hidden, mode=mode)
        logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), -1)
        tok = jnp.take_along_axis(logp, ids[:, 1:][..., None], -1)[..., 0]
        return jnp.sum(tok * msk[:, 1:], axis=1).reshape(b, k)


@registry.register_model("albef_nlvr")
class AlbefNlvr(AlbefBase):
    def setup(self):
        super().setup()
        self.cls_head = SparseLinear(self.cfg.num_classes,
                                     param_dtype=jnp.float32,
                                     name="cls_head")

    def __call__(self, image0, image1, input_ids, attention_mask=None,
                 labels=None, mode: str = "masked"):
        img0 = self.encode_image(image0, mode=mode)
        img1 = self.encode_image(image1, mode=mode)
        both = jnp.concatenate([img0, img1], axis=1)
        txt = self.unimodal_text(input_ids, attention_mask, mode=mode)
        fused = self.fuse(txt, attention_mask, both, mode=mode)
        logits = self.cls_head(fused[:, 0].astype(jnp.float32), mode=mode)
        out = {"logits": logits, "predictions": jnp.argmax(logits, -1)}
        if labels is not None:
            lp = jax.nn.log_softmax(logits, axis=-1)
            out["loss"] = -jnp.mean(
                jnp.take_along_axis(lp, labels[:, None], axis=-1))
        return out


@registry.register_model("albef_classification")
class AlbefClassification(AlbefBase):
    def setup(self):
        super().setup()
        self.cls_head = SparseLinear(self.cfg.num_classes,
                                     param_dtype=jnp.float32,
                                     name="cls_head")

    def __call__(self, image, input_ids, attention_mask=None, labels=None,
                 mode: str = "masked"):
        img = self.encode_image(image, mode=mode)
        txt = self.unimodal_text(input_ids, attention_mask, mode=mode)
        fused = self.fuse(txt, attention_mask, img, mode=mode)
        logits = self.cls_head(fused[:, 0].astype(jnp.float32), mode=mode)
        out = {"logits": logits, "predictions": jnp.argmax(logits, -1)}
        if labels is not None:
            lp = jax.nn.log_softmax(logits, axis=-1)
            out["loss"] = -jnp.mean(
                jnp.take_along_axis(lp, labels[:, None], axis=-1))
        return out

    def predict(self, image, input_ids, attention_mask=None,
                mode: str = "masked"):
        return self(image, input_ids, attention_mask, mode=mode)
