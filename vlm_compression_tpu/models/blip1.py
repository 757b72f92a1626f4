"""BLIP-1 model family (legacy LAVIS zoo).

Counterpart of the reference's ``lavis/models/blip_models/`` (~2,600 LoC):
``blip.py`` (BlipBase), ``blip_caption.py``, ``blip_vqa.py``,
``blip_retrieval.py``, ``blip_image_text_matching.py``, ``blip_nlvr.py``
(+ ``nlvr_encoder.py``), ``blip_classification.py``,
``blip_feature_extractor.py``, ``blip_pretrain.py``.

Composition: plain ViT (models/vit.py) + MED BERT (models/med.py).  The
reference's momentum encoders / shared negative queues
(MomentumDistilationMixin, SharedQueueMixin) are training-infra for
from-scratch pretraining; here ITC uses in-batch negatives (the
distill=False paths the reference also implements), which keeps every
loss a pure jitted function.  Generation is greedy/beam over the causal
MED decoder without KV-cache (the decoder re-encodes per step under
`lax.while_loop`; sequences are ≤40 tokens in the reference's caption
configs, so the O(L²) replay is negligible next to the ViT encode).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.models.layers import SparseLinear
from vlm_compression_tpu.models.med import MedBert, MedConfig, lm_loss
from vlm_compression_tpu.models.vit import ViT, ViTConfig


@dataclasses.dataclass(frozen=True)
class Blip1Config:
    vit: ViTConfig = dataclasses.field(default_factory=ViTConfig)
    med: MedConfig = dataclasses.field(default_factory=MedConfig)
    embed_dim: int = 256               # ITC projection dim
    num_classes: int = 2               # classification / NLVR head
    prompt_length: int = 4             # caption prompt prefix ("a picture of")
    max_txt_len: int = 40
    alpha: float = 0.4                 # distill mixing (kept for config parity)

    @staticmethod
    def base(**kw) -> "Blip1Config":
        d = dict(vit=ViTConfig.base(),
                 med=MedConfig(encoder_width=768))
        d.update(kw)
        return Blip1Config(**d)

    @staticmethod
    def large(**kw) -> "Blip1Config":
        d = dict(vit=ViTConfig.large(),
                 med=MedConfig(encoder_width=1024))
        d.update(kw)
        return Blip1Config(**d)

    @staticmethod
    def tiny(**kw) -> "Blip1Config":
        d = dict(vit=ViTConfig.tiny(), med=MedConfig.tiny(),
                 embed_dim=8, max_txt_len=8, prompt_length=1)
        d.update(kw)
        return Blip1Config(**d)


def _itc_loss(image_feat, text_feat, temp):
    """In-batch contrastive (blip_retrieval.py:116+ with distill=False)."""
    sim_i2t = image_feat @ text_feat.T / temp
    sim_t2i = text_feat @ image_feat.T / temp
    n = sim_i2t.shape[0]
    labels = jnp.arange(n)
    ce = lambda s: jnp.mean(
        -jnp.take_along_axis(jax.nn.log_softmax(s, axis=-1),
                             labels[:, None], axis=-1))
    return 0.5 * (ce(sim_i2t) + ce(sim_t2i)), sim_i2t, sim_t2i


class Blip1Base(nn.Module):
    """Shared trunk: ViT + MED + ITC projections + ITM head."""

    cfg: Blip1Config

    def setup(self):
        cfg = self.cfg
        self.visual_encoder = ViT(cfg.vit, name="visual_encoder")
        self.text_encoder = MedBert(cfg.med, name="text_encoder")
        self.vision_proj = SparseLinear(cfg.embed_dim, name="vision_proj")
        self.text_proj = SparseLinear(cfg.embed_dim, name="text_proj")
        self.itm_head = SparseLinear(2, param_dtype=jnp.float32,
                                     name="itm_head")
        self.temp = self.param("temp", nn.initializers.constant(0.07), ())

    # -- encoders ---------------------------------------------------------

    def encode_image(self, image, mode="masked"):
        return self.visual_encoder(image, mode=mode)

    def unimodal_text(self, ids, mask, mode="masked"):
        """Text-only pass (no cross-attention: encoder states withheld)."""
        return self.text_encoder(ids, mask, None, mode=mode)

    def fusion(self, ids, mask, image_embeds, mode="masked"):
        img_mask = jnp.ones(image_embeds.shape[:2], jnp.int32)
        return self.text_encoder(ids, mask, image_embeds, img_mask,
                                 mode=mode)

    def itc_feats(self, image, ids, mask, mode="masked"):
        img = self.encode_image(image, mode=mode)
        txt = self.unimodal_text(ids, mask, mode=mode)
        fi = self.vision_proj(img[:, 0].astype(jnp.float32), mode=mode)
        ft = self.text_proj(txt[:, 0].astype(jnp.float32), mode=mode)
        fi = fi / jnp.linalg.norm(fi, axis=-1, keepdims=True)
        ft = ft / jnp.linalg.norm(ft, axis=-1, keepdims=True)
        return fi, ft, img

    def itm_logits(self, ids, mask, image_embeds, mode="masked"):
        fused = self.fusion(ids, mask, image_embeds, mode=mode)
        return self.itm_head(fused[:, 0].astype(jnp.float32), mode=mode)


@registry.register_model("blip_feature_extractor")
class BlipFeatureExtractor(Blip1Base):
    """extract_features(samples, mode=image|text|multimodal)
    (blip_feature_extractor.py:21+)."""

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
        fused = self.fusion(input_ids, attention_mask, img, mode=mode)
        return {"multimodal_embeds": fused}


@registry.register_model("blip_caption")
class BlipCaption(Blip1Base):
    """Captioning: ViT + causal MED decoder with prompt prefix
    (blip_caption.py:53-135; loss ignores the prompt tokens)."""

    def __call__(self, image, input_ids, attention_mask=None, labels=None,
                 mode: str = "masked"):
        img = self.encode_image(image, mode=mode)
        img_mask = jnp.ones(img.shape[:2], jnp.int32)
        hidden = self.text_encoder(input_ids, attention_mask, img, img_mask,
                                   causal=True, mode=mode)
        logits = self.text_encoder.lm_logits(hidden, mode=mode)
        out = {"logits": logits}
        if labels is not None:
            # prompt positions are masked out of the loss (:84-88)
            lm_mask = jnp.concatenate(
                [jnp.zeros((labels.shape[0], self.cfg.prompt_length),
                           jnp.int32),
                 (labels[:, self.cfg.prompt_length:] >= 0).astype(jnp.int32)],
                axis=1)
            out["loss"] = lm_loss(logits, labels, lm_mask)
        return out

    def decode_step(self, image_embeds, seq_ids, seq_mask, mode="masked"):
        img_mask = jnp.ones(image_embeds.shape[:2], jnp.int32)
        hidden = self.text_encoder(seq_ids, seq_mask, image_embeds, img_mask,
                                   causal=True, mode=mode)
        return self.text_encoder.lm_logits(hidden, mode=mode)


@registry.register_model("blip_vqa")
class BlipVQA(Blip1Base):
    """VQA: question fused with image, answer generated by a second causal
    pass over the SAME med weights seeded with the fused question states
    (blip_vqa.py:54-161 uses separate text_encoder/text_decoder; sharing
    the trunk keeps the param budget single — the decoder role is the
    ``causal=True`` + cross-attention-to-question configuration)."""

    def question_states(self, image, q_ids, q_mask, mode="masked"):
        img = self.encode_image(image, mode=mode)
        return self.fusion(q_ids, q_mask, img, mode=mode)

    def __call__(self, image, input_ids, attention_mask=None, labels=None,
                 answer_ids=None, answer_mask=None, mode: str = "masked"):
        q_states = self.question_states(image, input_ids, attention_mask,
                                        mode=mode)
        a_ids = answer_ids if answer_ids is not None else labels
        a_mask = answer_mask
        hidden = self.text_encoder(
            a_ids, a_mask, q_states,
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
        """predict_answers(answer_list=...) scoring: sum log-prob of each
        candidate answer given the fused question (blip_vqa.py:162-231)."""
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
        tgt = ids[:, 1:]
        tok = jnp.take_along_axis(logp, tgt[..., None], -1)[..., 0]
        score = jnp.sum(tok * msk[:, 1:], axis=1)
        return score.reshape(b, k)


@registry.register_model("blip_retrieval")
class BlipRetrieval(Blip1Base):
    """ITC + hard-negative ITM (blip_retrieval.py:116-229, distill=False
    in-batch form)."""

    def __call__(self, image, input_ids, attention_mask=None,
                 mode: str = "masked"):
        fi, ft, img = self.itc_feats(image, input_ids, attention_mask,
                                     mode=mode)
        temp = jnp.clip(self.temp, 1e-3, 0.5)
        loss_itc, sim_i2t, _ = _itc_loss(fi, ft, temp)
        n = fi.shape[0]
        neg = jnp.argmax(sim_i2t - 1e9 * jnp.eye(n), axis=1)
        pos = self.itm_logits(input_ids, attention_mask, img, mode=mode)
        neg_t = self.itm_logits(input_ids[neg], attention_mask[neg], img,
                                mode=mode)
        neg_i = self.itm_logits(input_ids, attention_mask, img[neg],
                                mode=mode)
        logits = jnp.concatenate([pos, neg_t, neg_i], axis=0)
        labels = jnp.concatenate(
            [jnp.ones(n, jnp.int32), jnp.zeros(2 * n, jnp.int32)])
        lp = jax.nn.log_softmax(logits, axis=-1)
        loss_itm = -jnp.mean(
            jnp.take_along_axis(lp, labels[:, None], axis=-1))
        return {"loss": loss_itc + loss_itm, "loss_itc": loss_itc,
                "loss_itm": loss_itm}


@registry.register_model("blip_image_text_matching")
class BlipITM(Blip1Base):
    """forward(match_head=itm|itc) (blip_image_text_matching.py:58-106)."""

    def __call__(self, image, input_ids, attention_mask=None,
                 match_head: str = "itm", mode: str = "masked"):
        if match_head == "all":  # init-time: materialize both heads
            return {"itm": self(image, input_ids, attention_mask, "itm",
                                mode),
                    "itc": self(image, input_ids, attention_mask, "itc",
                                mode)}
        if match_head == "itc":
            fi, ft, _ = self.itc_feats(image, input_ids, attention_mask,
                                       mode=mode)
            return jnp.sum(fi * ft, axis=-1) / jnp.clip(self.temp, 1e-3, 0.5)
        img = self.encode_image(image, mode=mode)
        return self.itm_logits(input_ids, attention_mask, img, mode=mode)


@registry.register_model("blip_nlvr")
class BlipNLVR(Blip1Base):
    """NLVR2: both images encoded, text fused with their concatenation
    (nlvr_encoder.py routes cross-attention to two encoders; concatenating
    the two feature sequences is the single-encoder equivalent), 2-way
    head on CLS (blip_nlvr.py:56-127)."""

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
        fused = self.fusion(input_ids, attention_mask, both, mode=mode)
        logits = self.cls_head(fused[:, 0].astype(jnp.float32), mode=mode)
        out = {"logits": logits, "predictions": jnp.argmax(logits, -1)}
        if labels is not None:
            lp = jax.nn.log_softmax(logits, axis=-1)
            out["loss"] = -jnp.mean(
                jnp.take_along_axis(lp, labels[:, None], axis=-1))
        return out


@registry.register_model("blip_classification")
class BlipClassification(Blip1Base):
    """Fused CLS → N-way head (blip_classification.py:77-141,
    distill=False form).  ``predict`` returns logits without loss."""

    def setup(self):
        super().setup()
        self.cls_head = SparseLinear(self.cfg.num_classes,
                                     param_dtype=jnp.float32,
                                     name="cls_head")

    def __call__(self, image, input_ids, attention_mask=None, labels=None,
                 mode: str = "masked"):
        img = self.encode_image(image, mode=mode)
        fused = self.fusion(input_ids, attention_mask, img, mode=mode)
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


@registry.register_model("blip_pretrain")
class BlipPretrain(Blip1Base):
    """Stage-0 pretraining objective: ITC + ITM + captioning LM
    (blip_pretrain.py:114-270, in-batch negative form)."""

    def __call__(self, image, input_ids, attention_mask=None, labels=None,
                 mode: str = "masked"):
        fi, ft, img = self.itc_feats(image, input_ids, attention_mask,
                                     mode=mode)
        temp = jnp.clip(self.temp, 1e-3, 0.5)
        loss_itc, sim_i2t, _ = _itc_loss(fi, ft, temp)
        n = fi.shape[0]
        neg = jnp.argmax(sim_i2t - 1e9 * jnp.eye(n), axis=1)
        pos = self.itm_logits(input_ids, attention_mask, img, mode=mode)
        neg_i = self.itm_logits(input_ids, attention_mask, img[neg],
                                mode=mode)
        logits = jnp.concatenate([pos, neg_i], axis=0)
        itm_labels = jnp.concatenate(
            [jnp.ones(n, jnp.int32), jnp.zeros(n, jnp.int32)])
        lp = jax.nn.log_softmax(logits, axis=-1)
        loss_itm = -jnp.mean(
            jnp.take_along_axis(lp, itm_labels[:, None], axis=-1))
        img_mask = jnp.ones(img.shape[:2], jnp.int32)
        hidden = self.text_encoder(input_ids, attention_mask, img, img_mask,
                                   causal=True, mode=mode)
        lm_logits = self.text_encoder.lm_logits(hidden, mode=mode)
        tgt = labels if labels is not None else input_ids
        loss_lm = lm_loss(lm_logits, tgt, (tgt >= 0).astype(jnp.int32))
        return {"loss": loss_itc + loss_itm + loss_lm,
                "loss_itc": loss_itc, "loss_itm": loss_itm,
                "loss_lm": loss_lm}
