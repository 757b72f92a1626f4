"""Stage-1 BLIP-2 Q-Former: ITC + ITM + LM pretraining heads.

Counterpart of ``lavis/models/blip2_models/blip2_qformer.py`` (519 LoC):
the image-text contrastive head (query-token max-sim, learned temperature),
the image-text matching head over hard negatives mined from the ITC
similarities, and the caption LM over [queries ⊕ causal text].  This model
also powers the retrieval evaluation (``ret_flickr`` /
``compute_sim_matrix``, runner_base.py:1000-1120).

TPU notes: negatives are in-batch (the reference all_gathers across GPUs;
under pjit the same effect is one ``all_gather`` over the data axis — left
to the runner's mesh context).  Hard-negative selection is the argmax of
masked similarities (the reference samples from the softmax; deterministic
argmax keeps the step jittable without threading RNG, and is the standard
hard-negative variant)."""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.models.eva_vit import EvaViT, EvaViTConfig
from vlm_compression_tpu.models.layers import SparseLinear
from vlm_compression_tpu.models.qformer import QFormer, QFormerConfig
from vlm_compression_tpu.models.t5 import cross_entropy_loss


@dataclasses.dataclass(frozen=True)
class Blip2QformerConfig:
    vit: EvaViTConfig = dataclasses.field(default_factory=EvaViTConfig)
    qformer: QFormerConfig = dataclasses.field(default_factory=QFormerConfig)
    embed_dim: int = 256
    max_txt_len: int = 32

    @staticmethod
    def tiny(**kw) -> "Blip2QformerConfig":
        d = dict(vit=EvaViTConfig.tiny(), qformer=QFormerConfig.tiny(),
                 embed_dim=8)
        d.update(kw)
        return Blip2QformerConfig(**d)


@registry.register_model("blip2")
@registry.register_model("blip2_feature_extractor")
class Blip2Qformer(nn.Module):
    cfg: Blip2QformerConfig

    def setup(self):
        cfg = self.cfg
        self.visual_encoder = EvaViT(cfg.vit, name="visual_encoder")
        self.ln_vision = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                      name="ln_vision")
        self.qformer = QFormer(cfg.qformer, name="qformer")
        self.vision_proj = SparseLinear(cfg.embed_dim,
                                        param_dtype=jnp.float32,
                                        name="vision_proj")
        self.text_proj = SparseLinear(cfg.embed_dim, param_dtype=jnp.float32,
                                      name="text_proj")
        self.itm_head = SparseLinear(2, param_dtype=jnp.float32,
                                     name="itm_head")
        self.lm_head = SparseLinear(cfg.qformer.vocab_size,
                                    param_dtype=jnp.float32, name="lm_head")
        self.temp = self.param("temp",
                               lambda key: jnp.asarray(0.07, jnp.float32))

    # -- feature branches ----------------------------------------------
    def image_embeds(self, image, vit_mode="masked"):
        feats = self.visual_encoder(image, mode=vit_mode)
        return self.ln_vision(feats.astype(jnp.float32))

    def forward_image(self, image, vit_mode="masked", qformer_mode="masked"):
        """(query hidden (b, nq, h), unit-norm ITC feats (b, nq, e))."""
        embeds = self.image_embeds(image, vit_mode)
        q = self.qformer(embeds, mode=qformer_mode)
        q = q[:, : self.cfg.qformer.num_query_tokens]
        feats = self.vision_proj(q.astype(jnp.float32), mode="dense")
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        return q, feats

    def forward_text(self, text_ids, text_mask=None, qformer_mode="masked"):
        h = self.qformer.forward_text(text_ids, text_mask,
                                      mode=qformer_mode)
        feat = self.text_proj(h[:, 0].astype(jnp.float32), mode="dense")
        return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

    def itm_logits(self, image_embeds, text_ids, text_mask,
                   qformer_mode="masked"):
        """2-way match logits, mean over query positions (reference ITM)."""
        out = self.qformer.forward_multimodal(
            image_embeds, text_ids, text_mask, mode=qformer_mode)
        q = out[:, : self.cfg.qformer.num_query_tokens]
        return jnp.mean(self.itm_head(q.astype(jnp.float32), mode="dense"),
                        axis=1)

    def extract_features(self, samples, mode="multimodal",
                         vit_mode="masked", qformer_mode="masked"):
        """Unimodal/multimodal feature extraction — the
        ``blip2_feature_extractor`` user API (reference
        blip2_qformer.py:371-470, BlipOutputFeatures fields as a dict):
        mode="image" → query hidden states + unit-norm ITC projection;
        "text" → text hidden states + unit-norm CLS projection;
        "multimodal" → query positions of the image-grounded text
        forward."""
        assert mode in ("image", "text", "multimodal"), mode
        out = {"image_embeds": None, "image_embeds_proj": None,
               "text_embeds": None, "text_embeds_proj": None,
               "multimodal_embeds": None}
        if mode == "image":
            q, feats = self.forward_image(samples["image"], vit_mode,
                                          qformer_mode)
            out["image_embeds"], out["image_embeds_proj"] = q, feats
        elif mode == "text":
            h = self.qformer.forward_text(samples["text_ids"],
                                          samples.get("text_mask"),
                                          mode=qformer_mode)
            feat = self.text_proj(h[:, 0].astype(jnp.float32), mode="dense")
            out["text_embeds"] = h
            out["text_embeds_proj"] = feat / jnp.linalg.norm(
                feat, axis=-1, keepdims=True)
        else:
            embeds = self.image_embeds(samples["image"], vit_mode)
            mm = self.qformer.forward_multimodal(
                embeds, samples["text_ids"], samples.get("text_mask"),
                mode=qformer_mode)
            out["multimodal_embeds"] = mm[:, : self.cfg.qformer
                                          .num_query_tokens]
        return out

    # -- stage-1 objective ---------------------------------------------
    def __call__(self, image, text_ids, text_mask,
                 vit_mode="masked", qformer_mode="masked"):
        cfg = self.cfg
        b = image.shape[0]
        embeds = self.image_embeds(image, vit_mode)
        q = self.qformer(embeds, mode=qformer_mode)
        q = q[:, : cfg.qformer.num_query_tokens]
        img_feat = self.vision_proj(q.astype(jnp.float32), mode="dense")
        img_feat = img_feat / jnp.linalg.norm(img_feat, axis=-1,
                                              keepdims=True)
        txt_feat = self.forward_text(text_ids, text_mask, qformer_mode)

        # ITC: max over query tokens (blip2_qformer sim_q2t → max)
        sim_q2t = jnp.einsum("bqe,ce->bcq", img_feat, txt_feat)
        sim_i2t = jnp.max(sim_q2t, axis=-1) / self.temp          # (b, c)
        sim_t2i = sim_i2t.T
        targets = jnp.arange(b)
        loss_itc = 0.5 * (
            cross_entropy_loss(sim_i2t[:, None], targets[:, None])
            + cross_entropy_loss(sim_t2i[:, None], targets[:, None]))

        # ITM with mined hard negatives
        neg_mask = ~jnp.eye(b, dtype=bool)
        sims = jnp.where(neg_mask, sim_i2t, -jnp.inf)
        hard_txt = jnp.argmax(sims, axis=1)        # hardest text per image
        hard_img = jnp.argmax(jnp.where(neg_mask, sim_t2i, -jnp.inf), axis=1)
        pos = self.itm_logits(embeds, text_ids, text_mask, qformer_mode)
        neg_t = self.itm_logits(embeds, text_ids[hard_txt],
                                text_mask[hard_txt], qformer_mode)
        neg_i = self.itm_logits(embeds[hard_img], text_ids, text_mask,
                                qformer_mode)
        itm_logits = jnp.concatenate([pos, neg_t, neg_i], axis=0)
        itm_labels = jnp.concatenate(
            [jnp.ones(b, jnp.int32), jnp.zeros(2 * b, jnp.int32)])
        loss_itm = cross_entropy_loss(itm_logits[:, None],
                                      itm_labels[:, None])

        # LM: queries as visual prefix, causal text (decoder [DEC] start)
        lm_out = self.qformer.forward_multimodal(
            embeds, text_ids, text_mask, causal_text=True,
            mode=qformer_mode)
        text_h = lm_out[:, cfg.qformer.num_query_tokens:]
        logits = self.lm_head(text_h.astype(jnp.float32), mode="dense")
        labels = jnp.where(text_mask.astype(bool), text_ids, -100)
        loss_lm = cross_entropy_loss(logits[:, :-1], labels[:, 1:])

        loss = loss_itc + loss_itm + loss_lm
        return {"loss": loss, "loss_itc": loss_itc, "loss_itm": loss_itm,
                "loss_lm": loss_lm}


def compute_sim_matrix(model: Blip2Qformer, variables, image_batches,
                       text_ids, text_mask, k_test: int = 0,
                       vit_mode="masked", qformer_mode="masked",
                       text_batch: int = 256):
    """(score_i2t, score_t2i) for retrieval eval
    (reference runner_base.py:1000-1120 + Blip2Qformer.compute_sim_matrix).

    ITC similarity (query max-sim) ranks all pairs; when ``k_test`` > 0 the
    top-k candidates are re-scored with the ITM head (the reference's
    k_test rerank) — i2t and t2i reranked independently."""
    import numpy as np

    img_feats, img_embeds = [], []
    for batch in image_batches:
        q, f = model.apply(variables, batch, vit_mode, qformer_mode,
                           method=Blip2Qformer.forward_image)
        img_feats.append(np.asarray(f, np.float32))
        if k_test:
            img_embeds.append(np.asarray(
                model.apply(variables, batch, vit_mode,
                            method=Blip2Qformer.image_embeds), np.float32))
    img_feats = np.concatenate(img_feats)                  # (ni, nq, e)

    txt_feats = []
    for s in range(0, text_ids.shape[0], text_batch):
        f = model.apply(variables, text_ids[s: s + text_batch],
                        text_mask[s: s + text_batch], qformer_mode,
                        method=Blip2Qformer.forward_text)
        txt_feats.append(np.asarray(f, np.float32))
    txt_feats = np.concatenate(txt_feats)                  # (nt, e)

    sim = np.einsum("iqe,te->itq", img_feats, txt_feats).max(-1)
    score_i2t = sim.copy()
    score_t2i = sim.T.copy()

    if k_test:
        img_embeds = np.concatenate(img_embeds)
        for i in range(sim.shape[0]):
            topk = np.argsort(-sim[i])[:k_test]
            logits = model.apply(
                variables, jnp.asarray(img_embeds[i][None].repeat(
                    len(topk), 0)), text_ids[topk], text_mask[topk],
                qformer_mode, method=Blip2Qformer.itm_logits)
            itm = np.asarray(logits, np.float32)
            score_i2t[i, topk] = sim[i, topk] + (itm[:, 1] - itm[:, 0])
        for t in range(sim.shape[1]):
            topk = np.argsort(-sim[:, t])[:k_test]
            logits = model.apply(
                variables, jnp.asarray(img_embeds[topk]),
                jnp.asarray(np.repeat(text_ids[t][None], len(topk), 0)),
                jnp.asarray(np.repeat(text_mask[t][None], len(topk), 0)),
                qformer_mode, method=Blip2Qformer.itm_logits)
            itm = np.asarray(logits, np.float32)
            score_t2i[t, topk] = sim[topk, t] + (itm[:, 1] - itm[:, 0])
    return score_i2t, score_t2i
