"""BLIP-2 OPT — the non-instruct decoder-only composition.

Counterpart of ``lavis/models/blip2_models/blip2_opt.py`` (815 LoC):
ViT → ln_vision → Q-Former (queries only, no instruction text) →
opt_proj → prepend to OPT token embeddings.  Prompt tokens are part of
``text_input_ids`` (the reference prepends "a photo of"-style prompts);
labels mask query+prompt positions with -100.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.models.eva_vit import EvaViT, EvaViTConfig
from vlm_compression_tpu.models.layers import SparseLinear
from vlm_compression_tpu.models.opt import OPTConfig, OPTForCausalLM
from vlm_compression_tpu.models.qformer import QFormer, QFormerConfig
from vlm_compression_tpu.models.t5 import cross_entropy_loss


@dataclasses.dataclass(frozen=True)
class Blip2OPTConfig:
    vit: EvaViTConfig = dataclasses.field(default_factory=EvaViTConfig)
    qformer: QFormerConfig = dataclasses.field(default_factory=QFormerConfig)
    opt: OPTConfig = dataclasses.field(default_factory=OPTConfig)
    max_txt_len: int = 32

    @staticmethod
    def tiny(**kw) -> "Blip2OPTConfig":
        d = dict(vit=EvaViTConfig.tiny(), qformer=QFormerConfig.tiny(),
                 opt=OPTConfig.tiny())
        d.update(kw)
        return Blip2OPTConfig(**d)


@registry.register_model("blip2_opt")
class Blip2OPT(nn.Module):
    cfg: Blip2OPTConfig

    def setup(self):
        cfg = self.cfg
        self.visual_encoder = EvaViT(cfg.vit, name="visual_encoder")
        self.ln_vision = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                      name="ln_vision")
        self.qformer = QFormer(cfg.qformer, name="qformer")
        self.opt_proj = SparseLinear(cfg.opt.hidden_size,
                                     param_dtype=jnp.float32,
                                     name="opt_proj")
        self.opt_model = OPTForCausalLM(cfg.opt, name="opt_model")

    def encode_image(self, image, vit_mode="masked", qformer_mode="masked"):
        cfg = self.cfg
        feats = self.visual_encoder(image, mode=vit_mode)
        feats = self.ln_vision(feats.astype(jnp.float32))
        q = self.qformer(feats, mode=qformer_mode)
        q = q[:, : cfg.qformer.num_query_tokens]
        proj = self.opt_proj(q.astype(jnp.float32), mode="dense")
        return proj.astype(jnp.dtype(cfg.opt.dtype))

    def __call__(self, image, text_input_ids, text_attention_mask, labels,
                 vit_mode: str = "masked", llm_mode: str = "masked",
                 qformer_mode: str = "masked", **_ignored):
        prefix = self.encode_image(image, vit_mode, qformer_mode)
        b, nq, _ = prefix.shape
        text_embeds = self.opt_model.embed_tokens(text_input_ids)
        inputs_embeds = jnp.concatenate([prefix, text_embeds], axis=1)
        attn = jnp.concatenate(
            [jnp.ones((b, nq), text_attention_mask.dtype),
             text_attention_mask], axis=1)
        full_labels = jnp.concatenate(
            [jnp.full((b, nq), -100, labels.dtype), labels], axis=1)
        logits = self.opt_model(inputs_embeds=inputs_embeds,
                                attention_mask=attn, mode=llm_mode)
        loss = cross_entropy_loss(logits[:, :-1], full_labels[:, 1:])
        return {"loss": loss, "logits": logits}
