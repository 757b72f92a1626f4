"""Plain text-only T5 model + BLIP-2 image-text matching (legacy names).

``t5``: counterpart of ``lavis/models/t5_models/t5.py`` — a bare
T5ForConditionalGeneration behind the registry, forward(samples) → loss
over (input_ids, labels), used for C4 language-modeling evaluation of a
pruned language tower in isolation.

``blip2_image_text_matching``: counterpart of
``lavis/models/blip2_models/blip2_image_text_matching.py`` — Blip2Qformer
with a ``match_head`` forward ("itm" → 2-way fused logits, "itc" →
cosine similarity of unimodal features).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.models.blip2_qformer import (
    Blip2Qformer,
    Blip2QformerConfig,
)
from vlm_compression_tpu.models.t5 import T5Config, T5ForConditionalGeneration


@dataclasses.dataclass(frozen=True)
class PlainT5Config:
    t5: T5Config = dataclasses.field(default_factory=T5Config)

    @staticmethod
    def flan_t5_xl(**kw) -> "PlainT5Config":
        return PlainT5Config(t5=T5Config.flan_t5_xl(), **kw)

    @staticmethod
    def tiny(**kw) -> "PlainT5Config":
        return PlainT5Config(t5=T5Config.tiny(), **kw)


@registry.register_model("t5")
class PlainT5(nn.Module):
    cfg: PlainT5Config

    def setup(self):
        self.t5_model = T5ForConditionalGeneration(self.cfg.t5,
                                                   name="t5_model")

    def __call__(self, input_ids, attention_mask=None, labels=None,
                 mode: str = "masked"):
        out = self.t5_model(input_ids=input_ids,
                            attention_mask=attention_mask, labels=labels,
                            mode=mode)
        return out


@registry.register_model("blip2_image_text_matching")
class Blip2ITM(Blip2Qformer):
    """forward(..., match_head=itm|itc)
    (blip2_image_text_matching.py:53-105)."""

    def __call__(self, image, input_ids, attention_mask=None,
                 match_head: str = "itm", mode: str = "masked",
                 qformer_mode: str = None, **_):
        qmode = qformer_mode or mode
        if match_head == "all":  # init-time: materialize both heads
            return {"itm": self(image, input_ids, attention_mask, "itm",
                                mode, qformer_mode),
                    "itc": self(image, input_ids, attention_mask, "itc",
                                mode, qformer_mode)}
        if match_head == "itm":
            embeds = self.image_embeds(image, vit_mode=mode)
            return self.itm_logits(embeds, input_ids, attention_mask, qmode)
        _, fi = self.forward_image(image, vit_mode=mode, qformer_mode=qmode)
        ft = self.forward_text(input_ids, attention_mask, qformer_mode=qmode)
        # max over query tokens, the BLIP-2 ITC reduction
        return jnp.max(jnp.einsum("bqd,bd->bq", fi, ft), axis=-1)
