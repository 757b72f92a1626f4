"""PNP-VQA / Img2Prompt-VQA pipelines + UnifiedQAv2-FiD reader
(legacy LAVIS zoo).

Counterparts of ``lavis/models/pnp_vqa_models/`` (pnp_vqa.py,
pnp_unifiedqav2_fid.py) and ``lavis/models/img2prompt_models/``
(img2prompt_vqa.py).  Plug-and-play VQA composes three frozen models
(pnp_vqa.py:21-50):

  1. image-question matching (BlipITM) → per-patch GradCAM relevance
     (forward_itm, :54-83);
  2. captioner (BlipCaption) sampling top-k patches by relevance as the
     visual context (forward_cap, :84-130);
  3. a reader answering from the captions — UnifiedQAv2 with
     Fusion-in-Decoder: each caption is encoded with the question
     separately and the decoder cross-attends ALL encoder states
     concatenated (pnp_unifiedqav2_fid.py).

Img2Prompt-VQA replaces the reader with exemplar-prompt construction for
a frozen LLM (img2prompt_vqa.py): the same ITM+caption stages plus a
prompt builder; ``build_prompt`` here reproduces the caption→QA-exemplar
prompt layout.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.models.blip1 import Blip1Config, BlipCaption, BlipITM
from vlm_compression_tpu.models.t5 import T5Config, T5ForConditionalGeneration


@dataclasses.dataclass(frozen=True)
class PNPVQAConfig:
    blip: Blip1Config = dataclasses.field(default_factory=Blip1Config.base)
    t5: T5Config = dataclasses.field(default_factory=T5Config)
    num_patches: int = 20              # top-k patches kept for captioning
    num_captions: int = 50
    block_num: int = 7                 # cross-attn block for gradcam

    @staticmethod
    def base(**kw) -> "PNPVQAConfig":
        return PNPVQAConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "PNPVQAConfig":
        d = dict(blip=Blip1Config.tiny(), t5=T5Config.tiny(),
                 num_patches=2, num_captions=2, block_num=1)
        d.update(kw)
        return PNPVQAConfig(**d)


@registry.register_model("pnp_unifiedqav2_fid")
class UnifiedQAv2FiD(nn.Module):
    """T5 reader with Fusion-in-Decoder: (b, n_ctx, L) context ids are
    encoded independently, encoder states concatenated along length, one
    decoder pass attends them all (pnp_unifiedqav2_fid.py)."""

    cfg: T5Config

    def setup(self):
        self.t5 = T5ForConditionalGeneration(self.cfg, name="t5")

    def encode_contexts(self, ctx_ids, ctx_mask, mode="masked"):
        b, n_ctx, length = ctx_ids.shape
        flat_ids = ctx_ids.reshape(b * n_ctx, length)
        flat_mask = ctx_mask.reshape(b * n_ctx, length)
        enc = self.t5.encode(input_ids=flat_ids, attention_mask=flat_mask,
                             mode=mode)
        d = enc.shape[-1]
        return (enc.reshape(b, n_ctx * length, d),
                ctx_mask.reshape(b, n_ctx * length))

    def __call__(self, ctx_ids, ctx_mask, labels=None,
                 decoder_input_ids=None, mode: str = "masked"):
        enc, enc_mask = self.encode_contexts(ctx_ids, ctx_mask, mode=mode)
        if decoder_input_ids is None:
            # shift-right with pad(=0) start, T5 convention
            decoder_input_ids = jnp.pad(labels, ((0, 0), (1, 0)))[:, :-1]
            decoder_input_ids = jnp.maximum(decoder_input_ids, 0)
        logits = self.t5.decode(decoder_input_ids, enc, enc_mask=enc_mask,
                                mode=mode)
        out = {"logits": logits}
        if labels is not None:
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            msk = (labels >= 0).astype(jnp.float32)
            tgt = jnp.clip(labels, 0, logits.shape[-1] - 1)
            nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
            out["loss"] = jnp.sum(nll * msk) / jnp.maximum(jnp.sum(msk), 1.0)
        return out


@registry.register_model("pnp_vqa")
class PNPVQA(nn.Module):
    """Composite pipeline.  Stages are exposed as methods mirroring the
    reference's forward_itm / forward_cap / forward_qa; ``__call__`` runs
    ITM relevance + a captioning LM pass + the FiD reader loss so the
    whole pipeline is one jittable program for smoke/parity testing."""

    cfg: PNPVQAConfig

    def setup(self):
        self.image_question_matching_model = BlipITM(
            self.cfg.blip, name="itm")
        self.image_captioning_model = BlipCaption(self.cfg.blip, name="cap")
        self.question_answering_model = UnifiedQAv2FiD(
            self.cfg.t5, name="reader")

    def forward_itm(self, image, q_ids, q_mask, mode="masked"):
        """Patch relevance.  The reference differentiates cross-attention
        maps wrt the ITM score (GradCAM, blip_image_text_matching.py);
        the jit-friendly equivalent scores patches by the gradient of the
        ITM match logit wrt the image tokens × their activation."""
        itm = self.image_question_matching_model

        def score(img_tokens):
            logits = itm.itm_logits(q_ids, q_mask, img_tokens, mode=mode)
            return jnp.sum(logits[:, 1] - logits[:, 0])

        img = itm.encode_image(image, mode=mode)
        g = jax.grad(score)(img)
        rel = jnp.sum(jax.nn.relu(g * img), axis=-1)[:, 1:]  # drop CLS
        return rel, img

    def forward_cap(self, image_embeds, relevance, cap_ids, cap_mask=None,
                    mode="masked"):
        """Caption over the top-k most relevant patches (CLS kept)."""
        k = min(self.cfg.num_patches, relevance.shape[1])
        top = jax.lax.top_k(relevance, k)[1] + 1          # +1: skip CLS
        gather = jax.vmap(lambda e, i: e[i])
        patches = gather(image_embeds, top)
        ctx = jnp.concatenate([image_embeds[:, :1], patches], axis=1)
        return self.image_captioning_model.decode_step(
            ctx, cap_ids, cap_mask, mode=mode)

    def __call__(self, image, input_ids, attention_mask=None,
                 cap_ids=None, ctx_ids=None, ctx_mask=None, labels=None,
                 mode: str = "masked"):
        rel, img = self.forward_itm(image, input_ids, attention_mask,
                                    mode=mode)
        out = {"relevance": rel}
        if cap_ids is not None:
            out["caption_logits"] = self.forward_cap(img, rel, cap_ids,
                                                     mode=mode)
        if ctx_ids is not None:
            out.update(self.question_answering_model(
                ctx_ids, ctx_mask, labels=labels, mode=mode))
        return out


@registry.register_model("img2prompt_vqa")
class Img2PromptVQA(PNPVQA):
    """Img2Prompt: ITM + captions reused; the reader is replaced by a
    prompt for a frozen LLM (img2prompt_vqa.py).  ``build_prompt`` is the
    host-side exemplar-prompt constructor."""

    @staticmethod
    def build_prompt(captions: Sequence[str], question: str,
                     exemplars: Optional[Sequence[tuple]] = None) -> str:
        lines = ["Contexts: " + " ".join(captions)]
        for q, a in (exemplars or ()):
            lines.append(f"Question: {q} Answer: {a}")
        lines.append(f"Question: {question} Answer:")
        return "\n".join(lines)
