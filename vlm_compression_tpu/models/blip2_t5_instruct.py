"""InstructBLIP (FlanT5) — the flagship composition.

Re-design of ``lavis/models/blip2_models/blip2_t5_instruct.py:136-221``:
ViT → ln_vision → Q-Former(queries + instruction) → t5_proj → prepend to
T5 token embeds → T5 encoder/decoder → label CE.

The reference threads ``vit_dense`` / ``llm_dense`` flags for the
cross-modality-KD teacher; here each tower takes a static ``mode``:
``forward(..., vit_mode="dense", llm_mode="dense")`` is the teacher.
Tokenization happens in the data layer; the model consumes ids/masks.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.models.eva_vit import EvaViT, EvaViTConfig
from vlm_compression_tpu.models.layers import SparseLinear
from vlm_compression_tpu.models.qformer import QFormer, QFormerConfig
from vlm_compression_tpu.models.t5 import (
    T5Config,
    T5ForConditionalGeneration,
    cross_entropy_loss,
    shift_right,
)


@dataclasses.dataclass(frozen=True)
class Blip2T5InstructConfig:
    vit: EvaViTConfig = dataclasses.field(default_factory=EvaViTConfig)
    qformer: QFormerConfig = dataclasses.field(default_factory=QFormerConfig)
    t5: T5Config = dataclasses.field(default_factory=T5Config)
    max_txt_len: int = 128            # blip2_t5_instruct.py:52
    max_output_txt_len: int = 256     # blip2_t5_instruct.py:53

    @staticmethod
    def flan_t5_xl(**kw) -> "Blip2T5InstructConfig":
        return Blip2T5InstructConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "Blip2T5InstructConfig":
        d = dict(
            vit=EvaViTConfig.tiny(),
            qformer=QFormerConfig.tiny(),
            t5=T5Config.tiny(d_model=16),
        )
        d.update(kw)
        return Blip2T5InstructConfig(**d)


@registry.register_model("blip2_t5")
@registry.register_model("blip2_t5_instruct")
class Blip2T5Instruct(nn.Module):
    """Also registered as ``blip2_t5``: the non-instruct BLIP-2-T5
    (lavis blip2_t5.py) is this composition with no Q-Former text input —
    pass ``qformer_input_ids=None``."""
    cfg: Blip2T5InstructConfig

    def setup(self):
        cfg = self.cfg
        self.visual_encoder = EvaViT(cfg.vit, name="visual_encoder")
        self.ln_vision = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                      name="ln_vision")
        self.qformer = QFormer(cfg.qformer, name="qformer")
        self.t5_proj = SparseLinear(cfg.t5.d_model, param_dtype=jnp.float32,
                                    name="t5_proj")
        self.t5_model = T5ForConditionalGeneration(cfg.t5, name="t5_model")

    def encode_image(self, image, vit_mode="masked",
                     qformer_input_ids=None, qformer_attention_mask=None,
                     qformer_mode="masked"):
        """Image (+instruction) → T5-space prefix embeddings (b, 32, d_model).

        Video: a 5-dim ``(b, t, h, w, c)`` stack encodes every frame and
        concatenates the per-frame query outputs along the sequence dim
        → ``(b, t·32, d_model)``.  The reference loops frames in Python
        (blip2_t5_instruct.py:347-377); here the frame axis folds into
        the batch so ViT+Q-Former run once, batched — same math, one XLA
        program, MXU-friendly."""
        if image.ndim == 5:
            b, t = image.shape[:2]
            image = image.reshape((b * t,) + image.shape[2:])
            if qformer_input_ids is not None:
                qformer_input_ids = jnp.repeat(qformer_input_ids, t, axis=0)
                if qformer_attention_mask is not None:
                    qformer_attention_mask = jnp.repeat(
                        qformer_attention_mask, t, axis=0)
            feats = self.visual_encoder(image, mode=vit_mode)
            proj = self.encode_image_from_features(
                feats, qformer_input_ids, qformer_attention_mask,
                qformer_mode)
            return proj.reshape(b, t * proj.shape[1], proj.shape[2])
        feats = self.visual_encoder(image, mode=vit_mode)
        return self.encode_image_from_features(
            feats, qformer_input_ids, qformer_attention_mask, qformer_mode)

    def encode_image_from_features(self, feats, qformer_input_ids=None,
                                   qformer_attention_mask=None,
                                   qformer_mode="masked"):
        """Post-ViT half of encode_image: lets the calibration engine feed
        a pruned tower's replayed activations to the next tower's stem
        without re-running the ViT (and without the giant fused
        ViT+Q-Former stem executable)."""
        cfg = self.cfg
        feats = self.ln_vision(feats.astype(jnp.float32))
        q_out = self.qformer(feats, qformer_input_ids, qformer_attention_mask,
                             mode=qformer_mode)
        q_out = q_out[:, : cfg.qformer.num_query_tokens]
        proj = self.t5_proj(q_out.astype(jnp.float32), mode="dense")
        return proj.astype(jnp.dtype(cfg.t5.dtype))

    def __call__(self, image, input_ids, attention_mask, labels,
                 qformer_input_ids=None, qformer_attention_mask=None,
                 vit_mode: str = "masked", llm_mode: str = "masked",
                 qformer_mode: str = "masked"):
        cfg = self.cfg
        prefix = self.encode_image(image, vit_mode, qformer_input_ids,
                                   qformer_attention_mask, qformer_mode)
        b, nq, _ = prefix.shape

        text_embeds = self.t5_model.embed_tokens(input_ids)
        inputs_embeds = jnp.concatenate([prefix, text_embeds], axis=1)
        enc_mask = jnp.concatenate(
            [jnp.ones((b, nq), attention_mask.dtype), attention_mask], axis=1)

        dec_input_ids = shift_right(labels, cfg.t5.decoder_start_token_id,
                                    cfg.t5.pad_token_id)
        dec_mask = (labels != -100).astype(enc_mask.dtype)

        enc = self.t5_model.encode(inputs_embeds=inputs_embeds,
                                   attention_mask=enc_mask, mode=llm_mode)
        logits = self.t5_model.decode(dec_input_ids, enc, dec_mask, enc_mask,
                                      mode=llm_mode)
        loss = cross_entropy_loss(logits, labels)
        return {"loss": loss, "logits": logits}

    def encode_multimodal(self, image, input_ids, attention_mask,
                          qformer_input_ids=None,
                          qformer_attention_mask=None,
                          vit_mode="masked", llm_mode="masked",
                          qformer_mode="masked"):
        """(enc_out, enc_mask): the T5 encoder over [image prefix ⊕ prompt]
        — the shared front half of forward/generate
        (reference blip2_t5_instruct.py:299-432)."""
        prefix = self.encode_image(image, vit_mode, qformer_input_ids,
                                   qformer_attention_mask, qformer_mode)
        b, nq, _ = prefix.shape
        text_embeds = self.t5_model.embed_tokens(input_ids)
        inputs_embeds = jnp.concatenate([prefix, text_embeds], axis=1)
        enc_mask = jnp.concatenate(
            [jnp.ones((b, nq), attention_mask.dtype), attention_mask], axis=1)
        enc = self.t5_model.encode(inputs_embeds=inputs_embeds,
                                   attention_mask=enc_mask, mode=llm_mode)
        return enc, enc_mask


def predict_class_t5(model: "Blip2T5Instruct", variables, image, input_ids,
                     attention_mask, candidate_labels,
                     qformer_input_ids=None, qformer_attention_mask=None,
                     vit_mode="masked", llm_mode="masked",
                     qformer_mode="masked"):
    """Candidate ranking (reference blip2_t5_instruct.predict_class
    :482+): per-candidate summed CE of the decoder over each answer
    option; returns (b, n_candidates) negative log-likelihoods (lower =
    better).  candidate_labels: (C, L) int32, -100 padded."""
    from vlm_compression_tpu.models.t5 import (
        T5ForConditionalGeneration,
        shift_right,
    )

    cfg = model.cfg
    enc, enc_mask = model.apply(
        variables, image, input_ids, attention_mask,
        qformer_input_ids, qformer_attention_mask,
        vit_mode, llm_mode, qformer_mode,
        method=Blip2T5Instruct.encode_multimodal)
    b = enc.shape[0]
    C, L = candidate_labels.shape
    enc_rep = jnp.repeat(enc, C, axis=0)
    mask_rep = jnp.repeat(enc_mask, C, axis=0)
    labels = jnp.tile(candidate_labels, (b, 1))
    dec_ids = shift_right(labels, cfg.t5.decoder_start_token_id,
                          cfg.t5.pad_token_id)
    t5 = T5ForConditionalGeneration(cfg.t5)
    t5_vars = {coll: tree["t5_model"] for coll, tree in variables.items()
               if isinstance(tree, dict) and "t5_model" in tree}
    logits = t5.apply(t5_vars, dec_ids, enc_rep, None, mask_rep,
                      mode=llm_mode, method=t5.decode)
    import jax

    logp = jax.nn.log_softmax(logits, axis=-1)
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    ll = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    nll = -(ll * valid).sum(-1)                    # (b*C,) summed CE
    return nll.reshape(b, C)


def generate_t5(model: "Blip2T5Instruct", variables, image, input_ids,
                attention_mask, qformer_input_ids=None,
                qformer_attention_mask=None, gen_cfg=None,
                vit_mode="masked", llm_mode="masked", qformer_mode="masked",
                rng=None, speculative_gamma: int = 0,
                draft_llm_mode: str = "masked"):
    """InstructBLIP-T5 generate: beam search / greedy / nucleus over the
    image-conditioned encoder output (reference :299-432 wraps HF
    ``t5_model.generate`` with num_beams=5 defaults).

    ``speculative_gamma > 0`` (greedy only): draft-and-verify decoding —
    the ``draft_llm_mode`` tower proposes γ tokens, the ``llm_mode``
    tower verifies in one chunked pass; output is token-identical to
    plain greedy under ``llm_mode``.  The natural serving pairing is
    llm_mode="dense" (teacher quality) with draft_llm_mode="masked"
    (compressed student speed); both share one multimodal encoder pass.
    """
    import jax.numpy as jnp  # noqa: F811

    from vlm_compression_tpu.models.generation import (
        GenerationConfig,
        _jit_entry,
        beam_search,
        greedy_generate,
        make_t5_step,
        speculative_generate,
    )

    cfg = model.cfg
    gen_cfg = gen_cfg or GenerationConfig(
        num_beams=5, max_length=30, min_length=1,
        decoder_start_token_id=cfg.t5.decoder_start_token_id,
        pad_token_id=cfg.t5.pad_token_id, eos_token_id=1)

    def make():
        def run(variables, image, input_ids, attention_mask,
                qformer_input_ids, qformer_attention_mask, rng):
            enc, enc_mask = model.apply(
                variables, image, input_ids, attention_mask,
                qformer_input_ids, qformer_attention_mask,
                vit_mode, llm_mode, qformer_mode,
                method=Blip2T5Instruct.encode_multimodal)
            b = enc.shape[0]
            from vlm_compression_tpu.models.t5 import (
                T5ForConditionalGeneration,
            )

            t5 = T5ForConditionalGeneration(cfg.t5)
            t5_vars = {coll: tree["t5_model"]
                       for coll, tree in variables.items()
                       if isinstance(tree, dict) and "t5_model" in tree}
            k = gen_cfg.num_beams
            if k > 1:
                enc_t = jnp.repeat(enc, k, axis=0)
                mask_t = jnp.repeat(enc_mask, k, axis=0)
                step, cache = make_t5_step(t5, t5_vars, enc_t, mask_t,
                                           llm_mode, gen_cfg.max_length)
                seqs, _ = beam_search(step, cache, b, gen_cfg)
                return seqs
            if speculative_gamma > 0:
                # greedy: token-identical to llm_mode greedy; do_sample:
                # exact samples from the llm_mode nucleus distribution
                max_len = gen_cfg.max_length + speculative_gamma + 1
                dstep, dcache = make_t5_step(t5, t5_vars, enc, enc_mask,
                                             draft_llm_mode, max_len)
                tstep, tcache = make_t5_step(t5, t5_vars, enc, enc_mask,
                                             llm_mode, max_len)
                seqs, _, _ = speculative_generate(
                    dstep, dcache, tstep, tcache, b, gen_cfg,
                    gamma=speculative_gamma, rng=rng)
                return seqs
            step, cache = make_t5_step(t5, t5_vars, enc, enc_mask,
                                       llm_mode, gen_cfg.max_length)
            seqs, _ = greedy_generate(step, cache, b, gen_cfg, rng)
            return seqs

        return run

    fn = _jit_entry(
        ("blip2_t5_generate", model, gen_cfg, vit_mode, llm_mode,
         qformer_mode, speculative_gamma, draft_llm_mode), make)
    return fn(variables, image, input_ids, attention_mask,
              qformer_input_ids, qformer_attention_mask, rng)
