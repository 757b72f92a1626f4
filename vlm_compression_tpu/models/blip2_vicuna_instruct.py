"""InstructBLIP-Vicuna — decoder-only LLM composition.

Re-design of ``lavis/models/blip2_models/blip2_vicuna_instruct.py:158-255``:
ViT → ln_vision → Q-Former(queries + instruction) → llm_proj → prepend to
the LLM token embeddings; targets mask out query and instruction positions
with -100 (reference :217-237).

The reference packs prompt+answer per-sample on the GPU
(``concat_text_input_output``); here packing happens in the collator
(host-side numpy, see datasets/), and the model consumes
``text_input_ids`` (packed prompt⊕answer, right padded),
``text_attention_mask`` and ``labels`` (-100 on prompt and pads) — static
shapes, one jit specialization.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.models.eva_vit import EvaViT, EvaViTConfig
from vlm_compression_tpu.models.generation import (
    GenerationConfig,
    beam_search,
    greedy_generate,
    speculative_generate,
)
from vlm_compression_tpu.models.layers import SparseLinear
from vlm_compression_tpu.models.llama import (
    LlamaConfig,
    LlamaForCausalLM,
    make_causal_step,
)
from vlm_compression_tpu.models.qformer import QFormer, QFormerConfig
from vlm_compression_tpu.models.t5 import cross_entropy_loss


@dataclasses.dataclass(frozen=True)
class Blip2VicunaInstructConfig:
    vit: EvaViTConfig = dataclasses.field(default_factory=EvaViTConfig)
    qformer: QFormerConfig = dataclasses.field(default_factory=QFormerConfig)
    llm: LlamaConfig = dataclasses.field(default_factory=LlamaConfig)
    max_txt_len: int = 128
    max_output_txt_len: int = 256

    @staticmethod
    def vicuna_7b(**kw) -> "Blip2VicunaInstructConfig":
        return Blip2VicunaInstructConfig(**kw)

    @staticmethod
    def tiny(**kw) -> "Blip2VicunaInstructConfig":
        d = dict(vit=EvaViTConfig.tiny(), qformer=QFormerConfig.tiny(),
                 llm=LlamaConfig.tiny())
        d.update(kw)
        return Blip2VicunaInstructConfig(**d)


@registry.register_model("blip2_vicuna_instruct")
class Blip2VicunaInstruct(nn.Module):
    cfg: Blip2VicunaInstructConfig

    def setup(self):
        cfg = self.cfg
        self.visual_encoder = EvaViT(cfg.vit, name="visual_encoder")
        self.ln_vision = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                      name="ln_vision")
        self.qformer = QFormer(cfg.qformer, name="qformer")
        self.llm_proj = SparseLinear(cfg.llm.hidden_size,
                                     param_dtype=jnp.float32,
                                     name="llm_proj")
        self.llm_model = LlamaForCausalLM(cfg.llm, name="llm_model")

    def encode_image(self, image, vit_mode="masked",
                     qformer_input_ids=None, qformer_attention_mask=None,
                     qformer_mode="masked"):
        """5-dim video stacks fold the frame axis into the batch and
        concat per-frame query outputs (see
        Blip2T5Instruct.encode_image; reference vicuna generate has the
        same per-frame loop)."""
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
        """Post-ViT half (see blip2_t5_instruct.encode_image_from_features)."""
        cfg = self.cfg
        feats = self.ln_vision(feats.astype(jnp.float32))
        q_out = self.qformer(feats, qformer_input_ids,
                             qformer_attention_mask, mode=qformer_mode)
        q_out = q_out[:, : cfg.qformer.num_query_tokens]
        proj = self.llm_proj(q_out.astype(jnp.float32), mode="dense")
        return proj.astype(jnp.dtype(cfg.llm.dtype))

    def __call__(self, image, text_input_ids, text_attention_mask, labels,
                 qformer_input_ids=None, qformer_attention_mask=None,
                 vit_mode: str = "masked", llm_mode: str = "masked",
                 qformer_mode: str = "masked"):
        """labels: same length as text_input_ids, -100 on prompt/pads
        (reference :217-237 builds exactly this on device)."""
        prefix = self.encode_image(image, vit_mode, qformer_input_ids,
                                   qformer_attention_mask, qformer_mode)
        b, nq, _ = prefix.shape
        text_embeds = self.llm_model.embed_tokens(text_input_ids)
        inputs_embeds = jnp.concatenate([prefix, text_embeds], axis=1)
        attn = jnp.concatenate(
            [jnp.ones((b, nq), text_attention_mask.dtype),
             text_attention_mask], axis=1)
        # query positions never contribute targets (reference :229-233)
        full_labels = jnp.concatenate(
            [jnp.full((b, nq), -100, labels.dtype), labels], axis=1)
        logits = self.llm_model(inputs_embeds=inputs_embeds,
                                attention_mask=attn, mode=llm_mode)
        loss = cross_entropy_loss(logits[:, :-1], full_labels[:, 1:])
        return {"loss": loss, "logits": logits}

def _subtree(variables, name):
    out = {}
    for coll, tree in variables.items():
        if isinstance(tree, dict) and name in tree:
            out[coll] = tree[name]
    return out


def generate_vicuna(model: Blip2VicunaInstruct, variables, image,
                    prompt_input_ids, prompt_attention_mask,
                    qformer_input_ids=None, qformer_attention_mask=None,
                    gen_cfg: GenerationConfig = None,
                    vit_mode="masked", llm_mode="masked",
                    qformer_mode="masked", rng=None,
                    speculative_gamma: int = 0,
                    draft_llm_mode: str = "masked"):
    """InstructBLIP-Vicuna generate (reference :259-379): image prefix +
    left-padded prompt prime the KV cache; the last prompt token seeds the
    loop; beam or greedy/nucleus decode over the llm_model subtree."""
    from vlm_compression_tpu.models.generation import _jit_entry

    cfg = model.cfg
    gen_cfg = gen_cfg or GenerationConfig(
        eos_token_id=cfg.llm.eos_token_id, pad_token_id=cfg.llm.pad_token_id)

    fn = _jit_entry(
        ("blip2_vicuna_generate", model, gen_cfg, vit_mode, llm_mode,
         qformer_mode, speculative_gamma, draft_llm_mode),
        lambda: _generate_vicuna_impl(model, gen_cfg, vit_mode, llm_mode,
                                      qformer_mode, speculative_gamma,
                                      draft_llm_mode))
    return fn(variables, image, prompt_input_ids, prompt_attention_mask,
              qformer_input_ids, qformer_attention_mask, rng)


def _generate_vicuna_impl(model, gen_cfg, vit_mode, llm_mode, qformer_mode,
                          speculative_gamma, draft_llm_mode):
    cfg = model.cfg

    def run(variables, image, prompt_input_ids, prompt_attention_mask,
            qformer_input_ids, qformer_attention_mask, rng):
        return _generate_vicuna_body(
            model, cfg, gen_cfg, vit_mode, llm_mode, qformer_mode,
            speculative_gamma, draft_llm_mode, variables, image,
            prompt_input_ids, prompt_attention_mask, qformer_input_ids,
            qformer_attention_mask, rng)

    return run


def _generate_vicuna_body(model, cfg, gen_cfg, vit_mode, llm_mode,
                          qformer_mode, speculative_gamma, draft_llm_mode,
                          variables, image, prompt_input_ids,
                          prompt_attention_mask, qformer_input_ids,
                          qformer_attention_mask, rng):
    prefix = model.apply(variables, image, vit_mode, qformer_input_ids,
                         qformer_attention_mask, qformer_mode,
                         method=Blip2VicunaInstruct.encode_image)
    b, nq, _ = prefix.shape
    llm = LlamaForCausalLM(cfg.llm)
    llm_vars = _subtree(variables, "llm_model")
    prompt_embeds = llm.apply(llm_vars, prompt_input_ids[:, :-1],
                              method=llm.embed_tokens)
    prefix_embeds = jnp.concatenate([prefix, prompt_embeds], axis=1)
    prefix_mask = jnp.concatenate(
        [jnp.ones((b, nq), jnp.int32),
         prompt_attention_mask[:, :-1].astype(jnp.int32)], axis=1)

    # the decode loop's "start token" is the real last prompt token; per-
    # sample values are injected by overwriting the seed column after init
    start = prompt_input_ids[:, -1].astype(jnp.int32)

    if speculative_gamma > 0:
        # draft (draft_llm_mode) proposes, target (llm_mode) verifies in
        # chunks; both prime their own cache under their own mode.  The
        # cache holds the primed prefix, so rollback offsets by its width.
        max_len = gen_cfg.max_length + speculative_gamma * (
            2 if cfg.llm.kv_cache_per_row else 1) + 1

        def chunk_start(step):
            def f(tokens, c):
                tok = jnp.where(tokens == -1, start[:, None], tokens)
                return step(tok, c)
            return f

        dstep, dcache = make_causal_step(
            llm, llm_vars, prefix_embeds, prefix_mask,
            mode=draft_llm_mode, max_decode_len=max_len)
        tstep, tcache = make_causal_step(
            llm, llm_vars, prefix_embeds, prefix_mask,
            mode=llm_mode, max_decode_len=max_len)
        gcfg = dataclasses.replace(gen_cfg, decoder_start_token_id=-1)
        seqs, _, _ = speculative_generate(
            chunk_start(dstep), dcache, chunk_start(tstep), tcache, b,
            gcfg, gamma=speculative_gamma, rng=rng,
            cache_offset=prefix_embeds.shape[1])
        return seqs.at[:, 0].set(start)

    k = gen_cfg.num_beams
    if k > 1:
        prefix_embeds = jnp.repeat(prefix_embeds, k, axis=0)
        prefix_mask = jnp.repeat(prefix_mask, k, axis=0)
    step, cache = make_causal_step(llm, llm_vars, prefix_embeds, prefix_mask,
                                   mode=llm_mode,
                                   max_decode_len=gen_cfg.max_length)
    if k > 1:
        # beam_search seeds every beam with decoder_start_token_id; patch
        # via a wrapper that substitutes the per-sample start token
        start_b = jnp.repeat(start, k, axis=0)

        def step_with_start(tokens, c):
            tok = jnp.where(tokens[:, 0] == -1, start_b, tokens[:, 0])
            return step(tok[:, None], c)

        gcfg = dataclasses.replace(gen_cfg, decoder_start_token_id=-1)
        seqs, _ = beam_search(step_with_start, cache, b, gcfg)
        seqs = seqs.at[:, 0].set(start)
    else:
        def step_with_start(tokens, c):
            tok = jnp.where(tokens[:, 0] == -1, start, tokens[:, 0])
            return step(tok[:, None], c)

        gcfg = dataclasses.replace(gen_cfg, decoder_start_token_id=-1)
        seqs, _ = greedy_generate(step_with_start, cache, b, gcfg, rng)
        seqs = seqs.at[:, 0].set(start)
    return seqs


def predict_class_vicuna(model: Blip2VicunaInstruct, variables, image,
                         prompt_ids, prompt_mask, candidate_ids,
                         candidate_mask, qformer_input_ids=None,
                         qformer_attention_mask=None, vit_mode="masked",
                         llm_mode="masked", qformer_mode="masked"):
    """Candidate ranking for the decoder-only composition (reference
    blip2_vicuna_instruct.predict_class :445-583): per candidate, the
    LM scores [image prefix ⊕ prompt ⊕ candidate] with the loss masked
    to candidate positions; returns (b, C) summed NLL (lower = better).

    candidate_ids/mask: (C, L) right-padded.  The image+prompt prefix is
    shared, so the image encodes once and repeats across candidates.
    """
    b = image.shape[0]
    C, L = candidate_ids.shape
    P = prompt_ids.shape[1]

    prefix = model.apply(variables, image, vit_mode, qformer_input_ids,
                         qformer_attention_mask, qformer_mode,
                         method=Blip2VicunaInstruct.encode_image)
    nq = prefix.shape[1]
    prefix_rep = jnp.repeat(prefix, C, axis=0)              # (b*C, nq, d)

    ids = jnp.concatenate([
        jnp.repeat(prompt_ids, C, axis=0),
        jnp.tile(candidate_ids, (b, 1)),
    ], axis=1)                                              # (b*C, P+L)
    attn = jnp.concatenate([
        jnp.repeat(prompt_mask, C, axis=0),
        jnp.tile(candidate_mask, (b, 1)),
    ], axis=1)
    labels = jnp.concatenate([
        jnp.full((b * C, P), -100, jnp.int32),
        jnp.tile(jnp.where(candidate_mask.astype(bool), candidate_ids,
                           -100), (b, 1)),
    ], axis=1)

    llm = LlamaForCausalLM(model.cfg.llm)
    llm_vars = _subtree(variables, "llm_model")
    text_embeds = llm.apply(llm_vars, ids, method=llm.embed_tokens)
    inputs_embeds = jnp.concatenate([prefix_rep, text_embeds], axis=1)
    full_attn = jnp.concatenate(
        [jnp.ones((b * C, nq), attn.dtype), attn], axis=1)
    logits = llm.apply(llm_vars, inputs_embeds=inputs_embeds,
                       attention_mask=full_attn, mode=llm_mode)
    full_labels = jnp.concatenate(
        [jnp.full((b * C, nq), -100, jnp.int32), labels], axis=1)

    import jax

    lp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = full_labels[:, 1:]
    valid = tgt != -100
    safe = jnp.where(valid, tgt, 0)
    ll = jnp.take_along_axis(lp, safe[..., None], axis=-1)[..., 0]
    nll = -(ll * valid).sum(-1)
    return nll.reshape(b, C)
