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


def generate_opt(model: Blip2OPT, variables, image, prompt_input_ids,
                 prompt_attention_mask, gen_cfg=None, vit_mode="masked",
                 llm_mode="masked", qformer_mode="masked", rng=None,
                 speculative_gamma: int = 0,
                 draft_llm_mode: str = "masked"):
    """BLIP-2-OPT generate (reference blip2_opt.py:171-286): image
    prefix + prompt prime the OPT KV cache; the last prompt token seeds
    the decode loop (same machinery as generate_vicuna — OPT shares the
    causal-step protocol)."""
    import dataclasses as _dc

    import jax.numpy as jnp  # noqa: F811

    from vlm_compression_tpu.models.generation import (
        GenerationConfig,
        beam_search,
        greedy_generate,
        speculative_generate,
    )
    from vlm_compression_tpu.models.llama import make_causal_step

    from vlm_compression_tpu.models.generation import _jit_entry

    cfg = model.cfg
    gen_cfg = gen_cfg or GenerationConfig(eos_token_id=2, pad_token_id=1)

    fn = _jit_entry(
        ("blip2_opt_generate", model, gen_cfg, vit_mode, llm_mode,
         qformer_mode, speculative_gamma, draft_llm_mode),
        lambda: lambda variables, image, prompt_input_ids,
        prompt_attention_mask, rng: _generate_opt_body(
            model, cfg, gen_cfg, vit_mode, llm_mode, qformer_mode,
            speculative_gamma, draft_llm_mode, variables, image,
            prompt_input_ids, prompt_attention_mask, rng))
    return fn(variables, image, prompt_input_ids, prompt_attention_mask,
              rng)


def _generate_opt_body(model, cfg, gen_cfg, vit_mode, llm_mode,
                       qformer_mode, speculative_gamma, draft_llm_mode,
                       variables, image, prompt_input_ids,
                       prompt_attention_mask, rng):
    import dataclasses as _dc

    import jax.numpy as jnp  # noqa: F811

    from vlm_compression_tpu.models.generation import (
        beam_search,
        greedy_generate,
        speculative_generate,
    )
    from vlm_compression_tpu.models.llama import make_causal_step

    prefix = model.apply(variables, image, vit_mode, qformer_mode,
                         method=Blip2OPT.encode_image)
    b, nq, _ = prefix.shape
    opt = OPTForCausalLM(cfg.opt)
    opt_vars = {coll: tree["opt_model"] for coll, tree in variables.items()
                if isinstance(tree, dict) and "opt_model" in tree}
    prompt_embeds = opt.apply(opt_vars, prompt_input_ids[:, :-1],
                              method=opt.embed_tokens)
    prefix_embeds = jnp.concatenate([prefix, prompt_embeds], axis=1)
    prefix_mask = jnp.concatenate(
        [jnp.ones((b, nq), jnp.int32),
         prompt_attention_mask[:, :-1].astype(jnp.int32)], axis=1)

    start = prompt_input_ids[:, -1].astype(jnp.int32)

    if speculative_gamma > 0:
        max_len = gen_cfg.max_length + speculative_gamma * (
            2 if cfg.opt.kv_cache_per_row else 1) + 1

        def chunk_start(step):
            def f(tokens, c):
                tok = jnp.where(tokens == -1, start[:, None], tokens)
                return step(tok, c)
            return f

        dstep, dcache = make_causal_step(
            opt, opt_vars, prefix_embeds, prefix_mask,
            mode=draft_llm_mode, max_decode_len=max_len)
        tstep, tcache = make_causal_step(
            opt, opt_vars, prefix_embeds, prefix_mask,
            mode=llm_mode, max_decode_len=max_len)
        gcfg = _dc.replace(gen_cfg, decoder_start_token_id=-1)
        seqs, _, _ = speculative_generate(
            chunk_start(dstep), dcache, chunk_start(tstep), tcache, b,
            gcfg, gamma=speculative_gamma, rng=rng,
            cache_offset=prefix_embeds.shape[1])
        return seqs.at[:, 0].set(start)

    k = gen_cfg.num_beams
    if k > 1:
        prefix_embeds = jnp.repeat(prefix_embeds, k, axis=0)
        prefix_mask = jnp.repeat(prefix_mask, k, axis=0)
    step, cache = make_causal_step(opt, opt_vars, prefix_embeds,
                                   prefix_mask, mode=llm_mode,
                                   max_decode_len=gen_cfg.max_length)
    start_b = jnp.repeat(start, k, axis=0) if k > 1 else start

    def step_with_start(tokens, c):
        tok = jnp.where(tokens[:, 0] == -1, start_b, tokens[:, 0])
        return step(tok[:, None], c)

    gcfg = _dc.replace(gen_cfg, decoder_start_token_id=-1)
    if k > 1:
        seqs, _ = beam_search(step_with_start, cache, b, gcfg)
    else:
        seqs, _ = greedy_generate(step_with_start, cache, b, gcfg, rng)
    return seqs.at[:, 0].set(start)
