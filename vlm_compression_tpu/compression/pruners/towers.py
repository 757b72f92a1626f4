"""Registered pruner classes: {t5, vit, blipt5} × {wanda, sparsegpt, dsnot}.

The reference implements nine near-identical classes
(wanda_pruner.py:409-1039, sparsegpt_pruner.py:222-1090,
dsnot_pruner.py:107-1870); here one orchestration base + a method table
generate the same registry surface:

  t5_wanda_pruner / vit_wanda_pruner / blipt5_wanda_pruner
  t5_sparsegpt_pruner / vit_sparsegpt_pruner / blipt5_sparsegpt_pruner
  t5_dsnot_pruner / vit_dsnot_pruner / blipt5_dsnot_pruner

Orchestration parity: ViT → T5-encoder → T5-decoder, upstream towers dense
during downstream calibration in the LoRA path (wanda_pruner.py:941-1039);
ViT-wanda uses the flat value-threshold variant, language towers per-unit
top-k.
"""

from __future__ import annotations

import os as _os

from vlm_compression_tpu.common.registry import registry
from vlm_compression_tpu.compression import adapters as A
from vlm_compression_tpu.compression.pruners import methods as M
from vlm_compression_tpu.compression.pruners.base import (
    FlaxModel,
    LayerWisePrunerBase,
    convert_spec_to_list,
)
from vlm_compression_tpu.models.eva_vit import EvaViT
from vlm_compression_tpu.models.t5 import T5ForConditionalGeneration, shift_right


class _MethodMixin:
    method: str = "wanda"

    # DSnoT / SparseGPT knobs (reference CLI flags)
    initial_method: str = "wanda"
    max_cycle_time: int = 50
    update_threshold: float = 0.1
    pow_of_var_regrowing: float = 1.0
    without_same_sign: bool = True
    without_dsnot: bool = False
    blocksize: int = 128
    percdamp: float = 0.01
    # Per-method fold programs (default): wanda/dsnot folds drop the
    # Hessian matmul they never read — measured round 5 on the XL bench:
    # wanda phase 9.1 s per-method vs 10.6-13.3 s unified (the fp32-
    # pinned XᵀX is the fold's priciest op).  The historical reason for
    # ONE shared fold per tower — each extra multi-MB fold executable
    # cost a serial load over the ~2 MB/s device tunnel — is gone now
    # that `Pruner.prewarm()` warms each pruner's own fold/replay
    # programs overlapped with its first stats pass.  VCT_UNIFIED_FOLD=1
    # restores the shared-program behavior for load-constrained setups.
    unified_fold: bool = _os.environ.get("VCT_UNIFIED_FOLD", "0") != "0"

    @property
    def with_hessian(self) -> bool:
        if self.unified_fold or self.method in ("sparsegpt", "softmask",
                                                "gptq"):
            return True
        return self.method == "dsnot" and self.initial_method == "sparsegpt"

    def make_mask_fn(self, lora_model: bool, tower: str = "llm"):
        """Memoized per (lora_model, tower): wanda's factory creates fresh
        jax.jit objects, and prewarm + sweep must share the SAME instances
        or the warmed executables are not the ones the sweep loads (a new
        jit object re-traces and re-uploads even with a warm disk cache)."""
        cache = self.__dict__.setdefault("_mask_fn_cache", {})
        # keyed by tower only: no method's mask fn depends on lora_model
        # (the engine handles mask-vs-zero application), so prewarm
        # (lora_model=True) and sweep (either) share one instance
        key = tower
        if key not in cache:
            cache[key] = self._build_mask_fn(lora_model, tower)
        return cache[key]

    # RIA knob (beyond-reference method; masks.ria_metric)
    ria_alpha: float = 0.5
    # PATCH-style hybrid tiles (beyond-reference): with n:m set, tile
    # size for salient-tiles-stay-dense masks (0 = plain n:m)
    hybrid_tile: int = 0
    # annealed soft-mask knobs (beyond-reference; ops/softmask.py)
    softmask_steps: int = 48
    softmask_lr: float = 0.1
    # GPTQ knobs (beyond-reference; ops/gptq.py)
    gptq_bits: int = 4
    gptq_group: int = 128
    gptq_sym: bool = True
    gptq_actorder: bool = False
    gptq_awq: bool = False

    def _build_mask_fn(self, lora_model: bool, tower: str = "llm"):
        if self.method in ("wanda", "ria"):
            return M.wanda_mask_fn(self.prune_n, self.prune_m,
                                   flat_threshold=(tower == "vit"),
                                   metric=self.method,
                                   ria_alpha=self.ria_alpha,
                                   hybrid_tile=self.hybrid_tile)
        if self.method == "sparsegpt":
            return M.sparsegpt_mask_fn(self.prune_n, self.prune_m,
                                       self.blocksize, self.percdamp)
        if self.method == "dsnot":
            return M.dsnot_mask_fn(
                self.prune_n, self.prune_m, self.initial_method,
                self.max_cycle_time, self.update_threshold,
                self.pow_of_var_regrowing, self.without_same_sign,
                self.without_dsnot)
        if self.method == "softmask":
            return M.softmask_mask_fn(
                self.prune_n, self.prune_m, steps=self.softmask_steps,
                lr=self.softmask_lr)
        if self.method == "gptq":
            return M.gptq_fn(
                self.prune_n, self.prune_m, bits=self.gptq_bits,
                groupsize=self.gptq_group, sym=self.gptq_sym,
                act_order=self.gptq_actorder, blocksize=self.blocksize,
                percdamp=self.percdamp, awq=self.gptq_awq)
        raise ValueError(self.method)

    def _prune_tower(self, adapter, variables, batches, sparsity_for,
                     lora_model, tower="llm", warm_thread=None,
                     return_outputs=False):
        from vlm_compression_tpu.compression.calibrate import (
            calibrate_and_prune_tower,
        )
        import logging

        return calibrate_and_prune_tower(
            adapter, variables, batches,
            mask_fn=self.make_mask_fn(lora_model, tower),
            sparsity_for=sparsity_for,
            with_hessian=self.with_hessian,
            lora_model=lora_model,
            progress=logging.info,
            warm_thread=warm_thread or getattr(self, "_prewarm_thread", None),
            return_outputs=return_outputs,
            stats_sink=getattr(self, "_stats_sink", None),
        )


# ---------------------------------------------------------------------------
# standalone language tower (T5)
# ---------------------------------------------------------------------------


class T5PrunerBase(_MethodMixin, LayerWisePrunerBase):
    """Prunes a bare T5ForConditionalGeneration (driver config #1 shape)."""

    def _prewarm_towers(self):
        spec = convert_spec_to_list(self.prune_spec or self.t5_prune_spec)
        keep = spec[1] if spec else None
        return [(("encoder",), "llm", keep), (("decoder",), "llm", keep)]

    def prune(self, lora_model: bool = True):
        module: T5ForConditionalGeneration = self.model.module
        cfg = module.cfg
        spec = convert_spec_to_list(self.prune_spec or self.t5_prune_spec)
        sparsity = 1.0 - spec[1]
        sfor = self.get_sparsity(sparsity, self.sparsity_ratio_granularity)
        batches = self.batches()
        variables = self.model.variables
        # drop the original tree reference: each stage rewrites kernels
        # functionally, and holding both trees doubles peak HBM
        self.model = None
        upstream = "dense" if lora_model else "masked"

        def embeds_fn(variables, batch):
            e = module.apply(variables, batch["input_ids"],
                             method=T5ForConditionalGeneration.embed_tokens)
            return e, batch.get("attention_mask")

        enc_ad = A.make_t5_encoder_adapter(
            cfg, embeds_fn, ("encoder",),
            stem_key=("t5_solo_enc", type(module).__name__, cfg))
        variables = self._prune_tower(enc_ad, variables, batches, sfor,
                                      lora_model, tower="llm")

        def dec_inputs_fn(variables, batch):
            embeds, mask = embeds_fn(variables, batch)
            enc_out = module.apply(
                variables, batch["input_ids"], mask,
                method=lambda m, ids, msk: m.encode(
                    input_ids=ids, attention_mask=msk, mode=upstream))
            labels = batch["labels"]
            dec_ids = shift_right(labels, cfg.decoder_start_token_id,
                                  cfg.pad_token_id)
            dec_mask = (labels != -100).astype("int32")
            dec_embeds = module.apply(
                variables, dec_ids,
                method=T5ForConditionalGeneration.embed_tokens)
            return dec_embeds, dec_mask, enc_out, mask

        dec_ad = A.make_t5_decoder_adapter(
            cfg, dec_inputs_fn, ("decoder",),
            stem_key=("t5_solo_dec", type(module).__name__, cfg, upstream))
        variables = self._prune_tower(dec_ad, variables, batches, sfor,
                                      lora_model, tower="llm")

        self.model = FlaxModel(module, variables)
        return self.model, getattr(sfor, "mapping", None)


# ---------------------------------------------------------------------------
# standalone vision tower (EVA ViT)
# ---------------------------------------------------------------------------


class ViTPrunerBase(_MethodMixin, LayerWisePrunerBase):
    def _prewarm_towers(self):
        spec = convert_spec_to_list(self.prune_spec or self.vit_prune_spec)
        return [((), "vit", spec[1] if spec else None)]

    def prune(self, lora_model: bool = True):
        module: EvaViT = self.model.module
        cfg = module.cfg
        spec = convert_spec_to_list(self.prune_spec or self.vit_prune_spec)
        sparsity = 1.0 - spec[1]
        sfor = self.get_sparsity(sparsity, self.sparsity_ratio_granularity)
        batches = self.batches()

        def stem_fn(variables, batch):
            return module.apply(variables, batch["image"],
                                method=EvaViT.embed), {}

        variables = self.model.variables
        self.model = None  # free the original tree during the sweep
        ad = A.make_vit_adapter(
            cfg, stem_fn, subtree=(),
            stem_key=("vit_solo", type(module).__name__, cfg))
        variables = self._prune_tower(ad, variables, batches,
                                      sfor, lora_model, tower="vit")
        self.model = FlaxModel(module, variables)
        return self.model, getattr(sfor, "mapping", None)


# ---------------------------------------------------------------------------
# joint V+L (InstructBLIP)
# ---------------------------------------------------------------------------


class BlipT5PrunerBase(_MethodMixin, LayerWisePrunerBase):
    def _prewarm_towers(self):
        module = self.model.module
        is_t5 = hasattr(module.cfg, "t5")
        vit_spec = convert_spec_to_list(self.vit_prune_spec)
        t5_spec = convert_spec_to_list(self.t5_prune_spec)
        vit_keep = vit_spec[1] if vit_spec else None
        t5_keep = t5_spec[1] if t5_spec else None
        towers = [((self.vit_model_prefix,), "vit", vit_keep)]
        if is_t5:
            towers += [((self.t5_model_prefix, "encoder"), "llm", t5_keep),
                       ((self.t5_model_prefix, "decoder"), "llm", t5_keep)]
        else:
            towers += [((self.t5_model_prefix,), "llm", t5_keep)]
        return towers

    def _allocation_prefixes(self):
        # reference wanda_pruner.py:876-881: only params under the t5/vit
        # prefixes take part in sparsity allocation (Q-Former excluded)
        return (self.vit_model_prefix, self.t5_model_prefix)

    @staticmethod
    def trans_sparsity(vit_params, t5_params, vit_keep_ratio, t5_keep_ratio):
        """V↔L keep-budget transfer: reinterpret each tower's keep ratio as
        a share of the JOINT parameter budget split evenly between towers,
        clamped at fully dense (reference dsnot_pruner.py:1873-1878 —
        defined there but never invoked; kept for API parity)."""
        total = vit_params + t5_params
        vit_keep_params = total * vit_keep_ratio / 2
        t5_keep_params = total * t5_keep_ratio / 2
        return (min(vit_keep_params / vit_params, 1.0),
                min(t5_keep_params / t5_params, 1.0))

    def _prewarm_adapters(self):
        """Adapters with the non-chained stems: stems are only
        eval_shape'd during the warm, and the chained stems produce the
        same block-program shapes (same sequence composition), so the
        warmed block jits (shared via adapters._BLOCK_JIT_CACHE) are
        exactly the sweep's."""
        module = self.model.module
        vit_cfg = module.cfg.vit
        is_t5 = hasattr(module.cfg, "t5")
        lm_cfg = module.cfg.t5 if is_t5 else module.cfg.llm
        out = []
        if self.vit_prune_spec:
            def vit_stem(variables, batch):
                return module.apply(
                    variables, batch["image"],
                    method=lambda m, img: m.visual_encoder.embed(img)), {}

            out.append(A.make_vit_adapter(vit_cfg, vit_stem,
                                          (self.vit_model_prefix,)))
        if self.t5_prune_spec and is_t5:
            out.append(A.make_t5_encoder_adapter(
                lm_cfg,
                lambda v, b: module.apply(
                    v, b, method=lambda m, bb: _blip_encoder_inputs(
                        m, bb, "masked")),
                (self.t5_model_prefix, "encoder")))
            out.append(A.make_t5_decoder_adapter(
                lm_cfg,
                lambda v, b: module.apply(
                    v, b, method=lambda m, bb: _blip_decoder_inputs(
                        m, bb, "masked", "masked")),
                (self.t5_model_prefix, "decoder")))
        elif self.t5_prune_spec:
            out.append(A.make_llama_adapter(
                lm_cfg,
                lambda v, b: module.apply(
                    v, b, method=lambda m, bb: _blip_llm_inputs(
                        m, bb, "masked")),
                (self.t5_model_prefix,)))
        return out

    def prune(self, lora_model: bool = True):
        module = self.model.module   # Blip2T5Instruct or Blip2VicunaInstruct
        vit_cfg = module.cfg.vit
        is_t5 = hasattr(module.cfg, "t5")
        lm_cfg = module.cfg.t5 if is_t5 else module.cfg.llm
        vit_spec = convert_spec_to_list(self.vit_prune_spec)
        t5_spec = convert_spec_to_list(self.t5_prune_spec)
        vit_keep = vit_spec[1] if vit_spec else 1.0
        t5_keep = t5_spec[1] if t5_spec else 1.0

        sparsity_dict = None
        if self.sparsity_ratio_granularity not in (None, "none"):
            sfor_global = self.get_sparsity(
                1.0 - t5_keep, self.sparsity_ratio_granularity)
        else:
            sfor_global = None

        batches = self.batches()
        variables = self.model.variables
        self.model = None  # free the original tree during the sweeps
        # reference wanda_pruner.py:966-967: upstream dense iff that tower is
        # being pruned in the LoRA path
        vit_mode_for_llm = "dense" if (lora_model and vit_keep < 1.0) else "masked"
        llm_upstream = "dense" if (lora_model and t5_keep < 1.0) else "masked"

        # Sweep CHAINING: in the non-LoRA path upstream towers run pruned
        # ("masked" on physically-zeroed weights) — exactly what the
        # engine's replayed per-batch activations already are.  Feeding
        # them to the next tower's stem via an augmented batch key
        # ("vit_x"/"enc_x") skips re-running the upstream towers AND
        # shrinks the stem executables (the decoder stem otherwise inlines
        # ViT+Q-Former+encoder: an 86 MB program whose load over the
        # tunnel costs ~45 s).  The LoRA path keeps full stems: there the
        # reference runs upstream towers DENSE during downstream
        # calibration (wanda_pruner.py:941-967), which the replayed sparse
        # activations would not match.
        #
        # NOTE on prewarm scope (measured on the axon tunnel): executable
        # transfers are bandwidth-serialized and concurrent loads of the
        # same program do NOT dedupe, so (a) warming fold programs races
        # the sweep's own first fold call and pays every load twice
        # (522 s vs 314 s sweep), and (b) a global all-tower mask warm
        # front-loads contention without reducing total bytes (420 s).
        # The per-tower warm inside calibrate_and_prune_tower (overlapped
        # with that tower's first stats pass) remains the fastest.
        prune_vit = bool(vit_spec and vit_keep < 1.0)
        prune_llm = bool(t5_spec and t5_keep < 1.0)
        chain = (not lora_model) and prune_vit and prune_llm
        vit_outs = None

        if prune_vit:
            vit_sfor = sfor_global or self.get_sparsity(1.0 - vit_keep)

            def vit_stem(variables, batch):
                return module.apply(
                    variables, batch["image"],
                    method=lambda m, img: m.visual_encoder.embed(img)), {}

            ad = A.make_vit_adapter(
                vit_cfg, vit_stem, ("visual_encoder",),
                stem_key=("blip_vit", type(module).__name__, module.cfg))
            res = self._prune_tower(ad, variables, batches, vit_sfor,
                                    lora_model, tower="vit",
                                    return_outputs=chain)
            variables, vit_outs = res if chain else (res, None)

        if prune_llm and is_t5:
            sfor = sfor_global or self.get_sparsity(1.0 - t5_keep)
            if chain:
                from vlm_compression_tpu.compression.calibrate import (
                    fuse_batch_dicts,
                )

                # the engine may have FUSED the calibration batches into
                # one (see batch-fusion note): align the batch dicts with
                # however many replayed activations came back
                bb = (fuse_batch_dicts(batches) if len(vit_outs) == 1
                      else batches)
                enc_batches = [dict(b, vit_x=x)
                               for b, x in zip(bb, vit_outs)]
                vit_outs = None  # free

                def enc_embeds_fn(variables, batch):
                    return module.apply(
                        variables, batch,
                        method=lambda m, b: _encoder_inputs_from_prefix(
                            m, b, m.encode_image_from_features(
                                b["vit_x"], b.get("qformer_input_ids"),
                                b.get("qformer_attention_mask"))))
            else:
                enc_batches = batches

                def enc_embeds_fn(variables, batch):
                    return module.apply(
                        variables, batch,
                        method=lambda m, b: _blip_encoder_inputs(
                            m, b, vit_mode_for_llm))

            enc_ad = A.make_t5_encoder_adapter(
                lm_cfg, enc_embeds_fn, ("t5_model", "encoder"),
                stem_key=("blip_enc", type(module).__name__, module.cfg,
                          chain, vit_mode_for_llm))
            res = self._prune_tower(enc_ad, variables, enc_batches, sfor,
                                    lora_model, tower="llm",
                                    return_outputs=chain)
            variables, enc_outs = res if chain else (res, None)

            if chain:
                bb = (fuse_batch_dicts(enc_batches)
                      if len(enc_outs) == 1 else enc_batches)
                dec_batches = [dict(b, enc_x=x)
                               for b, x in zip(bb, enc_outs)]
                bb = enc_batches = enc_outs = None  # free activations

                def dec_inputs_fn(variables, batch):
                    return module.apply(
                        variables, batch,
                        method=lambda m, b: _decoder_inputs_from_enc(m, b))
            else:
                dec_batches = batches

                def dec_inputs_fn(variables, batch):
                    return module.apply(
                        variables, batch,
                        method=lambda m, b: _blip_decoder_inputs(
                            m, b, vit_mode_for_llm, llm_upstream))

            dec_ad = A.make_t5_decoder_adapter(
                lm_cfg, dec_inputs_fn, ("t5_model", "decoder"),
                stem_key=("blip_dec", type(module).__name__, module.cfg,
                          chain, vit_mode_for_llm, llm_upstream))
            variables = self._prune_tower(dec_ad, variables, dec_batches,
                                          sfor, lora_model, tower="llm")
        elif prune_llm:
            # decoder-only LLM (Vicuna): single sweep over llm_model blocks
            # (reference wanda_pruner.py:1032-1039, scripts/Vicuna/train.py
            # passes t5_model_prefix="llm_model")
            sfor = sfor_global or self.get_sparsity(1.0 - t5_keep)
            if chain:
                from vlm_compression_tpu.compression.calibrate import (
                    fuse_batch_dicts,
                )

                bb = (fuse_batch_dicts(batches) if len(vit_outs) == 1
                      else batches)
                llm_batches = [dict(b, vit_x=x)
                               for b, x in zip(bb, vit_outs)]
                vit_outs = None

                def llm_inputs_fn(variables, batch):
                    return module.apply(
                        variables, batch,
                        method=lambda m, b: _llm_inputs_from_prefix(
                            m, b, m.encode_image_from_features(
                                b["vit_x"], b.get("qformer_input_ids"),
                                b.get("qformer_attention_mask"))))
            else:
                llm_batches = batches

                def llm_inputs_fn(variables, batch):
                    return module.apply(
                        variables, batch,
                        method=lambda m, b: _blip_llm_inputs(
                            m, b, vit_mode_for_llm))

            ad = A.make_llama_adapter(
                lm_cfg, llm_inputs_fn, ("llm_model",),
                stem_key=("blip_llm", type(module).__name__, module.cfg,
                          chain, vit_mode_for_llm))
            variables = self._prune_tower(ad, variables, llm_batches, sfor,
                                          lora_model, tower="llm")

        self.model = FlaxModel(module, variables)
        if sfor_global is not None:
            sparsity_dict = getattr(sfor_global, "mapping", None)
        return self.model, sparsity_dict


def _llm_inputs_from_prefix(m, batch, prefix):
    """[query prefix ⊕ packed prompt+answer embeds] given a computed
    prefix (sweep chaining feeds the pruned ViT's replayed features)."""
    import jax.numpy as jnp

    te = m.llm_model.embed_tokens(batch["text_input_ids"])
    embeds = jnp.concatenate([prefix, te], axis=1)
    b, nq = prefix.shape[0], prefix.shape[1]
    tmask = batch["text_attention_mask"]
    mask = jnp.concatenate(
        [jnp.ones((b, nq), tmask.dtype), tmask], axis=1)
    return embeds, mask


def _blip_llm_inputs(m, batch, vit_mode):
    """(inputs_embeds, attention_mask) for the decoder-only LLM inside
    InstructBLIP-Vicuna."""
    prefix = m.encode_image(
        batch["image"], vit_mode,
        batch.get("qformer_input_ids"), batch.get("qformer_attention_mask"))
    return _llm_inputs_from_prefix(m, batch, prefix)


def _encoder_inputs_from_prefix(m, batch, prefix):
    """[query prefix ⊕ T5 token embeds] given a computed prefix."""
    import jax.numpy as jnp

    te = m.t5_model.embed_tokens(batch["input_ids"])
    embeds = jnp.concatenate([prefix, te], axis=1)
    b, nq = prefix.shape[0], prefix.shape[1]
    mask = jnp.concatenate(
        [jnp.ones((b, nq), batch["attention_mask"].dtype),
         batch["attention_mask"]], axis=1)
    return embeds, mask


def _blip_encoder_inputs(m, batch, vit_mode):
    """(inputs_embeds, attention_mask) for the T5 encoder inside BLIP."""
    prefix = m.encode_image(
        batch["image"], vit_mode,
        batch.get("qformer_input_ids"), batch.get("qformer_attention_mask"))
    return _encoder_inputs_from_prefix(m, batch, prefix)


def _decoder_tail(m, batch, enc_out, enc_mask):
    dec_ids = shift_right(batch["labels"], m.cfg.t5.decoder_start_token_id,
                          m.cfg.t5.pad_token_id)
    dec_mask = (batch["labels"] != -100).astype("int32")
    dec_embeds = m.t5_model.embed_tokens(dec_ids)
    return dec_embeds, dec_mask, enc_out, enc_mask


def _blip_decoder_inputs(m, batch, vit_mode, llm_mode):
    embeds, mask = _blip_encoder_inputs(m, batch, vit_mode)
    enc_out = m.t5_model.encoder(embeds, mask, mode=llm_mode)
    return _decoder_tail(m, batch, enc_out, mask)


def _decoder_inputs_from_enc(m, batch):
    """Decoder stem from the encoder sweep's replayed last-block output
    (``enc_x``): only the encoder's final RMSNorm remains to apply."""
    import jax.numpy as jnp

    enc_out = m.t5_model.encoder.final_norm(batch["enc_x"])
    b = batch["enc_x"].shape[0]
    nq = m.cfg.qformer.num_query_tokens
    enc_mask = jnp.concatenate(
        [jnp.ones((b, nq), batch["attention_mask"].dtype),
         batch["attention_mask"]], axis=1)
    return _decoder_tail(m, batch, enc_out, enc_mask)


# ---------------------------------------------------------------------------
# registry: nine names, three bases × three methods
# ---------------------------------------------------------------------------


def _make(base, method_name, reg_name):
    cls = type(
        f"{reg_name}_cls", (base,),
        {"method": method_name, "pruner_name": reg_name})
    registry.register_pruner(reg_name)(cls)
    return cls


T5WandaPruner = _make(T5PrunerBase, "wanda", "t5_wanda_pruner")
ViTWandaPruner = _make(ViTPrunerBase, "wanda", "vit_wanda_pruner")
BlipT5WandaPruner = _make(BlipT5PrunerBase, "wanda", "blipt5_wanda_pruner")

T5SparseGPTPruner = _make(T5PrunerBase, "sparsegpt", "t5_sparsegpt_pruner")
ViTSparseGPTPruner = _make(ViTPrunerBase, "sparsegpt", "vit_sparsegpt_pruner")
BlipT5SparseGPTPruner = _make(BlipT5PrunerBase, "sparsegpt",
                              "blipt5_sparsegpt_pruner")

T5DSnoTPruner = _make(T5PrunerBase, "dsnot", "t5_dsnot_pruner")
ViTDSnoTPruner = _make(ViTPrunerBase, "dsnot", "vit_dsnot_pruner")
BlipT5DSnoTPruner = _make(BlipT5PrunerBase, "dsnot", "blipt5_dsnot_pruner")

# beyond-reference: RIA (relative importance × activations) — rides the
# Wanda sweep with a stronger metric (ops/masks.ria_metric)
T5RIAPruner = _make(T5PrunerBase, "ria", "t5_ria_pruner")
ViTRIAPruner = _make(ViTPrunerBase, "ria", "vit_ria_pruner")
BlipT5RIAPruner = _make(BlipT5PrunerBase, "ria", "blipt5_ria_pruner")

# beyond-reference: annealed Hessian-guided soft-mask n:m (SparseForge
# pattern) — differentiable top-(m−n) relaxation trained against the OBS
# reconstruction error from the calibration Hessians, no-regression
# fallback to the Wanda init (ops/softmask.py)
T5SoftMaskPruner = _make(T5PrunerBase, "softmask", "t5_softmask_pruner")
ViTSoftMaskPruner = _make(ViTPrunerBase, "softmask", "vit_softmask_pruner")
BlipT5SoftMaskPruner = _make(BlipT5PrunerBase, "softmask",
                             "blipt5_softmask_pruner")

# beyond-reference: GPTQ calibration-aware quantization riding the same
# sweep (ops/gptq.py).  Keep-ratio 1.0 in the prune spec → quantize-only;
# any other ratio or n:m → joint sparse+quant in one OBS pass.
T5GPTQPruner = _make(T5PrunerBase, "gptq", "t5_gptq_pruner")
ViTGPTQPruner = _make(ViTPrunerBase, "gptq", "vit_gptq_pruner")
BlipT5GPTQPruner = _make(BlipT5PrunerBase, "gptq", "blipt5_gptq_pruner")
