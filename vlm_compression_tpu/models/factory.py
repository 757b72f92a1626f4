"""Model factory: run-config → composed model + initialized variables.

Counterpart of the reference's ``from_config`` path
(``base_task.build_model`` → ``registry.get_model_class(arch).from_config``,
base_task.py:31-35, blip2_t5_instruct.py:36-39) plus the model-size
rewriting ``train.py:338-353`` does (flant5xl/xxl, vicuna7b/13b).

LoRA ranks per tower follow the reference's ``tune_opt`` selector +
``lora_r_v/l/q`` flags (train.py:410-486): a tower gets its rank only when
its letter is in tune_opt (V=vision, L=language, Q=qformer).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vlm_compression_tpu.models.blip2_t5_instruct import (
    Blip2T5Instruct,
    Blip2T5InstructConfig,
)
from vlm_compression_tpu.models.blip2_vicuna_instruct import (
    Blip2VicunaInstruct,
    Blip2VicunaInstructConfig,
)
from vlm_compression_tpu.models.eva_vit import EvaViTConfig
from vlm_compression_tpu.models.llama import LlamaConfig
from vlm_compression_tpu.models.qformer import QFormerConfig
from vlm_compression_tpu.models.t5 import T5Config


def _get(cfg, key, default=None):
    if cfg is None:
        return default
    v = cfg.get(key, default) if hasattr(cfg, "get") else getattr(
        cfg, key, default)
    return default if v is None else v


def apply_dtype_policy(cfg, amp: bool):
    """Mixed-precision policy knob (reference run_cfg.amp gating autocast,
    runner_base.py:146-154 / base_task.py:306): amp=True keeps the
    bf16-compute defaults; amp=False rewrites every tower sub-config to
    float32 compute + storage — the reference's non-autocast fp32 path."""
    if amp:
        return cfg
    target = "float32"

    def fix(node):
        if dataclasses.is_dataclass(node):
            updates = {}
            for f in dataclasses.fields(node):
                v = getattr(node, f.name)
                if f.name in ("dtype", "param_dtype") and \
                        isinstance(v, str) and v == "bfloat16":
                    updates[f.name] = target
                elif dataclasses.is_dataclass(v):
                    updates[f.name] = fix(v)
            return dataclasses.replace(node, **updates) if updates else node
        return node

    return fix(cfg)


def build_model_config(model_cfg) -> Tuple[str, object]:
    """(arch, composed config) from a model config node."""
    arch = _get(model_cfg, "arch", "blip2_t5_instruct")
    size = str(_get(model_cfg, "model_type",
                    _get(model_cfg, "model_size", "flant5xl")))
    tiny = bool(_get(model_cfg, "tiny", False))
    tune_opt = str(_get(model_cfg, "tune_opt", ""))
    r_v = int(_get(model_cfg, "lora_r_v", 0)) if "V" in tune_opt else 0
    r_l = int(_get(model_cfg, "lora_r_l", 0)) if "L" in tune_opt else 0
    r_q = int(_get(model_cfg, "lora_r_q", 0)) if "Q" in tune_opt else 0
    alpha = float(_get(model_cfg, "lora_alpha", 16.0))
    amp = bool(_get(model_cfg, "amp", True))

    arch, cfg = _build_arch_config(model_cfg, arch, size, tiny,
                                   r_v, r_l, r_q, alpha)
    def set_field_everywhere(node, field, value):
        """Flip a knob on every nested tower config that carries it."""
        if dataclasses.is_dataclass(node):
            updates = {}
            for f in dataclasses.fields(node):
                v = getattr(node, f.name)
                if f.name == field:
                    updates[f.name] = value
                elif dataclasses.is_dataclass(v):
                    updates[f.name] = set_field_everywhere(v, field, value)
            if updates:
                return dataclasses.replace(node, **updates)
        return node

    if bool(_get(model_cfg, "use_grad_checkpoint",
                 _get(model_cfg, "use_remat", False))):
        # reference model yamls carry use_grad_checkpoint; map it onto
        # the towers' use_remat knob
        cfg = set_field_everywhere(cfg, "use_remat", True)
    if bool(_get(model_cfg, "kv_cache_int8", False)):
        cfg = set_field_everywhere(cfg, "kv_cache_int8", True)
    if bool(_get(model_cfg, "kv_cache_per_row", False)):
        # per-row decode frontiers: each batch row commits its own
        # accepted prefix under speculative decoding (models/kvcache.py)
        cfg = set_field_everywhere(cfg, "kv_cache_per_row", True)
    return arch, apply_dtype_policy(cfg, amp)


def _build_arch_config(model_cfg, arch, size, tiny, r_v, r_l, r_q, alpha):
    if arch == "blip2_t5_instruct":
        if tiny:
            cfg = Blip2T5InstructConfig(
                vit=EvaViTConfig.tiny(lora_rank=r_v, lora_alpha=alpha),
                qformer=QFormerConfig.tiny(lora_rank=r_q, lora_alpha=alpha),
                t5=T5Config.tiny(lora_rank=r_l, lora_alpha=alpha))
        else:
            t5 = (T5Config.flan_t5_xxl if "xxl" in size
                  else T5Config.flan_t5_xl)(lora_rank=r_l, lora_alpha=alpha)
            cfg = Blip2T5InstructConfig(
                vit=EvaViTConfig.eva_clip_g(lora_rank=r_v, lora_alpha=alpha),
                qformer=QFormerConfig(lora_rank=r_q, lora_alpha=alpha),
                t5=t5)
        return arch, cfg
    if arch == "blip2_vicuna_instruct":
        if tiny:
            cfg = Blip2VicunaInstructConfig(
                vit=EvaViTConfig.tiny(lora_rank=r_v, lora_alpha=alpha),
                qformer=QFormerConfig.tiny(lora_rank=r_q, lora_alpha=alpha),
                llm=LlamaConfig.tiny(lora_rank=r_l, lora_alpha=alpha))
        else:
            llm = (LlamaConfig.vicuna_13b if "13b" in size
                   else LlamaConfig.vicuna_7b)(lora_rank=r_l,
                                               lora_alpha=alpha)
            cfg = Blip2VicunaInstructConfig(
                vit=EvaViTConfig.eva_clip_g(lora_rank=r_v, lora_alpha=alpha),
                qformer=QFormerConfig(lora_rank=r_q, lora_alpha=alpha),
                llm=llm)
        return arch, cfg
    legacy = build_legacy_config(arch, size, tiny, model_cfg)
    if legacy is not None:
        return arch, legacy
    raise ValueError(f"unknown arch {arch!r}")


def build_legacy_config(arch: str, size: str, tiny: bool, model_cfg=None):
    """Config for the legacy LAVIS zoo archs (SURVEY §2.3 last row);
    returns None for unknown names."""
    from vlm_compression_tpu.models.albef import AlbefConfig
    from vlm_compression_tpu.models.alpro import AlproConfig
    from vlm_compression_tpu.models.blip1 import Blip1Config
    from vlm_compression_tpu.models.blip2_qformer import Blip2QformerConfig
    from vlm_compression_tpu.models.clip_model import ClipConfig
    from vlm_compression_tpu.models.gpt_dialogue import GPTDialogueConfig
    from vlm_compression_tpu.models.pnp_vqa import PNPVQAConfig
    from vlm_compression_tpu.models.t5 import T5Config
    from vlm_compression_tpu.models.t5_plain import PlainT5Config

    n_cls = int(_get(model_cfg, "num_classes", 2)) if model_cfg else 2
    if arch.startswith("blip_"):
        if tiny:
            return Blip1Config.tiny(num_classes=n_cls)
        return (Blip1Config.large(num_classes=n_cls) if "large" in size
                else Blip1Config.base(num_classes=n_cls))
    if arch.startswith("albef_"):
        return (AlbefConfig.tiny(num_classes=n_cls) if tiny
                else AlbefConfig.base(num_classes=n_cls))
    if arch in ("clip", "clip_feature_extractor"):
        return ClipConfig.tiny() if tiny else ClipConfig.base()
    if arch in ("eva_clip", "eva_clip_feature_extractor"):
        return ClipConfig.tiny_eva() if tiny else ClipConfig.eva_clip_g()
    if arch.startswith("alpro_"):
        return (AlproConfig.tiny(num_classes=n_cls) if tiny
                else AlproConfig.base(num_classes=n_cls))
    if arch == "gpt_dialogue":
        return (GPTDialogueConfig.tiny() if tiny
                else GPTDialogueConfig.base())
    if arch in ("pnp_vqa", "img2prompt_vqa"):
        return PNPVQAConfig.tiny() if tiny else PNPVQAConfig.base()
    if arch == "pnp_unifiedqav2_fid":
        return T5Config.tiny() if tiny else T5Config.flan_t5_xl()
    if arch == "t5":
        return (PlainT5Config.tiny() if tiny
                else PlainT5Config.flan_t5_xl())
    if arch in ("blip2", "blip2_feature_extractor",
                "blip2_image_text_matching"):
        return (Blip2QformerConfig.tiny() if tiny
                else Blip2QformerConfig())
    return None


def example_batch(arch: str, cfg, batch: int = 1):
    legacy = _legacy_example_batch(arch, cfg, batch)
    if legacy is not None:
        return legacy
    img = cfg.vit.img_size
    common = dict(
        image=jnp.zeros((batch, img, img, 3), jnp.float32),
        labels=jnp.ones((batch, 6), jnp.int32),
        qformer_input_ids=jnp.ones((batch, 6), jnp.int32),
        qformer_attention_mask=jnp.ones((batch, 6), jnp.int32),
    )
    if arch == "blip2_t5_instruct":
        common.update(input_ids=jnp.ones((batch, 8), jnp.int32),
                      attention_mask=jnp.ones((batch, 8), jnp.int32))
    else:
        common.update(text_input_ids=jnp.ones((batch, 8), jnp.int32),
                      text_attention_mask=jnp.ones((batch, 8), jnp.int32))
    return common


def _legacy_example_batch(arch: str, cfg, batch: int = 1):
    """Init-time inputs for the legacy zoo archs (None for the core
    instruct archs, which have their own layout above)."""
    ids = jnp.ones((batch, 8), jnp.int32)
    mask = jnp.ones((batch, 8), jnp.int32)
    lbl = jnp.ones((batch, 6), jnp.int32)

    def image(vitcfg):
        s = vitcfg.img_size
        return jnp.zeros((batch, s, s, 3), jnp.float32)

    if arch in ("blip_nlvr",):
        return dict(image0=image(cfg.vit), image1=image(cfg.vit),
                    input_ids=ids, attention_mask=mask,
                    labels=jnp.zeros((batch,), jnp.int32))
    if arch in ("albef_nlvr",):
        return dict(image0=image(cfg.vit), image1=image(cfg.vit),
                    input_ids=ids, attention_mask=mask,
                    labels=jnp.zeros((batch,), jnp.int32))
    if arch in ("blip_classification", "albef_classification"):
        return dict(image=image(cfg.vit), input_ids=ids,
                    attention_mask=mask,
                    labels=jnp.zeros((batch,), jnp.int32))
    if arch in ("blip_caption", "blip_vqa", "blip_pretrain", "albef_vqa"):
        return dict(image=image(cfg.vit), input_ids=ids,
                    attention_mask=mask, labels=ids)
    if arch == "albef_pretrain":
        return dict(image=image(cfg.vit), input_ids=ids,
                    attention_mask=mask, mlm_input_ids=ids, mlm_labels=ids)
    if arch in ("blip_feature_extractor", "albef_feature_extractor"):
        return dict(image=image(cfg.vit), input_ids=ids,
                    attention_mask=mask, extract_mode="all")
    if arch == "blip_image_text_matching":
        return dict(image=image(cfg.vit), input_ids=ids,
                    attention_mask=mask, match_head="all")
    if arch in ("blip_retrieval", "albef_retrieval"):
        return dict(image=image(cfg.vit), input_ids=ids,
                    attention_mask=mask)
    if arch in ("clip", "clip_feature_extractor"):
        return dict(image=image(cfg.vit), input_ids=ids)
    if arch in ("eva_clip", "eva_clip_feature_extractor"):
        return dict(image=image(cfg.eva), input_ids=ids)
    if arch.startswith("alpro_"):
        t = cfg.timesformer
        video = jnp.zeros((batch, t.num_frames, t.img_size, t.img_size, 3),
                          jnp.float32)
        out = dict(video=video, input_ids=ids, attention_mask=mask)
        if arch == "alpro_qa":
            out["labels"] = jnp.zeros((batch,), jnp.int32)
        return out
    if arch == "gpt_dialogue":
        return dict(input_ids=ids,
                    video_fts=jnp.zeros((batch, 2, cfg.len_video_ft),
                                        jnp.float32),
                    labels=ids)
    if arch in ("pnp_vqa", "img2prompt_vqa"):
        return dict(image=image(cfg.blip.vit), input_ids=ids,
                    attention_mask=mask, cap_ids=ids,
                    ctx_ids=jnp.ones((batch, 2, 8), jnp.int32),
                    ctx_mask=jnp.ones((batch, 2, 8), jnp.int32),
                    labels=lbl)
    if arch == "pnp_unifiedqav2_fid":
        return dict(ctx_ids=jnp.ones((batch, 2, 8), jnp.int32),
                    ctx_mask=jnp.ones((batch, 2, 8), jnp.int32),
                    labels=lbl)
    if arch == "t5":
        return dict(input_ids=ids, attention_mask=mask, labels=lbl)
    if arch in ("blip2", "blip2_feature_extractor",
                "blip2_image_text_matching"):
        if arch == "blip2_image_text_matching":
            return dict(image=image(cfg.vit), input_ids=ids,
                        attention_mask=mask, match_head="all")
        return dict(image=image(cfg.vit), text_ids=ids, text_mask=mask)
    return None


def build_model(model_cfg, seed: int = 0,
                pretrained_variables: Optional[dict] = None):
    """(module, variables).  Variables are loaded from
    ``pretrained_variables`` when given, else randomly initialized with
    all LoRA/mask collections present (init runs in sparse_lora mode)."""
    arch, cfg = build_model_config(model_cfg)
    if arch == "blip2_t5_instruct":
        model = Blip2T5Instruct(cfg)
    elif arch == "blip2_vicuna_instruct":
        model = Blip2VicunaInstruct(cfg)
    else:
        from vlm_compression_tpu.models import _ensure_zoo_imported
        from vlm_compression_tpu.common.registry import registry

        _ensure_zoo_imported()
        cls = registry.get_model_class(arch)
        if cls is None:
            raise ValueError(f"unknown arch {arch!r}")
        model = cls(cfg)
    if pretrained_variables is not None:
        return model, pretrained_variables
    batch = example_batch(arch, cfg)
    if arch in ("blip2_t5_instruct", "blip2_vicuna_instruct"):
        variables = dict(model.init(
            jax.random.key(seed), **batch, vit_mode="sparse_lora",
            llm_mode="sparse_lora", qformer_mode="sparse_lora"))
    else:
        variables = dict(model.init(jax.random.key(seed), **batch))
    return model, variables
