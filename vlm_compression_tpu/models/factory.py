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
    raise ValueError(f"unknown arch {arch!r}")


def example_batch(arch: str, cfg, batch: int = 1):
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


def build_model(model_cfg, seed: int = 0,
                pretrained_variables: Optional[dict] = None):
    """(module, variables).  Variables are loaded from
    ``pretrained_variables`` when given, else randomly initialized with
    all LoRA/mask collections present (init runs in sparse_lora mode)."""
    arch, cfg = build_model_config(model_cfg)
    model = (Blip2T5Instruct(cfg) if arch == "blip2_t5_instruct"
             else Blip2VicunaInstruct(cfg))
    if pretrained_variables is not None:
        return model, pretrained_variables
    batch = example_batch(arch, cfg)
    variables = dict(model.init(
        jax.random.key(seed), **batch, vit_mode="sparse_lora",
        llm_mode="sparse_lora", qformer_mode="sparse_lora"))
    return model, variables
