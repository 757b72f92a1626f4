"""Flax model towers + compositions.

Every compute-bearing linear is a `SparseLinear` (models/layers.py) carrying
a prune mask in the ``masks`` collection and optional LoRA factors in the
``lora`` collection.  Forwards take a static ``mode`` switch:

  mode="dense"        teacher path — masks AND adapters bypassed
                      (reference `dense=True` flag threading,
                      e.g. modeling_t5.py:306-341, eva_vit.py:54-70)
  mode="masked"       pruned model, no adapters
  mode="sparse_lora"  (W + BA·α/r)⊙M — SparseLoRA (lora.py:364-369)
  mode="lora"         W⊙M + BA·α/r — ablation (mask on base only)
"""

from vlm_compression_tpu.models.layers import SparseLinear, Mode  # noqa: F401
from vlm_compression_tpu.models.eva_vit import EvaViT, EvaViTConfig  # noqa: F401,E402
from vlm_compression_tpu.models.qformer import QFormer, QFormerConfig  # noqa: F401,E402
from vlm_compression_tpu.models.t5 import (  # noqa: F401,E402
    T5Config,
    T5ForConditionalGeneration,
)
from vlm_compression_tpu.models.llama import (  # noqa: F401,E402
    LlamaConfig,
    LlamaForCausalLM,
)
from vlm_compression_tpu.models.blip2_t5_instruct import (  # noqa: F401,E402
    Blip2T5Instruct,
    Blip2T5InstructConfig,
)
from vlm_compression_tpu.models.blip2_vicuna_instruct import (  # noqa: F401,E402
    Blip2VicunaInstruct,
    Blip2VicunaInstructConfig,
    generate_vicuna,
)
from vlm_compression_tpu.models.opt import OPTConfig, OPTForCausalLM  # noqa: F401,E402
from vlm_compression_tpu.models.blip2_opt import Blip2OPT, Blip2OPTConfig  # noqa: F401,E402
from vlm_compression_tpu.models.blip2_qformer import (  # noqa: F401,E402
    Blip2Qformer,
    Blip2QformerConfig,
)


def _ensure_zoo_imported():
    """Import the legacy LAVIS zoo modules so their registry decorators
    fire (lazy: the RESSA path never pays their import cost)."""
    import vlm_compression_tpu.models.albef  # noqa: F401
    import vlm_compression_tpu.models.alpro  # noqa: F401
    import vlm_compression_tpu.models.blip1  # noqa: F401
    import vlm_compression_tpu.models.clip_model  # noqa: F401
    import vlm_compression_tpu.models.gpt_dialogue  # noqa: F401
    import vlm_compression_tpu.models.pnp_vqa  # noqa: F401
    import vlm_compression_tpu.models.t5_plain  # noqa: F401


# a registry miss on a model name (e.g. a zoo arch out of a project yaml)
# triggers the zoo import and retries — config-first zoo runs resolve
# without every caller knowing about the lazy import
from vlm_compression_tpu.common.registry import registry as _registry  # noqa: E402

_registry.register_lazy("model", _ensure_zoo_imported)


def load_model(name: str, model_type: str = "flant5xl", is_eval: bool = False,
               checkpoint: str = None, tiny: bool = False, seed: int = 0):
    """(module, variables) by registry name — counterpart of
    ``lavis.models.load_model`` (models/__init__.py:271 area)."""
    from vlm_compression_tpu.models.factory import build_model

    pretrained = None
    if checkpoint:
        import os

        import orbax.checkpoint as ocp

        pretrained = ocp.StandardCheckpointer().restore(
            os.path.abspath(checkpoint))
    return build_model({"arch": name, "model_type": model_type,
                        "tiny": tiny}, seed=seed,
                       pretrained_variables=pretrained)


def load_model_and_preprocess(name: str, model_type: str = "flant5xl",
                              is_eval: bool = False, **kw):
    """(module, variables, vis_processors, txt_processors) — counterpart of
    ``lavis.models.load_model_and_preprocess``."""
    from vlm_compression_tpu.datasets.processors import load_processor

    module, variables = load_model(name, model_type, is_eval, **kw)
    c = module.cfg
    vit = (getattr(c, "vit", None) or getattr(c, "eva", None)
           or getattr(getattr(c, "blip", None), "vit", None)
           or getattr(c, "timesformer", None))
    img = vit.img_size if vit is not None else 224
    vis = {"train": load_processor("blip2_image_train",
                                   {"image_size": img}),
           "eval": load_processor("blip_image_eval", {"image_size": img})}
    txt = {"train": load_processor("blip_caption"),
           "eval": load_processor("blip_caption")}
    return module, variables, vis, txt
