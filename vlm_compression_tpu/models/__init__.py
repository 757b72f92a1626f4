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
