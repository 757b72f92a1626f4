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
