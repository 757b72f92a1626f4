"""SparseLinear — the one linear every tower is built from.

TPU-native replacement for the reference's vendored-PEFT ``lora.Linear``
with its ``mask`` buffer and ``dense``/``sparse`` runtime flags
(lavis/peft/src/peft/tuners/lora.py:289-394).  Differences by design:

  * the mask is a bool array in the ``masks`` variable collection (pytree),
    not a module buffer — pruners rewrite the collection functionally;
  * LoRA factors live in the ``lora`` collection; zero-rank layers simply
    don't have them;
  * the forward mode is a static argument, so teacher (dense) and student
    (sparse) paths are two jit specializations of the same function rather
    than per-module boolean threading;
  * calibration capture: when the ``calib`` collection is marked mutable,
    the layer sows its input activations for the calibration engine —
    replacing the reference's forward hooks + Catcher exception trick
    (wanda_pruner.py:238-268).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from vlm_compression_tpu.ops.masked_linear import (
    lora_matmul_ref,
    masked_matmul,
    masked_matmul_packed,
    sparse_lora_matmul,
)

# forward modes
Mode = str
DENSE = "dense"
MASKED = "masked"
SPARSE_LORA = "sparse_lora"
LORA = "lora"
_MODES = (DENSE, MASKED, SPARSE_LORA, LORA)


class SparseLinear(nn.Module):
    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None        # compute dtype (None: infer)
    param_dtype: jnp.dtype = jnp.float32
    lora_rank: int = 0
    lora_alpha: float = 16.0
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, mode: Mode = MASKED):
        if mode not in _MODES:
            raise ValueError(f"mode {mode!r} not in {_MODES}")
        in_features = x.shape[-1]
        # int4 nibble-packed kernel (ops/quant.quantize_params_tree_int4):
        # lives under its OWN name — the packed (in/2, out) shape would
        # fail flax's param-shape validation against the float kernel
        if self.has_variable("params", "kernel_q4"):
            kernel = self.get_variable("params", "kernel_q4")
        else:
            kernel = self.param(
                "kernel", self.kernel_init, (in_features, self.features),
                self.param_dtype)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
            if self.use_bias else None
        )

        # calibration capture: engine runs apply(..., mutable=["calib"])
        if self.is_mutable_collection("calib"):
            self.sow("calib", "input", x)

        dtype = self.dtype or x.dtype
        x = x.astype(dtype)

        # int8-quantized kernel (ops/quant.quantize_params_tree — the
        # TPU-native counterpart of the reference's bitsandbytes
        # Linear8bitLt): int8 weights hit the MXU directly, the
        # per-output-channel scale multiplies the OUTPUT; LoRA modes
        # dequantize once since adapters operate in float.
        qscale = None
        q4scale = None
        if kernel.dtype == jnp.int8:
            qscale = self.get_variable("params", "kernel_scale")
            if self.lora_rank > 0 and mode in (SPARSE_LORA, LORA):
                from vlm_compression_tpu.ops.quant import dequantize_weight

                kernel = dequantize_weight(kernel, qscale, dtype)
                qscale = None
        elif kernel.dtype == jnp.uint8:
            # nibble-packed int4 (kernel_q4) with grouped 2-D scales
            q4scale = self.get_variable("params", "kernel_scale")
            if self.lora_rank > 0 and mode in (SPARSE_LORA, LORA):
                from vlm_compression_tpu.ops.quant import (
                    dequantize_weight_int4,
                )

                kernel = dequantize_weight_int4(kernel, q4scale, dtype)
                q4scale = None
        k = (kernel.astype(dtype)
             if kernel.dtype not in (jnp.int8, jnp.uint8) else kernel)

        if mode == DENSE:
            if qscale is not None:
                from vlm_compression_tpu.ops import quant as Q

                y = Q.select_int8_matmul()(x, kernel, qscale)
            elif q4scale is not None:
                from vlm_compression_tpu.ops import quant as Q

                y = Q.int4_matmul(x, kernel, q4scale)
            else:
                y = x @ k
        else:
            # the mask is OPTIONAL: a model initialized/applied without a
            # masks collection (or whose collection lacks this layer) runs
            # un-masked — an all-True bool the size of the kernel would
            # otherwise cost half the parameter memory again on XL towers
            if (self.has_variable("masks", "mask")
                    or self.is_mutable_collection("masks")):
                mask = self.variable(
                    "masks", "mask",
                    lambda: jnp.ones((in_features, self.features),
                                     bool)).value
            else:
                mask = None
            # bit-packed masks (ops/bitmask.pack_masks_tree): uint32 words,
            # 32 rows each — expanded per-tile in VMEM on the masked path,
            # unpacked once for the LoRA paths
            packed = mask is not None and mask.dtype == jnp.uint32
            if mode == MASKED or self.lora_rank == 0:
                if qscale is not None:
                    from vlm_compression_tpu.ops import quant as Q

                    y = Q.select_int8_matmul()(x, kernel, qscale, mask)
                elif q4scale is not None:
                    from vlm_compression_tpu.ops import quant as Q

                    y = Q.int4_matmul(x, kernel, q4scale, mask)
                elif mask is None:
                    y = x @ k
                elif packed:
                    y = masked_matmul_packed(x, k, mask)
                else:
                    y = masked_matmul(x, k, mask)
            else:
                scale = self.lora_alpha / self.lora_rank

                # reference init: A kaiming-uniform, B zeros (lora.py resets);
                # B=0 makes the adapter a no-op at step 0.
                def _init_a():
                    if self.has_rng("params"):
                        return nn.initializers.he_uniform()(
                            self.make_rng("params"),
                            (in_features, self.lora_rank), self.param_dtype)
                    return jnp.zeros((in_features, self.lora_rank),
                                     self.param_dtype)

                lora_a = self.variable("lora", "lora_a", _init_a).value
                lora_b = self.variable(
                    "lora", "lora_b",
                    lambda: jnp.zeros((self.lora_rank, self.features),
                                      self.param_dtype)).value
                a = lora_a.astype(dtype)
                b = lora_b.astype(dtype)
                if packed:
                    from vlm_compression_tpu.ops.bitmask import unpack_mask
                    from vlm_compression_tpu.ops.masked_linear import (
                        infer_pack_group,
                    )

                    mask = unpack_mask(
                        mask, in_features,
                        infer_pack_group(in_features, mask.shape[0]))
                if mask is None:
                    z = (x @ a) @ b
                    y = x @ k + (scale * z.astype(jnp.float32)).astype(dtype)
                elif mode == SPARSE_LORA:
                    y = sparse_lora_matmul(x, k, mask, a, b, scale)
                else:
                    y = lora_matmul_ref(x, k, mask, a, b, scale)

        if bias is not None:
            y = y + bias.astype(dtype)
        return y
