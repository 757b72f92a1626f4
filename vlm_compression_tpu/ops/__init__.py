"""Device kernels and pure-functional compute primitives.

Layout convention: these ops work in **unit-major layout** ``(units, in)``
(= torch's ``weight`` layout, units = output features) because the pruning
math is defined per output unit.  Model kernels are stored ``(in, units)``
(Flax convention); pruners transpose at the boundary — mask computation is
once-per-layer so the transposes are free compared to calibration forwards.
"""

from vlm_compression_tpu.ops.stats import (  # noqa: F401
    CalibStats,
    init_calib_stats,
    update_calib_stats,
    finalize_hessian,
)
from vlm_compression_tpu.ops.masks import (  # noqa: F401
    wanda_metric,
    ria_metric,
    unstructured_mask,
    nm_structured_mask,
    transposable_nm_mask,
    mask_density,
)
from vlm_compression_tpu.ops.quant import (  # noqa: F401
    dequantize_params_tree,
    int8_matmul,
    int8_matmul_dynamic,
    int8_matmul_outlier,
    quantize_params_tree,
    quantize_weight,
    set_int8_outliers,
    use_dynamic_int8,
)
from vlm_compression_tpu.ops.autotune import (  # noqa: F401
    autotune_masked_matmul,
    tune_masked_matmul,
)
from vlm_compression_tpu.ops.sparsegpt import sparsegpt_prune  # noqa: F401
from vlm_compression_tpu.ops.dsnot import dsnot_refine_mask  # noqa: F401
from vlm_compression_tpu.ops.masked_linear import (  # noqa: F401
    masked_matmul,
    masked_matmul_packed,
    sparse_lora_matmul,
)
from vlm_compression_tpu.ops.bitmask import (  # noqa: F401
    pack_mask,
    pack_masks_tree,
    unpack_mask,
    unpack_masks_tree,
)
from vlm_compression_tpu.ops.gptq import (  # noqa: F401
    GPTQResult,
    gptq_dequantize,
    gptq_quantize,
    gptq_to_int4_params,
    gptq_quantize_batched,
    rtn_quantize,
)
from vlm_compression_tpu.ops.attention import (  # noqa: F401
    attention_core,
    mha_reference,
    use_flash_attention,
)
