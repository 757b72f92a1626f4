from vlm_compression_tpu.compression.pruners.base import (  # noqa: F401
    BasePruner,
    DictSparsity,
    FlaxModel,
    LayerWisePrunerBase,
    UniformSparsity,
    convert_spec_to_list,
)
from vlm_compression_tpu.compression.pruners import towers  # noqa: F401
from vlm_compression_tpu.compression.pruners import global_pruner  # noqa: F401
from vlm_compression_tpu.compression.pruners.global_pruner import (  # noqa: F401
    BlipT5AObdPruner,
    BlipT5GlobalPruner,
    BlipT5MagPruner,
    BlipT5MezoPruner,
    BlipT5RandPruner,
)
from vlm_compression_tpu.compression.pruners.towers import (  # noqa: F401
    BlipT5DSnoTPruner,
    BlipT5SparseGPTPruner,
    BlipT5WandaPruner,
    T5DSnoTPruner,
    T5SparseGPTPruner,
    T5WandaPruner,
    ViTDSnoTPruner,
    ViTSparseGPTPruner,
    ViTWandaPruner,
)
