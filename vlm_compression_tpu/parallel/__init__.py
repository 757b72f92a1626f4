from vlm_compression_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    make_mesh,
    shard_params,
    param_partition_spec,
)
from vlm_compression_tpu.parallel.pipeline import (  # noqa: F401
    make_pipeline_fn,
    pipeline_apply,
    shard_stages,
    split_stages,
    stack_layer_params,
)
