from vlm_compression_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    make_mesh,
    shard_params,
    param_partition_spec,
)
