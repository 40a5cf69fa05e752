from open_pandora_tpu.parallel.mesh import (
    MeshSpec,
    build_mesh,
    data_sharding,
    replicated,
    shard_batch,
    zero2_param_spec,
    zero2_opt_spec,
)
