from gritlm_tpu.parallel.mesh import MeshConfig, make_mesh  # noqa: F401
from gritlm_tpu.parallel.sharding import (  # noqa: F401
    batch_sharding,
    param_partition_specs,
    shard_params,
)
