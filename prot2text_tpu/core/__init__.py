from .mesh import MeshConfig, make_mesh, local_mesh, shard_batch, replicate
from .dtypes import DTypePolicy, str2dtype, str2bool
from .partition import (
    PartitionRules, named_sharding, shard_params, param_partition_spec,
)
