from .mesh import (  # noqa: F401
    make_mesh,
    replicate_state,
    shard_batch,
    batch_sharding,
    replicated_sharding,
)
from .multihost import (  # noqa: F401
    host_shard,
    local_merge,
    make_global_batch,
)
from .tp import shard_params_tp, shard_state_tp  # noqa: F401
