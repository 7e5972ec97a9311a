from .mesh import (  # noqa: F401
    make_mesh,
    replicate_state,
    shard_batch,
    batch_sharding,
    replicated_sharding,
)
from .tp import shard_params_tp, shard_state_tp  # noqa: F401
