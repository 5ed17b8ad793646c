from .mesh import (  # noqa: F401
    constrain_data_axis,
    create_mesh,
    data_sharding,
    initialize_multihost,
    replicated_sharding,
    shard_batch,
)
from .sharded_eval import sharded_generate_frames  # noqa: F401
from .zero import (  # noqa: F401
    opt_state_bytes_per_device,
    zero1_state_sharding,
)
