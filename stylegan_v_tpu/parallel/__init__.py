from .mesh import (  # noqa: F401
    create_mesh,
    data_sharding,
    initialize_multihost,
    replicated_sharding,
    shard_batch,
)
