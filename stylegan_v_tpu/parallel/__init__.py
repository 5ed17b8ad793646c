from .mesh import create_mesh, data_sharding, replicated_sharding, shard_batch  # noqa: F401
