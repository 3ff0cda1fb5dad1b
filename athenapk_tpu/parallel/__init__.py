from .mesh_sharding import make_block_sharding, shard_state  # noqa: F401
