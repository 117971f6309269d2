from fermiflow_tpu.parallel.mesh import (
    make_walker_mesh,
    walker_sharding,
    replicated_sharding,
    shard_walkers,
    init_distributed,
)

__all__ = [
    "make_walker_mesh",
    "walker_sharding",
    "replicated_sharding",
    "shard_walkers",
    "init_distributed",
]
