"""Multi-chip parallelism: device meshes, shardings, distributed init."""

from tame.parallel.distributed import (
    global_mesh,
    initialize_distributed,
    measure_scaling_efficiency,
    measure_weak_scaling,
)
from tame.parallel.mesh import (
    auto_mesh,
    chain_sharding,
    cov_sharding,
    make_mesh,
    obs_sharding,
    replicated,
    shard_fit_inputs,
    shard_smoothed_inputs,
    state_sharding,
)

__all__ = [
    "auto_mesh",
    "chain_sharding",
    "global_mesh",
    "initialize_distributed",
    "measure_scaling_efficiency",
    "measure_weak_scaling",
    "cov_sharding",
    "make_mesh",
    "obs_sharding",
    "replicated",
    "shard_fit_inputs",
    "shard_smoothed_inputs",
    "state_sharding",
]
