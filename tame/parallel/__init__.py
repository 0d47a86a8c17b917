"""Multi-chip parallelism: device meshes, shardings, distributed init."""

from tame.parallel.mesh import (
    auto_mesh,
    cov_sharding,
    make_mesh,
    obs_sharding,
    replicated,
    shard_fit_inputs,
    state_sharding,
)

__all__ = [
    "auto_mesh",
    "cov_sharding",
    "make_mesh",
    "obs_sharding",
    "replicated",
    "shard_fit_inputs",
    "state_sharding",
]
