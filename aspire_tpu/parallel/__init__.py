"""Multi-chip/multi-host parallelism over the particle axis."""

from .mesh import (  # noqa: F401
    get_mesh,
    initialize_distributed,
    make_mesh,
    particle_sharding,
    replicated_sharding,
    shard_particles,
)
