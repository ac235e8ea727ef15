"""Device meshes, sharding rules, multi-host initialization."""

from planar_optical_flow_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    initialize_distributed,
)
