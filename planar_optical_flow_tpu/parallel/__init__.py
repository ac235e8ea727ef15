"""Device meshes, sharding rules, multi-host initialization."""

from planar_optical_flow_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_mesh_from_config,
    make_hybrid_mesh,
    default_partition_rule,
    state_shardings,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    replicate_batch,
    initialize_distributed,
)
from planar_optical_flow_tpu.parallel.context_parallel import (  # noqa: F401
    gate_step_context_parallel,
)
from planar_optical_flow_tpu.parallel.pipeline_parallel import (  # noqa: F401
    pipeline_apply,
    drow_pipeline_stages,
    drow_pipeline_train_stages,
    flow_unet_pipeline_stages,
)
