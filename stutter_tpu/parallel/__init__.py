from stutter_tpu.parallel.mesh import (
    MeshPlan,
    make_mesh,
    shard_batch,
    replicate,
)
