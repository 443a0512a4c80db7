from relationalgraphlearning_tpu.parallel.mesh import make_mesh
from relationalgraphlearning_tpu.parallel.sharding import (
    shard_batch,
    shard_params,
    make_parallel_train_step,
)
