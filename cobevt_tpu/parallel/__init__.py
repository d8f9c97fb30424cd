from cobevt_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_sharding,
    tensor_parallel_spec,
    shard_batch,
    cooperative_batch_sharding,
    replicated,
)
from cobevt_tpu.parallel.distributed import (
    ClusterSpec,
    detect_cluster,
    maybe_initialize_distributed,
)
from cobevt_tpu.parallel.multihost import (
    global_batch_from_local,
    replicate_to_mesh,
)
