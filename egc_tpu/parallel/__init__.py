from egc_tpu.parallel.mesh import make_mesh, device_count  # noqa: F401
from egc_tpu.parallel.dp import (  # noqa: F401
    stack_microbatches, make_dp_train_step,
)
from egc_tpu.parallel.partition import partition_graph, PartitionPlan  # noqa: F401
from egc_tpu.parallel.halo import (  # noqa: F401
    halo_refresh, DistributedNodeClassifier, make_partitioned_train_step,
    init_partitioned, make_partitioned_eval_step,
)
