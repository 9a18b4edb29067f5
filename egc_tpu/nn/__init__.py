from egc_tpu.nn import init  # noqa: F401
from egc_tpu.nn.norm import MaskedBatchNorm  # noqa: F401
from egc_tpu.nn.mlp import MLP  # noqa: F401
from egc_tpu.nn.pool import (  # noqa: F401
    global_mean_pool, global_add_pool, global_max_pool, get_pool,
)
from egc_tpu.nn.conv import (  # noqa: F401
    EGConv, GCNConv, GATConv, GATv2Conv, GINConv, SAGEConv, MPNNConv, PNAConv,
)
