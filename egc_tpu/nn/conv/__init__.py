from egc_tpu.nn.conv.egc import EGConv  # noqa: F401
from egc_tpu.nn.conv.simple import GCNConv, GINConv, SAGEConv  # noqa: F401
from egc_tpu.nn.conv.attention import GATConv, GATv2Conv  # noqa: F401
from egc_tpu.nn.conv.mpnn import MPNNConv  # noqa: F401
from egc_tpu.nn.conv.pna import PNAConv  # noqa: F401
