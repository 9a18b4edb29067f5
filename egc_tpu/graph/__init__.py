from egc_tpu.graph.structure import Graph, pad_graph, batch_np  # noqa: F401
from egc_tpu.graph.transforms import (  # noqa: F401
    coalesce_np,
    remove_self_loops_np,
    to_undirected_np,
    symnorm_weight,
    in_degree,
)
