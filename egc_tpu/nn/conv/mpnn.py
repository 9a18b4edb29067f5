"""Towered MPNN baseline (reference ``experiments/layers.py:231-267``).

Per tower t: message_ij = Linear_t([x_i_t || x_j_t]); aggregate (sum or max)
at the receiver; update_i = Linear_t([agg_i_t || x_init_i_t]); then one final
Linear across the concatenated towers. No self-loops. Requires
in_dim == out_dim (as in all reference call sites: hidden -> hidden).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from egc_tpu.graph.structure import Graph
from egc_tpu.nn import init as einit
from egc_tpu.ops import segment_sum, segment_max


class MPNNConv(nn.Module):
    out_channels: int
    aggr: str = "sum"            # "sum" | "max"
    towers: int = 4

    @nn.compact
    def __call__(self, g: Graph, x, *, train: bool = False):
        n, T = x.shape[0], self.towers
        in_dim, out_dim = x.shape[-1], self.out_channels
        if in_dim % T or out_dim % T:
            raise ValueError("in/out dims must divide towers")
        it, ot = in_dim // T, out_dim // T

        xt = x.reshape(n, T, it)
        x_i = jnp.take(xt, g.receivers, axis=0)   # [E, T, it]
        x_j = jnp.take(xt, g.senders, axis=0)
        h = jnp.concatenate([x_i, x_j], axis=-1)  # [E, T, 2*it]

        # Per-tower message Linear: batched as a single einsum over towers.
        wm = self.param("msg_kernel", einit.torch_linear_kernel, (T, 2 * it, ot))
        bm = self.param("msg_bias", einit.torch_linear_bias(2 * it), (T, ot))
        msg = jnp.einsum("etf,tfo->eto", h, wm) + bm

        if self.aggr in ("sum", "add"):
            agg = segment_sum(msg.reshape(-1, T * ot), g.receivers, n,
                              mask=g.edge_mask, indices_are_sorted=True)
        elif self.aggr == "max":
            agg = segment_max(msg.reshape(-1, T * ot), g.receivers, n,
                              mask=g.edge_mask, indices_are_sorted=True)
        else:
            raise ValueError(f"unsupported MPNN aggr {self.aggr!r}")
        agg = agg.reshape(n, T, ot)

        upd_in = jnp.concatenate([agg, xt], axis=-1)  # [N, T, ot+it]
        wu = self.param("upd_kernel", einit.torch_linear_kernel,
                        (T, ot + it, ot))
        bu = self.param("upd_bias", einit.torch_linear_bias(ot + it), (T, ot))
        upd = jnp.einsum("ntf,tfo->nto", upd_in, wu) + bu

        fan_in = out_dim
        return nn.Dense(out_dim, kernel_init=einit.torch_linear_kernel,
                        bias_init=einit.torch_linear_bias(fan_in),
                        name="lin")(upd.reshape(n, out_dim))
