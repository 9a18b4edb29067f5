"""Parameter initializers matching the reference's PyTorch defaults.

The reference trains with torch/PyG default inits; hyperparameters were tuned
under those training dynamics, so we reproduce the *distributions* (not the
bit-exact streams):

- ``torch.nn.Linear``: kaiming_uniform(a=sqrt(5)) on the kernel ==
  U(-1/sqrt(fan_in), +1/sqrt(fan_in)); bias U(-1/sqrt(fan_in), +1/sqrt(fan_in)).
- PyG ``glorot`` (reference ``experiments/layers.py:82-87``): xavier-uniform,
  U(±sqrt(6/(fan_in+fan_out))).
- ``torch.nn.Embedding``: N(0, 1).
- ``torch.nn.BatchNorm1d``: scale=1, bias=0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """U(±1/sqrt(fan_in)) for a [..., fan_in, fan_out] kernel.

    Leading axes (e.g. MPNN/PNA towers) are batch dimensions: the reference
    uses one torch.nn.Linear per tower, so fan_in is the second-to-last
    axis, not the product of leading axes.
    """
    fan_in = shape[-2] if len(shape) >= 2 else shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias(fan_in: int):
    """Bias init closure: torch uses U(±1/sqrt(fan_in)) for Linear bias."""
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def glorot_uniform(key, shape, dtype=jnp.float32):
    """PyG glorot: xavier-uniform over the last two axes."""
    fan_in, fan_out = shape[-2], shape[-1]
    bound = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def glorot_per_base(num_bases: int):
    """Glorot applied per-basis to a fused [fan_in, B*L] kernel.

    The paper layer initializes each basis matrix [in, L] independently
    (reference ``experiments/layers.py:84-85``), so the bound uses L, not B*L.
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in, bl = shape
        L = bl // num_bases
        bound = (6.0 / (fan_in + L)) ** 0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_embedding(key, shape, dtype=jnp.float32):
    """torch.nn.Embedding default: N(0, 1)."""
    return jax.random.normal(key, shape, dtype)
