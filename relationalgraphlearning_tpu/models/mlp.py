"""MLP helper.

Reference parity: ``crowd_nav/policy/helpers.py::mlp(input_dim, mlp_dims,
last_relu=False)`` building an ``nn.Sequential`` of Linear+ReLU (SURVEY.md
§2.2). Flax infers the input dim, so only the output dims list is needed.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class MLP(nn.Module):
    """Linear/ReLU stack: ReLU after every layer except (optionally) the last.

    Matmuls accumulate in float32 on the MXU regardless of param dtype.
    """

    dims: Sequence[int]
    last_relu: bool = False
    dtype: jnp.dtype | None = None  # activation dtype (None = infer)

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.Dense(d, dtype=self.dtype, name=f"dense_{i}")(x)
            if i < len(self.dims) - 1 or self.last_relu:
                x = nn.relu(x)
        return x


def mlp_dims_with_input(input_dim: int, dims: Sequence[int]) -> Sequence[int]:
    """Kept for parity with the reference signature where the input dim is
    explicit; flax does shape inference so this is the identity on ``dims``."""
    del input_dim
    return dims
