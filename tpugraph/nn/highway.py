"""Highway gate layer (HGCN/RDGCN-style; SURVEY.md §2.1 "Highway gate layer").

h' = T ⊙ h + (1 − T) ⊙ x,  T = σ(x @ W_T + b_T)

Stabilizes deep/weighted GCN stacks by letting each entity interpolate
between its pre- and post-aggregation representation.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class Highway(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        w = self.param("w", nn.initializers.xavier_uniform(), (dim, dim))
        b = self.param("b", nn.initializers.zeros, (dim,))
        t = nn.sigmoid(x @ w.astype(x.dtype) + b.astype(x.dtype))
        return t * h + (1.0 - t) * x
