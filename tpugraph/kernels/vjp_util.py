"""Shared custom-VJP plumbing for the SpMM kernels.

Both SpMM custom VJPs (kernels/spmm.py, kernels/spmm_ell.py) need the same
two subtle pieces; they were previously duplicated verbatim, which is
exactly how a fix lands on one path and not the other (round-4b kernels
review):

* ``zero_cotangent`` — operator leaves get a structural zero cotangent
  (float0 for integer index arrays).  NOTE the semantic contract this
  encodes: the custom-VJP paths treat the OPERATOR AS A CONSTANT — edge
  weights/diag receive gradient **zero**, silently.  That is correct for
  this family (weights are precomputed funifun/degree statistics, never
  parameters); a caller that makes adjacency weights learnable must use
  ``spmm_xla`` (plain XLA autodiff differentiates through the weights).

* ``vma_token`` / ``add_token`` — the (1, 1) zero slice of the primal
  input, carried through the residuals ONLY for its varying-manual-axes
  (shard_map VMA) type.  Under a multi-axis mesh the primal x can vary
  over MORE mesh axes than (op, g) do, and a custom-VJP bwd must return dx
  with exactly the primal's varying axes; deriving them from (op, g) alone
  made the match schedule-dependent (the round-2 driver dryrun heisenbug).
  Broadcasting the token into dx is a value no-op that pins the union
  structurally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def zero_cotangent(leaf):
    """Structural zero cotangent for an operator leaf (float0 for ints)."""
    if jnp.issubdtype(leaf.dtype, jnp.integer):
        return np.zeros(leaf.shape, dtype=jax.dtypes.float0)
    return jnp.zeros_like(leaf)


def vma_token(x: jax.Array) -> jax.Array:
    """(1, 1) zero slice of the primal — VMA-type carrier (see module doc)."""
    return jax.lax.slice(x, (0, 0), (1, 1)) * 0


def add_token(dx: jax.Array, tok: jax.Array) -> jax.Array:
    """Value no-op broadcast-add: unions dx's varying axes with the primal's
    (jax inserts the pvary on the less-varying operand)."""
    return dx + tok.astype(dx.dtype)
