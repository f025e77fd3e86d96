"""Scatter-free ELL SpMM (the fast TPU path; see sparse/ell.py rationale).

out[row] = Σ_k w[row, k] · x[idx[row, k]] per degree bucket — gathers, a
multiply, and a dense K-axis reduction that XLA fuses with the gather; the
only random memory traffic is the intrinsic per-edge source-row read.
Backward uses the pre-built transpose ELL, so dx = Aᵀ g has the identical
structure (SURVEY.md §7 hard part 2: no random scatter anywhere).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpugraph.sparse.ell import EllMatrix, EllOperator


def _ell_apply(m: EllMatrix, x: jax.Array) -> jax.Array:
    """A @ x via bucketed gather + dense reduce; output in natural row order.
    bf16 inputs gather in bf16 but accumulate in fp32, then cast back.

    A trailing all-zero row is always appended to the bucket concat; rows
    with degree 0 (and any padded bucket rows — buckets may be padded to
    common sizes for the stacked/sharded case) resolve through row_order to
    zero without a dedicated zeros block."""
    outs = []
    for b in m.buckets:
        g = jnp.take(x, b.idx.reshape(-1), axis=0)  # (R*K, d) — the hot gather
        g = g.reshape(b.idx.shape[0], b.k, x.shape[-1])
        acc = jnp.einsum("rk,rkd->rd", b.w, g, preferred_element_type=jnp.float32)
        outs.append(acc.astype(x.dtype))
    outs.append(jnp.zeros((1, x.shape[-1]), x.dtype))
    stacked = jnp.concatenate(outs, axis=0)
    return jnp.take(stacked, m.row_order, axis=0)


def _apply_with_diag(m: EllMatrix, diag, x: jax.Array) -> jax.Array:
    """ELL part + gather-free diagonal part (see EllOperator.diag).  The
    diagonal multiply accumulates in fp32 like the ELL einsum does."""
    y = _ell_apply(m, x)
    if diag is not None:
        y = y + (diag[:, None] * x.astype(jnp.float32)).astype(x.dtype)
    return y


@jax.custom_vjp
def spmm_ell(op: EllOperator, x: jax.Array) -> jax.Array:
    return _apply_with_diag(op.fwd, op.diag, x)


def _fwd(op, x):
    # x_tok: a (1, 1) zero slice of the primal input, carried through the
    # residuals ONLY for its varying-manual-axes (shard_map VMA) type.  Under
    # a multi-axis mesh (e.g. 3-D slice×graph×feature, dist/trainer.py) the
    # primal x can vary over MORE mesh axes than (op, g) do — e.g. a
    # feature-invariant cotangent flowing back through the l2-normalize psum
    # transpose — and a custom-VJP bwd must return dx with exactly the
    # primal's varying axes.  Deriving dx's axes from (op, g) alone made that
    # match schedule-dependent (the round-2 driver dryrun failure,
    # VERDICT.md weak #3); unioning the token pins it structurally.
    x_tok = jax.lax.slice(x, (0, 0), (1, 1)) * 0
    return _apply_with_diag(op.fwd, op.diag, x), (op, x_tok)


def _bwd(res, g):
    op, x_tok = res
    # the diagonal is symmetric, so Aᵀ = Bᵀ + diag with the same vector
    dx = _apply_with_diag(op.bwd, op.diag, g)
    # broadcast-add of the zero token: value no-op, VMA union with the
    # primal's axes (jax inserts the pvary on the less-varying operand)
    dx = dx + x_tok.astype(dx.dtype)
    zero_op = jax.tree_util.tree_map(_zero_cot, op)
    return zero_op, dx


def _zero_cot(leaf):
    import numpy as np

    if jnp.issubdtype(leaf.dtype, jnp.integer):
        return np.zeros(leaf.shape, dtype=jax.dtypes.float0)
    return jnp.zeros_like(leaf)


spmm_ell.defvjp(_fwd, _bwd)
