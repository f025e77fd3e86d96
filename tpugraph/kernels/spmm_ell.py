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

from tpugraph.kernels import vjp_util
from tpugraph.sparse.ell import EllMatrix, EllOperator


def _ell_apply(m: EllMatrix, x: jax.Array) -> jax.Array:
    """A @ x via bucketed gather + dense reduce; output in natural row order.
    bf16 inputs gather in bf16 but accumulate in fp32, then cast back.

    A trailing all-zero row is always appended to the bucket concat; rows
    with degree 0 (and any padded bucket rows — buckets may be padded to
    common sizes for the stacked/sharded case) resolve through row_order to
    zero without a dedicated zeros block."""
    # jnp.take CLAMPS out-of-range ids, so a mis-sized x would be silently
    # clamp-gathered into wrong numbers — fail at trace time instead
    # (round-4b kernels review; n_cols is None only for hand-built matrices)
    assert m.n_cols is None or x.shape[0] == m.n_cols, (
        f"spmm_ell: x has {x.shape[0]} rows but the operator expects "
        f"{m.n_cols}")
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
    """A @ x, scatter-free in fwd AND bwd.

    Gradient contract: the OPERATOR is a constant — ``op``'s weight/diag
    leaves receive cotangent **zero** (kernels/vjp_util.py rationale);
    learnable edge weights need ``spmm_xla``.  Numerics contract: ELL pad
    slots read row 0 of x with weight 0.0 — a NON-FINITE x[0] therefore
    poisons every under-cap padded row (0·NaN = NaN), unlike the sorted
    path whose pad edges drain to a sliced-off dump row.  Features must be
    finite (they always are in training; NaN-probing debuggers should use
    impl='sorted')."""
    return _apply_with_diag(op.fwd, op.diag, x)


def _fwd(op, x):
    # x_tok: VMA-type carrier — see kernels/vjp_util.py for the rationale
    # (the round-2 schedule-dependent dryrun failure, VERDICT.md weak #3)
    return _apply_with_diag(op.fwd, op.diag, x), (op, vjp_util.vma_token(x))


def _bwd(res, g):
    op, x_tok = res
    # the diagonal is symmetric, so Aᵀ = Bᵀ + diag with the same vector
    dx = _apply_with_diag(op.bwd, op.diag, g)
    dx = vjp_util.add_token(dx, x_tok)
    zero_op = jax.tree_util.tree_map(vjp_util.zero_cotangent, op)
    return zero_op, dx


spmm_ell.defvjp(_fwd, _bwd)
