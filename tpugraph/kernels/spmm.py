"""Sparse (adjacency) × dense (features) matmul — the framework's hot op.

Replaces the reference family's ``torch.spmm(adj, support)`` inside
``layers.py GraphConvolution`` (reference unverifiable — mount empty,
SURVEY.md §0; named in BASELINE.json north_star) with TPU-native paths:

* ``spmm_xla``   — gather + sorted ``segment_sum``; pure XLA, runs anywhere.
* ``spmm``       — same forward, but with a custom VJP that computes
                   dx = Aᵀ @ g via the operator's pre-sorted transpose edge
                   list, so the backward pass is also a contiguous
                   sorted-segment reduction instead of XLA's generic
                   scatter-add over random source ids.

Cost model (SURVEY.md §6): O(nnz·d) flops, gather-bound; with edges sorted
by destination the segment reduction is contiguous and the only random
traffic is the per-edge source-row gather, which is intrinsic to SpMM.

Faster impls swap in via the ``impl`` argument of the nn layers (the ELL
path, kernels/spmm_ell.py, is the production default); this module is the
permanent fallback (SURVEY.md §7 hard part 3).  A Pallas SpMM was measured
and rejected twice — estimates in round 1, a real fused GCN-layer kernel in
round 2 (kernels/gcn_fused_pallas.py, docs/DESIGN.md §3 entry 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpugraph.kernels import vjp_util
from tpugraph.sparse.graph import PaddedEdges, SpMMOperator


def _segment_spmm(edges: PaddedEdges, x: jax.Array) -> jax.Array:
    """out[i] = Σ_{e: dst[e]=i} w[e] * x[src[e]], rows [0, n_rows).

    bf16 inputs gather in bf16 but the segment reduction accumulates in
    fp32 (cast back at the end) — matching kernels/spmm_ell.py semantics,
    AND avoiding a measured ~85× cliff: a bf16 scatter-add lowers to an
    emulated path on this TPU (0.3M vs 25.6M edges/s fwd+bwd at zh-en
    scale, measured 2026-08-21)."""
    import chex

    chex.assert_rank(x, 2)  # (n_cols, d) feature matrix
    chex.assert_equal_shape([edges.src, edges.dst, edges.w])
    # jnp.take clamps out-of-range ids — a mis-sized x would be silently
    # clamp-gathered (round-4b kernels review); None only for hand-builts
    assert edges.n_cols is None or x.shape[0] == edges.n_cols, (
        f"spmm: x has {x.shape[0]} rows but the operator expects "
        f"{edges.n_cols}")
    msg = jnp.take(x, edges.src, axis=0).astype(jnp.float32) * edges.w[:, None]
    out = jax.ops.segment_sum(
        msg,
        edges.dst,
        num_segments=edges.n_rows + 1,  # +1: padding dump row
        indices_are_sorted=True,
    )
    return out[: edges.n_rows].astype(x.dtype)


def spmm_xla(op: SpMMOperator, x: jax.Array) -> jax.Array:
    """A @ x with XLA autodiff (generic scatter in bwd). Baseline path."""
    return _segment_spmm(op.fwd, x)


@jax.custom_vjp
def spmm(op: SpMMOperator, x: jax.Array) -> jax.Array:
    """A @ x with a sorted-transpose custom VJP (fast backward).

    Gradient contract: the OPERATOR is a constant — ``op.fwd.w`` receives
    cotangent **zero** (kernels/vjp_util.py rationale).  Edge weights in
    this family are precomputed funifun/degree statistics, never
    parameters; a caller that makes them learnable must use ``spmm_xla``,
    whose plain XLA autodiff differentiates through the weights."""
    return _segment_spmm(op.fwd, x)


def _spmm_fwd(op: SpMMOperator, x: jax.Array):
    # VMA-type token — see kernels/vjp_util.py for the rationale
    return _segment_spmm(op.fwd, x), (op, vjp_util.vma_token(x))


def _spmm_bwd(res, g: jax.Array):
    op, x_tok = res
    dx = _segment_spmm(op.bwd, g)  # Aᵀ @ g, also sorted-contiguous
    dx = vjp_util.add_token(dx, x_tok)
    zero_op = jax.tree_util.tree_map(vjp_util.zero_cotangent, op)
    return zero_op, dx


spmm.defvjp(_spmm_fwd, _spmm_bwd)
