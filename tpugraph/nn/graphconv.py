"""GraphConvolution — the framework's core layer.

TPU-native rebuild of the reference family's ``layers.py GraphConvolution``
(``out = spmm(adj, x @ W) + b``; reference unverifiable — mount empty,
SURVEY.md §0/§2.1).  The dense ``x @ W`` runs on the MXU; the sparse
aggregation dispatches to a selectable SpMM implementation.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpugraph.kernels.spmm import spmm, spmm_xla
from tpugraph.kernels.spmm_ell import spmm_ell
from tpugraph.sparse.graph import SpMMOperator

_IMPLS = {"sorted": spmm, "xla": spmm_xla, "ell": spmm_ell}


def get_spmm_impl(name: str):
    """Impl registry.  The operator pytree type must match the impl:
    'sorted'/'xla' take a SpMMOperator (sorted padded edges), 'ell' takes an
    EllOperator (sparse/ell.py) — build_adjacency(fmt=...) produces the right
    one.

    'pallas' is a config alias for 'ell': every Pallas SpMM formulation was
    measured slower on this TPU, including the round-2 fused GCN-layer
    kernel (kernels/gcn_fused_pallas.py) whose in-kernel DMA gather runs at
    ~21M rows/s vs XLA's hardware gather at ~110M — docs/DESIGN.md §3."""
    if name == "pallas":
        return _IMPLS["ell"]
    return _IMPLS[name]


class GraphConvolution(nn.Module):
    """One GCN layer: act is left to the caller (family applies ReLU outside)."""

    out_dim: int
    use_bias: bool = True
    impl: str = "sorted"  # 'sorted' (custom-VJP) | 'xla' | 'pallas'

    @nn.compact
    def __call__(self, x: jnp.ndarray, op: SpMMOperator) -> jnp.ndarray:
        w = self.param("w", nn.initializers.xavier_uniform(), (x.shape[-1], self.out_dim))
        support = x @ w.astype(x.dtype)  # MXU GEMM in the compute dtype
        out = get_spmm_impl(self.impl)(op, support)
        if self.use_bias:
            b = self.param("b", nn.initializers.zeros, (self.out_dim,))
            out = out + b.astype(out.dtype)
        return out
