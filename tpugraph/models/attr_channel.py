"""Attribute-channel GCN (the GCN-Align "AE" channel; SURVEY.md §2.1
"Auxiliary MTL heads" — attribute-GCN channel à la GCN-Align AE).

Entity input features are built *sparsely*: each entity's feature is the
(degree-normalized) mean of its attributes' embeddings, computed as an SpMM
with the rectangular entity×attribute incidence matrix — no dense multihot
matrix at any scale.  Those features then propagate through a 2-layer GCN
over the same merged adjacency as the structural (SE) channel.

At evaluation, SE and AE distances combine GCN-Align-style:
    d = β·d_SE + (1−β)·d_AE     (on L2-row-normalized channel embeddings)
implemented by evaluating the existing L1 machinery on the concatenation
[√-free weighting: β·se_n ‖ (1−β)·ae_n] — L1 of a concat is the weighted sum
of the channel L1s.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tpugraph.nn.graphconv import GraphConvolution, get_spmm_impl


def build_attr_operator(attr_triples: np.ndarray, n_ent: int, n_attr: int,
                        fmt: str = "ell", bucket: int = 8192):
    """Entity×attribute incidence, row-normalized (mean aggregation)."""
    ent = attr_triples[:, 0].astype(np.int64)
    att = attr_triples[:, 1].astype(np.int64)
    # dedup duplicate (ent, attr) pairs
    key = ent * n_attr + att
    uniq = np.unique(key)
    ent, att = uniq // n_attr, uniq % n_attr
    deg = np.bincount(ent, minlength=n_ent).astype(np.float64)
    w = 1.0 / deg[ent]
    if fmt == "ell":
        from tpugraph.sparse.ell import build_ell_operator

        return build_ell_operator(att, ent, w, n_ent, n_cols=n_attr)
    from tpugraph.sparse.build import build_spmm_operator

    return build_spmm_operator(att, ent, w, n_ent, bucket=bucket, n_cols=n_attr)


class AttrChannelGCN(nn.Module):
    """AE channel: attribute-embedding features → 2-layer GCN."""

    n_attr: int
    dim: int
    spmm_impl: str = "ell"

    @nn.compact
    def __call__(self, adj_op, attr_op) -> jnp.ndarray:
        attr_emb = self.param(
            "attr_emb", nn.initializers.normal(stddev=1.0 / self.dim**0.5),
            (self.n_attr, self.dim),
        )
        x0 = get_spmm_impl(self.spmm_impl)(attr_op, attr_emb)  # (n_ent, dim)
        h = nn.relu(GraphConvolution(self.dim, impl=self.spmm_impl)(x0, adj_op))
        return GraphConvolution(self.dim, impl=self.spmm_impl)(h, adj_op)


def combine_channels(se: jnp.ndarray, ae: jnp.ndarray, beta: float = 0.9) -> jnp.ndarray:
    """Weighted concat whose L1 distance equals β·d_SE + (1−β)·d_AE on
    row-normalized channels.

    Metric caveat (round-4b review): the equality is L1-specific.  Consumers
    that score the combined embedding with SQUARED euclidean (sqeuclidean
    mining/shortlists, the MXU prefilters) effectively weight the channels
    β² : (1−β)² — at β=0.9 that is 0.81 : 0.01, i.e. the AE channel is
    nearly ignored DURING SELECTION (exact-L1 reranks restore the L1
    weighting for what is kept).  If sq-metric mining over the combined
    space ever becomes a tuned path, pass sqrt-weighted channels there;
    the family's reported metric (and the eval convention) is L1, so the
    shipped form matches the GCN-Align semantics it documents."""
    se_n = se / (jnp.linalg.norm(se, axis=-1, keepdims=True) + 1e-8)
    ae_n = ae / (jnp.linalg.norm(ae, axis=-1, keepdims=True) + 1e-8)
    return jnp.concatenate([beta * se_n, (1.0 - beta) * ae_n], axis=-1)
