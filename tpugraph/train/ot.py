"""Sinkhorn optimal-transport alignment loss head (BASELINE.json config[2]).

Treats seed alignment as a transport problem: cost = pairwise distances
between the left seed entities and the right seed entities (SDDMM blockwise,
kernels/sddmm.py), solved by entropic Sinkhorn (kernels/sinkhorn.py); the
loss is the negative log-likelihood of the ground-truth matching under the
(row-normalized) transport plan:

    L_ot = −mean_i [ log P_{i,i} − log Σ_j P_{i,j} ]

Gradients flow through both the cost matrix and the unrolled Sinkhorn
iterations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpugraph.kernels.sddmm import pairwise_dist
from tpugraph.kernels.sinkhorn import sinkhorn_log_plan


def sinkhorn_align_loss(
    emb: jnp.ndarray,
    pairs: jnp.ndarray,  # (S, 2) — seed alignments; row i ↔ col i is ground truth
    tau: float = 0.05,
    n_iters: int = 20,
    metric: str = "sqeuclidean",
    block_q: int = 512,
) -> jnp.ndarray:
    l = jnp.take(emb, pairs[:, 0], axis=0)
    r = jnp.take(emb, pairs[:, 1], axis=0)
    # normalize so τ has a stable scale across dims/datasets
    l = l / (jnp.linalg.norm(l, axis=-1, keepdims=True) + 1e-8)
    r = r / (jnp.linalg.norm(r, axis=-1, keepdims=True) + 1e-8)
    cost = pairwise_dist(l, r, metric=metric, block_q=block_q)
    log_p = sinkhorn_log_plan(cost, tau=tau, n_iters=n_iters)
    log_row = jax.nn.logsumexp(log_p, axis=1)
    ll = jnp.diagonal(log_p) - log_row
    return -jnp.mean(ll)
