"""Alignment losses.

``margin_align_loss`` covers the reference family's negative-sampling margin
ranking loss (train.py/models.py loss code — reconstructed, mount empty;
SURVEY.md §2.1 "Alignment head + margin loss"); semantics match
tpugraph.parity.torch_ref.margin_align_loss exactly (parity-tested).

The Sinkhorn optimal-transport loss (BASELINE config[2]) lives in
tpugraph/train/ot.py with its kernels in tpugraph/kernels/sinkhorn.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def pairwise_l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(…, d), (…, d) → broadcasted L1 distance over the last axis."""
    return jnp.abs(a - b).sum(-1)


def margin_align_loss(
    emb: jnp.ndarray,
    pairs: jnp.ndarray,  # (S, 2) int32
    neg_l: jnp.ndarray,  # (S, k) int32 — corruptions of the left entity
    neg_r: jnp.ndarray,  # (S, k) int32 — corruptions of the right entity
    gamma: float = 10.0,
    weights: jnp.ndarray | None = None,  # (S,) per-pair weight; None = uniform
) -> jnp.ndarray:
    """Margin ranking loss, k negatives per side, L1 distance.

    0.5 * (mean ReLU(d⁺ + γ − d(e_l, neg_r)) + mean ReLU(d⁺ + γ − d(neg_l, e_r)))

    ``weights`` enables bootstrapped-pair augmentation (masked/down-weighted
    rows): each side's mean becomes Σ w·ReLU / (Σ w · k).  With weights of all
    ones this is bitwise the unweighted form's value up to the same reduction
    order; parity with torch_ref.margin_align_loss is tested either way.
    """
    import chex

    chex.assert_rank(emb, 2)
    chex.assert_shape(pairs, (neg_l.shape[0], 2))
    chex.assert_equal_shape([neg_l, neg_r])
    e_l = jnp.take(emb, pairs[:, 0], axis=0)
    e_r = jnp.take(emb, pairs[:, 1], axis=0)
    d_pos = pairwise_l1(e_l, e_r)[:, None]  # (S, 1)
    d_neg_r = pairwise_l1(e_l[:, None, :], jnp.take(emb, neg_r, axis=0))  # (S, k)
    d_neg_l = pairwise_l1(jnp.take(emb, neg_l, axis=0), e_r[:, None, :])  # (S, k)
    h_r = jnp.maximum(d_pos + gamma - d_neg_r, 0.0)
    h_l = jnp.maximum(d_pos + gamma - d_neg_l, 0.0)
    if weights is None:
        return 0.5 * (h_r.mean() + h_l.mean())
    w = weights[:, None]
    denom = jnp.maximum(weights.sum(), 1e-9) * neg_r.shape[1]
    return 0.5 * ((w * h_r).sum() + (w * h_l).sum()) / denom
