"""SDDMM-style pairwise alignment distances (BASELINE.json config[2]).

The reference family's quadratic object is the cross-KG pairwise distance
matrix (eval cdist; Sinkhorn cost matrix — SURVEY.md §5.7).  TPU-native
forms, none of which materialize more than one (block_q × block_c) tile of
intermediates at a time:

* ``sddmm_pairs``     — the literal SDDMM: distances for an explicit sampled
                        (rows, cols) pair list (margin loss, candidate scoring).
* ``pairwise_dist``   — full Q×C distance matrix assembled tile-by-tile with
                        ``lax.map`` over row blocks; 'sqeuclidean' rides the
                        MXU via the |a|²+|b|²−2ab̂ expansion, 'cityblock'
                        matches the family's L1 convention on the VPU.

The multi-host ring variant (ppermute over embedding shards, running
reductions instead of assembly) lives in tpugraph/dist/ring.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _dist_block(a: jnp.ndarray, b: jnp.ndarray, metric: str) -> jnp.ndarray:
    """(Qb, d) x (Cb, d) → (Qb, Cb) distances."""
    if metric == "cityblock":
        return jnp.abs(a[:, None, :] - b[None, :, :]).sum(-1)
    if metric == "sqeuclidean":
        # MXU path: ‖a‖² + ‖b‖² − 2a·b
        d = (
            jnp.sum(a * a, -1)[:, None]
            + jnp.sum(b * b, -1)[None, :]
            - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32)
        )
        return jnp.maximum(d, 0.0)
    raise ValueError(f"unknown metric {metric!r}")


def sddmm_pairs(
    emb: jnp.ndarray, rows: jnp.ndarray, cols: jnp.ndarray, metric: str = "cityblock"
) -> jnp.ndarray:
    """Distances d(emb[rows[i]], emb[cols[i]]) for a sampled pair list."""
    a = jnp.take(emb, rows, axis=0)
    b = jnp.take(emb, cols, axis=0)
    if metric == "cityblock":
        return jnp.abs(a - b).sum(-1)
    if metric == "sqeuclidean":
        d = a - b
        return jnp.sum(d * d, -1)
    raise ValueError(f"unknown metric {metric!r}")


@partial(jax.jit, static_argnames=("metric", "block_q"))
def pairwise_dist(
    q: jnp.ndarray, c: jnp.ndarray, metric: str = "cityblock", block_q: int = 512
) -> jnp.ndarray:
    """Full (Q, C) distance matrix, computed one row-block tile at a time."""
    nq, d = q.shape
    q_pad = ((nq + block_q - 1) // block_q) * block_q
    qp = jnp.concatenate([q, jnp.zeros((q_pad - nq, d), q.dtype)], axis=0)
    blocks = qp.reshape(q_pad // block_q, block_q, d)
    out = jax.lax.map(lambda qb: _dist_block(qb, c, metric), blocks)
    return out.reshape(q_pad, c.shape[0])[:nq]
