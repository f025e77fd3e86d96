"""Blockwise Hits@k / MRR evaluation.

Covers the reference family's ``get_hits`` (dense N×N cdist + argsort —
reconstructed, mount empty; SURVEY.md §3.3) with a TPU-native rank-counting
formulation that never materializes the full distance matrix:

    rank(i) = #{ j : d(l_i, r_j) < d(l_i, r_i) }

accumulated over candidate blocks with ``lax.scan`` — the same blockwise
pattern that scales to DWY100K and, sharded, to the multi-host ring eval
(SURVEY.md §5.7).  Ties are counted strictly-less, matching the torch oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpugraph.train.losses import pairwise_l1


@partial(jax.jit, static_argnames=("block_c",))
def _ranks_l1(q: jnp.ndarray, cands: jnp.ndarray, d_true: jnp.ndarray, block_c: int = 1024):
    """For each query, count candidates strictly closer than its true match."""
    s, d = q.shape
    c = cands.shape[0]
    c_pad = ((c + block_c - 1) // block_c) * block_c
    cands_p = jnp.concatenate(
        [cands, jnp.full((c_pad - c, d), jnp.inf, dtype=cands.dtype)], axis=0
    )
    blocks = cands_p.reshape(c_pad // block_c, block_c, d)

    def body(acc, cb):
        dmat = pairwise_l1(q[:, None, :], cb[None, :, :])  # (S, Bc)
        return acc + jnp.sum(dmat < d_true[:, None], axis=1), None

    ranks, _ = jax.lax.scan(body, jnp.zeros(s, dtype=jnp.int32), blocks)
    return ranks


def hits_at_k(
    emb: jnp.ndarray,
    test_pairs: jnp.ndarray,
    ks: tuple[int, ...] = (1, 10),
    block_c: int = 1024,
) -> dict[str, float]:
    """Both-direction Hits@k and MRR over the test alignment pairs.

    Candidate pool convention (family): the test-set entities of the opposite
    KG.  Returns python floats (device→host readback happens here only).
    """
    l = jnp.take(emb, test_pairs[:, 0], axis=0)
    r = jnp.take(emb, test_pairs[:, 1], axis=0)
    d_true = pairwise_l1(l, r)
    out = {}
    for tag, q, cands in (("l2r", l, r), ("r2l", r, l)):
        ranks = _ranks_l1(q, cands, d_true, block_c=block_c)
        for k in ks:
            out[f"hits@{k}_{tag}"] = float(jnp.mean(ranks < k))
        out[f"mrr_{tag}"] = float(jnp.mean(1.0 / (ranks.astype(jnp.float32) + 1.0)))
    for k in ks:
        out[f"hits@{k}"] = 0.5 * (out[f"hits@{k}_l2r"] + out[f"hits@{k}_r2l"])
    out["mrr"] = 0.5 * (out["mrr_l2r"] + out["mrr_r2l"])
    return out
