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
def _ranks_l1(
    q: jnp.ndarray,
    cands: jnp.ndarray,
    d_true: jnp.ndarray,
    block_c: int = 1024,
    cand_corr: jnp.ndarray | None = None,
    true_corr: jnp.ndarray | None = None,
):
    """For each query, count candidates strictly closer than its true match.

    With (cand_corr, true_corr) this computes CSLS-adjusted ranks: candidate
    j's score is 2·d(q,j) − cand_corr[j], compared against 2·d_true − true_corr
    (the query-side hubness term cancels within a row).

    The true match (candidate i for query i — hits_at_k's position-aligned
    convention) is excluded EXPLICITLY by index rather than by relying on
    its score tying the threshold bit-for-bit: score and threshold are the
    same quantity computed through different fusions, and XLA is free to
    round them differently (observed on the CPU backend when this routine
    is inlined into a larger jit — Hits@1 moved 0.38 from tie-flips alone).
    """
    s, d = q.shape
    c = cands.shape[0]
    # the explicit true-match exclusion below hard-codes the position-aligned
    # convention (candidate i IS query i's true match); fail loudly if a
    # future caller passes a non-aligned pool (ADVICE r2 item 2)
    assert s == c, f"_ranks_l1 requires position-aligned pools, got S={s} C={c}"
    c_pad = ((c + block_c - 1) // block_c) * block_c
    cands_p = jnp.concatenate(
        [cands, jnp.full((c_pad - c, d), jnp.inf, dtype=cands.dtype)], axis=0
    )
    blocks = cands_p.reshape(c_pad // block_c, block_c, d)
    offsets = jnp.arange(c_pad // block_c, dtype=jnp.int32) * block_c
    if cand_corr is None:
        thresh = d_true
        corr_blocks = jnp.zeros((c_pad // block_c, block_c), q.dtype)
        scale = 1.0
    else:
        thresh = 2.0 * d_true - true_corr
        corr_p = jnp.concatenate([cand_corr, jnp.zeros(c_pad - c, cand_corr.dtype)])
        corr_blocks = corr_p.reshape(c_pad // block_c, block_c)
        scale = 2.0
    row_ids = jnp.arange(s, dtype=jnp.int32)

    def body(acc, blk):
        cb, corr, off = blk
        dmat = scale * pairwise_l1(q[:, None, :], cb[None, :, :]) - corr[None, :]
        gcol = off + jnp.arange(block_c, dtype=jnp.int32)
        is_self = gcol[None, :] == row_ids[:, None]
        below = jnp.where(is_self, False, dmat < thresh[:, None])
        return acc + jnp.sum(below, axis=1), None

    ranks, _ = jax.lax.scan(
        body, jnp.zeros(s, dtype=jnp.int32), (blocks, corr_blocks, offsets)
    )
    return ranks


@partial(jax.jit, static_argnames=("k", "block_c"))
def _knn_mean_l1(q: jnp.ndarray, cands: jnp.ndarray, k: int, block_c: int = 1024):
    """Mean distance to the k nearest candidates (CSLS hubness term),
    blockwise with a running top-k."""
    s, d = q.shape
    c = cands.shape[0]
    # pool smaller than k: without the clamp the running top-k retains inf
    # pad entries, the mean is inf, every CSLS score/threshold collapses to
    # -inf, and Hits@k silently reports 1.0 (round-4b eval review; the
    # approx sibling _hubness_both_approx always had this clamp)
    k = min(k, c)
    c_pad = ((c + block_c - 1) // block_c) * block_c
    cands_p = jnp.concatenate(
        [cands, jnp.full((c_pad - c, d), jnp.inf, dtype=cands.dtype)], axis=0
    )
    blocks = cands_p.reshape(c_pad // block_c, block_c, d)

    def body(run, cb):
        dmat = pairwise_l1(q[:, None, :], cb[None, :, :])
        allv = jnp.concatenate([run, dmat], axis=1)
        neg_top, _ = jax.lax.top_k(-allv, k)
        return -neg_top, None

    run0 = jnp.full((s, k), jnp.inf, q.dtype)
    run, _ = jax.lax.scan(body, run0, blocks)
    return run.mean(axis=1)


@partial(jax.jit, static_argnames=("approx_k", "csls_k"))
def _ranks_l1_prefiltered(
    q: jnp.ndarray,
    cands: jnp.ndarray,
    d_true: jnp.ndarray,
    approx_k: int,
    cand_corr: jnp.ndarray | None = None,
    csls_k: int = 0,
    r_sel: jnp.ndarray | None = None,
):
    """MXU-prefiltered ranks: a sqeuclidean top-``approx_k`` shortlist per
    query (query-blocked distance tiles on the MXU + ``lax.approx_min_k``),
    then exact L1 (or CSLS-adjusted L1) scoring within the shortlist only.

    rank(i) = #{j ∈ shortlist(i) : score(q_i, c_j) < score(q_i, true_i)} —
    exact (csls_k == 0) whenever every candidate L1-closer than the true
    match lands in the sqeuclidean shortlist (L1/L2 orderings are
    near-identical on trained embeddings); with csls_k > 0 both the shortlist
    score and the hubness term are sqeuclidean-selected approximations, so
    the result is approximate-tracking only (enforced tolerance 0.02 Hits@k,
    tests/test_eval_approx.py).  The
    full-pool exact path costs S·C·d VPU ops (2.1 s at zh-en scale, d=256);
    this costs one S·C·d MXU matmul (~ms) + S·approx_k row gathers.

    The true match (shortlist entry whose candidate id equals the query row,
    position-aligned pairs) is excluded explicitly by index — see _ranks_l1:
    relying on the bit-exact score tie is fragile under XLA refusion.
    """
    from tpugraph.train.negatives import _knn_query_blocked_approx

    s = q.shape[0]
    # position-aligned convention as in _ranks_l1 (is_self below) — see the
    # assert rationale there
    assert s == cands.shape[0], (
        f"_ranks_l1_prefiltered requires position-aligned pools, "
        f"got S={s} C={cands.shape[0]}")
    no_excl = jnp.full((s,), -1, jnp.int32)
    # shortlist by the SAME score family being ranked: with CSLS the selection
    # runs on 2·d_sq − r_sq(j) (sqeuclidean hubness, MXU) so candidates that
    # CSLS promotes past the true match are not silently dropped — selecting
    # by raw distance here diverged by ~0.27 Hits@1 on hub-heavy pools
    # (tests/test_eval_approx.py::test_shortlisted_hits_track_exact[0.8-10]).
    # r_sel: the caller's precomputed r_sq(j) (the fused-hubness sweep in
    # _both_direction_ranks); None → computed internally.
    short = _knn_query_blocked_approx(q, cands, no_excl, approx_k,
                                      "sqeuclidean", csls_k=csls_k,
                                      r_cand=r_sel)  # (S, K) candidate ids
    c_short = jnp.take(cands, short, axis=0)  # (S, K, d)
    d_short = pairwise_l1(q[:, None, :], c_short).astype(jnp.float32)
    if csls_k > 0:
        assert cand_corr is not None
        score = 2.0 * d_short - jnp.take(cand_corr, short)
        # candidate i is query i's true match (position-aligned test pairs)
        thresh = 2.0 * d_true - cand_corr
    else:
        score, thresh = d_short, d_true
    is_self = short == jnp.arange(s, dtype=short.dtype)[:, None]
    below = jnp.where(is_self, False, score < thresh[:, None])
    return jnp.sum(below, axis=1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("block_c", "csls_k", "approx_k"))
def _both_direction_ranks(
    emb: jnp.ndarray,
    test_pairs: jnp.ndarray,
    block_c: int = 1024,
    csls_k: int = 0,
    approx_k: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(ranks_l2r, ranks_r2l) in ONE jitted computation — a single dispatch
    + a single device→host readback per eval.  The unfused composition paid
    ~10 sequential dispatches/syncs per eval, which on a remote-dispatch
    platform floors every eval at the round-trip latency (~240 ms measured
    on the axon tunnel, docs/DESIGN.md §6b) regardless of compute."""
    l = jnp.take(emb, test_pairs[:, 0], axis=0)
    r = jnp.take(emb, test_pairs[:, 1], axis=0)
    d_true = pairwise_l1(l, r).astype(jnp.float32)
    corr = {}
    sel = {}
    if csls_k > 0:
        if approx_k > 0:
            # ONE fused sweep per direction (negatives._hubness_both_approx)
            # yields BOTH hubness terms the prefiltered path needs: the
            # sqeuclidean selection hubness (previously a second full
            # _cand_hubness sweep with a full-width top_k sort inside
            # _knn_query_blocked_approx) and the approx-L1 score correction.
            # Orientation is PER-CANDS: corr['l'] (per-left hubness wrt the
            # right pool, matching the exact _knn_mean_l1(l, r, k)) takes
            # cands=l, q_pool=r.
            from tpugraph.train.negatives import _hubness_both_approx

            sel["l"], corr["l"] = _hubness_both_approx(r, l, csls_k)
            sel["r"], corr["r"] = _hubness_both_approx(l, r, csls_k)
        else:
            corr["l"] = _knn_mean_l1(l, r, csls_k, block_c)  # hubness of left wrt right pool
            corr["r"] = _knn_mean_l1(r, l, csls_k, block_c)
    ranks = []
    for tag, q, cands in (("l2r", l, r), ("r2l", r, l)):
        cand_corr = (corr["r"] if tag == "l2r" else corr["l"]) if csls_k > 0 else None
        if approx_k > 0:
            r_sel = (sel["r"] if tag == "l2r" else sel["l"]) if csls_k > 0 else None
            ranks.append(_ranks_l1_prefiltered(
                q, cands, d_true, min(approx_k, cands.shape[0]),
                cand_corr=cand_corr, csls_k=csls_k, r_sel=r_sel))
        elif csls_k > 0:
            ranks.append(_ranks_l1(q, cands, d_true, block_c=block_c,
                                   cand_corr=cand_corr, true_corr=cand_corr))
        else:
            ranks.append(_ranks_l1(q, cands, d_true, block_c=block_c))
    return ranks[0], ranks[1]


def hits_at_k(
    emb: jnp.ndarray,
    test_pairs: jnp.ndarray,
    ks: tuple[int, ...] = (1, 10),
    block_c: int = 1024,
    csls_k: int = 0,
    approx_k: int = 0,
) -> dict[str, float]:
    """Both-direction Hits@k and MRR over the test alignment pairs.

    Candidate pool convention (family): the test-set entities of the opposite
    KG.  ``csls_k > 0`` applies the CSLS hubness correction (Conneau et al.;
    standard in the HGCN/RDGCN reporting convention): score(q, j) =
    2·d(q, j) − mean_{k-NN}(d(·, j)).  All device work happens in ONE jitted
    call (``_both_direction_ranks``); metrics are computed host-side from
    the two rank vectors, so each eval costs one dispatch + one readback.

    ``approx_k > 0`` switches to the MXU-prefiltered path
    (``_ranks_l1_prefiltered``): ranks are counted within a top-``approx_k``
    shortlist instead of the full pool — ~20–40× less compute at zh-en
    scale, approximate (enforced tracking tolerance: 0.02 Hits@1/@10/MRR vs
    exact, incl. the CSLS branch — tests/test_eval_approx.py; raw-L1 deltas
    measured ≲1e-3).  Training-loop history evals use it behind
    ``TrainConfig.eval_approx_k``; FINAL reported metrics stay exact.
    """
    import numpy as np

    rl, rr = _both_direction_ranks(emb, jnp.asarray(test_pairs),
                                   block_c=block_c, csls_k=csls_k,
                                   approx_k=approx_k)
    both = np.asarray(jnp.stack([rl, rr]))  # single readback
    out = {}
    for tag, ranks in (("l2r", both[0]), ("r2l", both[1])):
        for k in ks:
            out[f"hits@{k}_{tag}"] = float((ranks < k).mean())
        out[f"mrr_{tag}"] = float((1.0 / (ranks.astype(np.float64) + 1.0)).mean())
    for k in ks:
        out[f"hits@{k}"] = 0.5 * (out[f"hits@{k}_l2r"] + out[f"hits@{k}_r2l"])
    out["mrr"] = 0.5 * (out["mrr_l2r"] + out["mrr_r2l"])
    return out
