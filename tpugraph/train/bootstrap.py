"""Bootstrapped pair augmentation (BootEA/MRAEA-style, stateless).

Semi-supervised entity alignment: every resample interval (after a warmup),
propose new alignment pairs as **mutual nearest neighbours** between the two
KGs' non-seed entities, keep the ``cap`` most confident, and add them to the
margin loss with a (down-)weight.  The proposal is *stateless* — recomputed
from the current embeddings each interval (the MRAEA/RREA convention), so it
needs no growing buffers: TPU-friendly static shapes throughout.

The reference family ships no bootstrapping (mount empty — SURVEY.md §0);
this covers the BootEA-lineage capability at the same API layer as hard
negative mining.  Oracle mirror: parity/torch_ref.propose_mutual_nn_pairs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpugraph.train.losses import pairwise_l1


@partial(jax.jit, static_argnames=("block_c", "metric", "csls_k", "approx"))
def _nn1(
    q: jnp.ndarray,  # (S, d) queries
    cands: jnp.ndarray,  # (C, d)
    c_mask: jnp.ndarray,  # (C,) bool — eligible candidates
    block_c: int = 1024,
    metric: str = "cityblock",
    csls_k: int = 0,
    approx: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-query (score, index) of the nearest eligible candidate, blockwise.

    csls_k > 0 scores by 2·d − candidate-hubness (hubness over the full,
    unmasked query pool — same convention as negatives.blockwise_knn_l1).

    approx: MXU-prefiltered — query-blocked bf16 matmul tiles shortlist 16
    candidates per query (approx_min_k, recall_target 0.7), then the exact
    metric argmin runs within the shortlist only; the proposal stage's
    exact-L1 full tiles were the cost (DESIGN.md §6c family).  Mutual-NN +
    the confidence cap downstream tolerate the ~top-1-recall misses
    (validated end-to-end on the headline recipe).  With csls_k > 0 the
    shortlist is selected by the sqeuclidean CSLS score 2·d₂ − r₂(j) (so
    hubness-promoted candidates are not dropped — same subtlety as
    train/eval._ranks_l1_prefiltered) and reranked by the approximate-L1
    CSLS score; before round 4 this combination silently fell back to the
    exact full-tile path (ADVICE r3 item 3)."""
    if approx:
        return _nn1_prefiltered(q, cands, c_mask, metric=metric, csls_k=csls_k)
    s, d = q.shape
    c = cands.shape[0]
    c_pad = ((c + block_c - 1) // block_c) * block_c
    cands_p = jnp.concatenate([cands, jnp.zeros((c_pad - c, d), cands.dtype)])
    mask_p = jnp.concatenate([c_mask, jnp.zeros((c_pad - c,), bool)])
    blocks = cands_p.reshape(c_pad // block_c, block_c, d)
    mblocks = mask_p.reshape(c_pad // block_c, block_c)
    offsets = jnp.arange(c_pad // block_c, dtype=jnp.int32) * block_c
    q32 = q.astype(jnp.float32)
    q2 = jnp.sum(q32 * q32, axis=1)

    def body(carry, blk):
        rv, ri = carry
        cb, mb, off = blk
        if metric == "sqeuclidean":
            c32 = cb.astype(jnp.float32)
            dmat = (q2[:, None] + jnp.sum(c32 * c32, axis=1)[None, :]
                    - 2.0 * jnp.dot(q32, c32.T, preferred_element_type=jnp.float32))
        else:
            dmat = pairwise_l1(q[:, None, :], cb[None, :, :]).astype(jnp.float32)
        if csls_k > 0:
            r_neg, _ = jax.lax.top_k(-dmat.T, csls_k)
            r = -r_neg.mean(axis=1)
            dmat = 2.0 * dmat - r[None, :]
        dmat = jnp.where(mb[None, :], dmat, jnp.inf)
        bv = dmat.min(axis=1)
        bi = off + jnp.argmin(dmat, axis=1).astype(jnp.int32)
        take = bv < rv
        return (jnp.where(take, bv, rv), jnp.where(take, bi, ri)), None

    init = (jnp.full((s,), jnp.inf, jnp.float32), jnp.zeros((s,), jnp.int32))
    (vals, idx), _ = jax.lax.scan(body, init, (blocks, mblocks, offsets))
    return vals, idx


@partial(jax.jit, static_argnames=("metric", "block_q", "k_short", "csls_k"))
def _nn1_prefiltered(q, cands, c_mask, metric: str = "cityblock",
                     block_q: int = 4096, k_short: int = 16, csls_k: int = 0):
    """Nearest eligible candidate WITHIN an MXU-selected shortlist.  One
    bf16 matmul tile + one cheap approx_min_k per query block; ineligible
    candidates are masked BEFORE selection so the shortlist is
    all-eligible.  cityblock: exact-L1 rerank over the shortlist;
    sqeuclidean: the selection score IS the metric (fp32 recompute of the
    shortlist entries for the returned value).

    csls_k > 0: selection runs on the sqeuclidean CSLS score 2·d₂ − r₂(j)
    (r₂ = MXU-tiled sqeuclidean candidate hubness over the full query
    pool), and the shortlist rerank scores 2·d − r(j) in the requested
    metric, with r(j) the MXU-approximated L1 hubness for cityblock
    (negatives._hubness_both_approx) — the same select-by-sq/score-by-L1
    structure as the approx eval path, tolerance-tested there."""
    s, d = q.shape
    c = cands.shape[0]
    k_short = min(c, k_short)  # tiny-graph guard: approx_min_k needs k < C
    q_pad = ((s + block_q - 1) // block_q) * block_q
    qp = jnp.concatenate([q, jnp.zeros((q_pad - s, d), q.dtype)])
    qb = qp.reshape(q_pad // block_q, block_q, d)
    cb16 = cands.astype(jnp.bfloat16)
    c2 = jnp.sum(cands.astype(jnp.float32) ** 2, axis=1)
    if csls_k > 0:
        # one fused sweep for both hubness terms (see serve._topk_prefiltered)
        from tpugraph.train.negatives import _hubness_both_approx

        r_sq, r_l1 = _hubness_both_approx(q, cands, csls_k)
        r_sel = r_sq
        r_score = r_l1 if metric == "cityblock" else r_sq
        scale = 2.0
    else:
        r_sel = r_score = jnp.zeros((c,), jnp.float32)
        scale = 1.0

    def body(_, qq):
        q16 = qq.astype(jnp.bfloat16)
        d2 = (jnp.sum(qq.astype(jnp.float32) ** 2, axis=1)[:, None] + c2[None, :]
              - 2.0 * jnp.dot(q16, cb16.T, preferred_element_type=jnp.float32))
        d2 = scale * d2 - r_sel[None, :]
        d2 = jnp.where(c_mask[None, :], d2, jnp.inf)
        _, sidx = jax.lax.approx_min_k(d2, k_short, recall_target=0.7)
        sidx = sidx.astype(jnp.int32)
        g = jnp.take(cands, sidx, axis=0)  # (block_q, k_short, d)
        if metric == "cityblock":
            ds = pairwise_l1(qq[:, None, :], g).astype(jnp.float32)
        else:  # fp32 sqeuclidean on the shortlist (bf16 tile was selection-only)
            diff = qq[:, None, :].astype(jnp.float32) - g.astype(jnp.float32)
            ds = jnp.sum(diff * diff, axis=-1)
        ds = scale * ds - jnp.take(r_score, sidx)
        ds = jnp.where(jnp.take(c_mask, sidx), ds, jnp.inf)
        pos = jnp.argmin(ds, axis=1)
        return None, (jnp.take_along_axis(ds, pos[:, None], 1)[:, 0],
                      jnp.take_along_axis(sidx, pos[:, None], 1)[:, 0])

    _, (vals, idx) = jax.lax.scan(body, None, qb)
    return vals.reshape(q_pad)[:s], idx.reshape(q_pad)[:s]


@partial(jax.jit, static_argnames=("n1", "n", "cap", "block_c", "metric",
                                   "csls_k", "approx"))
def propose_mutual_nn_pairs(
    emb: jnp.ndarray,  # (n, d) all entity embeddings (KG1 = [:n1], KG2 = [n1:n])
    mask1: jnp.ndarray,  # (n1,) bool — KG1 entities eligible (not in the seed set)
    mask2: jnp.ndarray,  # (n − n1,) bool — KG2 eligible (local ids)
    n1: int,
    n: int,
    cap: int,
    block_c: int = 1024,
    metric: str = "cityblock",
    csls_k: int = 0,
    approx: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-``cap`` most-confident mutual-NN pairs among eligible entities.

    Returns ``(pairs, weight)``: pairs (cap, 2) int32 with GLOBAL entity ids,
    weight (cap,) float32 in {0, 1} (0 = padding row when fewer than cap
    mutual pairs exist).  Confidence = the direction-1 matching score (raw
    distance, or the CSLS-adjusted score when csls_k > 0); smaller = kept.
    """
    cand1 = jax.lax.slice_in_dim(emb, 0, n1, axis=0)
    cand2 = jax.lax.slice_in_dim(emb, n1, n, axis=0)
    v12, i12 = _nn1(cand1, cand2, mask2, block_c, metric, csls_k, approx)
    _, i21 = _nn1(cand2, cand1, mask1, block_c, metric, csls_k, approx)
    mutual = mask1 & (jnp.take(i21, i12) == jnp.arange(n1, dtype=jnp.int32))
    score = jnp.where(mutual, v12, jnp.inf)
    k_eff = min(cap, n1)
    neg_top, left = jax.lax.top_k(-score, k_eff)
    weight = jnp.isfinite(-neg_top).astype(jnp.float32)
    right = jnp.take(i12, left) + n1
    pairs = jnp.stack([left.astype(jnp.int32), right.astype(jnp.int32)], axis=1)
    # padding rows: zero out ids so downstream gathers stay in range
    pairs = jnp.where(weight[:, None] > 0, pairs, jnp.array([0, n1], jnp.int32))
    if k_eff < cap:  # tiny graphs: pad up to the static capacity
        pairs = jnp.concatenate(
            [pairs, jnp.tile(jnp.array([0, n1], jnp.int32), (cap - k_eff, 1))], 0)
        weight = jnp.concatenate([weight, jnp.zeros(cap - k_eff, jnp.float32)], 0)
    return pairs, weight
