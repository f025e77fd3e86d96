"""Ring-blockwise pairwise computations over the 'graph' mesh axis
(SURVEY.md §5.7 — this model family's sequence-parallelism analog).

The quadratic objects (eval rank counts, k-NN hard negatives, the Sinkhorn
cost matrix) are never materialized: both entity sets are sharded across the
ring; each step computes one (Q_blk × C_blk) distance tile, folds it into a
running reduction (count / top-k / log-sum-exp), then rotates the candidate
shard with ``ppermute`` — structurally identical to ring attention with the
softmax replaced by the respective reduction.

All functions here are shard_map bodies operating on per-device blocks; the
public wrappers pad, shard, launch, and unpad.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from tpugraph.train.losses import pairwise_l1


def _pcast_varying(x, axes):
    """Mark ``x`` device-varying over ``axes`` (jax.lax.pvary is deprecated
    in favor of pcast(..., to='varying'))."""
    return jax.lax.pcast(x, axes, to="varying")


def _ring_perm(axis: str):
    s = jax.lax.axis_size(axis)
    return [(j, (j + 1) % s) for j in range(s)]


# ---------------------------------------------------------------- rank counts
def _ring_ranks_body(q, cand, d_true, cval, axis: str, csls_k: int = 0,
                     approx_k: int = 0, r_l1=None, r_sq=None):
    """q, cand: (B, d) local blocks; d_true: (B,); cval: (B,) candidate
    validity (padding rows never count).  Counts candidates strictly closer
    than the true match across the whole ring, true match excluded
    EXPLICITLY by global index (position-aligned pools — relying on the
    self-score tying the threshold bit-for-bit is fragile under XLA
    refusion, see train/eval._ranks_l1).

    csls_k > 0: candidates are scored 2·d − r(j) against the CSLS-adjusted
    threshold 2·d_true − r(true); ``r_l1`` is the per-candidate hubness
    block rotating WITH cand (exact L1 ring pass, or the MXU-approximated
    one under approx_k — train/eval._both_direction_ranks conventions).
    approx_k > 0: MXU-prefiltered hops — per hop, a sqeuclidean tile on the
    MXU (selection score 2·d₂ − r₂(j) under CSLS, ``r_sq``) shortlists
    ``approx_k`` candidates, exact L1 rescoring runs on the shortlist only —
    the ring analog of train/eval._ranks_l1_prefiltered (DESIGN.md §6c).
    """
    s = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    b = cand.shape[0]
    csls = csls_k > 0
    if r_l1 is None:
        r_l1 = jnp.zeros((b,), jnp.float32)
    if r_sq is None:
        r_sq = jnp.zeros((b,), jnp.float32)
    thresh = (2.0 * d_true - r_l1) if csls else d_true.astype(jnp.float32)
    self_gid = me * b + jnp.arange(b, dtype=jnp.int32)  # true match of query i
    kk = min(b, approx_k) if approx_k > 0 else 0

    def body(i, carry):
        acc, cand, cv, rl, rsq = carry
        src_dev = (me - i) % s  # who originally owned the block we now hold
        gcol = src_dev * b + jnp.arange(b, dtype=jnp.int32)
        is_self = gcol[None, :] == self_gid[:, None]
        if kk > 0:
            d2 = _dist_tile(q, cand, "sqeuclidean")
            sel = (2.0 * d2 - rsq[None, :]) if csls else d2
            sel = jnp.where(cv[None, :] & ~is_self, sel, jnp.inf)
            _, spos = jax.lax.approx_min_k(sel, kk)
            spos = spos.astype(jnp.int32)
            g = jnp.take(cand, spos, axis=0)  # (B, kk, d)
            d = pairwise_l1(q[:, None, :], g).astype(jnp.float32)
            score = (2.0 * d - jnp.take(rl, spos)) if csls else d
            sgid = src_dev * b + spos
            ok = jnp.take(cv, spos) & (sgid != self_gid[:, None])
        else:
            d = pairwise_l1(q[:, None, :], cand[None, :, :]).astype(jnp.float32)
            score = (2.0 * d - rl[None, :]) if csls else d
            ok = cv[None, :] & ~is_self
        acc = acc + jnp.sum(
            jnp.where(ok & (score < thresh[:, None]), 1, 0), axis=1)
        perm = _ring_perm(axis)
        cand = jax.lax.ppermute(cand, axis, perm=perm)
        cv = jax.lax.ppermute(cv, axis, perm=perm)
        if csls:
            rl = jax.lax.ppermute(rl, axis, perm=perm)
            if kk > 0:
                rsq = jax.lax.ppermute(rsq, axis, perm=perm)
        return acc, cand, cv, rl, rsq

    init = _pcast_varying(jnp.zeros(q.shape[0], jnp.int32), (axis,))
    if not csls:
        r_l1 = _pcast_varying(r_l1, (axis,))
        r_sq = _pcast_varying(r_sq, (axis,))
    elif kk == 0:
        r_sq = _pcast_varying(r_sq, (axis,))
    acc, *_ = jax.lax.fori_loop(0, s, body, (init, cand, cval, r_l1, r_sq))
    return acc


def _ring_hubness_approx_body(cand, qblk, qval, csls_k, axis: str):
    """(r_sq, r_l1_approx) for the LOCAL candidate block wrt the full ring
    query pool: one sqeuclidean MXU tile per hop keeps a running
    top-``csls_k`` of d₂ keyed on d₂, carrying each entry's exact L1
    distance as payload — the ring analog of the single-chip
    negatives._hubness_both_approx ("nearest" selected by sqeuclidean, mean
    taken of exact L1), plus the sqeuclidean mean the prefilter's selection
    score needs."""
    s = jax.lax.axis_size(axis)
    b = cand.shape[0]

    def body(i, carry):
        run2, runl1, qb, qv = carry
        d2 = _dist_tile(cand, qb, "sqeuclidean")  # (B, Qblk)
        d2 = jnp.where(qv[None, :] > 0, d2, jnp.inf)
        k_hop = min(qb.shape[0], csls_k)
        hv2, hpos = jax.lax.approx_min_k(d2, k_hop)
        hq = jnp.take(qb, hpos.astype(jnp.int32), axis=0)  # (B, k_hop, d)
        hl1 = pairwise_l1(cand[:, None, :], hq).astype(jnp.float32)
        all2 = jnp.concatenate([run2, hv2], axis=1)
        alll1 = jnp.concatenate([runl1, hl1], axis=1)
        negtop, pos = jax.lax.top_k(-all2, csls_k)
        perm = _ring_perm(axis)
        return (-negtop, jnp.take_along_axis(alll1, pos, axis=1),
                jax.lax.ppermute(qb, axis, perm=perm),
                jax.lax.ppermute(qv, axis, perm=perm))

    run2 = _pcast_varying(jnp.full((b, csls_k), jnp.inf, jnp.float32), (axis,))
    runl1 = _pcast_varying(jnp.zeros((b, csls_k), jnp.float32), (axis,))
    run2, runl1, _, _ = jax.lax.fori_loop(0, s, body, (run2, runl1, qblk, qval))
    fin = jnp.isfinite(run2)
    cnt = jnp.maximum(jnp.sum(fin, axis=1), 1)
    r_sq = jnp.sum(jnp.where(fin, run2, 0.0), axis=1) / cnt
    r_l1 = jnp.sum(jnp.where(fin, runl1, 0.0), axis=1) / cnt
    # return order matches the single-chip negatives._hubness_both_approx —
    # the two are documented as the same convention; keep them swappable
    return r_sq, r_l1


@lru_cache(maxsize=4)
def _ring_eval_fn(mesh, axis: str, csls_k: int, approx_k: int,
                  ks: tuple, n: int):
    """One jitted (ranks + metrics) callable per eval configuration.

    Cached by identity: before round 4b, ring_hits_at_k rebuilt its
    shard_map/jit closures on EVERY call, so fit_distributed's periodic
    evals re-traced and re-compiled the full s-hop ring loop each interval
    (seconds per eval) instead of hitting the jit cache — exactly the
    dispatch-cost class the single-chip eval fixed in round 2.  maxsize=4:
    one training run only ever uses two entries (history approx + final
    exact), and each entry pins a compiled shard_map executable plus its
    mesh for the cache's lifetime — a large cache retained device memory
    across test-suite mesh sweeps with zero hit-rate benefit (ADVICE r4
    item 4).  Fusing the
    rank pass and the metric reduction into ONE jit also keeps the sharded
    rank vector on device (it spans non-addressable devices under
    multi-process jax.distributed — a host fetch of it would fail, caught
    by the 2-process rehearsal) and costs a single dispatch + one bulk
    readback of the replicated metric stack."""

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis), P(axis), P(axis)),
             out_specs=P(axis))
    def ranks_fn(q, cand, dt, cv, qv):
        r_l1 = r_sq = None
        if csls_k > 0:
            if approx_k > 0:
                r_sq, r_l1 = _ring_hubness_approx_body(cand, q, qv, csls_k, axis)
            else:
                r_l1 = _ring_hubness_body(cand, q, qv, csls_k, "cityblock", axis)
        return _ring_ranks_body(q, cand, dt, cv, axis, csls_k=csls_k,
                                approx_k=approx_k, r_l1=r_l1, r_sq=r_sq)

    @jax.jit
    def eval_fn(q, cand, dt, cv, qv):
        ranks = ranks_fn(q, cand, dt, cv, qv)
        valid = jnp.arange(ranks.shape[0]) < n
        vals = [jnp.sum(jnp.where(valid, ranks < k, False)) / n for k in ks]
        vals.append(jnp.sum(
            jnp.where(valid, 1.0 / (ranks.astype(jnp.float32) + 1.0), 0.0)) / n)
        return jnp.stack(vals)

    return eval_fn


def ring_hits_at_k(
    emb: jnp.ndarray,
    test_pairs,
    mesh,
    ks: tuple[int, ...] = (1, 10),
    axis: str = "graph",
    csls_k: int = 0,
    approx_k: int = 0,
) -> dict[str, float]:
    """Both-direction Hits@k/MRR with ring-rotated candidate shards.

    Semantics match train.eval.hits_at_k (incl. ``csls_k`` — CSLS
    hubness-corrected ranking, exact L1 ring hubness pass — and
    ``approx_k`` — MXU-prefiltered rank counting; with both set, selection
    and hubness are sqeuclidean-approximated exactly like the single-chip
    path, tolerance-tested in tests/test_ring.py).  Ring padding rows are
    masked on both the query side (sliced off before metrics) and the
    candidate side (validity mask in the count)."""
    s_mesh = mesh.shape[axis]
    pairs = np.asarray(test_pairs)
    n = pairs.shape[0]
    n_pad = ((n + s_mesh - 1) // s_mesh) * s_mesh
    l = jnp.take(emb, jnp.asarray(pairs[:, 0]), axis=0)
    r = jnp.take(emb, jnp.asarray(pairs[:, 1]), axis=0)
    d_true = pairwise_l1(l, r)
    pad = n_pad - n
    if pad:
        big = jnp.full((pad, l.shape[1]), 1e30, l.dtype)
        l = jnp.concatenate([l, big])
        r = jnp.concatenate([r, -big])  # far from everything
        d_true = jnp.concatenate([d_true, jnp.full((pad,), -1.0, d_true.dtype)])
        # d_true=-1 → no candidate is strictly closer; padding rows rank 0 but
        # are sliced off before metrics below.
    valid = jnp.arange(n_pad) < n
    vf = valid.astype(jnp.float32)

    eval_fn = _ring_eval_fn(mesh, axis, int(csls_k), int(approx_k),
                            tuple(ks), n)
    out = {}
    with mesh:
        for tag, q, cand in (("l2r", l, r), ("r2l", r, l)):
            m = np.asarray(eval_fn(q, cand, d_true, valid, vf))
            for k, v in zip(ks, m):
                out[f"hits@{k}_{tag}"] = float(v)
            out[f"mrr_{tag}"] = float(m[-1])
    for k in ks:
        out[f"hits@{k}"] = 0.5 * (out[f"hits@{k}_l2r"] + out[f"hits@{k}_r2l"])
    out["mrr"] = 0.5 * (out["mrr_l2r"] + out["mrr_r2l"])
    return out


# ------------------------------------------------------------ k-NN negatives
def _dist_tile(a, b, metric: str):
    """(A, d) × (B, d) -> (A, B) distance tile.  cityblock matches the
    family/oracle semantics (VPU); sqeuclidean rides the MXU."""
    if metric == "sqeuclidean":
        a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
        return (jnp.sum(a32 * a32, -1)[:, None] + jnp.sum(b32 * b32, -1)[None, :]
                - 2.0 * jnp.dot(a32, b32.T, preferred_element_type=jnp.float32))
    return pairwise_l1(a[:, None, :], b[None, :, :]).astype(jnp.float32)


def _ring_hubness_body(cand, qblk, qval, csls_k, metric, axis: str):
    """r(j) for the LOCAL candidate block: mean distance of each candidate to
    its csls_k nearest queries across the whole ring (query blocks rotate;
    candidates stay home).  Matches blockwise_knn_l1's exact hubness term —
    computed from ALL queries, no exclusion masking."""
    s = jax.lax.axis_size(axis)

    def body(i, carry):
        run, qb, qv = carry
        d = _dist_tile(cand, qb, metric)  # (B, Qblk)
        d = jnp.where(qv[None, :] > 0, d, jnp.inf)  # padded queries never near
        allv = jnp.concatenate([run, d], axis=1)
        negtop, _ = jax.lax.top_k(-allv, csls_k)
        perm = _ring_perm(axis)
        return (-negtop,
                jax.lax.ppermute(qb, axis, perm=perm),
                jax.lax.ppermute(qv, axis, perm=perm))

    run0 = _pcast_varying(
        jnp.full((cand.shape[0], csls_k), jnp.inf, jnp.float32), (axis,))
    run, _, _ = jax.lax.fori_loop(0, s, body, (run0, qblk, qval))
    r = run.mean(axis=1)
    # padded candidate rows (sentinel coords) can produce inf/overflow means;
    # zero them like the blockwise path so 2·d − r stays NaN-free
    return jnp.where(jnp.isfinite(r), r, 0.0)


def _ring_topk_body(q, cand, exclude_global, cand_offset0, k, axis: str,
                    metric: str = "cityblock", r_blk=None,
                    approx: bool = False):
    """Running smallest-k over ring-rotated candidate blocks.

    exclude_global: (B,) global candidate index to skip (true partner).
    cand_offset0: scalar — global offset of the LOCAL candidate block; each
    rotation's offset is derived from the source device of the current block.
    r_blk: optional per-candidate CSLS hubness block rotating WITH cand —
    candidates are then ranked by 2·d − r(j) (hubness-corrected mining).
    approx (no CSLS only): the MXU-prefiltered hop — shortlist 2k hop
    candidates by sqeuclidean (matmul tile + cheap approx_min_k), score
    only those exactly, merge a (k + 2k)-wide top-k instead of a
    (k + B)-wide full sort.  The ring analog of the single-chip
    _knn_query_blocked_approx prefilter (DESIGN.md §6c).
    """
    s = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    b = cand.shape[0]
    csls = r_blk is not None
    if not csls:
        r_blk = jnp.zeros((b,), jnp.float32)
    use_prefilter = approx and not csls
    # approx + CSLS: the tile stays exact (incl. the hubness term — same as
    # the single-chip _knn_query_blocked_approx), but the hop-local top-k is
    # an approx_min_k and the merge is (k + k)-wide instead of (k + B)-wide
    use_approx_select = approx and csls
    k2 = min(b, max(2 * k, k + 8))
    k_sel = min(b, k)

    def body(i, carry):
        vals, idxs, cand, rb = carry
        src_dev = (me - i) % s  # who originally owned the block we now hold
        off = cand_offset0 + (src_dev - me) * b
        gidx = off + jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], b), 1)
        if use_prefilter:
            d2 = _dist_tile(q, cand, "sqeuclidean")
            d2 = jnp.where(gidx == exclude_global[:, None], jnp.inf, d2)
            _, spos = jax.lax.approx_min_k(d2, k2, recall_target=0.7)
            sg = jnp.take_along_axis(gidx, spos.astype(jnp.int32), axis=1)
            if metric == "cityblock":  # exact-metric rerank on the shortlist
                g = jnp.take(cand, spos.astype(jnp.int32), axis=0)
                d = pairwise_l1(q[:, None, :], g).astype(jnp.float32)
            else:
                d = jnp.take_along_axis(d2, spos.astype(jnp.int32), axis=1)
            d = jnp.where(sg == exclude_global[:, None], jnp.inf, d)
            allv = jnp.concatenate([vals, d], axis=1)
            alli = jnp.concatenate([idxs, sg], axis=1)
        else:
            d = _dist_tile(q, cand, metric)
            if csls:
                d = 2.0 * d - rb[None, :]
            d = jnp.where(gidx == exclude_global[:, None], jnp.inf, d)
            if use_approx_select:
                dv, spos = jax.lax.approx_min_k(d, k_sel)
                sg = jnp.take_along_axis(gidx, spos.astype(jnp.int32), axis=1)
                allv = jnp.concatenate([vals, dv], axis=1)
                alli = jnp.concatenate([idxs, sg], axis=1)
            else:
                allv = jnp.concatenate([vals, d], axis=1)
                alli = jnp.concatenate([idxs, gidx], axis=1)
        negtop, pos = jax.lax.top_k(-allv, k)
        vals = -negtop
        idxs = jnp.take_along_axis(alli, pos, axis=1)
        perm = _ring_perm(axis)
        cand = jax.lax.ppermute(cand, axis, perm=perm)
        if csls:  # the zeros placeholder needn't ride the ring
            rb = jax.lax.ppermute(rb, axis, perm=perm)
        return vals, idxs, cand, rb

    vals = _pcast_varying(jnp.full((q.shape[0], k), jnp.inf, jnp.float32), (axis,))
    idxs = _pcast_varying(jnp.zeros((q.shape[0], k), jnp.int32), (axis,))
    if not csls:
        r_blk = _pcast_varying(r_blk, (axis,))
    vals, idxs, _, _ = jax.lax.fori_loop(0, s, body, (vals, idxs, cand, r_blk))
    return idxs


def ring_knn(
    q: jnp.ndarray,  # (Q, d) queries (replicated)
    cands: jnp.ndarray,  # (C, d) candidate pool (replicated; sharded inside)
    exclude: jnp.ndarray,  # (Q,) candidate index to exclude
    k: int,
    mesh,
    axis: str = "graph",
    *,
    metric: str = "cityblock",
    csls_k: int = 0,
    approx: bool = False,
) -> jnp.ndarray:
    """Global k-NN indices into cands, computed ring-blockwise.

    ``csls_k > 0`` mines by the CSLS-adjusted score 2·d(q,j) − r(j) — the
    candidate hubness r(j) comes from a FIRST ring pass (query blocks rotate
    past home candidate blocks with a running top-k), then rotates alongside
    its candidate block in the top-k pass.  Semantics match the single-device
    blockwise_knn_l1(csls_k=...) (tests/test_ring.py).
    ``approx`` without CSLS: MXU-prefiltered hops (sqeuclidean shortlist on
    the matmul tile, exact-metric rerank) — see _ring_topk_body; matches the
    single-device neg_approx semantics.  ``approx`` WITH csls_k > 0: the
    distance tile and hubness term stay exact, but each hop's local
    selection is an approx_min_k and the merge is (k + k)-wide instead of
    (k + B)-wide — approximate selection over exact scores
    (tests/test_ring.py::test_ring_knn_approx_csls_tracks_exact)."""
    s_mesh = mesh.shape[axis]
    qn, d = q.shape
    c = cands.shape[0]
    q_pad = ((qn + s_mesh - 1) // s_mesh) * s_mesh
    c_pad = ((c + s_mesh - 1) // s_mesh) * s_mesh
    if q_pad != qn:
        q = jnp.concatenate([q, jnp.zeros((q_pad - qn, d), q.dtype)])
        exclude = jnp.concatenate([exclude, jnp.full((q_pad - qn,), -1, exclude.dtype)])
    qvalid = (jnp.arange(q_pad) < qn).astype(jnp.float32)
    if c_pad != c:
        # sentinel far-away rows; 1e17 keeps sqeuclidean (squares) finite
        cands = jnp.concatenate([cands, jnp.full((c_pad - c, d), 1e17, cands.dtype)])
    b = c_pad // s_mesh

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis), P(axis)),
             out_specs=P(axis, None))
    def knn_fn(qb, cb, ex, qv):
        me = jax.lax.axis_index(axis)
        rb = (_ring_hubness_body(cb, qb, qv, csls_k, metric, axis)
              if csls_k > 0 else None)
        return _ring_topk_body(qb, cb, ex, me * b, k, axis, metric, rb,
                               approx=approx)

    with mesh:
        idxs = knn_fn(q, cands, exclude, qvalid)
    return idxs[:qn]


# ------------------------------------------------- differentiable ring OT loss
def _cost_tile_sq(a, b):
    """Clamped sqeuclidean cost tile on L2-normalized embeddings — the ONE
    cost metric both ring Sinkhorn variants share (matches train/ot.py);
    previously duplicated verbatim in each, which let the padding-mask fix
    diverge between them (round-4b review)."""
    d2 = (
        jnp.sum(a * a, -1)[:, None]
        + jnp.sum(b * b, -1)[None, :]
        - 2.0 * jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    )
    return jnp.maximum(d2, 0.0)


def ring_sinkhorn_align_loss(
    emb: jnp.ndarray,
    pairs: jnp.ndarray,
    mesh,
    tau: float = 0.05,
    n_iters: int = 20,
    axis: str = "graph",
) -> jnp.ndarray:
    """Ring-blockwise version of train.ot.sinkhorn_align_loss, differentiable
    end-to-end: all loops are ``lax.scan`` so reverse-mode AD flows through
    the ``ppermute`` rotations (transpose of a permute is the inverse
    permute).  The full cost matrix never exists; each (query, candidate)
    tile is recomputed per pass — the ring-attention recompute trade.

    Matches the single-device loss to float tolerance (tests/test_ring.py).
    """
    s_mesh = mesh.shape[axis]
    l = jnp.take(emb, pairs[:, 0], axis=0)
    r = jnp.take(emb, pairs[:, 1], axis=0)
    l = l / (jnp.linalg.norm(l, axis=-1, keepdims=True) + 1e-8)
    r = r / (jnp.linalg.norm(r, axis=-1, keepdims=True) + 1e-8)
    n = l.shape[0]
    n_pad = ((n + s_mesh - 1) // s_mesh) * s_mesh
    pad = n_pad - n
    d = l.shape[1]
    if pad:
        l = jnp.concatenate([l, jnp.zeros((pad, d), l.dtype)])
        r = jnp.concatenate([r, jnp.zeros((pad, d), r.dtype)])
    valid = jnp.concatenate([jnp.ones(n), jnp.zeros(pad)]).astype(jnp.float32)
    log_mass = -np.log(n)
    cost_tile = _cost_tile_sq

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis)),
             out_specs=P())
    def solve(lb, rb, vb):
        s = jax.lax.axis_size(axis)
        bq = lb.shape[0]
        pv = lambda x: _pcast_varying(x, (axis,))

        def lse_ring(qblk, pot_other, other_blk):
            """LSE_j[(pot_j − C(q,j))/τ + log valid_j] via scan over rotations."""
            def body(carry, _):
                m, sacc, pot, val, blk = carry
                c = cost_tile(qblk, blk)
                # finite mask sentinel: log(0) = -inf would turn an
                # all-padding tile into exp(-inf - -inf) = nan
                mask = jnp.where(val > 0, 0.0, -1e30)
                z = (pot[None, :] - c) / tau + mask[None, :]
                m2 = jnp.max(z, axis=1)
                s2 = jnp.sum(jnp.exp(z - m2[:, None]), axis=1)
                m, sacc = _lse_merge(m, sacc, m2, s2)
                perm = _ring_perm(axis)
                pot = jax.lax.ppermute(pot, axis, perm=perm)
                val = jax.lax.ppermute(val, axis, perm=perm)
                blk = jax.lax.ppermute(blk, axis, perm=perm)
                return (m, sacc, pot, val, blk), None

            init = (pv(jnp.full((bq,), -1e30, jnp.float32)),
                    pv(jnp.zeros((bq,), jnp.float32)), pot_other, vb, other_blk)
            (m, sacc, *_), _ = jax.lax.scan(body, init, None, length=s)
            return m + jnp.log(jnp.maximum(sacc, 1e-38))

        def iter_body(fg, _):
            f, g = fg
            f = tau * (log_mass - lse_ring(lb, g, rb))
            f = jnp.where(vb > 0, f, 0.0)
            g = tau * (log_mass - lse_ring(rb, f, lb))
            g = jnp.where(vb > 0, g, 0.0)
            return (f, g), None

        f0 = pv(jnp.zeros((bq,), jnp.float32))
        g0 = pv(jnp.zeros((bq,), jnp.float32))
        (f, g), _ = jax.lax.scan(iter_body, (f0, g0), None, length=n_iters)

        # per-pair NLL: log P_ii − LSE_j log P_ij; the f_i/τ terms cancel:
        #   (f+g_i−C_ii)/τ − (f_i/τ + LSE_j((g_j−C_ij)/τ)) = (g_i−C_ii)/τ − lse_i
        c_diag = jnp.sum((lb - rb) ** 2, axis=-1)
        lse_i = lse_ring(lb, g, rb)
        ll = jnp.where(vb > 0, (g - c_diag) / tau - lse_i, 0.0)
        return -jax.lax.psum(jnp.sum(ll), axis) / n

    with mesh:
        return solve(l, r, valid)


# ------------------------------------------------------------- ring Sinkhorn
def _lse_merge(m1, s1, m2, s2):
    """Merge two (max, sumexp) partial log-sum-exp states."""
    m = jnp.maximum(m1, m2)
    s = s1 * jnp.exp(m1 - m) + s2 * jnp.exp(m2 - m)
    return m, s


def ring_sinkhorn_potentials(
    l: jnp.ndarray,  # (S, d) left seed embeddings (replicated in)
    r: jnp.ndarray,  # (S, d) right seed embeddings
    mesh,
    tau: float = 0.05,
    n_iters: int = 20,
    axis: str = "graph",
):
    """Log-domain Sinkhorn with the cost matrix computed tile-by-tile around
    the ring (never materialized globally): each f-update streams candidate
    blocks past each query block with a running log-sum-exp, exactly the
    flash/ring-attention accumulation; the g-update is the mirrored pass.

    Returns (f, g) potentials, full length, replicated.  Cost metric:
    squared euclidean on L2-normalized embeddings (matches train/ot.py).
    """
    s_mesh = mesh.shape[axis]
    n = l.shape[0]
    n_pad = ((n + s_mesh - 1) // s_mesh) * s_mesh
    d = l.shape[1]

    l = l / (jnp.linalg.norm(l, axis=-1, keepdims=True) + 1e-8)
    r = r / (jnp.linalg.norm(r, axis=-1, keepdims=True) + 1e-8)
    pad = n_pad - n
    if pad:
        # padding rows get +inf cost against everything via a mask vector
        l = jnp.concatenate([l, jnp.zeros((pad, d), l.dtype)])
        r = jnp.concatenate([r, jnp.zeros((pad, d), r.dtype)])
    valid = jnp.concatenate([jnp.ones(n), jnp.zeros(pad)]).astype(jnp.float32)
    log_mass = -np.log(n)
    cost_tile = _cost_tile_sq

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis), P(axis)),
             out_specs=(P(axis), P(axis)))
    def solve(lb, rb, vq, vc):
        s = jax.lax.axis_size(axis)
        me = jax.lax.axis_index(axis)
        bq = lb.shape[0]
        f = _pcast_varying(jnp.zeros((bq,), jnp.float32), (axis,))
        g = _pcast_varying(jnp.zeros((bq,), jnp.float32), (axis,))

        def lse_ring(qblk, f_or_g_other, other_valid, other_blk):
            """running LSE_j [(pot_j − C(q, j))/τ] over the rotated other side."""
            # finite sentinel, NOT -inf/log(0): with an all-padding block
            # (n_pad − n ≥ block size, e.g. 9 pairs on 8 devices) every z in
            # the tile would be -inf, making z − max(z) = NaN and poisoning
            # ALL potentials — the same hazard ring_sinkhorn_align_loss's
            # lse_ring already guards (round-4b review backport)
            m0 = _pcast_varying(jnp.full((bq,), -1e30, jnp.float32), (axis,))
            s0 = _pcast_varying(jnp.zeros((bq,), jnp.float32), (axis,))

            def body(i, carry):
                m, sacc, pot, val, blk = carry
                c = cost_tile(qblk, blk)
                mask = jnp.where(val > 0, 0.0, -1e30)
                z = (pot[None, :] - c) / tau + mask[None, :]  # mask pads
                m2 = jnp.max(z, axis=1)
                s2 = jnp.sum(jnp.exp(z - m2[:, None]), axis=1)
                m, sacc = _lse_merge(m, sacc, m2, s2)
                perm = _ring_perm(axis)
                pot = jax.lax.ppermute(pot, axis, perm=perm)
                val = jax.lax.ppermute(val, axis, perm=perm)
                blk = jax.lax.ppermute(blk, axis, perm=perm)
                return m, sacc, pot, val, blk

            m, sacc, *_ = jax.lax.fori_loop(
                0, s, body, (m0, s0, f_or_g_other, other_valid, other_blk)
            )
            return m + jnp.log(jnp.maximum(sacc, 1e-38))

        def iter_body(_, fg):
            f, g = fg
            f = tau * (log_mass - lse_ring(lb, g, vc, rb))
            f = jnp.where(vq > 0, f, 0.0)  # keep pad potentials finite (masked via log(val))
            g = tau * (log_mass - lse_ring(rb, f, vq, lb))
            g = jnp.where(vc > 0, g, 0.0)
            return f, g

        f, g = jax.lax.fori_loop(0, n_iters, iter_body, (f, g))
        return f, g

    with mesh:
        f, g = solve(l, r, valid, valid)
    return f[:n], g[:n]
