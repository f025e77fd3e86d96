"""Negative sampling for the alignment loss — fully on device.

Covers the reference family's per-epoch host-RNG corruption sampling
(SURVEY.md §2.1) plus the HGCN/RDGCN-style truncated nearest-neighbour
("hard") sampling, rebuilt TPU-first:

* uniform: `jax.random` with explicit keys — the same key schedule on every
  host keeps multi-host gradients bit-identical (SURVEY.md §7 hard part 6);
* hard: blockwise L1 k-NN over the opposite KG's entity pool, computed with
  a `lax.scan` over candidate blocks and a running top-k merge so the
  (S × N) distance matrix is never materialized (ring/blockwise pattern,
  SURVEY.md §5.7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpugraph.train.losses import pairwise_l1


def sample_uniform_negatives(
    key: jax.Array, pairs: jnp.ndarray, n_ent_1: int, n_ent: int, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Corrupt left slot within KG1 ids, right slot within KG2 global ids."""
    s = pairs.shape[0]
    kl, kr = jax.random.split(key)
    neg_l = jax.random.randint(kl, (s, k), 0, n_ent_1, dtype=jnp.int32)
    neg_r = jax.random.randint(kr, (s, k), n_ent_1, n_ent, dtype=jnp.int32)
    return neg_l, neg_r


def _topk_merge(run_vals, run_idx, new_vals, new_idx, k):
    """Merge running smallest-k with a new block of candidates."""
    vals = jnp.concatenate([run_vals, new_vals], axis=1)
    idx = jnp.concatenate([run_idx, new_idx], axis=1)
    neg_top, pos = jax.lax.top_k(-vals, k)
    return -neg_top, jnp.take_along_axis(idx, pos, axis=1)


@partial(jax.jit, static_argnames=("k", "block_c", "metric", "approx", "csls_k"))
def blockwise_knn_l1(
    q: jnp.ndarray,  # (S, d) queries
    cands: jnp.ndarray,  # (C, d) candidate pool
    exclude: jnp.ndarray,  # (S,) candidate index to mask out (true partner), -1 = none
    k: int,
    block_c: int = 1024,
    metric: str = "cityblock",
    approx: bool = False,
    csls_k: int = 0,
) -> jnp.ndarray:
    """Indices (into cands) of the k nearest candidates per query.

    metric='cityblock' matches the family/oracle (VPU-bound: S·C·d ops);
    metric='sqeuclidean' rides the MXU (‖a‖²+‖b‖²−2ab) — the only viable
    mining metric at DWY100K scale (100k×100k×d).

    approx=True switches structure entirely: block over QUERIES, compute the
    full-width distance tile on the MXU, one ``lax.approx_min_k`` per tile —
    no running-merge loop (measured: the exact candidate-block merge costs
    seconds at zh-en scale because XLA top_k is a full sort per merge, while
    the MXU tile + approx_min_k is ~ms).  Negatives are a sampling strategy,
    so approximate neighbors are semantically fine.

    csls_k > 0 mines by the CSLS-adjusted score 2·d(q,j) − r(j) instead of
    raw distance (r(j) = candidate j's mean distance to its csls_k nearest
    queries — Conneau et al.; the query-side hubness term is constant within
    a row so it cannot change a row's top-k and is dropped).  Matches
    parity/torch_ref.sample_hard_negatives(csls_k=...)."""
    s, d = q.shape
    c = cands.shape[0]
    if approx:
        return _knn_query_blocked_approx(q, cands, exclude, k, metric, csls_k=csls_k)
    c_pad = ((c + block_c - 1) // block_c) * block_c
    # pad value: inf is fine for L1; for the matmul form it would produce
    # 0*inf = nan, so use a large finite sentinel there
    pad_val = jnp.inf if metric == "cityblock" else 1e15
    cands_p = jnp.concatenate(
        [cands, jnp.full((c_pad - c, d), pad_val, dtype=cands.dtype)], axis=0
    )
    n_blocks = c_pad // block_c
    blocks = cands_p.reshape(n_blocks, block_c, d)
    offsets = jnp.arange(n_blocks, dtype=jnp.int32) * block_c

    init_vals = jnp.full((s, k), jnp.inf, dtype=jnp.float32)
    init_idx = jnp.zeros((s, k), dtype=jnp.int32)

    q2 = jnp.sum(q.astype(jnp.float32) ** 2, axis=1)

    def body(carry, blk):
        rv, ri = carry
        cb, off = blk
        if metric == "sqeuclidean":
            c32 = cb.astype(jnp.float32)
            dmat = (q2[:, None] + jnp.sum(c32 * c32, axis=1)[None, :]
                    - 2.0 * jnp.dot(q.astype(jnp.float32), c32.T,
                                    preferred_element_type=jnp.float32))
        else:
            dmat = pairwise_l1(q[:, None, :], cb[None, :, :]).astype(jnp.float32)  # (S, Bc)
        if csls_k > 0:
            # candidate hubness from the UNMASKED block column (every query is
            # present in each candidate block, so this is exact, not blockwise)
            r_neg, _ = jax.lax.top_k(-dmat.T, csls_k)  # (Bc, csls_k)
            r = -r_neg.mean(axis=1)
            r = jnp.where(jnp.isfinite(r), r, 0.0)  # padding cols: keep inf−inf out
            dmat = 2.0 * dmat - r[None, :]
        cidx = off + jax.lax.broadcasted_iota(jnp.int32, (s, block_c), 1)
        dmat = jnp.where(cidx == exclude[:, None], jnp.inf, dmat)
        return _topk_merge(rv, ri, dmat, cidx, k), None

    (vals, idx), _ = jax.lax.scan(body, (init_vals, init_idx), (blocks, offsets))
    # tiny-pool fill: columns never filled from a real candidate keep their
    # (inf, 0) init, and the inf-masked partner itself survives the merge
    # when the pool is exhausted — both could hand the loss the query's own
    # positive partner as a "negative" (same class as the approx-path pad,
    # ADVICE r4 item 2).  Replace with the row's best valid column.
    bad = jnp.isinf(vals) | (idx == exclude[:, None])
    idx = jnp.where(bad, idx[:, :1], idx)
    return idx


def _cand_hubness(q, cands, csls_k, metric, block_c: int = 4096):
    """r(j) = mean distance of candidate j to its csls_k nearest queries,
    blockwise over candidates (one (Bc, S) tile per step)."""
    s, d = q.shape
    c = cands.shape[0]
    c_pad = ((c + block_c - 1) // block_c) * block_c
    cp = jnp.concatenate([cands, jnp.zeros((c_pad - c, d), cands.dtype)])
    cb = cp.reshape(c_pad // block_c, block_c, d)
    q32 = q.astype(jnp.float32)
    q2 = jnp.sum(q32 * q32, axis=1)

    def body(_, blk):
        if metric == "sqeuclidean":
            b32 = blk.astype(jnp.float32)
            dmat = (jnp.sum(b32 * b32, axis=1)[:, None] + q2[None, :]
                    - 2.0 * jnp.dot(b32, q32.T, preferred_element_type=jnp.float32))
        else:
            dmat = pairwise_l1(blk[:, None, :], q[None, :, :]).astype(jnp.float32)  # (Bc, S)
        r_neg, _ = jax.lax.top_k(-dmat, csls_k)
        return None, -r_neg.mean(axis=1)

    _, r = jax.lax.scan(body, None, cb)
    return r.reshape(c_pad)[:c]


@partial(jax.jit, static_argnames=("k", "block_c"))
def _hubness_both_approx(q_pool, cands, k, block_c: int = 4096):
    """(r_sq, r_l1): candidate j's mean sqeuclidean and mean exact-L1
    distance to its k nearest queries, with "nearest" selected by
    sqeuclidean on the MXU (``approx_min_k``).

    Fused single-sweep replacement for the
    (``_cand_hubness(metric='sqeuclidean')`` + sqeuclidean-selected mean-L1)
    pair the approx CSLS paths (serve / bootstrap / approx eval) previously
    computed as TWO full (Bc, S) sweeps — both terms share one d² matmul
    tile and one selection per candidate block, and ``_cand_hubness``'s
    full-width ``lax.top_k`` row sort (the measured mining-bottleneck
    structure, DESIGN.md §6c) never runs.  Ring analog:
    dist/ring._ring_hubness_approx_body (same select-by-sq / score-by-L1
    convention, tolerance-tested in tests/test_ring.py)."""
    s, d = q_pool.shape
    c = cands.shape[0]
    k = min(k, s)
    c_pad = ((c + block_c - 1) // block_c) * block_c
    cp = jnp.concatenate([cands, jnp.zeros((c_pad - c, d), cands.dtype)])
    cb = cp.reshape(c_pad // block_c, block_c, d)
    q32 = q_pool.astype(jnp.float32)
    q2 = jnp.sum(q32 * q32, axis=1)

    def body(_, blk):
        b32 = blk.astype(jnp.float32)
        d2 = (jnp.sum(b32 * b32, axis=1)[:, None] + q2[None, :]
              - 2.0 * jnp.dot(b32, q32.T, preferred_element_type=jnp.float32))
        hv2, hpos = jax.lax.approx_min_k(d2, k)
        qk = jnp.take(q_pool, hpos.astype(jnp.int32), axis=0)  # (Bc, k, d)
        l1 = pairwise_l1(blk[:, None, :], qk).astype(jnp.float32)
        return None, (hv2.mean(axis=1), l1.mean(axis=1))

    _, (r_sq, r_l1) = jax.lax.scan(body, None, cb)
    return r_sq.reshape(c_pad)[:c], r_l1.reshape(c_pad)[:c]


def _knn_query_blocked_approx(q, cands, exclude, k, metric, block_q: int = 4096,
                              csls_k: int = 0, r_cand=None):
    """Query-blocked approx k-NN: one full-width MXU distance tile per query
    block, one approx_min_k per tile.  Tile memory = block_q × C × 4 bytes.

    ``r_cand``: optional precomputed candidate-hubness vector (C,) for the
    csls_k > 0 score — callers that already hold the fused
    ``_hubness_both_approx`` result (approx eval) pass it here so the
    internal ``_cand_hubness`` sweep is skipped."""
    s, d = q.shape
    c = cands.shape[0]
    q_pad = ((s + block_q - 1) // block_q) * block_q
    qp = jnp.concatenate([q, jnp.zeros((q_pad - s, d), q.dtype)])
    ep = jnp.concatenate([exclude, jnp.full((q_pad - s,), -1, exclude.dtype)])
    qb = qp.reshape(q_pad // block_q, block_q, d)
    eb = ep.reshape(q_pad // block_q, block_q)
    c2 = jnp.sum(cands.astype(jnp.float32) ** 2, axis=1)
    if r_cand is None:
        if csls_k == 0:
            r_cand = jnp.zeros((c,), jnp.float32)
        elif metric == "sqeuclidean":
            # fused approx hubness (r_sq term): replaces _cand_hubness's
            # full-width top_k row sort on the DWY-scale mining default
            # (sqeuclidean + CSLS).  Measured at 15k×100k d=256 k=100:
            # standalone hubness ~180 → ~20 ms device (9×); inside the full
            # mining call the hubness scan is ~5 ms of device time in the
            # trace (BASELINE.md round-4b).  Mining is a sampling strategy;
            # approx selection of the hubness k-NN is tolerance-tested.
            r_cand = _hubness_both_approx(q, cands, csls_k)[0]
        else:
            # cityblock + CSLS keeps the exact L1 hubness: its semantics
            # mirror the exact-merge path, and the combination is not on
            # any hot recipe path (see the prefilter note below)
            r_cand = _cand_hubness(q, cands, csls_k, metric)
    scale = 2.0 if csls_k > 0 else 1.0

    # cityblock + no CSLS: MXU-prefiltered — shortlist by sqeuclidean (one
    # MXU matmul tile per query block) then exact-L1 rerank WITHIN the
    # shortlist only.  Before round 3 this branch computed the full
    # block_q × C exact-L1 tile on the VPU (the "approx" was only in the
    # top-k), which the train-step trace showed dominating hard-mining
    # epochs (~2× the rest of the step combined — DESIGN.md §6c).  Same
    # structure as train/eval._ranks_l1_prefiltered; negatives are a
    # sampling strategy, so shortlist misses are semantically fine.
    # (cityblock + csls_k > 0 keeps the exact tile: its hubness term is
    # L1-exact and the combination is not on any hot recipe path.)
    prefilter_l1 = metric == "cityblock" and csls_k == 0
    # pool smaller than k: approx_min_k(width < k) is a hard error, while the
    # exact merge path degrades gracefully via its inf/0 init (round-4b
    # review — same class as the serve small-pool fix).  Select k_eff and pad
    # the result columns with candidate 0, matching the exact path's fill.
    k_eff = min(k, c)
    k_short = min(c, max(2 * k_eff, k_eff + 8))

    def body(_, blk):
        qq, ex = blk
        if metric == "sqeuclidean" or prefilter_l1:
            dmat = (jnp.sum(qq.astype(jnp.float32) ** 2, axis=1)[:, None] + c2[None, :]
                    - 2.0 * jnp.dot(qq.astype(jnp.float32), cands.astype(jnp.float32).T,
                                    preferred_element_type=jnp.float32))
        else:
            dmat = pairwise_l1(qq[:, None, :], cands[None, :, :]).astype(jnp.float32)
        dmat = scale * dmat - r_cand[None, :]
        cidx = jax.lax.broadcasted_iota(jnp.int32, (block_q, c), 1)
        dmat = jnp.where(cidx == ex[:, None], jnp.inf, dmat)
        if prefilter_l1:
            # recall_target=0.7 on the SHORTLIST selection only: measured
            # 22× cheaper than the 0.95 default at k_short=200 over 82k
            # candidates (13.4 → 0.6 ms; DESIGN.md §6c) — misses are
            # replaced by near-misses, the exact-L1 rerank below still
            # orders what's kept, and negatives are a sampling strategy.
            # The direct sqeuclidean path (used by approx EVAL) keeps the
            # 0.95 default — eval tolerance is a tested contract.
            _, sidx = jax.lax.approx_min_k(dmat, k_short, recall_target=0.7)
            g = jnp.take(cands, sidx, axis=0)  # (block_q, k_short, d)
            d_l1 = pairwise_l1(qq[:, None, :], g).astype(jnp.float32)
            # re-mask the excluded partner (it may have entered the shortlist)
            d_l1 = jnp.where(sidx == ex[:, None], jnp.inf, d_l1)
            # approx_min_k, not top_k: the exact rerank's full row sort cost
            # 16.7 ms/epoch at zh-en scale vs ~2 ms for the partial reduction
            _, pos = jax.lax.approx_min_k(d_l1, k_eff)
            return None, jnp.take_along_axis(sidx, pos.astype(jnp.int32),
                                             axis=1).astype(jnp.int32)
        _, idx = jax.lax.approx_min_k(dmat, k_eff)
        return None, idx.astype(jnp.int32)

    _, idx = jax.lax.scan(body, None, (qb, eb))
    idx = idx.reshape(q_pad, k_eff)[:s]
    if k_eff < k:
        # tiny-pool pad: TILE the row's best-scoring column rather than
        # constant candidate 0 — the exclusion mask ran before selection, so
        # a 0-fill could re-admit the query's own positive partner whenever
        # its id is 0 (ADVICE r4 item 2).  Trailing columns are duplicates
        # of a valid negative, which the margin loss merely double-counts.
        idx = jnp.concatenate([idx, jnp.tile(idx[:, :1], (1, k - k_eff))], axis=1)
    if k >= c:
        # pool exhausted (k_eff == c): the selection had to take every
        # candidate, INCLUDING the inf-masked partner — re-apply the
        # exclusion (column 0 is the best-scoring valid candidate; the
        # partner sorts last, so it is never column 0 unless c == 1)
        idx = jnp.where(idx == exclude[:, None], idx[:, :1], idx)
    return idx


def sample_hard_negatives(
    emb: jnp.ndarray,
    pairs: jnp.ndarray,
    n_ent_1: int,
    n_ent: int,
    k: int,
    block_c: int = 1024,
    metric: str = "cityblock",
    approx: bool = False,
    csls_k: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Truncated k-NN negatives: the k closest non-partner entities of the
    opposite KG, in current embedding space (semantics match
    parity/torch_ref.sample_hard_negatives).  csls_k > 0 ranks candidates by
    the CSLS-adjusted score (hubness-corrected hard mining)."""
    e_l = jnp.take(emb, pairs[:, 0], axis=0)
    e_r = jnp.take(emb, pairs[:, 1], axis=0)
    cand_l = jax.lax.slice_in_dim(emb, 0, n_ent_1, axis=0)
    cand_r = jax.lax.slice_in_dim(emb, n_ent_1, n_ent, axis=0)
    neg_r = blockwise_knn_l1(e_l, cand_r, pairs[:, 1] - n_ent_1, k, block_c, metric,
                             approx, csls_k) + n_ent_1
    neg_l = blockwise_knn_l1(e_r, cand_l, pairs[:, 0], k, block_c, metric, approx,
                             csls_k)
    return neg_l, neg_r
