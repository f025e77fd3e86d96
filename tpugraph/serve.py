"""Alignment inference / serving utilities.

After training, the product is the entity-embedding table; serving an
alignment means answering "for this KG1 entity, which KG2 entities match?"
This module provides the jitted query path and a bulk exporter:

* ``topk_alignments`` — blockwise top-k candidate search (never materializes
  the full distance matrix), optional CSLS re-scoring.
* ``export_alignments`` — bulk predictions for a set of left entities to a
  TSV (rank lists) — the artifact downstream KG-fusion pipelines consume.
* ``save_embeddings`` / ``load_embeddings`` — Orbax round-trip of the table.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpugraph.train.losses import pairwise_l1


@partial(jax.jit, static_argnames=("k", "block_c", "csls_k", "approx_k"))
def _topk_query(emb, query_ids, candidate_ids, k, block_c=2048, csls_k=0,
                approx_k=0):
    """Single-dispatch query path: the id gathers, the blockwise search, and
    the idx→entity-id mapping all run inside ONE jit — eager gathers cost a
    tunnel round-trip each on this platform (round-2 eval fix; serve got the
    same treatment in round 3, measured in BASELINE.md serve rows)."""
    q = jnp.take(emb, query_ids, axis=0)
    cands = jnp.take(emb, candidate_ids, axis=0)
    if approx_k > 0:
        vals, idx = _topk_prefiltered(q, cands, k, approx_k, csls_k)
    else:
        vals, idx = _topk_blockwise(q, cands, k, block_c, csls_k)
    return vals, jnp.take(candidate_ids, idx)


def _topk_prefiltered(q, cands, k, approx_k, csls_k=0, block_q: int = 4096):
    """MXU-prefiltered top-k (VERDICT r3 weak #3: serve missed the round-3
    prefilter sweep — the exact path's full-width L1 tiles + a full top_k
    sort-merge per block were exactly the structure the trace anatomy showed
    dominating mining/eval).  Per query block: one sqeuclidean matmul tile on
    the MXU shortlists ``approx_k`` candidates (selection score 2·d₂ − r₂(j)
    under CSLS so hubness-promoted candidates aren't dropped — the
    train/eval._ranks_l1_prefiltered subtlety), then the exact L1 (or
    approx-L1-CSLS) rescore + a single top_k run on the shortlist only.
    Same structure, tolerance contract as the approx eval path
    (tests/test_serve.py).

    Deliberately NOT a call into negatives._knn_query_blocked_approx even
    though the scan skeleton rhymes: serving's contract is (sorted
    best-first values AND ids) under the serve CSLS convention, while the
    mining helper returns unsorted index sets for sampling (approx_min_k
    final selection, exclude-partner masking, recall_target=0.7 shortlist).
    The genuinely shared piece — the fused hubness sweep — IS shared
    (_hubness_both_approx above)."""
    s, d = q.shape
    c = cands.shape[0]
    kk = min(c, max(approx_k, k))
    if csls_k > 0:
        # one fused sweep for BOTH hubness terms (selection r₂ + score r):
        # previously two full (Bc, S) sweeps, one with a full-width top_k
        # row sort (_cand_hubness) — measured 2.1× on the serve CSLS row
        # (BASELINE.md round-4 fused-hubness rows)
        from tpugraph.train.negatives import _hubness_both_approx

        r_sel, r_score = _hubness_both_approx(q, cands, csls_k)
        scale = 2.0
    else:
        r_sel = r_score = jnp.zeros((c,), jnp.float32)
        scale = 1.0
    q_pad = ((s + block_q - 1) // block_q) * block_q
    qp = jnp.concatenate([q, jnp.zeros((q_pad - s, d), q.dtype)])
    qb = qp.reshape(q_pad // block_q, block_q, d)
    c2 = jnp.sum(cands.astype(jnp.float32) ** 2, axis=1)

    def body(_, qq):
        d2 = (jnp.sum(qq.astype(jnp.float32) ** 2, axis=1)[:, None] + c2[None, :]
              - 2.0 * jnp.dot(qq.astype(jnp.float32), cands.astype(jnp.float32).T,
                              preferred_element_type=jnp.float32))
        sel = scale * d2 - r_sel[None, :]
        _, sidx = jax.lax.approx_min_k(sel, kk)
        sidx = sidx.astype(jnp.int32)
        g = jnp.take(cands, sidx, axis=0)  # (block_q, kk, d)
        score = scale * pairwise_l1(qq[:, None, :], g).astype(jnp.float32) \
            - jnp.take(r_score, sidx)
        if kk < k:
            # candidate pool smaller than k (kk clamps to C): pad the
            # shortlist so top_k(k) is well-formed — inf scores mark the
            # fill rows, matching the exact path's padded-candidate
            # convention (callers see score=inf ⇒ no such candidate)
            score = jnp.pad(score, ((0, 0), (0, k - kk)),
                            constant_values=jnp.inf)
            sidx = jnp.pad(sidx, ((0, 0), (0, k - kk)))
        negtop, pos = jax.lax.top_k(-score, k)  # sorted best-first
        return None, (-negtop, jnp.take_along_axis(sidx, pos, axis=1))

    _, (vals, idx) = jax.lax.scan(body, None, qb)
    return (vals.reshape(q_pad, k)[:s], idx.reshape(q_pad, k)[:s])


def _topk_blockwise(q, cands, k, block_c=2048, csls_k=0):
    s = q.shape[0]
    c, d = cands.shape
    r_cand = jnp.zeros((c,), jnp.float32)
    scale = 1.0
    if csls_k > 0:
        from tpugraph.train.negatives import _cand_hubness

        r_cand = _cand_hubness(q, cands, csls_k, "cityblock")
        scale = 2.0
    c_pad = ((c + block_c - 1) // block_c) * block_c
    cands_p = jnp.concatenate([cands, jnp.full((c_pad - c, d), jnp.inf, cands.dtype)])
    corr_p = jnp.concatenate([r_cand, jnp.zeros(c_pad - c, jnp.float32)])
    blocks = cands_p.reshape(c_pad // block_c, block_c, d)
    corr_blocks = corr_p.reshape(c_pad // block_c, block_c)
    offsets = jnp.arange(c_pad // block_c, dtype=jnp.int32) * block_c

    def body(carry, blk):
        rv, ri = carry
        cb, corr, off = blk
        dmat = scale * pairwise_l1(q[:, None, :], cb[None, :, :]).astype(jnp.float32) \
            - corr[None, :]
        cidx = off + jax.lax.broadcasted_iota(jnp.int32, (s, block_c), 1)
        allv = jnp.concatenate([rv, dmat], axis=1)
        alli = jnp.concatenate([ri, cidx], axis=1)
        negtop, pos = jax.lax.top_k(-allv, k)
        return (-negtop, jnp.take_along_axis(alli, pos, axis=1)), None

    init = (jnp.full((s, k), jnp.inf, jnp.float32), jnp.zeros((s, k), jnp.int32))
    (vals, idx), _ = jax.lax.scan(body, init, (blocks, corr_blocks, offsets))
    return vals, idx


def topk_alignments(
    emb: jnp.ndarray,
    query_ids: np.ndarray,  # entity ids to align (global/merged ids)
    candidate_ids: np.ndarray,  # candidate pool (e.g. all KG2 entities)
    k: int = 10,
    block_c: int = 2048,
    csls_k: int = 0,
    approx_k: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (scores (Q, k), candidate entity ids (Q, k)), best first.

    csls_k > 0 ranks by the CSLS-adjusted score 2·d(q,j) − r(j) (candidate
    hubness vs this query pool; same convention as train/eval.py) — scores
    are then CSLS values, not raw distances.

    approx_k > 0 switches to the MXU-prefiltered path (``_topk_prefiltered``):
    top-k searched within a sqeuclidean top-``approx_k`` shortlist per query
    — measured 20–40× cheaper at DWY100K scale (BASELINE.md serve rows),
    approximate (tested tracking tolerance vs exact, tests/test_serve.py;
    with CSLS the hubness term is the MXU approximation too).

    One device dispatch + one host readback per call: rows come back already
    sorted best-first (each scan step's lax.top_k re-sorts the running k)."""
    vals, ids = _topk_query(
        jnp.asarray(emb),
        jnp.asarray(query_ids, dtype=jnp.int32),
        jnp.asarray(candidate_ids, dtype=jnp.int32),
        k, block_c, csls_k, approx_k)
    return np.asarray(vals), np.asarray(ids)


def export_alignments(path: str, emb, query_ids, candidate_ids, k: int = 10,
                      csls_k: int = 0, approx_k: int = 0) -> int:
    """Write '<query>\\t<cand1>:<d1>\\t...' per line; returns #rows written."""
    vals, ids = topk_alignments(emb, query_ids, candidate_ids, k=k, csls_k=csls_k,
                                approx_k=approx_k)
    with open(path, "w") as f:
        for qi, (row_ids, row_d) in zip(query_ids, zip(ids, vals)):
            cells = "\t".join(f"{int(c)}:{float(d):.6f}" for c, d in zip(row_ids, row_d))
            f.write(f"{int(qi)}\t{cells}\n")
    return len(query_ids)


def save_embeddings(path: str, emb) -> None:
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), {"emb": emb})
    ckptr.wait_until_finished()


def load_embeddings(path: str):
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))["emb"]


def main(argv=None) -> int:
    """Bulk-alignment CLI: ``python -m tpugraph.serve --emb <ckpt> --out f.tsv``.

    Query/candidate sets come from id files (one int per line) or from an
    ``--n-left`` split of the merged table (ids < n_left query the rest)."""
    import argparse

    ap = argparse.ArgumentParser(
        prog="python -m tpugraph.serve",
        description="Export top-k entity alignments from a trained embedding table.")
    ap.add_argument("--emb", required=True,
                    help="embedding checkpoint dir (serve.save_embeddings)")
    ap.add_argument("--out", required=True, help="output TSV path")
    ap.add_argument("--queries", default=None,
                    help="file of query entity ids, one per line")
    ap.add_argument("--candidates", default=None,
                    help="file of candidate entity ids, one per line")
    ap.add_argument("--n-left", type=int, default=None,
                    help="merged-id split: ids [0,n) query ids [n,N) "
                         "(default when no id files are given)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--csls-k", type=int, default=0,
                    help=">0: CSLS hubness-corrected re-scoring")
    ap.add_argument("--approx-k", type=int, default=0,
                    help=">0: MXU-prefiltered search within a sqeuclidean "
                         "top-K shortlist (20-40x cheaper at 100k scale, "
                         "approximate)")
    args = ap.parse_args(argv)

    emb = load_embeddings(args.emb)
    n = emb.shape[0]
    if args.queries:
        query_ids = np.loadtxt(args.queries, dtype=np.int64).reshape(-1)
    elif args.n_left is not None:
        query_ids = np.arange(args.n_left)
    else:
        ap.error("need --queries or --n-left")
    if args.candidates:
        candidate_ids = np.loadtxt(args.candidates, dtype=np.int64).reshape(-1)
    elif args.n_left is not None:
        candidate_ids = np.arange(args.n_left, n)
    else:
        ap.error("need --candidates or --n-left")

    rows = export_alignments(args.out, emb, query_ids, candidate_ids,
                             k=args.k, csls_k=args.csls_k, approx_k=args.approx_k)
    print(f"wrote {rows} rows x top-{args.k} to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
