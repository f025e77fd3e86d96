"""Probe: does gather *locality* move the ELL SpMM rate on the chip?

docs/DESIGN.md §3 established the ELL SpMM is bound by the random-row gather
rate (~167-197M rows/s) and that padding slots (which all gather row 0, i.e.
a cache/row-buffer-resident line) are effectively free.  That asymmetry
suggests locality is a real lever: if consecutive gathers hit nearby source
rows, the effective row rate should rise.

Variants measured here (same logical operator, same nnz, bit-identical
output up to reduction order / a global entity permutation):

  base      — build_ell as shipped (bucket rows ascending by entity id,
              src ascending within a row)
  rowsort   — bucket rows re-ordered by their first (min) source id, so
              successive rows gather from nearby regions of x
  rcm       — global reverse-Cuthill-McKee entity renumbering (bandwidth-
              reducing); x and all ids permuted consistently
  rcm+rowsort — both

Usage:  python scripts/ell_locality_probe.py [--dtype bfloat16] [--iters 16]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def rowsort_ell(m):
    """Reorder rows inside each bucket by min source id (locality order).

    Output semantics identical: row_order is rebuilt to match.
    """
    import jax.numpy as jnp

    from tpugraph.sparse.ell import EllBucket, EllMatrix

    new_buckets = []
    concat_rows = []
    for b in m.buckets:
        idx = np.asarray(b.idx)
        w = np.asarray(b.w)
        rows = np.asarray(b.rows)
        # min over real (weight>0) slots; padded slots point at 0 which would
        # always win the min — mask them out
        masked = np.where(np.asarray(w) != 0.0, idx, np.iinfo(np.int32).max)
        key = masked.min(axis=1)
        order = np.argsort(key, kind="stable")
        new_buckets.append(
            EllBucket(rows=jnp.asarray(rows[order]), idx=jnp.asarray(idx[order]),
                      w=jnp.asarray(w[order]), k=b.k)
        )
        concat_rows.append(rows[order])
    all_rows = np.concatenate(concat_rows) if concat_rows else np.zeros(0, np.int64)
    total = len(all_rows)
    row_order = np.full(m.n_rows, total, np.int64)
    row_order[all_rows] = np.arange(total)
    return EllMatrix(buckets=new_buckets, row_order=jnp.asarray(row_order.astype(np.int32)),
                     n_rows=m.n_rows, nnz=m.nnz)


def bench_op(op, dim, dtype, iters):
    import jax
    import jax.numpy as jnp

    from tpugraph.kernels.spmm_ell import spmm_ell as spmm

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((op.n_rows, dim)), dtype=dtype
    )

    @jax.jit
    def step(x):
        y, vjp = jax.vjp(lambda x: spmm(op, x), x)
        (dx,) = vjp(y)
        return dx

    step(x).block_until_ready()
    t0 = time.perf_counter()
    xc = x
    for _ in range(iters):
        xc = step(xc)
    xc.block_until_ready()
    wall = time.perf_counter() - t0
    return op.nnz * iters / wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--dim", type=int, default=128)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.sparse.build import coo_from_triples, coo_normalize
    from tpugraph.sparse.ell import EllOperator, build_ell

    dtype = jnp.dtype(args.dtype)
    task = synthetic_align_task(
        seed=0, n_ent=82_000, n_rel=300, n_triples=195_000, n_pairs=15_000,
        n_attr=0, attrs_per_ent=0,
    )
    src, dst, w = coo_from_triples(task.n_ent, task.merged_triples,
                                   n_rel=task.n_rel, weighting="funifun")
    w = coo_normalize(src, dst, w, task.n_ent, norm="sym")

    def ell_of(s, d, ww, n):
        return EllOperator(fwd=build_ell(s, d, ww, n), bwd=build_ell(d, s, ww, n))

    results = {}
    base = ell_of(src, dst, w, task.n_ent)
    results["base"] = bench_op(base, args.dim, dtype, args.iters)
    print(f"base         : {results['base']/1e6:8.1f} M edges/s", flush=True)

    rs = EllOperator(fwd=rowsort_ell(base.fwd), bwd=rowsort_ell(base.bwd))
    results["rowsort"] = bench_op(rs, args.dim, dtype, args.iters)
    print(f"rowsort      : {results['rowsort']/1e6:8.1f} M edges/s", flush=True)

    # RCM renumbering
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    a = sp.coo_matrix((np.ones(len(src)), (dst, src)),
                      shape=(task.n_ent, task.n_ent)).tocsr()
    perm = reverse_cuthill_mckee(a, symmetric_mode=True)  # new order of old ids
    inv = np.empty_like(perm)
    inv[perm] = np.arange(task.n_ent)  # old id -> new id
    src_r, dst_r = inv[src], inv[dst]
    rcm = ell_of(src_r, dst_r, w, task.n_ent)
    results["rcm"] = bench_op(rcm, args.dim, dtype, args.iters)
    print(f"rcm          : {results['rcm']/1e6:8.1f} M edges/s", flush=True)

    rcm_rs = EllOperator(fwd=rowsort_ell(rcm.fwd), bwd=rowsort_ell(rcm.bwd))
    results["rcm+rowsort"] = bench_op(rcm_rs, args.dim, dtype, args.iters)
    print(f"rcm+rowsort  : {results['rcm+rowsort']/1e6:8.1f} M edges/s", flush=True)

    # degree-descending renumbering: all hub rows land in one small hot
    # region of x (top-4096 sources carry ~40% of edges — DESIGN.md §3), so
    # a large share of gathers should become cache/row-buffer hits if the
    # platform gather exploits temporal locality (the padding-row evidence
    # says it does)
    out_deg = np.bincount(src, minlength=task.n_ent)
    perm_d = np.argsort(-out_deg, kind="stable")  # new order of old ids
    inv_d = np.empty_like(perm_d)
    inv_d[perm_d] = np.arange(task.n_ent)
    deg_op = ell_of(inv_d[src], inv_d[dst], w, task.n_ent)
    results["degsort"] = bench_op(deg_op, args.dim, dtype, args.iters)
    print(f"degsort      : {results['degsort']/1e6:8.1f} M edges/s", flush=True)

    deg_rs = EllOperator(fwd=rowsort_ell(deg_op.fwd), bwd=rowsort_ell(deg_op.bwd))
    results["degsort+rs"] = bench_op(deg_rs, args.dim, dtype, args.iters)
    print(f"degsort+rs   : {results['degsort+rs']/1e6:8.1f} M edges/s", flush=True)

    # repeat base at the end to bound run-to-run drift
    results["base2"] = bench_op(base, args.dim, dtype, args.iters)
    print(f"base(again)  : {results['base2']/1e6:8.1f} M edges/s", flush=True)


if __name__ == "__main__":
    main()
