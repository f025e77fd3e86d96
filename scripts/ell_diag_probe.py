"""Probe: split the self-loop diagonal out of the ELL SpMM.

A = D_loop + B after adjacency build (every entity gets a self-loop).  The
diagonal part needs NO gather: it is a broadcast multiply d[:, None] * x with
perfectly sequential memory access.  At zh-en scale the loops are ~164k of
~1.02M edges (16%); if the SpMM is gather-issue-rate bound (DESIGN.md §3),
removing 16% of the random gathers should buy ~1.15-1.19x.

Bonus structural effect: degree-1 rows (self-loop only) vanish from the ELL
entirely, and every bucket shifts down one degree class.

Usage:  python scripts/ell_diag_probe.py [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


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
    from tpugraph.kernels.spmm_ell import spmm_ell
    from tpugraph.sparse.build import coo_from_triples, coo_normalize
    from tpugraph.sparse.ell import EllOperator, build_ell

    dtype = jnp.dtype(args.dtype)
    task = synthetic_align_task(
        seed=0, n_ent=82_000, n_rel=300, n_triples=195_000, n_pairs=15_000,
        n_attr=0, attrs_per_ent=0,
    )
    n = task.n_ent
    src, dst, w = coo_from_triples(n, task.merged_triples,
                                   n_rel=task.n_rel, weighting="funifun")
    w = coo_normalize(src, dst, w, n, norm="sym")
    nnz = len(src)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((n, args.dim)),
                    dtype=dtype)

    # --- baseline: everything through the ELL ---
    base = EllOperator(fwd=build_ell(src, dst, w, n), bwd=build_ell(dst, src, w, n))

    @jax.jit
    def step_base(x):
        y, vjp = jax.vjp(lambda x: spmm_ell(base, x), x)
        (dx,) = vjp(y)
        return dx

    step_base(x).block_until_ready()
    t0 = time.perf_counter()
    xc = x
    for _ in range(args.iters):
        xc = step_base(xc)
    xc.block_until_ready()
    rate_base = nnz * args.iters / (time.perf_counter() - t0)
    print(f"base (loops in ELL) : {rate_base/1e6:8.1f} M edges/s", flush=True)

    # --- diag split ---
    is_loop = src == dst
    d = np.zeros(n)
    np.add.at(d, src[is_loop], w[is_loop])
    off = ~is_loop
    src_o, dst_o, w_o = src[off], dst[off], w[off]
    offop = EllOperator(fwd=build_ell(src_o, dst_o, w_o, n),
                        bwd=build_ell(dst_o, src_o, w_o, n))
    dvec = jnp.asarray(d, jnp.float32)

    def apply_split(x):
        return (dvec[:, None] * x.astype(jnp.float32)).astype(x.dtype) \
            + spmm_ell(offop, x)

    @jax.jit
    def step_split(x):
        y, vjp = jax.vjp(apply_split, x)
        (dx,) = vjp(y)
        return dx

    # correctness vs base on the same input
    y0 = jax.jit(lambda x: spmm_ell(base, x))(x)
    y1 = jax.jit(apply_split)(x)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32))))
    print(f"max |base - split| = {err:.2e}", flush=True)

    step_split(x).block_until_ready()
    t0 = time.perf_counter()
    xc = x
    for _ in range(args.iters):
        xc = step_split(xc)
    xc.block_until_ready()
    rate_split = nnz * args.iters / (time.perf_counter() - t0)
    print(f"diag-split          : {rate_split/1e6:8.1f} M edges/s "
          f"({rate_split/rate_base:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
