"""On-chip benchmark: fused Pallas SDDMM+Sinkhorn vs the XLA fallback
(docs/DESIGN.md §4 — backs the "where Pallas does pay" claim with numbers).

Compares, at OT-head-relevant sizes (seed-pair pools; `ot_pairs` caps at
2048–4096 in the recipes):

  * `sinkhorn_potentials_pallas(l, r)` — fused: cost tiles built on the MXU
    in VMEM and consumed by flash-style (max, sumexp) accumulators; the S×S
    cost matrix never exists in HBM.
  * cost = sqeuclidean(l, r) materialized once + `sinkhorn_potentials(cost)`
    — the XLA fallback path (kernels/sinkhorn.py), cost read from HBM every
    logsumexp.

Timing (ADVICE r2 item 1): the default ``--mode chain`` reproduces the
DESIGN.md §4 methodology — N solves chained in one ``lax.scan`` under a
single jit, one host sync at the end, with a separately measured
null-dispatch round-trip subtracted — so the ms-scale per-solve numbers are
not swamped by the ~240 ms tunnel round-trip of a per-rep readback.
``--mode readback`` keeps the old per-rep sync loop for comparison.

    python scripts/sinkhorn_bench.py [--sizes 1024,2048,4096] [--iters 20]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1024,2048,4096")
    ap.add_argument("--iters", type=int, default=20, help="sinkhorn iterations")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--mode", choices=("chain", "readback"), default="chain")
    ap.add_argument("--chain", type=int, default=10,
                    help="solves chained per jit call in --mode chain")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpugraph.kernels.sddmm import pairwise_dist
    from tpugraph.kernels.sinkhorn import sinkhorn_potentials
    from tpugraph.kernels.sinkhorn_pallas import sinkhorn_potentials_pallas

    rng = np.random.default_rng(0)
    for s in [int(x) for x in args.sizes.split(",")]:
        l = jnp.asarray(rng.standard_normal((s, args.dim)), jnp.float32)
        r = jnp.asarray(rng.standard_normal((s, args.dim)), jnp.float32)

        fused = jax.jit(lambda l, r: sinkhorn_potentials_pallas(
            l, r, tau=0.3, n_iters=args.iters))
        xla = jax.jit(lambda l, r: sinkhorn_potentials(
            pairwise_dist(l, r, metric="sqeuclidean")[:l.shape[0]], tau=0.3, n_iters=args.iters))

        if args.mode == "chain":
            # one measured null dispatch: same jit + scalar-readback shape as
            # the chained runs, so subtracting it leaves pure solve time
            null = jax.jit(lambda l, r: jnp.sum(l[0, :1]) + jnp.sum(r[0, :1]))
            float(null(l, r))
            t0 = time.perf_counter()
            for _ in range(args.reps):
                float(null(l, r))
            null_ms = (time.perf_counter() - t0) / args.reps * 1e3

            def chain_time(fn):
                n = args.chain

                @jax.jit
                def run(l, r):
                    def body(acc, i):
                        f, _ = fn(l + 1e-6 * i, r)  # perturb: defeats CSE
                        return acc + jnp.sum(f), None
                    acc, _ = jax.lax.scan(
                        body, jnp.float32(0), jnp.arange(n, dtype=jnp.float32))
                    return acc

                float(run(l, r))  # warmup/compile
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    float(run(l, r))
                per_call = (time.perf_counter() - t0) / args.reps * 1e3
                return max(per_call - null_ms, 0.0) / n

            out = {"pallas_fused": chain_time(
                       lambda a, b: sinkhorn_potentials_pallas(
                           a, b, tau=0.3, n_iters=args.iters)),
                   "xla_fallback": chain_time(
                       lambda a, b: sinkhorn_potentials(
                           pairwise_dist(a, b, metric="sqeuclidean")[:a.shape[0]],
                           tau=0.3, n_iters=args.iters))}
        else:
            out = {}
            for name, fn in (("pallas_fused", fused), ("xla_fallback", xla)):
                # hard host-readback sync per rep: this remote platform's async
                # dispatch makes block_until_ready-only timings wildly unreliable
                # (measured 0.09 ms "runs" of 344 GFLOP solves); each rep then
                # carries one tunnel round-trip, identical for both systems
                f, g = fn(l, r)
                float(jnp.sum(f))
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    f, g = fn(l, r)
                    float(jnp.sum(f))
                out[name] = (time.perf_counter() - t0) / args.reps * 1e3
        # correctness cross-check while we're here
        fp, gp = fused(l, r)
        fx, gx = xla(l, r)
        err = float(jnp.max(jnp.abs(fp - fx)))
        print(json.dumps({"s": s, "d": args.dim, "iters": args.iters,
                          "mode": args.mode,
                          "pallas_ms": round(out["pallas_fused"], 2),
                          "xla_ms": round(out["xla_fallback"], 2),
                          "speedup": round(out["xla_fallback"] / out["pallas_fused"], 2),
                          "max_f_err": round(err, 6)}), flush=True)


if __name__ == "__main__":
    main()
