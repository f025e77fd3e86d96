"""Serve-path latency benchmark (VERDICT r2 Next #8 — the one subsystem
with no measured number).

Measures ``topk_alignments`` on the real chip at zh-en scale: cold (first
call, includes compile) and warm (steady-state per call, including the host
readback — what a serving caller actually waits).  The warm number is also
split into device time (lax.scan-chained, single sync, null-dispatch
subtracted — same methodology as scripts/sinkhorn_bench.py) vs end-to-end.

    python scripts/serve_bench.py [--n-left 19000] [--n-right 19000]
        [--dim 256] [--k 10] [--reps 8]

Rows recorded in BASELINE.md ("Serve path" rows).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-left", type=int, default=19000)
    ap.add_argument("--n-right", type=int, default=19000)
    ap.add_argument("--n-query", type=int, default=10500,
                    help="queries per call (zh-en test-set scale)")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--approx-k", type=int, default=64,
                    help="MXU-prefiltered shortlist size (round 4 rows)")
    ap.add_argument("--chain", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpugraph.serve import _topk_query, topk_alignments

    rng = np.random.default_rng(0)
    n = args.n_left + args.n_right
    emb = jnp.asarray(rng.standard_normal((n, args.dim)), jnp.float32)
    emb.block_until_ready()
    q_ids = np.arange(args.n_query, dtype=np.int32)
    c_ids = np.arange(args.n_left, n, dtype=np.int32)

    for csls_k, approx_k in ((0, 0), (10, 0), (0, args.approx_k), (10, args.approx_k)):
        # cold: compile + first answer (fresh static config per combo)
        t0 = time.perf_counter()
        vals, ids = topk_alignments(emb, q_ids, c_ids, k=args.k, csls_k=csls_k,
                                    approx_k=approx_k)
        cold_s = time.perf_counter() - t0

        # warm end-to-end: full python call incl. host readback
        t0 = time.perf_counter()
        for _ in range(args.reps):
            vals, ids = topk_alignments(emb, q_ids, c_ids, k=args.k,
                                        csls_k=csls_k, approx_k=approx_k)
        warm_ms = (time.perf_counter() - t0) / args.reps * 1e3

        # device-only: chain N queries in one jit, single sync, null-subtract
        null = jax.jit(lambda e: jnp.sum(e[0, :1]))
        float(null(emb))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            float(null(emb))
        null_ms = (time.perf_counter() - t0) / args.reps * 1e3

        qj = jnp.asarray(q_ids)
        cj = jnp.asarray(c_ids)

        @jax.jit
        def chained(e, qi, ci):
            def body(acc, i):
                v, _ = _topk_query(e + 1e-6 * i, qi, ci, args.k, 2048, csls_k,
                                   approx_k)
                return acc + jnp.sum(v), None
            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(args.chain, dtype=jnp.float32))
            return acc

        float(chained(emb, qj, cj))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            float(chained(emb, qj, cj))
        dev_ms = max((time.perf_counter() - t0) / args.reps * 1e3 - null_ms,
                     0.0) / args.chain

        print(json.dumps({
            "n_query": args.n_query, "n_cand": args.n_right, "d": args.dim,
            "k": args.k, "csls_k": csls_k, "approx_k": approx_k,
            "cold_s": round(cold_s, 2),
            "warm_e2e_ms": round(warm_ms, 1),
            "device_ms": round(dev_ms, 2),
            "null_roundtrip_ms": round(null_ms, 1)}), flush=True)


if __name__ == "__main__":
    main()
