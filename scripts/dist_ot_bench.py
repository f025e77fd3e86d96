"""Distributed ring-Sinkhorn OT cost at DWY100K-shape seed counts
(VERDICT r3 missing #2 / next #2).

Before round 4, fit_distributed REJECTED ``sinkhorn_pairs``, so the only way
to run the adopted v7r recipe (use_sinkhorn + --ot-pairs 4096) at config[4]
scale was the uncapped ring loss — ~S² · d · 3 · iters flops per epoch, i.e.
~1e16 at 50–100k seeds: not practically runnable.  This measures the capped
path that now ships: one value+grad call of ``ring_sinkhorn_align_loss`` on a
``--pairs-cap`` subsample (the per-interval batch cost), on the virtual CPU
mesh here / a pod slice as-is, and prints the analytic flop ratio vs the
uncapped problem it replaces.

    python scripts/dist_ot_bench.py [--shards 8] [--dim 128] \
        [--seeds 50000] [--pairs-cap 4096] [--iters 20]

Rows recorded in BASELINE.md (distributed OT rows).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--seeds", type=int, default=50_000,
                    help="DWY100K-scale seed-alignment count")
    ap.add_argument("--pairs-cap", type=int, default=4096,
                    help="sinkhorn_pairs subsample (the v7r --ot-pairs value)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.shards}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from tpugraph.dist.mesh import make_mesh
    from tpugraph.dist.ring import ring_sinkhorn_align_loss

    mesh = make_mesh(args.shards, 1)
    rng = np.random.default_rng(0)
    n_ent = 2 * args.seeds
    emb = jnp.asarray(rng.standard_normal((n_ent, args.dim)).astype(np.float32))
    pairs_all = jnp.asarray(
        np.stack([np.arange(args.seeds), args.seeds + np.arange(args.seeds)], 1)
        .astype(np.int32))
    key = jax.random.PRNGKey(0)
    sub = jax.random.choice(key, args.seeds, (args.pairs_cap,), replace=False)
    ot_pairs = jnp.take(pairs_all, sub, axis=0)

    @jax.jit
    def step(emb):
        return jax.value_and_grad(
            lambda e: ring_sinkhorn_align_loss(
                e, ot_pairs, mesh, tau=0.3, n_iters=args.iters))(emb)

    (loss, g) = step(emb)
    jax.block_until_ready((loss, g))
    t0 = time.perf_counter()
    for _ in range(args.reps):
        loss, g = step(emb)
    jax.block_until_ready((loss, g))
    wall = (time.perf_counter() - t0) / args.reps

    # ~3 full S×S cost-tile passes per Sinkhorn iteration (f, g, final lse)
    # + the backward replay; flops per tile pass ≈ 2·S²·d
    def flops(s):
        return 3 * (args.iters + 1) * 2 * s * s * args.dim * 2  # ×2: fwd+bwd

    print(json.dumps({
        "shards": args.shards, "dim": args.dim, "seeds": args.seeds,
        "pairs_cap": args.pairs_cap, "sinkhorn_iters": args.iters,
        "platform": args.platform,
        "capped_value_and_grad_s": round(wall, 3),
        "loss": round(float(loss), 4),
        "flops_capped": f"{flops(args.pairs_cap):.2e}",
        "flops_uncapped": f"{flops(args.seeds):.2e}",
        "flop_ratio": round(flops(args.seeds) / flops(args.pairs_cap), 1),
    }), flush=True)


if __name__ == "__main__":
    main()
