"""Round-4 probe: shortlist-selection cost in the MXU-prefiltered mining at
d=128 (ROADMAP c / VERDICT r3 next #7).

Round 3 established that in ``_knn_query_blocked_approx``'s prefiltered
cityblock path the ``approx_min_k`` over the (block_q, C) selection-score
tile dominates its own cost at d=128 — the matmul tile shrinks with d while
the selection is d-independent.  Candidate levers, measured head-to-head on
the real chip at zh-en mining shapes (S=15k queries, C=82k candidates):

  a. recall_target sweep on the shortlist selection (0.5 / 0.7 / 0.9);
  b. k_short sweep (the shortlist width the selection must keep);
  c. ``aggregate_to_topk=False`` — keep approx_min_k's per-segment partial
     winners unaggregated (skips the final cross-segment sort) and feed the
     exact-L1 rerank the wider-but-unsorted shortlist directly; the rerank's
     own approx_min_k does the only real ordering work.

Each timing is a lax.scan-chained jit (single sync), null-dispatch
subtracted — the sinkhorn_bench methodology.  Keep-or-kill per DESIGN.md
§6c; results recorded there either way.

    python scripts/mining_select_probe.py [--dim 128] [--s 15000] [--c 82000]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timed(fn, *args, reps=5, chain=4):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        def body(acc, i):
            out = fn(*a, jitter=i)
            return acc + jnp.sum(out.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(chain, dtype=jnp.float32))
        return acc

    null = jax.jit(lambda a0, *rest: jnp.sum(a0[0, :1]))
    float(null(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(null(*args))
    null_s = (time.perf_counter() - t0) / reps

    float(chained(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        float(chained(*args))
    return max((time.perf_counter() - t0) / reps - null_s, 0.0) / chain * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--s", type=int, default=15_000)
    ap.add_argument("--c", type=int, default=82_000)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--block-q", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpugraph.train.losses import pairwise_l1

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((args.block_q, args.dim)), jnp.float32)
    cands = jnp.asarray(rng.standard_normal((args.c, args.dim)), jnp.float32)
    k = args.k

    def tile(qq, cands, jitter):
        return (jnp.sum(qq ** 2, 1)[:, None] + jnp.sum(cands ** 2, 1)[None, :]
                - 2.0 * jnp.dot(qq + 1e-6 * jitter, cands.T,
                                preferred_element_type=jnp.float32))

    rows = []

    # matmul tile alone (the floor)
    ms_tile = timed(lambda qq, cands, jitter: tile(qq, cands, jitter), q, cands)
    rows.append({"variant": "tile_only", "ms_per_block": round(ms_tile, 2)})

    # production path: select k_short then exact-L1 rerank (round-3 recipe)
    def prod(qq, cands, jitter, k_short, rt, agg=True):
        d2 = tile(qq, cands, jitter)
        _, sidx = jax.lax.approx_min_k(d2, k_short, recall_target=rt,
                                       aggregate_to_topk=agg)
        sidx = sidx.astype(jnp.int32)
        g = jnp.take(cands, sidx, axis=0)
        d_l1 = pairwise_l1(qq[:, None, :], g).astype(jnp.float32)
        _, pos = jax.lax.approx_min_k(d_l1, k)
        return jnp.take_along_axis(sidx, pos.astype(jnp.int32), axis=1)

    k_short0 = max(2 * k, k + 8)
    for rt in (0.5, 0.7, 0.9):
        ms = timed(lambda qq, cands, jitter, rt=rt:
                   prod(qq, cands, jitter, k_short0, rt), q, cands)
        rows.append({"variant": f"select_rt{rt}", "k_short": k_short0,
                     "ms_per_block": round(ms, 2)})
    for ks in (k + 8, 4 * k):
        ms = timed(lambda qq, cands, jitter, ks=ks:
                   prod(qq, cands, jitter, ks, 0.7), q, cands)
        rows.append({"variant": "k_short_sweep", "k_short": ks,
                     "ms_per_block": round(ms, 2)})

    # unaggregated selection: skip the cross-segment sort, rerank the wider
    # raw shortlist (shape = whatever approx_min_k's segmentation yields)
    def prod_unagg(qq, cands, jitter):
        d2 = tile(qq, cands, jitter)
        _, sidx = jax.lax.approx_min_k(d2, k_short0, recall_target=0.7,
                                       aggregate_to_topk=False)
        sidx = sidx.astype(jnp.int32)
        g = jnp.take(cands, sidx, axis=0)
        d_l1 = pairwise_l1(qq[:, None, :], g).astype(jnp.float32)
        _, pos = jax.lax.approx_min_k(d_l1, k)
        return jnp.take_along_axis(sidx, pos.astype(jnp.int32), axis=1)

    try:
        ms = timed(prod_unagg, q, cands)
        # report the widened shortlist the rerank must chew through
        w = jax.eval_shape(
            lambda d2: jax.lax.approx_min_k(d2, k_short0, recall_target=0.7,
                                            aggregate_to_topk=False),
            jax.ShapeDtypeStruct((args.block_q, args.c), jnp.float32))[1].shape[1]
        rows.append({"variant": "unaggregated", "raw_width": int(w),
                     "ms_per_block": round(ms, 2)})
    except Exception as e:  # platform may reject the flag combination
        rows.append({"variant": "unaggregated", "error": str(e)[:120]})

    for r in rows:
        print(json.dumps({"dim": args.dim, "c": args.c, "k": k, **r}),
              flush=True)


if __name__ == "__main__":
    main()
