"""Companion to mining_select_probe.py: does narrowing the prefilter
shortlist (k_short) cost mining recall at zh-en scale, d=128?

Compares the prefiltered mining's top-k against the exact-L1 top-k on
correlated (trained-like) embeddings for k_short ∈ {k+8, 2k}; recall is the
mean per-query overlap fraction.  Decides ROADMAP c's k_short lever.

    python scripts/mining_kshort_recall.py [--dim 128] [--s 4096] [--c 82000]
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--s", type=int, default=4096)
    ap.add_argument("--c", type=int, default=82_000)
    ap.add_argument("--k", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpugraph.train.losses import pairwise_l1

    rng = np.random.default_rng(0)
    # correlated pools: queries are noisy copies of candidate rows, like a
    # mid-training alignment embedding space
    cands = rng.standard_normal((args.c, args.dim)).astype(np.float32)
    q = (cands[rng.integers(0, args.c, args.s)]
         + 0.6 * rng.standard_normal((args.s, args.dim)).astype(np.float32))
    qj, cj = jnp.asarray(q), jnp.asarray(cands)
    k = args.k

    @jax.jit
    def exact_topk(qq):
        def body(carry, blk):
            rv, ri = carry
            cb, off = blk
            d = pairwise_l1(qq[:, None, :], cb[None, :, :]).astype(jnp.float32)
            cidx = off + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
            vals = jnp.concatenate([rv, d], 1)
            idxs = jnp.concatenate([ri, cidx], 1)
            neg, pos = jax.lax.top_k(-vals, k)
            return (-neg, jnp.take_along_axis(idxs, pos, 1)), None

        bc = 2048
        c_pad = ((args.c + bc - 1) // bc) * bc
        cp = jnp.concatenate([cj, jnp.full((c_pad - args.c, args.dim), jnp.inf)])
        blocks = cp.reshape(-1, bc, args.dim)
        offs = jnp.arange(blocks.shape[0], dtype=jnp.int32) * bc
        init = (jnp.full((qq.shape[0], k), jnp.inf), jnp.zeros((qq.shape[0], k), jnp.int32))
        (v, i), _ = jax.lax.scan(body, init, (blocks, offs))
        return i

    def prefiltered(qq, k_short):
        d2 = (jnp.sum(qq ** 2, 1)[:, None] + jnp.sum(cj ** 2, 1)[None, :]
              - 2.0 * jnp.dot(qq, cj.T, preferred_element_type=jnp.float32))
        _, sidx = jax.lax.approx_min_k(d2, k_short, recall_target=0.7)
        sidx = sidx.astype(jnp.int32)
        g = jnp.take(cj, sidx, axis=0)
        dl1 = pairwise_l1(qq[:, None, :], g).astype(jnp.float32)
        _, pos = jax.lax.approx_min_k(dl1, k)
        return jnp.take_along_axis(sidx, pos.astype(jnp.int32), 1)

    want = np.asarray(exact_topk(qj))
    for k_short in (k + 8, 2 * k, 4 * k):
        got = np.asarray(jax.jit(lambda qq: prefiltered(qq, k_short))(qj))
        rec = np.mean([len(set(a) & set(b)) / k for a, b in zip(want, got)])
        print(json.dumps({"dim": args.dim, "c": args.c, "k": k,
                          "k_short": k_short, "recall_vs_exact": round(float(rec), 4)}),
              flush=True)


if __name__ == "__main__":
    main()
