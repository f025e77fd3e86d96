"""Per-component profile of the v7 recipe train step at zh-en scale.

The BASELINE.md v7-at-scale rows cost ~335 ms/epoch vs 55 ms for the v1
recipe — this script decomposes one v7 epoch into its device programs so
optimization goes where the time is (ROADMAP perf item 1, continued):

  encoder fwd / fwd+bwd, margin loss (vs emb), Sinkhorn OT loss (vs emb),
  attribute head, bootstrap proposal, approx hard mining, Hits@k eval.

    python scripts/v7_profile.py [--n-ent 82000] [--dim 256]

Prints one JSON line per component.  Loss components are differentiated with
respect to the embedding matrix only (encoder bwd is timed once, separately),
so the pieces add up to a step without double-counting the encoder.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def timed(fn, *args, reps=5, **kw):
    import jax

    out = fn(*args, **kw)  # compile + warm
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-ent", type=int, default=82_000, help="per side")
    ap.add_argument("--n-triples", type=int, default=195_000)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--k-neg", type=int, default=100)
    ap.add_argument("--ot-pairs", type=int, default=4096)
    ap.add_argument("--boot-cap", type=int, default=2500)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.models.encoder import AlignGCN
    from tpugraph.models.heads import AttributeHead
    from tpugraph.sparse.build import build_adjacency
    from tpugraph.train.bootstrap import propose_mutual_nn_pairs
    from tpugraph.train.eval import hits_at_k
    from tpugraph.train.losses import margin_align_loss
    from tpugraph.train.negatives import sample_hard_negatives
    from tpugraph.train.ot import sinkhorn_align_loss

    task = synthetic_align_task(seed=42, n_ent=args.n_ent, n_rel=60,
                                n_triples=args.n_triples, drop_frac=0.1,
                                noise_frac=0.1)
    op = build_adjacency(task.n_ent, task.merged_triples, n_rel=task.n_rel,
                         weighting="funifun", norm="sym", fmt="ell")
    model = AlignGCN(n_ent=task.n_ent, dim=args.dim, compute_dtype=args.dtype,
                     spmm_impl="ell")
    params = model.init(jax.random.PRNGKey(0), op)["params"]
    n1, n = task.kg1.n_ent, task.n_ent
    pairs = jnp.asarray(task.train_pairs)
    s_seed = pairs.shape[0]
    rng = np.random.default_rng(0)
    # augmented margin batch exactly as fit_mtl builds it: seed + boot pairs
    boot = np.stack([rng.integers(0, n1, args.boot_cap),
                     rng.integers(n1, n, args.boot_cap)], 1)
    pairs_aug = jnp.concatenate([pairs, jnp.asarray(boot, jnp.int32)], 0)
    w = jnp.concatenate([jnp.ones((s_seed,), jnp.float32),
                         jnp.zeros((args.boot_cap,), jnp.float32)], 0)
    s_all = pairs_aug.shape[0]
    neg_l = jnp.asarray(rng.integers(0, n1, (s_all, args.k_neg)), jnp.int32)
    neg_r = jnp.asarray(rng.integers(n1, n, (s_all, args.k_neg)), jnp.int32)
    ot_pairs = pairs[:args.ot_pairs]
    attr_bs = 8192
    attr_triples = jnp.asarray(task.merged_attr_triples[:attr_bs])
    attr_head = AttributeHead(n_attr=task.n_attr)
    attr_params = attr_head.init(jax.random.PRNGKey(1),
                                 jnp.zeros((1, args.dim), jnp.float32),
                                 attr_triples[:1])["params"]

    embed = jax.jit(lambda p: model.apply({"params": p}, op))
    emb = jax.block_until_ready(embed(params))
    shapes = {"dim": args.dim, "n_ent": n, "dtype": args.dtype}

    report = {}

    def rec(name, value):
        report[name] = value
        print(json.dumps({"component": name, "ms": round(value * 1e3, 2),
                          **shapes}), flush=True)

    rec("encoder_fwd", timed(embed, params))

    @jax.jit
    def encoder_fwd_bwd(p):
        return jax.grad(lambda p: jnp.sum(model.apply({"params": p}, op)))(p)

    rec("encoder_fwd_bwd", timed(encoder_fwd_bwd, params))

    @jax.jit
    def margin_fwd_bwd(e):
        return jax.value_and_grad(
            lambda e: margin_align_loss(e, pairs_aug, neg_l, neg_r, 15.0, w))(e)

    rec("margin_loss_fwd_bwd_vs_emb", timed(margin_fwd_bwd, emb))

    @jax.jit
    def ot_fwd_bwd(e):
        return jax.value_and_grad(
            lambda e: sinkhorn_align_loss(e, ot_pairs, tau=0.3, n_iters=20))(e)

    rec("sinkhorn_fwd_bwd_vs_emb", timed(ot_fwd_bwd, emb))

    @jax.jit
    def attr_fwd_bwd(e, ap_):
        return jax.value_and_grad(
            lambda e, ap_: attr_head.apply({"params": ap_}, e, attr_triples),
            argnums=(0, 1))(e, ap_)

    rec("attr_head_fwd_bwd", timed(attr_fwd_bwd, emb, attr_params))

    m1 = np.ones(n1, bool)
    m1[task.train_pairs[:, 0]] = False
    m2 = np.ones(n - n1, bool)
    m2[task.train_pairs[:, 1] - n1] = False
    mask1, mask2 = jnp.asarray(m1), jnp.asarray(m2)

    @jax.jit
    def propose(e):
        return propose_mutual_nn_pairs(e, mask1, mask2, n1, n, args.boot_cap,
                                       metric="sqeuclidean", csls_k=0)

    rec("boot_propose", timed(propose, emb))

    @jax.jit
    def mine(e):
        return sample_hard_negatives(e, pairs_aug, n1, n, args.k_neg,
                                     metric="sqeuclidean", approx=True)

    rec("hard_mine_approx", timed(mine, emb))

    test_pairs = jnp.asarray(task.test_pairs)
    rec("eval_hits_csls10", timed(
        lambda e: hits_at_k(e, test_pairs, csls_k=10), emb, reps=2))
    print(json.dumps({"s_seed": s_seed, "s_aug": s_all,
                      "n_test": int(test_pairs.shape[0]), **shapes}), flush=True)


if __name__ == "__main__":
    main()
