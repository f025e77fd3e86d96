"""Per-phase epoch profile at zh-en scale on the chip (ROADMAP perf item 1).

Times each component of a steady-state training epoch separately — train
step (fwd+bwd+update), hard-negative mining (exact merge vs approx MXU),
bootstrap proposal, and Hits@k eval (with/without CSLS) — so optimization
effort goes where the time is.

    python scripts/epoch_profile.py [--n-ent 82000] [--dtype bfloat16]

Prints one JSON line per phase.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def timed(fn, *args, reps=5, **kw):
    import jax

    out = fn(*args, **kw)
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
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--k-neg", type=int, default=100)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.models.encoder import AlignGCN
    from tpugraph.sparse.build import build_adjacency
    from tpugraph.train.bootstrap import propose_mutual_nn_pairs
    from tpugraph.train.eval import hits_at_k
    from tpugraph.train.losses import margin_align_loss
    from tpugraph.train.negatives import sample_hard_negatives

    task = synthetic_align_task(seed=0, n_ent=args.n_ent, n_rel=300,
                                n_triples=args.n_triples, n_pairs=15_000,
                                n_attr=0, attrs_per_ent=0)
    op = build_adjacency(task.n_ent, task.merged_triples, n_rel=task.n_rel,
                         weighting="funifun", norm="sym", fmt="ell")
    model = AlignGCN(n_ent=task.n_ent, dim=args.dim, compute_dtype=args.dtype,
                     spmm_impl="ell")
    params = model.init(jax.random.PRNGKey(0), op)["params"]
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)
    pairs = jnp.asarray(task.train_pairs)
    n1, n = task.kg1.n_ent, task.n_ent

    import numpy as np
    neg_l = jnp.asarray(np.random.default_rng(0).integers(0, n1, (pairs.shape[0], args.k_neg)), jnp.int32)
    neg_r = jnp.asarray(np.random.default_rng(1).integers(n1, n, (pairs.shape[0], args.k_neg)), jnp.int32)

    @jax.jit
    def train_step(params, opt_state, neg_l, neg_r):
        def loss_fn(p):
            emb = model.apply({"params": p}, op)
            return margin_align_loss(emb, pairs, neg_l, neg_r, 15.0)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def embed(params):
        return model.apply({"params": params}, op)

    emb = embed(params)

    mine_exact = jax.jit(lambda e: sample_hard_negatives(
        e, pairs, n1, n, args.k_neg, metric="cityblock", approx=False))
    mine_approx = jax.jit(lambda e: sample_hard_negatives(
        e, pairs, n1, n, args.k_neg, metric="sqeuclidean", approx=True))

    m1 = np.ones(n1, bool); m1[task.train_pairs[:, 0]] = False
    m2 = np.ones(n - n1, bool); m2[task.train_pairs[:, 1] - n1] = False
    mask1, mask2 = jnp.asarray(m1), jnp.asarray(m2)
    boot = jax.jit(lambda e: propose_mutual_nn_pairs(
        e, mask1, mask2, n1, n, 2500, metric="sqeuclidean", csls_k=0))
    boot_l1 = jax.jit(lambda e: propose_mutual_nn_pairs(
        e, mask1, mask2, n1, n, 2500, csls_k=0))  # recipe-default exact L1
    boot_ap = jax.jit(lambda e: propose_mutual_nn_pairs(
        e, mask1, mask2, n1, n, 2500, csls_k=0, approx=True))

    test_pairs = jnp.asarray(task.test_pairs)
    results = {}
    results["train_step_ms"] = timed(lambda: train_step(params, opt_state, neg_l, neg_r)) * 1e3
    results["embed_ms"] = timed(lambda: embed(params)) * 1e3
    results["mine_exact_ms"] = timed(lambda: mine_exact(emb), reps=2) * 1e3
    results["mine_approx_ms"] = timed(lambda: mine_approx(emb)) * 1e3
    results["boot_propose_ms"] = timed(lambda: boot(emb)) * 1e3
    results["boot_propose_l1_exact_ms"] = timed(lambda: boot_l1(emb), reps=2) * 1e3
    results["boot_propose_approx_ms"] = timed(lambda: boot_ap(emb)) * 1e3
    results["eval_ms"] = timed(lambda: hits_at_k(emb, test_pairs), reps=2) * 1e3
    results["eval_csls_ms"] = timed(lambda: hits_at_k(emb, test_pairs, csls_k=10), reps=2) * 1e3
    # the --fast history-eval path (MXU-prefiltered shortlist), incl. the
    # round-2 CSLS-aware shortlist fix — what steps_per_call training uses
    results["eval_approx_ms"] = timed(
        lambda: hits_at_k(emb, test_pairs, approx_k=128), reps=2) * 1e3
    results["eval_approx_csls_ms"] = timed(
        lambda: hits_at_k(emb, test_pairs, approx_k=128, csls_k=10), reps=2) * 1e3
    for k, v in results.items():
        print(json.dumps({"phase": k, "ms": round(v, 2)}), flush=True)


if __name__ == "__main__":
    main()
