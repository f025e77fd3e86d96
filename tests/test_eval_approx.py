"""MXU-prefiltered approximate eval (train/eval.py::_ranks_l1_prefiltered).

Semantics contract: with a shortlist covering the whole candidate pool the
approx path must reproduce the exact rank-counting path bit-for-bit (raw L1);
at realistic shortlist sizes the reported Hits@1/@10 must track the exact
numbers closely on trained-like embeddings (planted matches + noise — the
regime the training-history evals run in).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpugraph.train.eval import hits_at_k


def _trained_like_embeddings(seed, n_test, dim, noise):
    """Position-aligned test pairs whose embeddings look mid-training:
    matched entities are noisy copies, plus a few hub rows."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_test, dim)).astype(np.float32)
    left = base + noise * rng.normal(size=(n_test, dim)).astype(np.float32)
    right = base + noise * rng.normal(size=(n_test, dim)).astype(np.float32)
    right[: n_test // 20] *= 0.05  # hubs: near-origin rows attract L1 ranks
    emb = np.concatenate([left, right], 0)
    pairs = np.stack([np.arange(n_test), n_test + np.arange(n_test)], 1)
    return jnp.asarray(emb), jnp.asarray(pairs.astype(np.int32))


def test_full_shortlist_matches_exact_bitwise():
    emb, pairs = _trained_like_embeddings(0, 200, 32, noise=0.6)
    exact = hits_at_k(emb, pairs)
    approx = hits_at_k(emb, pairs, approx_k=200)  # shortlist == whole pool
    for key in exact:
        assert approx[key] == pytest.approx(exact[key], abs=1e-12), key


@pytest.mark.parametrize("csls_k", [0, 10])
@pytest.mark.parametrize("noise", [0.3, 0.8])
def test_shortlisted_hits_track_exact(csls_k, noise):
    emb, pairs = _trained_like_embeddings(1, 600, 48, noise=noise)
    exact = hits_at_k(emb, pairs, csls_k=csls_k)
    approx = hits_at_k(emb, pairs, csls_k=csls_k, approx_k=128)
    for key in ("hits@1", "hits@10", "mrr"):
        assert abs(approx[key] - exact[key]) <= 0.02, (
            f"{key}: approx {approx[key]:.4f} vs exact {exact[key]:.4f}")


def test_true_match_never_counts_against_itself():
    # degenerate case: all rows identical -> every distance ties the true
    # distance; strict-less counting must rank everyone 0 in both paths
    emb = jnp.ones((40, 16), jnp.float32)
    pairs = jnp.stack([jnp.arange(20), 20 + jnp.arange(20)], 1).astype(jnp.int32)
    exact = hits_at_k(emb, pairs)
    approx = hits_at_k(emb, pairs, approx_k=8)
    assert exact["hits@1"] == 1.0 and approx["hits@1"] == 1.0


def test_approx_k_caps_at_pool_size():
    emb, pairs = _trained_like_embeddings(2, 64, 16, noise=0.4)
    big = hits_at_k(emb, pairs, approx_k=4096)  # > pool size: must clamp
    exact = hits_at_k(emb, pairs)
    for key in exact:
        assert big[key] == pytest.approx(exact[key], abs=1e-12), key


def test_trainer_history_uses_approx_final_stays_exact():
    """fit() with eval_approx_k set still reports exact FINAL metrics."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.train.loop import fit

    task = synthetic_align_task(seed=3, n_ent=300, n_rel=8, n_triples=900)
    cfg = get_config("base", epochs=6, eval_every=3, dim=32, k_neg=5,
                     neg_mode="uniform", eval_approx_k=64)
    res = fit(cfg, task=task)
    assert res.history, "history evals should have run"
    # the final metrics come from the exact path: recompute and compare
    exact = hits_at_k(
        res.model.apply({"params": res.params}, res.op),
        jnp.asarray(task.test_pairs))
    assert res.metrics["hits@1"] == pytest.approx(exact["hits@1"], abs=1e-12)
