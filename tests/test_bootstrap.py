"""Bootstrapped pair augmentation: proposal parity vs the torch oracle,
weighted-loss parity, and trainer integration (fused ≡ unfused)."""

import numpy as np
import pytest
import torch


def _setup(seed=7, n1=80, n2=100, d=12, s=30):
    rng = np.random.default_rng(seed)
    n = n1 + n2
    emb = rng.standard_normal((n, d)).astype(np.float32)
    pairs = np.stack([rng.choice(n1, s, replace=False),
                      n1 + rng.choice(n2, s, replace=False)], 1).astype(np.int32)
    mask1 = np.ones(n1, bool)
    mask1[pairs[:, 0]] = False
    mask2 = np.ones(n2, bool)
    mask2[pairs[:, 1] - n1] = False
    return emb, pairs, mask1, mask2, n1, n


@pytest.mark.parametrize("csls_k", [0, 5])
def test_proposal_matches_oracle(csls_k):
    import jax.numpy as jnp

    from tpugraph.parity import torch_ref
    from tpugraph.train.bootstrap import propose_mutual_nn_pairs

    emb, pairs, mask1, mask2, n1, n = _setup()
    cap = 16
    bp_t, bw_t = torch_ref.propose_mutual_nn_pairs(
        torch.from_numpy(emb), mask1, mask2, n1, n, cap, csls_k=csls_k)
    bp_j, bw_j = propose_mutual_nn_pairs(
        jnp.asarray(emb), jnp.asarray(mask1), jnp.asarray(mask2), n1, n, cap,
        block_c=32, csls_k=csls_k)
    bp_j, bw_j = np.asarray(bp_j), np.asarray(bw_j)
    assert bw_j.tolist() == bw_t.tolist()
    # valid rows must be the same SET of pairs (top-k tie order may differ)
    valid_t = {tuple(r) for r, w in zip(bp_t, bw_t) if w > 0}
    valid_j = {tuple(r) for r, w in zip(bp_j, bw_j) if w > 0}
    assert valid_j == valid_t
    assert len(valid_j) > 0  # the task must actually produce proposals


def test_proposal_pads_when_few_mutual():
    """cap larger than the number of mutual pairs → zero-weight padding rows
    with in-range ids."""
    import jax.numpy as jnp

    from tpugraph.train.bootstrap import propose_mutual_nn_pairs

    emb, pairs, mask1, mask2, n1, n = _setup(seed=3, n1=20, n2=25, s=15)
    cap = 64
    bp, bw = propose_mutual_nn_pairs(
        jnp.asarray(emb), jnp.asarray(mask1), jnp.asarray(mask2), n1, n, cap,
        block_c=16)
    bp, bw = np.asarray(bp), np.asarray(bw)
    assert (bw == 0).any()
    assert (bp[:, 0] >= 0).all() and (bp[:, 0] < n1).all()
    assert (bp[:, 1] >= n1).all() and (bp[:, 1] < n).all()


def test_weighted_margin_loss_parity():
    import jax.numpy as jnp

    from tpugraph.parity import torch_ref
    from tpugraph.train.losses import margin_align_loss

    rng = np.random.default_rng(0)
    n, d, s, k = 60, 8, 20, 4
    emb = rng.standard_normal((n, d)).astype(np.float32)
    pairs = np.stack([rng.choice(30, s), 30 + rng.choice(30, s)], 1)
    neg_l = rng.integers(0, 30, (s, k))
    neg_r = rng.integers(30, 60, (s, k))
    w = rng.random(s).astype(np.float32)
    w[:5] = 0.0
    lt = torch_ref.margin_align_loss(
        torch.from_numpy(emb), torch.from_numpy(pairs.astype(np.int64)),
        torch.from_numpy(neg_l.astype(np.int64)), torch.from_numpy(neg_r.astype(np.int64)),
        gamma=8.0, weights=torch.from_numpy(w))
    lj = margin_align_loss(jnp.asarray(emb), jnp.asarray(pairs.astype(np.int32)),
                           jnp.asarray(neg_l.astype(np.int32)),
                           jnp.asarray(neg_r.astype(np.int32)),
                           gamma=8.0, weights=jnp.asarray(w))
    assert float(lj) == pytest.approx(float(lt), rel=1e-5)


def test_fit_boot_fused_equals_unfused():
    """steps_per_call fusion must stay bitwise-equivalent with bootstrapping on."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.train.loop import fit

    task = synthetic_align_task(seed=5, n_ent=300, n_rel=10, n_triples=1200)
    kw = dict(epochs=12, neg_every=4, k_neg=5, dim=16, eval_every=0,
              boot_cap=8, boot_start=4, boot_weight=0.5)
    r1 = fit(get_config("base", steps_per_call=1, **kw), task=task)
    r2 = fit(get_config("base", steps_per_call=4, **kw), task=task)
    leaves1 = [np.asarray(x) for x in
               __import__("jax").tree_util.tree_leaves(r1.params)]
    leaves2 = [np.asarray(x) for x in
               __import__("jax").tree_util.tree_leaves(r2.params)]
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_propose_mutual_nn_pairs_approx_tracks_exact():
    """MXU-prefiltered proposals (boot_approx): the proposed pair SET stays
    close to the exact-L1 proposal set (mutual-NN + the confidence cap
    tolerate top-1-recall misses)."""
    import jax.numpy as jnp
    import numpy as np

    from tpugraph.train.bootstrap import propose_mutual_nn_pairs

    rng = np.random.default_rng(9)
    n1, n2, d = 300, 320, 32
    n = n1 + n2
    # correlated halves so mutual-NNs actually exist
    base = rng.standard_normal((n1, d)).astype(np.float32)
    emb = np.concatenate([base, np.pad(base, ((0, n2 - n1), (0, 0)))
                          + 0.15 * rng.standard_normal((n2, d)).astype(np.float32)])
    m1 = np.ones(n1, bool)
    m2 = np.ones(n2, bool)
    cap = 64
    pe, we = propose_mutual_nn_pairs(jnp.asarray(emb), jnp.asarray(m1),
                                     jnp.asarray(m2), n1, n, cap)
    pa, wa = propose_mutual_nn_pairs(jnp.asarray(emb), jnp.asarray(m1),
                                     jnp.asarray(m2), n1, n, cap, approx=True)
    se = {tuple(r) for r, w in zip(np.asarray(pe), np.asarray(we)) if w > 0}
    sa = {tuple(r) for r, w in zip(np.asarray(pa), np.asarray(wa)) if w > 0}
    assert len(se) > cap // 2  # the task actually proposes
    overlap = len(se & sa) / max(len(se), 1)
    assert overlap >= 0.7, overlap


def test_propose_mutual_nn_pairs_approx_csls_tracks_exact():
    """boot_approx + boot_csls_k no longer falls back to the exact full-tile
    path (ADVICE r3 item 3): the prefiltered CSLS proposals (sq-CSLS
    shortlist, approx-L1-CSLS rerank) track the exact CSLS proposal set."""
    import jax.numpy as jnp
    import numpy as np

    from tpugraph.train.bootstrap import propose_mutual_nn_pairs

    rng = np.random.default_rng(11)
    n1, n2, d = 300, 320, 32
    n = n1 + n2
    base = rng.standard_normal((n1, d)).astype(np.float32)
    emb = np.concatenate([base, np.pad(base, ((0, n2 - n1), (0, 0)))
                          + 0.15 * rng.standard_normal((n2, d)).astype(np.float32)])
    emb[n1:n1 + 8] *= 0.05  # hub rows: CSLS must demote them
    m1 = np.ones(n1, bool)
    m2 = np.ones(n2, bool)
    cap = 64
    pe, we = propose_mutual_nn_pairs(jnp.asarray(emb), jnp.asarray(m1),
                                     jnp.asarray(m2), n1, n, cap, csls_k=5)
    pa, wa = propose_mutual_nn_pairs(jnp.asarray(emb), jnp.asarray(m1),
                                     jnp.asarray(m2), n1, n, cap, csls_k=5,
                                     approx=True)
    se = {tuple(r) for r, w in zip(np.asarray(pe), np.asarray(we)) if w > 0}
    sa = {tuple(r) for r, w in zip(np.asarray(pa), np.asarray(wa)) if w > 0}
    assert len(se) > cap // 2
    overlap = len(se & sa) / max(len(se), 1)
    assert overlap >= 0.6, overlap


def test_fit_distributed_boot_approx_runs():
    """boot_approx reaches the sharded trainer's proposal path: training
    runs and tracks the exact-proposal run."""
    import numpy as np
    import pytest

    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=35, n_ent=120, n_rel=5, n_triples=500)
    kw = dict(dim=16, epochs=8, eval_every=4, k_neg=4, neg_every=4,
              neg_mode="uniform", syn_n_ent=120, boot_cap=16, boot_start=4,
              boot_weight=0.5, n_shards=4)
    ra = fit_distributed(get_config("base", boot_approx=True, **kw), task=task)
    re_ = fit_distributed(get_config("base", **kw), task=task)
    assert np.isfinite(ra.metrics["final_loss"])
    assert ra.metrics["final_loss"] == pytest.approx(
        re_.metrics["final_loss"], rel=0.1)
