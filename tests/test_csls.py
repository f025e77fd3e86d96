"""CSLS-corrected eval vs a dense numpy reference."""

import numpy as np


def _np_csls_hits(emb, pairs, k_csls=10, ks=(1, 10)):
    from scipy.spatial.distance import cdist

    l, r = emb[pairs[:, 0]], emb[pairs[:, 1]]
    d = cdist(l, r, metric="cityblock")
    rl = np.sort(d, axis=1)[:, :k_csls].mean(1)  # left hubness (to right pool)
    rr = np.sort(d, axis=0)[:k_csls, :].mean(0)  # right hubness (to left pool)
    out = {}
    for tag, dm, corr_cand, corr_q in (("l2r", d, rr, rl), ("r2l", d.T, rl, rr)):
        score = 2 * dm - corr_cand[None, :]  # query term constant per row
        ranks = (score < np.diagonal(score)[:, None]).sum(1)
        for k in ks:
            out[f"hits@{k}_{tag}"] = float((ranks < k).mean())
    return out


def test_csls_matches_dense_numpy():
    import jax.numpy as jnp

    from tpugraph.train.eval import hits_at_k

    rng = np.random.default_rng(0)
    n, d, s = 200, 12, 70
    emb = rng.standard_normal((n, d)).astype(np.float32)
    pairs = np.stack([rng.choice(100, s, replace=False),
                      100 + rng.choice(100, s, replace=False)], 1).astype(np.int32)
    want = _np_csls_hits(emb, pairs, k_csls=5)
    got = hits_at_k(jnp.asarray(emb), jnp.asarray(pairs), block_c=64, csls_k=5)
    import pytest

    for key in ("hits@1_l2r", "hits@10_l2r", "hits@1_r2l", "hits@10_r2l"):
        assert got[key] == pytest.approx(want[key], abs=1e-6), key


def test_csls_zero_is_plain_eval():
    import jax.numpy as jnp

    from tpugraph.train.eval import hits_at_k

    rng = np.random.default_rng(1)
    emb = rng.standard_normal((80, 8)).astype(np.float32)
    pairs = np.stack([np.arange(30), 40 + np.arange(30)], 1).astype(np.int32)
    a = hits_at_k(jnp.asarray(emb), jnp.asarray(pairs), block_c=16)
    b = hits_at_k(jnp.asarray(emb), jnp.asarray(pairs), block_c=16, csls_k=0)
    assert a == b


def test_csls_hard_mining_matches_oracle():
    """JAX blockwise CSLS mining == torch oracle dense CSLS mining (exact path)."""
    import jax.numpy as jnp
    import torch

    from tpugraph.parity import torch_ref
    from tpugraph.train.negatives import sample_hard_negatives

    rng = np.random.default_rng(3)
    n1, n2, d, s, k = 90, 110, 10, 40, 4
    n = n1 + n2
    emb = rng.standard_normal((n, d)).astype(np.float32)
    pairs = np.stack([rng.choice(n1, s, replace=False),
                      n1 + rng.choice(n2, s, replace=False)], 1).astype(np.int32)
    nl_t, nr_t = torch_ref.sample_hard_negatives(
        torch.from_numpy(emb), pairs, n1, n, k=k, csls_k=5)
    nl_j, nr_j = sample_hard_negatives(jnp.asarray(emb), jnp.asarray(pairs),
                                       n1, n, k=k, block_c=32, csls_k=5)
    np.testing.assert_array_equal(np.sort(np.asarray(nl_j), 1), np.sort(nl_t, 1))
    np.testing.assert_array_equal(np.sort(np.asarray(nr_j), 1), np.sort(nr_t, 1))


def test_csls_mining_approx_close_to_exact():
    """approx (query-blocked + hubness pre-pass) recall vs exact CSLS mining."""
    import jax.numpy as jnp

    from tpugraph.train.negatives import sample_hard_negatives

    rng = np.random.default_rng(4)
    n1, n2, d, s, k = 120, 140, 16, 50, 8
    n = n1 + n2
    emb = rng.standard_normal((n, d)).astype(np.float32)
    pairs = np.stack([rng.choice(n1, s, replace=False),
                      n1 + rng.choice(n2, s, replace=False)], 1).astype(np.int32)
    ex_l, ex_r = sample_hard_negatives(jnp.asarray(emb), jnp.asarray(pairs),
                                       n1, n, k=k, block_c=64, csls_k=5)
    ap_l, ap_r = sample_hard_negatives(jnp.asarray(emb), jnp.asarray(pairs),
                                       n1, n, k=k, csls_k=5, approx=True)
    # approx_min_k has high recall on CPU at this scale; require >= 80% overlap
    def recall(a, b):
        hits = [len(set(np.asarray(a)[i]) & set(np.asarray(b)[i])) for i in range(s)]
        return sum(hits) / (s * k)
    assert recall(ex_l, ap_l) >= 0.8
    assert recall(ex_r, ap_r) >= 0.8


def test_fused_hubness_tracks_unfused_pair():
    """negatives._hubness_both_approx (one sweep, approx_min_k selection)
    must track the unfused pair it replaced in serve/bootstrap/approx-eval:
    _cand_hubness(metric='sqeuclidean') (exact top_k selection) for r_sq and
    the sqeuclidean-selected mean-L1 for r_l1."""
    import jax.numpy as jnp

    from tpugraph.train.negatives import _cand_hubness, _hubness_both_approx

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((300, 16)).astype(np.float32))
    cands = jnp.asarray(rng.standard_normal((500, 16)).astype(np.float32))
    k = 10
    r_sq, r_l1 = _hubness_both_approx(q, cands, k)
    r_sq_ref = _cand_hubness(q, cands, k, "sqeuclidean")
    # exact reference for the L1 term: mean L1 to the k sq-nearest queries
    d2 = np.asarray(
        (jnp.sum(cands**2, 1)[:, None] + jnp.sum(q**2, 1)[None, :]
         - 2.0 * cands @ q.T))
    d1 = np.abs(np.asarray(cands)[:, None, :] - np.asarray(q)[None, :, :]).sum(-1)
    near = np.argsort(d2, axis=1)[:, :k]
    r_l1_ref = np.take_along_axis(d1, near, axis=1).mean(1)
    # approx_min_k selection (recall 0.95) vs the exact top-k: means of the
    # selected sets differ only by near-miss swaps — tight relative tolerance
    assert float(jnp.max(jnp.abs(r_sq - r_sq_ref) / (r_sq_ref + 1e-6))) < 0.05
    assert float(np.max(np.abs(np.asarray(r_l1) - r_l1_ref) / (r_l1_ref + 1e-6))) < 0.05
    # small-pool clamp: k > #queries must not crash
    r_sq_s, r_l1_s = _hubness_both_approx(q[:4], cands, 10)
    assert r_sq_s.shape == (500,) and bool(jnp.all(jnp.isfinite(r_l1_s)))


def test_exact_csls_eval_small_pool_not_perfect():
    """Pool smaller than csls_k: the exact hubness term used to keep inf
    pad entries, collapsing every score to -inf and silently reporting
    Hits@k = 1.0 (round-4b eval review)."""
    import jax.numpy as jnp

    from tpugraph.train.eval import hits_at_k

    rng = np.random.default_rng(9)
    emb = jnp.asarray(rng.standard_normal((40, 8)).astype(np.float32))
    pairs = np.stack([np.arange(6), 20 + np.arange(6)], 1).astype(np.int32)
    m_plain = hits_at_k(emb, pairs)  # random data: far from perfect
    m_csls = hits_at_k(emb, pairs, csls_k=10)  # k > pool size 6
    assert m_csls["hits@1"] < 1.0 or m_plain["hits@1"] == 1.0
    # and the clamped-k CSLS (k == pool) matches csls_k > pool exactly
    m_csls6 = hits_at_k(emb, pairs, csls_k=6)
    assert m_csls["hits@1"] == m_csls6["hits@1"]


def test_approx_mining_small_pool_no_crash():
    """Candidate pool smaller than k_neg: approx mining used to crash in
    approx_min_k while the exact path degraded gracefully (round-4b
    review; same class as the serve small-pool fix)."""
    import jax.numpy as jnp

    from tpugraph.train.negatives import sample_hard_negatives

    rng = np.random.default_rng(10)
    emb = jnp.asarray(rng.standard_normal((20, 8)).astype(np.float32))
    pairs = np.stack([np.arange(5), 12 + np.arange(5)], 1).astype(np.int32)
    # KG2 pool has 8 entities < k=10 (and KG1 pool 12 > k in one direction)
    nl_a, nr_a = sample_hard_negatives(emb, jnp.asarray(pairs), 12, 20, k=10,
                                       approx=True)
    nl_e, nr_e = sample_hard_negatives(emb, jnp.asarray(pairs), 12, 20, k=10,
                                       approx=False)
    assert nl_a.shape == nl_e.shape == (5, 10)
    assert bool(jnp.all((nr_a >= 12) & (nr_a < 20)))
    # ADVICE r4 item 2: the small-pool pad/fill must never re-admit the
    # query's excluded positive partner (the old constant-0 pad did whenever
    # the partner's candidate id was 0; the exact path's (inf, 0) init had
    # the same hole) — every padded column is a duplicate valid negative
    jp = jnp.asarray(pairs)
    for nl, nr in ((nl_a, nr_a), (nl_e, nr_e)):
        assert not bool(jnp.any(nr == jp[:, 1:2]))
        assert not bool(jnp.any(nl == jp[:, 0:1]))
    # prefilter branch (cityblock) and sq branch both covered
    nl_s, _ = sample_hard_negatives(emb, jnp.asarray(pairs), 12, 20, k=10,
                                    approx=True, metric="sqeuclidean")
    assert nl_s.shape == (5, 10)
