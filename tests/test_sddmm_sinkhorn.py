"""SDDMM + Sinkhorn kernel unit tests (numpy/scipy as oracle)."""

import numpy as np
import pytest


def _np_sinkhorn_log(cost, tau, iters):
    """Straightforward float64 numpy reference (log domain)."""
    n, m = cost.shape
    log_mu = np.full(n, -np.log(n))
    log_nu = np.full(m, -np.log(m))
    f = np.zeros(n)
    g = np.zeros(m)

    def lse(x, axis):
        mx = x.max(axis=axis, keepdims=True)
        return (mx + np.log(np.exp(x - mx).sum(axis=axis, keepdims=True))).squeeze(axis)

    for _ in range(iters):
        f = tau * (log_mu - lse((g[None, :] - cost) / tau, 1))
        g = tau * (log_nu - lse((f[:, None] - cost) / tau, 0))
    return (f[:, None] + g[None, :] - cost) / tau


def test_sinkhorn_matches_numpy_reference():
    from tpugraph.kernels.sinkhorn import sinkhorn_log_plan

    rng = np.random.default_rng(0)
    c = rng.random((20, 30)).astype(np.float32)
    got = np.asarray(sinkhorn_log_plan(c, tau=0.1, n_iters=30))
    want = _np_sinkhorn_log(c.astype(np.float64), 0.1, 30)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sinkhorn_plan_marginals():
    from tpugraph.kernels.sinkhorn import sinkhorn_plan

    rng = np.random.default_rng(1)
    c = rng.random((16, 16)).astype(np.float32)
    p = np.asarray(sinkhorn_plan(c, tau=0.2, n_iters=60))
    np.testing.assert_allclose(p.sum(1), np.full(16, 1 / 16), rtol=1e-3)
    np.testing.assert_allclose(p.sum(0), np.full(16, 1 / 16), rtol=1e-3)


def test_sinkhorn_concentrates_on_cheap_diagonal():
    from tpugraph.kernels.sinkhorn import sinkhorn_plan

    n = 12
    c = np.ones((n, n), np.float32)
    np.fill_diagonal(c, 0.0)
    p = np.asarray(sinkhorn_plan(c, tau=0.05, n_iters=50))
    assert (np.argmax(p, axis=1) == np.arange(n)).all()
    assert np.diagonal(p).sum() > 0.9  # most mass on the true matching


@pytest.mark.parametrize("metric", ["cityblock", "sqeuclidean"])
def test_pairwise_dist_matches_scipy(metric):
    from scipy.spatial.distance import cdist

    from tpugraph.kernels.sddmm import pairwise_dist

    rng = np.random.default_rng(2)
    a = rng.standard_normal((70, 16)).astype(np.float32)
    b = rng.standard_normal((45, 16)).astype(np.float32)
    got = np.asarray(pairwise_dist(a, b, metric=metric, block_q=32))
    want = cdist(a, b, metric=metric)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sddmm_pairs_matches_dense():
    from tpugraph.kernels.sddmm import pairwise_dist, sddmm_pairs

    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    emb = jnp.asarray(rng.standard_normal((50, 8)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, 50, 40), dtype=jnp.int32)
    cols = jnp.asarray(rng.integers(0, 50, 40), dtype=jnp.int32)
    d = np.asarray(sddmm_pairs(emb, rows, cols, metric="cityblock"))
    full = np.asarray(pairwise_dist(emb, emb, metric="cityblock", block_q=16))
    np.testing.assert_allclose(d, full[np.asarray(rows), np.asarray(cols)], rtol=1e-5)


def test_ot_loss_grad_finite_and_improves_matching():
    """Gradient descent on the OT loss should pull seed pairs together."""
    import jax
    import jax.numpy as jnp

    from tpugraph.train.ot import sinkhorn_align_loss

    rng = np.random.default_rng(4)
    n, d, s = 60, 8, 20
    emb0 = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    pairs = jnp.stack([jnp.arange(s), jnp.arange(s) + 30], axis=1).astype(jnp.int32)

    loss_fn = lambda e: sinkhorn_align_loss(e, pairs, tau=0.1, n_iters=15, block_q=16)
    l0, g = jax.value_and_grad(loss_fn)(emb0)
    assert np.isfinite(float(l0)) and bool(jnp.all(jnp.isfinite(g)))
    emb = emb0
    for _ in range(60):
        emb = emb - 0.5 * jax.grad(loss_fn)(emb)
    assert float(loss_fn(emb)) < float(l0)
