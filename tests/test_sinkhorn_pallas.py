"""Pallas fused Sinkhorn kernel (interpret mode on CPU) ≡ XLA solver."""

import numpy as np


def test_pallas_sinkhorn_matches_xla():
    import jax.numpy as jnp

    from tpugraph.kernels.sddmm import pairwise_dist
    from tpugraph.kernels.sinkhorn import sinkhorn_potentials
    from tpugraph.kernels.sinkhorn_pallas import sinkhorn_potentials_pallas

    rng = np.random.default_rng(0)
    n, m, d = 70, 90, 16  # non-divisible by block sizes → exercises padding
    l = rng.standard_normal((n, d)).astype(np.float32)
    r = rng.standard_normal((m, d)).astype(np.float32)
    l /= np.linalg.norm(l, axis=1, keepdims=True)
    r /= np.linalg.norm(r, axis=1, keepdims=True)
    cost = pairwise_dist(jnp.asarray(l), jnp.asarray(r), metric="sqeuclidean", block_q=32)
    f_want, g_want = sinkhorn_potentials(cost, tau=0.1, n_iters=15)
    f_got, g_got = sinkhorn_potentials_pallas(
        jnp.asarray(l), jnp.asarray(r), tau=0.1, n_iters=15,
        block_q=32, block_c=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(f_got), np.asarray(f_want), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), rtol=1e-4, atol=1e-5)
