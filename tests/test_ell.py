"""ELL scatter-free SpMM: equivalence with the sorted-segment path."""

import numpy as np
import pytest

from tpugraph.sparse.build import coo_from_triples, coo_normalize, coo_to_dense
from tpugraph.sparse.ell import build_ell_operator


def _rand_triples(rng, n_ent, n_rel, n):
    h = rng.integers(0, n_ent, n)
    t = rng.integers(0, n_ent, n)
    keep = h != t
    r = rng.integers(0, n_rel, n)
    return np.stack([h[keep], r[keep], t[keep]], axis=1)


def test_ell_matches_dense_fwd_bwd():
    import jax
    import jax.numpy as jnp

    from tpugraph.kernels.spmm_ell import spmm_ell

    rng = np.random.default_rng(0)
    n, d = 150, 24
    tri = _rand_triples(rng, n, 6, 500)
    src, dst, w = coo_from_triples(n, tri, weighting="funifun")
    w = coo_normalize(src, dst, w, n, "sym")
    op = build_ell_operator(src, dst, w, n)
    a = coo_to_dense(src, dst, w, n, n)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(spmm_ell(op, x)), a @ np.asarray(x),
                               rtol=2e-5, atol=1e-5)
    g = jax.grad(lambda x: jnp.sum(spmm_ell(op, x) ** 2))(x)
    gw = 2 * a.T @ (a @ np.asarray(x))
    np.testing.assert_allclose(np.asarray(g), gw, rtol=2e-4, atol=1e-4)


def test_ell_handles_isolated_and_hub_rows():
    import jax.numpy as jnp

    from tpugraph.kernels.spmm_ell import spmm_ell

    # star graph: row 0 is a hub, rows >50 isolated
    n = 80
    src = np.arange(1, 51)
    dst = np.zeros(50, np.int64)
    w = np.ones(50)
    # add reverse edges so every spoke has degree 1
    src2 = np.concatenate([src, dst])
    dst2 = np.concatenate([dst, src])
    w2 = np.concatenate([w, w])
    op = build_ell_operator(src2, dst2, w2, n)
    x = jnp.ones((n, 4))
    out = np.asarray(spmm_ell(op, x))
    assert out[0, 0] == pytest.approx(50.0)  # hub aggregates all spokes
    np.testing.assert_allclose(out[1:51, 0], 1.0)
    np.testing.assert_allclose(out[51:], 0.0)  # isolated rows exactly zero


def test_split_diag_matches_unsplit():
    """The gather-free diagonal path is numerically the same operator."""
    import jax
    import jax.numpy as jnp

    from tpugraph.kernels.spmm_ell import spmm_ell

    rng = np.random.default_rng(1)
    n, d = 150, 24
    tri = _rand_triples(rng, n, 6, 500)
    src, dst, w = coo_from_triples(n, tri, weighting="funifun")  # adds self-loops
    w = coo_normalize(src, dst, w, n, "sym")
    plain = build_ell_operator(src, dst, w, n)
    split = build_ell_operator(src, dst, w, n, split_diag=True)
    assert split.nnz == plain.nnz  # diag edges still counted
    assert split.fwd.nnz == plain.nnz - n  # ...but not stored in the ELL
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(spmm_ell(split, x)),
                               np.asarray(spmm_ell(plain, x)),
                               rtol=2e-6, atol=2e-6)
    g0 = jax.grad(lambda x: jnp.sum(spmm_ell(plain, x) ** 2))(x)
    g1 = jax.grad(lambda x: jnp.sum(spmm_ell(split, x) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=2e-5, atol=2e-5)


def test_fit_with_ell_impl_matches_sorted():
    """End-to-end: identical training curves for 'ell' vs 'sorted' impls."""
    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.train.loop import fit

    task = synthetic_align_task(seed=5, n_ent=200, n_rel=6, n_triples=700)
    base = dict(dim=32, epochs=20, eval_every=10, k_neg=8, neg_every=5,
                pad_bucket=512, neg_mode="uniform")
    r1 = fit(get_config("base", spmm_impl="sorted", **base), task=task)
    r2 = fit(get_config("base", spmm_impl="ell", **base), task=task)
    assert r1.metrics["hits@1"] == pytest.approx(r2.metrics["hits@1"], abs=2e-2)
    assert r1.history[-1]["loss"] == pytest.approx(r2.history[-1]["loss"], rel=1e-3)
