"""Sparse container + adjacency-build unit tests (scipy/numpy as oracle)."""

import numpy as np
import pytest

from tpugraph.sparse.build import (
    build_adjacency,
    coo_from_triples,
    coo_normalize,
    coo_to_dense,
    pad_sort_edges,
)


def _rand_triples(rng, n_ent, n_rel, n):
    h = rng.integers(0, n_ent, n)
    t = rng.integers(0, n_ent, n)
    keep = h != t
    r = rng.integers(0, n_rel, n)
    return np.stack([h[keep], r[keep], t[keep]], axis=1)


def test_coo_from_triples_uniform_symmetric():
    rng = np.random.default_rng(0)
    n_ent = 50
    tri = _rand_triples(rng, n_ent, 5, 200)
    src, dst, w = coo_from_triples(n_ent, tri, weighting="uniform", self_loops=True)
    a = coo_to_dense(src, dst, w, n_ent, n_ent)
    # binary + symmetric + unit self loops
    assert np.array_equal(a, a.T)
    assert np.array_equal(np.diag(a), np.ones(n_ent))
    offdiag = a - np.diag(np.diag(a))
    assert set(np.unique(offdiag)) <= {0.0, 1.0}
    # every triple induced both directions
    for h, r, t in tri:
        assert a[t, h] == 1.0 and a[h, t] == 1.0


def test_coo_funifun_weights_floor_and_accumulate():
    # one relation, 2 triples sharing a head: fun = 1 head/2 triples = 0.5
    tri = np.array([[0, 0, 1], [0, 0, 2]])
    src, dst, w = coo_from_triples(4, tri, n_rel=1, weighting="funifun", self_loops=False)
    a = coo_to_dense(src, dst, w, 4, 4)
    # ifun = 2 tails / 2 triples = 1.0 on h→t; fun = 0.5 on t→h, floored at 0.3
    assert a[1, 0] == pytest.approx(1.0)
    assert a[0, 1] == pytest.approx(0.5)
    # floor: a relation with fun below 0.3 gets clipped
    tri2 = np.array([[0, 0, i] for i in range(1, 9)])  # fun = 1/8 < 0.3
    s2, d2, w2 = coo_from_triples(10, tri2, n_rel=1, weighting="funifun", self_loops=False)
    a2 = coo_to_dense(s2, d2, w2, 10, 10)
    assert a2[0, 1] == pytest.approx(0.3)


@pytest.mark.parametrize("norm", ["rw", "sym"])
def test_normalize_matches_scipy(norm):
    import scipy.sparse as sp

    rng = np.random.default_rng(1)
    n = 40
    tri = _rand_triples(rng, n, 4, 150)
    src, dst, w = coo_from_triples(n, tri, weighting="uniform")
    wn = coo_normalize(src, dst, w, n, norm=norm)
    a = sp.coo_matrix((w, (dst, src)), shape=(n, n)).toarray()
    deg_in = a.sum(axis=1)
    deg_out = a.sum(axis=0)
    if norm == "rw":
        expect = a / deg_in[:, None]
    else:
        expect = a / np.sqrt(deg_in)[:, None] / np.sqrt(deg_out)[None, :]
    got = coo_to_dense(src, dst, wn, n, n)
    np.testing.assert_allclose(got, np.nan_to_num(expect), rtol=1e-12)


def test_pad_sort_edges_static_and_sorted():
    rng = np.random.default_rng(2)
    n = 30
    src = rng.integers(0, n, 77)
    dst = rng.integers(0, n, 77)
    w = rng.random(77)
    pe = pad_sort_edges(src, dst, w, n, bucket=64)
    assert pe.e_pad == 128 and pe.nnz == 77
    d = np.asarray(pe.dst)
    assert np.all(np.diff(d) >= 0)  # sorted, padding (dst=n) at the end
    assert np.all(d[77:] == n)
    assert np.all(np.asarray(pe.w)[77:] == 0.0)


def test_spmm_operator_fwd_matches_dense():
    import jax.numpy as jnp

    from tpugraph.kernels.spmm import spmm, spmm_xla

    rng = np.random.default_rng(3)
    n, d = 60, 16
    tri = _rand_triples(rng, n, 6, 250)
    op = build_adjacency(n, tri, weighting="funifun", norm="sym", bucket=64)
    x = rng.standard_normal((n, d)).astype(np.float32)
    # dense oracle from the padded fwd edges themselves
    a = coo_to_dense(
        np.asarray(op.fwd.src), np.asarray(op.fwd.dst), np.asarray(op.fwd.w), n + 1, n
    )[:n]
    want = a @ x
    np.testing.assert_allclose(np.asarray(spmm_xla(op, jnp.asarray(x))), want, rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(spmm(op, jnp.asarray(x))), want, rtol=2e-5, atol=1e-5)


def test_spmm_custom_vjp_matches_xla_grad():
    import jax
    import jax.numpy as jnp

    from tpugraph.kernels.spmm import spmm, spmm_xla

    rng = np.random.default_rng(4)
    n, d = 45, 8
    tri = _rand_triples(rng, n, 3, 160)
    op = build_adjacency(n, tri, weighting="uniform", norm="rw", bucket=64)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))

    def loss_custom(x):
        return jnp.sum((spmm(op, x) - tgt) ** 2)

    def loss_xla(x):
        return jnp.sum((spmm_xla(op, x) - tgt) ** 2)

    g1 = jax.grad(loss_custom)(x)
    g2 = jax.grad(loss_xla)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_padding_edges_inert_in_fwd_and_bwd():
    """Growing the pad bucket must not change values or grads."""
    import jax
    import jax.numpy as jnp

    from tpugraph.kernels.spmm import spmm

    rng = np.random.default_rng(5)
    n, d = 25, 4
    tri = _rand_triples(rng, n, 3, 80)
    op_small = build_adjacency(n, tri, bucket=64)
    op_big = build_adjacency(n, tri, bucket=512)
    x = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    y1, y2 = spmm(op_small, x), spmm(op_big, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)
    g1 = jax.grad(lambda x: jnp.sum(spmm(op_small, x) ** 3))(x)
    g2 = jax.grad(lambda x: jnp.sum(spmm(op_big, x) ** 3))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_sqeuclidean_knn_matches_l1_structure():
    """MXU-metric mining returns the true sqeuclidean k-NN (vs numpy oracle),
    including with non-divisible candidate counts (pad-sentinel path)."""
    import jax.numpy as jnp

    from tpugraph.train.negatives import blockwise_knn_l1

    rng = np.random.default_rng(0)
    q = rng.standard_normal((23, 8)).astype(np.float32)
    c = rng.standard_normal((53, 8)).astype(np.float32)
    excl = rng.integers(0, 53, 23).astype(np.int32)
    got = np.asarray(blockwise_knn_l1(jnp.asarray(q), jnp.asarray(c),
                                      jnp.asarray(excl), k=4, block_c=16,
                                      metric="sqeuclidean"))
    d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    d[np.arange(23), excl] = np.inf
    want = np.argsort(d, axis=1)[:, :4]
    np.testing.assert_array_equal(np.sort(got, 1), np.sort(want, 1))


def test_approx_knn_high_recall():
    """Query-blocked approx mining recalls the true neighbors (CPU backend
    approx_min_k is near-exact; on TPU recall is high by design)."""
    import jax.numpy as jnp

    from tpugraph.train.negatives import blockwise_knn_l1

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((37, 8)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((900, 8)).astype(np.float32))
    ex = jnp.asarray(rng.integers(0, 900, 37), dtype=jnp.int32)
    for metric in ("sqeuclidean", "cityblock"):
        exact = np.asarray(blockwise_knn_l1(q, c, ex, k=10, block_c=128, metric=metric))
        approx = np.asarray(blockwise_knn_l1(q, c, ex, k=10, metric=metric, approx=True))
        rec = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(exact, approx)])
        assert rec > 0.8, (metric, rec)
