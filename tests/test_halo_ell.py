"""Scatter-free (ELL) halo SpMM ≡ dense oracle on the virtual mesh."""

from functools import partial

import numpy as np
import pytest

from tpugraph.sparse.build import coo_from_triples, coo_normalize, coo_to_dense
from tpugraph.sparse.halo_ell import build_halo_ell, squeeze_shard
from tpugraph.sparse.partition import partition_edges


def _graph(n=96, t=400, seed=0):
    rng = np.random.default_rng(seed)
    h = rng.integers(0, n, t)
    tt = rng.integers(0, n, t)
    keep = h != tt
    tri = np.stack([h[keep], rng.integers(0, 5, keep.sum()), tt[keep]], axis=1)
    src, dst, w = coo_from_triples(n, tri, weighting="uniform")
    w = coo_normalize(src, dst, w, n, "sym")
    return n, src, dst, w


@pytest.mark.parametrize("n_shards", [2, 8])
def test_halo_ell_matches_dense_fwd_and_grad(n_shards):
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from tpugraph.dist.halo import halo_spmm_ell
    from tpugraph.dist.mesh import make_mesh

    n, src, dst, w = _graph()
    hg = partition_edges(src, dst, w, n, n_shards)
    he = build_halo_ell(hg)
    n_pad = hg.n_loc * n_shards
    mesh = make_mesh(n_shards, 1)
    rng = np.random.default_rng(1)
    d = 8
    x = np.zeros((n_pad, d), np.float32)
    x[:n] = rng.standard_normal((n, d)).astype(np.float32)

    @partial(shard_map, mesh=mesh, in_specs=(P("graph", None), P("graph")),
             out_specs=P("graph", None))
    def run(x_local, he_s):
        he_s = squeeze_shard(he_s)
        return halo_spmm_ell(
            x_local, he_s.loc, he_s.bnd,
            he_s.send_idx.reshape(he.n_shards, he.halo_b),
            he_s.send_mask.reshape(he.n_shards, he.halo_b),
        )

    a = coo_to_dense(src, dst, w, n, n)
    with mesh:
        out = np.asarray(jax.jit(run)(jnp.asarray(x), he))
        grad = jax.jit(jax.grad(lambda x: jnp.sum(run(x, he) ** 2)))(jnp.asarray(x))
    np.testing.assert_allclose(out[:n], a @ x[:n], rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(out[n:], 0.0, atol=1e-6)
    want_g = 2 * a.T @ (a @ x[:n])
    np.testing.assert_allclose(np.asarray(grad)[:n], want_g, rtol=2e-4, atol=1e-4)
