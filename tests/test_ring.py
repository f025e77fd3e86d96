"""Ring-blockwise (ppermute) eval / k-NN / Sinkhorn ≡ single-device versions,
on the virtual 8-device CPU mesh."""

import numpy as np
import pytest


def _mesh(n=8):
    from tpugraph.dist.mesh import make_mesh

    return make_mesh(n, 1)


def test_ring_hits_matches_blockwise_eval():
    import jax.numpy as jnp

    from tpugraph.dist.ring import ring_hits_at_k
    from tpugraph.train.eval import hits_at_k

    rng = np.random.default_rng(0)
    n_ent, d, s = 300, 16, 83  # deliberately not divisible by 8
    emb = jnp.asarray(rng.standard_normal((n_ent, d)).astype(np.float32))
    pairs = np.stack([rng.choice(150, s, replace=False),
                      150 + rng.choice(150, s, replace=False)], axis=1).astype(np.int32)
    want = hits_at_k(emb, jnp.asarray(pairs), block_c=64)
    got = ring_hits_at_k(emb, pairs, _mesh())
    for k in ("hits@1", "hits@10", "mrr", "hits@1_l2r", "mrr_r2l"):
        assert got[k] == pytest.approx(want[k], abs=1e-6), k


def test_ring_knn_matches_blockwise():
    import jax.numpy as jnp

    from tpugraph.dist.ring import ring_knn
    from tpugraph.train.negatives import blockwise_knn_l1

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((37, 8)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((101, 8)).astype(np.float32))
    excl = jnp.asarray(rng.integers(0, 101, 37), dtype=jnp.int32)
    want = np.asarray(blockwise_knn_l1(q, c, excl, k=5, block_c=32))
    got = np.asarray(ring_knn(q, c, excl, 5, _mesh()))
    np.testing.assert_array_equal(np.sort(got, axis=1), np.sort(want, axis=1))


def test_ring_sinkhorn_matches_dense():
    import jax.numpy as jnp

    from tpugraph.dist.ring import ring_sinkhorn_potentials
    from tpugraph.kernels.sddmm import pairwise_dist
    from tpugraph.kernels.sinkhorn import sinkhorn_potentials

    rng = np.random.default_rng(2)
    s, d = 45, 8  # not divisible by 8
    l = jnp.asarray(rng.standard_normal((s, d)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((s, d)).astype(np.float32))
    ln = l / (jnp.linalg.norm(l, axis=-1, keepdims=True) + 1e-8)
    rn = r / (jnp.linalg.norm(r, axis=-1, keepdims=True) + 1e-8)
    cost = pairwise_dist(ln, rn, metric="sqeuclidean", block_q=16)
    f_want, g_want = sinkhorn_potentials(cost, tau=0.1, n_iters=25)
    f_got, g_got = ring_sinkhorn_potentials(l, r, _mesh(), tau=0.1, n_iters=25)
    np.testing.assert_allclose(np.asarray(f_got), np.asarray(f_want), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want), rtol=1e-4, atol=1e-5)


def test_ring_sinkhorn_loss_and_grad_match_single_device():
    import jax
    import jax.numpy as jnp

    from tpugraph.dist.ring import ring_sinkhorn_align_loss
    from tpugraph.train.ot import sinkhorn_align_loss

    rng = np.random.default_rng(3)
    n_ent, d, s = 120, 8, 37  # non-divisible pair count
    emb = jnp.asarray(rng.standard_normal((n_ent, d)).astype(np.float32))
    pairs = jnp.asarray(np.stack([rng.choice(60, s, replace=False),
                                  60 + rng.choice(60, s, replace=False)], 1)
                        .astype(np.int32))
    mesh = _mesh()
    want = float(sinkhorn_align_loss(emb, pairs, tau=0.1, n_iters=12, block_q=16))
    got = float(ring_sinkhorn_align_loss(emb, pairs, mesh, tau=0.1, n_iters=12))
    assert got == pytest.approx(want, rel=1e-4)
    g_want = jax.grad(lambda e: sinkhorn_align_loss(e, pairs, tau=0.1, n_iters=12,
                                                    block_q=16))(emb)
    g_got = jax.grad(lambda e: ring_sinkhorn_align_loss(e, pairs, mesh, tau=0.1,
                                                        n_iters=12))(emb)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-3, atol=1e-5)


def test_ring_knn_csls_matches_blockwise():
    """Ring CSLS mining (hubness ring pass + 2*d - r(j) top-k) reproduces the
    single-device blockwise_knn_l1(csls_k>0) semantics, both metrics."""
    import jax.numpy as jnp

    from tpugraph.dist.ring import ring_knn
    from tpugraph.train.negatives import blockwise_knn_l1

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((37, 8)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((101, 8)).astype(np.float32))
    c = c.at[:6].mul(0.05)  # hub rows: CSLS must demote them
    excl = jnp.asarray(rng.integers(0, 101, 37), dtype=jnp.int32)
    for metric in ("cityblock", "sqeuclidean"):
        want = np.asarray(blockwise_knn_l1(q, c, excl, k=5, block_c=101,
                                           metric=metric, csls_k=7))
        got = np.asarray(ring_knn(q, c, excl, 5, _mesh(), metric=metric,
                                  csls_k=7))
        np.testing.assert_array_equal(np.sort(got, axis=1),
                                      np.sort(want, axis=1), err_msg=metric)


def test_ring_knn_approx_high_recall():
    """MXU-prefiltered ring mining (round 3: the ring analog of the
    single-chip neg_approx prefilter — cfg.neg_approx was silently ignored
    at n_shards>1 before): recall vs the exact ring pass stays high, and
    the excluded partner never appears."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from tpugraph.dist.ring import ring_knn

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1), ("graph", "feature"))
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((96, 16)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((640, 16)).astype(np.float32))
    ex = jnp.asarray(rng.integers(0, 640, 96), dtype=jnp.int32)
    k = 8
    exact = np.asarray(ring_knn(q, c, ex, k, mesh))
    ap = np.asarray(ring_knn(q, c, ex, k, mesh, approx=True))
    rec = np.mean([len(set(a) & set(b)) / k for a, b in zip(exact, ap)])
    assert rec >= 0.8, rec
    assert not (ap == np.asarray(ex)[:, None]).any()
    # sqeuclidean approx variant also runs and recalls well
    exact_sq = np.asarray(ring_knn(q, c, ex, k, mesh, metric="sqeuclidean"))
    ap_sq = np.asarray(ring_knn(q, c, ex, k, mesh, metric="sqeuclidean",
                                approx=True))
    rec_sq = np.mean([len(set(a) & set(b)) / k for a, b in zip(exact_sq, ap_sq)])
    assert rec_sq >= 0.8, rec_sq


def test_fit_distributed_ring_approx_mining_runs():
    """neg_approx now reaches the ring path: training runs, loss finite,
    metrics near the exact-mining run."""
    import numpy as np
    import pytest

    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=33, n_ent=120, n_rel=5, n_triples=500)
    kw = dict(dim=16, epochs=6, eval_every=6, k_neg=4, neg_every=3,
              neg_mode="hard", syn_n_ent=120, n_shards=4)
    ra = fit_distributed(get_config("base", neg_approx=True, **kw), task=task)
    re_ = fit_distributed(get_config("base", **kw), task=task)
    assert np.isfinite(ra.metrics["final_loss"])
    assert ra.metrics["final_loss"] == pytest.approx(
        re_.metrics["final_loss"], rel=0.05)
    assert ra.metrics["hits@1"] == pytest.approx(re_.metrics["hits@1"], abs=0.15)


def test_ring_knn_approx_csls_tracks_exact():
    """approx + CSLS on the ring: exact tile (incl. hubness), approx
    hop-local selection — no longer a silent fall-through to the full-sort
    path (review r3 second pass)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from tpugraph.dist.ring import ring_knn

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1), ("graph", "feature"))
    rng = np.random.default_rng(6)
    q = jnp.asarray(rng.standard_normal((96, 16)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((640, 16)).astype(np.float32))
    ex = jnp.asarray(rng.integers(0, 640, 96), dtype=jnp.int32)
    k = 8
    exact = np.asarray(ring_knn(q, c, ex, k, mesh, csls_k=5))
    ap = np.asarray(ring_knn(q, c, ex, k, mesh, csls_k=5, approx=True))
    rec = np.mean([len(set(a) & set(b)) / k for a, b in zip(exact, ap)])
    assert rec >= 0.8, rec
    assert not (ap == np.asarray(ex)[:, None]).any()


def test_ring_hits_csls_matches_blockwise_eval():
    """Ring CSLS eval (hubness ring pass + 2·d − r(j) rank counting) ≡ the
    single-chip hits_at_k(csls_k>0) — closes VERDICT r3 missing #1: every
    adopted v3+ recipe pins eval_csls_k=10 and the ring path dropped it."""
    import jax.numpy as jnp

    from tpugraph.dist.ring import ring_hits_at_k
    from tpugraph.train.eval import hits_at_k

    rng = np.random.default_rng(7)
    n_ent, d, s = 300, 16, 83  # deliberately not divisible by 8
    emb = rng.standard_normal((n_ent, d)).astype(np.float32)
    emb[150:160] *= 0.05  # hub rows: CSLS must demote them
    emb = jnp.asarray(emb)
    pairs = np.stack([rng.choice(150, s, replace=False),
                      150 + rng.choice(150, s, replace=False)], axis=1).astype(np.int32)
    want = hits_at_k(emb, jnp.asarray(pairs), block_c=64, csls_k=7)
    got = ring_hits_at_k(emb, pairs, _mesh(), csls_k=7)
    for k in ("hits@1", "hits@10", "mrr", "hits@1_l2r", "mrr_r2l"):
        assert got[k] == pytest.approx(want[k], abs=1e-6), k
    # and CSLS actually changes the answer on this hub-heavy pool
    raw = ring_hits_at_k(emb, pairs, _mesh())
    assert any(abs(raw[k] - got[k]) > 1e-6 for k in ("hits@1", "hits@10"))


@pytest.mark.parametrize("csls_k", [0, 7])
def test_ring_hits_approx_tracks_exact(csls_k):
    """MXU-prefiltered ring eval (approx_k>0): tracks the exact ring eval
    within the same 0.02 tolerance contract as the single-chip approx path
    (tests/test_eval_approx.py) — VERDICT r3 next #6."""
    import jax.numpy as jnp

    from tpugraph.dist.ring import ring_hits_at_k

    rng = np.random.default_rng(8)
    n_ent, d, s = 400, 16, 120
    base = rng.standard_normal((200, d)).astype(np.float32)
    emb = np.concatenate(
        [base, base + 0.3 * rng.standard_normal((200, d)).astype(np.float32)])
    emb[200:208] *= 0.05  # hubs
    emb = jnp.asarray(emb)
    pairs = np.stack([rng.choice(200, s, replace=False),
                      200 + rng.choice(200, s, replace=False)], 1).astype(np.int32)
    exact = ring_hits_at_k(emb, pairs, _mesh(), csls_k=csls_k)
    ap = ring_hits_at_k(emb, pairs, _mesh(), csls_k=csls_k, approx_k=16)
    for k in ("hits@1", "hits@10", "mrr"):
        assert ap[k] == pytest.approx(exact[k], abs=0.02), (k, csls_k)


def test_ring_potentials_all_padding_shard_finite():
    """n smaller than the mesh can leave whole shards as padding (here 9
    pairs on 8 devices -> 7 pad rows, devices 5-7 all-padding).  The -inf
    log-mask made every z in such a tile -inf and z - max(z) = NaN,
    poisoning ALL potentials (round-4b review); the finite sentinel from
    ring_sinkhorn_align_loss is now shared.  Values must still match the
    dense single-device solver on the real rows."""
    import jax.numpy as jnp

    from tpugraph.dist.ring import ring_sinkhorn_potentials
    from tpugraph.kernels.sinkhorn import sinkhorn_potentials

    rng = np.random.default_rng(5)
    n, d = 9, 8
    l = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    r = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    f, g = ring_sinkhorn_potentials(l, r, _mesh(), tau=0.1, n_iters=15)
    assert bool(jnp.all(jnp.isfinite(f))) and bool(jnp.all(jnp.isfinite(g)))
    ln = np.asarray(l / (jnp.linalg.norm(l, axis=-1, keepdims=True) + 1e-8))
    rn = np.asarray(r / (jnp.linalg.norm(r, axis=-1, keepdims=True) + 1e-8))
    cost = ((ln[:, None, :] - rn[None, :, :]) ** 2).sum(-1)
    f_want, g_want = sinkhorn_potentials(jnp.asarray(cost), tau=0.1, n_iters=15)
    np.testing.assert_allclose(np.asarray(f), np.asarray(f_want), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_want), atol=1e-4)
