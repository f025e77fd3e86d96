"""Multi-task model/loop tests: configs [2] (Sinkhorn) and [3] (full MTL)."""

import numpy as np

from tpugraph.configs import get_config
from tpugraph.data.synthetic import synthetic_align_task
from tpugraph.train.mtl import fit_mtl


def _task():
    return synthetic_align_task(seed=2, n_ent=250, n_rel=6, n_triples=900,
                                drop_frac=0.0, noise_frac=0.0, n_attr=32)


def test_sinkhorn_config_trains():
    cfg = get_config("sinkhorn", dim=32, epochs=40, eval_every=20, k_neg=10,
                     neg_every=5, pad_bucket=1024, sinkhorn_iters=10)
    res = fit_mtl(cfg, task=_task())
    h = res.history
    assert h[-1]["loss_total"] < h[0]["loss_total"]
    assert np.isfinite(h[-1]["loss_sinkhorn"])
    assert res.metrics["hits@1"] >= 0.0


def test_full_mtl_config_trains():
    cfg = get_config("mtl", dim=32, epochs=40, eval_every=20, k_neg=10,
                     neg_every=5, pad_bucket=1024, sinkhorn_iters=10, rel_k_neg=4)
    res = fit_mtl(cfg, task=_task())
    h = res.history
    # every enabled head reports a finite loss and the joint loss decreases
    for k in ("loss_margin", "loss_sinkhorn", "loss_rel", "loss_attr", "loss_total"):
        assert np.isfinite(h[-1][k]), k
    assert h[-1]["loss_total"] < h[0]["loss_total"]
    assert h[-1]["loss_rel"] < h[0]["loss_rel"]
    assert h[-1]["loss_attr"] < h[0]["loss_attr"]


def test_mtl_beats_or_matches_margin_only_smoke():
    """Attributes correlate across the alignment, so MTL should not collapse."""
    cfg = get_config("mtl", dim=32, epochs=60, eval_every=30, k_neg=10,
                     neg_every=5, pad_bucket=1024, sinkhorn_iters=10, rel_k_neg=4)
    res = fit_mtl(cfg, task=_task())
    assert res.metrics["hits@1"] > 0.05


def test_attr_channel_seae_trains():
    """GCN-Align-style SE+AE: attribute-channel GCN + combined-distance eval."""
    cfg = get_config("mtl", dim=32, epochs=50, eval_every=25, k_neg=10,
                     neg_every=5, pad_bucket=1024, sinkhorn_iters=10, rel_k_neg=4,
                     use_attr_channel=True, attr_beta=0.7)
    res = fit_mtl(cfg, task=_task())
    h = res.history
    assert np.isfinite(h[-1]["loss_ae"])
    assert h[-1]["loss_ae"] < h[0]["loss_ae"]
    # combined embeddings double the eval dim: smoke the metrics
    assert 0.0 <= res.metrics["hits@1"] <= 1.0


def test_attr_operator_mean_aggregation():
    import jax.numpy as jnp

    from tpugraph.kernels.spmm_ell import spmm_ell
    from tpugraph.models.attr_channel import build_attr_operator

    # entity 0 has attrs {0,1}, entity 1 has attr {2}, entity 2 none
    attr = np.array([[0, 0], [0, 1], [1, 2]], np.int32)
    op = build_attr_operator(attr, n_ent=3, n_attr=4, fmt="ell")
    table = jnp.asarray(np.eye(4, dtype=np.float32))
    feats = np.asarray(spmm_ell(op, table))
    np.testing.assert_allclose(feats[0], [0.5, 0.5, 0, 0])
    np.testing.assert_allclose(feats[1], [0, 0, 1, 0])
    np.testing.assert_allclose(feats[2], 0.0)


def test_mtl_interval_fusion_matches():
    cfg_kw = dict(dim=24, epochs=20, eval_every=10, k_neg=8, neg_every=5,
                  pad_bucket=1024, sinkhorn_iters=5, rel_k_neg=3, neg_mode="uniform")
    t = _task()
    r1 = fit_mtl(get_config("mtl", steps_per_call=1, **cfg_kw), task=t)
    r5 = fit_mtl(get_config("mtl", steps_per_call=5, **cfg_kw), task=t)
    np.testing.assert_allclose(np.asarray(r1.params["encoder"]["emb"]),
                               np.asarray(r5.params["encoder"]["emb"]),
                               rtol=1e-5, atol=1e-6)
    assert r1.metrics["hits@1"] == r5.metrics["hits@1"]


def test_mtl_bootstrap_trains_and_fuses():
    """Bootstrapped pair augmentation in the MTL loop: margin/AE get the
    augmented pairs, Sinkhorn stays on seed pairs; fused == unfused."""
    import numpy as np

    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.train.mtl import fit_mtl

    task = synthetic_align_task(seed=21, n_ent=300, n_rel=10, n_triples=1200,
                                n_attr=12)
    kw = dict(dim=16, epochs=12, neg_every=4, k_neg=5, eval_every=0,
              use_sinkhorn=True, sinkhorn_iters=4, use_rel_head=True,
              rel_k_neg=3, use_attr_head=True, boot_cap=8, boot_start=4,
              boot_weight=0.5)
    r1 = fit_mtl(get_config("mtl", steps_per_call=1, **kw), task=task)
    r2 = fit_mtl(get_config("mtl", steps_per_call=4, **kw), task=task)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(r1.params),
                    jax.tree_util.tree_leaves(r2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    assert np.isfinite(r1.metrics["final_loss"])


def test_head_losses_match_torch_oracle():
    """RelationHead/AttributeHead loss values ≡ the oracle mirrors under
    injected identical weights and batches (the config[3] parity claim)."""
    import jax.numpy as jnp
    import torch

    from tpugraph.models.heads import AttributeHead, RelationHead
    from tpugraph.parity import torch_ref

    rng = np.random.default_rng(7)
    n_ent, n_rel, n_attr, dim, t, k, b = 120, 9, 17, 16, 60, 4, 40
    emb = rng.normal(size=(n_ent, dim)).astype(np.float32)
    triples = np.stack([rng.integers(0, n_ent, t), rng.integers(0, n_rel, t),
                        rng.integers(0, n_ent, t)], 1).astype(np.int32)
    neg_t = rng.integers(0, n_ent, (t, k)).astype(np.int32)
    neg_h = rng.integers(0, n_ent, (t, k)).astype(np.int32)
    attr_triples = np.stack([rng.integers(0, n_ent, b),
                             rng.integers(0, n_attr, b)], 1).astype(np.int32)

    # relation head: inject the jax-initialized rel table into the mirror
    rh = RelationHead(n_rel=n_rel, dim=dim)
    import jax

    rp = rh.init(jax.random.PRNGKey(0), jnp.asarray(emb), jnp.asarray(triples),
                 jnp.asarray(neg_t), jnp.asarray(neg_h))["params"]
    l_rel_j = float(rh.apply({"params": rp}, jnp.asarray(emb), jnp.asarray(triples),
                             jnp.asarray(neg_t), jnp.asarray(neg_h)))
    trh = torch_ref.TorchRelationHead(n_rel, dim)
    with torch.no_grad():
        trh.rel.copy_(torch.from_numpy(np.asarray(rp["rel"])))
        l_rel_t = trh(torch.from_numpy(emb),
                      torch.from_numpy(triples.astype(np.int64)),
                      torch.from_numpy(neg_t.astype(np.int64)),
                      torch.from_numpy(neg_h.astype(np.int64))).item()
    np.testing.assert_allclose(l_rel_j, l_rel_t, rtol=1e-5)

    # attribute head: inject the Dense kernel/bias into the Linear mirror
    ah = AttributeHead(n_attr=n_attr)
    ap = ah.init(jax.random.PRNGKey(1), jnp.asarray(emb),
                 jnp.asarray(attr_triples))["params"]
    l_attr_j = float(ah.apply({"params": ap}, jnp.asarray(emb),
                              jnp.asarray(attr_triples)))
    tah = torch_ref.TorchAttributeHead(dim, n_attr)
    with torch.no_grad():
        tah.lin.weight.copy_(torch.from_numpy(np.asarray(ap["Dense_0"]["kernel"]).T))
        tah.lin.bias.copy_(torch.from_numpy(np.asarray(ap["Dense_0"]["bias"])))
        l_attr_t = tah(torch.from_numpy(emb),
                       torch.from_numpy(attr_triples.astype(np.int64))).item()
    np.testing.assert_allclose(l_attr_j, l_attr_t, rtol=1e-5)


def test_mtl_rejects_uncapped_ot_at_scale():
    """The uncapped S x S OT cost matrix fails remote compile at 15k seeds
    (measured round 3); fit_mtl must reject actionably instead."""
    import numpy as np
    import pytest

    from tpugraph.configs import get_config
    from tpugraph.sparse.graph import KG, AlignTask
    from tpugraph.train.mtl import fit_mtl

    rng = np.random.default_rng(0)
    n = 200
    tri = np.stack([rng.integers(0, n, 400), rng.integers(0, 4, 400),
                    rng.integers(0, n, 400)], 1)
    big_pairs = np.stack([rng.integers(0, n, 9000),
                          n + rng.integers(0, n, 9000)], 1)
    task = AlignTask(kg1=KG(n_ent=n, n_rel=4, triples=tri),
                     kg2=KG(n_ent=n, n_rel=4, triples=tri),
                     train_pairs=big_pairs, test_pairs=big_pairs[:10])
    cfg = get_config("sinkhorn", epochs=1, eval_every=0)
    with pytest.raises(ValueError, match="sinkhorn_pairs"):
        fit_mtl(cfg, task=task)
