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
