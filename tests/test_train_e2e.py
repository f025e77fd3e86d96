"""Integration: config[0]-shaped end-to-end training on synthetic data
(SURVEY.md §4.2 "Integration"): loss decreases; on a clean plantable
isomorphism the alignment is learnable well above chance."""

import numpy as np

from tpugraph.configs import get_config
from tpugraph.data.synthetic import synthetic_align_task
from tpugraph.train.loop import fit


def test_fit_loss_decreases_and_learns():
    task = synthetic_align_task(seed=0, n_ent=300, n_rel=8, n_triples=1200,
                                drop_frac=0.0, noise_frac=0.0)
    cfg = get_config(
        "base", dim=48, epochs=120, eval_every=40, k_neg=20, neg_every=5,
        pad_bucket=1024, syn_n_ent=300,
    )
    res = fit(cfg, task=task)
    first, last = res.history[0], res.history[-1]
    assert last["loss"] < first["loss"]
    # clean isomorphism + 30% anchors: far above the 1/210 chance level
    assert res.metrics["hits@1"] > 0.15
    assert res.metrics["hits@10"] > 0.3


def test_fit_highway_weighted_variant():
    """config[1] shape: funifun weighting + rw norm + highway gates."""
    task = synthetic_align_task(seed=1, n_ent=250, n_rel=6, n_triples=900,
                                drop_frac=0.0, noise_frac=0.0)
    cfg = get_config(
        "highway", dim=32, epochs=60, eval_every=30, k_neg=10, neg_every=5,
        pad_bucket=1024,
    )
    res = fit(cfg, task=task)
    assert res.history[-1]["loss"] < res.history[0]["loss"]
    assert np.isfinite(res.metrics["hits@1"])


def test_fit_bf16_compute_dtype():
    """bf16 activations (fp32 params/accum): trains, stays finite, and lands
    near the fp32 run."""
    from tpugraph.configs import get_config

    task = synthetic_align_task(seed=2, n_ent=250, n_rel=6, n_triples=900,
                                drop_frac=0.0, noise_frac=0.0)
    kw = dict(dim=32, epochs=60, eval_every=30, k_neg=10, neg_every=5,
              pad_bucket=1024, neg_mode="uniform")
    r32 = fit(get_config("base", param_dtype="float32", **kw), task=task)
    r16 = fit(get_config("base", param_dtype="bfloat16", **kw), task=task)
    assert np.isfinite(r16.metrics["final_loss"])
    assert abs(r16.metrics["hits@10"] - r32.metrics["hits@10"]) < 0.15


def test_steps_per_call_fusion_identical():
    """Fusing 5 epochs per dispatch must not change the math."""
    from tpugraph.configs import get_config

    task = synthetic_align_task(seed=4, n_ent=150, n_rel=5, n_triples=600)
    kw = dict(dim=16, epochs=20, eval_every=10, k_neg=5, neg_every=5,
              neg_mode="uniform", pad_bucket=256, syn_n_ent=150)
    r1 = fit(get_config("base", steps_per_call=1, **kw), task=task)
    r5 = fit(get_config("base", steps_per_call=5, **kw), task=task)
    np.testing.assert_array_equal(np.asarray(r1.params["emb"]),
                                  np.asarray(r5.params["emb"]))
    assert r1.metrics["hits@1"] == r5.metrics["hits@1"]


def test_interval_fusion_hard_mode_matches():
    from tpugraph.configs import get_config

    task = synthetic_align_task(seed=5, n_ent=150, n_rel=5, n_triples=600)
    kw = dict(dim=16, epochs=20, eval_every=10, k_neg=5, neg_every=5,
              neg_mode="hard", pad_bucket=256, syn_n_ent=150)
    r1 = fit(get_config("base", steps_per_call=1, **kw), task=task)
    r5 = fit(get_config("base", steps_per_call=5, **kw), task=task)
    np.testing.assert_allclose(np.asarray(r1.params["emb"]),
                               np.asarray(r5.params["emb"]), rtol=1e-5, atol=1e-6)


def test_spmm_impl_pallas_alias_runs():
    """'pallas' resolves to the ELL path at config level (DESIGN.md §3 entry
    4); regression: before round 2 the alias returned the ELL impl but the
    trainers still built a 'sorted' operator, crashing at the first layer."""
    from tpugraph.configs import get_config

    task = synthetic_align_task(seed=6, n_ent=120, n_rel=5, n_triples=500)
    cfg = get_config("base", spmm_impl="pallas", dim=16, epochs=3,
                     eval_every=0, k_neg=5, neg_every=5, pad_bucket=256,
                     syn_n_ent=120)
    assert cfg.spmm_impl == "ell"
    res = fit(cfg, task=task)
    assert np.isfinite(res.metrics["final_loss"])
