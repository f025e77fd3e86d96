"""Determinism guards (SURVEY.md §5.2): same seed ⇒ bitwise-identical runs.
Catches nondeterministic collectives / RNG misuse silently corrupting
multi-host gradient agreement."""

import numpy as np

from tpugraph.configs import get_config
from tpugraph.data.synthetic import synthetic_align_task
from tpugraph.train.loop import fit


def test_two_fresh_fits_are_bitwise_identical():
    task = synthetic_align_task(seed=11, n_ent=150, n_rel=5, n_triples=600)
    cfg = get_config("base", dim=16, epochs=10, eval_every=0, k_neg=5,
                     neg_every=5, pad_bucket=256, syn_n_ent=150)
    r1 = fit(cfg, task=task)
    r2 = fit(cfg, task=task)
    np.testing.assert_array_equal(np.asarray(r1.params["emb"]), np.asarray(r2.params["emb"]))
    np.testing.assert_array_equal(np.asarray(r1.params["gc1"]["w"]),
                                  np.asarray(r2.params["gc1"]["w"]))


def test_distributed_fit_deterministic():
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=12, n_ent=120, n_rel=5, n_triples=500)
    cfg = get_config("base", n_shards=4, dim=16, epochs=6, eval_every=0, k_neg=5,
                     neg_every=3, neg_mode="uniform", syn_n_ent=120)
    r1 = fit_distributed(cfg, task=task)
    r2 = fit_distributed(cfg, task=task)
    np.testing.assert_array_equal(np.asarray(r1.params["emb"]), np.asarray(r2.params["emb"]))
