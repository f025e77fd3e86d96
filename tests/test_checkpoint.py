"""Kill-and-resume (SURVEY.md §5.3): an interrupted + resumed run reproduces
the uninterrupted run exactly (uniform negatives; keys are epoch-derived)."""

import numpy as np
import pytest

from tpugraph.configs import get_config
from tpugraph.data.synthetic import synthetic_align_task
from tpugraph.train.loop import fit


def test_resume_reproduces_uninterrupted_run(tmp_path):
    task = synthetic_align_task(seed=6, n_ent=150, n_rel=5, n_triples=600)
    kw = dict(dim=16, eval_every=0, k_neg=5, neg_every=4, neg_mode="uniform",
              pad_bucket=256, syn_n_ent=150)

    # uninterrupted 16-epoch run
    full = fit(get_config("base", epochs=16, **kw), task=task)

    # interrupted at 8 (checkpoint every 4), then resumed to 16
    ckdir = str(tmp_path / "ck")
    cfg_a = get_config("base", epochs=8, checkpoint_dir=ckdir, checkpoint_every=4, **kw)
    fit(cfg_a, task=task)
    cfg_b = cfg_a.replace(epochs=16)
    resumed = fit(cfg_b, task=task)

    np.testing.assert_allclose(
        np.asarray(full.params["emb"]), np.asarray(resumed.params["emb"]),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(full.params["gc1"]["w"]), np.asarray(resumed.params["gc1"]["w"]),
        rtol=1e-5, atol=1e-6,
    )
    assert full.metrics["hits@1"] == resumed.metrics["hits@1"]


def test_latest_has_key_from_fresh_manager(tmp_path):
    """latest_has_key must answer from a FRESH manager probed BEFORE any
    restore attempt (train/driver.evaluate's checkpoint-format probe): on
    orbax 0.11 item_metadata serves a cache populated only by a save or a
    restore attempt, so the pre-round-5 code silently answered None here
    (ADVICE r4 item 3's failure mode); the on-disk metadata read answers
    regardless of cache state."""
    import jax.numpy as jnp

    from tpugraph.train.checkpoint import Checkpointer

    d = str(tmp_path / "ck")
    ck = Checkpointer(d, 1)
    ck.maybe_save(1, {"params": jnp.zeros(3), "loss": jnp.float32(0)}, force=True)
    ck.close()
    fresh = Checkpointer(d, 1)  # new manager instance, no in-memory cache
    assert fresh.latest_has_key("loss") is True
    assert fresh.latest_has_key("layout") is False
    fresh.close()


def test_restore_latest_absent_is_none(tmp_path):
    from tpugraph.train.checkpoint import Checkpointer

    ck = Checkpointer(str(tmp_path / "empty"), every=5)
    assert ck.restore_latest({}) is None
    ck.close()


def test_disabled_checkpointer_noops():
    from tpugraph.train.checkpoint import Checkpointer

    ck = Checkpointer(None, every=0)
    ck.maybe_save(10, {"x": 1})
    assert ck.restore_latest({}) is None
    ck.close()


def test_restore_onto_different_mesh(tmp_path):
    """Save a distributed run at 4 shards, resume it at 8 (Orbax reshard)."""
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=13, n_ent=128, n_rel=5, n_triples=500)
    ckdir = str(tmp_path / "ck")
    kw = dict(dim=16, eval_every=0, k_neg=5, neg_every=4, neg_mode="uniform",
              syn_n_ent=128, checkpoint_dir=ckdir, checkpoint_every=4)
    r4 = fit_distributed(get_config("base", n_shards=4, epochs=8, **kw), task=task)
    r8 = fit_distributed(get_config("base", n_shards=8, epochs=16, **kw), task=task)
    # the 8-shard run resumed from the 4-shard checkpoint: reference is an
    # uninterrupted 16-epoch run at any shard count (math is N-invariant)
    ref = fit_distributed(get_config("base", n_shards=8, epochs=16,
                                     **{**kw, "checkpoint_dir": None,
                                        "checkpoint_every": 0}), task=task)
    np.testing.assert_allclose(np.asarray(r8.params["emb"]),
                               np.asarray(ref.params["emb"]), rtol=1e-5, atol=1e-6)


def test_resume_hard_mode_reproduces(tmp_path):
    """Hard-negative mining resume: the checkpoint carries the interval's
    negatives, so a mid-interval resume matches the uninterrupted run."""
    task = synthetic_align_task(seed=14, n_ent=150, n_rel=5, n_triples=600)
    kw = dict(dim=16, eval_every=0, k_neg=5, neg_every=4, neg_mode="hard",
              pad_bucket=256, syn_n_ent=150)
    full = fit(get_config("base", epochs=15, **kw), task=task)
    ckdir = str(tmp_path / "ck")
    cfg_a = get_config("base", epochs=10, checkpoint_dir=ckdir, checkpoint_every=6, **kw)
    fit(cfg_a, task=task)  # saves at epoch 6 (mid-interval: boundary is 4)
    resumed = fit(cfg_a.replace(epochs=15), task=task)
    np.testing.assert_allclose(np.asarray(full.params["emb"]),
                               np.asarray(resumed.params["emb"]), rtol=1e-5, atol=1e-6)


def test_mtl_resume_reproduces(tmp_path):
    from tpugraph.train.mtl import fit_mtl

    task = synthetic_align_task(seed=15, n_ent=150, n_rel=5, n_triples=600, n_attr=16)
    kw = dict(dim=16, eval_every=0, k_neg=5, neg_every=4, neg_mode="uniform",
              pad_bucket=256, sinkhorn_iters=5, rel_k_neg=3, syn_n_ent=150)
    full = fit_mtl(get_config("mtl", epochs=14, **kw), task=task)
    ckdir = str(tmp_path / "ckm")
    cfg_a = get_config("mtl", epochs=8, checkpoint_dir=ckdir, checkpoint_every=5, **kw)
    fit_mtl(cfg_a, task=task)
    resumed = fit_mtl(cfg_a.replace(epochs=14), task=task)
    np.testing.assert_allclose(
        np.asarray(full.params["encoder"]["emb"]),
        np.asarray(resumed.params["encoder"]["emb"]), rtol=1e-5, atol=1e-6)


def test_dist_resume_hard_mode_mid_interval_reproduces(tmp_path):
    """Distributed twin of test_resume_hard_mode_reproduces (round-4b
    trainer review): before the fix, dist checkpoints held only
    params/opt_state, so a mid-interval resume re-mined hard negatives
    (and boot proposals) from the RESTORED params and silently diverged
    from the uninterrupted trajectory.  The checkpoint now carries the
    interval's batch state like train/loop.py."""
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=16, n_ent=128, n_rel=5, n_triples=500)
    kw = dict(dim=16, eval_every=0, k_neg=5, neg_every=4, neg_mode="hard",
              boot_cap=8, boot_start=2, boot_weight=0.5,
              syn_n_ent=128, n_shards=4)
    full = fit_distributed(get_config("base", epochs=15, **kw), task=task)
    ckdir = str(tmp_path / "ckd")
    cfg_a = get_config("base", epochs=10, checkpoint_dir=ckdir,
                       checkpoint_every=6, **kw)
    fit_distributed(cfg_a, task=task)  # saves at epoch 6 (boundary is 4) and 9
    resumed = fit_distributed(cfg_a.replace(epochs=15), task=task)
    np.testing.assert_allclose(np.asarray(full.params["emb"]),
                               np.asarray(resumed.params["emb"]),
                               rtol=1e-5, atol=1e-6)
    assert resumed.metrics["final_loss"] == pytest.approx(
        full.metrics["final_loss"], abs=1e-5)


def test_dist_resume_steps_mismatch_raises(tmp_path):
    """A checkpoint saved under one steps_per_call mode cannot be resumed
    under the other (the fused mode has no interval-batch state): the
    mismatch must raise actionably, not as an Orbax structure error."""
    from tpugraph.dist.trainer import fit_distributed

    task = synthetic_align_task(seed=17, n_ent=128, n_rel=5, n_triples=500)
    ckdir = str(tmp_path / "cks")
    kw = dict(dim=16, eval_every=0, k_neg=4, neg_every=4, neg_mode="uniform",
              syn_n_ent=128, n_shards=4, checkpoint_dir=ckdir,
              checkpoint_every=4)
    fit_distributed(get_config("base", epochs=8, steps_per_call=4, **kw),
                    task=task)
    with pytest.raises(ValueError, match="steps_per_call"):
        fit_distributed(get_config("base", epochs=12, steps_per_call=1, **kw),
                        task=task)


def test_fused_epochs_divisibility_validated():
    """epochs not a multiple of steps_per_call used to silently train past
    cfg.epochs (the fused scan always runs a full chunk) — now rejected."""
    from tpugraph.dist.trainer import fit_distributed
    from tpugraph.train.loop import fit

    task = synthetic_align_task(seed=18, n_ent=128, n_rel=5, n_triples=500)
    for fn, extra in ((fit, {}), (fit_distributed, {"n_shards": 4})):
        with pytest.raises(ValueError, match="not a multiple"):
            fn(get_config("base", dim=16, epochs=7, steps_per_call=4,
                          neg_every=4, k_neg=4, syn_n_ent=128, eval_every=0,
                          **extra), task=task)
