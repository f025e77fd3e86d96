"""Eval-only entry (VERDICT r4 Next #2; the reference family's ``get_hits``
on a loaded model — SURVEY.md §2.1 Hits@k row): ``evaluate(cfg)`` restores
the latest checkpoint and reproduces the training run's final metrics with
zero training steps, on all three trainers.  ``epochs=0`` is the supported
zero-epoch path under it (the round-4b ``epochs >= 1`` validation broke it
— VERDICT r4 missing #1)."""

import json
import math

import numpy as np
import pytest

from tpugraph.configs import get_config
from tpugraph.data.synthetic import synthetic_align_task
from tpugraph.train.driver import evaluate, run


def _task():
    return synthetic_align_task(seed=9, n_ent=150, n_rel=5, n_triples=600)


def _base_kw(ckdir):
    return dict(dim=16, epochs=6, eval_every=0, k_neg=5, neg_every=3,
                neg_mode="uniform", pad_bucket=256, syn_n_ent=150,
                checkpoint_dir=ckdir, checkpoint_every=3)


def test_evaluate_reproduces_final_metrics(tmp_path):
    """fit path: checkpoint-restore → metrics ≡ the training run's final
    metrics (same params — the final save precedes the final eval — and the
    same exact eval convention)."""
    task = _task()
    cfg = get_config("base", eval_csls_k=5, **_base_kw(str(tmp_path / "ck")))
    trained = run(cfg, task=task)
    ev = evaluate(cfg, task=task)
    assert ev.history == []  # no training: no history records
    for k in ("hits@1", "hits@10", "mrr", "final_loss"):
        assert ev.metrics[k] == trained.metrics[k], k


def test_evaluate_mtl(tmp_path):
    """MTL path (heads route through fit_mtl)."""
    task = _task()
    cfg = get_config("base", use_rel_head=True, use_sinkhorn=True,
                     sinkhorn_iters=4, **_base_kw(str(tmp_path / "ck")))
    trained = run(cfg, task=task)
    ev = evaluate(cfg, task=task)
    for k in ("hits@1", "hits@10", "mrr", "final_loss"):
        assert ev.metrics[k] == trained.metrics[k], k


def test_evaluate_distributed_and_cross_mesh(tmp_path):
    """Distributed path, including an eval-only restore onto a DIFFERENT
    mesh shape (4-shard checkpoint → 8-shard eval; Orbax reshard — the
    1-host-train → N-host-eval deployment shape)."""
    from tpugraph.dist.trainer import fit_distributed

    # 256 total entities: the padded table (n_loc × n_shards) is 256 at both
    # 4 and 8 shards, so the cross-mesh restore reshards without repadding
    # (same geometry as test_checkpoint.test_restore_onto_different_mesh)
    task = synthetic_align_task(seed=9, n_ent=128, n_rel=5, n_triples=500)
    kw = _base_kw(str(tmp_path / "ck"))
    cfg4 = get_config("base", n_shards=4, eval_csls_k=5, **kw)
    trained = fit_distributed(cfg4, task=task)
    ev4 = evaluate(cfg4, task=task)
    for k in ("hits@1", "hits@10", "mrr", "final_loss"):
        assert ev4.metrics[k] == trained.metrics[k], k
    ev8 = evaluate(cfg4.replace(n_shards=8), task=task)
    for k in ("hits@1", "hits@10", "mrr"):
        assert ev8.metrics[k] == pytest.approx(trained.metrics[k], abs=1e-6), k


def test_evaluate_adopts_fused_checkpoint_format(tmp_path):
    """A distributed checkpoint saved under steps_per_call > 1 (--fast)
    carries no interval-batch state; evaluate() auto-adopts the on-disk
    format so the restore template matches without re-passing --fast —
    and the reverse direction (fused eval cfg on an unfused checkpoint)."""
    from tpugraph.dist.trainer import fit_distributed

    task = _task()
    kw = _base_kw(str(tmp_path / "ck"))
    kw["neg_every"] = 3
    cfg = get_config("base", n_shards=4, steps_per_call=3, **kw)
    trained = fit_distributed(cfg, task=task)
    ev = evaluate(cfg.replace(steps_per_call=1), task=task)  # no --fast
    for k in ("hits@1", "hits@10", "mrr", "final_loss"):
        assert ev.metrics[k] == trained.metrics[k], k
    cfg_u = get_config("base", n_shards=4, **_base_kw(str(tmp_path / "ck_u")))
    trained_u = fit_distributed(cfg_u, task=task)
    ev_u = evaluate(cfg_u.replace(steps_per_call=3), task=task)
    assert ev_u.metrics["hits@1"] == trained_u.metrics["hits@1"]


def test_evaluate_refuses_without_checkpoint(tmp_path):
    cfg = get_config("base", **_base_kw(None))
    with pytest.raises(ValueError, match="checkpoint_dir"):
        evaluate(cfg.replace(checkpoint_dir=None), task=_task())
    with pytest.raises(ValueError, match="no checkpoint found"):
        evaluate(cfg.replace(checkpoint_dir=str(tmp_path / "empty")), task=_task())


def test_evaluate_exports_embeddings(tmp_path):
    """save_emb_path works in eval-only mode: the serve export comes from
    the restored params (deploy-from-checkpoint without retraining)."""
    from tpugraph.serve import load_embeddings

    task = _task()
    p_train = str(tmp_path / "emb_train.npz")
    p_eval = str(tmp_path / "emb_eval.npz")
    cfg = get_config("base", save_emb_path=p_train,
                     **_base_kw(str(tmp_path / "ck")))
    run(cfg, task=task)
    evaluate(cfg.replace(save_emb_path=p_eval), task=task)
    np.testing.assert_array_equal(np.asarray(load_embeddings(p_train)),
                                  np.asarray(load_embeddings(p_eval)))


def test_zero_epochs_runs_no_steps():
    """epochs=0 without a checkpoint: supported zero-epoch semantics on all
    three trainers — no training step runs (loss stays nan), the final eval
    reports metrics of the fresh init, history is empty."""
    from tpugraph.dist.trainer import fit_distributed
    from tpugraph.train.loop import fit
    from tpugraph.train.mtl import fit_mtl

    task = _task()
    kw = dict(dim=16, epochs=0, eval_every=0, k_neg=5, neg_every=3,
              neg_mode="uniform", pad_bucket=256, syn_n_ent=150)
    for name, r in (
        ("fit", fit(get_config("base", **kw), task=task)),
        ("mtl", fit_mtl(get_config("base", use_rel_head=True, **kw), task=task)),
        ("dist", fit_distributed(get_config("base", n_shards=8, **kw), task=task)),
    ):
        assert r.history == [], name
        assert math.isnan(r.metrics["final_loss"]), name
        assert 0.0 <= r.metrics["hits@1"] <= 1.0, name


def test_cli_eval_only(tmp_path, capsys):
    """--eval-only end-to-end: train via the CLI, then evaluate via the CLI;
    the two printed JSON lines carry identical metrics."""
    from tpugraph.cli.main import main

    ckdir = str(tmp_path / "ck")
    common = ["--config", "base", "--quiet",
              "--set", "dim=16", "eval_every=0", "k_neg=5", "neg_every=3",
              "neg_mode=uniform", "pad_bucket=256", "syn_n_ent=150",
              "syn_n_triples=600", f"checkpoint_dir={ckdir}",
              "checkpoint_every=3"]
    assert main([*common, "--epochs", "6"]) == 0
    trained = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert main([*common, "--eval-only"]) == 0
    evaled = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert evaled == trained
