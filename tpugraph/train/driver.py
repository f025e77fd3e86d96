"""Config → trainer dispatch.

Routes a TrainConfig to the right training path: the plain full-graph loop,
the multi-task loop (Sinkhorn/relation/attribute heads), or the
edge-partitioned distributed step (n_shards > 1).  Kept separate from
loop.py so the CLI and tests have one entry point as capabilities grow.
"""

from __future__ import annotations

from tpugraph.configs.configs import TrainConfig
from tpugraph.train.loop import TrainResult, fit


def run(cfg: TrainConfig, verbose: bool = False, task=None) -> TrainResult:
    """``task``: pre-built AlignTask (sweeps/tests); None = load from cfg."""
    if cfg.n_shards > 1 or cfg.feature_shards > 1 or cfg.slice_shards > 1:
        from tpugraph.dist.trainer import fit_distributed

        return fit_distributed(cfg, task=task, verbose=verbose)
    if (cfg.use_sinkhorn or cfg.use_rel_head or cfg.use_attr_head
            or cfg.use_attr_channel):
        from tpugraph.train.mtl import fit_mtl

        return fit_mtl(cfg, task=task, verbose=verbose)
    return fit(cfg, task=task, verbose=verbose)


def evaluate(cfg: TrainConfig, verbose: bool = False, task=None) -> TrainResult:
    """Eval-only entry (the reference family's ``get_hits`` on a loaded
    model — SURVEY.md §2.1 Hits@k row): restore the latest checkpoint from
    ``cfg.checkpoint_dir`` and run the exact final eval (+ the optional
    serve export via ``save_emb_path``) without a single training step.
    Works on all three trainers — single-device, MTL, and distributed (the
    n_shards > 1 path restores across mesh shapes like any resume).

    Implemented as the trainers' zero-epoch path: with ``epochs=0`` the
    training loop body never runs, so the restored params flow straight to
    the exact final eval under the run's own convention (``eval_csls_k``);
    ``metrics`` reproduces the training run's final metrics bit-for-bit
    (tests/test_eval_only.py).  Refuses to score a fresh random init: a
    missing/empty checkpoint_dir raises instead of silently reporting
    garbage metrics."""
    if not cfg.checkpoint_dir:
        raise ValueError(
            "evaluate() needs cfg.checkpoint_dir pointing at a trained "
            "checkpoint (set checkpoint_dir/checkpoint_every on the training "
            "run); without one there is nothing to evaluate")
    from tpugraph.train.checkpoint import Checkpointer

    # checkpoint_every may be 0 in a hand-built eval config; the restore
    # path only needs the Checkpointer enabled, so floor it at 1
    eff_every = max(cfg.checkpoint_every, 1)
    probe = Checkpointer(cfg.checkpoint_dir, eff_every)
    found = probe.latest_step()
    steps = cfg.steps_per_call
    if found is not None and (cfg.n_shards > 1 or cfg.feature_shards > 1
                              or cfg.slice_shards > 1):
        # distributed checkpoints carry interval-batch state ONLY when saved
        # under steps_per_call == 1, and the restore template must match —
        # auto-adopt the checkpoint's format so a --fast-trained run
        # evaluates without re-passing --fast (and vice versa); for eval
        # only the template matters, no interval ever runs
        has_batch = probe.latest_has_key("batch_pairs")
        if has_batch is False and steps <= 1:
            steps = max(cfg.neg_every, 1)
        elif has_batch is True and steps > 1:
            steps = 1
    probe.close()
    if found is None:
        raise ValueError(
            f"no checkpoint found under {cfg.checkpoint_dir!r} — evaluate() "
            f"refuses to report metrics from a fresh random init; train "
            f"first or fix the path")
    return run(cfg.replace(epochs=0, checkpoint_every=eff_every,
                           steps_per_call=steps, profile_dir=None),
               verbose=verbose, task=task)
