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
