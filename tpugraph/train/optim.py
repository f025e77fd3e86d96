"""Optimizer construction shared by every trainer (+ the torch oracle mirror).

The reference family runs plain Adam at a constant lr (train.py argparse
`--lr`); a learning-rate schedule is a standard extension the framework
exposes as three TrainConfig knobs:

    lr_schedule   'const' (default) | 'cosine'
    lr_warmup     linear warmup, in optimizer updates (== epochs here)
    lr_final_frac floor of the cosine decay, as a fraction of cfg.lr

One semantics, counted in optimizer UPDATES — which equals epochs for these
full-graph trainers, including the fused `steps_per_call` path (each
`lax.scan` iteration is one optax update):

    factor(t) = min((t+1)/warmup, 1)                              (warmup)
              * { 1                                               'const'
                { f + (1-f) * 1/2 * (1 + cos(pi * p))             'cosine'
    with p = clip((t - warmup) / max(1, total - warmup), 0, 1).

optax applies ``schedule(count)`` to the count-th update (count starts at 0,
optax scale_by_schedule), which is exactly torch LambdaLR's ``factor(epoch)``
when ``scheduler.step()`` runs after each epoch's ``opt.step()`` — so the two
frameworks see identical lr sequences (tests/test_optim.py pins this).
"""

from __future__ import annotations

import math

import optax


def lr_factor(t: float, total: int, schedule: str = "const", warmup: int = 0,
              final_frac: float = 0.0) -> float:
    """Schedule multiplier at update ``t`` (pure Python — the torch-oracle
    LambdaLR mirror; the jnp twin below is the jit-traceable one)."""
    wu = min((t + 1) / warmup, 1.0) if warmup > 0 else 1.0
    if schedule == "cosine":
        p = min(max((t - warmup) / max(1, total - warmup), 0.0), 1.0)
        dec = final_frac + (1.0 - final_frac) * 0.5 * (1.0 + math.cos(math.pi * p))
    elif schedule == "const":
        dec = 1.0
    else:
        raise ValueError(f"unknown lr_schedule {schedule!r}")
    return wu * dec


def make_schedule(cfg) -> optax.Schedule:
    """cfg → optax schedule callable (traced update count → lr)."""
    import jax.numpy as jnp

    total, warmup = cfg.epochs, cfg.lr_warmup
    schedule, f, base = cfg.lr_schedule, cfg.lr_final_frac, cfg.lr
    if schedule not in ("const", "cosine"):
        raise ValueError(f"unknown lr_schedule {schedule!r}")

    def fn(count):
        t = jnp.asarray(count, jnp.float32)
        wu = jnp.minimum((t + 1.0) / warmup, 1.0) if warmup > 0 else 1.0
        if schedule == "cosine":
            p = jnp.clip((t - warmup) / max(1, total - warmup), 0.0, 1.0)
            dec = f + (1.0 - f) * 0.5 * (1.0 + jnp.cos(jnp.pi * p))
        else:
            dec = 1.0
        return base * wu * dec

    return fn


def make_tx(cfg) -> optax.GradientTransformation:
    """The one optimizer-construction entry point for all trainers."""
    if cfg.lr_schedule == "const" and cfg.lr_warmup == 0:
        return optax.adam(cfg.lr)
    return optax.adam(make_schedule(cfg))
