"""LR-schedule parity: the optax schedule and the torch-oracle LambdaLR must
see IDENTICAL learning rates at every optimizer update (train/optim.py)."""

import numpy as np
import pytest

from tpugraph.configs import get_config


@pytest.mark.parametrize(
    "schedule,warmup,final_frac",
    [("const", 0, 0.0), ("const", 5, 0.0),
     ("cosine", 0, 0.0), ("cosine", 5, 0.1)],
)
def test_lr_sequence_matches_torch_lambdalr(schedule, warmup, final_frac):
    import torch

    from tpugraph.train.optim import lr_factor, make_schedule

    total, base_lr = 30, 2e-3
    cfg = get_config("base", epochs=total, lr=base_lr, lr_schedule=schedule,
                     lr_warmup=warmup, lr_final_frac=final_frac)
    sched = make_schedule(cfg)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=base_lr)
    lam = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda t: lr_factor(t, total, schedule, warmup, final_frac))

    for t in range(total):
        torch_lr = opt.param_groups[0]["lr"]  # lr applied at update t
        optax_lr = float(sched(t))
        assert np.isclose(torch_lr, optax_lr, rtol=1e-6), (t, torch_lr, optax_lr)
        p.grad = torch.ones(1)
        opt.step()
        lam.step()

    # cosine endpoints: full lr after warmup, floor at the end
    if schedule == "cosine":
        assert np.isclose(float(sched(warmup)), base_lr, rtol=1e-5)
        assert np.isclose(float(sched(total)), base_lr * final_frac, atol=1e-9)


def test_cosine_schedule_trains_end_to_end():
    """The knobs flow through config -> make_tx -> fit (smoke, few epochs)."""
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.train.loop import fit

    task = synthetic_align_task(seed=0, n_ent=300, n_rel=8, n_triples=1200,
                                drop_frac=0.0, noise_frac=0.0)
    cfg = get_config("base", dim=48, epochs=60, eval_every=30,
                     lr_schedule="cosine", lr_warmup=5, lr_final_frac=0.1,
                     k_neg=10, neg_every=5, pad_bucket=1024)
    res = fit(cfg, task=task)
    assert res.history[-1]["loss"] < res.history[0]["loss"]


def test_make_tx_const_is_plain_adam():
    from tpugraph.train.optim import make_tx

    cfg = get_config("base")
    assert make_tx(cfg) is not None  # const path takes the plain-adam branch
