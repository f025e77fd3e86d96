"""Sinkhorn-OT-loss recipe sweep on the pinned task (tpugraph side only —
the oracle is only run to confirm a winner via baseline_parity.py).

Question: does adding the config[2] Sinkhorn OT alignment loss to the tuned
margin+bootstrap recipe (v4) move Hits@1?  All variants run through fit_mtl
(use_sinkhorn=True) so the key schedule is identical; the control is
sinkhorn_weight=0.0, which zeroes the OT gradient contribution.

    python scripts/ot_sweep.py [--variants a,b,...]

    NOTE: this image's sitecustomize pins JAX_PLATFORMS=axon before user
    code runs, so a JAX_PLATFORMS=cpu env prefix is silently ignored and
    runs go to the TPU chip via the tunnel (fine when the chip is free —
    that is where round-1/2 sweep numbers were measured). To force the
    CPU backend use jax.config.update('jax_platforms','cpu') as
    scripts/hardness_sweep.py --platform cpu does.

Prints one JSON line per variant.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

BASE = dict(dim=128, epochs=600, lr=2e-3, gamma=15.0, k_neg=100, neg_every=2,
            eval_csls_k=10, neg_mode="hard", use_sinkhorn=True,
            boot_cap=2500, boot_start=200, boot_weight=0.5, boot_csls_k=0)

VARIANTS = {
    # v4 through the MTL trainer, OT gradient zeroed — the control
    "ctrl": dict(sinkhorn_weight=0.0),
    "w01": dict(sinkhorn_weight=0.1),
    "w03": dict(sinkhorn_weight=0.3),
    "w10": dict(sinkhorn_weight=1.0),
    # temperature around the default 0.05 at the mid weight
    "w03_tau02": dict(sinkhorn_weight=0.3, sinkhorn_tau=0.02),
    "w03_tau10": dict(sinkhorn_weight=0.3, sinkhorn_tau=0.1),
    # first sweep was monotone in weight (0.299 → 0.432 at w=1.0): go higher
    "w20": dict(sinkhorn_weight=2.0),
    "w30": dict(sinkhorn_weight=3.0),
    "w10_tau10": dict(sinkhorn_weight=1.0, sinkhorn_tau=0.1),
    "w10_iters40": dict(sinkhorn_weight=1.0, sinkhorn_iters=40),
    # OT-dominant: margin pressure relaxed (gamma small), OT carries training
    "w10_g5": dict(sinkhorn_weight=1.0, gamma=5.0),
    # round 3: tau=0.1 at w=1.0 was the round-2 best (0.454) — probe tau up
    "w10_tau20": dict(sinkhorn_weight=1.0, sinkhorn_tau=0.2),
    "w10_tau30": dict(sinkhorn_weight=1.0, sinkhorn_tau=0.3),
    "w20_tau10": dict(sinkhorn_weight=2.0, sinkhorn_tau=0.1),
    "w10_tau15": dict(sinkhorn_weight=1.0, sinkhorn_tau=0.15),
    # round 4: still monotone in tau at w=1.0 (0.554 at tau=0.3) — keep going
    "w10_tau50": dict(sinkhorn_weight=1.0, sinkhorn_tau=0.5),
    "w10_tau70": dict(sinkhorn_weight=1.0, sinkhorn_tau=0.7),
    "w10_tau100": dict(sinkhorn_weight=1.0, sinkhorn_tau=1.0),
    "w05_tau30": dict(sinkhorn_weight=0.5, sinkhorn_tau=0.3),
    "w20_tau30": dict(sinkhorn_weight=2.0, sinkhorn_tau=0.3),
    # round 5: w20_tau30 hit 0.584 — weight matters again at higher tau
    "w30_tau30": dict(sinkhorn_weight=3.0, sinkhorn_tau=0.3),
    "w40_tau30": dict(sinkhorn_weight=4.0, sinkhorn_tau=0.3),
    "w20_tau40": dict(sinkhorn_weight=2.0, sinkhorn_tau=0.4),
    "w30_tau40": dict(sinkhorn_weight=3.0, sinkhorn_tau=0.4),
    # round 6: w=3/tau=0.3 is the plateau peak (0.598) — check longer
    # training and softer margin pressure at that point
    "w30_tau30_long": dict(sinkhorn_weight=3.0, sinkhorn_tau=0.3, epochs=900),
    "w30_tau30_g10": dict(sinkhorn_weight=3.0, sinkhorn_tau=0.3, gamma=10.0),
    # round 7: ablations at the adopted v5 point
    "v5_dim256": dict(sinkhorn_weight=3.0, sinkhorn_tau=0.3, dim=256),
    "v5_noboot": dict(sinkhorn_weight=3.0, sinkhorn_tau=0.3, boot_cap=0),
    # round 8: dim 256 pays under OT pressure (0.629 vs 0.598; it HURT at v1
    # pressure) — probe the dimension/lr surface at the v5 point
    "v5_dim384": dict(sinkhorn_weight=3.0, sinkhorn_tau=0.3, dim=384),
    "v5_dim512": dict(sinkhorn_weight=3.0, sinkhorn_tau=0.3, dim=512),
    "v5_dim256_lr1e3": dict(sinkhorn_weight=3.0, sinkhorn_tau=0.3, dim=256,
                            lr=1e-3),
    "v5_dim256_long": dict(sinkhorn_weight=3.0, sinkhorn_tau=0.3, dim=256,
                           epochs=900),
    # round 9: dim 256 is the sweet spot (384/512 collapse Hits@1 to 0.51) —
    # re-check the OT constants there before adopting v6
    "v5_dim256_w20": dict(sinkhorn_weight=2.0, sinkhorn_tau=0.3, dim=256),
    "v5_dim256_w40": dict(sinkhorn_weight=4.0, sinkhorn_tau=0.3, dim=256),
    "v5_dim256_tau20": dict(sinkhorn_weight=3.0, sinkhorn_tau=0.2, dim=256),
    "v5_dim256_tau40": dict(sinkhorn_weight=3.0, sinkhorn_tau=0.4, dim=256),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.train.mtl import fit_mtl

    task = synthetic_align_task(n_ent=5000, n_rel=60, n_triples=15000, seed=42,
                                drop_frac=0.1, noise_frac=0.1)
    for name in args.variants.split(","):
        hp = dict(BASE, **VARIANTS[name])
        res = fit_mtl(get_config("base", eval_every=0, **hp), task=task)
        print(json.dumps({"variant": name,
                          **{k: round(v, 4) for k, v in res.metrics.items()
                             if k in ("hits@1", "hits@10", "mrr")}}), flush=True)


if __name__ == "__main__":
    main()
