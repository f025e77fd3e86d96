"""Cosine-family recipe sweep (roadmap: "still open: cosine distances").

The family's stronger variants (RDGCN/HGCN reporting convention) L2-normalize
output embeddings, which turns the L1/L2 machinery into a cosine-family
metric.  Round 1 rejected l2_normalize at v1 pressure (gamma=10: 0.094
Hits@1) — but the margin gamma must be recalibrated for the normalized scale
(unit-sphere L1 distances live in [0, ~2sqrt(d)]).  This sweeps gamma (and lr)
under l2_normalize on the pinned task, tpugraph side only; any winner gets
oracle-confirmed via baseline_parity.py before adoption.

    python scripts/metric_sweep.py [--variants a,b,...]

    NOTE: this image's sitecustomize pins JAX_PLATFORMS=axon before user
    code runs, so a JAX_PLATFORMS=cpu env prefix is silently ignored and
    runs go to the TPU chip via the tunnel (fine when the chip is free —
    that is where round-1/2 sweep numbers were measured). To force the
    CPU backend use jax.config.update('jax_platforms','cpu') as
    scripts/hardness_sweep.py --platform cpu does.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

# v2 pressure as the base (gamma is overridden per variant)
BASE = dict(dim=128, epochs=600, lr=2e-3, k_neg=100, neg_every=2,
            eval_csls_k=10, neg_mode="hard", l2_normalize=True)

VARIANTS = {
    "g1": dict(gamma=1.0),
    "g2": dict(gamma=2.0),
    "g4": dict(gamma=4.0),
    "g8": dict(gamma=8.0),
    # best-gamma refinements are added after the first pass:
    "g2_lr5": dict(gamma=2.0, lr=5e-3),
    "g4_lr5": dict(gamma=4.0, lr=5e-3),
    # with v4 bootstrapping on top
    "g2_boot": dict(gamma=2.0, boot_cap=2500, boot_start=200, boot_weight=0.5,
                    boot_csls_k=0),
    "g4_boot": dict(gamma=4.0, boot_cap=2500, boot_start=200, boot_weight=0.5,
                    boot_csls_k=0),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.train.loop import fit

    task = synthetic_align_task(n_ent=5000, n_rel=60, n_triples=15000, seed=42,
                                drop_frac=0.1, noise_frac=0.1)
    for name in args.variants.split(","):
        hp = dict(BASE, **VARIANTS[name])
        res = fit(get_config("base", eval_every=0, **hp), task=task)
        print(json.dumps({"variant": name,
                          **{k: round(v, 4) for k, v in res.metrics.items()
                             if k in ("hits@1", "hits@10", "mrr")}}), flush=True)


if __name__ == "__main__":
    main()
