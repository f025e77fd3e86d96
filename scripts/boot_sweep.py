"""Bootstrap-recipe sweep on the pinned task (tpugraph side only — the
oracle is only run to confirm the final winner via baseline_parity.py).

    python scripts/boot_sweep.py [--variants a,b,...]

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
            eval_csls_k=10, neg_mode="hard")

VARIANTS = {
    # adopted v3 (reference point)
    "v3": dict(boot_cap=2500, boot_start=200, boot_weight=0.5, boot_csls_k=10),
    # earlier start: more augmentation epochs
    "early": dict(boot_cap=2500, boot_start=100, boot_weight=0.5, boot_csls_k=10),
    # larger capacity
    "cap4k": dict(boot_cap=4000, boot_start=200, boot_weight=0.5, boot_csls_k=10),
    # full-weight proposals
    "w1": dict(boot_cap=2500, boot_start=200, boot_weight=1.0, boot_csls_k=10),
    # raw-distance matching (no CSLS scoring)
    "nocsls": dict(boot_cap=2500, boot_start=200, boot_weight=0.5, boot_csls_k=0),
    # longer training under augmentation
    "long": dict(boot_cap=2500, boot_start=200, boot_weight=0.5, boot_csls_k=10,
                 epochs=900),
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
