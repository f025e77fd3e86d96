"""Measure the accuracy baseline: torch-CPU parity oracle vs tpugraph trainer
on the pinned benchmark task (BASELINE.md "parity-oracle" row).

The reference published no numbers (BASELINE.md), so the oracle's measured
Hits@1/@10 ARE the baseline; the TPU-native framework must match them on the
same task + hyperparameters.  Run:

    python scripts/baseline_parity.py [--scale small|dbp5k]

Prints one JSON line per system and a final comparison line.
"""

import argparse
import json
import sys

sys.path.insert(0, ".")

SCALES = {
    # quick smoke (CI-sized)
    "small": dict(n_ent=1500, n_rel=30, n_triples=6000, seed=42),
    # the pinned baseline task: DBP15K-shaped at 5k entities/side
    "dbp5k": dict(n_ent=5000, n_rel=60, n_triples=15000, seed=42),
}
from tpugraph.configs.recipes import RECIPES  # the tuned-recipe table (v1..v6)


VARIANTS = {
    # config[0]: plain 2-layer GCN, uniform adjacency, sym norm
    "base": dict(weighting="uniform", norm="sym", highway=False),
    # config[1]: highway gates + funifun relation weights + rw norm
    "highway": dict(weighting="funifun", norm="rw", highway=True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="dbp5k", choices=sorted(SCALES))
    ap.add_argument("--variant", default="base", choices=sorted(VARIANTS))
    ap.add_argument("--recipe", default="v1", choices=sorted(RECIPES))
    ap.add_argument("--skip-oracle", action="store_true")
    ap.add_argument("--eval-csls", type=int, default=None,
                    help=">0: CSLS hubness-corrected eval ranking (both "
                         "systems); default: the recipe's own setting")
    ap.add_argument("--neg-csls", type=int, default=0,
                    help=">0: CSLS hubness-corrected hard mining (both systems)")
    # boot-* default to None so the recipe's own values survive (passing a
    # flag still overrides; a default of 0 would silently disable v3/v4's
    # bootstrapping)
    ap.add_argument("--boot-cap", type=int, default=None,
                    help=">0: bootstrapped mutual-NN pair augmentation capacity")
    ap.add_argument("--boot-start", type=int, default=None)
    ap.add_argument("--boot-weight", type=float, default=None)
    ap.add_argument("--boot-csls", type=int, default=None)
    args = ap.parse_args()
    var = VARIANTS[args.variant]
    overrides = {k: v for k, v in dict(
        boot_cap=args.boot_cap, boot_start=args.boot_start,
        boot_weight=args.boot_weight, boot_csls_k=args.boot_csls,
    ).items() if v is not None}
    HP = dict(RECIPES[args.recipe], neg_csls_k=args.neg_csls, **overrides)
    HP.setdefault("neg_mode", "hard")
    HP.setdefault("boot_cap", 0)
    HP.setdefault("boot_start", 200)
    HP.setdefault("boot_weight", 0.5)
    HP.setdefault("boot_csls_k", 0)
    if args.eval_csls is not None:
        HP["eval_csls_k"] = args.eval_csls
    HP.setdefault("eval_csls_k", 0)

    from tpugraph.data.synthetic import synthetic_align_task

    task = synthetic_align_task(drop_frac=0.1, noise_frac=0.1, **SCALES[args.scale])

    results = {}
    if not args.skip_oracle:
        from tpugraph.parity.torch_ref import train_oracle

        _, m = train_oracle(task, **HP, **var)
        results["torch_oracle"] = m
        print(json.dumps({"system": "torch_oracle_cpu", "scale": args.scale,
                          "variant": args.variant,
                          **{k: round(v, 4) for k, v in m.items()}}), flush=True)

    from tpugraph.configs import get_config
    from tpugraph.train.driver import run

    cfg = get_config("base", eval_every=100, **HP, **var)
    res = run(cfg, task=task)
    results["tpugraph"] = res.metrics
    print(json.dumps({"system": "tpugraph", "scale": args.scale,
                      **{k: round(v, 4) for k, v in res.metrics.items()}}), flush=True)

    if "torch_oracle" in results:
        a, b = results["torch_oracle"], results["tpugraph"]
        print(json.dumps({
            "comparison": {
                k: {"oracle": round(a[k], 4), "tpugraph": round(b[k], 4),
                    "delta": round(b[k] - a[k], 4)}
                for k in ("hits@1", "hits@10", "mrr")
            }
        }), flush=True)


if __name__ == "__main__":
    main()
