"""De-artifact the accuracy ladder: re-run the v4→v7 recipe ladder across
generator-hardness regimes (VERDICT.md round-1 "Next round" #5).

Round 1 tuned every recipe on the pinned synthetic task at its default
hardness (attr_noise=0.1, full attribute coverage, Zipf α=0.9), where the
planted attribute signal is strong — so the v7 "+28 Hits@1 from the attr
head" and the dim-256 win could be generator artifacts.  This sweep re-runs
the ladder at harder regimes (noisier attributes, partial attribute
coverage, heavier hub skew — knobs added to data/synthetic.py) and reports
which recipe wins survive.  Oracle confirmation for the headline points via

    python scripts/hardness_sweep.py --oracle --settings medium --recipes v7

Results recorded in BASELINE.md ("hardness ladder" table).

    python scripts/hardness_sweep.py [--settings a,b] [--platform cpu|tpu]

Default platform is cpu via jax.config.update — NOT the env var: this
environment's sitecustomize pins JAX_PLATFORMS=axon before user code runs
(see tests/conftest.py gotcha), so ``JAX_PLATFORMS=cpu`` on the command line
is silently ignored and runs go over the tunnel's per-compile RPCs.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from tpugraph.configs.recipes import RECIPES

# attr_noise: probability a KG2 attribute slot is re-rolled
# attr_coverage: per-side fraction of entities with any attributes
# alpha: Zipf exponent of entity popularity (hub skew)
SETTINGS = {
    "easy": dict(attr_noise=0.1, attr_coverage=1.0, alpha=0.9),  # round-1 regime
    "medium": dict(attr_noise=0.4, attr_coverage=0.6, alpha=1.1),
    "hard": dict(attr_noise=0.6, attr_coverage=0.3, alpha=1.2),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--settings", default=",".join(SETTINGS))
    ap.add_argument("--recipes", default="v4,v5,v6,v7")
    ap.add_argument("--oracle", action="store_true",
                    help="also run the torch-CPU parity oracle at each point")
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--small", action="store_true",
                    help="shrunk pinned task (1500 ents/side, half epochs, "
                         "boot_cap scaled) so a torch-oracle run fits the "
                         "2-core host — the round-3 two-sided confirmation "
                         "of the hardness-ladder conclusions (VERDICT r2 "
                         "Next #2); hardness knobs identical to the full task")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.train.driver import run

    for sname in args.settings.split(","):
        task = synthetic_align_task(
            n_ent=1500 if args.small else 5000, n_rel=60,
            n_triples=4500 if args.small else 15000, seed=42,
            drop_frac=0.1, noise_frac=0.1, **SETTINGS[sname],
        )
        for rname in args.recipes.split(","):
            hp = dict(RECIPES[rname])
            if args.small:
                # scale the schedule with the task: half the epochs, boot
                # capacity at the same fraction of the entity pool (2500/5000
                # → 750/1500), earlier boot start; everything else identical
                hp["epochs"] = hp["epochs"] // 2
                if hp.get("boot_cap"):
                    hp["boot_cap"] = hp["boot_cap"] * 1500 // 5000
                    hp["boot_start"] = hp["boot_start"] // 2
            cfg = get_config("base", eval_every=0, **hp)
            t0 = time.time()
            res = run(cfg, task=task)
            row = {"setting": sname, "recipe": rname,
                   "s": round(time.time() - t0, 1),
                   **{k: round(v, 4) for k, v in res.metrics.items()
                      if k in ("hits@1", "hits@10", "mrr")}}
            if args.small:
                row["task"] = "small"
            if args.oracle:
                from tpugraph.parity.torch_ref import train_oracle

                t1 = time.time()
                _, m = train_oracle(task, **hp)
                row["oracle_hits@1"] = round(m["hits@1"], 4)
                row["oracle_hits@10"] = round(m["hits@10"], 4)
                row["oracle_s"] = round(time.time() - t1, 1)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
