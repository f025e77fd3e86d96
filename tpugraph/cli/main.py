"""Trainer CLI (reference family train.py argparse surface, SURVEY.md §2.1).

    python -m tpugraph.cli.main --config base --set epochs=100 dim=64
    python -m tpugraph.cli.main --config highway --dataset dbp15k --data-root data/

Picks a named config from tpugraph.configs.CONFIGS and applies typed
``key=value`` overrides (``--set``).  Prints eval metrics as one JSON line at
the end so scripts can consume it.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

from tpugraph.configs import CONFIGS, RECIPES, get_config


def _coerce(field_type, raw: str):
    if field_type in (int, "int"):
        return int(raw)
    if field_type in (float, "float"):
        return float(raw)
    if field_type in (bool, "bool"):
        # strict: a typo like 'ture' or 'on' must not silently become False
        # and disable the head the user meant to enable (round-4b review)
        low = raw.lower()
        if low in ("1", "true", "yes"):
            return True
        if low in ("0", "false", "no"):
            return False
        raise SystemExit(f"boolean override value {raw!r} not understood "
                         f"(use true/false, 1/0, yes/no)")
    return raw


def parse_overrides(cfg, pairs: list[str]) -> dict:
    fields = {f.name: f.type for f in dataclasses.fields(cfg)}
    out = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"override {p!r} must be key=value")
        k, v = p.split("=", 1)
        if k not in fields:
            raise SystemExit(f"unknown config key {k!r}; valid: {sorted(fields)}")
        t = fields[k]
        if isinstance(t, str):  # from __future__ annotations
            t = {"int": int, "float": float, "bool": bool, "str": str}.get(
                t.split("|")[0].strip(), str
            )
        out[k] = _coerce(t, v)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(prog="tpugraph", description=__doc__)
    ap.add_argument("--config", default="base", choices=sorted(CONFIGS))
    ap.add_argument("--recipe", default=None, choices=sorted(RECIPES),
                    help="tuned training recipe (configs/recipes.py; applied "
                         "before --set overrides)")
    ap.add_argument("--dataset", default=None,
                    choices=["synthetic", "dbp15k", "openea"])
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--pair", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--metrics", default=None, help="JSONL metrics path")
    ap.add_argument("--profile-dir", default=None)
    ap.add_argument("--save-emb", default=None,
                    help="write the final embedding table here for "
                         "python -m tpugraph.serve")
    # action="append" + nargs="*": both `--set a=1 b=2` and repeated
    # `--set a=1 --set b=2` work (repeated flags used to silently drop all
    # but the last)
    ap.add_argument("--set", nargs="*", action="append", default=[],
                    help="key=value config overrides")
    ap.add_argument("--fast", action="store_true",
                    help="fuse each resample interval into one jitted dispatch "
                         "(steps_per_call=neg_every) + approx MXU hard mining "
                         "— amortizes the remote-TPU per-dispatch latency; "
                         "semantically equal to the unfused path (tests pin it)")
    ap.add_argument("--eval-only", action="store_true",
                    help="no training: restore the latest checkpoint from "
                         "checkpoint_dir (--set checkpoint_dir=...) and run "
                         "the exact final eval (+ --save-emb export) — the "
                         "reference family's get_hits on a loaded model")
    ap.add_argument("--quiet", action="store_true")
    ap.add_argument("--debug-nans", action="store_true",
                    help="dev flag: raise on the first NaN anywhere (jax_debug_nans)")
    args = ap.parse_args(argv)
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    cfg = get_config(args.config)
    if args.recipe:
        cfg = cfg.replace(**RECIPES[args.recipe])
    overrides = parse_overrides(cfg, [p for grp in args.set for p in grp])
    for k, flag in (("dataset", args.dataset), ("data_root", args.data_root),
                    ("pair", args.pair), ("epochs", args.epochs),
                    ("metrics_path", args.metrics), ("profile_dir", args.profile_dir),
                    ("save_emb_path", args.save_emb)):
        if flag is not None:
            overrides[k] = flag
    if args.fast:
        overrides.setdefault("steps_per_call",
                             overrides.get("neg_every", cfg.neg_every))
        overrides.setdefault("neg_metric", "sqeuclidean")
        overrides.setdefault("neg_approx", True)
    cfg = cfg.replace(**overrides)
    if cfg.spmm_impl == "pallas":
        # re-resolve the alias: get_config normalizes it, but a --set
        # override lands AFTER get_config and previously reinstated
        # 'pallas' — the trainers' fmt dispatch then built a 'sorted'
        # operator while the layer dispatched to spmm_ell (round-4b review)
        cfg = cfg.replace(spmm_impl="ell")

    # This environment's sitecustomize pre-imports jax with a pinned platform;
    # re-apply the user's JAX_PLATFORMS so `JAX_PLATFORMS=cpu python -m ...`
    # behaves as documented.
    import os

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat.split(",")[0])

    # Persistent compile cache: remote-TPU compiles cost minutes; cached
    # reruns cost seconds.  TPUGRAPH_COMPILE_CACHE overrides, "" disables.
    cache = os.environ.get(
        "TPUGRAPH_COMPILE_CACHE", os.path.expanduser("~/.cache/tpugraph-jax"))
    if cache:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)

    from tpugraph.train.driver import evaluate, run  # deferred: jax import is slow

    result = (evaluate if args.eval_only else run)(cfg, verbose=not args.quiet)
    print(json.dumps({"config": cfg.name, **{k: round(v, 4) for k, v in result.metrics.items()}}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
