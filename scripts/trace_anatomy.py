"""On-chip profiler trace anatomy of the production train step.

``jax.profiler`` hung on the axon tunnel in rounds 1–2 (DESIGN.md §7); the
platform now completes traces (re-tested 2026-08-21, round 3), so the
``--profile-dir`` plumbing that has been wired since round 1 finally pays:
this script profiles N epochs of a production-shaped training run on the
real chip and prints the device-time anatomy — total device ms/epoch and
the top HLO fusions — the measured per-phase breakdown the overlap/scaling
story needs (per-chip half; the collective half still needs ≥2 chips).

    python scripts/trace_anatomy.py [--dim 256] [--epochs 8] [--top 12]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, ".")


def parse_trace(profile_dir: str, top: int):
    paths = glob.glob(os.path.join(profile_dir, "plugins/profile/*/*.trace.json.gz"))
    assert paths, f"no trace written under {profile_dir}"
    with gzip.open(sorted(paths)[-1]) as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    # aggregate the per-op lanes only — module/step lanes double-count
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e.get("pid") in tpu_pids
               and "op" in str(e.get("args", {}).get("name", "")).lower()}
    per_op = collections.Counter()
    per_cat = collections.Counter()
    sigs = {}
    total_us = 0.0
    for e in ev:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            dur = float(e.get("dur", 0.0))
            name = e.get("name", "?")
            args = e.get("args", {})
            per_op[name] += dur
            per_cat[args.get("hlo_category", "?")] += dur
            if name not in sigs:
                ln = args.get("long_name", "")
                sigs[name] = ln.split(" = ", 1)[-1].split(" fusion(")[0][:48]
            total_us += dur
    return per_op.most_common(top), per_cat, sigs, total_us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--n-ent", type=int, default=19000, help="entities/side")
    ap.add_argument("--n-triples", type=int, default=70000)
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--keep", default=None, help="keep the trace dir here")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.train.loop import fit

    task = synthetic_align_task(seed=7, n_ent=args.n_ent, n_rel=1200,
                                n_triples=args.n_triples, n_pairs=15000,
                                n_attr=0, attrs_per_ent=0)
    prof = args.keep or tempfile.mkdtemp(prefix="tpugraph_trace_")
    cfg = get_config("base", dim=args.dim, epochs=args.epochs, eval_every=0,
                     k_neg=50, neg_every=5, neg_mode="hard", neg_approx=True,
                     profile_dir=prof)
    fit(cfg, task=task)

    # the loop traces epochs [start+2, start+5) -> 3 profiled epochs
    ops, cats, sigs, total_us = parse_trace(prof, args.top)
    n_prof = 3
    print(json.dumps({
        "device_ms_per_epoch": round(total_us / 1e3 / n_prof, 2),
        "n_ent": task.n_ent, "dim": args.dim,
        "by_hlo_category_ms": {
            c: round(d / 1e3 / n_prof, 2) for c, d in cats.most_common()},
        "top_ops_ms_per_epoch": {
            f"{n} [{sigs.get(n, '')}]": round(d / 1e3 / n_prof, 3)
            for n, d in ops},
    }, indent=1), flush=True)
    if not args.keep:
        shutil.rmtree(prof, ignore_errors=True)


if __name__ == "__main__":
    main()
