"""Interleaved A/B attribution of the headline-bench drift (VERDICT r4
weak #3 / Next #5): HEAD's bench.py vs the round-1 worktree's, run
ALTERNATING in one chip session so host/chip state is shared, >= 3 repeats
each.  Settles "noise" vs "regression at commit X" with numbers.

    python scripts/bench_ab.py --repeats 4 --r1-dir .ab_r1

Prints one JSON line per run as it lands, then a summary line with means,
spreads, and the verdict-relevant delta.  Chip-session metadata (iteration
count, torch thread pin) rides along per run.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time


def run_bench(d: str) -> dict:
    t0 = time.time()
    # PREPEND to PYTHONPATH (the env's /root/.axon_site entry registers the
    # axon TPU plugin — replacing the var kills the backend)
    pp = d + os.pathsep + os.environ.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd=d, capture_output=True, text=True,
        timeout=3600, env={**os.environ, "PYTHONPATH": pp},
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    rec["wall_s"] = round(time.time() - t0, 1)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("--r1-dir", default=".ab_r1")
    ap.add_argument("--out", default="docs/bench_ab.jsonl")
    args = ap.parse_args()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    legs = {"head": root, "r1": os.path.join(root, args.r1_dir)}
    vals: dict[str, list[float]] = {k: [] for k in legs}
    with open(os.path.join(root, args.out), "a") as f:
        for i in range(args.repeats):
            for tag, d in legs.items():  # strict alternation
                rec = {"leg": tag, "i": i, **run_bench(d), "_t": time.time()}
                vals[tag].append(rec["value"])
                print(json.dumps(rec), flush=True)
                f.write(json.dumps(rec) + "\n")
                f.flush()
        mh, mr = (statistics.mean(vals[t]) for t in ("head", "r1"))
        sh, sr = (statistics.stdev(vals[t]) if len(vals[t]) > 1 else 0.0
                  for t in ("head", "r1"))
        summary = {
            "summary": True,
            "head_mean": round(mh, 1), "head_stdev": round(sh, 1),
            "r1_mean": round(mr, 1), "r1_stdev": round(sr, 1),
            "head_over_r1": round(mh / mr, 4),
            "delta_pct": round(100.0 * (mh - mr) / mr, 2),
            # crude significance: |delta| vs combined spread
            "delta_vs_spread": round(abs(mh - mr) / max(sh + sr, 1e-9), 2),
        }
        print(json.dumps(summary), flush=True)
        f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
