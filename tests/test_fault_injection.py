"""Fault injection (SURVEY.md §5.3): SIGKILL the trainer process mid-run,
relaunch it, and assert the resumed run reproduces the uninterrupted run
exactly (crash-only design: Orbax checkpoints + epoch-derived keys)."""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARGS = [
    "--config", "base", "--quiet",
    "--set", "epochs=60", "eval_every=0", "dim=24", "k_neg=5", "neg_every=4",
    "neg_mode=uniform", "pad_bucket=512", "syn_n_ent=400", "syn_n_triples=1600",
    "checkpoint_every=4",
]


def _run(ckdir, env, kill_after_first_ckpt=False, args=None):
    p = subprocess.Popen(
        [sys.executable, "-u", "-m", "tpugraph.cli.main", *(ARGS if args is None else args),
         f"checkpoint_dir={ckdir}"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=REPO,
    )
    if kill_after_first_ckpt:
        deadline = time.time() + 120
        while time.time() < deadline:
            steps = [d for d in (os.listdir(ckdir) if os.path.isdir(ckdir) else [])
                     if d.isdigit()]
            if steps:
                time.sleep(0.2)  # let the save finish
                p.send_signal(signal.SIGKILL)
                p.wait()
                return None
            if p.poll() is not None:
                break
            time.sleep(0.2)
        out = p.communicate()[0].decode()
        raise AssertionError(f"no checkpoint appeared before exit:\n{out[-1500:]}")
    out, _ = p.communicate(timeout=240)
    assert p.returncode == 0, out.decode()[-1500:]
    last = out.decode().strip().splitlines()[-1]
    return json.loads(last)


def test_kill_and_relaunch_continues_exactly(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    # reference: uninterrupted run
    ref = _run(str(tmp_path / "ref"), env)

    # victim: SIGKILL after the first checkpoint lands, then relaunch
    ckdir = str(tmp_path / "victim")
    _run(ckdir, env, kill_after_first_ckpt=True)
    resumed = _run(ckdir, env)

    assert resumed["final_loss"] == ref["final_loss"]
    assert resumed["hits@1"] == ref["hits@1"]
    assert resumed["hits@10"] == ref["hits@10"]


def test_sigterm_emergency_checkpoint_and_resume(tmp_path):
    """Preemption (SIGTERM) forces an emergency save at the next epoch
    boundary and a clean exit; relaunch reproduces the uninterrupted run.
    checkpoint_every is set beyond the run length, so the ONLY checkpoint
    that can exist is the emergency one."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    args = [a if a != "checkpoint_every=4" else "checkpoint_every=100000" for a in ARGS]
    args = [a if a != "epochs=60" else "epochs=3000" for a in args]

    ref_dir = str(tmp_path / "ref")
    p = subprocess.Popen(
        [sys.executable, "-u", "-m", "tpugraph.cli.main", *args,
         f"checkpoint_dir={ref_dir}"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=REPO)
    out, _ = p.communicate(timeout=240)
    assert p.returncode == 0, out.decode()[-1500:]
    ref = json.loads(out.decode().strip().splitlines()[-1])

    ckdir = str(tmp_path / "victim")
    metrics = str(tmp_path / "victim_metrics.jsonl")
    p = subprocess.Popen(
        [sys.executable, "-u", "-m", "tpugraph.cli.main", *args,
         f"checkpoint_dir={ckdir}", "eval_every=2", f"metrics_path={metrics}"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=REPO)
    deadline = time.time() + 120
    started = False
    while time.time() < deadline:
        # metrics JSONL line 1 is config; an eval record means training is live
        if os.path.exists(metrics) and sum(1 for _ in open(metrics)) >= 2:
            started = True
            break
        if p.poll() is not None:
            break
        time.sleep(0.1)
    assert started, "victim never reached a live epoch"
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=120)
    assert p.returncode == 0, f"preempted run must exit cleanly:\n{out.decode()[-1500:]}"
    steps = [d for d in os.listdir(ckdir) if d.isdigit()]
    assert steps, "no emergency checkpoint was written"
    assert all(int(s) < 2999 for s in steps), "run was not actually preempted early"

    resumed = _run(ckdir, env, args=args)
    assert resumed["final_loss"] == ref["final_loss"]
    assert resumed["hits@1"] == ref["hits@1"]
