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


def _run(ckdir, env, kill_after_first_ckpt=False):
    p = subprocess.Popen(
        [sys.executable, "-u", "-m", "tpugraph.cli.main", *ARGS, f"checkpoint_dir={ckdir}"],
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
