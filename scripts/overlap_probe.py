"""Compute/comm overlap evidence for the halo-exchange SpMM (SURVEY.md §7
hard part 4: "XLA may serialize the all_to_all" — demands verification).

``jax.profiler`` trace capture hangs on this platform (docs/DESIGN.md §7),
so the evidence is a forced-serialization ablation instead of a trace: the
``force_serialize=True`` variant puts an ``optimization_barrier`` between the
``all_to_all`` and the local aggregation, so the schedule CANNOT hide the
collective behind local compute.  If the default schedule overlaps, it must
be measurably faster than the serialized variant; if the two are equal, the
collective was serialized anyway and the edge-group split buys nothing.

Run on the virtual 8-device CPU mesh (this box) or a real pod slice:

    python scripts/overlap_probe.py                    # CPU, 8 virtual devices
    python scripts/overlap_probe.py --platform tpu     # pod slice (>=2 chips)

Prints one JSON line per (impl, serialize) cell + a summary line; results
recorded in docs/DESIGN.md §5.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--n-ent", type=int, default=20_000, help="entities per side")
    ap.add_argument("--n-triples", type=int, default=120_000, help="triples per side")
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--impl", default="ell", choices=["ell", "sorted", "both"])
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.shards}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from functools import partial
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.dist.halo import halo_spmm, halo_spmm_ell
    from tpugraph.dist.mesh import make_mesh
    from tpugraph.sparse.build import coo_from_triples, coo_normalize
    from tpugraph.sparse.halo_ell import build_halo_ell, squeeze_shard
    from tpugraph.sparse.partition import partition_edges

    task = synthetic_align_task(seed=0, n_ent=args.n_ent, n_rel=100,
                                n_triples=args.n_triples, n_pairs=100,
                                n_attr=0, attrs_per_ent=0)
    src, dst, w = coo_from_triples(task.n_ent, task.merged_triples,
                                   n_rel=task.n_rel, weighting="funifun")
    w = coo_normalize(src, dst, w, task.n_ent, norm="sym")
    hg = partition_edges(src, dst, w, task.n_ent, args.shards)
    mesh = make_mesh(args.shards, 1)
    n_pad = hg.n_loc * args.shards

    n_bnd = int(np.asarray(hg.bnd_w != 0).sum())
    stats = {
        "n_ent": task.n_ent, "nnz": hg.nnz, "dim": args.dim,
        "shards": args.shards,
        "boundary_edge_frac": round(n_bnd / hg.nnz, 4),
        "halo_rows_per_shard": int(hg.halo_b * (args.shards - 1)),
        "a2a_bytes_per_shard": int(hg.halo_b * args.shards * args.dim * 4),
    }
    print(json.dumps({"graph": stats}), flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n_pad, args.dim)).astype(np.float32))
    x = jax.device_put(x, NamedSharding(mesh, P("graph", None)))

    halo_ell = jax.device_put(build_halo_ell(hg), NamedSharding(mesh, P("graph")))
    hg_dev = jax.device_put(hg, NamedSharding(mesh, P("graph")))

    def bench(impl, serialize):
        if impl == "ell":
            @partial(shard_map, mesh=mesh, in_specs=(P("graph", None), P("graph")),
                     out_specs=P("graph", None))
            def step(xb, hs):
                hsq = squeeze_shard(hs)
                si = hsq.send_idx.reshape(hs.n_shards, hs.halo_b)
                sm = hsq.send_mask.reshape(hs.n_shards, hs.halo_b)
                return halo_spmm_ell(xb, hsq.loc, hsq.bnd, si, sm,
                                     force_serialize=serialize)

            op = halo_ell
        else:
            @partial(shard_map, mesh=mesh, in_specs=(P("graph", None), P("graph")),
                     out_specs=P("graph", None))
            def step(xb, hs):
                return halo_spmm(
                    xb, hs.loc_src.reshape(-1), hs.loc_dst.reshape(-1),
                    hs.loc_w.reshape(-1), hs.bnd_src.reshape(-1),
                    hs.bnd_dst.reshape(-1), hs.bnd_w.reshape(-1),
                    hs.send_idx.reshape(hs.n_shards, hs.halo_b),
                    hs.send_mask.reshape(hs.n_shards, hs.halo_b),
                    force_serialize=serialize)

            op = hg_dev

        f = jax.jit(step)
        with mesh:
            y = f(x, op)
            y.block_until_ready()
            times = []
            for _ in range(args.warmup + args.reps):
                t0 = time.perf_counter()
                f(x, op).block_until_ready()
                times.append(time.perf_counter() - t0)
        times = np.array(times[args.warmup:])
        return float(np.median(times)), float(times.min())

    impls = ["ell", "sorted"] if args.impl == "both" else [args.impl]
    summary = {}
    for impl in impls:
        t_overlap, _ = bench(impl, False)
        t_serial, _ = bench(impl, True)
        row = {
            "impl": impl,
            "overlap_ms": round(t_overlap * 1e3, 3),
            "serialized_ms": round(t_serial * 1e3, 3),
            "overlap_speedup": round(t_serial / t_overlap, 3),
            "edges_per_s_overlap": round(hg.nnz / t_overlap, 1),
        }
        summary[impl] = row["overlap_speedup"]
        print(json.dumps(row), flush=True)
    print(json.dumps({"overlap_speedup": summary, "platform": args.platform,
                      "note": "speedup > 1 => the all_to_all is hidden behind "
                              "the local edge-group aggregation"}), flush=True)


if __name__ == "__main__":
    main()
