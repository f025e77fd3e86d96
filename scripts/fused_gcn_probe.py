"""On-chip build-or-kill measurement for the fused GCN-layer Pallas kernel
(kernels/gcn_fused_pallas.py; VERDICT.md round-1 "Next round" #2).

Stages print progressively so a hung/slow remote compile is attributable:

    stage 0  trivial pallas DMA kernel (1 row)      — platform sanity
    stage 1  single bucket, small                    — kernel compiles at all
    stage 2  single bucket, gather-rate sized        — in-kernel DMA rows/s
    stage 3  full layer at zh-en scale vs ELL+GEMM   — the decisive ratio

Run:  python scripts/fused_gcn_probe.py [--stage N] [--dtype float32]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=3, help="run stages 0..N")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    # --- stage 0: trivial single-DMA pallas kernel ---
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def tiny_kernel(idx_ref, x_hbm, out_ref, gbuf, sem):
        dma = pltpu.make_async_copy(x_hbm.at[idx_ref[0, 0]], gbuf.at[0], sem)
        dma.start()
        dma.wait()
        out_ref[:] = gbuf[:]

    x0 = jnp.asarray(rng.standard_normal((16, 128)), dt)
    idx0 = jnp.asarray([[3]], jnp.int32)
    t0 = time.time()
    y = pl.pallas_call(
        tiny_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), dt),
        scratch_shapes=[pltpu.VMEM((1, 128), dt), pltpu.SemaphoreType.DMA],
    )(idx0, x0)
    err = float(jnp.abs(y[0] - x0[3]).max())
    print(f"stage0 ok in {time.time()-t0:.1f}s err={err}", flush=True)
    if args.stage < 1:
        return

    from tpugraph.kernels.gcn_fused_pallas import fused_bucket_apply

    # --- stage 1: small bucket ---
    n, d, R, K = 2000, 128, 512, 4
    idx = jnp.asarray(rng.integers(0, n, (R, K)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((R, K)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, d)), dt)
    W = jnp.asarray(rng.standard_normal((d, d)) * 0.1, dt)
    f = jax.jit(lambda x: fused_bucket_apply(idx, w, x, W))
    t0 = time.time()
    got = f(x).block_until_ready()
    ref = jnp.einsum("rk,rkd->rd", w, x[idx].astype(jnp.float32)) @ W.astype(jnp.float32)
    err = float(jnp.abs(ref - got[:R].astype(jnp.float32)).max() / jnp.abs(ref).max())
    print(f"stage1 ok in {time.time()-t0:.1f}s relerr={err:.2e}", flush=True)
    if args.stage < 2:
        return

    # --- stage 2: gather-rate sized single bucket ---
    n, R, K = 160_000, 65_536, 8
    idx = jnp.asarray(rng.integers(0, n, (R, K)), jnp.int32)
    w = jnp.asarray(rng.standard_normal((R, K)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, d)), dt)
    f = jax.jit(lambda x: fused_bucket_apply(idx, w, x, W))
    t0 = time.time()
    f(x).block_until_ready()
    print(f"stage2 compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(args.iters):
        y = f(x)
    y.block_until_ready()
    dtime = (time.time() - t0) / args.iters
    rows = R * K
    print(f"stage2 kernel {dtime*1e3:.2f} ms  in-kernel DMA gather "
          f"{rows/dtime/1e6:.1f}M rows/s", flush=True)

    # XLA gather+reduce+GEMM on the same data (the production formulation)
    g = jax.jit(lambda x: jnp.einsum(
        "rk,rkd->rd", w, jnp.take(x, idx.reshape(-1), axis=0)
        .reshape(R, K, d).astype(jnp.float32)).astype(dt) @ W)
    g(x).block_until_ready()
    t0 = time.time()
    for _ in range(args.iters):
        y = g(x)
    y.block_until_ready()
    xtime = (time.time() - t0) / args.iters
    print(f"stage2 XLA take+einsum+GEMM {xtime*1e3:.2f} ms  "
          f"{rows/xtime/1e6:.1f}M rows/s  fused/xla={xtime/dtime:.3f}x", flush=True)
    if args.stage < 3:
        return

    # --- stage 3: full layer, zh-en scale ---
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.kernels.gcn_fused_pallas import fused_gcn_layer, reference_layer
    from tpugraph.sparse.build import build_adjacency

    task = synthetic_align_task(seed=0, n_ent=82_000, n_rel=300,
                                n_triples=195_000, n_pairs=15_000,
                                n_attr=0, attrs_per_ent=0)
    op = build_adjacency(task.n_ent, task.merged_triples, n_rel=task.n_rel,
                         weighting="funifun", norm="sym", fmt="ell")
    x = jnp.asarray(rng.standard_normal((task.n_ent, d)), dt)
    fused = jax.jit(lambda x: fused_gcn_layer(op.fwd, op.diag, x, W))
    base = jax.jit(lambda x: reference_layer(op.fwd, op.diag, x, W))
    t0 = time.time()
    fused(x).block_until_ready()
    print(f"stage3 fused compile {time.time()-t0:.1f}s", flush=True)
    base(x).block_until_ready()
    for name, fn in (("fused_pallas", fused), ("ell_xla", base)):
        t0 = time.time()
        for _ in range(args.iters):
            y = fn(x)
        y.block_until_ready()
        dtime = (time.time() - t0) / args.iters
        print(f"stage3 {name}: {dtime*1e3:.2f} ms fwd  "
              f"{op.nnz/dtime/1e6:.1f}M edges/s", flush=True)


if __name__ == "__main__":
    main()
