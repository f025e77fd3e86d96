"""Fused GCN-layer Pallas kernel: ELL aggregate + W GEMM in one VMEM pass.

The one Pallas SpMM formulation round 1 did not measure (VERDICT.md round-1
"What's missing" #1): fuse the layer's dense GEMM into the ELL aggregation so
the (N, d) aggregate never round-trips HBM.  The layer is computed in the
aggregate-first order — ``out = (A @ x) @ W`` (equal to the reference family's
``A @ (x W)`` by associativity; layers.py GraphConvolution, reference
unverifiable — mount empty, SURVEY.md §0) — with, per row tile:

    1. gather the tile's (TR·K) source rows of ``x`` from HBM into a VMEM
       double buffer via per-row async DMA (Mosaic on this platform rejects
       dynamic *vector* gather from VMEM refs — docs/DESIGN.md §3.3 — so
       per-row DMA is the only in-kernel gather primitive available);
    2. multiply by the ELL edge weights and reduce over K into a fp32
       accumulator tile (TR, d_in) held in VMEM;
    3. feed the accumulator straight to the MXU for the (d_in, d_out) weight
       GEMM and write only the (TR, d_out) output tile to HBM.

Versus the production path (kernels/spmm_ell.py + XLA GEMM) this eliminates
2·N·d bytes of aggregate traffic per layer — the HBM round-trip VERDICT.md
priced at ~168 MB/pass for zh-en scale fp32 — IF the in-kernel gather can
match XLA's hardware gather rate.  ``scripts/fused_gcn_probe.py`` measures
exactly that trade on the real chip; the outcome (docs/DESIGN.md §3 entry 4)
decides whether this becomes a production impl or a documented dead end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpugraph.sparse.ell import EllMatrix

N_SLOTS = 2  # double buffer


def _bucket_kernel(idx_ref, w_ref, x_hbm, wmat_ref, out_ref, acc_ref, gbuf, sems,
                   *, tr: int, k: int, cr: int):
    """One grid step = one (TR, K) row tile of one degree bucket.

    idx_ref : (TR, K) int32, SMEM — source-row ids (pad: 0)
    w_ref   : (TR, K) f32,  VMEM — edge weights (pad: 0)
    x_hbm   : (N, d_in)     ANY  — full feature table, gathered row-by-row
    wmat_ref: (d_in, d_out) VMEM — layer weight, resident per tile
    acc_ref : (TR, d_in) f32 scratch
    gbuf    : (N_SLOTS, CR·K, d_in) scratch (x dtype)
    sems    : DMA semaphores, one per slot
    """
    from jax.experimental.pallas import tpu as pltpu

    n_chunks = tr // cr
    per_chunk = cr * k

    def row_dma(c, j, slot):
        # flat position j of chunk c maps to ELL slot (row c·cr + j//k, j%k)
        src = idx_ref[c * cr + j // k, j % k]
        return pltpu.make_async_copy(
            x_hbm.at[src], gbuf.at[slot, j], sems.at[slot]
        )

    def issue(c, slot):
        jax.lax.fori_loop(0, per_chunk, lambda j, _: (row_dma(c, j, slot).start(), 0)[1], 0)

    def wait(c, slot):
        jax.lax.fori_loop(0, per_chunk, lambda j, _: (row_dma(c, j, slot).wait(), 0)[1], 0)

    issue(0, 0)

    import jax.experimental.pallas as pl

    def body(c, _):
        slot = c % N_SLOTS

        @pl.when(c + 1 < n_chunks)
        def _():
            issue(c + 1, (c + 1) % N_SLOTS)

        wait(c, slot)
        # Mosaic cannot lower a batched dot ("rk,rkd->rd" einsum), so the
        # K-reduction is expressed as VPU multiply + sum instead
        g = gbuf[slot].reshape(cr, k, gbuf.shape[-1]).astype(jnp.float32)
        wchunk = w_ref[pl.ds(c * cr, cr), :]
        part = jnp.sum(wchunk[:, :, None] * g, axis=1)
        acc_ref[pl.ds(c * cr, cr), :] = part
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[:] = jnp.dot(
        acc_ref[:], wmat_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _tile_sizes(k: int) -> tuple[int, int]:
    """(TR, CR): tile rows and chunk rows — keep CR·K DMAs per in-flight slot
    around 256, the SMEM idx tile (TR·K int32) small, and TR = 8·CR (Mosaic
    requires the sublane block dim divisible by 8)."""
    cr = max(1, min(64, 256 // k))  # cap TR at 512: SMEM windows are
    return cr * 8, cr               # lane-padded to 128, 2×-buffered


def fused_bucket_apply(idx: jax.Array, w: jax.Array, x: jax.Array,
                       wmat: jax.Array, *, interpret: bool = False) -> jax.Array:
    """(R, K) ELL bucket → (R_padded, d_out) = (bucket-aggregate of x) @ wmat.

    Rows are padded up to the tile multiple; callers slice [:R].
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r, k = idx.shape
    d_in = x.shape[-1]
    d_out = wmat.shape[-1]
    tr, cr = _tile_sizes(k)
    r_pad = -(-r // tr) * tr
    if r_pad != r:
        idx = jnp.pad(idx, ((0, r_pad - r), (0, 0)))
        w = jnp.pad(w, ((0, r_pad - r), (0, 0)))

    kern = functools.partial(_bucket_kernel, tr=tr, k=k, cr=cr)
    out = pl.pallas_call(
        kern,
        grid=(r_pad // tr,),
        in_specs=[
            pl.BlockSpec((tr, k), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tr, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((d_in, d_out), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tr, d_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, d_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tr, d_in), jnp.float32),
            pltpu.VMEM((N_SLOTS, cr * k, d_in), x.dtype),
            pltpu.SemaphoreType.DMA((N_SLOTS,)),
        ],
        interpret=interpret,
    )(idx, w, x, wmat)
    return out


def fused_gcn_layer(m: EllMatrix, diag: jax.Array | None, x: jax.Array,
                    wmat: jax.Array, bias: jax.Array | None = None,
                    *, interpret: bool = False) -> jax.Array:
    """out = (A @ x) @ W (+ b) with the aggregate kept in VMEM per tile.

    ``diag`` (the gather-free self-loop split, sparse/ell.py EllOperator.diag)
    is applied outside the kernel: (diag ⊙ x) @ W is sequential-access XLA
    work that fuses on its own.  Forward only — this is the measurement
    vehicle for DESIGN.md §3 entry 4, not (yet) a production impl.
    """
    outs = []
    for b in m.buckets:
        y = fused_bucket_apply(b.idx, b.w, x, wmat, interpret=interpret)
        outs.append(y[: b.idx.shape[0]])
    outs.append(jnp.zeros((1, wmat.shape[-1]), x.dtype))
    stacked = jnp.concatenate(outs, axis=0)
    out = jnp.take(stacked, m.row_order, axis=0)
    if diag is not None:
        out = out + jnp.dot(
            diag[:, None] * x.astype(jnp.float32), wmat.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(out.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def reference_layer(m: EllMatrix, diag, x, wmat, bias=None):
    """The production formulation (ELL aggregate via XLA gather, then GEMM)
    on identical inputs — the probe's baseline."""
    from tpugraph.kernels.spmm_ell import _apply_with_diag

    out = _apply_with_diag(m, diag, x)
    out = jnp.dot(out, wmat.astype(out.dtype),
                  preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out
