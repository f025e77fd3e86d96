"""Pallas fused SDDMM-distance + Sinkhorn-update kernel (BASELINE config[2]:
"fused SDDMM distance + OT iterations on device").

The Sinkhorn f-update

    f_i = τ·(log μ_i − LSE_j[(g_j − C_ij)/τ])      C_ij = ‖l_i − r_j‖²

is flash-attention-shaped: stream r-tiles past each l-tile, compute the cost
tile on the MXU (‖l‖² + ‖r‖² − 2·l·rᵀ), fold into a running (max, sumexp)
accumulator, never writing C to HBM.  One kernel evaluates one potential
update; the solver alternates f/g by swapping arguments.  fp32 accumulators
throughout (SURVEY.md §7 hard part 5).

Grid: (q_blocks, c_blocks) with the c axis innermost; the accumulators live
in VMEM scratch and are finalized on the last c-step.  Falls back to
interpret mode off-TPU (tests).

Status (measured 2026-08-21, docs/DESIGN.md §4, scripts/sinkhorn_bench.py):
correct and ~73% of f32 MXU peak after the round-2 transposed-layout fix,
but the pure-XLA solver in kernels/sinkhorn.py is ~2× faster at the OT-head
sizes the recipes use (cost ≤ 64 MB fits HBM; one cost build + bandwidth-
bound logsumexp beats recomputing cost tiles every half-iteration) — so the
XLA solver stays the production path and this kernel is the alternative for
the cost-cannot-be-materialized single-chip regime (S ≳ 32k, d ≤ 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _f_update_kernel(l_ref, rt_ref, g_ref, logm_ref, out_ref, m_scr, s_scr, *, tau, n_valid_c):
    """One (BQ, BC) cost tile folded into running (max, sumexp) accumulators.

    The candidate side arrives PRE-TRANSPOSED as (d, BC) and the potentials
    as a (1, BC) row: with an in-kernel ``r.T`` / ``g.reshape(1, -1)``
    Mosaic materialized the relayouts instead of feeding the MXU — scoped
    stack ≈ BQ·BC·d·2 bytes (65 MB at (256, 512, 256), VMEM-OOM) and
    ~0.6 TFLOP/s; the transposed layout compiles to a canonical
    (BQ,d)×(d,BC) MXU dot."""
    ci = pl.program_id(1)
    nc = pl.num_programs(1)

    @pl.when(ci == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        s_scr[:] = jnp.zeros_like(s_scr)

    l = l_ref[:]  # (BQ, d)
    rt = rt_ref[:]  # (d, BC)
    g = g_ref[:]  # (1, BC) potentials for this candidate tile
    # cost tile on MXU.  (bf16 operands were tried 2026-08-21 and removed:
    # Mosaic runs the dot at the same speed with BIT-IDENTICAL results —
    # the cast is folded back to an f32 dot — so the knob did nothing.)
    l2 = jnp.sum(l * l, axis=1, keepdims=True)  # (BQ, 1)
    r2 = jnp.sum(rt * rt, axis=0, keepdims=True)  # (1, BC)
    c = l2 + r2 - 2.0 * jnp.dot(l, rt, preferred_element_type=jnp.float32)
    c = jnp.maximum(c, 0.0)
    z = (g - c) / tau  # (BQ, BC)
    # mask out padded candidate columns (global col index >= n_valid_c)
    bc = z.shape[1]
    col = ci * bc + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    z = jnp.where(col < n_valid_c, z, -jnp.inf)

    m_new = jnp.maximum(m_scr[:], jnp.max(z, axis=1, keepdims=True))
    # guard: rows where everything so far is -inf keep m=-inf, exp(-inf - -inf)
    # would be nan; use where to zero those terms
    safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    s_scale = jnp.where(jnp.isfinite(m_scr[:]), jnp.exp(m_scr[:] - safe_m), 0.0)
    s_new = s_scr[:] * s_scale + jnp.sum(
        jnp.where(jnp.isfinite(z), jnp.exp(z - safe_m), 0.0), axis=1, keepdims=True
    )
    m_scr[:] = m_new
    s_scr[:] = s_new

    @pl.when(ci == nc - 1)
    def _():
        lse = safe_m + jnp.log(jnp.maximum(s_scr[:], 1e-38))
        out_ref[:] = tau * (logm_ref[:] - lse)


def sinkhorn_potential_update(
    l: jnp.ndarray,  # (Q, d) query-side embeddings (L2-normalized by caller)
    r: jnp.ndarray,  # (C, d) candidate-side embeddings
    g: jnp.ndarray,  # (C,) current candidate potentials
    log_mu: jnp.ndarray,  # (Q,) log marginal of the query side
    tau: float,
    block_q: int = 256,
    block_c: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused f-update. Returns (Q,) new query potentials.

    The pre-transposed candidate layout keeps Mosaic's scoped stack small
    (the earlier in-kernel ``r.T`` made it ≈ BQ·BC·d·2 bytes and VMEM-OOMed
    at the default blocks — see the kernel docstring); (256, 512) compiles
    and runs at d=256."""
    q, d = l.shape
    c = r.shape[0]
    q_pad = ((q + block_q - 1) // block_q) * block_q
    c_pad = ((c + block_c - 1) // block_c) * block_c
    lp = jnp.zeros((q_pad, d), jnp.float32).at[:q].set(l.astype(jnp.float32))
    rtp = jnp.zeros((d, c_pad), jnp.float32).at[:, :c].set(r.astype(jnp.float32).T)
    gp = jnp.zeros((1, c_pad), jnp.float32).at[0, :c].set(g.astype(jnp.float32))
    lmp = jnp.zeros((q_pad, 1), jnp.float32).at[:q, 0].set(log_mu.astype(jnp.float32))

    grid = (q_pad // block_q, c_pad // block_c)
    out = pl.pallas_call(
        functools.partial(_f_update_kernel, tau=tau, n_valid_c=c),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_q, d), lambda qi, ci: (qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, block_c), lambda qi, ci: (0, ci), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_c), lambda qi, ci: (0, ci), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, 1), lambda qi, ci: (qi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, 1), lambda qi, ci: (qi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((q_pad, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=interpret,
    )(lp, rtp, gp, lmp)
    return out[:q, 0]


def sinkhorn_potentials_pallas(
    cost_l: jnp.ndarray,  # (N, d) left embeddings (normalized)
    cost_r: jnp.ndarray,  # (M, d) right embeddings (normalized)
    tau: float = 0.05,
    n_iters: int = 20,
    block_q: int = 256,
    block_c: int = 512,
    interpret: bool = False,
):
    """Full solver: alternate fused f/g updates. Matches
    kernels.sinkhorn.sinkhorn_potentials on cost = sqeuclidean(l, r)."""
    n, m = cost_l.shape[0], cost_r.shape[0]
    log_mu = jnp.full((n,), -np.log(n), jnp.float32)
    log_nu = jnp.full((m,), -np.log(m), jnp.float32)
    f = jnp.zeros((n,), jnp.float32)
    g = jnp.zeros((m,), jnp.float32)
    upd = functools.partial(
        sinkhorn_potential_update, tau=tau, block_q=block_q, block_c=block_c,
        interpret=interpret,
    )

    def step(carry, _):
        f, g = carry
        f = upd(cost_l, cost_r, g, log_mu)
        g = upd(cost_r, cost_l, f, log_nu)
        return (f, g), None

    (f, g), _ = jax.lax.scan(step, (f, g), None, length=n_iters)
    return f, g
