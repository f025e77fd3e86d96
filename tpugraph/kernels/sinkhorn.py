"""Log-domain Sinkhorn optimal-transport iterations (BASELINE.json config[2]).

Entropic OT between uniform marginals with cost matrix C and temperature τ:

    P = diag(e^{f/τ}) · e^{−C/τ} · diag(e^{g/τ})

where the potentials f, g are fixed-point-iterated with log-sum-exp updates —
numerically stable in bf16/fp32 (SURVEY.md §7 hard part 5: fp32 log-domain
scaling) and expressed as a ``lax.scan`` so the whole solver is one fused XLA
loop on device; gradients flow by unrolling the scan (iters are small).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_iters",))
def sinkhorn_potentials(
    cost: jnp.ndarray,  # (N, M) cost matrix
    tau: float = 0.05,
    n_iters: int = 20,
    log_mu: jnp.ndarray | None = None,  # (N,) log source marginal
    log_nu: jnp.ndarray | None = None,  # (M,) log target marginal
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run n_iters of log-domain Sinkhorn; returns potentials (f, g)."""
    n, m = cost.shape
    c32 = cost.astype(jnp.float32)
    if log_mu is None:
        log_mu = jnp.full((n,), -jnp.log(n), dtype=jnp.float32)
    if log_nu is None:
        log_nu = jnp.full((m,), -jnp.log(m), dtype=jnp.float32)
    f = jnp.zeros((n,), jnp.float32)
    g = jnp.zeros((m,), jnp.float32)

    def step(carry, _):
        f, g = carry
        # f-update: f = τ·(log μ − logsumexp((g − C)/τ, axis=1))
        f = tau * (log_mu - jax.nn.logsumexp((g[None, :] - c32) / tau, axis=1))
        g = tau * (log_nu - jax.nn.logsumexp((f[:, None] - c32) / tau, axis=0))
        return (f, g), None

    (f, g), _ = jax.lax.scan(step, (f, g), None, length=n_iters)
    return f, g


def sinkhorn_log_plan(
    cost: jnp.ndarray, tau: float = 0.05, n_iters: int = 20, **kw
) -> jnp.ndarray:
    """log P — the log transport plan. exp() of this has the given marginals
    (approximately, to Sinkhorn convergence)."""
    f, g = sinkhorn_potentials(cost, tau=tau, n_iters=n_iters, **kw)
    return (f[:, None] + g[None, :] - cost.astype(jnp.float32)) / tau


def sinkhorn_plan(cost: jnp.ndarray, tau: float = 0.05, n_iters: int = 20, **kw) -> jnp.ndarray:
    return jnp.exp(sinkhorn_log_plan(cost, tau=tau, n_iters=n_iters, **kw))
