"""Halo-exchange SpMM inside shard_map (BASELINE.json config[4] centerpiece).

Per shard (all code below runs per-device under shard_map over the 'graph'
axis; leading (n_shards, …) axes of HaloGraph are already split away):

1. gather the boundary rows each peer needs and launch ONE tiled
   ``all_to_all`` over ICI;
2. aggregate the LOCAL edge group — independent of the exchange, so XLA's
   latency-hiding scheduler CAN overlap it with the in-flight collective
   (SURVEY.md §3.4 / §7 hard part 4).  Overlap evidence: the profiler hangs
   on this platform (docs/DESIGN.md §7), so the claim is backed by the
   forced-serialization ablation instead — ``force_serialize=True`` makes the
   local aggregation data-depend on the received buffer, and
   ``scripts/overlap_probe.py`` measures the delta (results in DESIGN.md §5);
   a trace on a directly-attached pod slice remains future validation.
3. aggregate the BOUNDARY edge group from the received halo buffer;
4. sum the two partial aggregations.

Gradients: plain JAX AD through this function gives the reverse exchange
(all_to_all transposes to all_to_all, gather to segment-scatter over the
B-sized send lists) — no hand-written backward needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _segsum(w, x, src, dst, n_rows):
    # fp32 accumulation for bf16 inputs — same rationale as
    # kernels/spmm.py::_segment_spmm (bf16 scatter-add is an ~85× cliff on
    # this TPU; ELL semantics also accumulate fp32)
    msg = jnp.take(x, src, axis=0).astype(jnp.float32) * w[:, None]
    out = jax.ops.segment_sum(msg, dst, num_segments=n_rows + 1, indices_are_sorted=True)
    return out[:n_rows].astype(x.dtype)


def _exchange(x_local, send_idx, send_mask, axis, force_serialize,
              axis_index_groups):
    """The ONE halo exchange (shared by both aggregation impls): gather the
    send rows, zero the pad slots (cast the mask, not the payload — bf16
    activations must cross the ICI as bf16, half the exchange bytes), one
    tiled all_to_all, optional serialization barrier (overlap_probe's
    ablation).  ``send_idx``/``send_mask`` are (G, B) where G is the
    exchange-group size — the FULL axis size normally, the per-group size
    under ``axis_index_groups`` (component-grouped exchange, DESIGN.md
    §5 (c)).  Returns (x_local, recv) — x_local is passed back out because
    the barrier re-binds it."""
    g, b = send_idx.shape
    d = x_local.shape[1]
    with jax.named_scope("halo_a2a"):
        send = jnp.take(x_local, send_idx.reshape(-1), axis=0).reshape(g, b, d)
        send = send * send_mask[:, :, None].astype(send.dtype)
        recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                                  tiled=True,
                                  axis_index_groups=axis_index_groups)
    if force_serialize:
        # optimization_barrier ties x_local's availability to recv: the local
        # aggregation can then only start after the collective completes
        x_local, recv = jax.lax.optimization_barrier((x_local, recv))
    return x_local, recv.reshape(g * b, d)


def halo_spmm_ell(
    x_local: jnp.ndarray,  # (n_loc, d)
    loc_op,  # EllOperator over local rows (squeezed, this shard's)
    bnd_op,  # EllOperator over the halo recv buffer
    send_idx,  # (S, B)
    send_mask,  # (S, B)
    axis: str = "graph",
    force_serialize: bool = False,
    axis_index_groups=None,
) -> jnp.ndarray:
    """Scatter-free halo SpMM: same exchange/overlap structure as halo_spmm,
    aggregation via the ELL path (kernels/spmm_ell.py) in fwd AND bwd.

    ``force_serialize``: benchmarking aid (scripts/overlap_probe.py) — makes
    the local aggregation consume the received buffer first, so the schedule
    CANNOT overlap the collective with local compute; the timing delta vs the
    default is the measured overlap benefit.
    ``axis_index_groups``: component-grouped exchange (DESIGN.md §5 (c)) —
    the all_to_all runs within each listed shard group only; send_idx's
    leading dim is then the GROUP size, not the full axis size."""
    from tpugraph.kernels.spmm_ell import spmm_ell

    x_local, recv = _exchange(x_local, send_idx, send_mask, axis,
                              force_serialize, axis_index_groups)
    with jax.named_scope("spmm_local"):
        out = spmm_ell(loc_op, x_local)
    with jax.named_scope("spmm_boundary"):
        out = out + spmm_ell(bnd_op, recv)
    return out


def halo_spmm(
    x_local: jnp.ndarray,  # (n_loc, d) — this shard's rows of the feature matrix
    loc_src, loc_dst, loc_w,  # (E_loc,) local edge group
    bnd_src, bnd_dst, bnd_w,  # (E_bnd,) boundary edge group (src in halo buffer)
    send_idx,  # (G, B) — local rows to send to each exchange peer (G = group
    send_mask,  # (G, B)    size under axis_index_groups, else full axis size)
    axis: str = "graph",
    force_serialize: bool = False,
    axis_index_groups=None,
) -> jnp.ndarray:
    n_loc = x_local.shape[0]
    # 1. the shared halo exchange (see _exchange / halo_spmm_ell docstring)
    x_local, recv = _exchange(x_local, send_idx, send_mask, axis,
                              force_serialize, axis_index_groups)
    # 2. local aggregation — no data dependence on `recv`; overlaps the exchange
    with jax.named_scope("spmm_local"):
        out = _segsum(loc_w, x_local, loc_src, loc_dst, n_loc)
    # 3. boundary aggregation from the received halo rows
    with jax.named_scope("spmm_boundary"):
        out = out + _segsum(bnd_w, recv, bnd_src, bnd_dst, n_loc)
    return out
