"""Edge partitioner for multi-chip graph parallelism (BASELINE.json config[4]).

Contiguous entity-range partition over the 'graph' mesh axis:

* shard s owns entity rows [s·Nloc, (s+1)·Nloc) and every edge whose
  destination it owns (so aggregation is shard-local);
* the embedding table is sharded by entity id along 'graph';
* source entities a shard does not own ("boundary"/halo entities) are
  exchanged with a single all-to-all before aggregation (SURVEY.md §3.4):
  shard o sends emb_local[send_idx[o, s]] to shard s;
* each shard's edges are split into a LOCAL-only group and a BOUNDARY group
  so the local aggregation can overlap the in-flight exchange
  (SURVEY.md §7 hard part 4).

All shapes are static: per-shard edge counts padded to the max over shards
(separately for local/boundary groups), halo block B padded to the max over
(sender, receiver) pairs.  Index spaces (two SEPARATE src spaces, one dst
space): local-group src is a local row id in [0, Nloc); boundary-group src
indexes the flattened recv buffer [0, G·B) as owner-rank-within-group·B +
slot (G = exchange-group size, n_shards when ungrouped); dst in both groups
is a local row id with pad edges pointing at the extra segment Nloc, which
the aggregators allocate and slice off (dropped in fwd, zero cotangent in
bwd — see dist/halo._segsum / halo_ell).

Host-side numpy only; the device sees stacked (n_shards, …) arrays that
shard_map splits along the 'graph' axis.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclass
class HaloGraph:
    """Stacked per-shard arrays (leading axis = n_shards) for shard_map."""

    # local-only edge group (src owned by the same shard), sorted by dst
    loc_src: jax.Array  # (S, E_loc) int32 — LOCAL row index of source
    loc_dst: jax.Array  # (S, E_loc) int32 — local dst row; pad = n_loc
    loc_w: jax.Array  # (S, E_loc) float32
    # boundary edge group (src arrives via halo exchange), sorted by dst
    bnd_src: jax.Array  # (S, E_bnd) int32 — index into recv buffer [0, G*B)
    bnd_dst: jax.Array  # (S, E_bnd) int32 — local dst row; pad = n_loc
    bnd_w: jax.Array  # (S, E_bnd) float32
    # halo exchange index lists.  G = n_shards // n_groups is the exchange
    # group size; ungrouped (n_groups=1) G = n_shards and these are the
    # classic (S, S, B) full-mesh lists.
    send_idx: jax.Array  # (S, G, B) int32 — local rows shard s sends to the
    #                      j-th member of ITS OWN group
    send_mask: jax.Array  # (S, G, B) float32 — 1.0 for real entries, 0.0 pad
    n_shards: int = field(metadata=dict(static=True))
    n_loc: int = field(metadata=dict(static=True))
    halo_b: int = field(metadata=dict(static=True))
    nnz: int = field(metadata=dict(static=True))
    n_rows: int = field(metadata=dict(static=True))  # original (unpadded) N
    n_groups: int = field(default=1, metadata=dict(static=True))
    has_halo: bool = field(default=True, metadata=dict(static=True))
    # ^ False when NO shard needs any remote row (e.g. n_shards=1, or a
    # perfectly component-aligned partition): the encoder then skips the
    # exchange and the boundary aggregation entirely — halo_b is floored at
    # pad_halo_to, so a boundary-free run would otherwise gather, mask,
    # all_to_all and aggregate a full padded buffer of zeros on every layer
    # pass (round-4b halo review)

    @property
    def group_size(self) -> int:
        return self.n_shards // self.n_groups

    @property
    def axis_groups(self) -> list[list[int]] | None:
        """axis_index_groups for the grouped all_to_all (None when ungrouped)."""
        if self.n_groups == 1:
            return None
        g = self.group_size
        return [[k * g + j for j in range(g)] for k in range(self.n_groups)]


def partition_edges(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    n_rows: int,
    n_shards: int,
    pad_edges_to: int = 1024,
    pad_halo_to: int = 256,
    n_groups: int = 1,
) -> HaloGraph:
    """COO (any order) → HaloGraph. See module docstring for the layout.

    ``n_groups > 1`` — component-grouped halo exchange (DESIGN.md §5
    alternative (c), built round 3): shards are split into ``n_groups``
    contiguous groups of G = n_shards//n_groups, and the all_to_all runs
    only WITHIN each group (axis_index_groups), shipping (G, B) instead of
    (S, B) per shard.  This exploits the merged alignment graph being
    block-diagonal across the two KGs: when each group's shard range covers
    exactly one connected component, cross-group halo needs are zero by
    construction.  The caller must align components to group boundaries
    (row-remapped ids — dist/trainer.py halo_grouped); a cross-group edge
    is a hard error, not silent degradation."""
    import jax.numpy as jnp

    if n_shards % n_groups:
        raise ValueError(f"n_groups={n_groups} must divide n_shards={n_shards}")
    g_size = n_shards // n_groups
    n_loc = _round_up(n_rows, n_shards) // n_shards
    owner_dst = np.minimum(dst // n_loc, n_shards - 1)
    owner_src = np.minimum(src // n_loc, n_shards - 1)
    if n_groups > 1:
        bad = (owner_dst // g_size) != (owner_src // g_size)
        if bad.any():
            i = int(np.argmax(bad))
            raise ValueError(
                f"grouped halo exchange requires a component-aligned "
                f"partition, but edge {int(src[i])}->{int(dst[i])} crosses "
                f"shard groups {int(owner_src[i]) // g_size}->"
                f"{int(owner_dst[i]) // g_size}; disable halo_grouped or fix "
                f"the row remap")

    loc_parts, bnd_parts = [], []
    recv_maps = []
    for s in range(n_shards):
        mine = owner_dst == s
        e_src, e_dst, e_w, e_own = src[mine], dst[mine], w[mine], owner_src[mine]
        local = e_own == s
        # local group: remap src to local index
        loc_parts.append((e_src[local] - s * n_loc, e_dst[local] - s * n_loc, e_w[local]))
        # boundary group: figure out needed remote rows per owner shard
        b_src, b_dst, b_w, b_own = e_src[~local], e_dst[~local], e_w[~local], e_own[~local]
        slots = np.empty(len(b_src), np.int64)
        per_owner_needed: dict[int, list[int]] = {}
        for o in range(n_shards):
            sel = b_own == o
            uniq, inv = np.unique(b_src[sel], return_inverse=True)
            per_owner_needed[o] = uniq
            slots[sel] = inv  # position within owner block, offset applied later
        recv_maps.append(per_owner_needed)
        # b_src itself is consumed no further: its information lives on in
        # (b_own, slots), which _pack turns into the recv-buffer index
        bnd_parts.append((b_dst - s * n_loc, b_w, b_own, slots))

    # halo block size B = max needed across (owner, receiver) pairs
    halo_b = 1
    for s in range(n_shards):
        for o, uniq in recv_maps[s].items():
            halo_b = max(halo_b, len(uniq))
    halo_b = _round_up(halo_b, pad_halo_to)

    send_idx = np.zeros((n_shards, g_size, halo_b), np.int32)
    send_mask = np.zeros((n_shards, g_size, halo_b), np.float32)
    for s in range(n_shards):  # receiver
        for o, uniq in recv_maps[s].items():  # owner/sender
            k = len(uniq)
            if k:
                # sender o addresses the receiver by its rank WITHIN o's
                # group (== full shard id when ungrouped)
                send_idx[o, s % g_size, :k] = (uniq - o * n_loc).astype(np.int32)
                send_mask[o, s % g_size, :k] = 1.0

    # finalize boundary src indices: recv buffer is laid out [owner, slot]
    e_loc = max(
        _round_up(max((len(p[0]) for p in loc_parts), default=1), pad_edges_to), pad_edges_to
    )
    e_bnd = max(
        _round_up(max((len(p[0]) for p in bnd_parts), default=1), pad_edges_to), pad_edges_to
    )

    def _pack(parts, e_max, boundary):
        S = n_shards
        a_src = np.zeros((S, e_max), np.int32)
        a_dst = np.full((S, e_max), n_loc, np.int32)
        a_w = np.zeros((S, e_max), np.float32)
        for s, p in enumerate(parts):
            if boundary:
                b_dst, b_w, b_own, slots = p
                # recv buffer is laid out [owner-rank-within-group, slot]
                idx = ((b_own % g_size) * halo_b + slots).astype(np.int64)
                order = np.argsort(b_dst, kind="stable")
                k = len(b_dst)
                a_src[s, :k] = idx[order]
                a_dst[s, :k] = b_dst[order]
                a_w[s, :k] = b_w[order]
            else:
                l_src, l_dst, l_w = p
                order = np.argsort(l_dst, kind="stable")
                k = len(l_dst)
                a_src[s, :k] = l_src[order]
                a_dst[s, :k] = l_dst[order]
                a_w[s, :k] = l_w[order]
        return a_src, a_dst, a_w

    l_src, l_dst, l_w = _pack(loc_parts, e_loc, boundary=False)
    b_src, b_dst, b_w = _pack(bnd_parts, e_bnd, boundary=True)

    return HaloGraph(
        loc_src=jnp.asarray(l_src), loc_dst=jnp.asarray(l_dst), loc_w=jnp.asarray(l_w),
        bnd_src=jnp.asarray(b_src), bnd_dst=jnp.asarray(b_dst), bnd_w=jnp.asarray(b_w),
        send_idx=jnp.asarray(send_idx), send_mask=jnp.asarray(send_mask),
        n_shards=int(n_shards), n_loc=int(n_loc), halo_b=int(halo_b),
        nnz=int(len(src)), n_rows=int(n_rows), n_groups=int(n_groups),
        has_halo=bool(send_mask.any()),
    )
