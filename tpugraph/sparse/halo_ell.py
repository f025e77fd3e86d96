"""Scatter-free ELL layout for the edge-partitioned halo encoder.

Converts a HaloGraph (sparse/partition.py) into per-shard ELL operators with
bucket shapes COMMON across shards (shard_map splits a stacked leading axis,
so every shard must see identical static shapes).  Two operators per shard:

* ``loc`` — the local edge group, a (n_loc × n_loc) matrix over this shard's
  own rows;
* ``bnd`` — the boundary group, a (n_loc × S·B) matrix over the received
  halo buffer.

Both carry their transpose ELL, so the halo SpMM's backward is scatter-free
too (spmm_ell's custom VJP).  Padded bucket rows have weight 0 and resolve
through row_order to the applier's trailing zero row — inert in fwd and bwd.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np

from tpugraph.sparse.ell import EllBucket, EllMatrix, EllOperator
from tpugraph.sparse.partition import HaloGraph


def _caps(max_deg: int) -> list[int]:
    """Pure power-of-two bucket caps — DELIBERATELY coarser than ell.py's
    exact small-degree buckets (1..8 then powers of two): stacked operators
    size every bucket to the max row count over shards, so fine-grained
    buckets mostly buy empty (R=0) buckets on some shards plus more
    all-shard padding, not less; the per-row pad waste (e.g. degree 5 → 8)
    is bounded 2× and measured immaterial (gathered pad rows of the
    repeated zero row are near-free, DESIGN.md §3)."""
    caps, k = [], 1
    while k < max_deg:
        caps.append(k)
        k *= 2
    caps.append(max(max_deg, 1))
    return caps


def _build_stacked_ell(per_shard_edges, n_rows: int,
                       n_cols: int | None = None) -> EllMatrix:
    """per_shard_edges: list of (src, dst, w) numpy triples (dst in [0,n_rows)).
    Returns an EllMatrix whose leaves carry a leading shard axis.
    ``n_cols``: the x-row count the apply expects (per shard) — validated
    and recorded so a mis-sized x fails at trace time (sparse/ell.py)."""
    import jax.numpy as jnp

    if n_cols is not None:
        mx = max((int(s.max()) for s, _, _ in per_shard_edges if len(s)),
                 default=-1)
        if mx >= n_cols:
            raise ValueError(
                f"_build_stacked_ell: src id {mx} out of range for "
                f"n_cols={n_cols}")

    s = len(per_shard_edges)
    degs = [np.bincount(d, minlength=n_rows) for _, d, _ in per_shard_edges]
    max_deg = max((int(dg.max()) if dg.size else 0) for dg in degs)
    caps = _caps(max(max_deg, 1))

    # per-cap row membership per shard
    members = []  # [cap][shard] -> row ids
    for i, cap in enumerate(caps):
        lo = caps[i - 1] if i > 0 else 0
        members.append([np.where((dg > lo) & (dg <= cap))[0] for dg in degs])
    keep = [i for i, m in enumerate(members) if any(len(r) for r in m)]
    caps = [caps[i] for i in keep]
    members = [members[i] for i in keep]

    buckets = []
    # positions within the concat, common across shards
    offsets = np.cumsum([0] + [max(len(r) for r in m) for m in members])
    total = int(offsets[-1])
    row_order = np.full((s, n_rows), total, np.int64)  # default → zero row

    for bi, (cap, mem) in enumerate(zip(caps, members)):
        r_b = max(len(r) for r in mem)
        idx = np.zeros((s, r_b, cap), np.int32)
        val = np.zeros((s, r_b, cap), np.float32)
        for sh, rows in enumerate(mem):
            if len(rows) == 0:
                continue
            src, dst, w = per_shard_edges[sh]
            rpos = np.full(n_rows, -1, np.int64)
            rpos[rows] = np.arange(len(rows))
            sel = rpos[dst] >= 0
            order = np.argsort(dst[sel], kind="stable")
            ds, ss_, ws = dst[sel][order], src[sel][order], w[sel][order]
            # position within row
            deg_sel = np.bincount(ds, minlength=n_rows)
            starts = np.concatenate([[0], np.cumsum(deg_sel)])
            pos = np.arange(len(ds)) - starts[ds]
            idx[sh, rpos[ds], pos] = ss_
            val[sh, rpos[ds], pos] = ws
            row_order[sh, rows] = offsets[bi] + np.arange(len(rows))
        # rows=None: the aggregation consumes only idx/w/row_order — the
        # natural-row-id payload would ride the device pytree per shard as
        # dead weight (only the single-graph locality probe reads .rows)
        buckets.append(EllBucket(rows=None, idx=jnp.asarray(idx),
                                 w=jnp.asarray(val), k=int(cap)))
    nnz = sum(len(p[0]) for p in per_shard_edges)
    return EllMatrix(buckets=buckets, row_order=jnp.asarray(row_order.astype(np.int32)),
                     n_rows=int(n_rows), nnz=int(nnz),
                     n_cols=int(n_cols) if n_cols is not None else None)


def _extract(hg: HaloGraph, group: str):
    """Strip per-shard padding edges and return numpy triples per shard."""
    src = np.asarray(getattr(hg, f"{group}_src"))
    dst = np.asarray(getattr(hg, f"{group}_dst"))
    w = np.asarray(getattr(hg, f"{group}_w"))
    out = []
    for sh in range(hg.n_shards):
        real = dst[sh] < hg.n_loc
        out.append((src[sh][real].astype(np.int64), dst[sh][real].astype(np.int64),
                    w[sh][real].astype(np.float64)))
    return out


@jax.tree_util.register_dataclass
@dataclass
class HaloEll:
    """Stacked (leading shard axis) scatter-free halo operators + exchange."""

    loc: EllOperator
    bnd: EllOperator
    send_idx: jax.Array  # (S, G, B) — G = group size (== S ungrouped)
    send_mask: jax.Array  # (S, G, B)
    n_shards: int = field(metadata=dict(static=True))
    n_loc: int = field(metadata=dict(static=True))
    halo_b: int = field(metadata=dict(static=True))
    nnz: int = field(metadata=dict(static=True))
    n_rows: int = field(metadata=dict(static=True))
    n_groups: int = field(default=1, metadata=dict(static=True))
    has_halo: bool = field(default=True, metadata=dict(static=True))
    # ^ mirrors HaloGraph.has_halo (see sparse/partition.py)

    @property
    def group_size(self) -> int:
        return self.n_shards // self.n_groups

    @property
    def axis_groups(self) -> list[list[int]] | None:
        g = self.group_size
        if self.n_groups == 1:
            return None
        return [[k * g + j for j in range(g)] for k in range(self.n_groups)]


def build_halo_ell(hg: HaloGraph) -> HaloEll:
    import jax.numpy as jnp

    loc_edges = _extract(hg, "loc")
    bnd_edges = _extract(hg, "bnd")
    n_ext = hg.group_size * hg.halo_b  # recv buffer: own-group rows only
    # split the diagonal (self-loops — always shard-local) out of the local
    # group: gather-free broadcast multiply, +15% measured on-chip SpMM rate
    # (see EllOperator.diag); stacked (S, n_loc) so shard_map splits it
    diag = np.zeros((hg.n_shards, hg.n_loc), np.float32)
    loc_off = []
    n_diag = 0
    for sh, (s_, d_, w_) in enumerate(loc_edges):
        on_d = s_ == d_
        np.add.at(diag[sh], d_[on_d], w_[on_d])
        n_diag += int(on_d.sum())
        loc_off.append((s_[~on_d], d_[~on_d], w_[~on_d]))
    loc = EllOperator(
        fwd=_build_stacked_ell(loc_off, hg.n_loc, n_cols=hg.n_loc),
        bwd=_build_stacked_ell([(d, s, w) for s, d, w in loc_off], hg.n_loc,
                               n_cols=hg.n_loc),
        diag=jnp.asarray(diag),
        n_diag=n_diag,
    )
    bnd = EllOperator(
        # bnd fwd src indexes the flattened recv buffer [0, n_ext)
        fwd=_build_stacked_ell(bnd_edges, hg.n_loc, n_cols=n_ext),
        bwd=_build_stacked_ell([(d, s, w) for s, d, w in bnd_edges], n_ext,
                               n_cols=hg.n_loc),
    )
    return HaloEll(
        loc=loc, bnd=bnd, send_idx=hg.send_idx, send_mask=hg.send_mask,
        n_shards=hg.n_shards, n_loc=hg.n_loc, halo_b=hg.halo_b,
        nnz=hg.nnz, n_rows=hg.n_rows, n_groups=hg.n_groups,
        has_halo=hg.has_halo,
    )


def squeeze_shard(tree):
    """Drop the leading length-1 shard axis shard_map leaves carry."""
    return jax.tree_util.tree_map(lambda a: a.reshape(a.shape[1:]), tree)


def build_attr_incidence_ell(attr_triples: np.ndarray, n_ent: int, n_attr: int,
                             n_shards: int, n_loc: int) -> EllOperator:
    """Edge-partitioned entity×attribute incidence (GCN-Align AE channel) as a
    stacked scatter-free ELL operator for the distributed trainer.

    Entity rows follow the same contiguous-range partition as
    partition_edges; the attribute-embedding table is REPLICATED (attribute
    vocabularies are small), so the incidence SpMM is purely shard-local — no
    halo exchange.  Weights are 1/deg with the degree computed GLOBALLY and
    duplicate (ent, attr) pairs deduped, matching
    models/attr_channel.build_attr_operator exactly.

    fwd: per-shard (n_loc × n_attr) — x = replicated attr embeddings;
    bwd: per-shard (n_attr × n_loc) transpose — shard_map's replicated-input
    transpose psums the per-shard attr-embedding cotangents automatically.
    """
    ent = attr_triples[:, 0].astype(np.int64)
    att = attr_triples[:, 1].astype(np.int64)
    key = ent * n_attr + att
    uniq = np.unique(key)
    ent, att = uniq // n_attr, uniq % n_attr
    deg = np.bincount(ent, minlength=n_ent).astype(np.float64)
    w = 1.0 / deg[ent]
    owner = np.minimum(ent // n_loc, n_shards - 1)
    fwd_parts, bwd_parts = [], []
    for s in range(n_shards):
        sel = owner == s
        a_s = att[sel].astype(np.int64)
        e_s = (ent[sel] - s * n_loc).astype(np.int64)
        w_s = w[sel]
        fwd_parts.append((a_s, e_s, w_s))
        bwd_parts.append((e_s, a_s, w_s))
    return EllOperator(fwd=_build_stacked_ell(fwd_parts, n_loc, n_cols=n_attr),
                       bwd=_build_stacked_ell(bwd_parts, n_attr, n_cols=n_loc))
