"""Degree-bucketed ELLPACK edge layout — the scatter-free SpMM format.

Motivation (measured on the v5e chip, see SURVEY.md §7 hard part 2): XLA's
row gather runs at ~167M rows/s, but the sorted ``segment_sum`` scatter costs
2× the gather.  TPU has no efficient scatter; it does have an efficient
gather.  So aggregation is re-expressed as dense ops only:

* rows are bucketed by degree into power-of-two-capacity buckets;
* each bucket stores its edges as (rows, K) index/weight matrices
  (padding slots point at row 0 with weight 0);
* SpMM per bucket = ``take`` (the intrinsic random gather) → multiply →
  ``reshape``/``sum`` over the K axis — no scatter anywhere;
* per-bucket outputs are gathered back to natural row order with one final
  N-row take (or zero-cost if the entity ids are degree-grouped already).

The transpose operator gets its own ELL (bucketed by out-degree), so the
custom VJP is also scatter-free.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np


@jax.tree_util.register_dataclass
@dataclass
class EllBucket:
    rows: jax.Array | None  # (R,) int32 — natural row ids of this bucket;
    # None for stacked halo operators (aggregation needs only idx/w/row_order
    # — the payload would be dead weight on device, sparse/halo_ell.py)
    idx: jax.Array  # (R, K) int32 — source ids (pad: 0)
    w: jax.Array  # (R, K) float32 — edge weights (pad: 0.0)
    k: int = field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclass
class EllMatrix:
    """Degree-bucketed ELL matrix; rows with degree 0 are simply absent
    (their output rows are zero)."""

    buckets: list[EllBucket]
    row_order: jax.Array  # (N,) int32: natural row id -> position in concat output
    n_rows: int = field(metadata=dict(static=True))
    nnz: int = field(metadata=dict(static=True))
    n_cols: int | None = field(default=None, metadata=dict(static=True))
    # ^ column count A expects of x — jnp.take clamps out-of-range indices,
    # so a mis-sized feature matrix was silently clamp-gathered instead of
    # raising (round-4b kernels review); the appliers assert when set

    @property
    def padded_edges(self) -> int:
        return sum(int(np.prod(b.idx.shape)) for b in self.buckets)


def _bucket_caps(max_deg: int) -> list[int]:
    """Exact-degree buckets for small degrees (zero padding where most rows
    live — KG degree distributions are bottom-heavy), power-of-two above."""
    caps = [k for k in range(1, 9) if k <= max_deg]
    k = 16
    while k < max_deg:
        caps.append(k)
        k *= 2
    if not caps or caps[-1] < max_deg:
        caps.append(max(max_deg, 1))
    return caps


def build_ell(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray, n_rows: int,
    n_cols: int | None = None,
) -> EllMatrix:
    """COO (any order) → degree-bucketed ELL. Vectorized host-side numpy.

    ``n_cols`` (the x-row count A applies to; defaults to n_rows, i.e.
    square): validated against the src ids so a rectangular build with the
    wrong dimension fails HERE with a clear message instead of as an
    opaque IndexError inside the transpose build or a clamp-gathered wrong
    answer at apply time (round-4b kernels review)."""
    import jax.numpy as jnp

    nnz = len(src)
    if n_cols is None:
        n_cols = n_rows
    if nnz and int(src.max()) >= n_cols:
        raise ValueError(
            f"build_ell: src id {int(src.max())} out of range for "
            f"n_cols={n_cols} (rectangular matrix? pass n_cols explicitly)")
    order = np.argsort(dst, kind="stable")
    src_s, dst_s, w_s = src[order], dst[order], w[order]
    deg = np.bincount(dst_s, minlength=n_rows)
    starts = np.concatenate([[0], np.cumsum(deg)])
    # position of each edge within its row
    pos = np.arange(nnz) - starts[dst_s]

    buckets = []
    out_rows = []
    max_deg = int(deg.max()) if nnz else 1
    caps = _bucket_caps(max_deg)
    for i, cap in enumerate(caps):
        lo = caps[i - 1] if i > 0 else 0
        rows = np.where((deg > lo) & (deg <= cap))[0]
        if len(rows) == 0:
            continue
        rpos = np.full(n_rows, -1, dtype=np.int64)
        rpos[rows] = np.arange(len(rows))
        mask = rpos[dst_s] >= 0
        idx = np.zeros((len(rows), cap), np.int32)
        val = np.zeros((len(rows), cap), np.float32)
        idx[rpos[dst_s[mask]], pos[mask]] = src_s[mask]
        val[rpos[dst_s[mask]], pos[mask]] = w_s[mask]
        buckets.append(
            EllBucket(rows=jnp.asarray(rows.astype(np.int32)), idx=jnp.asarray(idx),
                      w=jnp.asarray(val), k=int(cap))
        )
        out_rows.append(rows)
    # rows with degree 0 point at the applier's trailing zero row
    concat_rows = (
        np.concatenate(out_rows) if out_rows else np.zeros(0, np.int64)
    )
    total = sum(len(r) for r in out_rows)
    row_order = np.full(n_rows, total, np.int64)  # default: the zero row
    row_order[concat_rows] = np.arange(total)
    return EllMatrix(
        buckets=buckets,
        row_order=jnp.asarray(row_order.astype(np.int32)),
        n_rows=int(n_rows),
        nnz=int(nnz),
        n_cols=int(n_cols),
    )


@jax.tree_util.register_dataclass
@dataclass
class EllOperator:
    """Forward (A) and transpose (Aᵀ) ELL matrices for fast fwd+bwd SpMM.

    ``diag`` (square A only): the matrix diagonal split out of both ELLs —
    self-loop edges need NO gather (they are a broadcast multiply with
    perfectly sequential access), and at KG scale they are ~16% of all
    edges; splitting them measured +15% fwd+bwd edges/s on the v5e chip
    (scripts/ell_diag_probe.py, 2026-08-18).  ``n_diag`` counts the edges
    carried by ``diag`` so ``nnz`` still reports the full logical edge count.
    """

    fwd: EllMatrix
    bwd: EllMatrix
    diag: jax.Array | None = None  # (n_rows,) float32, or None
    n_diag: int = field(default=0, metadata=dict(static=True))

    @property
    def n_rows(self) -> int:
        return self.fwd.n_rows

    @property
    def nnz(self) -> int:
        return self.fwd.nnz + self.n_diag


def build_ell_operator(
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    n_rows: int,
    n_cols: int | None = None,
    split_diag: bool = False,
) -> EllOperator:
    """``n_cols`` (rectangular A): the transpose ELL has n_cols output rows.

    ``split_diag`` (square A only) routes diagonal entries through the
    gather-free ``diag`` vector instead of the ELL buckets."""
    if split_diag:
        if n_cols is not None and n_cols != n_rows:
            raise ValueError("split_diag requires a square matrix")
        import jax.numpy as jnp

        on_diag = src == dst
        d = np.zeros(n_rows)
        np.add.at(d, src[on_diag], w[on_diag])
        src, dst, w = src[~on_diag], dst[~on_diag], w[~on_diag]
        return EllOperator(
            fwd=build_ell(src, dst, w, n_rows),
            bwd=build_ell(dst, src, w, n_rows),
            diag=jnp.asarray(d, jnp.float32),
            n_diag=int(on_diag.sum()),
        )
    nc = n_cols if n_cols is not None else n_rows
    return EllOperator(
        fwd=build_ell(src, dst, w, n_rows, n_cols=nc),
        bwd=build_ell(dst, src, w, nc, n_cols=n_rows),
    )
