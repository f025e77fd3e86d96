"""Host-side graph containers and device-ready padded edge shards.

Design notes (TPU-first, SURVEY.md §2.1 "Adjacency builder" / §7 hard part 1):

* Everything device-facing has *static shape*: edge lists are padded to a
  bucket multiple so recompilation only happens when the bucket changes, and
  padding edges are provably inert (weight 0.0, dst = a dedicated dump row
  that is sliced off / never read).
* The reference family stores adjacency as a scipy COO matrix fed to
  ``torch.spmm`` (reference: layers.py GraphConvolution — unverifiable, mount
  empty; see SURVEY.md §0).  Here the on-device format is a (src, dst, w)
  triple of flat arrays sorted by (dst, src) — i.e. CSR order without the
  indptr — which makes ``segment_sum`` runs contiguous and lets a Pallas
  kernel walk rows sequentially.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np

PAD_BUCKET = 8192  # edges padded up to a multiple of this (static-shape buckets)


@dataclass
class KG:
    """One knowledge graph: relation triples + optional attribute triples."""

    n_ent: int
    n_rel: int
    triples: np.ndarray  # (T, 3) int32 rows [head, rel, tail]
    attr_triples: np.ndarray | None = None  # (Ta, 2) int32 rows [ent, attr]
    n_attr: int = 0

    def __post_init__(self):
        self.triples = np.asarray(self.triples, dtype=np.int32)
        if self.triples.ndim != 2 or self.triples.shape[1] != 3:
            raise ValueError(f"triples must be (T,3), got {self.triples.shape}")
        if self.attr_triples is not None:
            self.attr_triples = np.asarray(self.attr_triples, dtype=np.int32)


@dataclass
class AlignTask:
    """A cross-KG entity-alignment task (the DBP15K/DWY100K shape).

    The two KGs are merged into one graph over the union entity set (family
    convention): kg2 entity ids are offset by ``kg1.n_ent`` and kg2 relation
    ids by ``kg1.n_rel``.  Alignment pairs hold *global* (merged) ids in
    column 0 (left/kg1) and column 1 (right/kg2).
    """

    kg1: KG
    kg2: KG
    train_pairs: np.ndarray  # (S, 2) int32 global ids
    test_pairs: np.ndarray  # (S', 2) int32 global ids
    name: str = "unnamed"

    def __post_init__(self):
        self.train_pairs = np.asarray(self.train_pairs, dtype=np.int32)
        self.test_pairs = np.asarray(self.test_pairs, dtype=np.int32)

    @property
    def n_ent(self) -> int:
        return self.kg1.n_ent + self.kg2.n_ent

    @property
    def n_rel(self) -> int:
        return self.kg1.n_rel + self.kg2.n_rel

    @property
    def n_attr(self) -> int:
        return max(self.kg1.n_attr, self.kg2.n_attr)

    @property
    def merged_triples(self) -> np.ndarray:
        """All relation triples in global ids, (T1+T2, 3)."""
        t2 = self.kg2.triples.copy()
        t2[:, 0] += self.kg1.n_ent
        t2[:, 2] += self.kg1.n_ent
        t2[:, 1] += self.kg1.n_rel
        return np.concatenate([self.kg1.triples, t2], axis=0)

    @property
    def merged_attr_triples(self) -> np.ndarray | None:
        """Attribute triples in global entity ids (attr vocab shared)."""
        parts = []
        if self.kg1.attr_triples is not None:
            parts.append(self.kg1.attr_triples)
        if self.kg2.attr_triples is not None:
            a2 = self.kg2.attr_triples.copy()
            a2[:, 0] += self.kg1.n_ent
            parts.append(a2)
        if not parts:
            return None
        return np.concatenate(parts, axis=0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_dataclass
@dataclass
class PaddedEdges:
    """Static-shape edge list sorted by (dst, src); device-ready.

    ``out = segment_sum(w[:, None] * x[src], dst, num_segments=n_rows + 1)``
    computes A @ x in rows [0, n_rows); row n_rows is the padding dump row
    and must be dropped by the consumer.  Padding edges have w == 0.0 and
    src == 0, so they contribute nothing in forward or backward.
    """

    src: jax.Array  # (E_pad,) int32
    dst: jax.Array  # (E_pad,) int32, non-decreasing; padding uses n_rows
    w: jax.Array  # (E_pad,) float32
    n_rows: int = field(metadata=dict(static=True))
    nnz: int = field(metadata=dict(static=True))  # true edge count (pre-pad)
    n_cols: int | None = field(default=None, metadata=dict(static=True))
    # ^ x-row count the gather expects (see EllMatrix.n_cols rationale);
    # the dst non-decreasing contract is likewise the BUILDER's job
    # (build.pad_sort_edges) — segment_sum consumes indices_are_sorted=True
    # and silently mis-sums on hand-built unsorted lists

    @property
    def e_pad(self) -> int:
        return self.src.shape[0]


@jax.tree_util.register_dataclass
@dataclass
class SpMMOperator:
    """A sparse matrix A packaged for fast fwd (A @ x) and bwd (Aᵀ @ g).

    ``fwd`` holds A's edges sorted by destination row; ``bwd`` holds the
    *same logical edges* re-sorted for the transpose product, so the custom
    VJP of SpMM is another sorted-segment SpMM rather than a random
    scatter-add (SURVEY.md §7 hard part 2).
    """

    fwd: PaddedEdges
    bwd: PaddedEdges

    @property
    def n_rows(self) -> int:
        return self.fwd.n_rows

    @property
    def nnz(self) -> int:
        return self.fwd.nnz
