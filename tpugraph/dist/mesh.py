"""Device-mesh construction and sharding placement (SURVEY.md §2.2).

The framework's logical mesh is 2-D from day one — ('graph', 'feature') —
so tensor-parallel feature sharding is a spec change, not a rewrite:

* 'graph'   — edge/entity partition axis (the GNN analog of EP/SP): edge
  arrays are sharded along it, negative-sample batches are data-parallel
  along it, gradients are reduced across it.
* 'feature' — optional TP axis for the embedding/feature dimension (needed
  at DWY100K+ dims).

Two distribution paths exist:
1. GSPMD (this module + dist/trainer.py): annotate NamedShardings, let XLA
   insert collectives.  Simple, correct, and the baseline for scaling runs.
2. Explicit shard_map with boundary all-to-all overlapped with local
   aggregation (dist/halo.py) — the BASELINE.json config[4] centerpiece,
   where the collective schedule must be controlled, not inferred.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpugraph.sparse.graph import PaddedEdges, SpMMOperator


def make_mesh(n_graph: int, n_feature: int = 1, devices=None, n_slice: int = 1) -> Mesh:
    """('graph', 'feature') mesh, or DCN-aware 3-D ('slice', 'graph',
    'feature') when n_slice > 1.

    Axis placement rule (SURVEY.md §5.8): 'graph' must map to ICI-adjacent
    devices so the halo all_to_all and ring ppermute ride ICI; 'slice' is the
    outermost axis and carries ONLY the per-step gradient all-reduce — the
    only collective that may ride DCN.  On real multi-slice hardware pass the
    device list from ``jax.experimental.mesh_utils.create_hybrid_device_mesh``
    (slice-major order); virtually (CPU backend) a reshape is faithful.
    """
    devices = devices if devices is not None else jax.devices()
    n = n_slice * n_graph * n_feature
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    if n_slice > 1:
        arr = np.asarray(devices[:n]).reshape(n_slice, n_graph, n_feature)
        return Mesh(arr, ("slice", "graph", "feature"))
    arr = np.asarray(devices[:n]).reshape(n_graph, n_feature)
    return Mesh(arr, ("graph", "feature"))


def replicate(tree, mesh: Mesh):
    s = NamedSharding(mesh, P())
    return jax.device_put(tree, s)


def _shard_edges(edges: PaddedEdges, mesh: Mesh) -> PaddedEdges:
    """Place a padded edge list sharded along 'graph' (pad to divisibility)."""
    import jax.numpy as jnp

    n = mesh.shape["graph"]
    e = edges.e_pad
    e_new = ((e + n - 1) // n) * n
    if e_new != e:
        pad = e_new - e
        edges = PaddedEdges(
            src=jnp.concatenate([edges.src, jnp.zeros(pad, jnp.int32)]),
            dst=jnp.concatenate([edges.dst, jnp.full(pad, edges.n_rows, jnp.int32)]),
            w=jnp.concatenate([edges.w, jnp.zeros(pad, jnp.float32)]),
            n_rows=edges.n_rows,
            nnz=edges.nnz,
        )
    s = NamedSharding(mesh, P("graph"))
    return PaddedEdges(
        src=jax.device_put(edges.src, s),
        dst=jax.device_put(edges.dst, s),
        w=jax.device_put(edges.w, s),
        n_rows=edges.n_rows,
        nnz=edges.nnz,
    )


def shard_operator(op: SpMMOperator, mesh: Mesh) -> SpMMOperator:
    """Shard both edge sorts along the graph axis (GSPMD path: XLA turns the
    per-shard segment reductions into scatter + all-reduce)."""
    return SpMMOperator(fwd=_shard_edges(op.fwd, mesh), bwd=_shard_edges(op.bwd, mesh))
