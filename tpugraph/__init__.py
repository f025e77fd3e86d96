"""tpugraph — a TPU-native GNN message-passing framework.

Built from scratch in JAX/XLA/Pallas for the sparse-GCN entity-alignment
model family of the reference repo (HestiaSky/GNN-MTL; see SURVEY.md — the
reference mount was empty at survey time, so capability parity is defined by
/root/repo/BASELINE.json and the PyTorch parity oracle in parity/torch_ref.py).

Layer map (SURVEY.md §1.2):
    kernels/   Pallas + pure-XLA sparse kernels (SpMM, SDDMM, Sinkhorn)
    sparse/    host-side graph containers, adjacency build, padded edge shards
    nn/        flax.linen graph layers (GraphConvolution, Highway)
    dist/      mesh construction, edge partitioning, shard_map train step
    models/    encoders + multi-task heads
    train/     losses, negative sampling, train loop, blockwise eval
    data/      synthetic DBP15K-shaped generator + DBP15K/JAPE format reader
    configs/   dataclass configs for the 5 BASELINE capability configs
"""

__version__ = "0.1.0"
