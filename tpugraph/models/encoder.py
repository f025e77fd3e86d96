"""AlignGCN — the 2-layer sparse-GCN entity-alignment encoder.

TPU-native rebuild of the reference family's ``models.py GCN`` (reference
unverifiable — mount empty, SURVEY.md §0/§2.1 "GCN encoder"): a trainable
entity-embedding table propagated through two GraphConvolution layers over
the merged KG-pair adjacency, with optional highway gates (config[1]) and
dropout.  Multi-task heads (models/heads.py) read the shared output
embeddings.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpugraph.nn.graphconv import GraphConvolution
from tpugraph.nn.highway import Highway
from tpugraph.sparse.graph import SpMMOperator


class AlignGCN(nn.Module):
    n_ent: int
    dim: int = 128
    hidden: int | None = None
    highway: bool = False
    dropout: float = 0.0
    spmm_impl: str = "sorted"
    compute_dtype: str = "float32"  # 'bfloat16': bf16 activations, fp32 params/accum
    l2_normalize: bool = False  # L2-normalize output rows (stabilizes margin scale)

    def setup(self):
        hidden = self.hidden or self.dim
        if self.highway and hidden != self.dim:
            raise ValueError(
                f"highway gates require hidden == dim (got {hidden} != {self.dim}): "
                "the gate interpolates pre/post-aggregation states of equal width"
            )
        self.emb = self.param(
            "emb", nn.initializers.normal(stddev=1.0 / self.dim**0.5), (self.n_ent, self.dim)
        )
        self.gc1 = GraphConvolution(hidden, impl=self.spmm_impl)
        self.gc2 = GraphConvolution(self.dim, impl=self.spmm_impl)
        if self.highway:
            self.hw1 = Highway()
            self.hw2 = Highway()
        if self.dropout > 0.0:
            self.drop = nn.Dropout(self.dropout)

    def layer_activations(self, op: SpMMOperator, train: bool = False) -> list[jnp.ndarray]:
        """[input embeddings, layer-1 act, layer-2 act] — parity harness hook."""
        x = self.emb.astype(jnp.dtype(self.compute_dtype))
        acts = [x]
        h = nn.relu(self.gc1(x, op))
        if self.highway:
            # setup already enforces hidden == dim when highway is on, so
            # both gates apply unconditionally (a shape guard here misled
            # readers into thinking hw1/hw2 had different applicability)
            h = self.hw1(x, h)
        acts.append(h)
        h_in = h
        if self.dropout > 0.0:
            h_in = self.drop(h_in, deterministic=not train)
        h2 = self.gc2(h_in, op)
        if self.highway:
            h2 = self.hw2(h, h2)
        out = h2.astype(jnp.float32)  # losses/eval always in fp32
        if self.l2_normalize:
            out = out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-8)
        acts.append(out)
        return acts

    def __call__(self, op: SpMMOperator, train: bool = False) -> jnp.ndarray:
        return self.layer_activations(op, train=train)[-1]
