"""Auxiliary multi-task heads (BASELINE.json config[3]; SURVEY.md §2.1
"Auxiliary MTL heads"): relation and attribute heads reading the shared
entity embeddings, joined with the alignment losses by config weights.

* RelationHead — DistMult triple scoring s(h,r,t) = Σ e_h ⊙ w_r ⊙ e_t with
  self-adversarial-free margin-less BCE against corrupted tails/heads
  (the relation-type signal of the family's relation channel).
* AttributeHead — attribute prediction: a linear projection of the entity
  embedding to attribute-vocabulary logits, softmax cross-entropy per
  sampled (entity, attribute) triple (the class docstring's semantics —
  this module docstring previously said sigmoid-BCE-over-the-bag, which is
  NOT what ships; the per-triple CE form keeps static shapes at any scale
  and is what the torch parity oracle mirrors, tests/test_mtl.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class RelationHead(nn.Module):
    """DistMult scorer over shared entity embeddings."""

    n_rel: int
    dim: int

    @nn.compact
    def __call__(self, emb, triples, neg_tails, neg_heads):
        """triples: (T, 3) [h, r, t]; neg_*: (T, k) corrupted entity ids.

        Returns BCE loss: positives → 1, corruptions → 0.
        """
        rel = self.param("rel", nn.initializers.normal(1.0 / self.dim**0.5),
                         (self.n_rel, self.dim))
        h = jnp.take(emb, triples[:, 0], axis=0)
        r = jnp.take(rel, triples[:, 1], axis=0)
        t = jnp.take(emb, triples[:, 2], axis=0)
        pos = jnp.sum(h * r * t, axis=-1)  # (T,)
        tn = jnp.take(emb, neg_tails, axis=0)  # (T, k, d)
        hn = jnp.take(emb, neg_heads, axis=0)
        neg_t = jnp.einsum("td,tkd->tk", h * r, tn)
        neg_h = jnp.einsum("td,tkd->tk", r * t, hn)
        pos_loss = -jax.nn.log_sigmoid(pos).mean()
        neg_loss = -0.5 * (jax.nn.log_sigmoid(-neg_t).mean() + jax.nn.log_sigmoid(-neg_h).mean())
        return pos_loss + neg_loss


class AttributeHead(nn.Module):
    """Attribute prediction from entity embeddings: softmax over the shared
    attribute vocabulary per (entity, attribute) triple.  Static shapes at
    any scale (a batch of attr triples, not a dense multihot matrix)."""

    n_attr: int

    @nn.compact
    def __call__(self, emb, attr_triples):
        """attr_triples: (B, 2) int32 rows [ent, attr]. Returns mean CE."""
        logits = nn.Dense(self.n_attr)(jnp.take(emb, attr_triples[:, 0], axis=0))
        log_p = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(log_p, attr_triples[:, 1:2], axis=1).mean()
