"""AlignMTL — flagship multi-task model (BASELINE.json config[3]).

Shared AlignGCN encoder + alignment losses (margin, optional Sinkhorn OT) +
auxiliary relation/attribute heads, joined as

    L = L_margin + λ_ot·L_ot + λ_rel·L_rel + λ_attr·L_attr

(SURVEY.md §2.1 "Auxiliary MTL heads": joint loss weighting).  One flax
module so every parameter lives in a single tree for optimization,
checkpointing, and sharding.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from tpugraph.configs.configs import TrainConfig
from tpugraph.models.encoder import AlignGCN
from tpugraph.models.heads import AttributeHead, RelationHead
from tpugraph.sparse.graph import SpMMOperator
from tpugraph.train.losses import margin_align_loss
from tpugraph.train.ot import sinkhorn_align_loss


class AlignMTL(nn.Module):
    n_ent: int
    n_rel: int
    n_attr: int
    cfg: TrainConfig

    def setup(self):
        c = self.cfg
        self.encoder = AlignGCN(
            n_ent=self.n_ent, dim=c.dim, hidden=c.hidden, highway=c.highway,
            dropout=c.dropout, spmm_impl=c.spmm_impl, compute_dtype=c.param_dtype,
            l2_normalize=c.l2_normalize,
        )
        if c.use_rel_head:
            self.rel_head = RelationHead(n_rel=self.n_rel, dim=c.dim)
        if c.use_attr_head:
            self.attr_head = AttributeHead(n_attr=self.n_attr)
        if c.use_attr_channel:
            from tpugraph.models.attr_channel import AttrChannelGCN

            self.ae_encoder = AttrChannelGCN(
                n_attr=self.n_attr, dim=c.dim, spmm_impl=c.spmm_impl
            )

    def embed(self, op: SpMMOperator, attr_op=None, train: bool = False) -> jnp.ndarray:
        """Evaluation embeddings: SE channel, or the GCN-Align-style β-weighted
        SE‖AE concat when the attribute channel is enabled."""
        se = self.encoder(op, train=train)
        if self.cfg.use_attr_channel and attr_op is not None:
            from tpugraph.models.attr_channel import combine_channels

            ae = self.ae_encoder(op, attr_op)
            return combine_channels(se, ae, self.cfg.attr_beta)
        return se

    def __call__(self, op, batch: dict, train: bool = False, attr_op=None):
        """batch keys: pairs, neg_l, neg_r, and (per enabled head)
        rel_triples/rel_neg_t/rel_neg_h, attr_triples.  Optional
        pairs_aug/w: bootstrapped-augmented pairs for the MARGIN loss only —
        the Sinkhorn head stays on the seed pairs (proposals carry no OT
        mass; padding rows would distort the transport plan)."""
        c = self.cfg
        emb = self.encoder(op, train=train)
        aux = {}
        m_pairs = batch.get("pairs_aug", batch["pairs"])
        loss = margin_align_loss(emb, m_pairs, batch["neg_l"], batch["neg_r"],
                                 c.gamma, batch.get("w"))
        aux["margin"] = loss
        if c.use_sinkhorn:
            # "ot_pairs": optional per-interval subsample of the seed pairs
            # (cfg.sinkhorn_pairs) — caps the S×S transport problem at scale
            l_ot = sinkhorn_align_loss(
                emb, batch.get("ot_pairs", batch["pairs"]),
                tau=c.sinkhorn_tau, n_iters=c.sinkhorn_iters
            )
            aux["sinkhorn"] = l_ot
            loss = loss + c.sinkhorn_weight * l_ot
        if c.use_rel_head:
            l_rel = self.rel_head(emb, batch["rel_triples"], batch["rel_neg_t"],
                                  batch["rel_neg_h"])
            aux["rel"] = l_rel
            loss = loss + c.rel_weight * l_rel
        if c.use_attr_head:
            l_attr = self.attr_head(emb, batch["attr_triples"])
            aux["attr"] = l_attr
            loss = loss + c.attr_weight * l_attr
        if c.use_attr_channel and attr_op is not None:
            ae = self.ae_encoder(op, attr_op)
            l_ae = margin_align_loss(ae, m_pairs, batch["neg_l"], batch["neg_r"],
                                     c.gamma, batch.get("w"))
            aux["ae"] = l_ae
            loss = loss + c.attr_channel_weight * l_ae
        aux["total"] = loss
        return loss, aux
