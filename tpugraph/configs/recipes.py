"""Tuned training recipes for the pinned DBP15K-shaped benchmark task.

A recipe is a dict of TrainConfig overrides — the product of the round-1
sweeps (scripts/boot_sweep.py, ot_sweep.py; every adoption oracle-confirmed
via scripts/baseline_parity.py — measured rows in BASELINE.md):

    v1  the original pinned recipe (hard negatives)
    v2  harder negative pressure (γ15, k100, resample every 2)        +2.7 Hits@1
    v3  v2 + bootstrapped mutual-NN pair augmentation (CSLS-scored)   +2.2
    v4  v3 with raw-distance mutual-NN matching (boot_csls_k=0)       +0.8
    v5  v4 + Sinkhorn OT alignment NLL (w=3.0, τ=0.3, seed pairs)     +29
    v6  v5 at dim 256 (dim pays under OT pressure; 384/512 collapse)  +3.1
    v7  v6 + attribute-prediction MTL head (w=4.0) + 900 epochs       +28
    v7r v7 at attr_weight=0.25 — the ROBUST default: the w=4.0 win is an
        easy-regime artifact (hardness ladder, BASELINE.md 2026-08-21 —
        w=4.0 REGRESSES vs v6 when attributes are noisy/sparse, while
        w=0.25 is +7 at medium hardness and flat at hard).  Use v7 only
        when attribute quality is known high; start real-data runs at v7r.

Pair v3+ with eval_csls_k=10 (the CSLS ranking convention reported by the
HGCN/RDGCN line).  Recipes with use_sinkhorn route through the MTL trainer
(tpugraph.train.driver dispatch).
"""

from __future__ import annotations

RECIPES: dict[str, dict] = {
    "v1": dict(dim=128, epochs=400, lr=2e-3, gamma=10.0, k_neg=50, neg_every=5,
               neg_mode="hard"),
    "v2": dict(dim=128, epochs=600, lr=2e-3, gamma=15.0, k_neg=100, neg_every=2,
               neg_mode="hard"),
    "v3": dict(dim=128, epochs=600, lr=2e-3, gamma=15.0, k_neg=100, neg_every=2,
               neg_mode="hard", eval_csls_k=10,
               boot_cap=2500, boot_start=200, boot_weight=0.5, boot_csls_k=10),
    "v4": dict(dim=128, epochs=600, lr=2e-3, gamma=15.0, k_neg=100, neg_every=2,
               neg_mode="hard", eval_csls_k=10,
               boot_cap=2500, boot_start=200, boot_weight=0.5, boot_csls_k=0),
    "v5": dict(dim=128, epochs=600, lr=2e-3, gamma=15.0, k_neg=100, neg_every=2,
               neg_mode="hard", eval_csls_k=10,
               boot_cap=2500, boot_start=200, boot_weight=0.5, boot_csls_k=0,
               use_sinkhorn=True, sinkhorn_weight=3.0, sinkhorn_tau=0.3),
    "v6": dict(dim=256, epochs=600, lr=2e-3, gamma=15.0, k_neg=100, neg_every=2,
               neg_mode="hard", eval_csls_k=10,
               boot_cap=2500, boot_start=200, boot_weight=0.5, boot_csls_k=0,
               use_sinkhorn=True, sinkhorn_weight=3.0, sinkhorn_tau=0.3),
    "v7": dict(dim=256, epochs=900, lr=2e-3, gamma=15.0, k_neg=100, neg_every=2,
               neg_mode="hard", eval_csls_k=10,
               boot_cap=2500, boot_start=200, boot_weight=0.5, boot_csls_k=0,
               use_sinkhorn=True, sinkhorn_weight=3.0, sinkhorn_tau=0.3,
               use_attr_head=True, attr_weight=4.0),
    "v7r": dict(dim=256, epochs=900, lr=2e-3, gamma=15.0, k_neg=100, neg_every=2,
                neg_mode="hard", eval_csls_k=10,
                boot_cap=2500, boot_start=200, boot_weight=0.5, boot_csls_k=0,
                use_sinkhorn=True, sinkhorn_weight=3.0, sinkhorn_tau=0.3,
                use_attr_head=True, attr_weight=0.25),
}
