"""Recipe sweep beyond v6 on the pinned task (tpugraph side only — the
oracle is run to confirm a winner via baseline_parity.py).

v6 = dim 256 / γ15 / k100 / every-2 hard negatives / boot(2500,200,0.5,raw) /
Sinkhorn OT w=3 τ=0.3 / CSLS-10 eval.  Levers never tried at the v6 point:

  * GCN-Align's AE attribute channel (the pinned task generates correlated
    attribute triples that v6 ignores entirely — SE+AE is the single
    highest-prior untried capability, worth ~3 Hits@1 in the family lit)
  * auxiliary relation / attribute-prediction heads (config[3] capabilities)
  * CSLS-corrected hard mining (rejected at v2 pressure; OT pressure differs)
  * highway gates, dropout, mining cadence, boot constants at dim 256

    python scripts/v7_sweep.py [--variants a,b,...]

    NOTE: this image's sitecustomize pins JAX_PLATFORMS=axon before user
    code runs, so a JAX_PLATFORMS=cpu env prefix is silently ignored and
    runs go to the TPU chip via the tunnel (fine when the chip is free —
    that is where round-1/2 sweep numbers were measured). To force the
    CPU backend use jax.config.update('jax_platforms','cpu') as
    scripts/hardness_sweep.py --platform cpu does.

Prints one JSON line per variant.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from tpugraph.configs.recipes import RECIPES

BASE = dict(RECIPES["v6"])

VARIANTS = {
    # replication check of the adopted point
    "ctrl": dict(),
    # --- AE channel (SE+AE eval-combination beta sweep) ---
    "ae": dict(use_attr_channel=True),
    "ae_b95": dict(use_attr_channel=True, attr_beta=0.95),
    "ae_b80": dict(use_attr_channel=True, attr_beta=0.8),
    "ae_w05": dict(use_attr_channel=True, attr_channel_weight=0.5),
    # --- auxiliary heads (config[3]) joined to the headline recipe ---
    "rel": dict(use_rel_head=True),
    "rel_w05": dict(use_rel_head=True, rel_weight=0.5),
    "attrhead": dict(use_attr_head=True),
    # --- mining variants under OT pressure ---
    "csls_mine": dict(neg_csls_k=10),
    "ne1": dict(neg_every=1),
    "k200": dict(k_neg=200),
    # --- model shape ---
    "hw": dict(highway=True),
    "do02": dict(dropout=0.2),
    # --- OT / boot constants re-probed at dim 256 ---
    "iters40": dict(sinkhorn_iters=40),
    "boot4k": dict(boot_cap=4000),
    "bw1": dict(boot_weight=1.0),
    # --- round 2: attrhead (+21 Hits@1 in round 1) interactions ---
    "ah_w0125": dict(use_attr_head=True, attr_weight=0.125),
    "ah_w05": dict(use_attr_head=True, attr_weight=0.5),
    "ah_w10": dict(use_attr_head=True, attr_weight=1.0),
    "ah_rel": dict(use_attr_head=True, use_rel_head=True, rel_weight=0.5),
    "ah_ae80": dict(use_attr_head=True, use_attr_channel=True, attr_beta=0.8),
    "ah_noot": dict(use_attr_head=True, sinkhorn_weight=0.0),
    "ah_noboot": dict(use_attr_head=True, boot_cap=0),
    "ah_tau40": dict(use_attr_head=True, sinkhorn_tau=0.4),
    "ah_w4ot": dict(use_attr_head=True, sinkhorn_weight=4.0),
    "ah_dim384": dict(use_attr_head=True, dim=384),
    # --- round 3: attr_weight monotone to 1.0 — go higher; interactions at w10 ---
    "ah_w20": dict(use_attr_head=True, attr_weight=2.0),
    "ah_w40": dict(use_attr_head=True, attr_weight=4.0),
    "ah_w10_rel": dict(use_attr_head=True, attr_weight=1.0, use_rel_head=True,
                       rel_weight=0.5),
    "ah_w10_noboot": dict(use_attr_head=True, attr_weight=1.0, boot_cap=0),
    "ah_w10_long": dict(use_attr_head=True, attr_weight=1.0, epochs=900),
    "ah_w10_ae80": dict(use_attr_head=True, attr_weight=1.0,
                        use_attr_channel=True, attr_beta=0.8),
    # --- round 4: weight flattening at 4 (0.9037); probe 8 + longer training ---
    "ah_w80": dict(use_attr_head=True, attr_weight=8.0),
    "ah_w40_long": dict(use_attr_head=True, attr_weight=4.0, epochs=900),
    "ah_w80_long": dict(use_attr_head=True, attr_weight=8.0, epochs=900),
    # --- round 5: lr schedule at the v7 point (new train/optim.py knobs) ---
    "v7_cos": dict(use_attr_head=True, attr_weight=4.0, epochs=900,
                   lr_schedule="cosine"),
    "v7_cos_wu": dict(use_attr_head=True, attr_weight=4.0, epochs=900,
                      lr_schedule="cosine", lr_warmup=50),
    "v7_cos_f01": dict(use_attr_head=True, attr_weight=4.0, epochs=900,
                       lr_schedule="cosine", lr_final_frac=0.1),
    "v7_cos_lr4": dict(use_attr_head=True, attr_weight=4.0, epochs=900,
                       lr_schedule="cosine", lr=4e-3, lr_warmup=50),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()

    from tpugraph.configs import get_config
    from tpugraph.data.synthetic import synthetic_align_task
    from tpugraph.train.mtl import fit_mtl

    task = synthetic_align_task(n_ent=5000, n_rel=60, n_triples=15000, seed=42,
                                drop_frac=0.1, noise_frac=0.1)
    for name in args.variants.split(","):
        hp = dict(BASE, **VARIANTS[name])
        t0 = time.time()
        res = fit_mtl(get_config("base", eval_every=0, **hp), task=task)
        print(json.dumps({"variant": name, "s": round(time.time() - t0, 1),
                          **{k: round(v, 4) for k, v in res.metrics.items()
                             if k in ("hits@1", "hits@10", "mrr")}}), flush=True)


if __name__ == "__main__":
    main()
