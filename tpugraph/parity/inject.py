"""Weight injection: torch oracle → flax param tree (parity harness glue)."""

from __future__ import annotations

import jax.numpy as jnp


def torch_params_to_flax(exported: dict) -> dict:
    """Map parity.torch_ref.export_params output onto AlignGCN's param tree."""
    params = {
        "emb": jnp.asarray(exported["emb"]),
        "gc1": {"w": jnp.asarray(exported["gc1"]["w"]), "b": jnp.asarray(exported["gc1"]["b"])},
        "gc2": {"w": jnp.asarray(exported["gc2"]["w"]), "b": jnp.asarray(exported["gc2"]["b"])},
    }
    for hw in ("hw1", "hw2"):
        if hw in exported:
            params[hw] = {
                "w": jnp.asarray(exported[hw]["w"]),
                "b": jnp.asarray(exported[hw]["b"]),
            }
    return params
