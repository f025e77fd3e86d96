"""Pallas SpMM — measured dead end on this hardware; documented fallback.

Round-1 experiments (2026-08-17, TPU v5 lite, axon platform) closed every
Pallas route to a faster SpMM than the XLA paths:

1. **Per-row DMA gather** (double-buffered `make_async_copy` per edge):
   DMA issue overhead ≥ tens of ns/row ⇒ ≤ ~40M rows/s, vs XLA's hardware
   gather at ~160M rows/s on the same access pattern.  Loses ~4×.
2. **Dense block streaming** (precomputed 256×256 dense A-blocks on the MXU):
   KG topology (power-law hubs) defeats RCM reordering — measured block
   occupancy gives 6.5–24 GB of streamed blocks per pass vs 0.44 GB of
   gather traffic.  Loses 15–50×.
3. **VMEM-resident table gather inside a kernel** (`jnp.take` /
   `take_along_axis` on a VMEM ref): Mosaic on this platform rejects dynamic
   gather lowering (shape-mismatch/assertion failures).  Not expressible.

The performance win came from *reformulating* the op instead: the
scatter-free degree-bucketed ELL layout (kernels/spmm_ell.py) eliminated the
segment-sum scatter that cost 2/3 of forward time — 30M → 88M edges/s/chip
fwd+bwd.  Pallas effort went where it pays: the fused SDDMM+Sinkhorn kernel
(kernels/sinkhorn_pallas.py).

``spmm_pallas`` therefore delegates to the ELL implementation so configs
requesting 'pallas' still run, with a one-time notice.
"""

from __future__ import annotations

import warnings

from tpugraph.kernels.spmm_ell import spmm_ell

_warned = False


def spmm_pallas(op, x):
    global _warned
    if not _warned:
        warnings.warn(
            "spmm_impl='pallas' delegates to the scatter-free ELL path: every "
            "measured Pallas SpMM formulation loses to XLA's hardware gather "
            "on this TPU (see tpugraph/kernels/spmm_pallas.py docstring).",
            stacklevel=2,
        )
        _warned = True
    return spmm_ell(op, x)
