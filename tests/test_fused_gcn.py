"""Interpret-mode parity for the fused GCN-layer Pallas kernel
(kernels/gcn_fused_pallas.py) against the production ELL+GEMM formulation.

The kernel is the round-2 build-or-kill measurement vehicle for the
north-star "Pallas SpMM" deliverable (VERDICT.md round-1 "Next" #2); whether
or not it wins on chip (scripts/fused_gcn_probe.py, docs/DESIGN.md §3), its
semantics must match the production layer exactly.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tpugraph.kernels.gcn_fused_pallas import fused_gcn_layer, reference_layer  # noqa: E402
from tpugraph.sparse.ell import build_ell_operator  # noqa: E402


def _random_graph(rng, n, nnz):
    src = rng.integers(0, n, nnz).astype(np.int32)
    dst = rng.integers(0, n, nnz).astype(np.int32)
    w = rng.standard_normal(nnz).astype(np.float32)
    return src, dst, w


@pytest.mark.parametrize("split_diag", [False, True])
@pytest.mark.parametrize("d_in,d_out", [(128, 128), (128, 256)])
def test_fused_layer_matches_reference(split_diag, d_in, d_out):
    rng = np.random.default_rng(0)
    n, nnz = 257, 1800  # deliberately not a tile multiple
    src, dst, w = _random_graph(rng, n, nnz)
    if split_diag:  # ensure some diagonal entries exist
        src[:50] = dst[:50]
    op = build_ell_operator(src, dst, w, n, split_diag=split_diag)
    x = jnp.asarray(rng.standard_normal((n, d_in)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((d_in, d_out)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(d_out), jnp.float32)

    ref = reference_layer(op.fwd, op.diag, x, W, b)
    got = fused_gcn_layer(op.fwd, op.diag, x, W, b, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_fused_layer_bf16():
    rng = np.random.default_rng(1)
    n, nnz, d = 300, 2000, 128
    src, dst, w = _random_graph(rng, n, nnz)
    op = build_ell_operator(src, dst, w, n, split_diag=True)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.bfloat16)
    W = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.bfloat16)
    ref = reference_layer(op.fwd, op.diag, x, W)
    got = fused_gcn_layer(op.fwd, op.diag, x, W, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.5,
    )


def test_fused_layer_padding_inert():
    """Rows past each bucket's real count (tile padding) must not leak: a
    graph whose bucket sizes are far from tile multiples still matches."""
    rng = np.random.default_rng(2)
    n, d = 67, 128
    # degree-1 rows only -> one K=1 bucket of 67 rows (tile pads to >=8 mult)
    dst = np.arange(n, dtype=np.int32)
    src = rng.integers(0, n, n).astype(np.int32)
    w = rng.standard_normal(n).astype(np.float32)
    op = build_ell_operator(src, dst, w, n)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    W = jnp.asarray(rng.standard_normal((d, d)) * 0.1, jnp.float32)
    ref = reference_layer(op.fwd, op.diag, x, W)
    got = fused_gcn_layer(op.fwd, op.diag, x, W, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)
