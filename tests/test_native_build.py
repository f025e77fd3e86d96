"""Native C++ graph builder ≡ numpy pipeline (full equivalence)."""

import numpy as np
import pytest

from tpugraph import native
from tpugraph.sparse.build import coo_from_triples, coo_normalize

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def _rand_triples(rng, n_ent, n_rel, n):
    h = rng.integers(0, n_ent, n)
    t = rng.integers(0, n_ent, n)
    r = rng.integers(0, n_rel, n)
    return np.stack([h, r, t], axis=1).astype(np.int32)


@pytest.mark.parametrize("weighting", ["uniform", "funifun"])
@pytest.mark.parametrize("norm", ["none", "rw", "sym"])
@pytest.mark.parametrize("self_loops", [True, False])
def test_native_equals_numpy(weighting, norm, self_loops):
    rng = np.random.default_rng(0)
    n = 80
    tri = _rand_triples(rng, n, 7, 300)
    s1, d1, w1 = coo_from_triples(n, tri, n_rel=7, weighting=weighting, self_loops=self_loops)
    w1n = coo_normalize(s1, d1, w1, n, norm=norm) if norm != "none" else w1
    out = native.native_coo_from_triples(
        n, tri, n_rel=7, weighting=weighting, self_loops=self_loops, norm=norm
    )
    assert out is not None
    s2, d2, w2 = out
    # native output is (dst, src)-sorted; sort numpy side the same way
    order = np.lexsort((s1, d1))
    np.testing.assert_array_equal(s1[order], s2)
    np.testing.assert_array_equal(d1[order], d2)
    np.testing.assert_allclose(w1n[order], w2, rtol=1e-12, atol=1e-15)


def test_native_empty_and_reflexive():
    out = native.native_coo_from_triples(5, np.zeros((0, 3), np.int32), n_rel=1)
    assert out is not None
    s, d, w = out  # self loops only
    np.testing.assert_array_equal(s, np.arange(5))
    np.testing.assert_array_equal(d, np.arange(5))
    # purely reflexive triples contribute nothing beyond self-loops
    tri = np.array([[2, 0, 2]], np.int32)
    s, d, w = native.native_coo_from_triples(5, tri, n_rel=1)
    assert len(s) == 5


def test_native_rejects_out_of_range_entity_ids():
    """Out-of-range entity ids index the native builder's sort key, funifun
    histograms, and degree accumulators — unchecked they were out-of-bounds
    WRITES (heap corruption), not wrong answers (round-5 native review).
    Both overflow and negative ids must raise, under both weightings."""
    import pytest as _pytest

    tri_hi = np.array([[0, 0, 5], [1, 0, 2]], np.int32)  # t=5 >= n_ent=4
    tri_neg = np.array([[-1, 0, 2]], np.int32)
    for bad in (tri_hi, tri_neg):
        for weighting in ("uniform", "funifun"):
            with _pytest.raises(ValueError, match="entity id"):
                native.native_coo_from_triples(4, bad, n_rel=1,
                                               weighting=weighting)
