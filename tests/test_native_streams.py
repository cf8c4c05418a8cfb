"""Native stream-builder parity: the C++ build_streams must fill every
cs_*/ab_* field identically to the numpy chunk loop in compile.py."""
import os

import numpy as np
import pytest

from sampler_tpu import fixtures, native
from sampler_tpu.compile import compile_graph

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _compile_both(g, **kw):
    dg_n, info_n = compile_graph(g, **kw)
    os.environ["SAMPLER_TPU_NATIVE"] = "0"
    try:
        dg_p, info_p = compile_graph(g, **kw)
    finally:
        os.environ.pop("SAMPLER_TPU_NATIVE", None)
    assert info_n == info_p
    return dg_n, dg_p


@pytest.mark.parametrize("make", [
    lambda: fixtures.random_boolean_graph(60, 140, max_arity=3, seed=1,
                                          evidence_frac=0.3),
    lambda: fixtures.categorical_graph(),
    lambda: fixtures.mixed_graph(),
    lambda: fixtures.all_functions_graph(),
])
def test_native_streams_match_numpy(make):
    g = make()
    dg_n, dg_p = _compile_both(g)
    from sampler_tpu.compile import iter_arrays
    for (name, a), (_, b) in zip(iter_arrays(dg_n), iter_arrays(dg_p)):
        assert a.dtype == b.dtype and a.shape == b.shape, name
        if a.dtype == np.float32:
            np.testing.assert_allclose(a, b, atol=1e-6, err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_native_streams_match_numpy_banded_affine():
    """Banded + fused-affine compile (the flagship shape)."""
    from sampler_tpu.benchgraphs import big_ising_grid
    g, colors = big_ising_grid(32, 32)
    dg_n, dg_p = _compile_both(g, colors=colors, band_tile=8,
                               band_min_block=1)
    from sampler_tpu.compile import iter_arrays
    for (name, a), (_, b) in zip(iter_arrays(dg_n), iter_arrays(dg_p)):
        if a.dtype == np.float32:
            np.testing.assert_allclose(a, b, atol=1e-6, err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)
