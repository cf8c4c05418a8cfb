"""Banded one-hot-matmul gather (ops/banded.py): plan, kernels, end-to-end.

The pallas kernel itself runs in interpreter mode on CPU; the XLA fallback
runs natively.  Bit-for-bit equivalence with the plain gather path is
required — banding changes the gather MECHANISM, not any sampled value.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import sampler_tpu as st
from sampler_tpu.benchgraphs import big_ising_grid
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.multichain import infer_mc
from sampler_tpu.ops.banded import (banded_gather_pallas, banded_gather_xla,
                                    plan_banding)


def _banded_instance(seed=0, P=4096, NC=16, ntiles=8, R=256, W=512):
    rng = np.random.default_rng(seed)
    starts = np.minimum((rng.integers(0, P, ntiles) // 256) * 256,
                        P - W).astype(np.int32)
    off = rng.integers(0, W, (ntiles, R), dtype=np.int32)
    nbr = (starts[:, None] + off).astype(np.int32)
    dummy = rng.random((ntiles, R)) < 0.05        # out-of-window sentinel
    nbr = np.where(dummy, P - 1, nbr)
    vals = rng.integers(0, 5, (P, NC), dtype=np.int8)
    vals[P - 1] = 0
    ref = vals[nbr.reshape(-1)].copy()
    ref[dummy.reshape(-1)] = 0
    return vals, nbr, starts, W, ref


def test_banded_xla_matches_gather():
    vals, nbr, starts, W, ref = _banded_instance()
    out = np.asarray(banded_gather_xla(
        jnp.asarray(vals), jnp.asarray(nbr), jnp.asarray(starts), W))
    np.testing.assert_array_equal(out, ref)


def test_banded_pallas_interpret_matches_gather():
    vals, nbr, starts, W, ref = _banded_instance(seed=1)
    out = np.asarray(banded_gather_pallas(
        jnp.asarray(vals), jnp.asarray(nbr), jnp.asarray(starts), W,
        interpret=True))
    np.testing.assert_array_equal(out, ref)


def test_plan_banding_covers_indices():
    g, colors = big_ising_grid(32, 32)
    dg, info = compile_graph(g, colors=colors, band_tile=8, band_min_block=1)
    assert info.band_w > 0
    C, B = dg.cs_mask.shape[:2]
    P = dg.var_card.shape[0]
    ntiles = dg.bd_start.shape[1]
    idx = dg.cs_nbr.reshape(C, ntiles, -1)
    real = idx != (P - 1)
    local = idx - dg.bd_start[..., None]
    assert ((local >= 0) & (local < info.band_w))[real].all()


@pytest.mark.parametrize("mode", ["xla", "interpret"])
def test_banded_sweep_bitwise_equals_gather_sweep(monkeypatch, mode):
    """Same key ⇒ banded and plain sweeps produce IDENTICAL samples.

    band_tile=8 == the default alignment, so both compilations share one
    layout and one RNG stream: banding only changes the gather mechanism.
    The fused affine step is pinned OFF — it replaces the draw itself
    (different RNG stream; tested separately in test_fused.py)."""
    g, colors = big_ising_grid(24, 24)
    g.w_init[:] = [0.4, -0.3]
    dg_b, info_b = compile_graph(g, colors=colors, band_tile=8,
                                 band_min_block=1)
    # band_wmax=0 defeats the window plan while keeping the band-tile
    # block padding, so both compilations share one layout, one RNG
    # stream, and one (multilinear) delta path
    dg_p, info_p = compile_graph(g, colors=colors, band_tile=8,
                                 band_min_block=1, band_wmax=0)
    assert info_b.band_w > 0 and info_p.band_w == 0
    assert dg_b.cs_mask.shape == dg_p.cs_mask.shape
    key = jax.random.PRNGKey(7)

    m_b, _ = infer_mc(to_device(dg_b), dg_b.w_init, key, 20, 200, info_b, 4,
                      modes=(mode, "off"))
    m_p, _ = infer_mc(to_device(dg_p), dg_p.w_init, key, 20, 200, info_p, 4,
                      modes=("off", "off"))
    np.testing.assert_allclose(np.asarray(m_b), np.asarray(m_p), atol=1e-6)
