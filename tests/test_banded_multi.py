"""Multi-window banded gather (ops/banded.py plan_banding_multi /
banded_gather_multi): the MXU gather for graphs with >2 colors, whose
neighbors live in several color blocks that no single contiguous window
can cover.  Windows are per source color block; neighbor indices are
remapped at compile time into the concatenated window space, so the kernel
stays one equality-iota + one matmul."""
import numpy as np
import jax
import jax.numpy as jnp

from sampler_tpu import format_spec as fs
from sampler_tpu.coloring import rcm_order
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.multichain import infer_mc
from sampler_tpu.graph import FactorGraph
from sampler_tpu.oracle import exact_marginals


def _tri_chain(n: int, seed: int = 0, w: float = 0.3):
    """Chain with arity-3 AND factors over consecutive triples: needs >= 3
    colors, so single-window banding is impossible by construction."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    factors = [(fs.FUNC_OR, 0, 1.0,
                [(int(perm[i]), True), (int(perm[i + 1]), True),
                 (int(perm[i + 2]), True)])
               for i in range(n - 2)]
    return FactorGraph.build(var_card=[2] * n, factors=factors, weights=[w])


def _compile_banded(n=6000, seed=0):
    g = _tri_chain(n, seed)
    # band_wmax below the block size: a single window cannot span the
    # multiple color blocks, so the plan MUST go multi-window (at real KBC
    # scale the blocks dwarf any wmax and this is the only banding there is)
    dg, info = compile_graph(g, order=rcm_order(g), band_tile=128,
                             band_min_block=1024, band_wmax=2048)
    return g, dg, info


def test_multi_window_plan_engages():
    g, dg, info = _compile_banded()
    assert info.n_colors >= 3
    ti = info.tiers[0]
    assert ti.band_w > 0 and ti.band_k >= 2, (ti.band_w, ti.band_k)
    # remapped indices live inside the concatenated window space
    ts = dg.tiers[0]
    assert ts.bd_rnbr.max() <= ti.band_k * ti.band_w
    assert ts.bd_start.shape[-1] == ti.band_k


def test_multi_window_gather_parity():
    """XLA and interpret-Pallas multi gathers == the plain row gather."""
    from sampler_tpu.ops.banded import (banded_gather_pallas_multi,
                                        banded_gather_xla_multi)

    g, dg, info = _compile_banded()
    ts, ti = dg.tiers[0], info.tiers[0]
    P = dg.var_card.shape[0]
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 2, (P, 4)).astype(np.int8)
    vals[P - 1] = 0                      # dummy row is always 0
    jv = jnp.asarray(vals)
    for c in range(info.n_colors):
        ref = vals[ts.cs_nbr[c].reshape(-1)]
        out_x = banded_gather_xla_multi(
            jv, jnp.asarray(ts.bd_rnbr[c]), jnp.asarray(ts.bd_start[c]),
            ti.band_w, ti.band_k)
        np.testing.assert_array_equal(np.asarray(out_x), ref)
        out_p = banded_gather_pallas_multi(
            jv, jnp.asarray(ts.bd_rnbr[c]), jnp.asarray(ts.bd_start[c]),
            ti.band_w, ti.band_k, interpret=True)
        np.testing.assert_array_equal(np.asarray(out_p), ref)


def test_multi_window_sweep_bitwise_vs_plain():
    """The whole inference pipeline through the multi-window gather must be
    BITWISE identical to the plain-gather path: the gather result feeds the
    same draw with the same keys."""
    g, dg, info = _compile_banded(seed=2)
    assert info.tiers[0].band_k >= 2
    dgj = to_device(dg)
    key = jax.random.PRNGKey(7)
    m_plain, _ = infer_mc(dgj, dgj.w_init, key, 2, 20, info, 4,
                          modes=("off", "off"))
    for mode in ("xla", "interpret"):
        m_band, _ = infer_mc(dgj, dgj.w_init, key, 2, 20, info, 4,
                             modes=(mode, "off"))
        np.testing.assert_array_equal(np.asarray(m_band),
                                      np.asarray(m_plain))


def test_multi_window_oracle_parity():
    g = _tri_chain(14, seed=3, w=0.5)
    # tiny graph cannot band; verify the TRI-chain semantics against the
    # oracle through the same engine the banded test exercises bitwise
    dg, info = compile_graph(g)
    marg, _ = infer_mc(to_device(dg), dg.w_init, jax.random.PRNGKey(0),
                       100, 3000, info, 8)
    exact = exact_marginals(g)
    assert np.abs(np.asarray(marg)[:, 1] - exact[:, 1]).max() < 0.02
