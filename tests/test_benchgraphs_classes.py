"""The bench config-class generators (categorical / arity-3) must be valid
graphs with correct colorings and oracle-parity marginals at small sizes —
the TPU bench numbers (bench.py) are only meaningful if the shapes sample
the right distribution."""
import jax
import numpy as np

from sampler_tpu import oracle
from sampler_tpu.benchgraphs import big_potts_grid, big_triple_grid
from sampler_tpu.coloring import validate_coloring
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.gibbs import infer


def _parity(g, colors, tol=0.015, n_sweeps=2500):
    validate_coloring(g, colors)
    dg, info = compile_graph(g, colors=colors)
    dgj = to_device(dg)
    marg, _ = infer(dgj, dgj.w_init, jax.random.PRNGKey(0), n_burn=200,
                    n_sweeps=n_sweeps, info=info, n_chains=8)
    exact = oracle.exact_marginals(g)
    err = np.abs(np.asarray(marg)[:, : exact.shape[1]] - exact).max()
    assert err < tol, f"max |dp| = {err:.4f}"


def test_potts_grid_oracle_parity():
    g, colors = big_potts_grid(3, 4, card=3)
    assert not compile_graph(g, colors=colors)[1].all_boolean
    _parity(g, colors)


def test_triple_grid_oracle_parity():
    g, colors = big_triple_grid(3, 4)
    info = compile_graph(g, colors=colors)[1]
    assert info.max_arity == 3
    _parity(g, colors)


def test_triple_grid_banded_at_scale():
    """At bench scale the arity-3 grid must keep the banded gather on."""
    g, colors = big_triple_grid(96, 96)
    _, info = compile_graph(g, colors=colors, band_tile=128,
                            band_min_block=1)
    assert any(ti.band_w > 0 for ti in info.tiers)


def test_potts_grid_banded_at_scale():
    g, colors = big_potts_grid(96, 96, card=4)
    _, info = compile_graph(g, colors=colors, band_tile=128,
                            band_min_block=1)
    assert any(ti.band_w > 0 for ti in info.tiers)
