"""Multi-chip tests on the 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8): sharded-chain inference parity and
data-parallel learning convergence."""
import jax
import numpy as np
import pytest

from sampler_tpu import fixtures, oracle
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.learn import LearnConfig
from sampler_tpu.parallel.chains import (chains_mesh, infer_sharded,
                                         learn_sharded)


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_inference_parity():
    g = fixtures.ising_grid(4, 4, w_pair=0.4, w_bias=0.2)
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    mesh = chains_mesh(8)
    marg, vals = infer_sharded(dgj, dgj.w_init, jax.random.PRNGKey(0),
                               n_burn=200, n_sweeps=2000, info=info,
                               mesh=mesh, chains_per_device=2)
    exact = oracle.exact_marginals(g)
    err = np.abs(np.asarray(marg)[:, :2] - exact).max()
    assert err < 0.01, f"max |dp| = {err:.4f}"
    # total chain axis = 8 devices * 2 chains
    assert vals.shape[1] == 16


def test_sharded_matches_oracle_categorical():
    g = fixtures.categorical_graph(n=5, card=3)
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    mesh = chains_mesh(4, devices=jax.devices()[:4])
    marg, _ = infer_sharded(dgj, dgj.w_init, jax.random.PRNGKey(1),
                            n_burn=200, n_sweeps=3000, info=info,
                            mesh=mesh, chains_per_device=2)
    exact = oracle.exact_marginals(g)
    err = np.abs(np.asarray(marg)[:, :exact.shape[1]] - exact).max()
    assert err < 0.01, f"max |dp| = {err:.4f}"


def test_data_parallel_learning():
    g = fixtures.labeled_coin_graph(n_flips=400, p_heads=0.75, seed=2)
    p_hat = g.var_init.mean()
    w_star = np.log(p_hat / (1 - p_hat))
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    mesh = chains_mesh(8)
    cfg = LearnConfig(n_epochs=150, stepsize=0.05, diminish=0.99,
                      regularization="none")
    w = learn_sharded(dgj, dgj.w_init, jax.random.PRNGKey(0), cfg, info,
                      mesh, chains_per_device=2)
    assert float(w[0]) == pytest.approx(w_star, abs=0.2), \
        f"learned {float(w[0]):.3f}, want {w_star:.3f}"
