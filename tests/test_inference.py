"""Statistical parity: chromatic Gibbs marginals vs the exact oracle.

Replaces the reference's statistical fixtures (biased coin etc. — SURVEY.md
§4) with a strictly stronger check: |p̂ − p_exact| < tol on every variable.
"""
import jax
import numpy as np
import pytest

from sampler_tpu import fixtures, oracle
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.gibbs import infer

TOL = 0.01
N_SWEEPS = 3000
N_CHAINS = 8
N_BURN = 200


def run_parity(g, tol=TOL, n_sweeps=N_SWEEPS, sample_evidence=False, seed=0):
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    marg, _ = infer(dgj, dgj.w_init, jax.random.PRNGKey(seed),
                    n_burn=N_BURN, n_sweeps=n_sweeps, info=info,
                    sample_evidence=sample_evidence, n_chains=N_CHAINS)
    marg = np.asarray(marg)
    exact = oracle.exact_marginals(g, clamp_evidence=not sample_evidence)
    err = np.abs(marg[:, : exact.shape[1]] - exact)
    # only compare resampled variables (evidence rows are clamped)
    mask = np.ones(g.n_vars, bool)
    if not sample_evidence:
        mask = g.var_role == 0
    max_err = err[mask].max() if mask.any() else 0.0
    assert max_err < tol, f"max |Δp| = {max_err:.4f}"
    return max_err


def test_biased_coin():
    run_parity(fixtures.biased_coin(1.5))


def test_biased_coin_negative_weight():
    run_parity(fixtures.biased_coin(-0.8))


def test_ising_chain():
    run_parity(fixtures.ising_chain(8, w_pair=0.6, w_bias=0.25))


def test_ising_grid():
    run_parity(fixtures.ising_grid(4, 4, w_pair=0.4, w_bias=0.2))


def test_all_factor_functions_with_evidence():
    run_parity(fixtures.all_functions_graph())


def test_categorical():
    run_parity(fixtures.categorical_graph(n=5, card=3))


def test_mixed():
    run_parity(fixtures.mixed_graph())


def test_sample_evidence_unclamps():
    g = fixtures.all_functions_graph()
    run_parity(g, sample_evidence=True)


def test_duplicate_member_factor():
    """A factor mentioning the same variable in two slots must be counted
    once with full substitution (regression: double-count bug found in
    round-1 verification)."""
    from sampler_tpu import format_spec as fs
    from sampler_tpu.graph import FactorGraph
    g = FactorGraph.build(var_card=[2], weights=[1.0],
                          factors=[(fs.FUNC_OR, 0, 1.0, [(0, True), (0, True)])])
    run_parity(g)


def test_deterministic_given_key():
    g = fixtures.ising_grid(3, 3)
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    m1, v1 = infer(dgj, dgj.w_init, jax.random.PRNGKey(7), n_burn=10,
                   n_sweeps=50, info=info)
    m2, v2 = infer(dgj, dgj.w_init, jax.random.PRNGKey(7), n_burn=10,
                   n_sweeps=50, info=info)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
