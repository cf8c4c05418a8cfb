"""Sparse per-combination weights (FUNC_AND_CATEGORICAL sparse variant).

SURVEY.md §2b note / §7 hard-part 3; VERDICT.md round-1 missing #1.  A
sparse factor contributes w[table[combination]]·feat for its members'
current joint assignment (0 for absent combinations); inference must match
the exact oracle and learning must recover per-category log-odds.
"""
import numpy as np
import pytest
import jax

from sampler_tpu import fixtures, oracle
from sampler_tpu import format_spec as fs
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.gibbs import infer
from sampler_tpu.engine.learn import LearnConfig, learn
from sampler_tpu.graph import FactorGraph


def _parity(g, tol=0.012, n_sweeps=3000, seed=0):
    dg, info = compile_graph(g)
    assert info.has_sparse_cw
    dgj = to_device(dg)
    marg, _ = infer(dgj, dgj.w_init, jax.random.PRNGKey(seed), n_burn=200,
                    n_sweeps=n_sweeps, info=info, n_chains=8)
    exact = oracle.exact_marginals(g, clamp_evidence=True)
    mask = g.var_role == 0
    err = np.abs(np.asarray(marg)[mask, : exact.shape[1]] - exact[mask])
    assert err.max() < tol, f"max |Δp| = {err.max():.4f}"


def test_sparse_categorical_marginals_match_oracle():
    _parity(fixtures.sparse_categorical_graph())


def test_sparse_with_evidence_neighbor():
    """A sparse pairwise factor against a CLAMPED neighbor reduces to the
    neighbor's row of the table — the runtime neighbor-value lookup must
    pick it up from the world, not from compile-time constants."""
    g = fixtures.sparse_categorical_graph(seed=2, n=5)
    g.var_role[1] = fs.ROLE_EVIDENCE
    g.var_init[1] = 2
    g.validate()
    _parity(g)


def test_absent_combination_contributes_zero():
    """Two vars, one sparse factor whose table has ONLY entry (1, 1):
    exact marginals follow from w on (1,1) and 0 elsewhere."""
    w = 1.3
    g = FactorGraph.build(
        var_card=[2, 2], weights=[w],
        factors=[(fs.FUNC_AND_CATEGORICAL, 0, 1.0,
                  [(0, True, 0), (1, True, 0)], [((1, 1), 0)])])
    exact = oracle.exact_marginals(g)
    z = 3 + np.exp(w)
    np.testing.assert_allclose(exact[0], [2 / z, (1 + np.exp(w)) / z],
                               atol=1e-12)
    _parity(g)


def test_mixed_sparse_and_dense_factors():
    """Sparse and plain (single-weight) factors coexist in one graph."""
    g = FactorGraph.build(
        var_card=[3, 3, 2], weights=[0.4, -0.6, 0.8, 0.3],
        factors=[
            (fs.FUNC_AND_CATEGORICAL, 3, 1.0, [(0, True, 0)],
             [((0,), 0), ((1,), 1), ((2,), 2)]),
            (fs.FUNC_AND_CATEGORICAL, 3, 1.5, [(0, True, 1), (1, True, 2)]),
            (fs.FUNC_ISTRUE, 3, 1.0, [(2, True)]),
        ])
    _parity(g)


def test_sparse_learning_recovers_category_log_odds():
    """Per-category weights learned from labeled draws must satisfy
    softmax(w) ≈ empirical frequencies (up to the shared shift — softmax is
    shift-invariant, so compare pairwise differences)."""
    probs = (0.6, 0.3, 0.1)
    g = fixtures.labeled_categorical_graph(n_obs=400, probs=probs, seed=1)
    counts = np.bincount(g.var_init, minlength=3) / g.n_vars
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    cfg = LearnConfig(n_epochs=400, stepsize=0.02, diminish=0.995,
                      regularization="none")
    w, _, _ = learn(dgj, dgj.w_init, jax.random.PRNGKey(0), cfg, info)
    w = np.asarray(w)[:3]
    want = np.log(counts)
    got = w - w[0]
    np.testing.assert_allclose(got, want - want[0], atol=0.15)


def test_multichain_sparse_learning():
    from sampler_tpu.engine.multichain import learn_mc

    probs = (0.5, 0.2, 0.3)
    g = fixtures.labeled_categorical_graph(n_obs=400, probs=probs, seed=2)
    counts = np.bincount(g.var_init, minlength=3) / g.n_vars
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    cfg = LearnConfig(n_epochs=300, stepsize=0.03, diminish=0.995,
                      regularization="none")
    w, _, _ = learn_mc(dgj, dgj.w_init, jax.random.PRNGKey(0), cfg, info, 8)
    w = np.asarray(w)[:3]
    want = np.log(counts)
    np.testing.assert_allclose(w - w[0], want - want[0], atol=0.15)


def test_reserved_zero_weight_slot_is_inert():
    """compile appends one fixed zero weight; learning must never move it
    and outputs must not include it."""
    g = fixtures.labeled_categorical_graph(n_obs=60, seed=0)
    dg, info = compile_graph(g)
    assert dg.w_init.shape[0] == info.n_weights + 1
    assert dg.w_fixed[-1] and dg.w_init[-1] == 0.0
    dgj = to_device(dg)
    cfg = LearnConfig(n_epochs=30, stepsize=0.05, regularization="none")
    w, _, _ = learn(dgj, dgj.w_init, jax.random.PRNGKey(0), cfg, info)
    assert float(w[-1]) == 0.0
