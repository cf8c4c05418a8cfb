import numpy as np
import pytest

from sampler_tpu import fixtures, oracle
from sampler_tpu import format_spec as fs
from sampler_tpu.graph import FactorGraph


def test_biased_coin_closed_form():
    w = 1.3
    g = fixtures.biased_coin(w)
    marg = oracle.exact_marginals(g)
    sigmoid = 1.0 / (1.0 + np.exp(-w))
    assert marg[0, 1] == pytest.approx(sigmoid, abs=1e-12)
    assert marg[0, 0] == pytest.approx(1 - sigmoid, abs=1e-12)


def test_independent_coins_factorize():
    g = FactorGraph.build(
        var_card=[2, 2],
        weights=[0.7, -0.4],
        factors=[(fs.FUNC_ISTRUE, 0, 1.0, [(0, True)]),
                 (fs.FUNC_ISTRUE, 1, 1.0, [(1, True)])],
    )
    marg = oracle.exact_marginals(g)
    assert marg[0, 1] == pytest.approx(1 / (1 + np.exp(-0.7)))
    assert marg[1, 1] == pytest.approx(1 / (1 + np.exp(0.4)))


def test_evidence_clamping():
    g = fixtures.all_functions_graph()
    marg = oracle.exact_marginals(g, clamp_evidence=True)
    # evidence vars have all mass on their label
    for v in range(g.n_vars):
        if g.var_role[v] == fs.ROLE_EVIDENCE:
            assert marg[v, g.var_init[v]] == pytest.approx(1.0)
    # rows sum to 1
    np.testing.assert_allclose(marg.sum(1), 1.0, atol=1e-12)


def test_negated_edge():
    # ISTRUE with negated edge: P(x=1) = sigmoid(-w)
    g = FactorGraph.build(
        var_card=[2], weights=[0.9],
        factors=[(fs.FUNC_ISTRUE, 0, 1.0, [(0, False)])],
    )
    marg = oracle.exact_marginals(g)
    assert marg[0, 1] == pytest.approx(1 / (1 + np.exp(0.9)))


def test_categorical_marginals_sum_to_one():
    g = fixtures.categorical_graph()
    marg = oracle.exact_marginals(g)
    np.testing.assert_allclose(marg.sum(1), 1.0, atol=1e-12)
    # entries beyond cardinality are zero
    for v in range(g.n_vars):
        assert (marg[v, g.var_card[v]:] == 0).all()
