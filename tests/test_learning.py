"""Weight-learning tests: SGD must converge to the oracle fixed point.

Reference analog: learning tests that recover the log-odds of labeled data
(SURVEY.md §4).  Fixed-point check, not trajectory parity (§7 hard-part 4).
"""
import jax
import numpy as np
import pytest

from sampler_tpu import fixtures
from sampler_tpu import format_spec as fs
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.learn import LearnConfig, learn
from sampler_tpu.graph import FactorGraph


def test_coin_weight_recovers_log_odds():
    g = fixtures.labeled_coin_graph(n_flips=400, p_heads=0.75, seed=2)
    p_hat = g.var_init.mean()
    w_star = np.log(p_hat / (1 - p_hat))
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    cfg = LearnConfig(n_epochs=400, stepsize=0.02, diminish=0.995,
                      regularization="none", reg_param=0.0)
    w, _, _ = learn(dgj, dgj.w_init, jax.random.PRNGKey(0), cfg, info)
    assert float(w[0]) == pytest.approx(w_star, abs=0.15), \
        f"learned {float(w[0]):.3f}, want {w_star:.3f}"


def test_fixed_weight_not_updated():
    g = fixtures.labeled_coin_graph(n_flips=100, p_heads=0.8, seed=0)
    g.w_fixed[:] = True
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    cfg = LearnConfig(n_epochs=50, stepsize=0.1, regularization="none")
    w, _, _ = learn(dgj, dgj.w_init, jax.random.PRNGKey(0), cfg, info)
    assert float(w[0]) == 0.0


def test_l2_regularization_shrinks():
    g = fixtures.labeled_coin_graph(n_flips=400, p_heads=0.9, seed=1)
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    cfg0 = LearnConfig(n_epochs=300, stepsize=0.02, diminish=0.995,
                       regularization="none")
    cfg_reg = LearnConfig(n_epochs=300, stepsize=0.02, diminish=0.995,
                          regularization="l2", reg_param=2.0)
    w0, _, _ = learn(dgj, dgj.w_init, jax.random.PRNGKey(0), cfg0, info)
    wr, _, _ = learn(dgj, dgj.w_init, jax.random.PRNGKey(0), cfg_reg, info)
    assert abs(float(wr[0])) < abs(float(w0[0]))
    assert float(w0[0]) > 0.5  # sanity: data is heads-biased


def test_multichain_learning_recovers_log_odds():
    """learn_mc (chain-averaged gradients) must reach the same fixed point."""
    from sampler_tpu.engine.multichain import learn_mc
    g = fixtures.labeled_coin_graph(n_flips=400, p_heads=0.75, seed=2)
    p_hat = g.var_init.mean()
    w_star = np.log(p_hat / (1 - p_hat))
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    cfg = LearnConfig(n_epochs=300, stepsize=0.03, diminish=0.995,
                      regularization="none")
    w, _, _ = learn_mc(dgj, dgj.w_init, jax.random.PRNGKey(0), cfg, info,
                       n_chains=8)
    assert float(w[0]) == pytest.approx(w_star, abs=0.12), \
        f"learned {float(w[0]):.3f}, want {w_star:.3f}"


def test_two_weight_separation():
    """Two independent coin populations with different biases must learn
    different weights matching their own log-odds."""
    rng = np.random.default_rng(3)
    n = 300
    labels_a = (rng.random(n) < 0.8).astype(np.int32)
    labels_b = (rng.random(n) < 0.3).astype(np.int32)
    factors = [(fs.FUNC_ISTRUE, 0, 1.0, [(i, True)]) for i in range(n)]
    factors += [(fs.FUNC_ISTRUE, 1, 1.0, [(n + i, True)]) for i in range(n)]
    g = FactorGraph.build(
        var_card=[2] * (2 * n), weights=[0.0, 0.0], factors=factors,
        var_role=np.full(2 * n, fs.ROLE_EVIDENCE, np.uint8),
        var_init=np.concatenate([labels_a, labels_b]),
    )
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    cfg = LearnConfig(n_epochs=400, stepsize=0.02, diminish=0.995,
                      regularization="none")
    w, _, _ = learn(dgj, dgj.w_init, jax.random.PRNGKey(0), cfg, info)
    wa_star = np.log(labels_a.mean() / (1 - labels_a.mean()))
    wb_star = np.log(labels_b.mean() / (1 - labels_b.mean()))
    assert float(w[0]) == pytest.approx(wa_star, abs=0.2)
    assert float(w[1]) == pytest.approx(wb_star, abs=0.2)


@pytest.mark.parametrize("lne", [False, True])
def test_cs_gradient_matches_factor_gradient(lne):
    """The cs-stream gradient (owner-deduped, banded-gather friendly) must
    equal the per-factor gradient on any non-sparse graph."""
    from sampler_tpu.engine.multichain import (_mc_weight_gradient_factors,
                                               init_values_mc,
                                               mc_weight_gradient_cs)

    for seed in range(3):
        g = fixtures.random_boolean_graph(40, 90, max_arity=3, seed=seed,
                                          evidence_frac=0.3)
        dg, info = compile_graph(g)
        dgj = to_device(dg)
        k0, k1 = jax.random.split(jax.random.PRNGKey(seed))
        v_ev = init_values_mc(dgj, k0, 4, info)
        v_free = init_values_mc(dgj, k1, 4, info)
        g_f = _mc_weight_gradient_factors(dgj, v_ev, v_free, lne, info)
        g_cs = mc_weight_gradient_cs(dgj, v_ev, v_free, lne, info)
        np.testing.assert_allclose(np.asarray(g_cs), np.asarray(g_f),
                                   atol=1e-4,
                                   err_msg=f"seed={seed} lne={lne}")


def test_cs_gradient_repeated_variable_factor():
    """A factor mentioning the same variable twice: one owner record, one
    gradient contribution — parity with the per-factor path."""
    from sampler_tpu.engine.multichain import (_mc_weight_gradient_factors,
                                               init_values_mc,
                                               mc_weight_gradient_cs)

    g = FactorGraph.build(
        var_card=[2, 2],
        weights=[0.7, -0.4],
        factors=[(fs.FUNC_AND, 0, 1.0, [(0, True), (0, True), (1, True)]),
                 (fs.FUNC_ISTRUE, 1, 1.0, [(1, True)])])
    g.var_role[1] = 1
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    k0, k1 = jax.random.split(jax.random.PRNGKey(3))
    v_ev = init_values_mc(dgj, k0, 8, info)
    v_free = init_values_mc(dgj, k1, 8, info)
    for lne in (False, True):
        g_f = _mc_weight_gradient_factors(dgj, v_ev, v_free, lne, info)
        g_cs = mc_weight_gradient_cs(dgj, v_ev, v_free, lne, info)
        np.testing.assert_allclose(np.asarray(g_cs), np.asarray(g_f),
                                   atol=1e-5)


def test_cs_gradient_matches_factor_gradient_categorical():
    from sampler_tpu.engine.multichain import (_mc_weight_gradient_factors,
                                               init_values_mc,
                                               mc_weight_gradient_cs)

    for gmk in (fixtures.categorical_graph, fixtures.mixed_graph):
        g = gmk()
        dg, info = compile_graph(g)
        dgj = to_device(dg)
        k0, k1 = jax.random.split(jax.random.PRNGKey(7))
        v_ev = init_values_mc(dgj, k0, 4, info)
        v_free = init_values_mc(dgj, k1, 4, info)
        for lne in (False, True):
            g_f = _mc_weight_gradient_factors(dgj, v_ev, v_free, lne, info)
            g_cs = mc_weight_gradient_cs(dgj, v_ev, v_free, lne, info)
            np.testing.assert_allclose(np.asarray(g_cs), np.asarray(g_f),
                                       atol=1e-4, err_msg=gmk.__name__)


def test_cs_gradient_chunked_parity():
    """Row-chunked gradient evaluation must be bit-for-bit-close to the
    single-chunk evaluation (the chunking exists to bound HBM temporaries
    on KBC-scale graphs)."""
    from sampler_tpu.engine.multichain import (init_values_mc,
                                               mc_weight_gradient_cs)

    g = fixtures.random_boolean_graph(64, 150, max_arity=3, seed=5,
                                      evidence_frac=0.25)
    dg, info = compile_graph(g, align=8)
    dgj = to_device(dg)
    B = info.tiers[0].block
    k0, k1 = jax.random.split(jax.random.PRNGKey(11))
    v_ev = init_values_mc(dgj, k0, 4, info)
    v_free = init_values_mc(dgj, k1, 4, info)
    g_full = mc_weight_gradient_cs(dgj, v_ev, v_free, False, info,
                                   row_chunk=B)
    g_chunk = mc_weight_gradient_cs(dgj, v_ev, v_free, False, info,
                                    row_chunk=8)
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_full),
                               atol=1e-5)
