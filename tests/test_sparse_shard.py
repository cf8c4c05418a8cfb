"""Sparse per-combination weights × graph sharding (VERDICT.md r2 #6).

The reference's multinomial capability (FUNC_AND_CATEGORICAL sparse variant,
SURVEY.md §2b FUNC 12) must compose with the engine's scale story: sparse
streams co-shard with the other cs streams on the ("chains", "graph") mesh,
the cs-stream gradient routes sparse ±feat through the combination table,
and learn_gs accepts sparse graphs.
"""
import jax
import numpy as np
import pytest

from sampler_tpu import fixtures, oracle
from sampler_tpu import format_spec as fs
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.learn import LearnConfig
from sampler_tpu.engine.multichain import (_mc_weight_gradient_factors,
                                           init_values_mc,
                                           mc_weight_gradient_cs)
from sampler_tpu.parallel.graph_shard import infer_gs, learn_gs, make_mesh


def _sharded_parity(g, n_chains_ax=2, n_graph=4, tol=0.012, n_sweeps=3000):
    dg, info = compile_graph(g, align=8 * n_graph)
    assert info.has_sparse_cw
    dgj = to_device(dg)
    mesh = make_mesh(n_chains_ax, n_graph)
    marg = infer_gs(dgj, dgj.w_init, jax.random.PRNGKey(0), n_burn=200,
                    n_sweeps=n_sweeps, info=info, mesh=mesh,
                    chains_per_device=4)
    exact = oracle.exact_marginals(g, clamp_evidence=True)
    mask = g.var_role == 0
    err = np.abs(np.asarray(marg)[mask, : exact.shape[1]] - exact[mask])
    assert err.max() < tol, f"max |dp| = {err.max():.4f}"


def test_sparse_sharded_inference_matches_oracle():
    _sharded_parity(fixtures.sparse_categorical_graph())


def test_sparse_sharded_mixed_factors():
    """Sparse + dense factors in one graph, streams sharded over 'graph'."""
    g = fixtures.sparse_categorical_graph(seed=2, n=5)
    g.var_role[1] = fs.ROLE_EVIDENCE
    g.var_init[1] = 2
    g.validate()
    _sharded_parity(g)


def test_sparse_cs_gradient_matches_factor_path():
    """The cs-stream sparse gradient (owner records + combination-table
    scatter) must equal the per-factor reference gradient bit-for-bit-ish
    (both are float32 segment sums over identical contributions)."""
    g = fixtures.sparse_categorical_graph(seed=3, n=6)
    g.var_role[::2] = fs.ROLE_EVIDENCE
    g.validate()
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    k0, k1 = jax.random.split(jax.random.PRNGKey(7))
    v_ev = init_values_mc(dgj, k0, 4, info)
    v_free = init_values_mc(dgj, k1, 4, info)
    g_cs = np.asarray(mc_weight_gradient_cs(
        dgj, v_ev, v_free, False, info, ("off", "off")))
    g_f = np.asarray(_mc_weight_gradient_factors(
        dgj, v_ev, v_free, False, info))
    np.testing.assert_allclose(g_cs, g_f, atol=1e-5)


def test_sparse_cs_gradient_learn_non_evidence():
    g = fixtures.sparse_categorical_graph(seed=4, n=6)
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    k0, k1 = jax.random.split(jax.random.PRNGKey(9))
    v_ev = init_values_mc(dgj, k0, 2, info)
    v_free = init_values_mc(dgj, k1, 2, info)
    g_cs = np.asarray(mc_weight_gradient_cs(
        dgj, v_ev, v_free, True, info, ("off", "off")))
    g_f = np.asarray(_mc_weight_gradient_factors(
        dgj, v_ev, v_free, True, info))
    np.testing.assert_allclose(g_cs, g_f, atol=1e-5)


def test_sparse_sharded_learning_recovers_category_log_odds():
    """learn_gs on a sparse-weight graph (previously NotImplementedError):
    per-category weights learned on the (2, 4) mesh must satisfy
    softmax(w) ≈ empirical frequencies."""
    probs = (0.5, 0.2, 0.3)
    g = fixtures.labeled_categorical_graph(n_obs=400, probs=probs, seed=2)
    counts = np.bincount(g.var_init, minlength=3) / g.n_vars
    n_graph = 4
    dg, info = compile_graph(g, align=8 * n_graph)
    assert info.has_sparse_cw
    dgj = to_device(dg)
    mesh = make_mesh(2, n_graph)
    cfg = LearnConfig(n_epochs=300, stepsize=0.03, diminish=0.995,
                      regularization="none")
    w = np.asarray(learn_gs(dgj, dgj.w_init, jax.random.PRNGKey(0), cfg,
                            info, mesh, chains_per_device=4))
    assert float(w[-1]) == 0.0          # reserved zero slot stays inert
    want = np.log(counts)
    got = w[:3] - w[0]
    np.testing.assert_allclose(got, want - want[0], atol=0.15)
