"""Chunked-CSR hub tier (compile.py _build_hub_tier + engine hub draw).

A power-law head variable must not inflate the dense [B, D, A] layout by
its own degree (a 145k-degree hub made the 4e6-var KBC compile need 712 GB
— SURVEY.md §7 hard-part 2).  Variables with degree > hub_cap go to a
chunked stream [C, M, G, A] evaluated chunk-wise with the dense machinery
and segment-summed onto rows.  These tests force tiny hub_cap/chunk sizes
so small oracle-checkable graphs exercise the path.
"""
import numpy as np
import jax
import jax.numpy as jnp

from sampler_tpu import oracle
from sampler_tpu import format_spec as fs
from sampler_tpu.graph import FactorGraph
from sampler_tpu.benchgraphs import random_kbc_graph
from sampler_tpu.coloring import greedy_coloring, validate_coloring
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.multichain import (infer_mc, init_values_mc,
                                           learn_mc, mc_weight_gradient,
                                           mc_weight_gradient_cs)
from sampler_tpu.engine.learn import LearnConfig

PLAIN = ("off", "off")


def _star_graph(n_leaves=14, w_pair=0.4, w_bias=0.3, card=2, seed=0):
    """One hub + n_leaves leaves: hub-leaf EQUAL couplings + ISTRUE biases.
    Enumerable exactly; hub degree = n_leaves + 1."""
    rng = np.random.default_rng(seed)
    V = n_leaves + 1
    factors = [(fs.FUNC_ISTRUE, 0, 1.0, [(v, True)]) for v in range(V)]
    factors += [(fs.FUNC_EQUAL, 1, 1.0, [(0, True), (v, True)])
                for v in range(1, V)]
    g = FactorGraph.build(var_card=[card] * V,
                          weights=[w_bias, w_pair],
                          factors=factors)
    if card > 2:
        g.var_dtype[:] = fs.DTYPE_CATEGORICAL
        g.e_eqpred[:] = rng.integers(0, card, g.n_edges)
    return g


def test_hub_tier_engages_and_matches_oracle():
    g = _star_graph(n_leaves=14)
    colors = greedy_coloring(g)
    validate_coloring(g, colors)
    dg, info = compile_graph(g, colors=colors, hub_cap=6, hub_chunk=4)
    assert info.has_hub and info.tiers[-1].hub
    assert info.tiers[-1].chunk_g == 4
    dgj = to_device(dg)
    marg, _ = infer_mc(dgj, dgj.w_init, jax.random.PRNGKey(0), n_burn=200,
                       n_sweeps=4000, info=info, n_chains=8, modes=PLAIN)
    exact = oracle.exact_marginals(g)
    err = np.abs(np.asarray(marg) - exact).max()
    assert err < 0.01, f"hub marginal error {err}"


def test_hub_tier_categorical_oracle():
    g = _star_graph(n_leaves=12, card=3, seed=4)
    colors = greedy_coloring(g)
    dg, info = compile_graph(g, colors=colors, hub_cap=5, hub_chunk=4)
    assert info.has_hub and not info.all_boolean
    dgj = to_device(dg)
    marg, _ = infer_mc(dgj, dgj.w_init, jax.random.PRNGKey(1), n_burn=200,
                       n_sweeps=4000, info=info, n_chains=8, modes=PLAIN)
    exact = oracle.exact_marginals(g)
    err = np.abs(np.asarray(marg) - exact).max()
    assert err < 0.012, f"hub categorical marginal error {err}"


def test_hub_gradient_matches_per_factor_path():
    """cs-stream gradient over (dense + hub) tiers == the per-factor
    reference gradient, exactly (owner dedup must count every factor
    once even when its owner record lives in a hub chunk)."""
    g = random_kbc_graph(300, 900, max_arity=3, n_weights=11, seed=3,
                         skew=1.2, evidence_frac=0.3)
    colors = greedy_coloring(g)
    dg, info = compile_graph(g, colors=colors, hub_cap=8, hub_chunk=4)
    assert info.has_hub
    dgj = to_device(dg)
    key = jax.random.PRNGKey(7)
    v_ev = init_values_mc(dgj, key, 3, info)
    v_free = init_values_mc(dgj, jax.random.fold_in(key, 1), 3, info)
    g_cs = mc_weight_gradient_cs(dgj, v_ev, v_free, False, info, PLAIN)
    g_ref = mc_weight_gradient(dgj, v_ev, v_free, False, info, modes=None)
    np.testing.assert_allclose(np.asarray(g_cs), np.asarray(g_ref),
                               rtol=0, atol=1e-4)
    g_cs_ne = mc_weight_gradient_cs(dgj, v_ev, v_free, True, info, PLAIN)
    g_ref_ne = mc_weight_gradient(dgj, v_ev, v_free, True, info, modes=None)
    np.testing.assert_allclose(np.asarray(g_cs_ne), np.asarray(g_ref_ne),
                               rtol=0, atol=1e-4)


def test_hub_learning_runs_and_is_deterministic():
    g = _star_graph(n_leaves=14, seed=9)
    rng = np.random.default_rng(2)
    g.var_role[:] = rng.random(g.n_vars) < 0.5
    g.var_init[:] = rng.integers(0, 2, g.n_vars)
    colors = greedy_coloring(g)
    dg, info = compile_graph(g, colors=colors, hub_cap=6, hub_chunk=4)
    dgj = to_device(dg)
    cfg = LearnConfig(n_epochs=8, n_sweeps_per_epoch=2, stepsize=0.05,
                      diminish=0.97)
    w1, _, _ = learn_mc(dgj, dgj.w_init, jax.random.PRNGKey(0), cfg, info,
                        n_chains=4, modes=PLAIN)
    w2, _, _ = learn_mc(dgj, dgj.w_init, jax.random.PRNGKey(0), cfg, info,
                        n_chains=4, modes=PLAIN)
    assert (np.asarray(w1) == np.asarray(w2)).all()
    assert not np.allclose(np.asarray(w1), np.asarray(dgj.w_init))


def test_hub_memory_stays_linear():
    """The padded stream volume of a hub graph must be O(edges), not
    O(n_hub * max_degree): a 2000-degree hub with hub_cap 64 must compile
    into chunked records, and the dense tiers must not carry its degree."""
    g = random_kbc_graph(4000, 12000, max_arity=3, n_weights=50, seed=1,
                        skew=1.3)
    colors = greedy_coloring(g)
    dg, info = compile_graph(g, colors=colors, hub_cap=64, hub_chunk=32)
    assert info.has_hub
    hub = info.tiers[-1]
    dense_D = max(ti.degree for ti in info.tiers[:-1])
    assert dense_D <= 64
    # total padded records across all tiers stay within a small multiple
    # of the real incidence count
    n_pairs = sum(int(ts.cs_mask.shape[0] * ts.cs_mask.shape[1]
                      * ts.cs_mask.shape[2]) for ts in dg.tiers)
    real = int(sum(g.arities()))
    assert n_pairs < 12 * real, (n_pairs, real)
    assert hub.chunk_g == 32


def test_hub_graph_sharded_oracle():
    """Hub tier under --n_graph_shards: chunks shard over the graph axis,
    partial row sums psum (round-5; previously a clean rejection)."""
    from sampler_tpu.parallel.graph_shard import infer_gs, make_mesh

    n_graph = 2
    for card in (2, 3):
        g = _star_graph(n_leaves=12, card=card, seed=1)
        colors = greedy_coloring(g)
        dg, info = compile_graph(g, colors=colors, hub_cap=6, hub_chunk=4,
                                 align=8 * n_graph, shards=n_graph)
        assert info.has_hub and info.tiers[-1].chunks % n_graph == 0
        mesh = make_mesh(4, n_graph)
        # 1000 sweeps x 16 pooled chains ~ the old 3000 x 8 sample budget
        # at a third of the CPU-sim wall clock (suite time, VERDICT r4 #9)
        marg = infer_gs(to_device(dg), dg.w_init, jax.random.PRNGKey(0),
                        n_burn=100, n_sweeps=1000, info=info, mesh=mesh,
                        chains_per_device=4)
        exact = oracle.exact_marginals(g)
        err = np.abs(np.asarray(marg)[:, :card] - exact).max()
        assert err < 0.02, f"card={card} hub gs marginal error {err}"


def test_hub_graph_sharded_learning():
    """learn_gs over a hub graph: owner records stay disjoint across the
    chunk shards, so the psum'd gradient matches the single-device one."""
    from sampler_tpu.parallel.graph_shard import learn_gs, make_mesh

    g = _star_graph(n_leaves=14, seed=2)
    rng = np.random.default_rng(2)
    g.var_role[:] = 1
    g.var_init[:] = rng.integers(0, 2, g.n_vars)
    colors = greedy_coloring(g)
    n_graph = 2
    dg, info = compile_graph(g, colors=colors, hub_cap=6, hub_chunk=4,
                             align=8 * n_graph, shards=n_graph)
    assert info.has_hub
    cfg = LearnConfig(n_epochs=8, n_sweeps_per_epoch=1, stepsize=0.05,
                      diminish=0.98, regularization="l2", reg_param=0.01)
    mesh = make_mesh(4, n_graph)
    w = learn_gs(to_device(dg), dg.w_init, jax.random.PRNGKey(3), cfg,
                 info, mesh, chains_per_device=2)
    w = np.asarray(w)
    assert np.isfinite(w).all() and w.shape == dg.w_init.shape
    # all-evidence worlds: both worlds sample everything, so weights move
    # but must stay bounded under L2
    assert np.abs(w).max() < 5.0
