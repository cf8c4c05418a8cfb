"""Fused gradient kernel (ops/grad.py) — parity with the XLA chunked
gradient and the per-factor reference path, plus end-to-end learning.

The kernel replaces the cs-stream gradient for pairwise boolean banded
tiers with small weight tables (LEARN_PROFILE.json round-3: the gradient
was 50.6% of a learning epoch on its HBM temporaries).
"""
import numpy as np
import jax

import sampler_tpu.engine.multichain as mc
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.learn import LearnConfig
from sampler_tpu.engine.multichain import (init_values_mc, learn_mc,
                                           mc_weight_gradient_cs,
                                           _mc_weight_gradient_factors)
from sampler_tpu.benchgraphs import big_ising_grid
from sampler_tpu import format_spec as fs

KERNEL = ("interpret", "off")
PLAIN = ("off", "off")


def _grid(seed=3, rows=16, cols=16):
    g, colors = big_ising_grid(rows, cols, w_pair=0.35, w_bias=0.2)
    rng = np.random.default_rng(seed)
    g.var_role[:] = rng.random(g.n_vars) < 0.5
    g.var_init[:] = rng.integers(0, 2, g.n_vars)
    dg, info = compile_graph(g, colors=colors, band_tile=8,
                             band_min_block=1)
    assert info.affine2
    return g, to_device(dg), info


def test_grad_kernel_engages_and_matches(monkeypatch):
    g, dgj, info = _grid()
    key = jax.random.PRNGKey(0)
    v_ev = init_values_mc(dgj, key, 4, info)
    v_free = init_values_mc(dgj, jax.random.fold_in(key, 1), 4, info)

    calls = []
    import sampler_tpu.ops.grad as og
    orig = og.grad_pair_tile
    monkeypatch.setattr(og, "grad_pair_tile",
                        lambda *a, **k: calls.append(1) or orig(*a, **k))
    for lne in (False, True):
        calls.clear()
        g_k = mc_weight_gradient_cs(dgj, v_ev, v_free, lne, info, KERNEL)
        assert calls, "kernel path must engage on this tier"
        g_x = mc_weight_gradient_cs(dgj, v_ev, v_free, lne, info, PLAIN)
        g_f = _mc_weight_gradient_factors(dgj, v_ev, v_free, lne, info)
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_f),
                                   rtol=0, atol=1e-4)


def test_grad_kernel_learning_end_to_end():
    """learn_mc through the kernel gradient converges to the same weights
    scale as the XLA gradient (identical RNG stream for the sweeps, same
    gradient values up to reduction order)."""
    g, dgj, info = _grid(seed=7)
    cfg = LearnConfig(n_epochs=10, n_sweeps_per_epoch=2, stepsize=0.05,
                      diminish=0.98, regularization="l2", reg_param=0.01)
    wk, _, _ = learn_mc(dgj, dgj.w_init, jax.random.PRNGKey(1), cfg, info,
                        n_chains=4, modes=KERNEL)
    wx, _, _ = learn_mc(dgj, dgj.w_init, jax.random.PRNGKey(1), cfg, info,
                        n_chains=4, modes=PLAIN)
    # sweeps are bitwise-identical across these modes (banded vs plain
    # gather parity); gradients differ only in float reduction order
    np.testing.assert_allclose(np.asarray(wk), np.asarray(wx),
                               rtol=0, atol=1e-4)


def test_grad_kernel_imply_linear_variants():
    """The kernel's arithmetic phi forms (no scalar-branch selects — a
    Mosaic lowering constraint) must match the XLA gradient on a graph
    mixing IMPLY_MLN / IMPLY_NATURAL / LINEAR / RATIO / LOGICAL pairwise
    factors with negated literals."""
    rng = np.random.default_rng(4)
    rows = cols = 16
    V = rows * cols
    funcs = [fs.FUNC_IMPLY_MLN, fs.FUNC_IMPLY_NATURAL, fs.FUNC_LINEAR,
             fs.FUNC_RATIO, fs.FUNC_LOGICAL, fs.FUNC_OR]
    factors = [(fs.FUNC_ISTRUE, 0, 1.0, [(v, True)]) for v in range(V)]
    for r in range(rows):
        for c in range(cols - 1):
            v = r * cols + c
            f = funcs[(r + c) % len(funcs)]
            factors.append((int(f), 1, 1.0,
                            [(v, bool((r + c) % 3 != 0)), (v + 1, True)]))
    from sampler_tpu.graph import FactorGraph
    g = FactorGraph.build(var_card=[2] * V, weights=[0.3, 0.5],
                          factors=factors)
    g.var_role[:] = rng.random(V) < 0.5
    g.var_init[:] = rng.integers(0, 2, V)
    colors = np.tile(np.arange(cols) % 2, rows).astype(np.int32)
    dg, info = compile_graph(g, colors=colors, band_tile=8,
                             band_min_block=1)
    assert info.affine2
    dgj = to_device(dg)
    key = jax.random.PRNGKey(2)
    v_ev = mc.init_values_mc(dgj, key, 4, info)
    v_free = mc.init_values_mc(dgj, jax.random.fold_in(key, 1), 4, info)
    for lne in (False, True):
        g_k = mc_weight_gradient_cs(dgj, v_ev, v_free, lne, info, KERNEL)
        g_f = _mc_weight_gradient_factors(dgj, v_ev, v_free, lne, info)
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_f),
                                   rtol=0, atol=1e-4)


def test_grad_kernel_unary_counts_factors():
    """Arity-1 AND/OR/EQUAL factors inside an affine2 (pairwise) tier: the
    record's neighbor slot is a masked pad, and its gathered value must
    NOT influence the gradient (round-4 advisor finding: the v1 kernel's
    in-kernel literal masking sign-flipped unary AND).  In the
    moment-factored kernel the masked slot gives an = ax = 0 at compile
    time, so the class of bug is structural — this test pins it."""
    rng = np.random.default_rng(11)
    rows = cols = 16
    V = rows * cols
    unary_funcs = [fs.FUNC_AND, fs.FUNC_OR, fs.FUNC_EQUAL, fs.FUNC_ISTRUE]
    factors = []
    for v in range(V):
        f = unary_funcs[v % len(unary_funcs)]
        factors.append((int(f), 0, 1.0, [(v, bool(v % 3 != 0))]))
    for r in range(rows):
        for c in range(cols - 1):
            v = r * cols + c
            factors.append((fs.FUNC_AND, 1, 1.0, [(v, True), (v + 1, True)]))
    from sampler_tpu.graph import FactorGraph
    g = FactorGraph.build(var_card=[2] * V, weights=[0.3, 0.5],
                          factors=factors)
    g.var_role[:] = rng.random(V) < 0.5
    g.var_init[:] = rng.integers(0, 2, V)
    colors = np.tile(np.arange(cols) % 2, rows).astype(np.int32)
    dg, info = compile_graph(g, colors=colors, band_tile=8,
                             band_min_block=1)
    assert info.affine2
    dgj = to_device(dg)
    key = jax.random.PRNGKey(5)
    v_ev = mc.init_values_mc(dgj, key, 4, info)
    v_free = mc.init_values_mc(dgj, jax.random.fold_in(key, 1), 4, info)
    for lne in (False, True):
        g_k = mc_weight_gradient_cs(dgj, v_ev, v_free, lne, info, KERNEL)
        g_x = mc_weight_gradient_cs(dgj, v_ev, v_free, lne, info, PLAIN)
        g_f = _mc_weight_gradient_factors(dgj, v_ev, v_free, lne, info)
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_x),
                                   rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_f),
                                   rtol=0, atol=1e-4)
