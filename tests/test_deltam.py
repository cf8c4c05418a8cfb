"""Multilinear delta-φ path (compile.py dm_* streams, ops/fused.py
fold_deltam, engine color_delta_multilin) — the XLA fast path for boolean
arity<=3 tiers without a fused Pallas step (the KBC / arity-3 classes).

Multilinear interpolation on {0,1}^k corners is EXACT for any φ, so the
folded delta must match the counts-path delta to float tolerance on every
function type, and marginals through it must match the exact oracle.
"""
import numpy as np
import jax
import jax.numpy as jnp

from sampler_tpu import format_spec as fs
from sampler_tpu import oracle
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.multichain import (color_delta_bool,
                                           color_delta_multilin, infer_mc,
                                           prepare_fold)
from sampler_tpu.graph import FactorGraph

PLAIN = ("off", "off")


def _mixed_arity3_graph(n=96, seed=0):
    """Boolean chain with arity-1/2/3 factors over every function type
    that admits arity 3, negated literals included."""
    rng = np.random.default_rng(seed)
    funcs3 = [fs.FUNC_AND, fs.FUNC_OR, fs.FUNC_EQUAL, fs.FUNC_IMPLY_MLN,
              fs.FUNC_IMPLY_NATURAL, fs.FUNC_LINEAR, fs.FUNC_RATIO,
              fs.FUNC_LOGICAL]
    factors = [(fs.FUNC_ISTRUE, 0, 1.0, [(v, True)]) for v in range(n)]
    for i in range(n - 2):
        f = funcs3[i % len(funcs3)]
        ar = 2 + (i % 2)
        mem = [(i + j, bool((i + j) % 3 != 0)) for j in range(ar)]
        factors.append((int(f), 1 + i % 2, 1.0, mem))
    g = FactorGraph.build(var_card=[2] * n, weights=[0.4, 0.3, -0.25],
                          factors=factors)
    g.var_role[:] = rng.random(n) < 0.4
    g.var_init[:] = rng.integers(0, 2, n)
    return g


def test_deltam_engages_and_matches_counts_delta():
    g = _mixed_arity3_graph()
    dg, info = compile_graph(g)
    assert any(ti.deltam for ti in info.tiers), "dm streams must build"
    dgj = to_device(dg)
    w = jnp.asarray(dg.w_init)
    folded = prepare_fold(dgj, w, info, PLAIN)
    assert folded is not None
    rng = np.random.default_rng(1)
    P = dg.var_card.shape[0]
    values = jnp.asarray(rng.integers(0, 2, (P, 5)), jnp.int8)
    for t, (ts, ti) in enumerate(zip(dgj.tiers, info.tiers)):
        if not ti.deltam:
            continue
        for c in range(info.n_colors):
            d_ml = color_delta_multilin(ts, ti, values, c, info,
                                        folded[t], PLAIN)
            d_ct = color_delta_bool(ts, ti, values, w, c, info, PLAIN)
            np.testing.assert_allclose(np.asarray(d_ml), np.asarray(d_ct),
                                       rtol=0, atol=1e-4)


def test_deltam_oracle_parity():
    g = _mixed_arity3_graph(n=14, seed=2)
    dg, info = compile_graph(g)
    assert any(ti.deltam for ti in info.tiers)
    marg, _ = infer_mc(to_device(dg), dg.w_init, jax.random.PRNGKey(0),
                       200, 4000, info, 8)
    exact = oracle.exact_marginals(g)
    free = g.var_role == 0
    err = np.abs(np.asarray(marg)[:, :2] - exact)[free].max()
    assert err < 0.015, f"max |dp| = {err:.4f}"


def test_deltam_hub_oracle_parity():
    """Power-law head through the chunked-CSR hub tier with dm streams."""
    rng = np.random.default_rng(3)
    n = 18
    factors = [(fs.FUNC_ISTRUE, 0, 1.0, [(v, True)]) for v in range(n)]
    for v in range(1, n):                       # star: var 0 is the hub
        factors.append((fs.FUNC_AND, 1, 1.0, [(0, True), (v, v % 2 == 0)]))
    for v in range(1, n - 1):
        factors.append((fs.FUNC_OR, 2, 1.0,
                        [(v, True), (v + 1, False), (0, True)]))
    g = FactorGraph.build(var_card=[2] * n, weights=[0.2, 0.35, -0.3],
                          factors=factors)
    g.var_init[:] = rng.integers(0, 2, n)
    dg, info = compile_graph(g, hub_cap=4, hub_chunk=4)
    assert info.has_hub
    assert any(ti.deltam and ti.hub for ti in info.tiers), \
        "hub tier must carry dm streams"
    marg, _ = infer_mc(to_device(dg), dg.w_init, jax.random.PRNGKey(1),
                       200, 4000, info, 8)
    exact = oracle.exact_marginals(g)
    err = np.abs(np.asarray(marg)[:, :2] - exact).max()
    assert err < 0.015, f"max |dp| = {err:.4f}"
