"""Large-cardinality categorical regime (card > 127).

resolve_band turns the banded MXU gather off above card 127 and the
values array widens to int32 (engine.multichain.values_dtype) — the
documented perf cliff.  Nothing previously exercised that regime
end-to-end (VERDICT r3 #8): this drives a card-200 domain graph through
binary IO round-trip + inference vs the exact oracle.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp

from sampler_tpu import oracle
from sampler_tpu import format_spec as fs
from sampler_tpu.graph import FactorGraph
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.multichain import infer_mc, values_dtype
from sampler_tpu.io import binary
from sampler_tpu.ops.banded import resolve_band


def _big_card_graph(card=200, seed=0):
    """3 variables of cardinality 200 with sparse domain values: a biased
    unary on v0 (AND_CATEGORICAL at one category) and EQUAL couplings.
    Small enough for exact enumeration (200^3 = 8e6 worlds is too many —
    clamp v2 as evidence so enumeration covers 200^2)."""
    rng = np.random.default_rng(seed)
    factors = [
        (fs.FUNC_AND_CATEGORICAL, 0, 1.0, [(0, True, 7)]),
        (fs.FUNC_EQUAL, 1, 1.0, [(0, True, 3), (1, True, 3)]),
        (fs.FUNC_EQUAL, 1, 1.0, [(1, True, 150), (2, True, 150)]),
    ]
    g = FactorGraph.build(var_card=[card] * 3, weights=[1.2, 0.8],
                          factors=factors)
    g.var_dtype[:] = fs.DTYPE_CATEGORICAL
    g.var_role[2] = fs.ROLE_EVIDENCE
    g.var_init[2] = 150
    # sparse domain values (e.g. entity ids), mapped to dense 0..199
    g.domains = {v: (np.arange(card) * 13 + 5).astype(np.int64)
                 for v in range(3)}
    return g


def test_card200_values_widen_and_band_off():
    g = _big_card_graph()
    dg, info = compile_graph(g)
    assert info.max_card == 200
    assert values_dtype(info) == jnp.int32
    assert resolve_band(info, backend="cpu") == "off"


def test_card200_oracle_parity():
    g = _big_card_graph()
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    marg, vals = infer_mc(dgj, dgj.w_init, jax.random.PRNGKey(0),
                          n_burn=200, n_sweeps=3000, info=info, n_chains=8)
    exact = oracle.exact_marginals(g)
    err = np.abs(np.asarray(marg)[:2] - exact[:2]).max()
    assert err < 0.01, f"card-200 marginal error {err}"
    assert (np.asarray(vals) < 200).all() and (np.asarray(vals) >= 0).all()


def test_card200_binary_roundtrip(tmp_path):
    # NOTE the on-disk format (like the reference's, SURVEY.md §2a) only
    # carries equalPredicate for FUNC_AND_CATEGORICAL records — the
    # library's per-edge eqpred on other factor types is a superset that
    # does not round-trip.  Use AND_CATEGORICAL couplings here.
    factors = [
        (fs.FUNC_AND_CATEGORICAL, 0, 1.0, [(0, True, 7)]),
        (fs.FUNC_AND_CATEGORICAL, 1, 1.0, [(0, True, 3), (1, True, 3)]),
        (fs.FUNC_AND_CATEGORICAL, 1, 1.0,
         [(1, True, 150), (2, True, 150)]),
    ]
    g = FactorGraph.build(var_card=[200] * 3, weights=[1.2, 0.8],
                          factors=factors)
    g.var_dtype[:] = fs.DTYPE_CATEGORICAL
    g.var_role[2] = fs.ROLE_EVIDENCE
    g.var_init[2] = 150
    g.domains = {v: (np.arange(200) * 13 + 5).astype(np.int64)
                 for v in range(3)}
    binary.write_graph(g, str(tmp_path), "big")
    g2 = binary.load_graph(
        os.path.join(tmp_path, "big.meta"),
        domains_path=os.path.join(tmp_path, "big.domains"))
    assert (g2.var_card == 200).all()
    np.testing.assert_array_equal(g2.e_eqpred, g.e_eqpred)
    dg, info = compile_graph(g2)
    dgj = to_device(dg)
    marg, _ = infer_mc(dgj, dgj.w_init, jax.random.PRNGKey(1), n_burn=200,
                       n_sweeps=2500, info=info, n_chains=8)
    exact = oracle.exact_marginals(g)
    err = np.abs(np.asarray(marg)[:2] - exact[:2]).max()
    assert err < 0.012, f"round-tripped card-200 error {err}"
