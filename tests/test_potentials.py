"""Device-side factor evaluation must match the NumPy spec exactly
(double-implementation guard — see factor_functions.py docstring)."""
import itertools

import numpy as np
import pytest

from sampler_tpu import factor_functions as ff
from sampler_tpu import format_spec as fs
from sampler_tpu.engine.potentials import eval_phi, factor_phis
from sampler_tpu import fixtures
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.oracle import enumerate_assignments, log_potential

import jax.numpy as jnp


def test_jnp_matches_numpy_spec():
    rng = np.random.default_rng(0)
    A, N = 5, 64
    cases_lits, cases_mask, cases_type, cases_n, want = [], [], [], [], []
    for ftype in fs.ALL_FACTOR_FUNCS:
        for _ in range(N):
            n = int(rng.integers(1, A + 1))
            mask = np.zeros(A, bool)
            mask[:n] = True
            lits = rng.integers(0, 2, A).astype(bool)
            cases_lits.append(lits)
            cases_mask.append(mask)
            cases_type.append(ftype)
            cases_n.append(n)
            want.append(ff.eval_factor(ftype, lits[None], mask[None])[0])
    got = eval_phi(jnp.asarray(np.stack(cases_lits)),
                   jnp.asarray(np.stack(cases_mask)),
                   jnp.asarray(cases_type), jnp.asarray(cases_n))
    # float32 log1p on device vs float64 numpy: allow 1e-4 rel
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("fixture", ["all_functions_graph", "categorical_graph",
                                     "mixed_graph", "ising_grid"])
def test_factor_phis_match_oracle_logp(fixture):
    """Σ w·feat·φ over factor_phis must equal the oracle's log_potential
    for random assignments."""
    g = getattr(fixtures, fixture)()
    dg, info = compile_graph(g)
    dgj = to_device(dg)
    rng = np.random.default_rng(0)
    P = dg.var_card.shape[0]
    for _ in range(10):
        assign = np.stack([rng.integers(0, c) for c in g.var_card]).astype(np.int32)
        want = log_potential(g, assign[None])[0]
        # factor_phis expects COLOR-MAJOR positions (compile.py layout)
        values_cm = np.zeros(P, np.int32)
        values_cm[dg.pos_of_vid] = assign
        phis = factor_phis(dgj, jnp.asarray(values_cm))
        got = float(jnp.sum(jnp.asarray(dg.w_init)[dgj.f_wid] * dgj.f_feat * phis))
        assert got == pytest.approx(want, abs=1e-4)
