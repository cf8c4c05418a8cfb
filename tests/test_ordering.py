"""Bandwidth-reducing variable ordering (coloring.rcm_order).

VERDICT.md r2 next-round #2: ops/banded.py promises "for irregular graphs,
a bandwidth-minimizing ordering" — these tests prove rcm_order recovers
banding when the input ids hide the graph's locality, and that the order
changes only the LAYOUT, not the distribution.
"""
import numpy as np
import jax

from sampler_tpu import format_spec as fs
from sampler_tpu.coloring import rcm_order
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.multichain import infer_mc
from sampler_tpu.graph import FactorGraph
from sampler_tpu.oracle import exact_marginals


def _scrambled_chain(n: int, seed: int = 0, w: float = 0.4):
    """1-D Ising chain whose variable ids are randomly permuted: full
    locality (bandwidth 1 in chain space), none of it visible in id
    space.  Returns (graph, exact 2-coloring by chain parity)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    factors = [(fs.FUNC_EQUAL, 0, 1.0,
                [(int(perm[i]), True), (int(perm[i + 1]), True)])
               for i in range(n - 1)]
    colors = np.empty(n, np.int32)
    colors[perm] = np.arange(n) % 2
    g = FactorGraph.build(var_card=[2] * n, factors=factors, weights=[w])
    return g, colors


def test_rcm_recovers_banding_on_scrambled_chain():
    g, colors = _scrambled_chain(20_000)
    dg0, info0 = compile_graph(g, colors=colors)
    assert info0.band_w == 0, "scrambled ids must defeat the banding plan"
    rank = rcm_order(g)
    dg1, info1 = compile_graph(g, colors=colors, order=rank)
    assert info1.band_w > 0, "RCM order must recover the banding plan"
    # and the recovered windows are chain-narrow, not block-wide
    assert info1.band_w <= 1024, info1.band_w


def test_rcm_is_a_permutation_rank():
    g, _ = _scrambled_chain(500, seed=3)
    rank = rcm_order(g)
    assert sorted(rank.tolist()) == list(range(g.n_vars))


def test_order_does_not_change_marginals():
    g, _ = _scrambled_chain(14, seed=1)
    exact = exact_marginals(g)
    for order in (None, rcm_order(g)):
        dg, info = compile_graph(g, order=order)
        marg, _ = infer_mc(to_device(dg), dg.w_init, jax.random.PRNGKey(0),
                           n_burn=100, n_sweeps=3000, info=info, n_chains=8)
        assert np.abs(np.asarray(marg)[:, 1] - exact[:, 1]).max() < 0.02
