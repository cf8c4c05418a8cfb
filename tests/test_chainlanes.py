"""The Pallas fast paths must survive dw-default chain counts: entry points
raise NC to the TPU lane width (real extra chains, pooled statistics)
instead of silently demoting to the plain-gather path (VERDICT.md r2 weak
#2 / next-round #4)."""
import numpy as np

from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.multichain import (LANE, demote_modes,
                                           effective_chains, infer_mc)
from sampler_tpu.fixtures import ising_grid
from sampler_tpu.oracle import exact_marginals


def _info():
    g = ising_grid(4, 4)
    return compile_graph(g)[1]


def test_effective_chains_raises_to_lane():
    info = _info()
    assert effective_chains(info, ("pallas", "pallas"), 1, 10_000) == LANE
    assert effective_chains(info, ("pallas", "off"), 8, 10_000) == LANE
    assert effective_chains(info, ("pallas", "off"), 130, 10_000) == 2 * LANE
    # already aligned: untouched
    assert effective_chains(info, ("pallas", "pallas"), 256, 10_000) == 256


def test_effective_chains_noop_without_pallas():
    info = _info()
    assert effective_chains(info, ("off", "off"), 1, 10_000) == 1
    assert effective_chains(info, ("xla", "off"), 3, 10_000) == 3
    assert effective_chains(info, ("interpret", "interpret"), 5, 10_000) == 5


def test_effective_chains_memory_budget(monkeypatch):
    info = _info()
    # 10^8 positions x 128 chains would need 12.8 GB of int8 values:
    # over the default 1 GiB budget -> keep the requested count
    assert effective_chains(info, ("pallas", "pallas"), 1, 10**8) == 1
    monkeypatch.setenv("SAMPLER_TPU_AUTOCHAIN_BYTES", str(1 << 40))
    assert effective_chains(info, ("pallas", "pallas"), 1, 10**8) == LANE


def test_demote_still_guards_direct_calls():
    assert demote_modes(("pallas", "pallas"), 1) == ("off", "off")
    assert demote_modes(("pallas", "pallas"), LANE) == ("pallas", "pallas")
    assert demote_modes(("interpret", "interpret"), 1) == (
        "interpret", "interpret")


def test_infer_mc_at_lane_width_runs_fast_paths():
    # a graph large enough for the banding plan (P >= 128) at the raised
    # lane-width chain count; interpret mode = the Pallas kernels' CPU twin
    g = ising_grid(16, 16, w_pair=0.3, w_bias=0.2)
    dg, info = compile_graph(g, band_tile=8, band_min_block=1)
    assert info.band_w > 0 and info.affine2
    dgj = to_device(dg)
    import jax
    marg_f, _ = infer_mc(dgj, dgj.w_init, jax.random.PRNGKey(0), n_burn=20,
                         n_sweeps=300, info=info, n_chains=LANE,
                         modes=("interpret", "interpret"))
    marg_p, _ = infer_mc(dgj, dgj.w_init, jax.random.PRNGKey(1), n_burn=20,
                         n_sweeps=300, info=info, n_chains=LANE,
                         modes=("off", "off"))
    a, b = np.asarray(marg_f)[:, 1], np.asarray(marg_p)[:, 1]
    assert np.isfinite(a).all()
    # same distribution, different RNG streams: MC-tolerance agreement
    assert np.abs(a - b).max() < 0.05


def test_prepare_fold_guards_non_affine_graphs():
    # a fused mode string must not crash on a graph with no affine plan;
    # boolean arity<=2 tiers still fold their multilinear delta streams
    # (round-5: deltam covers every boolean tier <= arity 3)
    from sampler_tpu.engine.multichain import prepare_fold
    g = ising_grid(3, 3)
    dg, info = compile_graph(g)       # tiny: banding/affine off
    assert not info.affine2
    folded = prepare_fold(to_device(dg), np.zeros(3, np.float32), info,
                          ("interpret", "interpret"))
    assert folded is not None and len(folded) == len(info.tiers)
    for f, ti in zip(folded, info.tiers):
        assert (f is None) == (not ti.deltam)
        if f is not None:
            assert len(f) == 4 and f[2] is None    # pairwise: no cross
