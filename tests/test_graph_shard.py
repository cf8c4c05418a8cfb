"""Graph-sharded sweep parity on a ("chains", "graph") CPU mesh."""
import jax
import numpy as np
import pytest

from sampler_tpu import fixtures, oracle
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.parallel.graph_shard import infer_gs, make_mesh


@pytest.mark.parametrize("n_chains_ax,n_graph", [(2, 4), (4, 2), (1, 8)])
def test_graph_sharded_parity(n_chains_ax, n_graph):
    g = fixtures.ising_grid(4, 4, w_pair=0.4, w_bias=0.2)
    dg, info = compile_graph(g, align=8 * n_graph)
    dgj = to_device(dg)
    mesh = make_mesh(n_chains_ax, n_graph)
    # 1000 sweeps x 16 pooled chains ~ the old 2500 x 8 sample budget at
    # a fraction of the CPU-sim wall clock (suite time, VERDICT r4 #9)
    marg = infer_gs(dgj, dgj.w_init, jax.random.PRNGKey(0), n_burn=100,
                    n_sweeps=1000, info=info, mesh=mesh,
                    chains_per_device=max(4, 16 // n_chains_ax))
    exact = oracle.exact_marginals(g)
    err = np.abs(np.asarray(marg)[:, :2] - exact).max()
    assert err < 0.015, f"max |dp| = {err:.4f}"


def test_graph_sharded_evidence():
    g = fixtures.all_functions_graph()
    dg, info = compile_graph(g, align=16)
    dgj = to_device(dg)
    mesh = make_mesh(4, 2)
    marg = infer_gs(dgj, dgj.w_init, jax.random.PRNGKey(1), n_burn=100,
                    n_sweeps=1000, info=info, mesh=mesh, chains_per_device=4)
    exact = oracle.exact_marginals(g)
    free = g.var_role == 0
    err = np.abs(np.asarray(marg)[:, :2] - exact)[free].max()
    assert err < 0.015, f"max |dp| = {err:.4f}"


def test_halo_plan_reduces_traffic():
    """The banding windows bound every read — the halo plan must beat the
    full all_gather on a banded grid (VERDICT r1 #4 'bytes reduced')."""
    from sampler_tpu.benchgraphs import big_ising_grid
    from sampler_tpu.parallel.graph_shard import halo_plan

    n_graph = 4
    g, colors = big_ising_grid(64, 64)
    dg, info = compile_graph(g, colors=colors, align=8 * n_graph,
                             band_tile=128, band_min_block=1)
    assert info.band_w > 0
    plan = halo_plan(dg, info, n_graph)
    assert plan is not None
    nl, nr = plan
    # exchanged slices per color step: nl+nr vs all_gather's n_graph-1
    assert nl + nr < n_graph - 1, f"halo {plan} no better than all_gather"


def test_halo_parity_with_all_gather():
    """Same keys, same reads -> the halo-exchange sweep must produce the
    same marginals as the full-all_gather sweep (stale regions never read;
    own-row tallies reassemble disjointly)."""
    from sampler_tpu.benchgraphs import big_ising_grid
    from sampler_tpu.parallel.graph_shard import halo_plan

    n_chains_ax, n_graph = 2, 4
    g, colors = big_ising_grid(64, 64)
    dg, info = compile_graph(g, colors=colors, align=8 * n_graph,
                             band_tile=128, band_min_block=1)
    dgj = to_device(dg)
    assert halo_plan(dg, info, n_graph) is not None
    mesh = make_mesh(n_chains_ax, n_graph)
    kwargs = dict(n_burn=2, n_sweeps=30, info=info, mesh=mesh,
                  chains_per_device=2)
    m_halo = infer_gs(dgj, dgj.w_init, jax.random.PRNGKey(5), halo="auto",
                      **kwargs)
    m_full = infer_gs(dgj, dgj.w_init, jax.random.PRNGKey(5), halo=None,
                      **kwargs)
    np.testing.assert_array_equal(np.asarray(m_halo), np.asarray(m_full))


def test_block_divisibility_check():
    g = fixtures.ising_grid(3, 3)
    dg, info = compile_graph(g, align=8)  # B=8 not divisible by 3
    dgj = to_device(dg)
    mesh = make_mesh(1, 3) if len(jax.devices()) >= 3 else None
    if mesh is None:
        pytest.skip("needs 3 devices")
    with pytest.raises(ValueError):
        infer_gs(dgj, dgj.w_init, jax.random.PRNGKey(0), 1, 1, info, mesh, 1)


def test_graph_sharded_fused_kernel():
    """The fused affine Pallas kernel (interpret mode on CPU) must run
    under graph sharding with a local-shard fold and sample the same
    distribution as the unfused sharded sweep."""
    from sampler_tpu.benchgraphs import big_ising_grid

    g, colors = big_ising_grid(16, 16, w_pair=0.3, w_bias=0.2)
    dg, info = compile_graph(g, colors=colors, align=16, band_tile=8,
                             band_min_block=1)
    assert info.affine2
    dgj = to_device(dg)
    mesh = make_mesh(4, 2)
    kwargs = dict(n_burn=100, n_sweeps=700, info=info, mesh=mesh,
                  chains_per_device=8)
    m_fused = infer_gs(dgj, dgj.w_init, jax.random.PRNGKey(2),
                       modes=("interpret", "interpret"), **kwargs)
    m_plain = infer_gs(dgj, dgj.w_init, jax.random.PRNGKey(3),
                       modes=("interpret", "off"), **kwargs)
    d = np.abs(np.asarray(m_fused) - np.asarray(m_plain)).max()
    assert d < 0.05, f"fused vs plain sharded marginals differ by {d:.3f}"


def test_graph_sharded_learning_recovers_log_odds():
    """learn_gs (model-parallel learning: streams sharded over 'graph',
    owner-disjoint shard gradients psum'd) must reach the same fixed point
    as single-device learning."""
    from sampler_tpu.engine.learn import LearnConfig
    from sampler_tpu.parallel.graph_shard import learn_gs

    g = fixtures.labeled_coin_graph(n_flips=400, p_heads=0.75, seed=2)
    p_hat = g.var_init.mean()
    w_star = float(np.log(p_hat / (1 - p_hat)))
    dg, info = compile_graph(g, align=8 * 2)
    dgj = to_device(dg)
    mesh = make_mesh(4, 2)
    cfg = LearnConfig(n_epochs=300, stepsize=0.03, diminish=0.995,
                      regularization="none")
    w = np.asarray(learn_gs(dgj, dgj.w_init, jax.random.PRNGKey(0), cfg,
                            info, mesh, chains_per_device=2))
    assert abs(float(w[0]) - w_star) < 0.15, \
        f"learned {float(w[0]):.3f}, want {w_star:.3f}"


def test_graph_sharded_learning_halo_parity():
    """Halo-exchange learning must produce BITWISE the same weights as the
    all_gather version: sweeps read identical fresh values and owner
    gradients read only own rows + windows."""
    from sampler_tpu.benchgraphs import big_ising_grid
    from sampler_tpu.engine.learn import LearnConfig
    from sampler_tpu.parallel.graph_shard import halo_plan, learn_gs

    n_graph = 4
    g, colors = big_ising_grid(64, 64)
    g.var_role[::2] = 1
    g.var_init[::2] = (np.arange((g.n_vars + 1) // 2) % 2).astype(np.int32)
    dg, info = compile_graph(g, colors=colors, align=8 * n_graph,
                             band_tile=128, band_min_block=1)
    assert halo_plan(dg, info, n_graph) is not None
    dgj = to_device(dg)
    mesh = make_mesh(2, n_graph)
    cfg = LearnConfig(n_epochs=4, n_sweeps_per_epoch=1, stepsize=0.05,
                      regularization="l2", reg_param=0.01)
    kwargs = dict(cfg=cfg, info=info, mesh=mesh, chains_per_device=2)
    w_halo = learn_gs(dgj, dgj.w_init, jax.random.PRNGKey(5), halo="auto",
                      **kwargs)
    w_full = learn_gs(dgj, dgj.w_init, jax.random.PRNGKey(5), halo=None,
                      **kwargs)
    np.testing.assert_array_equal(np.asarray(w_halo), np.asarray(w_full))


def test_infer_gs_chunked_matches_single_call():
    """Chunked (checkpoint-granularity) sharded inference must be BITWISE
    the chunk-free call: sweep keys fold the absolute step index from one
    per-chains-row stream (VERDICT r2 #5)."""
    g = fixtures.ising_grid(4, 4, w_pair=0.4, w_bias=0.2)
    dg, info = compile_graph(g, align=16)
    dgj = to_device(dg)
    mesh = make_mesh(2, 2)
    # chunk sizes chosen so only TWO programs compile ({40}, {20}); the
    # resume leg reuses the n=20 runner (suite time, VERDICT r4 #9)
    kwargs = dict(n_burn=10, n_sweeps=30, info=info, mesh=mesh,
                  chains_per_device=2)
    m1 = infer_gs(dgj, dgj.w_init, jax.random.PRNGKey(3), **kwargs)
    saved = []
    m2 = infer_gs(dgj, dgj.w_init, jax.random.PRNGKey(3),
                  checkpoint_every=20,
                  on_checkpoint=lambda d, v, c: saved.append((d, v, c)),
                  **kwargs)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    assert [d for d, _, _ in saved] == [20, 40]
    # resume from the first snapshot -> identical marginals again
    m3 = infer_gs(dgj, dgj.w_init, jax.random.PRNGKey(3),
                  checkpoint_every=20, resume_state=saved[0], **kwargs)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m3))


def test_learn_gs_chunked_matches_single_call():
    from sampler_tpu.engine.learn import LearnConfig
    from sampler_tpu.parallel.graph_shard import learn_gs

    g = fixtures.labeled_coin_graph(n_flips=200, p_heads=0.7, seed=3)
    dg, info = compile_graph(g, align=16)
    dgj = to_device(dg)
    mesh = make_mesh(2, 2)
    cfg = LearnConfig(n_epochs=8, stepsize=0.05, diminish=0.95,
                      regularization="l2", reg_param=0.01)
    kwargs = dict(cfg=cfg, info=info, mesh=mesh, chains_per_device=2)
    saved = []
    w_chunk = learn_gs(dgj, dgj.w_init, jax.random.PRNGKey(4),
                       checkpoint_every=3,
                       on_checkpoint=lambda *a: saved.append(a), **kwargs)
    w_rechunk = learn_gs(dgj, dgj.w_init, jax.random.PRNGKey(4),
                         checkpoint_every=3, resume_state=saved[0],
                         **kwargs)
    np.testing.assert_array_equal(np.asarray(w_chunk),
                                  np.asarray(w_rechunk))
    assert [d for d, *_ in saved] == [3, 6, 8]
