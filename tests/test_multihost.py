"""Multi-host execution test: 2 real OS processes, 4 virtual CPU devices
each, joined via jax.distributed (Gloo collectives) — SURVEY.md §4's
"multi-process simulation replaces fake backends" and §5.8's DCN story.

Parity target: the multi-host result must be BITWISE identical to the
single-process 8-device result, because the compiled program (shared cached
builders in parallel/chains.py) and the per-device keys are identical —
only array placement differs.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # worker sets its own device count (4)
    env.pop("JAX_PLATFORMS", None)
    return env


@pytest.fixture(scope="module")
def multihost_results(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("mh"))
    port = _free_port()
    env = _clean_env()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
    return outdir


def _single_process_reference():
    """The same computation on the parent's single-process 8-device mesh."""
    from sampler_tpu.compile import compile_graph
    from sampler_tpu.engine.learn import LearnConfig
    from sampler_tpu.fixtures import ising_grid, labeled_coin_graph
    from sampler_tpu.parallel.multihost import (global_chains_mesh,
                                                infer_multihost,
                                                learn_multihost)

    mesh = global_chains_mesh()
    assert mesh.devices.size == 8

    g = ising_grid(4, 4, w_pair=0.5, w_bias=0.2)
    dg, info = compile_graph(g)
    marg = infer_multihost(dg, dg.w_init, jax.random.PRNGKey(7),
                           n_burn=50, n_sweeps=400, info=info, mesh=mesh,
                           chains_per_device=8)

    gl = labeled_coin_graph()
    dgl, infol = compile_graph(gl)
    cfg = LearnConfig(n_epochs=200, n_sweeps_per_epoch=1, stepsize=0.03,
                      diminish=0.995, regularization="none", reg_param=0.0)
    w = learn_multihost(dgl, dgl.w_init, jax.random.PRNGKey(11), cfg, infol,
                        mesh=mesh, chains_per_device=4)
    p_hat = gl.var_init.mean()
    w_star = float(np.log(p_hat / (1 - p_hat)))
    return np.asarray(marg), np.asarray(w), g, w_star


def test_multihost_matches_single_process(multihost_results):
    marg_mh = np.load(os.path.join(multihost_results, "marg.npy"))
    w_mh = np.load(os.path.join(multihost_results, "weights.npy"))
    marg_sp, w_sp, g, w_star = _single_process_reference()

    # bitwise: same program, same per-device keys, different placement only
    np.testing.assert_array_equal(marg_mh, marg_sp)
    np.testing.assert_array_equal(w_mh, w_sp)

    # and statistically correct against the exact oracle
    from sampler_tpu.oracle import exact_marginals
    exact = exact_marginals(g)
    assert np.abs(marg_mh[:, 1] - exact[:, 1]).max() < 0.05

    # learned coin weight recovers the empirical label log-odds
    assert abs(w_mh[0] - w_star) < 0.2


def test_multihost_graph_sharded(multihost_results):
    """infer_gs on a global (2 chains x 4 graph) mesh spanning both
    processes must match the single-process run bitwise (same program,
    same keys) — per-color collectives crossing the process boundary."""
    from sampler_tpu.compile import compile_graph
    from sampler_tpu.fixtures import ising_grid
    from sampler_tpu.parallel.graph_shard import infer_gs, make_mesh

    marg_mh = np.load(os.path.join(multihost_results, "marg_gs.npy"))
    g2 = ising_grid(4, 4, w_pair=0.4, w_bias=0.2)
    dg2, info2 = compile_graph(g2, align=8 * 4)
    marg_sp = infer_gs(dg2, dg2.w_init, jax.random.PRNGKey(21), n_burn=50,
                       n_sweeps=400, info=info2, mesh=make_mesh(2, 4),
                       chains_per_device=4)
    np.testing.assert_array_equal(marg_mh, np.asarray(marg_sp))

    from sampler_tpu.oracle import exact_marginals
    exact = exact_marginals(g2)
    assert np.abs(marg_mh[:, :2] - exact).max() < 0.05


def test_multihost_graph_sharded_learning(multihost_results):
    """learn_gs on the global (2 chains x 4 graph) mesh spanning both
    processes: model-parallel learning's owner-disjoint gradient psum
    crosses the process boundary; the weights must match the
    single-process run bitwise and recover the label log-odds."""
    from sampler_tpu.compile import compile_graph
    from sampler_tpu.engine.learn import LearnConfig
    from sampler_tpu.fixtures import labeled_coin_graph
    from sampler_tpu.parallel.graph_shard import learn_gs, make_mesh

    w_mh = np.load(os.path.join(multihost_results, "weights_gs.npy"))
    gl2 = labeled_coin_graph(n_flips=200, p_heads=0.7, seed=3)
    dgl2, infol2 = compile_graph(gl2, align=8 * 4)
    cfg2 = LearnConfig(n_epochs=60, n_sweeps_per_epoch=1, stepsize=0.05,
                       diminish=0.99, regularization="l2", reg_param=0.01)
    w_sp = learn_gs(dgl2, dgl2.w_init, jax.random.PRNGKey(31), cfg2, infol2,
                    mesh=make_mesh(2, 4), chains_per_device=4)
    np.testing.assert_array_equal(w_mh, np.asarray(w_sp))
    p_hat = gl2.var_init.mean()
    w_star = float(np.log(p_hat / (1 - p_hat)))
    assert abs(float(w_mh[0]) - w_star) < 0.25


def test_multihost_replicated_on_every_process(multihost_results):
    m0 = np.load(os.path.join(multihost_results, "marg_p0.npy"))
    m1 = np.load(os.path.join(multihost_results, "marg_p1.npy"))
    np.testing.assert_array_equal(m0, m1)
