"""Worker process for tests/test_multihost.py.

Run as:  python multihost_worker.py <process_id> <num_processes> <port> <outdir>

Each worker gets 4 virtual CPU devices, joins the Gloo-backed global runtime
via jax.distributed, runs multi-host inference + learning on a deterministic
fixture, and (process 0) writes the results for the parent to compare.
"""
import os
import sys


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")

    # must run before ANY XLA-backend-touching call — package imports below
    # resolve kernel backends at import time
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from sampler_tpu.parallel.multihost import (global_chains_mesh,
                                                infer_multihost,
                                                learn_multihost)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    import numpy as np

    from sampler_tpu.compile import compile_graph, to_device
    from sampler_tpu.engine.learn import LearnConfig
    from sampler_tpu.fixtures import ising_grid, labeled_coin_graph

    mesh = global_chains_mesh()

    # --- inference ------------------------------------------------------
    g = ising_grid(4, 4, w_pair=0.5, w_bias=0.2)
    dg, info = compile_graph(g)
    marg = infer_multihost(dg, dg.w_init, jax.random.PRNGKey(7),
                           n_burn=50, n_sweeps=400, info=info, mesh=mesh,
                           chains_per_device=8)

    # --- learning -------------------------------------------------------
    gl = labeled_coin_graph()
    dgl, infol = compile_graph(gl)
    cfg = LearnConfig(n_epochs=200, n_sweeps_per_epoch=1, stepsize=0.03,
                      diminish=0.995, regularization="none", reg_param=0.0)
    w = learn_multihost(dgl, dgl.w_init, jax.random.PRNGKey(11), cfg, infol,
                        mesh=mesh, chains_per_device=4)

    # --- graph-sharded inference on the global 2-D mesh ------------------
    # streams sharded over 4 graph devices spanning both processes; the
    # per-color collectives cross the process boundary (the DCN analog)
    from sampler_tpu.parallel.graph_shard import infer_gs, make_mesh

    g2 = ising_grid(4, 4, w_pair=0.4, w_bias=0.2)
    dg2, info2 = compile_graph(g2, align=8 * 4)
    mesh2 = make_mesh(2, 4)
    marg_gs = infer_gs(dg2, dg2.w_init, jax.random.PRNGKey(21), n_burn=50,
                       n_sweeps=400, info=info2, mesh=mesh2,
                       chains_per_device=4)

    # --- graph-sharded (model-parallel) LEARNING across processes --------
    # owner-disjoint shard gradients psum over a graph axis that spans the
    # process boundary (VERDICT.md r2 #9)
    from sampler_tpu.parallel.graph_shard import learn_gs

    gl2 = labeled_coin_graph(n_flips=200, p_heads=0.7, seed=3)
    dgl2, infol2 = compile_graph(gl2, align=8 * 4)
    cfg2 = LearnConfig(n_epochs=60, n_sweeps_per_epoch=1, stepsize=0.05,
                       diminish=0.99, regularization="l2", reg_param=0.01)
    w_gs = learn_gs(dgl2, dgl2.w_init, jax.random.PRNGKey(31), cfg2, infol2,
                    mesh=mesh2, chains_per_device=4)

    if pid == 0:
        np.save(os.path.join(outdir, "marg.npy"), np.asarray(marg))
        np.save(os.path.join(outdir, "weights.npy"), np.asarray(w))
        np.save(os.path.join(outdir, "marg_gs.npy"), np.asarray(marg_gs))
        np.save(os.path.join(outdir, "weights_gs.npy"), np.asarray(w_gs))
    # every process must reach the same replicated results
    np.save(os.path.join(outdir, f"marg_p{pid}.npy"), np.asarray(marg))
    print(f"[worker {pid}] done", flush=True)


if __name__ == "__main__":
    main()
