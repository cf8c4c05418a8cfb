"""A/B the moment-factored gradient kernel vs the XLA chunked gradient on
the real chip (flagship learning protocol, LEARN_PROFILE lineage)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

def run(mode):
    os.environ["SAMPLER_TPU_GRAD"] = mode
    import importlib
    import sampler_tpu.engine.multichain as mc
    importlib.reload(mc)
    from sampler_tpu.benchgraphs import big_ising_grid
    from sampler_tpu.compile import compile_graph, to_device
    from sampler_tpu.engine.learn import LearnConfig
    g, colors = big_ising_grid(1024, 1024)
    g.var_role[::2] = 1
    g.var_init[::2] = (np.arange((g.n_vars + 1) // 2) % 2).astype(np.int32)
    dg, info = compile_graph(g, colors=colors)
    dgj = to_device(dg)
    cfg = LearnConfig(n_epochs=10, n_sweeps_per_epoch=2, stepsize=0.01,
                      diminish=0.99, regularization="l2", reg_param=0.01)
    key = jax.random.PRNGKey(2)
    modes = mc.resolve_modes(info)
    t0 = time.time()
    w, _, _ = mc.learn_mc(dgj, dgj.w_init, key, cfg, info, 256, modes)
    np.asarray(jax.device_get(w.ravel()[-1]))
    compile_s = time.time() - t0
    t0 = time.time()
    for i in range(3):
        w, _, _ = mc.learn_mc(dgj, w, jax.random.fold_in(key, i), cfg, info,
                              256, modes)
    np.asarray(jax.device_get(w.ravel()[-1]))
    dt = time.time() - t0
    sweeps = 10 * 2 * 3
    upd = info.n_vars * sweeps * 2 * 256 / dt
    return {"mode": mode, "compile_s": round(compile_s, 1),
            "run_s": round(dt, 2), "sweeps_per_s": round(sweeps / dt, 2),
            "updates_per_s": upd}

out = [run(m) for m in sys.argv[1:] or ("xla", "kernel")]
print(json.dumps(out))
