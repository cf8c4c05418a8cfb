"""Round-5 TPU probe: the KBC class through run_inference_mc with the flat
at-rest stream layout.  Prints one JSON line; BENCH_KBC_VARS sets scale."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np
from sampler_tpu.benchgraphs import random_kbc_graph
from sampler_tpu.coloring import greedy_coloring, rcm_order
from sampler_tpu.compile import compile_graph, to_device
from sampler_tpu.engine.multichain import (init_values_mc, resolve_modes,
                                           run_inference_mc)

n_vars = int(os.environ.get("BENCH_KBC_VARS", "500000"))
n_chains = int(os.environ.get("BENCH_KBC_CHAINS", "128"))
inner = int(os.environ.get("BENCH_KBC_INNER", "5"))
outer = int(os.environ.get("BENCH_KBC_OUTER", "2"))
t0 = time.time()
g = random_kbc_graph(n_vars, 3 * n_vars, max_arity=3, n_weights=100_000,
                     seed=0, skew=1.1, window=2000)
colors = greedy_coloring(g)
order = rcm_order(g)
t_gen = time.time() - t0
t0 = time.time()
dg, info = compile_graph(g, colors=colors, order=order, band_wmax=32768)
t_comp = time.time() - t0
del g, colors, order
import gc; gc.collect()
modes = resolve_modes(info)
band_k = max((ti.band_k for ti in info.tiers), default=0)
sys.stderr.write(f"compiled: V={info.n_vars} colors={info.n_colors} "
                 f"tiers={[(ti.block, ti.degree, ti.band_w, ti.band_k) for ti in info.tiers]} "
                 f"hub={info.has_hub} modes={modes} gen={t_gen:.0f}s comp={t_comp:.0f}s\n")
dgj = to_device(dg); del dg; gc.collect()
vals = init_values_mc(dgj, jax.random.PRNGKey(0), n_chains, info)
key = jax.random.PRNGKey(1)
t0 = time.time()
vals, counts = run_inference_mc(dgj, vals, dgj.w_init, key, inner, False, info, modes)
np.asarray(jax.device_get(counts.ravel()[-1]))
t_warm = time.time() - t0
t0 = time.time()
for i in range(outer):
    vals, counts = run_inference_mc(dgj, vals, dgj.w_init,
                                    jax.random.fold_in(key, i), inner, False,
                                    info, modes)
np.asarray(jax.device_get(counts.ravel()[-1]))
dt = time.time() - t0
rate = info.n_vars * inner * outer * n_chains / dt
st = {}
try:
    st = {k: int(v) for k, v in jax.local_devices()[0].memory_stats().items()
          if "peak" in k or "in_use" in k}
except Exception:
    pass
print(json.dumps({"kbc_vars": n_vars, "chains": n_chains,
                  "sweeps": inner * outer, "modes": list(modes),
                  "band_k": band_k, "colors": info.n_colors,
                  "warm_s": round(t_warm, 1), "run_s": round(dt, 2),
                  "updates_per_s": rate, "hbm": st}))
