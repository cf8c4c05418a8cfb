#!/usr/bin/env python
"""Large single-chip KBC scale point -> KBC_SCALE.json.

The headline kbc bench leg (bench.py) runs the 5e5-variable class; this
runner measures the SAME power-law workload at 4e6 variables (8x) on the
chip — the size the round-4 tile-padded layout hard-OOM'd — through the
shipped run_inference_mc path.  One JSON line, same provenance contract
as SCALE_TPU.json.

Run:  python tools/scale_kbc.py [> KBC_SCALE.json]
Env:  KBC_SCALE_VARS (default 4000000), KBC_SCALE_CHAINS (default 1024),
      KBC_SCALE_HUBCAP (default 256)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(
                      os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from bench import bench_inference
    from sampler_tpu.benchgraphs import random_kbc_graph
    from sampler_tpu.coloring import greedy_coloring, rcm_order
    from sampler_tpu.compile import compile_graph, to_device
    from sampler_tpu.engine.multichain import resolve_modes

    n_vars = int(os.environ.get("KBC_SCALE_VARS", "4000000"))
    n_chains = int(os.environ.get("KBC_SCALE_CHAINS", "1024"))
    hub_cap = int(os.environ.get("KBC_SCALE_HUBCAP", "256"))

    t0 = time.time()
    g = random_kbc_graph(n_vars, 3 * n_vars, max_arity=3,
                         n_weights=100_000, seed=0, skew=1.1, window=2000)
    colors = greedy_coloring(g)
    order = rcm_order(g)
    t_gen = time.time() - t0

    t0 = time.time()
    dg, info = compile_graph(g, colors=colors, order=order,
                             band_wmax=32768, hub_cap=hub_cap)
    t_compile = time.time() - t0
    dgj = to_device(dg)
    modes = resolve_modes(info)
    rate, warm_s, run_s = bench_inference(dgj, info, modes, n_chains, 5, 2)
    print(json.dumps({
        "device": str(jax.devices()[0]),
        "n_vars": info.n_vars, "n_factors": info.n_factors,
        "n_colors": info.n_colors, "n_tiers": len(info.tiers),
        "has_hub": info.has_hub, "hub_cap": hub_cap,
        "chains": n_chains, "sweeps": 10,
        "modes": list(modes),
        "gen_s": round(t_gen, 1), "compile_s": round(t_compile, 1),
        "warm_s": round(warm_s, 1), "run_s": round(run_s, 2),
        "updates_per_s": int(rate),
        "vs_north_star": round(rate / 1e9, 2),
    }))


if __name__ == "__main__":
    main()
