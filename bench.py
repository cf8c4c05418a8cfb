#!/usr/bin/env python
"""Headline benchmark: Gibbs variable updates/s on one chip.

Prints ONE JSON line:
  {"metric": "variable_updates_per_s", "value": N, "unit": "updates/s",
   "vs_baseline": N / 1e9}

Baseline denominator: the DimmWitted-class claim of ~1e9 variable updates/s
per (multi-socket CPU) host (BASELINE.md — folklore figure; no published
number was recoverable).  Workload: boolean Ising grid, multi-chain
chromatic sweeps, counted as variables resampled per wall-clock second
across chains after compile.

Timing protocol (axon backend): `block_until_ready` does NOT actually
synchronize on this PJRT plugin, so the run is a long chain of dependent
calls ended with a device→host read that forces real completion.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def hsync(x):
    """Force execution to really finish (host read of one element)."""
    return np.asarray(jax.device_get(x.ravel()[-1]))


def main():
    from sampler_tpu.benchgraphs import big_ising_grid
    from sampler_tpu.compile import compile_graph, to_device
    from sampler_tpu.engine.multichain import init_values_mc, sweep_mc

    rows = cols = int(os.environ.get("BENCH_GRID", "1024"))
    n_chains = int(os.environ.get("BENCH_CHAINS", "512"))
    inner = int(os.environ.get("BENCH_INNER", "10"))     # sweeps per call
    outer = int(os.environ.get("BENCH_OUTER", "6"))      # chained calls

    g, colors = big_ising_grid(rows, cols)
    dg, info = compile_graph(g, colors=colors)
    dgj = to_device(dg)
    V = info.n_vars

    def scan_sweeps(d, v, k):
        def body(vv, i):
            return sweep_mc(d, vv, d.w_init, jax.random.fold_in(k, i),
                            False, info), None
        return jax.lax.scan(body, v, jnp.arange(inner))[0]

    run = jax.jit(scan_sweeps)
    vals = init_values_mc(dgj, jax.random.PRNGKey(0), n_chains, info)
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    vals = run(dgj, vals, key)
    hsync(vals)
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(outer):
        vals = run(dgj, vals, jax.random.fold_in(key, i))
    hsync(vals)
    dt = time.time() - t0

    updates = V * inner * outer * n_chains
    rate = updates / dt
    sys.stderr.write(
        f"grid {rows}x{cols} V={V} chains={n_chains} sweeps={inner}x{outer} "
        f"compile={compile_s:.1f}s run={dt:.3f}s device={jax.devices()[0]}\n")
    print(json.dumps({
        "metric": "variable_updates_per_s",
        "value": rate,
        "unit": "updates/s",
        "vs_baseline": rate / 1e9,
    }))


if __name__ == "__main__":
    main()
