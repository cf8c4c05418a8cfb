"""Large single-chip TPU run (VERDICT.md r2 #7): validate the memory model
and throughput on REAL hardware between the 1M-variable bench point and the
10^8-variable CPU-mesh point.

Compiles a ~2-4 x 10^7-variable Ising grid, places the full device image on
the one chip, runs `run_inference_mc` (the shipped fast path: banded gather
+ fused affine Pallas kernel), and prints one JSON line with updates/s and
the device memory picture -> redirect to SCALE_TPU.json.

Run:  python -m sampler_tpu.scale_tpu [--rows 5120] [--cols 5120]
                                      [--chains 128] [--sweeps 4]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def device_memory_stats():
    """Best-effort peak/in-use HBM from the PJRT plugin (may be absent)."""
    import jax
    try:
        st = jax.local_devices()[0].memory_stats()
    except Exception:
        return None
    if not st:
        return None
    keep = {k: int(v) for k, v in st.items()
            if any(s in k for s in ("bytes_in_use", "peak_bytes",
                                    "bytes_limit", "largest_alloc"))}
    return keep or {k: int(v) for k, v in st.items()}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=5120)
    ap.add_argument("--cols", type=int, default=5120)
    ap.add_argument("--chains", type=int, default=128)
    ap.add_argument("--sweeps", type=int, default=4)
    ap.add_argument("--outer", type=int, default=3,
                    help="timed chained run_inference_mc calls")
    args = ap.parse_args(argv)

    import jax

    from .benchgraphs import big_ising_grid
    from .compile import compile_graph, to_device
    from .engine.multichain import (init_values_mc, resolve_modes,
                                    run_inference_mc)
    from .scale_demo import memory_budget

    dev = jax.devices()[0]

    t0 = time.time()
    g, colors = big_ising_grid(args.rows, args.cols)
    t_gen = time.time() - t0

    t0 = time.time()
    dg, info = compile_graph(g, colors=colors)
    t_compile = time.time() - t0
    budget = memory_budget(dg, info)
    del g, colors
    import gc
    gc.collect()

    modes = resolve_modes(info)
    # inference-only run: drop the gradient-only streams (gd_* moment
    # kernel rows + ownership masks) before device placement — ~3.4 GB at
    # 2.6e7 vars that sample_single_variable-equivalent sweeps never read
    C = info.n_colors
    z3 = np.zeros((C, 1, 1), np.float32)
    dg = dg._replace(tiers=tuple(
        ts._replace(gd_wid=np.zeros((C, 1, 1), np.int32),
                    gd_cown=z3, gd_ctch=z3, gd_ao=z3, gd_an=z3, gd_ax=z3,
                    cs_gowner=np.zeros((C, 1, 1), bool),
                    cs_gtouch=np.zeros((C, 1, 1), bool))
        for ts in dg.tiers))
    dgj = to_device(dg)
    del dg
    gc.collect()

    vals = init_values_mc(dgj, jax.random.PRNGKey(0), args.chains, info)
    key = jax.random.PRNGKey(1)

    # warm-up / compile (axon: block_until_ready is a no-op, force a host
    # read of one element to really synchronize — bench.py protocol)
    t0 = time.time()
    vals, counts = run_inference_mc(dgj, vals, dgj.w_init, key, args.sweeps,
                                    False, info, modes)
    np.asarray(jax.device_get(counts.ravel()[-1]))
    t_warm = time.time() - t0

    t0 = time.time()
    for i in range(args.outer):
        vals, counts = run_inference_mc(dgj, vals, dgj.w_init,
                                        jax.random.fold_in(key, i),
                                        args.sweeps, False, info, modes)
    np.asarray(jax.device_get(counts.ravel()[-1]))
    t_run = time.time() - t0

    # sanity: every position tallied (counts are flat row-major [K, P];
    # sum in int64 on host — the device total can exceed int32)
    cnt = np.asarray(jax.device_get(counts), np.int64)
    tot = cnt.reshape(info.max_card, -1).sum(axis=0)
    assert (tot > 0).all()

    updates = info.n_vars * args.sweeps * args.outer * args.chains
    print(json.dumps({
        "device": str(dev),
        "n_vars": info.n_vars,
        "n_factors": info.n_factors,
        "chains": args.chains,
        "sweeps": args.sweeps * args.outer,
        "modes": list(modes),
        "band_w": getattr(info, "band_w", 0),
        "gen_s": round(t_gen, 1),
        "compile_s": round(t_compile, 1),
        "warm_s": round(t_warm, 1),
        "run_s": round(t_run, 2),
        "updates_per_s": round(updates / t_run),
        "memory": budget,
        "hbm": device_memory_stats(),
    }))


if __name__ == "__main__":
    sys.exit(main())
