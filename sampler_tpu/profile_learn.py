"""Dissect the learning-vs-inference throughput gap (VERDICT.md r2 #8).

Times, on the shipped kernels and the benchmark graph, each component of a
learning epoch in isolation:

  * one inference sweep (the fused/banded fast path — the 8.7e9/s number),
  * one learning-world sweep pair (evidence + free),
  * the cs-stream gradient pass alone,
  * the fused-affine fold (per-epoch weights refresh) alone,

and prints a JSON breakdown with the implied epoch budget, so "learning is
3x slower" becomes "X% sweeps, Y% gradient, Z% fold".

Run on the real chip:  python -m sampler_tpu.profile_learn [--grid 1024]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def hsync(x):
    """Force real completion: host read of one element of the LAST pytree
    leaf (axon block_until_ready is a no-op — bench.py protocol)."""
    import jax
    leaf = [l for l in jax.tree_util.tree_leaves(x) if l is not None][-1]
    return np.asarray(jax.device_get(jax.numpy.ravel(leaf)[-1]))


def timeit(fn, *args, reps=3, inner=1):
    """Median wall time of fn(*args) (jit-compiled callables)."""
    out = fn(*args)
    hsync(out)                                             # compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        for _ in range(inner):
            out = fn(*args)
        hsync(out)
        ts.append((time.time() - t0) / inner)
    return float(np.median(ts)), out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=1024)
    ap.add_argument("--chains", type=int, default=256)
    ap.add_argument("--sweeps_per_epoch", type=int, default=2)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from functools import partial

    from .benchgraphs import big_ising_grid
    from .compile import compile_graph, to_device
    from .engine.multichain import (init_values_mc, mc_weight_gradient_cs,
                                    prepare_fold, resolve_modes, sweep_mc)

    g, colors = big_ising_grid(args.grid, args.grid)
    g.var_role[::2] = 1
    g.var_init[::2] = (np.arange((g.n_vars + 1) // 2) % 2).astype(np.int32)
    dg, info = compile_graph(g, colors=colors)
    dgj = to_device(dg)
    modes = resolve_modes(info)
    NC = args.chains
    key = jax.random.PRNGKey(0)
    v_ev = init_values_mc(dgj, key, NC, info)
    v_free = init_values_mc(dgj, jax.random.fold_in(key, 1), NC, info)
    w = dgj.w_init

    @jax.jit
    def one_fold(w):
        return prepare_fold(dgj, w, info, modes)

    folded = one_fold(w)

    @jax.jit
    def one_sweep(vals, w, key):
        return sweep_mc(dgj, vals, w, key, False, info, one_fold(w), modes)

    @partial(jax.jit, static_argnames=())
    def one_sweep_prefolded(vals, key):
        return sweep_mc(dgj, vals, w, key, False, info, folded, modes)

    @jax.jit
    def grad_only(v_ev, v_free):
        return mc_weight_gradient_cs(dgj, v_ev, v_free, False, info, modes)

    t_sweep, _ = timeit(one_sweep_prefolded, v_ev, key, inner=4)
    t_fold, _ = timeit(one_fold, w, inner=4)
    t_grad, _ = timeit(grad_only, v_ev, v_free, inner=2)

    V = info.n_vars
    s = args.sweeps_per_epoch
    epoch = 2 * s * t_sweep + t_grad + t_fold
    upd = 2 * s * V * NC
    print(json.dumps({
        "grid": args.grid, "chains": NC, "modes": list(modes),
        "sweep_s": round(t_sweep, 5),
        "fold_s": round(t_fold, 5),
        "grad_s": round(t_grad, 5),
        "epoch_budget_s": round(epoch, 5),
        "epoch_pct": {
            "world_sweeps": round(100 * 2 * s * t_sweep / epoch, 1),
            "gradient": round(100 * t_grad / epoch, 1),
            "fold": round(100 * t_fold / epoch, 1),
        },
        "inference_updates_per_s": round(V * NC / t_sweep),
        "implied_learning_updates_per_s": round(upd / epoch),
    }))


if __name__ == "__main__":
    sys.exit(main())
