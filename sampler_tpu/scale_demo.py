"""KBC-scale demonstration: compile + run a 10^7-variable graph on a
multi-device mesh (SURVEY.md §7 step 6 / BASELINE configs[4] scaffolding).

Run:  python -m sampler_tpu.scale_demo [--rows N] [--cols N] [--devices N]
                                       [--sweeps N] [--graph-axis N]

Compiles a rows x cols Ising grid with the chunked color-major compiler,
shards the streams over the ``graph`` mesh axis (halo exchange engaged),
runs a few sweeps end-to-end, and prints one JSON line with throughput and
the memory budget, including the extrapolation to 10^8 variables.

The environment (JAX_PLATFORMS / XLA_FLAGS) must be set by the caller for
CPU-mesh simulation; the Makefile target ``make scale-demo`` does so.
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


# per-factor record fields replaced by 1-row placeholders before sharded
# placement (parallel/graph_shard._strip_factor_records) — excluded from the
# sharded-footprint figure so the budget matches what devices actually hold
_STRIPPED_FIELDS = frozenset({
    "f_vids", "f_ispos", "f_eqpred", "f_mask", "f_type", "f_wid", "f_feat",
    "f_arity", "f_cwbase", "f_cwstride", "pos_of_vid"})


def memory_budget(dg, info) -> dict:
    """Per-field device-stream bytes + per-variable totals + 10^8 projection.

    Reports BOTH the full single-chip image (what to_device places) and the
    graph-sharded footprint (factor records stripped — VERDICT r2 weak #8:
    the earlier 240 B/var figure overstated the sharded image by the f_*
    arrays)."""
    from .compile import iter_arrays

    per_field = {n: int(a.nbytes) for n, a in iter_arrays(dg)}
    total = sum(per_field.values())
    sharded = sum(b for n, b in per_field.items()
                  if n not in _STRIPPED_FIELDS)
    per_var = total / max(info.n_vars, 1)
    per_var_sh = sharded / max(info.n_vars, 1)
    top = dict(sorted(per_field.items(), key=lambda kv: -kv[1])[:6])
    return {
        "total_bytes": int(total),
        "bytes_per_var": round(per_var, 1),
        "sharded_bytes": int(sharded),
        "sharded_bytes_per_var": round(per_var_sh, 1),
        "top_fields": top,
        "projected_1e8_gb": round(per_var * 1e8 / 2**30, 1),
        "projected_1e8_sharded_gb": round(per_var_sh * 1e8 / 2**30, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=3200)
    ap.add_argument("--cols", type=int, default=3200)
    ap.add_argument("--devices", type=int, default=0,
                    help="devices to use (0 = all)")
    ap.add_argument("--graph-axis", type=int, default=0,
                    help="graph-axis size (0 = all devices on graph axis)")
    ap.add_argument("--sweeps", type=int, default=10)
    ap.add_argument("--chains", type=int, default=2)
    ap.add_argument("--band_wmax", type=int, default=8192,
                    help="max banded window width; raise for wide grids "
                         "(e.g. 16384 for 10^4 columns) so banding + halo "
                         "stay on at configs[4] scale")
    args = ap.parse_args(argv)

    import os

    import jax

    # the axon TPU plugin overrides the JAX_PLATFORMS env var on this
    # machine; an explicit config update is required for CPU-mesh runs
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from .benchgraphs import big_ising_grid
    from .compile import compile_graph
    from .parallel.graph_shard import halo_plan, infer_gs, make_mesh

    n_dev = args.devices or len(jax.devices())
    n_graph = args.graph_axis or n_dev
    n_chains_ax = n_dev // n_graph

    t0 = time.time()
    g, colors = big_ising_grid(args.rows, args.cols)
    t_gen = time.time() - t0

    t0 = time.time()
    dg, info = compile_graph(g, colors=colors, align=8 * n_graph,
                             band_wmax=args.band_wmax, shards=n_graph)
    t_compile = time.time() - t0
    budget = memory_budget(dg, info)
    del g, colors                    # free the host FactorGraph (~13 GB at
    import gc                        # 10^8 vars) before device placement
    gc.collect()

    plan = halo_plan(dg, info, n_graph)

    mesh = make_mesh(n_chains_ax, n_graph)
    t0 = time.time()
    # pass the HOST DeviceGraph: the shard_map device_puts each field per
    # its spec directly — a prior to_device() would duplicate the full
    # stream image on one device first (OOM at 10^8 vars)
    marg = infer_gs(dg, dg.w_init, jax.random.PRNGKey(0),
                    n_burn=0, n_sweeps=args.sweeps, info=info, mesh=mesh,
                    chains_per_device=args.chains)
    marg = np.asarray(marg)
    t_run = time.time() - t0
    assert marg.shape[0] == info.n_vars and np.isfinite(marg).all()

    updates = info.n_vars * args.sweeps * args.chains * n_chains_ax
    print(json.dumps({
        "n_vars": info.n_vars,
        "n_factors": info.n_factors,
        "gen_s": round(t_gen, 1),
        "compile_s": round(t_compile, 1),
        "run_s": round(t_run, 1),
        "updates_per_s": round(updates / t_run),
        "mesh": {"chains": n_chains_ax, "graph": n_graph},
        "halo": plan,
        "band_w": info.band_w,
        "memory": budget,
    }))


if __name__ == "__main__":
    sys.exit(main())
