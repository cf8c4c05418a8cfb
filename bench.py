#!/usr/bin/env python
"""Headline benchmark: the SHIPPED inference and learning paths on one chip.

Prints ONE JSON line:
  {"metric": "variable_updates_per_s", "value": N, "unit": "updates/s",
   "vs_baseline": N / 1e9, "learning_sweeps_per_s": N,
   "learning_updates_per_s": N, "modes": [band, fused]}

Baseline denominator: the DimmWitted-class claim of ~1e9 variable updates/s
per (multi-socket CPU) host (BASELINE.md — folklore figure; no published
number was recoverable).

Both metrics run the code users run (VERDICT.md round-1 weak #2):
  * inference — run_inference_mc: prepare_fold engaged (fused affine Pallas
    kernel on the benchmark-shaped graph), banded gather, per-sweep marginal
    tallies accumulated on device;
  * learning — learn_mc on an evidence-labelled copy of the same graph:
    evidence+free world sweeps, gradient segment-sum, SGD update, per-epoch
    fold refresh.  Reported as weight-learning sweeps/s (BASELINE.json
    metric) where one sweep resamples BOTH worlds.

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

# persistent XLA compile cache: the benchmark graph's programs take minutes
# to build on the axon backend cold; warm runs reload them in seconds
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def hsync(x):
    """Force execution to really finish (host read of one element)."""
    return np.asarray(jax.device_get(x.ravel()[-1]))


def bench_inference(dgj, info, modes, n_chains, inner, outer):
    from sampler_tpu.engine.multichain import (init_values_mc,
                                               run_inference_mc)

    vals = init_values_mc(dgj, jax.random.PRNGKey(0), n_chains, info)
    key = jax.random.PRNGKey(1)

    t0 = time.time()
    vals, counts = run_inference_mc(dgj, vals, dgj.w_init, key, inner,
                                    False, info, modes)
    hsync(counts)
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(outer):
        vals, counts = run_inference_mc(dgj, vals, dgj.w_init,
                                        jax.random.fold_in(key, i), inner,
                                        False, info, modes)
    hsync(counts)
    dt = time.time() - t0
    rate = info.n_vars * inner * outer * n_chains / dt
    return rate, compile_s, dt


def bench_learning(g, colors, modes, n_chains, epochs, sweeps_per_epoch,
                   outer, **compile_kw):
    from sampler_tpu.compile import compile_graph, to_device
    from sampler_tpu.engine.learn import LearnConfig
    from sampler_tpu.engine.multichain import learn_mc, resolve_modes

    # label half the graph so the gradient has signal (evidence world
    # differs from the free world); labels stay inside each var's domain
    g.var_role[::2] = 1
    g.var_init[::2] = (np.arange((g.n_vars + 1) // 2)
                       % np.asarray(g.var_card)[::2]).astype(np.int32)
    dg, info = compile_graph(g, colors=colors, **compile_kw)
    if modes is None:
        modes = resolve_modes(info)
    dgj = to_device(dg)
    cfg = LearnConfig(n_epochs=epochs, n_sweeps_per_epoch=sweeps_per_epoch,
                      stepsize=0.01, diminish=0.99, regularization="l2",
                      reg_param=0.01)
    key = jax.random.PRNGKey(2)

    t0 = time.time()
    w, _, _ = learn_mc(dgj, dgj.w_init, key, cfg, info, n_chains, modes)
    hsync(w)
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(outer):
        w, _, _ = learn_mc(dgj, w, jax.random.fold_in(key, i), cfg, info,
                           n_chains, modes)
    hsync(w)
    dt = time.time() - t0
    sweeps = epochs * sweeps_per_epoch * outer
    # one learning sweep resamples BOTH worlds over all chains
    updates = info.n_vars * sweeps * 2 * n_chains
    return sweeps / dt, updates / dt, compile_s, dt


def bench_class(make_graph, label, n_chains, inner, outer):
    """One non-flagship config class (categorical / arity-3) end-to-end
    through run_inference_mc: compile, resolve modes, time updates/s."""
    from sampler_tpu.compile import compile_graph, to_device
    from sampler_tpu.engine.multichain import resolve_modes

    g, colors = make_graph()
    dg, info = compile_graph(g, colors=colors)
    dgj = to_device(dg)
    modes = resolve_modes(info)
    rate, compile_s, dt = bench_inference(dgj, info, modes, n_chains, inner,
                                          outer)
    sys.stderr.write(
        f"{label}: V={info.n_vars} K={info.max_card} A={info.max_arity} "
        f"chains={n_chains} sweeps={inner}x{outer} modes={modes} "
        f"compile={compile_s:.1f}s run={dt:.3f}s rate={rate:.3e}/s\n")
    del dgj
    return rate, modes


def bench_kbc(n_chains, inner, outer):
    """The workload class the reference actually serves (SURVEY.md §7
    hard-part 2): a power-law KBC graph — skewed degrees (hub tier),
    document-locality windows, greedy balanced coloring, RCM ordering,
    mixed arities/factor types, 1e5 shared weights — end-to-end through
    run_inference_mc."""
    from sampler_tpu.benchgraphs import random_kbc_graph
    from sampler_tpu.coloring import greedy_coloring, rcm_order
    from sampler_tpu.compile import compile_graph, to_device
    from sampler_tpu.engine.multichain import resolve_modes

    # 5e5 vars default; the round-5 flat at-rest layout removed the old
    # tile-padding OOM (BENCH_KBC_VARS=4000000 runs on the chip — the r4
    # cap was 5e5 with a 1e6 OOM).  hub_cap=256: the tier DP never splits
    # the power-law degree tail (measured: the [15, 1976] tail pads its
    # dense tier ~15x — 22.8M padded records over 1.5M real edges at 4e6
    # vars), so mid-degree variables route to the O(edges) chunked-CSR
    # hub tier instead; 4e6-var throughput went 2.7e8 -> 1.29e9 with this
    # cap + 1024 chains (the users' --hub_cap flag, same tuning surface)
    n_vars = int(os.environ.get("BENCH_KBC_VARS", "500000"))
    hub_cap = int(os.environ.get("BENCH_KBC_HUBCAP", "256"))
    n_fac = 3 * n_vars
    g = random_kbc_graph(n_vars, n_fac, max_arity=3, n_weights=100_000,
                         seed=0, skew=1.1, window=2000)
    colors = greedy_coloring(g)
    order = rcm_order(g)
    dg, info = compile_graph(g, colors=colors, order=order,
                             band_wmax=32768, hub_cap=hub_cap)
    dgj = to_device(dg)
    modes = resolve_modes(info)
    band_k = max((ti.band_k for ti in info.tiers), default=0)
    if band_k < 2:
        # why the multi-window banded gather is off: the balanced greedy
        # coloring needs ~20 colors here, so each tile's neighbor reads
        # spread over more source color-blocks than the kernel's window
        # budget (plan_banding_multi k_max) — the plain row gather runs,
        # amortized over the chain lanes
        sys.stderr.write(
            f"kbc: band_k={band_k} (multi-window off: {info.n_colors} "
            f"colors exceed the per-tile window budget)\n")
    rate, compile_s, dt = bench_inference(dgj, info, modes, n_chains,
                                          inner, outer)
    sys.stderr.write(
        f"kbc {n_vars} vars: V={info.n_vars} colors={info.n_colors} "
        f"tiers={len(info.tiers)} hub={info.has_hub} chains={n_chains} "
        f"sweeps={inner}x{outer} modes={modes} compile={compile_s:.1f}s "
        f"run={dt:.3f}s rate={rate:.3e}/s "
        f"{'PASS' if rate >= 1e9 else 'FAIL'} vs 1e9 north-star\n")
    del dgj
    return rate, modes


def main():
    from sampler_tpu.benchgraphs import (big_ising_grid, big_potts_grid,
                                         big_triple_grid)
    from sampler_tpu.compile import compile_graph, to_device
    from sampler_tpu.engine.multichain import resolve_modes

    rows = cols = int(os.environ.get("BENCH_GRID", "1024"))
    n_chains = int(os.environ.get("BENCH_CHAINS", "512"))
    inner = int(os.environ.get("BENCH_INNER", "10"))     # sweeps per call
    outer = int(os.environ.get("BENCH_OUTER", "6"))      # chained calls
    l_chains = int(os.environ.get("BENCH_LEARN_CHAINS", "256"))
    l_epochs = int(os.environ.get("BENCH_LEARN_EPOCHS", "10"))
    l_sweeps = int(os.environ.get("BENCH_LEARN_SWEEPS", "2"))
    l_outer = int(os.environ.get("BENCH_LEARN_OUTER", "3"))

    g, colors = big_ising_grid(rows, cols)
    dg, info = compile_graph(g, colors=colors)
    dgj = to_device(dg)
    modes = resolve_modes(info)

    rate, compile_s, dt = bench_inference(dgj, info, modes, n_chains, inner,
                                          outer)
    sys.stderr.write(
        f"inference: grid {rows}x{cols} V={info.n_vars} chains={n_chains} "
        f"sweeps={inner}x{outer} modes={modes} compile={compile_s:.1f}s "
        f"run={dt:.3f}s rate={rate:.3e}/s device={jax.devices()[0]}\n")

    del dgj
    try:
        lrate_sweeps, lrate_upd, lcompile_s, ldt = bench_learning(
            g, colors, modes, l_chains, l_epochs, l_sweeps, l_outer)
        sys.stderr.write(
            f"learning: chains={l_chains} "
            f"sweeps={l_epochs * l_sweeps}x{l_outer} "
            f"compile={lcompile_s:.1f}s run={ldt:.3f}s "
            f"rate={lrate_sweeps:.2f} sweeps/s ({lrate_upd:.3e} "
            f"updates/s)\n")
    except Exception as e:                          # noqa: BLE001
        sys.stderr.write(f"learning: FAILED {type(e).__name__}: "
                         f"{str(e)[:200]}\n")
        lrate_sweeps = lrate_upd = None

    # the other BASELINE config classes (VERDICT r2 #3): categorical
    # domains (configs[2] shape, general [B,D,K,A,NC] path) and arity-3
    # boolean — both through the shipped run_inference_mc
    def guarded(label, fn):
        """One class crashing (OOM/lowering) must not void the artifact."""
        try:
            return fn()
        except Exception as e:                      # noqa: BLE001
            sys.stderr.write(f"{label}: FAILED {type(e).__name__}: "
                             f"{str(e)[:200]}\n")
            return None, ("error",)

    # class chain batches: the fused kernels' one-hot build is
    # chain-count-INDEPENDENT, so wide batches amortize it — measured on
    # silicon (round-5): categorical 5.8e9 -> 1.25e10 at 128 -> 512
    # chains, arity-3 2.5e9 -> 1.3e10 at 128 -> 1024 with the fused
    # multilinear kernel.  Real independent chains pooled into the
    # tallies, the same statistical contract as the flagship's 512.
    c_grid = int(os.environ.get("BENCH_CAT_GRID", "512"))
    c_card = int(os.environ.get("BENCH_CAT_CARD", "4"))
    c_chains = int(os.environ.get("BENCH_CAT_CHAINS", "512"))
    cat_rate, cat_modes = guarded("categorical", lambda: bench_class(
        lambda: big_potts_grid(c_grid, c_grid, card=c_card),
        f"categorical {c_grid}x{c_grid} card={c_card}", c_chains, inner,
        outer))
    t_grid = int(os.environ.get("BENCH_TRI_GRID", "512"))
    t_chains = int(os.environ.get("BENCH_TRI_CHAINS", "1024"))
    tri_rate, tri_modes = guarded("arity3", lambda: bench_class(
        lambda: big_triple_grid(t_grid, t_grid),
        f"arity3 {t_grid}x{t_grid}", t_chains, inner, outer))

    # LEARNING for the categorical and KBC classes (VERDICT r4 #8: the
    # learning matrix was 1x1) — same learn_mc path, small epoch counts
    def learn_leg(label, mk, chains, **kw):
        def run():
            g2, colors2 = mk()
            _, upd, cs, dt = bench_learning(
                g2, colors2, None, chains, l_epochs, l_sweeps, 1, **kw)
            sys.stderr.write(f"{label} learning: chains={chains} "
                             f"compile={cs:.1f}s run={dt:.3f}s "
                             f"rate={upd:.3e} updates/s\n")
            return upd, None
        return guarded(label + "_learning", run)[0]

    cat_lrate = learn_leg(
        "categorical",
        lambda: big_potts_grid(c_grid, c_grid, card=c_card), c_chains)

    def mk_kbc():
        from sampler_tpu.benchgraphs import random_kbc_graph
        from sampler_tpu.coloring import greedy_coloring
        n_v = int(os.environ.get("BENCH_KBC_LEARN_VARS", "200000"))
        gk = random_kbc_graph(n_v, 3 * n_v, max_arity=3,
                              n_weights=10_000, seed=1, skew=1.1,
                              window=2000)
        return gk, greedy_coloring(gk)

    kbc_lrate = learn_leg("kbc", mk_kbc,
                          int(os.environ.get("BENCH_KBC_LEARN_CHAINS",
                                             "256")),
                          band_wmax=32768,
                          hub_cap=int(os.environ.get("BENCH_KBC_HUBCAP",
                                                     "256")))

    # the irregular KBC class (VERDICT r3 #4): skew + window + hub tier +
    # RCM on the chip, through the same shipped inference path.  1024
    # chains: the class is gather-ISSUE-bound (~0.16 s/sweep fixed at 5e5
    # vars regardless of NC), so wide chain batches amortize it — these
    # are real independent chains pooled into the tallies, the same
    # statistical contract as the flagship's 512
    k_chains = int(os.environ.get("BENCH_KBC_CHAINS", "1024"))
    k_inner = int(os.environ.get("BENCH_KBC_INNER", "5"))
    k_outer = int(os.environ.get("BENCH_KBC_OUTER", "2"))
    kbc_rate, kbc_modes = guarded(
        "kbc", lambda: bench_kbc(k_chains, k_inner, k_outer))

    print(json.dumps({
        "metric": "variable_updates_per_s",
        "value": rate,
        "unit": "updates/s",
        "vs_baseline": rate / 1e9,
        "learning_sweeps_per_s": lrate_sweeps,
        "learning_updates_per_s": lrate_upd,
        "modes": list(modes),
        "categorical_updates_per_s": cat_rate,
        "categorical_modes": list(cat_modes),
        "arity3_updates_per_s": tri_rate,
        "arity3_modes": list(tri_modes),
        "kbc_updates_per_s": kbc_rate,
        "kbc_modes": list(kbc_modes),
        "categorical_learning_updates_per_s": cat_lrate,
        "kbc_learning_updates_per_s": kbc_lrate,
    }))


if __name__ == "__main__":
    main()
