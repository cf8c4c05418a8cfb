"""dw-compatible command-line interface.

Mirrors the reference CLI (SURVEY.md §2d; ref: src/cmd_parser.cc — recalled):

  dw gibbs -w weights.bin -v variables.bin -f factors.bin -m graph.meta
           [--domains d.bin] -o outdir -l epochs -i epochs -s sweeps
           -a stepsize -d diminish -b burn_in [--n_chains N]
           [--regularization l1|l2] [--reg_param λ]
           [--sample_evidence] [--learn_non_evidence] [--quiet]
  dw text2bin {weight|variable|factor|domain} in.tsv out.bin
  dw bin2text ...

TPU-era flags replace thread flags: ``-t/--n_threads`` and
``-c/--n_datacopy`` are accepted for drop-in compatibility but map to
``--n_chains`` (independent chains) — the TPU equivalent of thread/NUMA
parallelism (SURVEY.md §2 parallelism table).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="dw", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gibbs", help="learning + marginal inference")
    g.add_argument("-w", "--weights", required=True)
    g.add_argument("-v", "--variables", required=True)
    g.add_argument("-f", "--factors", required=True)
    g.add_argument("-m", "--meta", required=True)
    g.add_argument("--domains", default=None)
    g.add_argument("-o", "--outdir", required=True)
    g.add_argument("-l", "--n_learning_epoch", type=int, default=0)
    g.add_argument("-i", "--n_inference_epoch", type=int, default=500)
    g.add_argument("-s", "--n_samples_per_learning_epoch", type=int, default=1)
    g.add_argument("-a", "--alpha", "--stepsize", dest="alpha", type=float,
                   default=0.01)
    g.add_argument("-d", "--diminish", type=float, default=0.95)
    g.add_argument("-b", "--burn_in", type=int, default=0)
    g.add_argument("-t", "--n_threads", type=int, default=None,
                   help="compat alias for --n_chains")
    g.add_argument("-c", "--n_datacopy", type=int, default=None,
                   help="compat alias (NUMA replicas → chains)")
    g.add_argument("--n_chains", type=int, default=1)
    g.add_argument("--order", choices=["id", "rcm"], default="id",
                   help="variable ordering within (color, tier) segments: "
                        "'rcm' runs reverse Cuthill-McKee to recover "
                        "locality (tightens the banded-gather windows and "
                        "halo bounds on irregular graphs)")
    g.add_argument("--max_tiers", type=int, default=4,
                   help="degree-tier cap for the device layout (1 disables "
                        "bucketing; skewed KBC graphs want >= 2)")
    g.add_argument("--band_wmax", type=int, default=8192,
                   help="max banded-gather window width (positions); raise "
                        "for wide graphs (e.g. 16384 for a 10^4-column "
                        "grid) so the MXU gather + halo exchange stay on")
    g.add_argument("--hub_cap", type=int, default=2048,
                   help="variables with more incident factors than this go "
                        "to the chunked-CSR hub tier (power-law heads); "
                        "composes with --n_graph_shards (chunks shard over "
                        "the graph axis).  For power-law graphs a LOW cap "
                        "(e.g. 256) often wins big: the degree tail pads "
                        "its dense tier ~15x otherwise (README Limits)")
    g.add_argument("--hub_chunk", type=int, default=512,
                   help="records per hub-tier chunk")
    g.add_argument("--n_graph_shards", type=int, default=1,
                   help="shard the graph streams over this many devices "
                        "(model parallelism for >HBM graphs); the remaining "
                        "devices form the chains axis")
    g.add_argument("--regularization", choices=["l1", "l2"], default=None)
    g.add_argument("--reg_param", type=float, default=0.0)
    g.add_argument("--sample_evidence", action="store_true")
    g.add_argument("--learn_non_evidence", action="store_true")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--platform", choices=["cpu", "tpu"], default=None,
                   help="force a JAX platform (the axon TPU plugin ignores "
                        "JAX_PLATFORMS, so use this flag)")
    g.add_argument("--checkpoint", default=None,
                   help="checkpoint file (default <outdir>/checkpoint.npz "
                        "when --checkpoint_every is set)")
    g.add_argument("--checkpoint_every", type=int, default=0,
                   help="snapshot sampler state every N sweeps (inference/"
                        "burn-in) or N epochs (learning); 0 = off")
    g.add_argument("--resume", action="store_true",
                   help="resume from --checkpoint if it exists")
    g.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler trace of the run to DIR")
    g.add_argument("--quiet", "-q", action="store_true")

    for name in ("text2bin", "bin2text"):
        c = sub.add_parser(name)
        c.add_argument("relation", choices=["weight", "variable", "factor",
                                            "domain"])
        c.add_argument("input")
        c.add_argument("output")

    return p


def cmd_gibbs(args) -> int:
    import jax

    if args.platform:
        jax.config.update("jax_platforms",
                          "cpu" if args.platform == "cpu" else "axon")
    # persistent XLA compile cache: repeat runs of same-shaped graphs skip
    # the minutes-long cold compile on the TPU backend.  CPU is excluded:
    # its compiles are fast and its AOT artifacts are machine-feature
    # sensitive (cross-host cache hits risk SIGILL).
    cache = os.environ.get("SAMPLER_TPU_COMPILE_CACHE",
                           os.path.expanduser("~/.cache/sampler_tpu_xla"))
    if cache and cache.lower() != "off" and jax.default_backend() != "cpu":
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from .compile import compile_graph, to_device
    from .io import binary, results

    log = (lambda *a: None) if args.quiet else (lambda *a: print(*a, flush=True))

    t0 = time.time()
    graph = binary.load_graph(args.meta, domains_path=args.domains)
    log(f"loaded graph: {graph.n_vars} vars, {graph.n_factors} factors, "
        f"{graph.n_weights} weights, {graph.n_edges} edges "
        f"[{time.time()-t0:.2f}s]")

    n_graph = max(args.n_graph_shards, 1)
    t0 = time.time()
    order = None
    if args.order == "rcm":
        from .coloring import rcm_order
        order = rcm_order(graph)
    dg, info = compile_graph(graph, align=8 * n_graph,
                             band_wmax=args.band_wmax, shards=n_graph,
                             max_tiers=args.max_tiers, order=order,
                             hub_cap=args.hub_cap,
                             hub_chunk=args.hub_chunk)
    dgj = to_device(dg)
    log(f"compiled: {info.n_colors} colors, block {info.block_size}, "
        f"degree {info.max_degree}, arity {info.max_arity}, "
        f"tiers {[(ti.block, ti.degree, ti.arity) for ti in info.tiers]} "
        f"[{time.time()-t0:.2f}s]")

    key = jax.random.PRNGKey(args.seed)
    k_learn, k_inf = jax.random.split(key)
    weights = dgj.w_init

    n_chains = args.n_chains
    if args.n_threads:
        n_chains = max(n_chains, args.n_threads)
    # keep the Pallas fast paths at dw-default chain counts: raise to the
    # TPU lane width (the extra chains are real chains pooled into the same
    # tallies/gradients; lane-aligned kernels cost the same wall-clock)
    from .engine.multichain import effective_chains, resolve_modes
    n_eff = effective_chains(info, resolve_modes(info), n_chains,
                             dg.var_card.shape[0],
                             n_worlds=2 if args.n_learning_epoch else 1)
    if n_eff != n_chains:
        log(f"n_chains {n_chains} -> {n_eff} (raised to the TPU lane width "
            f"so the Pallas kernels stay engaged)")
        n_chains = n_eff

    every = args.checkpoint_every
    ckpt_path = args.checkpoint
    if every and not ckpt_path:
        os.makedirs(args.outdir, exist_ok=True)
        ckpt_path = os.path.join(args.outdir, "checkpoint.npz")
    state = None
    if args.resume and ckpt_path and os.path.exists(ckpt_path):
        from . import checkpoint
        state = checkpoint.load(ckpt_path)
        sig = dict(n_vars=info.n_vars, n_factors=info.n_factors,
                   seed=args.seed, n_chains=n_chains)
        if {k: state.meta.get(k) for k in sig} != sig:
            raise SystemExit(
                f"checkpoint {ckpt_path} was written by a different run "
                f"(meta {state.meta} vs {sig})")
        log(f"resuming from {ckpt_path}: phase={state.meta.get('phase')} "
            f"epoch={state.epoch} sweep={state.sweep}")

    if n_graph > 1:
        weights, marg = _run_gibbs_sharded(args, log, dgj, info, weights,
                                           k_learn, k_inf, n_chains, n_graph,
                                           every, ckpt_path, state)
        _write_outputs(args, log, graph, info, weights, marg)
        return 0

    if args.profile:
        jax.profiler.start_trace(args.profile)
    try:
        weights, marg = _run_gibbs_phases(
            args, log, graph, dgj, info, weights, k_learn, k_inf, n_chains,
            every, ckpt_path, state)
    finally:
        if args.profile:
            jax.profiler.stop_trace()
            log(f"profiler trace written to {args.profile}")

    _write_outputs(args, log, graph, info, weights, marg)
    return 0


def _write_outputs(args, log, graph, info, weights, marg):
    from .io import results

    os.makedirs(args.outdir, exist_ok=True)
    results.write_marginals(graph, marg,
                            os.path.join(args.outdir, "inference_result.out.text"))
    # drop the reserved zero slot appended by compile (sparse-cw sentinel)
    results.write_weights_out(np.asarray(weights)[: info.n_weights],
                              os.path.join(args.outdir,
                                           "inference_result.out.weights.text"))
    log(f"wrote {args.outdir}/inference_result.out.text")


def _run_gibbs_sharded(args, log, dgj, info, weights, k_learn, k_inf,
                       n_chains, n_graph, every=0, ckpt_path=None,
                       state=None):
    """Learn + infer on a ("chains", "graph") mesh: graph streams sharded
    over ``n_graph`` devices (model parallelism for >HBM graphs), remaining
    devices data-parallel over chains.  With ``every`` set, both phases
    snapshot at chunk boundaries (absolute-index RNG folding inside
    learn_gs/infer_gs makes a killed+resumed run byte-identical to an
    uninterrupted checkpointed one)."""
    import jax
    import jax.numpy as jnp

    from . import checkpoint
    from .engine.learn import LearnConfig
    from .parallel.graph_shard import infer_gs, learn_gs, make_mesh

    n_dev = len(jax.devices())
    if n_dev % n_graph or n_dev < n_graph:
        raise SystemExit(f"--n_graph_shards {n_graph} does not divide the "
                         f"{n_dev} available devices")
    mesh = make_mesh(n_dev // n_graph, n_graph)
    log(f"mesh: chains={n_dev // n_graph} x graph={n_graph}, "
        f"{n_chains} chains/device")
    meta = dict(n_vars=info.n_vars, n_factors=info.n_factors,
                seed=args.seed, n_chains=n_chains, n_graph=n_graph)

    def save(phase, values, counts=None, sweep=0, epoch=0, w=None):
        checkpoint.save(checkpoint.SamplerState(
            values=np.asarray(values), weights=np.asarray(w),
            rng_key=np.asarray(k_inf), counts=counts, sweep=sweep,
            epoch=epoch, meta={**meta, "phase": phase}), ckpt_path)
        _fault_hook()

    n_epochs = args.n_learning_epoch
    learn_resume = None
    if state is not None and state.meta.get("phase") == "gs_learn":
        learn_resume = (state.epoch, state.weights,
                        state.values[0], state.values[1])
        state = None if state.epoch < n_epochs else state
    if n_epochs > 0 and (state is None or
                         state.meta.get("phase") == "gs_learn"):
        cfg = LearnConfig(
            n_epochs=n_epochs,
            n_sweeps_per_epoch=args.n_samples_per_learning_epoch,
            stepsize=args.alpha, diminish=args.diminish,
            regularization=args.regularization or "none",
            reg_param=args.reg_param,
            learn_non_evidence=args.learn_non_evidence)
        on_ckpt = None
        if every and ckpt_path:
            on_ckpt = lambda done, w, v_ev, v_free: save(
                "gs_learn", np.stack([v_ev, v_free]), epoch=done, w=w)
        t0 = time.time()
        weights = learn_gs(dgj, weights, k_learn, cfg, info, mesh,
                           chains_per_device=n_chains,
                           checkpoint_every=every, on_checkpoint=on_ckpt,
                           resume_state=learn_resume)
        log(f"learning: {n_epochs} epochs [{time.time()-t0:.2f}s]")
    elif state is not None and state.meta.get("phase") == "gs_infer":
        weights = jnp.asarray(state.weights)

    infer_resume = None
    if state is not None and state.meta.get("phase") == "gs_infer":
        infer_resume = (state.sweep, state.values,
                        state.counts.astype(np.int64))
    on_ckpt = None
    if every and ckpt_path:
        on_ckpt = lambda done, values, counts: save(
            "gs_infer", values, counts=counts, sweep=done, w=weights)
    t0 = time.time()
    marg = infer_gs(dgj, weights, k_inf, n_burn=args.burn_in,
                    n_sweeps=args.n_inference_epoch, info=info, mesh=mesh,
                    chains_per_device=n_chains,
                    sample_evidence=args.sample_evidence,
                    checkpoint_every=every, on_checkpoint=on_ckpt,
                    resume_state=infer_resume)
    log(f"inference: {args.n_inference_epoch} sweeps "
        f"(+{args.burn_in} burn-in) [{time.time()-t0:.2f}s]")
    return weights, marg


_fault_counter = [0]


def _fault_hook():
    """Fault injection for preemption-recovery tests (SURVEY.md §5.3): hard-
    kill the process after N checkpoint saves when SAMPLER_TPU_FAULT_AFTER=N
    — simulates a pod preemption landing between scan boundaries."""
    n = os.environ.get("SAMPLER_TPU_FAULT_AFTER")
    if not n:
        return
    _fault_counter[0] += 1
    if _fault_counter[0] >= int(n):
        sys.stderr.write("FAULT INJECTED: exiting after "
                         f"{_fault_counter[0]} checkpoint saves\n")
        sys.stderr.flush()
        os._exit(3)


def _run_gibbs_phases(args, log, graph, dgj, info, weights, k_learn, k_inf,
                      n_chains, every, ckpt_path, state):
    """learn → burn-in → inference, each phase chunked at checkpoint
    granularity when --checkpoint_every is set.  Chunk keys are folded from
    the ABSOLUTE epoch/sweep index, so a resumed run replays exactly the
    RNG stream an uninterrupted (checkpointed) run would use."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from . import checkpoint
    from .engine.gibbs import infer
    from .engine.learn import LearnConfig, learn
    from .engine.multichain import (demote_modes, init_values_mc, learn_mc,
                                    resolve_modes, run_inference_mc,
                                    run_sweeps_mc)

    meta = dict(n_vars=info.n_vars, n_factors=info.n_factors,
                seed=args.seed, n_chains=n_chains)

    def save(phase, values, counts=None, sweep=0, epoch=0, w=None):
        checkpoint.save(checkpoint.SamplerState(
            values=np.asarray(values), weights=np.asarray(w),
            rng_key=np.asarray(k_inf), counts=counts, sweep=sweep,
            epoch=epoch, meta={**meta, "phase": phase}), ckpt_path)
        _fault_hook()

    # ---- learning ----------------------------------------------------
    n_epochs = args.n_learning_epoch
    epochs_done, v_ev, v_free = 0, None, None
    if state is not None and state.meta.get("phase") == "learn":
        epochs_done = state.epoch
        weights = jnp.asarray(state.weights)
        v_ev = jnp.asarray(state.values[0])
        v_free = jnp.asarray(state.values[1])
        state = None
    elif state is not None:           # burn/infer phase: learning finished
        epochs_done = n_epochs
        weights = jnp.asarray(state.weights)

    if n_epochs > 0 and epochs_done < n_epochs:
        t0 = time.time()
        cfg = LearnConfig(
            n_epochs=n_epochs,
            n_sweeps_per_epoch=args.n_samples_per_learning_epoch,
            stepsize=args.alpha,
            diminish=args.diminish,
            regularization=args.regularization or "none",
            reg_param=args.reg_param,
            learn_non_evidence=args.learn_non_evidence,
        )
        while epochs_done < n_epochs:
            chunk = (min(every, n_epochs - epochs_done) if every
                     else n_epochs - epochs_done)
            ccfg = dataclasses.replace(cfg, n_epochs=chunk)
            kc = jax.random.fold_in(k_learn, epochs_done)
            if n_chains > 1 or every:
                alpha = cfg.stepsize * (cfg.diminish ** epochs_done)
                weights, v_ev, v_free = learn_mc(
                    dgj, weights, kc, ccfg, info, n_chains,
                    v_ev=v_ev, v_free=v_free, alpha=alpha)
            else:
                weights, _, _ = learn(dgj, weights, kc, ccfg, info)
            epochs_done += chunk
            if every and ckpt_path:
                save("learn", np.stack([np.asarray(v_ev),
                                        np.asarray(v_free)]),
                     epoch=epochs_done, w=weights)
        weights.block_until_ready()
        dt = time.time() - t0
        sweeps = n_epochs * cfg.n_sweeps_per_epoch
        log(f"learning: {sweeps} sweeps in {dt:.2f}s "
            f"({sweeps * graph.n_vars / max(dt, 1e-9):.3g} vars/s)")

    # ---- burn-in + inference ------------------------------------------
    t0 = time.time()
    n_burn, n_inf = args.burn_in, args.n_inference_epoch
    if not every:
        marg, _ = infer(dgj, weights, k_inf, n_burn=n_burn, n_sweeps=n_inf,
                        info=info, sample_evidence=args.sample_evidence,
                        n_chains=n_chains)
        marg = np.asarray(jax.block_until_ready(marg))
    else:
        modes = demote_modes(resolve_modes(info), n_chains)
        k_init, k_burn, k_run = jax.random.split(k_inf, 3)
        P, K = dgj.var_card.shape[0], info.max_card
        burn_done, inf_done = 0, 0
        counts = np.zeros((P, K), np.int64)
        if state is not None and state.meta.get("phase") == "burn":
            values = jnp.asarray(state.values)
            burn_done = state.sweep
        elif state is not None and state.meta.get("phase") == "infer":
            values = jnp.asarray(state.values)
            burn_done, inf_done = n_burn, state.sweep
            counts = state.counts.astype(np.int64)
        else:
            values = init_values_mc(dgj, k_init, n_chains, info)
        while burn_done < n_burn:
            chunk = min(every, n_burn - burn_done)
            values = run_sweeps_mc(dgj, values, weights,
                                   jax.random.fold_in(k_burn, burn_done),
                                   chunk, args.sample_evidence, info, modes)
            burn_done += chunk
            save("burn", values, sweep=burn_done, w=weights)
        while inf_done < n_inf:
            chunk = min(every, n_inf - inf_done)
            values, cts = run_inference_mc(
                dgj, values, weights, jax.random.fold_in(k_run, inf_done),
                chunk, args.sample_evidence, info, modes)
            counts += np.asarray(cts, np.int64).reshape(K, -1).T
            #         device counts are flat row-major [K, P]
            inf_done += chunk
            save("infer", values, counts=counts, sweep=inf_done, w=weights)
        marg = (counts[np.asarray(dgj.pos_of_vid)]
                / float(n_inf * n_chains)).astype(np.float32)
    dt = time.time() - t0
    total = (n_burn + n_inf) * graph.n_vars * n_chains
    log(f"inference: {n_inf} sweeps x {n_chains} chains in "
        f"{dt:.2f}s ({total / max(dt, 1e-9):.3g} vars/s)")
    return weights, marg


def cmd_text2bin(args) -> int:
    # Single-relation conversion: TSV lines → binary records, serialized
    # directly (no cross-relation validation — a lone factor file cannot
    # know the variables' cardinalities)
    from .io import text
    lines = [ln.rstrip("\n") for ln in open(args.input) if ln.strip()]
    conv = {"weight": text.weight_lines_to_bin,
            "variable": text.variable_lines_to_bin,
            "factor": text.factor_lines_to_bin,
            "domain": text.domain_lines_to_bin}[args.relation]
    with open(args.output, "wb") as fp:
        fp.write(conv(lines))
    return 0


def cmd_bin2text(args) -> int:
    from .io import binary, text
    out_lines = []
    if args.relation == "weight":
        w_init, w_fixed = binary.read_weights(args.input)
        out_lines = [f"{i}\t{int(f)}\t{v:.17g}"
                     for i, (f, v) in enumerate(zip(w_fixed, w_init))]
    elif args.relation == "variable":
        role, init, dtype, card = binary.read_variables(args.input)
        out_lines = [f"{i}\t{int(role[i])}\t{int(init[i])}\t{int(dtype[i])}\t"
                     f"{int(card[i])}" for i in range(len(role))]
    elif args.relation == "factor":
        f_type, f_wid, f_feat, f_ptr, e_vid, e_ispos, e_eq = \
            binary.read_factors(args.input)
        from . import format_spec as fs
        for f in range(len(f_type)):
            lo, hi = int(f_ptr[f]), int(f_ptr[f + 1])
            cat = int(f_type[f]) in fs.CATEGORICAL_FUNCS
            edges = []
            for e in range(lo, hi):
                tok = f"{int(e_vid[e])}:{int(e_ispos[e])}"
                if cat:
                    tok += f":{int(e_eq[e])}"
                edges.append(tok)
            out_lines.append("\t".join(
                [str(int(f_type[f])), str(int(f_wid[f])),
                 f"{float(f_feat[f]):.17g}"] + edges))
    elif args.relation == "domain":
        doms = binary.read_domains(args.input)
        out_lines = ["\t".join([str(v), str(len(vals))] +
                               [str(int(x)) for x in vals])
                     for v, vals in sorted(doms.items())]
    with open(args.output, "w") as fp:
        fp.write("\n".join(out_lines) + ("\n" if out_lines else ""))
    return 0


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.cmd == "gibbs":
        return cmd_gibbs(args)
    if args.cmd == "text2bin":
        return cmd_text2bin(args)
    if args.cmd == "bin2text":
        return cmd_bin2text(args)
    return 2


if __name__ == "__main__":
    sys.exit(main())
