"""Multi-chip execution: chains sharded over a device mesh.

TPU-native replacement for the reference's process-level parallelism
(pthreads + NUMA replicas — SURVEY.md §2 parallelism table):

  * INFERENCE: independent chains are embarrassingly parallel — the chain
    axis of the chains-last values array [P, NC_total] is sharded over the
    ``chains`` mesh axis via shard_map; each device sweeps its local
    [P, NC_local] block with a device-specific key; marginal tallies are
    summed across devices with one psum at the end (rides ICI).
  * LEARNING: data-parallel — each device maintains its own evidence/free
    worlds, computes the weight gradient on local chains, and gradients are
    pmean'd across the mesh every step (replaces DimmWitted's per-epoch
    NUMA weight-replica averaging with per-step ICI allreduce).

Graph sharding (variables split across chips for >HBM graphs) is the next
axis ("graph"); see parallel/ROADMAP in repo docs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.learn import apply_update, weight_gradient
from ..engine.multichain import (demote_modes, effective_chains,
                                 init_values_mc, resolve_modes,
                                 run_inference_mc, run_sweeps_mc, sweep_mc,
                                 values_dtype)


def chains_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[: n_devices] if n_devices else jax.devices()
    import numpy as np

    return Mesh(np.asarray(devices), ("chains",))


from functools import lru_cache


@lru_cache(maxsize=64)
def _infer_fn(info, mesh: Mesh, modes, n_burn: int, n_sweeps: int,
              chains_per_device: int, sample_evidence: bool):
    """Build (and cache) the jitted sharded inference program.

    Shared by the single-process path (infer_sharded) and the multi-host
    path (parallel/multihost.py), which differ only in how the global input
    arrays are placed."""

    @partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(), P(), P("chains")),
        out_specs=(P(None, "chains"), P()),
    )
    def run(dg_l, w, keys):
        key_l = keys[0]
        k_init, k_burn, k_inf = jax.random.split(key_l, 3)
        vals = init_values_mc(dg_l, k_init, chains_per_device, info)
        if n_burn:
            vals = run_sweeps_mc(dg_l, vals, w, k_burn, n_burn,
                                 sample_evidence, info, modes)
        vals, counts = run_inference_mc(dg_l, vals, w, k_inf, n_sweeps,
                                        sample_evidence, info, modes)
        counts = jax.lax.psum(counts, "chains")   # pool tallies over ICI
        return vals, counts

    return jax.jit(run)


def infer_sharded(dg, weights, key, n_burn: int, n_sweeps: int, info,
                  mesh: Mesh, chains_per_device: int,
                  sample_evidence: bool = False, modes=None):
    """Sharded multi-chain inference.

    Returns (marginals [V, K] float32 — replicated, values [P, NC_total]).
    """
    n_dev = mesh.devices.size
    # resolved OUTSIDE the traced region; NC here is chains per device
    if modes is None:
        modes = resolve_modes(info)
    chains_per_device = effective_chains(info, modes, chains_per_device,
                                         dg.var_card.shape[0])
    modes = demote_modes(modes, chains_per_device)

    run = _infer_fn(info, mesh, modes, n_burn, n_sweeps, chains_per_device,
                    sample_evidence)
    keys = jax.random.split(key, n_dev)
    values, counts = run(dg, weights, keys)
    # counts arrive flat [K*P] (see run_inference_mc — 1-D avoids tile
    # padding); reshape + transpose + reindex on HOST
    import numpy as np
    cnt = np.asarray(jax.device_get(counts)).reshape(info.max_card, -1).T
    marg = cnt[np.asarray(jax.device_get(dg.pos_of_vid))].astype(
        np.float32) / np.float32(
        n_sweeps * chains_per_device * n_dev)
    return marg, values


@lru_cache(maxsize=64)
def _learn_step_fn(cfg, info, mesh: Mesh, modes):
    """Build (and cache) the jitted data-parallel learning step.

    Cached on (cfg, info, mesh) so a Python epoch loop reuses one compiled
    executable instead of re-tracing the shard_map every call."""

    @partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(), P(), P(None, "chains"), P(None, "chains"), P("chains"),
                  P()),
        out_specs=(P(), P(None, "chains"), P(None, "chains")),
    )
    def step(dg_l, w, v_ev, v_free, keys, alpha):
        from ..engine.multichain import prepare_fold

        ke, kf = jax.random.split(keys[0])
        folded = prepare_fold(dg_l, w, info, modes)
        v_ev = sweep_mc(dg_l, v_ev, w, ke, False, info, folded, modes)
        v_free = sweep_mc(dg_l, v_free, w, kf, True, info, folded, modes)
        # gradient pooled over local chains, then over devices
        from ..engine.multichain import mc_weight_gradient
        grad = mc_weight_gradient(dg_l, v_ev, v_free,
                                  cfg.learn_non_evidence, info, modes)
        grad = jax.lax.pmean(grad, "chains")
        w = apply_update(w, grad, dg_l.w_fixed, alpha, cfg.regularization,
                         cfg.reg_param)
        return w, v_ev, v_free

    return jax.jit(step)


def learn_step_sharded(dg, weights, v_ev, v_free, key, alpha, cfg, info,
                       mesh: Mesh, modes=None):
    """One data-parallel learning step (compiled once per (cfg, info, mesh)).

    v_ev/v_free: [P, NC_local] per device (sharded on chain axis).
    Gradients are pmean'd across the ``chains`` axis each step.
    """
    n_dev = mesh.devices.size
    keys = jax.random.split(key, n_dev)
    if modes is None:
        modes = resolve_modes(info)
    step = _learn_step_fn(cfg, info, mesh,
                          demote_modes(modes, v_ev.shape[-1] // n_dev))
    return step(dg, weights, v_ev, v_free, keys, alpha)


def learn_sharded(dg, weights, key, cfg, info, mesh: Mesh,
                  chains_per_device: int = 1):
    """Full data-parallel learning loop; returns final weights (replicated)."""
    n_dev = mesh.devices.size
    chains_per_device = effective_chains(
        info, resolve_modes(info), chains_per_device, dg.var_card.shape[0],
        n_worlds=2)
    k0, k1, kloop = jax.random.split(key, 3)

    shard_chains = NamedSharding(mesh, P(None, "chains"))

    def init_on(k):
        return init_values_mc(dg, k, chains_per_device * n_dev, info)

    v_ev = jax.device_put(init_on(k0), shard_chains)
    v_free = jax.device_put(init_on(k1), shard_chains)

    w = jnp.asarray(weights, jnp.float32)
    alpha = cfg.stepsize
    for epoch in range(cfg.n_epochs):
        kk = jax.random.fold_in(kloop, epoch)
        w, v_ev, v_free = learn_step_sharded(dg, w, v_ev, v_free, kk,
                                             jnp.float32(alpha), cfg, info,
                                             mesh)
        alpha *= cfg.diminish
    return w
