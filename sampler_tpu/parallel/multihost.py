"""Multi-host execution over a TPU pod slice (or multi-process CPU sim).

The reference is strictly single-node shared memory (SURVEY.md §5.8: libnuma
+ pthreads, no NCCL/MPI); its only "collective" is the per-epoch averaging
of per-NUMA-node weight replicas.  The TPU-native scale-out story:

  * ``jax.distributed.initialize`` joins the processes into one global JAX
    runtime (one process per host; each host contributes its local chips).
  * Independent chains are sharded over the GLOBAL ``chains`` mesh axis —
    inference is embarrassingly parallel; the single marginal-tally ``psum``
    at the end crosses DCN once per run.
  * Learning is data-parallel over all hosts: per-step gradient ``pmean``
    over the global chains axis (XLA routes the intra-host part over ICI
    and the cross-host part over DCN; there is no NCCL/Gloo analog to
    manage — collectives ARE the backend).

The compiled programs are identical to the single-process ones in
parallel/chains.py (the cached ``_infer_fn`` / ``_learn_step_fn`` builders
are shared); only array PLACEMENT differs: under multi-process JAX every
input to a global-mesh computation must be a global array, so the helpers
here ``jax.device_put`` host-replicated numpy inputs onto global
``NamedSharding``s instead of relying on implicit placement.

Tested by tests/test_multihost.py, which spawns 2 real OS processes on a
4-virtual-CPU-devices-each Gloo-backed runtime (SURVEY.md §4: multi-process
CPU simulation replaces fake backends) and checks bitwise parity with the
single-process 8-device result.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.multichain import (demote_modes, effective_chains,
                                 init_values_mc, resolve_modes)
from .chains import _infer_fn, _learn_step_fn


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None,
                   local_device_ids=None) -> None:
    """Join this process into the global JAX runtime.

    With no arguments JAX auto-detects cluster membership from standard env
    vars (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or
    the TPU pod metadata on real multi-host slices).  Safe to call in a
    single-process run ONLY with explicit num_processes=1."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def global_chains_mesh() -> Mesh:
    """1-D ``chains`` mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), ("chains",))


def put_replicated(tree, mesh: Mesh):
    """device_put every leaf fully replicated on the global mesh.

    Each process must hold the full host value (true for the compiled
    DeviceGraph, weights, and keys — all built deterministically from the
    same inputs on every host)."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def put_chain_sharded(x, mesh: Mesh, axis: int = 0):
    """device_put a host-replicated array sharded over ``chains`` at axis."""
    spec = tuple(None if i != axis else "chains" for i in range(np.ndim(x)))
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def _device_keys(key, n_dev: int):
    """Per-device keys as a host numpy array (identical on every process)."""
    return np.asarray(jax.random.split(key, n_dev))


def infer_multihost(dg, weights, key, n_burn: int, n_sweeps: int, info,
                    mesh: Mesh | None = None, chains_per_device: int = 8,
                    sample_evidence: bool = False, modes=None):
    """Inference with chains sharded over the global mesh.

    Returns marginals [V, K] float32 as a host numpy array (the tally psum
    makes counts fully replicated, hence addressable on every process)."""
    if mesh is None:
        mesh = global_chains_mesh()
    n_dev = mesh.devices.size
    if modes is None:
        modes = resolve_modes(info)
    chains_per_device = effective_chains(info, modes, chains_per_device,
                                         dg.var_card.shape[0])
    modes = demote_modes(modes, chains_per_device)

    dg_g = put_replicated(dg, mesh)
    w_g = put_replicated(jnp.asarray(weights, jnp.float32), mesh)
    keys = put_chain_sharded(_device_keys(key, n_dev), mesh)

    run = _infer_fn(info, mesh, modes, n_burn, n_sweeps, chains_per_device,
                    sample_evidence)
    _, counts = run(dg_g, w_g, keys)
    # counts arrive flat [K*P] row-major [K, P] (run_inference_mc keeps the
    # tally 1-D on device to dodge tile padding); reshape + transpose on the
    # HOST before reindexing — mirrors infer_sharded in chains.py.
    cnt = np.asarray(counts).reshape(info.max_card, -1).T
    marg = cnt[np.asarray(dg.pos_of_vid)].astype(np.float32) / np.float32(
        n_sweeps * chains_per_device * n_dev)
    return marg


def learn_multihost(dg, weights, key, cfg, info, mesh: Mesh | None = None,
                    chains_per_device: int = 1, modes=None):
    """Data-parallel learning over the global mesh; gradients pmean'd across
    every chip of every host each step (replaces the reference's per-epoch
    NUMA replica averaging).  Returns final weights as host numpy."""
    if mesh is None:
        mesh = global_chains_mesh()
    n_dev = mesh.devices.size
    if modes is None:
        modes = resolve_modes(info)
    chains_per_device = effective_chains(info, modes, chains_per_device,
                                         dg.var_card.shape[0], n_worlds=2)
    modes = demote_modes(modes, chains_per_device)

    k0, k1, kloop = jax.random.split(key, 3)
    dg_g = put_replicated(dg, mesh)
    w = put_replicated(jnp.asarray(weights, jnp.float32), mesh)

    # worlds: computed identically on every process, sharded over chains.
    # init_values_mc on the LOCAL device then pulled to host keeps the values
    # identical to the single-process path (same key -> same worlds).
    def init_on(k):
        v = np.asarray(init_values_mc(dg, k, chains_per_device * n_dev, info))
        return put_chain_sharded(v, mesh, axis=1)

    v_ev = init_on(k0)
    v_free = init_on(k1)

    step = _learn_step_fn(cfg, info, mesh, modes)
    alpha = cfg.stepsize
    for epoch in range(cfg.n_epochs):
        keys = put_chain_sharded(
            _device_keys(jax.random.fold_in(kloop, epoch), n_dev), mesh)
        a_g = put_replicated(jnp.float32(alpha), mesh)
        w, v_ev, v_free = step(dg_g, w, v_ev, v_free, keys, a_g)
        alpha *= cfg.diminish
    return np.asarray(w)
