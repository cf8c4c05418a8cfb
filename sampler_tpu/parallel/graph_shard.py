"""Graph-sharded sweeps: the model-parallel axis for >HBM graphs.

The memory giant in the compiled layout is the color-major incidence
streams (cs_*: ~30-60 bytes per (variable, incident-factor) record — 10-50x
the assignment vector).  On a mesh axis ``graph`` each device holds a
contiguous 1/n slice of every color block's streams and resamples only its
slice; the updated slices are reassembled with one all_gather per color
step (rides ICI), keeping the small ``values`` vector replicated.

Composes with the ``chains`` axis (parallel/chains.py) on a 2-D mesh
("chains", "graph"): values are sharded over chains and replicated over
graph; streams are sharded over graph and replicated over chains.

This is the TPU-native answer to SURVEY.md configs[4] (KBC-scale graphs):
DimmWitted's answer was "buy a bigger shared-memory box"; here the graph's
working set scales across the pod.  Full value-sharding with
partition-aware halo exchange is the planned next step (round 2).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.multichain import (color_draw_mc, demote_modes,
                                 init_values_mc, resolve_modes)


def make_mesh(n_chains: int, n_graph: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_chains * n_graph])
    return Mesh(devices.reshape(n_chains, n_graph), ("chains", "graph"))


def _sharded_color_step(dg_l, values, weights, key, c, sample_evidence, info,
                        n_graph: int, modes=("off", "off")):
    """One color step where this device owns rows [g*Bl, (g+1)*Bl) of the
    block (dg_l holds the LOCAL stream slice; values are full [P, NC])."""
    Bl = dg_l.cs_mask.shape[1]        # local block rows
    B = Bl * n_graph
    g = jax.lax.axis_index("graph")
    NC = values.shape[1]

    # cs_ismine is streamed, so the logits need no positional info; the key
    # MUST differ per graph shard or the block draw would reuse noise
    key = jax.random.fold_in(key, g)
    drawn = color_draw_mc(dg_l, values, weights, key, c, info, None, modes)

    resample = (dg_l.cm_resample_ev[c] if sample_evidence
                else dg_l.cm_resample[c])
    start = c * B + g * Bl
    old = jax.lax.dynamic_slice(values, (start, 0), (Bl, NC))
    new = jnp.where(resample[:, None], drawn, old)

    # reassemble the whole color block across the graph axis (ICI)
    new_full = jax.lax.all_gather(new, "graph", axis=0, tiled=True)  # [B, NC]
    return jax.lax.dynamic_update_slice(values, new_full, (c * B, 0))


def sweep_gs(dg_l, values, weights, key, sample_evidence: bool, info,
             n_graph: int, modes=("off", "off")):
    C = dg_l.cs_mask.shape[0]

    def body(c, vals):
        ck = jax.random.fold_in(key, c)
        return _sharded_color_step(dg_l, vals, weights, ck, c,
                                   sample_evidence, info, n_graph, modes)

    return jax.lax.fori_loop(0, C, body, values, unroll=(C <= 4))


def shard_device_graph(dg, mesh: Mesh):
    """device_put the DeviceGraph: cs_*/cm_* sharded over 'graph' on their
    B axis, everything else replicated."""
    B = dg.cs_mask.shape[1]
    specs = {}
    for name in dg._fields:
        if (name.startswith(("cs_", "cm_"))
                and getattr(dg, name).shape[1] == B) or (
                name.startswith("bd_") and getattr(dg, name).shape[1] > 1):
            # axis 1 is B (streams) or ntiles (banding plan) — both are
            # contiguous slices of the color block, so they co-shard
            # (disabled [C, 1] plans / placeholder streams stay replicated)
            specs[name] = P(None, "graph")
        else:
            specs[name] = P()
    return type(dg)(*(
        jax.device_put(getattr(dg, n), NamedSharding(mesh, specs[n]))
        for n in dg._fields))


def infer_gs(dg, weights, key, n_burn: int, n_sweeps: int, info,
             mesh: Mesh, chains_per_device: int,
             sample_evidence: bool = False, modes=None):
    """Inference on a ("chains", "graph") mesh.

    Streams sharded over graph; values replicated per device with
    chains_per_device chains along the chains axis.  Tallies are psum'd
    over both axes.  Returns marginals [V, K] float32.

    The compiled block size must divide evenly: compile with
    ``compile_graph(g, align=8 * n_graph)``.
    """
    n_chains_ax = mesh.shape["chains"]
    n_graph = mesh.shape["graph"]
    # resolved OUTSIDE the traced region; NC here is chains per device
    if modes is None:
        modes = resolve_modes(info)
    modes = demote_modes(modes, chains_per_device)
    B = dg.cs_mask.shape[1]
    if B % n_graph:
        raise ValueError(
            f"block size {B} not divisible by graph axis {n_graph}; "
            f"compile with align=8*{n_graph}")

    B_full = dg.cs_mask.shape[1]
    cs_spec = {n: (P(None, "graph")
                   if (n.startswith(("cs_", "cm_"))
                       and getattr(dg, n).shape[1] == B_full)
                   or (n.startswith("bd_") and getattr(dg, n).shape[1] > 1)
                   else P())
               for n in dg._fields}
    dg_spec = type(dg)(*(cs_spec[n] for n in dg._fields))

    @partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(dg_spec, P(), P("chains")),
        out_specs=P(),
    )
    def run(dg_l, w, keys):
        key_l = keys[0]
        k_init, k_run = jax.random.split(key_l)
        vals = init_values_mc(dg_l, k_init, chains_per_device, info)
        # the sweep's all_gather makes values 'varying' over graph; give the
        # scan carry that type from the start
        vals = jax.lax.pcast(vals, ("graph",), to="varying")

        K = info.max_card
        counts0 = jnp.tile(vals[:, :1].astype(jnp.int32) * 0, (1, K))
        ks = jnp.arange(K, dtype=jnp.int32)

        def body(carry, i):
            vals, counts = carry
            kk = jax.random.fold_in(k_run, i)
            vals = sweep_gs(dg_l, vals, w, kk, sample_evidence, info,
                            n_graph, modes)
            tally = jnp.where(i >= n_burn, 1, 0)
            onehot = (vals.astype(jnp.int32)[:, None, :] == ks[None, :, None])
            counts = counts + tally * jnp.sum(onehot, axis=-1,
                                              dtype=jnp.int32)
            return (vals, counts), None

        (vals, counts), _ = jax.lax.scan(
            body, (vals, counts0), jnp.arange(n_burn + n_sweeps))
        # reduce over BOTH axes: chains pools tallies; graph copies are
        # identical, so the extra sum is compensated in the denominator
        # (and it proves replication for the out_spec type)
        counts = jax.lax.psum(counts, ("chains", "graph"))
        return counts

    keys = jax.random.split(key, n_chains_ax)
    counts = run(dg, weights, keys)
    total = n_sweeps * chains_per_device * n_chains_ax * n_graph
    marg = counts[dg.pos_of_vid].astype(jnp.float32) / jnp.float32(total)
    return marg
