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

HALO EXCHANGE (banded graphs).  When the banding plan exists (band_w > 0),
every neighbor position a device's tiles ever read is bounded inside the
per-tile windows [bd_start, bd_start+band_w) — so after color c updates,
device g does not need the WHOLE updated block, only the slices of it that
intersect g's read windows.  ``halo_plan`` computes (at shard time, from the
same bd_start plan the banded gather uses) how many owner-slices to the
left/right of g's own slice can ever be read; the all_gather then shrinks
to nl+nr neighbor-shift ``ppermute``s (nearest-neighbor ICI traffic), and
each device's values copy is kept fresh ONLY where it will be read (stale
elsewhere — marginal tallies count own rows only and psum disjointly).
Exchange volume per color step drops from (n_graph-1) to (nl+nr) slices.

This is the TPU-native answer to SURVEY.md configs[4] (KBC-scale graphs):
DimmWitted's answer was "buy a bigger shared-memory box"; here the graph's
working set scales across the pod.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.multichain import (color_draw_mc, demote_modes,
                                 effective_chains, init_values_mc,
                                 mc_weight_gradient_cs, resolve_modes)


def make_mesh(n_chains: int, n_graph: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices[: n_chains * n_graph])
    return Mesh(devices.reshape(n_chains, n_graph), ("chains", "graph"))


def halo_plan(bd_lo, bd_hi, bounds, B: int, n_graph: int):
    """How far (in owner slices) any device's reads reach beyond its own
    slice of a color block: returns (nl, nr), or None when the halo
    exchange does not apply (no read-bounds plan, misaligned tiles, or no
    win over the full all_gather).  ``bounds`` is CompileInfo.bounds — the
    bd_lo/bd_hi validity flag; the plan works whether the gather runs
    banded or plain (the bounds cover every position a tile reads).

    bd_lo/bd_hi: host [C, ntiles] TRUE per-tile read bounds [lo, hi) over
    cs_nbr (compile.py) — these bound every value position a tile's sweep
    can consult, whether the gather runs banded or as a plain row gather
    (the banded windows merely pad them).  Reader device g owns tiles
    [g*tpd, (g+1)*tpd) of every color (tile axis co-shards with the B axis
    in shard_device_graph / infer_gs)."""
    if not bounds:
        return None
    bd_lo = np.asarray(bd_lo)
    bd_hi = np.asarray(bd_hi)
    C, ntiles = bd_lo.shape
    if B % n_graph or ntiles % n_graph:
        return None
    Bl = B // n_graph
    tpd = ntiles // n_graph
    nl = nr = 0
    for g in range(n_graph):
        lo_own, hi_own = g * Bl, (g + 1) * Bl
        los = bd_lo[:, g * tpd:(g + 1) * tpd].ravel()
        his = bd_hi[:, g * tpd:(g + 1) * tpd].ravel()
        for L, H in zip(los.tolist(), his.tolist()):
            if L >= H:
                continue                   # empty tile (lo=P, hi=0)
            for c in range(L // B, min((H - 1) // B + 1, C)):
                l = max(L - c * B, 0)
                h = min(H - c * B, B)
                if l >= h:
                    continue
                nl = max(nl, -((l - lo_own) // Bl))      # ceil((lo_own-l)/Bl)
                nr = max(nr, -((hi_own - h) // Bl))
    nl, nr = max(nl, 0), max(nr, 0)
    if nl + nr >= n_graph - 1:
        return None
    return nl, nr


def _sharded_color_step(dg_l, values, weights, key, c, sample_evidence, info,
                        n_graph: int, modes=("off", "off"), halo=None,
                        folded=None):
    """One color step where this device owns rows [g*Bl, (g+1)*Bl) of the
    block (dg_l holds the LOCAL stream slice; values are full [P, NC] —
    plus Bl scratch rows at the end in halo mode, where only the positions
    this device ever reads are kept fresh).  ``folded`` holds the LOCAL
    fused-affine fold (prepare_fold on the shard's slice) when the fused
    kernel is enabled."""
    Bl = dg_l.cs_mask.shape[1]        # local block rows
    B = Bl * n_graph
    g = jax.lax.axis_index("graph")
    NC = values.shape[1]

    # cs_ismine is streamed, so the logits need no positional info; the key
    # MUST differ per graph shard or the block draw would reuse noise
    key = jax.random.fold_in(key, g)
    drawn = color_draw_mc(dg_l, values, weights, key, c, info, folded, modes)

    resample = (dg_l.cm_resample_ev[c] if sample_evidence
                else dg_l.cm_resample[c])
    start = c * B + g * Bl
    old = jax.lax.dynamic_slice(values, (start, 0), (Bl, NC))
    new = jnp.where(resample[:, None], drawn, old)

    if halo is None:
        # reassemble the whole color block across the graph axis (ICI)
        new_full = jax.lax.all_gather(new, "graph", axis=0, tiled=True)
        return jax.lax.dynamic_update_slice(values, new_full, (c * B, 0))

    # halo exchange: own slice written in place; only the nl/nr neighbor
    # slices any read window can touch are ppermute'd (nearest-neighbor ICI
    # traffic instead of a full all_gather).  Devices at the mesh edge have
    # no sender/receiver for some shifts: ppermute then yields zeros, which
    # land in the Bl scratch rows appended after the dummy tail.
    nl, nr = halo
    P_real = values.shape[0] - Bl
    values = jax.lax.dynamic_update_slice(values, new, (start, 0))
    for j in range(1, nl + 1):
        # owner h's slice travels j devices to the RIGHT: g receives g-j's
        recv = jax.lax.ppermute(new, "graph",
                                [(h, h + j) for h in range(n_graph - j)])
        tgt = jnp.where(g >= j, c * B + (g - j) * Bl, P_real)
        values = jax.lax.dynamic_update_slice(values, recv, (tgt, 0))
    for j in range(1, nr + 1):
        recv = jax.lax.ppermute(new, "graph",
                                [(h, h - j) for h in range(j, n_graph)])
        tgt = jnp.where(g + j < n_graph, c * B + (g + j) * Bl, P_real)
        values = jax.lax.dynamic_update_slice(values, recv, (tgt, 0))
    return values


def sweep_gs(dg_l, values, weights, key, sample_evidence: bool, info,
             n_graph: int, modes=("off", "off"), halo=None, folded=None):
    C = dg_l.cs_mask.shape[0]

    def body(c, vals):
        ck = jax.random.fold_in(key, c)
        return _sharded_color_step(dg_l, vals, weights, ck, c,
                                   sample_evidence, info, n_graph, modes,
                                   halo, folded)

    return jax.lax.fori_loop(0, C, body, values, unroll=(C <= 4))


def shard_device_graph(dg, mesh: Mesh):
    """device_put the DeviceGraph: cs_*/cm_* sharded over 'graph' on their
    B axis, everything else replicated."""
    specs = _dg_specs(dg)
    return type(dg)(*(
        jax.device_put(getattr(dg, n), NamedSharding(mesh, specs[n]))
        for n in dg._fields))


def _strip_factor_records(dg):
    """Replace the per-factor record arrays and pos_of_vid with 1-row
    placeholders before a graph-sharded run: the sweep never reads them
    (they serve the per-factor gradient / sparse-weight / output paths),
    but shard_map would REPLICATE them onto every device — at KBC scale
    that is tens of GB of wasted device memory (the 10^8-var attempt
    OOM'd the host exactly this way)."""
    A = dg.f_vids.shape[1]
    z = np.zeros
    return dg._replace(
        f_vids=z((1, A), np.int32), f_ispos=z((1, A), bool),
        f_eqpred=z((1, A), np.asarray(dg.f_eqpred).dtype),
        f_mask=z((1, A), bool),
        f_type=z(1, np.int8), f_wid=z(1, np.int32),
        f_feat=z(1, np.float32), f_arity=np.ones(1, np.int16),
        pos_of_vid=z(1, np.int32))


def _dg_specs(dg) -> dict:
    """Per-field PartitionSpec: cs_/cm_/ab_ streams shard their B axis and
    bd_ plans their tile axis over 'graph'; everything else (weights,
    factor records, metadata, disabled [C, 1] placeholders) replicates."""
    B = dg.cs_mask.shape[1]
    specs = {}
    for name in dg._fields:
        if (name.startswith(("cs_", "cm_", "ab_"))
                and getattr(dg, name).shape[1] == B) or (
                name.startswith("bd_") and getattr(dg, name).shape[1] > 1):
            # axis 1 is B (streams) or ntiles (banding plan) — both are
            # contiguous slices of the color block, so they co-shard
            specs[name] = P(None, "graph")
        else:
            specs[name] = P()
    return specs


def infer_gs(dg, weights, key, n_burn: int, n_sweeps: int, info,
             mesh: Mesh, chains_per_device: int,
             sample_evidence: bool = False, modes=None, halo="auto"):
    """Inference on a ("chains", "graph") mesh.

    Streams sharded over graph; values replicated per device with
    chains_per_device chains along the chains axis.  Tallies are psum'd
    over both axes.  Returns marginals [V, K] float32.

    halo: "auto" derives the partition-aware exchange plan from the banding
    windows (falls back to all_gather when not applicable); None forces the
    full per-color all_gather; an explicit (nl, nr) tuple is used as-is.

    The compiled block size must divide evenly: compile with
    ``compile_graph(g, align=8 * n_graph)``.
    """
    n_chains_ax = mesh.shape["chains"]
    n_graph = mesh.shape["graph"]
    # resolved OUTSIDE the traced region; NC here is chains per device
    if modes is None:
        modes = resolve_modes(info)
    chains_per_device = effective_chains(info, modes, chains_per_device,
                                         dg.var_card.shape[0])
    modes = demote_modes(modes, chains_per_device)
    B = dg.cs_mask.shape[1]
    if B % n_graph:
        raise ValueError(
            f"block size {B} not divisible by graph axis {n_graph}; "
            f"compile with align=8*{n_graph}")
    if halo == "auto":
        halo = halo_plan(jax.device_get(dg.bd_lo), jax.device_get(dg.bd_hi),
                         info.bounds, B, n_graph)

    pos_of_vid = dg.pos_of_vid
    if not info.has_sparse_cw:
        dg = _strip_factor_records(dg)
    cs_spec = _dg_specs(dg)
    dg_spec = type(dg)(*(cs_spec[n] for n in dg._fields))

    @partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(dg_spec, P(), P("chains")),
        out_specs=P(),
    )
    def run(dg_l, w, keys):
        from ..engine.multichain import prepare_fold

        key_l = keys[0]
        k_init, k_run = jax.random.split(key_l)
        vals = init_values_mc(dg_l, k_init, chains_per_device, info)
        folded = prepare_fold(dg_l, w, info, modes)   # local-shard fold
        Bl = B // n_graph
        P = vals.shape[0]
        if halo is not None:
            # Bl scratch rows absorb the mesh-edge devices' no-sender writes
            vals = jnp.pad(vals, ((0, Bl), (0, 0)))
        # the sweep's collectives make values 'varying' over graph; give the
        # scan carry that type from the start
        vals = jax.lax.pcast(vals, ("graph",), to="varying")

        K = info.max_card
        counts0 = jnp.tile(vals[:1, :1].astype(jnp.int32) * 0, (P, K))
        ks = jnp.arange(K, dtype=jnp.int32)
        if halo is not None:
            # stale-region safety: tallies count OWN rows only; the psum
            # over the graph axis then assembles disjoint contributions
            g_idx = jax.lax.axis_index("graph")
            r = jnp.arange(P - 1, dtype=jnp.int32)
            own = ((r % B) // Bl == g_idx)
            rowmask = jnp.concatenate([own, jnp.zeros((1,), bool)])[:, None]
        else:
            rowmask = True

        def body(carry, i):
            vals, counts = carry
            kk = jax.random.fold_in(k_run, i)
            vals = sweep_gs(dg_l, vals, w, kk, sample_evidence, info,
                            n_graph, modes, halo, folded)
            tally = jnp.where(i >= n_burn, 1, 0)
            onehot = (vals[:P].astype(jnp.int32)[:, None, :]
                      == ks[None, :, None])
            oh = jnp.sum(onehot, axis=-1, dtype=jnp.int32)
            counts = counts + tally * jnp.where(rowmask, oh, 0)
            return (vals, counts), None

        (vals, counts), _ = jax.lax.scan(
            body, (vals, counts0), jnp.arange(n_burn + n_sweeps))
        # reduce over BOTH axes: chains pools tallies; over graph the halo
        # contributions are disjoint (own rows), while all_gather copies are
        # identical and compensated in the denominator
        counts = jax.lax.psum(counts, ("chains", "graph"))
        return counts

    keys = jax.random.split(key, n_chains_ax)
    counts = run(dg, weights, keys)
    total = n_sweeps * chains_per_device * n_chains_ax * (
        1 if halo is not None else n_graph)
    marg = counts[pos_of_vid].astype(jnp.float32) / jnp.float32(total)
    return marg


def learn_gs(dg, weights, key, cfg, info, mesh: Mesh,
             chains_per_device: int, modes=None, halo="auto"):
    """Contrastive-SGD learning on the ("chains", "graph") mesh — weight
    learning for graphs whose streams exceed one chip's HBM.

    Both worlds sweep with sweep_gs (halo exchange included); the gradient
    is evaluated on each shard's LOCAL streams via the owner-deduped cs
    path (owner records are disjoint across graph shards), then psum'd over
    'graph' and pmean'd over 'chains' — same update rule and fixed points
    as engine.multichain.learn_mc (SURVEY.md §2c).  Returns final weights
    (replicated) as a host array."""
    from ..engine.learn import apply_update
    from ..engine.multichain import prepare_fold

    if info.has_sparse_cw:
        raise NotImplementedError(
            "graph-sharded learning does not support sparse "
            "per-combination weights yet; use parallel.chains.learn_sharded")
    n_chains_ax = mesh.shape["chains"]
    n_graph = mesh.shape["graph"]
    if modes is None:
        modes = resolve_modes(info)
    chains_per_device = effective_chains(info, modes, chains_per_device,
                                         dg.var_card.shape[0], n_worlds=2)
    modes = demote_modes(modes, chains_per_device)
    B = dg.cs_mask.shape[1]
    if B % n_graph:
        raise ValueError(
            f"block size {B} not divisible by graph axis {n_graph}; "
            f"compile with align=8*{n_graph}")
    if halo == "auto":
        halo = halo_plan(jax.device_get(dg.bd_lo), jax.device_get(dg.bd_hi),
                         info.bounds, B, n_graph)

    dg = _strip_factor_records(dg)   # learn_gs guards has_sparse_cw above
    cs_spec = _dg_specs(dg)
    dg_spec = type(dg)(*(cs_spec[n] for n in dg._fields))

    @partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(dg_spec, P(), P("chains")),
        out_specs=P(),
    )
    def run(dg_l, w0, keys):
        g = jax.lax.axis_index("graph")
        Bl = B // n_graph
        key_l = keys[0]
        k0, k1, kscan = jax.random.split(key_l, 3)
        v_ev = init_values_mc(dg_l, k0, chains_per_device, info)
        v_free = init_values_mc(dg_l, k1, chains_per_device, info)
        if halo is not None:
            v_ev = jnp.pad(v_ev, ((0, Bl), (0, 0)))
            v_free = jnp.pad(v_free, ((0, Bl), (0, 0)))
        v_ev = jax.lax.pcast(v_ev, ("graph",), to="varying")
        v_free = jax.lax.pcast(v_free, ("graph",), to="varying")

        def epoch(carry, i):
            w, v_ev, v_free, alpha = carry
            ki = jax.random.fold_in(kscan, i)
            folded = prepare_fold(dg_l, w, info, modes)

            def one_sweep(cwv, j):
                v_ev, v_free = cwv
                kj = jax.random.fold_in(ki, j)
                v_ev = sweep_gs(dg_l, v_ev, w, jax.random.fold_in(kj, 0),
                                False, info, n_graph, modes, halo, folded)
                v_free = sweep_gs(dg_l, v_free, w, jax.random.fold_in(kj, 1),
                                  True, info, n_graph, modes, halo, folded)
                return (v_ev, v_free), None

            (v_ev, v_free), _ = jax.lax.scan(
                one_sweep, (v_ev, v_free),
                jnp.arange(cfg.n_sweeps_per_epoch))
            grad = mc_weight_gradient_cs(
                dg_l, v_ev, v_free, cfg.learn_non_evidence, info, modes,
                global_B=B, row_origin=g * Bl)
            grad = jax.lax.psum(grad, "graph")
            grad = jax.lax.pmean(grad, "chains")
            w = apply_update(w, grad, dg_l.w_fixed, alpha,
                             cfg.regularization, cfg.reg_param)
            return (w, v_ev, v_free, alpha * cfg.diminish), None

        init = (jnp.asarray(w0, jnp.float32), v_ev, v_free,
                jnp.float32(cfg.stepsize))
        (w, _, _, _), _ = jax.lax.scan(epoch, init,
                                       jnp.arange(cfg.n_epochs))
        # the weight trajectory is graph-invariant (psum'd grads) but the
        # type system saw varying inputs; reduce to prove replication
        return jax.lax.pmean(w, ("chains", "graph"))

    keys = jax.random.split(key, n_chains_ax)
    return run(dg, weights, keys)
