"""Chains-last multi-chain Gibbs engine — the TPU fast path.

The values-table gather dominates the sweep (~7.6 ns/index on TPU — issue-
rate bound, not bandwidth bound).  Storing the assignment vector CHAINS-LAST
as int8 ``values[P, NC]`` makes one index fetch all chains' values in one
row: measured on TPU v5 lite, a 1.3M-index gather costs the same for NC=32
as NC=1, and int8 rows are ~4x faster than int32 (see bench notes in the
round-1 log).  Every downstream tensor carries the trailing chain axis; the
candidate-substitution literals are chain-independent and broadcast.

This is the TPU-native replacement for both the reference's thread
parallelism and its single shared world (SURVEY.md §2 parallelism table):
NC independent chains per chip, pooled tallies.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from .. import format_spec as fs
from ..ops.weights import expand_wf, segment_reduce
from .potentials import eval_phi

NEG_INF = jnp.float32(-1e30)
LANE = 128  # TPU lane width: the Pallas kernels need NC % LANE == 0
# gradient mechanism (read ONCE at import, like ops.weights SMALL_W —
# it participates in trace-time branching).  "auto" = the moment-factored
# fused kernel (ops/grad.py) wherever it applies: the round-5 same-day
# A/B on silicon measured 7.58e9 learning updates/s for the kernel vs
# 2.82e9 for the chunked XLA path (LEARN_PROFILE_r5.json — the round-4
# v1 kernel lost 2.2x on per-plane VPU phi; v2 removed it).
# SAMPLER_TPU_GRAD=kernel|xla overrides.
GRAD_MODE = os.environ.get("SAMPLER_TPU_GRAD", "auto").lower()
# multilinear delta-φ path for boolean arity<=3 tiers without a fused
# Pallas step (compile.py dm_* streams): "on" (default) | "off" — the
# kill switch exists because the path changes float rounding of the
# logits (draws can differ from the counts path on coin-flip margins,
# never in distribution).  Read ONCE at import (trace-time branching,
# same contract as GRAD_MODE).
DELTAM_MODE = os.environ.get("SAMPLER_TPU_DELTAM", "on").lower()


def values_dtype(info):
    return jnp.int8 if info.max_card <= 127 else jnp.int32


def resolve_modes(info, backend: str | None = None) -> tuple:
    """Resolve the (band, fused) kernel mechanisms for this graph and
    environment — concrete strings, never 'auto'.

    MUST be resolved OUTSIDE jit (the public entry points below do) so the
    choice participates in the jit cache key: env vars read during tracing
    go stale when the env later changes, because jit cache keys ignore the
    environment (the round-1 dispatch bug)."""
    from ..ops.banded import resolve_band
    from ..ops.fused import resolve_fused

    band = resolve_band(info, backend)
    return (band, resolve_fused(info, band, backend))


def demote_modes(modes, n_chains: int) -> tuple:
    """Demote native-Pallas mechanisms when the trailing chain axis is not
    lane-aligned: Mosaic requires the window DMA's minor dim (NC) to be a
    multiple of 128, so small-chain configs fall back to the XLA paths.
    Interpret mode has no such constraint (it is plain XLA underneath).

    Entry points avoid ever hitting this demotion by raising the chain
    count first (effective_chains below); this stays as the safety net for
    direct kernel calls with misaligned values arrays."""
    band, fused = modes
    if n_chains % LANE:
        if band == "pallas":
            band = "off"
        if fused == "pallas":
            fused = "off"
    return (band, fused)


def effective_chains(info, modes, n_chains: int, n_positions: int,
                     n_worlds: int = 1) -> int:
    """Round the chain count up to the TPU lane width when that keeps the
    Pallas fast paths engaged (demote_modes would otherwise silently turn
    them off for NC % 128 != 0 — including the dw-default ``--n_chains 1``).

    The extra chains are REAL chains: independent worlds pooled into the
    same tallies / chain-averaged gradients, so the raise only adds
    statistical power — and a lane-aligned kernel's wall-clock is the same
    for 1 chain as for 128 (the MXU/VPU lane axis is 128 wide either way),
    so per-sweep cost does not grow.  Skipped when the padded worlds would
    blow the values-array memory budget (huge P), where the caller keeps
    the requested count and demote_modes falls back to the XLA paths.
    """
    if n_chains % LANE == 0 or "pallas" not in tuple(modes):
        return n_chains
    new = ((n_chains + LANE - 1) // LANE) * LANE
    budget = int(os.environ.get("SAMPLER_TPU_AUTOCHAIN_BYTES", 1 << 30))
    bytes_per = 1 if info.max_card <= 127 else 4
    if n_positions * new * n_worlds * bytes_per > budget:
        return n_chains
    return new


@partial(jax.jit, static_argnames=("n_chains", "dt"))
def _init_values_random(var_init, var_card, var_role, key, n_chains, dt):
    # jitted so XLA fuses bits -> modulo -> select into the single int8
    # output: the eager version materialized an int32 [P, NC] randint temp
    # (16 GB at 4e6 vars x 1024 chains — the r5 KBC wide-chain OOM was
    # HERE, not in the sweep)
    P = var_card.shape[0]
    base = jnp.broadcast_to(var_init.astype(dt)[:, None], (P, n_chains))
    r = jax.random.randint(key, (P, n_chains), 0, 1 << 30, dtype=jnp.int32)
    rand_vals = (r % jnp.maximum(var_card, 1)[:, None]).astype(dt)
    return jnp.where((var_role == 0)[:, None], rand_vals, base)


def init_values_mc(dg, key, n_chains: int, info, random_init: bool = True):
    """Initial worlds [P, NC]: evidence at labels, query random per chain."""
    P = dg.var_card.shape[0]
    dt = values_dtype(info)
    if not random_init:
        return jnp.broadcast_to(dg.var_init.astype(dt)[:, None],
                                (P, n_chains))
    return _init_values_random(dg.var_init, dg.var_card, dg.var_role, key,
                               n_chains, dt)


def _eval_phi_ax2(lits, mask, f_type, f_arity, present, hmask=None):
    """eval_phi with the arity axis at -2 (chain axis trailing).

    Shape contract: lits [.., A, NC]; mask broadcastable to lits;
    f_type / f_arity have rank == lits.ndim - 1 (every lits axis except A,
    with broadcast-1 dims where needed, e.g. [B, D, 1, 1] for
    lits [B, D, K, A, NC] or [F, 1] for lits [F, A, NC]).
    hmask: optional bool broadcastable to lits marking the HEAD slot —
    required when the A axis is slot-permuted (compile.py own-last layout);
    None derives it as original slot arity-1.
    Returns float32 [.., NC].
    """
    if present is None:
        present = fs.ALL_FACTOR_FUNCS
    present = tuple(present)
    lits = lits & mask
    n = f_arity
    nlit = jnp.sum(lits, axis=-2).astype(jnp.int32)
    f32 = jnp.float32

    if _need_head(present):
        if hmask is None:
            # head literal by mask-reduce — take_along_axis lowers to scalar
            # code on TPU (~70x slower; round-1 bisect)
            A = lits.shape[-2]
            iota_a = jax.lax.broadcasted_iota(jnp.int32, (A, 1), 0)
            hmask = iota_a == (n - 1)[..., None]
        head = jnp.any(lits & hmask, axis=-2)
    else:
        head = None
    return _phi_from_counts(nlit, head, n, f_type, present)


def _need_head(present) -> bool:
    return any(t in present for t in (
        fs.FUNC_ISTRUE, fs.FUNC_IMPLY_MLN, fs.FUNC_LINEAR, fs.FUNC_RATIO,
        fs.FUNC_LOGICAL))


def _phi_from_counts(nlit, head, n, f_type, present):
    """φ from sufficient statistics: nlit = # true literals, head = head
    literal (None if no present type needs it), n = true arity.
    Branchless over `present`; all args broadcast together."""
    f32 = jnp.float32
    if head is not None:
        headi = head.astype(jnp.int32)
        nbody = nlit - headi
        n_body = jnp.maximum(n - 1, 0)

    def variant(t):
        if t in (fs.FUNC_AND, fs.FUNC_AND_CATEGORICAL, fs.FUNC_IMPLY_NATURAL):
            return (nlit == n).astype(f32)
        if t == fs.FUNC_OR:
            return (nlit > 0).astype(f32)
        if t == fs.FUNC_EQUAL:
            return ((nlit == 0) | (nlit == n)).astype(f32)
        if t == fs.FUNC_ISTRUE:
            return head.astype(f32)
        if t == fs.FUNC_IMPLY_MLN:
            return jnp.where(nbody < n_body, 1.0, head.astype(f32))
        lin = jnp.where(head, n_body, n_body - nbody).astype(f32)
        lin = jnp.where(n == 1, head.astype(f32), lin)
        if t == fs.FUNC_LINEAR:
            return lin
        if t == fs.FUNC_RATIO:
            return jnp.log1p(lin)
        if t == fs.FUNC_LOGICAL:
            return (lin > 0).astype(f32)
        raise ValueError(f"unknown factor function type {t}")

    if len(present) == 1:
        return variant(present[0])
    conds = [f_type == t for t in present]
    vals = [variant(t) for t in present]
    zero = jnp.zeros_like(vals[0])
    return jnp.select(conds, vals, default=zero)


def _tc(arr, c, shape):
    """Color-``c`` slice of a tier stream in its logical ``shape``.

    At-rest storage is FLAT 1-D (compile.to_device) so nothing tile-pads
    in HBM; slicing happens in flat space (start = c * prod(shape)) and
    the reshape fuses into consumers.  Graph-sharded local slices arrive
    per-color 2-D [C, N] (compile.tiers_2d); legacy multi-D arrays index
    their color axis directly.  ``c`` may be traced (fori_loop over
    colors)."""
    n = 1
    for s in shape:
        n *= s
    if arr.ndim == 1:
        return jax.lax.dynamic_slice(arr, (c * n,), (n,)).reshape(shape)
    if arr.ndim == 2 and arr.shape[1] == n:
        return jax.lax.dynamic_slice(
            arr, (c, 0), (1, n))[0].reshape(shape)
    return arr[c]


def tier_modes(ti, modes) -> tuple:
    """Per-tier mechanism gating: a tier without a banding plan runs the
    plain gather even when the graph-level mode is Pallas; a tier without
    an affine plan never routes to the fused kernel."""
    band, fused = modes
    if ti.band_w <= 0:
        band = "off"
    if not (ti.affine2 or ti.affinek or getattr(ti, "fusedm", False)):
        fused = "off"
    return band, fused


def _nbr_lits(ts, ti, values, c, info, modes):
    """Gather + literal-ize the NEIGHBOR slots of tier ``ts``, color ``c``.

    Returns (nbr_lit [B, D, A-1, NC] bool, pos [B,D,A], eq [B,D,A],
    vals [B, D, A-1, NC] raw gathered values — None on unary tiers).
    Only the leading A-1 (own-last-permuted) slots are gathered — the own
    slots' literals come from the candidate, so fetching them would waste
    gather issue slots (the sweep's dominant cost).
    """
    from ..compile import tier_geom

    B, D, A = tier_geom(ts, ti, info.n_colors)
    A1 = A - 1
    pos = _tc(ts.cs_pos, c, (B, D, A))
    eq = None if info.all_boolean else _tc(ts.cs_eq, c, (B, D, A))
    dt = values.dtype
    NC = values.shape[-1]
    if A1 == 0:                       # unary-only tier: nothing to gather
        return jnp.zeros((B, D, 0, NC), bool), pos, eq, None
    nbr = _tc(ts.cs_nbr, c, (B, D, A1))
    band = tier_modes(ti, modes)[0]
    if band != "off":
        # MXU path: gather as banded one-hot matmul (ops/banded.py)
        from ..ops.banded import banded_gather, banded_gather_multi

        if ti.band_k >= 2:
            vals = banded_gather_multi(values, ts.bd_rnbr[c],
                                       ts.bd_start[c], ti.band_w,
                                       ti.band_k, band)
        else:
            ntiles = B // ti.band_tb
            nbr2 = nbr.reshape(ntiles, ti.band_tb * D * A1)
            vals = banded_gather(values, nbr2, ts.bd_start[c], ti.band_w,
                                 band)
        vals = vals.reshape(B, D, A1, NC)
    else:
        # flat-index row gather: a [B, D, A1]-shaped index operand would
        # materialize (8, 128)-tile-padded (43-128x), which is what OOM'd
        # the round-4 1e6-var KBC run; a 1-D index operand has no minor
        # dim to pad and the output reshape fuses into the literal compare
        vals = values[nbr.reshape(-1)].reshape(B, D, A1, NC)
    if eq is None:
        nbr_lit = (vals == jnp.asarray(1, dt)) == pos[..., :A1, None]
    else:
        nbr_lit = (vals == eq[..., :A1, None].astype(dt)) \
            == pos[..., :A1, None]
    return nbr_lit, pos, eq, vals


def color_logits_mc(dg, ts, ti, values, weights, c, info,
                    modes=("off", "off")):
    """Conditional log-potentials [B, K, NC] for tier ``ts``, color ``c``."""
    from ..compile import tier_geom

    K = info.max_card
    B, D, A = tier_geom(ts, ti, info.n_colors)
    nbr_lit, pos, eq, vals_raw = _nbr_lits(ts, ti, values, c, info, modes)
    A1 = A - 1
    msk = _tc(ts.cs_mask, c, (B, D, A))
    ks = jax.lax.broadcasted_iota(jnp.int32, (K,), 0)

    if eq is None:
        cand_lit = (ks[None, None, :, None] == 1) == pos[:, :, None, :]
    else:
        cand_lit = (ks[None, None, :, None] == eq[:, :, None, :]) \
            == pos[:, :, None, :]                      # [B, D, K, A]

    is_mine = _tc(ts.cs_ismine, c, (B, D, A))          # [B, D, A] streamed

    # [B, D, K, A, NC]: candidate at own slots, gathered at neighbor slots.
    # Slot A-1 is always own (own-last permutation), so only the leading
    # A-1 slots select between candidate and neighbor.
    NC = values.shape[-1]
    lit_head = jnp.where(is_mine[:, :, None, :A1, None],
                         cand_lit[:, :, :, :A1, None],
                         nbr_lit[:, :, None, :, :])
    lit_last = jnp.broadcast_to(cand_lit[:, :, :, A1:, None],
                                lit_head.shape[:3] + (1, NC))
    lit_k = jnp.concatenate([lit_head, lit_last], axis=-2)

    present = ti.present_funcs or info.present_funcs
    cs_feat_c = _tc(ts.cs_feat, c, (B, D))
    phi = _eval_phi_ax2(
        lit_k,
        msk[:, :, None, :, None],
        _tc(ts.cs_type, c, (B, D))[:, :, None, None],
        _tc(ts.cs_arity, c, (B, D))[:, :, None, None],
        present,
        hmask=_tc(ts.cs_hmask, c, (B, D, A))[:, :, None, :, None],
    )                                                  # [B, D, K, NC]
    wf = expand_wf(weights, _tc(ts.cs_wid, c, (B, D)),
                   cs_feat_c)[:, :, None, None]
    contrib = wf * phi
    if info.has_sparse_cw:
        # sparse per-combination weights: the incident factor contributes
        # weights[table[m]] where m = base + Σ_slot stride·value (candidate
        # at own slots, gathered value at neighbor slots); table misses
        # land on the reserved zero weight, so no mask is needed.  Missing
        # candidate rows (k >= card) are killed later by cm_kmask.
        stride = _tc(ts.cs_cwstride, c, (B, D, A))     # [B, D, A]
        s_own = jnp.sum(jnp.where(is_mine, stride, 0),
                        axis=-1).astype(jnp.int32)     # [B, D]
        if vals_raw is None:
            nbr_sum = jnp.zeros(stride.shape[:2] + (NC,), jnp.int32)
        else:
            nbr_sum = jnp.sum(
                stride[..., :A1, None].astype(jnp.int32)
                * vals_raw.astype(jnp.int32), axis=-2)  # [B, D, NC]
        T = dg.cwt_wid.shape[0]
        m = (_tc(ts.cs_cwbase, c, (B, D))[:, :, None, None]
             + s_own[:, :, None, None] * ks[None, None, :, None]
             + nbr_sum[:, :, None, :])
        swid = dg.cwt_wid[jnp.clip(m, 0, T - 1)]
        sc = expand_wf(weights, swid) * cs_feat_c[:, :, None, None]
        contrib = jnp.where(
            _tc(ts.cs_issparse, c, (B, D))[:, :, None, None], sc, contrib)
    return jnp.sum(contrib, axis=1)                    # [B, K, NC]


def color_delta_bool(ts, ti, values, weights, c, info,
                     modes=("off", "off")):
    """Boolean fast path: logit(v=1) − logit(v=0), [B, NC].

    Skips the K-candidate axis of the general path entirely: the candidate
    contribution at own slots reduces to compile-time literal counts
    (k=1 → own literal == ispos; k=0 → == ¬ispos), so φ(1) − φ(0) needs one
    [B, D, NC] evaluation instead of [B, D, K, A, NC].  Paired with a
    uniform-sigmoid draw this is distribution-identical to Gumbel-argmax
    over two candidates.
    """
    from ..compile import tier_geom

    B, D, A = tier_geom(ts, ti, info.n_colors)
    nbr_lit, pos, _, _ = _nbr_lits(ts, ti, values, c, info, modes)
    msk = _tc(ts.cs_mask, c, (B, D, A))
    ismine = _tc(ts.cs_ismine, c, (B, D, A))
    A1 = nbr_lit.shape[-2]
    present = ti.present_funcs or info.present_funcs

    nbrm = (msk & ~ismine)[..., :A1, None]
    nl = jnp.sum(nbr_lit & nbrm, axis=-2).astype(jnp.int32)   # [B, D, NC]
    ownm = ismine & msk
    o1 = jnp.sum(ownm & pos, axis=-1).astype(jnp.int32)[..., None]  # [B,D,1]
    o0 = jnp.sum(ownm, axis=-1).astype(jnp.int32)[..., None] - o1
    n = _tc(ts.cs_arity, c, (B, D))[..., None]

    if _need_head(present):
        hmask = _tc(ts.cs_hmask, c, (B, D, A))
        head_own = jnp.any(hmask & ismine, axis=-1)[..., None]
        headpos = jnp.any(hmask & ismine & pos, axis=-1)[..., None]
        hl = jnp.any(nbr_lit & (hmask & ~ismine)[..., :A1, None], axis=-2)
        head1 = jnp.where(head_own, headpos, hl)
        head0 = jnp.where(head_own, ~headpos, hl)
    else:
        head1 = head0 = None

    f_type = _tc(ts.cs_type, c, (B, D))[..., None]
    phi1 = _phi_from_counts(nl + o1, head1, n, f_type, present)
    phi0 = _phi_from_counts(nl + o0, head0, n, f_type, present)
    wf = expand_wf(weights, _tc(ts.cs_wid, c, (B, D)),
                   _tc(ts.cs_feat, c, (B, D)))[..., None]
    return jnp.sum(wf * (phi1 - phi0), axis=1)                # [B, NC]


def color_delta_multilin(ts, ti, values, c, info, folded_t, modes):
    """Boolean delta-logit via the compile-time multilinear φ fold:
    delta[b] = base[b] + Σ_d (b1·n1 + b2·n2 + bx·n1·n2), with
    (base, b1, b2, bx) = fold_deltam's weight-scaled dm_* streams.

    Replaces color_delta_bool's ~40-op counts/select evaluation with ~6
    elementwise ops per record — the measured per-chain VPU bound of the
    KBC class (round-5 probe: 0.98 ns/var/chain, ~30x the HBM floor).
    Exact in exact arithmetic (multilinear interpolation on binary
    corners is exact for every φ, log1p included); differs from the
    counts path only in float rounding order."""
    from ..compile import tier_geom

    B, D, A = tier_geom(ts, ti, info.n_colors)
    A1 = A - 1
    base_f, b1_f, b2_f, bx_f = folded_t
    nbr = _tc(ts.cs_nbr, c, (B, D, A1))
    NC = values.shape[-1]
    band = tier_modes(ti, modes)[0]
    if band != "off":
        from ..ops.banded import banded_gather, banded_gather_multi

        if ti.band_k >= 2:
            vals = banded_gather_multi(values, ts.bd_rnbr[c],
                                       ts.bd_start[c], ti.band_w,
                                       ti.band_k, band)
        else:
            ntiles = B // ti.band_tb
            vals = banded_gather(values,
                                 nbr.reshape(ntiles, ti.band_tb * D * A1),
                                 ts.bd_start[c], ti.band_w, band)
        vals = vals.reshape(B, D, A1, NC)
    else:
        vals = values[nbr.reshape(-1)].reshape(B, D, A1, NC)
    f32 = jnp.float32
    base = _tc(base_f, c, (B,))[:, None]
    n1 = vals[:, :, 0, :].astype(f32)
    contrib = _tc(b1_f, c, (B, D))[..., None] * n1
    if A1 >= 2 and b2_f is not None:
        n2 = vals[:, :, 1, :].astype(f32)
        contrib = contrib + _tc(b2_f, c, (B, D))[..., None] * n2 \
            + _tc(bx_f, c, (B, D))[..., None] * (n1 * n2)
    return base + jnp.sum(contrib, axis=1)             # [B, NC]


def prepare_fold(dg, weights, info, modes):
    """Per-weights prep for the fused affine color step and the
    multilinear delta path (ops/fused.py).

    Returns a per-tier tuple of folded coefficient streams (None entries
    for tiers no folded path covers), or None when nothing folds.  Called
    OUTSIDE the sweep loops — the fold includes a weights gather that
    must be amortized over many sweeps."""
    from ..ops.fused import (fold_affine, fold_affine_cat, fold_deltam,
                             fold_deltam_tiles)

    use_fused = modes[1] != "off" and (
        info.affine2 or info.affinek or getattr(info, "fusedm", False))
    has_dm = DELTAM_MODE != "off" and any(
        getattr(ti, "deltam", False) for ti in info.tiers)
    if not (use_fused or has_dm):
        return None
    w = jnp.asarray(weights, jnp.float32)

    def fold_one(ts, ti):
        if ti.affine2 and use_fused:
            return fold_affine(ts, ti, info.n_colors, w)
        if ti.affinek and use_fused:
            return fold_affine_cat(ts, ti, info.n_colors, w)
        if getattr(ti, "fusedm", False) and use_fused \
                and DELTAM_MODE != "off":
            # kernel block layout; color_draw_tier routes to fused_dm_draw
            # under the SAME condition, so layouts can never cross paths
            return fold_deltam_tiles(ts, ti, info.n_colors, w)
        if ti.deltam and DELTAM_MODE != "off":
            return fold_deltam(ts, ti, info.n_colors, w)
        return None

    return tuple(fold_one(ts, ti) for ts, ti in zip(dg.tiers, info.tiers))


def hub_color_draw(dg, ts, ti, values, weights, key, c, info, modes,
                   folded_t=None, psum_axis=None):
    """Draw for a chunked-CSR hub tier: evaluate the [C, M, G, A] chunk
    streams with the SAME dense-tier machinery (a chunk plays the role of
    a row with D=G incident slots), then segment-sum the per-chunk
    contributions onto the owning rows (hb_row; pad chunks land in the
    dropped dummy segment).  Replaces the reference's per-variable CSR
    walk for power-law head variables (SURVEY.md §3.2, §7 hard-part 2).

    Under graph sharding (``psum_axis``) each device holds a contiguous
    1/n run of CHUNKS (owner-disjoint per factor, but a row's chunks may
    span devices): the local segment-sum yields partial row sums over the
    FULL tier row range, combined with one psum — the caller then slices
    its own rows.  cm_kmask shards by ROWS, so the full-range mask is
    rebuilt here from var_card instead."""
    Bh = ti.block
    row = ts.hb_row[c]                                 # [M] (local chunks)
    if info.all_boolean and info.max_card == 2:
        if ti.deltam and folded_t is not None:
            dchunk = color_delta_multilin(ts, ti, values, c, info,
                                          folded_t, modes)
        else:
            dchunk = color_delta_bool(ts, ti, values, weights, c, info,
                                      modes)
        delta = jax.ops.segment_sum(dchunk, row, num_segments=Bh + 1)[:Bh]
        if psum_axis is not None:
            delta = jax.lax.psum(delta, psum_axis)
        u = jax.random.uniform(key, delta.shape, dtype=delta.dtype)
        return (u < jax.nn.sigmoid(delta)).astype(values.dtype)
    logits = color_logits_mc(dg, ts, ti, values, weights, c, info, modes)
    logits = jax.ops.segment_sum(logits, row, num_segments=Bh + 1)[:Bh]
    if psum_axis is not None:
        logits = jax.lax.psum(logits, psum_axis)
        # full-range K mask from the (replicated) per-position cardinality
        B_all = info.block_size
        card = jax.lax.dynamic_slice(dg.var_card, (c * B_all + ti.off,),
                                     (Bh,))
        kmask = jnp.where(jnp.arange(info.max_card)[None, :]
                          < card[:, None], 0.0, -1e30)
    else:
        kmask = _tc(ts.cm_kmask, c, (Bh, info.max_card))
    masked = logits + kmask[:, :, None]
    g = jax.random.gumbel(key, masked.shape, dtype=masked.dtype)
    return jnp.argmax(masked + g, axis=1).astype(values.dtype)


def color_draw_tier(dg, ts, ti, values, weights, key, c, info,
                    folded_t=None, modes=("off", "off")):
    """Draw new candidate values [B_t, NC] for one tier of color ``c``."""
    if ti.hub:
        return hub_color_draw(dg, ts, ti, values, weights, key, c, info,
                              modes, folded_t)
    if folded_t is not None and tier_modes(ti, modes)[1] != "off":
        seed = jax.lax.bitcast_convert_type(key, jnp.int32).reshape(-1)[:2]
        D = ti.degree
        if ti.affine2:
            from ..ops.fused import fused_color_draw

            # full streams + the color as a scalar prefetch: slicing
            # [C, nt, R] per color copied the whole stream once per color
            # step (round-5 layout fix)
            return fused_color_draw(values, ts.bd_nbr, ts.bd_start[c],
                                    folded_t[0], folded_t[1], c, seed,
                                    ti.band_w, ti.band_tb, D,
                                    interpret=(modes[1] == "interpret"))
        if getattr(ti, "fusedm", False):
            from ..ops.fused import fused_dm_draw

            base, b1, b2, bx = folded_t        # fold_deltam_tiles layout
            return fused_dm_draw(values, ts.bd_dmnbr, ts.bd_start[c],
                                 base, b1, b2, bx, c, seed,
                                 ti.band_w, ti.band_tb, D, ti.arity - 1,
                                 ti.band_k,
                                 interpret=(modes[1] == "interpret"))
        from ..ops.fused import fused_cat_draw

        K = info.max_card
        TB = ti.band_tb
        return fused_cat_draw(values, ts.bd_nbr, ts.bd_start[c],
                              ts.bd_eqo, ts.bd_eqn,
                              folded_t[0], folded_t[1], folded_t[2], c,
                              seed, ti.band_w, TB, D, K,
                              interpret=(modes[1] == "interpret"))
    if info.all_boolean and info.max_card == 2:
        if ti.deltam and folded_t is not None:
            delta = color_delta_multilin(ts, ti, values, c, info, folded_t,
                                         modes)
        else:
            delta = color_delta_bool(ts, ti, values, weights, c, info,
                                     modes)
        u = jax.random.uniform(key, delta.shape, dtype=delta.dtype)
        return (u < jax.nn.sigmoid(delta)).astype(values.dtype)
    logits = color_logits_mc(dg, ts, ti, values, weights, c, info, modes)
    masked = logits + _tc(ts.cm_kmask, c,
                          (logits.shape[0], info.max_card))[:, :, None]
    g = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    return jnp.argmax(masked + g, axis=1).astype(values.dtype)


def color_step_mc(dg, values, weights, key, c, sample_evidence: bool, info,
                  folded=None, modes=("off", "off")):
    """Resample color ``c`` in all chains; returns updated values [P, NC].

    Loops the (static, <= 4) degree tiers; tiers of one color share no
    factor (they are same-color variables), so sequential tier updates are
    exactly the simultaneous block update.  Single-tier graphs keep the
    pre-tier RNG stream bit-for-bit (no extra key fold)."""
    B = info.block_size
    NC = values.shape[1]
    if folded is None:
        folded = (None,) * len(dg.tiers)
    multi = len(dg.tiers) > 1
    for t, (ts, ti) in enumerate(zip(dg.tiers, info.tiers)):
        kt = jax.random.fold_in(key, t) if multi else key
        drawn = color_draw_tier(dg, ts, ti, values, weights, kt, c, info,
                                folded[t], modes)
        resample = (ts.cm_resample_ev[c] if sample_evidence
                    else ts.cm_resample[c])
        start = c * B + ti.off
        old = jax.lax.dynamic_slice(values, (start, 0), (ti.block, NC))
        new = jnp.where(resample[:, None], drawn, old)
        values = jax.lax.dynamic_update_slice(values, new, (start, 0))
    return values


def sweep_mc(dg, values, weights, key, sample_evidence: bool, info,
             folded=None, modes=None):
    if modes is None:
        modes = resolve_modes(info)
    C = info.n_colors

    def body(c, vals):
        ck = jax.random.fold_in(key, c)
        return color_step_mc(dg, vals, weights, ck, c, sample_evidence, info,
                             folded, modes)

    return jax.lax.fori_loop(0, C, body, values, unroll=(C <= 4))


@partial(jax.jit,
         static_argnames=("n_sweeps", "sample_evidence", "info", "modes"))
def _run_sweeps_mc(dg, values, weights, key, n_sweeps: int,
                   sample_evidence: bool, info, modes):
    folded = prepare_fold(dg, weights, info, modes)

    def body(vals, i):
        k = jax.random.fold_in(key, i)
        return sweep_mc(dg, vals, weights, k, sample_evidence, info,
                        folded, modes), None

    return jax.lax.scan(body, values, jnp.arange(n_sweeps))[0]


def run_sweeps_mc(dg, values, weights, key, n_sweeps: int,
                  sample_evidence: bool, info, modes=None):
    if modes is None:
        modes = resolve_modes(info)
    modes = demote_modes(modes, values.shape[-1])
    return _run_sweeps_mc(dg, values, weights, key, n_sweeps,
                          sample_evidence, info, modes)


@partial(jax.jit,
         static_argnames=("n_sweeps", "sample_evidence", "info", "modes"),
         donate_argnums=(1,))
def _run_inference_mc(dg, values, weights, key, n_sweeps: int,
                      sample_evidence: bool, info, modes):
    """Returns (values [P,NC], counts flat [K*P] row-major [K, P],
    pooled over chains)."""
    P = dg.var_card.shape[0]
    K = info.max_card
    # counts live FLAT [K*P] (row-major [K, P]): any 2-D counts buffer
    # tile-pads whichever dim lands minor to (8, 128) — K-minor pads 64x
    # at K=2 (a 12.5 GB allocation at 2.6e7 vars, which OOM'd the 5120^2
    # scale run twice: XLA's layout assignment even undid an explicit
    # [K, P] logical transpose).  A 1-D buffer has no minor dim to pad.
    # The zero init derives from `values` so its varying-axis type matches
    # under shard_map (plain zeros would be 'unvarying' and break scan).
    counts0 = jnp.tile(values[:1, :1].astype(jnp.int32) * 0,
                       (K * P,)).reshape(K * P)
    # compare in the values dtype: vals.astype(int32) materialized a full
    # [P, NC] s32 temp of the same size
    ks = jnp.arange(K, dtype=values.dtype)
    folded = prepare_fold(dg, weights, info, modes)

    def body(carry, i):
        vals, counts = carry
        k = jax.random.fold_in(key, i)
        vals = sweep_mc(dg, vals, weights, k, sample_evidence, info, folded,
                        modes)
        if K <= 16:
            # per-candidate 1-D sums: even a reshaped 2-D reduce output
            # materializes as a K-minor padded [K, P] temp (64x at K=2)
            counts = counts + jnp.concatenate(
                [jnp.sum(vals == jnp.asarray(k_, vals.dtype), axis=-1,
                         dtype=jnp.int32) for k_ in range(K)])
        else:
            onehot = (vals[None, :, :] == ks[:, None, None])
            counts = counts + jnp.sum(onehot, axis=-1,
                                      dtype=jnp.int32).reshape(K * P)
        return (vals, counts), None

    (values, counts), _ = jax.lax.scan(body, (values, counts0),
                                       jnp.arange(n_sweeps))
    return values, counts


def run_inference_mc(dg, values, weights, key, n_sweeps: int,
                     sample_evidence: bool, info, modes=None):
    """Returns (values [P, NC], counts flat [K*P] = row-major [K, P] —
    1-D so no tile padding; callers reshape + transpose on host)."""
    if modes is None:
        modes = resolve_modes(info)
    modes = demote_modes(modes, values.shape[-1])
    return _run_inference_mc(dg, values, weights, key, n_sweeps,
                             sample_evidence, info, modes)


def mc_factor_phis(dg, values, info):
    """φ for every factor in every chain: [F', NC] (values [P, NC])."""
    from ..compile import factor_records

    f_vids, f_ispos, f_eqpred, f_mask = factor_records(dg)
    NC = values.shape[-1]
    # flat-index gather (f_vids is stored 1-D on device — a [F', A] index
    # operand would tile-pad 128/A at rest and in the gather temp)
    vals = values[f_vids.reshape(-1)].reshape(f_vids.shape + (NC,))
    eq = f_eqpred[..., None].astype(values.dtype)
    lits = (vals == eq) == f_ispos[..., None]
    return _eval_phi_ax2(lits, f_mask[..., None],
                         dg.f_type[:, None],
                         dg.f_arity[:, None],
                         info.present_funcs)


def sparse_comb_wids(dg, values):
    """Per-factor sparse-table weight ids for world(s) ``values``.

    values [P] or [P, NC] → wid of the SAME trailing shape [F'(, NC)];
    non-sparse factors map to the reserved zero-weight slot."""
    from ..compile import factor_records

    f_vids = factor_records(dg)[0]
    Fp, A = f_vids.shape
    tail = () if values.ndim == 1 else (values.shape[-1],)
    vals = values[f_vids.reshape(-1)].astype(jnp.int32) \
        .reshape((Fp, A) + tail)                       # [F', A(, NC)]
    f_cwstride = (dg.f_cwstride if dg.f_cwstride.ndim == 2
                  else dg.f_cwstride.reshape(Fp, -1))
    stride = f_cwstride if values.ndim == 1 else f_cwstride[..., None]
    base = dg.f_cwbase if values.ndim == 1 else dg.f_cwbase[:, None]
    m = base + jnp.sum(stride * vals, axis=1)
    T = dg.cwt_wid.shape[0]
    wid = dg.cwt_wid[jnp.clip(m, 0, T - 1)]
    zero = jnp.int32(dg.w_init.shape[0] - 1)           # reserved zero slot
    return jnp.where(base >= 0, wid, zero)


def _phi_streams(values, ownv, nbr, pos, eq, ismine, msk, typ, ar, hmask,
                 bd_start_c, bd_rnbr_c, ti, present, modes):
    """φ for a row-slice of one tier's incidence streams at the CURRENT
    values.  Same gather machinery as the draw path (banded MXU gather when
    enabled), but a single candidate — the variable's own value
    (ownv [rows, NC]).  Returns (phi [rows, D, NC], raw gathered neighbor
    values [rows, D, A-1, NC] or None on unary tiers — the sparse-weight
    gradient reuses them for its combination-index lookup)."""
    A = msk.shape[-1]
    A1 = A - 1
    NC = values.shape[-1]
    dt = values.dtype
    band = tier_modes(ti, modes)[0]
    vals = None
    if A1 == 0:
        nbr_lit = jnp.zeros(nbr.shape + (NC,), bool)
    elif band != "off":
        from ..ops.banded import banded_gather, banded_gather_multi

        rows, D = nbr.shape[0], nbr.shape[1]
        if ti.band_k >= 2:
            vals = banded_gather_multi(values, bd_rnbr_c, bd_start_c,
                                       ti.band_w, ti.band_k, band)
        else:
            ntc = rows // ti.band_tb
            nbr2 = nbr.reshape(ntc, ti.band_tb * D * A1)
            vals = banded_gather(values, nbr2, bd_start_c, ti.band_w, band)
        vals = vals.reshape(rows, D, A1, NC)
    else:
        # flat-index gather (no tile-padded [rows, D, A1] index temp)
        rows, D = nbr.shape[0], nbr.shape[1]
        vals = values[nbr.reshape(-1)].reshape(rows, D, A1, NC)
    if eq is None:
        # counts-based boolean path (mirrors color_delta_bool): reduce the
        # slot axis IMMEDIATELY instead of materializing the concatenated
        # [rows, D, A, NC] literal tensor — the gradient pass was VPU/HBM
        # bound on exactly those temporaries (profile_learn, r2 #8)
        nbrm = (msk & ~ismine)[..., :A1, None]
        if A1 > 0:
            nbr_lit = (vals == jnp.asarray(1, dt)) == pos[..., :A1, None]
            nl = jnp.sum(nbr_lit & nbrm, axis=-2).astype(jnp.int32)
        else:
            nbr_lit = None
            nl = jnp.zeros(msk.shape[:2] + (NC,), jnp.int32)
        ownm = ismine & msk
        o1 = jnp.sum(ownm & pos, axis=-1).astype(jnp.int32)  # [rows, D]
        o0 = jnp.sum(ownm, axis=-1).astype(jnp.int32) - o1
        v1 = ownv[:, None, :] == jnp.asarray(1, dt)          # [rows, 1, NC]
        nown = jnp.where(v1, o1[..., None], o0[..., None])
        if _need_head(present):
            head_own = jnp.any(hmask & ismine, axis=-1)[..., None]
            headpos = jnp.any(hmask & ismine & pos, axis=-1)[..., None]
            if nbr_lit is not None:
                hl = jnp.any(nbr_lit & (hmask & ~ismine)[..., :A1, None],
                             axis=-2)
            else:
                hl = jnp.zeros(nl.shape, bool)
            head = jnp.where(head_own,
                             jnp.where(v1, headpos, ~headpos), hl)
        else:
            head = None
        phi = _phi_from_counts(nl + nown, head, ar[..., None],
                               typ[..., None], present)
        return phi, vals
    if A1 > 0:
        nbr_lit = (vals == eq[..., :A1, None].astype(dt)) \
            == pos[..., :A1, None]
    own_lit = ((ownv[:, None, None, :] == eq[..., None].astype(dt))
               == pos[..., None])
    lit_head = jnp.where(ismine[..., :A1, None], own_lit[..., :A1, :],
                         nbr_lit)
    lit = jnp.concatenate([lit_head, own_lit[..., A1:, :]], axis=-2)
    phi = _eval_phi_ax2(
        lit, msk[..., None], typ[:, :, None], ar[:, :, None],
        present, hmask=hmask[..., None],
    )                                                      # [rows, D, NC]
    return phi, vals


def _grad_row_chunk(ti, B: int, D: int, A: int, NC: int) -> int:
    """Rows per gradient sub-block: bounds the [rows, D, A, NC] literal
    temporaries to ~64 MiB however large the color block is (the flagship
    1M-var graph at NC=256 OOMs HBM without this).  Banded gathers need the
    chunk tile-aligned."""
    target = 1 << 26
    step = ti.band_tb if ti.band_w else 1
    rc = max(1, target // max(D * A * NC, 1))
    rc = min(max(step, (rc // step) * step), B)
    while rc > step and B % rc:
        rc -= step
    return rc if rc > 0 and B % rc == 0 else B


def mc_weight_gradient_cs(dg, v_ev, v_free, learn_non_evidence: bool, info,
                          modes=("off", "off"), row_chunk: int | None = None,
                          n_graph: int = 1, g=0):
    """Weight gradient on the cs streams: each factor counted once via its
    compile-time owner record (cs_gowner / cs_gtouch), neighbor values
    fetched with the same (banded) gather the sweep uses, evaluated per
    tier in bounded row chunks.  Equivalent to the per-factor path
    (tests/test_learning.py and tests/test_sparse_shard.py assert
    equality).  Sparse per-combination factors route their ±feat through
    the combination table (data-dependent weight ids, chain-averaged)
    instead of the dense segment-sum, mirroring the draw path's lookup.

    Under graph sharding ``dg`` holds LOCAL stream slices while the values
    vector stays global: pass the graph-axis size ``n_graph`` and this
    shard's index ``g`` so the own-value slices index the right rows (the
    tier-local shard rows of tier t sit at global positions
    c*B + ti.off + g*(ti.block//n_graph) + r; owner records are disjoint
    across shards, so shard gradients psum over the graph axis)."""
    W = dg.w_init.shape[0]
    NC = v_ev.shape[-1]
    ds = jax.lax.dynamic_slice
    all_bool = info.all_boolean
    gB = info.block_size
    grad = jnp.zeros((W,), jnp.float32)
    # both worlds concatenated on the chain axis: ONE stream pass (one
    # banded gather — the one-hot window build amortizes over 2NC lanes,
    # and every cs_* slice is read once instead of twice); phi splits back
    # below.  2NC stays lane-aligned whenever NC was.
    v_both = jnp.concatenate([v_ev, v_free], axis=-1)
    from ..compile import tier_geom

    for ts, ti in zip(dg.tiers, info.tiers):
        C = info.n_colors
        Bl, D, A = tier_geom(ts, ti, C)      # Bl = local tier rows
        A1 = A - 1

        def dsr(arr, c, r0, rc, tail, Bl=Bl):
            """Row-chunk slice [rc, *tail] of one tier stream at (color c,
            row r0) — flat 1-D at-rest, [C, N] graph-shard local, or
            legacy multi-D storage (see _tc)."""
            ntail = 1
            for s in tail:
                ntail *= s
            if arr.ndim == 1:
                return ds(arr, ((c * Bl + r0) * ntail,),
                          (rc * ntail,)).reshape((rc,) + tail)
            if arr.ndim == 2 and arr.shape[1] == Bl * ntail:
                return ds(arr, (c, r0 * ntail),
                          (1, rc * ntail))[0].reshape((rc,) + tail)
            return ds(arr, (c, r0) + (0,) * len(tail),
                      (1, rc) + tail)[0]
        present = ti.present_funcs or info.present_funcs
        band = tier_modes(ti, modes)[0]
        use_kernel = GRAD_MODE != "xla"
        if (ti.affine2 and W <= 64 and band in ("pallas", "interpret")
                and not info.has_sparse_cw and n_graph == 1
                and row_chunk is None and use_kernel):
            # fused gradient kernel (ops/grad.py): whole per-tile
            # evaluation in VMEM, [ntiles, 128] partials out — the XLA
            # chunked path below was 50.6% of a learning epoch on its
            # HBM temporaries (LEARN_PROFILE.json round-3 bound)
            from ..ops.grad import grad_pair_tile

            coefsrc = ts.gd_cown if learn_non_evidence else ts.gd_ctch
            for c in range(C):
                parts = grad_pair_tile(
                    v_both, ts.bd_nbr, ts.bd_start[c], ts.gd_wid, coefsrc,
                    ts.gd_ao, ts.gd_an, ts.gd_ax, c,
                    own0=c * gB + ti.off,
                    W=ti.band_w, TB=ti.band_tb, D=D, n_weights=W,
                    interpret=(band == "interpret"))
                grad = grad + jnp.sum(parts, axis=(0, 1))[:W] / NC
            continue
        rc = row_chunk or _grad_row_chunk(ti, Bl, D, A, 2 * NC)
        rc = min(rc, Bl)
        if Bl % rc:
            raise ValueError(f"row_chunk {rc} must divide tier block {Bl}")
        nch = Bl // rc
        TB = ti.band_tb or 1
        ntc = rc // TB if ti.band_w else 1

        def body(i, grad, ts=ts, ti=ti, D=D, A=A, A1=A1, rc=rc, nch=nch,
                 TB=TB, ntc=ntc, present=present):
            c = i // nch
            r0 = (i % nch) * rc
            nbr = dsr(ts.cs_nbr, c, r0, rc, (D, A1))
            pos = dsr(ts.cs_pos, c, r0, rc, (D, A))
            eq = (None if all_bool
                  else dsr(ts.cs_eq, c, r0, rc, (D, A)))
            ismine = dsr(ts.cs_ismine, c, r0, rc, (D, A))
            msk = dsr(ts.cs_mask, c, r0, rc, (D, A))
            hmask = dsr(ts.cs_hmask, c, r0, rc, (D, A))
            typ = dsr(ts.cs_type, c, r0, rc, (D,))
            ar = dsr(ts.cs_arity, c, r0, rc, (D,))
            if ti.band_w and ti.band_k >= 2:
                bd_c = ds(ts.bd_start, (c, r0 // TB, 0),
                          (1, ntc, ti.band_k))[0]
                rn_c = ds(ts.bd_rnbr, (c, r0 // TB, 0),
                          (1, ntc, TB * D * A1))[0]
            elif ti.band_w:
                bd_c = ds(ts.bd_start, (c, r0 // TB), (1, ntc))[0]
                rn_c = None
            else:
                bd_c, rn_c = ts.bd_start[0, :1], None
            if ti.hub:
                # hub tier: stream rows are CHUNKS; each chunk's own value
                # is its owning row's (hb_row; pad chunks -> dummy row
                # ti.block, whose gathered value is masked out by gm)
                hrow = ds(ts.hb_row, (c, r0), (1, rc))[0]
                own = v_both[c * gB + ti.off
                             + jnp.minimum(hrow, ti.block - 1)]
            else:
                own0 = c * gB + ti.off + g * (ti.block // n_graph) + r0
                own = ds(v_both, (own0, 0), (rc, 2 * NC))
            phi, nbrv = _phi_streams(v_both, own, nbr, pos, eq, ismine,
                                     msk, typ, ar, hmask, bd_c, rn_c,
                                     ti, present, modes)
            phi_e, phi_f = phi[..., :NC], phi[..., NC:]
            if nbrv is None:
                nbrv_e = nbrv_f = None
            else:
                nbrv_e, nbrv_f = nbrv[..., :NC], nbrv[..., NC:]
            own_e, own_f = own[..., :NC], own[..., NC:]
            gsrc = ts.cs_gowner if learn_non_evidence else ts.cs_gtouch
            gm = dsr(gsrc, c, r0, rc, (D,))
            feat = dsr(ts.cs_feat, c, r0, rc, (D,))
            wid = dsr(ts.cs_wid, c, r0, rc, (D,))
            diff = jnp.mean(phi_e - phi_f, axis=-1) * feat
            diff = jnp.where(gm, diff, 0.0)
            if info.has_sparse_cw:
                issp = dsr(ts.cs_issparse, c, r0, rc, (D,))
                diff = jnp.where(issp, 0.0, diff)
            grad = grad + segment_reduce(diff, wid, W)
            if info.has_sparse_cw:
                # sparse factors: φ ≡ 1 on the current combination, so the
                # owner record contributes +feat at wid(ev world) and −feat
                # at wid(free world) — a table lookup identical to the draw
                # path's (candidate → own value)
                base = dsr(ts.cs_cwbase, c, r0, rc, (D,))
                stride = dsr(ts.cs_cwstride, c, r0, rc, (D, A))
                s_own = jnp.sum(jnp.where(ismine, stride, 0),
                                axis=-1).astype(jnp.int32)       # [rc, D]
                T = dg.cwt_wid.shape[0]

                def comb_wid(ownv, nbrv):
                    if nbrv is None:
                        nbr_sum = jnp.zeros((rc, D, NC), jnp.int32)
                    else:
                        nbr_sum = jnp.sum(
                            stride[..., :A1, None].astype(jnp.int32)
                            * nbrv.astype(jnp.int32), axis=-2)   # [rc,D,NC]
                    m = (base[..., None] + nbr_sum
                         + s_own[..., None] * ownv[:, None, :]
                         .astype(jnp.int32))
                    return dg.cwt_wid[jnp.clip(m, 0, T - 1)]

                sel = jnp.where(gm & issp, feat, 0.0)[..., None] / NC
                sel = jnp.broadcast_to(sel, (rc, D, NC))
                grad = grad + segment_reduce(
                    sel, comb_wid(own_e, nbrv_e), W)
                grad = grad - segment_reduce(
                    sel, comb_wid(own_f, nbrv_f), W)
            return grad

        n = C * nch
        grad = jax.lax.fori_loop(0, n, body, grad, unroll=(n <= 4))
    if info.has_sparse_cw:
        grad = grad.at[W - 1].set(0.0)   # keep the reserved slot inert
    return grad


def mc_weight_gradient(dg, v_ev, v_free, learn_non_evidence: bool, info,
                       modes=None):
    """Weight gradient dispatcher: the cs-stream path (banded-gather
    friendly, graph-shardable) whenever kernel modes are resolved; the
    per-factor route stays as the modes-free reference implementation."""
    if modes is not None:
        return mc_weight_gradient_cs(dg, v_ev, v_free, learn_non_evidence,
                                     info, modes)
    return _mc_weight_gradient_factors(dg, v_ev, v_free, learn_non_evidence,
                                       info)


def _mc_weight_gradient_factors(dg, v_ev, v_free, learn_non_evidence: bool,
                                info):
    """Weight gradient averaged over the chain axis of [P, NC] worlds."""
    from ..compile import factor_records

    issparse = dg.f_cwbase[:, None] >= 0 if info.has_sparse_cw else False
    diff = dg.f_feat[:, None] * (mc_factor_phis(dg, v_ev, info)
                                 - mc_factor_phis(dg, v_free, info))
    if not learn_non_evidence:
        f_vids, _, _, f_mask = factor_records(dg)
        touches_ev = jnp.any((dg.var_role[f_vids] == 1) & f_mask,
                             axis=-1)[:, None]
    else:
        touches_ev = True
    diff = jnp.where(jnp.logical_and(touches_ev,
                                     jnp.logical_not(issparse)), diff, 0.0)
    diff = jnp.mean(diff, axis=1)
    W = dg.w_init.shape[0]
    grad = jax.ops.segment_sum(diff, dg.f_wid, num_segments=W)
    if info.has_sparse_cw:
        # sparse factors: φ ≡ 1 for the entry matching the current
        # combination, so grad(w[wid(world)]) += ±feat — a scatter-add to
        # DATA-DEPENDENT weight ids (chain-averaged)
        NC = v_ev.shape[-1]
        sel = jnp.where(jnp.logical_and(touches_ev, issparse),
                        dg.f_feat[:, None] / NC,
                        0.0) * jnp.ones((1, NC))
        wid_ev = sparse_comb_wids(dg, v_ev)
        wid_free = sparse_comb_wids(dg, v_free)
        grad = grad + jax.ops.segment_sum(sel.ravel(), wid_ev.ravel(),
                                          num_segments=W)
        grad = grad - jax.ops.segment_sum(sel.ravel(), wid_free.ravel(),
                                          num_segments=W)
        grad = grad.at[W - 1].set(0.0)   # keep the reserved slot inert
    return grad


@partial(jax.jit, static_argnames=("cfg", "info", "modes"))
def _learn_mc_from(dg, weights, v_ev, v_free, alpha, key, cfg, info, modes):
    """Multi-chain contrastive SGD from EXPLICIT initial worlds + stepsize:
    NC evidence worlds + NC free worlds, chain-averaged gradients (a
    mini-batch over worlds).  Same update rule and fixed points as
    engine.learn (SURVEY.md §2c).  Taking the worlds as arguments makes
    epoch-granularity checkpoint/resume a chunked sequence of these calls."""
    from .learn import apply_update

    kscan = key

    def epoch(carry, i):
        w, v_ev, v_free, alpha = carry
        ki = jax.random.fold_in(kscan, i)
        folded = prepare_fold(dg, w, info, modes)  # refold: w changes

        def one_sweep(c, j):
            v_ev, v_free = c
            kj = jax.random.fold_in(ki, j)
            v_ev = sweep_mc(dg, v_ev, w, jax.random.fold_in(kj, 0),
                            False, info, folded, modes)
            v_free = sweep_mc(dg, v_free, w, jax.random.fold_in(kj, 1),
                              True, info, folded, modes)
            return (v_ev, v_free), None

        (v_ev, v_free), _ = jax.lax.scan(
            one_sweep, (v_ev, v_free), jnp.arange(cfg.n_sweeps_per_epoch))
        grad = mc_weight_gradient(dg, v_ev, v_free, cfg.learn_non_evidence,
                                  info, modes)
        w = apply_update(w, grad, dg.w_fixed, alpha, cfg.regularization,
                         cfg.reg_param)
        return (w, v_ev, v_free, alpha * cfg.diminish), None

    init = (jnp.asarray(weights, jnp.float32), v_ev, v_free,
            jnp.asarray(alpha, jnp.float32))
    (w, v_ev, v_free, alpha), _ = jax.lax.scan(epoch, init,
                                               jnp.arange(cfg.n_epochs))
    return w, v_ev, v_free, alpha


def learn_mc(dg, weights, key, cfg, info, n_chains: int, modes=None,
             v_ev=None, v_free=None, alpha=None):
    """Multi-chain learning; pass (v_ev, v_free, alpha) to continue a
    checkpointed run instead of initializing fresh worlds."""
    if modes is None:
        modes = resolve_modes(info)
    if v_ev is None and v_free is None:
        n_chains = effective_chains(info, modes, n_chains,
                                    dg.var_card.shape[0], n_worlds=2)
    else:
        n_chains = v_ev.shape[-1]
    modes = demote_modes(modes, n_chains)
    k0, k1, kscan = jax.random.split(key, 3)
    if v_ev is None:
        v_ev = init_values_mc(dg, k0, n_chains, info)
    if v_free is None:
        v_free = init_values_mc(dg, k1, n_chains, info)
    if alpha is None:
        alpha = cfg.stepsize
    w, v_ev, v_free, _ = _learn_mc_from(dg, weights, v_ev, v_free, alpha,
                                        kscan, cfg, info, modes)
    return w, v_ev, v_free


def infer_mc(dg, weights, key, n_burn: int, n_sweeps: int, info,
             n_chains: int, sample_evidence: bool = False,
             random_init: bool = True, modes=None):
    """Chains-last inference; returns (marginals [V,K] float32, values)."""
    if modes is None:
        modes = resolve_modes(info)
    n_chains = effective_chains(info, modes, n_chains, dg.var_card.shape[0])
    modes = demote_modes(modes, n_chains)
    k_init, k_burn, k_inf = jax.random.split(key, 3)
    values = init_values_mc(dg, k_init, n_chains, info, random_init)
    if n_burn:
        values = run_sweeps_mc(dg, values, weights, k_burn, n_burn,
                               sample_evidence, info, modes)
    values, counts = run_inference_mc(dg, values, weights, k_inf, n_sweeps,
                                      sample_evidence, info, modes)
    # host-side transpose + reindex: doing this in-jit materializes the
    # K-minor [P, K] padded buffer the [K, P] layout exists to avoid
    import numpy as np

    K = info.max_card
    cnt = np.asarray(jax.device_get(counts)).reshape(K, -1).T
    marg = cnt[np.asarray(jax.device_get(dg.pos_of_vid))].astype(
        np.float32) / np.float32(n_sweeps * n_chains)
    return marg, values
