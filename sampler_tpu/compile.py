"""Compile a host FactorGraph into the padded, rectangular device layout.

Equivalent role to the reference's FactorGraph::compile() →
CompiledFactorGraph (ref: src/factor_graph.cc — recalled), but the layout is
TPU-shaped:

COLOR-MAJOR VARIABLE LAYOUT.  Variables are permuted so that each color's
block occupies one contiguous slice of the assignment vector:
position p = c * B + b holds the b-th variable of color c (B = padded block
size).  A Gibbs color step then:

  * reads its per-variable metadata as contiguous [B] slices (no gathers),
  * gathers only the small ``values`` vector at streamed member indices,
  * writes its updates with one contiguous dynamic_update_slice — there is
    NO scatter anywhere in the sweep (arbitrary-index scatter is
    pathologically slow on TPU XLA).

Sentinels instead of masks wherever possible:
  * pad positions inside a color block are fake variables (card 1, evidence
    role, value 0) — the slice update writes their old value back;
  * position C*B is the global dummy slot factor-edge padding points at;
  * a DUMMY FACTOR row at index F has feature 0.0 so its contribution to
    any sum is exactly 0.

All factor member ids (f_vids, cs_nbr) are stored as color-major POSITIONS,
not original variable ids; ``pos_of_vid`` maps back for user-facing output.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

from . import format_spec as fs
from .coloring import greedy_coloring
from .graph import FactorGraph


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class DeviceGraph(NamedTuple):
    """Rectangular SoA arrays (numpy here; moved to device by jnp.asarray).

    Shapes:  P = C*B + 1 (color-major positions + dummy tail),
             F' = F+1 (dummy factor row),  A = padded max arity,
             D = padded max degree, C = colors, B = padded block size.
    """

    # factors (members as positions) ------------------------------ [F', A]
    f_vids: np.ndarray    # int32 member positions (pad → C*B)
    f_ispos: np.ndarray   # bool
    f_eqpred: np.ndarray  # int32
    f_mask: np.ndarray    # bool, True on real edges
    # factors ------------------------------------------------------ [F']
    f_type: np.ndarray    # int8
    f_wid: np.ndarray     # int32 (dummy → 0)
    f_feat: np.ndarray    # float32 (dummy → 0.0)
    f_arity: np.ndarray   # int16 (dummy → 1)
    # color-major incidence streams — the sweep's hot data.  One record per
    # (variable-of-color, incident-factor-slot); contiguous streaming.
    # SLOTS ARE PERMUTED OWN-LAST per (variable, factor): the slots owned by
    # the updating variable sit at the tail of the A axis, so the values
    # gather touches ONLY the leading A-1 neighbor slots (cs_nbr) — the
    # gather is TPU-issue-rate bound (~11 ns/row regardless of row width),
    # so dropping the own slots halves its cost on pairwise graphs.
    cs_nbr: np.ndarray     # int32 [C, B, D, A-1] neighbor positions
                           #       (own/pad slots → dummy position)
    cs_ismine: np.ndarray  # bool  [C, B, D, A] slots owned by this variable
                           #       (own-last: trailing n_own slots True)
    cs_hmask: np.ndarray   # bool  [C, B, D, A] slot is the factor HEAD
                           #       (original slot arity-1); explicit because
                           #       the permutation breaks iota==arity-1
    cs_pos: np.ndarray     # bool  [C, B, D, A]
    cs_eq: np.ndarray      # int16/int32 [C, B, D, A]; [C, 1, 1, 1]
                           #       placeholder when CompileInfo.all_boolean
                           #       (the engine never reads it then)
    cs_mask: np.ndarray    # bool  [C, B, D, A]
    cs_type: np.ndarray    # int8  [C, B, D]
    cs_arity: np.ndarray   # int16 [C, B, D]
    cs_wid: np.ndarray     # int32 [C, B, D]
    cs_feat: np.ndarray    # float32 [C, B, D]
    # gradient ownership: each real factor is "owned" by exactly ONE
    # incidence record (its min-position member), so the contrastive-SGD
    # gradient can be evaluated on the cs streams — reusing the banded MXU
    # gather — without counting a factor once per member
    cs_gowner: np.ndarray  # bool [C, B, D] this record owns its factor
    cs_gtouch: np.ndarray  # bool [C, B, D] owner & factor touches evidence (pad → 0)
    # banded-gather plan (ops/banded.py): per-tile window starts; [C, 1]
    # zeros when banding is off (CompileInfo.band_w == 0)
    bd_start: np.ndarray   # int32 [C, ntiles]
    # TRUE per-tile read bounds [lo, hi) over cs_nbr (dummy excluded;
    # empty tile -> lo=P, hi=0) — tighter than the padded/aligned windows;
    # parallel/graph_shard.py derives the halo-exchange plan from these
    bd_lo: np.ndarray      # int32 [C, ntiles] ([C, 1] when banding off)
    bd_hi: np.ndarray      # int32 [C, ntiles] (exclusive)
    # fused affine color step (ops/fused.py; CompileInfo.affine2):
    bd_nbr: np.ndarray     # int32 [C, ntiles, 1, D*TB] neighbor positions,
                           #       d-major within tile ([C,1,1,1] when off)
    ab_a: np.ndarray       # f32 [C, B, D] delta-phi intercept ([C,1,1] off)
    ab_b: np.ndarray       # f32 [C, B, D] delta-phi slope in neighbor value
    # per-position variable metadata ------------------------------- [P]
    var_card: np.ndarray  # int32 (pads/dummy → 1)
    var_role: np.ndarray  # int32 (pads/dummy → ROLE_EVIDENCE)
    var_init: np.ndarray  # int32 (pads/dummy → 0)
    # color-major 2-D views of the same metadata ------------------ [C, B]
    cm_card: np.ndarray   # int32
    cm_role: np.ndarray   # int32
    # precomputed draw masks (runtime comparisons against sliced metadata
    # trigger a pathological Mosaic lowering — ~400x slower — so these are
    # baked at compile time and streamed):
    cm_kmask: np.ndarray      # float32 [C, B, K]: 0 if k < card else -1e30
    cm_resample: np.ndarray   # bool [C, B]: query & not pad
    cm_resample_ev: np.ndarray  # bool [C, B]: not pad (sample_evidence mode)
    # original-id mapping ------------------------------------------- [V]
    pos_of_vid: np.ndarray  # int32: original vid → color-major position
    # weights ------------------------------------------------ [W + 1]
    # one reserved always-zero FIXED slot is appended at index W: sparse
    # combination-table misses point at it, so absent combinations
    # contribute exactly 0 without a mask
    w_init: np.ndarray    # float32
    w_fixed: np.ndarray   # bool
    # sparse per-combination weights (FUNC_AND_CATEGORICAL sparse variant;
    # placeholders of the same rank when CompileInfo.has_sparse_cw=False):
    cwt_wid: np.ndarray       # int32 [T] dense mixed-radix comb → wid table
    f_cwbase: np.ndarray      # int32 [F'] table base (-1 = not sparse)
    f_cwstride: np.ndarray    # int32 [F', A] mixed-radix stride per slot
    cs_issparse: np.ndarray   # bool  [C, B, D]
    cs_cwbase: np.ndarray     # int32 [C, B, D] (0 where not sparse)
    cs_cwstride: np.ndarray   # int32 [C, B, D, A] (own-last slot order)


@dataclasses.dataclass(frozen=True)
class CompileInfo:
    n_vars: int
    n_factors: int
    n_weights: int
    n_colors: int
    max_arity: int
    max_degree: int
    max_card: int
    block_size: int
    present_funcs: tuple = ()   # sorted factor-function ids in this graph
    all_boolean: bool = False   # no categorical vars and all eqpred == 1
    band_w: int = 0             # banded-gather window width (0 = disabled)
    band_tb: int = 0            # banded-gather tile size (variables/tile)
    affine2: bool = False       # fused affine color step available
                                # (all-boolean, arity <= 2, banded)
    has_sparse_cw: bool = False  # sparse per-combination weights present


def compile_graph(graph: FactorGraph, colors: np.ndarray | None = None,
                  align: int = 8, band_tile: int = 128,
                  band_wmax: int = 8192,
                  band_min_block: int = 4096) -> tuple[DeviceGraph,
                                                       CompileInfo]:
    """Build the padded color-major device layout.

    band_*: parameters of the banded (MXU one-hot matmul) gather plan — see
    ops/banded.py.  Blocks smaller than ``band_min_block`` skip banding (the
    plain gather is fine there and the tile padding would dominate)."""
    graph.validate()
    V, F, E = graph.n_vars, graph.n_factors, graph.n_edges
    arity = graph.arities().astype(np.int64)
    A = int(arity.max())

    # --- coloring → permutation ----------------------------------------
    if colors is None:
        colors = greedy_coloring(graph)
    C = int(colors.max()) + 1 if V else 1
    counts = np.bincount(colors, minlength=C)
    B = _round_up(int(counts.max()), align)
    try_band = band_tile > 0 and B >= band_min_block
    if try_band:
        B = _round_up(B, band_tile)
    P = C * B + 1                      # +1 global dummy tail
    DUMMY = C * B

    vid_of_pos = np.full(P, -1, np.int64)   # -1 = pad/dummy
    corder = np.argsort(colors, kind="stable").astype(np.int64)
    sc = colors[corder]
    cstarts = np.searchsorted(sc, np.arange(C))
    cpos = np.arange(V) - cstarts[sc]
    positions = sc.astype(np.int64) * B + cpos
    vid_of_pos[positions] = corder
    pos_of_vid = np.empty(V, np.int64)
    pos_of_vid[corder] = positions

    # --- factor → member edges (as positions), padded [F+1, A] ---------
    eq_dtype = (np.int16 if np.max(graph.e_eqpred, initial=0) < (1 << 15)
                else np.int32)
    f_vids = np.full((F + 1, A), DUMMY, np.int32)
    f_ispos = np.zeros((F + 1, A), bool)
    f_eqpred = np.zeros((F + 1, A), eq_dtype)
    f_mask = np.zeros((F + 1, A), bool)
    rows = np.repeat(np.arange(F), arity)
    cols = np.arange(E, dtype=np.int64) - np.repeat(graph.f_ptr[:-1], arity)
    f_vids[rows, cols] = pos_of_vid[graph.e_vid]
    f_ispos[rows, cols] = graph.e_ispos
    f_eqpred[rows, cols] = graph.e_eqpred
    f_mask[rows, cols] = True

    f_type = np.concatenate([graph.f_type, [fs.FUNC_AND]]).astype(np.int8)
    f_wid = np.concatenate([graph.f_wid, [0]]).astype(np.int32)
    f_feat = np.concatenate([graph.f_feat, [0.0]]).astype(np.float32)
    f_arity = np.concatenate([arity, [1]]).astype(np.int16)

    # --- variable(position) → DISTINCT incident factors [P, D] ---------
    # a factor mentioning the same variable in several slots appears once;
    # the sweep substitutes the candidate at every matching slot.
    pair_key = rows.astype(np.int64) * P + pos_of_vid[graph.e_vid]
    uniq = np.unique(pair_key)
    uf = (uniq // P).astype(np.int32)
    up = (uniq % P).astype(np.int64)
    degree = np.bincount(up, minlength=P)
    D = max(int(degree.max()) if V else 1, 1)
    v_fidx = np.full((P, D), F, np.int32)
    order = np.argsort(up, kind="stable")
    sp, sf = up[order], uf[order]
    starts = np.searchsorted(sp, np.arange(P))
    posn = np.arange(len(sp)) - starts[sp]
    v_fidx[sp, posn] = sf

    # --- per-position metadata -----------------------------------------
    var_card = np.ones(P, np.int32)
    var_role = np.full(P, fs.ROLE_EVIDENCE, np.int32)
    var_init = np.zeros(P, np.int32)
    real = vid_of_pos >= 0
    var_card[real] = graph.var_card[vid_of_pos[real]]
    var_role[real] = graph.var_role[vid_of_pos[real]]
    var_init[real] = graph.var_init[vid_of_pos[real]]
    cm_card = var_card[:-1].reshape(C, B).copy()
    cm_role = var_role[:-1].reshape(C, B).copy()
    K = int(graph.var_card.max()) if V else 1
    cm_kmask = np.where(
        np.arange(K)[None, None, :] < cm_card[:, :, None], 0.0, -1e30
    ).astype(np.float32)
    cm_resample = (cm_role == 0) & (cm_card > 1)
    cm_resample_ev = cm_card > 1

    # --- sparse per-combination weight TABLE (FUNC 12 sparse variant) ---
    # dense mixed-radix table per sparse factor: entry for combination
    # (v_0..v_{a-1}) lives at base_f + Σ_j v_j·stride_j; combinations with
    # no entry point at the reserved zero weight (index n_weights), so the
    # device lookup needs NO mask (SURVEY.md §7 hard-part 3: hash-free).
    ZERO_WID = graph.n_weights
    has_cw = graph.cw_fid is not None and len(graph.cw_fid) > 0
    if has_cw:
        f_cwbase_full = np.full(F + 1, -1, np.int64)
        f_cwstride_full = np.zeros((F + 1, A), np.int64)
        edge_cards = graph.var_card[graph.e_vid].astype(np.int64)
        sparse_f = np.unique(graph.cw_fid)
        sizes = np.zeros(F + 1, np.int64)
        for f in sparse_f:
            lo, hi = graph.f_ptr[f], graph.f_ptr[f + 1]
            cards = edge_cards[lo:hi]
            # row-major over edge order: stride_j = Π_{l>j} card_l
            strides = np.concatenate(
                [np.cumprod(cards[::-1])[::-1][1:], [1]])
            f_cwstride_full[f, : hi - lo] = strides
            sizes[f] = int(np.prod(cards))
        T = int(sizes.sum())
        if T > (1 << 28):
            raise ValueError(
                f"sparse combination tables too large ({T} entries); "
                "cap is 2^28 — split the factor or use dense weights")
        bases = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        f_cwbase_full[sparse_f] = bases[sparse_f]
        m = (graph.cw_cats.astype(np.int64)
             * f_cwstride_full[graph.cw_fid, : graph.cw_cats.shape[1]]
             ).sum(axis=1)
        cwt_wid = np.full(max(T, 1), ZERO_WID, np.int32)
        cwt_wid[f_cwbase_full[graph.cw_fid] + m] = graph.cw_wid
        f_cwbase = f_cwbase_full.astype(np.int32)
        f_cwstride = f_cwstride_full.astype(np.int32)
    else:
        cwt_wid = np.full(1, ZERO_WID, np.int32)
        f_cwbase = np.full(1, -1, np.int32)
        f_cwstride = np.zeros((1, 1), np.int32)

    # --- color-major incidence streams [C, B, D, ...] -------------------
    # Assembled in bounded row chunks: peak temporary memory stays
    # O(CHUNK·D·A) however large the graph is (KBC-scale compile,
    # VERDICT.md r1 #3), and the hot streams use the narrowest dtype that
    # fits (cs_type int8, cs_arity int16, cs_eq int16 when the category
    # ids allow; an all-boolean graph stores NO eq stream at all — the
    # engine never reads it when CompileInfo.all_boolean).
    all_boolean = bool((graph.var_dtype == fs.DTYPE_BOOLEAN).all()
                       and (graph.e_eqpred == 1).all() and not has_cw)
    present_funcs = tuple(sorted(int(t) for t in np.unique(graph.f_type)))
    assert A < (1 << 15) and np.max(graph.f_type, initial=0) < (1 << 7)
    A1 = A - 1
    cs_nbr = np.empty((C, B, D, A1), np.int32)
    cs_ismine = np.empty((C, B, D, A), bool)
    cs_hmask = np.empty((C, B, D, A), bool)
    cs_pos = np.empty((C, B, D, A), bool)
    cs_mask = np.empty((C, B, D, A), bool)
    cs_eq = (np.ones((C, 1, 1, 1), eq_dtype) if all_boolean
             else np.empty((C, B, D, A), eq_dtype))
    cs_type = np.empty((C, B, D), np.int8)
    cs_arity = np.empty((C, B, D), np.int16)
    cs_wid = np.empty((C, B, D), np.int32)
    cs_feat = np.empty((C, B, D), np.float32)
    cs_gowner = np.empty((C, B, D), bool)
    cs_gtouch = np.empty((C, B, D), bool)
    # factor -> min member position (dummy/pad factors -> P: never matches)
    f_minpos = np.where(f_mask, f_vids, np.int32(P)).min(axis=1)
    # factor -> touches an evidence variable
    f_touch = ((var_role[f_vids] == fs.ROLE_EVIDENCE) & f_mask).any(axis=1)
    if has_cw:
        cs_issparse = np.empty((C, B, D), bool)
        cs_cwbase = np.empty((C, B, D), np.int32)
        cs_cwstride = np.empty((C, B, D, A), np.int32)
    else:
        cs_issparse = np.zeros((C, 1, 1), bool)
        cs_cwbase = np.zeros((C, 1, 1), np.int32)
        cs_cwstride = np.zeros((C, 1, 1, 1), np.int32)
    # fused-affine candidacy is decided before banding (banding success is
    # confirmed after; on failure the buffers are dropped)
    affine_cand = bool(try_band and all_boolean and A == 2)
    ab_a = np.empty((C, B, D), np.float32) if affine_cand else None
    ab_b = np.empty((C, B, D), np.float32) if affine_cand else None
    if affine_cand:
        from .ops.fused import affine_pairwise

    # native multithreaded builder (sparse-cw graphs stay on numpy)
    used_native = False
    if not has_cw:
        from . import native as native_mod

        outs = {
            "cs_nbr": cs_nbr.reshape(C * B, D, A1),
            "cs_ismine": cs_ismine.reshape(C * B, D, A),
            "cs_hmask": cs_hmask.reshape(C * B, D, A),
            "cs_pos": cs_pos.reshape(C * B, D, A),
            "cs_mask": cs_mask.reshape(C * B, D, A),
            "cs_type": cs_type.reshape(C * B, D),
            "cs_arity": cs_arity.reshape(C * B, D),
            "cs_wid": cs_wid.reshape(C * B, D),
            "cs_feat": cs_feat.reshape(C * B, D),
            "cs_gowner": cs_gowner.reshape(C * B, D),
            "cs_gtouch": cs_gtouch.reshape(C * B, D),
        }
        if not all_boolean:
            outs["cs_eq"] = cs_eq.reshape(C * B, D, A)
        if affine_cand:
            outs["ab_a"] = ab_a.reshape(C * B, D)
            outs["ab_b"] = ab_b.reshape(C * B, D)
        used_native = native_mod.build_streams(
            np.ascontiguousarray(v_fidx[:-1]), f_vids, f_ispos, f_eqpred,
            f_mask, f_type, f_arity, f_wid, f_feat,
            np.ascontiguousarray(f_minpos, np.int32), f_touch,
            outs, P, DUMMY, do_affine=affine_cand)

    take = np.take_along_axis
    iota_a = np.arange(A, dtype=np.int16)[None, None, :]
    CHUNK = max(1, (1 << 24) // max(D * A, 1))
    for c in range(C if not used_native else 0):
        for b0 in range(0, B, CHUNK):
            b1 = min(b0 + CHUNK, B)
            fi = v_fidx[c * B + b0: c * B + b1]        # [n, D]
            mv = f_vids[fi]                            # [n, D, A]
            own = np.arange(c * B + b0, c * B + b1,
                            dtype=np.int32)[:, None, None]
            ismine = mv == own
            ar = f_arity[fi]                           # [n, D] int16
            msk = f_mask[fi]
            # head slot = original slot arity-1, pre-permutation
            hm = (iota_a == ar[..., None] - 1) & msk
            pos = f_ispos[fi]
            eq = None if all_boolean else f_eqpred[fi]
            cw = f_cwstride[fi] if has_cw else None

            # permute each (variable, factor) slot list OWN-LAST (stable:
            # neighbor slots keep their relative order); slot A-1 is then
            # always own for real incident factors (n_own >= 1), so the
            # gather needs only slots :A-1
            if A == 2:
                # stable own-last = swap iff exactly slot 0 is own
                sw = (ismine[..., 0] & ~ismine[..., 1])[..., None]

                def permute(x):
                    return np.where(sw, x[..., ::-1], x)
            else:
                perm = np.argsort(ismine, axis=-1, kind="stable")

                def permute(x):
                    return take(x, perm, axis=-1)

            mv_p = permute(mv)
            ismine_p = permute(ismine)
            cs_nbr[c, b0:b1] = np.where(ismine_p, np.int32(DUMMY),
                                        mv_p)[..., :A1]
            cs_ismine[c, b0:b1] = ismine_p
            cs_hmask[c, b0:b1] = permute(hm)
            cs_pos[c, b0:b1] = permute(pos)
            cs_mask[c, b0:b1] = permute(msk)
            if not all_boolean:
                cs_eq[c, b0:b1] = permute(eq)
            cs_type[c, b0:b1] = f_type[fi]
            cs_arity[c, b0:b1] = ar
            cs_wid[c, b0:b1] = f_wid[fi]
            cs_feat[c, b0:b1] = f_feat[fi]
            cs_gowner[c, b0:b1] = f_minpos[fi] == own[..., 0]
            cs_gtouch[c, b0:b1] = cs_gowner[c, b0:b1] & f_touch[fi]
            if has_cw:
                base_fi = f_cwbase[fi]
                cs_issparse[c, b0:b1] = base_fi >= 0
                cs_cwbase[c, b0:b1] = np.maximum(base_fi, 0)
                cs_cwstride[c, b0:b1] = permute(cw)
            if affine_cand:
                ab_a[c, b0:b1], ab_b[c, b0:b1] = affine_pairwise(
                    cs_pos[c, b0:b1], cs_mask[c, b0:b1], ismine_p,
                    cs_hmask[c, b0:b1], cs_type[c, b0:b1], present_funcs)

    # --- banded-gather window plan --------------------------------------
    from .ops.banded import plan_banding

    bd_start, band_w, bd_lo, bd_hi = (
        plan_banding(cs_nbr, P, band_tile, band_wmax)
        if try_band else (None, 0, None, None))
    if bd_start is None:
        bd_start, band_w = np.zeros((C, 1), np.int32), 0
        bd_lo = np.zeros((C, 1), np.int32)
        bd_hi = np.zeros((C, 1), np.int32)

    # --- fused affine color step (ops/fused.py) --------------------------
    affine2 = bool(band_w > 0 and affine_cand)
    if affine2:
        ntiles = bd_start.shape[1]
        TB = B // ntiles
        bd_nbr = (cs_nbr[..., 0].reshape(C, ntiles, TB, D)
                  .transpose(0, 1, 3, 2).reshape(C, ntiles, 1, D * TB)
                  .copy())
    else:
        ab_a = ab_b = np.zeros((C, 1, 1), np.float32)
        bd_nbr = np.zeros((C, 1, 1, 1), np.int32)

    dg = DeviceGraph(
        f_vids=f_vids, f_ispos=f_ispos, f_eqpred=f_eqpred, f_mask=f_mask,
        f_type=f_type, f_wid=f_wid, f_feat=f_feat, f_arity=f_arity,
        cs_nbr=cs_nbr, cs_ismine=cs_ismine, cs_hmask=cs_hmask,
        cs_pos=cs_pos, cs_eq=cs_eq, cs_mask=cs_mask,
        cs_type=cs_type, cs_arity=cs_arity, cs_wid=cs_wid, cs_feat=cs_feat,
        cs_gowner=cs_gowner, cs_gtouch=cs_gtouch,
        bd_start=bd_start, bd_lo=bd_lo, bd_hi=bd_hi,
        bd_nbr=bd_nbr, ab_a=ab_a, ab_b=ab_b,
        var_card=var_card, var_role=var_role, var_init=var_init,
        cm_card=cm_card, cm_role=cm_role,
        cm_kmask=cm_kmask, cm_resample=cm_resample,
        cm_resample_ev=cm_resample_ev,
        pos_of_vid=pos_of_vid.astype(np.int32),
        w_init=np.append(graph.w_init, 0.0).astype(np.float32),
        w_fixed=np.append(graph.w_fixed, True).astype(bool),
        cwt_wid=cwt_wid, f_cwbase=f_cwbase, f_cwstride=f_cwstride,
        cs_issparse=cs_issparse, cs_cwbase=cs_cwbase,
        cs_cwstride=cs_cwstride,
    )
    info = CompileInfo(
        n_vars=V, n_factors=F, n_weights=graph.n_weights, n_colors=C,
        max_arity=A, max_degree=D, max_card=int(graph.var_card.max()),
        block_size=B,
        present_funcs=present_funcs,
        all_boolean=all_boolean,
        band_w=band_w, band_tb=band_tile if band_w else 0,
        affine2=affine2,
        has_sparse_cw=has_cw,
    )
    return dg, info


def to_device(dg: DeviceGraph):
    """Move all arrays to the default JAX device as a DeviceGraph of jnp arrays."""
    import jax.numpy as jnp

    return DeviceGraph(*(jnp.asarray(a) for a in dg))
