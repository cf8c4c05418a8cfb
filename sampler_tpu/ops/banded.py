"""Banded one-hot-matmul gather: the MXU replacement for the sweep's gather.

The values-row gather is TPU *issue-rate* bound (~11-19 ns per row no matter
how wide the row), which caps a gather-based sweep at ~90M rows/s.  But most
factor graphs have *locality*: after the color-major layout (and, for
irregular graphs, a bandwidth-minimizing ordering), the neighbor positions
referenced by any contiguous tile of TB variables fall inside a window of W
consecutive positions.  Then

    gathered[r, :] = values[idx[r], :]
                   = onehot(idx[r] - start)  @  values[start : start+W, :]

i.e. the gather of a whole tile is ONE [R, W] x [W, NC] matrix multiply of a
branchlessly-built one-hot matrix against a contiguous window slice — and
matmuls are what the MXU does at speed-of-light.  Out-of-window indices
(padding / the dummy slot) produce an all-zero one-hot row, which reproduces
the dummy row's value (0) exactly.

This file has three layers:
  * plan_banding   — compile-time (numpy) window analysis per color tile;
  * banded_gather_pallas — the fused Pallas TPU kernel (window DMA from HBM,
    one-hot build in VMEM, MXU dot);
  * banded_gather_xla — a pure-XLA scan fallback (also the CPU reference).

Reference behavior being replaced: the CSR neighbor gather inside the Gibbs
inner loop (ref: src/gibbs_sampler.cc sample_single_variable — recalled,
SURVEY.md §3.2); the banding itself has no reference analog — it is the
TPU-native formulation.
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np

LANE = 128          # TPU lane width: W is padded to a multiple of this
START_ALIGN = 256   # window starts rounded down for clean DMA alignment


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def out_vma(*xs) -> frozenset:
    """Union of the operands' varying-mesh-axes — pallas_call out_shapes
    must declare how their output varies when traced inside a shard_map
    with vma checking on (the output varies wherever any input does)."""
    import jax

    vma = frozenset()
    for x in xs:
        vma |= getattr(jax.typeof(x), "vma", frozenset()) or frozenset()
    return vma


def plan_banding(cs_nbr: np.ndarray, P: int, tb: int, w_max: int = 8192):
    """Window analysis.  cs_nbr: int32 [C, B, D, A1] neighbor positions with
    out-of-graph slots pointing at the dummy position P-1.

    Returns (starts [C, ntiles] int32, W int, lo [C, ntiles], hi [C, ntiles]).
    When banding is not applicable because the per-tile spread exceeds
    ``w_max``, returns (None, 0, lo, hi): the TRUE read bounds are still
    valid for the plain row gather, so the halo-exchange plan
    (parallel/graph_shard.py) keeps working even with the banded MXU gather
    off (the 10^8-var run previously lost BOTH — VERDICT.md r2 weak #1).
    Unary graphs / tile misalignment return (None, 0, None, None).
    lo/hi are per-tile bounds [lo, hi) excluding the dummy slot (empty
    tile -> lo=P, hi=0).

    Processes one color at a time so peak temporaries stay O(B*D*A1), not
    O(C*B*D*A1) — required for KBC-scale graphs.
    """
    C, B, D, A1 = cs_nbr.shape
    if A1 == 0 or B % tb != 0 or P < LANE:
        return None, 0, None, None
    ntiles = B // tb
    lo = np.empty((C, ntiles), np.int32)
    hi = np.empty((C, ntiles), np.int32)
    for c in range(C):
        idx = cs_nbr[c].reshape(ntiles, tb * D * A1)
        real = idx != (P - 1)                  # dummy slot = P-1
        lo[c] = np.where(real, idx, np.int32(P)).min(axis=-1)
        hi[c] = np.where(real, idx, np.int32(-1)).max(axis=-1)
    lo_c = np.minimum(lo, np.maximum(hi, 0))   # empty tile -> start from 0
    starts = (lo_c // START_ALIGN) * START_ALIGN
    spread = int(np.maximum(hi - starts + 1, 1).max())
    W = _round_up(spread, LANE)
    if W > min(w_max, P):
        return None, 0, lo.astype(np.int32), (hi + 1).astype(np.int32)
    starts = np.minimum(starts, P - W)         # keep window inside [0, P)
    starts = np.maximum(starts, 0)
    assert int((hi - starts).max()) < W
    return (starts.astype(np.int32), W,
            lo.astype(np.int32), (hi + 1).astype(np.int32))


def _greedy_starts(idx_sorted: np.ndarray, nreal: np.ndarray, W: int,
                   P: int, k_cap: int):
    """Greedy interval partition per tile: the minimum set of aligned
    width-W windows covering each tile's sorted read positions (classic
    greedy is optimal for fixed W).  idx_sorted [T, R] ascending with
    sentinels (>= P) sorted last; nreal [T] real entries per tile.

    Returns (starts int64 [T, k_cap] ascending — unused slots repeat the
    last real start so the (p >= starts) remap rule stays monotone,
    nwin int64 [T]) or (None, None) when some tile needs > k_cap windows.
    """
    T = idx_sorted.shape[0]
    starts = np.zeros((T, k_cap), np.int64)
    nwin = np.zeros(T, np.int64)
    thr = np.full(T, -1, np.int64)          # covered positions <= thr
    rows = np.arange(T)
    for j in range(k_cap + 1):
        cnt = (idx_sorted <= thr[:, None]).sum(axis=-1)
        need = cnt < nreal
        if not need.any():
            break
        if j == k_cap:
            return None, None               # over budget at this W
        p = idx_sorted[rows, np.minimum(cnt, idx_sorted.shape[1] - 1)]
        start = (p // START_ALIGN) * START_ALIGN
        start = np.clip(start, 0, max(P - W, 0))
        starts[need, j:] = start[need, None]   # fill tail (ascending pad)
        nwin[need] = j + 1
        thr = np.where(need, start + W - 1, thr)
    return starts, nwin


def plan_banding_multi(cs_nbr: np.ndarray, P: int, tb: int, w_max: int,
                       k_max: int = 8, kw_max: int = 8192):
    """MULTI-WINDOW window analysis for multi-color / irregular graphs.

    A single contiguous window cannot cover a tile's reads when its
    neighbors live in several color blocks (any graph with >2 colors).
    Windows are planned by GREEDY INTERVAL CLUSTERING of each tile's
    sorted read positions — segment-structure-agnostic, so reads into
    adjacent color blocks share one window and a ~20-color KBC graph
    stays within the K <= k_max budget (the round-4 per-source-block
    scheme needed K == #blocks-read and gave up beyond 8, turning the MXU
    gather off on exactly the reference's home workload).  The gather is
    ONE one-hot matmul against the K windows concatenated in VMEM;
    neighbor indices are REMAPPED at compile time into the concatenated
    window space (rnbr = j*W + idx - start_j), which makes
    double-counting impossible by construction and keeps the kernel a
    single equality-iota + dot.  W is chosen over power-of-two candidates
    to minimize the per-tile gather volume K*W.

    Returns (starts [C, ntiles, K] int32 DMA starts, W int, K int,
             rnbr [C, ntiles, R] int32 remapped indices,
             lo [C, ntiles], hi [C, ntiles] true GLOBAL read bounds)
    or (None, 0, 0, None, lo, hi) when not applicable.  ``kw_max`` bounds
    the per-tile gather volume K*W: the one-hot matmul spends K*W*NC*2
    FLOPs per gathered row, which crosses the plain gather's ~11-19 ns
    issue cost around K*W ~ 8k at NC = 128 — wider coverage (e.g. a
    scrambled-id graph whose greedy windows degenerate to the whole
    position space) must fall back to the row gather.
    """
    C, B, D, A1 = cs_nbr.shape
    if A1 == 0 or B % tb != 0 or P < LANE:
        return None, 0, 0, None, None, None
    kw_max = min(kw_max, P + LANE)
    ntiles = B // tb
    R = tb * D * A1
    dummy = P - 1
    lo_g = np.empty((C, ntiles), np.int32)
    hi_g = np.empty((C, ntiles), np.int32)
    # pass 1: per-color sorted read positions (sentinel P+1 sorts last)
    srt = []
    nreal = np.empty((C, ntiles), np.int64)
    for c in range(C):
        idx = cs_nbr[c].reshape(ntiles, R).astype(np.int64)
        real = idx != dummy
        lo_g[c] = np.where(real, idx, P).min(axis=-1)
        hi_g[c] = np.where(real, idx, -1).max(axis=-1)
        nreal[c] = real.sum(axis=-1)
        srt.append(np.sort(np.where(real, idx, np.int64(P + 1)), axis=-1))

    # pass 2: pick W — smallest per-tile gather volume K(W)*W that fits.
    # Candidates are capped at P ROUNDED DOWN to the lane width: a window
    # wider than the values array cannot be DMA'd (the single-window plan
    # enforces W <= P the same way)
    wcands, w = [], LANE * 4
    w_hi = min(w_max, (P // LANE) * LANE)
    while w <= w_hi:
        wcands.append(w)
        w *= 2
    if w_hi not in wcands and w_hi >= LANE:
        wcands.append(w_hi)
    best = None                         # (cost, W, starts per color, K)
    for Wc in wcands:
        per_c, kmax_c, ok = [], 0, True
        for c in range(C):
            st, nw = _greedy_starts(srt[c], nreal[c], Wc, P, k_max)
            if st is None:
                ok = False
                break
            per_c.append(st)
            kmax_c = max(kmax_c, int(nw.max()))
        if not ok or kmax_c == 0 or kmax_c * Wc > kw_max:
            continue
        cost = kmax_c * Wc
        if best is None or cost < best[0]:
            best = (cost, Wc, per_c, kmax_c)
    if best is None:
        return None, 0, 0, None, lo_g, hi_g + 1
    _, W, per_c, K = best

    # pass 3: remap neighbor indices into the concatenated window space
    starts = np.zeros((C, ntiles, K), np.int32)
    rnbr = np.empty((C, ntiles, R), np.int32)
    for c in range(C):
        st = per_c[c][:, :K]                          # [ntiles, K] asc
        starts[c] = st.astype(np.int32)
        idx = cs_nbr[c].reshape(ntiles, R).astype(np.int64)
        real = idx != dummy
        # last window with start <= idx; covered by construction (greedy
        # coverage proof: idx <= thr_j of the window that admitted it, and
        # any LATER window with start <= idx also spans it since starts
        # ascend and windows are W wide)
        j = (idx[:, :, None] >= st[:, None, :]).sum(axis=-1) - 1
        j = np.maximum(j, 0)
        s = np.take_along_axis(st, j, axis=1)
        rnbr[c] = np.where(real, j * np.int64(W) + idx - s,
                           np.int64(K * W)).astype(np.int32)
        r = real.nonzero()
        assert (rnbr[c][r] < K * W).all() and (rnbr[c] >= 0).all()
        assert ((idx - s)[r] < W).all() and ((idx - s)[r] >= 0).all()
    return starts, W, K, rnbr, lo_g, hi_g + 1


def band_mode() -> str:
    """'auto' | 'pallas' | 'xla' | 'interpret' | 'off'
    (env SAMPLER_TPU_BAND overrides)."""
    return os.environ.get("SAMPLER_TPU_BAND", "auto").lower()


def resolve_band(info, backend: str | None = None) -> str:
    """Resolve the banded-gather mechanism for this graph + environment.

    Returns one of 'pallas' | 'interpret' | 'xla' | 'off' — a CONCRETE
    mechanism, never 'auto'.  Must be called OUTSIDE jit (at entry-point
    call sites) so the env/backend decision participates in the jit cache
    key: an env var read inside a traced function goes stale when the env
    changes, because jit cache keys ignore the environment."""
    if getattr(info, "band_w", 0) <= 0 or info.max_card > 127:
        return "off"
    mode = band_mode()
    if mode in ("off", "pallas", "xla", "interpret"):
        return mode
    import jax

    backend = backend or jax.default_backend()
    return "pallas" if backend in ("tpu", "axon") else "off"


# --------------------------------------------------------------------------
# Pallas TPU kernel
# --------------------------------------------------------------------------

def _band_kernel(starts_ref, nbr_ref, values_ref, out_ref, win_ref, sem,
                 *, W: int, R: int, out_dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    # plan_banding aligns every window start to START_ALIGN; the hint lets
    # Mosaic prove the HBM slice lands on a sublane-tile boundary
    start = pl.multiple_of(starts_ref[t], 256)
    copy = pltpu.make_async_copy(
        values_ref.at[pl.ds(start, W), :], win_ref, sem)
    copy.start()
    il = nbr_ref[0] - start                            # [1, R] local indices
    # one-hot built TRANSPOSED [W, R]: the [1, R] row broadcasts along the
    # window axis for free (no cross-lane reshape), and the MXU contracts
    # dim 0 of both operands directly.  Built while the window DMA is in
    # flight — it depends only on the index stream.
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    oh_t = (il == iota_w).astype(jnp.int8)             # [W, R]
    copy.wait()
    # int8 x int8 -> int32 runs the MXU at 2x its bf16 rate; values are
    # small ints (card <= 127) so the product is exact
    acc = jax.lax.dot_general(
        oh_t, win_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)              # [R, NC]
    out_ref[:] = acc.astype(out_dtype)


def banded_gather_pallas(values, nbr, starts, W: int, interpret: bool = False):
    """values [P, NC]; nbr int32 [ntiles, R] (global positions);
    starts int32 [ntiles].  Returns [ntiles * R, NC] values.dtype."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntiles, R = nbr.shape
    P, NC = values.shape
    kern = partial(_band_kernel, W=W, R=R, out_dtype=values.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 1, R), lambda t, s: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),         # values stay in HBM
        ],
        out_specs=pl.BlockSpec((R, NC), lambda t, s: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((W, NC), values.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    flops = 2 * ntiles * R * W * NC
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles * R, NC), values.dtype,
                                       vma=out_vma(values, nbr, starts)),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=int(ntiles * (R * 4 + W * NC + R * NC))),
        interpret=interpret,
    )(starts, nbr.reshape(ntiles, 1, R), values)
    return out


def _band_kernel_multi(starts_ref, rnbr_ref, values_ref, out_ref, win_ref,
                       sems, *, W: int, K: int, R: int, out_dtype):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    copies = []
    for k in range(K):                                 # static unroll
        start = pl.multiple_of(starts_ref[t, k], 256)
        cp = pltpu.make_async_copy(
            values_ref.at[pl.ds(start, W), :],
            win_ref.at[pl.ds(k * W, W), :], sems.at[k])
        cp.start()
        copies.append(cp)
    il = rnbr_ref[0]                                   # [1, R] remapped
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (K * W, R), 0)
    oh_t = (il == iota_w).astype(jnp.int8)             # [K*W, R]
    for cp in copies:
        cp.wait()
    acc = jax.lax.dot_general(
        oh_t, win_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)              # [R, NC]
    out_ref[:] = acc.astype(out_dtype)


def banded_gather_pallas_multi(values, rnbr, starts, W: int, K: int,
                               interpret: bool = False):
    """Multi-window variant: rnbr int32 [ntiles, R] REMAPPED indices into
    the concatenated window space [0, K*W); starts int32 [ntiles, K] DMA
    starts per window.  Returns [ntiles * R, NC] values.dtype."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntiles, R = rnbr.shape
    P, NC = values.shape
    kern = partial(_band_kernel_multi, W=W, K=K, R=R, out_dtype=values.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 1, R), lambda t, s: (t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),         # values stay in HBM
        ],
        out_specs=pl.BlockSpec((R, NC), lambda t, s: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((K * W, NC), values.dtype),
            pltpu.SemaphoreType.DMA((K,)),
        ],
    )
    flops = 2 * ntiles * R * K * W * NC
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles * R, NC), values.dtype,
                                       vma=out_vma(values, rnbr, starts)),
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=0,
            bytes_accessed=int(ntiles * (R * 4 + K * W * NC + R * NC))),
        interpret=interpret,
    )(starts, rnbr.reshape(ntiles, 1, R), values)
    return out


def banded_gather_xla_multi(values, rnbr, starts, W: int, K: int,
                            tile_batch: int = 8):
    """Pure-XLA multi-window fallback (also the CPU reference)."""
    import jax
    import jax.numpy as jnp

    ntiles, R = rnbr.shape
    P, NC = values.shape
    tb = min(tile_batch, ntiles)
    while ntiles % tb:
        tb -= 1
    rnbr_b = rnbr.reshape(ntiles // tb, tb, R)
    starts_b = starts.reshape(ntiles // tb, tb, K)
    iota_w = jnp.arange(K * W, dtype=jnp.int32)

    def body(_, args):
        rb, st = args                                   # [tb, R], [tb, K]
        win = jax.vmap(jax.vmap(
            lambda s: jax.lax.dynamic_slice(values, (s, 0), (W, NC))))(st)
        win = win.reshape(tb, K * W, NC)                # [tb, K*W, NC]
        oh = (rb[:, :, None] == iota_w[None, None, :]).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            oh, win.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # [tb, R, NC]
        return None, acc.astype(values.dtype)

    _, outs = jax.lax.scan(body, None, (rnbr_b, starts_b))
    return outs.reshape(ntiles * R, NC)


def banded_gather_multi(values, rnbr, starts, W: int, K: int,
                        mode: str = "pallas"):
    if mode == "xla":
        return banded_gather_xla_multi(values, rnbr, starts, W, K)
    if mode == "interpret":
        return banded_gather_pallas_multi(values, rnbr, starts, W, K,
                                          interpret=True)
    return banded_gather_pallas_multi(values, rnbr, starts, W, K)


# --------------------------------------------------------------------------
# Pure-XLA fallback (scan over tile batches) — also the CPU reference
# --------------------------------------------------------------------------

def banded_gather_xla(values, nbr, starts, W: int, tile_batch: int = 16):
    import jax
    import jax.numpy as jnp

    ntiles, R = nbr.shape
    P, NC = values.shape
    tb = min(tile_batch, ntiles)
    while ntiles % tb:
        tb -= 1
    nbr_b = nbr.reshape(ntiles // tb, tb, R)
    starts_b = starts.reshape(ntiles // tb, tb)
    iota_w = jnp.arange(W, dtype=jnp.int32)

    def body(_, args):
        nb, st = args                                   # [tb, R], [tb]
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(values, (s, 0), (W, NC)))(st)
        il = nb - st[:, None]
        oh = (il[:, :, None] == iota_w[None, None, :]).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            oh, win.astype(jnp.bfloat16),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # [tb, R, NC]
        return None, acc.astype(values.dtype)

    _, outs = jax.lax.scan(body, None, (nbr_b, starts_b))
    return outs.reshape(ntiles * R, NC)


def banded_gather(values, nbr, starts, W: int, mode: str = "pallas"):
    """Run the banded gather with an explicit, pre-resolved mechanism
    (one of resolve_band's non-'off' returns)."""
    if mode == "xla":
        return banded_gather_xla(values, nbr, starts, W)
    if mode == "interpret":
        return banded_gather_pallas(values, nbr, starts, W, interpret=True)
    return banded_gather_pallas(values, nbr, starts, W)
