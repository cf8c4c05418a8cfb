"""Fused affine color step: one Pallas kernel per color for pairwise
boolean graphs — the flagship fast path.

For an all-boolean graph whose factors have arity <= 2, the conditional
log-odds of variable b is AFFINE in its gathered neighbor values:

    delta[b] = logit(v_b=1) - logit(v_b=0)
             = sum_d wf[b,d] * (dphi_a[b,d] + dphi_b[b,d] * v[nbr[b,d]])
             = base[b] + sum_d beta[b,d] * v[nbr[b,d]]

where dphi_a = phi(1,v=0)-phi(0,v=0) and dphi_b its v-slope are COMPILE-TIME
constants per incidence record (any boolean function of one binary neighbor
value is affine in it), and wf = weights[wid]*feature folds in whenever the
weights change.  Combined with the banded window plan (ops/banded.py), the
ENTIRE color step becomes, per tile of TB variables:

    M[w, b]   = sum_d beta[b,d] * onehot(nbr[b,d] - start)[w]   (VPU build)
    delta     = M^T @ values[start:start+W, :] + base           (MXU)
    new_vals  = uniform() < sigmoid(delta)                      (VPU + HW RNG)

— one window DMA, one matmul, and a draw from the on-core PRNG, with no
intermediate ever touching HBM.  This is the TPU-native answer to the
reference's entire sample_single_variable inner loop (ref:
src/gibbs_sampler.cc — recalled; SURVEY.md §3.2) for the pairwise-boolean
workloads that dominate KBC graphs.

Distribution-exact: M is built in f32 (or error-free split bf16x2), and
uniform-vs-sigmoid is the same Bernoulli draw as the unfused delta path —
only the RNG stream differs (per-core hardware PRNG seeded per
(sweep, color, tile)).
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np

from .. import format_spec as fs


# --------------------------------------------------------------------------
# compile-time affine analysis (numpy)
# --------------------------------------------------------------------------

def _phi_np(nlit, head, n, ftype, present=None):
    """Vectorized numpy twin of engine._phi_from_counts (float32).

    ``present``: iterable of factor-function ids actually in the graph —
    only those variants are evaluated (compile-time cost is proportional to
    the functions used, not all ten)."""
    if present is None:
        present = fs.ALL_FACTOR_FUNCS
    present = set(int(t) for t in present)
    f32 = np.float32

    def lin_stat():
        nbody = nlit - head.astype(np.int32)
        n_body = np.maximum(n - 1, 0)
        lin = np.where(head, n_body, n_body - nbody).astype(f32)
        return np.where(n == 1, head.astype(f32), lin)

    def variant(t):
        if t in (fs.FUNC_AND, fs.FUNC_AND_CATEGORICAL,
                 fs.FUNC_IMPLY_NATURAL):
            return nlit == n
        if t == fs.FUNC_OR:
            return nlit > 0
        if t == fs.FUNC_EQUAL:
            return (nlit == 0) | (nlit == n)
        if t == fs.FUNC_ISTRUE:
            return head
        if t == fs.FUNC_IMPLY_MLN:
            nbody = nlit - head.astype(np.int32)
            return np.where(nbody < np.maximum(n - 1, 0), f32(1.0),
                            head.astype(f32))
        if t == fs.FUNC_LINEAR:
            return lin_stat()
        if t == fs.FUNC_RATIO:
            return np.log1p(lin_stat())
        if t == fs.FUNC_LOGICAL:
            return lin_stat() > 0
        raise ValueError(f"unknown factor function type {t}")

    present = sorted(present)
    if len(present) == 1:
        return np.asarray(variant(present[0]), f32)
    out = np.zeros(np.shape(nlit), f32)
    for t in present:
        np.copyto(out, variant(t), where=(ftype == t))
    return out


def affine_pairwise(cs_pos, cs_mask, cs_ismine, cs_hmask, cs_type,
                    present=None):
    """Per-incidence affine coefficients (a, b) of delta-phi in the single
    neighbor value v:  phi(own=1, v) - phi(own=0, v) = a + b*v.

    All inputs [..., D, A] with A <= 2 (own-last slot permutation).
    Returns float32 (a, b) of shape [..., D].  Handles n_own == arity
    (repeated-variable / unary factors: b == 0) and padded records
    (mask all-False: a == b == 0 since every phi is constant there).
    """

    def phi(k, v):
        val = np.where(cs_ismine, k, v)
        lits = ((val == 1) == cs_pos) & cs_mask
        nlit = lits.sum(-1, dtype=np.int32)
        n = cs_mask.sum(-1, dtype=np.int32)
        head = (lits & cs_hmask).any(-1)
        return _phi_np(nlit, head, n, cs_type, present)

    d0 = phi(1, 0) - phi(0, 0)
    d1 = phi(1, 1) - phi(0, 1)
    return d0.astype(np.float32), (d1 - d0).astype(np.float32)


# --------------------------------------------------------------------------
# runtime weight fold (XLA, jit-able; once per weights value)
# --------------------------------------------------------------------------

def _fold_base(x, C: int, B: int, D: int, TB: int):
    """[C, nt, TB] per-row sum over D of a flat d-minor stream.

    For small D the obvious ``x.reshape(C, B, D).sum(-1)`` materializes a
    [.., D]-minor HLO temp that XLA tile-pads (8, 128) — 25.6x at D = 5,
    a 12.5 GB phantom that OOM'd the 5120^2 fold on chip.  D strided
    slices of the FLAT stream (all 1-D temps, linear tiling) avoid every
    small-minor-dim layout; large D keeps the reshape (minor >= 64 pads
    <= 2x and the slice unroll would dominate compile time)."""
    import jax.numpy as jnp

    nt = B // TB
    if D >= 64:
        return jnp.sum(x.reshape(C, B, D), axis=-1).reshape(C, nt, TB)
    acc = x[0::D]
    for d in range(1, D):
        acc = acc + x[d::D]
    return acc.reshape(C, nt, TB)


def _fold_rows(x, C: int, B: int, D: int, TB: int):
    """[C, nt, D*TB] d-major kernel rows from a flat d-minor stream —
    same strided-slice trick as _fold_base (the [C, nt, TB, D] transpose
    input is another [.., D]-minor padded temp)."""
    import jax.numpy as jnp

    nt = B // TB
    if D >= 64:
        return (x.reshape(C, nt, TB, D).transpose(0, 1, 3, 2)
                 .reshape(C, nt, D * TB))
    planes = [x[d::D].reshape(C, nt, TB) for d in range(D)]
    # stacked [C, nt, D, TB]: minor dims (D, TB) pad D -> 8 only (< 1.6x)
    return jnp.stack(planes, axis=2).reshape(C, nt, D * TB)


def fold_affine(ts, ti, C: int, weights):
    """(beta [C, ntiles, D*TB] d-major, base [C, ntiles, TB]) for one
    tier's streams (``ts``: compile.TierStreams, ``ti``: TierInfo).

    Works on every stream layout (flat at-rest 1-D, per-color 2-D,
    legacy multi-D): the inputs are elementwise in record order, and the
    output reshapes see the same row-major element order either way.
    Output layouts keep the last two dims large (no (8, 128) tile-padding
    blowup at rest: a [.., TB, 1] base padded 128x, a [.., 1, R] beta 8x);
    the kernels read blocks (1, 1, R) / (1, 1, TB) at (c, t, 0)."""
    from ..compile import tier_geom
    from .weights import expand_wf

    B, D, _ = tier_geom(ts, ti, C)
    # scatter-free weight expansion: the plain weights[cs_wid] row gather
    # over C*B*D rows is issue-rate bound and cost 1.7x a whole fused sweep
    # per epoch (profile_learn, r2 #8)
    wf = expand_wf(weights, ts.cs_wid, ts.cs_feat)     # record order
    TB = ti.band_tb
    beta = _fold_rows((wf * ts.ab_b).reshape(-1), C, B, D, TB)
    base = _fold_base((wf * ts.ab_a).reshape(-1), C, B, D, TB)
    return beta, base


def affine_cat(cs_pos, cs_mask, cs_ismine, cs_hmask, cs_type, present=None):
    """K-candidate (categorical) affine analysis for arity<=2 tiers where
    every real incident factor has exactly ONE own slot (own-last slot A-1;
    neighbor slot 0).

    Literals are binary even for categorical variables — lit = (value ==
    eqpred) == ispos — so phi is a 4-point table T[olit, nlit] of
    compile-time constants, and the candidate-k log-potential of one
    incidence reduces (dropping k-independent terms, which cancel in the
    softmax) to

        wf * (a + b * e) * [k == eq_own],   e = [v_nbr == eq_nbr],

    with a = sgn_o*((T10-T00) + D*(1-pos_n)),  b = sgn_o*D*(2*pos_n-1),
    D = T11-T10-T01+T00, sgn_o = 2*pos_own-1.  Arity-1 incidences fall out
    automatically (neighbor slot masked -> T01==T00, T11==T10 -> b == 0).

    Returns float32 (a, b) of shape [..., D] (pre-weight coefficients;
    fold_affine_cat multiplies by wf at weights-change time).
    TPU-native replacement for the categorical branch of the reference's
    sample_single_variable inner loop (SURVEY.md §3.2, §2b).
    """

    def phi(o, ln):
        lits = np.where(cs_ismine, o, ln) & cs_mask
        nlit = lits.sum(-1, dtype=np.int32)
        n = cs_mask.sum(-1, dtype=np.int32)
        head = (lits & cs_hmask).any(-1)
        return _phi_np(nlit, head, n, cs_type, present)

    t00 = phi(False, False)
    t01 = phi(False, True)
    t10 = phi(True, False)
    t11 = phi(True, True)
    pos_o = cs_pos[..., -1]
    pos_n = cs_pos[..., 0]
    dd = t11 - t10 - t01 + t00
    sgn_o = np.where(pos_o, np.float32(1.0), np.float32(-1.0))
    a = sgn_o * ((t10 - t00) + dd * (~pos_n))
    b = sgn_o * dd * np.where(pos_n, np.float32(1.0), np.float32(-1.0))
    return a.astype(np.float32), b.astype(np.float32)


def fold_affine_cat(ts, ti, C: int, weights):
    """(av, bv, kmask) for one tier's K-candidate fused step: av/bv
    row-d-major [C, ntiles, D*TB] f32 — the compile-time (a, b)
    coefficients scaled by wf = weights[wid]*feat — plus the draw mask in
    kernel block layout [C, ntiles, TB, K] (built here, NOT stored at rest:
    a K-minor array tile-pads 128/K in HBM, so cm_kmask lives flat and only
    this per-fold working copy pays the padding).  Called once per weights
    value (outside the sweep loops)."""
    import jax.numpy as jnp

    from ..compile import tier_geom
    from .weights import expand_wf

    B, D, _ = tier_geom(ts, ti, C)
    wf = expand_wf(weights, ts.cs_wid, ts.cs_feat)     # record order
    TB = ti.band_tb
    nt = B // TB
    av = _fold_rows((wf * ts.cs_cka).reshape(-1), C, B, D, TB)
    bv = _fold_rows((wf * ts.cs_ckb).reshape(-1), C, B, D, TB)
    kmask = jnp.reshape(ts.cm_kmask, (C, nt, TB, -1))
    return av, bv, kmask


def fold_deltam(ts, ti, C: int, weights):
    """Weight-folded multilinear delta coefficients for one deltam tier:
    (base [C*B] flat, b1 [C*B*D] flat, b2, bx — the last two None for
    pairwise tiers, whose cross terms are identically zero) with
    base = Σ_d wf·a and b* = wf·coeff (wf = weights[wid]·feat).

    Pairwise tiers carry their coefficients in ab_a/ab_b (the affine
    analysis — identical algebra), with dm_* left as [C, 1, 1]
    placeholders; arity-3 tiers use the dm_* corner streams.  Outputs
    stay FLAT — they live across the whole sweep scan, and a resident
    [C, B, D] form would tile-pad 128/D in HBM."""
    import jax.numpy as jnp

    from ..compile import tier_geom
    from .weights import expand_wf

    B, D, _ = tier_geom(ts, ti, C)
    wf = expand_wf(weights, ts.cs_wid, ts.cs_feat)     # record order
    a_src = ts.dm_a if ts.dm_a.size != C else ts.ab_a
    b1_src = ts.dm_b1 if ts.dm_b1.size != C else ts.ab_b
    # strided-slice row sum (see _fold_base): no [.., D]-minor padded temp
    x = (wf * a_src).reshape(-1)
    if D >= 64:
        base = jnp.sum(x.reshape(C, B, D), axis=-1).reshape(-1)
    else:
        base = x[0::D]
        for d in range(1, D):
            base = base + x[d::D]
    b1 = (wf * b1_src).reshape(-1)
    if ts.dm_b2.size == C:                 # pairwise: no cross terms
        return (base, b1, None, None)
    return (base, b1, (wf * ts.dm_b2).reshape(-1),
            (wf * ts.dm_x).reshape(-1))


def fold_deltam_tiles(ts, ti, C: int, weights):
    """Weight-folded multilinear coefficients in KERNEL BLOCK LAYOUT for a
    fusedm tier (TierInfo.fusedm): (base [C, nt, TB], b1 [C, nt, D*TB],
    b2, bx — the last two None for pairwise tiers).  Same algebra as
    fold_deltam, different at-rest shape: the fused_dm_draw kernel reads
    (1, 8, R) / (1, 8, TB) blocks with an in-kernel row select, and the
    last two dims are both large so the (8, 128) HBM tile padding is
    negligible (see fold_affine)."""
    import jax.numpy as jnp

    from ..compile import tier_geom
    from .weights import expand_wf

    B, D, _ = tier_geom(ts, ti, C)
    wf = expand_wf(weights, ts.cs_wid, ts.cs_feat)     # record order
    a_src = ts.dm_a if ts.dm_a.size != C else ts.ab_a
    b1_src = ts.dm_b1 if ts.dm_b1.size != C else ts.ab_b
    TB = ti.band_tb
    base = _fold_base((wf * a_src).reshape(-1), C, B, D, TB)
    b1 = _fold_rows((wf * b1_src).reshape(-1), C, B, D, TB)
    if ts.dm_b2.size == C:                 # pairwise: no cross terms
        return (base, b1, None, None)
    return (base, b1,
            _fold_rows((wf * ts.dm_b2).reshape(-1), C, B, D, TB),
            _fold_rows((wf * ts.dm_x).reshape(-1), C, B, D, TB))


def fused_mode() -> str:
    """'auto' | 'on' | 'interpret' | 'off' (env SAMPLER_TPU_FUSED)."""
    return os.environ.get("SAMPLER_TPU_FUSED", "auto").lower()


def resolve_fused(info, band: str, backend: str | None = None) -> str:
    """Resolve the fused-affine mechanism: 'pallas' | 'interpret' | 'off'.

    ``band`` is resolve_band's result.  The fused step is Pallas-only
    (the unfused delta path IS the XLA fallback), so banding mode 'xla'
    — "no Mosaic anywhere" — must never route here.  Like resolve_band,
    call OUTSIDE jit so the decision is part of the jit cache key."""
    if not (getattr(info, "affine2", False)
            or getattr(info, "affinek", False)
            or getattr(info, "fusedm", False)):
        return "off"
    mode = fused_mode()
    if mode == "off":
        return "off"
    if mode == "interpret":
        return "interpret"
    if mode == "on":
        import jax

        backend = backend or jax.default_backend()
        return "pallas" if backend in ("tpu", "axon") else "interpret"
    # auto: follow the banded mechanism (native or interpreted Pallas)
    return band if band in ("pallas", "interpret") else "off"


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _portable_bits(shape, s0, s1):
    """Counter-based 32-bit avalanche hash (lowbias32, two rounds with a
    seed word injected between them) — the interpret-mode stand-in for
    the TPU hardware PRNG, which has no CPU lowering."""
    import jax
    import jax.numpy as jnp

    cnt = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
           * jnp.uint32(shape[1])
           + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))

    def mix(x):
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7FEB352D)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846CA68B)
        return x ^ (x >> 16)

    x = mix(cnt ^ jnp.asarray(s0).astype(jnp.uint32))
    return mix(x ^ jnp.asarray(s1).astype(jnp.uint32))


def _fused_kernel(starts_ref, seed_ref, coff_ref, nbr_ref, beta_ref,
                  base_ref, values_ref, out_ref, win_ref, sem,
                  *, W: int, TB: int, D: int, split_bf16: bool,
                  interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    # stream blocks are (1, 8, R) — Mosaic requires the penultimate block
    # dim divisible by 8, and a [.., 1, R] at-rest layout would tile-pad
    # 8x in HBM — so 8 consecutive tiles share one fetched block (Pallas
    # skips the refetch while the block index t//8 repeats) and each
    # invocation selects its row
    j = jax.lax.rem(t, 8)
    start = pl.multiple_of(starts_ref[t], 256)
    copy = pltpu.make_async_copy(
        values_ref.at[pl.ds(start, W), :], win_ref, sem)
    copy.start()
    # max 2 seed words: mix the tile id into the second.  The Knuth
    # multiplier 0x9E3779B1 == 2654435761 does not fit int32 as a Python
    # literal (trace-time OverflowError); use its two's-complement value.
    knuth = jnp.int32(-1640531535)                     # 0x9E3779B1
    tseed = seed_ref[1] ^ (t * knuth)
    if not interpret:
        pltpu.prng_seed(seed_ref[0], tseed)

    R = D * TB
    il = nbr_ref[0, pl.ds(j, 1), :] - start            # [1, R] d-major
    iota = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    moh = jnp.where(il == iota, beta_ref[0, pl.ds(j, 1), :],
                    0.0)                               # β-scaled one-hot
    # reduce the D slot planes: columns are d-major, so each plane is a
    # whole-register slice [W, TB]
    M = moh[:, :TB]
    for d in range(1, D):                              # static unroll
        M = M + moh[:, d * TB:(d + 1) * TB]

    copy.wait()
    if split_bf16:
        # error-free two-term split: bf16 MXU at 2x the f32 rate, f32 acc
        wv = win_ref[:].astype(jnp.bfloat16)           # values exact in bf16
        m_hi = M.astype(jnp.bfloat16)
        m_lo = (M - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))
        delta = (jax.lax.dot_general(m_hi, wv, dn,
                                     preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(m_lo, wv, dn,
                                       preferred_element_type=jnp.float32))
    else:
        wv = win_ref[:].astype(jnp.float32)
        delta = jax.lax.dot_general(
            M, wv, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [TB, NC]
    # base arrives as a [1, TB] row (block (1, 1, TB) of the [C, nt, TB]
    # fold — a [.., TB, 1] layout would tile-pad 128x at rest); transpose
    # to a column in VMEM for the per-row broadcast
    delta = delta + base_ref[0, pl.ds(j, 1), :].reshape(TB, 1)

    if interpret:
        bits = _portable_bits(delta.shape, seed_ref[0], tseed)
    else:
        bits = pltpu.prng_random_bits(delta.shape)
    # sign-safe 24-bit uniform: mask AFTER the shift so an arithmetic
    # (signed) shift of a negative word cannot leak sign bits into u
    u24 = jax.lax.shift_right_logical(
        bits, jnp.asarray(8, bits.dtype)).astype(jnp.int32) \
        & jnp.int32(0xFFFFFF)
    u = u24.astype(jnp.float32) * jnp.float32(2.0 ** -24) \
        + jnp.float32(2.0 ** -25)
    out_ref[:] = (u < jax.nn.sigmoid(delta)).astype(out_ref.dtype)


def fused_color_draw(values, nbr_dmaj, starts, beta, base, c, seed,
                     W: int, TB: int, D: int,
                     interpret: bool = False, split_bf16: bool = True):
    """Run the fused color step for color ``c``.

    values [P, NC] int8;  nbr_dmaj [C, ntiles, D*TB] int32 (ALL colors —
    global positions, d-major within tile);  starts [ntiles] int32 (this
    color's window starts);  beta [C, ntiles, D*TB] f32;
    base [C, ntiles, TB] f32;  c int32 scalar (traced ok);  seed int32[2].
    Returns drawn values [ntiles*TB, NC] int8.

    The color is a SCALAR-PREFETCH operand read by the block index maps
    ((c, t, 0)), so no per-color slice of the big streams is ever
    materialized — slicing [C, nt, R] per color inside the sweep loop
    copied the whole stream once per color step (HBM bandwidth the matmuls
    then starve for).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntiles = starts.shape[0]          # REAL tiles (arrays may pad axis 1)
    assert nbr_dmaj.shape[1] % 8 == 0, (
        "kernel streams need ntiles % 8 == 0 (compile pads tier blocks "
        "to band_tile*8)")
    R = D * TB
    P, NC = values.shape
    coff = jnp.reshape(jnp.asarray(c, jnp.int32), (1,))
    kern = partial(_fused_kernel, W=W, TB=TB, D=D, split_bf16=split_bf16,
                   interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 8, R), lambda t, s, z, co: (co[0], t // 8, 0)),
            pl.BlockSpec((1, 8, R), lambda t, s, z, co: (co[0], t // 8, 0)),
            pl.BlockSpec((1, 8, TB),
                         lambda t, s, z, co: (co[0], t // 8, 0)),
            pl.BlockSpec(memory_space=pl.ANY),                    # values
        ],
        out_specs=pl.BlockSpec((TB, NC), lambda t, s, z, co: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((W, NC), values.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    from .banded import out_vma

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (ntiles * TB, NC), values.dtype,
            vma=out_vma(values, nbr_dmaj, starts, beta, base, seed, coff)),
        cost_estimate=pl.CostEstimate(
            flops=2 * ntiles * TB * W * NC * (2 if split_bf16 else 1),
            transcendentals=ntiles * TB * NC,
            bytes_accessed=int(ntiles * (R * 8 + W * NC + TB * NC))),
        interpret=interpret,
    )(starts, seed, coff, nbr_dmaj, beta, base, values)


# --------------------------------------------------------------------------
# K-candidate (categorical) fused kernel
# --------------------------------------------------------------------------

def _cat_kernel(starts_ref, seed_ref, coff_ref, nbr_ref, eqo_ref, eqn_ref,
                av_ref, bv_ref, kmask_ref, values_ref, out_ref, win_ref,
                sem, *, W: int, TB: int, D: int, K: int, interpret: bool):
    """One tile of the K-candidate fused color step.

    Per tile: DMA the value window -> one-hot MXU gather of the D*TB
    neighbor values -> e = (gathered == eq_nbr) -> per-candidate masked
    plane-reduce of (av + bv*e) -> Gumbel-argmax draw over K candidates,
    all in VMEM (the XLA general path materializes [B, D, K, A, NC]
    literal tensors through HBM — that traffic, not the gather, is what
    held categorical below 1e9 updates/s in BENCH_r03)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    j = jax.lax.rem(t, 8)              # row within the (1, 8, R) block
    start = pl.multiple_of(starts_ref[t], 256)
    copy = pltpu.make_async_copy(
        values_ref.at[pl.ds(start, W), :], win_ref, sem)
    copy.start()
    knuth = jnp.int32(-1640531535)                     # 0x9E3779B1
    tseed = seed_ref[1] ^ (t * knuth)
    if not interpret:
        pltpu.prng_seed(seed_ref[0], tseed)

    R = D * TB
    il = nbr_ref[0, pl.ds(j, 1), :] - start            # [1, R] d-major
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    oh = (il == iota_w).astype(jnp.int8)               # [W, R]
    copy.wait()
    acc = jax.lax.dot_general(
        oh, win_ref[:].astype(jnp.int8),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)              # [R, NC] gathered
    NC = acc.shape[-1]
    # streams arrive as [1, R] rows (a [.., R, 1] HBM array would tile-pad
    # its trailing 1 to 128 lanes); transpose to columns once in VMEM
    eqn = eqn_ref[0, pl.ds(j, 1), :].reshape(R, 1)
    av = av_ref[0, pl.ds(j, 1), :].reshape(R, 1)
    bv = bv_ref[0, pl.ds(j, 1), :].reshape(R, 1)
    eqo = eqo_ref[0, pl.ds(j, 1), :].reshape(R, 1)
    e = (acc == eqn).astype(jnp.float32)               # [R, NC]
    contrib = av + bv * e                              # [R, NC]

    best = None
    best_k = jnp.zeros((TB, NC), jnp.int32)
    for k in range(K):                                 # static unroll
        mk = jnp.where(eqo == k, contrib, 0.0)
        lk = mk[:TB]
        for d in range(1, D):
            lk = lk + mk[d * TB:(d + 1) * TB]          # [TB, NC]
        lk = lk + kmask_ref[0, 0][:, k:k + 1]
        if interpret:
            # distinct counter stream per candidate (the hardware PRNG
            # advances between calls; the portable hash must be re-keyed)
            bits = _portable_bits((TB, NC), seed_ref[0],
                                  tseed ^ (knuth * jnp.int32(k + 1)))
        else:
            bits = pltpu.prng_random_bits((TB, NC))
        u24 = jax.lax.shift_right_logical(
            bits, jnp.asarray(8, bits.dtype)).astype(jnp.int32) \
            & jnp.int32(0xFFFFFF)
        u = u24.astype(jnp.float32) * jnp.float32(2.0 ** -24) \
            + jnp.float32(2.0 ** -25)
        g = -jnp.log(-jnp.log(u))
        score = lk + g
        if best is None:
            best = score
        else:
            take = score > best
            best = jnp.where(take, score, best)
            best_k = jnp.where(take, k, best_k)
    out_ref[:] = best_k.astype(out_ref.dtype)


def fused_cat_draw(values, nbr_dmaj, starts, eqo, eqn, av, bv, kmask, c,
                   seed, W: int, TB: int, D: int, K: int,
                   interpret: bool = False):
    """Run the K-candidate fused color step for color ``c`` of one tier.

    values [P, NC] int dtype; nbr_dmaj [C, ntiles, D*TB] int32 global
    positions (ALL colors, d-major); starts [ntiles] int32 this color's
    window DMA starts; eqo/eqn [C, ntiles, D*TB] int32 own-candidate /
    neighbor equality predicates (row d-major); av/bv [C, ntiles, D*TB]
    f32 folded coefficients; kmask [C, ntiles, TB, K] f32 (0 or -1e30 for
    k >= card, from fold_affine_cat); c int32 scalar; seed int32[2].
    Returns drawn values [ntiles*TB, NC].  The color rides a scalar
    prefetch into the index maps — no per-color stream slices in the hot
    loop (see fused_color_draw)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntiles = starts.shape[0]          # REAL tiles (arrays may pad axis 1)
    R = D * TB
    P, NC = values.shape
    coff = jnp.reshape(jnp.asarray(c, jnp.int32), (1,))
    kern = partial(_cat_kernel, W=W, TB=TB, D=D, K=K, interpret=interpret)
    rmap = lambda t, s, z, co: (co[0], t // 8, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 8, R), rmap),
            pl.BlockSpec((1, 8, R), rmap),
            pl.BlockSpec((1, 8, R), rmap),
            pl.BlockSpec((1, 8, R), rmap),
            pl.BlockSpec((1, 8, R), rmap),
            pl.BlockSpec((1, 1, TB, K),
                         lambda t, s, z, co: (co[0], t, 0, 0)),   # kmask
            pl.BlockSpec(memory_space=pl.ANY),                    # values
        ],
        out_specs=pl.BlockSpec((TB, NC), lambda t, s, z, co: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((W, NC), values.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    from .banded import out_vma

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (ntiles * TB, NC), values.dtype,
            vma=out_vma(values, nbr_dmaj, starts, eqo, eqn, av, bv, kmask,
                        seed, coff)),
        cost_estimate=pl.CostEstimate(
            flops=2 * ntiles * R * W * NC,
            transcendentals=2 * ntiles * K * TB * NC,
            bytes_accessed=int(ntiles * (R * 20 + TB * K * 4 + W * NC
                                         + TB * NC))),
        interpret=interpret,
    )(starts, seed, coff, nbr_dmaj, eqo, eqn, av, bv, kmask, values)


# --------------------------------------------------------------------------
# fused multilinear draw kernel (boolean arity <= 3, K-window banding)
# --------------------------------------------------------------------------

def _dm_kernel(starts_ref, seed_ref, coff_ref, nbr_ref, b1_ref, *rest,
               W: int, TB: int, D: int, A1: int, Kw: int, interpret: bool):
    """One tile of the fused multilinear color step.

    Per tile: DMA the Kw value windows -> one [Kw*W, A1*D*TB] one-hot int8
    MXU gather of BOTH neighbor slots -> VPU multilinear combine
    b1*n1 + b2*n2 + bx*n1*n2 -> per-plane reduce -> sigmoid Bernoulli from
    the on-core PRNG.  Serves the banded boolean tiers the affine kernel
    can't: arity-3 (the cross term breaks the affine single-matmul form)
    and multi-window pairwise (band_k >= 2 — any graph with >2 colors).
    TPU-native replacement for the arity-3 branch of the reference's
    sample_single_variable inner loop (SURVEY.md §3.2, §2b LINEAR/IMPLY
    family)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if A1 == 2:
        b2_ref, bx_ref, base_ref, values_ref, out_ref, win_ref, sem = rest
    else:
        base_ref, values_ref, out_ref, win_ref, sem = rest

    t = pl.program_id(0)
    j = jax.lax.rem(t, 8)              # row within the (1, 8, R) block
    copies = []
    start0 = None
    for k in range(Kw):                                # static unroll
        s = starts_ref[t] if Kw == 1 else starts_ref[t, k]
        start = pl.multiple_of(s, 256)
        if k == 0:
            start0 = start
        cp = pltpu.make_async_copy(
            values_ref.at[pl.ds(start, W), :],
            win_ref.at[pl.ds(k * W, W), :], sem.at[k])
        cp.start()
        copies.append(cp)
    knuth = jnp.int32(-1640531535)                     # 0x9E3779B1
    tseed = seed_ref[1] ^ (t * knuth)
    if not interpret:
        pltpu.prng_seed(seed_ref[0], tseed)

    R = D * TB
    il = nbr_ref[0, pl.ds(j, 1), :]                    # [1, A1*R]
    if Kw == 1:
        # single window: stream holds GLOBAL positions (multi-window
        # streams arrive pre-remapped into the concatenated window space)
        il = il - start0
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (Kw * W, A1 * R), 0)
    oh = (il == iota_w).astype(jnp.int8)               # [Kw*W, A1*R]
    for cp in copies:
        cp.wait()
    acc = jax.lax.dot_general(
        oh, win_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)              # [A1*R, NC]
    f32 = jnp.float32
    n1 = acc[:R].astype(f32)
    # coefficient streams arrive as [1, R] rows (a [.., R, 1] HBM array
    # would tile-pad its trailing 1 to 128 lanes); columns in VMEM
    b1 = b1_ref[0, pl.ds(j, 1), :].reshape(R, 1)
    contrib = b1 * n1                                  # [R, NC]
    if A1 == 2:
        n2 = acc[R:].astype(f32)
        b2 = b2_ref[0, pl.ds(j, 1), :].reshape(R, 1)
        bx = bx_ref[0, pl.ds(j, 1), :].reshape(R, 1)
        contrib = contrib + b2 * n2 + bx * (n1 * n2)
    # reduce the D slot planes: columns are d-major, so each plane is a
    # whole-register slice [TB, NC]
    delta = contrib[:TB]
    for d in range(1, D):                              # static unroll
        delta = delta + contrib[d * TB:(d + 1) * TB]
    delta = delta + base_ref[0, pl.ds(j, 1), :].reshape(TB, 1)

    if interpret:
        bits = _portable_bits(delta.shape, seed_ref[0], tseed)
    else:
        bits = pltpu.prng_random_bits(delta.shape)
    # sign-safe 24-bit uniform (see _fused_kernel)
    u24 = jax.lax.shift_right_logical(
        bits, jnp.asarray(8, bits.dtype)).astype(jnp.int32) \
        & jnp.int32(0xFFFFFF)
    u = u24.astype(jnp.float32) * jnp.float32(2.0 ** -24) \
        + jnp.float32(2.0 ** -25)
    out_ref[:] = (u < jax.nn.sigmoid(delta)).astype(out_ref.dtype)


def fused_dm_draw(values, dm_nbr, starts, base, b1, b2, bx, c, seed,
                  W: int, TB: int, D: int, A1: int, Kw: int,
                  interpret: bool = False):
    """Run the fused multilinear color step for color ``c`` of one tier.

    values [P, NC]; dm_nbr [C, ntiles, A1*D*TB] int32 (ALL colors,
    slot-major then d-major — compile.bd_dmnbr); starts [ntiles] (Kw == 1,
    global window starts) or [ntiles, Kw] (multi-window DMA starts);
    base [C, ntiles, TB] f32 and b1/b2/bx [C, ntiles, D*TB] f32 from
    fold_deltam_tiles (b2/bx None for pairwise tiers); c int32 scalar;
    seed int32[2].  Returns drawn values [ntiles*TB, NC].  The color rides
    a scalar prefetch into the index maps — no per-color stream slices in
    the hot loop (see fused_color_draw)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    ntiles = starts.shape[0]          # REAL tiles (arrays may pad axis 1)
    assert dm_nbr.shape[1] % 8 == 0, (
        "kernel streams need ntiles % 8 == 0 (compile pads tier blocks "
        "to band_tile*8*shards)")
    R = D * TB
    P, NC = values.shape
    coff = jnp.reshape(jnp.asarray(c, jnp.int32), (1,))
    kern = partial(_dm_kernel, W=W, TB=TB, D=D, A1=A1, Kw=Kw,
                   interpret=interpret)
    rmap = lambda t, s, z, co: (co[0], t // 8, 0)
    in_specs = [pl.BlockSpec((1, 8, A1 * R), rmap),
                pl.BlockSpec((1, 8, R), rmap)]
    operands = [dm_nbr, b1]
    if A1 == 2:
        in_specs += [pl.BlockSpec((1, 8, R), rmap),
                     pl.BlockSpec((1, 8, R), rmap)]
        operands += [b2, bx]
    in_specs += [pl.BlockSpec((1, 8, TB), rmap),
                 pl.BlockSpec(memory_space=pl.ANY)]    # values stay in HBM
    operands += [base, values]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TB, NC), lambda t, s, z, co: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((Kw * W, NC), values.dtype),
            pltpu.SemaphoreType.DMA((Kw,)),
        ],
    )
    from .banded import out_vma

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (ntiles * TB, NC), values.dtype,
            vma=out_vma(values, dm_nbr, starts, base, b1, seed, coff,
                        *[x for x in (b2, bx) if x is not None])),
        cost_estimate=pl.CostEstimate(
            flops=2 * ntiles * A1 * R * Kw * W * NC,
            transcendentals=ntiles * TB * NC,
            bytes_accessed=int(ntiles * (A1 * R * 4 + (A1 + 1) * R * 4
                                         + Kw * W * NC + 2 * TB * NC))),
        interpret=interpret,
    )(starts, seed, coff, *operands)
