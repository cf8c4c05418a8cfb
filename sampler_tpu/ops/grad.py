"""Fused gradient kernel: one Pallas pass per (color, tier) that computes
the contrastive-SGD weight gradient's per-weight partial sums.

LEARN_PROFILE.json round-3: the cs-stream gradient was 50.6% of a learning
epoch — one 2NC-wide banded gather plus counts-φ over every incidence row,
with the [rows, D, NC] temporaries flowing through HBM between XLA ops.
This kernel keeps the whole evaluation in VMEM per tile: window DMA +
one-hot MXU gather + counts-φ + signed lane-reduce + per-weight masked
accumulation, emitting only [ntiles, 128] partial sums.  Applicable to the
same tiers as the fused affine draw (pairwise boolean, single-window
banding) with a small weight table (owner-coefficient streams gd_* are
built at compile time alongside ab_a/ab_b).

Reference behavior replaced: the gradient accumulation of
sample_sgd_single_variable (SURVEY.md §3.3) — φ(evidence) − φ(free) summed
per weight over the factors each variable visit touches, owner-deduplicated
here so every factor counts once per sweep.
"""
from __future__ import annotations

from functools import partial

from .. import format_spec as fs

GRAD_W_MAX = 64          # in-kernel weight-loop bound (small-W graphs)


def _phi_counts_jnp(nlit, head, n, f_type, present):
    """jnp twin of engine._phi_from_counts, local to avoid an import cycle
    (engine.multichain imports ops.* at module level)."""
    import jax.numpy as jnp

    f32 = jnp.float32
    if head is not None:
        headi = head.astype(jnp.int32)
        nbody = nlit - headi
        n_body = jnp.maximum(n - 1, 0)

    def variant(t):
        if t in (fs.FUNC_AND, fs.FUNC_AND_CATEGORICAL,
                 fs.FUNC_IMPLY_NATURAL):
            return (nlit == n).astype(f32)
        if t == fs.FUNC_OR:
            return (nlit > 0).astype(f32)
        if t == fs.FUNC_EQUAL:
            return ((nlit == 0) | (nlit == n)).astype(f32)
        if t == fs.FUNC_ISTRUE:
            return head.astype(f32)
        if t == fs.FUNC_IMPLY_MLN:
            # arithmetic form (Mosaic rejects scalar-branch selects):
            # body unsatisfied -> 1, else head — head <= 1 so max works
            return jnp.maximum((nbody < n_body).astype(f32),
                               head.astype(f32))
        # where(head, n_body, n_body - nbody) == n_body - (1-head)*nbody
        lin = (n_body - (1 - headi) * nbody).astype(f32)
        one1 = (n == 1).astype(f32)
        lin = lin + one1 * (head.astype(f32) - lin)
        if t == fs.FUNC_LINEAR:
            return lin
        if t == fs.FUNC_RATIO:
            return jnp.log1p(lin)
        if t == fs.FUNC_LOGICAL:
            return (lin > 0).astype(f32)
        raise ValueError(f"unknown factor function type {t}")

    if len(present) == 1:
        return variant(present[0])
    # masked sum instead of jnp.select: select lowers through an integer
    # argmax that Mosaic only implements for f32; factor types are
    # mutually exclusive so the sum is exact
    out = None
    for t in present:
        term = (f_type == t).astype(f32) * variant(t)
        out = term if out is None else out + term
    return out


def _need_head(present) -> bool:
    return any(t in present for t in (
        fs.FUNC_ISTRUE, fs.FUNC_IMPLY_MLN, fs.FUNC_LINEAR, fs.FUNC_RATIO,
        fs.FUNC_LOGICAL))


def _grad_kernel(starts_ref, own0_ref, coff_ref, nbr_ref, meta_ref, wid_ref,
                 coef_ref, values_ref, out_ref, win_ref, own_ref, sems,
                 *, W: int, TB: int, D: int, NW: int, NC2: int,
                 present: tuple, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t = pl.program_id(0)
    start = pl.multiple_of(starts_ref[t], 256)
    cp_w = pltpu.make_async_copy(
        values_ref.at[pl.ds(start, W), :], win_ref, sems.at[0])
    cp_w.start()
    # own0 is a multiple of 8 by construction (tier offsets and color
    # blocks are align-8); Mosaic needs the proof hint for the sliced DMA
    own_start = pl.multiple_of(own0_ref[0] + t * TB, 8)
    cp_o = pltpu.make_async_copy(
        values_ref.at[pl.ds(own_start, TB), :], own_ref, sems.at[1])
    cp_o.start()

    R = D * TB
    il = nbr_ref[0] - start                                # [1, R]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    oh = (il == iota_w).astype(jnp.int8)
    cp_w.wait()
    gath = jax.lax.dot_general(
        oh, win_ref[:].astype(jnp.int8),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)                  # [R, NC2]
    cp_o.wait()

    # streams arrive as [1, R] rows (a [.., R, 1] HBM array would tile-pad
    # its trailing 1 to 128 lanes); transpose to columns once in VMEM
    meta = meta_ref[0].reshape(R, 1)                       # packed consts
    o1 = meta & 3
    o0 = (meta >> 2) & 3
    headpos = ((meta >> 4) & 1) == 1
    head_own = ((meta >> 5) & 1) == 1
    hn = ((meta >> 6) & 1) == 1
    pos_n = ((meta >> 7) & 1) == 1
    n_true = (meta >> 8) & 0xFF
    f_type = (meta >> 16) & 0xFF
    nvalid = ((meta >> 24) & 1) == 1      # neighbor slot 0 is real non-own
    coef = coef_ref[0].reshape(R, 1)                       # f32
    wid = wid_ref[0].reshape(R, 1)                         # int32

    vown = own_ref[:].astype(jnp.int32)                    # [TB, NC2]
    # lane sign: +1 on the evidence half, -1 on the free half.  NOTE the
    # arithmetic forms below avoid jnp.where with SCALAR branches, which
    # the Mosaic TPU lowering rejects (observed: 'Only float32 is
    # supported' from a select over bool[TB,NC2] with f32[] operands).
    lane = jax.lax.broadcasted_iota(jnp.int32, (TB, NC2), 1)
    sgn = jnp.float32(1.0) - jnp.float32(2.0) * (
        lane >= NC2 // 2).astype(jnp.float32)

    need_head = _need_head(present)
    accs = [jnp.zeros((TB, 1), jnp.float32) for _ in range(NW)]
    for d in range(D):                                     # static unroll
        sl = slice(d * TB, (d + 1) * TB)
        v_n = gath[sl]                                     # [TB, NC2]
        # mask pad/own-only slots: a gathered 0 on a pos_n=False pad slot
        # must NOT count as a satisfied neighbor literal (ADVICE r4)
        nlit = (((v_n == 1) == pos_n[sl]) & nvalid[sl]).astype(jnp.int32)
        v1 = vown == 1
        v1i = v1.astype(jnp.int32)
        nown = o0[sl] + (o1[sl] - o0[sl]) * v1i
        if need_head:
            hl = ((v_n == 1) == pos_n[sl]) & hn[sl] & nvalid[sl]
            own_head = (v1 & headpos[sl]) | (~v1 & ~headpos[sl])
            head = (head_own[sl] & own_head) | (~head_own[sl] & hl)
        else:
            head = None
        phi = _phi_counts_jnp(nlit + nown, head, n_true[sl], f_type[sl],
                              present)                     # [TB, NC2]
        srow = jnp.sum(phi * sgn, axis=1, keepdims=True)   # [TB, 1]
        srow = srow * coef[sl]
        wd = wid[sl]
        for w in range(NW):
            accs[w] = accs[w] + (wd == w).astype(jnp.float32) * srow

    # out block is (1, 8, 128): Mosaic requires the last two block dims
    # divisible by (8, 128); the partials live in sublane row 0, the rest
    # are zeros (the caller sums over both leading axes)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.zeros((8, 128), jnp.float32)
    for w in range(NW):
        out = out + ((iota_l == w) & (iota_s == 0)).astype(jnp.float32) \
            * jnp.sum(accs[w])
    out_ref[0] = out


def grad_pair_tile(v_both, nbr_dmaj, starts, meta, wid, coef, c, own0: int,
                   W: int, TB: int, D: int, n_weights: int,
                   present: tuple, interpret: bool = False):
    """Per-tile gradient partials for color ``c`` of one tier.

    v_both [P, 2NC] int8 (evidence ‖ free worlds on the lane axis);
    nbr_dmaj [C, ntiles, D*TB] int32 global positions (ALL colors);
    starts [ntiles] (this color's window starts); meta/wid
    [C, ntiles, D*TB] int32; coef [C, ntiles, D*TB] f32 (feat *
    owner-mask; row d-major); c int32 scalar; own0 = first own row of this
    color's tier segment.  Returns [ntiles, 8, 128] f32 (partials in
    sublane 0, zeros elsewhere) — sum over the leading two axes, take
    [:n_weights], divide by NC outside.  The color rides a scalar prefetch
    into the index maps — no per-color stream slices."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_weights <= GRAD_W_MAX
    ntiles = nbr_dmaj.shape[1]
    R = D * TB
    P, NC2 = v_both.shape
    coff = jnp.reshape(jnp.asarray(c, jnp.int32), (1,))
    kern = partial(_grad_kernel, W=W, TB=TB, D=D, NW=n_weights, NC2=NC2,
                   present=tuple(present), interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, 1, R), lambda t, s, z, co: (co[0], t, 0)),
            pl.BlockSpec((1, 1, R), lambda t, s, z, co: (co[0], t, 0)),
            pl.BlockSpec((1, 1, R), lambda t, s, z, co: (co[0], t, 0)),
            pl.BlockSpec((1, 1, R), lambda t, s, z, co: (co[0], t, 0)),
            pl.BlockSpec(memory_space=pl.ANY),                    # v_both
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda t, s, z, co: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((W, NC2), v_both.dtype),
            pltpu.VMEM((TB, NC2), v_both.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    from .banded import out_vma

    own0_arr = jnp.full((1,), own0, jnp.int32)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (ntiles, 8, 128), jnp.float32,
            vma=out_vma(v_both, nbr_dmaj, starts, meta, wid, coef, coff)),
        cost_estimate=pl.CostEstimate(
            flops=2 * ntiles * R * W * NC2,
            transcendentals=0,
            bytes_accessed=int(ntiles * (R * 16 + (W + TB) * NC2 + 512))),
        interpret=interpret,
    )(starts, own0_arr, coff, nbr_dmaj, meta, wid, coef, v_both)
