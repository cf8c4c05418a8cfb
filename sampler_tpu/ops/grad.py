"""Moment-factored fused gradient kernel: one Pallas pass per (color,
tier) computing the contrastive-SGD weight gradient's per-weight partials.

History (LEARN_PROFILE.json r3, LEARN_PROFILE_r4.json): the cs-stream XLA
gradient was 50.6% of a learning epoch; the round-4 kernel v1 fused the
banded gather + per-plane counts-phi into VMEM and came out 2.2x SLOWER —
VPU-bound on ~20 ops x [TB, 2NC] x D planes of phi per tile, while the MXU
gather it saved was only ~4 us.  This v2 removes the per-lane phi (and the
gather itself) entirely:

For an affine2 tier (pairwise boolean, compile.py), phi of one record is
BILINEAR in the binary (own value o, gathered neighbor value n):

    phi(o, n) = p00 + ao*o + an*n + ax*o*n        (compile-time p/a's)

so the signed lane reduce the gradient needs factorizes into 3 MOMENTS:

    sum_lane sgn * phi = ao*So[b] + an*Sn[r] + ax*Sx[r]     (p00*sum sgn = 0)
    So[b] = sum_lane sgn * v_own[b]        one [TB, 2NC] reduce per tile
    Sn[r] = sum_lane sgn * v_nbr[r]        = onehot . wsum,
                                           wsum[w] = sum_lane sgn * win[w]
    Sx[r] = sum_lane sgn * v_own*v_nbr     = onehot . (win @ (v_own*sgn)^T)

— one [W, 2NC] x [TB, 2NC] MXU matmul + cheap masked reduces.  The phi
type/negation/head/mask semantics live entirely in the compile-time
coefficients (ao = ab_a and ax = ab_b are the affine-fold streams; an is
the one new stream gd_an), so pad slots and arity-1 records are correct by
construction (an = ax = 0 there — the class of bug the round-4 advisor
found in v1's in-kernel literal masking cannot exist here).

Reference behavior replaced: the gradient accumulation of
sample_sgd_single_variable (SURVEY.md §3.3) — phi(evidence) − phi(free)
summed per weight over each factor's owner record.
"""
from __future__ import annotations

from functools import partial

GRAD_W_MAX = 64          # in-kernel weight-loop bound (small-W graphs)


def _grad_kernel(starts_ref, own0_ref, coff_ref, nbr_ref, wid_ref, coef_ref,
                 ao_ref, an_ref, ax_ref, values_ref, out_ref, win_ref,
                 own_ref, sems, *, W: int, TB: int, D: int, NW: int,
                 NC2: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    t = pl.program_id(0)
    j = jax.lax.rem(t, 8)              # row within the (1, 8, R) block
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
    il = nbr_ref[0, pl.ds(j, 1), :] - start            # [1, R]
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, R), 0)
    oh = (il == iota_w).astype(jnp.int8)               # [W, R]

    # lane sign: +1 evidence half, -1 free half (arithmetic form — Mosaic
    # rejects scalar-branch selects over bool tensors)
    lane_o = jax.lax.broadcasted_iota(jnp.int32, (TB, NC2), 1)
    sgn_o = f32(1.0) - f32(2.0) * (lane_o >= NC2 // 2).astype(f32)
    cp_o.wait()
    osgn = own_ref[:].astype(f32) * sgn_o              # [TB, 2NC]
    So = jnp.sum(osgn, axis=1, keepdims=True)          # [TB, 1]

    cp_w.wait()
    lane_w = jax.lax.broadcasted_iota(jnp.int32, (W, NC2), 1)
    sgn_w = f32(1.0) - f32(2.0) * (lane_w >= NC2 // 2).astype(f32)
    wsum = jnp.sum(win_ref[:].astype(f32) * sgn_w, axis=1,
                   keepdims=True)                      # [W, 1]
    # MT[w, b] = sum_lane win[w]*osgn[b] — the ONLY matmul; operands are
    # exact in bf16 (win in {0,1}, osgn in {-1,0,1}), f32 accumulation
    MT = jax.lax.dot_general(
        win_ref[:].astype(jnp.bfloat16), osgn.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)                    # [W, TB]

    # streams arrive as [1, R] rows (a [.., R, 1] HBM array would tile-pad
    # its trailing 1 to 128 lanes); transpose to columns once in VMEM
    coef = coef_ref[0, pl.ds(j, 1), :].reshape(R, 1)
    ao = ao_ref[0, pl.ds(j, 1), :].reshape(R, 1)
    an = an_ref[0, pl.ds(j, 1), :].reshape(R, 1)
    ax = ax_ref[0, pl.ds(j, 1), :].reshape(R, 1)
    wid = wid_ref[0, pl.ds(j, 1), :].reshape(R, 1)

    accs = [jnp.zeros((TB, 1), f32) for _ in range(NW)]
    for d in range(D):                                 # static unroll
        sl = slice(d * TB, (d + 1) * TB)
        ohd = oh[:, sl].astype(f32)                    # [W, TB]
        Sn = jnp.sum(ohd * wsum, axis=0, keepdims=True).reshape(TB, 1)
        Sx = jnp.sum(ohd * MT, axis=0, keepdims=True).reshape(TB, 1)
        val = coef[sl] * (ao[sl] * So + an[sl] * Sn + ax[sl] * Sx)
        wd = wid[sl]
        for w in range(NW):
            accs[w] = accs[w] + (wd == w).astype(f32) * val

    # out block is (1, 8, 128): Mosaic requires the last two block dims
    # divisible by (8, 128); the partials live in sublane row 0, the rest
    # are zeros (the caller sums over both leading axes)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.zeros((8, 128), f32)
    for w in range(NW):
        out = out + ((iota_l == w) & (iota_s == 0)).astype(f32) \
            * jnp.sum(accs[w])
    out_ref[0] = out


def grad_pair_tile(v_both, nbr_dmaj, starts, wid, coef, ao, an, ax, c,
                   own0: int, W: int, TB: int, D: int, n_weights: int,
                   interpret: bool = False):
    """Per-tile gradient partials for color ``c`` of one affine2 tier.

    v_both [P, 2NC] int8 (evidence ‖ free worlds on the lane axis);
    nbr_dmaj [C, ntiles, D*TB] int32 global positions (ALL colors, row
    d-major); starts [ntiles] this color's window starts; wid
    [C, ntiles, D*TB] int32 weight ids; coef [C, ntiles, D*TB] f32
    (feat * owner-mask); ao/an/ax [C, ntiles, D*TB] f32 moment
    coefficients (compile.py gd_ao/gd_an/gd_ax); c int32 scalar; own0 =
    first own row of this color's tier segment.  Returns [ntiles, 8, 128]
    f32 (partials in sublane 0, zeros elsewhere) — sum over the leading
    two axes, take [:n_weights], divide by NC outside.  The color rides a
    scalar prefetch into the index maps — no per-color stream slices."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_weights <= GRAD_W_MAX
    ntiles = starts.shape[0]
    R = D * TB
    P, NC2 = v_both.shape
    coff = jnp.reshape(jnp.asarray(c, jnp.int32), (1,))
    kern = partial(_grad_kernel, W=W, TB=TB, D=D, NW=n_weights, NC2=NC2,
                   interpret=interpret)
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
            pl.BlockSpec((1, 8, R), rmap),
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
            vma=out_vma(v_both, nbr_dmaj, starts, wid, coef, ao, an, ax,
                        coff)),
        cost_estimate=pl.CostEstimate(
            flops=2 * ntiles * W * TB * NC2,
            transcendentals=0,
            bytes_accessed=int(ntiles * (R * 20 + (W + TB) * NC2 + 512))),
        interpret=interpret,
    )(starts, own0_arr, coff, nbr_dmaj, wid, coef, ao, an, ax, v_both)
