"""Vectorized (jnp) factor-function evaluation — the device-side twin of
factor_functions.py.

Branchless over factor types: every variant is computed on the VPU and the
right one selected by `jnp.select` on the factor-type id.  This is the
TPU-shaped replacement for the reference's per-factor switch statement
(ref: src/factor.cc CompactFactor::potential — recalled); semantics are
pinned by tests/test_potentials.py against the NumPy spec.
"""
from __future__ import annotations

import jax.numpy as jnp

from .. import format_spec as fs


def literals(values, eqpred, ispos):
    """Uniform literal: (value == eqpred) XNOR ispos (see factor_functions)."""
    return (values == eqpred) == ispos


def eval_phi(lits, mask, f_type, f_arity):
    """φ for a batch of factors.

    lits   : bool  [..., A]   per-edge literals (padded slots arbitrary)
    mask   : bool  [..., A]   True on real edges
    f_type : int32 [...]      factor-function enum
    f_arity: int32 [...]      true arity (== mask.sum(-1))

    Returns float32 [...].
    """
    lits = lits & mask
    n = f_arity
    nlit = jnp.sum(lits, axis=-1).astype(jnp.int32)
    # head literal = last real slot (index n-1)
    head_idx = jnp.maximum(n - 1, 0)
    head = jnp.take_along_axis(lits, head_idx[..., None], axis=-1)[..., 0]
    headi = head.astype(jnp.int32)
    nbody = nlit - headi
    n_body = jnp.maximum(n - 1, 0)

    f32 = jnp.float32
    all_true = (nlit == n).astype(f32)
    any_true = (nlit > 0).astype(f32)
    agree = ((nlit == 0) | (nlit == n)).astype(f32)
    istrue = head.astype(f32)
    imply_mln = jnp.where(nbody < n_body, 1.0, head.astype(f32))
    lin = jnp.where(head, n_body, n_body - nbody).astype(f32)
    lin = jnp.where(n == 1, head.astype(f32), lin)
    ratio = jnp.log1p(lin)
    logical = (lin > 0).astype(f32)

    conds = [
        f_type == fs.FUNC_IMPLY_NATURAL,
        f_type == fs.FUNC_OR,
        f_type == fs.FUNC_AND,
        f_type == fs.FUNC_EQUAL,
        f_type == fs.FUNC_ISTRUE,
        f_type == fs.FUNC_LINEAR,
        f_type == fs.FUNC_RATIO,
        f_type == fs.FUNC_LOGICAL,
        f_type == fs.FUNC_AND_CATEGORICAL,
        f_type == fs.FUNC_IMPLY_MLN,
    ]
    vals = [all_true, any_true, all_true, agree, istrue, lin, ratio, logical,
            all_true, imply_mln]
    return jnp.select(conds, vals, default=jnp.zeros_like(all_true))


def factor_phis(dg, values):
    """φ for EVERY factor under a full assignment (no substitution).

    dg: DeviceGraph, values: int32 [V+1].  Returns float32 [F+1]
    (dummy row's φ is irrelevant — its feature is 0).
    """
    vals = values[dg.f_vids]                       # [F', A]
    lits = literals(vals, dg.f_eqpred, dg.f_ispos)
    return eval_phi(lits, dg.f_mask, dg.f_type, dg.f_arity)
