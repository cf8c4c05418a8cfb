"""Vectorized (jnp) factor-function evaluation — the device-side twin of
factor_functions.py.

Branchless over factor types, SPECIALIZED to the set of types present in the
compiled graph (CompileInfo.present_funcs): only the needed variants are
computed on the VPU, and a single-type graph gets no select at all.  This is
the TPU-shaped replacement for the reference's per-factor switch statement
(ref: src/factor.cc CompactFactor::potential — recalled); semantics are
pinned by tests/test_potentials.py against the NumPy spec.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import format_spec as fs


def literals(values, eqpred, ispos):
    """Uniform literal: (value == eqpred) XNOR ispos (see factor_functions)."""
    return (values == eqpred) == ispos


def eval_phi(lits, mask, f_type, f_arity, present=None):
    """φ for a batch of factors.

    lits   : bool  [..., A]   per-edge literals (padded slots arbitrary)
    mask   : bool  [..., A]   True on real edges
    f_type : int32 [...]      factor-function enum
    f_arity: int32 [...]      true arity (== mask.sum(-1))
    present: optional tuple of factor-type ids present (static); None = all.

    Returns float32 [...].
    """
    if present is None:
        present = fs.ALL_FACTOR_FUNCS
    present = tuple(present)
    lits = lits & mask
    n = f_arity
    nlit = jnp.sum(lits, axis=-1).astype(jnp.int32)
    f32 = jnp.float32

    need_head = any(t in present for t in (
        fs.FUNC_ISTRUE, fs.FUNC_IMPLY_MLN, fs.FUNC_LINEAR, fs.FUNC_RATIO,
        fs.FUNC_LOGICAL))
    if need_head:
        # head literal extracted by mask-reduce, NOT take_along_axis: per-
        # element dynamic indexing lowers to scalar code on TPU (~70x slower)
        A = lits.shape[-1]
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (A,), 0)
        hmask = iota_a == (n - 1)[..., None]
        head = jnp.any(lits & hmask, axis=-1)
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
        # LINEAR family: count of satisfied body implications (b_i => head)
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
    return jnp.select(conds, vals, default=jnp.zeros(lits.shape[:-1], f32))


def factor_phis(dg, values, present=None):
    """φ for EVERY factor under a full assignment (no substitution).

    dg: DeviceGraph, values: int32 [V+1].  Returns float32 [F+1]
    (dummy row's φ is irrelevant — its feature is 0).
    """
    from ..compile import factor_records

    f_vids, f_ispos, f_eqpred, f_mask = factor_records(dg)
    vals = values[f_vids.reshape(-1)].reshape(f_vids.shape)   # [F', A]
    lits = literals(vals, f_eqpred, f_ispos)
    return eval_phi(lits, f_mask, dg.f_type, dg.f_arity, present)
