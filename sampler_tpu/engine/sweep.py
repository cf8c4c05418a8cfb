"""The colored Gibbs sweep — pure-XLA path, scatter-free.

One sweep = sequential loop over colors; within a color, every variable is
resampled simultaneously (they share no factor, so the block update is exact
Gibbs).  This replaces the reference's Hogwild thread fan-out
(ref: src/gibbs_sampler.cc GibbsSamplerThread::sample_single_variable —
recalled; see SURVEY.md §3.2) with a deterministic, vectorized step.

Values live permanently in COLOR-MAJOR order (compile.py): color c owns the
contiguous slice [c*B, (c+1)*B) of the assignment vector, so a color step is

    stream  cs_* tables [B, D, ...]     (contiguous dynamic slices)
    gather  values[cs_nbr]              (the ONLY gather — neighbor slots)
    eval    φ specialized to present factor types   (VPU, branchless)
    reduce  logits[B, K] = Σ_d w·feat·φ
    draw    Gumbel-argmax over masked candidates
    write   dynamic_update_slice        (contiguous — NO scatter)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .multichain import (color_logits_mc, color_step_mc, demote_modes,
                         resolve_modes)

NEG_INF = jnp.float32(-1e30)


def color_logits(dg, values, weights, c, info, modes=None):
    """Conditional log-potentials [B, K] for color ``c`` (traced index).

    Thin single-chain wrapper over the chains-last kernel (NC=1),
    concatenated over the degree tiers: the candidate value is substituted
    at EVERY slot of the factor whose member is this variable, so factors
    mentioning the same variable in several slots are handled exactly (each
    distinct incident factor appears once — compile.py dedups the incidence
    lists).
    """
    if modes is None:
        modes = demote_modes(resolve_modes(info), 1)
    parts = [
        color_logits_mc(dg, ts, ti, values[:, None], weights, c, info,
                        modes)[..., 0]
        for ts, ti in zip(dg.tiers, info.tiers)
    ]
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def color_step(dg, values, weights, key, c, sample_evidence: bool, info,
               modes=None):
    """Resample color ``c``; returns updated values [P].

    The candidate-cardinality mask and the resample mask are precomputed
    streamed tables (compile.py cm_kmask / cm_resample*): computing them
    at runtime from sliced metadata triggers a ~400x-slower Mosaic lowering
    on TPU.
    """
    if modes is None:
        modes = demote_modes(resolve_modes(info), 1)
    return color_step_mc(dg, values[:, None], weights, key, c,
                         sample_evidence, info, None, modes)[:, 0]


def sweep(dg, values, weights, key, sample_evidence: bool, info,
          modes=None):
    """One full Gibbs sweep over all colors.  ``info`` is static
    (CompileInfo is hashable)."""
    if modes is None:
        modes = demote_modes(resolve_modes(info), 1)
    C = info.n_colors

    def body(c, vals):
        ck = jax.random.fold_in(key, c)
        return color_step(dg, vals, weights, ck, c, sample_evidence, info,
                          modes)

    return jax.lax.fori_loop(0, C, body, values, unroll=(C <= 4))
