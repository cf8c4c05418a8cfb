"""The colored Gibbs sweep — pure-XLA path.

One sweep = sequential loop over colors; within a color, every variable is
resampled simultaneously (they share no factor, so the block update is exact
Gibbs).  This replaces the reference's Hogwild thread fan-out
(ref: src/gibbs_sampler.cc GibbsSamplerThread::sample_single_variable —
recalled; see SURVEY.md §3.2) with a deterministic, vectorized
gather → evaluate → reduce → draw → scatter step:

    vb   [B]        variables of this color
    fi   [B, D]     incident factors (CSR row gather)
    lits [B, D, K, A]  literals with candidate value k substituted at
                       this variable's slot
    logits [B, K]   Σ_d w·feat·φ   (conditional log-potentials)
    draw            Gumbel-argmax over the masked candidate axis
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .potentials import eval_phi

NEG_INF = jnp.float32(-1e30)


def color_logits(dg, values, weights, vb, K: int):
    """Conditional log-potentials [B, K] for one color block ``vb``.

    The candidate value is substituted at EVERY slot of the factor whose
    member is this variable (``mv == v``), so factors mentioning the same
    variable in several slots are handled exactly (and each distinct
    incident factor is counted once — compile.py dedups v_fidx).
    """
    fi = dg.v_fidx[vb]                # [B, D]
    mv = dg.f_vids[fi]                # [B, D, A]
    vals = values[mv]                 # [B, D, A]
    eq = dg.f_eqpred[fi]
    pos = dg.f_ispos[fi]
    msk = dg.f_mask[fi]

    base_lit = (vals == eq) == pos                        # [B, D, A]
    is_mine = mv == vb[:, None, None]                     # [B, D, A]
    ks = jax.lax.broadcasted_iota(jnp.int32, (K,), 0)

    # literal at each slot for each candidate k → [B, D, K, A]
    cand_lit = (ks[None, None, :, None] == eq[:, :, None, :]) == pos[:, :, None, :]
    lit_k = jnp.where(is_mine[:, :, None, :], cand_lit, base_lit[:, :, None, :])

    phi = eval_phi(
        lit_k,
        msk[..., None, :],
        dg.f_type[fi][..., None],
        dg.f_arity[fi][..., None],
    )                                                     # [B, D, K]
    contrib = (weights[dg.f_wid[fi]] * dg.f_feat[fi])[..., None] * phi
    return jnp.sum(contrib, axis=1)                       # [B, K]


def color_step(dg, values, weights, key, vb, sample_evidence: bool, K: int):
    """Resample one color block ``vb``; returns updated values [V+1]."""
    logits = color_logits(dg, values, weights, vb, K)
    card = dg.var_card[vb]            # [B]
    ks = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    masked = jnp.where(ks < card[:, None], logits, NEG_INF)
    g = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    drawn = jnp.argmax(masked + g, axis=-1).astype(values.dtype)

    resample = (dg.var_role[vb] == 0) | bool(sample_evidence)
    resample = resample & (vb < dg.var_card.shape[0] - 1)  # exclude dummy
    new = jnp.where(resample, drawn, values[vb])
    return values.at[vb].set(new)


def sweep(dg, values, weights, key, sample_evidence: bool, K: int):
    """One full Gibbs sweep over all colors.  K = static max cardinality."""
    C = dg.color_vars.shape[0]

    def body(c, vals):
        ck = jax.random.fold_in(key, c)
        return color_step(dg, vals, weights, ck, dg.color_vars[c],
                          sample_evidence, K)

    return jax.lax.fori_loop(0, C, body, values)
