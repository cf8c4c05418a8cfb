"""Inference orchestration: burn-in, sampling epochs, marginal tallies.

Mirrors the reference's gibbs() phase structure (ref: src/dimmwitted.cc —
recalled; SURVEY.md §3.1) as jitted lax.scan loops: every epoch is one full
colored sweep; tallies accumulate per-(variable, value) counts on device.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .sweep import sweep


def init_values(dg, key=None, random_init: bool = True):
    """Initial world [V+1]: evidence at labels, query random (or initial)."""
    Vp = dg.var_card.shape[0]
    vals = jnp.asarray(dg.var_init, jnp.int32)
    if random_init:
        if key is None:
            key = jax.random.PRNGKey(0)
        r = jax.random.randint(key, (Vp,), 0, 1 << 30, dtype=jnp.int32)
        rand_vals = r % jnp.maximum(dg.var_card, 1)
        vals = jnp.where(dg.var_role == 0, rand_vals, vals)
    return vals


@partial(jax.jit, static_argnames=("n_sweeps", "sample_evidence", "info"))
def run_sweeps(dg, values, weights, key, n_sweeps: int,
               sample_evidence: bool, info):
    """n_sweeps full sweeps, no tallies (burn-in)."""
    def body(vals, i):
        k = jax.random.fold_in(key, i)
        return sweep(dg, vals, weights, k, sample_evidence, info), None

    values, _ = jax.lax.scan(body, values, jnp.arange(n_sweeps))
    return values


@partial(jax.jit, static_argnames=("n_sweeps", "sample_evidence", "info"))
def run_inference(dg, values, weights, key, n_sweeps: int,
                  sample_evidence: bool, info):
    """n_sweeps sweeps with per-sweep tallies.

    Returns (values, counts[V+1, K] int32).
    """
    Vp = dg.var_card.shape[0]
    counts0 = jnp.zeros((Vp, info.max_card), jnp.int32)

    ks = jnp.arange(info.max_card, dtype=values.dtype)

    def body(carry, i):
        vals, counts = carry
        k = jax.random.fold_in(key, i)
        vals = sweep(dg, vals, weights, k, sample_evidence, info)
        # one-hot compare instead of scatter-add (scatter is slow on TPU)
        counts = counts + (vals[:, None] == ks[None, :]).astype(jnp.int32)
        return (vals, counts), None

    (values, counts), _ = jax.lax.scan(body, (values, counts0),
                                       jnp.arange(n_sweeps))
    return values, counts


def marginals_from_counts(counts, n_sweeps: int):
    """Estimated P(v = k) float32 [V+1, K]."""
    return counts.astype(jnp.float32) / jnp.float32(n_sweeps)


@partial(jax.jit, static_argnames=("n_burn", "n_sweeps", "sample_evidence",
                                   "info", "random_init"))
def _infer_one(dg, weights, key, n_burn: int, n_sweeps: int, info,
               sample_evidence: bool, random_init: bool):
    k_init, k_burn, k_inf = jax.random.split(key, 3)
    values = init_values(dg, k_init, random_init)
    if n_burn:
        values = run_sweeps(dg, values, weights, k_burn, n_burn,
                            sample_evidence, info)
    return run_inference(dg, values, weights, k_inf, n_sweeps,
                         sample_evidence, info)


def infer(dg, weights, key, n_burn: int, n_sweeps: int, info,
          sample_evidence: bool = False, random_init: bool = True,
          n_chains: int = 1):
    """Full inference pipeline; returns (marginals[V, K], final values).

    ``n_chains > 1`` runs independent chains via vmap (the TPU-native
    replacement for long single chains — SURVEY.md §2 parallelism table);
    tallies are pooled across chains.  ``values`` then has a leading chain
    axis.
    """
    if n_chains == 1:
        values, counts = _infer_one(dg, weights, key, n_burn, n_sweeps, info,
                                    sample_evidence, random_init)
        marg = marginals_from_counts(counts[dg.pos_of_vid], n_sweeps)
        return marg, values
    from .multichain import infer_mc

    return infer_mc(dg, weights, key, n_burn, n_sweeps, info, n_chains,
                    sample_evidence, random_init)
