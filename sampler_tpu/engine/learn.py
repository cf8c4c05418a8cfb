"""SGD weight learning by contrastive divergence over two coupled worlds.

Reference semantics (ref: src/gibbs_sampler.cc sample_sgd_single_variable —
recalled; SURVEY.md §2c/§3.3): per epoch, resample an *evidence world*
(labels clamped) and a *free world* (nothing clamped); the gradient of each
weight is the difference of sufficient statistics
    grad(w) = Σ_f feat_f · (φ_f(evidence) − φ_f(free))
with diminishing step size and optional l1/l2 regularization.

TPU-shaped deviation (documented, fixed-point-preserving): the reference
applies Hogwild per-variable updates — each factor's gradient is added once
per incident variable visit within a sweep.  Here the gradient is applied
once per sweep as a batched segment-sum, which rescales the effective step
size but has the same stationary points (SURVEY.md §7 hard-part 4).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .potentials import factor_phis
from .sweep import sweep


@dataclasses.dataclass(frozen=True)
class LearnConfig:
    n_epochs: int = 100
    n_sweeps_per_epoch: int = 1     # reference -s n_samples_per_learning_epoch
    stepsize: float = 0.1           # reference -a/--alpha
    diminish: float = 0.99          # reference -d/--diminish
    regularization: str = "l2"      # 'l1' | 'l2' | 'none'
    reg_param: float = 0.0          # reference --reg_param
    learn_non_evidence: bool = False


def weight_gradient(dg, values_ev, values_free, learn_non_evidence: bool,
                    present=None, has_sparse_cw: bool = False):
    """grad[W] float32 via segment-sum of per-factor stat differences."""
    phi_ev = factor_phis(dg, values_ev, present)
    phi_free = factor_phis(dg, values_free, present)
    issparse = dg.f_cwbase >= 0 if has_sparse_cw else False
    diff = dg.f_feat * (phi_ev - phi_free)
    if not learn_non_evidence:
        # only factors touching >=1 evidence variable contribute
        from ..compile import factor_records

        f_vids, _, _, f_mask = factor_records(dg)
        touches_ev = jnp.any((dg.var_role[f_vids] == 1) & f_mask, axis=-1)
    else:
        touches_ev = True
    diff = jnp.where(jnp.logical_and(touches_ev, jnp.logical_not(issparse)),
                     diff, 0.0)
    W = dg.w_init.shape[0]
    grad = jax.ops.segment_sum(diff, dg.f_wid, num_segments=W)
    if has_sparse_cw:
        # sparse per-combination weights: ±feat scattered at the weight id
        # selected by each world's member combination (multichain.py twin)
        from .multichain import sparse_comb_wids

        sel = jnp.where(jnp.logical_and(touches_ev, issparse), dg.f_feat, 0.0)
        grad = grad + jax.ops.segment_sum(
            sel, sparse_comb_wids(dg, values_ev), num_segments=W)
        grad = grad - jax.ops.segment_sum(
            sel, sparse_comb_wids(dg, values_free), num_segments=W)
        grad = grad.at[W - 1].set(0.0)
    return grad


def apply_update(weights, grad, w_fixed, stepsize, regularization: str,
                 reg_param: float):
    if regularization == "l2":
        grad = grad - reg_param * weights
    elif regularization == "l1":
        grad = grad - reg_param * jnp.sign(weights)
    new = weights + stepsize * grad
    return jnp.where(w_fixed, weights, new)


@partial(jax.jit, static_argnames=("cfg", "info"))
def learn(dg, weights, key, cfg: LearnConfig, info):
    """Run cfg.n_epochs learning epochs; returns (weights, v_ev, v_free)."""
    from .gibbs import init_values

    k0, k1, kscan = jax.random.split(key, 3)
    v_ev = init_values(dg, k0, random_init=True)     # evidence clamped
    v_free = init_values(dg, k1, random_init=True)

    def epoch(carry, i):
        w, v_ev, v_free, alpha = carry
        ke = jax.random.fold_in(jax.random.fold_in(kscan, i), 0)
        kf = jax.random.fold_in(jax.random.fold_in(kscan, i), 1)

        def one_sweep(c, j):
            v_ev, v_free = c
            v_ev = sweep(dg, v_ev, w, jax.random.fold_in(ke, j),
                         sample_evidence=False, info=info)
            v_free = sweep(dg, v_free, w, jax.random.fold_in(kf, j),
                           sample_evidence=True, info=info)
            return (v_ev, v_free), None

        (v_ev, v_free), _ = jax.lax.scan(
            one_sweep, (v_ev, v_free), jnp.arange(cfg.n_sweeps_per_epoch))

        grad = weight_gradient(dg, v_ev, v_free, cfg.learn_non_evidence,
                               info.present_funcs, info.has_sparse_cw)
        w = apply_update(w, grad, dg.w_fixed, alpha, cfg.regularization,
                         cfg.reg_param)
        return (w, v_ev, v_free, alpha * cfg.diminish), None

    init = (jnp.asarray(weights, jnp.float32), v_ev, v_free,
            jnp.float32(cfg.stepsize))
    (w, v_ev, v_free, _), _ = jax.lax.scan(epoch, init,
                                           jnp.arange(cfg.n_epochs))
    return w, v_ev, v_free
