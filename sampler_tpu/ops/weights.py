"""Weight-stream expansion / reduction without scalar gathers or scatters.

TPU row gathers and scatter-adds are ISSUE-RATE bound (~12 ns per row no
matter how wide — see ops/banded.py header), so ``weights[cs_wid]`` over a
[C, B, D] incidence stream (~4M rows on the 1M-var bench graph) costs
~50 ms — 1.7x a whole fused sweep — and the learning gradient's
``segment_sum`` pays the same toll on the scatter side.  Round-2 profiling
(sampler_tpu/profile_learn.py) put the per-epoch fold at 12.7% and the
gradient at 58% of learning wall time, and these two scalar-index ops are
the non-sweep cost.

When the weight table is SMALL (tied weights — the common DeepDive
rule-template shape, and every BASELINE config class), both become a fused
broadcast-compare-reduce over the W axis:

    wf[r]   = sum_k weights[k] * (wid[r] == k)          (expand)
    grad[k] = sum_r vals[r]    * (wid[r] == k)          (reduce)

XLA fuses the compare + select + W-reduction into ONE bandwidth-bound pass
over the stream — no gather issue slots, no [R, W] materialization, MXU/VPU
lanes fully used.  Above the threshold the plain gather / segment_sum is
kept: R*W elementwise work would exceed the issue-rate cost for the
per-feature KBC graphs where W ~ 1e5-1e7.

Reference behavior being replaced: the weight-table indexing inside the
Gibbs inner loop (ref: src/gibbs_sampler.cc w[f.weight_id] — recalled,
SURVEY.md §3.2) and the SGD scatter `w[wid] += g` (§3.3).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp


# Max weight-table size for the compare-reduce paths.  Read ONCE at import
# (env SAMPLER_TPU_SMALL_W): the value participates in trace-time branching,
# so changing it mid-process would leave already-compiled functions on the
# old path — set it before importing sampler_tpu.
SMALL_W = int(os.environ.get("SAMPLER_TPU_SMALL_W", 64))


def small_w_threshold() -> int:
    """The import-time SMALL_W constant (kept as a function for callers)."""
    return SMALL_W


def expand_wf(weights, wid, feat=None):
    """``weights[wid] (* feat)`` without a row gather when W is small.

    wid: int array of any shape; weights [W].  Returns wid's shape.
    Numerically identical to the gather for finite float32 weights (pure
    selection, no re-association; the masked sum maps -0.0 to +0.0)."""
    W = weights.shape[0]
    if W <= SMALL_W:
        iota = jnp.arange(W, dtype=jnp.int32)
        wf = jnp.sum(jnp.where(wid[..., None] == iota,
                               weights.astype(jnp.float32),
                               jnp.float32(0)), axis=-1)
    else:
        wf = weights[wid]
        if wf.dtype != jnp.float32:
            wf = wf.astype(jnp.float32)
    return wf if feat is None else wf * feat


def segment_reduce(vals, wid, W: int):
    """``sum of vals grouped by wid`` -> [W] float32, scatter-free when W
    is small.  vals and wid: same shape (any rank).  Accumulation order
    differs from segment_sum (lane-tree reduce vs serial scatter), so
    float32 results may differ in the last ulps."""
    flat_v = vals.reshape(-1).astype(jnp.float32)
    flat_i = wid.reshape(-1)
    if W <= small_w_threshold():
        iota = jnp.arange(W, dtype=jnp.int32)
        return jnp.sum(jnp.where(flat_i[:, None] == iota,
                                 flat_v[:, None], jnp.float32(0)), axis=0)
    return jax.ops.segment_sum(flat_v, flat_i, num_segments=W)
