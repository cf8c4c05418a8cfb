"""Compile a host FactorGraph into the padded, rectangular device layout.

Equivalent role to the reference's FactorGraph::compile() →
CompiledFactorGraph (ref: src/factor_graph.cc — recalled), but the layout is
TPU-shaped: everything is a dense SoA array padded to static shapes so XLA
sees rectangular gathers, plus graph-coloring blocks that expose race-free
parallelism (see coloring.py).

Padding convention — sentinels instead of masks wherever possible:
  * a DUMMY VARIABLE row at index V: card 1, value always 0, never resampled;
  * a DUMMY FACTOR row at index F: weight id 0 but feature 0.0, so its
    contribution to any sum is exactly 0;
  * padded slots in index arrays point at the dummy row, which keeps every
    gather in-bounds and mask-free; only candidate-value masking (k >= card)
    and edge-arity masks remain.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

from . import format_spec as fs
from .coloring import greedy_coloring
from .graph import FactorGraph


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


class DeviceGraph(NamedTuple):
    """Rectangular SoA arrays (numpy here; moved to device by jnp.asarray).

    Shapes:  V' = V+1 (dummy var row),  F' = F+1 (dummy factor row),
             A = padded max arity,  D = padded max degree,
             C = number of colors,  B = padded max color-block size.
    """

    # factors ----------------------------------------------------- [F', A]
    f_vids: np.ndarray    # int32, member variable ids (pad → V)
    f_ispos: np.ndarray   # bool
    f_eqpred: np.ndarray  # int32
    f_mask: np.ndarray    # bool, True on real edges
    # factors ------------------------------------------------------ [F']
    f_type: np.ndarray    # int32
    f_wid: np.ndarray     # int32 (dummy → 0)
    f_feat: np.ndarray    # float32 (dummy → 0.0)
    f_arity: np.ndarray   # int32 (dummy → 1)
    # variable → incident factors (DISTINCT factor ids) ----------- [V', D]
    v_fidx: np.ndarray    # int32, incident factor ids (pad → F)
    # variables ----------------------------------------------------- [V']
    var_card: np.ndarray  # int32 (dummy → 1)
    var_role: np.ndarray  # int32 (dummy → ROLE_EVIDENCE)
    var_init: np.ndarray  # int32 (dummy → 0)
    # color blocks -------------------------------------------------- [C, B]
    color_vars: np.ndarray  # int32, variable ids per color (pad → V)
    # weights --------------------------------------------------------- [W]
    w_init: np.ndarray    # float32
    w_fixed: np.ndarray   # bool


@dataclasses.dataclass(frozen=True)
class CompileInfo:
    n_vars: int
    n_factors: int
    n_weights: int
    n_colors: int
    max_arity: int
    max_degree: int
    max_card: int
    block_size: int


def compile_graph(graph: FactorGraph, colors: np.ndarray | None = None,
                  align: int = 8) -> tuple[DeviceGraph, CompileInfo]:
    """Build the padded device layout.  `align` pads B/D/A for TPU lanes."""
    graph.validate()
    V, F, E = graph.n_vars, graph.n_factors, graph.n_edges
    arity = graph.arities().astype(np.int64)
    A = int(arity.max())

    # --- factor → member edges, padded [F+1, A] ------------------------
    f_vids = np.full((F + 1, A), V, np.int32)
    f_ispos = np.zeros((F + 1, A), bool)
    f_eqpred = np.zeros((F + 1, A), np.int32)
    f_mask = np.zeros((F + 1, A), bool)
    rows = np.repeat(np.arange(F), arity)
    cols = np.concatenate([np.arange(a) for a in arity]) if F else np.zeros(0, np.int64)
    f_vids[rows, cols] = graph.e_vid
    f_ispos[rows, cols] = graph.e_ispos
    f_eqpred[rows, cols] = graph.e_eqpred
    f_mask[rows, cols] = True

    f_type = np.concatenate([graph.f_type, [fs.FUNC_AND]]).astype(np.int32)
    f_wid = np.concatenate([graph.f_wid, [0]]).astype(np.int32)
    f_feat = np.concatenate([graph.f_feat, [0.0]]).astype(np.float32)
    f_arity = np.concatenate([arity, [1]]).astype(np.int32)

    # --- variable → incident factor CSR, padded [V+1, D] ---------------
    # DISTINCT (variable, factor) pairs: a factor mentioning the same
    # variable in several slots appears once; the sweep substitutes the
    # candidate at every matching slot (engine/sweep.py).
    pair_key = rows.astype(np.int64) * (V + 1) + graph.e_vid
    uniq = np.unique(pair_key)
    uf = (uniq // (V + 1)).astype(np.int32)
    uv = (uniq % (V + 1)).astype(np.int64)
    degree = np.bincount(uv, minlength=V)
    D = _round_up(max(int(degree.max()) if V else 1, 1), 1)
    v_fidx = np.full((V + 1, D), F, np.int32)
    order = np.argsort(uv, kind="stable")
    sv, sf = uv[order], uf[order]
    starts = np.searchsorted(sv, np.arange(V))
    pos = np.arange(len(sv)) - starts[sv]
    v_fidx[sv, pos] = sf

    # --- coloring → [C, B] blocks --------------------------------------
    if colors is None:
        colors = greedy_coloring(graph)
    C = int(colors.max()) + 1 if V else 1
    counts = np.bincount(colors, minlength=C)
    B = _round_up(int(counts.max()), align)
    color_vars = np.full((C, B), V, np.int32)
    for c in range(C):
        members = np.nonzero(colors == c)[0]
        color_vars[c, : len(members)] = members

    # --- variable rows (+ dummy) ---------------------------------------
    var_card = np.concatenate([graph.var_card, [1]]).astype(np.int32)
    var_role = np.concatenate([graph.var_role, [fs.ROLE_EVIDENCE]]).astype(np.int32)
    var_init = np.concatenate([graph.var_init, [0]]).astype(np.int32)

    dg = DeviceGraph(
        f_vids=f_vids, f_ispos=f_ispos, f_eqpred=f_eqpred, f_mask=f_mask,
        f_type=f_type, f_wid=f_wid, f_feat=f_feat, f_arity=f_arity,
        v_fidx=v_fidx,
        var_card=var_card, var_role=var_role, var_init=var_init,
        color_vars=color_vars,
        w_init=graph.w_init.astype(np.float32),
        w_fixed=graph.w_fixed.astype(bool),
    )
    info = CompileInfo(
        n_vars=V, n_factors=F, n_weights=graph.n_weights, n_colors=C,
        max_arity=A, max_degree=D, max_card=int(graph.var_card.max()),
        block_size=B,
    )
    return dg, info


def to_device(dg: DeviceGraph):
    """Move all arrays to the default JAX device as a DeviceGraph of jnp arrays."""
    import jax.numpy as jnp

    return DeviceGraph(*(jnp.asarray(a) for a in dg))
