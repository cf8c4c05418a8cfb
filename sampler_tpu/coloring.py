"""Greedy graph coloring for chromatic (blocked) Gibbs sampling.

The reference parallelizes with Hogwild races (ref: src/gibbs_sampler.cc
thread fan-out — recalled).  On TPU we instead color the variable-adjacency
graph (two variables are adjacent iff they share a factor): variables of one
color form an independent set, so a whole color block can be resampled in one
vectorized step with no races and deterministic results (chromatic Gibbs,
Gonzalez et al. 2011).  Colors are the sweep's sequential outer loop.
"""
from __future__ import annotations

import numpy as np

from .graph import FactorGraph


def variable_adjacency(graph: FactorGraph):
    """CSR adjacency (indptr, indices) over variables via shared factors."""
    arity = graph.arities()
    # pair counts: each edge's variable is adjacent to the other arity-1
    # members of its factor
    deg_bound = np.zeros(graph.n_vars, np.int64)
    np.add.at(deg_bound, graph.e_vid, np.repeat(arity - 1, arity))
    indptr = np.zeros(graph.n_vars + 1, np.int64)
    np.cumsum(deg_bound, out=indptr[1:])
    indices = np.empty(indptr[-1], np.int64)
    cursor = indptr[:-1].copy()
    for f in range(graph.n_factors):
        members = graph.e_vid[graph.f_ptr[f]:graph.f_ptr[f + 1]]
        for v in members:
            others = members[members != v]
            k = len(members) - 1
            # duplicated vids inside one factor shrink the slice; clip
            m = min(k, len(others))
            indices[cursor[v]:cursor[v] + m] = others[:m]
            cursor[v] += m
    # trim unused slots from duplicate-member factors
    if (cursor < indptr[1:]).any():
        keep = np.ones(len(indices), bool)
        for v in range(graph.n_vars):
            keep[cursor[v]:indptr[v + 1]] = False
        indices = indices[keep]
        new_ptr = np.zeros_like(indptr)
        np.cumsum(cursor - indptr[:-1], out=new_ptr[1:])
        indptr = new_ptr
    return indptr, indices


def greedy_coloring(graph: FactorGraph) -> np.ndarray:
    """Color variables greedily (largest-first order); returns int32 [V].

    No two variables sharing a factor get the same color (validated by
    tests/test_coloring.py).  Uses the native C++ colorer when built
    (sampler_tpu.native); the Python path is the fallback/spec.
    """
    from . import native
    if native.available():
        colors = native.greedy_color(graph.n_vars, graph.f_ptr, graph.e_vid)
        if colors is not None:
            return colors
    indptr, indices = variable_adjacency(graph)
    V = graph.n_vars
    degree = np.diff(indptr)
    order = np.argsort(-degree, kind="stable")
    colors = np.full(V, -1, np.int32)
    max_deg = int(degree.max()) if V else 0
    forbidden = np.zeros(max_deg + 2, np.int64)  # stamp buffer
    stamp = 0
    for v in order:
        stamp += 1
        neigh = indices[indptr[v]:indptr[v + 1]]
        ncol = colors[neigh]
        ncol = ncol[ncol >= 0]
        forbidden[ncol] = stamp
        c = 0
        while forbidden[c] == stamp:
            c += 1
        colors[v] = c
    return colors


def validate_coloring(graph: FactorGraph, colors: np.ndarray) -> None:
    """Raise if any factor has two distinct members with equal colors."""
    for f in range(graph.n_factors):
        members = graph.e_vid[graph.f_ptr[f]:graph.f_ptr[f + 1]]
        uniq = np.unique(members)
        if len(np.unique(colors[uniq])) != len(uniq):
            raise AssertionError(f"factor {f} has same-colored members")
