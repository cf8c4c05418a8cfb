"""Binary factor-graph format reader/writer.

Implements the DimmWitted on-disk contract (SURVEY.md §2a; ref:
src/binary_format.cc read_weights/read_variables/read_factors/read_domains —
recalled): five big-endian files + a metadata CSV.  All byte widths come
from format_spec so a correction against real reference fixtures is a
one-line change.

Categorical `domains` files map sparse category values to dense 0..k-1
indices at load time (variable initial values and factor equal-predicates
are translated); the sparse values are kept on the FactorGraph for
round-tripping.
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from .. import format_spec as fs
from ..graph import FactorGraph


# ---------------------------------------------------------------------------
# writers
# ---------------------------------------------------------------------------

def write_weights(graph: FactorGraph, path: str) -> None:
    rec = np.empty(graph.n_weights, fs.WEIGHT_RECORD)
    rec["wid"] = np.arange(graph.n_weights)
    rec["is_fixed"] = graph.w_fixed.astype(np.uint8)
    rec["init"] = graph.w_init
    rec.tofile(path)


def write_variables(graph: FactorGraph, path: str) -> None:
    rec = np.empty(graph.n_vars, fs.VARIABLE_RECORD)
    rec["vid"] = np.arange(graph.n_vars)
    rec["role"] = graph.var_role
    rec["init"] = _dense_to_sparse_init(graph)
    rec["dtype"] = graph.var_dtype
    rec["card"] = graph.var_card
    rec.tofile(path)


def write_factors(graph: FactorGraph, path: str) -> None:
    chunks = []
    for f in range(graph.n_factors):
        ftype = int(graph.f_type[f])
        lo, hi = int(graph.f_ptr[f]), int(graph.f_ptr[f + 1])
        arity = hi - lo
        chunks.append(np.array([ftype], fs.BE_U16).tobytes())
        chunks.append(np.array([arity], fs.BE_I64).tobytes())
        categorical = ftype in fs.CATEGORICAL_FUNCS
        for e in range(lo, hi):
            chunks.append(np.array([graph.e_vid[e]], fs.BE_I64).tobytes())
            chunks.append(np.array([graph.e_ispos[e]], fs.BE_U8).tobytes())
            if categorical:
                eq = _dense_to_sparse_eq(graph, int(graph.e_vid[e]),
                                         int(graph.e_eqpred[e]))
                chunks.append(np.array([eq], fs.BE_I64).tobytes())
        chunks.append(np.array([graph.f_wid[f]], fs.BE_I64).tobytes())
        chunks.append(np.array([graph.f_feat[f]], fs.BE_F64).tobytes())
    with open(path, "wb") as fp:
        fp.write(b"".join(chunks))


def write_factors_old(graph: FactorGraph, factors_path: str,
                      edges_path: str) -> None:
    """OLD two-file layout (format_spec.OLD_FACTOR_RECORD / EDGE_RECORD):
    fixed-width factor records + a separate edges file."""
    rec = np.empty(graph.n_factors, fs.OLD_FACTOR_RECORD)
    rec["ftype"] = graph.f_type
    rec["arity"] = graph.arities()
    rec["wid"] = graph.f_wid
    rec["feat"] = graph.f_feat
    rec.tofile(factors_path)
    E = graph.n_edges
    erec = np.empty(E, fs.EDGE_RECORD)
    erec["vid"] = graph.e_vid
    erec["fid"] = np.repeat(np.arange(graph.n_factors), graph.arities())
    erec["position"] = np.arange(E) - np.repeat(graph.f_ptr[:-1],
                                                graph.arities())
    erec["ispos"] = graph.e_ispos.astype(np.uint8)
    erec["eqpred"] = [
        _dense_to_sparse_eq(graph, int(graph.e_vid[e]),
                            int(graph.e_eqpred[e]))
        for e in range(E)
    ]
    erec.tofile(edges_path)


def write_comb_weights(graph: FactorGraph, path: str) -> None:
    """Optional sparse per-combination weight entries
    (format_spec.CWEIGHT_HEADER + arity × categoryValue:i64)."""
    arity = graph.arities()
    chunks = []
    for e in range(len(graph.cw_fid)):
        f = int(graph.cw_fid[e])
        lo = int(graph.f_ptr[f])
        chunks.append(np.array([(f, graph.cw_wid[e])],
                               fs.CWEIGHT_HEADER).tobytes())
        cats = [
            _dense_to_sparse_eq(graph, int(graph.e_vid[lo + j]),
                                int(graph.cw_cats[e, j]))
            for j in range(int(arity[f]))
        ]
        chunks.append(np.asarray(cats, fs.BE_I64).tobytes())
    with open(path, "wb") as fp:
        fp.write(b"".join(chunks))


def write_domains(graph: FactorGraph, path: str) -> None:
    chunks = []
    for vid, values in sorted((graph.domains or {}).items()):
        chunks.append(np.array([vid], fs.BE_I64).tobytes())
        chunks.append(np.array([len(values)], fs.BE_I64).tobytes())
        chunks.append(np.asarray(values, fs.BE_I64).tobytes())
    with open(path, "wb") as fp:
        fp.write(b"".join(chunks))


def write_meta(graph: FactorGraph, path: str, weights_file: str,
               variables_file: str, factors_file: str,
               edges_file: str = "") -> None:
    line = ",".join([
        str(graph.n_weights), str(graph.n_vars), str(graph.n_factors),
        str(graph.n_edges), weights_file, variables_file, factors_file,
        edges_file,
    ])
    with open(path, "w") as fp:
        fp.write(line + "\n")


def write_graph(graph: FactorGraph, outdir: str, prefix: str = "graph",
                old_format: bool = False) -> str:
    """Write all files into ``outdir``; returns the metadata path.

    ``old_format=True`` writes the two-file factors+edges layout used by
    older reference revisions (SURVEY.md §2a)."""
    os.makedirs(outdir, exist_ok=True)
    wf = os.path.join(outdir, f"{prefix}.weights")
    vf = os.path.join(outdir, f"{prefix}.variables")
    ff = os.path.join(outdir, f"{prefix}.factors")
    write_weights(graph, wf)
    write_variables(graph, vf)
    ef = ""
    if old_format:
        ef = os.path.join(outdir, f"{prefix}.edges")
        write_factors_old(graph, ff, ef)
    else:
        write_factors(graph, ff)
    if graph.domains:
        write_domains(graph, os.path.join(outdir, f"{prefix}.domains"))
    if graph.cw_fid is not None and len(graph.cw_fid):
        write_comb_weights(graph, ff + ".cweights")
    meta = os.path.join(outdir, f"{prefix}.meta")
    write_meta(graph, meta, wf, vf, ff, edges_file=ef)
    return meta


# ---------------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------------

def read_weights(path: str):
    rec = np.fromfile(path, fs.WEIGHT_RECORD)
    order = np.argsort(rec["wid"], kind="stable")
    rec = rec[order]
    return rec["init"].astype(np.float64), rec["is_fixed"].astype(bool)


def read_variables(path: str):
    rec = np.fromfile(path, fs.VARIABLE_RECORD)
    order = np.argsort(rec["vid"], kind="stable")
    rec = rec[order]
    return (rec["role"].astype(np.uint8), rec["init"].astype(np.int64),
            rec["dtype"].astype(np.uint8), rec["card"].astype(np.int32))


def read_factors(path: str):
    """Sequential scan of variable-length factor records.

    Returns (f_type, f_wid, f_feat, f_ptr, e_vid, e_ispos, e_eqpred_sparse).
    Uses the native parser (sampler_tpu.native) when built — the Python
    loop is the fallback and the executable spec.
    """
    raw = open(path, "rb").read()
    from .. import native
    if native.available():
        out = native.parse_factors(raw)
        if out is not None:
            return out
    buf = memoryview(raw)
    pos = 0
    f_type, f_wid, f_feat, f_ptr = [], [], [], [0]
    e_vid, e_ispos, e_eq = [], [], []

    def take(dtype, n=1):
        nonlocal pos
        out = np.frombuffer(buf, dtype, count=n, offset=pos)
        pos += dtype.itemsize * n
        return out

    total = len(buf)
    while pos < total:
        # explicit bounds/plausibility checks so corrupt or truncated files
        # fail loudly with a byte offset (mirrors the native parser's
        # rc codes -1/-2/-3 — native/sampler_native.cpp)
        if pos + 10 > total:
            raise ValueError(
                f"truncated factor record header at byte {pos}/{total}")
        ftype = int(take(fs.BE_U16)[0])
        arity = int(take(fs.BE_I64)[0])
        if arity < 0 or arity > 10**9:
            raise ValueError(
                f"implausible factor arity {arity} at byte {pos - 8} "
                "(corrupt factors file?)")
        categorical = ftype in fs.CATEGORICAL_FUNCS
        rec_bytes = arity * (17 if categorical else 9) + 16
        if pos + rec_bytes > total:
            raise ValueError(
                f"truncated factor record body at byte {pos}/{total} "
                f"(arity {arity} needs {rec_bytes} bytes)")
        for _ in range(arity):
            e_vid.append(int(take(fs.BE_I64)[0]))
            e_ispos.append(bool(take(fs.BE_U8)[0]))
            e_eq.append(int(take(fs.BE_I64)[0]) if categorical else 1)
        f_type.append(ftype)
        f_wid.append(int(take(fs.BE_I64)[0]))
        f_feat.append(float(take(fs.BE_F64)[0]))
        f_ptr.append(len(e_vid))
    return (np.asarray(f_type, np.int32), np.asarray(f_wid, np.int32),
            np.asarray(f_feat, np.float64), np.asarray(f_ptr, np.int64),
            np.asarray(e_vid, np.int64), np.asarray(e_ispos, bool),
            np.asarray(e_eq, np.int64))


def read_factors_old(factors_path: str, edges_path: str):
    """OLD two-file layout: fixed-width factor records + edges file.
    Returns the same tuple as read_factors."""
    rec = np.fromfile(factors_path, fs.OLD_FACTOR_RECORD)
    erec = np.fromfile(edges_path, fs.EDGE_RECORD)
    F = len(rec)
    arity = rec["arity"].astype(np.int64)
    f_ptr = np.concatenate([[0], np.cumsum(arity)])
    if len(erec) != f_ptr[-1]:
        raise ValueError(
            f"edges file has {len(erec)} records, factors imply {f_ptr[-1]}")
    # order edges by (factor, position) regardless of file order
    order = np.lexsort((erec["position"], erec["fid"]))
    erec = erec[order]
    want_fid = np.repeat(np.arange(F), arity)
    if not (erec["fid"].astype(np.int64) == want_fid).all():
        raise ValueError("edges file factor ids do not match factor arities")
    return (rec["ftype"].astype(np.int32), rec["wid"].astype(np.int32),
            rec["feat"].astype(np.float64), f_ptr,
            erec["vid"].astype(np.int64), erec["ispos"].astype(bool),
            erec["eqpred"].astype(np.int64))


def read_comb_weights(path: str, arity: np.ndarray):
    """Sparse per-combination weight entries; ``arity`` is per-factor.
    Returns (cw_fid, cw_cats_sparse [N, max_arity], cw_wid)."""
    buf = memoryview(open(path, "rb").read())
    pos, total = 0, len(buf)
    fid, wid, cats = [], [], []
    while pos < total:
        if pos + fs.CWEIGHT_HEADER.itemsize > total:
            raise ValueError(
                f"truncated .cweights header at byte {pos}/{total}")
        head = np.frombuffer(buf, fs.CWEIGHT_HEADER, 1, pos)[0]
        pos += fs.CWEIGHT_HEADER.itemsize
        f = int(head["fid"])
        if f < 0 or f >= len(arity):
            raise ValueError(
                f".cweights entry references factor {f} "
                f"(graph has {len(arity)})")
        a = int(arity[f])
        if pos + 8 * a > total:
            raise ValueError(
                f"truncated .cweights entry at byte {pos}/{total}")
        fid.append(int(head["fid"]))
        wid.append(int(head["wid"]))
        cats.append(np.frombuffer(buf, fs.BE_I64, a, pos).astype(np.int64))
        pos += 8 * a
    amax = max((len(c) for c in cats), default=1)
    cats_arr = np.zeros((len(cats), amax), np.int64)
    for i, c in enumerate(cats):
        cats_arr[i, : len(c)] = c
    return (np.asarray(fid, np.int64), cats_arr, np.asarray(wid, np.int32))


def read_domains_flat(path: str):
    """Domains file → flat arrays (d_vid [N], d_card [N], d_sparse [ΣK]).

    The whole file is one big-endian i64 stream: per record
    (vid, card, card × categoryValue).  Record starts form a sequential
    chain (each start depends on the previous card), so a minimal-body
    Python scan finds them; everything else is vectorized numpy — the
    per-variable frombuffer/dict loop this replaces dominated categorical
    load time (VERDICT.md r1 weak #7)."""
    arr = np.fromfile(path, fs.BE_I64).astype(np.int64)
    starts = []
    p, total = 0, len(arr)
    while p < total:
        if p + 2 > total:
            raise ValueError(
                f"truncated domain record header at word {p}/{total}")
        card = int(arr[p + 1])
        if card < 0 or p + 2 + card > total:
            raise ValueError(
                f"domain record at word {p} claims cardinality {card} "
                f"but only {total - p - 2} words remain (corrupt file?)")
        starts.append(p)
        p += 2 + card
    if p != total:
        raise ValueError(f"domains file truncated at word {p}/{total}")
    starts = np.asarray(starts, np.int64)
    d_vid = arr[starts]
    d_card = arr[starts + 1]
    mask = np.ones(total, bool)
    mask[starts] = False
    mask[starts + 1] = False
    return d_vid, d_card, arr[mask]


def read_domains(path: str) -> Dict[int, np.ndarray]:
    d_vid, d_card, d_sparse = read_domains_flat(path)
    splits = np.split(d_sparse, np.cumsum(d_card)[:-1])
    return {int(v): s for v, s in zip(d_vid, splits)}


def _sparse_to_dense_bulk(d_vid, d_card, d_sparse, q_vid, q_sval):
    """Vectorized (vid, sparseValue) → dense index translation.

    Pairs with no domain entry keep their original value (matching the
    old per-edge ``lut.get(s, s)`` semantics)."""
    if len(q_vid) == 0:
        return np.asarray(q_sval, np.int64)
    d_vidrep = np.repeat(d_vid, d_card)
    total = len(d_sparse)
    offs = np.concatenate([[0], np.cumsum(d_card)[:-1]])
    d_dense = np.arange(total, dtype=np.int64) - np.repeat(offs, d_card)
    # composite 1-D key: rank the sparse values so vid*R + rank can't collide
    us = np.unique(np.concatenate([d_sparse, q_sval]))
    R = len(us)
    key_d = d_vidrep * R + np.searchsorted(us, d_sparse)
    key_q = np.asarray(q_vid, np.int64) * R + np.searchsorted(us, q_sval)
    order = np.argsort(key_d, kind="stable")
    kd, dd = key_d[order], d_dense[order]
    pos = np.searchsorted(kd, key_q)
    pos_c = np.minimum(pos, len(kd) - 1)
    hit = kd[pos_c] == key_q
    return np.where(hit, dd[pos_c], np.asarray(q_sval, np.int64))


def read_meta(path: str):
    parts = open(path).read().strip().split(",")
    counts = dict(zip(["n_weights", "n_vars", "n_factors", "n_edges"],
                      map(int, parts[:4])))
    files = dict(zip(["weights", "variables", "factors", "edges"],
                     parts[4:8] + [""] * (8 - len(parts))))
    return counts, files


def load_graph(meta_path: str, domains_path: Optional[str] = None) -> FactorGraph:
    """Load a graph from a metadata CSV (paths resolved relative to it)."""
    counts, files = read_meta(meta_path)
    base = os.path.dirname(os.path.abspath(meta_path))
    rel = lambda p: p if os.path.isabs(p) else os.path.join(base, p)

    w_init, w_fixed = read_weights(rel(files["weights"]))
    role, init_sparse, dtype, card = read_variables(rel(files["variables"]))
    if files["edges"]:
        # old two-file revision (SURVEY.md §2a): a non-empty edges entry
        # means the factors file has NO inline member list — parsing it
        # with the new-format reader would decode garbage
        f_type, f_wid, f_feat, f_ptr, e_vid, e_ispos, e_eq = \
            read_factors_old(rel(files["factors"]), rel(files["edges"]))
    else:
        f_type, f_wid, f_feat, f_ptr, e_vid, e_ispos, e_eq = read_factors(
            rel(files["factors"]))

    domains = None
    dflat = None
    if domains_path and os.path.exists(domains_path):
        dflat = read_domains_flat(domains_path)
        d_vid, d_card, d_sparse = dflat
        splits = np.split(d_sparse, np.cumsum(d_card)[:-1])
        domains = {int(v): s for v, s in zip(d_vid, splits)}

    # translate sparse category values → dense indices (vectorized)
    var_init = init_sparse.astype(np.int64).copy()
    e_eqpred = e_eq.copy()
    if dflat:
        var_init[d_vid] = _sparse_to_dense_bulk(*dflat, d_vid,
                                                var_init[d_vid])
        e_eqpred = _sparse_to_dense_bulk(*dflat, e_vid.astype(np.int64),
                                         e_eq)

    # optional sparse per-combination weights (sibling .cweights file)
    cw = {}
    cw_path = rel(files["factors"]) + ".cweights"
    if os.path.exists(cw_path):
        arity = np.diff(f_ptr)
        cw_fid, cw_cats_sp, cw_wid = read_comb_weights(cw_path, arity)
        cw_cats = cw_cats_sp.copy()
        if dflat:
            Amax = cw_cats.shape[1]
            slot = f_ptr[cw_fid][:, None] + np.arange(Amax)[None, :]
            valid = np.arange(Amax)[None, :] < arity[cw_fid][:, None]
            slot_vid = e_vid[np.minimum(slot, len(e_vid) - 1)]
            tr = _sparse_to_dense_bulk(
                *dflat, slot_vid[valid].astype(np.int64), cw_cats[valid])
            cw_cats[valid] = tr
        cw = dict(cw_fid=cw_fid, cw_cats=cw_cats.astype(np.int32),
                  cw_wid=cw_wid)

    g = FactorGraph(
        **cw,
        var_dtype=dtype,
        var_role=role,
        var_init=var_init.astype(np.int32),
        var_card=card,
        w_init=w_init,
        w_fixed=w_fixed,
        f_type=f_type,
        f_wid=f_wid,
        f_feat=f_feat,
        f_ptr=f_ptr,
        e_vid=e_vid.astype(np.int32),
        e_ispos=e_ispos,
        e_eqpred=e_eqpred.astype(np.int32),
        domains=domains,
    )
    g.validate()
    for name, want, got in [("weights", counts["n_weights"], g.n_weights),
                            ("variables", counts["n_vars"], g.n_vars),
                            ("factors", counts["n_factors"], g.n_factors),
                            ("edges", counts["n_edges"], g.n_edges)]:
        if want != got:
            raise ValueError(f"metadata says {want} {name}, files have {got}")
    return g


# ---------------------------------------------------------------------------
# sparse-value helpers (dense ↔ sparse via graph.domains)
# ---------------------------------------------------------------------------

def _dense_to_sparse_init(graph: FactorGraph) -> np.ndarray:
    init = graph.var_init.astype(np.int64).copy()
    for vid, values in (graph.domains or {}).items():
        init[vid] = values[init[vid]]
    return init


def _dense_to_sparse_eq(graph: FactorGraph, vid: int, dense: int) -> int:
    if graph.domains and vid in graph.domains:
        return int(graph.domains[vid][dense])
    return dense
