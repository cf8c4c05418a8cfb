"""Loader robustness: truncated/corrupt binary inputs must fail loudly
(SURVEY.md §2a — the on-disk format is the compatibility surface), in BOTH
the native C++ parser and the pure-Python fallback, and graph validation
must reject unknown variable roles (VERDICT.md r2 next-round #10)."""
import os

import numpy as np
import pytest

from sampler_tpu import format_spec as fs, native
from sampler_tpu.fixtures import all_functions_graph, categorical_graph
from sampler_tpu.io import binary


@pytest.fixture()
def factor_bytes(tmp_path):
    g = all_functions_graph(n=6)
    path = str(tmp_path / "g.factors")
    binary.write_factors(g, path)
    return path, open(path, "rb").read()


def _parse_modes():
    modes = [0]          # SAMPLER_TPU_NATIVE=0 → Python fallback
    if native.available():
        modes.append(1)  # native parser
    return modes


@pytest.mark.parametrize("use_native", _parse_modes())
def test_truncated_factors_raise(tmp_path, factor_bytes, use_native,
                                 monkeypatch):
    if not use_native:
        monkeypatch.setenv("SAMPLER_TPU_NATIVE", "0")
    path, raw = factor_bytes
    # cut the file at every prefix length that is not a record boundary
    # sample a spread of offsets (full scan is O(len^2) parse work)
    bad = str(tmp_path / "bad.factors")
    offsets = sorted({1, 5, 9, 11, len(raw) // 2, len(raw) - 1})
    for cut in offsets:
        with open(bad, "wb") as fp:
            fp.write(raw[:cut])
        with pytest.raises(ValueError):
            binary.read_factors(bad)


@pytest.mark.parametrize("use_native", _parse_modes())
def test_corrupt_arity_raises(tmp_path, factor_bytes, use_native,
                              monkeypatch):
    if not use_native:
        monkeypatch.setenv("SAMPLER_TPU_NATIVE", "0")
    path, raw = factor_bytes
    # blast the first record's arity field (bytes 2..10) to a huge value
    corrupt = bytearray(raw)
    corrupt[2:10] = (1 << 40).to_bytes(8, "big")
    bad = str(tmp_path / "arity.factors")
    with open(bad, "wb") as fp:
        fp.write(bytes(corrupt))
    with pytest.raises(ValueError):
        binary.read_factors(bad)
    # negative arity
    corrupt[2:10] = (-4).to_bytes(8, "big", signed=True)
    with open(bad, "wb") as fp:
        fp.write(bytes(corrupt))
    with pytest.raises(ValueError):
        binary.read_factors(bad)


def test_truncated_domains_raise(tmp_path):
    g = categorical_graph()
    if not g.domains:
        g.domains = {0: np.asarray([10, 20, 30], np.int64)}
    path = str(tmp_path / "g.domains")
    binary.write_domains(g, path)
    raw = open(path, "rb").read()
    bad = str(tmp_path / "bad.domains")
    with open(bad, "wb") as fp:
        fp.write(raw[:-8])
    with pytest.raises(ValueError):
        binary.read_domains(bad)
    # corrupt cardinality: claim more categories than the file holds
    arr = np.frombuffer(raw, fs.BE_I64).copy()
    arr[1] = 1 << 30
    with open(bad, "wb") as fp:
        fp.write(arr.astype(fs.BE_I64).tobytes())
    with pytest.raises(ValueError):
        binary.read_domains(bad)


def test_truncated_cweights_raise(tmp_path):
    from sampler_tpu.graph import FactorGraph
    g = FactorGraph.build(
        var_card=[3, 2],
        factors=[(fs.FUNC_AND_CATEGORICAL, 0, 1.0,
                  [(0, True, 0), (1, True, 0)],
                  [((0, 1), 1), ((2, 0), 2)])],
        weights=[0.0, 0.5, -0.5],
    )
    path = str(tmp_path / "g.cweights")
    binary.write_comb_weights(g, path)
    raw = open(path, "rb").read()
    bad = str(tmp_path / "bad.cweights")
    with open(bad, "wb") as fp:
        fp.write(raw[:-4])
    with pytest.raises(ValueError):
        binary.read_comb_weights(bad, g.arities())
    # out-of-range factor id
    arr = bytearray(raw)
    arr[0:8] = (99).to_bytes(8, "big")
    with open(bad, "wb") as fp:
        fp.write(bytes(arr))
    with pytest.raises(ValueError):
        binary.read_comb_weights(bad, g.arities())


def test_unknown_role_rejected(tmp_path):
    g = all_functions_graph(n=4)
    g.var_role = g.var_role.copy()
    g.var_role[1] = 7
    with pytest.raises(ValueError, match="unknown variable role 7"):
        g.validate()
    # and through the full load path: write (writer is role-agnostic),
    # then load_graph must refuse
    meta = binary.write_graph(
        all_functions_graph(n=4), str(tmp_path), prefix="ok")
    vf = str(tmp_path / "ok.variables")
    rec = np.fromfile(vf, fs.VARIABLE_RECORD).copy()
    rec["role"][0] = 9
    rec.tofile(vf)
    with pytest.raises(ValueError, match="unknown variable role"):
        binary.load_graph(meta)
