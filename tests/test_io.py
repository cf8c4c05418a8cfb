"""Round-trip tests for binary and text IO (reference analog:
binary_parsing_test / loading_test — SURVEY.md §4)."""
import numpy as np
import pytest

from sampler_tpu import fixtures
from sampler_tpu import format_spec as fs
from sampler_tpu.graph import FactorGraph
from sampler_tpu.io import binary, text, results


def graphs_equal(a: FactorGraph, b: FactorGraph):
    np.testing.assert_array_equal(a.var_dtype, b.var_dtype)
    np.testing.assert_array_equal(a.var_role, b.var_role)
    np.testing.assert_array_equal(a.var_init, b.var_init)
    np.testing.assert_array_equal(a.var_card, b.var_card)
    np.testing.assert_allclose(a.w_init, b.w_init)
    np.testing.assert_array_equal(a.w_fixed, b.w_fixed)
    np.testing.assert_array_equal(a.f_type, b.f_type)
    np.testing.assert_array_equal(a.f_wid, b.f_wid)
    np.testing.assert_allclose(a.f_feat, b.f_feat)
    np.testing.assert_array_equal(a.f_ptr, b.f_ptr)
    np.testing.assert_array_equal(a.e_vid, b.e_vid)
    np.testing.assert_array_equal(a.e_ispos, b.e_ispos)
    np.testing.assert_array_equal(a.e_eqpred, b.e_eqpred)


FIXTURES = ["biased_coin", "ising_grid", "all_functions_graph",
            "categorical_graph", "mixed_graph"]


@pytest.mark.parametrize("name", FIXTURES)
def test_binary_round_trip(name, tmp_path):
    g = getattr(fixtures, name)()
    meta = binary.write_graph(g, str(tmp_path))
    g2 = binary.load_graph(meta)
    graphs_equal(g, g2)


def test_binary_is_big_endian(tmp_path):
    """Weight record bytes must be network order (reference contract)."""
    g = fixtures.biased_coin(1.0)
    binary.write_weights(g, str(tmp_path / "w"))
    raw = open(tmp_path / "w", "rb").read()
    assert len(raw) == 17  # i64 + u8 + f64
    assert raw[:8] == (0).to_bytes(8, "big")
    import struct
    assert struct.unpack(">d", raw[9:17])[0] == 1.0


def test_domains_round_trip(tmp_path):
    g = fixtures.categorical_graph(n=4, card=3)
    # sparse domain: dense k ↔ sparse value 100+10k for var 0
    g.domains = {0: np.asarray([100, 110, 120], np.int64)}
    meta = binary.write_graph(g, str(tmp_path))
    dom_path = str(tmp_path / "graph.domains")
    g2 = binary.load_graph(meta, domains_path=dom_path)
    graphs_equal(g, g2)
    assert list(g2.domains[0]) == [100, 110, 120]


@pytest.mark.parametrize("name", FIXTURES)
def test_text_round_trip(name):
    g = getattr(fixtures, name)()
    sections = text.graph_to_text(g)
    g2 = text.text_to_graph(sections["weights"], sections["variables"],
                            sections["factors"], sections["domains"])
    graphs_equal(g, g2)


def test_results_output(tmp_path):
    g = fixtures.mixed_graph()
    K = int(g.var_card.max())
    marg = np.random.default_rng(0).random((g.n_vars, K))
    p = str(tmp_path / "out.text")
    results.write_marginals(g, marg, p)
    parsed = results.read_marginals(p)
    # boolean rows: single line with P(v=1); categorical: card lines
    n_lines = sum(1 if g.var_dtype[v] == fs.DTYPE_BOOLEAN else int(g.var_card[v])
                  for v in range(g.n_vars))
    assert len(parsed) == n_lines
    assert parsed[0][2] == pytest.approx(marg[0, 1], abs=1e-6)

    wp = str(tmp_path / "w.text")
    results.write_weights_out(g.w_init, wp)
    lines = open(wp).read().splitlines()
    assert len(lines) == g.n_weights
    assert float(lines[0].split()[1]) == pytest.approx(g.w_init[0])


def cw_equal(a: FactorGraph, b: FactorGraph):
    graphs_equal(a, b)
    if a.cw_fid is None:
        assert b.cw_fid is None or len(b.cw_fid) == 0
        return
    np.testing.assert_array_equal(a.cw_fid, b.cw_fid)
    np.testing.assert_array_equal(a.cw_cats, b.cw_cats)
    np.testing.assert_array_equal(a.cw_wid, b.cw_wid)


@pytest.mark.parametrize("name", FIXTURES)
def test_old_format_round_trip(name, tmp_path):
    """OLD two-file revision (separate edges file — SURVEY.md §2a): a
    non-empty edges entry in the meta CSV must select the old parser; the
    loaded graph is identical to the new-format load."""
    g = getattr(fixtures, name)()
    meta = binary.write_graph(g, str(tmp_path), old_format=True)
    counts, files = binary.read_meta(meta)
    assert files["edges"]
    graphs_equal(g, binary.load_graph(meta))


def test_old_format_edge_order_independent(tmp_path):
    """Old-format edges may arrive in ANY file order; (fid, position)
    determine placement."""
    g = fixtures.mixed_graph()
    meta = binary.write_graph(g, str(tmp_path), old_format=True)
    _, files = binary.read_meta(meta)
    path = str(tmp_path / "graph.edges")
    rec = np.fromfile(path, fs.EDGE_RECORD)
    rng = np.random.default_rng(0)
    rec[rng.permutation(len(rec))].tofile(path)
    graphs_equal(g, binary.load_graph(meta))


def test_old_format_bad_edge_count_fails_loudly(tmp_path):
    g = fixtures.mixed_graph()
    meta = binary.write_graph(g, str(tmp_path), old_format=True)
    path = str(tmp_path / "graph.edges")
    rec = np.fromfile(path, fs.EDGE_RECORD)
    rec[:-1].tofile(path)
    with pytest.raises(ValueError, match="edges file"):
        binary.load_graph(meta)


def test_comb_weights_round_trip(tmp_path):
    """Sparse per-combination weights survive write_graph/load_graph."""
    g = fixtures.sparse_categorical_graph()
    meta = binary.write_graph(g, str(tmp_path))
    cw_equal(g, binary.load_graph(meta))


def test_comb_weights_old_format_round_trip(tmp_path):
    g = fixtures.sparse_categorical_graph(seed=1)
    meta = binary.write_graph(g, str(tmp_path), old_format=True)
    cw_equal(g, binary.load_graph(meta))
