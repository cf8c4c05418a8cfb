"""Native C++ host library vs pure-Python spec equivalence tests."""
import numpy as np
import pytest

from sampler_tpu import fixtures, native
from sampler_tpu.coloring import validate_coloring
from sampler_tpu.io import binary

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_version():
    assert native.version().startswith("sampler-native")


@pytest.mark.parametrize("name", ["biased_coin", "ising_grid",
                                  "all_functions_graph", "categorical_graph",
                                  "mixed_graph"])
def test_factor_parse_matches_python(name, tmp_path):
    g = getattr(fixtures, name)()
    binary.write_factors(g, str(tmp_path / "f.bin"))
    raw = open(tmp_path / "f.bin", "rb").read()
    nat = native.parse_factors(raw)

    # pure-Python reference parse (bypass the native fast path)
    import sampler_tpu.native as nmod
    saved = nmod._LIB
    nmod._LIB = None
    try:
        py = binary.read_factors(str(tmp_path / "f.bin"))
    finally:
        nmod._LIB = saved

    for a, b in zip(nat, py):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("name,kwargs", [
    ("ising_grid", {"rows": 6, "cols": 5}),
    ("all_functions_graph", {}),
    ("categorical_graph", {}),
    ("random_boolean_graph", {"n_vars": 300, "n_factors": 700, "seed": 1}),
])
def test_native_coloring_valid(name, kwargs):
    g = getattr(fixtures, name)(**kwargs)
    colors = native.greedy_color(g.n_vars, g.f_ptr, g.e_vid)
    assert colors is not None and (colors >= 0).all()
    validate_coloring(g, colors)


def test_malformed_factor_file_rejected():
    with pytest.raises(ValueError):
        native.parse_factors(b"\x00\x01\x02")
