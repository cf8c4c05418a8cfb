import numpy as np
import pytest

from sampler_tpu import fixtures
from sampler_tpu.coloring import greedy_coloring, validate_coloring


@pytest.mark.parametrize("fixture,kwargs", [
    ("biased_coin", {}),
    ("ising_chain", {}),
    ("ising_grid", {"rows": 5, "cols": 7}),
    ("all_functions_graph", {}),
    ("categorical_graph", {}),
    ("mixed_graph", {}),
    ("random_boolean_graph", {"n_vars": 200, "n_factors": 400, "seed": 3}),
])
def test_coloring_valid(fixture, kwargs):
    g = getattr(fixtures, fixture)(**kwargs)
    colors = greedy_coloring(g)
    assert (colors >= 0).all()
    validate_coloring(g, colors)


def test_grid_is_two_colorable():
    g = fixtures.ising_grid(4, 4)
    colors = greedy_coloring(g)
    assert colors.max() <= 3  # greedy may use a few more than 2, but bounded
