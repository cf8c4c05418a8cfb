"""Truth-table tests for every factor function — NumPy spec side.

Equivalent of the reference's factor_test.cc (recalled; SURVEY.md §4):
exhaustive enumeration of literal combinations per type.
"""
import itertools

import numpy as np
import pytest

from sampler_tpu import factor_functions as ff
from sampler_tpu import format_spec as fs


def phi(ftype, lits, mask=None):
    return float(ff.eval_factor(ftype, np.asarray([lits], bool),
                                None if mask is None else np.asarray([mask], bool))[0])


def test_istrue():
    assert phi(fs.FUNC_ISTRUE, [True]) == 1.0
    assert phi(fs.FUNC_ISTRUE, [False]) == 0.0


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_and_or(n):
    for bits in itertools.product([False, True], repeat=n):
        assert phi(fs.FUNC_AND, list(bits)) == float(all(bits))
        assert phi(fs.FUNC_AND_CATEGORICAL, list(bits)) == float(all(bits))
        assert phi(fs.FUNC_OR, list(bits)) == float(any(bits))


def test_equal():
    for a, b in itertools.product([False, True], repeat=2):
        assert phi(fs.FUNC_EQUAL, [a, b]) == float(a == b)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_imply(n):
    for bits in itertools.product([False, True], repeat=n):
        body, head = bits[:-1], bits[-1]
        # NATURAL: 0 unless body fully satisfied; then = head
        expect_nat = float(all(body) and head)
        assert phi(fs.FUNC_IMPLY_NATURAL, list(bits)) == expect_nat
        # MLN: vacuous truth when body unsatisfied
        expect_mln = float((not all(body)) or head)
        assert phi(fs.FUNC_IMPLY_MLN, list(bits)) == expect_mln


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_linear_family(n):
    for bits in itertools.product([False, True], repeat=n):
        body, head = bits[:-1], bits[-1]
        if n == 1:
            lin = float(head)
        else:
            lin = float(sum((not b) or head for b in body))
        assert phi(fs.FUNC_LINEAR, list(bits)) == lin
        assert phi(fs.FUNC_RATIO, list(bits)) == pytest.approx(np.log1p(lin))
        assert phi(fs.FUNC_LOGICAL, list(bits)) == float(lin > 0)


def test_padding_mask_ignored():
    # padded slots must not affect phi
    base = phi(fs.FUNC_AND, [True, True, False], [True, True, False])
    assert base == 1.0
    assert phi(fs.FUNC_OR, [False, False, True], [True, True, False]) == 0.0


def test_literal_negation_and_categorical():
    # boolean: eqpred=1 → lit = (v==1) XNOR ispos
    assert ff.literals(1, 1, True)
    assert not ff.literals(0, 1, True)
    assert ff.literals(0, 1, False)
    # categorical: compare against per-edge predicate
    assert ff.literals(3, 3, True)
    assert not ff.literals(2, 3, True)
    assert ff.literals(2, 3, False)
