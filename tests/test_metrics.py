"""ErrorSuite metric tests with hand-computed constants.

Mirrors the reference's exact-value test style (model/error_test.go) —
constants below are derived by hand / verified against scipy formulas.
"""

import math

import numpy as np
import pytest

from grample_tpu.metrics import (
    error_suite,
    hellinger,
    js_divergence,
    max_abs_diff,
    mean_abs_diff,
)
from grample_tpu.metrics.divergences import pad_marginals

P = np.array([[0.25, 0.75]])
Q = np.array([[0.5, 0.5]])
CARDS = np.array([2])

# hand-computed for p=[.25,.75], q=[.5,.5]
HELL_PQ = math.sqrt((0.5 - math.sqrt(0.5)) ** 2 + (math.sqrt(0.75) - math.sqrt(0.5)) ** 2) / math.sqrt(2)
JS_PQ = 0.5 * (
    0.25 * math.log2(0.25 / 0.375)
    + 0.75 * math.log2(0.75 / 0.625)
    + 0.5 * math.log2(0.5 / 0.375)
    + 0.5 * math.log2(0.5 / 0.625)
)


def test_basic_values():
    assert max_abs_diff(P, Q, CARDS)[0] == pytest.approx(0.25)
    assert mean_abs_diff(P, Q, CARDS)[0] == pytest.approx(0.25)
    assert hellinger(P, Q, CARDS)[0] == pytest.approx(HELL_PQ, abs=1e-12)
    assert js_divergence(P, Q, CARDS)[0] == pytest.approx(JS_PQ, abs=1e-12)


def test_identity_is_zero():
    for fn in (max_abs_diff, mean_abs_diff, hellinger, js_divergence):
        assert fn(P, P, CARDS)[0] == pytest.approx(0.0, abs=1e-12)


def test_normalization_invariance():
    """Counts (unnormalized) give identical results to probabilities."""
    for fn in (max_abs_diff, mean_abs_diff, hellinger, js_divergence):
        a = fn(P * 123.0, Q * 0.02, CARDS)[0]
        b = fn(P, Q, CARDS)[0]
        assert a == pytest.approx(b, abs=1e-12)


def test_fixed_vars_are_zero_and_excluded():
    p = np.array([[0.25, 0.75], [0.9, 0.1]])
    q = np.array([[0.5, 0.5], [0.1, 0.9]])
    cards = np.array([2, 2])
    fixed = np.array([-1, 1])  # second var fixed
    assert hellinger(p, q, cards, fixed, None)[1] == 0.0
    es = error_suite(p, q, cards, fixed, None)
    # only var 0 in the mean denominator
    assert es.mean_hellinger == pytest.approx(HELL_PQ, abs=1e-12)
    assert es.max_hellinger == pytest.approx(HELL_PQ, abs=1e-12)
    assert es.mean_js == pytest.approx(JS_PQ, abs=1e-12)
    # all vars fixed -> error
    with pytest.raises(ValueError):
        error_suite(p, q, cards, np.array([0, 1]), None)


def test_mixed_cardinality_padding():
    p = pad_marginals([np.array([0.25, 0.75]), np.array([0.2, 0.3, 0.5])], np.array([2, 3]))
    q = pad_marginals([np.array([0.5, 0.5]), np.array([0.2, 0.3, 0.5])], np.array([2, 3]))
    cards = np.array([2, 3])
    h = hellinger(p, q, cards)
    assert h[0] == pytest.approx(HELL_PQ, abs=1e-12)
    assert h[1] == pytest.approx(0.0, abs=1e-12)
    d = mean_abs_diff(p, q, cards)
    assert d[0] == pytest.approx(0.25)  # divided by card=2, not pad width


def test_zero_total_floor():
    """A zero marginal normalizes against the 1e-12 floor, not a crash."""
    p = np.array([[0.0, 0.0]])
    q = np.array([[0.5, 0.5]])
    out = hellinger(p, q, CARDS)
    assert np.isfinite(out).all()


def test_error_suite_shape():
    p = np.array([[0.25, 0.75], [0.9, 0.1]])
    q = np.array([[0.5, 0.5], [0.1, 0.9]])
    es = error_suite(p, q, np.array([2, 2]))
    assert es.max_hellinger >= es.mean_hellinger - 1e-15
    assert es.max_js >= es.mean_js - 1e-15
    assert es.max_max_abs >= es.max_mean_abs - 1e-15
    d = es.as_dict()
    assert len(d) == 8
