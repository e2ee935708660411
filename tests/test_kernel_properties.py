"""Property-based tests (hypothesis) for the pure-python drift kernels —
invariants that must hold for ANY histogram input, complementing the
golden-value parity tests (SURVEY §5: the reference leans on fixed
fixtures; properties catch the inputs nobody thought to fix)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deepchecks_spark.drift.kernels import (
    cramers_v_from_counts,
    emd_from_hist,
    ks_from_hist,
    psi_from_counts,
)

# a compressed numeric histogram: distinct float support + positive counts
hist = st.lists(
    st.tuples(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        st.integers(min_value=1, max_value=1000),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)

# a categorical counter with bounded cardinality
counter = st.dictionaries(
    st.sampled_from([f"c{i}" for i in range(8)]),
    st.integers(min_value=1, max_value=10_000),
    min_size=1,
    max_size=8,
)


def _split(h):
    vs = [v for v, _ in h]
    cs = [c for _, c in h]
    return vs, cs


@settings(max_examples=200, deadline=None)
@given(hist)
def test_ks_identity_is_zero(h):
    vs, cs = _split(h)
    assert ks_from_hist(vs, cs, vs, cs) == 0.0


@settings(max_examples=200, deadline=None)
@given(hist, hist)
def test_ks_bounded_and_symmetric(h1, h2):
    v1, c1 = _split(h1)
    v2, c2 = _split(h2)
    ks = ks_from_hist(v1, c1, v2, c2)
    assert 0.0 <= ks <= 1.0
    assert ks == pytest.approx(ks_from_hist(v2, c2, v1, c1), abs=1e-12)


@settings(max_examples=100, deadline=None)
@given(hist, hist)
def test_ks_disjoint_supports_is_one(h1, h2):
    # shift h2 strictly above h1 → total separation → KS exactly 1
    v1, c1 = _split(h1)
    v2, c2 = _split(h2)
    shift = max(v1) - min(v2) + 1.0
    v2s = [v + shift for v in v2]
    if max(v1) < min(v2s):  # guard float rounding at 1e6 magnitudes
        assert ks_from_hist(v1, c1, v2s, c2) == pytest.approx(1.0)


@settings(max_examples=200, deadline=None)
@given(hist)
def test_emd_identity_is_zero(h):
    vs, cs = _split(h)
    assert emd_from_hist(vs, cs, vs, cs, margin_quantile_filter=0.0) == pytest.approx(0.0)


@settings(max_examples=200, deadline=None)
@given(hist, hist)
def test_emd_bounded_and_symmetric(h1, h2):
    # after the joint min-max scaling to [0,1], W1 is bounded by 1
    v1, c1 = _split(h1)
    v2, c2 = _split(h2)
    emd = emd_from_hist(v1, c1, v2, c2, margin_quantile_filter=0.0)
    assert 0.0 <= emd <= 1.0 + 1e-12
    assert emd == pytest.approx(
        emd_from_hist(v2, c2, v1, c1, margin_quantile_filter=0.0), abs=1e-12)


@settings(max_examples=200, deadline=None)
@given(counter)
def test_psi_identity_is_zero(c):
    assert psi_from_counts(c, c) == pytest.approx(0.0)


@settings(max_examples=200, deadline=None)
@given(counter, counter)
def test_psi_nonnegative(c1, c2):
    # PSI is an f-divergence-style sum of (p−q)·log(p/q) terms, each ≥ 0
    # whenever both arguments share the floor — nonnegativity must
    # survive the 0.01 flooring and the shared-binning roll-up
    assert psi_from_counts(c1, c2) >= -1e-12


@settings(max_examples=200, deadline=None)
@given(counter)
def test_cramers_v_identity_is_zero(c):
    assert cramers_v_from_counts(c, c) == pytest.approx(0.0, abs=1e-9)


@settings(max_examples=200, deadline=None)
@given(counter, counter)
def test_cramers_v_bounded(c1, c2):
    v = cramers_v_from_counts(c1, c2)
    assert 0.0 <= v <= 1.0 + 1e-9


@settings(max_examples=100, deadline=None)
@given(counter, st.integers(min_value=2, max_value=100))
def test_psi_scale_invariant(c, k):
    # multiplying every count by k changes nothing — PSI sees proportions
    scaled = {key: v * k for key, v in c.items()}
    assert psi_from_counts(c, scaled) == pytest.approx(0.0, abs=1e-12)
    assert psi_from_counts(scaled, c) == pytest.approx(0.0, abs=1e-12)


@settings(max_examples=200, deadline=None)
@given(counter, counter,
       st.floats(min_value=0.0, max_value=0.3),
       st.one_of(st.none(), st.integers(min_value=1, max_value=6)))
def test_binning_conserves_totals(c1, c2, min_ratio, max_cats):
    # Reference semantic (preprocessing.py:192-199, reproduced exactly):
    # when the accumulated Other mass stays at or below the ratio
    # threshold on BOTH sides, the Other bin is NOT emitted and that
    # sub-threshold mass is deliberately dropped. So: exact conservation
    # whenever the Other bin exists; otherwise the deficit is bounded by
    # the threshold on each side — and mass is never created.
    from deepchecks_spark.drift.kernels import OTHER_CATEGORY_NAME, preprocess_counts_to_same_bins

    t1, t2 = sum(c1.values()), sum(c2.values())
    b1, b2, cats = preprocess_counts_to_same_bins(c1, c2, min_ratio, max_cats)
    assert len(b1) == len(b2) == len(cats)
    assert len(cats) == len(set(cats))  # no duplicate bins
    if OTHER_CATEGORY_NAME in cats:
        assert b1.sum() == t1
        assert b2.sum() == t2
    else:
        assert b1.sum() <= t1 and t1 - b1.sum() <= min_ratio * t1 + 1e-9
        assert b2.sum() <= t2 and t2 - b2.sum() <= min_ratio * t2 + 1e-9
    if max_cats is not None:
        assert len(cats) <= max_cats + 1  # top-N plus at most one Other


@settings(max_examples=50, deadline=None)
@given(counter, counter)
def test_binning_deterministic(c1, c2):
    from deepchecks_spark.drift.kernels import preprocess_counts_to_same_bins

    a = preprocess_counts_to_same_bins(c1, c2, 0.01, 4)
    b = preprocess_counts_to_same_bins(dict(reversed(list(c1.items()))),
                                       dict(reversed(list(c2.items()))), 0.01, 4)
    assert a[2] == b[2]
    assert (a[0] == b[0]).all() and (a[1] == b[1]).all()
