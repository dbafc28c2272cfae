"""Property tests (hypothesis) for the pure-driver curation math:
temperature budget allocation and the SRP hyperplane generator. No
SparkSession needed — these run in milliseconds."""

import math

from hypothesis import given, settings, strategies as st

from generalized_kmeans_clustering_spark.operators.sampling import (
    temperature_budgets,
)
from generalized_kmeans_clustering_spark.operators.similarity import (
    srp_signs,
)

totals_st = st.dictionaries(
    st.text(min_size=1, max_size=6),
    st.integers(min_value=0, max_value=10**12),
    min_size=1, max_size=8,
)


@settings(max_examples=200, deadline=None)
@given(totals=totals_st,
       alpha=st.floats(min_value=0.0, max_value=2.0,
                       allow_nan=False, allow_infinity=False),
       budget=st.integers(min_value=0, max_value=10**12))
def test_temperature_budgets_conserve_and_bound(totals, alpha, budget):
    out = temperature_budgets(totals, alpha, budget)
    assert set(out) <= set(totals) or out == {s: 0 for s in totals}
    nonzero = {s: t for s, t in totals.items() if (t or 0) > 0}
    if not nonzero:
        assert all(v == 0 for v in out.values())
        return
    # conservation: shares sum to the full budget
    assert math.isclose(sum(out.values()), budget,
                        rel_tol=1e-9, abs_tol=1e-6)
    assert all(v >= 0 for v in out.values())
    # alpha=1 is exactly proportional
    if alpha == 1.0:
        z = sum(nonzero[s] for s in sorted(nonzero))
        for s, t in nonzero.items():
            assert math.isclose(out[s], t / z * budget,
                                rel_tol=1e-9, abs_tol=1e-6)


@settings(max_examples=100, deadline=None)
@given(totals=st.fixed_dictionaries(
    {"big": st.integers(10**6, 10**9), "small": st.integers(1, 10**3)}),
    budget=st.integers(1, 10**9))
def test_temperature_upweights_small_strata_monotonically(totals, budget):
    # as alpha decreases, the small stratum's SHARE never shrinks
    prev = None
    for alpha in (1.0, 0.7, 0.5, 0.3, 0.0):
        out = temperature_budgets(totals, alpha, budget)
        share = out["small"] / budget
        if prev is not None:
            assert share >= prev - 1e-12
        prev = share


@settings(max_examples=50, deadline=None)
@given(num_bits=st.integers(1, 64), dim=st.integers(1, 64),
       seed=st.integers(0, 1000))
def test_srp_signs_shape_values_determinism(num_bits, dim, seed):
    a = srp_signs(num_bits, dim, seed)
    assert len(a) == num_bits and all(len(r) == dim for r in a)
    assert all(v in (1.0, -1.0) for r in a for v in r)
    assert a == srp_signs(num_bits, dim, seed)
    # roughly balanced overall (md5 uniformity): not all-same sign
    if num_bits * dim >= 32:
        flat = [v for r in a for v in r]
        assert 0.2 < (sum(1 for v in flat if v > 0) / len(flat)) < 0.8
