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


# ---- round-7 pure-driver math: BPE learning/application ----

from generalized_kmeans_clustering_spark.operators.tokenizer import (  # noqa: E402
    _segment,
    learn_merges_from_counts,
)

words_st = st.lists(
    st.text(alphabet="abcde", min_size=1, max_size=10),
    min_size=1, max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(words=words_st, k=st.integers(min_value=0, max_value=12))
def test_bpe_segments_concatenate_to_word_and_shrink(words, k):
    """For ANY learned merge list: segments concatenate back to the
    word exactly, every segment is non-empty, and applying a longer
    merge list never increases a word's token count."""
    counts = [(w, words.count(w)) for w in set(words)]
    merges = learn_merges_from_counts(sorted(counts), k)
    assert len(merges) <= k
    for w in set(words):
        syms = _segment(w, [tuple(m) for m in merges])
        assert "".join(syms) == w
        assert all(syms)
        assert len(syms) <= len(w)
        if k > 0:
            fewer = _segment(w, [tuple(m) for m in merges[:-1]])
            assert len(syms) <= len(fewer)


@settings(max_examples=200, deadline=None)
@given(words=words_st, k=st.integers(min_value=1, max_value=10))
def test_bpe_replace_chain_twin_equivalence_property(words, k):
    """The DuckDB twin's per-symbol-delimited replace chain equals
    canonical application for arbitrary words and learned merges —
    the property the corpus_bpe_* oracle rows depend on."""
    counts = [(w, words.count(w)) for w in set(words)]
    merges = [tuple(m) for m in
              learn_merges_from_counts(sorted(counts), k)]
    for w in set(words):
        s = "".join(f"\x01{c}\x02" for c in w)
        for a, b in merges:
            s = s.replace(f"\x01{a}\x02\x01{b}\x02", f"\x01{a}{b}\x02")
        chain = [t[:-1] for t in s.split("\x01") if t]
        assert chain == _segment(w, merges), (w, merges)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abc", min_size=1,
                                  max_size=8),
                          st.integers(min_value=1, max_value=100)),
                min_size=1, max_size=10, unique_by=lambda t: t[0]),
       st.integers(min_value=0, max_value=8))
def test_bpe_learning_deterministic(word_counts, k):
    """Same count table → same merges, independent of input order."""
    a = learn_merges_from_counts(word_counts, k)
    b = learn_merges_from_counts(list(reversed(word_counts)), k)
    assert a == b


# --------------------------------------------------------------------------
# agreement.py driver math — bounds, symmetry, invariances
# --------------------------------------------------------------------------

from generalized_kmeans_clustering_spark.agreement import (  # noqa: E402
    agreement_from_cells,
)

_cells_strategy = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 4),
              st.integers(min_value=1, max_value=50)),
    min_size=1, max_size=20, unique_by=lambda t: (t[0], t[1]),
)


@settings(max_examples=150, deadline=None)
@given(_cells_strategy)
def test_agreement_bounds(cells):
    m = agreement_from_cells([(a, b, float(n)) for a, b, n in cells])
    assert -1.0 - 1e-9 <= m["ari"] <= 1.0 + 1e-9
    assert 0.0 <= m["rand"] <= 1.0 + 1e-9
    assert 0.0 <= m["fowlkes_mallows"] <= 1.0 + 1e-9
    assert -1e-9 <= m["nmi"] <= 1.0 + 1e-9
    assert 0.0 - 1e-9 <= m["homogeneity"] <= 1.0 + 1e-9
    assert 0.0 - 1e-9 <= m["completeness"] <= 1.0 + 1e-9
    assert 0.0 <= m["purity"] <= 1.0 + 1e-9


@settings(max_examples=150, deadline=None)
@given(_cells_strategy)
def test_agreement_transpose_symmetry(cells):
    """Swapping label/prediction roles transposes the contingency:
    symmetric metrics are invariant, homogeneity <-> completeness."""
    fwd = agreement_from_cells([(a, b, float(n)) for a, b, n in cells])
    rev = agreement_from_cells([(b, a, float(n)) for a, b, n in cells])
    for k in ("ari", "rand", "fowlkes_mallows", "nmi", "v_measure"):
        assert math.isclose(fwd[k], rev[k], abs_tol=1e-9), k
    assert math.isclose(fwd["homogeneity"], rev["completeness"],
                        abs_tol=1e-9)
    assert math.isclose(fwd["completeness"], rev["homogeneity"],
                        abs_tol=1e-9)


@settings(max_examples=100, deadline=None)
@given(_cells_strategy, st.integers(min_value=2, max_value=7))
def test_agreement_count_scaling_invariance(cells, factor):
    """Multiplying every cell count by a constant leaves the
    information-theoretic and purity metrics unchanged (they are
    share-based); pair-counting metrics converge but are n-dependent,
    so only the share-based family is asserted."""
    base = agreement_from_cells([(a, b, float(n)) for a, b, n in cells])
    scaled = agreement_from_cells(
        [(a, b, float(n * factor)) for a, b, n in cells])
    for k in ("nmi", "homogeneity", "completeness", "v_measure",
              "purity"):
        assert math.isclose(base[k], scaled[k], abs_tol=1e-9), k
