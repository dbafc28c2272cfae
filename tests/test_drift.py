"""Corpus drift audit (operators/drift.py)."""

import math

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.drift import (
    corpus_drift,
    drift_top_terms,
    token_counts,
)


@pytest.fixture()
def pair(spark):
    a = spark.createDataFrame(
        [(0, "x x y"), (1, "x z")], "doc_id long, text string"
    )
    b = spark.createDataFrame(
        [(0, "x y y"), (1, "y w")], "doc_id long, text string"
    )
    return a, b


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(0, "a  b a"), (1, " b ")], "doc_id long, text string"
    )
    got = {r["token"]: r["n"] for r in token_counts(df).collect()}
    assert got == {"a": 2, "b": 2}


def test_drift_caches_count_frames_one_tokenization_each(spark, pair):
    """r12 optimization pin: the two (token, n) count frames are
    persisted inside _join_counts — each feeds its total AND the
    full-outer join, so with lazy lineage every gauge action
    re-tokenized each corpus twice. Cached, each corpus is tokenized
    exactly once; the Pins handle tracks the two frames."""
    from generalized_kmeans_clustering_spark.operators.pins import Pins

    a, b = pair
    pins = Pins()
    out = drift_top_terms(a, b, k=5, pins=pins)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 4, plan
    assert len(pins) == 2
    assert out.count() == 4  # union vocab {x, y, z, w}
    pins.release()


def test_identical_corpora_zero_drift(spark, pair):
    a, _ = pair
    row = corpus_drift(a, a).collect()[0]
    assert row["js"] == pytest.approx(0.0, abs=1e-12)
    assert row["kl_ab"] == pytest.approx(0.0, abs=1e-12)
    assert row["tv"] == pytest.approx(0.0, abs=1e-12)
    assert row["vocab_jaccard"] == 1.0


def test_gauges_hand_computed(pair):
    a, b = pair
    row = corpus_drift(a, b, alpha=0.5).collect()[0]
    # a: x3 y1 z1 (5 tokens); b: x1 y3 w1 (5); union {x,y,z,w} v=4
    assert row["tokens_a"] == 5 and row["tokens_b"] == 5
    assert row["vocab_a"] == 3 and row["vocab_b"] == 3
    assert row["vocab_union"] == 4
    assert row["vocab_jaccard"] == pytest.approx(2 / 4)
    # tv on raw shares: 0.5*(|.6-.2| + |.2-.6| + |.2-0| + |0-.2|) = 0.6
    assert row["tv"] == pytest.approx(0.6)
    # smoothed kl: p=(c+.5)/(5+2), hand-check one direction
    pa = [3.5 / 7, 1.5 / 7, 1.5 / 7, 0.5 / 7]
    qb = [1.5 / 7, 3.5 / 7, 0.5 / 7, 1.5 / 7]
    want = sum(p * math.log(p / q) for p, q in zip(pa, qb))
    assert row["kl_ab"] == pytest.approx(want)
    # js on raw shares
    pr, qr = [.6, .2, .2, 0.0], [.2, .6, 0.0, .2]
    js = 0.0
    for p, q in zip(pr, qr):
        m = (p + q) / 2
        if p > 0:
            js += 0.5 * p * math.log(p / m)
        if q > 0:
            js += 0.5 * q * math.log(q / m)
    assert row["js"] == pytest.approx(js)


def test_js_symmetry_and_bound(pair):
    a, b = pair
    ab = corpus_drift(a, b).collect()[0]["js"]
    ba = corpus_drift(b, a).collect()[0]["js"]
    assert ab == pytest.approx(ba)
    assert 0 <= ab <= math.log(2) + 1e-12


def test_top_terms_order(pair):
    a, b = pair
    rows = drift_top_terms(a, b, k=2).collect()
    # x and y tie at |delta| 0.4 -> token asc breaks the tie
    assert [r["token"] for r in rows] == ["x", "y"]
    assert rows[0]["rank"] == 1 and rows[1]["rank"] == 2
    assert rows[0]["delta"] == pytest.approx(-0.4)
    assert rows[1]["delta"] == pytest.approx(0.4)


def test_bucketed_lower_bounds_and_bounded_output(spark, pair):
    a, b = pair
    full = corpus_drift(a, b).collect()[0]
    bucketed = corpus_drift(a, b, n_buckets=2).collect()[0]
    # data-processing inequality: coarsening can only shrink divergence
    assert bucketed["js"] <= full["js"] + 1e-12
    assert bucketed["tv"] <= full["tv"] + 1e-12
    assert bucketed["vocab_union"] <= 2


def test_alpha_validation(pair):
    a, b = pair
    with pytest.raises(ValueError):
        corpus_drift(a, b, alpha=-1.0)
    with pytest.raises(ValueError):
        drift_top_terms(a, b, k=0)


def test_drift_full_outer_join_evaluated_once(pair):
    """SCALE claim (r8 single-evaluation fix): the totals ride in from
    the two INPUT count frames, so the full-outer token join subtree
    appears exactly ONCE in the plan — aggregating the join and then
    cross-joining the result back onto it evaluated the join (and both
    tokenizations above it) twice per action."""
    a, b = pair
    for df in (corpus_drift(a, b), drift_top_terms(a, b, k=2)):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("FullOuter") == 1, plan
