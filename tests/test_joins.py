"""Skew helpers (operators/joins.py): exact equality with unsalted
forms, salt distribution, and validation."""

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.joins import (
    salted_distinct_count,
    salted_join,
)


@pytest.fixture()
def skewed_pair(spark):
    # 90% of rows share key "hot"
    rows = [(i, "hot" if i % 10 else f"k{i}") for i in range(200)]
    left = spark.createDataFrame(rows, "id long, key string")
    right = spark.createDataFrame(
        [("hot", 1.0), ("k10", 2.0), ("k20", 3.0), ("unmatched", 9.0)],
        "key string, w double",
    )
    return left, right


def test_salted_join_equals_plain_inner(skewed_pair):
    left, right = skewed_pair
    plain = {(r["id"], r["w"]) for r in
             left.join(right, "key").collect()}
    salted = {(r["id"], r["w"]) for r in
              salted_join(left, right, "key", num_salts=8).collect()}
    assert salted == plain and len(plain) > 100


def test_salted_join_equals_plain_left(skewed_pair):
    left, right = skewed_pair
    plain = {(r["id"], r["w"]) for r in
             left.join(right, "key", "left").collect()}
    salted = {(r["id"], r["w"]) for r in
              salted_join(left, right, "key", num_salts=8,
                          how="left").collect()}
    assert salted == plain
    assert any(w is None for _, w in plain)  # unmatched keys survive


def test_salted_join_spreads_hot_key(skewed_pair):
    left, _ = skewed_pair
    from generalized_kmeans_clustering_spark.operators.joins import (
        _salt_col,
    )
    hot = left.where(F.col("key") == "hot")
    n_salts = hot.select(
        _salt_col(left, 8).alias("s")).distinct().count()
    assert n_salts >= 6  # hot rows land on most of the 8 sub-keys


def test_salted_join_validation(skewed_pair, spark):
    left, right = skewed_pair
    with pytest.raises(ValueError):
        salted_join(left, right, "key", num_salts=0)
    with pytest.raises(ValueError):
        salted_join(left, right, "key", how="full")
    clash = right.withColumnRenamed("w", "id")  # non-key overlap
    with pytest.raises(ValueError):
        salted_join(left, clash, "key")


def test_salted_distinct_count_equals_plain(spark):
    rows = [("hot", i % 37) for i in range(300)] + \
        [("cold", v) for v in (1, 2, 2, None)]
    df = spark.createDataFrame(rows, "key string, v int")
    plain = {r["key"]: r["n"] for r in df.groupBy("key").agg(
        F.count_distinct("v").alias("n")).collect()}
    salted = {r["key"]: r["n_distinct"] for r in
              salted_distinct_count(df, "key", "v", num_salts=8).collect()}
    assert salted == plain
    assert salted["hot"] == 37 and salted["cold"] == 2
