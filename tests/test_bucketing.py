"""Bucketed tables plan exchange-free co-located joins."""

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.sources.bucketing import (
    assert_no_exchange, is_bucketed, write_bucketed_table,
)


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # warehouse dir is a static conf fixed at session start; tables
    # land in ./spark-warehouse and are dropped (+files removed) below
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed_table(orders, "orders_b", "o_orderkey", 8,
                         sort_cols="o_orderkey")
    write_bucketed_table(lineitem, "lineitem_b", "l_orderkey", 8,
                         sort_cols="l_orderkey")
    yield spark
    import shutil

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)


def test_catalog_records_buckets(bucketed):
    spark = bucketed
    assert is_bucketed(spark, "orders_b")
    assert is_bucketed(spark, "lineitem_b")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("orders_b")
        li = spark.table("lineitem_b")
        j = o.join(li, o.o_orderkey == li.l_orderkey).select(
            "o_orderkey", "l_quantity")
        assert_no_exchange(j)
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_shuffles(bucketed, sf_dir):
    spark = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        j = o.join(li, o.o_orderkey == li.l_orderkey).select(
            "o_orderkey", "l_quantity")
        with pytest.raises(AssertionError):
            assert_no_exchange(j)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_aggregation_reuses_distribution(bucketed):
    spark = bucketed
    li = spark.table("lineitem_b")
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    # groupBy on the bucket key needs no exchange either
    assert_no_exchange(agg)
    assert agg.count() > 0
