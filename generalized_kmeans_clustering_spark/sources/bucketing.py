"""Bucketed-table helpers for shuffle-free co-located joins.

Engine extension (driver mandate: "use bucketing for co-located
joins"). Spark's bucketed tables hash-partition data into a fixed
number of files per partition at WRITE time; a join between two
tables bucketed on the same key with the same bucket count needs NO
exchange on either side — the shuffle is paid once at ingest, then
every subsequent join/aggregation on that key is map-side.

At 100 TB this is the difference between re-shuffling the fact table
for every query and never shuffling it again: bucket `lineitem` by
`l_orderkey` once, and every orders⋈lineitem join plans as
SortMergeJoin over pre-bucketed scans (zero Exchange), with one-to-one
bucket pairing across tables.

Bucketing requires the table catalog (``saveAsTable``) — plain
``.parquet(path)`` writes cannot record bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["write_bucketed_table", "is_bucketed", "assert_no_exchange"]


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols,
    num_buckets: int = 64,
    sort_cols=None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    ``sort_cols`` additionally sorts within buckets so downstream
    sort-merge joins skip their sort as well. Both join sides must use
    the SAME ``num_buckets`` for exchange-free planning.
    """
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = df.write.mode(mode).format(format).bucketBy(num_buckets, *cols)
    if sort_cols:
        scols = ([sort_cols] if isinstance(sort_cols, str)
                 else list(sort_cols))
        w = w.sortBy(*scols)
    w.saveAsTable(table)


def is_bucketed(spark, table: str) -> bool:
    """True when the catalog records bucket metadata for ``table``."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    return any(r["col_name"] == "Num Buckets" for r in rows)


def assert_no_exchange(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle Exchange — the
    check that a bucketed join actually planned co-located."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # ReusedExchange/BroadcastExchange don't re-shuffle rows by key;
    # the co-location contract is about ShuffleExchange ("Exchange
    # hashpartitioning" nodes)
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            raise AssertionError(
                "plan contains a hash-partitioning Exchange — join is "
                "not co-located:\n" + plan
            )
