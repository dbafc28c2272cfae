"""Skew-resilient join and aggregation helpers.

At 100 TB one hot key (the empty-string language, the catch-all
domain, the null-ish fingerprint) can put an entire reducer's worth of
rows behind a single shuffle key. Spark's AQE skew-join handles the
sort-merge case automatically (`spark.sql.adaptive.skewJoin.enabled`)
— PREFER THAT — but two shapes stay exposed:

- a shuffle join against a frame AQE won't split (e.g. the build side
  of a forced broadcast that turned out too big), and
- per-key aggregations where one group's rows all meet at one reducer
  regardless of join strategy.

:func:`salted_join` spreads the skewed side across ``num_salts``
sub-keys deterministically (salt = hash of the row content, so
identical retries land identically — no ``rand()``, which breaks
task-retry determinism) and replicates the other side once per salt.
:func:`salted_distinct_count` runs the classic two-phase distinct:
per-(key, salt) partial distinct, then a final merge — the hot key's
distinct work spreads over ``num_salts`` reducers.

Both are ordinary DataFrame compositions — results are exactly equal
to the unsalted forms (test-asserted), only the shuffle layout
changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_distinct_count"]


def _salt_col(df: DataFrame, num_salts: int):
    """Deterministic per-row salt in [0, num_salts): a hash of the
    full row content. Rows that are bytewise identical share a salt —
    acceptable (they are one row's worth of work each) and the price
    of retry-determinism; ``F.rand()`` would re-draw on task retry and
    can duplicate or drop join matches under speculative execution."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                  F.lit(num_salts)).cast("int")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the ``skewed`` side's hot keys spread over
    ``num_salts`` shuffle sub-keys and ``other`` replicated once per
    salt. Result equals ``skewed.join(other, on, how)`` exactly.

    Cost model: ``other`` shuffles ``num_salts`` × its size — use for
    a SMALL-but-not-broadcastable right side against a skewed left.
    ``how`` supports ``inner`` and ``left`` (the shapes where the
    skewed side's rows dominate; a right/full join should salt the
    other side instead).
    """
    if num_salts <= 0:
        raise ValueError("num_salts must be positive")
    if how not in ("inner", "left"):
        raise ValueError("salted_join: how must be 'inner' or 'left'")
    keys = [on] if isinstance(on, str) else list(on)
    overlap = set(skewed.columns) & set(other.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"salted_join: ambiguous non-key columns {sorted(overlap)}; "
            "rename before joining")
    left = skewed.withColumn("_salt", _salt_col(skewed, num_salts))
    right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return left.join(right, on=keys + ["_salt"], how=how).drop("_salt")


def salted_distinct_count(
    df: DataFrame,
    key_col: str,
    value_col: str,
    num_salts: int = 16,
) -> DataFrame:
    """``(key, n_distinct)`` via two-phase aggregation: phase 1
    deduplicates ``(key, salt-of-value, value)`` — the hot key's
    distinct set spreads across ``num_salts`` reducers — phase 2 sums
    per-salt distinct counts (sub-sets are disjoint BY CONSTRUCTION:
    the salt is a pure function of the value, so no value is counted
    in two salts). Equal to ``groupBy(key).agg(countDistinct(value))``
    exactly, NULL values excluded in both (test-asserted)."""
    if num_salts <= 0:
        raise ValueError("num_salts must be positive")
    v = F.col(value_col)
    staged = df.where(v.isNotNull()).select(
        F.col(key_col).alias("key"),
        F.pmod(F.xxhash64(v), F.lit(num_salts)).cast("int").alias("_salt"),
        v.alias("_v"),
    )
    partial = (
        staged.groupBy("key", "_salt")
        .agg(F.count_distinct("_v").alias("_pd"))
    )
    return partial.groupBy("key").agg(
        F.sum("_pd").alias("n_distinct")
    )
