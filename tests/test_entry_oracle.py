"""Local replica of the driver's t2 gate: run every __spark_entry__
query on Spark AND its oracle SQL on DuckDB over the same parquet,
then compare row counts, schemas (by sorted column name) and exact
values. Uses sf0.001 for speed; the driver runs sf0.01.
"""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_conn(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]

    sdf = q(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duck_conn(sf_dir)
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()

    assert sorted(scols) == sorted(dcols), f"{name}: columns differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    a = normalize(srows, scols)
    b = normalize(drows, dcols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0


def test_all_queries_run(spark, sf_dir):
    # Registry parity, both directions. The pre-r13 version ALSO
    # built+counted every query here (446s), which was fully redundant
    # with test_query_matches_oracle: parity means the exact same 169
    # builders are each built AND collected by the value gate above —
    # cut so the driver-window suite budget goes to real coverage
    # (r12 verdict item 1b).
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in oracles:
        assert name in qs, f"oracle {name} has no query"
    for name in qs:
        assert name in oracles, f"query {name} has no oracle"
    assert len(qs) == len(oracles)


# The driver's value hash is TYPE-sensitive where this file's Python
# value-compare is not: DuckDB promotes sum(BIGINT) — including window
# sums and greatest/least over them — to HUGEINT, which hashes
# differently from Spark's BIGINT even when every value is equal
# (int == int passes here, so round 5 shipped 4 red rows the local
# gate could not see). Binding the relation is enough to get result
# types — no execution, so this scan is cheap.
_DISALLOWED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_oracle_result_types_hashable(sf_dir, name):
    sql = entrymod.oracle_sql()[name]
    con = duck_conn(sf_dir)
    try:
        rel = con.sql(sql)
        bad = [
            (col, str(typ))
            for col, typ in zip(rel.columns, rel.types)
            if any(d in str(typ).upper() for d in _DISALLOWED_ORACLE_TYPES)
        ]
    finally:
        con.close()
    assert not bad, (
        f"{name}: oracle columns {bad} have driver-hash-unsafe DuckDB "
        "types — wrap the aggregate in CAST(... AS BIGINT/DOUBLE)")
