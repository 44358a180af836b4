"""Local mirror of the driver's DuckDB differential check.

Runs a Spark query and its oracle SQL side by side, then compares
row count, column names, and an order-insensitive value comparison
(sorted rows of stringified values, floats rounded).
"""

from __future__ import annotations

import decimal
import math

import duckdb

from geektime_bigdata_spark.registry import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # FULL precision (shortest round-trip repr = bit equality). The
        # driver's value hash is at least this strict; the previous
        # 12-sig-digit canon masked sub-ulp engine drift locally that
        # then hash-failed on the driver (round 2: sessionize). Every
        # hashed float must be IDENTICAL IEEE ops on both engines
        # (grid_round / micro-unit sums) — this canon enforces it.
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, decimal.Decimal):
        # NEVER canonicalize Decimal to its int/float string.  DuckDB
        # HUGEINT / DECIMAL reach the driver's fetch path as
        # decimal128 and hash differently from Spark's LongType even
        # when numerically identical (round 3: 8 red rows).  Keeping
        # the Decimal marker makes the local harness fail the same
        # way the driver does; the type-allowlist test in
        # test_oracle_types.py is the structural fix.
        return f"Decimal({v})"
    return str(v)


def _rowset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def assert_matches_oracle(spark_df, con, sql: str, name: str = "?"):
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    # Fetch through Arrow, not DBAPI fetchall(): fetchall() returns
    # plain Python int for both BIGINT and HUGEINT, masking the
    # widening that hash-fails on the driver.  Arrow preserves the
    # distinction (HUGEINT -> decimal128 -> decimal.Decimal).
    tbl = con.execute(sql).arrow()
    oracle_cols = list(tbl.column_names)
    pyrows = tbl.to_pylist()
    oracle_rows = [tuple(d[c] for c in oracle_cols) for d in pyrows]

    assert sorted(spark_cols) == sorted(oracle_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} "
        f"oracle={sorted(oracle_cols)}"
    )
    assert len(spark_rows) == len(oracle_rows), (
        f"{name}: row count spark={len(spark_rows)} oracle={len(oracle_rows)}"
    )
    s, o = _rowset(spark_rows, spark_cols), _rowset(oracle_rows, oracle_cols)
    mismatches = [i for i, (a, b) in enumerate(zip(s, o)) if a != b]
    assert not mismatches, (
        f"{name}: value mismatch at sorted-row {mismatches[0]}: "
        f"spark={s[mismatches[0]]} oracle={o[mismatches[0]]}"
    )
