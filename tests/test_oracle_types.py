"""Registry-wide guard: no oracle may emit a DuckDB type the driver's
fetch path renders differently from Spark.

Three rounds of "matches bit-exact locally, hash-fails on the driver"
(r1/r2 float ties, r3 integer widening) were all the same blind spot:
DuckDB widens ``sum(BIGINT)`` to HUGEINT (int128), and HUGEINT does not
round-trip through pandas/Arrow the way Spark's LongType does (pandas
-> float64 ``3.0`` vs ``3``; Arrow -> decimal128(38,0)).  The DBAPI
``fetchall()`` path returns plain Python ``int`` for both and so cannot
see the difference.

This test binds every registered oracle in DuckDB (binding only -- no
execution) and fails if any output column's type is outside a strict
allowlist of types with a stable, Spark-identical rendering.  Adding a
``sum(BIGINT)`` oracle without a final ``CAST(... AS BIGINT)`` now
fails in CI instead of on the driver.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from geektime_bigdata_spark.registry import TABLES

SF_DIR = "/root/testdata/sf0.001"

# Types whose Arrow/pandas rendering provably matches the corresponding
# Spark type.  Anything else (HUGEINT, UHUGEINT, DECIMAL(x,y), UUID,
# INTERVAL, nested LIST/STRUCT...) must be CAST in the oracle SQL.
ALLOWED = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "TIMESTAMP",
    "DATE",
    "BOOLEAN",
}


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield c
    c.close()


def test_every_oracle_output_type_is_allowlisted(con):
    oracles = entry.oracle_sql()
    offenders: dict[str, list[tuple[str, str]]] = {}
    for name, sql in sorted(oracles.items()):
        rel = con.sql(sql)  # binds + plans; does not execute
        bad = [
            (col, str(typ))
            for col, typ in zip(rel.columns, rel.types)
            if str(typ) not in ALLOWED
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting driver-unsafe DuckDB types (wrap the aggregate "
        f"in CAST(... AS BIGINT) / AS DOUBLE): {offenders}"
    )


def test_queries_and_oracles_cover_each_other(con):
    """Every queries() key has an oracle or is documented as rows-only."""
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    # oracle for a query that doesn't exist = dead SQL
    assert not (o - q), f"orphan oracles: {sorted(o - q)}"


def test_sweep_priority_is_consistent():
    """Every _SWEEP_PRIORITY name must be a registered query, with no
    duplicates — a typo here would silently drop a query from the
    driver's 50-slot sweep prefix."""
    prio = entry._SWEEP_PRIORITY
    q = entry.queries()
    assert len(prio) == len(set(prio)), "duplicate priority entries"
    missing = [n for n in prio if n not in q]
    assert not missing, f"priority names not in queries(): {missing}"
    # and the reorder actually applied: the prefix of queries() is
    # exactly the priority list, in order
    assert list(q)[: len(prio)] == prio


def test_duckdb_hex_cast_canary(con):
    """Pin the implicit '0x…' VARCHAR→BIGINT hex cast 20 oracles ride
    (the house md5-checksum idiom, e.g. oracles/orc_roundtrip_stats.sql).
    It is engine-version-sensitive behavior (ADVICE r13): the container
    ships DuckDB 1.0.0 where it parses as hex; if an engine upgrade ever
    changes string→int parsing, this canary names the cause instead of
    letting 20 oracles hash-mismatch mysteriously. Checked against
    Python's int(h, 16) on fixed vectors spanning leading zeros, the
    full 8-hex width, and case."""
    for h in ("deadbeef", "00000001", "ffffffff", "0abc123f", "7F"):
        got = con.sql(f"SELECT ('0x' || '{h}')::BIGINT").fetchone()[0]
        assert got == int(h, 16), (
            f"DuckDB implicit hex cast changed: '0x{h}' -> {got}, "
            f"expected {int(h, 16)} — every md5-checksum oracle "
            "depends on this; see oracles/orc_roundtrip_stats.sql"
        )
