"""S7 DDL surface (SURVEY.md §2.1): CREATE TABLE ... USING parquet —
the Spark mapping of homework-3's namespace/table DDL
(HBaseClient.java:122-144) and homework-5's `create table student`
(README.md:82)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_create_insert_select_roundtrip(spark, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS gbs_ns")  # namespace analogue
    spark.sql(
        f"""
        CREATE TABLE gbs_ns.student (
            row_key STRING, name STRING, class STRING,
            understanding INT, programming INT
        ) USING parquet LOCATION '{tmp_path}/student'
        """
    )
    try:
        spark.sql(
            """
            INSERT INTO gbs_ns.student VALUES
              ('G20200579010831', 'tome', '1', 75, 82),
              ('G20200579010832', 'jerry', '1', 85, 67)
            """
        )
        got = (
            spark.table("gbs_ns.student")
            .filter(F.col("row_key").startswith("G202005790"))
            .orderBy(F.col("row_key").desc())
            .collect()
        )
        assert [r["name"] for r in got] == ["jerry", "tome"]
        cols = dict(spark.table("gbs_ns.student").dtypes)
        assert cols["understanding"] == "int"
    finally:
        spark.sql("DROP TABLE IF EXISTS gbs_ns.student")
        spark.sql("DROP DATABASE IF EXISTS gbs_ns")


def test_sql_scripting_block(spark):
    """Spark 4.1 SQL scripting: BEGIN/DECLARE/WHILE runs multi-statement
    procedural SQL in the engine; the block's final statement is the
    result. Control flow that previously needed driver-side Python
    (loops over thresholds, retry-until logic) can ship as one script."""
    rows = spark.sql(
        """
        BEGIN
          DECLARE total INT DEFAULT 0;
          DECLARE i INT DEFAULT 1;
          WHILE i <= 100 DO
            SET total = total + i;
            SET i = i + 1;
          END WHILE;
          SELECT total AS s;
        END
        """
    ).collect()
    assert rows[0]["s"] == 5050
