"""Table registry over the driver's parquet testdata.

Loads the ten synthetic tables (TESTDATA.md) as DataFrames and registers
them as temp views so both the DataFrame API and ``spark.sql`` address the
same catalog — mirroring the reference's Hive-catalog resolution path
(homework-5/README.md:126-137, ``UnresolvedRelation`` -> table relation)
without requiring a Hive metastore.

At cluster scale these would be external catalog tables (partitioned,
possibly bucketed on join keys); the parquet scan path — with column
pruning and predicate pushdown — is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Testdata timestamp columns have shipped in two physical forms across
# driver rounds: parquet TIMESTAMP(NANOS) (round 1 — with
# ``spark.sql.legacy.parquet.nanosAsLong`` they arrive as LongType
# nanoseconds, truncated here to microseconds exactly like DuckDB), and
# plain TIMESTAMP(MICROS) without a timezone (round 2+ — Spark infers
# TIMESTAMP_NTZ). Either way we normalize to TimestampType (LTZ): the
# session timezone is UTC, so the NTZ->LTZ cast is identity on the
# instant, watermarks/stream-stream joins (which require LTZ event time)
# work, and the engine sees the same type that produced every round-1
# green driver row.
_NANOS_TS_COLS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def _normalize_timestamps(name: str, df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    for col in _NANOS_TS_COLS.get(name, ()):
        if col not in df.columns:
            continue
        dtype = df.schema[col].dataType
        if isinstance(dtype, LongType):
            # integer division: double math would lose sub-microsecond bits
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
        elif isinstance(dtype, TimestampNTZType):
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, register_views: bool = True
) -> dict[str, DataFrame]:
    """Read every testdata table under ``sf_dir`` and (optionally) register
    each as a temp view named after the table."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a single table without touching the view catalog."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name in _NANOS_TS_COLS:
        # runtime SQL conf; set defensively for driver-provided sessions
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return _normalize_timestamps(name, df)


def parallel_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a table and spread it across all cores before CPU-heavy
    per-row work (explode/hash pipelines).

    The testdata tables are single parquet files, so the scan arrives as
    ONE partition and any expensive projection above it runs on one core.
    A round-robin repartition of the (small) base rows costs one tiny
    shuffle and parallelizes everything downstream — measured 2.9x on the
    minhash shingle pipeline at sf0.1. On a real multi-file/partitioned
    table at cluster scale the scan is already parallel and this becomes a
    cheap rebalance; at 100 TB one would instead rely on the natural file
    splits and drop this hint."""
    df = table(spark, sf_dir, name)
    return df.repartition(spark.sparkContext.defaultParallelism)


def adaptive_spread(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    bytes_per_task: int = 128 << 10,
) -> DataFrame:
    """Size-adaptive variant of :func:`parallel_table` (r18, guide
    §2.5 / VERDICT r17 item 4): spread width = input bytes /
    ``bytes_per_task``, clamped to [1, defaultParallelism] — so small
    inputs get a few fat tasks instead of defaultParallelism near-empty
    ones, and the width GROWS with the data until the core-count cap.

    Motivation (measured): the BPE loop's fixed 32-way spread cost
    more in per-task overhead than it bought at sf0.1 — the r17
    8-core bench beat 32 cores on bpe_encode_corpus (ratio 0.68), and
    a width A/B on the encode loop read 29 CPU-s at width 32 vs ~5 at
    width 4 with the best wall (every Arrow/checkpoint pass pays a
    per-task Python-worker/scheduling floor times the width). 128 KiB
    of compressed parquet per task keeps tasks comfortably larger
    than that floor; at cluster scale the clamp pins the cap and the
    scan's own file splits carry the parallelism anyway."""
    df = table(spark, sf_dir, name)
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            size = sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
            )
        else:
            size = os.path.getsize(path)
    except OSError:
        size = None
    par = spark.sparkContext.defaultParallelism
    width = (
        par if size is None else max(1, min(par, size // bytes_per_task))
    )
    return df.repartition(int(width))
