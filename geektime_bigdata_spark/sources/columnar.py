"""ORC columnar source/sink — the other Hadoop-native columnar format.

Reference-stack parity: the reference's jobs live on the Hadoop stack
(Main.java:19 wires TextInputFormat/TextOutputFormat; hw3-5 sit on
HBase/HDFS), where ORC is the Hive-default table layout — a user
migrating that stack expects to read and write ORC next to parquet.
Spark ships ORC support built-in (unlike avro, whose module jar is
absent from this container — see SURVEY §7.16 environment re-probe),
so this is the one remaining columnar interchange format coverable
with zero installs.

The roundtrip surface mirrors :func:`...sources.textio.
jsonl_roundtrip_stats` but carries the types JSON Lines cannot hold
losslessly — TIMESTAMP (micros) and DOUBLE — which is precisely ORC's
advantage over text interchange: at 100 TB the format choice is
write-path throughput + lossless binary types + predicate-pushdown
reads, and the sink scales with partition count exactly like the
parquet/JSONL writers (one file per partition, no driver funnel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geektime_bigdata_spark.functions import lift_collected
from pyspark.sql import types as T


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink: one file per partition via the built-in writer —
    columnar, compressed, splittable; scales with partition count."""
    df.write.mode("overwrite").orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """ORC source. ORC files embed their schema, so an explicit schema
    is projection/validation rather than the full-scan inference JSONL
    needs — but passing one still prunes columns at the scan."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def event_interchange_aggs() -> list:
    """The canonical per-event-type interchange-integrity aggregate list,
    shared by every events-table roundtrip surface (ORC here, CSV in
    :mod:`...sources.textio`) AND by the pytest that compares a
    roundtrip against the direct parquet read (ADVICE r13: the test
    previously duplicated these expressions verbatim, so the copies
    could silently drift — one definition now serves operator and
    test, while the DuckDB oracle stays the independent twin).

    Integrity signals per column class: counts + distinct users
    (row/key identity), min/max ``unix_micros`` plus an
    order-independent md5-derived checksum over the per-row epoch
    string (flips if the trip shifts ANY timestamp; 8-hex terms stay
    <= 4.3e9/row — summing raw epoch micros overflows int64 past
    ~5400 rows, caught by ANSI at sf0.1 in r13), the micro-grid value
    sum (flips if any double moves by >= 1e-6), and the event-id sum.
    All-integer output per the float contract."""
    return [
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.min(F.unix_micros("ts")).cast("long").alias("ts_min_micros"),
        F.max(F.unix_micros("ts")).cast("long").alias("ts_max_micros"),
        F.sum(
            F.expr(
                "CAST(conv(substr(md5(CAST(unix_micros(ts) AS"
                " STRING)), 1, 8), 16, 10) AS BIGINT)"
            )
        )
        .cast("long")
        .alias("ts_checksum"),
        F.sum(F.expr("CAST(floor(value * 1e6 + 0.5) AS BIGINT)"))
        .cast("long")
        .alias("value_micros_sum"),
        F.sum("event_id").cast("long").alias("event_id_sum"),
    ]


def orc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver surface proving the ORC source/sink end-to-end on the
    types text interchange cannot carry NATIVELY: write the events
    table (BIGINT ids, TIMESTAMP micros, DOUBLE value) through the
    native ORC sink, read it back with an explicit schema and an
    event-type filter, and apply the shared per-type integrity
    aggregate (:func:`event_interchange_aggs` — one definition serves
    this operator, the CSV twin, and the direct-vs-trip pytest).
    Bit-exactness of the double trip is pinned separately by the
    pytest golden, which the aggregate's micro-grid cannot see below
    1e-6. The DuckDB oracle computes the same aggregate straight off
    the parquet (``epoch_us`` — verified equal to ``unix_micros``
    under the UTC session). Scratch lifecycle mirrors
    :func:`...sources.textio.jsonl_roundtrip_stats`."""
    import shutil
    import tempfile

    from geektime_bigdata_spark.registry import table

    scratch = tempfile.mkdtemp(prefix="gbs_orc_")
    try:
        events = table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        write_orc(events, scratch)
        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
        back = read_orc(spark, scratch, schema).filter(
            F.col("event_type").isin("click", "purchase", "signup")
        )
        out = back.groupBy("event_type").agg(*event_interchange_aggs())
        return lift_collected(spark, out)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
