"""Text-file source/sink — homework-1's MapReduce IO surface (S1/S2).

The reference reads the classic phone-traffic log as tab-separated lines
addressed positionally (MyMapper.java:23-31: words[1]=phone,
words[7]=up, words[8]=down) and writes ``key\\tv1\\tv2\\tv3`` lines
(MyReduce.java:30). Here both directions are schema'd CSV — positional
fields become named, typed columns, and the byte counters are widened
int->long (32-bit traffic sums overflow at scale; intentional divergence
documented in SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geektime_bigdata_spark.functions import lift_collected
from pyspark.sql import types as T

# 13-field HTTP log; only the named fields are ever used downstream —
# column pruning drops the rest at scan time.
TRAFFIC_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.StringType()),
        T.StructField("phone", T.StringType()),
        T.StructField("mac", T.StringType()),
        T.StructField("ip", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("url_type", T.StringType()),
        T.StructField("n_pkts_up", T.LongType()),
        T.StructField("up_bytes", T.LongType()),
        T.StructField("down_bytes", T.LongType()),
        T.StructField("f9", T.StringType()),
        T.StructField("f10", T.StringType()),
        T.StructField("f11", T.StringType()),
        T.StructField("status", T.StringType()),
    ]
)


def read_traffic_log(spark: SparkSession, path: str) -> DataFrame:
    """S1: tab-separated text scan with explicit schema
    (reference: TextInputFormat at Main.java:30 + split at MyMapper.java:24)."""
    return (
        spark.read.option("sep", "\t")
        .schema(TRAFFIC_SCHEMA)
        .csv(path)
    )


def traffic_stats(df: DataFrame) -> DataFrame:
    """The homework-1 job proper: per-phone up/down/total sums
    (MyMapper.java:20-32 + MyReduce.java:20-31) as one chain; Catalyst
    plans partial+final HashAggregate — strictly better than the
    reference MR job, which registers no combiner (Main.java:22-28)."""
    return (
        df.select("phone", "up_bytes", "down_bytes")
        .groupBy("phone")
        .agg(
            F.sum("up_bytes").alias("sum_up"),
            F.sum("down_bytes").alias("sum_down"),
            F.sum(F.col("up_bytes") + F.col("down_bytes")).alias("sum_total"),
        )
    )


def write_tsv(df: DataFrame, path: str) -> None:
    """S2: tab-separated text sink (TextOutputFormat at Main.java:31,
    "%d\\t%d\\t%d" at MyReduce.java:30)."""
    df.write.mode("overwrite").option("sep", "\t").csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink — the interchange format training-data pipelines
    ship document corpora in (one JSON object per line, splittable,
    schema-on-read). Spark's json writer IS jsonl: one object per line,
    one file per partition — 100 TB writes scale with partition count."""
    df.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON-lines source. An explicit schema skips the inference scan —
    mandatory at scale (inference reads the whole input once); falls back
    to sampled inference for ad-hoc exploration."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


# CSV timestamp format carrying full microsecond precision: text
# interchange only round-trips TIMESTAMP when the fraction width is
# explicit — Spark's default ("yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]")
# silently truncates to millis on write, a real-world lossy default.
CSV_TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_csv(df: DataFrame, path: str) -> None:
    """CSV sink with lossless option discipline — every option below
    exists because its default silently mangles a value class
    (measured r14 on an adversarial corpus, pinned by
    tests/test_files.py::test_interchange_adversarial_strings):
    header row; microsecond ``timestampFormat`` (the default truncates
    to millis); ``ignoreLeading/TrailingWhiteSpace`` FALSE (the WRITE
    defaults are true — univocity trims ``' padded '`` to
    ``'padded'``); ``emptyValue`` of a quoted empty string so ``''``
    serializes as ``""``; ``nullValue`` of ``\\N`` (the Hive/MySQL
    in-file null marker) so NULL stays distinguishable from ``''``
    (the defaults write both as an empty field, which reads back as
    NULL). Known INHERENT boundary, pinned by
    test_csv_null_sentinel_is_reserved: CSV must reserve SOME byte
    representation for NULL, and univocity matches it post-unescape —
    a field whose DATA is the literal two characters backslash-N
    reads back as NULL (quoting does not protect it); payloads that
    may legitimately contain the marker belong in a binary format.
    Doubles are written via the JVM's shortest-round-trip repr, so the
    text form parses back to the identical bits. One file per
    partition — 100 TB writes scale with partition count exactly like
    the parquet/ORC/JSONL sinks."""
    df.write.mode("overwrite").option("header", True).option(
        "timestampFormat", CSV_TS_FORMAT
    ).option("ignoreLeadingWhiteSpace", False).option(
        "ignoreTrailingWhiteSpace", False
    ).option("emptyValue", '""').option(
        "nullValue", "\\N"
    ).csv(path)


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """CSV source matching the sink's option discipline. An explicit
    schema is mandatory at scale (inference is a second full scan);
    the timestampFormat must match the sink's or sub-millisecond
    precision silently parses away; ``multiLine`` so quoted embedded
    newlines re-parse as one record (the default splits mid-field).
    Scale note on multiLine: it disables INTRA-file splitting — each
    file parses whole — but the sink writes one file per partition,
    so a corpus written by :func:`write_csv` still reads with
    file-granularity parallelism; only a single giant externally-
    produced CSV would serialize."""
    reader = spark.read.option("header", True).option(
        "timestampFormat", CSV_TS_FORMAT
    ).option("multiLine", True).option("nullValue", "\\N")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def csv_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver surface proving the CSV source/sink round-trips the
    lossy-by-default types when the format options are explicit: write
    the events table (TIMESTAMP micros, DOUBLE value) through the
    native CSV sink with a microsecond ``timestampFormat``, read it
    back with an explicit schema and an event-type filter, and apply
    the shared per-type integrity aggregate
    (:func:`...sources.columnar.event_interchange_aggs` — the same
    definition the ORC surface and the direct-vs-trip pytest use, so
    the three cannot drift apart). The DuckDB oracle is byte-identical
    to the ORC one (``_ORACLE_TWINS``): both compute the aggregate
    straight off the parquet, which is the point — two interchange
    formats, one truth. Scratch lifecycle mirrors
    :func:`jsonl_roundtrip_stats`."""
    import shutil
    import tempfile

    from geektime_bigdata_spark.registry import table
    from geektime_bigdata_spark.sources.columnar import (
        event_interchange_aggs,
    )

    scratch = tempfile.mkdtemp(prefix="gbs_csv_")
    try:
        events = table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        write_csv(events, scratch)
        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
        back = read_csv(spark, scratch, schema).filter(
            F.col("event_type").isin("click", "purchase", "signup")
        )
        out = back.groupBy("event_type").agg(*event_interchange_aggs())
        return lift_collected(spark, out)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def write_xml(df: DataFrame, path: str, row_tag: str = "row") -> None:
    """XML sink (built into Spark since 4.0 — the spark-xml package
    merged upstream, so this needs zero installs unlike avro). Same
    lossless option discipline as CSV: explicit microsecond
    ``timestampFormat`` (see :data:`CSV_TS_FORMAT`); one file per
    partition, scales with partition count."""
    df.write.mode("overwrite").format("xml").option(
        "rowTag", row_tag
    ).option("timestampFormat", CSV_TS_FORMAT).save(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    row_tag: str = "row",
) -> DataFrame:
    """XML source. An explicit schema skips the inference scan; the
    timestampFormat must match the sink's or sub-millisecond precision
    silently parses away (same trap as CSV);
    ``ignoreSurroundingSpaces`` FALSE or leading/trailing whitespace in
    text content is trimmed (the default is true). With that one
    option the trip is exact even for the classically-dangerous
    classes — measured r14 on an adversarial corpus (embedded
    ``<>&``, ``]]>``, quotes, newlines, AND carriage returns: the
    writer character-reference-escapes CR, sidestepping the XML-spec
    line-ending normalization that would otherwise eat it; NULL and
    ``''`` are structurally distinct elements) — pinned by
    tests/test_files.py::test_interchange_adversarial_strings."""
    reader = spark.read.format("xml").option("rowTag", row_tag).option(
        "timestampFormat", CSV_TS_FORMAT
    ).option("ignoreSurroundingSpaces", False)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def xml_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver surface proving the built-in XML source/sink end-to-end
    (the third text interchange format next to JSONL and CSV; legacy
    enterprise feeds still ship XML): write the events table through
    the native XML sink with a microsecond ``timestampFormat``, read
    it back with an explicit schema and an event-type filter, and
    apply the shared per-type integrity aggregate
    (:func:`...sources.columnar.event_interchange_aggs`). Oracle is
    the same straight-off-parquet SQL as ORC/CSV (``_ORACLE_TWINS``)
    — three interchange formats, one truth. Scratch lifecycle mirrors
    :func:`jsonl_roundtrip_stats`."""
    import shutil
    import tempfile

    from geektime_bigdata_spark.registry import table
    from geektime_bigdata_spark.sources.columnar import (
        event_interchange_aggs,
    )

    scratch = tempfile.mkdtemp(prefix="gbs_xml_")
    try:
        events = table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        write_xml(events, scratch, row_tag="event")
        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
        back = read_xml(spark, scratch, schema, row_tag="event").filter(
            F.col("event_type").isin("click", "purchase", "signup")
        )
        out = back.groupBy("event_type").agg(*event_interchange_aggs())
        return lift_collected(spark, out)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def jsonl_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver surface proving the JSONL source/sink end-to-end — the
    interchange format public LLM corpora actually ship in: write the
    documents table as JSON Lines through the native json sink, read
    it back with an EXPLICIT schema (inference is a second full scan —
    a scale anti-pattern) and a language filter, and aggregate
    per-source counts, char mass, and an order-independent md5-derived
    text checksum. Every roundtripped column is integer/string, so the
    trip is lossless by construction (no float-in-JSON hazard), and
    the checksum flips if ANY text byte is mangled by JSON
    escaping/decoding. The oracle computes the same aggregate straight
    off the parquet. Scratch lifecycle mirrors
    :func:`...sources.pyds.tsv_roundtrip_stats` (materialize, recreate
    locally, remove the directory)."""
    import shutil
    import tempfile

    from geektime_bigdata_spark.registry import table

    scratch = tempfile.mkdtemp(prefix="gbs_jsonl_")
    try:
        docs = table(spark, sf_dir, "documents").select(
            "doc_id", "text", "lang", "source"
        )
        write_jsonl(docs, scratch)
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
                T.StructField("lang", T.StringType()),
                T.StructField("source", T.StringType()),
            ]
        )
        back = read_jsonl(spark, scratch, schema).filter(
            F.col("lang").isin("en", "de")
        )
        out = back.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("sum_chars"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.sum(
                F.expr(
                    "CAST(conv(substr(md5(text), 1, 8), 16, 10) AS BIGINT)"
                )
            )
            .cast("long")
            .alias("text_checksum"),
        )
        return lift_collected(spark, out)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
