"""Scale techniques: bucketed co-located joins and skew salting.

These are the two knobs a 100 TB deployment reaches for when the default
hash-shuffle plans stop being enough (SNIPPETS-style public patterns):

- **Bucketing**: persist both fact tables bucketed+sorted on the join key;
  Spark's planner then satisfies the join's distribution requirement from
  the bucket spec and elides BOTH exchanges (verified by plan test — at
  100 TB the orders⋈lineitem shuffle IS the query cost, and bucketing
  amortizes it across every downstream join on that key).
- **Salting**: a hot grouping key overwhelms one reducer; prefix the key
  with a salt in [0, n), partially aggregate (salted key), then strip the
  salt and finish — two small shuffles instead of one skewed one. AQE's
  skew-join splitting handles the *join* case automatically; aggregation
  salting is still a manual pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geektime_bigdata_spark.functions import lift_collected, exact_sum, grid_round
from geektime_bigdata_spark.registry import table


def write_bucketed(
    spark: SparkSession,
    sf_dir: str,
    db: str = "gbs_bucketed",
    n_buckets: int = 8,
) -> None:
    """Persist orders+lineitem bucketed AND sorted by order key into the
    session catalog (saveAsTable is required — bucket metadata lives in the
    catalog, not in the files)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    for name, key in (("orders", "o_orderkey"), ("lineitem", "l_orderkey")):
        (
            table(spark, sf_dir, name)
            .write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(f"{db}.{name}")
        )


def bucketed_order_lineitem_join(
    spark: SparkSession, db: str = "gbs_bucketed"
) -> DataFrame:
    """Fact-fact join over the bucketed tables: per-order line counts and
    revenue. With matching bucket specs on both sides the physical plan
    has NO Exchange — the sort-merge join reads co-located buckets."""
    o = spark.table(f"{db}.orders")
    li = spark.table(f"{db}.lineitem")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_totalprice")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            grid_round(
                exact_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                4,
            ).alias("revenue"),
        )
    )


def salted_top_words(
    spark: SparkSession, sf_dir: str, n_salts: int = 8
) -> DataFrame:
    """Skew-resistant word count: salt -> partial aggregate -> unsalt ->
    final aggregate. Equivalent to plain word_counts (test-enforced), but
    the first shuffle spreads each hot word over ``n_salts`` reducers.

    The salt is derived from doc_id (deterministic), not rand(), so the
    operator stays reproducible and oracle-checkable."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    salted = toks.withColumn("salt", (F.col("doc_id") % n_salts).cast("int"))
    partial = salted.groupBy("word", "salt").agg(
        F.count(F.lit(1)).alias("cnt_partial")
    )
    return partial.groupBy("word").agg(
        F.sum("cnt_partial").alias("cnt")
    )


def write_date_partitioned(
    spark: SparkSession, sf_dir: str, out_path: str
) -> None:
    """Persist events as date-partitioned parquet (`dt=YYYY-MM-DD/` dirs) —
    the standard 100 TB layout: a time-range predicate then prunes whole
    directories at PLANNING time instead of scanning and filtering. One
    output file per (partition, task) kept small here; at scale the
    writer would also repartition by dt to bound files per directory."""
    e = table(spark, sf_dir, "events")
    (
        e.withColumn("dt", F.date_format("ts", "yyyy-MM-dd"))
        .repartition("dt")
        .write.mode("overwrite")
        .partitionBy("dt")
        .parquet(out_path)
    )


def pruned_daily_rollup(spark: SparkSession, path: str, day: str) -> DataFrame:
    """Aggregate ONE day from the partitioned layout: the `dt =` predicate
    must appear as a PartitionFilters entry (directory pruning), not a
    post-scan filter — asserted by plan test."""
    e = spark.read.parquet(path)
    return (
        e.filter(F.col("dt") == day)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            grid_round(exact_sum("value"), 6).alias("total_value"),
        )
    )


COMPACT_FRAGMENT_FILES = 64
COMPACT_TARGET_ROWS = 4096


def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse small-file compaction — the OPTIMIZE maintenance pass a
    100 TB streaming sink cannot live without. Per-trigger/per-task
    writers fragment a table into thousands of tiny files; listing cost,
    per-file open overhead, and footer reads then dominate every scan.
    The fix is a periodic size-targeted rewrite, demonstrated here
    end-to-end and proven lossless:

    1. Fragment: write events through a ``repartition(64)`` round-robin
       pass (one file per partition — the worst-case many-small-files
       layout a short-trigger streaming sink produces).
    2. Compact: rewrite to ``ceil(n / COMPACT_TARGET_ROWS)`` files via a
       second round-robin repartition. Rows-per-file is the deterministic
       stand-in for a byte-size target; at scale the divisor comes from
       table statistics (bytes / target file size) and
       ``spark.sql.files.maxRecordsPerFile`` is the belt-and-braces cap.
    3. Verify: both file counts are measured from the data itself
       (``count(DISTINCT input_file_name())``), and losslessness is an
       order-independent md5 checksum over the integer/string columns —
       parquet roundtrips the ts/double columns bit-exactly, while the
       checksum stays off them so no float/timestamp formatting ever
       crosses the engine contract edge.

    Round-robin repartition sends each input partition's rows to
    consecutive output slots, so any scan partition holding >= k rows
    covers all k outputs by itself and the file count is exactly k on
    both legs (scan partitions here hold thousands of rows against
    file-count targets of <= 64; the slot-coverage invariant is pinned
    by a hypothesis property test) — which is what makes the oracle
    pure SQL over row counts. The
    one driver scalar (``count()``) mirrors the table-stats read a real
    compactor plans from. At 100 TB the cheaper maintenance pass is
    ``coalesce(k)`` — it merges read-partitions WITHOUT an exchange —
    but its output count is not deterministic here (the scan packs tiny
    files into shared input splits via ``files.maxPartitionBytes``, so
    the pre-coalesce partition count floats); ``repartition(k)`` pays
    one shuffle to make the contract exact, and a production compactor
    would take the coalesce path with file-size rather than file-count
    guarantees. Reference tie-in: the closest reference surface
    is homework-4's DistCp-style file maintenance (sources/files.py S8/U1
    family)."""
    import math
    import os
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="gbs_compact_")
    frag = os.path.join(scratch, "fragmented")
    tidy = os.path.join(scratch, "compacted")
    try:
        e = table(spark, sf_dir, "events")
        e.repartition(COMPACT_FRAGMENT_FILES).write.parquet(frag)
        back = spark.read.parquet(frag)
        # r17 (guide §1.2 step 1): one stats pass instead of two — the
        # row count (the compactor's table-stats read) and the
        # before-file count come from the same scan of the fragmented
        # table; previously count() and the input_file_name aggregate
        # each scanned all 64 files.
        n, files_before = (
            back.select(F.input_file_name().alias("_f"))
            .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("_f").alias("f"))
            .collect()[0]
        )
        k = max(1, math.ceil(n / COMPACT_TARGET_ROWS))
        back.repartition(k).write.parquet(tidy)
        comp = spark.read.parquet(tidy)
        out = comp.select(
            F.input_file_name().alias("_f"),
            F.expr(
                "CAST(conv(substr(md5(concat_ws('|', "
                "CAST(event_id AS STRING), CAST(user_id AS STRING), "
                "event_type)), 1, 8), 16, 10) AS BIGINT)"
            ).alias("_h"),
        ).agg(
            F.lit(int(files_before)).cast("long").alias("files_before"),
            F.countDistinct("_f").cast("long").alias("files_after"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("_h").cast("long").alias("row_checksum"),
        )
        return lift_collected(spark, out)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


ZORDER_GRID = 16  # per-dimension quantization levels (4 bits)
ZORDER_BUCKET_SHIFT = 3  # 8 consecutive codes per bucket -> 32 buckets
# Quantized 2-D query box: ux in [3,6], vx in [7,10] — deliberately NOT
# aligned to a z-bucket boundary, so the measured advantage is the
# realistic partial-alignment case, not the curve's best case.
ZORDER_BOX = (3, 6, 7, 10)


def zorder_layout_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering vs lexicographic sort order,
    scored by zone-map data skipping — the `OPTIMIZE ... ZORDER BY`
    half of the lakehouse maintenance story whose compaction half is
    :func:`compact_small_files` (public precedent: Delta Lake's
    OPTIMIZE ZORDER, Hudi clustering, Snowflake clustering depth;
    Morton 1966 / Orenstein & Merrett 1984 for the curve, Moerkotte's
    Small Materialized Aggregates 1998 for min/max zone maps).

    A single-column sort lets file-level min/max stats prune scans on
    that column only; interleaving the bits of TWO columns (the Morton
    code) keeps both selective, so a 2-D box predicate skips most
    files under EITHER filter. This op measures exactly that, with
    integer-only math so the layout quality is oracle-checkable:

    1. Quantize `user_id` x `event_id` to a 16x16 grid (min/max
       normalize, integer `div` — at 100 TB the bounds come from table
       statistics or approxQuantile; exact min/max keeps the oracle
       closed-form here).
    2. Assign each row to one of 32 "files" under two layouts: the
       z-curve (`morton(ux, vx) >> 3` — the order
       ``repartitionByRange`` would write after `ORDER BY zvalue`) and
       the lexicographic order (`(ux * 16 + vx) >> 3` — what a plain
       `ORDER BY user_id, event_id` writer produces).
    3. Score a fixed quantized box predicate against per-file zone
       maps (min/max of each dimension — the same stats parquet
       footers carry): a file is scanned iff its ranges overlap the
       box. Emit per layout: files with data, files scanned, rows in
       scanned files, and rows actually matching (layout-invariant —
       the differential oracle proves all four cross-engine).

    On the shipped uniform fixtures the box (16 of 256 cells, z-bucket
    UNALIGNED on purpose) needs 6/32 z-order files vs 8/32
    lexicographic files, and scans 48 vs 64 cells' worth of rows; the
    lexicographic layout degrades to scanning every file as the first
    dimension's selectivity drops, while z-order degrades ~sqrt of
    that — the whole point of multi-dimensional clustering. Cost
    shape: one tiny bounds aggregate (broadcast back), one projection,
    one explode to (layout, file) pairs, one 64-group aggregate — a
    single full shuffle whose key space is the file count, never the
    data. All-integer contract end to end."""
    u_lo, u_hi, v_lo, v_hi = ZORDER_BOX
    e = table(spark, sf_dir, "events").select("user_id", "event_id")
    bounds = e.agg(
        F.min("user_id").alias("u_min"),
        F.max("user_id").alias("u_max"),
        F.min("event_id").alias("e_min"),
        F.max("event_id").alias("e_max"),
    )
    quantized = e.crossJoin(F.broadcast(bounds)).select(
        F.expr(
            f"((user_id - u_min) * {ZORDER_GRID}) div (u_max - u_min + 1)"
        ).alias("ux"),
        F.expr(
            f"((event_id - e_min) * {ZORDER_GRID}) div (e_max - e_min + 1)"
        ).alias("vx"),
    )
    morton = " | ".join(
        f"shiftleft(shiftright(ux, {b}) & 1, {2 * b + 1}) | "
        f"shiftleft(shiftright(vx, {b}) & 1, {2 * b})"
        for b in range(3, -1, -1)
    )
    tagged = quantized.select(
        "ux",
        "vx",
        F.explode(
            F.array(
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.expr(
                        f"shiftright({morton}, {ZORDER_BUCKET_SHIFT})"
                    ).cast("long").alias("file_id"),
                ),
                F.struct(
                    F.lit("lexicographic").alias("layout"),
                    F.expr(
                        f"shiftright(ux * {ZORDER_GRID} + vx,"
                        f" {ZORDER_BUCKET_SHIFT})"
                    ).cast("long").alias("file_id"),
                ),
            )
        ).alias("t"),
    ).select("t.layout", "t.file_id", "ux", "vx")
    zone_maps = tagged.groupBy("layout", "file_id").agg(
        F.min("ux").alias("min_ux"),
        F.max("ux").alias("max_ux"),
        F.min("vx").alias("min_vx"),
        F.max("vx").alias("max_vx"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (
                F.col("ux").between(u_lo, u_hi)
                & F.col("vx").between(v_lo, v_hi)
            ).cast("long")
        ).alias("n_match"),
    )
    scanned = (
        (F.col("min_ux") <= u_hi)
        & (F.col("max_ux") >= u_lo)
        & (F.col("min_vx") <= v_hi)
        & (F.col("max_vx") >= v_lo)
    )
    return zone_maps.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(scanned.cast("long")).alias("files_scanned"),
        F.sum(F.when(scanned, F.col("n_rows")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_scanned"),
        F.sum("n_match").cast("long").alias("rows_matched"),
    )


def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key diagnosis for join/aggregate planning: per decimal decade
    of key frequency (1-9, 10-99, ... — ``len(str(cnt)) - 1``, exact
    integer arithmetic rather than a ``floor(log10)`` float knife-edge),
    the number of keys, the hottest key's row count, and the hottest key
    itself (lowest id among ties). The report a pipeline consults before
    choosing broadcast vs shuffle vs salting (operators/scale.py's
    salted path, or AQE skew splitting) for a key.

    Two aggregates plus one tiny join: the per-key count is the only
    full-data shuffle; everything downstream is O(|distinct keys|) and
    the decade rollup is O(10). Entirely integer arithmetic — no float
    ever crosses the contract edge."""
    e = table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    d = counts.select(
        "user_id",
        "cnt",
        (F.length(F.col("cnt").cast("string")) - 1)
        .cast("long")
        .alias("decade"),
    )
    m = d.groupBy("decade").agg(
        F.count(F.lit(1)).alias("n_keys"), F.max("cnt").alias("max_cnt")
    )
    hottest = (
        d.join(
            F.broadcast(m.select("decade", "max_cnt")),
            ["decade"],
        )
        .filter(F.col("cnt") == F.col("max_cnt"))
        .groupBy("decade")
        .agg(F.min("user_id").alias("hottest_key"))
    )
    return m.join(hottest, ["decade"])
