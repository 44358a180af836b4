"""Core ETL/pipeline operators: SCD2 history construction, data-quality
auditing, and incremental-ingest dedup (the jobs an ingestion pipeline runs
around the analytical queries; BASELINE.json categorizes this engine as
ETL/pipeline).

All three are single-pass, shuffle-frugal DataFrame plans with exact DuckDB
oracles:

- SCD2: one window shuffle on the business key turns an append-only change
  log into validity intervals (`valid_from`/`valid_to`/`is_current`) — the
  lakehouse "type-2 dimension from CDC feed" pattern.
- Audit: one aggregate pass emits the row/key/null/range invariants a
  pipeline gate checks before publishing a partition.
- Incremental dedup: classify an incoming batch against the existing
  corpus (left-anti semantics) AND against itself (first-wins window) in
  one plan — the admission step of a continuously-ingesting training-data
  store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geektime_bigdata_spark.functions import grid_round
from geektime_bigdata_spark.registry import table

INCOMING_SOURCE = "src0"
PREFIX_TOKENS = 5


def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history from the events change log: per user, each event
    opens a validity interval closed by the next event (``lead``), the
    last one open-ended (`is_current`). One hash shuffle on user_id +
    per-partition sort — linear, no self-join (the naive formulation
    joins the log to itself on "next ts")."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_id",
        F.col("value"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        F.isnull(nxt).cast("int").alias("is_current"),
    )


def orders_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate over ``orders``: row count, key uniqueness,
    null/negative checks, and the date range — one aggregate pass, one
    row out. At scale this runs per ingest partition and the pipeline
    compares against expectations before publishing."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").cast("long").alias("n_distinct_keys"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("long")
        .alias("n_dup_keys"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias(
            "n_null_price"
        ),
        F.sum((F.col("o_totalprice") < 0).cast("long")).alias(
            "n_negative_price"
        ),
        F.min("o_orderdate").alias("min_orderdate"),
        F.max("o_orderdate").alias("max_orderdate"),
    )


def incremental_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admission control for an incoming batch (source = INCOMING_SOURCE)
    against the already-ingested corpus: every incoming doc is classified
    ``new`` / ``dup_existing`` (prefix-fingerprint already in the corpus)
    / ``dup_in_batch`` (a lower doc_id in the same batch shares the
    fingerprint — first-wins). The fingerprint is the md5 of the first
    PREFIX_TOKENS tokens (a cheap blocking key; a production pipeline
    would follow with the MinHash verify stage in :mod:`dedup`).

    Existing fingerprints join left-semi-style via a distinct projection;
    the in-batch rule is a min-window — one shuffle each, both on the
    32-byte fingerprint key."""
    docs = table(spark, sf_dir, "documents")
    fp = F.md5(
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, PREFIX_TOKENS))
    )
    tagged = docs.select("doc_id", "source", fp.alias("fp"))
    incoming = tagged.filter(F.col("source") == INCOMING_SOURCE)
    existing_fps = (
        tagged.filter(F.col("source") != INCOMING_SOURCE)
        .select("fp")
        .distinct()
        .withColumn("in_existing", F.lit(1))
    )
    w = Window.partitionBy("fp")
    return (
        incoming.join(existing_fps, "fp", "left")
        .withColumn("first_in_batch", F.min("doc_id").over(w))
        .select(
            "doc_id",
            "fp",
            F.when(F.col("in_existing") == 1, "dup_existing")
            .when(F.col("doc_id") != F.col("first_in_batch"), "dup_in_batch")
            .otherwise("new")
            .alias("status"),
        )
    )


def hourly_rollup_partials(events: DataFrame) -> DataFrame:
    """Mergeable partial state of the hourly rollup: (hour, event_type) ->
    (count, sum). Counts and sums re-aggregate losslessly, so refreshes
    never re-read history (avg is derived at query time as sum/count —
    never stored, since averages do not merge)."""
    return events.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        # partials carry LONG micro-units (1e-6), not DOUBLE: integer
        # addition is exact and associative, so partial states merge in
        # any order/grouping and the refreshed rollup is bit-identical to
        # the single-pass one (exact_sum's quantization, kept raw here so
        # the stored partial stays losslessly mergeable).
        F.sum(
            F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
        ).alias("sum_value"),
    )


def incremental_rollup_refresh(
    existing_partials: DataFrame, new_events: DataFrame
) -> DataFrame:
    """Hypertable-style continuous-aggregate refresh: fold a new raw batch
    into the materialized hourly partials by aggregating ONLY the batch
    and merging on the bucket key — cost is O(batch + touched buckets),
    independent of history size. The merge is a unionByName + re-aggregate
    (partial+final HashAggregate over two partial states); at 100 TB the
    partials table is partitioned by hour-date so the merge rewrites only
    touched partitions."""
    batch = hourly_rollup_partials(new_events)
    return (
        existing_partials.unionByName(batch)
        .groupBy("hour", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sum_value").alias("sum_value"),
        )
    )


def continuous_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract wrapper proving the refresh path end-to-end: split
    the event log deterministically (even/odd event_id), materialize
    partials from one half, fold in the other — the result must equal the
    single-pass rollup, which is exactly what the DuckDB oracle
    computes."""
    e = table(spark, sf_dir, "events")
    first = e.filter(F.col("event_id") % 2 == 0)
    second = e.filter(F.col("event_id") % 2 == 1)
    refreshed = incremental_rollup_refresh(
        hourly_rollup_partials(first), second
    )
    return refreshed.select(
        "hour",
        "event_type",
        "n",
        grid_round(
            (F.col("sum_value") / F.lit(1e6)).cast("double"), 6
        ).alias("sum_value"),
    )


def gap_filled_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: the hourly event rollup joined onto a
    COMPLETE hour spine (min..max observed hour), missing hours emitted
    with n_events = 0 and the micro-unit value sum FORWARD-FILLED from
    the last observed hour (``last(..., ignorenulls)`` over the hour
    order) — the densification step every downstream window/anomaly
    consumer assumes has already happened (a missing hour would
    otherwise silently shrink a trailing window instead of reading as
    zero traffic).

    Scale shape: the rollup is the usual one-shuffle aggregate; the
    spine is ``sequence(min, max, 1 hour)`` exploded from a one-row
    aggregate — O(hours) rows regardless of corpus size — so the
    unpartitioned forward-fill window is driver-scale like the anomaly
    z-scores, not a skew risk. All-integer contract surface."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
        ).alias("value_micros"),
    )
    spine = (
        e.agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"),
            F.date_trunc("hour", F.max("ts")).alias("hi"),
        )
        .select(
            F.explode(
                F.expr("sequence(lo, hi, INTERVAL 1 HOUR)")
            ).alias("hour")
        )
    )
    w = Window.orderBy("hour").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        spine.join(hourly, "hour", "left")
        .select(
            "hour",
            F.coalesce(F.col("n_events"), F.lit(0).cast("long")).alias(
                "n_events"
            ),
            F.when(F.col("n_events").isNull(), 1)
            .otherwise(0)
            .cast("long")
            .alias("is_gap"),
            F.last("value_micros", ignorenulls=True)
            .over(w)
            .alias("ff_value_micros"),
        )
    )


# snapshot-diff derivation constants: v2 of the corpus is DERIVED from v1
# by pure integer rules so both engines build byte-identical versions —
# removed/changed/added docs exist at every scale (moduli chosen under the
# 500-doc sf0.001 corpus)
DIFF_REMOVED_MOD = 37
DIFF_CHANGED_MOD = 23
DIFF_ADDED_MOD = 41
DIFF_ADDED_OFFSET = 1_000_000_000


def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-style CDC application: the event stream is an oplog keyed by
    user_id — ``error`` events are DELETEs, every other type an UPSERT
    carrying the row image (value). Applying the log in (ts, event_id)
    order yields the final table state: the key survives iff its LAST op
    is not a delete, with the last-written value.

    This is the batch core of a lakehouse MERGE INTO / CDC-compaction
    job (the streaming twin is the foreachBatch upsert sink, which keeps
    the same last-writer-wins contract incrementally). One hash shuffle
    on user_id; a single ``row_number`` window picks the terminal op and
    a count over the same partition tallies the ops applied — no
    self-join, no iteration. All-integer value surface (micro-units)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ops = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("value_micros"),
    )
    ranked = ops.select(
        "user_id",
        "event_type",
        "value_micros",
        "ts",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("user_id"))
        .alias("n_ops"),
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .filter(F.col("event_type") != "error")
        .select(
            "user_id",
            F.col("event_type").alias("last_op"),
            F.col("value_micros").alias("last_value_micros"),
            F.col("ts").alias("last_ts"),
            "n_ops",
        )
    )


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two corpus versions — the change report a
    data-versioning layer (lakehouse table history, dataset releases)
    computes: which documents were added, removed, or changed, by
    fingerprint comparison. v2 is derived from v1 by deterministic
    integer rules (see module constants): ``doc_id % 37 == 0`` rows are
    dropped, ``% 23`` rows get revised text, and ``% 41`` rows spawn a
    new doc at ``doc_id + 1e9`` (past any scaled-replica key range) — so the diff exercises all three states
    at every scale and the oracle rebuilds the identical v2.

    Scale shape: one full-outer equi-join on doc_id of two fingerprint
    projections (md5 computed scan-side, so only (id, 32-byte fp) ever
    shuffles — never text); unchanged rows are filtered out, making the
    output |changes|, not |corpus|. At 100 TB this is the standard
    "diff two table snapshots by primary key" plan; file-level pruning
    (Delta/Iceberg manifests) would skip unchanged files first."""
    docs = table(spark, sf_dir, "documents")
    v1 = docs.select("doc_id", F.md5("text").alias("fp_old"))
    kept = docs.filter(F.col("doc_id") % DIFF_REMOVED_MOD != 0)
    v2 = kept.select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % DIFF_CHANGED_MOD == 0,
                F.concat(F.col("text"), F.lit(" [rev2]")),
            ).otherwise(F.col("text"))
        ).alias("fp_new"),
    ).unionByName(
        docs.filter(F.col("doc_id") % DIFF_ADDED_MOD == 0).select(
            (F.col("doc_id") + F.lit(DIFF_ADDED_OFFSET)).alias("doc_id"),
            F.md5(F.concat(F.col("text"), F.lit(" [new]"))).alias("fp_new"),
        )
    )
    joined = v1.join(v2, "doc_id", "full_outer")
    status = (
        F.when(F.col("fp_old").isNull(), F.lit("added"))
        .when(F.col("fp_new").isNull(), F.lit("removed"))
        .when(F.col("fp_old") != F.col("fp_new"), F.lit("changed"))
    )
    return (
        joined.select("doc_id", status.alias("status"), "fp_old", "fp_new")
        .filter(F.col("status").isNotNull())
    )


def orders_with_audit_observation(spark: SparkSession, sf_dir: str):
    """Side-band metrics via ``DataFrame.observe`` — the production way
    to run :func:`orders_audit`-style invariants WITHOUT a second scan:
    the audit aggregates ride along on the main query's single pass and
    surface through the Observation handle after any action, instead of
    a separate gate job reading the table twice. At 100 TB the saved
    scan IS the feature; the metrics are also what a streaming query
    exposes per micro-batch through the listener.

    Returns ``(df, observation)``: the df is the real workload (order
    totals by priority); the observation carries row count, key nulls,
    and the micro-unit price sum (same integer contract as the audit
    oracle). Test-verified against a direct aggregate; not in the
    registry because the driver contract captures DataFrames, not
    side-band metric handles."""
    from pyspark.sql import Observation

    o = table(spark, sf_dir, "orders")
    obs = Observation("orders_audit")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias(
            "null_custkeys"
        ),
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(1e4) + F.lit(0.5)).cast(
                "long"
            )
        ).alias("price_sum_e4"),
    )
    out = observed.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return out, obs


PROFILE_COLUMNS = ("o_orderstatus", "o_orderpriority", "o_custkey")


def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic column profiler — the data-catalog stats pass (one row
    per profiled column: nulls, distincts, min/max as strings) that
    feeds freshness/quality dashboards and CBO-style size estimates.
    ALL columns profile in ONE scan: each statistic is a parallel
    aggregate expression, and the per-column rows come from a
    ``stack`` unpivot of the single aggregate row — not one job per
    column (the naive profiler's scale killer). Min/max stringify so
    heterogeneous column types share one schema."""
    o = table(spark, sf_dir, "orders")
    aggs = []
    for c in PROFILE_COLUMNS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in PROFILE_COLUMNS
    )
    return wide.select(
        F.expr(
            f"stack({len(PROFILE_COLUMNS)}, {stack}) AS "
            "(column_name, n_nulls, n_distinct, min_value, max_value)"
        )
    )


CLIP_LO, CLIP_HI = 0.01, 0.99  # winsorization percentiles


def clipped_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (clipped) value statistics per event type — the
    outlier-robust normalization pass feature pipelines run before
    training: exact p1/p99 bounds, how many rows clip at each end, and
    the post-clip mean. Exact ``percentile`` matches DuckDB's
    ``quantile_cont`` linear interpolation (the order_price_quantiles
    precedent); at 100 TB the bounds would come from
    ``percentile_approx``'s mergeable sketch with a tolerance contract
    instead. The clipped mean divides a micro-unit LONG sum by an
    integer count — one hashed double, on the grid."""
    e = table(spark, sf_dir, "events")
    bounds = e.groupBy("event_type").agg(
        F.expr(f"percentile(value, {CLIP_LO})").alias("p_lo"),
        F.expr(f"percentile(value, {CLIP_HI})").alias("p_hi"),
    )
    clipped = e.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "p_lo",
        "p_hi",
        (F.col("value") < F.col("p_lo")).cast("long").alias("is_lo"),
        (F.col("value") > F.col("p_hi")).cast("long").alias("is_hi"),
        F.floor(
            F.greatest(F.least(F.col("value"), F.col("p_hi")), F.col("p_lo"))
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("cv_micros"),
    )
    return clipped.groupBy("event_type").agg(
        grid_round(F.first("p_lo"), 6).alias("p01"),
        grid_round(F.first("p_hi"), 6).alias("p99"),
        F.sum("is_lo").alias("n_clipped_lo"),
        F.sum("is_hi").alias("n_clipped_hi"),
        F.count(F.lit(1)).alias("n"),
        grid_round(
            (F.sum("cv_micros") / F.lit(1e6)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("clipped_mean"),
    )


HIST_BIN_WIDTH = 10.0  # events.value lives in [0, 100)


def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram of the event value distribution per type —
    the profiling surface a drift monitor compares release-to-release.
    Bin index is pure integer arithmetic on the micro-grid value
    (``floor`` of an exact division — no float bin edge can straddle),
    clamped into [0, 9]; empty bins are absent (the reader joins a
    spine if it needs zeros). Map-side projection + one aggregate."""
    e = table(spark, sf_dir, "events")
    bin_idx = F.least(
        F.greatest(
            F.floor(F.col("value") / F.lit(HIST_BIN_WIDTH)).cast("long"),
            F.lit(0).cast("long"),
        ),
        F.lit(9).cast("long"),
    )
    return (
        e.select("event_type", bin_idx.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
