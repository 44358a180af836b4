"""Window functions, sessionization, as-of joins, time bucketing.

Extension scope (SURVEY.md §2.7 notes the reference has no streaming /
windowing at all): these are the time-series operators a 100 TB event
pipeline needs, expressed with native window frames — no Python in the
hot path, single hash-partition per partition key.

Scale notes: window functions shuffle once on the PARTITION BY key and
sort within partitions (Tungsten spillable sort). Skewed users would need
salting for the ranking ops; the sessionize cumulative-sum is inherently
per-key sequential but each key's stream fits memory by construction.
The as-of join is an equi-join on the entity key plus a range predicate —
planned as a hash join with post-filter, NOT a cartesian.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geektime_bigdata_spark.functions import exact_sum, grid_round, sum_micros
from geektime_bigdata_spark.registry import table

# the pivot value list and its unpivot inverse MUST stay in sync —
# one constant serves both (event_type_pivot / event_type_melt)
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


def window_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price — ``row_number`` over
    (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey).
    Deterministic tiebreak on the key."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


def running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running sum + event index over the event stream — the
    cumulative frame (UNBOUNDED PRECEDING .. CURRENT ROW). event_id breaks
    timestamp ties deterministically.

    ``running_value_micros`` is a LONG micro-unit cumulative sum (the
    same integer contract surface as :func:`sessionize`): a plain double
    window sum relies on both engines accumulating the frame in the same
    float op order, which neither documents — integers are associative,
    so the hashed value is order-proof."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    micro = F.floor(F.col("value") * F.lit(1e6) + F.lit(0.5)).cast("long")
    return e.select(
        "user_id",
        "event_id",
        F.sum(micro).over(w).alias("running_value_micros"),
        F.count(F.lit(1)).over(w).alias("event_idx"),
    )


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap) — the classic
    lag + boundary-flag + cumulative-sum window chain, entirely native:

        new_session = (ts - lag(ts)) > gap
        session_id  = sum(new_session) over (user ORDER BY ts)

    Returns one row per session with size and duration. One shuffle on
    user_id covers both windows (same partitioning).

    Contract-edge hardening (rounds 1+2 both hash-failed this query's
    DOUBLE surface on the driver even though the micro-unit sum is
    engine-identical by construction): the output is now ALL-INTEGER —
    ``session_value_micros`` is the raw LONG micro-unit sum
    (:func:`sum_micros`, no division, no rounding) and ``duration_us``
    is an exact microsecond difference (``unix_micros``; the DuckDB twin
    uses ``epoch_us``, BIGINT on both engines — no double ``epoch()``
    floor anywhere). Integer columns cannot knife-edge a value hash."""
    e = table(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w_ord)
    # full-precision interval comparison (unix_timestamp would truncate
    # microseconds and disagree with the fractional-epoch oracle)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = e.select(
        "user_id", "ts", "event_id", "value"
    ).withColumn("session_id", F.sum(is_new).over(w_cum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        sum_micros("value").alias("session_value_micros"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "duration_us"
        ),
    )


def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join within the event stream: for each purchase, the most
    recent click by the same user at-or-before the purchase time.

    Sort-based as-of (the scale formulation): union clicks+purchases,
    one hash shuffle on user_id, per-user time sort, and a running
    ``last(click_ts, ignorenulls)`` window carries the most recent click
    forward to each purchase row. Work is LINEAR in events — unlike the
    equi-join-then-aggregate formulation, which materializes
    |purchases| x |clicks| rows per user before reducing (quadratic on
    hot users). Ties at the same timestamp order clicks before purchases
    so an exactly-simultaneous click counts (<= semantics)."""
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts"),
        F.lit(0).alias("is_purchase"),
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts"),
        F.lit(1).alias("is_purchase"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .select(
            "purchase_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            "is_purchase",
            F.last("click_ts", ignorenulls=True).over(w).alias("last_click_ts"),
            F.count("click_ts").over(w).alias("n_prior_clicks"),
        )
        .filter(F.col("is_purchase") == 1)
        .drop("is_purchase")
    )


def asof_last_click_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join again, via the COGROUP pandas API
    (``groupBy().cogroup().applyInPandas`` — SURVEY §2.8's last
    grouped-pandas surface): clicks and purchases arrive as two aligned
    per-user pandas frames and a merge-asof runs in Python. Differential
    twin of :func:`asof_last_click` — same output schema, same oracle —
    so the native window formulation and the Arrow-cogroup formulation
    check each other.

    Scale shape: ONE co-partitioned shuffle on user_id for both sides
    (exactly the shuffle the native version pays), then per-user Python
    work over Arrow batches. The native version stays the hot path —
    this is the API surface a pipeline reaches for when per-group logic
    outgrows expressions (model-feature alignment, custom event
    pairing). Timestamps are compared as exact int64 microseconds; the
    searchsorted walk is O(n log n) per group."""
    import numpy as np
    import pandas as pd

    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), "ts"
    )

    def asof(c_pdf: "pd.DataFrame", p_pdf: "pd.DataFrame") -> "pd.DataFrame":
        if p_pdf.empty:
            return pd.DataFrame(
                columns=[
                    "purchase_id",
                    "user_id",
                    "purchase_ts",
                    "last_click_ts",
                    "n_prior_clicks",
                ]
            )
        # normalize to ns explicitly: Arrow may hand pandas either
        # datetime64[ns] or [us], and astype("int64") follows the unit
        c_us = np.sort(
            c_pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        )
        p_us = p_pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy()
        # clicks AT-OR-BEFORE the purchase (<= semantics): count = number
        # of click timestamps <= p_ts; last = the count-1'th sorted click
        n_prior = np.searchsorted(c_us, p_us, side="right")
        if c_us.size:
            last = np.where(n_prior > 0, c_us[np.maximum(n_prior - 1, 0)], 0)
        else:
            # user purchased but never clicked: indexing an empty array
            # would raise — every purchase row gets NaT below
            last = np.zeros(len(p_us), dtype="int64")
        out = pd.DataFrame(
            {
                "purchase_id": p_pdf["purchase_id"].to_numpy(),
                "user_id": p_pdf["user_id"].to_numpy(),
                "purchase_ts": p_pdf["ts"].to_numpy(),
                "last_click_ts": pd.to_datetime(last, unit="ns"),
                "n_prior_clicks": n_prior.astype("int64"),
            }
        )
        out.loc[out["n_prior_clicks"] == 0, "last_click_ts"] = pd.NaT
        return out

    return (
        clicks.groupBy("user_id")
        .cogroup(purchases.groupBy("user_id"))
        .applyInPandas(
            asof,
            "purchase_id long, user_id long, purchase_ts timestamp, "
            "last_click_ts timestamp, n_prior_clicks long",
        )
    )


def hourly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup in batch form: events bucketed per hour per
    type — `date_trunc` keeps it oracle-comparable; the streaming twin uses
    ``window(ts, '1 hour')`` (see streaming module) with identical output."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            grid_round(exact_sum("value"), 6).alias("total_value"),
        )
    )


def session_window_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` (gap-merge) aggregation — the built-in
    operator equivalent of :func:`sessionize`'s lag+cumsum chain, and the
    one that works unchanged under Structured Streaming with state
    eviction. 30-minute gap; emits per-session bounds and size.

    session_window end = last event + gap by definition, so
    ``session_end - interval gap`` is the last event timestamp — emitted
    that way to stay oracle-comparable."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.col("user_id"),
            F.session_window(F.col("ts"), "30 minutes").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            grid_round(exact_sum("value"), 6).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            (F.col("sw.end") - F.expr("INTERVAL 30 MINUTES")).alias(
                "last_event_ts"
            ),
            "n_events",
            "session_value",
        )
    )


def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 date functions: per-(year, month) order counts and revenue —
    year/month extraction stays in codegen and groups on two small ints."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.month("o_orderdate").cast("long").alias("mo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            grid_round(exact_sum("o_totalprice"), 4).alias("revenue"),
        )
    )


def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation): per-user value sums by event type. The
    value list is explicit, so the plan is a single aggregate with one
    conditional-sum column per type — no second pass to discover keys
    (the two-phase pivot is a scale anti-pattern)."""
    e = table(spark, sf_dir, "events")
    types = EVENT_TYPES
    return (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(grid_round(exact_sum("value"), 6))
    )


def order_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per group (X7 extension): median/p90 of order
    totals by priority. Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share linear interpolation, so this is
    oracle-exact. At 100 TB one would switch to ``percentile_approx``
    (mergeable t-digest sketch) — tested separately with tolerance."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        grid_round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        grid_round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


def customer_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function breadth (X7 extension): per-segment balance
    quartile (``ntile``) and ``percent_rank``, custkey-tiebroken so both
    engines assign identical positions. One hash shuffle on the segment
    key; ntile's per-partition pass is linear."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        grid_round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 2-hour windows advancing hourly — each
    event lands in exactly two windows. Spark's ``window(ts, '2 hours',
    '1 hour')`` plans an Expand (2 rows per event) + one aggregate, the
    same shape the oracle builds explicitly with a 2-element unnest."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            grid_round(exact_sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            "n",
            "total_value",
        )
    )


def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 extension: JSON extraction from the events.props payload with
    ``get_json_object`` (codegen'd JsonPath, no Python), aggregated per
    event_type."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` (SURVEY.md §2.8 — the API that
    replaces a custom MapReduce Reducer when per-group logic genuinely
    needs imperative code): per-user OLS slope of event value over time.

    Each user's slice arrives as ONE pandas frame (Arrow-batched); the
    slope comes from the closed-form OLS sums computed in EXACT integer
    arithmetic: x = whole microseconds since the user's first event
    (exact int64), y = exact value cents (``floor(v*100 + 0.5)``), and
    num/den = ``n*Sxy - Sx*Sy`` / ``n*Sxx - Sx^2`` over Python
    arbitrary-precision ints. Only the final ``num/den`` division and
    the hours/value unit conversion touch doubles, mirrored
    op-for-op by the DuckDB oracle (HUGEINT sums there) — so the result
    is bit-identical no matter how either engine orders the group's
    rows. (A float implementation here is a latent hash flake: pandas
    pairwise summation != the oracle's accumulation order, and
    applyInPandas makes no row-order promise.) Partitioning: one
    shuffle on user_id; group frames must fit a worker (true for
    per-user event counts; a power user would be pre-aggregated per
    hour first)."""
    import math

    import pandas as pd

    e = table(spark, sf_dir, "events")

    def slope(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ns = pdf["ts"].astype("int64")
        xs = ((ns - ns.min()) // 1000).tolist()  # exact µs offsets
        ys = [math.floor(v * 100 + 0.5) for v in pdf["value"]]  # exact cents
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(a * b for a, b in zip(xs, ys))
        sxx = sum(a * a for a in xs)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        if den == 0:
            out = None
        else:
            # cents/µs -> value/hour: * 3.6e9 / 100
            s = (float(num) / float(den)) * 3.6e7
            out = math.floor(s * 1e6 + 0.5) / 1e6
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "slope": [out],
                "n_events": [n],
            }
        )

    return (
        e.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(slope, "user_id long, slope double, n_events long")
    )


def hourly_anomaly_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic anomaly detection: per-hour event-count z-score against
    the trailing 24 fully-observed hours — the ops-monitoring view a
    pipeline watches for ingest regressions (an hour at z >= 3 means a
    broken upstream or a flood).

    Scale shape: the expensive pass is the hourly rollup (one hash
    shuffle on the hour bucket); the trailing window then runs over
    O(hours) ROWS — ~720/month regardless of corpus size — so the
    unpartitioned window is a driver-scale afterthought, not a skew
    risk. Determinism: counts are integers, the trailing sum/sum-of-
    squares stay integers, variance = (k*s2 - s*s)/k^2 and the z-score
    divide exact integers in identical IEEE order on both engines
    (sqrt included), and the result lands on the 1e-6 grid. Hours with
    an incomplete window or zero variance emit NULL."""
    e = table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("hour").rowsBetween(-24, -1)
    s = F.sum("n").over(w)
    s2 = F.sum(F.col("n") * F.col("n")).over(w)
    k = F.count(F.lit(1)).over(w)
    var = (k * s2 - s * s) / (k * k)
    z = (F.col("n") - s / k) / F.sqrt(var)
    return (
        hourly.select(
            "hour",
            "n",
            k.alias("k"),
            F.when((k == 24) & (var > 0), grid_round(z, 6)).alias("zscore"),
        )
        .filter(F.col("k") == 24)
        .drop("k")
    )


def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view -> click -> purchase: a user
    reaches a stage only via events STRICTLY AFTER their entry into the
    previous stage (min-ts semantics — the standard product-analytics
    funnel). Output: one row per stage with the user count and the
    fraction of stage-1 users still converting.

    Scale shape: three filtered per-user min-aggregates chained by
    equi-joins on user_id — each stage's relation only shrinks, no
    window functions, no self-join of the raw events; at 100 TB all
    three shuffles hash on the same key so AQE can coalesce. Counts are
    integers; the conversion fraction is an integer-ratio double on the
    1e-6 grid."""
    e = table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stages = (
        v.agg(F.count(F.lit(1)).alias("n_users"))
        .select(F.lit("1_view").alias("stage"), "n_users")
        .unionByName(
            c.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit("2_click").alias("stage"), "n_users"
            )
        )
        .unionByName(
            p.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit("3_purchase").alias("stage"), "n_users"
            )
        )
    )
    top = v.agg(F.count(F.lit(1)).alias("top_n"))
    return stages.crossJoin(F.broadcast(top)).select(
        "stage",
        "n_users",
        grid_round(F.col("n_users") / F.col("top_n"), 6).alias("pct_of_top"),
    )


def user_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern mining over the event stream: global counts of
    consecutive event-type trigrams within each user's time-ordered
    history (``view>click>purchase`` etc.) — the journey-mining pass
    behind funnel discovery, next to :func:`event_funnel` which checks
    ONE known path.

    Scale shape: one hash shuffle on user_id feeds two ``lead`` windows
    over the same sort (single window spec, single sort), then the
    trigram strings aggregate into at most |types|^3 groups — a
    driver-scale output no matter the corpus. (ts, event_id) is a total
    order, so both engines see identical successors. All-integer
    contract surface."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t2 = F.lead("event_type", 1).over(w)
    t3 = F.lead("event_type", 2).over(w)
    return (
        e.select(
            F.concat_ws(">", F.col("event_type"), t2, t3).alias("path"),
            t3.alias("t3"),
        )
        .filter(F.col("t3").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention — the standard growth-analytics matrix:
    users grouped by the week of their FIRST event; for each (cohort,
    week-offset), how many distinct cohort members were active, and
    the fraction of the cohort that retains.

    Scale shape: first-event week is one per-user min-aggregate; the
    activity relation reduces to distinct (user, week) BEFORE joining
    the cohort assignment back (each shuffle keys on user_id, so AQE
    can reuse the partitioning); the final matrix is O(weeks^2) rows —
    driver-scale. Week arithmetic stays integer (day difference DIV 7
    on Monday-aligned truncations); the retention fraction is an
    integer-ratio double on the 1e-6 grid."""
    e = table(spark, sf_dir, "events")
    cohorts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    matrix = (
        active.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            F.expr("CAST(datediff(week, cohort_week) DIV 7 AS BIGINT)")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    base = (
        cohorts.groupBy("cohort_week")
        .agg(F.count(F.lit(1)).alias("cohort_size"))
    )
    return matrix.join(F.broadcast(base), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        grid_round(F.col("n_active") / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )


def sliding_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day — the sliding DISTINCT
    aggregate (WAU) that plain window frames cannot express (count
    distinct over a moving range needs the raw keys, not a running
    partial).

    Scale formulation: the corpus first reduces to the distinct
    (user_id, day) relation — at 100 TB that is the small fact, bounded
    by users x days, not events — then a RANGE join expands each
    activity day into the ≤ 7 spine days it contributes to, and one
    aggregate counts distinct users per spine day. The 7x expansion of
    the REDUCED relation is the standard cost of exact sliding
    distinct; the approximate alternative (merging 7 daily HLL
    sketches) is the sketches-module pattern. Spine days with no
    activity in their whole window emit 0 via the left join. All-
    integer surface."""
    e = table(spark, sf_dir, "events")
    user_days = e.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    spine = (
        e.agg(
            F.date_trunc("day", F.min("ts")).alias("lo"),
            F.date_trunc("day", F.max("ts")).alias("hi"),
        )
        .select(
            F.explode(F.expr("sequence(lo, hi, INTERVAL 1 DAY)")).alias(
                "day"
            )
        )
    )
    contrib = user_days.select(
        "user_id",
        F.explode(
            F.expr("sequence(day, day + INTERVAL 6 DAYS, INTERVAL 1 DAY)")
        ).alias("day"),
    ).distinct()
    wau = contrib.groupBy("day").agg(
        F.count(F.lit(1)).alias("wau")
    )
    return (
        spine.join(wau, "day", "left")
        .select(
            "day",
            F.coalesce(F.col("wau"), F.lit(0).cast("long")).alias("wau"),
        )
    )


def event_type_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``unpivot`` (melt): the wide per-user pivot folded back to
    long (user_id, event_type, total_value) rows — the wide↔long
    round-trip every feature pipeline needs in both directions. Spark
    plans unpivot as an Expand (one output row per value column per
    input row) — the exact inverse of the pivot's conditional
    aggregation, with no shuffle beyond the pivot's own aggregate.
    Users with no events of a type emit NULL in the wide form; the melt
    drops them (mirrored in the oracle via the type filter), so the
    output equals the plain (user, type) aggregate."""
    wide = event_type_pivot(spark, sf_dir)
    types = EVENT_TYPES
    return (
        wide.unpivot(
            "user_id", types, "event_type", "total_value"
        )
        .filter(F.col("total_value").isNotNull())
    )


def json_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X7 via Spark 4's VARIANT type: ``parse_json`` ingests the props
    payload ONCE into the binary semi-structured encoding, then typed
    ``variant_get`` paths extract fields — the open-schema columnar
    pattern (shredded, binary, no per-access JSON re-parse) that
    replaces repeated ``get_json_object`` string scans at scale.
    Differential twin of :func:`json_props_extract` (same aggregate
    surface, same oracle class): the two formulations checking each
    other is exactly how the VARIANT migration is validated on a real
    pipeline. ``try_variant_get`` on a missing path exercises the
    NULL-not-error contract; the count confirms no row was dropped."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    row = e.select(
        "event_type",
        F.variant_get(v, "$.k", "long").alias("k"),
        F.try_variant_get(v, "$.missing", "long").alias("missing"),
    )
    return row.groupBy("event_type").agg(
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count(F.lit(1)).alias("n"),
        F.count("missing").alias("n_missing_present"),
    )


DECAY_HALF_HOURS = 24.0  # e-folding age for recency weighting


def user_recency_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed activity score per user — the
    recency weighting a curation/ranking pipeline applies so stale
    activity stops dominating (score = sum of exp(-age_hours / 24)
    over the user's events, measured against the corpus's newest
    event). Events NOW contribute 1, day-old events ~0.37, week-old
    ~0.002.

    Scale/determinism shape: the anchor is one driver scalar (global
    max ts — the same bounded-collect class as tf-idf's N); the decay
    term is map-side; each term is micro-quantized to LONG before the
    per-user sum (associative — partitioning cannot reorder it) and
    the score ships as the raw integer micro-unit sum. Age is an exact
    integer microsecond difference; ``exp`` matches across engines'
    libm — the ln/tfidf precedent, green three driver rounds. One
    hash shuffle on user_id."""
    e = table(spark, sf_dir, "events")
    anchor = e.agg(F.max("ts").alias("m")).collect()[0]["m"]
    age_us = F.unix_micros(F.lit(anchor)) - F.unix_micros(F.col("ts"))
    # exact integer microseconds -> hours as ONE double division
    decay = F.exp(
        -(age_us.cast("double") / F.lit(3600.0 * 1e6 * DECAY_HALF_HOURS))
    )
    term_micros = F.floor(decay * F.lit(1e6) + F.lit(0.5)).cast("long")
    return (
        e.select("user_id", term_micros.alias("t"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("t").alias("recency_micros"),
        )
    )
