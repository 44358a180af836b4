"""Join strategies + TPC-H-style flagship analytics (SURVEY.md §2.4 J1-J3).

The reference's only join is Catalyst-synthesized (EXCEPT -> left-anti,
homework-5/README.md:395-407, covered in :mod:`relational`). Real analytics
need the full join surface, so the flagship queries here adapt TPC-H Q1/Q3/Q5
to the testdata schema and exercise:

- multi-way equi-joins with size-aware join-strategy selection,
- join + aggregate + top-k pipelines,
- explicit broadcast-vs-shuffle choice.

Scale notes (100 TB): fact-fact joins (orders x lineitem) hash-partition on
the join key — at 1000 executors that is the unavoidable shuffle, kept to
one per query by projecting/filtering BEFORE the join so the exchange
carries only needed columns (Catalyst pushes these down, verified in plan
tests). Broadcast-hint policy: `F.broadcast` ONLY on fixed-cardinality
sides (region=5, nation=25 rows, one-row scalar aggregates) that stay tiny
at ANY scale factor; scale-variable dimensions (customer/part/supplier grow
with SF — billions of rows at 100 TB) carry NO hint, so the static planner
and AQE pick broadcast when runtime stats fit the threshold and fall back
to shuffle joins when they don't (a forced hint would OOM the executors).
Aggregates are partial+final. Top-k is `orderBy().limit(k)` which Spark
executes as per-partition TakeOrdered + driver merge — no global sort
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geektime_bigdata_spark.functions import exact_sum, grid_round
from geektime_bigdata_spark.registry import table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) on ``lineitem``: scan-heavy
    partial+final aggregation — the per-core scan/agg throughput yardstick.

    Single exchange on the tiny (returnflag, linestatus) grouping key;
    everything else is map-side. The shipdate filter is pushed to parquet.
    Sums/averages accumulate through DECIMAL(18,6) (``exact_sum``) so the
    hashed contract values are partition-order-independent.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            grid_round(exact_sum("l_quantity"), 2).alias("sum_qty"),
            grid_round(exact_sum("l_extendedprice"), 2).alias("sum_base_price"),
            grid_round(exact_sum(disc_price), 2).alias("sum_disc_price"),
            grid_round(exact_sum(charge), 2).alias("sum_charge"),
            grid_round(exact_sum("l_quantity") / n, 6).alias("avg_qty"),
            grid_round(exact_sum("l_extendedprice") / n, 6).alias("avg_price"),
            grid_round(exact_sum("l_discount") / n, 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): 3-way join customer ⋈ orders ⋈ lineitem
    with selective filters on both sides, grouped revenue, deterministic
    top-10.

    The BUILDING-filtered customer side is unhinted: the planner/AQE
    broadcasts it while it fits (it does at every test SF) and shuffles
    it at data scales where a forced broadcast would OOM; orders⋈lineitem
    hash-partitions on o_orderkey/l_orderkey. Filters applied pre-join so
    the exchange carries filtered rows.
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            o.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(grid_round(exact_sum(revenue), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 6-way join
    region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier with the
    c_nationkey = s_nationkey locality condition, revenue per nation.

    nation/region (fixed 25/5 rows) are broadcast-hinted; customer and
    supplier are left to size-based selection (broadcast while they fit,
    shuffle at 100 TB). The unavoidable exchanges are the fact joins
    (orders on custkey, lineitem on orderkey); Catalyst reorders the join
    tree under AQE with runtime stats.
    """
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dim = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r.filter(F.col("r_name").isin("AMERICA", "ASIA"))),
              n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1998-01-01"))
        )
        .join(dim, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(grid_round(exact_sum(revenue), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan + conjunctive
    range filters + single global aggregate — the pushdown/codegen
    yardstick. All three predicates reach the parquet reader; the
    aggregate is a one-row partial+final pair (no keyed shuffle at all).
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            grid_round(
                exact_sum(F.col("l_extendedprice") * F.col("l_discount")), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): customer ⋈ orders ⋈
    lineitem(R) ⋈ nation, revenue per customer, deterministic top-20.
    Returns-filter applied before the join; nation (fixed 25 rows)
    broadcast-hinted, customer size-selected; the orders⋈lineitem shuffle
    carries only returned lines."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    n = table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-10-01"))
                & (F.col("o_orderdate") < F.lit("1997-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(grid_round(exact_sum(revenue), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): lineitem ⋈ part with a conditional
    ratio aggregate — part joins size-selected (broadcast while it fits),
    one scan, one tiny final row."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01"))
            & (F.col("l_shipdate") < F.lit("1996-10-01"))
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            grid_round(
                100.0 * exact_sum(promo) / exact_sum(disc_price), 6
            ).alias("promo_revenue_pct")
        )
    )


def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join of a fact to a dimension: customers per
    nation name. The hint guarantees no shuffle on the fact side regardless
    of statistics — plan-shape test asserts BroadcastHashJoin."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            grid_round(exact_sum("c_acctbal"), 4).alias("total_acctbal"),
        )
    )


def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti in one result: per customer, whether they have
    any 'purchase'-priority order — expressed as existence flags via
    left-semi/anti joins unioned. Exercises J3 semi/anti surface."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    with_urgent = (
        c.join(urgent, c["c_custkey"] == urgent["o_custkey"], "left_semi")
        .select("c_custkey", "c_name")
        .withColumn("has_urgent", F.lit(1))
    )
    without_urgent = (
        c.join(urgent, c["c_custkey"] == urgent["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
        .withColumn("has_urgent", F.lit(0))
    )
    return with_urgent.unionByName(without_urgent)


def nation_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join (J3 surface): per-nation customer counts vs supplier
    counts — nations with no suppliers keep NULL on that side. Both inputs
    pre-aggregate to one row per nation BEFORE joining, so the outer join
    is dim-sized regardless of fact cardinality."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cust = c.groupBy(F.col("c_nationkey").alias("nk_c")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    supp = s.groupBy(F.col("s_nationkey").alias("nk_s")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return cust.join(
        supp, cust["nk_c"] == supp["nk_s"], "full_outer"
    ).select(
        F.coalesce(F.col("nk_c"), F.col("nk_s")).alias("nationkey"),
        "n_customers",
        "n_suppliers",
    )


def intersect_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (O4 surface): customers with high balance who are also in
    the BUILDING segment — Catalyst rewrites to a left-semi join with
    distinct, mirroring the EXCEPT->anti-join rewrite of homework-5."""
    c = table(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 1000).select("c_custkey", "c_name")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name"
    )
    return rich.intersect(building)


def attribution_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join (J3 surface): for each purchase, the count and
    latest timestamp of the same user's clicks in the preceding hour —
    the classic attribution query.

    Scale path: a naive non-equi join on ``(user, c_ts BETWEEN p_ts-1h
    AND p_ts)`` degenerates to a per-user nested loop. Instead each
    purchase probes exactly TWO (user, hour-bucket) keys (its own hour
    and the previous one — any preceding-hour click must fall in one of
    them), making it an equi-join on (user_id, bucket) with an exact
    residual time filter. Shuffle volume is 2x purchases + 1x clicks,
    independent of the time-window length/density relationship a nested
    loop would be quadratic in."""
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.date_trunc("hour", F.col("ts")).alias("bucket"),
    )
    probes = purchases.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.date_trunc("hour", F.col("p_ts")),
                F.date_trunc("hour", F.col("p_ts"))
                - F.expr("INTERVAL 1 HOUR"),
            )
        ),
    )
    return (
        probes.join(
            clicks,
            (F.col("user_id") == F.col("c_user"))
            & (probes["bucket"] == clicks["bucket"])
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") < F.col("p_ts")),
        )
        .groupBy("purchase_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_prior_clicks"),
            F.max("c_ts").alias("last_click_ts"),
        )
    )


def top_k_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k with deterministic tiebreak (O4 extension): TakeOrdered,
    not a full sort — per-partition heap + driver merge of k rows."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )
