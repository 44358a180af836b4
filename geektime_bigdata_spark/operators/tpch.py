"""Extended TPC-H-style flagship suite (SURVEY.md §2.4 J3 / §7.2-M8).

The reference never writes a join beyond the Catalyst-synthesized left-anti
(homework-5/README.md:395-407); its capability surface stops at single-table
aggregation. A complete engine needs the full decision-support join/subquery
repertoire, so this module adapts the remaining expressible TPC-H queries to
the driver testdata schema (TESTDATA.md — a TPC-H subset: no ``partsupp``,
no ``l_commitdate``/``l_receiptdate``/``l_shipmode``/``c_phone``):

- Q2  -> min-cost supplier via the DISTINCT (l_partkey, l_suppkey) pairs of
         ``lineitem`` as the partsupp proxy; min ``s_acctbal`` as the cost.
- Q4  -> EXISTS becomes a left-semi join; "late" = shipped >30 days after
         the order date (commit/receipt dates do not exist in the subset).
- Q7/Q8/Q9 -> nation-pair volume, market share, and product profit with
         ``p_retailprice`` standing in for supply cost.
- Q12 -> late-line priority counts grouped by ``l_linestatus`` (no shipmode).
- Q13/Q15/Q17/Q18/Q19 -> direct adaptations.
- Q21 -> "sole late supplier on a multi-supplier order" via one semi and one
         anti join (EXISTS / NOT EXISTS).
- Q22 -> above-average-balance customers with no recent orders, grouped by
         nation key (no phone country code in the subset).

Scale notes (100 TB): `F.broadcast` hints ONLY on fixed-cardinality sides
(nation/region, one-row scalar aggregates, the 10-row centroid table) —
scale-variable dims (customer/part/supplier) are unhinted so the planner
broadcasts them while runtime stats fit and shuffles them at scales where
a forced broadcast would OOM; selective filters are applied *before* joins
so exchanges carry filtered rows; correlated scalar
subqueries (Q17's per-part average, Q2's per-part min) become window
functions over the join key — one shuffle, no re-scan of the fact;
global scalars (Q15's max, Q22's average) become one-row broadcast cross
joins, never a single-partition window. Top-k outputs use
``orderBy().limit(k)`` = per-partition TakeOrdered + driver merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from geektime_bigdata_spark.functions import exact_sum, grid_round
from geektime_bigdata_spark.registry import table

def _disc_price():
    # Built lazily: Column construction needs an active SparkContext.
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier, adapted): for every LARGE part of
    size <= 5, the supplier(s) with the lowest account balance among those
    that have shipped it. The partsupp relation is proxied by the distinct
    (l_partkey, l_suppkey) pairs observed in lineitem; the correlated
    ``min`` subquery is a window over ``p_partkey``."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    cand = (
        ps.join(
            p.filter((F.col("p_size") <= 5) & (F.col("p_type") == "LARGE")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_name")
        .limit(100)
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking): orders of 1996-Q3 with at least
    one line shipped more than 30 days after the order date, counted per
    priority. The EXISTS is a left-semi join whose condition references
    both sides (no pre-shuffle of the full lineitem needed beyond the
    orderkey hash)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    window_orders = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01"))
        & (F.col("o_orderdate") < F.lit("1996-10-01"))
    )
    late = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    return (
        window_orders.join(li.select("l_orderkey", "l_shipdate"), late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue flowing between NATION_1 and
    NATION_2 (either direction), per supplier-nation/customer-nation/year.
    The nation filter lands on the supplier/customer sides *before*
    their joins, so the fact join carries only the two nations' traffic."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    pair = F.col("n_name").isin("NATION_1", "NATION_2")
    supp = (
        s.join(F.broadcast(n.filter(pair)), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        c.join(F.broadcast(n.filter(pair)), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(grid_round(exact_sum(_disc_price()), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of ASIA-region
    ECONOMY-part revenue per order year. The numerator is a conditional
    sum — one pass, no second join."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    p = table(spark, sf_dir, "part")
    asia_cust = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = F.when(F.col("supp_nation") == "NATION_3", _disc_price()).otherwise(F.lit(0.0))
    return (
        li.join(
            p.filter(F.col("p_type") == "ECONOMY").select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01"))
                & (F.col("o_orderdate") < F.lit("1998-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(asia_cust, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            # exact_sum in both numerator and denominator: the ratio of two
            # order-dependent double sums is doubly knife-edged at round(,6)
            grid_round(exact_sum(vol) / exact_sum(_disc_price()), 6).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit, adapted): profit on parts whose name
    contains 'red', per supplier nation and order year. Supply cost is
    proxied as 10% of ``p_retailprice`` per unit (no partsupp table)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    p = table(spark, sf_dir, "part")
    profit = _disc_price() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(
            p.filter(F.col("p_name").contains("red")).select(
                "p_partkey", "p_retailprice"
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(grid_round(exact_sum(profit), 4).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification, adapted): parts whose
    NATION_4-supplied shipped value exceeds 0.2% of that nation's total
    shipped value (no partsupp availqty/supplycost in the schema subset —
    shipped extended price stands in for stock value). The HAVING-over-
    global-total scalar subquery is a one-row broadcast cross join against
    the per-part aggregate, computed once."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    nation_supp = s.join(
        F.broadcast(n.filter(F.col("n_name") == "NATION_4")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    per_part = (
        li.join(nation_supp, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(exact_sum("l_extendedprice").alias("value"))
    )
    # value is exact-decimal-derived (a 0.01 multiple), so re-casting to
    # DECIMAL recovers it exactly and the grand total is order-independent
    # too — the 0.002*total filter edge is then deterministic cross-engine.
    total = per_part.agg(exact_sum("value").alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > 0.002 * F.col("total_value"))
        .select("l_partkey", grid_round("value", 4).alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping priority vs lateness, adapted): lines shipped
    >60 days after the order date during 1997, split into urgent/high vs
    other order priorities, grouped by line status (the schema subset has
    no shipmode column)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(
            o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): left-outer join keeps
    zero-order customers; two cascaded aggregations (per-customer count,
    then histogram of counts)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    not_low = o.filter(F.col("o_orderpriority") != "5-LOW").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        c.select("c_custkey")
        .join(not_low, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) with the maximum 1997-Q1
    revenue. The global-max scalar subquery is a one-row broadcast cross
    join against the per-supplier aggregate — never a single-partition
    window."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(grid_round(exact_sum(_disc_price()), 4).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship, adapted): distinct supplier
    count per (brand, type, size) for selected sizes, excluding PROMO
    parts — the partsupp relation again proxied by lineitem's distinct
    (partkey, suppkey) pairs. countDistinct plans a two-phase
    partial-distinct aggregate; the part side broadcasts pre-filtered."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(
            p.filter(
                F.col("p_size").isin(1, 5, 9, 13, 17)
                & (F.col("p_type") != "PROMO")
            ).select("p_partkey", "p_brand", "p_type", "p_size"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): yearly-average revenue
    lost if Brand#12 orders below 20% of the part's mean quantity were not
    taken. The correlated per-part average is a window over ``p_partkey``
    on the already-joined (brand-filtered) fact — one shuffle total."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    joined = li.join(
        p.filter(F.col("p_brand") == "Brand#12").select("p_partkey"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        # avg_qty needs no decimal treatment: l_quantity is integer-valued,
        # and integer sums are exact in double regardless of order.
        .agg(grid_round(exact_sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds 180, with customer detail, top-100 by order value. The HAVING
    subquery is a pre-aggregation joined back to orders — the per-order
    sum is computed once, not re-aggregated after the join."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(grid_round(exact_sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 180)
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): disjunctive brand/size/quantity
    predicate triples — the classic OR-of-ANDs that exercises predicate
    normalization. The part side is pre-filtered to the three brands
    before broadcasting."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    brands = ("Brand#2", "Brand#13", "Brand#24")
    cond = (
        (
            (F.col("p_brand") == brands[0])
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(5, 15)
        )
        | (
            (F.col("p_brand") == brands[1])
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(15, 25)
        )
        | (
            (F.col("p_brand") == brands[2])
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(25, 35)
        )
    )
    return (
        li.join(
            p.filter(F.col("p_brand").isin(*brands)).select(
                "p_partkey", "p_brand", "p_size"
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(cond)
        .agg(
            grid_round(exact_sum(_disc_price()), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def q20_heavy_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion, adapted): NATION_2 suppliers
    that shipped more than 25 units of some 'red' part during 1997. The
    correlated HAVING subquery becomes a grouped pre-aggregate on
    (suppkey, partkey) semi-joined back to the supplier dimension —
    the aggregate runs once, not per supplier probe."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(
            p.filter(F.col("p_name").contains("red")).select("p_partkey"),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("shipped"))
        .filter(F.col("shipped") > 25)
        .select("l_suppkey")
    )
    return (
        s.join(
            F.broadcast(n.filter(F.col("n_name") == "NATION_2")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting, adapted): NATION_1
    suppliers that were the *only* late shipper (>60 days after order
    date) on a finished multi-supplier order. EXISTS -> left-semi join,
    NOT EXISTS -> left-anti join, both with compound (same order,
    different supplier) conditions."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    l1 = (
        li.join(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    sole_late = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
    )
    nation1_supp = (
        s.join(
            F.broadcast(n.filter(F.col("n_name") == "NATION_1")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        sole_late.join(nation1_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity, adapted): customers whose
    balance exceeds the positive-balance average and who placed no order
    since 2000, counted per nation key (the schema subset has no phone
    country code). The scalar average is a one-row broadcast cross join;
    NOT EXISTS is a left-anti join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    # exact_sum/count instead of avg: the scalar average feeds a filter
    # edge (c_acctbal > avg_bal), where an order-dependent double sum can
    # flip membership of a customer sitting exactly on the boundary.
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (exact_sum("c_acctbal") / F.count(F.lit(1))).alias("avg_bal")
    )
    recent = o.filter(F.col("o_orderdate") >= F.lit("2000-01-01")).select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            grid_round(exact_sum("c_acctbal"), 4).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
