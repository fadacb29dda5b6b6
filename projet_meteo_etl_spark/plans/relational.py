"""Relational operator breadth: scans, filters, projections, aggregations,
joins (broadcast + shuffle), windows, sorts/limits, set ops, scalar
functions — all as declarative DataFrame plans Catalyst can optimize.

The reference has none of these (SURVEY.md §2.5: joins/windows/sorts are
ABSENT there); they are required by the driver's oracle contract and are
the relational core any analytics engine needs.

Scale notes (100 TB design stance):

* ``lineitem``/``orders``/``events`` are the fact tables — every plan
  filters them as early as possible so the predicate reaches the parquet
  scan (check ``PushedFilters`` in ``.explain``).
* Dimension tables (``region``/``nation``/``customer``/``supplier``/
  ``part``) are joined with ``broadcast()`` hints: at TPC-H proportions
  they stay orders of magnitude smaller than facts, so no shuffle of the
  fact side is ever needed for a dim join.
* Aggregations rely on Spark's partial (map-side) + final hash
  aggregation; nothing here forces a row explosion before the agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.functions.portable import pround


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation over a filtered fact scan (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: filter → groupBy → multi-measure hash agg → sort.

    One shuffle (the groupBy), tiny group cardinality (RF×LS ≤ 6), so the
    partial agg collapses virtually all rows map-side.
    """
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            pround(F.sum("l_quantity"), 2).alias("sum_qty"),
            pround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            pround(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            pround(F.avg("l_quantity"), 4).alias("avg_qty"),
            pround(F.avg("l_extendedprice"), 4).alias("avg_price"),
            pround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0                                           AS sum_qty,
  floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0                                      AS sum_base_price,
  floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0                   AS sum_disc_price,
  floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100.0 + 0.5) / 100.0     AS sum_charge,
  floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0                                           AS avg_qty,
  floor((avg(l_extendedprice)) * 10000.0 + 0.5) / 10000.0                                      AS avg_price,
  floor((avg(l_discount)) * 10000.0 + 0.5) / 10000.0                                           AS avg_disc,
  count(*)                                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Fact ⋈ fact ⋈ dim with top-k (TPC-H Q3 shape)
# ---------------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer(dim, broadcast) ⋈ orders ⋈ lineitem, group, top-10.

    The only big shuffle is orders⋈lineitem on orderkey; customer is
    broadcast so the orders side never moves for it.  The final top-k is
    a TakeOrdered (no full sort of the aggregate output).
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1995-03-15"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT
  l_orderkey,
  o_orderdate,
  o_orderpriority,
  floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Snowflake join (TPC-H Q5 shape) — 6 tables
# ---------------------------------------------------------------------------

def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region→nation→(customer, supplier)→orders→lineitem snowflake.

    All dims broadcast; the fact-fact join (orders⋈lineitem) is the only
    shuffle; the customer-nation == supplier-nation predicate is applied
    as a join condition, not a post-filter.
    """
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT
  n_name,
  floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1994-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# Flagship: revenue by nation (entry() smoke query)
# ---------------------------------------------------------------------------

def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders ⋈ customer(bcast) ⋈ nation(bcast) → agg → sort."""
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


REVENUE_BY_NATION_SQL = """
SELECT
  n_name,
  floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue,
  count(*) AS n_lineitems
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# Semi-join (EXISTS) — TPC-H Q4 shape
# ---------------------------------------------------------------------------

def order_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join; dedups the probe side without a distinct."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1994-07-01"))
        & (F.col("o_orderdate") < F.lit("1995-10-01"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < F.lit("1998-01-01"))
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1994-07-01'
  AND o_orderdate <  TIMESTAMP '1995-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate < TIMESTAMP '1998-01-01'
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Anti-join — customers with no orders
# ---------------------------------------------------------------------------

def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# Outer join with null-handling
# ---------------------------------------------------------------------------

def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + count of possibly-absent matches (TPC-H Q13 shape).

    Two shuffles (join + first group), then a tiny re-agg on counts.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number() over (partition by customer order by price desc) ≤ 3.

    Single shuffle on custkey; the rank filter prunes before any further
    operator sees the data.  Tie-broken on o_orderkey for determinism.
    """
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", pround("o_totalprice", 2).alias("price"), "rank")
        .orderBy("o_custkey", "rank")
    )


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, floor((o_totalprice) * 100.0 + 0.5) / 100.0 AS price, rank
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
  FROM orders
) t
WHERE rank <= 3
ORDER BY o_custkey, rank
"""


def running_revenue_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per user over event time — the classic
    time-series window; rows-between unbounded-preceding..current."""
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            "ts",
            pround(F.sum("value").over(w), 2).alias("running_value"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


RUNNING_REVENUE_SQL = """
SELECT user_id, event_id, ts,
       floor((sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0
         AS running_value
FROM events
WHERE event_type = 'purchase'
ORDER BY user_id, ts, event_id
"""


def lag_lead_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() inter-event gap seconds per user — sessionization primitive."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    return (
        e.select("user_id", "event_id", "ts", gap.alias("gap_us"))
        .orderBy("user_id", "ts", "event_id")
    )


LAG_LEAD_SQL = """
SELECT user_id, event_id, ts,
       epoch_us(ts)
         - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS gap_us
FROM events
ORDER BY user_id, ts, event_id
"""


# ---------------------------------------------------------------------------
# Sorts / limits / distinct
# ---------------------------------------------------------------------------

def topk_expensive_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT — Spark plans TakeOrderedAndProject (no full sort)."""
    p = _t(spark, sf_dir, "part")
    return (
        p.select("p_partkey", "p_name", pround("p_retailprice", 2).alias("price"))
        .orderBy(F.desc("price"), "p_partkey")
        .limit(25)
    )


TOPK_PARTS_SQL = """
SELECT p_partkey, p_name, floor((p_retailprice) * 100.0 + 0.5) / 100.0 AS price
FROM part ORDER BY price DESC, p_partkey LIMIT 25
"""


def distinct_count_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — expands to a two-phase agg in Spark."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


DISTINCT_COUNT_SQL = """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_customers,
       count(*)                  AS n_orders
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.4: reference has only UNION ALL; we add all)
# ---------------------------------------------------------------------------

def nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer-vs-supplier nation keys."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    both = c.intersect(s).withColumn("set_kind", F.lit("both"))
    cust_only = c.distinct().exceptAll(s.distinct()).withColumn(
        "set_kind", F.lit("customer_only")
    )
    supp_only = s.distinct().exceptAll(c.distinct()).withColumn(
        "set_kind", F.lit("supplier_only")
    )
    return both.unionByName(cust_only).unionByName(supp_only).orderBy("set_kind", "nk")


NATION_SET_OPS_SQL = """
WITH c AS (SELECT c_nationkey AS nk FROM customer),
     s AS (SELECT s_nationkey AS nk FROM supplier)
SELECT nk, 'both' AS set_kind           FROM (SELECT nk FROM c INTERSECT SELECT nk FROM s)
UNION ALL
SELECT nk, 'customer_only' AS set_kind  FROM (SELECT DISTINCT nk FROM c EXCEPT SELECT DISTINCT nk FROM s)
UNION ALL
SELECT nk, 'supplier_only' AS set_kind  FROM (SELECT DISTINCT nk FROM s EXCEPT SELECT DISTINCT nk FROM c)
ORDER BY set_kind, nk
"""


# ---------------------------------------------------------------------------
# Scalar function showcase (string / date / math / conditional)
# ---------------------------------------------------------------------------

def scalar_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar expressions — all JVM-side, codegen'd."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.upper(F.col("o_orderstatus")).alias("status_upper"),
            F.substring(F.col("o_orderpriority"), 1, 1).alias("prio_code"),
            F.length(F.col("o_orderpriority")).cast("long").alias("prio_len"),
            F.year("o_orderdate").cast("long").alias("order_year"),
            F.month("o_orderdate").cast("long").alias("order_month"),
            # sqrt guarded on sign: Spark sqrt(negative) is NaN while
            # DuckDB raises Out of Range — NULL on both instead
            # (adversarial TPC-H fixture, round 12)
            F.when(
                F.col("o_totalprice") >= 0,
                pround(F.sqrt(F.col("o_totalprice")), 4),
            ).alias("price_sqrt"),
            F.when(F.col("o_totalprice") > 200000, F.lit("high"))
            .when(F.col("o_totalprice") > 100000, F.lit("mid"))
            .otherwise(F.lit("low"))
            .alias("price_band"),
            F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias(
                "status_prio"
            ),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


SCALAR_FUNCS_SQL = """
SELECT
  o_orderkey,
  upper(o_orderstatus)                 AS status_upper,
  substring(o_orderpriority, 1, 1)     AS prio_code,
  CAST(length(o_orderpriority) AS BIGINT) AS prio_len,
  CAST(year(o_orderdate) AS BIGINT)    AS order_year,
  CAST(month(o_orderdate) AS BIGINT)   AS order_month,
  CASE WHEN o_totalprice >= 0
       THEN floor((sqrt(o_totalprice)) * 10000.0 + 0.5) / 10000.0
  END                                  AS price_sqrt,
  CASE WHEN o_totalprice > 200000 THEN 'high'
       WHEN o_totalprice > 100000 THEN 'mid'
       ELSE 'low' END                  AS price_band,
  concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio
FROM orders
ORDER BY o_orderkey
LIMIT 1000
"""


# ---------------------------------------------------------------------------
# Grouping sets / rollup / cube (ABSENT in reference; standard OLAP surface)
# ---------------------------------------------------------------------------

def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (year, status): subtotals + grand total in one agg."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("order_year"),
            "o_orderstatus",
            "o_totalprice",
        )
        .rollup("order_year", "o_orderstatus")
        .agg(
            pround(F.sum("o_totalprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(
            F.col("order_year").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


ROLLUP_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       o_orderstatus,
       floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS total_price,
       count(*) AS n_orders
FROM orders
GROUP BY ROLLUP (order_year, o_orderstatus)
ORDER BY order_year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# Correlated scalar subquery shape (avg-comparison, TPC-H Q17 spirit)
# ---------------------------------------------------------------------------

def above_avg_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their nation's average balance — join against a
    pre-aggregated (broadcastable) per-nation average instead of a
    correlated subquery re-scan."""
    c = _t(spark, sf_dir, "customer")
    nation_avg = c.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("nation_avg"))
    return (
        c.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_above_avg"))
        .orderBy("c_nationkey")
    )


ABOVE_AVG_SQL = """
SELECT c_nationkey, count(*) AS n_above_avg
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer i
                   WHERE i.c_nationkey = c.c_nationkey)
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


SPARK_QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "revenue_by_nation": revenue_by_nation,
    "order_priority_count": order_priority_count,
    "customers_without_orders": customers_without_orders,
    "customer_order_counts": customer_order_counts,
    "top_orders_per_customer": top_orders_per_customer,
    "running_revenue_by_user": running_revenue_by_user,
    "lag_lead_event_gaps": lag_lead_event_gaps,
    "topk_expensive_parts": topk_expensive_parts,
    "distinct_count_by_group": distinct_count_by_group,
    "nation_set_ops": nation_set_ops,
    "scalar_functions_showcase": scalar_functions_showcase,
    "rollup_revenue": rollup_revenue,
    "above_avg_balance_customers": above_avg_balance_customers,
}

ORACLE_SQL = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "revenue_by_nation": REVENUE_BY_NATION_SQL,
    "order_priority_count": ORDER_PRIORITY_SQL,
    "customers_without_orders": CUSTOMERS_WITHOUT_ORDERS_SQL,
    "customer_order_counts": CUSTOMER_ORDER_COUNTS_SQL,
    "top_orders_per_customer": TOP_ORDERS_PER_CUSTOMER_SQL,
    "running_revenue_by_user": RUNNING_REVENUE_SQL,
    "lag_lead_event_gaps": LAG_LEAD_SQL,
    "topk_expensive_parts": TOPK_PARTS_SQL,
    "distinct_count_by_group": DISTINCT_COUNT_SQL,
    "nation_set_ops": NATION_SET_OPS_SQL,
    "scalar_functions_showcase": SCALAR_FUNCS_SQL,
    "rollup_revenue": ROLLUP_SQL,
    "above_avg_balance_customers": ABOVE_AVG_SQL,
}
