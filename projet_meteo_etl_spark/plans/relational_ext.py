"""Extended relational coverage (TPC-H shapes adapted to the synthetic
schema — the test tables carry a column subset, so queries needing
``partsupp``/``l_shipmode``/``c_phone`` are re-expressed on what exists).

Each query demonstrates a distinct plan shape and is oracle-checked:

* ``q6_forecast_revenue``  — pure filter+agg; every predicate reaches the
  parquet reader (check ``PushedFilters`` in explain), zero joins.
* ``q7_supplier_nation_volume`` — fact ⋈ dim ⋈ dim with broadcast dims,
  group by (nation, year).
* ``q10_returned_items``   — revenue per customer over a filtered fact,
  deterministic top-20 (rounded measure, key tie-break).
* ``q12_priority_by_returnflag`` — join + conditional (CASE) aggregates.
* ``q14_promo_revenue``    — scalar percentage from two conditional sums
  in ONE pass (the reference's multi-scan anti-pattern, fused).
* ``q18_large_orders``     — GROUP BY + HAVING as post-agg filter, then
  join back to dims.
* ``q19_bracket_predicates`` — OR of conjunctive brackets; Catalyst
  extracts the common join key so it stays an equi-join with residual.
* ``q22_idle_customers``   — scalar subquery (global avg) broadcast into
  a filter + anti join, grouped output.
* ``orders_above_customer_avg`` — correlated scalar subquery decorrelated
  into a window average.
* ``order_status_pivot``   — relational PIVOT via first-class API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.functions.portable import pround


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            pround(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q6_SQL = """
SELECT floor((sum(l_extendedprice * l_discount)) * 100.0 + 0.5) / 100.0 AS revenue,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


def q7_supplier_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("supp_nation"),
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("volume")
        )
        .orderBy("supp_nation", "l_year")
    )


Q7_SQL = """
SELECT n_name AS supp_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS volume
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
GROUP BY 1, 2
ORDER BY supp_nation, l_year
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-07-01"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            pround(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                * 100.0
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = """
SELECT floor((sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
             * 100.0 / sum(l_extendedprice * (1 - l_discount))) * 1000000.0 + 0.5) / 1000000.0
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1996-07-01'
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(pround(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            pround("o_totalprice", 2).alias("o_price"),
            "total_qty",
        )
        .orderBy(F.desc("o_price"), "o_orderkey")
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       floor((o_totalprice) * 100.0 + 0.5) / 100.0 AS o_price,
       total_qty
FROM (
  SELECT l_orderkey, floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 > 150
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_price DESC, o_orderkey
"""


def q19_bracket_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    joined = l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
    bracket = (
        (
            (F.col("p_brand") == "Brand#11")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 30))
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity").between(20, 40))
        )
    )
    return joined.filter(bracket).agg(
        pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q19_SQL = """
SELECT floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("a"))
        .select("a")
    )
    recent = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01"))
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            pround(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
        .orderBy("c_mktsegment")
    )


Q22_SQL = """
SELECT c_mktsegment, count(*) AS n_custs,
       floor((sum(c_acctbal)) * 100.0 + 0.5) / 100.0 AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1998-01-01')
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (each order vs its customer's average
    order price), decorrelated into a window aggregate — one shuffle on
    the correlation key instead of a per-row subquery."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    enriched = o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.avg("o_totalprice").over(w).alias("cust_avg"),
        F.count(F.lit(1)).over(w).alias("n_orders"),
    )
    return (
        enriched.filter(
            (F.col("o_totalprice") > F.col("cust_avg") * 1.5) & (F.col("n_orders") >= 3)
        )
        .select(
            "o_custkey",
            "o_orderkey",
            pround("o_totalprice", 2).alias("price"),
            pround("cust_avg", 4).alias("cust_avg"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


ORDERS_ABOVE_AVG_SQL = """
WITH e AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg,
         count(*) OVER (PARTITION BY o_custkey) AS n_orders
  FROM orders
)
SELECT o_custkey, o_orderkey,
       floor((o_totalprice) * 100.0 + 0.5) / 100.0 AS price,
       floor((cust_avg) * 10000.0 + 0.5) / 10000.0 AS cust_avg
FROM e
WHERE o_totalprice > cust_avg * 1.5 AND n_orders >= 3
ORDER BY o_custkey, o_orderkey
"""


def order_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational PIVOT: order counts per year × status with explicit
    pivot values (explicit list → no extra distinct-values job)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(F.year("o_orderdate").cast("long").alias("order_year"), "o_orderstatus")
        .groupBy("order_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
        .select(
            "order_year",
            F.col("F").alias("n_f"),
            F.col("O").alias("n_o"),
            F.col("P").alias("n_p"),
        )
        .orderBy("order_year")
    )


ORDER_STATUS_PIVOT_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
FROM orders
GROUP BY 1
ORDER BY order_year
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: per-supplier revenue over a quarter, then the
    supplier(s) achieving the GLOBAL max — a scalar subquery over a
    derived aggregate (all ties returned, deterministic)."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = (
        l.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("m"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("m"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of their part's average quantity — correlated aggregate
    decorrelated into a groupBy + join (the per-part avg is computed
    once, not per probe row)."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    part_avg = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(part_avg, l.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            pround(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q17_SQL = """
SELECT floor((sum(l_extendedprice) / 7.0) * 10000.0 + 0.5) / 10000.0 AS avg_yearly,
       count(*) AS n_lines
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#11'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


def modern_aggregates_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern aggregate vocabulary in one pass: median, mode, min_by/
    max_by, count_if, bool_and/bool_or — per order status.

    ``mode`` runs with ``deterministic=True`` (ties → lowest value):
    frequency ties are real in the data (seen at sf0.001) and the
    default tie-break is partition-order-dependent, which flips the
    oracle hash.  The DuckDB side mirrors the same min-of-modal rule
    explicitly.  min_by/max_by stay plain: o_totalprice min/max ties
    within a status were checked absent at sf0.001/0.01/0.1."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.median("o_totalprice"), 4).alias("median_price"),
            F.mode("o_orderpriority", deterministic=True).alias("modal_priority"),
            F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
            F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
            F.count_if(F.col("o_totalprice") > 200000.0).alias("n_large"),
            F.bool_and(F.col("o_totalprice") > 0.0).alias("all_positive"),
            F.bool_or(F.col("o_orderpriority") == "1-URGENT").alias("any_urgent"),
        )
        .orderBy("o_orderstatus")
    )


MODERN_AGGS_SQL = """
WITH freq AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS c
  FROM orders GROUP BY 1, 2
),
modal AS (
  SELECT o_orderstatus, min(o_orderpriority) AS modal_priority
  FROM freq f
  WHERE c = (SELECT max(c) FROM freq f2
             WHERE f2.o_orderstatus = f.o_orderstatus)
  GROUP BY 1
),
base AS (
  SELECT o_orderstatus,
         count(*) AS n,
         floor((median(o_totalprice)) * 10000.0 + 0.5) / 10000.0 AS median_price,
         arg_min(o_orderkey, o_totalprice) AS cheapest_order,
         arg_max(o_orderkey, o_totalprice) AS priciest_order,
         count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_large,
         bool_and(o_totalprice > 0.0) AS all_positive,
         bool_or(o_orderpriority = '1-URGENT') AS any_urgent
  FROM orders
  GROUP BY o_orderstatus
)
SELECT base.*, modal.modal_priority
FROM base JOIN modal USING (o_orderstatus)
ORDER BY o_orderstatus
"""


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE: all 4 grouping combinations of (year, status) in
    one pass — Spark expands grouping sets before the hash agg, so it
    stays a single shuffle."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").cast("long").alias("order_year"), "o_orderstatus", "o_totalprice"
        )
        .cube("order_year", "o_orderstatus")
        .agg(
            pround(F.sum("o_totalprice"), 2).alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(
            F.col("order_year").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


CUBE_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       o_orderstatus,
       floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS total_price,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE (order_year, o_orderstatus)
ORDER BY order_year ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""


def salted_skew_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting for skewed keys: events has only 5 event_type values, so
    a naive groupBy lands everything on 5 reducers.  Phase 1 groups by
    (key, salt) — 16× the parallelism — phase 2 merges the partials.
    Values accumulate in integer cents so the two-phase sum is exactly
    the one-phase sum (hash-checked against a plain GROUP BY oracle:
    salting is a physical rewrite, never a semantic one).
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    phase1 = (
        e.select("event_type", cents.alias("cents"), F.pmod(F.hash("event_id"), F.lit(16)).alias("salt"))
        .groupBy("event_type", "salt")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("c"))
    )
    return (
        phase1.groupBy("event_type")
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("c") / 100.0).alias("total_value"),
        )
        .orderBy("event_type")
    )


SALTED_AGG_SQL = """
SELECT event_type, count(*) AS n_events,
       sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


#: salt fan-out for the skew-join rewrite — the small side is
#: replicated this many times, so keep it modest (8× a dim table).
JOIN_SALTS = 8


def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting for a skewed JOIN key (the companion of
    ``salted_skew_aggregation``, which salts a grouping key).

    events→user segments: every event joins a 5-row segment dim on
    ``event_type`` — 5 distinct join keys, so a plain shuffle join
    lands all 10⁵…10¹² rows on 5 reducers.  The rewrite: the fact side
    gets a deterministic salt (``pmod(hash(event_id), 8)``), the dim
    side is exploded ×8 (one copy per salt), and the join key becomes
    (event_type, salt) — 40 evenly-loaded reducers.  Salting is a
    physical rewrite only: the oracle joins unsalted and must hash
    identically.  (AQE's ``skewJoin`` does this rewrite adaptively for
    sort-merge joins; the manual form works for any join and documents
    the mechanics.  For a dim this small a broadcast join is the real
    answer — the demo disables broadcast via the salt explode being a
    generator, and the point is the technique at dims too big to
    broadcast.)

    Revenue by segment tier: per-tier event count and total value in
    exact cents.
    """
    e = load_table(spark, sf_dir, "events")
    seg = spark.createDataFrame(
        [
            ("click", "engage"),
            ("view", "engage"),
            ("purchase", "convert"),
            ("error", "fault"),
            ("signup", "acquire"),
        ],
        "event_type string, tier string",
    )
    salted_dim = seg.select(
        "event_type",
        "tier",
        F.explode(F.sequence(F.lit(0), F.lit(JOIN_SALTS - 1))).alias("salt"),
    )
    salted_fact = e.select(
        "event_type",
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
        F.pmod(F.hash("event_id"), F.lit(JOIN_SALTS)).alias("salt"),
    )
    return (
        salted_fact.join(salted_dim, ["event_type", "salt"])
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("cents") / 100.0).alias("total_value"),
        )
        .orderBy("tier")
    )


SALTED_JOIN_SQL = """
WITH seg(event_type, tier) AS (
  VALUES ('click', 'engage'), ('view', 'engage'), ('purchase', 'convert'),
         ('error', 'fault'), ('signup', 'acquire')
)
SELECT tier, count(*) AS n_events,
       sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS total_value
FROM events JOIN seg USING (event_type)
GROUP BY tier
ORDER BY tier
"""


def lineitem_sample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10 % Bernoulli sample via a portable hash of the primary key
    (md5-prefix of ``orderkey-linenumber``, keep ``h % 10 == 0``).

    Engine RNG streams (``TABLESAMPLE`` / ``df.sample(seed)``) are not
    only engine-specific, they are PARTITIONING-specific — Spark seeds
    per-partition, so the same seed selects different rows after a
    repartition or a file-split change.  Hash sampling fixes both: the
    selected set is a pure function of the data, reproducible on any
    engine at any cluster size (what a 100 TB curation pipeline needs
    for resumable/auditable sampling), and therefore oracle-exact.
    """
    l = _t(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    s = l.filter(h % 10 == 0)
    return s.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        pround(F.avg("l_quantity"), 2).alias("avg_qty"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


LINEITEM_SAMPLE_SQL = """
SELECT count(*) AS n_sampled,
       floor((avg(l_quantity)) * 100.0 + 0.5) / 100.0 AS avg_qty,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem
WHERE ('0x' || substr(md5(l_orderkey || '-' || l_linenumber), 1, 15))::BIGINT % 10 = 0
"""


#: rows one task should own after salting, and the salt-factor ceiling
SALT_TARGET_ROWS = 8192
SALT_MAX = 32


def salt_factor_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigation advisor: per join key (event_type), the salt
    factor a salted join/aggregation should use — ``ceil(key_rows /
    SALT_TARGET_ROWS)`` capped at ``SALT_MAX`` — plus the key's row
    share and a skew flag (key > 4× the mean key size).  This is the
    measurement pass that turns ad-hoc salting (see
    ``salted_skew_join``) into a data-driven plan; at 100 TB it runs as
    one map-side-combinable aggregate over the fact table and a 1-row
    broadcast for the mean.
    """
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_rows"))
    tot = per.agg(
        F.sum("n_rows").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_rows",
            F.expr(
                "CAST(CAST(n_rows AS DECIMAL(38,0)) * 1000000"
                " DIV total_rows AS BIGINT)"
            ).alias("share_ppm"),
            F.least(
                F.lit(SALT_MAX),
                F.expr(f"(n_rows + {SALT_TARGET_ROWS} - 1) DIV {SALT_TARGET_ROWS}"),
            )
            .cast("long")
            .alias("salt_factor"),
            (F.col("n_rows") * F.col("n_keys") > F.col("total_rows") * 4).alias(
                "is_skewed"
            ),
        )
        .orderBy("event_type")
    )


SALT_ADVISOR_SQL = f"""
WITH per AS (
  SELECT event_type, count(*) AS n_rows FROM events GROUP BY event_type
),
tot AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS total_rows,
         CAST(count(*) AS BIGINT) AS n_keys
  FROM per
)
SELECT event_type, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(CAST(n_rows AS HUGEINT) * 1000000 // total_rows AS BIGINT)
         AS share_ppm,
       least({SALT_MAX}, (n_rows + {SALT_TARGET_ROWS} - 1) // {SALT_TARGET_ROWS})
         AS salt_factor,
       n_rows * n_keys > total_rows * 4 AS is_skewed
FROM per, tot
ORDER BY event_type
"""


def hhi_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman supplier-concentration index per nation —
    the market-structure diagnostic a sourcing/risk team runs: a
    nation whose revenue is one supplier is a single point of failure
    regardless of its volume.

    Revenue stays integral end-to-end in cent-percent units
    (``price_cents · (100 − discount_pct)``) so the per-supplier sums
    are order-independent; shares are ppm-floored integers and
    HHI = Σ share_ppm² DIV 1e6 (0..1e6 scale, 1e6 = monopoly).  Plan:
    one map-combinable (nation, supplier) aggregate of the fact table
    with the supplier dim broadcast, then |nations|-sized arithmetic.
    """
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    rev = F.expr(
        "CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(38,0))"
        " * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"
    )
    supp_rev = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "s_suppkey")
        .agg(F.sum(rev).alias("rev"))
    )
    totals = supp_rev.groupBy("n_name").agg(
        F.sum("rev").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_suppliers"),
    )
    shares = supp_rev.join(F.broadcast(totals), "n_name").select(
        "n_name",
        "n_suppliers",
        F.expr(
            "CAST(CAST(rev AS DECIMAL(38,0)) * 1000000"
            " DIV total AS DECIMAL(38,0))"
        ).alias(
            "share_ppm"
        ),
    )
    return (
        shares.groupBy("n_name")
        .agg(
            F.max("n_suppliers").alias("n_suppliers"),
            F.max("share_ppm").cast("long").alias("top_share_ppm"),
            F.expr(
                "CAST(sum(share_ppm * share_ppm) DIV 1000000 AS BIGINT)"
            ).alias("hhi_ppm"),
        )
        .orderBy("n_name")
    )


HHI_SQL = """
WITH supp_rev AS (
  SELECT n_name, s_suppkey,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)
             * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
           AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  GROUP BY 1, 2
),
totals AS (
  SELECT n_name, sum(rev) AS total,
         CAST(count(*) AS BIGINT) AS n_suppliers
  FROM supp_rev GROUP BY 1
),
shares AS (
  SELECT s.n_name, t.n_suppliers,
         CAST(CAST(s.rev AS HUGEINT) * 1000000 // t.total AS BIGINT)
           AS share_ppm
  FROM supp_rev s JOIN totals t USING (n_name)
)
SELECT n_name, max(n_suppliers) AS n_suppliers,
       CAST(max(share_ppm) AS BIGINT) AS top_share_ppm,
       CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_ppm
FROM shares
GROUP BY n_name
ORDER BY n_name
"""


def abc_inventory_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC classification of the sold-part catalog: class A = parts
    covering the first 80% of cumulative revenue, B to 95%, C the long
    tail — the Pareto cut inventory and assortment planning starts
    from.

    Revenue is exact cent-percent integers; the cumulative share cuts
    are cross-multiplied (``cum·100 ≤ total·80``) so no ratio is ever
    floated.  The running sum orders by (revenue DESC, partkey) over
    the PART CATALOG aggregate — a domain-bounded relation
    (allowlisted in ``tests/test_window_lint.py``), never the fact
    table.
    """
    l = _t(spark, sf_dir, "lineitem")
    rev = F.expr(
        "CAST(floor(l_extendedprice * 100 + 0.5) AS DECIMAL(38,0))"
        " * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))"
    )
    part_rev = l.groupBy("l_partkey").agg(F.sum(rev).alias("rev"))
    tot = part_rev.agg(F.sum("rev").alias("total"))
    w = Window.orderBy(F.desc("rev"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    classed = (
        part_rev.withColumn("cum", F.sum("rev").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "rev",
            F.expr(
                "CASE WHEN cum * 100 <= total * 80 THEN 'A'"
                " WHEN cum * 100 <= total * 95 THEN 'B'"
                " ELSE 'C' END"
            ).alias("abc_class"),
            "total",
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.expr("CAST(sum(rev) AS BIGINT)").alias("rev_centpct"),
            F.expr(
                "CAST(CAST(sum(rev) AS DECIMAL(38,0)) * 1000000"
                " DIV max(total) AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy("abc_class")
    )


ABC_SQL = """
WITH part_rev AS (
  SELECT l_partkey,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)
             * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
           AS rev
  FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(rev) AS total FROM part_rev),
classed AS (
  SELECT rev, t.total,
         CASE WHEN sum(rev) OVER (ORDER BY rev DESC, l_partkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100
                <= t.total * 80 THEN 'A'
              WHEN sum(rev) OVER (ORDER BY rev DESC, l_partkey ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100
                <= t.total * 95 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM part_rev, tot t
)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev) AS BIGINT) AS rev_centpct,
       CAST(CAST(sum(rev) AS HUGEINT) * 1000000 // max(total) AS BIGINT)
         AS share_ppm
FROM classed
GROUP BY abc_class
ORDER BY abc_class
"""


SPARK_QUERIES = {
    "q6_forecast_revenue": q6_forecast_revenue,
    "salt_factor_advisor": salt_factor_advisor,
    "q7_supplier_nation_volume": q7_supplier_nation_volume,
    "q10_returned_items": q10_returned_items,
    "q12_priority_by_returnflag": q12_priority_by_returnflag,
    "q14_promo_revenue": q14_promo_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_bracket_predicates": q19_bracket_predicates,
    "q22_idle_customers": q22_idle_customers,
    "orders_above_customer_avg": orders_above_customer_avg,
    "order_status_pivot": order_status_pivot,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "modern_aggregates_showcase": modern_aggregates_showcase,
    "cube_revenue": cube_revenue,
    "salted_skew_aggregation": salted_skew_aggregation,
    "salted_skew_join": salted_skew_join,
    "lineitem_sample_stats": lineitem_sample_stats,
    "hhi_supplier_concentration": hhi_supplier_concentration,
    "abc_inventory_classes": abc_inventory_classes,
}

ORACLE_SQL = {
    "q6_forecast_revenue": Q6_SQL,
    "salt_factor_advisor": SALT_ADVISOR_SQL,
    "q7_supplier_nation_volume": Q7_SQL,
    "q10_returned_items": Q10_SQL,
    "q12_priority_by_returnflag": Q12_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_bracket_predicates": Q19_SQL,
    "q22_idle_customers": Q22_SQL,
    "orders_above_customer_avg": ORDERS_ABOVE_AVG_SQL,
    "order_status_pivot": ORDER_STATUS_PIVOT_SQL,
    "q15_top_supplier": Q15_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "modern_aggregates_showcase": MODERN_AGGS_SQL,
    "cube_revenue": CUBE_SQL,
    "salted_skew_aggregation": SALTED_AGG_SQL,
    "salted_skew_join": SALTED_JOIN_SQL,
    "lineitem_sample_stats": LINEITEM_SAMPLE_SQL,
    "hhi_supplier_concentration": HHI_SQL,
    "abc_inventory_classes": ABC_SQL,
}
