"""TPC-H fill-in queries (Q2/Q4/Q8/Q9/Q11/Q13/Q16/Q20/Q21 shapes) adapted
to the synthetic schema — completing dedicated coverage of all 22 TPC-H
query shapes across this module and plans/relational*.py.

The driver's test tables carry no ``partsupp`` table and ``lineitem`` has
no ``l_commitdate``/``l_receiptdate``, so the queries that need them are
re-expressed on what exists while keeping each one's *plan shape* — the
point of TPC-H coverage is exercising the optimizer patterns
(min-per-group joins, market-share conditional ratios, double-correlated
EXISTS), not the retail semantics:

* ``q2_min_cost_supplier``  — min-per-group + join-back (Q2's correlated
  MIN subquery, decorrelated); supply cost proxied by the cheapest
  observed unit price ``min(l_extendedprice / l_quantity)`` per
  (part, supplier) pair from lineitem.
* ``q8_market_share``       — two-role nation join (customer nation vs
  supplier nation) + conditional-ratio aggregate per year.  Revenue is
  accumulated as exact integer ten-thousandths so the share division is
  bit-identical across engines.
* ``q9_product_profit``     — profit per (supplier-nation, year) with
  cost proxied as ``0.1 * p_retailprice * l_quantity``.
* ``q11_important_parts``   — group, then filter against a scalar
  aggregate over the same derived table (value-share threshold).
* ``q16_supplier_part_counts`` — COUNT(DISTINCT suppliers) per part
  attribute triple with NOT-IN style exclusions, supplier↔part
  relationship derived from lineitem.
* ``q20_excess_suppliers``  — nested semi-join chain: suppliers that
  shipped >30 % of some part's 1996 volume.
* ``q21_waiting_suppliers`` — double-correlated EXISTS / NOT EXISTS
  (the only supplier with returned lines in a multi-supplier order),
  decorrelated into one per-order distinct-count aggregate.
* ``q4_order_priority``     — EXISTS semi-join with a cross-table
  predicate ("late" line), priority rollup; lateness proxied as
  shipped >60 days after order date (no commit/receipt dates).
* ``q13_customer_distribution`` — customer⟕orders double aggregation
  keeping the zero-order bucket; the comment-pattern exclusion
  proxied by order priority.

Reference parity note: the reference repo (``/root/reference``) has no
joins at all (SURVEY.md §2.5) — this module is part of the beyond-
reference relational surface required by the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.functions.portable import pround


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _cents4(col):
    """Exact integer ten-thousandths: floor(x*10000+0.5) as long.

    Source prices have ≤2 decimals and discounts 2, so x has ≤4 decimal
    digits; the scaled value is integral up to rounding noise and the
    long sum is exact and associative — the same reduction in any order
    on any engine yields the identical integer (see functions/portable).
    """
    return F.floor(col * F.lit(10000.0) + F.lit(0.5)).cast("long")


_CENTS4_SQL = "CAST(floor(({expr}) * 10000.0 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# Q2 shape: min-cost supplier per part (min-per-group + join back)
# ---------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For LARGE parts of size ≥ 40, the EUROPE supplier(s) offering the
    minimum observed unit price.  Q2's correlated ``= (SELECT min(..))``
    decorrelated: compute min per part once, join back on equality.

    Scale: part/supplier stay dim-sized → broadcast; the only shuffle is
    the (partkey, suppkey) aggregation of lineitem, which AQE coalesces.
    """
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") >= 40)
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    unit_cost = (
        l.join(F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(eur_supp), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost"))
    )
    min_cost = unit_cost.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        unit_cost.join(
            F.broadcast(min_cost),
            (F.col("p_partkey") == F.col("mk"))
            & (F.col("supply_cost") == F.col("min_cost")),
        )
        .select(
            pround("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            pround("supply_cost", 4).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


Q2_SQL = """
WITH eur_supp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
unit_cost AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name,
         min(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN eur_supp ON l_suppkey = s_suppkey
  WHERE p_type = 'LARGE' AND p_size >= 40
  GROUP BY p_partkey, s_suppkey, s_name, s_acctbal, n_name
)
SELECT floor((s_acctbal) * 100.0 + 0.5) / 100.0 AS s_acctbal,
       s_name, n_name, p_partkey,
       floor((supply_cost) * 10000.0 + 0.5) / 10000.0 AS supply_cost
FROM unit_cost u
WHERE supply_cost = (SELECT min(supply_cost) FROM unit_cost i
                     WHERE i.p_partkey = u.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q8 shape: national market share (two-role nation join, conditional ratio)
# ---------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3's share of ECONOMY-part revenue sold to AMERICA customers
    per year.  ``nation`` joins twice in different roles (customer's vs
    supplier's); revenue is summed as exact integer ten-thousandths so
    the final division is engine-independent.

    Scale: customer/supplier/nation/region/part all broadcast; the one
    big shuffle is lineitem⋈orders on orderkey, then a tiny per-year agg.
    """
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31"))
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = _cents4(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("vol"),
            F.when(F.col("supp_nation") == "NATION_3", vol)
            .otherwise(F.lit(0))
            .alias("nat_vol"),
        )
        .groupBy("o_year")
        .agg(
            pround(F.sum("nat_vol") / F.sum("vol"), 6).alias("mkt_share"),
            (F.sum("vol") / F.lit(10000.0)).alias("total_volume"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       floor((sum(CASE WHEN n2.n_name = 'NATION_3'
                  THEN {_CENTS4_SQL.format(expr='l_extendedprice * (1 - l_discount)')}
                  ELSE 0 END) * 1.0
             / sum({_CENTS4_SQL.format(expr='l_extendedprice * (1 - l_discount)')}))
             * 1000000.0 + 0.5) / 1000000.0 AS mkt_share,
       sum({_CENTS4_SQL.format(expr='l_extendedprice * (1 - l_discount)')}) / 10000.0
         AS total_volume
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA'
  AND p_type = 'ECONOMY'
  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q9 shape: product-type profit by supplier nation and year
# ---------------------------------------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per (supplier nation, year) on STANDARD parts; the
    ``ps_supplycost`` the schema lacks is proxied as
    ``0.1 * p_retailprice`` per unit.  Amounts accumulate as exact
    integer ten-thousandths (see ``_cents4``).
    """
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    amount = _cents4(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg((F.sum("amount") / F.lit(10000.0)).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       sum({_CENTS4_SQL.format(
           expr='l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity')}
       ) / 10000.0 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'STANDARD'
GROUP BY 1, 2
ORDER BY 1, 2 DESC
"""


# ---------------------------------------------------------------------------
# Q11 shape: important parts (group + scalar-subquery threshold)
# ---------------------------------------------------------------------------

def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose traded value through NATION_7 suppliers exceeds 0.1 %
    of the nation's total — Q11's HAVING-vs-scalar-subquery shape.  The
    threshold side is a 1-row aggregate broadcast into the filter.
    """
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nat_lines = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("l_partkey", _cents4(F.col("l_extendedprice")).alias("val"))
    )
    per_part = nat_lines.groupBy("l_partkey").agg(F.sum("val").alias("val_cents"))
    threshold = per_part.agg(
        (F.sum("val_cents") * F.lit(0.001)).alias("cut")
    )
    return (
        per_part.join(F.broadcast(threshold))
        .filter(F.col("val_cents") > F.col("cut"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("val_cents") / F.lit(10000.0)).alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


Q11_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
         sum({_CENTS4_SQL.format(expr='l_extendedprice')}) AS val_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, val_cents / 10000.0 AS part_value
FROM per_part
WHERE val_cents > (SELECT sum(val_cents) * 0.001 FROM per_part)
ORDER BY part_value DESC, p_partkey
"""


# ---------------------------------------------------------------------------
# Q16 shape: supplier counts per part attribute triple
# ---------------------------------------------------------------------------

def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT supplier) per (brand, type, size) over the
    lineitem-derived part↔supplier relationship, excluding one brand and
    one type (Q16's NOT-IN exclusions).  Expands to Spark's two-phase
    distinct aggregate; the relationship dedup happens map-side first.
    """
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 7, 10, 15, 23, 45, 50))
    )
    return (
        l.select("l_partkey", "l_suppkey")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 7, 10, 15, 23, 45, 50)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q20 shape: suppliers with an outsized share of a part's volume
# ---------------------------------------------------------------------------

def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_1 suppliers that shipped more than 30 % of some part's total
    1996 quantity — Q20's nested semi-join chain with the availqty
    threshold re-expressed against per-part totals.  Quantities are
    integral doubles, so the sums are exact.
    """
    l96 = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    pair_qty = l96.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("pair_qty")
    )
    part_qty = l96.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("l_quantity").alias("part_qty")
    )
    heavy = (
        pair_qty.join(part_qty, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("pair_qty") > F.lit(0.3) * F.col("part_qty"))
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_partkey, l_suppkey
    HAVING sum(l_quantity) > 0.3 * (
      SELECT sum(l_quantity) FROM lineitem i
      WHERE i.l_partkey = lineitem.l_partkey
        AND i.l_shipdate >= TIMESTAMP '1996-01-01'
        AND i.l_shipdate <  TIMESTAMP '1997-01-01'
    )
  )
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q21 shape: double-correlated EXISTS / NOT EXISTS
# ---------------------------------------------------------------------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers from NATION_2 that were the ONLY supplier with returned
    ('R') lines in a multi-supplier finished order — Q21's
    EXISTS(other supplier) AND NOT EXISTS(other failing supplier)
    decorrelated into one per-order distinct-count aggregate (one
    shuffle on orderkey instead of two correlated re-scans).
    """
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    per_order = l.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_r_supp"),
    )
    flagged = per_order.filter((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(o, l.l_orderkey == o.o_orderkey, "left_semi")
        .join(flagged, l.l_orderkey == F.col("ok"), "left_semi")
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n_name = 'NATION_2'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q4 shape: priority counts over an EXISTS semi-join (late lineitems)
# ---------------------------------------------------------------------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — orders per priority in one quarter having at
    least one LATE line item.  The schema carries no
    commit/receipt dates, so "late" is proxied as a line shipped more
    than 60 days after the order date; the plan shape is the point:
    a date-filtered order scan semi-joined (EXISTS, never a fan-out
    join + distinct) against lineitem with a cross-table predicate,
    then a priority rollup.

    Scale: the semi-join shuffles on orderkey once; the EXISTS form
    keeps it one row per qualifying order regardless of how many lines
    are late — the fan-out-then-distinct rewrite would shuffle |late
    lines| rows instead.
    """
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    l = _t(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (o.o_orderkey == l.l_orderkey)
        & (l.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q13 shape: customer order-count distribution (outer join + double agg)
# ---------------------------------------------------------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 — how many customers placed exactly N qualifying
    orders, INCLUDING the zero-order customers (the part an inner join
    silently drops).  Qualifying excludes '1-URGENT' priority (standing
    in for Q13's comment-pattern exclusion).

    Plan shape: customer LEFT OUTER orders (count(o_orderkey) counts
    only matched rows, so childless customers land in the N=0 bucket),
    then a second aggregation over the per-customer counts.  Both
    aggregations are map-side combinable; the outer join shuffles on
    custkey once — at 100 TB the orders side pre-aggregates to
    (custkey, count) BEFORE the join, which is what grouping on the
    join key lets AQE/Catalyst do here.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


SPARK_QUERIES = {
    "q4_order_priority": q4_order_priority,
    "q13_customer_distribution": q13_customer_distribution,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

ORACLE_SQL = {
    "q4_order_priority": Q4_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q20_excess_suppliers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
}
