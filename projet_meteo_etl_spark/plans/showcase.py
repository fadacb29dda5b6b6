"""Function-surface showcases: ranking windows, GROUPING SETS, and
complex-type (array/struct) expressions — each a single oracle-checked
query exercising a family of built-ins end-to-end.

These exist so a user of the reference switching to this engine finds
the full scalar/window/grouping vocabulary already wired through the
correctness gate, not just the operators the reference happened to use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table, unique_view
from projet_meteo_etl_spark.functions.portable import pround


def ranking_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every SQL ranking/distribution function in one windowed pass over
    customers per market segment (deterministic ordering key)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            pround("c_acctbal", 2).alias("acctbal"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            pround(F.percent_rank().over(w), 6).alias("prnk"),
            pround(F.cume_dist().over(w), 6).alias("cd"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
        )
        .filter(F.col("rn") <= 50)
        .orderBy("c_mktsegment", "rn")
    )


RANKING_SQL = """
SELECT * FROM (
  SELECT c_mktsegment, c_custkey,
         floor((c_acctbal) * 100.0 + 0.5) / 100.0 AS acctbal,
         row_number()  OVER w AS rn,
         rank()        OVER w AS rnk,
         dense_rank()  OVER w AS drnk,
         floor((percent_rank() OVER w) * 1000000.0 + 0.5) / 1000000.0 AS prnk,
         floor((cume_dist()    OVER w) * 1000000.0 + 0.5) / 1000000.0 AS cd,
         ntile(4)      OVER w AS quartile
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
)
WHERE rn <= 50
ORDER BY c_mktsegment, rn
"""


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with ``grouping_id`` disambiguation —
    three aggregation granularities in one shuffle (via Spark SQL; the
    DataFrame API exposes only rollup/cube)."""
    view = unique_view("orders_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(view)
    out = spark.sql(
        f"""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
               o_orderpriority,
               CAST(grouping_id(year(o_orderdate), o_orderpriority) AS BIGINT) AS gid,
               -- 100.0D: plain decimal literals are DECIMAL-typed in
               -- Spark SQL, which would make the division DECIMAL too
               floor((sum(o_totalprice)) * 100.0D + 0.5D) / 100.0D AS total_price,
               count(*) AS n_orders
        FROM {view}
        GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderpriority), ())
        ORDER BY gid, order_year NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )
    spark.catalog.dropTempView(view)
    return out


GROUPING_SETS_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
       o_orderpriority,
       CAST(grouping(year(o_orderdate)) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
       floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS total_price,
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate)), (o_orderpriority), ())
ORDER BY gid, order_year NULLS FIRST, o_orderpriority NULLS FIRST
"""


def array_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-type pipeline: per-order sorted quantity array, then
    higher-order functions over it (filter/transform/aggregate), array
    slicing, and element access — the nested-data vocabulary."""
    l = load_table(spark, sf_dir, "lineitem")
    per_order = (
        l.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list(F.col("l_quantity").cast("long"))).alias("qtys"))
        .filter(F.size("qtys") >= 4)
    )
    return (
        per_order.select(
            "l_orderkey",
            F.size("qtys").cast("long").alias("n_lines"),
            F.element_at("qtys", 1).alias("min_qty"),
            F.element_at("qtys", -1).alias("max_qty"),
            F.size(F.filter("qtys", lambda q: q >= 25)).cast("long").alias("n_big"),
            F.aggregate("qtys", F.lit(0).cast("long"), lambda acc, q: acc + q).alias(
                "sum_qty"
            ),
            F.slice("qtys", 1, 3).alias("first3"),
            F.array_distinct("qtys").alias("distinct_qtys"),
        )
        .select(
            "l_orderkey",
            "n_lines",
            "min_qty",
            "max_qty",
            "n_big",
            "sum_qty",
            F.size("distinct_qtys").cast("long").alias("n_distinct"),
            F.aggregate("first3", F.lit(0).cast("long"), lambda a, q: a + q).alias(
                "sum_first3"
            ),
        )
        .orderBy("l_orderkey")
    )


ARRAY_FUNCS_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         list_sort(list(CAST(l_quantity AS BIGINT))) AS qtys
  FROM lineitem GROUP BY l_orderkey
  HAVING len(list(l_quantity)) >= 4
)
SELECT l_orderkey,
       CAST(len(qtys) AS BIGINT) AS n_lines,
       qtys[1] AS min_qty,
       qtys[-1] AS max_qty,
       CAST(len(list_filter(qtys, q -> q >= 25)) AS BIGINT) AS n_big,
       CAST(list_sum(qtys) AS BIGINT) AS sum_qty,
       CAST(len(list_distinct(qtys)) AS BIGINT) AS n_distinct,
       CAST(coalesce(list_sum(qtys[1:3]), 0) AS BIGINT) AS sum_first3
FROM per_order
ORDER BY l_orderkey
"""


def sql_interface_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL front door: catalog tables registered as views,
    the query submitted as SQL TEXT via ``spark.sql`` — same Catalyst
    plan as the DataFrame variant of Q1 (identical oracle), proving the
    two APIs are interchangeable entry points."""
    from projet_meteo_etl_spark.catalog import load_tables

    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        SELECT
          l_returnflag,
          l_linestatus,
          floor((sum(l_quantity)) * 100.0D + 0.5D) / 100.0D        AS sum_qty,
          floor((sum(l_extendedprice)) * 100.0D + 0.5D) / 100.0D   AS sum_base_price,
          floor((avg(l_discount)) * 10000.0D + 0.5D) / 10000.0D    AS avg_disc,
          count(*)                                                 AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )


SQL_INTERFACE_Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0        AS sum_qty,
  floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0   AS sum_base_price,
  floor((avg(l_discount)) * 10000.0 + 0.5) / 10000.0    AS avg_disc,
  count(*)                                              AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def unpivot_returnflag_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long): per-returnflag measure columns melted to
    (flag, measure, value) rows via ``DataFrame.unpivot`` — the inverse
    of the pivot showcase.  Spark expands it to a generator (no
    shuffle beyond the feeding agg); the oracle mirrors with UNION ALL,
    the portable spelling of UNPIVOT.
    """
    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.functions.portable import pround

    l = load_table(spark, sf_dir, "lineitem")
    wide = l.groupBy("l_returnflag").agg(
        pround(F.sum("l_quantity"), 2).alias("sum_qty"),
        pround(F.sum("l_extendedprice"), 2).alias("sum_price"),
        pround(F.avg("l_discount"), 6).alias("avg_disc"),
    )
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["sum_qty", "sum_price", "avg_disc"],
            variableColumnName="measure",
            valueColumnName="value",
        )
        .orderBy("l_returnflag", "measure")
    )


UNPIVOT_SQL = """
WITH wide AS (
  SELECT l_returnflag,
         floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
         floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS sum_price,
         floor((avg(l_discount)) * 1000000.0 + 0.5) / 1000000.0 AS avg_disc
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
UNION ALL
SELECT l_returnflag, 'sum_price', sum_price FROM wide
UNION ALL
SELECT l_returnflag, 'avg_disc', avg_disc FROM wide
ORDER BY l_returnflag, measure
"""


def collation_segment_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive reconciliation via Spark 4 **collations**: two
    upstream feeds deliver the market segment cased differently (raw
    TPC-H upper vs an initcap-style feed — the inconsistency every
    multi-source union inherits), and the grouping key is the column
    COLLATED to ``UTF8_LCASE`` — the engine-level way to make equality,
    grouping and joins case-insensitive without rewriting every
    predicate through ``lower()`` (which defeats statistics and rewrites
    the data).  The report canonicalizes the group label and counts the
    distinct binary spellings each collated group absorbed.

    The second feed's casing is built with explicit substr/upper/lower
    (not ``initcap``) so the oracle's SQL is expression-identical.
    """
    c = load_table(spark, sf_dir, "customer")
    raw = c.select(F.col("c_mktsegment").alias("seg"))
    recased = c.select(
        F.concat(
            F.upper(F.expr("substr(c_mktsegment, 1, 1)")),
            F.lower(F.expr("substr(c_mktsegment, 2)")),
        ).alias("seg")
    )
    u = raw.unionByName(recased)
    # roll up on the BINARY key first (plain hash agg over the fact
    # rows), then collate-group the |spellings|-row rollup: ICU
    # collation comparisons never touch the fact table — a raw
    # collated groupBy probed 22× at 10× rows, this shape 1.6×
    per_spelling = u.groupBy("seg").agg(F.count(F.lit(1)).alias("n"))
    return (
        # |spellings| rows ≈ 2×|distinct segments| — a low-cardinality
        # rollup by construction (market segments), so run the collated
        # re-group + canonicalization single-partition: the collated key
        # plans as SortAggregate (collations are not hash-aggregable),
        # and spreading a handful of rows over 32-partition exchanges
        # paid 3 shuffle stages of pure scheduling latency (measured
        # 0.37 → 0.16 s warm; the fact-table rollup above is unchanged)
        per_spelling.coalesce(1)
        .groupBy(
            F.collate(F.col("seg"), "UTF8_LCASE").alias("k")
        )
        .agg(
            F.sum("n").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_spellings"),
        )
        .select(
            # the collated key keeps an arbitrary representative
            # spelling AND the collation in its type — canonicalize the
            # value (lower) and the type (back to binary collation)
            F.collate(F.lower("k"), "UTF8_BINARY").alias("segment"),
            "n_rows",
            "n_spellings",
        )
        .orderBy("segment")
    )


#: two-level shape mirroring the Spark plan: the oracle's old
#: ``count(DISTINCT seg)`` ignored a NULL spelling while Spark's
#: per-spelling rollup counts the NULL group's row — a NULL
#: c_mktsegment made n_spellings diverge 0 vs 1 (adversarial TPC-H
#: fixture, round 12)
COLLATION_RECONCILE_SQL = """
WITH u AS (
  SELECT c_mktsegment AS seg FROM customer
  UNION ALL
  SELECT upper(substr(c_mktsegment, 1, 1)) || lower(substr(c_mktsegment, 2))
  FROM customer
),
per_spelling AS (
  SELECT seg, count(*) AS n FROM u GROUP BY seg
)
SELECT lower(seg) AS segment,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_spellings
FROM per_spelling GROUP BY 1 ORDER BY 1
"""


#: the three join strategies a user can pin per-relation
JOIN_HINTS = (("broadcast", "BROADCAST"), ("merge", "MERGE"),
              ("shuffle_hash", "SHUFFLE_HASH"))


def join_hints_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy HINTS as a checked contract: the same
    orders⋈customer aggregation under ``BROADCAST``, ``MERGE`` and
    ``SHUFFLE_HASH`` hints — one row per strategy, all three required
    to produce identical numbers (strategy choice is physical, never
    semantic).  Hints are how a user overrides Catalyst when runtime
    knowledge beats statistics (a dimension known to fit memory, a
    skew-prone build side); ``tests/test_plans.py`` additionally
    asserts each hint actually selected its operator in the physical
    plan, so this query guards the API end-to-end.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    cents = F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
    outs = []
    for label, hint in JOIN_HINTS:
        j = o.join(
            c.hint(hint), o["o_custkey"] == c["c_custkey"]
        )
        outs.append(
            j.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(cents).alias("sum_cents"),
                F.countDistinct("c_nationkey").alias("n_nations"),
            ).select(
                F.lit(label).alias("strategy"),
                "n_rows",
                "sum_cents",
                "n_nations",
            )
        )
    out = outs[0]
    for x in outs[1:]:
        out = out.unionByName(x)
    return out.orderBy("strategy")


JOIN_HINTS_SQL = """
WITH agg AS (
  SELECT count(*) AS n_rows,
         CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS sum_cents,
         CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT s.strategy, a.n_rows, a.sum_cents, a.n_nations
FROM agg a, (VALUES ('broadcast'), ('merge'), ('shuffle_hash')) s(strategy)
ORDER BY s.strategy
"""


SPARK_QUERIES = {
    "collation_segment_reconcile": collation_segment_reconcile,
    "join_hints_showcase": join_hints_showcase,
    "sql_interface_q1": sql_interface_q1,
    "ranking_functions_showcase": ranking_functions_showcase,
    "grouping_sets_revenue": grouping_sets_revenue,
    "array_functions_showcase": array_functions_showcase,
    "unpivot_returnflag_measures": unpivot_returnflag_measures,
}

ORACLE_SQL = {
    "collation_segment_reconcile": COLLATION_RECONCILE_SQL,
    "join_hints_showcase": JOIN_HINTS_SQL,
    "sql_interface_q1": SQL_INTERFACE_Q1_SQL,
    "ranking_functions_showcase": RANKING_SQL,
    "grouping_sets_revenue": GROUPING_SETS_SQL,
    "array_functions_showcase": ARRAY_FUNCS_SQL,
    "unpivot_returnflag_measures": UNPIVOT_SQL,
}
