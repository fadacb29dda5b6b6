"""Modern Spark SQL text surface: recursive CTEs, pipe syntax, SQL UDFs,
and single-pass ``Observation`` metrics.

The reference drives everything imperatively (loops over a manifest,
``Series.apply`` lambdas, a separate audit script that re-scans the
sink ten times — ``/root/reference/etl_meteo.py:149-178,53-59``,
``/root/reference/quality_audit.py:42-52``).  This module covers the
declarative SQL-text equivalents a Spark user would reach for:

* **recursive CTE** (``WITH RECURSIVE``, Spark 4) — the manifest's
  "one entry per day" loop as a set-generating query: a date spine is
  derived *in-plan* and left-joined to facts, so days with zero rows
  still report (the reference's per-file loop gets this implicitly;
  plain ``GROUP BY o_orderdate`` would silently drop empty days);
* **SQL pipe syntax** (``|>``) — linear dataflow order for the same
  logical plan Catalyst builds from nested SQL: each pipe stage maps
  1:1 onto the reference's sequential pandas mutations;
* **SQL-defined scalar UDFs** (``CREATE FUNCTION ... RETURN expr``) —
  the reference's per-cell Python lambdas re-expressed as catalog
  functions that Catalyst INLINES into the plan: they stay inside
  WholeStageCodegen, pay zero Python-worker cost, and remain
  user-definable.  This is the recommended scale path for custom
  scalars; ``pandas_udf`` stays the escape hatch for logic SQL can't
  express;
* **``df.observe`` / ``Observation``** — the reference's post-load
  audit (10 extra full scans) fused INTO the load pass itself:
  CollectMetrics accumulates audit aggregates as a side effect of the
  one write job, so data-quality telemetry is free at 100 TB.

At scale: the recursive spine is tiny (one row per day — broadcast
side), the fact scan keeps its pushed filters; SQL UDFs add no
per-row overhead; Observation adds an accumulator, not a job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import harden_session, load_table, load_tables

# ---------------------------------------------------------------------------
# recursive CTE: in-plan date spine left-joined to orders
# ---------------------------------------------------------------------------


def recursive_cte_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """March-1995 daily order counts over a recursive date spine.

    ``WITH RECURSIVE`` generates the 31-day spine inside the plan (no
    driver-side loop, no collected list — contrast the reference's
    static date→file manifest, ``etl_meteo.py:16-34``); the LEFT JOIN
    keeps zero-order days in the report.  The join key is an equality
    on ``date_trunc``, so it plans as a hash join with the one-row-per
    -day spine broadcast, not a nested loop.
    """
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        WITH RECURSIVE days(day) AS (
          SELECT TIMESTAMP '1995-03-01 00:00:00'
          UNION ALL
          SELECT day + INTERVAL '1' DAY FROM days
          WHERE day < TIMESTAMP '1995-03-31 00:00:00'
        )
        SELECT
          day,
          count(o_orderkey)                                              AS n_orders,
          floor(coalesce(sum(o_totalprice), 0.0D) * 100.0D + 0.5D) / 100.0D AS revenue
        FROM days
        LEFT JOIN orders ON date_trunc('DAY', o_orderdate) = day
        GROUP BY day
        ORDER BY day
        """
    )


RECURSIVE_CTE_SQL = """
WITH RECURSIVE days(day) AS (
  SELECT TIMESTAMP '1995-03-01 00:00:00'
  UNION ALL
  SELECT day + INTERVAL 1 DAY FROM days
  WHERE day < TIMESTAMP '1995-03-31 00:00:00'
)
SELECT
  day,
  count(o_orderkey) AS n_orders,
  floor(coalesce(sum(o_totalprice), 0.0) * 100.0 + 0.5) / 100.0 AS revenue
FROM days
LEFT JOIN orders ON date_trunc('day', o_orderdate) = day
GROUP BY day
ORDER BY day
"""

# ---------------------------------------------------------------------------
# SQL pipe syntax: linear dataflow text for a filter→extend→aggregate plan
# ---------------------------------------------------------------------------


def pipe_syntax_returnflag_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-family revenue by return flag written in SQL pipe syntax.

    Each ``|>`` stage is one dataflow step (scan → filter → derive →
    aggregate → order), mirroring the reference's sequential pandas
    mutations (``etl_meteo.py:48-67``) in declarative form — Catalyst
    builds the identical plan as the nested-SQL/DataFrame variants, so
    the filter still pushes to parquet.
    """
    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |> EXTEND l_extendedprice * (1.0D - l_discount) AS rev
        |> AGGREGATE
             floor(sum(rev) * 100.0D + 0.5D) / 100.0D AS revenue,
             count(*) AS n_items
           GROUP BY l_returnflag
        |> ORDER BY l_returnflag
        """
    )


PIPE_SYNTAX_SQL = """
SELECT
  l_returnflag,
  floor(sum(l_extendedprice * (1.0 - l_discount)) * 100.0 + 0.5) / 100.0 AS revenue,
  count(*) AS n_items
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# ---------------------------------------------------------------------------
# SQL-defined scalar UDFs: user extensions that stay inside codegen
# ---------------------------------------------------------------------------


def sql_udf_discount_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by discount band through two SQL-defined scalar UDFs.

    ``net_price`` and ``disc_band`` replace the reference's per-cell
    Python lambdas (``etl_meteo.py:53-59``): created once in the
    session catalog, inlined by Catalyst at plan time — the physical
    plan is pure codegen'd expressions, indistinguishable from writing
    the CASE inline, with no Python worker in the loop.

    Sibling surfaces: this is the PREFERRED path when the logic is
    SQL-expressible; ``plans.modern_api.pandas_udf_scalar_hatch`` is
    the vectorized-Python scalar escape hatch for when it is not, and
    ``plans.modern_api.pandas_udaf_user_median`` the grouped-aggregate
    contract.
    """
    load_tables(spark, sf_dir, ("lineitem",))
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0D - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_band(d DOUBLE) "
        "RETURNS STRING RETURN "
        "CASE WHEN d < 0.03D THEN 'low' WHEN d < 0.07D THEN 'mid' ELSE 'high' END"
    )
    return spark.sql(
        """
        SELECT
          disc_band(l_discount)                                             AS band,
          count(*)                                                          AS n_items,
          floor(sum(net_price(l_extendedprice, l_discount)) * 100.0D + 0.5D)
            / 100.0D                                                        AS net_revenue
        FROM lineitem
        GROUP BY disc_band(l_discount)
        ORDER BY band
        """
    )


SQL_UDF_SQL = """
SELECT
  CASE WHEN l_discount < 0.03 THEN 'low'
       WHEN l_discount < 0.07 THEN 'mid'
       ELSE 'high' END AS band,
  count(*) AS n_items,
  floor(sum(l_extendedprice * (1.0 - l_discount)) * 100.0 + 0.5) / 100.0 AS net_revenue
FROM lineitem
GROUP BY 1
ORDER BY band
"""

# ---------------------------------------------------------------------------
# Observation: audit metrics collected as a side effect of the load pass
# ---------------------------------------------------------------------------


def observed_load_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass load + audit via ``df.observe``.

    The reference audits AFTER loading, with ten separate collection
    scans (``etl_meteo.py:239-274``, ``quality_audit.py:42-52``).
    Here the audit aggregates ride the load job itself: CollectMetrics
    accumulates row count, conditional counts, an integer-cent value
    sum, and the event-time bounds while the scan feeds a (noop) sink
    — zero extra passes.  The metrics come back on the driver as one
    tiny row, returned as the query result.

    At 100 TB this is the difference between one pipeline pass and
    eleven: observability is an accumulator, not a job.
    """
    from pyspark.sql import Observation

    harden_session(spark)
    e = load_table(spark, sf_dir, "events")
    obs = Observation()
    observed = e.observe(
        obs,
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "n_purchases"
        ),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("n_null_value"),
        F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")).alias(
            "value_cents"
        ),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )
    # the "load": one pass to a noop sink drives the metrics
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    row = {
        "n_events": m["n_events"],
        "n_purchases": m["n_purchases"],
        "n_null_value": m["n_null_value"],
        "total_value": m["value_cents"] / 100.0,
        "min_ts": m["min_ts"],
        "max_ts": m["max_ts"],
    }
    return spark.createDataFrame(
        [row],
        "n_events bigint, n_purchases bigint, n_null_value bigint, "
        "total_value double, min_ts timestamp, max_ts timestamp",
    )


OBSERVED_METRICS_SQL = """
SELECT
  count(*) AS n_events,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_value,
  sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS total_value,
  min(ts) AS min_ts,
  max(ts) AS max_ts
FROM events
"""


SPARK_QUERIES = {
    "recursive_cte_daily_orders": recursive_cte_daily_orders,
    "pipe_syntax_returnflag_revenue": pipe_syntax_returnflag_revenue,
    "sql_udf_discount_bands": sql_udf_discount_bands,
    "observed_load_metrics": observed_load_metrics,
}

ORACLE_SQL = {
    "recursive_cte_daily_orders": RECURSIVE_CTE_SQL,
    "pipe_syntax_returnflag_revenue": PIPE_SYNTAX_SQL,
    "sql_udf_discount_bands": SQL_UDF_SQL,
    "observed_load_metrics": OBSERVED_METRICS_SQL,
}
