"""Temporal join operators: as-of join and range join over events.

Spark has no built-in AS OF join (DuckDB/Pandas/kdb do); the engine
expresses it as a **union + ordered window** instead of a join: tag
both sides, sort within each user partition by (ts, side), and carry
the last non-null right-side value forward with
``last(..., ignorenulls=True)``.  One shuffle on the partition key, no
join explosion, no per-key Python — this is the scale-correct shape
(an actual sort-merge as-of), and it inherits AQE skew handling on the
user_id shuffle.

The range join is a plain equi-join on the partition key with the
range condition as a post-join predicate — Spark hash-partitions on
user_id and filters; at 100 TB the equality key keeps the shuffle
bounded and AQE splits skewed users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table


def asof_purchase_before_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click event: the most recent purchase (same user) at or
    before the click, plus the elapsed microseconds — LEFT AS OF JOIN
    semantics, matched against DuckDB's native ``ASOF LEFT JOIN``.

    Purchases are first collapsed to one row per (user, ts) with
    ``max_by(value, event_id)`` so tie-breaking is deterministic in both
    engines.
    """
    e = load_table(spark, sf_dir, "events")
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("p_value"))
        .select("user_id", "ts", F.lit(0).alias("side"), F.lit(None).cast("long").alias("event_id"), "p_value")
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id", F.lit(None).cast("double").alias("p_value")
    )
    # side=0 sorts purchases before clicks at equal ts → "at or before"
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = p.unionByName(c).select(
        "user_id",
        "ts",
        "side",
        "event_id",
        F.last("p_value", ignorenulls=True).over(w).alias("last_p_value"),
        F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("last_p_ts"),
    )
    return (
        tagged.filter(F.col("side") == 1)
        .select(
            "user_id",
            "event_id",
            "ts",
            F.col("last_p_value").alias("p_value"),
            (F.unix_micros("ts") - F.unix_micros("last_p_ts")).alias(
                "micros_since_purchase"
            ),
        )
        .orderBy("user_id", "event_id")
    )


ASOF_SQL = """
WITH p AS (
  SELECT user_id, ts, arg_max(value, event_id) AS p_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
c AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.user_id, c.event_id, c.ts, p.p_value,
       epoch_us(c.ts) - epoch_us(p.ts) AS micros_since_purchase
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.user_id, c.event_id
"""


def range_join_clicks_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase: number of same-user clicks in the 10 minutes after
    it (exclusive start, inclusive end) — an equi-key range join."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    joined = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") > F.col("p_ts"))
        & (F.unix_micros("c_ts") <= F.unix_micros("p_ts") + 600_000_000),
        "left",
    )
    return (
        joined.groupBy("user_id", "p_id")
        .agg(F.count("c_ts").alias("n_clicks_10m"))
        .orderBy("user_id", "p_id")
    )


RANGE_JOIN_SQL = """
SELECT p.user_id, p.event_id AS p_id, count(c.ts) AS n_clicks_10m
FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts > p.ts
 AND epoch_us(c.ts) <= epoch_us(p.ts) + 600000000
GROUP BY p.user_id, p.event_id
ORDER BY p.user_id, p_id
"""


SPARK_QUERIES = {
    "asof_purchase_before_click": asof_purchase_before_click,
    "range_join_clicks_after_purchase": range_join_clicks_after_purchase,
}

ORACLE_SQL = {
    "asof_purchase_before_click": ASOF_SQL,
    "range_join_clicks_after_purchase": RANGE_JOIN_SQL,
}
