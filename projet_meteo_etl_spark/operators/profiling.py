"""Table profiling — the reference is at heart a data-quality pipeline
(`quality_audit.py`, SURVEY.md §2.6), and the natural generalization of
its hand-written per-field audits is a deequ-style column profiler: one
operator that computes, for every numeric column in one pass, the stats
an audit would assert against (counts, nulls, distincts, min/max/mean)
plus an equi-width histogram for distribution drift checks.

Scale design:

* The per-column long format comes from an in-plan ``explode`` of
  (col_name, value) structs — ONE scan of the fact table no matter how
  many columns are profiled (Spark does not dedupe repeated plan
  subtrees, so the per-column-subquery formulation would scan N times).
* Histogram bucket edges derive from the global min/max via a
  broadcast of the 4-row stats aggregate back onto the value stream —
  two passes over the data, zero driver-side collects, no assumption
  that ranges are known ahead of time.
* Sums that feed means accumulate in ``DECIMAL(38,0)`` integer cents —
  order-independent and overflow-proof at 100 TB row counts (BIGINT
  cents would overflow at ~1e12 rows × 1e7 cents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.functions.portable import pround

#: numeric lineitem measures profiled (all exact-cent doubles)
PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
N_BUCKETS = 8


def _long_values(d: DataFrame) -> DataFrame:
    """(col_name, val) long format via one stacked explode — one scan."""
    return d.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("double").alias("val"),
                    )
                    for c in PROFILE_COLS
                ]
            )
        ).alias("s")
    ).select("s.col_name", "s.val")


def _stats(d: DataFrame) -> DataFrame:
    vals = _long_values(d)
    cents = F.floor(F.col("val") * 100 + 0.5).cast("decimal(38,0)")
    return vals.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), 1).otherwise(0)).alias("n_null"),
        F.countDistinct("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.sum(cents).alias("sum_cents"),
    )


def profile_numeric_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile: counts, nulls, exact distincts, min/max, and
    the mean reconstructed from the exact integer-cent sum."""
    d = load_table(spark, sf_dir, "lineitem")
    s = _stats(d)
    mean = (F.col("sum_cents").cast("double") / 100.0) / (
        F.col("n_rows") - F.col("n_null")
    )
    return (
        s.select(
            "col_name",
            "n_rows",
            "n_null",
            "n_distinct",
            "min_val",
            "max_val",
            pround(mean, 6).alias("mean_r"),
        )
        .orderBy("col_name")
    )


PROFILE_STATS_SQL = """
WITH vals AS (
  SELECT 'l_quantity' AS col_name, l_quantity AS val FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
),
s AS (
  SELECT col_name,
    count(*) AS n_rows,
    sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS n_null,
    count(DISTINCT val) AS n_distinct,
    min(val) AS min_val,
    max(val) AS max_val,
    sum(CAST(floor(val * 100 + 0.5) AS HUGEINT)) AS sum_cents
  FROM vals GROUP BY col_name
)
SELECT col_name,
  CAST(n_rows AS BIGINT) AS n_rows,
  CAST(n_null AS BIGINT) AS n_null,
  CAST(n_distinct AS BIGINT) AS n_distinct,
  min_val, max_val,
  floor(((CAST(sum_cents AS DOUBLE) / 100.0) / (n_rows - n_null)) * 1000000.0 + 0.5)
    / 1000000.0 AS mean_r
FROM s
ORDER BY col_name
"""


def profile_numeric_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram per column: bucket edges from the global
    min/max (broadcast back onto the value stream — in-plan, no
    driver collect), ``N_BUCKETS`` buckets, max value clamped into the
    last bucket."""
    d = load_table(spark, sf_dir, "lineitem")
    vals = _long_values(d).filter(F.col("val").isNotNull())
    edges = _stats(d).select("col_name", "min_val", "max_val")
    width = (F.col("max_val") - F.col("min_val")) / N_BUCKETS
    bucket = F.when(F.col("max_val") == F.col("min_val"), F.lit(0)).otherwise(
        F.least(
            F.floor(
                (F.col("val") - F.col("min_val"))
                / (F.col("max_val") - F.col("min_val"))
                * N_BUCKETS
            ),
            F.lit(N_BUCKETS - 1),
        )
    ).cast("long")
    return (
        vals.join(F.broadcast(edges), "col_name")
        .select("col_name", bucket.alias("bucket"), "min_val", width.alias("w"))
        .groupBy("col_name", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.first("min_val") + F.first("w") * F.col("bucket"), 6).alias(
                "lo_edge"
            ),
            pround(
                F.first("min_val") + F.first("w") * (F.col("bucket") + 1), 6
            ).alias("hi_edge"),
        )
        .select("col_name", "bucket", "lo_edge", "hi_edge", "n")
        .orderBy("col_name", "bucket")
    )


PROFILE_HIST_SQL = f"""
WITH vals AS (
  SELECT 'l_quantity' AS col_name, l_quantity AS val FROM lineitem
  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
),
edges AS (
  SELECT col_name, min(val) AS min_val, max(val) AS max_val
  FROM vals GROUP BY col_name
),
b AS (
  SELECT v.col_name,
    CAST(CASE WHEN e.max_val = e.min_val THEN 0
         ELSE least(floor((v.val - e.min_val) / (e.max_val - e.min_val)
                          * {N_BUCKETS}), {N_BUCKETS - 1}) END AS BIGINT) AS bucket,
    e.min_val, (e.max_val - e.min_val) / {N_BUCKETS} AS w
  FROM vals v JOIN edges e USING (col_name)
  WHERE v.val IS NOT NULL
)
SELECT col_name, bucket,
  floor((min_val + w * bucket) * 1000000.0 + 0.5) / 1000000.0 AS lo_edge,
  floor((min_val + w * (bucket + 1)) * 1000000.0 + 0.5) / 1000000.0 AS hi_edge,
  count(*) AS n
FROM b
GROUP BY col_name, bucket, min_val, w
ORDER BY col_name, bucket
"""


SPARK_QUERIES = {
    "profile_numeric_stats": profile_numeric_stats,
    "profile_numeric_histograms": profile_numeric_histograms,
}

ORACLE_SQL = {
    "profile_numeric_stats": PROFILE_STATS_SQL,
    "profile_numeric_histograms": PROFILE_HIST_SQL,
}
