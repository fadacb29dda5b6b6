"""Approximate / sketch aggregates — the 100 TB cardinality toolkit.

Exact ``COUNT(DISTINCT)`` at scale forces a full shuffle of every
distinct value; sketches keep the shuffle O(sketch size) and are
**mergeable**, so partial aggregation works exactly like any other agg.

* ``approx_user_stats`` — HyperLogLog++ distinct users + t-digest-style
  quantiles per event type (``approx_count_distinct`` /
  ``percentile_approx``), next to their exact counterparts so the
  error is visible in the result itself.
* ``hll_sketch_mergeability`` — Apache DataSketches HLL: per-slice
  sketches merged with ``hll_union_agg`` vs a one-shot sketch; the
  test asserts the estimates agree, which is the property that makes
  pre-aggregated rollup tables sound.

Registered rows-only: sketch internals are engine-specific by design
(DuckDB's approx_count_distinct uses a different HLL seeding), so the
accuracy contract lives in tests/test_sketches.py instead of the
DuckDB hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.functions.portable import pround


def approx_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # exact COUNT(DISTINCT) is computed in its OWN aggregation and
    # joined back: mixing it into the sketch agg forces an Expand
    # (two-phase distinct) plan that routes every row through the
    # percentile sketch twice (~2.5× wall measured at sf0.1)
    sketches_agg = (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            # accuracy 2500 ≈ 0.04% rank error — 6× cheaper than the
            # 10000 default at sf0.1 with no visible quantile movement
            pround(F.expr("percentile_approx(value, 0.5, 2500)"), 4).alias("p50"),
            pround(F.expr("percentile_approx(value, 0.95, 2500)"), 4).alias("p95"),
            pround(F.expr("percentile_approx(value, 0.99, 2500)"), 4).alias("p99"),
        )
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return (
        sketches_agg.join(F.broadcast(exact), "event_type")
        .select(
            "event_type", "n_events", "exact_users", "approx_users",
            "p50", "p95", "p99",
        )
        .orderBy("event_type")
    )


def hll_sketch_mergeability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type two ways: one-shot HLL sketch vs
    per-day sketches merged with ``hll_union_agg`` — the rollup-table
    soundness property."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", F.to_date("ts").alias("day")
    )
    per_day = e.groupBy("event_type", "day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_day.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_estimate")
    )
    oneshot = e.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("oneshot_estimate"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    return merged.join(oneshot, "event_type").orderBy("event_type")


SPARK_QUERIES = {
    "approx_user_stats": approx_user_stats,
    "hll_sketch_mergeability": hll_sketch_mergeability,
}

ORACLE_SQL: dict[str, str] = {}
