"""Classifier-evaluation and distribution-drift statistics, rank-exact.

The reference's quality surface stops at rule counts
(`/root/reference/quality_audit.py:14-78` — nulls, ranges, duplicates);
a training-data platform additionally has to answer "does this score
rank the labels?" (AUC) and "did the data move?" (a two-sample test)
before a model or filter built on the data ships.  Both are order
statistics over a value distribution, so both reduce to the same
distributed shape: one hash-agg from the event log down to a
per-distinct-score rollup (bounded by the VALUE DOMAIN, not the row
count), then prefix sums over that rollup.

* ``auc_roc_eval`` — exact ROC-AUC via the Mann–Whitney pair count:
  AUC = (#{score_pos > score_neg} + ½·#{ties}) / (n_pos·n_neg).
  Grouping by distinct score makes the pair count a prefix-sum
  identity:  Σ_s n_pos(s)·(2·Σ_{s'<s} n_neg(s') + n_neg(s)) — the
  doubled numerator keeps tie credit integral, so AUC is a single
  exact integer ratio at the end.  One AUC per negative class
  (purchase-vs-view / click / error), which doubles as the
  discrimination check between every event-type pair.
* ``ks_value_drift`` — the exact two-sample Kolmogorov–Smirnov
  statistic between the first and second half of the time range:
  D = max_s |F1(s) − F2(s)|, evaluated with cross-multiplied integer
  ECDF numerators (|cum1·N2 − cum2·N1|), so the argmax is an integer
  comparison and no float boundary can flip the report.

Scale shape: both queries shuffle the event log ONCE into a
per-(group, distinct-cents) hash aggregate whose size is bounded by
the cents domain (~50k rows here) times the constant group count; the
prefix windows run over that rollup, never over the log.  The final
ratios widen to DECIMAL(38) before the ×1e6, so they cannot overflow
at any row count BIGINT can hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table

#: negative classes scored against the purchase positives
AUC_NEG_TYPES = ("click", "error", "view")


def _cents_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_type",
        F.expr("unix_micros(ts) DIV 86400000000").alias("eday"),
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
    )


def auc_roc_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the cent value ranking purchases above each
    negative event class (one row per negative class).

    Mann–Whitney over distinct scores: with ``cum_neg(s)`` the count of
    negatives STRICTLY below score s, the doubled pair-win numerator is
    ``Σ_s n_pos(s)·(2·cum_neg(s) + n_neg(s))`` (ties count once, hence
    half after the final ÷2) and AUC = num2 / (2·n_pos·n_neg).  Every
    term is an integer; the single prefix window runs over the
    per-(class, distinct-cents) rollup — value-domain bounded — and is
    partitioned by class, so no task ever sees more than one class's
    score domain.
    """
    base = _cents_events(spark, sf_dir)
    negs = spark.createDataFrame(
        [(t,) for t in AUC_NEG_TYPES], "neg_type string"
    )
    rep = base.crossJoin(F.broadcast(negs)).filter(
        (F.col("event_type") == "purchase")
        | (F.col("event_type") == F.col("neg_type"))
    )
    per = rep.groupBy("neg_type", "cents").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_pos_s"),
        F.sum(F.when(F.col("event_type") != "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_neg_s"),
    )
    w = (
        Window.partitionBy("neg_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    terms = per.select(
        "neg_type",
        "n_pos_s",
        "n_neg_s",
        (
            F.col("n_pos_s")
            * (
                F.lit(2) * F.coalesce(F.sum("n_neg_s").over(w), F.lit(0))
                + F.col("n_neg_s")
            )
        ).alias("t2"),
    )
    return (
        terms.groupBy("neg_type")
        .agg(
            F.sum("n_pos_s").cast("long").alias("n_pos"),
            F.sum("n_neg_s").cast("long").alias("n_neg"),
            F.sum("t2").cast("long").alias("num2"),
        )
        .select(
            "neg_type",
            "n_pos",
            "n_neg",
            F.expr(
                "CAST(CAST(num2 AS DECIMAL(38,0)) * 1000000"
                " DIV (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"
            ).alias("auc_ppm"),
        )
        .orderBy("neg_type")
    )


AUC_ROC_SQL = f"""
WITH base AS (
  SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
rep AS (
  SELECT n.neg_type, b.event_type, b.cents
  FROM base b,
       (SELECT unnest([{', '.join(repr(t) for t in AUC_NEG_TYPES)}])
          AS neg_type) n
  WHERE b.event_type = 'purchase' OR b.event_type = n.neg_type
),
per AS (
  SELECT neg_type, cents,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pos_s,
         CAST(sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_neg_s
  FROM rep GROUP BY 1, 2
),
pre AS (
  SELECT neg_type, n_pos_s, n_neg_s,
         n_pos_s * (2 * coalesce(sum(n_neg_s) OVER (
             PARTITION BY neg_type ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + n_neg_s) AS t2
  FROM per
),
agg AS (
  SELECT neg_type,
         CAST(sum(n_pos_s) AS BIGINT) AS n_pos,
         CAST(sum(n_neg_s) AS BIGINT) AS n_neg,
         CAST(sum(t2) AS BIGINT) AS num2
  FROM pre GROUP BY 1
)
SELECT neg_type, n_pos, n_neg,
       CAST(num2::HUGEINT * 1000000
            // (2 * n_pos::HUGEINT * n_neg) AS BIGINT) AS auc_ppm
FROM agg
ORDER BY neg_type
"""


def ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS statistic: early-half vs late-half cent
    distributions, split at the midpoint epoch-day.

    The ECDF difference is evaluated as the integer cross-product
    ``|cum1·N2 − cum2·N1|`` at every distinct cents value (inclusive
    prefix sums over the per-cents rollup), so the maximizing value is
    found by exact integer comparison; ties break to the smallest
    cents.  Output: one row — sample sizes, D in ppm, and the value at
    which the distributions diverge most.
    """
    base = _cents_events(spark, sf_dir)
    bounds = base.agg(
        F.min("eday").alias("d0"), F.max("eday").alias("d1")
    )
    tagged = base.crossJoin(F.broadcast(bounds)).select(
        "cents",
        F.when(
            F.col("eday") <= F.expr("(d0 + d1) DIV 2"), F.lit(1)
        )
        .otherwise(F.lit(2))
        .alias("half"),
    )
    per = tagged.groupBy("cents").agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n1_s"),
        F.sum(F.when(F.col("half") == 2, 1).otherwise(0))
        .cast("long")
        .alias("n2_s"),
    )
    # inclusive ECDF prefix over the value-domain-bounded cents rollup
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "cents",
        F.sum("n1_s").over(w).alias("cum1"),
        F.sum("n2_s").over(w).alias("cum2"),
    )
    tot = per.agg(
        F.sum("n1_s").cast("long").alias("n_early"),
        F.sum("n2_s").cast("long").alias("n_late"),
    )
    scored = cum.crossJoin(F.broadcast(tot)).select(
        "cents",
        "n_early",
        "n_late",
        F.abs(
            F.col("cum1") * F.col("n_late") - F.col("cum2") * F.col("n_early")
        ).alias("d2"),
    )
    return (
        scored.orderBy(F.desc("d2"), F.asc("cents"))
        .limit(1)
        .select(
            "n_early",
            "n_late",
            F.expr(
                "CAST(CAST(d2 AS DECIMAL(38,0)) * 1000000"
                " DIV (CAST(n_early AS DECIMAL(38,0)) * n_late) AS BIGINT)"
            ).alias("ks_ppm"),
            F.col("cents").alias("at_cents"),
        )
    )


KS_VALUE_DRIFT_SQL = """
WITH base AS (
  SELECT epoch_us(ts) // 86400000000 AS eday,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
bounds AS (SELECT min(eday) AS d0, max(eday) AS d1 FROM base),
tagged AS (
  SELECT b.cents,
         CASE WHEN b.eday <= (d.d0 + d.d1) // 2 THEN 1 ELSE 2 END AS half
  FROM base b, bounds d
),
per AS (
  SELECT cents,
         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1_s,
         CAST(sum(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2_s
  FROM tagged GROUP BY 1
),
cum AS (
  SELECT cents,
         sum(n1_s) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
         sum(n2_s) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
  FROM per
),
tot AS (
  SELECT CAST(sum(n1_s) AS BIGINT) AS n_early,
         CAST(sum(n2_s) AS BIGINT) AS n_late
  FROM per
)
SELECT t.n_early, t.n_late,
       CAST(abs(c.cum1 * t.n_late - c.cum2 * t.n_early)::HUGEINT * 1000000
            // (t.n_early::HUGEINT * t.n_late) AS BIGINT) AS ks_ppm,
       c.cents AS at_cents
FROM cum c, tot t
ORDER BY abs(c.cum1 * t.n_late - c.cum2 * t.n_early) DESC, c.cents
LIMIT 1
"""


SPARK_QUERIES = {
    "auc_roc_eval": auc_roc_eval,
    "ks_value_drift": ks_value_drift,
}

ORACLE_SQL = {
    "auc_roc_eval": AUC_ROC_SQL,
    "ks_value_drift": KS_VALUE_DRIFT_SQL,
}
