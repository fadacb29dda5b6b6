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
prefix windows run over that rollup, never over the log.  The pair /
cross-product numerators and the final ratios widen to DECIMAL(38)
(HUGEINT on the oracle side) BEFORE any multiply, so they cannot
overflow at any row count BIGINT can hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.functions.portable import json_long

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
    # num2 ≈ 2·n_pos·n_neg exceeds BIGINT once both classes pass ~2.1e9
    # rows; widen the per-score term to DECIMAL(38,0) BEFORE the multiply
    # so Spark cannot wrap silently where the HUGEINT oracle would raise.
    terms = per.select(
        "neg_type",
        "n_pos_s",
        "n_neg_s",
        (
            F.col("n_pos_s").cast("decimal(38,0)")
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
            F.sum("t2").cast("decimal(38,0)").alias("num2"),
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
         n_pos_s::HUGEINT * (2 * coalesce(sum(n_neg_s) OVER (
             PARTITION BY neg_type ORDER BY cents
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + n_neg_s) AS t2
  FROM per
),
agg AS (
  SELECT neg_type,
         CAST(sum(n_pos_s) AS BIGINT) AS n_pos,
         CAST(sum(n_neg_s) AS BIGINT) AS n_neg,
         sum(t2) AS num2
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
        # cum·N products reach n_early·n_late — past BIGINT once each half
        # holds ~3e9 rows; widen before the multiply (HUGEINT on oracle).
        F.abs(
            F.col("cum1").cast("decimal(38,0)") * F.col("n_late")
            - F.col("cum2").cast("decimal(38,0)") * F.col("n_early")
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
       CAST(abs(c.cum1::HUGEINT * t.n_late - c.cum2::HUGEINT * t.n_early)
            * 1000000
            // (t.n_early::HUGEINT * t.n_late) AS BIGINT) AS ks_ppm,
       c.cents AS at_cents
FROM cum c, tot t
ORDER BY abs(c.cum1::HUGEINT * t.n_late - c.cum2::HUGEINT * t.n_early) DESC,
         c.cents
LIMIT 1
"""


def mann_whitney_value_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann–Whitney rank-sum TEST (purchase vs click cent
    values): the tie-corrected normal-approximation statistic, emitted
    transcendental-free as the signed squared z in micro-units (the
    Spearman/Kendall/ANOVA convention).

    Sibling cross-reference: :func:`auc_roc_eval` computes the SAME U
    statistic's ratio form (AUC = U/(n₁n₂)) as a ranking-quality
    metric; this query is the SIGNIFICANCE side — midrank U, the
    Σ(t³−t) tie correction, and z² against the null — which AUC does
    not report.  Kept separate the way a stats library separates
    `roc_auc_score` from `mannwhitneyu`.

    Exact integer pipeline: doubled midranks (a tie group occupying
    ranks [lo,hi] has midrank·2 = lo+hi = 2·cum−t+1, always an
    integer), doubled U, and a FIXED evaluation order for the report
    (q1 = d² DIV n₁n₂ first, then the tie-corrected scale) so both
    engines truncate identically — d² alone exceeds BIGINT at ~100×
    corpus, hence the DECIMAL(38,0)/HUGEINT widening before the
    multiply.  One unpartitioned prefix window, over the per-cents
    value-domain rollup (same bounded class as ``ks_value_drift``).
    """
    base = _cents_events(spark, sf_dir).filter(
        F.col("event_type").isin("purchase", "click")
    )
    per = base.groupBy("cents").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("cx"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("cy"),
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "cx",
        "cy",
        (F.col("cx") + F.col("cy")).alias("t"),
        F.sum(F.col("cx") + F.col("cy")).over(w).alias("cum_all"),
    )
    agg = cum.agg(
        F.sum("cx").cast("long").alias("n_x"),
        F.sum("cy").cast("long").alias("n_y"),
        # Σ over X of doubled midranks: midrank2 = 2·cum − t + 1
        F.sum(
            F.col("cx")
            * (F.lit(2) * F.col("cum_all") - F.col("t") + F.lit(1))
        )
        .cast("decimal(38,0)")
        .alias("s2"),
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
            - F.col("t")
        ).alias("tie3"),
    )
    # d = U2x − n_x·n_y (doubled distance from the null mean); the
    # report's operation order is FIXED — q1 = d² DIV (n_x·n_y) first,
    # then the tie-corrected scale — so both engines truncate alike
    staged = agg.select(
        "n_x",
        "n_y",
        "tie3",
        F.expr(
            "s2 - CAST(n_x AS DECIMAL(38,0)) * (n_x + 1)"
        ).alias("u2x"),
        F.expr(
            "s2 - CAST(n_x AS DECIMAL(38,0)) * (n_x + 1)"
            " - CAST(n_x AS DECIMAL(38,0)) * n_y"
        ).alias("d"),
        F.expr("CAST(n_x AS DECIMAL(38,0)) + n_y").alias("n"),
    )
    return staged.select(
        "n_x",
        "n_y",
        F.col("u2x").cast("long").alias("u2_x"),
        F.col("tie3").cast("long").alias("tie_cubed_sum"),
        F.expr(
            "CAST(CASE WHEN n_x = 0 OR n_y = 0"
            "           OR (n + 1) * n * (n - 1) - tie3 = 0 THEN 0"
            " ELSE (CASE WHEN d < 0 THEN -1 ELSE 1 END)"
            # DIV yields BIGINT even on decimal operands — lead the
            # product with a DECIMAL so 3·q1·1e6 can't wrap at ~100×
            "      * ((CAST(3 AS DECIMAL(38,0))"
            "          * ((d * d) DIV (CAST(n_x AS DECIMAL(38,0)) * n_y))"
            "          * 1000000 * n * (n - 1))"
            "         DIV ((n + 1) * n * (n - 1) - tie3))"
            " END AS BIGINT)"
        ).alias("z_sq_signed_ppm"),
    )


MANN_WHITNEY_SQL = """
WITH base AS (
  SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('purchase', 'click')
),
per AS (
  SELECT cents,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS cx,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS cy
  FROM base GROUP BY 1
),
cum AS (
  SELECT cx, cy, cx + cy AS t,
         sum(cx + cy) OVER (ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all
  FROM per
),
agg AS (
  SELECT CAST(sum(cx) AS BIGINT) AS n_x,
         CAST(sum(cy) AS BIGINT) AS n_y,
         CAST(sum(cx * (2 * cum_all - t + 1)) AS HUGEINT) AS s2,
         CAST(sum(t::HUGEINT * t * t - t) AS HUGEINT) AS tie3
  FROM cum
),
st AS (
  SELECT n_x, n_y, tie3,
         s2 - n_x::HUGEINT * (n_x + 1) AS u2x,
         s2 - n_x::HUGEINT * (n_x + 1) - n_x::HUGEINT * n_y AS d,
         n_x::HUGEINT + n_y AS n
  FROM agg
)
SELECT n_x, n_y,
       CAST(u2x AS BIGINT) AS u2_x,
       CAST(tie3 AS BIGINT) AS tie_cubed_sum,
       CAST(CASE WHEN n_x = 0 OR n_y = 0
                  OR (n + 1) * n * (n - 1) - tie3 = 0 THEN 0
            ELSE (CASE WHEN d < 0 THEN -1 ELSE 1 END)
                 * ((3 * ((d * d) // (n_x::HUGEINT * n_y))
                     * 1000000 * n * (n - 1))
                    // ((n + 1) * n * (n - 1) - tie3))
            END AS BIGINT) AS z_sq_signed_ppm
FROM st
"""


def anova_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact one-way ANOVA of cent value across the event types — the
    "does the grouping explain the metric at all?" gate run before any
    per-group model or treatment comparison.

    Between/within sums of squares from exact integer moments:
    SSB = Σ_g S_g²/n_g − S²/N and SSW = Q − Σ_g S_g²/n_g, each term
    floored ONCE at 1e6 scale via DECIMAL(38) truncating division
    (identical on both engines), so the F statistic is a deterministic
    integer ratio — no float moment accumulators whose partial-sum
    order could vary with partitioning.  One map-combinable aggregate
    over the log; everything after is k rows.
    """
    e = _cents_events(spark, sf_dir)
    per = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_g"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s_g"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * cents")).alias("q_g"),
    )
    terms = per.select(
        "n_g",
        "s_g",
        "q_g",
        # widen BEFORE the square: s_g² in LongType wraps past ~3e9
        # cents of group revenue — the oracle side is already HUGEINT
        F.expr(
            "CAST(CAST(s_g AS DECIMAL(38,0)) * s_g * 1000000"
            " DIV n_g AS DECIMAL(38,0))"
        ).alias("t_g"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum(F.col("s_g").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("q_g").cast("decimal(38,0)")).alias("q"),
        F.sum("t_g").alias("t_sum"),
    )
    return agg.select(
        "k",
        "n",
        F.expr(
            "CAST(t_sum - s * s * 1000000 DIV n AS BIGINT)"
        ).alias("ssb_micro"),
        F.expr("CAST(q * 1000000 - t_sum AS BIGINT)").alias("ssw_micro"),
        F.expr(
            "CAST((t_sum - s * s * 1000000 DIV n) * (n - k) * 1000000"
            " DIV ((q * 1000000 - t_sum) * (k - 1)) AS BIGINT)"
        ).alias("f_micro"),
    )


ANOVA_SQL = """
WITH base AS (
  SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
per AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(cents) AS BIGINT) AS s_g,
         -- widen BEFORE the square (the Spark side already does): a
         -- single 9.9e10-cent row wraps cents*cents in INT64
         CAST(sum(cents::HUGEINT * cents) AS HUGEINT) AS q_g
  FROM base GROUP BY 1
),
terms AS (
  SELECT n_g, s_g, q_g,
         s_g::HUGEINT * s_g * 1000000 // n_g AS t_g
  FROM per
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(sum(n_g) AS BIGINT) AS n,
         CAST(sum(s_g) AS BIGINT) AS s,
         CAST(sum(q_g) AS BIGINT) AS q,
         sum(t_g) AS t_sum
  FROM terms
)
SELECT k, n,
       CAST(t_sum - s::HUGEINT * s * 1000000 // n AS BIGINT) AS ssb_micro,
       CAST(q::HUGEINT * 1000000 - t_sum AS BIGINT) AS ssw_micro,
       CAST((t_sum - s::HUGEINT * s * 1000000 // n) * (n - k) * 1000000
            // ((q::HUGEINT * 1000000 - t_sum) * (k - 1)) AS BIGINT)
         AS f_micro
FROM agg
"""


#: Kaplan–Meier survival scale (micro-units of probability)
KM_SCALE = 1_000_000


def _survival_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared duration grid for the survival estimators: per duration
    day t, event count ``d_t`` (first purchase t days after first
    signup) and censor count ``c_t`` (no purchase by log end) — one
    per-user aggregate of the log, output bounded by the date domain."""
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        "event_type",
        F.expr("unix_micros(ts) DIV 86400000000").alias("eday"),
    )
    per_user = (
        base.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "signup", F.col("eday"))).alias(
                "d_signup"
            ),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("eday"))
            ).alias("d_first_purchase"),
        )
        .filter(F.col("d_signup").isNotNull())
    )
    log_end = base.agg(F.max("eday").alias("d_end"))
    durations = per_user.crossJoin(F.broadcast(log_end)).select(
        F.when(
            F.col("d_first_purchase") >= F.col("d_signup"),
            F.col("d_first_purchase") - F.col("d_signup"),
        ).alias("t_event"),
        F.when(
            F.col("d_first_purchase").isNull()
            | (F.col("d_first_purchase") < F.col("d_signup")),
            F.col("d_end") - F.col("d_signup"),
        ).alias("t_censor"),
    )
    return durations.select(
        F.coalesce("t_event", "t_censor").alias("t"),
        F.when(F.col("t_event").isNotNull(), 1).otherwise(0).alias("is_event"),
    ).groupBy("t").agg(
        F.sum("is_event").cast("long").alias("d_t"),
        F.sum(F.expr("1 - is_event")).cast("long").alias("c_t"),
    )


def kaplan_meier_first_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of days from a user's first signup
    to their first purchase, right-censored at the end of the log —
    the time-to-conversion analysis a growth team runs.

    Per user: duration = first-purchase eday − first-signup eday (an
    EVENT) or log-end − signup eday (CENSORED) — one per-user
    aggregate.  The curve itself lives on the DURATION GRID (bounded by
    the date domain, never row count): the product-limit estimator
    ``S(t) = Π (1 − d_u/n_u)`` is a sequential recurrence over that
    grid, so — like the PCA power iteration
    (``operators/clustering.py``) — it runs partition-locally in ONE
    exact-integer ``mapInPandas`` kernel over the coalesced grid.  The
    earlier ``WITH RECURSIVE`` Spark plan scheduled one stage per
    recursion step (depth = distinct durations ⇒ a fixed ~5 s
    scheduling constant at any data size); the kernel does the same
    truncating divisions (``S_micro·(n−d) // n`` on non-negative
    operands, == Spark ``DIV`` == DuckDB ``//``) in microseconds and
    stays bit-identical to the recursive-CTE oracle.
    """

    def km_kernel(batches, _scale=KM_SCALE):
        import pandas as pd

        rows = [pdf for pdf in batches if len(pdf)]
        cols = (
            "duration_days",
            "n_at_risk",
            "n_events",
            "n_censored",
            "survival_micro",
        )
        if not rows:
            # empty log ⇒ empty curve (matches the empty recursion seed)
            yield pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in cols}
            )
            return
        pdf = pd.concat(rows).sort_values("t")
        t = [int(v) for v in pdf["t"]]
        d = [int(v) for v in pdf["d_t"]]
        c = [int(v) for v in pdf["c_t"]]
        # risk set = suffix sum of (d_t + c_t); product-limit steps in
        # unbounded Python ints, floor == trunc on non-negative operands
        n = sum(d) + sum(c)
        n_at_risk, surv = [], []
        s = _scale
        for i in range(len(t)):
            s = s * (n - d[i]) // n
            n_at_risk.append(n)
            surv.append(s)
            n -= d[i] + c[i]
        yield pd.DataFrame(
            {
                "duration_days": pd.Series(t, dtype="int64"),
                "n_at_risk": pd.Series(n_at_risk, dtype="int64"),
                "n_events": pd.Series(d, dtype="int64"),
                "n_censored": pd.Series(c, dtype="int64"),
                "survival_micro": pd.Series(surv, dtype="int64"),
            }
        )

    return (
        _survival_grid(spark, sf_dir)
        .coalesce(1)
        .mapInPandas(
            km_kernel,
            "duration_days long, n_at_risk long, n_events long,"
            " n_censored long, survival_micro long",
        )
        .orderBy("duration_days")
    )


def _km_sql(div: str, src: str = "km_grid_raw") -> str:
    return f"""
WITH RECURSIVE g AS (
  SELECT t, d_t, c_t,
         sum(d_t + c_t) OVER (ORDER BY t
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_t,
         row_number() OVER (ORDER BY t) AS rn
  FROM {src}
),
s(rn, t, d_t, c_t, n_t, s_micro) AS (
  SELECT rn, t, d_t, c_t, n_t,
         CAST({KM_SCALE} AS BIGINT) * (n_t - d_t) {div} n_t
  FROM g WHERE rn = 1
  UNION ALL
  SELECT g.rn, g.t, g.d_t, g.c_t, g.n_t,
         s.s_micro * (g.n_t - g.d_t) {div} g.n_t
  FROM s JOIN g ON g.rn = s.rn + 1
)
SELECT t AS duration_days, CAST(n_t AS BIGINT) AS n_at_risk,
       d_t AS n_events, c_t AS n_censored,
       CAST(s_micro AS BIGINT) AS survival_micro
FROM s ORDER BY duration_days
"""


KM_SQL = f"""
WITH RECURSIVE base AS (
  SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS eday
  FROM events
),
per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN eday END) AS d_signup,
         min(CASE WHEN event_type = 'purchase' THEN eday END)
           AS d_first_purchase
  FROM base GROUP BY 1
),
log_end AS (SELECT max(eday) AS d_end FROM base),
durations AS (
  SELECT CASE WHEN d_first_purchase >= d_signup
              THEN d_first_purchase - d_signup END AS t_event,
         CASE WHEN d_first_purchase IS NULL OR d_first_purchase < d_signup
              THEN d_end - d_signup END AS t_censor
  FROM per_user, log_end
  WHERE d_signup IS NOT NULL
),
km_grid_raw AS (
  SELECT coalesce(t_event, t_censor) AS t,
         CAST(sum(CASE WHEN t_event IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS d_t,
         CAST(sum(CASE WHEN t_event IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS c_t
  FROM durations GROUP BY 1
)
{_km_sql('//').lstrip().replace('WITH RECURSIVE g AS', ', g AS', 1)}
"""


def nelson_aalen_cum_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative hazard over the same signup→purchase
    duration grid as :func:`kaplan_meier_first_purchase` — the additive
    counterpart (H(t) = Σ d/n) analysts overlay on the KM curve: where
    KM answers "what fraction survives", the hazard slope shows WHEN
    conversion pressure rises or fades.

    Because the estimator is a SUM (not a product), no recursion is
    needed: risk sets are a suffix sum and the cumulative hazard a
    prefix sum over the duration grid, each step's ``d·1e6 DIV n``
    floored once — deterministic integers, and the whole curve is two
    window passes over a date-domain-bounded relation.
    """
    grid = _survival_grid(spark, sf_dir)
    w_risk = Window.orderBy("t").rowsBetween(0, Window.unboundedFollowing)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risked = grid.withColumn(
        "n_t", F.sum(F.expr("d_t + c_t")).over(w_risk)
    ).withColumn(
        "hazard_step_micro",
        F.expr(f"CAST(d_t * {KM_SCALE} AS BIGINT) DIV n_t"),
    )
    return risked.select(
        F.col("t").alias("duration_days"),
        F.col("n_t").cast("long").alias("n_at_risk"),
        F.col("d_t").alias("n_events"),
        F.col("c_t").alias("n_censored"),
        "hazard_step_micro",
        F.sum("hazard_step_micro")
        .over(w_cum)
        .cast("long")
        .alias("cum_hazard_micro"),
    ).orderBy("duration_days")


NELSON_AALEN_SQL = f"""
WITH base AS (
  SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS eday
  FROM events
),
per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'signup' THEN eday END) AS d_signup,
         min(CASE WHEN event_type = 'purchase' THEN eday END)
           AS d_first_purchase
  FROM base GROUP BY 1
),
log_end AS (SELECT max(eday) AS d_end FROM base),
durations AS (
  SELECT CASE WHEN d_first_purchase >= d_signup
              THEN d_first_purchase - d_signup END AS t_event,
         CASE WHEN d_first_purchase IS NULL OR d_first_purchase < d_signup
              THEN d_end - d_signup END AS t_censor
  FROM per_user, log_end
  WHERE d_signup IS NOT NULL
),
grid AS (
  SELECT coalesce(t_event, t_censor) AS t,
         CAST(sum(CASE WHEN t_event IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS d_t,
         CAST(sum(CASE WHEN t_event IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS c_t
  FROM durations GROUP BY 1
),
risked AS (
  SELECT t, d_t, c_t,
         sum(d_t + c_t) OVER (ORDER BY t
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_t,
         d_t * {KM_SCALE} // sum(d_t + c_t) OVER (ORDER BY t
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS hazard_step_micro
  FROM grid
)
SELECT t AS duration_days, CAST(n_t AS BIGINT) AS n_at_risk,
       d_t AS n_events, c_t AS n_censored,
       CAST(hazard_step_micro AS BIGINT) AS hazard_step_micro,
       CAST(sum(hazard_step_micro) OVER (ORDER BY t
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_hazard_micro
FROM risked
ORDER BY duration_days
"""


def propensity_forecast_brier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier-style forecast error of the item propensity model: the
    first time half's per-item view→purchase rate predicts the second
    half's realized rate; the report is the second-half-views-weighted
    squared error in ppm², plus the skill score against the
    everything-gets-the-global-rate baseline — the "is the per-item
    model better than no model" gate.

    All rates are ppm-floored integers (same convention as
    ``propensity_ipw_weights``), errors are exact integer ppm², and
    the weighted means are single truncating DECIMAL(38) divisions.
    Scale shape: one scan tags halves, one per-(item, half) aggregate;
    everything after is item-catalog-sized.
    """
    e = load_table(spark, sf_dir, "events").select(
        json_long().alias("item"),
        "event_type",
        F.expr("unix_micros(ts) DIV 86400000000").alias("eday"),
    ).filter(F.col("item").isNotNull())
    bounds = e.agg(F.min("eday").alias("d0"), F.max("eday").alias("d1"))
    per = (
        e.crossJoin(F.broadcast(bounds))
        .withColumn(
            "half",
            F.expr("CASE WHEN eday <= (d0 + d1) DIV 2 THEN 1 ELSE 2 END"),
        )
        .groupBy("item")
        .agg(
            F.sum(
                F.when(
                    (F.col("half") == 1) & (F.col("event_type") == "view"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("v1"),
            F.sum(
                F.when(
                    (F.col("half") == 1)
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("p1"),
            F.sum(
                F.when(
                    (F.col("half") == 2) & (F.col("event_type") == "view"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("v2"),
            F.sum(
                F.when(
                    (F.col("half") == 2)
                    & (F.col("event_type") == "purchase"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("p2"),
        )
        .filter("v1 > 0 AND v2 > 0")
    )
    rates = per.select(
        "v2",
        F.expr(
            "CAST(CAST(p1 AS DECIMAL(38,0)) * 1000000 DIV v1 AS BIGINT)"
        ).alias("pred_ppm"),
        F.expr(
            "CAST(CAST(p2 AS DECIMAL(38,0)) * 1000000 DIV v2 AS BIGINT)"
        ).alias("real_ppm"),
    )
    glob = per.agg(
        F.expr(
            "CAST(CAST(sum(p1) AS DECIMAL(38,0)) * 1000000"
            " DIV sum(v1) AS BIGINT)"
        ).alias("global_ppm")
    )
    agg = rates.crossJoin(F.broadcast(glob)).agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("v2").cast("long").alias("total_views2"),
        F.sum(
            F.expr(
                "CAST(v2 AS DECIMAL(38,0))"
                " * (pred_ppm - real_ppm) * (pred_ppm - real_ppm)"
            )
        ).alias("werr"),
        F.sum(
            F.expr(
                "CAST(v2 AS DECIMAL(38,0))"
                " * (global_ppm - real_ppm) * (global_ppm - real_ppm)"
            )
        ).alias("werr_base"),
    )
    return agg.select(
        "n_items",
        "total_views2",
        F.expr("CAST(werr DIV total_views2 AS BIGINT)").alias(
            "brier_ppm2"
        ),
        F.expr("CAST(werr_base DIV total_views2 AS BIGINT)").alias(
            "brier_baseline_ppm2"
        ),
        F.expr(
            "CAST(1000000 - werr * 1000000 DIV greatest(werr_base, 1)"
            " AS BIGINT)"
        ).alias("skill_ppm"),
    )


PROPENSITY_BRIER_SQL = """
WITH base AS (
  SELECT TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) AS item,
         event_type, epoch_us(ts) // 86400000000 AS eday
  FROM events WHERE TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) IS NOT NULL
),
bounds AS (SELECT min(eday) AS d0, max(eday) AS d1 FROM base),
per AS (
  SELECT item,
         CAST(sum(CASE WHEN b.eday <= (d.d0 + d.d1) // 2
                        AND event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS v1,
         CAST(sum(CASE WHEN b.eday <= (d.d0 + d.d1) // 2
                        AND event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS p1,
         CAST(sum(CASE WHEN b.eday > (d.d0 + d.d1) // 2
                        AND event_type = 'view' THEN 1 ELSE 0 END)
              AS BIGINT) AS v2,
         CAST(sum(CASE WHEN b.eday > (d.d0 + d.d1) // 2
                        AND event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS p2
  FROM base b, bounds d
  GROUP BY item
),
kept AS (SELECT * FROM per WHERE v1 > 0 AND v2 > 0),
gl AS (
  SELECT CAST(CAST(sum(p1) AS HUGEINT) * 1000000 // sum(v1) AS BIGINT)
    AS global_ppm
  FROM kept
),
rates AS (
  SELECT v2,
         CAST(CAST(p1 AS HUGEINT) * 1000000 // v1 AS BIGINT) AS pred_ppm,
         CAST(CAST(p2 AS HUGEINT) * 1000000 // v2 AS BIGINT) AS real_ppm
  FROM kept
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(v2) AS BIGINT) AS total_views2,
         sum(v2::HUGEINT * (pred_ppm - real_ppm) * (pred_ppm - real_ppm))
           AS werr,
         sum(v2::HUGEINT * (g.global_ppm - real_ppm)
             * (g.global_ppm - real_ppm)) AS werr_base
  FROM rates, gl g
)
SELECT n_items, total_views2,
       CAST(werr // total_views2 AS BIGINT) AS brier_ppm2,
       CAST(werr_base // total_views2 AS BIGINT) AS brier_baseline_ppm2,
       CAST(1000000 - werr * 1000000 // greatest(werr_base, 1) AS BIGINT)
         AS skill_ppm
FROM agg
"""


def _daily_rev_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day (purchase revenue cents, click count) series — the
    date-domain-bounded rollup both rank-correlation queries run on."""
    base = _cents_events(spark, sf_dir)
    return base.groupBy("eday").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", F.col("cents")).otherwise(
                F.lit(0)
            )
        )
        .cast("long")
        .alias("rev"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("long")
        .alias("clk"),
    )


def spearman_daily_rev_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Spearman rank correlation between daily purchase revenue
    and daily click volume — the monotone-association check ("do clicks
    move with money at all?") run before any linear model; robust to
    the revenue outliers that break the Pearson number in
    ``profile_correlations``.

    Ranks use the average-rank tie convention, DOUBLED so they stay
    integral: ``u = 2·rank + cnt_eq − 1`` (= twice the average rank,
    since ``rank`` already counts strictly-smaller values + 1).  The
    Pearson form on those integer ranks then needs no square root:
    the report is the SIGNED SQUARED rho, ``sign(num)·num²·1e6 DIV
    (den_x·den_y)``, one truncating DECIMAL(38) division — the same
    signed-square-micro convention as the F / tau statistics here.

    Scale shape: one map-combinable shuffle from the event log to the
    per-day rollup (date-domain bounded); the two unpartitioned rank
    windows and the final 1-row aggregate run over that rollup, never
    the log (allowlisted in ``tests/test_window_lint.py``).
    """
    daily = _daily_rev_clicks(spark, sf_dir)
    w_rev = Window.orderBy("rev")
    w_clk = Window.orderBy("clk")
    ranked = daily.select(
        (
            2 * F.rank().over(w_rev)
            + F.count(F.lit(1)).over(Window.partitionBy("rev"))
            - 1
        )
        .cast("decimal(38,0)")
        .alias("u"),
        (
            2 * F.rank().over(w_clk)
            + F.count(F.lit(1)).over(Window.partitionBy("clk"))
            - 1
        )
        .cast("decimal(38,0)")
        .alias("v"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("u").alias("su"),
        F.sum("v").alias("sv"),
        F.sum(F.expr("u * u")).alias("suu"),
        F.sum(F.expr("v * v")).alias("svv"),
        F.sum(F.expr("u * v")).alias("suv"),
    )
    return agg.select(
        "n_days",
        F.expr("CAST(n_days * suv - su * sv AS BIGINT)").alias("num"),
        F.expr("CAST(n_days * suu - su * su AS BIGINT)").alias("den_x"),
        F.expr("CAST(n_days * svv - sv * sv AS BIGINT)").alias("den_y"),
        F.expr(
            "CAST(CASE WHEN n_days * suv - su * sv < 0 THEN -1 ELSE 1 END"
            " * ((n_days * suv - su * sv) * (n_days * suv - su * sv)"
            "    * 1000000"
            "    DIV ((n_days * suu - su * su) * (n_days * svv - sv * sv)))"
            " AS BIGINT)"
        ).alias("rho_sq_signed_micro"),
    )


SPEARMAN_SQL = """
WITH base AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS eday,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
daily AS (
  SELECT eday,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN cents
                       ELSE 0 END) AS BIGINT) AS rev,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS clk
  FROM base GROUP BY 1
),
ranked AS (
  SELECT (2 * rank() OVER (ORDER BY rev)
          + count(*) OVER (PARTITION BY rev) - 1)::HUGEINT AS u,
         (2 * rank() OVER (ORDER BY clk)
          + count(*) OVER (PARTITION BY clk) - 1)::HUGEINT AS v
  FROM daily
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days,
         sum(u) AS su, sum(v) AS sv,
         sum(u * u) AS suu, sum(v * v) AS svv, sum(u * v) AS suv
  FROM ranked
)
SELECT n_days,
       CAST(n_days * suv - su * sv AS BIGINT) AS num,
       CAST(n_days * suu - su * su AS BIGINT) AS den_x,
       CAST(n_days * svv - sv * sv AS BIGINT) AS den_y,
       CAST(CASE WHEN n_days * suv - su * sv < 0 THEN -1 ELSE 1 END
            * ((n_days * suv - su * sv) * (n_days * suv - su * sv)
               * 1000000
               // ((n_days * suu - su * su) * (n_days * svv - sv * sv)))
            AS BIGINT) AS rho_sq_signed_micro
FROM agg
"""


def kendall_daily_rev_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kendall tau-b between the same daily revenue / click
    series — the pairwise-agreement complement to Spearman (tau reacts
    to every inversion equally, Spearman to their distance), with the
    standard tie correction in the denominator.

    All-pairs over the DAILY rollup (a date-domain-bounded relation:
    the pair count grows with days², never with event rows), so the
    broadcast nested-loop self-join is scale-safe by construction.
    Concordance is decided by sign comparison — no products of
    revenue deltas, so nothing can overflow — and the report is the
    signed squared tau-b in micro-units, same convention as Spearman.
    """
    daily = _daily_rev_clicks(spark, sf_dir)
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a.eday") < F.col("b.eday"))
    dx_pos = F.col("a.rev") > F.col("b.rev")
    dx_neg = F.col("a.rev") < F.col("b.rev")
    dy_pos = F.col("a.clk") > F.col("b.clk")
    dy_neg = F.col("a.clk") < F.col("b.clk")
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(
            F.when((dx_pos & dy_pos) | (dx_neg & dy_neg), 1).otherwise(0)
        )
        .cast("long")
        .alias("concordant"),
        F.sum(
            F.when((dx_pos & dy_neg) | (dx_neg & dy_pos), 1).otherwise(0)
        )
        .cast("long")
        .alias("discordant"),
        F.sum(F.when(F.col("a.rev") == F.col("b.rev"), 1).otherwise(0))
        .cast("long")
        .alias("tie_x"),
        F.sum(F.when(F.col("a.clk") == F.col("b.clk"), 1).otherwise(0))
        .cast("long")
        .alias("tie_y"),
    )
    return agg.select(
        "n_pairs",
        "concordant",
        "discordant",
        "tie_x",
        "tie_y",
        F.expr(
            "CAST(CASE WHEN concordant < discordant THEN -1 ELSE 1 END"
            " * (CAST(concordant - discordant AS DECIMAL(38,0))"
            "    * (concordant - discordant) * 1000000"
            "    DIV (CAST(n_pairs - tie_x AS DECIMAL(38,0))"
            "         * (n_pairs - tie_y))) AS BIGINT)"
        ).alias("tau_b_sq_signed_micro"),
    )


KENDALL_SQL = """
WITH base AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS eday,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
daily AS (
  SELECT eday,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN cents
                       ELSE 0 END) AS BIGINT) AS rev,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS clk
  FROM base GROUP BY 1
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN (a.rev > b.rev AND a.clk > b.clk)
                         OR (a.rev < b.rev AND a.clk < b.clk)
                       THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
         CAST(sum(CASE WHEN (a.rev > b.rev AND a.clk < b.clk)
                         OR (a.rev < b.rev AND a.clk > b.clk)
                       THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
         CAST(sum(CASE WHEN a.rev = b.rev THEN 1 ELSE 0 END)
              AS BIGINT) AS tie_x,
         CAST(sum(CASE WHEN a.clk = b.clk THEN 1 ELSE 0 END)
              AS BIGINT) AS tie_y
  FROM daily a JOIN daily b ON a.eday < b.eday
)
SELECT n_pairs, concordant, discordant, tie_x, tie_y,
       CAST(CASE WHEN concordant < discordant THEN -1 ELSE 1 END
            * ((concordant - discordant)::HUGEINT
               * (concordant - discordant) * 1000000
               // ((n_pairs - tie_x)::HUGEINT * (n_pairs - tie_y)))
            AS BIGINT) AS tau_b_sq_signed_micro
FROM agg
"""


#: pinball-loss quantile (×10 to stay integral: τ = PINBALL_TAU10/10)
PINBALL_TAU10 = 9


def pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss of a P90 value forecast per event type —
    the proper scoring rule for quantile forecasts: fit the 0.9
    quantile on the first time half, score it on the second.  This is
    the eval a capacity/inventory forecast ships with; MAE/MSE can't
    rank quantile forecasts, pinball can.

    The P90 is RANK-SELECTED on the training half — the value at
    ``ceil(0.9·n)`` in cents order, i.e. the smallest cents whose
    cumulative count reaches the rank (ties make the (cents, event_id)
    row order and the value-rollup form pick the SAME value, and the
    rollup form never sorts rows) — and the loss stays integral by
    scaling by 10: per test row ``y ≥ q̂ ? 9·(y−q̂) : (q̂−y)``, so the
    mean loss is one truncating DECIMAL(38) division in micro-cents at
    the end.

    Scale shape: one scan tags halves (the bounds aggregate is a
    broadcast 1-row); the quantile comes from a prefix sum over the
    per-(type, distinct-cents) ROLLUP — value-domain bounded, the same
    shape as ``auc_roc_eval`` — never from a row-level sort; and the
    k-row quantile table broadcasts back onto the test-half aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        "event_id",
        F.expr("unix_micros(ts) DIV 86400000000").alias("eday"),
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
    )
    bounds = base.agg(
        F.min("eday").alias("d0"), F.max("eday").alias("d1")
    )
    tagged = base.crossJoin(F.broadcast(bounds)).withColumn(
        "half",
        F.expr("CASE WHEN eday <= (d0 + d1) DIV 2 THEN 1 ELSE 2 END"),
    )
    counts = (
        tagged.filter("half = 1")
        .groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.select(
        "event_type",
        "cents",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt")
        .over(Window.partitionBy("event_type"))
        .cast("long")
        .alias("n"),
    )
    q = (
        cum.filter(F.expr(f"cum >= ({PINBALL_TAU10} * n + 9) DIV 10"))
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_train"),
            F.min("cents").alias("q90_cents"),
        )
    )
    test = tagged.filter("half = 2").join(F.broadcast(q), "event_type")
    out = test.groupBy("event_type").agg(
        F.max("n_train").alias("n_train"),
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.max("q90_cents").alias("q90_cents"),
        F.sum(
            F.expr(
                f"CAST(CASE WHEN cents >= q90_cents"
                f" THEN {PINBALL_TAU10} * (cents - q90_cents)"
                f" ELSE ({10 - PINBALL_TAU10}) * (q90_cents - cents)"
                f" END AS DECIMAL(38,0))"
            )
        ).alias("loss10"),
    )
    return out.select(
        "event_type",
        "n_train",
        "n_test",
        "q90_cents",
        F.expr("CAST(loss10 AS BIGINT)").alias("pinball_loss10"),
        F.expr(
            "CAST(loss10 * 1000000 DIV (10 * n_test) AS BIGINT)"
        ).alias("mean_loss_microcents"),
    ).orderBy("event_type")


PINBALL_SQL = f"""
WITH base AS (
  SELECT event_type, event_id,
         epoch_us(ts) // 86400000000 AS eday,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
bounds AS (SELECT min(eday) AS d0, max(eday) AS d1 FROM base),
tagged AS (
  SELECT b.*, CASE WHEN b.eday <= (d.d0 + d.d1) // 2 THEN 1 ELSE 2 END AS half
  FROM base b, bounds d
),
train AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM tagged WHERE half = 1
),
q AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n_train,
         max(CASE WHEN rn = ({PINBALL_TAU10} * n + 9) // 10
                  THEN cents END) AS q90_cents
  FROM train GROUP BY event_type
),
test AS (
  SELECT t.event_type, q.n_train, q.q90_cents, t.cents
  FROM tagged t JOIN q USING (event_type) WHERE t.half = 2
)
SELECT event_type, n_train,
       CAST(count(*) AS BIGINT) AS n_test,
       q90_cents,
       CAST(sum(CASE WHEN cents >= q90_cents
                     THEN {PINBALL_TAU10}::HUGEINT * (cents - q90_cents)
                     ELSE ({10 - PINBALL_TAU10})::HUGEINT
                          * (q90_cents - cents) END) AS BIGINT)
         AS pinball_loss10,
       CAST(sum(CASE WHEN cents >= q90_cents
                     THEN {PINBALL_TAU10}::HUGEINT * (cents - q90_cents)
                     ELSE ({10 - PINBALL_TAU10})::HUGEINT
                          * (q90_cents - cents) END)
            * 1000000 // (10 * count(*)) AS BIGINT)
         AS mean_loss_microcents
FROM test
GROUP BY event_type, n_train, q90_cents
ORDER BY event_type
"""


def conformal_interval_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-conformal prediction-interval calibration per event type —
    the distribution-free "is my ±interval honest?" check: fit a point
    predictor on the first time third, take the 90% conformal quantile
    of absolute residuals on the second, measure empirical coverage on
    the third.  Proper three-way split, so the coverage number is a
    genuine out-of-sample guarantee check, not resubstitution.

    Everything is rank-exact integers: the fit median and the
    calibration quantile are rank selections (the conformal rank is
    ``ceil(0.9·(n_cal+1))``, clamped to n_cal — the unclamped rank
    means an infinite interval, reported via ``qhat_clamped``), and
    coverage is an integer ppm ratio.

    Scale shape: one scan tags thirds; both rank selections are prefix
    sums over per-(type, distinct-value) ROLLUPS (value-domain
    bounded — no row-level sort anywhere); the k-row (median, q̂)
    table broadcasts onto the test-third aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        "event_id",
        F.expr("unix_micros(ts) DIV 86400000000").alias("eday"),
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
    )
    bounds = base.agg(F.min("eday").alias("d0"), F.max("eday").alias("d1"))
    tagged = base.crossJoin(F.broadcast(bounds)).withColumn(
        "part",
        F.expr(
            "CASE WHEN eday <= d0 + (d1 - d0) DIV 3 THEN 1"
            " WHEN eday <= d0 + (2 * (d1 - d0)) DIV 3 THEN 2"
            " ELSE 3 END"
        ),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fit_cum = (
        tagged.filter("part = 1")
        .groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "event_type",
            "cents",
            F.sum("cnt").over(wcum).alias("cum"),
            F.sum("cnt")
            .over(Window.partitionBy("event_type"))
            .cast("long")
            .alias("n"),
        )
    )
    med = (
        fit_cum.filter(F.expr("cum >= (n + 1) DIV 2"))
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_fit"),
            F.min("cents").alias("median_cents"),
        )
    )
    cal = tagged.filter("part = 2").join(F.broadcast(med), "event_type")
    wscum = (
        Window.partitionBy("event_type")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    score_cum = (
        cal.select(
            "event_type",
            "n_fit",
            "median_cents",
            F.expr("abs(cents - median_cents)").alias("score"),
        )
        .groupBy("event_type", "n_fit", "median_cents", "score")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(
            "event_type",
            "n_fit",
            "median_cents",
            "score",
            F.sum("cnt").over(wscum).alias("cum"),
            F.sum("cnt")
            .over(Window.partitionBy("event_type"))
            .cast("long")
            .alias("n_cal"),
        )
    )
    qhat = (
        score_cum.filter(
            F.expr("cum >= LEAST((9 * (n_cal + 1) + 9) DIV 10, n_cal)")
        )
        .groupBy("event_type")
        .agg(
            F.max("n_fit").alias("n_fit"),
            F.max("median_cents").alias("median_cents"),
            F.max("n_cal").cast("long").alias("n_cal"),
            F.min("score").alias("qhat_cents"),
            F.max(
                F.expr(
                    "CAST((9 * (n_cal + 1) + 9) DIV 10 > n_cal AS INT)"
                )
            ).alias("qhat_clamped"),
        )
    )
    test = tagged.filter("part = 3").join(F.broadcast(qhat), "event_type")
    return (
        test.groupBy("event_type")
        .agg(
            F.max("n_fit").alias("n_fit"),
            F.max("n_cal").alias("n_cal"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.max("median_cents").alias("median_cents"),
            F.max("qhat_cents").alias("qhat_cents"),
            F.max("qhat_clamped").alias("qhat_clamped"),
            F.sum(
                F.expr(
                    "CAST(abs(cents - median_cents) <= qhat_cents AS BIGINT)"
                )
            )
            .cast("long")
            .alias("n_covered"),
        )
        .withColumn(
            "coverage_ppm",
            F.expr(
                "CAST(CAST(n_covered AS DECIMAL(38,0)) * 1000000"
                " DIV n_test AS BIGINT)"
            ),
        )
        .orderBy("event_type")
    )


CONFORMAL_SQL = """
WITH base AS (
  SELECT event_type, event_id,
         epoch_us(ts) // 86400000000 AS eday,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
bounds AS (SELECT min(eday) AS d0, max(eday) AS d1 FROM base),
tagged AS (
  SELECT b.*,
         CASE WHEN b.eday <= d.d0 + (d.d1 - d.d0) // 3 THEN 1
              WHEN b.eday <= d.d0 + (2 * (d.d1 - d.d0)) // 3 THEN 2
              ELSE 3 END AS part
  FROM base b, bounds d
),
fit AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM tagged WHERE part = 1
),
med AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n_fit,
         max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS median_cents
  FROM fit GROUP BY event_type
),
scored AS (
  SELECT t.event_type, m.n_fit, m.median_cents,
         abs(t.cents - m.median_cents) AS score,
         row_number() OVER (PARTITION BY t.event_type
                            ORDER BY abs(t.cents - m.median_cents),
                                     t.event_id) AS rn,
         count(*) OVER (PARTITION BY t.event_type) AS n_cal
  FROM tagged t JOIN med m USING (event_type) WHERE t.part = 2
),
qhat AS (
  SELECT event_type, max(n_fit) AS n_fit,
         max(median_cents) AS median_cents,
         CAST(max(n_cal) AS BIGINT) AS n_cal,
         max(CASE WHEN rn = LEAST((9 * (n_cal + 1) + 9) // 10, n_cal)
                  THEN score END) AS qhat_cents,
         max(CASE WHEN (9 * (n_cal + 1) + 9) // 10 > n_cal
                  THEN 1 ELSE 0 END) AS qhat_clamped
  FROM scored GROUP BY event_type
),
test AS (
  SELECT t.event_type, q.n_fit, q.n_cal, q.median_cents, q.qhat_cents,
         q.qhat_clamped, t.cents
  FROM tagged t JOIN qhat q USING (event_type) WHERE t.part = 3
)
SELECT event_type, n_fit, n_cal,
       CAST(count(*) AS BIGINT) AS n_test,
       median_cents, qhat_cents, CAST(qhat_clamped AS INT) AS qhat_clamped,
       CAST(sum(CASE WHEN abs(cents - median_cents) <= qhat_cents
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       CAST(sum(CASE WHEN abs(cents - median_cents) <= qhat_cents
                     THEN 1 ELSE 0 END)::HUGEINT * 1000000 // count(*)
            AS BIGINT) AS coverage_ppm
FROM test
GROUP BY event_type, n_fit, n_cal, median_cents, qhat_cents, qhat_clamped
ORDER BY event_type
"""


def pr_curve_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 at the nine decile thresholds of the score
    distribution — the operating-point panel read next to
    :func:`auc_roc_eval`'s single ranking number when choosing a
    production cutoff (purchase = positive, cent value = score,
    "predict positive" = score ≥ threshold).

    Same distributed shape as the AUC: ONE map-combinable shuffle from
    the event log to the per-distinct-cents rollup (value-domain
    bounded), then inclusive prefix sums over that rollup.  Thresholds
    are rank-selected ON THE ROLLUP (smallest cents whose cumulative
    count reaches d·N/10 — the two-pass bucket-prefix pattern, never a
    row-level ``ntile``), and TP/FP at a threshold are suffix sums
    derived from the same prefix relation.  Every reported ratio is an
    exact ``·1e6 DIV`` integer, so no float boundary can flip a row.
    """
    base = _cents_events(spark, sf_dir)
    per = base.groupBy("cents").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("pos_s"),
        F.sum(F.when(F.col("event_type") != "purchase", 1).otherwise(0))
        .cast("long")
        .alias("neg_s"),
    )
    w_inc = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "cents",
        "pos_s",
        "neg_s",
        F.sum(F.expr("pos_s + neg_s")).over(w_inc).alias("cum_all"),
        F.sum("pos_s").over(w_inc).alias("cum_pos"),
        F.sum("neg_s").over(w_inc).alias("cum_neg"),
    )
    tot = per.agg(
        F.sum("pos_s").cast("long").alias("n_pos"),
        F.sum("neg_s").cast("long").alias("n_neg"),
    )
    deciles = spark.createDataFrame([(d,) for d in range(1, 10)], "decile int")
    picked = (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(deciles))
        .filter(
            F.col("cum_all")
            >= F.expr("(decile * (n_pos + n_neg) + 9) DIV 10")
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("decile").orderBy("cents")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    return picked.select(
        "decile",
        F.col("cents").alias("threshold_cents"),
        # predict positive ⟺ score ≥ threshold: suffix sums including
        # the threshold row itself
        (F.col("n_pos") - F.col("cum_pos") + F.col("pos_s"))
        .cast("long")
        .alias("tp"),
        (F.col("n_neg") - F.col("cum_neg") + F.col("neg_s"))
        .cast("long")
        .alias("fp"),
        (F.col("cum_pos") - F.col("pos_s")).cast("long").alias("fn"),
        # DECIMAL(38,0) before the ×1e6 so counts past ~9e12 cannot
        # silently wrap (DuckDB's BIGINT would raise; keep failure
        # modes aligned — same convention as auc_roc_eval)
        # zero-denominator guards: a degenerate log (no positives, or a
        # threshold with no predicted positives) gives Spark DIV NULL
        # but DuckDB // an error — pin both engines to 0
        F.expr(
            "CAST(CASE WHEN (n_pos - cum_pos + pos_s)"
            "            + (n_neg - cum_neg + neg_s) = 0 THEN 0"
            " ELSE CAST(n_pos - cum_pos + pos_s AS DECIMAL(38,0)) * 1000000"
            " DIV ((n_pos - cum_pos + pos_s) + (n_neg - cum_neg + neg_s))"
            " END AS BIGINT)"
        ).alias("precision_ppm"),
        F.expr(
            "CAST(CASE WHEN n_pos = 0 THEN 0"
            " ELSE CAST(n_pos - cum_pos + pos_s AS DECIMAL(38,0)) * 1000000"
            " DIV n_pos END AS BIGINT)"
        ).alias("recall_ppm"),
        F.expr(
            "CAST(CASE WHEN 2 * (n_pos - cum_pos + pos_s)"
            "     + (n_neg - cum_neg + neg_s) + (cum_pos - pos_s) = 0 THEN 0"
            " ELSE CAST(2 * (n_pos - cum_pos + pos_s) AS DECIMAL(38,0))"
            " * 1000000"
            " DIV (2 * (n_pos - cum_pos + pos_s)"
            "      + (n_neg - cum_neg + neg_s) + (cum_pos - pos_s))"
            " END AS BIGINT)"
        ).alias("f1_ppm"),
    ).orderBy("decile")


PR_CURVE_SQL = """
WITH base AS (
  SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
per AS (
  SELECT cents,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS pos_s,
         CAST(sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS neg_s
  FROM base GROUP BY 1
),
cum AS (
  SELECT cents, pos_s, neg_s,
         sum(pos_s + neg_s) OVER w AS cum_all,
         sum(pos_s) OVER w AS cum_pos,
         sum(neg_s) OVER w AS cum_neg
  FROM per
  WINDOW w AS (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
tot AS (
  SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos,
         CAST(sum(neg_s) AS BIGINT) AS n_neg
  FROM per
),
picked AS (
  SELECT d.decile, c.cents, c.pos_s, c.neg_s, c.cum_pos, c.cum_neg,
         t.n_pos, t.n_neg,
         row_number() OVER (PARTITION BY d.decile ORDER BY c.cents) AS rn
  FROM cum c
  CROSS JOIN tot t
  CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS decile) d
  WHERE c.cum_all >= (d.decile * (t.n_pos + t.n_neg) + 9) // 10
)
SELECT CAST(decile AS INTEGER) AS decile,
       cents AS threshold_cents,
       CAST(n_pos - cum_pos + pos_s AS BIGINT) AS tp,
       CAST(n_neg - cum_neg + neg_s AS BIGINT) AS fp,
       CAST(cum_pos - pos_s AS BIGINT) AS fn,
       CAST(CASE WHEN (n_pos - cum_pos + pos_s)
                      + (n_neg - cum_neg + neg_s) = 0 THEN 0
            ELSE (n_pos - cum_pos + pos_s)::HUGEINT * 1000000
            // ((n_pos - cum_pos + pos_s) + (n_neg - cum_neg + neg_s))
            END AS BIGINT) AS precision_ppm,
       CAST(CASE WHEN n_pos = 0 THEN 0
            ELSE (n_pos - cum_pos + pos_s)::HUGEINT * 1000000 // n_pos
            END AS BIGINT) AS recall_ppm,
       CAST(CASE WHEN 2 * (n_pos - cum_pos + pos_s)
                      + (n_neg - cum_neg + neg_s) + (cum_pos - pos_s) = 0
            THEN 0
            ELSE (2 * (n_pos - cum_pos + pos_s))::HUGEINT * 1000000
            // (2 * (n_pos - cum_pos + pos_s)
                + (n_neg - cum_neg + neg_s) + (cum_pos - pos_s))
            END AS BIGINT) AS f1_ppm
FROM picked
WHERE rn = 1
ORDER BY decile
"""


SPARK_QUERIES = {
    "pr_curve_points": pr_curve_points,
    "auc_roc_eval": auc_roc_eval,
    "ks_value_drift": ks_value_drift,
    "mann_whitney_value_shift": mann_whitney_value_shift,
    "anova_value_by_type": anova_value_by_type,
    "kaplan_meier_first_purchase": kaplan_meier_first_purchase,
    "spearman_daily_rev_clicks": spearman_daily_rev_clicks,
    "kendall_daily_rev_clicks": kendall_daily_rev_clicks,
    "pinball_loss_eval": pinball_loss_eval,
    "conformal_interval_calibration": conformal_interval_calibration,
    "nelson_aalen_cum_hazard": nelson_aalen_cum_hazard,
    "propensity_forecast_brier": propensity_forecast_brier,
}

ORACLE_SQL = {
    "pr_curve_points": PR_CURVE_SQL,
    "auc_roc_eval": AUC_ROC_SQL,
    "ks_value_drift": KS_VALUE_DRIFT_SQL,
    "mann_whitney_value_shift": MANN_WHITNEY_SQL,
    "anova_value_by_type": ANOVA_SQL,
    "kaplan_meier_first_purchase": KM_SQL,
    "spearman_daily_rev_clicks": SPEARMAN_SQL,
    "kendall_daily_rev_clicks": KENDALL_SQL,
    "pinball_loss_eval": PINBALL_SQL,
    "conformal_interval_calibration": CONFORMAL_SQL,
    "nelson_aalen_cum_hazard": NELSON_AALEN_SQL,
    "propensity_forecast_brier": PROPENSITY_BRIER_SQL,
}


#: defensive bound on the replay grid's item dimension: the spine is
#: |days| × min(|items with traffic|, this).  Orders of magnitude above
#: the fixtures' item count, so it never binds there.
BANDIT_CATALOG_CAP = 100_000


def bandit_replay_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline policy evaluation by the REPLAY estimator (Li et al.
    2011) — the unbiased way to grade a recommendation POLICY from
    logged traffic without an online test, the family the per-model
    evals here (AUC, Brier, nDCG) do not cover: a greedy policy picks
    one item per day (argmax Laplace-smoothed CTR over all history
    strictly BEFORE that day — no peeking), and only logged events
    that happen to match the policy's choice score it; matched clicks
    over matched views estimate the policy's online CTR.

    Deterministic end-to-end: day-1 history is empty so every item
    ties at the smoothed prior and the argmax tie-break (ctr DESC,
    item ASC) picks the smallest item; all rates are exact integer ppm
    and the lift is a DECIMAL/HUGEINT cross-multiplication.

    Scale: one event scan → (day, item) rollup; the exclusive
    cumulative window runs over the days×items relation (date- and
    catalog-bounded, never row-bounded); the replay join matches the
    1-row-per-day pick table back to the same rollup.  The item
    dimension is ALREADY bounded by observed traffic (it comes from
    the rollup, so zero-event catalog entries never join the grid) and
    is additionally capped at the ``BANDIT_CATALOG_CAP`` highest-
    traffic items (deterministic tie-break: events DESC, item ASC) so
    a corpus-sized catalog cannot inflate the date×catalog spine —
    the cap is far above any realistic competing set and does not
    bind on the test fixtures (hash-invariant there by construction).
    """
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        json_long().alias("item"),
        "event_type",
    ).filter(
        F.col("item").isNotNull()
        & F.col("event_type").isin("view", "click")
    )
    daily = e.groupBy("day", "item").agg(
        F.sum(F.expr("CASE WHEN event_type = 'view' THEN 1 ELSE 0 END"))
        .alias("v"),
        F.sum(F.expr("CASE WHEN event_type = 'click' THEN 1 ELSE 0 END"))
        .alias("c"),
    )
    # every (day, item) cell must exist for the argmax — an item with
    # no traffic yet still competes at the prior: day spine × item
    # catalog (date×catalog bounded, catalog capped defensively)
    days = daily.select("day").distinct()
    items = (
        daily.groupBy("item")
        .agg(F.sum(F.col("v") + F.col("c")).alias("n_ev"))
        .orderBy(F.desc("n_ev"), F.asc("item"))
        .limit(BANDIT_CATALOG_CAP)
        .select("item")
    )
    grid = days.crossJoin(items)
    full = grid.join(daily, ["day", "item"], "left").na.fill(
        0, ["v", "c"]
    )
    w_c = (
        Window.partitionBy("item")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hist = full.select(
        "day",
        "item",
        "v",
        "c",
        F.coalesce(F.sum("v").over(w_c), F.lit(0)).alias("cv"),
        F.coalesce(F.sum("c").over(w_c), F.lit(0)).alias("cc"),
    ).withColumn(
        "ctr_ppm",
        F.expr(
            "CAST(CAST(cc + 1 AS DECIMAL(38,0)) * 1000000"
            " DIV (cv + 2) AS BIGINT)"
        ),
    )
    w_p = Window.partitionBy("day").orderBy(
        F.desc("ctr_ppm"), F.asc("item")
    )
    picks = (
        hist.withColumn("rk", F.row_number().over(w_p))
        .filter(F.col("rk") == 1)
        .select("day", "item", "v", "c")
    )
    glob = e.agg(
        F.sum(F.expr("CASE WHEN event_type = 'view' THEN 1 ELSE 0 END"))
        .alias("gv"),
        F.sum(F.expr("CASE WHEN event_type = 'click' THEN 1 ELSE 0 END"))
        .alias("gc"),
    )
    return (
        picks.agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("v").cast("long").alias("matched_views"),
            F.sum("c").cast("long").alias("matched_clicks"),
        )
        .crossJoin(F.broadcast(glob))
        # empty-input parity: the oracle's GROUP BY over zero picks
        # emits no row, while the driver-side aggregate always exists —
        # filter so both engines omit it (no-op on any real log);
        # DECIMAL-widen the ppm products (the eb_shrunk overflow
        # discipline — gc/matched counts past ~9.2e12 would wrap)
        .filter(F.col("n_days") > 0)
        .select(
            "n_days",
            "matched_views",
            "matched_clicks",
            F.expr(
                "CAST(CAST(matched_clicks AS DECIMAL(38,0)) * 1000000"
                " DIV greatest(matched_views, 1) AS BIGINT)"
            ).alias("replay_ctr_ppm"),
            F.expr(
                "CAST(CAST(gc AS DECIMAL(38,0)) * 1000000"
                " DIV greatest(gv, 1) AS BIGINT)"
            ).alias("global_ctr_ppm"),
            F.expr(
                "CASE WHEN matched_views > 0 AND gc > 0 THEN"
                " CAST(CAST(matched_clicks AS DECIMAL(38,0)) * gv"
                " * 1000000 DIV (CAST(matched_views AS DECIMAL(38,0))"
                " * gc) AS BIGINT) END"
            ).alias("lift_ppm"),
        )
    )


BANDIT_REPLAY_SQL = f"""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day,
         TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) AS item, event_type
  FROM events
  WHERE TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) IS NOT NULL
    AND event_type IN ('view', 'click')
),
daily AS (
  SELECT day, item,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c
  FROM ev GROUP BY day, item
),
grid AS (
  SELECT d.day, i.item
  FROM (SELECT DISTINCT day FROM daily) d
  CROSS JOIN (SELECT item FROM (
                SELECT item, sum(v + c) AS n_ev FROM daily GROUP BY 1
                ORDER BY n_ev DESC, item ASC LIMIT {BANDIT_CATALOG_CAP})) i
),
full_ AS (
  SELECT g.day, g.item, coalesce(daily.v, 0) AS v, coalesce(daily.c, 0) AS c
  FROM grid g LEFT JOIN daily ON daily.day = g.day AND daily.item = g.item
),
hist AS (
  SELECT day, item, v, c,
         CAST(CAST(coalesce(sum(c) OVER (PARTITION BY item ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + 1 AS HUGEINT) * 1000000
              // (coalesce(sum(v) OVER (PARTITION BY item ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + 2) AS BIGINT) AS ctr_ppm
  FROM full_
),
picks AS (
  SELECT day, item, v, c FROM (
    SELECT *, row_number() OVER (
      PARTITION BY day ORDER BY ctr_ppm DESC, item ASC) AS rk
    FROM hist
  ) WHERE rk = 1
),
gtot AS (
  SELECT CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
           AS HUGEINT) AS gv,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
           AS HUGEINT) AS gc
  FROM ev
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(v) AS BIGINT) AS matched_views,
       CAST(sum(c) AS BIGINT) AS matched_clicks,
       CAST(CAST(sum(c) AS HUGEINT) * 1000000 // greatest(sum(v), 1)
         AS BIGINT) AS replay_ctr_ppm,
       CAST(CAST(gc AS HUGEINT) * 1000000 // greatest(gv, 1) AS BIGINT)
         AS global_ctr_ppm,
       CASE WHEN sum(v) > 0 AND gc > 0 THEN
         CAST(CAST(sum(c) AS HUGEINT) * gv * 1000000
              // (CAST(sum(v) AS HUGEINT) * gc) AS BIGINT)
       END AS lift_ppm
FROM picks, gtot
GROUP BY gv, gc
"""


SPARK_QUERIES["bandit_replay_ctr"] = bandit_replay_ctr
ORACLE_SQL["bandit_replay_ctr"] = BANDIT_REPLAY_SQL
