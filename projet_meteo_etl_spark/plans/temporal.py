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
from projet_meteo_etl_spark.functions.portable import pround, pround_sql, json_long
from projet_meteo_etl_spark.functions.twopass import bucket_prefix, exact_ntile


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


def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE interval join (no equi key), made shuffle-joinable by BIN
    BUCKETING: per purchase, count ALL clicks — any user — in the
    following 10 minutes.  Without a key, Catalyst's only plan is a
    broadcast-nested-loop (rows² comparisons); the rewrite buckets both
    sides into 10-minute bins and explodes each purchase into its two
    candidate bins — any in-range click lands in exactly ONE of them,
    so the bin becomes an exact equi key (hash/sort-merge join), with
    the precise interval predicate refined post-join.  This is the
    Databricks range-join-optimization technique expressed as plain
    DataFrame ops, and THE scale path for interval joins at 100 TB:
    cost drops from |P|·|C| to Σ_bin |P_bin|·|C_bin|.

    Sibling: :func:`range_join_clicks_after_purchase` has a user_id
    equi key, so it never needed the rewrite; this operator covers the
    keyless case (global windows, sensor fusion, ad exposure).
    """
    e = load_table(spark, sf_dir, "events")
    bin_us = 600_000_000
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.unix_micros("ts").alias("pus"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.unix_micros("ts").alias("cus")
    )
    c_b = c.withColumn("bin", F.expr(f"cus DIV {bin_us}"))
    probe = p.select(
        "p_id",
        "pus",
        F.explode(
            F.array(
                F.expr(f"pus DIV {bin_us}"),
                F.expr(f"pus DIV {bin_us} + 1"),
            )
        ).alias("bin"),
    )
    j = probe.join(c_b, "bin", "left")
    return (
        j.groupBy("p_id")
        .agg(
            F.sum(
                F.when(
                    (F.col("cus") > F.col("pus"))
                    & (F.col("cus") <= F.col("pus") + bin_us),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_clicks_10m")
        )
        .orderBy("p_id")
    )


RANGE_JOIN_BINNED_SQL = """
SELECT p.event_id AS p_id,
       CAST(sum(CASE WHEN c.ts > p.ts
                      AND epoch_us(c.ts) <= epoch_us(p.ts) + 600000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clicks_10m
FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT ts FROM events WHERE event_type = 'click') c
  ON c.ts > p.ts AND epoch_us(c.ts) <= epoch_us(p.ts) + 600000000
GROUP BY 1 ORDER BY 1
"""


#: funnel step window: each stage must follow the previous within 48 h
FUNNEL_STEP_US = 48 * 3600 * 1_000_000


def event_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase per user:
    first view, first click within 48 h of that view, first purchase
    within 48 h of that click; global stage counts plus the average
    click→purchase lag.

    Join-free sequence matching: the three stage timestamps are
    conditional-min WINDOW aggregates over the same user partition —
    one shuffle on user_id total (Spark stacks the three Window nodes
    on a single exchange), then a per-user rollup and a grand total.
    All arithmetic is integer microseconds; the average lag is an
    integer division, so the result is engine-exact.  At 100 TB this
    is the scale-correct funnel shape: no self-joins (a 3-way event
    self-join explodes on power users), state bounded per user.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("tus"),
    )
    wu = Window.partitionBy("user_id")
    s1 = e.withColumn(
        "tv",
        F.min(F.when(F.col("event_type") == "view", F.col("tus"))).over(wu),
    )
    s2 = s1.withColumn(
        "tc",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("tus") >= F.col("tv"))
                & (F.col("tus") <= F.col("tv") + FUNNEL_STEP_US),
                F.col("tus"),
            )
        ).over(wu),
    )
    s3 = s2.withColumn(
        "tp",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("tus") >= F.col("tc"))
                & (F.col("tus") <= F.col("tc") + FUNNEL_STEP_US),
                F.col("tus"),
            )
        ).over(wu),
    )
    per_user = s3.groupBy("user_id").agg(
        F.max("tv").alias("tv"), F.max("tc").alias("tc"), F.max("tp").alias("tp")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("users_total"),
        F.count("tv").alias("users_view"),
        F.count("tc").alias("users_click"),
        F.count("tp").alias("users_purchase"),
        F.coalesce(
            F.expr("sum(CASE WHEN tp IS NOT NULL THEN tp - tc END) div nullif(count(tp), 0)"),
            F.lit(-1).cast("long"),
        ).alias("avg_click_to_purchase_us"),
    )


FUNNEL_SQL = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
),
s1 AS (
  SELECT *, min(CASE WHEN event_type = 'view' THEN tus END)
              OVER (PARTITION BY user_id) AS tv
  FROM e
),
s2 AS (
  SELECT *, min(CASE WHEN event_type = 'click'
                      AND tus >= tv AND tus <= tv + {FUNNEL_STEP_US}
                     THEN tus END) OVER (PARTITION BY user_id) AS tc
  FROM s1
),
s3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase'
                      AND tus >= tc AND tus <= tc + {FUNNEL_STEP_US}
                     THEN tus END) OVER (PARTITION BY user_id) AS tp
  FROM s2
),
u AS (
  SELECT user_id, max(tv) AS tv, max(tc) AS tc, max(tp) AS tp
  FROM s3 GROUP BY user_id
)
SELECT count(*) AS users_total,
       count(tv) AS users_view,
       count(tc) AS users_click,
       count(tp) AS users_purchase,
       CAST(coalesce(sum(CASE WHEN tp IS NOT NULL THEN tp - tc END)
                  // nullif(count(tp), 0), -1) AS BIGINT) AS avg_click_to_purchase_us
FROM u
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first activity; for each (cohort_week, weeks-since-first) cell, how
    many of the cohort were active — the classic retention triangle.

    Two passes over the distinct (user, day) table (itself the only
    pass over raw events): first-activity per user, then a join-back on
    user_id and integer week arithmetic.  Counts are exact distinct
    users per cell; everything is integer date math.
    """
    e = load_table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    cells = (
        ud.join(first, "user_id")
        .select(
            "user_id",
            F.floor(
                F.datediff(F.col("first_day"), F.lit("2024-01-01").cast("date"))
                / 7
            )
            .cast("long")
            .alias("cohort_week"),
            F.floor(F.datediff(F.col("day"), F.col("first_day")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        cells.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


#: fixed-point scale for the retention-fit logs (integer milli-nats,
#: the vocab_zipf_fit convention)
RET_LOG_SCALE = 1000


def retention_halflife_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention half-life: OLS fit of ln(retention rate) against
    week-offset over the POOLED retention curve — the one-number decay
    summary ("we lose half the surviving actives every H weeks") a
    growth team reads off the triangle :func:`cohort_retention`
    reports.  Right-censoring handled: offset w's denominator counts
    only users whose observation window reaches w (first activity ≥
    7·w days before the log's end), so late cohorts don't drag the
    tail down.

    Exactness: retention rates are ppm integers; ln(rate) is floored
    to integer milli-nats (the ``vocab_zipf_fit`` fixed-point
    convention) so the regression moments are exact integer sums, and
    slope / r² / half-life are one fixed IEEE double sequence over
    them, ``pround``-ed identically in both engines.

    Scale: the distinct (user, day) pass and first-activity rollup are
    the corpus-sized work (shared shape with the cohort triangle);
    the fit runs over the week-offset domain — a handful of rows.  The
    offset spine is a static 1..63 range (both engines share the bound
    verbatim): a log spanning more than 63 weeks would need the spine
    widened — stated here so the cap is never silent.
    """
    e = load_table(spark, sf_dir, "events")
    # ud feeds first/maxd/the active join, and fw feeds active AND
    # eligible — persist both so the corpus-sized distinct pass runs
    # once, not ~5× (released via scoped_cache below)
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct().persist()
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    maxd = ud.agg(F.max("day").alias("max_day"))
    fw = first.crossJoin(F.broadcast(maxd)).select(
        "user_id",
        "first_day",
        F.floor(F.datediff(F.col("max_day"), F.col("first_day")) / 7)
        .cast("long")
        .alias("max_offset"),
    ).persist()
    active = (
        ud.join(fw, "user_id")
        .select(
            "user_id",
            F.floor(F.datediff(F.col("day"), F.col("first_day")) / 7)
            .cast("long")
            .alias("w"),
        )
        .filter(F.col("w") >= 1)
        .distinct()
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    eligible = (
        fw.select("user_id", F.col("max_offset"))
        .crossJoin(
            F.broadcast(
                spark.range(1, 64).select(F.col("id").alias("w"))
            )
        )
        .filter(F.col("w") <= F.col("max_offset"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_eligible"))
    )
    pts = (
        eligible.join(active, "w")
        # rate floor: a ppm rate that floor-divides to 0 would make the
        # oracle's ln() hard-error and Spark's F.log return NULL — drop
        # sub-ppm offsets (identically in both engines) instead
        .filter(F.col("n_active") * 1_000_000 >= F.col("n_eligible"))
        .select(
            F.col("w").alias("lx"),
            F.floor(
                F.lit(float(RET_LOG_SCALE))
                * F.log(
                    F.expr(
                        "CAST(n_active * 1000000 DIV n_eligible AS BIGINT)"
                    )
                )
            )
            .cast("long")
            .alias("ly"),
        )
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("ly") * F.col("ly")).alias("syy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    # <2 surviving points (or all at the same week) ⇒ var_x == 0; CASE-
    # guard so ANSI Spark emits NULL like the oracle's NULLIF instead
    # of raising DIVIDE_BY_ZERO (same for the var_x*var_y r2 term)
    slope = F.when(
        var_x > 0, cov_n / var_x / F.lit(float(RET_LOG_SCALE))
    )  # nats per week; NULL when degenerate
    import math

    from projet_meteo_etl_spark.cachescope import scoped_cache

    out = m.select(
        F.col("n").cast("long").alias("n_weeks"),
        pround(slope, 9).alias("decay_slope"),
        F.when(
            slope < 0, pround(F.lit(math.log(2.0)) / (-slope), 6)
        ).alias("halflife_weeks"),
        F.when(
            var_x * var_y > 0,
            pround(cov_n * cov_n / (var_x * var_y), 9),
        ).alias("r2"),
    )
    return scoped_cache(out, ud, fw)


RETENTION_HALFLIFE_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
first AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id),
maxd AS (SELECT max(day) AS max_day FROM ud),
fw AS (
  SELECT f.user_id, f.first_day,
         CAST(floor(date_diff('day', f.first_day, m.max_day) / 7.0)
              AS BIGINT) AS max_offset
  FROM first f, maxd m
),
active AS (
  SELECT w, count(*) AS n_active FROM (
    SELECT DISTINCT u.user_id,
           CAST(floor(date_diff('day', f.first_day, u.day) / 7.0) AS BIGINT)
             AS w
    FROM ud u JOIN fw f ON f.user_id = u.user_id
  ) WHERE w >= 1 GROUP BY w
),
eligible AS (
  SELECT g.w, count(*) AS n_eligible
  FROM fw, (SELECT unnest(range(1, 64))::BIGINT AS w) g
  WHERE g.w <= fw.max_offset
  GROUP BY g.w
),
pts AS (
  SELECT e.w AS lx,
         CAST(floor({RET_LOG_SCALE}.0
              * ln(CAST(a.n_active * 1000000 // e.n_eligible AS BIGINT)))
              AS BIGINT) AS ly
  FROM eligible e JOIN active a ON a.w = e.w
  WHERE a.n_active * 1000000 >= e.n_eligible
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(lx) AS sx, sum(ly) AS sy,
         sum(lx * lx) AS sxx, sum(ly * ly) AS syy,
         sum(lx * ly) AS sxy
  FROM pts
)
SELECT n AS n_weeks,
       {pround_sql(
           "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)"
           f" / {RET_LOG_SCALE}.0",
           9,
       )} AS decay_slope,
       CASE WHEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)
                 / {RET_LOG_SCALE}.0 < 0
            THEN {pround_sql(
                "ln(2.0) / (-((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
                " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
                " / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
                " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0)"
                f" / {RET_LOG_SCALE}.0))",
                6,
            )}
       END AS halflife_weeks,
       {pround_sql(
           "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " / NULLIF((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
           " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
           " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0)",
           9,
       )} AS r2
FROM m
"""


COHORT_SQL = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
first AS (SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id),
cells AS (
  SELECT DISTINCT u.user_id,
         CAST(floor(date_diff('day', DATE '2024-01-01', f.first_day) / 7.0) AS BIGINT) AS cohort_week,
         CAST(floor(date_diff('day', f.first_day, u.day) / 7.0) AS BIGINT) AS week_offset
  FROM ud u JOIN first f ON u.user_id = f.user_id
)
SELECT cohort_week, week_offset, count(*) AS n_active
FROM cells
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


def user_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lifetime-value deciles: users ranked by total purchase value
    (exact integer cents), split into 10 NTILE bands, with each band's
    user count, value total, and share of overall revenue.

    The ntile ordering is total (cents desc, user_id), so band
    assignment is deterministic; revenue shares are single divisions of
    exact integer sums.  NTILE is computed WITHOUT a single-partition
    sort: users bucket by $100 of lifetime value (monotone in the sort
    key, bounded by the VALUE DOMAIN not the user count), exact global
    rank = exclusive prefix-count over the bucket rollup + row_number
    within the bucket, and the tile index is recovered from (rank, n)
    with SQL-NTILE integer arithmetic (:func:`exact_ntile`) —
    bit-identical to the oracle's ``ntile(10)``.
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    e = load_table(spark, sf_dir, "events")
    # per_user feeds three consumers (bucket rollup, global total, the
    # ranked join): persist so the events scan+agg runs once; released
    # via scoped_cache once the result is collected.
    per_user = (
        e.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("user_id")
        .agg(F.sum("cents").alias("cents"))
        # DESC order ⇒ negate the truncating quotient to keep buckets
        # ascending along the sort
        .withColumn("vbucket", -F.expr("cents div 10000"))
        .persist()
    )
    pre = bucket_prefix(
        per_user, "vbucket", {"n": (F.count(F.lit(1)), "sum")}
    )
    total = per_user.agg(
        F.sum("cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_users_total"),
    )
    win = Window.partitionBy("vbucket").orderBy(
        F.desc("cents"), F.asc("user_id")
    )
    ranked = (
        per_user.join(F.broadcast(pre), "vbucket")
        .withColumn(
            "rank",
            F.coalesce("pre_n", F.lit(0)) + F.row_number().over(win),
        )
        .crossJoin(F.broadcast(total))
    )
    banded = ranked.withColumn(
        "decile", exact_ntile(F.col("rank"), F.col("n_users_total"), 10)
    )
    out = (
        banded.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("cents").alias("value_cents"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "decile",
            "n_users",
            "value_cents",
            pround(F.col("value_cents") / F.col("total_cents"), 6).alias(
                "revenue_share"
            ),
        )
        .orderBy("decile")
    )
    return scoped_cache(out, per_user)


DECILES_SQL = """
WITH per_user AS (
  SELECT user_id, sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
banded AS (
  SELECT user_id, cents,
         CAST(ntile(10) OVER (ORDER BY cents DESC, user_id ASC) AS INTEGER) AS decile
  FROM per_user
),
total AS (SELECT sum(cents) AS total_cents FROM per_user)
SELECT decile, count(*) AS n_users, CAST(sum(cents) AS BIGINT) AS value_cents,
       floor((sum(cents) * 1.0 / (SELECT total_cents FROM total)) * 1000000.0 + 0.5)
         / 1000000.0 AS revenue_share
FROM banded
GROUP BY decile
ORDER BY decile
"""


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types: for every
    (prev_type → type) pair in per-user time order, the transition
    count and the conditional probability P(type | prev_type) as an
    exact integer-ratio division (micro-units via integer division,
    then one pround — no float accumulation).

    One lag() window over the user partition (single shuffle on
    user_id; ties broken by event_id so the sequence is total), then a
    25-cell aggregate.  Sequence mining at 100 TB is exactly this
    shape: the transition stream never materializes wider than the
    event stream itself.
    """
    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    trans = (
        e.select(
            "user_id",
            "event_id",
            "event_type",
            F.lag("event_type").over(wo).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    row_tot = trans.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return (
        trans.join(F.broadcast(row_tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            pround(
                F.expr("(n * 1000000) div row_n") / 1_000_000.0, 6
            ).alias("p_next"),
        )
        .orderBy("prev_type", "next_type")
    )


TRANSITION_SQL = """
WITH t AS (
  SELECT user_id, event_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM t WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type
),
row_tot AS (SELECT prev_type, sum(n) AS row_n FROM trans GROUP BY prev_type)
SELECT tr.prev_type, tr.next_type, tr.n,
       floor(((tr.n * 1000000) // rt.row_n) / 1000000.0 * 1000000.0 + 0.5)
         / 1000000.0 AS p_next
FROM trans tr JOIN row_tot rt ON tr.prev_type = rt.prev_type
ORDER BY tr.prev_type, tr.next_type
"""


#: session gap threshold and path prefix length for path mining
SESSION_GAP_US = 30 * 60 * 1_000_000
PATH_PREFIX = 5
PATH_TOP_N = 20


def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top navigation paths: sessionize each user's events with a
    30-minute inactivity gap (gaps-and-islands), take the first
    ``PATH_PREFIX`` event types of each session in time order, and
    count the resulting '>' -joined paths — the path-mining staple
    behind "how do users reach purchase".

    The session id is a running sum of gap flags over the user
    partition; the path string is assembled from an ordered in-group
    prefix (row_number ≤ k before the string agg, so the reduction is
    bounded per session).  Everything shares the user_id shuffle until
    the final small path count.
    """
    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("tus", "event_id")
    base = e.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("tus"),
    )
    flagged = base.withColumn(
        "new_sess",
        F.when(
            F.lag("tus").over(wo).isNull()
            | (F.col("tus") - F.lag("tus").over(wo) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sess_id",
        F.sum("new_sess").over(
            wo.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ws = Window.partitionBy("user_id", "sess_id").orderBy("tus", "event_id")
    prefix = sess.withColumn("rn", F.row_number().over(ws)).filter(
        F.col("rn") <= PATH_PREFIX
    )
    paths = (
        prefix.groupBy("user_id", "sess_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("rn", F.col("event_type").alias("t"))
                        )
                    ),
                    lambda x: x["t"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(PATH_TOP_N)
    )


SESSION_PATH_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus FROM events
),
flagged AS (
  SELECT *, CASE WHEN lag(tus) OVER w IS NULL
                  OR tus - lag(tus) OVER w > {SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_sess
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
),
sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS sess_id
  FROM flagged
),
prefix AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id, sess_id
                                 ORDER BY tus, event_id) AS rn
    FROM sess
  ) WHERE rn <= {PATH_PREFIX}
),
paths AS (
  SELECT user_id, sess_id,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM prefix GROUP BY user_id, sess_id
)
SELECT path, count(*) AS n_sessions
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT {PATH_TOP_N}
"""


#: attribution lookback horizon: a click within this window before the
#: purchase gets the credit
ATTR_HORIZON_US = 3_600_000_000  # 1 hour


def last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed last-touch attribution — the marketing-analytics turn of
    the as-of machinery: credit each purchase to the most recent click
    by the same user within ``ATTR_HORIZON_US``, and report per day how
    much purchase value was attributed vs organic.

    Same union + ordered-window shape as the as-of join (one user_id
    shuffle, no join explosion): the running ``max`` of click
    timestamps over the strictly-preceding frame gives the last touch;
    the horizon bound turns it into attribution.  Value sums are exact
    integer cents; the attribution rate is an integer-ppm division.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("tus"),
        F.to_date("ts").alias("day"),
        F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").alias("cents"),
    ).filter(F.col("event_type").isin("click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = e.withColumn(
        "last_click_tus",
        F.max(F.when(F.col("event_type") == "click", F.col("tus"))).over(w),
    )
    purchases = tagged.filter(F.col("event_type") == "purchase").withColumn(
        "attributed",
        (
            F.col("last_click_tus").isNotNull()
            & (F.col("tus") - F.col("last_click_tus") <= ATTR_HORIZON_US)
        ).cast("int"),
    )
    return (
        purchases.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("attributed").cast("long").alias("n_attributed"),
            F.sum(F.col("attributed") * F.col("cents")).cast("long").alias(
                "attributed_cents"
            ),
            F.sum((1 - F.col("attributed")) * F.col("cents")).cast("long").alias(
                "organic_cents"
            ),
        )
        .withColumn(
            "attribution_ppm",
            F.expr(
                "CAST(CAST(n_attributed AS DECIMAL(38,0)) * 1000000"
                " DIV n_purchases AS BIGINT)"
            ),
        )
        .orderBy("day")
    )


LAST_TOUCH_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type,
         epoch_us(ts) AS tus, CAST(ts AS DATE) AS day,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type IN ('click', 'purchase')
),
tagged AS (
  SELECT *,
         max(CASE WHEN event_type = 'click' THEN tus END) OVER (
           PARTITION BY user_id ORDER BY tus, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS last_click_tus
  FROM e
),
purchases AS (
  SELECT *,
         CASE WHEN last_click_tus IS NOT NULL
               AND tus - last_click_tus <= {ATTR_HORIZON_US}
              THEN 1 ELSE 0 END AS attributed
  FROM tagged WHERE event_type = 'purchase'
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(attributed) AS BIGINT) AS n_attributed,
       CAST(sum(attributed * cents) AS BIGINT) AS attributed_cents,
       CAST(sum((1 - attributed) * cents) AS BIGINT) AS organic_cents,
       CAST(CAST(sum(attributed) AS HUGEINT) * 1000000
            // CAST(count(*) AS BIGINT) AS BIGINT) AS attribution_ppm
FROM purchases
GROUP BY day
ORDER BY day
"""


def pit_training_set_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time training-set assembly: one row per purchase
    (the label event) carrying features computed from STRICTLY EARLIER
    events only — the leakage-free feature join every supervised
    pipeline over event data needs (the "time-travel" join of a feature
    store).  Features: the user's most recent prior click value (exact
    cents, null if none) and the count of all prior events.

    Both features fall out of ONE window pass over the user-partitioned
    event stream (frame ends at ``-1`` row — strictly before, ties
    broken by event_id so "before" is a total order); no self-joins, no
    per-feature rescans.  At 100 TB this is a single shuffle on
    user_id; adding features adds expressions, not passes.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.when(
            F.col("event_type") == "click",
            F.floor(F.col("value") * 100 + 0.5).cast("long"),
        ).alias("click_cents"),
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * 100 + 0.5).cast("long"),
        ).alias("label_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    feat = base.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        "label_cents",
        F.last("click_cents", ignorenulls=True).over(w).alias("last_click_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_prior_events"),
    )
    return (
        feat.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "ts",
            "label_cents",
            "last_click_cents",
            "n_prior_events",
        )
        .orderBy("user_id", "event_id")
    )


PIT_ASSEMBLY_SQL = """
WITH base AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN event_type = 'click'
              THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END AS click_cents,
         CASE WHEN event_type = 'purchase'
              THEN CAST(floor(value * 100 + 0.5) AS BIGINT) END AS label_cents
  FROM events
),
feat AS (
  SELECT user_id, event_id, ts, event_type, label_cents,
         last_value(click_cents IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click_cents,
         CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              AS BIGINT) AS n_prior_events
  FROM base
)
SELECT user_id, event_id, ts, label_cents, last_click_cents, n_prior_events
FROM feat
WHERE event_type = 'purchase'
ORDER BY user_id, event_id
"""


def position_based_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (40/20/40) multi-touch attribution — the standard
    position-based model next to :func:`last_touch_attribution`: every
    click/view touch in the hour before a purchase shares the credit,
    first and last touch 40% each, the middle touches splitting the
    remaining 20%.

    Credit is integer ppm with a deterministic remainder rule: 1 touch
    → 1e6; 2 → 500k each; n ≥ 3 → 400k first, middles get
    ``200000 DIV (n−2)`` each and the LAST touch takes 400k plus the
    division remainder, so every purchase's credits sum to exactly
    1e6.  Purchases with no in-horizon touch report as the 'organic'
    channel.  Scale shape: the purchase×touch expansion is an
    equi-join on user_id bounded by the attribution horizon (the same
    family as ``range_join_clicks_after_purchase``); credits aggregate
    straight to the |channels|-row report.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("tus"),
        F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").alias("cents"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.col("tus").alias("p_tus"),
        "cents",
    )
    touches = e.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("event_type").alias("channel"),
        F.col("event_id").alias("t_id"),
        F.col("tus").alias("t_tus"),
    )
    pairs = purchases.join(touches, "user_id").filter(
        (F.col("t_tus") < F.col("p_tus"))
        & (F.col("p_tus") - F.col("t_tus") <= ATTR_HORIZON_US)
    )
    wp = Window.partitionBy("p_id").orderBy("t_tus", "t_id")
    wn = Window.partitionBy("p_id")
    ranked = pairs.withColumn("rn", F.row_number().over(wp)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    credit = F.expr(
        "CASE WHEN n = 1 THEN 1000000"
        " WHEN n = 2 THEN 500000"
        " WHEN rn = 1 THEN 400000"
        " WHEN rn = n THEN 400000 + 200000 - (n - 2) * (200000 DIV (n - 2))"
        " ELSE 200000 DIV (n - 2) END"
    )
    credited = ranked.select(
        "channel",
        credit.cast("long").alias("credit_ppm"),
        F.expr("CAST(cents AS DECIMAL(38,0))").alias("cents"),
    )
    touch_agg = credited.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_credits"),
        F.sum("credit_ppm").cast("long").alias("credit_ppm_sum"),
        F.expr(
            "CAST(sum(cents * credit_ppm) DIV 1000000 AS BIGINT)"
        ).alias("credited_cents"),
    )
    organic = (
        purchases.join(
            pairs.select("p_id").distinct(), "p_id", "left_anti"
        )
        .agg(
            F.lit("organic").alias("channel"),
            F.count(F.lit(1)).cast("long").alias("n_credits"),
            (F.count(F.lit(1)) * 1000000).cast("long").alias(
                "credit_ppm_sum"
            ),
            F.sum("cents").cast("long").alias("credited_cents"),
        )
    )
    return touch_agg.unionByName(organic).orderBy("channel")


POSITION_ATTR_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
purchases AS (
  SELECT user_id, event_id AS p_id, tus AS p_tus, cents
  FROM e WHERE event_type = 'purchase'
),
touches AS (
  SELECT user_id, event_type AS channel, event_id AS t_id, tus AS t_tus
  FROM e WHERE event_type IN ('click', 'view')
),
pairs AS (
  SELECT p.p_id, p.cents, t.channel, t.t_tus, t.t_id
  FROM purchases p JOIN touches t USING (user_id)
  WHERE t.t_tus < p.p_tus AND p.p_tus - t.t_tus <= {ATTR_HORIZON_US}
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY p_id ORDER BY t_tus, t_id) AS rn,
         count(*) OVER (PARTITION BY p_id) AS n
  FROM pairs
),
credited AS (
  SELECT channel,
         CASE WHEN n = 1 THEN 1000000
              WHEN n = 2 THEN 500000
              WHEN rn = 1 THEN 400000
              WHEN rn = n THEN 400000 + 200000 - (n - 2) * (200000 // (n - 2))
              ELSE 200000 // (n - 2) END AS credit_ppm,
         cents
  FROM ranked
),
touch_agg AS (
  SELECT channel, CAST(count(*) AS BIGINT) AS n_credits,
         CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm_sum,
         CAST(sum(cents::HUGEINT * credit_ppm) // 1000000 AS BIGINT)
           AS credited_cents
  FROM credited GROUP BY channel
),
organic AS (
  SELECT 'organic' AS channel,
         CAST(count(*) AS BIGINT) AS n_credits,
         CAST(count(*) * 1000000 AS BIGINT) AS credit_ppm_sum,
         CAST(sum(cents) AS BIGINT) AS credited_cents
  FROM purchases p
  WHERE NOT EXISTS (SELECT 1 FROM pairs x WHERE x.p_id = p.p_id)
)
SELECT * FROM touch_agg
UNION ALL
SELECT * FROM organic
ORDER BY channel
"""


#: funnel latency stages: (from_type, to_type)
FUNNEL_STAGES = (("view", "click"), ("click", "purchase"))


def funnel_stage_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-exact P50/P90 of the per-user time between first funnel
    events (first view→first click, first click→first purchase), in
    hours — the "where do users stall" diagnostic behind
    ``event_funnel_counts``'s pure conversion rates.

    Gaps are integer hours; the percentiles are prefix-sum rank
    selections over the per-(stage, distinct-gap) rollup — bounded by
    the time domain, never user count (same rollup form as
    ``pinball_loss_eval``).
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        *[
            F.min(
                F.when(F.col("event_type") == t, F.unix_micros("ts"))
            ).alias(f"t_{t}")
            for t in ("view", "click", "purchase")
        ]
    )
    stages = []
    for a, b in FUNNEL_STAGES:
        stages.append(
            per_user.filter(
                F.col(f"t_{b}").isNotNull()
                & F.col(f"t_{a}").isNotNull()
                & (F.col(f"t_{b}") >= F.col(f"t_{a}"))
            ).select(
                F.lit(f"{a}->{b}").alias("stage"),
                F.expr(
                    f"(t_{b} - t_{a}) DIV 3600000000"
                ).alias("gap_hours"),
            )
        )
    gaps = stages[0].unionByName(stages[1])
    counts = gaps.groupBy("stage", "gap_hours").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wcum = (
        Window.partitionBy("stage")
        .orderBy("gap_hours")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.select(
        "stage",
        "gap_hours",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy("stage")).cast("long").alias("n"),
    )
    p50 = (
        cum.filter(F.expr("cum >= (n + 1) DIV 2"))
        .groupBy("stage")
        .agg(
            F.max("n").cast("long").alias("n_users"),
            F.min("gap_hours").alias("p50_hours"),
        )
    )
    p90 = (
        cum.filter(F.expr("cum >= (9 * n + 9) DIV 10"))
        .groupBy("stage")
        .agg(F.min("gap_hours").alias("p90_hours"))
    )
    return p50.join(p90, "stage").orderBy("stage")


FUNNEL_LATENCY_SQL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
           AS t_purchase
  FROM events GROUP BY user_id
),
gaps AS (
  SELECT 'view->click' AS stage,
         (t_click - t_view) // 3600000000 AS gap_hours
  FROM per_user
  WHERE t_click IS NOT NULL AND t_view IS NOT NULL AND t_click >= t_view
  UNION ALL
  SELECT 'click->purchase',
         (t_purchase - t_click) // 3600000000
  FROM per_user
  WHERE t_purchase IS NOT NULL AND t_click IS NOT NULL
    AND t_purchase >= t_click
),
counts AS (
  SELECT stage, gap_hours, CAST(count(*) AS BIGINT) AS cnt
  FROM gaps GROUP BY 1, 2
),
cum AS (
  SELECT stage, gap_hours,
         sum(cnt) OVER (PARTITION BY stage ORDER BY gap_hours
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY stage) AS BIGINT) AS n
  FROM counts
),
p50 AS (
  SELECT stage, CAST(max(n) AS BIGINT) AS n_users,
         min(gap_hours) AS p50_hours
  FROM cum WHERE cum >= (n + 1) // 2 GROUP BY stage
),
p90 AS (
  SELECT stage, min(gap_hours) AS p90_hours
  FROM cum WHERE cum >= (9 * n + 9) // 10 GROUP BY stage
)
SELECT p50.stage, n_users, p50_hours, p90_hours
FROM p50 JOIN p90 USING (stage)
ORDER BY stage
"""


#: serving-window width (days) for the cold-start coverage audit
COLD_START_WINDOW_DAYS = 7


def cold_start_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cold-start coverage of the serving window — for the last
    ``COLD_START_WINDOW_DAYS`` days of the log, what fraction of active
    users and clicked items were NEVER seen before the window opened.
    This is the audit a recommender/feature-store team runs before
    trusting offline metrics: entities with no history get no
    aggregates from :func:`pit_training_set_assembly`-style features,
    so a high cold share means offline eval overstates production
    quality.

    One pass per entity type to a (entity, first_day, last_day) rollup
    (map-side combinable min/max — never a self-join against history),
    then a constant-size accounting row per entity.  All shares are
    exact ``·1e6 DIV`` integers.
    """
    e = load_table(spark, sf_dir, "events")
    eday = F.expr("unix_micros(ts) DIV 86400000000")
    users = e.select(F.col("user_id").alias("ent"), eday.alias("eday"))
    items = e.filter(F.col("event_type") == "click").select(
        json_long().alias("ent"),
        eday.alias("eday"),
    ).filter(F.col("ent").isNotNull())

    def account(rel, label: str) -> DataFrame:
        per = rel.groupBy("ent").agg(
            F.min("eday").alias("first_day"), F.max("eday").alias("last_day")
        )
        cut = per.agg(
            (F.max("last_day") - F.lit(COLD_START_WINDOW_DAYS - 1)).alias(
                "w0"
            )
        )
        return (
            per.crossJoin(F.broadcast(cut))
            .filter(F.col("last_day") >= F.col("w0"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_active"),
                F.sum(
                    F.when(F.col("first_day") >= F.col("w0"), 1).otherwise(0)
                )
                .cast("long")
                .alias("n_cold"),
            )
            .select(
                F.lit(label).alias("entity"),
                "n_active",
                "n_cold",
                # degenerate-input guard: an empty serving window gives
                # n_active = 0, where Spark DIV would yield NULL but
                # DuckDB // raises — pin both engines to 0
                F.expr(
                    "CAST(CASE WHEN n_active = 0 THEN 0"
                    " ELSE CAST(n_cold AS DECIMAL(38,0)) * 1000000"
                    " DIV n_active END AS BIGINT)"
                ).alias("cold_ppm"),
            )
        )

    return (
        account(users, "user")
        .unionByName(account(items, "item"))
        .orderBy("entity")
    )


COLD_START_SQL = f"""
WITH u AS (
  SELECT user_id AS ent, epoch_us(ts) // 86400000000 AS eday FROM events
),
up AS (
  SELECT ent, min(eday) AS first_day, max(eday) AS last_day
  FROM u GROUP BY 1
),
uc AS (SELECT max(last_day) - {COLD_START_WINDOW_DAYS - 1} AS w0 FROM up),
ua AS (
  SELECT 'user' AS entity,
         CAST(count(*) AS BIGINT) AS n_active,
         CAST(sum(CASE WHEN first_day >= w0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_cold
  FROM up, uc WHERE last_day >= w0
),
i AS (
  -- TRY_CAST + post-cast filter mirrors the Spark side's
  -- get_json_object(...).cast('long') null-on-non-numeric semantics
  -- (a plain CAST would raise where Spark silently drops the row)
  SELECT TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) AS ent,
         epoch_us(ts) // 86400000000 AS eday
  FROM events
  WHERE event_type = 'click' AND TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) IS NOT NULL
),
ip AS (
  SELECT ent, min(eday) AS first_day, max(eday) AS last_day
  FROM i GROUP BY 1
),
ic AS (SELECT max(last_day) - {COLD_START_WINDOW_DAYS - 1} AS w0 FROM ip),
ia AS (
  SELECT 'item' AS entity,
         CAST(count(*) AS BIGINT) AS n_active,
         CAST(sum(CASE WHEN first_day >= w0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_cold
  FROM ip, ic WHERE last_day >= w0
)
SELECT entity, n_active, n_cold,
       CAST(CASE WHEN n_active = 0 THEN 0
            ELSE n_cold::HUGEINT * 1000000 // n_active END AS BIGINT)
         AS cold_ppm
FROM (SELECT * FROM ua UNION ALL SELECT * FROM ia)
ORDER BY entity
"""


def linear_attribution_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-touch) multi-channel attribution — the third of
    the three standard credit models next to
    :func:`last_touch_attribution` and
    :func:`position_based_attribution`: each purchase's value splits
    EQUALLY across the channels (view / click / signup) that touched
    the user within the 1 h horizon before it; untouched purchases go
    to an explicit ``organic`` channel.

    Same single user-shuffle window shape as the as-of family: one
    conditional running ``max`` per channel over the strictly-preceding
    frame — never a purchase×touch join.  Credits are exact integer
    MICRO-cents: each of the k present channels gets
    ``cents·1e6 DIV k`` and the division remainder goes to the
    alphabetically-first present channel, so every purchase's credits
    sum to exactly ``cents·1e6`` and the global invariant
    ``Σ credit = total_cents·1e6`` holds to the last unit.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("tus"),
        F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").alias("cents"),
    ).filter(F.col("event_type").isin("view", "click", "signup", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = e
    for ch in ("view", "click", "signup"):
        tagged = tagged.withColumn(
            f"last_{ch}",
            F.max(
                F.when(F.col("event_type") == ch, F.col("tus"))
            ).over(w),
        )
    flags = tagged.filter(F.col("event_type") == "purchase").select(
        "cents",
        *[
            (
                F.col(f"last_{ch}").isNotNull()
                & (F.col("tus") - F.col(f"last_{ch}") <= ATTR_HORIZON_US)
            )
            .cast("int")
            .alias(f"f_{ch}")
            for ch in ("view", "click", "signup")
        ],
    ).withColumn("k", F.expr("f_view + f_click + f_signup"))
    # per-channel micro-cent credit with the remainder pinned to the
    # alphabetically-first present channel (click < signup < view)
    base_share = "CAST(cents AS DECIMAL(38,0)) * 1000000 DIV k"
    rem = f"CAST(cents AS DECIMAL(38,0)) * 1000000 - k * ({base_share})"
    credits = flags.select(
        F.expr(
            f"""stack(4,
            'click', f_click,
            CASE WHEN k = 0 OR f_click = 0 THEN CAST(0 AS DECIMAL(38,0))
                 WHEN f_click = 1 THEN ({base_share}) + ({rem})
                 ELSE CAST(0 AS DECIMAL(38,0)) END,
            'signup', f_signup,
            CASE WHEN k = 0 OR f_signup = 0 THEN CAST(0 AS DECIMAL(38,0))
                 WHEN f_click = 0 THEN ({base_share}) + ({rem})
                 ELSE ({base_share}) END,
            'view', f_view,
            CASE WHEN k = 0 OR f_view = 0 THEN CAST(0 AS DECIMAL(38,0))
                 WHEN f_click = 0 AND f_signup = 0
                   THEN ({base_share}) + ({rem})
                 ELSE ({base_share}) END,
            'organic', CAST(k = 0 AS INT),
            CASE WHEN k = 0
                 THEN CAST(cents AS DECIMAL(38,0)) * 1000000
                 ELSE CAST(0 AS DECIMAL(38,0)) END
            ) AS (channel, touched, credit)"""
        )
    )
    return (
        credits.groupBy("channel")
        .agg(
            F.sum("touched").cast("long").alias("n_purchases_touched"),
            F.sum("credit").cast("decimal(38,0)").cast("long").alias(
                "credit_micro_cents"
            ),
        )
        .orderBy("channel")
    )


LINEAR_ATTR_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tus,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
  WHERE event_type IN ('view', 'click', 'signup', 'purchase')
),
tagged AS (
  SELECT *,
         max(CASE WHEN event_type = 'view' THEN tus END) OVER w AS last_view,
         max(CASE WHEN event_type = 'click' THEN tus END) OVER w
           AS last_click,
         max(CASE WHEN event_type = 'signup' THEN tus END) OVER w
           AS last_signup
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
flags AS (
  SELECT cents,
         CASE WHEN last_view IS NOT NULL
                   AND tus - last_view <= {ATTR_HORIZON_US}
              THEN 1 ELSE 0 END AS f_view,
         CASE WHEN last_click IS NOT NULL
                   AND tus - last_click <= {ATTR_HORIZON_US}
              THEN 1 ELSE 0 END AS f_click,
         CASE WHEN last_signup IS NOT NULL
                   AND tus - last_signup <= {ATTR_HORIZON_US}
              THEN 1 ELSE 0 END AS f_signup
  FROM tagged WHERE event_type = 'purchase'
),
k AS (SELECT *, f_view + f_click + f_signup AS k FROM flags),
credits AS (
  SELECT 'click' AS channel, f_click AS touched,
         CASE WHEN k = 0 OR f_click = 0 THEN 0::HUGEINT
              WHEN f_click = 1 THEN cents::HUGEINT * 1000000 // k
                   + (cents::HUGEINT * 1000000
                      - k * (cents::HUGEINT * 1000000 // k))
              ELSE 0::HUGEINT END AS credit
  FROM k
  UNION ALL
  SELECT 'signup', f_signup,
         CASE WHEN k = 0 OR f_signup = 0 THEN 0::HUGEINT
              WHEN f_click = 0 THEN cents::HUGEINT * 1000000 // k
                   + (cents::HUGEINT * 1000000
                      - k * (cents::HUGEINT * 1000000 // k))
              ELSE cents::HUGEINT * 1000000 // k END
  FROM k
  UNION ALL
  SELECT 'view', f_view,
         CASE WHEN k = 0 OR f_view = 0 THEN 0::HUGEINT
              WHEN f_click = 0 AND f_signup = 0
                THEN cents::HUGEINT * 1000000 // k
                     + (cents::HUGEINT * 1000000
                        - k * (cents::HUGEINT * 1000000 // k))
              ELSE cents::HUGEINT * 1000000 // k END
  FROM k
  UNION ALL
  SELECT 'organic', CASE WHEN k = 0 THEN 1 ELSE 0 END,
         CASE WHEN k = 0 THEN cents::HUGEINT * 1000000 ELSE 0::HUGEINT END
  FROM k
)
SELECT channel,
       CAST(sum(touched) AS BIGINT) AS n_purchases_touched,
       CAST(sum(credit) AS BIGINT) AS credit_micro_cents
FROM credits
GROUP BY channel
ORDER BY channel
"""


def session_duration_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Session-length report over the same 30-minute-gap sessionization
    as :func:`session_path_topk`: rank-exact P50/P90/P99 session
    durations (seconds) plus session count and mean events/session —
    the engagement panel next to the path mining.

    Percentiles are selected on the per-distinct-duration-second
    ROLLUP (smallest duration whose cumulative session count reaches
    the rank — the value-domain two-pass pattern), never by sorting
    sessions; the rank itself is ``ceil(q·n)`` evaluated as the exact
    integer ``(q_num·n + 99) DIV 100``.  Mean is an exact ppm division.
    Shape: one user_id shuffle (sessionize), one session rollup, one
    duration-domain rollup.
    """
    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("tus", "event_id")
    base = e.select(
        "user_id", "event_id", F.unix_micros("ts").alias("tus")
    )
    flagged = base.withColumn(
        "new_sess",
        F.when(
            F.lag("tus").over(wo).isNull()
            | (F.col("tus") - F.lag("tus").over(wo) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = (
        flagged.withColumn(
            "sess_id",
            F.sum("new_sess").over(
                Window.partitionBy("user_id")
                .orderBy("tus", "event_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sess_id")
        .agg(
            F.max("tus").alias("mx"),
            F.min("tus").alias("mn"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        # integer µs→s division (a double divide could round an exact
        # quotient across the truncation boundary)
        .select(
            F.expr("CAST((mx - mn) DIV 1000000 AS BIGINT)").alias("dur_s"),
            "n_events",
        )
    )
    from projet_meteo_etl_spark.cachescope import scoped_cache

    # two consumers (duration rollup + totals): persist so the
    # sessionization window pass runs once
    sess = sess.persist()
    per_dur = sess.groupBy("dur_s").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w = Window.orderBy("dur_s").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_dur.select(
        "dur_s", F.sum("cnt").over(w).alias("cum")
    )
    tot = sess.agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("n_events").cast("long").alias("n_events"),
    )
    # one spine join picks all three percentiles in ONE pass over the
    # cumulative rollup (a per-quantile filter would re-plan the whole
    # sessionization once per point)
    qs = spark.createDataFrame([(50,), (90,), (99,)], "q int")
    picked = (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(qs))
        .filter(F.col("cum") >= F.expr("(q * n_sessions + 99) DIV 100"))
        .agg(
            *[
                F.min(F.when(F.col("q") == q, F.col("dur_s"))).alias(
                    f"p{q}_duration_s"
                )
                for q in (50, 90, 99)
            ]
        )
    )
    out = tot.crossJoin(F.broadcast(picked)).select(
        "n_sessions",
        # empty-log guard: n_sessions = 0 ⇒ Spark DIV NULL vs DuckDB
        # // raise — pin both to 0
        F.expr(
            "CAST(CASE WHEN n_sessions = 0 THEN 0"
            " ELSE CAST(n_events AS DECIMAL(38,0)) * 1000000"
            " DIV n_sessions END AS BIGINT)"
        ).alias("mean_events_ppm"),
        "p50_duration_s",
        "p90_duration_s",
        "p99_duration_s",
    )
    return scoped_cache(out, sess)


SESSION_DURATION_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
),
flagged AS (
  SELECT user_id, event_id, tus,
         CASE WHEN lag(tus) OVER w IS NULL
                  OR tus - lag(tus) OVER w > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
),
sess AS (
  -- the running sum MUST carry the same event_id tie-break as the lag
  -- ordering: a tie pair can hold the session-opening flag, and an
  -- order-arbitrary frame could put the 0-row before the 1-row,
  -- shifting it into the previous session
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id,
         tus
  FROM flagged
),
per_sess AS (
  SELECT user_id, sess_id,
         CAST((max(tus) - min(tus)) // 1000000 AS BIGINT) AS dur_s,
         CAST(count(*) AS BIGINT) AS n_events
  FROM sess GROUP BY 1, 2
),
per_dur AS (
  SELECT dur_s, CAST(count(*) AS BIGINT) AS cnt FROM per_sess GROUP BY 1
),
cum AS (
  SELECT dur_s, sum(cnt) OVER (ORDER BY dur_s
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM per_dur
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(sum(n_events) AS BIGINT) AS n_events
  FROM per_sess
)
SELECT t.n_sessions,
       CAST(CASE WHEN t.n_sessions = 0 THEN 0
            ELSE t.n_events::HUGEINT * 1000000 // t.n_sessions END
            AS BIGINT) AS mean_events_ppm,
       (SELECT CAST(min(dur_s) AS BIGINT) FROM cum, tot
        WHERE cum >= (50 * n_sessions + 99) // 100) AS p50_duration_s,
       (SELECT CAST(min(dur_s) AS BIGINT) FROM cum, tot
        WHERE cum >= (90 * n_sessions + 99) // 100) AS p90_duration_s,
       (SELECT CAST(min(dur_s) AS BIGINT) FROM cum, tot
        WHERE cum >= (99 * n_sessions + 99) // 100) AS p99_duration_s
FROM tot t
"""


#: prediction list width for the next-click hit-rate eval
NEXT_CLICK_K = 3


def markov_next_click_hitrate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hit@1 / hit@``NEXT_CLICK_K`` of the first-order next-click
    predictor — the EVALUATION the transition matrix
    (:func:`event_transition_matrix`) feeds but never grades: train
    per-item transition counts on the chronological FIRST HALF of the
    click log (midpoint-time split, the ``diff_in_diff_lift``
    convention), predict the top-k next items per source item
    (count DESC, item ASC — deterministic), and score the SECOND
    half's actual transitions.  Cold transitions (source item unseen
    in training) are counted explicitly, never silently dropped —
    they are exactly the cold-start rate a session recommender must
    budget for.

    Exact integers: the split point is ``(min_us + max_us) DIV 2``;
    hit rates are ppm over ALL eval transitions (cold ones count as
    misses).  Scale: one lag-window pass over the click log → train
    counts (map-combinable) → a per-source top-k window over the
    TRANSITION-PAIR rollup (pair-domain bounded, not row bounded);
    scoring is one join of the eval half against the k·|items| pick
    relation.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    clicks = e.select(
        "user_id",
        json_long().alias("item"),
        F.unix_micros("ts").alias("t"),
        "event_id",
    ).filter(F.col("item").isNotNull())
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    trans = (
        clicks.select(
            "item", "t", F.lag("item").over(w).alias("prev")
        )
        .filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("item")))
        .select(F.col("prev").alias("src"), F.col("item").alias("dst"), "t")
    )
    mid = clicks.agg(
        F.expr("CAST((min(t) + max(t)) DIV 2 AS BIGINT)").alias("mid")
    )
    # transitions assigned by the SECOND click's time; persist: the
    # split feeds both halves (released via scoped_cache)
    tr = trans.crossJoin(F.broadcast(mid)).persist()
    train = (
        tr.filter(F.col("t") < F.col("mid"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_p = Window.partitionBy("src").orderBy(F.desc("n"), F.asc("dst"))
    pred = (
        train.withColumn("rk", F.row_number().over(w_p))
        .filter(F.col("rk") <= NEXT_CLICK_K)
        .select("src", "dst", "rk")
    )
    train_srcs = train.select("src").distinct()
    ev = (
        tr.filter(F.col("t") >= F.col("mid"))
        .join(pred, ["src", "dst"], "left")
        .join(
            train_srcs.withColumn("seen", F.lit(1)), "src", "left"
        )
    )
    from projet_meteo_etl_spark.cachescope import scoped_cache

    out = ev.agg(
        F.count(F.lit(1)).cast("long").alias("n_eval"),
        F.sum(
            F.when(F.col("seen").isNull(), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_cold"),
        F.sum(F.when(F.col("rk") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hit1"),
        F.sum(
            F.when(F.col("rk") <= NEXT_CLICK_K, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_hitk"),
    ).select(
        "n_eval",
        "n_cold",
        "n_hit1",
        "n_hitk",
        # DECIMAL-widened ×1e6 (the eb_shrunk overflow discipline:
        # a 100 TB log's eval-half transition count clears 9.2e12)
        F.expr(
            "CAST(CAST(n_hit1 AS DECIMAL(38,0)) * 1000000"
            " DIV greatest(n_eval, 1) AS BIGINT)"
        ).alias("hit1_ppm"),
        F.expr(
            "CAST(CAST(n_hitk AS DECIMAL(38,0)) * 1000000"
            " DIV greatest(n_eval, 1) AS BIGINT)"
        ).alias("hitk_ppm"),
    )
    return scoped_cache(out, tr)


NEXT_CLICK_SQL = f"""
WITH nclicks AS (
  SELECT user_id, TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) AS item,
         epoch_us(ts) AS t, event_id
  FROM events
  WHERE event_type = 'click'
    AND TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) IS NOT NULL
),
trans AS (
  SELECT prev AS src, item AS dst, t FROM (
    SELECT item, t,
           lag(item) OVER (PARTITION BY user_id ORDER BY t, event_id)
             AS prev
    FROM nclicks
  ) WHERE prev IS NOT NULL AND prev <> item
),
mid AS (
  SELECT CAST((min(t) + max(t)) // 2 AS BIGINT) AS mid FROM nclicks
),
train AS (
  SELECT src, dst, count(*) AS n
  FROM trans, mid WHERE t < mid GROUP BY src, dst
),
pred AS (
  SELECT src, dst, rk FROM (
    SELECT src, dst,
           row_number() OVER (
             PARTITION BY src ORDER BY n DESC, dst ASC) AS rk
    FROM train
  ) WHERE rk <= {NEXT_CLICK_K}
),
train_srcs AS (SELECT DISTINCT src FROM train),
ev_base AS (
  SELECT t.src, t.dst FROM trans t, mid WHERE t.t >= mid
),
ev AS (
  SELECT b.src, b.dst, p.rk,
         CASE WHEN s.src IS NULL THEN 1 ELSE 0 END AS cold
  FROM ev_base b
  LEFT JOIN pred p ON p.src = b.src AND p.dst = b.dst
  LEFT JOIN train_srcs s ON s.src = b.src
)
SELECT CAST(count(*) AS BIGINT) AS n_eval,
       CAST(sum(cold) AS BIGINT) AS n_cold,
       CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit1,
       CAST(sum(CASE WHEN rk <= {NEXT_CLICK_K} THEN 1 ELSE 0 END)
         AS BIGINT) AS n_hitk,
       CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) * 1000000
            // greatest(count(*), 1) AS BIGINT) AS hit1_ppm,
       CAST(sum(CASE WHEN rk <= {NEXT_CLICK_K} THEN 1 ELSE 0 END)
            * 1000000 // greatest(count(*), 1) AS BIGINT) AS hitk_ppm
FROM ev
"""


#: absorbing-chain power iterations for the Markov attribution kernel —
#: enough that truncated micro-unit mass movement has converged to the
#: fixpoint for any journey graph with Σp ≤ 1 per state (each round
#: multiplies residual mass by ≤ max Σp < 1 after truncation)
MARKOV_ITERS = 32


def markov_attribution_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution — the data-driven fourth model
    next to last-touch / position-based / linear: build the user-journey
    transition chain (START → event types → CONV on first purchase, or
    NULL when the journey ends unconverted), then credit each channel
    by how much the chain's conversion probability DROPS when all
    transitions into that channel are removed (Anderl et al.'s removal
    effect).  This is the attribution marketers reach for when ordering
    heuristics stop being defensible.

    Exact cross-engine arithmetic: transition probabilities are
    truncated micro-units (``cnt·1e6 DIV out``), and the absorption
    vector is ``MARKOV_ITERS`` synchronous power iterations
    ``x' = r + (Σ q·x) DIV 1e6`` in integers — bit-identical to the
    DuckDB recursive-CTE oracle.  Removing edges can only lower the
    (monotone) iteration, so removal effects are non-negative by
    construction.

    Scale shape: journeys are per-user ordered windows (one user_id
    shuffle — the sessionization cost every attribution model here
    pays); everything after the (src, dst) count rollup is a
    channel-domain-bounded matrix (|event types|² rows), so the chain
    solve runs partition-locally in one exact-integer kernel like the
    PCA / KM / Holt / CUSUM collapses.
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("tus"),
        # real channels carry a 'ch:' prefix so the synthetic absorbing/
        # terminal state names (CONV / NULL / START) can never collide
        # with an event_type literally named one of them — event_type is
        # user data, any string is possible (same rule as the 'rm:'
        # scenario prefix in the oracle)
        F.when(F.col("event_type") == "purchase", F.lit("CONV"))
        .otherwise(F.concat(F.lit("ch:"), F.col("event_type")))
        .alias("st"),
        (F.col("event_type") == "purchase").alias("is_p"),
    )
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    w_all = Window.partitionBy("user_id")
    rn = e.withColumn("rn", F.row_number().over(w)).withColumn(
        "prn", F.min(F.when(F.col("is_p"), F.col("rn"))).over(w_all)
    )
    kept = rn.filter(F.col("prn").isNull() | (F.col("rn") <= F.col("prn")))
    w2 = Window.partitionBy("user_id").orderBy("rn")
    # persisted: both unionByName branches of `steps` consume seq —
    # without the cache the corpus scan + per-user window pipeline
    # runs twice (the standard two-consumer persist pattern)
    seq = kept.select(
        "user_id",
        "rn",
        "st",
        "prn",
        F.lag("st").over(w2).alias("prev"),
        F.max("rn").over(w_all).alias("mx"),
    ).persist()
    steps = seq.select(
        F.coalesce("prev", F.lit("START")).alias("src"), F.col("st").alias("dst")
    ).unionByName(
        seq.filter((F.col("rn") == F.col("mx")) & F.col("prn").isNull()).select(
            F.col("st").alias("src"), F.lit("NULL").alias("dst")
        )
    )
    cnt = steps.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("src").agg(F.sum("c").alias("t"))
    p = cnt.join(tot, "src").select(
        "src",
        "dst",
        F.expr(
            "CAST(CAST(c AS DECIMAL(38,0)) * 1000000 DIV t AS BIGINT)"
        ).alias("pm"),
    )

    def chain_kernel(batches, _iters=MARKOV_ITERS):
        import pandas as pd

        rows = [b for b in batches if len(b)]
        if not rows:
            return  # empty log ⇒ no channels
        pdf = pd.concat(rows)
        trip = list(
            zip(pdf["src"].tolist(), pdf["dst"].tolist(), pdf["pm"].tolist())
        )
        transient = sorted({s for s, _, _ in trip})
        r = {s: int(m) for s, d, m in trip if d == "CONV"}
        channels = sorted(c for c in transient if c != "START")

        def absorb(dropped=None):
            q = {
                (s, d): int(m)
                for s, d, m in trip
                if d in transient and d != dropped
            }
            x = {s: 0 for s in transient}
            for _ in range(_iters):
                x = {
                    s: r.get(s, 0)
                    + sum(q.get((s, t), 0) * x[t] for t in transient)
                    // 1_000_000
                    for s in transient
                }
            return x.get("START", 0)

        pf = absorb()
        out = []
        for c in channels:
            pr = absorb(dropped=c)
            re_c = pf - pr
            out.append((c[3:], pf, pr, re_c))  # strip the 'ch:' prefix
        tot_re = sum(v[3] for v in out)
        yield pd.DataFrame(
            {
                "channel": [v[0] for v in out],
                "p_conv_full_ppm": pd.Series(
                    [v[1] for v in out], dtype="int64"
                ),
                "p_conv_removed_ppm": pd.Series(
                    [v[2] for v in out], dtype="int64"
                ),
                "removal_effect_ppm": pd.Series(
                    [0 if pf == 0 else v[3] * 1_000_000 // pf for v in out],
                    dtype="int64",
                ),
                "attribution_ppm": pd.Series(
                    [
                        0 if tot_re == 0 else v[3] * 1_000_000 // tot_re
                        for v in out
                    ],
                    dtype="int64",
                ),
            }
        )

    from projet_meteo_etl_spark.cachescope import scoped_cache

    out = (
        p.coalesce(1)
        .mapInPandas(
            chain_kernel,
            "channel string, p_conv_full_ppm long, p_conv_removed_ppm long,"
            " removal_effect_ppm long, attribution_ppm long",
        )
        .orderBy("channel")
    )
    return scoped_cache(out, seq)


MARKOV_ATTR_SQL = f"""
WITH RECURSIVE e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus,
         -- real channels carry a 'ch:' prefix (see the Spark kernel):
         -- an event_type literally named CONV/NULL/START must not merge
         -- with the synthetic absorbing/terminal states
         CASE WHEN event_type = 'purchase' THEN 'CONV'
              ELSE 'ch:' || event_type END AS st,
         event_type = 'purchase' AS is_p,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn
  FROM events
),
cutoff AS (SELECT user_id, min(rn) AS prn FROM e WHERE is_p GROUP BY 1),
kept AS (
  SELECT e.*, c.prn FROM e LEFT JOIN cutoff c USING (user_id)
  WHERE c.prn IS NULL OR e.rn <= c.prn
),
seq AS (
  SELECT user_id, rn, st, prn,
         lag(st) OVER (PARTITION BY user_id ORDER BY rn) AS prev,
         max(rn) OVER (PARTITION BY user_id) AS mx
  FROM kept
),
steps AS (
  SELECT coalesce(prev, 'START') AS src, st AS dst FROM seq
  UNION ALL
  SELECT st AS src, 'NULL' AS dst FROM seq WHERE rn = mx AND prn IS NULL
),
cnt AS (SELECT src, dst, count(*) AS c FROM steps GROUP BY 1, 2),
tot AS (SELECT src, sum(c) AS t FROM cnt GROUP BY 1),
-- MATERIALIZED: the recursive iteration below references (through
-- qmat/rvec/spine) this CTE; without materialization DuckDB re-inlines
-- and re-runs the whole per-user journey pipeline once per iteration
-- (32x the corpus scan — measured 17 s at sf0.001 vs 0.1 s materialized)
p AS MATERIALIZED (
  SELECT c.src, c.dst,
         CAST(CAST(c.c AS HUGEINT) * 1000000 // t.t AS BIGINT) AS pm
  FROM cnt c JOIN tot t USING (src)
),
scen AS (
  -- removal scenarios carry an 'rm:' prefix so the baseline label can
  -- never collide with a channel literally named 'full' (an event_type
  -- is user data — any string is possible); dropped stays the raw name
  SELECT 'full' AS scenario, CAST(NULL AS VARCHAR) AS dropped
  UNION ALL
  SELECT DISTINCT 'rm:' || src, src FROM p WHERE src <> 'START'
),
spine AS (
  SELECT s.scenario, t.src FROM scen s, (SELECT DISTINCT src FROM p) t
),
qmat AS (
  -- transitions into transient states, minus the scenario's dropped
  -- channel; the zero self-loop spine keeps every state present in
  -- each recursion step even when nothing transitions into it
  SELECT s.scenario, p.src, p.dst, p.pm
  FROM p, scen s
  WHERE p.dst IN (SELECT DISTINCT src FROM p)
    AND (s.dropped IS NULL OR p.dst <> s.dropped)
  UNION ALL
  SELECT scenario, src, src, CAST(0 AS BIGINT) FROM spine
),
rvec AS (
  SELECT s.scenario, p.src AS state, p.pm
  FROM p, scen s WHERE p.dst = 'CONV'
),
it(k, scenario, state, x) AS (
  SELECT 0, scenario, src, CAST(0 AS BIGINT) FROM spine
  UNION ALL
  SELECT i.k + 1, i.scenario, q.src,
         CAST(coalesce(max(r.pm), 0)
              + sum(q.pm * i.x) // 1000000 AS BIGINT)
  FROM it i
  JOIN qmat q ON q.scenario = i.scenario AND q.dst = i.state
  LEFT JOIN rvec r ON r.scenario = i.scenario AND r.state = q.src
  WHERE i.k < {MARKOV_ITERS}
  GROUP BY i.k, i.scenario, q.src
),
final AS (
  SELECT scenario, x FROM it WHERE k = {MARKOV_ITERS} AND state = 'START'
),
full_p AS (SELECT x AS pf FROM final WHERE scenario = 'full'),
re AS (
  -- scenario is 'rm:ch:<event_type>'; strip both prefixes for output
  SELECT substr(f.scenario, 7) AS channel, fp.pf, f.x AS pr,
         fp.pf - f.x AS eff
  FROM final f, full_p fp WHERE f.scenario LIKE 'rm:%'
),
tot_re AS (SELECT sum(eff) AS t FROM re)
SELECT channel,
       CAST(pf AS BIGINT) AS p_conv_full_ppm,
       CAST(pr AS BIGINT) AS p_conv_removed_ppm,
       CAST(CASE WHEN pf = 0 THEN 0 ELSE eff * 1000000 // pf END AS BIGINT)
         AS removal_effect_ppm,
       CAST(CASE WHEN t = 0 THEN 0 ELSE eff * 1000000 // t END AS BIGINT)
         AS attribution_ppm
FROM re, tot_re
ORDER BY channel
"""


#: the four non-conversion channels, in bit order — masks are 0..15
SHAPLEY_CHANNELS = ("click", "error", "signup", "view")
#: n=4 ⇒ coalition weight s!(n−1−s)!/n! = {3,1,1,3}/12 — exact at
#: denominator 12, so Shapley sums are exact integers in ppm/12 units
SHAPLEY_W12 = (3, 1, 1, 3)


def shapley_attribution_channels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT Shapley-value attribution over the four engagement
    channels (Shapley 1953; the marketing form of Zhao et al. 2018):
    each user's coalition is the SET of channel event types they
    emitted, the characteristic function v(S) is the conversion rate
    (has-a-purchase) of users with exactly coalition S, and channel
    i's credit is Σ_{S∌i} w(|S|)·(v(S∪{i}) − v(S)) with the factorial
    weights w = {3,1,1,3}/12.  Fourth member of the attribution family
    — last-touch (one channel takes all), linear (equal split),
    position-based (U-shaped), Markov removal (path-based) — and the
    only one with the fairness axioms.

    Exactness: with n = 4 the 16 coalition rates are ppm integers and
    the weights clear at denominator 12, so ``shapley_scaled`` (ppm/12
    units) is an exact integer sum; ``shapley_ppm`` is one truncating
    division both engines perform identically.  Empty coalitions get
    v = 0 via a generated 0..15 spine, so both engines see all 16
    subsets.

    Scale: one event scan → per-user channel-bitmask + converted-flag
    rollup (map-combinable) → a 16-row coalition table; the Shapley
    sum is a 4×8 join over that table — constant beyond the scan.
    """
    e = load_table(spark, sf_dir, "events")
    mask_expr = " + ".join(
        f"CAST(max(CASE WHEN event_type = '{ch}' THEN 1 ELSE 0 END)"
        f" * {1 << b} AS INT)"
        for b, ch in enumerate(SHAPLEY_CHANNELS)
    )
    users = e.groupBy("user_id").agg(
        F.expr(f"{mask_expr}").alias("mask"),
        F.expr(
            "max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)"
        ).alias("conv"),
    )
    spine = spark.range(0, 16).select(F.col("id").cast("int").alias("mask"))
    v = (
        spine.join(
            users.groupBy("mask").agg(
                F.count(F.lit(1)).alias("n_users"),
                F.sum("conv").alias("n_conv"),
            ),
            "mask",
            "left",
        )
        .select(
            "mask",
            F.expr(
                "CAST(CASE WHEN coalesce(n_users, 0) = 0 THEN 0"
                " ELSE coalesce(n_conv, 0) * 1000000 DIV n_users END"
                " AS BIGINT)"
            ).alias("v_ppm"),
        )
    )
    from projet_meteo_etl_spark.cachescope import scoped_cache

    v = v.persist()
    # per channel i: join v(S) for S without i against v(S ∪ {i})
    parts = []
    for b, ch in enumerate(SHAPLEY_CHANNELS):
        bit = 1 << b
        s = v.filter(F.expr(f"(mask & {bit}) = 0")).select(
            F.col("mask").alias("m0"), F.col("v_ppm").alias("v0")
        )
        si = v.select(
            F.col("mask").alias("m1"), F.col("v_ppm").alias("v1")
        )
        w_case = " ".join(
            f"WHEN bit_count(m0) = {sz} THEN {w}"
            for sz, w in enumerate(SHAPLEY_W12)
        )
        parts.append(
            s.join(F.broadcast(si), F.expr(f"m1 = m0 + {bit}"))
            .select(
                F.lit(ch).alias("channel"),
                F.expr(f"CAST((CASE {w_case} END) * (v1 - v0) AS BIGINT)")
                .alias("term"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    out = (
        allp.groupBy("channel")
        .agg(F.sum("term").cast("long").alias("shapley_scaled"))
        .select(
            "channel",
            "shapley_scaled",
            F.expr("CAST(shapley_scaled DIV 12 AS BIGINT)").alias(
                "shapley_ppm"
            ),
        )
        .orderBy("channel")
    )
    return scoped_cache(out, v)


def _shapley_terms_sql() -> str:
    chans = []
    for b, ch in enumerate(SHAPLEY_CHANNELS):
        bit = 1 << b
        w_case = " ".join(
            f"WHEN bit_count(s.mask) = {sz} THEN {w}"
            for sz, w in enumerate(SHAPLEY_W12)
        )
        chans.append(
            f"SELECT '{ch}' AS channel,"
            f" CAST((CASE {w_case} END) * (si.v_ppm - s.v_ppm) AS BIGINT)"
            f" AS term"
            f" FROM v s JOIN v si ON si.mask = s.mask + {bit}"
            f" WHERE (s.mask & {bit}) = 0"
        )
    return " UNION ALL ".join(chans)


SHAPLEY_SQL = f"""
WITH users AS (
  SELECT user_id,
         {" + ".join(
             f"CAST(max(CASE WHEN event_type = '{ch}' THEN 1 ELSE 0 END)"
             f" * {1 << b} AS INTEGER)"
             for b, ch in enumerate(SHAPLEY_CHANNELS)
         )} AS mask,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id
),
per AS (
  SELECT mask, count(*) AS n_users, sum(conv) AS n_conv
  FROM users GROUP BY mask
),
v AS (
  SELECT sp.mask,
         CAST(CASE WHEN coalesce(p.n_users, 0) = 0 THEN 0
              ELSE coalesce(p.n_conv, 0) * 1000000 // p.n_users END
              AS BIGINT) AS v_ppm
  FROM (SELECT unnest(range(16))::INTEGER AS mask) sp
  LEFT JOIN per p ON p.mask = sp.mask
),
terms AS ({_shapley_terms_sql()})
SELECT channel, CAST(sum(term) AS BIGINT) AS shapley_scaled,
       CAST(CAST(sum(term) AS BIGINT) // 12 AS BIGINT) AS shapley_ppm
FROM terms GROUP BY channel
ORDER BY channel
"""


SPARK_QUERIES = {
    "retention_halflife_fit": retention_halflife_fit,
    "shapley_attribution_channels": shapley_attribution_channels,
    "markov_attribution_removal": markov_attribution_removal,
    "markov_next_click_hitrate": markov_next_click_hitrate,
    "session_duration_percentiles": session_duration_percentiles,
    "linear_attribution_credit": linear_attribution_credit,
    "cold_start_coverage": cold_start_coverage,
    "pit_training_set_assembly": pit_training_set_assembly,
    "last_touch_attribution": last_touch_attribution,
    "asof_purchase_before_click": asof_purchase_before_click,
    "range_join_clicks_after_purchase": range_join_clicks_after_purchase,
    "range_join_binned": range_join_binned,
    "event_funnel_counts": event_funnel_counts,
    "cohort_retention": cohort_retention,
    "user_value_deciles": user_value_deciles,
    "event_transition_matrix": event_transition_matrix,
    "session_path_topk": session_path_topk,
    "position_based_attribution": position_based_attribution,
    "funnel_stage_latency": funnel_stage_latency,
}

ORACLE_SQL = {
    "retention_halflife_fit": RETENTION_HALFLIFE_SQL,
    "shapley_attribution_channels": SHAPLEY_SQL,
    "markov_attribution_removal": MARKOV_ATTR_SQL,
    "markov_next_click_hitrate": NEXT_CLICK_SQL,
    "session_duration_percentiles": SESSION_DURATION_SQL,
    "linear_attribution_credit": LINEAR_ATTR_SQL,
    "cold_start_coverage": COLD_START_SQL,
    "pit_training_set_assembly": PIT_ASSEMBLY_SQL,
    "last_touch_attribution": LAST_TOUCH_SQL,
    "asof_purchase_before_click": ASOF_SQL,
    "range_join_clicks_after_purchase": RANGE_JOIN_SQL,
    "range_join_binned": RANGE_JOIN_BINNED_SQL,
    "event_funnel_counts": FUNNEL_SQL,
    "cohort_retention": COHORT_SQL,
    "user_value_deciles": DECILES_SQL,
    "event_transition_matrix": TRANSITION_SQL,
    "session_path_topk": SESSION_PATH_SQL,
    "position_based_attribution": POSITION_ATTR_SQL,
    "funnel_stage_latency": FUNNEL_LATENCY_SQL,
}


#: fixed-point scale for the entropy logs (milli-nats)
ENTROPY_LOG_SCALE = 1000


def transition_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order entropy rate of the click sequence — the
    information-theoretic CEILING for any next-click predictor
    (:func:`markov_next_click_hitrate` measures one predictor;
    ``H(next | current)`` bounds them all, Song et al. 2010's
    predictability framing): conditional entropy of the transition
    distribution, the unconditional next-item entropy, and the
    predictability gain ``1 − H_cond/H_marg`` — how much of the
    sequence's uncertainty the one-step memory removes.

    Fixed point end-to-end (the ``retention_halflife_fit`` log
    discipline): probabilities enter as exact ppm integers,
    ``ln`` terms as ``floor(1000·ln(ppm))`` milli-nats, and both
    entropies are count-weighted integer sums with ONE trunc division
    — identical in both engines, no float accumulation anywhere.

    Scale: one lag-window pass → (src, dst) count rollup
    (pair-domain bounded); everything downstream is rollup-sized.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    clicks = e.select(
        "user_id",
        json_long().alias("item"),
        F.unix_micros("ts").alias("t"),
        "event_id",
    ).filter(F.col("item").isNotNull())
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    trans = (
        clicks.select("item", F.lag("item").over(w).alias("prev"))
        .filter(F.col("prev").isNotNull() & (F.col("prev") != F.col("item")))
        .selectExpr("prev AS src", "item AS dst")
    )
    pair = trans.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("c_sd")
    ).persist()
    src_tot = pair.groupBy("src").agg(F.sum("c_sd").alias("c_s"))
    dst_tot = pair.groupBy("dst").agg(F.sum("c_sd").alias("c_d"))
    n_tot = pair.agg(
        F.sum("c_sd").alias("n"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("src").alias("n_states"),
    )
    lg = f"floor({ENTROPY_LOG_SCALE}.0 * ln(CAST({{x}} AS DOUBLE)))"
    ln_e6 = f"floor({ENTROPY_LOG_SCALE}.0 * ln(1000000.0))"
    # conditional: Σ_sd c_sd · (L(1e6) − L(p_sd|s ppm)), one DIV by N
    cond = (
        pair.join(src_tot, "src")
        .select(
            "c_sd",
            F.expr(
                f"CAST(c_sd AS DECIMAL(38,0)) * ({ln_e6}"
                f" - {lg.format(x='CAST(CAST(c_sd AS DECIMAL(38,0)) * 1000000 DIV c_s AS BIGINT)')})"
            ).alias("term"),
        )
        .agg(F.sum("term").alias("h_num"))
    )
    marg = (
        dst_tot.crossJoin(F.broadcast(n_tot.select("n")))
        .select(
            F.expr(
                f"CAST(c_d AS DECIMAL(38,0)) * ({ln_e6}"
                f" - {lg.format(x='CAST(CAST(c_d AS DECIMAL(38,0)) * 1000000 DIV n AS BIGINT)')})"
            ).alias("term")
        )
        .agg(F.sum("term").alias("m_num"))
    )
    from projet_meteo_etl_spark.cachescope import scoped_cache

    out = (
        n_tot.crossJoin(F.broadcast(cond))
        .crossJoin(F.broadcast(marg))
        .select(
            F.col("n").cast("long").alias("n_transitions"),
            F.col("n_pairs").cast("long").alias("n_pairs"),
            F.col("n_states").cast("long").alias("n_states"),
            F.expr("CAST(h_num DIV n AS BIGINT)").alias("h_cond_mnat"),
            F.expr("CAST(m_num DIV n AS BIGINT)").alias("h_marg_mnat"),
            F.expr(
                "CASE WHEN m_num > 0 THEN CAST((m_num - h_num) * 1000000"
                " DIV m_num AS BIGINT) END"
            ).alias("pred_gain_ppm"),
        )
    )
    return scoped_cache(out, pair)


ENTROPY_RATE_SQL = f"""
WITH eclicks AS (
  SELECT user_id, TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) AS item,
         epoch_us(ts) AS t, event_id
  FROM events
  WHERE event_type = 'click'
    AND TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) IS NOT NULL
),
trans AS (
  SELECT prev AS src, item AS dst FROM (
    SELECT item,
           lag(item) OVER (PARTITION BY user_id ORDER BY t, event_id)
             AS prev
    FROM eclicks
  ) WHERE prev IS NOT NULL AND prev <> item
),
pair AS (
  SELECT src, dst, CAST(count(*) AS HUGEINT) AS c_sd
  FROM trans GROUP BY src, dst
),
src_tot AS (SELECT src, sum(c_sd) AS c_s FROM pair GROUP BY src),
dst_tot AS (SELECT dst, sum(c_sd) AS c_d FROM pair GROUP BY dst),
n_tot AS (
  SELECT sum(c_sd) AS n, CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(count(DISTINCT src) AS BIGINT) AS n_states
  FROM pair
),
cond AS (
  -- floor() is DOUBLE in DuckDB and DOUBLE // BIGINT does NOT floor
  -- (and CAST double->BIGINT rounds): force the log terms integral so
  -- the sums stay HUGEINT and // truncates like Spark DIV
  SELECT sum(p.c_sd * (CAST(floor({ENTROPY_LOG_SCALE}.0
                              * ln(1000000.0)) AS BIGINT)
           - CAST(floor({ENTROPY_LOG_SCALE}.0
                   * ln(CAST(CAST(p.c_sd::HUGEINT * 1000000 // s.c_s AS BIGINT)
                             AS DOUBLE))) AS BIGINT))) AS h_num
  FROM pair p JOIN src_tot s ON s.src = p.src
),
marg AS (
  SELECT sum(d.c_d * (CAST(floor({ENTROPY_LOG_SCALE}.0
                              * ln(1000000.0)) AS BIGINT)
           - CAST(floor({ENTROPY_LOG_SCALE}.0
                   * ln(CAST(CAST(d.c_d::HUGEINT * 1000000 // t.n AS BIGINT)
                             AS DOUBLE))) AS BIGINT))) AS m_num
  FROM dst_tot d, n_tot t
)
SELECT CAST(t.n AS BIGINT) AS n_transitions, t.n_pairs, t.n_states,
       CAST(c.h_num // t.n AS BIGINT) AS h_cond_mnat,
       CAST(m.m_num // t.n AS BIGINT) AS h_marg_mnat,
       CASE WHEN m.m_num > 0
            THEN CAST((m.m_num - c.h_num) * 1000000 // m.m_num AS BIGINT)
       END AS pred_gain_ppm
FROM n_tot t, cond c, marg m
"""


SPARK_QUERIES["transition_entropy_rate"] = transition_entropy_rate
ORACLE_SQL["transition_entropy_rate"] = ENTROPY_RATE_SQL
