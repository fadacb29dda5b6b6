"""Time-series operators over the events stream table.

* ``user_value_trend`` — per-user OLS trend of purchase value over
  time, via Spark's built-in regression aggregates (``regr_slope`` /
  ``regr_intercept`` / ``corr``): single hash-agg shuffle, no Python.
* ``user_hourly_ffill`` — gap-filling resample: each user's purchase
  series expanded to a dense 1-hour grid (``sequence`` + ``explode``)
  with values carried forward (``last(..., ignorenulls)`` window) —
  the standard Spark shape for as-of/ffill resampling.  Money stays in
  integer cents end-to-end, so carried values are hash-exact.

Scale: the grid explode multiplies rows by the gap span, bounded here
to the observed per-user range; at 100 TB you'd bucket the grid per
(user, day) so a single long-lived user cannot skew one task — noted
inline where it applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.functions.portable import pround, pround_total


def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend of purchase value (dollars) vs hours since
    epoch — slope, intercept, and correlation from EXACT integer
    moments.

    ``regr_slope``/``corr`` accumulate double moments whose partial-sum
    merge order varies with partitioning; like the zscore/twap/acf
    siblings, the moments here are DECIMAL(38,0) sums of integer
    µs×cents terms (order-free), and the closed-form combination is one
    fixed double expression per output, evaluated identically by both
    engines.  x is re-originated at the global min timestamp so the
    squared-moment magnitudes stay far from DECIMAL(38) overflow
    (span² ≈ 7e24 per term; slope/corr are translation-invariant and
    the intercept re-adds the origin).
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    base = e.select(
        "user_id",
        F.unix_micros("ts").alias("xu"),
        F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").alias("yc"),
    )
    x0df = base.agg(F.min("xu").alias("x0"))
    b = base.crossJoin(F.broadcast(x0df)).select(
        "user_id", (F.col("xu") - F.col("x0")).alias("xr"), "yc", "x0"
    )
    dec = "CAST({} AS DECIMAL(38,0))"
    m = (
        b.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.expr(dec.format("xr"))).alias("sx"),
            F.sum(F.expr(dec.format("yc"))).alias("sy"),
            F.sum(F.expr(dec.format("xr") + " * xr")).alias("sxx"),
            F.sum(F.expr(dec.format("xr") + " * yc")).alias("sxy"),
            F.sum(F.expr(dec.format("yc") + " * yc")).alias("syy"),
            F.first("x0").alias("x0"),
        )
        .filter(F.col("n") >= 3)
    )
    return m.select(
        "user_id",
        F.col("n").alias("n_purchases"),
        # slope/intercept magnitudes are NOT domain-bounded (ratio of
        # moments x an epoch-scale origin): total floor, see pround_total
        pround_total(F.expr("(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 36000000.0)"), 6).alias("slope"),
        pround_total(F.expr("((CAST(sy AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0)) - (((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 36000000.0) * ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) + CAST(x0 AS DOUBLE)) / 3600000000.0))"), 4).alias("intercept"),
        pround(F.expr("((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"), 6).alias("correlation"),
    ).orderBy("user_id")


USER_TREND_SQL = """
WITH base AS (
  SELECT user_id, epoch_us(ts) AS xu,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS yc
  FROM events WHERE event_type = 'purchase'
),
b AS (
  SELECT user_id, xu - x0 AS xr, yc, x0
  FROM base CROSS JOIN (SELECT min(xu) AS x0 FROM base)
),
m AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n,
         sum(CAST(xr AS DECIMAL(38,0))) AS sx,
         sum(CAST(yc AS DECIMAL(38,0))) AS sy,
         sum(CAST(xr AS DECIMAL(38,0)) * xr) AS sxx,
         sum(CAST(xr AS DECIMAL(38,0)) * yc) AS sxy,
         sum(CAST(yc AS DECIMAL(38,0)) * yc) AS syy,
         first(x0) AS x0
  FROM b GROUP BY user_id
  HAVING count(*) >= 3
)
SELECT user_id, n AS n_purchases,
       floor(((((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 36000000.0)) * 1000000.0 + 0.5) / 1000000.0 AS slope,
       floor((((CAST(sy AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0)) - (((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 36000000.0) * ((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) + CAST(x0 AS DOUBLE)) / 3600000000.0))) * 10000.0 + 0.5) / 10000.0 AS intercept,
       floor((((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))) * 1000000.0 + 0.5) / 1000000.0 AS correlation
FROM m
ORDER BY user_id
"""


def user_hourly_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 1-hour resample per user with forward-filled last purchase
    value (integer cents).  Shape: hourly agg → per-user grid explode →
    carry-forward window.  Summarized (count + checksum) to keep the
    result compact at any scale."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    hourly = (
        e.select(
            "user_id",
            F.floor(F.unix_micros("ts") / F.lit(3_600_000_000)).cast("long").alias("hour"),
            F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .groupBy("user_id", "hour")
        .agg(F.max("cents").alias("cents"))  # last-known value per hour: max for determinism
    )
    span = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    # at 100 TB: explode per (user, day) instead of the full span so one
    # long-lived user cannot produce a single giant task
    grid = span.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("hour")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.last("cents", ignorenulls=True).over(w).alias("cents_ffill"),
        )
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.when(F.col("cents_ffill").isNotNull(), 1).otherwise(0)).alias(
                "n_filled"
            ),
            F.sum("cents_ffill").alias("cents_checksum"),
        )
        .orderBy("user_id")
    )


USER_FFILL_SQL = """
WITH hourly AS (
  SELECT user_id,
         CAST(floor(epoch_us(ts) / 3600000000.0) AS BIGINT) AS hour,
         max(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
),
span AS (
  SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY user_id
),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1)) AS hour FROM span
),
filled AS (
  SELECT g.user_id, g.hour,
         last_value(h.cents IGNORE NULLS) OVER (
           PARTITION BY g.user_id ORDER BY g.hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cents_ffill
  FROM grid g LEFT JOIN hourly h ON g.user_id = h.user_id AND g.hour = h.hour
)
SELECT user_id,
       count(*) AS n_hours,
       CAST(sum(CASE WHEN cents_ffill IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
       CAST(sum(cents_ffill) AS BIGINT) AS cents_checksum
FROM filled
GROUP BY user_id
ORDER BY user_id
"""


#: EWMA smoothing factor — the oracle SQL below interpolates this, so
#: Spark and DuckDB can never silently disagree on it
EWMA_ALPHA = 0.3


def user_value_ewma(
    spark: SparkSession, sf_dir: str, alpha: float = EWMA_ALPHA
) -> DataFrame:
    """Per-user exponentially-weighted moving average of purchase value.

    EWMA is RECURSIVE (each output depends on the previous output), so
    no SQL window frame can express it — this is the documented
    ``applyInPandas`` escape hatch in its intended role: groups are
    hash-partitioned to executors, each group's series is computed
    vectorized in pandas, nothing ever gathers on the driver.

    Oracle-checked: pandas ``ewm(alpha, adjust=False)`` evaluates
    exactly ``y_t = (1-α)·y_{t-1} + α·x_t`` in IEEE double, and a
    DuckDB recursive CTE stepping ``0.7*prev + 0.3*x`` over per-user
    row numbers reproduces it BIT-EXACTLY (verified: 1981/1981 values
    identical at sf0.01) — the recursion depth is max events per user,
    not table size.
    """
    import pandas as pd

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts", "value")
    )

    def ewma(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        pdf["ewma_value"] = pdf["value"].ewm(alpha=alpha, adjust=False).mean()
        return pdf[["user_id", "event_id", "ewma_value"]]

    return (
        # pre-partition on the group key: the groupBy reuses this hash
        # distribution, so the Python stage runs 8 tasks instead of
        # spark.sql.shuffle.partitions (≈6× wall at test scale — each
        # Arrow task pays worker/serialization overhead).  At real scale
        # size this to (total group bytes / executor memory), not 8.
        e.repartition(8, "user_id")
        .groupBy("user_id")
        .applyInPandas(ewma, "user_id bigint, event_id bigint, ewma_value double")
        .orderBy("user_id", "event_id")
    )


def events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score anomaly detection over purchase values.

    The moments come from EXACT integer-cent sums (Σc and Σc² as
    DECIMAL(38,0) window aggregates — order-independent, overflow-proof
    at 100 TB row counts); mean/variance/z are then derived in double
    from those exact integers, so the result can never drift with
    partitioning.  One unordered window pass over the user partition —
    a single shuffle, no join-back.

    Flags |z| ≥ 2 for users with ≥ 5 purchases and non-degenerate
    variance (sample variance, n−1).
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    base = e.select("user_id", "event_id", "value", cents.alias("c"))
    w = Window.partitionBy("user_id")
    dec = F.col("c").cast("decimal(38,0)")
    stats = base.select(
        "user_id",
        "event_id",
        "value",
        "c",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(dec).over(w).cast("double").alias("s1"),
        # widen BEFORE the square: the long*long product wraps at
        # |c| > ~3e9 cents before the decimal cast can save it (the
        # oracle already multiplies in HUGEINT)
        F.sum(F.expr("CAST(c AS DECIMAL(38,0)) * c"))
        .over(w)
        .cast("double")
        .alias("s2"),
    )
    mean_c = F.col("s1") / F.col("n")
    var_c = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (
        F.col("n") - 1
    )
    z = (F.col("c") - mean_c) / F.sqrt(var_c)
    return (
        stats.filter((F.col("n") >= 5) & (var_c > 0))
        .select(
            "user_id",
            "event_id",
            "value",
            F.col("n").alias("n_purchases"),
            pround(z, 4).alias("z_score"),
        )
        .filter(F.abs(F.col("z_score")) >= 2.0)
        .orderBy("user_id", "event_id")
    )


EVENTS_ZSCORE_SQL = """
WITH base AS (
  SELECT user_id, event_id, value,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
),
stats AS (
  SELECT user_id, event_id, value, c,
         count(*) OVER w AS n,
         CAST(sum(CAST(c AS HUGEINT)) OVER w AS DOUBLE) AS s1,
         CAST(sum(CAST(c AS HUGEINT) * c) OVER w AS DOUBLE) AS s2
  FROM base WINDOW w AS (PARTITION BY user_id)
),
scored AS (
  SELECT user_id, event_id, value, CAST(n AS BIGINT) AS n_purchases,
         floor(((c - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)))
               * 10000.0 + 0.5) / 10000.0 AS z_score
  FROM stats
  WHERE n >= 5 AND (s2 - s1 * s1 / n) / (n - 1) > 0
)
SELECT user_id, event_id, value, n_purchases, z_score
FROM scored WHERE abs(z_score) >= 2.0
ORDER BY user_id, event_id
"""


#: SCD2 value bands (purchase size segments)
_BAND = "CASE WHEN value < 100 THEN 'low' WHEN value < 300 THEN 'mid' ELSE 'high' END"


def scd2_value_band_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 history build — the warehouse
    operator that turns a change stream into validity-interval rows.

    Each user's purchase stream is banded (low/mid/high by value); a
    run of consecutive equal bands collapses to ONE version row with
    ``valid_from_us`` / ``valid_to_us`` (integer microseconds — the
    hash-exact interchange form for event time) and ``is_current`` on
    the open interval.  Gaps-and-islands via running change-flag sum;
    every window and the collapse aggregate share the user partition,
    so the whole history build is one shuffle.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    band = F.expr(_BAND)
    base = e.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        band.alias("band"),
    )
    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    chg = (
        F.when(
            F.lag("band").over(wo).isNull()
            | (F.col("band") != F.lag("band").over(wo)),
            1,
        ).otherwise(0)
    )
    versions = (
        base.withColumn("ver", F.sum(chg).over(wo))
        .groupBy("user_id", "ver")
        .agg(
            F.min_by("band", "ts_us").alias("band"),
            F.min("ts_us").alias("valid_from_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    wv = Window.partitionBy("user_id").orderBy("ver")
    return (
        versions.withColumn("valid_to_us", F.lead("valid_from_us").over(wv))
        .select(
            "user_id",
            F.col("ver").cast("long").alias("version"),
            "band",
            "valid_from_us",
            "valid_to_us",
            "n_events",
            F.col("valid_to_us").isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


SCD2_HISTORY_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         {_BAND} AS band
  FROM events WHERE event_type = 'purchase'
),
flagged AS (
  SELECT user_id, event_id, ts_us, band,
    CASE WHEN lag(band) OVER w IS NULL OR band <> lag(band) OVER w
         THEN 1 ELSE 0 END AS chg
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
numbered AS (
  SELECT *, sum(chg) OVER (PARTITION BY user_id
                           ORDER BY ts_us, event_id
                           ROWS UNBOUNDED PRECEDING) AS ver
  FROM flagged
),
versions AS (
  SELECT user_id, ver, arg_min(band, ts_us) AS band,
         min(ts_us) AS valid_from_us, count(*) AS n_events
  FROM numbered GROUP BY user_id, ver
)
SELECT user_id, CAST(ver AS BIGINT) AS version, band, valid_from_us,
       lead(valid_from_us) OVER wv AS valid_to_us, n_events,
       (lead(valid_from_us) OVER wv IS NULL) AS is_current
FROM versions WINDOW wv AS (PARTITION BY user_id ORDER BY ver)
ORDER BY user_id, version
"""


def user_value_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average purchase value per user — the piecewise
    -constant integral ``Σ value_i · (t_{i+1} − t_i) / (t_last − t_first)``
    (each observation holds until the next one).

    The integral accumulates in exact ``cents × microseconds`` units
    (DECIMAL(38,0): 10^7 cents × 10^13 µs spans never overflow), so
    the per-user sum is order-independent; the TWAP is one terminal
    division.  lead() and the rollup share the user partition — one
    shuffle, like every per-user operator in this module.  Users with
    a single purchase (no interval) are excluded, matching the oracle.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    base = e.select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    )
    wo = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    seg = base.select(
        "user_id",
        "ts_us",
        "cents",
        F.lead("ts_us").over(wo).alias("next_us"),
    ).filter(F.col("next_us").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.sum(
                (F.col("cents").cast("decimal(38,0)"))
                * (F.col("next_us") - F.col("ts_us")).cast("decimal(38,0)")
            ).alias("area"),
            F.min("ts_us").alias("t0"),
            F.max("next_us").alias("t1"),
            F.count(F.lit(1)).alias("n_segments"),
        )
        .select(
            "user_id",
            "n_segments",
            pround(
                F.col("area").cast("double")
                / ((F.col("t1") - F.col("t0")).cast("double") * 100.0),
                6,
            ).alias("twap_value"),
        )
        .orderBy("user_id")
    )


USER_TWAP_SQL = """
WITH base AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
seg AS (
  SELECT user_id, ts_us, cents,
         lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS next_us
  FROM base
)
SELECT user_id, count(*) AS n_segments,
       floor((CAST(sum(CAST(cents AS HUGEINT) * CAST(next_us - ts_us AS HUGEINT)) AS DOUBLE)
              / (CAST(max(next_us) - min(ts_us) AS DOUBLE) * 100.0)) * 1000000.0 + 0.5)
         / 1000000.0 AS twap_value
FROM seg
WHERE next_us IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


#: PSI buckets over the purchase value range (fixed edges → no
#: data-dependent bucketing drift between the compared windows)
PSI_EDGES = (0.0, 50.0, 100.0, 150.0, 200.0, 300.0, 400.0, 500.0)
PSI_SPLIT_DAY = "2024-01-16"


def events_value_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report between the first and
    second half of the month: purchase values bucketed on fixed edges,
    per-bucket PSI term ``(p − q) · ln(p / q)`` floored to integer
    micro-units (the BM25 fixed-point trick) so the total is an exact
    integer sum.  Distribution drift is THE production trigger for
    retraining / repartitioning decisions; one scan, one 2×B-cell
    aggregate, everything else is arithmetic on ≤ B rows.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    # chained whens evaluate first-match-first — identical to the SQL
    # CASE's ascending-edge order
    edges = list(PSI_EDGES)
    bucket = F.when(F.col("value") < edges[0], F.lit(0))
    for i in range(1, len(edges)):
        bucket = bucket.when(F.col("value") < edges[i], F.lit(i))
    bucket = bucket.otherwise(F.lit(len(edges)))
    half = F.when(
        F.to_date("ts") < F.lit(PSI_SPLIT_DAY).cast("date"), "a"
    ).otherwise("b")
    counts = (
        e.select(half.alias("half"), bucket.alias("bucket"))
        .groupBy("half", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pivoted = (
        counts.groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("half") == "a", F.col("n")).otherwise(0)).alias("na"),
            F.sum(F.when(F.col("half") == "b", F.col("n")).otherwise(0)).alias("nb"),
        )
    )
    totals = pivoted.agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    p = F.col("na") / F.col("ta")
    q = F.col("nb") / F.col("tb")
    term = F.floor((p - q) * F.log(p / q) * 1e6).cast("long")
    return (
        pivoted.crossJoin(F.broadcast(totals))
        # a bucket empty on either side has an undefined PSI term
        # (ln 0): excluded in both engines; totals still cover all rows
        .filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(
            "bucket",
            "na",
            "nb",
            term.alias("psi_term_micros"),
        )
        .orderBy("bucket")
    )


EVENTS_PSI_SQL = f"""
WITH e AS (
  SELECT value, CAST(ts AS DATE) AS day FROM events WHERE event_type = 'purchase'
),
b AS (
  SELECT CASE
    {" ".join(f"WHEN value < {PSI_EDGES[i]} THEN {i}" for i in range(len(PSI_EDGES)))}
    ELSE {len(PSI_EDGES)} END AS bucket,
    CASE WHEN day < DATE '{PSI_SPLIT_DAY}' THEN 'a' ELSE 'b' END AS half
  FROM e
),
pivoted AS (
  SELECT bucket,
         CAST(sum(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM b GROUP BY bucket
),
totals AS (SELECT sum(na) AS ta, sum(nb) AS tb FROM pivoted)
SELECT bucket, na, nb,
       CAST(floor((na * 1.0 / ta - nb * 1.0 / tb)
                  * ln((na * 1.0 / ta) / (nb * 1.0 / tb)) * 1000000.0) AS BIGINT)
         AS psi_term_micros
FROM pivoted CROSS JOIN totals
WHERE na > 0 AND nb > 0
ORDER BY bucket
"""


#: seasonal lag in days for the naive forecast (weekly seasonality)
SEASON_DAYS = 7


def seasonal_forecast_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-evaluation report: the seasonal-naive baseline
    (revenue(d) predicted by revenue(d − 7)) scored per event type with
    MAE and MAPE — the sanity baseline every production forecast must
    beat, and a one-pass join once the stream is rolled up to daily
    grain.

    Daily revenue is exact integer cents; the self-join on (type,
    day − 7) hits the tiny daily rollup, not raw events.  MAE is an
    integer-cents mean (integer division); MAPE accumulates per-day
    |err|/actual floored to integer micros BEFORE summing, so both
    metrics are engine- and order-exact.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click", "view")
    )
    daily = (
        e.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("rev"))
    )
    fc = daily.select(
        "event_type",
        F.date_add("day", SEASON_DAYS).alias("day"),
        F.col("rev").alias("pred"),
    )
    scored = daily.join(fc, ["event_type", "day"]).filter(F.col("rev") > 0)
    abs_err = F.abs(F.col("rev") - F.col("pred"))
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.expr("sum(abs(rev - pred)) div count(1)").alias("mae_cents"),
            F.sum(
                F.floor(abs_err * 1_000_000 / F.col("rev")).cast("long")
            ).alias("sum_ape_micros"),
        )
        .select(
            "event_type",
            "n_days",
            "mae_cents",
            F.expr("sum_ape_micros div n_days").alias("mape_micros"),
        )
        .orderBy("event_type")
    )


SEASONAL_FC_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS rev
  FROM events
  WHERE event_type IN ('purchase', 'click', 'view')
  GROUP BY event_type, CAST(ts AS DATE)
),
scored AS (
  SELECT a.event_type, a.day, a.rev, f.rev AS pred
  FROM daily a
  JOIN daily f ON f.event_type = a.event_type
              AND f.day = a.day - {SEASON_DAYS}
  WHERE a.rev > 0
)
SELECT event_type,
       count(*) AS n_days,
       CAST(sum(abs(rev - pred)) // count(*) AS BIGINT) AS mae_cents,
       CAST(sum(CAST(floor(abs(rev - pred) * 1000000.0 / rev) AS BIGINT)) // count(*)
         AS BIGINT) AS mape_micros
FROM scored
GROUP BY event_type
ORDER BY event_type
"""


def revenue_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of daily revenue per event type — the
    "does yesterday predict today" diagnostic that separates trending
    series from white noise (and, with ``seasonal_forecast_error``,
    decides which baseline a forecast must beat).

    Pearson correlation of (revenue(d−1), revenue(d)) pairs computed
    from exact integer-cent moment sums in DECIMAL(38,0) — the same
    order-independent closed form as ``profile_correlations`` — over
    the daily rollup joined to itself at lag 1.  Raw events are
    scanned once; everything else is |days|-sized.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("rev"))
    )
    lagged = daily.select(
        "event_type",
        F.date_add("day", 1).alias("day"),
        F.col("rev").alias("prev"),
    )
    pairs = daily.join(lagged, ["event_type", "day"]).select(
        "event_type",
        F.col("prev").cast("decimal(38,0)").alias("x"),
        F.col("rev").cast("decimal(38,0)").alias("y"),
    )
    m = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    acf = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return m.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        pround(acf, 6).alias("acf1"),
    ).orderBy("event_type")


REVENUE_ACF_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS rev
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
pairs AS (
  SELECT a.event_type, CAST(p.rev AS HUGEINT) AS x, CAST(a.rev AS HUGEINT) AS y
  FROM daily a
  JOIN daily p ON p.event_type = a.event_type AND p.day = a.day - 1
),
m AS (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM pairs GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
  floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
        * 1000000.0 + 0.5) / 1000000.0 AS acf1
FROM m
ORDER BY event_type
"""


#: robust-z outlier test in PURE integer arithmetic:
#: |c − median| · 10^5 > MAD_K · MAD,  MAD_K = round(3.5 × 1.4826 × 10^5)
#: (3.5 = Iglewicz–Hoaglin modified-z cutoff, 1.4826 = MAD→σ for normals)
MAD_K = 518_910


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier report per event type — the
    heavy-tail-safe complement of :func:`events_zscore_outliers`
    (mean/σ z-scores are themselves dragged by the outliers they
    hunt; median and median-absolute-deviation are not).

    Both the median and the MAD are rank-exact ``percentile_disc``
    selections on integer cents (never interpolated), and the outlier
    test is pure integer arithmetic (see ``MAD_K``), so every count is
    engine-exact — no float boundary can flip a row.

    Scale: two ranked window passes over the SAME event_type
    partitioning (values, then absolute deviations) and a final
    aggregate that reuses it — one shuffle total, groups processed
    independently across executors.
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    base = e.select("event_type", "event_id", cents.alias("c"))
    wv = Window.partitionBy("event_type").orderBy("c", "event_id")
    wn = Window.partitionBy("event_type")
    med = base.select(
        "event_type",
        "c",
        F.row_number().over(wv).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    ).withColumn(
        "med",
        F.max(
            F.when(F.col("rn") == F.ceil(F.col("n") / 2), F.col("c"))
        ).over(wn),
    )
    dev = med.select(
        "event_type",
        "c",
        "n",
        "med",
        F.abs(F.col("c") - F.col("med")).alias("d"),
    )
    wd = Window.partitionBy("event_type").orderBy("d")
    mad = dev.select(
        "event_type",
        "c",
        "n",
        "med",
        "d",
        F.row_number().over(wd).alias("rd"),
    ).withColumn(
        "mad",
        F.max(
            F.when(F.col("rd") == F.ceil(F.col("n") / 2), F.col("d"))
        ).over(wn),
    )
    return (
        mad.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            (F.max("med") / 100.0).alias("median_value"),
            (F.max("mad") / 100.0).alias("mad_value"),
            F.sum(
                (F.col("d") * 100_000 > F.lit(MAD_K) * F.col("mad")).cast("int")
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .withColumn(
            "outlier_ppm",
            F.expr("(n_outliers * 1000000) div n_rows").cast("long"),
        )
        .orderBy("event_type")
    )


EVENTS_MAD_SQL = f"""
WITH base AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
  FROM events
),
med AS (
  SELECT event_type, c, n,
         max(CASE WHEN rn = ceil(n / 2.0) THEN c END)
           OVER (PARTITION BY event_type) AS med
  FROM (
    SELECT event_type, c,
           row_number() OVER (PARTITION BY event_type ORDER BY c, event_id) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM base
  )
),
mad AS (
  SELECT event_type, c, n, med, d,
         max(CASE WHEN rd = ceil(n / 2.0) THEN d END)
           OVER (PARTITION BY event_type) AS mad
  FROM (
    SELECT event_type, c, n, med, abs(c - med) AS d,
           row_number() OVER (PARTITION BY event_type ORDER BY abs(c - med)) AS rd
    FROM med
  )
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       max(med) / 100.0 AS median_value,
       max(mad) / 100.0 AS mad_value,
       CAST(sum(CASE WHEN d * 100000 > {MAD_K} * mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       CAST(sum(CASE WHEN d * 100000 > {MAD_K} * mad THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS outlier_ppm
FROM mad
GROUP BY event_type
ORDER BY event_type
"""


def revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection on the daily purchase-revenue
    series via the CUSUM statistic — where did the level shift?

    The classic statistic S_t = prefix_t − t·(total/T) involves a
    rational mean; scaled by T it becomes the INTEGER
    ``ST_t = T·prefix_t − t·total`` (cents), so the argmax over t —
    the changepoint — is an exact integer comparison on both engines
    (earliest day wins ties).  Before/after means are pround-6 from
    exact cent sums.

    Scale: the windowed cumsum runs on the DAILY aggregate (T rows,
    one per day) — the corpus-sized work is the ordinary map-side
    combinable day rollup; a single-partition window over T≈365·years
    rows is trivially safe.  Detecting multiple changepoints = recurse
    on the two halves (binary segmentation), each round this same
    query shape on a date-bounded slice.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    daily = (
        e.select(F.to_date("ts").alias("day"), cents.alias("c"))
        .groupBy("day")
        .agg(F.sum("c").alias("d_cents"))
    )
    wc = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = daily.select(
        "day",
        "d_cents",
        F.sum("d_cents").over(wc).alias("prefix"),
        F.row_number().over(Window.orderBy("day")).alias("t"),
        F.sum("d_cents").over(wall).alias("total"),
        F.count(F.lit(1)).over(wall).alias("tt"),
    ).withColumn(
        "st",
        F.col("tt") * F.col("prefix") - F.col("t") * F.col("total"),
    )
    pick = Window.orderBy(F.desc(F.abs(F.col("st"))), F.asc("day"))
    return (
        cum.filter(F.col("t") < F.col("tt"))  # split must leave both sides non-empty
        .withColumn("r", F.row_number().over(pick))
        .filter(F.col("r") == 1)
        .select(
            F.col("day").alias("cp_day"),
            F.col("tt").cast("long").alias("n_days"),
            F.abs(F.col("st")).cast("long").alias("cusum_scaled"),
            pround(F.col("prefix") / F.col("t") / 100.0, 6).alias("mean_before"),
            pround(
                (F.col("total") - F.col("prefix"))
                / (F.col("tt") - F.col("t"))
                / 100.0,
                6,
            ).alias("mean_after"),
        )
    )


REVENUE_CHANGEPOINT_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS d_cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
),
cum AS (
  SELECT day, d_cents,
         sum(d_cents) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS prefix,
         row_number() OVER (ORDER BY day) AS t,
         sum(d_cents) OVER () AS total,
         count(*) OVER () AS tt
  FROM daily
),
scored AS (
  SELECT *, tt * prefix - t * total AS st FROM cum WHERE t < tt
)
SELECT day AS cp_day,
       CAST(tt AS BIGINT) AS n_days,
       CAST(abs(st) AS BIGINT) AS cusum_scaled,
       floor((prefix * 1.0 / t / 100.0) * 1000000.0 + 0.5) / 1000000.0
         AS mean_before,
       floor(((total - prefix) * 1.0 / (tt - t) / 100.0) * 1000000.0 + 0.5) / 1000000.0
         AS mean_after
FROM scored
ORDER BY abs(st) DESC, day ASC
LIMIT 1
"""


def revenue_theilsen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of daily purchase revenue: the MEDIAN of
    all pairwise day-to-day slopes — a single wild day shifts OLS
    (compare :func:`user_value_trend`'s regression aggregates) but
    moves the slope median by at most one rank.

    Every pairwise slope is one exact-integer division ``(c_j−c_i)/
    (t_j−t_i)`` — a correctly-rounded IEEE op both engines evaluate
    bit-identically — and the median is rank-selected (``row_number``
    ordered by slope with pair-id tie-breaks), so no float summation
    ever happens; the pick is engine-exact.

    Scale: the O(T²) pair join runs on the DAILY rollup (T rows — 365
    per year), never on raw events; the corpus-sized work is the
    ordinary day aggregation.  Same stance as
    :func:`revenue_changepoint`.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    daily = (
        e.select(F.to_date("ts").alias("day"), cents.alias("c"))
        .groupBy("day")
        .agg(F.sum("c").alias("c"))
        .select(
            F.row_number().over(Window.orderBy("day")).alias("t"), "c"
        )
    )
    a = daily.select(F.col("t").alias("t1"), F.col("c").alias("c1"))
    b = daily.select(F.col("t").alias("t2"), F.col("c").alias("c2"))
    pairs = a.join(b, F.col("t1") < F.col("t2")).select(
        "t1",
        "t2",
        ((F.col("c2") - F.col("c1")) / (F.col("t2") - F.col("t1"))).alias(
            "slope"
        ),
    )
    wp = Window.orderBy("slope", "t1", "t2")
    wall = Window.partitionBy()
    med = (
        pairs.withColumn("rn", F.row_number().over(wp))
        .withColumn("np", F.count(F.lit(1)).over(wall))
        .filter(F.col("rn") == F.ceil(F.col("np") / 2))
    )
    return med.select(
        F.col("np").cast("long").alias("n_pairs"),
        pround(F.col("slope") / 100.0, 6).alias("theil_sen_slope_per_day"),
    )


REVENUE_THEILSEN_SQL = """
WITH daily AS (
  SELECT row_number() OVER (ORDER BY day) AS t, c FROM (
    SELECT CAST(ts AS DATE) AS day,
           sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS c
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1
  )
),
pairs AS (
  SELECT a.t AS t1, b.t AS t2,
         (b.c - a.c) * 1.0 / (b.t - a.t) AS slope
  FROM daily a JOIN daily b ON a.t < b.t
),
ranked AS (
  SELECT slope,
         row_number() OVER (ORDER BY slope, t1, t2) AS rn,
         count(*) OVER () AS np
  FROM pairs
)
SELECT CAST(np AS BIGINT) AS n_pairs,
       floor((slope / 100.0) * 1000000.0 + 0.5) / 1000000.0
         AS theil_sen_slope_per_day
FROM ranked WHERE rn = ceil(np / 2.0)
"""


#: per-day decay factor 0.9^d in exact integer micros, precomputed in
#: Python and inlined as the SAME literal table in both engines (the
#: LSH-hyperplane precedent): no cross-libm pow() in either plan, so a
#: fractional-power 1-ulp divergence can never flip a floor
DECAY_MICRO = [int(0.9**d * 1_000_000 + 0.5) for d in range(31)]
DECAY_TOP_N = 50


def user_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement score — the feature-store freshness
    primitive: each event contributes ``cents · 0.9^age_days`` toward
    its user's score, evaluated at the corpus max date, so a purchase
    yesterday outweighs one from three weeks ago.  Report: the top
    ``DECAY_TOP_N`` users by decayed value with their raw totals.

    Decay factors come from an inlined integer-micro lookup table
    (element_at on an array literal — a broadcast-free dimension of 31
    rows folded into the expression), so the score is a pure integer
    sum: exact, order-free, mergeable like any partial aggregate.
    Top-N is TakeOrderedAndProject (per-partition heaps), never a
    global sort.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        F.to_date("ts").alias("day"),
    )
    max_day = base.agg(F.max("day").alias("max_day"))
    factors = F.array(*[F.lit(m) for m in DECAY_MICRO])
    age = F.least(
        F.datediff(F.col("max_day"), F.col("day")),
        F.lit(len(DECAY_MICRO) - 1),
    )
    scored = base.crossJoin(F.broadcast(max_day)).select(
        "user_id",
        "cents",
        (F.col("cents") * F.element_at(factors, age + 1)).alias(
            "decayed_cmicro"
        ),
    )
    return (
        scored.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.sum("cents").cast("long").alias("raw_cents"),
            F.sum("decayed_cmicro").cast("long").alias("decayed_cmicro"),
        )
        .orderBy(F.desc("decayed_cmicro"), F.asc("user_id"))
        .limit(DECAY_TOP_N)
    )


_DECAY_LIST = "[" + ", ".join(str(m) for m in DECAY_MICRO) + "]"

DECAYED_ENGAGEMENT_SQL = f"""
WITH base AS (
  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         CAST(ts AS DATE) AS day
  FROM events WHERE event_type = 'purchase'
),
m AS (SELECT max(day) AS max_day FROM base),
scored AS (
  SELECT user_id, cents,
         cents * list_extract({_DECAY_LIST},
                              least(date_diff('day', day, max_day),
                                    {len(DECAY_MICRO) - 1}) + 1)
           AS decayed_cmicro
  FROM base, m
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(cents) AS BIGINT) AS raw_cents,
       CAST(sum(decayed_cmicro) AS BIGINT) AS decayed_cmicro
FROM scored
GROUP BY user_id
ORDER BY decayed_cmicro DESC, user_id ASC
LIMIT {DECAY_TOP_N}
"""


def events_hour_of_week_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week traffic profile: events bucketed by (ISO weekday,
    hour) with each cell's ppm share of total — the seasonality map
    capacity planning and anomaly baselines read.

    The ISO weekday is derived from epoch-day arithmetic
    (``(epoch_day + 3) % 7 + 1`` — 1970-01-01 was a Thursday), not an
    engine ``dayofweek``, because Spark (1=Sunday) and DuckDB
    (0=Sunday) disagree on numbering; integer arithmetic on the UTC
    epoch is convention-free and exact in both.
    """
    e = load_table(spark, sf_dir, "events")
    cells = e.select(
        F.expr("unix_micros(ts) DIV 86400000000 + 3").alias("eday3"),
        F.hour("ts").cast("int").alias("hour"),
    ).select(
        (F.pmod("eday3", F.lit(7)) + 1).cast("int").alias("dow_iso"), "hour"
    )
    per = cells.groupBy("dow_iso", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    tot = per.agg(F.sum("n_events").alias("total"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "dow_iso",
            "hour",
            "n_events",
            F.expr(
                "CAST(CAST(n_events AS DECIMAL(38,0)) * 1000000"
                " DIV total AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy("dow_iso", "hour")
    )


HOUR_OF_WEEK_SQL = """
WITH cells AS (
  SELECT CAST((epoch_us(ts) // 86400000000 + 3) % 7 + 1 AS INTEGER) AS dow_iso,
         CAST(extract(hour FROM ts) AS INTEGER) AS hour
  FROM events
),
per AS (
  SELECT dow_iso, hour, CAST(count(*) AS BIGINT) AS n_events
  FROM cells GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS total FROM per)
SELECT dow_iso, hour, n_events,
       CAST(CAST(n_events AS HUGEINT) * 1000000 // total AS BIGINT)
         AS share_ppm
FROM per, tot
ORDER BY dow_iso, hour
"""


#: shared Holt recursion SQL — identical text on both engines except
#: the integer-division spelling, so the smoothing arithmetic can never
#: silently diverge between the query and its oracle
def _holt_sql(div: str, src: str = "holt_daily") -> str:
    return f"""
WITH RECURSIVE d AS (
  SELECT day, d_cents, row_number() OVER (ORDER BY day) AS rn
  FROM {src}
),
h(rn, day, d_cents, lvl, trd, fit) AS (
  SELECT rn, day, d_cents, d_cents,
         coalesce((SELECT d2.d_cents FROM d d2 WHERE d2.rn = 2), d_cents)
           - d_cents,
         CAST(NULL AS BIGINT)
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.rn, d.day, d.d_cents,
         (d.d_cents + h.lvl + h.trd) {div} 2,
         ((d.d_cents + h.lvl + h.trd) {div} 2 - h.lvl + h.trd) {div} 2,
         h.lvl + h.trd
  FROM h JOIN d ON d.rn = h.rn + 1
)
SELECT day AS sale_day, d_cents, fit AS fitted_cents,
       lvl AS level_cents, trd AS trend_cents,
       abs(d_cents - fit) AS abs_err_cents
FROM h ORDER BY sale_day
"""


def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (α = β = ½) of daily purchase
    revenue — level + trend one-step-ahead fits, the forecasting
    baseline one notch above :func:`seasonal_forecast_error`'s
    seasonal-naive.

    Like EWMA the recursion ``l_t = ½(x_t + l_{t−1} + b_{t−1}),
    b_t = ½(l_t − l_{t−1} + b_{t−1})`` cannot be a window frame — and
    its state is the DAY rollup (date-domain bounded, never row count),
    so like the PCA power iteration (``operators/clustering.py``) the
    whole recurrence runs partition-locally in ONE exact-integer
    ``mapInPandas`` kernel over the coalesced rollup.  The earlier
    ``WITH RECURSIVE`` Spark plan scheduled one stage per day (~5–6 s
    of fixed constant at any data size); the kernel does the identical
    arithmetic — α = β = ½ halving with division TRUNCATING TOWARD
    ZERO, matching Spark ``DIV`` / DuckDB ``//`` even for negative
    trends (Python ``//`` floors, so the kernel wraps it sign-outside-
    abs) — and stays bit-identical to the recursive-CTE oracle.  Init:
    l₁ = x₁, b₁ = x₂ − x₁ (the classic two-point start; 0 for a 1-day
    series).  The corpus-sized work remains the ordinary
    map-combinable day rollup feeding the kernel.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    daily = (
        e.select(F.to_date("ts").alias("day"), cents.alias("c"))
        .groupBy("day")
        .agg(F.sum("c").alias("d_cents"))
    )

    def holt_kernel(batches):
        import pandas as pd

        rows = [p for p in batches if len(p)]
        if not rows:
            return  # empty log ⇒ empty series, like the empty seed
        pdf = pd.concat(rows).sort_values("day")
        days = list(pdf["day"])
        x = [int(v) for v in pdf["d_cents"]]

        def tdiv2(a):  # trunc-toward-zero halving == Spark DIV 2
            return -((-a) // 2) if a < 0 else a // 2

        lvl = x[0]
        trd = (x[1] - x[0]) if len(x) > 1 else 0
        fits, lvls, trds = [None], [lvl], [trd]
        for t in range(1, len(x)):
            fit = lvl + trd
            lvl_new = tdiv2(x[t] + lvl + trd)
            trd = tdiv2(lvl_new - lvl + trd)
            lvl = lvl_new
            fits.append(fit)
            lvls.append(lvl)
            trds.append(trd)
        yield pd.DataFrame(
            {
                "sale_day": days,
                "d_cents": pd.Series(x, dtype="int64"),
                "fitted_cents": pd.array(fits, dtype="Int64"),
                "level_cents": pd.Series(lvls, dtype="int64"),
                "trend_cents": pd.Series(trds, dtype="int64"),
                "abs_err_cents": pd.array(
                    [
                        None if f is None else abs(x[i] - f)
                        for i, f in enumerate(fits)
                    ],
                    dtype="Int64",
                ),
            }
        )

    return (
        daily.coalesce(1)
        .mapInPandas(
            holt_kernel,
            "sale_day date, d_cents long, fitted_cents long,"
            " level_cents long, trend_cents long, abs_err_cents long",
        )
        .orderBy("sale_day")
    )


def cusum_revenue_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM control chart over daily purchase revenue — the
    classic sequential drift detector (Page's test) a finance/ops team
    keeps on a revenue stream: ``S⁺_t = max(0, S⁺_{t−1} + x_t − μ − k)``
    accumulates sustained upward drift, ``S⁻`` the mirror image, and a
    day alarms when either side exceeds the decision interval ``h``.
    Slack ``k = μ DIV 20`` (5 % of the mean day) absorbs noise;
    ``h = μ`` (one full mean day of accumulated drift) fires the pager.

    Like Holt above, the recurrence's state is the DAY rollup — date-
    domain bounded — so it runs partition-locally in one exact-integer
    ``mapInPandas`` kernel over the coalesced rollup (all values
    non-negative, so Python ``//`` == Spark ``DIV`` == DuckDB ``//``),
    bit-identical to the recursive-CTE oracle.  The corpus-sized work
    is the ordinary map-combinable day rollup feeding it.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    daily = (
        e.select(F.to_date("ts").alias("day"), cents.alias("c"))
        .groupBy("day")
        .agg(F.sum("c").alias("d_cents"))
    )
    return cusum_fold(daily)


def cusum_fold(daily: DataFrame) -> DataFrame:
    """The CUSUM recurrence over a ``(day, d_cents)`` relation as a
    partition-local exact-integer kernel — shared by the batch query
    above and the streaming twin (``streaming.structured``), whose
    incremental part is the day rollup and whose detector is this same
    fold over the folded sink.  The kernel closure is defined INSIDE
    this function so it pickles by value (driver-session Python workers
    cannot import this package from a foreign cwd)."""

    def cusum_kernel(batches):
        import pandas as pd

        rows = [p for p in batches if len(p)]
        if not rows:
            return  # empty log ⇒ empty chart
        pdf = pd.concat(rows).sort_values("day")
        days = list(pdf["day"])
        x = [int(v) for v in pdf["d_cents"]]

        def tdiv(a, b):  # trunc-toward-zero == Spark DIV == DuckDB //
            q = abs(a) // b
            return q if a >= 0 else -q

        # Python // floors; the oracle's BIGINT // truncates — sign-
        # outside-abs keeps the two identical even if daily revenue ever
        # goes negative (e.g. refunds added to fixtures later).
        mu = tdiv(sum(x), len(x))
        k = tdiv(mu, 20)
        sp = sn = 0
        pos, neg, alarm = [], [], []
        for v in x:
            sp = max(0, sp + v - mu - k)
            sn = max(0, sn + mu - k - v)
            pos.append(sp)
            neg.append(sn)
            alarm.append(1 if (sp > mu or sn > mu) else 0)
        yield pd.DataFrame(
            {
                "sale_day": days,
                "d_cents": pd.Series(x, dtype="int64"),
                "cusum_pos": pd.Series(pos, dtype="int64"),
                "cusum_neg": pd.Series(neg, dtype="int64"),
                "alarm": pd.Series(alarm, dtype="int32"),
            }
        )

    return (
        daily.coalesce(1)
        .mapInPandas(
            cusum_kernel,
            "sale_day date, d_cents long, cusum_pos long,"
            " cusum_neg long, alarm int",
        )
        .orderBy("sale_day")
    )


CUSUM_SQL = """
WITH RECURSIVE daily AS (
  SELECT ts::DATE AS day,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS x
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
p AS (
  SELECT CAST(sum(x) // count(*) AS BIGINT) AS mu FROM daily
),
d AS (
  SELECT day, x, row_number() OVER (ORDER BY day) AS rn FROM daily
),
c(rn, day, x, sp, sn) AS (
  SELECT rn, day, x,
         greatest(x - mu - mu // 20, 0),
         greatest(mu - mu // 20 - x, 0)
  FROM d, p WHERE rn = 1
  UNION ALL
  SELECT d.rn, d.day, d.x,
         greatest(c.sp + d.x - p.mu - p.mu // 20, 0),
         greatest(c.sn + p.mu - p.mu // 20 - d.x, 0)
  FROM c JOIN d ON d.rn = c.rn + 1, p
)
SELECT day AS sale_day, x AS d_cents,
       CAST(sp AS BIGINT) AS cusum_pos, CAST(sn AS BIGINT) AS cusum_neg,
       CAST(CASE WHEN sp > mu OR sn > mu THEN 1 ELSE 0 END AS INTEGER)
         AS alarm
FROM c, p ORDER BY sale_day
"""


HOLT_LINEAR_SQL = f"""
WITH RECURSIVE holt_daily AS (
  SELECT ts::DATE AS day,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS d_cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
{_holt_sql('//').lstrip().replace('WITH RECURSIVE d AS', ', d AS', 1)}
"""


#: cross-correlation lead-lag window (days)
CCF_MAX_LAG = 7


def ccf_rev_clicks_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation between daily click volume and daily
    purchase revenue at lags 0..7 days — "do clicks today predict
    revenue ℓ days out?", the panel that decides an attribution window
    before anyone fits a model.  Complements the lag-1
    :func:`revenue_autocorrelation` (self-similarity) with the
    BETWEEN-series version at multiple horizons.

    For each lag ℓ: pairs (clk at day d, rev at day d+ℓ) over days
    where both sides exist.  Moments are exact DECIMAL(38,0) integer
    sums per lag — order-independent, so the shuffle layout cannot
    change them — and only the final Pearson ratio runs in doubles
    (the same fixed correctly-rounded IEEE sequence as
    ``revenue_autocorrelation``, rounded identically on both engines).

    Scale shape: one map-combinable shuffle from the log to the daily
    rollup; the lag expansion is |days|×8 rows joined back to the
    |days|-row rollup — date-domain bounded, never row bounded.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            F.expr("unix_micros(ts) DIV 86400000000").alias("eday"),
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            )
            .otherwise(0)
            .alias("cents"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("c1"),
        )
        .groupBy("eday")
        .agg(
            F.sum("cents").cast("long").alias("rev"),
            F.sum("c1").cast("long").alias("clk"),
        )
    )
    lags = spark.range(0, CCF_MAX_LAG + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    x = daily.select("eday", F.col("clk").cast("decimal(38,0)").alias("x"))
    y = daily.select(
        F.col("eday").alias("eday_y"),
        F.col("rev").cast("decimal(38,0)").alias("y"),
    )
    pairs = (
        x.crossJoin(F.broadcast(lags))
        .withColumn("eday_y", F.col("eday") + F.col("lag"))
        .join(y, "eday_y")
    )
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)")).alias("sxy"),
    )
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    ccf = (n * sxy - sx * sy) / F.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return m.select(
        "lag", "n_pairs", pround(ccf, 6).alias("ccf")
    ).orderBy("lag")


CCF_SQL = f"""
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS eday,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS clk
  FROM events GROUP BY 1
),
lags AS (SELECT unnest(generate_series(0, {CCF_MAX_LAG})) AS lag),
pairs AS (
  SELECT l.lag, a.clk::HUGEINT AS x, b.rev::HUGEINT AS y
  FROM daily a
  CROSS JOIN lags l
  JOIN daily b ON b.eday = a.eday + l.lag
),
m AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n_pairs,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
  floor(((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
        * 1000000.0 + 0.5) / 1000000.0 AS ccf
FROM m
ORDER BY lag
"""


def mann_kendall_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test on the daily total purchase-revenue
    series — the nonparametric "is revenue actually trending?" gate
    run before acting on the :func:`revenue_theilsen_trend` slope (the
    two are the standard pair: Theil–Sen estimates the slope,
    Mann–Kendall decides whether it is distinguishable from noise).

    S = Σ_{{i<j}} sign(rev_j − rev_i) over day-ordered pairs; the
    tie-corrected variance is kept INTEGER by scaling by 18:
    var18 = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) over tied-value groups.
    The report is the signed squared continuity-corrected z in
    micro-units — sign(S)·(|S|−1)²·18·1e6 DIV var18 — one truncating
    DECIMAL(38) division, bit-identical cross-engine, no sqrt.

    Scale shape: the pair count grows with days², never with event
    rows — the self-join runs on the broadcast daily rollup and the
    tie groups on a |days|-sized groupBy.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            F.expr("unix_micros(ts) DIV 86400000000").alias("eday"),
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100 + 0.5).cast("long"),
            )
            .otherwise(0)
            .alias("cents"),
        )
        .groupBy("eday")
        .agg(F.sum("cents").cast("long").alias("rev"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    s_agg = (
        a.join(F.broadcast(b), F.col("a.eday") < F.col("b.eday"))
        .agg(
            F.sum(
                F.when(F.col("b.rev") > F.col("a.rev"), 1)
                .when(F.col("b.rev") < F.col("a.rev"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s_stat"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
        )
    )
    ties = (
        daily.groupBy("rev")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .agg(
            F.sum("t").cast("long").alias("n_days"),
            F.sum(
                F.expr("CAST(t AS DECIMAL(38,0)) * (t - 1) * (2 * t + 5)")
            ).alias("tie18"),
        )
    )
    out = s_agg.crossJoin(F.broadcast(ties))
    return out.select(
        "n_days",
        "n_pairs",
        "s_stat",
        F.expr(
            "CAST(CAST(n_days AS DECIMAL(38,0)) * (n_days - 1)"
            " * (2 * n_days + 5) - tie18 AS BIGINT)"
        ).alias("var18"),
        F.expr(
            "CAST(CASE WHEN s_stat < 0 THEN -1 WHEN s_stat > 0 THEN 1"
            " ELSE 0 END"
            " * (CAST(abs(s_stat) - 1 AS DECIMAL(38,0))"
            "    * (abs(s_stat) - 1) * 18 * 1000000"
            "    DIV (CAST(n_days AS DECIMAL(38,0)) * (n_days - 1)"
            "         * (2 * n_days + 5) - tie18)) AS BIGINT)"
        ).alias("z_sq_signed_micro"),
    )


MANN_KENDALL_SQL = """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS eday,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev
  FROM events GROUP BY 1
),
s_agg AS (
  SELECT CAST(sum(CASE WHEN b.rev > a.rev THEN 1
                       WHEN b.rev < a.rev THEN -1 ELSE 0 END)
              AS BIGINT) AS s_stat,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM daily a JOIN daily b ON a.eday < b.eday
),
ties AS (
  SELECT CAST(sum(t) AS BIGINT) AS n_days,
         sum(t::HUGEINT * (t - 1) * (2 * t + 5)) AS tie18
  FROM (SELECT count(*) AS t FROM daily GROUP BY rev)
)
SELECT n_days, n_pairs, s_stat,
       CAST(n_days::HUGEINT * (n_days - 1) * (2 * n_days + 5) - tie18
            AS BIGINT) AS var18,
       CAST(CASE WHEN s_stat < 0 THEN -1 WHEN s_stat > 0 THEN 1
                 ELSE 0 END
            * ((abs(s_stat) - 1)::HUGEINT * (abs(s_stat) - 1)
               * 18 * 1000000
               // (n_days::HUGEINT * (n_days - 1) * (2 * n_days + 5)
                   - tie18)) AS BIGINT) AS z_sq_signed_micro
FROM s_agg, ties
"""


def weekday_seasonal_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Additive weekday decomposition of daily purchase revenue —
    ``revenue(d) = grand mean + weekday effect + residual`` — the panel
    that turns :func:`events_hour_of_week_seasonality`'s count profile
    into a VALUE model, and the de-seasonalization step before any
    trend/changepoint read on weekly-cyclic business data.

    All in exact integer cents: grand mean and per-weekday means are
    single truncating divisions over exact sums, the effect is their
    difference, and the worst residual day per weekday (largest
    |revenue − weekday mean|, ties to the earliest day) is an exact
    integer argmax.  Shape: one map-combinable shuffle from the log to
    the per-day rollup (date-domain bounded); the weekday rollup and
    broadcast grand mean are 7-and-1-row relations.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    daily = (
        e.select(
            F.expr("unix_micros(ts) DIV 86400000000").alias("eday"),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("eday")
        .agg(F.sum("cents").alias("d_cents"))
        .select(
            "eday",
            "d_cents",
            # ISO weekday from the epoch-day (1970-01-01 = Thursday=4)
            F.expr("CAST((eday + 3) % 7 + 1 AS INT)").alias("dow_iso"),
        )
    )
    gm = daily.agg(
        F.expr("CAST(sum(d_cents) DIV count(*) AS BIGINT)").alias("gm_cents")
    )
    per_dow = daily.groupBy("dow_iso").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.expr("CAST(sum(d_cents) DIV count(*) AS BIGINT)").alias(
            "mean_cents"
        ),
    )
    resid = (
        daily.join(F.broadcast(per_dow), "dow_iso")
        .select(
            "dow_iso",
            "eday",
            F.abs(F.col("d_cents") - F.col("mean_cents")).alias("abs_resid"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("dow_iso").orderBy(
                    F.desc("abs_resid"), F.asc("eday")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "dow_iso",
            F.col("abs_resid").alias("max_abs_resid_cents"),
            F.col("eday").alias("worst_eday"),
        )
    )
    return (
        per_dow.join(resid, "dow_iso")
        .crossJoin(F.broadcast(gm))
        .select(
            "dow_iso",
            "n_days",
            "mean_cents",
            (F.col("mean_cents") - F.col("gm_cents"))
            .cast("long")
            .alias("effect_cents"),
            "max_abs_resid_cents",
            "worst_eday",
        )
        .orderBy("dow_iso")
    )


WEEKDAY_DECOMP_SQL = """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS eday,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS d_cents
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
),
tagged AS (
  SELECT eday, d_cents, CAST((eday + 3) % 7 + 1 AS INTEGER) AS dow_iso
  FROM daily
),
gm AS (SELECT CAST(sum(d_cents) // count(*) AS BIGINT) AS gm_cents
       FROM tagged),
per_dow AS (
  SELECT dow_iso, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(d_cents) // count(*) AS BIGINT) AS mean_cents
  FROM tagged GROUP BY 1
),
resid AS (
  SELECT dow_iso, abs_resid AS max_abs_resid_cents, eday AS worst_eday
  FROM (
    SELECT t.dow_iso, t.eday,
           CAST(abs(t.d_cents - p.mean_cents) AS BIGINT) AS abs_resid,
           row_number() OVER (PARTITION BY t.dow_iso
                              ORDER BY abs(t.d_cents - p.mean_cents) DESC,
                                       t.eday ASC) AS rn
    FROM tagged t JOIN per_dow p USING (dow_iso)
  ) WHERE rn = 1
)
SELECT p.dow_iso, p.n_days, p.mean_cents,
       CAST(p.mean_cents - g.gm_cents AS BIGINT) AS effect_cents,
       r.max_abs_resid_cents, r.worst_eday
FROM per_dow p JOIN resid r USING (dow_iso) CROSS JOIN gm g
ORDER BY p.dow_iso
"""


#: Holt–Winters season length (weekly) and init span
HW_SEASON = 7


def holt_winters_weekly_forecast(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Holt–Winters ADDITIVE triple exponential smoothing (α = β = γ =
    ½, weekly season m = 7) of daily purchase revenue — level + trend
    + per-weekday-slot seasonal state, one-step-ahead fits from day 8
    on.  Completes the forecasting ladder: seasonal-naive
    (:func:`seasonal_forecast_error`) → level+trend
    (:func:`holt_linear_forecast`) → level+trend+season (this).

    Init is the classic first-season scheme: l₇ = floor-mean of days
    1..7, b₇ = 0, s_p = x_p − l₇ for slots p = 1..7; fits start at day
    8 (a series shorter than 8 days yields an empty report rather than
    an undefined one).  The recursion per day t with slot p = ((t−1)
    mod 7) + 1:  fit = l + b + s_p;  l' = (x_t − s_p + l + b) ÷ 2;
    b' = (l' − l + b) ÷ 2;  s_p' = (x_t − l' + s_p) ÷ 2 — every ÷
    truncating toward zero (Spark ``DIV`` == DuckDB ``//`` == the
    kernel's sign-outside-abs halving), so the whole state trajectory
    is exact integers and bit-identical cross-engine.

    Like the Holt/KM/Markov/CUSUM family the recursion's state is the
    DAY rollup — date-domain bounded, never row count — so it runs
    partition-locally in one exact-integer ``mapInPandas`` kernel over
    the coalesced rollup; the corpus-sized work stays in the ordinary
    map-combinable day aggregate feeding it.  The oracle carries the 7
    seasonal slots as FIXED recursion columns indexed by t mod 7 (no
    ring shifting), the mechanical unrolled-state recursive-CTE twin.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    daily = (
        e.select(F.to_date("ts").alias("day"), cents.alias("c"))
        .groupBy("day")
        .agg(F.sum("c").alias("d_cents"))
    )

    def hw_kernel(batches):
        import pandas as pd

        rows = [p for p in batches if len(p)]
        if not rows:
            return
        pdf = pd.concat(rows).sort_values("day")
        days = list(pdf["day"])
        x = [int(v) for v in pdf["d_cents"]]
        m = 7
        if len(x) <= m:
            return  # fits start at day m+1; shorter series ⇒ empty

        def tdiv2(a):  # trunc-toward-zero halving == Spark DIV 2
            return -((-a) // 2) if a < 0 else a // 2

        s7 = sum(x[:m])
        # trunc-toward-zero to match the oracle's // regardless of the
        # first week's sign (a negative-revenue first week would make
        # Python floor division diverge bit-for-bit)
        lvl = -((-s7) // m) if s7 < 0 else s7 // m
        trd = 0
        s = [x[p] - lvl for p in range(m)]  # slot p = t-1 mod 7
        out = []
        for t in range(m, len(x)):
            p = t % m
            fit = lvl + trd + s[p]
            lvl_new = tdiv2(x[t] - s[p] + lvl + trd)
            trd = tdiv2(lvl_new - lvl + trd)
            s[p] = tdiv2(x[t] - lvl_new + s[p])
            lvl = lvl_new
            out.append(
                (days[t], x[t], fit, lvl, trd, s[p], abs(x[t] - fit))
            )
        yield pd.DataFrame(
            out,
            columns=[
                "sale_day",
                "d_cents",
                "fitted_cents",
                "level_cents",
                "trend_cents",
                "seasonal_cents",
                "abs_err_cents",
            ],
        )

    return (
        daily.coalesce(1)
        .mapInPandas(
            hw_kernel,
            "sale_day date, d_cents long, fitted_cents long,"
            " level_cents long, trend_cents long, seasonal_cents long,"
            " abs_err_cents long",
        )
        .orderBy("sale_day")
    )


# the recursive step cannot reference its own output aliases, so the
# shared subterms — S (the current slot's seasonal, a 7-way CASE over
# the fixed state columns) and L (the new level, which contains S) —
# are inlined into every expression that needs them:
_HW_S = (
    "CASE "
    + " ".join(
        f"WHEN (d.rn - 1) % {HW_SEASON} = {p} THEN h.s{p}"
        for p in range(HW_SEASON)
    )
    + " END"
)
_HW_L = f"((d.d_cents - {_HW_S} + h.lvl + h.trd) // 2)"


def _hw_seasonal_col(p: int) -> str:
    """Seasonal slot ``p`` after one step: updated when this day lands
    on slot ``p`` (where S == h.s{p}), carried otherwise."""
    return (
        f"CASE WHEN (d.rn - 1) % {HW_SEASON} = {p} THEN "
        f"(d.d_cents - {_HW_L} + h.s{p}) // 2 "
        f"ELSE h.s{p} END AS s{p}"
    )


HOLT_WINTERS_SQL = f"""
WITH RECURSIVE hw_daily AS (
  SELECT ts::DATE AS day,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS d_cents
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
d AS (
  SELECT day, d_cents, row_number() OVER (ORDER BY day) AS rn
  FROM hw_daily
),
init AS (
  SELECT CAST(sum(CASE WHEN rn <= {HW_SEASON} THEN d_cents END)
              // {HW_SEASON} AS BIGINT) AS a
  FROM d WHERE (SELECT max(rn) FROM d) > {HW_SEASON}
),
s0 AS (
  SELECT (SELECT a FROM init) AS lvl, CAST(0 AS BIGINT) AS trd,
         {", ".join(
             f"max(CASE WHEN rn = {p + 1} THEN d_cents END)"
             f" - (SELECT a FROM init) AS s{p}"
             for p in range(HW_SEASON)
         )}
  FROM d WHERE (SELECT max(rn) FROM d) > {HW_SEASON}
),
h(rn, day, d_cents, fit, lvl, trd,
  {", ".join(f"s{p}" for p in range(HW_SEASON))}, s_used) AS (
  SELECT CAST({HW_SEASON} AS BIGINT), CAST(NULL AS DATE),
         CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         lvl, trd, {", ".join(f"s{p}" for p in range(HW_SEASON))},
         CAST(NULL AS BIGINT)
  FROM s0
  UNION ALL
  SELECT d.rn, d.day, d.d_cents,
         h.lvl + h.trd + {_HW_S} AS fit,
         {_HW_L} AS lvl,
         ({_HW_L} - h.lvl + h.trd) // 2 AS trd,
         {", ".join(_hw_seasonal_col(p) for p in range(HW_SEASON))},
         (d.d_cents - {_HW_L} + {_HW_S}) // 2 AS s_used
  FROM h JOIN d ON d.rn = h.rn + 1
)
SELECT day AS sale_day, d_cents, fit AS fitted_cents,
       lvl AS level_cents, trd AS trend_cents,
       s_used AS seasonal_cents,
       abs(d_cents - fit) AS abs_err_cents
FROM h WHERE rn > {HW_SEASON}
ORDER BY sale_day
"""


SPARK_QUERIES = {
    "weekday_seasonal_decomposition": weekday_seasonal_decomposition,
    "user_decayed_engagement": user_decayed_engagement,
    "events_hour_of_week_seasonality": events_hour_of_week_seasonality,
    "holt_linear_forecast": holt_linear_forecast,
    "cusum_revenue_drift": cusum_revenue_drift,
    "revenue_autocorrelation": revenue_autocorrelation,
    "user_value_trend": user_value_trend,
    "user_hourly_ffill": user_hourly_ffill,
    "user_value_ewma": user_value_ewma,
    "events_zscore_outliers": events_zscore_outliers,
    "events_mad_outliers": events_mad_outliers,
    "revenue_changepoint": revenue_changepoint,
    "revenue_theilsen_trend": revenue_theilsen_trend,
    "scd2_value_band_history": scd2_value_band_history,
    "user_value_twap": user_value_twap,
    "events_value_psi": events_value_psi,
    "seasonal_forecast_error": seasonal_forecast_error,
    "ccf_rev_clicks_lags": ccf_rev_clicks_lags,
    "mann_kendall_revenue_trend": mann_kendall_revenue_trend,
    "holt_winters_weekly_forecast": holt_winters_weekly_forecast,
}

USER_EWMA_SQL = f"""
WITH RECURSIVE p AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, event_id, rn, value::DOUBLE AS ewma_value FROM p WHERE rn = 1
  UNION ALL
  SELECT p.user_id, p.event_id, p.rn,
         {1.0 - EWMA_ALPHA}::DOUBLE * r.ewma_value + {EWMA_ALPHA}::DOUBLE * p.value
  FROM r JOIN p ON p.user_id = r.user_id AND p.rn = r.rn + 1
)
SELECT user_id, event_id, ewma_value FROM r ORDER BY user_id, event_id
"""

ORACLE_SQL = {
    "weekday_seasonal_decomposition": WEEKDAY_DECOMP_SQL,
    "user_decayed_engagement": DECAYED_ENGAGEMENT_SQL,
    "events_hour_of_week_seasonality": HOUR_OF_WEEK_SQL,
    "holt_linear_forecast": HOLT_LINEAR_SQL,
    "cusum_revenue_drift": CUSUM_SQL,
    "user_value_trend": USER_TREND_SQL,
    "user_hourly_ffill": USER_FFILL_SQL,
    "user_value_ewma": USER_EWMA_SQL,
    "events_zscore_outliers": EVENTS_ZSCORE_SQL,
    "events_mad_outliers": EVENTS_MAD_SQL,
    "revenue_changepoint": REVENUE_CHANGEPOINT_SQL,
    "revenue_theilsen_trend": REVENUE_THEILSEN_SQL,
    "scd2_value_band_history": SCD2_HISTORY_SQL,
    "user_value_twap": USER_TWAP_SQL,
    "events_value_psi": EVENTS_PSI_SQL,
    "seasonal_forecast_error": SEASONAL_FC_SQL,
    "revenue_autocorrelation": REVENUE_ACF_SQL,
    "ccf_rev_clicks_lags": CCF_SQL,
    "mann_kendall_revenue_trend": MANN_KENDALL_SQL,
    "holt_winters_weekly_forecast": HOLT_WINTERS_SQL,
}
