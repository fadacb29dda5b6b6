"""Event-time windowing over the ``events`` table (SURVEY.md §2.5 notes
these as ABSENT in the reference; they're core engine surface here).

Batch forms of the streaming operators — same ``window()`` /
``session_window()`` expressions Structured Streaming uses, so the
logic is write-once: :mod:`projet_meteo_etl_spark.streaming.structured`
wraps the identical transformations around ``readStream``.

Scale: tumbling/sliding windows shuffle once on (window, key); session
windows shuffle on user_id.  Skewed users are the classic hazard —
AQE skew-join handling plus salting are the mitigations (the grouping
key cardinality here is user_id × window, which spreads well).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.functions.portable import pround


def events_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows: count + value sum per event_type."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact integer cents before the sum: double partial-sum
            # merge order varies with state/shuffle partitioning
            (
                F.sum(F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)"))
                / F.lit(100.0)
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


EVENTS_TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


def events_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): every event lands in
    two windows; Spark's ``window()`` explodes them at scan time."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    # value is exact-cent data: averaging in integer cents makes the sum
    # order-independent (long addition is associative), so tiny windows
    # whose float avg lands exactly on a rounding boundary can't flip
    # between engines with different summation orders
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            pround(
                F.sum(cents) / F.lit(100.0) / F.count(F.lit(1)), 4
            ).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "avg_value")
        .orderBy("window_start")
    )


EVENTS_SLIDING_SQL = """
WITH expanded AS (
  -- each event belongs to the two 1-hour windows sliding by 30 min:
  -- the one starting at its 30-min floor and the one 30 min earlier
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, value FROM events
  WHERE event_type = 'purchase'
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', value
  FROM events WHERE event_type = 'purchase'
)
SELECT window_start, count(*) AS n_events,
       floor((sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 / count(*))
             * 10000.0 + 0.5) / 10000.0 AS avg_value
FROM expanded
GROUP BY window_start
ORDER BY window_start
"""


def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows: 30-min inactivity gap per user —
    ``session_window()`` is the same construct Structured Streaming's
    stateful session aggregation uses."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)"))
                / F.lit(100.0)
            ).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
        .orderBy("user_id", "session_start")
    )


# session reconstruction in ANSI SQL: gap-flag → cumulative session id
EVENTS_SESSION_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 30 * 60 * 1000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
numbered AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, min(ts) AS session_start,
       count(*) AS n_events,
       sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS session_value
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull ``k`` out of the JSON-ish
    ``props`` string (JVM-side regex — the pattern works identically
    in any engine, unlike engine-specific JSON path dialects)."""
    e = load_table(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_PROPS_SQL = r"""
SELECT event_type,
       count(*) AS n,
       floor((avg(TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT))) * 10000.0 + 0.5) / 10000.0 AS avg_k,
       max(TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_late_data_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-style late-data accounting (batch form): mark events
    arriving more than 10 min behind the running per-user max ts —
    the batch analogue of ``withWatermark`` drop accounting."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    high_water = F.max(F.unix_micros("ts")).over(w)
    lateness = (high_water - F.unix_micros("ts")) / 1_000_000.0
    flagged = e.select(
        "user_id",
        "event_id",
        F.when(lateness > 600.0, 1).otherwise(0).alias("is_late"),
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("is_late").alias("n_late"),
        )
        .orderBy("user_id")
    )


EVENTS_LATE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id,
         CASE WHEN (max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    - epoch_us(ts)) / 1000000.0 > 600.0
              THEN 1 ELSE 0 END AS is_late
  FROM events
)
SELECT user_id, count(*) AS n_events, CAST(sum(is_late) AS BIGINT) AS n_late
FROM flagged GROUP BY user_id ORDER BY user_id
"""


def events_json_typed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing with ``from_json`` + an explicit schema (the
    production path for semi-structured columns — the regex variant in
    :func:`events_json_props` is the dialect-portable fallback).
    Integer sums keep the oracle exact."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.from_json("props", "k BIGINT").alias("p"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("p.k").alias("n_with_k"),
            F.sum("p.k").alias("sum_k"),
            F.min("p.k").alias("min_k"),
            F.max("p.k").alias("max_k"),
        )
        .orderBy("event_type")
    )


#: ``from_json('k BIGINT')`` accepts ONLY integral JSON NUMBER tokens
#: that fit int64 (probed: strings "12"/"12.5", decimals 12.5/2.0,
#: scientific 1e3, booleans, arrays, and the uint64 2^63 all parse to
#: NULL) — so the oracle guards on DuckDB's ``json_type`` being an
#: integer number class; TRY_CAST then nulls the >int64 UBIGINT edge.
EVENTS_JSON_TYPED_SQL = """
WITH k AS (
  SELECT event_type,
         CASE WHEN json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
              THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS k
  FROM events
)
SELECT event_type,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k
FROM k
GROUP BY event_type
ORDER BY event_type
"""


#: trailing-window width for WAU (7 calendar days including the day)
WAU_DAYS = 7


def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics engagement rollup: daily active users, 7-day
    trailing weekly active users, and the DAU/WAU stickiness ratio.

    Rolling COUNT(DISTINCT) has no window-function form; the
    scale-correct shape is: collapse events to distinct (user, day)
    FIRST (the only pass over raw events — at 100 TB everything after
    operates on ≤ |users|·|days| rows), then expand each user-day into
    the ≤ 7 trailing report days via a broadcast range join against the
    tiny day spine, and count distinct per report day.  All integers;
    stickiness is one division, pround-6.
    """
    e = load_table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    uday = ud.select(F.col("user_id"), F.col("day").alias("uday"))
    wau = (
        uday.join(
            F.broadcast(days),
            (F.col("uday") <= F.col("day"))
            & (F.col("uday") >= F.date_sub(F.col("day"), WAU_DAYS - 1)),
        )
        .select("day", "user_id")
        .distinct()
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            pround(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


EVENTS_DAU_WAU_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
days AS (SELECT DISTINCT day FROM ud),
dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
wau AS (
  SELECT d.day, count(DISTINCT u.user_id) AS wau
  FROM days d
  JOIN ud u ON u.day <= d.day AND u.day >= d.day - {WAU_DAYS - 1}
  GROUP BY d.day
)
SELECT dau.day, dau.dau, wau.wau,
       floor((dau.dau * 1.0 / wau.wau) * 1000000.0 + 0.5) / 1000000.0 AS stickiness
FROM dau JOIN wau ON dau.day = wau.day
ORDER BY dau.day
"""


def event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio of daily counts) per event
    type — the burstiness diagnostic: ≈1 for a Poisson arrival stream,
    ≫1 for bursty traffic.  This decides state sizing for the
    streaming operators (a bursty key needs watermark headroom).

    Population variance from exact integer moments of the per-day
    counts (Σx, Σx² over ≤ |days| rows), so the ratio is a fixed
    double expression — engine-exact; days with zero events are
    absent from the rollup and excluded (documented choice, identical
    in both engines).
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    mean = sx / n
    var = sxx / n - mean * mean
    return m.select(
        "event_type",
        "n_days",
        F.col("sx").alias("n_events"),
        pround(mean, 6).alias("mean_per_day"),
        pround(var / mean, 6).alias("fano_factor"),
    ).orderBy("event_type")


EVENT_BURSTINESS_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS x
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
m AS (
  SELECT event_type, count(*) AS n_days, sum(x) AS sx, sum(x * x) AS sxx
  FROM daily GROUP BY event_type
)
SELECT event_type, n_days, CAST(sx AS BIGINT) AS n_events,
  floor((CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
    AS mean_per_day,
  floor(((CAST(sxx AS DOUBLE) / CAST(n_days AS DOUBLE)
          - (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE))
            * (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE)))
         / (CAST(sx AS DOUBLE) / CAST(n_days AS DOUBLE))) * 1000000.0 + 0.5)
    / 1000000.0 AS fano_factor
FROM m
ORDER BY event_type
"""


def events_rolling_3day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type daily revenue with a 3-day trailing RANGE-frame sum and
    the day-over-day delta — the RANGE (value-based) window frame, as
    opposed to the ROWS frames used elsewhere: a gap in the calendar
    shrinks the frame, which a ROWS frame would silently span.

    The frame key is the integer epoch day, so the range arithmetic is
    exact; revenue is integer cents.  One shuffle on event_type (the
    partition key), ≤ |days| rows per partition after the rollup.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
                "epoch_day"
            ),
            F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
        )
        .groupBy("event_type", "epoch_day")
        .agg(F.sum("cents").alias("rev_cents"))
    )
    wr = (
        Window.partitionBy("event_type")
        .orderBy("epoch_day")
        .rangeBetween(-2, 0)
    )
    wo = Window.partitionBy("event_type").orderBy("epoch_day")
    return (
        daily.select(
            "event_type",
            "epoch_day",
            "rev_cents",
            F.sum("rev_cents").over(wr).alias("rev_3day_cents"),
            (F.col("rev_cents") - F.lag("rev_cents").over(wo)).alias(
                "dod_delta_cents"
            ),
        )
        .orderBy("event_type", "epoch_day")
    )


EVENTS_ROLLING_SQL = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS INTEGER) AS epoch_day,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM events
  GROUP BY event_type, date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
)
SELECT event_type, epoch_day, rev_cents,
       CAST(sum(rev_cents) OVER (PARTITION BY event_type ORDER BY epoch_day
                            RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
         AS BIGINT) AS rev_3day_cents,
       rev_cents - lag(rev_cents) OVER (PARTITION BY event_type
                                        ORDER BY epoch_day) AS dod_delta_cents
FROM daily
ORDER BY event_type, epoch_day
"""


def events_multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous aggregate: hour, day, AND week
    rollups of the event stream in ONE shuffle via GROUPING SETS — the
    TimescaleDB/Druid multi-grain materialization pattern, where each
    coarser grain would otherwise be a separate scan (here the single
    Expand feeds one hash aggregation; at 100 TB this is 1 pass over
    the fact table instead of 3).

    ``date_trunc('week')`` is Monday-anchored in both engines; sums are
    exact integer cents.  Sibling: ``grouping_sets_revenue`` shows the
    same operator over categorical dimensions — this is the TIME-grain
    instance an events pipeline actually materializes.
    """
    from projet_meteo_etl_spark.catalog import unique_view

    view = unique_view("events_mg")
    load_table(spark, sf_dir, "events").createOrReplaceTempView(view)
    out = spark.sql(
        f"""
        SELECT CASE WHEN grouping(date_trunc('hour', ts)) = 0 THEN 'hour'
                    WHEN grouping(date_trunc('day', ts)) = 0 THEN 'day'
                    ELSE 'week' END AS grain,
               coalesce(date_trunc('hour', ts), date_trunc('day', ts),
                        date_trunc('week', ts)) AS bucket_start,
               count(*) AS n_events,
               sum(CAST(floor(value * 100.0D + 0.5D) AS BIGINT)) / 100.0D
                 AS sum_value
        FROM {view}
        GROUP BY GROUPING SETS ((date_trunc('hour', ts)),
                                (date_trunc('day', ts)),
                                (date_trunc('week', ts)))
        ORDER BY grain, bucket_start
        """
    )
    spark.catalog.dropTempView(view)
    return out


EVENTS_MULTI_GRAIN_SQL = """
SELECT CASE WHEN grouping(date_trunc('hour', ts)) = 0 THEN 'hour'
            WHEN grouping(date_trunc('day', ts)) = 0 THEN 'day'
            ELSE 'week' END AS grain,
       coalesce(date_trunc('hour', ts), date_trunc('day', ts),
                date_trunc('week', ts)) AS bucket_start,
       count(*) AS n_events,
       sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / 100.0 AS sum_value
FROM events
GROUP BY GROUPING SETS ((date_trunc('hour', ts)), (date_trunc('day', ts)),
                        (date_trunc('week', ts)))
ORDER BY grain, bucket_start
"""


SPARK_QUERIES = {
    "events_json_typed_extract": events_json_typed_extract,
    "events_dau_wau": events_dau_wau,
    "events_rolling_3day_revenue": events_rolling_3day_revenue,
    "event_burstiness": event_burstiness,
    "events_tumbling_counts": events_tumbling_counts,
    "events_sliding_avg": events_sliding_avg,
    "events_session_windows": events_session_windows,
    "events_json_props": events_json_props,
    "events_late_data_filter": events_late_data_filter,
    "events_multi_grain_rollup": events_multi_grain_rollup,
}

ORACLE_SQL = {
    "events_json_typed_extract": EVENTS_JSON_TYPED_SQL,
    "events_dau_wau": EVENTS_DAU_WAU_SQL,
    "events_rolling_3day_revenue": EVENTS_ROLLING_SQL,
    "event_burstiness": EVENT_BURSTINESS_SQL,
    "events_tumbling_counts": EVENTS_TUMBLING_SQL,
    "events_sliding_avg": EVENTS_SLIDING_SQL,
    "events_session_windows": EVENTS_SESSION_SQL,
    "events_json_props": EVENTS_JSON_PROPS_SQL,
    "events_late_data_filter": EVENTS_LATE_SQL,
    "events_multi_grain_rollup": EVENTS_MULTI_GRAIN_SQL,
}
