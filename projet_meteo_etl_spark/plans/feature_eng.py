"""Feature-engineering operators for training-data assembly.

The reference pipeline stops at cleaned rows (`/root/reference/
etl_meteo.py:292-332` produces a flat table and audits it); a
training-data platform additionally has to turn logs into model inputs
without leaking labels.  Three canonical constructions, each
deterministic and oracle-exact:

* ``kfold_target_encoding`` — leakage-free categorical encoding: the
  encoding of (item, fold) is the label mean over the OTHER folds, so
  a row never sees its own target.  Integer-exact: cent sums and
  counts per (item, fold), totals via a window, out-of-fold mean in
  integer micros.
* ``negative_sampling_pairs`` — contrastive negatives: per purchase
  (anchor, positive item), K deterministic negatives drawn by portable
  hash over the dense item vocabulary; hash collisions with the
  positive are rejected (no resample — documented bias of at most one
  missing slot, deterministic on both engines).
* ``coclick_positive_pairs`` — temporal positives: item pairs clicked
  by the same user within 24 hours, counted by distinct supporting
  users, support-filtered and top-k'd.  The contrastive-positive miner
  a two-tower recommender trains on.

Scale shape: target encoding is one groupBy + a per-item window over
~|items| rows.  Negative sampling is a projection joined to a
broadcast item vocabulary (|items| rows).  Co-click pairs self-join
clicks per user — bounded by the same per-user cap argument as
``operators/cooccur.py`` (clicks per user per day is product-
bounded, not corpus-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.functions.portable import json_long

from projet_meteo_etl_spark.catalog import load_table

#: number of folds for out-of-fold target encoding
N_FOLDS = 5
#: negatives per anchor
N_NEG = 3
#: co-click window (seconds) and output cap
COCLICK_WINDOW_S = 86400
COCLICK_MIN_SUPPORT = 2
COCLICK_TOP = 50


def _events_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        json_long().alias("item"),
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
    ).filter(F.col("item").isNotNull())


def kfold_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-fold target encoding of ``item`` against the cent label.

    enc(item, fold) = mean(cents) over every OTHER fold's rows of that
    item — the standard leakage-free construction (a training row's own
    target never contributes to its feature).  Folds are deterministic
    (``user_id % N_FOLDS``: fold assignment must be BY USER, not by
    row, or a user's own purchases leak across folds).  All arithmetic
    is integer (cent sums, counts, micros via DIV), so the result is
    engine-exact with no float accumulation anywhere.
    """
    e = _events_items(spark, sf_dir)
    per = (
        e.withColumn("fold", F.pmod("user_id", F.lit(N_FOLDS)).cast("int"))
        .groupBy("item", "fold")
        .agg(
            F.count(F.lit(1)).alias("n_in_fold"),
            F.sum("cents").alias("sum_in_fold"),
        )
    )
    w = Window.partitionBy("item")
    tot_n = F.sum("n_in_fold").over(w)
    tot_s = F.sum("sum_in_fold").over(w)
    return (
        per.select(
            "item",
            "fold",
            "n_in_fold",
            (tot_n - F.col("n_in_fold")).alias("n_out"),
            (tot_s - F.col("sum_in_fold")).alias("sum_out"),
        )
        .withColumn(
            "enc_micro",
            # cents are non-negative → Spark DIV (trunc) == DuckDB //
            # (floor); NULL when the item appears in only one fold
            F.when(
                F.col("n_out") > 0,
                F.expr("(sum_out * 1000000) DIV n_out").cast("long"),
            ),
        )
        .select("item", "fold", "n_in_fold", "n_out", "enc_micro")
        .orderBy("item", "fold")
    )


KFOLD_TARGET_ENCODING_SQL = f"""
WITH base AS (
  SELECT TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) AS item,
         CAST(user_id % {N_FOLDS} AS INTEGER) AS fold,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
  WHERE TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) IS NOT NULL
),
per AS (
  SELECT item, fold, count(*) AS n_in_fold, sum(cents) AS sum_in_fold
  FROM base GROUP BY item, fold
)
SELECT item, fold, n_in_fold,
       CAST(sum(n_in_fold) OVER (PARTITION BY item) - n_in_fold AS BIGINT)
         AS n_out,
       CASE WHEN sum(n_in_fold) OVER (PARTITION BY item) - n_in_fold > 0
            THEN CAST(((sum(sum_in_fold) OVER (PARTITION BY item) - sum_in_fold)
                       * 1000000)
                      // (sum(n_in_fold) OVER (PARTITION BY item) - n_in_fold)
                      AS BIGINT)
       END AS enc_micro
FROM per
ORDER BY item, fold
"""


def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K deterministic contrastive negatives per purchase anchor.

    The item vocabulary gets a dense index (ordered by item id); the
    negative for (anchor, slot) is ``md5hash(event_id:slot) mod
    |vocab|`` — uniform, reproducible on any cluster layout, and
    identically computable by the oracle.  A draw that collides with
    the anchor's positive item is dropped rather than redrawn (at most
    one of K slots lost, deterministically on both engines).  The
    vocabulary relation is |items| rows — a broadcast, never a shuffle
    of the fact table.
    """
    e = _events_items(spark, sf_dir)
    vocab = (
        e.select("item")
        .distinct()
        .withColumn(
            "idx",
            F.row_number().over(Window.orderBy("item")).cast("long") - 1,
        )
    )
    n_vocab = vocab.groupBy().agg(F.count(F.lit(1)).alias("n_vocab"))
    anchors = e.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("item").alias("pos_item")
    )
    slots = anchors.select(
        "event_id",
        "pos_item",
        F.explode(F.sequence(F.lit(0), F.lit(N_NEG - 1))).alias("slot"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("event_id"), F.col("slot"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    drawn = slots.crossJoin(F.broadcast(n_vocab)).withColumn(
        "idx", F.pmod(h, F.col("n_vocab"))
    )
    return (
        drawn.join(F.broadcast(vocab), "idx")
        .filter(F.col("item") != F.col("pos_item"))
        .select(
            "event_id",
            F.col("slot").cast("long").alias("slot"),
            "pos_item",
            F.col("item").alias("neg_item"),
        )
        .orderBy("event_id", "slot")
    )


NEGATIVE_SAMPLING_SQL = f"""
WITH base AS (
  SELECT event_id, event_type,
         TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) AS item
  FROM events
  WHERE TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) IS NOT NULL
),
vocab AS (
  SELECT item, row_number() OVER (ORDER BY item) - 1 AS idx
  FROM (SELECT DISTINCT item FROM base)
),
nv AS (SELECT count(*) AS n_vocab FROM vocab),
slots AS (
  SELECT b.event_id, b.item AS pos_item, s.slot
  FROM base b, (SELECT unnest(range({N_NEG})) AS slot) s
  WHERE b.event_type = 'purchase'
),
drawn AS (
  SELECT s.event_id, s.pos_item, s.slot,
         (('0x' || substr(md5(s.event_id || ':' || s.slot), 1, 15))::BIGINT
          % nv.n_vocab + nv.n_vocab) % nv.n_vocab AS idx
  FROM slots s, nv
)
SELECT d.event_id, d.slot, d.pos_item, v.item AS neg_item
FROM drawn d JOIN vocab v USING (idx)
WHERE v.item != d.pos_item
ORDER BY event_id, slot
"""


def coclick_positive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive POSITIVES from temporal co-click: (i1 < i2) clicked
    by the same user within ``COCLICK_WINDOW_S``, counted by distinct
    supporting users, support-filtered, top-``COCLICK_TOP`` by count.

    Unlike the global basket co-occurrence (``item_cooccurrence_topk``)
    this pairs only temporally-close clicks — the day-level signal
    a two-tower model wants.  The self-join is keyed on user_id, so a
    pair candidate never crosses users: per-user click volume in a
    24-hour window bounds the expansion, not corpus size.
    """
    c = _events_items(spark, sf_dir).filter(F.col("event_type") == "click")
    a = c.select("user_id", F.col("item").alias("i1"), F.unix_micros("ts").alias("t1"))
    b = c.select("user_id", F.col("item").alias("i2"), F.unix_micros("ts").alias("t2"))
    pairs = (
        a.join(b, "user_id")
        .filter(
            (F.col("i1") < F.col("i2"))
            & (F.abs(F.col("t1") - F.col("t2")) <= F.lit(COCLICK_WINDOW_S * 1_000_000))
        )
        .select("user_id", "i1", "i2")
        .distinct()
        .groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .filter(F.col("n_users") >= COCLICK_MIN_SUPPORT)
    )
    return pairs.orderBy(F.desc("n_users"), "i1", "i2").limit(COCLICK_TOP)


COCLICK_POSITIVE_SQL = f"""
WITH clicks AS (
  SELECT user_id,
         TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) AS item,
         epoch_us(ts) AS t
  FROM events
  WHERE event_type = 'click'
    AND TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) IS NOT NULL
),
pairs AS (
  SELECT DISTINCT a.user_id, a.item AS i1, b.item AS i2
  FROM clicks a JOIN clicks b
    ON a.user_id = b.user_id
   AND a.item < b.item
   AND abs(a.t - b.t) <= {COCLICK_WINDOW_S * 1_000_000}
)
SELECT i1, i2, count(*) AS n_users
FROM pairs
GROUP BY i1, i2
HAVING count(*) >= {COCLICK_MIN_SUPPORT}
ORDER BY n_users DESC, i1, i2
LIMIT {COCLICK_TOP}
"""


def propensity_ipw_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-propensity weights for de-biased click-through training:
    per item, the view→purchase propensity (ppm) and the IPW a
    purchased impression carries (1/propensity, in micros) — the
    standard correction when training on logged feedback whose exposure
    distribution is skewed.  One per-item aggregate over the log,
    all-integer ratios; items never purchased carry NULL weight
    (no-support flag) rather than a fabricated cap.
    """
    e = _events_items(spark, sf_dir)
    per = e.groupBy("item").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .cast("long")
        .alias("n_views"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purchases"),
    )
    return (
        per.filter(F.col("n_views") > 0)
        .select(
            "item",
            "n_views",
            "n_purchases",
            F.expr(
                "CAST(CAST(n_purchases AS DECIMAL(38,0)) * 1000000"
                " DIV n_views AS BIGINT)"
            ).alias("propensity_ppm"),
            F.when(
                F.col("n_purchases") > 0,
                F.expr(
                    "CAST(CAST(n_views AS DECIMAL(38,0)) * 1000000"
                    " DIV n_purchases AS BIGINT)"
                ),
            ).alias("ipw_micro"),
        )
        .orderBy("item")
    )


PROPENSITY_IPW_SQL = """
WITH base AS (
  SELECT TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) AS item, event_type
  FROM events
  WHERE TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) IS NOT NULL
),
per AS (
  SELECT item,
         CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_views,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purchases
  FROM base GROUP BY item
)
SELECT item, n_views, n_purchases,
       CAST(CAST(n_purchases AS HUGEINT) * 1000000 // n_views AS BIGINT)
         AS propensity_ppm,
       CASE WHEN n_purchases > 0
            THEN CAST(CAST(n_views AS HUGEINT) * 1000000 // n_purchases
                   AS BIGINT) END AS ipw_micro
FROM per
WHERE n_views > 0
ORDER BY item
"""


#: expanding-window CV fold count
N_TS_FOLDS = 5


def time_series_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expanding-window time-series cross-validation folds: the date
    span splits into ``N_TS_FOLDS + 1`` slices; fold k trains on
    slices 1..k and tests on slice k+1 (the last fold's test runs to
    the max date).  This is the temporal counterpart of
    :func:`kfold_target_encoding`'s user-hashed folds — for forecasting
    targets, a hash split would leak the future into training.

    All date arithmetic is integer epoch-days; the per-day rollup the
    fold counts aggregate over is date-domain bounded, and the bounds
    ride as a 1-row broadcast.
    """
    e = load_table(spark, sf_dir, "events").select(
        F.expr("unix_micros(ts) DIV 86400000000").alias("eday")
    )
    daily = e.groupBy("eday").agg(F.count(F.lit(1)).alias("n"))
    bounds = daily.agg(
        F.min("eday").alias("d0"), F.max("eday").alias("d1")
    )
    folds = spark.range(1, N_TS_FOLDS + 1).select(
        F.col("id").cast("int").alias("fold")
    )
    cuts = folds.crossJoin(F.broadcast(bounds)).select(
        "fold",
        "d0",
        "d1",
        F.expr(
            f"d0 + fold * greatest((d1 - d0 + 1) DIV {N_TS_FOLDS + 1}, 1) - 1"
        ).alias("train_end"),
        F.expr(
            f"CASE WHEN fold = {N_TS_FOLDS} THEN d1 "
            f"ELSE d0 + (fold + 1) * greatest((d1 - d0 + 1) DIV {N_TS_FOLDS + 1}, 1) - 1 END"
        ).alias("test_end"),
    )
    joined = daily.crossJoin(F.broadcast(cuts))
    return (
        joined.groupBy("fold", "train_end", "test_end")
        .agg(
            F.sum(F.when(F.col("eday") <= F.col("train_end"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_train"),
            F.sum(
                F.when(
                    (F.col("eday") > F.col("train_end"))
                    & (F.col("eday") <= F.col("test_end")),
                    F.col("n"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_test"),
        )
        .select(
            "fold",
            F.date_from_unix_date(F.col("train_end").cast("int")).alias(
                "train_end_day"
            ),
            F.date_from_unix_date(F.col("test_end").cast("int")).alias(
                "test_end_day"
            ),
            "n_train",
            "n_test",
        )
        .orderBy("fold")
    )


TS_CV_FOLDS_SQL = f"""
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS eday, count(*) AS n
  FROM events GROUP BY 1
),
bounds AS (SELECT min(eday) AS d0, max(eday) AS d1 FROM daily),
cuts AS (
  SELECT f.fold::INTEGER AS fold, b.d0, b.d1,
         b.d0 + f.fold * greatest((b.d1 - b.d0 + 1) // {N_TS_FOLDS + 1}, 1) - 1
           AS train_end,
         CASE WHEN f.fold = {N_TS_FOLDS} THEN b.d1
              ELSE b.d0 + (f.fold + 1)
                   * greatest((b.d1 - b.d0 + 1) // {N_TS_FOLDS + 1}, 1) - 1 END
           AS test_end
  FROM (SELECT unnest(range(1, {N_TS_FOLDS + 1})) AS fold) f, bounds b
)
SELECT c.fold,
       DATE '1970-01-01' + CAST(c.train_end AS INTEGER) AS train_end_day,
       DATE '1970-01-01' + CAST(c.test_end AS INTEGER) AS test_end_day,
       CAST(sum(CASE WHEN d.eday <= c.train_end THEN d.n ELSE 0 END) AS BIGINT)
         AS n_train,
       CAST(sum(CASE WHEN d.eday > c.train_end AND d.eday <= c.test_end
                     THEN d.n ELSE 0 END) AS BIGINT) AS n_test
FROM daily d, cuts c
GROUP BY c.fold, c.train_end, c.test_end
ORDER BY c.fold
"""


#: feature-hashing table sizes to audit
HASH_DIMS = (16, 64, 256)


def feature_hash_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing (hashing-trick) collision audit: the item
    vocabulary hashed into tables of ``HASH_DIMS`` buckets, reporting
    occupancy, the heaviest bucket, and the collision rate — the
    check run before fixing a hashed-feature dimensionality, where an
    undersized table silently aliases features.

    The vocabulary is catalog-sized; the whole audit is |vocab|×|dims|
    rows of integer arithmetic after one distinct over the log.
    """
    e = _events_items(spark, sf_dir)
    vocab = e.select("item").distinct()
    h = F.conv(
        F.substring(F.md5(F.col("item").cast("string")), 1, 15), 16, 10
    ).cast("long")
    hashed = vocab.select("item", h.alias("h")).crossJoin(
        F.broadcast(
            spark.createDataFrame(
                [(d,) for d in HASH_DIMS], "n_buckets int"
            )
        )
    )
    per_bucket = (
        hashed.select(
            "n_buckets", F.pmod("h", F.col("n_buckets")).alias("bucket")
        )
        .groupBy("n_buckets", "bucket")
        .agg(F.count(F.lit(1)).alias("load"))
    )
    return (
        per_bucket.groupBy("n_buckets")
        .agg(
            F.sum("load").cast("long").alias("n_items"),
            F.count(F.lit(1)).cast("long").alias("n_occupied"),
            F.max("load").cast("long").alias("max_load"),
        )
        .withColumn(
            "collision_ppm",
            F.expr("(n_items - n_occupied) * 1000000 DIV n_items"),
        )
        .orderBy("n_buckets")
    )


FEATURE_HASH_SQL = f"""
WITH vocab AS (
  SELECT DISTINCT TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) AS item
  FROM events WHERE TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) IS NOT NULL
),
hashed AS (
  SELECT v.item, d.n_buckets,
         ('0x' || substr(md5(CAST(v.item AS VARCHAR)), 1, 15))::BIGINT
           % d.n_buckets AS bucket
  FROM vocab v,
       (SELECT unnest([{', '.join(str(d) for d in HASH_DIMS)}]) AS n_buckets) d
),
per_bucket AS (
  SELECT n_buckets, bucket, count(*) AS load
  FROM hashed GROUP BY 1, 2
)
SELECT CAST(n_buckets AS INTEGER) AS n_buckets,
       CAST(sum(load) AS BIGINT) AS n_items,
       CAST(count(*) AS BIGINT) AS n_occupied,
       CAST(max(load) AS BIGINT) AS max_load,
       (CAST(sum(load) AS BIGINT) - count(*)) * 1000000
         // CAST(sum(load) AS BIGINT) AS collision_ppm
FROM per_bucket
GROUP BY n_buckets
ORDER BY n_buckets
"""


def regression_stump_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact depth-1 regression-tree split: the quantity threshold that
    most reduces the SSE of predicting line price — the CART split
    criterion evaluated EXACTLY, distributed, with no sampling.  This
    is the primitive feature-importance / binning probe a feature
    platform runs per candidate column; the trick is that for an
    integer-domain feature every candidate threshold lives on the
    per-distinct-value rollup, so the whole search is prefix sums —
    one shuffle to the ~50-row quantity rollup, then 50 integer
    evaluations.

    Score(t) = S_L²·1e6 DIV (n_L·n) + S_R²·1e6 DIV (n_R·n) — the
    per-row form of the SSE-minimizing objective, each term floored
    once (deterministic integers, every quotient ≤ mean²·1e6 so
    nothing overflows Spark DIV's LONG result); argmax breaks ties
    toward the smaller threshold.  The parent baseline
    Q·1e6 DIV n − S²·1e6 DIV n² makes the reported score a genuine
    per-row SSE drop.  Moments run in integer DOLLARS (the comparison
    is scale-invariant), holding the DECIMAL(38) intermediates to
    ~1e12 rows at this price domain.
    """
    l = load_table(spark, sf_dir, "lineitem")
    base = l.select(
        F.floor(F.col("l_quantity") + F.lit(0.5)).cast("long").alias("q"),
        # integer DOLLARS: keeps every per-row-normalized score inside
        # BIGINT (cent-scale squares overflow the final cast)
        F.floor(F.col("l_extendedprice") + F.lit(0.5))
        .cast("long")
        .alias("dollars"),
    ).filter(
        # rows with an unknown feature or target are excluded from the
        # stump's training set on BOTH engines: a NULL q would land at
        # opposite ends of the cumulative-prefix window (Spark NULLS
        # FIRST vs DuckDB NULLS LAST — adversarial TPC-H fixture,
        # round 12), and a NULL-q threshold is unsplittable anyway
        F.col("q").isNotNull() & F.col("dollars").isNotNull()
    )
    roll = base.groupBy("q").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.col("dollars").cast("decimal(38,0)")).alias("s"),
        F.sum(F.expr("CAST(dollars AS DECIMAL(38,0)) * dollars")).alias(
            "qq"
        ),
    )
    wcum = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    tot = roll.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("s").alias("s_tot"),
        F.sum("qq").alias("q_tot"),
    )
    cand = (
        roll.select(
            "q",
            F.sum("cnt").over(wcum).cast("long").alias("n_l"),
            F.sum("s").over(wcum).alias("s_l"),
        )
        .crossJoin(F.broadcast(tot))
        .filter(F.expr("n_l < n"))  # a split must leave a right side
        .select(
            F.col("q").alias("split_q"),
            "n_l",
            F.expr("n - n_l").alias("n_r"),
            # per-row score DIRECTLY: each quotient ≤ mean²·1e6, so it
            # fits BIGINT on both engines (a raw s² DIV n quotient
            # exceeds Spark DIV's LONG result type and wraps)
            F.expr(
                "CAST(s_l * s_l * 1000000"
                "       DIV (CAST(n_l AS DECIMAL(38,0)) * n)"
                " + (s_tot - s_l) * (s_tot - s_l) * 1000000"
                "       DIV (CAST(n - n_l AS DECIMAL(38,0)) * n)"
                " AS BIGINT)"
            ).alias("score_per_row_micro"),
            F.expr(
                "CAST(q_tot * 1000000 DIV n"
                " - s_tot * s_tot * 1000000"
                "     DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
            ).alias("sse_parent_per_row_micro"),
        )
    )
    return cand.orderBy(
        F.desc("score_per_row_micro"), F.asc("split_q")
    ).limit(1)


STUMP_SQL = """
WITH base AS (
  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
         CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS dollars
  FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
),
roll AS (
  SELECT q, CAST(count(*) AS BIGINT) AS cnt,
         sum(dollars::HUGEINT) AS s, sum(dollars::HUGEINT * dollars) AS qq
  FROM base GROUP BY q
),
tot AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n, sum(s) AS s_tot, sum(qq) AS q_tot
  FROM roll
),
cand AS (
  SELECT q AS split_q,
         CAST(sum(cnt) OVER w AS BIGINT) AS n_l,
         sum(s) OVER w AS s_l
  FROM roll WINDOW w AS (ORDER BY q
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
scored AS (
  SELECT c.split_q, c.n_l, t.n - c.n_l AS n_r,
         CAST(c.s_l * c.s_l * 1000000 // (c.n_l::HUGEINT * t.n)
              + (t.s_tot - c.s_l) * (t.s_tot - c.s_l) * 1000000
                // ((t.n - c.n_l)::HUGEINT * t.n) AS BIGINT)
           AS score_per_row_micro,
         CAST(t.q_tot * 1000000 // t.n
              - t.s_tot * t.s_tot * 1000000 // (t.n::HUGEINT * t.n)
              AS BIGINT) AS sse_parent_per_row_micro
  FROM cand c, tot t
  WHERE c.n_l < t.n
)
SELECT split_q, n_l, n_r, score_per_row_micro, sse_parent_per_row_micro
FROM scored
ORDER BY score_per_row_micro DESC, split_q ASC
LIMIT 1
"""


#: pseudo-count strength of the pooled prior — the classic additive
#: (Dirichlet) smoothing constant; fixed so the smoothing is part of
#: the operator's contract
EB_PRIOR_K = 20
#: report size (each side of the shrinkage movers panel)
EB_TOP_N = 20


def eb_shrunk_item_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes smoothed per-item view→click rate: every item's
    raw CTR is shrunk toward the POOLED rate with ``EB_PRIOR_K``
    pseudo-views — ``shrunk = (clicks + K·m) / (views + K)`` — the
    additive-smoothing estimator every ranking/ads stack feeds its
    models instead of raw rates, because a 1-view/1-click item is not
    a 100%-CTR item.  Complements :func:`kfold_target_encoding` (which
    smooths a TARGET encoding across folds) with the canonical
    rate-smoothing form, reported as the ``EB_TOP_N`` items the
    shrinkage moves MOST in each direction — exactly the long-tail
    items a raw-rate ranker misorders.

    Exact integers end-to-end: the pooled rate m is one ppm division,
    ``shrunk_ppm = (clicks·1e6 + K·m_ppm) DIV (views + K)``, and the
    movers rank on |shrunk − raw| with deterministic item tie-break.
    Scale: one event scan → per-item (views, clicks) rollup
    (map-combinable); the pooled 1-row aggregate broadcasts; the
    movers panel is a top-k window over the item catalog.
    """
    e = load_table(spark, sf_dir, "events").select(
        json_long().alias("item"),
        "event_type",
    ).filter(F.col("item").isNotNull())
    per = e.groupBy("item").agg(
        F.expr(
            "sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)"
        ).alias("views"),
        F.expr(
            "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)"
        ).alias("clicks"),
    ).filter(F.col("views") > 0).persist()
    # persisted: pooled and scored both consume it — without the cache
    # the events scan + rollup runs twice (released via scoped_cache)
    pooled = per.agg(
        # DECIMAL(38,0)-widen before the ×1e6: a LongType product wraps
        # (ANSI: throws) past ~9.2e12 total click events — the corpus
        # scale this module's other ppm products already widen for
        # (the DuckDB twin is HUGEINT natively)
        F.expr(
            "CAST(CAST(sum(clicks) AS DECIMAL(38,0)) * 1000000"
            " DIV sum(views) AS BIGINT)"
        ).alias("m_ppm")
    )
    scored = (
        per.crossJoin(F.broadcast(pooled))
        .select(
            "item",
            "views",
            "clicks",
            "m_ppm",
            F.expr(
                "CAST(CAST(clicks AS DECIMAL(38,0)) * 1000000"
                " DIV views AS BIGINT)"
            ).alias("raw_ppm"),
            F.expr(
                f"CAST((CAST(clicks AS DECIMAL(38,0)) * 1000000"
                f" + {EB_PRIOR_K} * m_ppm)"
                f" DIV (views + {EB_PRIOR_K}) AS BIGINT)"
            ).alias("shrunk_ppm"),
        )
        .withColumn(
            "shift_ppm", F.expr("CAST(shrunk_ppm - raw_ppm AS BIGINT)")
        )
    )
    from projet_meteo_etl_spark.cachescope import scoped_cache

    out = (
        scored.orderBy(
            F.desc(F.abs(F.col("shift_ppm"))), F.asc("item")
        )
        .limit(2 * EB_TOP_N)
        .select(
            "item", "views", "clicks", "raw_ppm", "shrunk_ppm", "shift_ppm"
        )
        .orderBy(F.asc("item"))
    )
    return scoped_cache(out, per)


EB_SHRUNK_CTR_SQL = f"""
WITH per AS (
  SELECT TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) AS item,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks
  FROM events
  WHERE TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) IS NOT NULL
  GROUP BY 1
  HAVING sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) > 0
),
pooled AS (
  SELECT CAST(CAST(sum(clicks) AS HUGEINT) * 1000000 // sum(views)
           AS BIGINT) AS m_ppm
  FROM per
),
scored AS (
  SELECT item, CAST(views AS BIGINT) AS views,
         CAST(clicks AS BIGINT) AS clicks,
         CAST(CAST(clicks AS HUGEINT) * 1000000 // views AS BIGINT)
           AS raw_ppm,
         CAST((CAST(clicks AS HUGEINT) * 1000000 + {EB_PRIOR_K} * m_ppm)
              // (views + {EB_PRIOR_K}) AS BIGINT) AS shrunk_ppm
  FROM per, pooled
)
SELECT item, views, clicks, raw_ppm, shrunk_ppm,
       CAST(shrunk_ppm - raw_ppm AS BIGINT) AS shift_ppm
FROM scored
ORDER BY abs(shrunk_ppm - raw_ppm) DESC, item ASC
LIMIT {2 * EB_TOP_N}
"""


SPARK_QUERIES = {
    "regression_stump_split": regression_stump_split,
    "kfold_target_encoding": kfold_target_encoding,
    "propensity_ipw_weights": propensity_ipw_weights,
    "time_series_cv_folds": time_series_cv_folds,
    "feature_hash_collision_audit": feature_hash_collision_audit,
    "negative_sampling_pairs": negative_sampling_pairs,
    "coclick_positive_pairs": coclick_positive_pairs,
    "eb_shrunk_item_ctr": eb_shrunk_item_ctr,
}

ORACLE_SQL = {
    "regression_stump_split": STUMP_SQL,
    "kfold_target_encoding": KFOLD_TARGET_ENCODING_SQL,
    "propensity_ipw_weights": PROPENSITY_IPW_SQL,
    "time_series_cv_folds": TS_CV_FOLDS_SQL,
    "feature_hash_collision_audit": FEATURE_HASH_SQL,
    "negative_sampling_pairs": NEGATIVE_SAMPLING_SQL,
    "coclick_positive_pairs": COCLICK_POSITIVE_SQL,
    "eb_shrunk_item_ctr": EB_SHRUNK_CTR_SQL,
}
