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

from projet_meteo_etl_spark.catalog import load_table, spread_scan
from projet_meteo_etl_spark.functions.portable import pround, pround_sql

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
    # spread_scan measured FLAT here (ABBA isolates, r13): the wall is
    # the countDistinct exchange by (col_name, val), which the spread
    # does not touch — deliberately left unspread
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
    # spread_scan measured flat-to-negative here (ABBA isolates, r13) —
    # the bucket rollup exchange dominates; deliberately left unspread
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


#: column pairs profiled for linear relationships
CORR_PAIRS = (
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_quantity", "l_tax"),
    ("l_extendedprice", "l_discount"),
    ("l_extendedprice", "l_tax"),
    ("l_discount", "l_tax"),
)


def profile_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + OLS slope/intercept for every pair of
    profiled columns, from EXACT integer-cent moments.

    Built-in ``corr``/``regr_slope`` accumulate float co-moments whose
    value depends on partition/merge order — not reproducible across
    cluster layouts, and not hash-comparable across engines.  Instead
    ONE scan accumulates Σx, Σx², Σxy as ``DECIMAL(38,0)`` cent
    integers (order-independent, overflow-proof: Σxy ≤ n·10^14), and
    the closed-form corr/slope formulas run on doubles converted from
    those exact sums — a fixed sequence of correctly-rounded IEEE ops
    that Spark and DuckDB evaluate bit-identically.  The 6 pair rows
    come from an in-plan explode of the 1-row aggregate.
    """
    # 36 DECIMAL(38,0) partial sums per row all run in the scan stage
    # (below the single-row agg exchange): a single-row-group input
    # serializes the whole 128-bit-arithmetic pass on one core — spread
    # the 4 profiled columns first (guide §2.5; no-op on a split table)
    d = spread_scan(
        load_table(spark, sf_dir, "lineitem").select(*PROFILE_COLS)
    )
    cents = {
        c: F.floor(F.col(c) * 100 + 0.5).cast("decimal(38,0)")
        for c in PROFILE_COLS
    }
    # pairwise deletion: every moment is conditioned on BOTH pair
    # columns being non-null — a NULL in one column must not deflate
    # the mean of the other (count(*)-based n silently skews corr the
    # moment dirty data appears, which is what a profiler exists for)
    aggs = []
    for a, b in CORR_PAIRS:
        mask = F.col(a).isNotNull() & F.col(b).isNotNull()
        aggs.append(F.sum(mask.cast("long")).alias(f"n_{a}_{b}"))
        aggs.append(F.sum(F.when(mask, cents[a])).alias(f"sx_{a}_{b}"))
        aggs.append(F.sum(F.when(mask, cents[b])).alias(f"sy_{a}_{b}"))
        aggs.append(
            F.sum(
                F.when(mask, (cents[a] * cents[a]).cast("decimal(38,0)"))
            ).alias(f"sxx_{a}_{b}")
        )
        aggs.append(
            F.sum(
                F.when(mask, (cents[b] * cents[b]).cast("decimal(38,0)"))
            ).alias(f"syy_{a}_{b}")
        )
        aggs.append(
            F.sum(
                F.when(mask, (cents[a] * cents[b]).cast("decimal(38,0)"))
            ).alias(f"sxy_{a}_{b}")
        )
    m = d.agg(*aggs)

    def pair_struct(a: str, b: str):
        n = F.col(f"n_{a}_{b}").cast("double")
        sx = F.col(f"sx_{a}_{b}").cast("double") / 100.0
        sy = F.col(f"sy_{a}_{b}").cast("double") / 100.0
        sxx = F.col(f"sxx_{a}_{b}").cast("double") / 10000.0
        syy = F.col(f"syy_{a}_{b}").cast("double") / 10000.0
        sxy = F.col(f"sxy_{a}_{b}").cast("double") / 10000.0
        cov_n = n * sxy - sx * sy  # n² × covariance
        var_x = n * sxx - sx * sx
        var_y = n * syy - sy * sy
        slope = cov_n / var_x
        return F.struct(
            F.lit(a).alias("col_x"),
            F.lit(b).alias("col_y"),
            F.col(f"n_{a}_{b}").alias("n_rows"),
            pround(cov_n / F.sqrt(var_x * var_y), 9).alias("corr"),
            pround(cov_n / (n * (n - 1.0)), 6).alias("covar_samp"),
            pround(slope, 9).alias("slope"),
            pround((sy - slope * sx) / n, 6).alias("intercept"),
        )

    return (
        m.select(
            F.explode(
                F.array(*[pair_struct(a, b) for a, b in CORR_PAIRS])
            ).alias("p")
        )
        .select("p.*")
        .orderBy("col_x", "col_y")
    )


def _corr_sql() -> str:
    sums = []
    for a, b in CORR_PAIRS:
        mask = f"{a} IS NOT NULL AND {b} IS NOT NULL"
        ca = f"CAST(floor({a} * 100 + 0.5) AS HUGEINT)"
        cb = f"CAST(floor({b} * 100 + 0.5) AS HUGEINT)"
        sums.append(
            f"sum(CASE WHEN {mask} THEN 1 ELSE 0 END) AS n_{a}_{b}"
        )
        sums.append(f"sum(CASE WHEN {mask} THEN {ca} END) AS sx_{a}_{b}")
        sums.append(f"sum(CASE WHEN {mask} THEN {cb} END) AS sy_{a}_{b}")
        sums.append(
            f"sum(CASE WHEN {mask} THEN {ca} * {ca} END) AS sxx_{a}_{b}"
        )
        sums.append(
            f"sum(CASE WHEN {mask} THEN {cb} * {cb} END) AS syy_{a}_{b}"
        )
        sums.append(
            f"sum(CASE WHEN {mask} THEN {ca} * {cb} END) AS sxy_{a}_{b}"
        )
    rows = []
    for a, b in CORR_PAIRS:
        n = f"CAST(n_{a}_{b} AS DOUBLE)"
        sx = f"(CAST(sx_{a}_{b} AS DOUBLE) / 100.0)"
        sy = f"(CAST(sy_{a}_{b} AS DOUBLE) / 100.0)"
        sxx = f"(CAST(sxx_{a}_{b} AS DOUBLE) / 10000.0)"
        syy = f"(CAST(syy_{a}_{b} AS DOUBLE) / 10000.0)"
        sxy = f"(CAST(sxy_{a}_{b} AS DOUBLE) / 10000.0)"
        cov_n = f"({n} * {sxy} - {sx} * {sy})"
        var_x = f"({n} * {sxx} - {sx} * {sx})"
        var_y = f"({n} * {syy} - {sy} * {sy})"
        slope = f"({cov_n} / {var_x})"
        rows.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, CAST(n_{a}_{b} AS BIGINT) AS n_rows,\n"
            f"  {pround_sql(f'{cov_n} / sqrt({var_x} * {var_y})', 9)} AS corr,\n"
            f"  {pround_sql(f'{cov_n} / ({n} * ({n} - 1.0))', 6)} AS covar_samp,\n"
            f"  {pround_sql(slope, 9)} AS slope,\n"
            f"  {pround_sql(f'({sy} - {slope} * {sx}) / {n}', 6)} AS intercept\n"
            f"FROM m"
        )
    union = "\nUNION ALL\n".join(rows)
    return (
        "WITH m AS (\n  SELECT " + ",\n    ".join(sums) + "\n  FROM lineitem\n)\n"
        + union
        + "\nORDER BY col_x, col_y"
    )


#: discrete quantiles reported per group (percentile_disc semantics:
#: the actual element at 1-indexed row ceil(q·n))
QUANTILES = (0.25, 0.5, 0.75, 0.95)


def profile_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles of ``l_extendedprice`` by return
    flag, with ``percentile_disc`` semantics: the report value IS a
    data value (the element at row ``ceil(q·n)`` of the sorted group).

    Interpolating percentiles (``percentile``/``quantile_cont``) mix
    two floats and engines disagree on the blend's rounding; selecting
    an element by integer rank is bit-portable by construction.  One
    sort per group partition (single window exchange) serves all four
    quantiles and the rank assignment.
    """
    d = load_table(spark, sf_dir, "lineitem")
    from pyspark.sql import Window

    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wn = Window.partitionBy("l_returnflag")
    r = (
        # NULL prices are excluded from the ranked set on BOTH engines:
        # a ranked NULL would sit at rn=1 on Spark (ASC defaults to
        # NULLS FIRST) but rn=n on DuckDB (NULLS LAST), shifting every
        # element pick by one (adversarial TPC-H fixture, round 12) —
        # and a percentile OF null has no meaning anyway
        d.select("l_returnflag", "l_extendedprice")
        .filter(F.col("l_extendedprice").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    aggs = [F.max("n").alias("n_rows")]
    for q in QUANTILES:
        tag = f"p{int(q * 100)}"
        target = F.ceil(F.lit(q) * F.col("n"))
        aggs.append(
            F.max(
                F.when(F.col("rn") == target, F.col("l_extendedprice"))
            ).alias(tag)
        )
    return (
        r.groupBy("l_returnflag").agg(*aggs).orderBy("l_returnflag")
    )


def _group_percentiles_sql() -> str:
    picks = ["max(n) AS n_rows"]
    for q in QUANTILES:
        tag = f"p{int(q * 100)}"
        picks.append(
            f"max(CASE WHEN rn = ceil({q} * n) THEN l_extendedprice END) AS {tag}"
        )
    return f"""
WITH r AS (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL
)
SELECT l_returnflag, {", ".join(picks)}
FROM r GROUP BY l_returnflag ORDER BY l_returnflag
"""


#: expected Benford shares log10(1+1/d), pre-rounded to 6 decimals so
#: both engines embed the identical literal (no runtime log10)
_BENFORD_EXPECTED = {
    d: round(__import__("math").log10(1 + 1 / d), 6) for d in range(1, 10)
}


def profile_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of ``o_totalprice`` vs the
    Benford expectation — a classic fabricated-data audit.

    The digit is extracted through exact integer/string operations
    (floor → BIGINT → first character), never ``log10`` of a float,
    and the expected shares are pre-rounded literals — so the only
    data-dependent float is the observed share (one division of exact
    counts).  One scan, one 9-group aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor("o_totalprice").cast("long").cast("string"), 1, 1
    ).cast("int")
    counts = (
        o.filter(F.col("o_totalprice") >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("total"))
    expected = F.create_map(
        *[x for d, e in _BENFORD_EXPECTED.items() for x in (F.lit(d), F.lit(e))]
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            pround(F.col("n") / F.col("total"), 6).alias("observed_share"),
            expected[F.col("digit")].alias("benford_share"),
        )
        .orderBy("digit")
    )


_BENFORD_CASE = " ".join(
    # cast: a bare decimal literal is DECIMAL-typed in DuckDB and would
    # hash differently from Spark's double
    f"WHEN {d} THEN CAST({e} AS DOUBLE)" for d, e in _BENFORD_EXPECTED.items()
)

BENFORD_SQL = f"""
WITH counts AS (
  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
         count(*) AS n
  FROM orders WHERE o_totalprice >= 1
  GROUP BY 1
),
total AS (SELECT sum(n) AS total FROM counts)
SELECT digit, n,
       floor((n * 1.0 / (SELECT total FROM total)) * 1000000.0 + 0.5) / 1000000.0
         AS observed_share,
       CASE digit {_BENFORD_CASE} END AS benford_share
FROM counts
ORDER BY digit
"""


def profile_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis per profiled column from EXACT
    integer-cent power sums (Σx..Σx⁴ in DECIMAL(38,0)) — the
    distribution-shape half of the profiler, order-independent where
    the built-in ``skewness``/``kurtosis`` float accumulators are not.

    Population formulas over central moments reconstructed from raw
    power sums; every data-dependent sum is an exact integer, the
    final expression is a fixed double computation mirrored verbatim
    in the oracle.  Overflow headroom: Σx⁴ in cents⁴ reaches DECIMAL38
    limits near 10^10 rows × 10^7-cent values — beyond that, rescale
    to whole units (×10^-8 per x⁴ term) before summing; at test SFs
    cents are exact and comfortable.
    """
    # spread_scan measured FLAT here in ABBA isolates (r13) despite the
    # 16 power sums — unlike profile_correlations' 36 masked sums, this
    # pass is not scan-stage-bound; deliberately left unspread
    d = load_table(spark, sf_dir, "lineitem")
    # per-column NON-NULL count: sums skip nulls, so dividing by
    # count(*) would skew every central moment on dirty data
    aggs = [F.count(F.col(c)).alias(f"n_{c}") for c in PROFILE_COLS]
    for c in PROFILE_COLS:
        x = F.floor(F.col(c) * 100 + 0.5).cast("decimal(38,0)")
        aggs.append(F.sum(x).alias(f"s1_{c}"))
        aggs.append(F.sum((x * x).cast("decimal(38,0)")).alias(f"s2_{c}"))
        aggs.append(
            F.sum((x * x * x).cast("decimal(38,0)")).alias(f"s3_{c}")
        )
        aggs.append(
            F.sum((x * x * x * x).cast("decimal(38,0)")).alias(f"s4_{c}")
        )
    m = d.agg(*aggs)

    def shape(c: str):
        n = F.col(f"n_{c}").cast("double")
        s1 = F.col(f"s1_{c}").cast("double") / 1e2
        s2 = F.col(f"s2_{c}").cast("double") / 1e4
        s3 = F.col(f"s3_{c}").cast("double") / 1e6
        s4 = F.col(f"s4_{c}").cast("double") / 1e8
        mean = s1 / n
        m2 = s2 / n - mean * mean
        m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean
        m4 = (
            s4 / n
            - 4.0 * mean * (s3 / n)
            + 6.0 * mean * mean * (s2 / n)
            - 3.0 * mean * mean * mean * mean
        )
        return F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"n_{c}").alias("n_rows"),
            pround(m3 / (m2 * F.sqrt(m2)), 6).alias("skewness"),
            pround(m4 / (m2 * m2) - 3.0, 6).alias("excess_kurtosis"),
        )

    return (
        m.select(
            F.explode(F.array(*[shape(c) for c in PROFILE_COLS])).alias("p")
        )
        .select("p.*")
        .orderBy("col_name")
    )


def _higher_moments_sql() -> str:
    sums = [f"count({c}) AS n_{c}" for c in PROFILE_COLS]
    for c in PROFILE_COLS:
        x = f"CAST(floor({c} * 100 + 0.5) AS HUGEINT)"
        sums.append(f"sum({x}) AS s1_{c}")
        sums.append(f"sum({x} * {x}) AS s2_{c}")
        sums.append(f"sum({x} * {x} * {x}) AS s3_{c}")
        sums.append(f"sum({x} * {x} * {x} * {x}) AS s4_{c}")
    rows = []
    for c in PROFILE_COLS:
        n = f"CAST(n_{c} AS DOUBLE)"
        s1 = f"(CAST(s1_{c} AS DOUBLE) / 1e2)"
        s2 = f"(CAST(s2_{c} AS DOUBLE) / 1e4)"
        s3 = f"(CAST(s3_{c} AS DOUBLE) / 1e6)"
        s4 = f"(CAST(s4_{c} AS DOUBLE) / 1e8)"
        mean = f"({s1} / {n})"
        m2 = f"({s2} / {n} - {mean} * {mean})"
        m3 = f"({s3} / {n} - 3.0 * {mean} * ({s2} / {n}) + 2.0 * {mean} * {mean} * {mean})"
        m4 = (
            f"({s4} / {n} - 4.0 * {mean} * ({s3} / {n})"
            f" + 6.0 * {mean} * {mean} * ({s2} / {n})"
            f" - 3.0 * {mean} * {mean} * {mean} * {mean})"
        )
        rows.append(
            f"SELECT '{c}' AS col_name, CAST(n_{c} AS BIGINT) AS n_rows,\n"
            f"  {pround_sql(f'{m3} / ({m2} * sqrt({m2}))', 6)} AS skewness,\n"
            f"  {pround_sql(f'{m4} / ({m2} * {m2}) - 3.0', 6)} AS excess_kurtosis\n"
            f"FROM m"
        )
    return (
        "WITH m AS (\n  SELECT " + ",\n    ".join(sums) + "\n  FROM lineitem\n)\n"
        + "\nUNION ALL\n".join(rows)
        + "\nORDER BY col_name"
    )


#: selectivity-estimate geometry: fixed-width buckets over events.value
SEL_BUCKET_W = 16.0
SEL_N_BUCKETS = 32
#: the range predicate whose selectivity is forecast
SEL_LO = 20.0
SEL_HI = 40.0


def selectivity_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram selectivity forecast vs truth — the optimizer-statistics
    use of the profiler's histograms: estimate ``value ∈ [SEL_LO,
    SEL_HI)`` row count from a 32-bucket fixed-width histogram with
    linear interpolation on the partial edge buckets, next to the exact
    count and the relative error.

    Fixed bucket edges (width ``SEL_BUCKET_W``) keep the bucket id a
    single deterministic ``floor(value / w)`` — no in-plan min/max
    round-trip to diverge on.  At 100 TB the histogram is the ONLY
    pass over the data (map-side combinable to ≤32 cells/task); the
    forecast itself is arithmetic over 32 rows — exactly how a cost
    model consumes table stats without re-scanning.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    hist = (
        e.select(
            F.least(
                F.floor(F.col("value") / SEL_BUCKET_W), F.lit(SEL_N_BUCKETS - 1)
            )
            .cast("int")
            .alias("b")
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # overlap fraction of [lo, hi) with bucket [b*w, (b+1)*w)
    lo_b, hi_b = F.col("b") * SEL_BUCKET_W, (F.col("b") + 1) * SEL_BUCKET_W
    overlap = F.greatest(
        F.lit(0.0),
        F.least(F.lit(SEL_HI), hi_b) - F.greatest(F.lit(SEL_LO), lo_b),
    ) / F.lit(SEL_BUCKET_W)
    est = hist.agg(
        pround(F.sum(F.col("n") * overlap), 3).alias("est_rows")
    )
    exact = e.filter(
        (F.col("value") >= SEL_LO) & (F.col("value") < SEL_HI)
    ).agg(F.count(F.lit(1)).cast("long").alias("exact_rows"))
    return est.crossJoin(F.broadcast(exact)).select(
        "est_rows",
        "exact_rows",
        pround(
            F.abs(F.col("est_rows") - F.col("exact_rows")) / F.col("exact_rows"), 6
        ).alias("rel_err"),
    )


SELECTIVITY_SQL = f"""
WITH hist AS (
  SELECT CAST(least(floor(value / {SEL_BUCKET_W}), {SEL_N_BUCKETS - 1}) AS INTEGER) AS b,
         count(*) AS n
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
est AS (
  SELECT {pround_sql(
      "sum(n * (greatest(0.0, least(" + str(SEL_HI) + ", (b + 1) * " + str(SEL_BUCKET_W)
      + ") - greatest(" + str(SEL_LO) + ", b * " + str(SEL_BUCKET_W) + ")) / "
      + str(SEL_BUCKET_W) + "))", 3)} AS est_rows
  FROM hist
),
exact AS (
  SELECT CAST(count(*) AS BIGINT) AS exact_rows FROM events
  WHERE value >= {SEL_LO} AND value < {SEL_HI}
)
SELECT est_rows, exact_rows,
       {pround_sql('abs(est_rows - exact_rows) / exact_rows', 6)} AS rel_err
FROM est CROSS JOIN exact
"""


#: winsorization bounds as integer percents (exact percentile_disc
#: ranks per group: rank = ceil(pct·n/100) in PURE integer arithmetic —
#: float ceil(0.99·n) picks rank n for exact multiples because
#: 0.99·100 = 99.00000000000001 in binary)
WINSOR_LO_PCT = 1
WINSOR_HI_PCT = 99


def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type winsorization report: clip ``value`` at the exact
    within-group P1/P99 (percentile_disc semantics — the bound IS a
    data element, rank-selected, so both engines agree bit-for-bit) and
    compare the mean before/after in exact integer cents.

    Outlier clipping is the standard robustification step before a
    score/reward column feeds training; this operator reports what the
    clip would do before anyone commits to it.

    Scale: thresholds come from the SAME ranked window pass that feeds
    the clip (one shuffle on event_type, the window partitioning reused
    by the final aggregate); groups are processed independently, so a
    1000-executor cluster winsorizes each key's partition locally.  A
    GLOBAL winsorize would need a single-partition sort — that is the
    anti-pattern; partition by a grouping key (or pre-bucket) instead.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    w = Window.partitionBy("event_type").orderBy("c", "event_id")
    wn = Window.partitionBy("event_type")
    r = (
        e.select("event_type", "event_id", cents.alias("c"))
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("lo", F.max(F.when(F.col("rn") == F.expr(f"({WINSOR_LO_PCT} * n + 99) div 100"), F.col("c"))).over(wn))
        .withColumn("hi", F.max(F.when(F.col("rn") == F.expr(f"({WINSOR_HI_PCT} * n + 99) div 100"), F.col("c"))).over(wn))
    )
    clipped = F.greatest(F.least(F.col("c"), F.col("hi")), F.col("lo"))
    return (
        r.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col("c") < F.col("lo"), 1).otherwise(0)).cast("long").alias("n_clip_low"),
            F.sum(F.when(F.col("c") > F.col("hi"), 1).otherwise(0)).cast("long").alias("n_clip_high"),
            (F.max("lo") / 100.0).alias("p01_value"),
            (F.max("hi") / 100.0).alias("p99_value"),
            pround(F.sum("c") / F.count(F.lit(1)) / 100.0, 6).alias("mean_before"),
            pround(F.sum(clipped) / F.count(F.lit(1)) / 100.0, 6).alias("mean_after"),
        )
        .orderBy("event_type")
    )


WINSORIZED_SQL = f"""
WITH r AS (
  SELECT event_type,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(floor(value * 100.0 + 0.5) AS BIGINT), event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
b AS (
  SELECT event_type, c, n,
         max(CASE WHEN rn = ({WINSOR_LO_PCT} * n + 99) // 100 THEN c END)
           OVER (PARTITION BY event_type) AS lo,
         max(CASE WHEN rn = ({WINSOR_HI_PCT} * n + 99) // 100 THEN c END)
           OVER (PARTITION BY event_type) AS hi
  FROM r
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN c < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_low,
       CAST(sum(CASE WHEN c > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_high,
       max(lo) / 100.0 AS p01_value,
       max(hi) / 100.0 AS p99_value,
       {pround_sql('sum(c) * 1.0 / count(*) / 100.0', 6)} AS mean_before,
       {pround_sql('sum(greatest(least(c, hi), lo)) * 1.0 / count(*) / 100.0', 6)} AS mean_after
FROM b
GROUP BY event_type
ORDER BY event_type
"""


def shuffle_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/group-key skew diagnostic: for each candidate shuffle key,
    the distinct-key count, the heaviest key's row count, and the skew
    ratio (heaviest ÷ mean rows per key) — the number that decides
    between a plain shuffle join, AQE skew splitting, salting
    (``salted_skew_join``), or a broadcast.

    One groupBy per key space (map-side partial agg collapses each to
    |keys| rows), then a 4-row union.  This is the audit you run BEFORE
    shipping a 100 TB join, not after it straggles.
    """
    l = load_table(spark, sf_dir, "lineitem")
    e = load_table(spark, sf_dir, "events")

    def profile(df: DataFrame, col: str, label: str) -> DataFrame:
        per_key = df.groupBy(F.col(col).alias("k")).agg(
            F.count(F.lit(1)).alias("kn")
        )
        return per_key.agg(
            F.lit(label).alias("key_space"),
            F.sum("kn").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.max("kn").cast("long").alias("max_key_rows"),
            pround(F.max("kn") * F.count(F.lit(1)) / F.sum("kn"), 4).alias(
                "skew_ratio"
            ),
        )
    return (
        profile(l, "l_orderkey", "lineitem.l_orderkey")
        .unionByName(profile(l, "l_suppkey", "lineitem.l_suppkey"))
        .unionByName(profile(e, "user_id", "events.user_id"))
        .unionByName(profile(e, "event_type", "events.event_type"))
        .orderBy("key_space")
    )


def _skew_sql_one(table: str, col: str) -> str:
    return f"""
SELECT '{table}.{col}' AS key_space,
       CAST(sum(kn) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(kn) AS BIGINT) AS max_key_rows,
       {pround_sql('max(kn) * 1.0 * count(*) / sum(kn)', 4)} AS skew_ratio
FROM (SELECT {col} AS k, count(*) AS kn FROM {table} GROUP BY 1)"""


SKEW_AUDIT_SQL = f"""
{_skew_sql_one('lineitem', 'l_orderkey')}
UNION ALL {_skew_sql_one('lineitem', 'l_suppkey')}
UNION ALL {_skew_sql_one('events', 'user_id')}
UNION ALL {_skew_sql_one('events', 'event_type')}
ORDER BY key_space
"""


def robust_scaler_params(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust-scaler fit (the sklearn ``RobustScaler`` parameters, per
    event-type slice): rank-exact Q1/median/Q3 of the cent values, the
    IQR, and 1.5×IQR clip bounds — the outlier-insensitive
    normalization constants a feature pipeline exports before
    training.

    Percentiles are RANK-SELECTED (value at ``ceil(q·n)`` in the
    (cents, event_id) total order), not interpolated: Spark
    ``percentile`` interpolates and DuckDB ``quantile_disc`` floors, so
    neither builtin is cross-engine-stable — the explicit rank is, and
    it keeps every output an exact integer.  The window partitions by
    event_type; 1.5×IQR is computed as ``(3·iqr) DIV 2``.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = e.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    picked = ranked.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_rows"),
        F.max(F.when(F.expr("rn = (n + 3) DIV 4"), F.col("cents"))).alias("q1_cents"),
        F.max(F.when(F.expr("rn = (n + 1) DIV 2"), F.col("cents"))).alias(
            "median_cents"
        ),
        F.max(F.when(F.expr("rn = (3 * n + 3) DIV 4"), F.col("cents"))).alias(
            "q3_cents"
        ),
    )
    return (
        picked.withColumn("iqr_cents", F.expr("q3_cents - q1_cents"))
        .withColumn("clip_lo_cents", F.expr("q1_cents - (3 * iqr_cents) DIV 2"))
        .withColumn("clip_hi_cents", F.expr("q3_cents + (3 * iqr_cents) DIV 2"))
        .orderBy("event_type")
    )


ROBUST_SCALER_SQL = """
WITH ranked AS (
  SELECT event_type,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(floor(value * 100.0 + 0.5) AS BIGINT),
                                     event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
picked AS (
  SELECT event_type,
         CAST(max(n) AS BIGINT) AS n_rows,
         max(CASE WHEN rn = (n + 3) // 4 THEN cents END) AS q1_cents,
         max(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS median_cents,
         max(CASE WHEN rn = (3 * n + 3) // 4 THEN cents END) AS q3_cents
  FROM ranked GROUP BY event_type
)
SELECT event_type, n_rows, q1_cents, median_cents, q3_cents,
       q3_cents - q1_cents AS iqr_cents,
       q1_cents - (3 * (q3_cents - q1_cents)) // 2 AS clip_lo_cents,
       q3_cents + (3 * (q3_cents - q1_cents)) // 2 AS clip_hi_cents
FROM picked
ORDER BY event_type
"""


#: dictionary-encoding advisory cutoff: suggest dict when the column's
#: distinct count is at most 1/10 of its row count
CARD_DICT_RATIO = 10


def column_cardinality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality / encoding profile of the ``orders`` columns — the
    catalog statistics a layout advisor (dictionary vs plain encoding,
    join-side estimates, partition-key screening) reads before writing
    a table at scale.

    Per column: rows, nulls, distinct values, the modal value with its
    ppm share (ties break to the lexicographically smallest value, both
    engines compare varchar binary), and the encoding suggestion
    (``dict`` when distinct ≤ rows/10).  One ``stack`` unpivot makes
    this a SINGLE shuffle at (column, value) grain — per-column scans
    would pay k passes over the table; the rollup is value-domain
    bounded per column.
    """
    o = load_table(spark, sf_dir, "orders")
    stacked = o.select(
        F.expr(
            "stack(4,"
            " 'o_orderstatus', CAST(o_orderstatus AS STRING),"
            " 'o_orderpriority', CAST(o_orderpriority AS STRING),"
            " 'o_custkey', CAST(o_custkey AS STRING),"
            " 'order_year', CAST(year(o_orderdate) AS STRING)"
            ") AS (col_name, val)"
        )
    )
    per_val = stacked.groupBy("col_name", "val").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    from pyspark.sql import Window

    w_top = Window.partitionBy("col_name").orderBy(
        F.desc("n"), F.asc("val")
    )
    tops = (
        per_val.filter(F.col("val").isNotNull())
        .withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") == 1)
        .select("col_name", F.col("val").alias("top_value"),
                F.col("n").alias("top_n"))
    )
    stats = per_val.groupBy("col_name").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.sum(F.when(F.col("val").isNull(), F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_nulls"),
        F.count(F.when(F.col("val").isNotNull(), 1)).cast("long").alias(
            "n_distinct"
        ),
    )
    return (
        stats.join(tops, "col_name")
        .select(
            "col_name",
            "n_rows",
            "n_nulls",
            "n_distinct",
            "top_value",
            F.expr(
                "CAST(CAST(top_n AS DECIMAL(38,0)) * 1000000"
                " DIV n_rows AS BIGINT)"
            ).alias("top_share_ppm"),
            F.expr(
                f"CASE WHEN n_distinct * {CARD_DICT_RATIO} <= n_rows"
                f" THEN 'dict' ELSE 'plain' END"
            ).alias("suggested_encoding"),
        )
        .orderBy("col_name")
    )


COLUMN_CARDINALITY_SQL = f"""
WITH stacked AS (
  SELECT 'o_orderstatus' AS col_name, CAST(o_orderstatus AS VARCHAR) AS val
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
  UNION ALL
  SELECT 'order_year', CAST(year(o_orderdate) AS VARCHAR) FROM orders
),
per_val AS (
  SELECT col_name, val, CAST(count(*) AS BIGINT) AS n
  FROM stacked GROUP BY 1, 2
),
tops AS (
  SELECT col_name, val AS top_value, n AS top_n FROM (
    SELECT col_name, val, n,
           row_number() OVER (PARTITION BY col_name
                              ORDER BY n DESC, val ASC) AS rn
    FROM per_val WHERE val IS NOT NULL
  ) WHERE rn = 1
),
stats AS (
  SELECT col_name,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN val IS NULL THEN n ELSE 0 END) AS BIGINT)
           AS n_nulls,
         CAST(count(CASE WHEN val IS NOT NULL THEN 1 END) AS BIGINT)
           AS n_distinct
  FROM per_val GROUP BY 1
)
SELECT s.col_name, s.n_rows, s.n_nulls, s.n_distinct, t.top_value,
       CAST(t.top_n::HUGEINT * 1000000 // s.n_rows AS BIGINT)
         AS top_share_ppm,
       CASE WHEN s.n_distinct * {CARD_DICT_RATIO} <= s.n_rows
            THEN 'dict' ELSE 'plain' END AS suggested_encoding
FROM stats s JOIN tops t USING (col_name)
ORDER BY col_name
"""


SPARK_QUERIES = {
    "column_cardinality_profile": column_cardinality_profile,
    "profile_numeric_stats": profile_numeric_stats,
    "robust_scaler_params": robust_scaler_params,
    "profile_numeric_histograms": profile_numeric_histograms,
    "profile_correlations": profile_correlations,
    "profile_group_percentiles": profile_group_percentiles,
    "profile_benford_digits": profile_benford_digits,
    "profile_higher_moments": profile_higher_moments,
    "selectivity_estimate": selectivity_estimate,
    "winsorized_value_stats": winsorized_value_stats,
    "shuffle_skew_audit": shuffle_skew_audit,
}

ORACLE_SQL = {
    "column_cardinality_profile": COLUMN_CARDINALITY_SQL,
    "profile_numeric_stats": PROFILE_STATS_SQL,
    "robust_scaler_params": ROBUST_SCALER_SQL,
    "profile_numeric_histograms": PROFILE_HIST_SQL,
    "profile_correlations": _corr_sql(),
    "profile_group_percentiles": _group_percentiles_sql(),
    "profile_benford_digits": BENFORD_SQL,
    "profile_higher_moments": _higher_moments_sql(),
    "selectivity_estimate": SELECTIVITY_SQL,
    "winsorized_value_stats": WINSORIZED_SQL,
    "shuffle_skew_audit": SKEW_AUDIT_SQL,
}
