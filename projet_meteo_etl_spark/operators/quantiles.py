"""Portable mergeable quantile sketch — the missing member of the
portable sketch family (HLL / CMS / Bloom, ``operators/sketches.py``).

A 100 TB profiler reports p50/p99 from MERGEABLE partials, never from a
global sort: each shard summarizes its rows into a fixed-size sketch,
partials merge associatively, and the quantile is read off the merged
sketch.  The sketch here is the **bottom-k priority sample** (KMV-style):
every row gets a deterministic 60-bit priority from the md5 of its
unique key, and the sketch is the ``k`` rows with the smallest
priorities together with their values — the sampling core of the
KLL/Manku-Rajagopalan family, without the level hierarchy (which exists
to shave the sample size from O(1/ε²) to O(1/ε·log log); at k=256 the
flat sample's ±O(1/√k) rank error is the classic reservoir bound and
the merge algebra is exact).

Why bottom-k and not literal KLL: KLL's compaction keeps alternate
elements chosen by random coins, which makes the RESULT depend on merge
order unless the coins are derandomized per level — whereas bottom-k is
a pure semilattice (``merge = union → keep k smallest``), so any merge
tree over any sharding yields the IDENTICAL sample.  That is the
property that lets the estimate itself — not just its error contract —
hash-check against DuckDB, the ``portable_hll_distinct`` recipe
(``operators/sketches.py:567``).

Scale shape: a naive "rank by hash per group" would globally sort each
group's rows in one task.  Instead the k smallest priorities are found
with a THRESHOLD PRE-FILTER: keep rows with ``h·n_g < 2^60·(OVER·k)``
(expected survivors ``OVER·k`` per group, automatic keep-everything when
``n_g ≤ OVER·k``), then rank only the survivor relation, which is
sample-size-bounded, not data-bounded.  With OVER=4 the probability
that fewer than k of a group's rows survive is Chernoff-negligible
(< e^{-k/4}); and because BOTH engines apply the identical filter, even
that event could not split the hash — it would only widen the (audited)
rank error.  The exact-quantile error column uses the repo's two-pass
``bucket_prefix`` rank (``functions/twopass.py``) — no global sort
anywhere in the plan.

Reference parity: the reference audits fixed physical ranges
(``/root/reference/quality_audit.py:11-16``); the sketch generalizes
those to percentile-derived ADAPTIVE ranges
(:func:`quantile_adaptive_range_audit`) — the p01/p99 band a 100 TB
profiler would derive instead of hand-coding constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table, spread_scan
from projet_meteo_etl_spark.functions.twopass import bucket_prefix

#: sketch size: k smallest md5 priorities per group (rank error ~1/√k)
QSK_K = 256
#: threshold oversampling factor — expected survivors per group = OVER·k
QSK_OVER = 4
#: shard count for the merge-proof path
QSK_SHARDS = 4
#: probed percentiles (integer percent, lower nearest-rank convention)
QSK_QS = (1, 25, 50, 75, 99)
#: the 60-bit md5-prefix priority domain (15 hex chars)
H60 = 1 << 60

_QS_SQL = ", ".join(str(q) for q in QSK_QS)


def _priority(key) -> F.Column:
    """60-bit md5-prefix priority — identical on both engines:
    Spark ``conv(substring(md5(s),1,15),16,10)`` ==
    DuckDB ``('0x' || substr(md5(s),1,15))::BIGINT``."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def _surv_filter() -> str:
    """Survivor predicate ``h·n_g < 2^60·(OVER·k)`` with the product
    DECIMAL(38,0)-widened (h is up to 2^60; ×n_g overflows a long at
    any real scale — DuckDB is HUGEINT natively).  Kept as the
    oracle-side form; the Spark plans use :func:`_thr_col` (same
    survivor set, per-GROUP decimal work instead of per-row)."""
    return (
        f"CAST(h AS DECIMAL(38,0)) * n_g"
        f" < CAST({H60} AS DECIMAL(38,0)) * {QSK_OVER * QSK_K}"
    )


def _thr_col() -> F.Column:
    """Per-GROUP survivor threshold equivalent to :func:`_surv_filter`:
    ``h·n_g < C`` (C = 2^60·OVER·k) ⟺ ``h ≤ floor((C−1)/n_g)`` for
    integer h ≥ 0, n_g ≥ 1.  Evaluating the DECIMAL division once per
    group and comparing plain longs per row removes the per-row
    DECIMAL(38,0) multiply, which profiled at ~3 s of the adaptive
    audit's wall at sf0.1 (OPTIMIZATION_r12.md).  When
    ``n_g ≤ OVER·k`` the quotient ≥ 2^60 > any h, i.e. every row
    survives — returned as the 2^60 cap so the long cast can never
    overflow; otherwise the quotient < 2^60 and fits a long exactly."""
    c1 = H60 * QSK_OVER * QSK_K - 1
    return (
        F.expr(
            f"CASE WHEN n_g <= {QSK_OVER * QSK_K} THEN {H60} "
            f"ELSE CAST(CAST({c1} AS DECIMAL(38,0)) DIV n_g AS BIGINT) END"
        )
        .cast("long")
        .alias("thr")
    )


def _sample_quantiles(
    sample: DataFrame, qdf: DataFrame, alias: str
) -> DataFrame:
    """Lower nearest-rank quantile picks from a (tiny) k-sample:
    value-rank the sample per group, pick rank ``(q·(m−1)) DIV 100 + 1``
    for each probed percentile.  All windows run over the
    sample-bounded relation."""
    w_v = Window.partitionBy("event_type").orderBy("cents", "event_id")
    s = sample.withColumn("vr", F.row_number().over(w_v))
    m = s.groupBy("event_type").agg(F.count(F.lit(1)).alias("m"))
    spine = m.crossJoin(F.broadcast(qdf)).withColumn(
        "r", F.expr("(q_pct * (m - 1)) div 100 + 1")
    )
    return (
        s.join(F.broadcast(spine), "event_type")
        .filter(F.col("vr") == F.col("r"))
        .select("event_type", "q_pct", F.col("cents").alias(alias))
    )


def _qspine(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(q,) for q in QSK_QS], "q_pct int")


def portable_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type value quantiles (p1/p25/p50/p75/p99, cents) from
    the portable bottom-k sketch, built twice — **direct** (one
    threshold-filtered pass) and **sharded→merged** (per-shard bottom-k
    partials unioned and re-pruned, the rollup-table merge path) — with
    the exact quantile and ppm error alongside.  ``merge_agrees`` is
    the numerically-proved mergeability flag: bottom-k is a semilattice,
    so the two paths are algebraically equal and the oracle hash pins
    BOTH (the ``portable_hll_distinct`` contract, for ranks).

    100 TB stance: the sketch build is scan + broadcast-joined group
    counts + threshold filter (survivors ≈ OVER·k per group — constant);
    every window in the plan runs over survivor- or sample-bounded
    relations.  The exact-rank error column uses the two-pass
    ``bucket_prefix`` rank, cents-domain bucketed, never a global sort.
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    rows = e.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias(
            "cents"
        ),
        _priority(F.col("event_id").cast("string")).alias("h"),
    )
    ng = rows.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_g"))
    # survivors feed the direct AND sharded paths: persist the ~OVER·k-
    # per-group relation (released via scoped_cache)
    surv = (
        rows.join(F.broadcast(ng.select("event_type", _thr_col())), "event_type")
        .filter(F.col("h") <= F.col("thr"))
        .select("event_type", "event_id", "cents", "h")
        .persist()
    )

    w_g = Window.partitionBy("event_type").orderBy("h", "event_id")
    direct = surv.withColumn("rk", F.row_number().over(w_g)).filter(
        F.col("rk") <= QSK_K
    )
    w_s = Window.partitionBy("event_type", "shard").orderBy("h", "event_id")
    shard_k = (
        surv.withColumn("shard", F.pmod(F.col("h"), F.lit(QSK_SHARDS)))
        .withColumn("rk", F.row_number().over(w_s))
        .filter(F.col("rk") <= QSK_K)
        .drop("rk", "shard")
    )
    merged = shard_k.withColumn("rk", F.row_number().over(w_g)).filter(
        F.col("rk") <= QSK_K
    )

    qdf = _qspine(spark)
    d_est = _sample_quantiles(direct, qdf, "est_direct_cents")
    m_est = _sample_quantiles(merged, qdf, "est_merged_cents")

    # exact nearest-rank values via the two-pass bucket-prefix rank
    full = rows.withColumn("vbucket", F.expr("cents div 100"))
    pre = bucket_prefix(
        full,
        "vbucket",
        {"n": (F.count(F.lit(1)), "sum")},
        partition_cols=["event_type"],
    )
    w_b = Window.partitionBy("event_type", "vbucket").orderBy(
        "cents", "event_id"
    )
    ranked = (
        full.join(F.broadcast(pre), ["event_type", "vbucket"])
        .withColumn(
            "grk",
            F.coalesce("pre_n", F.lit(0)) + F.row_number().over(w_b),
        )
    )
    ex_spine = ng.crossJoin(F.broadcast(qdf)).withColumn(
        "r_ex", F.expr("(q_pct * (n_g - 1)) div 100 + 1")
    )
    exact = (
        ranked.join(F.broadcast(ex_spine), "event_type")
        .filter(F.col("grk") == F.col("r_ex"))
        .select(
            "event_type",
            "q_pct",
            F.col("n_g").alias("n_rows"),
            F.col("cents").alias("exact_cents"),
        )
    )

    out = (
        exact.join(d_est, ["event_type", "q_pct"])
        .join(m_est, ["event_type", "q_pct"])
        .select(
            "event_type",
            "q_pct",
            "n_rows",
            "est_direct_cents",
            "est_merged_cents",
            (F.col("est_direct_cents") == F.col("est_merged_cents"))
            .cast("int")
            .alias("merge_agrees"),
            "exact_cents",
            # cents are bounded by the value domain (≤ ~1e7), so the
            # ×1e6 product stays far inside a long at any row count
            F.expr(
                "CAST(abs(est_direct_cents - exact_cents) * 1000000"
                " DIV greatest(exact_cents, 1) AS BIGINT)"
            ).alias("err_ppm"),
        )
        .orderBy("event_type", "q_pct")
    )
    return scoped_cache(out, surv)


PORTABLE_QUANTILE_SQL = f"""
WITH rows_ AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE value IS NOT NULL
),
ng AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_g
  FROM rows_ GROUP BY event_type
),
surv AS (
  SELECT r.event_type, r.event_id, r.cents, r.h
  FROM rows_ r JOIN ng USING (event_type)
  WHERE CAST(h AS HUGEINT) * n_g
        < CAST({H60} AS HUGEINT) * {QSK_OVER * QSK_K}
),
direct AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY event_type ORDER BY h, event_id) AS rk
    FROM surv) WHERE rk <= {QSK_K}
),
shard_k AS (
  SELECT event_type, event_id, cents, h FROM (
    SELECT *, row_number() OVER (
      PARTITION BY event_type, h % {QSK_SHARDS}
      ORDER BY h, event_id) AS rk
    FROM surv) WHERE rk <= {QSK_K}
),
merged AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY event_type ORDER BY h, event_id) AS rk
    FROM shard_k) WHERE rk <= {QSK_K}
),
qs AS (SELECT CAST(unnest([{_QS_SQL}]) AS INTEGER) AS q_pct),
d_v AS (
  SELECT event_type, cents,
         row_number() OVER (
           PARTITION BY event_type ORDER BY cents, event_id) AS vr,
         count(*) OVER (PARTITION BY event_type) AS m
  FROM direct
),
d_est AS (
  SELECT event_type, q_pct, cents AS est_direct_cents
  FROM d_v JOIN qs ON vr = (q_pct * (m - 1)) // 100 + 1
),
m_v AS (
  SELECT event_type, cents,
         row_number() OVER (
           PARTITION BY event_type ORDER BY cents, event_id) AS vr,
         count(*) OVER (PARTITION BY event_type) AS m
  FROM merged
),
m_est AS (
  SELECT event_type, q_pct, cents AS est_merged_cents
  FROM m_v JOIN qs ON vr = (q_pct * (m - 1)) // 100 + 1
),
ranked AS (
  SELECT event_type, cents,
         row_number() OVER (
           PARTITION BY event_type ORDER BY cents, event_id) AS grk
  FROM rows_
),
ex AS (
  SELECT r.event_type, q.q_pct, n.n_g AS n_rows, r.cents AS exact_cents
  FROM ranked r JOIN ng n USING (event_type)
  JOIN qs q ON r.grk = (q.q_pct * (n.n_g - 1)) // 100 + 1
)
SELECT ex.event_type, ex.q_pct, n_rows, est_direct_cents, est_merged_cents,
       CAST(CASE WHEN est_direct_cents = est_merged_cents
                 THEN 1 ELSE 0 END AS INTEGER) AS merge_agrees,
       exact_cents,
       CAST(abs(est_direct_cents - exact_cents) * 1000000
            // greatest(exact_cents, 1) AS BIGINT) AS err_ppm
FROM ex
JOIN d_est ON d_est.event_type = ex.event_type AND d_est.q_pct = ex.q_pct
JOIN m_est ON m_est.event_type = ex.event_type AND m_est.q_pct = ex.q_pct
ORDER BY ex.event_type, ex.q_pct
"""


#: lineitem measures audited by the adaptive-range audit
QSK_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
#: adaptive band percentiles (lo, hi)
QSK_LO_PCT, QSK_HI_PCT = 1, 99


def quantile_adaptive_range_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Percentile-adaptive range audit over the lineitem measures — the
    reference's fixed physical ranges
    (``/root/reference/quality_audit.py:11-16``, temperature ∈ [−50,60]
    etc.) generalized the way a 100 TB profiler derives them: a p01/p99
    band read off the portable bottom-k sketch, then a Q4-style
    ``expect_in_range`` count of rows outside the band, per measure in
    one unpivoted pass.

    Two scans, and only the SKETCH scan pays the unpivot + row hash:
    the per-measure counts come from one wide aggregate (``count(col)``
    per column), and the audit is a second wide aggregate with the
    pivoted 1-row bounds broadcast on — CASE sums per measure, no
    explode, no md5.  Rows keyed by ``measure:orderkey:linenumber`` so
    each measure's sample draws independent priorities from the same
    md5 stream.  (No global sort, no collect anywhere.)
    """
    li = load_table(spark, sf_dir, "lineitem")
    # per-measure non-null counts: one wide agg, then unpivot the 1-row
    # result (4 values — no data-sized explode)
    ng = li.agg(
        *[F.count(m).alias(f"n__{m}") for m in QSK_MEASURES]
    ).select(
        F.expr(
            "stack({n}, {args}) as (measure, n_g)".format(
                n=len(QSK_MEASURES),
                args=", ".join(f"'{m}', n__{m}" for m in QSK_MEASURES),
            )
        )
    )
    stack_expr = "stack({n}, {args}) as (measure, x)".format(
        n=len(QSK_MEASURES),
        args=", ".join(f"'{m}', {m}" for m in QSK_MEASURES),
    )
    # the md5-priority pass is the only corpus×4 compute in the plan;
    # spread the (projected) scan first so it parallelizes on
    # single-row-group inputs (no-op on a well-split table)
    li_rows = spread_scan(
        li.select(*QSK_MEASURES, "l_orderkey", "l_linenumber")
    )
    rows = li_rows.select(
        F.expr(stack_expr),
        "l_orderkey",
        "l_linenumber",
    ).filter(F.col("x").isNotNull()).select(
        "measure",
        F.floor(F.col("x") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
        _priority(
            F.concat_ws(
                ":",
                F.col("measure"),
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("h"),
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").alias("k2"),
    )
    surv = rows.join(
        F.broadcast(ng.select("measure", _thr_col())), "measure"
    ).filter(F.col("h") <= F.col("thr"))
    w_g = Window.partitionBy("measure").orderBy("h", "k1", "k2")
    sample = surv.withColumn("rk", F.row_number().over(w_g)).filter(
        F.col("rk") <= QSK_K
    )
    w_v = Window.partitionBy("measure").orderBy("cents", "k1", "k2")
    s = sample.withColumn("vr", F.row_number().over(w_v))
    m = s.groupBy("measure").agg(F.count(F.lit(1)).alias("m"))
    bounds = (
        s.join(F.broadcast(m), "measure")
        .withColumn(
            "r_lo", F.expr(f"({QSK_LO_PCT} * (m - 1)) div 100 + 1")
        )
        .withColumn(
            "r_hi", F.expr(f"({QSK_HI_PCT} * (m - 1)) div 100 + 1")
        )
        .groupBy("measure")
        .agg(
            F.max(F.when(F.col("vr") == F.col("r_lo"), F.col("cents"))).alias(
                "lo_cents"
            ),
            F.max(F.when(F.col("vr") == F.col("r_hi"), F.col("cents"))).alias(
                "hi_cents"
            ),
        )
    )
    # pivot the 4-row bounds to ONE broadcast row, then audit in one
    # wide aggregate over the raw columns (CASE sums; NULL measure
    # values drop out of count/sum naturally)
    brow = bounds.agg(
        *[
            agg
            for mname in QSK_MEASURES
            for agg in (
                F.max(
                    F.when(F.col("measure") == mname, F.col("lo_cents"))
                ).alias(f"lo__{mname}"),
                F.max(
                    F.when(F.col("measure") == mname, F.col("hi_cents"))
                ).alias(f"hi__{mname}"),
            )
        ]
    )
    cexp = {
        mname: f"CAST(floor({mname} * 100.0 + 0.5) AS BIGINT)"
        for mname in QSK_MEASURES
    }
    audit_row = li.crossJoin(F.broadcast(brow)).agg(
        *[
            agg
            for mname in QSK_MEASURES
            for agg in (
                F.count(mname).alias(f"n__{mname}"),
                F.sum(
                    F.expr(
                        f"CAST({cexp[mname]} < lo__{mname} AS BIGINT)"
                    )
                ).alias(f"b__{mname}"),
                F.sum(
                    F.expr(
                        f"CAST({cexp[mname]} > hi__{mname} AS BIGINT)"
                    )
                ).alias(f"a__{mname}"),
                F.max(f"lo__{mname}").alias(f"l__{mname}"),
                F.max(f"hi__{mname}").alias(f"h__{mname}"),
            )
        ]
    )
    unstack = "stack({n}, {args}) as (measure, n_rows, lo_cents, hi_cents, n_below, n_above)".format(
        n=len(QSK_MEASURES),
        args=", ".join(
            f"'{mname}', n__{mname}, l__{mname}, h__{mname},"
            f" b__{mname}, a__{mname}"
            for mname in QSK_MEASURES
        ),
    )
    return (
        audit_row.select(F.expr(unstack))
        # empty-input parity: the oracle's bounds join drops a measure
        # with zero non-null rows, while the pivoted 1-row aggregate
        # always exists — filter so both engines omit it (no-op on any
        # real lineitem).  The NULL-bounds guard covers the other
        # asymmetry: n_rows > 0 with zero threshold survivors (prob
        # ~e^-1024 per the sketch bound, but deterministic per dataset)
        # leaves lo/hi NULL here while the oracle's inner join on
        # `bounds` drops the measure — filter those too so the
        # zero-survivor behavior is engine-identical.  DECIMAL-widen
        # the ppm product (the eb_shrunk overflow discipline: counts
        # past ~9.2e12 would wrap a long)
        .filter(
            (F.col("n_rows") > 0)
            & F.col("lo_cents").isNotNull()
            & F.col("hi_cents").isNotNull()
        )
        .select(
            "measure",
            "n_rows",
            "lo_cents",
            "hi_cents",
            "n_below",
            "n_above",
            F.expr(
                "CAST(CAST(n_below + n_above AS DECIMAL(38,0)) * 1000000"
                " DIV n_rows AS BIGINT)"
            ).alias("out_ppm"),
        )
        .orderBy("measure")
    )


def _adaptive_range_sql() -> str:
    unpivot = "\n  UNION ALL\n".join(
        f"  SELECT '{m}' AS measure,"
        f" CAST(floor({m} * 100.0 + 0.5) AS BIGINT) AS cents,"
        f" l_orderkey AS k1, l_linenumber AS k2"
        f" FROM lineitem WHERE {m} IS NOT NULL"
        for m in QSK_MEASURES
    )
    return f"""
WITH unp AS (
{unpivot}
),
rows_ AS (
  SELECT measure, cents, k1, k2,
         ('0x' || substr(md5(measure || ':' || CAST(k1 AS VARCHAR)
                          || ':' || CAST(k2 AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM unp
),
ng AS (
  SELECT measure, CAST(count(*) AS BIGINT) AS n_g FROM rows_ GROUP BY measure
),
surv AS (
  SELECT r.* FROM rows_ r JOIN ng USING (measure)
  WHERE CAST(h AS HUGEINT) * n_g
        < CAST({H60} AS HUGEINT) * {QSK_OVER * QSK_K}
),
sample_ AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY measure ORDER BY h, k1, k2) AS rk
    FROM surv) WHERE rk <= {QSK_K}
),
s_v AS (
  SELECT measure, cents,
         row_number() OVER (
           PARTITION BY measure ORDER BY cents, k1, k2) AS vr,
         count(*) OVER (PARTITION BY measure) AS m
  FROM sample_
),
bounds AS (
  SELECT measure,
         max(CASE WHEN vr = ({QSK_LO_PCT} * (m - 1)) // 100 + 1
                  THEN cents END) AS lo_cents,
         max(CASE WHEN vr = ({QSK_HI_PCT} * (m - 1)) // 100 + 1
                  THEN cents END) AS hi_cents
  FROM s_v GROUP BY measure
)
SELECT r.measure,
       CAST(count(*) AS BIGINT) AS n_rows,
       max(lo_cents) AS lo_cents,
       max(hi_cents) AS hi_cents,
       CAST(sum(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END) AS BIGINT)
         AS n_below,
       CAST(sum(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above,
       CAST((sum(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END)
             + sum(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END)) * 1000000
            // count(*) AS BIGINT) AS out_ppm
FROM rows_ r JOIN bounds USING (measure)
GROUP BY r.measure
ORDER BY r.measure
"""


ADAPTIVE_RANGE_SQL = _adaptive_range_sql()


#: trailing window width (days) for the sliding quantile rollup
QSK_WINDOW_DAYS = 7
#: percentiles reported by the sliding rollup
QSK_SLIDING_QS = (50, 99)


def quantile_sliding_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day p50/p99 purchase value per day from DAILY
    bottom-k partials — the rollup-table pattern for sliding quantiles
    (the ``hll_sliding_distinct_users`` analogue,
    ``operators/sketches.py:717``): raw events aggregate once into a
    days×k partial table, and every window answer is a
    union→re-prune merge of 7 daily partials.  The alternative
    re-scans W× the data per window; at 100 TB the partial table is
    the only thing the window ever touches, and the same partials
    serve any trailing width — bottom-k's semilattice merge is what
    makes the daily partials composable at all.

    Same portable md5 priorities as :func:`portable_quantile_sketch`,
    so the sliding ESTIMATES hash-check against DuckDB; the exact
    window row count rides along.  Every relation after the daily
    build is days×k — date-domain bounded.
    """
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    rows = e.select(
        F.to_date("ts").alias("day"),
        "event_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias(
            "cents"
        ),
        _priority(F.col("event_id").cast("string")).alias("h"),
    )
    ng = rows.groupBy("day").agg(F.count(F.lit(1)).alias("n_g"))
    surv = rows.join(F.broadcast(ng), "day").filter(F.expr(_surv_filter()))
    w_d = Window.partitionBy("day").orderBy("h", "event_id")
    daily = (
        surv.withColumn("rk", F.row_number().over(w_d))
        .filter(F.col("rk") <= QSK_K)
        .select("day", "event_id", "cents", "h")
    )
    offs = spark.range(QSK_WINDOW_DAYS).select(
        F.col("id").cast("int").alias("off")
    )
    # each daily partial feeds the windows ending on day .. day+6;
    # windows are anchored at OBSERVED days (semi-join on the day spine)
    spread = (
        daily.crossJoin(F.broadcast(offs))
        .withColumn("wday", F.date_add("day", F.col("off")))
        .join(ng.select(F.col("day").alias("wday")), "wday", "left_semi")
    )
    w_w = Window.partitionBy("wday").orderBy("h", "event_id")
    merged = (
        spread.withColumn("rk", F.row_number().over(w_w))
        .filter(F.col("rk") <= QSK_K)
    )
    w_v = Window.partitionBy("wday").orderBy("cents", "event_id")
    s = merged.withColumn("vr", F.row_number().over(w_v))
    m = s.groupBy("wday").agg(F.count(F.lit(1)).alias("m"))
    # exact trailing row count from the daily count rollup
    nwin = (
        ng.crossJoin(F.broadcast(offs))
        .withColumn("wday", F.date_add("day", F.col("off")))
        .join(ng.select(F.col("day").alias("wday")), "wday", "left_semi")
        .groupBy("wday")
        .agg(
            F.sum("n_g").alias("n_rows"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )
    picks = None
    for q in QSK_SLIDING_QS:
        p = (
            s.join(F.broadcast(m), "wday")
            .filter(F.col("vr") == F.expr(f"({q} * (m - 1)) div 100 + 1"))
            .select("wday", F.col("cents").alias(f"p{q}_cents"))
        )
        picks = p if picks is None else picks.join(p, "wday")
    return (
        nwin.join(picks, "wday")
        .select(
            F.col("wday").alias("day"),
            F.col("n_days").cast("int").alias("n_days"),
            F.col("n_rows").cast("long").alias("n_rows"),
            *[F.col(f"p{q}_cents") for q in QSK_SLIDING_QS],
        )
        .orderBy("day")
    )


SLIDING_QUANTILE_SQL = f"""
WITH rows_ AS (
  SELECT CAST(ts AS DATE) AS day, event_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
),
ng AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_g FROM rows_ GROUP BY day
),
surv AS (
  SELECT r.* FROM rows_ r JOIN ng USING (day)
  WHERE CAST(h AS HUGEINT) * n_g
        < CAST({H60} AS HUGEINT) * {QSK_OVER * QSK_K}
),
daily AS (
  SELECT day, event_id, cents, h FROM (
    SELECT *, row_number() OVER (
      PARTITION BY day ORDER BY h, event_id) AS rk
    FROM surv) WHERE rk <= {QSK_K}
),
offs AS (SELECT CAST(unnest(range(0, {QSK_WINDOW_DAYS})) AS INTEGER) AS off),
spread AS (
  SELECT d.day + o.off AS wday, d.event_id, d.cents, d.h
  FROM daily d CROSS JOIN offs o
  WHERE d.day + o.off IN (SELECT day FROM ng)
),
merged AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY wday ORDER BY h, event_id) AS rk
    FROM spread) WHERE rk <= {QSK_K}
),
s_v AS (
  SELECT wday, cents,
         row_number() OVER (
           PARTITION BY wday ORDER BY cents, event_id) AS vr,
         count(*) OVER (PARTITION BY wday) AS m
  FROM merged
),
nwin AS (
  SELECT g.day + o.off AS wday,
         CAST(sum(g.n_g) AS BIGINT) AS n_rows,
         CAST(count(*) AS INTEGER) AS n_days
  FROM ng g CROSS JOIN offs o
  WHERE g.day + o.off IN (SELECT day FROM ng)
  GROUP BY g.day + o.off
)
SELECT n.wday AS day, n.n_days, n.n_rows,
       {", ".join(
           f"max(CASE WHEN vr = ({q} * (m - 1)) // 100 + 1"
           f" THEN cents END) AS p{q}_cents"
           for q in QSK_SLIDING_QS
       )}
FROM nwin n JOIN s_v ON s_v.wday = n.wday
GROUP BY n.wday, n.n_days, n.n_rows
ORDER BY day
"""


SPARK_QUERIES = {
    "portable_quantile_sketch": portable_quantile_sketch,
    "quantile_adaptive_range_audit": quantile_adaptive_range_audit,
    "quantile_sliding_daily": quantile_sliding_daily,
}

ORACLE_SQL: dict[str, str] = {
    "portable_quantile_sketch": PORTABLE_QUANTILE_SQL,
    "quantile_adaptive_range_audit": ADAPTIVE_RANGE_SQL,
    "quantile_sliding_daily": SLIDING_QUANTILE_SQL,
}
