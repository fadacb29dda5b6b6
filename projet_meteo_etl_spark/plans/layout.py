"""Data-layout operators: Z-order (Morton) multi-dimensional
clustering audit and a min/max-zone pruning estimator.

The reference has no layout concept (its whole dataset is 4,936 rows,
``/root/reference/test_etl_meteo.py:50-51``); at 100 TB layout IS the
query optimizer's biggest lever: a table clustered so each file covers
a small rectangle of (partkey, suppkey) space lets a two-dimensional
predicate skip almost every file via footer min/max zone maps, where a
single-column sort only prunes on its leading column.

* ``zorder_layout_audit`` — computes the 16-bit Morton interleave of
  the two join keys (8 quantizing bits each), bins rows into 64
  Z-ranges (the "files" a Z-ordered write would produce), and reports
  each bin's bounding rectangle and its area share: Z-ordered bins
  cover tiny rectangles, which is exactly the file-skipping argument.
* ``zone_pruning_estimate`` — the decision the optimizer would make:
  for a fixed 2-D predicate, how many of the 64 zones survive min/max
  pruning under (a) the Z-order layout vs (b) a partkey-sort layout —
  the measured file-skip win of re-clustering, as one query.

Everything is integer div/mod arithmetic (no engine bit-op quirks), so
both queries hash-check against DuckDB exactly.

Scale shape: one pass to get the two key maxima (column-pruned scan of
two ints), one pass to bin (projection + 64-ary groupBy with map-side
combine).  No joins on the big table; the maxima cross-join is a
1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table

#: quantizing bits per dimension (8 ⇒ 256×256 grid, 16-bit Z values)
ZBITS = 8
#: number of Z-range bins ("files") the audit simulates
ZBINS = 64


def _bucket(col, mx):
    """Order-preserving map of ``col`` ∈ [0, mx] onto [0, 2^ZBITS)."""
    grid = 1 << ZBITS
    # (col * grid) div (mx + 1): integer, exact in both engines
    return F.expr(f"CAST(({col} * {grid}) DIV ({mx} + 1) AS INT)")


def _bucket_sql(col: str, mx: str) -> str:
    grid = 1 << ZBITS
    return f"CAST(({col} * {grid}) // ({mx} + 1) AS INTEGER)"


def _morton_terms(xcol: str, ycol: str) -> str:
    """Bit interleave as pure div/mod arithmetic — identical text works
    as a Spark SQL expression and (with // for DIV) in DuckDB."""
    terms = []
    for i in range(ZBITS):
        terms.append(f"(({xcol} DIV {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({ycol} DIV {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def _zorder_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    mx = li.agg(
        F.max("l_partkey").alias("mxp"), F.max("l_suppkey").alias("mxs")
    )
    b = li.crossJoin(F.broadcast(mx)).select(
        _bucket("l_partkey", "mxp").alias("xb"),
        _bucket("l_suppkey", "mxs").alias("yb"),
    )
    zspan = (1 << (2 * ZBITS)) // ZBINS
    return b.select(
        "xb",
        "yb",
        F.expr(f"CAST(({_morton_terms('xb', 'yb')}) DIV {zspan} AS INT)").alias(
            "zbin"
        ),
    )


_ZORDER_BASE_SQL = f"""
  SELECT xb, yb,
         CAST(({_morton_terms('xb', 'yb').replace(' DIV ', ' // ')}) // {(1 << (2 * ZBITS)) // ZBINS}
              AS INTEGER) AS zbin
  FROM (
    SELECT {_bucket_sql('l_partkey', 'mxp')} AS xb,
           {_bucket_sql('l_suppkey', 'mxs')} AS yb
    FROM lineitem
    CROSS JOIN (SELECT max(l_partkey) AS mxp, max(l_suppkey) AS mxs
                FROM lineitem)
  )
"""


def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-Z-bin bounding rectangles of (partkey, suppkey) space.

    ``area_ppm`` is each bin's bounding-rectangle area as parts-per-
    million of the full grid: Z-ordering keeps it small and roughly
    uniform (≈ 1e6/ZBINS ppm), which is why a 2-D predicate prunes
    most Z-files — the property this audit pins and the oracle hash
    certifies.
    """
    z = _zorder_base(spark, sf_dir)
    grid = 1 << ZBITS
    return (
        z.groupBy("zbin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("xb").alias("min_xb"),
            F.max("xb").alias("max_xb"),
            F.min("yb").alias("min_yb"),
            F.max("yb").alias("max_yb"),
        )
        .select(
            "zbin",
            "n_rows",
            "min_xb",
            "max_xb",
            "min_yb",
            "max_yb",
            # integer DIV end-to-end: double division here would round
            # differently than DuckDB's // on some quotients
            F.expr(
                "CAST(CAST(max_xb - min_xb + 1 AS BIGINT)"
                " * (max_yb - min_yb + 1) * 1000000"
                f" DIV {grid * grid} AS BIGINT)"
            ).alias("area_ppm"),
        )
        .orderBy("zbin")
    )


ZORDER_AUDIT_SQL = f"""
WITH z AS ({_ZORDER_BASE_SQL})
SELECT zbin,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(xb) AS min_xb, max(xb) AS max_xb,
       min(yb) AS min_yb, max(yb) AS max_yb,
       CAST((max(xb) - min(xb) + 1)::BIGINT * (max(yb) - min(yb) + 1)
            * 1000000 // {(1 << ZBITS) * (1 << ZBITS)} AS BIGINT) AS area_ppm
FROM z
GROUP BY zbin
ORDER BY zbin
"""


#: the audit predicate: a 2-D rectangle ~1/16th of each dimension
PRED_X = (64, 79)
PRED_Y = (128, 143)


def zone_pruning_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-skipping win of Z-order vs single-column sort, as data.

    Both layouts split the table into ``ZBINS`` equal-width zones —
    Z-bins for the Z-order layout, partkey-bucket bins for the sort
    layout — and each zone keeps footer min/max for both columns.  A
    zone survives the rectangle predicate iff its bounds intersect the
    rectangle (the exact zone-map test).  Output: one row per layout
    with zones scanned / skipped and rows actually scanned — the
    measured I/O difference re-clustering buys.
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    # both layout branches (and their zone aggregations) consume the
    # binned base; without the persist each union branch re-runs the
    # lineitem scan AND the maxima scan (4 fact scans per query)
    z = _zorder_base(spark, sf_dir).persist()
    xlo, xhi = PRED_X
    ylo, yhi = PRED_Y

    def layout_stats(df: DataFrame, bin_col: str, layout: str) -> DataFrame:
        zones = df.groupBy(F.col(bin_col).alias("zone")).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("xb").alias("min_xb"),
            F.max("xb").alias("max_xb"),
            F.min("yb").alias("min_yb"),
            F.max("yb").alias("max_yb"),
        )
        hit = (
            (F.col("max_xb") >= xlo)
            & (F.col("min_xb") <= xhi)
            & (F.col("max_yb") >= ylo)
            & (F.col("min_yb") <= yhi)
        ).cast("int")
        return zones.select(F.lit(layout).alias("layout"), hit.alias("hit"), "n_rows").groupBy(
            "layout"
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_zones"),
            F.sum("hit").cast("long").alias("zones_scanned"),
            (F.count(F.lit(1)) - F.sum("hit")).cast("long").alias("zones_skipped"),
            F.sum(F.col("hit") * F.col("n_rows")).cast("long").alias("rows_scanned"),
        )

    # sort layout: zones are equal-width partkey-bucket ranges
    sort_bins = z.select(
        "xb", "yb", F.expr(f"CAST(xb DIV {(1 << ZBITS) // ZBINS} AS INT)").alias("sbin")
    )
    out = layout_stats(z, "zbin", "zorder").unionByName(
        layout_stats(sort_bins, "sbin", "sort_partkey")
    )
    return scoped_cache(out.orderBy("layout"), z)


ZONE_PRUNING_SQL = f"""
WITH z AS ({_ZORDER_BASE_SQL}),
zz AS (
  SELECT 'zorder' AS layout, zbin AS zone, xb, yb FROM z
  UNION ALL
  SELECT 'sort_partkey' AS layout,
         CAST(xb // {(1 << ZBITS) // ZBINS} AS INTEGER) AS zone, xb, yb
  FROM z
),
zones AS (
  SELECT layout, zone, CAST(count(*) AS BIGINT) AS n_rows,
         min(xb) AS min_xb, max(xb) AS max_xb,
         min(yb) AS min_yb, max(yb) AS max_yb
  FROM zz GROUP BY layout, zone
),
hits AS (
  SELECT layout, n_rows,
         CASE WHEN max_xb >= {PRED_X[0]} AND min_xb <= {PRED_X[1]}
               AND max_yb >= {PRED_Y[0]} AND min_yb <= {PRED_Y[1]}
              THEN 1 ELSE 0 END AS hit
  FROM zones
)
SELECT layout,
       CAST(count(*) AS BIGINT) AS n_zones,
       CAST(sum(hit) AS BIGINT) AS zones_scanned,
       CAST(count(*) - sum(hit) AS BIGINT) AS zones_skipped,
       CAST(sum(hit * n_rows) AS BIGINT) AS rows_scanned
FROM hits
GROUP BY layout
ORDER BY layout
"""


#: compaction target per output file — test-scale constant; production
#: sets 128 MiB–1 GiB.  The PLAN is size-independent: first-fit in
#: partition order over an exclusive prefix sum.
TARGET_FILE_BYTES = 65536


def small_files_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner (the OPTIMIZE/rewrite step every
    100 TB table needs): simulated input files are the (day, hour)
    partitions of the event log with estimated on-disk bytes; within
    each day, files are first-fit packed in hour order into output
    files of ``TARGET_FILE_BYTES`` via an exclusive prefix sum — output
    file id = prefix_bytes DIV target, pure integer arithmetic.

    Per day the plan reports input file count, total bytes, planned
    output file count, the largest planned file, and the fill rate in
    ppm of (outputs × target) — the numbers that justify running the
    rewrite.  One groupBy over the log + per-day windows: no join, no
    single-partition stage (windows partition by day).
    """
    e = load_table(spark, sf_dir, "events")
    files = e.groupBy(
        F.to_date("ts").alias("day"), F.hour("ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.lit(32) + F.coalesce(F.length("props"), F.lit(0)))
        .cast("long")
        .alias("bytes_est"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("day")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = files.withColumn(
        "prefix_bytes", F.coalesce(F.sum("bytes_est").over(w), F.lit(0))
    ).withColumn(
        "out_file",
        F.expr(f"prefix_bytes DIV {TARGET_FILE_BYTES}").cast("long"),
    )
    per_out = planned.groupBy("day", "out_file").agg(
        F.sum("bytes_est").alias("out_bytes"),
        F.count(F.lit(1)).alias("n_inputs"),
    )
    return (
        per_out.groupBy("day")
        .agg(
            F.sum("n_inputs").cast("long").alias("n_input_files"),
            F.sum("out_bytes").cast("long").alias("total_bytes"),
            F.count(F.lit(1)).cast("long").alias("n_output_files"),
            F.max("out_bytes").cast("long").alias("max_output_bytes"),
        )
        .withColumn(
            "fill_ppm",
            # bytes × 1e6 overflows a long at ~9.2 PB-days: widen first
            F.expr(
                "CAST(CAST(total_bytes AS DECIMAL(38,0)) * 1000000"
                f" DIV (n_output_files * {TARGET_FILE_BYTES}) AS BIGINT)"
            ),
        )
        .orderBy("day")
    )


COMPACTION_PLAN_SQL = f"""
WITH files AS (
  SELECT CAST(ts AS DATE) AS day, CAST(extract(hour FROM ts) AS INTEGER) AS hour,
         count(*) AS n_rows,
         CAST(sum(32 + coalesce(length(props), 0)) AS BIGINT) AS bytes_est
  FROM events GROUP BY 1, 2
),
planned AS (
  SELECT *,
         CAST(coalesce(sum(bytes_est) OVER (PARTITION BY day ORDER BY hour
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              // {TARGET_FILE_BYTES} AS BIGINT) AS out_file
  FROM files
),
per_out AS (
  SELECT day, out_file, sum(bytes_est) AS out_bytes, count(*) AS n_inputs
  FROM planned GROUP BY 1, 2
)
SELECT day,
       CAST(sum(n_inputs) AS BIGINT) AS n_input_files,
       CAST(sum(out_bytes) AS BIGINT) AS total_bytes,
       CAST(count(*) AS BIGINT) AS n_output_files,
       CAST(max(out_bytes) AS BIGINT) AS max_output_bytes,
       CAST(CAST(sum(out_bytes) AS HUGEINT) * 1000000
         // (count(*) * {TARGET_FILE_BYTES}) AS BIGINT) AS fill_ppm
FROM per_out
GROUP BY day
ORDER BY day
"""


#: hash-sampled "forget set": users with md5-prefix % FORGET_MOD == 0
FORGET_MOD = 20
#: rewrite threshold — files with more than this many ppm of deleted
#: rows get rewritten; below it a deletion vector suffices
DV_REWRITE_PPM = 20_000


def deletion_vector_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten planner: given a (hash-sampled,
    deterministic) set of users to erase, decide per day-partition file
    whether to attach a deletion vector or rewrite the file — the
    Delta/Iceberg DV-vs-rewrite decision, driven by the deleted-row
    density.  A DV keeps reads cheap when deletions are sparse; past
    ``DV_REWRITE_PPM`` the scan overhead justifies rewriting.

    One pass over the log (projection + per-day aggregate); the forget
    set is a predicate, not a table — at 100 TB the real id list would
    broadcast as a Bloom/join, but the plan arithmetic is identical.
    """
    e = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    flagged = e.select(
        F.to_date("ts").alias("day"),
        (F.pmod(h, F.lit(FORGET_MOD)) == 0).cast("int").alias("forget"),
    )
    return (
        flagged.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("forget").cast("long").alias("n_deleted"),
        )
        .withColumn(
            "deleted_ppm",
            F.expr(
                "CAST(CAST(n_deleted AS DECIMAL(38,0)) * 1000000"
                " DIV n_rows AS BIGINT)"
            ),
        )
        .withColumn(
            "plan",
            F.when(F.col("n_deleted") == 0, F.lit("noop"))
            .when(F.col("deleted_ppm") > DV_REWRITE_PPM, F.lit("rewrite"))
            .otherwise(F.lit("deletion_vector")),
        )
        .orderBy("day")
    )


DELETION_VECTOR_SQL = f"""
WITH flagged AS (
  SELECT CAST(ts AS DATE) AS day,
         CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
                   % {FORGET_MOD} = 0 THEN 1 ELSE 0 END AS forget
  FROM events
),
per AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(forget) AS BIGINT) AS n_deleted
  FROM flagged GROUP BY day
)
SELECT day, n_rows, n_deleted,
       CAST(CAST(n_deleted AS HUGEINT) * 1000000 // n_rows AS BIGINT)
         AS deleted_ppm,
       CASE WHEN n_deleted = 0 THEN 'noop'
            WHEN CAST(n_deleted AS HUGEINT) * 1000000 // n_rows
                 > {DV_REWRITE_PPM} THEN 'rewrite'
            ELSE 'deletion_vector' END AS plan
FROM per
ORDER BY day
"""


SPARK_QUERIES = {
    "zorder_layout_audit": zorder_layout_audit,
    "zone_pruning_estimate": zone_pruning_estimate,
    "small_files_compaction_plan": small_files_compaction_plan,
    "deletion_vector_plan": deletion_vector_plan,
}

ORACLE_SQL = {
    "zorder_layout_audit": ZORDER_AUDIT_SQL,
    "zone_pruning_estimate": ZONE_PRUNING_SQL,
    "small_files_compaction_plan": COMPACTION_PLAN_SQL,
    "deletion_vector_plan": DELETION_VECTOR_SQL,
}
