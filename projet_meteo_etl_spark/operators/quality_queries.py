"""Quality-audit operators over the catalog tables, with DuckDB oracles.

The reference's audit vocabulary (Q1-Q6, A1-A7 — SURVEY.md §2.3/§2.6)
applied to the driver's TPC-H-ish tables so the correctness gate can
hash-check the *semantics* of each audit operator (the weather pipeline
exercises them on weather data in tests, but that data isn't visible to
the DuckDB oracle).

Every audit is a FUSED single-scan aggregation — the engine-defining
improvement over the reference's one-scan-per-check pattern
(/root/reference/quality_audit.py:42-52 does 5 scans; etl_meteo.py:
239-274 does 6 more).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.functions.portable import pround


def range_audit_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4/P14/A7: physical-range violation counts + error rate, ONE scan.

    Constraints mirror the reference's QUALITY_CONSTRAINTS table shape
    (quality_audit.py:11-16) transposed to lineitem's domain.
    """
    l = load_table(spark, sf_dir, "lineitem")

    def oor(c: str, lo: float, hi: float) -> F.Column:
        return F.sum(F.when((F.col(c) < lo) | (F.col(c) > hi), 1).otherwise(0))

    return l.agg(
        F.count(F.lit(1)).alias("total"),
        oor("l_quantity", 1.0, 50.0).alias("oor_quantity"),
        oor("l_discount", 0.0, 0.1).alias("oor_discount"),
        oor("l_tax", 0.0, 0.08).alias("oor_tax"),
        oor("l_extendedprice", 0.0, 200000.0).alias("oor_price"),
        pround(
            (
                oor("l_quantity", 1.0, 50.0)
                + oor("l_discount", 0.0, 0.1)
                + oor("l_tax", 0.0, 0.08)
                + oor("l_extendedprice", 0.0, 200000.0)
            )
            / F.count(F.lit(1))
            * 100.0,
            4,
        ).alias("error_rate_pct"),
    )


RANGE_AUDIT_SQL = """
SELECT
  count(*) AS total,
  CAST(sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END) AS BIGINT)            AS oor_quantity,
  CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)             AS oor_discount,
  CAST(sum(CASE WHEN l_tax < 0.0 OR l_tax > 0.08 THEN 1 ELSE 0 END) AS BIGINT)                      AS oor_tax,
  CAST(sum(CASE WHEN l_extendedprice < 0.0 OR l_extendedprice > 200000.0 THEN 1 ELSE 0 END) AS BIGINT) AS oor_price,
  floor(((sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0 THEN 1 ELSE 0 END)
       + sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
       + sum(CASE WHEN l_tax < 0.0 OR l_tax > 0.08 THEN 1 ELSE 0 END)
       + sum(CASE WHEN l_extendedprice < 0.0 OR l_extendedprice > 200000.0 THEN 1 ELSE 0 END)
        ) * 100.0 / count(*)) * 10000.0 + 0.5) / 10000.0 AS error_rate_pct
FROM lineitem
"""


def null_audit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/A3/A6: per-column null counts in one pass (fixes the reference's
    Mongo pipeline bug where only the last $group stage survived,
    etl_meteo.py:236-250)."""
    e = load_table(spark, sf_dir, "events")
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    return e.agg(
        F.count(F.lit(1)).alias("total"),
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}")
            for c in cols
        ],
    )


NULL_AUDIT_SQL = """
SELECT
  count(*) AS total,
  CAST(sum(CASE WHEN event_id   IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_event_id,
  CAST(sum(CASE WHEN ts         IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_ts,
  CAST(sum(CASE WHEN user_id    IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_user_id,
  CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_event_type,
  CAST(sum(CASE WHEN value      IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_value,
  CAST(sum(CASE WHEN props      IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls_props
FROM events
"""


def duplicate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5/A5: duplicate counts over several candidate keys, one scan —
    ``count(*) − count(distinct key)`` per key (etl_meteo.py:71,118)."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.agg(
        F.count(F.lit(1)).alias("total"),
        (
            F.count(F.lit(1))
            - F.countDistinct(F.struct("l_orderkey", "l_linenumber"))
        ).alias("dups_order_line"),
        (F.count(F.lit(1)) - F.countDistinct("l_orderkey")).alias(
            "dups_orderkey"
        ),
        (
            F.count(F.lit(1))
            - F.countDistinct(F.struct("l_partkey", "l_suppkey"))
        ).alias("dups_part_supp"),
    )


DUPLICATE_AUDIT_SQL = """
SELECT
  count(*) AS total,
  count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS dups_order_line,
  count(*) - count(DISTINCT l_orderkey)                 AS dups_orderkey,
  count(*) - count(DISTINCT (l_partkey, l_suppkey))     AS dups_part_supp
FROM lineitem
"""


def date_range_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6/A4: min/max of every time column (test_etl_meteo.py:68-89)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    od = o.agg(
        F.lit("o_orderdate").alias("col"),
        F.min("o_orderdate").alias("min_ts"),
        F.max("o_orderdate").alias("max_ts"),
    )
    sd = l.agg(
        F.lit("l_shipdate").alias("col"),
        F.min("l_shipdate").alias("min_ts"),
        F.max("l_shipdate").alias("max_ts"),
    )
    return od.unionByName(sd).orderBy("col")


DATE_RANGE_AUDIT_SQL = """
SELECT 'o_orderdate' AS col, min(o_orderdate) AS min_ts, max(o_orderdate) AS max_ts FROM orders
UNION ALL
SELECT 'l_shipdate'  AS col, min(l_shipdate)  AS min_ts, max(l_shipdate)  AS max_ts FROM lineitem
ORDER BY col
"""


def consistency_audit_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 analogue for a typed engine: cross-field consistency — count
    rows where the materialized ``n_chars`` disagrees with ``length(text)``
    (the typed-schema version of 'is this value what it claims to be')."""
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(
            F.when(F.length("text").cast("long") != F.col("n_chars"), 1).otherwise(0)
        ).alias("n_chars_mismatch"),
        F.sum(F.when(F.col("text").isNull() | (F.length("text") == 0), 1).otherwise(0)).alias(
            "empty_docs"
        ),
    )


CONSISTENCY_AUDIT_SQL = """
SELECT
  count(*) AS total,
  CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_mismatch,
  CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_docs
FROM documents
"""


def count_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1/A1: table-level row counts (the source↔sink reconciliation
    primitive, etl_meteo.py:201-207) for every catalog fact table."""
    parts = []
    for t in ("lineitem", "orders", "customer", "events", "documents"):
        df = load_table(spark, sf_dir, t)
        parts.append(df.agg(F.lit(t).alias("tbl"), F.count(F.lit(1)).alias("n")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("tbl")


COUNT_RECONCILIATION_SQL = """
SELECT 'lineitem' AS tbl, count(*) AS n FROM lineitem
UNION ALL SELECT 'orders', count(*) FROM orders
UNION ALL SELECT 'customer', count(*) FROM customer
UNION ALL SELECT 'events', count(*) FROM events
UNION ALL SELECT 'documents', count(*) FROM documents
ORDER BY tbl
"""


def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK orphan audit — the data-quality check the reference's count
    reconciliation (etl_meteo.py:201-207) gestures at but cannot
    express without joins: per foreign-key edge, how many fact rows
    reference a missing parent.

    Edges audited: lineitem→orders, lineitem→part, lineitem→supplier,
    orders→customer.  Each edge is a LEFT ANTI join against the parent
    key set — Catalyst plans the dim side as a broadcast when small;
    at 100 TB the orders edge becomes a shuffled left-anti on the
    already-copartitioned orderkey, still one exchange per edge.  The
    per-edge counts union into one small report (4 rows).
    """
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")

    def orphans(fact: DataFrame, fk: str, dim: DataFrame, pk: str, edge: str) -> DataFrame:
        return (
            fact.join(dim, fact[fk] == dim[pk], "left_anti")
            .agg(F.count(F.lit(1)).cast("long").alias("n_orphans"))
            .select(F.lit(edge).alias("fk_edge"), "n_orphans")
        )

    return (
        orphans(l, "l_orderkey", o, "o_orderkey", "lineitem->orders")
        .unionByName(orphans(l, "l_partkey", p, "p_partkey", "lineitem->part"))
        .unionByName(orphans(l, "l_suppkey", s, "s_suppkey", "lineitem->supplier"))
        .unionByName(orphans(o, "o_custkey", c, "c_custkey", "orders->customer"))
        .orderBy("fk_edge")
    )


# NOT EXISTS, not NOT IN: a NULL foreign key must count as an orphan
# (matching the anti join), not vanish into three-valued logic
REFERENTIAL_INTEGRITY_SQL = """
SELECT 'lineitem->orders' AS fk_edge,
       CAST(count(*) AS BIGINT) AS n_orphans
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'lineitem->part',
       CAST(count(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
UNION ALL
SELECT 'lineitem->supplier',
       CAST(count(*) AS BIGINT)
FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
UNION ALL
SELECT 'orders->customer',
       CAST(count(*) AS BIGINT)
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
ORDER BY fk_edge
"""


#: k-anonymity suppression threshold and l-diversity floor
K_ANON_MIN = 5
L_DIV_MIN = 2


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity distribution over the (nation, market-segment)
    quasi-identifier — the re-identification audit run before a table
    leaves the governed zone: every row in an equivalence class of
    size k is indistinguishable from k−1 others, and classes below the
    suppression threshold (k < 5) are the privacy leak.

    Output: one row per observed class size k — how many classes and
    rows sit at that k, each row share in ppm, and whether that k is
    below the suppression threshold.  Two hash aggregates (rows →
    classes → k histogram), each strictly smaller than the last; the
    1-row total broadcasts onto the k histogram.
    """
    c = load_table(spark, sf_dir, "customer")
    classes = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    hist = classes.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum("k").cast("long").alias("n_rows"),
    )
    tot = hist.agg(F.sum("n_rows").cast("long").alias("n_total"))
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            "k",
            "n_classes",
            "n_rows",
            F.expr(
                "CAST(CAST(n_rows AS DECIMAL(38,0)) * 1000000"
                " DIV n_total AS BIGINT)"
            ).alias("rows_ppm"),
            F.expr(f"CAST(k < {K_ANON_MIN} AS INT)").alias("below_threshold"),
        )
        .orderBy("k")
    )


K_ANONYMITY_SQL = f"""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS k
  FROM customer GROUP BY 1, 2
),
hist AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_classes,
         CAST(sum(k) AS BIGINT) AS n_rows
  FROM classes GROUP BY k
),
tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM hist)
SELECT k, n_classes, n_rows,
       CAST(n_rows::HUGEINT * 1000000 // n_total AS BIGINT) AS rows_ppm,
       CAST(k < {K_ANON_MIN} AS INT) AS below_threshold
FROM hist, tot
ORDER BY k
"""


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class l-diversity detail for the same quasi-identifier,
    with account balance (banded to $1000) as the sensitive attribute:
    a class can be k-anonymous yet still leak if every member shares
    one sensitive value (l = 1) — the homogeneity attack k-anonymity
    alone misses.

    Output: one row per equivalence class — k, distinct sensitive
    bands l, and the suppress flag (k < 5 OR l < 2) a release pipeline
    would act on.  One hash aggregate at (class, band) grain, one at
    class grain: both bounded by |classes|·|bands|, not row count.
    """
    c = load_table(spark, sf_dir, "customer")
    banded = c.select(
        "c_nationkey",
        "c_mktsegment",
        # +1000-band offset keeps the dividend positive: Spark DIV and
        # DuckDB // both truncate toward zero so they agree on every
        # sign already — but acctbal can be negative, and a positive
        # dividend makes the band a true floor (trunc==floor), which is
        # the intended bucketing semantics
        F.expr(
            "(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 100000000)"
            " DIV 100000 - 1000"
        ).alias("bal_band"),
    )
    per_band = banded.groupBy(
        "c_nationkey", "c_mktsegment", "bal_band"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    return (
        per_band.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.sum("n").cast("long").alias("k"),
            F.count(F.lit(1)).cast("long").alias("l_distinct"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "k",
            "l_distinct",
            F.expr(
                f"CAST(k < {K_ANON_MIN} OR l_distinct < {L_DIV_MIN} AS INT)"
            ).alias("suppress"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


L_DIVERSITY_SQL = f"""
WITH banded AS (
  SELECT c_nationkey, c_mktsegment,
         (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 100000000)
           // 100000 - 1000 AS bal_band
  FROM customer
),
per_band AS (
  SELECT c_nationkey, c_mktsegment, bal_band, CAST(count(*) AS BIGINT) AS n
  FROM banded GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment,
       CAST(sum(n) AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS l_distinct,
       CAST(sum(n) < {K_ANON_MIN} OR count(*) < {L_DIV_MIN} AS INT)
         AS suppress
FROM per_band
GROUP BY 1, 2
ORDER BY 1, 2
"""


#: t-closeness release threshold (t = 0.2, the working value from the
#: Li/Li/Venkatasubramanian paper's examples), in ppm
T_CLOSE_MAX_PPM = 200_000


def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness for the same (nation, market-segment) classes and
    $1000-banded balance sensitive attribute as
    :func:`l_diversity_audit` — the third rung of the release-audit
    ladder: a class can be k-anonymous AND l-diverse while its
    sensitive DISTRIBUTION still leaks (all its balances in the top
    bands).  t-closeness bounds the Earth Mover's Distance between
    each class's band distribution and the global one.

    For an ordered 1-D attribute on m equal bands, EMD is the mean
    absolute cumulative gap:  ``Σ_j |P≤j − Q≤j| / (m−1)``.  Computed
    exactly with cross-multiplied integer prefix sums —
    ``Σ_j |cumc_j·N − cumg_j·k|`` over the GLOBAL band spine (every
    class × band cell exists via the spine join, so a band absent from
    a class contributes its full gap), one truncating ÷ at the end.

    Scale: two hash rollups (global per-band, class per-band), then
    everything is |classes|·|bands| — catalog-bounded, never row
    bounded; the global cumulative relation broadcasts.
    """
    c = load_table(spark, sf_dir, "customer")
    banded = c.select(
        "c_nationkey",
        "c_mktsegment",
        # same positive-offset band as l_diversity_audit
        F.expr(
            "(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 100000000)"
            " DIV 100000 - 1000"
        ).alias("bal_band"),
    )
    g = banded.groupBy("bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("gn")
    )
    wg = Window.orderBy("bal_band").rowsBetween(
        Window.unboundedPreceding, 0
    )
    gcum = g.select(
        "bal_band", F.sum("gn").over(wg).cast("long").alias("cumg")
    )
    gtot = g.agg(
        F.sum("gn").cast("long").alias("n_total"),
        F.greatest(F.count(F.lit(1)) - 1, F.lit(1))
        .cast("long")
        .alias("m1"),
    )
    cb = banded.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("cn")
    )
    classes = cb.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("cn").cast("long").alias("k")
    )
    spine = classes.crossJoin(F.broadcast(gcum.select("bal_band")))
    wc = Window.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        "bal_band"
    ).rowsBetween(Window.unboundedPreceding, 0)
    cells = (
        spine.join(cb, ["c_nationkey", "c_mktsegment", "bal_band"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "bal_band",
            "k",
            F.coalesce("cn", F.lit(0)).alias("cn"),
        )
        .withColumn("cumc", F.sum("cn").over(wc).cast("long"))
        .join(F.broadcast(gcum), "bal_band")
        .crossJoin(F.broadcast(gtot))
    )
    return (
        cells.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.max("k").alias("k"),
            F.sum(
                F.expr(
                    "abs(CAST(cumc AS DECIMAL(38,0)) * n_total"
                    " - CAST(cumg AS DECIMAL(38,0)) * k)"
                )
            ).alias("gap"),
            F.max("n_total").alias("n_total"),
            F.max("m1").alias("m1"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("k").cast("long").alias("k"),
            F.expr(
                "CAST(gap * 1000000"
                " DIV (CAST(k AS DECIMAL(38,0)) * n_total * m1) AS BIGINT)"
            ).alias("t_emd_ppm"),
            F.expr(
                f"CAST(gap * 1000000"
                f" DIV (CAST(k AS DECIMAL(38,0)) * n_total * m1)"
                f" > {T_CLOSE_MAX_PPM} AS INT)"
            ).alias("breach"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


T_CLOSENESS_SQL = f"""
WITH banded AS (
  SELECT c_nationkey, c_mktsegment,
         (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 100000000)
           // 100000 - 1000 AS bal_band
  FROM customer
),
g AS (
  SELECT bal_band, CAST(count(*) AS BIGINT) AS gn
  FROM banded GROUP BY 1
),
gcum AS (
  SELECT bal_band,
         CAST(sum(gn) OVER (ORDER BY bal_band
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cumg
  FROM g
),
gtot AS (
  SELECT CAST(sum(gn) AS BIGINT) AS n_total,
         CAST(greatest(count(*) - 1, 1) AS BIGINT) AS m1
  FROM g
),
cb AS (
  SELECT c_nationkey, c_mktsegment, bal_band,
         CAST(count(*) AS BIGINT) AS cn
  FROM banded GROUP BY 1, 2, 3
),
classes AS (
  SELECT c_nationkey, c_mktsegment, CAST(sum(cn) AS BIGINT) AS k
  FROM cb GROUP BY 1, 2
),
cells AS (
  SELECT cl.c_nationkey, cl.c_mktsegment, s.bal_band, cl.k,
         coalesce(cb.cn, 0) AS cn
  FROM classes cl
  CROSS JOIN (SELECT bal_band FROM gcum) s
  LEFT JOIN cb ON cb.c_nationkey = cl.c_nationkey
              AND cb.c_mktsegment = cl.c_mktsegment
              AND cb.bal_band = s.bal_band
),
cum AS (
  SELECT c_nationkey, c_mktsegment, bal_band, k,
         CAST(sum(cn) OVER (PARTITION BY c_nationkey, c_mktsegment
           ORDER BY bal_band
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cumc
  FROM cells
),
gaps AS (
  SELECT c.c_nationkey, c.c_mktsegment, max(c.k) AS k,
         sum(abs(c.cumc::HUGEINT * t.n_total - g.cumg::HUGEINT * c.k))
           AS gap,
         max(t.n_total) AS n_total, max(t.m1) AS m1
  FROM cum c
  JOIN gcum g ON g.bal_band = c.bal_band
  CROSS JOIN gtot t
  GROUP BY 1, 2
)
SELECT c_nationkey, c_mktsegment, CAST(k AS BIGINT) AS k,
       CAST(gap * 1000000 // (k::HUGEINT * n_total * m1) AS BIGINT)
         AS t_emd_ppm,
       CAST(gap * 1000000 // (k::HUGEINT * n_total * m1)
            > {T_CLOSE_MAX_PPM} AS INT) AS breach
FROM gaps
ORDER BY c_nationkey, c_mktsegment
"""


#: declared FD candidates: (table, determinant, dependent) — one true
#: FD (nation's region assignment) and three expected violations, so
#: the audit demonstrably separates the classes
FD_CANDIDATES = (
    ("nation", "n_nationkey", "n_regionkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("events", "user_id", "event_type"),
)


def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style functional-dependency check: for each declared
    candidate ``det → dep``, count determinant values that map to more
    than one distinct dependent value.  This is the profiling primitive
    behind "is this column a reliable key for that attribute?" —
    schema-on-read pipelines (the reference's Mongo collection is
    schemaless by construction) run exactly this before trusting a
    denormalization.

    One groupBy per candidate (the distinct-count runs map-side
    partial); the per-candidate result is a single row, so the union
    is 4 rows.  ``violation_ppm`` is exact integer.
    """
    outs = []
    for table, det, dep in FD_CANDIDATES:
        t = load_table(spark, sf_dir, table)
        g = t.groupBy(det).agg(F.countDistinct(dep).alias("nd"))
        outs.append(
            g.agg(
                F.count(F.lit(1)).cast("long").alias("n_det_values"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating"),
            ).select(
                F.lit(f"{table}.{det}->{dep}").alias("fd"),
                "n_det_values",
                "n_violating",
                F.expr(
                    "CAST(CAST(n_violating AS DECIMAL(38,0)) * 1000000"
                    " DIV n_det_values AS BIGINT)"
                ).alias("violation_ppm"),
                (F.col("n_violating") == 0).cast("int").alias("fd_holds"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("fd")


def _fd_sql_one(table: str, det: str, dep: str) -> str:
    return f"""
SELECT '{table}.{det}->{dep}' AS fd,
       CAST(count(*) AS BIGINT) AS n_det_values,
       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating,
       CAST(CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS HUGEINT)
            * 1000000 // count(*) AS BIGINT) AS violation_ppm,
       CAST(CASE WHEN sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0
            THEN 1 ELSE 0 END AS INTEGER) AS fd_holds
FROM (SELECT {det}, count(DISTINCT {dep}) AS nd FROM {table} GROUP BY 1)
"""


FD_AUDIT_SQL = (
    "SELECT * FROM ("
    + " UNION ALL ".join(_fd_sql_one(*c) for c in FD_CANDIDATES)
    + ") ORDER BY fd"
)


SPARK_QUERIES = {
    "functional_dependency_audit": functional_dependency_audit,
    "t_closeness_audit": t_closeness_audit,
    "referential_integrity_audit": referential_integrity_audit,
    "range_audit_lineitem": range_audit_lineitem,
    "null_audit_events": null_audit_events,
    "duplicate_audit": duplicate_audit,
    "date_range_audit": date_range_audit,
    "consistency_audit_documents": consistency_audit_documents,
    "count_reconciliation": count_reconciliation,
    "k_anonymity_audit": k_anonymity_audit,
    "l_diversity_audit": l_diversity_audit,
}

ORACLE_SQL = {
    "functional_dependency_audit": FD_AUDIT_SQL,
    "t_closeness_audit": T_CLOSENESS_SQL,
    "referential_integrity_audit": REFERENTIAL_INTEGRITY_SQL,
    "range_audit_lineitem": RANGE_AUDIT_SQL,
    "null_audit_events": NULL_AUDIT_SQL,
    "duplicate_audit": DUPLICATE_AUDIT_SQL,
    "date_range_audit": DATE_RANGE_AUDIT_SQL,
    "consistency_audit_documents": CONSISTENCY_AUDIT_SQL,
    "count_reconciliation": COUNT_RECONCILIATION_SQL,
    "k_anonymity_audit": K_ANONYMITY_SQL,
    "l_diversity_audit": L_DIVERSITY_SQL,
}
