"""Incremental-maintenance operators: partial-aggregate merge (the
materialized-view maintenance primitive) and snapshot table diff (the
change-data audit primitive).

The reference rebuilds its sink from scratch on every run
(truncate-and-load, ``/root/reference/etl_meteo.py:195-198``) and
re-audits with full scans; these two operators are the scale-correct
replacements — at 100 TB you maintain aggregates by merging the delta's
partials, and you audit a refresh by diffing snapshots, never by
recomputing the world.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.functions.portable import pround
from projet_meteo_etl_spark.functions.twopass import bucket_prefix


def _partial_agg(d: DataFrame) -> DataFrame:
    cents = lambda c: F.floor(F.col(c) * 100 + 0.5).cast("decimal(38,0)")  # noqa: E731
    return d.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents("l_quantity")).alias("qty_cents"),
        F.sum(cents("l_extendedprice")).alias("price_cents"),
    )


def incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: the revenue-by-returnflag view is
    maintained by MERGING the delta batch's partial aggregates into the
    base partials — never rescanning the base — and the result is
    hash-checked against a from-scratch recompute (the oracle SQL).

    The merge works because every measure is an algebraic aggregate
    over exact integers (counts + DECIMAL(38) cent sums): merge =
    component-wise addition, associative and order-free — the same
    property Spark's own partial/final hash aggregation relies on.
    Here base = ``l_orderkey % 10 != 0``, delta = the rest, so the two
    partials cover the table exactly once.
    """
    li = load_table(spark, sf_dir, "lineitem")
    base = _partial_agg(li.filter(F.col("l_orderkey") % 10 != 0))
    delta = _partial_agg(li.filter(F.col("l_orderkey") % 10 == 0))
    merged = (
        base.unionByName(delta)
        .groupBy("l_returnflag")
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("qty_cents").alias("qty_cents"),
            F.sum("price_cents").alias("price_cents"),
        )
    )
    return merged.select(
        "l_returnflag",
        "n_rows",
        pround(F.col("qty_cents").cast("double") / 100.0, 2).alias("sum_qty"),
        pround(
            F.col("price_cents").cast("double")
            / (F.col("n_rows").cast("double") * 100.0),
            6,
        ).alias("avg_price"),
    ).orderBy("l_returnflag")


INCREMENTAL_AGG_SQL = """
SELECT l_returnflag,
       count(*) AS n_rows,
       floor((CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS HUGEINT)) AS DOUBLE) / 100.0)
             * 100.0 + 0.5) / 100.0 AS sum_qty,
       floor((CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)) AS DOUBLE)
              / (CAST(count(*) AS DOUBLE) * 100.0)) * 1000000.0 + 0.5) / 1000000.0
         AS avg_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


#: deterministic synthetic "next snapshot": deletes, updates, inserts.
#: Inserted keys map to the strictly-negative namespace
#: (l_orderkey → -l_orderkey - 1, well-defined for the synthetic data's
#: key 0 too): source keys are ≥ 0 at every scale factor, so inserts
#: can never collide with real keys — unlike a fixed additive shift,
#: which real keys outgrow as SF rises.
DIFF_DELETE_MOD = 97
DIFF_UPDATE_MOD = 101
DIFF_INSERT_MOD = 103


def _next_snapshot(cur: DataFrame) -> DataFrame:
    kept = cur.filter(F.col("l_orderkey") % DIFF_DELETE_MOD != 0)
    updated = kept.withColumn(
        "disc_c",
        F.when(
            F.col("l_orderkey") % DIFF_UPDATE_MOD == 0,
            F.col("disc_c") + 1,
        ).otherwise(F.col("disc_c")),
    )
    inserts = cur.filter(F.col("l_orderkey") % DIFF_INSERT_MOD == 0).withColumn(
        "l_orderkey", -F.col("l_orderkey") - 1
    )
    return updated.unionByName(inserts)


def _keyed_snapshot(li: DataFrame) -> DataFrame:
    """Collapse lineitem to one row per (l_orderkey, l_linenumber) with
    exact integer-cent measures — the synthetic data reuses key pairs,
    so the snapshot key is made unique by aggregation, and the diff
    compares only integers (no float equality anywhere)."""
    cents = lambda c: F.floor(F.col(c) * 100 + 0.5).cast("long")  # noqa: E731
    return li.groupBy("l_orderkey", "l_linenumber").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(cents("l_quantity")).alias("qty_c"),
        F.sum(cents("l_extendedprice")).alias("price_c"),
        F.sum(cents("l_discount")).alias("disc_c"),
    )


def snapshot_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff on the (l_orderkey, l_linenumber) key: row counts
    of added / deleted / changed / unchanged between the current keyed
    snapshot and a deterministically derived next version (deletes on
    one key residue, one-cent discount updates on another, key-shifted
    inserts on a third).

    One full-outer join on the snapshot key — hash-partitioned both
    sides, the canonical CDC-audit plan; all compared measures are
    integer cents, so "changed" is exact.  At 100 TB both snapshots
    bucket-join on the key with zero shuffle if laid out by the writer
    (see ``tests/test_sinks.py``).
    """
    cur = _keyed_snapshot(load_table(spark, sf_dir, "lineitem"))
    nxt = _next_snapshot(cur)
    key = ["l_orderkey", "l_linenumber"]
    cmp_cols = ("n_parts", "qty_c", "price_c", "disc_c")
    a = cur.select(*key, *[F.col(c).alias(f"a_{c}") for c in cmp_cols])
    b = nxt.select(*key, *[F.col(c).alias(f"b_{c}") for c in cmp_cols])
    j = a.join(b, key, "full_outer")
    changed = None
    for c in cmp_cols:
        term = ~F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}"))
        changed = term if changed is None else (changed | term)
    status = (
        F.when(F.col("a_n_parts").isNull(), "added")
        .when(F.col("b_n_parts").isNull(), "deleted")
        .when(changed, "changed")
        .otherwise("unchanged")
    )
    return (
        j.select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("status")
    )


SNAPSHOT_DIFF_SQL = f"""
WITH cur AS (
  SELECT l_orderkey, l_linenumber,
         count(*) AS n_parts,
         sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS qty_c,
         sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS price_c,
         sum(CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS disc_c
  FROM lineitem
  GROUP BY l_orderkey, l_linenumber
),
kept AS (SELECT * FROM cur WHERE l_orderkey % {DIFF_DELETE_MOD} != 0),
updated AS (
  SELECT l_orderkey, l_linenumber, n_parts, qty_c, price_c,
         CASE WHEN l_orderkey % {DIFF_UPDATE_MOD} = 0
              THEN disc_c + 1 ELSE disc_c END AS disc_c
  FROM kept
),
inserts AS (
  SELECT -l_orderkey - 1 AS l_orderkey, l_linenumber,
         n_parts, qty_c, price_c, disc_c
  FROM cur WHERE l_orderkey % {DIFF_INSERT_MOD} = 0
),
nxt AS (SELECT * FROM updated UNION ALL SELECT * FROM inserts),
j AS (
  SELECT CASE
           WHEN a.n_parts IS NULL THEN 'added'
           WHEN b.n_parts IS NULL THEN 'deleted'
           WHEN a.n_parts IS DISTINCT FROM b.n_parts
             OR a.qty_c IS DISTINCT FROM b.qty_c
             OR a.price_c IS DISTINCT FROM b.price_c
             OR a.disc_c IS DISTINCT FROM b.disc_c THEN 'changed'
           ELSE 'unchanged'
         END AS status
  FROM cur a
  FULL OUTER JOIN nxt b
    ON a.l_orderkey = b.l_orderkey AND a.l_linenumber = b.l_linenumber
)
SELECT status, count(*) AS n_rows
FROM j
GROUP BY status
ORDER BY status
"""


def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: the Pareto frontier of parts minimizing
    ``p_retailprice`` while maximizing ``p_size`` — no other part is
    both cheaper and at-least-as-large (with any strict improvement).

    Two-phase distributed frontier (no single-partition sort): prices
    quantize into dollar buckets; per-bucket max sizes roll into an
    exclusive prefix-max over the bucket-aggregate relation (bounded by
    the PRICE DOMAIN in dollars, not the part count); each row then
    compares against max(prefix-max of strictly-cheaper buckets,
    running max within its own bucket with a RANGE frame ending 1 cent
    before its price).  Hash-identical to the classic global skyline
    window, but every window is partitioned — per-task work is one
    dollar-bucket of parts.
    """
    p = load_table(spark, sf_dir, "part")
    base = p.select(
        "p_partkey",
        "p_size",
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long").alias("price_c"),
    ).withColumn("pbucket", F.expr("price_c div 100"))
    pre = bucket_prefix(
        base, "pbucket", {"max_size": (F.max("p_size"), "max")}
    )
    # running max size over STRICTLY cheaper rows = prior-bucket prefix
    # max ∪ same-bucket range frame ending 1 cent before this price
    # (rows in a strictly lower bucket are strictly cheaper: bucketing
    # is truncating division, monotone in price_c)
    w = (
        Window.partitionBy("pbucket")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    flagged = (
        base.join(F.broadcast(pre), "pbucket")
        .withColumn("best_in_bucket", F.max("p_size").over(w))
        .withColumn(
            "best_cheaper", F.greatest("pre_max_size", "best_in_bucket")
        )
    )
    return (
        flagged.filter(
            F.col("best_cheaper").isNull()
            | (F.col("p_size") > F.col("best_cheaper"))
        )
        .select(
            "p_partkey",
            "p_size",
            pround(F.col("price_c") / 100.0, 2).alias("price"),
        )
        .orderBy("price", "p_partkey")
    )


PARETO_SQL = """
WITH base AS (
  SELECT p_partkey, p_size,
         CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM part
),
flagged AS (
  SELECT p_partkey, p_size, price_c,
         max(p_size) OVER (ORDER BY price_c
                           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_cheaper
  FROM base
)
SELECT p_partkey, p_size,
       floor((price_c / 100.0) * 100.0 + 0.5) / 100.0 AS price
FROM flagged
WHERE best_cheaper IS NULL OR p_size > best_cheaper
ORDER BY price, p_partkey
"""


def join_view_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-join view maintenance: the revenue-by-nation view (a
    4-table join) absorbs a new lineitem batch through the IVM rule
    Δ(L ⋈ D) = ΔL ⋈ D — the delta joins only the (unchanged)
    dimensions, the base is merged as stored partial aggregates, and
    the result hash-checks against a from-scratch recompute.

    Revenue accumulates as exact cents×basis-points integers (the
    ``plans/experiments.py`` recipe), so partial merge is component-wise
    BIGINT addition — associative, order-free, and bit-identical to the
    recompute.  At 100 TB this is the difference between reprocessing a
    day's batch and reprocessing the corpus: the delta path's cost is
    |ΔL| joined against broadcast dims, independent of |L|.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev4 = F.expr(
        "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"
        " * CAST(floor((1 - l_discount) * 100.0 + 0.5) AS BIGINT)"
    )

    def partial(lsub):
        return (
            lsub.join(o, lsub.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(rev4).cast("long").alias("rev4"),
            )
        )

    base = partial(li.filter(F.col("l_orderkey") % 10 != 0))
    delta = partial(li.filter(F.col("l_orderkey") % 10 == 0))
    merged = (
        base.unionByName(delta)
        .groupBy("n_name")
        .agg(
            F.sum("n_rows").cast("long").alias("n_rows"),
            F.sum("rev4").cast("long").alias("rev4"),
        )
    )
    return merged.select(
        "n_name",
        "n_rows",
        pround(F.col("rev4") / 10000.0, 2).alias("revenue"),
    ).orderBy("n_name")


JOIN_VIEW_SQL = """
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       floor((CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                       * CAST(floor((1 - l_discount) * 100.0 + 0.5) AS BIGINT))
                   AS DOUBLE) / 10000.0) * 100.0 + 0.5) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain DataFrames — the CDC apply step a
    lakehouse runs per batch: a changeset of inserts (disjoint negative
    key namespace), updates (repriced rows), and deletes applies to the
    base snapshot in ONE keyed full-outer join, and the result is
    audited per order status: rows before/after, op counts, and the
    exact final value checksum in cents.

    The changeset is derived deterministically from the key space
    (base = keys ≢0 mod 7; updates = base keys ≡0 mod 5; inserts = the
    ≡0 mod 7 rows re-keyed into the negative namespace; deletes = base
    keys ≡0 mod 11 that are not update targets), so the merge exercises
    all three op paths — on keys that actually exist — at every scale
    factor.  At
    100 TB this is one shuffle of base ∪ changeset on the key — the
    same cost as the snapshot diff, with the apply decided per key by
    op precedence (delete > update > keep).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias("cents"),
    )
    base = o.filter(F.col("o_orderkey") % 7 != 0)
    updates = (
        base.filter(F.col("o_orderkey") % 5 == 0)
        .select("o_orderkey", "o_orderstatus", (F.col("cents") + 10000).alias("cents"))
        .withColumn("op", F.lit("U"))
    )
    inserts = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            (-F.col("o_orderkey")).alias("o_orderkey"), "o_orderstatus", "cents"
        )
        .withColumn("op", F.lit("I"))
    )
    deletes = (
        base.filter((F.col("o_orderkey") % 11 == 0) & (F.col("o_orderkey") % 5 != 0))
        .select("o_orderkey", "o_orderstatus", "cents")
        .withColumn("op", F.lit("D"))
    )
    changes = updates.unionByName(inserts).unionByName(deletes)
    merged = base.alias("b").join(
        changes.alias("c"), F.col("b.o_orderkey") == F.col("c.o_orderkey"), "full_outer"
    )
    final = merged.filter(
        (F.col("c.op").isNull()) | (F.col("c.op") != "D")
    ).select(
        F.coalesce(F.col("c.o_orderkey"), F.col("b.o_orderkey")).alias("k"),
        F.coalesce(F.col("c.o_orderstatus"), F.col("b.o_orderstatus")).alias(
            "o_orderstatus"
        ),
        F.coalesce(F.col("c.cents"), F.col("b.cents")).alias("cents"),
        F.col("c.op").alias("op"),
    )
    report = final.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_after"),
        F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).cast("long").alias(
            "n_inserted"
        ),
        F.sum(F.when(F.col("op") == "U", 1).otherwise(0)).cast("long").alias(
            "n_updated"
        ),
        F.sum("cents").cast("long").alias("cents_after"),
    )
    before = base.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_before"),
        F.sum(
            F.when(
                (F.col("o_orderkey") % 11 == 0) & (F.col("o_orderkey") % 5 != 0), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_deleted"),
    )
    return (
        before.join(report, "o_orderstatus", "full_outer")
        .na.fill(
            0,
            [
                "n_before",
                "n_deleted",
                "n_after",
                "n_inserted",
                "n_updated",
                "cents_after",
            ],
        )
        .select(
            "o_orderstatus", "n_before", "n_inserted", "n_updated", "n_deleted",
            "n_after", "cents_after",
        )
        .orderBy("o_orderstatus")
    )


CDC_MERGE_SQL = """
WITH o AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders
),
base AS (SELECT * FROM o WHERE o_orderkey % 7 <> 0),
updates AS (
  SELECT o_orderkey, o_orderstatus, cents + 10000 AS cents, 'U' AS op
  FROM base WHERE o_orderkey % 5 = 0
),
inserts AS (
  SELECT -o_orderkey AS o_orderkey, o_orderstatus, cents, 'I' AS op
  FROM o WHERE o_orderkey % 7 = 0
),
deletes AS (
  SELECT o_orderkey, o_orderstatus, cents, 'D' AS op
  FROM base WHERE o_orderkey % 11 = 0 AND o_orderkey % 5 <> 0
),
changes AS (
  SELECT * FROM updates UNION ALL SELECT * FROM inserts
  UNION ALL SELECT * FROM deletes
),
final AS (
  SELECT coalesce(c.o_orderkey, b.o_orderkey) AS k,
         coalesce(c.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
         coalesce(c.cents, b.cents) AS cents,
         c.op
  FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
  WHERE c.op IS NULL OR c.op <> 'D'
),
report AS (
  SELECT o_orderstatus,
         CAST(count(*) AS BIGINT) AS n_after,
         CAST(sum(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted,
         CAST(sum(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
         CAST(sum(cents) AS BIGINT) AS cents_after
  FROM final GROUP BY o_orderstatus
),
before AS (
  SELECT o_orderstatus,
         CAST(count(*) AS BIGINT) AS n_before,
         CAST(sum(CASE WHEN o_orderkey % 11 = 0 AND o_orderkey % 5 <> 0
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted
  FROM base GROUP BY o_orderstatus
)
SELECT coalesce(b.o_orderstatus, r.o_orderstatus) AS o_orderstatus,
       coalesce(n_before, 0) AS n_before,
       coalesce(n_inserted, 0) AS n_inserted,
       coalesce(n_updated, 0) AS n_updated,
       coalesce(n_deleted, 0) AS n_deleted,
       coalesce(n_after, 0) AS n_after,
       coalesce(cents_after, 0) AS cents_after
FROM before b FULL OUTER JOIN report r ON b.o_orderstatus = r.o_orderstatus
ORDER BY o_orderstatus
"""


SPARK_QUERIES = {
    "cdc_merge_apply": cdc_merge_apply,
    "join_view_maintenance": join_view_maintenance,
    "incremental_agg_maintenance": incremental_agg_maintenance,
    "snapshot_table_diff": snapshot_table_diff,
    "pareto_frontier_parts": pareto_frontier_parts,
}

ORACLE_SQL = {
    "cdc_merge_apply": CDC_MERGE_SQL,
    "join_view_maintenance": JOIN_VIEW_SQL,
    "incremental_agg_maintenance": INCREMENTAL_AGG_SQL,
    "snapshot_table_diff": SNAPSHOT_DIFF_SQL,
    "pareto_frontier_parts": PARETO_SQL,
}
