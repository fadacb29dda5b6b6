"""Item co-occurrence and item-item Jaccard similarity over the click
stream — the market-basket / collaborative-filtering half of the graph
surface (``operators/graph.py`` holds the iterative-propagation half).

The reference has no graph or recommendation surface (SURVEY.md §2.5);
this extends the engine the same way ``dedup``/``similarity`` do: a
training-data-curation operator family the driver's ``events`` table
supports (items ride in the ``props`` JSON payload, as in
``pagerank_click_graph``).

Scale design — the classic co-occurrence blow-up is quadratic in the
per-user basket size, so:

* Baskets are DISTINCT (user, item) pairs, then **capped per user** at
  ``USER_ITEM_CAP`` by a deterministic ``row_number`` (ordered by item
  id) — a whale user with 10^5 clicked items would otherwise emit
  10^10 pairs.  The cap is a no-op at test SF but is the load-bearing
  guard at 100 TB, and the oracle SQL applies the identical cap so the
  gate checks the capped semantics.
* Pair generation is an **equi-join on user_id** — never a cross join;
  the basket relation is hash-partitioned once and reused by both join
  sides (self-join on the shuffle key) and the window cap.
* Top-k is `ORDER BY ... LIMIT` → Spark plans `TakeOrderedAndProject`
  (per-partition heaps + single merge, no global sort).
* Jaccard denominators come from per-item distinct-user degrees —
  |items| rows, broadcast onto the co-occurrence counts.
* All ordering keys are exact: counts are integers, and Jaccard is
  ordered by its pround-9 value with (i1, i2) tiebreaks, so Spark and
  DuckDB agree on the boundary rows of the limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.cachescope import scoped_cache
from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.functions.portable import pround, pround_sql, json_long

USER_ITEM_CAP = 1000
TOP_N = 25
#: minimum co-click support for a pair to get a similarity score —
#: singleton co-occurrences are noise and would dominate the Jaccard
#: top-k with tiny-degree items.
MIN_SUPPORT = 3


def _user_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (user, item) click baskets, deterministically capped at
    ``USER_ITEM_CAP`` items per user."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    # ONE exchange for the whole prep chain (guide §2.4): hash-
    # partitioning on user_id satisfies the clustered distribution of
    # BOTH the (user_id, item) distinct (subset of the grouping keys)
    # and the per-user cap window, so distinct and window add no
    # further shuffle — previously each introduced its own.  The
    # repartition also spreads the JSON extraction off the
    # single-row-group scan (catalog.spread_scan rationale).  Width is
    # a QUARTER of default parallelism (floor 8), not full parallelism:
    # this persisted base feeds ITERATIVE consumers (k-core peel
    # rounds, LPA, triangle joins) whose per-stage task overhead scales
    # with the cached partition count — A/B at matched regime: 8-wide
    # beats both no-repartition AND 32-wide on every family member at
    # local[32] (OPTIMIZATION_r12.md), and deriving the width from the
    # session keeps it growing with a real cluster instead of pinning
    # the basket base to 8 partitions at 100 TB.
    width = max(8, spark.sparkContext.defaultParallelism // 4)
    basket = (
        e.select(
            "user_id",
            json_long().alias("item"),
        )
        .filter(F.col("item").isNotNull())
        .repartition(width, "user_id")
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("item")
    return (
        basket.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= USER_ITEM_CAP)
        .drop("rn")
        # both join sides of the pair expansion (and, for Jaccard, the
        # two degree lookups) consume this relation — persist so the
        # distinct+cap pipeline runs once, not 2-4×
        .persist()
    )


def _co_counts(ui: DataFrame) -> DataFrame:
    a = ui.select("user_id", F.col("item").alias("i1"))
    b = ui.select("user_id", F.col("item").alias("i2"))
    return (
        a.join(b, "user_id")
        .filter(F.col("i1") < F.col("i2"))
        .groupBy("i1", "i2")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def item_cooccurrence_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TOP_N`` item pairs by number of distinct users who clicked
    both (market-basket co-occurrence)."""
    ui = _user_items(spark, sf_dir)
    out = (
        _co_counts(ui)
        .orderBy(F.desc("n_users"), F.asc("i1"), F.asc("i2"))
        .limit(TOP_N)
    )
    return scoped_cache(out, ui)


def item_jaccard_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TOP_N`` item pairs by Jaccard similarity of their user
    sets: |U1 ∩ U2| / |U1 ∪ U2|, support ≥ ``MIN_SUPPORT``."""
    ui = _user_items(spark, sf_dir)
    co = _co_counts(ui).filter(F.col("n_users") >= MIN_SUPPORT)
    deg = ui.groupBy("item").agg(F.count(F.lit(1)).alias("deg"))
    d1 = deg.select(F.col("item").alias("i1"), F.col("deg").alias("deg1"))
    d2 = deg.select(F.col("item").alias("i2"), F.col("deg").alias("deg2"))
    scored = (
        co.join(F.broadcast(d1), "i1")
        .join(F.broadcast(d2), "i2")
        .select(
            "i1",
            "i2",
            F.col("n_users").alias("co_users"),
            pround(
                F.col("n_users")
                / (F.col("deg1") + F.col("deg2") - F.col("n_users")),
                9,
            ).alias("jaccard"),
        )
    )
    return scoped_cache(
        scored.orderBy(F.desc("jaccard"), F.asc("i1"), F.asc("i2")).limit(TOP_N),
        ui,
    )


_BASKET_SQL = f"""
clicked AS (
  SELECT DISTINCT user_id, TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) AS item
  FROM events
  WHERE event_type = 'click' AND TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) IS NOT NULL
),
capped AS (
  SELECT user_id, item FROM (
    SELECT user_id, item,
           row_number() OVER (PARTITION BY user_id ORDER BY item) AS rn
    FROM clicked
  ) WHERE rn <= {USER_ITEM_CAP}
),
co AS (
  SELECT a.item AS i1, b.item AS i2, count(*) AS n_users
  FROM capped a
  JOIN capped b ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY a.item, b.item
)"""


COOCCUR_SQL = f"""
WITH {_BASKET_SQL}
SELECT i1, i2, n_users FROM co
ORDER BY n_users DESC, i1 ASC, i2 ASC
LIMIT {TOP_N}
"""


JACCARD_SQL = f"""
WITH {_BASKET_SQL},
deg AS (SELECT item, count(*) AS deg FROM capped GROUP BY item)
SELECT c.i1, c.i2, c.n_users AS co_users,
       {pround_sql('c.n_users * 1.0 / (d1.deg + d2.deg - c.n_users)', 9)} AS jaccard
FROM co c
JOIN deg d1 ON d1.item = c.i1
JOIN deg d2 ON d2.item = c.i2
WHERE c.n_users >= {MIN_SUPPORT}
ORDER BY jaccard DESC, c.i1 ASC, c.i2 ASC
LIMIT {TOP_N}
"""


#: minimum co-click support for an edge of the triangle-count graph —
#: stronger than ``MIN_SUPPORT`` because triangles compound noise: one
#: spurious edge can close many spurious triangles.
TRI_MIN_SUPPORT = 5


def _oriented_triangles(ui: DataFrame):
    """Shared Suri–Vassilvitskii triangle relations over the co-click
    backbone: ``(und, deg, oriented, tri)`` — the support-filtered
    undirected edge list (persisted: consumed by orientation and both
    degree lookups), per-item degree, the degree-oriented edge list
    (persisted: wedge + closure joins), and the closed triangles, one
    row per triangle at its unique low-degree apex.  Used by
    :func:`item_triangle_count` (per-item participation) and
    :func:`clustering_coefficient_bands` (transitivity panel) so the
    orientation recipe cannot drift between them."""
    und = (
        _co_counts(ui)
        .filter(F.col("n_users") >= TRI_MIN_SUPPORT)
        .select("i1", "i2")
        .persist()
    )
    deg = (
        und.select(F.col("i1").alias("item"))
        .unionAll(und.select(F.col("i2").alias("item")))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    d1 = deg.select(F.col("item").alias("i1"), F.col("deg").alias("deg1"))
    d2 = deg.select(F.col("item").alias("i2"), F.col("deg").alias("deg2"))
    lo_first = (F.col("deg1") < F.col("deg2")) | (
        (F.col("deg1") == F.col("deg2")) & (F.col("i1") < F.col("i2"))
    )
    oriented = (
        und.join(F.broadcast(d1), "i1")
        .join(F.broadcast(d2), "i2")
        .select(
            F.when(lo_first, F.col("i1")).otherwise(F.col("i2")).alias("src"),
            F.when(lo_first, F.col("i2")).otherwise(F.col("i1")).alias("dst"),
            F.when(lo_first, F.col("deg2")).otherwise(F.col("deg1")).alias("ddeg"),
        )
        .persist()
    )
    a = oriented.select("src", F.col("dst").alias("b"), F.col("ddeg").alias("bdeg"))
    b = oriented.select("src", F.col("dst").alias("c"), F.col("ddeg").alias("cdeg"))
    wedges = a.join(b, "src").filter(
        (F.col("bdeg") < F.col("cdeg"))
        | ((F.col("bdeg") == F.col("cdeg")) & (F.col("b") < F.col("c")))
    )
    closer = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = wedges.join(closer, ["b", "c"]).select("src", "b", "c")
    return und, deg, oriented, tri


def item_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-item triangle participation on the item co-click graph
    (edges = item pairs with ≥ ``TRI_MIN_SUPPORT`` co-clicking users),
    top ``TOP_N`` items — the clustering-structure diagnostic
    (community density, link-spam detection) over the same graph
    PageRank ranks.

    Scale: the classic MapReduce triangle algorithm (Suri &
    Vassilvitskii 2011) — orient every edge from its lower-(degree,
    id) endpoint to the higher one, enumerate wedges only at each
    node's oriented out-neighbors, and close them against the oriented
    edge list.  Orientation bounds out-degree by O(√E) regardless of
    raw degree skew, so the wedge self-join is O(Σ outdeg²) ≤ O(E^1.5)
    — never the O(Σ deg²) explosion a hub node causes in the naive
    form.  Every triangle is counted exactly once (at its unique apex
    with two oriented out-edges).  The wedge join and the closure join
    both key on oriented edges — one partitioning, reused.
    """
    ui = _user_items(spark, sf_dir)
    und, deg, oriented, tri = _oriented_triangles(ui)
    out = (
        tri.select(F.explode(F.array("src", "b", "c")).alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), F.asc("item"))
        .limit(TOP_N)
    )
    return scoped_cache(out, ui, und, oriented)


TRIANGLE_SQL = f"""
WITH {_BASKET_SQL},
und AS (SELECT i1, i2 FROM co WHERE n_users >= {TRI_MIN_SUPPORT}),
deg AS (
  SELECT item, count(*) AS deg FROM (
    SELECT i1 AS item FROM und UNION ALL SELECT i2 FROM und
  ) GROUP BY item
),
o AS (
  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND i1 < i2)
              THEN i1 ELSE i2 END AS src,
         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND i1 < i2)
              THEN i2 ELSE i1 END AS dst,
         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND i1 < i2)
              THEN d2.deg ELSE d1.deg END AS ddeg
  FROM und
  JOIN deg d1 ON d1.item = und.i1
  JOIN deg d2 ON d2.item = und.i2
),
tri AS (
  SELECT w.src, w.b, w.c
  FROM (
    SELECT x.src, x.dst AS b, y.dst AS c
    FROM o x JOIN o y ON x.src = y.src
    WHERE x.ddeg < y.ddeg OR (x.ddeg = y.ddeg AND x.dst < y.dst)
  ) w
  JOIN o z ON z.src = w.b AND z.dst = w.c
),
part AS (
  SELECT unnest([src, b, c]) AS item FROM tri
)
SELECT item, CAST(count(*) AS BIGINT) AS n_triangles
FROM part
GROUP BY item
ORDER BY n_triangles DESC, item ASC
LIMIT {TOP_N}
"""


#: k-core degree threshold and unrolled peel rounds
K_CORE = 10
KCORE_ROUNDS = 3


def item_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded k-core decomposition of the item co-click graph
    (edges = pairs with ≥ ``TRI_MIN_SUPPORT`` co-clicking users):
    ``KCORE_ROUNDS`` synchronous peeling rounds remove every node whose
    current degree is below ``K_CORE``; the report gives each node's
    initial degree and the round it was peeled (0 = survived all
    rounds — the dense engagement core).  Community-density peeling is
    the standard precursor to spam/bot cluster triage and to sizing
    graph embeddings.

    Scale: each round is one degree aggregation plus two broadcast
    anti-joins against the (shrinking) peel set — the edge list never
    re-shuffles because every round keys on the same endpoints.  Each
    round's degree relation left-joins the SURVIVOR set against the
    surviving-edge endpoint counts (coalesce 0): a node isolated by its
    neighbors' peeling has no edge row left but is still alive at
    degree 0 and must be peeled the following round.  The unroll is
    static (like :func:`~projet_meteo_etl_spark.operators.
    graph.pagerank_click_graph`); full decomposition would loop to a
    fixpoint with ``localCheckpoint`` round truncation, identical
    per-round plan.
    """
    ui = _user_items(spark, sf_dir)
    edges = (
        _co_counts(ui)
        .filter(F.col("n_users") >= TRI_MIN_SUPPORT)
        .select("i1", "i2")
        .persist()
    )
    return _kcore_peel_rounds(edges, extra_cached=[ui])


def _kcore_peel_rounds(
    edges: DataFrame, extra_cached: list[DataFrame] | None = None
) -> DataFrame:
    """Synchronous k-core peeling over an undirected edge list
    (columns ``i1``/``i2``, one row per edge) — factored out so tests
    can drive it with adversarial synthetic graphs (e.g. a node whose
    whole neighborhood peels in round 1).

    Convergence telemetry: every output row carries
    ``n_pending_peel`` — the number of survivors whose post-final-round
    degree is still below ``K_CORE``, i.e. the nodes one more round
    would peel.  0 means the bounded unroll REACHED the fixpoint (the
    report is the true k-core); non-zero tells the consumer exactly
    how far the truncated iteration stopped short instead of silently
    presenting a truncated result as converged."""
    cached = [edges, *(extra_cached or [])]

    def degrees(e: DataFrame) -> DataFrame:
        return (
            e.select(F.col("i1").alias("item"))
            .unionAll(e.select(F.col("i2").alias("item")))
            .groupBy("item")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    d0 = degrees(edges).persist()
    cached.append(d0)
    peeled = []
    cur_deg, cur_edges = d0, edges
    for r in range(1, KCORE_ROUNDS + 1):
        peel = cur_deg.filter(F.col("deg") < K_CORE).select("item")
        peeled.append(
            peel.select("item", F.lit(r).alias("peel_round"))
        )
        survivors = cur_deg.filter(F.col("deg") >= K_CORE).select("item")
        cur_edges = (
            cur_edges.join(
                F.broadcast(peel.withColumnRenamed("item", "i1")), "i1", "left_anti"
            ).join(
                F.broadcast(peel.withColumnRenamed("item", "i2")), "i2", "left_anti"
            )
        ).persist()
        cached.append(cur_edges)
        # degrees come from the SURVIVOR set, not the edge list: a node
        # whose neighbors were all peeled has no surviving edge row, but
        # it is still alive at degree 0 and must be peeled next round.
        # localCheckpoint truncates the round-over-round lineage (the
        # survivor relation references the previous round's degrees, so
        # an un-truncated chain re-evaluates every prior round once per
        # broadcast materialization — 4.5× wall on the sf0.1 graph)
        cur_deg = (
            survivors.join(degrees(cur_edges), "item", "left")
            .select("item", F.coalesce("deg", F.lit(0)).alias("deg"))
            .localCheckpoint()
        )
    rounds = peeled[0]
    for p in peeled[1:]:
        rounds = rounds.unionByName(p)
    # residual: survivors another round would peel (0 ⟺ fixpoint reached)
    pending = cur_deg.agg(
        F.sum(F.when(F.col("deg") < K_CORE, 1).otherwise(0))
        .cast("long")
        .alias("n_pending_peel")
    )
    out = (
        d0.withColumnRenamed("deg", "deg0")
        .join(rounds, "item", "left")
        .crossJoin(F.broadcast(pending))
        .select(
            "item",
            F.col("deg0").cast("long").alias("initial_degree"),
            F.coalesce("peel_round", F.lit(0)).cast("int").alias("peel_round"),
            F.coalesce("n_pending_peel", F.lit(0)).alias("n_pending_peel"),
        )
        .orderBy("item")
    )
    return scoped_cache(out, *cached)


def _kcore_round_sql(r: int) -> str:
    # NOT EXISTS (not NOT IN) per the oracle-portability rule; degrees
    # left-join the survivor set so degree-0 survivors stay peelable
    return f"""
p{r} AS (SELECT item FROM d{r - 1} WHERE deg < {K_CORE}),
s{r} AS (SELECT item FROM d{r - 1} WHERE deg >= {K_CORE}),
e{r} AS (
  SELECT i1, i2 FROM e{r - 1} e
  WHERE NOT EXISTS (SELECT 1 FROM p{r} p WHERE p.item = e.i1)
    AND NOT EXISTS (SELECT 1 FROM p{r} p WHERE p.item = e.i2)
),
d{r} AS (
  SELECT s.item, coalesce(c.deg, 0) AS deg
  FROM s{r} s LEFT JOIN (
    SELECT item, count(*) AS deg FROM (
      SELECT i1 AS item FROM e{r} UNION ALL SELECT i2 FROM e{r}
    ) GROUP BY item
  ) c ON c.item = s.item
)"""


KCORE_SQL = (
    f"""
WITH {_BASKET_SQL},
e0 AS (SELECT i1, i2 FROM co WHERE n_users >= {TRI_MIN_SUPPORT}),
d0 AS (
  SELECT item, count(*) AS deg FROM (
    SELECT i1 AS item FROM e0 UNION ALL SELECT i2 FROM e0
  ) GROUP BY item
),"""
    + ",".join(_kcore_round_sql(r) for r in range(1, KCORE_ROUNDS + 1))
    + f""",
rounds AS (
  {' UNION ALL '.join(f"SELECT item, {r} AS peel_round FROM p{r}" for r in range(1, KCORE_ROUNDS + 1))}
),
pending AS (
  SELECT CAST(coalesce(sum(CASE WHEN deg < {K_CORE} THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_pending_peel
  FROM d{KCORE_ROUNDS}
)
SELECT d0.item,
       CAST(d0.deg AS BIGINT) AS initial_degree,
       CAST(coalesce(rounds.peel_round, 0) AS INTEGER) AS peel_round,
       pending.n_pending_peel
FROM d0 LEFT JOIN rounds ON rounds.item = d0.item
CROSS JOIN pending
ORDER BY d0.item
"""
)


#: k-truss: edges must sit in ≥ K_TRUSS − 2 triangles; peel rounds
K_TRUSS = 4
TRUSS_ROUNDS = 2


def _edge_support(edges: DataFrame) -> DataFrame:
    """(i1, i2, support): triangles per canonical edge, via the same
    degree-oriented wedge closure as :func:`item_triangle_count`
    (out-degree O(√E) under orientation, so the wedge join never
    explodes on hubs); each oriented triangle contributes its three
    edges back in canonical (min, max) form.  Callers pass a
    localCheckpointed edge list, so the 3 consumers of ``oriented``
    re-derive it from a materialized one-partition relation."""
    deg = (
        edges.select(F.col("i1").alias("item"))
        .unionAll(edges.select(F.col("i2").alias("item")))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    d1 = deg.select(F.col("item").alias("i1"), F.col("deg").alias("deg1"))
    d2 = deg.select(F.col("item").alias("i2"), F.col("deg").alias("deg2"))
    lo_first = (F.col("deg1") < F.col("deg2")) | (
        (F.col("deg1") == F.col("deg2")) & (F.col("i1") < F.col("i2"))
    )
    oriented = (
        edges.join(F.broadcast(d1), "i1")
        .join(F.broadcast(d2), "i2")
        .select(
            F.when(lo_first, F.col("i1")).otherwise(F.col("i2")).alias("src"),
            F.when(lo_first, F.col("i2")).otherwise(F.col("i1")).alias("dst"),
            F.when(lo_first, F.col("deg2"))
            .otherwise(F.col("deg1"))
            .alias("ddeg"),
        )
    )
    a = oriented.select(
        "src", F.col("dst").alias("b"), F.col("ddeg").alias("bdeg")
    )
    b = oriented.select(
        "src", F.col("dst").alias("c"), F.col("ddeg").alias("cdeg")
    )
    wedges = a.join(b, "src").filter(
        (F.col("bdeg") < F.col("cdeg"))
        | ((F.col("bdeg") == F.col("cdeg")) & (F.col("b") < F.col("c")))
    )
    closer = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tri = wedges.join(closer, ["b", "c"]).select("src", "b", "c")
    sides = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("src", "b").alias("i1"),
                    F.greatest("src", "b").alias("i2"),
                ),
                F.struct(
                    F.least("src", "c").alias("i1"),
                    F.greatest("src", "c").alias("i2"),
                ),
                F.struct(
                    F.least("b", "c").alias("i1"),
                    F.greatest("b", "c").alias("i2"),
                ),
            )
        ).alias("e")
    ).select("e.i1", "e.i2")
    return sides.groupBy("i1", "i2").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )


def item_ktruss_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded 4-truss peel of the item co-click graph — the
    cohesion filter one level above k-core: an edge survives only if
    it closes ≥ 2 triangles, so bridges and barely-attached spokes
    drop even when their endpoints have high degree.  Completes the
    graph family (PageRank / triangles / k-core / LPA / k-truss).

    The truss graph keeps only edges at or above the P90 co-click
    support (rank-selected on the support rollup — a RELATIVE cut,
    because this item graph is near-complete at every SF and a fixed
    threshold is either vacuous or empty depending on scale; the
    relative cut leaves the top-decile backbone where trusses are
    meaningful).  ``TRUSS_ROUNDS`` = 2 unrolled support-recompute
    rounds (peeling an edge can strand another; the fixpoint would
    loop — same bounded-round convention as LPA and the k-core peel).
    Per round the edge support comes from the degree-oriented wedge
    closure (O(E^1.5) bound, no hub blowup) and the report is the
    round's edge accounting — graph-sized, never corpus-sized.
    """
    ui = _user_items(spark, sf_dir)
    co = _co_counts(ui)
    counts = co.groupBy("n_users").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wcum = Window.orderBy("n_users").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = counts.select(
        "n_users",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).cast("long").alias("n"),
    )
    p90 = cum.filter(F.expr("cum >= (9 * n + 9) DIV 10")).agg(
        F.min("n_users").alias("cut")
    )
    # the truss graph is CATALOG-bounded (≤ |items|² edges regardless
    # of corpus size): localCheckpoint each round's edge list so the
    # wedge/peel rounds run on a one-partition materialized relation
    # instead of re-planning the basket self-join lineage — the same
    # lineage-truncation the KM grid and the k-core peel use
    und = (
        co.crossJoin(F.broadcast(p90))
        .filter(F.col("n_users") >= F.col("cut"))
        .select("i1", "i2")
        .coalesce(1)
        .localCheckpoint(eager=True)
    )
    rounds = []
    cur = und
    for r in range(1, TRUSS_ROUNDS + 1):
        sup = _edge_support(cur)
        kept = (
            cur.join(sup, ["i1", "i2"], "left")
            .filter(
                F.coalesce(F.col("support"), F.lit(0)) >= K_TRUSS - 2
            )
            .select("i1", "i2")
            .coalesce(1)
            .localCheckpoint(eager=True)
        )
        n_in = cur.agg(F.count(F.lit(1)).cast("long").alias("n_edges_in"))
        n_kept = kept.agg(
            F.count(F.lit(1)).cast("long").alias("n_edges_kept")
        )
        # convergence telemetry: a round that drops nothing proves the
        # fixpoint (support can only shrink as edges peel) — so
        # `converged` on the FINAL row tells the consumer whether the
        # bounded unroll truncated a still-moving iteration
        rounds.append(
            n_in.crossJoin(F.broadcast(n_kept)).select(
                F.lit(r).alias("round"),
                "n_edges_in",
                "n_edges_kept",
                (F.col("n_edges_in") == F.col("n_edges_kept")).alias(
                    "converged"
                ),
            )
        )
        cur = kept
    out = rounds[0]
    for x in rounds[1:]:
        out = out.unionByName(x)
    return out.orderBy("round")


KTRUSS_SQL = f"""
WITH {_BASKET_SQL},
supcum AS (
  SELECT n_users,
         sum(cnt) OVER (ORDER BY n_users
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         CAST(sum(cnt) OVER () AS BIGINT) AS n
  FROM (SELECT n_users, CAST(count(*) AS BIGINT) AS cnt
        FROM co GROUP BY n_users)
),
p90 AS (SELECT min(n_users) AS cut FROM supcum WHERE cum >= (9 * n + 9) // 10),
und0 AS (SELECT i1, i2 FROM co, p90 WHERE n_users >= cut),
tri1 AS (
  SELECT e1.i1 AS a, e1.i2 AS b, e2.i2 AS c
  FROM und0 e1
  JOIN und0 e2 ON e2.i1 = e1.i2
  JOIN und0 e3 ON e3.i1 = e1.i1 AND e3.i2 = e2.i2
),
sup1 AS (
  SELECT i1, i2, CAST(count(*) AS BIGINT) AS support FROM (
    SELECT a AS i1, b AS i2 FROM tri1
    UNION ALL SELECT a, c FROM tri1
    UNION ALL SELECT b, c FROM tri1
  ) GROUP BY 1, 2
),
und1 AS (
  SELECT u.i1, u.i2 FROM und0 u
  LEFT JOIN sup1 s ON s.i1 = u.i1 AND s.i2 = u.i2
  WHERE coalesce(s.support, 0) >= {K_TRUSS - 2}
),
tri2 AS (
  SELECT e1.i1 AS a, e1.i2 AS b, e2.i2 AS c
  FROM und1 e1
  JOIN und1 e2 ON e2.i1 = e1.i2
  JOIN und1 e3 ON e3.i1 = e1.i1 AND e3.i2 = e2.i2
),
sup2 AS (
  SELECT i1, i2, CAST(count(*) AS BIGINT) AS support FROM (
    SELECT a AS i1, b AS i2 FROM tri2
    UNION ALL SELECT a, c FROM tri2
    UNION ALL SELECT b, c FROM tri2
  ) GROUP BY 1, 2
),
und2 AS (
  SELECT u.i1, u.i2 FROM und1 u
  LEFT JOIN sup2 s ON s.i1 = u.i1 AND s.i2 = u.i2
  WHERE coalesce(s.support, 0) >= {K_TRUSS - 2}
)
SELECT 1 AS round,
       (SELECT CAST(count(*) AS BIGINT) FROM und0) AS n_edges_in,
       (SELECT CAST(count(*) AS BIGINT) FROM und1) AS n_edges_kept,
       (SELECT count(*) FROM und0) = (SELECT count(*) FROM und1)
         AS converged
UNION ALL
SELECT 2,
       (SELECT CAST(count(*) AS BIGINT) FROM und1),
       (SELECT CAST(count(*) AS BIGINT) FROM und2),
       (SELECT count(*) FROM und1) = (SELECT count(*) FROM und2)
ORDER BY round
"""


def association_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TOP_N`` directional association rules (ant → cons) over
    the click baskets, by LIFT — the classic market-basket readout
    (Agrawal & Srikant 1994) that :func:`item_cooccurrence_topk` stops
    short of: co-count is symmetric popularity, confidence and lift
    are the directional "does clicking ant PREDICT clicking cons"
    metrics a recommender actually ranks by.

    Exact-integer metrics: ``confidence_ppm = n_co·1e6 DIV n_ant`` and
    ``lift_ppm = n_co·n_users·1e6 DIV (n_ant·n_cons)``, the numerator
    widened to DECIMAL(38,0)/HUGEINT before the multiply (n_co·n_users
    ·1e6 clears BIGINT at ~100× corpus — the ``mann_whitney`` overflow
    discipline).  Support floor ``MIN_SUPPORT`` keeps singleton
    co-occurrences from minting infinite-lift noise rules.

    Scale: one undirected pair rollup (the shared ``_co_counts``
    self-join, per-user baskets capped at ``USER_ITEM_CAP`` so the
    pair expansion is Σcap² not Σbasket²), mirrored into the two rule
    directions map-side; degree lookups broadcast onto the pair table.
    """
    ui = _user_items(spark, sf_dir)
    n_users = ui.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("n_users")
    )
    deg = ui.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    co = _co_counts(ui).filter(F.col("n_users") >= MIN_SUPPORT)
    directed = co.selectExpr(
        "i1 AS ant", "i2 AS cons", "n_users AS n_co"
    ).unionByName(
        co.selectExpr("i2 AS ant", "i1 AS cons", "n_users AS n_co")
    )
    out = (
        directed.join(
            F.broadcast(deg.selectExpr("item AS ant", "n_item AS n_ant")),
            "ant",
        )
        .join(
            F.broadcast(deg.selectExpr("item AS cons", "n_item AS n_cons")),
            "cons",
        )
        .crossJoin(F.broadcast(n_users.selectExpr("n_users AS n_total")))
        .select(
            "ant",
            "cons",
            "n_co",
            "n_ant",
            "n_cons",
            F.expr(
                "CAST(CAST(n_co AS DECIMAL(38,0)) * 1000000 DIV n_ant"
                " AS BIGINT)"
            ).alias("confidence_ppm"),
            F.expr(
                "CAST(CAST(n_co AS DECIMAL(38,0)) * n_total * 1000000"
                " DIV (CAST(n_ant AS DECIMAL(38,0)) * n_cons) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), F.asc("ant"), F.asc("cons"))
        .limit(TOP_N)
    )
    return scoped_cache(out, ui)


ASSOC_RULES_SQL = f"""
WITH {_BASKET_SQL},
users AS (SELECT count(DISTINCT user_id) AS n_total FROM capped),
deg AS (SELECT item, count(*) AS n_item FROM capped GROUP BY item),
directed AS (
  SELECT i1 AS ant, i2 AS cons, n_users AS n_co FROM co
  WHERE n_users >= {MIN_SUPPORT}
  UNION ALL
  SELECT i2 AS ant, i1 AS cons, n_users AS n_co FROM co
  WHERE n_users >= {MIN_SUPPORT}
)
SELECT d.ant, d.cons, CAST(d.n_co AS BIGINT) AS n_co,
       CAST(a.n_item AS BIGINT) AS n_ant,
       CAST(c.n_item AS BIGINT) AS n_cons,
       CAST(CAST(d.n_co AS HUGEINT) * 1000000 // a.n_item AS BIGINT)
         AS confidence_ppm,
       CAST(CAST(d.n_co AS HUGEINT) * u.n_total * 1000000
            // (CAST(a.n_item AS HUGEINT) * c.n_item) AS BIGINT)
         AS lift_ppm
FROM directed d
JOIN deg a ON a.item = d.ant
JOIN deg c ON c.item = d.cons
CROSS JOIN users u
ORDER BY lift_ppm DESC, ant ASC, cons ASC
LIMIT {TOP_N}
"""


#: minimum support for the 3-itemset lattice (items AND pairs AND
#: triples): Apriori's downward closure means a triple can only reach
#: this floor if all three of its pairs do — which is exactly the
#: candidate pruning the plan exploits
TRIPLE3_MIN_SUPPORT = 2


def frequent_triples_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TOP_N`` directional association rules over the 3-itemset
    lattice — ``{a,b} → c`` by lift — extending
    :func:`association_rules_lift` (which stops at 2-itemsets) the
    Apriori way (Agrawal & Srikant 1994): a pair-antecedent rule is
    what "customers who bought BOTH a and b also bought c" actually
    asks, and the 2-item rules cannot express it.

    **Apriori pruning is the scale story** — the naive per-user triple
    expansion is Σcap³ (1000× the pair expansion this module already
    bounds): instead (1) only FREQUENT pairs (support ≥
    ``TRIPLE3_MIN_SUPPORT``, downward closure) expand per user, via a
    semi-join of the per-user pair relation against the frequent-pair
    table; (2) the third item joins only where BOTH closing pairs
    (a,c) and (b,c) are frequent — so every candidate counted has all
    three sub-pairs frequent, and the expansion is bounded by the
    frequent-pair lattice, not the basket width.  Baskets stay capped
    at ``USER_ITEM_CAP`` like every consumer of ``_user_items``.

    Exact-integer metrics (the 2-itemset discipline):
    ``confidence_ppm = n_triple·1e6 DIV n_ant_pair`` and ``lift_ppm =
    n_triple·n_users·1e6 DIV (n_ant_pair·n_cons)``, DECIMAL(38,0)/
    HUGEINT-widened.  Each frequent triple emits its 3 pair→item
    rules; deterministic (lift DESC, ant1, ant2, cons) order.
    """
    ui = _user_items(spark, sf_dir)
    co = _co_counts(ui)
    fp = co.filter(F.col("n_users") >= TRIPLE3_MIN_SUPPORT).persist()
    # per-user pairs, pruned to frequent pairs before any extension
    a = ui.select("user_id", F.col("item").alias("i1"))
    b = ui.select("user_id", F.col("item").alias("i2"))
    up = (
        a.join(b, "user_id")
        .filter(F.col("i1") < F.col("i2"))
        .join(fp.select("i1", "i2"), ["i1", "i2"], "left_semi")
    )
    c = ui.select("user_id", F.col("item").alias("i3"))
    ut = (
        up.join(c, "user_id")
        .filter(F.col("i3") > F.col("i2"))
        .join(
            fp.selectExpr("i1 AS i2", "i2 AS i3").select("i2", "i3"),
            ["i2", "i3"],
            "left_semi",
        )
        .join(
            fp.selectExpr("i1", "i2 AS i3").select("i1", "i3"),
            ["i1", "i3"],
            "left_semi",
        )
    )
    tr = (
        ut.groupBy("i1", "i2", "i3")
        .agg(F.count(F.lit(1)).alias("n_triple"))
        .filter(F.col("n_triple") >= TRIPLE3_MIN_SUPPORT)
    )
    rules = (
        tr.selectExpr("i1 AS ant1", "i2 AS ant2", "i3 AS cons", "n_triple")
        .unionByName(
            tr.selectExpr(
                "i1 AS ant1", "i3 AS ant2", "i2 AS cons", "n_triple"
            )
        )
        .unionByName(
            tr.selectExpr(
                "i2 AS ant1", "i3 AS ant2", "i1 AS cons", "n_triple"
            )
        )
    )
    n_users = ui.select("user_id").distinct().agg(
        F.count(F.lit(1)).alias("n_total")
    )
    deg = ui.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    out = (
        rules.join(
            fp.selectExpr("i1 AS ant1", "i2 AS ant2", "n_users AS n_ant"),
            ["ant1", "ant2"],
        )
        .join(
            F.broadcast(
                deg.selectExpr("item AS cons", "n_item AS n_cons")
            ),
            "cons",
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "ant1",
            "ant2",
            "cons",
            "n_triple",
            "n_ant",
            "n_cons",
            F.expr(
                "CAST(CAST(n_triple AS DECIMAL(38,0)) * 1000000"
                " DIV n_ant AS BIGINT)"
            ).alias("confidence_ppm"),
            F.expr(
                "CAST(CAST(n_triple AS DECIMAL(38,0)) * n_total * 1000000"
                " DIV (CAST(n_ant AS DECIMAL(38,0)) * n_cons) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(
            F.desc("lift_ppm"), F.asc("ant1"), F.asc("ant2"), F.asc("cons")
        )
        .limit(TOP_N)
    )
    return scoped_cache(out, ui, fp)


FREQ_TRIPLES_SQL = f"""
WITH {_BASKET_SQL},
fp AS (SELECT i1, i2, n_users FROM co
       WHERE n_users >= {TRIPLE3_MIN_SUPPORT}),
up AS (
  SELECT a.user_id, a.item AS i1, b.item AS i2
  FROM capped a
  JOIN capped b ON a.user_id = b.user_id AND a.item < b.item
  JOIN fp ON fp.i1 = a.item AND fp.i2 = b.item
),
ut AS (
  SELECT up.i1, up.i2, c.item AS i3
  FROM up
  JOIN capped c ON c.user_id = up.user_id AND c.item > up.i2
  JOIN fp f23 ON f23.i1 = up.i2 AND f23.i2 = c.item
  JOIN fp f13 ON f13.i1 = up.i1 AND f13.i2 = c.item
),
tr AS (
  SELECT i1, i2, i3, count(*) AS n_triple
  FROM ut GROUP BY i1, i2, i3
  HAVING count(*) >= {TRIPLE3_MIN_SUPPORT}
),
users AS (SELECT count(DISTINCT user_id) AS n_total FROM capped),
deg AS (SELECT item, count(*) AS n_item FROM capped GROUP BY item),
rules AS (
  SELECT i1 AS ant1, i2 AS ant2, i3 AS cons, n_triple FROM tr
  UNION ALL
  SELECT i1 AS ant1, i3 AS ant2, i2 AS cons, n_triple FROM tr
  UNION ALL
  SELECT i2 AS ant1, i3 AS ant2, i1 AS cons, n_triple FROM tr
)
SELECT r.ant1, r.ant2, r.cons,
       CAST(r.n_triple AS BIGINT) AS n_triple,
       CAST(p.n_users AS BIGINT) AS n_ant,
       CAST(d.n_item AS BIGINT) AS n_cons,
       CAST(CAST(r.n_triple AS HUGEINT) * 1000000 // p.n_users AS BIGINT)
         AS confidence_ppm,
       CAST(CAST(r.n_triple AS HUGEINT) * u.n_total * 1000000
            // (CAST(p.n_users AS HUGEINT) * d.n_item) AS BIGINT)
         AS lift_ppm
FROM rules r
JOIN fp p ON p.i1 = r.ant1 AND p.i2 = r.ant2
JOIN deg d ON d.item = r.cons
CROSS JOIN users u
ORDER BY lift_ppm DESC, ant1 ASC, ant2 ASC, cons ASC
LIMIT {TOP_N}
"""


#: recommendation list width for the beyond-accuracy panel
REC_K = 5


def rec_list_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beyond-accuracy evaluation of an item-item CF recommender —
    catalog COVERAGE, intra-list DIVERSITY, and POPULARITY BIAS — the
    three list-quality dimensions the accuracy evals
    (``ndcg_at_k_eval`` / ``mrr_hit_rate_eval``) do not grade, and the
    standard reason a high-nDCG recommender still ships badly (it
    recommends the same head items to everyone).

    The recommender is the deterministic co-click CF: each user's
    candidate score is the summed co-click support between the
    candidate and the user's basket (already-clicked items excluded),
    top-``REC_K`` per user (score DESC, item ASC).  Metrics, all exact
    integer ppm:

    * coverage = distinct recommended items / catalog;
    * popularity lift = mean degree of recommended instances over the
      catalog mean degree (DECIMAL-widened cross-multiplication);
    * intra-list diversity = mean pairwise (1 − Jaccard) inside each
      user's list — pairs are k²-bounded per user, Jaccard from the
      shared co/degree rollups, never from user sets.

    Scale: baskets capped (``USER_ITEM_CAP``), the scoring join runs
    basket × support-floored co-pair fan-out (the same bound as the
    pair miner), and every downstream relation is users×k or smaller.
    """
    ui = _user_items(spark, sf_dir)
    co = _co_counts(ui).filter(F.col("n_users") >= MIN_SUPPORT).persist()
    sym = co.selectExpr(
        "i1 AS i", "i2 AS cand", "n_users AS w"
    ).unionByName(co.selectExpr("i2 AS i", "i1 AS cand", "n_users AS w"))
    scored = (
        ui.selectExpr("user_id", "item AS i")
        .join(sym, "i")
        .groupBy("user_id", "cand")
        .agg(F.sum("w").alias("score"))
        .join(
            ui.selectExpr("user_id", "item AS cand"),
            ["user_id", "cand"],
            "left_anti",
        )
    )
    w_r = Window.partitionBy("user_id").orderBy(
        F.desc("score"), F.asc("cand")
    )
    top = (
        scored.withColumn("rk", F.row_number().over(w_r))
        .filter(F.col("rk") <= REC_K)
        .select("user_id", "cand")
        .persist()
    )
    deg = ui.groupBy("item").agg(F.count(F.lit(1)).alias("deg"))
    cat = deg.agg(
        F.count(F.lit(1)).alias("catalog_n"),
        F.sum("deg").alias("deg_cat"),
    )
    recagg = (
        top.join(
            F.broadcast(deg.selectExpr("item AS cand", "deg")), "cand"
        )
        .agg(
            F.count(F.lit(1)).alias("n_rec_rows"),
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("cand").alias("n_rec_distinct"),
            F.sum("deg").alias("deg_rec"),
        )
    )
    # intra-list pairs: k²-bounded self-join per user, Jaccard from the
    # shared rollups (left join — a pair with no frequent co-edge has
    # co = 0, distance 1)
    ta = top.selectExpr("user_id", "cand AS i1")
    tb = top.selectExpr("user_id", "cand AS i2")
    pairs = (
        ta.join(tb, "user_id")
        .filter(F.col("i1") < F.col("i2"))
        .join(co.select("i1", "i2", "n_users"), ["i1", "i2"], "left")
        .join(
            F.broadcast(deg.selectExpr("item AS i1", "deg AS deg1")), "i1"
        )
        .join(
            F.broadcast(deg.selectExpr("item AS i2", "deg AS deg2")), "i2"
        )
        .select(
            F.coalesce("n_users", F.lit(0)).alias("co"),
            "deg1",
            "deg2",
        )
    )
    ild = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        # coalesce: zero pairs (every user got a 1-item list) must read
        # as distance 0, like the oracle's coalesce — not NULL
        F.coalesce(
            F.sum(
                F.expr(
                    "1000000 - CAST(co * 1000000"
                    " DIV (deg1 + deg2 - co) AS BIGINT)"
                )
            ),
            F.lit(0),
        ).alias("dist_sum"),
    )
    out = (
        recagg.crossJoin(F.broadcast(cat))
        .crossJoin(F.broadcast(ild))
        .select(
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_rec_rows").cast("long").alias("n_rec_rows"),
            F.col("n_rec_distinct").cast("long").alias("n_rec_distinct"),
            F.col("catalog_n").cast("long").alias("catalog_n"),
            F.expr(
                "CAST(n_rec_distinct * 1000000 DIV catalog_n AS BIGINT)"
            ).alias("coverage_ppm"),
            F.expr(
                "CAST(CAST(deg_rec AS DECIMAL(38,0)) * catalog_n"
                " * 1000000 DIV (CAST(n_rec_rows AS DECIMAL(38,0))"
                " * deg_cat) AS BIGINT)"
            ).alias("pop_lift_ppm"),
            F.expr(
                "CAST(dist_sum DIV greatest(n_pairs, 1) AS BIGINT)"
            ).alias("ild_ppm"),
        )
    )
    return scoped_cache(out, ui, co, top)


REC_QUALITY_SQL = f"""
WITH {_BASKET_SQL},
fco AS (SELECT i1, i2, n_users FROM co WHERE n_users >= {MIN_SUPPORT}),
sym AS (
  SELECT i1 AS i, i2 AS cand, n_users AS w FROM fco
  UNION ALL
  SELECT i2 AS i, i1 AS cand, n_users AS w FROM fco
),
scored AS (
  SELECT c.user_id, s.cand, sum(s.w) AS score
  FROM capped c JOIN sym s ON s.i = c.item
  GROUP BY c.user_id, s.cand
),
fresh AS (
  SELECT sc.user_id, sc.cand, sc.score
  FROM scored sc
  WHERE NOT EXISTS (
    SELECT 1 FROM capped c2
    WHERE c2.user_id = sc.user_id AND c2.item = sc.cand
  )
),
top AS (
  SELECT user_id, cand FROM (
    SELECT user_id, cand,
           row_number() OVER (
             PARTITION BY user_id ORDER BY score DESC, cand ASC) AS rk
    FROM fresh
  ) WHERE rk <= {REC_K}
),
deg AS (SELECT item, count(*) AS deg FROM capped GROUP BY item),
cat AS (
  SELECT CAST(count(*) AS HUGEINT) AS catalog_n,
         CAST(sum(deg) AS HUGEINT) AS deg_cat
  FROM deg
),
recagg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rec_rows,
         CAST(count(DISTINCT t.user_id) AS BIGINT) AS n_users,
         CAST(count(DISTINCT t.cand) AS BIGINT) AS n_rec_distinct,
         CAST(sum(d.deg) AS HUGEINT) AS deg_rec
  FROM top t JOIN deg d ON d.item = t.cand
),
pairs AS (
  SELECT coalesce(f.n_users, 0) AS co, d1.deg AS deg1, d2.deg AS deg2
  FROM top a
  JOIN top b ON b.user_id = a.user_id AND a.cand < b.cand
  LEFT JOIN fco f ON f.i1 = a.cand AND f.i2 = b.cand
  JOIN deg d1 ON d1.item = a.cand
  JOIN deg d2 ON d2.item = b.cand
),
ild AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(coalesce(sum(1000000
               - CAST(co * 1000000 // (deg1 + deg2 - co) AS BIGINT)), 0)
           AS BIGINT) AS dist_sum
  FROM pairs
)
SELECT n_users, n_rec_rows, n_rec_distinct,
       CAST(catalog_n AS BIGINT) AS catalog_n,
       CAST(n_rec_distinct * 1000000 // catalog_n AS BIGINT)
         AS coverage_ppm,
       CAST(deg_rec * catalog_n * 1000000
            // (CAST(n_rec_rows AS HUGEINT) * deg_cat) AS BIGINT)
         AS pop_lift_ppm,
       CAST(dist_sum // greatest(n_pairs, 1) AS BIGINT) AS ild_ppm
FROM recagg, cat, ild
"""


#: resource-allocation contributions come only from DISCRIMINATIVE
#: items: an item clicked by more users than this cap contributes
#: ≤ 1e6/cap ≈ noise per pair anyway, and excluding it bounds the
#: self-join fan-out at cap² rows per item (the containment/LSH df-cap
#: discipline) — the cap is part of the operator's semantics and is
#: mirrored verbatim in the oracle.
RA_DEG_CAP = 64


def link_prediction_ra_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TOP_N`` USER pairs by the resource-allocation index (Zhou
    et al. 2009) over shared clicked items: RA(u1,u2) = Σ_{shared item
    z} 1/deg(z) — the inverse-frequency cousin of common-neighbor link
    prediction, where sharing a RARE item says far more than sharing a
    blockbuster.  Complements :func:`item_jaccard_similarity` (item
    side, set overlap) with the user side and popularity weighting.

    Exact integers: each shared item contributes ``1_000_000 DIV
    deg``; the score is an integer sum (order-independent) in micro
    units.  Scale: contributions flow only through items with deg ≤
    ``RA_DEG_CAP`` (see the cap note above), so the item self-join
    fans out at most cap² per item — Σdf² stays linear in the item
    count, never |users|².
    """
    ui = _user_items(spark, sf_dir)
    deg = ui.groupBy("item").agg(F.count(F.lit(1)).alias("deg"))
    rare = (
        ui.join(
            F.broadcast(deg.filter(F.col("deg") <= RA_DEG_CAP)), "item"
        )
        .withColumn("contrib", F.expr("CAST(1000000 DIV deg AS BIGINT)"))
    )
    a = rare.select("item", F.col("user_id").alias("u1"), "contrib")
    b = rare.select("item", F.col("user_id").alias("u2"))
    out = (
        a.join(b, "item")
        .filter(F.col("u1") < F.col("u2"))
        .groupBy("u1", "u2")
        .agg(
            F.sum("contrib").alias("ra_micro"),
            F.count(F.lit(1)).cast("long").alias("n_shared"),
        )
        .orderBy(F.desc("ra_micro"), F.asc("u1"), F.asc("u2"))
        .limit(TOP_N)
    )
    return scoped_cache(out, ui)


RA_INDEX_SQL = f"""
WITH {_BASKET_SQL},
deg AS (SELECT item, count(*) AS deg FROM capped GROUP BY item),
rare AS (
  SELECT c.user_id, c.item, CAST(1000000 // d.deg AS BIGINT) AS contrib
  FROM capped c JOIN deg d ON d.item = c.item
  WHERE d.deg <= {RA_DEG_CAP}
)
SELECT a.user_id AS u1, b.user_id AS u2,
       CAST(sum(a.contrib) AS BIGINT) AS ra_micro,
       CAST(count(*) AS BIGINT) AS n_shared
FROM rare a JOIN rare b ON a.item = b.item AND a.user_id < b.user_id
GROUP BY a.user_id, b.user_id
ORDER BY ra_micro DESC, u1 ASC, u2 ASC
LIMIT {TOP_N}
"""


#: degree bands of the clustering-coefficient panel — the CASE ladder
#: is shared verbatim with the oracle
CC_BANDS = ((2, 3), (4, 7), (8, 15), (16, 31), (32, None))


def _cc_band_case(deg_expr: str) -> str:
    whens = []
    for lo, hi in CC_BANDS:
        label = f"{lo:02d}-{hi:02d}" if hi is not None else f"{lo:02d}+"
        cond = (
            f"{deg_expr} BETWEEN {lo} AND {hi}"
            if hi is not None
            else f"{deg_expr} >= {lo}"
        )
        whens.append(f"WHEN {cond} THEN '{label}'")
    return "CASE " + " ".join(whens) + " END"


def clustering_coefficient_bands(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Transitivity panel of the item co-click backbone (Watts &
    Strogatz 1998): per degree band — and an ``all`` row — the node
    count, triangle participation, wedge count, the WEIGHTED
    clustering coefficient Σ2t_v / Σdeg(deg−1) (the band's
    transitivity; the ``all`` row is the graph's global transitivity
    3·triangles/wedges), and the mean LOCAL coefficient.  The
    structure diagnostic read next to :func:`item_triangle_count`:
    high transitivity at high degree = a dense community core no
    balanced partitioner splits cleanly; low = hub-and-spoke.

    Exact: t_v and deg are integers, every coefficient is one
    DECIMAL(38,0)/HUGEINT-widened ppm division, and the mean local
    coefficient is the integer mean of per-node ppm coefficients.
    Nodes of degree < 2 close no wedge and are excluded (local CC is
    undefined there), which both engines apply identically.

    Scale: reuses the degree-oriented triangle relations
    (out-degree-bounded wedge join, O(E^1.5) worst case); the panel
    itself is a band-count-sized rollup of the |V|-row per-item join.
    """
    ui = _user_items(spark, sf_dir)
    und, deg, oriented, tri = _oriented_triangles(ui)
    t_per = (
        tri.select(F.explode(F.array("src", "b", "c")).alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("t_v"))
    )
    nodes = (
        deg.filter(F.col("deg") >= 2)
        .join(t_per, "item", "left")
        .select(
            "item",
            "deg",
            F.coalesce("t_v", F.lit(0)).alias("t_v"),
            F.expr("deg * (deg - 1)").alias("wedges2"),
        )
        .withColumn(
            "local_cc_ppm",
            F.expr("CAST(2 * t_v * 1000000 DIV (deg * (deg - 1)) AS BIGINT)"),
        )
    )
    band = F.expr(_cc_band_case("deg"))
    rollup = (
        nodes.withColumn("band", band)
        .unionByName(nodes.withColumn("band", F.lit("all")))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.expr("CAST(sum(t_v) AS BIGINT)").alias("tri_slots"),
            F.expr("CAST(sum(wedges2) DIV 2 AS BIGINT)").alias("n_wedges"),
            F.expr(
                "CAST(CAST(sum(2 * t_v) AS DECIMAL(38,0)) * 1000000"
                " DIV sum(wedges2) AS BIGINT)"
            ).alias("transitivity_ppm"),
            F.expr(
                "CAST(sum(local_cc_ppm) DIV count(*) AS BIGINT)"
            ).alias("mean_local_cc_ppm"),
        )
        .orderBy("band")
    )
    return scoped_cache(rollup, ui, und, oriented)


CLUSTERING_COEFF_SQL = f"""
WITH {_BASKET_SQL},
und AS (SELECT i1, i2 FROM co WHERE n_users >= {TRI_MIN_SUPPORT}),
deg AS (
  SELECT item, count(*) AS deg FROM (
    SELECT i1 AS item FROM und UNION ALL SELECT i2 FROM und
  ) GROUP BY item
),
o AS (
  SELECT CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND i1 < i2)
              THEN i1 ELSE i2 END AS src,
         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND i1 < i2)
              THEN i2 ELSE i1 END AS dst,
         CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND i1 < i2)
              THEN d2.deg ELSE d1.deg END AS ddeg
  FROM und
  JOIN deg d1 ON d1.item = und.i1
  JOIN deg d2 ON d2.item = und.i2
),
tri AS (
  SELECT w.src, w.b, w.c
  FROM (
    SELECT x.src, x.dst AS b, y.dst AS c
    FROM o x JOIN o y ON x.src = y.src
    WHERE x.ddeg < y.ddeg OR (x.ddeg = y.ddeg AND x.dst < y.dst)
  ) w
  JOIN o z ON z.src = w.b AND z.dst = w.c
),
t_per AS (
  SELECT item, count(*) AS t_v FROM (
    SELECT unnest([src, b, c]) AS item FROM tri
  ) GROUP BY item
),
nodes AS (
  SELECT d.item, d.deg, coalesce(t.t_v, 0) AS t_v,
         d.deg * (d.deg - 1) AS wedges2,
         CAST(2 * coalesce(t.t_v, 0) * 1000000
              // (d.deg * (d.deg - 1)) AS BIGINT) AS local_cc_ppm
  FROM deg d LEFT JOIN t_per t ON t.item = d.item
  WHERE d.deg >= 2
),
labeled AS (
  SELECT {_cc_band_case('deg')} AS band, * FROM nodes
  UNION ALL
  SELECT 'all' AS band, * FROM nodes
)
SELECT band, CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(t_v) AS BIGINT) AS tri_slots,
       CAST(sum(wedges2) // 2 AS BIGINT) AS n_wedges,
       CAST(CAST(sum(2 * t_v) AS HUGEINT) * 1000000
            // sum(wedges2) AS BIGINT) AS transitivity_ppm,
       CAST(sum(local_cc_ppm) // count(*) AS BIGINT) AS mean_local_cc_ppm
FROM labeled
GROUP BY band
ORDER BY band
"""


SPARK_QUERIES = {
    "item_cooccurrence_topk": item_cooccurrence_topk,
    "item_jaccard_similarity": item_jaccard_similarity,
    "item_triangle_count": item_triangle_count,
    "item_kcore_peel": item_kcore_peel,
    "item_ktruss_edges": item_ktruss_edges,
    "association_rules_lift": association_rules_lift,
    "frequent_triples_lift": frequent_triples_lift,
    "rec_list_quality": rec_list_quality,
    "link_prediction_ra_index": link_prediction_ra_index,
    "clustering_coefficient_bands": clustering_coefficient_bands,
}
ORACLE_SQL = {
    "clustering_coefficient_bands": CLUSTERING_COEFF_SQL,
    "item_kcore_peel": KCORE_SQL,
    "item_cooccurrence_topk": COOCCUR_SQL,
    "item_jaccard_similarity": JACCARD_SQL,
    "item_triangle_count": TRIANGLE_SQL,
    "item_ktruss_edges": KTRUSS_SQL,
    "association_rules_lift": ASSOC_RULES_SQL,
    "frequent_triples_lift": FREQ_TRIPLES_SQL,
    "rec_list_quality": REC_QUALITY_SQL,
    "link_prediction_ra_index": RA_INDEX_SQL,
}
