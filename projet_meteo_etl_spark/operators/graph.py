"""Graph analytics over the click stream — PageRank, label
propagation, and bounded-hop BFS on the bipartite user–item graph.

The reference has no graph surface (SURVEY.md §2.5); connected
components (``operators/dedup.py``) covers the clustering side, and
this module adds the iterative-propagation side over the graph whose
edges are distinct (user, item) click pairs (items from the ``props``
JSON payload), symmetrized so every node has out-degree.

Determinism at any scale — the thing that usually makes distributed
PageRank non-reproducible is float summation order.  Here rank is an
integer (units of 1e-12): per-edge contributions are ``floor(rank /
outdeg)`` and the damping step is ``floor(0.15e12 / N) + floor(0.85 ×
Σcontrib)`` — every Σ is an integer sum (order-independent), every
float op (one division, one multiply) is a correctly-rounded IEEE
double op on exactly-representable integers (< 2^53), so Spark and
DuckDB produce bit-identical ranks and the oracle can check all three
iterations end-to-end.

Scale: each iteration is one join (ranks ⋈ edges on src — both sides
hash-partitioned on the same key, so iterations 2+ reuse the exchange)
plus one aggregation by dst.  The rank table is |V| rows (small side);
at 100 TB of events the edge list dominates and stays partitioned once
— the classic Pregel-as-joins layout.  Iteration count is fixed (3),
so the plan is a static DAG: no lineage growth, no checkpointing
needed; for 20+ iterations reuse the ``localCheckpoint`` round
truncation demonstrated in ``dedup_connected_components``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.functions.portable import pround, pround_sql, json_long

N_ITER = 3
DAMP = 0.85
SCALE = 10**12
TOP_N = 25


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    pairs = e.select(
        F.concat(F.lit("u:"), F.col("user_id")).alias("u"),
        F.concat(
            F.lit("i:"), json_long()
        ).alias("i"),
    ).filter(
        # a NULL item (missing props / $.k) would become a rank sink and
        # order differently across engines (Spark NULLS FIRST vs DuckDB
        # NULLS LAST) — drop it like cooccur's extraction does
        F.col("i").isNotNull()
    ).distinct()
    fwd = pairs.select(F.col("u").alias("src"), F.col("i").alias("dst"))
    rev = pairs.select(F.col("i").alias("src"), F.col("u").alias("dst"))
    return fwd.unionByName(rev)


def _damped_walk(ranks, deg, edges_by_node, n_rounds: int, add_base):
    """The shared Pregel-as-joins damped-walk loop (PageRank and its
    personalized variant differ ONLY in where the teleport mass lands):
    per-edge ``floor(rank/outdeg)`` contributions, ``floor(DAMP·Σ)``,
    then the caller's base-mass step — one definition so the exact-
    integer recipe can never drift between the twins."""
    for _ in range(n_rounds):
        contrib = (
            ranks.join(deg, "node")
            .join(edges_by_node, "node")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("r") / F.col("deg")).alias("c"),
            )
        )
        spread = contrib.groupBy("node").agg(
            F.floor(F.lit(DAMP) * F.sum("c")).cast("long").alias("dr")
        )
        ranks = add_base(spread)
    return ranks


def _walk_topn(ranks, edges) -> DataFrame:
    """Shared top-``TOP_N`` report tail of the two walks."""
    from projet_meteo_etl_spark.cachescope import scoped_cache

    out = (
        ranks.select(
            "node",
            F.col("r").alias("rank_scaled"),
            pround(F.col("r") / F.lit(float(SCALE)), 9).alias("rank"),
        )
        .orderBy(F.desc("rank_scaled"), F.asc("node"))
        .limit(TOP_N)
    )
    return scoped_cache(out, edges)


def pagerank_click_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``TOP_N`` nodes of the symmetrized user–item click graph by
    3-iteration damped PageRank (integer rank units of 1e-12)."""
    edges = _edges(spark, sf_dir).repartition("src").cache()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = outdeg.count()  # |V| — a scalar the driver legitimately owns

    base = int(0.15 * SCALE) // n_nodes  # exact ints end-to-end
    ranks = outdeg.select(
        F.col("src").alias("node"), F.lit(SCALE // n_nodes).alias("r")
    )
    deg = outdeg.withColumnRenamed("src", "node")
    edges_by_node = edges.withColumnRenamed("src", "node")
    ranks = _damped_walk(
        ranks,
        deg,
        edges_by_node,
        N_ITER,
        lambda s: s.select(
            "node", (F.lit(base) + F.col("dr")).cast("long").alias("r")
        ),
    )
    return _walk_topn(ranks, edges)


# shared oracle fragment: the symmetrized click-graph edge list —
# the SQL twin of _edges().  One definition, interpolated into every
# graph oracle, so an edge-definition change (cast hardening, a new
# event filter) can never desynchronize one oracle from the others.
_EDGES_SQL = """WITH pairs AS (
  SELECT DISTINCT 'u:' || user_id AS u,
         'i:' || TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) AS i
  FROM events
  WHERE event_type = 'click'
    AND 'i:' || TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) IS NOT NULL
),
edges AS (
  SELECT u AS src, i AS dst FROM pairs
  UNION ALL
  SELECT i AS src, u AS dst FROM pairs
),"""


def _damped_iter_sql(
    prev: str, this: str, base_term: str, extra_join: str = ""
) -> str:
    """One oracle-side definition of the damped-walk round — the SQL
    twin of ``_damped_walk``, parameterized on the teleport term so the
    global and personalized variants cannot drift."""
    return f"""
{this} AS (
  SELECT e.dst AS node,
         CAST(floor({DAMP} * sum(floor(r.r * 1.0 / d.deg)))
              + {base_term} AS BIGINT) AS r
  FROM {prev} r
  JOIN outdeg d ON d.src = r.node
  JOIN edges e ON e.src = r.node
  {extra_join}
  GROUP BY e.dst
)"""


def _iter_sql(prev: str, this: str) -> str:
    return _damped_iter_sql(prev, this, "(SELECT base FROM consts)")


PAGERANK_SQL = f"""
{_EDGES_SQL}
outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
consts AS (
  SELECT count(*) AS n,
         CAST({int(0.15 * SCALE)} // count(*) AS BIGINT) AS base,
         CAST({SCALE} // count(*) AS BIGINT) AS r0
  FROM outdeg
),
r0 AS (SELECT src AS node, (SELECT r0 FROM consts) AS r FROM outdeg),
{_iter_sql('r0', 'r1')},
{_iter_sql('r1', 'r2')},
{_iter_sql('r2', 'r3')}
SELECT node, r AS rank_scaled,
       floor((r * 1.0 / {SCALE}.0) * 1000000000.0 + 0.5) / 1000000000.0 AS rank
FROM r3
ORDER BY rank_scaled DESC, node ASC
LIMIT {TOP_N}
"""


#: synchronous label-propagation rounds (unrolled; deterministic)
N_LPA_ROUNDS = 2
#: communities reported
LPA_TOP = 50


def _lpa_label_rounds(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """``N_LPA_ROUNDS`` synchronous, deterministic label-propagation
    rounds over a symmetrized edge list (initial label = own id, modal
    neighbor label, min-label ties).  Returns ``(previous, final)``
    label relations — shared by the community rollup and the modularity
    score so the two queries are guaranteed to grade the SAME
    partition."""
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    from pyspark.sql import Window

    prev = labels
    for _ in range(N_LPA_ROUNDS):
        prev = labels
        nb = edges.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "label")
        counts = nb.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("n")
        )
        w = Window.partitionBy("node").orderBy(F.desc("n"), F.asc("label"))
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    return prev, labels


def label_propagation_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the symmetrized user–item click graph by
    ``N_LPA_ROUNDS`` synchronous label-propagation rounds (Raghavan et
    al. 2007), reported as the ``LPA_TOP`` largest communities.

    Plain LPA is notoriously nondeterministic (random update order,
    random tie-breaks); this variant is bit-reproducible on any cluster
    layout: updates are SYNCHRONOUS (round k+1 sees only round k), the
    new label is the modal label among neighbors with ties broken to
    the LEXICOGRAPHICALLY SMALLEST label (both engines compare varchar
    binary), and the initial label is the node's own id.

    Scale: each round is one shuffle-join of the edge list (partitioned
    once on dst and reused across rounds) with the |V|-row label
    relation, then a (node, label) count and a per-node top-1 window —
    map-side combinable, skew-bounded by max degree.  Output is the
    community-size rollup (top ``LPA_TOP``), never the |V|-row
    assignment.

    Convergence telemetry: every row carries ``n_changed_last_round``
    — how many nodes flipped label between the last two rounds.  0
    means the bounded unroll reached a fixpoint; non-zero quantifies
    how far the truncated iteration still had to move, so a consumer
    can size more rounds instead of trusting a silently truncated
    result.
    """
    edges = _edges(spark, sf_dir).repartition("dst").cache()
    prev, labels = _lpa_label_rounds(edges)
    from projet_meteo_etl_spark.cachescope import scoped_cache

    # the final two label relations each feed two consumers (residual
    # count + community rollup / next-round join): persist so neither
    # re-runs its round chain
    prev = prev.persist()
    labels = labels.persist()
    changed = (
        labels.join(
            prev.withColumnRenamed("label", "prev_label"), "node"
        )
        .agg(
            F.sum(
                F.when(F.col("label") != F.col("prev_label"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_changed_last_round")
        )
    )
    out = (
        labels.groupBy("label")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .crossJoin(F.broadcast(changed))
        .select(
            "label",
            "n_members",
            F.coalesce("n_changed_last_round", F.lit(0)).alias(
                "n_changed_last_round"
            ),
        )
        .orderBy(F.desc("n_members"), F.asc("label"))
        .limit(LPA_TOP)
    )
    return scoped_cache(out, edges, prev, labels)


def _lpa_iter_sql(prev: str, this: str) -> str:
    return f"""
{this} AS (
  SELECT node, label FROM (
    SELECT e.src AS node, l.label,
           row_number() OVER (PARTITION BY e.src
                              ORDER BY count(*) DESC, l.label ASC) AS rn
    FROM edges e JOIN {prev} l ON l.node = e.dst
    GROUP BY e.src, l.label
  ) WHERE rn = 1
)"""


LPA_SQL = f"""
{_EDGES_SQL}
l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
{_lpa_iter_sql('l0', 'l1')},
{_lpa_iter_sql('l1', 'l2')},
changed AS (
  SELECT CAST(coalesce(sum(CASE WHEN a.label <> b.label THEN 1 ELSE 0 END),
                       0) AS BIGINT) AS n_changed_last_round
  FROM l{N_LPA_ROUNDS} a
  JOIN l{N_LPA_ROUNDS - 1} b ON b.node = a.node
)
SELECT label, CAST(count(*) AS BIGINT) AS n_members,
       changed.n_changed_last_round
FROM l{N_LPA_ROUNDS}, changed
GROUP BY label, changed.n_changed_last_round
ORDER BY n_members DESC, label ASC
LIMIT {LPA_TOP}
"""


#: BFS unroll depth (hops) and seed-set size
BFS_HOPS = 3
BFS_SEEDS = 5


def click_graph_bfs_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop BFS reachability over the symmetrized user–item
    click graph: min hop distance from the ``BFS_SEEDS`` highest-degree
    item nodes (the "how far does influence spread from the head items"
    audit, and the building block of seed-expansion labeling).  Output
    is the per-distance node histogram — distance −1 collects nodes the
    ``BFS_HOPS``-hop unroll did NOT reach, so truncation is explicit in
    the result, never silent.

    Deterministic: seeds are (degree DESC, node ASC)-ranked, distances
    are integer minima — no floats anywhere.  Scale: each hop is one
    join of the (≤|V|-row) frontier against the edge list partitioned
    once on ``src`` and reused across hops (the Pregel-as-joins layout
    PageRank above uses); the unroll is a static 3-round DAG, and the
    output is the distance rollup, never the |V|-row assignment.
    """
    edges = _edges(spark, sf_dir).repartition("src").cache()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).persist()
    seeds = (
        deg.filter(F.col("src").startswith("i:"))
        .orderBy(F.desc("deg"), F.asc("src"))
        .limit(BFS_SEEDS)
        .select(F.col("src").alias("node"))
    )
    # materialize the frontier relation each round (k-truss's lineage
    # cut): without it, round k's plan re-executes the seeds top-k and
    # every earlier round's union+min as nested subtrees — 30 exchanges
    # and 8 copies of the seed TakeOrdered for a 3-hop walk
    dist = seeds.select("node", F.lit(0).alias("d")).localCheckpoint(
        eager=True
    )
    for k in range(1, BFS_HOPS + 1):
        frontier = dist.filter(F.col("d") == k - 1).select(
            F.col("node").alias("src")
        )
        reached = (
            frontier.join(edges, "src")
            .select(F.col("dst").alias("node"), F.lit(k).alias("d"))
            .distinct()
        )
        dist = (
            dist.unionByName(reached)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            .localCheckpoint(eager=True)
        )
    nodes = deg.select(F.col("src").alias("node"))
    labeled = nodes.join(dist, "node", "left").select(
        F.coalesce("d", F.lit(-1)).cast("int").alias("distance")
    )
    tot = labeled.agg(F.count(F.lit(1)).alias("n_total"))
    from projet_meteo_etl_spark.cachescope import scoped_cache

    out = (
        labeled.groupBy("distance")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .crossJoin(F.broadcast(tot))
        .select(
            "distance",
            "n_nodes",
            F.expr("CAST(n_nodes * 1000000 DIV n_total AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy("distance")
    )
    return scoped_cache(out, edges, deg)


def _bfs_iter_sql(prev: str, this: str, k: int) -> str:
    return f"""
{this} AS (
  SELECT node, min(d) AS d FROM (
    SELECT node, d FROM {prev}
    UNION ALL
    SELECT DISTINCT e.dst AS node, {k} AS d
    FROM {prev} f JOIN edges e ON e.src = f.node
    WHERE f.d = {k - 1}
  ) GROUP BY node
)"""


BFS_REACH_SQL = f"""
{_EDGES_SQL}
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
d0 AS (
  SELECT src AS node, 0 AS d FROM deg
  WHERE src LIKE 'i:%'
  ORDER BY deg DESC, src ASC LIMIT {BFS_SEEDS}
),
{_bfs_iter_sql('d0', 'd1', 1)},
{_bfs_iter_sql('d1', 'd2', 2)},
{_bfs_iter_sql('d2', 'd3', 3)},
labeled AS (
  SELECT CAST(coalesce(x.d, -1) AS INTEGER) AS distance
  FROM deg LEFT JOIN d{BFS_HOPS} x ON x.node = deg.src
),
tot AS (SELECT count(*) AS n_total FROM labeled)
SELECT distance, CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(count(*) * 1000000 // (SELECT n_total FROM tot) AS BIGINT)
         AS share_ppm
FROM labeled
GROUP BY distance
ORDER BY distance
"""


#: personalized-PageRank rounds — EVEN so the bipartite walk from item
#: seeds ends on the item side (see the docstring)
PPR_ITERS = 4


def personalized_pagerank_seeds(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Personalized PageRank: the :func:`pagerank_click_graph` walk
    with the TELEPORT restricted to the ``BFS_SEEDS`` highest-degree
    item nodes — relevance-to-the-seed-set ranking, the recommender /
    seed-expansion variant (global PageRank answers "important overall";
    PPR answers "important NEAR these items").  Same exact-integer
    recipe as the global walk (per-edge floor contributions, damped
    base mass — here ``0.15·SCALE DIV |seeds|`` paid only to seeds, r₀
    mass only on seeds) so DuckDB iterates bit-identically, same
    Pregel-as-joins scale shape, static DAG.  ``PPR_ITERS`` is EVEN
    (4): from item seeds on the bipartite graph, rank mass alternates
    sides each hop (items→users→items…), so an even round count lands
    the ranking back on the item side plus the users reached at the
    final hop's frontier — a node holds rank only when the walk can
    stand on it that round, mirrored exactly by the oracle's unroll.
    """
    edges = _edges(spark, sf_dir).repartition("src").cache()
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    seeds = (
        outdeg.filter(F.col("src").startswith("i:"))
        .orderBy(F.desc("deg"), F.asc("src"))
        .limit(BFS_SEEDS)
        .select(F.col("src").alias("node"), F.lit(1).alias("is_seed"))
        .localCheckpoint(eager=True)  # cut the TakeOrdered out of every
        # round's lineage (the BFS lesson: 8 copies otherwise)
    )
    base = int(0.15 * SCALE) // BFS_SEEDS
    r0 = SCALE // BFS_SEEDS
    ranks = seeds.select("node", F.lit(r0).alias("r"))
    deg = outdeg.withColumnRenamed("src", "node")
    edges_by_node = edges.withColumnRenamed("src", "node")

    def add_seed_base(spread):
        return spread.join(F.broadcast(seeds), "node", "left").select(
            "node",
            (
                F.col("dr")
                + F.when(F.col("is_seed") == 1, F.lit(base)).otherwise(
                    F.lit(0)
                )
            ).alias("r"),
        )

    ranks = _damped_walk(ranks, deg, edges_by_node, PPR_ITERS, add_seed_base)
    return _walk_topn(ranks, edges)


def _ppr_sql_round(prev: str, this: str) -> str:
    return _damped_iter_sql(
        prev,
        this,
        "coalesce(max(s.base), 0)",
        "LEFT JOIN seedbase s ON s.node = e.dst",
    )


PPR_SQL = f"""
{_EDGES_SQL}
outdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
seeds AS (
  SELECT src AS node FROM outdeg WHERE src LIKE 'i:%'
  ORDER BY deg DESC, src ASC LIMIT {BFS_SEEDS}
),
seedbase AS (
  SELECT node, CAST({int(0.15 * SCALE)} // {BFS_SEEDS} AS BIGINT) AS base
  FROM seeds
),
r0 AS (
  SELECT node, CAST({SCALE} // {BFS_SEEDS} AS BIGINT) AS r FROM seeds
),
{_ppr_sql_round('r0', 'r1')},
{_ppr_sql_round('r1', 'r2')},
{_ppr_sql_round('r2', 'r3')},
{_ppr_sql_round('r3', 'r4')}
SELECT node, r AS rank_scaled,
       floor((r * 1.0 / {SCALE}.0) * 1000000000.0 + 0.5) / 1000000000.0 AS rank
FROM r4
ORDER BY rank_scaled DESC, node ASC
LIMIT {TOP_N}
"""


#: HITS output size per side and the fixed synchronous round count
HITS_TOP_N = 15


def hits_hub_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg HITS on the BIPARTITE click graph (users = hubs,
    items = authorities, directed u→i edges — unlike
    :func:`pagerank_click_graph`'s symmetrized walk): two synchronous
    mutual-reinforcement rounds, L1-renormalized to integer units of
    1e-12 after every propagation, reporting the top-``HITS_TOP_N``
    of each side.

    Exactness: hub/authority mass is integer end-to-end — propagation
    is an integer sum over edges (order-independent), renormalization
    is ``mass·SCALE DIV total`` with the multiply widened to
    DECIMAL(38,0)/HUGEINT (raw mass alone approaches int64 at ~100×
    users) — so Spark and DuckDB iterate bit-identically, same recipe
    as PageRank's damped step.

    Scale: each half-round is one join (edge list ⋈ |side| score rows)
    plus a groupBy on the other side — the Pregel-as-joins layout; the
    1-row L1 totals broadcast.  Round count fixed (2 full rounds ⇒
    static DAG, no lineage growth).
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    pairs = (
        e.select(
            F.col("user_id").alias("u"),
            json_long().alias("i"),
        )
        .filter(F.col("i").isNotNull())
        .distinct()
        .persist()  # four propagation joins consume the edge list
    )

    kept: list[DataFrame] = [pairs]

    def _renorm(df: DataFrame, key: str, raw: str) -> DataFrame:
        # persist the raw mass (consumed by its L1 total and the scaled
        # select — unpersisted, the two-consumer pattern recomputes the
        # whole upstream chain 2× per level: 2⁴ pairs scans by h2), then
        # COLLECT the 1-row total — the sanctioned scalar-collect class
        # (PageRank's |V| count) — so the scaled select is a literal
        # expression fused into the next round's join stage instead of a
        # per-round broadcast-join stage (4 fewer stages; the rounds are
        # sequential either way)
        df = df.persist()
        kept.append(df)
        t = df.agg(
            F.sum(F.col(raw).cast("decimal(38,0)")).alias("t")
        ).collect()[0][0]
        return df.select(
            key,
            F.expr(
                f"CAST(CAST({raw} AS DECIMAL(38,0)) * {SCALE}"
                f" DIV CAST('{t}' AS DECIMAL(38,0)) AS BIGINT)"
            ).alias("s"),
        )

    # h0 = SCALE for every user ⇒ a1_raw(i) = SCALE·indeg(i).  Raw mass
    # products and propagation sums are DECIMAL(38,0) end-to-end — the
    # seed product wraps int64 at indegree > 9.2e6 and a degree-1e7 hub
    # wraps the per-node sum, while the oracle's HUGEINT stays exact
    a1 = _renorm(
        pairs.groupBy("i").agg(
            (F.count(F.lit(1)).cast("decimal(38,0)") * F.lit(SCALE)).alias(
                "raw"
            )
        ),
        "i",
        "raw",
    )
    h1 = _renorm(
        pairs.join(a1, "i")
        .groupBy("u")
        .agg(F.sum(F.col("s").cast("decimal(38,0)")).alias("raw")),
        "u",
        "raw",
    )
    a2 = _renorm(
        pairs.join(h1, "u")
        .groupBy("i")
        .agg(F.sum(F.col("s").cast("decimal(38,0)")).alias("raw")),
        "i",
        "raw",
    )
    h2 = _renorm(
        pairs.join(a2, "i")
        .groupBy("u")
        .agg(F.sum(F.col("s").cast("decimal(38,0)")).alias("raw")),
        "u",
        "raw",
    )
    both = a2.select(
        F.lit("authority").alias("kind"),
        F.concat(F.lit("i:"), F.col("i")).alias("node"),
        F.col("s").alias("score_scaled"),
    ).unionByName(
        h2.select(
            F.lit("hub").alias("kind"),
            F.concat(F.lit("u:"), F.col("u")).alias("node"),
            F.col("s").alias("score_scaled"),
        )
    )
    from pyspark.sql import Window

    from projet_meteo_etl_spark.cachescope import scoped_cache

    w = Window.partitionBy("kind").orderBy(
        F.desc("score_scaled"), F.asc("node")
    )
    out = (
        both.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HITS_TOP_N)
        .select(
            "kind",
            "node",
            "score_scaled",
            pround(F.col("score_scaled") / F.lit(float(SCALE)), 9).alias(
                "score"
            ),
        )
        .orderBy("kind", F.desc("score_scaled"), F.asc("node"))
    )
    return scoped_cache(out, *kept)


HITS_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT user_id AS u, TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) AS i
  FROM events
  WHERE event_type = 'click' AND TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) IS NOT NULL
),
a1r AS (SELECT i, count(*)::HUGEINT * {SCALE} AS raw FROM pairs GROUP BY i),
a1 AS (
  SELECT i, CAST(raw * {SCALE} // (SELECT sum(raw) FROM a1r) AS BIGINT) AS s
  FROM a1r
),
h1r AS (
  SELECT p.u, sum(a.s)::HUGEINT AS raw FROM pairs p JOIN a1 a USING (i)
  GROUP BY p.u
),
h1 AS (
  SELECT u, CAST(raw * {SCALE} // (SELECT sum(raw) FROM h1r) AS BIGINT) AS s
  FROM h1r
),
a2r AS (
  SELECT p.i, sum(h.s)::HUGEINT AS raw FROM pairs p JOIN h1 h USING (u)
  GROUP BY p.i
),
a2 AS (
  SELECT i, CAST(raw * {SCALE} // (SELECT sum(raw) FROM a2r) AS BIGINT) AS s
  FROM a2r
),
h2r AS (
  SELECT p.u, sum(a.s)::HUGEINT AS raw FROM pairs p JOIN a2 a USING (i)
  GROUP BY p.u
),
h2 AS (
  SELECT u, CAST(raw * {SCALE} // (SELECT sum(raw) FROM h2r) AS BIGINT) AS s
  FROM h2r
),
sides AS (
  SELECT 'authority' AS kind, 'i:' || i AS node, s AS score_scaled FROM a2
  UNION ALL
  SELECT 'hub', 'u:' || u, s FROM h2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY kind
             ORDER BY score_scaled DESC, node ASC) AS rn
  FROM sides
)
SELECT kind, node, score_scaled,
       floor((score_scaled * 1.0 / {SCALE}.0) * 1000000000.0 + 0.5)
         / 1000000000.0 AS score
FROM ranked WHERE rn <= {HITS_TOP_N}
ORDER BY kind, score_scaled DESC, node ASC
"""


#: Bellman–Ford relaxation rounds (unrolled; ≥ the longest useful path)
BF_ROUNDS = 4
#: cheapest-path sources: the highest-degree item nodes, BFS's seed rule
BF_SEEDS = 3
#: cheapest non-seed destinations reported
BF_TOP_N = 30


def cheapest_path_bellman_ford(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bounded-round WEIGHTED shortest path (Bellman–Ford) over the
    click graph: min total cost from the ``BF_SEEDS`` highest-degree
    item nodes, where an edge's cost is inverse click multiplicity —
    ``1000 + 1_000_000 DIV clicks(u,i)`` — so heavily-reinforced
    user–item affinities are cheap to traverse and the result reads as
    "the ``BF_TOP_N`` nodes most strongly wired to the head items",
    the weighted refinement of :func:`click_graph_bfs_reach`'s hop
    metric (2 strong hops can now beat 1 weak hop).

    Each round relaxes EVERY settled node, not just the newest
    frontier: a node first reached in round 1 at cost 9000 and again
    in round 2 at cost 4000 must re-propagate its improvement, which a
    frontier-only walk (correct for BFS, where later ⇒ never cheaper)
    would silently drop.  Costs are exact integers, so min() is
    order-independent and both engines agree bit-for-bit.

    Scale: the edge list is weighted by a (user,item) click-count
    rollup of the raw scan (one shuffle), partitioned once on ``src``
    and reused by all ``BF_ROUNDS`` join rounds; the cost table is
    ≤|V| rows and each round is one join + one min-aggregate with a
    ``localCheckpoint`` lineage cut — the same static Pregel-as-joins
    DAG as PageRank above, with round count fixed so the plan cannot
    grow with data.  Reference parity: the reference has no graph
    surface (SURVEY §2.5); this extends the BFS auditing family.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    pc = (
        e.select(
            F.concat(F.lit("u:"), F.col("user_id")).alias("u"),
            F.concat(
                F.lit("i:"), json_long()
            ).alias("i"),
        )
        .filter(F.col("i").isNotNull())
        .groupBy("u", "i")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("w", F.expr("CAST(1000 + 1000000 DIV c AS BIGINT)"))
    )
    fwd = pc.select(F.col("u").alias("src"), F.col("i").alias("dst"), "w")
    rev = pc.select(F.col("i").alias("src"), F.col("u").alias("dst"), "w")
    edges = fwd.unionByName(rev).repartition("src").cache()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    seeds = (
        deg.filter(F.col("src").startswith("i:"))
        .orderBy(F.desc("deg"), F.asc("src"))
        .limit(BF_SEEDS)
        .select(F.col("src").alias("node"))
    )
    dist = seeds.select(
        "node", F.lit(0).cast("long").alias("cost")
    ).localCheckpoint(eager=True)
    for _ in range(BF_ROUNDS):
        relaxed = (
            dist.withColumnRenamed("node", "src")
            .join(edges, "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("cost") + F.col("w")).alias("cost"),
            )
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("cost").alias("cost"))
            .localCheckpoint(eager=True)
        )
    from projet_meteo_etl_spark.cachescope import scoped_cache

    out = (
        dist.filter(F.col("cost") > 0)  # seeds stay at min cost 0
        .orderBy(F.asc("cost"), F.asc("node"))
        .limit(BF_TOP_N)
    )
    return scoped_cache(out, edges)


def _bf_iter_sql(prev: str, this: str) -> str:
    return f"""
{this} AS (
  SELECT node, min(cost) AS cost FROM (
    SELECT node, cost FROM {prev}
    UNION ALL
    SELECT e.dst AS node, f.cost + e.w AS cost
    FROM {prev} f JOIN wedges e ON e.src = f.node
  ) GROUP BY node
)"""


BELLMAN_FORD_SQL = f"""
WITH pc AS (
  SELECT 'u:' || user_id AS u,
         'i:' || TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) AS i,
         count(*) AS c
  FROM events
  WHERE event_type = 'click'
    AND 'i:' || TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) IS NOT NULL
  GROUP BY 1, 2
),
wedges AS (
  SELECT u AS src, i AS dst, CAST(1000 + 1000000 // c AS BIGINT) AS w FROM pc
  UNION ALL
  SELECT i AS src, u AS dst, CAST(1000 + 1000000 // c AS BIGINT) AS w FROM pc
),
deg AS (SELECT src, count(*) AS deg FROM wedges GROUP BY src),
d0 AS (
  SELECT src AS node, CAST(0 AS BIGINT) AS cost FROM deg
  WHERE src LIKE 'i:%'
  ORDER BY deg DESC, src ASC LIMIT {BF_SEEDS}
),
{_bf_iter_sql('d0', 'd1')},
{_bf_iter_sql('d1', 'd2')},
{_bf_iter_sql('d2', 'd3')},
{_bf_iter_sql('d3', 'd4')}
SELECT node, cost FROM d{BF_ROUNDS}
WHERE cost > 0
ORDER BY cost ASC, node ASC
LIMIT {BF_TOP_N}
"""


def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the symmetrized click graph (Newman
    2002): the Pearson correlation of endpoint degrees over the
    directed edge list — positive means hubs link to hubs (a core that
    no balanced partitioner can split cleanly), negative means a
    hub-and-spoke topology (the usual bipartite shape, and the reason
    the skew-join mitigations in ``relational_ext`` exist).  The one
    scalar a graph engine reports before choosing a partitioning
    strategy.

    Exactness: the five degree moments (n, Σd_src, Σd_src², Σd_dst²,
    Σd_src·d_dst) accumulate as DECIMAL(38,0)/HUGEINT integers
    (order-independent under any partitioning; Σd·d ≤ |E|·d_max²
    stays far inside 38 digits), and the correlation is ONE fixed
    sequence of IEEE double ops over those sums (the
    ``profile_correlations`` convention) rounded with ``pround`` —
    bit-identical cross-engine.  Symmetrization makes the src and dst
    degree distributions equal, but both moment sets are accumulated
    anyway so the formula is the general directed one.

    Scale: degree table = one groupBy of the edge list; the two degree
    lookups join on the edge keys (broadcast at dim scale, co-keyed
    shuffle beyond); the moment aggregate is map-side combinable into
    a single row.
    """
    edges = _edges(spark, sf_dir).repartition("src").cache()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    labeled = (
        edges.join(deg.withColumnRenamed("deg", "dx"), "src")
        .join(
            deg.selectExpr("src AS dst", "deg AS dy"),
            "dst",
        )
    )
    m = labeled.agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.col("dx").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("dy").cast("decimal(38,0)")).alias("sy"),
        F.sum(
            (F.col("dx").cast("decimal(38,0)") * F.col("dx")).cast(
                "decimal(38,0)"
            )
        ).alias("sxx"),
        F.sum(
            (F.col("dy").cast("decimal(38,0)") * F.col("dy")).cast(
                "decimal(38,0)"
            )
        ).alias("syy"),
        F.sum(
            (F.col("dx").cast("decimal(38,0)") * F.col("dy")).cast(
                "decimal(38,0)"
            )
        ).alias("sxy"),
    )
    n = F.col("n_edges").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    cov_n = n * F.col("sxy").cast("double") - sx * sy
    var_x = n * F.col("sxx").cast("double") - sx * sx
    var_y = n * F.col("syy").cast("double") - sy * sy
    from projet_meteo_etl_spark.cachescope import scoped_cache

    out = m.select(
        "n_edges",
        F.col("sx").cast("long").alias("sum_deg"),
        # degenerate graph (every node same degree) ⇒ var_x*var_y == 0;
        # CASE-guard so ANSI Spark emits NULL like the oracle's NULLIF
        # instead of raising DIVIDE_BY_ZERO
        F.when(
            var_x * var_y > 0,
            pround(cov_n / F.sqrt(var_x * var_y), 9),
        ).alias("assortativity"),
    )
    return scoped_cache(out, edges)


ASSORTATIVITY_SQL = f"""
{_EDGES_SQL}
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
lab AS (
  SELECT CAST(a.deg AS HUGEINT) AS dx, CAST(b.deg AS HUGEINT) AS dy
  FROM edges e
  JOIN deg a ON a.src = e.src
  JOIN deg b ON b.src = e.dst
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_edges,
         sum(dx) AS sx, sum(dy) AS sy,
         sum(dx * dx) AS sxx, sum(dy * dy) AS syy,
         sum(dx * dy) AS sxy
  FROM lab
)
SELECT n_edges,
       CAST(sx AS BIGINT) AS sum_deg,
       {pround_sql(
           "(CAST(n_edges AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " / NULLIF(sqrt((CAST(n_edges AS DOUBLE) * CAST(sxx AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
           " * (CAST(n_edges AS DOUBLE) * CAST(syy AS DOUBLE)"
           " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 0.0)",
           9,
       )} AS assortativity
FROM m
"""


#: temporal reachability: seeds and bounded hop unroll
TR_SEEDS = 5
TR_HOPS = 3


def temporal_reachability_items(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TIME-RESPECTING reachability over the item click sequence — the
    temporal-network operator the static BFS
    (:func:`click_graph_bfs_reach`) cannot express: an edge A→B exists
    when some user clicked A then B (consecutively), stamped with the
    second click's time, and a path is valid only if its edge times are
    non-decreasing FROM the seed's first appearance (Holme & Saramäki
    2012 — "influence can only flow forward in time").  Earliest-
    arrival semantics: ``arrival(dst) = min t over edges (src→dst, t ≥
    arrival(src))``, refined each round; the static BFS would count
    paths that go backwards in time.

    Seeds are the ``TR_SEEDS`` most-clicked items (deg DESC, item ASC),
    their own first-click time as the start; ``TR_HOPS`` rounds; output
    is the per-hop histogram with final arrival bounds, hop −1
    collecting items the bounded unroll did not reach (truncation
    explicit, the BFS convention).

    Determinism: integer microsecond times, min-merges only.  Scale:
    the edge list is one lag-window pass over the click log (then
    distinct), partitioned once and reused per round; the arrival
    relation is |items| rows; each round is one join + min rollup —
    the Pregel-as-joins layout with a 3-round static DAG and
    ``localCheckpoint`` round truncation.
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
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    seq = clicks.select(
        "item", "t", F.lag("item").over(w).alias("prev")
    )
    edges = (
        seq.filter(
            F.col("prev").isNotNull() & (F.col("prev") != F.col("item"))
        )
        .select(
            F.col("prev").alias("src"), F.col("item").alias("dst"), "t"
        )
        .distinct()
        .repartition("src")
        .cache()
    )
    fs = clicks.groupBy("item").agg(
        F.min("t").alias("t0"), F.count(F.lit(1)).alias("deg")
    ).persist()
    seeds = (
        fs.orderBy(F.desc("deg"), F.asc("item"))
        .limit(TR_SEEDS)
        .select(F.col("item").alias("node"), F.col("t0").alias("arr"))
    )
    arrivals = seeds.withColumn("hop", F.lit(0)).localCheckpoint(
        eager=True
    )
    for k in range(1, TR_HOPS + 1):
        cand = (
            arrivals.select(F.col("node").alias("src"), "arr")
            .join(edges, "src")
            .filter(F.col("t") >= F.col("arr"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("t").alias("new_arr"))
        )
        arrivals = (
            arrivals.join(cand, "node", "full_outer")
            .select(
                "node",
                F.when(
                    F.col("arr").isNull(), F.col("new_arr")
                )
                .when(F.col("new_arr").isNull(), F.col("arr"))
                .otherwise(F.least("arr", "new_arr"))
                .alias("arr"),
                F.coalesce("hop", F.lit(k)).alias("hop"),
            )
            .localCheckpoint(eager=True)
        )
    from projet_meteo_etl_spark.cachescope import scoped_cache

    out = (
        fs.select(F.col("item").alias("node"))
        .join(arrivals, "node", "left")
        .groupBy(F.coalesce("hop", F.lit(-1)).alias("hop"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.min("arr").alias("min_arrival_us"),
            F.max("arr").alias("max_arrival_us"),
        )
        .orderBy("hop")
    )
    return scoped_cache(out, edges, fs)


def _tr_round_sql(prev: str, cand: str, this: str, k: int) -> str:
    return f"""
{cand} AS (
  SELECT e.dst AS node, min(e.t) AS new_arr
  FROM {prev} a JOIN tedges e ON e.src = a.node AND e.t >= a.arr
  GROUP BY e.dst
),
{this} AS (
  SELECT coalesce(a.node, c.node) AS node,
         CASE WHEN a.arr IS NULL THEN c.new_arr
              WHEN c.new_arr IS NULL THEN a.arr
              ELSE least(a.arr, c.new_arr) END AS arr,
         coalesce(a.hop, {k}) AS hop
  FROM {prev} a FULL JOIN {cand} c ON c.node = a.node
)"""


TEMPORAL_REACH_SQL = f"""
WITH tclicks AS (
  SELECT user_id, TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) AS item,
         epoch_us(ts) AS t, event_id
  FROM events
  WHERE event_type = 'click'
    AND TRY_CAST(CASE WHEN regexp_matches(trim(props->>'k'), '^[+-]?[0-9]+$') THEN trim(props->>'k') END AS BIGINT) IS NOT NULL
),
seq AS (
  SELECT item, t,
         lag(item) OVER (PARTITION BY user_id ORDER BY t, event_id)
           AS prev
  FROM tclicks
),
tedges AS (
  SELECT DISTINCT prev AS src, item AS dst, t
  FROM seq WHERE prev IS NOT NULL AND prev <> item
),
fs AS (
  SELECT item, min(t) AS t0, count(*) AS deg FROM tclicks GROUP BY item
),
a0 AS (
  SELECT item AS node, t0 AS arr, 0 AS hop
  FROM fs ORDER BY deg DESC, item ASC LIMIT {TR_SEEDS}
),
{",".join(_tr_round_sql(f"a{k - 1}", f"c{k}", f"a{k}", k)
          for k in range(1, TR_HOPS + 1)).lstrip(",")}
SELECT coalesce(a.hop, -1) AS hop,
       CAST(count(*) AS BIGINT) AS n_items,
       min(a.arr) AS min_arrival_us,
       max(a.arr) AS max_arrival_us
FROM fs LEFT JOIN a{TR_HOPS} a ON a.node = fs.item
GROUP BY coalesce(a.hop, -1)
ORDER BY hop
"""


#: ppm offset keeping the modularity dividend positive: |numerator·1e6|
#: ≤ 1e6·denominator, so adding 2e6·denominator guarantees a positive
#: dividend offset — defensive only: Spark DIV and DuckDB // both
#: truncate toward zero (verified: -7//2 = -3 in DuckDB, incl. HUGEINT),
#: so they agree on every sign; the offset keeps the dividend positive
#: so the result is also floor==trunc if a kernel ever moves to Python
#: (// floors there)
_MOD_OFF = 2_000_000


def community_modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the :func:`label_propagation_communities`
    partition — the quality score that says whether the LPA labels
    actually describe community structure (Q ≈ 0: no better than random
    given the degree sequence; Q ≳ 0.3: strong), completing the graph
    panel the way ``clustering_coefficient_bands`` completed triangles.
    Shares :func:`_lpa_label_rounds`, so it grades exactly the
    partition the LPA query reports.

    **Integer-exact** (the Pregel-as-joins discipline): with ``m2`` the
    directed edge count (= 2m on the symmetrized list), ``e2_c`` the
    directed intra-community edge count and ``D_c`` the community
    degree sum, ``Q·m2² = Σ_c (m2·e2_c − D_c²)`` — all integer in
    DECIMAL(38,0)/HUGEINT, one ppm division at the end with a
    positivity offset (Q may be negative; Spark DIV and DuckDB ``//``
    both truncate toward zero so they already agree on every sign — the
    offset is defensive, keeping the dividend positive so floor and
    trunc coincide should a kernel ever move to Python's flooring
    ``//``).

    Scale: two label joins on the edge list (partitioned once, reused
    from the LPA rounds), a per-community rollup (bounded by |V|), and
    1-row global aggregates — no window, no collect.
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    edges = _edges(spark, sf_dir).repartition("dst").cache()
    labels = _lpa_label_rounds(edges)[1].persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e2 = (
        edges.join(
            labels.selectExpr("node AS src", "label AS c_src"), "src"
        )
        .join(labels.selectExpr("node AS dst", "label AS c_dst"), "dst")
        .filter(F.col("c_src") == F.col("c_dst"))
        .groupBy(F.col("c_src").alias("label"))
        .agg(F.count(F.lit(1)).alias("e2"))
    )
    ds = (
        deg.join(labels.selectExpr("node AS src", "label"), "src")
        .groupBy("label")
        .agg(
            F.sum("deg").alias("d_sum"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )
    comm = ds.join(e2, "label", "left").na.fill(0, ["e2"])
    m2row = edges.agg(F.count(F.lit(1)).alias("m2"))
    glob = (
        comm.crossJoin(F.broadcast(m2row))
        .agg(
            F.count(F.lit(1)).alias("n_communities"),
            F.sum(
                F.expr(
                    "CAST(m2 AS DECIMAL(38,0)) * e2"
                    " - CAST(d_sum AS DECIMAL(38,0)) * d_sum"
                )
            ).alias("num"),
            F.max("m2").alias("m2"),
        )
        .withColumn(
            "den", F.expr("CAST(m2 AS DECIMAL(38,0)) * m2")
        )
    )
    out = (
        comm.crossJoin(F.broadcast(glob))
        .select(
            "label",
            F.col("n_members").cast("long").alias("n_members"),
            F.col("d_sum").cast("long").alias("deg_sum"),
            F.expr("CAST(e2 DIV 2 AS BIGINT)").alias("e_in"),
            F.expr(
                "CAST(((CAST(m2 AS DECIMAL(38,0)) * e2"
                " - CAST(d_sum AS DECIMAL(38,0)) * d_sum) * 1000000"
                f" + {_MOD_OFF} * den) DIV den - {_MOD_OFF} AS BIGINT)"
            ).alias("contrib_ppm"),
            F.expr(
                f"CAST((num * 1000000 + {_MOD_OFF} * den) DIV den"
                f" - {_MOD_OFF} AS BIGINT)"
            ).alias("modularity_ppm"),
            F.expr("CAST(m2 DIV 2 AS BIGINT)").alias("n_edges"),
            F.col("n_communities").cast("long").alias("n_communities"),
        )
        .orderBy(F.desc("n_members"), F.asc("label"))
        .limit(LPA_TOP)
    )
    return scoped_cache(out, edges, labels)


MODULARITY_SQL = f"""
{_EDGES_SQL}
l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
{_lpa_iter_sql('l0', 'l1')},
{_lpa_iter_sql('l1', 'l2')},
lab AS (SELECT node, label FROM l{N_LPA_ROUNDS}),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
m2t AS (SELECT CAST(count(*) AS HUGEINT) AS m2 FROM edges),
e2t AS (
  SELECT a.label, CAST(count(*) AS HUGEINT) AS e2
  FROM edges e
  JOIN lab a ON a.node = e.src
  JOIN lab b ON b.node = e.dst
  WHERE a.label = b.label
  GROUP BY a.label
),
ds AS (
  SELECT l.label, CAST(sum(d.deg) AS HUGEINT) AS d_sum,
         CAST(count(*) AS BIGINT) AS n_members
  FROM lab l JOIN deg d ON d.node = l.node
  GROUP BY l.label
),
comm AS (
  SELECT ds.label, ds.n_members, ds.d_sum,
         coalesce(e2t.e2, 0) AS e2
  FROM ds LEFT JOIN e2t ON e2t.label = ds.label
),
gtot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_communities,
         sum(m2t.m2 * comm.e2 - comm.d_sum * comm.d_sum) AS num,
         max(m2t.m2) AS m2,
         max(m2t.m2) * max(m2t.m2) AS den
  FROM comm, m2t
)
SELECT c.label, c.n_members,
       CAST(c.d_sum AS BIGINT) AS deg_sum,
       CAST(c.e2 // 2 AS BIGINT) AS e_in,
       CAST(((g.m2 * c.e2 - c.d_sum * c.d_sum) * 1000000
             + {_MOD_OFF} * g.den) // g.den - {_MOD_OFF} AS BIGINT)
         AS contrib_ppm,
       CAST((g.num * 1000000 + {_MOD_OFF} * g.den) // g.den
            - {_MOD_OFF} AS BIGINT) AS modularity_ppm,
       CAST(g.m2 // 2 AS BIGINT) AS n_edges,
       g.n_communities
FROM comm c, gtot g
ORDER BY c.n_members DESC, c.label ASC
LIMIT {LPA_TOP}
"""


SPARK_QUERIES = {
    "pagerank_click_graph": pagerank_click_graph,
    "label_propagation_communities": label_propagation_communities,
    "click_graph_bfs_reach": click_graph_bfs_reach,
    "hits_hub_authority": hits_hub_authority,
    "personalized_pagerank_seeds": personalized_pagerank_seeds,
    "cheapest_path_bellman_ford": cheapest_path_bellman_ford,
    "degree_assortativity": degree_assortativity,
    "community_modularity_score": community_modularity_score,
    "temporal_reachability_items": temporal_reachability_items,
}
ORACLE_SQL = {
    "pagerank_click_graph": PAGERANK_SQL,
    "label_propagation_communities": LPA_SQL,
    "click_graph_bfs_reach": BFS_REACH_SQL,
    "hits_hub_authority": HITS_SQL,
    "personalized_pagerank_seeds": PPR_SQL,
    "cheapest_path_bellman_ford": BELLMAN_FORD_SQL,
    "degree_assortativity": ASSORTATIVITY_SQL,
    "community_modularity_score": MODULARITY_SQL,
    "temporal_reachability_items": TEMPORAL_REACH_SQL,
}
