"""PageRank over the bipartite click graph: determinism + sanity."""

from __future__ import annotations

from projet_meteo_etl_spark.operators.graph import (
    SCALE,
    TOP_N,
    pagerank_click_graph,
)
from tests.conftest import SF_SMOKE


def test_pagerank_output_shape_and_order(spark):
    rows = pagerank_click_graph(spark, SF_SMOKE).collect()
    assert len(rows) == TOP_N
    ranks = [r["rank_scaled"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(0 < r["rank_scaled"] < SCALE for r in rows)
    kinds = {r["node"][:2] for r in rows}
    assert kinds <= {"u:", "i:"} and kinds


def test_pagerank_is_bit_deterministic_across_runs(spark):
    """Integer-scaled contributions make the result independent of
    partitioning/summation order: two runs (different partition counts)
    must agree exactly, not approximately."""
    a = [(r["node"], r["rank_scaled"]) for r in pagerank_click_graph(spark, SF_SMOKE).collect()]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = [(r["node"], r["rank_scaled"]) for r in pagerank_click_graph(spark, SF_SMOKE).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_lpa_matches_python_replay(spark):
    """The community rollup must equal a dict-based Python replay of
    2 synchronous LPA rounds (modal neighbor label, min-label ties)."""
    from collections import Counter, defaultdict

    import duckdb

    from projet_meteo_etl_spark.operators.graph import (
        LPA_TOP,
        N_LPA_ROUNDS,
        label_propagation_communities,
    )

    pairs = duckdb.sql(
        f"SELECT DISTINCT 'u:' || user_id,"
        f" 'i:' || CAST(props->>'k' AS BIGINT)"
        f" FROM '{SF_SMOKE}/events.parquet'"
        f" WHERE event_type = 'click' AND (props->>'k') IS NOT NULL"
    ).fetchall()
    nbrs = defaultdict(list)
    for u, i in pairs:
        nbrs[u].append(i)
        nbrs[i].append(u)
    labels = {v: v for v in nbrs}
    prev = labels
    for _ in range(N_LPA_ROUNDS):
        prev = labels
        labels = {
            v: min(
                (l for l in Counter(labels[n] for n in ns).items()),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for v, ns in nbrs.items()
        }
    expect = sorted(
        Counter(labels.values()).items(), key=lambda kv: (-kv[1], kv[0])
    )[:LPA_TOP]
    expect_changed = sum(1 for v in labels if labels[v] != prev[v])
    got = label_propagation_communities(spark, SF_SMOKE).collect()
    assert [(r["label"], r["n_members"]) for r in got] == expect
    # convergence telemetry: residual equals the replay's flip count
    assert {r["n_changed_last_round"] for r in got} == {expect_changed}


def test_ktruss_matches_python_replay(spark):
    """Edge supports + 2 peel rounds replayed with a pure-Python
    triangle enumeration over the same capped co-click graph."""
    import duckdb
    from itertools import combinations

    from projet_meteo_etl_spark.operators.cooccur import (
        K_TRUSS,
        USER_ITEM_CAP,
        item_ktruss_edges,
    )

    sf = "/root/testdata/sf0.001"
    rows = item_ktruss_edges(spark, sf).collect()
    baskets = duckdb.sql(
        f"SELECT DISTINCT user_id, CAST(props->>'k' AS BIGINT) AS item"
        f" FROM '{sf}/events.parquet'"
        f" WHERE event_type = 'click' AND (props->>'k') IS NOT NULL"
    ).fetchall()
    by_user: dict = {}
    for u, i in baskets:
        by_user.setdefault(u, []).append(i)
    from collections import Counter

    co: Counter = Counter()
    for items in by_user.values():
        items = sorted(items)[:USER_ITEM_CAP]
        for a, b in combinations(items, 2):
            co[(a, b)] += 1
    # P90 cut: smallest support whose cumulative count reaches 90%
    sups = sorted(co.values())
    cut = sups[(9 * len(sups) + 9) // 10 - 1]
    edges = {e for e, n in co.items() if n >= cut}

    def peel(es):
        adj: dict = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = Counter()
        for a, b in es:
            for c in adj[a] & adj[b]:
                sup[(a, b)] += 1
        return {e for e in es if sup[e] >= K_TRUSS - 2}

    r1 = peel(edges)
    r2 = peel(r1)
    assert [(r["round"], r["n_edges_in"], r["n_edges_kept"]) for r in rows] == [
        (1, len(edges), len(r1)),
        (2, len(r1), len(r2)),
    ]
    assert len(r2) <= len(r1) <= len(edges)
    # convergence telemetry: a round that drops nothing proves fixpoint
    assert [r["converged"] for r in rows] == [
        len(edges) == len(r1),
        len(r1) == len(r2),
    ]


def test_bfs_reach_matches_python_replay(spark):
    """Distance histogram must equal a literal Python BFS from the
    (degree DESC, node ASC) top-5 item seeds."""
    from collections import Counter, defaultdict

    import duckdb

    from projet_meteo_etl_spark.operators.graph import (
        BFS_HOPS,
        BFS_SEEDS,
        click_graph_bfs_reach,
    )

    sf = "/root/testdata/sf0.001"
    pairs = duckdb.sql(
        f"SELECT DISTINCT 'u:' || user_id,"
        f" 'i:' || TRY_CAST(props->>'k' AS BIGINT)"
        f" FROM '{sf}/events.parquet'"
        f" WHERE event_type = 'click'"
        f" AND TRY_CAST(props->>'k' AS BIGINT) IS NOT NULL"
    ).fetchall()
    adj = defaultdict(set)
    deg = Counter()
    for u, i in pairs:
        adj[u].add(i)
        adj[i].add(u)
        deg[u] += 1
        deg[i] += 1
    seeds = sorted(
        (n for n in deg if n.startswith("i:")),
        key=lambda n: (-deg[n], n),
    )[:BFS_SEEDS]
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    for k in range(1, BFS_HOPS + 1):
        nxt = []
        for n in frontier:
            for m in adj[n]:
                if m not in dist:
                    dist[m] = k
                    nxt.append(m)
        frontier = nxt
    hist = Counter(dist.get(n, -1) for n in adj)
    total = len(adj)
    got = click_graph_bfs_reach(spark, sf).collect()
    assert {
        r["distance"]: (r["n_nodes"], r["share_ppm"]) for r in got
    } == {d: (c, c * 1_000_000 // total) for d, c in hist.items()}


def test_bellman_ford_matches_python_replay(spark):
    """The weighted cheapest-path report must equal a dict-based
    Bellman-Ford replay (same weights, seeds, and round count)."""
    import duckdb
    from collections import defaultdict

    from projet_meteo_etl_spark.operators.graph import (
        BF_ROUNDS,
        BF_SEEDS,
        BF_TOP_N,
        cheapest_path_bellman_ford,
    )

    pc = duckdb.sql(
        f"""
        SELECT 'u:' || user_id AS u,
               'i:' || TRY_CAST(props->>'k' AS BIGINT) AS i, count(*) AS c
        FROM '{SF_SMOKE}/events.parquet'
        WHERE event_type = 'click'
          AND 'i:' || TRY_CAST(props->>'k' AS BIGINT) IS NOT NULL
        GROUP BY 1, 2
        """
    ).fetchall()
    adj = defaultdict(list)
    deg = defaultdict(int)
    for u, i, c in pc:
        w = 1000 + 1_000_000 // c
        adj[u].append((i, w))
        adj[i].append((u, w))
        deg[u] += 1
        deg[i] += 1
    seeds = sorted(
        (n for n in deg if n.startswith("i:")),
        key=lambda n: (-deg[n], n),
    )[:BF_SEEDS]
    dist = {n: 0 for n in seeds}
    for _ in range(BF_ROUNDS):
        nxt = dict(dist)
        for node, cost in dist.items():
            for dst, w in adj[node]:
                if dst not in nxt or cost + w < nxt[dst]:
                    nxt[dst] = cost + w
        dist = nxt
    expect = sorted(
        ((c, n) for n, c in dist.items() if c > 0),
    )[:BF_TOP_N]
    got = [
        (r["cost"], r["node"])
        for r in cheapest_path_bellman_ford(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_assortativity_bounds_and_determinism(spark):
    """Assortativity is a correlation: must lie in [-1, 1]; exact
    integer moments make it partition-independent."""
    from projet_meteo_etl_spark.operators.graph import degree_assortativity

    r = degree_assortativity(spark, SF_SMOKE).collect()[0]
    assert -1.0 <= r["assortativity"] <= 1.0
    assert r["n_edges"] > 0 and r["sum_deg"] > 0
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        r2 = degree_assortativity(spark, SF_SMOKE).collect()[0]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert r.asDict() == r2.asDict()


def test_assortativity_degenerate_graph_emits_null(spark, tmp_path):
    """Every node same degree ⇒ var_x·var_y = 0: both engines must emit
    NULL (r8 ADVICE: unguarded sqrt-denominator threw DIVIDE_BY_ZERO
    under ANSI Spark while the DuckDB oracle returned NULL)."""
    import duckdb

    from projet_meteo_etl_spark.operators.graph import (
        ASSORTATIVITY_SQL,
        degree_assortativity,
    )

    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, "click", '{"k": 7}')],
        "user_id long, event_type string, props string",
    ).write.parquet(d + "/events.parquet")
    r = degree_assortativity(spark, d).collect()[0]
    assert r["n_edges"] == 2 and r["assortativity"] is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{d}/events.parquet/*.parquet')"
    )
    o = con.execute(ASSORTATIVITY_SQL).fetchone()
    assert o[0] == 2 and o[2] is None


def test_modularity_contract_and_replay(spark):
    """Modularity bounds + internal identities: Q in [-1e6, 1e6] ppm,
    per-community e_in <= (deg_sum)/2, edges total consistent, and the
    global score equals a Python replay over the same LPA labels."""
    from projet_meteo_etl_spark.operators.graph import (
        _edges,
        _lpa_label_rounds,
        community_modularity_score,
    )

    rows = community_modularity_score(spark, SF_SMOKE).collect()
    assert rows
    q = rows[0]["modularity_ppm"]
    assert -1_000_000 <= q <= 1_000_000
    for r in rows:
        assert r["modularity_ppm"] == q and r["n_edges"] == rows[0]["n_edges"]
        assert 0 <= r["e_in"] <= r["deg_sum"] // 2
        assert -1_000_000 <= r["contrib_ppm"] <= 1_000_000

    edges = [(r["src"], r["dst"]) for r in _edges(spark, SF_SMOKE).collect()]
    lab = {
        r["node"]: r["label"]
        for r in _lpa_label_rounds(
            _edges(spark, SF_SMOKE)
        )[1].collect()
    }
    m2 = len(edges)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    e2 = {}
    dsum = {}
    for s, d in edges:
        if lab[s] == lab[d]:
            e2[lab[s]] = e2.get(lab[s], 0) + 1
    for n, dg in deg.items():
        dsum[lab[n]] = dsum.get(lab[n], 0) + dg
    num = sum(m2 * e2.get(c, 0) - dsum[c] * dsum[c] for c in dsum)
    den = m2 * m2
    expect_q = (num * 1_000_000 + 2_000_000 * den) // den - 2_000_000
    assert q == expect_q


def test_temporal_reachability_respects_time(spark):
    """Every time-respecting path is also a static path (temporal
    reach ⊆ static reach from the same seeds), arrivals are
    non-decreasing in hop (a hop-k node's arrival cannot precede the
    earliest seed start), and a Python replay of the earliest-arrival
    iteration reproduces the rollup exactly."""
    from projet_meteo_etl_spark.operators.graph import (
        TR_HOPS,
        TR_SEEDS,
        temporal_reachability_items,
    )
    from projet_meteo_etl_spark.catalog import load_table
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    rows = temporal_reachability_items(spark, SF_SMOKE).collect()
    assert rows and all(-1 <= r["hop"] <= TR_HOPS for r in rows)

    e = load_table(spark, SF_SMOKE, "events").filter(
        F.col("event_type") == "click"
    )
    clicks = e.select(
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
        F.unix_micros("ts").alias("t"),
        "event_id",
    ).filter(F.col("item").isNotNull())
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    seq = clicks.select("item", "t", F.lag("item").over(w).alias("prev"))
    edges = {}
    for r in seq.filter(
        F.col("prev").isNotNull() & (F.col("prev") != F.col("item"))
    ).collect():
        edges.setdefault(r["prev"], []).append((r["item"], r["t"]))
    stats = {}
    for r in clicks.groupBy("item").agg(
        F.min("t").alias("t0"), F.count(F.lit(1)).alias("deg")
    ).collect():
        stats[r["item"]] = (r["t0"], r["deg"])
    seeds = sorted(stats, key=lambda i: (-stats[i][1], i))[:TR_SEEDS]
    arr = {s: stats[s][0] for s in seeds}
    hop = {s: 0 for s in seeds}
    for k in range(1, TR_HOPS + 1):
        new = {}
        for src, a in arr.items():
            for dst, t in edges.get(src, []):
                if t >= a and (dst not in new or t < new[dst]):
                    new[dst] = t
        for dst, t in new.items():
            if dst not in arr:
                arr[dst] = t
                hop[dst] = k
            elif t < arr[dst]:
                arr[dst] = t
    expect = {}
    for item in stats:
        h = hop.get(item, -1)
        agg = expect.setdefault(h, [0, None, None])
        agg[0] += 1
        if item in arr:
            agg[1] = arr[item] if agg[1] is None else min(agg[1], arr[item])
            agg[2] = arr[item] if agg[2] is None else max(agg[2], arr[item])
    got = {
        r["hop"]: [r["n_items"], r["min_arrival_us"], r["max_arrival_us"]]
        for r in rows
    }
    assert got == expect
