"""Item co-occurrence / Jaccard: shape, determinism, cap semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_meteo_etl_spark.operators.cooccur import (
    MIN_SUPPORT,
    TOP_N,
    _user_items,
    item_cooccurrence_topk,
    item_jaccard_similarity,
)
from tests.conftest import SF_SMOKE


def test_cooccurrence_shape_and_order(spark):
    rows = item_cooccurrence_topk(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= TOP_N
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["i1"] < r["i2"] for r in rows)


def test_jaccard_bounds_and_support(spark):
    rows = item_jaccard_similarity(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= TOP_N
    for r in rows:
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["co_users"] >= MIN_SUPPORT
    js = [r["jaccard"] for r in rows]
    assert js == sorted(js, reverse=True)


def test_jaccard_against_python_oracle(spark):
    """Brute-force user-set Jaccard in Python must agree with the
    join-based plan (top row set, exact values at 9 decimals)."""
    ui = _user_items(spark, SF_SMOKE).collect()
    sets: dict[int, set[int]] = {}
    for r in ui:
        sets.setdefault(r["item"], set()).add(r["user_id"])
    expect = {}
    items = sorted(sets)
    for a in items:
        for b in items:
            if a >= b:
                continue
            co = len(sets[a] & sets[b])
            if co >= MIN_SUPPORT:
                import math

                j = co / len(sets[a] | sets[b])
                expect[(a, b)] = math.floor(j * 1e9 + 0.5) / 1e9
    got = {
        (r["i1"], r["i2"]): r["jaccard"]
        for r in item_jaccard_similarity(spark, SF_SMOKE).collect()
    }
    for k, v in got.items():
        assert expect[k] == v


def test_user_item_cap_is_deterministic(spark):
    ui = _user_items(spark, SF_SMOKE)
    per_user = ui.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    assert per_user.filter(F.col("n") > 1000).count() == 0
    a = sorted(map(tuple, ui.collect()))
    b = sorted(map(tuple, _user_items(spark, SF_SMOKE).collect()))
    assert a == b and len(a) > 0


def test_triangle_count_against_python_oracle(spark):
    """Degree-oriented wedge closure must equal brute-force triangle
    enumeration on the support-filtered co-click graph."""
    from itertools import combinations

    from projet_meteo_etl_spark.operators.cooccur import (
        TRI_MIN_SUPPORT,
        item_triangle_count,
    )
    from tests.conftest import SF_ORACLE

    # sf0.001 has no support>=5 triangles; the gate SF does
    ui = _user_items(spark, SF_ORACLE).collect()
    sets: dict[int, set[int]] = {}
    for r in ui:
        sets.setdefault(r["item"], set()).add(r["user_id"])
    items = sorted(sets)
    adj: dict[int, set[int]] = {i: set() for i in items}
    for a, b in combinations(items, 2):
        if len(sets[a] & sets[b]) >= TRI_MIN_SUPPORT:
            adj[a].add(b)
            adj[b].add(a)
    part: dict[int, int] = {}
    for a, b, c in combinations(items, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for x in (a, b, c):
                part[x] = part.get(x, 0) + 1
    expect = sorted(part.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_N]
    got = [
        (r["item"], r["n_triangles"])
        for r in item_triangle_count(spark, SF_ORACLE).collect()
    ]
    assert got == expect
    assert len(got) > 0


def test_kcore_peel_against_python_oracle(spark):
    """Synchronous peeling in Python must agree round-for-round."""
    from itertools import combinations

    from projet_meteo_etl_spark.operators.cooccur import (
        K_CORE,
        KCORE_ROUNDS,
        TRI_MIN_SUPPORT,
        item_kcore_peel,
    )
    from tests.conftest import SF_ORACLE

    ui = _user_items(spark, SF_ORACLE).collect()
    sets: dict[int, set[int]] = {}
    for r in ui:
        sets.setdefault(r["item"], set()).add(r["user_id"])
    items = sorted(sets)
    adj: dict[int, set[int]] = {i: set() for i in items}
    for a, b in combinations(items, 2):
        if len(sets[a] & sets[b]) >= TRI_MIN_SUPPORT:
            adj[a].add(b)
            adj[b].add(a)
    nodes = {i for i in items if adj[i]}
    expect = {i: (len(adj[i]), 0) for i in nodes}
    alive = set(nodes)
    for rnd in range(1, KCORE_ROUNDS + 1):
        deg = {i: sum(1 for j in adj[i] if j in alive) for i in alive}
        peel = {i for i in alive if deg[i] < K_CORE}
        for i in peel:
            expect[i] = (expect[i][0], rnd)
        alive -= peel
    got = {
        r["item"]: (r["initial_degree"], r["peel_round"])
        for r in item_kcore_peel(spark, SF_ORACLE).collect()
    }
    assert got == expect
    # the fixture graph must exercise every round AND leave a core
    assert {v[1] for v in got.values()} == set(range(KCORE_ROUNDS + 1))


def test_kcore_peels_nodes_isolated_by_peeling(spark):
    """A node whose entire neighborhood peels in round 1 drops to
    degree 0 — it must peel in round 2, not silently survive because it
    vanished from the edge list (the round-2 advisory bug)."""
    from projet_meteo_etl_spark.operators.cooccur import (
        K_CORE,
        _kcore_peel_rounds,
    )

    # a (K_CORE+2)-clique that survives every round, plus a hub X=1000
    # joined to K_CORE degree-1 leaves: leaves peel round 1, X (initial
    # degree exactly K_CORE) is isolated and must peel round 2
    clique = [
        (a, b)
        for a in range(K_CORE + 2)
        for b in range(K_CORE + 2)
        if a < b
    ]
    star = [(1000, 2000 + i) for i in range(K_CORE)]
    edges = spark.createDataFrame(clique + star, ["i1", "i2"])
    got = {
        r["item"]: (r["initial_degree"], r["peel_round"])
        for r in _kcore_peel_rounds(edges).collect()
    }
    for i in range(K_CORE + 2):
        assert got[i] == (K_CORE + 1, 0), f"clique node {i} must survive"
    for i in range(K_CORE):
        assert got[2000 + i] == (1, 1), "leaves peel in round 1"
    assert got[1000] == (K_CORE, 2), "isolated-by-peeling hub peels round 2"


def test_kcore_residual_reports_truncated_iteration(spark):
    """Convergence telemetry: an 'onion' whose peeling cascade is one
    layer deeper than the bounded unroll must report a NON-ZERO
    ``n_pending_peel`` (the truncated iteration is not presented as
    converged), while a graph that reaches fixpoint reports 0."""
    from projet_meteo_etl_spark.operators.cooccur import (
        K_CORE,
        KCORE_ROUNDS,
        _kcore_peel_rounds,
    )

    assert KCORE_ROUNDS == 3, "onion construction below is depth-sized"
    # depth-4 onion: leaves peel r1, hubs r2, mids r3 — and X survives
    # every bounded round at degree K_CORE (its 10 mid supporters are
    # alive at each check) but is stranded once the mids peel in r3,
    # so round 4 WOULD peel it: n_pending_peel must be 1.
    edges = []
    X = 0
    mids = list(range(1, 11))  # 10 mids: deg = 9 hubs + X = K_CORE
    nxt = 100
    for m in mids:
        edges.append((X, m))
        for _ in range(K_CORE - 1):  # 9 hubs per mid
            h = nxt
            nxt += 1
            edges.append((m, h))
            for _ in range(K_CORE - 1):  # 9 leaves per hub
                edges.append((h, nxt))
                nxt += 1
    df = spark.createDataFrame(edges, ["i1", "i2"])
    rows = _kcore_peel_rounds(df).collect()
    by_item = {r["item"]: r for r in rows}
    assert by_item[X]["peel_round"] == 0, "X survives the bounded unroll"
    assert {r["n_pending_peel"] for r in rows} == {1}, (
        "exactly X is pending another peel round"
    )
    # fixpoint case: a clique alone converges — residual must be 0
    clique = [
        (a, b) for a in range(K_CORE + 2) for b in range(K_CORE + 2) if a < b
    ]
    rows2 = _kcore_peel_rounds(
        spark.createDataFrame(clique, ["i1", "i2"])
    ).collect()
    assert {r["n_pending_peel"] for r in rows2} == {0}


def test_association_rules_metrics_are_self_consistent(spark):
    """confidence/lift must equal the integer formulas over the row's
    own counts, directions must be mirrored, and order must hold."""
    from projet_meteo_etl_spark.operators.cooccur import (
        association_rules_lift,
    )

    import duckdb

    from projet_meteo_etl_spark.operators.cooccur import USER_ITEM_CAP

    # the per-user item cap never removes a user's LAST item, so the
    # distinct-user count is cap-independent
    assert USER_ITEM_CAP >= 1
    n_total = duckdb.sql(
        f"""
        SELECT count(DISTINCT user_id)
        FROM '{SF_SMOKE}/events.parquet'
        WHERE event_type = 'click'
          AND TRY_CAST(props->>'k' AS BIGINT) IS NOT NULL
        """
    ).fetchone()[0]
    rows = association_rules_lift(spark, SF_SMOKE).collect()
    assert rows, "smoke fixture must yield rules"
    lifts = [r["lift_ppm"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    for r in rows:
        assert r["confidence_ppm"] == r["n_co"] * 1_000_000 // r["n_ant"]
        assert r["lift_ppm"] == (
            r["n_co"] * n_total * 1_000_000 // (r["n_ant"] * r["n_cons"])
        )
        assert r["n_co"] >= 3  # MIN_SUPPORT floor


def test_ra_index_matches_python_replay(spark):
    """RA scores must equal a dict replay of Σ 1e6 DIV deg over shared
    deg≤cap items."""
    import duckdb
    from collections import defaultdict
    from itertools import combinations

    from projet_meteo_etl_spark.operators.cooccur import (
        RA_DEG_CAP,
        USER_ITEM_CAP,
        link_prediction_ra_index,
    )

    ui = duckdb.sql(
        f"""
        WITH clicked AS (
          SELECT DISTINCT user_id, TRY_CAST(props->>'k' AS BIGINT) AS item
          FROM '{SF_SMOKE}/events.parquet'
          WHERE event_type = 'click'
            AND TRY_CAST(props->>'k' AS BIGINT) IS NOT NULL
        )
        SELECT user_id, item FROM (
          SELECT user_id, item,
                 row_number() OVER (PARTITION BY user_id ORDER BY item) rn
          FROM clicked
        ) WHERE rn <= {USER_ITEM_CAP}
        """
    ).fetchall()
    deg = defaultdict(int)
    for _, item in ui:
        deg[item] += 1
    users_by_item = defaultdict(list)
    for u, item in ui:
        if deg[item] <= RA_DEG_CAP:
            users_by_item[item].append(u)
    ra = defaultdict(int)
    shared = defaultdict(int)
    for item, us in users_by_item.items():
        c = 1_000_000 // deg[item]
        for a, b in combinations(sorted(us), 2):
            ra[(a, b)] += c
            shared[(a, b)] += 1
    expect = sorted(
        ((-(s), a, b) for (a, b), s in ra.items())
    )[:25]
    got = [
        (-(r["ra_micro"]), r["u1"], r["u2"])
        for r in link_prediction_ra_index(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_clustering_coefficient_identities(spark):
    """The 'all' row must carry exactly 3 triangle slots per closed
    triangle, band rows must partition it, and every coefficient must
    be a valid ppm rate."""
    from projet_meteo_etl_spark.operators.cooccur import (
        clustering_coefficient_bands,
    )

    from tests.conftest import SF_ORACLE

    # sf0.001 has no support>=5 backbone; the gate SF does
    rows = {r["band"]: r for r in
            clustering_coefficient_bands(spark, SF_ORACLE).collect()}
    assert "all" in rows
    alln = rows.pop("all")
    assert alln["tri_slots"] % 3 == 0  # every triangle has 3 corners
    assert sum(r["n_items"] for r in rows.values()) == alln["n_items"]
    assert sum(r["tri_slots"] for r in rows.values()) == alln["tri_slots"]
    assert sum(r["n_wedges"] for r in rows.values()) == alln["n_wedges"]
    for r in list(rows.values()) + [alln]:
        assert 0 <= r["transitivity_ppm"] <= 1_000_000
        assert 0 <= r["mean_local_cc_ppm"] <= 1_000_000


def test_frequent_triples_apriori_consistency(spark):
    """Downward closure + metric identities: every reported rule's
    triple support must not exceed its antecedent pair support or its
    consequent item support; confidence = n_triple*1e6 DIV n_ant; and
    the result is partition-independent."""
    from projet_meteo_etl_spark.operators.cooccur import (
        TRIPLE3_MIN_SUPPORT,
        frequent_triples_lift,
    )
    from tests.conftest import SF_ORACLE

    rows = frequent_triples_lift(spark, SF_ORACLE).collect()
    assert rows, "sf0.01 has support>=2 triples"
    for r in rows:
        assert r["ant1"] < r["ant2"] and r["cons"] not in (r["ant1"], r["ant2"])
        assert TRIPLE3_MIN_SUPPORT <= r["n_triple"] <= min(r["n_ant"], r["n_cons"])
        assert r["confidence_ppm"] == r["n_triple"] * 1_000_000 // r["n_ant"]
        assert 0 < r["confidence_ppm"] <= 1_000_000
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        rows2 = frequent_triples_lift(spark, SF_ORACLE).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]


def test_frequent_triples_match_python_replay(spark):
    """Triple supports must equal a brute-force Python count over the
    capped baskets (smoke SF is small enough to enumerate)."""
    from itertools import combinations

    from projet_meteo_etl_spark.operators.cooccur import (
        TRIPLE3_MIN_SUPPORT,
        _user_items,
        frequent_triples_lift,
    )
    from tests.conftest import SF_SMOKE

    baskets = {}
    for r in _user_items(spark, SF_SMOKE).collect():
        baskets.setdefault(r["user_id"], set()).add(r["item"])
    support = {}
    for items in baskets.values():
        for t in combinations(sorted(items), 3):
            support[t] = support.get(t, 0) + 1
    expect = {t: n for t, n in support.items() if n >= TRIPLE3_MIN_SUPPORT}

    got_rows = frequent_triples_lift(spark, SF_SMOKE).collect()
    for r in got_rows:
        # reconstruct the sorted triple this rule came from
        t = tuple(sorted((r["ant1"], r["ant2"], r["cons"])))
        assert expect.get(t) == r["n_triple"], (t, r)


def test_rec_list_quality_identities(spark):
    """Panel identities: coverage counts distinct recommended items
    against the catalog; ILD is a mean pairwise distance in [0, 1e6];
    every user gets at most REC_K recommendations; and the one-row
    result is partition-independent."""
    from projet_meteo_etl_spark.operators.cooccur import (
        REC_K,
        rec_list_quality,
    )
    from tests.conftest import SF_ORACLE

    r = rec_list_quality(spark, SF_ORACLE).collect()[0]
    assert 0 < r["n_rec_distinct"] <= r["catalog_n"]
    assert r["n_rec_rows"] <= r["n_users"] * REC_K
    assert r["coverage_ppm"] == r["n_rec_distinct"] * 1_000_000 // r["catalog_n"]
    assert 0 <= r["ild_ppm"] <= 1_000_000
    assert r["pop_lift_ppm"] > 0
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        r2 = rec_list_quality(spark, SF_ORACLE).collect()[0]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert r.asDict() == r2.asDict()
