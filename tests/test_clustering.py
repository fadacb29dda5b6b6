"""KMeans + SemDeDup invariants: partitioning of the corpus, Lloyd
improvement, prune-set consistency, and plan shape (broadcast assign)."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.operators import clustering as cl

SF = "/root/testdata/sf0.001"


def test_kmeans_partitions_corpus(spark):
    rep = cl.kmeans_embedding_clusters(spark, SF).collect()
    n = load_table(spark, SF, "embeddings").count()
    assert sum(r.n_members for r in rep) == n  # every vector exactly once
    assert sum(r.vec_checksum for r in rep) == n * (n - 1) // 2
    assert all(r.avg_dist_micros >= 0 for r in rep)
    assert [r.cid for r in rep] == sorted(r.cid for r in rep)


def test_lloyd_iteration_does_not_increase_mean_distance(spark):
    """Mean distance to the assigned centroid after the update+reassign
    must not exceed the initial assignment's (Lloyd monotonicity)."""
    vecs = cl._vectors(spark, SF)
    init = vecs.filter(F.col("vec_id") < cl.K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    a1 = cl._assign(vecs, init)
    a2 = cl._assign(vecs, cl._update(a1))
    d1 = a1.agg(F.sum("d")).collect()[0][0]
    d2 = a2.agg(F.sum("d")).collect()[0][0]
    assert d2 <= d1 + 1e-9


def test_semdedup_counts_consistent(spark):
    rep = cl.semdedup_prune(spark, SF).collect()
    for r in rep:
        assert r.n_pruned + r.n_kept == r.n_members
        assert 0 <= r.n_pruned < r.n_members  # canonical (min-id) always kept
        if r.max_cos is not None:
            assert -1.000001 <= r.max_cos <= 1.000001


def test_assignment_broadcasts_centroids(spark):
    """The assignment pass must broadcast the K-row centroid side — the
    corpus scan itself must not shuffle for a cross join."""
    vecs = cl._vectors(spark, SF)
    init = vecs.filter(F.col("vec_id") < cl.K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    plan = cl._assign(vecs, init)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_pq_codebook_audit_invariants(spark):
    """Every subspace encodes every vector, codebook usage is within
    [1, K_PQ], and quantization error is non-negative; the checksum
    changes across subspaces (codebooks are genuinely independent)."""
    from projet_meteo_etl_spark.operators.clustering import (
        K_PQ,
        M_SUB,
        pq_codebook_audit,
    )

    rows = pq_codebook_audit(spark, "/root/testdata/sf0.01").collect()
    assert len(rows) == M_SUB
    n = rows[0]["n_vecs"]
    for r in rows:
        assert r["n_vecs"] == n
        assert 1 <= r["codes_used"] <= K_PQ
        assert r["err_micros"] >= 0
    assert len({r["code_checksum"] for r in rows}) > 1


def test_ann_pq_adc_topk_shape_and_determinism(spark):
    """5 queries x 10 ranked neighbors, ranks dense from 1, no query in
    its own result, identical across runs (approximate in RECALL, exact
    in OUTPUT — the distance table is deterministic integer micros)."""
    from projet_meteo_etl_spark.operators.clustering import (
        N_PQ_QUERIES,
        PQ_TOP_K,
        ann_pq_adc_topk,
    )

    a = ann_pq_adc_topk(spark, "/root/testdata/sf0.01").collect()
    b = ann_pq_adc_topk(spark, "/root/testdata/sf0.01").collect()
    assert a == b
    assert len(a) == N_PQ_QUERIES * PQ_TOP_K
    by_q: dict[int, list] = {}
    for r in a:
        assert r.neighbor_id != r.query_id
        assert r.adc_micros >= 0
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        assert [r.rank for r in rows] == list(range(1, PQ_TOP_K + 1))
        dists = [r.adc_micros for r in rows]
        assert dists == sorted(dists)


def test_pca_power_component_matches_integer_replay(spark):
    """The component must equal a pure-Python integer replay of the
    quantize → exact covariance → L∞-normalize → 3 power iterations
    pipeline (truncating division throughout, as both engines do)."""
    import math

    import duckdb

    from projet_meteo_etl_spark.operators.clustering import (
        PCA_DIM,
        PCA_ITERS,
        pca_power_component,
    )

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    vecs = [
        [int(math.floor(float(x) * 1e6 + 0.5)) for x in row[0]]
        for row in duckdb.sql(
            f"SELECT embedding FROM '{SF}/embeddings.parquet'"
        ).fetchall()
    ]
    n, d = len(vecs), PCA_DIM
    s = [sum(v[i] for v in vecs) for i in range(d)]
    g = [
        [sum(v[i] * v[j] for v in vecs) for j in range(d)]
        for i in range(d)
    ]
    c = [[n * g[i][j] - s[i] * s[j] for j in range(d)] for i in range(d)]
    cmax = max(max(abs(x) for x in row) for row in c)
    m = [[tdiv(c[i][j] * 1_000_000, max(cmax, 1)) for j in range(d)] for i in range(d)]
    x = [1_000_000] * d
    mk = 1
    for _ in range(PCA_ITERS):
        y = [sum(m[i][j] * x[j] for j in range(d)) for i in range(d)]
        mk = max(max(abs(v) for v in y), 1)
        x = [tdiv(v * 1_000_000, mk) for v in y]
    got = pca_power_component(spark, SF).collect()
    assert [r["dim"] for r in got] == list(range(1, d + 1))
    assert [r["comp_micro"] for r in got] == x
    assert all(r["growth_linf"] == mk for r in got)
    # L∞ normalization: the dominant coordinate sits exactly at ±1e6
    assert max(abs(v) for v in x) == 1_000_000
