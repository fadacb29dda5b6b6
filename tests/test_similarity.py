"""ANN paths: IVF exactness at full probe, approximate recall bounds."""

from __future__ import annotations

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


def _topk(rows):
    out = {}
    for r in rows:
        out.setdefault(r.query_id, []).append((r.neighbor_id, r.cosine))
    return out


def test_ivf_full_probe_equals_bruteforce(spark):
    """Probing every cell makes IVF exhaustive — must match brute force
    exactly (same cosines, same order)."""
    k = load_table(spark, SF, "embeddings").select("label").distinct().count()
    ivf = _topk(sim.ann_ivf_topk(spark, SF, nprobe=k).collect())
    bf = _topk(sim.ann_bruteforce_topk(spark, SF).collect())
    assert ivf == bf


def test_ivf_partial_probe_is_subset_with_recall(spark):
    ivf = _topk(sim.ann_ivf_topk(spark, SF, nprobe=2).collect())
    bf = _topk(sim.ann_bruteforce_topk(spark, SF).collect())
    assert set(ivf) == set(bf)  # same query set
    recalls = []
    for q, pairs in bf.items():
        bf_ids = {n for n, _ in pairs}
        ivf_ids = {n for n, _ in ivf[q]}
        # approximate results never exceed the true best cosine
        assert max(c for _, c in ivf[q]) <= max(c for _, c in pairs)
        recalls.append(len(bf_ids & ivf_ids) / len(bf_ids))
    assert sum(recalls) / len(recalls) > 0.1  # sanity floor, logged value matters
    print(f"ivf nprobe=2 mean recall@10: {sum(recalls) / len(recalls):.3f}")


def test_lsh_recall_floor(spark):
    lsh = _topk(sim.ann_lsh_topk(spark, SF).collect())
    bf = _topk(sim.ann_bruteforce_topk(spark, SF).collect())
    recalls = []
    for q, pairs in bf.items():
        if q not in lsh:
            recalls.append(0.0)
            continue
        recalls.append(
            len({n for n, _ in pairs} & {n for n, _ in lsh[q]}) / len(pairs)
        )
    assert sum(recalls) / len(recalls) > 0.05


def test_matryoshka_quality_monotone_in_dims(spark):
    from projet_meteo_etl_spark.operators.similarity import (
        MRL_DIMS,
        embedding_matryoshka_quality,
    )

    rows = {
        r["trunc_dim"]: r
        for r in embedding_matryoshka_quality(spark, SF).collect()
    }
    assert set(rows) == set(MRL_DIMS)
    n = {r["n_pairs"] for r in rows.values()}
    assert len(n) == 1 and n.pop() > 0
    for r in rows.values():
        assert 0 <= r["mean_dev_micros"] <= r["max_dev_micros"]
        assert 0 <= r["n_sign_agree"] <= r["n_pairs"]
    # more dimensions preserve the full cosine at least as well
    dims = sorted(rows)
    means = [rows[d]["mean_dev_micros"] for d in dims]
    assert means == sorted(means, reverse=True)


def test_ivf_recall_curve_monotone(spark):
    """Recall@k must be in [0,1], non-decreasing in probe width, and
    reconcile with its own hit counts."""
    from projet_meteo_etl_spark.operators.similarity import (
        RECALL_NPROBES,
        TOP_K,
        N_QUERIES,
        ann_ivf_recall_curve,
    )

    rows = ann_ivf_recall_curve(spark, SF).collect()
    assert [r["nprobe"] for r in rows] == list(RECALL_NPROBES)
    prev = -1.0
    for r in rows:
        assert r["n_truth"] == N_QUERIES * TOP_K
        assert 0 <= r["n_hits"] <= r["n_truth"]
        assert prev <= r["recall_at_k"] <= 1.0
        prev = r["recall_at_k"]


def test_persisted_ivf_equals_direct(spark):
    """The stored-index query must return exactly the direct IVF
    plan's rows, and the index read must prune to probed cells."""
    from projet_meteo_etl_spark.operators.similarity import (
        ann_ivf_persisted_index,
        ann_ivf_topk,
    )

    direct = [tuple(r) for r in ann_ivf_topk(spark, SF).collect()]
    stored_df = ann_ivf_persisted_index(spark, SF)
    stored = [tuple(r) for r in stored_df.collect()]
    assert stored == direct
    plan = stored_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan  # cell probe = partition pruning
