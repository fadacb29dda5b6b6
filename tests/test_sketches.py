"""Accuracy contracts for the sketch aggregates (rows-only queries)."""

from __future__ import annotations

from projet_meteo_etl_spark.operators import sketches

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_rsd(spark):
    rows = sketches.approx_user_stats(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / max(r.exact_users, 1)
        assert rel_err < 0.05, f"{r.event_type}: {rel_err}"
        assert r.p50 <= r.p95 <= r.p99


def test_hll_merge_equals_oneshot(spark):
    rows = sketches.hll_sketch_mergeability(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        # merging per-day sketches must equal sketching the whole input
        assert r.merged_estimate == r.oneshot_estimate
        rel_err = abs(r.oneshot_estimate - r.exact_users) / max(r.exact_users, 1)
        assert rel_err < 0.05
