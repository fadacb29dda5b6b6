"""Accuracy contracts for the sketch aggregates."""

from __future__ import annotations

from projet_meteo_etl_spark.operators import sketches

SF = "/root/testdata/sf0.01"


def test_approx_distinct_within_rsd(spark):
    rows = sketches.approx_user_stats(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        # the contract flags the oracle asserts as literal 1s must
        # actually be computed as 1 by the Spark side
        assert r.approx_users_ok == 1, r.event_type
        assert (r.sketch_p50_ok, r.sketch_p95_ok, r.sketch_p99_ok) == (
            1,
            1,
            1,
        ), r.event_type
        assert r.p50 <= r.p95 <= r.p99


def test_hll_merge_equals_oneshot(spark):
    rows = sketches.hll_sketch_mergeability(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        # merging per-day sketches must equal sketching the whole input
        assert r.merged_eq_oneshot == 1, r.event_type
        assert r.oneshot_ok == 1, r.event_type
        assert r.exact_users > 0


def test_cms_one_sided_error_and_probe_coverage(spark):
    from projet_meteo_etl_spark.operators.sketches import (
        CMS_PROBE_K,
        cms_heavy_hitters,
    )

    rows = cms_heavy_hitters(spark, SF).collect()
    assert len(rows) == CMS_PROBE_K
    for r in rows:
        # count-min never underestimates
        assert r["cms_est"] >= r["true_tf"]
        assert r["overcount"] == r["cms_est"] - r["true_tf"]
    tfs = [r["true_tf"] for r in rows]
    assert tfs == sorted(tfs, reverse=True)


def test_portable_hll_accuracy_and_merge(spark):
    """Portable-HLL estimate within the m=256 error envelope of the
    exact count, and the shard-merged path agrees with the direct path
    exactly (register max is associative)."""
    rows = sketches.portable_hll_distinct(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["merge_agrees"] == 1
        assert r["hll_direct"] == r["hll_merged"]
        # 1.04/sqrt(256) ≈ 6.5% standard error; allow 4 sigma
        assert abs(r["hll_direct"] - r["n_exact"]) / r["n_exact"] < 0.26


def test_join_size_estimate_one_sided(spark):
    """Every CMS row's inner-product estimate upper-bounds the exact
    self-join size (collisions only add cross terms)."""
    rows = sketches.join_size_estimate(spark, SF).collect()
    assert len(rows) == sketches.CMS_D
    for r in rows:
        assert r["est_join_rows"] >= r["exact_join_rows"] > 0
        assert r["over_ppm"] >= 0


def test_hll_set_operations_inclusion_exclusion(spark):
    """Union estimate bounded by the parts; derived intersection close
    to exact (HLL with m=256 ≈ 6.5% σ; allow 4σ on the sum of three
    sketches); identity est_a + est_b = est_union + est_intersect."""
    from projet_meteo_etl_spark.operators.sketches import (
        HLL_PAIRS,
        hll_set_operations,
    )

    rows = hll_set_operations(spark, SF).collect()
    assert len(rows) == len(HLL_PAIRS)
    for r in rows:
        assert max(r["est_a"], r["est_b"]) <= r["est_union"] + 1e-9
        assert r["est_union"] <= r["est_a"] + r["est_b"] + 1e-9
        # inclusion-exclusion identity on the rounded estimates
        assert abs(
            (r["est_a"] + r["est_b"]) - (r["est_union"] + r["est_intersect"])
        ) < 2e-3
        assert r["n_exact_intersect"] > 0
        assert r["rel_err"] < 0.8  # three compounded sketches, sane band


def test_join_order_advisor_bounds_and_choice(spark):
    """Estimates are one-sided overestimates of the exact sizes, and
    exactly one candidate is chosen (the min-estimate one)."""
    from projet_meteo_etl_spark.operators.sketches import join_order_advisor

    rows = {r["candidate"]: r for r in join_order_advisor(spark, SF).collect()}
    assert set(rows) == {"lineitem*orders", "orders*customer"}
    for r in rows.values():
        assert r["est_rows"] >= r["exact_rows"]
        assert r["over_ppm"] >= 0
    picked = [r for r in rows.values() if r["run_first"] == 1]
    assert len(picked) == 1
    assert picked[0]["est_rows"] == min(r["est_rows"] for r in rows.values())


def test_hll_sliding_window_accuracy(spark):
    """Trailing-7-day register merges must track the exact trailing
    distinct count within HLL error, cover every day, and never fall
    below the corresponding single-day baseline behavior (the window is
    a union, and HLL union is monotone in the register values)."""
    from projet_meteo_etl_spark.operators.sketches import (
        hll_sliding_distinct_users,
    )
    from tests.conftest import SF_SMOKE

    rows = hll_sliding_distinct_users(spark, SF_SMOKE).collect()
    days = [r["day"] for r in rows]
    assert days == sorted(days) and len(days) == len(set(days)) > 0
    for r in rows:
        assert r["n_exact_7d"] > 0
        # linear-counting regime at this SF: generous 20% error bound
        assert r["rel_err"] < 0.2, (r["day"], r["rel_err"])
