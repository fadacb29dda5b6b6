"""Deequ-style numeric profiler: stats + equi-width histograms."""

from __future__ import annotations

from collections import defaultdict

from projet_meteo_etl_spark.operators import profiling
from tests.conftest import SF_SMOKE

SF = SF_SMOKE


def test_stats_invariants(spark):
    rows = {r["col_name"]: r for r in profiling.profile_numeric_stats(spark, SF_SMOKE).collect()}
    assert set(rows) == set(profiling.PROFILE_COLS)
    n = {r["n_rows"] for r in rows.values()}
    assert len(n) == 1, "every column profiles the same row count"
    for r in rows.values():
        assert r["n_null"] == 0
        assert r["min_val"] <= r["mean_r"] <= r["max_val"]
        assert 1 <= r["n_distinct"] <= r["n_rows"]


def test_histogram_counts_reconcile_with_stats(spark):
    stats = {r["col_name"]: r for r in profiling.profile_numeric_stats(spark, SF_SMOKE).collect()}
    hist = profiling.profile_numeric_histograms(spark, SF_SMOKE).collect()
    per_col = defaultdict(int)
    for r in hist:
        assert 0 <= r["bucket"] < profiling.N_BUCKETS
        assert r["lo_edge"] <= r["hi_edge"]
        assert r["n"] > 0
        per_col[r["col_name"]] += r["n"]
    for c, total in per_col.items():
        assert total == stats[c]["n_rows"] - stats[c]["n_null"]


def test_profiler_plans_scan_once_per_pass(spark):
    """The long format must come from ONE stacked explode, not one scan
    per profiled column."""
    stats_plan = (
        profiling.profile_numeric_stats(spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert stats_plan.count("Scan parquet") == 1, stats_plan
    hist_plan = (
        profiling.profile_numeric_histograms(spark, SF_SMOKE)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # value stream + edges aggregate: two passes, never N-columns scans
    assert hist_plan.count("Scan parquet") == 2, hist_plan
    assert "BroadcastExchange" in hist_plan, hist_plan


def test_correlations_bounds_and_known_relationship(spark):
    rows = {
        (r["col_x"], r["col_y"]): r
        for r in profiling.profile_correlations(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(profiling.CORR_PAIRS)
    for r in rows.values():
        assert -1.0 <= r["corr"] <= 1.0
        assert r["n_rows"] > 0
    # the synthetic generator draws measures independently — every
    # pairwise correlation is near zero (this pins that the formula
    # isn't accidentally reporting self-correlation ~1)
    assert all(abs(r["corr"]) < 0.2 for r in rows.values())


def test_correlations_bit_deterministic_across_partitioning(spark):
    a = [tuple(r) for r in profiling.profile_correlations(spark, SF_SMOKE).collect()]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = [tuple(r) for r in profiling.profile_correlations(spark, SF_SMOKE).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_group_percentiles_are_ordered_data_values(spark):
    from projet_meteo_etl_spark.catalog import load_table

    vals = {
        r["l_returnflag"]: r
        for r in profiling.profile_group_percentiles(spark, SF_SMOKE).collect()
    }
    assert len(vals) == 3
    universe = {
        row["l_extendedprice"]
        for row in load_table(spark, SF_SMOKE, "lineitem")
        .select("l_extendedprice")
        .collect()
    }
    for r in vals.values():
        assert r["p25"] <= r["p50"] <= r["p75"] <= r["p95"]
        for tag in ("p25", "p50", "p75", "p95"):
            assert r[tag] in universe, "percentile_disc returns real elements"


def test_benford_digits_complete_and_normalized(spark):
    rows = profiling.profile_benford_digits(spark, SF_SMOKE).collect()
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert abs(sum(r["observed_share"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["benford_share"] for r in rows) - 1.0) < 1e-4


def test_higher_moments_match_builtin_population_stats(spark):
    from pyspark.sql import functions as F

    from projet_meteo_etl_spark.catalog import load_table

    got = {
        r["col_name"]: (r["skewness"], r["excess_kurtosis"])
        for r in profiling.profile_higher_moments(spark, SF_SMOKE).collect()
    }
    li = load_table(spark, SF_SMOKE, "lineitem")
    for c in profiling.PROFILE_COLS:
        # compare against Spark's built-in population skewness/kurtosis
        # on the cent-rounded values (the operator's exact input)
        cents = (F.floor(F.col(c) * 100 + 0.5) / 100.0).alias("x")
        ref = li.select(cents).agg(
            F.skewness("x").alias("s"), F.kurtosis("x").alias("k")
        ).collect()[0]
        assert abs(got[c][0] - ref["s"]) < 1e-3
        assert abs(got[c][1] - ref["k"]) < 1e-3


def test_moments_ignore_null_rows(spark, tmp_path):
    """Pairwise deletion: NULLs in one column must not skew corr /
    skewness of the others — moments over a frame with planted NULLs
    equal moments over the same frame with those rows dropped."""
    import pyspark.sql.functions as F

    from projet_meteo_etl_spark.operators.profiling import (
        profile_correlations,
        profile_higher_moments,
    )

    rows = []
    for i in range(60):
        rows.append((float(i % 7 + 1), 100.0 + 3.0 * i, 0.01 * (i % 5), 0.02))
    clean = list(rows)
    # planted dirty rows: l_tax NULL (kills every pair involving l_tax
    # and the l_tax moments, nothing else)
    for i in range(20):
        rows.append((1.0, 9999.0, 0.0, None))

    schema = "l_quantity double, l_extendedprice double, l_discount double, l_tax double"
    dirty_dir, clean_dir = str(tmp_path / "dirty"), str(tmp_path / "clean")
    spark.createDataFrame(rows, schema).write.parquet(dirty_dir + "/lineitem.parquet")
    spark.createDataFrame(clean, schema).write.parquet(clean_dir + "/lineitem.parquet")

    d_corr = {(r["col_x"], r["col_y"]): r for r in profile_correlations(spark, dirty_dir).collect()}
    c_corr = {(r["col_x"], r["col_y"]): r for r in profile_correlations(spark, clean_dir).collect()}
    for pair, r in d_corr.items():
        if "l_tax" in pair:
            # tax pairs use only the 60 complete rows
            assert r["n_rows"] == 60
            assert r["corr"] == c_corr[pair]["corr"]
    h_dirty = {r["col_name"]: r for r in profile_higher_moments(spark, dirty_dir).collect()}
    h_clean = {r["col_name"]: r for r in profile_higher_moments(spark, clean_dir).collect()}
    assert h_dirty["l_tax"]["n_rows"] == 60
    assert h_dirty["l_tax"]["skewness"] == h_clean["l_tax"]["skewness"]


def test_winsorized_stats_invariants(spark):
    from projet_meteo_etl_spark.operators.profiling import (
        WINSOR_HI_PCT,
        WINSOR_LO_PCT,
        winsorized_value_stats,
    )

    rows = winsorized_value_stats(spark, SF).collect()
    assert len(rows) == 5  # one per event_type
    for r in rows:
        assert r["p01_value"] <= r["p99_value"]
        # clip counts bounded by the tail masses
        assert r["n_clip_low"] <= r["n_rows"] * WINSOR_LO_PCT / 100.0
        assert r["n_clip_high"] <= r["n_rows"] * (100 - WINSOR_HI_PCT) / 100.0 + 1
        # clipping pulls the mean toward the interior, never outside it
        assert r["p01_value"] <= r["mean_after"] <= r["p99_value"]


def test_shuffle_skew_audit_reconciles(spark):
    from projet_meteo_etl_spark.operators.profiling import shuffle_skew_audit
    from projet_meteo_etl_spark.catalog import load_table

    rows = {r["key_space"]: r for r in shuffle_skew_audit(spark, SF).collect()}
    assert set(rows) == {
        "lineitem.l_orderkey", "lineitem.l_suppkey",
        "events.user_id", "events.event_type",
    }
    n_l = load_table(spark, SF, "lineitem").count()
    n_e = load_table(spark, SF, "events").count()
    assert rows["lineitem.l_orderkey"]["n_rows"] == n_l
    assert rows["events.user_id"]["n_rows"] == n_e
    for r in rows.values():
        assert r["skew_ratio"] >= 1.0
        assert r["max_key_rows"] * r["n_keys"] >= r["n_rows"]
    # 5 event types over 10k events: the canonical skewed key
    assert rows["events.event_type"]["n_keys"] == 5
