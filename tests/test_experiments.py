"""A/B assignment determinism + entropy bounds."""

from __future__ import annotations

import math

from projet_meteo_etl_spark.plans.experiments import (
    ENT_SCALE,
    ab_test_analysis,
    user_behavior_entropy,
)
from tests.conftest import SF_SMOKE

SF = "/root/testdata/sf0.01"


def test_ab_counts_partition_users_and_z_is_finite(spark):
    from projet_meteo_etl_spark.catalog import load_table

    r = ab_test_analysis(spark, SF).collect()[0]
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    assert r["users_a"] + r["users_b"] == n_users
    assert 0 <= r["conv_a"] <= r["users_a"]
    assert 0 <= r["conv_b"] <= r["users_b"]
    assert 0.0 <= r["rate_a"] <= 1.0 and 0.0 <= r["rate_b"] <= 1.0
    assert math.isfinite(r["z_score"])
    # hash split is roughly balanced
    assert abs(r["users_a"] - r["users_b"]) < n_users * 0.4


def test_ab_assignment_is_deterministic(spark):
    a = ab_test_analysis(spark, SF).collect()[0]
    b = ab_test_analysis(spark, SF).collect()[0]
    assert tuple(a) == tuple(b)


def test_entropy_bounds(spark):
    rows = user_behavior_entropy(spark, SF_SMOKE).collect()
    assert rows
    max_ent = int(math.log(5) * ENT_SCALE) + 5
    for r in rows:
        assert 1 <= r["n_types"] <= 5
        assert 0 <= r["entropy_millinats"] <= max_ent
        if r["n_types"] == 1:
            assert r["entropy_millinats"] == 0


def test_chi_square_marginals_reconcile(spark):
    from collections import defaultdict

    from projet_meteo_etl_spark.plans.experiments import (
        chi_square_priority_weekday,
    )

    rows = chi_square_priority_weekday(spark, SF).collect()
    assert rows
    n = sum(r["obs"] for r in rows)
    by_dow = defaultdict(int)
    exp_total = 0
    for r in rows:
        assert 1 <= r["dow"] <= 7
        assert r["chi2_micros"] >= 0
        by_dow[r["dow"]] += r["obs"]
        exp_total += r["expected_micros"]
    # expected counts reproduce N (up to flooring of each cell)
    assert abs(exp_total / 1_000_000 - n) < len(rows)


def test_revenue_delta_contributors_shares(spark):
    """Movement shares are a partition of ~1e6 ppm (floor slack ≤ one
    ppm per slice), ranks are dense by |delta|, and each delta equals
    rev_b − rev_a at cent precision."""
    from projet_meteo_etl_spark.plans.experiments import revenue_delta_contributors

    rows = revenue_delta_contributors(spark, "/root/testdata/sf0.01").collect()
    assert rows
    total_ppm = sum(r["move_share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= total_ppm <= 1_000_000
    assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
    moves = [abs(round(r["delta"] * 100)) for r in rows]
    assert moves == sorted(moves, reverse=True)
    for r in rows:
        assert abs((r["rev_b"] - r["rev_a"]) - r["delta"]) < 0.011
