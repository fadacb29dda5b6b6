"""Model-eval statistics (plans/model_eval.py): exact AUC and KS
verified against independent pure-Python replays (a third engine
besides Spark and the DuckDB oracle), plus domain invariants."""

from __future__ import annotations

import duckdb

from projet_meteo_etl_spark.plans.model_eval import (
    AUC_NEG_TYPES,
    auc_roc_eval,
    ks_value_drift,
)

SF = "/root/testdata/sf0.001"


def _events():
    return duckdb.sql(
        f"SELECT event_type, epoch_us(ts) // 86400000000 AS eday,"
        f" CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents"
        f" FROM '{SF}/events.parquet'"
    ).fetchall()


def test_auc_matches_pair_count_replay(spark):
    """auc_ppm must equal the literal Mann–Whitney pair count
    (wins + half-ties over all pos×neg pairs) done row-by-row."""
    rows = {r["neg_type"]: r for r in auc_roc_eval(spark, SF).collect()}
    assert set(rows) == set(AUC_NEG_TYPES)
    ev = _events()
    pos = sorted(c for t, _, c in ev if t == "purchase")
    for neg_type, r in rows.items():
        neg = sorted(c for t, _, c in ev if t == neg_type)
        assert (r["n_pos"], r["n_neg"]) == (len(pos), len(neg))
        num2 = 0
        import bisect

        for p in pos:
            lo = bisect.bisect_left(neg, p)
            hi = bisect.bisect_right(neg, p)
            num2 += 2 * lo + (hi - lo)
        assert r["auc_ppm"] == num2 * 1_000_000 // (2 * len(pos) * len(neg))
        assert 0 <= r["auc_ppm"] <= 1_000_000


def test_ks_matches_ecdf_replay(spark):
    r = ks_value_drift(spark, SF).collect()[0]
    ev = _events()
    days = [d for _, d, _ in ev]
    mid = (min(days) + max(days)) // 2
    early = sorted(c for _, d, c in ev if d <= mid)
    late = sorted(c for _, d, c in ev if d > mid)
    assert (r["n_early"], r["n_late"]) == (len(early), len(late))
    import bisect

    best_d2, best_at = -1, None
    for s in sorted(set(early) | set(late)):
        c1 = bisect.bisect_right(early, s)
        c2 = bisect.bisect_right(late, s)
        d2 = abs(c1 * len(late) - c2 * len(early))
        if d2 > best_d2:
            best_d2, best_at = d2, s
    assert r["at_cents"] == best_at
    assert r["ks_ppm"] == best_d2 * 1_000_000 // (len(early) * len(late))
    assert 0 <= r["ks_ppm"] <= 1_000_000
