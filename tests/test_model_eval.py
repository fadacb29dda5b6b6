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


def test_anova_matches_integer_replay(spark):
    from projet_meteo_etl_spark.plans.model_eval import anova_value_by_type

    r = anova_value_by_type(spark, SF).collect()[0]
    ev = _events()
    groups: dict = {}
    for t, _, c in ev:
        g = groups.setdefault(t, [0, 0, 0])
        g[0] += 1
        g[1] += c
        g[2] += c * c
    k = len(groups)
    n = sum(g[0] for g in groups.values())
    s = sum(g[1] for g in groups.values())
    q = sum(g[2] for g in groups.values())
    t_sum = sum(g[1] * g[1] * 1_000_000 // g[0] for g in groups.values())
    ssb = t_sum - s * s * 1_000_000 // n
    ssw = q * 1_000_000 - t_sum
    assert (r["k"], r["n"]) == (k, n)
    assert r["ssb_micro"] == ssb
    assert r["ssw_micro"] == ssw
    assert r["f_micro"] == ssb * (n - k) * 1_000_000 // (ssw * (k - 1))
    assert r["f_micro"] >= 0


def test_kaplan_meier_matches_recursion_replay(spark):
    from projet_meteo_etl_spark.plans.model_eval import (
        KM_SCALE,
        kaplan_meier_first_purchase,
    )

    rows = kaplan_meier_first_purchase(spark, SF).collect()
    ev = _events_users()
    d_end = max(d for _, _, d in ev)
    per: dict = {}
    for u, t, d in ev:
        s = per.setdefault(u, [None, None])
        if t == "signup":
            s[0] = d if s[0] is None else min(s[0], d)
        if t == "purchase":
            s[1] = d if s[1] is None else min(s[1], d)
    durations = []
    for signup, purch in per.values():
        if signup is None:
            continue
        if purch is not None and purch >= signup:
            durations.append((purch - signup, 1))
        else:
            durations.append((d_end - signup, 0))
    grid: dict = {}
    for t, is_ev in durations:
        g = grid.setdefault(t, [0, 0])
        g[is_ev == 0] += 1  # [d_t, c_t]
    ts = sorted(grid)
    expect, s_micro = [], KM_SCALE
    at_risk = len(durations)
    for t in ts:
        d_t, c_t = grid[t]
        s_micro = s_micro * (at_risk - d_t) // at_risk
        expect.append((t, at_risk, d_t, c_t, s_micro))
        at_risk -= d_t + c_t
    assert [
        (r["duration_days"], r["n_at_risk"], r["n_events"], r["n_censored"],
         r["survival_micro"])
        for r in rows
    ] == expect
    sm = [r["survival_micro"] for r in rows]
    assert sm == sorted(sm, reverse=True) and all(0 <= v <= KM_SCALE for v in sm)


def _events_users():
    return duckdb.sql(
        f"SELECT user_id, event_type, epoch_us(ts) // 86400000000"
        f" FROM '{SF}/events.parquet'"
    ).fetchall()


def _daily_series():
    return duckdb.sql(
        f"SELECT epoch_us(ts) // 86400000000 AS eday,"
        f" CAST(sum(CASE WHEN event_type = 'purchase'"
        f"   THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)"
        f"   ELSE 0 END) AS BIGINT),"
        f" CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)"
        f"   AS BIGINT)"
        f" FROM '{SF}/events.parquet' GROUP BY 1"
    ).fetchall()


def _doubled_avg_ranks(xs):
    """2× average rank (integer) per element, average-rank ties."""
    s = sorted(xs)
    import bisect

    return [
        2 * bisect.bisect_left(s, x) + (bisect.bisect_right(s, x)
                                        - bisect.bisect_left(s, x)) + 1
        for x in xs
    ]


def test_spearman_matches_rank_replay(spark):
    from projet_meteo_etl_spark.plans.model_eval import (
        spearman_daily_rev_clicks,
    )

    r = spearman_daily_rev_clicks(spark, SF).collect()[0]
    daily = _daily_series()
    u = _doubled_avg_ranks([rev for _, rev, _ in daily])
    v = _doubled_avg_ranks([clk for _, _, clk in daily])
    n = len(daily)
    su, sv = sum(u), sum(v)
    num = n * sum(a * b for a, b in zip(u, v)) - su * sv
    den_x = n * sum(a * a for a in u) - su * su
    den_y = n * sum(b * b for b in v) - sv * sv
    sign = -1 if num < 0 else 1
    assert (r["n_days"], r["num"], r["den_x"], r["den_y"]) == (
        n, num, den_x, den_y,
    )
    assert r["rho_sq_signed_micro"] == sign * (
        num * num * 1_000_000 // (den_x * den_y)
    )
    assert -1_000_000 <= r["rho_sq_signed_micro"] <= 1_000_000


def test_kendall_matches_pair_replay(spark):
    from projet_meteo_etl_spark.plans.model_eval import (
        kendall_daily_rev_clicks,
    )

    r = kendall_daily_rev_clicks(spark, SF).collect()[0]
    daily = sorted(_daily_series())
    conc = disc = tie_x = tie_y = n0 = 0
    for i in range(len(daily)):
        for j in range(i + 1, len(daily)):
            n0 += 1
            dx = daily[i][1] - daily[j][1]
            dy = daily[i][2] - daily[j][2]
            if dx == 0:
                tie_x += 1
            if dy == 0:
                tie_y += 1
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    assert (
        r["n_pairs"], r["concordant"], r["discordant"],
        r["tie_x"], r["tie_y"],
    ) == (n0, conc, disc, tie_x, tie_y)
    num = conc - disc
    sign = -1 if num < 0 else 1
    assert r["tau_b_sq_signed_micro"] == sign * (
        num * num * 1_000_000 // ((n0 - tie_x) * (n0 - tie_y))
    )
    # tau and rho must agree on the DIRECTION of the association
    from projet_meteo_etl_spark.plans.model_eval import (
        spearman_daily_rev_clicks,
    )

    rho = spearman_daily_rev_clicks(spark, SF).collect()[0]
    if r["tau_b_sq_signed_micro"] != 0 and rho["rho_sq_signed_micro"] != 0:
        assert (r["tau_b_sq_signed_micro"] > 0) == (
            rho["rho_sq_signed_micro"] > 0
        )


def _typed_cents():
    return duckdb.sql(
        f"SELECT event_type, event_id,"
        f" epoch_us(ts) // 86400000000 AS eday,"
        f" CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents"
        f" FROM '{SF}/events.parquet'"
    ).fetchall()


def test_pinball_matches_rank_replay(spark):
    """Per type: the rank-selected P90 and the literal ×10 pinball sum
    over the test half, replayed row-by-row in Python."""
    from projet_meteo_etl_spark.plans.model_eval import pinball_loss_eval

    rows = {r["event_type"]: r for r in pinball_loss_eval(spark, SF).collect()}
    ev = _typed_cents()
    d0 = min(r[2] for r in ev)
    d1 = max(r[2] for r in ev)
    mid = (d0 + d1) // 2
    types = sorted({r[0] for r in ev})
    assert set(rows) == set(types)
    for t in types:
        train = sorted(
            (c, eid) for ty, eid, d, c in ev if ty == t and d <= mid
        )
        test = [c for ty, _, d, c in ev if ty == t and d > mid]
        q90 = train[(9 * len(train) + 9) // 10 - 1][0]
        loss10 = sum(
            9 * (c - q90) if c >= q90 else (q90 - c) for c in test
        )
        r = rows[t]
        assert (r["n_train"], r["n_test"], r["q90_cents"]) == (
            len(train), len(test), q90,
        )
        assert r["pinball_loss10"] == loss10
        assert r["mean_loss_microcents"] == loss10 * 1_000_000 // (
            10 * len(test)
        )


def test_conformal_matches_rank_replay(spark):
    from projet_meteo_etl_spark.plans.model_eval import (
        conformal_interval_calibration,
    )

    rows = {
        r["event_type"]: r
        for r in conformal_interval_calibration(spark, SF).collect()
    }
    ev = _typed_cents()
    d0 = min(r[2] for r in ev)
    d1 = max(r[2] for r in ev)
    c1 = d0 + (d1 - d0) // 3
    c2 = d0 + (2 * (d1 - d0)) // 3
    for t in sorted({r[0] for r in ev}):
        fit = sorted(
            (c, eid) for ty, eid, d, c in ev if ty == t and d <= c1
        )
        med = fit[(len(fit) + 1) // 2 - 1][0]
        cal = sorted(
            (abs(c - med), eid)
            for ty, eid, d, c in ev
            if ty == t and c1 < d <= c2
        )
        k = (9 * (len(cal) + 1) + 9) // 10
        clamped = int(k > len(cal))
        qhat = cal[min(k, len(cal)) - 1][0]
        test = [c for ty, _, d, c in ev if ty == t and d > c2]
        covered = sum(abs(c - med) <= qhat for c in test)
        r = rows[t]
        assert (
            r["n_fit"], r["n_cal"], r["n_test"], r["median_cents"],
            r["qhat_cents"], r["qhat_clamped"], r["n_covered"],
        ) == (len(fit), len(cal), len(test), med, qhat, clamped, covered)
        assert r["coverage_ppm"] == covered * 1_000_000 // len(test)
        # a 90% conformal interval should cover roughly 90%: sanity band
        assert 600_000 <= r["coverage_ppm"] <= 1_000_000


def test_nelson_aalen_matches_km_grid_replay(spark):
    """NA hazard replayed from the same duration grid the KM test
    builds; cross-check consistency with the KM curve's risk sets."""
    from projet_meteo_etl_spark.plans.model_eval import (
        KM_SCALE,
        kaplan_meier_first_purchase,
        nelson_aalen_cum_hazard,
    )

    na = nelson_aalen_cum_hazard(spark, SF).collect()
    km = kaplan_meier_first_purchase(spark, SF).collect()
    assert [
        (r["duration_days"], r["n_at_risk"], r["n_events"], r["n_censored"])
        for r in na
    ] == [
        (r["duration_days"], r["n_at_risk"], r["n_events"], r["n_censored"])
        for r in km
    ]
    cum = 0
    for r in na:
        step = r["n_events"] * KM_SCALE // r["n_at_risk"]
        assert r["hazard_step_micro"] == step
        cum += step
        assert r["cum_hazard_micro"] == cum
    h = [r["cum_hazard_micro"] for r in na]
    assert h == sorted(h) and h[0] >= 0


def test_propensity_brier_matches_python_replay(spark):
    from projet_meteo_etl_spark.plans.model_eval import (
        propensity_forecast_brier,
    )

    r = propensity_forecast_brier(spark, SF).collect()[0]
    rows = duckdb.sql(
        f"SELECT CAST(json_extract_string(props, '$.k') AS BIGINT),"
        f" event_type, epoch_us(ts) // 86400000000"
        f" FROM '{SF}/events.parquet'"
        f" WHERE json_extract_string(props, '$.k') IS NOT NULL"
    ).fetchall()
    d0 = min(d for _, _, d in rows)
    d1 = max(d for _, _, d in rows)
    mid = (d0 + d1) // 2
    per: dict = {}
    for item, et, d in rows:
        v = per.setdefault(item, [0, 0, 0, 0])  # v1 p1 v2 p2
        if et == "view":
            v[0 if d <= mid else 2] += 1
        elif et == "purchase":
            v[1 if d <= mid else 3] += 1
    kept = {i: v for i, v in per.items() if v[0] > 0 and v[2] > 0}
    g = sum(v[1] for v in kept.values()) * 1_000_000 // sum(
        v[0] for v in kept.values()
    )
    werr = werr_base = tv2 = 0
    for v1, p1, v2, p2 in kept.values():
        pred = p1 * 1_000_000 // v1
        real = p2 * 1_000_000 // v2
        werr += v2 * (pred - real) ** 2
        werr_base += v2 * (g - real) ** 2
        tv2 += v2
    assert (r["n_items"], r["total_views2"]) == (len(kept), tv2)
    assert r["brier_ppm2"] == werr // tv2
    assert r["brier_baseline_ppm2"] == werr_base // tv2
    assert r["skill_ppm"] == 1_000_000 - werr * 1_000_000 // max(werr_base, 1)


def test_bandit_replay_matches_python_replay(spark):
    """The day-granular replay estimator must equal a Python replay of
    the no-peeking greedy policy (smoothed-CTR argmax with min-item
    tie-break over strictly-prior history)."""
    from pyspark.sql import functions as F

    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.plans.model_eval import bandit_replay_ctr
    from tests.conftest import SF_SMOKE

    e = (
        load_table(spark, SF_SMOKE, "events")
        .select(
            F.to_date("ts").alias("day"),
            F.get_json_object("props", "$.k").cast("long").alias("item"),
            "event_type",
        )
        .filter(
            F.col("item").isNotNull()
            & F.col("event_type").isin("view", "click")
        )
        .collect()
    )
    daily = {}
    for r in e:
        cell = daily.setdefault((r["day"], r["item"]), [0, 0])
        cell[0 if r["event_type"] == "view" else 1] += 1
    days = sorted({d for d, _ in daily})
    items = sorted({i for _, i in daily})
    cum = {i: [0, 0] for i in items}
    mv = mc = 0
    for d in days:
        pick = max(
            items,
            key=lambda i: ((cum[i][1] + 1) * 1_000_000 // (cum[i][0] + 2), -i),
        )
        v, c = daily.get((d, pick), (0, 0))
        mv += v
        mc += c
        for i in items:
            dv, dc = daily.get((d, i), (0, 0))
            cum[i][0] += dv
            cum[i][1] += dc
    r = bandit_replay_ctr(spark, SF_SMOKE).collect()[0]
    assert r["n_days"] == len(days)
    assert (r["matched_views"], r["matched_clicks"]) == (mv, mc)
    assert r["replay_ctr_ppm"] == mc * 1_000_000 // max(mv, 1)


def test_bandit_replay_empty_input_parity(spark, tmp_path):
    """An empty event log must yield an EMPTY replay report in both
    engines — the oracle's GROUP BY over zero picks emits no row."""
    import duckdb

    from projet_meteo_etl_spark.plans.model_eval import (
        BANDIT_REPLAY_SQL,
        bandit_replay_ctr,
    )

    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    ).write.parquet(d + "/events.parquet")
    assert bandit_replay_ctr(spark, d).count() == 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{d}/events.parquet/*.parquet')"
    )
    assert con.execute(BANDIT_REPLAY_SQL).fetchall() == []
