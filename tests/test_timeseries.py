"""EWMA (applyInPandas custom op) pinned against an independent pandas
computation over the same collected input."""

from __future__ import annotations

import math

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.plans.timeseries import user_value_ewma

SF = "/root/testdata/sf0.001"


def test_ewma_matches_pandas_reference(spark):
    got = {
        (r.user_id, r.event_id): r.ewma_value
        for r in user_value_ewma(spark, SF).collect()
    }
    src = (
        load_table(spark, SF, "events")
        .filter("event_type = 'purchase'")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
    )
    exp = {}
    for uid, grp in src.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"])
        e = grp["value"].ewm(alpha=0.3, adjust=False).mean()
        for eid, v in zip(grp["event_id"], e):
            exp[(uid, eid)] = v
    assert set(got) == set(exp)
    for k, v in got.items():
        assert math.isclose(v, exp[k], rel_tol=1e-12), k


def test_zscore_outliers_invariants(spark):
    from projet_meteo_etl_spark.plans.timeseries import events_zscore_outliers

    rows = events_zscore_outliers(spark, SF).collect()
    assert rows, "synthetic purchases should contain tail values"
    for r in rows:
        assert abs(r["z_score"]) >= 2.0
        assert r["n_purchases"] >= 5


def test_scd2_history_is_contiguous_and_alternating(spark):
    from collections import defaultdict

    from projet_meteo_etl_spark.plans.timeseries import scd2_value_band_history

    by_user = defaultdict(list)
    for r in scd2_value_band_history(spark, SF).collect():
        by_user[r["user_id"]].append(r)
    assert by_user
    for rows in by_user.values():
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        assert sum(1 for r in rows if r["is_current"]) == 1
        assert rows[-1]["is_current"] and rows[-1]["valid_to_us"] is None
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to_us"] == b["valid_from_us"]
            assert a["band"] != b["band"], "consecutive versions must differ"


def test_event_funnel_monotone_stages_and_single_user_shuffle(spark):
    from projet_meteo_etl_spark.plans.temporal import event_funnel_counts

    df = event_funnel_counts(spark, SF)
    r = df.collect()[0]
    assert (
        r["users_total"]
        >= r["users_view"]
        >= r["users_click"]
        >= r["users_purchase"]
        > 0
    )
    assert r["avg_click_to_purchase_us"] > 0
    # all three stage windows and the per-user rollup share ONE
    # user_id exchange; only the grand total adds a second (AQE
    # toString may append an "Initial Plan" section — inspect only
    # the final plan)
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert final.count("Exchange SinglePartition") == 1


def test_cohort_retention_triangle(spark):
    from projet_meteo_etl_spark.plans.temporal import cohort_retention

    rows = cohort_retention(spark, SF).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r["week_offset"] >= 0 and r["n_active"] > 0
        by_cohort.setdefault(r["cohort_week"], {})[r["week_offset"]] = r["n_active"]
    for offsets in by_cohort.values():
        # week 0 contains the whole cohort: no later week can exceed it
        assert 0 in offsets
        assert all(n <= offsets[0] for n in offsets.values())


def test_user_value_deciles_partition_users(spark):
    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.plans.temporal import user_value_deciles
    from pyspark.sql import functions as F

    rows = user_value_deciles(spark, SF).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n_buyers = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert sum(r["n_users"] for r in rows) == n_buyers
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-4
    # deciles ordered by value: shares must be non-increasing
    shares = [r["revenue_share"] for r in rows]
    assert shares == sorted(shares, reverse=True)


def test_twap_within_value_range(spark):
    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.plans.timeseries import user_value_twap
    from pyspark.sql import functions as F

    rows = user_value_twap(spark, SF).collect()
    assert rows
    lo, hi = (
        load_table(spark, SF, "events")
        .filter(F.col("event_type") == "purchase")
        .agg(F.min("value"), F.max("value"))
        .collect()[0]
    )
    for r in rows:
        # a time-weighted average lies within the observed value range
        assert lo - 0.01 <= r["twap_value"] <= hi + 0.01
        assert r["n_segments"] >= 1


def test_psi_terms_nonnegative_total(spark):
    from projet_meteo_etl_spark.plans.timeseries import events_value_psi

    rows = events_value_psi(spark, SF).collect()
    assert rows
    # (p-q)·ln(p/q) >= 0 term-wise (both factors share sign); floor can
    # take a zero term to -1 micro at most
    for r in rows:
        assert r["psi_term_micros"] >= -1
        assert r["na"] > 0 and r["nb"] > 0


def test_transition_matrix_rows_normalize(spark):
    from collections import defaultdict

    from projet_meteo_etl_spark.plans.temporal import event_transition_matrix

    rows = event_transition_matrix(spark, SF).collect()
    assert len(rows) == 25  # 5 event types, full matrix at this SF
    per_prev = defaultdict(float)
    for r in rows:
        # == 1.0 is legitimate when a prev_type has a single successor
        assert 0.0 < r["p_next"] <= 1.0
        per_prev[r["prev_type"]] += r["p_next"]
    for tot in per_prev.values():
        # integer-division micro probabilities round down: row sums
        # land within 5 micro-units below 1
        assert 1.0 - 5e-6 <= tot <= 1.0


def test_seasonal_forecast_error_sane(spark):
    from projet_meteo_etl_spark.plans.timeseries import (
        seasonal_forecast_error,
    )

    rows = seasonal_forecast_error(spark, SF).collect()
    assert {r["event_type"] for r in rows} == {"purchase", "click", "view"}
    for r in rows:
        assert r["n_days"] > 0
        assert r["mae_cents"] >= 0
        assert r["mape_micros"] >= 0


def test_session_paths_shape(spark):
    from projet_meteo_etl_spark.plans.temporal import (
        PATH_PREFIX,
        session_path_topk,
    )

    rows = session_path_topk(spark, SF).collect()
    assert rows
    counts = [r["n_sessions"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    types = {"view", "click", "purchase", "signup", "error"}
    for r in rows:
        steps = r["path"].split(">")
        assert 1 <= len(steps) <= PATH_PREFIX
        assert set(steps) <= types


def test_autocorrelation_bounds_and_determinism(spark):
    from projet_meteo_etl_spark.plans.timeseries import (
        revenue_autocorrelation,
    )

    a = [tuple(r) for r in revenue_autocorrelation(spark, SF).collect()]
    assert len(a) == 5
    for _, n_pairs, acf1 in a:
        assert n_pairs > 0
        assert -1.0 <= acf1 <= 1.0
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = [tuple(r) for r in revenue_autocorrelation(spark, SF).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_last_touch_attribution_consistency(spark):
    """Attribution counts bounded by purchases; cents partition the
    day's purchase value; ppm consistent with the counts."""
    from projet_meteo_etl_spark.plans.temporal import last_touch_attribution

    rows = last_touch_attribution(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_attributed"] <= r["n_purchases"]
        assert r["attributed_cents"] >= 0 and r["organic_cents"] >= 0
        assert r["attribution_ppm"] == r["n_attributed"] * 1_000_000 // r["n_purchases"]


def test_mad_outliers_against_python_oracle(spark):
    """Median, MAD, and the integer robust-z count must match a direct
    Python implementation (rank-exact percentile_disc semantics)."""
    import math

    from projet_meteo_etl_spark.plans.timeseries import (
        MAD_K,
        events_mad_outliers,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    by_type = {}
    for r in ev:
        c = math.floor(r["value"] * 100.0 + 0.5)
        by_type.setdefault(r["event_type"], []).append(c)
    rows = {r["event_type"]: r for r in events_mad_outliers(spark, SF).collect()}
    assert set(rows) == set(by_type)
    for t, cs in by_type.items():
        n = len(cs)
        med = sorted(cs)[math.ceil(n / 2) - 1]
        ds = sorted(abs(c - med) for c in cs)
        mad = ds[math.ceil(n / 2) - 1]
        outl = sum(1 for c in cs if abs(c - med) * 100_000 > MAD_K * mad)
        r = rows[t]
        assert r["n_rows"] == n
        assert r["median_value"] == med / 100.0
        assert r["mad_value"] == mad / 100.0
        assert r["n_outliers"] == outl
        assert r["outlier_ppm"] == outl * 1_000_000 // n


def test_revenue_changepoint_against_python_oracle(spark):
    """Integer CUSUM argmax must match a direct Python computation."""
    import math
    from collections import defaultdict

    from projet_meteo_etl_spark.plans.timeseries import revenue_changepoint

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    daily = defaultdict(int)
    for r in ev:
        if r["event_type"] == "purchase":
            daily[r["ts"].date()] += math.floor(r["value"] * 100.0 + 0.5)
    days = sorted(daily)
    total, tt = sum(daily.values()), len(days)
    best = None
    prefix = 0
    for t, d in enumerate(days, start=1):
        prefix += daily[d]
        if t >= tt:
            break
        st = abs(tt * prefix - t * total)
        if best is None or st > best[0]:
            best = (st, d, t, prefix)
    r = revenue_changepoint(spark, SF).collect()[0]
    st, d, t, prefix = best
    assert r["cp_day"] == d
    assert r["n_days"] == tt
    assert r["cusum_scaled"] == st
    assert r["mean_before"] == math.floor(prefix / t / 100.0 * 1e6 + 0.5) / 1e6
    assert (
        r["mean_after"]
        == math.floor((total - prefix) / (tt - t) / 100.0 * 1e6 + 0.5) / 1e6
    )


def test_theilsen_against_python_oracle(spark):
    """Median pairwise slope must match a direct computation, and be
    robust: the rank pick equals numpy-free brute force."""
    import math
    from collections import defaultdict

    from projet_meteo_etl_spark.plans.timeseries import revenue_theilsen_trend

    ev = spark.read.parquet(f"{SF}/events.parquet").collect()
    daily = defaultdict(int)
    for r in ev:
        if r["event_type"] == "purchase":
            daily[r["ts"].date()] += math.floor(r["value"] * 100.0 + 0.5)
    cs = [daily[d] for d in sorted(daily)]
    slopes = []
    for i in range(len(cs)):
        for j in range(i + 1, len(cs)):
            slopes.append(((cs[j] - cs[i]) / (j - i), i + 1, j + 1))
    slopes.sort()
    n = len(slopes)
    med = slopes[math.ceil(n / 2) - 1][0]
    r = revenue_theilsen_trend(spark, SF).collect()[0]
    assert r["n_pairs"] == n
    assert r["theil_sen_slope_per_day"] == math.floor(med / 100.0 * 1e6 + 0.5) / 1e6


def test_decayed_engagement_against_python_oracle(spark):
    """Decayed scores must replay exactly in Python from the same
    integer decay table, and decay must never exceed the raw total."""
    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.plans.timeseries import (
        DECAY_MICRO,
        DECAY_TOP_N,
        user_decayed_engagement,
    )
    from tests.conftest import SF_SMOKE

    import math

    ev = [
        r
        for r in load_table(spark, SF_SMOKE, "events").collect()
        if r["event_type"] == "purchase"
    ]
    max_day = max(r["ts"].date() for r in ev)
    agg = {}
    for r in ev:
        cents = math.floor(r["value"] * 100 + 0.5)
        age = min((max_day - r["ts"].date()).days, len(DECAY_MICRO) - 1)
        n, raw, dec = agg.get(r["user_id"], (0, 0, 0))
        agg[r["user_id"]] = (n + 1, raw + cents, dec + cents * DECAY_MICRO[age])
    expect = sorted(
        ((v[2], -u) for u, v in agg.items()), reverse=True
    )[:DECAY_TOP_N]
    got = user_decayed_engagement(spark, SF_SMOKE).collect()
    assert [(r["decayed_cmicro"], -r["user_id"]) for r in got] == expect
    for r in got:
        u = r["user_id"]
        assert (r["n_purchases"], r["raw_cents"], r["decayed_cmicro"]) == agg[u]
        assert r["decayed_cmicro"] <= r["raw_cents"] * 1_000_000


def test_holt_linear_matches_recursion_replay(spark):
    """Levels/trends/fits must equal a literal Python replay of the
    α=β=½ Holt recursion with truncating halving."""
    import duckdb

    from projet_meteo_etl_spark.plans.timeseries import holt_linear_forecast
    from tests.conftest import SF_SMOKE

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    daily = duckdb.sql(
        f"SELECT ts::DATE AS day,"
        f" CAST(sum(CAST(floor(value*100.0+0.5) AS BIGINT)) AS BIGINT)"
        f" FROM '{SF_SMOKE}/events.parquet'"
        f" WHERE event_type='purchase' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    cents = [c for _, c in daily]
    lvl = cents[0]
    trd = (cents[1] - cents[0]) if len(cents) > 1 else 0
    expect = [(daily[0][0], cents[0], None, lvl, trd, None)]
    for t in range(1, len(cents)):
        fit = lvl + trd
        new_lvl = tdiv(cents[t] + lvl + trd, 2)
        trd = tdiv(new_lvl - lvl + trd, 2)
        lvl = new_lvl
        expect.append(
            (daily[t][0], cents[t], fit, lvl, trd, abs(cents[t] - fit))
        )
    got = holt_linear_forecast(spark, SF_SMOKE).collect()
    assert [
        (r["sale_day"], r["d_cents"], r["fitted_cents"], r["level_cents"],
         r["trend_cents"], r["abs_err_cents"])
        for r in got
    ] == expect


def _daily_rev_clk():
    import duckdb

    return duckdb.sql(
        f"SELECT epoch_us(ts) // 86400000000 AS eday,"
        f" CAST(sum(CASE WHEN event_type = 'purchase'"
        f"   THEN CAST(floor(value * 100 + 0.5) AS BIGINT)"
        f"   ELSE 0 END) AS BIGINT) AS rev,"
        f" CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)"
        f"   AS BIGINT) AS clk"
        f" FROM '{SF}/events.parquet' GROUP BY 1 ORDER BY 1"
    ).fetchall()


def test_ccf_matches_python_replay(spark):
    """Each lag's ccf must equal the literal paired-series Pearson done
    in Python from exact integer sums (third engine vs Spark/DuckDB)."""
    from projet_meteo_etl_spark.plans.timeseries import (
        CCF_MAX_LAG,
        ccf_rev_clicks_lags,
    )

    rows = {r["lag"]: r for r in ccf_rev_clicks_lags(spark, SF).collect()}
    assert set(rows) == set(range(CCF_MAX_LAG + 1))
    daily = {d: (rev, clk) for d, rev, clk in _daily_rev_clk()}
    for lag, r in rows.items():
        pairs = [
            (daily[d][1], daily[d + lag][0])
            for d in daily
            if d + lag in daily
        ]
        n = len(pairs)
        assert r["n_pairs"] == n
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        ccf = (n * sxy - sx * sy) / math.sqrt(
            float(n * sxx - sx * sx) * float(n * syy - sy * sy)
        )
        assert abs(r["ccf"] - ccf) < 1e-6
        assert -1.0 <= r["ccf"] <= 1.0


def test_mann_kendall_matches_pair_replay(spark):
    from projet_meteo_etl_spark.plans.timeseries import (
        mann_kendall_revenue_trend,
    )

    r = mann_kendall_revenue_trend(spark, SF).collect()[0]
    revs = [rev for _, rev, _ in _daily_rev_clk()]  # day-ordered
    n = len(revs)
    s = sum(
        (revs[j] > revs[i]) - (revs[j] < revs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie18 = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(revs).values()
    )
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    assert (r["n_days"], r["n_pairs"], r["s_stat"], r["var18"]) == (
        n, n * (n - 1) // 2, s, var18,
    )
    sign = 0 if s == 0 else (1 if s > 0 else -1)
    assert r["z_sq_signed_micro"] == sign * (
        (abs(s) - 1) ** 2 * 18 * 1_000_000 // var18
    )


def test_cusum_matches_python_replay(spark):
    """CUSUM states and alarms must equal a literal Python replay of
    Page's recursion with integer slack/threshold."""
    import duckdb

    from projet_meteo_etl_spark.plans.timeseries import cusum_revenue_drift
    from tests.conftest import SF_SMOKE

    daily = duckdb.sql(
        f"SELECT ts::DATE AS day,"
        f" CAST(sum(CAST(floor(value*100.0+0.5) AS BIGINT)) AS BIGINT)"
        f" FROM '{SF_SMOKE}/events.parquet'"
        f" WHERE event_type='purchase' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    x = [c for _, c in daily]
    mu = sum(x) // len(x)
    k = mu // 20
    sp = sn = 0
    expect = []
    for (day, c) in daily:
        sp = max(0, sp + c - mu - k)
        sn = max(0, sn + mu - k - c)
        expect.append((day, c, sp, sn, 1 if (sp > mu or sn > mu) else 0))
    got = cusum_revenue_drift(spark, SF_SMOKE).collect()
    assert [
        (r["sale_day"], r["d_cents"], r["cusum_pos"], r["cusum_neg"],
         r["alarm"])
        for r in got
    ] == expect


def test_markov_attribution_matches_python_replay(spark):
    """Transition chain, absorption vectors, and removal effects must
    equal a literal Python replay of the truncated power iteration."""
    from collections import Counter, defaultdict

    import duckdb

    from projet_meteo_etl_spark.plans.temporal import (
        MARKOV_ITERS,
        markov_attribution_removal,
    )
    from tests.conftest import SF_SMOKE

    rows = duckdb.sql(
        f"SELECT user_id, event_type FROM '{SF_SMOKE}/events.parquet'"
        f" ORDER BY user_id, epoch_us(ts), event_id"
    ).fetchall()
    journeys = defaultdict(list)
    for uid, et in rows:
        journeys[uid].append("CONV" if et == "purchase" else et)
    steps = Counter()
    for seq in journeys.values():
        if "CONV" in seq:
            seq = seq[: seq.index("CONV") + 1]
            converted = True
        else:
            converted = False
        prev = "START"
        for st in seq:
            steps[(prev, st)] += 1
            prev = st
        if not converted:
            steps[(prev, "NULL")] += 1
    # NOTE: the last loop also counts (prev, 'NULL') with prev = last
    # state; for converted journeys prev ends at 'CONV' and no NULL
    # step is added — matching the query's rn == mx AND prn IS NULL
    out_tot = Counter()
    for (s, _), c in steps.items():
        out_tot[s] += c
    pm = {k: c * 1_000_000 // out_tot[k[0]] for k, c in steps.items()}
    transient = sorted({s for s, _ in pm})

    def absorb(dropped=None):
        q = {
            (s, d): m
            for (s, d), m in pm.items()
            if d in transient and d != dropped
        }
        r = {s: m for (s, d), m in pm.items() if d == "CONV"}
        x = {s: 0 for s in transient}
        for _ in range(MARKOV_ITERS):
            x = {
                s: r.get(s, 0)
                + sum(q.get((s, t), 0) * x[t] for t in transient) // 1_000_000
                for s in transient
            }
        return x.get("START", 0)

    pf = absorb()
    channels = sorted(c for c in transient if c != "START")
    eff = {c: pf - absorb(dropped=c) for c in channels}
    tot = sum(eff.values())
    got = markov_attribution_removal(spark, SF_SMOKE).collect()
    assert [r["channel"] for r in got] == channels
    for r in got:
        c = r["channel"]
        assert r["p_conv_full_ppm"] == pf
        assert r["p_conv_removed_ppm"] == pf - eff[c]
        assert r["removal_effect_ppm"] == (
            0 if pf == 0 else eff[c] * 1_000_000 // pf
        )
        assert r["attribution_ppm"] == (
            0 if tot == 0 else eff[c] * 1_000_000 // tot
        )
        assert eff[c] >= 0  # monotone: removal can only lower conversion


def test_holt_winters_matches_python_replay(spark):
    """Every output column of the Holt–Winters kernel must equal a
    literal Python replay of the α=β=γ=½, m=7 additive recursion with
    truncating halving and the classic first-season init."""
    import duckdb

    from projet_meteo_etl_spark.plans.timeseries import (
        HW_SEASON,
        holt_winters_weekly_forecast,
    )
    from tests.conftest import SF_SMOKE

    def tdiv2(a: int) -> int:
        return -((-a) // 2) if a < 0 else a // 2

    daily = duckdb.sql(
        f"SELECT ts::DATE AS day,"
        f" CAST(sum(CAST(floor(value*100.0+0.5) AS BIGINT)) AS BIGINT)"
        f" FROM '{SF_SMOKE}/events.parquet'"
        f" WHERE event_type='purchase' GROUP BY 1 ORDER BY 1"
    ).fetchall()
    x = [c for _, c in daily]
    m = HW_SEASON
    assert len(x) > m, "fixture must span more than one season"
    lvl = sum(x[:m]) // m
    trd = 0
    s = [x[p] - lvl for p in range(m)]
    expect = []
    for t in range(m, len(x)):
        p = t % m
        fit = lvl + trd + s[p]
        new_lvl = tdiv2(x[t] - s[p] + lvl + trd)
        trd = tdiv2(new_lvl - lvl + trd)
        s[p] = tdiv2(x[t] - new_lvl + s[p])
        lvl = new_lvl
        expect.append(
            (daily[t][0], x[t], fit, lvl, trd, s[p], abs(x[t] - fit))
        )
    got = holt_winters_weekly_forecast(spark, SF_SMOKE).collect()
    assert [
        (r["sale_day"], r["d_cents"], r["fitted_cents"], r["level_cents"],
         r["trend_cents"], r["seasonal_cents"], r["abs_err_cents"])
        for r in got
    ] == expect


def test_shapley_attribution_matches_python_replay(spark):
    """Shapley credits must equal a dict-based replay over the 16
    coalition conversion rates, and must satisfy the efficiency axiom
    exactly in scaled units: sum(shapley_scaled) == 12*(v(N) - v(0))."""
    import duckdb

    from projet_meteo_etl_spark.plans.temporal import (
        SHAPLEY_CHANNELS,
        SHAPLEY_W12,
        shapley_attribution_channels,
    )
    from tests.conftest import SF_SMOKE

    mask_expr = " + ".join(
        f"max(CASE WHEN event_type = '{ch}' THEN 1 ELSE 0 END) * {1 << b}"
        for b, ch in enumerate(SHAPLEY_CHANNELS)
    )
    per = dict()
    for mask, n, c in duckdb.sql(
        f"""
        SELECT mask, count(*), sum(conv) FROM (
          SELECT user_id, {mask_expr} AS mask,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
          FROM '{SF_SMOKE}/events.parquet' GROUP BY user_id
        ) GROUP BY mask
        """
    ).fetchall():
        per[mask] = (n, c)
    v = {
        m: (per[m][1] * 1_000_000 // per[m][0] if m in per else 0)
        for m in range(16)
    }
    expect = {}
    for b, ch in enumerate(SHAPLEY_CHANNELS):
        bit = 1 << b
        expect[ch] = sum(
            SHAPLEY_W12[bin(m).count("1")] * (v[m | bit] - v[m])
            for m in range(16)
            if not m & bit
        )
    got = {
        r["channel"]: r["shapley_scaled"]
        for r in shapley_attribution_channels(spark, SF_SMOKE).collect()
    }
    assert got == expect
    assert sum(got.values()) == 12 * (v[15] - v[0])  # efficiency axiom


def test_retention_halflife_contract(spark):
    """Fit sanity: >=2 points, r2 in [0,1], half-life consistent with
    the emitted slope, and partition-independent."""
    import math

    from projet_meteo_etl_spark.plans.temporal import retention_halflife_fit
    from tests.conftest import SF_SMOKE

    r = retention_halflife_fit(spark, SF_SMOKE).collect()[0]
    assert r["n_weeks"] >= 2
    if r["r2"] is not None:  # None = degenerate flat curve (var_y = 0)
        assert 0.0 <= r["r2"] <= 1.0 + 1e-9
    if r["decay_slope"] is not None and r["decay_slope"] < 0:
        assert r["halflife_weeks"] is not None
        expect = math.log(2.0) / (-r["decay_slope"])
        assert abs(r["halflife_weeks"] - expect) < max(1e-3, expect * 1e-4)
    else:
        assert r["halflife_weeks"] is None
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        r2 = retention_halflife_fit(spark, SF_SMOKE).collect()[0]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert r.asDict() == r2.asDict()


def test_retention_halflife_single_point_emits_null(spark, tmp_path):
    """Exactly one surviving regression point ⇒ var_x = 0: slope /
    half-life / r2 must be NULL in BOTH engines (r8 ADVICE: unguarded
    cov/var division threw DIVIDE_BY_ZERO under ANSI Spark while the
    DuckDB oracle returned NULL)."""
    import datetime as dt

    import duckdb

    from projet_meteo_etl_spark.plans.temporal import (
        RETENTION_HALFLIFE_SQL,
        retention_halflife_fit,
    )

    d = str(tmp_path / "sf")
    # one user: first day + a return exactly 1 week later ⇒ the only
    # eligible-and-active offset is w=1 → a single (lx, ly) point
    spark.createDataFrame(
        [
            (1, dt.datetime(2020, 1, 1, 12)),
            (1, dt.datetime(2020, 1, 8, 12)),
        ],
        "user_id long, ts timestamp",
    ).write.parquet(d + "/events.parquet")
    r = retention_halflife_fit(spark, d).collect()[0]
    assert r["n_weeks"] == 1
    assert r["decay_slope"] is None
    assert r["halflife_weeks"] is None
    assert r["r2"] is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{d}/events.parquet/*.parquet')"
    )
    o = con.execute(RETENTION_HALFLIFE_SQL).fetchone()
    assert o[0] == 1 and o[1] is None and o[2] is None and o[3] is None
