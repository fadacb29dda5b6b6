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


def test_cuped_matches_python_replay(spark):
    """Arm means, theta, and the adjusted means replayed from exact
    per-user integer sums in pure Python (third engine)."""
    import duckdb

    from projet_meteo_etl_spark.plans.experiments import cuped_adjusted_lift

    sf = "/root/testdata/sf0.001"
    rows = {r["variant"]: r for r in cuped_adjusted_lift(spark, sf).collect()}
    per_user = duckdb.sql(
        f"""
        WITH base AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS eday,
                 CASE WHEN event_type = 'purchase'
                      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                      ELSE 0 END AS cents
          FROM '{sf}/events.parquet'
        ),
        bounds AS (SELECT min(eday) AS d0, max(eday) AS d1 FROM base)
        SELECT CASE WHEN ('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                            1, 15))::UBIGINT % 2 = 0
                    THEN 'A' ELSE 'B' END,
               sum(CASE WHEN b.eday <= (d.d0 + d.d1) // 2
                        THEN b.cents ELSE 0 END),
               sum(CASE WHEN b.eday > (d.d0 + d.d1) // 2
                        THEN b.cents ELSE 0 END)
        FROM base b, bounds d GROUP BY user_id
        """
    ).fetchall()
    n = len(per_user)
    sx = sum(x for _, x, _ in per_user)
    sy = sum(y for _, _, y in per_user)
    sxx = sum(x * x for _, x, _ in per_user)
    sxy = sum(x * y for _, x, y in per_user)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    for v in ("A", "B"):
        arm = [(x, y) for a, x, y in per_user if a == v]
        na = len(arm)
        sxa = sum(x for x, _ in arm)
        sya = sum(y for _, y in arm)
        r = rows[v]
        assert (r["n_users"], r["sum_y_cents"]) == (na, sya)
        adj = sya / na - theta * (sxa / na - sx / n)
        assert abs(r["mean_y_adj_cents"] - adj) < 1e-3
        assert abs(r["theta"] - theta) < 1e-5
        assert 0.0 <= r["var_reduction"] <= 1.0


def test_jackknife_matches_integer_replay(spark):
    import duckdb

    from projet_meteo_etl_spark.plans.experiments import (
        jackknife_ratio_metric,
    )

    sf = "/root/testdata/sf0.001"
    r = jackknife_ratio_metric(spark, sf).collect()[0]
    daily = duckdb.sql(
        f"""
        SELECT epoch_us(ts) // 86400000000,
               CAST(sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT)
        FROM '{sf}/events.parquet' GROUP BY 1
        """
    ).fetchall()
    s = sum(si for _, si, _ in daily)
    c = sum(ci for _, _, ci in daily)
    reps = [
        (s - si) * 1_000_000 // (c - ci)
        for _, si, ci in daily
        if c - ci > 0
    ]
    n = len(reps)
    sr, srr = sum(reps), sum(x * x for x in reps)
    assert (r["n_days"], r["total_cents"], r["total_clicks"]) == (n, s, c)
    assert r["ratio_micro"] == s * 1_000_000 // c
    assert r["jk_var_micro2"] == (n - 1) * (n * srr - sr * sr) // (n * n)
    assert r["jk_var_micro2"] >= 0


def test_k_anonymity_and_l_diversity_invariants(spark):
    """Privacy audits: k histogram accounts for every customer row;
    per-class k/l replayed from a pure-Python group-by."""
    import duckdb
    from collections import Counter

    from projet_meteo_etl_spark.operators.quality_queries import (
        K_ANON_MIN,
        L_DIV_MIN,
        k_anonymity_audit,
        l_diversity_audit,
    )

    sf = "/root/testdata/sf0.001"
    cust = duckdb.sql(
        f"SELECT c_nationkey, c_mktsegment,"
        f" (CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) + 100000000)"
        f"   // 100000 - 1000"
        f" FROM '{sf}/customer.parquet'"
    ).fetchall()
    classes = Counter((n, m) for n, m, _ in cust)
    hist = Counter(classes.values())
    rows = {r["k"]: r for r in k_anonymity_audit(spark, sf).collect()}
    assert set(rows) == set(hist)
    total = len(cust)
    for k, n_classes in hist.items():
        r = rows[k]
        assert (r["n_classes"], r["n_rows"]) == (n_classes, k * n_classes)
        assert r["rows_ppm"] == k * n_classes * 1_000_000 // total
        assert r["below_threshold"] == int(k < K_ANON_MIN)
    assert sum(r["n_rows"] for r in rows.values()) == total

    ldiv = {
        (r["c_nationkey"], r["c_mktsegment"]): r
        for r in l_diversity_audit(spark, sf).collect()
    }
    bands: dict = {}
    for n, m, b in cust:
        bands.setdefault((n, m), set()).add(b)
    assert set(ldiv) == set(classes)
    for key, k in classes.items():
        r = ldiv[key]
        assert (r["k"], r["l_distinct"]) == (k, len(bands[key]))
        assert r["suppress"] == int(
            k < K_ANON_MIN or len(bands[key]) < L_DIV_MIN
        )
        assert 1 <= r["l_distinct"] <= r["k"]


def test_hhi_and_abc_match_python_replay(spark):
    """Market concentration + Pareto classes replayed in pure Python
    from exact cent-percent revenue integers."""
    import duckdb

    from projet_meteo_etl_spark.plans.relational_ext import (
        abc_inventory_classes,
        hhi_supplier_concentration,
    )

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""
        SELECT n_name, s_suppkey, l_partkey,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
        FROM '{sf}/lineitem.parquet'
        JOIN '{sf}/supplier.parquet' ON l_suppkey = s_suppkey
        JOIN '{sf}/nation.parquet' ON s_nationkey = n_nationkey
        """
    ).fetchall()
    # HHI per nation
    supp: dict = {}
    for nname, sk, _, r in rows:
        supp[(nname, sk)] = supp.get((nname, sk), 0) + r
    got = {
        r["n_name"]: r
        for r in hhi_supplier_concentration(spark, sf).collect()
    }
    nations = {n for n, _ in supp}
    assert set(got) == nations
    for nat in nations:
        revs = [v for (n, _), v in supp.items() if n == nat]
        total = sum(revs)
        shares = [v * 1_000_000 // total for v in revs]
        r = got[nat]
        assert r["n_suppliers"] == len(revs)
        assert r["top_share_ppm"] == max(shares)
        assert r["hhi_ppm"] == sum(s * s for s in shares) // 1_000_000
        assert r["hhi_ppm"] <= 1_000_000
    # ABC classes
    part: dict = {}
    for _, _, pk, r in rows:
        part[pk] = part.get(pk, 0) + r
    total = sum(part.values())
    ordered = sorted(part.items(), key=lambda kv: (-kv[1], kv[0]))
    cum, counts, sums = 0, {"A": 0, "B": 0, "C": 0}, {"A": 0, "B": 0, "C": 0}
    for pk, r in ordered:
        cum += r
        cls = "A" if cum * 100 <= total * 80 else (
            "B" if cum * 100 <= total * 95 else "C"
        )
        counts[cls] += 1
        sums[cls] += r
    gota = {r["abc_class"]: r for r in abc_inventory_classes(spark, sf).collect()}
    for cls in ("A", "B", "C"):
        assert (gota[cls]["n_parts"], gota[cls]["rev_centpct"]) == (
            counts[cls], sums[cls],
        )
        assert gota[cls]["share_ppm"] == sums[cls] * 1_000_000 // total
    # shares must partition the total (ppm floors lose < 3 ppm)
    assert sum(counts.values()) == len(part)
    assert 999_997 <= sum(
        gota[c]["share_ppm"] for c in ("A", "B", "C")
    ) <= 1_000_000


def test_position_attribution_credits_sum_to_one_per_purchase(spark):
    """U-shaped credits: per-purchase ppm must sum to exactly 1e6;
    channel totals replayed in pure Python."""
    import duckdb

    from projet_meteo_etl_spark.plans.temporal import (
        ATTR_HORIZON_US,
        position_based_attribution,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["channel"]: r
        for r in position_based_attribution(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT user_id, event_id, event_type, epoch_us(ts),"
        f" CAST(floor(value * 100.0 + 0.5) AS BIGINT)"
        f" FROM '{sf}/events.parquet'"
        f" WHERE event_type IN ('purchase', 'click', 'view')"
    ).fetchall()
    purch = [(u, i, t, c) for u, i, et, t, c in rows if et == "purchase"]
    touch: dict = {}
    for u, i, et, t, _ in rows:
        if et in ("click", "view"):
            touch.setdefault(u, []).append((t, i, et))
    agg: dict = {}
    organic_n = organic_cents = 0
    for u, pid, pt, cents in purch:
        win = sorted(
            (t, i, et)
            for t, i, et in touch.get(u, [])
            if t < pt and pt - t <= ATTR_HORIZON_US
        )
        n = len(win)
        if n == 0:
            organic_n += 1
            organic_cents += cents
            continue
        if n == 1:
            credits = [1_000_000]
        elif n == 2:
            credits = [500_000, 500_000]
        else:
            # first 400k, middles floor-share 200k, last takes
            # 400k + the division remainder
            mid = 200_000 // (n - 2)
            credits = (
                [400_000]
                + [mid] * (n - 2)
                + [400_000 + 200_000 - (n - 2) * mid]
            )
        assert len(credits) == n
        assert sum(credits) == 1_000_000
        for (t, i, et), cr in zip(win, credits):
            a = agg.setdefault(et, [0, 0, 0])
            a[0] += 1
            a[1] += cr
            a[2] += cents * cr
    for ch, (nc, cs, vc) in agg.items():
        r = got[ch]
        assert (r["n_credits"], r["credit_ppm_sum"]) == (nc, cs)
        assert r["credited_cents"] == vc // 1_000_000
    assert got["organic"]["n_credits"] == organic_n
    assert got["organic"]["credited_cents"] == organic_cents


def test_funnel_latency_matches_rank_replay(spark):
    import duckdb

    from projet_meteo_etl_spark.plans.temporal import funnel_stage_latency

    sf = "/root/testdata/sf0.001"
    got = {r["stage"]: r for r in funnel_stage_latency(spark, sf).collect()}
    per_user = duckdb.sql(
        f"SELECT min(CASE WHEN event_type='view' THEN epoch_us(ts) END),"
        f" min(CASE WHEN event_type='click' THEN epoch_us(ts) END),"
        f" min(CASE WHEN event_type='purchase' THEN epoch_us(ts) END)"
        f" FROM '{sf}/events.parquet' GROUP BY user_id"
    ).fetchall()
    for stage, ai, bi in (("view->click", 0, 1), ("click->purchase", 1, 2)):
        gaps = sorted(
            (r[bi] - r[ai]) // 3_600_000_000
            for r in per_user
            if r[ai] is not None and r[bi] is not None and r[bi] >= r[ai]
        )
        n = len(gaps)
        r = got[stage]
        assert r["n_users"] == n
        assert r["p50_hours"] == gaps[(n + 1) // 2 - 1]
        assert r["p90_hours"] == gaps[(9 * n + 9) // 10 - 1]
        assert r["p50_hours"] <= r["p90_hours"]


def test_winsorized_ab_matches_python_replay(spark):
    import duckdb

    from projet_meteo_etl_spark.plans.experiments import winsorized_ab_lift

    sf = "/root/testdata/sf0.001"
    got = {r["variant"]: r for r in winsorized_ab_lift(spark, sf).collect()}
    per_user = duckdb.sql(
        f"""
        SELECT CASE WHEN ('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                            1, 15))::UBIGINT % 2 = 0
                    THEN 'A' ELSE 'B' END,
               CAST(sum(CASE WHEN event_type = 'purchase'
                        THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                        ELSE 0 END) AS BIGINT)
        FROM '{sf}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    ys = sorted(y for _, y in per_user)
    n = len(ys)
    p99 = ys[(99 * n + 99) // 100 - 1]
    for v in ("A", "B"):
        arm = [y for a, y in per_user if a == v]
        r = got[v]
        assert (r["n_users"], r["p99_cents"]) == (len(arm), p99)
        assert r["n_clipped"] == sum(1 for y in arm if y > p99)
        assert r["raw_mean_microcents"] == sum(arm) * 1_000_000 // len(arm)
        assert r["clipped_mean_microcents"] == sum(
            min(y, p99) for y in arm
        ) * 1_000_000 // len(arm)
        assert r["clipped_mean_microcents"] <= r["raw_mean_microcents"]


def test_uplift_decile_matches_python_replay(spark):
    import duckdb

    from projet_meteo_etl_spark.plans.experiments import uplift_by_decile

    sf = "/root/testdata/sf0.01"
    rows = uplift_by_decile(spark, sf).collect()
    per_user = duckdb.sql(
        f"""
        WITH base AS (
          SELECT user_id, epoch_us(ts) // 86400000000 AS eday,
                 CASE WHEN event_type = 'purchase'
                      THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                      ELSE 0 END AS cents
          FROM '{sf}/events.parquet'
        ),
        bounds AS (SELECT min(eday) AS d0, max(eday) AS d1 FROM base)
        SELECT CASE WHEN ('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                            1, 15))::UBIGINT % 2 = 0
                    THEN 'A' ELSE 'B' END,
               sum(CASE WHEN b.eday <= (d.d0 + d.d1) // 2
                        THEN b.cents ELSE 0 END),
               sum(CASE WHEN b.eday > (d.d0 + d.d1) // 2
                        THEN b.cents ELSE 0 END)
        FROM base b, bounds d GROUP BY user_id
        """
    ).fetchall()
    xs = sorted(x for _, x, _ in per_user)
    n = len(xs)
    cuts = [xs[(q * n + 9) // 10 - 1] for q in range(1, 10)]
    agg: dict = {}
    for v, x, y in per_user:
        dec = 1 + sum(1 for b in cuts if b < x)
        a = agg.setdefault((dec, v), [0, 0])
        a[0] += 1
        a[1] += y
    got = {r["decile"]: r for r in rows}
    for dec in {d for d, _ in agg}:
        if (dec, "A") not in agg or (dec, "B") not in agg:
            assert dec not in got  # inner join drops one-armed deciles
            continue
        na, sa = agg[(dec, "A")]
        nb, sb = agg[(dec, "B")]
        r = got[dec]
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["mean_y_a_micro"] == sa * 1_000_000 // na
        assert r["mean_y_b_micro"] == sb * 1_000_000 // nb
        assert r["uplift_micro"] == (
            sa * 1_000_000 // na - sb * 1_000_000 // nb
        )
    # every user is in exactly one decile
    assert sum(v[0] for v in agg.values()) == n


def test_rfm_segments_match_python_replay(spark):
    import duckdb

    from projet_meteo_etl_spark.plans.experiments import (
        customer_rfm_segments,
    )

    sf = "/root/testdata/sf0.001"
    rows = customer_rfm_segments(spark, sf).collect()
    per_user = duckdb.sql(
        f"""
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS eday,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM '{sf}/events.parquet'
        ),
        log_end AS (SELECT max(eday) AS d_end FROM e)
        SELECT CAST(min(d.d_end - eday) AS BIGINT),
               CAST(count(*) AS BIGINT), CAST(sum(cents) AS BIGINT)
        FROM e, log_end d WHERE event_type = 'purchase'
        GROUP BY user_id
        """
    ).fetchall()

    def quint_cuts(vals):
        s = sorted(vals)
        n = len(s)
        return [s[(q * n + 4) // 5 - 1] for q in range(1, 5)]

    rc = quint_cuts([r for r, _, _ in per_user])
    fc = quint_cuts([f for _, f, _ in per_user])
    mc = quint_cuts([m for _, _, m in per_user])
    from collections import Counter

    expect: Counter = Counter()
    for r, f, m in per_user:
        expect[(
            1 + sum(1 for c in rc if c < r),
            1 + sum(1 for c in fc if c < f),
            1 + sum(1 for c in mc if c < m),
        )] += 1
    got = {
        (r["r_score"], r["f_score"], r["m_score"]): r["n_users"]
        for r in rows
    }
    assert got == dict(expect)
    assert sum(got.values()) == len(per_user)
    assert all(1 <= k <= 5 for cell in got for k in cell)


def test_linear_attribution_conserves_value(spark):
    """The linear model's headline invariant: per-purchase credits sum
    EXACTLY to cents*1e6 (deterministic remainder rule), so the channel
    totals must reconstruct total purchase value to the last micro-cent
    — and a Python replay pins every channel's share."""
    import duckdb

    from projet_meteo_etl_spark.plans.temporal import (
        ATTR_HORIZON_US,
        linear_attribution_credit,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["channel"]: r for r in linear_attribution_credit(spark, sf).collect()
    }
    total_cents = duckdb.sql(
        f"SELECT CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))"
        f" AS BIGINT) FROM '{sf}/events.parquet'"
        f" WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert sum(r["credit_micro_cents"] for r in got.values()) == (
        total_cents * 1_000_000
    )
    # Python replay of the equal-split + remainder-to-first rule
    rows = duckdb.sql(
        f"SELECT user_id, event_id, event_type, epoch_us(ts),"
        f" CAST(floor(value * 100.0 + 0.5) AS BIGINT)"
        f" FROM '{sf}/events.parquet'"
        f" WHERE event_type IN ('purchase', 'click', 'view', 'signup')"
    ).fetchall()
    last: dict = {}
    expect = {c: [0, 0] for c in ("click", "organic", "signup", "view")}
    for u, i, et, t, cents in sorted(rows, key=lambda r: (r[0], r[3], r[1])):
        if et != "purchase":
            last.setdefault(u, {})[et] = t
            continue
        present = sorted(
            ch
            for ch, lt in last.get(u, {}).items()
            if t - lt <= ATTR_HORIZON_US
        )
        if not present:
            expect["organic"][0] += 1
            expect["organic"][1] += cents * 1_000_000
            continue
        k = len(present)
        share = cents * 1_000_000 // k
        rem = cents * 1_000_000 - k * share
        for ch in present:
            expect[ch][0] += 1
            expect[ch][1] += share + (rem if ch == present[0] else 0)
    for ch, (n, credit) in expect.items():
        assert got[ch]["n_purchases_touched"] == n, ch
        assert got[ch]["credit_micro_cents"] == credit, ch


def test_permutation_test_contract(spark):
    """p must lie in [1/(R+1), 1] (add-one smoothing), the null must
    have exactly N_PERM draws, and the readout must be partition-
    independent (pure-hash relabelings, integer statistics)."""
    from projet_meteo_etl_spark.plans.experiments import (
        N_PERM,
        permutation_test_weekend_lift,
    )

    r = permutation_test_weekend_lift(spark, SF_SMOKE).collect()[0]
    assert r["n_perms"] == N_PERM
    assert 0 <= r["n_extreme"] <= N_PERM
    lo = 1_000_000 // (N_PERM + 1)
    assert lo <= r["p_ppm"] <= 1_000_000
    assert r["n_weekend"] > 0 and r["n_weekday"] > 0
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        r2 = permutation_test_weekend_lift(spark, SF_SMOKE).collect()[0]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert r.asDict() == r2.asDict()


def test_diff_in_diff_identity_and_cells(spark):
    """did_micro must equal the 2x2 cell identity, and every cell mean
    must be a plausible positive purchase value."""
    from projet_meteo_etl_spark.plans.experiments import diff_in_diff_lift

    r = diff_in_diff_lift(spark, SF_SMOKE).collect()[0]
    assert r["did_micro"] == (r["t_post_micro"] - r["t_pre_micro"]) - (
        r["c_post_micro"] - r["c_pre_micro"]
    )
    for c in ("c_pre_micro", "c_post_micro", "t_pre_micro", "t_post_micro"):
        assert r[c] > 0


def test_eb_shrunk_ctr_moves_toward_pool(spark):
    """Shrinkage must move every reported rate TOWARD the pooled rate
    (within the 1-ppm floor-division slack), and small-sample items
    must move more than large-sample ones at equal raw distance."""
    import duckdb

    from projet_meteo_etl_spark.plans.feature_eng import eb_shrunk_item_ctr

    m_ppm = duckdb.sql(
        f"""
        SELECT CAST(sum(clicks) * 1000000 // sum(views) AS BIGINT) FROM (
          SELECT sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS views,
                 sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS clicks
          FROM '{SF_SMOKE}/events.parquet'
          WHERE TRY_CAST(props->>'k' AS BIGINT) IS NOT NULL
          GROUP BY TRY_CAST(props->>'k' AS BIGINT)
          HAVING sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) > 0
        )
        """
    ).fetchone()[0]
    rows = eb_shrunk_item_ctr(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        lo, hi = sorted((r["raw_ppm"], m_ppm))
        assert lo - 1 <= r["shrunk_ppm"] <= hi + 1
        assert r["shift_ppm"] == r["shrunk_ppm"] - r["raw_ppm"]


def test_price_elasticity_matches_python_replay(spark):
    """The fixed-point OLS must equal a Python replay computing the
    same milli-nat logs and integer moments."""
    import math

    from pyspark.sql import functions as F

    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.plans.experiments import (
        ELAST_LOG_SCALE,
        price_elasticity_by_brand,
    )
    from tests.conftest import SF_SMOKE

    li = load_table(spark, SF_SMOKE, "lineitem")
    qty = {
        r["l_partkey"]: r["q"]
        for r in li.select(
            "l_partkey",
            F.expr("CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)").alias(
                "qc"
            ),
        )
        .groupBy("l_partkey")
        .agg(F.sum("qc").alias("q"))
        .collect()
    }
    parts = load_table(spark, SF_SMOKE, "part").collect()
    pts = {}
    for p in parts:
        pc = math.floor(p["p_retailprice"] * 100.0 + 0.5)
        q = qty.get(p["p_partkey"])
        if q and pc > 0:
            lx = math.floor(ELAST_LOG_SCALE * math.log(pc))
            ly = math.floor(ELAST_LOG_SCALE * math.log(q))
            pts.setdefault(p["p_brand"], []).append((lx, ly))
    expect = {}
    for b, xs in pts.items():
        n = len(xs)
        sx = sum(x for x, _ in xs)
        sy = sum(y for _, y in xs)
        sxx = sum(x * x for x, _ in xs)
        syy = sum(y * y for _, y in xs)
        sxy = sum(x * y for x, y in xs)
        bnum, bden, bdey = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
        tdiv = lambda a, d: -((-a) // d) if a < 0 else a // d
        expect[b] = (
            n,
            tdiv(bnum * 1000, bden) if bden > 0 else None,
            bnum * bnum * 1_000_000 // (bden * bdey) if bden * bdey > 0 else None,
        )
    got = {
        r["p_brand"]: (r["n_parts"], r["elasticity_milli"], r["r2_ppm"])
        for r in price_elasticity_by_brand(spark, SF_SMOKE).collect()
    }
    assert got == expect
