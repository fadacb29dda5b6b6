"""Experimentation / decision-support operators over the event stream:
deterministic A/B assignment with conversion analysis, and per-user
behavioral entropy.

Assignment uses the md5-prefix hash convention every sampling operator
in this repo shares (``plans/curation.py``): group membership is a pure
function of the user id, so re-running on any cluster layout assigns
identically — the property that makes experiment analyses auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table, spread_scan
from projet_meteo_etl_spark.functions.portable import pround, pround_sql


def ab_test_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-variant experiment readout: users split 50/50 by md5 hash,
    conversion = "has a purchase event", reported per variant with the
    pooled two-proportion z-score on the final row pair.

    All counts are exact integers; rates and the z-score are fixed
    double expressions over them (one evaluation per variant, no float
    accumulation), so the readout hash-matches DuckDB.  The analysis
    is two aggregates over a (user, converted) rollup — at 100 TB the
    event scan dominates and everything downstream is |users|-sized.
    """
    e = load_table(spark, sf_dir, "events")
    variant = F.when(
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
        .select(variant.alias("variant"), "converted")
    )
    agg = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    a = agg.filter(F.col("variant") == "A").select(
        F.col("n_users").alias("na"), F.col("n_converted").alias("ca")
    )
    b = agg.filter(F.col("variant") == "B").select(
        F.col("n_users").alias("nb"), F.col("n_converted").alias("cb")
    )
    j = a.crossJoin(b)
    na, ca = F.col("na").cast("double"), F.col("ca").cast("double")
    nb, cb = F.col("nb").cast("double"), F.col("cb").cast("double")
    p_pool = (ca + cb) / (na + nb)
    se = F.sqrt(p_pool * (1.0 - p_pool) * (1.0 / na + 1.0 / nb))
    return j.select(
        F.col("na").alias("users_a"),
        F.col("ca").alias("conv_a"),
        F.col("nb").alias("users_b"),
        F.col("cb").alias("conv_b"),
        pround(ca / na, 6).alias("rate_a"),
        pround(cb / nb, 6).alias("rate_b"),
        # degenerate pools (0% or 100% conversion) have zero standard
        # error: report z = 0 rather than a null/∞ division
        F.when(se > 0, pround((ca / na - cb / nb) / se, 6))
        .otherwise(F.lit(0.0))
        .alias("z_score"),
    )


AB_TEST_SQL = f"""
WITH per_user AS (
  SELECT CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT % 2 = 0
              THEN 'A' ELSE 'B' END AS variant,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
),
agg AS (
  SELECT variant, count(*) AS n_users, CAST(sum(converted) AS BIGINT) AS n_converted
  FROM per_user GROUP BY variant
),
j AS (
  SELECT a.n_users AS na, a.n_converted AS ca,
         b.n_users AS nb, b.n_converted AS cb
  FROM (SELECT * FROM agg WHERE variant = 'A') a
  CROSS JOIN (SELECT * FROM agg WHERE variant = 'B') b
)
SELECT na AS users_a, ca AS conv_a, nb AS users_b, cb AS conv_b,
  {pround_sql('CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)', 6)} AS rate_a,
  {pround_sql('CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)', 6)} AS rate_b,
  CASE WHEN sqrt(((CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE)) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
                 * (1.0 - (CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE)) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))
                 * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE))) > 0
  THEN {pround_sql(
    '(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) - CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))'
    ' / sqrt(((CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE)) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))'
    ' * (1.0 - (CAST(ca AS DOUBLE) + CAST(cb AS DOUBLE)) / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))'
    ' * (1.0 / CAST(na AS DOUBLE) + 1.0 / CAST(nb AS DOUBLE)))', 6)}
  ELSE 0.0 END AS z_score
FROM j
"""


#: entropy fixed-point scale (milli-nats, the proven-portable ln scale)
ENT_SCALE = 1000


def user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each user's event-type mix — the behavioral
    -diversity score (0 = single-type user, ln 5 ≈ 1.609 max here).

    Per-(user, type) counts are exact; each ``−p·ln p`` term is floored
    to integer milli-nats BEFORE the per-user sum (5 terms max), so the
    score is an exact integer sum — the same fixed-point defense the
    retrieval and PSI operators use.  One shuffle on (user, type), one
    on user.
    """
    e = load_table(spark, sf_dir, "events")
    ut = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = ut.groupBy("user_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    term = F.floor(-p * F.log(p) * ENT_SCALE).cast("long")
    return (
        ut.join(tot, "user_id")
        .select("user_id", term.alias("t"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("t").alias("entropy_millinats"),
        )
        .orderBy("user_id")
    )


ENTROPY_SQL = f"""
WITH ut AS (
  SELECT user_id, event_type, count(*) AS n FROM events
  GROUP BY user_id, event_type
),
tot AS (SELECT user_id, sum(n) AS tot FROM ut GROUP BY user_id)
SELECT ut.user_id,
       count(*) AS n_types,
       CAST(sum(CAST(floor(-(ut.n * 1.0 / tot.tot) * ln(ut.n * 1.0 / tot.tot)
                      * {ENT_SCALE}) AS BIGINT)) AS BIGINT) AS entropy_millinats
FROM ut JOIN tot ON ut.user_id = tot.user_id
GROUP BY ut.user_id
ORDER BY ut.user_id
"""


def chi_square_priority_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit: is order priority independent of
    the order-date weekday?  Reports each contingency cell's observed
    count, expected count (from the marginals), and chi-square
    contribution — the categorical-drift test a feature-store health
    check runs.

    Observed counts and both marginals are exact integers; each cell's
    expected value ``row_tot·col_tot/N`` and contribution
    ``(o−e)²/e`` are fixed double expressions floored to integer
    micros, so the report (and the implied statistic: sum the
    contribution column) is engine-exact.  One scan, one cell-grain
    aggregate, two broadcast marginal joins.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.dayofweek(F.col("o_orderdate").cast("date")).alias("dow"),
    )
    cells = base.groupBy("prio", "dow").agg(F.count(F.lit(1)).alias("obs"))
    row_m = cells.groupBy("prio").agg(F.sum("obs").alias("row_tot"))
    col_m = cells.groupBy("dow").agg(F.sum("obs").alias("col_tot"))
    tot = cells.agg(F.sum("obs").alias("n"))
    e = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("n").cast("double")
    )
    contrib = (F.col("obs").cast("double") - e) * (
        F.col("obs").cast("double") - e
    ) / e
    return (
        cells.join(F.broadcast(row_m), "prio")
        .join(F.broadcast(col_m), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "prio",
            "dow",
            "obs",
            F.floor(e * 1_000_000).cast("long").alias("expected_micros"),
            F.floor(contrib * 1_000_000).cast("long").alias("chi2_micros"),
        )
        .orderBy("prio", "dow")
    )


CHI2_SQL = """
WITH base AS (
  -- DuckDB dayofweek is 0-based (Sunday=0); Spark's is 1-based — align
  SELECT o_orderpriority AS prio,
         CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INTEGER) AS dow
  FROM orders
),
cells AS (SELECT prio, dow, count(*) AS obs FROM base GROUP BY prio, dow),
row_m AS (SELECT prio, sum(obs) AS row_tot FROM cells GROUP BY prio),
col_m AS (SELECT dow, sum(obs) AS col_tot FROM cells GROUP BY dow),
tot AS (SELECT sum(obs) AS n FROM cells)
SELECT c.prio, c.dow, c.obs,
  CAST(floor((CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(n AS DOUBLE))
             * 1000000.0) AS BIGINT) AS expected_micros,
  CAST(floor(((CAST(obs AS DOUBLE)
               - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(n AS DOUBLE))
              * (CAST(obs AS DOUBLE)
                 - CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(n AS DOUBLE))
              / (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE) / CAST(n AS DOUBLE)))
             * 1000000.0) AS BIGINT) AS chi2_micros
FROM cells c
JOIN row_m USING (prio)
JOIN col_m USING (dow)
CROSS JOIN tot
ORDER BY c.prio, c.dow
"""


#: the two periods the delta explainer compares (full years)
DELTA_A = ("1996-01-01", "1997-01-01")
DELTA_B = ("1997-01-01", "1998-01-01")


def revenue_delta_contributors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric-regression explanation mining (the Scorpion/DIFF shape):
    which customer-nation slices explain the year-over-year revenue
    change?  Per nation: revenue in period A, period B, the delta, and
    the slice's share of TOTAL ABSOLUTE MOVEMENT in ppm, ranked by
    movement — the first query an analyst runs when a dashboard metric
    jumps.

    Share uses integer cents and ``abs`` before the integer division so
    both engines floor identically regardless of delta sign.  One scan
    of the fact join covers both periods (conditional sums), nations
    broadcast; at 100 TB this is a single shuffle on n_name of
    pre-aggregated partials.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    a0, mid, b1 = DELTA_A[0], DELTA_A[1], DELTA_B[1]
    # price×(1−discount) as EXACT integer cents×basis-points: both
    # factors are 2-decimal, so the per-row product of their ×100
    # integers is exact and the sums are order-independent BIGINTs
    # (tie-fuzz caught the double-sum variant tipping a half-cent
    # differently per engine)
    rev4 = F.expr(
        "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"
        " * CAST(floor((1 - l_discount) * 100.0 + 0.5) AS BIGINT)"
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter((F.col("o_orderdate") >= F.lit(a0)) & (F.col("o_orderdate") < F.lit(b1)))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    per = j.groupBy("n_name").agg(
        F.coalesce(
            F.sum(F.when(F.col("o_orderdate") < F.lit(mid), rev4)), F.lit(0)
        )
        .cast("long")
        .alias("a4"),
        F.coalesce(
            F.sum(F.when(F.col("o_orderdate") >= F.lit(mid), rev4)), F.lit(0)
        )
        .cast("long")
        .alias("b4"),
    )
    # half-up cents from the exact ×10⁴ integer delta, in PURE integer
    # arithmetic (a float round-trip here tie-fuzzed to a 1-ulp flip at
    # an exact half-cent).  Spark DIV and DuckDB // both truncate
    # toward zero, so they agree on every sign; the +OFFSET keeps the
    # dividend positive so the half-up rounding step is a true floor
    # (trunc==floor) as the rounding identity requires.
    off = 10**12
    per = per.select(
        "n_name",
        pround(F.col("a4") / 10000.0, 2).alias("rev_a"),
        pround(F.col("b4") / 10000.0, 2).alias("rev_b"),
        F.expr(
            f"CAST((b4 - a4 + 50 + {off * 100}) DIV 100 - {off} AS BIGINT)"
        ).alias("delta_cents"),
    )
    tot = per.agg(
        F.sum(F.abs(F.col("delta_cents"))).cast("long").alias("total_move_cents")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc(F.abs(F.col("delta_cents"))), F.asc("n_name"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "n_name",
            "rev_a",
            "rev_b",
            "delta_cents",
            (F.col("delta_cents") / 100.0).alias("delta"),
            F.expr(
                "CAST(CAST(abs(delta_cents) AS DECIMAL(38,0)) * 1000000"
                " DIV total_move_cents AS BIGINT)"
            ).alias("move_share_ppm"),
        )
        .withColumn("rk", F.row_number().over(w))
        .drop("delta_cents")
        .orderBy("rk")
    )


REVENUE_DELTA_SQL = f"""
WITH j AS (
  SELECT n_name, o_orderdate,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
           * CAST(floor((1 - l_discount) * 100.0 + 0.5) AS BIGINT) AS rev4
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE o_orderdate >= '{DELTA_A[0]}' AND o_orderdate < '{DELTA_B[1]}'
),
sums AS (
  SELECT n_name,
         CAST(coalesce(sum(CASE WHEN o_orderdate < '{DELTA_A[1]}' THEN rev4 END), 0)
              AS BIGINT) AS a4,
         CAST(coalesce(sum(CASE WHEN o_orderdate >= '{DELTA_B[0]}' THEN rev4 END), 0)
              AS BIGINT) AS b4
  FROM j GROUP BY n_name
),
cents AS (
  SELECT n_name,
         {pround_sql('a4 / 10000.0', 2)} AS rev_a,
         {pround_sql('b4 / 10000.0', 2)} AS rev_b,
         CAST((b4 - a4 + 50 + {10**12 * 100}) // 100 - {10**12} AS BIGINT)
           AS delta_cents
  FROM sums
),
tot AS (SELECT CAST(sum(abs(delta_cents)) AS BIGINT) AS total_move_cents FROM cents)
SELECT n_name, rev_a, rev_b,
       delta_cents / 100.0 AS delta,
       CAST(CAST(abs(delta_cents) AS HUGEINT) * 1000000
         // total_move_cents AS BIGINT) AS move_share_ppm,
       CAST(row_number() OVER (ORDER BY abs(delta_cents) DESC, n_name ASC)
            AS INTEGER) AS rk
FROM cents CROSS JOIN tot
ORDER BY rk
"""


#: bootstrap replica count; order-statistic CI indices below assume 32
N_BOOT = 32


def bootstrap_ci_purchase_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed bootstrap CI for the mean purchase value, fully
    deterministic: replica ``b`` is the half-sample of purchases whose
    ``md5(event_id:b)`` is even (subsample bootstrap — membership is a
    pure function of the row, so no RNG stream and no driver loop), and
    the CI is an ORDER STATISTIC of the 32 replica means (2nd / 31st ≈
    p5 / p95), which keeps every output integer-exact — no float
    percentile interpolation to diverge cross-engine.

    Scale shape: one map-side-combinable aggregate over a 32-way
    explode of the purchase slice (32× scan rows, zero extra shuffle
    keys beyond the replica id); the order-statistic window runs over
    exactly ``N_BOOT`` rows.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        "event_id",
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
    )
    full = e.agg(
        F.expr(
            "CAST(CAST(sum(cents) AS DECIMAL(38,0)) * 1000000"
            " DIV count(*) AS BIGINT)"
        ).alias("point_micro")
    )
    reps = e.select(
        "event_id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(N_BOOT - 1))).alias("b"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("event_id"), F.col("b"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    per = (
        reps.filter(F.pmod(h, F.lit(2)) == 0)
        .groupBy("b")
        .agg(
            F.expr(
                "CAST(CAST(sum(cents) AS DECIMAL(38,0)) * 1000000"
                " DIV count(*) AS BIGINT)"
            ).alias("mean_micro")
        )
    )
    from pyspark.sql import Window

    ranked = per.withColumn(
        "rk", F.row_number().over(Window.orderBy("mean_micro", "b"))
    )
    ci = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_replicas"),
        F.max(F.when(F.col("rk") == 2, F.col("mean_micro"))).alias("ci_lo_micro"),
        F.max(F.when(F.col("rk") == N_BOOT - 1, F.col("mean_micro"))).alias(
            "ci_hi_micro"
        ),
    )
    return ci.crossJoin(F.broadcast(full)).select(
        "point_micro", "n_replicas", "ci_lo_micro", "ci_hi_micro"
    )


BOOTSTRAP_CI_SQL = f"""
WITH p AS (
  SELECT event_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
full_mean AS (
  SELECT CAST(CAST(sum(cents) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
    AS point_micro FROM p
),
reps AS (
  SELECT p.event_id, p.cents, b.b
  FROM p, (SELECT unnest(range({N_BOOT})) AS b) b
  WHERE ('0x' || substr(md5(p.event_id || ':' || b.b), 1, 15))::BIGINT % 2 = 0
),
per AS (
  SELECT b, CAST(CAST(sum(cents) AS HUGEINT) * 1000000 // count(*)
           AS BIGINT) AS mean_micro
  FROM reps GROUP BY b
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY mean_micro, b) AS rk FROM per
)
SELECT (SELECT point_micro FROM full_mean) AS point_micro,
       CAST(count(*) AS BIGINT) AS n_replicas,
       max(CASE WHEN rk = 2 THEN mean_micro END) AS ci_lo_micro,
       max(CASE WHEN rk = {N_BOOT - 1} THEN mean_micro END) AS ci_hi_micro
FROM ranked
"""


def cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout (Deng et al. 2013): per-user
    post-period purchase revenue adjusted by pre-period revenue as the
    control covariate — the industry-standard variance-reduction step
    that makes the same experiment decisive with a fraction of the
    users.  Extends :func:`ab_test_analysis` (same md5 50/50
    assignment) from conversion counts to a continuous metric.

    Per user: X = pre-half purchase cents, Y = post-half purchase
    cents (zero-filled — absence is signal).  θ = cov(X,Y)/var(X) is
    fitted POOLED (assignment-independent, so the adjustment is
    unbiased), and each arm reports mean Y and mean (Y − θ·(X − X̄))
    plus the theoretical variance reduction ρ².  All moments are exact
    DECIMAL(38,0) integer sums — order-independent across any
    partitioning — and every double expression evaluates ONCE per arm
    from those sums (the ``profile_correlations`` convention), so the
    readout hash-matches DuckDB.

    Scale shape: one event scan → per-(user, half) cents rollup →
    |users|-sized pivot; the pooled 1-row moment table broadcasts onto
    the 2-row arm aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        F.expr("unix_micros(ts) DIV 86400000000").alias("eday"),
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long"),
        )
        .otherwise(0)
        .alias("cents"),
    )
    bounds = base.agg(F.min("eday").alias("d0"), F.max("eday").alias("d1"))
    variant = F.when(
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    per_user = (
        base.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.expr("eday <= (d0 + d1) DIV 2"), F.col("cents"))
                .otherwise(0)
            )
            .cast("decimal(38,0)")
            .alias("x"),
            F.sum(
                F.when(F.expr("eday > (d0 + d1) DIV 2"), F.col("cents"))
                .otherwise(0)
            )
            .cast("decimal(38,0)")
            .alias("y"),
        )
        .select(variant.alias("variant"), "x", "y")
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("y * y")).alias("syy"),
    )
    arms = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").alias("sx_a"),
        F.sum("y").alias("sy_a"),
    )
    j = arms.crossJoin(F.broadcast(pooled))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, sxy = F.col("sxx").cast("double"), F.col("sxy").cast("double")
    syy = F.col("syy").cast("double")
    cov_n = n * sxy - sx * sy  # n² × cov
    var_xn = n * sxx - sx * sx
    var_yn = n * syy - sy * sy
    theta = cov_n / var_xn
    na = F.col("n_users").cast("double")
    mean_y = F.col("sy_a").cast("double") / na
    mean_x = F.col("sx_a").cast("double") / na
    adj = mean_y - theta * (mean_x - sx / n)
    return j.select(
        "variant",
        "n_users",
        F.expr("CAST(sy_a AS BIGINT)").alias("sum_y_cents"),
        pround(mean_y, 4).alias("mean_y_cents"),
        pround(adj, 4).alias("mean_y_adj_cents"),
        pround(theta, 6).alias("theta"),
        pround(cov_n * cov_n / (var_xn * var_yn), 6).alias(
            "var_reduction"
        ),
    ).orderBy("variant")


CUPED_SQL = f"""
WITH base AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS eday,
         CASE WHEN event_type = 'purchase'
              THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
              ELSE 0 END AS cents
  FROM events
),
bounds AS (SELECT min(eday) AS d0, max(eday) AS d1 FROM base),
per_user AS (
  SELECT CASE WHEN CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                           1, 15))::UBIGINT AS BIGINT)
                   % 2 = 0
              THEN 'A' ELSE 'B' END AS variant,
         sum(CASE WHEN b.eday <= (d.d0 + d.d1) // 2
                  THEN b.cents ELSE 0 END)::HUGEINT AS x,
         sum(CASE WHEN b.eday > (d.d0 + d.d1) // 2
                  THEN b.cents ELSE 0 END)::HUGEINT AS y
  FROM base b, bounds d
  GROUP BY user_id
),
pooled AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
  FROM per_user
),
arms AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
         sum(x) AS sx_a, sum(y) AS sy_a
  FROM per_user GROUP BY variant
)
SELECT variant, n_users,
       CAST(sy_a AS BIGINT) AS sum_y_cents,
       {pround_sql("CAST(sy_a AS DOUBLE) / CAST(n_users AS DOUBLE)", 4)}
         AS mean_y_cents,
       {pround_sql(
           "CAST(sy_a AS DOUBLE) / CAST(n_users AS DOUBLE)"
           " - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           "     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           "    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
           "       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
           "   * (CAST(sx_a AS DOUBLE) / CAST(n_users AS DOUBLE)"
           "      - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))", 4)}
         AS mean_y_adj_cents,
       {pround_sql(
           "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
           "    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))", 6)}
         AS theta,
       {pround_sql(
           "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           "  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
           "    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))"
           " / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
           "     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
           "    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
           "       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))", 6)}
         AS var_reduction
FROM arms, pooled
ORDER BY variant
"""


def jackknife_ratio_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete-one-day jackknife variance for the ratio metric revenue
    per click — ratio metrics are the ones a naive per-row variance
    gets WRONG (numerator and denominator co-vary), and the
    day-blocked jackknife is the standard correction that also
    respects within-day correlation.

    Each leave-one-day-out replicate is an INTEGER micro-ratio
    ``r_i = (S−s_i)·1e6 DIV (C−c_i)`` (days where the remaining click
    total would be zero are dropped — those replicates are undefined);
    the jackknife variance (n−1)·(n·Σr² − (Σr)²) DIV n² then runs in
    exact DECIMAL(38,0) arithmetic end-to-end — no float accumulation
    over replicates, which is what would break cross-engine hashing.

    Scale shape: one event scan → per-day rollup; the 1-row total
    broadcasts onto the |days|-row replicate relation.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            F.expr("unix_micros(ts) DIV 86400000000").alias("eday"),
            F.when(
                F.col("event_type") == "purchase",
                F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long"),
            )
            .otherwise(0)
            .alias("cents"),
            F.when(F.col("event_type") == "click", 1).otherwise(0).alias("c1"),
        )
        .groupBy("eday")
        .agg(
            F.sum("cents").cast("long").alias("s_i"),
            F.sum("c1").cast("long").alias("c_i"),
        )
    )
    tot = daily.agg(
        F.sum("s_i").cast("long").alias("s"),
        F.sum("c_i").cast("long").alias("c"),
    )
    reps = (
        daily.crossJoin(F.broadcast(tot))
        .filter(F.expr("c - c_i > 0"))
        .select(
            F.expr(
                "CAST((CAST(s AS DECIMAL(38,0)) - s_i) * 1000000"
                " DIV (c - c_i) AS DECIMAL(38,0))"
            ).alias("r"),
            "s",
            "c",
        )
    )
    agg = reps.groupBy("s", "c").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("r").alias("sr"),
        F.sum(F.expr("r * r")).alias("srr"),
    )
    return agg.select(
        "n_days",
        F.col("s").alias("total_cents"),
        F.col("c").alias("total_clicks"),
        F.expr(
            "CAST(CAST(s AS DECIMAL(38,0)) * 1000000 DIV c AS BIGINT)"
        ).alias("ratio_micro"),
        F.expr(
            "CAST((n_days - 1) * (n_days * srr - sr * sr)"
            " DIV (CAST(n_days AS DECIMAL(38,0)) * n_days) AS BIGINT)"
        ).alias("jk_var_micro2"),
    )


JACKKNIFE_SQL = """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS eday,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS s_i,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS c_i
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(sum(s_i) AS BIGINT) AS s, CAST(sum(c_i) AS BIGINT) AS c
  FROM daily
),
reps AS (
  SELECT (t.s::HUGEINT - d.s_i) * 1000000 // (t.c - d.c_i) AS r, t.s, t.c
  FROM daily d, tot t
  WHERE t.c - d.c_i > 0
),
agg AS (
  SELECT s, c, CAST(count(*) AS BIGINT) AS n_days,
         sum(r) AS sr, sum(r * r) AS srr
  FROM reps GROUP BY s, c
)
SELECT n_days, s AS total_cents, c AS total_clicks,
       CAST(s::HUGEINT * 1000000 // c AS BIGINT) AS ratio_micro,
       CAST((n_days - 1) * (n_days * srr - sr * sr)
            // (n_days::HUGEINT * n_days) AS BIGINT) AS jk_var_micro2
FROM agg
"""


def winsorized_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust A/B revenue readout: per-user purchase totals clipped at
    the POOLED P99 before comparing arm means — the standard defense
    against one whale user deciding the experiment (and clipping at
    the pooled quantile, not per-arm, keeps the treatment comparison
    unbiased).

    The P99 is a rank selection via prefix sums over the per-distinct-
    total rollup (value-domain bounded, no row sort — the
    ``pinball_loss_eval`` form); means are exact integer micro-cents.
    Same md5 50/50 assignment as :func:`ab_test_analysis` /
    :func:`cuped_adjusted_lift`.
    """
    e = load_table(spark, sf_dir, "events")
    variant = F.when(
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long"),
                ).otherwise(0)
            )
            .cast("long")
            .alias("y")
        )
        .select(variant.alias("variant"), "y")
    )
    counts = per_user.groupBy("y").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wcum = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "y",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).cast("long").alias("n"),
    )
    p99 = (
        cum.filter(F.expr("cum >= (99 * n + 99) DIV 100"))
        .agg(F.min("y").alias("p99_cents"))
    )
    tagged = per_user.crossJoin(F.broadcast(p99))
    return (
        tagged.groupBy("variant")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.max("p99_cents").alias("p99_cents"),
            F.sum(F.expr("CAST(y > p99_cents AS BIGINT)"))
            .cast("long")
            .alias("n_clipped"),
            F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
            F.sum(F.expr("CAST(LEAST(y, p99_cents) AS DECIMAL(38,0))")).alias(
                "syc"
            ),
        )
        .select(
            "variant",
            "n_users",
            "p99_cents",
            "n_clipped",
            F.expr("CAST(sy * 1000000 DIV n_users AS BIGINT)").alias(
                "raw_mean_microcents"
            ),
            F.expr("CAST(syc * 1000000 DIV n_users AS BIGINT)").alias(
                "clipped_mean_microcents"
            ),
        )
        .orderBy("variant")
    )


WINSOR_AB_SQL = """
WITH per_user AS (
  SELECT CASE WHEN ('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                      1, 15))::UBIGINT % 2 = 0
              THEN 'A' ELSE 'B' END AS variant,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
counts AS (SELECT y, CAST(count(*) AS BIGINT) AS cnt FROM per_user GROUP BY y),
cum AS (
  SELECT y,
         sum(cnt) OVER (ORDER BY y
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         CAST(sum(cnt) OVER () AS BIGINT) AS n
  FROM counts
),
p99 AS (
  SELECT min(y) AS p99_cents FROM cum WHERE cum >= (99 * n + 99) // 100
)
SELECT variant,
       CAST(count(*) AS BIGINT) AS n_users,
       max(p99_cents) AS p99_cents,
       CAST(sum(CASE WHEN y > p99_cents THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped,
       CAST(sum(y)::HUGEINT * 1000000 // count(*) AS BIGINT)
         AS raw_mean_microcents,
       CAST(sum(LEAST(y, p99_cents))::HUGEINT * 1000000 // count(*)
            AS BIGINT) AS clipped_mean_microcents
FROM per_user, p99
GROUP BY variant
ORDER BY variant
"""


def uplift_by_decile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uplift-by-decile (Qini-style) readout: users bucketed into
    pooled deciles of PRE-period revenue, per-decile treatment-vs-
    control mean of POST-period revenue — the "who does the treatment
    actually move" panel that decides targeting, where the flat A/B
    mean hides heterogeneous effects.

    Decile boundaries are rank selections on the pooled pre-revenue
    rollup (value-domain bounded); a user's decile is 1 + the count of
    boundaries strictly below their pre value (identical arithmetic on
    both engines, no interpolation).  Means are exact integer
    micro-cents; uplift is their difference.  Same md5 assignment and
    pre/post halves as :func:`cuped_adjusted_lift`.
    """
    e = load_table(spark, sf_dir, "events")
    base = e.select(
        "user_id",
        F.expr("unix_micros(ts) DIV 86400000000").alias("eday"),
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long"),
        )
        .otherwise(0)
        .alias("cents"),
    )
    bounds = base.agg(F.min("eday").alias("d0"), F.max("eday").alias("d1"))
    variant = F.when(
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 2
        == 0,
        "A",
    ).otherwise("B")
    per_user = (
        base.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.expr("eday <= (d0 + d1) DIV 2"), F.col("cents"))
                .otherwise(0)
            )
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(F.expr("eday > (d0 + d1) DIV 2"), F.col("cents"))
                .otherwise(0)
            )
            .cast("long")
            .alias("y"),
        )
        .select("user_id", variant.alias("variant"), "x", "y")
    )
    counts = per_user.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wcum = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "x",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).cast("long").alias("n"),
    )
    deciles = spark.range(1, 10).select(F.col("id").cast("int").alias("q"))
    cuts = (
        cum.crossJoin(F.broadcast(deciles))
        .filter(F.expr("cum >= (q * n + 9) DIV 10"))
        .groupBy("q")
        .agg(F.min("x").alias("b"))
    )
    # decile = 1 + count of boundaries strictly below x (grouped by
    # user_id so distinct users sharing (x, y) keep their multiplicity)
    assigned = (
        per_user.crossJoin(F.broadcast(cuts))
        .groupBy("user_id", "variant", "y")
        .agg(
            (
                1 + F.sum(F.expr("CAST(b < x AS INT)"))
            )
            .cast("int")
            .alias("decile")
        )
    )
    agg = assigned.groupBy("decile", "variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
    )
    a = agg.filter("variant = 'A'").select(
        "decile",
        F.col("n_users").alias("n_a"),
        F.expr("CAST(sy * 1000000 DIV n_users AS BIGINT)").alias(
            "mean_y_a_micro"
        ),
    )
    b = agg.filter("variant = 'B'").select(
        "decile",
        F.col("n_users").alias("n_b"),
        F.expr("CAST(sy * 1000000 DIV n_users AS BIGINT)").alias(
            "mean_y_b_micro"
        ),
    )
    return (
        a.join(b, "decile")
        .select(
            "decile",
            "n_a",
            "n_b",
            "mean_y_a_micro",
            "mean_y_b_micro",
            F.expr("mean_y_a_micro - mean_y_b_micro").alias("uplift_micro"),
        )
        .orderBy("decile")
    )


UPLIFT_DECILE_SQL = """
WITH base AS (
  SELECT user_id, epoch_us(ts) // 86400000000 AS eday,
         CASE WHEN event_type = 'purchase'
              THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
              ELSE 0 END AS cents
  FROM events
),
bounds AS (SELECT min(eday) AS d0, max(eday) AS d1 FROM base),
per_user AS (
  SELECT user_id,
         CASE WHEN ('0x' || substring(md5(CAST(user_id AS VARCHAR)),
                                      1, 15))::UBIGINT % 2 = 0
              THEN 'A' ELSE 'B' END AS variant,
         CAST(sum(CASE WHEN b.eday <= (d.d0 + d.d1) // 2
                       THEN b.cents ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN b.eday > (d.d0 + d.d1) // 2
                       THEN b.cents ELSE 0 END) AS BIGINT) AS y
  FROM base b, bounds d GROUP BY user_id
),
counts AS (SELECT x, CAST(count(*) AS BIGINT) AS cnt FROM per_user GROUP BY x),
cum AS (
  SELECT x,
         sum(cnt) OVER (ORDER BY x
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         CAST(sum(cnt) OVER () AS BIGINT) AS n
  FROM counts
),
qs AS (SELECT unnest(generate_series(1, 9)) AS q),
cuts AS (
  SELECT q, min(x) AS b FROM cum, qs
  WHERE cum >= (q * n + 9) // 10 GROUP BY q
),
assigned AS (
  SELECT p.variant, p.y,
         CAST(1 + sum(CASE WHEN c.b < p.x THEN 1 ELSE 0 END) AS INT)
           AS decile
  FROM per_user p CROSS JOIN cuts c
  GROUP BY p.user_id, p.variant, p.y
),
agg AS (
  SELECT decile, variant,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(y)::HUGEINT * 1000000 // count(*) AS BIGINT) AS mean_micro
  FROM assigned GROUP BY 1, 2
)
SELECT a.decile, a.n_users AS n_a, b.n_users AS n_b,
       a.mean_micro AS mean_y_a_micro, b.mean_micro AS mean_y_b_micro,
       a.mean_micro - b.mean_micro AS uplift_micro
FROM (SELECT * FROM agg WHERE variant = 'A') a
JOIN (SELECT * FROM agg WHERE variant = 'B') b USING (decile)
ORDER BY a.decile
"""


#: χ²(df=9) critical value at α=0.001, in micro units — the standard
#: SRM alert threshold for a 10-way uniform split
SRM_CRIT_MICRO = 27_877_000


def srm_chi_square_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch guardrail: users hashed into 10 equal
    traffic buckets (same md5 assignment family as
    :func:`ab_test_analysis`), uniform-fit χ² in exact micro units,
    flagged against the χ²(9, α=0.001) critical value — the first
    alarm every experimentation platform runs before any readout is
    trusted, since a biased splitter invalidates all of them.

    Exactness: with o_i the bucket count and N total,
    ``(o_i − N/10)²/(N/10) = (10·o_i − N)²/(10·N)``, so
    ``chi2_micro = Σ(10·o_i − N)² · 1e6 DIV (10·N)`` — one truncating
    division at the end, all accumulation in DECIMAL(38,0) (HUGEINT on
    the oracle), overflow-safe past 1e12 users.  The 0..9 bucket spine
    is generated explicitly and left-joined so an EMPTY bucket (tiny
    subsets; the very thing SRM should scream about) still contributes
    its full (0 − N/10)² deviation instead of silently vanishing.

    Scale: one distinct-user rollup (map-side combinable) → 10-row
    relation; everything after is constant-sized.
    """
    e = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
        ).cast("long")
        % 10
    ).cast("int")
    per = (
        e.select("user_id")
        .distinct()
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    spine = spark.createDataFrame([(b,) for b in range(10)], "bucket int")
    filled = spine.join(per, "bucket", "left").select(
        "bucket", F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_users")
    )
    tot = filled.agg(F.sum("n_users").cast("long").alias("n"))
    chi = (
        filled.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.expr(
                    "CAST(10 * n_users - n AS DECIMAL(38,0))"
                    " * (10 * n_users - n)"
                )
            ).alias("dev2"),
            F.max("n").alias("n"),
        )
        .select(
            F.expr(
                "CAST(dev2 * 1000000 DIV (10 * CAST(n AS DECIMAL(38,0)))"
                " AS BIGINT)"
            ).alias("chi2_micro")
        )
    )
    return (
        filled.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(chi))
        .select(
            "bucket",
            "n_users",
            F.expr("CAST(n * 1000000 DIV 10 AS BIGINT)").alias(
                "expected_micro"
            ),
            "chi2_micro",
            (F.col("chi2_micro") > F.lit(SRM_CRIT_MICRO)).alias("srm_flag"),
        )
        .orderBy("bucket")
    )


SRM_SQL = f"""
WITH per AS (
  SELECT CAST(('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT % 10
              AS INTEGER) AS bucket,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM (SELECT DISTINCT user_id FROM events)
  GROUP BY 1
),
spine AS (SELECT unnest(generate_series(0, 9)) AS bucket),
filled AS (
  SELECT s.bucket, CAST(coalesce(p.n_obs, 0) AS BIGINT) AS n_users
  FROM spine s LEFT JOIN per p ON p.bucket = s.bucket
),
tot AS (SELECT CAST(sum(n_users) AS BIGINT) AS n FROM filled),
chi AS (
  SELECT CAST(sum((10 * n_users - n)::HUGEINT * (10 * n_users - n))
              * 1000000 // (10 * n::HUGEINT) AS BIGINT) AS chi2_micro
  FROM filled, tot GROUP BY n
)
SELECT CAST(f.bucket AS INTEGER) AS bucket, f.n_users,
       CAST(t.n * 1000000 // 10 AS BIGINT) AS expected_micro,
       c.chi2_micro,
       c.chi2_micro > {SRM_CRIT_MICRO} AS srm_flag
FROM filled f, tot t, chi c
ORDER BY bucket
"""


#: randomization-inference relabelings — fixed, so the explode factor
#: (and the plan) never grows with data
N_PERM = 128


def permutation_test_weekend_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact randomization test (Fisher 1935): is weekend purchase
    value different from weekday?  The observed statistic is the
    difference of group means in micro-cents; the null distribution is
    ``N_PERM`` deterministic relabelings — permutation ``r`` assigns
    each purchase to a pseudo-group by ``md5(event_id:perm:r)`` parity
    (the ``bootstrap_ci`` membership-is-a-pure-function-of-the-row
    trick, so there is no RNG stream, no driver loop, and any executor
    computes any row's label) — and the p-value is the add-one-smoothed
    extreme share ``(1 + #{|T_r| ≥ |T_obs|})·1e6 DIV (N_PERM+1)``.

    Where the siblings stop: :func:`bootstrap_ci_purchase_mean` gives a
    CI (no hypothesis), ``mann_whitney_value_shift`` tests RANKS via a
    normal approximation — this is the exact-inference member: no
    distributional assumption, integer end-to-end (every mean is
    ``sum·1e6 DIV n``, every comparison is on integers), so both
    engines agree bit-for-bit.

    Scale: one explode of the purchase slice by the fixed ``N_PERM``
    (map-side-combinable sums per label — 128 output groups), observed
    row broadcast onto the 128-row null table.  At 100× data the
    explode stays linear and the group count stays 128.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    # the ×N_PERM explode and its 128 md5 labelings per purchase run in
    # the SCAN stage (Generate + partial agg sit below the exchange), so
    # a single-row-group input serializes ~3.2M md5 calls on one core —
    # spread the narrow purchase slice first (guide §2.5 input skew;
    # no-op on a well-split table, same guard as every spread_scan site)
    p = spread_scan(
        e.select(
            "event_id",
            F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias(
                "cents"
            ),
            (F.expr("weekday(ts)") >= 5).alias("wk"),
        )
    )
    # cent sums widen to DECIMAL(38,0) BEFORE the ·1e6: a LongType sum
    # wraps at ~9.2e12 cents of group revenue (the mann_whitney
    # overflow discipline); DuckDB's sum(BIGINT) is HUGEINT already
    mean_diff = (
        "CAST(CAST(sum(CASE WHEN g THEN cents END) AS DECIMAL(38,0))"
        " * 1000000"
        " DIV greatest(sum(CASE WHEN g THEN 1 ELSE 0 END), 1)"
        " - CAST(sum(CASE WHEN NOT g THEN cents END) AS DECIMAL(38,0))"
        " * 1000000"
        " DIV greatest(sum(CASE WHEN NOT g THEN 1 ELSE 0 END), 1)"
        " AS BIGINT)"
    )
    obs = p.withColumn("g", F.col("wk")).agg(
        F.expr("sum(CASE WHEN g THEN 1 ELSE 0 END)").alias("n_weekend"),
        F.expr("sum(CASE WHEN NOT g THEN 1 ELSE 0 END)").alias("n_weekday"),
        F.expr(mean_diff).alias("t_obs_micro"),
    )
    reps = p.select(
        "event_id",
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(N_PERM - 1))).alias("r"),
    ).withColumn(
        "g",
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col("event_id"), F.lit("perm"), F.col("r")
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(2),
        )
        == 1,
    )
    null_t = reps.groupBy("r").agg(F.expr(mean_diff).alias("t_r"))
    out = (
        null_t.crossJoin(F.broadcast(obs))
        .agg(
            F.max("n_weekend").alias("n_weekend"),
            F.max("n_weekday").alias("n_weekday"),
            F.max("t_obs_micro").alias("t_obs_micro"),
            F.count(F.lit(1)).cast("long").alias("n_perms"),
            F.expr(
                "CAST(sum(CASE WHEN abs(t_r) >= abs(t_obs_micro)"
                " THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("n_extreme"),
        )
        .select(
            "n_weekend",
            "n_weekday",
            "t_obs_micro",
            "n_perms",
            "n_extreme",
            F.expr(
                f"CAST((1 + n_extreme) * 1000000 DIV {N_PERM + 1}"
                " AS BIGINT)"
            ).alias("p_ppm"),
        )
    )
    return out


PERMUTATION_SQL = f"""
WITH p AS (
  SELECT event_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         datepart('isodow', ts) >= 6 AS wk
  FROM events WHERE event_type = 'purchase'
),
obs AS (
  SELECT CAST(sum(CASE WHEN wk THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend,
         CAST(sum(CASE WHEN NOT wk THEN 1 ELSE 0 END) AS BIGINT) AS n_weekday,
         CAST(sum(CASE WHEN wk THEN cents END) * 1000000
              // greatest(sum(CASE WHEN wk THEN 1 ELSE 0 END), 1)
            - sum(CASE WHEN NOT wk THEN cents END) * 1000000
              // greatest(sum(CASE WHEN NOT wk THEN 1 ELSE 0 END), 1)
            AS BIGINT) AS t_obs_micro
  FROM p
),
reps AS (
  SELECT p.cents,
         b.r,
         ('0x' || substr(md5(p.event_id || ':perm:' || b.r), 1, 15))::BIGINT
           % 2 = 1 AS g
  FROM p, (SELECT unnest(range({N_PERM})) AS r) b
),
null_t AS (
  SELECT r,
         CAST(sum(CASE WHEN g THEN cents END) * 1000000
              // greatest(sum(CASE WHEN g THEN 1 ELSE 0 END), 1)
            - sum(CASE WHEN NOT g THEN cents END) * 1000000
              // greatest(sum(CASE WHEN NOT g THEN 1 ELSE 0 END), 1)
            AS BIGINT) AS t_r
  FROM reps GROUP BY r
)
-- ungrouped aggregate + scalar subqueries (not GROUP BY over the cross
-- join): an empty null_t must still emit the 1-row readout Spark's
-- ungrouped .agg() emits, or the row counts diverge on degenerate input
SELECT (SELECT n_weekend FROM obs) AS n_weekend,
       (SELECT n_weekday FROM obs) AS n_weekday,
       (SELECT t_obs_micro FROM obs) AS t_obs_micro,
       CAST(count(*) AS BIGINT) AS n_perms,
       CAST(sum(CASE WHEN abs(t_r) >= abs((SELECT t_obs_micro FROM obs))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
       CAST((1 + sum(CASE WHEN abs(t_r)
                              >= abs((SELECT t_obs_micro FROM obs))
                     THEN 1 ELSE 0 END)) * 1000000 // {N_PERM + 1}
            AS BIGINT) AS p_ppm
FROM null_t
"""


def diff_in_diff_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences readout: users split 50/50 by the
    same md5 assignment as :func:`ab_test_analysis`, time split at the
    midpoint day of the observed range, metric = mean purchase cents
    per (arm, period) cell in micro units, and the DiD estimator
    ``(T_post − T_pre) − (C_post − C_pre)`` — the panel-data causal
    readout the plain A/B and CUPED variants don't give (it nets out
    both the arm's level difference and the common time trend).

    Every cell mean is ``sum·1e6 DIV n`` and the cutoff is integer day
    arithmetic (``min_day + days_between DIV 2``), so the single
    output row is exact in both engines.  Scale: one event scan into a
    4-cell aggregate; the cutoff scalar is a 1-row broadcast.
    """
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    p = e.select(
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias(
            "cents"
        ),
        (
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 15
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(2),
            )
            == 1
        ).alias("treat"),
    )
    cutoff = p.agg(
        F.expr(
            "date_add(min(day), CAST(datediff(max(day), min(day)) DIV 2"
            " AS INT))"
        ).alias("cutoff_day")
    )
    cells = (
        p.crossJoin(F.broadcast(cutoff))
        .withColumn("post", F.col("day") >= F.col("cutoff_day"))
        .groupBy()
        .agg(
            F.max("cutoff_day").alias("cutoff_day"),
            *[
                F.expr(
                    # DECIMAL(38,0)-widened before the ·1e6 (overflow
                    # discipline; DuckDB's sum is HUGEINT already)
                    f"CAST(CAST(sum(CASE WHEN treat = {t} AND post = {po}"
                    f" THEN cents END) AS DECIMAL(38,0)) * 1000000"
                    f" DIV greatest(sum(CASE WHEN treat = {t} AND"
                    f" post = {po} THEN 1 ELSE 0 END), 1) AS BIGINT)"
                ).alias(name)
                for name, t, po in (
                    ("c_pre_micro", "false", "false"),
                    ("c_post_micro", "false", "true"),
                    ("t_pre_micro", "true", "false"),
                    ("t_post_micro", "true", "true"),
                )
            ],
        )
    )
    return cells.select(
        "cutoff_day",
        "c_pre_micro",
        "c_post_micro",
        "t_pre_micro",
        "t_post_micro",
        F.expr(
            "CAST((t_post_micro - t_pre_micro)"
            " - (c_post_micro - c_pre_micro) AS BIGINT)"
        ).alias("did_micro"),
    )


DIFF_IN_DIFF_SQL = """
WITH p AS (
  SELECT ts::DATE AS day,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
           % 2 = 1 AS treat
  FROM events WHERE event_type = 'purchase'
),
cut AS (
  SELECT min(day) + CAST((max(day) - min(day)) // 2 AS INTEGER)
           AS cutoff_day FROM p
),
lab AS (
  SELECT p.*, p.day >= c.cutoff_day AS post FROM p, cut c
),
cells AS (
  SELECT
    (SELECT cutoff_day FROM cut) AS cutoff_day,
    CAST(sum(CASE WHEN NOT treat AND NOT post THEN cents END) * 1000000
         // greatest(sum(CASE WHEN NOT treat AND NOT post THEN 1 ELSE 0 END), 1)
         AS BIGINT) AS c_pre_micro,
    CAST(sum(CASE WHEN NOT treat AND post THEN cents END) * 1000000
         // greatest(sum(CASE WHEN NOT treat AND post THEN 1 ELSE 0 END), 1)
         AS BIGINT) AS c_post_micro,
    CAST(sum(CASE WHEN treat AND NOT post THEN cents END) * 1000000
         // greatest(sum(CASE WHEN treat AND NOT post THEN 1 ELSE 0 END), 1)
         AS BIGINT) AS t_pre_micro,
    CAST(sum(CASE WHEN treat AND post THEN cents END) * 1000000
         // greatest(sum(CASE WHEN treat AND post THEN 1 ELSE 0 END), 1)
         AS BIGINT) AS t_post_micro
  FROM lab
)
SELECT cutoff_day, c_pre_micro, c_post_micro, t_pre_micro, t_post_micro,
       CAST((t_post_micro - t_pre_micro) - (c_post_micro - c_pre_micro)
            AS BIGINT) AS did_micro
FROM cells
"""


SPARK_QUERIES = {
    "srm_chi_square_check": srm_chi_square_check,
    "ab_test_analysis": ab_test_analysis,
    "bootstrap_ci_purchase_mean": bootstrap_ci_purchase_mean,
    "user_behavior_entropy": user_behavior_entropy,
    "chi_square_priority_weekday": chi_square_priority_weekday,
    "revenue_delta_contributors": revenue_delta_contributors,
    "cuped_adjusted_lift": cuped_adjusted_lift,
    "jackknife_ratio_metric": jackknife_ratio_metric,
    "winsorized_ab_lift": winsorized_ab_lift,
    "uplift_by_decile": uplift_by_decile,
    "permutation_test_weekend_lift": permutation_test_weekend_lift,
    "diff_in_diff_lift": diff_in_diff_lift,
}

ORACLE_SQL = {
    "permutation_test_weekend_lift": PERMUTATION_SQL,
    "diff_in_diff_lift": DIFF_IN_DIFF_SQL,
    "srm_chi_square_check": SRM_SQL,
    "ab_test_analysis": AB_TEST_SQL,
    "bootstrap_ci_purchase_mean": BOOTSTRAP_CI_SQL,
    "user_behavior_entropy": ENTROPY_SQL,
    "chi_square_priority_weekday": CHI2_SQL,
    "revenue_delta_contributors": REVENUE_DELTA_SQL,
    "cuped_adjusted_lift": CUPED_SQL,
    "jackknife_ratio_metric": JACKKNIFE_SQL,
    "winsorized_ab_lift": WINSOR_AB_SQL,
    "uplift_by_decile": UPLIFT_DECILE_SQL,
}


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation of the purchase base — recency / frequency /
    monetary quintile scores per user, reported as segment cell counts
    (the CRM grid every lifecycle-marketing team starts from).

    Per purchasing user: recency = log-end − last purchase eday,
    frequency = purchase count, monetary = total cents.  Each
    dimension's quintile cuts are rank selections on its OWN
    value-domain rollup, and a user's score is 1 + the count of cuts
    strictly below their value (1..5, ties resolve identically on
    both engines — no interpolation, no row sort).  Output: one row
    per populated (r, f, m) cell with its user count — at most 125
    rows whatever the corpus size.
    """
    e = load_table(spark, sf_dir, "events")
    end = e.agg(
        F.max(F.expr("unix_micros(ts) DIV 86400000000")).alias("d_end")
    )
    per_user = (
        e.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(end))
        .groupBy("user_id")
        .agg(
            F.max(F.expr("d_end - unix_micros(ts) DIV 86400000000"))
            .cast("long")
            .alias("_neg"),
            F.min(F.expr("d_end - unix_micros(ts) DIV 86400000000"))
            .cast("long")
            .alias("recency"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)"))
            .cast("long")
            .alias("monetary"),
        )
        .drop("_neg")
        .persist()
    )

    def cuts(col: str) -> DataFrame:
        counts = per_user.groupBy(col).agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        wcum = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, 0
        )
        cum = counts.select(
            F.col(col).alias("v"),
            F.sum("cnt").over(wcum).alias("cum"),
            F.sum("cnt")
            .over(Window.partitionBy())
            .cast("long")
            .alias("n"),
        )
        qs = spark.range(1, 5).select(F.col("id").cast("int").alias("q"))
        return (
            cum.crossJoin(F.broadcast(qs))
            .filter(F.expr("cum >= (q * n + 4) DIV 5"))
            .groupBy("q")
            .agg(F.min("v").alias("b"))
            .agg(F.collect_list(F.struct("q", "b")).alias("bs"))
            .select(
                F.expr("transform(array_sort(bs), s -> s.b)").alias(
                    f"cuts_{col}"
                )
            )
        )

    scored = (
        per_user.crossJoin(F.broadcast(cuts("recency")))
        .crossJoin(F.broadcast(cuts("frequency")))
        .crossJoin(F.broadcast(cuts("monetary")))
        .select(
            F.expr(
                "1 + size(filter(cuts_recency, c -> c < recency))"
            ).alias("r_score"),
            F.expr(
                "1 + size(filter(cuts_frequency, c -> c < frequency))"
            ).alias("f_score"),
            F.expr(
                "1 + size(filter(cuts_monetary, c -> c < monetary))"
            ).alias("m_score"),
        )
    )
    out = (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
        .orderBy("r_score", "f_score", "m_score")
    )
    from projet_meteo_etl_spark.cachescope import scoped_cache

    return scoped_cache(out, per_user)


RFM_SQL = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) // 86400000000 AS eday,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
log_end AS (SELECT max(eday) AS d_end FROM e),
per_user AS (
  SELECT user_id,
         CAST(min(d.d_end - eday) AS BIGINT) AS recency,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(cents) AS BIGINT) AS monetary
  FROM e, log_end d WHERE event_type = 'purchase'
  GROUP BY user_id
),
rc AS (
  SELECT q, min(v) AS b FROM (
    SELECT recency AS v,
           sum(cnt) OVER (ORDER BY recency
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           CAST(sum(cnt) OVER () AS BIGINT) AS n
    FROM (SELECT recency, CAST(count(*) AS BIGINT) AS cnt
          FROM per_user GROUP BY recency)
  ), (SELECT unnest(generate_series(1, 4)) AS q)
  WHERE cum >= (q * n + 4) // 5 GROUP BY q
),
fc AS (
  SELECT q, min(v) AS b FROM (
    SELECT frequency AS v,
           sum(cnt) OVER (ORDER BY frequency
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           CAST(sum(cnt) OVER () AS BIGINT) AS n
    FROM (SELECT frequency, CAST(count(*) AS BIGINT) AS cnt
          FROM per_user GROUP BY frequency)
  ), (SELECT unnest(generate_series(1, 4)) AS q)
  WHERE cum >= (q * n + 4) // 5 GROUP BY q
),
mc AS (
  SELECT q, min(v) AS b FROM (
    SELECT monetary AS v,
           sum(cnt) OVER (ORDER BY monetary
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           CAST(sum(cnt) OVER () AS BIGINT) AS n
    FROM (SELECT monetary, CAST(count(*) AS BIGINT) AS cnt
          FROM per_user GROUP BY monetary)
  ), (SELECT unnest(generate_series(1, 4)) AS q)
  WHERE cum >= (q * n + 4) // 5 GROUP BY q
),
scored AS (
  SELECT CAST(1 + (SELECT count(*) FROM rc WHERE rc.b < p.recency) AS INT)
           AS r_score,
         CAST(1 + (SELECT count(*) FROM fc WHERE fc.b < p.frequency) AS INT)
           AS f_score,
         CAST(1 + (SELECT count(*) FROM mc WHERE mc.b < p.monetary) AS INT)
           AS m_score
  FROM per_user p
)
SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_users
FROM scored
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

SPARK_QUERIES["customer_rfm_segments"] = customer_rfm_segments
ORACLE_SQL["customer_rfm_segments"] = RFM_SQL


#: fixed-point scale for the elasticity logs (milli-nats)
ELAST_LOG_SCALE = 1000


def price_elasticity_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Log-log price elasticity of demand per part brand — the classic
    retail econometric read (slope of ``ln(quantity)`` on
    ``ln(price)`` across a brand's parts; ≈ −1 means unit-elastic),
    joining the causal family (DiD, CUPED, uplift) with the
    cross-sectional regression none of them covers.

    Exact fixed point end-to-end (the ``retention_halflife_fit``
    discipline): per part, quantity integrates as per-row integer
    cents (never a float sum), both variables enter as
    ``floor(1000·ln(integer))`` milli-nats, the per-brand OLS moments
    are DECIMAL(38,0)/HUGEINT sums, the slope is one trunc-toward-zero
    milli division (sign-split ``//`` in the oracle — elasticities are
    negative), and r² guards its zero-variance denominator with the
    NULL-in-both-engines convention.

    Scale: one lineitem scan → per-part quantity rollup
    (map-combinable), broadcast-joined to the part catalog; everything
    after is |parts|- then |brands|-bounded.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    per_part = (
        li.select(
            "l_partkey",
            F.expr(
                "CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)"
            ).alias("qc"),
        )
        .groupBy("l_partkey")
        .agg(F.sum("qc").alias("qty_cents"))
    )
    lg = f"floor({ELAST_LOG_SCALE}.0 * ln(CAST({{x}} AS DOUBLE)))"
    pts = (
        p.select(
            "p_brand",
            F.col("p_partkey").alias("l_partkey"),
            F.expr(
                "CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)"
            ).alias("price_cents"),
        )
        .join(per_part, "l_partkey")
        .filter((F.col("price_cents") > 0) & (F.col("qty_cents") > 0))
        .select(
            "p_brand",
            F.expr(lg.format(x="price_cents")).cast("long").alias("lx"),
            F.expr(lg.format(x="qty_cents")).cast("long").alias("ly"),
        )
    )
    m = pts.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.col("lx").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("ly").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.expr("CAST(lx AS DECIMAL(38,0)) * lx")).alias("sxx"),
        F.sum(F.expr("CAST(ly AS DECIMAL(38,0)) * ly")).alias("syy"),
        F.sum(F.expr("CAST(lx AS DECIMAL(38,0)) * ly")).alias("sxy"),
    )
    return (
        m.withColumn(
            "bnum", F.expr("CAST(n_parts AS DECIMAL(38,0)) * sxy - sx * sy")
        )
        .withColumn(
            "bden", F.expr("CAST(n_parts AS DECIMAL(38,0)) * sxx - sx * sx")
        )
        .withColumn(
            "bdey", F.expr("CAST(n_parts AS DECIMAL(38,0)) * syy - sy * sy")
        )
        .select(
            "p_brand",
            F.col("n_parts").cast("long").alias("n_parts"),
            F.expr(
                "CASE WHEN bden > 0"
                " THEN CAST(bnum * 1000 DIV bden AS BIGINT) END"
            ).alias("elasticity_milli"),
            F.expr(
                "CASE WHEN bden * bdey > 0"
                " THEN CAST(bnum * bnum * 1000000"
                " DIV (bden * bdey) AS BIGINT) END"
            ).alias("r2_ppm"),
        )
        .orderBy("p_brand")
    )


ELASTICITY_SQL = f"""
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS qty_cents
  FROM lineitem GROUP BY l_partkey
),
pts AS (
  SELECT p.p_brand,
         CAST(floor({ELAST_LOG_SCALE}.0
              * ln(CAST(CAST(floor(p.p_retailprice * 100.0 + 0.5)
                             AS BIGINT) AS DOUBLE))) AS BIGINT) AS lx,
         CAST(floor({ELAST_LOG_SCALE}.0
              * ln(CAST(q.qty_cents AS DOUBLE))) AS BIGINT) AS ly
  FROM part p JOIN per_part q ON q.l_partkey = p.p_partkey
  WHERE CAST(floor(p.p_retailprice * 100.0 + 0.5) AS BIGINT) > 0
    AND q.qty_cents > 0
),
m AS (
  SELECT p_brand, CAST(count(*) AS HUGEINT) AS n_parts,
         CAST(sum(lx) AS HUGEINT) AS sx, CAST(sum(ly) AS HUGEINT) AS sy,
         CAST(sum(lx * lx) AS HUGEINT) AS sxx,
         CAST(sum(ly * ly) AS HUGEINT) AS syy,
         CAST(sum(lx * ly) AS HUGEINT) AS sxy
  FROM pts GROUP BY p_brand
),
fit AS (
  SELECT p_brand, n_parts,
         n_parts * sxy - sx * sy AS bnum,
         n_parts * sxx - sx * sx AS bden,
         n_parts * syy - sy * sy AS bdey
  FROM m
)
SELECT p_brand, CAST(n_parts AS BIGINT) AS n_parts,
       CASE WHEN bden > 0 THEN
         CASE WHEN bnum >= 0
              THEN CAST(bnum * 1000 // bden AS BIGINT)
              ELSE -CAST((-bnum) * 1000 // bden AS BIGINT) END
       END AS elasticity_milli,
       CASE WHEN bden * bdey > 0
            THEN CAST(bnum * bnum * 1000000 // (bden * bdey) AS BIGINT)
       END AS r2_ppm
FROM fit
ORDER BY p_brand
"""


SPARK_QUERIES["price_elasticity_by_brand"] = price_elasticity_by_brand
ORACLE_SQL["price_elasticity_by_brand"] = ELASTICITY_SQL
