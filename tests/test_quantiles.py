"""Portable bottom-k quantile sketch: merge algebra + error contract."""

from __future__ import annotations

from projet_meteo_etl_spark.operators.quantiles import (
    QSK_K,
    QSK_MEASURES,
    QSK_QS,
    portable_quantile_sketch,
    quantile_adaptive_range_audit,
)
from tests.conftest import SF_SMOKE


def test_quantile_sketch_merge_and_error_contract(spark):
    """Sharded→merged sample must equal the direct sample (bottom-k is
    a semilattice) for EVERY probed percentile; and at smoke scale each
    group has fewer than k rows, so the sample IS the data and the
    estimate must be exactly the exact quantile (err_ppm = 0)."""
    rows = portable_quantile_sketch(spark, SF_SMOKE).collect()
    assert len(rows) > 0 and len(rows) % len(QSK_QS) == 0
    for r in rows:
        assert r["merge_agrees"] == 1
        if r["n_rows"] <= QSK_K:
            assert r["est_direct_cents"] == r["exact_cents"]
            assert r["err_ppm"] == 0
        assert r["est_merged_cents"] == r["est_direct_cents"]


def test_quantile_sketch_partition_independent(spark):
    """Deterministic md5 priorities + total tie-break order: the full
    result (estimates included) must be invariant under repartitioning."""
    a = [tuple(r) for r in portable_quantile_sketch(spark, SF_SMOKE).collect()]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = [
            tuple(r)
            for r in portable_quantile_sketch(spark, SF_SMOKE).collect()
        ]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_quantile_sketch_monotone_in_q(spark):
    """Within a group, quantile estimates must be non-decreasing in q
    (both the sketch and the exact column)."""
    rows = portable_quantile_sketch(spark, SF_SMOKE).collect()
    by_group: dict[str, list] = {}
    for r in rows:
        by_group.setdefault(r["event_type"], []).append(r)
    for g, rs in by_group.items():
        rs.sort(key=lambda r: r["q_pct"])
        assert [r["q_pct"] for r in rs] == sorted(QSK_QS)
        ests = [r["est_direct_cents"] for r in rs]
        exacts = [r["exact_cents"] for r in rs]
        assert ests == sorted(ests), g
        assert exacts == sorted(exacts), g


def test_adaptive_range_audit_contract(spark):
    """One row per measure; band sane (lo ≤ hi); out-of-band counts
    consistent with the ppm rate; p01/p99 band excludes at most ~2% +
    sampling slack of the rows."""
    rows = quantile_adaptive_range_audit(spark, SF_SMOKE).collect()
    assert {r["measure"] for r in rows} == set(QSK_MEASURES)
    for r in rows:
        assert r["lo_cents"] <= r["hi_cents"]
        assert 0 <= r["n_below"] and 0 <= r["n_above"]
        assert (
            r["out_ppm"]
            == (r["n_below"] + r["n_above"]) * 1_000_000 // r["n_rows"]
        )
        # p01/p99 nearest-rank band: expected exclusion ~2%; allow
        # generous sampling slack at smoke scale
        assert r["n_below"] + r["n_above"] <= max(0.10 * r["n_rows"], 8)


def test_stream_quantile_state_matches_batch_sketch(spark):
    """The streamed bottom-k sample must yield the same estimates as
    the batch sketch's direct path (bottom-k maintenance is a
    semilattice — micro-batching cannot change the sample)."""
    from projet_meteo_etl_spark.streaming.structured import (
        stream_quantile_sketch_state,
    )

    streamed = {
        (r["event_type"], r["q_pct"]): (r["n_rows"], r["est_cents"])
        for r in stream_quantile_sketch_state(spark, SF_SMOKE).collect()
    }
    batch = {
        (r["event_type"], r["q_pct"]): (r["n_rows"], r["est_direct_cents"])
        for r in portable_quantile_sketch(spark, SF_SMOKE).collect()
    }
    assert streamed == batch


def test_sliding_quantiles_window_identities(spark):
    """Trailing-window identities: n_days ramps 1..7 then stays 7 (no
    day gaps in the generator), p50 <= p99, and the window row count
    equals the sum of the member days' counts recomputed directly."""
    import datetime as dt

    from pyspark.sql import functions as F

    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.operators.quantiles import (
        QSK_WINDOW_DAYS,
        quantile_sliding_daily,
    )

    rows = quantile_sliding_daily(spark, SF_SMOKE).collect()
    assert rows
    daily = {
        r["day"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .filter(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull()
        )
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert 1 <= r["n_days"] <= QSK_WINDOW_DAYS
        assert r["p50_cents"] <= r["p99_cents"]
        member_days = [
            d
            for d in daily
            if dt.timedelta(0)
            <= r["day"] - d
            < dt.timedelta(days=QSK_WINDOW_DAYS)
        ]
        assert r["n_days"] == len(member_days)
        assert r["n_rows"] == sum(daily[d] for d in member_days)


def test_adaptive_audit_empty_input_parity(spark, tmp_path):
    """An empty lineitem must yield an EMPTY report in both engines —
    the oracle's bounds join drops measures with no rows, so the
    pivoted aggregate side must too."""
    import duckdb

    from projet_meteo_etl_spark.operators.quantiles import (
        ADAPTIVE_RANGE_SQL,
        quantile_adaptive_range_audit,
    )

    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [],
        "l_orderkey long, l_linenumber int, l_quantity double,"
        " l_extendedprice double, l_discount double, l_tax double",
    ).write.parquet(d + "/lineitem.parquet")
    assert quantile_adaptive_range_audit(spark, d).count() == 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM"
        f" read_parquet('{d}/lineitem.parquet/*.parquet')"
    )
    assert con.execute(ADAPTIVE_RANGE_SQL).fetchall() == []


def test_thr_col_equals_decimal_survivor_filter(spark):
    """The r12 per-group threshold rewrite (`_thr_col`) must select the
    EXACT survivor set of the per-row DECIMAL predicate it replaced
    (`_surv_filter`), including the small-group all-survive cap."""
    from pyspark.sql import functions as F

    from projet_meteo_etl_spark.operators.quantiles import (
        H60,
        QSK_K,
        QSK_OVER,
        _surv_filter,
        _thr_col,
    )

    # groups spanning the cap boundary: tiny (n_g << OVER·k, every row
    # survives), exactly at the boundary, and large (selective)
    rows = []
    for g, n_g in (("tiny", 7), ("edge", QSK_OVER * QSK_K), ("big", 500_000)):
        # priorities straddling the threshold C/n_g for each group
        c = H60 * QSK_OVER * QSK_K
        for off in (-2, -1, 0, 1, 2):
            h = max(0, min(H60 - 1, c // n_g + off))
            rows.append((g, n_g, h))
        rows.append((g, n_g, 0))
        rows.append((g, n_g, H60 - 1))
    df = spark.createDataFrame(rows, "g string, n_g long, h long")
    old = set(
        (r["g"], r["h"])
        for r in df.filter(F.expr(_surv_filter())).collect()
    )
    new = set(
        (r["g"], r["h"])
        for r in df.withColumn("thr", _thr_col())
        .filter(F.col("h") <= F.col("thr"))
        .collect()
    )
    assert old == new and len(old) > 0


def test_spread_scan_guard_and_noop(spark, tmp_path):
    """catalog.spread_scan: repartitions an under-partitioned scan up
    to default parallelism, and is a NO-OP (same plan object) when the
    input already has enough partitions."""
    from projet_meteo_etl_spark.catalog import spread_scan

    p = str(tmp_path / "t.parquet")
    spark.range(0, 10_000, 1).write.parquet(p)
    scan = spark.read.parquet(p)
    want = spark.sparkContext.defaultParallelism
    out = spread_scan(scan)
    assert out.rdd.getNumPartitions() >= min(
        want, 2
    ), "under-partitioned scan must be spread"
    # rows unchanged by the round-robin exchange
    assert out.count() == 10_000
    wide = scan.repartition(want * 2)
    assert spread_scan(wide) is wide, "well-partitioned input must pass through"
