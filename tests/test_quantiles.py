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
