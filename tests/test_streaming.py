"""Structured Streaming: stream-executed results must equal batch results."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.streaming import structured, windows

SF = "/root/testdata/sf0.001"


def test_stream_tumbling_equals_batch(spark):
    stream_rows = structured.stream_tumbling_counts(spark, SF).collect()
    batch_rows = windows.events_tumbling_counts(spark, SF).collect()
    assert stream_rows == batch_rows


def test_stream_stateful_totals_equal_batch_agg(spark):
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in structured.stream_user_running_totals(spark, SF).collect()
    }
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
    exp = {
        r.user_id: (r.n, r.tv)
        for r in load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), (F.sum(cents) / 100.0).alias("tv"))
        .collect()
    }
    assert got == exp


def test_late_dropper_subset_and_deterministic(spark):
    a = {r.event_type: r.n_survived for r in structured.stream_late_event_dropper(spark, SF).collect()}
    b = {r.event_type: r.n_survived for r in structured.stream_late_event_dropper(spark, SF).collect()}
    assert a == b  # same batch boundaries → same drops
    totals = {
        r.event_type: r.n
        for r in load_table(spark, SF, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(a) == set(totals)
    for et, n in a.items():
        assert 0 < n <= totals[et]
