"""Modern SQL-text surface: recursive CTE, pipe syntax, SQL UDFs,
Observation metrics, and the gated transformWithStateInPandas path."""

from __future__ import annotations

import pytest

from projet_meteo_etl_spark.plans import sql_surface
from projet_meteo_etl_spark.streaming import structured
from tests.conftest import SF_SMOKE


def test_recursive_cte_spine_covers_all_days(spark):
    out = sql_surface.recursive_cte_daily_orders(spark, SF_SMOKE).collect()
    # the spine guarantees exactly 31 days, March 1-31, in order
    assert len(out) == 31
    days = [r["day"] for r in out]
    assert days == sorted(days)
    assert days[0].strftime("%Y-%m-%d") == "1995-03-01"
    assert days[-1].strftime("%Y-%m-%d") == "1995-03-31"
    # zero-order days survive the left join with 0.0 revenue, not null
    for r in out:
        if r["n_orders"] == 0:
            assert r["revenue"] == 0.0


def test_recursive_cte_spine_is_broadcast_hash_join(spark):
    plan = sql_surface.recursive_cte_daily_orders(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    # equality on date_trunc must plan as a hash join, not nested loop
    assert "NestedLoop" not in plan


def test_pipe_syntax_matches_nested_sql(spark):
    from projet_meteo_etl_spark.catalog import load_tables

    piped = sql_surface.pipe_syntax_returnflag_revenue(spark, SF_SMOKE).collect()
    load_tables(spark, SF_SMOKE, ("lineitem",))
    nested = spark.sql(
        """
        SELECT l_returnflag,
               floor(sum(l_extendedprice * (1.0D - l_discount)) * 100.0D + 0.5D)
                 / 100.0D AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    ).collect()
    assert [tuple(r) for r in piped] == [tuple(r) for r in nested]


def test_sql_udf_is_inlined_no_python_worker(spark):
    df = sql_surface.sql_udf_discount_bands(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # SQL UDFs inline into codegen'd expressions: no Python eval node
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    bands = {r["band"]: r for r in df.collect()}
    assert set(bands) == {"low", "mid", "high"}
    total = sum(r["n_items"] for r in bands.values())
    from projet_meteo_etl_spark.catalog import load_table

    assert total == load_table(spark, SF_SMOKE, "lineitem").count()


def test_observed_metrics_match_direct_aggregate(spark):
    from pyspark.sql import functions as F

    from projet_meteo_etl_spark.catalog import load_table

    out = sql_surface.observed_load_metrics(spark, SF_SMOKE).collect()[0]
    e = load_table(spark, SF_SMOKE, "events")
    direct = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
    ).collect()[0]
    assert out["n_events"] == direct["n"]
    assert out["min_ts"] == direct["lo"]
    assert out["max_ts"] == direct["hi"]
    assert out["n_purchases"] <= out["n_events"]


def test_tws_runs_and_matches_twin(spark):
    # the vendored protobuf shim guarantees the runtime everywhere, so
    # the gate is now always-on; equality against the
    # applyInPandasWithState twin is the semantic pin
    assert structured.has_tws_runtime()
    out = structured.stream_tws_user_totals(spark, SF_SMOKE)
    base = structured.stream_user_running_totals(spark, SF_SMOKE)
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in base.collect()
    ]


def test_tws_session_timers_matches_groupstate_twin(spark):
    # MapState + event-time timers must reproduce the GroupState
    # EventTimeTimeout sessionizer bit-for-bit (same gap rule, same
    # watermark-closure invariant, third physical strategy)
    out = structured.stream_tws_session_timers(spark, SF_SMOKE)
    base = structured.stream_session_custom_timeout(spark, SF_SMOKE)
    assert [tuple(r) for r in out.collect()] == [
        tuple(r) for r in base.collect()
    ]


def test_tws_user_lastk_matches_batch(spark):
    # ListState last-K must equal the batch window computation
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.streaming.structured import TWS_LASTK

    out = structured.stream_tws_user_lastk(spark, SF_SMOKE).collect()
    e = load_table(spark, SF_SMOKE, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    want = (
        e.select(
            "user_id",
            "event_id",
            (
                F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
                / F.lit(100.0)
            ).alias("value"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= TWS_LASTK)
        .select("user_id", "rk", "event_id", "value")
        .orderBy("user_id", "rk")
        .collect()
    )
    assert [tuple(r) for r in out] == [tuple(r) for r in want]


def test_tws_gate_degrades_explicitly(spark, monkeypatch):
    # simulate an environment where neither the real runtime nor the
    # shim can be made importable: the query must refuse up front, not
    # crash mid-stream
    monkeypatch.setattr(
        "projet_meteo_etl_spark.protoshim_install.driver_install",
        lambda: False,
    )
    with pytest.raises(NotImplementedError, match="protobuf"):
        structured.stream_tws_user_totals(spark, SF_SMOKE)
