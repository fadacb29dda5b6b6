"""Spark-4 API surface: Python DataSource (with filter pushdown into
partition planning), Python UDTF, and VARIANT extraction."""

from __future__ import annotations

import pandas as pd  # resolution target for pandas_udf type hints
from pyspark.sql import functions as F

from projet_meteo_etl_spark.plans import modern_api
from tests.conftest import SF_SMOKE


def test_pyds_source_partition_pruning(spark):
    # registering + running the query leaves the source registered
    out = modern_api.pyds_ticks_station_stats(spark, SF_SMOKE)
    rows = {r["station_id"]: r for r in out.collect()}
    assert sorted(rows) == list(
        range(modern_api.PYDS_MIN_STATION, modern_api.PYDS_STATIONS)
    )
    assert all(r["n_obs"] == modern_api.PYDS_HOURS for r in rows.values())
    # the >= filter is pushed into partitions(): only 6 of 8 planned
    ticks = (
        spark.read.format("station_ticks")
        .option("stations", str(modern_api.PYDS_STATIONS))
        .option("hours", "10")
        .load()
        .filter(F.col("station_id") >= modern_api.PYDS_MIN_STATION)
    )
    n_parts = ticks.rdd.getNumPartitions()
    assert n_parts == modern_api.PYDS_STATIONS - modern_api.PYDS_MIN_STATION


def test_pyds_generation_formula(spark):
    modern_api.pyds_ticks_station_stats(spark, SF_SMOKE)  # ensure registered
    df = (
        spark.read.format("station_ticks")
        .option("stations", "2")
        .option("hours", "3")
        .load()
    )
    got = sorted(tuple(r) for r in df.collect())
    want = sorted(
        (s, h, (s * 37 + h * 13) % 4000 - 1000)
        for s in range(2)
        for h in range(3)
    )
    assert got == want


def test_udtf_run_length_semantics(spark):
    df = spark.createDataFrame(
        [(1, "a b b b c c"), (2, "x  x y"), (3, None), (4, "z z")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("docs_v")
    # reuse the registered UDTF from the query path
    modern_api.udtf_token_run_lengths(spark, SF_SMOKE)
    df.createOrReplaceTempView("docs_v")  # query path rebinds the view
    out = spark.sql(
        "SELECT d.doc_id, r.* FROM docs_v d, LATERAL token_runs(d.text) r"
    ).collect()
    got = sorted(tuple(r) for r in out)
    # doc 2: 'x  x' splits to ['x','','x'] — the empty token breaks the run
    assert got == [
        (1, "b", 2, 3),
        (1, "c", 5, 2),
        (4, "z", 1, 2),
    ]


def test_cogroup_asof_matches_window_strategy(spark):
    """Two physical strategies for the same logical as-of join must
    produce identical rows: cogrouped merge_asof vs window-over-union."""
    from projet_meteo_etl_spark.plans.temporal import asof_purchase_before_click

    a = sorted(
        tuple(r)
        for r in modern_api.cogroup_asof_purchase_click(spark, SF_SMOKE)
        .na.fill({"micros_since_purchase": -1})
        .collect()
    )
    b = sorted(
        tuple(r)
        for r in asof_purchase_before_click(spark, SF_SMOKE)
        .na.fill({"micros_since_purchase": -1})
        .collect()
    )
    assert a == b and len(a) > 0


def test_pandas_udaf_median_matches_builtin(spark):
    """The pandas UDAF must agree with Spark's built-in exact median
    (odd AND even group sizes both occur in the smoke data)."""
    from projet_meteo_etl_spark.catalog import load_table

    got = {
        r["user_id"]: (r["n_purchases"], r["median_value"])
        for r in modern_api.pandas_udaf_user_median(spark, SF_SMOKE).collect()
    }
    exp = {
        r["user_id"]: (r["n"], r["m"])
        for r in load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.median("value").alias("m"))
        .collect()
    }
    assert got == exp and len(got) > 0
    assert any(n % 2 == 0 for n, _ in got.values())
    assert any(n % 2 == 1 for n, _ in got.values())


def test_arrow_vector_norms_formula(spark):
    out = modern_api.arrow_vector_norms(spark, SF_SMOKE)
    rows = out.limit(5).collect()
    assert all(r["dim"] == 64 for r in rows)
    # cross-check one norm against the JVM-side fold used elsewhere
    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.functions.portable import pround
    from pyspark.sql import functions as FF

    e = load_table(spark, SF_SMOKE, "embeddings").filter(FF.col("vec_id") == rows[0]["vec_id"])
    sq = FF.aggregate(
        FF.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        FF.lit(0.0),
        lambda acc, x: acc + x,
    )
    jvm = e.select(pround(FF.sqrt(sq), 6).alias("n")).collect()[0]["n"]
    assert jvm == rows[0]["l2_norm"]


def test_variant_extract_null_safety(spark):
    df = spark.createDataFrame(
        [("click", '{"k": 5}'), ("click", "{}"), ("view", None)],
        "event_type string, props string",
    )
    k = F.try_variant_get(
        F.parse_json(F.coalesce(F.col("props"), F.lit("null"))), "$.k", "long"
    )
    got = df.select(k.alias("k")).collect()
    assert [r["k"] for r in got] == [5, None, None]


def test_udf_hatch_both_routes_agree(spark):
    """The escape hatch registers a scalar reachable from BOTH the
    Column route (returned callable) and spark.sql — same values."""
    from projet_meteo_etl_spark.functions.udf_hatch import (
        register_vectorized_scalar,
    )

    def double_plus_one(s: pd.Series) -> pd.Series:
        return s * 2 + 1

    fn = register_vectorized_scalar(
        spark, "t_double_plus_one", double_plus_one, "long"
    )
    df = spark.range(5)
    col_route = [r[0] for r in df.select(fn("id")).collect()]
    df.createOrReplaceTempView("t_hatch_in")
    sql_route = [
        r[0]
        for r in spark.sql(
            "SELECT t_double_plus_one(id) FROM t_hatch_in ORDER BY id"
        ).collect()
    ]
    assert sorted(col_route) == sql_route == [1, 3, 5, 7, 9]


def test_udf_hatch_query_internal_contract(spark):
    """n_sql_route_equal == n_events in the registered query: the SQL
    route and the Column route computed identical scores on every row."""
    out = modern_api.pandas_udf_scalar_hatch(spark, SF_SMOKE).collect()
    assert out, "expected at least one event_type"
    for row in out:
        assert row["n_sql_route_equal"] == row["n_events"]
