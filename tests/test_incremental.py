"""Incremental maintenance: partial-agg merge + snapshot diff."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.plans.incremental import (
    DIFF_DELETE_MOD,
    DIFF_INSERT_MOD,
    incremental_agg_maintenance,
    snapshot_table_diff,
)
from tests.conftest import SF_SMOKE


def test_merged_partials_equal_full_recompute(spark):
    got = {
        r["l_returnflag"]: (r["n_rows"], r["sum_qty"], r["avg_price"])
        for r in incremental_agg_maintenance(spark, SF_SMOKE).collect()
    }
    li = load_table(spark, SF_SMOKE, "lineitem")
    cents = lambda c: F.floor(F.col(c) * 100 + 0.5).cast("decimal(38,0)")  # noqa: E731
    full = {
        r["l_returnflag"]: (
            r["n"],
            float(r["q"]) / 100.0,
            round(float(r["p"]) / (r["n"] * 100.0), 6),
        )
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents("l_quantity")).alias("q"),
            F.sum(cents("l_extendedprice")).alias("p"),
        )
        .collect()
    }
    assert set(got) == set(full)
    for k in got:
        assert got[k][0] == full[k][0]
        assert abs(got[k][1] - full[k][1]) < 1e-6
        assert abs(got[k][2] - full[k][2]) < 1e-5


def test_snapshot_diff_counts_reconcile(spark):
    keys = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_linenumber")
        .distinct()
    )
    n_cur = keys.count()
    n_del = keys.filter(F.col("l_orderkey") % DIFF_DELETE_MOD == 0).count()
    n_ins = keys.filter(F.col("l_orderkey") % DIFF_INSERT_MOD == 0).count()
    got = {r["status"]: r["n_rows"] for r in snapshot_table_diff(spark, SF_SMOKE).collect()}
    assert got["deleted"] == n_del
    assert got["added"] == n_ins
    assert got.get("changed", 0) > 0
    # every current row is deleted, changed, or unchanged
    assert got["deleted"] + got.get("changed", 0) + got["unchanged"] == n_cur


def test_pareto_frontier_no_dominated_rows(spark):
    from projet_meteo_etl_spark.plans.incremental import pareto_frontier_parts

    rows = pareto_frontier_parts(spark, SF_SMOKE).collect()
    assert rows
    # along the frontier (price ascending) size is non-decreasing;
    # equal-price rows are deliberately all kept (the RANGE frame
    # excludes price ties), so strict uniqueness would over-assert —
    # dominance is fully checked by the brute-force pass below
    sizes = [r["p_size"] for r in rows]
    assert sizes == sorted(sizes)
    # brute-force dominance check against the full table
    from projet_meteo_etl_spark.catalog import load_table

    pts = [
        (round(p["p_retailprice"] * 100), p["p_size"])
        for p in load_table(spark, SF_SMOKE, "part").collect()
    ]
    for r in rows:
        pc = round(r["price"] * 100)
        assert not any(
            (c < pc and s >= r["p_size"]) for c, s in pts
        ), "frontier row dominated"


def test_join_view_maintenance_matches_recompute(spark):
    """Merged base+delta partials must equal a from-scratch recompute
    of the 4-table revenue view, bit for bit."""
    from pyspark.sql import functions as F

    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.plans.incremental import join_view_maintenance

    sf = "/root/testdata/sf0.01"
    ivm = {r["n_name"]: r for r in join_view_maintenance(spark, sf).collect()}
    li = load_table(spark, sf, "lineitem")
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    n = load_table(spark, sf, "nation")
    rev4 = F.expr(
        "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"
        " * CAST(floor((1 - l_discount) * 100.0 + 0.5) AS BIGINT)"
    )
    full = {
        r["n_name"]: r
        for r in (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, F.col("o_custkey") == F.col("c_custkey"))
            .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).alias("n_rows"), F.sum(rev4).alias("rev4"))
            .collect()
        )
    }
    assert ivm.keys() == full.keys()
    for k in ivm:
        assert ivm[k]["n_rows"] == full[k]["n_rows"]
        assert abs(ivm[k]["revenue"] - full[k]["rev4"] / 10000.0) < 0.011


def test_cdc_merge_apply_reconciles(spark):
    """Row accounting: after = before + inserted + updated_upserts −
    deleted, per status and in total; every op count non-negative."""
    from projet_meteo_etl_spark.plans.incremental import cdc_merge_apply

    rows = cdc_merge_apply(spark, "/root/testdata/sf0.01").collect()
    assert rows
    for r in rows:
        assert r["n_after"] == r["n_before"] + r["n_inserted"] - r["n_deleted"]
        assert r["n_updated"] <= r["n_before"]
        assert min(r["n_before"], r["n_inserted"], r["n_updated"], r["n_deleted"]) >= 0
        assert r["cents_after"] > 0
