"""PageRank over the bipartite click graph: determinism + sanity."""

from __future__ import annotations

from projet_meteo_etl_spark.operators.graph import (
    SCALE,
    TOP_N,
    pagerank_click_graph,
)
from tests.conftest import SF_SMOKE


def test_pagerank_output_shape_and_order(spark):
    rows = pagerank_click_graph(spark, SF_SMOKE).collect()
    assert len(rows) == TOP_N
    ranks = [r["rank_scaled"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(0 < r["rank_scaled"] < SCALE for r in rows)
    kinds = {r["node"][:2] for r in rows}
    assert kinds <= {"u:", "i:"} and kinds


def test_pagerank_is_bit_deterministic_across_runs(spark):
    """Integer-scaled contributions make the result independent of
    partitioning/summation order: two runs (different partition counts)
    must agree exactly, not approximately."""
    a = [(r["node"], r["rank_scaled"]) for r in pagerank_click_graph(spark, SF_SMOKE).collect()]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = [(r["node"], r["rank_scaled"]) for r in pagerank_click_graph(spark, SF_SMOKE).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
