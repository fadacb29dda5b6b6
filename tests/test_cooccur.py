"""Item co-occurrence / Jaccard: shape, determinism, cap semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_meteo_etl_spark.operators.cooccur import (
    MIN_SUPPORT,
    TOP_N,
    _user_items,
    item_cooccurrence_topk,
    item_jaccard_similarity,
)
from tests.conftest import SF_SMOKE


def test_cooccurrence_shape_and_order(spark):
    rows = item_cooccurrence_topk(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= TOP_N
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["i1"] < r["i2"] for r in rows)


def test_jaccard_bounds_and_support(spark):
    rows = item_jaccard_similarity(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= TOP_N
    for r in rows:
        assert 0.0 < r["jaccard"] <= 1.0
        assert r["co_users"] >= MIN_SUPPORT
    js = [r["jaccard"] for r in rows]
    assert js == sorted(js, reverse=True)


def test_jaccard_against_python_oracle(spark):
    """Brute-force user-set Jaccard in Python must agree with the
    join-based plan (top row set, exact values at 9 decimals)."""
    ui = _user_items(spark, SF_SMOKE).collect()
    sets: dict[int, set[int]] = {}
    for r in ui:
        sets.setdefault(r["item"], set()).add(r["user_id"])
    expect = {}
    items = sorted(sets)
    for a in items:
        for b in items:
            if a >= b:
                continue
            co = len(sets[a] & sets[b])
            if co >= MIN_SUPPORT:
                import math

                j = co / len(sets[a] | sets[b])
                expect[(a, b)] = math.floor(j * 1e9 + 0.5) / 1e9
    got = {
        (r["i1"], r["i2"]): r["jaccard"]
        for r in item_jaccard_similarity(spark, SF_SMOKE).collect()
    }
    for k, v in got.items():
        assert expect[k] == v


def test_user_item_cap_is_deterministic(spark):
    ui = _user_items(spark, SF_SMOKE)
    per_user = ui.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    assert per_user.filter(F.col("n") > 1000).count() == 0
    a = sorted(map(tuple, ui.collect()))
    b = sorted(map(tuple, _user_items(spark, SF_SMOKE).collect()))
    assert a == b and len(a) > 0
