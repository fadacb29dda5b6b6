"""EWMA (applyInPandas custom op) pinned against an independent pandas
computation over the same collected input."""

from __future__ import annotations

import math

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.plans.timeseries import user_value_ewma

SF = "/root/testdata/sf0.001"


def test_ewma_matches_pandas_reference(spark):
    got = {
        (r.user_id, r.event_id): r.ewma_value
        for r in user_value_ewma(spark, SF).collect()
    }
    src = (
        load_table(spark, SF, "events")
        .filter("event_type = 'purchase'")
        .select("user_id", "event_id", "ts", "value")
        .toPandas()
    )
    exp = {}
    for uid, grp in src.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"])
        e = grp["value"].ewm(alpha=0.3, adjust=False).mean()
        for eid, v in zip(grp["event_id"], e):
            exp[(uid, eid)] = v
    assert set(got) == set(exp)
    for k, v in got.items():
        assert math.isclose(v, exp[k], rel_tol=1e-12), k
