"""Weather ETL as a registered query (reference EP1 end-to-end).

The driver's oracle tables don't include weather data, so this entry
generates the deterministic synthetic fixtures (same generator the test
suite uses, seed=42) under /tmp and runs the full pipeline: quirky-CSV +
nested-JSON read → clean/convert → unionByName → quality gate.  It is a
rows-only check (no oracle SQL): the golden count is asserted in
tests/test_pipeline.py instead, mirroring the reference's golden 4936
(/root/reference/test_etl_meteo.py:50-51).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _fixtures() -> dict:
    from projet_meteo_etl_spark.sources.weather_fixtures import generate_weather_fixtures

    d = os.path.join(tempfile.gettempdir(), "spark_graft_weather_fixtures")
    os.makedirs(d, exist_ok=True)
    marker = os.path.join(d, ".complete")
    fx = None
    if not os.path.exists(marker):
        fx = generate_weather_fixtures(d)
        with open(marker, "w") as f:
            f.write("ok")
    else:
        fx = generate_weather_fixtures(d)  # idempotent, deterministic
    return fx


def weather_etl_unified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full EP1: multi-source read → clean → union; returns the unified
    table ordered by (station, ts) for a stable rows-only signature."""
    from projet_meteo_etl_spark.pipeline import (
        clean_weather_csv,
        clean_weather_json,
        unify,
    )
    from projet_meteo_etl_spark.sources.weather_csv import read_weather_csv
    from projet_meteo_etl_spark.sources.weather_json import read_weather_json

    from projet_meteo_etl_spark.catalog import harden_session

    harden_session(spark)  # driver gate sessions default to ANSI mode
    fx = _fixtures()
    parts = [
        clean_weather_csv(read_weather_csv(spark, manifest, station_id))
        for station_id, manifest in fx["csv_manifests"].items()
    ]
    parts.append(clean_weather_json(read_weather_json(spark, fx["json_path"])))
    return unify(*parts).orderBy("id_station", "date_heure_utc")


def weather_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3 analogue: the fused quality-expectation report over the
    unified weather table (1 scan vs the reference's 10)."""
    from projet_meteo_etl_spark.operators.quality import (
        WEATHER_EXPECTATIONS,
        quality_report_df,
    )

    unified = weather_etl_unified(spark, sf_dir)
    return quality_report_df(unified, WEATHER_EXPECTATIONS).orderBy("check")


SPARK_QUERIES = {
    "weather_etl_unified": weather_etl_unified,
    "weather_quality_report": weather_quality_report,
}

ORACLE_SQL: dict[str, str] = {}
