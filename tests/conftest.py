from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projet_meteo_etl_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def weather_dir(tmp_path_factory):
    """Synthetic Weather-Underground CSVs + Infoclimat JSON (FIXTURES.md)."""
    from projet_meteo_etl_spark.sources.weather_fixtures import generate_weather_fixtures

    d = tmp_path_factory.mktemp("weather")
    return generate_weather_fixtures(str(d))
