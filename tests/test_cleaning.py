"""Unit tests for the Column-expression cleaning library (SURVEY §2.2).

Each case mirrors a behavior of the reference's ``clean_value`` /
conversion lambdas (/root/reference/etl_meteo.py:41-67,92-104).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from projet_meteo_etl_spark.functions import cleaning as C


def _one(spark, expr, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(expr(F.col("v")).alias("r")).collect()[0]["r"]


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("55,4 °F", 55.4),
        ("87 %", 87.0),
        ("29,92 in", 29.92),
        ("6,2 mph", 6.2),
        ("12.3", 12.3),
        ("3 w/m²", 3.0),
        ("  42  ", 42.0),
        ("garbage", None),
        ("", None),
        (None, None),
    ],
)
def test_clean_numeric(spark, raw, expected):
    got = _one(spark, C.clean_numeric, raw)
    if expected is None:
        assert got is None
    else:
        assert got == pytest.approx(expected)


@pytest.mark.parametrize(
    ("fn", "value", "expected"),
    [
        (C.fahrenheit_to_celsius, 32.0, 0.0),
        (C.fahrenheit_to_celsius, 212.0, 100.0),
        (C.inhg_to_hpa, 29.92, 29.92 * 33.8638),
        (C.mph_to_ms, 10.0, 4.4704),
        (C.inches_to_mm, 1.0, 25.4),
    ],
)
def test_unit_conversions(spark, fn, value, expected):
    df = spark.createDataFrame([(value,)], "v double")
    got = df.select(fn(F.col("v")).alias("r")).collect()[0]["r"]
    assert got == pytest.approx(expected)


def test_conversions_null_propagate(spark):
    df = spark.createDataFrame([(None,)], "v double")
    for fn in (C.fahrenheit_to_celsius, C.inhg_to_hpa, C.mph_to_ms, C.inches_to_mm):
        assert df.select(fn(F.col("v")).alias("r")).collect()[0]["r"] is None


def test_kmh_to_ms_defaults_missing_to_zero(spark):
    # reference etl_meteo.py:92: float(record.get('vent_moyen', 0) or 0)/3.6
    df = spark.createDataFrame([("36",), (None,)], "v string")
    got = [r["r"] for r in df.select(C.kmh_to_ms(F.col("v")).alias("r")).collect()]
    assert got[0] == pytest.approx(10.0)
    assert got[1] == pytest.approx(0.0)


def test_rain_accum_fallback(spark):
    df = spark.createDataFrame(
        [("1.5", "9.9"), (None, "3.0"), (None, None), ("0.0", "7.0")],
        "p1 string, p3 string",
    )
    sane = [
        r["r"]
        for r in df.select(C.rain_accum(F.col("p1"), F.col("p3")).alias("r")).collect()
    ]
    assert sane == pytest.approx([1.5, 3.0, 0.0, 0.0])
    # faithful mode reproduces the Python `or`-chain: measured 0.0 falls through
    faithful = [
        r["r"]
        for r in df.select(
            C.rain_accum(F.col("p1"), F.col("p3"), faithful=True).alias("r")
        ).collect()
    ]
    assert faithful == pytest.approx([1.5, 3.0, 0.0, 7.0])


def test_falsy_to_null_double_quirk(spark):
    df = spark.createDataFrame([("0",), ("12.5",), ("",)], "v string")
    sane = [
        r["r"]
        for r in df.select(C.falsy_to_null_double(F.col("v")).alias("r")).collect()
    ]
    assert sane[0] == 0.0 and sane[1] == 12.5 and sane[2] is None
    faithful = [
        r["r"]
        for r in df.select(
            C.falsy_to_null_double(F.col("v"), faithful=True).alias("r")
        ).collect()
    ]
    assert faithful[0] is None and faithful[1] == 12.5 and faithful[2] is None


def test_assemble_timestamp_formats(spark):
    df = spark.createDataFrame(
        [("2024-10-07", "12:00 AM"), ("2024-10-07", "3:05 PM"),
         ("2024-10-07", "23:45"), ("2024-10-07", None)],
        "d string, t string",
    )
    got = [
        r["r"]
        for r in df.select(
            C.assemble_timestamp(F.col("d"), F.col("t")).alias("r")
        ).collect()
    ]
    assert got[0].hour == 0 and got[0].day == 7
    assert got[1].hour == 15 and got[1].minute == 5
    assert got[2].hour == 23 and got[2].minute == 45
    assert got[3] is None
