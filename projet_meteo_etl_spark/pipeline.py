"""End-to-end weather ETL pipeline (reference EP1, SURVEY.md §3).

``run_full_etl`` in the reference (``/root/reference/etl_meteo.py:292-332``)
is a sequential script: loop 14 CSVs → pandas clean → list-extend → JSON
→ list-extend → integrity prints → Mongo truncate-insert → audit scans.

Here the whole thing is ONE lazily-built DataFrame DAG:

    read(csv manifest)  ┐
                        ├─ clean/convert (pure Column exprs)
    read(nested json)   ┘
        → unionByName → filter(ts not null)
        → [quality report: one fused agg]
        → write parquet (overwrite) → count reconcile

The only shuffles are the grand-total quality aggregates (1-group, so
they reduce map-side); everything else is embarrassingly parallel over
file splits.  At 100 TB the same plan holds: more files → more splits.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from projet_meteo_etl_spark.functions import cleaning as C
from projet_meteo_etl_spark.sources.weather_csv import read_weather_csv
from projet_meteo_etl_spark.sources.weather_json import read_weather_json

#: unified target schema (reference README.md:41-57, etl_meteo.py:66);
#: date_heure_utc is typed TimestampType here (SURVEY §1.2 decision —
#: the reference keeps a string and parses transiently).
UNIFIED_SCHEMA = T.StructType(
    [
        T.StructField("date_heure_utc", T.TimestampType(), False),
        T.StructField("temperature_c", T.DoubleType(), True),
        T.StructField("humidite_pct", T.DoubleType(), True),
        T.StructField("pression_hpa", T.DoubleType(), True),
        T.StructField("vent_vitesse_ms", T.DoubleType(), True),
        T.StructField("id_station", T.StringType(), False),
        T.StructField("source_donnees", T.StringType(), False),
        T.StructField("pluie_accum_mm", T.DoubleType(), True),
    ]
)

FINAL_COLS = [f.name for f in UNIFIED_SCHEMA.fields]

#: numeric audit fields (reference etl_meteo.py:37)
NUMERIC_FIELDS = [
    "temperature_c",
    "humidite_pct",
    "pression_hpa",
    "vent_vitesse_ms",
    "pluie_accum_mm",
]


def clean_weather_csv(raw: DataFrame) -> DataFrame:
    """CSV-path transform (reference ``clean_and_convert_csv_df``,
    etl_meteo.py:48-67): P1 normalize + P2-P5 unit conversions + P7
    timestamp assembly + P11 null-ts filter + P12/P13 projection."""
    out = raw.select(
        C.assemble_timestamp(F.col("Date"), F.col("Time")).alias("date_heure_utc"),
        C.wu_temperature_c(F.col("Temperature")).alias("temperature_c"),
        C.clean_numeric(F.col("Humidity")).alias("humidite_pct"),
        C.wu_pressure_hpa(F.col("Pressure")).alias("pression_hpa"),
        C.wu_wind_ms(F.col("Speed")).alias("vent_vitesse_ms"),
        F.col("id_station"),
        F.col("source_donnees"),
        C.wu_rain_mm(F.col("`Precip. Accum.`")).alias("pluie_accum_mm"),
    )
    return out.filter(F.col("date_heure_utc").isNotNull())


def clean_weather_json(flat: DataFrame) -> DataFrame:
    """JSON-path transform (reference ``clean_and_convert_json``,
    etl_meteo.py:79-108): metric units, km/h→m/s with 0-default (P6),
    rain 1h/3h fallback (P9), double casts (P10 sane variant —
    divergence: the reference nulls real zeros, we keep them)."""
    out = flat.select(
        F.to_timestamp(F.col("dh_utc")).alias("date_heure_utc"),
        F.col("temperature").cast("double").alias("temperature_c"),
        F.col("humidite").cast("double").alias("humidite_pct"),
        F.col("pression").cast("double").alias("pression_hpa"),
        C.kmh_to_ms(F.col("vent_moyen")).alias("vent_vitesse_ms"),
        F.coalesce(F.col("id_station"), F.col("station_key")).alias("id_station"),
        F.col("source_donnees"),
        C.rain_accum(F.col("pluie_1h"), F.col("pluie_3h")).alias("pluie_accum_mm"),
    )
    return out.filter(F.col("date_heure_utc").isNotNull())


def unify(*sources: DataFrame) -> DataFrame:
    """U1 (etl_meteo.py:171,299-311): schema-aligned union of all
    per-source DataFrames — ``unionByName`` keeps it order-insensitive."""
    it = iter(sources)
    df = next(it).select(FINAL_COLS)
    for s in it:
        df = df.unionByName(s.select(FINAL_COLS))
    return df


@dataclass
class EtlResult:
    unified: DataFrame
    output_path: str
    source_count: int
    sink_count: int
    quality_report: dict = field(default_factory=dict)

    @property
    def count_reconciled(self) -> bool:
        """Q1 — source↔sink count reconciliation (etl_meteo.py:201-207)."""
        return self.source_count == self.sink_count


def run_full_etl(
    spark: SparkSession,
    csv_manifests: dict[str, dict[str, str]],
    json_path: str | None,
    output_path: str,
    jdbc_url: str | None = None,
    jdbc_table: str = "weather_unified",
) -> EtlResult:
    """The full reference pipeline, Spark-first.

    ``csv_manifests`` maps station_id → {date: csv_path} (the reference
    hardcodes two stations, etl_meteo.py:16-33).  Writes the unified
    table to ``output_path`` (parquet, overwrite = the truncate-and-load
    S5 semantics) and returns counts + a quality report computed in one
    fused aggregation pass (vs the reference's 10 separate scans).

    ``jdbc_url`` switches the sink to an external DB — the reference's
    actual S5/S6 shape (MongoDB truncate-and-load + ping,
    etl_meteo.py:182-218): healthcheck first, fail fast if unreachable,
    overwrite-load ``jdbc_table``, and reconcile the count by reading
    the SINK back (not the in-memory frame).  ``output_path`` is
    ignored in that mode.
    """
    from projet_meteo_etl_spark.operators.quality import (
        WEATHER_EXPECTATIONS,
        run_expectations,
    )

    parts = [
        clean_weather_csv(read_weather_csv(spark, manifest, station_id))
        for station_id, manifest in csv_manifests.items()
    ]
    if json_path is not None:
        parts.append(clean_weather_json(read_weather_json(spark, json_path)))

    unified = unify(*parts)
    unified.cache()  # reused by: count, quality report, write

    if jdbc_url is not None:
        # S6: ping before any compute, like the reference's early exit
        from projet_meteo_etl_spark.sources.jdbc_sink import (
            jdbc_healthcheck,
            read_jdbc_table,
            write_jdbc_truncate_load,
        )

        if not jdbc_healthcheck(spark, jdbc_url):
            raise ConnectionError(f"JDBC sink unreachable: {jdbc_url}")

    source_count = unified.count()
    report = run_expectations(unified, WEATHER_EXPECTATIONS)

    # S5: truncate-and-load
    if jdbc_url is not None:
        write_jdbc_truncate_load(unified, jdbc_url, jdbc_table)
        sink_count = read_jdbc_table(spark, jdbc_url, jdbc_table).count()
        output_path = f"{jdbc_url}::{jdbc_table}"
    else:
        unified.write.mode("overwrite").parquet(output_path)
        sink_count = spark.read.parquet(output_path).count()

    return EtlResult(
        unified=unified,
        output_path=output_path,
        source_count=source_count,
        sink_count=sink_count,
        quality_report=report,
    )
