"""S3/S4 — nested-JSON weather source (Infoclimat shape; SURVEY.md §2.1).

Reference behavior (``/root/reference/etl_meteo.py:140-147,79-90``): load
the whole JSON file, take the ``hourly`` key — a ``{station_id: [record,
...]}`` map — skip stations whose value is not a list, skip records that
are not dicts.

Spark-first: read with an *explicit* ``MapType(String, Array(Struct))``
schema (deterministic, no inference pass over 100 TB), then
``explode`` the map and the per-station arrays.  Entries that don't fit
the schema surface as nulls (PERMISSIVE) and are filtered — the exact
distributed analogue of the reference's type-guard skips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: fields the reference consumes from each hourly record
#: (/root/reference/etl_meteo.py:92-104); all read as strings because the
#: upstream feed mixes quoted and bare numbers.
RECORD_SCHEMA = T.StructType(
    [
        T.StructField("dh_utc", T.StringType()),
        T.StructField("temperature", T.StringType()),
        T.StructField("humidite", T.StringType()),
        T.StructField("pression", T.StringType()),
        T.StructField("vent_moyen", T.StringType()),
        T.StructField("pluie_1h", T.StringType()),
        T.StructField("pluie_3h", T.StringType()),
        T.StructField("id_station", T.StringType()),
    ]
)

#: stage-1 schema: station payloads kept as RAW JSON text so one
#: malformed station cannot null out the whole document (a single strict
#: MapType(String, Array(Struct)) schema would — PERMISSIVE mode nulls
#: the entire field on the first type mismatch).
JSON_SCHEMA = T.StructType(
    [T.StructField("hourly", T.MapType(T.StringType(), T.StringType()))]
)


def read_weather_json(
    spark: SparkSession, path: str, source: str = "Infoclimat"
) -> DataFrame:
    """Flatten ``{"hourly": {station: [records]}}`` into one row per record.

    Two-stage tolerant parse — the distributed analogue of the
    reference's isinstance guards (etl_meteo.py:84-90):

    1. ``hourly`` as ``map<string, string>`` (payloads = raw JSON text);
       stations whose payload is not a JSON array are filtered out
       (reference: "skip non-list with warning").
    2. each array parsed to ``array<string>`` elements; elements that
       are not JSON objects are filtered (reference: "skip non-dict"),
       the rest ``from_json``-ed against the explicit RECORD_SCHEMA.

    Output columns: RECORD_SCHEMA fields + ``station_key`` + ``source_donnees``.
    """
    raw = spark.read.option("multiLine", True).schema(JSON_SCHEMA).json(path)
    exploded = (
        raw.select(F.explode_outer("hourly").alias("station_key", "payload"))
        .filter(F.ltrim(F.col("payload")).startswith("["))  # non-list skipped
        .select(
            "station_key",
            F.explode(F.from_json("payload", T.ArrayType(T.StringType()))).alias(
                "el"
            ),
        )
        .filter(F.ltrim(F.col("el")).startswith("{"))  # non-dict skipped
        .select("station_key", F.from_json("el", RECORD_SCHEMA).alias("rec"))
        .select("station_key", "rec.*")
    )
    return exploded.withColumn("source_donnees", F.lit(source))
