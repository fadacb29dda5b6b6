"""S1/S2 — Weather-Underground-style quirky CSV source (SURVEY.md §2.1).

Reference behavior (``/root/reference/etl_meteo.py:149-178``): loop over a
static ``{date: filename}`` manifest, per file ``pd.read_csv(header=0,
skiprows=[2], encoding='latin-1', sep=';')``, strip whitespace from header
names, attach the manifest date as a column, per-file fault isolation.

Spark-first redesign — one scan, not a loop:

* ALL manifest files go into a single ``spark.read.csv(paths)`` — at
  scale that's one distributed job with file-split parallelism instead
  of a sequential driver loop.
* The observation date (out-of-band in the reference: it's the manifest
  key) is recovered by joining ``input_file_name()`` against a small
  manifest DataFrame — broadcast, so it costs nothing.
* ``skiprows=[2]`` (a positional junk/units row) has no Spark
  equivalent and positional row addressing doesn't scale anyway; we
  drop it by *content*: the junk row's Time cell is not a valid
  time-of-day.  This is deterministic and distributed.
* per-file fault isolation → three layers, mirroring the reference's
  per-file ``try/except`` (``etl_meteo.py:173-176``) without a loop:
  manifest paths that don't exist are pruned up front via the Hadoop
  FileSystem API (``ignoreMissingFiles`` only covers files that vanish
  *between* listing and read — a path absent at analysis time raises
  PATH_NOT_FOUND); ``ignoreMissingFiles`` covers the race; PERMISSIVE
  mode plus the content-based Time filter absorb structurally corrupt
  files (their rows parse as garbage and fail the Time predicate).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def _existing_paths(spark: SparkSession, paths: list[str]) -> list[str]:
    """Manifest paths that exist, checked through the Hadoop FileSystem
    API so any scheme the cluster reads (file:, hdfs:, s3a:) works.
    The manifest is a small hand-maintained dict (the unit the reference
    iterates), so a driver-side loop is the right cost here."""
    sc = spark.sparkContext
    hconf = sc._jsc.hadoopConfiguration()
    jvm = sc._jvm
    out = []
    for p in paths:
        jpath = jvm.org.apache.hadoop.fs.Path(p)
        try:
            if jpath.getFileSystem(hconf).exists(jpath):
                out.append(p)
        except Exception:  # noqa: BLE001 — unreadable scheme ⇒ skip file
            pass
    return out


#: matches "12:00 AM", "3:05 pm", "23:45", "07:00:00" — anything the
#: reference's Time column legitimately contains; the skipped units row
#: (e.g. "°F;%;in;mph") does not match.
_TIME_RE = r"^\s*\d{1,2}:\d{2}(:\d{2})?\s*([AaPp][Mm])?\s*$"


def read_weather_csv(
    spark: SparkSession,
    manifest: dict[str, str],
    station_id: str,
    source: str = "Weather Underground",
) -> DataFrame:
    """Read a ``{date_str: csv_path}`` manifest into one raw DataFrame.

    Returns the raw (string-typed) columns plus ``Date`` (from the
    manifest), ``id_station`` and ``source_donnees`` literals — the
    cleaning/conversion step is a separate pure transform
    (:func:`projet_meteo_etl_spark.pipeline.clean_weather_csv`).
    """
    paths = _existing_paths(spark, list(manifest.values()))
    if not paths:
        # every manifest file is absent: the reference's loop would end
        # with an empty frame, not an error — match that.  The empty
        # frame must carry the full raw schema clean_weather_csv
        # selects, or the downstream plan fails to resolve.
        return spark.createDataFrame(
            [],
            "Date string, Time string, Temperature string, Humidity string, "
            "Pressure string, Speed string, `Precip. Accum.` string, "
            "id_station string, source_donnees string",
        )
    raw = (
        spark.read.option("sep", ";")
        .option("encoding", "ISO-8859-1")
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("ignoreMissingFiles", True)
        .csv(paths)
    )
    # header names may carry stray whitespace (reference strips at :159)
    raw = raw.toDF(*[c.strip() for c in raw.columns])

    # manifest join: filename → observation date (replaces df.name attr)
    manifest_df = spark.createDataFrame(
        [(os.path.abspath(p), d) for d, p in manifest.items()],
        "abs_path string, Date string",
    )
    with_file = raw.withColumn(
        "abs_path", F.regexp_replace(F.input_file_name(), "^file:(//)?", "")
    )
    joined = with_file.join(F.broadcast(manifest_df), "abs_path", "left").drop(
        "abs_path"
    )

    # content-based replacement for skiprows=[2]: drop the units row
    joined = joined.filter(F.col("Time").rlike(_TIME_RE))

    return joined.withColumn("id_station", F.lit(station_id)).withColumn(
        "source_donnees", F.lit(source)
    )
