"""Sinks: partitioned / multi-format writes with count reconciliation.

The reference's only sink is truncate-and-load into MongoDB with a
post-load count check (``/root/reference/etl_meteo.py:182-218``).  The
Spark-native generalization:

* ``mode("overwrite")`` parquet/CSV/JSON writes (truncate-and-load);
* **partitioned layout** (``partitionBy``) so downstream readers get
  partition pruning — the 100 TB table layout primitive;
* **read-back reconciliation** as a DataFrame operator rather than a
  driver-side assert (the oracle hashes source-vs-sink aggregates).

Writes land under a deterministic /tmp staging root keyed by the source
dir; every query is idempotent (overwrite semantics), matching the
reference's purge-then-insert contract.

Scale notes: ``partitionBy`` on a low-cardinality column (here
``l_returnflag``) yields one directory per value — at 100 TB you pick
partition columns with bounded cardinality (date, region) exactly like
this, and let AQE coalesce write tasks; CSV/JSON round-trips carry
timestamps as integer microseconds because text formats have no exact
timestamp encoding.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.functions.portable import pround


def staging_root(sf_dir: str) -> str:
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    return f"/tmp/spark_graft_sinks_{key}"


def sink_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write lineitem partitioned by l_returnflag (overwrite), read it
    back, and reconcile per-partition counts and sums against nothing
    but the sink — the oracle compares with the original source, so a
    lossy write would hash-mismatch."""
    out = os.path.join(staging_root(sf_dir), "lineitem_by_flag")
    src = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    src.write.partitionBy("l_returnflag").mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            pround(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
        .orderBy("l_returnflag")
    )


SINK_PARTITIONED_SQL = """
SELECT l_returnflag,
       count(*) AS n_rows,
       floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0 AS sum_qty,
       count(DISTINCT l_orderkey) AS n_orders
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def sink_pruned_partition_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read back ONE partition of the partitioned sink — the filter on
    the partition column never touches the other directories (partition
    pruning; see tests for the PartitionFilters assertion)."""
    out = os.path.join(staging_root(sf_dir), "lineitem_by_flag")
    src = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    src.write.partitionBy("l_returnflag").mode("overwrite").parquet(out)
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        pround(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


SINK_PRUNED_SQL = """
SELECT count(*) AS n_rows,
       floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0 AS sum_price
FROM lineitem WHERE l_returnflag = 'R'
"""

_EVENTS_TXT = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("cents", LongType()),
        StructField("ts_us", LongType()),
    ]
)


def sink_text_formats_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events through CSV and JSON sinks, read each back with an
    explicit schema, and emit per-format reconciliation aggregates.
    Timestamps ride as integer microseconds and money as integer cents —
    the only exact encodings text formats guarantee."""
    root = staging_root(sf_dir)
    src = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
        F.unix_micros("ts").alias("ts_us"),
    )
    csv_path, json_path = os.path.join(root, "events_csv"), os.path.join(root, "events_json")
    src.write.mode("overwrite").option("header", True).csv(csv_path)
    src.write.mode("overwrite").json(json_path)

    csv_back = spark.read.schema(_EVENTS_TXT).option("header", True).csv(csv_path)
    json_back = spark.read.schema(_EVENTS_TXT).json(json_path)

    def recon(df: DataFrame, fmt: str) -> DataFrame:
        return df.agg(
            F.lit(fmt).alias("format"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("cents").alias("sum_cents"),
            F.min("ts_us").alias("min_ts_us"),
            F.max("ts_us").alias("max_ts_us"),
        )

    return recon(csv_back, "csv").unionByName(recon(json_back, "json")).orderBy("format")


SINK_TEXT_FORMATS_SQL = """
WITH base AS (
  SELECT user_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         epoch_us(ts) AS ts_us
  FROM events
),
one AS (
  SELECT count(*) AS n_rows, count(DISTINCT user_id) AS n_users,
         CAST(sum(cents) AS BIGINT) AS sum_cents, min(ts_us) AS min_ts_us, max(ts_us) AS max_ts_us
  FROM base
)
SELECT 'csv' AS format, * FROM one
UNION ALL
SELECT 'json' AS format, * FROM one
ORDER BY format
"""


def sink_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events through Spark 4's built-in XML sink, read back with
    an explicit schema (no inference — determinism), and emit the same
    integer-exact reconciliation aggregates as the CSV/JSON round-trip.
    """
    out = os.path.join(staging_root(sf_dir), "events_xml")
    src = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
        F.unix_micros("ts").alias("ts_us"),
    )
    src.write.mode("overwrite").option("rowTag", "event").format("xml").save(out)
    back = (
        spark.read.schema(_EVENTS_TXT)
        .option("rowTag", "event")
        .format("xml")
        .load(out)
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("cents").alias("sum_cents"),
        F.min("ts_us").alias("min_ts_us"),
        F.max("ts_us").alias("max_ts_us"),
    )


SINK_XML_SQL = """
SELECT count(*) AS n_rows,
       count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
       min(epoch_us(ts)) AS min_ts_us,
       max(epoch_us(ts)) AS max_ts_us
FROM events
"""


def sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write orders through the ORC sink (the second columnar format the
    engine supports beside parquet), read it back, and emit per-priority
    reconciliation aggregates.

    ORC round-trips timestamps and doubles losslessly, but money still
    rides as integer cents so the aggregate (a SUM whose addition order
    differs between engines) stays integer-exact.
    """
    out = os.path.join(staging_root(sf_dir), "orders_orc")
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        # o_orderdate is TIMESTAMP_NTZ in the parquet; with the UTC
        # session tz the cast pins the same instant epoch_us sees
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("od_us"),
    )
    src.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_orderkey").alias("n_keys"),
            F.sum("cents").alias("sum_cents"),
            F.min("od_us").alias("min_od_us"),
            F.max("od_us").alias("max_od_us"),
        )
        .orderBy("o_orderpriority")
    )


SINK_ORC_SQL = """
SELECT o_orderpriority, count(*) AS n_orders,
       count(DISTINCT o_orderkey) AS n_keys,
       CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
       min(epoch_us(o_orderdate)) AS min_od_us,
       max(epoch_us(o_orderdate)) AS max_od_us
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


#: binaryFile-source fixture shape: N small deterministic ASCII files
BINARYFILE_N = 12


def binaryfile_ingest_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-media ingest via the ``binaryFile`` SOURCE — reading real
    files into ``(path, length, content: binary)`` rows, the front door
    of every multimodal pipeline (``operators/multimodal.py`` processes
    binary COLUMNS; this is how those columns enter from a bucket of
    media files).  The audit digests each ingested blob (JVM-side md5
    over the bytes) and checks length — the oracle rebuilds the same
    deterministic ASCII payloads with SQL string ops and must produce
    identical digests, so a torn read or encoding mutation anywhere in
    the source path flips the hash.

    Scale: binaryFile splits by FILE (one row per object, never split
    mid-blob) — exactly right for media; size caps and content pruning
    happen via ``pathGlobFilter``/``modifiedAfter`` options upstream.
    """
    import tempfile

    d = os.path.join(staging_root(sf_dir), "binfiles")
    marker = os.path.join(d, "_STAGED")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        for i in range(BINARYFILE_N):
            payload = (f"tick:{i};" * (40 + i)).encode("ascii")
            fd, tmp = tempfile.mkstemp(dir=d)
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
            os.replace(tmp, os.path.join(d, f"part_{i:02d}.bin"))
        open(marker, "w").close()
    back = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(d)
    )
    return (
        back.select(
            F.regexp_extract(
                F.col("path"), r"part_(\d+)\.bin$", 1
            )
            .cast("long")
            .alias("file_idx"),
            F.col("length").alias("n_bytes"),
            F.md5("content").alias("md5_hex"),
        )
        .orderBy("file_idx")
    )


BINARYFILE_SQL = f"""
WITH files AS (
  SELECT i.i AS file_idx,
         repeat('tick:' || i.i || ';', 40 + i.i) AS payload
  FROM generate_series(0, {BINARYFILE_N - 1}) i(i)
)
SELECT file_idx,
       CAST(length(payload) AS BIGINT) AS n_bytes,
       md5(payload) AS md5_hex
FROM files ORDER BY file_idx
"""


SPARK_QUERIES = {
    "binaryfile_ingest_audit": binaryfile_ingest_audit,
    "sink_partitioned_roundtrip": sink_partitioned_roundtrip,
    "sink_pruned_partition_read": sink_pruned_partition_read,
    "sink_text_formats_roundtrip": sink_text_formats_roundtrip,
    "sink_orc_roundtrip": sink_orc_roundtrip,
    "sink_xml_roundtrip": sink_xml_roundtrip,
}

ORACLE_SQL = {
    "binaryfile_ingest_audit": BINARYFILE_SQL,
    "sink_partitioned_roundtrip": SINK_PARTITIONED_SQL,
    "sink_pruned_partition_read": SINK_PRUNED_SQL,
    "sink_text_formats_roundtrip": SINK_TEXT_FORMATS_SQL,
    "sink_orc_roundtrip": SINK_ORC_SQL,
    "sink_xml_roundtrip": SINK_XML_SQL,
}
