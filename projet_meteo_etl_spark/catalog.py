"""Parquet table catalog over the driver-provided TPC-H-ish test data.

Mirrors the reference's "one source per table" manifest pattern
(``/root/reference/etl_meteo.py:16-34``) but as a declarative catalog:
paths in, lazily-scanned DataFrames out.  Filters and projections applied
downstream reach the parquet reader via Catalyst pushdown — check with
``df.explain()`` for ``PushedFilters`` / ``ReadSchema``.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: process-wide counter for :func:`unique_view` names
_VIEW_SEQ = itertools.count()


def unique_view(prefix: str) -> str:
    """A per-call temp-view name (``prefix__vNNN``).

    Queries that stage an intermediate behind ``createOrReplaceTempView``
    (the ``WITH RECURSIVE`` plans) must not share a session-global name:
    two concurrent invocations in one SparkSession — or user code that
    happens to use the same view name — would silently clobber each
    other before analysis binds the plan.  A monotone counter is enough;
    uniqueness only needs to hold within this process/session.
    """
    return f"{prefix}__v{next(_VIEW_SEQ)}"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def harden_session(spark: SparkSession) -> None:
    """Pin the runtime-settable confs our plans assume, so queries run
    identically on an externally-built vanilla session (the driver's
    correctness gate constructs its own SparkSession, which in Spark 4
    defaults to ANSI mode and the machine timezone):

    - ANSI off: ``cast('n/a' AS DOUBLE)`` must yield null (the P1
      unparsable→null contract), not raise;
    - UTC session timezone: window starts / date parts must agree with
      the DuckDB oracle regardless of host timezone;
    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS).
    """
    for k, v in (
        ("spark.sql.ansi.enabled", "false"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — conf may be fixed; keep going
            pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one catalog table.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong`` it surfaces as a nanosecond
    BIGINT, which we convert to a microsecond TimestampType here (same
    truncation DuckDB applies when it casts nanos to its µs timestamps).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; catalog has {TABLES}")
    harden_session(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    ts_type = dict(df.dtypes).get("ts") if name == "events" else None
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) surfaces as
        # TIMESTAMP_NTZ in Spark 4; with the session pinned to UTC this
        # cast maps each wall-clock value to the identical instant DuckDB
        # sees, and restores TimestampType for unix_micros()/window().
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df

def spread_scan(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin repartition a freshly-scanned (or narrowly-derived)
    DataFrame up to the session's default parallelism — but ONLY when
    the source actually under-partitions.

    Why: the guide's "input skew" remedy (one unsplittable file → the
    whole scan stage runs on one task).  The test fixtures are
    single-row-group parquet files, so every scan yields ONE partition
    and all CPU-heavy scan-stage work (md5 priorities, shingling,
    regex tokenization, codec kernels) serializes on one core of 32.
    One round-robin exchange of the (small) scan output unlocks the
    machine.

    Scale-adaptive by construction: the guard compares the plan's
    actual partition count against the session default parallelism, so
    on a cluster reading a real multi-file table (thousands of splits)
    this is a NO-OP — no shuffle is added at 100 TB.  The partition
    count read is driver-side plan inspection only (no job runs; same
    mechanism as the jdbc writer guard).
    """
    spark = df.sparkSession
    want = parts or spark.sparkContext.defaultParallelism
    try:
        have = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning quirk: keep the plan as-is
        return df
    if have * 2 <= want:
        return df.repartition(want)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load several tables; also registers each as a temp view so the
    same queries can be written in pure SQL (``spark.sql``)."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
