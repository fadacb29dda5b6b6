"""S5/S6 as a real external-DB connector — JDBC truncate-and-load + ping.

The reference's sink is MongoDB: ``collection.delete_many({})`` then
``insert_many`` (truncate-and-load, ``/root/reference/etl_meteo.py:182-218``)
with a ``client.admin.command('ping')`` healthcheck before any work
(``etl_meteo.py:187-188``, ``quality_audit.py:25-26``).  This module maps
that contract onto Spark's engine-native JDBC DataSource:

* truncate-and-load → ``.write.format("jdbc").mode("overwrite")`` —
  Spark drops/truncates the table and bulk-inserts, one executor-side
  JDBC connection per partition (the distributed version of the
  reference's single ``insert_many``);
* ping → a 1-row ``VALUES 1`` query through the same driver/URL the
  sink will use, so a dead or misconfigured DB fails fast *before* the
  pipeline computes anything, exactly like the reference.

Scale notes: JDBC write parallelism = input partitions (each opens a
connection; repartition to a sane connection count first — default here
caps at 8), and ``batchsize`` controls rows per INSERT batch.  The
tests exercise the full contract against Derby, the embedded JDBC
engine already on Spark's classpath, so the round-trip is real without
any external service; swapping the URL/driver for Postgres/MySQL is
configuration, not code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: embedded engine on Spark's own classpath — used by tests/local runs
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

#: cap on concurrent JDBC connections for the write (a 1000-executor
#: cluster must not open 1000 connections against one DB)
MAX_WRITE_CONNECTIONS = 8


def jdbc_healthcheck(
    spark: SparkSession, url: str, driver: str = DERBY_DRIVER
) -> bool:
    """S6 — the reference's ``ping`` (quality_audit.py:25-26): run a
    constant 1-row query through the driver/URL the sink will use.
    Returns False instead of raising, like the reference's logged
    ConnectionFailure path (etl_meteo.py:189-191)."""
    try:
        n = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("driver", driver)
            .option("query", "VALUES 1")
            .load()
            .count()
        )
        return n == 1
    except Exception:  # noqa: BLE001 — unreachable DB is the False case
        return False


def write_jdbc_truncate_load(
    df: DataFrame,
    url: str,
    table: str,
    driver: str = DERBY_DRIVER,
    batchsize: int = 1000,
) -> None:
    """S5 — truncate-and-load (etl_meteo.py:203-207: delete_many +
    insert_many) as an overwrite-mode JDBC write, connection count
    bounded by ``MAX_WRITE_CONNECTIONS``."""
    out = df
    if df.rdd.getNumPartitions() > MAX_WRITE_CONNECTIONS:
        out = df.coalesce(MAX_WRITE_CONNECTIONS)
    (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", str(batchsize))
        .mode("overwrite")
        .save()
    )


def read_jdbc_table(
    spark: SparkSession, url: str, table: str, driver: str = DERBY_DRIVER
) -> DataFrame:
    """Read the sink table back (count reconciliation reads the SINK,
    not the in-memory frame — etl_meteo.py:209-211)."""
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .load()
    )
