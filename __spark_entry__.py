"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001 as a smoke check;
``queries()`` / ``oracle_sql()`` expose the full operator registry for
the driver's DuckDB correctness gate (row-count + schema +
order-insensitive value hash at sf0.01).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from projet_meteo_etl_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue by nation: lineitem ⋈ orders ⋈ broadcast(customer) ⋈
    broadcast(nation) → hash agg → sort (scan→join→agg→sort end-to-end).
    """
    from projet_meteo_etl_spark.plans.relational import revenue_by_nation

    return revenue_by_nation(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = registry.collect()
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each hash-checkable query.

    Keys absent here (but present in ``queries()``) are deliberately
    engine-specific ops (latin-1 CSV inputs DuckDB 1.0 can't read,
    sketch internals, micro-batch-boundary semantics); the driver
    records a weaker rows-only check for that handful of queries.
    """
    _, o = registry.collect()
    return o
