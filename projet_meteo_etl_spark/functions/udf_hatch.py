"""User-facing vectorized-scalar escape hatch.

SURVEY §2.5: the reference's only "custom logic" surface is per-cell
``Series.apply(lambda)`` chains (``/root/reference/etl_meteo.py:53-59``)
— morally scalar UDFs with no registration surface.  In this engine all
of those became built-in Column expressions, but an engine needs a
**documented extension point** for genuinely custom scalars the
built-ins cannot express.  This is it: one call registers a
user-supplied *vectorized* scalar (pandas Series in → pandas Series
out) as BOTH a Column-expression callable and a SQL function, so the
same kernel is reachable from the DataFrame API and from
``spark.sql(...)``.

Design rules the hatch enforces by construction:

* **Arrow-batched, never row-at-a-time** — the callable is wrapped in
  ``pandas_udf``, so the exchange with the Python worker is columnar
  Arrow batches (10-100× the throughput of ``F.udf``'s per-row
  pickling; see ``/opt/skills/guides/pyspark_guide.md``).
* **Self-contained closures** — the function is serialized by value to
  executors; it must import its own dependencies (``numpy`` etc.)
  inside the body and reference nothing module-level, or foreign-cwd
  Python workers (the driver gate) cannot unpickle it.
* **Scalars only** — grouped aggregates take a different contract
  (one Series per group); see ``plans.modern_api.pandas_udaf_user_median``
  for that surface, and ``plans.sql_surface.sql_udf_discount_bands``
  for pure-SQL (JVM-side, codegen-able) user functions, which should
  always be preferred when the logic is expressible.

Contract-tested by ``plans.modern_api.pandas_udf_scalar_hatch`` (a
registered, hash-oracled query that routes a custom scalar through
both the Column and the SQL route) and ``tests/test_modern_api.py``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import SparkSession


def register_vectorized_scalar(
    spark: SparkSession,
    name: str,
    fn: Callable,
    return_type: str,
) -> Callable:
    """Register ``fn`` (pandas Series in → pandas Series out) under
    ``name`` and return the Column-expression callable.

    After this call the scalar is usable both ways::

        score = register_vectorized_scalar(spark, "my_score", fn, "long")
        df.select(score(F.col("x")))          # DataFrame route
        spark.sql("SELECT my_score(x) FROM t")  # SQL route

    ``return_type`` is a DDL type string (``"long"``, ``"double"``,
    ``"string"`` …).  The wrapped function runs once per Arrow batch on
    the executors; at 1000 executors the scalar scales embarrassingly —
    no shuffle, no state, pure map work pipelined into whatever stage
    consumes it.
    """
    from pyspark.sql.functions import pandas_udf

    udf = pandas_udf(return_type)(fn)
    spark.udf.register(name, udf)
    return udf
