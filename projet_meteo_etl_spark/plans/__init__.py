"""Query plans: declarative DataFrame programs over the catalog tables.

Each module exposes two dicts:

* ``SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
* ``ORACLE_SQL: dict[str, str]`` — ANSI SQL DuckDB equivalents (omitted
  for ops that SQL cannot express identically; the driver then records a
  rows-only check).

Conventions that keep the DuckDB oracle hash-stable:

* every computed column is explicitly aliased, identically in both sides;
* floating-point aggregates are ``round(x, 2)`` (or finer) on both sides
  so summation-order differences below the rounding grain cannot flip the
  value hash;
* integer-typed computed columns are cast to BIGINT on the Spark side
  (DuckDB's count/row_number/year return int64);
* any ranking uses a total order (a key column as tie-break).
"""
