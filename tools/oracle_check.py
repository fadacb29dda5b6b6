"""Local mirror of the driver's correctness gate.

For each entry in ``queries()``: run the Spark plan and the DuckDB oracle
SQL on the same sf dir, then compare row count, sorted column names, and
an order-insensitive canonicalized value multiset.

Usage:
    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from projet_meteo_etl_spark.catalog import TABLES  # noqa: E402
from projet_meteo_etl_spark.session import get_spark  # noqa: E402


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:NaN"
        return f"f:{v:.9g}"
    if isinstance(v, int):
        return f"i:{v}"
    return str(v)


#: Engine-specific type names → one canonical namespace, so the local gate
#: is width-sensitive the way the driver's value hash is (round-1 lesson:
#: DuckDB HUGEINT from an integer sum vs Spark BIGINT hash-mismatched on
#: the driver while the old str()-based canonicalizer said OK).
_SPARK_CANON = {
    "tinyint": "int8",
    "smallint": "int16",
    "int": "int32",
    "bigint": "int64",
    "float": "float32",
    "double": "float64",
    "string": "string",
    "boolean": "bool",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
}

_DUCK_CANON = {
    "TINYINT": "int8",
    "SMALLINT": "int16",
    "INTEGER": "int32",
    "BIGINT": "int64",
    "HUGEINT": "int128",
    "UTINYINT": "uint8",
    "USMALLINT": "uint16",
    "UINTEGER": "uint32",
    "UBIGINT": "uint64",
    "FLOAT": "float32",
    "DOUBLE": "float64",
    "VARCHAR": "string",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
}


def _canon_type(name: str, table: dict[str, str]) -> str:
    name = name.strip()
    if name.lower().startswith("decimal"):
        return name.lower().replace(" ", "")
    if name.lower().startswith("array") or name.lower().endswith("[]"):
        return "array"
    return table.get(name, table.get(name.upper(), name.lower()))


def type_mismatches(
    scols: list[str], sdtypes: list[str], dcols: list[str], ddtypes: list[str]
) -> list[str]:
    """Per-column canonical-type diffs between the Spark result and the
    DuckDB oracle result (column names already known to match as sets)."""
    smap = {c: _canon_type(t, _SPARK_CANON) for c, t in zip(scols, sdtypes)}
    dmap = {c: _canon_type(t, _DUCK_CANON) for c, t in zip(dcols, ddtypes)}
    out = []
    for c in sorted(smap):
        if c in dmap and smap[c] != dmap[c]:
            out.append(f"{c}: spark={smap[c]} duckdb={dmap[c]}")
    return out


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon_cell(r[i]) for i in order) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # mirror the driver: a bare session with NONE of our configs
        # (Spark 4 defaults: ANSI on, machine tz, 200 shuffle partitions)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .appName("oracle-check-vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    n_hash = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            sdtypes = [t for _, t in sdf.dtypes]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        spark_s = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{spark_s:.1f}s]")
            n_rows_only += 1
            continue
        try:
            rel = con.sql(sql)
            dcols = list(rel.columns)
            ddtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        else:
            tdiffs = type_mismatches(scols, sdtypes, dcols, ddtypes)
            if tdiffs:
                problems.append(f"types differ: {tdiffs}")
        if not problems:
            a, b = canon_rows(scols, srows), canon_rows(dcols, drows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"OK    {name}: {len(srows)} rows [{spark_s:.1f}s]")
            n_hash += 1
    verdict = "ALL OK" if failures == 0 else f"{failures} FAILURES"
    print(
        f"\n{verdict} — {n_hash} hash / {n_rows_only} rows-only"
        f" / {failures} fail"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
