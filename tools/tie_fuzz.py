"""Tie-break fuzzer: re-run every oracle-checked query on deterministic
row SUBSETS of the base tables and re-compare against DuckDB.

Why: a query can pass the sf0.01 gate yet carry a latent cross-engine
nondeterminism that only a different data shape exposes — the
``mode()`` frequency tie surfaced only at sf0.001; ``min_by`` price
ties, rank ties on rounded floats, and centroid-boundary flips are the
same class.  Dropping a deterministic ~1/K slice of each fact table
(same portable-hash predicate on BOTH engines) yields fresh data shapes
from the same files, multiplying tie coverage without new test data.

Streaming and weather queries are skipped: they read staged files, not
the catalog, so the subset hook cannot reach them (and they are
rows-only or micro-batch-bound anyway).

Usage: python tools/tie_fuzz.py [sf_dir] [n_variants]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from projet_meteo_etl_spark import catalog  # noqa: E402
from projet_meteo_etl_spark.session import get_spark  # noqa: E402
from tools.oracle_check import canon_rows  # noqa: E402

#: deterministic subset key per fact table (dims stay whole so joins
#: keep their referents)
FACT_KEYS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

MODULUS = 5  # drop 1/5 of rows per variant

SKIP_PREFIXES = ("stream_", "weather_")


def _hash_pred_spark(col: str, r: int):
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    return (h % MODULUS) != r


def _hash_pred_sql(col: str, r: int) -> str:
    return (
        f"('0x' || substr(md5({col}::VARCHAR), 1, 15))::BIGINT % {MODULUS} != {r}"
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_variants = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    only = set(sys.argv[3:])  # optional query-name filter

    spark = get_spark("tie-fuzz")
    orig_load = catalog.load_table
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = 0
    for r in range(n_variants):
        def load_subset(spark_, sf_dir_, name, _r=r):
            df = orig_load(spark_, sf_dir_, name)
            key = FACT_KEYS.get(name)
            return df.filter(_hash_pred_spark(key, _r)) if key else df

        # plan modules bind load_table by name at import time — patch
        # every bound reference, not just the catalog module
        patched = []
        for mod_name, mod in list(sys.modules.items()):
            if mod_name.startswith("projet_meteo_etl_spark") and getattr(
                mod, "load_table", None
            ) is orig_load:
                mod.load_table = load_subset
                patched.append(mod)

        con = duckdb.connect()
        for t in catalog.TABLES:
            p = os.path.join(sf_dir, f"{t}.parquet")
            if not os.path.exists(p):
                continue
            key = FACT_KEYS.get(t)
            where = f" WHERE {_hash_pred_sql(key, r)}" if key else ""
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}'){where}"
            )

        try:
            for name, fn in qs.items():
                sql = oracles.get(name)
                if sql is None or name.startswith(SKIP_PREFIXES):
                    continue
                if only and name not in only:
                    continue
                t0 = time.time()
                try:
                    sdf = fn(spark, sf_dir)
                    scols = sdf.columns
                    srows = [tuple(row) for row in sdf.collect()]
                    rel = con.sql(sql)
                    dcols = list(rel.columns)
                    drows = rel.fetchall()
                except Exception as exc:  # noqa: BLE001
                    print(f"FAIL  v{r} {name}: error: {exc}")
                    failures += 1
                    continue
                problems = []
                if len(srows) != len(drows):
                    problems.append(
                        f"rowcount spark={len(srows)} duckdb={len(drows)}"
                    )
                elif sorted(scols) != sorted(dcols):
                    problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
                else:
                    a, b = canon_rows(scols, srows), canon_rows(dcols, drows)
                    if a != b:
                        diff = [(x, y) for x, y in zip(a, b) if x != y][:2]
                        problems.append(f"values differ: {diff}")
                if problems:
                    print(f"FAIL  v{r} {name}: {'; '.join(problems)}")
                    failures += 1
                else:
                    print(f"OK    v{r} {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        finally:
            for mod in patched:
                mod.load_table = orig_load
            con.close()

    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
