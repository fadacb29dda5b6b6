"""Dump `.explain("formatted")` for named registered queries.

Usage: python tools/dump_plan.py <tag> <query> [<query> ...]

Writes plans/r13/<query>_<tag>.txt for each query (tag is e.g.
``before`` / ``after``) — the before/after plan evidence the
optimization rounds commit alongside the code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from projet_meteo_etl_spark import registry  # noqa: E402
from projet_meteo_etl_spark.session import get_spark  # noqa: E402
from tools.plan_report import formatted_plan  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13"
)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    tag, names = sys.argv[1], sys.argv[2:]
    spark = get_spark("dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry.collect()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        if name not in queries:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        df = queries[name](spark, SF_DIR)
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(formatted_plan(df))
        print(f"wrote {path}")
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
