"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {...}, "sf": 0.1}

Each query is executed end-to-end with a ``noop`` sink write — the full
physical plan runs (scan → shuffle → agg/join/window) without paying
driver-side collect serialization, which is the honest distributed cost.
A warmup pass of the flagship query amortizes JVM/codegen startup out of
the per-query numbers.

Requalification mode (the ambient-vs-regression triage one-liner):

    python bench.py --isolate <query> [<query> ...] [--reps N] [--settle S]

waits ``S`` seconds for co-tenant load to settle (default 5), then runs
ONLY the named queries in a fresh warmed session, ``N`` repetitions each
(default 3), and prints one JSON line with per-query min/median and the
load average — the protocol BASELINE.md prescribes before calling any
bench delta a regression (this box's co-tenant load swings unchanged
queries ±30-50%).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from projet_meteo_etl_spark import registry  # noqa: E402
from projet_meteo_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_query(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _regime() -> dict:
    try:
        load1, load5, load15 = os.getloadavg()
        return {
            "loadavg_1m": round(load1, 2),
            "loadavg_5m": round(load5, 2),
            "loadavg_15m": round(load15, 2),
            "unix_time": int(time.time()),
        }
    except OSError:
        return {}


def isolate(names: list[str], reps: int, settle: float) -> int:
    """Re-time specific queries under controlled conditions: settle
    wait, fresh warmed session, ``reps`` repetitions, median + min
    reported.  The MIN is the best estimate of the code's intrinsic
    cost on a shared box (co-tenant interference only ever adds time);
    the median shows the regime spread."""
    import statistics

    queries, _ = registry.collect()
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"[bench] unknown queries: {unknown}", file=sys.stderr)
        return 2
    time.sleep(settle)
    spark = get_spark("bench-isolate")
    spark.sparkContext.setLogLevel("ERROR")
    from projet_meteo_etl_spark.plans.relational import revenue_by_nation

    run_query(revenue_by_nation(spark, SF_DIR))
    out: dict[str, dict] = {}
    for name in names:
        samples: list[float] = []
        for _ in range(reps):
            # a prior query can take the whole JVM down (executor heap
            # exhaustion shuts the SparkContext); without a restart every
            # remaining query cascade-fails with misleading analysis
            # errors — observed masking 13 queries in the r12 sf1.0 tier
            if spark.sparkContext._jsc is None or spark.sparkContext._jsc.sc().isStopped():
                print(f"[bench] SparkContext dead before {name}; restarting", file=sys.stderr)
                spark = get_spark("bench-isolate-restarted")
                spark.sparkContext.setLogLevel("ERROR")
            t0 = time.perf_counter()
            try:
                run_query(queries[name](spark, SF_DIR))
                samples.append(round(time.perf_counter() - t0, 3))
            except Exception as exc:  # noqa: BLE001 — report, keep going
                print(f"[bench] {name} FAILED: {exc}", file=sys.stderr)
            finally:
                try:
                    spark.catalog.clearCache()
                except Exception:  # noqa: BLE001 — context died mid-query
                    pass
        out[name] = {
            "reps": len(samples),
            "min": min(samples) if samples else -1.0,
            "median": round(statistics.median(samples), 3) if samples else -1.0,
            "samples": samples,
        }
    print(
        json.dumps(
            {
                "metric": "isolated_query_wall_sec",
                "unit": "sec",
                "queries": out,
                "sf": _sf_of(SF_DIR),
                "regime": _regime(),
            }
        )
    )
    return 0


def main() -> int:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries, _ = registry.collect()

    # warmup: flagship plan, absorbs session/codegen startup cost
    from projet_meteo_etl_spark.plans.relational import revenue_by_nation

    run_query(revenue_by_nation(spark, SF_DIR))

    timings: dict[str, float] = {}
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            run_query(fn(spark, SF_DIR))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — one bad query must not kill bench
            print(f"[bench] {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0
        finally:
            # drop persisted intermediates the query left behind: a
            # leftover cache evicting mid-way through a LATER query is
            # what caused the random 9-20 s single-query spikes
            # (cache-eviction variance noted in BASELINE.md)
            spark.catalog.clearCache()

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # ambient-regime stamp: this box is shared, and co-tenant load swings
    # unchanged queries ±30-50% (BASELINE.md documents 286→394 s on
    # identical code).  Recording the load average + timestamp with the
    # numbers lets cross-round per-query ratio reads attribute drift to
    # regime instead of silently mixing loaded and idle runs.
    regime = _regime()
    payload = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(SF_DIR),
        "n_queries": len(timings),
        "n_failed": sum(1 for t in timings.values() if t < 0),
        "regime": regime,
    }
    print(json.dumps(payload))
    # the driver's stored copy truncates the stdout line; persist the
    # complete per-query map so cross-round comparisons stay possible
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_full.json"
    )
    try:
        with open(full_path, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
    except OSError as exc:
        print(f"[bench] could not write {full_path}: {exc}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--isolate":
        usage = (
            "usage: bench.py --isolate <query> [...] [--reps N] [--settle S]"
        )
        args = sys.argv[2:]
        reps, settle = 3, 5.0
        try:
            if "--reps" in args:
                i = args.index("--reps")
                reps = int(args[i + 1])
                del args[i : i + 2]
            if "--settle" in args:
                i = args.index("--settle")
                settle = float(args[i + 1])
                del args[i : i + 2]
        except (IndexError, ValueError):
            print(usage, file=sys.stderr)
            raise SystemExit(2) from None
        if not args or reps < 1 or settle < 0:
            print(usage, file=sys.stderr)
            raise SystemExit(2)
        raise SystemExit(isolate(args, reps, settle))
    raise SystemExit(main())
