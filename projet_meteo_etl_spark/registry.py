"""Central query registry: aggregates SPARK_QUERIES / ORACLE_SQL from every
plan/operator module.  ``__spark_entry__.py`` re-exports this.

Modules are imported defensively so one broken module cannot take down
the whole driver contract.
"""

from __future__ import annotations

import glob
import importlib
import json
import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    "projet_meteo_etl_spark.plans.relational",
    "projet_meteo_etl_spark.plans.relational_ext",
    "projet_meteo_etl_spark.plans.tpch_fill",
    "projet_meteo_etl_spark.plans.curation",
    "projet_meteo_etl_spark.plans.weather",
    "projet_meteo_etl_spark.plans.temporal",
    "projet_meteo_etl_spark.plans.timeseries",
    "projet_meteo_etl_spark.plans.showcase",
    "projet_meteo_etl_spark.plans.modern_api",
    "projet_meteo_etl_spark.plans.sql_surface",
    "projet_meteo_etl_spark.plans.incremental",
    "projet_meteo_etl_spark.plans.experiments",
    "projet_meteo_etl_spark.plans.layout",
    "projet_meteo_etl_spark.plans.feature_eng",
    "projet_meteo_etl_spark.plans.model_eval",
    "projet_meteo_etl_spark.operators.quality_queries",
    "projet_meteo_etl_spark.sources.sinks",
    "projet_meteo_etl_spark.operators.dedup",
    "projet_meteo_etl_spark.operators.multimodal",
    "projet_meteo_etl_spark.operators.sketches",
    "projet_meteo_etl_spark.operators.quantiles",
    "projet_meteo_etl_spark.operators.similarity",
    "projet_meteo_etl_spark.operators.retrieval",
    "projet_meteo_etl_spark.operators.text",
    "projet_meteo_etl_spark.operators.importance",
    "projet_meteo_etl_spark.operators.selection",
    "projet_meteo_etl_spark.operators.corpus_stats",
    "projet_meteo_etl_spark.operators.tokenizer",
    "projet_meteo_etl_spark.operators.profiling",
    "projet_meteo_etl_spark.operators.graph",
    "projet_meteo_etl_spark.operators.cooccur",
    "projet_meteo_etl_spark.operators.clustering",
    "projet_meteo_etl_spark.streaming.windows",
    "projet_meteo_etl_spark.streaming.structured",
)


def collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod_name in _MODULES:
        try:
            mod = importlib.import_module(mod_name)
        except Exception as exc:  # noqa: BLE001 — keep contract alive
            print(f"[registry] skipping {mod_name}: {exc}", file=sys.stderr)
            continue
        for name, fn in getattr(mod, "SPARK_QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} from {mod_name}")
            queries[name] = fn
        oracles.update(getattr(mod, "ORACLE_SQL", {}))
    # every oracle must have a query; not vice versa (rows-only checks)
    orphan = set(oracles) - set(queries)
    if orphan:
        raise ValueError(f"oracle_sql without queries(): {sorted(orphan)}")
    # a sampling driver takes a prefix of this dict: put queries with no
    # green correctness row from any prior round FIRST, so every round
    # maximizes never-verified coverage (round-1 sampled 50/160 and
    # missed the entire audit + LLM-pipeline families).
    # The never-checked prefix is FROZEN (frozen_order_r3.json, the 107
    # round-2-era unverified names, audits first): queries added after
    # round 2 sort AFTER that block so they cannot displace queries that
    # have waited two rounds for a driver row.
    # queries rewritten AFTER their last green driver row must be re-drawn:
    # the redraw manifest subtracts them from the verified set so they sort
    # back into the never-verified prefix (at its head).
    redraw = _force_redraw()
    done = _previously_verified() - set(redraw)
    frozen = redraw + [n for n in _frozen_priority() if n not in redraw]
    rank = {n: i for i, n in enumerate(frozen)}
    pending = [k for k in queries if k not in done]
    pending.sort(key=lambda k: (rank.get(k, len(rank)), list(queries).index(k)))
    ordered = {k: queries[k] for k in pending}
    ordered.update((k, v) for k, v in queries.items() if k in done)
    return ordered, oracles


def _force_redraw() -> list[str]:
    """Names whose code changed after their newest driver CORRECTNESS row
    (round-6 verdict item 1): treat them as never-verified so the sampling
    driver re-draws them first.  Only the NEWEST ``redraw_r*.json`` manifest
    is live — older rounds' manifests are retired once their names have
    fresh green rows (keeping them active would re-subtract already-green
    names and waste the driver's 50-query sample window on redundant
    redraws).  Missing manifest ⇒ nothing to redraw."""
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    # numeric round key: lexicographic sort would rank redraw_r9 after
    # redraw_r10 and silently pin a stale manifest from round 10 on.
    # Non-numeric strays (editor backups, experiment copies) are
    # ignored rather than crashing the whole driver contract.
    numbered = []
    for p in glob.glob(os.path.join(here, "redraw_r*.json")):
        m = re.search(r"redraw_r(\d+)\.json$", p)
        if m:
            numbered.append((int(m.group(1)), p))
    if not numbered:
        return []
    manifests = [p for _, p in sorted(numbered)]
    with open(manifests[-1]) as f:
        names = json.load(f)
    return [n for n in names if isinstance(n, str)]


def _frozen_priority() -> list[str]:
    """Never-driver-checked query names in frozen priority order.

    Each round's remainder manifest (written once at round start,
    newest wins) pins the order so the sampling driver sweeps a
    deterministic prefix.  A MISSING manifest degrades to plain
    registration order; a MALFORMED one raises — silently defeating
    the never-verified-first priority is worse than failing loudly.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    for fname in (
        "frozen_order_r5.json",
        "frozen_order_r4.json",
        "frozen_order_r3.json",
    ):
        path = os.path.join(here, fname)
        try:
            with open(path) as f:
                names = json.load(f)
        except FileNotFoundError:
            continue
        return [n for n in names if isinstance(n, str)]
    return []


def _previously_verified() -> set[str]:
    """Query names with a fully-green row in any prior round's
    CORRECTNESS_r*.json (rows-only entries count once their row counts
    ran clean — they can never hash-check by design)."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    done: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:  # noqa: BLE001 — unreadable report ⇒ no info
            continue
        for name, r in data.items():
            if not isinstance(r, dict):
                continue
            if r.get("err") == "no_oracle" and r.get("spark_rows", 0) >= 0:
                done.add(name)
            elif (
                r.get("rows_match")
                and r.get("schema_match")
                and r.get("hash_match")
            ):
                done.add(name)
    return done
