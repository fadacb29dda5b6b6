"""Spark-4-native API surface: Python DataSource, Python UDTF, VARIANT.

The reference drives everything through static file manifests and
per-cell Python lambdas (``/root/reference/etl_meteo.py:16-34`` manifest
dicts, ``:53-59`` Series.apply lambdas, ``:140-147`` whole-file JSON
load).  This module re-expresses those extension points with the
engine-native Spark 4 APIs a user switching from the reference would
reach for:

* **Python DataSource** (``spark.dataSource.register``) — the
  reference's "manifest of per-station files" source (S2) as a
  first-class pluggable source with partition planning (one input
  partition per station, the unit the reference loops over) and
  predicate pushdown into ``partitions()``;
* **Python UDTF** — the reference's closest thing to custom logic is a
  scalar lambda; a table function is the richer surface: one input row
  → many output rows, here run-length encoding of repeated tokens
  (imperative per-row logic that has no single built-in equivalent);
* **VARIANT** (``parse_json`` / ``try_variant_get``) — the reference
  loads whole JSON into Python dicts; VARIANT keeps semi-structured
  data columnar and JVM-side with per-path typed extraction.

All three are oracle-checked against DuckDB: the DataSource generates
deterministically (integer arithmetic only), the UDTF's run-length
semantics are mirrored by a gaps-and-islands SQL query, and VARIANT
extraction by ``json_extract``.

Driver-gate caveat (vanilla session): the UDTF and DataSource classes
are defined INSIDE the query functions so cloudpickle serializes them
by value — the gate's Python workers run from a foreign cwd and cannot
import this package.
"""

from __future__ import annotations

import pandas as pd  # annotation target for the pandas UDAF signature
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import (
    harden_session,
    load_table,
    unique_view,
)

#: Custom-source shape: 8 stations × 1440 hourly ticks (≈ two months),
#: temperature in integer centi-°C from a fixed congruence so Spark and
#: the DuckDB oracle generate bit-identical data independently.
PYDS_STATIONS = 8
PYDS_HOURS = 1440
PYDS_MIN_STATION = 2  # pushed-down lower bound, prunes partitions 0-1


def pyds_ticks_station_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-station stats over a custom Python DataSource.

    The source plans one ``InputPartition`` per station (the unit the
    reference's manifest loop iterates, ``etl_meteo.py:149-178``) and
    implements ``pushFilters``: the ``station_id >= 2`` predicate below
    reaches ``partitions()`` and prunes two partitions at the source —
    the Python-source analogue of parquet partition pruning.  Rows are
    generated, never collected driver-side.
    """
    harden_session(spark)
    try:
        # required for pushFilters to be called (and, in Spark 4.1, for
        # a reader that implements it to initialize at all)
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:  # noqa: BLE001 — conf locked: fall back unpruned
        pass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        GreaterThanOrEqual,
        InputPartition,
    )

    n_hours = PYDS_HOURS
    pushdown_on = (
        spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
        == "true"
    )

    class StationTicksReader(DataSourceReader):
        def __init__(self, options):
            self.n_stations = int(options.get("stations", "4"))
            self.n_hours = int(options.get("hours", "24"))
            self.min_station = 0

        if pushdown_on:  # a reader MAY only implement this when enabled

            def pushFilters(self, filters):
                for f in filters:
                    if (
                        isinstance(f, GreaterThanOrEqual)
                        and f.attribute == ("station_id",)
                        and isinstance(f.value, int)
                    ):
                        self.min_station = max(self.min_station, f.value)
                    else:
                        yield f  # unsupported → Spark applies post-scan

        def partitions(self):
            return [
                InputPartition(s)
                for s in range(self.min_station, self.n_stations)
            ]

        def read(self, partition):
            s = partition.value
            for h in range(self.n_hours):
                yield (s, h, (s * 37 + h * 13) % 4000 - 1000)

    class StationTicksSource(DataSource):
        @classmethod
        def name(cls):
            return "station_ticks"

        def schema(self):
            return "station_id int, hour_idx int, temp_centi int"

        def reader(self, schema):
            return StationTicksReader(self.options)

    spark.dataSource.register(StationTicksSource)
    ticks = (
        spark.read.format("station_ticks")
        .option("stations", str(PYDS_STATIONS))
        .option("hours", str(n_hours))
        .load()
        .filter(F.col("station_id") >= PYDS_MIN_STATION)
    )
    return (
        ticks.groupBy(F.col("station_id").cast("long").alias("station_id"))
        .agg(
            F.count("*").alias("n_obs"),
            F.min("temp_centi").cast("long").alias("min_centi"),
            F.max("temp_centi").cast("long").alias("max_centi"),
            F.sum("temp_centi").cast("long").alias("sum_centi"),
            (F.sum("temp_centi").cast("double") / F.count("*") / 100.0).alias(
                "avg_temp_c"
            ),
        )
        .orderBy("station_id")
    )


PYDS_TICKS_SQL = f"""
WITH ticks AS (
  SELECT s.s AS station_id, h.h AS hour_idx,
         (s.s * 37 + h.h * 13) % 4000 - 1000 AS temp_centi
  FROM generate_series(0, {PYDS_STATIONS - 1}) s(s),
       generate_series(0, {PYDS_HOURS - 1}) h(h)
  WHERE s.s >= {PYDS_MIN_STATION}
)
SELECT station_id, count(*) AS n_obs,
       min(temp_centi) AS min_centi,
       max(temp_centi) AS max_centi,
       CAST(sum(temp_centi) AS BIGINT) AS sum_centi,
       CAST(sum(temp_centi) AS DOUBLE) / count(*) / 100.0 AS avg_temp_c
FROM ticks
GROUP BY station_id
ORDER BY station_id
"""


#: streaming custom-source shape: stations × hours, chunked so the
#: bounded replay takes several micro-batches (offset = hours consumed)
PYDS_STREAM_STATIONS = 6
PYDS_STREAM_HOURS = 480
PYDS_STREAM_CHUNK = 240  # 2 micro-batches: offsets still advance, half the per-batch python-runner constant


def pyds_stream_ticks_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom **streaming** Python DataSource
    (``SimpleDataSourceStreamReader``) — the source-side streaming
    extension point (:func:`pyds_ticks_station_stats` covers the batch
    reader): the reader owns its OFFSET (hours consumed), each
    micro-batch ingests the next chunk, and ``readBetweenOffsets``
    makes the range replayable for recovery — the contract a Kafka-like
    connector implements.  Totals are a complete-mode aggregation, so
    the bounded replay's final table equals the batch formula the
    DuckDB oracle computes independently.

    Scale note: a python stream source feeds offsets from the driver,
    but rows materialize on executors per batch; throughput scales with
    partitions for the full ``DataSourceStreamReader`` variant — the
    simple reader here is the single-partition control-plane shape.
    """
    harden_session(spark)

    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    n_st, n_h, chunk = (
        PYDS_STREAM_STATIONS,
        PYDS_STREAM_HOURS,
        PYDS_STREAM_CHUNK,
    )

    class TickStreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"h": 0}

        def _rows(self, h0: int, h1: int):
            # a list ITERATOR, not a generator: the runner pickles the
            # prefetched batch (generators can't pickle) AND calls
            # next() on it to validate end-of-stream emptiness
            return iter(
                [
                    (s, h, (s * 41 + h * 17) % 3000 - 1500)
                    for h in range(h0, h1)
                    for s in range(n_st)
                ]
            )

        def read(self, start):
            h0 = int(start["h"])
            h1 = min(h0 + chunk, n_h)
            return (self._rows(h0, h1), {"h": h1})

        def readBetweenOffsets(self, start, end):
            return self._rows(int(start["h"]), int(end["h"]))

    class TickStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "tick_stream"

        def schema(self):
            return "station_id int, hour_idx int, temp_centi int"

        def simpleStreamReader(self, schema):
            return TickStreamReader()

    spark.dataSource.register(TickStreamSource)
    ticks = spark.readStream.format("tick_stream").load()
    agg = ticks.groupBy(
        F.col("station_id").cast("long").alias("station_id")
    ).agg(
        F.count("*").alias("n_obs"),
        F.min("temp_centi").cast("long").alias("min_centi"),
        F.max("temp_centi").cast("long").alias("max_centi"),
        F.sum("temp_centi").cast("long").alias("sum_centi"),
    )
    # drain="process_all": availableNow snapshots only the FIRST
    # prefetched chunk for a simple python stream reader
    from projet_meteo_etl_spark.streaming.structured import _run_to_memory

    sink = _run_to_memory(agg, "complete", drain="process_all")
    return sink.orderBy("station_id")


PYDS_STREAM_SQL = f"""
WITH ticks AS (
  SELECT s.s AS station_id,
         (s.s * 41 + h.h * 17) % 3000 - 1500 AS temp_centi
  FROM generate_series(0, {PYDS_STREAM_STATIONS - 1}) s(s),
       generate_series(0, {PYDS_STREAM_HOURS - 1}) h(h)
)
SELECT station_id, count(*) AS n_obs,
       min(temp_centi) AS min_centi,
       max(temp_centi) AS max_centi,
       CAST(sum(temp_centi) AS BIGINT) AS sum_centi
FROM ticks GROUP BY station_id ORDER BY station_id
"""


def udtf_token_run_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs of consecutively repeated tokens per document, via a Python
    UDTF in a LATERAL join.

    One document row fans out to one row per run of length ≥ 2 — the
    generator shape (``eval`` yields many rows) that scalar UDFs and the
    reference's ``Series.apply`` lambdas (``etl_meteo.py:53-59``) cannot
    express.  Arrow-batched like a pandas UDF; the per-document work is
    a single linear scan.
    """
    harden_session(spark)

    from pyspark.sql.functions import udtf

    @udtf(returnType="tok: string, run_start: long, run_len: long")
    class TokenRuns:
        def eval(self, text: str):
            toks = (text or "").split(" ")
            i, n = 0, len(toks)
            while i < n:
                j = i
                while j < n and toks[j] == toks[i]:
                    j += 1
                if toks[i] != "" and j - i >= 2:
                    yield (toks[i], i + 1, j - i)
                i = j

    spark.udtf.register("token_runs", TokenRuns)
    view = unique_view("docs_v")
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(view)
    out = spark.sql(
        f"""
        SELECT d.doc_id, r.tok, r.run_start, r.run_len
        FROM {view} d, LATERAL token_runs(d.text) r
        ORDER BY d.doc_id, r.run_start
        """
    )
    spark.catalog.dropTempView(view)
    return out


UDTF_TOKEN_RUNS_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
), islands AS (
  SELECT doc_id, tok, i,
         i - row_number() OVER (PARTITION BY doc_id, tok ORDER BY i) AS grp
  FROM toks
  WHERE tok <> ''
)
SELECT doc_id, tok,
       CAST(min(i) AS BIGINT) AS run_start,
       CAST(count(*) AS BIGINT) AS run_len
FROM islands
GROUP BY doc_id, tok, grp
HAVING count(*) >= 2
ORDER BY doc_id, run_start
"""


def udtf_partitioned_session_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Python UDTF with a **TABLE argument** (``PARTITION BY … ORDER
    BY``) — the Spark-4 polymorphic-table-function surface
    :func:`udtf_token_run_lengths` (scalar-arg LATERAL) does not touch:
    the engine hands each UDTF instance ONE user's rows in event order,
    ``eval`` consumes them imperatively, ``terminate`` emits the
    per-partition summary.  This is the API for per-group sequential
    logic that has no window-function form; here it recomputes 30-min
    sessionization (deliberately — the built-in twins
    ``events_session_windows`` / ``session_duration_percentiles`` pin
    the semantics, so the oracle is known-good and what's under test is
    the partitioned-UDTF contract itself).

    Scale: partitions stream through instances one group at a time —
    state is O(1) per instance (prev-ts + counters), work is one linear
    scan per user, parallelism is |users| like any keyed shuffle.
    """
    harden_session(spark)

    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "user_id: long, n_sessions: long,"
            " longest_session_events: long, total_events: long"
        )
    )
    class SessionStats:  # self-contained for the gate
        def __init__(self) -> None:
            self.user = None
            self.prev = None
            self.cur = 0
            self.longest = 0
            self.sessions = 0
            self.total = 0

        def eval(self, row):
            self.user = row["user_id"]
            self.total += 1
            if self.prev is None or row["tus"] - self.prev > 1_800_000_000:
                self.sessions += 1
                self.longest = max(self.longest, self.cur)
                self.cur = 0
            self.cur += 1
            self.prev = row["tus"]

        def terminate(self):
            if self.user is not None:
                yield (
                    self.user,
                    self.sessions,
                    max(self.longest, self.cur),
                    self.total,
                )

    spark.udtf.register("session_stats_udtf", SessionStats)
    view = unique_view("events_udtf_v")
    load_table(spark, sf_dir, "events").selectExpr(
        "user_id", "unix_micros(ts) AS tus", "event_id"
    ).createOrReplaceTempView(view)
    out = spark.sql(
        f"""
        SELECT user_id, n_sessions, longest_session_events, total_events
        FROM session_stats_udtf(
            TABLE({view}) PARTITION BY user_id ORDER BY (tus, event_id))
        ORDER BY user_id
        """
    )
    spark.catalog.dropTempView(view)
    return out


UDTF_SESSION_STATS_SQL = """
WITH flagged AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
numbered AS (
  SELECT user_id,
         sum(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM flagged
),
per_sess AS (
  SELECT user_id, sid, count(*) AS n FROM numbered GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(max(n) AS BIGINT) AS longest_session_events,
       CAST(sum(n) AS BIGINT) AS total_events
FROM per_sess GROUP BY user_id ORDER BY user_id
"""


def variant_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from semi-structured event properties via the
    VARIANT type: ``parse_json`` once, ``try_variant_get`` per path.

    Columnar, JVM-side semi-structured handling — versus the
    reference's whole-file ``json.load`` into Python dicts
    (``etl_meteo.py:140-147``).  ``try_variant_get`` yields null on
    missing paths / type mismatches, mirroring the reference's
    ``.get()``-with-default row guards (``etl_meteo.py:96-106``).
    """
    e = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(
        F.parse_json(F.coalesce(F.col("props"), F.lit("null"))), "$.k", "long"
    )
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )


#: probed try_variant_get('$.k','long') semantics (round 12): JSON
#: numbers truncate (12.5→12, 1e3→1000, 2^63 →NULL), booleans→0/1,
#: arrays/objects→NULL — all matched by DuckDB's JSON→BIGINT cast —
#: but Spark ALSO accepts any parseable-integer STRING ("042"→42)
#: where DuckDB's JSON cast requires canonical number grammar, hence
#: the integer-token-guarded fallback on the extracted raw string
VARIANT_PROPS_SQL = """
SELECT event_type, count(*) AS n_events,
       count(k) AS n_with_k, min(k) AS min_k, max(k) AS max_k,
       CAST(sum(k) AS BIGINT) AS sum_k
FROM (
  SELECT event_type,
         COALESCE(
           TRY_CAST(json_extract(props, '$.k') AS BIGINT),
           TRY_CAST(CASE WHEN regexp_matches(
                           trim(json_extract_string(props, '$.k')),
                           '^[+-]?[0-9]+$')
                    THEN trim(json_extract_string(props, '$.k')) END
                    AS BIGINT)) AS k
  FROM events
)
GROUP BY event_type
ORDER BY event_type
"""


def cogroup_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join (latest purchase at-or-before each click, per
    user) via COGROUPED ``applyInPandas`` — the second physical strategy
    for the same logical op as ``asof_purchase_before_click``
    (window-over-union), sharing its oracle semantics.

    Both sides shuffle once on ``user_id``; each user's click and
    purchase groups meet in one Arrow-batched ``pandas.merge_asof``.
    At 100 TB this is the strategy when per-group logic outgrows window
    functions: state stays bounded by the largest single user, not the
    partition.
    """
    e = load_table(spark, sf_dir, "events")
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("p_value"))
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )

    def merge(key, clicks, purchases):  # self-contained for the gate
        import pandas as pd

        # ONE vectorized merge_asof per SHARD with by="user_id" — the
        # per-user asof semantics are identical (merge_asof partitions
        # by the `by` key), but Python is entered once per shard
        # instead of once per user (~1.5 K near-empty calls at sf0.1,
        # profiled as the query's dominant cost — guide §4.1 per-call
        # overhead).  merge_asof requires the on-key sorted; the `by`
        # grouping is extracted by pandas itself.
        left = clicks[["user_id", "event_id", "ts"]].sort_values(
            "ts", kind="stable"
        )
        right = (
            purchases[["user_id", "ts", "p_value"]]
            .assign(p_ts=lambda d: d["ts"])
            .sort_values("ts", kind="stable")
        )
        out = pd.merge_asof(
            left, right, on="ts", by="user_id", direction="backward",
            allow_exact_matches=True,
        )
        micros = (out["ts"] - out["p_ts"]) // pd.Timedelta(microseconds=1)
        out["micros_since_purchase"] = micros.astype("Int64")
        return out[
            ["user_id", "event_id", "ts", "p_value", "micros_since_purchase"]
        ]

    # key-group sharding (the TWS/PIT discipline): cogroup on
    # user_id % n_shards so each Python call sees a shard's users at
    # once; pre-partitioning on the shard key bounds the Python stage's
    # task count (same ≈6× wall win as the EWMA stage, timeseries.py).
    # Both constants DERIVE from the session's parallelism — 2× cores
    # worth of shards over a quarter of cores worth of tasks (floors 64
    # and 8 reproduce the round-12 A/B winners at local[32]) — so on a
    # real cluster shards rise with the executor count and per-shard
    # group bytes stay bounded by executor memory instead of being
    # pinned to the local bench's constants.
    dp = spark.sparkContext.defaultParallelism
    n_shards = max(64, 2 * dp)
    n_tasks = max(8, dp // 4)
    shard = F.pmod(F.col("user_id"), F.lit(n_shards)).alias("shard")
    out = (
        c.select(shard, "*")
        .repartition(n_tasks, "shard")
        .groupBy("shard")
        .cogroup(
            p.select(shard, "*").repartition(n_tasks, "shard").groupBy("shard")
        )
        .applyInPandas(
            merge,
            "user_id long, event_id long, ts timestamp, p_value double, "
            "micros_since_purchase long",
        )
    )
    return out.orderBy("user_id", "event_id")


COGROUP_ASOF_SQL = """
WITH p AS (
  SELECT user_id, ts, arg_max(value, event_id) AS p_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
),
c AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
)
SELECT c.user_id, c.event_id, c.ts, p.p_value,
       epoch_us(c.ts) - epoch_us(p.ts) AS micros_since_purchase
FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.user_id, c.event_id
"""


def pandas_udaf_user_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-user median purchase value via a GROUPED_AGG pandas
    UDF — the user-defined-aggregate surface (Arrow-batched, one call
    per group) the reference's scalar lambdas cannot express.

    Median is order-statistic work a single built-in can't fuse; the
    UDAF sees each user's values as one pandas Series.  Exact-median
    semantics (mean of the two middles on even counts) match DuckDB's
    ``median`` on DOUBLE bit-for-bit: same two doubles, same mean.

    Sibling surfaces: :func:`pandas_udf_scalar_hatch` is the vectorized
    SCALAR extension point (this one is the grouped-AGGREGATE contract);
    ``sql_udf_discount_bands`` is the pure-SQL function path.
    """
    harden_session(spark)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:  # self-contained for the gate
        return v.median()

    # GROUPED_AGG pandas UDFs cannot share an agg() with JVM aggregates,
    # so the count rides as a second pandas UDAF
    @pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        return len(v)

    e = load_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            count_udaf("value").alias("n_purchases"),
            median_udaf("value").alias("median_value"),
        )
        .orderBy("user_id")
    )


PANDAS_UDAF_MEDIAN_SQL = """
SELECT user_id, count(*) AS n_purchases, median(value) AS median_value
FROM events WHERE event_type = 'purchase'
GROUP BY user_id ORDER BY user_id
"""


def arrow_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 norms over the embedding corpus via ``mapInArrow`` — the
    zero-copy Arrow batch interface below pandas (no Series
    materialization), the right hop when per-batch work is columnar
    already.

    The fold accumulates left-to-right in float64 (Python floats over
    the float32 values), bit-identical to Spark's ``aggregate`` HOF and
    DuckDB's ``list_dot_product`` on ``DOUBLE[]`` — the same parity
    recipe as ``operators/similarity.cosine``; ``pround(6)`` guards the
    boundary anyway.
    """
    harden_session(spark)
    from projet_meteo_etl_spark.functions.portable import pround

    def norms(batches):  # self-contained for the gate
        import math

        import pyarrow as pa

        for b in batches:
            vec_ids = b.column("vec_id").to_pylist()
            labels = b.column("label").to_pylist()
            embs = b.column("embedding").to_pylist()
            out_norm, out_dim = [], []
            for v in embs:
                acc = 0.0
                for x in v:
                    xd = float(x)
                    acc += xd * xd
                out_norm.append(math.sqrt(acc))
                out_dim.append(len(v))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(vec_ids, pa.int64()),
                    pa.array(labels, pa.int64()),
                    pa.array(out_dim, pa.int64()),
                    pa.array(out_norm, pa.float64()),
                ],
                names=["vec_id", "label", "dim", "norm_raw"],
            )

    e = load_table(spark, sf_dir, "embeddings")
    out = e.mapInArrow(
        norms, "vec_id long, label long, dim long, norm_raw double"
    )
    return out.select(
        "vec_id", "label", "dim", pround("norm_raw", 6).alias("l2_norm")
    ).orderBy("vec_id")


ARROW_NORMS_SQL = """
SELECT vec_id, CAST(label AS BIGINT) AS label,
       CAST(len(embedding) AS BIGINT) AS dim,
       floor(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
             * 1000000.0 + 0.5) / 1000000.0 AS l2_norm
FROM embeddings ORDER BY vec_id
"""


def map_functions_showcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType API surface: ``create_map`` → ``transform_values``
    (lambda over the map) → ``explode`` to (key, value) rows — the
    side of the column API the TPC-H-style queries never touch.  The
    oracle verifies VALUES, not representation: DuckDB reproduces the
    same rows with a plain UNION ALL per key, so the check pins the
    map semantics (every key present, lambda applied) without needing
    DuckDB's MAP type to round-trip identically.
    """
    e = load_table(spark, sf_dir, "events")
    base = (
        e.orderBy("event_id")
        .limit(500)
        .select(
            "event_id",
            F.create_map(
                F.lit("type"), F.col("event_type"),
                F.lit("day"), F.to_date("ts").cast("string"),
                F.lit("band"),
                F.when(F.col("value") > 50, F.lit("hi")).otherwise(F.lit("lo")),
            ).alias("m"),
        )
        .select(
            "event_id",
            F.transform_values("m", lambda _, v: F.upper(v)).alias("m"),
        )
    )
    return (
        base.select("event_id", F.explode("m").alias("map_key", "map_value"))
        .orderBy("event_id", "map_key")
    )


MAP_SHOWCASE_SQL = """
WITH base AS (
  SELECT event_id, event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day_s,
         CASE WHEN value > 50 THEN 'hi' ELSE 'lo' END AS band
  FROM events ORDER BY event_id LIMIT 500
),
rows_ AS (
  SELECT event_id, 'type' AS map_key, upper(event_type) AS map_value FROM base
  UNION ALL
  SELECT event_id, 'day', upper(day_s) FROM base
  UNION ALL
  SELECT event_id, 'band', upper(band) FROM base
)
SELECT event_id, map_key, map_value
FROM rows_
ORDER BY event_id, map_key
"""


def pandas_udf_scalar_hatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's USER-FACING vectorized-scalar extension point,
    contract-tested end to end: a custom saturation score
    (``c·1e6 // (c + 50000)`` — a diminishing-returns engagement curve
    no single built-in expresses) is registered once through the public
    :func:`projet_meteo_etl_spark.functions.udf_hatch.register_vectorized_scalar`
    API and then invoked through BOTH routes the hatch promises — the
    returned Column callable and the SQL-registered function name —
    with ``n_sql_route_equal == n_events`` certifying the two routes
    agree row-for-row.  SURVEY §2.5 calls for exactly this surface
    ("the engine should expose a ``pandas_udf`` escape hatch for
    genuinely custom scalars"); the reference's own custom logic is
    unregistered per-cell lambdas (``/root/reference/etl_meteo.py:53-59``).

    Distinct from its two registered siblings (cross-referenced in
    their docstrings): ``sql_udf_discount_bands`` is a pure-SQL (JVM,
    codegen-able) function — the preferred path when expressible — and
    ``pandas_udaf_user_median`` is the grouped-AGGREGATE pandas
    contract.  This one is the vectorized SCALAR hatch.

    Exactness: inputs are clamped to non-negative int64 cents
    (``greatest(c, 0)``), so numpy's flooring ``//`` equals DuckDB's
    truncating ``//`` and the score is integer-exact cross-engine.
    Scale: pure Arrow-batched map work — no shuffle, no state; the
    score pipelines into the one groupBy the report needs anyway.
    """
    harden_session(spark)

    from projet_meteo_etl_spark.functions.udf_hatch import (
        register_vectorized_scalar,
    )

    def sat_score(c: pd.Series) -> pd.Series:  # self-contained for the gate
        import numpy as np
        import pandas as pd

        a = np.maximum(c.to_numpy("int64"), 0)
        return pd.Series(a * 1_000_000 // (a + 50_000))

    score = register_vectorized_scalar(
        spark, "sat_score_ppm", sat_score, "long"
    )
    e = load_table(spark, sf_dir, "events")
    cents = F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)")
    scored = e.select(
        "event_type",
        score(cents).alias("s"),
        F.expr(
            "sat_score_ppm(CAST(floor(value * 100.0 + 0.5) AS BIGINT))"
        ).alias("s_sql"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("s").alias("sum_sat_ppm"),
            F.max("s").alias("max_sat_ppm"),
            F.sum((F.col("s") == F.col("s_sql")).cast("long")).alias(
                "n_sql_route_equal"
            ),
        )
        .orderBy("event_type")
    )


PANDAS_UDF_HATCH_SQL = """
WITH s AS (
  SELECT event_type,
         greatest(CAST(floor(value * 100.0 + 0.5) AS BIGINT), 0) AS c
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(c * 1000000 // (c + 50000)) AS BIGINT) AS sum_sat_ppm,
       CAST(max(c * 1000000 // (c + 50000)) AS BIGINT) AS max_sat_ppm,
       CAST(count(*) AS BIGINT) AS n_sql_route_equal
FROM s GROUP BY event_type ORDER BY event_type
"""


SPARK_QUERIES = {
    "pyds_ticks_station_stats": pyds_ticks_station_stats,
    "pyds_stream_ticks_totals": pyds_stream_ticks_totals,
    "pandas_udf_scalar_hatch": pandas_udf_scalar_hatch,
    "udtf_partitioned_session_stats": udtf_partitioned_session_stats,
    "map_functions_showcase": map_functions_showcase,
    "udtf_token_run_lengths": udtf_token_run_lengths,
    "variant_props_extract": variant_props_extract,
    "cogroup_asof_purchase_click": cogroup_asof_purchase_click,
    "pandas_udaf_user_median": pandas_udaf_user_median,
    "arrow_vector_norms": arrow_vector_norms,
}

ORACLE_SQL = {
    "pyds_ticks_station_stats": PYDS_TICKS_SQL,
    "pyds_stream_ticks_totals": PYDS_STREAM_SQL,
    "pandas_udf_scalar_hatch": PANDAS_UDF_HATCH_SQL,
    "udtf_partitioned_session_stats": UDTF_SESSION_STATS_SQL,
    "map_functions_showcase": MAP_SHOWCASE_SQL,
    "udtf_token_run_lengths": UDTF_TOKEN_RUNS_SQL,
    "variant_props_extract": VARIANT_PROPS_SQL,
    "cogroup_asof_purchase_click": COGROUP_ASOF_SQL,
    "pandas_udaf_user_median": PANDAS_UDAF_MEDIAN_SQL,
    "arrow_vector_norms": ARROW_NORMS_SQL,
}
