"""Similarity search over embedding columns (``array<float>``).

Two paths, as any vector system at scale needs:

* **brute-force top-k** — exact cosine via JVM-side array expressions
  (``zip_with`` + ``aggregate`` fold: no UDF, no Python, codegen'd);
  the query side is broadcast so the corpus never shuffles.  This is
  the correctness baseline and is already the right *plan* at 100 TB
  when the query set is small (it's one scan of the corpus).
* **LSH-bucketed ANN** — random-hyperplane signatures (fixed seed →
  deterministic literal plane matrix), bucket equality join, top-k
  within bucket: corpus scan is replaced by a hash-partitioned join on
  bucket keys.  Approximate in recall but deterministic in output, so
  it oracle-checks end to end (planes embedded as literals in both
  engines); recall vs brute force additionally asserted in tests.

The centroid operator shows element-wise array aggregation
(``posexplode`` → per-dimension avg → re-assemble) — the building
block for IVF coarse quantizers.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.cachescope import scoped_cache
from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.functions.portable import pround

DIM = 64
N_QUERIES = 5
TOP_K = 10


def cosine(a: Column, b: Column) -> Column:
    """Exact cosine in double precision as a sequential left-fold —
    bit-identical to an equivalent sequential implementation in any
    engine (addition order fixed), which keeps oracle hashes stable."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sq = lambda v: F.aggregate(  # noqa: E731
        F.transform(v, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (F.sqrt(sq(a)) * F.sqrt(sq(b)))


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k cosine neighbors for the first N_QUERIES vectors.

    Plan shape: broadcast(queries) nested-loop against the corpus scan →
    per-query window top-k.  ONE pass over the corpus regardless of
    query count; ranking tie-broken by vec_id.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", pround(cosine(F.col("qv"), F.col("embedding")), 6))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


ANN_BRUTEFORCE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         floor((list_dot_product(q.qv::DOUBLE[], e.embedding::DOUBLE[])
               / (sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))
                  * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])))) * 1000000.0 + 0.5) / 1000000.0
           AS cosine
  FROM embeddings e, q WHERE e.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def _hyperplanes(n_planes: int = 4, dim: int = DIM, seed: int = 42) -> list[list[float]]:
    # 4 planes → 16 buckets: sized for the test corpora (~500-5000
    # vectors); at real scale raise n_planes so bucket occupancy stays
    # bounded (and multi-probe neighboring buckets for recall)
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def _bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from fixed random hyperplanes — a pure
    expression (the plane matrix is inlined as array literals), so
    bucketing happens during the scan with no shuffle and no UDF."""
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        arr = F.array(*[F.lit(v) for v in plane])
        dot = F.aggregate(
            F.zip_with(vec, arr, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(2**i)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket join (same-bucket
    candidates only), then exact cosine + window top-k.

    At 100 TB: corpus bucketed once at ingest (a partition/bucket-by
    column), query buckets computed at plan time → the join touches
    only matching buckets (plus multi-probe for recall if needed).

    Oracle-checked: the seeded plane matrix is embedded as double
    literals in BOTH the Spark plan and the DuckDB SQL (full-precision
    ``repr`` round-trip), so the approximation is deterministic and
    identical across engines; recall vs brute force additionally
    asserted in tests.
    """
    planes = _hyperplanes()
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", _bucket_expr(F.col("embedding"), planes)
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    scored = (
        e.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn("cosine", pround(cosine(F.col("qv"), F.col("embedding")), 6))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


def _plane_literal_sql(plane: list[float]) -> str:
    # repr() prints the shortest digits that round-trip the exact double,
    # so DuckDB parses back the bit-identical plane the Spark literals use
    return "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[]"


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN list_dot_product(v, {_plane_literal_sql(p)}) > 0 "
    f"THEN {2 ** i} ELSE 0 END)"
    for i, p in enumerate(_hyperplanes())
)

ANN_LSH_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         {_BUCKET_SQL} AS bucket
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv, bucket AS qbucket
      FROM b WHERE vec_id < {N_QUERIES}),
scored AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         floor((list_dot_product(q.qv, b.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(b.v, b.v)))) * 1000000.0 + 0.5) / 1000000.0
           AS cosine
  FROM b JOIN q ON b.bucket = q.qbucket AND b.vec_id <> q.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def _label_centroids_df(e: DataFrame) -> DataFrame:
    """(label, centroid array<double>) — per-label mean vector via
    posexplode → per-dimension avg → re-assembled with array_agg in
    position order.  The coarse-quantizer training step of IVF, fully
    distributed (one shuffle on (label, pos), one on label)."""
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select("label", F.col("pc.c").alias("centroid"))
    )


#: cells probed per query by the registered IVF query — interpolated
#: into ANN_IVF_SQL so function default and oracle cannot diverge
IVF_NPROBE = 2


def ann_ivf_topk(
    spark: SparkSession, sf_dir: str, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """IVF-style ANN: coarse centroids (label means) partition the
    corpus into cells; each query probes only its ``nprobe`` nearest
    cells and ranks exact cosine within them.

    All joins against the centroid table are broadcasts (k centroids ≪
    corpus); the corpus is scanned once to assign cells and once to
    score probed cells — at 100 TB the assignment is precomputed at
    ingest (a partition column), leaving one pruned scan per query
    batch.  With ``nprobe = k`` this is EXACTLY brute force (asserted
    in tests); the registered query uses nprobe=2.

    Oracle-checked: cell assignment and probe choice order by the
    cell-similarity ROUNDED to 1e-6 (``pround``, both engines) — the
    centroid means accumulate in different orders on different engines
    and differ in trailing ulps, so ordering by the raw double would
    let a borderline cell flip the cut; after rounding, ties break on
    cell id deterministically.
    """
    scored, assigned = _ivf_scored_candidates(spark, sf_dir, nprobe)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = (
        scored.select("query_id", "neighbor_id", "cosine")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )
    return scoped_cache(out, assigned)


def _ivf_scored_candidates(
    spark: SparkSession, sf_dir: str, max_nprobe: int
) -> tuple[DataFrame, DataFrame]:
    """The SHARED IVF candidate pipeline — cell assignment, probe
    choice, candidate scoring — factored so :func:`ann_ivf_topk` and
    :func:`ann_ivf_recall_curve` cannot drift apart (the curve's
    validity rests on measuring exactly the production plan; a tweak
    to rounding or tie-breaks here changes both in lockstep).

    Returns ``(scored, assigned)``: ``scored`` has one row per
    (query, candidate) within the ``max_nprobe`` nearest cells,
    carrying ``cell_rank`` (the probe rank of the candidate's cell —
    probe lists at narrower widths are prefixes of wider ones, so a
    ``cell_rank <= p`` filter reproduces nprobe=p exactly) and the
    pround-6 ``cosine``.  ``assigned`` is the persisted cell
    assignment (three consumers: query side, probe broadcast, probed-
    cell scan — unpersisted, the k-way centroid scoring re-runs each
    time, 7.7 s → ~2 s at sf0.1); callers must keep it alive via
    ``scoped_cache``.
    """
    e = load_table(spark, sf_dir, "embeddings")
    cents = _label_centroids_df(e).select(
        F.col("label").alias("cell_id"), "centroid"
    )
    # cell assignment: nearest centroid by cosine (corpus ⋈ broadcast(k))
    scored_cells = e.join(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        F.col("cell_id").alias("cell"),
        pround(cosine(F.col("embedding"), F.col("centroid")), 6).alias("csim"),
    )
    assign_w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cell"))
    assigned = (
        scored_cells.withColumn("r", F.row_number().over(assign_w))
        .filter(F.col("r") == 1)
        .select("vec_id", "embedding", "cell")
        .persist()
    )
    # query side: probe the max_nprobe nearest cells, rank attached
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.desc("qsim"), F.asc("cell"))
    probes = (
        q.join(F.broadcast(cents))
        .select(
            "query_id", "qv", F.col("cell_id").alias("cell"),
            pround(cosine(F.col("qv"), F.col("centroid")), 6).alias("qsim"),
        )
        .withColumn("cell_rank", F.row_number().over(probe_w))
        .filter(F.col("cell_rank") <= max_nprobe)
        .select("query_id", "qv", "cell", "cell_rank")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "cell_rank",
            pround(cosine(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
        )
    )
    return scored, assigned


_COS6_SQL = (
    "floor((list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
    "* sqrt(list_dot_product({b}, {b})))) * 1000000.0 + 0.5) / 1000000.0"
)

ANN_IVF_SQL = f"""
WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
per_dim AS (
  SELECT label, pos, avg(val) AS c FROM (
    SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM emb
  ) GROUP BY label, pos
),
cents AS (
  SELECT label AS cell_id, list(c ORDER BY pos) AS centroid
  FROM per_dim GROUP BY label
),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell_id AS cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_COS6_SQL.format(a='e.v', b='c.centroid')} DESC,
                      c.cell_id ASC) AS r
    FROM emb e, cents c
  ) WHERE r = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM assigned WHERE vec_id < {N_QUERIES}),
probes AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell_id AS cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_COS6_SQL.format(a='q.qv', b='c.centroid')} DESC,
                      c.cell_id ASC) AS r
    FROM q, cents c
  ) WHERE r <= {IVF_NPROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         {_COS6_SQL.format(a='p.qv', b='a.v')} AS cosine
  FROM assigned a JOIN probes p ON a.cell = p.cell AND a.vec_id <> p.query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked
WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid stats via element-wise array aggregation:
    posexplode → avg per (label, dim) → fold back to a norm.  This is
    the IVF training primitive (compute coarse centroids distributed)."""
    e = load_table(spark, sf_dir, "embeddings")
    per_dim = (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("dims"),
            pround(F.sqrt(F.sum(F.col("c") * F.col("c"))), 4).alias("centroid_norm"),
        )
        .join(
            e.groupBy("label").agg(F.count(F.lit(1)).alias("n_vectors")),
            "label",
        )
        .select("label", "n_vectors", "dims", "centroid_norm")
        .orderBy("label")
    )


EMBEDDING_CENTROIDS_SQL = """
WITH per_dim AS (
  SELECT label, pos, avg(v) AS c FROM (
    SELECT label,
           unnest(embedding::DOUBLE[]) AS v,
           generate_subscripts(embedding, 1) AS pos
    FROM embeddings
  ) GROUP BY label, pos
),
norms AS (
  SELECT label, count(*) AS dims, floor((sqrt(sum(c * c))) * 10000.0 + 0.5) / 10000.0 AS centroid_norm
  FROM per_dim GROUP BY label
),
counts AS (SELECT label, count(*) AS n_vectors FROM embeddings GROUP BY label)
SELECT n.label AS label, c.n_vectors, CAST(n.dims AS BIGINT) AS dims, n.centroid_norm
FROM norms n JOIN counts c ON n.label = c.label
ORDER BY n.label
"""


def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector symmetric int8 quantization — the compression step a
    vector store applies before ANN indexing (4× smaller than float32,
    8× smaller than the double working set).

    ``scale = max|x| / 127``; ``q_i = floor(x_i / scale + 0.5)`` (the
    portable half-up formula — see ``functions.portable``).  Every
    reported reduction is ORDER-INDEPENDENT so the oracle hash can
    never drift with partitioning: ``q_sum``/``q_min``/``q_max`` are
    exact integer folds and the reconstruction error is the *max*
    absolute element error (a max over doubles, not a float sum).
    Pure array expressions — codegen'd, zero Python, no shuffle at all
    except the final ORDER BY.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    base = e.select(
        "vec_id",
        "label",
        v.alias("v"),
        F.when(maxabs == 0, F.lit(1.0)).otherwise(maxabs / 127.0).alias("scale"),
    )
    q = F.transform(F.col("v"), lambda x: F.floor(x / F.col("scale") + 0.5))
    quant = base.select(
        "vec_id",
        "label",
        "scale",
        q.alias("q"),
        F.array_max(
            F.zip_with(
                F.col("v"),
                q,
                lambda x, qq: F.abs(x - qq * F.col("scale")),
            )
        ).alias("max_err"),
    )
    return (
        quant.select(
            "vec_id",
            "label",
            F.size("q").cast("long").alias("n_dims"),
            pround(F.col("scale"), 9).alias("scale_r"),
            F.aggregate(
                F.col("q"), F.lit(0).cast("long"), lambda acc, x: acc + x
            ).alias("q_sum"),
            F.array_min("q").cast("long").alias("q_min"),
            F.array_max("q").cast("long").alias("q_max"),
            pround(F.col("max_err"), 9).alias("max_abs_err"),
        )
        .orderBy("vec_id")
    )


EMBEDDING_INT8_SQL = """
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS m
  FROM embeddings
),
s AS (
  SELECT vec_id, label, e,
         CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS scale
  FROM v
),
q AS (
  SELECT vec_id, label, scale,
         list_transform(e, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv,
         list_max(list_transform(e, x -> abs(x - floor(x / scale + 0.5) * scale)))
           AS max_err
  FROM s
)
SELECT vec_id, label,
  CAST(len(qv) AS BIGINT) AS n_dims,
  floor(scale * 1000000000.0 + 0.5) / 1000000000.0 AS scale_r,
  CAST(list_sum(qv) AS BIGINT) AS q_sum,
  CAST(list_min(qv) AS BIGINT) AS q_min,
  CAST(list_max(qv) AS BIGINT) AS q_max,
  floor(max_err * 1000000000.0 + 0.5) / 1000000000.0 AS max_abs_err
FROM q
ORDER BY vec_id
"""


#: Matryoshka truncation prefixes evaluated against the full DIM dims
MRL_DIMS = (8, 16, 32)


def embedding_matryoshka_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation audit: for each prefix length d in
    ``MRL_DIMS``, how well cosine on the first d dimensions preserves
    the full-``DIM`` cosine over consecutive vector pairs — mean
    absolute deviation and worst case, plus the sign-agreement rate
    (the retrieval-relevant property).

    Pairs are (vec_id, vec_id+1): deterministic, corpus-sized, no
    quadratic blow-up — this is the audit you run before shipping a
    truncated index, and its cost is one self-join on adjacent ids.
    Per-pair deviations are floored to integer micros before the mean,
    so the report is engine-exact.  Truncation itself is ``slice`` on
    the stored array — no Python, no shuffle.
    """
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("pid"), F.col("embedding").alias("va"))
    b = e.select(
        (F.col("vec_id") - 1).alias("pid"), F.col("embedding").alias("vb")
    )
    pairs = a.join(b, "pid")
    full_cos = pround(cosine(F.col("va"), F.col("vb")), 6)
    rows = []
    for d in MRL_DIMS:
        tc = pround(
            cosine(F.slice("va", 1, d), F.slice("vb", 1, d)), 6
        )
        rows.append(
            F.struct(
                F.lit(d).alias("trunc_dim"),
                F.floor(F.abs(tc - full_cos) * 1_000_000)
                .cast("long")
                .alias("dev_micros"),
                (
                    (tc >= 0) == (full_cos >= 0)
                ).cast("int").alias("sign_ok"),
            )
        )
    exploded = pairs.select(
        F.explode(F.array(*rows)).alias("m")
    ).select("m.trunc_dim", "m.dev_micros", "m.sign_ok")
    return (
        exploded.groupBy("trunc_dim")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.expr("sum(dev_micros) div count(1)").alias("mean_dev_micros"),
            F.max("dev_micros").alias("max_dev_micros"),
            F.sum("sign_ok").alias("n_sign_agree"),
        )
        .orderBy("trunc_dim")
    )


def _mrl_cos_sql(a: str, b: str) -> str:
    return (
        f"(list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
    )


EMBEDDING_MRL_SQL = f"""
WITH pairs AS (
  SELECT a.vec_id AS pid, a.embedding::DOUBLE[] AS va, b.embedding::DOUBLE[] AS vb
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
),
sc AS (
  SELECT pid,
         floor({_mrl_cos_sql('va', 'vb')} * 1000000.0 + 0.5) / 1000000.0 AS fc,
         {", ".join(
            f"floor({_mrl_cos_sql(f'va[1:{d}]', f'vb[1:{d}]')} * 1000000.0 + 0.5) / 1000000.0 AS tc{d}"
            for d in MRL_DIMS)}
  FROM pairs
),
m AS (
  {" UNION ALL ".join(
    f"SELECT {d} AS trunc_dim, "
    f"CAST(floor(abs(tc{d} - fc) * 1000000.0) AS BIGINT) AS dev_micros, "
    f"CASE WHEN (tc{d} >= 0) = (fc >= 0) THEN 1 ELSE 0 END AS sign_ok FROM sc"
    for d in MRL_DIMS)}
)
SELECT trunc_dim, count(*) AS n_pairs,
       CAST(sum(dev_micros) // count(*) AS BIGINT) AS mean_dev_micros,
       max(dev_micros) AS max_dev_micros,
       CAST(sum(sign_ok) AS BIGINT) AS n_sign_agree
FROM m
GROUP BY trunc_dim
ORDER BY trunc_dim
"""


def ann_ivf_persisted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the index MATERIALIZED: build the coarse quantizer and
    cell assignment once, write them to parquet **partitioned by
    cell**, reload, and answer the probe query from the stored index —
    the build-once / query-many deployment shape, where "probe nprobe
    cells" physically becomes partition-pruned reads (only the probed
    cells' files are opened; check ``PartitionFilters`` in explain).

    Must produce exactly :func:`ann_ivf_topk`'s answer (same oracle
    SQL): persistence is an execution strategy, never a semantic
    change.  At 100 TB this is the real architecture — assignment runs
    at ingest, queries touch ``nprobe/k`` of the corpus files.
    """
    import os

    from projet_meteo_etl_spark.sources.sinks import staging_root

    e = load_table(spark, sf_dir, "embeddings")
    cents = _label_centroids_df(e).select(
        F.col("label").alias("cell_id"), "centroid"
    )
    scored_cells = e.join(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        F.col("cell_id").alias("cell"),
        pround(cosine(F.col("embedding"), F.col("centroid")), 6).alias("csim"),
    )
    assign_w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cell"))
    assigned = (
        scored_cells.withColumn("r", F.row_number().over(assign_w))
        .filter(F.col("r") == 1)
        .select("vec_id", "embedding", "cell")
    )
    root = os.path.join(staging_root(sf_dir), "ivf_index")
    assigned.write.partitionBy("cell").mode("overwrite").parquet(
        os.path.join(root, "assigned")
    )
    cents.write.mode("overwrite").parquet(os.path.join(root, "centroids"))

    # query phase: everything below reads ONLY the stored index
    idx = spark.read.parquet(os.path.join(root, "assigned"))
    cts = spark.read.parquet(os.path.join(root, "centroids"))
    q = idx.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.desc("qsim"), F.asc("cell"))
    probes = (
        q.join(F.broadcast(cts))
        .select(
            "query_id", "qv", F.col("cell_id").alias("cell"),
            pround(cosine(F.col("qv"), F.col("centroid")), 6).alias("qsim"),
        )
        .withColumn("r", F.row_number().over(probe_w))
        .filter(F.col("r") <= IVF_NPROBE)
        .select("query_id", "qv", "cell")
    )
    scored = (
        idx.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", pround(cosine(F.col("qv"), F.col("embedding")), 6))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .orderBy("query_id", "rank")
    )


#: probe widths swept by the recall curve (max < number of cells, so
#: every point is genuinely approximate)
RECALL_NPROBES = (1, 2, 4)


def ann_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k vs probe width — the tuning curve every IVF deployment
    is sized from: for each ``nprobe`` in ``RECALL_NPROBES``, the
    fraction of the exact brute-force top-``TOP_K`` neighbors the IVF
    index recovers, aggregated over the query set.

    Ground truth is the registered :func:`ann_bruteforce_topk`; the
    IVF side shares :func:`ann_ivf_topk`'s exact plan shape but runs
    it ONCE at the WIDEST probe width with each candidate's cell rank
    attached: because the probe list at nprobe=p is by construction a
    prefix of the list at any wider width (same pround-6 ordering,
    same cell-id tie-break), every narrower curve point is just a
    ``cell_rank <= p`` filter over the one scored candidate relation
    before its top-k window.  Same answers as invoking the operator
    per width, ~3× less work — one cell assignment, one candidate
    scoring pass instead of three.

    Scale: ground truth over a query SAMPLE (here N_QUERIES) is the
    standard practice — one corpus scan; the IVF evaluation scans only
    the widest probe's cells.  The joins below are on (query_id,
    neighbor_id) — tiny result relations, broadcast.
    """
    truth = ann_bruteforce_topk(spark, sf_dir).select(
        "query_id", "neighbor_id"
    )
    # the WIDEST width once through the SAME pipeline ann_ivf_topk
    # runs; persisted — every curve point re-reads this relation, not
    # the corpus
    scored, assigned = _ivf_scored_candidates(
        spark, sf_dir, max(RECALL_NPROBES)
    )
    scored = scored.persist()
    rank_w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    curves = []
    for np_ in RECALL_NPROBES:
        got = (
            scored.filter(F.col("cell_rank") <= np_)
            .withColumn("rank", F.row_number().over(rank_w))
            .filter(F.col("rank") <= TOP_K)
            .select("query_id", "neighbor_id")
        )
        hits = got.join(truth, ["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).alias("n_hits")
        )
        curves.append(
            hits.select(
                F.lit(np_).alias("nprobe"),
                F.lit(N_QUERIES * TOP_K).cast("long").alias("n_truth"),
                F.col("n_hits").cast("long").alias("n_hits"),
                pround(F.col("n_hits") / F.lit(float(N_QUERIES * TOP_K)), 6).alias(
                    "recall_at_k"
                ),
            )
        )
    out = curves[0]
    for c in curves[1:]:
        out = out.unionByName(c)
    # keep truth's scoped cache and this plan's persists alive until
    # the result is consumed (see cachescope docs)
    return scoped_cache(out.orderBy("nprobe"), truth, assigned, scored)


def _ivf_ranked_cte(np_: int, s: str) -> str:
    """CTE block computing the IVF top-k at probe width ``np_`` with
    suffix ``s`` (shares emb/cents/assigned/q with ANN_IVF_SQL)."""
    return f"""
probes{s} AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, c.cell_id AS cell,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_COS6_SQL.format(a='q.qv', b='c.centroid')} DESC,
                      c.cell_id ASC) AS r
    FROM q, cents c
  ) WHERE r <= {np_}
),
ranked{s} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY p.query_id
                              ORDER BY {_COS6_SQL.format(a='p.qv', b='a.v')} DESC,
                                       a.vec_id ASC) AS rank
    FROM assigned a JOIN probes{s} p ON a.cell = p.cell AND a.vec_id <> p.query_id
  ) WHERE rank <= {TOP_K}
)"""


ANN_IVF_RECALL_SQL = (
    f"""
WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
per_dim AS (
  SELECT label, pos, avg(val) AS c FROM (
    SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM emb
  ) GROUP BY label, pos
),
cents AS (
  SELECT label AS cell_id, list(c ORDER BY pos) AS centroid
  FROM per_dim GROUP BY label
),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell_id AS cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_COS6_SQL.format(a='e.v', b='c.centroid')} DESC,
                      c.cell_id ASC) AS r
    FROM emb e, cents c
  ) WHERE r = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM assigned WHERE vec_id < {N_QUERIES}),
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {_COS6_SQL.format(a='q.qv', b='e.v')} DESC,
                                       e.vec_id ASC) AS rank
    FROM emb e, q WHERE e.vec_id <> q.query_id
  ) WHERE rank <= {TOP_K}
),"""
    + ",".join(_ivf_ranked_cte(np_, f"_{np_}") for np_ in RECALL_NPROBES)
    + "\nUNION ALL ".join(
        f"""
SELECT {np_} AS nprobe,
       CAST({N_QUERIES * TOP_K} AS BIGINT) AS n_truth,
       CAST(count(*) AS BIGINT) AS n_hits,
       floor((count(*) * 1.0 / {N_QUERIES * TOP_K}) * 1000000.0 + 0.5) / 1000000.0
         AS recall_at_k
FROM ranked_{np_} r JOIN truth t
  ON r.query_id = t.query_id AND r.neighbor_id = t.neighbor_id
"""
        for np_ in RECALL_NPROBES
    )
    + "ORDER BY nprobe"
)


#: anchors for the metric-learning evals (bounded constants — the
#: anchor×corpus joins are |anchors|·|corpus|, never corpus², and the
#: IVF/LSH candidate paths above are the documented 100 TB scale route)
TRIPLET_ANCHORS = 100
KNN_ANCHORS = 200


def triplet_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet mining for metric learning: per anchor, the hardest
    positive (most-similar SAME-label vector) and hardest negative
    (most-similar different-label vector), with the triplet margin
    ``pos_cos − neg_cos`` and the violation flag (negative at least as
    close as the positive) — the pair-selection pass a contrastive /
    triplet-loss embedding trainer runs each epoch, and the health
    metric (violation rate) that says whether the label structure is
    learnable at all.

    The anchor matrix (bounded: ``TRIPLET_ANCHORS`` × dim) ships by
    value inside a ``mapInPandas`` closure; each corpus Arrow batch
    scores against ALL anchors through one BLAS matmul (the
    ``zip_with/aggregate`` fold is ~150× slower — see
    :func:`operators.dedup.dedup_embedding_cosine`) and emits only its
    LOCAL best positive + best negative per anchor — map-side combine
    for an argmax, so the shuffle carries ≤ 2·|anchors| rows per batch
    instead of |anchors|·|corpus|.  A final window partitioned by
    (anchor, is_pos) folds the partials; cosines round to 6 dp before
    the margin subtraction so both engines difference identical
    doubles.
    """
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    a_rows = [
        r
        for r in e.filter(F.col("vec_id") < TRIPLET_ANCHORS)
        .select("vec_id", "embedding", "label")
        .collect()
        # zero-norm guard: a vector with no direction has no cosine;
        # the oracle drops it with list_dot_product(v, v) > 0 — without
        # this, numpy NaN->int64 poisons vs DuckDB NULL (found by the
        # adversarial-fixture gate)
        if any(x != 0.0 for x in r.embedding)
    ]
    a_ids = np.array([r.vec_id for r in a_rows], dtype=np.int64)
    A = np.asarray([list(r.embedding) for r in a_rows], dtype=np.float64)
    a_lab = np.array([r.label for r in a_rows], dtype=np.int32)
    na = np.sqrt((A * A).sum(axis=1))

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            lab = pdf["label"].to_numpy(dtype=np.int32)
            B = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            nb = np.sqrt((B * B).sum(axis=1))
            live = nb > 0.0  # zero-norm guard, mirrors the oracle
            if not live.all():
                ids, lab, B, nb = ids[live], lab[live], B[live], nb[live]
                if len(ids) == 0:
                    continue
            # dot / (nb * na): same operation order as the oracle SQL
            S = (B @ A.T) / np.outer(nb, na)
            Sr = np.floor(S * 1e6 + 0.5) / 1e6
            Sr[ids[:, None] == a_ids[None, :]] = -np.inf  # self-pairs out
            pos = lab[:, None] == a_lab[None, :]
            rows: list[tuple] = []
            for j in range(len(a_ids)):
                col = Sr[:, j]
                for is_pos, m in ((1, pos[:, j]), (0, ~pos[:, j])):
                    cand = np.flatnonzero(m & np.isfinite(col))
                    if len(cand) == 0:
                        continue
                    i = cand[np.lexsort((ids[cand], -col[cand]))[0]]
                    rows.append(
                        (
                            int(a_ids[j]),
                            int(a_lab[j]),
                            int(ids[i]),
                            float(col[i]),
                            is_pos,
                        )
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "anchor_id", "a_label", "vec_id", "cosine", "is_pos",
                    ],
                )

    scored = e.select("vec_id", "label", "embedding").mapInPandas(
        score,
        "anchor_id bigint, a_label int, vec_id bigint, cosine double, "
        "is_pos int",
    )
    w = Window.partitionBy("anchor_id", "is_pos").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    best = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") == 1
    )
    pos_c = F.max(F.when(F.col("is_pos") == 1, F.col("cosine")))
    neg_c = F.max(F.when(F.col("is_pos") == 0, F.col("cosine")))
    return (
        best.groupBy("anchor_id", F.col("a_label").alias("label"))
        .agg(
            F.max(F.when(F.col("is_pos") == 1, F.col("vec_id")))
            .cast("long")
            .alias("pos_id"),
            pos_c.alias("pos_cos"),
            F.max(F.when(F.col("is_pos") == 0, F.col("vec_id")))
            .cast("long")
            .alias("neg_id"),
            neg_c.alias("neg_cos"),
            pround(pos_c - neg_c, 6).alias("margin"),
            (pos_c <= neg_c).alias("violated"),
        )
        .orderBy("anchor_id")
    )


TRIPLET_SQL = f"""
WITH a AS (
  SELECT vec_id AS anchor_id, embedding AS av, label AS a_label
  FROM embeddings WHERE vec_id < {TRIPLET_ANCHORS}
    AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0  -- zero-norm guard
),
scored AS (
  SELECT a.anchor_id, a.a_label, e.vec_id, e.label,
         floor((list_dot_product(a.av::DOUBLE[], e.embedding::DOUBLE[])
               / (sqrt(list_dot_product(a.av::DOUBLE[], a.av::DOUBLE[]))
                  * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))))
               * 1000000.0 + 0.5) / 1000000.0 AS cosine,
         CASE WHEN e.label = a.a_label THEN 1 ELSE 0 END AS is_pos
  FROM embeddings e, a WHERE e.vec_id <> a.anchor_id AND
    list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) > 0
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY anchor_id, is_pos
                               ORDER BY cosine DESC, vec_id ASC) AS rn
  FROM scored
)
SELECT anchor_id, a_label AS label,
       CAST(max(CASE WHEN is_pos = 1 THEN vec_id END) AS BIGINT) AS pos_id,
       max(CASE WHEN is_pos = 1 THEN cosine END) AS pos_cos,
       CAST(max(CASE WHEN is_pos = 0 THEN vec_id END) AS BIGINT) AS neg_id,
       max(CASE WHEN is_pos = 0 THEN cosine END) AS neg_cos,
       floor((max(CASE WHEN is_pos = 1 THEN cosine END)
              - max(CASE WHEN is_pos = 0 THEN cosine END)) * 1000000.0 + 0.5)
         / 1000000.0 AS margin,
       max(CASE WHEN is_pos = 1 THEN cosine END)
         <= max(CASE WHEN is_pos = 0 THEN cosine END) AS violated
FROM best WHERE rn = 1
GROUP BY anchor_id, a_label
ORDER BY anchor_id
"""


def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification eval of the embedding space: each anchor's
    label is predicted by majority vote of its ``TOP_K`` exact-cosine
    neighbors (ties: higher count, then smaller label); the report is
    per-label anchor count, correct count, and accuracy — the
    leave-one-out probe that tells a curation pipeline whether its
    embedding column is strong enough to drive semantic dedup or
    clustering decisions.

    Anchor set bounded at ``KNN_ANCHORS`` (|anchors|·|corpus| work, one
    corpus scan).  The anchor matrix ships by value in a ``mapInPandas``
    closure; each corpus Arrow batch scores against all anchors via one
    BLAS matmul and emits only its LOCAL top-``TOP_K`` per anchor —
    top-k is a monoid, so the global window over the partials is exact
    while the shuffle carries |anchors|·k rows per batch instead of
    |anchors|·|corpus| (both the constant-factor and the
    shuffle-volume fix; the interpreted ``zip_with/aggregate`` fold was
    the whole 8 s cost at sf0.1).  Vote + argmax are two small windows
    over anchors×labels.
    """
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    a_rows = [
        r
        for r in e.filter(F.col("vec_id") < KNN_ANCHORS)
        .select("vec_id", "embedding", "label")
        .collect()
        # zero-norm guard: a vector with no direction has no cosine;
        # the oracle drops it with list_dot_product(v, v) > 0 — without
        # this, numpy NaN->int64 poisons vs DuckDB NULL (found by the
        # adversarial-fixture gate)
        if any(x != 0.0 for x in r.embedding)
    ]
    a_ids = np.array([r.vec_id for r in a_rows], dtype=np.int64)
    A = np.asarray([list(r.embedding) for r in a_rows], dtype=np.float64)
    a_lab = np.array([r.label for r in a_rows], dtype=np.int32)
    na = np.sqrt((A * A).sum(axis=1))
    k = TOP_K

    def score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            lab = pdf["label"].to_numpy(dtype=np.int32)
            B = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            nb = np.sqrt((B * B).sum(axis=1))
            live = nb > 0.0  # zero-norm guard, mirrors the oracle
            if not live.all():
                ids, lab, B, nb = ids[live], lab[live], B[live], nb[live]
                if len(ids) == 0:
                    continue
            # dot / (nb * na): same operation order as the oracle SQL
            S = (B @ A.T) / np.outer(nb, na)
            Sr = np.floor(S * 1e6 + 0.5) / 1e6
            Sr[ids[:, None] == a_ids[None, :]] = -np.inf  # self-pairs out
            outs = []
            for j in range(len(a_ids)):
                col = Sr[:, j]
                order = np.lexsort((ids, -col))[: min(k, len(ids))]
                keep = order[np.isfinite(col[order])]
                if len(keep) == 0:
                    continue
                outs.append(
                    pd.DataFrame(
                        {
                            "anchor_id": np.full(
                                len(keep), a_ids[j], dtype=np.int64
                            ),
                            "a_label": np.full(
                                len(keep), a_lab[j], dtype=np.int32
                            ),
                            "vec_id": ids[keep],
                            "label": lab[keep],
                            "cosine": col[keep],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    scored = e.select("vec_id", "label", "embedding").mapInPandas(
        score,
        "anchor_id bigint, a_label int, vec_id bigint, label int, "
        "cosine double",
    )
    wk = Window.partitionBy("anchor_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    topk = scored.withColumn("rn", F.row_number().over(wk)).filter(
        F.col("rn") <= TOP_K
    )
    votes = topk.groupBy("anchor_id", "a_label", "label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    wv = Window.partitionBy("anchor_id").orderBy(
        F.desc("n_votes"), F.asc("label")
    )
    pred = votes.withColumn("rn", F.row_number().over(wv)).filter(
        F.col("rn") == 1
    )
    return (
        pred.groupBy(F.col("a_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_anchors"),
            F.sum((F.col("label") == F.col("a_label")).cast("int"))
            .cast("long")
            .alias("n_correct"),
            pround(
                F.sum((F.col("label") == F.col("a_label")).cast("int"))
                / F.count(F.lit(1)),
                6,
            ).alias("accuracy"),
        )
        .orderBy("label")
    )


KNN_ACCURACY_SQL = f"""
WITH a AS (
  SELECT vec_id AS anchor_id, embedding AS av, label AS a_label
  FROM embeddings WHERE vec_id < {KNN_ANCHORS}
    AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0  -- zero-norm guard
),
scored AS (
  SELECT a.anchor_id, a.a_label, e.vec_id, e.label,
         floor((list_dot_product(a.av::DOUBLE[], e.embedding::DOUBLE[])
               / (sqrt(list_dot_product(a.av::DOUBLE[], a.av::DOUBLE[]))
                  * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))))
               * 1000000.0 + 0.5) / 1000000.0 AS cosine
  FROM embeddings e, a WHERE e.vec_id <> a.anchor_id AND
    list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) > 0
),
topk AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY anchor_id
                                 ORDER BY cosine DESC, vec_id ASC) AS rn
    FROM scored
  ) WHERE rn <= {TOP_K}
),
votes AS (
  SELECT anchor_id, a_label, label, count(*) AS n_votes
  FROM topk GROUP BY anchor_id, a_label, label
),
pred AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY anchor_id
                                 ORDER BY n_votes DESC, label ASC) AS rn
    FROM votes
  ) WHERE rn = 1
)
SELECT a_label AS label,
       CAST(count(*) AS BIGINT) AS n_anchors,
       CAST(sum(CASE WHEN label = a_label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       floor((sum(CASE WHEN label = a_label THEN 1 ELSE 0 END) * 1.0
              / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS accuracy
FROM pred
GROUP BY a_label
ORDER BY label
"""


#: MMR re-ranking: pool size, picks, and λ = MMR_LAM/10 relevance weight
MMR_POOL = 20
MMR_K = 5
MMR_LAM = 7


def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein
    1998): per anchor, greedily pick ``MMR_K`` results from its
    top-``MMR_POOL`` relevance pool, each pick maximizing
    ``λ·rel − (1−λ)·max_sim_to_already_picked`` — the diversity pass a
    RAG retriever runs so five near-duplicate passages don't fill the
    context window.

    The greedy loop is unrolled relationally (the same static-unroll
    discipline as the BPE trainer and k-core peel): cosines quantize to
    integer micros once, so every round's argmax is an exact integer
    comparison (``MMR_LAM·rel_i − (10−MMR_LAM)·maxsim_i``), ties by
    vec_id — bit-identical in DuckDB's unrolled CTEs.  Pool and
    pool-pair relations are |anchors|·pool and |anchors|·pool² rows —
    candidate-bounded, never corpus-bounded; each round joins the tiny
    cumulative pick set back, so the corpus is scanned exactly once.
    """
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    a_rows = [
        r
        for r in e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
        # zero-norm guard — see knn_label_accuracy
        if any(x != 0.0 for x in r.embedding)
    ]
    a_ids = np.array([r.vec_id for r in a_rows], dtype=np.int64)
    A = np.asarray([list(r.embedding) for r in a_rows], dtype=np.float64)
    na = np.sqrt((A * A).sum(axis=1))
    pool_k = MMR_POOL

    # pool selection = exact top-POOL per anchor over the corpus: one
    # BLAS matmul per Arrow batch + LOCAL top-POOL partials (top-k is a
    # monoid), so the shuffle is |anchors|·pool per batch and the
    # corpus never pays the interpreted per-element cosine fold — the
    # same rewrite as knn_label_accuracy; embeddings pass through
    # untouched (float32) for the pool-pair similarity stage.
    def pool_score(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            B = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            nb = np.sqrt((B * B).sum(axis=1))
            live = nb > 0.0  # zero-norm guard, mirrors the oracle
            if not live.all():
                ids, B, nb = ids[live], B[live], nb[live]
                pdf = pdf[live]
                if len(ids) == 0:
                    continue
            # dot / (nb * na): same operation order as the oracle SQL
            S = (B @ A.T) / np.outer(nb, na)
            Ri = np.floor(S * 1e6 + 0.5).astype(np.int64)
            outs = []
            for j in range(len(a_ids)):
                col = Ri[:, j]
                cand = np.flatnonzero(ids != a_ids[j])
                order = cand[np.lexsort((ids[cand], -col[cand]))]
                order = order[: min(pool_k, len(order))]
                if len(order) == 0:
                    continue
                outs.append(
                    pd.DataFrame(
                        {
                            "anchor_id": np.full(
                                len(order), a_ids[j], dtype=np.int64
                            ),
                            "vec_id": ids[order],
                            "rel_i": col[order],
                            "embedding": pdf["embedding"].iloc[order].to_list(),
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    partials = e.select("vec_id", "embedding").mapInPandas(
        pool_score,
        "anchor_id bigint, vec_id bigint, rel_i bigint, "
        "embedding array<float>",
    )
    wp = Window.partitionBy("anchor_id").orderBy(
        F.desc("rel_i"), F.asc("vec_id")
    )
    pool = (
        partials.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= MMR_POOL)
        .select("anchor_id", "vec_id", "rel_i", "embedding")
        .persist()
    )
    pa, pb = pool.alias("pa"), pool.alias("pb")
    sim_i = F.floor(
        cosine(F.col("pa.embedding"), F.col("pb.embedding")) * 1e6 + 0.5
    ).cast("long")
    pairs = (
        pa.join(
            pb,
            (F.col("pa.anchor_id") == F.col("pb.anchor_id"))
            & (F.col("pa.vec_id") != F.col("pb.vec_id")),
        )
        .select(
            F.col("pa.anchor_id").alias("anchor_id"),
            F.col("pa.vec_id").alias("a_vec"),
            F.col("pb.vec_id").alias("b_vec"),
            sim_i.alias("sim_i"),
        )
        .persist()
    )
    lam, mu = MMR_LAM, 10 - MMR_LAM
    w1 = Window.partitionBy("anchor_id").orderBy(
        F.desc("rel_i"), F.asc("vec_id")
    )
    picked = (
        pool.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") == 1)
        .select(
            "anchor_id",
            "vec_id",
            "rel_i",
            F.lit(1).alias("pick"),
            (F.col("rel_i") * lam).alias("mmr_i"),
        )
    )
    for r in range(2, MMR_K + 1):
        sel = picked.select("anchor_id", "vec_id")
        maxsim = (
            pairs.join(
                F.broadcast(sel.withColumnRenamed("vec_id", "b_vec")),
                ["anchor_id", "b_vec"],
            )
            .groupBy("anchor_id", "a_vec")
            .agg(F.max("sim_i").alias("ms_i"))
        )
        cand = pool.join(F.broadcast(sel), ["anchor_id", "vec_id"], "left_anti")
        nxt = (
            cand.join(
                maxsim,
                (cand.anchor_id == maxsim.anchor_id)
                & (cand.vec_id == maxsim.a_vec),
            )
            .select(
                cand.anchor_id,
                cand.vec_id,
                cand.rel_i,
                (F.col("rel_i") * lam - F.col("ms_i") * mu).alias("mmr_i"),
            )
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("anchor_id").orderBy(
                        F.desc("mmr_i"), F.asc("vec_id")
                    )
                ),
            )
            .filter(F.col("rn") == 1)
            .select(
                "anchor_id", "vec_id", "rel_i", F.lit(r).alias("pick"), "mmr_i"
            )
        )
        # truncate the round-over-round lineage (the k-core lesson):
        # every broadcast of the cumulative pick set would otherwise
        # re-plan and re-run all prior rounds
        picked = picked.unionByName(nxt).localCheckpoint()
    out = picked.select(
        "anchor_id",
        F.col("pick").cast("int").alias("pick"),
        "vec_id",
        pround(F.col("rel_i") / 1e6, 6).alias("relevance"),
        F.col("mmr_i").cast("long").alias("mmr_score_dmicro"),
    ).orderBy("anchor_id", "pick")
    return scoped_cache(out, pool, pairs)


def _mmr_round_sql(r: int) -> str:
    lam, mu = MMR_LAM, 10 - MMR_LAM
    return f"""
m{r} AS (
  SELECT p.anchor_id, p.a_vec, max(p.sim_i) AS ms_i
  FROM pairs p JOIN c{r - 1} s
    ON s.anchor_id = p.anchor_id AND s.vec_id = p.b_vec
  GROUP BY p.anchor_id, p.a_vec
),
s{r} AS (
  SELECT anchor_id, vec_id, rel_i, {r} AS pick, mmr_i FROM (
    SELECT q.anchor_id, q.vec_id, q.rel_i,
           q.rel_i * {lam} - m{r}.ms_i * {mu} AS mmr_i,
           row_number() OVER (PARTITION BY q.anchor_id
                              ORDER BY q.rel_i * {lam} - m{r}.ms_i * {mu} DESC,
                                       q.vec_id ASC) AS rn
    FROM pool q
    JOIN m{r} ON m{r}.anchor_id = q.anchor_id AND m{r}.a_vec = q.vec_id
    WHERE NOT EXISTS (SELECT 1 FROM c{r - 1} s
                      WHERE s.anchor_id = q.anchor_id
                        AND s.vec_id = q.vec_id)
  ) WHERE rn = 1
),
c{r} AS (SELECT * FROM c{r - 1} UNION ALL SELECT * FROM s{r})"""


MMR_SQL = (
    f"""
WITH a AS (
  SELECT vec_id AS anchor_id, embedding AS av FROM embeddings
  WHERE vec_id < {N_QUERIES}
    AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0  -- zero-norm guard
),
scored AS (
  SELECT a.anchor_id, e.vec_id, e.embedding,
         CAST(floor((list_dot_product(a.av::DOUBLE[], e.embedding::DOUBLE[])
               / (sqrt(list_dot_product(a.av::DOUBLE[], a.av::DOUBLE[]))
                  * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))))
               * 1000000.0 + 0.5) AS BIGINT) AS rel_i
  FROM embeddings e, a WHERE e.vec_id <> a.anchor_id AND
    list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]) > 0
),
pool AS (
  SELECT anchor_id, vec_id, rel_i, embedding FROM (
    SELECT *, row_number() OVER (PARTITION BY anchor_id
                                 ORDER BY rel_i DESC, vec_id ASC) AS rn
    FROM scored
  ) WHERE rn <= {MMR_POOL}
),
pairs AS (
  SELECT pa.anchor_id, pa.vec_id AS a_vec, pb.vec_id AS b_vec,
         CAST(floor((list_dot_product(pa.embedding::DOUBLE[], pb.embedding::DOUBLE[])
               / (sqrt(list_dot_product(pa.embedding::DOUBLE[], pa.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(pb.embedding::DOUBLE[], pb.embedding::DOUBLE[]))))
               * 1000000.0 + 0.5) AS BIGINT) AS sim_i
  FROM pool pa JOIN pool pb
    ON pa.anchor_id = pb.anchor_id AND pa.vec_id <> pb.vec_id
),
s1 AS (
  SELECT anchor_id, vec_id, rel_i, 1 AS pick, rel_i * {MMR_LAM} AS mmr_i
  FROM (
    SELECT *, row_number() OVER (PARTITION BY anchor_id
                                 ORDER BY rel_i DESC, vec_id ASC) AS rn
    FROM pool
  ) WHERE rn = 1
),
c1 AS (SELECT * FROM s1),"""
    + ",".join(_mmr_round_sql(r) for r in range(2, MMR_K + 1))
    + f"""
SELECT anchor_id, CAST(pick AS INTEGER) AS pick, vec_id,
       floor((rel_i / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS relevance,
       CAST(mmr_i AS BIGINT) AS mmr_score_dmicro
FROM c{MMR_K}
ORDER BY anchor_id, pick
"""
)


def ann_ivfpq_topk(
    spark: SparkSession, sf_dir: str, nprobe: int = IVF_NPROBE
) -> DataFrame:
    """IVF-PQ: the two halves of the production vector index composed —
    IVF coarse cells prune WHICH candidates are scanned (probe the
    ``nprobe`` nearest cells only), PQ asymmetric distance prunes WHAT
    is read per candidate (4-bit codes + a broadcast distance table,
    no float vector per candidate).  At 100 TB the cell assignment is a
    partition column written at ingest and the codes are the only
    per-vector bytes the search reads — this is the Faiss/Milvus
    architecture expressed as a Spark plan.

    Codebook is trained globally (classic IVF-PQ encodes residuals per
    cell; the residual refinement changes only ``_pq_subs``'s input —
    subtract the assigned centroid first).  Everything stays
    oracle-exact: cell choice by 6-dp-rounded cosine (ties → cell id),
    ADC cells floored to integer micros once, candidate ranking an
    exact integer sum, ties → vec_id.
    """
    from projet_meteo_etl_spark.operators.clustering import (
        _pq_assign,
        _pq_codebook,
        _pq_subs,
    )

    e = load_table(spark, sf_dir, "embeddings")
    cents = _label_centroids_df(e).select(
        F.col("label").alias("cell_id"), "centroid"
    )
    # corpus cell assignment (IVF): broadcast(k centroids), no shuffle
    scored_cells = e.join(F.broadcast(cents)).select(
        "vec_id",
        F.col("cell_id").alias("cell"),
        pround(cosine(F.col("embedding"), F.col("centroid")), 6).alias("csim"),
    )
    assign_w = Window.partitionBy("vec_id").orderBy(
        F.desc("csim"), F.asc("cell")
    )
    assigned = (
        scored_cells.withColumn("r", F.row_number().over(assign_w))
        .filter(F.col("r") == 1)
        .select("vec_id", "cell")
    )
    # PQ side: global codebook + corpus codes (shared helpers with
    # pq_codebook_audit / ann_pq_adc_topk)
    subs = _pq_subs(spark, sf_dir).persist()
    cb = _pq_codebook(subs).persist()
    codes = _pq_assign(subs, cb).select("vec_id", "s", "cid")
    # query side: probe the nprobe nearest cells on the FULL vector
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc("qsim"), F.asc("cell")
    )
    probes = (
        q.join(F.broadcast(cents))
        .select(
            "query_id",
            F.col("cell_id").alias("cell"),
            pround(cosine(F.col("qv"), F.col("centroid")), 6).alias("qsim"),
        )
        .withColumn("r", F.row_number().over(probe_w))
        .filter(F.col("r") <= nprobe)
        .select("query_id", "cell")
    )
    # per-query distance table over the codebook (|q|·M_SUB·K_PQ cells)
    dm = F.floor(
        (
            F.col("qvv")
            - F.lit(2.0)
            * F.aggregate(
                F.zip_with(
                    "qsv", "c", lambda x, y: x.cast("double") * y.cast("double")
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            + F.aggregate(
                F.zip_with(
                    "c", "c", lambda x, y: x.cast("double") * y.cast("double")
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    qsubs = subs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        "s",
        F.col("v").alias("qsv"),
        F.col("vv").alias("qvv"),
    )
    dt = qsubs.join(cb, "s").select("query_id", "s", "cid", dm.alias("dm"))
    # candidates = probed cells only; ADC = sum of table lookups
    cand = assigned.join(F.broadcast(probes), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    adc = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(dt), ["query_id", "s", "cid"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("dm").alias("adc_micros"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_micros"), F.asc("vec_id")
    )
    out = (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id", "rank", F.col("vec_id").alias("neighbor_id"),
            "adc_micros",
        )
        .orderBy("query_id", "rank")
    )
    return scoped_cache(out, subs, cb)


def _ann_ivfpq_sql() -> str:
    from projet_meteo_etl_spark.operators.clustering import (
        K_PQ,
        M_SUB,
        SUBDIM,
    )

    cos_vc = _COS6_SQL.format(a="emb.v", b="cents.centroid")
    cos_qc = _COS6_SQL.format(a="q.qv", b="cents.centroid")
    return f"""
WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
cdim AS (
  SELECT label, pos, avg(val) AS c FROM (
    SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM emb
  ) GROUP BY label, pos
),
cents AS (
  SELECT label AS cell_id, list(c ORDER BY pos) AS centroid
  FROM cdim GROUP BY label
),
acell AS (
  SELECT vec_id, cell FROM (
    SELECT emb.vec_id, cents.cell_id AS cell,
           row_number() OVER (PARTITION BY emb.vec_id
                              ORDER BY {cos_vc} DESC, cents.cell_id ASC) AS r
    FROM emb, cents
  ) WHERE r = 1
),
pq_subs AS (
  SELECT vec_id, CAST(s AS INTEGER) AS s,
         v[s * {SUBDIM} + 1 : s * {SUBDIM} + {SUBDIM}] AS sv
  FROM emb, LATERAL (SELECT unnest(generate_series(0, {M_SUB} - 1)) AS s)
),
pq_vecs AS (
  SELECT vec_id, s, sv,
         list_transform(sv, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS m,
         list_dot_product(sv, sv) AS vv
  FROM pq_subs
),
pq_init AS (SELECT CAST(vec_id AS INTEGER) AS cid, s, sv AS c
            FROM pq_vecs WHERE vec_id < {K_PQ}),
pq_a1 AS (
  SELECT * FROM (
    SELECT pq_vecs.vec_id, pq_vecs.s, pq_vecs.m, pq_init.cid,
           row_number() OVER (PARTITION BY pq_vecs.vec_id, pq_vecs.s ORDER BY
             vv - 2.0 * list_dot_product(pq_vecs.sv, pq_init.c)
                + list_dot_product(pq_init.c, pq_init.c) ASC,
             pq_init.cid ASC) AS rn
    FROM pq_vecs JOIN pq_init ON pq_init.s = pq_vecs.s
  ) WHERE rn = 1
),
pq_dim AS (
  SELECT s, cid, pos, sum(mv) AS sm, count(*) AS n FROM (
    SELECT s, cid, unnest(m) AS mv, generate_subscripts(m, 1) AS pos FROM pq_a1
  ) GROUP BY s, cid, pos
),
pq_cb AS (
  SELECT s, cid, list(CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
                      ORDER BY pos) AS c
  FROM pq_dim GROUP BY s, cid
),
codes AS (
  SELECT vec_id, s, cid FROM (
    SELECT pq_vecs.vec_id, pq_vecs.s, pq_cb.cid,
           row_number() OVER (PARTITION BY pq_vecs.vec_id, pq_vecs.s ORDER BY
             vv - 2.0 * list_dot_product(pq_vecs.sv, pq_cb.c)
                + list_dot_product(pq_cb.c, pq_cb.c) ASC,
             pq_cb.cid ASC) AS rn
    FROM pq_vecs JOIN pq_cb ON pq_cb.s = pq_vecs.s
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < {N_QUERIES}),
probes AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, cents.cell_id AS cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {cos_qc} DESC, cents.cell_id ASC) AS r
    FROM q, cents
  ) WHERE r <= {IVF_NPROBE}
),
dt AS (
  SELECT qs.vec_id AS query_id, qs.s, pq_cb.cid,
         CAST(floor((qs.vv - 2.0 * list_dot_product(qs.sv, pq_cb.c)
                     + list_dot_product(pq_cb.c, pq_cb.c)) * 1000000.0 + 0.5)
              AS BIGINT) AS dm
  FROM pq_vecs qs JOIN pq_cb ON pq_cb.s = qs.s
  WHERE qs.vec_id < {N_QUERIES}
),
cand AS (
  SELECT p.query_id, a.vec_id
  FROM acell a JOIN probes p ON a.cell = p.cell
  WHERE a.vec_id <> p.query_id
),
adc AS (
  SELECT c.query_id, c.vec_id, sum(dt.dm) AS adc_micros
  FROM cand c
  JOIN codes k ON k.vec_id = c.vec_id
  JOIN dt ON dt.query_id = c.query_id AND dt.s = k.s AND dt.cid = k.cid
  GROUP BY c.query_id, c.vec_id
)
SELECT query_id, rank, neighbor_id, adc_micros FROM (
  SELECT query_id, vec_id AS neighbor_id,
         CAST(adc_micros AS BIGINT) AS adc_micros,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY adc_micros ASC, vec_id ASC)
              AS BIGINT) AS rank
  FROM adc
) WHERE rank <= {TOP_K}
ORDER BY query_id, rank
"""


#: JL probe shape: anchor count (pairs = n(n−1)/2) and target dims
JL_ANCHORS = 20
JL_K = 16


def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss distance-preservation audit: project the
    anchor embeddings from ``DIM``=64 to ``JL_K``=16 dims with a
    deterministic ±1 sign matrix (md5-parity of ``"d:j"`` — the same
    hash both engines own), then report per anchor-pair the ratio of
    the projected squared distance to its expectation
    (``q2·(DIM/JL_K)/d2`` in ppm).  This is the measurement a team runs
    before adopting a random-projection index tier (cheaper ANN, LSH
    seeding, PQ pre-rotation): how much pairwise geometry does the
    sketch keep?

    Exactness: component deltas are quantized to integer micro-units
    FIRST (``floor((a−b)·1e6 + 0.5)`` on exactly-widened float32→double
    values), so every projection / distance sum is an order-independent
    integer sum; the one ratio is a widened integer DIV.  Scale: the
    anchor set is fixed (190 pairs — broadcast), the sign matrix is
    DIM×JL_K=1024 literal-generated rows (broadcast); the same plan
    over a corpus-wide audit replaces the anchor cross join with an
    LSH-candidate pair list, the per-pair work unchanged.
    """
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < JL_ANCHORS
    )
    a = e.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    pairs = F.broadcast(a).join(
        F.broadcast(b), F.col("va") < F.col("vb")
    )
    wexp = pairs.select(
        "va",
        "vb",
        F.posexplode(
            F.zip_with(
                "ea",
                "eb",
                lambda x, y: F.floor(
                    (x.cast("double") - y.cast("double")) * 1_000_000.0
                    + F.lit(0.5)
                ).cast("long"),
            )
        ).alias("d", "w"),
    ).persist()  # two consumers: the projection and the exact distance
    signs = (
        spark.range(DIM)
        .select(F.col("id").alias("d"))
        .crossJoin(spark.range(JL_K).select(F.col("id").alias("j")))
        .select(
            "d",
            "j",
            F.expr(
                "CASE WHEN ascii(substr(md5(concat(CAST(d AS STRING),"
                " ':', CAST(j AS STRING))), 1, 1)) % 2 = 0"
                " THEN 1 ELSE -1 END"
            ).alias("s"),
        )
    )
    proj = (
        wexp.join(F.broadcast(signs), "d")
        .groupBy("va", "vb", "j")
        .agg(F.sum(F.col("s") * F.col("w")).alias("pj"))
    )
    q2 = proj.groupBy("va", "vb").agg(
        F.sum(F.col("pj") * F.col("pj")).alias("q2")
    )
    d2 = wexp.groupBy("va", "vb").agg(
        F.sum(F.col("w") * F.col("w")).alias("d2")
    )
    out = (
        q2.join(d2, ["va", "vb"])
        .select(
            "va",
            "vb",
            "d2",
            "q2",
            F.expr(
                "CAST(CASE WHEN d2 = 0 THEN 1000000"
                f" ELSE CAST(q2 AS DECIMAL(38,0)) * {DIM // JL_K} * 1000000"
                " DIV d2 END AS BIGINT)"
            ).alias("distortion_ppm"),
        )
        .orderBy("va", "vb")
    )
    return scoped_cache(out, wexp)


JL_DISTORTION_SQL = f"""
WITH anch AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < {JL_ANCHORS}
),
pairs AS (
  SELECT a1.vec_id AS va, a2.vec_id AS vb,
         a1.embedding AS ea, a2.embedding AS eb
  FROM anch a1 JOIN anch a2 ON a1.vec_id < a2.vec_id
),
wexp AS (
  SELECT va, vb, g.d - 1 AS d,
         CAST(floor((CAST(ea[g.d] AS DOUBLE) - CAST(eb[g.d] AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS w
  FROM pairs, generate_series(1, {DIM}) AS g(d)
),
signs AS (
  SELECT dd.d, jj.j,
         CASE WHEN ascii(substr(md5(dd.d || ':' || jj.j), 1, 1)) % 2 = 0
              THEN 1 ELSE -1 END AS s
  FROM generate_series(0, {DIM - 1}) dd(d),
       generate_series(0, {JL_K - 1}) jj(j)
),
proj AS (
  SELECT w.va, w.vb, s.j, CAST(sum(s.s * w.w) AS BIGINT) AS pj
  FROM wexp w JOIN signs s USING (d)
  GROUP BY 1, 2, 3
),
q2t AS (
  SELECT va, vb, CAST(sum(pj * pj) AS BIGINT) AS q2
  FROM proj GROUP BY 1, 2
),
d2t AS (
  SELECT va, vb, CAST(sum(w * w) AS BIGINT) AS d2
  FROM wexp GROUP BY 1, 2
)
SELECT va, vb, d2, q2,
       CAST(CASE WHEN d2 = 0 THEN 1000000
            ELSE q2::HUGEINT * {DIM // JL_K} * 1000000 // d2
            END AS BIGINT) AS distortion_ppm
FROM q2t JOIN d2t USING (va, vb)
ORDER BY va, vb
"""



# ----------------- incremental embedding dedup vs a persisted index

#: deterministic "new arrivals" split for incremental embedding dedup
EMB_INC_BATCH_MOD = 10
#: near-dup cosine threshold (matches dedup_embedding_cosine's regime;
#: non-trivial cross-split pairs at every fixture SF)
EMB_INC_THRESHOLD = 0.3


def dedup_embedding_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental EMBEDDING near-dup: probe a persisted IVF index with
    the new batch only, emitting new-vs-corpus cosine pairs — the
    embedding twin of ``dedup_minhash_incremental``, and how semantic
    ingestion dedup runs at 100 TB (never re-embed or re-index the
    corpus per batch; SemDeDup-style pipelines check arrivals against
    the standing index).

    Index build (once here; ingest-amortized in a deployment — the
    ``ann_ivf_persisted_index`` contract): corpus-only coarse centroids
    (label means), nearest-cell assignment by rounded cosine (ties to
    the lower cell), written partitioned by ``cell`` with the centroid
    table alongside — the quantizer is FROZEN with the index, like the
    incremental MinHash stop set.

    Probe phase (reads only stored files + the batch): each batch
    vector picks its ``IVF_NPROBE`` nearest stored centroids, the index
    scan is partition-pruned to the probed cell list (k-bounded driver
    collect, ≤ |cells|), and exact cosine is scored only inside probed
    cells.  Cost per batch: O(batch·cells) centroid scores + the pruned
    cells' rows — corpus size enters only through cell width.
    Approximate by design: a true near-dup assigned to an unprobed cell
    is missed (the documented IVF recall trade; the exact sibling is
    ``dedup_embedding_cosine``).
    """
    import os

    from projet_meteo_etl_spark.sources.sinks import staging_root

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") % EMB_INC_BATCH_MOD != 0)
    batch = e.filter(F.col("vec_id") % EMB_INC_BATCH_MOD == 0)

    cents = _label_centroids_df(corpus).select(
        F.col("label").alias("cell_id"), "centroid"
    )
    assign_w = Window.partitionBy("vec_id").orderBy(
        F.desc("csim"), F.asc("cell")
    )
    assigned = (
        corpus.join(F.broadcast(cents))
        .select(
            "vec_id",
            "embedding",
            F.col("cell_id").alias("cell"),
            pround(cosine(F.col("embedding"), F.col("centroid")), 6).alias(
                "csim"
            ),
        )
        .withColumn("r", F.row_number().over(assign_w))
        .filter(F.col("r") == 1)
        .select("vec_id", "embedding", "cell")
    )
    root = os.path.join(staging_root(sf_dir), "emb_inc_index")
    # co-partition on cell first: one file per cell, not one per task
    # per cell (small-files guard, as in dedup_minhash_incremental)
    assigned.repartition("cell").write.partitionBy("cell").mode(
        "overwrite"
    ).parquet(os.path.join(root, "assigned"))
    cents.write.mode("overwrite").parquet(os.path.join(root, "centroids"))

    # probe phase: everything below reads ONLY the stored index
    cts = spark.read.parquet(os.path.join(root, "centroids"))
    probe_w = Window.partitionBy("new_vec").orderBy(
        F.desc("qsim"), F.asc("cell")
    )
    probes = (
        batch.join(F.broadcast(cts))
        .select(
            F.col("vec_id").alias("new_vec"),
            F.col("embedding").alias("qv"),
            F.col("cell_id").alias("cell"),
            pround(cosine(F.col("embedding"), F.col("centroid")), 6).alias(
                "qsim"
            ),
        )
        .withColumn("r", F.row_number().over(probe_w))
        .filter(F.col("r") <= IVF_NPROBE)
        .select("new_vec", "qv", "cell")
        .persist()
    )
    # k-bounded collect (≤ |cells|): physically prune the index read
    cells = sorted(
        r["cell"] for r in probes.select("cell").distinct().collect()
    )
    idx = spark.read.parquet(os.path.join(root, "assigned")).filter(
        F.col("cell").isin(cells)
    )
    out = (
        # no broadcast hint on the batch side: an ingestion batch is
        # operator-bounded, not corpus-proportional — AQE broadcasts
        # it when small
        idx.join(probes, "cell")
        .withColumn(
            "cosine", pround(cosine(F.col("qv"), F.col("embedding")), 6)
        )
        .filter(F.col("cosine") >= EMB_INC_THRESHOLD)
        .select(
            "new_vec", F.col("vec_id").alias("corpus_vec"), "cosine"
        )
        .orderBy("new_vec", "corpus_vec")
    )
    return scoped_cache(out, probes)


DEDUP_EMB_INC_SQL = f"""
WITH emb AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
corpus AS (SELECT * FROM emb WHERE vec_id % {EMB_INC_BATCH_MOD} <> 0),
batch  AS (SELECT * FROM emb WHERE vec_id % {EMB_INC_BATCH_MOD} = 0),
per_dim AS (
  SELECT label, pos, avg(val) AS c FROM (
    SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS pos
    FROM corpus
  ) GROUP BY label, pos
),
cents AS (
  SELECT label AS cell_id, list(c ORDER BY pos) AS centroid
  FROM per_dim GROUP BY label
),
assigned AS (
  SELECT vec_id, v, cell FROM (
    SELECT e.vec_id, e.v, c.cell_id AS cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_COS6_SQL.format(a='e.v', b='c.centroid')} DESC,
                      c.cell_id ASC) AS r
    FROM corpus e, cents c
  ) WHERE r = 1
),
probes AS (
  SELECT new_vec, qv, cell FROM (
    SELECT b.vec_id AS new_vec, b.v AS qv, c.cell_id AS cell,
           row_number() OVER (
             PARTITION BY b.vec_id
             ORDER BY {_COS6_SQL.format(a='b.v', b='c.centroid')} DESC,
                      c.cell_id ASC) AS r
    FROM batch b, cents c
  ) WHERE r <= {IVF_NPROBE}
)
SELECT p.new_vec, a.vec_id AS corpus_vec,
       {_COS6_SQL.format(a='p.qv', b='a.v')} AS cosine
FROM assigned a JOIN probes p ON a.cell = p.cell
WHERE {_COS6_SQL.format(a='p.qv', b='a.v')} >= {EMB_INC_THRESHOLD}
ORDER BY p.new_vec, corpus_vec
"""


SPARK_QUERIES = {
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "jl_projection_distortion": jl_projection_distortion,
    "triplet_margin_mining": triplet_margin_mining,
    "knn_label_accuracy": knn_label_accuracy,
    "mmr_diversified_topk": mmr_diversified_topk,
    "ann_lsh_topk": ann_lsh_topk,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_ivfpq_topk": ann_ivfpq_topk,
    "ann_ivf_recall_curve": ann_ivf_recall_curve,
    "ann_ivf_persisted_index": ann_ivf_persisted_index,
    "dedup_embedding_incremental": dedup_embedding_incremental,
    "embedding_label_centroids": embedding_label_centroids,
    "embedding_int8_quantize": embedding_int8_quantize,
    "embedding_matryoshka_quality": embedding_matryoshka_quality,
}

ORACLE_SQL = {
    "ann_bruteforce_topk": ANN_BRUTEFORCE_SQL,
    "jl_projection_distortion": JL_DISTORTION_SQL,
    "triplet_margin_mining": TRIPLET_SQL,
    "knn_label_accuracy": KNN_ACCURACY_SQL,
    "mmr_diversified_topk": MMR_SQL,
    "ann_lsh_topk": ANN_LSH_SQL,
    "ann_ivf_topk": ANN_IVF_SQL,
    "ann_ivfpq_topk": _ann_ivfpq_sql(),
    "ann_ivf_recall_curve": ANN_IVF_RECALL_SQL,
    # persistence is a physical strategy: stored-index answers must
    # equal the direct plan's, so the oracle is the SAME SQL
    "ann_ivf_persisted_index": ANN_IVF_SQL,
    "dedup_embedding_incremental": DEDUP_EMB_INC_SQL,
    "embedding_label_centroids": EMBEDDING_CENTROIDS_SQL,
    "embedding_int8_quantize": EMBEDDING_INT8_SQL,
    "embedding_matryoshka_quality": EMBEDDING_MRL_SQL,
}
