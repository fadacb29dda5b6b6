"""Embedding clustering: deterministic distributed KMeans (Lloyd's) and
SemDeDup-style semantic near-duplicate pruning.

These are the two cluster-shaped operators a 100 TB training-data
pipeline runs over its embedding store:

* **KMeans** is the coarse-quantizer trainer (the IVF cells in
  ``operators/similarity.py:ann_ivf_topk`` come from exactly this
  computation at scale).  Each Lloyd iteration is two narrow stages:
  an *assignment* pass — broadcast(K centroids) ⋈ corpus scan, argmin
  over K distances, no shuffle of the corpus — and an *update* pass —
  posexplode to (cluster, dim) and one hash agg, a shuffle of
  64·|corpus| skinny rows that AQE coalesces.  Nothing is collected on
  the driver; centroids flow between iterations as a tiny DataFrame
  that re-broadcasts.  At 1000 executors the corpus stays put and only
  K×DIM doubles move per iteration.
* **SemDeDup** (Abbas et al., 2023): cluster first, then compare pairs
  *only within a cluster* — the coarse assignment turns an O(n²)
  all-pairs cosine into Σ O(|cluster|²), shuffle-partitioned by
  cluster id so each executor handles its own cells.

Determinism / oracle-exactness (the house rules — see
``operators/dedup.py``, ``operators/profiling.py``):

* Centroid updates sum ELEMENT-WISE INTEGER MICROS (each embedding
  element is floored to 1e-6 once, up front), so the per-cluster sums
  are exact BIGINTs and order-independent — a float ``avg()`` whose
  partial-aggregation order varies with partitioning can never leak
  into the hash.  The centroid element is then the single exact double
  division ``sum_micros / (n·1e6)``.
* Distances expand to ``v·v − 2·v·c + c·c`` where every dot product is
  the same sequential left fold (``aggregate``/``zip_with``) that the
  ANN queries already proved bit-identical to DuckDB's
  ``list_dot_product``.
* Argmin ties break on cluster id; per-member distances are floored to
  micros BIGINT before any cross-row sum.

Reference parity: the reference has no clustering surface at all
(SURVEY.md §2.5 ABSENT) — this is driver-mandated extended surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.cachescope import scoped_cache
from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.functions.portable import pround

K = 8
SEMDEDUP_TAU = 0.30  # pairwise-cosine prune threshold (p99 of this corpus)


def _dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — fixed evaluation order, so the
    IEEE-754 result is bit-identical across engines."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _micros(vec: Column) -> Column:
    """Element-wise portable floor(x·1e6 + 0.5) as BIGINT."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    )


def _assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast(K rows) against the corpus,
    squared-L2 argmin, ties → smaller cid.  The corpus never shuffles."""
    d = (
        F.col("vv")
        - F.lit(2.0) * _dot(F.col("v"), F.col("c"))
        + _dot(F.col("c"), F.col("c"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("cid"))
    return (
        vectors.crossJoin(F.broadcast(centroids))
        .withColumn("d", d)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _update(assigned: DataFrame) -> DataFrame:
    """New centroids from exact integer-micro sums: posexplode to
    (cid, pos, micro), one hash agg, fold back to an ordered array."""
    per_dim = (
        assigned.select("cid", F.posexplode("m").alias("pos", "mv"))
        .groupBy("cid", "pos")
        .agg(F.sum("mv").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    return per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s", "n"))),
            lambda t: t["s"].cast("double") / (t["n"].cast("double") * F.lit(1000000.0)),
        ).alias("c")
    )


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        v.alias("v"),
        _micros(F.col("embedding")).alias("m"),
    ).withColumn("vv", _dot(F.col("v"), F.col("v")))


def kmeans_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of K=8 KMeans over the embedding corpus.

    init: centroids = embeddings of vec_id 0..K-1 (deterministic seed
    choice, the kmeans♯ of a fixed corpus ordering).  assign → update →
    assign → report.  Per cluster: member count, Σ vec_id membership
    checksum, integer-micro mean distance to the assigned centroid, and
    the final centroid's L2 norm — every reduction exact-integer or a
    fixed-order fold, so the result hashes identically in DuckDB.
    """
    vecs = _vectors(spark, sf_dir).persist()
    init = vecs.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    a1 = _assign(vecs, init)
    c1 = _update(a1)
    a2 = _assign(vecs, c1)
    report = a2.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("vec_id").alias("vec_checksum"),
        F.expr(
            "sum(cast(floor(d * 1000000.0 + 0.5) as bigint)) div count(1)"
        ).alias("avg_dist_micros"),
    )
    norms = c1.select(
        "cid", pround(F.sqrt(_dot(F.col("c"), F.col("c"))), 6).alias("centroid_norm")
    )
    out = (
        report.join(norms, "cid")
        .select("cid", "n_members", "vec_checksum", "avg_dist_micros", "centroid_norm")
        .orderBy("cid")
    )
    return scoped_cache(out, vecs)


# DuckDB twin: identical micros quantization, identical fold-order dot
# products (list_dot_product — proven bit-compatible by the ANN oracles),
# the two Lloyd iterations unrolled as CTEs.
KMEANS_SQL = f"""
WITH vecs AS (
  SELECT vec_id,
         embedding::DOUBLE[] AS v,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS m,
         list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS vv
  FROM embeddings
),
init AS (SELECT vec_id AS cid, v AS c FROM vecs WHERE vec_id < {K}),
a1 AS (
  SELECT * FROM (
    SELECT vecs.*, init.cid,
           vv - 2.0 * list_dot_product(v, c) + list_dot_product(c, c) AS d,
           row_number() OVER (PARTITION BY vec_id ORDER BY
             vv - 2.0 * list_dot_product(v, c) + list_dot_product(c, c) ASC,
             init.cid ASC) AS rn
    FROM vecs CROSS JOIN init
  ) WHERE rn = 1
),
per_dim AS (
  SELECT cid, pos, sum(mv) AS s, count(*) AS n FROM (
    SELECT cid, unnest(m) AS mv, generate_subscripts(m, 1) AS pos FROM a1
  ) GROUP BY cid, pos
),
c1 AS (
  SELECT cid, list(CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
                   ORDER BY pos) AS c
  FROM per_dim GROUP BY cid
),
a2 AS (
  SELECT * FROM (
    SELECT vecs.vec_id, c1.cid,
           vv - 2.0 * list_dot_product(v, c) + list_dot_product(c, c) AS d,
           row_number() OVER (PARTITION BY vec_id ORDER BY
             vv - 2.0 * list_dot_product(v, c) + list_dot_product(c, c) ASC,
             c1.cid ASC) AS rn
    FROM vecs CROSS JOIN c1
  ) WHERE rn = 1
),
report AS (
  SELECT cid, count(*) AS n_members, CAST(sum(vec_id) AS BIGINT) AS vec_checksum,
         CAST(sum(CAST(floor(d * 1000000.0 + 0.5) AS BIGINT)) // count(*)
           AS BIGINT) AS avg_dist_micros
  FROM a2 GROUP BY cid
),
norms AS (
  SELECT cid, floor(sqrt(list_dot_product(c, c)) * 1000000.0 + 0.5) / 1000000.0
           AS centroid_norm
  FROM c1
)
SELECT r.cid, r.n_members, r.vec_checksum, r.avg_dist_micros, n.centroid_norm
FROM report r JOIN norms n ON r.cid = n.cid
ORDER BY r.cid
"""


def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: coarse-cluster, then prune any vector whose cosine to a
    LOWER-id vector in the same cluster exceeds τ (keep-the-canonical
    rule, the same min-id convention as ``dedup_exact``).

    Plan shape: one broadcast assignment pass, then a self-equi-join on
    cluster id (shuffle-partitioned by cid — the quadratic work is
    confined to each cell, which is the entire point of SemDeDup at
    100 TB: |cell|² ≪ n²).  Per-cluster report of members/pruned/kept
    and the max intra-cluster cosine (a max over doubles — order-safe).
    """
    vecs = _vectors(spark, sf_dir)
    init = vecs.filter(F.col("vec_id") < K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    assigned = _assign(vecs, init).select("cid", "vec_id", "v", "vv").persist()
    a = assigned.select(
        "cid", F.col("vec_id").alias("id_a"), F.col("v").alias("va"), F.col("vv").alias("na")
    )
    b = assigned.select(
        "cid", F.col("vec_id").alias("id_b"), F.col("v").alias("vb"), F.col("vv").alias("nb")
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb")))
    pairs = (
        a.join(b, "cid")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
    )
    pruned = (
        pairs.filter(F.col("cos") > SEMDEDUP_TAU)
        .groupBy("cid")
        .agg(F.count_distinct("id_b").alias("n_pruned"))
    )
    stats = pairs.groupBy("cid").agg(pround(F.max("cos"), 6).alias("max_cos"))
    members = assigned.groupBy("cid").agg(F.count(F.lit(1)).alias("n_members"))
    out = (
        members.join(pruned, "cid", "left")
        .join(stats, "cid", "left")
        .select(
            "cid",
            "n_members",
            F.coalesce("n_pruned", F.lit(0)).cast("long").alias("n_pruned"),
            (F.col("n_members") - F.coalesce("n_pruned", F.lit(0))).cast("long").alias("n_kept"),
            "max_cos",
        )
        .orderBy("cid")
    )
    return scoped_cache(out, assigned)


SEMDEDUP_SQL = f"""
WITH vecs AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) AS vv
  FROM embeddings
),
init AS (SELECT vec_id AS cid, v AS c FROM vecs WHERE vec_id < {K}),
assigned AS (
  SELECT cid, vec_id, v, vv FROM (
    SELECT vecs.*, init.cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY
             vv - 2.0 * list_dot_product(v, c) + list_dot_product(c, c) ASC,
             init.cid ASC) AS rn
    FROM vecs CROSS JOIN init
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b,
         list_dot_product(a.v, b.v) / (sqrt(a.vv) * sqrt(b.vv)) AS cos
  FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
),
pruned AS (
  SELECT cid, count(DISTINCT id_b) AS n_pruned FROM pairs
  WHERE cos > {SEMDEDUP_TAU} GROUP BY cid
),
stats AS (
  SELECT cid, floor(max(cos) * 1000000.0 + 0.5) / 1000000.0 AS max_cos
  FROM pairs GROUP BY cid
),
members AS (SELECT cid, count(*) AS n_members FROM assigned GROUP BY cid)
SELECT m.cid, m.n_members,
       CAST(coalesce(p.n_pruned, 0) AS BIGINT) AS n_pruned,
       CAST(m.n_members - coalesce(p.n_pruned, 0) AS BIGINT) AS n_kept,
       s.max_cos
FROM members m
LEFT JOIN pruned p ON m.cid = p.cid
LEFT JOIN stats s ON m.cid = s.cid
ORDER BY m.cid
"""


#: product quantization geometry: M_SUB subspaces × SUBDIM dims cover
#: the 64-dim embedding; K_PQ codes per subspace ⇒ a 8-byte code word
M_SUB = 8
SUBDIM = 8
K_PQ = 16


def _pq_subs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, s, v, m, vv): the corpus split into M_SUB SUBDIM-wide
    subvectors with integer-micro copies and precomputed self-dots."""
    e = load_table(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("full")
    )
    sub_expr = F.expr(
        f"transform(sequence(0, {M_SUB - 1}), "
        f"s -> struct(CAST(s AS INT) AS s, slice(full, s * {SUBDIM} + 1, {SUBDIM}) AS sv))"
    )
    return (
        base.select("vec_id", F.explode(sub_expr).alias("t"))
        .select("vec_id", F.col("t.s").alias("s"), F.col("t.sv").alias("v"))
        .withColumn("m", _micros(F.col("v")))
        .withColumn("vv", _dot(F.col("v"), F.col("v")))
    )


def _pq_assign(subs: DataFrame, cb: DataFrame) -> DataFrame:
    """Nearest-codeword assignment per (vector, subspace): the codebook
    (M_SUB × K_PQ rows, collected — always tiny) ships by value in a
    ``mapInPandas`` closure; the subvector relation never shuffles and
    pays no per-pair interpreted fold (the ``zip_with/aggregate``
    version made PQ encoding the linear bottleneck of every PQ query —
    9× wall for 10× corpus).

    Bit-exactness discipline: the argmin compares RAW doubles (no
    rounding buffer), so the kernel reproduces the Column fold's exact
    IEEE operation order — accumulation is vectorized ACROSS rows but
    sequential ACROSS dimensions (``acc = acc + v[:, j]·c[j]``, seeded
    at 0.0), and ``d = (vv − 2·dot) + cc`` associates left like both
    the Column expression and the DuckDB oracle.  Ties keep the
    smaller cid via strict-< iteration in ascending cid order.
    """
    import numpy as np

    by_s: dict[int, list] = {}
    for r in cb.select("s", "cid", "c").collect():
        by_s.setdefault(int(r.s), []).append(
            (int(r.cid), np.asarray(list(r.c), dtype=np.float64))
        )
    cb_mats: dict[int, tuple] = {}
    for s, lst in by_s.items():
        lst.sort(key=lambda t: t[0])
        cids = np.array([c for c, _ in lst], dtype=np.int32)
        C = np.stack([v for _, v in lst])
        cc = np.zeros(len(lst), dtype=np.float64)
        for j in range(C.shape[1]):  # same sequential fold as _dot(c, c)
            cc = cc + C[:, j] * C[:, j]
        cb_mats[s] = (cids, C, cc)

    def assign(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            svals = pdf["s"].to_numpy()
            V = np.asarray(list(pdf["v"]), dtype=np.float64)
            VV = pdf["vv"].to_numpy(dtype=np.float64)
            out_cid = np.empty(len(pdf), dtype=np.int32)
            out_d = np.empty(len(pdf), dtype=np.float64)
            for s in np.unique(svals):
                m = svals == s
                cids, C, cc = cb_mats[int(s)]
                Vm, VVm = V[m], VV[m]
                best_d = None
                best_cid = None
                for k in range(len(cids)):  # ascending cid: strict < ties
                    acc = np.zeros(Vm.shape[0], dtype=np.float64)
                    for j in range(C.shape[1]):  # sequential like the fold
                        acc = acc + Vm[:, j] * C[k, j]
                    d = (VVm - 2.0 * acc) + cc[k]
                    if best_d is None:
                        best_d = d
                        best_cid = np.full(len(d), cids[k], dtype=np.int32)
                    else:
                        upd = d < best_d
                        best_d = np.where(upd, d, best_d)
                        best_cid = np.where(upd, cids[k], best_cid)
                out_cid[m] = best_cid
                out_d[m] = best_d
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "s": svals,
                    "m": pdf["m"],
                    "cid": out_cid,
                    "d": out_d,
                }
            )

    return subs.select("vec_id", "s", "v", "m", "vv").mapInPandas(
        assign, "vec_id bigint, s int, m array<long>, cid int, d double"
    )


def _pq_codebook(subs: DataFrame) -> DataFrame:
    """One Lloyd iteration per subspace from the deterministic init
    (codewords = subvectors of vec_id 0..K_PQ-1): assign, then exact
    integer-micro centroid update."""
    init = subs.filter(F.col("vec_id") < K_PQ).select(
        F.col("vec_id").cast("int").alias("cid"), "s", F.col("v").alias("c")
    )
    a1 = _pq_assign(subs, init)
    per_dim = (
        a1.select("s", "cid", F.posexplode("m").alias("pos", "mv"))
        .groupBy("s", "cid", "pos")
        .agg(F.sum("mv").alias("sm"), F.count(F.lit(1)).alias("n"))
    )
    return per_dim.groupBy("s", "cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "sm", "n"))),
            lambda t: t["sm"].cast("double") / (t["n"].cast("double") * F.lit(1000000.0)),
        ).alias("c")
    )


def pq_codebook_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (Jégou et al. 2011 — the PQ of IVF-PQ):
    train a per-subspace codebook with one Lloyd iteration and report,
    per subspace, the compression quality a PQ index would deliver —
    vectors encoded, codebook utilization, total quantization error,
    and an assignment checksum.

    PQ is the memory side of the 100 TB ANN story the IVF queries
    (:mod:`operators.similarity`) leave open: 64 float32 dims (256 B)
    compress to ``M_SUB`` 4-bit codes (4 B) — the difference between an
    embedding store that fits executor memory and one that doesn't.

    Plan shape mirrors ``kmeans_embedding_clusters`` with subspace as
    an extra grouping column: subvectors never shuffle for assignment
    (broadcast codebook of M_SUB×K_PQ rows), the update pass is one
    hash agg over (s, cid, dim) integer-micro sums, and every reported
    number is an exact integer, so the audit — including the trained
    codebook's behavior — hash-checks against DuckDB's unrolled-CTE
    twin.
    """
    subs = _pq_subs(spark, sf_dir).persist()
    a2 = _pq_assign(subs, _pq_codebook(subs))
    out = (
        a2.groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.count_distinct("cid").cast("long").alias("codes_used"),
            F.sum(F.floor(F.col("d") * F.lit(1000000.0) + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("err_micros"),
            F.sum(F.col("cid").cast("long") * F.col("vec_id")).cast("long").alias(
                "code_checksum"
            ),
        )
        .orderBy("s")
    )
    return scoped_cache(out, subs)


PQ_AUDIT_SQL = f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v_full FROM embeddings
),
subs AS (
  SELECT vec_id, CAST(s AS INTEGER) AS s,
         v_full[s * {SUBDIM} + 1 : s * {SUBDIM} + {SUBDIM}] AS v
  FROM base, LATERAL (SELECT unnest(generate_series(0, {M_SUB} - 1)) AS s)
),
vecs AS (
  SELECT vec_id, s, v,
         list_transform(v, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS m,
         list_dot_product(v, v) AS vv
  FROM subs
),
init AS (SELECT CAST(vec_id AS INTEGER) AS cid, s, v AS c
         FROM vecs WHERE vec_id < {K_PQ}),
a1 AS (
  SELECT * FROM (
    SELECT vecs.vec_id, vecs.s, vecs.m, init.cid,
           row_number() OVER (PARTITION BY vecs.vec_id, vecs.s ORDER BY
             vv - 2.0 * list_dot_product(vecs.v, init.c)
                + list_dot_product(init.c, init.c) ASC,
             init.cid ASC) AS rn
    FROM vecs JOIN init ON init.s = vecs.s
  ) WHERE rn = 1
),
per_dim AS (
  SELECT s, cid, pos, sum(mv) AS sm, count(*) AS n FROM (
    SELECT s, cid, unnest(m) AS mv, generate_subscripts(m, 1) AS pos FROM a1
  ) GROUP BY s, cid, pos
),
c1 AS (
  SELECT s, cid, list(CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
                      ORDER BY pos) AS c
  FROM per_dim GROUP BY s, cid
),
a2 AS (
  SELECT * FROM (
    SELECT vecs.vec_id, vecs.s, c1.cid,
           vv - 2.0 * list_dot_product(vecs.v, c1.c)
              + list_dot_product(c1.c, c1.c) AS d,
           row_number() OVER (PARTITION BY vecs.vec_id, vecs.s ORDER BY
             vv - 2.0 * list_dot_product(vecs.v, c1.c)
                + list_dot_product(c1.c, c1.c) ASC,
             c1.cid ASC) AS rn
    FROM vecs JOIN c1 ON c1.s = vecs.s
  ) WHERE rn = 1
)
SELECT s,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(count(DISTINCT cid) AS BIGINT) AS codes_used,
       CAST(sum(CAST(floor(d * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS err_micros,
       CAST(sum(CAST(cid AS BIGINT) * vec_id) AS BIGINT) AS code_checksum
FROM a2
GROUP BY s
ORDER BY s
"""


#: ADC search: query count and result depth
N_PQ_QUERIES = 5
PQ_TOP_K = 10


def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance search (the query side of IVF-PQ): encode
    the corpus once with the trained codebook, then answer each query
    with a per-subspace DISTANCE TABLE — ``‖q_s − c‖²`` for every
    (query, subspace, codeword), only |queries|·M_SUB·K_PQ rows — and
    a sum of table lookups per candidate.  This is how a vector store
    searches 100 TB of embeddings without touching a float vector per
    candidate: the scan reads 4-bit codes and adds precomputed cells.

    Plan shape: corpus codes = one broadcast-codebook argmin pass (no
    corpus shuffle); the distance table is broadcast; per-candidate ADC
    distance is one hash agg summing exact integer micros (each table
    cell floored once), so ranking ties are integer comparisons and the
    whole approximate ranking hash-checks against DuckDB.  Queries are
    excluded from their own result, ties break on vec_id — the same
    contract as the ``ann_*`` family in :mod:`operators.similarity`.
    """
    subs = _pq_subs(spark, sf_dir).persist()
    cb = _pq_codebook(subs).persist()
    codes = _pq_assign(subs, cb).select("vec_id", "s", "cid")
    q = subs.filter(F.col("vec_id") < N_PQ_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        "s",
        F.col("v").alias("qv"),
        F.col("vv").alias("qvv"),
    )
    dm = F.floor(
        (
            F.col("qvv")
            - F.lit(2.0) * _dot(F.col("qv"), F.col("c"))
            + _dot(F.col("c"), F.col("c"))
        )
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    dt = q.join(cb, "s").select("q_id", "s", "cid", dm.alias("dm"))
    adc = (
        codes.join(F.broadcast(dt), ["s", "cid"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("dm").alias("adc_micros"))
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_micros"), F.asc("vec_id"))
    out = (
        adc.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= PQ_TOP_K)
        .select(
            F.col("q_id").alias("query_id"),
            "rank",
            F.col("vec_id").alias("neighbor_id"),
            "adc_micros",
        )
        .orderBy("query_id", "rank")
    )
    return scoped_cache(out, subs, cb)


ANN_PQ_ADC_SQL = f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v_full FROM embeddings
),
subs AS (
  SELECT vec_id, CAST(s AS INTEGER) AS s,
         v_full[s * {SUBDIM} + 1 : s * {SUBDIM} + {SUBDIM}] AS v
  FROM base, LATERAL (SELECT unnest(generate_series(0, {M_SUB} - 1)) AS s)
),
vecs AS (
  SELECT vec_id, s, v,
         list_transform(v, x -> CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)) AS m,
         list_dot_product(v, v) AS vv
  FROM subs
),
init AS (SELECT CAST(vec_id AS INTEGER) AS cid, s, v AS c
         FROM vecs WHERE vec_id < {K_PQ}),
a1 AS (
  SELECT * FROM (
    SELECT vecs.vec_id, vecs.s, vecs.m, init.cid,
           row_number() OVER (PARTITION BY vecs.vec_id, vecs.s ORDER BY
             vv - 2.0 * list_dot_product(vecs.v, init.c)
                + list_dot_product(init.c, init.c) ASC,
             init.cid ASC) AS rn
    FROM vecs JOIN init ON init.s = vecs.s
  ) WHERE rn = 1
),
per_dim AS (
  SELECT s, cid, pos, sum(mv) AS sm, count(*) AS n FROM (
    SELECT s, cid, unnest(m) AS mv, generate_subscripts(m, 1) AS pos FROM a1
  ) GROUP BY s, cid, pos
),
c1 AS (
  SELECT s, cid, list(CAST(sm AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)
                      ORDER BY pos) AS c
  FROM per_dim GROUP BY s, cid
),
codes AS (
  SELECT vec_id, s, cid FROM (
    SELECT vecs.vec_id, vecs.s, c1.cid,
           row_number() OVER (PARTITION BY vecs.vec_id, vecs.s ORDER BY
             vv - 2.0 * list_dot_product(vecs.v, c1.c)
                + list_dot_product(c1.c, c1.c) ASC,
             c1.cid ASC) AS rn
    FROM vecs JOIN c1 ON c1.s = vecs.s
  ) WHERE rn = 1
),
q AS (
  SELECT vec_id AS q_id, s, v AS qv, vv AS qvv
  FROM vecs WHERE vec_id < {N_PQ_QUERIES}
),
dt AS (
  SELECT q.q_id, q.s, c1.cid,
         CAST(floor((q.qvv - 2.0 * list_dot_product(q.qv, c1.c)
                     + list_dot_product(c1.c, c1.c)) * 1000000.0 + 0.5)
              AS BIGINT) AS dm
  FROM q JOIN c1 ON c1.s = q.s
),
adc AS (
  SELECT dt.q_id, codes.vec_id, sum(dt.dm) AS adc_micros
  FROM codes JOIN dt ON dt.s = codes.s AND dt.cid = codes.cid
  WHERE codes.vec_id <> dt.q_id
  GROUP BY dt.q_id, codes.vec_id
)
SELECT query_id, rank, neighbor_id, adc_micros FROM (
  SELECT q_id AS query_id, vec_id AS neighbor_id,
         CAST(adc_micros AS BIGINT) AS adc_micros,
         CAST(row_number() OVER (PARTITION BY q_id
                                 ORDER BY adc_micros ASC, vec_id ASC)
              AS BIGINT) AS rank
  FROM adc
) WHERE rank <= {PQ_TOP_K}
ORDER BY query_id, rank
"""


#: embedding dimensionality (matches the testdata corpus)
PCA_DIM = 64
#: unrolled power-iteration rounds
PCA_ITERS = 3


def pca_power_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by ``PCA_ITERS``
    unrolled power iterations over the exact integer covariance — the
    spectral health check (is the space collapsing onto one axis?) and
    the whitening/compression primitive an embedding store runs.

    Distributed shape: ONE ``mapInPandas`` pass computes per-Arrow-batch
    Gram partials (QᵀQ, with elements quantized to integer micros up
    front), so the shuffle carries d² = 4096 partial cells per batch —
    never a row-pair join, never N·d² intermediate rows.  The d×d
    covariance ``N·ΣQᵢQⱼ − ΣQᵢ·ΣQⱼ`` is assembled in DECIMAL(38,0)
    (c grows as rows²·1e12, so the assembly itself holds to ~1e13
    rows), normalized to integer units of its own L∞ norm via a
    three-limb long division — ``(|c| DIV cmax)·1e6`` plus two
    ``(rem·1e3) DIV cmax`` limbs — whose largest intermediate is
    ``cmax·1e3``, not ``c·1e6``: the normalization stays exact (same
    truncated value) to ~3e11 rows instead of overflowing DECIMAL(38)
    (NULL in Spark / HUGEINT error in DuckDB) past ~1e9.  Sign is
    applied explicitly around the positive-operand division so Spark
    ``DIV`` and DuckDB ``//`` cannot disagree on negative covariance
    cells.  The 3 matvec+renormalize rounds run partition-locally in
    one exact-int64 kernel over the coalesced d×d relation — the
    matrix is scale-invariant, so distributing its microseconds of
    arithmetic across 32 tasks per stage only bought scheduling
    constants (~4 s of wall at sf0.1).
    Everything after quantization is integer arithmetic with
    truncating division (identical in Spark ``DIV`` and DuckDB ``//``),
    so the component is bit-identical cross-engine — including its
    sign, which is pinned by the deterministic all-ones start vector.

    Per-batch int64 safety: |q| ≤ ~1e7 micros ⇒ |q·q| ≤ 1e14; Arrow
    batches are ≤ 10k rows ⇒ partial cells ≤ 1e18 < 2⁶³.
    """
    e = load_table(spark, sf_dir, "embeddings").select("embedding")

    def gram(batches):
        import numpy as np
        import pandas as pd

        d = PCA_DIM
        ii = np.repeat(np.arange(1, d + 1), d)
        jj = np.tile(np.arange(1, d + 1), d)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            q = np.floor(mat * 1e6 + 0.5).astype(np.int64)
            g = q.T @ q
            yield pd.concat(
                [
                    pd.DataFrame({"i": ii, "j": jj, "s": g.ravel()}),
                    pd.DataFrame(
                        {"i": np.arange(1, d + 1), "j": 0, "s": q.sum(axis=0)}
                    ),
                    pd.DataFrame({"i": [0], "j": [0], "s": [len(q)]}),
                ]
            )

    # persisted: six consumers (n, the two sum legs, the Gram cells,
    # and the covariance feeding both cmax and M) — without the cache
    # each would re-run the corpus-wide Python Gram pass
    # one partition: the partials relation is d²+d+1 ≈ 4.2k rows — at 32
    # shuffle partitions every downstream matvec stage would pay 32-task
    # scheduling for a few hundred rows of work
    agg = (
        e.mapInPandas(gram, "i int, j int, s long")
        .groupBy("i", "j")
        .agg(F.sum(F.col("s").cast("decimal(38,0)")).alias("s"))
        .coalesce(1)
        .persist()
    )
    n = agg.filter((F.col("i") == 0) & (F.col("j") == 0)).select(
        F.col("s").alias("n")
    )
    sums = agg.filter((F.col("j") == 0) & (F.col("i") > 0)).select(
        F.col("i"), F.col("s").alias("dim_sum")
    )
    gram_df = agg.filter((F.col("i") > 0) & (F.col("j") > 0))
    cov = (
        gram_df.join(F.broadcast(sums.withColumnRenamed("dim_sum", "si")), "i")
        .join(
            F.broadcast(
                sums.select(F.col("i").alias("j"), F.col("dim_sum").alias("sj"))
            ),
            "j",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            (F.col("n") * F.col("s") - F.col("si") * F.col("sj")).alias("c"),
        )
    )
    cmax = cov.agg(
        F.greatest(F.max(F.abs(F.col("c"))), F.lit(1).cast("decimal(38,0)")).alias(
            "cmax"
        )
    )
    # three-limb exact normalization: trunc(|c|·1e6/cmax) assembled as
    # quotient·1e6 + two (rem·1e3) DIV cmax limbs — largest intermediate
    # cmax·1e3, so no c·1e6 DECIMAL(38) overflow; sign applied outside
    # the positive-operand division (Spark DIV == DuckDB // there)
    m = (
        cov.crossJoin(F.broadcast(cmax))
        .select(
            "i",
            "j",
            F.expr(f"CAST({_norm_limbs('DIV')} AS BIGINT)").alias("m"),
        )
        .persist()
    )
    # the d×d matrix is SCALE-INVARIANT (4096 cells whatever the corpus
    # size), so the 3 matvec+renormalize rounds run partition-locally in
    # ONE exact-integer kernel — the earlier broadcast-join formulation
    # paid 3×(join + agg + renorm) stage-scheduling constants for
    # microseconds of arithmetic (~4 s of the query's 8 s wall).
    # Arithmetic is bit-identical to the unrolled-CTE oracle: int64
    # matvec (|m|,|x| ≤ 1e6 ⇒ |y| ≤ 64·1e12, exact), then the ×1e6
    # renorm in unbounded Python ints with truncation toward zero.
    def power_iters(batches, _d=PCA_DIM, _iters=PCA_ITERS):
        import numpy as np
        import pandas as pd

        rows = [pdf for pdf in batches if len(pdf)]
        if not rows:
            # empty corpus ⇒ empty result (matches the empty x0 the
            # SQL unroll produces)
            yield pd.DataFrame(
                {
                    "dim": pd.Series([], dtype="int32"),
                    "comp_micro": pd.Series([], dtype="int64"),
                    "growth_linf": pd.Series([], dtype="int64"),
                }
            )
            return
        pdf = pd.concat(rows)
        mat = np.zeros((_d, _d), dtype=np.int64)
        if len(pdf):
            mat[
                pdf["i"].to_numpy(np.int64) - 1,
                pdf["j"].to_numpy(np.int64) - 1,
            ] = pdf["m"].to_numpy(np.int64)
        x = [1_000_000] * _d
        mk = 1
        for _ in range(_iters):
            y = mat @ np.asarray(x, dtype=np.int64)
            mk = max(int(np.abs(y).max(initial=0)), 1)
            # y·1e6 exceeds int64 — renorm in Python ints, trunc to zero
            x = [
                (1 if v >= 0 else -1) * (abs(int(v)) * 1_000_000 // mk)
                for v in y
            ]
        yield pd.DataFrame(
            {
                "dim": np.arange(1, _d + 1, dtype=np.int32),
                "comp_micro": np.asarray(x, dtype=np.int64),
                "growth_linf": np.full(_d, mk, dtype=np.int64),
            }
        )

    out = (
        m.coalesce(1)
        .mapInPandas(power_iters, "dim int, comp_micro long, growth_linf long")
        .orderBy("dim")
    )
    return scoped_cache(out, m, agg)


def _norm_limbs(div: str) -> str:
    """``sign(c) · trunc(|c|·1e6 / cmax)`` without ever forming
    ``c·1e6``: quotient limb ×1e6 plus two remainder limbs ×1e3 each —
    exact long division, largest intermediate ``cmax·1e3``.  ``div`` is
    the engine's truncating integer division spelling (Spark ``DIV``,
    DuckDB ``//`` — both truncate toward zero, and operands are kept
    non-negative via abs so the remainder convention cannot differ)."""
    return (
        "(CASE WHEN c < 0 THEN -1 ELSE 1 END) * ("
        f"(abs(c) {div} cmax) * 1000000"
        f" + ((abs(c) % cmax) * 1000 {div} cmax) * 1000"
        f" + ((abs(c) % cmax) * 1000 % cmax) * 1000 {div} cmax)"
    )


def _pca_iter_sql(k: int) -> str:
    """One unrolled power-iteration round as oracle CTEs."""
    prev = f"x{k - 1}" if k > 1 else "x0"
    return f"""
y{k} AS (
  SELECT m.i, CAST(sum(m.m * {prev}.x) AS BIGINT) AS y
  FROM m JOIN {prev} ON {prev}.j = m.j GROUP BY 1
),
mk{k} AS (SELECT greatest(max(abs(y)), 1) AS mk FROM y{k}),
x{k} AS (
  SELECT y{k}.i AS j,
         CAST(y{k}.y::HUGEINT * 1000000 // mk{k}.mk AS BIGINT) AS x
  FROM y{k}, mk{k}
)"""


PCA_POWER_SQL = f"""
WITH e AS (
  SELECT vec_id, t.i,
         CAST(floor(embedding[t.i]::DOUBLE * 1000000.0 + 0.5) AS BIGINT) AS q
  FROM embeddings, range(1, {PCA_DIM + 1}) t(i)
),
nn AS (SELECT count(*) // {PCA_DIM} AS n FROM e),
s AS (SELECT i, CAST(sum(q) AS BIGINT) AS dim_sum FROM e GROUP BY i),
g AS (
  SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS gsum
  FROM e a JOIN e b USING (vec_id) GROUP BY 1, 2
),
cov AS (
  SELECT g.i, g.j,
         nn.n::HUGEINT * g.gsum - si.dim_sum::HUGEINT * sj.dim_sum AS c
  FROM g
  JOIN s si ON si.i = g.i
  JOIN s sj ON sj.i = g.j
  CROSS JOIN nn
),
cm AS (SELECT greatest(max(abs(c)), 1) AS cmax FROM cov),
m AS (
  SELECT i, j, CAST({_norm_limbs('//')} AS BIGINT) AS m FROM cov, cm
),
x0 AS (SELECT i AS j, CAST(1000000 AS BIGINT) AS x FROM s),
{','.join(_pca_iter_sql(k) for k in range(1, PCA_ITERS + 1))}
SELECT CAST(x{PCA_ITERS}.j AS INTEGER) AS dim,
       x{PCA_ITERS}.x AS comp_micro,
       CAST(mk{PCA_ITERS}.mk AS BIGINT) AS growth_linf
FROM x{PCA_ITERS}, mk{PCA_ITERS}
ORDER BY dim
"""


SPARK_QUERIES = {
    "kmeans_embedding_clusters": kmeans_embedding_clusters,
    "semdedup_prune": semdedup_prune,
    "pq_codebook_audit": pq_codebook_audit,
    "ann_pq_adc_topk": ann_pq_adc_topk,
    "pca_power_component": pca_power_component,
}

ORACLE_SQL = {
    "kmeans_embedding_clusters": KMEANS_SQL,
    "semdedup_prune": SEMDEDUP_SQL,
    "pq_codebook_audit": PQ_AUDIT_SQL,
    "ann_pq_adc_topk": ANN_PQ_ADC_SQL,
    "pca_power_component": PCA_POWER_SQL,
}
