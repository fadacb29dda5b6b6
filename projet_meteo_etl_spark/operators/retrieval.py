"""Sparse (keyword) retrieval over the ``documents`` table: TF-IDF
cosine top-k and BM25 keyword search.

Complements :mod:`operators.similarity` (dense embedding ANN): a
training-data pipeline needs BOTH retrieval families — sparse for
keyword/provenance lookups and decontamination-style audits, dense for
semantic near-neighbors.  Everything here is the classic inverted-index
dataflow expressed relationally, so Catalyst plans it like any other
join/agg pipeline:

    tokenize (explode) → term-frequency agg → document-frequency agg
    → weight join → (query ⋈ corpus ON term) → per-pair dot product
    → normalize → window top-k

Scale notes (the same plan at 100 TB):

* the tf/df aggregations shuffle on ``term`` — exactly an inverted
  -index build; partial aggregation absorbs the per-document fan-out
  before the exchange;
* the pair join is term-partitioned; its cost is sum over terms of
  |q-postings| × |corpus-postings| — at real scale you cut the hot
  common-term keys with a max-df (stopword) prune, which is a plain
  ``df < threshold`` filter on the weight table (the synthetic 31-term
  vocabulary here makes every term "common", so no prune is applied);
* norms and document lengths are tiny per-doc aggregates (broadcast
  side of their joins).

Cross-engine exactness: every additive aggregate is over BIGINTs —
term weights are floored to integer scale BEFORE any data-dependent
summation (``floor(1000·ln(…))`` per term; per-term BM25 partial
scores floored at 1e6) — so aggregation order cannot perturb results;
the only floats are fixed-shape expression trees over those exact
integers (IEEE-754 ops are correctly rounded, hence engine-identical),
mirrored verbatim in the DuckDB oracle.  The reference has no search
surface at all (SURVEY.md §2.5); this is driver-mandate breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.cachescope import scoped_cache
from projet_meteo_etl_spark.catalog import load_table, spread_scan
from projet_meteo_etl_spark.functions.portable import pround, json_long

#: every doc_id ≡ 0 (mod 100) is a "query" document: 5 queries per 500
#: docs at the small SFs, 50 at sf0.1 — scales with the corpus.
QUERY_DOC_MOD = 100
TOP_K = 5
BM25_TERMS = ("stream", "join", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_N = 20


def _term_stats(docs: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(tf, dfreq, nd): term frequencies per document, document
    frequencies per term, and the 1-row corpus size — the inverted
    -index statistics every sparse scorer consumes."""
    toks = spread_scan(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    # tf is the inverted index; every downstream statistic reads it
    # (df, dl, weights) — persist so tokenize+agg runs once, not 3-4×
    # (at scale this is the materialized index table)
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    nd = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return tf, dfreq, nd



def _tfidf_cosine_scored(docs: DataFrame):
    """Shared sparse pipeline for tfidf_topk_similar / hybrid_rrf_search:
    integral idf weights, BIGINT dot products and norms, raw cosine per
    (query doc, candidate).  Returns (scored, tf, w) where scored has
    columns (q_doc, doc_id, cos_raw) and tf/w are the persisted
    intermediates for the caller's scoped_cache."""
    tf, dfreq, nd = _term_stats(docs)
    w = (
        tf.join(F.broadcast(dfreq), "term")  # vocab ≪ postings: map-side join
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "term",
            "tf",
            F.floor(
                F.lit(1000.0) * F.log(F.lit(1.0) + F.col("n_docs") / F.col("df"))
            )
            .cast("long")
            .alias("w"),
        )
        .persist()  # feeds norms, the query side, and the corpus side
    )
    norms = w.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf") * F.col("w") * F.col("w")).alias("norm_sq")
    )
    q = w.filter(F.col("doc_id") % QUERY_DOC_MOD == 0).select(
        F.col("doc_id").alias("q_doc"), "term", F.col("tf").alias("q_tf")
    )
    # query postings ≪ corpus postings (QUERY_DOC_MOD⁻¹ of the index):
    # broadcast them so the corpus side never shuffles for this join
    dot = (
        F.broadcast(q).join(w, "term")
        .filter(F.col("q_doc") != F.col("doc_id"))
        .groupBy("q_doc", "doc_id")
        .agg(
            F.sum(F.col("q_tf") * F.col("tf") * F.col("w") * F.col("w")).alias("dot")
        )
    )
    qn = norms.select(F.col("doc_id").alias("q_doc"), F.col("norm_sq").alias("q_norm"))
    scored = (
        dot.join(F.broadcast(qn), "q_doc")
        .join(F.broadcast(norms), "doc_id")
        .withColumn(
            "cos_raw", F.col("dot") / (F.sqrt("q_norm") * F.sqrt("norm_sq"))
        )
    )
    return scored, tf, w


def tfidf_topk_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most TF-IDF-cosine-similar documents for each query doc.

    Weights ``w(term) = floor(1000 · ln(1 + N/df))`` are integral, so
    the pair dot product ``Σ tf_q·tf_d·w²`` and the norms
    ``Σ tf²·w²`` are BIGINT sums — order-independent and engine-exact;
    cosine only divides those integers at the end.  The corpus-side
    posting list joins the query-side postings on ``term`` (hash
    partition on term = inverted-index lookup); top-k is a bounded
    window per query doc.
    """
    docs = load_table(spark, sf_dir, "documents")
    scored, tf, w = _tfidf_cosine_scored(docs)
    rn = Window.partitionBy("q_doc").orderBy(F.desc("cos_raw"), F.asc("doc_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(rn))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "q_doc",
            F.col("doc_id").alias("match_doc"),
            pround(F.col("cos_raw"), 4).alias("cosine_sim"),
            "rank",
        )
        .orderBy("q_doc", "rank")
    )
    return scoped_cache(out, tf, w)


#: shared sparse-scoring CTE prefix (tokenize -> tf -> idf weights
#: -> norms -> query-candidate integer dot products) used by BOTH
#: TFIDF_TOPK_SQL and HYBRID_RRF_SQL, so a weighting change cannot
#: silently desynchronize them
_SPARSE_CTE_SQL = f"""WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> ''
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nd AS (SELECT count(*) AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         CAST(floor(1000.0 * ln(1.0 + n_docs / df)) AS BIGINT) AS w
  FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN nd
),
norms AS (SELECT doc_id, sum(tf * tf * w * w) AS norm_sq FROM w GROUP BY doc_id),
dot AS (
  SELECT q.doc_id AS q_doc, d.doc_id AS doc_id,
         sum(q.tf * d.tf * d.w * d.w) AS dot
  FROM w q JOIN w d ON q.term = d.term AND q.doc_id <> d.doc_id
  WHERE q.doc_id % {QUERY_DOC_MOD} = 0
  GROUP BY q.doc_id, d.doc_id
),"""


TFIDF_TOPK_SQL = f"""
{_SPARSE_CTE_SQL}
scored AS (
  SELECT dot.q_doc, dot.doc_id,
         dot.dot / (sqrt(qn.norm_sq) * sqrt(dn.norm_sq)) AS cos
  FROM dot
  JOIN norms qn ON qn.doc_id = dot.q_doc
  JOIN norms dn ON dn.doc_id = dot.doc_id
),
ranked AS (
  SELECT q_doc, doc_id, cos,
         CAST(row_number() OVER (PARTITION BY q_doc ORDER BY cos DESC, doc_id) AS INTEGER) AS rank
  FROM scored
)
SELECT q_doc, doc_id AS match_doc,
       floor(cos * 10000.0 + 0.5) / 10000.0 AS cosine_sim,
       rank
FROM ranked
WHERE rank <= {TOP_K}
ORDER BY q_doc, rank
"""


def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed keyword query.

    Standard Okapi BM25 (k1=1.2, b=0.75, idf = ln(1+(N−df+0.5)/(df+0.5)))
    with one cross-engine-exactness twist: each per-term partial score
    is floored at 1e6 scale BEFORE the per-document sum, making the
    final score a BIGINT sum (engine-exact) instead of an order
    -sensitive float accumulation.  The query-term list joins the tf
    table as a tiny broadcast — at scale this is the "query hits the
    inverted index" lookup, never a corpus scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf, dfreq, nd = _term_stats(docs)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    avg = dl.crossJoin(F.broadcast(nd)).agg(
        (F.sum("dl") / F.first("n_docs")).alias("avgdl"),
        F.first("n_docs").alias("n_docs"),
    )
    terms = spark.createDataFrame([(t,) for t in BM25_TERMS], "term string")
    hits = (
        tf.join(F.broadcast(terms), "term")
        .join(dfreq, "term")
        .join(F.broadcast(dl), "doc_id")
        .crossJoin(F.broadcast(avg))
    )
    k1, b = BM25_K1, BM25_B
    tscore = (
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5))
            / (F.col("df") + F.lit(0.5))
        )
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    per_term = hits.select(
        "doc_id", F.floor(tscore * F.lit(1e6)).cast("long").alias("iscore")
    )
    out = (
        per_term.groupBy("doc_id")
        .agg(
            F.sum("iscore").alias("score_micros"),
            F.count(F.lit(1)).alias("n_terms_matched"),
        )
        .orderBy(F.desc("score_micros"), F.asc("doc_id"))
        .limit(BM25_TOP_N)
    )
    return scoped_cache(out, tf)


BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks WHERE term <> ''
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
nd AS (SELECT count(*) AS n_docs FROM documents),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
avgs AS (SELECT sum(dl) / (SELECT n_docs FROM nd) AS avgdl FROM dl),
hits AS (
  SELECT tf.doc_id,
         CAST(floor(
           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * {BM25_K1 + 1.0})
           / (tf + {BM25_K1} * ({1.0 - BM25_B} + {BM25_B} * dl / avgdl))
           * 1000000.0) AS BIGINT) AS iscore
  FROM tf
  JOIN dfreq ON tf.term = dfreq.term
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN nd CROSS JOIN avgs
  WHERE tf.term IN {BM25_TERMS!r}
)
SELECT doc_id, CAST(sum(iscore) AS BIGINT) AS score_micros, count(*) AS n_terms_matched
FROM hits
GROUP BY doc_id
ORDER BY score_micros DESC, doc_id
LIMIT {BM25_TOP_N}
"""


#: reciprocal-rank-fusion constants (Cormack et al.: k=60)
RRF_K = 60
RRF_SCALE = 1_000_000
RRF_DEPTH = 20
RRF_TOP = 10


def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the sparse (TF-IDF cosine) and dense
    (embedding cosine) rankings per query document with reciprocal-rank
    fusion — ``Σ floor(1e6 / (60 + rank))`` over the lists a candidate
    appears in, an integer so fusion is engine- and order-exact.

    ``vec_id`` is aligned with ``doc_id`` (same synthetic corpus), so
    the dense list for query doc q is the cosine ranking of embedding
    q.  Each list is cut at ``RRF_DEPTH``; candidates found by only
    one modality still score (that asymmetry is RRF's point).  Scale:
    both rankings are per-query window top-k over joins already bounded
    by the inverted index (sparse) / broadcast query set (dense); the
    fusion itself is a (q, match)-keyed outer join of two k·|Q|-row
    tables — negligible next to the rankings.
    """
    docs = load_table(spark, sf_dir, "documents")
    scored, tf, w = _tfidf_cosine_scored(docs)
    sparse_rn = Window.partitionBy("q_doc").orderBy(F.desc("cos"), F.asc("doc_id"))
    sparse = (
        scored.withColumn("cos", pround(F.col("cos_raw"), 6))
        .withColumn("s_rank", F.row_number().over(sparse_rn))
        .filter(F.col("s_rank") <= RRF_DEPTH)
        .select("q_doc", F.col("doc_id").alias("match_doc"), "s_rank")
    )


    from projet_meteo_etl_spark.operators.similarity import cosine

    e = load_table(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") % QUERY_DOC_MOD == 0).select(
        F.col("vec_id").alias("q_doc"), F.col("embedding").alias("qv")
    )
    dense_rn = Window.partitionBy("q_doc").orderBy(
        F.desc("dcos"), F.asc("vec_id")
    )
    dense = (
        e.join(F.broadcast(qv), F.col("vec_id") != F.col("q_doc"))
        .withColumn("dcos", pround(cosine(F.col("qv"), F.col("embedding")), 6))
        .withColumn("d_rank", F.row_number().over(dense_rn))
        .filter(F.col("d_rank") <= RRF_DEPTH)
        .select("q_doc", F.col("vec_id").alias("match_doc"), "d_rank")
    )

    fused = (
        sparse.join(dense, ["q_doc", "match_doc"], "full_outer")
        .select(
            "q_doc",
            "match_doc",
            (
                F.coalesce(
                    F.expr(f"{RRF_SCALE} div ({RRF_K} + s_rank)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"{RRF_SCALE} div ({RRF_K} + d_rank)"), F.lit(0)
                )
            ).alias("rrf_micros"),
            (
                F.when(F.col("s_rank").isNotNull(), 1).otherwise(0)
                + F.when(F.col("d_rank").isNotNull(), 1).otherwise(0)
            ).alias("n_lists"),
        )
    )
    final_rn = Window.partitionBy("q_doc").orderBy(
        F.desc("rrf_micros"), F.asc("match_doc")
    )
    out = (
        fused.withColumn("rank", F.row_number().over(final_rn).cast("long"))
        .filter(F.col("rank") <= RRF_TOP)
        .orderBy("q_doc", "rank")
    )
    return scoped_cache(out, tf, w)


HYBRID_RRF_SQL = f"""
{_SPARSE_CTE_SQL}
sparse AS (
  SELECT q_doc, doc_id AS match_doc,
         row_number() OVER (PARTITION BY q_doc ORDER BY cos DESC, doc_id) AS s_rank
  FROM (
    SELECT dot.q_doc, dot.doc_id,
           floor((dot.dot / (sqrt(qn.norm_sq) * sqrt(dn.norm_sq))) * 1000000.0 + 0.5)
             / 1000000.0 AS cos
    FROM dot
    JOIN norms qn ON qn.doc_id = dot.q_doc
    JOIN norms dn ON dn.doc_id = dot.doc_id
  )
  QUALIFY s_rank <= {RRF_DEPTH}
),
qv AS (
  SELECT vec_id AS q_doc, embedding AS qv FROM embeddings
  WHERE vec_id % {QUERY_DOC_MOD} = 0
),
dense AS (
  SELECT q_doc, vec_id AS match_doc,
         row_number() OVER (PARTITION BY q_doc ORDER BY dcos DESC, vec_id) AS d_rank
  FROM (
    SELECT q.q_doc, e.vec_id,
           floor((list_dot_product(q.qv::DOUBLE[], e.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))
                    * sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))))
                 * 1000000.0 + 0.5) / 1000000.0 AS dcos
    FROM embeddings e, qv q WHERE e.vec_id <> q.q_doc
  )
  QUALIFY d_rank <= {RRF_DEPTH}
),
fused AS (
  SELECT coalesce(s.q_doc, d.q_doc) AS q_doc,
         coalesce(s.match_doc, d.match_doc) AS match_doc,
         coalesce({RRF_SCALE} // ({RRF_K} + s.s_rank), 0)
           + coalesce({RRF_SCALE} // ({RRF_K} + d.d_rank), 0) AS rrf_micros,
         (CASE WHEN s.s_rank IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN d.d_rank IS NOT NULL THEN 1 ELSE 0 END) AS n_lists
  FROM sparse s
  FULL OUTER JOIN dense d ON s.q_doc = d.q_doc AND s.match_doc = d.match_doc
)
SELECT q_doc, match_doc, rrf_micros, n_lists,
       row_number() OVER (PARTITION BY q_doc
                          ORDER BY rrf_micros DESC, match_doc) AS rank
FROM fused
QUALIFY rank <= {RRF_TOP}
ORDER BY q_doc, rank
"""


#: NDCG cutoff and the 1-indexed integer-micro discount table
#: ``floor(1e6 / log2(i+1))`` — precomputed so NO transcendental runs
#: in either engine; the literals are embedded identically in the Spark
#: plan and the oracle SQL, keeping DCG pure integer arithmetic.
NDCG_K = 10
_NDCG_DISC = [1000000, 630929, 500000, 430676, 386852, 356207, 333333,
              315464, 301029, 289064]


def ndcg_at_k_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of a behavioral ranker: the SYSTEM ranks items by view
    count (ties → item id), graded relevance is the purchase count
    capped at 4, and the IDEAL ranking re-sorts the same catalog by
    relevance — the standard offline ranking eval, reduced to integer
    arithmetic via a precomputed discount table (see ``_NDCG_DISC``).

    Scale shape: one per-item aggregate of the log (map-side combine),
    then two rankings over the ITEM CATALOG — a domain-bounded
    relation, not the fact table — and a 1-row reduction.
    """
    e = load_table(spark, sf_dir, "events").select(
        json_long().alias("item"),
        "event_type",
    ).filter(F.col("item").isNotNull())
    per = e.groupBy("item").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "n_views"
        ),
        F.least(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)),
            F.lit(4),
        )
        .cast("long")
        .alias("rel"),
    )
    disc = F.array(*[F.lit(d) for d in _NDCG_DISC])
    sys_rk = F.row_number().over(Window.orderBy(F.desc("n_views"), F.asc("item")))
    ideal_rk = F.row_number().over(Window.orderBy(F.desc("rel"), F.asc("item")))
    ranked = per.select(
        "item",
        "rel",
        sys_rk.alias("sys_rk"),
        ideal_rk.alias("ideal_rk"),
    )
    return ranked.agg(
        F.sum(
            F.when(
                F.col("sys_rk") <= NDCG_K,
                F.col("rel") * F.element_at(disc, F.col("sys_rk")),
            ).otherwise(0)
        )
        .cast("long")
        .alias("dcg_micro"),
        F.sum(
            F.when(
                F.col("ideal_rk") <= NDCG_K,
                F.col("rel") * F.element_at(disc, F.col("ideal_rk")),
            ).otherwise(0)
        )
        .cast("long")
        .alias("idcg_micro"),
    ).select(
        "dcg_micro",
        "idcg_micro",
        F.expr("dcg_micro * 1000000 DIV greatest(idcg_micro, 1)").alias(
            "ndcg_ppm"
        ),
    )


def _ndcg_disc_case(rank_col: str) -> str:
    whens = " ".join(
        f"WHEN {i + 1} THEN {d}" for i, d in enumerate(_NDCG_DISC)
    )
    return f"CASE {rank_col} {whens} ELSE 0 END"


NDCG_EVAL_SQL = f"""
WITH base AS (
  SELECT TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) AS item, event_type
  FROM events WHERE TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) IS NOT NULL
),
per AS (
  SELECT item,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_views,
         CAST(least(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END), 4)
              AS BIGINT) AS rel
  FROM base GROUP BY item
),
ranked AS (
  SELECT item, rel,
         row_number() OVER (ORDER BY n_views DESC, item ASC) AS sys_rk,
         row_number() OVER (ORDER BY rel DESC, item ASC) AS ideal_rk
  FROM per
)
SELECT CAST(sum(CASE WHEN sys_rk <= {NDCG_K}
                     THEN rel * ({_ndcg_disc_case('sys_rk')}) ELSE 0 END)
            AS BIGINT) AS dcg_micro,
       CAST(sum(CASE WHEN ideal_rk <= {NDCG_K}
                     THEN rel * ({_ndcg_disc_case('ideal_rk')}) ELSE 0 END)
            AS BIGINT) AS idcg_micro,
       CAST(sum(CASE WHEN sys_rk <= {NDCG_K}
                     THEN rel * ({_ndcg_disc_case('sys_rk')}) ELSE 0 END)
            AS BIGINT) * 1000000
         // greatest(CAST(sum(CASE WHEN ideal_rk <= {NDCG_K}
                                   THEN rel * ({_ndcg_disc_case('ideal_rk')}) ELSE 0 END)
                          AS BIGINT), 1) AS ndcg_ppm
FROM ranked
"""


#: reciprocal-rank micro table for MRR@K (1e6 // r, exact literals
#: shared with the oracle — no division at eval time)
_MRR_RECIP = [1_000_000 // r for r in range(1, NDCG_K + 1)]


def mrr_hit_rate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 and Hit@10 of the same behavioral ranker
    :func:`ndcg_at_k_eval` grades — but per USER: the system ranks the
    item catalog by global view count, each purchasing user's relevant
    set is the items they bought, and the user's score is the
    reciprocal rank of the first relevant item (0 if none lands in the
    top 10).  NDCG answers "is the list graded well overall"; MRR/Hit
    answer "does the first thing a user wants surface" — the pair
    every retrieval launch review wants together.

    Reciprocal ranks come from a precomputed 1e6//r literal table, so
    the report is exact integer ppm.  Scale shape: the parsed
    projection (JSON extraction is the row-linear cost here) is
    persisted so the log is scanned and parsed exactly once — no
    shuffle added, both the map-combined catalog aggregate and the
    filtered purchase-pair distinct read the cached projection; the
    catalog ranking broadcasts onto the purchased pairs and the
    per-user min-rank rollup reduces to one row.
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    e = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            json_long().alias("item"),
            "event_type",
        )
        .filter(F.col("item").isNotNull())
        .persist()
    )
    per = e.groupBy("item").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "n_views"
        )
    )
    sys_rk = F.row_number().over(
        Window.orderBy(F.desc("n_views"), F.asc("item"))
    )
    catalog = per.select("item", sys_rk.alias("sys_rk"))
    bought = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", "item")
        .distinct()
    )
    best = (
        bought.join(F.broadcast(catalog), "item")
        .groupBy("user_id")
        .agg(F.min("sys_rk").cast("long").alias("best_rk"))
    )
    recip = F.array(*[F.lit(r) for r in _MRR_RECIP])
    out = best.agg(
        F.count(F.lit(1)).cast("long").alias("n_users_eval"),
        F.sum(
            F.when(F.col("best_rk") <= NDCG_K, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_hits_at_k"),
        F.sum(
            F.when(
                F.col("best_rk") <= NDCG_K,
                F.element_at(recip, F.col("best_rk").cast("int")),
            ).otherwise(0)
        )
        .cast("decimal(38,0)")
        .alias("sum_recip_micro"),
    ).select(
        "n_users_eval",
        "n_hits_at_k",
        F.expr(
            "CAST(CAST(n_hits_at_k AS DECIMAL(38,0)) * 1000000"
            " DIV n_users_eval AS BIGINT)"
        ).alias("hit_rate_ppm"),
        F.expr(
            "CAST(sum_recip_micro DIV n_users_eval AS BIGINT)"
        ).alias("mrr_ppm"),
    )
    return scoped_cache(out, e)


def _mrr_recip_case(rank_col: str) -> str:
    whens = " ".join(
        f"WHEN {i + 1} THEN {v}" for i, v in enumerate(_MRR_RECIP)
    )
    return f"CASE {rank_col} {whens} ELSE 0 END"


MRR_EVAL_SQL = f"""
WITH base AS (
  SELECT user_id,
         TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) AS item,
         event_type
  FROM events WHERE TRY_CAST(CASE WHEN regexp_matches(trim(json_extract_string(props, '$.k')), '^[+-]?[0-9]+$') THEN trim(json_extract_string(props, '$.k')) END AS BIGINT) IS NOT NULL
),
per AS (
  SELECT item,
         sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_views
  FROM base GROUP BY item
),
catalog AS (
  SELECT item, row_number() OVER (ORDER BY n_views DESC, item ASC) AS sys_rk
  FROM per
),
bought AS (
  SELECT DISTINCT user_id, item FROM base WHERE event_type = 'purchase'
),
best AS (
  SELECT b.user_id, CAST(min(c.sys_rk) AS BIGINT) AS best_rk
  FROM bought b JOIN catalog c USING (item)
  GROUP BY b.user_id
)
SELECT CAST(count(*) AS BIGINT) AS n_users_eval,
       CAST(sum(CASE WHEN best_rk <= {NDCG_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hits_at_k,
       CAST(sum(CASE WHEN best_rk <= {NDCG_K} THEN 1 ELSE 0 END)::HUGEINT
            * 1000000 // count(*) AS BIGINT) AS hit_rate_ppm,
       CAST(sum(CASE WHEN best_rk <= {NDCG_K}
                     THEN {_mrr_recip_case('best_rk')} ELSE 0 END)::HUGEINT
            // count(*) AS BIGINT) AS mrr_ppm
FROM best
"""


SPARK_QUERIES = {
    "tfidf_topk_similar": tfidf_topk_similar,
    "ndcg_at_k_eval": ndcg_at_k_eval,
    "mrr_hit_rate_eval": mrr_hit_rate_eval,
    "bm25_keyword_search": bm25_keyword_search,
    "hybrid_rrf_search": hybrid_rrf_search,
}

ORACLE_SQL = {
    "tfidf_topk_similar": TFIDF_TOPK_SQL,
    "bm25_keyword_search": BM25_SQL,
    "hybrid_rrf_search": HYBRID_RRF_SQL,
    "ndcg_at_k_eval": NDCG_EVAL_SQL,
    "mrr_hit_rate_eval": MRR_EVAL_SQL,
}
