"""Corpus-level statistics operators for training-data curation.

Beyond the reference's surface (it has no text ops — SURVEY.md §2.5):
the two corpus passes every large-scale pretraining pipeline runs
before (and after) filtering:

* ``text_repetition_filter`` — Gopher-style repetition signals per
  document (top-2-gram fraction, top-3-gram fraction, duplicated
  5-gram fraction) plus the keep/drop verdict.  Repetition is the
  strongest single predictor of low-quality machine-generated text
  (Rae et al. 2021, "Scaling Language Models: ... Gopher", §A1.1).
* ``corpus_vocab_topk`` — corpus-wide term and document frequencies,
  top-k by collection frequency: the vocabulary-seed / word-count pass
  a BPE tokenizer trainer starts from.

Scale notes (100 TB):

* One ``repartition(doc_id)`` up front, then the position window and
  every n-gram count reuse that partitioning — per-doc work never
  crosses executors again (HashPartitioning on ``doc_id`` satisfies
  the clustered distribution of every ``(doc_id, gram)`` aggregate),
  so the whole per-document path is one shuffle wide.
* The vocabulary pass is the classic two-phase count: map-side partial
  aggregation absorbs the Zipf head (the hottest tokens are exactly
  the ones partial agg compresses best), and doc-frequency dedups
  ``(token, doc_id)`` *within* the doc-partitioned stage before the
  token-keyed shuffle.
* Top-k is ``TakeOrderedAndProject`` — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.cachescope import scoped_cache
from projet_meteo_etl_spark.catalog import load_table, spread_scan
from projet_meteo_etl_spark.functions.portable import pround, pround_sql
from projet_meteo_etl_spark.functions.twopass import bucket_prefix

_WS = r"\s+"

#: Gopher-ish thresholds (Rae et al. 2021 table A1; adapted to word
#: grams): drop when the most frequent 2-gram covers > 20% of 2-grams,
#: the most frequent 3-gram > 18%, or duplicated 5-grams > 30%.
TOP2_MAX = 0.20
TOP3_MAX = 0.18
DUP5_MAX = 0.30


def _doc_tokens(d: DataFrame) -> DataFrame:
    """(doc_id, pos, tok), partitioned by doc_id so every downstream
    per-doc aggregate is exchange-free."""
    return (
        d.repartition("doc_id")
        .select(
            "doc_id",
            F.posexplode(F.split(F.trim("text"), _WS)).alias("pos", "tok"),
        )
    )


def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition profile + keep verdict.

    ONE pass over the corpus builds all three gram sizes: a single
    position window (four ``lead``s over the same (doc_id, pos) frame),
    the three gram strings stacked into (n, gram) rows by an in-plan
    ``explode`` (no second scan — Spark does not dedupe repeated plan
    subtrees, so the naive "one aggregate per gram size" formulation
    scans and shuffles the corpus three times), then counted by
    ``(doc_id, n, gram)`` and reduced per document with conditional
    aggregates — every aggregate reuses the initial doc-keyed
    partitioning, so the whole per-doc path is one wide shuffle:

    * ``top{2,3}_frac`` — max gram count / total grams of that size
    * ``dup5_frac`` — fraction of 5-gram instances whose gram occurs
      more than once in the document
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _doc_tokens(d)
    w = Window.partitionBy("doc_id").orderBy("pos")
    stacked = (
        toks.select(
            "doc_id",
            "tok",
            *[F.lead("tok", i).over(w).alias(f"t{i}") for i in (1, 2, 3, 4)],
        )
        .select(
            "doc_id",
            F.explode(
                F.array(
                    F.struct(
                        F.lit(2).alias("n"),
                        F.when(
                            F.col("t1").isNotNull(),
                            F.concat_ws(" ", "tok", "t1"),
                        ).alias("gram"),
                    ),
                    F.struct(
                        F.lit(3).alias("n"),
                        F.when(
                            F.col("t2").isNotNull(),
                            F.concat_ws(" ", "tok", "t1", "t2"),
                        ).alias("gram"),
                    ),
                    F.struct(
                        F.lit(5).alias("n"),
                        F.when(
                            F.col("t4").isNotNull(),
                            F.concat_ws(" ", "tok", "t1", "t2", "t3", "t4"),
                        ).alias("gram"),
                    ),
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.n").alias("n"), F.col("s.gram").alias("gram"))
        .filter(F.col("gram").isNotNull())
    )
    cnt = stacked.groupBy("doc_id", "n", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )

    def only(n: int, expr):
        return F.when(F.col("n") == n, expr)

    stats = cnt.groupBy("doc_id").agg(
        F.max(only(2, F.col("cnt"))).alias("top_g2"),
        F.sum(only(2, F.col("cnt"))).alias("tot_g2"),
        F.max(only(3, F.col("cnt"))).alias("top_g3"),
        F.sum(only(3, F.col("cnt"))).alias("tot_g3"),
        F.sum(
            only(5, F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(0))
        ).alias("dup_g5"),
        F.sum(only(5, F.col("cnt"))).alias("tot_g5"),
    )
    base = d.select("doc_id", "lang")

    def frac(num, den):
        return F.when(
            F.coalesce(den, F.lit(0)) == 0, F.lit(0.0)
        ).otherwise(num / den)

    top2 = frac(F.col("top_g2"), F.col("tot_g2"))
    top3 = frac(F.col("top_g3"), F.col("tot_g3"))
    dup5 = frac(F.col("dup_g5"), F.col("tot_g5"))
    return (
        base.join(stats, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("tot_g2", F.lit(0)).cast("long").alias("n_bigrams"),
            pround(top2, 6).alias("top2_frac"),
            pround(top3, 6).alias("top3_frac"),
            pround(dup5, 6).alias("dup5_frac"),
            (
                (pround(top2, 6) <= TOP2_MAX)
                & (pround(top3, 6) <= TOP3_MAX)
                & (pround(dup5, 6) <= DUP5_MAX)
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


TEXT_REPETITION_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
         generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) AS pos
  FROM documents
),
g AS (
  SELECT doc_id, tok,
         lead(tok, 1) OVER w AS t1, lead(tok, 2) OVER w AS t2,
         lead(tok, 3) OVER w AS t3, lead(tok, 4) OVER w AS t4
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
c2 AS (
  SELECT doc_id, tok || ' ' || t1 AS gram, count(*) AS cnt
  FROM g WHERE t1 IS NOT NULL GROUP BY 1, 2
),
s2 AS (SELECT doc_id, max(cnt) AS top_g2, sum(cnt) AS tot_g2 FROM c2 GROUP BY 1),
c3 AS (
  SELECT doc_id, tok || ' ' || t1 || ' ' || t2 AS gram, count(*) AS cnt
  FROM g WHERE t2 IS NOT NULL GROUP BY 1, 2
),
s3 AS (SELECT doc_id, max(cnt) AS top_g3, sum(cnt) AS tot_g3 FROM c3 GROUP BY 1),
c5 AS (
  SELECT doc_id,
         tok || ' ' || t1 || ' ' || t2 || ' ' || t3 || ' ' || t4 AS gram,
         count(*) AS cnt
  FROM g WHERE t4 IS NOT NULL GROUP BY 1, 2
),
s5 AS (
  SELECT doc_id, sum(cnt) AS tot_g5,
         sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS dup_g5
  FROM c5 GROUP BY 1
),
j AS (
  SELECT d.doc_id, d.lang,
    CAST(coalesce(s2.tot_g2, 0) AS BIGINT) AS n_bigrams,
    floor((CASE WHEN coalesce(s2.tot_g2, 0) = 0 THEN 0.0
           ELSE s2.top_g2 * 1.0 / s2.tot_g2 END) * 1000000.0 + 0.5) / 1000000.0 AS top2_frac,
    floor((CASE WHEN coalesce(s3.tot_g3, 0) = 0 THEN 0.0
           ELSE s3.top_g3 * 1.0 / s3.tot_g3 END) * 1000000.0 + 0.5) / 1000000.0 AS top3_frac,
    floor((CASE WHEN coalesce(s5.tot_g5, 0) = 0 THEN 0.0
           ELSE s5.dup_g5 * 1.0 / s5.tot_g5 END) * 1000000.0 + 0.5) / 1000000.0 AS dup5_frac
  FROM documents d
  LEFT JOIN s2 ON s2.doc_id = d.doc_id
  LEFT JOIN s3 ON s3.doc_id = d.doc_id
  LEFT JOIN s5 ON s5.doc_id = d.doc_id
)
SELECT doc_id, lang, n_bigrams, top2_frac, top3_frac, dup5_frac,
       (top2_frac <= {TOP2_MAX} AND top3_frac <= {TOP3_MAX}
        AND dup5_frac <= {DUP5_MAX}) AS keep
FROM j
ORDER BY doc_id
"""


#: vocabulary size to keep (ties broken by token text, so the cut is
#: deterministic across engines and cluster layouts)
VOCAB_K = 100


def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: collection frequency + document frequency per
    token, top ``VOCAB_K`` by collection frequency (tie → token asc).

    The doc-frequency side dedups ``(doc_id, tok)`` while still
    partitioned by doc_id (exchange-free), so the only token-keyed
    shuffle carries one row per distinct (doc, token) — at 100 TB this
    is the standard word-count whose map-side combine does the heavy
    lifting; the final top-k never sorts the full vocabulary.
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    d = load_table(spark, sf_dir, "documents")
    # two consumers (tf and the distinct doc-frequency side) — persist
    # so tokenize + repartition runs once, not per branch
    toks = _doc_tokens(d).persist()
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = (
        toks.select("doc_id", "tok")
        .distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    out = (
        tf.join(df_, "tok")
        .select(F.col("tok").alias("token"), "tf", "df")
        .orderBy(F.desc("tf"), F.asc("token"))
        .limit(VOCAB_K)
    )
    return scoped_cache(out, toks)


CORPUS_VOCAB_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents
),
tf AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
df AS (
  SELECT tok, count(*) AS df
  FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok
)
SELECT tf.tok AS token, tf.tf AS tf, df.df AS df
FROM tf JOIN df ON tf.tok = df.tok
ORDER BY tf.tf DESC, token ASC
LIMIT {VOCAB_K}
"""


#: fixed-point scale for per-bigram conditional probabilities
LM_SCALE = 1_000_000


def bigram_lm_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model score per document — the
    classic perplexity-style quality signal (KenLM-filter style) with
    the model trained on the corpus itself.

    Per-bigram conditional probability P(w2|w1) = c(w1,w2)/c(w1,·) is
    materialized as the INTEGER ``(c_big * 1_000_000) div c_uni`` —
    bigram and prefix counts are exact corpus-wide integers, so every
    per-doc score is a ratio of two integer sums: bit-identical across
    partitionings and engines (float log-prob sums would be neither).

    Scale shape: token stream stays partitioned by doc_id through the
    lead() window (no exchange after the repartition in _doc_tokens);
    the model is a (w1,w2)-keyed aggregate joined back to the bigram
    stream on the same key — at 100 TB this is two word-count shuffles
    plus one equi-join, with map-side combine doing the heavy lifting.
    The bigram stream feeds three consumers, so it is persisted for
    the duration of the query rather than recomputed.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        _doc_tokens(d)
        .select(
            "doc_id",
            F.col("tok").alias("w1"),
            F.lead("tok").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .persist()
    )
    c_big = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_big"))
    c_uni = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c_uni"))
    term = c_big.join(c_uni, "w1").select(
        "w1",
        "w2",
        F.expr(f"(c_big * {LM_SCALE}) div c_uni").alias("t"),
    )
    out = (
        big.join(term, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("t").alias("sum_t"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "sum_t",
            pround(
                F.col("sum_t") / (F.col("n_bigrams") * float(LM_SCALE)), 9
            ).alias("lm_score"),
        )
        .orderBy("doc_id")
    )
    return scoped_cache(out, big)


BIGRAM_LM_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
         generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) AS pos
  FROM documents
),
bg AS (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, tok AS w1,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM toks
  ) WHERE w2 IS NOT NULL
),
cb AS (SELECT w1, w2, count(*) AS c_big FROM bg GROUP BY w1, w2),
cu AS (SELECT w1, count(*) AS c_uni FROM bg GROUP BY w1),
term AS (
  SELECT cb.w1, cb.w2, (cb.c_big * {LM_SCALE}) // cu.c_uni AS t
  FROM cb JOIN cu ON cb.w1 = cu.w1
)
SELECT b.doc_id,
       count(*) AS n_bigrams,
       CAST(sum(t.t) AS BIGINT) AS sum_t,
       {pround_sql(f'sum(t.t) * 1.0 / (count(*) * {LM_SCALE}.0)', 9)} AS lm_score
FROM bg b JOIN term t ON b.w1 = t.w1 AND b.w2 = t.w2
GROUP BY b.doc_id
ORDER BY b.doc_id
"""


#: Zipf fit depth and the fixed-point log scale (1000 matches the
#: floor(1000·ln) convention proven portable in operators/retrieval.py)
ZIPF_K = 100
ZIPF_LOG_SCALE = 1000


def vocab_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS fit of ln(frequency) against ln(rank) over the top-``ZIPF_K``
    vocabulary terms — the Zipf exponent (slope ≈ −1 for natural text)
    as a one-row corpus health metric.

    Logs are floored to integer milli-nats per term (the same
    fixed-point trick as the TF-IDF weights), so the regression moments
    are exact integer sums; slope/intercept/r² are then a fixed double
    expression over those integers — engine-exact.  The fit runs over
    ``ZIPF_K`` rows, so everything after the word-count is free.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = _doc_tokens(d)
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    # top-k FIRST (per-partition heaps, no global vocab sort), then the
    # rank window runs over only ZIPF_K rows
    topk = tf.orderBy(F.desc("tf"), F.asc("tok")).limit(ZIPF_K)
    rn = Window.orderBy(F.desc("tf"), F.asc("tok"))
    top = (
        topk.withColumn("rank", F.row_number().over(rn))
        .select(
            F.floor(F.lit(float(ZIPF_LOG_SCALE)) * F.log("rank"))
            .cast("long")
            .alias("lx"),
            F.floor(F.lit(float(ZIPF_LOG_SCALE)) * F.log("tf"))
            .cast("long")
            .alias("ly"),
        )
    )
    m = top.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("ly") * F.col("ly")).alias("syy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    sxy = F.col("sxy").cast("double")
    cov_n = n * sxy - sx * sy
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    slope = cov_n / var_x
    return m.select(
        F.col("n").alias("n_terms"),
        pround(slope, 6).alias("zipf_slope"),
        pround((sy - slope * sx) / (n * F.lit(float(ZIPF_LOG_SCALE))), 6).alias(
            "intercept_nats"
        ),
        pround((cov_n * cov_n) / (var_x * var_y), 6).alias("r_squared"),
    )


VOCAB_ZIPF_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents
),
tf AS (SELECT tok, count(*) AS tf FROM toks GROUP BY tok),
top AS (
  SELECT CAST(floor({ZIPF_LOG_SCALE}.0 * ln(rank)) AS BIGINT) AS lx,
         CAST(floor({ZIPF_LOG_SCALE}.0 * ln(tf)) AS BIGINT) AS ly
  FROM (
    SELECT tf, row_number() OVER (ORDER BY tf DESC, tok ASC) AS rank FROM tf
  ) WHERE rank <= {ZIPF_K}
),
m AS (
  SELECT count(*) AS n, sum(lx) AS sx, sum(ly) AS sy,
         sum(lx * lx) AS sxx, sum(ly * ly) AS syy, sum(lx * ly) AS sxy
  FROM top
)
SELECT n AS n_terms,
  {pround_sql('(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))', 6)} AS zipf_slope,
  {pround_sql(f'(CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE)) / (CAST(n AS DOUBLE) * {ZIPF_LOG_SCALE}.0)', 6)} AS intercept_nats,
  {pround_sql('((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))) / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))', 6)} AS r_squared
FROM m
"""


def corpus_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of the per-document token-count distribution —
    the one-number "is my corpus dominated by a few huge documents"
    inequality metric (0 = perfectly even, →1 = concentrated).

    Exact formula on sorted counts: ``G = (2·Σ i·x_i) / (n·Σ x_i)
    − (n+1)/n`` with rank i from one ordered window — every sum is an
    integer (rank × token-count products fit BIGINT far beyond this
    corpus; DECIMAL(38) at 100 TB), so G is a fixed expression over
    exact integers.  The rank is two-pass (no single-partition sort):
    documents bucket by token count div 64 (bounded by the max document
    LENGTH, not the doc count), exclusive prefix-counts over the bucket
    rollup supply the rank offset, and a window partitioned by bucket
    finishes — hash-identical to the global ordered window.
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    d = load_table(spark, sf_dir, "documents")
    # counts feeds BOTH the bucket-prefix rollup and the ranked join —
    # persist so the expensive tokenize+explode pass runs once (the
    # same shared-input rule as quality_score_calibration's "17× wall"
    # note); released via scoped_cache when the result is collected.
    counts = (
        _doc_tokens(d)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("x"))
        .withColumn("xbucket", F.expr("x div 64"))
        .persist()
    )
    pre = bucket_prefix(
        counts, "xbucket", {"n": (F.count(F.lit(1)), "sum")}
    )
    wo = Window.partitionBy("xbucket").orderBy("x", "doc_id")
    ranked = counts.join(F.broadcast(pre), "xbucket").select(
        F.col("x").cast("decimal(38,0)").alias("x"),
        (F.coalesce("pre_n", F.lit(0)) + F.row_number().over(wo))
        .cast("long")
        .alias("i"),
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("i")).alias("sxi"),
    )
    n = F.col("n").cast("double")
    g = (
        (F.lit(2.0) * F.col("sxi").cast("double"))
        / (n * F.col("sx").cast("double"))
        - (n + 1.0) / n
    )
    return scoped_cache(
        m.select(
            F.col("n").alias("n_docs"),
            F.col("sx").cast("long").alias("total_tokens"),
            pround(g, 6).alias("gini"),
        ),
        counts,
    )


CORPUS_GINI_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents
),
counts AS (SELECT doc_id, count(*) AS x FROM toks GROUP BY doc_id),
ranked AS (
  SELECT CAST(x AS HUGEINT) AS x,
         row_number() OVER (ORDER BY x, doc_id) AS i
  FROM counts
),
m AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(x * i) AS sxi FROM ranked
)
SELECT n AS n_docs, CAST(sx AS BIGINT) AS total_tokens,
       floor(((2.0 * CAST(sxi AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
              - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE)) * 1000000.0 + 0.5)
         / 1000000.0 AS gini
FROM m
"""


#: PMI mining: minimum co-document support and report size
PMI_MIN_SUPPORT = 5
PMI_TOP_N = 25
#: fixed-point ln scale (milli-nats), matching plans/experiments.py
ENT_SCALE = 1000


def token_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top token pairs by document-level pointwise
    mutual information ``ln(N·c_xy / (c_x·c_y))``, support ≥
    ``PMI_MIN_SUPPORT`` — the association measure behind phrase
    detection and vocab merging.

    Presence sets are distinct (doc, token); the pair count is a
    self-equi-join on doc_id (never a cross join) with ``t1 < t2``.
    PMI is floored to integer milli-nats from exact integer counts, so
    ordering and values are engine-identical; ties at the report
    boundary break on the token pair.  At web scale the join needs a
    ``max_df`` stop-token prune (as in the shingle dedups) — the
    synthetic 31-term vocabulary makes every term common, so none is
    applied here.
    """
    d = load_table(spark, sf_dir, "documents")
    pres = (
        _doc_tokens(d)
        .select("doc_id", "tok")
        .distinct()
        .persist()  # feeds doc-freq AND both pair-join sides
    )
    n_docs = d.count()  # scalar the driver owns (embedded as literal)
    df_ = pres.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    a = pres.select("doc_id", F.col("tok").alias("t1"))
    b = pres.select("doc_id", F.col("tok").alias("t2"))
    co = (
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= PMI_MIN_SUPPORT)
    )
    d1 = df_.select(F.col("tok").alias("t1"), F.col("df").alias("c_x"))
    d2 = df_.select(F.col("tok").alias("t2"), F.col("df").alias("c_y"))
    pmi = F.floor(
        F.log(
            F.lit(float(n_docs))
            * F.col("c_xy")
            / (F.col("c_x") * F.col("c_y"))
        )
        * ENT_SCALE
    ).cast("long")
    out = (
        co.join(F.broadcast(d1), "t1")
        .join(F.broadcast(d2), "t2")
        .select("t1", "t2", "c_xy", pmi.alias("pmi_millinats"))
        .orderBy(F.desc("pmi_millinats"), F.asc("t1"), F.asc("t2"))
        .limit(PMI_TOP_N)
    )
    return scoped_cache(out, pres)


def _pmi_sql() -> str:
    # N comes from a COUNT over the same table the Spark side counts
    return rf"""
WITH pres AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents
),
n AS (SELECT count(*) AS n_docs FROM documents),
df AS (SELECT tok, count(*) AS df FROM pres GROUP BY tok),
co AS (
  SELECT a.tok AS t1, b.tok AS t2, count(*) AS c_xy
  FROM pres a JOIN pres b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY a.tok, b.tok
  HAVING count(*) >= {PMI_MIN_SUPPORT}
)
SELECT co.t1, co.t2, co.c_xy,
       CAST(floor(ln(CAST(n.n_docs AS DOUBLE) * co.c_xy
                     / (d1.df * d2.df)) * {ENT_SCALE}) AS BIGINT)
         AS pmi_millinats
FROM co
JOIN df d1 ON d1.tok = co.t1
JOIN df d2 ON d2.tok = co.t2
CROSS JOIN n
ORDER BY pmi_millinats DESC, co.t1 ASC, co.t2 ASC
LIMIT {PMI_TOP_N}
"""


#: train split share for the held-out LM eval — the same hash rule as
#: plans/curation.train_test_split_report, so the split this evaluator
#: scores is the split the curation report audits.
LM_TRAIN_PCT = 90


def _train_split_bigram_lp(d):
    """Shared hash-split Laplace bigram LM (the perplexity-filter
    model): returns ``(big, score)`` where ``big`` is the persisted
    (doc_id, w1, w2, is_train) bigram stream and ``score(t)`` attaches
    the integer-micronat log-prob column ``lp`` to any (doc_id, w1, w2)
    relation.  Single source of truth for :func:`lm_holdout_nll` and
    :func:`perplexity_bucket_filter` — model changes (smoothing, the
    empty-train-split guard) apply to both or neither."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    big = (
        _doc_tokens(d)
        .select(
            "doc_id",
            F.col("tok").alias("w1"),
            F.lead("tok").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .withColumn("is_train", (h % 100) < LM_TRAIN_PCT)
        .persist()
    )
    train = big.filter("is_train")
    cb = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_big"))
    cu = train.groupBy("w1").agg(F.count(F.lit(1)).alias("c_uni"))
    vocab = train.agg(F.count_distinct("w2").alias("v"))

    def score(t):
        return (
            t.join(cb, ["w1", "w2"], "left")
            .join(F.broadcast(cu), "w1", "left")
            .crossJoin(F.broadcast(vocab))
            .select(
                "doc_id",
                # greatest(·,1): an empty train split (v = 0) must yield the
                # same explicit finite score in BOTH engines, not
                # Spark-Infinity vs DuckDB-divergence (the rocchio
                # zero-guard discipline)
                F.floor(
                    F.log(
                        (F.coalesce("c_big", F.lit(0)) + F.lit(1.0))
                        / (F.coalesce("c_uni", F.lit(0))
                           + F.greatest(F.col("v"), F.lit(1)))
                    )
                    * DSIR_LIKE_SCALE
                )
                .cast("long")
                .alias("lp"),
            )
        )

    return big, score



def lm_holdout_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out language-model evaluation: train a Laplace-smoothed
    bigram LM on the hash-deterministic 90% train split, score every
    TEST document's average negative log-likelihood per bigram — the
    train/eval separation :func:`bigram_lm_doc_scores` (trained on the
    whole corpus) deliberately skips, and the perplexity-filter shape
    real pipelines use (score corpus with an out-of-domain-trained LM,
    drop the tail).

    P(w2|w1) = (c(w1,w2)+1) / (c(w1,·)+V), V = train successor
    vocabulary.  Each bigram's log-prob is quantized to integer
    micronats BEFORE the per-doc sum (the DSIR convention), so document
    scores are exact integer sums — order-independent, engine-exact.
    Unseen test bigrams smooth to 1/(c+V); unseen prefixes to 1/V.

    Scale: the model is a train-bigram-type-keyed aggregate (vocab²
    bound, corpus-independent); scoring is one equi-join of the test
    bigram stream against it plus a broadcast prefix-count join.  The
    split is a pure hash of doc_id — no shuffle to assign it.
    """
    d = load_table(spark, sf_dir, "documents")
    big, score = _train_split_bigram_lp(d)
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    scored = score(
        big.filter(~F.col("is_train")).select("doc_id", "w1", "w2")
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("lp").cast("long").alias("sum_lp_micronats"),
    )
    test_docs = d.filter((h % 100) >= LM_TRAIN_PCT).select("doc_id", "lang")
    out = (
        test_docs.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("sum_lp_micronats", F.lit(0))
            .cast("long")
            .alias("sum_lp_micronats"),
            F.when(F.coalesce("n_bigrams", F.lit(0)) == 0, F.lit(0))
            .otherwise(
                F.expr("(-sum_lp_micronats) div n_bigrams")
            )
            .cast("long")
            .alias("avg_nll_micronats"),
        )
        .orderBy("doc_id")
    )
    return scoped_cache(out, big)


#: micronat quantization, matching operators/importance.DSIR_SCALE
DSIR_LIKE_SCALE = 1_000_000


#: shared oracle CTE chain for the hash-split Laplace bigram LM — the
#: DuckDB twin of _train_split_bigram_lp; `{test_filter}` restricts the
#: scored stream ('WHERE NOT t.is_train' for held-out eval, '' for
#: score-everything).  Keep in lockstep with the Spark helper.
_LM_SCORED_CTE = rf"""toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
         generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) AS pos
  FROM documents
),
bg AS (
  SELECT doc_id, w1, w2,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100)
           < {LM_TRAIN_PCT} AS is_train
  FROM (
    SELECT doc_id, tok AS w1,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM toks
  ) WHERE w2 IS NOT NULL
),
cb AS (SELECT w1, w2, count(*) AS c_big FROM bg WHERE is_train GROUP BY 1, 2),
cu AS (SELECT w1, count(*) AS c_uni FROM bg WHERE is_train GROUP BY 1),
voc AS (SELECT count(DISTINCT w2) AS v FROM bg WHERE is_train),
scored AS (
  SELECT t.doc_id,
         CAST(floor(ln((coalesce(cb.c_big, 0) + 1.0)
                       / (coalesce(cu.c_uni, 0) + greatest(voc.v, 1)))
                    * 1000000) AS BIGINT) AS lp
  FROM bg t
  LEFT JOIN cb ON t.w1 = cb.w1 AND t.w2 = cb.w2
  LEFT JOIN cu ON t.w1 = cu.w1
  CROSS JOIN voc
  {{test_filter}}
),
per_doc AS (
  SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS sum_lp
  FROM scored GROUP BY 1
)"""


LM_HOLDOUT_SQL = rf"""
WITH {_LM_SCORED_CTE.format(test_filter="WHERE NOT t.is_train")}
SELECT d.doc_id, d.lang,
       CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(p.sum_lp, 0) AS BIGINT) AS sum_lp_micronats,
       CAST(CASE WHEN coalesce(p.n_bigrams, 0) = 0 THEN 0
            ELSE (-p.sum_lp) // p.n_bigrams END AS BIGINT) AS avg_nll_micronats
FROM documents d
LEFT JOIN per_doc p ON d.doc_id = p.doc_id
WHERE (('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT % 100)
      >= {LM_TRAIN_PCT}
ORDER BY d.doc_id
"""


#: DoReMi reweighting step: excess loss is quantized to 1/40-nat
#: units and applied as a base-2 multiplicative boost (2^k with k
#: integer — exact in int64, no exp()), capped so one hot domain
#: cannot overflow the weight pool
DOREMI_STEP_MICRONATS = 25_000
DOREMI_K_CAP = 30
#: uniform-smoothing mass, DoReMi's (1−s)·w + s·u with s = 1e-3
DOREMI_SMOOTH_PPM = 1_000


def doremi_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi-style domain-reweighting step (Xie et al. 2023,
    "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining"): per training domain (= ``source``), compare the
    held-out loss of the MIXTURE-trained model against a
    DOMAIN-specialized reference; domains the mixture model underfits
    (positive excess loss) get multiplicatively up-weighted, then the
    weights are uniform-smoothed — the Group-DRO update that produces
    the sampling mixture for the next training round.

    Relational instantiation with the :func:`lm_holdout_nll`
    machinery: the proxy is the Laplace-smoothed bigram LM trained on
    the hash-deterministic 90% train split over ALL sources; the
    per-domain reference is the same LM trained on the domain's own
    train split.  gap_i = NLL_mix,i − NLL_dom,i in integer micronats.
    Because softmax is shift-invariant — w ∝ u·exp(η·(x−c)) equals
    w ∝ u·exp(η·x) for any constant c — the update uses excess_i =
    gap_i − min_j gap_j, which is EXACTLY the unclipped DoReMi step
    (the clip at 0 never binds after the shift) and stays
    signal-bearing even when the reference's smaller training split
    makes every raw gap negative, the smoothing artifact a literal
    max(0, gap) would collapse to all-zeros on.  Domains with no
    held-out bigrams sit at excess 0 and are excluded from the min.

    **No-transcendental update** (the ``mixture_temperature_weights``
    discipline): instead of exp(η·excess) — whose cross-engine
    rounding is not guaranteed — the exponentiated-gradient step is
    parameterized base-2 with a quantized exponent: boost_i =
    2^min(excess_i DIV 250000 µn, 30), an exact int64.  raw_i =
    token-share_ppm,i · boost_i in DECIMAL(38,0)/HUGEINT, normalized
    by truncating division, then smoothed:
    ((1e6−s)·w + s·(1e6 DIV n_domains)) DIV 1e6 with s = 1000 ppm.

    Scale: two bigram-type-keyed model aggregates (vocab²-bounded,
    corpus-independent), one scoring pass over held-out bigrams with
    the domain model joined on (source, w1, w2), and a |domains|-row
    weight computation.  The corpus is scanned once into the persisted
    bigram relation.
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("doc_id").orderBy("pos")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    big = (
        d.repartition("doc_id")
        .select(
            "doc_id",
            "source",
            F.posexplode(F.split(F.trim("text"), _WS)).alias("pos", "tok"),
        )
        .select(
            "doc_id",
            "source",
            F.col("tok").alias("w1"),
            F.lead("tok").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .withColumn("is_train", (h % 100) < LM_TRAIN_PCT)
        .persist()
    )
    train = big.filter("is_train")
    cb_g = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cbg"))
    cu_g = train.groupBy("w1").agg(F.count(F.lit(1)).alias("cug"))
    v_g = train.agg(F.count_distinct("w2").alias("vg"))
    cb_d = train.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).alias("cbd")
    )
    cu_d = train.groupBy("source", "w1").agg(F.count(F.lit(1)).alias("cud"))
    v_d = train.groupBy("source").agg(F.count_distinct("w2").alias("vd"))

    lp = lambda c_big, c_uni, v: F.floor(  # noqa: E731
        F.log(
            (F.coalesce(c_big, F.lit(0)) + F.lit(1.0))
            / (F.coalesce(c_uni, F.lit(0)) + F.col(v))
        )
        * DSIR_LIKE_SCALE
    ).cast("long")

    scored = (
        big.filter(~F.col("is_train"))
        .select("source", "w1", "w2")
        .join(cb_g, ["w1", "w2"], "left")
        .join(F.broadcast(cu_g), "w1", "left")
        .crossJoin(F.broadcast(v_g))
        .join(cb_d, ["source", "w1", "w2"], "left")
        .join(F.broadcast(cu_d), ["source", "w1"], "left")
        .join(F.broadcast(v_d), "source")
        .select(
            "source",
            lp(F.col("cbg"), F.col("cug"), "vg").alias("lp_mix"),
            lp(F.col("cbd"), F.col("cud"), "vd").alias("lp_dom"),
        )
    )
    per_src = scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_test_bigrams"),
        F.sum("lp_mix").cast("long").alias("s_mix"),
        F.sum("lp_dom").cast("long").alias("s_dom"),
    )
    share = big.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams")
    )
    tot = share.agg(F.sum("n_bigrams").alias("n_total"))
    stage = (
        share.join(per_src, "source", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_bigrams",
            F.coalesce("n_test_bigrams", F.lit(0)).alias("n_test_bigrams"),
            F.expr(
                "CAST(CAST(n_bigrams AS DECIMAL(38,0)) * 1000000"
                " DIV n_total AS BIGINT)"
            ).alias("baseline_ppm"),
            F.expr(
                "CASE WHEN coalesce(n_test_bigrams, 0) = 0 THEN 0"
                " ELSE (-s_mix) DIV n_test_bigrams END"
            ).alias("mix_nll_micronats"),
            F.expr(
                "CASE WHEN coalesce(n_test_bigrams, 0) = 0 THEN 0"
                " ELSE (-s_dom) DIV n_test_bigrams END"
            ).alias("dom_nll_micronats"),
        )
        .withColumn(
            "gap_micronats",
            F.expr("mix_nll_micronats - dom_nll_micronats"),
        )
        .persist()
    )
    mins = stage.agg(
        F.min(
            F.expr(
                "CASE WHEN n_test_bigrams > 0 THEN gap_micronats END"
            )
        ).alias("min_gap")
    )
    boosted = (
        stage.crossJoin(F.broadcast(mins))
        .withColumn(
            "excess_micronats",
            F.expr(
                "CASE WHEN n_test_bigrams = 0 OR min_gap IS NULL THEN 0"
                " ELSE gap_micronats - min_gap END"
            ),
        )
        .withColumn(
            "boost_k",
            F.expr(
                f"least(excess_micronats DIV {DOREMI_STEP_MICRONATS},"
                f" {DOREMI_K_CAP})"
            ),
        )
        .withColumn(
            "raw",
            F.expr(
                "CAST(baseline_ppm AS DECIMAL(38,0))"
                " * shiftleft(CAST(1 AS BIGINT), CAST(boost_k AS INT))"
            ),
        )
        .persist()
    )
    tot2 = boosted.agg(
        F.sum("raw").alias("raw_sum"),
        F.count(F.lit(1)).alias("n_domains"),
    )
    out = (
        boosted.crossJoin(F.broadcast(tot2))
        .select(
            "source",
            "n_bigrams",
            "n_test_bigrams",
            "baseline_ppm",
            "mix_nll_micronats",
            "dom_nll_micronats",
            "gap_micronats",
            "excess_micronats",
            "boost_k",
            F.expr("CAST(raw * 1000000 DIV raw_sum AS BIGINT)").alias(
                "dro_weight_ppm"
            ),
            F.expr(
                f"CAST(((1000000 - {DOREMI_SMOOTH_PPM})"
                f" * (raw * 1000000 DIV raw_sum)"
                f" + {DOREMI_SMOOTH_PPM} * (1000000 DIV n_domains))"
                f" DIV 1000000 AS BIGINT)"
            ).alias("doremi_weight_ppm"),
        )
        .orderBy("source")
    )
    return scoped_cache(out, big, stage, boosted)


DOREMI_SQL = rf"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
         generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1)
           AS pos
  FROM documents
),
bg AS (
  SELECT doc_id, source, w1, w2,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100)
           < {LM_TRAIN_PCT} AS is_train
  FROM (
    SELECT doc_id, source, tok AS w1,
           lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM toks
  ) WHERE w2 IS NOT NULL
),
cbg AS (SELECT w1, w2, count(*) AS cbg FROM bg WHERE is_train GROUP BY 1, 2),
cug AS (SELECT w1, count(*) AS cug FROM bg WHERE is_train GROUP BY 1),
vg AS (SELECT count(DISTINCT w2) AS vg FROM bg WHERE is_train),
cbd AS (SELECT source, w1, w2, count(*) AS cbd FROM bg WHERE is_train
        GROUP BY 1, 2, 3),
cud AS (SELECT source, w1, count(*) AS cud FROM bg WHERE is_train
        GROUP BY 1, 2),
vd AS (SELECT source, count(DISTINCT w2) AS vd FROM bg WHERE is_train
       GROUP BY 1),
scored AS (
  SELECT t.source,
         CAST(floor(ln((coalesce(cbg.cbg, 0) + 1.0)
                       / (coalesce(cug.cug, 0) + vg.vg))
                    * 1000000) AS BIGINT) AS lp_mix,
         CAST(floor(ln((coalesce(cbd.cbd, 0) + 1.0)
                       / (coalesce(cud.cud, 0) + vd.vd))
                    * 1000000) AS BIGINT) AS lp_dom
  FROM bg t
  LEFT JOIN cbg ON t.w1 = cbg.w1 AND t.w2 = cbg.w2
  LEFT JOIN cug ON t.w1 = cug.w1
  CROSS JOIN vg
  LEFT JOIN cbd ON t.source = cbd.source AND t.w1 = cbd.w1
               AND t.w2 = cbd.w2
  LEFT JOIN cud ON t.source = cud.source AND t.w1 = cud.w1
  JOIN vd ON t.source = vd.source
  WHERE NOT t.is_train
),
per_src AS (
  SELECT source, count(*) AS n_test_bigrams,
         sum(lp_mix) AS s_mix, sum(lp_dom) AS s_dom
  FROM scored GROUP BY 1
),
share AS (SELECT source, count(*) AS n_bigrams FROM bg GROUP BY 1),
tot AS (SELECT sum(n_bigrams) AS n_total FROM share),
stage AS (
  SELECT s.source, s.n_bigrams,
         coalesce(p.n_test_bigrams, 0) AS n_test_bigrams,
         CAST(CAST(s.n_bigrams AS HUGEINT) * 1000000 // t.n_total
           AS BIGINT) AS baseline_ppm,
         CASE WHEN coalesce(p.n_test_bigrams, 0) = 0 THEN 0
              ELSE (-p.s_mix) // p.n_test_bigrams END AS mix_nll_micronats,
         CASE WHEN coalesce(p.n_test_bigrams, 0) = 0 THEN 0
              ELSE (-p.s_dom) // p.n_test_bigrams END AS dom_nll_micronats
  FROM share s LEFT JOIN per_src p ON s.source = p.source
  CROSS JOIN tot t
),
gapped AS (
  SELECT *, mix_nll_micronats - dom_nll_micronats AS gap_micronats
  FROM stage
),
mins AS (
  SELECT min(CASE WHEN n_test_bigrams > 0 THEN gap_micronats END)
           AS min_gap
  FROM gapped
),
boosted AS (
  SELECT g.*,
         CASE WHEN g.n_test_bigrams = 0 OR m.min_gap IS NULL THEN 0
              ELSE g.gap_micronats - m.min_gap END AS excess_micronats,
         least((CASE WHEN g.n_test_bigrams = 0 OR m.min_gap IS NULL
                     THEN 0
                     ELSE g.gap_micronats - m.min_gap END)
                 // {DOREMI_STEP_MICRONATS}, {DOREMI_K_CAP}) AS boost_k,
         CAST(g.baseline_ppm AS HUGEINT)
           * (CAST(1 AS BIGINT)
              << CAST(least((CASE WHEN g.n_test_bigrams = 0
                                   OR m.min_gap IS NULL THEN 0
                             ELSE g.gap_micronats - m.min_gap END)
                              // {DOREMI_STEP_MICRONATS},
                            {DOREMI_K_CAP}) AS INT)) AS raw
  FROM gapped g CROSS JOIN mins m
),
tot2 AS (SELECT sum(raw) AS raw_sum, count(*) AS n_domains FROM boosted)
SELECT b.source,
       CAST(b.n_bigrams AS BIGINT) AS n_bigrams,
       CAST(b.n_test_bigrams AS BIGINT) AS n_test_bigrams,
       CAST(b.baseline_ppm AS BIGINT) AS baseline_ppm,
       CAST(b.mix_nll_micronats AS BIGINT) AS mix_nll_micronats,
       CAST(b.dom_nll_micronats AS BIGINT) AS dom_nll_micronats,
       CAST(b.gap_micronats AS BIGINT) AS gap_micronats,
       CAST(b.excess_micronats AS BIGINT) AS excess_micronats,
       CAST(b.boost_k AS BIGINT) AS boost_k,
       CAST(b.raw * 1000000 // t.raw_sum AS BIGINT) AS dro_weight_ppm,
       CAST(((1000000 - {DOREMI_SMOOTH_PPM})
             * (b.raw * 1000000 // t.raw_sum)
             + {DOREMI_SMOOTH_PPM} * (1000000 // t.n_domains))
            // 1000000 AS BIGINT) AS doremi_weight_ppm
FROM boosted b CROSS JOIN tot2 t
ORDER BY b.source
"""


#: top-K vocabulary for the OOV-coverage audit — deliberately SMALLER
#: than the corpus vocabulary (31 distinct tokens in the driver data)
#: so the out-of-vocabulary tail is non-empty and the audit has signal
OOV_VOCAB_K = 16


def oov_rate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-coverage audit: per source, the token volume NOT
    covered by the global top-``OOV_VOCAB_K`` vocabulary (by collection
    frequency, ties by token) — the pre-tokenizer-training check that
    decides whether a fixed vocab budget covers every source, or a
    long-tail source will explode into UNK/byte fallbacks.

    Scale shape: the vocabulary is K rows — broadcast into the token
    scan as a left anti/semi membership probe; the only shuffle is the
    per-source aggregate.  All outputs are integers (ppm via DIV).
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    d = load_table(spark, sf_dir, "documents")
    # two consumers (vocab ranking + the membership probe) — persist so
    # tokenize runs once; released when the result is dropped
    toks = _doc_tokens(d).filter(F.length("tok") > 0).persist()
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.desc("tf"), F.asc("tok"))
        .limit(OOV_VOCAB_K)
        .select("tok")
    )
    src = d.select("doc_id", "source")
    flagged = (
        toks.join(F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "tok", "left")
        .join(src, "doc_id")
    )
    out = (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_ppm",
            F.expr(
                "CAST(CAST(n_oov AS DECIMAL(38,0)) * 1000000"
                " DIV n_tokens AS BIGINT)"
            ),
        )
        .orderBy("source")
    )
    return scoped_cache(out, toks)


OOV_RATE_SQL = rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents
),
toksf AS (SELECT * FROM toks WHERE length(tok) > 0),
vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS tf FROM toksf GROUP BY tok
    ORDER BY tf DESC, tok ASC LIMIT {OOV_VOCAB_K}
  )
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       CAST(CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS HUGEINT)
         * 1000000 // count(*) AS BIGINT) AS oov_ppm
FROM toksf t
LEFT JOIN vocab v USING (tok)
JOIN documents d USING (doc_id)
GROUP BY d.source
ORDER BY d.source
"""


#: pooled decile ranks evaluated by the quantile-alignment audit
QA_DECILES = tuple(range(1, 10))


def source_quantile_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile alignment of the document-length
    distribution against the POOLED deciles — the distribution-drift
    panel mixture tuning reads: a source whose mass sits in the pooled
    top decile will dominate token budgets however its row share looks.
    For every pooled decile boundary d10..d90 (rank-selected on the
    pooled n_chars rollup), each source reports the ppm of ITS docs at
    or below that boundary; a perfectly aligned source reads
    100k/200k/…/900k.

    Everything runs on length-domain rollups: the pooled boundary pick
    is a prefix-sum rank selection, and the per-source CDF evaluation
    joins the 9-row broadcast boundary table to the per-(source,
    distinct-length) rollup — no row-level sort anywhere.
    """
    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    pooled = d.groupBy("n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    wcum = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = pooled.select(
        "n_chars",
        F.sum("cnt").over(wcum).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).cast("long").alias("n"),
    )
    deciles = spark.createDataFrame(
        [(q,) for q in QA_DECILES], "decile int"
    )
    bounds = (
        cum.crossJoin(F.broadcast(deciles))
        .filter(F.expr("cum >= (decile * n + 9) DIV 10"))
        .groupBy("decile")
        .agg(F.min("n_chars").alias("boundary_chars"))
    )
    per_src = d.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    src_tot = per_src.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_src")
    )
    at_or_below = (
        per_src.crossJoin(F.broadcast(bounds))
        .filter(F.col("n_chars") <= F.col("boundary_chars"))
        .groupBy("source", "decile")
        .agg(F.sum("cnt").cast("long").alias("n_below"))
    )
    # full (source × decile) grid: a source with nothing below a
    # boundary must report 0 ppm, not vanish from the panel
    grid = src_tot.crossJoin(F.broadcast(bounds))
    return (
        grid.join(at_or_below, ["source", "decile"], "left")
        .select(
            "source",
            "decile",
            "boundary_chars",
            F.coalesce("n_below", F.lit(0)).cast("long").alias("n_below"),
            "n_src",
            F.expr(
                "CAST(CAST(coalesce(n_below, 0) AS DECIMAL(38,0))"
                " * 1000000 DIV n_src AS BIGINT)"
            ).alias("frac_ppm"),
        )
        .orderBy("source", "decile")
    )


QUANTILE_ALIGN_SQL = f"""
WITH pooled AS (
  SELECT n_chars, CAST(count(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1
),
cum AS (
  SELECT n_chars,
         sum(cnt) OVER (ORDER BY n_chars
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         CAST(sum(cnt) OVER () AS BIGINT) AS n
  FROM pooled
),
deciles AS (SELECT unnest([{', '.join(str(q) for q in QA_DECILES)}]) AS decile),
bounds AS (
  SELECT decile, min(n_chars) AS boundary_chars
  FROM cum, deciles
  WHERE cum >= (decile * n + 9) // 10
  GROUP BY decile
),
per_src AS (
  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS cnt
  FROM documents GROUP BY 1, 2
),
src_tot AS (
  SELECT source, CAST(sum(cnt) AS BIGINT) AS n_src FROM per_src GROUP BY 1
)
, at_or_below AS (
  SELECT p.source, b.decile, CAST(sum(p.cnt) AS BIGINT) AS n_below
  FROM per_src p CROSS JOIN bounds b
  WHERE p.n_chars <= b.boundary_chars
  GROUP BY 1, 2
)
SELECT t.source, CAST(b.decile AS INT) AS decile, b.boundary_chars,
       CAST(coalesce(a.n_below, 0) AS BIGINT) AS n_below, t.n_src,
       CAST(coalesce(a.n_below, 0)::HUGEINT * 1000000 // t.n_src AS BIGINT)
         AS frac_ppm
FROM src_tot t
CROSS JOIN bounds b
LEFT JOIN at_or_below a ON a.source = t.source AND a.decile = b.decile
ORDER BY t.source, decile
"""


def heaps_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: the doc stream cut into 10
    doc-id deciles, reporting per decile how many NEVER-BEFORE-SEEN
    terms appear and the cumulative vocabulary — the saturation read
    that sizes tokenizer vocabularies and predicts how much new data a
    vocab refresh actually buys (a flattening curve means more corpus
    adds tokens, not words).

    "First seen in decile b" is just ``min(bucket)`` per term — one
    token-keyed map-combinable aggregate, no ordered scan of the
    corpus; deciles are doc-id VALUE ranges (``doc_id·10 DIV (max+1)``,
    broadcast max), so no corpus-sized ranking window exists anywhere.
    The 0..9 spine is explicit, so an empty decile (tiny subsets)
    reports zeros instead of vanishing.
    """
    d = load_table(spark, sf_dir, "documents")
    mx = d.agg(F.max("doc_id").alias("mx"))
    docs = d.crossJoin(F.broadcast(mx)).select(
        "doc_id",
        "text",
        F.expr("CAST(least(9, doc_id * 10 DIV (mx + 1)) AS INT)").alias(
            "bucket"
        ),
    )
    # split('') yields a single empty-string token for blank documents;
    # drop it so '' never counts as a vocabulary term or in n_tokens
    # (keeps blank-text semantics consistent with ws_token_count)
    toks = docs.select(
        "bucket", F.explode(F.split(F.trim("text"), _WS)).alias("tok")
    ).filter(F.col("tok") != "")
    per_tok = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    per_docs = docs.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    new_terms = (
        toks.groupBy("tok")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new_terms"))
    )
    spine = spark.createDataFrame([(b,) for b in range(10)], "bucket int")
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(per_docs, "bucket", "left")
        .join(per_tok, "bucket", "left")
        .join(new_terms, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_new_terms", F.lit(0))
            .cast("long")
            .alias("n_new_terms"),
        )
        .withColumn(
            "cum_terms", F.sum("n_new_terms").over(w).cast("long")
        )
        .orderBy("bucket")
    )


HEAPS_GROWTH_SQL = r"""
WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
docs AS (
  SELECT doc_id, text,
         CAST(least(9, doc_id * 10 // (mx + 1)) AS INTEGER) AS bucket
  FROM documents, mx
),
toks AS (
  SELECT bucket, tok FROM (
    SELECT bucket, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
    FROM docs
  ) WHERE tok <> ''
),
per_tok AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY 1
),
per_docs AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs FROM docs GROUP BY 1
),
new_terms AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_new_terms FROM (
    SELECT tok, min(bucket) AS bucket FROM toks GROUP BY tok
  ) GROUP BY 1
),
spine AS (SELECT unnest(generate_series(0, 9)) AS bucket)
SELECT CAST(s.bucket AS INTEGER) AS bucket,
       CAST(coalesce(d.n_docs, 0) AS BIGINT) AS n_docs,
       CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(n.n_new_terms, 0) AS BIGINT) AS n_new_terms,
       CAST(sum(coalesce(n.n_new_terms, 0)) OVER (ORDER BY s.bucket
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_terms
FROM spine s
LEFT JOIN per_docs d ON d.bucket = s.bucket
LEFT JOIN per_tok t ON t.bucket = s.bucket
LEFT JOIN new_terms n ON n.bucket = s.bucket
ORDER BY bucket
"""


#: vocabulary budgets evaluated by the coverage curve
COVERAGE_BUDGETS = (1_000, 2_000, 5_000, 10_000, 20_000)


def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass coverage of the best-K vocabulary for each budget K —
    the curve a tokenizer budget is chosen from ("32k covers 99.1%,
    64k buys 0.4 more"): what fraction of all token OCCURRENCES the K
    highest-frequency terms cover.

    Computed WITHOUT ranking the vocabulary: coverage at K only needs
    the tf of the K-th term, and that is a rank selection on the
    per-DISTINCT-TF rollup (terms-with-tf ≥ t cumulative), which is
    value-domain bounded — a corpus with billions of distinct tokens
    never sees a vocab-wide sort/window.  Tie terms at the cut share a
    tf, so the partial take ``cum_mass(t*) − (cum_terms(t*) − K)·t*``
    is tie-invariant and exact; budgets beyond the vocabulary clamp to
    full coverage.  All integers, ppm by one truncating division.
    """
    d = load_table(spark, sf_dir, "documents")
    # blank documents split to one '' token — exclude it from the
    # vocabulary and the token mass (same convention as ws_token_count)
    tf = (
        spread_scan(d.select("text"))
        .select(F.explode(F.split(F.trim("text"), _WS)).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    roll = tf.groupBy("tf").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms")
    )
    w = Window.orderBy(F.desc("tf")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = roll.select(
        "tf",
        F.sum("n_terms").over(w).cast("long").alias("cum_terms"),
        F.sum(F.expr("CAST(tf AS DECIMAL(38,0)) * n_terms"))
        .over(w)
        .alias("cum_mass"),
    )
    tot = roll.agg(
        F.sum("n_terms").cast("long").alias("vocab_size"),
        F.sum(F.expr("CAST(tf AS DECIMAL(38,0)) * n_terms")).alias(
            "total_mass"
        ),
    )
    budgets = spark.createDataFrame(
        [(k,) for k in COVERAGE_BUDGETS], "k_budget long"
    )
    picked = (
        cum.crossJoin(F.broadcast(budgets))
        .filter(F.col("cum_terms") >= F.col("k_budget"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("k_budget").orderBy(F.desc("tf"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            "k_budget",
            F.expr(
                "CAST(cum_mass - (cum_terms - k_budget)"
                " * CAST(tf AS DECIMAL(38,0)) AS DECIMAL(38,0))"
            ).alias("covered"),
        )
    )
    return (
        budgets.join(picked, "k_budget", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "k_budget",
            "vocab_size",
            F.coalesce("covered", F.col("total_mass"))
            .cast("long")
            .alias("covered_tokens"),
            F.col("total_mass").cast("long").alias("total_tokens"),
            # empty-corpus guard: total_mass = 0 ⇒ Spark DIV NULL vs
            # DuckDB // raise — pin both to 0
            F.expr(
                "CAST(CASE WHEN total_mass = 0 THEN 0"
                " ELSE coalesce(covered, total_mass) * 1000000"
                " DIV total_mass END AS BIGINT)"
            ).alias("coverage_ppm"),
        )
        .orderBy("k_budget")
    )


VOCAB_COVERAGE_SQL = rf"""
WITH tf AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> '' GROUP BY tok
),
roll AS (SELECT tf, CAST(count(*) AS BIGINT) AS n_terms FROM tf GROUP BY tf),
cum AS (
  SELECT tf,
         CAST(sum(n_terms) OVER w AS BIGINT) AS cum_terms,
         sum(tf::HUGEINT * n_terms) OVER w AS cum_mass
  FROM roll
  WINDOW w AS (ORDER BY tf DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
tot AS (
  SELECT CAST(sum(n_terms) AS BIGINT) AS vocab_size,
         sum(tf::HUGEINT * n_terms) AS total_mass
  FROM roll
),
budgets AS (
  SELECT unnest([{', '.join(str(k) for k in COVERAGE_BUDGETS)}])::BIGINT
    AS k_budget
),
picked AS (
  SELECT k_budget,
         cum_mass - (cum_terms - k_budget) * tf::HUGEINT AS covered
  FROM (
    SELECT b.k_budget, c.tf, c.cum_terms, c.cum_mass,
           row_number() OVER (PARTITION BY b.k_budget
                              ORDER BY c.tf DESC) AS rn
    FROM cum c CROSS JOIN budgets b
    WHERE c.cum_terms >= b.k_budget
  ) WHERE rn = 1
)
SELECT b.k_budget, t.vocab_size,
       CAST(coalesce(p.covered, t.total_mass) AS BIGINT) AS covered_tokens,
       CAST(t.total_mass AS BIGINT) AS total_tokens,
       CAST(CASE WHEN t.total_mass = 0 THEN 0
            ELSE coalesce(p.covered, t.total_mass) * 1000000
                 // t.total_mass END AS BIGINT) AS coverage_ppm
FROM budgets b
LEFT JOIN picked p USING (k_budget)
CROSS JOIN tot t
ORDER BY b.k_budget
"""



def perplexity_bucket_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document with the train-split bigram LM and split each
    source into head / middle / tail by per-source perplexity-value
    terciles — the curation primitive that keeps the "head" (most
    LM-like) slice of a crawl and drops or down-samples the tail.

    Buckets are VALUE cutoffs, CCNet's own semantics (a document
    belongs to head iff its perplexity ≤ the source's 33% cutoff), not
    exact rank terciles: the cutoffs come from a cumulative window
    over the per-(source, score)-VALUE rollup, so the only window runs
    over the score value domain — never a doc-count-sized sort (the
    ``user_value_deciles`` two-pass discipline).  Scoring reuses the
    :func:`lm_holdout_nll` model shape: Laplace-smoothed bigram LM on
    the hash-deterministic {LM_TRAIN_PCT}% train split, per-bigram
    log-probs quantized to integer micronats BEFORE the per-doc sum, so
    every downstream number is an exact integer.

    Scale: the LM is a bigram-type-keyed aggregate (vocab²-bounded,
    corpus-independent); scoring is one equi-join of the bigram stream
    against it; the rollup/cutoff pass is value-domain-bounded; bucket
    assignment is a |sources|-row broadcast join.
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    d = load_table(spark, sf_dir, "documents")
    big, score = _train_split_bigram_lp(d)
    scored = score(big.select("doc_id", "w1", "w2"))
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("lp").cast("long").alias("sum_lp"),
    )
    docs = (
        d.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.when(F.coalesce("n_bigrams", F.lit(0)) == 0, F.lit(0))
            .otherwise(F.expr("(-sum_lp) div n_bigrams"))
            .cast("long")
            .alias("nll"),
        )
        .persist()
    )
    roll = docs.groupBy("source", "nll").agg(
        F.count(F.lit(1)).alias("n")
    )
    wv = Window.partitionBy("source").orderBy("nll").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = roll.withColumn("cum", F.sum("n").over(wv))
    tot = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    cuts = (
        cum.join(tot, "source")
        .groupBy("source")
        .agg(
            F.min(F.when(F.col("cum") * 3 >= F.col("n_src"), F.col("nll")))
            .cast("long")
            .alias("cut33"),
            F.min(
                F.when(F.col("cum") * 3 >= 2 * F.col("n_src"), F.col("nll"))
            )
            .cast("long")
            .alias("cut66"),
        )
    )
    bucketed = docs.join(F.broadcast(cuts), "source").withColumn(
        "bucket",
        F.when(F.col("nll") <= F.col("cut33"), F.lit("head"))
        .when(F.col("nll") <= F.col("cut66"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
    out = (
        bucketed.groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
            # per-doc NLLs are micronat-bounded, but the SUM is
            # doc-count-scaled: widen before the mean division
            F.expr(
                "CAST(sum(CAST(nll AS DECIMAL(38,0))) DIV count(1)"
                " AS BIGINT)"
            ).alias("mean_nll_micronats"),
            F.min("nll").cast("long").alias("min_nll_micronats"),
            F.max("nll").cast("long").alias("max_nll_micronats"),
            F.max("cut33").cast("long").alias("cut33_micronats"),
            F.max("cut66").cast("long").alias("cut66_micronats"),
        )
        .orderBy("source", "bucket")
    )
    return scoped_cache(out, big, docs)


PERPLEXITY_BUCKET_SQL = rf"""
WITH {_LM_SCORED_CTE.format(test_filter="")},
docs AS (
  SELECT d.doc_id, d.source,
         CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         CAST(CASE WHEN coalesce(p.n_bigrams, 0) = 0 THEN 0
              ELSE (-p.sum_lp) // p.n_bigrams END AS BIGINT) AS nll
  FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
),
roll AS (SELECT source, nll, count(*) AS n FROM docs GROUP BY 1, 2),
cum AS (
  SELECT source, nll, sum(n) OVER (PARTITION BY source ORDER BY nll
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM roll
),
tot AS (SELECT source, count(*) AS n_src FROM docs GROUP BY 1),
cuts AS (
  SELECT c.source,
         CAST(min(CASE WHEN c.cum * 3 >= t.n_src THEN c.nll END)
           AS BIGINT) AS cut33,
         CAST(min(CASE WHEN c.cum * 3 >= 2 * t.n_src THEN c.nll END)
           AS BIGINT) AS cut66
  FROM cum c JOIN tot t ON c.source = t.source
  GROUP BY 1
),
bucketed AS (
  SELECT d.source,
         CASE WHEN d.nll <= k.cut33 THEN 'head'
              WHEN d.nll <= k.cut66 THEN 'middle'
              ELSE 'tail' END AS bucket,
         d.n_bigrams, d.nll, k.cut33, k.cut66
  FROM docs d JOIN cuts k ON d.source = k.source
)
SELECT source, bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
       CAST(sum(nll::HUGEINT) // count(*) AS BIGINT) AS mean_nll_micronats,
       CAST(min(nll) AS BIGINT) AS min_nll_micronats,
       CAST(max(nll) AS BIGINT) AS max_nll_micronats,
       CAST(max(cut33) AS BIGINT) AS cut33_micronats,
       CAST(max(cut66) AS BIGINT) AS cut66_micronats
FROM bucketed
GROUP BY source, bucket
ORDER BY source, bucket
"""


SPARK_QUERIES = {
    "vocab_coverage_curve": vocab_coverage_curve,
    "heaps_vocab_growth": heaps_vocab_growth,
    "source_quantile_alignment": source_quantile_alignment,
    "text_repetition_filter": text_repetition_filter,
    "oov_rate_audit": oov_rate_audit,
    "corpus_vocab_topk": corpus_vocab_topk,
    "bigram_lm_doc_scores": bigram_lm_doc_scores,
    "lm_holdout_nll": lm_holdout_nll,
    "perplexity_bucket_filter": perplexity_bucket_filter,
    "doremi_mixture_weights": doremi_mixture_weights,
    "vocab_zipf_fit": vocab_zipf_fit,
    "corpus_token_gini": corpus_token_gini,
    "token_pmi_topk": token_pmi_topk,
}

ORACLE_SQL = {
    "doremi_mixture_weights": DOREMI_SQL,
    "vocab_coverage_curve": VOCAB_COVERAGE_SQL,
    "heaps_vocab_growth": HEAPS_GROWTH_SQL,
    "source_quantile_alignment": QUANTILE_ALIGN_SQL,
    "text_repetition_filter": TEXT_REPETITION_SQL,
    "oov_rate_audit": OOV_RATE_SQL,
    "corpus_vocab_topk": CORPUS_VOCAB_SQL,
    "bigram_lm_doc_scores": BIGRAM_LM_SQL,
    "lm_holdout_nll": LM_HOLDOUT_SQL,
    "perplexity_bucket_filter": PERPLEXITY_BUCKET_SQL,
    "vocab_zipf_fit": VOCAB_ZIPF_SQL,
    "corpus_token_gini": CORPUS_GINI_SQL,
    "token_pmi_topk": _pmi_sql(),
}


#: terms graded by the dispersion audit (by corpus tf, ties token asc)
DISP_TOP_K = 25


def term_dispersion_dp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gries' DP dispersion for the top-``DISP_TOP_K`` corpus terms —
    the "is this term EVERYWHERE or bursty in one source" statistic the
    frequency panel (Zipf/Heaps/Gini/PMI) lacks: ``DP = ½ Σ_s |v_s −
    p_s|``, where ``v_s`` is the share of the term's occurrences in
    source s and ``p_s`` is source s's share of all tokens.  DP ≈ 0:
    the term is distributed exactly like the corpus (a true stopword);
    DP → 1: concentrated in one source — exactly the distinction a
    mixture tuner or stopword-list builder needs beyond raw tf.

    Exact integer ppm shares (DECIMAL/HUGEINT-widened ×1e6 — corpus tf
    clears 9.2e12 at 100 TB), one trunc division per cell, and the
    term×source grid carries EXPLICIT zero cells (an absent source
    contributes its full ``p_s`` to the sum — the spine-join
    discipline of ``t_closeness_audit``).

    Scale: one tokenize pass → (term, source) rollup (map-combinable);
    everything after is top-k×|sources| — constant-bounded.
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    d = load_table(spark, sf_dir, "documents")
    toks = d.repartition("doc_id").select(
        "source", F.explode(F.split(F.trim("text"), _WS)).alias("tok")
    )
    ts = toks.groupBy("tok", "source").agg(
        F.count(F.lit(1)).alias("tf_ts")
    ).persist()
    tf_t = ts.groupBy("tok").agg(F.sum("tf_ts").alias("tf"))
    top = tf_t.orderBy(F.desc("tf"), F.asc("tok")).limit(DISP_TOP_K)
    src_tok = ts.groupBy("source").agg(F.sum("tf_ts").alias("tok_s"))
    total = src_tok.agg(F.sum("tok_s").alias("tok_total"))
    grid = (
        top.crossJoin(F.broadcast(src_tok))
        .join(ts, ["tok", "source"], "left")
        .na.fill(0, ["tf_ts"])
        .crossJoin(F.broadcast(total))
        .select(
            "tok",
            "tf",
            "tf_ts",
            F.expr(
                "CAST(CAST(tf_ts AS DECIMAL(38,0)) * 1000000"
                " DIV tf AS BIGINT)"
            ).alias("v_ppm"),
            F.expr(
                "CAST(CAST(tok_s AS DECIMAL(38,0)) * 1000000"
                " DIV tok_total AS BIGINT)"
            ).alias("p_ppm"),
        )
    )
    out = (
        grid.groupBy("tok", "tf")
        .agg(
            F.sum((F.col("tf_ts") > 0).cast("long")).alias("n_sources"),
            F.expr(
                "CAST(sum(abs(v_ppm - p_ppm)) DIV 2 AS BIGINT)"
            ).alias("dp_ppm"),
        )
        .select(
            F.col("tok").alias("token"),
            F.col("tf").cast("long").alias("tf"),
            "n_sources",
            "dp_ppm",
        )
        .orderBy(F.desc("dp_ppm"), F.asc("token"))
    )
    return scoped_cache(out, ts)


TERM_DISPERSION_SQL = rf"""
WITH toks AS (
  SELECT source,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents
),
ts AS (
  SELECT tok, source, CAST(count(*) AS HUGEINT) AS tf_ts
  FROM toks GROUP BY tok, source
),
tf_t AS (SELECT tok, sum(tf_ts) AS tf FROM ts GROUP BY tok),
top AS (
  SELECT tok, tf FROM tf_t ORDER BY tf DESC, tok ASC LIMIT {DISP_TOP_K}
),
src_tok AS (SELECT source, sum(tf_ts) AS tok_s FROM ts GROUP BY source),
total AS (SELECT sum(tok_s) AS tok_total FROM src_tok),
grid AS (
  SELECT t.tok, t.tf, coalesce(ts.tf_ts, 0) AS tf_ts,
         CAST(CAST(coalesce(ts.tf_ts, 0) AS HUGEINT) * 1000000 // t.tf
           AS BIGINT) AS v_ppm,
         CAST(CAST(s.tok_s AS HUGEINT) * 1000000 // x.tok_total
           AS BIGINT) AS p_ppm
  FROM top t
  CROSS JOIN src_tok s
  LEFT JOIN ts ON ts.tok = t.tok AND ts.source = s.source
  CROSS JOIN total x
)
SELECT tok AS token, CAST(tf AS BIGINT) AS tf,
       CAST(sum(CASE WHEN tf_ts > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sources,
       CAST(sum(abs(v_ppm - p_ppm)) // 2 AS BIGINT) AS dp_ppm
FROM grid
GROUP BY tok, tf
ORDER BY dp_ppm DESC, token ASC
"""


SPARK_QUERIES["term_dispersion_dp"] = term_dispersion_dp
ORACLE_SQL["term_dispersion_dp"] = TERM_DISPERSION_SQL
