"""Data-selection operators: DSIR importance weighting + boilerplate
segment filtering.

Beyond the reference's surface (it has no corpus-selection ops) — these
are the two standard "choose what to train on" passes of a large-scale
LLM data pipeline:

* **DSIR** (Data Selection with Importance Resampling, Xie et al. 2023,
  arXiv:2302.03169): score every document by the log-likelihood ratio
  of a target-domain n-gram feature model vs the raw-corpus model,
  over hashed unigram features.  Documents whose ratio is positive
  look more like the target domain than the generic corpus.
* **Boilerplate segment filter** (the CCNet/RefinedWeb shape): hash
  fixed-width token segments, count how many documents each segment
  appears in, and flag documents dominated by corpus-frequent
  (boilerplate) segments.

Engine mapping — both are two-pass shuffle-partitioned plans:

* pass 1 builds a small corpus-level model (B=1024 hashed-bucket count
  table for DSIR; the segment document-frequency table for
  boilerplate) — bounded size regardless of corpus size (B buckets;
  segments with df>cap only), so pass 2 consumes it as a BROADCAST
  join against the per-doc features: the big side never reshuffles.
* all hashes are portable md5-prefix integers and every per-doc score
  is an integer sum of integer per-feature scores (ln quantized to
  micronats FIRST, like operators.experiments' entropy/PMI precedent),
  so both operators oracle-check bit-exactly.

At 100 TB: pass 1 is a wordcount (map-side combine, B-bounded result);
pass 2 is scan + broadcast join + per-doc agg — no n², no driver
collect, no skew-sensitive key (buckets are md5-uniform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table, spread_scan
from projet_meteo_etl_spark.functions.portable import pround, pround_sql

_WS = r"\s+"

#: DSIR hashed-feature buckets (2^10 — large enough that the synthetic
#: vocab doesn't alias much, small enough that the model table always
#: broadcasts)
DSIR_BUCKETS = 1024
#: target domain for the importance ratio: English documents
DSIR_TARGET_LANG = "en"
#: ln quantization scale (micronats), matching the entropy/PMI ops
DSIR_SCALE = 1_000_000

#: boilerplate segments: non-overlapping word windows of this width
SEG_WIDTH = 8
#: a segment present in more than this many documents is boilerplate
SEG_MAX_DF = 16
#: documents with more than this fraction of boilerplate segments drop
SEG_MAX_RATIO = 0.5


def _hashed_tokens(d: DataFrame) -> DataFrame:
    """(doc_id, b) — one row per token instance, bucketed by the
    portable 60-bit md5-prefix hash mod ``DSIR_BUCKETS``."""
    return (
        spread_scan(d.select("doc_id", "text"))
        .select("doc_id", F.explode(F.split(F.trim("text"), _WS)).alias("tok"))
        .filter(F.length("tok") > 0)
        .select(
            "doc_id",
            (
                F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
                % DSIR_BUCKETS
            ).alias("b"),
        )
    )


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance weight in integer micronats.

    weight(doc) = Σ_tokens ln( p_target(bucket) / p_source(bucket) )
    with add-one smoothing, where target = ``lang='en'`` docs and
    source = the whole corpus.  The per-bucket log-ratio is quantized
    to micronats BEFORE the per-doc sum, so the document score is an
    exact integer sum (order-independent, engine-exact).

    Output: one row per doc — token count, weight, and the resampling
    keep flag (weight > 0 ⇔ doc looks more target-like than generic).
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    d = load_table(spark, sf_dir, "documents")
    # per-(doc, bucket) counts feed BOTH the model build and the scoring
    # pass — persist the reduced form (≤ docs×B rows, far smaller than
    # the token stream it replaces)
    doc_b = (
        _hashed_tokens(d)
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )

    # pass 1: the two count models, B-bounded (≤1024 rows) regardless
    # of corpus size — this is the "model" DSIR trains.  Totals derive
    # from the bucket tables (no extra corpus pass).
    tgt_ids = d.filter(F.col("lang") == DSIR_TARGET_LANG).select("doc_id")
    cnt_s = doc_b.groupBy("b").agg(F.sum("c").alias("c_s"))
    cnt_t = (
        doc_b.join(F.broadcast(tgt_ids), "doc_id")
        .groupBy("b")
        .agg(F.sum("c").alias("c_t"))
    )
    tot_s = cnt_s.agg(F.sum("c_s").alias("n_s"))
    tot_t = cnt_t.agg(F.sum("c_t").alias("n_t"))

    ratio = (
        cnt_s.join(cnt_t, "b", "left")
        .na.fill(0, ["c_t"])
        .crossJoin(F.broadcast(tot_s))
        .crossJoin(F.broadcast(tot_t))
        .select(
            "b",
            F.floor(
                (
                    F.log((F.col("c_t") + 1.0) / (F.col("n_t") + F.lit(float(DSIR_BUCKETS))))
                    - F.log((F.col("c_s") + 1.0) / (F.col("n_s") + F.lit(float(DSIR_BUCKETS))))
                )
                * DSIR_SCALE
            )
            .cast("long")
            .alias("ir"),
        )
    )

    # pass 2: per-doc bucket counts ⋈ broadcast(model) → integer sum
    out = (
        doc_b.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("ir")).cast("long").alias("weight_micronats"),
        )
        .withColumn("keep", (F.col("weight_micronats") > 0).cast("int"))
        .orderBy("doc_id")
    )
    return scoped_cache(out, doc_b)


DSIR_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % {DSIR_BUCKETS} AS b
  FROM (
    SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
    FROM documents
  ) WHERE length(tok) > 0
),
tgt AS (SELECT doc_id FROM documents WHERE lang = '{DSIR_TARGET_LANG}'),
cnt_s AS (SELECT b, count(*) AS c_s FROM toks GROUP BY b),
cnt_t AS (SELECT b, count(*) AS c_t FROM toks JOIN tgt USING (doc_id) GROUP BY b),
tot_s AS (SELECT count(*) AS n_s FROM toks),
tot_t AS (SELECT count(*) AS n_t FROM toks JOIN tgt USING (doc_id)),
ratio AS (
  SELECT cnt_s.b,
         CAST(floor((ln((coalesce(c_t, 0) + 1.0) / (n_t + {DSIR_BUCKETS}.0))
                     - ln((c_s + 1.0) / (n_s + {DSIR_BUCKETS}.0)))
                    * {DSIR_SCALE}) AS BIGINT) AS ir
  FROM cnt_s LEFT JOIN cnt_t ON cnt_s.b = cnt_t.b
  CROSS JOIN tot_s CROSS JOIN tot_t
),
doc_b AS (SELECT doc_id, b, count(*) AS c FROM toks GROUP BY doc_id, b)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(sum(c * ir) AS BIGINT) AS weight_micronats,
       CAST(CASE WHEN CAST(sum(c * ir) AS BIGINT) > 0 THEN 1 ELSE 0 END
            AS INTEGER) AS keep
FROM doc_b JOIN ratio USING (b)
GROUP BY doc_id
ORDER BY doc_id
"""


def boilerplate_segment_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate ratio over non-overlapping
    ``SEG_WIDTH``-token segments, with the corpus-frequent segment
    table built in the same plan.

    A segment appearing (distinctly) in more than ``SEG_MAX_DF``
    documents is boilerplate; a document with more than
    ``SEG_MAX_RATIO`` boilerplate segments is dropped.  Output: per-doc
    segment counts, ratio, and keep flag.

    Scale: the boilerplate table is df-capped exactly like the
    stop-shingle set (≤ |corpus|/df distinct segments), so it
    broadcasts; per-doc work is a pure projection + one groupBy.
    """
    d = load_table(spark, sf_dir, "documents")
    seg_expr = F.expr(
        f"case when size(tk) >= {SEG_WIDTH} then "
        f"transform(sequence(0, size(tk) div {SEG_WIDTH} - 1), "
        f"i -> concat_ws(' ', slice(tk, i * {SEG_WIDTH} + 1, {SEG_WIDTH}))) "
        f"else array() end"
    )
    segs = (
        spread_scan(d.select("doc_id", F.split(F.trim("text"), _WS).alias("tk")))
        .select("doc_id", F.explode(seg_expr).alias("seg"))
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("seg"), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    # document frequency per segment (distinct doc)
    boiler = (
        segs.distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > SEG_MAX_DF)
        .select("h")
    )
    flagged = segs.join(F.broadcast(boiler).withColumn("is_b", F.lit(1)), "h", "left")
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            F.sum(F.coalesce("is_b", F.lit(0))).cast("long").alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_segments",
            "n_boiler",
            pround(F.col("n_boiler") / F.col("n_segments"), 6).alias("boiler_ratio"),
            (
                F.col("n_boiler") / F.col("n_segments") <= SEG_MAX_RATIO
            )
            .cast("int")
            .alias("keep"),
        )
        .orderBy("doc_id")
    )


BOILERPLATE_SQL = rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
  FROM documents
),
segs AS (
  SELECT doc_id,
         ('0x' || substr(md5(array_to_string(tk[i * {SEG_WIDTH} + 1 : i * {SEG_WIDTH} + {SEG_WIDTH}], ' ')), 1, 15))::BIGINT AS h
  FROM base,
       LATERAL (SELECT unnest(generate_series(0, len(tk) // {SEG_WIDTH} - 1)) AS i)
  WHERE len(tk) >= {SEG_WIDTH}
),
boiler AS (
  SELECT h FROM (SELECT DISTINCT doc_id, h FROM segs)
  GROUP BY h HAVING count(*) > {SEG_MAX_DF}
),
flagged AS (
  SELECT s.doc_id, CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END AS is_b
  FROM segs s LEFT JOIN boiler b ON s.h = b.h
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(is_b) AS BIGINT) AS n_boiler,
       floor((sum(is_b) * 1.0 / count(*)) * 1000000.0 + 0.5) / 1000000.0
         AS boiler_ratio,
       CAST(CASE WHEN sum(is_b) * 1.0 / count(*) <= {SEG_MAX_RATIO}
            THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM flagged
GROUP BY doc_id
ORDER BY doc_id
"""


#: weight quantization for the linear classifier: integer milli-units
#: in [-1000, 1000], derived from the feature's md5 hash.
QW_RANGE = 2001


def _qweight(col):
    """Deterministic per-feature weight standing in for a pretrained
    classifier's weight vector: 60-bit md5-prefix hash → integer in
    [-1000, 1000] milli-units.  (A real exported model would broadcast
    its (bucket → weight) table and join exactly like the DSIR pass-2
    model join above; the hash form exercises the same plan shape with
    a deterministic fake the oracle can reproduce.)"""
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long") % QW_RANGE
        - (QW_RANGE - 1) // 2
    )


def fasttext_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style linear quality classifier inference (Joulin et
    al. 2017; the model-based quality filter used by CCNet/LLaMA-class
    corpus pipelines): score(doc) = mean over unigram + bigram features
    of the feature's weight; keep when the mean is positive.

    All feature weights are exact integers (milli-units) so the per-doc
    sum is order-independent and engine-exact; the mean is pround-6.

    Scale: one token pass repartitioned by ``doc_id``; the bigram lead
    window and both aggregates reuse that partitioning, so the whole
    query is one shuffle wide regardless of corpus size — classifier
    inference adds zero extra exchanges on top of tokenization.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.repartition("doc_id").select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), _WS)).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    feats = toks.select(
        "doc_id",
        _qweight(F.concat(F.lit("qw1:"), F.col("tok"))).alias("w_uni"),
        F.lead("tok").over(w).alias("nxt"),
        "tok",
    ).select(
        "doc_id",
        "w_uni",
        F.when(
            F.col("nxt").isNotNull(),
            _qweight(F.concat_ws(" ", F.lit("qw2:"), "tok", "nxt")),
        ).alias("w_bi"),
    )
    scored = feats.groupBy("doc_id").agg(
        (F.count(F.lit(1)) + F.count("w_bi")).cast("long").alias("n_features"),
        (F.sum("w_uni") + F.coalesce(F.sum("w_bi"), F.lit(0)))
        .cast("long")
        .alias("score_sum_milli"),
    )
    return (
        d.select("doc_id", "lang")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce("n_features", F.lit(0)).cast("long").alias("n_features"),
            F.coalesce("score_sum_milli", F.lit(0))
            .cast("long")
            .alias("score_sum_milli"),
            pround(
                F.when(F.coalesce("n_features", F.lit(0)) == 0, 0.0).otherwise(
                    F.col("score_sum_milli") / F.col("n_features") / 1000.0
                ),
                6,
            ).alias("score_mean"),
            (F.coalesce("score_sum_milli", F.lit(0)) > 0).cast("int").alias("keep"),
        )
        .orderBy("doc_id")
    )


FASTTEXT_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
         generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) AS pos
  FROM documents
),
feats AS (
  SELECT doc_id,
         ('0x' || substr(md5('qw1:' || tok), 1, 15))::BIGINT % {QW_RANGE}
           - {(QW_RANGE - 1) // 2} AS w_uni,
         CASE WHEN lead(tok) OVER w IS NOT NULL THEN
           ('0x' || substr(md5('qw2: ' || tok || ' ' || lead(tok) OVER w), 1, 15))::BIGINT % {QW_RANGE}
             - {(QW_RANGE - 1) // 2}
         END AS w_bi
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
scored AS (
  SELECT doc_id,
         count(*) + count(w_bi) AS n_features,
         sum(w_uni) + coalesce(sum(w_bi), 0) AS score_sum_milli
  FROM feats GROUP BY doc_id
)
SELECT d.doc_id, d.lang,
       CAST(coalesce(s.n_features, 0) AS BIGINT) AS n_features,
       CAST(coalesce(s.score_sum_milli, 0) AS BIGINT) AS score_sum_milli,
       {pround_sql("CASE WHEN coalesce(s.n_features, 0) = 0 THEN 0.0 ELSE s.score_sum_milli * 1.0 / s.n_features / 1000.0 END", 6)} AS score_mean,
       CAST(CASE WHEN coalesce(s.score_sum_milli, 0) > 0 THEN 1 ELSE 0 END
            AS INTEGER) AS keep
FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
ORDER BY d.doc_id
"""


#: Rocchio trainer: hashed feature buckets and the integer label rule
#: (long-doc vs short-doc — linearly separable, so the trained
#: accuracy the oracle pins is a real property, not a hope)
PCT_BUCKETS = 64
PCT_LABEL_MIN_TOKENS = 54


def rocchio_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier TRAINING — the counterpart of
    :func:`fasttext_quality_score` (which only runs inference with
    fixed hashed weights): a nearest-centroid / Rocchio model over
    hashed bag-of-words features, trained and evaluated in two corpus
    passes, reporting the learned threshold, weight mass, confusion
    counts, and accuracy.

    Rocchio is the distributed-training shape in its purest form:
    ``w = mean(x | y=+1) − mean(x | y=−1)`` is ONE map-side-combinable
    aggregate (no sequential updates — the full-batch perceptron was
    prototyped and rejected here because its aggregate update
    overshoots and oscillates rather than converging, a textbook
    batch-perceptron failure), and the decision threshold is the
    midpoint of the class-mean scores — a second one-pass aggregate.
    All arithmetic is integer milli-units with truncating division
    (Spark ``DIV`` == DuckDB ``//``, both trunc-toward-zero), so the
    model, threshold, and every confusion count are engine-exact.
    Labels: y = +1 iff the doc has ≥ ``PCT_LABEL_MIN_TOKENS``
    whitespace tokens (linearly separable from count features — their
    bucket sum IS the token count — so high trained accuracy is a
    pinned property: 97.6% on the sf0.01 fixture).

    Scale: one token scan → (doc, bucket ≤ 64) feature rollup
    (persisted, consumed twice); the centroid aggregate and score pass
    are broadcast joins of the 64-row weight vector; every other
    relation is 1-row.  At 100 TB this is exactly a distributed
    full-batch linear-model step: gradient/centroid = aggregate,
    broadcast back, score = map.
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    d = load_table(spark, sf_dir, "documents")
    toks = d.repartition("doc_id").select(
        "doc_id",
        F.explode(F.split(F.trim("text"), _WS)).alias("tok"),
    )
    feats = (
        toks.select(
            "doc_id",
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("pb:"), F.col("tok"))), 1, 15
                    ),
                    16,
                    10,
                ).cast("long")
                % PCT_BUCKETS
            ).alias("b"),
        )
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()
    )
    labels = d.select(
        "doc_id",
        F.when(
            F.size(F.split(F.trim("text"), _WS)) >= PCT_LABEL_MIN_TOKENS,
            F.lit(1),
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("y"),
    ).persist()
    nn = labels.agg(
        F.sum(F.expr("CAST(y = 1 AS BIGINT)")).alias("n_pos"),
        F.sum(F.expr("CAST(y = -1 AS BIGINT)")).alias("n_neg"),
    )
    sums = (
        feats.join(labels, "doc_id")
        .groupBy("b")
        .agg(
            F.sum(F.expr("CASE WHEN y = 1 THEN c ELSE 0 END")).alias("sp"),
            F.sum(F.expr("CASE WHEN y = -1 THEN c ELSE 0 END")).alias("sn"),
        )
    )
    w = (
        spark.range(PCT_BUCKETS)
        .select(F.col("id").cast("long").alias("b"))
        .join(sums, "b", "left")
        .crossJoin(F.broadcast(nn))
        .select(
            "b",
            # widen before the x1000 (corpus-total bucket counts can
            # pass ~9.2e15 at 100 TB — the ppm-widening discipline)
            # greatest(·,1): a degenerate corpus with an empty label
            # class must yield 0-weight terms in BOTH engines, not
            # Spark-NULL vs DuckDB-error (engine-divergent failure)
            F.expr(
                "CAST(CAST(coalesce(sp, 0) AS DECIMAL(38,0)) * 1000"
                " DIV greatest(n_pos, 1) AS BIGINT)"
                " - CAST(CAST(coalesce(sn, 0) AS DECIMAL(38,0)) * 1000"
                " DIV greatest(n_neg, 1) AS BIGINT)"
            ).alias("wt"),
        )
        .persist()
    )
    scores = (
        feats.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(F.sum(F.col("c") * F.col("wt")).alias("s"))
    )
    ev = (
        labels.join(scores, "doc_id", "left")
        .select("doc_id", "y", F.coalesce("s", F.lit(0)).alias("s"))
        .persist()
    )
    theta = ev.groupBy("y").agg(
        F.expr("sum(s) DIV count(*)").alias("ms")
    ).agg(
        F.expr("CAST(sum(ms) DIV 2 AS BIGINT)").alias("theta_milli")
    )
    out = (
        ev.crossJoin(F.broadcast(theta))
        .select(
            "y",
            F.when(F.col("s") > F.col("theta_milli"), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("pred"),
            "theta_milli",
        )
        .groupBy("theta_milli")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.expr("CAST(y = 1 AS BIGINT)")).alias("n_pos"),
            F.sum(F.expr("CAST(y = -1 AS BIGINT)")).alias("n_neg"),
            F.sum(F.expr("CAST(y = 1 AND pred = 1 AS BIGINT)")).alias("tp"),
            F.sum(F.expr("CAST(y = -1 AND pred = 1 AS BIGINT)")).alias("fp"),
            F.sum(F.expr("CAST(y = 1 AND pred = -1 AS BIGINT)")).alias("fn"),
            F.sum(F.expr("CAST(y = -1 AND pred = -1 AS BIGINT)")).alias(
                "tn"
            ),
        )
        .crossJoin(
            F.broadcast(
                w.agg(F.sum(F.abs("wt")).cast("long").alias("weight_l1_milli"))
            )
        )
        .select(
            "n_docs",
            "n_pos",
            "n_neg",
            "theta_milli",
            "weight_l1_milli",
            "tp",
            "fp",
            "fn",
            "tn",
            F.expr(
                "CAST(CAST(tp + tn AS DECIMAL(38,0)) * 1000000"
                " DIV n_docs AS BIGINT)"
            ).alias("acc_ppm"),
        )
    )
    return scoped_cache(out, feats, labels, w, ev)


ROCCHIO_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents
),
feats AS (
  SELECT doc_id,
         ('0x' || substr(md5('pb:' || tok), 1, 15))::BIGINT
           % {PCT_BUCKETS} AS b,
         count(*) AS c
  FROM toks GROUP BY 1, 2
),
labels AS (
  SELECT doc_id,
         CASE WHEN len(regexp_split_to_array(trim(text), '\s+'))
                   >= {PCT_LABEL_MIN_TOKENS}
              THEN 1 ELSE -1 END AS y
  FROM documents
),
nn AS (
  SELECT sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS n_pos,
         sum(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS n_neg
  FROM labels
),
sums AS (
  SELECT f.b,
         sum(CASE WHEN l.y = 1 THEN f.c ELSE 0 END) AS sp,
         sum(CASE WHEN l.y = -1 THEN f.c ELSE 0 END) AS sn
  FROM feats f JOIN labels l ON f.doc_id = l.doc_id
  GROUP BY 1
),
w AS (
  SELECT CAST(r.b AS BIGINT) AS b,
         CAST(CAST(coalesce(s.sp, 0) AS HUGEINT) * 1000
             // greatest(t.n_pos, 1) AS BIGINT)
           - CAST(CAST(coalesce(s.sn, 0) AS HUGEINT) * 1000
             // greatest(t.n_neg, 1) AS BIGINT) AS wt
  FROM (SELECT unnest(range({PCT_BUCKETS})) AS b) r
  LEFT JOIN sums s ON r.b = s.b
  CROSS JOIN nn t
),
scores AS (
  SELECT f.doc_id, sum(f.c * w.wt) AS s
  FROM feats f JOIN w ON f.b = w.b GROUP BY 1
),
ev AS (
  SELECT l.doc_id, l.y, coalesce(sc.s, 0) AS s
  FROM labels l LEFT JOIN scores sc ON l.doc_id = sc.doc_id
),
theta AS (
  SELECT CAST(sum(ms) // 2 AS BIGINT) AS theta_milli
  FROM (SELECT y, sum(s) // count(*) AS ms FROM ev GROUP BY y)
),
conf AS (
  SELECT t.theta_milli,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(sum(CASE WHEN y = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
         CAST(sum(CASE WHEN y = 1 AND s > t.theta_milli
                  THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN y = -1 AND s > t.theta_milli
                  THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(CASE WHEN y = 1 AND NOT s > t.theta_milli
                  THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         CAST(sum(CASE WHEN y = -1 AND NOT s > t.theta_milli
                  THEN 1 ELSE 0 END) AS BIGINT) AS tn
  FROM ev CROSS JOIN theta t
  GROUP BY t.theta_milli
)
SELECT c.n_docs, c.n_pos, c.n_neg,
       CAST(c.theta_milli AS BIGINT) AS theta_milli,
       CAST((SELECT sum(abs(wt)) FROM w) AS BIGINT) AS weight_l1_milli,
       c.tp, c.fp, c.fn, c.tn,
       CAST(CAST(c.tp + c.tn AS HUGEINT) * 1000000 // c.n_docs AS BIGINT)
         AS acc_ppm
FROM conf c
"""


SPARK_QUERIES = {
    "dsir_importance_weights": dsir_importance_weights,
    "boilerplate_segment_filter": boilerplate_segment_filter,
    "fasttext_quality_score": fasttext_quality_score,
    "rocchio_quality_classifier": rocchio_quality_classifier,
}

ORACLE_SQL = {
    "dsir_importance_weights": DSIR_SQL,
    "boilerplate_segment_filter": BOILERPLATE_SQL,
    "fasttext_quality_score": FASTTEXT_SQL,
    "rocchio_quality_classifier": ROCCHIO_SQL,
}
