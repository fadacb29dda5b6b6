"""Corpus-curation operators a large-scale training-data pipeline runs
between dedup and tokenization: sequence packing, mixture sampling, and
benchmark decontamination.

The reference repo (``/root/reference``) has no notion of any of these
(SURVEY.md §2.5 — its surface ends at flat-table quality audits); this
module is part of the beyond-reference training-data mandate.  All
three are oracle-checked — each uses only window arithmetic and
portable md5-prefix hashing, so DuckDB reproduces them bit-exactly.

Scale notes:

* packing is one window cumsum per source partition — no shuffle
  beyond the hash partition on ``source``, any corpus size;
* mixture sampling is a scan-side filter (no shuffle at all until the
  final tiny agg), and being hash-based it selects the SAME rows under
  any partitioning or cluster size — resumable and auditable;
* decontamination broadcasts the held-out shingle set (benchmarks are
  always tiny next to the corpus), so the corpus never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.cachescope import scoped_cache
from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.functions.portable import pround, pround_sql
from projet_meteo_etl_spark.functions.twopass import bucket_prefix
from projet_meteo_etl_spark.operators.dedup import word_shingle_hashes
from projet_meteo_etl_spark.operators.text import ws_token_count

#: context-window budget for packing (tokens per packed sequence)
PACK_BUDGET = 2048

#: per-language keep rates for the mixture sampler (English is
#: down-weighted, the tail languages kept whole — the usual rebalance).
#: Stored as INTEGER thresholds out of 10000: ``0.9 * 10000`` as a
#: double is 9000.000000000002, so a float-rate comparison would keep
#: ``h = 9000`` on Spark but drop it on DuckDB's exact decimals —
#: integer thresholds make the cut identical by construction.
MIX_RATES = {"en": 0.35, "fr": 0.9, "de": 0.9, "es": 0.9, "zh": 1.0}
MIX_THRESHOLDS = {k: int(round(v * 10000)) for k, v in MIX_RATES.items()}

#: held-out "benchmark" = the first N_HOLDOUT docs; contamination is
#: any other doc sharing a full 5-word shingle with them (sized so the
#: corpora at every test SF actually contain contaminated docs)
N_HOLDOUT = 50
DECONTAM_N = 5


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous-fill sequence packing: concatenate each source's docs
    in doc_id order and split at ``PACK_BUDGET`` token boundaries; a
    doc's bin is ``floor(tokens_before_it / budget)``.

    This is the deterministic streaming form of packing (what an
    ingest pipeline does when it writes tokenized shards); bin
    assignment is ONE window cumsum per source — no greedy state, no
    Python.  Output: per-bin occupancy, the metric packing exists to
    optimize.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", ws_token_count(F.col("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = d.select(
        "source",
        "n_tokens",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET).alias(
            "bin_id"
        ),
    )
    return (
        binned.groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
            pround(F.sum("n_tokens") / F.lit(float(PACK_BUDGET)), 4).alias("fill"),
        )
        .orderBy("source", "bin_id")
    )


PACK_SEQUENCES_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
           AS n_tokens
  FROM documents
),
binned AS (
  SELECT source, n_tokens,
         CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) - n_tokens)
                    / {PACK_BUDGET}) AS BIGINT) AS bin_id
  FROM d
)
SELECT source, bin_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS bin_tokens,
       floor((sum(n_tokens) / {PACK_BUDGET}.0) * 10000.0 + 0.5) / 10000.0 AS fill
FROM binned
GROUP BY source, bin_id
ORDER BY source, bin_id
"""


def stratified_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mixture rebalancing: per-language Bernoulli keep rates
    applied via the portable doc_id hash (``h % 10000 < rate·10000``).

    Hash sampling (vs RNG) keeps the selected subset a pure function of
    the data — identical on any engine/partitioning, so mixtures are
    reproducible across pipeline re-runs and the whole operator
    oracle-checks.  Output: per-language before/after counts and the
    realized keep rate.
    """
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    cut = F.coalesce(
        F.create_map(
            *[F.lit(x) for kv in MIX_THRESHOLDS.items() for x in kv]
        )[F.col("lang")],
        F.lit(10000),
    )
    return (
        d.select("lang", (h % 10000 < cut).cast("int").alias("kept"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_kept"),
            pround(F.sum("kept") / F.count(F.lit(1)), 4).alias("realized_rate"),
        )
        .orderBy("lang")
    )


_CUT_CASE = " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in MIX_THRESHOLDS.items()
)

STRATIFIED_MIX_SQL = f"""
WITH d AS (
  SELECT lang,
         CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000
                   < (CASE lang {_CUT_CASE} ELSE 10000 END)
              THEN 1 ELSE 0 END AS kept
  FROM documents
)
SELECT lang, count(*) AS n_total, sum(kept)::BIGINT AS n_kept,
       floor((sum(kept) * 1.0 / count(*)) * 10000.0 + 0.5) / 10000.0
         AS realized_rate
FROM d GROUP BY lang ORDER BY lang
"""


def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any full
    ``DECONTAM_N``-word shingle with the held-out set (here: the first
    ``N_HOLDOUT`` docs stand in for an eval benchmark).

    The held-out shingle set is broadcast — benchmarks are thousands of
    rows against a corpus of billions, so the corpus-side scan never
    shuffles; the output is the contamination report (matched shingle
    count per flagged doc) a curation run quarantines from.
    """
    d = load_table(spark, sf_dir, "documents")
    held = word_shingle_hashes(
        d.filter(F.col("doc_id") < N_HOLDOUT), n=DECONTAM_N
    ).select("h").distinct()
    corpus = word_shingle_hashes(
        d.filter(F.col("doc_id") >= N_HOLDOUT), n=DECONTAM_N
    )
    return (
        corpus.join(F.broadcast(held), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched_shingles"))
        .orderBy("doc_id")
    )


_SHINGLE8 = " || ' ' || ".join(
    ["tok"] + [f"lead(tok, {i}) OVER w" for i in range(1, DECONTAM_N)]
)

DECONTAM_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok,
         generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1) AS pos
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, {_SHINGLE8} AS shingle
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sh AS (
  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
  FROM grams WHERE shingle IS NOT NULL
),
held AS (SELECT DISTINCT h FROM sh WHERE doc_id < {N_HOLDOUT})
SELECT s.doc_id, count(*) AS n_matched_shingles
FROM sh s JOIN held USING (h)
WHERE s.doc_id >= {N_HOLDOUT}
GROUP BY s.doc_id
ORDER BY s.doc_id
"""


#: existing-corpus / new-batch split for the incremental dedup report
INCR_SPLIT = 100


def incremental_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus dedup — the nightly-ingest shape: a NEW batch
    of documents is admitted against an EXISTING corpus's fingerprint
    set.  A batch doc is dropped if its normalized fingerprint already
    exists in the corpus; among batch-internal duplicates only the
    first (min doc_id) is accepted.

    The corpus side joins by fingerprint with no broadcast hint: at
    real scale the accumulated fingerprint set is itself huge, so the
    right plan is a shuffle join on the hash key (AQE still broadcasts
    it while it is small).  Output: per-language admission report.
    """
    from projet_meteo_etl_spark.operators.text import fingerprint

    d = load_table(spark, sf_dir, "documents")
    corpus_fp = (
        d.filter(F.col("doc_id") < INCR_SPLIT)
        .select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .withColumn("in_corpus", F.lit(1))
    )
    batch = d.filter(F.col("doc_id") >= INCR_SPLIT).select(
        "doc_id", "lang", fingerprint(F.col("text")).alias("fp")
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    classified = (
        batch.withColumn("rn", F.row_number().over(w))
        .join(corpus_fp, "fp", "left")
        .select(
            "lang",
            F.when(F.col("in_corpus") == 1, F.lit("dropped_existing"))
            .when(F.col("rn") > 1, F.lit("dropped_batch_dup"))
            .otherwise(F.lit("accepted"))
            .alias("outcome"),
        )
    )
    return (
        classified.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.count_if(F.col("outcome") == "accepted").alias("n_accepted"),
            F.count_if(F.col("outcome") == "dropped_existing").alias("n_dropped_existing"),
            F.count_if(F.col("outcome") == "dropped_batch_dup").alias("n_dropped_batch_dup"),
        )
        .orderBy("lang")
    )


_FP_SQL = (
    r"md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),"
    r" '\s+', ' ', 'g')))"
)

INCR_DEDUP_SQL = f"""
WITH corpus AS (
  SELECT DISTINCT {_FP_SQL} AS fp FROM documents WHERE doc_id < {INCR_SPLIT}
),
batch AS (
  SELECT doc_id, lang, {_FP_SQL} AS fp,
         row_number() OVER (PARTITION BY {_FP_SQL} ORDER BY doc_id) AS rn
  FROM documents WHERE doc_id >= {INCR_SPLIT}
),
classified AS (
  SELECT lang,
         CASE WHEN c.fp IS NOT NULL THEN 'dropped_existing'
              WHEN rn > 1 THEN 'dropped_batch_dup'
              ELSE 'accepted' END AS outcome
  FROM batch b LEFT JOIN corpus c USING (fp)
)
SELECT lang, count(*) AS n_new,
       count(*) FILTER (WHERE outcome = 'accepted') AS n_accepted,
       count(*) FILTER (WHERE outcome = 'dropped_existing') AS n_dropped_existing,
       count(*) FILTER (WHERE outcome = 'dropped_batch_dup') AS n_dropped_batch_dup
FROM classified GROUP BY lang ORDER BY lang
"""


def length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile length filtering: keep docs whose ``n_chars`` lies in
    the [p5, p95] band — the standard outlier trim before tokenization.

    Spark's exact ``percentile`` and DuckDB's ``quantile_cont`` use the
    same linear interpolation and agree bit-for-bit, so the band (a
    1-row aggregate broadcast into the scan) and the per-language
    keep counts are all oracle-exact.
    """
    d = load_table(spark, sf_dir, "documents")
    band = d.agg(
        F.expr("percentile(n_chars, 0.05)").alias("lo"),
        F.expr("percentile(n_chars, 0.95)").alias("hi"),
    )
    return (
        d.join(F.broadcast(band))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count_if(
                (F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi"))
            ).alias("n_kept"),
            pround(F.min("lo"), 4).alias("p05_chars"),
            pround(F.min("hi"), 4).alias("p95_chars"),
        )
        .orderBy("lang")
    )


LENGTH_BAND_SQL = """
WITH b AS (
  SELECT quantile_cont(n_chars, 0.05) AS lo, quantile_cont(n_chars, 0.95) AS hi
  FROM documents
)
SELECT lang, count(*) AS n_total,
       count(*) FILTER (WHERE n_chars >= lo AND n_chars <= hi) AS n_kept,
       floor((min(lo)) * 10000.0 + 0.5) / 10000.0 AS p05_chars,
       floor((min(hi)) * 10000.0 + 0.5) / 10000.0 AS p95_chars
FROM documents, b
GROUP BY lang ORDER BY lang
"""


#: per-language token budget for selection (small vs the sf0.01 corpus
#: on purpose, so the cut is exercised)
TOKEN_BUDGET = 2000


def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data selection under a token budget: within each language, rank
    documents by quality (distinct-token ratio, doc_id tie-break) and
    keep the prefix whose cumulative token count fits ``TOKEN_BUDGET``
    — the "best data first until the budget is spent" selection a
    pretraining mixture runs per source/language.

    A per-language window is bounded only by the largest language —
    which in a real corpus is most of it — so rank and running token
    sum are computed two-pass: documents bucket by score percent
    (micro-score div 10⁴ — ≤101 buckets per language, monotone along
    the DESC sort), the per-(lang, bucket) rollup yields exclusive
    prefix counts/token-sums, and a window partitioned by (lang,
    bucket) finishes the job.  Hash-identical to the per-lang global
    window; per-task work is one score-percent slice of one language.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    n_tokens = ws_token_count(F.col("text"))
    score = pround(
        F.when(n_tokens == 0, F.lit(0.0)).otherwise(
            F.size(F.array_distinct(toks)) / F.size(toks)
        ),
        6,
    )
    base = (
        d.select(
            "doc_id", "lang", n_tokens.alias("n_tokens"), score.alias("score")
        )
        .withColumn(
            # score is an exact 6-dp value in [0,1]; micro units are integer
            "sbucket",
            -(F.floor(F.col("score") * 1e6 + 0.5).cast("long") / 10000).cast(
                "long"
            ),
        )
        # feeds the bucket rollup AND the ranked join: persist so the
        # tokenize+distinct scoring pass runs once, not twice
        .persist()
    )
    pre = bucket_prefix(
        base,
        "sbucket",
        {
            "n": (F.count(F.lit(1)), "sum"),
            "tok": (F.sum("n_tokens"), "sum"),
        },
        partition_cols=("lang",),
    )
    w = Window.partitionBy("lang", "sbucket").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    ranked = base.join(F.broadcast(pre), ["lang", "sbucket"]).select(
        "lang",
        "doc_id",
        "n_tokens",
        "score",
        (F.coalesce("pre_n", F.lit(0)) + F.row_number().over(w))
        .cast("long")
        .alias("rank"),
        (
            F.coalesce("pre_tok", F.lit(0))
            + F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        ).alias("cum_tokens"),
    )
    out = ranked.withColumn("kept", F.col("cum_tokens") <= TOKEN_BUDGET).orderBy(
        "lang", "rank"
    )
    return scoped_cache(out, base)


TOKEN_BUDGET_SQL = rf"""
WITH base AS (
  SELECT doc_id, lang,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
    floor((CASE WHEN length(trim(text)) = 0 THEN 0.0
           ELSE len(list_distinct(regexp_split_to_array(trim(text), '\s+')))
                * 1.0 / len(regexp_split_to_array(trim(text), '\s+')) END)
          * 1000000.0 + 0.5) / 1000000.0 AS score
  FROM documents
),
ranked AS (
  SELECT lang, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, score,
         row_number() OVER w AS rank,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY score DESC, doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM base WINDOW w AS (PARTITION BY lang ORDER BY score DESC, doc_id ASC)
)
SELECT lang, doc_id, n_tokens, score, CAST(rank AS BIGINT) AS rank,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       cum_tokens <= {TOKEN_BUDGET} AS kept
FROM ranked
ORDER BY lang, rank
"""


#: portable hash split: md5-prefix mod 100 < 90 → train
TRAIN_PCT = 90


def train_test_split_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/test split — the same document
    lands in the same split on any cluster layout, any engine, any
    re-run (pure function of doc_id, no RNG stream), which is what
    makes a 100 TB split auditable.  Report: per (lang, split) doc and
    token counts plus the realized split fraction."""
    d = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    split = F.when(h % 100 < TRAIN_PCT, F.lit("train")).otherwise(F.lit("test"))
    base = d.select(
        "lang",
        split.alias("split"),
        ws_token_count(F.col("text")).alias("n_tokens"),
    )
    lang_tot = Window.partitionBy("lang")
    return (
        base.groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .withColumn(
            "frac_of_lang",
            pround(F.col("n_docs") / F.sum("n_docs").over(lang_tot), 6),
        )
        .orderBy("lang", "split")
    )


TRAIN_TEST_SPLIT_SQL = rf"""
WITH base AS (
  SELECT lang,
    CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100
              < {TRAIN_PCT}
         THEN 'train' ELSE 'test' END AS split,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
  FROM documents
),
agg AS (
  SELECT lang, split, count(*) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens
  FROM base GROUP BY lang, split
)
SELECT lang, split, n_docs, total_tokens,
  floor((n_docs * 1.0 / sum(n_docs) OVER (PARTITION BY lang))
        * 1000000.0 + 0.5) / 1000000.0 AS frac_of_lang
FROM agg
ORDER BY lang, split
"""


#: chunking geometry: window of CHUNK_W tokens advancing by CHUNK_S
#: (CHUNK_W − CHUNK_S tokens of overlap carry context across chunks)
CHUNK_W = 24
CHUNK_S = 16
#: trailing fragments shorter than this are dropped (noise for training)
CHUNK_MIN = 8


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the context-window pass every
    RAG / pretraining pipeline runs before embedding or packing: split
    each document into ``CHUNK_W``-token windows advancing by
    ``CHUNK_S``, keep fragments of ≥ ``CHUNK_MIN`` tokens, and emit a
    portable 60-bit content hash per chunk (the downstream dedup /
    embedding key).

    Plan: pure projection — tokenize once, build all windows with one
    ``transform(sequence(...))`` array expression, one ``posexplode``.
    No shuffle anywhere except the final presentation sort; at 100 TB
    this runs entirely map-side at scan speed, and the chunk hash
    means downstream exact-dedup of chunks reuses the fingerprint
    machinery unchanged.
    """
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("tk")
    ).withColumn(
        # number of window starts: ceil((n - CHUNK_MIN + 1) / S) over
        # starts 0, S, 2S, ... with at least CHUNK_MIN tokens left
        "n_starts",
        F.expr(
            f"CAST(greatest(0, (size(tk) - {CHUNK_MIN} + {CHUNK_S})"
            f" DIV {CHUNK_S}) AS INT)"
        ),
    )
    # sequence(0, -1) would step BACKWARDS in Spark — drop chunkless docs
    chunks = base.filter(F.col("n_starts") > 0).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, n_starts - 1), "
                f"i -> concat_ws(' ', slice(tk, i * {CHUNK_S} + 1, {CHUNK_W})))"
            )
        ).alias("chunk_id", "chunk"),
    ).filter(F.size(F.split("chunk", " ")) >= CHUNK_MIN)
    return chunks.select(
        "doc_id",
        "chunk_id",
        F.size(F.split("chunk", " ")).alias("n_tokens"),
        F.conv(F.substring(F.md5("chunk"), 1, 15), 16, 10)
        .cast("long")
        .alias("chunk_hash"),
    ).orderBy("doc_id", "chunk_id")


CHUNK_DOCUMENTS_SQL = rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
  FROM documents
),
starts AS (
  SELECT doc_id, tk,
         CAST(greatest(0, (len(tk) - {CHUNK_MIN} + {CHUNK_S}) // {CHUNK_S})
              AS INTEGER) AS n_starts
  FROM base
),
chunks AS (
  SELECT doc_id, i AS chunk_id,
         array_to_string(tk[i * {CHUNK_S} + 1 : i * {CHUNK_S} + {CHUNK_W}], ' ')
           AS chunk
  FROM starts,
       LATERAL (SELECT unnest(generate_series(0, n_starts - 1)) AS i)
)
SELECT doc_id, CAST(chunk_id AS INTEGER) AS chunk_id,
       CAST(len(string_split(chunk, ' ')) AS INTEGER) AS n_tokens,
       ('0x' || substr(md5(chunk), 1, 15))::BIGINT AS chunk_hash
FROM chunks
WHERE len(string_split(chunk, ' ')) >= {CHUNK_MIN}
ORDER BY doc_id, chunk_id
"""


#: per-group sample size for the hash-ordered reservoir equivalent
SAMPLE_K = 20


def per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-``k`` sample per group — the distributed
    reservoir: per event type, keep the ``SAMPLE_K`` events with the
    smallest md5 hash of their id.  Hash order is uniform and
    reproducible on any cluster layout, so the "reservoir" is a pure
    function of the data — re-running selects identical rows (the
    auditability property ``plans/curation.py`` samplers share).

    Per group the output reports the sample size, the hash threshold
    (= the k-th smallest hash — at 100 TB each executor keeps its local
    top-k by hash and only k·|groups| rows merge, which is exactly a
    distributed bottom-k sketch), and the sample's mean value for
    downstream bias checks.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select("event_type", "event_id", "value")
    h = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    w = Window.partitionBy("event_type").orderBy(F.asc("h"), F.asc("event_id"))
    sampled = (
        e.withColumn("h", h)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLE_K)
    )
    return (
        sampled.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sampled"),
            F.max("h").alias("hash_threshold"),
            # exact integer cents before the sum: a double sum's
            # accumulation order varies with partitioning
            pround(
                F.sum(F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)"))
                / (F.count(F.lit(1)) * F.lit(100.0)),
                4,
            ).alias("sample_mean"),
        )
        .orderBy("event_type")
    )


PER_GROUP_SAMPLE_SQL = f"""
WITH hashed AS (
  SELECT event_type, event_id, value,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY h ASC, event_id ASC) AS rn
  FROM hashed
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_sampled,
       max(h) AS hash_threshold,
       {pround_sql('sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) / (count(*) * 100.0)', 4)}
         AS sample_mean
FROM ranked WHERE rn <= {SAMPLE_K}
GROUP BY event_type
ORDER BY event_type
"""


#: weighted sample size per source and shard count for the layout audit
WSAMPLE_K = 20
N_SHARDS = 8

#: 13 md5 hex chars = 52 uniform bits — chosen BELOW the 53-bit double
#: mantissa so the long→double conversion is exact; the power-of-two
#: divisor then maps them into (0,1) with a pure exponent shift
_U52 = float(1 << 52)


def weighted_sample_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Duffield–Lund–Thorup
    priority sampling (JACM 2007): per source, the ``WSAMPLE_K``
    documents with the largest priority ``w/u`` — equivalently the
    smallest ``u/w`` — where ``u`` is the doc's deterministic
    md5-prefix uniform and ``w = n_chars``; length-proportional
    inclusion, the sampler a mixture-weighted corpus draw actually
    uses.  Distributed shape = per-partition top-k then merge (the same
    bottom-k sketch as :func:`per_group_sample`, WindowGroupLimit
    plan-pinned in tests/test_plans.py); determinism comes from hash
    uniforms, not an RNG stream, so any cluster layout selects
    identical rows.

    Cross-engine exactness is by construction, with NO transcendental
    anywhere (the Efraimidis–Spirakis formulation needs ``ln``, which
    the JVM and libm only guarantee to 1 ulp — a divergence at a rank
    boundary would flip sample membership): the 52-bit hash converts to
    double exactly, the 2^-52 scale is an exponent shift, and the
    single division by ``w`` is IEEE-correctly-rounded on both the JVM
    and DuckDB, so every key is bit-identical on both engines.  The
    presentation column ``key_pico`` is ``floor(key * 1e12)`` — one
    correctly-rounded multiply (no add, so no FMA-contraction hazard)
    plus an exact floor.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    ).filter(F.col("n_chars") > 0)
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10
    ).cast("long")
    key = h / F.lit(_U52) / F.col("n_chars")
    w = Window.partitionBy("source").orderBy(F.asc("key"), F.asc("doc_id"))
    return (
        d.withColumn("key", key)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= WSAMPLE_K)
        .select(
            "source",
            "rank",
            "doc_id",
            F.col("n_chars").alias("weight"),
            F.floor(F.col("key") * F.lit(1e12)).cast("long").alias("key_pico"),
        )
        .orderBy("source", "rank")
    )


WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
          / {_U52!r}::DOUBLE) / n_chars AS key
  FROM documents
  WHERE n_chars > 0
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY source
                                    ORDER BY key ASC, doc_id ASC)
                 AS BIGINT) AS rank
  FROM keyed
)
SELECT source, rank, doc_id, CAST(n_chars AS BIGINT) AS weight,
       CAST(floor(key * 1000000000000.0) AS BIGINT) AS key_pico
FROM ranked WHERE rank <= {WSAMPLE_K}
ORDER BY source, rank
"""


def shard_assignment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard layout audit: docs hash-assigned to ``N_SHARDS``
    shards (md5-prefix mod N — layout-independent and stable under
    re-runs), reporting per-shard doc count, byte volume, and the
    exact parts-per-million share of total bytes — the balance check
    run before writing training shards, where a hot shard serializes
    the epoch.  All integers; the share is integer division (ppm).
    """
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    per = (
        d.withColumn("shard", F.pmod(h, F.lit(N_SHARDS)).cast("int"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
    overall = per.agg(F.sum("total_chars").alias("grand"))
    return (
        per.crossJoin(F.broadcast(overall))
        .select(
            "shard",
            "n_docs",
            "total_chars",
            F.expr(
                "CAST(CAST(total_chars AS DECIMAL(38,0)) * 1000000"
                " div grand AS BIGINT)"
            ).alias(
                "share_ppm"
            ),
        )
        .orderBy("shard")
    )


SHARD_AUDIT_SQL = f"""
WITH assigned AS (
  SELECT CAST((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % {N_SHARDS}) AS INTEGER) AS shard,
         n_chars
  FROM documents
),
per AS (
  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS total_chars
  FROM assigned GROUP BY shard
)
SELECT shard, n_docs, total_chars,
       CAST(CAST(total_chars AS HUGEINT) * 1000000
            // (SELECT sum(total_chars) FROM per) AS BIGINT) AS share_ppm
FROM per
ORDER BY shard
"""


def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights (α = 0.5): each source's
    sampling weight ∝ share^α — the standard multilingual/multi-source
    rebalancing (up-samples small sources, down-samples the head)
    popularized by multilingual LM training.

    α = 0.5 is deliberately a square root: IEEE requires sqrt (unlike
    pow/exp/ln) to be CORRECTLY rounded, so ``floor(sqrt(n_docs) · 1e6)``
    is bit-identical on the JVM and DuckDB, and every downstream number
    (ppm weight, per-epoch draws, up-sample ratio) is pure integer
    arithmetic — the same no-transcendental discipline as
    :func:`weighted_sample_wor`.  The totals cross-join is a broadcast
    of one row; nothing shuffles but the per-source aggregate.
    """
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
    )
    per = per.withColumn(
        "sqrt_micro",
        F.expr(
            "CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT)"
        ),
    )
    tot = per.agg(
        F.sum("sqrt_micro").alias("denom"),
        F.sum("n_docs").alias("total_docs"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.expr("sqrt_micro * 1000000 DIV denom").alias("weight_ppm"),
            F.expr(
                "(total_docs * (sqrt_micro * 1000000 DIV denom)) DIV 1000000"
            ).alias("draws_per_epoch"),
            F.expr(
                "((total_docs * (sqrt_micro * 1000000 DIV denom)) DIV 1000000)"
                " * 1000000 DIV n_docs"
            ).alias("upsample_micro"),
        )
        .orderBy("source")
    )


MIXTURE_TEMPERATURE_SQL = """
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_chars,
         CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000.0) AS BIGINT)
           AS sqrt_micro
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(sum(sqrt_micro) AS BIGINT) AS denom,
         CAST(sum(n_docs) AS BIGINT) AS total_docs
  FROM per
)
SELECT source, n_docs,
       sqrt_micro * 1000000 // denom AS weight_ppm,
       (total_docs * (sqrt_micro * 1000000 // denom)) // 1000000
         AS draws_per_epoch,
       ((total_docs * (sqrt_micro * 1000000 // denom)) // 1000000)
         * 1000000 // n_docs AS upsample_micro
FROM per, tot
ORDER BY source
"""


def curriculum_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum phases: docs ranked easy→hard by the shared quality
    score (``operators/text.text_quality_score``, highest first) and
    NTILE'd into 10 phases; each phase reports doc count, token volume
    and its score range — the schedule a quality-curriculum dataloader
    consumes.

    The global rank uses the same two-pass construction as
    ``user_value_deciles``: bucket by the score's (bounded) value
    domain, exclusive prefix counts over buckets, row_number within
    bucket — no single-partition sort; the tile index is recovered with
    :func:`~projet_meteo_etl_spark.functions.twopass.exact_ntile`
    integer arithmetic, bit-identical to the oracle's ``ntile(10)``.
    """
    from projet_meteo_etl_spark.functions.twopass import bucket_prefix, exact_ntile
    from projet_meteo_etl_spark.operators.text import text_quality_score

    scored = (
        text_quality_score(spark, sf_dir)
        .select("doc_id", "n_tokens", "quality_score")
        # score is pround(…, 4): ×10000 is integer-valued, so the
        # bucket key is exact; DESC order ⇒ negate
        .withColumn(
            "sbucket",
            -F.expr("CAST(floor(quality_score * 10000.0) AS BIGINT)"),
        )
        .persist()
    )
    pre = bucket_prefix(scored, "sbucket", {"n": (F.count(F.lit(1)), "sum")})
    tot = scored.agg(F.count(F.lit(1)).alias("n_total"))
    win = Window.partitionBy("sbucket").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    banded = (
        scored.join(F.broadcast(pre), "sbucket")
        .withColumn(
            "rank", F.coalesce("pre_n", F.lit(0)) + F.row_number().over(win)
        )
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "phase", exact_ntile(F.col("rank"), F.col("n_total"), 10)
        )
    )
    out = (
        banded.groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens_total"),
            F.max("quality_score").alias("max_score"),
            F.min("quality_score").alias("min_score"),
        )
        .orderBy("phase")
    )
    return scoped_cache(out, scored)


def _curriculum_sql() -> str:
    from projet_meteo_etl_spark.operators.text import TEXT_QUALITY_SQL

    return f"""
WITH scored AS ({TEXT_QUALITY_SQL}),
banded AS (
  SELECT doc_id, n_tokens, quality_score,
         CAST(ntile(10) OVER (ORDER BY quality_score DESC, doc_id ASC)
              AS INTEGER) AS phase
  FROM scored
)
SELECT phase, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
       max(quality_score) AS max_score,
       min(quality_score) AS min_score
FROM banded
GROUP BY phase
ORDER BY phase
"""


#: total sample budget the Neyman allocation distributes
NEYMAN_BUDGET = 1000


def neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sampling allocation: budget ``n_h ∝
    N_h·σ_h`` across event-type strata — the variance-minimizing split
    of a fixed labeling/eval budget, computed from exact integer
    moments.

    ``varnum_h = N_h·Σx² − (Σx)²  (= N_h²·σ_h²)`` stays in BIGINT from
    exact cent sums, and ``√varnum = N_h·σ_h`` is the Neyman weight
    directly — one IEEE-correctly-rounded sqrt per stratum, so the
    doubles (and their floors) are bit-identical cross-engine, and the
    final allocation is pure integer arithmetic, capped at the stratum
    population.  One aggregate over the log + a 1-row broadcast; no
    shuffle beyond the 5-group agg.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
    )
    per = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        # widen BEFORE the square/products: a 9.9e10-cent row wraps
        # cents*cents (and s1*s1) in LongType silently
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * cents")).alias("s2"),
    )
    per = per.withColumn(
        "weight",
        F.expr(
            "CAST(floor(sqrt(CAST(n_rows * s2 - s1 * s1 AS DOUBLE))) AS BIGINT)"
        ),
    )
    tot = per.agg(F.sum("weight").alias("denom"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_rows",
            F.expr("weight * 1000 DIV greatest(n_rows, 1)").alias("sd_milli"),
            "weight",
            F.least(
                F.col("n_rows"),
                F.expr(f"{NEYMAN_BUDGET} * weight DIV greatest(denom, 1)"),
            ).alias("allocation"),
        )
        .orderBy("event_type")
    )


NEYMAN_ALLOCATION_SQL = f"""
WITH per AS (
  SELECT event_type,
         count(*) AS n_rows,
         sum(cents::HUGEINT) AS s1,
         sum(cents::HUGEINT * cents) AS s2
  FROM (SELECT event_type,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events)
  GROUP BY event_type
),
weighted AS (
  SELECT event_type, CAST(n_rows AS BIGINT) AS n_rows,
         CAST(floor(sqrt(CAST(n_rows * s2 - s1 * s1 AS DOUBLE))) AS BIGINT)
           AS weight
  FROM per
),
tot AS (SELECT CAST(sum(weight) AS BIGINT) AS denom FROM weighted)
SELECT event_type, n_rows,
       weight * 1000 // greatest(n_rows, 1) AS sd_milli,
       weight,
       least(n_rows, {NEYMAN_BUDGET} * weight // greatest(denom, 1))
         AS allocation
FROM weighted, tot
ORDER BY event_type
"""


#: shingle width for the novelty curve — the contamination audit's 8
N_NOVELTY = 8


def source_novelty_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marginal-novelty curve of the corpus sources: add sources in
    deterministic (name-ascending) order and report, per source, how
    many of its distinct 8-gram shingles are NEW — unseen in every
    earlier source.  This is the greedy-coverage readout behind data
    mixing decisions ("does adding source X buy new text, or re-buy
    what web-common already covers"), the set-level complement of
    :func:`benchmark_decontamination` (which quarantines specific
    docs) and ``cross_source_overlap`` (which reports pairwise
    overlap, not the sequential marginal).

    Exact and linear: one corpus-wide shingle pass (the shared
    ``word_shingle_hashes`` 60-bit md5 index), a distinct (source, h)
    rollup, min-source-rank per gram (map-combinable), and a
    source-count-sized report with a running sum over the
    source-domain-bounded rank axis.  No pairwise source×source work:
    the marginal against ALL predecessors falls out of the single
    min-rank aggregate.
    """
    d = load_table(spark, sf_dir, "documents")
    # per-source gram sets: reuse the shared shingle helper by keying
    # it on source — per-row array_distinct plus the distinct() below
    # yields exactly the per-source distinct gram set
    sh = word_shingle_hashes(
        d.select(F.col("source").alias("doc_id"), "text"), n=N_NOVELTY
    ).select(F.col("doc_id").alias("source"), "h").distinct().persist()
    ranks = (
        sh.select("source")
        .distinct()
        .withColumn(
            "src_rank",
            F.row_number().over(Window.orderBy(F.asc("source"))).cast(
                "long"
            ),
        )
    )
    first = (
        sh.join(F.broadcast(ranks), "source")
        .groupBy("h")
        .agg(F.min("src_rank").alias("first_rank"))
        .groupBy("first_rank")
        .agg(F.count(F.lit(1)).cast("long").alias("new_grams"))
    )
    per_src = sh.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("distinct_grams")
    )
    out = (
        ranks.join(per_src, "source")
        .join(first, F.col("src_rank") == F.col("first_rank"), "left")
        .select(
            "source",
            "src_rank",
            "distinct_grams",
            F.coalesce("new_grams", F.lit(0)).cast("long").alias("new_grams"),
        )
        .withColumn(
            "cum_grams",
            F.sum("new_grams").over(
                # source-domain-bounded prefix window (a handful of rows)
                Window.orderBy("src_rank").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ).cast("long"),
        )
        .withColumn(
            "novelty_ppm",
            F.expr(
                "CAST(new_grams * 1000000"
                " DIV greatest(distinct_grams, 1) AS BIGINT)"
            ),
        )
        .orderBy("src_rank")
    )
    return scoped_cache(out, sh)


SOURCE_NOVELTY_SQL = rf"""
WITH tk AS (
  SELECT source, regexp_split_to_array(trim(text), '\s+') AS tk
  FROM documents
),
tri AS (
  SELECT DISTINCT source, shingle FROM (
    SELECT source,
           unnest(list_transform(generate_series(0, len(tk) - {N_NOVELTY}),
                  i -> array_to_string(tk[i+1:i+{N_NOVELTY}], ' ')))
             AS shingle
    FROM tk
  ) WHERE len(shingle) > 0
),
sh AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
  FROM tri
),
ranks AS (
  SELECT source, row_number() OVER (ORDER BY source ASC) AS src_rank
  FROM (SELECT DISTINCT source FROM sh)
),
first AS (
  SELECT first_rank, CAST(count(*) AS BIGINT) AS new_grams FROM (
    SELECT s.h, min(r.src_rank) AS first_rank
    FROM sh s JOIN ranks r ON r.source = s.source
    GROUP BY s.h
  ) GROUP BY first_rank
),
per_src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS distinct_grams
  FROM sh GROUP BY source
)
SELECT r.source, r.src_rank, p.distinct_grams,
       CAST(coalesce(f.new_grams, 0) AS BIGINT) AS new_grams,
       CAST(sum(coalesce(f.new_grams, 0)) OVER (
              ORDER BY r.src_rank
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_grams,
       CAST(coalesce(f.new_grams, 0) * 1000000
            // greatest(p.distinct_grams, 1) AS BIGINT) AS novelty_ppm
FROM ranks r
JOIN per_src p ON p.source = r.source
LEFT JOIN first f ON f.first_rank = r.src_rank
ORDER BY r.src_rank
"""



#: best-fit packing: bin capacity (tokens) and shard fan-out.  Shards
#: decorrelate the greedy state so packing parallelizes; capacity is
#: sized to the fixture's doc-length distribution so bins carry real
#: multi-doc structure.
BFP_BUDGET = 300
BFP_SHARDS = 4


def best_fit_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document best-fit-decreasing packing — the NO-SPLIT
    sequence-packing variant (docs are never cut across bins; the
    published alternative to :func:`pack_sequences`' contiguous fill,
    used when attention must not cross document halves): docs sorted by
    (tokens DESC, doc_id) are each placed into the FULLEST existing bin
    they fit (ties to the lowest bin id), else open a new bin.
    Oversized docs are clamped to the budget (truncation semantics) so
    every doc packs.

    Greedy bin-state is inherently sequential, so the stream is
    sharded first — ``(source, md5-hash(doc_id) % BFP_SHARDS)`` — and
    BFD runs independently per shard inside an ``applyInPandas``
    kernel: deterministic, parallel, and near-optimal (bins ≫ shards,
    so per-shard fragmentation stays ~one tail bin per shard).  At
    100 TB raise BFP_SHARDS with the cluster; the kernel's memory is
    one shard's doc list.  The DuckDB oracle replays the EXACT greedy —
    the bin-load vector rides the recursive CTE as a LIST, best-fit =
    ``list_position(loads, list_max(list_filter(...)))`` — so a
    tie-break or update-order divergence is a hash mismatch.

    Output: per-bin occupancy + waste — the fragmentation metric BFD
    exists to minimize (compare `fill_ppm` against
    ``pack_sequences``' contiguous fill to price the no-split
    constraint).
    """
    import pandas as pd

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.least(
            ws_token_count(F.col("text")), F.lit(BFP_BUDGET)
        ).alias("t"),
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16,
                10,
            ).cast("long"),
            F.lit(BFP_SHARDS),
        ).alias("shard"),
    )

    budget = BFP_BUDGET

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(
            zip(pdf["doc_id"], pdf["t"]), key=lambda r: (-r[1], r[0])
        )
        loads: list[int] = []
        bins = []
        for doc_id, t in rows:
            t = int(t)
            fitting = [l for l in loads if l + t <= budget]
            if fitting:
                # first occurrence of the max fitting load — the exact
                # list_position semantics the oracle replays
                idx = loads.index(max(fitting))
                loads[idx] += t
                bins.append(idx + 1)
            else:
                loads.append(t)
                bins.append(len(loads))
        return pd.DataFrame(
            {
                "source": pdf["source"].iloc[:1].repeat(len(rows)).values,
                "shard": pdf["shard"].iloc[:1].repeat(len(rows)).values,
                "bin_id": pd.Series(bins, dtype="int64"),
                "t": pd.Series([int(t) for _, t in rows], dtype="int64"),
            }
        )

    packed = d.groupBy("source", "shard").applyInPandas(
        pack, "source string, shard long, bin_id long, t long"
    )
    return (
        packed.groupBy("source", "shard", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("t").cast("long").alias("bin_tokens"),
        )
        .withColumn(
            "waste_tokens", (F.lit(BFP_BUDGET) - F.col("bin_tokens")).cast("long")
        )
        .withColumn(
            "fill_ppm",
            F.expr(
                f"CAST(CAST(bin_tokens AS DECIMAL(38,0)) * 1000000"
                f" DIV {BFP_BUDGET} AS BIGINT)"
            ),
        )
        .orderBy("source", "shard", "bin_id")
    )


BEST_FIT_PACKING_SQL = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, source,
         least(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
               AS BIGINT), {BFP_BUDGET}) AS t,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
           % {BFP_SHARDS} AS shard
  FROM documents
),
shards AS (
  SELECT source, shard, doc_id, t,
         row_number() OVER (PARTITION BY source, shard
                            ORDER BY t DESC, doc_id) AS rk
  FROM d
),
packed AS (
  SELECT s.source, s.shard, s.rk, s.t,
         [s.t]::BIGINT[] AS loads,
         CAST(1 AS BIGINT) AS bin_id
  FROM shards s WHERE s.rk = 1
  UNION ALL
  SELECT s.source, s.shard, s.rk, s.t,
         CASE WHEN mx.m IS NULL THEN list_append(p.loads, s.t)
              ELSE list_transform(range(1, len(p.loads) + 1),
                     i -> CASE WHEN i = list_position(p.loads, mx.m)
                               THEN p.loads[CAST(i AS INT)] + s.t
                               ELSE p.loads[CAST(i AS INT)] END)
         END AS loads,
         CAST(coalesce(list_position(p.loads, mx.m), len(p.loads) + 1)
           AS BIGINT) AS bin_id
  FROM packed p
  JOIN shards s ON s.source = p.source AND s.shard = p.shard
               AND s.rk = p.rk + 1
  LEFT JOIN LATERAL (
    SELECT list_max(list_filter(p.loads, l -> l + s.t <= {BFP_BUDGET}))
      AS m
  ) mx ON true
)
SELECT source, CAST(shard AS BIGINT) AS shard, bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t) AS BIGINT) AS bin_tokens,
       CAST({BFP_BUDGET} - sum(t) AS BIGINT) AS waste_tokens,
       CAST(sum(t)::HUGEINT * 1000000 // {BFP_BUDGET} AS BIGINT)
         AS fill_ppm
FROM packed
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""



#: span corruption: ~1/SPAN_EVERY of token positions seed a mask span
#: of SPAN_LEN tokens (T5's ~15% corruption at mean span 3)
SPAN_EVERY = 20
SPAN_LEN = 3


def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/UL2-style span-corruption mask PLANNING: deterministically
    choose masking spans per document (a token position seeds a span
    iff ``md5(doc_id:pos) % SPAN_EVERY == 0``; each span covers
    ``SPAN_LEN`` positions; overlapping spans merge), then report the
    per-source corruption profile — tokens masked, maximal mask
    islands (= sentinel count in the T5 encoding), and the realized
    corruption rate.  This is the plan a denoising-objective data
    writer executes per shard; hash-seeded selection makes it
    reproducible across runs and engines, the
    ``train_test_split_report`` discipline.

    Relational shape: tokenize → hash-filter span seeds → explode each
    seed into its covered positions → DISTINCT → gaps-and-islands
    (pos − rank) to count maximal islands — all built-ins, one shuffle
    per aggregate, no Python.  The oracle replays the identical md5
    arithmetic.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "tok"),
    )
    n_tok = toks.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens")
    )
    seeds = toks.filter(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.col("doc_id"), F.col("pos"))
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % SPAN_EVERY
        == 0
    ).select("doc_id", "pos")
    covered = (
        seeds.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("pos"), F.col("pos") + F.lit(SPAN_LEN - 1)
                )
            ).alias("mpos"),
        )
        .join(
            n_tok.select("doc_id", "n_tokens"), "doc_id"
        )
        .filter(F.col("mpos") < F.col("n_tokens"))  # clip at doc end
        .select("doc_id", "mpos")
        .distinct()
    )
    wi = Window.partitionBy("doc_id").orderBy("mpos")
    islands = (
        covered.withColumn(
            "grp", F.col("mpos") - F.row_number().over(wi)
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_masked"),
            F.countDistinct("grp").cast("long").alias("n_islands"),
        )
    )
    per_doc = n_tok.join(islands, "doc_id", "left").select(
        "source",
        "n_tokens",
        F.coalesce("n_masked", F.lit(0)).cast("long").alias("n_masked"),
        F.coalesce("n_islands", F.lit(0)).cast("long").alias("n_islands"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_masked").cast("long").alias("total_masked"),
            F.sum("n_islands").cast("long").alias("total_islands"),
            F.expr(
                "CAST(sum(CAST(n_masked AS DECIMAL(38,0))) * 1000000"
                " DIV greatest(sum(n_tokens), 1) AS BIGINT)"
            ).alias("corruption_ppm"),
        )
        .orderBy("source")
    )


SPAN_CORRUPTION_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok,
         generate_subscripts(regexp_split_to_array(trim(text), '\\s+'), 1)
           - 1 AS pos
  FROM documents
),
n_tok AS (
  SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY 1, 2
),
seeds AS (
  SELECT doc_id, pos FROM toks
  WHERE ('0x' || substr(md5(doc_id::VARCHAR || ':' || pos::VARCHAR),
                        1, 15))::BIGINT % {SPAN_EVERY} = 0
),
covered AS (
  SELECT DISTINCT s.doc_id, s.pos + o.i AS mpos
  FROM seeds s, (SELECT unnest(range({SPAN_LEN})) AS i) o
  JOIN n_tok n ON n.doc_id = s.doc_id
  WHERE s.pos + o.i < n.n_tokens
),
islands AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_masked,
         CAST(count(DISTINCT mpos - rk) AS BIGINT) AS n_islands
  FROM (
    SELECT doc_id, mpos,
           row_number() OVER (PARTITION BY doc_id ORDER BY mpos) AS rk
    FROM covered
  ) GROUP BY 1
),
per_doc AS (
  SELECT n.source, n.n_tokens,
         coalesce(i.n_masked, 0) AS n_masked,
         coalesce(i.n_islands, 0) AS n_islands
  FROM n_tok n LEFT JOIN islands i ON n.doc_id = i.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_masked) AS BIGINT) AS total_masked,
       CAST(sum(n_islands) AS BIGINT) AS total_islands,
       CAST(sum(n_masked::HUGEINT) * 1000000
            // greatest(sum(n_tokens), 1) AS BIGINT) AS corruption_ppm
FROM per_doc
GROUP BY source
ORDER BY source
"""


SPARK_QUERIES = {
    "pack_sequences": pack_sequences,
    "best_fit_packing": best_fit_packing,
    "span_corruption_plan": span_corruption_plan,
    "chunk_documents": chunk_documents,
    "per_group_sample": per_group_sample,
    "stratified_sample_mix": stratified_sample_mix,
    "benchmark_decontamination": benchmark_decontamination,
    "incremental_dedup_report": incremental_dedup_report,
    "length_band_filter": length_band_filter,
    "token_budget_selection": token_budget_selection,
    "train_test_split_report": train_test_split_report,
    "weighted_sample_wor": weighted_sample_wor,
    "shard_assignment_audit": shard_assignment_audit,
    "mixture_temperature_weights": mixture_temperature_weights,
    "curriculum_quality_buckets": curriculum_quality_buckets,
    "neyman_allocation_plan": neyman_allocation_plan,
    "source_novelty_curve": source_novelty_curve,
}

ORACLE_SQL = {
    "source_novelty_curve": SOURCE_NOVELTY_SQL,
    "pack_sequences": PACK_SEQUENCES_SQL,
    "best_fit_packing": BEST_FIT_PACKING_SQL,
    "span_corruption_plan": SPAN_CORRUPTION_SQL,
    "chunk_documents": CHUNK_DOCUMENTS_SQL,
    "per_group_sample": PER_GROUP_SAMPLE_SQL,
    "stratified_sample_mix": STRATIFIED_MIX_SQL,
    "benchmark_decontamination": DECONTAM_SQL,
    "incremental_dedup_report": INCR_DEDUP_SQL,
    "length_band_filter": LENGTH_BAND_SQL,
    "token_budget_selection": TOKEN_BUDGET_SQL,
    "train_test_split_report": TRAIN_TEST_SPLIT_SQL,
    "weighted_sample_wor": WEIGHTED_SAMPLE_SQL,
    "shard_assignment_audit": SHARD_AUDIT_SQL,
    "mixture_temperature_weights": MIXTURE_TEMPERATURE_SQL,
    "curriculum_quality_buckets": _curriculum_sql(),
    "neyman_allocation_plan": NEYMAN_ALLOCATION_SQL,
}
