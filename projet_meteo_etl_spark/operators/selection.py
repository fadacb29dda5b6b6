"""Corpus curation / selection audits: policy filtering, prefix dedup,
cross-source overlap, vocabulary drift, and canonical-doc retention.

Beyond the reference's surface (its only "selection" is dropping
null-timestamp rows, ``/root/reference/etl_meteo.py:64``) — these are
the remaining standard passes of a web-scale training-data pipeline
that the dedup/importance/text families don't yet cover:

* **Policy (blocklist) filter** — the C4 "bad words" pass: per-source
  document hit rates against a configurable term blocklist, evaluated
  as one whole-word regex per document (no explode: the blocklist is
  tiny and compiled into the scan projection).
* **Prefix-duplicate groups** — the C4/RefinedWeb URL-or-leading-text
  dedup shape: documents sharing the same normalized leading
  ``PREFIX_CHARS`` characters form a group; one canonical survivor
  (min doc_id) is retained per group.
* **Cross-source overlap matrix** — contamination audit: for each
  ordered source pair, how many prefix fingerprints they share.
  The classic "did split A leak into split B" check at corpus scale.
* **Vocabulary KL drift** — per-source KL(P_source ‖ P_corpus) over
  hashed unigram buckets, integer-micronat quantized: which sources
  diverge most from the corpus-wide token distribution.
* **Retention policy** — over prefix-cluster groups, keep the "best"
  member (longest text, doc_id as tiebreak) and report per-source
  kept/dropped counts: the dedup decision actually applied by pipelines,
  not just the pair list.

Engine mapping / 100 TB stance:

* the policy filter is a pure projection (regexp on the scan, one
  groupBy(source) — map-side combinable, no join);
* prefix groups shuffle once on a 60-bit md5 prefix hash — group keys
  are uniform, no skew;
* the overlap matrix reduces documents → distinct (fingerprint, source)
  first (the only large shuffle), then self-joins the *reduced* table
  on fingerprint; a corpus-frequent identical text cannot blow up the
  join because each (fingerprint, source) survives once;
* KL drift is a wordcount into ``KL_BUCKETS`` hashed buckets — the
  per-source model is B-bounded, so the final divergence computation
  is over a table of |sources|×B rows regardless of corpus size;
* retention is one window (or min-struct groupBy) over the fingerprint
  shuffle — identical partitioning to exact dedup, reused here.

All hashes are portable md5-prefix integers; all real-valued outputs
are ``pround``-quantized or integer micronats, so every query here
oracle-checks bit-exactly against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.cachescope import scoped_cache
from projet_meteo_etl_spark.catalog import load_table, spread_scan
from projet_meteo_etl_spark.functions.portable import pround, pround_sql
from projet_meteo_etl_spark.functions.twopass import bucket_prefix

_WS = r"\s+"

#: C4-style policy blocklist.  Chosen to actually hit the synthetic
#: corpus (which draws from a small Spark-flavored vocabulary) so the
#: audit exercises the non-degenerate path at every scale factor.
POLICY_TERMS = ("slow", "error", "crash")

#: leading characters compared for prefix-duplicate grouping
PREFIX_CHARS = 40

#: hashed unigram buckets for the KL drift model (B-bounded per source)
KL_BUCKETS = 512
#: micronat quantization scale (matches operators.importance / experiments)
KL_SCALE = 1_000_000


def _policy_regex() -> str:
    return r"\b(" + "|".join(POLICY_TERMS) + r")\b"


def policy_blocklist_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source policy-filter audit: documents matching the blocklist,
    total blocklist term instances, and the per-source hit rate.

    One scan, no joins: the blocklist compiles into two projection
    expressions (`rlike` for the flag, `regexp_count` for instances),
    then a single map-side-combinable groupBy(source).  At 100 TB this
    is the cheapest possible shape — the regex runs inside whole-stage
    codegen and the shuffle carries |sources| rows.
    """
    d = load_table(spark, sf_dir, "documents")
    pat = _policy_regex()
    per_doc = d.select(
        "source",
        F.col("text").rlike(pat).cast("int").alias("hit"),
        F.regexp_count(F.col("text"), F.lit(pat)).cast("long").alias("n_terms"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("hit").cast("long").alias("n_flagged"),
            F.sum("n_terms").cast("long").alias("n_term_hits"),
        )
        .select(
            "source",
            "n_docs",
            "n_flagged",
            "n_term_hits",
            pround(F.col("n_flagged") / F.col("n_docs"), 6).alias("flag_rate"),
        )
        .orderBy("source")
    )


_POLICY_PAT = r"\b(" + "|".join(POLICY_TERMS) + r")\b"

POLICY_BLOCKLIST_SQL = rf"""
WITH per_doc AS (
  SELECT source,
         CASE WHEN regexp_matches(text, '{_POLICY_PAT}')
              THEN 1 ELSE 0 END AS hit,
         len(regexp_extract_all(text, '{_POLICY_PAT}')) AS n_terms
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(hit) AS BIGINT) AS n_flagged,
       CAST(sum(n_terms) AS BIGINT) AS n_term_hits,
       {pround_sql('sum(hit) * 1.0 / count(*)', 6)} AS flag_rate
FROM per_doc
GROUP BY source
ORDER BY source
"""


def _prefix_hash(col) -> F.Column:
    """Portable 60-bit hash of the normalized leading PREFIX_CHARS."""
    norm = F.substring(F.lower(F.trim(col)), 1, PREFIX_CHARS)
    return F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long")


_PREFIX_HASH_SQL = (
    "('0x' || substr(md5(substr(lower(trim(text)), 1, "
    f"{PREFIX_CHARS})), 1, 15))::BIGINT"
)


def prefix_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-duplicate grouping: docs sharing the same normalized
    leading ``PREFIX_CHARS`` chars collapse to one survivor (min
    doc_id).  Output: every member of a multi-doc prefix group with its
    group size and whether it is the retained canonical.

    One shuffle on the uniform md5 prefix hash; the group-size and
    survivor computation is a single aggregation re-joined on the same
    key (co-partitioned — AQE elides the second exchange).
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", _prefix_hash(F.col("text")).alias("ph")
    )
    groups = (
        d.groupBy("ph")
        .agg(
            F.count(F.lit(1)).cast("long").alias("group_size"),
            F.min("doc_id").alias("canonical_id"),
        )
        .filter(F.col("group_size") > 1)
    )
    return (
        d.join(groups, "ph")
        .select(
            "doc_id",
            "source",
            "group_size",
            (F.col("doc_id") == F.col("canonical_id")).cast("int").alias("retained"),
        )
        .orderBy("doc_id")
    )


PREFIX_DUP_SQL = rf"""
WITH d AS (
  SELECT doc_id, source, {_PREFIX_HASH_SQL} AS ph FROM documents
),
groups AS (
  SELECT ph, CAST(count(*) AS BIGINT) AS group_size,
         min(doc_id) AS canonical_id
  FROM d GROUP BY ph HAVING count(*) > 1
)
SELECT d.doc_id, d.source, g.group_size,
       CAST(CASE WHEN d.doc_id = g.canonical_id THEN 1 ELSE 0 END
            AS INTEGER) AS retained
FROM d JOIN groups g USING (ph)
ORDER BY d.doc_id
"""


def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination matrix: for each ordered source pair (a < b), how
    many prefix fingerprints (normalized leading ``PREFIX_CHARS`` — the
    URL-proxy fingerprint crawl pipelines dedup on) appear in both,
    plus each side's distinct-fingerprint count and the pair Jaccard.

    The big shuffle reduces documents → distinct (fingerprint, source)
    BEFORE the self-join, so a text duplicated a million times inside
    one source contributes exactly one row to the join — the pair
    explosion exact-dedup self-joins suffer from cannot happen.  The
    reduced table self-joins on the fingerprint hash (uniform key) and
    aggregates to |sources|² rows.
    """
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(_prefix_hash(F.col("text")).alias("fp"), "source").distinct()
    sizes = fp.groupBy("source").agg(F.count(F.lit(1)).cast("long").alias("n_fp"))
    a, b = fp.alias("a"), fp.alias("b")
    shared = (
        a.join(b, "fp")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fp"))
    )
    return (
        shared.join(
            F.broadcast(sizes).withColumnsRenamed({"source": "source_a", "n_fp": "n_fp_a"}),
            "source_a",
        )
        .join(
            F.broadcast(sizes).withColumnsRenamed({"source": "source_b", "n_fp": "n_fp_b"}),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "shared_fp",
            "n_fp_a",
            "n_fp_b",
            pround(
                F.col("shared_fp")
                / (F.col("n_fp_a") + F.col("n_fp_b") - F.col("shared_fp")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


CROSS_SOURCE_OVERLAP_SQL = rf"""
WITH fp AS (
  SELECT DISTINCT {_PREFIX_HASH_SQL} AS fp, source
  FROM documents
),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_fp FROM fp GROUP BY source),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS shared_fp
  FROM fp a JOIN fp b ON a.fp = b.fp AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source_a, source_b, shared_fp,
       sa.n_fp AS n_fp_a, sb.n_fp AS n_fp_b,
       {pround_sql('shared_fp * 1.0 / (sa.n_fp + sb.n_fp - shared_fp)', 6)}
         AS jaccard
FROM shared
JOIN sizes sa ON sa.source = shared.source_a
JOIN sizes sb ON sb.source = shared.source_b
ORDER BY source_a, source_b
"""


def vocab_kl_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary drift: KL(P_source ‖ P_corpus) over
    ``KL_BUCKETS`` hashed unigram buckets, in integer micronats.

    Add-one smoothing on both distributions keeps every bucket
    positive.  The per-bucket term floor(p_s · ln(p_s/p_c) · SCALE) is
    quantized BEFORE the per-source sum (the importance/experiments
    precedent), so the reported divergence is an exact integer sum and
    hashes identically across engines.

    Scale: a wordcount into |sources|×B rows; the corpus model (B rows)
    broadcasts into the final join.  Nothing here grows with corpus
    size except the one map-side-combined token count.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = (
        spread_scan(d.select("source", "text"))
        .select("source", F.explode(F.split(F.trim("text"), _WS)).alias("tok"))
        .filter(F.length("tok") > 0)
        .select(
            "source",
            (
                F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
                % KL_BUCKETS
            ).alias("b"),
        )
    )
    src_b = toks.groupBy("source", "b").agg(F.count(F.lit(1)).alias("c_s"))
    corpus_b = src_b.groupBy("b").agg(F.sum("c_s").alias("c_c"))
    tot_c = corpus_b.agg(F.sum("c_c").alias("n_c"))
    src_tot = src_b.groupBy("source").agg(F.sum("c_s").alias("n_s"))

    # KL non-negativity needs the FULL support: enumerate every bucket
    # 0..B−1 (not just observed ones) so smoothing mass on unseen
    # buckets — a strictly positive KL contribution — is counted.
    # The frame stays small: |sources| × B rows.
    all_b = spark.range(KL_BUCKETS).select(F.col("id").alias("b"))
    frame = (
        src_tot.crossJoin(F.broadcast(all_b))
        .join(F.broadcast(corpus_b), "b", "left")
        .na.fill(0, ["c_c"])
        .crossJoin(F.broadcast(tot_c))
    )
    terms = (
        frame.join(src_b, ["source", "b"], "left")
        .na.fill(0, ["c_s"])
        .select(
            "source",
            "n_s",
            F.floor(
                ((F.col("c_s") + 1.0) / (F.col("n_s") + F.lit(float(KL_BUCKETS))))
                * (
                    F.log(
                        (F.col("c_s") + 1.0)
                        / (F.col("n_s") + F.lit(float(KL_BUCKETS)))
                    )
                    - F.log(
                        (F.col("c_c") + 1.0)
                        / (F.col("n_c") + F.lit(float(KL_BUCKETS)))
                    )
                )
                * KL_SCALE
            )
            .cast("long")
            .alias("term"),
        )
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("n_s").cast("long").alias("n_tokens"),
            F.sum("term").cast("long").alias("kl_micronats"),
        )
        .orderBy("source")
    )


VOCAB_KL_SQL = rf"""
WITH toks AS (
  SELECT source,
         ('0x' || substr(md5(tok), 1, 15))::BIGINT % {KL_BUCKETS} AS b
  FROM (
    SELECT source, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
    FROM documents
  ) WHERE length(tok) > 0
),
src_b AS (SELECT source, b, count(*) AS c_s FROM toks GROUP BY source, b),
corpus_b AS (SELECT b, sum(c_s) AS c_c FROM src_b GROUP BY b),
tot_c AS (SELECT sum(c_c) AS n_c FROM corpus_b),
src_tot AS (SELECT source, sum(c_s) AS n_s FROM src_b GROUP BY source),
terms AS (
  SELECT f.source, f.n_s,
         CAST(floor(((coalesce(s.c_s, 0) + 1.0) / (f.n_s + {KL_BUCKETS}.0))
                    * (ln((coalesce(s.c_s, 0) + 1.0) / (f.n_s + {KL_BUCKETS}.0))
                       - ln((f.c_c + 1.0) / (f.n_c + {KL_BUCKETS}.0)))
                    * {KL_SCALE}) AS BIGINT) AS term
  FROM (SELECT st.source, st.n_s, ab.b, coalesce(cb.c_c, 0) AS c_c, tc.n_c
        FROM src_tot st
        CROSS JOIN (SELECT unnest(generate_series(0, {KL_BUCKETS} - 1)) AS b) ab
        LEFT JOIN corpus_b cb ON cb.b = ab.b
        CROSS JOIN tot_c tc) f
  LEFT JOIN src_b s ON s.source = f.source AND s.b = f.b
)
SELECT source,
       CAST(max(n_s) AS BIGINT) AS n_tokens,
       CAST(sum(term) AS BIGINT) AS kl_micronats
FROM terms
GROUP BY source
ORDER BY source
"""


def dedup_retention_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup decision pipelines actually apply: over prefix-cluster
    groups (the same URL-proxy fingerprint as ``cross_source_overlap``),
    retain the best member — longest text, lowest doc_id as the
    deterministic tiebreak — and report per-source totals: docs seen,
    docs retained, docs dropped as near-duplicates, and characters
    dropped.  Complements ``prefix_dup_groups`` (the membership list)
    with the aggregate outcome the pipeline acts on.

    Plan: one shuffle on the fingerprint hash; the survivor per group
    is a single ``min_by``-style struct aggregation (no window, no
    second sort), then per-source rollup of the survivor flag.  This is
    the identical partitioning exact dedup uses — at 100 TB the
    retention decision costs nothing beyond the dedup itself.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        _prefix_hash(F.col("text")).alias("fp"),
    )
    # best member per group: max n_chars, then min doc_id — encoded as
    # one orderable struct so a single max() picks the survivor
    best = d.groupBy("fp").agg(
        F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id"))).alias(
            "best"
        )
    )
    flagged = d.join(best, "fp").select(
        "source",
        "n_chars",
        (
            (F.col("n_chars") == F.col("best.n_chars"))
            & (F.col("doc_id") == -F.col("best.neg_id"))
        )
        .cast("int")
        .alias("retained"),
    )
    return (
        flagged.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("retained").cast("long").alias("n_retained"),
            (F.count(F.lit(1)) - F.sum("retained")).cast("long").alias("n_dropped"),
            F.sum(
                F.when(F.col("retained") == 0, F.col("n_chars")).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("chars_dropped"),
        )
        .orderBy("source")
    )


DEDUP_RETENTION_SQL = rf"""
WITH d AS (
  SELECT doc_id, source, n_chars, {_PREFIX_HASH_SQL} AS fp
  FROM documents
),
best AS (
  SELECT fp, max(n_chars) AS best_chars,
         -- survivor: longest text, then lowest doc_id (mirrors the
         -- Spark max(struct(n_chars, -doc_id)) aggregation)
         -max(struct_pack(c := n_chars, nid := -doc_id)).nid AS best_id
  FROM d GROUP BY fp
),
flagged AS (
  SELECT d.source, d.n_chars,
         CASE WHEN d.n_chars = b.best_chars AND d.doc_id = b.best_id
              THEN 1 ELSE 0 END AS retained
  FROM d JOIN best b USING (fp)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(retained) AS BIGINT) AS n_retained,
       CAST(count(*) - sum(retained) AS BIGINT) AS n_dropped,
       CAST(sum(CASE WHEN retained = 0 THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_dropped
FROM flagged
GROUP BY source
ORDER BY source
"""


def corpus_report_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus report card — the one table a data owner
    reads before approving a source for training: document count,
    model-based quality keep rate (:func:`~projet_meteo_etl_spark.
    operators.importance.fasttext_quality_score`), Gopher repetition
    keep rate (:func:`~projet_meteo_etl_spark.operators.corpus_stats.
    text_repetition_filter`), language-label agreement rate
    (:func:`~projet_meteo_etl_spark.operators.text.text_langid`), and
    the corpus-level mean classifier score from exact integer sums.

    Composes the REGISTERED operators (same plans the individual
    queries run) and aggregates their per-document outputs by source;
    the oracle composes the exact same three SQL texts as CTEs.  Rates
    divide integer counts, the mean divides two integer sums — nothing
    averages pre-rounded floats, so the rollup is engine-exact.

    Scale: three doc-keyed relations joined on ``doc_id`` (the shared
    partitioning) then one source-keyed aggregate; each signal keeps
    its own documented plan.
    """
    from projet_meteo_etl_spark.operators.corpus_stats import (
        text_repetition_filter,
    )
    from projet_meteo_etl_spark.operators.importance import (
        fasttext_quality_score,
    )
    from projet_meteo_etl_spark.operators.text import text_langid

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ft = fasttext_quality_score(spark, sf_dir).select(
        "doc_id",
        "n_features",
        "score_sum_milli",
        F.col("keep").alias("ft_keep"),
    )
    rep = text_repetition_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").cast("int").alias("rep_keep")
    )
    lid = text_langid(spark, sf_dir).select(
        "doc_id",
        (F.col("lang_pred") == F.col("lang_label")).cast("int").alias("lid_ok"),
    )
    return (
        d.join(ft, "doc_id")
        .join(rep, "doc_id")
        .join(lid, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            pround(F.sum("ft_keep") / F.count(F.lit(1)), 6).alias("ft_keep_rate"),
            pround(F.sum("rep_keep") / F.count(F.lit(1)), 6).alias("rep_keep_rate"),
            pround(F.sum("lid_ok") / F.count(F.lit(1)), 6).alias("langid_match_rate"),
            pround(
                F.sum("score_sum_milli") / F.sum("n_features") / 1000.0, 6
            ).alias("mean_ft_score"),
        )
        .orderBy("source")
    )


def _report_card_sql() -> str:
    from projet_meteo_etl_spark.operators.corpus_stats import (
        TEXT_REPETITION_SQL,
    )
    from projet_meteo_etl_spark.operators.importance import FASTTEXT_SQL
    from projet_meteo_etl_spark.operators.text import TEXT_LANGID_SQL

    return f"""
WITH ft AS ({FASTTEXT_SQL}),
rep AS ({TEXT_REPETITION_SQL}),
lid AS ({TEXT_LANGID_SQL})
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       {pround_sql('sum(ft.keep) * 1.0 / count(*)', 6)} AS ft_keep_rate,
       {pround_sql('sum(CASE WHEN rep.keep THEN 1 ELSE 0 END) * 1.0 / count(*)', 6)} AS rep_keep_rate,
       {pround_sql("sum(CASE WHEN lid.lang_pred = lid.lang_label THEN 1 ELSE 0 END) * 1.0 / count(*)", 6)} AS langid_match_rate,
       {pround_sql('sum(ft.score_sum_milli) * 1.0 / sum(ft.n_features) / 1000.0', 6)} AS mean_ft_score
FROM documents d
JOIN ft ON ft.doc_id = d.doc_id
JOIN rep ON rep.doc_id = d.doc_id
JOIN lid ON lid.doc_id = d.doc_id
GROUP BY d.source
ORDER BY d.source
"""


#: calibration buckets (deciles of the classifier score)
CALIB_BUCKETS = 10


def _calibration_bucketed(spark: SparkSession, sf_dir: str):
    """Shared decile construction for the calibration curve and the
    ECE/MCE summary: (classifier score ⋈ repetition filter) ranked by
    the two-pass exact bucket-prefix plan into ``CALIB_BUCKETS``
    integer deciles.  Returns (bucketed, scored) — callers must pass
    ``scored`` to ``scoped_cache`` so its persist is released."""
    from projet_meteo_etl_spark.operators.corpus_stats import (
        text_repetition_filter,
    )
    from projet_meteo_etl_spark.operators.importance import (
        fasttext_quality_score,
    )

    ft = fasttext_quality_score(spark, sf_dir).select(
        "doc_id", "n_features", "score_sum_milli"
    )
    rep = text_repetition_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").cast("int").alias("rep_keep")
    )
    # two-pass exact rank (no single-partition sort): quantize the
    # integer score into width-1000 buckets (truncating div — monotone,
    # bucket count bounded by the score DOMAIN), exclusive prefix-count
    # over the bucket rollup + row_number within bucket.  The scored
    # relation feeds three consumers (bucket stats, total, ranked join)
    # — persist it or the classifier+repetition upstream runs thrice
    # (17× wall at the 10× probe)
    scored = (
        ft.join(rep, "doc_id")
        .withColumn("sbucket", F.expr("score_sum_milli div 1000"))
        .persist()
    )
    pre = bucket_prefix(
        scored, "sbucket", {"n": (F.count(F.lit(1)), "sum")}
    )
    total = scored.agg(F.count(F.lit(1)).alias("n"))
    win = Window.partitionBy("sbucket").orderBy("score_sum_milli", "doc_id")
    bucketed = (
        scored.join(F.broadcast(pre), "sbucket")
        .withColumn(
            "rn", F.coalesce("pre_n", F.lit(0)) + F.row_number().over(win)
        )
        .crossJoin(F.broadcast(total))
        # decile = floor((rn-1) * B / n) + 1 — pure integer arithmetic,
        # sizes differ by at most 1, no engine NTILE quirks
        .withColumn(
            "decile",
            (F.expr(f"((rn - 1) * {CALIB_BUCKETS}) div n") + 1).cast("int"),
        )
    )
    return bucketed, scored


def quality_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve for the quality classifier: documents bucketed
    into score deciles (rank-exact NTILE on the integer score sum, doc
    id tie-break), each decile reporting its agreement with the
    INDEPENDENT repetition filter — does a higher model score actually
    mean cleaner text?  This is the eval every learned quality filter
    gets before it gates a corpus: a flat curve means the model adds
    nothing over the cheap heuristic.

    Deciles come from ``row_number``/bucket arithmetic on integers (no
    NTILE float boundary), keep rates divide integer counts, and the
    mean score per decile divides integer sums — engine-exact
    throughout.
    """
    bucketed, scored = _calibration_bucketed(spark, sf_dir)
    out = (
        bucketed.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            pround(
                F.sum("score_sum_milli") / F.sum("n_features") / 1000.0, 6
            ).alias("mean_score"),
            pround(F.sum("rep_keep") / F.count(F.lit(1)), 6).alias(
                "rep_keep_rate"
            ),
        )
        .orderBy("decile")
    )
    return scoped_cache(out, scored)


def calibration_ece_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected / maximum calibration error of the quality classifier —
    the one-number companions to :func:`quality_score_calibration`'s
    reliability curve: ECE = Σ_b (n_b/N)·|acc_b − conf_b| and
    MCE = max_b |acc_b − conf_b|, with the repetition filter's keep
    rate as accuracy and the mean milli-score as confidence.  This is
    the number a filter-threshold review actually compares across model
    versions; the curve shows WHERE miscalibration lives, ECE/MCE say
    HOW MUCH.

    The classifier's summed per-feature milli-score is not a bounded
    probability (trigram weights can push a decile's mean past 1.0), so
    confidence is CLAMPED to [0, feat_b·1000] before the gap — exactly
    the clamp a practitioner applies before reading ECE off an
    unnormalized scorer, and it keeps both metrics in [0, 1e6] ppm.

    Exact integer form: per decile the gap numerator is
    ``|keep_b·1000·feat_b − clamp(score_b)·n_b|`` in DECIMAL(38,0)
    (safe past 1e9-doc deciles where the int64 product would wrap),
    each bucket's contribution truncates once (``·1e6 DIV
    (feat_b·1000)``), and ECE divides the bucket sum by N — the
    identical truncation order in DuckDB HUGEINT, so the ppm values
    hash cross-engine.
    """
    bucketed, scored = _calibration_bucketed(spark, sf_dir)
    per = bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("rep_keep").alias("keep_b"),
        F.sum("score_sum_milli").alias("score_b"),
        F.sum("n_features").alias("feat_b"),
        F.max("n").alias("n"),
    )
    terms = per.select(
        "n",
        "n_b",
        "feat_b",
        F.expr(
            "abs(CAST(keep_b AS DECIMAL(38,0)) * 1000 * feat_b"
            " - least(greatest(CAST(score_b AS DECIMAL(38,0)), 0),"
            "         CAST(feat_b AS DECIMAL(38,0)) * 1000) * n_b)"
        ).alias("gap"),
    )
    out = terms.agg(
        F.max("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.expr(
            "CAST(sum(CASE WHEN feat_b = 0 THEN 0"
            " ELSE gap * 1000000 DIV (CAST(feat_b AS DECIMAL(38,0)) * 1000)"
            " END) DIV max(n) AS BIGINT)"
        ).alias("ece_ppm"),
        F.expr(
            "CAST(max(CASE WHEN feat_b = 0 THEN 0"
            " ELSE gap * 1000000"
            " DIV (CAST(feat_b AS DECIMAL(38,0)) * 1000 * n_b)"
            " END) AS BIGINT)"
        ).alias("mce_ppm"),
    )
    return scoped_cache(out, scored)


def _calibration_prefix_sql() -> str:
    from projet_meteo_etl_spark.operators.corpus_stats import (
        TEXT_REPETITION_SQL,
    )
    from projet_meteo_etl_spark.operators.importance import FASTTEXT_SQL

    return f"""
WITH ft AS ({FASTTEXT_SQL}),
rep AS ({TEXT_REPETITION_SQL}),
b AS (
  SELECT ft.doc_id, ft.n_features, ft.score_sum_milli,
         CASE WHEN rep.keep THEN 1 ELSE 0 END AS rep_keep,
         row_number() OVER (ORDER BY ft.score_sum_milli, ft.doc_id) AS rn,
         count(*) OVER () AS n
  FROM ft JOIN rep ON rep.doc_id = ft.doc_id
)"""


def _ece_sql() -> str:
    return f"""
{_calibration_prefix_sql()},
per AS (
  SELECT ((rn - 1) * {CALIB_BUCKETS}) // n + 1 AS decile,
         count(*) AS n_b,
         sum(rep_keep) AS keep_b,
         sum(score_sum_milli) AS score_b,
         sum(n_features) AS feat_b,
         max(n) AS n
  FROM b GROUP BY 1
),
terms AS (
  SELECT n, n_b, feat_b,
         abs(keep_b::HUGEINT * 1000 * feat_b
             - least(greatest(score_b::HUGEINT, 0),
                     feat_b::HUGEINT * 1000) * n_b) AS gap
  FROM per
)
SELECT CAST(max(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(CASE WHEN feat_b = 0 THEN 0
                ELSE gap * 1000000 // (feat_b::HUGEINT * 1000) END)
            // max(n) AS BIGINT) AS ece_ppm,
       CAST(max(CASE WHEN feat_b = 0 THEN 0
                ELSE gap * 1000000 // (feat_b::HUGEINT * 1000 * n_b) END)
            AS BIGINT) AS mce_ppm
FROM terms
"""


def _calibration_sql() -> str:
    # the ft/rep/b decile prefix is SHARED with the ECE oracle — one
    # definition, so the two oracles' bucketing can never desynchronize
    return f"""
{_calibration_prefix_sql()}
SELECT CAST(((rn - 1) * {CALIB_BUCKETS}) // n + 1 AS INTEGER) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       {pround_sql('sum(score_sum_milli) * 1.0 / sum(n_features) / 1000.0', 6)} AS mean_score,
       {pround_sql('sum(rep_keep) * 1.0 / count(*)', 6)} AS rep_keep_rate
FROM b
GROUP BY 1
ORDER BY decile
"""


SPARK_QUERIES = {
    "policy_blocklist_audit": policy_blocklist_audit,
    "prefix_dup_groups": prefix_dup_groups,
    "cross_source_overlap": cross_source_overlap,
    "vocab_kl_by_source": vocab_kl_by_source,
    "dedup_retention_policy": dedup_retention_policy,
    "corpus_report_card": corpus_report_card,
    "quality_score_calibration": quality_score_calibration,
    "calibration_ece_summary": calibration_ece_summary,
}

ORACLE_SQL = {
    "corpus_report_card": _report_card_sql(),
    "quality_score_calibration": _calibration_sql(),
    "calibration_ece_summary": _ece_sql(),
    "policy_blocklist_audit": POLICY_BLOCKLIST_SQL,
    "prefix_dup_groups": PREFIX_DUP_SQL,
    "cross_source_overlap": CROSS_SOURCE_OVERLAP_SQL,
    "vocab_kl_by_source": VOCAB_KL_SQL,
    "dedup_retention_policy": DEDUP_RETENTION_SQL,
}
