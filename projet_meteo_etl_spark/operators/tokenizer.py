"""Tokenizer-training and substring-level dedup passes.

The reference has no text surface (SURVEY.md §2.5); these two
operators extend the corpus-statistics family (`operators/
corpus_stats.py`) with the remaining passes a pretraining data
pipeline runs between raw text and tokenized shards:

* ``bpe_merge_topk`` — the first iteration of byte-pair-encoding
  tokenizer training (Sennrich et al. 2016): adjacent character-pair
  frequencies over the corpus, weighted by word frequency, top-k merge
  candidates.  The classic trick that makes BPE training tractable at
  corpus scale is to aggregate the corpus into a word→count vocabulary
  FIRST (the Zipf head collapses trillions of tokens into a vocab-sized
  table) and do all character work on the distinct vocabulary.
* ``repeated_ngram_spans`` — substring-level duplication audit in the
  spirit of Lee et al. 2022 ("Deduplicating Training Data Makes
  Language Models Better"): for every ``SPAN``-token window, does the
  identical span occur in ≥ 2 distinct documents?  Document-level
  near-dup (MinHash/SimHash in ``operators/dedup.py``) misses exactly
  this class — boilerplate paragraphs pasted into otherwise-unique
  documents — which is why the suffix-array pass exists in real
  pipelines.  Per-doc output: how much of the document is covered by
  cross-document duplicated spans.

Scale notes (100 TB):

* ``bpe_merge_topk`` never shuffles corpus-sized data by character:
  shuffle 1 is the word-count aggregation (map-side partial agg
  absorbs the Zipf head — the hottest words compress best), and every
  downstream row count is bounded by |vocab| × word length, not corpus
  tokens.  Real BPE training iterates; each further merge round is the
  same vocab-sized job with the learned pair collapsed, so round cost
  is independent of corpus size — the iteration harness is the same
  static-unroll pattern as ``pagerank_click_graph``.
* ``repeated_ngram_spans`` is LINEAR, unlike pair-producing near-dup
  joins: spans are aggregated to (span-hash → distinct-doc count) and
  joined back, so a span shared by 10^6 documents contributes 10^6
  rows (its instances), never 10^12 pairs.  Span strings are collapsed
  to 60-bit md5-prefix integers before the shuffle so the exchanged
  bytes are fixed-width regardless of ``SPAN``.
* Both oracle SQLs replicate the hashing and the arithmetic exactly
  (portable md5-prefix integers, integer counts, ``pround`` fractions)
  so the driver gate hash-checks them end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table, spread_scan
from projet_meteo_etl_spark.functions.portable import pround, pround_sql

_WS = r"\s+"

#: top-k merge candidates reported (one BPE training round would merge
#: rank 1 and recount; k>1 shows the frontier).
BPE_TOP_K = 25

#: span width (tokens) for the cross-document duplication audit.  Lee
#: et al. use 50 BPE tokens ≈ 8-12 words; 8 words keeps the sf0.01
#: fixture non-trivial (~4.5% of spans are cross-doc duplicated).
SPAN = 8


def bpe_merge_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``BPE_TOP_K`` adjacent character pairs by corpus frequency —
    the first BPE merge decision.

    ``n_occurrences`` = Σ over vocabulary words of (occurrences of the
    pair inside the word) × (corpus count of the word); ``n_words`` =
    distinct vocabulary words containing the pair (a pair occurring
    twice in one word contributes 1).  Overlapping occurrences count
    per starting position, the standard BPE convention before merges
    exist.
    """
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        spread_scan(d.select("text"))
        .select(F.explode(F.split(F.trim("text"), _WS)).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = vocab.select(
        "word",
        "wc",
        F.explode(F.sequence(F.lit(1), F.length("word") - 1)).alias("i"),
    ).select(F.expr("substring(word, i, 2)").alias("pair"), "wc", "word")
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("wc").cast("long").alias("n_occurrences"),
            F.count_distinct("word").cast("long").alias("n_words"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(BPE_TOP_K)
    )


BPE_MERGE_SQL = rf"""
WITH words AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
  FROM documents
),
vocab AS (
  SELECT word, count(*) AS wc FROM words
  WHERE length(word) >= 2 GROUP BY 1
),
pairs AS (
  SELECT unnest(list_transform(range(1, length(word)),
                               i -> substr(word, CAST(i AS INT), 2))) AS pair,
         wc, word
  FROM vocab
)
SELECT pair,
       CAST(sum(wc) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT word) AS BIGINT) AS n_words
FROM pairs
GROUP BY pair
ORDER BY n_occurrences DESC, pair
LIMIT {BPE_TOP_K}
"""


def repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-corpus span-duplication profile.

    A *span* is ``SPAN`` consecutive whitespace tokens.  A span is
    *duplicated* when the identical token sequence occurs in at least
    2 distinct documents.  Reports, per document: total span positions,
    positions whose span is cross-doc duplicated, and the duplicated
    fraction — the signal a substring-dedup trim pass acts on.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.repartition("doc_id").select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), _WS)).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    lead_cols = [F.lead("tok", i).over(w).alias(f"t{i}") for i in range(1, SPAN)]
    grams = (
        toks.select("doc_id", "tok", *lead_cols)
        .filter(F.col(f"t{SPAN - 1}").isNotNull())
        .select(
            "doc_id",
            # fixed-width 60-bit key instead of the span string: the
            # gram shuffle and the join back move 8 bytes per span
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ", "tok", *[f"t{i}" for i in range(1, SPAN)]
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("g"),
        )
        # consumed twice (doc-frequency build + instance join): persist
        # the reduced (doc_id, hash) form so tokenize+window runs once
        .persist()
    )
    docfreq = grams.groupBy("g").agg(
        F.count_distinct("doc_id").alias("nd")
    )
    per_doc = (
        grams.join(docfreq, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("dup_spans"),
        )
    )
    from projet_meteo_etl_spark.cachescope import scoped_cache

    out = (
        d.select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_spans", F.lit(0)).cast("long").alias("dup_spans"),
            pround(
                F.when(F.coalesce("n_spans", F.lit(0)) == 0, 0.0).otherwise(
                    F.col("dup_spans") / F.col("n_spans")
                ),
                6,
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )
    return scoped_cache(out, grams)


_SPAN_CONCAT = " || ' ' || ".join(
    ["tok"] + [f"t{i}" for i in range(1, SPAN)]
)
_SPAN_LEADS = ",\n         ".join(
    f"lead(tok, {i}) OVER w AS t{i}" for i in range(1, SPAN)
)

REPEATED_SPANS_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
         generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) AS pos
  FROM documents
),
g AS (
  SELECT doc_id, tok,
         {_SPAN_LEADS}
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
spans AS (
  SELECT doc_id,
         ('0x' || substr(md5({_SPAN_CONCAT}), 1, 15))::BIGINT AS gh
  FROM g WHERE t{SPAN - 1} IS NOT NULL
),
df AS (
  SELECT gh, count(DISTINCT doc_id) AS nd FROM spans GROUP BY 1
),
per_doc AS (
  SELECT s.doc_id,
         count(*) AS n_spans,
         sum(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS dup_spans
  FROM spans s JOIN df ON s.gh = df.gh
  GROUP BY 1
)
SELECT d.doc_id, d.source,
       CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(p.dup_spans, 0) AS BIGINT) AS dup_spans,
       {pround_sql("CASE WHEN coalesce(p.n_spans, 0) = 0 THEN 0.0 ELSE p.dup_spans * 1.0 / p.n_spans END", 6)} AS dup_frac
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
ORDER BY d.doc_id
"""


#: unrolled BPE training rounds (each = the same vocab-sized job, so
#: the static unroll mirrors a production trainer's loop body)
BPE_ROUNDS = 3


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE training, first ``BPE_ROUNDS`` merges (Sennrich et al.
    2016): count adjacent symbol pairs over the word vocabulary, merge
    the top pair greedily left-to-right in every word, recount, repeat.
    Output: one row per round — the learned merge and its weighted
    occurrence count at decision time.

    What makes this genuinely the *trainer* (vs ``bpe_merge_topk``'s
    single frequency count): the greedy non-overlapping merge
    application.  "aaaa" under merge (a,a) must become (aa)(aa), not
    three overlapping pairs — resolved relationally with gaps-and-
    islands: consecutive pair-matches form an island, and alternate
    members (even offset from the island head) are merged.  Every
    window runs over the same (word → pos) partitioning, so one round =
    one vocab-keyed window chain + one pair-count aggregation; the pair
    table is 1 row, broadcast back.

    Scale: all per-round work is on the VOCABULARY (word, count)
    relation — corpus size only enters through the initial word count
    (same Zipf-collapsing aggregation as ``bpe_merge_topk``).  The
    per-round segmentations are persisted so round N+1 and the final
    report reuse round N instead of replaying its lineage.
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.trim("text"), _WS)).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    seg = vocab.select(
        "word",
        "wc",
        F.posexplode(F.split("word", "")).alias("p0", "sym"),
    ).select("word", "wc", (F.col("p0") + 1).alias("pos"), "sym")

    w = Window.partitionBy("word").orderBy("pos")
    cached = []
    tops = []
    for r in range(1, BPE_ROUNDS + 1):
        seg = seg.persist()
        cached.append(seg)
        pairs = seg.select(
            "word", "wc", "pos", "sym", F.lead("sym").over(w).alias("nxt")
        )
        top = (
            pairs.filter(F.col("nxt").isNotNull())
            .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
            .agg(F.sum("wc").cast("long").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
        )
        tops.append(
            top.select(
                F.lit(r).alias("round"),
                F.concat_ws("+", "a", "b").alias("merge_pair"),
                F.col("n").alias("n_occurrences"),
            )
        )
        m = pairs.crossJoin(F.broadcast(top)).withColumn(
            "is_m", (F.col("sym") == F.col("a")) & (F.col("nxt") == F.col("b"))
        )
        # island head positions → running max = my island's head; merge
        # the members at even offsets from the head (greedy L-to-R)
        m = (
            m.withColumn(
                "ns",
                F.when(
                    F.col("is_m")
                    & ~F.coalesce(F.lag("is_m").over(w), F.lit(False)),
                    F.col("pos"),
                ),
            )
            .withColumn(
                "head",
                F.max("ns").over(w.rowsBetween(Window.unboundedPreceding, 0)),
            )
            .withColumn(
                "sel",
                F.col("is_m") & ((F.col("pos") - F.col("head")) % 2 == 0),
            )
        )
        new_sym = (
            F.when(F.col("sel"), F.concat("sym", "nxt"))
            .when(
                F.coalesce(F.lag("sel").over(w), F.lit(False)), F.lit(None)
            )
            .otherwise(F.col("sym"))
        )
        seg = (
            m.withColumn("sym2", new_sym)
            .filter(F.col("sym2").isNotNull())
            .select(
                "word",
                "wc",
                F.row_number().over(w).alias("pos"),
                F.col("sym2").alias("sym"),
            )
        )
    out = tops[0]
    for t in tops[1:]:
        out = out.unionByName(t)
    return scoped_cache(out.orderBy("round"), *cached)


def _bpe_round_sql(prev: str, r: int) -> str:
    return f"""
pairs{r} AS (
  SELECT word, wc, pos, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
  FROM {prev}
),
top{r} AS (
  SELECT sym AS a, nxt AS b, CAST(sum(wc) AS BIGINT) AS n
  FROM pairs{r} WHERE nxt IS NOT NULL
  GROUP BY 1, 2 ORDER BY n DESC, a, b LIMIT 1
),
m{r} AS (
  SELECT p.word, p.wc, p.pos, p.sym, p.nxt,
         (p.sym = t.a AND p.nxt = t.b) AS is_m
  FROM pairs{r} p CROSS JOIN top{r} t
),
g{r} AS (
  SELECT *, CASE WHEN is_m AND NOT coalesce(lag(is_m) OVER w, false)
                 THEN pos END AS ns
  FROM m{r} WINDOW w AS (PARTITION BY word ORDER BY pos)
),
s{r} AS (
  SELECT *, max(ns) OVER (PARTITION BY word ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS head
  FROM g{r}
),
sel{r} AS (
  SELECT *, (is_m AND (pos - head) % 2 = 0) AS sel
  FROM s{r}
),
ns{r} AS (
  SELECT word, wc, pos,
         CASE WHEN sel THEN sym || nxt
              WHEN coalesce(lag(sel) OVER w, false) THEN NULL
              ELSE sym END AS sym2
  FROM sel{r} WINDOW w AS (PARTITION BY word ORDER BY pos)
),
seg{r} AS (
  SELECT word, wc,
         row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
         sym2 AS sym
  FROM ns{r} WHERE sym2 IS NOT NULL
)"""


BPE_TRAIN_SQL = (
    r"""
WITH words AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
  FROM documents
),
vocab AS (
  SELECT word, count(*) AS wc FROM words WHERE length(word) >= 1 GROUP BY 1
),
seg0 AS (
  SELECT word, wc, i AS pos, substr(word, CAST(i AS INT), 1) AS sym
  FROM vocab,
       LATERAL (SELECT unnest(generate_series(1, length(word))) AS i)
),
"""
    + ",\n".join(_bpe_round_sql(f"seg{r - 1}", r) for r in range(1, BPE_ROUNDS + 1))
    + "\n"
    + "\nUNION ALL ".join(
        f"SELECT {r} AS round, a || '+' || b AS merge_pair, n AS n_occurrences FROM top{r}"
        for r in range(1, BPE_ROUNDS + 1)
    )
    + "\nORDER BY round"
)


#: Lee et al. 2022 trim threshold: spans of ≥ LEE_T tokens occurring
#: twice anywhere in the corpus are dedup-trimmed.  Factored as
#: LEE_BLOCK·LEE_BLOCKS so the window hash is built hierarchically.
LEE_BLOCK = 5
LEE_BLOCKS = 10
LEE_T = LEE_BLOCK * LEE_BLOCKS


def exact_substring_trim_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup, Lee et al. 2022 style: the per-document
    TRIM REPORT for "remove every substring of ≥ ``LEE_T`` (=50)
    tokens that occurs at least twice in the corpus".

    A position is trimmable iff some duplicated ≥50-token span covers
    it, iff some duplicated exact 50-token *window* covers it (a longer
    duplicated span contains a duplicated 50-window over every interior
    position; a duplicated 50-window IS such a span) — so exact
    fixed-width windows give exact coverage, and the maximal trim spans
    are the interval union of the duplicated windows (gaps-and-islands,
    break when the next duplicated start exceeds the previous by more
    than 50).  Reported per doc: token count, window/duplicated-window
    counts, number of maximal trim spans, tokens covered, the longest
    trim span, and the trimmed ppm.  Duplication counts ANY second
    occurrence (same doc included), the Lee et al. criterion —
    ``repeated_ngram_spans`` is the cross-doc-only sibling at width
    ``SPAN``.

    **Hierarchical window hash** (the scale trick): hashing 50 tokens
    per position via 49 ``lead``s costs O(n·50) state and compute.
    Instead level 1 hashes ``LEE_BLOCK`` =5 tokens (4 leads); level 2
    hashes the 10 level-1 values at offsets 0,5,…,45 (9 leads) — an
    exact function of the full 50-token window at O(n·15), one
    doc-partitioned sort shared by every window stage.  Spans are
    bucketed by 60-bit md5-prefix keys (fixed-width shuffle rows, the
    ``repeated_ngram_spans`` discipline) and "extended" only through
    the integer gaps-and-islands merge — never a doc-pair join: a
    boilerplate block shared by 10⁶ docs contributes 10⁶ window rows,
    never 10¹² pairs.

    Scale: tokenize (one shuffle to doc partitioning) → two window
    passes on the same partitioning → hash aggregate on the window key
    → equi-join back → per-doc rollup.  All integer arithmetic;
    trim_ppm DECIMAL-widened (a 10M-token doc would overflow a long at
    ×1e6).
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    d = load_table(spark, sf_dir, "documents")
    toks = d.repartition("doc_id").select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), _WS)).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    lead_toks = [
        F.lead("tok", i).over(w).alias(f"t{i}") for i in range(1, LEE_BLOCK)
    ]
    blk = toks.select("doc_id", "pos", "tok", *lead_toks).select(
        "doc_id",
        "pos",
        F.when(
            F.col(f"t{LEE_BLOCK - 1}").isNotNull(),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ",
                            "tok",
                            *[f"t{i}" for i in range(1, LEE_BLOCK)],
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
        ).alias("b"),
    )
    lead_blks = [
        F.lead("b", i * LEE_BLOCK).over(w).alias(f"b{i}")
        for i in range(1, LEE_BLOCKS)
    ]
    wins = (
        blk.select("doc_id", "pos", "b", *lead_blks)
        .filter(
            F.col("b").isNotNull()
            & F.col(f"b{LEE_BLOCKS - 1}").isNotNull()
        )
        .select(
            "doc_id",
            "pos",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ",
                            "b",
                            *[f"b{i}" for i in range(1, LEE_BLOCKS)],
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
        .persist()
    )
    occ2 = wins.groupBy("h").agg(F.count(F.lit(1)).alias("occ")).filter(
        F.col("occ") >= 2
    )
    dup = wins.join(occ2.select("h"), "h").select("doc_id", "pos")
    brk = dup.select(
        "doc_id",
        "pos",
        F.when(
            F.col("pos") - F.lag("pos").over(w) > LEE_T, 1
        )
        .otherwise(F.when(F.lag("pos").over(w).isNull(), 1).otherwise(0))
        .alias("brk"),
    )
    isl = brk.withColumn(
        "grp",
        F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = isl.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("s"), F.max("pos").alias("e")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trim_spans"),
        F.sum(F.col("e") - F.col("s") + LEE_T)
        .cast("long")
        .alias("covered_tokens"),
        F.max(F.col("e") - F.col("s") + LEE_T)
        .cast("long")
        .alias("longest_span_tokens"),
    )
    nwin = wins.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows")
    )
    ndup = dup.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dup_windows")
    )
    out = (
        d.select(
            "doc_id",
            "source",
            F.size(F.split(F.trim("text"), _WS))
            .cast("long")
            .alias("n_tokens"),
        )
        .join(nwin, "doc_id", "left")
        .join(ndup, "doc_id", "left")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
            F.coalesce("n_trim_spans", F.lit(0)).alias("n_trim_spans"),
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            F.coalesce("longest_span_tokens", F.lit(0)).alias(
                "longest_span_tokens"
            ),
            F.expr(
                "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) ELSE"
                " CAST(CAST(coalesce(covered_tokens, 0) AS DECIMAL(38,0))"
                " * 1000000 DIV n_tokens AS BIGINT) END"
            ).alias("trim_ppm"),
        )
        .orderBy("doc_id")
    )
    return scoped_cache(out, wins)


_B_CAT = " || ' ' || ".join(
    ["tok"] + [f"lead(tok, {i}) OVER w" for i in range(1, LEE_BLOCK)]
)
_H_CAT = " || ' ' || ".join(
    ["CAST(b AS VARCHAR)"]
    + [
        f"CAST(lead(b, {i * LEE_BLOCK}) OVER w AS VARCHAR)"
        for i in range(1, LEE_BLOCKS)
    ]
)

EXACT_TRIM_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
         generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1)
           AS pos
  FROM documents
),
blk AS (
  SELECT doc_id, pos,
         CASE WHEN lead(tok, {LEE_BLOCK - 1}) OVER w IS NOT NULL THEN
           ('0x' || substr(md5({_B_CAT}), 1, 15))::BIGINT
         END AS b
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
wins AS (
  SELECT doc_id, pos, h FROM (
    SELECT doc_id, pos,
           CASE WHEN b IS NOT NULL
                 AND lead(b, {(LEE_BLOCKS - 1) * LEE_BLOCK}) OVER w
                     IS NOT NULL THEN
             ('0x' || substr(md5({_H_CAT}), 1, 15))::BIGINT
           END AS h
    FROM blk WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE h IS NOT NULL
),
occ2 AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
dup AS (SELECT w.doc_id, w.pos FROM wins w JOIN occ2 USING (h)),
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos - prev > {LEE_T}
              THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM (SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM dup)
),
spans AS (
  SELECT doc_id, grp, min(pos) AS s, max(pos) AS e
  FROM isl GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id,
         count(*) AS n_trim_spans,
         sum(e - s + {LEE_T}) AS covered_tokens,
         max(e - s + {LEE_T}) AS longest_span_tokens
  FROM spans GROUP BY 1
),
nwin AS (SELECT doc_id, count(*) AS n_windows FROM wins GROUP BY 1),
ndup AS (SELECT doc_id, count(*) AS dup_windows FROM dup GROUP BY 1)
SELECT d.doc_id, d.source,
       CAST(len(regexp_split_to_array(trim(d.text), '\s+')) AS BIGINT)
         AS n_tokens,
       CAST(coalesce(nwin.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(ndup.dup_windows, 0) AS BIGINT) AS dup_windows,
       CAST(coalesce(p.n_trim_spans, 0) AS BIGINT) AS n_trim_spans,
       CAST(coalesce(p.covered_tokens, 0) AS BIGINT) AS covered_tokens,
       CAST(coalesce(p.longest_span_tokens, 0) AS BIGINT)
         AS longest_span_tokens,
       CASE WHEN len(regexp_split_to_array(trim(d.text), '\s+')) = 0
            THEN CAST(0 AS BIGINT)
            ELSE CAST(CAST(coalesce(p.covered_tokens, 0) AS HUGEINT)
                      * 1000000
                      // len(regexp_split_to_array(trim(d.text), '\s+'))
                   AS BIGINT) END AS trim_ppm
FROM documents d
LEFT JOIN nwin ON nwin.doc_id = d.doc_id
LEFT JOIN ndup ON ndup.doc_id = d.doc_id
LEFT JOIN per_doc p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
"""


#: WordPiece-style piece inventory: the top-K multi-char substrings by
#: corpus-weighted occurrence, plus EVERY corpus character (so greedy
#: segmentation never needs an UNK branch)
WP_MIN_LEN = 2
WP_MAX_LEN = 6
WP_VOCAB_K = 24


def wordpiece_greedy_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale tokenizer INFERENCE, WordPiece-style: build a piece
    inventory (top-``WP_VOCAB_K`` substrings of length 2–6 by
    corpus-weighted occurrence + all corpus characters), then segment
    the vocabulary by greedy longest-match-first — the deterministic
    algorithm BERT-family tokenizers run at serving time — and report
    per-piece usage: words using it, corpus-weighted total uses, and
    the usage share.  Complements ``bpe_merge_topk``/
    ``bpe_train_merges`` (tokenizer TRAINING) with the inference pass a
    pipeline runs over every shard once a vocabulary is frozen.

    Exactness: greedy longest-match is uniquely determined position by
    position (two matching pieces of equal length are the same
    string), so the segmentation — unlike Viterbi with float scores —
    is engine-exact by construction; the inventory cut is pinned by
    (count DESC, piece ASC).  The DuckDB oracle replays the greedy
    walk as a recursive CTE whose longest-match step is an anti-join
    (no aggregate in the recursive term), one row per (word,
    position).

    Scale (the BPE discipline): the corpus collapses to the word→count
    vocabulary first — the only corpus-sized pass is that one
    aggregation; candidate generation, the inventory cut, and the
    greedy walk are all vocabulary-sized.  The segmentation kernel is
    a self-contained ``mapInPandas`` whose closure carries the
    inventory (k-bounded driver collect, the codebook precedent).
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    d = load_table(spark, sf_dir, "documents")
    vocab = (
        spread_scan(d.select("text"))
        .select(F.explode(F.split(F.trim("text"), _WS)).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .persist()
    )
    cands = None
    for ln in range(WP_MIN_LEN, WP_MAX_LEN + 1):
        c = vocab.filter(F.length("word") >= ln).select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(word) - {ln} + 1),"
                    f" i -> substring(word, i, {ln}))"
                )
            ).alias("piece"),
            "wc",
        )
        cands = c if cands is None else cands.unionByName(c)
    top = (
        cands.groupBy("piece")
        .agg(F.sum("wc").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(WP_VOCAB_K)
        .select("piece")
    )
    chars = (
        vocab.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, length(word)),"
                    " i -> substring(word, i, 1))"
                )
            ).alias("piece")
        )
        .distinct()
    )
    inv = sorted(
        r["piece"] for r in top.unionByName(chars).collect()
    )  # k-bounded (WP_VOCAB_K + |alphabet|)
    pset = frozenset(inv)
    maxlen = max(len(p) for p in inv)

    def segment(batches):
        import pandas as pd

        for pdf in batches:
            words, wcs, pcs, occs = [], [], [], []
            for word, wc in zip(pdf["word"], pdf["wc"]):
                i, counts = 0, {}
                n = len(word)
                while i < n:
                    for ln in range(min(maxlen, n - i), 0, -1):
                        p = word[i : i + ln]
                        if p in pset:
                            counts[p] = counts.get(p, 0) + 1
                            i += ln
                            break
                    else:  # unreachable: every char is in the inventory
                        counts[word[i]] = counts.get(word[i], 0) + 1
                        i += 1
                for p, c in counts.items():
                    words.append(word)
                    wcs.append(int(wc))
                    pcs.append(p)
                    occs.append(c)
            yield pd.DataFrame(
                {"word": words, "wc": wcs, "piece": pcs, "occ": occs}
            )

    usage = vocab.mapInPandas(
        segment, "word string, wc long, piece string, occ long"
    )
    per_piece = usage.groupBy("piece").agg(
        F.count(F.lit(1)).cast("long").alias("n_words"),
        F.sum(F.col("wc") * F.col("occ")).cast("long").alias("total_uses"),
    )
    tot = per_piece.agg(F.sum("total_uses").alias("all_uses"))
    out = (
        per_piece.crossJoin(F.broadcast(tot))
        .select(
            "piece",
            F.length("piece").cast("long").alias("piece_len"),
            "n_words",
            "total_uses",
            F.expr(
                "CAST(CAST(total_uses AS DECIMAL(38,0)) * 1000000"
                " DIV all_uses AS BIGINT)"
            ).alias("share_ppm"),
        )
        .orderBy(F.desc("total_uses"), F.asc("piece"))
    )
    return scoped_cache(out, vocab)


_WP_LENS = ", ".join(
    f"({ln})" for ln in range(WP_MIN_LEN, WP_MAX_LEN + 1)
)

WORDPIECE_SQL = rf"""
WITH RECURSIVE
vocab AS (
  SELECT word, count(*) AS wc
  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
        FROM documents)
  WHERE length(word) >= 1 GROUP BY 1
),
cand AS (
  SELECT piece, CAST(sum(wc) AS BIGINT) AS cnt
  FROM (
    SELECT v.wc,
           unnest(list_transform(
             range(1, length(v.word) - ls.L + 2),
             i -> substr(v.word, CAST(i AS INT), ls.L))) AS piece
    FROM vocab v, (VALUES {_WP_LENS}) ls(L)
    WHERE length(v.word) >= ls.L
  )
  GROUP BY 1
),
topk AS (
  SELECT piece FROM cand ORDER BY cnt DESC, piece LIMIT {WP_VOCAB_K}
),
chars AS (
  SELECT DISTINCT unnest(list_transform(
           range(1, length(word) + 1),
           i -> substr(word, CAST(i AS INT), 1))) AS piece
  FROM vocab
),
pieces AS (SELECT piece FROM topk UNION ALL SELECT piece FROM chars),
seg AS (
  SELECT word, 0 AS pos, CAST(NULL AS VARCHAR) AS piece
  FROM vocab
  UNION ALL
  SELECT s.word, s.pos + length(m.piece), m.piece
  FROM seg s
  JOIN pieces m
    ON substr(s.word, s.pos + 1, length(m.piece)) = m.piece
  LEFT JOIN pieces m2
    ON substr(s.word, s.pos + 1, length(m2.piece)) = m2.piece
   AND length(m2.piece) > length(m.piece)
  WHERE s.pos < length(s.word) AND m2.piece IS NULL
),
usage AS (
  SELECT word, piece, count(*) AS occ
  FROM seg WHERE piece IS NOT NULL GROUP BY 1, 2
),
per_piece AS (
  SELECT u.piece,
         CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(u.occ * v.wc) AS BIGINT) AS total_uses
  FROM usage u JOIN vocab v ON u.word = v.word
  GROUP BY 1
),
tot AS (SELECT sum(total_uses) AS all_uses FROM per_piece)
SELECT p.piece,
       CAST(length(p.piece) AS BIGINT) AS piece_len,
       p.n_words,
       p.total_uses,
       CAST(CAST(p.total_uses AS HUGEINT) * 1000000 // t.all_uses
         AS BIGINT) AS share_ppm
FROM per_piece p CROSS JOIN tot t
ORDER BY p.total_uses DESC, p.piece
"""




# ------------------------- unigram-LM (SentencePiece-style) EM round

#: unigram-LM inventory sizing: seed pieces are every corpus substring
#: of length 1..UNI_MAX_LEN; the top UNI_VOCAB_K multi-char pieces (by
#: corpus-weighted occurrence) plus the full alphabet form the model.
UNI_MAX_LEN = 6
UNI_MIN_LEN = 2
UNI_VOCAB_K = 24
#: M-step pruning: keep the UNI_KEEP_K best multi-char pieces by
#: Viterbi expected count (chars are never pruned — the model must
#: always be able to segment every string), the SentencePiece
#: shrink-per-round discipline.
UNI_KEEP_K = 16
#: integer log-prob fixed point (milli-nats), the
#: ``transition_entropy_rate`` / ``fs_linkage`` floor-log discipline.
UNI_LOG_SCALE = 1000
#: long tokens are pre-split into fixed blocks before the lattice —
#: bounds the oracle's path enumeration (compositions of 12 with parts
#: <= 6) and is the public max-piece-length normalization step.
UNI_BLOCK = 12


def unigram_lm_em_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One unigram-LM (SentencePiece-style) EM + pruning round — the
    third public tokenizer-training algorithm next to BPE training
    (``bpe_train_merges``) and WordPiece inference
    (``wordpiece_greedy_segment``).

    The round, exactly as published (Kudo 2018), hard-EM variant:

    1. **Seed**: piece inventory = top-``UNI_VOCAB_K`` multi-char
       substrings (length 2..6, corpus-weighted occurrence) + the full
       alphabet; seed probability ∝ occurrence count.
    2. **E-step**: segment the corpus under the current model.  We run
       the *Viterbi* (hard) E-step — the max-probability segmentation
       per word — because it is expressible in exact integer
       arithmetic: piece cost = ``floor(1000·ln(1e6)) −
       floor(1000·ln(seed_ppm))`` milli-nats (integer-valued DOUBLE
       into a correctly-floored ln, the ``transition_entropy_rate``
       discipline), ties broken by the lexicographically smallest
       piece-path (separator ``chr(31)`` sorts below every printable
       char, so more-segmented-earlier wins deterministically in BOTH
       engines — UTF-8 memcmp and Python code-point order agree).
       Soft-EM's lattice posteriors are float-only and engine-divergent
       by construction; the hard variant is the standard integer-exact
       counterpart.
    3. **M-step**: re-estimate piece weights from Viterbi counts
       (``em_weight_ppm``) and prune: drop multi-char pieces ranked
       below ``UNI_KEEP_K`` by expected count (chars never pruned).

    Scale (the BPE/WordPiece discipline): the only corpus-sized pass is
    the word→count vocabulary aggregate; everything downstream —
    candidate generation, the inventory cut, block splitting, the
    Viterbi kernel — is vocabulary-sized (Heaps' law: sublinear in
    corpus).  The kernel is a self-contained ``mapInPandas`` whose
    closure carries the (UNI_VOCAB_K + |alphabet|)-bounded costed
    inventory; the DP is O(len·UNI_MAX_LEN) per distinct block.  Words
    are pre-split into ``UNI_BLOCK``-char blocks and deduped, so the
    oracle's recursive-CTE path enumeration is bounded by compositions
    of 12 with parts ≤ 6 per distinct block.
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    d = load_table(spark, sf_dir, "documents")
    vocab = (
        spread_scan(d.select("text"))
        .select(F.explode(F.split(F.trim("text"), _WS)).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .persist()
    )
    cands = None
    for ln in range(1, UNI_MAX_LEN + 1):
        c = vocab.filter(F.length("word") >= ln).select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(word) - {ln} + 1),"
                    f" i -> substring(word, i, {ln}))"
                )
            ).alias("piece"),
            "wc",
        )
        cands = c if cands is None else cands.unionByName(c)
    # the seed table is consumed FOUR times (multi + chars, then inv0
    # again under stot and inv) — without a persist the whole
    # union-of-substring-explodes + groupBy chain re-runs for each,
    # which at 32 tasks/stage is pure scheduling latency on an
    # inventory-sized relation (r13 phase decomposition: the seed/inv
    # phase was 3.7 s of the 5.4 s wall)
    seed_all = cands.groupBy("piece").agg(
        F.sum("wc").cast("long").alias("seed_cnt")
    ).persist()
    multi = (
        seed_all.filter(F.length("piece") >= UNI_MIN_LEN)
        .orderBy(F.desc("seed_cnt"), F.asc("piece"))
        .limit(UNI_VOCAB_K)
    )
    chars = seed_all.filter(F.length("piece") == 1)
    inv0 = multi.unionByName(chars)
    stot = inv0.agg(
        # DECIMAL: corpus-total substring occurrences pass 9.2e18 chars
        # at 100 TB (the shard_assignment_audit precedent)
        F.sum(F.col("seed_cnt").cast("decimal(38,0)")).alias("seed_tot")
    )
    ln_e6 = f"CAST(floor({UNI_LOG_SCALE}.0 * ln(1000000.0)) AS BIGINT)"
    inv = (
        inv0.crossJoin(F.broadcast(stot))
        .select(
            "piece",
            "seed_cnt",
            F.expr(
                f"{ln_e6} - CAST(floor({UNI_LOG_SCALE}.0 * ln(CAST("
                "greatest(CAST(CAST(seed_cnt AS DECIMAL(38,0)) * 1000000"
                " DIV seed_tot AS BIGINT), 1) AS DOUBLE)))"
                " AS BIGINT)"
            ).alias("cost_mnat"),
        )
        .persist()
    )
    # k-bounded driver collect (UNI_VOCAB_K + |alphabet|), the
    # wordpiece_greedy_segment / codebook precedent
    costed = sorted(
        (r["piece"], int(r["cost_mnat"])) for r in inv.collect()
    )
    blocks = (
        vocab.select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, CAST((length(word) - 1)"
                    f" DIV {UNI_BLOCK} AS INT)),"
                    f" i -> substring(word, i * {UNI_BLOCK} + 1,"
                    f" {UNI_BLOCK}))"
                )
            ).alias("b"),
            "wc",
        )
        .groupBy("b")
        .agg(F.sum("wc").cast("long").alias("bwc"))
    )

    def segment(batches):
        # self-contained closure: only `costed` (a plain list) rides in
        import pandas as pd

        pc = dict(costed)
        ml = max(len(p) for p in pc)
        sep = "\x1f"
        for pdf in batches:
            rb, rw, rp, ro = [], [], [], []
            for b, bwc in zip(pdf["b"], pdf["bwc"]):
                n = len(b)
                # backward Viterbi: best[i] = (cost, path) over b[i:],
                # min by (cost, path) — suffix-optimal substructure
                # holds because the prefix piece is fixed per candidate
                best = [None] * (n + 1)
                best[n] = (0, "")
                for i in range(n - 1, -1, -1):
                    cand = None
                    for l in range(1, min(ml, n - i) + 1):
                        c = pc.get(b[i : i + l])
                        if c is None or best[i + l] is None:
                            continue
                        key = (
                            c + best[i + l][0],
                            sep + b[i : i + l] + best[i + l][1],
                        )
                        if cand is None or key < cand:
                            cand = key
                    best[i] = cand
                counts = {}
                for p in best[0][1].split(sep)[1:]:
                    counts[p] = counts.get(p, 0) + 1
                for p, c in counts.items():
                    rb.append(b)
                    rw.append(int(bwc))
                    rp.append(p)
                    ro.append(c)
            yield pd.DataFrame(
                {"b": rb, "bwc": rw, "piece": rp, "occ": ro}
            )

    usage = blocks.mapInPandas(
        segment, "b string, bwc long, piece string, occ long"
    )
    per_piece = usage.groupBy("piece").agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum(F.col("bwc") * F.col("occ")).cast("long").alias(
            "viterbi_uses"
        ),
    )
    tot = per_piece.agg(
        F.sum("viterbi_uses").cast("long").alias("all_uses")
    )
    scored = (
        inv.join(per_piece, "piece", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "piece",
            F.length("piece").cast("long").alias("piece_len"),
            (F.length("piece") == 1).cast("int").alias("is_char"),
            "seed_cnt",
            F.col("cost_mnat").alias("seed_cost_mnat"),
            F.coalesce("n_blocks", F.lit(0)).cast("long").alias(
                "n_blocks"
            ),
            F.coalesce("viterbi_uses", F.lit(0)).cast("long").alias(
                "viterbi_uses"
            ),
            F.expr(
                "CAST(CAST(coalesce(viterbi_uses, 0) AS DECIMAL(38,0))"
                " * 1000000 DIV greatest(all_uses, 1) AS BIGINT)"
            ).alias("em_weight_ppm"),
        )
    )
    w = Window.partitionBy("is_char").orderBy(
        F.desc("viterbi_uses"), F.asc("piece")
    )
    out = (
        scored.withColumn(
            "keep_rank",
            F.when(F.col("is_char") == 1, F.lit(0))
            .otherwise(F.row_number().over(w))
            .cast("long"),
        )
        .withColumn(
            "pruned",
            (
                (F.col("is_char") == 0)
                & (F.col("keep_rank") > UNI_KEEP_K)
            ).cast("int"),
        )
        .orderBy(F.desc("viterbi_uses"), F.asc("piece"))
    )
    return scoped_cache(out, vocab, inv, seed_all)


_UNI_LENS = ", ".join(f"({ln})" for ln in range(1, UNI_MAX_LEN + 1))

UNIGRAM_SQL = rf"""
WITH RECURSIVE
vocab AS (
  SELECT word, count(*) AS wc
  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
        FROM documents)
  WHERE length(word) >= 1 GROUP BY 1
),
cand AS (
  SELECT piece, CAST(sum(wc) AS BIGINT) AS seed_cnt
  FROM (
    SELECT v.wc,
           unnest(list_transform(
             range(1, length(v.word) - ls.L + 2),
             i -> substr(v.word, CAST(i AS INT), ls.L))) AS piece
    FROM vocab v, (VALUES {_UNI_LENS}) ls(L)
    WHERE length(v.word) >= ls.L
  )
  GROUP BY 1
),
multi AS (
  SELECT piece, seed_cnt FROM cand WHERE length(piece) >= {UNI_MIN_LEN}
  ORDER BY seed_cnt DESC, piece LIMIT {UNI_VOCAB_K}
),
inv0 AS (
  SELECT piece, seed_cnt FROM multi
  UNION ALL
  SELECT piece, seed_cnt FROM cand WHERE length(piece) = 1
),
stot AS (SELECT sum(seed_cnt::HUGEINT) AS seed_tot FROM inv0),
inv AS (
  SELECT piece, seed_cnt,
         CAST(floor({UNI_LOG_SCALE}.0 * ln(1000000.0)) AS BIGINT)
           - CAST(floor({UNI_LOG_SCALE}.0 * ln(CAST(greatest(
               CAST(seed_cnt::HUGEINT * 1000000 // t.seed_tot AS BIGINT),
               1) AS DOUBLE))) AS BIGINT) AS cost_mnat
  FROM inv0, stot t
),
blocks AS (
  SELECT b, CAST(sum(wc) AS BIGINT) AS bwc FROM (
    SELECT v.wc,
           unnest(list_transform(
             range(0, (length(v.word) - 1) // {UNI_BLOCK} + 1),
             i -> substr(v.word, CAST(i * {UNI_BLOCK} + 1 AS INT),
                         {UNI_BLOCK}))) AS b
    FROM vocab v
  ) GROUP BY 1
),
seg AS (
  SELECT b AS w, 0 AS pos, CAST(0 AS BIGINT) AS cost,
         CAST('' AS VARCHAR) AS path
  FROM blocks
  UNION ALL
  SELECT s.w, s.pos + length(p.piece), s.cost + p.cost_mnat,
         s.path || chr(31) || p.piece
  FROM seg s
  JOIN inv p ON substr(s.w, s.pos + 1, length(p.piece)) = p.piece
  WHERE s.pos < length(s.w)
),
best AS (
  SELECT w, path FROM (
    SELECT w, path,
           row_number() OVER (PARTITION BY w ORDER BY cost, path) AS rn
    FROM seg WHERE pos = length(w)
  ) WHERE rn = 1
),
usage AS (
  SELECT w, piece, count(*) AS occ FROM (
    SELECT w, unnest(string_split(path, chr(31))) AS piece FROM best
  ) WHERE piece <> '' GROUP BY 1, 2
),
per_piece AS (
  SELECT u.piece, CAST(count(*) AS BIGINT) AS n_blocks,
         CAST(sum(u.occ * b.bwc) AS BIGINT) AS viterbi_uses
  FROM usage u JOIN blocks b ON u.w = b.b GROUP BY 1
),
tot AS (SELECT CAST(sum(viterbi_uses) AS BIGINT) AS all_uses
        FROM per_piece),
scored AS (
  SELECT i.piece,
         CAST(length(i.piece) AS BIGINT) AS piece_len,
         CAST(CASE WHEN length(i.piece) = 1 THEN 1 ELSE 0 END
           AS INTEGER) AS is_char,
         i.seed_cnt,
         i.cost_mnat AS seed_cost_mnat,
         CAST(coalesce(p.n_blocks, 0) AS BIGINT) AS n_blocks,
         CAST(coalesce(p.viterbi_uses, 0) AS BIGINT) AS viterbi_uses,
         CAST(coalesce(p.viterbi_uses, 0)::HUGEINT * 1000000
              // greatest(t.all_uses, 1) AS BIGINT) AS em_weight_ppm
  FROM inv i LEFT JOIN per_piece p ON i.piece = p.piece
  CROSS JOIN tot t
),
ranked AS (
  SELECT *,
         CAST(CASE WHEN is_char = 1 THEN 0 ELSE
           row_number() OVER (PARTITION BY is_char
                              ORDER BY viterbi_uses DESC, piece)
         END AS BIGINT) AS keep_rank
  FROM scored
)
SELECT piece, piece_len, is_char, seed_cnt, seed_cost_mnat, n_blocks,
       viterbi_uses, em_weight_ppm, keep_rank,
       CAST(CASE WHEN is_char = 0 AND keep_rank > {UNI_KEEP_K}
            THEN 1 ELSE 0 END AS INTEGER) AS pruned
FROM ranked
ORDER BY viterbi_uses DESC, piece
"""


def unigram_lm_prune_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The unigram-LM loop CLOSED (round-11 verdict item 5): seed →
    E-step → **actual prune** → re-cost from EM weights → second
    E-step under the shrunk model — i.e. one full
    SentencePiece-style prune iteration (Kudo 2018 §3.2), where
    :func:`unigram_lm_em_step` stops at *marking* prune candidates.

    Round 2's piece costs come from round 1's Viterbi usage ppm (not
    seed counts): ``cost2 = floor(1000·ln 1e6) − floor(1000·ln
    max(em_ppm, 1))`` — the same integer-exact milli-nat discipline.
    Chars are never pruned (any block stays segmentable), multi-char
    pieces below rank ``UNI_KEEP_K`` by round-1 uses are REMOVED, so
    round 2's Viterbi redistributes their mass to surviving pieces —
    the redistribution is what this query verifies (a piece absorbed
    by a pruned neighbor gains uses_r2 > uses_r1).

    Scale: identical profile to the sibling — one corpus-sized word
    count, then every stage (two k-bounded inventory collects, two
    vocabulary-sized Viterbi kernels) is Heaps-sublinear; the second
    round adds a constant factor, not a new corpus pass.

    The seed/blocks construction deliberately DUPLICATES the verified
    sibling's first stage instead of extracting shared helpers: a
    refactor of ``unigram_lm_em_step`` would consume a redraw-manifest
    slot for zero behavior change (registry.py redraw discipline).
    """
    from projet_meteo_etl_spark.cachescope import scoped_cache

    d = load_table(spark, sf_dir, "documents")
    # deliberately NOT spread_scan'd: this query runs ~2× more
    # vocabulary-sized stages over the persisted vocab than its
    # em_step sibling, and widening the cached vocab to default
    # parallelism costs more in per-stage task overhead than the
    # one-time tokenize parallelization buys (A/B measured 3.80 s vs
    # 4.64 s isolated min at matched regime, OPTIMIZATION_r12.md)
    vocab = (
        d.select(F.explode(F.split(F.trim("text"), _WS)).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
        .persist()
    )
    cands = None
    for ln in range(1, UNI_MAX_LEN + 1):
        c = vocab.filter(F.length("word") >= ln).select(
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(word) - {ln} + 1),"
                    f" i -> substring(word, i, {ln}))"
                )
            ).alias("piece"),
            "wc",
        )
        cands = c if cands is None else cands.unionByName(c)
    # the seed table is consumed FOUR times (multi + chars, then inv0
    # again under stot and inv) — without a persist the whole
    # union-of-substring-explodes + groupBy chain re-runs for each,
    # which at 32 tasks/stage is pure scheduling latency on an
    # inventory-sized relation (r13 phase decomposition: the seed/inv
    # phase was 3.7 s of the 5.4 s wall)
    seed_all = cands.groupBy("piece").agg(
        F.sum("wc").cast("long").alias("seed_cnt")
    ).persist()
    multi = (
        seed_all.filter(F.length("piece") >= UNI_MIN_LEN)
        .orderBy(F.desc("seed_cnt"), F.asc("piece"))
        .limit(UNI_VOCAB_K)
    )
    chars = seed_all.filter(F.length("piece") == 1)
    inv0 = multi.unionByName(chars)
    stot = inv0.agg(
        F.sum(F.col("seed_cnt").cast("decimal(38,0)")).alias("seed_tot")
    )
    ln_e6 = f"CAST(floor({UNI_LOG_SCALE}.0 * ln(1000000.0)) AS BIGINT)"
    inv = (
        inv0.crossJoin(F.broadcast(stot))
        .select(
            "piece",
            F.expr(
                f"{ln_e6} - CAST(floor({UNI_LOG_SCALE}.0 * ln(CAST("
                "greatest(CAST(CAST(seed_cnt AS DECIMAL(38,0)) * 1000000"
                " DIV seed_tot AS BIGINT), 1) AS DOUBLE)))"
                " AS BIGINT)"
            ).alias("cost_mnat"),
        )
        .persist()
    )
    blocks = (
        vocab.select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, CAST((length(word) - 1)"
                    f" DIV {UNI_BLOCK} AS INT)),"
                    f" i -> substring(word, i * {UNI_BLOCK} + 1,"
                    f" {UNI_BLOCK}))"
                )
            ).alias("b"),
            "wc",
        )
        .groupBy("b")
        .agg(F.sum("wc").cast("long").alias("bwc"))
        .persist()
    )

    def _viterbi_usage(costed):
        """mapInPandas Viterbi pass under a fixed costed inventory —
        the kernel closure carries only ``costed`` (plain list) and is
        self-contained (foreign-cwd worker discipline)."""

        def segment(batches):
            import pandas as pd

            pc = dict(costed)
            ml = max(len(p) for p in pc)
            sep = "\x1f"
            for pdf in batches:
                rb, rw, rp, ro = [], [], [], []
                for b, bwc in zip(pdf["b"], pdf["bwc"]):
                    n = len(b)
                    best = [None] * (n + 1)
                    best[n] = (0, "")
                    for i in range(n - 1, -1, -1):
                        cand = None
                        for l in range(1, min(ml, n - i) + 1):
                            c = pc.get(b[i : i + l])
                            if c is None or best[i + l] is None:
                                continue
                            key = (
                                c + best[i + l][0],
                                sep + b[i : i + l] + best[i + l][1],
                            )
                            if cand is None or key < cand:
                                cand = key
                        best[i] = cand
                    counts = {}
                    for p in best[0][1].split(sep)[1:]:
                        counts[p] = counts.get(p, 0) + 1
                    for p, c in counts.items():
                        rb.append(b)
                        rw.append(int(bwc))
                        rp.append(p)
                        ro.append(c)
                yield pd.DataFrame(
                    {"b": rb, "bwc": rw, "piece": rp, "occ": ro}
                )

        return blocks.mapInPandas(
            segment, "b string, bwc long, piece string, occ long"
        ).groupBy("piece").agg(
            F.sum(F.col("bwc") * F.col("occ")).cast("long").alias("uses")
        )

    # ---- round 1: E-step under seed costs (k-bounded collect)
    costed1 = sorted((r["piece"], int(r["cost_mnat"])) for r in inv.collect())
    per1 = _viterbi_usage(costed1).persist()
    # ---- prune + re-cost on the driver (inventory-sized, k-bounded):
    # ppm over ROUND-1 total uses; kept = chars + top-K multi by
    # (uses desc, piece asc)
    uses1 = {r["piece"]: int(r["uses"]) for r in per1.collect()}
    all1 = sum(uses1.values())
    pieces1 = [p for p, _ in costed1]
    multi_ranked = sorted(
        (p for p in pieces1 if len(p) > 1),
        key=lambda p: (-uses1.get(p, 0), p),
    )
    kept = {p for p in pieces1 if len(p) == 1} | set(
        multi_ranked[:UNI_KEEP_K]
    )
    import math as _math

    lnc = int(_math.floor(UNI_LOG_SCALE * _math.log(1e6)))
    costed2 = sorted(
        (
            p,
            lnc
            - int(
                _math.floor(
                    UNI_LOG_SCALE
                    * _math.log(
                        max(uses1.get(p, 0) * 1_000_000 // max(all1, 1), 1)
                    )
                )
            ),
        )
        for p in kept
    )
    # ---- round 2: E-step under the pruned, re-costed model
    per2 = _viterbi_usage(costed2)
    tot2 = per2.agg(F.sum("uses").cast("long").alias("all2"))
    cost2_df = spark.createDataFrame(
        costed2, "piece string, cost2_mnat long"
    )
    out = (
        F.broadcast(cost2_df)
        .join(per1.withColumnRenamed("uses", "uses_r1"), "piece", "left")
        .join(per2.withColumnRenamed("uses", "uses_r2"), "piece", "left")
        .crossJoin(F.broadcast(tot2))
        .select(
            "piece",
            F.length("piece").cast("long").alias("piece_len"),
            (F.length("piece") == 1).cast("int").alias("is_char"),
            F.coalesce("uses_r1", F.lit(0)).cast("long").alias("uses_r1"),
            "cost2_mnat",
            F.coalesce("uses_r2", F.lit(0)).cast("long").alias("uses_r2"),
            F.expr(
                "CAST(CAST(coalesce(uses_r2, 0) AS DECIMAL(38,0))"
                " * 1000000 DIV greatest(all2, 1) AS BIGINT)"
            ).alias("em2_ppm"),
        )
        .orderBy(F.desc("uses_r2"), F.asc("piece"))
    )
    return scoped_cache(out, vocab, inv, blocks, per1, seed_all)


UNIGRAM_PRUNE_SQL = rf"""
WITH RECURSIVE
vocab AS (
  SELECT word, count(*) AS wc
  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS word
        FROM documents)
  WHERE length(word) >= 1 GROUP BY 1
),
cand AS (
  SELECT piece, CAST(sum(wc) AS BIGINT) AS seed_cnt
  FROM (
    SELECT v.wc,
           unnest(list_transform(
             range(1, length(v.word) - ls.L + 2),
             i -> substr(v.word, CAST(i AS INT), ls.L))) AS piece
    FROM vocab v, (VALUES {_UNI_LENS}) ls(L)
    WHERE length(v.word) >= ls.L
  )
  GROUP BY 1
),
multi AS (
  SELECT piece, seed_cnt FROM cand WHERE length(piece) >= {UNI_MIN_LEN}
  ORDER BY seed_cnt DESC, piece LIMIT {UNI_VOCAB_K}
),
inv0 AS (
  SELECT piece, seed_cnt FROM multi
  UNION ALL
  SELECT piece, seed_cnt FROM cand WHERE length(piece) = 1
),
stot AS (SELECT sum(seed_cnt::HUGEINT) AS seed_tot FROM inv0),
inv AS (
  SELECT piece,
         CAST(floor({UNI_LOG_SCALE}.0 * ln(1000000.0)) AS BIGINT)
           - CAST(floor({UNI_LOG_SCALE}.0 * ln(CAST(greatest(
               CAST(seed_cnt::HUGEINT * 1000000 // t.seed_tot AS BIGINT),
               1) AS DOUBLE))) AS BIGINT) AS cost_mnat
  FROM inv0, stot t
),
blocks AS (
  SELECT b, CAST(sum(wc) AS BIGINT) AS bwc FROM (
    SELECT v.wc,
           unnest(list_transform(
             range(0, (length(v.word) - 1) // {UNI_BLOCK} + 1),
             i -> substr(v.word, CAST(i * {UNI_BLOCK} + 1 AS INT),
                         {UNI_BLOCK}))) AS b
    FROM vocab v
  ) GROUP BY 1
),
seg1 AS (
  SELECT b AS w, 0 AS pos, CAST(0 AS BIGINT) AS cost,
         CAST('' AS VARCHAR) AS path
  FROM blocks
  UNION ALL
  SELECT s.w, s.pos + length(p.piece), s.cost + p.cost_mnat,
         s.path || chr(31) || p.piece
  FROM seg1 s
  JOIN inv p ON substr(s.w, s.pos + 1, length(p.piece)) = p.piece
  WHERE s.pos < length(s.w)
),
best1 AS (
  SELECT w, path FROM (
    SELECT w, path,
           row_number() OVER (PARTITION BY w ORDER BY cost, path) AS rn
    FROM seg1 WHERE pos = length(w)
  ) WHERE rn = 1
),
per1 AS (
  SELECT piece, CAST(sum(occ * bwc) AS BIGINT) AS uses_r1 FROM (
    SELECT u.w, u.piece, count(*) AS occ, b.bwc
    FROM (SELECT w, unnest(string_split(path, chr(31))) AS piece
          FROM best1) u
    JOIN blocks b ON u.w = b.b
    WHERE u.piece <> ''
    GROUP BY u.w, u.piece, b.bwc
  ) GROUP BY 1
),
all1 AS (SELECT CAST(sum(uses_r1) AS BIGINT) AS t FROM per1),
kept AS (
  SELECT i.piece,
         CAST(coalesce(p.uses_r1, 0) AS BIGINT) AS uses_r1
  FROM inv i LEFT JOIN per1 p ON i.piece = p.piece
  WHERE length(i.piece) = 1
  UNION ALL
  SELECT piece, uses_r1 FROM (
    SELECT i.piece,
           CAST(coalesce(p.uses_r1, 0) AS BIGINT) AS uses_r1,
           row_number() OVER (ORDER BY coalesce(p.uses_r1, 0) DESC,
                              i.piece) AS rk
    FROM inv i LEFT JOIN per1 p ON i.piece = p.piece
    WHERE length(i.piece) > 1
  ) WHERE rk <= {UNI_KEEP_K}
),
inv2 AS (
  SELECT k.piece, k.uses_r1,
         CAST(floor({UNI_LOG_SCALE}.0 * ln(1000000.0)) AS BIGINT)
           - CAST(floor({UNI_LOG_SCALE}.0 * ln(CAST(greatest(
               CAST(k.uses_r1::HUGEINT * 1000000
                    // greatest(a.t, 1) AS BIGINT),
               1) AS DOUBLE))) AS BIGINT) AS cost2_mnat
  FROM kept k, all1 a
),
seg2 AS (
  SELECT b AS w, 0 AS pos, CAST(0 AS BIGINT) AS cost,
         CAST('' AS VARCHAR) AS path
  FROM blocks
  UNION ALL
  SELECT s.w, s.pos + length(p.piece), s.cost + p.cost2_mnat,
         s.path || chr(31) || p.piece
  FROM seg2 s
  JOIN inv2 p ON substr(s.w, s.pos + 1, length(p.piece)) = p.piece
  WHERE s.pos < length(s.w)
),
best2 AS (
  SELECT w, path FROM (
    SELECT w, path,
           row_number() OVER (PARTITION BY w ORDER BY cost, path) AS rn
    FROM seg2 WHERE pos = length(w)
  ) WHERE rn = 1
),
per2 AS (
  SELECT piece, CAST(sum(occ * bwc) AS BIGINT) AS uses_r2 FROM (
    SELECT u.w, u.piece, count(*) AS occ, b.bwc
    FROM (SELECT w, unnest(string_split(path, chr(31))) AS piece
          FROM best2) u
    JOIN blocks b ON u.w = b.b
    WHERE u.piece <> ''
    GROUP BY u.w, u.piece, b.bwc
  ) GROUP BY 1
),
all2 AS (SELECT CAST(sum(uses_r2) AS BIGINT) AS t FROM per2)
SELECT i.piece,
       CAST(length(i.piece) AS BIGINT) AS piece_len,
       CAST(CASE WHEN length(i.piece) = 1 THEN 1 ELSE 0 END AS INTEGER)
         AS is_char,
       i.uses_r1,
       i.cost2_mnat,
       CAST(coalesce(p.uses_r2, 0) AS BIGINT) AS uses_r2,
       CAST(coalesce(p.uses_r2, 0)::HUGEINT * 1000000
            // greatest(a.t, 1) AS BIGINT) AS em2_ppm
FROM inv2 i LEFT JOIN per2 p ON i.piece = p.piece
CROSS JOIN all2 a
ORDER BY coalesce(p.uses_r2, 0) DESC, i.piece
"""


from projet_meteo_etl_spark.operators.dedup import (  # noqa: E402
    INC_BATCH_MOD,  # the shared batch/corpus split convention
)

#: hash-prefix partition buckets of the persisted span-hash index —
#: the (band_idx, key_pfx) analogue for exact-substring dedup; raised
#: with the corpus in a deployment so pruned reads stay
#: batch-proportional
INC_SPAN_BUCKETS = 64


def dedup_substring_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact-substring dedup — the third dedup family's
    incremental sibling (round-11 verdict item 6, completing the
    ``dedup_minhash_incremental`` / ``dedup_embedding_incremental``
    trio): window-hash the NEW BATCH only and probe a PERSISTED
    span-hash index of the corpus, emitting Lee-et-al. trim spans for
    batch docs without ever re-windowing the corpus.

    Index build (ingest-amortized, the established contract): the
    corpus' DISTINCT 50-token hierarchical window hashes
    (:func:`exact_substring_trim_spans`'s O(n·15) two-level
    construction) written to parquet partitioned by ``pmod(h,
    INC_SPAN_BUCKETS)`` — membership is all the probe needs, so the
    index is |distinct windows| rows, positions stay out of it.

    Probe phase (reads ONLY the stored index + the batch): a batch
    position is trimmable iff its window occurs in the corpus index
    (total occurrences ≥ 2 via the corpus) OR at least twice within
    the batch itself — together exactly Lee et al.'s ≥2-occurrences
    criterion for batch docs against corpus∪batch.  The index scan is
    partition-pruned to the batch's bucket list (k-bounded ≤
    ``INC_SPAN_BUCKETS`` driver collect); the within-batch side is a
    batch-local hash aggregate.  Per batch the cost is O(batch tokens
    + probed buckets) — never a corpus pass.  Gaps-and-islands merge
    and the per-doc rollup are the sibling's exact arithmetic.

    The window construction deliberately duplicates the verified
    sibling's stage (the ``unigram_lm_prune_round`` redraw-budget
    note applies).
    """
    import os

    from projet_meteo_etl_spark.cachescope import scoped_cache
    from projet_meteo_etl_spark.sources.sinks import staging_root

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % INC_BATCH_MOD != 0)
    batch = d.filter(F.col("doc_id") % INC_BATCH_MOD == 0)
    w = Window.partitionBy("doc_id").orderBy("pos")

    def window_hashes(docs: DataFrame) -> DataFrame:
        toks = docs.repartition("doc_id").select(
            "doc_id",
            F.posexplode(F.split(F.trim("text"), _WS)).alias("pos", "tok"),
        )
        lead_toks = [
            F.lead("tok", i).over(w).alias(f"t{i}")
            for i in range(1, LEE_BLOCK)
        ]
        blk = toks.select("doc_id", "pos", "tok", *lead_toks).select(
            "doc_id",
            "pos",
            F.when(
                F.col(f"t{LEE_BLOCK - 1}").isNotNull(),
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                " ",
                                "tok",
                                *[f"t{i}" for i in range(1, LEE_BLOCK)],
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                ).cast("long"),
            ).alias("b"),
        )
        lead_blks = [
            F.lead("b", i * LEE_BLOCK).over(w).alias(f"b{i}")
            for i in range(1, LEE_BLOCKS)
        ]
        return (
            blk.select("doc_id", "pos", "b", *lead_blks)
            .filter(
                F.col("b").isNotNull()
                & F.col(f"b{LEE_BLOCKS - 1}").isNotNull()
            )
            .select(
                "doc_id",
                "pos",
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                " ",
                                "b",
                                *[f"b{i}" for i in range(1, LEE_BLOCKS)],
                            )
                        ),
                        1,
                        15,
                    ),
                    16,
                    10,
                )
                .cast("long")
                .alias("h"),
            )
        )

    # ---- index build (ingest-time work; see docstring)
    root = os.path.join(staging_root(sf_dir), "span_index")
    window_hashes(corpus).select(
        "h", F.pmod(F.col("h"), F.lit(INC_SPAN_BUCKETS)).alias("h_bkt")
    ).distinct().repartition("h_bkt").write.partitionBy("h_bkt").mode(
        "overwrite"
    ).parquet(os.path.join(root, "spans"))

    # ---- probe phase: stored index + the new batch only
    b_wins = window_hashes(batch).persist()
    probed = sorted(
        r["b"]
        for r in b_wins.select(
            F.pmod(F.col("h"), F.lit(INC_SPAN_BUCKETS)).alias("b")
        )
        .distinct()
        .collect()
    )  # k-bounded (≤ INC_SPAN_BUCKETS): partition-pruned index read
    # explicit schema: a corpus with no ≥LEE_T-token doc writes an
    # EMPTY index (no part-files, no partition dirs) and schema
    # inference would fail — found by the adversarial degenerate
    # fixture (round 12), the _run_to_files zero-emission precedent
    idx = spark.read.schema("h long, h_bkt long").parquet(
        os.path.join(root, "spans")
    ).filter(F.col("h_bkt").isin(probed))
    in_corpus = b_wins.join(idx.select("h"), "h", "left_semi")
    twice_in_batch = b_wins.join(
        b_wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .select("h"),
        "h",
        "left_semi",
    )
    dup = (
        in_corpus.select("doc_id", "pos")
        .unionByName(twice_in_batch.select("doc_id", "pos"))
        .distinct()
    )
    brk = dup.select(
        "doc_id",
        "pos",
        F.when(F.col("pos") - F.lag("pos").over(w) > LEE_T, 1)
        .otherwise(F.when(F.lag("pos").over(w).isNull(), 1).otherwise(0))
        .alias("brk"),
    )
    isl = brk.withColumn(
        "grp",
        F.sum("brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    spans = isl.groupBy("doc_id", "grp").agg(
        F.min("pos").alias("s"), F.max("pos").alias("e")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trim_spans"),
        F.sum(F.col("e") - F.col("s") + LEE_T)
        .cast("long")
        .alias("covered_tokens"),
        F.max(F.col("e") - F.col("s") + LEE_T)
        .cast("long")
        .alias("longest_span_tokens"),
    )
    nwin = b_wins.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_windows")
    )
    ndup = dup.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dup_windows")
    )
    out = (
        batch.select(
            "doc_id",
            "source",
            F.size(F.split(F.trim("text"), _WS))
            .cast("long")
            .alias("n_tokens"),
        )
        .join(nwin, "doc_id", "left")
        .join(ndup, "doc_id", "left")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
            F.coalesce("n_trim_spans", F.lit(0)).alias("n_trim_spans"),
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
            F.coalesce("longest_span_tokens", F.lit(0)).alias(
                "longest_span_tokens"
            ),
            F.expr(
                "CASE WHEN n_tokens = 0 THEN CAST(0 AS BIGINT) ELSE"
                " CAST(CAST(coalesce(covered_tokens, 0) AS DECIMAL(38,0))"
                " * 1000000 DIV n_tokens AS BIGINT) END"
            ).alias("trim_ppm"),
        )
        .orderBy("doc_id")
    )
    return scoped_cache(out, b_wins)


SUBSTRING_INCREMENTAL_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
         generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1)
           AS pos
  FROM documents
),
blk AS (
  SELECT doc_id, pos,
         CASE WHEN lead(tok, {LEE_BLOCK - 1}) OVER w IS NOT NULL THEN
           ('0x' || substr(md5({_B_CAT}), 1, 15))::BIGINT
         END AS b
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
wins AS (
  SELECT doc_id, pos, h FROM (
    SELECT doc_id, pos,
           CASE WHEN b IS NOT NULL
                 AND lead(b, {(LEE_BLOCKS - 1) * LEE_BLOCK}) OVER w
                     IS NOT NULL THEN
             ('0x' || substr(md5({_H_CAT}), 1, 15))::BIGINT
           END AS h
    FROM blk WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE h IS NOT NULL
),
bwins AS (SELECT doc_id, pos, h FROM wins WHERE doc_id % {INC_BATCH_MOD} = 0),
corpus_h AS (SELECT DISTINCT h FROM wins WHERE doc_id % {INC_BATCH_MOD} <> 0),
batch2 AS (SELECT h FROM bwins GROUP BY h HAVING count(*) >= 2),
dup AS (
  SELECT DISTINCT w.doc_id, w.pos FROM bwins w
  WHERE w.h IN (SELECT h FROM corpus_h)
     OR w.h IN (SELECT h FROM batch2)
),
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos - prev > {LEE_T}
              THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM (SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM dup)
),
spans AS (
  SELECT doc_id, grp, min(pos) AS s, max(pos) AS e
  FROM isl GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id,
         count(*) AS n_trim_spans,
         sum(e - s + {LEE_T}) AS covered_tokens,
         max(e - s + {LEE_T}) AS longest_span_tokens
  FROM spans GROUP BY 1
),
nwin AS (SELECT doc_id, count(*) AS n_windows FROM bwins GROUP BY 1),
ndup AS (SELECT doc_id, count(*) AS dup_windows FROM dup GROUP BY 1)
SELECT d.doc_id, d.source,
       CAST(len(regexp_split_to_array(trim(d.text), '\s+')) AS BIGINT)
         AS n_tokens,
       CAST(coalesce(nwin.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(ndup.dup_windows, 0) AS BIGINT) AS dup_windows,
       CAST(coalesce(p.n_trim_spans, 0) AS BIGINT) AS n_trim_spans,
       CAST(coalesce(p.covered_tokens, 0) AS BIGINT) AS covered_tokens,
       CAST(coalesce(p.longest_span_tokens, 0) AS BIGINT)
         AS longest_span_tokens,
       CASE WHEN len(regexp_split_to_array(trim(d.text), '\s+')) = 0
            THEN CAST(0 AS BIGINT)
            ELSE CAST(CAST(coalesce(p.covered_tokens, 0) AS HUGEINT)
                      * 1000000
                      // len(regexp_split_to_array(trim(d.text), '\s+'))
                   AS BIGINT) END AS trim_ppm
FROM documents d
LEFT JOIN nwin ON nwin.doc_id = d.doc_id
LEFT JOIN ndup ON ndup.doc_id = d.doc_id
LEFT JOIN per_doc p ON p.doc_id = d.doc_id
WHERE d.doc_id % {INC_BATCH_MOD} = 0
ORDER BY d.doc_id
"""


SPARK_QUERIES = {
    "bpe_merge_topk": bpe_merge_topk,
    "bpe_train_merges": bpe_train_merges,
    "repeated_ngram_spans": repeated_ngram_spans,
    "exact_substring_trim_spans": exact_substring_trim_spans,
    "wordpiece_greedy_segment": wordpiece_greedy_segment,
    "unigram_lm_em_step": unigram_lm_em_step,
    "unigram_lm_prune_round": unigram_lm_prune_round,
    "dedup_substring_incremental": dedup_substring_incremental,
}

ORACLE_SQL = {
    "bpe_merge_topk": BPE_MERGE_SQL,
    "bpe_train_merges": BPE_TRAIN_SQL,
    "repeated_ngram_spans": REPEATED_SPANS_SQL,
    "exact_substring_trim_spans": EXACT_TRIM_SQL,
    "wordpiece_greedy_segment": WORDPIECE_SQL,
    "unigram_lm_em_step": UNIGRAM_SQL,
    "unigram_lm_prune_round": UNIGRAM_PRUNE_SQL,
    "dedup_substring_incremental": SUBSTRING_INCREMENTAL_SQL,
}
