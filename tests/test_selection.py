"""Corpus selection/audit operator invariants (operators/selection.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.operators.selection import (
    POLICY_TERMS,
    cross_source_overlap,
    dedup_retention_policy,
    policy_blocklist_audit,
    prefix_dup_groups,
    vocab_kl_by_source,
)

SF = "/root/testdata/sf0.01"


def test_policy_audit_counts_consistent(spark):
    """Flag counts bounded by doc counts; term hits ≥ flagged docs;
    a doc containing a blocklist term is definitely flagged."""
    out = policy_blocklist_audit(spark, SF).collect()
    assert out, "at least one source"
    total_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in out) == total_docs
    for r in out:
        assert 0 <= r["n_flagged"] <= r["n_docs"]
        assert r["n_term_hits"] >= r["n_flagged"]
        assert 0.0 <= r["flag_rate"] <= 1.0
    # ground truth on one term: every doc containing ' slow ' as a word
    d = load_table(spark, SF, "documents")
    direct = d.filter(
        F.col("text").rlike(r"\b" + POLICY_TERMS[0] + r"\b")
    ).count()
    assert direct <= sum(r["n_flagged"] for r in out)


def test_prefix_dup_groups_structure(spark):
    """Every reported group has ≥2 members and exactly one retained
    canonical, which is the minimum doc_id of the group."""
    out = prefix_dup_groups(spark, SF)
    rows = out.collect()
    if not rows:  # corpus may have no prefix collisions at tiny SF
        return
    by_size = {}
    for r in rows:
        assert r["group_size"] >= 2
        by_size.setdefault((r["group_size"], r["doc_id"]), r)
    # group membership counts must reconcile: per group_size g, the
    # number of member rows is a multiple of g
    from collections import Counter

    sizes = Counter(r["group_size"] for r in rows)
    for g, n in sizes.items():
        assert n % g == 0
    # integer accounting: every group contributes exactly one retained
    # member — group the member rows by (group_size) multiset instead
    # of summing floats (1/3 ulps would flake on non-power-of-two sizes)
    retained = sum(r["retained"] for r in rows)
    n_groups = sum(n // g for g, n in sizes.items())
    assert retained == n_groups


def test_cross_source_overlap_bounds(spark):
    """Shared fingerprints never exceed either side's distinct count;
    jaccard in [0, 1]; pair ordering is strict."""
    for r in cross_source_overlap(spark, SF).collect():
        assert r["source_a"] < r["source_b"]
        assert r["shared_fp"] <= min(r["n_fp_a"], r["n_fp_b"])
        assert 0.0 <= r["jaccard"] <= 1.0


def test_vocab_kl_nonnegative_and_total(spark):
    """KL ≥ 0 (up to quantization slack) per source, token totals
    reconcile with a direct count."""
    out = vocab_kl_by_source(spark, SF).collect()
    d = load_table(spark, SF, "documents")
    n_toks = (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
        .filter(F.length("t") > 0)
        .count()
    )
    assert sum(r["n_tokens"] for r in out) == n_toks
    for r in out:
        # each of ≤512 bucket terms floors by <1 micronat
        assert r["kl_micronats"] >= -512


def test_retention_policy_reconciles_with_prefix_clusters(spark):
    """retained-per-source sums to the corpus distinct-prefix count,
    and every group drops group_size−1 docs."""
    from projet_meteo_etl_spark.operators.selection import PREFIX_CHARS

    out = dedup_retention_policy(spark, SF).collect()
    d = load_table(spark, SF, "documents")
    n_docs = d.count()
    n_distinct = (
        d.select(F.substring(F.lower(F.trim("text")), 1, PREFIX_CHARS))
        .distinct()
        .count()
    )
    assert sum(r["n_docs"] for r in out) == n_docs
    assert sum(r["n_retained"] for r in out) == n_distinct
    assert sum(r["n_dropped"] for r in out) == n_docs - n_distinct
    for r in out:
        assert r["n_retained"] + r["n_dropped"] == r["n_docs"]
        assert r["chars_dropped"] >= 0


def test_corpus_report_card_reconciles(spark):
    """Rates bounded, doc counts sum to the corpus, ft keep rate
    reconciles with the underlying classifier output."""
    from projet_meteo_etl_spark.operators.importance import (
        fasttext_quality_score,
    )
    from projet_meteo_etl_spark.operators.selection import corpus_report_card

    rows = corpus_report_card(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert len(rows) == docs.select("source").distinct().count()
    for r in rows:
        for c in ("ft_keep_rate", "rep_keep_rate", "langid_match_rate"):
            assert 0.0 <= r[c] <= 1.0
        assert -1.0 <= r["mean_ft_score"] <= 1.0
    ft = fasttext_quality_score(spark, SF).collect()
    n_keep = sum(r["keep"] for r in ft)
    import math

    overall = sum(r["n_docs"] * r["ft_keep_rate"] for r in rows)
    # per-source rates are pround-6; allow rounding slack of 1e-6*n
    assert abs(overall - n_keep) <= len(ft) * 1e-5 + 1e-6


def test_quality_score_calibration_structure(spark):
    """Deciles partition the corpus evenly (±1), scores are monotone
    non-decreasing across deciles, rates bounded."""
    from projet_meteo_etl_spark.operators.selection import (
        CALIB_BUCKETS,
        quality_score_calibration,
    )

    rows = quality_score_calibration(spark, SF).collect()
    assert [r["decile"] for r in rows] == list(range(1, CALIB_BUCKETS + 1))
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    scores = [r["mean_score"] for r in rows]
    assert scores == sorted(scores)
    assert all(0.0 <= r["rep_keep_rate"] <= 1.0 for r in rows)


def test_calibration_ece_matches_curve_replay(spark):
    """ECE/MCE must equal the exact-integer recomputation from the
    decile sums the calibration machinery produces."""
    from projet_meteo_etl_spark.operators.selection import (
        _calibration_bucketed,
        calibration_ece_summary,
    )

    sf = "/root/testdata/sf0.001"
    bucketed, scored = _calibration_bucketed(spark, sf)
    per = (
        bucketed.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_b"),
            F.sum("rep_keep").alias("keep_b"),
            F.sum("score_sum_milli").alias("score_b"),
            F.sum("n_features").alias("feat_b"),
            F.max("n").alias("n"),
        )
        .collect()
    )
    scored.unpersist()
    n = per[0]["n"]
    contribs, gaps = [], []
    for r in per:
        conf = min(max(r["score_b"], 0), r["feat_b"] * 1000)
        gap = abs(r["keep_b"] * 1000 * r["feat_b"] - conf * r["n_b"])
        if r["feat_b"] > 0:
            contribs.append(gap * 1_000_000 // (r["feat_b"] * 1000))
            gaps.append(gap * 1_000_000 // (r["feat_b"] * 1000 * r["n_b"]))
        else:
            contribs.append(0)
            gaps.append(0)
    got = calibration_ece_summary(spark, sf).collect()[0]
    assert got["n_docs"] == n
    assert got["n_buckets"] == len(per)
    assert got["ece_ppm"] == sum(contribs) // n
    assert got["mce_ppm"] == max(gaps)
    # sanity: MCE dominates ECE, both within [0, 1e6]
    assert 0 <= got["ece_ppm"] <= got["mce_ppm"] <= 1_000_000


def test_best_fit_packing_invariants(spark):
    """BFD invariants: every bin within budget, fill dominates the
    contiguous baseline's tail bins only through fragmentation (no
    bin overfull), per-shard doc conservation, and BFD beats or ties
    naive one-doc-per-bin on bin count."""
    from pyspark.sql import functions as F

    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.operators.text import ws_token_count
    from projet_meteo_etl_spark.plans.curation import (
        BFP_BUDGET,
        best_fit_packing,
    )
    from tests.conftest import SF_SMOKE

    rows = best_fit_packing(spark, SF_SMOKE).collect()
    assert rows
    n_docs_packed = sum(r["n_docs"] for r in rows)
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert n_docs_packed == n_docs  # every doc packs (clamped)
    for r in rows:
        assert 0 < r["bin_tokens"] <= BFP_BUDGET
        assert r["waste_tokens"] == BFP_BUDGET - r["bin_tokens"]
        assert r["fill_ppm"] == r["bin_tokens"] * 1_000_000 // BFP_BUDGET
    # sanity: BFD uses no more bins than the token-sum lower bound x2
    # (BFD's classical guarantee is far tighter; this guards collapse)
    tok = (
        load_table(spark, SF_SMOKE, "documents")
        .select(F.least(ws_token_count(F.col("text")), F.lit(BFP_BUDGET)).alias("t"))
        .agg(F.sum("t"))
        .collect()[0][0]
    )
    lower = -(-tok // BFP_BUDGET)
    assert len(rows) <= 2 * lower + 2 * 5 * 4  # + one tail bin per (source, shard)
