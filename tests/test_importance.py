"""DSIR importance weighting + boilerplate filter + bloom audit invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_meteo_etl_spark.operators.importance import (
    SEG_MAX_DF,
    SEG_WIDTH,
    boilerplate_segment_filter,
    dsir_importance_weights,
)
from projet_meteo_etl_spark.operators.sketches import bloom_membership_audit

SF = "/root/testdata/sf0.01"


def test_dsir_targets_score_higher(spark):
    """The entire point of DSIR: target-domain (en) docs must average a
    higher importance weight than off-target docs, and weights must be
    finite integers over the full corpus."""
    from projet_meteo_etl_spark.catalog import load_table

    w = dsir_importance_weights(spark, SF)
    d = load_table(spark, SF, "documents").select("doc_id", "lang")
    j = w.join(d, "doc_id")
    rows = (
        j.groupBy(F.col("lang") == "en")
        .agg(F.avg("weight_micronats").alias("avg_w"))
        .collect()
    )
    by_target = {r[0]: r["avg_w"] for r in rows}
    assert by_target[True] > by_target[False]
    assert w.count() == d.count()
    # per-token weights bounded by the max |log ratio| ≈ ln of corpus size
    mx = w.agg(F.max(F.abs(F.col("weight_micronats") / F.col("n_tokens")))).collect()
    assert mx[0][0] < 20_000_000  # 20 nats/token is impossible


def test_boilerplate_planted_segments_flagged(spark, tmp_path):
    """A segment planted verbatim in many docs must push those docs'
    ratio up and drop them; unique docs keep."""
    boiler = " ".join(f"b{i}" for i in range(SEG_WIDTH))
    rows = []
    for i in range(SEG_MAX_DF + 8):  # > df cap ⇒ boilerplate
        rows.append((i, boiler))  # doc IS the boilerplate segment
    for i in range(100, 104):
        rows.append((i, " ".join(f"u{i}w{k}" for k in range(SEG_WIDTH))))
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in boilerplate_segment_filter(spark, str(tmp_path)).collect()}
    for i in range(SEG_MAX_DF + 8):
        assert out[i].keep == 0 and out[i].boiler_ratio == 1.0
    for i in range(100, 104):
        assert out[i].keep == 1 and out[i].n_boiler == 0


def test_bloom_no_false_negatives(spark):
    """One-sided error: every true member must be accepted (n_missed=0)
    and acceptances can only exceed true membership (false positives)."""
    r = bloom_membership_audit(spark, SF).collect()[0]
    assert r.n_missed == 0
    assert r.n_maybe >= r.n_true_present
    # with zero misses every true member is a maybe, so the rest are FPs
    assert r.n_false_pos == r.n_maybe - r.n_true_present
    assert 0 <= r.n_false_pos <= r.n_probe
