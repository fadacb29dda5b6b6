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


def test_rocchio_against_python_oracle(spark):
    """Centroid weights, midpoint threshold, and confusion counts must
    match a direct Python replay with trunc-toward-zero division."""
    import re
    from collections import defaultdict
    from hashlib import md5

    from projet_meteo_etl_spark.operators.importance import (
        PCT_BUCKETS,
        PCT_LABEL_MIN_TOKENS,
        rocchio_quality_classifier,
    )
    from tests.conftest import SF_SMOKE

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(
            f"{SF_SMOKE}/documents.parquet"
        ).collect()
    }
    feats, labels = {}, {}
    for did, t in docs.items():
        toks = re.split(r"\s+", t.strip())
        labels[did] = 1 if len(toks) >= PCT_LABEL_MIN_TOKENS else -1
        f = defaultdict(int)
        for tok in toks:
            b = int(md5(f"pb:{tok}".encode()).hexdigest()[:15], 16) % (
                PCT_BUCKETS
            )
            f[b] += 1
        feats[did] = f
    n_pos = sum(1 for y in labels.values() if y == 1)
    n_neg = len(labels) - n_pos
    sp, sn = defaultdict(int), defaultdict(int)
    for did, f in feats.items():
        tgt = sp if labels[did] == 1 else sn
        for b, c in f.items():
            tgt[b] += c
    w = {
        b: trunc_div(sp.get(b, 0) * 1000, n_pos)
        - trunc_div(sn.get(b, 0) * 1000, n_neg)
        for b in range(PCT_BUCKETS)
    }
    s = {
        did: sum(c * w[b] for b, c in f.items())
        for did, f in feats.items()
    }
    ms_pos = trunc_div(
        sum(s[d] for d in s if labels[d] == 1), n_pos
    )
    ms_neg = trunc_div(
        sum(s[d] for d in s if labels[d] == -1), n_neg
    )
    theta = trunc_div(ms_pos + ms_neg, 2)
    tp = sum(1 for d in s if labels[d] == 1 and s[d] > theta)
    fp = sum(1 for d in s if labels[d] == -1 and s[d] > theta)
    fn = n_pos - tp
    tn = n_neg - fp
    row = rocchio_quality_classifier(spark, SF_SMOKE).collect()[0]
    assert row["n_docs"] == len(docs)
    assert (row["n_pos"], row["n_neg"]) == (n_pos, n_neg)
    assert row["theta_milli"] == theta
    assert row["weight_l1_milli"] == sum(abs(v) for v in w.values())
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    assert row["acc_ppm"] == (tp + tn) * 1_000_000 // len(docs)
    # the pinned property: the trained model actually separates
    assert row["acc_ppm"] >= 900_000
