"""Gopher quality-rule audit: crafted-document rule semantics plus
corpus invariants."""

from __future__ import annotations

from projet_meteo_etl_spark.operators import text as tx

SF = "/root/testdata/sf0.001"


def test_gopher_rules_on_crafted_docs(spark):
    """One doc passing every rule, one failing word-count + stopwords,
    one failing bullet/ellipsis line rules — rule-by-rule assertions
    through the real query via a load_table override."""
    good = ("the cat and the dog have that with " + "word " * 50).strip()
    short = "zz qq"  # 2 words, no stop words
    bullets = "\n".join(["- item ..." for _ in range(10)])
    df = spark.createDataFrame(
        [(1, good, "a"), (2, short, "b"), (3, bullets, "c")],
        "doc_id long, text string, source string",
    )
    orig = tx.load_table
    try:
        tx.load_table = lambda s, d, n: df if n == "documents" else orig(s, d, n)
        rows = {r.source: r for r in tx.gopher_quality_rules(spark, "x").collect()}
    finally:
        tx.load_table = orig
    assert rows["a"].n_pass == 1 and rows["a"].pass_rate == 1.0
    b = rows["b"]
    assert b.v_word_count == 1 and b.v_stopwords == 1 and b.n_pass == 0
    c = rows["c"]
    assert c.v_bullet_lines == 1 and c.v_ellipsis_lines == 1 and c.n_pass == 0


def test_gopher_rules_corpus_invariants(spark):
    rows = tx.gopher_quality_rules(spark, SF).collect()
    assert len(rows) > 0
    viol_cols = [
        "v_word_count", "v_mean_word_len", "v_symbol_ratio",
        "v_bullet_lines", "v_ellipsis_lines", "v_alpha_words", "v_stopwords",
    ]
    for r in rows:
        for c in viol_cols:
            assert 0 <= r[c] <= r.n_docs
        assert 0 <= r.n_pass <= r.n_docs
        # a doc with ANY violation cannot pass
        assert r.n_pass <= r.n_docs - max(r[c] for c in viol_cols)
        assert abs(r.pass_rate - round(r.n_pass / r.n_docs, 4)) < 5e-5


def test_c4_line_filter_semantics(spark):
    """Terminal punctuation + >=3 words + no blocklist markers."""
    doc = "\n".join(
        [
            "This line survives the filter.",   # kept
            "short.",                            # <3 words
            "no terminal punctuation here",      # no punct
            "this has javascript in it.",        # blocklist
            "object { literal } brace here.",    # brace
        ]
    )
    df = spark.createDataFrame([(1, doc, "s")], "doc_id long, text string, source string")
    orig = tx.load_table
    try:
        tx.load_table = lambda s, d, n: df if n == "documents" else orig(s, d, n)
        r = tx.c4_line_filter(spark, "x").collect()[0]
    finally:
        tx.load_table = orig
    assert r.n_lines == 5 and r.n_kept == 1
    assert r.chars_kept == len("This line survives the filter.")
    assert r.line_retention == 0.2


def test_pii_pattern_audit_semantics(spark):
    doc = "mail a@b.io and c.d@e.org, call +1-555-123-4567, host 10.0.0.1, ssn 123-45-6789"
    df = spark.createDataFrame([(1, doc, "s")], "doc_id long, text string, source string")
    orig = tx.load_table
    try:
        tx.load_table = lambda s, d, n: df if n == "documents" else orig(s, d, n)
        r = tx.pii_pattern_audit(spark, "x").collect()[0]
    finally:
        tx.load_table = orig
    assert r.n_emails == 2 and r.docs_emails == 1
    assert r.n_phones >= 1 and r.docs_phones == 1
    assert r.n_ipv4s == 1 and r.n_ssn_like == 1
