"""Near-dup family cross-checks: approximate paths vs exact ground truth."""

from __future__ import annotations

from projet_meteo_etl_spark.operators import dedup

SF = "/root/testdata/sf0.01"


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_minhash_is_subset_of_exact_with_recall_on_strong_pairs(spark):
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(spark, SF).collect()
    }
    mh = _pairs(dedup.dedup_minhash_lsh(spark, SF))
    assert mh <= set(exact)
    # pairs with strong similarity must be recalled (LSH probability
    # at j≥0.5 with 8 bands × 4 rows is ≈1)
    strong = {k for k, j in exact.items() if j >= 0.5}
    if strong:
        assert strong <= mh


def test_simhash_pairs_symmetric_free_and_bounded(spark):
    rows = dedup.dedup_simhash(spark, SF).collect()
    seen = set()
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 8
        assert (r.doc_a, r.doc_b) not in seen
        seen.add((r.doc_a, r.doc_b))


def test_connected_components_account_for_all_paired_docs(spark):
    pairs = dedup.ngram_jaccard_pairs(spark, SF).collect()
    docs_in_pairs = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    hist = dedup.dedup_connected_components(spark, SF).collect()
    assert sum(r.cluster_size * r.n_clusters for r in hist) == len(docs_in_pairs)
    assert all(r.cluster_size >= 2 for r in hist)  # singletons have no edges
