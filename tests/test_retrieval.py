"""Sparse retrieval: TF-IDF cosine top-k and BM25 keyword search."""

from __future__ import annotations

from projet_meteo_etl_spark.operators import retrieval
from tests.conftest import SF_SMOKE


def test_tfidf_topk_shape_and_ordering(spark):
    out = retrieval.tfidf_topk_similar(spark, SF_SMOKE).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["q_doc"], []).append(r)
    # query docs are doc_id % 100 == 0; each gets exactly TOP_K matches
    assert all(q % retrieval.QUERY_DOC_MOD == 0 for q in by_q)
    for q, rows in by_q.items():
        assert [r["rank"] for r in rows] == list(range(1, retrieval.TOP_K + 1))
        sims = [r["cosine_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(0.0 < s <= 1.0 for s in sims)
        assert all(r["match_doc"] != q for r in rows)


def test_tfidf_self_similarity_is_max(spark):
    # a doc's cosine with itself is 1.0 by construction; all reported
    # cross-doc sims must therefore be <= 1.0 with strict inequality
    # unless token multisets coincide under the weighting
    out = retrieval.tfidf_topk_similar(spark, SF_SMOKE).collect()
    assert max(r["cosine_sim"] for r in out) <= 1.0


def test_bm25_scores_positive_and_ordered(spark):
    out = retrieval.bm25_keyword_search(spark, SF_SMOKE).collect()
    assert len(out) == retrieval.BM25_TOP_N
    scores = [r["score_micros"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    assert all(1 <= r["n_terms_matched"] <= len(retrieval.BM25_TERMS) for r in out)


def test_bm25_idf_orders_rare_terms_higher(spark):
    """A doc matching more query terms at equal length should not score
    below a doc matching a strict subset with identical tfs — sanity of
    the additive per-term scoring."""
    from pyspark.sql import Row

    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="stream join window pad pad pad"),
            Row(doc_id=1, text="stream join filler pad pad pad"),
            Row(doc_id=2, text="other words only pad pad pad"),
        ]
    )
    import projet_meteo_etl_spark.operators.retrieval as mod

    orig = mod.load_table
    mod.load_table = lambda spark_, sf_, name: docs
    try:
        out = {
            r["doc_id"]: r["score_micros"]
            for r in mod.bm25_keyword_search(spark, SF_SMOKE).collect()
        }
    finally:
        mod.load_table = orig
    assert 2 not in out  # no query term → no row
    assert out[0] > out[1]  # superset of matched terms wins


def test_hybrid_rrf_fusion_invariants(spark):
    from projet_meteo_etl_spark.operators.retrieval import (
        RRF_DEPTH,
        RRF_K,
        RRF_SCALE,
        RRF_TOP,
        hybrid_rrf_search,
    )

    rows = hybrid_rrf_search(spark, SF_SMOKE).collect()
    assert rows
    by_q = {}
    for r in rows:
        by_q.setdefault(r["q_doc"], []).append(r)
        assert r["n_lists"] in (1, 2)
        # every score is a sum of 1 or 2 reciprocal-rank units from
        # ranks within depth
        lo = RRF_SCALE // (RRF_K + RRF_DEPTH)
        hi = 2 * (RRF_SCALE // (RRF_K + 1))
        assert lo <= r["rrf_micros"] <= hi
    for q, lst in by_q.items():
        assert q % 100 == 0
        ranks = [r["rank"] for r in lst]
        assert ranks == list(range(1, len(lst) + 1))
        assert len(lst) <= RRF_TOP
        scores = [r["rrf_micros"] for r in lst]
        assert scores == sorted(scores, reverse=True)
    # fusion must actually use both modalities somewhere
    assert any(r["n_lists"] == 2 for r in rows)
    assert any(r["n_lists"] == 1 for r in rows)
