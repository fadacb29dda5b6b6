"""Corpus statistics: repetition filter, vocabulary top-k, int8 quant."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_meteo_etl_spark.operators import corpus_stats, similarity
from tests.conftest import SF_SMOKE

SF = SF_SMOKE


def test_repetition_fracs_bounded_and_keep_consistent(spark):
    rows = corpus_stats.text_repetition_filter(spark, SF_SMOKE).collect()
    assert rows, "expected one row per document"
    for r in rows:
        for f in ("top2_frac", "top3_frac", "dup5_frac"):
            assert 0.0 <= r[f] <= 1.0
        expect_keep = (
            r["top2_frac"] <= corpus_stats.TOP2_MAX
            and r["top3_frac"] <= corpus_stats.TOP3_MAX
            and r["dup5_frac"] <= corpus_stats.DUP5_MAX
        )
        assert r["keep"] == expect_keep


def test_repetition_degenerate_doc_is_dropped(spark):
    """A document that is one phrase repeated must score ~1.0 on every
    repetition signal and be dropped; a doc of all-distinct tokens must
    score 0.0 and be kept."""
    docs = spark.createDataFrame(
        [
            (0, "spam ham " * 50, "en"),
            (1, " ".join(f"tok{i}" for i in range(100)), "en"),
        ],
        "doc_id int, text string, lang string",
    )
    import projet_meteo_etl_spark.catalog as cat

    orig = cat.load_table
    try:
        cat.load_table = lambda s, d, t: docs  # noqa: ARG005
        corpus_stats.load_table = cat.load_table
        out = {r["doc_id"]: r for r in corpus_stats.text_repetition_filter(spark, SF_SMOKE).collect()}
    finally:
        cat.load_table = orig
        corpus_stats.load_table = orig
    assert out[0]["dup5_frac"] == 1.0 and not out[0]["keep"]
    assert out[1]["top2_frac"] < 0.05 and out[1]["dup5_frac"] == 0.0 and out[1]["keep"]


def test_vocab_topk_is_sorted_and_df_le_tf(spark):
    rows = corpus_stats.corpus_vocab_topk(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= corpus_stats.VOCAB_K
    tfs = [r["tf"] for r in rows]
    assert tfs == sorted(tfs, reverse=True)
    assert all(1 <= r["df"] <= r["tf"] for r in rows)


def test_int8_quantize_bounds_and_error(spark):
    rows = similarity.embedding_int8_quantize(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert -127 <= r["q_min"] <= r["q_max"] <= 127
        assert r["scale_r"] > 0
        # max element error of half-up quantization is <= scale/2
        assert r["max_abs_err"] <= r["scale_r"] / 2 + 1e-9
        assert r["n_dims"] == similarity.DIM


def test_repetition_plan_is_single_pass(spark):
    """The three gram sizes must come from ONE corpus scan and ONE wide
    shuffle (stacked explode + conditional aggregates), not a
    scan+shuffle+window per gram size (Spark does not dedupe repeated
    plan subtrees, so the naive formulation triples the scan cost)."""
    df = corpus_stats.text_repetition_filter(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("REPARTITION_BY_COL") == 1, plan
    assert plan.count("Window ") == 1, plan
    # text-bearing scan appears once; the lang-side scan reads no text
    assert plan.count("text#") <= plan.count("ReadSchema"), plan
    assert plan.count("Scan parquet") == 2, plan


def test_int8_quantize_plan_has_no_shuffle_before_sort(spark):
    df = similarity.embedding_int8_quantize(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly one Exchange: the rangepartitioning for the final ORDER BY
    assert plan.count("Exchange") == 1, plan


def test_token_budget_selection_prefix_property(spark):
    from collections import defaultdict

    from projet_meteo_etl_spark.plans.curation import (
        TOKEN_BUDGET,
        token_budget_selection,
    )

    by_lang = defaultdict(list)
    for r in token_budget_selection(spark, SF_SMOKE).collect():
        by_lang[r["lang"]].append(r)
    for rows in by_lang.values():
        # kept is a prefix of the quality ranking, never interleaved
        kept_flags = [r["kept"] for r in rows]
        assert kept_flags == sorted(kept_flags, reverse=True)
        kept_tokens = sum(r["n_tokens"] for r in rows if r["kept"])
        assert kept_tokens <= TOKEN_BUDGET
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_train_test_split_fractions(spark):
    from projet_meteo_etl_spark.plans.curation import train_test_split_report

    rows = train_test_split_report(spark, SF_SMOKE).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {})[r["split"]] = r
    for splits in by_lang.values():
        total = sum(r["frac_of_lang"] for r in splits.values())
        assert abs(total - 1.0) < 1e-6


def test_bigram_lm_scores_bounds_and_composition(spark):
    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.operators.corpus_stats import (
        bigram_lm_doc_scores,
    )

    rows = bigram_lm_doc_scores(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    # only docs with >= 2 tokens score; none score twice
    assert len(rows) <= n_docs
    assert len({r["doc_id"] for r in rows}) == len(rows)
    for r in rows:
        # avg conditional probability: strictly positive, at most 1
        assert 0.0 < r["lm_score"] <= 1.0
        assert r["n_bigrams"] >= 1
        assert 0 < r["sum_t"] <= r["n_bigrams"] * 1_000_000


def test_bigram_lm_deterministic_across_partitioning(spark):
    from projet_meteo_etl_spark.operators.corpus_stats import (
        bigram_lm_doc_scores,
    )

    a = [tuple(r) for r in bigram_lm_doc_scores(spark, SF_SMOKE).collect()]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = [tuple(r) for r in bigram_lm_doc_scores(spark, SF_SMOKE).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_zipf_fit_shape(spark):
    from projet_meteo_etl_spark.operators.corpus_stats import (
        ZIPF_K,
        vocab_zipf_fit,
    )

    r = vocab_zipf_fit(spark, SF_SMOKE).collect()[0]
    # smoke corpus vocabulary is smaller than the fit depth
    assert 0 < r["n_terms"] <= ZIPF_K
    # frequencies decrease with rank: negative slope, meaningful fit
    assert r["zipf_slope"] < 0
    assert 0.0 <= r["r_squared"] <= 1.0


def test_pmi_pairs_supported_and_ordered(spark):
    from projet_meteo_etl_spark.operators.corpus_stats import (
        PMI_MIN_SUPPORT,
        PMI_TOP_N,
        token_pmi_topk,
    )

    rows = token_pmi_topk(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= PMI_TOP_N
    vals = [r["pmi_millinats"] for r in rows]
    assert vals == sorted(vals, reverse=True)
    for r in rows:
        assert r["t1"] < r["t2"]
        assert r["c_xy"] >= PMI_MIN_SUPPORT


def test_langid_confusion_matrix_partitions(spark):
    """Each label row's recall shares sum to ~1e6 ppm and cell counts
    reconcile with the corpus size."""
    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.operators.text import langid_confusion_matrix

    sf = "/root/testdata/sf0.01"
    rows = langid_confusion_matrix(spark, sf).collect()
    n_docs = load_table(spark, sf, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    from collections import defaultdict

    per_label = defaultdict(int)
    for r in rows:
        per_label[r["lang_label"]] += r["recall_ppm"]
        assert r["is_correct"] == int(r["lang_label"] == r["lang_pred"])
    for label, tot in per_label.items():
        assert 1_000_000 - 20 <= tot <= 1_000_000


def test_lm_holdout_nll_against_python_oracle(spark):
    """Laplace-smoothed bigram NLL on the test split must match a
    direct Python implementation of the same model."""
    import math
    import re
    from collections import Counter
    from hashlib import md5

    from projet_meteo_etl_spark.operators.corpus_stats import (
        LM_TRAIN_PCT,
        lm_holdout_nll,
    )

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }

    def is_train(doc_id):
        h = int(md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return h % 100 < LM_TRAIN_PCT

    cb, cu, voc = Counter(), Counter(), set()
    bigrams = {}
    for did, t in docs.items():
        toks = re.split(r"\s+", t.strip())
        bg = list(zip(toks, toks[1:]))
        bigrams[did] = bg
        if is_train(did):
            for w1, w2 in bg:
                cb[(w1, w2)] += 1
                cu[w1] += 1
                voc.add(w2)
    V = len(voc)
    rows = lm_holdout_nll(spark, SF).collect()
    assert rows, "test split must be non-empty"
    for r in rows:
        did = r["doc_id"]
        assert not is_train(did)
        bg = bigrams[did]
        lps = [
            math.floor(math.log((cb.get(p, 0) + 1.0) / (cu.get(p[0], 0) + V)) * 1e6)
            for p in bg
        ]
        assert r["n_bigrams"] == len(bg)
        assert r["sum_lp_micronats"] == sum(lps)
        if bg:
            assert r["avg_nll_micronats"] == (-sum(lps)) // len(bg)
            # NLL of a probability < 1 is positive
            assert r["avg_nll_micronats"] > 0
    # every test doc reported
    assert len(rows) == sum(1 for d in docs if not is_train(d))


def test_quantile_alignment_matches_python_replay(spark):
    """Pooled decile boundaries + per-source CDF ppm replayed in pure
    Python; the pooled source-weighted CDF must hit the decile marks."""
    import bisect

    import duckdb

    from projet_meteo_etl_spark.operators.corpus_stats import (
        QA_DECILES,
        source_quantile_alignment,
    )

    sf = "/root/testdata/sf0.001"
    rows = source_quantile_alignment(spark, sf).collect()
    docs = duckdb.sql(
        f"SELECT source, n_chars FROM '{sf}/documents.parquet'"
    ).fetchall()
    pooled = sorted(c for _, c in docs)
    n = len(pooled)
    bounds = {
        q: pooled[(q * n + 9) // 10 - 1] for q in QA_DECILES
    }
    by_src: dict = {}
    for s, c in docs:
        by_src.setdefault(s, []).append(c)
    got = {(r["source"], r["decile"]): r for r in rows}
    for s, cs in by_src.items():
        cs.sort()
        for q in QA_DECILES:
            r = got[(s, q)]
            below = bisect.bisect_right(cs, bounds[q])
            assert r["boundary_chars"] == bounds[q]
            assert (r["n_below"], r["n_src"]) == (below, len(cs))
            assert r["frac_ppm"] == below * 1_000_000 // len(cs)
    # pooled CDF at each boundary is >= the decile mark by construction
    for q in QA_DECILES:
        tot_below = sum(
            got[(s, q)]["n_below"] for s in by_src
        )
        assert tot_below >= (q * n + 9) // 10


def test_term_dispersion_bounds_and_replay(spark):
    """DP in [0, 1e6]; a term present in every source with shares equal
    to the corpus shares would score 0; values equal a Python replay of
    the same ppm quantization."""
    from pyspark.sql import functions as F

    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.operators.corpus_stats import (
        DISP_TOP_K,
        _WS,
        term_dispersion_dp,
    )
    from tests.conftest import SF_SMOKE

    rows = term_dispersion_dp(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= DISP_TOP_K
    for r in rows:
        assert 0 <= r["dp_ppm"] <= 1_000_000

    toks = (
        load_table(spark, SF_SMOKE, "documents")
        .select("source", F.explode(F.split(F.trim("text"), _WS)).alias("tok"))
        .collect()
    )
    ts, src_tok = {}, {}
    for t in toks:
        ts[(t["tok"], t["source"])] = ts.get((t["tok"], t["source"]), 0) + 1
        src_tok[t["source"]] = src_tok.get(t["source"], 0) + 1
    tf = {}
    for (tok, _), c in ts.items():
        tf[tok] = tf.get(tok, 0) + c
    total = sum(src_tok.values())
    top = sorted(tf, key=lambda t: (-tf[t], t))[:DISP_TOP_K]
    expect = {}
    for tok in top:
        s_ = sum(
            abs(
                ts.get((tok, src), 0) * 1_000_000 // tf[tok]
                - src_tok[src] * 1_000_000 // total
            )
            for src in src_tok
        )
        expect[tok] = (
            tf[tok],
            sum(1 for src in src_tok if ts.get((tok, src), 0) > 0),
            s_ // 2,
        )
    got = {r["token"]: (r["tf"], r["n_sources"], r["dp_ppm"]) for r in rows}
    assert got == expect


def test_doremi_weights_against_python_oracle(spark):
    """Full Python replay of the one-step DoReMi update: both bigram
    models, per-domain held-out NLLs, min-shifted excess, base-2
    boosts, normalized + smoothed weights."""
    import math
    import re
    from collections import Counter
    from hashlib import md5

    from projet_meteo_etl_spark.operators.corpus_stats import (
        DOREMI_K_CAP,
        DOREMI_SMOOTH_PPM,
        DOREMI_STEP_MICRONATS,
        LM_TRAIN_PCT,
        doremi_mixture_weights,
    )

    docs = {
        r["doc_id"]: (r["source"], r["text"])
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }

    def is_train(doc_id):
        h = int(md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return h % 100 < LM_TRAIN_PCT

    cbg, cug, vg = Counter(), Counter(), set()
    cbd, cud, vd = Counter(), Counter(), {}
    share = Counter()
    test_bg = []
    for did, (src, t) in docs.items():
        toks = re.split(r"\s+", t.strip())
        bg = list(zip(toks, toks[1:]))
        share[src] += len(bg)
        if is_train(did):
            for p in bg:
                cbg[p] += 1
                cug[p[0]] += 1
                vg.add(p[1])
                cbd[(src,) + p] += 1
                cud[(src, p[0])] += 1
                vd.setdefault(src, set()).add(p[1])
        else:
            test_bg.extend((src,) + p for p in bg)
    V = len(vg)
    smix, sdom, ntest = Counter(), Counter(), Counter()
    for src, w1, w2 in test_bg:
        ntest[src] += 1
        smix[src] += math.floor(
            math.log((cbg.get((w1, w2), 0) + 1.0) / (cug.get(w1, 0) + V))
            * 1e6
        )
        dv = len(vd.get(src, set()))
        sdom[src] += math.floor(
            math.log(
                (cbd.get((src, w1, w2), 0) + 1.0)
                / (cud.get((src, w1), 0) + dv)
            )
            * 1e6
        )
    total = sum(share.values())
    gap, nll = {}, {}
    for src in share:
        if ntest[src] == 0:
            nll[src] = (0, 0)
            gap[src] = 0
        else:
            m = (-smix[src]) // ntest[src]
            d_ = (-sdom[src]) // ntest[src]
            nll[src] = (m, d_)
            gap[src] = m - d_
    with_test = [gap[s] for s in share if ntest[s] > 0]
    min_gap = min(with_test) if with_test else None
    raw, base = {}, {}
    for src in share:
        base[src] = share[src] * 1_000_000 // total
        exc = (
            0
            if (ntest[src] == 0 or min_gap is None)
            else gap[src] - min_gap
        )
        k = min(exc // DOREMI_STEP_MICRONATS, DOREMI_K_CAP)
        raw[src] = base[src] * (1 << k)
    raw_sum = sum(raw.values())
    n_dom = len(share)
    rows = doremi_mixture_weights(spark, SF).collect()
    assert [r["source"] for r in rows] == sorted(share)
    for r in rows:
        src = r["source"]
        assert r["n_bigrams"] == share[src]
        assert r["n_test_bigrams"] == ntest[src]
        assert r["baseline_ppm"] == base[src]
        assert (r["mix_nll_micronats"], r["dom_nll_micronats"]) == nll[src]
        w = raw[src] * 1_000_000 // raw_sum
        assert r["dro_weight_ppm"] == w
        want = (
            (1_000_000 - DOREMI_SMOOTH_PPM) * w
            + DOREMI_SMOOTH_PPM * (1_000_000 // n_dom)
        ) // 1_000_000
        assert r["doremi_weight_ppm"] == want


def test_perplexity_buckets_ccnet_invariants(spark):
    """CCNet bucket semantics: per source the three buckets partition
    the docs, head/middle/tail are ordered by NLL (head = most
    LM-like), value-cutoff membership holds exactly, and each cutoff
    covers >= a third of the source (the defining property of the 33%
    value cut)."""
    rows = corpus_stats.perplexity_bucket_filter(spark, SF_SMOKE).collect()
    by_src: dict[str, dict[str, dict]] = {}
    for r in rows:
        by_src.setdefault(r["source"], {})[r["bucket"]] = r
    assert by_src, "no sources"
    for src, bks in by_src.items():
        assert set(bks) <= {"head", "middle", "tail"}
        assert "head" in bks  # the 33% cut always captures something
        n = sum(b["n_docs"] for b in bks.values())
        h = bks["head"]
        # cutoff semantics: every head doc <= cut33 < any tail doc
        assert h["max_nll_micronats"] <= h["cut33_micronats"]
        if "middle" in bks:
            m = bks["middle"]
            assert m["min_nll_micronats"] > h["cut33_micronats"]
            assert m["max_nll_micronats"] <= m["cut66_micronats"]
        if "tail" in bks:
            t = bks["tail"]
            assert t["min_nll_micronats"] > t["cut66_micronats"]
        # the 33% value cut covers at least a third of the source
        assert 3 * h["n_docs"] >= n
        # bucket means are ordered (head most LM-like)
        means = [
            bks[b]["mean_nll_micronats"]
            for b in ("head", "middle", "tail")
            if b in bks
        ]
        assert means == sorted(means)
