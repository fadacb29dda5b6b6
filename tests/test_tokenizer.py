"""Tokenizer-training + substring-dedup + classifier-inference ops:
brute-force Python oracles on the smoke SF, plus invariants."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

from projet_meteo_etl_spark.operators.importance import (
    QW_RANGE,
    fasttext_quality_score,
)
from projet_meteo_etl_spark.operators.tokenizer import (
    BPE_TOP_K,
    SPAN,
    bpe_merge_topk,
    repeated_ngram_spans,
)
from tests.conftest import SF_SMOKE


def _texts(spark):
    return {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }


def test_bpe_merge_against_python_oracle(spark):
    texts = _texts(spark)
    vocab: Counter[str] = Counter()
    for t in texts.values():
        for w in re.split(r"\s+", t.strip()):
            if len(w) >= 2:
                vocab[w] += 1
    occ: Counter[str] = Counter()
    words: Counter[str] = Counter()
    for w, wc in vocab.items():
        pairs = [w[i : i + 2] for i in range(len(w) - 1)]
        for p in pairs:
            occ[p] += wc
        for p in set(pairs):
            words[p] += 1
    top = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TOP_K]
    rows = bpe_merge_topk(spark, SF_SMOKE).collect()
    assert len(rows) == min(BPE_TOP_K, len(occ))
    for r, (pair, n) in zip(rows, top):
        assert (r["pair"], r["n_occurrences"]) == (pair, n)
        assert r["n_words"] == words[pair]


def test_repeated_spans_against_python_oracle(spark):
    texts = _texts(spark)
    span_docs: defaultdict[tuple, set] = defaultdict(set)
    doc_spans: dict[int, list[tuple]] = {}
    for did, t in texts.items():
        toks = re.split(r"\s+", t.strip())
        spans = [tuple(toks[i : i + SPAN]) for i in range(len(toks) - SPAN + 1)]
        doc_spans[did] = spans
        for s in spans:
            span_docs[s].add(did)
    rows = repeated_ngram_spans(spark, SF_SMOKE).collect()
    assert len(rows) == len(texts)
    assert [r["doc_id"] for r in rows] == sorted(texts)
    for r in rows:
        spans = doc_spans[r["doc_id"]]
        dup = sum(1 for s in spans if len(span_docs[s]) >= 2)
        assert r["n_spans"] == len(spans)
        assert r["dup_spans"] == dup
        want = 0.0 if not spans else math.floor(dup / len(spans) * 1e6 + 0.5) / 1e6
        assert r["dup_frac"] == want


def test_repeated_spans_nontrivial(spark):
    """The fixture corpus must actually contain cross-doc duplicated
    spans, or the audit is vacuous."""
    rows = repeated_ngram_spans(spark, SF_SMOKE).collect()
    assert any(r["dup_spans"] > 0 for r in rows)
    assert all(0.0 <= r["dup_frac"] <= 1.0 for r in rows)


def test_fasttext_score_shape_and_bounds(spark):
    rows = fasttext_quality_score(spark, SF_SMOKE).collect()
    docs = _texts(spark)
    assert len(rows) == len(docs)
    half = (QW_RANGE - 1) // 2
    for r in rows:
        n_toks = len(re.split(r"\s+", docs[r["doc_id"]].strip()))
        # unigrams + bigrams
        assert r["n_features"] == n_toks + max(n_toks - 1, 0)
        assert abs(r["score_sum_milli"]) <= half * r["n_features"]
        assert -1.0 <= r["score_mean"] <= 1.0
        assert r["keep"] == int(r["score_sum_milli"] > 0)


def test_fasttext_score_splits_corpus(spark):
    """Hash weights are symmetric around 0 — a degenerate all-keep or
    all-drop output would mean the scoring collapsed."""
    rows = fasttext_quality_score(spark, SF_SMOKE).collect()
    keeps = {r["keep"] for r in rows}
    assert keeps == {0, 1}


def test_bpe_train_matches_reference_algorithm(spark):
    """The relational trainer must reproduce the classic BPE trainer
    (Sennrich et al. get_stats/merge_vocab loop, greedy left-to-right
    non-overlapping merges) decision-for-decision."""
    from projet_meteo_etl_spark.operators.tokenizer import (
        BPE_ROUNDS,
        bpe_train_merges,
    )

    texts = _texts(spark)
    vocab: Counter[str] = Counter()
    for t in texts.values():
        for w in re.split(r"\s+", t.strip()):
            if w:
                vocab[w] += 1
    segs: dict[str, list[str]] = {w: list(w) for w in vocab}

    def get_stats():
        st: Counter[tuple] = Counter()
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                st[(syms[i], syms[i + 1])] += vocab[w]
        return st

    def apply(pair):
        a, b = pair
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out

    expect = []
    for r in range(1, BPE_ROUNDS + 1):
        st = get_stats()
        (a, b), n = sorted(st.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect.append((r, f"{a}+{b}", n))
        apply((a, b))

    got = [
        (r["round"], r["merge_pair"], r["n_occurrences"])
        for r in bpe_train_merges(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_bpe_greedy_overlap_semantics(spark):
    """'aaaa' under merge (a,a) must segment as (aa)(aa) — alternate
    island members, not overlapping pairs.  Drive the trainer over a
    crafted one-word corpus via a temp view-free in-memory DataFrame."""
    from projet_meteo_etl_spark.operators import tokenizer as tk

    df = spark.createDataFrame([(1, "aaaa aaaa b")], "doc_id long, text string")

    orig = tk.load_table  # tokenizer binds load_table at import time
    try:
        tk.load_table = lambda s, d, n: df if n == "documents" else orig(s, d, n)
        rows = tk.bpe_train_merges(spark, "ignored").collect()
    finally:
        tk.load_table = orig
    # round 1: (a,a) appears 3 overlapping times per word × 2 words = 6
    assert (rows[0]["merge_pair"], rows[0]["n_occurrences"]) == ("a+a", 6)
    # round 2: after greedy merge each word is (aa)(aa) → pair (aa,aa)
    # twice; the overlapping third pair must NOT have survived
    assert (rows[1]["merge_pair"], rows[1]["n_occurrences"]) == ("aa+aa", 2)


def test_exact_substring_trim_against_python_oracle(spark):
    """Interval-union trim report must match a direct Python replay:
    duplicated 50-token windows (ANY second occurrence), merged into
    maximal spans, coverage / longest / ppm per doc."""
    from projet_meteo_etl_spark.operators.tokenizer import (
        LEE_T,
        exact_substring_trim_spans,
    )

    texts = _texts(spark)
    win_occ: Counter[tuple] = Counter()
    doc_wins: dict[int, list[tuple[int, tuple]]] = {}
    n_tokens: dict[int, int] = {}
    for did, t in texts.items():
        toks = re.split(r"\s+", t.strip())
        n_tokens[did] = len(toks)
        wins = [
            (i, tuple(toks[i : i + LEE_T]))
            for i in range(len(toks) - LEE_T + 1)
        ]
        doc_wins[did] = wins
        for _i, w in wins:
            win_occ[w] += 1
    rows = exact_substring_trim_spans(spark, SF_SMOKE).collect()
    assert [r["doc_id"] for r in rows] == sorted(texts)
    for r in rows:
        did = r["doc_id"]
        wins = doc_wins[did]
        dup_pos = [i for i, w in wins if win_occ[w] >= 2]
        # interval union of [p, p+LEE_T)
        spans = []
        for p in dup_pos:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + LEE_T)
            else:
                spans.append([p, p + LEE_T])
        covered = sum(e - s for s, e in spans)
        assert r["n_tokens"] == n_tokens[did]
        assert r["n_windows"] == len(wins)
        assert r["dup_windows"] == len(dup_pos)
        assert r["n_trim_spans"] == len(spans)
        assert r["covered_tokens"] == covered
        assert r["longest_span_tokens"] == (
            max((e - s for s, e in spans), default=0)
        )
        want_ppm = (
            0 if n_tokens[did] == 0 else covered * 1_000_000 // n_tokens[did]
        )
        assert r["trim_ppm"] == want_ppm


def test_exact_substring_trim_nontrivial():
    """sf0.01 must contain real >=50-token duplicated spans (the
    fixture's boilerplate blocks), or the trim report is vacuous."""
    import duckdb

    from projet_meteo_etl_spark.operators.tokenizer import EXACT_TRIM_SQL

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    tot = con.execute(
        f"SELECT sum(n_trim_spans), max(longest_span_tokens) "
        f"FROM ({EXACT_TRIM_SQL})"
    ).fetchone()
    assert tot[0] and tot[0] > 0
    assert tot[1] >= 50


def test_wordpiece_greedy_against_python_oracle(spark):
    """Inventory cut + greedy longest-match segmentation + usage
    rollup must match a direct Python replay."""
    from collections import Counter

    from projet_meteo_etl_spark.operators.tokenizer import (
        WP_MAX_LEN,
        WP_MIN_LEN,
        WP_VOCAB_K,
        wordpiece_greedy_segment,
    )

    texts = _texts(spark)
    vocab: Counter[str] = Counter()
    for t in texts.values():
        for w in re.split(r"\s+", t.strip()):
            if w:
                vocab[w] += 1
    cand: Counter[str] = Counter()
    for w, wc in vocab.items():
        for ln in range(WP_MIN_LEN, WP_MAX_LEN + 1):
            for i in range(len(w) - ln + 1):
                cand[w[i : i + ln]] += wc
    top = [
        p
        for p, _ in sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))[
            :WP_VOCAB_K
        ]
    ]
    chars = {c for w in vocab for c in w}
    pset = set(top) | chars
    maxlen = max(len(p) for p in pset)
    n_words: Counter[str] = Counter()
    uses: Counter[str] = Counter()
    for w, wc in vocab.items():
        i, counts = 0, Counter()
        while i < len(w):
            for ln in range(min(maxlen, len(w) - i), 0, -1):
                if w[i : i + ln] in pset:
                    counts[w[i : i + ln]] += 1
                    i += ln
                    break
        for p, c in counts.items():
            n_words[p] += 1
            uses[p] += wc * c
    all_uses = sum(uses.values())
    rows = wordpiece_greedy_segment(spark, SF_SMOKE).collect()
    assert len(rows) == len(uses)
    want = sorted(uses.items(), key=lambda kv: (-kv[1], kv[0]))
    for r, (p, u) in zip(rows, want):
        assert r["piece"] == p
        assert r["piece_len"] == len(p)
        assert r["n_words"] == n_words[p]
        assert r["total_uses"] == u
        assert r["share_ppm"] == u * 1_000_000 // all_uses


def test_unigram_em_against_python_oracle(spark):
    """Seed inventory, integer milli-nat costs, Viterbi segmentation
    with the (cost, path) tie-break, M-step reweighting and pruning
    must all match a direct Python replay."""
    import math
    from collections import Counter

    from projet_meteo_etl_spark.operators.tokenizer import (
        UNI_BLOCK,
        UNI_KEEP_K,
        UNI_LOG_SCALE,
        UNI_MAX_LEN,
        UNI_MIN_LEN,
        UNI_VOCAB_K,
        unigram_lm_em_step,
    )

    texts = _texts(spark)
    vocab: Counter[str] = Counter()
    for t in texts.values():
        for w in re.split(r"\s+", t.strip()):
            if w:
                vocab[w] += 1
    cand: Counter[str] = Counter()
    for w, wc in vocab.items():
        for ln in range(1, UNI_MAX_LEN + 1):
            for i in range(len(w) - ln + 1):
                cand[w[i : i + ln]] += wc
    multi = sorted(
        ((p, c) for p, c in cand.items() if len(p) >= UNI_MIN_LEN),
        key=lambda kv: (-kv[1], kv[0]),
    )[:UNI_VOCAB_K]
    inv = dict(multi) | {p: c for p, c in cand.items() if len(p) == 1}
    seed_tot = sum(inv.values())
    ln1e6 = math.floor(UNI_LOG_SCALE * math.log(1_000_000.0))
    cost = {
        p: ln1e6
        - math.floor(
            UNI_LOG_SCALE
            * math.log(float(max(c * 1_000_000 // seed_tot, 1)))
        )
        for p, c in inv.items()
    }
    blocks: Counter[str] = Counter()
    for w, wc in vocab.items():
        for i in range(0, len(w), UNI_BLOCK):
            blocks[w[i : i + UNI_BLOCK]] += wc
    ml = max(len(p) for p in cost)
    n_blocks: Counter[str] = Counter()
    uses: Counter[str] = Counter()
    for b, bwc in blocks.items():
        n = len(b)
        best = [None] * (n + 1)
        best[n] = (0, "")
        for i in range(n - 1, -1, -1):
            c0 = None
            for l in range(1, min(ml, n - i) + 1):
                pc = cost.get(b[i : i + l])
                if pc is None:
                    continue
                key = (pc + best[i + l][0], "\x1f" + b[i : i + l] + best[i + l][1])
                if c0 is None or key < c0:
                    c0 = key
            best[i] = c0
        counts = Counter(best[0][1].split("\x1f")[1:])
        for p, c in counts.items():
            n_blocks[p] += 1
            uses[p] += bwc * c
    all_uses = sum(uses.values())
    rows = unigram_lm_em_step(spark, SF_SMOKE).collect()
    assert len(rows) == len(inv)
    # multi-char pruning: keep the UNI_KEEP_K best by Viterbi count
    mrank = sorted(
        (p for p in inv if len(p) > 1),
        key=lambda p: (-uses.get(p, 0), p),
    )
    pruned = set(mrank[UNI_KEEP_K:])
    for r in rows:
        p = r["piece"]
        assert r["seed_cnt"] == inv[p]
        assert r["seed_cost_mnat"] == cost[p]
        assert r["n_blocks"] == n_blocks.get(p, 0)
        assert r["viterbi_uses"] == uses.get(p, 0)
        assert r["em_weight_ppm"] == uses.get(p, 0) * 1_000_000 // all_uses
        assert r["is_char"] == (1 if len(p) == 1 else 0)
        assert r["pruned"] == (1 if p in pruned else 0)
        if len(p) == 1:
            assert r["keep_rank"] == 0 and r["pruned"] == 0
    # the EM weights of kept pieces must dominate: no pruned piece may
    # out-count a kept multi-char piece
    kept = [uses.get(p, 0) for p in mrank[:UNI_KEEP_K]]
    assert not pruned or max(uses.get(p, 0) for p in pruned) <= min(kept)
