"""Feature-engineering operators (plans/feature_eng.py): leakage
properties, determinism, and domain invariants — plus the round-5
curation/layout/corpus additions that share this test surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from projet_meteo_etl_spark.catalog import load_table
from projet_meteo_etl_spark.plans.feature_eng import (
    N_FOLDS,
    N_NEG,
    coclick_positive_pairs,
    kfold_target_encoding,
    negative_sampling_pairs,
)

SF = "/root/testdata/sf0.01"


def test_kfold_encoding_is_leakage_free(spark):
    """enc(item, fold) must equal the label mean computed with that
    fold's rows EXCLUDED — verified against a Python replay."""
    rows = kfold_target_encoding(spark, SF).collect()
    assert rows
    e = load_table(spark, SF, "events").select(
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
        F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("cents"),
    ).collect()
    sums: dict[tuple, list] = {}
    for r in e:
        if r["item"] is None:
            continue
        key = (r["item"], r["user_id"] % N_FOLDS)
        s = sums.setdefault(key, [0, 0])
        s[0] += r["cents"]
        s[1] += 1
    for r in rows:
        out_s = sum(v[0] for (it, f), v in sums.items()
                    if it == r["item"] and f != r["fold"])
        out_n = sum(v[1] for (it, f), v in sums.items()
                    if it == r["item"] and f != r["fold"])
        assert r["n_out"] == out_n
        if out_n:
            assert r["enc_micro"] == (out_s * 1_000_000) // out_n
        else:
            assert r["enc_micro"] is None


def test_negative_sampling_deterministic_and_valid(spark):
    """Negatives are reproducible, within the vocabulary, never the
    positive, and at most N_NEG per anchor."""
    a = negative_sampling_pairs(spark, SF).collect()
    b = negative_sampling_pairs(spark, SF).collect()
    assert a == b and a
    vocab = {
        r["item"]
        for r in load_table(spark, SF, "events")
        .select(F.get_json_object("props", "$.k").cast("long").alias("item"))
        .filter(F.col("item").isNotNull())
        .distinct()
        .collect()
    }
    per_anchor: dict[int, int] = {}
    for r in a:
        assert r["neg_item"] in vocab
        assert r["neg_item"] != r["pos_item"]
        assert 0 <= r["slot"] < N_NEG
        per_anchor[r["event_id"]] = per_anchor.get(r["event_id"], 0) + 1
    assert max(per_anchor.values()) <= N_NEG


def test_coclick_pairs_ordered_and_supported(spark):
    from projet_meteo_etl_spark.plans.feature_eng import (
        COCLICK_MIN_SUPPORT,
        COCLICK_TOP,
    )

    rows = coclick_positive_pairs(spark, SF).collect()
    assert 0 < len(rows) <= COCLICK_TOP
    counts = [r["n_users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r["i1"] < r["i2"]
        assert r["n_users"] >= COCLICK_MIN_SUPPORT


def test_mixture_temperature_weights_invariants(spark):
    """Weights sum to ≤1e6 ppm (integer floor), small sources are
    up-sampled relative to their share, and draws stay bounded."""
    from projet_meteo_etl_spark.plans.curation import mixture_temperature_weights

    rows = mixture_temperature_weights(spark, SF).collect()
    assert rows
    assert sum(r["weight_ppm"] for r in rows) <= 1_000_000
    total = sum(r["n_docs"] for r in rows)
    assert all(0 <= r["draws_per_epoch"] <= total for r in rows)
    # α=0.5 flattens the distribution: the smallest source's weight
    # share must exceed its raw doc share, the largest's must not
    smallest = min(rows, key=lambda r: r["n_docs"])
    largest = max(rows, key=lambda r: r["n_docs"])
    if smallest["n_docs"] < largest["n_docs"]:
        assert smallest["weight_ppm"] * total >= smallest["n_docs"] * 1_000_000
        assert largest["weight_ppm"] * total <= largest["n_docs"] * 1_000_000


def test_curriculum_buckets_cover_and_order(spark):
    from projet_meteo_etl_spark.plans.curation import curriculum_quality_buckets

    rows = curriculum_quality_buckets(spark, SF).collect()
    assert [r["phase"] for r in rows] == list(range(1, 11))
    n_docs = load_table(spark, SF, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    # easy→hard: an earlier phase's worst doc scores ≥ a later phase's best
    for a, b in zip(rows, rows[1:]):
        assert a["min_score"] >= b["max_score"] - 1e-9


def test_lsh_candidate_precision_bounds(spark):
    from projet_meteo_etl_spark.operators.dedup import lsh_candidate_precision

    r = lsh_candidate_precision(spark, SF).collect()[0]
    assert r["n_true_pairs"] > 0
    assert r["n_hits"] <= min(r["n_candidates"], r["n_true_pairs"])
    assert 0 <= r["precision_ppm"] <= 1_000_000
    assert 0 <= r["recall_ppm"] <= 1_000_000


def test_compaction_plan_invariants(spark):
    from projet_meteo_etl_spark.plans.layout import (
        TARGET_FILE_BYTES,
        small_files_compaction_plan,
    )

    rows = small_files_compaction_plan(spark, SF).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_output_files"] <= r["n_input_files"]
        # first-fit on the exclusive prefix can overshoot one input per
        # bin, never more
        assert r["n_output_files"] >= r["total_bytes"] // TARGET_FILE_BYTES - 1
        assert 0 < r["fill_ppm"]


def test_oov_rate_audit_consistent(spark):
    from projet_meteo_etl_spark.operators.corpus_stats import oov_rate_audit

    rows = oov_rate_audit(spark, SF).collect()
    assert rows
    assert all(0 <= r["n_oov"] <= r["n_tokens"] for r in rows)
    # K=16 < the 31-token corpus vocabulary → the tail must be visible
    assert any(r["n_oov"] > 0 for r in rows)


def test_neyman_allocation_properties(spark):
    """Allocation ∝ N_h·σ_h within integer truncation, never exceeds
    the stratum population or the total budget."""
    from projet_meteo_etl_spark.plans.curation import (
        NEYMAN_BUDGET,
        neyman_allocation_plan,
    )

    rows = neyman_allocation_plan(spark, SF).collect()
    assert rows
    assert sum(r["allocation"] for r in rows) <= NEYMAN_BUDGET
    denom = sum(r["weight"] for r in rows)
    for r in rows:
        assert 0 <= r["allocation"] <= r["n_rows"]
        want = min(r["n_rows"], NEYMAN_BUDGET * r["weight"] // max(denom, 1))
        assert r["allocation"] == want


def test_propensity_ipw_inverse_relation(spark):
    from projet_meteo_etl_spark.plans.feature_eng import propensity_ipw_weights

    rows = propensity_ipw_weights(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_views"] > 0
        if r["n_purchases"] > 0:
            assert r["ipw_micro"] == r["n_views"] * 1_000_000 // r["n_purchases"]
        else:
            assert r["ipw_micro"] is None


def test_tokenizer_fertility_sane(spark):
    """Subword count ≥ word count (the regex splits punctuation off),
    so fertility ≥ 1e6 ppm; chars per subword is a small positive."""
    from projet_meteo_etl_spark.operators.text import tokenizer_fertility_by_source

    rows = tokenizer_fertility_by_source(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["fertility_ppm"] >= 1_000_000
        assert 0 < r["chars_per_subword_ppm"] < 50_000_000


def test_deletion_vector_plan_thresholds(spark):
    from projet_meteo_etl_spark.plans.layout import (
        DV_REWRITE_PPM,
        deletion_vector_plan,
    )

    rows = deletion_vector_plan(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_deleted"] <= r["n_rows"]
        if r["plan"] == "noop":
            assert r["n_deleted"] == 0
        elif r["plan"] == "rewrite":
            assert r["deleted_ppm"] > DV_REWRITE_PPM
        else:
            assert 0 < r["deleted_ppm"] <= DV_REWRITE_PPM


def test_bootstrap_ci_brackets_point_estimate(spark):
    from projet_meteo_etl_spark.plans.experiments import (
        N_BOOT,
        bootstrap_ci_purchase_mean,
    )

    r = bootstrap_ci_purchase_mean(spark, SF).collect()[0]
    assert r["n_replicas"] == N_BOOT
    assert r["ci_lo_micro"] <= r["ci_hi_micro"]
    # half-sample means of a well-populated slice bracket the point
    assert r["ci_lo_micro"] <= r["point_micro"] <= r["ci_hi_micro"]


def test_ndcg_eval_bounds(spark):
    from projet_meteo_etl_spark.operators.retrieval import ndcg_at_k_eval

    r = ndcg_at_k_eval(spark, SF).collect()[0]
    assert 0 < r["dcg_micro"] <= r["idcg_micro"]
    assert 0 < r["ndcg_ppm"] <= 1_000_000


def test_salt_factor_advisor_consistent(spark):
    from projet_meteo_etl_spark.plans.relational_ext import (
        SALT_MAX,
        SALT_TARGET_ROWS,
        salt_factor_advisor,
    )

    rows = salt_factor_advisor(spark, SF).collect()
    assert rows
    total = sum(r["n_rows"] for r in rows)
    for r in rows:
        want = min(SALT_MAX, -(-r["n_rows"] // SALT_TARGET_ROWS))
        assert r["salt_factor"] == want
        assert r["share_ppm"] == r["n_rows"] * 1_000_000 // total


def test_hour_of_week_shares_sum(spark):
    from projet_meteo_etl_spark.plans.timeseries import (
        events_hour_of_week_seasonality,
    )

    rows = events_hour_of_week_seasonality(spark, SF).collect()
    assert rows
    assert all(1 <= r["dow_iso"] <= 7 and 0 <= r["hour"] <= 23 for r in rows)
    assert sum(r["share_ppm"] for r in rows) <= 1_000_000


def test_map_showcase_every_key_per_event(spark):
    from projet_meteo_etl_spark.plans.modern_api import map_functions_showcase

    rows = map_functions_showcase(spark, SF).collect()
    per_event: dict[int, set] = {}
    for r in rows:
        per_event.setdefault(r["event_id"], set()).add(r["map_key"])
        assert r["map_value"] == r["map_value"].upper()
    assert all(ks == {"type", "day", "band"} for ks in per_event.values())
    assert len(per_event) == 500


def test_robust_scaler_params_rank_exact(spark):
    """Q1 ≤ median ≤ Q3, clip bounds bracket the quartiles, and the
    median matches a Python rank replay for one slice."""
    from projet_meteo_etl_spark.operators.profiling import robust_scaler_params

    rows = robust_scaler_params(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["q1_cents"] <= r["median_cents"] <= r["q3_cents"]
        assert r["clip_lo_cents"] <= r["q1_cents"]
        assert r["clip_hi_cents"] >= r["q3_cents"]
    one = rows[0]
    cents = sorted(
        r["c"]
        for r in load_table(spark, SF, "events")
        .filter(F.col("event_type") == one["event_type"])
        .select(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long").alias("c"))
        .collect()
    )
    n = len(cents)
    assert one["median_cents"] == cents[(n + 1) // 2 - 1]
    assert one["q1_cents"] == cents[(n + 3) // 4 - 1]


def test_time_series_cv_folds_expand_without_leakage(spark):
    from projet_meteo_etl_spark.plans.feature_eng import (
        N_TS_FOLDS,
        time_series_cv_folds,
    )

    rows = time_series_cv_folds(spark, SF).collect()
    assert [r["fold"] for r in rows] == list(range(1, N_TS_FOLDS + 1))
    for a, b in zip(rows, rows[1:]):
        # expanding: later folds train on strictly more data
        assert b["train_end_day"] > a["train_end_day"]
        assert b["n_train"] >= a["n_train"] + a["n_test"] - 1
    for r in rows:
        assert r["test_end_day"] > r["train_end_day"]
        assert r["n_test"] > 0
    total = load_table(spark, SF, "events").count()
    last = rows[-1]
    assert last["n_train"] + last["n_test"] == total


def test_feature_hash_collision_decreases_with_dim(spark):
    from projet_meteo_etl_spark.plans.feature_eng import (
        HASH_DIMS,
        feature_hash_collision_audit,
    )

    rows = feature_hash_collision_audit(spark, SF).collect()
    assert [r["n_buckets"] for r in rows] == sorted(HASH_DIMS)
    for r in rows:
        assert r["n_occupied"] <= min(r["n_items"], r["n_buckets"])
        assert r["max_load"] >= -(-r["n_items"] // r["n_buckets"])
    colls = [r["collision_ppm"] for r in rows]
    assert colls == sorted(colls, reverse=True)  # bigger table, fewer collisions


def test_multimodal_payload_dup_consistent_with_metadata(spark):
    """Redundant assets per kind must equal n_assets − distinct_payloads
    from the metadata scan (same digest)."""
    from projet_meteo_etl_spark.operators.multimodal import (
        multimodal_metadata,
        multimodal_payload_near_dup,
    )

    meta = {r["kind"]: r for r in multimodal_metadata(spark, SF).collect()}
    dup = {r["kind"]: r for r in multimodal_payload_near_dup(spark, SF).collect()}
    assert meta.keys() == dup.keys()
    for k in meta:
        assert dup[k]["n_distinct_payloads"] == meta[k]["distinct_payloads"]
        assert (
            dup[k]["n_redundant_assets"]
            == meta[k]["n_assets"] - meta[k]["distinct_payloads"]
        )
        assert dup[k]["n_verify_pairs"] >= dup[k]["n_redundant_assets"]


def test_chained_dau_equals_unchained_twin(spark):
    """The chained dedup→window pipeline must produce exactly the
    unchained dedup-then-batch-aggregate result."""
    from projet_meteo_etl_spark.streaming.structured import (
        stream_chained_dedup_dau,
        stream_dedup_user_day,
    )

    sf = "/root/testdata/sf0.001"
    a = [(r["day"], r["n_users"]) for r in stream_chained_dedup_dau(spark, sf).collect()]
    b = [(r["day"], r["n_users"]) for r in stream_dedup_user_day(spark, sf).collect()]
    assert a == b and a


def test_mrr_matches_python_replay(spark):
    """MRR@10 / Hit@10 replayed from a pure-Python catalog ranking."""
    import duckdb

    from projet_meteo_etl_spark.operators.retrieval import (
        NDCG_K,
        _MRR_RECIP,
        mrr_hit_rate_eval,
    )

    sf = "/root/testdata/sf0.001"
    r = mrr_hit_rate_eval(spark, sf).collect()[0]
    rows = duckdb.sql(
        f"SELECT user_id,"
        f" CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,"
        f" event_type FROM '{sf}/events.parquet'"
        f" WHERE json_extract_string(props, '$.k') IS NOT NULL"
    ).fetchall()
    views: dict = {}
    for _, item, et in rows:
        if et == "view":
            views[item] = views.get(item, 0) + 1
    items = {i for _, i, _ in rows}
    ranked = sorted(items, key=lambda i: (-views.get(i, 0), i))
    rank_of = {i: r_ + 1 for r_, i in enumerate(ranked)}
    bought: dict = {}
    for u, item, et in rows:
        if et == "purchase":
            bought.setdefault(u, set()).add(item)
    best = {u: min(rank_of[i] for i in its) for u, its in bought.items()}
    n = len(best)
    hits = sum(1 for b in best.values() if b <= NDCG_K)
    mrr_sum = sum(_MRR_RECIP[b - 1] for b in best.values() if b <= NDCG_K)
    assert (r["n_users_eval"], r["n_hits_at_k"]) == (n, hits)
    assert r["hit_rate_ppm"] == hits * 1_000_000 // n
    assert r["mrr_ppm"] == mrr_sum // n
    assert 0 <= r["mrr_ppm"] <= r["hit_rate_ppm"] <= 1_000_000


def test_stump_split_matches_python_replay(spark):
    """The chosen threshold must be the argmax of the exact per-row
    score over ALL candidate thresholds, replayed in pure Python."""
    import duckdb

    from projet_meteo_etl_spark.plans.feature_eng import (
        regression_stump_split,
    )

    sf = "/root/testdata/sf0.001"
    r = regression_stump_split(spark, sf).collect()[0]
    rows = duckdb.sql(
        f"SELECT CAST(floor(l_quantity + 0.5) AS BIGINT),"
        f" CAST(floor(l_extendedprice + 0.5) AS BIGINT)"
        f" FROM '{sf}/lineitem.parquet'"
    ).fetchall()
    roll: dict = {}
    for q, d in rows:
        a = roll.setdefault(q, [0, 0, 0])
        a[0] += 1
        a[1] += d
        a[2] += d * d
    n = sum(a[0] for a in roll.values())
    s_tot = sum(a[1] for a in roll.values())
    q_tot = sum(a[2] for a in roll.values())
    best = None
    n_l = s_l = 0
    for q in sorted(roll):
        n_l += roll[q][0]
        s_l += roll[q][1]
        if n_l >= n:
            break
        score = s_l * s_l * 1_000_000 // (n_l * n) + (
            s_tot - s_l
        ) ** 2 * 1_000_000 // ((n - n_l) * n)
        if best is None or score > best[0]:
            best = (score, q, n_l, n - n_l)
    assert (r["split_q"], r["n_l"], r["n_r"]) == (
        best[1], best[2], best[3],
    )
    assert r["score_per_row_micro"] == best[0]
    assert r["sse_parent_per_row_micro"] == (
        q_tot * 1_000_000 // n - s_tot * s_tot * 1_000_000 // (n * n)
    )
    # splitting can only concentrate means: score >= parent's S²/n term
    assert r["score_per_row_micro"] >= s_tot * s_tot * 1_000_000 // (
        n * n
    ) - 1
