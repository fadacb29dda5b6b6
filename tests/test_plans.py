"""Physical-plan assertions: the plans we'd want at 100 TB, not just
plans that happen to pass.  Each test pins an optimizer behavior that a
regression (dropped broadcast hint, broken pushdown, accidental UDF)
would silently lose."""

from __future__ import annotations

from projet_meteo_etl_spark.plans import relational, relational_ext, temporal

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dim_joins_are_broadcast(spark):
    for fn in (relational.q3_shipping_priority, relational.q5_local_supplier_volume,
               relational.revenue_by_nation, relational_ext.q10_returned_items):
        plan = _plan(fn(spark, SF))
        assert "BroadcastHashJoin" in plan, f"{fn.__name__} lost its broadcast"


def test_filters_reach_parquet_scan(spark):
    plan = _plan(relational_ext.q6_forecast_revenue(spark, SF))
    # the plan string truncates long filter lists, so check the pushed
    # list is non-empty and starts with the expected predicates
    assert "PushedFilters: [IsNotNull" in plan
    assert "GreaterThanOrEqual(l_shipda" in plan


def test_column_pruning_reaches_scan(spark):
    plan = _plan(relational.q1_pricing_summary(spark, SF))
    # lineitem has 11 columns; Q1 needs 7 — the scan schema must exclude
    # the unused ones
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_partkey" not in read_schema
    assert "l_suppkey" not in read_schema
    assert "l_quantity" in read_schema


def test_topk_plans_take_ordered(spark):
    plan = _plan(relational.topk_expensive_parts(spark, SF))
    assert "TakeOrderedAndProject" in plan  # no full global sort for LIMIT


def test_whole_stage_codegen_active(spark):
    # codegen spans appear in the FINAL adaptive plan, so execute first
    df = relational.q1_pricing_summary(spark, SF)
    df.collect()
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    # codegen'd operators render with "*(stageId)" markers
    assert "*(1) " in plan and "*(2) " in plan


def test_asof_join_single_shuffle(spark):
    """The as-of union+window implementation must shuffle once on
    user_id (plus the purchase-dedup agg) — never a join explosion."""
    plan = _plan(temporal.asof_purchase_before_click(spark, SF))
    assert "Join" not in plan  # no physical join operator at all
    assert plan.count("Exchange hashpartitioning") <= 3


def test_partial_aggregation_before_shuffle(spark):
    plan = _plan(relational.q1_pricing_summary(spark, SF))
    # two HashAggregate nodes (partial + final) around one exchange:
    # map-side combine is on
    assert plan.count("HashAggregate") >= 2


def test_sample_fraction_and_determinism(spark):
    a = relational_ext.lineitem_sample_stats(spark, SF).collect()[0]
    b = relational_ext.lineitem_sample_stats(spark, SF).collect()[0]
    assert a == b  # fixed seed + same partitioning → reproducible
    from projet_meteo_etl_spark.catalog import load_table
    total = load_table(spark, SF, "lineitem").count()
    assert 0.05 * total < a.n_sampled < 0.15 * total


def test_aqe_splits_skewed_join(spark):
    """A pathologically hot key must be split by AQE's skew-join
    handling (thresholds lowered to trigger at test scale) — the
    mechanism that keeps one straggler task from serializing a 100 TB
    fact-fact join."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # left: 200k rows on ONE key + 2k spread over 1000 keys
        hot = spark.range(200_000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
        cold = spark.range(2_000).select((F.col("id") % 1000 + 1).alias("k"), F.col("id").alias("v"))
        left = hot.unionByName(cold)
        right = spark.range(1001).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
        j = left.join(right, "k")
        # collect on THIS DataFrame so its own query execution finalizes
        # (count() would plan and execute a separate aggregate query)
        assert len(j.collect()) == 202_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not mark the skewed join"
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_tpch_fill_plan_shapes(spark):
    """The TPC-H fill queries keep their intended physical shapes:
    dims broadcast, decorrelated aggregates instead of correlated
    re-scans (no nested-loop join anywhere in the batch)."""
    from projet_meteo_etl_spark.plans import tpch_fill

    for fn, want_bcast in (
        (tpch_fill.q2_min_cost_supplier, True),
        (tpch_fill.q8_market_share, True),
        (tpch_fill.q9_product_profit, True),
        (tpch_fill.q21_waiting_suppliers, True),
    ):
        plan = _plan(fn(spark, SF))
        if want_bcast:
            assert "BroadcastHashJoin" in plan, f"{fn.__name__} lost its broadcast"
        assert "CartesianProduct" not in plan, f"{fn.__name__} degenerated"


def test_q21_single_fact_shuffle(spark):
    """Q21's double-EXISTS is decorrelated into one per-order aggregate:
    lineitem must not be shuffle-joined against itself repeatedly."""
    from projet_meteo_etl_spark.plans import tpch_fill

    plan = _plan(tpch_fill.q21_waiting_suppliers(spark, SF))
    assert plan.count("SortMergeJoin") <= 2


def test_curation_plan_shapes(spark):
    """Curation operators keep their scale-critical shapes: held-out
    shingles broadcast into the corpus scan (decontamination), packing
    is window-only (no join), the mixture sampler has no shuffle before
    its final single aggregation."""
    from projet_meteo_etl_spark.plans import curation

    decon = _plan(curation.benchmark_decontamination(spark, SF))
    assert "BroadcastHashJoin" in decon, "held-out set must broadcast"
    assert "SortMergeJoin" not in decon

    pack = _plan(curation.pack_sequences(spark, SF))
    assert "Window" in pack
    assert "Join" not in pack

    mix = _plan(curation.stratified_sample_mix(spark, SF))
    assert "Join" not in mix
    # scan → partial agg → exchange → final agg: exactly one exchange
    # besides the final tiny sort
    assert mix.count("Exchange") <= 2


def test_quality_score_single_split_per_statistic(spark):
    """The scoring projection must evaluate each regex statistic once —
    inlining them under CASE branches defeats subexpression elimination
    (16× wall regression guard)."""
    from projet_meteo_etl_spark.operators import text

    plan = _plan(text.text_quality_score(spark, SF))
    assert plan.count("split(") <= 2  # one for tokens, one for distinct


def test_chunk_documents_windows(spark):
    """Chunk geometry: full windows are CHUNK_W tokens, strides are
    CHUNK_S apart, trailing fragments ≥ CHUNK_MIN, and every doc with
    ≥ CHUNK_MIN tokens produces ⌊(n−MIN+S)/S⌋ chunks."""
    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.plans.curation import (
        CHUNK_MIN,
        CHUNK_S,
        CHUNK_W,
        chunk_documents,
    )

    sf = "/root/testdata/sf0.01"
    out = chunk_documents(spark, sf)
    rows = out.collect()
    assert rows
    per_doc = {}
    for r in rows:
        assert CHUNK_MIN <= r["n_tokens"] <= CHUNK_W
        per_doc.setdefault(r["doc_id"], []).append(r["chunk_id"])
    for ids in per_doc.values():
        assert sorted(ids) == list(range(len(ids)))  # dense 0..k-1
    # closed-form chunk count for one inspected doc
    d = load_table(spark, sf, "documents")
    n = len(d.filter("doc_id = 0").collect()[0]["text"].split())
    expected = max(0, (n - CHUNK_MIN + CHUNK_S) // CHUNK_S)
    assert len(per_doc.get(0, [])) == expected


def test_per_group_sample_deterministic_k(spark):
    """Exactly SAMPLE_K per group (when the group is big enough), and
    two invocations select identical thresholds (pure function of the
    data, any partitioning)."""
    from projet_meteo_etl_spark.plans.curation import SAMPLE_K, per_group_sample

    sf = "/root/testdata/sf0.01"
    from pyspark.sql import functions as F

    from projet_meteo_etl_spark.catalog import load_table

    a = {r["event_type"]: r for r in per_group_sample(spark, sf).collect()}
    b = {r["event_type"]: r for r in per_group_sample(spark, sf).collect()}
    assert a.keys() == b.keys() and len(a) > 0
    group_sizes = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for k in a:
        # exactly K when the group has >= K events (independent count)
        assert a[k]["n_sampled"] == min(SAMPLE_K, group_sizes[k])
        assert a[k]["hash_threshold"] == b[k]["hash_threshold"]
        assert a[k]["sample_mean"] == b[k]["sample_mean"]


def test_sampler_rank_filters_keep_window_group_limit(spark):
    """The samplers' docstrings promise map-side partial top-k: each
    executor keeps only k rows per group and k·|groups| rows shuffle.
    On Spark 4 that physical shape comes from InferWindowGroupLimit
    turning the rank filter into a Partial WindowGroupLimit BELOW the
    exchange plus a Final one above — an optimizer behavior a conf
    change (windowGroupLimitThreshold=0) or version regression would
    silently lose, reverting to shuffling every row of every group to
    one task.  Pin both nodes for every rank-filtered top-k sampler."""
    from projet_meteo_etl_spark.plans.curation import (
        per_group_sample,
        weighted_sample_wor,
    )

    for fn in (per_group_sample, weighted_sample_wor):
        plan = _plan(fn(spark, SF))
        wgl_lines = [l for l in plan.splitlines() if "WindowGroupLimit" in l]
        assert any("Partial" in l for l in wgl_lines), (
            f"{fn.__name__} lost its map-side (Partial) WindowGroupLimit"
        )
        assert any("Final" in l for l in wgl_lines), (
            f"{fn.__name__} lost its Final WindowGroupLimit"
        )


def test_selectivity_estimate_close(spark):
    """The histogram forecast lands within 20% of truth on this
    distribution, and the reported rel_err is consistent."""
    from projet_meteo_etl_spark.operators.profiling import selectivity_estimate

    r = selectivity_estimate(spark, "/root/testdata/sf0.01").collect()[0]
    assert r["exact_rows"] > 0
    assert abs(r["est_rows"] - r["exact_rows"]) / r["exact_rows"] < 0.2
    assert abs(r["rel_err"] - abs(r["est_rows"] - r["exact_rows"]) / r["exact_rows"]) < 1e-5


def test_new_operator_plan_shapes(spark):
    """Scale-critical shapes of the round-2 operators: the policy audit
    is a join-free single-aggregation scan; chunking has no exchange
    before its presentation sort; the DSIR/KL model tables and the PQ
    codebook broadcast rather than shuffling the corpus; the Z-order
    audit shuffles only for its 64-ary aggregation."""
    from projet_meteo_etl_spark.operators import selection
    from projet_meteo_etl_spark.operators.clustering import pq_codebook_audit
    from projet_meteo_etl_spark.plans import curation, layout

    pol = _plan(selection.policy_blocklist_audit(spark, SF))
    assert "Join" not in pol
    assert pol.count("Exchange") <= 2  # partial agg + final sort

    chunk = _plan(curation.chunk_documents(spark, SF))
    assert "Join" not in chunk
    # explode projection runs map-side; only the orderBy exchanges
    assert chunk.count("Exchange") <= 1

    kl = _plan(selection.vocab_kl_by_source(spark, SF))
    assert "BroadcastHashJoin" in kl, "corpus model must broadcast"

    pq = _plan(pq_codebook_audit(spark, SF))
    # the codebook ships by value inside the assignment kernel (no join
    # at all — better than the broadcast join this used to pin), so the
    # plan must show the Arrow-batched Python stage and no shuffle join
    assert "MapInPandas" in pq or "ArrowEvalPython" in pq
    assert "SortMergeJoin" not in pq and "BroadcastHashJoin" not in pq

    z = _plan(layout.zorder_layout_audit(spark, SF))
    assert "SortMergeJoin" not in z


def test_salted_join_equals_plain_join(spark):
    """Salting is a physical rewrite only — the salted (event_type,
    salt) join must produce exactly the plain event_type join's result,
    and the fact-side scan must not be broadcast."""
    from pyspark.sql import functions as F

    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.plans.relational_ext import salted_skew_join

    df = salted_skew_join(spark, SF)
    got = {(r["tier"], r["n_events"], r["total_value"]) for r in df.collect()}

    e = load_table(spark, SF, "events")
    seg = spark.createDataFrame(
        [("click", "engage"), ("view", "engage"), ("purchase", "convert"),
         ("error", "fault"), ("signup", "acquire")],
        "event_type string, tier string",
    )
    plain = (
        e.join(seg, "event_type")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")) / 100.0).alias("v"),
        )
    )
    want = {(r["tier"], r["n"], r["v"]) for r in plain.collect()}
    assert got == want


def test_referential_integrity_audit_detects_seeded_orphans(spark):
    """Zero orphans on the driver data; a seeded orphan row is found."""
    from pyspark.sql import functions as F

    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.operators.quality_queries import (
        referential_integrity_audit,
    )

    base = {
        r["fk_edge"]: r["n_orphans"]
        for r in referential_integrity_audit(spark, SF).collect()
    }
    assert set(base) == {
        "lineitem->orders", "lineitem->part",
        "lineitem->supplier", "orders->customer",
    }
    assert all(v == 0 for v in base.values())

    # seed one orphan: a lineitem row pointing at a nonexistent order
    l = load_table(spark, SF, "lineitem")
    seeded = l.limit(1).withColumn("l_orderkey", F.lit(-999)).unionByName(l)
    o = load_table(spark, SF, "orders")
    n = seeded.join(o, seeded.l_orderkey == o.o_orderkey, "left_anti").count()
    assert n == 1


def test_pit_assembly_has_no_leakage(spark):
    """Every feature value must be derivable from events STRICTLY
    earlier than the label event (the point-in-time contract), checked
    against a Python replay of each user's timeline."""
    from projet_meteo_etl_spark.catalog import load_table as _lt

    ev = sorted(
        (
            (r["user_id"], r["ts"], r["event_id"], r["event_type"], r["value"])
            for r in _lt(spark, SF, "events").collect()
        ),
        key=lambda t: (t[0], t[1], t[2]),
    )
    import math

    timeline = {}
    for u, ts, eid, etyp, val in ev:
        timeline.setdefault(u, []).append((ts, eid, etyp, val))
    got = temporal.pit_training_set_assembly(spark, SF).collect()
    assert got and all(
        r["n_prior_events"] >= 0 for r in got
    )
    by_key = {(r["user_id"], r["event_id"]): r for r in got}
    n_labels = 0
    for u, seq in timeline.items():
        for i, (ts, eid, etyp, val) in enumerate(seq):
            if etyp != "purchase":
                continue
            n_labels += 1
            r = by_key[(u, eid)]
            prior = seq[:i]
            assert r["n_prior_events"] == len(prior)
            clicks = [v for _, _, t, v in prior if t == "click"]
            want = (
                math.floor(clicks[-1] * 100 + 0.5) if clicks else None
            )
            assert r["last_click_cents"] == want, (u, eid)
            assert r["label_cents"] == math.floor(val * 100 + 0.5)
    assert n_labels == len(got)


def test_join_hints_select_their_operators(spark):
    """Each strategy hint must actually pick its physical join node."""
    from pyspark.sql import functions as F

    from projet_meteo_etl_spark.catalog import load_table
    from tests.conftest import SF_SMOKE

    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer")
    expected = {
        "BROADCAST": "BroadcastHashJoin",
        "MERGE": "SortMergeJoin",
        "SHUFFLE_HASH": "ShuffledHashJoin",
    }
    for hint, node in expected.items():
        j = o.join(c.hint(hint), o["o_custkey"] == c["c_custkey"]).agg(
            F.count(F.lit(1))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert node in plan, f"{hint} did not select {node}:\n{plan[:500]}"


def test_range_join_binned_is_equi_join(spark):
    """The binned rewrite must plan a hash/merge join, never a
    broadcast-nested-loop over the raw interval predicate."""
    from projet_meteo_etl_spark.plans.temporal import range_join_binned
    from tests.conftest import SF_SMOKE

    plan = (
        range_join_binned(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoop" not in plan


def test_next_click_hitrate_identities(spark):
    """Eval identities: hit1 <= hitk <= n_eval - n_cold (a cold
    transition can never hit), rates are exact integer ppm, and the
    result is partition-independent."""
    from projet_meteo_etl_spark.plans.temporal import (
        markov_next_click_hitrate,
    )
    from tests.conftest import SF_SMOKE

    r = markov_next_click_hitrate(spark, SF_SMOKE).collect()[0]
    assert 0 <= r["n_hit1"] <= r["n_hitk"] <= r["n_eval"] - r["n_cold"]
    assert r["hit1_ppm"] == r["n_hit1"] * 1_000_000 // max(r["n_eval"], 1)
    assert r["hitk_ppm"] == r["n_hitk"] * 1_000_000 // max(r["n_eval"], 1)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        r2 = markov_next_click_hitrate(spark, SF_SMOKE).collect()[0]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert r.asDict() == r2.asDict()


def test_entropy_rate_bounds_and_replay(spark):
    """Information-theoretic sanity: 0 <= H(next|cur) <= H(next)
    (conditioning never increases entropy), and the fixed-point sums
    equal a Python replay of the same milli-nat quantization."""
    import math

    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from projet_meteo_etl_spark.catalog import load_table
    from projet_meteo_etl_spark.plans.temporal import (
        ENTROPY_LOG_SCALE,
        transition_entropy_rate,
    )
    from tests.conftest import SF_SMOKE

    r = transition_entropy_rate(spark, SF_SMOKE).collect()[0]
    assert 0 <= r["h_cond_mnat"] <= r["h_marg_mnat"]
    assert 0 <= r["pred_gain_ppm"] <= 1_000_000

    e = load_table(spark, SF_SMOKE, "events").filter(
        F.col("event_type") == "click"
    )
    clicks = e.select(
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
        F.unix_micros("ts").alias("t"),
        "event_id",
    ).filter(F.col("item").isNotNull())
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    trans = [
        (t["prev"], t["item"])
        for t in clicks.select(
            "item", F.lag("item").over(w).alias("prev")
        ).collect()
        if t["prev"] is not None and t["prev"] != t["item"]
    ]
    pair, src_tot, dst_tot = {}, {}, {}
    for s_, d_ in trans:
        pair[(s_, d_)] = pair.get((s_, d_), 0) + 1
    for (s_, d_), c in pair.items():
        src_tot[s_] = src_tot.get(s_, 0) + c
        dst_tot[d_] = dst_tot.get(d_, 0) + c
    n = sum(pair.values())
    L = lambda x: math.floor(ENTROPY_LOG_SCALE * math.log(float(x)))
    l6 = L(1_000_000)
    h_num = sum(
        c * (l6 - L(c * 1_000_000 // src_tot[s_]))
        for (s_, d_), c in pair.items()
    )
    m_num = sum(c * (l6 - L(c * 1_000_000 // n)) for c in dst_tot.values())
    assert r["n_transitions"] == n
    assert r["h_cond_mnat"] == h_num // n
    assert r["h_marg_mnat"] == m_num // n
