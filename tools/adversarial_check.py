"""Adversarial-fixture cross-engine check: stage PATHOLOGICAL versions
of ALL ten oracle tables (documents/embeddings/events since round 11;
the seven TPC-H tables since round 12) — empty/whitespace/oversized-word
texts, zero/denormal/duplicate vectors, tied timestamps, referential
holes in both directions, NULL and duplicate dimension names, zero /
negative / sub-cent / $990M measures, 100% discounts, NULL dates —
shapes tie_fuzz's row SUBSETS of the well-formed fixture can never
produce — and run the same Spark-vs-DuckDB comparison as
``tools/oracle_check.py`` over every registered query.

This is the degenerate-input gate: a query that silently diverges
between engines on an empty train split, a word longer than a block, a
doc with no bigrams, or an all-identical batch fails HERE even though
the driver's well-formed fixture never exercises it.

Usage:
    python tools/adversarial_check.py [query ...]
    python tools/adversarial_check.py --all   # every registered query;
        # queries needing tables the fixture lacks auto-SKIP (their
        # Spark plan or oracle references a missing parquet/view)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

#: queries whose only inputs are documents/embeddings — the surface this
#: fixture can exercise.  Streaming and multi-table queries are out of
#: scope here (they have their own staged-fixture tests).
DOC_QUERIES = [
    # round-11 additions
    "unigram_lm_em_step",
    "png_pixel_stats",
    "dedup_minhash_incremental",
    "perplexity_bucket_filter",
    "dedup_embedding_incremental",
    "best_fit_packing",
    "span_corruption_plan",
    # the long-standing documents family most exposed to degenerate text
    "dedup_exact",
    "dedup_minhash_lsh",
    "wordpiece_greedy_segment",
    "bpe_merge_topk",
    "lm_holdout_nll",
    "rocchio_quality_classifier",
    "text_langid",
    "gopher_quality_rules",
]


def _adversarial_docs() -> pa.Table:
    rows = []

    def add(doc_id, text, lang="en", source=None):
        rows.append(
            {
                "doc_id": doc_id,
                "text": text,
                "lang": lang,
                "source": source or f"src{doc_id % 3}",
                "n_chars": len(text),
            }
        )

    add(0, "")  # empty text
    add(1, "   \t \n ")  # whitespace only
    add(2, "solo")  # single token (no bigrams)
    add(3, "a a a a a a a a a a a a a a a a")  # one repeated token
    add(4, "x" * 40)  # single word longer than UNI_BLOCK / WP_MAX_LEN
    add(5, "héllo wörld hällo wörld héllo wörld naïve café")  # unicode
    add(6, "the quick brown fox jumps over the lazy dog again and again")
    # identical near-dup pair straddling the %10 batch boundary
    add(7, "common shingle text shared across batch and corpus alike ok")
    add(10, "common shingle text shared across batch and corpus alike ok")
    # a second dup family with a 1-token edit
    add(8, "another duplicated passage with many overlapping word grams")
    add(20, "another duplicated passage with many overlapping word grams!")
    add(9, "π ≈ 3.14159 and Σ sums — punctuation, em—dash, “quotes” ok")
    # enough plain rows that per-source terciles/k-cuts are non-empty
    for i in range(11, 40):
        if i in (20,):
            continue
        add(i, f"filler row {i} with some shared words table scan row value sort {i % 7}")
    return pa.Table.from_pylist(rows)


def _adversarial_embeddings(dim: int = 64) -> pa.Table:
    """dim must match the real fixture's (64): the PQ/LSH queries bake
    subvector splits and hyperplane tables for that width."""
    rows = []
    for vec_id in range(40):
        if vec_id == 0:
            emb = [0.0] * dim  # zero vector (cosine denominators!)
        elif vec_id == 1:
            emb = [1e-30] * dim  # denormal-ish magnitude
        elif vec_id in (7, 10):
            emb = [float(d % 9 - 4) for d in range(dim)]  # exact dup pair
        else:
            emb = [float((vec_id * 7 + d * 13) % 11 - 5) for d in range(dim)]
        rows.append(
            {
                "vec_id": vec_id,
                "embedding": [float(x) for x in emb],
                "label": vec_id % 4,
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        ),
    )


#: documented input-domain bounds: inputs that wrap an un-widened square
#: ALSO exceed these queries' BIGINT output domain (SS columns are
#: µcents²-scaled), so no int64-schema fix exists; skipped with reason.
XFAIL = {
    "anova_value_by_type": (
        "ssb/ssw_micro are µcents²-scaled BIGINTs: a cents value big "
        "enough to stress the (already-widened) intermediate squares "
        "puts the OUTPUT itself past int64 — input-domain bound, "
        "see BASELINE.md r11"
    ),
}


def _is_missing_table(exc: Exception) -> bool:
    """True only for a genuinely ABSENT input (missing parquet file or
    unregistered view) — NOT for any error whose message happens to
    contain 'does not exist'.  DuckDB binder errors for a misspelled
    column or function also say '... does not exist', and a bare
    substring match would silently count a broken oracle as a SKIP
    instead of a FAIL, weakening the gate.  Patterns are pinned to the
    table/file-level error shapes of both engines:

    - Spark: ``[PATH_NOT_FOUND]``, ``[TABLE_OR_VIEW_NOT_FOUND]``,
      ``unable to infer schema`` (empty staged dir)
    - DuckDB: ``Table with name X does not exist`` (catalog),
      ``No files found that match the pattern`` (read_parquet glob)
    - either: OS-level missing-file text
    """
    m = str(exc)
    return (
        "PATH_NOT_FOUND" in m
        or "TABLE_OR_VIEW_NOT_FOUND" in m
        or "Table with name" in m
        or "Failed to open local file" in m
        or "No such file or directory" in m
        or "No files found" in m
        or "unable to infer schema" in m.lower()
    )


def _adversarial_events() -> pa.Table:
    """Pathological events: exactly tied timestamps across users and
    types (tie-break stress), duplicate (user, ts) rows, value = 0 /
    negative / huge / sub-cent, a single-event user, a user with ALL
    the events (skew), adversarial-but-valid props JSON (missing /
    null / wrong-typed keys — malformed text is out of the column's
    JSON contract), and an every-event-same-type day.  ts stays MONOTONE in event_id — the
    streaming staging asserts require it."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    etypes = ["click", "view", "purchase", "signup", "error"]

    def add(eid, sec, user, etype, value, props='{"k": 1}'):
        rows.append(
            {
                "event_id": eid,
                "ts": base + dt.timedelta(seconds=sec),
                "user_id": user,
                "event_type": etype,
                "value": float(value),
                "props": props,
            }
        )

    eid = 0
    # a burst of EXACTLY tied timestamps (same second) across users
    for u in range(6):
        for t in range(3):
            add(eid, 100, u, etypes[(u + t) % 5], 1.0 + u)
            eid += 1
    # duplicate (user, ts, type) rows with different event_ids
    add(eid, 200, 1, "click", 5.0); eid += 1
    add(eid, 200, 1, "click", 5.0); eid += 1
    # pathological values
    add(eid, 300, 2, "purchase", 0.0); eid += 1
    add(eid, 301, 2, "purchase", -12.34); eid += 1
    add(eid, 302, 2, "purchase", 9.9e8); eid += 1
    add(eid, 303, 2, "purchase", 0.005); eid += 1  # sub-cent
    add(eid, 304, 2, "purchase", 0.015); eid += 1  # half-cent boundary
    # adversarial-but-VALID props (the props column is contractually
    # JSON from upstream ingest; malformed text is out of contract —
    # DuckDB's json functions error on it while Spark's return NULL, a
    # DOCUMENTED engine-contract difference, not a query bug)
    add(eid, 400, 3, "view", 1.0, "{}"); eid += 1          # missing key
    add(eid, 401, 3, "view", 1.0, '{"k": null}'); eid += 1  # null key
    add(eid, 402, 3, "view", 1.0, '{"k": "str"}'); eid += 1  # type surprise
    # numeric-LOOKING strings and non-integral numbers: Spark CAST
    # truncates '12.5'->12 / NULLs '1e3' while DuckDB TRY_CAST rounds
    # '12.5'->13 / parses '1e3'->1000 — the divergence the shared
    # json_long/json_long_sql integer-token guard closes (round 12)
    add(eid, 403, 3, "view", 1.0, '{"k": "12.5"}'); eid += 1
    add(eid, 404, 3, "view", 1.0, '{"k": "1e3"}'); eid += 1
    add(eid, 405, 3, "view", 1.0, '{"k": 12.5}'); eid += 1   # number, not str
    add(eid, 406, 3, "view", 1.0, '{"k": 1e3}'); eid += 1    # sci number
    add(eid, 407, 3, "view", 1.0, '{"k": "042"}'); eid += 1  # leading zeros
    add(eid, 408, 3, "view", 1.0, '{"k": 9223372036854775808}'); eid += 1  # >int64
    add(eid, 409, 3, "view", 1.0, '{"k": true}'); eid += 1
    add(eid, 410, 3, "view", 1.0, '{"k": [1]}'); eid += 1
    # single-event user
    add(eid, 500, 99, "signup", 1.0); eid += 1
    # heavy-skew user: most of the log
    for i in range(60):
        add(eid, 600 + i * 7, 7, etypes[i % 5], (i % 13) + 0.25)
        eid += 1
    # an all-one-type stretch (degenerate transition matrix rows)
    for i in range(10):
        add(eid, 1200 + i, 11, "view", 2.5)
        eid += 1
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
                ("value", pa.float64()),
                ("props", pa.string()),
            ]
        ),
    )


def _adversarial_tpch() -> dict[str, pa.Table]:
    """Pathological TPC-H micro-tables (round 12): referential holes in
    BOTH directions (customer with no orders / order with no lineitems /
    orphan foreign keys pointing at absent parents), duplicate and
    empty-string and NULL dimension names, all-tied join and order keys,
    zero / negative / sub-cent / $990M measures, 100% discounts, NULL
    measures and NULL dates, and dates far outside the 1992–1998 TPC-H
    window (including pre-epoch).  Primary keys stay UNIQUE — that is
    part of the tables' contract (as-of joins and dedup-by-key queries
    assume it), like events' ts-monotone-in-event_id contract.

    Magnitude bound: measures stay ≤ 9.9e8 (the events fixture's $990M
    precedent) so cent-scaled intermediates fit int64; queries that
    square cent values are DECIMAL(38,0)-widened (round-11 discipline)
    and anything with a genuinely bounded input domain belongs in XFAIL
    with a stated reason, not a bigger fixture value."""
    import datetime as dt

    def d(y, m, dy):
        return dt.datetime(y, m, dy)

    region = pa.Table.from_pylist(
        [
            {"r_regionkey": 0, "r_name": "AMERICA"},
            {"r_regionkey": 1, "r_name": "EUROPE"},
            {"r_regionkey": 2, "r_name": ""},  # empty-string name
            {"r_regionkey": 3, "r_name": None},  # NULL name
            {"r_regionkey": 9, "r_name": "NOWHERE"},  # no nations
        ],
        schema=pa.schema(
            [("r_regionkey", pa.int32()), ("r_name", pa.string())]
        ),
    )
    nation = pa.Table.from_pylist(
        [
            {"n_nationkey": 0, "n_name": "FRANCE", "n_regionkey": 0},
            {"n_nationkey": 1, "n_name": "GERMANY", "n_regionkey": 1},
            # duplicate nation NAME in a different region
            {"n_nationkey": 2, "n_name": "FRANCE", "n_regionkey": 1},
            {"n_nationkey": 3, "n_name": "", "n_regionkey": 2},
            {"n_nationkey": 4, "n_name": None, "n_regionkey": 3},
            # orphan regionkey (no such region)
            {"n_nationkey": 5, "n_name": "ORPHAN", "n_regionkey": 42},
        ],
        schema=pa.schema(
            [
                ("n_nationkey", pa.int32()),
                ("n_name", pa.string()),
                ("n_regionkey", pa.int32()),
            ]
        ),
    )
    segs = ["BUILDING", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "FURNITURE"]
    customers = [
        # no orders at all
        {"c_custkey": 0, "c_name": "Customer#0", "c_nationkey": 0,
         "c_acctbal": 0.0, "c_mktsegment": "BUILDING"},
        # heavy customer: most of the order file
        {"c_custkey": 1, "c_name": "Customer#1", "c_nationkey": 1,
         "c_acctbal": -999.99, "c_mktsegment": "MACHINERY"},
        # exact acctbal TIE pair on a sub-cent half boundary
        {"c_custkey": 2, "c_name": "Customer#same", "c_nationkey": 2,
         "c_acctbal": 100.005, "c_mktsegment": None},
        {"c_custkey": 3, "c_name": "Customer#same", "c_nationkey": 2,
         "c_acctbal": 100.005, "c_mktsegment": ""},
        # orphan nationkey + $990M balance
        {"c_custkey": 4, "c_name": None, "c_nationkey": 99,
         "c_acctbal": 9.9e8, "c_mktsegment": "AUTOMOBILE"},
    ] + [
        {"c_custkey": k, "c_name": f"Customer#{k}",
         "c_nationkey": k % 5, "c_acctbal": float(k * 7 % 13) - 6.0,
         "c_mktsegment": segs[k % 5]}
        for k in range(5, 12)
    ]
    customer = pa.Table.from_pylist(
        customers,
        schema=pa.schema(
            [
                ("c_custkey", pa.int64()),
                ("c_name", pa.string()),
                ("c_nationkey", pa.int32()),
                ("c_acctbal", pa.float64()),
                ("c_mktsegment", pa.string()),
            ]
        ),
    )
    supplier = pa.Table.from_pylist(
        [
            # no lineitems
            {"s_suppkey": 0, "s_name": "Supplier#0", "s_nationkey": 0,
             "s_acctbal": 0.0},
            # negative-balance exact tie pair
            {"s_suppkey": 1, "s_name": "Supplier#tie", "s_nationkey": 1,
             "s_acctbal": -42.425},
            {"s_suppkey": 2, "s_name": "Supplier#tie", "s_nationkey": 2,
             "s_acctbal": -42.425},
            # orphan nationkey
            {"s_suppkey": 3, "s_name": None, "s_nationkey": 77,
             "s_acctbal": 9.9e8},
            {"s_suppkey": 4, "s_name": "Supplier#4", "s_nationkey": 4,
             "s_acctbal": 0.005},
            {"s_suppkey": 5, "s_name": "Supplier#5", "s_nationkey": 5,
             "s_acctbal": 17.5},
        ],
        schema=pa.schema(
            [
                ("s_suppkey", pa.int64()),
                ("s_name", pa.string()),
                ("s_nationkey", pa.int32()),
                ("s_acctbal", pa.float64()),
            ]
        ),
    )
    part = pa.Table.from_pylist(
        [
            # never ordered
            {"p_partkey": 0, "p_name": "ghost part", "p_brand": "Brand#0",
             "p_type": "STANDARD BRUSHED TIN", "p_size": 1,
             "p_retailprice": 901.0},
            # duplicate p_name pair
            {"p_partkey": 1, "p_name": "twin widget", "p_brand": "Brand#1",
             "p_type": "SMALL PLATED COPPER", "p_size": 5,
             "p_retailprice": 100.005},
            {"p_partkey": 2, "p_name": "twin widget", "p_brand": "Brand#2",
             "p_type": "SMALL PLATED COPPER", "p_size": 5,
             "p_retailprice": 100.005},
            {"p_partkey": 3, "p_name": "free part", "p_brand": "Brand#3",
             "p_type": None, "p_size": 0, "p_retailprice": 0.0},
            {"p_partkey": 4, "p_name": None, "p_brand": None,
             "p_type": "LARGE BURNISHED STEEL", "p_size": 50,
             "p_retailprice": 0.005},
            {"p_partkey": 5, "p_name": "bulk part", "p_brand": "Brand#5",
             "p_type": "ECONOMY ANODIZED BRASS", "p_size": 50,
             "p_retailprice": 9.9e8},
            {"p_partkey": 6, "p_name": "refund part", "p_brand": "Brand#1",
             "p_type": "PROMO POLISHED NICKEL", "p_size": 13,
             "p_retailprice": -5.0},
            {"p_partkey": 7, "p_name": "plain part", "p_brand": "Brand#2",
             "p_type": "MEDIUM BRUSHED COPPER", "p_size": 23,
             "p_retailprice": 55.55},
        ],
        schema=pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("p_name", pa.string()),
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int32()),
                ("p_retailprice", pa.float64()),
            ]
        ),
    )
    tied_date = d(1995, 6, 15)
    orders_rows = [
        # order with NO lineitems
        {"o_orderkey": 100, "o_custkey": 1, "o_orderstatus": "O",
         "o_totalprice": 0.0, "o_orderdate": tied_date,
         "o_orderpriority": "1-URGENT"},
        # orphan custkey
        {"o_orderkey": 101, "o_custkey": 999, "o_orderstatus": "F",
         "o_totalprice": -12.34, "o_orderdate": tied_date,
         "o_orderpriority": "5-LOW"},
        # NULL orderdate + NULL priority
        {"o_orderkey": 102, "o_custkey": 2, "o_orderstatus": "F",
         "o_totalprice": 9.9e8, "o_orderdate": None,
         "o_orderpriority": None},
        # pre-epoch and far-future dates
        {"o_orderkey": 103, "o_custkey": 3, "o_orderstatus": "P",
         "o_totalprice": 0.005, "o_orderdate": d(1960, 1, 1),
         "o_orderpriority": "2-HIGH"},
        {"o_orderkey": 104, "o_custkey": 4, "o_orderstatus": "O",
         "o_totalprice": 0.015, "o_orderdate": d(2099, 12, 31),
         "o_orderpriority": "3-MEDIUM"},
    ] + [
        # the heavy customer: a tied-date stretch, all same status
        {"o_orderkey": 200 + i, "o_custkey": 1, "o_orderstatus": "F",
         "o_totalprice": float(i * 11 % 7) * 100.0 + 0.005,
         "o_orderdate": tied_date if i < 6 else d(1997, 3, 1 + i),
         "o_orderpriority": ["1-URGENT", "4-NOT SPECIFIED"][i % 2]}
        for i in range(10)
    ] + [
        {"o_orderkey": 300 + i, "o_custkey": 5 + (i % 7),
         "o_orderstatus": "O", "o_totalprice": 1000.0 + i,
         "o_orderdate": d(1996, 1 + i % 12, 1 + i % 28),
         "o_orderpriority": "3-MEDIUM"}
        for i in range(8)
    ]
    orders = pa.Table.from_pylist(
        orders_rows,
        schema=pa.schema(
            [
                ("o_orderkey", pa.int64()),
                ("o_custkey", pa.int64()),
                ("o_orderstatus", pa.string()),
                ("o_totalprice", pa.float64()),
                ("o_orderdate", pa.timestamp("us")),
                ("o_orderpriority", pa.string()),
            ]
        ),
    )
    li_rows = []

    def li(ok, ln, pk, sk, qty, price, disc, tax, rf, ls, ship):
        li_rows.append(
            {"l_orderkey": ok, "l_partkey": pk, "l_suppkey": sk,
             "l_linenumber": ln, "l_quantity": qty,
             "l_extendedprice": price, "l_discount": disc, "l_tax": tax,
             "l_returnflag": rf, "l_linestatus": ls, "l_shipdate": ship}
        )

    # orphan orderkey (no such order)
    li(999, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", tied_date)
    # zero / negative / huge / sub-cent quantities and prices
    li(201, 1, 1, 1, 0.0, 0.0, 0.0, 0.0, "A", "F", tied_date)
    li(201, 2, 2, 2, -3.0, -99.99, 0.0, 0.08, "R", "F", tied_date)
    # 9.9e5, not 9.9e8: lineitem price is SQUARED by the profiler's
    # exact power sums (x^4 in cents^4, documented domain <= 1e7 cents,
    # profiling.py) and by the stump split's mean^2-scaled score
    # (documented "~TPC-H price domain", feature_eng.py) — 9.9e5 is
    # still ~9x past the real TPC-H price ceiling while every
    # documented intermediate stays in DECIMAL38/HUGEINT.  The $990M
    # stress rows live on o_totalprice / acctbal, which nothing squares.
    li(201, 3, 5, 1, 50.0, 9.9e5, 0.05, 0.08, "A", "F", tied_date)
    li(201, 4, 4, 4, 1.0, 0.005, 0.0, 0.0, "N", "F", tied_date)
    # 100% and 50% discounts; NULL discount and NULL tax
    li(202, 1, 1, 1, 7.0, 700.0, 1.0, 0.0, "A", "F", tied_date)
    li(202, 2, 2, 2, 7.0, 700.0, 0.5, 0.04, "A", "F", tied_date)
    li(202, 3, 7, 5, 7.0, 700.0, None, None, "A", "F", tied_date)
    # NULL shipdate + pre-epoch shipdate
    li(203, 1, 1, 1, 2.0, 20.0, 0.1, 0.02, "R", "O", None)
    li(203, 2, 2, 2, 2.0, 20.0, 0.1, 0.02, "R", "O", d(1960, 1, 1))
    # NULL measures
    li(204, 1, 5, 1, None, 100.0, 0.0, 0.0, "N", "O", tied_date)
    li(204, 2, 6, 2, 3.0, None, 0.0, 0.0, "N", "O", tied_date)
    # an all-tied stretch: same part+supp+price across orders (join fanout)
    for i in range(12):
        li(205 + (i % 5), 3 + i // 5, 7, 5, 5.0, 555.55, 0.25, 0.06,
           "N", "O", tied_date)
    # plain rows over the later orders
    for i in range(8):
        li(300 + i, 1 + (i * 3) % 4, 1 + i % 8, 1 + i % 6,
           float(1 + i % 9), 100.0 + 7.0 * i, 0.01 * (i % 5),
           0.01 * (i % 3), ["N", "R", "A"][i % 3], ["O", "F"][i % 2],
           d(1996, 1 + i % 12, 3 + i))
    lineitem = pa.Table.from_pylist(
        li_rows,
        schema=pa.schema(
            [
                ("l_orderkey", pa.int64()),
                ("l_partkey", pa.int64()),
                ("l_suppkey", pa.int64()),
                ("l_linenumber", pa.int32()),
                ("l_quantity", pa.float64()),
                ("l_extendedprice", pa.float64()),
                ("l_discount", pa.float64()),
                ("l_tax", pa.float64()),
                ("l_returnflag", pa.string()),
                ("l_linestatus", pa.string()),
                ("l_shipdate", pa.timestamp("us")),
            ]
        ),
    )
    return {
        "region": region,
        "nation": nation,
        "customer": customer,
        "supplier": supplier,
        "part": part,
        "orders": orders,
        "lineitem": lineitem,
    }


def main() -> int:
    run_all = "--all" in sys.argv[1:]
    only = set(a for a in sys.argv[1:] if a != "--all")
    sf_dir = tempfile.mkdtemp(prefix="spark_graft_adversarial_")
    pq.write_table(_adversarial_docs(), os.path.join(sf_dir, "documents.parquet"))
    pq.write_table(
        _adversarial_embeddings(), os.path.join(sf_dir, "embeddings.parquet")
    )
    pq.write_table(
        _adversarial_events(), os.path.join(sf_dir, "events.parquet")
    )
    for tname, tbl in _adversarial_tpch().items():
        pq.write_table(tbl, os.path.join(sf_dir, tname + ".parquet"))

    import __spark_entry__ as entrymod
    from oracle_check import canon_rows, type_mismatches
    from projet_meteo_etl_spark.session import get_spark

    spark = get_spark("adversarial-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "documents",
        "embeddings",
        "events",
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(qs) if (run_all or only) else DOC_QUERIES
    failures = n_ok = n_skip = 0
    for name in names:
        if only and name not in only:
            continue
        if name not in qs:
            print(f"SKIP  {name}: not registered")
            continue
        if name in XFAIL and run_all:
            print(f"XFAIL {name}: {XFAIL[name]}")
            n_skip += 1
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            scols = sdf.columns
            sdtypes = [t for _, t in sdf.dtypes]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            if run_all and _is_missing_table(exc):
                n_skip += 1
                continue
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            n_skip += 1
            continue
        try:
            rel = con.sql(sql)
            dcols = list(rel.columns)
            ddtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            if run_all and _is_missing_table(exc):
                n_skip += 1
                continue
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duckdb={sorted(dcols)}")
        else:
            tdiffs = type_mismatches(scols, sdtypes, dcols, ddtypes)
            if tdiffs:
                problems.append(f"types differ: {tdiffs}")
        if not problems:
            a, b = canon_rows(scols, srows), canon_rows(dcols, drows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures += 1
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.time() - t0:.1f}s]")
            n_ok += 1
    verdict = "ALL OK" if failures == 0 else f"{failures} FAILURES"
    print(
        f"\n{verdict} — {n_ok} ok / {failures} fail / {n_skip} skipped "
        "(adversarial fixture)"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
