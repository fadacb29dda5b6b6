"""Adversarial-fixture cross-engine check: stage a PATHOLOGICAL
documents/embeddings pair (empty/whitespace/single-token/oversized-word/
unicode/identical-dup/zero-vector rows — shapes tie_fuzz's row SUBSETS of
the well-formed fixture can never produce) and run the same
Spark-vs-DuckDB comparison as ``tools/oracle_check.py`` over every
registered query that reads only those two tables.

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

    import __spark_entry__ as entrymod
    from oracle_check import canon_rows, type_mismatches
    from projet_meteo_etl_spark.session import get_spark

    spark = get_spark("adversarial-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("documents", "embeddings", "events"):
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
