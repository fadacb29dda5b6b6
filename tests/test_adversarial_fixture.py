"""Degenerate-input cross-engine gate: the pathological fixture from
tools/adversarial_check.py (empty/whitespace/single-token docs, a word
longer than UNI_BLOCK, unicode, exact dups straddling the incremental
batch split, zero/denormal embedding vectors) run through BOTH engines
for a fast subset of the documents/embeddings queries.  tie_fuzz
subsets the WELL-FORMED fixture, so these shapes are reachable only
here; the full 15-query sweep is `python tools/adversarial_check.py`.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

FAST_SUBSET = [
    "png_pixel_stats",
    "best_fit_packing",
    "span_corruption_plan",
    "lm_holdout_nll",
    "perplexity_bucket_filter",
    "dedup_exact",
]


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    from adversarial_check import _adversarial_docs, _adversarial_embeddings

    d = tmp_path_factory.mktemp("adversarial_sf")
    pq.write_table(_adversarial_docs(), str(d / "documents.parquet"))
    pq.write_table(_adversarial_embeddings(), str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_adversarial_cross_engine(spark, adversarial_dir, name):
    import __spark_entry__ as entrymod
    from oracle_check import canon_rows

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, adversarial_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(adversarial_dir, t + '.parquet')}')"
        )
    rel = con.sql(oracles[name])
    dcols = list(rel.columns)
    drows = rel.fetchall()
    assert len(srows) == len(drows), (name, len(srows), len(drows))
    assert sorted(scols) == sorted(dcols)
    assert canon_rows(scols, srows) == canon_rows(dcols, drows)
