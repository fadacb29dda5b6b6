"""Generate the sf1.0 HEAVY-TIER validation fixture (round-12 verdict
item 3): ~10x sf0.1 in BOTH row count and entity-key cardinality.

All prior 100x scale evidence is in-plan replication, which multiplies
row counts but NOT distinct keys — stages that scale with keys
(shuffle width, state size, band-key fanout, vocabulary growth) are
systematically under-probed by replication.  This fixture scales the
actual key spaces: 150k customers, 15k streaming users, 1.5M orders /
6M lineitems, 200k parts, 50k documents, 20k vectors.

Marginal distributions mirror the driver's sf0.1 fixture (measured:
value domains, per-type event shares, 31-word document vocabulary,
props k in 0..99, ts span ~30 days sorted, orderdate 1995-2001);
region/nation are copied verbatim (fixed 5/25-row dimensions).  The
output lives OUTSIDE the repo (default /tmp/spark_graft_sf1/sf1.0) and
is regenerated on demand — only this generator is committed.

Usage:  python tools/gen_sf1.py [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 42

N_CUSTOMER = 150_000
N_SUPPLIER = 10_000
N_PART = 200_000
N_ORDERS = 1_500_000
N_EVENTS = 1_000_000
N_USERS = 15_000
N_DOCS = 50_000
N_VECS = 20_000
DIM = 64

SEGMENTS = ["BUILDING", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window join shuffle stage task "
    "row read write plan cache skew"
).split()
P_TYPES = [
    "STANDARD BRUSHED TIN", "SMALL PLATED COPPER", "LARGE BURNISHED STEEL",
    "ECONOMY ANODIZED BRASS", "PROMO POLISHED NICKEL", "MEDIUM BRUSHED COPPER",
]


def main(out: str) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)

    for t in ("region", "nation"):
        shutil.copy(os.path.join(SRC, f"{t}.parquet"), os.path.join(out, f"{t}.parquet"))

    def write(name, table):
        pq.write_table(table, os.path.join(out, f"{name}.parquet"))
        print(name, table.num_rows)

    k = np.arange(1, N_CUSTOMER + 1)
    write("customer", pa.table({
        "c_custkey": k.astype("int64"),
        "c_name": pa.array([f"Customer#{i:09d}" for i in k]),
        "c_nationkey": rng.integers(0, 25, N_CUSTOMER).astype("int32"),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, N_CUSTOMER), 2),
        "c_mktsegment": pa.array([SEGMENTS[i] for i in rng.integers(0, 5, N_CUSTOMER)]),
    }))

    k = np.arange(1, N_SUPPLIER + 1)
    write("supplier", pa.table({
        "s_suppkey": k.astype("int64"),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in k]),
        "s_nationkey": rng.integers(0, 25, N_SUPPLIER).astype("int32"),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, N_SUPPLIER), 2),
    }))

    k = np.arange(1, N_PART + 1)
    w1 = rng.integers(0, len(VOCAB), N_PART)
    w2 = rng.integers(0, len(VOCAB), N_PART)
    write("part", pa.table({
        "p_partkey": k.astype("int64"),
        "p_name": pa.array([f"{VOCAB[a]} {VOCAB[b]} part" for a, b in zip(w1, w2)]),
        "p_brand": pa.array([f"Brand#{i}{j}" for i, j in zip(rng.integers(1, 6, N_PART), rng.integers(1, 6, N_PART))]),
        "p_type": pa.array([P_TYPES[i] for i in rng.integers(0, len(P_TYPES), N_PART)]),
        "p_size": rng.integers(1, 51, N_PART).astype("int32"),
        "p_retailprice": np.round(rng.uniform(900.0, 999.9, N_PART), 2),
    }))

    ok = np.arange(1, N_ORDERS + 1)
    day_us = 86_400_000_000
    o_date_days = rng.integers(0, 2404, N_ORDERS)  # 1995-01-01 .. 2001-08
    epoch_1995 = np.datetime64("1995-01-01", "us").astype("int64")
    o_orderdate = (epoch_1995 + o_date_days * day_us).astype("datetime64[us]")
    write("orders", pa.table({
        "o_orderkey": ok.astype("int64"),
        "o_custkey": rng.integers(1, N_CUSTOMER + 1, N_ORDERS).astype("int64"),
        "o_orderstatus": pa.array([["F", "O", "P"][i] for i in rng.choice(3, N_ORDERS, p=[0.49, 0.49, 0.02])]),
        "o_totalprice": np.round(rng.uniform(1000.0, 499999.0, N_ORDERS), 2),
        "o_orderdate": pa.array(o_orderdate),
        "o_orderpriority": pa.array([PRIORITIES[i] for i in rng.integers(0, 5, N_ORDERS)]),
    }))

    lines_per = rng.integers(1, 8, N_ORDERS)  # ~4 avg -> ~6M lines
    l_orderkey = np.repeat(ok, lines_per).astype("int64")
    n_li = len(l_orderkey)
    l_linenumber = np.concatenate([np.arange(1, c + 1) for c in lines_per]).astype("int32")
    ship_off = rng.integers(1, 121, n_li)
    l_shipdate = (
        epoch_1995 + (np.repeat(o_date_days, lines_per) + ship_off) * day_us
    ).astype("datetime64[us]")
    write("lineitem", pa.table({
        "l_orderkey": l_orderkey,
        "l_partkey": rng.integers(1, N_PART + 1, n_li).astype("int64"),
        "l_suppkey": rng.integers(1, N_SUPPLIER + 1, n_li).astype("int64"),
        "l_linenumber": l_linenumber,
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(900.68, 104999.91, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array([["A", "N", "R"][i] for i in rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array([["O", "F"][i] for i in rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(l_shipdate),
    }))

    # events: ts MONOTONE in event_id (the streaming staging contract)
    eid = np.arange(N_EVENTS, dtype="int64")
    epoch_2024 = np.datetime64("2024-01-01", "us").astype("int64")
    gaps = rng.integers(1_000_000, 5_200_000, N_EVENTS)  # ~30 days total
    ts = (epoch_2024 + np.cumsum(gaps)).astype("datetime64[us]")
    write("events", pa.table({
        "event_id": eid,
        "ts": pa.array(ts),
        "user_id": rng.integers(0, N_USERS, N_EVENTS).astype("int64"),
        "event_type": pa.array([ETYPES[i] for i in rng.integers(0, 5, N_EVENTS)]),
        "value": np.round(rng.uniform(0.0, 560.0, N_EVENTS), 2),
        "props": pa.array([f'{{"k": {i}}}' for i in rng.integers(0, 100, N_EVENTS)]),
    }))

    # documents: ~50-word texts over the sf0.1 vocabulary (driver-style
    # fixed vocab; Heaps-law key growth at this tier comes from doc/
    # shingle/window cardinality, which scales with rows x length)
    lengths = rng.integers(8, 108, N_DOCS)
    langs = ["en", "de", "zh", "fr", "es"]
    lang_ix = rng.choice(5, N_DOCS, p=[0.41, 0.14, 0.15, 0.15, 0.15])
    texts = [
        " ".join(VOCAB[w] for w in rng.integers(0, len(VOCAB), n))
        for n in lengths
    ]
    write("documents", pa.table({
        "doc_id": np.arange(N_DOCS, dtype="int64"),
        "text": pa.array(texts),
        "lang": pa.array([langs[i] for i in lang_ix]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, N_DOCS)]),
        "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
    }))

    emb = rng.normal(0.0, 0.12, (N_VECS, DIM)).astype("float32")
    write("embeddings", pa.table({
        "vec_id": np.arange(N_VECS, dtype="int64"),
        "embedding": pa.array([v for v in emb.tolist()], type=pa.list_(pa.float32())),
        "label": rng.integers(0, 4, N_VECS).astype("int32"),
    }))
    print("done:", out)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1/sf1.0")
