#!/usr/bin/env python
"""Builder-side synthetic data generator for SCALING measurements.

The driver's /root/testdata is read-only and capped at sf0.1; exposing
super-linear (O(n^2)) behavior needs a second, larger anchor. This
generator mimics the driver tables' schemas and value distributions
(same columns, dtypes, value domains — NOT the same rows) and is run at
two scales with the same seed so per-query wall-time ratios compare the
ENGINE, not generator drift:

    python tools/gen_testdata.py 0.1 testdata_local/sfb0.1
    python tools/gen_testdata.py 1   testdata_local/sfb1

Row counts scale linearly from the sf0.1 baseline (lineitem 6M rows at
sf1). Output is one parquet per table, like the driver layout.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data join shuffle stage task codegen plan scan disk memory cache "
    "skew salt bucket broadcast exchange limit topk rank dedup token"
).split()

LANGS = ["en", "de", "zh", "fr", "es"]
EVENT_TYPES = ["signup", "click", "error", "view", "purchase"]
SEGMENTS = ["AUTOMOBILE", "FURNITURE", "BUILDING", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["PROMO", "ECONOMY", "MEDIUM", "LARGE", "STANDARD", "SMALL"]
PNAME_ADJ = ["large", "hot", "blue", "red", "dim", "salty", "green", "small"]
PNAME_NOUN = ["ring", "bolt", "case", "drum", "wheel", "plate", "cap", "rod"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _write(out_dir: str, name: str, cols: dict) -> None:
    table = pa.table(cols)
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def main(sf: float, out_dir: str) -> None:
    rng = np.random.default_rng(4242)
    os.makedirs(out_dir, exist_ok=True)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out_dir, "region", {
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": REGIONS,
    })
    _write(out_dir, "nation", {
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i:02d}" for i in range(25)],
        "n_regionkey": (np.arange(25) % 5).astype(np.int32),
    })
    _write(out_dir, "customer", {
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, n_cust).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
    })
    _write(out_dir, "supplier", {
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, n_supp).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    })
    _write(out_dir, "part", {
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [
            f"{PNAME_ADJ[i % 8]} {PNAME_NOUN[(i // 8) % 8]}"
            for i in range(n_part)
        ],
        "p_brand": [f"Brand#{1 + i % 25}" for i in range(n_part)],
        "p_type": np.array(PTYPES)[rng.integers(0, 6, n_part)],
        "p_size": rng.integers(1, 51, n_part).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    })

    base = np.datetime64("1995-01-01", "us")
    odate = base + (
        rng.integers(0, 2400, n_ord) * np.int64(86_400_000_000)
    ).astype("timedelta64[us]")
    _write(out_dir, "orders", {
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": rng.integers(0, max(n_cust, 1), n_ord),
        "o_orderstatus": np.array(["O", "F", "P"])[
            rng.choice(3, n_ord, p=[0.48, 0.48, 0.04])
        ],
        "o_totalprice": np.round(rng.uniform(1000, 400_000, n_ord), 2),
        "o_orderdate": odate,
        "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
    })

    lines_per = rng.integers(1, 8, n_ord)
    l_order = np.repeat(np.arange(n_ord, dtype=np.int64), lines_per)
    n_li = len(l_order)
    l_num = np.concatenate([np.arange(1, k + 1) for k in lines_per]).astype(
        np.int32
    )
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    price = np.round(rng.uniform(900, 105_000, n_li), 2)
    ship = np.repeat(odate, lines_per) + (
        rng.integers(1, 121, n_li) * np.int64(86_400_000_000)
    ).astype("timedelta64[us]")
    _write(out_dir, "lineitem", {
        "l_orderkey": l_order,
        "l_partkey": rng.integers(0, max(n_part, 1), n_li),
        "l_suppkey": rng.integers(0, max(n_supp, 1), n_li),
        "l_linenumber": l_num,
        "l_quantity": qty,
        "l_extendedprice": price,
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": np.array(["R", "N", "A"])[
            rng.choice(3, n_li, p=[0.25, 0.5, 0.25])
        ],
        "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
        "l_shipdate": ship,
    })

    ebase = np.datetime64("2024-01-01", "us")
    _write(out_dir, "events", {
        "event_id": np.arange(n_evt, dtype=np.int64),
        "ts": ebase + rng.integers(
            0, 30 * 86_400_000_000, n_evt
        ).astype("timedelta64[us]"),
        "user_id": rng.integers(0, max(int(15_000 * sf), 10), n_evt),
        "event_type": np.array(EVENT_TYPES)[
            rng.choice(5, n_evt, p=[0.1, 0.4, 0.05, 0.35, 0.1])
        ],
        "value": np.round(rng.exponential(50, n_evt), 2),
        "props": [f'{{"k": {int(v)}}}' for v in rng.integers(0, 100, n_evt)],
    })

    # documents: random word sequences; ~2% are near-duplicate copies of
    # an earlier doc with a couple of word substitutions (keeps the
    # near-dup candidate density roughly constant across scales)
    vocab = np.array(VOCAB)
    lengths = rng.integers(8, 110, n_doc)
    texts = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.02:
            words = texts[rng.integers(0, i)].split()
            for _ in range(2):
                words[rng.integers(0, len(words))] = vocab[
                    rng.integers(0, len(vocab))
                ]
            texts.append(" ".join(words))
        else:
            texts.append(" ".join(vocab[rng.integers(0, len(vocab), lengths[i])]))
    _write(out_dir, "documents", {
        "doc_id": np.arange(n_doc, dtype=np.int64),
        "text": texts,
        "lang": np.array(LANGS)[rng.integers(0, 5, n_doc)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })

    centers = rng.normal(0, 1, (10, 64))
    labels = rng.integers(0, 10, n_emb).astype(np.int32)
    vecs = centers[labels] + rng.normal(0, 0.3, (n_emb, 64))
    _write(out_dir, "embeddings", {
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": pa.array(
            [row for row in vecs.astype(np.float32)],
            type=pa.list_(pa.float32()),
        ),
        "label": labels,
    })


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2])
