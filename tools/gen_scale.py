"""Rebuild a driver-shaped synthetic scale factor for TIMING ONLY.

The driver generates /root/testdata/sf* deterministically (seed 42) and,
for round-5/6 measurement, left an sf1.0 set on disk that did not survive
a sandbox reboot. This tool regenerates a *statistically matched* set —
same tables, schemas, vocabularies, duplicate-document structure, key
ranges and row-count scaling observed in the surviving sf0.01/sf0.1 data —
so large-scale timing remains reproducible. It is NOT the driver's data:
row values differ, so it must never be used for correctness oracles, only
for relative performance measurements (bench_extra-style evidence).

Usage: python tools/gen_scale.py SF OUTDIR   (e.g. 1.0 /root/scaledata/sf1.0)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
ETYPES = ["view", "click", "purchase", "signup", "error"]
ADJ = ["large", "hot", "small", "cold", "dim", "light", "dark", "new"]
NOUN = ["ring", "bolt", "gear", "tube", "cap", "disk", "rod", "pin"]
PTYPES = ["LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM", "PROMO"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def write(outdir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def gen(sf: float, outdir: str, seed: int = 20260822) -> None:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)

    n_li = int(6_000_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_cust = int(150_000 * sf)
    n_part = int(200_000 * sf)
    n_supp = int(10_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    # embeddings scale sub-linearly in the driver data: 500@0.01, 2000@0.1
    n_emb = int(round(500 * (sf / 0.01) ** 0.602))

    write(outdir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int64()),
        "r_name": REGIONS,
    }))
    write(outdir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int64()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    write(outdir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": pa.array(np.array(
            ["MACHINERY", "BUILDING", "FURNITURE", "HOUSEHOLD", "AUTOMOBILE"]
        )[rng.integers(0, 5, n_cust)]),
    }))
    write(outdir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))
    pnames = np.array([f"{a} {n}" for a in ADJ for n in NOUN])
    write(outdir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array(pnames[rng.integers(0, len(pnames), n_part)]),
        "p_brand": pa.array(np.array([f"Brand#{i}" for i in range(25)])[
            rng.integers(0, 25, n_part)]),
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 1000, n_part), 2),
    }))

    base = np.datetime64("1995-01-01")
    write(outdir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[
            rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": pa.array(
            base + rng.integers(0, 2400, n_ord).astype("timedelta64[D]"),
            pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array([
            "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
        ])[rng.integers(0, 5, n_ord)]),
    }))

    write(outdir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[
            rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[
            rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(
            base + rng.integers(0, 2500, n_li).astype("timedelta64[D]"),
            pa.timestamp("us")),
    }))

    ev_base = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 86400 * 1_000_000
    ts = np.sort(rng.integers(0, span_us, n_ev)).astype("timedelta64[us]")
    write(outdir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ev_base + ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(np.minimum(rng.exponential(50.0, n_ev), 600.0), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
    }))

    # documents: 10-100 words from the 30-word vocab; ~5% of docs re-issue
    # an earlier doc's text with " dup" appended (a few exact copies) — the
    # near/exact-duplicate structure the dedup operators exercise.
    words = np.array(VOCAB)
    texts: list[str] = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.05:
            src = texts[int(rng.integers(0, i))]
            texts.append(src if rng.random() < 0.04 else src + " dup")
        else:
            k = int(rng.integers(10, 101))
            texts.append(" ".join(words[rng.integers(0, len(words), k)]))
    write(outdir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)]),
        "source": pa.array([f"src{i % 20}" for i in range(n_doc)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    emb = rng.standard_normal((n_emb, 64)).astype(np.float32)
    labels = rng.integers(0, 10, n_emb)
    centers = rng.standard_normal((10, 64)).astype(np.float32) * 0.125
    emb += centers[labels] * 4.0
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    write(outdir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array([r for r in emb.tolist()], pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))

    with open(os.path.join(outdir, "_DONE"), "w") as fh:
        fh.write("rebuilt-for-timing\n")


if __name__ == "__main__":
    gen(float(sys.argv[1]), sys.argv[2])
