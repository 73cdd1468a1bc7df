"""Generate a scaled synthetic dataset matching the driver testdata's
schema and distributions (TESTDATA.md), for LOCAL perf measurement only.

The driver's own measurement may run at a larger driver-generated scale
factor (BENCH_r05.json recorded sf=1.0); /root/testdata holds only
sf{0.001,0.01,0.1} and is read-only. This script extrapolates the observed
sf0.1 distributions (vocab of 30 uniform words + a rare planted-near-dup
marker word, words/doc ~ U(10,100), 20 sources, 5 langs, unit-norm random
64-d embeddings with 10 labels, TPC-H-ish star schema with ~4 lineitems
per order) so that optimizations can be validated at the driver's larger
scale before the round ends. Output layout mirrors the driver's: ONE
parquet file per table, single row group.

Usage: python tools/gen_scaled_sf.py [sf=1.0] [outdir=/root/benchdata/sf1.0]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "de", "es", "fr"]
LANG_P = [0.41, 0.15, 0.14, 0.15, 0.15]


def gen_documents(rng, n, outdir):
    texts = []
    langs = rng.choice(len(LANGS), size=n, p=LANG_P)
    vocab = np.array(VOCAB)
    n_words = rng.integers(10, 101, size=n)
    for i in range(n):
        words = vocab[rng.integers(0, len(vocab), size=n_words[i])]
        texts.append(" ".join(words))
    # plant ~5% near-dups: copy an earlier doc, insert the marker word
    n_dup = n // 20
    dup_targets = rng.choice(np.arange(n // 10, n), size=n_dup, replace=False)
    for t in dup_targets:
        src = int(rng.integers(0, t))
        ws = texts[src].split(" ")
        pos = int(rng.integers(max(1, len(ws) - 10), len(ws)))
        ws.insert(pos, "dup")
        texts[t] = " ".join(ws)
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([LANGS[i] for i in langs], pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(outdir, "documents.parquet"),
                   row_group_size=max(n, 1))


def gen_embeddings(rng, n, outdir):
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    emb = pa.FixedSizeListArray.from_arrays(
        pa.array(v.ravel(), pa.float32()), 64).cast(pa.list_(pa.float32()))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": emb,
        "label": pa.array(rng.integers(0, 10, size=n), pa.int32()),
    })
    pq.write_table(tbl, os.path.join(outdir, "embeddings.parquet"),
                   row_group_size=max(n, 1))


def gen_events(rng, n, n_users, outdir):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.timedelta64(30 * 86400 * 10**6, "us")
    ts = base + (rng.random(n) * span.astype(np.int64)).astype(
        "timedelta64[us]")
    ts.sort()
    etypes = np.array(["signup", "click", "error", "view", "purchase"])
    vals = np.minimum(rng.exponential(50.0, size=n), 560.0).round(2)
    ks = rng.integers(0, 100, size=n)
    props = np.char.add(np.char.add('{"k": ', ks.astype(str)), "}")
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
        "event_type": pa.array(etypes[rng.integers(0, 5, size=n)]),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array(props.tolist(), pa.string()),
    })
    pq.write_table(tbl, os.path.join(outdir, "events.parquet"),
                   row_group_size=max(n, 1))


def gen_tpch(rng, sf, outdir):
    n_orders = int(1500000 * sf)
    n_cust = int(150000 * sf)
    n_part = int(200000 * sf)
    n_supp = int(10000 * sf)
    # orders
    base = np.datetime64("1995-01-01", "us")
    odate = base + (rng.integers(0, 2400, size=n_orders)
                    * np.timedelta64(86400 * 10**6, "us"))
    statuses = np.array(["O", "P", "F"])
    prios = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                      "5-LOW"])
    pq.write_table(pa.table({
        "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, size=n_orders),
                              pa.int64()),
        "o_orderstatus": pa.array(statuses[rng.integers(0, 3, n_orders)]),
        "o_totalprice": pa.array(
            (rng.random(n_orders) * 499000 + 1000).round(2), pa.float64()),
        "o_orderdate": pa.array(odate),
        "o_orderpriority": pa.array(prios[rng.integers(0, 5, n_orders)]),
    }), os.path.join(outdir, "orders.parquet"))
    # lineitem: ~4 lines/order, total ~6M*sf
    n_li = int(6000000 * sf)
    lok = rng.integers(0, n_orders, size=n_li)
    lok.sort()
    # linenumber: sequence within order
    ln = np.ones(n_li, dtype=np.int64)
    same = np.zeros(n_li, dtype=bool)
    same[1:] = lok[1:] == lok[:-1]
    # run-length cumsum per order
    idx = np.arange(n_li)
    starts = np.where(~same, idx, 0)
    np.maximum.accumulate(starts, out=starts)
    ln = idx - starts + 1
    sdate = (odate[lok] + (rng.integers(1, 95, size=n_li)
                           * np.timedelta64(86400 * 10**6, "us")))
    rf = np.array(["A", "N", "R"])
    ls = np.array(["O", "F"])
    pq.write_table(pa.table({
        "l_orderkey": pa.array(lok, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, size=n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, size=n_li), pa.int64()),
        "l_linenumber": pa.array(np.minimum(ln, 17).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 51, size=n_li).astype(float)),
        "l_extendedprice": pa.array(
            (rng.random(n_li) * 104099 + 900).round(2), pa.float64()),
        "l_discount": pa.array(rng.integers(0, 11, n_li) / 100.0),
        "l_tax": pa.array(rng.integers(0, 9, n_li) / 100.0),
        "l_returnflag": pa.array(rf[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(ls[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(sdate),
    }), os.path.join(outdir, "lineitem.parquet"))
    # customer / part / supplier / nation / region
    segs = np.array(["MACHINERY", "BUILDING", "HOUSEHOLD", "AUTOMOBILE",
                     "FURNITURE"])
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": pa.array((rng.random(n_cust) * 11000 - 1000).round(2)),
        "c_mktsegment": pa.array(segs[rng.integers(0, 5, n_cust)]),
    }), os.path.join(outdir, "customer.parquet"))
    adjs = ["large", "hot", "blue", "red", "green", "small", "dim",
            "bright"]
    nouns = ["ring", "bolt", "nut", "cog", "gear", "pin", "rod", "cap"]
    types = np.array(["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO",
                      "MEDIUM"])
    pq.write_table(pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([
            f"{adjs[int(a)]} {nouns[int(b)]}" for a, b in zip(
                rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))]),
        "p_brand": pa.array([
            f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)]),
        "p_type": pa.array(types[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": pa.array(
            (rng.random(n_part) * 99.9 + 900).round(2)),
    }), os.path.join(outdir, "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": pa.array((rng.random(n_supp) * 11000 - 1000).round(2)),
    }), os.path.join(outdir, "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array(np.arange(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array(np.arange(25) % 5, pa.int32()),
    }), os.path.join(outdir, "nation.parquet"))
    pq.write_table(pa.table({
        "r_regionkey": pa.array(np.arange(5), pa.int32()),
        "r_name": pa.array(["AFRICA", "AMERICA", "ASIA", "EUROPE",
                            "MIDDLE EAST"]),
    }), os.path.join(outdir, "region.parquet"))


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    outdir = sys.argv[2] if len(sys.argv) > 2 else f"/root/benchdata/sf{sf}"
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(42)
    gen_documents(rng, int(50000 * sf), outdir)
    gen_embeddings(rng, int(20000 * sf), outdir)
    gen_events(rng, int(1000000 * sf), int(15000 * sf), outdir)
    gen_tpch(rng, sf, outdir)
    open(os.path.join(outdir, "_DONE"), "w").close()
    print("wrote", outdir)


if __name__ == "__main__":
    main()
