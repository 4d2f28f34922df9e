"""Generate driver-compatible synthetic testdata at an arbitrary scale factor.

The driver ships sf0.001/sf0.01/sf0.1 (TESTDATA.md, read-only). The r5-r7
VERDICTs demand a scale rehearsal ABOVE sf0.1 — "plans you'd want at 100x"
must be demonstrated from measured scaling ratios, not argued from plan
shapes. This generator reproduces the driver tables' schemas and
distributions (calibrated against sf0.1 with DuckDB: schemas, value ranges,
quantiles, parquet physical types — see SCALE.md "sf1 rehearsal") so
`bench.py` runs unchanged at sf1 via SPARK_GRAFT_SF_DIR.

Row counts scale linearly in sf (matching sf0.1 = 10% of these):
  customer 150k*sf, supplier 10k*sf, part 200k*sf, orders 1.5M*sf,
  lineitem ~4.07/order, events 1M*sf (15k*sf users), documents 50k*sf,
  embeddings 20k*sf.

Usage:  python tools/gen_testdata.py SF OUT_DIR   (e.g. 1.0 .localdata/sf1)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42

DOC_VOCAB = (
    "a agg batch big column customer data dup fast filter group hash join "
    "key line merge order part query row scan slow small sort spark stream "
    "table the value vector window"
).split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_W = [0.41, 0.15, 0.15, 0.15, 0.14]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    path = os.path.join(out_dir, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"  {name}: {table.num_rows} rows -> {path}")


def _days(rng: np.random.RandomState, n: int, start: str, n_days: int):
    base = np.datetime64(start)
    return (base + rng.randint(0, n_days, n).astype("timedelta64[D]")).astype(
        "datetime64[us]"
    )


def generate(sf: float, out_dir: str) -> None:
    rng = np.random.RandomState(SEED)
    os.makedirs(out_dir, exist_ok=True)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    n_cust = int(150_000 * sf)
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
        "c_mktsegment": np.array(SEGMENTS)[rng.randint(0, 5, n_cust)],
    }))

    n_supp = int(10_000 * sf)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.randint(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2),
    }))

    n_part = int(200_000 * sf)
    adj = np.array(P_ADJ)[rng.randint(0, 8, n_part)]
    noun = np.array(P_NOUN)[rng.randint(0, 8, n_part)]
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"{a} {b}" for a, b in zip(adj, noun)],
        "p_brand": [f"Brand#{i}" for i in rng.randint(0, 25, n_part)],
        "p_type": np.array(P_TYPES)[rng.randint(0, 6, n_part)],
        "p_size": pa.array(rng.randint(1, 51, n_part), pa.int32()),
        # exact sf0.1 rule: 900 + (partkey % 1000) / 10
        "p_retailprice": 900.0 + (np.arange(n_part) % 1000) * 0.1,
    }))

    n_ord = int(1_500_000 * sf)
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.randint(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": np.array(["F", "O", "P"])[rng.randint(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 500000, n_ord), 2),
        "o_orderdate": _days(rng, n_ord, "1995-01-01", 2405),
        "o_orderpriority": np.array(PRIORITIES)[rng.randint(0, 5, n_ord)],
    }))

    per_order = np.maximum(1, rng.poisson(4.0, n_ord))  # avg ~4.07/order
    l_orderkey = np.repeat(np.arange(n_ord), per_order)
    n_li = len(l_orderkey)
    linenumber = (
        np.arange(n_li) - np.repeat(np.cumsum(per_order) - per_order, per_order) + 1
    )
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.randint(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.randint(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(linenumber, pa.int32()),
        "l_quantity": rng.randint(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.10, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": np.array(["A", "N", "R"])[rng.randint(0, 3, n_li)],
        "l_linestatus": np.array(["F", "O"])[rng.randint(0, 2, n_li)],
        "l_shipdate": _days(rng, n_li, "1995-01-02", 2498),
    }))

    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    span_us = 30 * 86_400 * 10**6
    ts = np.sort(rng.randint(0, span_us, n_ev).astype("int64"))
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(
            np.datetime64("2024-01-01") + ts.astype("timedelta64[us]"),
            pa.timestamp("us"),
        ),
        "user_id": pa.array(rng.randint(0, n_users, n_ev), pa.int64()),
        "event_type": np.array(EVENT_TYPES)[rng.randint(0, 5, n_ev)],
        "value": np.round(rng.exponential(50.0, n_ev), 2),
        "props": [json.dumps({"k": int(k)}) for k in rng.randint(0, 100, n_ev)],
    }))

    # Documents: i.i.d. word soup PLUS planted duplicate clusters mirroring
    # the driver's sf0.1 rates (r8 VERDICT #2: the old all-i.i.d. generator
    # yielded 0 near-dup pairs at sf1, so the dedup verify/pair-emission path
    # was dead code in the scale rehearsal). Measured on driver sf0.1
    # (5000 docs): 237 near-dup copy rows (228 groups: 220 pairs, 7 triples,
    # 1 quad; each copy = source text minus one random word, plus a trailing
    # token) and 8 exact-dup rows; 256 pairs pass ngram-jaccard>=0.8.
    n_doc = int(50_000 * sf)
    n_near = int(round(0.0474 * n_doc))
    n_exact = int(round(0.0016 * n_doc))
    n_base = n_doc - n_near - n_exact
    wc = rng.randint(10, 101, n_base)
    vocab = np.array(DOC_VOCAB)
    texts = [
        " ".join(vocab[rng.randint(0, len(vocab), c)]) for c in wc
    ]
    for src in rng.randint(0, n_base, n_near):
        words = texts[src].split()
        if len(words) > 1:
            del words[rng.randint(0, len(words))]
        texts.append(" ".join(words) + " dup")
    for src in rng.randint(0, n_base, n_exact):
        texts.append(texts[src])
    texts = [texts[i] for i in rng.permutation(n_doc)]
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": np.array(LANGS)[
            rng.choice(len(LANGS), n_doc, p=LANG_W)
        ],
        "source": [f"src{i}" for i in rng.randint(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    n_emb = int(20_000 * sf)
    dim, n_lab = 64, 10
    centers = rng.randn(n_lab, dim) * 0.0088
    labels = rng.randint(0, n_lab, n_emb)
    vecs = (centers[labels] + rng.randn(n_emb, dim) * 0.1245).astype(np.float32)
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_emb), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f".localdata/sf{sys.argv[1]}"
    generate(sf, out)
