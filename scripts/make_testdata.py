"""Standalone synthetic-fixture generator: builds the TPC-H-ish table
set the tests/examples/bench read (see TESTDATA.md for the canonical
schema). CI and fresh checkouts without a pre-generated corpus run this
first; the shipped /root/testdata is driver-generated and read-only, so
this writes elsewhere (default /tmp/testdata) and NEVER touches it.

Deterministic (seed fixed per table), numpy+pyarrow only, no Spark —
generating 600k lineitem rows takes seconds. Distributions mirror what
the operator surface needs to be exercised meaningfully: zipfian text
with planted near-duplicates and a minority non-English slice (dedup /
langid / quality), clustered embeddings with labels (ANN recall, k-means,
hard negatives), skewed user_ids (as-of join skew path), and TPC-H-style
lineitem/orders for the kernel queries.

Usage:
    python scripts/make_testdata.py [out_root] [sf ...]
    # default: /tmp/testdata sf0.001 sf0.01
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
WORDS = (
    "the of and to in a is that for it as with on be at by this from or "
    "an are not we you they data model table query engine spark stream "
    "join index vector token text batch shuffle plan scan filter merge "
    "count group sort hash cache disk memory node task stage row column"
).split()
# ASCII-only on purpose: several queries interpret text PAYLOAD BYTES
# (byte histogram / waveform / raster resize), and multi-byte UTF-8
# would make DuckDB's codepoint view diverge from the byte view.
LANG_WORDS = {
    "de": "der die das und ist nicht mit ein von zu den".split(),
    "fr": "le la les et est pas avec un de pour dans".split(),
    "es": "el la los y es no con un de para en".split(),
    "zh": "de yi shi bu le ren wo zai you ta zhe wei".split(),
}


def _doc_text(rng: np.random.RandomState, words: list[str], n: int) -> str:
    probs = 1.0 / np.arange(1, len(words) + 1)
    probs /= probs.sum()
    return " ".join(np.asarray(words)[rng.choice(len(words), n, p=probs)])


def make_sf(out_dir: str, sf: float) -> None:
    os.makedirs(out_dir, exist_ok=True)
    n_li = max(int(6_000_000 * sf), 1000)
    n_ord = n_li // 4
    n_cust = max(n_li // 40, 30)
    n_part = max(n_li // 30, 50)
    n_supp = max(n_li // 600, 5)
    n_ev = max(int(1_000_000 * sf), 500)
    n_doc = max(int(500_000 * sf), 200)
    n_emb = max(int(500_000 * sf), 200)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    rng = np.random.RandomState(101)
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i:02d}" for i in range(25)],
        "n_regionkey": pa.array(rng.randint(0, 5, 25), pa.int32()),
    }))
    rng = np.random.RandomState(102)
    _write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(1, n_cust + 1)],
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": np.asarray(
            ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
        )[rng.randint(0, 5, n_cust)],
    }))
    rng = np.random.RandomState(103)
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(1, n_supp + 1), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(1, n_supp + 1)],
        "s_nationkey": pa.array(rng.randint(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    rng = np.random.RandomState(104)
    _write(out_dir, "part", pa.table({
        "p_partkey": pa.array(range(1, n_part + 1), pa.int64()),
        "p_name": [f"part {i} steel {WORDS[i % len(WORDS)]}" for i in range(1, n_part + 1)],
        "p_brand": [f"Brand#{(i % 5) + 1}{(i % 5) + 1}" for i in range(n_part)],
        "p_type": np.asarray(
            ["STANDARD BRUSHED", "SMALL PLATED", "MEDIUM POLISHED",
             "ECONOMY ANODIZED", "PROMO BURNISHED"]
        )[rng.randint(0, 5, n_part)],
        "p_size": pa.array(rng.randint(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900, 2000, n_part), 2),
    }))
    rng = np.random.RandomState(105)
    base = np.datetime64("2024-01-01T00:00:00")
    _write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(1, n_ord + 1), pa.int64()),
        "o_custkey": pa.array(rng.randint(1, n_cust + 1, n_ord), pa.int64()),
        "o_orderstatus": np.asarray(["O", "F", "P"])[rng.randint(0, 3, n_ord)],
        "o_totalprice": np.round(rng.uniform(1000, 400000, n_ord), 2),
        "o_orderdate": pa.array(
            base + rng.randint(0, 365 * 24 * 3600, n_ord).astype("timedelta64[s]"),
            pa.timestamp("us"),
        ),
        "o_orderpriority": np.asarray(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        )[rng.randint(0, 5, n_ord)],
    }))
    rng = np.random.RandomState(106)
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.randint(1, n_ord + 1, n_li), pa.int64()),
        "l_partkey": pa.array(rng.randint(1, n_part + 1, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.randint(1, n_supp + 1, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.randint(1, 8, n_li), pa.int32()),
        "l_quantity": np.round(rng.uniform(1, 50, n_li), 0),
        "l_extendedprice": np.round(rng.uniform(900, 100000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_tax": np.round(rng.uniform(0, 0.08, n_li), 2),
        "l_returnflag": np.asarray(["R", "A", "N"])[rng.randint(0, 3, n_li)],
        "l_linestatus": np.asarray(["O", "F"])[rng.randint(0, 2, n_li)],
        "l_shipdate": pa.array(
            base + rng.randint(0, 365 * 24 * 3600, n_li).astype("timedelta64[s]"),
            pa.timestamp("us"),
        ),
    }))
    # events: zipf-skewed users (exercises the as-of auto skew path)
    rng = np.random.RandomState(107)
    users = np.minimum(rng.zipf(1.5, n_ev), n_ev // 10 + 10).astype(np.int64)
    # unique timestamps (second draw + event_id microseconds): equal-ts
    # rows would make as-of tie-breaks engine-defined on both sides
    ev_ts = (
        base
        + rng.randint(0, 7 * 24 * 3600, n_ev).astype("timedelta64[s]")
        + np.arange(1, n_ev + 1).astype("timedelta64[us]")
    )
    _write(out_dir, "events", pa.table({
        "event_id": pa.array(range(1, n_ev + 1), pa.int64()),
        "ts": pa.array(ev_ts, pa.timestamp("us")),
        "user_id": users,
        "event_type": np.asarray(
            ["click", "view", "purchase", "error", "signup"]
        )[rng.randint(0, 5, n_ev)],
        # full doubles, never pre-rounded: rounding to 3dp plants .xx5
        # values whose 2dp re-round is half-up vs float-repr dependent
        "value": rng.exponential(10.0, n_ev),
        "props": [json.dumps({"k": int(k)}) for k in rng.randint(0, 100, n_ev)],
    }))
    # documents: zipfian english + minority non-english + planted near-dups
    rng = np.random.RandomState(108)
    texts, langs = [], []
    for i in range(n_doc):
        r = rng.rand()
        if r < 0.12 and i > 0:            # near-duplicate of a prior doc
            j = rng.randint(0, i)
            t = texts[j]
            toks = t.split()
            if toks:
                toks[rng.randint(0, len(toks))] = WORDS[rng.randint(0, len(WORDS))]
            texts.append(" ".join(toks))
            langs.append(langs[j])
        elif r < 0.25:                    # non-english slice
            lg = ["de", "fr", "es", "zh"][rng.randint(0, 4)]
            texts.append(_doc_text(rng, LANG_WORDS[lg], rng.randint(20, 120)))
            langs.append(lg)
        else:
            texts.append(_doc_text(rng, WORDS, rng.randint(20, 200)))
            langs.append("en")
    _write(out_dir, "documents", pa.table({
        "doc_id": pa.array(range(1, n_doc + 1), pa.int64()),
        "text": texts,
        "lang": langs,
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))
    # embeddings: 10 labelled Gaussian clusters in 64-d + planted near-dups
    rng = np.random.RandomState(109)
    centers = rng.standard_normal((10, 64))
    lab = rng.randint(0, 10, n_emb)
    X = centers[lab] + 0.2 * rng.standard_normal((n_emb, 64))
    # 25% label noise: guarantees every neighborhood contains
    # other-label rows (the hard-negative ground truth needs them)
    noisy = rng.rand(n_emb) < 0.25
    lab[noisy] = rng.randint(0, 10, int(noisy.sum()))
    dup = rng.rand(n_emb) < 0.05
    src = rng.randint(0, n_emb, n_emb)
    X[dup] = X[src[dup]] + 0.005 * rng.standard_normal((int(dup.sum()), 64))
    lab[dup] = lab[src[dup]]
    _write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(
            [row for row in X.astype(np.float32)], pa.list_(pa.float32())
        ),
        "label": pa.array(lab, pa.int32()),
    }))


def main(out_root: str = "/tmp/testdata", *sfs: str) -> int:
    sfs = sfs or ("sf0.001", "sf0.01")
    for sf_name in sfs:
        sf = float(sf_name.removeprefix("sf"))
        out_dir = os.path.join(out_root, sf_name)
        make_sf(out_dir, sf)
        print(f"wrote {out_dir} (sf={sf})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
