"""Generate a LARGE synthetic corpus mimicking the driver testdata's
shape, for round-6 scale timing only (noop-sink measurements in
bench_extra.py). NOT oracle data: correctness gates always run on the
driver's own /root/testdata/sf* dirs, which this script never touches.

The driver's bonus-round measurement used a driver-generated sf1.0
(50k documents / 20k embeddings / 1M events / 6M lineitem). This
reproduces the same table SHAPES (row counts, schemas, value
distributions: 10-100 token docs over the same small vocabulary,
64-dim gaussian embeddings, events over 10x the users, lineitem /
orders / customer replicated with key offsets so per-key
cardinalities stay unchanged) with an independent seed — content is
not the driver's, timings are comparable, results are not gamed.

Usage: python jobs/gen_scale_corpus.py [--out /tmp/sfbig] [--mult 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sfbig")
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(20260822)
    m = args.mult

    # ---- documents: fresh docs, same vocab / length / lang / source mix
    base = pq.read_table(f"{SRC}/documents.parquet").to_pandas()
    vocab = sorted({w for t in base.text for w in t.split()})
    langs = sorted(base.lang.unique())
    sources = sorted(base.source.unique())
    n_docs = len(base) * m
    lens = rng.integers(10, 101, n_docs)
    words = rng.integers(0, len(vocab), int(lens.sum()))
    voc = np.array(vocab)
    texts = []
    pos = 0
    for L in lens:
        texts.append(" ".join(voc[words[pos:pos + L]]) + " ")
        pos += L
    doc_tbl = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array([langs[i] for i in rng.integers(0, len(langs), n_docs)]),
        "source": pa.array([sources[i] for i in rng.integers(0, len(sources), n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(doc_tbl, f"{args.out}/documents.parquet")

    # ---- embeddings: gaussian 64-dim, labels 0-9
    n_emb = 2000 * m
    emb = rng.standard_normal((n_emb, 64)).astype(np.float64)
    emb_tbl = pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float64())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int64()),
    })
    pq.write_table(emb_tbl, f"{args.out}/embeddings.parquet")

    # ---- events: same schema, m x rows over m x users
    n_ev = 100000 * m
    ts0 = np.datetime64("2024-01-01T00:00:00")
    ts = ts0 + np.sort(rng.integers(0, 90 * 24 * 3600 * 10**6, n_ev)).astype(
        "timedelta64[us]")
    types = np.array(["error", "view", "signup", "purchase", "click"])
    ev_tbl = pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, 1500 * m, n_ev), pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 5, n_ev)]),
        "value": pa.array(np.round(rng.uniform(0, 200, n_ev), 2)),
        "props": pa.array([json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_ev)]),
    })
    pq.write_table(ev_tbl, f"{args.out}/events.parquet")

    # ---- TPC-H-ish: replicate with key offsets (per-key cardinality kept)
    for name, keys in (
        ("lineitem", {"l_orderkey": 600000 * 10, "l_partkey": 0, "l_suppkey": 0}),
        ("orders", {"o_orderkey": 600000 * 10, "o_custkey": 15000 * 10}),
        ("customer", {"c_custkey": 15000 * 10}),
    ):
        t = pq.read_table(f"{SRC}/{name}.parquet")
        parts = []
        for i in range(m):
            cols = {}
            for col in t.schema.names:
                arr = t[col]
                if col in keys and keys[col]:
                    cols[col] = pa.array(arr.to_numpy(zero_copy_only=False) + i * keys[col])
                else:
                    cols[col] = arr
            parts.append(pa.table(cols))
        pq.write_table(pa.concat_tables(parts), f"{args.out}/{name}.parquet")

    for name in ("region", "nation", "supplier", "part"):
        src = f"{SRC}/{name}.parquet"
        if os.path.exists(src):
            pq.write_table(pq.read_table(src), f"{args.out}/{name}.parquet")

    print(f"[gen] wrote mult={m} corpus to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
