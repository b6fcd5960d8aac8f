"""spark-submit entry: BM25 top-k query against a built index.

    python jobs/query.py --index /tmp/idx --query "term1 term2" -k 10
    python jobs/query.py --index /tmp/idx --query "..." -k 10 --naive  # cross-check
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    q = ap.add_mutually_exclusive_group(required=True)
    q.add_argument("--query", help="single query string")
    q.add_argument("--queries-file",
                   help="file with one query per line — answered as ONE "
                        "batched Spark job (the throughput path)")
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--naive", action="store_true",
                    help="use the always-correct DataFrame path instead of WAND")
    ap.add_argument("--hydrate", action="store_true",
                    help="join results back to transcript turns")
    args = ap.parse_args()

    from zensearch_spark.plans.query_plan import BM25Index
    from zensearch_spark.session import get_spark

    spark = get_spark(app="zensearch-query", cores=args.cores)
    index = BM25Index(spark, args.index)
    t0 = time.monotonic()
    if args.queries_file:
        with open(args.queries_file) as f:
            batch = [(i, line.strip(), args.k)
                     for i, line in enumerate(f) if line.strip()]
        rows = index.topk_batch(batch).collect()
        wall = time.monotonic() - t0
        by_q: dict[int, list] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(
                {"doc_id": r["doc_id"], "score": r["score"]})
        print(json.dumps({
            "mode": "batch", "k": args.k, "n_queries": len(batch),
            "wall_sec": round(wall, 3),
            "queries_per_sec": round(len(batch) / wall, 3),
            "results": {batch[i][1]: by_q.get(i, []) for i in range(len(batch))},
        }))
        spark.stop()
        return
    if args.hydrate:
        rows = index.topk_hydrated(args.query, args.k).collect()
    elif args.naive:
        rows = index.naive_topk(args.query, args.k).collect()
    else:
        rows = index.topk(args.query, args.k).collect()
    wall = time.monotonic() - t0
    out = {
        "query": args.query,
        "k": args.k,
        "mode": "naive" if args.naive else ("hydrated" if args.hydrate else "wand"),
        "wall_sec": round(wall, 3),
        "results": [
            {kk: (r[kk] if not hasattr(r[kk], "isoformat") else r[kk].isoformat())
             for kk in r.asDict()}
            for r in rows
        ],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
