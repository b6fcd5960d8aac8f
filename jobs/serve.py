"""Resident query-serving loop — the long-lived frontend analog
(round-4 VERDICT item 3 / next-round item 7).

The reference keeps a resident process that answers successive search
requests over one warm engine (express-server/src/app/index.ts:175-203:
the Express route handler holding a live DB pool + search service).
jobs/query.py is the one-shot/batched CLI twin; THIS job is the
lifecycle twin: ONE SparkSession + ONE warm BM25Index (term cache
loaded once, blocks optionally pinned in executor memory) answering
successive query batches from stdin until EOF — every batch after the
first runs at warm steady-state, which is the number a real user of a
resident frontend sees.

    # REPL: one query per line, one JSON answer line per query
    python jobs/serve.py --index /tmp/idx

    # batched: every N lines answered as ONE Spark job
    python jobs/serve.py --index /tmp/idx --batch-size 8

    # self-test: report cold vs warm q/s over the reference query set
    python jobs/serve.py --index /tmp/idx --selftest --rounds 3

Protocol: plain query text per line ("\\q" or EOF ends the session);
answers go to stdout as one JSON object per line; all diagnostics on
stderr. At 100 TB the shape is identical — the warm index handle holds
only model-size state (term dictionary cache) on the driver plus the
optionally-cached blocks table on executors; per-batch work stays the
bucket-pruned WAND plan.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _answer_batch(index, lines: list[str], k: int, batch_no: int) -> dict:
    t0 = time.monotonic()
    batch = [(i, q, k) for i, q in enumerate(lines)]
    rows = index.topk_batch(batch).collect()
    wall = time.monotonic() - t0
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            {"doc_id": r["doc_id"], "score": r["score"]}
        )
    return {
        "batch": batch_no,
        "n_queries": len(lines),
        "wall_sec": round(wall, 3),
        "queries_per_sec": round(len(lines) / wall, 3),
        "warm": batch_no > 0,
        "results": {lines[i]: by_q.get(i, []) for i in range(len(lines))},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("-k", type=int, default=10)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=1,
                    help="answer every N stdin lines as one Spark job")
    ap.add_argument("--no-cache-blocks", action="store_true",
                    help="skip pinning the blocks table (default: pin — "
                         "the resident-session configuration)")
    ap.add_argument("--selftest", action="store_true",
                    help="run the reference query set --rounds times "
                         "and report cold vs warm q/s, then exit")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from zensearch_spark.plans.query_plan import BM25Index
    from zensearch_spark.session import get_spark

    spark = get_spark(app="zensearch-serve", cores=args.cores)
    t0 = time.monotonic()
    index = BM25Index(spark, args.index,
                      cache_blocks=not args.no_cache_blocks)
    sys.stderr.write(
        f"[serve] index ready in {time.monotonic() - t0:.1f}s "
        f"({index.stats['n_docs']} docs); waiting on stdin\n"
    )

    if args.selftest:
        from tests.oracle_bm25 import reference_query_set

        qs = [q["query_text"] for q in reference_query_set()]
        rounds = []
        for r in range(args.rounds):
            out = _answer_batch(index, qs, args.k, r)
            rounds.append({k: out[k] for k in
                           ("batch", "n_queries", "wall_sec",
                            "queries_per_sec", "warm")})
            sys.stderr.write(f"[serve] round {r}: {out['wall_sec']}s "
                             f"({out['queries_per_sec']} q/s)\n")
        warm = min(r["wall_sec"] for r in rounds[1:]) if len(rounds) > 1 else None
        print(json.dumps({
            "mode": "selftest", "rounds": rounds,
            "cold_sec": rounds[0]["wall_sec"],
            "warm_min_sec": warm,
            "warm_queries_per_sec":
                round(len(qs) / warm, 3) if warm else None,
        }))
        spark.stop()
        return

    batch_no = 0
    pending: list[str] = []
    for line in sys.stdin:
        q = line.strip()
        if q == "\\q":
            break
        if not q:
            continue
        pending.append(q)
        if len(pending) >= args.batch_size:
            print(json.dumps(_answer_batch(index, pending, args.k, batch_no)),
                  flush=True)
            batch_no += 1
            pending = []
    if pending:
        print(json.dumps(_answer_batch(index, pending, args.k, batch_no)),
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
