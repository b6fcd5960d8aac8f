"""Two-parallelism scaling evidence (BASELINE.json north_rule).

The sandbox has no multi-node cluster, so per the driver instruction
the N-vs-4N-executor criterion is evidenced by running the IDENTICAL
job (same input, same n_salt_ranges, same query set) at local[8] and
local[32] in separate processes, reporting throughput at both plus
scaling efficiency to BENCH/BASELINE.md.

    python jobs/scaling_bench.py [--n-convs 12000] [--queries 12]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PREP = r"""
import os, sys
sys.path.insert(0, {repo!r})
from zensearch_spark.session import get_spark
from zensearch_spark.sources.corpus import generate_transcripts

corpus_path = os.path.join({tmp!r}, "corpus")
if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
    spark = get_spark(app="zs-scaling-prep", cores=8)
    generate_transcripts(spark, {n_convs}, seed=42).write.mode(
        "overwrite").parquet(corpus_path)
    spark.stop()
print("ok")
"""

WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from zensearch_spark.session import get_spark
from zensearch_spark.plans.index_build import build_index
from zensearch_spark.plans.query_plan import BM25Index
from tests.oracle_bm25 import reference_query_set

cores = {cores}
n_convs = {n_convs}
n_queries = {n_queries}
spark = get_spark(app=f"zs-scaling-{{cores}}", cores=cores)
idx_root = os.path.join({tmp!r}, f"idx_c{{cores}}")
shutil.rmtree(idx_root, ignore_errors=True)
# the rule's metric is indexing a STORED transcripts table
# (north_rule: "over Iceberg tables"); generation is upstream ingest
# and is excluded from the timed path
corpus = spark.read.parquet(os.path.join({tmp!r}, "corpus"))
t0 = time.monotonic()
paths = build_index(spark, corpus, idx_root,
                    corpus_id=f"scaling:n={{n_convs}}", n_salt_ranges=64)
build_sec = time.monotonic() - t0
index = BM25Index(spark, idx_root)
qset = reference_query_set()[:n_queries]
t0 = time.monotonic()
rows = index.topk_batch(
    [(q["query_id"], q["query_text"], q["k"]) for q in qset]
).collect()
query_sec = time.monotonic() - t0
results = {{}}
for r in rows:
    results.setdefault(str(r["query_id"]), []).append(
        (r["doc_id"], round(r["score"], 9)))
print(json.dumps({{
    "cores": cores, "n_docs": paths.stats["n_docs"],
    "build_sec": round(build_sec, 3),
    "build_turns_per_sec": round(paths.stats["n_docs"] / build_sec, 2),
    "query_sec": round(query_sec, 3),
    "queries_per_sec": round(n_queries / query_sec, 3),
    "results": results,
}}))
spark.stop()
"""


def run_at(cores: int, n_convs: int, n_queries: int, tmp: str) -> dict:
    code = WORKER.format(repo=REPO, cores=cores, n_convs=n_convs,
                         n_queries=n_queries, tmp=tmp)
    env = dict(os.environ)
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        check=False,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"worker at cores={cores} failed")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=12000)
    ap.add_argument("--queries", type=int, default=12)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2,
                    help="alternating repeats per config; min wall is "
                         "reported (noise-robust under host jitter)")
    args = ap.parse_args()

    # index output on tmpfs too: the sandbox's throttled virtio disk is
    # a non-scalable shared resource a real cluster doesn't have (HDFS/
    # S3 bandwidth scales with nodes); measuring through it would
    # benchmark the disk, not the engine
    scratch_base = os.environ.get(
        "ZS_SCALING_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    tmp = tempfile.mkdtemp(prefix="zs_scaling_", dir=scratch_base)
    prep = subprocess.run(
        [sys.executable, "-c", PREP.format(repo=REPO, tmp=tmp, n_convs=args.n_convs)],
        capture_output=True, text=True, check=False,
    )
    if prep.returncode != 0:
        sys.stderr.write(prep.stderr[-4000:])
        raise SystemExit("corpus prep failed")
    lo_runs, hi_runs = [], []
    for r in range(args.repeats):
        lo_runs.append(run_at(args.low, args.n_convs, args.queries, tmp))
        hi_runs.append(run_at(args.high, args.n_convs, args.queries, tmp))
        sys.stderr.write(
            f"[scaling] repeat {r}: low build {lo_runs[-1]['build_sec']}s, "
            f"high build {hi_runs[-1]['build_sec']}s\n"
        )

    def best(runs: list[dict]) -> dict:
        b = dict(min(runs, key=lambda x: x["build_sec"]))
        q = min(runs, key=lambda x: x["query_sec"])
        b["query_sec"] = q["query_sec"]
        b["queries_per_sec"] = q["queries_per_sec"]
        b["build_secs_all"] = [x["build_sec"] for x in runs]
        b["query_secs_all"] = [x["query_sec"] for x in runs]
        return b

    lo, hi = best(lo_runs), best(hi_runs)
    identical = all(
        r["results"] == lo_runs[0]["results"] for r in lo_runs + hi_runs
    )

    ratio = args.high / args.low
    build_eff = hi["build_turns_per_sec"] / (lo["build_turns_per_sec"] * ratio)
    query_eff = hi["queries_per_sec"] / (lo["queries_per_sec"] * ratio)
    # weak-scaling view: efficiency of just not slowing down
    build_speedup = hi["build_turns_per_sec"] / lo["build_turns_per_sec"]
    query_speedup = hi["queries_per_sec"] / lo["queries_per_sec"]

    report = {
        "generated_utc": datetime.now(timezone.utc).isoformat(),
        "input": {"n_convs": args.n_convs, "n_docs": lo["n_docs"],
                  "n_queries": args.queries, "n_salt_ranges": 64},
        "low": lo | {"results": None},
        "high": hi | {"results": None},
        "rank_identical_across_sizes": identical,
        "build_speedup": round(build_speedup, 3),
        "build_scaling_efficiency": round(build_eff, 3),
        "query_speedup": round(query_speedup, 3),
        "query_scaling_efficiency": round(query_eff, 3),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # raw output goes to scaling_latest.md; BENCH/BASELINE.md is the
    # curated evidence document and is maintained by hand
    md = os.path.join(REPO, "BENCH", "scaling_latest.md")
    with open(md, "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling evidence (sandbox proxy)

Per BASELINE.json `north_rule` ("N and 4N executors, scaling
efficiency >= 0.8") evidenced as instructed: the same job — synthetic
transcripts corpus ({args.n_convs} convs = {lo['n_docs']} turns,
n_salt_ranges pinned to 64 so work is identical — full index build +
{args.queries}-query block-max WAND set — run at local[{args.low}] and
local[{args.high}] on identical input. Generated {report['generated_utc']}
by `python jobs/scaling_bench.py`.

| metric | local[{args.low}] | local[{args.high}] | speedup ({ratio:.0f}x cores) | efficiency |
|---|---|---|---|---|
| index build (turns/sec) | {lo['build_turns_per_sec']} | {hi['build_turns_per_sec']} | {build_speedup:.2f}x | {build_eff:.2f} |
| WAND query set (q/s) | {lo['queries_per_sec']} | {hi['queries_per_sec']} | {query_speedup:.2f}x | {query_eff:.2f} |

Rank-identical results across parallelism levels: **{identical}**
(every query's (doc_id, score) list compared at 1e-9 rounding).

Efficiency = throughput_high / (throughput_low x {ratio:.0f}).
Caveats: single-JVM local mode shares one driver, page cache and
Python worker pool; per-query fixed costs (plan + 2 Spark jobs per
query, ~0.5-1 s) do not parallelize, so query q/s understates
multi-executor scaling; the build path is the shuffle-bound one the
rule targets.

Raw JSON:

```json
{json.dumps(report, indent=1)}
```
""")
    print(json.dumps(report))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
