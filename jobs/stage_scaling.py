"""Per-stage scaling evidence (round-2 VERDICT item 3).

The north_rule's N-vs-4N-executor criterion, evidenced per the driver
instruction by running IDENTICAL work at two local parallelism levels.
Round 1 measured only the full pipeline and got noise-dominated
results (this guest VM stalls for seconds-to-minutes at random; see
BENCH/BASELINE.md). This harness isolates EVERY index stage —
doc_map, postings, term_dict, blocks, doc_lens, and the batched WAND
query path — with:

- stage inputs pre-materialized ONCE on tmpfs (both levels read the
  exact same bytes),
- each timed run in a fresh subprocess (fresh JVM, no page-cache or
  GC carry-over between levels beyond the OS cache, which both levels
  share),
- alternating low/high repeats with MIN-of-N reported (the only
  jitter-robust statistic on this host — identical runs swing 3-7x
  when the hypervisor starves vCPUs),
- identical outputs asserted via row counts.

    python jobs/stage_scaling.py [--n-convs 120000] [--low 8 --high 32]
        [--repeats 3] [--stages doc_map,postings,...]

Writes BENCH/stage_scaling_latest.json and prints one JSON line.
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
import os, sys, json
sys.path.insert(0, {repo!r})
from zensearch_spark.session import get_spark
from zensearch_spark.sources.corpus import generate_transcripts
from zensearch_spark.plans.index_build import build_index

tmp = {tmp!r}
spark = get_spark(app="zs-stage-prep", cores={high})
corpus_path = os.path.join(tmp, "corpus")
generate_transcripts(spark, {n_convs}, seed=42).write.mode("overwrite").parquet(corpus_path)
paths = build_index(spark, spark.read.parquet(corpus_path),
                    os.path.join(tmp, "prep_idx"),
                    corpus_id="stage-scaling-prep", n_salt_ranges={n_salt_ranges})
print(json.dumps(paths.stats))
spark.stop()
"""

WORKER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from zensearch_spark.session import get_spark
from zensearch_spark.plans import index_build as ib

tmp = {tmp!r}
stage = {stage!r}
cores = {cores}
stats = json.load(open(os.path.join(tmp, "prep_idx", "stats.json")))
stride, bs, ntb = stats["stride"], stats["block_size"], stats["n_term_buckets"]
avgdl = stats["avgdl"]
prep = os.path.join(tmp, "prep_idx")
out = os.path.join(tmp, f"out_{{stage}}_{{cores}}_{os.getpid()}")
shutil.rmtree(out, ignore_errors=True)

spark = get_spark(app=f"zs-stage-{{stage}}-{{cores}}", cores=cores)
corpus = spark.read.parquet(os.path.join(tmp, "corpus"))

t0 = time.monotonic()
if stage == "doc_map":
    n = ib.stage_doc_map(spark, corpus, out)
elif stage == "postings":
    ib.stage_postings(spark, os.path.join(prep, "doc_map"), out)
    n = None
elif stage == "term_dict":
    m = ib.stage_term_dict(spark, os.path.join(prep, "doc_map"),
                           os.path.join(prep, "postings"), out)
    n = m["n_docs"]
elif stage == "blocks":
    ib.stage_blocks(spark, os.path.join(prep, "postings"),
                    os.path.join(prep, "term_dict"), out,
                    avgdl=avgdl, stride=stride, block_size=bs,
                    n_term_buckets=ntb)
    n = None
elif stage == "doc_lens":
    ib.stage_doc_lens(spark, os.path.join(prep, "doc_map"), out, stride=stride)
    n = None
elif stage == "query_batch":
    from zensearch_spark.plans.query_plan import BM25Index
    from tests.oracle_bm25 import reference_query_set
    index = BM25Index(spark, prep)
    qset = reference_query_set()[:{n_queries}]
    batch = [(q["query_id"], q["query_text"], q["k"]) for q in qset]
    index.topk_batch(batch).collect()   # warm (plan/code cache)
    t0 = time.monotonic()
    rows = index.topk_batch(batch).collect()
    n = len(rows)
else:
    raise SystemExit(f"unknown stage {{stage}}")
wall = time.monotonic() - t0

import duckdb
rows_out = None
if stage != "query_batch" and os.path.isdir(out):
    rows_out = duckdb.sql(
        f"SELECT count(*) FROM parquet_scan('{{out}}/**/*.parquet', hive_partitioning=true)"
    ).fetchone()[0]
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({{"stage": stage, "cores": cores,
                   "wall_sec": round(wall, 3), "rows_out": rows_out}}))
spark.stop()
"""

ALL_STAGES = ["doc_map", "postings", "term_dict", "blocks", "doc_lens",
              "query_batch"]


def run_worker(tmp: str, stage: str, cores: int, n_queries: int) -> dict:
    code = WORKER.format(repo=REPO, tmp=tmp, stage=stage, cores=cores,
                         n_queries=n_queries)
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, check=False)
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"stage {stage} at cores={cores} failed")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-convs", type=int, default=120_000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--queries", type=int, default=12)
    ap.add_argument("--n-salt-ranges", type=int, default=64)
    ap.add_argument("--stages", default=",".join(ALL_STAGES))
    ap.add_argument("--keep-tmp", action="store_true")
    args = ap.parse_args()
    stages = [s for s in args.stages.split(",") if s]

    scratch = os.environ.get(
        "ZS_SCALING_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    tmp = tempfile.mkdtemp(prefix="zs_stage_", dir=scratch)
    prep = subprocess.run(
        [sys.executable, "-c",
         PREP.format(repo=REPO, tmp=tmp, n_convs=args.n_convs,
                     high=args.high, n_salt_ranges=args.n_salt_ranges)],
        capture_output=True, text=True, check=False,
    )
    if prep.returncode != 0:
        sys.stderr.write(prep.stderr[-4000:])
        raise SystemExit("prep failed")
    prep_stats = json.loads(prep.stdout.strip().splitlines()[-1])
    sys.stderr.write(f"[stage-scaling] prep done: {prep_stats['n_docs']} docs\n")

    results: dict[str, dict] = {}
    for stage in stages:
        lo_runs, hi_runs = [], []
        for r in range(args.repeats):
            lo_runs.append(run_worker(tmp, stage, args.low, args.queries))
            hi_runs.append(run_worker(tmp, stage, args.high, args.queries))
            sys.stderr.write(
                f"[stage-scaling] {stage} rep{r}: "
                f"lo {lo_runs[-1]['wall_sec']}s hi {hi_runs[-1]['wall_sec']}s\n"
            )
        rows = {x["rows_out"] for x in lo_runs + hi_runs}
        lo = min(x["wall_sec"] for x in lo_runs)
        hi = min(x["wall_sec"] for x in hi_runs)
        ratio = args.high / args.low
        speedup = lo / hi
        results[stage] = {
            "low_sec_min": lo, "high_sec_min": hi,
            "low_secs": [x["wall_sec"] for x in lo_runs],
            "high_secs": [x["wall_sec"] for x in hi_runs],
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / ratio, 3),
            "rows_out_consistent": len(rows) == 1,
        }
        sys.stderr.write(
            f"[stage-scaling] {stage}: lo {lo}s hi {hi}s "
            f"speedup {speedup:.2f}x eff {speedup / ratio:.2f}\n"
        )

    report = {
        "generated_utc": datetime.now(timezone.utc).isoformat(),
        "n_convs": args.n_convs,
        "n_docs": prep_stats["n_docs"],
        "low": args.low, "high": args.high, "repeats": args.repeats,
        "stages": results,
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "stage_scaling_latest.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if not args.keep_tmp:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
