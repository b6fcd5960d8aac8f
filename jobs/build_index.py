"""spark-submit entry: build the inverted index over a transcripts
corpus (parquet path or the deterministic synthetic generator).

    spark-submit --py-files zensearch_spark.zip jobs/build_index.py \
        --out /data/index --corpus /data/transcripts
    python jobs/build_index.py --out /tmp/idx --n-convs 5000   # local

Resumable: rerunning after a crash skips committed stages
(plans/checkpoint.py manifests).
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
    ap.add_argument("--out", required=True, help="index root directory")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--corpus", help="parquet path of transcripts table")
    src.add_argument("--n-convs", type=int, help="synthesize N conversations")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cores", type=int, default=None)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    from zensearch_spark.plans.index_build import build_index
    from zensearch_spark.session import get_spark

    spark = get_spark(app="zensearch-build-index", cores=args.cores)
    if args.corpus:
        corpus = spark.read.parquet(args.corpus)
        corpus_id = f"parquet:{os.path.abspath(args.corpus)}"
    else:
        from zensearch_spark.sources.corpus import generate_transcripts

        corpus = generate_transcripts(spark, args.n_convs, seed=args.seed)
        corpus_id = f"synthetic:n_convs={args.n_convs}:seed={args.seed}"

    t0 = time.monotonic()
    paths = build_index(spark, corpus, args.out, corpus_id=corpus_id, force=args.force)
    wall = time.monotonic() - t0
    summary = {
        "index_root": paths.root,
        "wall_sec": round(wall, 3),
        "n_docs": paths.stats["n_docs"],
        "turns_per_sec": round(paths.stats["n_docs"] / wall, 1),
        "avgdl": paths.stats["avgdl"],
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
