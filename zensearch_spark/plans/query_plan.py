"""Query-side plan: broadcast term dictionary → pruned block scan →
block-max top-k → hydration (SURVEY.md §3 "ours" lifecycle).

The reference ships the ENTIRE corpus to the scorer on every query
(reference: database/src/database.ts:93-104 + the RabbitMQ hops in
§3); here a query touches only the term_dict rows and block files of
its own terms (partition pruning on term_bucket, row-group pruning on
term), then ≤ salt_groups·k candidate rows move to the driver-side
final top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zensearch_spark.functions.tokenizer import tokenize_query
from zensearch_spark.operators.wand import wand_topk
from zensearch_spark.plans.index_build import IndexPaths


class BM25Index:
    """Handle over a built index (plans/index_build.py layout)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.paths = IndexPaths.load(root)
        self.stats = self.paths.stats
        self._blocks = spark.read.parquet(self.paths.blocks)
        self._term_dict = spark.read.parquet(self.paths.term_dict)

    # -- the broadcast dictionary: tiny per-query collect ----------------
    def term_rows(self, query: str) -> list[dict]:
        terms = sorted(set(tokenize_query(query)))
        if not terms:
            return []
        rows = (
            self._term_dict.filter(F.col("term").isin(terms))
            .select("term", "df", "idf")
            .collect()
        )
        return [r.asDict() for r in rows]

    def topk(self, query: str, k: int) -> DataFrame:
        """(doc_id, score) — block-max pruned exact top-k."""
        return wand_topk(
            self.spark,
            self._blocks,
            self.term_rows(query),
            query,
            k,
            avgdl=float(self.stats["avgdl"]),
            n_term_buckets=int(self.stats["n_term_buckets"]),
        )

    def topk_hydrated(self, query: str, k: int) -> DataFrame:
        """Top-k joined back to the transcript turns — the analog of
        the reference's rendered result list (express-server/src/app/
        index.ts:186-197), but truly top-k (the reference renders the
        full corpus ranking; its .slice(0,10) is commented out)."""
        top = self.topk(query, k)
        doc_map = self.spark.read.parquet(self.paths.doc_map)
        hydrate_cols = [c for c in ("conv_id", "turn_idx", "role", "text", "tool", "ts")
                        if c in doc_map.columns]
        return (
            doc_map.join(F.broadcast(top), "doc_id")
            .select("doc_id", "score", *hydrate_cols)
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    def naive_topk(self, query: str, k: int) -> DataFrame:
        """Always-correct cross-check path over the raw doc_map."""
        from zensearch_spark.functions.tokenizer import with_tokens
        from zensearch_spark.operators.naive_scorer import naive_topk

        doc_map = self.spark.read.parquet(self.paths.doc_map)
        docs = doc_map.select(
            "doc_id", with_tokens("text").alias("tokens"), "doc_len"
        )
        return naive_topk(
            docs, query, k,
            n_docs=int(self.stats["n_docs"]),
            avgdl=float(self.stats["avgdl"]),
        )
