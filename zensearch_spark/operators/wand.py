"""Block-max pruned BM25 top-k evaluator (SURVEY.md §7 M4).

Replaces the reference's full-corpus brute-force score + global sort
(reference: search-engine/internal/bm25/score.go:19-95) with a
distributed two-level top-k:

- the index's global doc-range salting (plans/index_build.py) means
  every salt value holds ALL query terms' blocks for one doc_id
  range → each salt group is an independent exact top-k problem;
- within a group, a TAAT MaxScore evaluator with block skipping:
  terms are processed in descending upper-bound order; once the
  remaining terms' upper bounds cannot lift a NEW doc past the
  running k-th-best lower bound θ, later terms stop admitting docs
  and only update existing candidates, decoding ONLY the blocks
  whose [first_doc, last_doc] overlaps a candidate (the block-max /
  block-range pruning payoff);
- survivors are RESCORED in ascending-term order with a fixed fold
  so final floats are bit-comparable with the NumPy oracle and the
  naive DataFrame path (three-way agreement, SURVEY §5.2 layer 4);
- per-group top-k rows are merged by a final tiny
  orderBy(score desc, doc_id).limit(k) — TakeOrderedAndProject over
  ≤ groups·k rows.

All pruning comparisons carry a 1e-9 epsilon so float noise can only
make the evaluator decode MORE, never drop a true winner.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zensearch_spark import B, K1
from zensearch_spark.functions.codec import decode_block
from zensearch_spark.functions.tokenizer import tokenize_query

EPS = 1e-9

TOPK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)


def _tfcomp(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


class _TermBlocks:
    """Lazily-decoded posting blocks of one term within one salt group."""

    def __init__(self, pdf: pd.DataFrame, idf: float, weight: float, avgdl: float):
        pdf = pdf.sort_values("block_seq")
        self.first = pdf["first_doc"].to_numpy(np.int64)
        self.last = pdf["last_doc"].to_numpy(np.int64)
        self.max_score = pdf["max_score"].to_numpy(np.float64) * weight
        self.doc_bytes = pdf["doc_bytes"].tolist()
        self.tf_bytes = pdf["tf_bytes"].tolist()
        self.dl_bytes = pdf["dl_bytes"].tolist()
        self.idf = idf
        self.weight = weight
        self.avgdl = avgdl
        self.ub = float(self.max_score.max()) if len(self.max_score) else 0.0
        self._decoded: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        self.blocks_decoded = 0

    def _decode(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        got = self._decoded.get(i)
        if got is None:
            docs, tfs, dls = decode_block(
                int(self.first[i]), self.doc_bytes[i], self.tf_bytes[i], self.dl_bytes[i]
            )
            contrib = self.weight * self.idf * _tfcomp(tfs, dls, self.avgdl)
            got = self._decoded[i] = (docs, contrib)
            self.blocks_decoded += 1
        return got

    def decode_all(self) -> tuple[np.ndarray, np.ndarray]:
        if not len(self.first):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        parts = [self._decode(i) for i in range(len(self.first))]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )

    def decode_overlapping(self, cand_docs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Decode only blocks whose doc range contains ≥1 candidate."""
        if not len(self.first) or not len(cand_docs):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        # block i overlaps iff some cand in [first_i, last_i]:
        # count of cands < first vs <= last differ
        lo = np.searchsorted(cand_docs, self.first, side="left")
        hi = np.searchsorted(cand_docs, self.last, side="right")
        hit = np.flatnonzero(hi > lo)
        if not len(hit):
            return np.empty(0, np.int64), np.empty(0, np.float64)
        parts = [self._decode(int(i)) for i in hit]
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )

    def lookup(self, docs: np.ndarray, src: tuple[np.ndarray, np.ndarray]) -> np.ndarray:
        """Contribution of each doc in ``docs`` (0.0 when absent)."""
        sdocs, scontrib = src
        out = np.zeros(len(docs), np.float64)
        if len(sdocs):
            pos = np.searchsorted(sdocs, docs)
            ok = (pos < len(sdocs)) & (sdocs[np.minimum(pos, len(sdocs) - 1)] == docs)
            out[ok] = scontrib[pos[ok]]
        return out


def evaluate_salt_group(
    pdf: pd.DataFrame,
    idf_map: dict[str, float],
    weight_map: dict[str, float],
    avgdl: float,
    k: int,
) -> pd.DataFrame:
    """Exact top-k of one salt group (see module docstring)."""
    terms: dict[str, _TermBlocks] = {}
    for term, tpdf in pdf.groupby("term", sort=True):
        t = str(term)
        terms[t] = _TermBlocks(tpdf, idf_map[t], weight_map[t], avgdl)

    order = sorted(terms, key=lambda t: -terms[t].ub)
    ubs = np.array([terms[t].ub for t in order])
    suffix_ub = np.concatenate([np.cumsum(ubs[::-1])[::-1], [0.0]])

    cand_docs = np.empty(0, np.int64)
    cand_scores = np.empty(0, np.float64)  # partial sums — bounds only
    decoded_src: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    theta = -np.inf
    essential_done = False
    for i, t in enumerate(order):
        tb = terms[t]
        rem_after = suffix_ub[i + 1]
        essential = (not essential_done) and (
            theta == -np.inf or tb.ub + rem_after >= theta - EPS
        )
        if essential:
            docs_t, contrib_t = tb.decode_all()
            decoded_src[t] = (docs_t, contrib_t)
            # merge-union into candidates
            merged = np.union1d(cand_docs, docs_t)
            new_scores = np.zeros(len(merged), np.float64)
            if len(cand_docs):
                pos = np.searchsorted(merged, cand_docs)
                new_scores[pos] = cand_scores
            if len(docs_t):
                pos = np.searchsorted(merged, docs_t)
                new_scores[pos] += contrib_t
            cand_docs, cand_scores = merged, new_scores
        else:
            essential_done = True
            src = tb.decode_overlapping(cand_docs)
            decoded_src[t] = src
            cand_scores = cand_scores + tb.lookup(cand_docs, src)
            # prune: only safe once the candidate set is final
            keep = cand_scores + rem_after >= theta - EPS
            cand_docs, cand_scores = cand_docs[keep], cand_scores[keep]
        if len(cand_scores) >= k:
            theta = float(np.partition(cand_scores, -k)[-k])

    if not len(cand_docs):
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})

    # exact rescore of survivors: ascending term order, fixed fold —
    # identical float sequence to the oracle and the naive path
    final = np.zeros(len(cand_docs), np.float64)
    for t in sorted(terms):
        tb = terms[t]
        src = decoded_src.get(t)
        if src is None:
            src = tb.decode_overlapping(cand_docs)
        final = final + tb.lookup(cand_docs, src)

    pos_mask = final > 0.0
    cand_docs, final = cand_docs[pos_mask], final[pos_mask]
    if len(final) > k:
        # top-k by (score desc, doc_id asc)
        sel = np.lexsort((cand_docs, -final))[:k]
        cand_docs, final = cand_docs[sel], final[sel]
    return pd.DataFrame({"doc_id": cand_docs, "score": final})


def wand_topk(
    spark: SparkSession,
    blocks: DataFrame,
    term_rows: list[dict],
    query: str,
    k: int,
    avgdl: float,
    n_term_buckets: int,
) -> DataFrame:
    """Distributed block-max top-k.

    ``blocks``: the blocks table (already loaded; caller may pass the
    full table — term/bucket pruning happens here).
    ``term_rows``: collected term_dict rows for the query's terms
    (list of {term, df, idf}) — the broadcast dictionary.
    """
    weights = Counter(tokenize_query(query))
    idf_map = {r["term"]: float(r["idf"]) for r in term_rows}
    terms = [t for t in sorted(weights) if t in idf_map]
    if not terms:
        return spark.createDataFrame([], TOPK_SCHEMA)
    weight_map = {t: float(weights[t]) for t in terms}
    bucket_map = spark_term_buckets(spark, terms, n_term_buckets)
    buckets = sorted(set(bucket_map.values()))

    pruned = blocks.filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return evaluate_salt_group(pdf, idf_map, weight_map, avgdl, k)

    cands = pruned.groupBy("salt").applyInPandas(run, schema=TOPK_SCHEMA)
    return cands.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


_bucket_cache: dict[tuple[str, int], int] = {}


def spark_term_buckets(
    spark: SparkSession, terms: list[str], n_buckets: int
) -> dict[str, int]:
    """term → pmod(hash(term), n_buckets) computed by the JVM so it
    matches the write-side partition values exactly."""
    missing = [t for t in terms if (t, n_buckets) not in _bucket_cache]
    if missing:
        df = spark.createDataFrame([(t,) for t in missing], "term string")
        rows = df.withColumn(
            "b", F.pmod(F.hash("term"), F.lit(n_buckets))
        ).collect()
        for r in rows:
            _bucket_cache[(r["term"], n_buckets)] = int(r["b"])
    return {t: _bucket_cache[(t, n_buckets)] for t in terms}
