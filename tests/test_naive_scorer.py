"""M1: naive DataFrame BM25 rank-identical to the NumPy oracle."""

from __future__ import annotations

import numpy as np
import pytest

from tests.oracle_bm25 import OracleIndex, reference_query_set
from zensearch_spark.operators.docmap import assign_doc_ids
from zensearch_spark.operators.naive_scorer import naive_topk, tokenized_docs


@pytest.fixture(scope="module")
def corpus(spark, small_corpus_pdf):
    sdf = spark.createDataFrame(small_corpus_pdf)
    doc_map = assign_doc_ids(sdf).select("doc_id", "conv_id", "turn_idx", "text")
    docs = tokenized_docs(doc_map).cache()
    docs.count()
    pdf = doc_map.select("doc_id", "text").toPandas().sort_values("doc_id")
    oracle = OracleIndex(pdf["doc_id"].tolist(), pdf["text"].tolist())
    return docs, oracle


def assert_rank_identical(got: list[tuple[int, float]], want: list[tuple[int, float]]):
    assert len(got) == len(want), (got, want)
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gd == wd, (got, want)
        assert gs == pytest.approx(ws, rel=1e-9, abs=1e-12)


@pytest.mark.parametrize("qid", [0, 1, 2, 3, 4, 5, 10, 17, 23, 40])
def test_naive_matches_oracle_on_query_set(corpus, qid):
    docs, oracle = corpus
    q = reference_query_set()[qid]
    want = oracle.score_query(q["query_text"], q["k"])
    got_df = naive_topk(docs, q["query_text"], q["k"])
    got = [(r["doc_id"], r["score"]) for r in got_df.collect()]
    assert_rank_identical(got, want)


def test_absent_term_empty(corpus):
    docs, _ = corpus
    assert naive_topk(docs, "zzabsentzz", 10).count() == 0


def test_empty_query(corpus):
    docs, _ = corpus
    assert naive_topk(docs, "   ", 10).count() == 0


def test_repeated_term_weighting(corpus):
    docs, oracle = corpus
    want = oracle.score_query("jozjo jozjo", 5)
    got = [(r["doc_id"], r["score"]) for r in naive_topk(docs, "jozjo jozjo", 5).collect()]
    assert_rank_identical(got, want)
