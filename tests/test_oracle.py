"""Oracle self-tests (SURVEY.md §7 M0 deliverable)."""

from __future__ import annotations

import math

from tests.oracle_bm25 import OracleIndex, reference_query_set, tokenize


def test_tokenize():
    assert tokenize("a b c") == ["a", "b", "c"]
    assert tokenize("  A\t\nB  c ") == ["a", "b", "c"]
    assert tokenize("") == []


def test_tiny_corpus_hand_check():
    # docs: 0:"cat dog", 1:"cat cat", 2:"fish"
    idx = OracleIndex([0, 1, 2], ["cat dog", "cat cat", "fish"])
    assert idx.n_docs == 3
    assert idx.avgdl == (2 + 2 + 1) / 3
    # query "cat": df=2, idf=ln(3/2)
    idf = math.log(3 / 2)
    res = idx.score_query("cat", k=10)
    assert [d for d, _ in res] == [1, 0]  # tf=2 beats tf=1 (same dl)
    k1, b = 1.2, 0.75
    avgdl = 5 / 3

    def tfc(tf, dl):
        return tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert res[0][1] == idf * tfc(2, 2)
    assert res[1][1] == idf * tfc(1, 2)


def test_absent_term_scores_zero():
    idx = OracleIndex([0, 1], ["cat dog", "fish"])
    assert idx.score_query("zzabsentzz", k=10) == []


def test_term_in_every_doc_idf_zero_dropped():
    idx = OracleIndex([0, 1], ["cat dog", "cat fish"])
    # "cat" in every doc → idf = ln(1) = 0 → score 0 → dropped
    assert idx.score_query("cat", k=10) == []


def test_tie_break_doc_id_asc():
    idx = OracleIndex([5, 3, 9], ["same text", "same text", "other words"])
    res = idx.score_query("same", k=10)
    assert [d for d, _ in res] == [3, 5]


def test_repeated_query_term_double_weight():
    idx = OracleIndex([0, 1], ["cat dog", "fish"])
    s1 = idx.score_query("cat", k=10)
    s2 = idx.score_query("cat cat", k=10)
    assert s2[0][1] == 2 * s1[0][1]


def test_reference_query_set_shape():
    qs = reference_query_set()
    assert len(qs) == 50
    assert all(q["k"] in (1, 10, 100) for q in qs)
    assert any("zzabsentzz" in q["query_text"] for q in qs)
    # determinism
    qs2 = reference_query_set()
    assert qs == qs2
