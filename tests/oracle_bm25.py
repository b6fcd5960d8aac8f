"""Pure-Python/NumPy BM25 oracle — the pinned reference semantics.

The reference repo ships no executable oracle (its only scoring test
has no assertions — reference: search-engine/internal/bm25/
score_test.go:32-82), so per SURVEY.md §5.2 this module IS the
operational definition of "rank-identical to the reference":

- tokens: text.lower().split()   (lowercase, any-whitespace split,
  empties dropped — canonicalization of reference score.go:98-116 +
  idf.go:24)
- doc_len = len(tokens); avgdl = corpus mean
- tf = exact token count (NOT the reference's substring count,
  tf.go:21 — see SURVEY.md §2 semantics note)
- idf = ln(N/df), 0 if df == 0   (reference idf.go:10-18)
- TFcomp = tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)), k1=1.2, b=0.75
  (canonical parenthesization; constants from BASELINE.json)
- score(doc) = Σ over DISTINCT query terms, ascending term order,
  of qweight(term) · idf · TFcomp   — fixed fold order so floats are
  reproducible
- docs with score <= 0 dropped (reference score.go:118-127 analog)
- ties: score desc, then doc_id asc
"""

from __future__ import annotations

from collections import Counter

import numpy as np

K1 = 1.2
B = 0.75


def tokenize(text: str) -> list[str]:
    return text.lower().split()


class OracleIndex:
    """In-memory exact index over a corpus of (doc_id, text)."""

    def __init__(self, doc_ids: list[int], texts: list[str]):
        order = np.argsort(np.asarray(doc_ids, dtype=np.int64), kind="stable")
        self.doc_ids = [int(doc_ids[i]) for i in order]
        self.tokens = [tokenize(texts[i]) for i in order]
        self.doc_len = np.array([len(t) for t in self.tokens], dtype=np.int64)
        self.n_docs = len(self.doc_ids)
        self.avgdl = float(self.doc_len.mean()) if self.n_docs else 0.0
        # postings: term -> {doc position -> tf}
        self.postings: dict[str, dict[int, int]] = {}
        for pos, toks in enumerate(self.tokens):
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[pos] = tf

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        if df == 0:
            return 0.0
        return float(np.log(self.n_docs / df))

    def score_query(self, query: str, k: int) -> list[tuple[int, float]]:
        """Top-k [(doc_id, score)] under the pinned semantics."""
        qtokens = tokenize(query)
        weights = Counter(qtokens)
        scores: dict[int, float] = {}
        for term in sorted(weights):  # fixed ascending term order
            idf = self.idf(term)
            if idf == 0.0 and term not in self.postings:
                continue
            w = float(weights[term])
            for pos, tf in self.postings.get(term, {}).items():
                dl = float(self.doc_len[pos])
                tfcomp = (
                    tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
                )
                contrib = w * idf * tfcomp
                scores[pos] = scores.get(pos, 0.0) + contrib
        ranked = [
            (self.doc_ids[pos], s) for pos, s in scores.items() if s > 0.0
        ]
        ranked.sort(key=lambda x: (-x[1], x[0]))
        return ranked[:k]


def reference_query_set(seed: int = 42, n_queries: int = 50, vocab=None):
    """FIXTURES.md §2: 50 deterministic queries mixing hot / rare /
    absent / repeated terms, k ∈ {1, 10, 100}."""
    from zensearch_spark.sources.corpus import build_vocab

    words, _ = build_vocab(seed)
    rng = np.random.default_rng([seed, 777])
    ks = [1, 10, 100]
    queries = []
    for qid in range(n_queries):
        kind = qid % 6
        if kind == 0:  # single hot term
            terms = [words[int(rng.integers(0, 20))]]
        elif kind == 1:  # single rare term
            terms = [words[int(rng.integers(10_000, VOCAB_HI(words)))]]
        elif kind == 2:  # hot + rare
            terms = [
                words[int(rng.integers(0, 20))],
                words[int(rng.integers(5_000, VOCAB_HI(words)))],
            ]
        elif kind == 3:  # several mid/rare terms
            terms = [
                words[int(rng.integers(100, VOCAB_HI(words)))]
                for _ in range(int(rng.integers(3, 7)))
            ]
        elif kind == 4:  # includes absent-from-corpus term
            terms = [words[int(rng.integers(0, 100))], "zzabsentzz"]
        else:  # repeated term
            w = words[int(rng.integers(0, 1000))]
            terms = [w, w, words[int(rng.integers(0, 1000))]]
        queries.append(
            {
                "query_id": qid,
                "query_text": " ".join(terms),
                "k": ks[qid % len(ks)],
            }
        )
    return queries


def VOCAB_HI(words) -> int:
    return len(words)
