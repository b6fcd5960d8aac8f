"""zensearch_spark — a PySpark-native inverted-index + BM25 top-k engine.

A from-scratch rebuild of the capabilities of francccisss/zensearch
(reference at /root/reference, see SURVEY.md) on idiomatic Spark:

- deterministic transcripts corpus  (sources/corpus.py)
- vectorized tokenization           (functions/tokenizer.py)
- stable docID assignment           (operators/docmap.py)
- salted posting-list build with
  delta+varint block compression    (plans/index_build.py, functions/codec.py)
- block-max pruned BM25 top-k       (operators/wand.py)
- naive DataFrame BM25 (fallback)   (operators/naive_scorer.py)
- checkpoint-resumable stages       (plans/checkpoint.py)

BM25 semantics are pinned by BASELINE.json: k1=1.2, b=0.75,
lowercase whitespace tokens, exact-token tf/df, IDF = ln(N/df)
(0 when df=0), score = sum over query terms (ascending term order)
of qweight * IDF * TFcomp, ties broken score desc then doc_id asc,
zero scores dropped.
"""

K1 = 1.2
B = 0.75
BLOCK_SIZE = 128

__all__ = ["K1", "B", "BLOCK_SIZE"]
