"""M2: stable docID + per-turn text-equality invariant (input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from zensearch_spark.operators.docmap import assign_doc_ids, unpersist_intermediates


def _spark_corpus(spark, pdf):
    return spark.createDataFrame(pdf)


def test_doc_id_is_global_rank(spark, small_corpus_pdf):
    df = _spark_corpus(spark, small_corpus_pdf)
    out = assign_doc_ids(df, num_ranges=7)
    got = out.select("doc_id", "conv_id", "turn_idx").toPandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    want = (
        small_corpus_pdf[["conv_id", "turn_idx"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert list(got["doc_id"]) == list(range(len(want)))
    assert list(got["conv_id"]) == list(want["conv_id"])
    assert list(got["turn_idx"]) == list(want["turn_idx"])
    unpersist_intermediates(out)


def test_doc_id_partition_count_invariance(spark, small_corpus_pdf):
    df = _spark_corpus(spark, small_corpus_pdf)
    a = assign_doc_ids(df, num_ranges=3).select("doc_id", "conv_id", "turn_idx")
    b = assign_doc_ids(df.repartition(13), num_ranges=11).select(
        "doc_id", "conv_id", "turn_idx"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_per_turn_text_equality_invariant(spark, small_corpus_pdf):
    """input_hint invariant: text recovered through the doc_map
    pipeline == raw table text under stable (conv_id, turn_idx)
    ordering."""
    df = _spark_corpus(spark, small_corpus_pdf)
    doc_map = assign_doc_ids(df)
    back = (
        doc_map.select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    raw = (
        small_corpus_pdf[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert back.equals(raw)
