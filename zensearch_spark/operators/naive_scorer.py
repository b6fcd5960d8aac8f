"""Naive (pure-DataFrame) BM25 top-k — SURVEY.md §7 M1.

This is the declarative re-expression of the reference's whole
scoring path (reference: search-engine/internal/bm25/score.go:19-95,
tf.go:9-29, idf.go:10-31) as one Catalyst plan:

    corpus → arrays_overlap prefilter → explode(tokens) →
    filter(term ∈ query) → groupBy(doc,term).count (tf) →
    groupBy(term).count (df) → BM25 column expression →
    deterministic per-doc fold → orderBy(score desc, doc_id).limit(k)

It is always-correct and is both the driver's oracle-checkable query
and the cross-check for the block-max WAND path (operators/wand.py).

Float determinism: per-doc contributions are folded in ascending
term order via sort_array(collect_list(struct(term, contrib))) +
F.aggregate — the exact fold order of the NumPy oracle — instead of
an order-nondeterministic sum().

Scale notes: the arrays_overlap prefilter prunes non-matching docs
before the explode (the expensive step); tf/df aggregations get
map-side partial aggregation from Catalyst; the df table (≤ #query
terms rows) is broadcast.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zensearch_spark import B, K1
from zensearch_spark.functions.tokenizer import tokenize_query


def corpus_stats(docs: DataFrame) -> tuple[int, float]:
    """(n_docs, avgdl) over a (doc_id, doc_len) DataFrame — the
    build-once analog of the reference recomputing AvgDocLen per
    query (reference: doc_length.go:18-26)."""
    row = docs.agg(
        F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"] or 0.0)


def bm25_contrib_col(tf_col, dl_col, idf_col, weight_col, avgdl: float):
    """qweight · idf · tf(k1+1)/(tf + k1(1−b+b·dl/avgdl)) as a Column."""
    tf = tf_col.cast("double")
    dl = dl_col.cast("double")
    tfcomp = (tf * (K1 + 1.0)) / (
        tf + K1 * (1.0 - B + B * dl / F.lit(float(avgdl)))
    )
    return weight_col * idf_col * tfcomp


def naive_topk(
    docs: DataFrame,
    query: str,
    k: int,
    n_docs: int | None = None,
    avgdl: float | None = None,
) -> DataFrame:
    """Top-k (doc_id, score) for one query string.

    ``docs`` must have (doc_id long, tokens array<string>, doc_len int).
    Stats are computed on the fly when not supplied (index-backed
    callers pass the stored stats).
    """
    spark = docs.sparkSession
    weights = Counter(tokenize_query(query))
    if not weights:
        return spark.createDataFrame([], "doc_id long, score double")
    if n_docs is None or avgdl is None:
        n_docs, avgdl = corpus_stats(docs)
    if n_docs == 0:
        return spark.createDataFrame([], "doc_id long, score double")

    terms = sorted(weights)
    term_arr = F.array(*[F.lit(t) for t in terms])
    weight_map = F.create_map(
        *[x for t in terms for x in (F.lit(t), F.lit(float(weights[t])))]
    )

    pairs = (
        docs.filter(F.arrays_overlap("tokens", term_arr))
        .select("doc_id", "doc_len", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(terms))
    )
    tf = pairs.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"), F.first("doc_len").alias("doc_len")
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .withColumn("idf", F.log(F.lit(float(n_docs)) / F.col("df")))
        .withColumn(
            "contrib",
            bm25_contrib_col(
                F.col("tf"), F.col("doc_len"), F.col("idf"),
                weight_map[F.col("term")], avgdl,
            ),
        )
    )
    per_doc = (
        scored.groupBy("doc_id")
        .agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, x: acc + x["contrib"],
            ).alias("score")
        )
        .filter(F.col("score") > 0.0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    return per_doc


def tokenized_docs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, tokens, doc_len) from any (id, text) table.

    doc_len uses the codegen'd regexp_count twin (round 6): F.size on
    the tokens column would make Catalyst inline the whole tokenize
    expression a second time into the same projection (HOFs get no
    codegen subexpression elimination)."""
    from zensearch_spark.functions.tokenizer import token_count_expr, with_tokens

    return (
        df.select(F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text"))
        .withColumn("tokens", with_tokens("text"))
        .withColumn("doc_len", token_count_expr("text"))
        .drop("text")
    )


def leaky_tokenize(query: str) -> list[str]:
    """The reference's query tokenizer, leak included (reference
    score.go:98-116): the split index is not advanced past the space
    (``cur = read``), so every token after the first keeps its leading
    space — "a b c" → ["a", " b", " c"]; consecutive spaces yield a
    bare " " token. No lowercasing here (the reference lowercases at
    compare time, tf.go:21 / idf.go:24) and no deduplication (each
    token accumulates separately, score.go:77-82)."""
    out, cur = [], 0
    for read in range(len(query)):
        if query[read] == " ":
            out.append(query[cur:read])
            cur = read
    out.append(query[cur:])
    return out


def quirks_compat_topk(
    docs_text: DataFrame,
    query: str,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """--quirks-compat scorer: reproduces the reference Go code's
    literal scoring semantics for A/B comparison (SURVEY.md §2
    semantics note; NOT the verification target):

    1. k1 = 1.5                      (reference tf.go:10)
    2. the WHOLE (tf+k1) is scaled by the degenerate length norm:
       denominator = (tf + k1) · ((1-b+b)·(dl/avgdl)) ≡
       (tf + k1) · (dl/avgdl)        (tf.go:23-26)
    3. unsmoothed idf = ln(N/df), df by lowercase SUBSTRING
       containment (idf.go:17,24)
    4. tf = lowercase substring occurrence count (tf.go:21),
       INCLUDING quirk 4b: the query tokenizer leaks leading spaces
       into every token after the first (score.go:104-106,
       leaky_tokenize above), so the substrings counted are e.g.
       " vector" not "vector"
    5. score = (Σ_t idf_t) · (Σ_t tfcomp_t) — TF accumulated across
       tokens (in query order, duplicates included) before the idf
       product (tf.go:25-26, score.go:77-82)

    Whole-doc substring counting keeps this SQL-expressible:
    tf(term) = (len(text) - len(replace(text, term))) / len(term).
    Not reproduced: a query with leading/double spaces yields ""/" "
    tokens whose Go strings.Count semantics (count of empty string =
    rune count + 1) have no cheap SQL twin — such tokens are rejected.
    """
    spark = docs_text.sparkSession
    k1, b = 1.5, 0.75
    terms = [t.lower() for t in leaky_tokenize(query)]
    assert all(t.strip() for t in terms), (
        "quirks mode does not support empty/whitespace-only tokens "
        "(docstring: strings.Count('', …) semantics)"
    )
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    lower = F.lower(F.col(text_col))
    dl = F.size(F.split(F.col(text_col), " "))  # spaces+1 (doc_length.go:5-16)
    dterms = sorted(set(terms))
    tf_expr = {
        t: (F.length("lt") - F.length(F.replace(F.col("lt"), F.lit(t))))
        / len(t)
        for t in dterms
    }
    # Round 6 (guide §1.2/§5): the substring occurrence counts are the
    # expensive part (one replace+length scan of every lowercased doc
    # per term) and were previously computed in THREE separate full
    # passes (count(), df collect, final score scan). Now one pass
    # materializes the narrow per-doc (dl, tf_i) table, persisted and
    # pinned; the stats aggregate and the score projection both read
    # it — the text is lowercased and substring-scanned exactly once.
    base = docs_text.select(
        F.col(id_col).alias("doc_id"), lower.alias("lt"), dl.alias("dl")
    ).select(
        "doc_id", "dl",
        *[tf_expr[t].alias(f"tf_{i}") for i, t in enumerate(dterms)],
    ).persist()
    tf_col = {t: F.col(f"tf_{dterms.index(t)}") for t in set(terms)}
    stats = base.agg(
        F.count("*").alias("_n"),
        F.avg("dl").alias("_avgdl"),
        *[
            F.sum(F.when(tf_col[t] > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    ).collect()[0]
    n_docs = int(stats["_n"])
    avg_dl = stats["_avgdl"]
    idf_sum = 0.0
    import math

    for i, t in enumerate(terms):
        dfv = int(stats[f"df_{i}"])
        if dfv > 0:
            idf_sum += math.log(n_docs / dfv)
    tfcomp_sum = None
    for t in terms:  # query order — the reference's accumulation order
        tf = tf_col[t]
        comp = (tf * (k1 + 1.0)) / (
            (tf + k1) * (1.0 - b + b) * (F.col("dl") / F.lit(float(avg_dl)))
        )
        tfcomp_sum = comp if tfcomp_sum is None else tfcomp_sum + comp
    from zensearch_spark.caching import pin

    return pin(
        base.select(
            "doc_id",
            F.round(F.lit(idf_sum) * tfcomp_sum, 6).alias("score"),
        )
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k),
        base,
    )
