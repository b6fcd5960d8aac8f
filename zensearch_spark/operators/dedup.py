"""Deduplication operators for large-scale corpus curation.

Beyond the reference's only dedup (duplicate-key skip on insert,
reference: database/src/database.ts:59-67) these are the operators a
training-data pipeline needs over a 100 TB corpus. All are pure
DataFrame plans (JVM expressions, no Python in the hot path) so
Catalyst handles pushdown/partial-agg, and every shuffle key is a
content hash — uniformly distributed, no skew salting needed.

Hash parity note: md5-derived 60-bit integers are used everywhere a
DuckDB oracle must reproduce the value (md5 is the one hash both
engines share). A production variant would swap in xxhash64/F.hash —
same plans, cheaper hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zensearch_spark.functions.tokenizer import with_tokens

# md5-hex prefix → signed-safe 60-bit int (matches DuckDB
# ('0x'||substr(md5(x),1,15))::BIGINT )
def _md5_int(col) -> F.Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def with_word_ngrams(docs: DataFrame, n: int = 5, text_col: str = "text") -> DataFrame:
    """docs + ``ngrams``: distinct word n-gram strings per doc."""
    toks = with_tokens(text_col)
    # guard: Spark sequence(1, 0) DESCENDS instead of returning empty,
    # so short docs need an explicit empty-array branch
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.withColumn("ngrams", grams)


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup by content hash: one surviving (minimum) id per
    distinct text + the group size. Shuffle key = md5 — uniform."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 5, threshold: float = 0.8,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Near-duplicate pairs by exact word-n-gram Jaccard ≥ threshold.

    Plan: ngram sets → explode → self-equi-join on ngram (the classic
    candidate generation; at scale the join key is a gram hash and
    Catalyst's AQE handles stragglers) → per-pair intersection count →
    Jaccard. Exact — the MinHash variant below is the approximate
    scale path.
    """
    grams = (
        with_word_ngrams(docs.select(id_col, text_col), n=n, text_col=text_col)
        .select(
            F.col(id_col).alias("doc"),
            F.size("ngrams").alias("set_size"),
            F.explode("ngrams").alias("gram"),
        )
    )
    a, b = grams.alias("a"), grams.alias("b")
    pairs = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(
            F.count("*").alias("inter"),
            F.first("a.set_size").alias("size_a"),
            F.first("b.set_size").alias("size_b"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return pairs


def minhash_signatures(
    docs: DataFrame, n: int = 5, num_hashes: int = 32,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, sig array<long>[num_hashes]) MinHash over word-n-gram
    sets; hash_i(gram) = md5_int(i ':' gram)."""
    grams = (
        with_word_ngrams(docs.select(id_col, text_col), n=n, text_col=text_col)
        .select(F.col(id_col).alias("doc_id"), F.explode("ngrams").alias("gram"))
    )
    aggs = [
        F.min(_md5_int(F.concat_ws(":", F.lit(str(i)), F.col("gram")))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = grams.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame, n: int = 5, num_hashes: int = 32, bands: int = 8,
    threshold: float = 0.8, id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, verified by exact
    n-gram Jaccard ≥ threshold. shingle → minhash → band → bucket-join
    → verify (SURVEY training-data ops)."""
    rows = num_hashes // bands
    sig = minhash_signatures(docs, n=n, num_hashes=num_hashes,
                             id_col=id_col, text_col=text_col)
    band_cols = F.array(
        *[
            F.struct(
                F.lit(bi).alias("band"),
                F.md5(
                    F.concat_ws(
                        ",", *[F.col("sig")[bi * rows + r].cast("string") for r in range(rows)]
                    )
                ).alias("bucket"),
            )
            for bi in range(bands)
        ]
    )
    banded = sig.select("doc_id", F.explode(band_cols).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    exact = ngram_jaccard_pairs(docs, n=n, threshold=threshold,
                                id_col=id_col, text_col=text_col)
    return cand.join(exact, ["doc_a", "doc_b"]).select("doc_a", "doc_b", "jaccard")


def simhash_fingerprints(
    docs: DataFrame, bits: int = 32, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, simhash long): token-frequency-weighted SimHash.

    Per token occurrence, md5-int hash; bit j votes +1 if set else −1;
    fingerprint bit j = 1 iff the vote sum > 0. Pure column algebra —
    tokens × bits rows, all JVM."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(with_tokens(text_col)).alias("tok")
    ).withColumn("h", _md5_int(F.col("tok")))
    # bit positions expanded as plan-time literals (shiftright needs a
    # literal shift; weight 2^bit rides along to avoid a variable shift
    # at aggregation time)
    bit_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("bit"),
                (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias("vote"),
                F.lit(1 << j).cast("long").alias("weight"),
            )
            for j in range(bits)
        ]
    )
    votes = (
        toks.select("doc_id", F.explode(bit_structs).alias("bv"))
        .select(
            "doc_id",
            F.col("bv.bit").alias("bit"),
            F.col("bv.vote").alias("vote"),
            F.col("bv.weight").alias("weight"),
        )
        .groupBy("doc_id", "bit", "weight")
        .agg(F.sum("vote").alias("v"))
    )
    return (
        votes.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("v") > 0, F.col("weight")).otherwise(F.lit(0).cast("long"))
            ).alias("simhash")
        )
    )
