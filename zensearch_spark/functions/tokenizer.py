"""Vectorized tokenization/normalization (SURVEY.md §2.9).

Canonicalizes the reference's two tokenizers (the space-leaking query
tokenizer at search-engine/internal/bm25/score.go:98-116 and the
correct util twin at search-engine/utils/string_to_slice.go:3-14)
plus its lowercase-at-compare-time normalization (idf.go:24,
tf.go:21) into one rule: lowercase, split on any whitespace run,
drop empties — applied ONCE, corpus-side, as an Arrow-batched pandas
UDF (no per-row Python in the plan).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    # str.lower + no-arg str.split == Python str.split: any-whitespace,
    # empties dropped — exactly the oracle tokenizer.
    return texts.fillna("").str.lower().str.split()


def tokenize_query(query: str) -> list[str]:
    """Driver-side query tokenization — same rule as tokenize_udf."""
    return query.lower().split()


def tokens_sql_expr(col: str = "text") -> Column:
    """Pure-JVM tokenizer (regex split) — stays inside whole-stage
    codegen, no Python round trip. Semantics match the pandas/oracle
    tokenizer for ASCII whitespace (the only whitespace our corpora
    contain); Java's \\s is [ \\t\\n\\x0B\\f\\r] while Python's
    str.split() also covers exotic Unicode spaces — if a future
    corpus carries those, switch the hot path back to tokenize_udf."""
    return F.filter(
        F.split(F.lower(F.coalesce(F.col(col), F.lit(""))), r"\s+"),
        lambda t: t != F.lit(""),
    )


def with_tokens(col: str = "text") -> Column:
    """Hot-path tokenizer used by the index build and naive scorer."""
    return tokens_sql_expr(col)


def token_count_expr(col: str = "text") -> Column:
    """Token COUNT without materializing the token array (round 6):
    the number of non-whitespace runs equals len(split-on-\\s+, drop
    empties) exactly — Java \\S ≡ [^\\s] — and regexp_count is a
    single codegen'd pass while F.filter(F.split(...)) evaluates an
    interpreted lambda per token (measured ~70% of the doc_map
    stage's task-time at 8.6M docs). Lowercasing does not change the
    count, so it is skipped."""
    return F.regexp_count(F.coalesce(F.col(col), F.lit("")), F.lit(r"\S+"))
