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


def with_tokens(col: str = "text") -> Column:
    return tokenize_udf(F.col(col))


def tokens_sql_expr(col: str = "text") -> Column:
    """Pure-JVM equivalent (regex split), used where a no-Python plan
    matters more than the pandas path; identical results on our
    corpus (single-space separated)."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(col))), r"\s+"), lambda t: t != F.lit("")
    )
