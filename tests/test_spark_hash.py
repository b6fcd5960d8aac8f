"""Driver-side Murmur3 must agree byte-for-byte with Spark's hash()."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from zensearch_spark.functions.spark_hash import spark_hash_string, term_bucket


def test_matches_jvm_hash(spark):
    rng = np.random.default_rng(5)
    samples = [
        "", "a", "ab", "abc", "abcd", "abcde", "jozjo", "zzabsentzz",
        "héllo wörld", "字符串", "x" * 1000,
    ] + ["".join(chr(97 + c) for c in rng.integers(0, 26, size=int(n)))
         for n in rng.integers(1, 40, size=50)]
    df = spark.createDataFrame([(s,) for s in samples], "term string")
    rows = df.withColumn("h", F.hash("term")).withColumn(
        "b", F.pmod(F.hash("term"), F.lit(16))
    ).collect()
    for r in rows:
        assert spark_hash_string(r["term"]) == r["h"], r["term"]
        assert term_bucket(r["term"], 16) == r["b"], r["term"]
