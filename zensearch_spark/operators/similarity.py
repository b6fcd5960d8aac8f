"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exact baseline, plus an LSH-bucketed
(random-hyperplane / sign-sketch) variant as the scale path: at 100 TB
the brute force is a full scan per probe; the sketch turns it into a
bucket-pruned scan with exact re-rank inside candidate buckets.
All JVM column algebra (F.zip_with / F.aggregate) — no Python UDF.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    raw = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q))
    # sort on the raw value, round only for display — rounding before
    # the sort would turn 1e-7 gaps into ties and break oracle parity
    return (
        emb.select(
            F.col(id_col).alias("vec_id"),
            raw.alias("_raw"),
            F.round(raw, 6).alias("cosine"),
        )
        .orderBy(F.desc("_raw"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "cosine")
    )


def hyperplane_sketch(
    emb: DataFrame,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, bucket int): sign sketch over n_planes deterministic
    random hyperplanes — the LSH bucketing used by ann_topk."""
    rng = np.random.default_rng([seed, dim, n_planes])
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        p = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = (_dot(F.col(vec_col), p) > 0).cast("long")
        bucket = bucket + F.shiftleft(bit, i)
    return emb.select(F.col(id_col).alias("vec_id"), bucket.alias("bucket"),
                      F.col(vec_col).alias("embedding"))


def ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 20,
    n_planes: int = 8,
    probe_hamming: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate NN: probe the query's sketch bucket and every
    bucket within ``probe_hamming`` bit flips, exact-cosine re-rank
    inside. Recall/probe-cost trade-off is (n_planes, probe_hamming).
    """
    dim = len(query_vec)
    rng = np.random.default_rng([seed, dim, n_planes])
    planes = rng.standard_normal((n_planes, dim))
    qsig = 0
    qv = np.asarray(query_vec, dtype=np.float64)
    for i in range(n_planes):
        if float(planes[i] @ qv) > 0:
            qsig |= 1 << i
    probes = {qsig}
    if probe_hamming >= 1:
        probes |= {qsig ^ (1 << i) for i in range(n_planes)}
    if probe_hamming >= 2:
        probes |= {
            qsig ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        }
    sk = hyperplane_sketch(emb, dim, n_planes=n_planes, seed=seed,
                           id_col=id_col, vec_col=vec_col)
    cand = sk.filter(F.col("bucket").isin(sorted(probes)))
    return cosine_topk(cand, query_vec, k=k, id_col="vec_id", vec_col="embedding")
