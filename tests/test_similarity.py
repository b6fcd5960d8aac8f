"""ANN sketch index: recall gate + partition-pruning plan check.

Round-1 VERDICT item 5: the approximate operator needs a quantitative
gate (recall@k vs the exact cosine baseline) and a persisted,
bucket-partitioned sketch whose probe scan provably prunes partitions.

Recall is gated on CLUSTERED synthetic embeddings — the data shape ANN
indexes exist for. The driver's testdata embeddings are i.i.d.
gaussian (measured: mean top-20 neighbor cosine 0.27 vs 0.0 overall),
where NO sub-linear angular LSH can reach high recall — on that table
the test asserts a documented, weaker floor instead of pretending.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"
DIM = 64


@pytest.fixture(scope="module")
def clustered(spark):
    """500 vectors in 25 tight clusters (within-cluster cosine ~0.9)."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((25, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for i in range(500):
        c = centers[i % 25]
        v = c + 0.25 * rng.standard_normal(DIM) / np.sqrt(DIM)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def clustered_sketch(clustered, tmp_path_factory):
    from zensearch_spark.operators.similarity import build_ann_index

    path = str(tmp_path_factory.mktemp("ann") / "sketch")
    build_ann_index(clustered, path, dim=DIM, n_planes=8, n_tables=4)
    return path


def _qvec(emb, vec_id: int) -> list[float]:
    row = emb.filter(F.col("vec_id") == vec_id).collect()[0]
    return [float(x) for x in row["embedding"]]


def test_ann_recall_clustered(spark, clustered, clustered_sketch):
    """recall@10 ≥ 0.9 vs exact cosine at the DEFAULT probe budget
    (8 planes × 4 tables, hamming 1 → ≤ 4·9/256 ≈ 14% of the data)."""
    from zensearch_spark.operators.similarity import ann_topk_indexed, cosine_topk

    k = 10
    recalls = []
    for vid in (0, 7, 42, 99, 123):
        q = _qvec(clustered, vid)
        exact = {r["vec_id"] for r in cosine_topk(clustered, q, k=k).collect()}
        approx = {
            r["vec_id"]
            for r in ann_topk_indexed(spark, clustered_sketch, q, k=k).collect()
        }
        recalls.append(len(exact & approx) / k)
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.9, (avg, recalls)


def test_ann_recall_floor_on_uniform_testdata(spark, tmp_path_factory):
    """On the driver's i.i.d.-gaussian embeddings (no angular
    structure) the same budget is asserted only against a documented
    floor — full recall on structureless data would require scanning
    nearly everything, which is cosine_topk's job."""
    from zensearch_spark.operators.similarity import (
        ann_topk_indexed, build_ann_index, cosine_topk,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path_factory.mktemp("annu") / "sketch")
    build_ann_index(emb, path, dim=DIM, n_planes=8, n_tables=4)
    k = 20

    def recall(probe_hamming: int) -> float:
        recalls = []
        for vid in (0, 42, 123):
            q = _qvec(emb, vid)
            exact = {r["vec_id"] for r in cosine_topk(emb, q, k=k).collect()}
            approx = {
                r["vec_id"]
                for r in ann_topk_indexed(
                    spark, path, q, k=k, probe_hamming=probe_hamming
                ).collect()
            }
            recalls.append(len(exact & approx) / k)
        return sum(recalls) / len(recalls)

    r1 = recall(1)   # ~14% of data scanned (measured ~0.4 recall)
    r2 = recall(2)   # ~58% scanned — budget↑ must buy recall↑
    assert r1 >= 0.3, r1
    assert r2 > r1 and r2 >= 0.6, (r1, r2)


def test_ann_probe_scan_prunes_partitions(spark, clustered, clustered_sketch):
    """Unprobed bucket directories must never be read — the property
    that makes this viable at 100 TB. Round 6 prunes at LISTING time
    (the probe dirs are read as direct partition paths, so discovery
    cost is ∝ probe set, not index width); the check asserts on the
    scan's actual input files instead of a PartitionFilters entry."""
    import re

    from zensearch_spark.operators.similarity import ann_topk_indexed, probe_buckets

    q = _qvec(clustered, 0)
    df = ann_topk_indexed(spark, clustered_sketch, q, k=5)
    probes = {
        t: set(probe_buckets(q, n_planes=8, probe_hamming=1, table=t))
        for t in range(4)
    }
    files = df.inputFiles()
    assert files, "probe scan read no files"
    for f in files:
        m = re.search(r"table_id=(\d+)/bucket=(\d+)/", f)
        assert m, f
        assert int(m.group(2)) in probes[int(m.group(1))], f
    assert len(probe_buckets(q, n_planes=8, probe_hamming=1)) == 9


def test_embedding_neardup_lsh_vs_exact(spark, clustered):
    """LSH-blocked near-dup pairs: precision must be 1 (candidates are
    exact-cosine verified) and recall high on clustered embeddings —
    within-cluster pairs collide in ≥1 of the 4 tables. Both verify
    engines (packed-block GEMM default, Catalyst fold cross-check)
    must return the identical pair set."""
    from zensearch_spark.caching import release
    from zensearch_spark.operators.similarity import (
        embedding_neardup_lsh, embedding_neardup_pairs,
    )

    thr = 0.8
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_neardup_pairs(clustered, threshold=thr).collect()
    }
    assert len(exact) > 100, "clustered fixture must produce near-dup pairs"
    lsh_df = embedding_neardup_lsh(
        clustered, threshold=thr, dim=DIM, n_planes=8, n_tables=4, block=128
    )
    lsh = {(r["vec_a"], r["vec_b"]) for r in lsh_df.collect()}
    release(lsh_df)
    assert lsh <= exact, "precision must be 1 (exact verify)"
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.8, recall

    fold = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_neardup_lsh(
            clustered, threshold=thr, dim=DIM, n_planes=8, n_tables=4,
            verify="fold",
        ).collect()
    }
    assert fold == lsh, "verify engines must agree on the pair set"


def test_lsh_gemm_verify_plan_has_no_catalyst_lambda(spark, clustered):
    """The composed LSH→GEMM path (judge round-3 item 2) must not plan
    a per-pair higher-order-function fold. The LSH plan still contains
    zip_with/aggregate for the SKETCH (one bucket dot product per row,
    referenced once — that part is correct); the per-PAIR cosine must
    run in the packed-block NumPy engine. Checked two ways: the LSH
    plan carries MapInPandas (the verify engine), and the verify
    engine's own plan — from candidate pairs to cosines — has no
    higher-order functions at all."""
    from pyspark.sql import functions as F  # noqa: F811
    from zensearch_spark.operators.similarity import (
        embedding_neardup_lsh, verify_pairs_gemm,
    )

    def fmt(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    lsh_plan = fmt(
        embedding_neardup_lsh(
            clustered, threshold=0.8, dim=DIM, n_planes=8, n_tables=4,
            block=128,
        )
    )
    assert "MapInPandas" in lsh_plan

    pairs = spark.createDataFrame(
        [(0, 25), (1, 26), (3, 128)], "vec_a long, vec_b long"
    )
    verify_plan = fmt(verify_pairs_gemm(clustered, pairs, 0.8, block=128))
    assert "MapInPandas" in verify_plan
    assert "zip_with" not in verify_plan
    assert "aggregate(" not in verify_plan


def test_verify_pairs_gemm_release_frees_cache(spark, clustered):
    """verify_pairs_gemm pins its persisted pack; caching.release must
    leave no cached RDDs behind (ADVICE r3 lifecycle contract)."""
    from zensearch_spark.caching import release
    from zensearch_spark.operators.similarity import (
        embedding_neardup_pairs, verify_pairs_gemm,
    )

    # delta assertion: other modules' session-scoped fixtures may hold
    # their own caches — this test owns only what IT creates
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    pairs = embedding_neardup_pairs(clustered, threshold=0.8).select(
        "vec_a", "vec_b"
    )
    df = verify_pairs_gemm(clustered, pairs, threshold=0.8, block=128)
    got = {(r["vec_a"], r["vec_b"], r["cosine"]) for r in df.collect()}
    exact = {
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in embedding_neardup_pairs(clustered, threshold=0.8).collect()
    }
    assert got == exact, "verify over the full exact pair list = exact result"
    during = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert during == before + 1, (before, during)
    release(df)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before


def test_gemm_matches_exact_pairs(spark, clustered):
    """Block-matrix GEMM engine returns exactly the zip_with/aggregate
    engine's pairs and 6-dp cosines (block=128 → a real multi-block
    grid over the 500-vector fixture)."""
    from zensearch_spark.operators.similarity import (
        embedding_neardup_gemm, embedding_neardup_pairs,
    )

    thr = 0.8
    exact = sorted(
        (r["vec_a"], r["vec_b"], r["cosine"])
        for r in embedding_neardup_pairs(clustered, threshold=thr).collect()
    )
    from zensearch_spark.caching import release

    gemm_df = embedding_neardup_gemm(clustered, threshold=thr, block=128)
    gemm = sorted(
        (r["vec_a"], r["vec_b"], r["cosine"]) for r in gemm_df.collect()
    )
    release(gemm_df)
    assert len(exact) > 100
    assert gemm == exact


def test_batch_matches_single_probes(spark, clustered, clustered_sketch):
    """ann_topk_batch (one job, union probe filter, per-query window
    re-rank) must return exactly the per-query ann_topk_indexed rows."""
    from zensearch_spark.operators.similarity import ann_topk_batch, ann_topk_indexed

    qids = [0, 7, 42]
    queries = [(vid, _qvec(clustered, vid), 10) for vid in qids]
    batch = {}
    for r in ann_topk_batch(spark, clustered_sketch, queries).collect():
        batch.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    for vid, q, k in queries:
        single = [
            (r["vec_id"], r["cosine"])
            for r in ann_topk_indexed(spark, clustered_sketch, q, k=k).collect()
        ]
        assert batch.get(vid, []) == single, vid


def test_indexed_matches_inline_ann(spark, clustered, clustered_sketch):
    """Persisted-sketch path returns the same rows as the inline
    sketch path (same planes/seed → same buckets → same candidates)."""
    from zensearch_spark.operators.similarity import ann_topk, ann_topk_indexed

    q = _qvec(clustered, 7)
    a = [(r["vec_id"], r["cosine"]) for r in ann_topk(clustered, q, k=10).collect()]
    b = [
        (r["vec_id"], r["cosine"])
        for r in ann_topk_indexed(spark, clustered_sketch, q, k=10).collect()
    ]
    assert a == b


# ------------------------------------------------------------------ IVF


@pytest.fixture(scope="module")
def ivf_index(spark, clustered, tmp_path_factory):
    from zensearch_spark.operators.ivf import build_ivf_index, train_ivf_centroids

    cent = train_ivf_centroids(clustered, n_centroids=32, iters=8, seed=7)
    path = str(tmp_path_factory.mktemp("ivf") / "cells")
    build_ivf_index(clustered, path, cent)
    return path, cent


def test_ivf_recall_clustered(spark, clustered, ivf_index):
    """IVF recall@10 ≥ 0.9 on clustered embeddings at nprobe=4 of 32
    cells (⅛ of the data scanned) — the coarse-quantizer twin of the
    LSH recall gate."""
    from zensearch_spark.operators.ivf import ivf_topk
    from zensearch_spark.operators.similarity import cosine_topk

    path, cent = ivf_index
    k = 10
    recalls = []
    for vid in (0, 7, 42, 99, 123):
        q = _qvec(clustered, vid)
        exact = {r["vec_id"] for r in cosine_topk(clustered, q, k=k).collect()}
        approx = {
            r["vec_id"]
            for r in ivf_topk(spark, path, cent, q, k=k, nprobe=4).collect()
        }
        recalls.append(len(exact & approx) / k)
    avg = sum(recalls) / len(recalls)
    assert avg >= 0.9, (avg, recalls)


def test_ivf_training_deterministic(spark, clustered):
    from zensearch_spark.operators.ivf import train_ivf_centroids

    a = train_ivf_centroids(clustered, n_centroids=16, iters=5, seed=3)
    b = train_ivf_centroids(clustered, n_centroids=16, iters=5, seed=3)
    np.testing.assert_array_equal(a, b)


def test_ivf_probe_prunes_partitions(spark, clustered, ivf_index):
    """Unprobed cell directories must never be read. Round 6 prunes
    at listing time (direct partition paths for the nprobe cells), so
    the check asserts on the scan's actual input files."""
    import re

    from zensearch_spark.operators.ivf import ivf_topk, probe_cells

    path, cent = ivf_index
    q = _qvec(clustered, 0)
    df = ivf_topk(spark, path, cent, q, k=5, nprobe=3)
    cells = set(probe_cells(cent, q, nprobe=3))
    files = df.inputFiles()
    assert files, "probe scan read no files"
    for f in files:
        m = re.search(r"centroid_id=(\d+)/", f)
        assert m, f
        assert int(m.group(1)) in cells, f


def test_ivf_training_layout_invariant(spark, clustered):
    """Centroids must not depend on file/partition layout even when
    the modulus-filtered sample exceeds max_sample (round-4 ADVICE:
    the cap was a bare distributed limit(), whose row choice follows
    partition enumeration order). The cap path is forced with
    max_sample < n_rows and exercised under three different layouts."""
    from zensearch_spark.operators.ivf import train_ivf_centroids

    kw = dict(n_centroids=8, iters=4, seed=11, max_sample=120)
    a = train_ivf_centroids(clustered, **kw)
    b = train_ivf_centroids(clustered.repartition(7), **kw)
    c = train_ivf_centroids(
        clustered.orderBy(F.desc("vec_id")).repartition(3), **kw
    )
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)
