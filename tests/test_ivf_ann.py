"""IVF ANN: cell assignment invariants + recall on clustered data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_python_azure_spark.operators.similarity import (
    cosine_topk,
    ivf_centroids,
    ivf_topk,
)


@pytest.fixture(scope="module")
def clustered(spark):
    # 4 tight clusters in 8-d: base direction per cluster + tiny jitter.
    # Lowest-id vectors (the deterministic centroids) cover all clusters.
    rows = []
    bases = [
        [1, 0, 0, 0, 0, 0, 0, 0],
        [0, 1, 0, 0, 0, 0, 0, 0],
        [0, 0, 1, 0, 0, 0, 0, 0],
        [0, 0, 0, 1, 0, 0, 0, 0],
    ]
    vid = 0
    for member in range(10):
        for cl, base in enumerate(bases):
            jitter = [(((vid * 7 + d) % 5) - 2) * 0.01 for d in range(8)]
            rows.append((vid, [float(b) + j for b, j in zip(base, jitter)]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_centroids_are_lowest_ids(clustered):
    cents = ivf_centroids(clustered, num_centroids=4)
    assert [r.centroid_id for r in cents.collect()] == [0, 1, 2, 3]


def test_topk_shape_and_self_exclusion(clustered):
    out = ivf_topk(
        clustered,
        clustered.filter(F.col("vec_id") < 4),
        k=3,
        num_centroids=4,
        nprobe=2,
    )
    rows = out.collect()
    assert len(rows) == 12  # 4 queries × 3
    assert all(r.neighbor_id != r.query_id for r in rows)
    per_q = {q: sorted(r.rank for r in rows if r.query_id == q) for q in range(4)}
    assert all(v == [1, 2, 3] for v in per_q.values())


def test_recall_is_perfect_when_probing_own_cluster(clustered):
    # centroids 0..3 are one per cluster, so nprobe=1 already reaches
    # every same-cluster neighbor → IVF == brute force here
    q = clustered.filter(F.col("vec_id") < 4)
    bf = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(clustered, q, k=5).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(
            clustered, q, k=5, num_centroids=4, nprobe=1
        ).collect()
    }
    assert ivf == bf


def test_each_corpus_vector_in_one_cell(clustered):
    from etl_python_azure_spark.operators.similarity import (
        _nearest_cells,
        with_norm,
    )

    cents = ivf_centroids(clustered, num_centroids=4)
    asg = _nearest_cells(
        with_norm(clustered, "embedding"), cents, "vec_id", "embedding", 1
    )
    assert asg.count() == clustered.count()
    assert asg.select("vec_id").distinct().count() == clustered.count()


def test_kmeans_centroids_recover_clusters(clustered):
    from etl_python_azure_spark.operators.similarity import kmeans_centroids

    # seed = vectors 0..3 (one per cluster); Lloyd rounds must keep one
    # centroid per cluster and pull each toward its cluster mean, so
    # IVF with the trained quantizer still equals brute force at nprobe=1
    cents = kmeans_centroids(clustered, num_centroids=4, max_iter=5)
    rows = cents.orderBy("centroid_id").collect()
    assert [r.centroid_id for r in rows] == [0, 1, 2, 3]
    for r in rows:
        assert len(r["__cvec"]) == 8
        assert r["__cnorm"] > 0
    # each trained centroid's dominant axis is its cluster's base axis
    dominant = [max(range(8), key=lambda d: abs(r["__cvec"][d])) for r in rows]
    assert dominant == [0, 1, 2, 3]

    q = clustered.filter(F.col("vec_id") < 4)
    bf = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(clustered, q, k=5).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(clustered, q, k=5, nprobe=1, centroids=cents).collect()
    }
    assert ivf == bf


def test_kmeans_centroids_deterministic(clustered):
    from etl_python_azure_spark.operators.similarity import kmeans_centroids

    a = kmeans_centroids(clustered, num_centroids=4, max_iter=3)
    b = kmeans_centroids(clustered, num_centroids=4, max_iter=3)
    assert [tuple(r["__cvec"]) for r in a.orderBy("centroid_id").collect()] == [
        tuple(r["__cvec"]) for r in b.orderBy("centroid_id").collect()
    ]


def test_incremental_index_append_equals_rebuild(clustered):
    from etl_python_azure_spark.operators.similarity import (
        ivf_assign,
        ivf_topk_from_index,
    )

    # freeze the quantizer on the first 28 vectors, assign the rest
    # as an "ingest batch"; searching old∪appended must equal a
    # from-scratch assignment of the full corpus (same centroids)
    old = clustered.filter(F.col("vec_id") < 28)
    batch = clustered.filter(F.col("vec_id") >= 28)
    cents = ivf_centroids(clustered, num_centroids=4)
    idx = ivf_assign(old, cents).unionByName(ivf_assign(batch, cents))
    full = ivf_assign(clustered, cents)
    q = clustered.filter(F.col("vec_id") < 4)
    inc = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk_from_index(idx, q, cents, k=5, nprobe=2).collect()
    }
    reb = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk_from_index(full, q, cents, k=5, nprobe=2).collect()
    }
    assert inc == reb and len(inc) == 20


def test_standardize_embeddings_zero_mean_unit_std(clustered):
    from etl_python_azure_spark.operators.similarity import (
        standardize_embeddings,
    )

    out = standardize_embeddings(clustered, "vec_id", "embedding")
    assert out.columns == clustered.columns
    stats = (
        out.select(F.posexplode("embedding").alias("pos", "v"))
        .groupBy("pos")
        .agg(F.avg("v").alias("m"), F.stddev_samp("v").alias("s"))
        .collect()
    )
    assert len(stats) == 8
    for r in stats:
        assert abs(r.m) < 1e-9
        assert abs(r.s - 1.0) < 1e-9
