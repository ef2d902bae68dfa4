"""The blocked Arrow/numpy cosine kernel (r14) must be BIT-identical
to the JVM ``aggregate``-fold forms it replaced: same IEEE operation
sequence (left-to-right over dimensions), same tie handling, any
block count."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_python_azure_spark.operators.dedup import (
    dot_expr,
    embedding_cosine_pairs,
    with_norm,
)
from etl_python_azure_spark.operators.similarity import (
    _plane_weights,
    _plane_weights_expr,
    cosine_topk,
    plane_projection,
)
from etl_python_azure_spark.session import load_tables

SF_DIR = "/root/testdata/sf0.001"


def _fold_pairs(df, id_col, vec_col, threshold):
    """The pre-r14 crossJoin + aggregate-fold reference form."""
    n = with_norm(df.select(id_col, vec_col), vec_col)
    a = n.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        F.col("__norm").alias("__na"),
    )
    b = n.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        F.col("__norm").alias("__nb"),
    )
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    cos = (dot_expr("__va", "__vb") / (F.col("__na") * F.col("__nb"))).alias(
        "cosine"
    )
    return pairs.select("id_a", "id_b", cos).filter(
        F.col("cosine") >= threshold
    )


def _as_strings(df):
    """Rows with the double rendered to string — catches any bit
    difference including -0.0 vs 0.0 and NaN."""
    cols = [
        F.col(c).cast("string").alias(c) for c in df.columns
    ]
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.mark.parametrize("blocks", [1, 3, 8])
def test_pairs_kernel_bit_identical(spark, blocks):
    em = load_tables(spark, SF_DIR, "embeddings")
    got = embedding_cosine_pairs(em, threshold=0.46, blocks=blocks)
    want = _fold_pairs(em, "vec_id", "embedding", 0.46)
    assert _as_strings(got) == _as_strings(want)
    assert len(_as_strings(want)) > 0  # non-vacuous


def test_pairs_kernel_full_pairspace_bits(spark):
    """No-threshold variant: EVERY pair's cosine must match bits."""
    em = load_tables(spark, SF_DIR, "embeddings").filter(
        F.col("vec_id") < 60
    )
    got = embedding_cosine_pairs(em, threshold=-2.0, blocks=4)
    want = _fold_pairs(em, "vec_id", "embedding", -2.0)
    gs, ws = _as_strings(got), _as_strings(want)
    assert len(ws) == 60 * 59 // 2
    assert gs == ws


def _fold_topk(corpus, queries, id_col, vec_col, k):
    """The pre-r14 broadcast crossJoin + window reference form."""
    c = with_norm(corpus.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__vc"),
        F.col("__norm").alias("__nc"),
    )
    q = with_norm(queries.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__vq"),
        F.col("__norm").alias("__nq"),
    )
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot_expr("__vq", "__vc") / (F.col("__nq") * F.col("__nc"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return sims.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


@pytest.mark.parametrize("blocks", [1, 5])
def test_topk_kernel_bit_identical(spark, blocks):
    em = load_tables(spark, SF_DIR, "embeddings")
    got = cosine_topk(em, em, k=3, blocks=blocks)
    want = _fold_topk(em, em, "vec_id", "embedding", 3)
    assert _as_strings(got) == _as_strings(want)


def test_topk_kernel_tie_break(spark):
    """Exact cosine ties must break on ascending neighbor_id in the
    blocked path too: duplicate vectors give cosine == 1.0 exactly."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [1.0, 0.0]),
        (4, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = cosine_topk(df, df, k=2, blocks=2)
    want = _fold_topk(df, df, "vec_id", "embedding", 2)
    assert _as_strings(got) == _as_strings(want)
    top = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in got.collect()
    }
    assert top[(1, 1)] == 2 and top[(1, 2)] == 3  # id-ascending ties


def test_kernel_survives_count_pruning(spark):
    """count()-shaped consumers prune every output column; the
    self-cogroup must still ship full rows to the kernel (regression:
    identical column names on both sides left the function's right
    argument list referencing left attribute ids, and column pruning
    stripped the right child to its grouping key → KeyError)."""
    em = load_tables(spark, SF_DIR, "embeddings")
    n_pairs = embedding_cosine_pairs(em, threshold=-2.0, blocks=4).count()
    n = em.count()
    assert n_pairs == n * (n - 1) // 2
    assert cosine_topk(em, em, k=3, blocks=4).count() == n * 3


def test_plane_weight_literals_match_engine_md5(spark):
    """The Python-precomputed ±1 weights must equal the engine-side
    md5-parity reference expression for every plane the engine uses."""
    for plane in range(8):
        got = _plane_weights(plane, 64)
        want = spark.sql(
            f"SELECT {_plane_weights_expr(plane, 64)} AS w"
        ).first()["w"]
        assert got == list(want)


def test_plane_projection_bit_identical(spark):
    """Literal-weight projection ≡ md5-expression projection, bitwise."""
    em = load_tables(spark, SF_DIR, "embeddings")
    ref = F.expr(
        f"aggregate(zip_with(embedding, {_plane_weights_expr(2, 64)}, "
        f"(x, w) -> CAST(x AS DOUBLE) * w), 0D, (acc, v) -> acc + v)"
    )
    bad = (
        em.select(
            plane_projection(2, 64).cast("string").alias("a"),
            ref.cast("string").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .count()
    )
    assert bad == 0


def test_ivf_arrow_rank_bit_identical(spark):
    """ivf_topk(arrow_rank=True) must equal the JVM fold path bitwise
    (same probes, same cosines, same tie order), and must survive
    count()-shaped column pruning."""
    from etl_python_azure_spark.operators.similarity import ivf_topk

    em = load_tables(spark, SF_DIR, "embeddings")
    got = ivf_topk(em, em, k=3, num_centroids=8, nprobe=3, arrow_rank=True)
    want = ivf_topk(em, em, k=3, num_centroids=8, nprobe=3)
    assert _as_strings(got) == _as_strings(want)
    assert len(_as_strings(want)) > 0
    assert got.count() == want.count()
