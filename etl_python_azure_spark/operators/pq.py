"""Product quantization (PQ) — the memory-compressed ANN scan that
pairs with the IVF inverted file (`operators/similarity.py`) to form
the standard IVF-PQ index at 100 TB scale.

A 64-dim float vector (256 B) compresses to ``m`` one-byte codes
(8 B at m=8): each of the *m* subspaces gets its own tiny k-means
codebook, vectors store only their per-subspace nearest-centroid
ids, and queries score the whole corpus through an ``m × ksub``
lookup table (asymmetric distance computation, ADC) instead of
touching raw vectors. The raw corpus is only needed at (re)train
and encode time — search reads codes.

Training follows the replayable-arithmetic discipline of the
spherical trainer (`kmeans_centroids`): deterministic lowest-id
seeding, exact fixed-point centroid means, fixed round count — so a
SQL oracle replays the whole pipeline (train → encode → ADC)
bit-for-bit. ADC distances quantize per-subspace terms to an 1e-12
integer grid before summing, making the total independent of
aggregation order.

Scale shape: training touches the corpus twice per round (assign +
means) with only the m·ksub·dsub codebook on the driver; encoding is
one broadcast join; ADC is a map-side LUT join over the CODES table
(m·ksub cells per query, broadcast) + one integer-sum aggregate per
(query, vector).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import with_norm
from .similarity import fixed_point_mean

_ADC_Q = 1e12  # fixed-point grid for per-subspace distance terms


def l2_expr(a: str, b: str) -> Column:
    """Sequential-fold squared L2 distance of two array columns."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) "
        f"* (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        f"0D, (acc, v) -> acc + v)"
    )


def normalize_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Unit-normalize vectors (exact per-element double division), so
    squared L2 is monotone in cosine (‖a−b‖² = 2−2·cos for unit
    vectors) and PQ's L2 machinery ranks by cosine."""
    n = with_norm(df.select(id_col, vec_col), vec_col)
    return n.select(
        id_col,
        F.expr(
            f"transform({vec_col}, x -> CAST(x AS DOUBLE) / __norm)"
        ).alias(vec_col),
    )


def _subvectors(
    df: DataFrame, id_col: str, vec_col: str, m: int, dsub: int
) -> DataFrame:
    """Explode each vector into its m subvectors: (id, sub, sv)."""
    subs = F.array(*[F.lit(s) for s in range(m)])
    return df.select(
        F.col(id_col), F.explode(subs).alias("sub"), F.col(vec_col)
    ).select(
        id_col,
        "sub",
        F.expr(f"slice({vec_col}, sub * {dsub} + 1, {dsub})").alias("sv"),
    )


def _nearest_code(sv_df: DataFrame, codebook: DataFrame) -> DataFrame:
    """Per (id, sub): the nearest codebook centroid by squared L2
    (ties break on code id). One broadcast join + one hash aggregate:
    the argmin is ``min(struct(dist, code))`` — lexicographic struct
    ordering gives the tiebreak for free, and a map-side-combinable
    aggregate beats the window (shuffle + sort) formulation it
    replaces by ~2× on the training loop's hot path. ``first(sv)``
    is safe: every row in a (id, sub) group carries the same sv."""
    id_col = sv_df.columns[0]
    j = sv_df.join(F.broadcast(codebook), "sub").select(
        id_col,
        "sub",
        "sv",
        "code",
        l2_expr("sv", "cvec").alias("__d"),
    )
    return (
        j.groupBy(id_col, "sub")
        .agg(
            F.first("sv").alias("sv"),
            F.min(F.struct("__d", "code")).alias("__b"),
        )
        .select(id_col, "sub", "sv", F.col("__b.code").alias("code"))
    )


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    rounds: int = 3,
) -> DataFrame:
    """Train per-subspace codebooks with *rounds* Lloyd iterations.

    Seeding is deterministic (the lowest-*ksub* ids' subvectors);
    means are exact fixed-point (`fixed_point_mean`); empty codes
    keep their previous centroid — the `kmeans_centroids` recipe per
    subspace, so the result is bit-reproducible and SQL-replayable.

    Returns the codebook: (sub, code, cvec array<double>).
    """
    dim = len(corpus.select(vec_col).first()[0])
    dsub = dim // m
    spark = corpus.sparkSession
    sv = _subvectors(corpus, id_col, vec_col, m, dsub).persist()
    seed = (
        _subvectors(
            corpus.orderBy(id_col).limit(ksub), id_col, vec_col, m, dsub
        )
        .orderBy("sub", id_col)
        .collect()
    )
    book: dict[tuple[int, int], list[float]] = {}
    per_sub: dict[int, int] = {s: 0 for s in range(m)}
    for r in seed:
        s = r["sub"]
        book[(s, per_sub[s])] = [float(x) for x in r["sv"]]
        per_sub[s] += 1

    def _book_df() -> DataFrame:
        rows = [(s, c, v) for (s, c), v in sorted(book.items())]
        return spark.createDataFrame(
            rows, "sub int, code int, cvec array<double>"
        )

    try:
        for _ in range(rounds):
            assigned = _nearest_code(sv, _book_df())
            means = (
                assigned.groupBy("sub", "code")
                .agg(
                    *[
                        fixed_point_mean(F.col("sv")[i], f"c{i}")
                        for i in range(dsub)
                    ]
                )
                .collect()
            )
            for row in means:
                book[(row["sub"], row["code"])] = [
                    float(row[f"c{i}"]) for i in range(dsub)
                ]
    finally:
        sv.unpersist()
    return _book_df()


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dsub: int = 8,
) -> DataFrame:
    """Encode vectors against a FROZEN codebook: (id, sub, code).

    The incremental-maintenance path mirrors `ivf_assign`: new
    batches encode against the frozen book and append — the corpus
    is never re-encoded unless the book is retrained.
    """
    sv = _subvectors(corpus, id_col, vec_col, m, dsub)
    return _nearest_code(sv, codebook).select(id_col, "sub", "code")


def pq_adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dsub: int = 8,
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance top-*k*: exact query subvectors scored
    against the corpus CODES via an m×ksub lookup table per query.

    Per-subspace LUT terms are floor-quantized to an 1e-12 integer
    grid so the per-vector total (an integer sum over m terms) is
    aggregation-order-free — deterministic at any partitioning and
    SQL-replayable. Output: (query_id, neighbor_id, adist, rank);
    self-matches excluded, ties break on neighbor_id.
    """
    qsv = _subvectors(queries, id_col, vec_col, m, dsub).select(
        F.col(id_col).alias("query_id"), "sub", "sv"
    )
    lut = qsv.join(F.broadcast(codebook), "sub").select(
        "query_id",
        "sub",
        "code",
        F.floor(l2_expr("sv", "cvec") * F.lit(_ADC_Q))
        .cast("decimal(38,0)")
        .alias("__dq"),
    )
    scored = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            (
                F.sum("__dq").cast("double") / F.lit(_ADC_Q)
            ).alias("adist")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8) — the third compression point on the ANN
# memory/recall curve (LSH buckets < IVF cells < PQ codes < SQ8 <
# raw floats). One byte per DIMENSION: each dim maps to 0..255 on its
# own [min, max] range. 4× smaller than float32 with near-exact
# recall; no training loop at all (two corpus stats), so it's the
# cheap-to-maintain compressed scan when PQ's codebook retrain is an
# operational burden.
# ---------------------------------------------------------------------------


def _sq_dequant_term(qv: str, codes: str) -> str:
    """SQL text: Σ_i (qv_i − dequant(codes_i))², folded in index
    order (deterministic on both engines). mn/mx array columns must
    be in scope."""
    deq = (
        "(element_at(mn, i + 1) + CAST(element_at({codes}, i + 1) AS DOUBLE)"
        " * ((element_at(mx, i + 1) - element_at(mn, i + 1)) / 255D))"
    ).format(codes=codes)
    return (
        f"aggregate(transform({qv}, (x, i) -> "
        f"(CAST(x AS DOUBLE) - {deq}) * (CAST(x AS DOUBLE) - {deq})), "
        f"0D, (acc, v) -> acc + v)"
    )


def sq_train_stats(
    corpus: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension [min, max] ranges as ONE broadcastable row:
    (mn array<double>, mx array<double>) in dimension order.

    One posexplode + hash aggregate over the corpus; the result is
    dim-sized (bytes). min/max are aggregation-order-free, so the
    "training" is exactly reproducible — no fixed-point machinery
    needed, unlike the k-means quantizers.
    """
    ex = corpus.select(
        F.posexplode(F.col(vec_col)).alias("dim", "x")
    ).select("dim", F.col("x").cast("double").alias("x"))
    stats = ex.groupBy("dim").agg(
        F.min("x").alias("mn_v"), F.max("x").alias("mx_v")
    )
    return stats.groupBy().agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, mn_v))),"
            " s -> s.mn_v)"
        ).alias("mn"),
        F.expr(
            "transform(array_sort(collect_list(struct(dim, mx_v))),"
            " s -> s.mx_v)"
        ).alias("mx"),
    )


def sq_encode(
    corpus: DataFrame,
    stats: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as array<int> of 0..255 codes against the
    FROZEN per-dim ranges (1-row broadcast): round-half-up of the
    position within [mn, mx]; degenerate dims (mx = mn) encode 0.
    Appending a new batch re-uses the frozen ranges — same
    incremental-maintenance shape as `pq_encode`/`ivf_assign`.
    Output: (id, codes, mn, mx) — ranges ride along for the decode.
    """
    code = (
        f"transform({vec_col}, (x, i) -> "
        "CASE WHEN element_at(mx, i + 1) = element_at(mn, i + 1) THEN 0 "
        "ELSE CAST(least(255D, greatest(0D, floor("
        "(CAST(x AS DOUBLE) - element_at(mn, i + 1))"
        " / (element_at(mx, i + 1) - element_at(mn, i + 1))"
        " * 255D + 0.5D))) AS INT) END)"
    )
    return corpus.crossJoin(F.broadcast(stats)).select(
        F.col(id_col), F.expr(code).alias("codes"), "mn", "mx"
    )


def sq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Asymmetric top-*k* over the SQ8-compressed corpus: exact query
    floats against dequantized corpus codes, squared L2, ties on
    neighbor id. The scan reads only the codes table (¼ the bytes of
    the raw corpus); queries broadcast. Output: (query_id,
    neighbor_id, adist, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    scored = (
        codes.withColumnRenamed(id_col, "neighbor_id")
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(_sq_dequant_term("qv", "codes")).alias("adist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adist"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
