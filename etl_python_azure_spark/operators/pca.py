"""Distributed PCA (top principal component) over an embedding
column — the dimensionality-reduction / diagnostics step training
pipelines run on embedding tables (anisotropy checks, whitening,
outlier axes).

Shape: the covariance matrix is a RELATIONAL aggregate — one
posexplode + per-vector dim self-join, map-side-combined to d² rows
per partition before the shuffle, so the network cost is d²·P, not
n·d². Power iteration then runs on the d²-row covariance FRAME
(bytes for d=64) with the engine's replayable-arithmetic discipline:
every matvec term is floor-quantized to an 1e-12 integer grid
(aggregation-order-free sums), seeds and round counts are fixed, so
a DuckDB oracle replays the whole trajectory bit-for-bit — the same
recipe as the k-means/PQ trainers and PageRank.

For d in the hundreds the d² explode is still cheap next to the
corpus scan; for d ≥ a few thousand switch to a sketched or sampled
covariance (the power loop is unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import fixed_point_mean

_Q = 1e12  # fixed-point grid for covariance / matvec terms


def covariance_matrix(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact (fixed-point) covariance matrix of the embedding
    columns: (i, j, cov) with 0-based dims, centered at the
    `fixed_point_mean` per-dim means.

    cov(i,j) = (Σ floor(xc_i·xc_j·1e12)) / 1e12 / n — integer sums
    are order-free, so the matrix is identical on any partitioning
    and engine. One corpus scan for means, one for the products.
    """
    ex = corpus.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    ).select("__id", "i", F.col("x").cast("double").alias("x"))
    mu = ex.groupBy("i").agg(fixed_point_mean(F.col("x"), "mu", 1e10))
    n1 = corpus.agg(F.count(F.lit(1)).alias("__n"))
    cx = ex.join(F.broadcast(mu), "i").select(
        "__id", "i", (F.col("x") - F.col("mu")).alias("xc")
    )
    a = cx.select("__id", F.col("i"), F.col("xc").alias("xa"))
    b = cx.select("__id", F.col("i").alias("j"), F.col("xc").alias("xb"))
    return (
        a.join(b, "__id")
        .groupBy("i", "j")
        .agg(
            F.sum(
                F.floor(F.col("xa") * F.col("xb") * F.lit(_Q)).cast(
                    "decimal(38,0)"
                )
            )
            .cast("double")
            .alias("__mass")
        )
        .crossJoin(F.broadcast(n1))
        .select(
            "i",
            "j",
            (
                (F.col("__mass") / F.lit(_Q))
                / F.col("__n").cast("double")
            ).alias("cov"),
        )
    )


def _matvec(cov: DataFrame, v: DataFrame) -> DataFrame:
    """u = C·v with 1e-12-quantized terms: (i, u)."""
    return (
        cov.join(F.broadcast(v.select(F.col("i").alias("j"), "v")), "j")
        .groupBy("i")
        .agg(
            (
                F.sum(
                    F.floor(F.col("cov") * F.col("v") * F.lit(_Q)).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / F.lit(_Q)
            ).alias("u")
        )
    )


def power_iteration_top_component(
    cov: DataFrame, dim: int, n_iter: int = 3
) -> DataFrame:
    """Dominant eigenvector of the covariance FRAME by *n_iter*
    synchronous power iterations from the uniform unit seed
    v0 = 1/√d (deterministic sign, no RNG).

    Each round: u = C·v (quantized matvec), v = u/‖u‖ with
    ‖u‖ = sqrt((Σ floor(u²·1e12))/1e12) — sqrt is IEEE
    correctly-rounded, so the whole trajectory replays in SQL.
    Output: (i, loading, eigenvalue) — `eigenvalue` is the Rayleigh
    quotient vᵀCv (same on every row; the scalar certificate).
    """
    spark = cov.sparkSession
    # NO persist() on cov, deliberately: the covariance subtree is
    # embedded once per reference in the final lazy plan (86 scans
    # in the PLANS.md text), but at runtime Spark dedupes them via
    # ReusedExchange, so the aggregation executes once. Caching it
    # instead was MEASURED 70% slower at sf0.1 (11.8 s vs 7.0 s) —
    # the InMemoryRelation boundary blocks exchange reuse and adds
    # materialization stages.
    v = spark.range(dim).select(
        F.col("id").cast("int").alias("i"),
        F.lit(1.0 / float(dim) ** 0.5).alias("v"),
    )
    for _ in range(n_iter):
        u = _matvec(cov, v)
        nrm = u.agg(
            F.sqrt(
                F.sum(
                    F.floor(F.col("u") * F.col("u") * F.lit(_Q)).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / F.lit(_Q)
            ).alias("nrm")
        )
        v = u.crossJoin(F.broadcast(nrm)).select(
            "i", (F.col("u") / F.col("nrm")).alias("v")
        )
    u_last = _matvec(cov, v)
    lam = (
        u_last.join(v, "i")
        .agg(
            (
                F.sum(
                    F.floor(F.col("u") * F.col("v") * F.lit(_Q)).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / F.lit(_Q)
            ).alias("eigenvalue")
        )
    )
    return v.crossJoin(F.broadcast(lam)).select(
        "i", F.col("v").alias("loading"), "eigenvalue"
    )


def project_onto_component(
    corpus: DataFrame,
    component: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every vector onto a component (d-row frame with
    (i, loading)): (id, proj) with proj = Σ_i x_i·loading_i on the
    1e-12 integer grid — the "apply the PCA" step (whitening checks,
    anisotropy-per-label audits, 1-D visualization coordinates).
    One explode + broadcast join + hash aggregate.
    """
    ex = corpus.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    ).select(id_col, "i", F.col("x").cast("double").alias("x"))
    return (
        ex.join(F.broadcast(component.select("i", "loading")), "i")
        .groupBy(id_col)
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("x") * F.col("loading") * F.lit(_Q)
                    ).cast("decimal(38,0)")
                ).cast("double")
                / F.lit(_Q)
            ).alias("proj")
        )
    )


def deflate(cov: DataFrame, component: DataFrame) -> DataFrame:
    """Deflate a covariance frame by a learned component:
    C' = C − λ·v·vᵀ with each rank-1 term floor-quantized to the
    1e-12 grid — power iteration on C' then yields the SECOND
    principal component (Hotelling deflation), and so on down the
    spectrum. *component* is the (i, loading, eigenvalue) frame
    `power_iteration_top_component` returns.
    """
    vi = component.select("i", F.col("loading").alias("__vi"))
    vj = component.select(
        F.col("i").alias("j"), F.col("loading").alias("__vj")
    )
    # every component row carries the same scalar; limit(1) avoids
    # the hash-aggregate exchange distinct() would spend
    lam = component.select("eigenvalue").limit(1)
    return (
        cov.join(F.broadcast(vi), "i")
        .join(F.broadcast(vj), "j")
        .crossJoin(F.broadcast(lam))
        .select(
            "i",
            "j",
            (
                F.col("cov")
                - F.floor(
                    F.col("eigenvalue")
                    * F.col("__vi")
                    * F.col("__vj")
                    * F.lit(_Q)
                )
                / F.lit(_Q)
            ).alias("cov"),
        )
    )
