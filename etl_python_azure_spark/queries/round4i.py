"""Round-4i registry surface: the two-component PCA diagnostic.

Hotelling deflation on the replayable covariance: learn the top
component, subtract its 1e-12-quantized rank-1 term (C' = C −
λ·v·vᵀ), run power iteration again — the standard top-2 embedding
diagnostic (2-D projection axes + explained-variance split), with
an orthogonality certificate column. Both trajectories replay in
SQL via the suffix-parameterized power-iteration chain; the cov/
cov2 CTEs are MATERIALIZED (DuckDB inlines plain CTEs once per
reference — the nation_triangle_counts lesson — and the second
chain references cov2 eight times).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from . import register
from .round4d import _PCA_DIM, _PCA_ITERS, _pca_cte_chain, _power_ctes


def _top2_oracle(dim: int, iters: int) -> str:
    ctes, v1 = _pca_cte_chain(dim, iters)
    ctes.append(f"""cov2 AS MATERIALIZED (
      SELECT c.i, c.j,
             (c.cov - (floor(l.eigenvalue * vi.v * vj.v
                             * CAST(1e12 AS DOUBLE))
                       / CAST(1e12 AS DOUBLE))) AS cov
      FROM cov c
      JOIN {v1} vi ON vi.i = c.i
      JOIN {v1} vj ON vj.i = c.j
      CROSS JOIN lam l
    )""")
    p2, v2 = _power_ctes("cov2", "b", dim, iters)
    ctes += p2
    ctes.append(f"""orth AS (
      SELECT (CAST(CAST(SUM(CAST(floor(a.v * b.v * CAST(1e12 AS DOUBLE))
                   AS BIGINT)) AS VARCHAR) AS DOUBLE)
              / CAST(1e12 AS DOUBLE)) AS cross_dot
      FROM {v1} a JOIN {v2} b USING (i)
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT a.i, a.v AS loading1, b.v AS loading2,
           lam.eigenvalue AS eigenvalue1,
           lamb.eigenvalue AS eigenvalue2,
           orth.cross_dot
    FROM {v1} a JOIN {v2} b USING (i)
    CROSS JOIN lam CROSS JOIN lamb CROSS JOIN orth
    """
    )


@register("pca_top2_components", _top2_oracle(_PCA_DIM, _PCA_ITERS))
def pca_top2_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TWO principal components of the embedding corpus via
    Hotelling deflation (C' = C − λ·v·vᵀ on the 1e-12 grid, then
    power iteration again) — the 2-D projection axes every embedding
    visualization uses, plus the eigenvalue split and a `cross_dot`
    orthogonality certificate (≈ 0 when deflation worked). The
    64-row component frames and the deflated covariance are
    localCheckpoint-ed so the second trajectory's lazy plan doesn't
    re-embed the first one per matvec (the PageRank lineage-
    truncation recipe)."""
    from ..operators.pca import deflate, power_iteration_top_component
    from .round4d import _pca_comp1, _pca_cov

    cov = _pca_cov(spark, sf_dir)
    comp1 = _pca_comp1(spark, sf_dir)
    cov2 = deflate(cov, comp1).localCheckpoint(eager=True)
    comp2 = power_iteration_top_component(
        cov2, dim=_PCA_DIM, n_iter=_PCA_ITERS
    )
    orth = (
        comp1.select("i", F.col("loading").alias("__v1"))
        .join(comp2.select("i", F.col("loading").alias("__v2")), "i")
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("__v1") * F.col("__v2") * F.lit(1e12)
                    ).cast("decimal(38,0)")
                ).cast("double")
                / F.lit(1e12)
            ).alias("cross_dot")
        )
    )
    a = comp1.select(
        "i",
        F.col("loading").alias("loading1"),
        F.col("eigenvalue").alias("eigenvalue1"),
    )
    b = comp2.select(
        "i",
        F.col("loading").alias("loading2"),
        F.col("eigenvalue").alias("eigenvalue2"),
    )
    return (
        a.join(b, "i")
        .crossJoin(F.broadcast(orth))
        .select(
            "i",
            "loading1",
            "loading2",
            "eigenvalue1",
            "eigenvalue2",
            "cross_dot",
        )
    )
