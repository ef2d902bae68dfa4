"""Iterative graph analytics over edge DataFrames.

The dedup suite already runs one fixed-point join loop (connected
components, ``operators/dedup.py:dedup_clusters``); this module adds
the other canonical one — PageRank — with the replayable-arithmetic
discipline the kmeans trainer established: every iteration's ranks
are floor-quantized to a fixed-point grid, so per-node contributions
sum as exact integers and the whole trajectory is bit-reproducible on
any engine / any partitioning (a DuckDB oracle can replay it as
unrolled SQL).

Scale shape per iteration: one broadcast-or-shuffle equi-join of the
rank vector onto the edge list keyed by src, one hash aggregate keyed
by dst. Nothing driver-side; lineage is truncated every few rounds
via ``localCheckpoint`` like the components loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_Q = int(1e12)  # fixed-point grid for rank quantization


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    damping: float = 0.85,
    n_iter: int = 3,
    checkpoint_every: int = 8,
) -> DataFrame:
    """Weighted PageRank with *n_iter* synchronous iterations.

    Every node appearing as src or dst gets the uniform initial rank
    1/N. Per iteration::

        contrib(u→v) = floor(rank_u * w(u,v)/W(u) * 1e12)   (BIGINT)
        rank_v = (1-d)/N + d * (Σ contrib)/1e12

    The floor-quantization (≤ 1e-12 absolute error per edge per
    round) makes the aggregation order irrelevant: integer sums are
    associative, so the result is independent of partitioning and
    identical across engines. Dangling nodes (no out-edges) leak
    their mass — ranks sum to slightly under 1, the common
    large-graph simplification; pass a self-loop edge list if
    conservation matters.

    Output: (node, rank, in_degree).
    """
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"),
        w.alias("w"),
    )
    # out-weight per src, folded onto each edge once (reused each iter)
    tot = Window.partitionBy("src")
    e = e.select(
        "src", "dst", (F.col("w") / F.sum("w").over(tot)).alias("share")
    ).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # one scalar to the driver — the graph stays out
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for i in range(n_iter):
        contrib = (
            e.join(
                ranks.select(F.col("node").alias("src"), "rank"), "src"
            )
            .select(
                "dst",
                F.floor(F.col("rank") * F.col("share") * F.lit(float(_Q)))
                .cast("decimal(38,0)")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").cast("string").cast("double").alias("mass"))
        )
        ranks = (
            nodes.join(
                contrib.select(F.col("dst").alias("node"), "mass"),
                "node",
                "left",
            )
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce("mass", F.lit(0.0)) / F.lit(float(_Q)))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)
    in_deg = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    return ranks.join(in_deg, "node", "left").select(
        "node",
        "rank",
        F.coalesce("in_degree", F.lit(0)).cast("long").alias("in_degree"),
    )
