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
    # out-weight per src, folded onto each edge once (reused each
    # iter). This persist and the `nodes` one below are deliberately
    # leaked handles: the returned ranks/in_degree frame still
    # lazily depends on both, so unpersisting here would recompute
    # the edge normalization per iteration at the caller's action —
    # `spark.catalog.clearCache()` releases them (bench does so).
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


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-node triangle participation over the UNDIRECTED simple
    graph induced by *edges* (direction and multiplicity dropped).

    The classic two-join counting: canonicalize each edge to
    (lo, hi), then triangles are (a<b<c) with all three edges
    present — each counted exactly once. Both joins are hash
    equi-joins on a node key; the worst-case cost is Σ deg² wedge
    candidates (degree-skewed graphs want the standard
    highest-degree-last orientation, which the lo<hi canonical form
    approximates for free). Output: (node, n_triangles) for every
    node in the graph (0 if none).
    """
    # deliberately-leaked handle (three self-join sides + node list
    # read it; the result stays lazy on it) — released by the
    # caller's clearCache(), see pagerank note above
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    # wedges a<b<c from edges (a,b) and (b,c)
    e1 = und.select(F.col("a"), F.col("b"))
    e2 = und.select(F.col("a").alias("b"), F.col("b").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(
            und.select(F.col("a"), F.col("b").alias("c")),
            ["a", "c"],
        )
        .select("a", "b", "c")
    )
    nodes = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b").alias("node")))
        .distinct()
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return nodes.join(per_node, "node", "left").select(
        "node",
        F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
            "n_triangles"
        ),
    )


def adamic_adar_links(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    k: int = 20,
) -> DataFrame:
    """Top-*k* Adamic–Adar link predictions over the UNDIRECTED
    simple graph induced by *edges*: for each NON-adjacent pair
    (u < v) sharing ≥ 1 neighbor, score Σ_w 1/ln(deg(w)) over the
    common neighbors w — the classic "which link forms next"
    heuristic that down-weights hub-mediated wedges.

    Same two-hash-join wedge shape as `triangle_counts` (cost
    Σ deg², the wedge volume — degree-cap upstream if a hub
    dominates); the anti-join against the edge set removes existing
    links. Every common neighbor w has deg(w) ≥ 2 (it touches both
    u and v), so ln(deg) > 0 always. Each 1/ln term is
    floor-quantized to the 1e-8 grid and integer-summed (order-free
    and SQL-replayable; JVM/libm ln may differ by 1 ulp, same
    convention as the BM25 idf). Output: (node_u, node_v,
    n_common, aa_score, rank) with ties on (node_u, node_v).
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # deliberately-leaked handle (adjacency both directions, the
        # degree table, and the anti-join all read it); released by
        # the caller's clearCache(), see pagerank note above
        .persist()
    )
    adj = und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).union(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )
    deg = adj.groupBy("nbr").agg(F.count(F.lit(1)).alias("__deg"))
    # wedges u -w- v with u < v, weighted by w's degree term
    left = adj.select(F.col("nbr").alias("__w"), F.col("node").alias("node_u"))
    right = adj.select(F.col("nbr").alias("__w"), F.col("node").alias("node_v"))
    wedges = (
        left.join(right, "__w")
        .filter(F.col("node_u") < F.col("node_v"))
        .join(
            F.broadcast(deg.select(F.col("nbr").alias("__w"), "__deg")),
            "__w",
        )
    )
    scored = (
        wedges.groupBy("node_u", "node_v")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            (
                F.sum(
                    F.floor(
                        F.lit(1e8) / F.log(F.col("__deg").cast("double"))
                    ).cast("decimal(38,0)")
                ).cast("double")
                / F.lit(1e8)
            ).alias("aa_score"),
        )
        # link PREDICTION: drop pairs that are already edges
        .join(
            und.select(
                F.col("a").alias("node_u"), F.col("b").alias("node_v")
            ),
            ["node_u", "node_v"],
            "left_anti",
        )
    )
    w = Window.orderBy(
        F.desc("aa_score"), F.asc("node_u"), F.asc("node_v")
    )
    # single-partition window is safe here: input is already reduced
    # to candidate PAIRS (bounded by wedge volume, post-aggregation);
    # for huge candidate sets swap in grouped_topk's two-phase slice
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
