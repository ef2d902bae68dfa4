#!/usr/bin/env python
"""Recall/cost sweep for the approximate-ANN paths.

For each knob setting, measures against brute-force ground truth:

- recall@5: mean fraction of the true top-5 recovered per query;
- cost: candidate cosine evaluations as a fraction of the n_q × n_c
  evaluations brute force pays (the quantity that scales to 100 TB).

Usage: python scripts/ann_sweep.py [sf_dir]   (default sf0.01)
Prints a markdown table (pasted into SCALING.md).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_python_azure_spark.operators.dedup import dot_expr, with_norm  # noqa: E402
from etl_python_azure_spark.operators.similarity import (  # noqa: E402
    cosine_topk,
    ivf_centroids,
    ivf_topk,
    lsh_buckets,
    lsh_topk,
    _nearest_cells,
)
from etl_python_azure_spark.session import get_spark, load_tables  # noqa: E402

K = 5
N_QUERIES = 50


def recall_and_cost(spark, emb, queries, truth, method, **knobs):
    if method == "ivf":
        approx = ivf_topk(emb, queries, k=K, **knobs)
        # cost: probed-cell membership joined per query
        cents = knobs.get("centroids")
        if cents is None:
            cents = ivf_centroids(emb, num_centroids=knobs["num_centroids"])
        cn = with_norm(emb.select("vec_id", "embedding"))
        inv = _nearest_cells(cn, cents, "vec_id", "embedding", 1)
        cell_sizes = inv.groupBy("cell").count()
        qn = with_norm(queries.select("vec_id", "embedding"))
        probes = _nearest_cells(qn, cents, "vec_id", "embedding", knobs["nprobe"])
        cost = (
            probes.join(cell_sizes, "cell")
            .agg(F.sum("count").alias("c"))
            .collect()[0]["c"]
        )
    else:
        approx = lsh_topk(emb, queries, k=K, **knobs)
        cb = lsh_buckets(emb, num_planes=knobs["num_planes"], dim=knobs["dim"])
        qb = lsh_buckets(queries, num_planes=knobs["num_planes"], dim=knobs["dim"])
        cost = (
            qb.select("vec_id", "bucket")
            .join(cb.groupBy("bucket").count(), "bucket")
            .agg(F.sum("count").alias("c"))
            .collect()[0]["c"]
        )
    hits = (
        truth.select("query_id", "neighbor_id")
        .join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .count()
    )
    n_truth = truth.count()
    return hits / n_truth, cost


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ann-sweep")
    emb = load_tables(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(N_QUERIES)
    n_corpus = emb.count()
    truth = cosine_topk(emb, queries, k=K).persist()
    truth.count()
    brute_cost = N_QUERIES * (n_corpus - 1)

    print(f"corpus={n_corpus} queries={N_QUERIES} k={K} ({sf_dir})\n")
    print("| method | knobs | recall@5 | candidate evals | vs brute |")
    print("|---|---|---|---|---|")
    for nprobe in (1, 2, 4, 8, 16):
        r, c = recall_and_cost(
            spark, emb, queries, truth, "ivf",
            num_centroids=16, nprobe=nprobe,
        )
        print(f"| IVF | C=16, nprobe={nprobe} | {r:.3f} | {c} |"
              f" {c / brute_cost:.2%} |")
    from etl_python_azure_spark.operators.similarity import kmeans_centroids

    trained = kmeans_centroids(emb, num_centroids=16, max_iter=6)
    trained.persist().count()
    for nprobe in (1, 2, 4, 8):
        r, c = recall_and_cost(
            spark, emb, queries, truth, "ivf",
            nprobe=nprobe, centroids=trained,
        )
        print(f"| IVF-kmeans | C=16, nprobe={nprobe} | {r:.3f} | {c} |"
              f" {c / brute_cost:.2%} |")
    for planes, tables_note in ((2, 1), (3, 1), (4, 1), (5, 1)):
        r, c = recall_and_cost(
            spark, emb, queries, truth, "lsh",
            num_planes=planes, dim=64,
        )
        print(f"| LSH | planes={planes}, tables={tables_note} | {r:.3f} |"
              f" {c} | {c / brute_cost:.2%} |")


if __name__ == "__main__":
    main()
