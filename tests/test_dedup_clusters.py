"""dedup_clusters: chain-shaped (deep) components and convergence."""

from __future__ import annotations

from etl_python_azure_spark.operators.dedup import dedup_clusters


def test_path_graph_deep_component(spark):
    # path 0-1-2-...-15: min-label propagation needs ~15 rounds (one
    # hop per round) — exercises lineage truncation across many rounds
    n = 16
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["cluster_rep"] for r in dedup_clusters(pairs, max_iter=30).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_two_components_and_star(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (10, 12), (10, 13)],
        "id_a long, id_b long",
    )
    got = {
        r["id"]: r["cluster_rep"] for r in dedup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_max_iter_caps_rounds(spark):
    # a long path with tiny max_iter still returns a full labeling
    # (possibly unconverged) — never raises, never loops forever
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    rows = dedup_clusters(pairs, max_iter=3).collect()
    assert len(rows) == 31
