"""Semantic tests for the round-4d operators (PCA power iteration,
PSI drift, association rules, triangle counts, target encoding) on
hand-checkable inputs."""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F

from etl_python_azure_spark.operators.baskets import basket_pair_stats
from etl_python_azure_spark.operators.drift import psi_report
from etl_python_azure_spark.operators.features import m_estimate_encode
from etl_python_azure_spark.operators.graph import triangle_counts
from etl_python_azure_spark.operators.pca import (
    covariance_matrix,
    power_iteration_top_component,
)


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


# ---------------------------------------------------------------- PCA
def test_pca_finds_dominant_axis(spark):
    # points spread along the x-axis with tiny y jitter: the top
    # component must align with dim 0
    vecs = [
        (0, [-4.0, 0.1]),
        (1, [-2.0, -0.1]),
        (2, [0.0, 0.1]),
        (3, [2.0, -0.1]),
        (4, [4.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    cov = covariance_matrix(df)
    c = {(r["i"], r["j"]): r["cov"] for r in cov.collect()}
    assert abs(c[(0, 0)] - 8.0) < 1e-6  # var(x) = (16+4+0+4+16)/5
    assert abs(c[(0, 1)]) < 0.2
    comp = power_iteration_top_component(cov, dim=2, n_iter=3).collect()
    load = {r["i"]: r["loading"] for r in comp}
    assert abs(abs(load[0]) - 1.0) < 1e-2  # x-axis dominates
    assert abs(load[1]) < 0.1
    lam = comp[0]["eigenvalue"]
    assert abs(lam - 8.0) < 0.05  # Rayleigh ≈ top eigenvalue
    # unit norm
    assert abs(sum(v * v for v in load.values()) - 1.0) < 1e-6


def test_pca_covariance_is_symmetric(spark):
    vecs = [(i, [float(i), float(i % 3), 1.0]) for i in range(7)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    c = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_matrix(df).collect()
    }
    for i in range(3):
        for j in range(3):
            assert c[(i, j)] == c[(j, i)]
    assert abs(c[(2, 2)]) < 1e-9  # constant dim → zero variance


# ---------------------------------------------------------------- PSI
def test_psi_zero_for_identical_populations(spark):
    rows = [("t", float(v % 10), b) for v in range(100) for b in (0, 1)]
    df = spark.createDataFrame(rows, "g string, value double, b int")
    out = psi_report(
        df, "value", ["g"], F.col("b") == 1, n_bins=5
    ).first()
    assert out["n_a"] == 100 and out["n_b"] == 100
    assert abs(out["psi"]) < 1e-9


def test_psi_detects_shift(spark):
    # A concentrated low, B concentrated high → large PSI
    rows = [("t", 1.0 + 0.01 * i, 0) for i in range(100)] + [
        ("t", 9.0 + 0.01 * i, 1) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, value double, b int")
    out = psi_report(
        df, "value", ["g"], F.col("b") == 1, n_bins=5
    ).first()
    assert out["psi"] > 1.0  # far past the 0.25 action threshold


# ---------------------------------------------------------------- rules
def test_basket_pair_lift(spark):
    # 4 baskets: {a,b} {a,b} {a} {c} → n_a=3, n_b=2, n_ab=2, n=4
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"),
        (4, "c"),
    ]
    df = spark.createDataFrame(rows, "bk long, item string")
    out = {
        (r["item_a"], r["item_b"]): r
        for r in basket_pair_stats(df, ["bk"], "item").collect()
    }
    ab = out[("a", "b")]
    assert (ab["n_xy"], ab["n_x"], ab["n_y"], ab["n_baskets"]) == (
        2, 3, 2, 4,
    )
    assert ab["support"] == 0.5
    assert abs(ab["conf_a_to_b"] - 2 / 3) < 1e-12
    assert ab["conf_b_to_a"] == 1.0
    assert abs(ab["lift"] - (2 * 4) / (3 * 2)) < 1e-12
    assert ("a", "c") not in out  # never co-occur


def test_basket_duplicate_events_count_once(spark):
    rows = [(1, "a"), (1, "a"), (1, "b")]
    df = spark.createDataFrame(rows, "bk long, item string")
    ab = basket_pair_stats(df, ["bk"], "item").first()
    assert ab["n_xy"] == 1 and ab["n_x"] == 1


# ---------------------------------------------------------------- triangles
def test_triangle_counts_known_graph(spark):
    # K4 minus one edge: nodes 1-2-3 form a triangle, 1-2-4 too if
    # edges (1,4),(2,4) present but (3,4) absent
    edges = [(1, 2), (2, 3), (1, 3), (1, 4), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(df).collect()
    }
    assert out == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_counts_direction_and_dupes_ignored(spark):
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(df).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}


# ---------------------------------------------------------------- encoding
def test_m_estimate_shrinks_rare_categories(spark):
    rows = [("big", 10.0)] * 100 + [("rare", 100.0)]
    df = spark.createDataFrame(rows, "cat string, y double")
    out = {r["cat"]: r for r in m_estimate_encode(df, "cat", "y", m=10.0).collect()}
    gm = out["big"]["global_mean"]
    assert abs(gm - (100 * 10.0 + 100.0) / 101) < 1e-9
    # the rare category's single 100.0 shrinks hard toward the mean
    rare = out["rare"]["encoded"]
    assert abs(rare - (100.0 + 10.0 * gm) / 11.0) < 1e-9
    assert rare < 30.0
    # the big category barely moves
    assert abs(out["big"]["encoded"] - 10.0) < 0.2


def test_m_estimate_m_zero_is_plain_mean(spark):
    rows = [("a", 1.0), ("a", 3.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "cat string, y double")
    out = {r["cat"]: r for r in m_estimate_encode(df, "cat", "y", m=0.0).collect()}
    assert out["a"]["encoded"] == 2.0
    assert out["b"]["encoded"] == 5.0


def test_project_onto_component_known_axis(spark):
    from etl_python_azure_spark.operators.pca import project_onto_component

    comp = spark.createDataFrame(
        [(0, 1.0), (1, 0.0)], "i int, loading double"
    )
    df = spark.createDataFrame(
        [(1, [3.0, 99.0]), (2, [-2.5, 7.0])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r["proj"]
        for r in project_onto_component(df, comp).collect()
    }
    assert abs(out[1] - 3.0) < 1e-9
    assert abs(out[2] - (-2.5)) < 1e-9


def test_deflation_finds_second_axis(spark):
    from etl_python_azure_spark.operators.pca import (
        deflate,
        project_onto_component,
    )

    # variance concentrated on x (strongest), then y, nothing on z
    vecs = [
        (0, [-4.0, 1.0, 0.0]),
        (1, [-2.0, -1.0, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [2.0, -1.0, 0.0]),
        (4, [4.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    # localCheckpoint between stages, exactly as the registered query
    # does: without it the second chain's lazy plan re-embeds the
    # first chain per matvec and ANALYSIS time explodes
    cov = covariance_matrix(df).localCheckpoint(eager=True)
    c1 = power_iteration_top_component(cov, dim=3, n_iter=4).localCheckpoint(
        eager=True
    )
    cov2 = deflate(cov, c1).localCheckpoint(eager=True)
    c2 = power_iteration_top_component(cov2, dim=3, n_iter=4)
    l1 = {r["i"]: r["loading"] for r in c1.collect()}
    rows2 = c2.collect()
    l2 = {r["i"]: r["loading"] for r in rows2}
    assert abs(abs(l1[0]) - 1.0) < 0.05   # first: x-axis
    assert abs(abs(l2[1]) - 1.0) < 0.05   # second: y-axis
    assert abs(l2[0]) < 0.2 and abs(l2[2]) < 0.2
    # eigenvalues ordered; orthogonality
    lam1 = c1.first()["eigenvalue"]
    lam2 = rows2[0]["eigenvalue"]
    assert lam1 > lam2 > 0
    dot = sum(l1[i] * l2[i] for i in range(3))
    assert abs(dot) < 0.05
