"""Semantic tests for the round-4e operators (multi-probe LSH,
temperature allocation, novelty, median/MAD, PR curve) on
hand-checkable inputs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_python_azure_spark.operators.drift import median_mad
from etl_python_azure_spark.operators.features import pr_curve
from etl_python_azure_spark.operators.sampling import temperature_allocation
from etl_python_azure_spark.operators.similarity import (
    cosine_topk,
    lsh_topk,
    multiprobe_lsh_topk,
)
from etl_python_azure_spark.operators.text import novelty_scores


# ------------------------------------------------------------ multi-probe
def test_multiprobe_recall_at_least_single_bucket(spark, sf_dir):
    from etl_python_azure_spark.session import load_tables

    em = load_tables(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 5)
    bf = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(em, q, k=5).collect()
    }
    single = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(em, q, k=5).collect()
    }
    multi = {
        (r["query_id"], r["neighbor_id"])
        for r in multiprobe_lsh_topk(em, q, k=5).collect()
    }
    # probing a superset of buckets can only add candidates, so
    # ground-truth hits are monotone
    assert len(multi & bf) >= len(single & bf)
    # and multi-probe candidates include the single-bucket top-k's
    # source bucket, so its hits are a superset per query
    assert (single & bf) <= (multi & bf) or len(multi & bf) > len(
        single & bf
    )


# ------------------------------------------------------------ temperature
def test_temperature_allocation_flattens_and_sums(spark):
    rows = [("big",)] * 900 + [("small",)] * 100
    df = spark.createDataFrame(rows, "src string")
    out = {
        r["src"]: r
        for r in temperature_allocation(df, "src", total=1000).collect()
    }
    assert out["big"]["n_docs"] == 900
    # seats sum exactly to the budget
    assert sum(r["alloc_docs"] for r in out.values()) == 1000
    # sqrt flattening: small source gets MORE than its raw share,
    # big gets less
    assert out["small"]["alloc_docs"] > 100
    assert out["big"]["alloc_docs"] < 900
    # expected sqrt shares: sqrt(.9)/(sqrt(.9)+sqrt(.1)) ≈ 0.75
    assert abs(out["big"]["temp_share"] - 0.75) < 0.01


def test_temperature_allocation_rejects_other_alpha(spark):
    df = spark.createDataFrame([("a",)], "src string")
    with pytest.raises(ValueError):
        temperature_allocation(df, "src", total=10, alpha=0.7)


# ------------------------------------------------------------ novelty
def test_novelty_scores_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f"),       # shingles: abcde, bcdef
            (2, "a b c d e x"),       # shares abcde with doc 1
            (3, "p q r s t u v"),     # all unique
            (4, "short doc"),         # too short for 5-grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in novelty_scores(df, n=5).collect()}
    assert out[1]["n_shingles"] == 2
    # 'a b c d e' appears in docs 1 AND 2 → not novel; 'b c d e f'
    # only in doc 1 → novel
    assert out[1]["n_novel"] == 1 and out[1]["novelty"] == 0.5
    assert out[3]["novelty"] == 1.0
    assert out[4]["n_shingles"] == 0 and out[4]["novelty"] is None


# ------------------------------------------------------------ median/MAD
def test_median_mad_odd_and_even_groups(spark):
    rows = [("a", v, i) for i, v in enumerate([1.0, 2.0, 100.0])] + [
        ("b", v, i + 10) for i, v in enumerate([1.0, 2.0, 3.0, 4.0])
    ]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    out = {
        r["g"]: r for r in median_mad(df, "v", ["g"], "id").collect()
    }
    assert out["a"]["median"] == 2.0  # odd count: middle row
    assert out["a"]["mad"] == 1.0     # |1-2|,|2-2|,|100-2| → median 1
    assert out["b"]["median"] == 2.5  # even: (2+3)/2
    assert out["b"]["mad"] == 1.0     # devs 1.5,0.5,0.5,1.5 → (0.5+1.5)/2
    # 100 is a robust outlier in group a: |100-2| > 3*1.4826*1
    assert out["a"]["n_outliers"] == 1
    assert out["b"]["n_outliers"] == 0


def test_median_mad_resists_outlier_vs_stddev(spark):
    # the point of MAD: one huge value doesn't move the scale
    vals = [10.0] * 50 + [11.0] * 49 + [1e9]
    df = spark.createDataFrame(
        [("g", v, i) for i, v in enumerate(vals)],
        "g string, v double, id long",
    )
    r = median_mad(df, "v", ["g"], "id").first()
    assert r["median"] <= 11.0
    assert r["mad"] <= 1.0
    assert r["n_outliers"] == 1  # only the 1e9


# ------------------------------------------------------------ PR curve
def test_pr_curve_perfect_separation(spark):
    # scores 0..9, positives are score >= 5: some threshold achieves
    # precision=recall=1
    rows = [(float(i), i >= 5) for i in range(10)]
    df = spark.createDataFrame(rows, "score double, pos boolean")
    out = pr_curve(df, "score", "pos", n_thresholds=9).collect()
    assert len(out) == 9
    perfect = [
        r for r in out if r["precision"] == 1.0 and r["recall"] == 1.0
    ]
    assert perfect, [(r["threshold"], r["precision"], r["recall"]) for r in out]
    # recall is monotone nonincreasing as the threshold rises
    by_t = sorted(out, key=lambda r: r["threshold"])
    recalls = [r["recall"] for r in by_t]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))
    # counts are consistent: tp+fn == total positives
    assert all(r["tp"] + r["fn"] == 5 for r in out)


# ------------------------------------------------------------ grouped topk
def test_grouped_topk_matches_window(spark):
    from etl_python_azure_spark.operators.aggregates import grouped_topk
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [("g%d" % (i % 3), float((i * 37) % 100), i) for i in range(500)],
        "g string, v double, id long",
    ).repartition(7)
    agg = {
        (r["g"], r["rn"]): (r["v"], r["id"])
        for r in grouped_topk(df, ["g"], "v", "id", k=5).collect()
    }
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    win = {
        (r["g"], r["rn"]): (r["v"], r["id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .collect()
    }
    assert agg == win


def test_grouped_topk_ascending_and_small_groups(spark):
    from etl_python_azure_spark.operators.aggregates import grouped_topk

    df = spark.createDataFrame(
        [("a", 3.0, 1), ("a", 1.0, 2), ("b", 9.0, 3)],
        "g string, v double, id long",
    )
    out = {
        (r["g"], r["rn"]): r["v"]
        for r in grouped_topk(
            df, ["g"], "v", "id", k=2, ascending=True
        ).collect()
    }
    assert out == {("a", 1): 1.0, ("a", 2): 3.0, ("b", 1): 9.0}


def test_grouped_topk_null_and_nan_match_window(spark):
    from etl_python_azure_spark.operators.aggregates import grouped_topk
    from pyspark.sql import Window

    # review catch: NULL order values must rank like the window
    # formulation (NULLS LAST under desc), NaN like Spark's ordering
    # (above every double)
    rows = [
        ("g", None, 1),
        ("g", 5.0, 2),
        ("g", float("nan"), 3),
        ("g", 3.0, 4),
    ]
    df = spark.createDataFrame(rows, "g string, v double, id long")
    for asc in (False, True):
        agg = [
            (r["rn"], r["id"])
            for r in grouped_topk(df, ["g"], "v", "id", k=4, ascending=asc)
            .orderBy("rn")
            .collect()
        ]
        w = Window.partitionBy("g").orderBy(
            (F.asc("v") if asc else F.desc("v")), F.asc("id")
        )
        win = [
            (r["rn"], r["id"])
            for r in df.withColumn("rn", F.row_number().over(w))
            .orderBy("rn")
            .collect()
        ]
        assert agg == win, (asc, agg, win)


def test_grouped_topk_nan_with_infinities_match_window(spark):
    from etl_python_azure_spark.operators.aggregates import grouped_topk
    from pyspark.sql import Window

    # r05 verdict item 6: a group mixing NaN with ±Inf must STILL
    # match the window ordering (NaN strictly above +Inf) — the
    # negated-key-only encoding collapsed NaN onto the infinity and
    # fell to the tiebreak. Tiebreak ids are chosen ADVERSARIALLY
    # (the NaN row's id sorts after the Inf row's) so a tie on the
    # sort key would produce the wrong order, not a lucky pass.
    rows = [
        ("g", float("inf"), 1),
        ("g", float("nan"), 2),
        ("g", float("-inf"), 3),
        ("g", float("nan"), 4),
        ("g", 7.0, 5),
        ("g", None, 6),
        ("h", float("-inf"), 7),
        ("h", float("nan"), 8),
    ]
    df = spark.createDataFrame(
        rows, "g string, v double, id long"
    ).repartition(5)
    for asc in (False, True):
        agg = sorted(
            (r["g"], r["rn"], r["id"])
            for r in grouped_topk(
                df, ["g"], "v", "id", k=8, ascending=asc
            ).collect()
        )
        w = Window.partitionBy("g").orderBy(
            (F.asc("v") if asc else F.desc("v")), F.asc("id")
        )
        win = sorted(
            (r["g"], r["rn"], r["id"])
            for r in df.withColumn(
                "rn", F.row_number().over(w)
            ).collect()
        )
        assert agg == win, (asc, agg, win)
