"""Hash-based sampling/split properties: disjoint, covering, stable."""

from __future__ import annotations

from etl_python_azure_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
)
from etl_python_azure_spark.session import load_tables


def test_hash_split_partitions_everything(spark, sf_dir):
    d = load_tables(spark, sf_dir, "documents")
    splits = hash_split(d, "doc_id", {"train": 90, "val": 5, "test": 5})
    counts = {k: v.count() for k, v in splits.items()}
    assert sum(counts.values()) == d.count()  # covering
    ids = [set(r.doc_id for r in v.select("doc_id").collect()) for v in splits.values()]
    assert not (ids[0] & ids[1]) and not (ids[0] & ids[2]) and not (ids[1] & ids[2])
    # roughly proportional (tolerant: small n)
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_sample_stable_under_repartition(spark, sf_dir):
    d = load_tables(spark, sf_dir, "documents")
    s1 = {r.doc_id for r in deterministic_sample(d, "doc_id", 10).collect()}
    s2 = {
        r.doc_id
        for r in deterministic_sample(d.repartition(17), "doc_id", 10).collect()
    }
    assert s1 == s2 and 0 < len(s1) < d.count()


def test_weighted_sample_stable_and_weight_sensitive(spark, sf_dir):
    from etl_python_azure_spark.operators.sampling import weighted_sample

    d = load_tables(spark, sf_dir, "documents").select("doc_id", "n_chars")
    s1 = {r.doc_id for r in weighted_sample(d, "doc_id", "n_chars", 50).collect()}
    s2 = {
        r.doc_id
        for r in weighted_sample(
            d.repartition(13), "doc_id", "n_chars", 50
        ).collect()
    }
    assert s1 == s2 and len(s1) == 50  # deterministic, partition-invariant

    # sampled docs skew long: mean length above the corpus mean
    from pyspark.sql import functions as F

    corpus_mean = d.agg(F.avg("n_chars")).first()[0]
    sample_mean = (
        weighted_sample(d, "doc_id", "n_chars", 50)
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert sample_mean > corpus_mean


def test_weighted_sample_inclusion_tracks_weights(spark):
    """Distributional correctness of the E-S sampler (r03 verdict
    item 6): the existing tests prove determinism; this pins the
    sampling DISTRIBUTION.

    Across hash-salted trials scored in one job with the operator's
    own ``es_score`` expression:
    - k=1: P(win) for a weight class equals its weight share exactly
      under Efraimidis-Spirakis, so observed wins must pass a
      chi-square test against that share;
    - k=10: per-item inclusion rate must rise strictly with weight.
    Inputs are fixed hashes, not an RNG — the test is deterministic,
    never flaky.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_python_azure_spark.operators.sampling import es_score

    n, trials, k = 60, 3000, 10
    items = spark.range(n).select(
        F.col("id").alias("item"),
        F.when(F.col("id") % 3 == 0, 1.0)
        .when(F.col("id") % 3 == 1, 2.0)
        .otherwise(8.0)
        .alias("w"),
    )
    scored = (
        spark.range(trials)
        .select(F.col("id").alias("trial"))
        .crossJoin(F.broadcast(items))
        .select(
            "trial",
            "item",
            "w",
            es_score(F.concat_ws("_", "trial", "item"), F.col("w")).alias(
                "s"
            ),
        )
    )
    win = Window.partitionBy("trial").orderBy(F.desc("s"), F.asc("item"))
    ranked = scored.withColumn("r", F.row_number().over(win)).persist()

    # k=1 chi-square: 20 items per class, class weight shares 20:40:160
    counts = {
        r["w"]: r["n"]
        for r in ranked.filter("r = 1")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    tot_w = 20 * 1.0 + 20 * 2.0 + 20 * 8.0
    chi2 = 0.0
    for w, cls_w in ((1.0, 20.0), (2.0, 40.0), (8.0, 160.0)):
        e = trials * cls_w / tot_w
        chi2 += (counts.get(w, 0) - e) ** 2 / e
    assert chi2 < 13.82, (chi2, counts)  # df=2 critical value, p=0.001

    # k=10 inclusion monotonicity per item
    inc = {
        r["w"]: r["n"] / (20.0 * trials)
        for r in ranked.filter(f"r <= {k}")
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    ranked.unpersist()
    assert inc[8.0] > inc[2.0] > inc[1.0], inc


def test_ranked_cumsum_equalize_spreads_skewed_scores(spark):
    """The 100 TB-safe property of equalize=True: when every score
    lands in a sliver of [0,1], the uniform floor(score*64) grid
    degenerates to ONE bucket (a single-task window at scale) while
    the histogram-equalized edges keep the corpus spread across many
    buckets — with positions identical in both modes."""
    from pyspark.sql import functions as F

    from etl_python_azure_spark.operators.sampling import ranked_cumsum

    n = 400
    rows = [(i, 0.5 + (i % 97) * 1e-4, 1 + i % 7) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, score double, w long")

    # the uniform grid collapses: every row hashes to bucket 32
    uni = (
        df.select(F.floor(F.col("score") * 64).alias("b"))
        .distinct()
        .count()
    )
    assert uni == 1

    # equalized edges spread the same rows across many buckets
    probs = [i / 64 for i in range(1, 64)]
    edges = sorted(set(df.select("score").approxQuantile("score", probs, 0.001)))
    assert len(edges) >= 16
    bucket = sum(
        ((F.col("score") >= F.lit(e)).cast("long") for e in edges),
        F.lit(0).cast("long"),
    )
    spread = df.select(bucket.alias("b")).distinct().count()
    assert spread >= 16

    # and the positions are the same under BOTH bucketings
    def res(equalize):
        return {
            r["doc_id"]: (r["rank"], r["cum_weight"])
            for r in ranked_cumsum(
                df, "doc_id", "score", "w", equalize=equalize
            ).collect()
        }

    assert res(True) == res(False)
