"""Supervised feature-encoding operators — the tabular-ML
preprocessing every training pipeline runs before a model sees a
high-cardinality categorical column.

m-estimate (smoothed) target encoding: replace a category with the
shrunken mean of the target, enc = (Σ_target_cat + m·global_mean) /
(n_cat + m). The shrinkage prior keeps rare categories near the
global mean instead of memorizing noise — the standard leakage-aware
alternative to one-hot at scale. One hash aggregate per level plus a
1-row broadcast global; decimal-exact sums so the encoding is
engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def m_estimate_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    m: float = 10.0,
    dec: str = "decimal(28,2)",
) -> DataFrame:
    """Per-category m-estimate encoding table: (cat, n, cat_mean,
    global_mean, encoded).

    Sums accumulate in DECIMAL (exact, order-free) and convert to
    DOUBLE once; both means and the shrunken encoding are single
    double divisions with a fixed operand order, so the table is
    bit-identical across engines — callers broadcast-join it back
    onto the fact table to materialize the feature.
    """
    t = F.col(target_col).cast(dec)
    g = df.agg(
        F.sum(t).cast("double").alias("__gs"),
        F.count(F.lit(1)).alias("__gn"),
    ).select(
        (F.col("__gs") / F.col("__gn").cast("double")).alias("global_mean")
    )
    per = df.groupBy(cat_col).agg(
        F.sum(t).cast("double").alias("__s"),
        F.count(F.lit(1)).alias("n"),
    )
    return per.crossJoin(F.broadcast(g)).select(
        F.col(cat_col),
        F.col("n").cast("long").alias("n"),
        (F.col("__s") / F.col("n").cast("double")).alias("cat_mean"),
        "global_mean",
        (
            (F.col("__s") + F.lit(m) * F.col("global_mean"))
            / (F.col("n").cast("double") + F.lit(m))
        ).alias("encoded"),
    )


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col,
    n_thresholds: int = 9,
) -> DataFrame:
    """Precision/recall sweep of a binary scorer — the threshold
    table behind "where do we cut the quality filter". *label_col*
    is a boolean Column (or name); thresholds are the n interior
    points of an equal-width grid over the observed score range
    (deterministic — no quantile estimation; a 1-row broadcast
    span).

    One scan computes per-row (score, label); the threshold spine
    cross-joins in (constant ×n) and a single hash aggregate yields
    tp/fp/fn per threshold. Output: (threshold_idx, threshold, tp,
    fp, fn, precision, recall) — precision NULL when nothing is
    flagged.
    """
    lbl = (
        F.col(label_col) if isinstance(label_col, str) else label_col
    ).cast("boolean")
    base = df.select(
        F.col(score_col).cast("double").alias("__s"), lbl.alias("__y")
    )
    span = base.agg(
        F.min("__s").alias("__mn"), F.max("__s").alias("__mx")
    )
    spine = base.sparkSession.range(1, n_thresholds + 1).select(
        F.col("id").cast("int").alias("threshold_idx")
    )
    t = F.col("__mn") + (
        F.col("__mx") - F.col("__mn")
    ) * (
        F.col("threshold_idx").cast("double")
        / F.lit(float(n_thresholds + 1))
    )
    fanned = (
        base.crossJoin(F.broadcast(span))
        .crossJoin(F.broadcast(spine))
        .select(
            "threshold_idx",
            t.alias("__t"),
            (F.col("__s") >= t).alias("__pred"),
            "__y",
        )
    )
    agg = fanned.groupBy("threshold_idx").agg(
        F.first("__t").alias("threshold"),
        F.sum(F.when(F.col("__pred") & F.col("__y"), 1).otherwise(0))
        .cast("long")
        .alias("tp"),
        F.sum(F.when(F.col("__pred") & ~F.col("__y"), 1).otherwise(0))
        .cast("long")
        .alias("fp"),
        F.sum(F.when(~F.col("__pred") & F.col("__y"), 1).otherwise(0))
        .cast("long")
        .alias("fn"),
    )
    return agg.select(
        "threshold_idx",
        "threshold",
        "tp",
        "fp",
        "fn",
        F.when(
            (F.col("tp") + F.col("fp")) > 0,
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fp")).cast("double"),
        ).alias("precision"),
        F.when(
            (F.col("tp") + F.col("fn")) > 0,
            F.col("tp").cast("double")
            / (F.col("tp") + F.col("fn")).cast("double"),
        ).alias("recall"),
    )


def roc_auc_exact(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """EXACT ROC AUC per group via the Mann–Whitney rank-sum — the
    threshold-free companion to :func:`pr_curve` in the classifier
    evaluation suite.

    AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻), computed with
    midrank tie handling as pure integer arithmetic until one final
    double division::

        2·Σ_pos midrank = Σ_pos (min_rank + max_rank)    (integers)
        AUC = (2·Σ_pos midrank − P·(P+1)) / (2·P·N)

    where ranks are ascending-score positions (`row_number` over a
    per-group total order) and min/max over each score-tie run
    recover the midrank without materializing a .5 — so the value
    is deterministic under any partitioning and SQL-replayable.

    One (group)-keyed sort window + one hash aggregate. The sort
    concentrates each group on one task — the exact-tier verifier
    shape; at 100 TB a score-bucket histogram sweep (`pr_curve`)
    approximates the same integral without the global rank. Output:
    (group, n_pos, n_neg, auc); a group lacking either class yields
    auc = NULL (undefined).
    """
    w_rank = Window.partitionBy(group_col).orderBy(
        F.asc("__s"), F.asc("__y")
    )
    ranked = df.select(
        F.col(group_col),
        F.col(score_col).alias("__s"),
        F.col(label_col).cast("int").alias("__y"),
    ).withColumn("__rn", F.row_number().over(w_rank))
    # midrank per score-tie run: frame = whole (group, score) slice
    w_tie = Window.partitionBy(group_col, "__s")
    ranked = ranked.select(
        group_col,
        "__y",
        (F.min("__rn").over(w_tie) + F.max("__rn").over(w_tie)).alias(
            "__2midrank"
        ),
    )
    agg = ranked.groupBy(group_col).agg(
        F.sum("__y").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("__y")).cast("long").alias("n_neg"),
        F.sum(F.when(F.col("__y") == 1, F.col("__2midrank"))).alias(
            "__2ranksum"
        ),
    )
    p, nneg = F.col("n_pos"), F.col("n_neg")
    return agg.select(
        group_col,
        "n_pos",
        "n_neg",
        F.when(
            (p > 0) & (nneg > 0),
            (F.col("__2ranksum") - p * (p + F.lit(1))).cast("double")
            / (F.lit(2) * p * nneg).cast("double"),
        ).alias("auc"),
    )
