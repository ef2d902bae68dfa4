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

from pyspark.sql import DataFrame
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
