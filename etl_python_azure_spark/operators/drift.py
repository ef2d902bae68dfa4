"""Distribution-drift metrics — the monitoring side of a training
pipeline: has this feed's value distribution moved since the last
snapshot / training run?

PSI (population stability index) is the standard scorecard metric:
bucket a numeric column on FIXED bins, compare the bucket shares of
two populations, Σ (p_a − p_b)·ln(p_a/p_b). PSI < 0.1 is stable,
0.1–0.25 drifting, > 0.25 action. Everything here is one scan +
two hash aggregates; bins derive from the GLOBAL min/max (1-row
broadcast) so the binning is identical for both populations and
reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LN_Q = 1e8  # ln grid — JVM Math.log vs libm ulp discipline


def psi_report(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    is_b: Column,
    n_bins: int = 10,
) -> DataFrame:
    """PSI of *value_col* between population A (``is_b`` false) and
    population B (true), per *group_cols* group.

    Equal-width bins over the global [min, max] (deterministic — no
    quantile estimation), Laplace-smoothed shares so empty buckets
    never divide by zero: p = (n_bin + 1) / (n_pop + n_bins). The
    per-group sum folds over the sorted term list (n_bins values),
    and each ln is floor-quantized to 1e-8, so the score is
    bit-identical on any engine/partitioning. Output:
    (group..., n_a, n_b, psi).
    """
    v = F.col(value_col).cast("double")
    span = df.agg(
        F.min(v).alias("__mn"), F.max(v).alias("__mx")
    )
    binned = df.crossJoin(F.broadcast(span)).select(
        *[F.col(c) for c in group_cols],
        F.when(F.col("__mx") == F.col("__mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.floor(
                    (v - F.col("__mn"))
                    / (F.col("__mx") - F.col("__mn"))
                    * F.lit(float(n_bins))
                ).cast("int"),
            )
        )
        .alias("__bin"),
        is_b.cast("int").alias("__b"),
    )
    counts = binned.groupBy(*group_cols, "__bin").agg(
        F.sum(F.lit(1) - F.col("__b")).alias("__na"),
        F.sum("__b").alias("__nb"),
    )
    tots = counts.groupBy(*group_cols).agg(
        F.sum("__na").alias("__ta"), F.sum("__nb").alias("__tb")
    )
    pa = (F.col("__na") + F.lit(1.0)) / (
        F.col("__ta") + F.lit(float(n_bins))
    )
    pb = (F.col("__nb") + F.lit(1.0)) / (
        F.col("__tb") + F.lit(float(n_bins))
    )
    term = (pa - pb) * (
        F.floor(F.log(pa / pb) * F.lit(_LN_Q)) / F.lit(_LN_Q)
    )
    per_bin = counts.join(tots, group_cols).select(
        *[F.col(c) for c in group_cols],
        F.col("__ta"),
        F.col("__tb"),
        term.alias("__term"),
    )
    return per_bin.groupBy(*group_cols).agg(
        F.first("__ta").cast("long").alias("n_a"),
        F.first("__tb").cast("long").alias("n_b"),
        F.expr(
            "aggregate(sort_array(collect_list(__term)), 0D,"
            " (acc, v) -> acc + v)"
        ).alias("psi"),
    )
