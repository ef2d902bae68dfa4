"""Distribution-drift metrics — the monitoring side of a training
pipeline: has this feed's value distribution moved since the last
snapshot / training run?

PSI (population stability index) is the standard scorecard metric:
bucket a numeric column on FIXED bins, compare the bucket shares of
two populations, Σ (p_a − p_b)·ln(p_a/p_b). PSI < 0.1 is stable,
0.1–0.25 drifting, > 0.25 action. Everything here is one scan +
two hash aggregates; bins derive from each group's own min/max (a
group-cardinality broadcast) so the binning is identical for both
populations, adapted to each group's range, and reproducible
across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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

    Bins are equal-width over EACH GROUP'S [min, max] (review catch:
    global bins flattened a narrow-ranged group into one bucket and
    its PSI read ~0 under any drift), and every one of the n_bins
    buckets contributes a term even when empty in both populations
    (review catch: skipping both-empty bins understates PSI when
    |A| ≠ |B|, because the Laplace terms (1/(t_a+n) − 1/(t_b+n))·
    ln(·) are not negligible for unbalanced populations).
    Laplace-smoothed shares p = (n_bin + 1) / (n_pop + n_bins) never
    divide by zero; the per-group sum folds over the sorted term
    list and each ln is floor-quantized to 1e-8, so the score is
    bit-identical on any engine/partitioning. Output:
    (group..., n_a, n_b, psi).
    """
    v = F.col(value_col).cast("double")
    span = df.groupBy(*group_cols).agg(
        F.min(v).alias("__mn"), F.max(v).alias("__mx")
    )
    binned = df.join(F.broadcast(span), group_cols).select(
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
    spine = df.sparkSession.range(n_bins).select(
        F.col("id").cast("int").alias("__bin")
    )
    dense = (
        tots.crossJoin(F.broadcast(spine))
        .join(counts, [*group_cols, "__bin"], "left")
        .select(
            *[F.col(c) for c in group_cols],
            "__ta",
            "__tb",
            F.coalesce("__na", F.lit(0)).alias("__na"),
            F.coalesce("__nb", F.lit(0)).alias("__nb"),
        )
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
    per_bin = dense.select(
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


def median_mad(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    tiebreak_col: str,
    z: float = 3.0,
) -> DataFrame:
    """Robust location/scale per group: exact interpolated median,
    MAD (median absolute deviation), and the count of |x − median| >
    z·1.4826·MAD outliers — the monitoring twin of the z-score
    outlier scan that a heavy-tailed feed needs (mean/stddev are
    themselves dragged by the outliers they're meant to find).

    Medians are exact: row_number over (value, tiebreak) picks the
    two middle rows, (lo + hi) / 2 — no interpolating percentile
    estimator whose partial order could drift between engines. Two
    window passes over the same (group, value-sorted) layout plus
    two hash aggregates. Output: (group..., n, median, mad,
    n_outliers).
    """
    v = F.col(value_col).cast("double")
    w1 = Window.partitionBy(*group_cols).orderBy(
        F.col("__v"), F.col("__tb")
    )
    sized = df.select(
        *[F.col(c) for c in group_cols],
        v.alias("__v"),
        F.col(tiebreak_col).alias("__tb"),
    ).withColumn("__rn", F.row_number().over(w1)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    )
    mid = sized.filter(
        (F.col("__rn") == F.floor((F.col("__n") + 1) / 2))
        | (F.col("__rn") == F.floor((F.col("__n") + 2) / 2))
    )
    med = mid.groupBy(*group_cols).agg(
        ((F.min("__v") + F.max("__v")) / F.lit(2.0)).alias("median"),
        F.first("__n").alias("__n"),
    )
    dev = sized.join(med, group_cols).select(
        *[F.col(c) for c in group_cols],
        "__v",
        "__tb",
        "median",
        F.abs(F.col("__v") - F.col("median")).alias("__d"),
    )
    w2 = Window.partitionBy(*group_cols).orderBy(
        F.col("__d"), F.col("__tb")
    )
    dmid = dev.withColumn("__rn", F.row_number().over(w2)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(*group_cols))
    ).filter(
        (F.col("__rn") == F.floor((F.col("__n") + 1) / 2))
        | (F.col("__rn") == F.floor((F.col("__n") + 2) / 2))
    )
    mad = dmid.groupBy(*group_cols).agg(
        ((F.min("__d") + F.max("__d")) / F.lit(2.0)).alias("mad")
    )
    out = (
        dev.join(mad, group_cols)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("median").alias("median"),
            F.first("mad").alias("mad"),
            F.sum(
                F.when(
                    F.col("__d")
                    > F.lit(z) * (F.lit(1.4826) * F.col("mad")),
                    1,
                ).otherwise(0)
            ).cast("long").alias("n_outliers"),
        )
    )
    return out.select(
        *[F.col(c) for c in group_cols],
        F.col("n").cast("long").alias("n"),
        "median",
        "mad",
        "n_outliers",
    )
