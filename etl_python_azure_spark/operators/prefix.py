"""Distributed prefix sums (global running totals without a
single-partition window).

``Window.orderBy(col)`` with no ``partitionBy`` is the classic Spark
scale-killer: every row moves to ONE partition and one task computes
the whole running sum. The two-phase form here keeps the same answer
with no single-partition stage:

1. bucket rows into ~balanced, *order-contiguous* ranges of the order
   column (split points from ``approxQuantile`` — collected once, so
   the bucketing is a fixed pure function of the order column; any
   monotone bucketing yields the same global prefix sum);
2. one small aggregate job collects per-bucket totals (≤ num_buckets
   rows) and turns them into cumulative offsets on the driver;
3. the real pass computes the within-bucket running sum (window
   partitioned BY BUCKET — parallel) and adds the bucket's offset via
   a literal map.

Rows shuffle once, by bucket; the driver only ever sees
``num_buckets`` totals. At 100 TB the base projection feeding both
phases should be persisted (or be a cheap column pruned scan — phase
2 reads only (order, value)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum_before",
    exclusive: bool = True,
    num_buckets: int | None = None,
) -> DataFrame:
    """Add *out_col* = running sum of *value_col* in *order_col* order.

    ``exclusive=True`` (default) sums strictly-preceding rows (the
    ``ROWS … AND 1 PRECEDING`` form); ``False`` includes the current
    row. *order_col* must be numeric and unique (it is the total
    order); *value_col* should be integral or decimal for an exact
    result.
    """
    spark = df.sparkSession
    n = num_buckets or spark.sparkContext.defaultParallelism
    # contiguous-range bucketing from sampled quantiles of the order
    # column; collected ONCE so both phases see identical constants.
    probs = [i / n for i in range(1, n)]
    splits = (
        sorted(set(df.stat.approxQuantile(order_col, probs, 0.001)))
        if probs
        else []
    )
    if splits:
        arr = ", ".join(repr(float(s)) for s in splits)
        bucket = F.expr(
            f"size(filter(array({arr}), b -> b < CAST({order_col} AS DOUBLE)))"
        )
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn("__bucket", bucket)

    # phase 2: tiny per-bucket totals -> cumulative offsets
    totals = {
        r["__bucket"]: r["t"]
        for r in bucketed.groupBy("__bucket")
        .agg(F.sum(value_col).alias("t"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for b in sorted(totals):
        offsets[b] = acc
        acc += totals[b] or 0
    pairs: list = []
    for b, off in offsets.items():
        pairs += [F.lit(b), F.lit(off)]
    offset_expr = (
        F.coalesce(F.create_map(*pairs)[F.col("__bucket")], F.lit(0))
        if pairs
        else F.lit(0)
    )

    # phase 3: parallel within-bucket running sum + broadcast offset
    upper = -1 if exclusive else 0
    w = (
        Window.partitionBy("__bucket")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, upper)
    )
    local = F.coalesce(F.sum(value_col).over(w), F.lit(0))
    return bucketed.withColumn(out_col, local + offset_expr).drop("__bucket")
