"""Market-basket / co-occurrence mining over event streams — the
association-rule metrics (support, confidence, lift) behind
"users who did X in a session also did Y" analyses and
co-occurrence-based recommenders.

Scale shape: baskets are DISTINCT (basket, item) rows (one dedup
aggregate); pair candidates come from a self-equi-join ON THE BASKET
KEY with ``item_a < item_b`` — cost Σ|basket|², the standard a-priori
pair pass (cap basket size upstream if a degenerate basket appears);
metrics are integer-count ratios, engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import eager_checkpoint as _ckpt


def basket_pair_stats(
    df: DataFrame,
    basket_cols: list[str],
    item_col: str,
    assume_distinct: bool = False,
) -> DataFrame:
    """Association metrics for every unordered item pair.

    support(x,y) = n_xy / n_baskets;
    confidence(x→y) = n_xy / n_x (and the symmetric y→x);
    lift = (n_xy · n_baskets) / (n_x · n_y) — > 1 means x and y
    co-occur more than independence predicts.

    All counts are BIGINT; every ratio is one double division of
    exact integers (numerators multiplied BEFORE dividing), so the
    output is bit-identical across engines. Output: (item_a, item_b,
    n_xy, n_x, n_y, n_baskets, support, conf_a_to_b, conf_b_to_a,
    lift).
    """
    b = F.struct(*[F.col(c) for c in basket_cols]).alias("__bk")
    # persist: the dedup'd item table feeds four consumers (basket
    # count, item counts, both self-join sides); and the basket
    # count stays a LAZY 1-row broadcast frame instead of a
    # driver-side .count() at construction time (review catch:
    # merely building the plan used to execute a full scan).
    # Deliberately-leaked handle: the returned frame still lazily
    # depends on it, so this function cannot unpersist; the caller's
    # `spark.catalog.clearCache()` releases it (bench does so per
    # query).
    items = df.select(b, F.col(item_col).alias("__it"))
    if not assume_distinct:
        # pass assume_distinct=True when the caller already
        # deduplicated (user, basket, item) — skips a shuffle
        items = items.distinct()
    # eager checkpoint: basket sizes, item counts, and both pair-join
    # sides are concurrent branches of the one returned action (the
    # r12 persist-vs-checkpoint rule)
    items = items.transform(_ckpt)
    nb1 = items.select("__bk").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    item_n = items.groupBy("__it").agg(F.count(F.lit(1)).alias("__n"))
    a = items.select("__bk", F.col("__it").alias("item_a"))
    c = items.select("__bk", F.col("__it").alias("item_b"))
    pairs = (
        a.join(c, "__bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    nx = item_n.select(
        F.col("__it").alias("item_a"), F.col("__n").alias("n_x")
    )
    ny = item_n.select(
        F.col("__it").alias("item_b"), F.col("__n").alias("n_y")
    )
    nb = F.col("n_baskets")
    return (
        pairs.join(F.broadcast(nx), "item_a")
        .join(F.broadcast(ny), "item_b")
        .crossJoin(F.broadcast(nb1))
        .select(
            "item_a",
            "item_b",
            "n_xy",
            "n_x",
            "n_y",
            nb.cast("long").alias("n_baskets"),
            (
                F.col("n_xy").cast("double") / nb.cast("double")
            ).alias("support"),
            (
                F.col("n_xy").cast("double") / F.col("n_x").cast("double")
            ).alias("conf_a_to_b"),
            (
                F.col("n_xy").cast("double") / F.col("n_y").cast("double")
            ).alias("conf_b_to_a"),
            (
                (F.col("n_xy") * nb).cast("double")
                / (F.col("n_x") * F.col("n_y")).cast("double")
            ).alias("lift"),
        )
    )
