"""Skew mitigation for hot-key joins and aggregations.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
on in :mod:`..session`) handles most skew at runtime; these helpers
cover the cases AQE can't — e.g. a broadcast-ineligible dimension
join where one key holds 30% of the fact rows, or a groupBy where a
single key overwhelms one reducer.

- :func:`salted_join` — fact side gets a uniform salt in
  [0, buckets); the (small-ish) other side is replicated once per
  salt value; the join key becomes (key, salt) so the hot key's rows
  spread over *buckets* reducers. Output is identical to the plain
  join (the salt never leaves the operator).
- :func:`salted_aggregate` — two-phase agg: partial agg on
  (key, salt), final agg on key. Same trick Spark's own partial
  aggregation does, but with an explicit fan-out for a single
  mega-hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _with_salt(df: DataFrame, buckets: int) -> DataFrame:
    # uniform, cheap, no RNG state: hash a per-row id into buckets.
    # (monotonically_increasing_id is partition-stable; its hash is
    # uniform enough to spread a hot key.)
    return df.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(buckets))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Join a skewed fact side to *other*, spreading hot keys.

    *other* is replicated *buckets*× (explode over the salt range) —
    use only when |other| ≪ |skewed| (the usual skew shape: huge
    fact, modest dim that still exceeds the broadcast threshold).

    Only join types where *other* rows never surface unmatched are
    allowed (inner/left/semi/anti): with ``right``/``full``, each
    unmatched *other* row would be emitted once per salt replica —
    silently wrong — so those raise.
    """
    normalized = how.lower().replace("_", "")
    if normalized not in {"inner", "left", "leftouter", "leftsemi", "semi",
                          "leftanti", "anti"}:
        raise ValueError(
            f"salted_join does not support how={how!r}: replicated "
            "right-side rows would duplicate in right/full joins"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salted_fact = _with_salt(skewed, buckets)
    replicated = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = salted_fact.join(replicated, [*keys, "__salt"], how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    buckets: int = 8,
) -> DataFrame:
    """Two-phase aggregation through an explicit salt.

    ``partial_aggs`` aggregate within (keys, salt); ``final_aggs``
    combine the partials per key (e.g. partial ``sum(x) as s`` then
    final ``sum(s) as s``). Use when one key dominates a reducer even
    after map-side combine.
    """
    salted = _with_salt(df, buckets)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def key_skew_profile(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Key-distribution diagnostics for a prospective join/aggregate.

    One row: key cardinality, row count, the hottest key's row count
    and share, exact p50/p99 per-key counts, and skew factor
    (max / median). This is the pre-flight check that decides the
    shuffle strategy at 100 TB: max_share ≈ 1/partitions means a
    plain hash join serializes on one reducer → reach for
    ``salted_join``/``salted_aggregate`` or AQE skew splitting.

    Cost: one shuffle to count keys, then a single aggregate over
    the (already small) per-key count table.
    """
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("__n"))
    return counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("__n").alias("n_rows"),
        F.max("__n").alias("max_key_rows"),
        # Spark's percentile_disc returns DOUBLE; the picked value is
        # an actual per-key count, so the bigint cast is exact
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __n)")
        .cast("bigint")
        .alias("p50_key_rows"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY __n)")
        .cast("bigint")
        .alias("p99_key_rows"),
        (F.max("__n").cast("double") / F.sum("__n")).alias("max_share"),
        (
            F.max("__n").cast("double")
            / F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY __n)")
        ).alias("skew_factor"),
    )
