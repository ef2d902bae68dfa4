"""Distributed interval-overlap join via grid binning.

Spark has no native interval/overlap join: the naive formulation
(equi-join on a coarse key + range predicate) degenerates when many
rows share the key, and a theta-join is a cartesian product. The
scale pattern — used by every production range-join implementation
(Databricks' range-join hints, GeoSpark/Sedona grids, AsOf engines)
— is GRID BINNING:

1. every interval [s, e] is exploded to the grid cells it touches
   (``floor(s/w) .. floor(e/w)`` for bin width w),
2. candidates come from an EQUI-join on (key, cell) — shuffle-
   friendly, AQE-skew-splittable,
3. the true overlap predicate filters candidates, and
4. each qualifying pair is kept exactly ONCE with zero dedup
   shuffle: only in the cell containing the OVERLAP START
   (``greatest(s_a, s_b)`` lies in both intervals, so both sides
   always meet in that cell — the canonical-cell trick).

Pick w ≈ the typical interval length: explode factor stays ~2× while
cells stay selective. Degenerate long intervals (≫ w) explode to
many cells — cap or split those upstream.

Everything is pure Column expression; dates only (day grid).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_GRID_EPOCH = "1992-01-01"  # any fixed date at/before the data


def _day_number(d: Column) -> Column:
    """Days since the fixed grid epoch (non-negative for TPC-H-ish
    dates; the grid only needs consistency, not sign handling)."""
    return F.datediff(d, F.lit(_GRID_EPOCH).cast("date"))


def binned_overlap_pairs(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    payload_cols: list[str],
    bin_days: int = 7,
    distinct_on: str | None = None,
) -> DataFrame:
    """Self-join *df* on overlapping [start, end] DATE intervals
    within the same *key_cols* group, via grid binning (module
    docstring). *payload_cols* are carried through with ``_a`` /
    ``_b`` suffixes; *distinct_on* (a payload col) orders the pair
    (a < b) so each unordered pair appears once and self/same-value
    pairs are excluded.

    ``distinct_on=None`` means RAW pair semantics, stated here
    because it surprises (r11 ADVICE): every row pairs with ITSELF
    (a self-pair passes both the overlap and canonical-cell
    filters) and every unordered pair of distinct rows appears
    TWICE (once per orientation). That form is only useful for
    callers that post-filter on their own row identity; for
    counting, always pass *distinct_on* (there is deliberately no
    hidden row-id fallback — synthesizing one would pick an
    arbitrary orientation for payload-identical rows and silently
    drop genuine duplicate-interval pairs).

    Output: key_cols + payload ``_a``/``_b`` columns +
    ``overlap_days`` (inclusive day count of the intersection).

    Precondition: ``end >= start`` on every row (``F.sequence``
    silently DESCENDS for a reversed interval, mis-binning it) and
    no NULL dates — validate/clamp upstream for untrusted data.

    Scale shape: one explode (≤ len/bin_days + 1 cells per
    interval), one equi-shuffle on (key, cell), the overlap and
    canonical-cell predicates run as join residuals. Pair output is
    collision-sized, never the key-group cross product across the
    whole time axis.
    """
    sd = _day_number(F.col(start_col))
    ed = _day_number(F.col(end_col))
    cells = F.sequence(
        F.floor(sd / F.lit(bin_days)).cast("long"),
        F.floor(ed / F.lit(bin_days)).cast("long"),
    )
    binned = df.select(
        *key_cols,
        *payload_cols,
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
        F.explode(cells).alias("__cell"),
    )
    a = binned.select(
        *[F.col(c) for c in key_cols],
        F.col("__cell"),
        *[F.col(c).alias(f"{c}_a") for c in payload_cols],
        F.col("__s").alias("__sa"),
        F.col("__e").alias("__ea"),
    )
    b = binned.select(
        *[F.col(c) for c in key_cols],
        F.col("__cell"),
        *[F.col(c).alias(f"{c}_b") for c in payload_cols],
        F.col("__s").alias("__sb"),
        F.col("__e").alias("__eb"),
    )
    canon = F.floor(
        _day_number(F.greatest("__sa", "__sb")) / F.lit(bin_days)
    ).cast("long")
    pairs = (
        a.join(b, [*key_cols, "__cell"])
        .filter(F.col("__sa") <= F.col("__eb"))
        .filter(F.col("__sb") <= F.col("__ea"))
        .filter(F.col("__cell") == canon)
    )
    if distinct_on is not None:
        pairs = pairs.filter(
            F.col(f"{distinct_on}_a") < F.col(f"{distinct_on}_b")
        )
    overlap = (
        F.datediff(
            F.least("__ea", "__eb"), F.greatest("__sa", "__sb")
        )
        + F.lit(1)
    ).cast("long")
    return pairs.select(
        *key_cols,
        *[f"{c}_a" for c in payload_cols],
        *[f"{c}_b" for c in payload_cols],
        overlap.alias("overlap_days"),
    )
