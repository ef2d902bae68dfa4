"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left row (key, t), attach the right row with the greatest
right-ts ≤ t (backward direction; ties on ts include the equal row).
Classic uses: last price before a trade, last session/view state
before a purchase, dimension snapshot as of a fact's timestamp.

Distributed implementation (no per-group pandas, no range cross
join): union both sides tagged, one window sort per key, and a
``last(..., ignorenulls)`` carry-forward of the right payload — a
single shuffle on the key, linear scan within partitions. This is
the 100 TB-appropriate form of pandas' ``merge_asof`` (which the
pyspark guide lists as the applyInPandas fallback — unnecessary
here: the window form stays JVM-side).

Determinism: if several right rows share the same (key, ts), the
carried value is ambiguous — pre-dedupe the right side on (key, ts)
(e.g. keep max of the payload) as the caller's contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_prefix: str = "asof_",
    direction: str = "backward",
    tolerance=None,
) -> DataFrame:
    """As-of left join (backward or forward, optional tolerance).

    ``backward``: greatest right ts ≤ left ts; ``forward``: smallest
    right ts ≥ left ts (equal ts matches in both). *tolerance* (a SQL
    interval string for timestamps, or a numeric span) additionally
    requires ``|right_ts − left_ts| <= tolerance`` — stale matches
    become NULL, like pandas ``merge_asof(tolerance=…)``.

    Output: all *left* columns + each non-key right column as
    ``{right_prefix}{col}`` (NULL when nothing matches).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]

    r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.struct(
            F.col(right_ts).alias("__matched_ts"),
            *[F.col(c) for c in payload_cols],
        ).alias("__rv"),
        F.lit(1).alias("__is_r"),
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("__t"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        F.lit(0).alias("__is_r"),
    )
    combined = l.unionByName(r, allowMissingColumns=True)

    # backward: scan ascending, carry the last preceding right row;
    # forward: scan descending, carry the last following right row.
    # Right rows sort before left at equal __t → equal-ts ties match.
    order = F.asc("__t") if direction == "backward" else F.desc("__t")
    w = (
        Window.partitionBy(*keys)
        .orderBy(order, F.desc("__is_r"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = combined.withColumn(
        "__carry", F.last("__rv", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__is_r") == 0)
    if tolerance is not None:
        tol = F.expr(tolerance) if isinstance(tolerance, str) else F.lit(tolerance)
        mt = F.col("__carry").getField("__matched_ts")
        gap = (F.col("__t") - mt) if direction == "backward" else (mt - F.col("__t"))
        out = out.withColumn(
            "__carry", F.when(gap <= tol, F.col("__carry"))
        )
    for c in payload_cols:
        out = out.withColumn(right_prefix + c, F.col("__carry").getField(c))
    return out.drop("__t", "__rv", "__is_r", "__carry")
