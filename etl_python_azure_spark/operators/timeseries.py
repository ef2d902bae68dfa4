"""Time-series repair over event-derived daily series.

Gap-filling with a zero default lives in ``daily_activity_gapfill``
(queries/events.py); this module adds VALUE reconstruction — linear
interpolation across missing days — the preprocessing step for
per-entity metric series feeding forecasting / anomaly models.

Scale shape: one spine explode (per-entity day range), one window
per direction over (entity, day) — the same sort-once layout every
window op here shares. No driver state, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def linear_interpolate_gaps(
    daily: DataFrame,
    key_col: str = "user_id",
    day_col: str = "day",
    val_col: str = "v",
) -> DataFrame:
    """Fill missing days of a per-key daily series by linear
    interpolation between the nearest observed values.

    *daily* holds observed rows only: (key, day DATE, value). The
    output has one row per key per day between that key's first and
    last observation: observed values pass through; interior gaps
    get ``prev + (next - prev) * elapsed/gap_len`` (exact double
    arithmetic in that fixed order); there are no leading/trailing
    gaps by construction of the spine.

    Output: (key, day, v_filled, is_interpolated).
    """
    spine = (
        daily.groupBy(key_col)
        .agg(F.min(day_col).alias("__lo"), F.max(day_col).alias("__hi"))
        .select(
            key_col,
            F.explode(F.sequence("__lo", "__hi")).alias(day_col),
        )
    )
    j = spine.join(daily, [key_col, day_col], "left")

    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last(val_col, ignorenulls=True).over(w_prev)
    prev_d = F.last(
        F.when(F.col(val_col).isNotNull(), F.col(day_col)), ignorenulls=True
    ).over(w_prev)
    next_v = F.first(val_col, ignorenulls=True).over(w_next)
    next_d = F.first(
        F.when(F.col(val_col).isNotNull(), F.col(day_col)), ignorenulls=True
    ).over(w_next)

    gap_len = F.datediff(next_d, prev_d).cast("double")
    elapsed = F.datediff(F.col(day_col), prev_d).cast("double")
    interp = prev_v + (next_v - prev_v) * (elapsed / gap_len)
    return j.select(
        key_col,
        day_col,
        F.when(F.col(val_col).isNotNull(), F.col(val_col))
        .otherwise(interp)
        .alias("v_filled"),
        F.col(val_col).isNull().alias("is_interpolated"),
    )
