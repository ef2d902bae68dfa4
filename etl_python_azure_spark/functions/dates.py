"""Date/time parsing and arithmetic (F4, F7, F8, T3).

References: ISO split `S:171`; tz-strip parse `S:141,193–202`;
sliding −25d…+2d window `L:145–147,204–206`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def iso_date_part(col: Column | str) -> Column:
    """``'2024-01-05T12:00:00' → '2024-01-05'`` (F4, `S:171`).

    The reference splits on ``'T'`` and keeps the first piece; the
    robust equivalent is a date cast, but we preserve the exact
    string semantics (works even for malformed tails).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, "T").getItem(0)


def parse_timestamp_naive(col: Column | str) -> Column:
    """ISO-8601 string → session-tz timestamp (F7, `S:141,199`).

    The reference used ``dateutil.parser.parse(x).replace(tzinfo=None)``
    row-by-row; with ``spark.sql.session.timeZone=UTC`` a plain
    ``to_timestamp`` gives the same naive-UTC semantics, vectorized.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(c)


def sliding_window_bounds(
    days_back: int = 25, days_forward: int = 2, anchor: Column | None = None
) -> tuple[Column, Column]:
    """(today−*days_back*, today+*days_forward*) — the reprocess window
    the Latinad pipeline recomputes each run (T3, `L:145–147`).

    *anchor* defaults to ``current_date()``; pass a fixed date for
    deterministic tests/oracles.
    """
    a = anchor if anchor is not None else F.current_date()
    return F.date_sub(a, days_back), F.date_add(a, days_forward)
