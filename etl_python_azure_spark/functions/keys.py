"""Derived/surrogate keys (F5, F6).

Reference: ``mezclar_columnas`` row-wise 3-column concat `L:200–201`
applied at `L:251`; CSV id-list join `L:149`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def surrogate_key(*cols: Column | str, sep: str = "") -> Column:
    """Concatenate key parts (cast to string) into one surrogate key.

    Vectorized form of the ``apply(axis=1)`` at `L:251`. NULL parts
    become empty strings (concat_ws skips nulls only between parts,
    so coalesce each part explicitly to match pandas str() semantics
    deterministically).
    """
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(""))
        for c in cols
    ]
    return F.concat_ws(sep, *parts)


def csv_id_list(df: DataFrame, col: str, sep: str = ",") -> str:
    """Driver-side CSV of a (small!) id column (F6, `L:149`).

    Bounded collect — the reference caps this at ≤11k ids. For
    unbounded key sets keep ids distributed (see sources.rest fan-out).
    """
    rows = df.select(F.col(col).cast("string")).collect()
    return sep.join(r[0] for r in rows)
