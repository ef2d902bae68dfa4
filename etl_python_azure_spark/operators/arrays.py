"""Nested-array operators (N3, A-6, J5 restatement).

Reference: positional workers flatten ``S:154–180`` — first 4
elements of a list-of-struct column become ``worker_name_1..4`` /
``worker_rut_1..4``; horizontal concat `S:165` is avoided entirely by
keeping the data nested until this projection (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def positional_unnest(
    df: DataFrame,
    array_col: str,
    n: int,
    fields: list[str] | None = None,
    name_template: str = "{array}_{field}_{i}",
    drop_source: bool = True,
) -> DataFrame:
    """First *n* elements of an array column → fixed columns.

    For an ``array<struct<...>>`` column, each requested struct
    *field* of element ``i`` (1-based) lands in its own column;
    missing elements yield NULL (pandas' guard at `S:157–159` is
    unnecessary — ``getItem`` past the end is NULL). For a plain
    array, ``fields=None`` emits ``{array}_{i}`` columns.

    Pure Column projection: no explode, no shuffle, no row-order
    dependence — the restatement of the reference's positional
    ``json_normalize`` + ``concat(axis=1)`` (J5).
    """
    out: list[Column] = [F.col(c) for c in df.columns if c != array_col]
    if not drop_source:
        out.append(F.col(array_col))
    for i in range(n):
        # try_element_at: NULL past the end (ANSI-safe; 1-based index)
        elem = F.try_element_at(F.col(array_col), F.lit(i + 1))
        if fields is None:
            out.append(
                elem.alias(
                    name_template.format(array=array_col, field="", i=i + 1)
                    .replace("__", "_")
                )
            )
        else:
            for f in fields:
                # nested path like "worker.name" works via getField chain
                e: Column = elem
                for part in f.split("."):
                    e = e.getField(part)
                out.append(
                    e.alias(
                        name_template.format(
                            array=array_col, field=f.replace(".", "_"), i=i + 1
                        )
                    )
                )
    return df.select(*out)


def array_head(col: Column | str, n: int) -> Column:
    """First *n* elements (A-6, ``df.iloc[:, :4]`` analog `S:159`)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.slice(c, 1, n)
