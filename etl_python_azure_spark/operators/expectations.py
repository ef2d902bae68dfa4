"""Declarative data-quality expectations (deequ-lite).

The reference trusts its API payloads and validates implicitly (casts
that throw, dropna calls — `L:104`, `S:173`); production loads at
100 TB need the checks stated up front and costed honestly:

- :func:`row_checks` — ANY number of row-level predicates in ONE
  scan: each check is a boolean Column, violations are counted with
  conditional sums inside a single aggregate, and the wide result is
  unpivoted to a (check, n_violations) report. Adding a check adds a
  column to the agg, never a pass over the data.
- :func:`unique_check` — key uniqueness (one groupBy on the key).
- :func:`referential_check` — FK containment via left-anti join
  (broadcast when the parent's keyset is small, else shuffle join).

All three emit the same report shape
``(check_name, n_rows, n_violations, passed)`` so reports union into one
table per load — write it next to the data and gate downstream jobs
on ``passed``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_REPORT_COLS = ("check_name", "n_rows", "n_violations", "passed")


def _finish(df: DataFrame) -> DataFrame:
    # empty inputs make SUM() NULL; a NULL report row would vanish
    # from either side of a passed-based gate — coalesce to (0, 0)
    n_rows = F.coalesce(F.col("n_rows").cast("long"), F.lit(0))
    n_viol = F.coalesce(F.col("n_violations").cast("long"), F.lit(0))
    return df.select(
        "check_name",
        n_rows.alias("n_rows"),
        n_viol.alias("n_violations"),
        (n_viol == 0).alias("passed"),
    )


def row_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Count violations of each row-level predicate in one scan.

    *checks* maps check name → boolean Column that should hold for
    every row (NULL counts as a violation — an unknown is not a
    pass).
    """
    if not checks:
        raise ValueError("row_checks requires at least one check")
    aggs = [
        F.sum(
            F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
        ).alias(f"__v_{i}")
        for i, (_, cond) in enumerate(checks.items())
    ]
    wide = df.agg(F.count("*").alias("__n"), *aggs)
    stack = ", ".join(
        "'{}', __v_{}".format(name.replace("'", "\\'"), i)
        for i, name in enumerate(checks)
    )
    long = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(checks)}, {stack}) AS (check_name, n_violations)"
        ),
    ).select("check_name", "n_rows", "n_violations")
    return _finish(long)


def unique_check(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Rows carrying a duplicated key are violations (first copy of a
    dup counts too: 2 copies → 2 violating rows)."""
    name = name or f"unique({','.join(cols)})"
    per_key = df.groupBy(*cols).agg(F.count("*").alias("__c"))
    agg = per_key.agg(
        F.sum("__c").alias("n_rows"),
        F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0)).alias(
            "n_violations"
        ),
    )
    return _finish(agg.select(F.lit(name).alias("check_name"), "n_rows", "n_violations"))


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    """Child rows whose key has no parent row are violations."""
    name = name or f"fk({child_key}->{parent_key})"
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    agg = child.agg(F.count("*").alias("n_rows")).crossJoin(
        orphans.agg(F.count("*").alias("n_violations"))
    )
    return _finish(agg.select(F.lit(name).alias("check_name"), "n_rows", "n_violations"))


def combine_reports(reports: list[DataFrame]) -> DataFrame:
    """Union per-check reports into one load-level quality table."""
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out
