"""Join operators (J1–J4) and the CDC new/updated split (T4).

References: composite-key left join `L:249`; CDC probe join `S:215`;
new-rows split (null probe) `S:218`; changed-rows split (strict
``updated_at >``) `S:221`.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def left_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    broadcast_right: bool = False,
) -> DataFrame:
    """Left equi-join (J1, `L:249`).

    ``broadcast_right=True`` for dimension-sized right sides (the
    reference's reports-meta side is ≤11k rows) — skips the shuffle
    entirely; at 100 TB the fact side then never moves.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how="left")


def anti_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """Rows of *left* with no match in *right* (J3, `S:218`)."""
    return left.join(right, on=on, how="left_anti")


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """Rows of *left* with ≥1 match in *right* (EXISTS)."""
    return left.join(right, on=on, how="left_semi")


@dataclass
class CdcSplit:
    """Result of :func:`cdc_split`: the incremental-upsert halves."""

    new: DataFrame      # keys absent from existing
    updated: DataFrame  # keys present with strictly newer version
    # NB: rows whose version is EQUAL or OLDER than existing are in
    # neither frame — the reference's strict ``>`` (`S:221`) silently
    # drops re-sent unchanged rows; preserved exactly (SURVEY §7.3).


def cdc_split(
    incoming: DataFrame,
    existing: DataFrame,
    key: str = "id",
    version_col: str = "updated_at",
) -> CdcSplit:
    """Split *incoming* into (new, updated) against *existing* (T4).

    Restates `S:209–227`: probe-join on *key* (`S:215`), null probe →
    new (`S:218`), strictly-greater version → updated (`S:221`).

    Scale: the probe side is a 2-column projection of the target
    (key + version) — broadcast it when it fits (typical: billions of
    facts vs millions of live keys still favors a shuffled join, so
    we leave the strategy to Catalyst/AQE but pre-prune columns so
    the exchange is as narrow as possible).
    """
    probe = existing.select(
        F.col(key), F.col(version_col).alias("__existing_version")
    )
    joined = incoming.join(probe, on=key, how="left")
    new = joined.filter(F.col("__existing_version").isNull()).drop(
        "__existing_version"
    )
    updated = joined.filter(
        F.col(version_col) > F.col("__existing_version")
    ).drop("__existing_version")
    return CdcSplit(new=new, updated=updated)


def merge_upsert(
    incoming: DataFrame,
    existing: DataFrame,
    key: str = "id",
    version_col: str = "updated_at",
) -> DataFrame:
    """Pure-DataFrame MERGE: the post-image of upserting *incoming*
    into *existing* (new + updated win; unchanged/older lose).

    This is the Delta ``MERGE INTO … WHEN MATCHED AND s.v > t.v``
    semantics (SURVEY §2.9 T4) computed as a plan, usable with any
    sink: anti-join existing against winners, union winners.
    """
    split = cdc_split(incoming, existing, key, version_col)
    winners = split.new.unionByName(split.updated)
    keep_existing = existing.join(split.updated.select(key), on=key, how="left_anti")
    return keep_existing.unionByName(winners.select(*existing.columns))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str] | str,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two table snapshots — the change-data-feed
    the reference's full-refresh loads (`L:190–197`, `S:229–245`)
    throw away: WHAT actually changed between runs.

    Full outer join on *key_cols*; each non-matching or value-drifted
    row comes back as::

        (keys..., change_type ∈ {added, removed, changed},
         changed_cols)  -- comma-joined names, '' unless changed

    Unchanged rows are dropped (the output is the delta, sized by
    churn, not by the table). Comparison is null-safe per column.

    Scale shape: ONE shuffle join on the key — the same cost as the
    MERGE it usually precedes; no collect, no per-column passes (all
    column comparisons evaluate in one projection).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cmp = compare_cols or [c for c in old.columns if c not in keys]
    o = old.select(
        *[F.col(k).alias(f"__ko_{k}") for k in keys],
        *[F.col(c).alias(f"__o_{c}") for c in cmp],
    )
    n = new.select(
        *[F.col(k).alias(f"__kn_{k}") for k in keys],
        *[F.col(c).alias(f"__n_{c}") for c in cmp],
    )
    cond = [
        o[f"__ko_{k}"].eqNullSafe(n[f"__kn_{k}"]) for k in keys
    ]
    j = o.join(n, cond, "full_outer")
    in_old = F.col(f"__ko_{keys[0]}").isNotNull()
    in_new = F.col(f"__kn_{keys[0]}").isNotNull()
    drifted = [
        F.when(
            ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
        )
        for c in cmp
    ]
    changed_cols = F.concat_ws(
        ",", F.array_compact(F.array(*drifted))
    )
    change_type = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(changed_cols != "", F.lit("changed"))
    )
    return (
        j.select(
            *[
                F.coalesce(f"__kn_{k}", f"__ko_{k}").alias(k)
                for k in keys
            ],
            change_type.alias("change_type"),
            F.when(change_type == "changed", changed_cols)
            .otherwise(F.lit(""))
            .alias("changed_cols"),
        )
        .filter(F.col("change_type").isNotNull())
    )
