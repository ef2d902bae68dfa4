"""Custom stateful streaming operators (``applyInPandasWithState``).

The built-in windowed/session aggregations cover the reference's
needs; this is the escape hatch for operators Spark lacks — state
that must persist across micro-batches with arbitrary update logic.
Example shipped: per-key running totals that survive restarts via
the state store (the checkpointed analog of a driver-side
accumulator, which is what the reference's print-based counters
amount to).

State is per-key and partition-local: Spark shuffles each key to one
task, the pandas function sees (key, batch-iterator, state). Scale:
state volume ∝ distinct keys, not events — bound it with timeouts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key cumulative (count, sum) maintained across micro-batches.

    Output one row per key per batch in which the key appeared:
    (key, n_events_total, total_value). Exactly-once via the
    checkpointed state store.
    """

    out_schema = f"{key_col} long, n_events_total long, total_value double"
    state_schema = "n long, s double"

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s = state.get
        else:
            n, s = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events_total": [n], "total_value": [s]}
        )

    return (
        stream.groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
