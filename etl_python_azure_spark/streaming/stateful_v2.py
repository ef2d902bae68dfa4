"""Stateful streaming on Spark 4's ``transformWithStateInPandas``.

The successor API to ``applyInPandasWithState`` (used in
``streaming/stateful.py``): a ``StatefulProcessor`` object owns typed
state handles (value/list/map) with optional per-state TTL, timers,
and composable state variables — capabilities the older flatmap API
lacks. This module keeps one production-shaped operator on the new
API so the engine exercises both stateful surfaces.

``running_topk_stream``: per-key top-k values maintained across
micro-batches. State is ONE array<double> of at most k elements per
key (bounded regardless of stream length); each update merges the
batch's values into the kept array — the classic bounded-state
summary a leaderboard / per-user-max pipeline maintains. With
*ttl_ms* set, an idle key's state expires and its leaderboard
restarts — the state-size control knob applyInPandasWithState never
had.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # pragma: no cover - import surface depends on pyspark build
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment]


class _TopKProcessor(StatefulProcessor):
    """Keep the top-*k* values per key in one ValueState array."""

    def __init__(self, k: int, key_col: str, val_col: str, ttl_ms: int | None):
        self._k = k
        self._key_col = key_col
        self._val_col = val_col
        self._ttl_ms = ttl_ms

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._state = handle.getValueState(
            "topk", "vals array<double>", ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        if self._state.exists():
            stored = self._state.get()
            cur = list(stored[0]) if stored is not None else []
        else:
            cur = []
        for pdf in rows:
            cur.extend(float(v) for v in pdf[self._val_col])
        # stable top-k: sort desc, ties keep all equal values until k
        cur = sorted(cur, reverse=True)[: self._k]
        self._state.update((cur,))
        yield pd.DataFrame(
            {
                self._key_col: [key[0]] * len(cur),
                "rank": list(range(1, len(cur) + 1)),
                "value": cur,
            }
        )

    def close(self) -> None:  # pragma: no cover - nothing to release
        pass


def running_topk_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    val_col: str = "value",
    k: int = 5,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Per-key running top-*k* over a stream via
    ``transformWithStateInPandas`` (update mode, processing-time).

    Emits the key's CURRENT top-k after each micro-batch that touches
    it: (key, rank, value) rows, rank 1 = largest. State per key is
    the k-element array only — bounded, checkpointed, TTL-evictable.
    """
    return stream.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=_TopKProcessor(k, key_col, val_col, ttl_ms),
        outputStructType=f"{key_col} long, rank int, value double",
        outputMode="update",
        timeMode="none",
    )
