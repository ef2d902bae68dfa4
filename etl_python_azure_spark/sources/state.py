"""Incremental-ingestion bookkeeping: the high-watermark pattern.

The reference pushes a date range into each API request
(``assigned_from``/``assigned_to``, `S:93–96`) but recomputes the
range from wall-clock every run — late or failed runs silently skip
data. The standard fix is a persisted per-source high watermark:
each run reads the last successful watermark, requests
``[watermark, now)``, and advances it only after the load commits.

Storage is a tiny JSON document per source (atomic rename); on a
cluster this lives on the shared filesystem/object store next to the
sink tables.
"""

from __future__ import annotations

import json
import os
import tempfile
from datetime import datetime, timezone


def get_watermark(state_dir: str, source: str, default: str) -> str:
    """Read the source's high watermark (ISO string), or *default*."""
    path = os.path.join(state_dir, f"{source}.json")
    if not os.path.exists(path):
        return default
    with open(path) as f:
        return json.load(f)["watermark"]


def set_watermark(state_dir: str, source: str, watermark: str) -> None:
    """Atomically advance the watermark (write-then-rename).

    Call AFTER the sink load commits — crash before this leaves the
    old watermark, so the next run re-requests the window
    (at-least-once, consistent with the reference's T5 posture; the
    CDC upsert makes the replay idempotent).
    """
    os.makedirs(state_dir, exist_ok=True)
    path = os.path.join(state_dir, f"{source}.json")
    fd, tmp = tempfile.mkstemp(dir=state_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(
            {
                "watermark": watermark,
                "updated_at": datetime.now(timezone.utc).isoformat(),
            },
            f,
        )
    os.replace(tmp, path)
