"""High-watermark bookkeeping for incremental ingestion."""

from __future__ import annotations

import json

from etl_python_azure_spark.sources.state import get_watermark, set_watermark


def test_watermark_roundtrip(tmp_path):
    d = str(tmp_path / "state")
    assert get_watermark(d, "tasks", "1970-01-01T00:00:00") == "1970-01-01T00:00:00"
    set_watermark(d, "tasks", "2024-03-01T10:00:00")
    assert get_watermark(d, "tasks", "x") == "2024-03-01T10:00:00"
    # advance again; per-source isolation
    set_watermark(d, "tasks", "2024-03-02T00:00:00")
    set_watermark(d, "turns", "2024-01-01T00:00:00")
    assert get_watermark(d, "tasks", "x") == "2024-03-02T00:00:00"
    assert get_watermark(d, "turns", "x") == "2024-01-01T00:00:00"
    # file is valid json with audit timestamp
    doc = json.load(open(f"{d}/tasks.json"))
    assert set(doc) == {"watermark", "updated_at"}
