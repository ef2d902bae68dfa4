"""REST-source tests with fake transports (no network in container)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from etl_python_azure_spark.sources.rest import (
    distributed_fetch,
    fetch_json,
    paginated_fetch,
    parse_fetched_json,
    records_to_df,
)


def fake_transport_factory(responses: dict[str, tuple[int, str]]):
    def transport(url, headers):
        return responses.get(url, (404, "not found"))

    return transport


def test_fetch_json_envelope_and_status():
    t = fake_transport_factory(
        {"http://x/data": (200, json.dumps({"data": [{"id": 1}, {"id": 2}]}))}
    )
    recs = fetch_json(t, "http://x/data", envelope_key="data")
    assert [r["id"] for r in recs] == [1, 2]
    with pytest.raises(RuntimeError, match="status=404"):
        fetch_json(t, "http://x/missing")


def test_paginated_fetch_stops_on_short_page():
    pages = {
        "http://x?length=2&start=0": (200, json.dumps([{"i": 0}, {"i": 1}])),
        "http://x?length=2&start=2": (200, json.dumps([{"i": 2}])),
    }
    t = fake_transport_factory(pages)
    recs = paginated_fetch(
        t, "http://x?length={length}&start={start}", page_size=2, max_pages=5
    )
    assert [r["i"] for r in recs] == [0, 1, 2]


def test_records_to_df_flattens_nested(spark):
    recs = [
        {"id": 1, "audience_provider": {"id": 9, "name": "prov"}},
        {"id": 2, "audience_provider": None},
    ]
    df = records_to_df(spark, recs)
    assert set(df.columns) == {"id", "audience_provider_id", "audience_provider_name"}
    got = {r.id: r.audience_provider_name for r in df.collect()}
    assert got == {1: "prov", 2: None}


# module-level so it pickles cleanly to executors
def _executor_transport(url, headers):
    if url.endswith("/boom"):
        return -1, "connection refused"
    content_id = url.rsplit("/", 1)[-1]
    return 200, json.dumps(
        {"report": [{"display": 7, "content": int(content_id), "shows": 3}]}
    )


def test_distributed_fetch_error_capture(spark):
    reqs = spark.createDataFrame(
        [(1, "http://api/report/1"), (2, "http://api/report/2"), (3, "http://api/boom")],
        "content_id long, url string",
    )
    fetched = distributed_fetch(reqs, _executor_transport)
    rows = {r.content_id: r for r in fetched.collect()}
    assert rows[1].status == 200 and rows[3].status == -1
    assert "refused" in rows[3].body

    ok = fetched.filter(F.col("status") == 200)
    parsed = parse_fetched_json(
        ok,
        "display int, content int, shows int",
        envelope_key="report",
    )
    got = {r.content: (r.display, r.shows) for r in parsed.collect()}
    assert got == {1: (7, 3), 2: (7, 3)}
    assert "body" not in parsed.columns
