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


# ---- datatable-protocol pagination properties (r03 verdict item 8) ----

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(total=st.integers(0, 47), page_size=st.integers(1, 12))
def test_paginated_fetch_recovers_all_records(total, page_size):
    """A well-behaved datatable server (`L:78` protocol): any
    (total, page_size) combination — including ragged and empty last
    pages — yields exactly the full record list, in order."""
    data = [{"i": i} for i in range(total)]

    def transport(url, headers):
        import urllib.parse as up

        q = dict(up.parse_qsl(up.urlsplit(url).query))
        start, length = int(q["start"]), int(q["length"])
        return 200, json.dumps(data[start : start + length])

    recs = paginated_fetch(
        transport,
        "http://x?length={length}&start={start}",
        page_size=page_size,
        max_pages=100,
    )
    assert recs == data


@settings(max_examples=30, deadline=None)
@given(total=st.integers(1, 30), page_size=st.integers(1, 10))
def test_paginated_fetch_duplicate_page_defense(total, page_size):
    """A misbehaving server that ignores ``start=`` (always returns
    the first page) must not loop or duplicate: the walk stops as
    soon as a page repeats, so the result is exactly one page."""
    data = [{"i": i} for i in range(total)]

    def transport(url, headers):
        import urllib.parse as up

        q = dict(up.parse_qsl(up.urlsplit(url).query))
        return 200, json.dumps(data[: int(q["length"])])

    recs = paginated_fetch(
        transport,
        "http://x?length={length}&start={start}",
        page_size=page_size,
        max_pages=100,
    )
    assert recs == data[:page_size]


def test_paginated_fetch_id_key_survives_identical_pages():
    """With row identity, genuinely identical-looking consecutive
    pages keep paginating (the equality heuristic would truncate),
    and a server that ignores start= still stops after one page."""
    data = [{"id": i, "v": "same"} for i in range(5)]

    def honest(url, headers):
        import urllib.parse as up

        q = dict(up.parse_qsl(up.urlsplit(url).query))
        s, ln = int(q["start"]), int(q["length"])
        return 200, json.dumps(data[s : s + ln])

    recs = paginated_fetch(
        honest, "http://x?length={length}&start={start}",
        page_size=2, max_pages=10, id_key="id",
    )
    assert recs == data

    def stuck(url, headers):
        import urllib.parse as up

        q = dict(up.parse_qsl(up.urlsplit(url).query))
        return 200, json.dumps(data[: int(q["length"])])

    recs = paginated_fetch(
        stuck, "http://x?length={length}&start={start}",
        page_size=2, max_pages=10, id_key="id",
    )
    assert recs == data[:2]
