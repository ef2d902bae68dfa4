"""End-to-end pipeline tests on FIXTURES.md §B payload shapes.

Fake transports serve the reference APIs' JSON; assertions check the
loaded tables — the reshaping semantics the reference implements
(P4 filter, F3 gate, N3 positional flatten, CDC strict-> split,
window overwrite) all the way through the sinks.
"""

from __future__ import annotations

import datetime
import json

from pyspark.sql import functions as F

from etl_python_azure_spark.plans.latinad import run_latinad
from etl_python_azure_spark.plans.sercom import run_sercom

# ---------------------------------------------------------------------------
# Latinad fixtures (FIXTURES.md §B1–B3)
# ---------------------------------------------------------------------------

DISPLAYS = [
    {"id": 40660, "company_id": 1, "name": "filtered-out",
     "audience_provider": {"id": 5, "name": "prov"}},
    {"id": 1, "company_id": 1, "name": "d1", "resolution_width": 1920,
     "resolution_height": 1080, "latitude": -33.4, "longitude": -70.6,
     "audience_provider": {"id": 6, "name": "prov2"},
     "published": True, "country": "CL"},
    {"id": 2, "company_id": 2, "name": "d2", "published": False, "country": "AR",
     "audience_provider": {"id": 7, "name": "prov3"}},
]

CONTENTS = {
    "data": [
        {"id": 10, "name": "c10", "type": "video", "file": "ok-file.mp4",
         "ready": True, "company_id": 1, "category": "ads", "count_displays": 2},
        {"id": 11, "name": "c11", "type": "image", "file": "x" * 60,  # >50 → ''
         "ready": True, "company_id": 1, "category": "ads", "count_displays": 1},
        {"id": 12, "name": "c12", "type": "image", "file": None,  # null → ''
         "company_id": 2, "count_displays": 0},  # drifted: missing cols
    ]
}


def latinad_transport(url: str, headers: dict):
    if "/displays" in url:
        return 200, json.dumps(DISPLAYS)
    if "/contents" in url:
        return 200, json.dumps(CONTENTS)
    if "/report" in url:
        content = int(url.split("content=")[1].split("&")[0])
        if content == 12:  # per-request failure capture (T5)
            return 500, "server exploded"
        return 200, json.dumps({
            "report": [
                {"display": 1, "content": content, "shows": 5,
                 "total_time": 12345, "date": "2024-01-05", "impacts": 7},
                {"display": 2, "content": content, "shows": 2,
                 "total_time": 600, "date": "2024-01-06", "impacts": None},
                {"display": 1, "content": content, "shows": 1,
                 "total_time": 100, "date": "", "impacts": 1},  # P5 dropped
            ]
        })
    return 404, "nope"


def test_latinad_end_to_end(spark, tmp_path):
    sink = str(tmp_path / "wh")
    res = run_latinad(
        spark, latinad_transport, "http://api", sink_root=sink,
        window_start=datetime.date(2024, 1, 1),
        window_end=datetime.date(2024, 1, 28),
    )
    # P4: 40660 gone; P3: audience_provider_id dropped
    disp = spark.read.parquet(f"{sink}/display_info")
    assert {r.id for r in disp.select("id").collect()} == {1, 2}
    assert "audience_provider_id" not in disp.columns

    # F3 gate on arch
    cont = {r.id: r.arch for r in spark.read.parquet(f"{sink}/contenido_display").collect()}
    assert cont == {10: "ok-file.mp4", 11: "", 12: ""}

    # reports: content 12 failed → captured, not fatal
    failed = res.failed_requests.collect()
    assert [(r.content_id, r.status) for r in failed] == [(12, 500)]

    reports = spark.read.parquet(f"{sink}/contenido_data")
    rows = reports.collect()
    # 2 contents × 2 valid dates (P5 dropped the empty-Fecha row)
    assert len(rows) == 4
    by_key = {r.llave: r for r in rows}
    assert by_key["1012024-01-05"].impacts == 7
    assert by_key["1022024-01-06"].impacts == 0  # F9 null fill
    assert by_key["1012024-01-05"].total_time == 123.45  # F12 /100
    assert by_key["1012024-01-05"].content_name == "c10"  # J1 enrich

    # K3: overwrite only one partition, other dates survive
    upd = res.reports.filter(F.col("Fecha") == "2024-01-05").withColumn(
        "shows", F.lit(99)
    )
    from etl_python_azure_spark.sinks.files import ranged_overwrite

    ranged_overwrite(upd, f"{sink}/contenido_data", "Fecha")
    after = spark.read.parquet(f"{sink}/contenido_data")
    assert after.filter(F.col("shows") == 99).count() == 2
    assert after.filter(F.col("Fecha") == "2024-01-06").count() == 2


# ---------------------------------------------------------------------------
# Sercom fixtures (FIXTURES.md §B4–B7)
# ---------------------------------------------------------------------------

TASKS = [
    {"id": 100, "state": {"name": "open"}, "created_by": {"name": "ana"},
     "description": "t100", "updated_at": "2024-03-01T10:00:00",
     "created_at": "2024-02-01T10:00:00", "team": {"id": 5}, "turn": {"id": None}},
    {"id": 101, "state": {"name": "done"}, "created_by": {"name": "bob"},
     "description": "t101", "updated_at": "2024-03-02T09:30:00",
     "created_at": "2024-02-02T10:00:00", "team": {"id": None}, "turn": {"id": 3}},
    {"id": 102, "state": {"name": "done"}, "created_by": {"name": "cyn"},
     "description": "t102", "updated_at": "2024-03-01T08:00:00",
     "created_at": "2024-01-02T10:00:00", "team": {"id": 1}, "turn": {"id": 1}},
]

TURNS = [
    {"id": 1, "date": "2024-03-01T08:00:00", "team_id": 5,
     "workers": [{"worker": {"name": "ana", "rut": "1-9"}}]},
    {"id": 2, "date": "2024-03-02T08:00:00", "team_id": 6, "workers": []},
    {"id": 3, "date": "2024-03-03T08:00:00", "team_id": 7,
     "workers": [{"worker": {"name": f"w{i}", "rut": str(i)}} for i in range(5)]},
]

PROJECTS = [{"id": 7, "name": "p7", "add": "CC-77"}]
ELEMENTS = [
    {"element_type_id": 1, "commune_name": "stgo", "id": 50, "name": "e50",
     "latitude": -33.0, "longitude": -70.0, "address": "x 1",
     "deleted_at": None, "enabled": True, "external_id": "E50"},
    {"element_type_id": 2, "commune_name": "prov", "id": 51, "name": "e51",
     "latitude": -33.1, "longitude": -70.1, "address": "x 2",
     "deleted_at": "2024-01-05T00:00:00", "enabled": False, "external_id": "E51"},
]


def test_latinad_fetches_each_report_once(spark, tmp_path):
    """The fan-out result is pinned: one GET per content per run.

    Without the persist boundary every downstream action (the P8
    all-null scan, the sink write) re-executed the HTTP fan-out —
    measured 2× GETs per content. HTTP is not free and not guaranteed
    idempotent, so the count is a contract, not an optimization.
    """
    log = tmp_path / "calls.log"

    def counting_transport(url: str, headers: dict):
        if "/report" in url:
            with open(log, "a") as f:
                f.write(url.split("content=")[1].split("&")[0] + "\n")
        return latinad_transport(url, headers)

    run_latinad(
        spark, counting_transport, "http://api",
        sink_root=str(tmp_path / "wh"),
        window_start=datetime.date(2024, 1, 1),
        window_end=datetime.date(2024, 1, 28),
    )
    calls = log.read_text().split()
    assert sorted(calls) == ["10", "11", "12"]  # one GET per content


def sercom_transport(url: str, headers: dict):
    for frag, payload in (
        ("/tasks", TASKS), ("/turns", TURNS),
        ("/projects", PROJECTS), ("/elements", ELEMENTS),
    ):
        if frag in url:
            return 200, json.dumps(payload)
    return 404, "nope"


def test_sercom_end_to_end(spark, tmp_path):
    d = datetime.datetime
    # CDC probe (FIXTURES §B7): 100 equal ts → dropped; 101 older-in-
    # target → updated; 102 newer-in-target → dropped; (none) → 100? no:
    # id 100 present equal, 101 present older, 102 present newer.
    existing = spark.createDataFrame(
        [
            (100, d(2024, 3, 1, 10, 0, 0)),   # equal → neither
            (101, d(2024, 3, 1, 0, 0, 0)),    # older → updated
            (102, d(2024, 3, 5, 0, 0, 0)),    # newer → dropped
        ],
        "id long, updated_at timestamp",
    )
    sink = str(tmp_path / "wh")
    res = run_sercom(
        spark, sercom_transport, "http://api",
        existing_tasks=existing, sink_root=sink,
    )
    # F7 tz-naive parse
    tasks = {r.id: r for r in res.tasks.collect()}
    assert tasks[100]["updated_at"] == d(2024, 3, 1, 10, 0, 0)
    assert tasks[100]["state_name"] == "open"

    # CDC strict-> semantics (S:218,221)
    assert [r.id for r in res.task_split.new.collect()] == []
    assert [r.id for r in res.task_split.updated.collect()] == [101]

    # N3 positional flatten incl. empty + >4 workers
    turns = {r.id: r for r in spark.read.parquet(f"{sink}/turns").collect()}
    assert turns[1]["worker_name_1"] == "ana" and turns[1]["worker_rut_1"] == "1-9"
    assert turns[2]["worker_name_1"] is None
    assert turns[3]["worker_name_4"] == "w3"
    assert "worker_name_5" not in spark.read.parquet(f"{sink}/turns").columns
    assert turns[1]["date"] == "2024-03-01"  # F4 split-T

    # F2 rename add→CeCo; manifest K4
    proj = spark.read.parquet(f"{sink}/projects").first()
    assert proj.CeCo == "CC-77"
    import os

    assert os.path.exists(f"{sink}/_manifest.json")

    # F7 on elements.deleted_at
    els = {r.id: r.deleted_at for r in spark.read.parquet(f"{sink}/elements").collect()}
    assert els[50] is None and els[51] == d(2024, 1, 5)


def test_sercom_incremental_load_to_db(spark, tmp_path):
    """Full T4 leg: CDC split halves land in a DB via the
    foreachPartition upsert (sqlite standing in for SQL Server)."""
    import sqlite3

    from etl_python_azure_spark.sinks.jdbc import jdbc_upsert
    from tests.test_sinks import _sqlite_factory

    d = datetime.datetime
    existing = spark.createDataFrame(
        [(101, d(2024, 3, 1))], "id long, updated_at timestamp"
    )
    res = run_sercom(
        spark, sercom_transport, "http://api", existing_tasks=existing
    )
    db = str(tmp_path / "tasks.db")
    with sqlite3.connect(db) as c:
        c.execute(
            "CREATE TABLE tasks (id INTEGER PRIMARY KEY, state_name TEXT,"
            " description TEXT, updated_at TEXT)"
        )
        c.execute(
            "INSERT INTO tasks VALUES (101, 'open', 'stale', '2024-03-01')"
        )
    cols = ["id", "state_name", "description", "updated_at"]
    to_load = res.task_split.new.unionByName(res.task_split.updated).select(
        "id", "state_name", "description",
        F.date_format("updated_at", "yyyy-MM-dd HH:mm:ss").alias("updated_at"),
    )
    jdbc_upsert(
        to_load,
        "tasks",
        key_cols=["id"],
        update_cols=[c for c in cols if c != "id"],
        connection_factory=_sqlite_factory(db),
        dialect="upsert_sqlite",
        num_partitions=1,
    )
    with sqlite3.connect(db) as c:
        got = {
            r[0]: (r[1], r[2])
            for r in c.execute("SELECT id, state_name, description FROM tasks")
        }
    # 100, 102 inserted as new; 101 updated in place (newer updated_at)
    assert got == {
        100: ("open", "t100"),
        101: ("done", "t101"),
        102: ("done", "t102"),
    }
