"""Synthetic transports + end-to-end pipeline benches.

The plan modules (:mod:`.latinad`, :mod:`.sercom`) are exercised
end-to-end in tests with tiny fixtures; these generators produce the
same payload SHAPES at a size scaled to the benchmark SF, so the
driver's bench can time the FULL pipelines (fan-out → parse →
reshape → join → sink) against the reference's 10-minute
full-refresh envelope (`L/host.json:3`) rather than inferring it
from query-level timings.

Deterministic: all values derive from record indices — repeated runs
produce byte-identical tables.
"""

from __future__ import annotations

import datetime as _dt
import json

from pyspark.sql import SparkSession

_N_DATES = 26
_DATES = [str(_dt.date(2024, 1, 1) + _dt.timedelta(days=i)) for i in range(_N_DATES)]


def latinad_synthetic_transport(n_displays: int, n_contents: int,
                                rows_per_report: int):
    """Transport serving a scaled Latinad API (displays catalog,
    paginated contents, per-content report fan-out)."""

    def transport(url: str, headers: dict):
        if "/displays" in url:
            return 200, json.dumps([
                {
                    "id": i + 1,
                    "company_id": i % 40,
                    "name": f"display-{i}",
                    "resolution_width": 1920,
                    "resolution_height": 1080,
                    "latitude": -33.0 - (i % 100) / 100.0,
                    "longitude": -70.0 - (i % 100) / 100.0,
                    "slots": i % 8,
                    "slot_length": 10,
                    "published": i % 10 != 0,
                    "country": "CL" if i % 3 else "AR",
                    "audience_provider": {"id": i % 5, "name": f"prov{i % 5}"},
                }
                for i in range(n_displays)
            ])
        if "/contents" in url:
            start = int(url.split("start=")[1].split("&")[0]) if "start=" in url else 0
            batch = [
                {
                    "id": 1000 + i,
                    "name": f"content-{i}",
                    "type": "video" if i % 2 else "image",
                    "file": f"file-{i}.mp4" if i % 7 else "x" * 60,
                    "width": 1280,
                    "height": 720,
                    "length": 15,
                    "ready": True,
                    "company_id": i % 40,
                    "category": f"cat{i % 6}",
                    "count_displays": i % 9,
                }
                for i in range(start, min(start + 11000, n_contents))
            ]
            return 200, json.dumps({"data": batch})
        if "/report" in url:
            content = int(url.split("content=")[1].split("&")[0])
            if content % 97 == 0:  # per-request failure capture (T5)
                return 500, "synthetic upstream error"
            rows = [
                {
                    "display": (content + j) % n_displays + 1,
                    "content": content,
                    "child_content_id": None,
                    "shows": (content + j) % 50,
                    "total_time": 100 * ((content + j) % 900),
                    "date": _DATES[j % _N_DATES],
                    "impacts": None if j % 11 == 0 else (content * j) % 1000,
                }
                for j in range(rows_per_report)
            ]
            return 200, json.dumps({"report": rows})
        return 404, "nope"

    return transport


def sercom_synthetic_transport(n_tasks: int, n_turns: int, n_projects: int,
                               n_elements: int):
    """Transport serving a scaled Sercom API."""

    def transport(url: str, headers: dict):
        if "/tasks" in url:
            return 200, json.dumps([
                {
                    "id": i,
                    "state": {"name": ("open", "doing", "done")[i % 3]},
                    "created_by": {"name": f"user{i % 50}"},
                    "update_by": {"name": f"user{(i + 1) % 50}"},
                    "task_type": {"id": i % 12, "name": f"type{i % 12}"},
                    "element_id": i % n_elements,
                    "project_id": i % n_projects,
                    "description": f"task {i} description",
                    "observations": None if i % 5 else f"obs {i}",
                    "created_at": f"2024-01-{i % 28 + 1:02d}T08:00:00",
                    "updated_at": f"2024-03-{i % 28 + 1:02d}T{i % 24:02d}:30:00",
                    "team": {"id": i % 30 if i % 4 else None},
                    "turn": {"id": i % n_turns if i % 3 else None},
                    "project": {"name": f"p{i % n_projects}",
                                "ot_number": f"OT-{i % n_projects}"},
                }
                for i in range(n_tasks)
            ])
        if "/turns" in url:
            return 200, json.dumps([
                {
                    "id": i,
                    "date": f"2024-03-{i % 28 + 1:02d}T08:00:00",
                    "team_id": i % 30,
                    "workers": [
                        {"worker": {"name": f"w{i}-{k}", "rut": f"{i}-{k}"}}
                        for k in range(i % 6)
                    ],
                }
                for i in range(n_turns)
            ])
        if "/projects" in url:
            return 200, json.dumps([
                {"id": i, "name": f"p{i}", "add": f"CC-{i:04d}",
                 "header": f"h{i}", "central_title": f"ct{i % 9}"}
                for i in range(n_projects)
            ])
        if "/elements" in url:
            return 200, json.dumps([
                {
                    "element_type_id": i % 7,
                    "commune_name": f"commune{i % 40}",
                    "id": i,
                    "name": f"element-{i}",
                    "latitude": -33.0 - (i % 500) / 1000.0,
                    "longitude": -70.0 - (i % 500) / 1000.0,
                    "address": f"street {i}",
                    "deleted_at": f"2024-02-{i % 28 + 1:02d}T00:00:00"
                    if i % 13 == 0
                    else None,
                    "enabled": i % 13 != 0,
                    "external_id": f"E{i:06d}",
                }
                for i in range(n_elements)
            ])
        return 404, "nope"

    return transport


def bench_latinad(spark: SparkSession, sf: float, sink_root: str) -> int:
    """Full Latinad refresh at a size scaled to *sf*; returns the
    loaded report row count (forces every sink action)."""
    from .latinad import run_latinad

    n_displays = max(50, int(3000 * sf))
    n_contents = max(30, int(2500 * sf))
    rows_per = max(20, int(1000 * sf))
    transport = latinad_synthetic_transport(n_displays, n_contents, rows_per)
    run_latinad(
        spark,
        transport,
        "http://synthetic",
        sink_root=sink_root,
        window_start=_dt.date(2024, 1, 1),
        window_end=_dt.date(2024, 1, 28),
    )
    return spark.read.parquet(f"{sink_root}/contenido_data").count()


def bench_sercom(spark: SparkSession, sf: float, sink_root: str) -> int:
    """Sercom extract + K4 manifest load + T4 incremental upsert of
    the CDC split into a parquet snapshot; returns the merged task
    snapshot row count."""
    from pyspark.sql import functions as F

    from ..operators.joins import merge_upsert
    from ..sinks.files import full_refresh
    from .sercom import run_sercom

    n_tasks = max(200, int(50000 * sf))
    transport = sercom_synthetic_transport(
        n_tasks,
        n_turns=max(20, int(2000 * sf)),
        n_projects=max(10, int(500 * sf)),
        n_elements=max(20, int(4000 * sf)),
    )
    # seed snapshot: 60% of ids, versions straddling the incoming ones
    seed = run_sercom(spark, transport, "http://synthetic").tasks.filter(
        F.col("id") % 5 < 3
    ).withColumn(
        "updated_at",
        F.when(F.col("id") % 2 == 0,
               F.col("updated_at") - F.expr("INTERVAL 10 DAYS"))
        .otherwise(F.col("updated_at") + F.expr("INTERVAL 10 DAYS")),
    )
    snap = f"{sink_root}/task_snapshot"
    full_refresh(seed, snap)
    existing = spark.read.parquet(snap)

    res = run_sercom(
        spark,
        transport,
        "http://synthetic",
        existing_tasks=existing.select("id", "updated_at"),
        sink_root=sink_root,
    )
    merged = merge_upsert(res.tasks, existing, key="id", version_col="updated_at")
    full_refresh(merged, f"{sink_root}/task_snapshot_v2")
    return spark.read.parquet(f"{sink_root}/task_snapshot_v2").count()
