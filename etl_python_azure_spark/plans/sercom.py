"""The Sercom pipeline (SURVEY §3.2) as a lazy DAG + incremental load.

Reference flow (`S:25–365`): thread-parallel fetch of tasks / turns /
projects / elements, reshape, then a 4-table load where three tables
full-refresh and ``Sercom_API_task`` gets a hand-rolled CDC upsert
(new-vs-updated split on ``updated_at``, parallel batched UPDATE).

Spark restatement: the whole ``separador_task`` + ``insert_data`` +
``paralel_data`` complex (`S:209–365`) collapses to
:func:`..operators.joins.cdc_split` (+ :func:`..operators.joins
.merge_upsert` for snapshot targets or :func:`..sinks.jdbc
.jdbc_upsert` for DB targets). Thread-parallel extraction is
unnecessary — each driver fetch is tiny, and the heavy lifting is
lazy until the sink actions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dates import iso_date_part, parse_timestamp_naive
from ..operators.arrays import positional_unnest
from ..operators.joins import CdcSplit, cdc_split
from ..schema import dedupe_column_names, select_existing
from ..sinks.files import multi_table_load
from ..sources.rest import Transport, fetch_json, records_to_df

# 27-column task contract (`S:185–191`), post-flatten names
TASK_COLS = [
    "id", "created_by_name", "update_by_name", "state_name",
    "task_type_id", "task_type_name", "element_id", "project_id",
    "description", "observations", "assigned_at", "started_at",
    "original_started_at", "finished_at", "original_finisched_at",
    "created_at", "updated_at", "project_name", "project_header",
    "team_name", "team_members_name", "team_id", "turn_id",
    "team_team_group", "team_team_company", "project_ot_number",
    "project_central_title",
]
TASK_TS_COLS = [
    "assigned_at", "started_at", "original_started_at", "finished_at",
    "original_finisched_at", "created_at", "updated_at",
]  # `S:193–202`
ELEMENT_COLS = [
    "element_type_id", "commune_name", "id", "name", "latitude",
    "longitude", "address", "deleted_at", "enabled", "external_id",
]  # `S:140`


@dataclass
class SercomResult:
    tasks: DataFrame
    turns: DataFrame
    projects: DataFrame
    elements: DataFrame
    task_split: CdcSplit | None


def _extract_tasks(spark: SparkSession, transport: Transport, base_url: str,
                   headers: dict | None) -> DataFrame:
    # S4: the date-range/deleted predicates ride in the URL (server-side
    # pushdown analog, `S:73–100`)
    recs = fetch_json(
        transport,
        f"{base_url}/tasks?deleted=false&expand=project,team,turn",
        headers,
    )
    df = dedupe_column_names(records_to_df(spark, recs))  # N1/F1 + P10 (`S:204`)
    df = select_existing(df, TASK_COLS)  # P1/P2 (`S:185–191`)
    for c in TASK_TS_COLS:  # F7 (`S:193–202`)
        if c in df.columns:
            df = df.withColumn(c, parse_timestamp_naive(c))
    # F11/F10 (`S:61–63`): nullable int keys + zero-fill
    for c in ("team_id", "turn_id"):
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast("bigint"))
    return df


def _extract_turns(spark: SparkSession, transport: Transport, base_url: str,
                   headers: dict | None) -> DataFrame:
    recs = fetch_json(transport, f"{base_url}/turns", headers)
    df = records_to_df(spark, recs, flatten=False)  # keep workers nested!
    # N3 (`S:154–180`): first 4 workers → fixed columns, no row-order
    # dependence (replaces the pandas horizontal concat, J5)
    if "workers" in df.columns:
        df = positional_unnest(
            df, "workers", 4, fields=["worker.name", "worker.rut"],
            name_template="{field}_{i}",
        )
    if "date" in df.columns:
        df = df.withColumn("date", iso_date_part("date"))  # F4 (`S:171`)
    return df


def run_sercom(
    spark: SparkSession,
    transport: Transport,
    base_url: str,
    headers: dict | None = None,
    existing_tasks: DataFrame | None = None,
    sink_root: str | None = None,
) -> SercomResult:
    """Build the four Sercom tables; split tasks for incremental load.

    *existing_tasks*: the CDC probe (id, updated_at) — from
    :func:`..sources.jdbc.jdbc_query` against the warehouse (S6) or a
    parquet snapshot. When given, ``task_split`` carries the
    (new, updated) halves with the reference's strict-``>``
    semantics; when *sink_root* is set the three reference tables
    full-refresh together (K4 manifest load).
    """
    tasks = _extract_tasks(spark, transport, base_url, headers)
    turns = _extract_turns(spark, transport, base_url, headers)
    projects = records_to_df(
        spark, fetch_json(transport, f"{base_url}/projects", headers)
    ).withColumnRenamed("add", "CeCo")  # F2 (`S:130`)
    elements = select_existing(
        records_to_df(spark, fetch_json(transport, f"{base_url}/elements", headers)),
        ELEMENT_COLS,
    )
    if "deleted_at" in elements.columns:
        elements = elements.withColumn(
            "deleted_at", parse_timestamp_naive("deleted_at")  # F7 (`S:141`)
        )

    split = None
    if existing_tasks is not None:
        split = cdc_split(tasks, existing_tasks, key="id", version_col="updated_at")

    if sink_root:
        # K2/K4 (`S:229–245, 247–273`): three full refreshes, manifested
        multi_table_load(
            {"turns": turns, "projects": projects, "elements": elements},
            sink_root,
        )
    return SercomResult(tasks, turns, projects, elements, split)
