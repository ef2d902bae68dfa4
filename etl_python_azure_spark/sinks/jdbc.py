"""JDBC/DBAPI sinks (K1, K2-jdbc, K5).

The reference loads SQL Server via SQLAlchemy/pyodbc
(`L:188–198`, `S:247–282`) and hand-rolls a thread-parallel batched
UPDATE (`S:284–365`). Spark-first restatement:

- K1 append → ``df.write.jdbc`` with ``batchsize`` (the reference's
  ``chunksize=5000``).
- K2 → ``mode("overwrite")`` + ``truncate=true`` (keeps DDL).
- K5 upsert → :func:`jdbc_upsert`: ``foreachPartition`` executing
  batched upsert statements through an injectable DBAPI
  connection factory. Data-parallel like ``paralel_data`` (`S:289`),
  but partition-parallel across executors instead of driver threads
  — per-partition batching, executor-side connections.

No network DB exists in the test container; :func:`jdbc_upsert` is
fully testable with any DBAPI factory (tests use sqlite3), and since
r11 ``jdbc_append``/``jdbc_full_refresh`` are ALSO exercised through
a real JDBC driver — ``tests/test_jdbc_real_driver.py`` boots a
fresh session with a locally-cached DuckDB JDBC jar and drives
`spark.read.jdbc` plus both sinks end to end (skips if no jar).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


def jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batchsize: int = 5000,
):
    """K1: batched JDBC append (`to_sql(if_exists='append',
    chunksize=5000)` analog, `L:193`)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**(properties or {}))
        .mode("append")
        .save()
    )


def jdbc_full_refresh(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batchsize: int = 5000,
):
    """K2 on JDBC: truncate-and-load, preserving table DDL
    (`eliminar_y_crear_tabla` analog, `L:203–229`)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("truncate", "true")
        .option("batchsize", str(batchsize))
        .options(**(properties or {}))
        .mode("overwrite")
        .save()
    )


def jdbc_upsert(
    df: DataFrame,
    table: str,
    key_cols: list[str],
    update_cols: list[str],
    connection_factory: Callable[[], object],
    batch_size: int = 5000,
    num_partitions: int | None = None,
    dialect: str = "update",
) -> None:
    """K5: distributed batched upsert via ``foreachPartition``.

    Each partition opens its own DBAPI connection (from the picklable
    *connection_factory*), issues ``executemany`` batches, commits.
    ``dialect='update'`` issues ``UPDATE … WHERE key=?`` like the
    reference (`S:321–350`); ``dialect='upsert_sqlite'`` issues
    ``INSERT … ON CONFLICT DO UPDATE`` (used by tests; same shape as
    Postgres/SQL Server MERGE targets).

    Scale: this is the reference's ``paralel_data`` (`S:284–307`)
    with executor-partition parallelism instead of driver threads —
    the DataFrame never lands on the driver. Partition count bounds
    the connection count on the target DB.
    """
    cols = list(df.columns)
    key_idx = [cols.index(c) for c in key_cols]
    upd_idx = [cols.index(c) for c in update_cols]

    if dialect == "update":
        sql = (
            f"UPDATE {table} SET "
            + ", ".join(f"{c} = ?" for c in update_cols)
            + " WHERE "
            + " AND ".join(f"{c} = ?" for c in key_cols)
        )
        param_idx = upd_idx + key_idx
    elif dialect == "upsert_sqlite":
        sql = (
            f"INSERT INTO {table} (" + ", ".join(cols) + ") VALUES ("
            + ", ".join("?" for _ in cols)
            + ") ON CONFLICT (" + ", ".join(key_cols) + ") DO UPDATE SET "
            + ", ".join(f"{c} = excluded.{c}" for c in update_cols)
        )
        param_idx = list(range(len(cols)))
    else:
        raise ValueError(f"unknown dialect: {dialect}")

    def write_partition(rows: Iterator) -> None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            batch = []
            for row in rows:
                batch.append(tuple(row[i] for i in param_idx))
                if len(batch) >= batch_size:
                    cur.executemany(sql, batch)
                    batch = []
            if batch:
                cur.executemany(sql, batch)
            conn.commit()
        finally:
            conn.close()

    target = df.repartition(num_partitions) if num_partitions else df
    target.foreachPartition(write_partition)


def jdbc_ranged_refresh(
    df: DataFrame,
    table: str,
    col: str,
    lo,
    hi,
    connection_factory: Callable[[], object],
    batch_size: int = 5000,
    num_partitions: int | None = None,
) -> None:
    """K3 on a DBAPI target: ranged delete + partition-parallel
    batched append — the reference's sliding-window reload
    (``DELETE … WHERE Fecha BETWEEN lo AND hi`` then append,
    `L:217–219`), restated with executor-side inserts.

    Steps:

    1. one driver-side ``DELETE FROM table WHERE col BETWEEN ? AND ?``
       (committed before any insert — the window is empty even if the
       job then fails, so a re-run never double-loads);
    2. *df* filtered to ``[lo, hi]`` (rows outside the refresh window
       are dropped — inserting them would duplicate on the next
       re-run, the exact idempotence bug the reference avoids by
       recomputing only the window) and appended via
       ``foreachPartition`` + ``executemany`` batches, one DBAPI
       connection per partition.

    Idempotent per window: running twice with the same *df* leaves
    the same table state. Like the reference, delete and append are
    separate transactions — readers between them see an empty window
    (same weakening as `L:217–229`; a transactional target would use
    ``jdbc_upsert``/MERGE instead).
    """
    from pyspark.sql import functions as F

    conn = connection_factory()
    try:
        cur = conn.cursor()
        cur.execute(
            f"DELETE FROM {table} WHERE {col} >= ? AND {col} <= ?", (lo, hi)
        )
        conn.commit()
    finally:
        conn.close()

    windowed = df.filter(F.col(col).between(F.lit(lo), F.lit(hi)))
    cols = list(windowed.columns)
    sql = (
        f"INSERT INTO {table} (" + ", ".join(cols) + ") VALUES ("
        + ", ".join("?" for _ in cols) + ")"
    )

    def insert_partition(rows: Iterator) -> None:
        c = connection_factory()
        try:
            cur = c.cursor()
            batch = []
            for row in rows:
                batch.append(tuple(row))
                if len(batch) >= batch_size:
                    cur.executemany(sql, batch)
                    batch = []
            if batch:
                cur.executemany(sql, batch)
            c.commit()
        finally:
            c.close()

    target = (
        windowed.repartition(num_partitions) if num_partitions else windowed
    )
    target.foreachPartition(insert_partition)
