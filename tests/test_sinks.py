"""Sink tests: full refresh, dynamic-partition ranged overwrite,
multi-table staging load, DBAPI upsert via foreachPartition.
"""

from __future__ import annotations

import os
import sqlite3

from pyspark.sql import functions as F

from etl_python_azure_spark.operators.joins import merge_upsert
from etl_python_azure_spark.sinks.files import (
    full_refresh,
    multi_table_load,
    ranged_overwrite,
)
from etl_python_azure_spark.sinks.jdbc import jdbc_ranged_refresh, jdbc_upsert


def test_full_refresh_replaces(spark, tmp_path):
    p = str(tmp_path / "t")
    full_refresh(spark.range(10), p)
    full_refresh(spark.range(3), p)
    assert spark.read.parquet(p).count() == 3


def test_ranged_overwrite_touches_only_window(spark, tmp_path):
    p = str(tmp_path / "t")
    base = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-02", 2), ("2024-01-03", 3)],
        "dt string, v int",
    )
    full_refresh(base, p, partition_by=["dt"])
    # recompute only the 01-02 window with new values
    window = spark.createDataFrame(
        [("2024-01-02", 20), ("2024-01-02", 21)], "dt string, v int"
    )
    ranged_overwrite(window, p, "dt")
    # partition values read back type-inferred (date) — compare as str
    got = {
        (str(r.dt), r.v) for r in spark.read.parquet(p).collect()
    }
    assert got == {("2024-01-01", 1), ("2024-01-02", 20), ("2024-01-02", 21), ("2024-01-03", 3)}


def test_multi_table_load_manifest(spark, tmp_path):
    root = str(tmp_path / "wh")
    mpath = multi_table_load(
        {"a": spark.range(5), "b": spark.range(2)}, root
    )
    assert os.path.exists(mpath)
    assert spark.read.parquet(f"{root}/a").count() == 5
    # second load swaps cleanly
    multi_table_load({"a": spark.range(1)}, root)
    assert spark.read.parquet(f"{root}/a").count() == 1
    assert spark.read.parquet(f"{root}/b").count() == 2


def _sqlite_factory(path):
    def factory():
        conn = sqlite3.connect(path, timeout=60)
        return conn

    return factory


def test_jdbc_upsert_sqlite(spark, tmp_path):
    db = str(tmp_path / "t.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE tgt (id INTEGER PRIMARY KEY, v TEXT, ver INTEGER)")
        c.executemany(
            "INSERT INTO tgt VALUES (?, ?, ?)",
            [(1, "old1", 1), (2, "old2", 1)],
        )
    incoming = spark.createDataFrame(
        [(2, "new2", 2), (3, "new3", 1)], "id int, v string, ver int"
    )
    jdbc_upsert(
        incoming,
        "tgt",
        key_cols=["id"],
        update_cols=["v", "ver"],
        connection_factory=_sqlite_factory(db),
        dialect="upsert_sqlite",
        num_partitions=1,
    )
    with sqlite3.connect(db) as c:
        got = dict(
            (r[0], (r[1], r[2]))
            for r in c.execute("SELECT id, v, ver FROM tgt ORDER BY id")
        )
    assert got == {1: ("old1", 1), 2: ("new2", 2), 3: ("new3", 1)}


def test_jdbc_ranged_refresh(spark, tmp_path):
    from etl_python_azure_spark.sinks.jdbc import jdbc_ranged_refresh

    db = str(tmp_path / "r.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE tgt (d INTEGER, v TEXT)")
        c.executemany(
            "INSERT INTO tgt VALUES (?, ?)",
            [(5, "keep_lo"), (10, "stale10"), (15, "stale15"), (25, "keep_hi")],
        )
    # refresh window [10, 20]; df includes an out-of-window row that
    # must NOT be inserted (idempotence guard)
    df = spark.createDataFrame(
        [(10, "fresh10"), (12, "fresh12"), (99, "outside")],
        "d int, v string",
    )
    for _ in range(2):  # idempotent: second run leaves identical state
        jdbc_ranged_refresh(
            df, "tgt", "d", 10, 20,
            connection_factory=_sqlite_factory(db), num_partitions=2,
        )
        with sqlite3.connect(db) as c:
            got = sorted(c.execute("SELECT d, v FROM tgt"))
        assert got == [
            (5, "keep_lo"), (10, "fresh10"), (12, "fresh12"), (25, "keep_hi")
        ]


def test_jdbc_update_dialect(spark, tmp_path):
    db = str(tmp_path / "u.db")
    with sqlite3.connect(db) as c:
        c.execute("CREATE TABLE tgt (id INTEGER PRIMARY KEY, v TEXT)")
        c.executemany("INSERT INTO tgt VALUES (?, ?)", [(1, "a"), (2, "b")])
    updates = spark.createDataFrame([(2, "B")], "id int, v string")
    jdbc_upsert(
        updates,
        "tgt",
        key_cols=["id"],
        update_cols=["v"],
        connection_factory=_sqlite_factory(db),
        dialect="update",
        num_partitions=1,
    )
    with sqlite3.connect(db) as c:
        got = dict(c.execute("SELECT id, v FROM tgt"))
    assert got == {1: "a", 2: "B"}


def test_merge_upsert_then_full_refresh_roundtrip(spark, tmp_path):
    """T4 end-to-end on files: merge post-image written as new snapshot."""
    p = str(tmp_path / "snap")
    existing = spark.createDataFrame(
        [(1, 10, "keep"), (2, 10, "stale")], "id int, ver int, v string"
    )
    full_refresh(existing, p)
    incoming = spark.createDataFrame(
        [(2, 11, "fresh"), (3, 1, "new")], "id int, ver int, v string"
    )
    merged = merge_upsert(incoming, spark.read.parquet(p), key="id", version_col="ver")
    # write to a new snapshot dir then swap (can't overwrite a path being read)
    p2 = str(tmp_path / "snap2")
    full_refresh(merged, p2)
    got = {(r.id, r.ver, r.v) for r in spark.read.parquet(p2).collect()}
    assert got == {(1, 10, "keep"), (2, 11, "fresh"), (3, 1, "new")}


def test_jdbc_ranged_refresh_then_upsert_same_target(spark, tmp_path):
    """K3 + K5 interaction on ONE sqlite target (r03 verdict item 8):
    a sliding-window reload followed by a CDC upsert against the same
    table — the reference's nightly shape (`L:217–229` then
    `S:321–350`). Also re-runs the ranged refresh to prove window
    idempotence holds after the upsert mutated rows outside the
    window."""
    db = str(tmp_path / "combo.db")
    with sqlite3.connect(db) as c:
        c.execute(
            "CREATE TABLE m (id INTEGER PRIMARY KEY, day INTEGER, v TEXT)"
        )
        c.executemany(
            "INSERT INTO m VALUES (?, ?, ?)",
            [(i, i % 10, f"old{i}") for i in range(40)],
        )

    # K3: reload days 3..5 from the new frame (ids 100+ replace them)
    fresh = spark.createDataFrame(
        [(100 + d, d, f"new{d}") for d in range(3, 6)]
        + [(999, 99, "outside-window")],  # must be filtered out
        "id long, day long, v string",
    )
    jdbc_ranged_refresh(
        fresh, "m", "day", 3, 5,
        connection_factory=_sqlite_factory(db), num_partitions=2,
    )
    with sqlite3.connect(db) as c:
        in_win = dict(
            c.execute("SELECT id, v FROM m WHERE day BETWEEN 3 AND 5")
        )
        assert in_win == {103: "new3", 104: "new4", 105: "new5"}
        assert c.execute("SELECT COUNT(*) FROM m WHERE id = 999").fetchone()[0] == 0
        n_outside = c.execute(
            "SELECT COUNT(*) FROM m WHERE day NOT BETWEEN 3 AND 5"
        ).fetchone()[0]
        assert n_outside == 28  # 40 seeded minus 12 in-window

    # K5: CDC upsert touches rows outside the window + inserts one
    delta = spark.createDataFrame(
        [(0, 0, "upd0"), (7, 7, "upd7"), (500, 8, "ins500")],
        "id long, day long, v string",
    )
    jdbc_upsert(
        delta, "m", ["id"], ["day", "v"],
        connection_factory=_sqlite_factory(db),
        dialect="upsert_sqlite", num_partitions=2,
    )
    with sqlite3.connect(db) as c:
        got = dict(c.execute("SELECT id, v FROM m WHERE id IN (0,7,500)"))
        assert got == {0: "upd0", 7: "upd7", 500: "ins500"}

    # K3 again with the SAME frame: idempotent per window, and the
    # upserted rows outside the window survive untouched
    jdbc_ranged_refresh(
        fresh, "m", "day", 3, 5,
        connection_factory=_sqlite_factory(db), num_partitions=2,
    )
    with sqlite3.connect(db) as c:
        in_win = dict(
            c.execute("SELECT id, v FROM m WHERE day BETWEEN 3 AND 5")
        )
        assert in_win == {103: "new3", 104: "new4", 105: "new5"}
        got = dict(c.execute("SELECT id, v FROM m WHERE id IN (0,7,500)"))
        assert got == {0: "upd0", 7: "upd7", 500: "ins500"}


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    import glob

    from etl_python_azure_spark.sinks.files import (
        compact_parquet,
        read_snapshot,
    )

    src = str(tmp_path / "frag")
    spark.range(0, 10_000).repartition(64).write.parquet(src)
    assert len(glob.glob(src + "/part-*")) == 64
    root = str(tmp_path / "compacted")
    compact_parquet(spark, src, root, version=1,
                    target_rows_per_file=5_000)
    out = read_snapshot(spark, root)
    files = out.select(
        F.input_file_name().alias("f")
    ).distinct().count()
    assert files == 2  # ceil(10000 / 5000)
    assert out.count() == 10_000
    assert out.agg(F.sum("id")).collect()[0][0] == 10_000 * 9_999 // 2
