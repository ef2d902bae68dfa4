"""Real-JDBC e2e for the S6/K1/K2 sinks (r10 verdict item 8).

The container ships no network database, but a DuckDB JDBC driver
jar (same storage version as the python `duckdb` module) is present
in the local artifact caches. When found, this test boots a FRESH
SparkSession in a subprocess with ``spark.jars`` pointing at it and
drives `spark.read.jdbc` (S6 scan) plus the `jdbc_append` /
`jdbc_full_refresh` sinks (K1/K2) against a file-backed DuckDB —
the only paths `tests/test_sinks.py` can exercise only through
DBAPI stand-ins. Skipped (not failed) when no jar exists: the jar
is an environment artifact, like the protobuf gate.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_duckdb_jar() -> str | None:
    import duckdb

    want = duckdb.__version__.split("+")[0]
    roots = [
        os.path.expanduser("~/.cache"),
        os.path.expanduser("~/.m2"),
        "/opt",
        "/usr/share/java",
    ]
    hits: list[str] = []
    for root in roots:
        if os.path.isdir(root):
            hits += glob.glob(
                os.path.join(root, "**", "duckdb_jdbc*.jar"),
                recursive=True,
            )
    # prefer a jar matching the python module's storage version
    exact = [h for h in hits if want in os.path.basename(h)]
    return (exact or hits or [None])[0]


_SCRIPT = textwrap.dedent(
    """
    import sys

    import duckdb
    from pyspark.sql import SparkSession

    jar, dbfile, repo = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, repo)

    con = duckdb.connect(dbfile)
    con.execute("CREATE TABLE seed(id BIGINT, name VARCHAR)")
    con.execute(
        "INSERT INTO seed SELECT i, 'n' || CAST(i AS VARCHAR) "
        "FROM range(0, 100) t(i)"
    )
    # pre-create the sink DDL: Spark's append-mode auto-CREATE goes
    # through the generic JDBC dialect, which the DuckDB driver
    # rejects; production JDBC loads append into managed DDL anyway
    # (the reference's tables pre-exist too)
    con.execute("CREATE TABLE sink_t(id BIGINT, doubled BIGINT)")
    con.close()  # release the single-writer lock before the JVM opens

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("jdbc-e2e")
        .config("spark.jars", jar)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    url = f"jdbc:duckdb:{dbfile}"
    props = {"driver": "org.duckdb.DuckDBDriver"}

    # S6: JDBC scan with predicate + projection pushed into the query
    scan = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", props["driver"])
        .option("dbtable", "seed")
        .load()
        .filter("id < 10")
        .selectExpr("id")
    )
    assert scan.count() == 10, "jdbc scan"

    from etl_python_azure_spark.sinks.jdbc import (
        jdbc_append,
        jdbc_full_refresh,
    )

    out = spark.range(0, 50).selectExpr(
        "id", "CAST(id * 2 AS BIGINT) AS doubled"
    ).coalesce(1)  # DuckDB is single-writer: one executor connection
    jdbc_append(out, url, "sink_t", properties=props, batchsize=16)
    jdbc_append(out, url, "sink_t", properties=props, batchsize=16)
    both = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", props["driver"])
        .option("dbtable", "sink_t")
        .load()
    )
    assert both.count() == 100, "append x2"

    refreshed = spark.range(0, 7).selectExpr(
        "id", "CAST(id AS BIGINT) AS doubled"
    ).coalesce(1)
    jdbc_full_refresh(refreshed, url, "sink_t", properties=props)
    spark.stop()  # release the JVM's connections before reopening

    con = duckdb.connect(dbfile)
    n = con.execute("SELECT COUNT(*) FROM sink_t").fetchone()[0]
    cols = [r[0] for r in con.execute("DESCRIBE sink_t").fetchall()]
    con.close()
    assert n == 7, f"full refresh left {n} rows"
    assert cols == ["id", "doubled"], cols
    print("JDBC_E2E_OK")
    """
)


def test_jdbc_sinks_through_real_driver(tmp_path):
    jar = _find_duckdb_jar()
    if jar is None:
        pytest.skip("no duckdb_jdbc jar in the local caches")
    script = tmp_path / "jdbc_e2e.py"
    script.write_text(_SCRIPT)
    dbfile = str(tmp_path / "e2e.duckdb")
    out = subprocess.run(
        [sys.executable, str(script), jar, dbfile, REPO],
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "JDBC_E2E_OK" in out.stdout
