#!/usr/bin/env python
"""Cross-engine dtype audit for every registered oracle query.

The round driver compares Spark and DuckDB results after converting
both to pandas. That conversion is where silent type divergence
bites: DuckDB ``SUM(BIGINT)`` returns HUGEINT which pandas renders as
``float64`` (so an integer column hashes as ``500.0`` vs Spark's
``500``), and DuckDB float literals like ``1000000.0`` are DECIMAL,
whose arithmetic results reach pandas as ``object``/``Decimal``.

This script runs every oracle through ``duckdb.sql(...).df()`` (the
same pandas path) at sf0.001 and compares per-column dtype CLASSES
(int / float / bool / datetime / date / str / list / decimal) against
the Spark builder's analyzed schema — no Spark job is executed, the
schema is enough. Any class mismatch is a future hash mismatch.

Usage: python scripts/dtype_audit.py [query ...]
"""

from __future__ import annotations

import os
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_DIR", "/root/testdata/sf0.001")


def spark_class(dt: str) -> str:
    """Map a Spark simpleString dtype to a comparison class."""
    if dt in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt == "boolean":
        return "bool"
    if dt.startswith("decimal"):
        return "decimal"
    if dt in ("timestamp", "timestamp_ntz"):
        return "datetime"
    if dt == "date":
        return "date"
    if dt.startswith("array"):
        return "list"
    if dt in ("string", "binary"):
        return "str"
    return dt


def pandas_class(series: pd.Series) -> str:
    """Map a pandas column (from duckdb .df()) to a comparison class."""
    kind = series.dtype.kind
    if kind in "iu":
        return "int"
    if kind == "f":
        return "float"
    if kind == "b":
        return "bool"
    if kind == "M":
        return "datetime"
    # object: inspect the first non-null value
    non_null = series.dropna()
    if non_null.empty:
        return "unknown-empty"
    v = non_null.iloc[0]
    if isinstance(v, Decimal):
        return "decimal"
    if isinstance(v, datetime):
        return "datetime"
    if isinstance(v, date):
        return "date"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "list"
    if isinstance(v, (str, bytes)):
        return "str"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    return type(v).__name__


def main(argv: list[str]) -> int:
    from etl_python_azure_spark.queries import registry
    from etl_python_azure_spark.session import get_spark

    reg = registry()
    names = argv or [n for n, s in reg.items() if s.oracle]
    spark = get_spark("dtype_audit")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )

    bad = 0
    for name in names:
        spec = reg[name]
        if spec.oracle is None:
            print(f"skip {name}: no oracle")
            continue
        try:
            spdf = spec.builder(spark, SF_DIR).toPandas()
            s_classes = {c: pandas_class(spdf[c]) for c in spdf.columns}
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            bad += 1
            continue
        # Registry rule (r03 verdict): no array/map/struct columns in
        # query output — the driver's pandas canonicalizer sorts rows
        # before hashing and raises `unhashable type: 'list'` on any
        # nested cell. Project scalar probes instead; keep raw-array
        # forms under pytest.
        nested = sorted(
            c for c, k in s_classes.items() if k in ("list", "dict")
        )
        if nested:
            print(
                f"FAIL {name}: unhashable output columns {nested} "
                "(driver cannot sort/hash list/map/struct cells)"
            )
            bad += 1
            continue
        try:
            pdf = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            bad += 1
            continue
        d_classes = {c: pandas_class(pdf[c]) for c in pdf.columns}
        if sorted(s_classes) != sorted(d_classes):
            print(
                f"FAIL {name}: column names differ: "
                f"spark={sorted(s_classes)} duckdb={sorted(d_classes)}"
            )
            bad += 1
            continue
        # date-vs-datetime is benign: the driver normalizes calendar
        # values (r01 evidence: monthly_order_volume and
        # trailing_week_revenue hashed green with Spark DATE vs
        # DuckDB TIMESTAMP). int-vs-float is NOT benign unless nulls
        # make both sides float64 in pandas.
        benign = {("date", "datetime"), ("datetime", "date")}
        diffs = {
            c: (s_classes[c], d_classes[c])
            for c in s_classes
            if s_classes[c] != d_classes[c]
            and (s_classes[c], d_classes[c]) not in benign
            and "unknown-empty" not in (s_classes[c], d_classes[c])
        }
        if diffs:
            print(f"FAIL {name}: dtype class mismatch: {diffs}")
            bad += 1
        else:
            print(f"ok   {name}")
    print(f"\n{len(names) - bad}/{len(names)} dtype-clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
