"""Expectations report: violations are counted, not just pass/fail."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_python_azure_spark.operators.expectations import (
    combine_reports,
    referential_check,
    row_checks,
    unique_check,
)


def test_quality_report_counts_violations(spark):
    child = spark.createDataFrame(
        [(1, 10.0), (1, -5.0), (2, None), (9, 3.0)],
        "k long, v double",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    rep = combine_reports(
        [
            row_checks(
                child,
                {
                    "v_positive": F.col("v") > 0,  # -5 fails, NULL fails
                    "k_not_null": F.col("k").isNotNull(),
                },
            ),
            unique_check(child, ["k"]),  # k=1 twice → 2 violating rows
            referential_check(child, parent, "k", "pk"),  # k=9 orphan
        ]
    )
    got = {
        r.check_name: (r.n_rows, r.n_violations, r.passed)
        for r in rep.collect()
    }
    assert got == {
        "v_positive": (4, 2, False),
        "k_not_null": (4, 0, True),
        "unique(k)": (4, 2, False),
        "fk(k->pk)": (4, 1, False),
    }
