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


def test_quality_report_on_empty_input(spark):
    empty = spark.createDataFrame([], "k long, v double")
    parent = spark.createDataFrame([(1,)], "pk long")
    rep = combine_reports(
        [
            row_checks(empty, {"v_positive": F.col("v") > 0}),
            unique_check(empty, ["k"]),
            referential_check(empty, parent, "k", "pk"),
        ]
    )
    got = {
        r.check_name: (r.n_rows, r.n_violations, r.passed)
        for r in rep.collect()
    }
    # zero rows, zero violations, every check passes — no NULLs
    assert got == {
        "v_positive": (0, 0, True),
        "unique(k)": (0, 0, True),
        "fk(k->pk)": (0, 0, True),
    }


def test_row_checks_quoted_name_and_empty_dict(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "k long")
    got = row_checks(df, {"o'brien rule": F.col("k") > 0}).collect()
    assert got[0].check_name == "o'brien rule" and got[0].passed
    with pytest.raises(ValueError):
        row_checks(df, {})
