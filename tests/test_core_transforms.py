"""Unit tests for the core transform layer (SURVEY §7.1 step 1).

Covers the nasty semantics called out in SURVEY §5: P8 all-null
column drop, N3 positional flatten with <4 elements, F3 len-50 gate
incl. null, strict-``>`` CDC split edge.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_python_azure_spark.functions import (
    bounded_string_gate,
    drop_all_null_columns,
    surrogate_key,
)
from etl_python_azure_spark.functions.dates import iso_date_part
from etl_python_azure_spark.operators.arrays import array_head, positional_unnest
from etl_python_azure_spark.operators.joins import cdc_split, merge_upsert
from etl_python_azure_spark.schema import (
    dedupe_column_names,
    flatten_struct_columns,
    select_existing,
    select_or_null,
)


def test_flatten_struct_columns(spark):
    df = spark.createDataFrame(
        [(1, {"b": 2, "c": {"d": 3}})],
        T.StructType(
            [
                T.StructField("a", T.LongType()),
                T.StructField(
                    "s",
                    T.StructType(
                        [
                            T.StructField("b", T.LongType()),
                            T.StructField(
                                "c",
                                T.StructType([T.StructField("d", T.LongType())]),
                            ),
                        ]
                    ),
                ),
            ]
        ),
    )
    out = flatten_struct_columns(df)
    assert out.columns == ["a", "s_b", "s_c_d"]
    assert out.first().asDict() == {"a": 1, "s_b": 2, "s_c_d": 3}


def test_select_existing_and_or_null(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "name"])
    assert select_existing(df, ["name", "missing", "id"]).columns == ["name", "id"]
    out = select_or_null(df, ["name", "missing"])
    assert out.columns == ["name", "missing"]
    assert out.first()["missing"] is None


def test_string_gate_len50_and_null(spark):
    long = "x" * 51
    df = spark.createDataFrame([(None,), ("ok",), (long,), ("y" * 50,)], ["arch"])
    out = df.select(bounded_string_gate("arch").alias("arch")).collect()
    assert [r.arch for r in out] == ["", "ok", "", "y" * 50]


def test_drop_all_null_columns(spark):
    df = spark.createDataFrame(
        [(1, None, "a"), (2, None, None)],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("dead", T.StringType()),
                T.StructField("half", T.StringType()),
            ]
        ),
    )
    out = drop_all_null_columns(df)
    assert out.columns == ["id", "half"]


def test_surrogate_key_null_part(spark):
    df = spark.createDataFrame(
        [(7, None, "2024-01-01")], "content long, display long, fecha string"
    )
    out = df.select(surrogate_key("content", "display", "fecha").alias("k"))
    assert out.first().k == "72024-01-01"


def test_iso_date_part(spark):
    df = spark.createDataFrame([("2024-01-05T12:34:56",)], ["d"])
    assert df.select(iso_date_part("d").alias("x")).first().x == "2024-01-05"


def test_positional_unnest_short_arrays(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField(
                "workers",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField(
                                "worker",
                                T.StructType(
                                    [
                                        T.StructField("name", T.StringType()),
                                        T.StructField("rut", T.StringType()),
                                    ]
                                ),
                            )
                        ]
                    )
                ),
            ),
        ]
    )
    rows = [
        (1, [{"worker": {"name": "ana", "rut": "1-9"}}]),          # 1 worker
        (2, None),                                                   # null array
        (3, [{"worker": {"name": f"w{i}", "rut": str(i)}} for i in range(5)]),  # >4
    ]
    df = spark.createDataFrame(rows, schema)
    out = positional_unnest(
        df, "workers", 4, fields=["worker.name", "worker.rut"],
        name_template="{field}_{i}",
    )
    got = {r.id: r for r in out.collect()}
    assert got[1]["worker_name_1"] == "ana" and got[1]["worker_name_2"] is None
    assert got[2]["worker_rut_4"] is None
    assert got[3]["worker_name_4"] == "w3"  # 5th dropped
    assert "worker_name_5" not in out.columns


def test_array_head(spark):
    df = spark.createDataFrame([([1, 2, 3, 4, 5],)], ["a"])
    assert df.select(array_head("a", 4).alias("h")).first().h == [1, 2, 3, 4]


def test_dedupe_column_names(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "name"]).select(
        "id", "name", F.col("name")
    )
    out = dedupe_column_names(df)
    assert out.columns == ["id", "name"]


def test_language_id_no_hits_is_und(spark):
    from etl_python_azure_spark.operators.text import language_id

    df = spark.createDataFrame(
        [(1, "zzz qqq xxyyzz"), (2, "the the of and"), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.lang_guess, r.n_hits) for r in language_id(df).collect()}
    assert got[1] == ("und", 0)
    assert got[2] == ("en", 4)
    assert got[3] == ("und", 0)


def test_text_quality_short_doc_flagged(spark):
    from etl_python_azure_spark.operators.text import text_quality

    df = spark.createDataFrame(
        [(1, "too short"), (2, " ".join(["the word okay"] * 10))],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.keep for r in text_quality(df).collect()}
    assert got == {1: False, 2: True}


def test_cdc_split_strict_greater(spark):
    d = datetime.datetime
    incoming = spark.createDataFrame(
        [
            (1, d(2024, 1, 2), "new-key"),       # absent → new
            (2, d(2024, 1, 5), "newer"),         # newer → updated
            (3, d(2024, 1, 1), "equal"),         # equal → dropped
            (4, d(2023, 12, 1), "older"),        # older → dropped
        ],
        ["id", "updated_at", "payload"],
    )
    existing = spark.createDataFrame(
        [
            (2, d(2024, 1, 1), "old"),
            (3, d(2024, 1, 1), "same"),
            (4, d(2024, 1, 1), "newer-in-target"),
        ],
        ["id", "updated_at", "payload"],
    )
    split = cdc_split(incoming, existing)
    assert [r.id for r in split.new.collect()] == [1]
    assert [r.id for r in split.updated.collect()] == [2]

    merged = merge_upsert(incoming, existing)
    got = {r.id: r.payload for r in merged.collect()}
    assert got == {1: "new-key", 2: "newer", 3: "same", 4: "newer-in-target"}
