"""Raw-array forms of the N3/A-6 embedding queries.

The driver registry rows (`positional_unnest_embeddings`,
`array_toolbox_embeddings`) project scalar probes because the
driver's pandas canonicalizer cannot hash list cells. The raw-array
semantics — slice, sort, reverse as actual arrays — live here,
checked cell-for-cell against pyarrow/pandas on the same parquet.

Reference parity: positional flatten `S:154–180` (first-n elements of
a list column become fixed columns / a head slice).
"""

from __future__ import annotations

import math

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_python_azure_spark.operators.arrays import (
    array_head,
    positional_unnest,
)


def _expected(sf_dir):
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    return dict(zip(tbl["vec_id"], tbl["embedding"]))


def test_array_head_raw(spark, sf_dir):
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {
        r["vec_id"]: r["head"]
        for r in em.select(
            "vec_id", array_head("embedding", 4).alias("head")
        ).collect()
    }
    exp = _expected(sf_dir)
    assert got.keys() == exp.keys()
    for k, head in got.items():
        assert head == exp[k][:4]


def test_positional_unnest_matches_head_and_pads_nulls(spark, sf_dir):
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = 4
    out = positional_unnest(
        em.select("vec_id", "embedding"),
        "embedding",
        n,
        name_template="{array}_{i}",
        drop_source=False,
    )
    exp = _expected(sf_dir)
    for r in out.collect():
        e = exp[r["vec_id"]]
        for i in range(n):
            want = e[i] if i < len(e) else None
            assert r[f"embedding_{i + 1}"] == want


def test_sort_reverse_distinct_raw(spark, sf_dir):
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = em.select(
        "vec_id",
        F.sort_array(F.slice("embedding", 1, 5)).alias("sorted5"),
        F.reverse(F.slice("embedding", 1, 3)).alias("rev3"),
        F.size(F.array_distinct("embedding")).alias("n_distinct"),
    ).collect()
    exp = _expected(sf_dir)
    assert rows
    for r in rows:
        e = exp[r["vec_id"]]
        assert r["sorted5"] == sorted(e[:5])
        assert r["rev3"] == list(reversed(e[:3]))
        assert r["n_distinct"] == len(set(e))


def test_fold_sum_probe_equals_python_fold(spark, sf_dir):
    """The driver row's head_sum probe is a fixed-order double fold;
    re-derive it in Python (same promotion order) and require
    bit-exact equality — this is the invariant the DuckDB oracle
    relies on."""
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {
        r["vec_id"]: r["s"]
        for r in em.select(
            "vec_id",
            F.aggregate(
                F.slice("embedding", 1, 4), F.lit(0.0), lambda a, x: a + x
            ).alias("s"),
        ).collect()
    }
    exp = _expected(sf_dir)
    for k, s in got.items():
        acc = 0.0
        for v in exp[k][:4]:
            acc = acc + v
        assert s == acc and not math.isnan(s)
