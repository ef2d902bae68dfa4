"""Z-order layout: interleave correctness + skipping-relevant locality."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_python_azure_spark.operators.layout import (
    normalize_to_bits,
    write_zordered,
    zorder_key,
)


def _py_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.withColumn(
            "z", zorder_key([F.col("x"), F.col("y")], bits=4)
        ).collect()
    }
    for (x, y), z in got.items():
        assert z == _py_morton(x, y, 4), (x, y)


def test_normalize_to_bits_bounds(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (100.0,)], "v double")
    out = [
        r.n
        for r in df.select(
            normalize_to_bits(F.col("v"), F.lit(0.0), F.lit(100.0), 8).alias("n")
        ).collect()
    ]
    assert out[0] == 0 and out[2] == 255 and 0 <= out[1] <= 255


def test_zorder_write_clusters_both_dims(spark, tmp_path):
    # uniform grid; after z-order write each FILE should cover a
    # compact tile: per-file (max-min) spans of BOTH dims stay far
    # below the global span — that's what min/max skipping needs
    rows = [(x, y, x * 256 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")
    out = str(tmp_path / "z")
    write_zordered(df, ["x", "y"], out, bits=6, num_files=16)

    files = glob.glob(f"{out}/*.parquet")
    assert len(files) > 4
    spans_x, spans_y = [], []
    for f in files:
        t = pq.read_table(f, columns=["x", "y"])
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        if xs:
            spans_x.append(max(xs) - min(xs))
            spans_y.append(max(ys) - min(ys))
    # global span is 63; tiles must be materially tighter on average
    assert sum(spans_x) / len(spans_x) < 40
    assert sum(spans_y) / len(spans_y) < 40
    # and the data round-trips
    assert spark.read.parquet(out).count() == 64 * 64
