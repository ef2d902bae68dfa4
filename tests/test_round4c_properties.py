"""Property-based tests (hypothesis) for the round-4c..4g operator
batch: invariants that must hold for ANY input, not just fixtures.

- grouped_topk ≡ the window top-k formulation on arbitrary data
- median/MAD agree with numpy's definitions per group
- temperature allocation: seats sum exactly to the budget and are
  monotone in source size
- SQ8 dequantization error is bounded by half a quantization step
  per dimension
- purged CV: roles partition every (row, fold); test blocks tile
  the timeline exactly once
"""

from __future__ import annotations

import datetime
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_python_azure_spark.operators.aggregates import grouped_topk
from etl_python_azure_spark.operators.drift import median_mad
from etl_python_azure_spark.operators.pq import sq_encode, sq_train_stats
from etl_python_azure_spark.operators.sampling import (
    purged_time_folds,
    temperature_allocation,
)
from etl_python_azure_spark.session import get_spark

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

vals = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.floats(-100, 100, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=40,
)


@SET
@given(rows=vals, k=st.integers(1, 4))
def test_grouped_topk_equals_window(rows, k):
    spark = get_spark("props")
    df = spark.createDataFrame(
        [(g, float(v), i) for i, (g, v) in enumerate(rows)],
        "g int, v double, id long",
    ).repartition(3)
    agg = {
        (r["g"], r["rn"], r["v"], r["id"])
        for r in grouped_topk(df, ["g"], "v", "id", k=k).collect()
    }
    w = Window.partitionBy("g").orderBy(F.desc("v"), F.asc("id"))
    win = {
        (r["g"], r["rn"], r["v"], r["id"])
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .collect()
    }
    assert agg == win


@SET
@given(rows=vals)
def test_median_mad_matches_numpy(rows):
    import numpy as np

    spark = get_spark("props")
    df = spark.createDataFrame(
        [(g, float(v), i) for i, (g, v) in enumerate(rows)],
        "g int, v double, id long",
    )
    out = {r["g"]: r for r in median_mad(df, "v", ["g"], "id").collect()}
    by_g: dict[int, list[float]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(float(v))
    for g, vs in by_g.items():
        assert math.isclose(
            out[g]["median"], float(np.median(vs)), rel_tol=0, abs_tol=1e-9
        )
        devs = [abs(x - float(np.median(vs))) for x in vs]
        assert math.isclose(
            out[g]["mad"], float(np.median(devs)), rel_tol=0, abs_tol=1e-9
        )
        assert out[g]["n"] == len(vs)


@SET
@given(
    counts=st.lists(st.integers(1, 500), min_size=1, max_size=6),
    total=st.integers(1, 5000),
)
def test_temperature_allocation_invariants(counts, total):
    spark = get_spark("props")
    rows = [(f"s{i}",) for i, n in enumerate(counts) for _ in range(n)]
    df = spark.createDataFrame(rows, "src string")
    out = {
        r["src"]: r
        for r in temperature_allocation(df, "src", total=total).collect()
    }
    assert sum(r["alloc_docs"] for r in out.values()) == total
    assert all(r["alloc_docs"] >= 0 for r in out.values())
    # largest-remainder never deviates more than 1 seat from the
    # real-valued quota
    for r in out.values():
        assert abs(r["alloc_docs"] - total * r["temp_share"]) <= 1.0
    # monotone: a strictly larger source never gets fewer seats than
    # a smaller one by more than the 1-seat remainder wobble
    by_n = sorted(out.values(), key=lambda r: r["n_docs"])
    for a, b in zip(by_n, by_n[1:]):
        if b["n_docs"] > a["n_docs"]:
            assert b["alloc_docs"] >= a["alloc_docs"] - 1


@SET
@given(
    vecs=st.lists(
        st.lists(
            st.floats(-50, 50, allow_nan=False, width=32),
            min_size=3,
            max_size=3,
        ),
        min_size=2,
        max_size=12,
    )
)
def test_sq8_dequant_error_bounded(vecs):
    spark = get_spark("props")
    df = spark.createDataFrame(
        list(enumerate(vecs)), "vec_id long, embedding array<float>"
    )
    stats = sq_train_stats(df)
    mn, mx = stats.first()["mn"], stats.first()["mx"]
    codes = {
        r["vec_id"]: r["codes"] for r in sq_encode(df, stats).collect()
    }
    for vid, vec in enumerate(vecs):
        for d, x in enumerate(vec):
            step = (mx[d] - mn[d]) / 255.0
            deq = mn[d] + codes[vid][d] * step
            # float32 storage + round-half-up: within one step
            assert abs(float(x) - deq) <= step + 1e-5


@SET
@given(
    n_days=st.integers(1, 40),
    n_folds=st.integers(1, 5),
    purge=st.integers(0, 3),
    embargo=st.integers(0, 3),
)
def test_purged_folds_partition_and_tile(n_days, n_folds, purge, embargo):
    spark = get_spark("props")
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, base + datetime.timedelta(days=i)) for i in range(n_days)],
        "id long, ts timestamp",
    )
    out = purged_time_folds(
        df, "ts", n_folds=n_folds, purge_days=purge, embargo_days=embargo
    ).collect()
    # every (row, fold) has exactly one role
    assert len(out) == n_days * n_folds
    # per fold, test-day blocks tile the timeline: each day is test
    # in EXACTLY one fold
    test_days = [r["id"] for r in out if r["role"] == "test"]
    assert sorted(test_days) == list(range(n_days))
