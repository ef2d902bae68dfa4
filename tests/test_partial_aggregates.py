"""Algebra of partial-aggregate maintenance: merge(parts) == direct."""

from __future__ import annotations

from etl_python_azure_spark.operators.aggregates import (
    finalize_avg,
    merge_partial_aggregates,
    partial_aggregate,
)
from etl_python_azure_spark.session import load_tables

SF = "/root/testdata/sf0.001"


def _snapshot(df):
    return {
        tuple(r[k] for k in ("o_orderstatus",)): (
            r["sum_o_totalprice"],
            r["min_o_totalprice"],
            r["max_o_totalprice"],
            r["n"],
        )
        for r in df.collect()
    }


def test_merge_of_splits_equals_direct(spark):
    o = load_tables(spark, SF, "orders")
    keys, sums = ["o_orderstatus"], ["o_totalprice"]
    direct = partial_aggregate(
        o, keys, sums, min_cols=sums, max_cols=sums
    )
    # split on an arbitrary predicate; thirds have disjoint rows
    parts = [
        partial_aggregate(
            o.filter(f"o_orderkey % 3 = {i}"),
            keys,
            sums,
            min_cols=sums,
            max_cols=sums,
        )
        for i in range(3)
    ]
    merged = merge_partial_aggregates(parts, keys)
    assert _snapshot(merged) == _snapshot(direct)


def test_merge_handles_keys_missing_from_some_parts(spark):
    o = load_tables(spark, SF, "orders")
    keys, sums = ["o_orderstatus"], ["o_totalprice"]
    # part A covers one status only; part B the rest
    a = partial_aggregate(
        o.filter("o_orderstatus = 'F'"), keys, sums, min_cols=sums, max_cols=sums
    )
    b = partial_aggregate(
        o.filter("o_orderstatus <> 'F'"), keys, sums, min_cols=sums, max_cols=sums
    )
    merged = merge_partial_aggregates([a, b], keys)
    direct = partial_aggregate(o, keys, sums, min_cols=sums, max_cols=sums)
    assert _snapshot(merged) == _snapshot(direct)


def test_finalize_avg_matches_builtin(spark):
    o = load_tables(spark, SF, "orders")
    p = partial_aggregate(o, ["o_orderstatus"], ["o_totalprice"])
    fin = {
        r.o_orderstatus: r.avg_price
        for r in finalize_avg(p, "sum_o_totalprice", "avg_price").collect()
    }
    direct = {
        r.o_orderstatus: r.a
        for r in o.groupBy("o_orderstatus")
        .agg({"o_totalprice": "avg"})
        .withColumnRenamed("avg(o_totalprice)", "a")
        .collect()
    }
    for k, v in direct.items():
        # decimal-exact sum / exact count vs double-accumulated avg
        assert abs(float(fin[k]) - v) < 1e-6


def test_streamed_rollup_equals_direct(spark, tmp_path):
    from etl_python_azure_spark.streaming.pipeline import (
        maintained_rollup,
        stream_parquet_dir,
    )

    src, ckpt, tgt = (
        str(tmp_path / p) for p in ("src", "ckpt", "rollup")
    )
    schema = "user_id long, ts timestamp, value double"
    e = load_tables(spark, SF, "events").select("user_id", "ts", "value")
    # two arrivals: first 60%, then the rest
    e.filter("user_id % 5 < 3").write.parquet(src)
    q = maintained_rollup(
        stream_parquet_dir(spark, src, schema),
        keys=["user_id"],
        sum_cols=["value"],
        target_path=tgt,
        checkpoint=ckpt,
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    e.filter("user_id % 5 >= 3").write.mode("append").parquet(src)
    q = maintained_rollup(
        stream_parquet_dir(spark, src, schema),
        keys=["user_id"],
        sum_cols=["value"],
        target_path=tgt,
        checkpoint=ckpt,
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    from etl_python_azure_spark.operators.aggregates import partial_aggregate

    direct = {
        r.user_id: (r.sum_value, r.n)
        for r in partial_aggregate(e, ["user_id"], ["value"]).collect()
    }
    from etl_python_azure_spark.sinks.files import read_snapshot

    maintained = {
        r.user_id: (r.sum_value, r.n)
        for r in read_snapshot(spark, tgt).collect()
    }
    assert maintained == direct  # decimal partials → exact, no drift


def test_fold_epoch_replay_is_idempotent(spark, tmp_path):
    # foreachBatch is at-least-once: re-delivering an epoch must not
    # double-fold (the fold is pure addition)
    from etl_python_azure_spark.sinks.files import read_snapshot
    from etl_python_azure_spark.streaming.pipeline import _fold_epoch

    tgt = str(tmp_path / "rollup")
    b0 = spark.createDataFrame([(1, 10.0), (2, 5.0)], "k long, v double")
    b1 = spark.createDataFrame([(1, 1.0)], "k long, v double")

    _fold_epoch(b0, tgt, ["k"], ["v"], epoch_id=0)
    _fold_epoch(b1, tgt, ["k"], ["v"], epoch_id=1)
    _fold_epoch(b1, tgt, ["k"], ["v"], epoch_id=1)  # replayed epoch
    _fold_epoch(b0, tgt, ["k"], ["v"], epoch_id=0)  # stale replay

    got = {r.k: (float(r.sum_v), r.n) for r in read_snapshot(spark, tgt).collect()}
    assert got == {1: (11.0, 2), 2: (5.0, 1)}
