"""Stream-stream interval join ≡ the batch band join on the same data."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_python_azure_spark.operators.range_join import band_join
from etl_python_azure_spark.streaming.pipeline import (
    interval_join_streams,
    stream_parquet_dir,
)

V_SCHEMA = "user_id long, view_id long, vts timestamp"
P_SCHEMA = "user_id long, purchase_id long, pts timestamp"
D = datetime.datetime


def test_interval_join_matches_batch_band_join(spark, tmp_path):
    vdir, pdir, ckpt, out = (
        str(tmp_path / p) for p in ("views", "purchases", "ckpt", "out")
    )
    views = [
        (1, 10, D(2024, 1, 1, 9, 40)),   # 20 min before purchase 100 → match
        (1, 11, D(2024, 1, 1, 9, 29)),   # 31 min before → no
        (1, 12, D(2024, 1, 1, 10, 0)),   # equal ts (not strictly before) → no
        (2, 13, D(2024, 1, 1, 9, 50)),   # other user → matches 101 only
        (2, 14, D(2024, 1, 1, 12, 0)),   # far later → no
    ]
    purchases = [
        (1, 100, D(2024, 1, 1, 10, 0)),
        (2, 101, D(2024, 1, 1, 10, 0)),
    ]
    spark.createDataFrame(views, V_SCHEMA).write.parquet(vdir)
    spark.createDataFrame(purchases, P_SCHEMA).write.parquet(pdir)

    joined = interval_join_streams(
        stream_parquet_dir(spark, vdir, V_SCHEMA),
        stream_parquet_dir(spark, pdir, P_SCHEMA),
        on="user_id",
        left_ts="vts",
        right_ts="pts",
        lower="INTERVAL -30 MINUTES",
        upper="INTERVAL 0 SECONDS",
        watermark="1 hour",
    )

    q = (
        joined.select("user_id", "view_id", "purchase_id")
        .writeStream.foreachBatch(
            lambda b, _: b.write.mode("append").parquet(out)
        )
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(1, 10, 100), (2, 13, 101)}

    # batch equivalence on identical inputs
    batch = band_join(
        spark.createDataFrame(views, V_SCHEMA),
        spark.createDataFrame(purchases, P_SCHEMA),
        left_ts="vts",
        right_ts="pts",
        lower="-INTERVAL 30 MINUTES",
        upper="INTERVAL 0 SECONDS",
        on=["user_id"],
    )
    assert {
        (r.user_id, r.view_id, r.purchase_id) for r in batch.collect()
    } == got


def test_deduped_stream_drops_redelivery(spark, tmp_path):
    from etl_python_azure_spark.streaming.pipeline import deduped_stream

    src, ckpt, out = (str(tmp_path / p) for p in ("dsrc", "dckpt", "dout"))
    schema = "event_id long, ts timestamp, value double"
    spark.createDataFrame(
        [
            (1, D(2024, 1, 1, 10, 0), 1.0),
            (2, D(2024, 1, 1, 10, 5), 2.0),
        ],
        schema,
    ).write.parquet(src)
    # second batch redelivers event 1 (same key, within watermark)
    spark.createDataFrame(
        [(1, D(2024, 1, 1, 10, 0), 1.0), (3, D(2024, 1, 1, 10, 9), 3.0)],
        schema,
    ).write.mode("append").parquet(src)

    q = (
        deduped_stream(
            stream_parquet_dir(spark, src, schema), ["event_id"], "ts", "1 hour"
        )
        .writeStream.foreachBatch(
            lambda b, _: b.write.mode("append").parquet(out)
        )
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == [1, 2, 3]  # the redelivered event 1 appears once
