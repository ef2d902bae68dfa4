"""E2e for the streaming curated-ingest pipeline."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _mkdocs(spark, rows):
    from etl_python_azure_spark.streaming.corpus_ingest import DOC_SCHEMA

    return spark.createDataFrame(rows, DOC_SCHEMA)


def test_streaming_ingest_curates_each_batch(spark, tmp_path):
    from etl_python_azure_spark.streaming.corpus_ingest import (
        streaming_curated_ingest,
    )

    base_dir = str(tmp_path / "base")
    drop_dir = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(drop_dir)

    seed = _mkdocs(
        spark,
        [
            (1, "s1", "the seed corpus document number one is a long text"),
            (2, "s2", "the seed corpus document number two is a long text"),
        ],
    )
    seed.write.parquet(base_dir)

    # batch 1: one novel doc, one exact dup of the seed, one junk doc
    _mkdocs(
        spark,
        [
            (10, "s1", "a brand new crawled document all about the spark engine"),
            (11, "s1", "the seed corpus document number one is a long text"),
            (12, "s1", "tiny"),
        ],
    ).write.parquet(os.path.join(drop_dir, "b1"))
    # batch 2: a near-dup of batch 1's novel doc + one more novel doc
    _mkdocs(
        spark,
        [
            (20, "s2", "a brand new crawled document all about the flink engine"),
            (21, "s2", "the totally separate second batch document is right here now"),
        ],
    ).write.parquet(os.path.join(drop_dir, "b2"))

    q = streaming_curated_ingest(
        spark, drop_dir, base_dir, ckpt,
        quota_per_source=10, near_dup_threshold=0.5,
        max_files_per_trigger=1,
    )
    assert q.awaitTermination(600), "ingest query did not drain in 600s"

    got = {
        r["doc_id"]: r["source"]
        for r in spark.read.parquet(base_dir).collect()
    }
    # seed intact; 10 admitted; 11 exact-dup rejected; 12 quality-
    # rejected; 20 near-dup of (already-admitted) 10 rejected — the
    # cross-BATCH dedup only holds because each micro-batch sees the
    # previous batch's admissions in the base; 21 admitted.
    assert set(got) == {1, 2, 10, 21}

    # restart with the same checkpoint: nothing new to process, and a
    # full re-ingest of the same files into a FRESH checkpoint is a
    # no-op on the base (semantic idempotence via the fp anti-join)
    q2 = streaming_curated_ingest(
        spark, drop_dir, base_dir, str(tmp_path / "ckpt2"),
        quota_per_source=10, near_dup_threshold=0.5,
    )
    assert q2.awaitTermination(600), "ingest query did not drain in 600s"
    again = {
        r["doc_id"] for r in spark.read.parquet(base_dir).collect()
    }
    assert again == {1, 2, 10, 21}


def test_streaming_ingest_respects_quota_headroom(spark, tmp_path):
    from etl_python_azure_spark.streaming.corpus_ingest import (
        streaming_curated_ingest,
    )

    base_dir = str(tmp_path / "base")
    drop_dir = str(tmp_path / "drop")
    os.makedirs(drop_dir)
    _mkdocs(
        spark,
        [(1, "s1", "the seed corpus document number one is a long text")],
    ).write.parquet(base_dir)

    # two novel s1 docs, but quota 2 leaves only ONE s1 slot
    _mkdocs(
        spark,
        [
            (10, "s1", "a first new document with plenty of fresh words here"),
            (11, "s1", "a second new document carrying different fresh words too"),
        ],
    ).write.parquet(os.path.join(drop_dir, "b1"))

    q = streaming_curated_ingest(
        spark, drop_dir, base_dir, str(tmp_path / "ckpt"),
        quota_per_source=2, near_dup_threshold=0.5,
        max_files_per_trigger=None,
    )
    assert q.awaitTermination(600), "ingest query did not drain in 600s"
    got = sorted(
        r["doc_id"] for r in spark.read.parquet(base_dir).collect()
    )
    # deterministic keep: quota_sample ranks by md5(doc_id) — exactly
    # one of {10, 11} is admitted, and which one is stable run-to-run
    assert len(got) == 2 and got[0] == 1 and got[1] in (10, 11)
    n_s1 = (
        spark.read.parquet(base_dir)
        .filter(F.col("source") == "s1")
        .count()
    )
    assert n_s1 == 2


def test_streaming_crash_between_base_and_sidecar_append(spark, tmp_path):
    """Stream-side mirror of test_sidecar_crash_replay: a micro-batch
    dies AFTER its base append but BEFORE its sidecar append AND
    before the checkpoint commit. On restart the file source replays
    the batch; curate_increment's batch-top sync repairs the lagging
    sidecars from the base, the repaired fp anti-join rejects every
    replayed row, and the base gains nothing — the streaming and
    nightly-batch increment paths share one crash contract."""
    from etl_python_azure_spark.plans.sidecars import (
        build_sidecars,
        read_sidecar,
        sync_sidecars,
    )
    from etl_python_azure_spark.streaming.corpus_ingest import (
        streaming_curated_ingest,
    )

    base_dir = str(tmp_path / "base")
    drop_dir = str(tmp_path / "drop")
    sc_dir = str(tmp_path / "sc")
    os.makedirs(drop_dir)
    seed = _mkdocs(
        spark,
        [
            (1, "s1", "the seed corpus document number one is a long text"),
            (2, "s2", "the seed corpus document number two is a long text"),
        ],
    )
    seed.write.parquet(base_dir)
    build_sidecars(spark, base_dir, sc_dir, span_window=4)

    b1 = _mkdocs(
        spark,
        [
            (10, "s1",
             "a brand new crawled document all about the spark engine"),
            (11, "s1", "the seed corpus document number one is a long text"),
        ],
    )
    b1.write.parquet(os.path.join(drop_dir, "b1"))

    # the CRASH: the micro-batch's admit ran and its BASE append
    # landed, but the process died before append_sidecars and before
    # the checkpoint commit — base ahead of sidecars, batch unacked
    b1.filter(F.col("doc_id") == 10).write.mode("append").parquet(base_dir)
    assert read_sidecar(spark, sc_dir, "fp").count() == 2  # behind

    # restart: fresh checkpoint → the file source REPLAYS b1
    q = streaming_curated_ingest(
        spark, drop_dir, base_dir, str(tmp_path / "ckpt"),
        quota_per_source=10, near_dup_threshold=0.5,
        span_window=4, sidecar_dir=sc_dir,
    )
    assert q.awaitTermination(600), "ingest did not drain"

    got = sorted(r["doc_id"] for r in spark.read.parquet(base_dir).collect())
    assert got == [1, 2, 10]  # replay admitted NOTHING new
    # sidecars caught up to the base (batch-top sync repaired 10)
    assert read_sidecar(spark, sc_dir, "fp").count() == 3
    assert sync_sidecars(spark, base_dir, sc_dir, span_window=4) == 0
