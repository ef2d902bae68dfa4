"""Maintained dedup sidecar tables (`plans.sidecars`):
sidecar-probe ≡ base-reprojection, crash replay between a base
append and its sidecar append, the meta param guard, and the
short-document repair-loop regression."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


_BASE_ROWS = [
    (1, "s1", "the seed corpus document number one is a long text"),
    (2, "s2", "the seed corpus document number two is a long text"),
    (3, "s1", "an entirely different seed document about query engines here"),
]

# delta: 10 novel, 11 exact dup of base 1, 12 near dup of base 3,
# 13 junk (quality-rejected), 14 novel
_DELTA_ROWS = [
    (10, "s1", "a brand new crawled document all about the spark engine"),
    (11, "s2", "the seed corpus document number one is a long text"),
    (12, "s1", "an entirely different seed document about query engines now"),
    (13, "s1", "tiny"),
    (14, "s2", "the totally separate second delta document is right here now"),
]


def _admit_ids(spark, base_dir, delta, sidecar_dir=None, span_window=None):
    from etl_python_azure_spark.plans.curation import curate_increment

    admitted = curate_increment(
        spark,
        base_dir,
        delta,
        quota_per_source=10,
        near_dup_threshold=0.5,
        span_window=span_window,
        sidecar_dir=sidecar_dir,
    )
    ids = sorted(r["doc_id"] for r in admitted.collect())
    spark.catalog.clearCache()
    return ids


@pytest.mark.parametrize("span_window", [None, 4])
def test_sidecar_probe_equals_reprojection(spark, tmp_path, span_window):
    """curate_increment through sidecars admits EXACTLY the rows the
    legacy base-reprojection path admits — every tier (exact fp,
    LSH bands, span fps) probed from the maintained tables."""
    from etl_python_azure_spark.plans.sidecars import build_sidecars

    base_dir = str(tmp_path / "base")
    sc_dir = str(tmp_path / "sc")
    _docs(spark, _BASE_ROWS).write.parquet(base_dir)
    build_sidecars(spark, base_dir, sc_dir, span_window=span_window)

    delta = _docs(spark, _DELTA_ROWS)
    legacy = _admit_ids(spark, base_dir, delta, span_window=span_window)
    sidecar = _admit_ids(
        spark, base_dir, delta, sidecar_dir=sc_dir, span_window=span_window
    )
    assert sidecar == legacy
    assert 11 not in sidecar  # exact dup caught via the fp sidecar
    assert 12 not in sidecar  # near dup caught via the bands sidecar


def test_sidecar_crash_replay(spark, tmp_path):
    """Crash between the base append and the sidecar append: the
    replayed batch self-heals (sync repairs the sidecars from the
    base) and admits NOTHING — idempotent admission holds with
    sidecar probes exactly as it does with reprojection."""
    from etl_python_azure_spark.plans.curation import curate_increment
    from etl_python_azure_spark.plans.sidecars import (
        build_sidecars,
        read_sidecar,
        sync_sidecars,
    )

    base_dir = str(tmp_path / "base")
    sc_dir = str(tmp_path / "sc")
    _docs(spark, _BASE_ROWS).write.parquet(base_dir)
    build_sidecars(spark, base_dir, sc_dir, span_window=4)

    delta = _docs(spark, _DELTA_ROWS)
    admitted = curate_increment(
        spark, base_dir, delta,
        quota_per_source=10, near_dup_threshold=0.5,
        span_window=4, sidecar_dir=sc_dir,
    ).localCheckpoint()
    got = {r["doc_id"] for r in admitted.collect()}
    assert got == {10, 14}
    # the CRASH: base append lands, sidecar append never runs
    admitted.select("doc_id", "source", "text").write.mode(
        "append"
    ).parquet(base_dir)
    spark.catalog.clearCache()
    behind = read_sidecar(spark, sc_dir, "fp").count()
    assert behind == len(_BASE_ROWS)  # sidecars are behind the base

    # replay of the same delta: sync repairs, fp anti-join rejects
    replay = _admit_ids(
        spark, base_dir, delta, sidecar_dir=sc_dir, span_window=4
    )
    assert replay == []
    # sidecars caught up to the base (fp is the completion ledger)
    assert read_sidecar(spark, sc_dir, "fp").count() == len(
        _BASE_ROWS
    ) + len(got)
    # and the repair is convergent: a second sync is a no-op
    assert sync_sidecars(spark, base_dir, sc_dir, span_window=4) == 0


def test_sidecar_meta_guard(spark, tmp_path):
    """Appending/probing with different projection params than the
    table was built with raises instead of silently mixing
    incompatible fingerprints."""
    from etl_python_azure_spark.plans.sidecars import (
        append_sidecars,
        build_sidecars,
    )

    base_dir = str(tmp_path / "base")
    sc_dir = str(tmp_path / "sc")
    _docs(spark, _BASE_ROWS).write.parquet(base_dir)
    build_sidecars(spark, base_dir, sc_dir, span_window=4)
    with pytest.raises(ValueError, match="params mismatch"):
        append_sidecars(
            spark, _docs(spark, _DELTA_ROWS), sc_dir, span_window=8
        )


def test_sync_tolerates_shingleless_docs(spark, tmp_path):
    """A document too short for band/span shingles still completes:
    the repair set keys on the fp LEDGER, so sync converges to 0
    instead of re-flagging shingle-less docs forever (the repair
    loop the per-table diff would have caused)."""
    from etl_python_azure_spark.plans.sidecars import (
        read_sidecar,
        sync_sidecars,
    )

    base_dir = str(tmp_path / "base")
    sc_dir = str(tmp_path / "sc")
    _docs(
        spark,
        [(1, "s1", "ok"), (2, "s1", "one two three four five six")],
    ).write.parquet(base_dir)
    assert sync_sidecars(spark, base_dir, sc_dir, span_window=4) == 2
    assert sync_sidecars(spark, base_dir, sc_dir, span_window=4) == 0
    # doc 1 has no 3-word shingles and no 4-token spans — present in
    # the ledger, absent from the derived tables, and that's fine
    assert read_sidecar(spark, sc_dir, "fp").count() == 2
    bands_ids = {
        r["doc_id"]
        for r in read_sidecar(spark, sc_dir, "bands")
        .select("doc_id").distinct().collect()
    }
    assert bands_ids == {2}


def test_streaming_ingest_maintains_sidecars(spark, tmp_path):
    """End-to-end `streaming_curated_ingest(sidecar_dir=...)`: the
    admitted base matches the legacy (reprojection) stream run, and
    the fp sidecar tracks the base exactly, batch over batch."""
    from etl_python_azure_spark.plans.sidecars import read_sidecar
    from etl_python_azure_spark.streaming.corpus_ingest import (
        streaming_curated_ingest,
    )

    def _run(root, sidecar_dir=None):
        base_dir = str(root / "base")
        drop_dir = str(root / "drop")
        ckpt = str(root / "ckpt")
        os.makedirs(drop_dir)
        _docs(spark, _BASE_ROWS).write.parquet(base_dir)
        _docs(spark, _DELTA_ROWS).write.parquet(
            os.path.join(drop_dir, "b1")
        )
        _docs(
            spark,
            [
                # exact dup of b1's admitted 10 — must be rejected
                # via state that includes batch 1's admissions
                (20, "s2",
                 "a brand new crawled document all about the spark engine"),
                (21, "s1",
                 "the closing third batch document lives over here instead"),
            ],
        ).write.parquet(os.path.join(drop_dir, "b2"))
        q = streaming_curated_ingest(
            spark, drop_dir, base_dir, ckpt,
            quota_per_source=10, near_dup_threshold=0.5,
            span_window=4, sidecar_dir=sidecar_dir,
        )
        assert q.awaitTermination(600), "ingest did not drain"
        return base_dir, sorted(
            r["doc_id"]
            for r in spark.read.parquet(base_dir).collect()
        )

    sc_dir = str(tmp_path / "sc")
    _, legacy_ids = _run(tmp_path / "legacy")
    base_dir, sidecar_ids = _run(tmp_path / "side", sidecar_dir=sc_dir)
    assert sidecar_ids == legacy_ids
    fp = read_sidecar(spark, sc_dir, "fp")
    base = spark.read.parquet(base_dir)
    assert fp.count() == base.count()
    assert (
        base.select("doc_id").exceptAll(fp.select("doc_id")).count() == 0
    )


def test_compact_folds_duplicates_and_preserves_probes(spark, tmp_path):
    """Compaction: distinct rows (folds crash-repair duplicates),
    sorted/range-partitioned by probe key, and the admit decision is
    IDENTICAL through the compacted tables."""
    from etl_python_azure_spark.plans.sidecars import (
        build_sidecars,
        compact_sidecars,
        read_sidecar,
        sync_sidecars,
    )

    base_dir = str(tmp_path / "base")
    sc_dir = str(tmp_path / "sc")
    _docs(spark, _BASE_ROWS).write.parquet(base_dir)
    build_sidecars(spark, base_dir, sc_dir, span_window=4)
    # manufacture crash-repair duplicates: drop the fp LEDGER only,
    # then sync — bands/spans rows for every base doc get re-appended
    import shutil

    shutil.rmtree(str(tmp_path / "sc" / "fp"))
    assert sync_sidecars(spark, base_dir, sc_dir, span_window=4) == len(
        _BASE_ROWS
    )
    bands_dup = read_sidecar(spark, sc_dir, "bands").count()
    assert bands_dup == 2 * read_sidecar(
        spark, sc_dir, "bands"
    ).distinct().count()

    stats = compact_sidecars(spark, sc_dir, files_per_table=1)
    assert stats["bands"][0] == bands_dup
    assert stats["bands"][1] == bands_dup // 2
    # probes unchanged: same admit decision as the legacy path
    delta = _docs(spark, _DELTA_ROWS)
    legacy = _admit_ids(spark, base_dir, delta, span_window=4)
    compacted = _admit_ids(
        spark, base_dir, delta, sidecar_dir=sc_dir, span_window=4
    )
    assert compacted == legacy


def test_sync_rebuilds_vanished_derived_table(spark, tmp_path):
    """A compaction crash between its two renames can leave a
    derived table ABSENT while the fp ledger survives — the
    ledger-keyed diff can't see that, so sync must rebuild the
    table from the full base."""
    import shutil

    from etl_python_azure_spark.plans.sidecars import (
        build_sidecars,
        read_sidecar,
        sync_sidecars,
    )

    base_dir = str(tmp_path / "base")
    sc_dir = str(tmp_path / "sc")
    _docs(spark, _BASE_ROWS).write.parquet(base_dir)
    build_sidecars(spark, base_dir, sc_dir, span_window=4)
    shutil.rmtree(str(tmp_path / "sc" / "bands"))
    # ledger is complete, so repaired-doc count is 0 — but the
    # vanished table must come back fully populated
    assert sync_sidecars(spark, base_dir, sc_dir, span_window=4) == 0
    bands_ids = {
        r["doc_id"]
        for r in read_sidecar(spark, sc_dir, "bands")
        .select("doc_id").distinct().collect()
    }
    assert bands_ids == {1, 2, 3}


def test_sidecar_uri_scheme_via_hadoop_fs(spark, tmp_path):
    """URI-scheme sidecar dirs route ALL maintenance IO (existence,
    meta guard, lock, swap, file counts) through the Hadoop
    FileSystem API — the full lifecycle works against a
    URI-addressed store (file: here; the same code path serves
    hdfs/abfss/s3a when their jars are present)."""
    from etl_python_azure_spark.plans.sidecars import (
        build_sidecars,
        compact_sidecars,
        read_sidecar,
        sidecar_file_counts,
        sync_sidecars,
    )

    base_dir = str(tmp_path / "base")
    sc_uri = "file://" + str(tmp_path / "sc")
    _docs(spark, _BASE_ROWS).write.parquet(base_dir)
    build_sidecars(spark, base_dir, sc_uri, span_window=4)
    assert read_sidecar(spark, sc_uri, "fp").count() == len(_BASE_ROWS)
    # the meta guard reads back through the FS API too
    with pytest.raises(ValueError, match="params mismatch"):
        sync_sidecars(spark, base_dir, sc_uri, span_window=8)
    # probe equivalence through the URI-addressed tables
    delta = _docs(spark, _DELTA_ROWS)
    legacy = _admit_ids(spark, base_dir, delta, span_window=4)
    via_uri = _admit_ids(
        spark, base_dir, delta, sidecar_dir=sc_uri, span_window=4
    )
    assert via_uri == legacy
    # lock-protected compaction + listing through the FS API
    stats = compact_sidecars(spark, sc_uri, files_per_table=1)
    assert stats["fp"][1] == len(_BASE_ROWS)
    assert all(
        v == 1 for v in sidecar_file_counts(sc_uri, spark).values()
    )
    assert sync_sidecars(spark, base_dir, sc_uri, span_window=4) == 0


def test_has_scheme_accepts_single_slash_uris():
    """r13 ADVICE (medium): Hadoop Path accepts single-slash URIs
    ('hdfs:/tmp/sc') — they must route to _HadoopIO, not fall
    through to _LocalIO where isdir()=False silently disables
    dedup. Windows drive letters stay local."""
    from etl_python_azure_spark.plans.sidecars import _has_scheme

    assert _has_scheme("hdfs:/tmp/sc")
    assert _has_scheme("s3a:/bucket/sc")
    assert _has_scheme("hdfs://nn:8020/tmp/sc")
    assert _has_scheme("abfss://c@a.dfs.example/sc")
    assert _has_scheme("file:/tmp/sc")
    assert _has_scheme("file:///tmp/sc")
    assert not _has_scheme("C:/Users/x/sc")  # Windows drive, local
    assert not _has_scheme("/tmp/sc")
    assert not _has_scheme("relative/path/sc")


def test_sidecar_single_slash_uri_end_to_end(spark, tmp_path):
    """The single-slash URI form works through the full build→read
    cycle (file:/ here; same routing serves hdfs:/ etc.)."""
    from etl_python_azure_spark.plans.sidecars import (
        build_sidecars,
        read_sidecar,
    )

    base_dir = str(tmp_path / "base")
    sc_uri = "file:/" + str(tmp_path / "sc").lstrip("/")
    _docs(spark, _BASE_ROWS).write.parquet(base_dir)
    build_sidecars(spark, base_dir, sc_uri, span_window=4)
    assert read_sidecar(spark, sc_uri, "fp").count() == len(_BASE_ROWS)


def test_unlock_sweeps_compaction_leftovers(spark, tmp_path):
    """r13 verdict item 7: a compaction that crashes AFTER writing
    its `__compact` temp dir (but before the swap) leaves orphan
    dirs that nothing removed until the next compaction — unlock now
    sweeps them, and probes still match reprojection."""
    from etl_python_azure_spark.plans.sidecars import (
        _lock_path,
        build_sidecars,
        force_unlock_sidecars,
        read_sidecar,
        sync_sidecars,
    )

    base_dir = str(tmp_path / "base")
    sc_dir = str(tmp_path / "sc")
    _docs(spark, _BASE_ROWS).write.parquet(base_dir)
    build_sidecars(spark, base_dir, sc_dir, span_window=4)
    # crash-inject: temp dir written, lock held, swap never ran
    os.makedirs(os.path.join(sc_dir, "fp__compact"))
    with open(os.path.join(sc_dir, "fp__compact", "part-x.parquet"), "wb") as fh:
        fh.write(b"half-written")
    with open(_lock_path(sc_dir), "w") as fh:
        fh.write("pid=0\n")

    assert force_unlock_sidecars(sc_dir) is True
    leftovers = [n for n in os.listdir(sc_dir) if "__" in n]
    assert leftovers == []
    assert sync_sidecars(spark, base_dir, sc_dir, span_window=4) == 0
    delta = _docs(spark, _DELTA_ROWS)
    legacy = _admit_ids(spark, base_dir, delta, span_window=4)
    via_sc = _admit_ids(
        spark, base_dir, delta, sidecar_dir=sc_dir, span_window=4
    )
    assert via_sc == legacy


def test_unlock_restores_mid_swap_table_from_old(spark, tmp_path):
    """Crash BETWEEN the two swap renames: the live table is gone
    and `__old` holds the full pre-compaction data — unlock renames
    it back instead of deleting it (strictly cheaper and safer than
    the full-base rebuild sync would otherwise run)."""
    from etl_python_azure_spark.plans.sidecars import (
        _lock_path,
        build_sidecars,
        force_unlock_sidecars,
        read_sidecar,
    )

    base_dir = str(tmp_path / "base")
    sc_dir = str(tmp_path / "sc")
    _docs(spark, _BASE_ROWS).write.parquet(base_dir)
    build_sidecars(spark, base_dir, sc_dir, span_window=4)
    # crash-inject mid-swap: live fp renamed away, compact half-done
    os.rename(os.path.join(sc_dir, "fp"), os.path.join(sc_dir, "fp__old"))
    os.makedirs(os.path.join(sc_dir, "fp__compact"))
    with open(_lock_path(sc_dir), "w") as fh:
        fh.write("pid=0\n")

    assert force_unlock_sidecars(sc_dir) is True
    assert [n for n in os.listdir(sc_dir) if "__" in n] == []
    assert read_sidecar(spark, sc_dir, "fp").count() == len(_BASE_ROWS)


def test_sidecar_unknown_scheme_fails_loudly(spark):
    """A scheme Hadoop cannot resolve (no connector jar) raises at
    FileSystem resolution instead of silently probing empty."""
    from etl_python_azure_spark.plans.sidecars import read_sidecar

    with pytest.raises(ValueError, match="Hadoop FileSystem"):
        read_sidecar(spark, "abfss://corpus@acct.dfs.example/sc", "fp")


def test_build_refuses_populated_dir(spark, tmp_path):
    """Re-building onto populated sidecars would silently append a
    full duplicate copy of every row — refuse and point at
    sync/compact."""
    from etl_python_azure_spark.plans.sidecars import build_sidecars

    base_dir = str(tmp_path / "base")
    sc_dir = str(tmp_path / "sc")
    _docs(spark, _BASE_ROWS).write.parquet(base_dir)
    build_sidecars(spark, base_dir, sc_dir, span_window=4)
    with pytest.raises(ValueError, match="already exist"):
        build_sidecars(spark, base_dir, sc_dir, span_window=4)


def test_maintenance_lock_blocks_probes_until_unlock(spark, tmp_path):
    """A crashed compaction leaves the maintenance lock: every
    probe/append/sync/compact then raises LOUDLY (instead of reading
    the swap window's missing table as an empty frame), and the
    documented recovery — unlock, then sync — restores service."""
    from etl_python_azure_spark.cli import main
    from etl_python_azure_spark.plans.sidecars import (
        _lock_path,
        append_sidecars,
        build_sidecars,
        compact_sidecars,
        read_sidecar,
        sync_sidecars,
    )

    base_dir = str(tmp_path / "base")
    sc_dir = str(tmp_path / "sc")
    _docs(spark, _BASE_ROWS).write.parquet(base_dir)
    build_sidecars(spark, base_dir, sc_dir, span_window=4)
    # simulate the compactor dying mid-swap: lock file left behind
    with open(_lock_path(sc_dir), "w") as fh:
        fh.write("pid=0\n")
    with pytest.raises(RuntimeError, match="maintenance lock"):
        read_sidecar(spark, sc_dir, "fp")
    with pytest.raises(RuntimeError, match="maintenance lock"):
        append_sidecars(
            spark, _docs(spark, _DELTA_ROWS), sc_dir, span_window=4
        )
    with pytest.raises(RuntimeError, match="maintenance lock"):
        sync_sidecars(spark, base_dir, sc_dir, span_window=4)
    with pytest.raises(RuntimeError, match="another compaction"):
        compact_sidecars(spark, sc_dir)
    # recovery: unlock (CLI form), then sync converges
    assert main(["sidecars", "unlock", "--dir", sc_dir]) == 0
    assert sync_sidecars(spark, base_dir, sc_dir, span_window=4) == 0
    assert read_sidecar(spark, sc_dir, "fp").count() == len(_BASE_ROWS)
    # a successful compaction releases its lock
    compact_sidecars(spark, sc_dir, files_per_table=1)
    assert not os.path.exists(_lock_path(sc_dir))


def test_compaction_trigger_fires_and_preserves_probes(spark, tmp_path):
    """The size-triggered policy (`maybe_compact_sidecars`, wired
    into curate_increment's batch top): below the threshold it
    no-ops; above it, compaction fires inside the admit call, file
    counts collapse, and the admit decision is IDENTICAL to the
    legacy reprojection path."""
    from etl_python_azure_spark.plans.sidecars import (
        append_sidecars,
        build_sidecars,
        maybe_compact_sidecars,
        sidecar_file_counts,
    )

    base_dir = str(tmp_path / "base")
    sc_dir = str(tmp_path / "sc")
    _docs(spark, _BASE_ROWS).write.parquet(base_dir)
    build_sidecars(spark, base_dir, sc_dir, span_window=4)
    # fragment: several tiny appends — file counts grow per append
    for i in range(3):
        _docs(
            spark,
            [(100 + i, "s1",
              f"filler document number {i} with enough words to span")],
        ).write.mode("append").parquet(base_dir)
        append_sidecars(
            spark,
            _docs(
                spark,
                [(100 + i, "s1",
                  f"filler document number {i} with enough words to span")],
            ),
            sc_dir,
            span_window=4,
        )
    frag = sidecar_file_counts(sc_dir)
    assert max(frag.values()) > 2
    # below threshold: no-op (file counts unchanged)
    assert maybe_compact_sidecars(
        spark, sc_dir, max_files_per_table=10_000
    ) is None
    assert sidecar_file_counts(sc_dir) == frag
    # curate_increment with a low threshold: the batch-top policy
    # fires, tables collapse to files_per_table, and the admitted
    # set still matches the legacy reprojection path exactly
    delta = _docs(spark, _DELTA_ROWS)
    legacy = _admit_ids(spark, base_dir, delta, span_window=4)
    from etl_python_azure_spark.plans.curation import curate_increment

    admitted = curate_increment(
        spark, base_dir, delta,
        quota_per_source=10, near_dup_threshold=0.5,
        span_window=4, sidecar_dir=sc_dir, compact_max_files=2,
    )
    got = sorted(r["doc_id"] for r in admitted.collect())
    spark.catalog.clearCache()
    assert got == legacy
    compacted = sidecar_file_counts(sc_dir)
    assert all(v <= 4 for v in compacted.values()), compacted


def test_fold_frame_survives_tempdir_cleanup(spark, sf_dir):
    """`_sidecar_admit_fold` (dedup_sidecar_equiv's body) returns its
    report WITHOUT a driver-side collect: every fold step is
    localCheckpointed, so the frame reads checkpoint blocks and must
    stay fully re-executable after the temp base/sidecar dirs are
    removed in the builder's finally — the driver collects AFTER the
    builder returns."""
    from etl_python_azure_spark.queries.round12 import (
        dedup_sidecar_equiv,
    )

    df = dedup_sidecar_equiv(spark, sf_dir)
    # two separate actions on the returned frame, both after cleanup
    n = df.count()
    rows = df.collect()
    assert n == len(rows) > 0
    assert {r["batch_idx"] for r in rows} == {0, 1, 2}


def test_cli_sidecars_roundtrip(spark, tmp_path, capsys):
    """The sidecars CLI: build → sync (no-op) → compact, one JSON
    line each."""
    import json

    from etl_python_azure_spark.cli import main

    base_dir = str(tmp_path / "base")
    sc_dir = str(tmp_path / "sc")
    _docs(spark, _BASE_ROWS).write.parquet(base_dir)
    assert main(["sidecars", "build", "--dir", sc_dir,
                 "--base", base_dir, "--span-window", "4"]) == 0
    assert main(["sidecars", "sync", "--dir", sc_dir,
                 "--base", base_dir, "--span-window", "4"]) == 0
    assert main(["sidecars", "compact", "--dir", sc_dir]) == 0
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert [o["sidecars"] for o in lines] == ["build", "sync", "compact"]
    assert lines[1]["repaired_docs"] == 0
    assert lines[2]["rows"]["fp"][1] == len(_BASE_ROWS)
