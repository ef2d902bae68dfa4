"""Properties of the round-4j cross-source corpus-health queries."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_python_azure_spark.queries.round4j import dup_health_report


def _corpus(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )


def test_dup_health_hand_counts(spark):
    # s1: t0 twice within-source; t1 shared with s2 (cross-source);
    # s2: t1 once, t2 unique
    rows = [
        (1, "s1", "t0"),
        (2, "s1", "t0"),
        (3, "s1", "t1"),
        (4, "s2", "t1"),
        (5, "s2", "t2"),
    ]
    got = {
        r["source"]: r.asDict()
        for r in dup_health_report(_corpus(spark, rows)).collect()
    }
    assert got["s1"]["n_docs"] == 3
    assert got["s1"]["n_within_dup_docs"] == 2  # the two t0 copies
    assert got["s1"]["n_cross_source_docs"] == 1  # t1
    assert got["s2"]["n_docs"] == 2
    assert got["s2"]["n_within_dup_docs"] == 0
    assert got["s2"]["n_cross_source_docs"] == 1
    assert got["s1"]["within_dup_rate"] == 2 / 3


def test_dup_health_invariant_under_doc_id_permutation(spark):
    """r04 verdict item 8: the per-source rates are a pure function
    of (source, content-fingerprint) multisets — reassigning doc_ids
    arbitrarily (a re-ingest that renumbers the corpus) must yield
    the identical report, exercising the md5-fingerprint path's
    independence from row identity."""
    rng = random.Random(7)
    texts = [f"body-{i % 17}" for i in range(120)]  # forced dup mass
    rows = [
        (i, f"s{rng.randrange(4)}", texts[rng.randrange(len(texts))])
        for i in range(120)
    ]
    base = dup_health_report(_corpus(spark, rows)).orderBy("source")

    perm = list(range(1000, 1120))
    rng.shuffle(perm)
    permuted_rows = [
        (perm[i], s, t) for i, (_, s, t) in enumerate(rows)
    ]
    permuted = dup_health_report(
        _corpus(spark, permuted_rows)
    ).orderBy("source")

    assert [r.asDict() for r in base.collect()] == [
        r.asDict() for r in permuted.collect()
    ]


def test_dup_health_registered_query_matches_helper(spark, sf_dir):
    """The registered query is exactly the helper over the parquet
    documents table (guards against the two drifting apart)."""
    from etl_python_azure_spark.queries import registry
    from etl_python_azure_spark.session import load_tables

    via_query = (
        registry()["source_dup_health"].builder(spark, sf_dir)
        .orderBy("source")
        .collect()
    )
    via_helper = (
        dup_health_report(load_tables(spark, sf_dir, "documents"))
        .orderBy("source")
        .collect()
    )
    assert via_query == via_helper
