"""Hash-based sampling/split properties: disjoint, covering, stable."""

from __future__ import annotations

from etl_python_azure_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
)
from etl_python_azure_spark.session import load_tables


def test_hash_split_partitions_everything(spark, sf_dir):
    d = load_tables(spark, sf_dir, "documents")
    splits = hash_split(d, "doc_id", {"train": 90, "val": 5, "test": 5})
    counts = {k: v.count() for k, v in splits.items()}
    assert sum(counts.values()) == d.count()  # covering
    ids = [set(r.doc_id for r in v.select("doc_id").collect()) for v in splits.values()]
    assert not (ids[0] & ids[1]) and not (ids[0] & ids[2]) and not (ids[1] & ids[2])
    # roughly proportional (tolerant: small n)
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_sample_stable_under_repartition(spark, sf_dir):
    d = load_tables(spark, sf_dir, "documents")
    s1 = {r.doc_id for r in deterministic_sample(d, "doc_id", 10).collect()}
    s2 = {
        r.doc_id
        for r in deterministic_sample(d.repartition(17), "doc_id", 10).collect()
    }
    assert s1 == s2 and 0 < len(s1) < d.count()


def test_weighted_sample_stable_and_weight_sensitive(spark, sf_dir):
    from etl_python_azure_spark.operators.sampling import weighted_sample

    d = load_tables(spark, sf_dir, "documents").select("doc_id", "n_chars")
    s1 = {r.doc_id for r in weighted_sample(d, "doc_id", "n_chars", 50).collect()}
    s2 = {
        r.doc_id
        for r in weighted_sample(
            d.repartition(13), "doc_id", "n_chars", 50
        ).collect()
    }
    assert s1 == s2 and len(s1) == 50  # deterministic, partition-invariant

    # sampled docs skew long: mean length above the corpus mean
    from pyspark.sql import functions as F

    corpus_mean = d.agg(F.avg("n_chars")).first()[0]
    sample_mean = (
        weighted_sample(d, "doc_id", "n_chars", 50)
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert sample_mean > corpus_mean
