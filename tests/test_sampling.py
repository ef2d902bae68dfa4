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
