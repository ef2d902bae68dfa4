"""Pigeonhole chunk blocking ≡ brute-force SimHash pair search."""

from __future__ import annotations

from etl_python_azure_spark.operators.dedup import (
    simhash_chunk_pairs,
    simhash_pairs,
)
from etl_python_azure_spark.session import load_tables


def _pairs(df):
    return sorted((r["id_a"], r["id_b"], r["hamming"]) for r in df.collect())


def test_chunk_pairs_match_bruteforce(spark, sf_dir):
    d = load_tables(spark, sf_dir, "documents")
    for max_h in (1, 2):
        brute = simhash_pairs(d, "doc_id", "text", bits=32, max_hamming=max_h)
        chunked = simhash_chunk_pairs(
            d, "doc_id", "text", bits=32, max_hamming=max_h
        )
        assert _pairs(chunked) == _pairs(brute), max_h


def test_chunk_pairs_uneven_width(spark, sf_dir):
    # bits not divisible by n_chunks: 32 bits / 3 chunks -> 11,11,10
    d = load_tables(spark, sf_dir, "documents").limit(120)
    brute = simhash_pairs(d, "doc_id", "text", bits=32, max_hamming=2)
    chunked = simhash_chunk_pairs(d, "doc_id", "text", bits=32, max_hamming=2)
    assert _pairs(chunked) == _pairs(brute)
