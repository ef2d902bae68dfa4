"""AllPairs prefix filtering ≡ brute-force n-gram Jaccard join,
with a genuinely smaller candidate set."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_python_azure_spark.operators.dedup import (
    ngram_jaccard_pairs,
    prefix_filter_jaccard_pairs,
    word_shingles,
)
from etl_python_azure_spark.session import load_tables


def _pairs(df):
    return sorted(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect()
    )


def test_prefix_filter_lossless(spark, sf_dir):
    d = load_tables(spark, sf_dir, "documents")
    for t in (0.8, 0.5):
        brute = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=t)
        fast = prefix_filter_jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=t
        )
        assert _pairs(fast) == _pairs(brute), t


def test_prefix_filter_shrinks_candidates(spark, sf_dir):
    d = load_tables(spark, sf_dir, "documents")
    sh = word_shingles(d, "doc_id", "text", 3)
    brute_cand = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    freq = sh.groupBy("shingle").agg(F.count("*").alias("__freq"))
    ranked = (
        sh.join(freq, "shingle")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("__freq", "shingle")
            ),
        )
        .withColumn("__sz", F.count("*").over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.filter(
        F.col("__rn") <= F.col("__sz") - F.ceil(0.8 * F.col("__sz")) + 1
    )
    pref_cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(
            F.least(F.col("a.__sz"), F.col("b.__sz"))
            >= 0.8 * F.greatest(F.col("a.__sz"), F.col("b.__sz"))
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    # the whole point: candidates from prefixes ≪ co-shingled pairs
    assert pref_cand < brute_cand / 5
