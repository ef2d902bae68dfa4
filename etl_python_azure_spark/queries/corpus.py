"""Corpus-construction queries: deterministic splits, vocabulary,
sequence packing — the steps between "clean documents" and "training
batches"."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.sampling import deterministic_sample, hash_split
from ..session import load_tables
from . import register

_BUCKET_SQL = (
    "CAST(from_hex(substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIT::UBIGINT"
    " AS BIGINT)"
)


@register(
    "deterministic_split_counts",
    f"""
    WITH b AS (
      SELECT doc_id,
             {_BUCKET_SQL} % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc
    FROM b GROUP BY 1
    """,
)
def deterministic_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")
    splits = hash_split(d, "doc_id", {"train": 90, "val": 5, "test": 5})
    parts = [
        df.groupBy(F.lit(name).alias("split")).agg(
            F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc")
        )
        for name, df in splits.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "stable_sample_docs",
    f"""
    WITH b AS (
      SELECT doc_id, lang, n_chars,
             {_BUCKET_SQL} % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, lang, n_chars FROM b WHERE bucket < 10
    """,
)
def stable_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")
    return deterministic_sample(d, "doc_id", 10).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "vocabulary_top200",
    """
    SELECT token, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS doc_freq
    FROM (
      SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS token
      FROM documents
    )
    GROUP BY token
    ORDER BY freq DESC, token
    LIMIT 200
    """,
)
def vocabulary_top200(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("token"),
        )
        .groupBy("token")
        .agg(
            F.count("*").alias("freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(200)
    )


@register(
    "sequence_packing",
    """
    WITH t AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tokens,
             SUM(len(string_split(text, ' '))) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING
             ) AS cum_before
      FROM documents
    )
    SELECT doc_id, n_tokens,
           COALESCE(cum_before, 0) // 2048 AS bin_id
    FROM t
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous token-budget packing: docs in doc_id order are
    assigned to 2048-token bins by cumulative count — the
    deterministic, shuffle-light approximation of first-fit packing
    used to batch training sequences (bins overfill by at most one
    document; exact first-fit needs per-bin state and buys little).
    """
    d = load_tables(spark, sf_dir, "documents")
    w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    n_tokens = F.size(F.split("text", " "))
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.floor(
            F.coalesce(F.sum(n_tokens).over(w), F.lit(0)) / 2048
        ).alias("bin_id"),
    )
