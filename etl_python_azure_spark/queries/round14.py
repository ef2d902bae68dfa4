"""Round-14 registry surface.

- ``concat_chunk_packing_report`` — GPT-style concat-and-chunk training
  sequence packing, as a per-source placement report. The corpus is
  laid on one global token tape in doc_id order (BPE-ish tokens,
  one EOS separator per document) and cut every SEQ_LEN tokens; the
  report rolls up how many documents each source contributes, how
  much token mass, and how often a document is SPLIT across a
  sequence boundary — the metric packing policies tune seq_len
  against. The global running offset uses the two-phase bucketed
  prefix sum (`operators.prefix.distributed_prefix_sum`), never a
  single-partition window, so the layout step scales; the oracle
  replays the same cumsum with a plain window (DuckDB is
  single-node — there the global window IS the right plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from . import register
from .round11 import _TOK_SQL

_SPK_LEN = 512  # sequence length in tokens (bench-scale: plenty of cuts)


@register(
    "concat_chunk_packing_report",
    f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len({_TOK_SQL}) AS BIGINT) AS nt
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, nt,
             COALESCE(SUM(nt + 1) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS st
      FROM t
    ),
    p AS (
      SELECT source, nt,
             st // {_SPK_LEN} AS s0,
             CASE WHEN nt > 0 THEN (st + nt - 1) // {_SPK_LEN}
                  ELSE st // {_SPK_LEN} END AS s1
      FROM c
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN s1 > s0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_split_docs,
           CAST(MAX(s1 - s0 + 1) AS BIGINT) AS max_seqs_spanned,
           CAST(SUM(CASE WHEN s1 > s0 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS split_frac
    FROM p GROUP BY source
    """,
)
def concat_chunk_packing_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source training-sequence packing placement (see module
    docstring). seq_len={_SPK_LEN}, one separator token per doc —
    the concat-and-chunk convention where documents DO cross
    sequence boundaries (padding-free packing)."""
    from ..operators.text import pack_sequences

    d = load_tables(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    placed = pack_sequences(
        d, "doc_id", "text", seq_len=_SPK_LEN, sep_tokens=1
    )
    per_doc = placed.join(d.select("doc_id", "source"), "doc_id")
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum(F.col("is_split").cast("long")).cast("long").alias("n_split_docs"),
        F.max("n_seqs_spanned").cast("long").alias("max_seqs_spanned"),
        (
            F.sum(F.col("is_split").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("split_frac"),
    )
