"""Shared DuckDB-dialect fragments for the span-dedup oracle family.

The positions → (ownership|duplication|reference) flags → merged
islands → coverage recipe appears across the whitespace-token stack
(round10: ``merged_span_coverage``, ``benchmark_span_contamination``,
``source_contamination_rollup``; round11b: ``span_removal_rewrite``,
``dup_span_mask_manifest``) and the trainer-view token stack
(round11: ``token_*``). Before r12 every oracle inlined its own copy
of the islands/ownership CTEs; a threshold or owner-policy change
had to land in six places. These builders are that single place —
each returns CTE text IDENTICAL to the fragments it replaced (the
refactor is provably semantics-preserving), composed by the callers
with plain string concatenation inside one ``WITH`` chain.

Conventions the fragments assume (the family's shared contract):

- span rows carry ``(doc_id, pos, e)`` — 1-based token positions,
  inclusive interval end — in a CTE the caller names;
- fingerprints are md5 of the space-joined token slice, so tokens
  must never contain spaces (both alphabets guarantee that);
- islands merge per ``doc_id`` via gaps-and-islands over ``pos``
  with the running ``MAX(e)`` horizon.

Spark twins: ``operators.dedup._span_positions`` /
``_merged_islands`` / ``_flagged_islands`` / ``_owner_flagged_spans``.
"""

from __future__ import annotations


def numbered_islands(src: str) -> str:
    """``isl`` + ``isl2``: number merged intervals per doc — a new
    island starts where ``pos`` clears the running MAX(e) horizon of
    every earlier span (gaps-and-islands). *src* is the flagged-span
    CTE name, with (doc_id, pos, e) rows."""
    return f"""
    isl AS (
      SELECT doc_id, pos, e,
             CASE WHEN pos > COALESCE(MAX(e) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
             THEN 1 ELSE 0 END AS ni
      FROM {src}
    ),
    isl2 AS (
      SELECT doc_id, pos, e,
             SUM(ni) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS island
      FROM isl
    )"""


def coverage_agg(n_spans_alias: str | None) -> str:
    """``cov`` + ``agg`` over ``isl2``: exact union length per doc
    (sum of island extents), plus the flagged-span count under
    *n_spans_alias* when given (None → covered tokens only, the
    rollup grain)."""
    if n_spans_alias is None:
        return """
    cov AS (
      SELECT doc_id, island, MAX(e) - MIN(pos) + 1 AS covered
      FROM isl2 GROUP BY 1, 2
    ),
    agg AS (
      SELECT doc_id, SUM(covered) AS covered_tokens FROM cov
      GROUP BY doc_id
    )"""
    return f"""
    cov AS (
      SELECT doc_id, island,
             MAX(e) - MIN(pos) + 1 AS covered,
             COUNT(*) AS n_spans
      FROM isl2 GROUP BY 1, 2
    ),
    agg AS (
      SELECT doc_id, SUM(covered) AS covered_tokens,
             SUM(n_spans) AS {n_spans_alias}
      FROM cov GROUP BY doc_id
    )"""


def ownership_flagged(src: str = "sp") -> str:
    """``own`` + ``flg``: the Lee-et-al owner policy — every
    fingerprint held by ≥2 docs keeps its global min-id holder as
    the canonical copy; every OTHER holder's span is flagged. *src*
    must carry (doc_id, pos, e, fp)."""
    return f"""
    own AS (
      SELECT fp, MIN(doc_id) AS owner
      FROM {src} GROUP BY fp HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    flg AS (
      SELECT s.doc_id, s.pos, s.e
      FROM {src} s JOIN own o USING (fp)
      WHERE s.doc_id != o.owner
    )"""
