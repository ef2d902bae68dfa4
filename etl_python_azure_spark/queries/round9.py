"""Round-9 registry surface: the URL/domain-tier and exact-substring
dedup families — the two major public near-dedup families previously
absent (r08 verdict item 8 names them explicitly) — plus DSIR
importance-resampling scores, the hashed-n-gram data-selection
method.

- URL-normalized keep-one dedup with a domain-tier health rollup
  (the CCNet / RefinedWeb web-corpus first pass: canonicalize the
  URL, keep one doc per canonical URL, report duplication per
  domain — the tier crawl quotas and per-site policies key on)
- cross-document duplicated-span report (the windowed form of
  suffix-array substring dedup, Lee et al. 2021: spans of ≥W tokens
  seen in ≥2 documents are duplicated training text; a repeat of
  length L ≥ W contains L−W+1 duplicated windows, so the fixed
  window catches every long repeat)
- DSIR importance scores (Xie et al. 2023: bag-of-hashed-ngram
  models for a target distribution vs the raw pool; per-doc
  log-likelihood ratio is the selection key)

All are single-hash-aggregate shapes (no pair space, no iteration):
the URL tier shuffles (canonical-url, id) pairs, the span tier
shuffles md5 span fingerprints, the DSIR model collapses to ≤1024
broadcast rows — linear in corpus size at 100 TB.

The documents table has no URL column, so the URL query injects one
deterministically from ``doc_id`` (the established
``domain_extraction_stats`` trick, queries/text.py:304): scheme /
``www.`` / trailing-slash / query-string variants that all collapse
to one canonical URL per ``doc_id % 100``, across 25 domains.

Determinism: md5 fingerprints (identical both engines), anchored
regexps (replace-all vs replace-first agree), integer counts cast
to BIGINT in the oracle (DuckDB integer SUM returns HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from . import register

# --------------------------------------------------------------------------
# URL / domain-tier dedup health.
# --------------------------------------------------------------------------

_URL_ORACLE = """
    WITH inj AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
             || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
             || 'h' || CAST(doc_id % 25 AS VARCHAR) || '.example.com/p/'
             || CAST(doc_id % 100 AS VARCHAR)
             || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
             || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed'
                 ELSE '' END) AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               lower(url), '^https?://', ''), '[?#].*$', ''),
               '^www\\.', ''), '/$', '') AS u
      FROM inj
    ),
    per_url AS (
      SELECT u, MIN(doc_id) AS keeper_id, COUNT(*) AS n_docs_url
      FROM canon GROUP BY u
    )
    SELECT regexp_extract(u, '^([^/]+)', 1) AS domain,
           CAST(SUM(n_docs_url) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(SUM(n_docs_url) - COUNT(*) AS BIGINT) AS n_dup_docs,
           (CAST(SUM(n_docs_url) AS DOUBLE) - CAST(COUNT(*) AS DOUBLE))
             / CAST(SUM(n_docs_url) AS DOUBLE) AS dup_rate,
           MIN(keeper_id) AS first_keeper
    FROM per_url GROUP BY 1
    """


@register("url_domain_dedup_health", _URL_ORACLE)
def url_domain_dedup_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-tier URL dedup health over deterministically injected
    URLs: scheme (http/https), ``www.``, trailing-slash and
    query-string variants all canonicalize to one URL per
    ``doc_id % 100``, so :func:`..operators.dedup.url_dedup_health`
    visibly collapses 5× duplication into per-domain keep-one
    reports. One hash-aggregate on the canonical URL — the
    ``exact_dedup`` scale shape keyed by URL."""
    from ..operators.dedup import url_dedup_health

    d = load_tables(spark, sf_dir, "documents")
    inj = d.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 2 == 0, F.lit("https://")).otherwise(
                F.lit("http://")
            ),
            F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(
                F.lit("")
            ),
            F.lit("h"),
            (F.col("doc_id") % 25).cast("string"),
            F.lit(".example.com/p/"),
            (F.col("doc_id") % 100).cast("string"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") % 4 == 0, F.lit("?utm_source=feed")
            ).otherwise(F.lit("")),
        ).alias("url"),
    )
    return url_dedup_health(inj, "doc_id", "url")


# --------------------------------------------------------------------------
# Cross-document duplicated spans (windowed substring dedup).
# --------------------------------------------------------------------------

_SPAN_W = 8
_SPAN_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(t[i:i+{_SPAN_W - 1}], ' ')) AS fp
      FROM toks,
           UNNEST(range(1, greatest(len(t) - {_SPAN_W - 2}, 1))) AS u(i)
    ),
    cnt AS (SELECT fp, COUNT(*) AS n_docs FROM sh GROUP BY fp)
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_spans,
           CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_span_rate
    FROM sh s JOIN cnt c USING (fp)
    GROUP BY s.doc_id
    """


@register("cross_doc_dup_spans", _SPAN_ORACLE)
def cross_doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span report at W=8 tokens — the
    windowed substring-dedup signal
    (:func:`..operators.dedup.cross_doc_span_stats`): which fraction
    of each document's distinct 8-token spans appears in at least
    one OTHER document. The synthetic corpus carries injected
    near-duplicates, so ~10% of docs report nonzero shared-span
    mass; everything else sits at 0 (random word salad collides
    nowhere at W=8)."""
    from ..operators.dedup import cross_doc_span_stats

    d = load_tables(spark, sf_dir, "documents")
    return cross_doc_span_stats(d, "doc_id", "text", window=_SPAN_W)


# --------------------------------------------------------------------------
# DSIR importance scores (hashed n-gram importance resampling).
# --------------------------------------------------------------------------

_DSIR_B = 1024
_DSIR_ORACLE = f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(lower(text), ' ') AS t
      FROM documents
    ),
    feats AS (
      SELECT doc_id, lang, f FROM toks, UNNEST(t) AS u(f)
      UNION ALL
      SELECT doc_id, lang, array_to_string(t[i:i+1], ' ') AS f
      FROM toks, UNNEST(range(1, greatest(len(t), 1))) AS u(i)
    ),
    fb AS (
      SELECT doc_id, lang,
             CAST(from_hex(substr(md5(f), 1, 8))::BIT::UBIGINT AS BIGINT)
               % {_DSIR_B} AS b
      FROM feats
    ),
    rc AS (SELECT b, COUNT(*) AS cr FROM fb GROUP BY b),
    tc AS (SELECT b, COUNT(*) AS ct FROM fb WHERE lang = 'en' GROUP BY b),
    tot AS (
      SELECT (SELECT COUNT(*) FROM fb) AS rtot,
             (SELECT COUNT(*) FROM fb WHERE lang = 'en') AS ttot
    ),
    model AS (
      SELECT rc.b,
             CAST(floor(ln(
               CAST(COALESCE(tc.ct, 0) + 1 AS DOUBLE)
               / CAST(tot.ttot + {_DSIR_B} AS DOUBLE)) * 1e8) AS BIGINT)
           - CAST(floor(ln(
               CAST(rc.cr + 1 AS DOUBLE)
               / CAST(tot.rtot + {_DSIR_B} AS DOUBLE)) * 1e8) AS BIGINT)
             AS lam
      FROM rc LEFT JOIN tc USING (b) CROSS JOIN tot
    )
    SELECT f.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_features,
           CAST(SUM(m.lam) AS DOUBLE) / 1e8 AS importance_score,
           CAST(CASE WHEN SUM(m.lam) > 0 THEN 1 ELSE 0 END AS BIGINT)
             AS target_like
    FROM fb f JOIN model m ON m.b = f.b
    GROUP BY f.doc_id
    """


@register("dsir_importance_scores", _DSIR_ORACLE)
def dsir_importance_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023) with the English
    subcorpus as the target distribution: hashed uni+bigram models
    for target and raw, per-doc add-one-smoothed log-likelihood
    ratio, positive score = more English-like than pool-like. The
    'training' is two <=1024-row hash-aggregates and the model is a
    broadcast join — the cheapest selection signal in the curation
    family (:func:`..operators.sampling.dsir_importance_scores`).
    The ln quantization follows the BM25-idf fixed-point recipe, so
    the oracle replays the BIGINT score sum exactly."""
    from ..operators.sampling import dsir_importance_scores

    d = load_tables(spark, sf_dir, "documents")
    return dsir_importance_scores(
        d, d.filter(F.col("lang") == "en"), "doc_id", "text",
        buckets=_DSIR_B,
    )
