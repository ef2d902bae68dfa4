"""Text-analysis queries over the `documents` table with DuckDB
oracles (language-ID, quality metrics, token counts, fingerprints).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.text import (
    STOPWORDS,
    doc_fingerprints,
    language_id,
    text_quality,
    token_counts,
)
from ..session import load_tables
from . import register

_STOPWORD_VALUES = ", ".join(
    f"('{w}', '{lang}')" for lang, ws in STOPWORDS.items() for w in ws
)


@register(
    "lang_id_guess",
    f"""
    WITH dim(token, lang) AS (VALUES {_STOPWORD_VALUES}),
    toks AS (
      SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    hits AS (
      SELECT t.doc_id, d.lang, COUNT(*) AS n_hits
      FROM toks t JOIN dim d USING (token)
      GROUP BY t.doc_id, d.lang
    ),
    best AS (
      SELECT doc_id, lang AS lang_guess, n_hits,
             ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY n_hits DESC, lang
             ) AS rn
      FROM hits
    )
    SELECT doc_id,
           COALESCE(b.lang_guess, 'und') AS lang_guess,
           COALESCE(b.n_hits, 0) AS n_hits
    FROM documents LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
      USING (doc_id)
    """,
)
def lang_id_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")
    return language_id(d)


_EN_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS["en"])


@register(
    "text_quality_scores",
    f"""
    WITH m AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(string_split(lower(text), ' ')) AS n_words,
             length(replace(lower(text), ' ', '')) AS n_nonspace,
             length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS n_alpha,
             length(text)
               - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
             len(list_filter(string_split(lower(text), ' '),
                             t -> list_contains([{_EN_STOP_LIST}], t)))
               AS n_stop
      FROM documents
    )
    SELECT doc_id,
           n_chars,
           n_words,
           n_nonspace * 1.0 / n_words AS avg_word_len,
           n_alpha * 1.0 / n_chars AS alpha_ratio,
           n_punct * 1.0 / n_chars AS punct_ratio,
           n_stop * 1.0 / n_words AS stopword_ratio,
           (n_words >= 20
            AND n_nonspace * 1.0 / n_words >= 2
            AND n_nonspace * 1.0 / n_words <= 12
            AND n_alpha * 1.0 / n_chars > 0.5) AS keep
    FROM m
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")
    return text_quality(d)


@register(
    "token_count_stats",
    """
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
             AS n_bpe_ish_tokens
    FROM documents
    """,
)
def token_count_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")
    return token_counts(d)


# --------------------------------------------------------------------------
# top distinctive terms per document — tf/df scoring.
# NB deliberately log-free: JVM Math.log and libm ln() differ in ulps
# (verified), so a true tf·log(N/df) score would break cross-engine
# exactness; tf/df ranks terms identically for a fixed corpus size
# and a single IEEE division is bit-identical everywhere.
# --------------------------------------------------------------------------
@register(
    "top_distinctive_terms",
    """
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             tf.tf * 1.0 / df.df AS score,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf * 1.0 / df.df DESC, tf.token
             ) AS rnk
      FROM tf JOIN df USING (token)
    )
    SELECT doc_id, token, tf, df, score, rnk
    FROM scored WHERE rnk <= 3
    """,
)
def top_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    d = load_tables(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(df, "token").withColumn(
        "score", F.col("tf") * 1.0 / F.col("df")
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("token"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "tf", "df", "score", "rnk")
    )


@register(
    "doc_fingerprints",
    """
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 3, 1))) AS u(i)
    )
    SELECT doc_id, MIN(md5(shingle)) AS fingerprint, COUNT(*) AS n_shingles
    FROM sh GROUP BY doc_id
    """,
)
def doc_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")
    return doc_fingerprints(d, n=5)


@register(
    "doc_repetition_stats",
    """
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents
    ),
    m AS (
      SELECT doc_id,
             len(words) AS n_tokens,
             len(list_distinct(words)) AS n_distinct_tokens,
             list_max(list_transform(list_distinct(words),
               t -> len(list_filter(words, x -> x = t)))) AS top_freq,
             CASE WHEN len(words) >= 2
                  THEN len(list_distinct(list_transform(range(1, len(words)),
                         i -> words[i] || ' ' || words[i + 1])))
                  ELSE 0 END AS nd_bi,
             greatest(len(words) - 1, 0) AS n_bi
      FROM w
    )
    SELECT doc_id, n_tokens, n_distinct_tokens,
           1.0 - CAST(n_distinct_tokens AS DOUBLE) / n_tokens
             AS dup_token_frac,
           CAST(top_freq AS DOUBLE) / n_tokens AS top_token_ratio,
           CASE WHEN n_bi > 0
                THEN 1.0 - CAST(nd_bi AS DOUBLE) / n_bi
                ELSE 0.0 END AS dup_bigram_frac
    FROM m
    """,
)
def doc_repetition_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import repetition_stats

    d = load_tables(spark, sf_dir, "documents")
    return repetition_stats(d)


# --------------------------------------------------------------------------
# PII scrubbing — the synthetic corpus is clean, so the query injects
# deterministic doc_id-derived PII (emails on ≡0 mod 3, phones mod 5,
# IPv4s mod 7) and then counts + redacts it: the match/replace
# machinery is exercised on real hits, with the whole round trip
# hash-checked against DuckDB's RE2 engine (patterns live in the
# RE2 ∩ Java dialect).
# --------------------------------------------------------------------------
_PII_E = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_P = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
_PII_I = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


@register(
    "pii_redaction_stats",
    f"""
    WITH inj AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0 THEN ' contact user'
                  || CAST(doc_id AS VARCHAR) || '@mail.example.com'
                ELSE '' END
             || CASE WHEN doc_id % 5 = 0 THEN ' call 555-000-'
                  || lpad(CAST(doc_id AS VARCHAR), 4, '0')
                ELSE '' END
             || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.'
                  || CAST(doc_id % 256 AS VARCHAR) || '.1'
                ELSE '' END AS t
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{_PII_E}')) AS n_email,
           len(regexp_extract_all(t, '{_PII_P}')) AS n_phone,
           len(regexp_extract_all(t, '{_PII_I}')) AS n_ipv4,
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '{_PII_E}', '<EMAIL>', 'g'),
               '{_PII_P}', '<PHONE>', 'g'),
             '{_PII_I}', '<IP>', 'g') AS redacted
    FROM inj
    """,
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.text import pii_stats, redact_pii

    d = load_tables(spark, sf_dir, "documents")
    inj = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@mail.example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" call 555-000-"),
                    F.lpad(F.col("doc_id").cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".1"),
                ),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    # counts + redaction in ONE projection over one scan (pii_stats
    # and redact_pii compose as column transforms, not a self-join)
    return redact_pii(
        pii_stats(inj, "doc_id", "t", carry_cols=["t"]), "t", "redacted"
    ).select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        "redacted",
    )


# --------------------------------------------------------------------------
# URL/domain analysis — same injection trick: every doc gets one
# https URL on a doc_id-derived domain (20 domains), docs ≡0 mod 4 a
# second http mirror link; extraction explodes (doc, domain) pairs
# and rolls them up per domain.
# --------------------------------------------------------------------------
@register(
    "domain_extraction_stats",
    """
    WITH inj AS (
      SELECT doc_id,
             text || ' see https://w' || CAST(doc_id % 20 AS VARCHAR)
                  || '.example.com/p/' || CAST(doc_id AS VARCHAR)
                  || CASE WHEN doc_id % 4 = 0
                       THEN ' and http://mirror.example.org/x'
                     ELSE '' END AS t
      FROM documents
    ),
    d AS (
      SELECT doc_id,
             UNNEST(regexp_extract_all(t, 'https?://([A-Za-z0-9.-]+)', 1))
               AS domain
      FROM inj
    )
    SELECT domain, COUNT(*) AS n_mentions,
           COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS first_doc
    FROM d GROUP BY domain
    """,
)
def domain_extraction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.text import url_domains

    d = load_tables(spark, sf_dir, "documents")
    inj = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://w"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit(".example.com/p/"),
            F.col("doc_id").cast("string"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit(" and http://mirror.example.org/x"),
            ).otherwise(F.lit("")),
        ).alias("t"),
    )
    return (
        url_domains(inj, "doc_id", "t")
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_mentions"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
    )
