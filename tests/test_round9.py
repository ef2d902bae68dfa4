"""Round-9 surface: URL/domain-tier dedup and cross-document
duplicated-span (windowed substring-dedup) operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------- URL normalization
def test_normalize_url_collapses_variants(spark):
    from etl_python_azure_spark.operators.dedup import normalize_url

    variants = [
        "https://example.com/a",
        "http://example.com/a",
        "https://www.example.com/a",
        "HTTPS://EXAMPLE.COM/A",
        "https://example.com/a/",
        "https://example.com/a?utm_source=feed",
        "https://example.com/a#frag",
        "https://www.example.com/a/?q=1#frag",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    out = {
        r.u
        for r in df.select(normalize_url(F.col("url")).alias("u")).collect()
    }
    assert out == {"example.com/a"}


def test_normalize_url_keeps_distinct_paths_distinct(spark):
    from etl_python_azure_spark.operators.dedup import normalize_url

    df = spark.createDataFrame(
        [("https://example.com/a",), ("https://example.com/b",),
         ("https://other.com/a",), ("no-scheme.com/a",)],
        "url string",
    )
    out = {
        r.u
        for r in df.select(normalize_url(F.col("url")).alias("u")).collect()
    }
    assert out == {"example.com/a", "example.com/b", "other.com/a",
                   "no-scheme.com/a"}


def test_normalize_url_strips_www_only_as_prefix(spark):
    from etl_python_azure_spark.operators.dedup import normalize_url

    df = spark.createDataFrame(
        [("https://www.www-corp.com/x",), ("https://sub.www.com/x",)],
        "url string",
    )
    out = sorted(
        r.u
        for r in df.select(normalize_url(F.col("url")).alias("u")).collect()
    )
    # leading www. goes; interior 'www' substrings stay
    assert out == ["sub.www.com/x", "www-corp.com/x"]


# ------------------------------------------------- URL dedup health
def test_url_dedup_health_counts(spark):
    from etl_python_azure_spark.operators.dedup import url_dedup_health

    rows = [
        (0, "https://a.com/x"),
        (1, "http://www.a.com/x/"),       # same canonical as 0
        (2, "https://a.com/x?utm=1"),     # same canonical as 0
        (3, "https://a.com/y"),           # distinct URL, same domain
        (4, "https://b.com/z"),           # other domain, unique
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.domain: r for r in url_dedup_health(df, "doc_id", "url").collect()}
    a = out["a.com"]
    assert (a.n_docs, a.n_urls, a.n_dup_docs) == (4, 2, 2)
    assert a.dup_rate == pytest.approx(0.5)
    assert a.first_keeper == 0
    b = out["b.com"]
    assert (b.n_docs, b.n_urls, b.n_dup_docs) == (1, 1, 0)
    assert b.dup_rate == 0.0


def test_url_dedup_health_keeper_is_min_id(spark):
    from etl_python_azure_spark.operators.dedup import url_dedup_health

    df = spark.createDataFrame(
        [(9, "https://a.com/x"), (3, "http://a.com/x"),
         (7, "https://a.com/x/")],
        "doc_id long, url string",
    )
    out = url_dedup_health(df, "doc_id", "url").collect()
    assert len(out) == 1 and out[0].first_keeper == 3


# ------------------------------------------- cross-doc span stats
def test_cross_doc_span_stats_flags_shared_span(spark):
    from etl_python_azure_spark.operators.dedup import cross_doc_span_stats

    shared = "one two three four five six seven eight"  # 8 tokens
    rows = [
        (0, shared + " tail0 a b"),
        (1, "head1 x y " + shared),
        (2, "p q r s t u v w unrelated words entirely here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           cross_doc_span_stats(df, "doc_id", "text", window=8).collect()}
    # docs 0 and 1 share exactly the one 8-token window
    assert out[0].n_dup_spans == 1 and out[1].n_dup_spans == 1
    assert out[0].dup_span_rate == pytest.approx(1 / out[0].n_spans)
    assert out[2].n_dup_spans == 0 and out[2].dup_span_rate == 0.0
    # window counts: len(tokens) - 7 windows per doc (all distinct
    # here; both docs are 11 tokens)
    assert out[0].n_spans == 4 and out[1].n_spans == 4


def test_cross_doc_span_stats_short_docs_yield_no_row(spark):
    from etl_python_azure_spark.operators.dedup import cross_doc_span_stats

    df = spark.createDataFrame(
        [(0, "only five words in here"),
         (1, "a b c d e f g h i")],
        "doc_id long, text string",
    )
    out = cross_doc_span_stats(df, "doc_id", "text", window=8).collect()
    assert {r.doc_id for r in out} == {1}


def test_cross_doc_span_stats_within_doc_repeat_not_cross(spark):
    """A span repeated INSIDE one document is not cross-doc
    duplication — distinct per-doc spans see n_docs == 1."""
    from etl_python_azure_spark.operators.dedup import cross_doc_span_stats

    rep = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(0, rep + " " + rep)], "doc_id long, text string"
    )
    out = cross_doc_span_stats(df, "doc_id", "text", window=8).collect()
    assert len(out) == 1 and out[0].n_dup_spans == 0


def test_round9_queries_registered_with_oracles():
    from etl_python_azure_spark.queries import registry

    reg = registry()
    for name in ("url_domain_dedup_health", "cross_doc_dup_spans"):
        assert name in reg and reg[name].oracle is not None


# ------------------------------------------- semdedup K parity
def test_semdedup_k_python_sql_parity():
    """The Spark builder derives the SemDeDup cell count in Python
    (_SEMDEDUP_K) and the oracle derives it in SQL (_SEMDEDUP_K_SQL,
    a scalar-subquery LIMIT); the Lloyd replay is only bit-identical
    if both sides train the same number of cells, so pin the
    arithmetic across the sizes that matter (stratum sizes, the
    test-sf corpus counts, perfect squares, off-by-one edges)."""
    import duckdb

    from etl_python_azure_spark.queries.similarity import (
        _SEMDEDUP_K,
        _SEMDEDUP_K_SQL,
    )

    con = duckdb.connect()
    for n in (1, 15, 16, 255, 256, 257, 499, 500, 600, 2000, 2001,
              20000, 24_999, 25_000, 25_001, 10**6, 10**6 + 1):
        con.execute(
            "CREATE OR REPLACE VIEW embeddings AS "
            f"SELECT * FROM range({n})"
        )
        sql_k = con.execute(f"SELECT {_SEMDEDUP_K_SQL}").fetchone()[0]
        assert sql_k == _SEMDEDUP_K(n), (n, sql_k, _SEMDEDUP_K(n))
