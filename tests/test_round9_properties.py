"""Differential properties for the round-9 dedup operators: each
checked against an independent brute-force Python implementation on
randomized (seeded) inputs — the same oracle discipline as the
DuckDB gate, but engine-free."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _py_normalize(u: str) -> str:
    import re

    u = u.lower()
    u = re.sub(r"^https?://", "", u)
    u = re.sub(r"[?#].*$", "", u)
    u = re.sub(r"^www\.", "", u)
    u = re.sub(r"/$", "", u)
    return u


def _random_urls(rng: random.Random, n: int) -> list[str]:
    out = []
    for _ in range(n):
        scheme = rng.choice(["https://", "http://", ""])
        www = rng.choice(["www.", ""])
        host = f"h{rng.randrange(6)}.site{rng.randrange(3)}.org"
        path = "/".join(
            f"p{rng.randrange(4)}" for _ in range(rng.randrange(1, 3))
        )
        slash = rng.choice(["/", ""])
        q = rng.choice(["", "?a=1", "?utm=x&b=2", "#frag", "?a=1#f"])
        out.append(f"{scheme}{www}{host}/{path}{slash}{q}")
    return out


def test_normalize_url_matches_python_reference(spark):
    from etl_python_azure_spark.operators.dedup import normalize_url

    rng = random.Random(11)
    urls = _random_urls(rng, 300)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r.u
        for r in df.select(normalize_url(F.col("url")).alias("u"))
        .orderBy("url")
        .collect()
    ]
    want = [_py_normalize(u) for u in sorted(urls)]
    assert got == want


def test_normalize_url_is_idempotent(spark):
    """Canonicalization must be a fixed point — normalizing an
    already-canonical URL changes nothing (otherwise two passes over
    the same corpus key differently)."""
    from etl_python_azure_spark.operators.dedup import normalize_url

    rng = random.Random(12)
    urls = _random_urls(rng, 200)
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    twice = df.select(
        normalize_url(F.col("url")).alias("once")
    ).select(
        "once", normalize_url(F.col("once")).alias("twice")
    )
    assert twice.filter(F.col("once") != F.col("twice")).count() == 0


def test_url_dedup_health_matches_bruteforce(spark):
    from collections import defaultdict

    from etl_python_azure_spark.operators.dedup import url_dedup_health

    rng = random.Random(13)
    urls = _random_urls(rng, 250)
    rows = list(enumerate(urls))
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.domain: r for r in url_dedup_health(df, "doc_id", "url").collect()}

    per_url: dict[str, list[int]] = defaultdict(list)
    for i, u in rows:
        per_url[_py_normalize(u)].append(i)
    per_domain: dict[str, list[str]] = defaultdict(list)
    for u in per_url:
        per_domain[u.split("/", 1)[0]].append(u)
    assert set(got) == set(per_domain)
    for dom, us in per_domain.items():
        n_docs = sum(len(per_url[u]) for u in us)
        n_urls = len(us)
        r = got[dom]
        assert (r.n_docs, r.n_urls, r.n_dup_docs) == (
            n_docs, n_urls, n_docs - n_urls,
        )
        assert r.dup_rate == pytest.approx((n_docs - n_urls) / n_docs)
        assert r.first_keeper == min(min(per_url[u]) for u in us)


def test_cross_doc_span_stats_matches_bruteforce(spark):
    from collections import Counter

    from etl_python_azure_spark.operators.dedup import cross_doc_span_stats

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab → real collisions
    W = 4
    docs = []
    for i in range(40):
        n = rng.randrange(2, 20)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in cross_doc_span_stats(df, "doc_id", "text", window=W)
        .collect()
    }

    spans_per_doc = {
        i: {
            " ".join(toks[j : j + W])
            for j in range(len(toks) - W + 1)
        }
        for i, t in docs
        for toks in [t.lower().split(" ")]
        if len(toks) >= W
    }
    span_docs = Counter()
    for spans in spans_per_doc.values():
        span_docs.update(spans)
    assert set(got) == set(spans_per_doc)
    for i, spans in spans_per_doc.items():
        n_dup = sum(1 for s in spans if span_docs[s] >= 2)
        r = got[i]
        assert (r.n_spans, r.n_dup_spans) == (len(spans), n_dup)
        assert r.dup_span_rate == pytest.approx(n_dup / len(spans))


def test_cross_doc_span_stats_duplicated_doc_fully_flagged(spark):
    """Appending an exact copy of a document makes EVERY span of
    both copies duplicated — the Lee et al. guarantee the windowed
    form inherits for repeats >= window length."""
    from etl_python_azure_spark.operators.dedup import cross_doc_span_stats

    rng = random.Random(19)
    vocab = [f"t{i}" for i in range(50)]
    text = " ".join(rng.choice(vocab) for _ in range(30))
    df = spark.createDataFrame(
        [(0, text), (1, text)], "doc_id long, text string"
    )
    out = cross_doc_span_stats(df, "doc_id", "text", window=8).collect()
    assert len(out) == 2
    for r in out:
        assert r.n_dup_spans == r.n_spans and r.dup_span_rate == 1.0


# ------------------------------------------------- DSIR importance
def test_dsir_importance_matches_bruteforce(spark):
    """Score must equal a direct Python computation: hashed
    uni+bigram bag counts, add-one smoothing over B buckets,
    per-ln 1e-8 floor quantization, exact integer sum."""
    import hashlib
    import math
    from collections import Counter

    from etl_python_azure_spark.operators.sampling import (
        dsir_importance_scores,
    )

    B = 64
    rng = random.Random(23)
    vocab = [f"v{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 15))))
        for i in range(60)
    ]
    target_ids = {i for i, _ in docs if i % 3 == 0}
    df = spark.createDataFrame(docs, "doc_id long, text string")
    tgt = df.filter(F.col("doc_id") % 3 == 0)
    got = {
        r.doc_id: r
        for r in dsir_importance_scores(
            df, tgt, "doc_id", "text", buckets=B
        ).collect()
    }

    def feats(text):
        t = text.lower().split(" ")
        return t + [" ".join(t[j : j + 2]) for j in range(len(t) - 1)]

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % B

    raw_c, tgt_c = Counter(), Counter()
    per_doc = {}
    for i, text in docs:
        bs = [bucket(f) for f in feats(text)]
        per_doc[i] = bs
        raw_c.update(bs)
        if i in target_ids:
            tgt_c.update(bs)
    rtot, ttot = sum(raw_c.values()), sum(tgt_c.values())
    lam = {
        b: math.floor(math.log((tgt_c[b] + 1) / (ttot + B)) * 1e8)
        - math.floor(math.log((raw_c[b] + 1) / (rtot + B)) * 1e8)
        for b in raw_c
    }
    for i, bs in per_doc.items():
        sq = sum(lam[b] for b in bs)
        r = got[i]
        assert r.n_features == len(bs)
        assert r.importance_score == pytest.approx(sq / 1e8, abs=0)
        assert r.target_like == (1 if sq > 0 else 0)


def test_dsir_target_docs_score_higher_on_disjoint_vocab(spark):
    """With disjoint target/raw vocabularies the ratio model must
    rank every target-vocabulary doc above every raw-only doc, and
    only the former as target_like."""
    from etl_python_azure_spark.operators.sampling import (
        dsir_importance_scores,
    )

    docs = [(i, "alpha beta gamma delta epsilon") for i in range(5)] + [
        (i, "zero one two three four") for i in range(5, 10)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    tgt = df.filter(F.col("doc_id") < 5)
    out = {
        r.doc_id: r
        for r in dsir_importance_scores(
            df, tgt, "doc_id", "text", buckets=512
        ).collect()
    }
    t_scores = [out[i].importance_score for i in range(5)]
    r_scores = [out[i].importance_score for i in range(5, 10)]
    assert min(t_scores) > max(r_scores)
    assert all(out[i].target_like == 1 for i in range(5))
    assert all(out[i].target_like == 0 for i in range(5, 10))


def test_dsir_empty_target_degrades_to_prior(spark):
    """An empty target corpus must yield finite scores from the
    pure +1 prior (ln(1/B) per feature), not nulls — Spark SUM over
    an empty frame is NULL where a SQL COUNT is 0."""
    from etl_python_azure_spark.operators.sampling import (
        dsir_importance_scores,
    )

    df = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f")], "doc_id long, text string"
    )
    out = dsir_importance_scores(
        df, df.filter(F.col("doc_id") < 0), "doc_id", "text", buckets=32
    ).collect()
    assert len(out) == 2
    assert all(r.importance_score is not None for r in out)
