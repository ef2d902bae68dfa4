"""Differential properties for the round-10 operators: each checked
against an independent brute-force Python implementation on
randomized (seeded) inputs — the same oracle discipline as the
DuckDB gate, but engine-free."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F


def _random_docs(rng: random.Random, n_docs: int, vocab: list[str]):
    """Word-salad docs over a tiny vocab so span/gram collisions are
    common; a few docs embed a shared run to force cross-doc dups."""
    docs = []
    shared = [rng.choice(vocab) for _ in range(12)]
    for d in range(n_docs):
        toks = [rng.choice(vocab) for _ in range(rng.randrange(2, 25))]
        if d % 4 == 0:
            at = rng.randrange(0, len(toks) + 1)
            toks = toks[:at] + shared + toks[at:]
        docs.append((d, toks))
    return docs


def test_merged_span_coverage_matches_python_reference(spark):
    from etl_python_azure_spark.operators.dedup import merged_span_coverage

    rng = random.Random(101)
    w = 3
    docs = _random_docs(rng, 40, ["aa", "bb", "cc", "dd"])

    span_docs: dict[tuple, set] = {}
    positions: dict[int, list] = {}
    for d, toks in docs:
        ps = []
        for i in range(len(toks) - w + 1):
            fp = tuple(toks[i : i + w])
            ps.append((i + 1, fp))
            span_docs.setdefault(fp, set()).add(d)
        positions[d] = ps
    want = {}
    for d, toks in docs:
        dup = [
            (p, p + w - 1)
            for p, fp in positions[d]
            if len(span_docs[fp]) >= 2
        ]
        covered, cs, ce = 0, None, -1
        for s, e in dup:
            if s > ce:
                if cs is not None:
                    covered += ce - cs + 1
                cs, ce = s, e
            else:
                ce = max(ce, e)
        if cs is not None:
            covered += ce - cs + 1
        want[d] = (len(toks), len(dup), covered)

    df = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in docs],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_spans, r.covered_tokens)
        for r in merged_span_coverage(df, "doc_id", "text", window=w).collect()
    }
    assert got == want


def test_gopher_repetition_fractions_match_python_reference(spark):
    from etl_python_azure_spark.operators.text import (
        gopher_repetition_fractions,
    )

    rng = random.Random(202)
    docs = _random_docs(rng, 40, ["x", "yy", "zzz", "w"])

    def ref(toks, n):
        grams = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
        if not grams:
            return None
        c = Counter(grams)
        ch = lambda g: len(g) - (n - 1)
        total = sum(cnt * ch(g) for g, cnt in c.items())
        dup = sum(cnt * ch(g) for g, cnt in c.items() if cnt >= 2)
        top = max(cnt * ch(g) for g, cnt in c.items())
        return total, dup, top

    df = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in docs],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.asDict()
        for r in gopher_repetition_fractions(df, "doc_id", "text").collect()
    }
    for d, toks in docs:
        for n in (2, 3, 4):
            r = ref(toks, n)
            want = 0.0 if r is None or r[0] == 0 else r[2] / r[0]
            assert got[d][f"top{n}_char_frac"] == want, (d, n)
        for n in (5, 6, 7):
            r = ref(toks, n)
            want = 0.0 if r is None or r[0] == 0 else r[1] / r[0]
            assert got[d][f"dup{n}_char_frac"] == want, (d, n)


def test_quality_keeper_drops_match_python_reference(spark):
    from etl_python_azure_spark.operators.dedup import quality_keeper_drops

    rng = random.Random(303)
    ids = list(range(30))
    qual = {i: rng.randrange(1, 6) for i in ids}
    pairs = set()
    while len(pairs) < 25:
        a, b = rng.sample(ids, 2)
        pairs.add((min(a, b), max(a, b)))
    want = {
        (b if qual[a] >= qual[b] else a) for a, b in pairs
    }

    pdf = spark.createDataFrame(sorted(pairs), "id_a long, id_b long")
    qdf = spark.createDataFrame(
        sorted(qual.items()), "doc_id long, q long"
    )
    got = {
        r.doc_id
        for r in quality_keeper_drops(pdf, qdf, "doc_id", "q").collect()
    }
    assert got == want


def test_language_id_ngram_matches_python_reference(spark):
    from etl_python_azure_spark.operators.text import language_id_ngram

    rng = random.Random(404)
    n, k = 3, 5
    rows = []
    for i in range(40):
        lang = rng.choice(["aa", "bb", "cc"])
        alphabet = {"aa": "abc", "bb": "cde", "cc": "efg"}[lang]
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randrange(1, 5)))
            for _ in range(rng.randrange(1, 8))
        ]
        rows.append((i, lang, " ".join(words)))

    profs: dict[str, Counter] = {}
    for _i, lang, text in rows:
        t = text.lower()
        profs.setdefault(lang, Counter()).update(
            t[j : j + n] for j in range(len(t) - n + 1)
        )
    weights = {
        lang: {
            g: k + 1 - rank
            for rank, (g, _c) in enumerate(
                sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k],
                start=1,
            )
        }
        for lang, c in profs.items()
    }
    want = {}
    for i, lang, text in rows:
        t = text.lower()
        tf = Counter(t[j : j + n] for j in range(len(t) - n + 1))
        scores = {
            L: sum(tf[g] * wt for g, wt in wmap.items() if g in tf)
            for L, wmap in weights.items()
        }
        scores = {L: s for L, s in scores.items() if s > 0}
        if not scores:
            want[i] = ("und", 0)
        else:
            best = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            want[i] = (best[0], best[1])

    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r.doc_id: (r.lang_guess, r.score)
        for r in language_id_ngram(
            df, "doc_id", "text", "lang", n=n, profile_size=k
        ).collect()
    }
    assert got == want
    spark.catalog.clearCache()
