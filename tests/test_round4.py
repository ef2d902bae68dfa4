"""Semantic tests for the round-4 operators (search, tokenizer prep,
corpus health, quota sampling, embedding QA) on hand-checkable
synthetic inputs — the oracle diff proves engine parity; these prove
the semantics are the intended ones."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from etl_python_azure_spark.operators.dedup import cluster_size_histogram
from etl_python_azure_spark.operators.sampling import quota_sample
from etl_python_azure_spark.operators.search import bm25_topk, inverted_index
from etl_python_azure_spark.operators.similarity import label_centroid_stats
from etl_python_azure_spark.operators.text import bpe_pair_counts


def test_bpe_pair_counts_hand_checked(spark):
    # corpus: "ab ab abc" -> wf: ab:2, abc:1
    # pairs: ab (from 'ab'x2 weight 2 each? no: 'ab' contributes pair
    # 'ab' once per word occurrence-weight => 2; 'abc' contributes
    # 'ab' and 'bc' with weight 1
    d = spark.createDataFrame([(1, "ab ab abc")], "doc_id long, text string")
    got = {r["pair"]: (r["pair_count"], r["n_words"]) for r in
           bpe_pair_counts(d).collect()}
    assert got == {"ab": (3, 2), "bc": (1, 1)}


def test_bpe_single_char_words_ignored(spark):
    d = spark.createDataFrame([(1, "a b c ab")], "doc_id long, text string")
    got = {r["pair"]: r["pair_count"] for r in bpe_pair_counts(d).collect()}
    assert got == {"ab": 1}


def test_bm25_ranks_matching_docs_sensibly(spark):
    docs = [
        (1, "spark shuffle join join join"),     # many 'join'
        (2, "spark shuffle join"),               # one 'join'
        (3, "spark shuffle partition exchange"), # no query term
        (4, "join shuffle join spark spark"),    # two 'join'
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    top = bm25_topk(d, ["join"], k=4).collect()
    ids = [r["doc_id"] for r in top]
    assert 3 not in ids  # no posting, never scored
    assert ids[0] == 1   # highest tf wins (equal lengths-ish)
    scores = {r["doc_id"]: r["score"] for r in top}
    assert scores[1] > scores[4] > scores[2] > 0
    assert all(r["n_terms_hit"] == 1 for r in top)


def test_bm25_multi_term_hit_count_and_idf_downweight(spark):
    docs = [(i, "common common common") for i in range(1, 9)]
    docs += [(9, "common rare"), (10, "common other words")]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    top = bm25_topk(d, ["common", "rare"], k=10)
    rows = {r["doc_id"]: r for r in top.collect()}
    # doc 9 hits both terms; 'rare' has df=1 so its idf dominates
    assert rows[9]["n_terms_hit"] == 2
    assert rows[9]["score"] == max(r["score"] for r in rows.values())


def test_inverted_index_tf(spark):
    d = spark.createDataFrame([(1, "a b a  a")], "doc_id long, text string")
    got = {r["token"]: r["tf"] for r in inverted_index(d).collect()}
    assert got == {"a": 3, "b": 1}  # empty tokens from '  ' dropped


def test_cluster_size_histogram_known_dups(spark):
    d = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (4, "y"), (5, "y"), (6, "z")],
        "doc_id long, text string",
    )
    got = {r["cluster_size"]: (r["n_clusters"], r["n_docs"]) for r in
           cluster_size_histogram(d, "text").collect()}
    assert got == {1: (1, 1), 2: (1, 2), 3: (1, 3)}


def test_quota_sample_caps_and_is_partition_invariant(spark):
    rows = [(i, f"src{i % 3}") for i in range(90)]
    d = spark.createDataFrame(rows, "doc_id long, source string")
    s1 = quota_sample(d, "source", "doc_id", 7)
    got = s1.groupBy("source").count().collect()
    assert all(r["count"] == 7 for r in got)
    ids1 = {r["doc_id"] for r in s1.collect()}
    ids2 = {
        r["doc_id"]
        for r in quota_sample(d.repartition(13), "source", "doc_id", 7).collect()
    }
    assert ids1 == ids2 and len(ids1) == 21


def test_label_centroid_stats_cohesion(spark):
    # label 0: tight cluster around +e1; label 1: spread across e2/e3
    dim = 64

    def vec(axis, eps, flip=1.0):
        v = [0.0] * dim
        v[axis] = flip
        v[(axis + 1) % dim] = eps
        return v

    rows = [(i, 0, vec(0, 0.01 * i)) for i in range(1, 4)]
    rows += [(10, 1, vec(2, 0.0)), (11, 1, vec(3, 0.0)), (12, 1, vec(4, 0.0))]
    d = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    got = {r["label"]: r for r in label_centroid_stats(d).collect()}
    assert got[0]["n_vecs"] == 3 and got[1]["n_vecs"] == 3
    # tight class: every member nearly parallel to the centroid
    assert got[0]["mean_cos"] > 0.999 and got[0]["min_cos"] > 0.999
    # orthogonal spread: member·centroid = 1/3 of centroid mass
    assert got[1]["mean_cos"] < 0.6
    assert math.isclose(
        got[1]["centroid_norm"], math.sqrt(3) / 3, rel_tol=1e-6
    )


def test_tfidf_cosine_pairs_semantics(spark):
    from etl_python_azure_spark.operators.search import tfidf_cosine_pairs

    docs = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),      # exact dup of 1 -> cos 1.0
        (3, "alpha beta gamma zeta"),       # near dup
        (4, "omega psi chi phi"),           # disjoint
        (5, "filler filler filler filler"), # shares nothing
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in tfidf_cosine_pairs(d, threshold=0.1).collect()}
    assert abs(pairs[(1, 2)] - 1.0) < 1e-12
    # 1 and 3 share the common tokens but differ in their RAREST
    # (highest-idf) token, so tf-idf cosine is positive yet well
    # below 1 — rare distinguishing tokens dominate, as intended
    assert 0.1 < pairs[(1, 3)] < 0.8 and pairs[(1, 3)] == pairs[(2, 3)]
    assert not any(4 in p or 5 in p for p in pairs)

    # max_df prune drops the quadratic token: 'alpha' appears in 3
    # docs; with max_df=2 docs 1/2/3 only pair through rarer tokens
    pruned = {(r["id_a"], r["id_b"]): r["cosine"]
              for r in tfidf_cosine_pairs(d, threshold=0.1, max_df=2).collect()}
    assert (1, 2) in pruned  # delta (df=2) still links the exact dups


def test_linear_interpolation_hand_checked(spark):
    from datetime import date

    from etl_python_azure_spark.operators.timeseries import (
        linear_interpolate_gaps,
    )

    daily = spark.createDataFrame(
        [
            (1, date(2020, 1, 1), 10.0),
            (1, date(2020, 1, 4), 40.0),   # gap: Jan 2 -> 20, Jan 3 -> 30
            (1, date(2020, 1, 5), 0.0),
            (2, date(2020, 3, 1), 7.0),    # single observation
        ],
        "user_id long, day date, v double",
    )
    out = {(r["user_id"], str(r["day"])): (r["v_filled"], r["is_interpolated"])
           for r in linear_interpolate_gaps(daily).collect()}
    assert out[(1, "2020-01-01")] == (10.0, False)
    assert out[(1, "2020-01-02")] == (20.0, True)
    assert out[(1, "2020-01-03")] == (30.0, True)
    assert out[(1, "2020-01-04")] == (40.0, False)
    assert out[(1, "2020-01-05")] == (0.0, False)
    assert out[(2, "2020-03-01")] == (7.0, False)
    assert len(out) == 6  # spine bounded per key, no leading/trailing


def test_hybrid_topk_reranks_by_cosine_within_candidates(spark):
    from etl_python_azure_spark.operators.search import hybrid_topk

    docs = [
        (1, "needle common words here"),
        (2, "needle other things entirely"),
        (3, "nothing relevant at all"),   # no 'needle' -> not a candidate
        (4, "needle needle needle"),
    ]
    # query vector = row 0's vector; doc 2's vector is closest to it,
    # doc 4's is orthogonal despite the best BM25 score
    def vec(axis):
        v = [0.0] * 64
        v[axis] = 1.0
        return v

    embs = [(0, vec(0)), (1, vec(1)), (2, vec(0)), (4, vec(3))]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    e = spark.createDataFrame(embs, "vec_id long, embedding array<float>")
    top = hybrid_topk(d, e, ["needle"], query_vec_id=0,
                      n_candidates=10, k=3).collect()
    assert [r["doc_id"] for r in top] == [2, 1, 4]  # cosine order
    assert top[0]["cosine"] == 1.0 and top[2]["cosine"] == 0.0
    assert 3 not in {r["doc_id"] for r in top}  # never a candidate
    # BM25 diagnostics survive the rerank: doc 4 had the top score
    scores = {r["doc_id"]: r["score"] for r in top}
    assert scores[4] > scores[1] and scores[4] > scores[2]
