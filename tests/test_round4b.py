"""Semantic tests for the round-4b operators (SCD2 compaction,
touch attribution, decontamination, source-pair Jaccard, Zipf fit,
PageRank) on hand-checkable inputs — the oracle diff proves engine
parity; these prove the semantics are the intended ones."""

from __future__ import annotations

import math
from datetime import datetime

from etl_python_azure_spark.operators.dedup import (
    contamination_overlap,
    source_pair_jaccard,
)
from etl_python_azure_spark.operators.graph import pagerank
from etl_python_azure_spark.operators.sessionize import touch_attribution
from etl_python_azure_spark.operators.text import zipf_fit
from etl_python_azure_spark.operators.timeseries import scd2_compact


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


def test_scd2_compact_runs_and_intervals(spark):
    obs = spark.createDataFrame(
        [
            (1, _ts(1), 101, "gold"),
            (1, _ts(2), 102, "gold"),     # same run
            (1, _ts(3), 103, "silver"),   # change -> v2
            (1, _ts(4), 104, "gold"),     # change BACK -> v3 (not merged)
            (2, _ts(1), 201, "bronze"),   # single open version
        ],
        "k long, ts timestamp, tb long, tier string",
    )
    out = {
        (r["k"], r["version"]): r
        for r in scd2_compact(obs, "k", "ts", ["tier"], "tb").collect()
    }
    assert len(out) == 4
    v1, v2, v3 = out[(1, 1)], out[(1, 2)], out[(1, 3)]
    assert (v1["tier"], v1["n_obs"]) == ("gold", 2)
    assert v1["valid_from"] == _ts(1) and v1["valid_to"] == _ts(3)
    assert (v2["tier"], v2["valid_to"]) == ("silver", _ts(4))
    assert (v3["tier"], v3["valid_to"]) == ("gold", None)  # open
    assert out[(2, 1)]["valid_to"] is None


def test_scd2_null_attr_forms_own_run(spark):
    obs = spark.createDataFrame(
        [(1, _ts(1), 1, "a"), (1, _ts(2), 2, None), (1, _ts(3), 3, None)],
        "k long, ts timestamp, tb long, tier string",
    )
    rows = scd2_compact(obs, "k", "ts", ["tier"], "tb").collect()
    assert len(rows) == 2  # 'a' then a merged NULL run
    nulls = [r for r in rows if r["tier"] is None]
    assert nulls[0]["n_obs"] == 2 and nulls[0]["version"] == 2


def test_scd2_same_ts_uses_tiebreaker(spark):
    obs = spark.createDataFrame(
        [(1, _ts(1), 2, "late"), (1, _ts(1), 1, "early")],
        "k long, ts timestamp, tb long, tier string",
    )
    rows = {r["version"]: r["tier"] for r in
            scd2_compact(obs, "k", "ts", ["tier"], "tb").collect()}
    assert rows == {1: "early", 2: "late"}


def test_touch_attribution_hand_path(spark):
    rows = [
        # user 1: view, click, purchase, view, purchase, purchase
        (1, _ts(1, 1), 11, "view", 0.0),
        (1, _ts(1, 2), 12, "click", 0.0),
        (1, _ts(1, 3), 13, "purchase", 9.5),
        (1, _ts(1, 4), 14, "view", 0.0),
        (1, _ts(1, 5), 15, "purchase", 3.0),
        (1, _ts(1, 6), 16, "purchase", 4.0),  # back-to-back: no touch
        # user 2: purchase with no preceding touch at all
        (2, _ts(2, 1), 21, "purchase", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, "
              "event_type string, value double",
    )
    out = {r["conversion_id"]: r for r in touch_attribution(df).collect()}
    assert len(out) == 4
    assert (out[13]["first_touch_type"], out[13]["last_touch_type"],
            out[13]["n_touches"]) == ("view", "click", 2)
    assert (out[15]["first_touch_type"], out[15]["n_touches"]) == ("view", 1)
    assert out[16]["first_touch_type"] is None and out[16]["n_touches"] == 0
    assert out[21]["first_touch_type"] is None
    assert out[13]["conversion_value"] == 9.5


def test_contamination_overlap_hand_checked(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shares 3-grams with eval
            (2, "totally different words here"),
            (3, "the quick brown dog"),          # shares 1 shingle
        ],
        "doc_id long, text string",
    )
    eval_set = spark.createDataFrame(
        [(100, "the quick brown fox runs away")],
        "doc_id long, text string",
    )
    out = {r["train_doc_id"]: r for r in
           contamination_overlap(train, eval_set, min_shared=1).collect()}
    # doc 1 shares 'the quick brown' and 'quick brown fox'
    assert out[1]["n_shared_shingles"] == 2 and out[1]["n_eval_docs"] == 1
    assert out[3]["n_shared_shingles"] == 1
    assert 2 not in out
    gated = contamination_overlap(train, eval_set, min_shared=2).collect()
    assert [r["train_doc_id"] for r in gated] == [1]


def test_source_pair_jaccard_hand_checked(spark):
    df = spark.createDataFrame(
        [
            ("a", "x y z w"),        # shingles: 'x y z', 'y z w'
            ("b", "x y z v"),        # shingles: 'x y z', 'y z v'
            ("c", "p q r s"),        # disjoint
        ],
        "source string, text string",
    )
    out = {(r["group_a"], r["group_b"]): r for r in
           source_pair_jaccard(df).collect()}
    ab = out[("a", "b")]
    assert (ab["n_inter"], ab["size_a"], ab["size_b"]) == (1, 2, 2)
    assert abs(ab["jaccard"] - 1.0 / 3.0) < 1e-15
    assert ("a", "c") not in out and ("b", "c") not in out


def test_zipf_fit_exact_inverse_law(spark):
    # frequencies exactly proportional to 1/rank -> slope -1, r2 ~ 1
    words = ["alpha"] * 12 + ["beta"] * 6 + ["gamma"] * 4 + ["delta"] * 3
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    row = zipf_fit(df, top_k=4).collect()[0]
    assert row["n"] == 4
    assert row["top_token"] == "alpha" and row["top_freq"] == 12
    assert math.isclose(row["slope"], -1.0, abs_tol=1e-4)
    assert row["r2"] > 0.9999
    assert math.isclose(row["intercept"], math.log(12.0), abs_tol=1e-4)


def test_pagerank_symmetric_two_cycle(spark):
    e = spark.createDataFrame(
        [(1, 2, 5), (2, 1, 5)], "src long, dst long, w long"
    )
    out = {r["node"]: r for r in
           pagerank(e, weight_col="w", n_iter=5).collect()}
    # symmetric 2-cycle: uniform 1/2 is the fixed point
    assert math.isclose(out[1]["rank"], 0.5, abs_tol=1e-9)
    assert math.isclose(out[2]["rank"], 0.5, abs_tol=1e-9)
    assert out[1]["in_degree"] == 1


def test_pagerank_hub_attracts_mass_and_is_partition_invariant(spark):
    # spokes 2..5 all point at hub 1; hub points back at node 2
    edges = [(i, 1, 1) for i in range(2, 6)] + [(1, 2, 1)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    r1 = {r["node"]: r["rank"] for r in
          pagerank(e, weight_col="w", n_iter=3).collect()}
    assert r1[1] == max(r1.values())          # hub dominates
    assert r1[2] > r1[3]                      # hub's out-neighbor next
    assert math.isclose(r1[3], r1[4], abs_tol=1e-15) and math.isclose(
        r1[4], r1[5], abs_tol=1e-15
    )
    assert sum(r1.values()) <= 1.0 + 1e-9     # quantization only leaks DOWN
    r2 = {r["node"]: r["rank"] for r in
          pagerank(e.repartition(7), weight_col="w", n_iter=3).collect()}
    assert r1 == r2                           # bit-identical re-partitioned


def test_pagerank_weights_shift_mass(spark):
    # 1 splits 90/10 between 2 and 3
    e = spark.createDataFrame(
        [(1, 2, 9), (1, 3, 1), (2, 1, 1), (3, 1, 1)],
        "src long, dst long, w long",
    )
    out = {r["node"]: r["rank"] for r in
           pagerank(e, weight_col="w", n_iter=4).collect()}
    assert out[2] > out[3]


def test_ewma_halflife_hand_checked(spark):
    from datetime import date

    from etl_python_azure_spark.operators.timeseries import ewma_halflife

    daily = spark.createDataFrame(
        [
            (1, date(2024, 1, 1), 10.0),   # s1 = 10/2 = 5
            (1, date(2024, 1, 2), 10.0),   # s2 = (10+5)/2 = 7.5
            (1, date(2024, 1, 3), 0.0),    # s3 = 7.5/2 = 3.75
            (2, date(2024, 1, 1), 4.0),    # s1 = 2
        ],
        "user_id long, day date, v double",
    )
    out = {(r["user_id"], str(r["day"])): r["ewma"]
           for r in ewma_halflife(daily).collect()}
    assert out[(1, "2024-01-01")] == 5.0
    assert out[(1, "2024-01-02")] == 7.5
    assert out[(1, "2024-01-03")] == 3.75
    assert out[(2, "2024-01-01")] == 2.0


def test_ewma_partition_invariant(spark):
    from datetime import date, timedelta

    from etl_python_azure_spark.operators.timeseries import ewma_halflife

    rows = [
        (u, date(2024, 1, 1) + timedelta(days=i), float(u * 10 + i) + 0.25)
        for u in range(1, 6)
        for i in range(30)
    ]
    daily = spark.createDataFrame(rows, "user_id long, day date, v double")
    a = {(r["user_id"], str(r["day"])): r["ewma"]
         for r in ewma_halflife(daily).collect()}
    b = {(r["user_id"], str(r["day"])): r["ewma"]
         for r in ewma_halflife(daily.repartition(13)).collect()}
    assert a == b and len(a) == 150


def test_cms_estimate_never_underestimates_and_merges(spark):
    from etl_python_azure_spark.operators.aggregates import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    toks = (["apple"] * 50 + ["banana"] * 20 + ["cherry"] * 5
            + [f"noise{i}" for i in range(200)])
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    sk = cms_build(df, depth=4, width=64)
    q = spark.createDataFrame(
        [("apple",), ("banana",), ("cherry",), ("absent",)], "token string"
    )
    est = {r["token"]: r["cms_estimate"]
           for r in cms_estimate(sk, q, depth=4, width=64).collect()}
    assert est["apple"] >= 50 and est["banana"] >= 20 and est["cherry"] >= 5
    # width 64 over ~275 tokens: collisions stay small
    assert est["apple"] <= 50 + 30
    assert est["absent"] >= 0  # may collide, never negative
    # merging two halves == sketching the whole
    half1 = spark.createDataFrame([(t,) for t in toks[:100]], "token string")
    half2 = spark.createDataFrame([(t,) for t in toks[100:]], "token string")
    merged = cms_merge(
        cms_build(half1, depth=4, width=64), cms_build(half2, depth=4, width=64)
    )
    est2 = {r["token"]: r["cms_estimate"]
            for r in cms_estimate(merged, q, depth=4, width=64).collect()}
    assert est == est2


def test_snapshot_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (4, 40.0, None)],
        "k long, price double, status string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"),          # unchanged -> dropped
         (2, 25.0, "B"),          # price changed
         (4, 40.0, "D"),          # NULL -> 'D' (null-safe compare)
         (5, 50.0, "E")],         # added
        "k long, price double, status string",
    )
    from etl_python_azure_spark.operators.joins import snapshot_diff

    out = {r["k"]: (r["change_type"], r["changed_cols"])
           for r in snapshot_diff(old, new, "k").collect()}
    assert out == {
        2: ("changed", "price"),
        3: ("removed", ""),
        4: ("changed", "status"),
        5: ("added", ""),
    }


def test_snapshot_diff_multi_col_change_order(spark):
    old = spark.createDataFrame([(1, 1.0, "A")],
                                "k long, price double, status string")
    new = spark.createDataFrame([(1, 2.0, "B")],
                                "k long, price double, status string")
    from etl_python_azure_spark.operators.joins import snapshot_diff

    row = snapshot_diff(old, new, "k", ["price", "status"]).collect()[0]
    assert row["changed_cols"] == "price,status"  # compare_cols order


def test_rrf_fuse_hand_checked(spark):
    from etl_python_azure_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(10, 1), (11, 2), (12, 3)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(11, 1), (13, 2)], "doc_id long, rank int")
    out = {r["doc_id"]: r for r in
           rrf_fuse(a, b, k=60, top=10).collect()}
    # doc 11 appears in both lists -> highest fused score
    assert out[11]["fused_rank"] == 1
    assert out[11]["rrf_score"] == 1.0 / 62 + 1.0 / 61
    assert out[10]["rrf_score"] == 1.0 / 61  # single-list contribution
    assert out[13]["rank_a"] is None and out[13]["rank_b"] == 2
    # all four docs survive (top=10 > candidates)
    assert len(out) == 4


def _axis_vec(axis, dim=64, eps=0.0, eps_axis=1):
    v = [0.0] * dim
    v[axis] = 1.0
    if eps:
        v[eps_axis] = eps
    return v


def test_pq_encode_separates_clusters_and_is_partition_invariant(spark):
    from etl_python_azure_spark.operators.pq import (
        normalize_vectors,
        pq_adc_topk,
        pq_encode,
        pq_train,
    )

    # two tight clusters along axes 0 and 8 (different subspaces)
    rows = [(i, _axis_vec(0, eps=0.01 * i)) for i in range(8)]
    rows += [(10 + i, _axis_vec(8, eps=0.01 * i, eps_axis=9))
             for i in range(8)]
    em = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    nv = normalize_vectors(em)
    book = pq_train(nv, m=8, ksub=2, rounds=3)
    assert book.count() == 16  # 8 subspaces x 2 codes
    codes = pq_encode(nv, book, m=8, dsub=8)
    assert codes.count() == 16 * 8
    # sub 0 must split cluster A from cluster B (axis 0 lives there)
    sub0 = {r["vec_id"]: r["code"] for r in
            codes.filter("sub = 0").collect()}
    a_codes = {sub0[i] for i in range(8)}
    b_codes = {sub0[10 + i] for i in range(8)}
    assert a_codes.isdisjoint(b_codes)
    # ADC: a query from cluster A ranks A members above B members
    top = pq_adc_topk(codes, book, nv.filter("vec_id = 0"),
                      m=8, dsub=8, k=15).collect()
    ranks = {r["neighbor_id"]: r["rank"] for r in top}
    assert max(ranks[i] for i in range(1, 8)) < min(
        ranks[10 + i] for i in range(8)
    )
    # bit-identical codes under repartition
    c2 = pq_encode(nv.repartition(7), book, m=8, dsub=8)
    assert sorted(map(tuple, codes.collect())) == sorted(
        map(tuple, c2.collect())
    )


def test_normalize_vectors_unit_norm(spark):
    import math

    from etl_python_azure_spark.operators.pq import normalize_vectors

    em = spark.createDataFrame(
        [(1, [3.0, 4.0] + [0.0] * 62)], "vec_id long, embedding array<float>"
    )
    v = normalize_vectors(em).collect()[0]["embedding"]
    assert math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-12)
    assert math.isclose(v[0], 0.6, rel_tol=1e-12)


def test_bpe_learn_merges_hand_checked(spark):
    from etl_python_azure_spark.operators.bpe import bpe_learn_merges

    # wf: 'aaab' x2, 'ab' x1
    d = spark.createDataFrame([("aaab aaab ab",)], "text string")
    rows = {r["merge_rank"]: r for r in
            bpe_learn_merges(d, n_merges=3).collect()}
    # round 1: (a,a) appears twice per 'aaab' -> 4; (a,b) -> 3
    assert (rows[1]["a"], rows[1]["b"], rows[1]["pair_count"]) == ("a", "a", 4)
    # greedy: 'a a a b' -> 'aa a b' (first of the run only), so
    # round 2 best is (a,b): 2 from 'aaab' + 1 from 'ab'
    assert (rows[2]["a"], rows[2]["b"], rows[2]["pair_count"]) == ("a", "b", 3)
    # round 3: 'aa ab' -> (aa,ab) x2
    assert (rows[3]["a"], rows[3]["b"], rows[3]["merged"],
            rows[3]["pair_count"]) == ("aa", "ab", "aaab", 2)


def test_bpe_greedy_run_parity(spark):
    from etl_python_azure_spark.operators.bpe import bpe_learn_merges

    # 'aaaa' alone: round 1 (a,a) count 3; greedy merges positions
    # 0 and 2 -> 'aa aa'; round 2 (aa,aa) count 1
    d = spark.createDataFrame([("aaaa",)], "text string")
    rows = {r["merge_rank"]: r for r in
            bpe_learn_merges(d, n_merges=2).collect()}
    assert rows[1]["pair_count"] == 3
    assert (rows[2]["a"], rows[2]["b"], rows[2]["pair_count"]) == (
        "aa", "aa", 1)


def test_ts_similarity_blocks_and_distance(spark):
    from datetime import date, timedelta

    from etl_python_azure_spark.operators.timeseries import (
        sax_words,
        ts_similarity_pairs,
        znorm_series,
    )

    base = date(2024, 1, 1)
    # users 1 and 2: identical rising shape (scaled differently —
    # z-norm erases scale); user 3: the mirrored falling shape;
    # user 4: constant (zero variance -> dropped)
    rows = []
    for i in range(12):
        rows += [(1, base + timedelta(days=i), float(i)),
                 (2, base + timedelta(days=i), float(10 * i)),
                 (3, base + timedelta(days=i), float(11 - i)),
                 (4, base + timedelta(days=i), 5.0)]
    daily = spark.createDataFrame(rows, "user_id long, day date, v double")
    z = znorm_series(daily)
    assert z.filter("user_id = 4").count() == 0  # constant dropped
    words = {r["user_id"]: r["word"] for r in sax_words(z).collect()}
    assert words[1] == words[2]          # same shape, same word
    assert words[1] != words[3]          # mirrored shape blocks apart
    assert words[1] == words[3][::-1]    # and is exactly the reverse
    blocked = ts_similarity_pairs(z, sax_words(z)).collect()
    assert [(r["key_a"], r["key_b"]) for r in blocked] == [(1, 2)]
    assert blocked[0]["dist"] < 1e-9     # z-normed identical shapes
    # brute force agrees on the blocked pair and adds the rest
    bf = {(r["key_a"], r["key_b"]): r["dist"]
          for r in ts_similarity_pairs(z).collect()}
    assert abs(bf[(1, 2)] - blocked[0]["dist"]) == 0.0
    assert bf[(1, 3)] > 1.0              # opposite shapes far apart


def test_label_noise_scan_flags_planted_mislabels(spark):
    from etl_python_azure_spark.operators.similarity import (
        label_noise_candidates,
    )

    # two tight clusters; vec 30 carries label 1 but sits in cluster 0
    rows = [(i, 0, _axis_vec(0, eps=0.01 * i)) for i in range(10)]
    rows += [(20 + i, 1, _axis_vec(8, eps=0.01 * i, eps_axis=9))
             for i in range(10)]
    rows += [(30, 1, _axis_vec(0, eps=0.05))]
    em = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    out = {r["vec_id"]: r for r in label_noise_candidates(em).collect()}
    assert 30 in out
    assert out[30]["nearest_label"] == 0
    assert out[30]["nearest_cos"] > out[30]["own_cos"]
    # clean points are not flagged (the planted point barely shifts
    # label 1's centroid)
    assert all(v not in out for v in range(10))
    assert all(20 + v not in out for v in range(10))
