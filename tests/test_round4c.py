"""Semantic tests for the round-4c operators (sorted-neighborhood
blocking, global row numbers, OHLC bars, purged CV folds, bigram LM,
SQ8 quantization, BPE encode) on hand-checkable inputs — the oracle
diff proves engine parity; these prove the semantics are intended."""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F

from etl_python_azure_spark.operators.bpe import bpe_final_symbols
from etl_python_azure_spark.operators.dedup import (
    global_row_number,
    sorted_neighborhood_pairs,
)
from etl_python_azure_spark.operators.pq import (
    sq_adc_topk,
    sq_encode,
    sq_train_stats,
)
from etl_python_azure_spark.operators.sampling import purged_time_folds
from etl_python_azure_spark.operators.text import bigram_logprob_scores
from etl_python_azure_spark.operators.timeseries import ohlc_bars


def _ts(day, hour=0):
    return datetime(2024, 1, day, hour)


# ---------------------------------------------------------------- row numbers
def test_global_row_number_is_dense_and_ordered(spark):
    df = spark.createDataFrame(
        [(k,) for k in [7, 3, 9, 1, 5, 2, 8, 4, 6, 0]], "k int"
    )
    rows = global_row_number(df, ["k"], num_partitions=4).collect()
    got = {r["k"]: r["rn"] for r in rows}
    assert got == {k: k + 1 for k in range(10)}


def test_global_row_number_stable_across_actions(spark):
    # the persist() inside pins range boundaries: two separate
    # actions over the same result frame must agree exactly
    df = spark.range(500).select(
        F.col("id").cast("int").alias("k"),
        F.md5(F.col("id").cast("string")).alias("key"),
    )
    rn = global_row_number(df, ["key", "k"], num_partitions=8)
    a = sorted((r["key"], r["rn"]) for r in rn.collect())
    assert rn.select(F.countDistinct("rn")).first()[0] == 500
    b = sorted((r["key"], r["rn"]) for r in rn.collect())
    assert a == b
    # rn 1..n in key order
    in_key_order = sorted(a)
    assert [rn_ for _, rn_ in in_key_order] == list(range(1, 501))


def test_sorted_neighborhood_finds_adjacent_near_dups(spark):
    df = spark.createDataFrame(
        [
            (1, "acme corp"),
            (2, "acme corp."),   # 1 edit from id 1
            (3, "acme corporation"),
            (4, "zenith ltd"),
            (5, "zzz totally different name"),
        ],
        "id long, name string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in sorted_neighborhood_pairs(
            df, "id", "name", window=2, max_dist=7
        ).collect()
    }
    assert pairs[(1, 2)] == 1
    assert (1, 3) in pairs  # "acme corp" vs "acme corporation": 7 edits
    assert all(d <= 7 for d in pairs.values())
    assert (4, 5) not in pairs  # distance too large


# ---------------------------------------------------------------- OHLC
def test_ohlc_bars_first_last_extremes(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts(1, 1), 1, 10.0),
            ("a", _ts(1, 2), 2, 30.0),
            ("a", _ts(1, 3), 3, 5.0),
            ("a", _ts(1, 4), 4, 20.0),
            ("a", _ts(2, 1), 5, 7.0),
            ("b", _ts(1, 9), 6, 2.0),
        ],
        "k string, ts timestamp, id long, value double",
    )
    out = {
        (r["k"], str(r["bucket"])): r
        for r in ohlc_bars(df, ["k"], "ts", "value", "id").collect()
    }
    bar = out[("a", "2024-01-01")]
    assert (bar["open"], bar["high"], bar["low"], bar["close"]) == (
        10.0,
        30.0,
        5.0,
        20.0,
    )
    assert bar["n_obs"] == 4
    assert out[("a", "2024-01-02")]["open"] == 7.0
    assert out[("b", "2024-01-01")]["close"] == 2.0


def test_ohlc_bars_tiebreak_same_ts(spark):
    # two observations at the identical timestamp: the tiebreak id
    # decides which is open/close — deterministic either way
    df = spark.createDataFrame(
        [("a", _ts(1), 2, 99.0), ("a", _ts(1), 1, 11.0)],
        "k string, ts timestamp, id long, value double",
    )
    bar = ohlc_bars(df, ["k"], "ts", "value", "id").first()
    assert bar["open"] == 11.0 and bar["close"] == 99.0


# ---------------------------------------------------------------- purged CV
def test_purged_time_folds_roles(spark):
    # 10 days, 2 folds, purge=2, embargo=1
    df = spark.createDataFrame(
        [(i, _ts(i + 1)) for i in range(10)], "id long, ts timestamp"
    )
    out = purged_time_folds(
        df, "ts", n_folds=2, purge_days=2, embargo_days=1
    )
    roles = {
        (r["fold"], r["id"]): r["role"] for r in out.collect()
    }
    # fold 0: test = days 0-4 → ids 0..4; embargo = day 5; train rest
    for i in range(5):
        assert roles[(0, i)] == "test"
    assert roles[(0, 5)] == "embargo"
    for i in range(6, 10):
        assert roles[(0, i)] == "train"
    # fold 1: test = days 5-9; purged = days 3,4; train = 0..2
    for i in range(5, 10):
        assert roles[(1, i)] == "test"
    assert roles[(1, 3)] == "purged" and roles[(1, 4)] == "purged"
    for i in range(3):
        assert roles[(1, i)] == "train"
    # every (row, fold) assigned exactly once
    assert len(roles) == 20


def test_purged_time_folds_partition_test_rows(spark):
    df = spark.createDataFrame(
        [(i, _ts((i % 28) + 1)) for i in range(100)],
        "id long, ts timestamp",
    )
    out = purged_time_folds(df, "ts", n_folds=4).cache()
    # with no purge/embargo, roles are only train/test, and each row
    # is 'test' in exactly one fold
    assert out.filter(
        ~F.col("role").isin("train", "test")
    ).count() == 0
    per_row = (
        out.filter(F.col("role") == "test").groupBy("id").count().collect()
    )
    assert len(per_row) == 100
    assert all(r["count"] == 1 for r in per_row)


# ---------------------------------------------------------------- bigram LM
def test_bigram_logprob_prefers_fluent_doc(spark):
    # doc 1 repeats the corpus's dominant bigram; doc 2 is the only
    # occurrence of its transitions → doc 1 scores higher
    df = spark.createDataFrame(
        [
            (1, "the cat sat"),
            (2, "the cat sat"),
            (3, "the cat sat"),
            (4, "sat cat the"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r for r in bigram_logprob_scores(df).collect()
    }
    assert out[1]["n_bigrams"] == 2
    assert out[1]["avg_bigram_lp"] == out[2]["avg_bigram_lp"]
    assert out[1]["avg_bigram_lp"] > out[4]["avg_bigram_lp"]
    assert all(r["avg_bigram_lp"] < 0 for r in out.values())


# ---------------------------------------------------------------- SQ8
def test_sq8_roundtrip_recovers_exact_neighbors(spark):
    # well-separated 4-dim vectors: quantization noise (≤ range/510
    # per dim) cannot reorder neighbors
    vecs = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [10.0, 10.0, 10.0, 10.0]),
        (3, [10.0, 10.0, 10.0, 11.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    stats = sq_train_stats(df)
    codes = sq_encode(df, stats)
    assert codes.count() == 4
    top = sq_adc_topk(codes, df.filter(F.col("vec_id") == 0), k=2)
    got = [
        r["neighbor_id"]
        for r in top.orderBy("rank").collect()
    ]
    assert got == [1, 2] or got == [1, 3]
    assert got[0] == 1  # nearest is exact


def test_sq8_codes_bounds_and_degenerate_dim(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 5.0]), (1, [2.0, 5.0]), (2, [4.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    codes = {
        r["vec_id"]: r["codes"]
        for r in sq_encode(df, sq_train_stats(df)).collect()
    }
    assert codes[0][0] == 0 and codes[2][0] == 255
    assert codes[1][0] == 128  # round(0.5*255 + 0.5) = floor(128.0)
    # degenerate dim (mx == mn) encodes 0 everywhere
    assert [codes[i][1] for i in range(3)] == [0, 0, 0]


# ---------------------------------------------------------------- BPE encode
def test_bpe_final_symbols_apply_merges(spark):
    # corpus: "abab" × 3, "ab" × 2 → merge 1 is (a,b) → "ab";
    # merge 2 merges (ab, ab) → "abab"
    df = spark.createDataFrame(
        [(1, "abab abab abab ab ab")], "doc_id long, text string"
    )
    syms = bpe_final_symbols(df, n_merges=2)
    got = {
        (r["word"], r["pos"]): r["sym"] for r in syms.collect()
    }
    assert got[("ab", 0)] == "ab"
    assert got[("abab", 0)] == "abab"
    assert ("abab", 1) not in got  # fully merged into one symbol
    per_word = (
        syms.groupBy("word").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert {r["word"]: r["n"] for r in per_word} == {"ab": 1, "abab": 1}


def test_bpe_encode_greedy_nonoverlap(spark):
    # "aaa": merge (a,a) applies left-to-right non-overlapping →
    # symbols (aa, a), never (a, aa) or a triple merge
    df = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    syms = bpe_final_symbols(df, n_merges=1)
    got = [
        r["sym"]
        for r in syms.filter(F.col("word") == "aaa")
        .orderBy("pos")
        .collect()
    ]
    assert got == ["aa", "a"]


def test_bpe_final_symbols_survives_merge_exhaustion(spark):
    # review catch: when the vocabulary runs out of adjacent pairs
    # before n_merges rounds, the merge round must be a no-op, not
    # annihilate the symbol table (the old crossJoin with an empty
    # best-pair frame returned 0 rows)
    df = spark.createDataFrame([(1, "ab ab ab")], "doc_id long, text string")
    syms = bpe_final_symbols(df, n_merges=5).collect()
    assert len(syms) == 1
    assert syms[0]["sym"] == "ab" and syms[0]["f"] == 3
