"""distributed_prefix_sum: exact equality with the naive global
window, at several bucket counts and with non-contiguous keys."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_python_azure_spark.operators.prefix import distributed_prefix_sum


def _naive(df, order_col, value_col, exclusive):
    upper = -1 if exclusive else 0
    w = Window.orderBy(order_col).rowsBetween(Window.unboundedPreceding, upper)
    return df.withColumn(
        "cum_before", F.coalesce(F.sum(value_col).over(w), F.lit(0))
    )


def _rows(df):
    return sorted((r["k"], r["v"], r["cum_before"]) for r in df.collect())


def test_matches_global_window(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 7 % 997).alias("k"),  # non-contiguous, unique mod order
        (F.col("id") % 13 + 1).alias("v"),
    ).distinct()
    for exclusive in (True, False):
        for n in (1, 4, 32):
            got = distributed_prefix_sum(
                df, "k", "v", exclusive=exclusive, num_buckets=n
            )
            want = _naive(df, "k", "v", exclusive)
            assert _rows(got) == _rows(want), (exclusive, n)


def test_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "k long, v long")
    assert distributed_prefix_sum(empty, "k", "v").count() == 0
    one = spark.createDataFrame([(5, 9)], "k long, v long")
    got = distributed_prefix_sum(one, "k", "v").collect()[0]
    assert got["cum_before"] == 0
    inc = distributed_prefix_sum(one, "k", "v", exclusive=False).collect()[0]
    assert inc["cum_before"] == 9


def test_plan_has_no_single_partition(spark):
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    out = distributed_prefix_sum(df, "k", "v", num_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_pack_sequences_placement_invariants(spark):
    """Concat-and-chunk packing placement: the tape is gapless in
    doc order (start = previous start + previous tokens + sep),
    split flags agree with the boundary arithmetic, and zero-token
    docs occupy no tape. seq_len=10 over hand-sized docs."""
    from etl_python_azure_spark.operators.text import pack_sequences

    rows = [
        (1, "a b c d"),            # 4 tokens  -> tape [0, 4)
        (2, ""),                   # 0 tokens  -> at 5, no tape
        (3, "e " * 7),             # 7 tokens  -> [6, 13) SPLIT at 10
        (4, "x"),                  # 1 token   -> [14, 15)
        (5, "y " * 30),            # 30 tokens -> [16, 46) spans 3 cuts
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in pack_sequences(df, seq_len=10, sep_tokens=1).collect()
    }
    assert [got[i]["tape_start"] for i in (1, 2, 3, 4, 5)] == [
        0, 5, 6, 14, 16,
    ]
    # gapless: each start = prev start + prev tokens + 1 separator
    for a, b in [(1, 2), (2, 3), (3, 4), (4, 5)]:
        assert (
            got[b]["tape_start"]
            == got[a]["tape_start"] + got[a]["n_tokens"] + 1
        )
    assert (got[1]["first_seq"], got[1]["last_seq"], got[1]["is_split"]) == (0, 0, False)
    assert (got[2]["n_tokens"], got[2]["is_split"]) == (0, False)
    assert (got[3]["first_seq"], got[3]["last_seq"], got[3]["is_split"]) == (0, 1, True)
    assert (got[4]["first_seq"], got[4]["last_seq"]) == (1, 1)
    assert (got[5]["first_seq"], got[5]["last_seq"], got[5]["n_seqs_spanned"]) == (1, 4, 4)
