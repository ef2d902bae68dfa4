"""Distributed BPE merge learning — the tokenizer-training loop run
as relational operators over the word-frequency table.

`text.bpe_pair_counts` does ONE pair-count round; this module runs
the actual training loop: count adjacent symbol pairs, pick the best
merge, rewrite the vocabulary, repeat. Everything stays
vocabulary-sized (never the token stream), every round is pure
DataFrame ops, and the loop is fully deterministic — so a SQL oracle
replays the learned merge table exactly.

The greedy left-to-right non-overlapping merge (canonical BPE
behavior) is computed RELATIONALLY, not with a per-word UDF loop:
a pair (a,b) with a≠b can never match at two adjacent positions
(that would need b=a), so all matches merge; for a=b, a run of k
consecutive matches merges at every other position from the run's
start — a gaps-and-islands window (`pos - row_number`), the same
machinery as sessionization. No Python in the hot path.

Scale shape per round: one window pass over (word, pos) — the
vocabulary × symbols-per-word table, millions of rows for a
real corpus (the corpus itself is touched once, for word counts) —
plus one vocabulary-sized aggregate for the pair counts and a 1-row
broadcast of the chosen merge. Rounds persist their symbol table so
the lazy plan stays linear in the round count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _initial_symbols(
    df: DataFrame, text_col: str
) -> DataFrame:
    """Vocabulary as per-character symbol rows: (word, f, pos, sym)."""
    wf = (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    # Spark's split keeps the trailing empty string the end-of-word
    # zero-width match produces (limit=-1 semantics) — drop it
    return wf.select(
        "word",
        "f",
        F.posexplode(F.split(F.col("word"), "(?!^)")).alias("pos", "sym"),
    ).filter(F.col("sym") != "")


def _best_pair(syms: DataFrame) -> DataFrame:
    """1-row frame: the highest-count adjacent pair (count desc,
    then lexicographic a, b)."""
    w = Window.partitionBy("word").orderBy("pos")
    pairs = syms.select(
        "word", "f", "sym", F.lead("sym").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    return (
        pairs.groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
        .agg(F.sum("f").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
        .limit(1)
    )


def _apply_merge(syms: DataFrame, best: DataFrame) -> DataFrame:
    """Rewrite the symbol table with the chosen merge applied
    greedily left-to-right (non-overlapping) in every word.

    *best* may be EMPTY (a fully-merged vocabulary has no adjacent
    pairs left): the join below is a left join on TRUE, not a
    crossJoin, so an empty best yields NULL (a, b) → no position
    matches → the round is a no-op instead of annihilating every
    symbol row (the crossJoin form returned 0 rows; caught by
    review). The SQL oracle mirrors with LEFT JOIN ... ON TRUE."""
    w = Window.partitionBy("word").orderBy("pos")
    marked = (
        syms.join(F.broadcast(best), F.lit(True), "left")
        .select(
            "word",
            "f",
            "pos",
            "sym",
            "a",
            "b",
            (
                (F.col("sym") == F.col("a"))
                & (F.lead("sym").over(w) == F.col("b"))
            ).alias("m"),
        )
    )
    # greedy non-overlap: within each run of consecutive matching
    # positions (only possible for a=b), keep the 1st, 3rd, ... match
    w_m = Window.partitionBy("word").orderBy("pos")
    run_rn = F.when(
        F.col("m"),
        F.row_number().over(
            Window.partitionBy("word", "m_grp_key").orderBy("pos")
        ),
    )
    with_grp = marked.withColumn(
        "m_rn",
        F.sum(F.col("m").cast("int")).over(
            w_m.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn(
        "m_grp_key", F.when(F.col("m"), F.col("pos") - F.col("m_rn"))
    )
    taken = with_grp.withColumn(
        "take",
        F.coalesce(
            F.when(F.col("m"), (run_rn % 2) == 1), F.lit(False)
        ),
    )
    w_prev = Window.partitionBy("word").orderBy("pos")
    rewritten = (
        taken.withColumn(
            "absorbed", F.coalesce(F.lag("take").over(w_prev), F.lit(False))
        )
        .filter(~F.col("absorbed"))
        .select(
            "word",
            "f",
            F.when(F.col("take"), F.concat("a", "b"))
            .otherwise(F.col("sym"))
            .alias("sym"),
            F.col("pos").alias("__oldpos"),
        )
    )
    return rewritten.select(
        "word",
        "f",
        (
            F.row_number().over(
                Window.partitionBy("word").orderBy("__oldpos")
            )
            - 1
        ).alias("pos"),
        "sym",
    )


def bpe_learn_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 5,
) -> DataFrame:
    """Learn the first *n_merges* BPE merges over the corpus.

    Output: (merge_rank, a, b, merged, pair_count) — the merge table
    a tokenizer ships. Deterministic: pair ties break
    lexicographically, greedy application is exact (see module doc),
    counts are integer sums.
    """
    # r14: per-round EAGER localCheckpoints replace the lazy leaked
    # persists — the round-r symbol table and best-pair row each feed
    # TWO consumers inside the final single action (pair scoring +
    # rewrite; output row + merge join), which the scheduler runs as
    # concurrent stages where a lazy persist dedupes nothing (the
    # engine-wide dd00c4a finding). Checkpointing also cuts the
    # round-chained lineage, so the consume-side plan is one round
    # deep instead of n_merges deep. Measured at sf0.1 (min-of-3,
    # load-calibrated): bpe_encode_stats ~35% faster, learned_merges
    # ~15% — the residual is the 5 sequential rounds' job latency.
    from ..session import eager_checkpoint as _ckpt

    syms = _initial_symbols(df, text_col).transform(_ckpt)
    out = None
    for r in range(1, n_merges + 1):
        best = _best_pair(syms).transform(_ckpt)
        row = best.select(
            F.lit(r).alias("merge_rank"),
            "a",
            "b",
            F.concat("a", "b").alias("merged"),
            "pair_count",
        )
        out = row if out is None else out.unionByName(row)
        if r < n_merges:
            syms = _apply_merge(syms, best).transform(_ckpt)
    return out


def bpe_final_symbols(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 5,
) -> DataFrame:
    """The vocabulary AFTER applying *n_merges* learned merges — the
    ENCODE side of the tokenizer (`bpe_learn_merges` returns the
    merge table; this returns the segmentation it produces).

    Output: (word, f, pos, sym) — each distinct corpus word's final
    symbol sequence plus its corpus frequency, so corpus-level token
    counts are Σ f over symbol rows (vocabulary-sized work, the
    corpus itself is touched once for word counts). Same loop, same
    determinism guarantees as the trainer.
    """
    # r14: eager localCheckpoints per round (see bpe_learn_merges) —
    # each round's symbol table feeds pair scoring AND the rewrite,
    # and the checkpoint truncates the round-chained lineage, so the
    # returned frame depends only on the last round's blocks (no
    # leaked cache handles to track; clearCache() stays harmless).
    from ..session import eager_checkpoint as _ckpt

    syms = _initial_symbols(df, text_col).transform(_ckpt)
    for _ in range(n_merges):
        best = _best_pair(syms).transform(_ckpt)
        syms = _apply_merge(syms, best).transform(_ckpt)
    return syms
