"""Round-4c registry surface: entity-resolution blocking, OHLC
resampling, leakage-controlled CV, bigram LM scoring, SQ8 ANN, and
the BPE encode side.

- sorted-neighborhood duplicate pairs (merge/purge blocking — the
  sort-order complement of `blocked_fuzzy_pairs`' hash blocking)
- OHLC daily bars over the event stream (single-pass min_by/max_by
  first/last-per-group)
- purged k-fold CV report (time-blocked folds with purge + embargo
  margins — leakage control for serially-correlated training data)
- per-document bigram log-probability (add-1 smoothed fluency score,
  the next-order sibling of `unigram_logprob_scores`)
- SQ8 scalar-quantization ANN recall certificate (the fourth point
  on the LSH/IVF/PQ/SQ compression-recall curve)
- BPE encode stats (apply the learned merges; chars-per-token
  compression — the tokenizer-fertility metric at the vocab level)

Determinism notes: every float fold runs in index order (arrays) or
over the sorted value list (aggregates) with the same operation
order in both dialects; SQ8 codes are exact integers (floor of
identically-parenthesized double arithmetic); the purged-CV block
boundaries are floor(f·ndays/k) with int-exact doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_tables
from . import register
from .round4b import _bpe_cte_chain

# --------------------------------------------------------------------------
# Sorted-neighborhood duplicate pairs over part names.
# --------------------------------------------------------------------------
_SN_WINDOW = 5
_SN_MAXDIST = 8


@register(
    "sorted_neighborhood_dups",
    f"""
    WITH rn AS (
      SELECT p_partkey AS id, lower(p_name) AS t,
             ROW_NUMBER() OVER (ORDER BY lower(p_name), p_partkey) AS rn
      FROM part
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.t, b.t) AS BIGINT) AS dist
    FROM rn a JOIN rn b
      ON b.rn BETWEEN a.rn + 1 AND a.rn + {_SN_WINDOW}
    WHERE levenshtein(a.t, b.t) <= {_SN_MAXDIST}
    """,
)
def sorted_neighborhood_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate part-name pairs by sorted-neighborhood blocking
    (window {w}, Levenshtein ≤ {d}): global sort order comes from the
    two-pass `global_row_number` (range partition + per-partition
    offsets — never a single-partition window), and the neighborhood
    comparison is an offset-exploded EQUI-join, so pair volume is
    exactly n·w at any corpus size.""".format(w=_SN_WINDOW, d=_SN_MAXDIST)
    from ..operators.dedup import sorted_neighborhood_pairs

    p = load_tables(spark, sf_dir, "part")
    pairs = sorted_neighborhood_pairs(
        p,
        id_col="p_partkey",
        text_col="p_name",
        window=_SN_WINDOW,
        max_dist=_SN_MAXDIST,
    )
    return pairs.select(
        "id_a", "id_b", F.col("dist").cast("long").alias("dist")
    )


# --------------------------------------------------------------------------
# OHLC daily bars per event type.
# --------------------------------------------------------------------------
@register(
    "ohlc_daily_bars",
    """
    WITH r AS (
      SELECT event_type, CAST(ts AS DATE) AS bucket, value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts, event_id) AS rf,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, CAST(ts AS DATE)
               ORDER BY ts DESC, event_id DESC) AS rl
      FROM events
    )
    SELECT event_type, bucket,
           MAX(CASE WHEN rf = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rl = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_obs
    FROM r GROUP BY event_type, bucket
    """,
)
def ohlc_daily_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open/high/low/close bars of the event value per event
    type — OHLC resampling as ONE hash aggregate: first/last via
    min_by/max_by over the (ts, event_id) struct, no window sort of
    the stream (the oracle's double-ROW_NUMBER formulation is the
    semantics, not the plan)."""
    from ..operators.timeseries import ohlc_bars

    e = load_tables(spark, sf_dir, "events")
    return ohlc_bars(
        e,
        key_cols=["event_type"],
        ts_col="ts",
        value_col="value",
        tiebreak_col="event_id",
    )


# --------------------------------------------------------------------------
# Purged k-fold CV assignment report.
# --------------------------------------------------------------------------
_CV_FOLDS = 5
_CV_PURGE = 3
_CV_EMBARGO = 3


@register(
    "purged_fold_report",
    f"""
    WITH span AS (
      SELECT MIN(CAST(ts AS DATE)) AS d0,
             date_diff('day', MIN(CAST(ts AS DATE)),
                       MAX(CAST(ts AS DATE))) + 1 AS nd
      FROM events
    ),
    rws AS (
      SELECT date_diff('day', s.d0, CAST(e.ts AS DATE)) AS di,
             CAST(e.ts AS DATE) AS d
      FROM events e CROSS JOIN span s
    ),
    folds AS (SELECT UNNEST(range(0, {_CV_FOLDS})) AS fold),
    roled AS (
      SELECT CAST(f.fold AS INT) AS fold,
             r.d,
             CASE
               WHEN r.di >= CAST(floor(f.fold * s.nd / {_CV_FOLDS}) AS INT)
                AND r.di < CAST(floor((f.fold + 1) * s.nd / {_CV_FOLDS})
                                AS INT)
               THEN 'test'
               WHEN r.di < CAST(floor(f.fold * s.nd / {_CV_FOLDS}) AS INT)
                AND r.di >= CAST(floor(f.fold * s.nd / {_CV_FOLDS}) AS INT)
                            - {_CV_PURGE}
               THEN 'purged'
               WHEN r.di >= CAST(floor((f.fold + 1) * s.nd / {_CV_FOLDS})
                                 AS INT)
                AND r.di < CAST(floor((f.fold + 1) * s.nd / {_CV_FOLDS})
                                AS INT) + {_CV_EMBARGO}
               THEN 'embargo'
               ELSE 'train'
             END AS role
      FROM rws r CROSS JOIN folds f CROSS JOIN span s
    )
    SELECT fold, role, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT d) AS BIGINT) AS n_days
    FROM roled GROUP BY fold, role
    """,
)
def purged_fold_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row/day counts per (fold, role) for purged 5-fold
    cross-validation over the event stream (3-day purge before and
    3-day embargo after each test block) — the audit table that
    proves a time-series CV split leaks nothing. The assignment
    itself (`operators/sampling.purged_time_folds`) is a constant
    ×k projection with a 1-row broadcast span; this report adds one
    hash aggregate."""
    from ..operators.sampling import purged_time_folds

    e = load_tables(spark, sf_dir, "events")
    folds = purged_time_folds(
        e,
        ts_col="ts",
        n_folds=_CV_FOLDS,
        purge_days=_CV_PURGE,
        embargo_days=_CV_EMBARGO,
    )
    return folds.groupBy("fold", "role").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
    )


# --------------------------------------------------------------------------
# Bigram LM fluency scores.
# --------------------------------------------------------------------------
@register(
    "bigram_logprob_scores",
    """
    WITH tok AS (
      SELECT doc_id, CAST(u.i AS INT) AS pos, s[CAST(u.i AS INT)] AS token
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS s
            FROM documents) d,
           UNNEST(range(1, CAST(len(s) AS BIGINT) + 1)) AS u(i)
    ),
    big AS (
      SELECT a.doc_id, a.token, b.token AS nxt
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    c2 AS (SELECT token, nxt, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
    c1 AS (SELECT token, COUNT(*) AS c1 FROM tok GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT token) AS v FROM tok),
    model AS (
      SELECT c2.token, c2.nxt,
             floor(ln((c2.c2 + 1.0) / (c1.c1 + 1.0 * v.v))
                   * CAST(1e8 AS DOUBLE)) / CAST(1e8 AS DOUBLE) AS lp
      FROM c2 JOIN c1 USING (token) CROSS JOIN v
    ),
    scored AS (
      SELECT g.doc_id, m.lp
      FROM big g JOIN model m ON g.token = m.token AND g.nxt = m.nxt
    ),
    per AS (
      SELECT doc_id, COUNT(*) AS n_bigrams,
             list_reduce(list_sort(list(lp)), (acc, x) -> acc + x) AS slp
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           slp / n_bigrams AS avg_bigram_lp
    FROM per
    """,
)
def bigram_logprob_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average add-1 bigram log-probability under the
    corpus's own bigram model — the fluency/perplexity quality
    signal one order above `unigram_logprob_scores`. Model training
    is two hash aggregates; scoring is a shuffle equi-join on the
    bigram key (the bigram table outgrows broadcast at corpus
    scale); per-doc sums fold over the sorted log-prob list."""
    from ..operators.text import bigram_logprob_scores

    d = load_tables(spark, sf_dir, "documents")
    return bigram_logprob_scores(d)


# --------------------------------------------------------------------------
# SQ8 scalar-quantization ANN recall certificate.
# --------------------------------------------------------------------------
_SQ_DIM = 64
_SQ_K = 5
_SQ_NQ = 10

_SQ_D1 = _SQ_DIM + 1
_SQ_DEQ = (
    "(s.mn[i] + CAST(c.codes[i] AS DOUBLE)"
    " * ((s.mx[i] - s.mn[i]) / 255.0))"
)

_SQ_ORACLE = f"""
    WITH st AS (
      SELECT u.i AS dim,
             MIN(CAST(embedding[u.i] AS DOUBLE)) AS mn_v,
             MAX(CAST(embedding[u.i] AS DOUBLE)) AS mx_v
      FROM embeddings, UNNEST(range(1, {_SQ_D1})) AS u(i)
      GROUP BY u.i
    ),
    sarr AS (
      SELECT list(mn_v ORDER BY dim) AS mn, list(mx_v ORDER BY dim) AS mx
      FROM st
    ),
    codes AS (
      SELECT e.vec_id,
             list_transform(range(1, {_SQ_D1}), i ->
               CASE WHEN s.mx[i] = s.mn[i] THEN 0
               ELSE CAST(least(255.0, greatest(0.0, floor(
                 (CAST(e.embedding[i] AS DOUBLE) - s.mn[i])
                 / (s.mx[i] - s.mn[i]) * 255.0 + 0.5))) AS INT)
               END) AS codes
      FROM embeddings e CROSS JOIN sarr s
    ),
    q AS (
      SELECT vec_id AS query_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      FROM embeddings WHERE vec_id < {_SQ_NQ}
    ),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_reduce(list_transform(range(1, {_SQ_D1}), i ->
               (q.qv[i] - {_SQ_DEQ}) * (q.qv[i] - {_SQ_DEQ})),
               (acc, x) -> acc + x) AS adist
      FROM codes c CROSS JOIN q CROSS JOIN sarr s
      WHERE c.vec_id <> q.query_id
    ),
    sq AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY adist ASC, neighbor_id ASC
        ) AS rnk FROM scored
      ) WHERE rnk <= {_SQ_K}
    ),
    ex AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             list_reduce(list_transform(range(1, {_SQ_D1}), i ->
               (q.qv[i] - CAST(e.embedding[i] AS DOUBLE))
               * (q.qv[i] - CAST(e.embedding[i] AS DOUBLE))),
               (acc, x) -> acc + x) AS dist
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    ),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC
        ) AS rnk FROM ex
      ) WHERE rnk <= {_SQ_K}
    ),
    hits AS (
      SELECT bf.query_id, COUNT(sq.neighbor_id) AS n_hits
      FROM bf LEFT JOIN sq
        ON bf.query_id = sq.query_id AND bf.neighbor_id = sq.neighbor_id
      GROUP BY bf.query_id
    )
    SELECT query_id, CAST(n_hits AS BIGINT) AS n_hits,
           (CAST(n_hits AS DOUBLE) / CAST({_SQ_K}.0 AS DOUBLE))
             AS recall_at_{_SQ_K}
    FROM hits
    """


@register("ann_sq8_recall", _SQ_ORACLE)
def ann_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of the SQ8 (one byte per dimension) compressed scan
    against exact squared-L2 brute force — the fourth point on the
    engine's compression/recall curve after sign-LSH, IVF, and PQ.
    Codes are exact integers from identically-parenthesized double
    arithmetic, so the oracle replays train → encode → ADC → top-k
    bit-for-bit."""
    from ..operators.pq import l2_expr, sq_adc_topk, sq_encode, sq_train_stats

    em = load_tables(spark, sf_dir, "embeddings")
    stats = sq_train_stats(em)
    codes = sq_encode(em, stats)
    q = em.filter(F.col("vec_id") < _SQ_NQ)
    sq_top = sq_adc_topk(codes, q, k=_SQ_K).select(
        "query_id", F.col("neighbor_id").alias("sq_neighbor")
    )
    qd = q.select(
        F.col("vec_id").alias("query_id"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("qv"),
    )
    exact = (
        em.select(
            F.col("vec_id").alias("neighbor_id"),
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias(
                "nv"
            ),
        )
        .crossJoin(F.broadcast(qd))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", l2_expr("qv", "nv").alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("dist"), F.asc("neighbor_id")
    )
    bf = (
        exact.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _SQ_K)
        .select("query_id", "neighbor_id")
    )
    hits = (
        bf.join(
            sq_top,
            (bf.query_id == sq_top.query_id)
            & (bf.neighbor_id == sq_top.sq_neighbor),
            "left",
        )
        .groupBy(bf.query_id)
        .agg(F.count("sq_neighbor").alias("n_hits"))
    )
    return hits.select(
        "query_id",
        F.col("n_hits").cast("long").alias("n_hits"),
        (F.col("n_hits").cast("double") / F.lit(float(_SQ_K))).alias(
            f"recall_at_{_SQ_K}"
        ),
    )


# --------------------------------------------------------------------------
# BPE encode stats: apply the learned merges, measure compression.
# --------------------------------------------------------------------------
_BPE_ENC_MERGES = 5
_BPE_ENC_TOP = 20


def _bpe_encode_oracle(n_merges: int, top: int) -> str:
    ctes = _bpe_cte_chain(n_merges, apply_all=True)
    ctes.append(f"""tw AS (
      SELECT word, f, COUNT(*) AS n_tokens
      FROM s{n_merges} GROUP BY word, f
    )""")
    ctes.append("""tot AS (
      SELECT SUM(f * n_tokens) AS corpus_tokens,
             SUM(f * len(word)) AS corpus_chars
      FROM tw
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT word, CAST(f AS BIGINT) AS word_freq,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(len(word) AS BIGINT) AS n_chars,
           CAST(t.corpus_tokens AS BIGINT) AS corpus_tokens,
           CAST(t.corpus_chars AS BIGINT) AS corpus_chars,
           CAST(t.corpus_chars AS DOUBLE)
             / CAST(t.corpus_tokens AS DOUBLE) AS chars_per_token
    FROM tw CROSS JOIN tot t
    ORDER BY word_freq DESC, word LIMIT {top}
    """
    )


@register(
    "bpe_encode_stats", _bpe_encode_oracle(_BPE_ENC_MERGES, _BPE_ENC_TOP)
)
def bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ENCODE side of the BPE tokenizer: apply the 5 learned
    merges to the vocabulary (`bpe_final_symbols` — same relational
    greedy-merge loop as the trainer) and report the 20 most frequent
    words' segmentation lengths plus the corpus-level chars-per-token
    compression. All work is vocabulary-sized; the corpus is touched
    once for word counts."""
    from ..operators.bpe import bpe_final_symbols

    d = load_tables(spark, sf_dir, "documents")
    syms = bpe_final_symbols(d, n_merges=_BPE_ENC_MERGES)
    tw = syms.groupBy("word", "f").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )
    tot = tw.agg(
        F.sum(F.col("f") * F.col("n_tokens")).alias("corpus_tokens"),
        F.sum(F.col("f") * F.length("word")).alias("corpus_chars"),
    )
    return (
        tw.crossJoin(F.broadcast(tot))
        .select(
            "word",
            F.col("f").cast("long").alias("word_freq"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.length("word").cast("long").alias("n_chars"),
            F.col("corpus_tokens").cast("long").alias("corpus_tokens"),
            F.col("corpus_chars").cast("long").alias("corpus_chars"),
            (
                F.col("corpus_chars").cast("double")
                / F.col("corpus_tokens").cast("double")
            ).alias("chars_per_token"),
        )
        .orderBy(F.desc("word_freq"), F.asc("word"))
        .limit(_BPE_ENC_TOP)
    )
