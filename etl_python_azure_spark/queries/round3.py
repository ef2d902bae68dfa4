"""Round-3 query surface: passage-level dedup, leakage-safe splits,
tokenizer fertility, semi-join order screening, event-sequence and
rolling-activity analytics, exact decile profiling, session funnels,
source/lang association, and video-style frame-sample planning.

Every query follows the registry determinism rules (module docstring
of :mod:`. __init__`): integer aggregates cast to BIGINT in the
oracle (DuckDB SUM returns HUGEINT → pandas float64 otherwise),
double arithmetic written in the same operand order in both
dialects, and every computed column aliased identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_tables
from . import register

# stable 32-bit md5-derived integer / bucket over an arbitrary SQL
# expression — DuckDB twins of operators.sampling.hash_bucket and
# the hash-uniform draw in operators.sampling.weighted_sample
def _hash32_sql(expr: str) -> str:
    return (
        f"CAST(from_hex(substr(md5(CAST({expr} AS VARCHAR)), 1, 8))"
        "::BIT::UBIGINT AS BIGINT)"
    )


def _bucket_sql(expr: str) -> str:
    return f"{_hash32_sql(expr)} % 100"


# --------------------------------------------------------------------------
# Passage-level duplication (RefinedWeb/C4-style): non-overlapping
# 16-word passages, duplication ratio per source. At scale this is
# one explode + one hash aggregate — the passage table shuffles once
# on its content hash; no pairwise comparison anywhere.
# --------------------------------------------------------------------------
@register(
    "passage_dup_stats",
    """
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    c AS (
      SELECT t.source, array_to_string(t.w[u.s : u.s + 15], ' ') AS passage
      FROM t, UNNEST(generate_series(1, greatest(len(t.w), 1), 16)) AS u(s)
    )
    SELECT source,
           COUNT(*) AS n_passages,
           COUNT(DISTINCT passage) AS n_unique,
           1 - CAST(COUNT(DISTINCT passage) AS DOUBLE) / COUNT(*)
             AS dup_ratio
    FROM c GROUP BY source
    """,
)
def passage_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    passages = (
        d.select("source", toks.alias("__toks"))
        .select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(__toks), 1), 16),"
                    " s -> concat_ws(' ', slice(__toks, s, 16)))"
                )
            ).alias("passage"),
        )
    )
    return passages.groupBy("source").agg(
        F.count("*").alias("n_passages"),
        F.countDistinct("passage").alias("n_unique"),
        (
            F.lit(1) - F.countDistinct("passage") / F.count("*")
        ).alias("dup_ratio"),
    )


# --------------------------------------------------------------------------
# Leakage-safe train/val/test splits: every member of an exact-dup
# cluster (md5 fingerprint) follows its representative (min doc_id)
# into the same split, so no duplicated content straddles the
# train/eval boundary. One shuffle on the fingerprint; the split
# decision is a pure hash of the representative id (stable under
# re-runs and appends — operators.sampling rationale).
# --------------------------------------------------------------------------
@register(
    "cluster_safe_splits",
    f"""
    WITH r AS (
      SELECT doc_id, source,
             MIN(doc_id) OVER (PARTITION BY md5(text)) AS rep_id
      FROM documents
    ),
    s AS (
      SELECT doc_id, rep_id,
             CASE WHEN {_bucket_sql('rep_id')} < 80 THEN 'train'
                  WHEN {_bucket_sql('rep_id')} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM r
    )
    SELECT split,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT rep_id) AS n_clusters
    FROM s GROUP BY split
    """,
)
def cluster_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import hash_bucket

    d = load_tables(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text"))
    r = d.select("doc_id", F.min("doc_id").over(w).alias("rep_id"))
    b = hash_bucket("rep_id")
    s = r.withColumn(
        "split",
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test"),
    )
    return s.groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("rep_id").alias("n_clusters"),
    )


# --------------------------------------------------------------------------
# Tokenizer fertility per language: BPE-ish tokens produced per
# whitespace token — the coverage metric used to size a tokenizer
# for a multilingual corpus. Single scan, two regexp token counts,
# one tiny aggregate.
# --------------------------------------------------------------------------
@register(
    "tokenizer_fertility_by_lang",
    """
    SELECT lang,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
             AS total_ws_tokens,
           CAST(SUM(len(regexp_extract_all(lower(text),
                 '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
             AS total_bpe_ish_tokens,
           CAST(SUM(len(regexp_extract_all(lower(text),
                 '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS DOUBLE)
             / SUM(len(string_split(text, ' '))) AS fertility
    FROM documents GROUP BY lang
    """,
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import token_counts

    d = load_tables(spark, sf_dir, "documents")
    t = token_counts(d, carry_cols=["lang"])
    return t.groupBy("lang").agg(
        F.sum("n_ws_tokens").alias("total_ws_tokens"),
        F.sum("n_bpe_ish_tokens").alias("total_bpe_ish_tokens"),
        (
            F.sum("n_bpe_ish_tokens").cast("double")
            / F.sum("n_ws_tokens")
        ).alias("fertility"),
    )


# --------------------------------------------------------------------------
# TPC-H Q4 shape (adapted to the available columns): orders in a
# quarter having at least one slow lineitem (shipped > 90 days after
# the order date), counted per priority. Left-semi join — Catalyst
# keeps only the existence probe, no row multiplication.
# --------------------------------------------------------------------------
@register(
    "late_ship_priority_orders",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def late_ship_priority_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t["lineitem"]
    slow = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return slow.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


# --------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov estimate): per
# user, each event's type vs its predecessor's; counts + row-
# normalized transition probability. The lag window shuffles once on
# user_id; the probability window runs over the tiny (type × type)
# aggregate, never the corpus.
# --------------------------------------------------------------------------
@register(
    "event_transition_matrix",
    """
    WITH g AS (
      SELECT user_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type,
             event_type AS next_type
      FROM events
    ),
    c AS (
      SELECT prev_type, next_type, COUNT(*) AS n
      FROM g WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n,
           CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY prev_type) AS prob
    FROM c
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    c = g.groupBy("prev_type", "next_type").agg(F.count("*").alias("n"))
    wp = Window.partitionBy("prev_type")
    return c.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wp)).alias("prob"),
    )


# --------------------------------------------------------------------------
# Rolling 7-day active users per day — the windowed-COUNT-DISTINCT
# that has no shuffle-sane direct form. Shape: distinct (user, day)
# once, fan each activity day out to the ≤7 report days it supports
# (a bounded explode, not a range join), then one hash aggregate.
# Report days are restricted to days with observed activity.
# --------------------------------------------------------------------------
@register(
    "rolling_7d_active_users",
    """
    WITH act AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    fan AS (
      SELECT a.user_id, a.day + CAST(u.i AS INTEGER) AS report_day
      FROM act a, UNNEST(generate_series(0, 6)) AS u(i)
    )
    SELECT report_day, COUNT(DISTINCT user_id) AS wau
    FROM fan
    WHERE report_day IN (SELECT day FROM act)
    GROUP BY report_day
    """,
)
def rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")
    act = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    fan = act.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "day",
    ).select("user_id", F.expr("date_add(day, i)").alias("report_day"))
    observed = act.select(F.col("day").alias("report_day")).distinct()
    return (
        fan.join(observed, "report_day", "left_semi")
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )


# --------------------------------------------------------------------------
# Exact spend deciles without a global-sort window: per-user exact
# decimal spend, 9 percentile_disc thresholds (one distributed
# aggregate over the user table — orders of magnitude smaller than
# the event log), then a broadcast threshold lookup buckets every
# user. percentile_disc picks an actual data value (no float
# interpolation), so both engines agree bit-for-bit.
# --------------------------------------------------------------------------
@register(
    "decile_spend_profile",
    """
    WITH spend AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s
      FROM events GROUP BY user_id
    ),
    thr AS (
      SELECT [quantile_disc(s, 0.1), quantile_disc(s, 0.2),
              quantile_disc(s, 0.3), quantile_disc(s, 0.4),
              quantile_disc(s, 0.5), quantile_disc(s, 0.6),
              quantile_disc(s, 0.7), quantile_disc(s, 0.8),
              quantile_disc(s, 0.9)] AS ts
      FROM spend
    )
    SELECT len(list_filter(thr.ts, t -> t < spend.s)) + 1 AS decile,
           COUNT(*) AS n_users,
           CAST(SUM(CAST(spend.s AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_spend
    FROM spend, thr
    GROUP BY decile
    """,
)
def decile_spend_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")
    spend = e.groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("s")
    )
    thr = spend.agg(
        F.array(
            *[
                F.expr(f"percentile_disc({k}/10.0) WITHIN GROUP (ORDER BY s)")
                for k in range(1, 10)
            ]
        ).alias("ts")
    )
    bucketed = spend.crossJoin(F.broadcast(thr)).select(
        (
            F.size(F.filter("ts", lambda t: t < F.col("s"))) + 1
        ).alias("decile"),
        "s",
    )
    return bucketed.groupBy("decile").agg(
        F.count("*").alias("n_users"),
        (
            F.sum(F.col("s").cast("decimal(18,2)")).cast("double")
            / F.count("*")
        ).alias("avg_spend"),
    )


# --------------------------------------------------------------------------
# In-session funnel: sessions (30-min gap, per user) that contain a
# view, a view followed by a click, and a full view → click →
# purchase sequence, counted per session-start day. Built on the
# session_window operator; the oracle restates the gap-merge with
# the same lag/running-sum construction validated by
# daily_peak_concurrency.
# --------------------------------------------------------------------------
@register(
    "session_funnel",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sess AS (
      SELECT user_id, ts, event_type,
             SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
             ) AS sid
      FROM flagged
    ),
    per AS (
      SELECT user_id, sid,
             CAST(MIN(ts) AS DATE) AS day,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
      FROM sess GROUP BY user_id, sid
    )
    SELECT day,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
           CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                          AND t_buy > t_click
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
    FROM per GROUP BY day
    """,
)
def session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import sessionize

    e = load_tables(spark, sf_dir, "events")
    per = sessionize(
        e,
        "ts",
        ["user_id"],
        gap="30 minutes",
        aggs={
            "day": F.min("ts").cast("date"),
            "t_view": F.min(F.when(F.col("event_type") == "view", F.col("ts"))),
            "t_click": F.min(
                F.when(F.col("event_type") == "click", F.col("ts"))
            ),
            "t_buy": F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ),
        },
    )
    saw_view = F.col("t_view").isNotNull()
    view_click = saw_view & (F.col("t_click") > F.col("t_view"))
    full = view_click & (F.col("t_buy") > F.col("t_click"))
    # F.when(cond, 1).otherwise(0), NOT cond.cast("int"): a session
    # with a view but no click makes view_click NULL (true AND NULL),
    # and SUM over all-NULL would return NULL where the oracle's
    # CASE ... ELSE 0 returns 0 — when/otherwise maps false and NULL
    # alike to 0, matching CASE exactly (r03 ADVICE).
    as01 = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    return per.groupBy("day").agg(
        F.count("*").alias("n_sessions"),
        as01(saw_view).alias("n_view"),
        as01(view_click).alias("n_view_click"),
        as01(full).alias("n_full_funnel"),
    )


# --------------------------------------------------------------------------
# Source ↔ language association: observed vs independence-expected
# counts and lift per (source, lang) cell. The contingency table and
# both marginals are tiny aggregates; the marginals broadcast back
# onto the cells, so nothing bigger than (sources × langs) ever
# shuffles twice.
# --------------------------------------------------------------------------
@register(
    "source_lang_affinity",
    """
    WITH cell AS (
      SELECT source, lang, COUNT(*) AS obs FROM documents
      GROUP BY source, lang
    ),
    m AS (SELECT source, CAST(SUM(obs) AS BIGINT) AS st FROM cell GROUP BY source),
    l AS (SELECT lang, CAST(SUM(obs) AS BIGINT) AS lt FROM cell GROUP BY lang),
    t AS (SELECT CAST(SUM(obs) AS BIGINT) AS tot FROM cell)
    SELECT c.source, c.lang, c.obs,
           CAST(m.st * l.lt AS DOUBLE) / t.tot AS expected,
           CAST(c.obs AS DOUBLE)
             / (CAST(m.st * l.lt AS DOUBLE) / t.tot) AS lift
    FROM cell c JOIN m USING (source) JOIN l USING (lang), t
    """,
)
def source_lang_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")
    cell = d.groupBy("source", "lang").agg(F.count("*").alias("obs"))
    m = cell.groupBy("source").agg(F.sum("obs").alias("st"))
    lng = cell.groupBy("lang").agg(F.sum("obs").alias("lt"))
    tot = cell.agg(F.sum("obs").alias("tot"))
    expected = (F.col("st") * F.col("lt")).cast("double") / F.col("tot")
    return (
        cell.join(F.broadcast(m), "source")
        .join(F.broadcast(lng), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "lang",
            "obs",
            expected.alias("expected"),
            (F.col("obs").cast("double") / expected).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# Frame-sample plan for video-style media: every 8th frame index per
# media row, frame count from the deterministic fake decoder (the
# sanctioned mapInPandas site — real decoders plug into the same
# seam). The explode is per-row work with no shuffle; downstream
# frame decode fans out over these (media_id, frame_idx) tasks.
# --------------------------------------------------------------------------
@register(
    "media_frame_sample",
    """
    WITH d AS (
      SELECT doc_id AS media_id,
             1 + CAST(from_hex(substr(md5(text), 17, 2))
                      ::BIT::UBIGINT AS INT) AS n_frames
      FROM documents
    )
    SELECT media_id, n_frames, u.frame_idx
    FROM d, UNNEST(generate_series(0, d.n_frames - 1, 8)) AS u(frame_idx)
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import (
        decode_features,
        deterministic_fake_decoder,
    )

    d = load_tables(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("content"),
    )
    decoded = decode_features(media, decoder=deterministic_fake_decoder)
    return decoded.select(
        "media_id",
        F.col("decoded_width").alias("n_frames"),
        F.explode(
            F.sequence(F.lit(0), F.col("decoded_width") - 1, F.lit(8))
        ).alias("frame_idx"),
    )


# --------------------------------------------------------------------------
# Join-key skew pre-flight: the diagnostic run before committing a
# 100 TB join strategy (plain hash vs salted vs AQE skew split).
# Exact order statistics over the per-key count table.
# --------------------------------------------------------------------------
@register(
    "join_key_skew_profile",
    """
    WITH c AS (
      SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY l_orderkey
    )
    SELECT COUNT(*) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           MAX(n) AS max_key_rows,
           quantile_disc(n, 0.5) AS p50_key_rows,
           quantile_disc(n, 0.99) AS p99_key_rows,
           CAST(MAX(n) AS DOUBLE) / SUM(n) AS max_share,
           CAST(MAX(n) AS DOUBLE) / quantile_disc(n, 0.5) AS skew_factor
    FROM c
    """,
)
def join_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import key_skew_profile

    li = load_tables(spark, sf_dir, "lineitem")
    return key_skew_profile(li, ["l_orderkey"])


# --------------------------------------------------------------------------
# Z-order layout key, oracle-checked bit-for-bit: Morton-interleave
# (l_partkey, l_suppkey) with operators.layout.zorder_key (pure JVM
# bit arithmetic) and prove DuckDB reproduces every key exactly
# (order-independent integer aggregates per return flag). Gives the
# physical-layout operator — otherwise pytest-only — a driver row.
# --------------------------------------------------------------------------
@register(
    "zorder_key_stats",
    """
    WITH z AS (
      SELECT l_returnflag,
             CAST(list_sum(list_transform(range(0, 16), i ->
               ((((l_partkey % 65536) >> i) & 1) << (2 * i))
               + ((((l_suppkey % 65536) >> i) & 1) << (2 * i + 1))
             )) AS BIGINT) AS zkey
      FROM lineitem
    )
    SELECT l_returnflag,
           COUNT(*) AS n,
           MIN(zkey) AS min_zkey,
           MAX(zkey) AS max_zkey,
           CAST(SUM(zkey) AS BIGINT) AS sum_zkey
    FROM z GROUP BY l_returnflag
    """,
)
def zorder_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import zorder_key

    li = load_tables(spark, sf_dir, "lineitem")
    z = li.select(
        "l_returnflag",
        zorder_key(
            [
                F.pmod(F.col("l_partkey"), F.lit(65536)),
                F.pmod(F.col("l_suppkey"), F.lit(65536)),
            ],
            bits=16,
        ).alias("zkey"),
    )
    return z.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.min("zkey").alias("min_zkey"),
        F.max("zkey").alias("max_zkey"),
        F.sum("zkey").alias("sum_zkey"),
    )


# --------------------------------------------------------------------------
# Quality-weighted corpus sampling (Efraimidis–Spirakis, hash-derived
# uniforms): longer documents are proportionally likelier to be
# drawn, the draw is without replacement, and the whole sample is a
# pure function of doc ids — reproducible across engines, runs, and
# partitionings. Plan: projection + TakeOrdered, no shuffle.
# --------------------------------------------------------------------------
@register(
    "weighted_sample_docs",
    f"""
    WITH s AS (
      SELECT doc_id, lang, source, n_chars,
             floor(ln(({_hash32_sql('doc_id')} + 1)
                      / 4294967296.0) * 1e8) / 1e8 / n_chars AS score
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars
    FROM s ORDER BY score DESC, doc_id LIMIT 100
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_sample

    d = load_tables(spark, sf_dir, "documents")
    return weighted_sample(
        d.select("doc_id", "lang", "source", "n_chars"),
        "doc_id",
        "n_chars",
        k=100,
    )


# --------------------------------------------------------------------------
# Perplexity-style quality scoring: every document's average token
# log-probability under the corpus's own unigram model (the CCNet
# filtering signal). Double sums fold over SORTED log-prob lists in
# both engines, so the scores are bit-identical.
# --------------------------------------------------------------------------
@register(
    "unigram_logprob_scores",
    """
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS token
      FROM documents
    ),
    tot AS (SELECT COUNT(*) AS n FROM toks),
    f AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
    lp AS (
      SELECT t.doc_id, ln(f.c / CAST(tot.n AS DOUBLE)) AS lp
      FROM toks t JOIN f USING (token), tot
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           list_reduce(list(lp ORDER BY lp), (acc, v) -> acc + v)
             / COUNT(*) AS avg_logprob
    FROM lp GROUP BY doc_id
    """,
)
def unigram_logprob_scores_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ppl_ish (= exp(-avg_logprob)) stays out of the oracle
    # projection: JVM Math.exp and libm exp disagree by 1 ulp on
    # some inputs, and the oracle is zero-tolerance. avg_logprob is
    # the same ranking signal.
    from ..operators.text import unigram_logprob_scores

    d = load_tables(spark, sf_dir, "documents")
    return unigram_logprob_scores(d, "doc_id", "text").select(
        "doc_id", "n_tokens", "avg_logprob"
    )
