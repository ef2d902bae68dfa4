"""Round-4b registry surface: warehouse history, attribution,
corpus hygiene, and graph analytics.

- SCD Type-2 compaction (CDC history — the keep-all-versions twin of
  the reference's latest-version upsert, `S:209–227`)
- first/last-touch attribution over the event stream
- benchmark decontamination (train ∩ eval shingle overlap)
- source-pair Jaccard similarity matrix (corpus-level dedup health)
- Zipf-law fit over the token frequency curve
- fixed-point PageRank over the nation trade graph (iterative
  join–agg loop, replayable arithmetic)
- EWMA (decay 1/2) over per-user daily value (power-of-two unroll)
- count-min sketch frequency estimates with an upper-bound
  certificate; row-level snapshot diff (change data feed);
  reciprocal-rank fusion of lexical + vector retrieval
- BPE merge learning (the relational tokenizer-training loop)
- SCD2 point-in-time lookup; k-anonymity audit

Determinism notes: PageRank quantizes each iteration's per-edge
contributions to BIGINT on an 1e-12 grid (integer sums are
order-free), so the DuckDB oracle replays all iterations bit-for-bit
as unrolled CTEs; the Zipf regression uses the fixed-point-ln moment
discipline of ``bpe_pair_counts``/``corr_regression_qty_price``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from . import register

# --------------------------------------------------------------------------
# SCD Type-2: per-customer order-priority history compacted into
# validity intervals ([valid_from, valid_to), NULL = open version).
# --------------------------------------------------------------------------


@register(
    "scd2_priority_history",
    """
    WITH w AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
             CASE WHEN ROW_NUMBER() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) = 1
                  OR lag(o_orderpriority) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey)
                  IS DISTINCT FROM o_orderpriority
                  THEN 1 ELSE 0 END AS chg
      FROM orders
    ),
    v AS (
      SELECT *, SUM(chg) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING) AS version
      FROM w
    ),
    runs AS (
      SELECT o_custkey, version, o_orderpriority,
             MIN(o_orderdate) AS valid_from, COUNT(*) AS n_obs
      FROM v GROUP BY o_custkey, version, o_orderpriority
    )
    SELECT o_custkey, CAST(version AS BIGINT) AS version,
           o_orderpriority, valid_from,
           lead(valid_from) OVER (
             PARTITION BY o_custkey ORDER BY version) AS valid_to,
           CAST(n_obs AS BIGINT) AS n_obs
    FROM runs
    """,
)
def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import scd2_compact

    o = load_tables(spark, sf_dir, "orders")
    return scd2_compact(
        o.select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"),
        key_col="o_custkey",
        ts_col="o_orderdate",
        attr_cols=["o_orderpriority"],
        tiebreak_col="o_orderkey",
    )


# --------------------------------------------------------------------------
# First/last-touch attribution: every purchase claims the touches
# since the user's previous purchase.
# --------------------------------------------------------------------------
@register(
    "touch_attribution_paths",
    """
    WITH seg AS (
      SELECT user_id, ts, event_id, event_type, value,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
             - CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS sg
      FROM events
    ),
    en AS (
      SELECT user_id, ts, event_id, event_type, value,
        first_value(CASE WHEN event_type <> 'purchase'
                         THEN event_type END IGNORE NULLS)
          OVER w AS first_touch_type,
        last_value(CASE WHEN event_type <> 'purchase'
                        THEN event_type END IGNORE NULLS)
          OVER w AS last_touch_type,
        COUNT(CASE WHEN event_type <> 'purchase' THEN event_type END)
          OVER w AS n_touches
      FROM seg
      WINDOW w AS (PARTITION BY user_id, sg ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT user_id, event_id AS conversion_id, ts AS conversion_ts,
           value AS conversion_value, first_touch_type, last_touch_type,
           CAST(n_touches AS BIGINT) AS n_touches
    FROM en WHERE event_type = 'purchase'
    """,
)
def touch_attribution_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import touch_attribution

    e = load_tables(spark, sf_dir, "events")
    return touch_attribution(e, conversion_type="purchase")


# --------------------------------------------------------------------------
# Benchmark decontamination: training docs sharing ≥3 word-3-gram
# shingles with the (doc_id % 97 = 0) held-out slice.
# --------------------------------------------------------------------------
@register(
    "benchmark_decontamination",
    """
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
    )
    SELECT t.doc_id AS train_doc_id,
           CAST(COUNT(DISTINCT t.shingle) AS BIGINT) AS n_shared_shingles,
           CAST(COUNT(DISTINCT e.doc_id) AS BIGINT) AS n_eval_docs
    FROM (SELECT * FROM sh WHERE doc_id % 97 <> 0) t
    JOIN (SELECT * FROM sh WHERE doc_id % 97 = 0) e USING (shingle)
    GROUP BY t.doc_id
    HAVING COUNT(DISTINCT t.shingle) >= 3
    """,
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import contamination_overlap

    d = load_tables(spark, sf_dir, "documents")
    return contamination_overlap(
        d.filter(F.col("doc_id") % 97 != 0),
        d.filter(F.col("doc_id") % 97 == 0),
        n=3,
        min_shared=3,
    )


# --------------------------------------------------------------------------
# Corpus-level source similarity: exact Jaccard of shingle SETS per
# source pair (mixture-weight / crawl-overlap diagnostic).
# --------------------------------------------------------------------------
@register(
    "source_pair_jaccard",
    """
    WITH toks AS (
      SELECT source, string_split(lower(text), ' ') AS t FROM documents
    ),
    gs AS (
      SELECT DISTINCT source AS g, array_to_string(t[i:i+2], ' ') AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
    ),
    sizes AS (SELECT g, COUNT(*) AS sz FROM gs GROUP BY g),
    inter AS (
      SELECT a.g AS group_a, b.g AS group_b, COUNT(*) AS n_inter
      FROM gs a JOIN gs b ON a.shingle = b.shingle AND a.g < b.g
      GROUP BY 1, 2
    )
    SELECT group_a, group_b, CAST(n_inter AS BIGINT) AS n_inter,
           CAST(sa.sz AS BIGINT) AS size_a, CAST(sb.sz AS BIGINT) AS size_b,
           CAST(n_inter AS DOUBLE)
             / CAST(sa.sz + sb.sz - n_inter AS DOUBLE) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.g = group_a
    JOIN sizes sb ON sb.g = group_b
    """,
)
def source_pair_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import source_pair_jaccard

    d = load_tables(spark, sf_dir, "documents")
    return source_pair_jaccard(d, group_col="source")


# --------------------------------------------------------------------------
# Zipf-law fit over the top-200 token frequency curve.
# --------------------------------------------------------------------------
_ZIPF_COV = "((n * sxy) - (sx * sy))"
_ZIPF_VARX = "((n * sxx) - (sx * sx))"
_ZIPF_VARY = "((n * syy) - (sy * sy))"


@register(
    "zipf_fit_top_tokens",
    f"""
    WITH counts AS (
      SELECT w, COUNT(*) AS f FROM (
        SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents
      ) WHERE w <> '' GROUP BY w
      ORDER BY f DESC, w LIMIT 200
    ),
    ranked AS (
      SELECT w, f, ROW_NUMBER() OVER (ORDER BY f DESC, w) AS rank
      FROM counts
    ),
    fx AS (
      SELECT w, f, rank,
        CAST(floor(ln(CAST(rank AS DOUBLE)) * CAST(1e8 AS DOUBLE))
             AS BIGINT) AS xi,
        CAST(floor(ln(CAST(f AS DOUBLE)) * CAST(1e8 AS DOUBLE))
             AS BIGINT) AS yi
      FROM ranked
    ),
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        (CAST(CAST(SUM(xi) AS VARCHAR) AS DOUBLE)
          / CAST(1e8 AS DOUBLE)) AS sx,
        (CAST(CAST(SUM(yi) AS VARCHAR) AS DOUBLE)
          / CAST(1e8 AS DOUBLE)) AS sy,
        (CAST(CAST(SUM(CAST(xi AS HUGEINT) * yi) AS VARCHAR) AS DOUBLE)
          / CAST(1e16 AS DOUBLE)) AS sxy,
        (CAST(CAST(SUM(CAST(xi AS HUGEINT) * xi) AS VARCHAR) AS DOUBLE)
          / CAST(1e16 AS DOUBLE)) AS sxx,
        (CAST(CAST(SUM(CAST(yi AS HUGEINT) * yi) AS VARCHAR) AS DOUBLE)
          / CAST(1e16 AS DOUBLE)) AS syy,
        MAX(CASE WHEN rank = 1 THEN w END) AS top_token,
        MAX(CASE WHEN rank = 1 THEN f END) AS top_freq
      FROM fx
    )
    SELECT CAST(n AS BIGINT) AS n,
           ({_ZIPF_COV} / {_ZIPF_VARX}) AS slope,
           ((sy - (({_ZIPF_COV} / {_ZIPF_VARX}) * sx)) / n) AS intercept,
           (({_ZIPF_COV} / {_ZIPF_VARX}) * ({_ZIPF_COV} / {_ZIPF_VARY}))
             AS r2,
           top_token, CAST(top_freq AS BIGINT) AS top_freq
    FROM m
    """,
)
def zipf_fit_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import zipf_fit

    d = load_tables(spark, sf_dir, "documents")
    return zipf_fit(d, top_k=200)


# --------------------------------------------------------------------------
# Fixed-point PageRank over the nation trade graph (supplier nation →
# customer nation, weighted by shipped line items). The oracle
# replays all 3 quantized iterations as unrolled CTEs.
# --------------------------------------------------------------------------
_PR_DAMPING = 0.85
_PR_ITERS = 3


def _pagerank_oracle(n_iter: int) -> str:
    base = (
        "((CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))"
        " / CAST(nn.n AS DOUBLE))"
    )
    cte = """
    WITH e AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
             CAST(COUNT(*) AS DOUBLE) AS w
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2
    ),
    sh AS (
      SELECT src, dst,
             (w / SUM(w) OVER (PARTITION BY src)) AS share
      FROM e
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
      )
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    r0 AS (
      SELECT node, (CAST(1.0 AS DOUBLE) / CAST(nn.n AS DOUBLE)) AS rank
      FROM nodes, nn
    )"""
    prev = "r0"
    for i in range(1, n_iter + 1):
        cte += f""",
    c{i} AS (
      SELECT dst,
             CAST(CAST(SUM(CAST(floor((rank * share)
                    * CAST(1e12 AS DOUBLE)) AS BIGINT)) AS VARCHAR)
                  AS DOUBLE) AS mass
      FROM sh JOIN {prev} r ON r.node = sh.src
      GROUP BY dst
    ),
    r{i} AS (
      SELECT nodes.node,
             ({base} + (CAST(0.85 AS DOUBLE)
                * (COALESCE(mass, CAST(0.0 AS DOUBLE))
                   / CAST(1e12 AS DOUBLE)))) AS rank
      FROM nodes LEFT JOIN c{i} ON c{i}.dst = nodes.node, nn
    )"""
        prev = f"r{i}"
    return (
        cte
        + f""",
    indeg AS (SELECT dst AS node, CAST(COUNT(*) AS BIGINT) AS in_degree
              FROM e GROUP BY dst)
    SELECT r.node, r.rank, COALESCE(i.in_degree, 0) AS in_degree
    FROM {prev} r LEFT JOIN indeg i ON i.node = r.node
    """
    )


@register("pagerank_trade_graph", _pagerank_oracle(_PR_ITERS))
def pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer",
                    "supplier")
    li, o, c, s = t["lineitem"], t["orders"], t["customer"], t["supplier"]
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            s.s_nationkey.alias("src"), c.c_nationkey.alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return pagerank(
        edges,
        weight_col="w",
        damping=_PR_DAMPING,
        n_iter=_PR_ITERS,
    )


# --------------------------------------------------------------------------
# EWMA (decay 1/2 per observation) over per-user daily event value.
# The power-of-two unroll makes the recursion exact on both engines:
# 2^i * cents is an exact HUGEINT/DECIMAL, the cumulative sum is
# order-free, the 0.5^(r+1) rescale is an exact binary shift.
# --------------------------------------------------------------------------
@register(
    "ewma_user_daily_value",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events WHERE user_id < 40 GROUP BY 1, 2
    ),
    staged AS (
      SELECT user_id, day, v,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS r
      FROM daily
    ),
    weighted AS (
      SELECT user_id, day, v, r,
             CAST(floor(v * 100) AS HUGEINT)
               * CAST(power(CAST(2.0 AS DOUBLE), CAST(r AS DOUBLE))
                      AS HUGEINT) AS w
      FROM staged
    ),
    acc AS (
      SELECT user_id, day, v, r,
             SUM(w) OVER (PARTITION BY user_id ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS s
      FROM weighted
    )
    SELECT user_id, day, v,
           ((CAST(CAST(s AS VARCHAR) AS DOUBLE)
             * power(CAST(0.5 AS DOUBLE), CAST(r + 1 AS DOUBLE)))
            / CAST(100.0 AS DOUBLE)) AS ewma
    FROM acc
    """,
)
def ewma_user_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import ewma_halflife

    e = load_tables(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    daily = (
        e.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("v")
        )
    )
    return ewma_halflife(daily, "user_id", "day", "v")


# --------------------------------------------------------------------------
# Count-min sketch: point-frequency estimates with an upper-bound
# certificate. The sketch is depth×width cells regardless of corpus
# size and is MERGEABLE (cms_merge) — the heavy-hitter companion to
# sketch_distinct_maintenance. est ≥ exact always; the certificate
# checks est−exact ≤ ceil(2e/width · N) (P[violation] ≈ (2e)^-depth
# per token; deterministic given the data, validated across the sf
# sweeps per the 5σ registry rule).
# --------------------------------------------------------------------------
_CMS_TOKENS = ["and", "data", "filter", "hash", "join", "zzz_absent_token"]
_CMS_DEPTH = 4
_CMS_WIDTH = 512
_CMS_2E = "5.43656365691809"

_CMS_BUCKET = (
    "CAST(CAST(from_hex(substr(md5(CAST(seed AS VARCHAR) || ':' || {t}),"
    " 1, 8))::BIT::UBIGINT AS BIGINT) % 512 AS BIGINT)"
)

_CMS_ORACLE = f"""
    WITH toks AS (
      SELECT t.token FROM documents,
        UNNEST(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    n AS (SELECT COUNT(*) AS n_tok FROM toks),
    cells AS (
      SELECT seed, {_CMS_BUCKET.format(t="token")} AS bucket,
             COUNT(*) AS cnt
      FROM toks, UNNEST(range(0, {_CMS_DEPTH})) AS s(seed)
      GROUP BY 1, 2
    ),
    q(token) AS (VALUES {", ".join(f"('{t}')" for t in _CMS_TOKENS)}),
    probes AS (
      SELECT q.token, s.seed, {_CMS_BUCKET.format(t="q.token")} AS bucket
      FROM q, UNNEST(range(0, {_CMS_DEPTH})) AS s(seed)
    ),
    est AS (
      SELECT token, MIN(COALESCE(cnt, 0)) AS e FROM probes
      LEFT JOIN cells USING (seed, bucket) GROUP BY token
    ),
    exact AS (
      SELECT token, COUNT(*) AS c FROM toks
      WHERE token IN ({", ".join(f"'{t}'" for t in _CMS_TOKENS)})
      GROUP BY token
    )
    SELECT q.token, CAST(COALESCE(exact.c, 0) AS BIGINT) AS exact_count,
           CAST(est.e AS BIGINT) AS cms_estimate,
           CAST(est.e - COALESCE(exact.c, 0) AS BIGINT) AS overestimate,
           (est.e - COALESCE(exact.c, 0))
             <= CAST(ceil((CAST({_CMS_2E} AS DOUBLE)
                           / CAST({_CMS_WIDTH} AS DOUBLE))
                          * CAST(n.n_tok AS DOUBLE)) AS BIGINT)
             AS within_bound
    FROM q JOIN est USING (token) LEFT JOIN exact USING (token), n
    """


@register("cms_token_frequency", _CMS_ORACLE)
def cms_token_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregates import cms_build, cms_estimate

    d = load_tables(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    sketch = cms_build(toks, depth=_CMS_DEPTH, width=_CMS_WIDTH)
    q = spark.createDataFrame([(t,) for t in _CMS_TOKENS], "token string")
    est = cms_estimate(
        sketch, q, depth=_CMS_DEPTH, width=_CMS_WIDTH
    ).withColumnRenamed("cms_estimate", "e")
    exact = (
        toks.filter(F.col("token").isin(_CMS_TOKENS))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = toks.agg(F.count(F.lit(1)).alias("n_tok"))
    bound = F.ceil(
        (F.lit(float(_CMS_2E)) / F.lit(float(_CMS_WIDTH)))
        * F.col("n_tok").cast("double")
    )
    over = F.col("e") - F.coalesce("c", F.lit(0))
    return (
        q.join(est, "token")
        .join(exact, "token", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "token",
            F.coalesce("c", F.lit(0)).cast("long").alias("exact_count"),
            F.col("e").cast("long").alias("cms_estimate"),
            over.cast("long").alias("overestimate"),
            (over <= bound).alias("within_bound"),
        )
    )


# --------------------------------------------------------------------------
# Snapshot diff (change data feed): row-level delta between the
# orders table and a deterministically perturbed "next run" snapshot
# (removed %13 keys, price-bumped %7, status-flipped %11, added %17
# under offset keys). The output is sized by churn, not table size.
# --------------------------------------------------------------------------
@register(
    "snapshot_diff_orders",
    """
    WITH newsnap AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0
                  THEN o_totalprice * CAST(1.1 AS DOUBLE)
                  ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 11 = 0 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus
      FROM orders WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 17 = 0
    ),
    old AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
    j AS (
      SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS o_orderkey,
             o.o_orderkey AS ko, n.o_orderkey AS kn,
             o.o_totalprice AS op, n.o_totalprice AS np,
             o.o_orderstatus AS os, n.o_orderstatus AS ns
      FROM old o FULL OUTER JOIN newsnap n ON o.o_orderkey = n.o_orderkey
    )
    SELECT o_orderkey,
           CASE WHEN ko IS NULL THEN 'added'
                WHEN kn IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           CASE WHEN ko IS NULL OR kn IS NULL THEN ''
                ELSE concat_ws(',',
                  CASE WHEN op IS DISTINCT FROM np
                       THEN 'o_totalprice' END,
                  CASE WHEN os IS DISTINCT FROM ns
                       THEN 'o_orderstatus' END)
           END AS changed_cols
    FROM j
    WHERE ko IS NULL OR kn IS NULL
       OR (op IS DISTINCT FROM np) OR (os IS DISTINCT FROM ns)
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import snapshot_diff

    o = load_tables(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    k = F.col("o_orderkey")
    new = (
        o.filter(k % 13 != 0)
        .select(
            "o_orderkey",
            F.when(k % 7 == 0, F.col("o_totalprice") * F.lit(1.1))
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            F.when(k % 11 == 0, F.lit("X"))
            .otherwise(F.col("o_orderstatus"))
            .alias("o_orderstatus"),
        )
        .unionByName(
            o.filter(k % 17 == 0).select(
                (k + F.lit(10000000)).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
            )
        )
    )
    return snapshot_diff(
        o, new, "o_orderkey", ["o_totalprice", "o_orderstatus"]
    )


# --------------------------------------------------------------------------
# Reciprocal-rank fusion: BM25 top-50 ⊕ embedding-cosine top-50 →
# top-10, score-free (1/(60+rank) terms, fixed addition order).
# --------------------------------------------------------------------------
_RRF_QV = 7
_RRF_N = 50
_RRF_K = 10

from .round4 import _BM25_TERMS, _bm25_oracle  # noqa: E402

_RRF_ORACLE = f"""
    WITH bm AS (
      SELECT doc_id, score FROM ({_bm25_oracle(_BM25_TERMS, _RRF_N)})
    ),
    bmr AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank_a
      FROM bm
    ),
    n AS (
      SELECT vec_id, embedding,
             sqrt(list_reduce(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (acc, v) -> acc + v)) AS nrm
      FROM embeddings
    ),
    qv AS (SELECT embedding AS qe, nrm AS qn FROM n
           WHERE vec_id = {_RRF_QV}),
    cos AS (
      SELECT e.vec_id AS doc_id,
             list_reduce(list_transform(range(1, 65), i ->
                 CAST(qv.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                 (acc, v) -> acc + v) / (qv.qn * e.nrm) AS cosine
      FROM n e, qv WHERE e.vec_id <> {_RRF_QV}
    ),
    cr AS (
      SELECT doc_id, rank_b FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS rank_b
        FROM cos
      ) WHERE rank_b <= {_RRF_N}
    ),
    fused AS (
      SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
             a.rank_a, b.rank_b,
             (COALESCE(CAST(1.0 AS DOUBLE)
                       / CAST(60 + a.rank_a AS DOUBLE), CAST(0.0 AS DOUBLE))
              + COALESCE(CAST(1.0 AS DOUBLE)
                         / CAST(60 + b.rank_b AS DOUBLE),
                         CAST(0.0 AS DOUBLE))) AS rrf_score
      FROM bmr a FULL OUTER JOIN cr b ON a.doc_id = b.doc_id
    )
    SELECT doc_id, rrf_score,
           CAST(COALESCE(rank_a, 0) AS BIGINT) AS rank_a,
           CAST(COALESCE(rank_b, 0) AS BIGINT) AS rank_b,
           CAST(fused_rank AS BIGINT) AS fused_rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id)
               AS fused_rank
      FROM fused
    ) WHERE fused_rank <= {_RRF_K}
    """


@register("rrf_fusion_topk", _RRF_ORACLE)
def rrf_fusion_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.search import bm25_topk, rrf_fuse
    from ..operators.similarity import cosine_topk

    d = load_tables(spark, sf_dir, "documents")
    em = load_tables(spark, sf_dir, "embeddings")
    wa = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    bm = bm25_topk(d, _BM25_TERMS, k=_RRF_N).select(
        "doc_id", F.row_number().over(wa).alias("rank")
    )
    cos = cosine_topk(
        em, em.filter(F.col("vec_id") == _RRF_QV), k=_RRF_N
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    fused = rrf_fuse(bm, cos, id_col="doc_id", k=60, top=_RRF_K)
    return fused.select(
        "doc_id",
        "rrf_score",
        F.coalesce("rank_a", F.lit(0)).cast("long").alias("rank_a"),
        F.coalesce("rank_b", F.lit(0)).cast("long").alias("rank_b"),
        F.col("fused_rank").cast("long").alias("fused_rank"),
    )


# --------------------------------------------------------------------------
# BPE merge learning: the tokenizer-training loop (count pairs, pick
# best, rewrite vocabulary, repeat) run relationally and replayed by
# the oracle round-for-round. Greedy non-overlapping application is
# a gaps-and-islands window, not a per-word loop.
# --------------------------------------------------------------------------
_BPE_MERGES = 5


def _bpe_cte_chain(n_merges: int, apply_all: bool = False) -> list[str]:
    """The CTE chain replaying BPE training in SQL: word freqs, char
    symbols, then per-round (pair counts → best pair → greedy merge
    rewrite). With *apply_all*, the LAST merge is applied too (s{n}
    exists) — the encode-side oracle (`round4c.bpe_encode_stats`)
    needs the final segmentation, the trainer only the merge table."""
    ctes = [
        """wf AS (
      SELECT w AS word, COUNT(*) AS f FROM (
        SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents
      ) WHERE w <> '' GROUP BY w
    )""",
        """s0 AS (
      SELECT word, f, CAST(u.i AS INT) - 1 AS pos,
             substr(word, CAST(u.i AS INT), 1) AS sym
      FROM wf, UNNEST(range(1, CAST(len(word) AS BIGINT) + 1)) AS u(i)
    )""",
    ]
    for r in range(1, n_merges + 1):
        p = r - 1
        ctes.append(f"""pr{r} AS (
      SELECT word, f, sym,
             lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
      FROM s{p}
    )""")
        ctes.append(f"""best{r} AS (
      SELECT sym AS a, nxt AS b, SUM(f) AS pair_count
      FROM pr{r} WHERE nxt IS NOT NULL GROUP BY 1, 2
      ORDER BY pair_count DESC, a ASC, b ASC LIMIT 1
    )""")
        if r == n_merges and not apply_all:
            break
        ctes.append(f"""mk{r} AS (
      SELECT s.word, s.f, s.pos, s.sym, b.a, b.b,
             COALESCE(s.sym = b.a
               AND lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos)
                   = b.b, FALSE) AS m
      FROM s{p} s LEFT JOIN best{r} b ON TRUE
    )""")
        ctes.append(f"""gr{r} AS (
      SELECT *, SUM(CASE WHEN m THEN 1 ELSE 0 END) OVER (
               PARTITION BY word ORDER BY pos
               ROWS UNBOUNDED PRECEDING) AS m_rn
      FROM mk{r}
    )""")
        ctes.append(f"""tk{r} AS (
      SELECT *, CASE WHEN m THEN (ROW_NUMBER() OVER (
                 PARTITION BY word, CASE WHEN m THEN pos - m_rn END
                 ORDER BY pos) % 2) = 1
                ELSE FALSE END AS take
      FROM gr{r}
    )""")
        ctes.append(f"""ab{r} AS (
      SELECT *, COALESCE(lag(take) OVER (
                 PARTITION BY word ORDER BY pos), FALSE) AS absorbed
      FROM tk{r}
    )""")
        ctes.append(f"""s{r} AS (
      SELECT word, f,
             CAST(ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos)
                  AS INT) - 1 AS pos,
             CASE WHEN take THEN a || b ELSE sym END AS sym
      FROM ab{r} WHERE NOT absorbed
    )""")
    return ctes


def _bpe_oracle_sql(n_merges: int) -> str:
    ctes = _bpe_cte_chain(n_merges)
    finals = "\n    UNION ALL\n    ".join(
        f"SELECT {r} AS merge_rank, a, b, a || b AS merged,"
        f" CAST(pair_count AS BIGINT) AS pair_count FROM best{r}"
        for r in range(1, n_merges + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + finals


@register("bpe_learned_merges", _bpe_oracle_sql(_BPE_MERGES))
def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_learn_merges

    d = load_tables(spark, sf_dir, "documents")
    return bpe_learn_merges(d, n_merges=_BPE_MERGES)


# --------------------------------------------------------------------------
# Point-in-time (bi-temporal) lookup over the SCD2 history: which
# priority was valid for each customer on a given date. The query
# every SCD2 table exists to answer; half-open [from, to) semantics.
# --------------------------------------------------------------------------
_ASOF_DATE = "1995-06-01"


@register(
    "scd2_point_in_time",
    f"""
    WITH w AS (
      SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
             CASE WHEN ROW_NUMBER() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) = 1
                  OR lag(o_orderpriority) OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey)
                  IS DISTINCT FROM o_orderpriority
                  THEN 1 ELSE 0 END AS chg
      FROM orders
    ),
    v AS (
      SELECT *, SUM(chg) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING) AS version
      FROM w
    ),
    runs AS (
      SELECT o_custkey, version, o_orderpriority,
             MIN(o_orderdate) AS valid_from
      FROM v GROUP BY o_custkey, version, o_orderpriority
    ),
    hist AS (
      SELECT o_custkey, version, o_orderpriority, valid_from,
             lead(valid_from) OVER (
               PARTITION BY o_custkey ORDER BY version) AS valid_to
      FROM runs
    )
    SELECT o_custkey, CAST(version AS BIGINT) AS version,
           o_orderpriority, valid_from, valid_to
    FROM hist
    WHERE valid_from <= TIMESTAMP '{_ASOF_DATE}'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_ASOF_DATE}')
    """,
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import scd2_compact

    o = load_tables(spark, sf_dir, "orders")
    hist = scd2_compact(
        o.select("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"),
        key_col="o_custkey",
        ts_col="o_orderdate",
        attr_cols=["o_orderpriority"],
        tiebreak_col="o_orderkey",
    )
    d = F.lit(_ASOF_DATE).cast("timestamp")
    return hist.filter(
        (F.col("valid_from") <= d)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > d))
    ).select("o_custkey", "version", "o_orderpriority", "valid_from",
             "valid_to")


# --------------------------------------------------------------------------
# k-anonymity audit: quasi-identifier group sizes over customer
# (market segment × nation). Release hygiene for any user-derived
# training table: groups below k are re-identification risks.
# --------------------------------------------------------------------------
@register(
    "k_anonymity_report",
    """
    SELECT c_mktsegment, CAST(c_nationkey AS INT) AS c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           COUNT(*) >= 5 AS k_anonymous
    FROM customer
    GROUP BY c_mktsegment, c_nationkey
    """,
)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_tables(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("group_size"),
        (F.count(F.lit(1)) >= F.lit(5)).alias("k_anonymous"),
    )


# --------------------------------------------------------------------------
# Daily purchase rate with a 95% Wilson score interval — the
# statistically-honest way to report small-n daily rates (normal
# approx intervals go negative / past 1 at the edges; Wilson
# doesn't). One fixed association per term so both engines produce
# identical doubles.
# --------------------------------------------------------------------------
@register(
    "daily_purchase_rate_ci",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN 1 ELSE 0 END) AS DOUBLE) AS conv
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT day, n, conv,
             (conv / n) AS p,
             ((CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)) / n) AS z2n
      FROM d
    )
    SELECT day, CAST(n AS BIGINT) AS n, CAST(conv AS BIGINT) AS conversions,
           p AS rate,
           (((p + (z2n / CAST(2.0 AS DOUBLE)))
             - (CAST(1.96 AS DOUBLE)
                * sqrt(((p * (CAST(1.0 AS DOUBLE) - p)) / n)
                       + (z2n / (CAST(4.0 AS DOUBLE) * n)))))
            / (CAST(1.0 AS DOUBLE) + z2n)) AS ci_lo,
           (((p + (z2n / CAST(2.0 AS DOUBLE)))
             + (CAST(1.96 AS DOUBLE)
                * sqrt(((p * (CAST(1.0 AS DOUBLE) - p)) / n)
                       + (z2n / (CAST(4.0 AS DOUBLE) * n)))))
            / (CAST(1.0 AS DOUBLE) + z2n)) AS ci_hi
    FROM t
    """,
)
def daily_purchase_rate_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")
    d = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("double").alias("conv"),
    )
    z = F.lit(1.96)
    p = F.col("conv") / F.col("n")
    z2n = (z * z) / F.col("n")
    center = p + (z2n / F.lit(2.0))
    margin = z * F.sqrt(
        ((p * (F.lit(1.0) - p)) / F.col("n"))
        + (z2n / (F.lit(4.0) * F.col("n")))
    )
    denom = F.lit(1.0) + z2n
    return d.select(
        "day",
        F.col("n").cast("long").alias("n"),
        F.col("conv").cast("long").alias("conversions"),
        p.alias("rate"),
        ((center - margin) / denom).alias("ci_lo"),
        ((center + margin) / denom).alias("ci_hi"),
    )


# --------------------------------------------------------------------------
# Time-series similarity search over per-user daily value series
# (paper-grounded: distributed TS similarity / iSAX-style blocking).
# Shared preprocessing: global-spine alignment, zero gap-fill, exact
# fixed-point z-normalization. The blocked query is the scale path
# (SAX-word collisions only); the brute-force top-k is the
# ground-truth verifier, like ann_bruteforce_topk.
# --------------------------------------------------------------------------
_TS_CTES = """
    daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    spine AS (
      SELECT u.user_id, CAST(gs.d AS DATE) AS day
      FROM (SELECT DISTINCT user_id FROM daily) u,
           (SELECT UNNEST(generate_series((SELECT MIN(day) FROM daily),
                                          (SELECT MAX(day) FROM daily),
                                          INTERVAL 1 DAY)) AS d) gs
    ),
    filled AS (
      SELECT s.user_id, s.day,
             CAST(floor(COALESCE(d.v, CAST(0.0 AS DOUBLE)) * 100)
                  AS BIGINT) AS cents
      FROM spine s LEFT JOIN daily d USING (user_id, day)
    ),
    stats AS (
      SELECT user_id, COUNT(*) AS n,
             (CAST(SUM(cents) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE)) AS mu,
             sqrt((CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE))
                  - ((CAST(SUM(cents) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE))
                     * (CAST(SUM(cents) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE)))) AS sigma
      FROM filled GROUP BY user_id
    ),
    z AS (
      SELECT f.user_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY f.user_id ORDER BY f.day) AS INT) - 1 AS idx,
             ((CAST(f.cents AS DOUBLE) - s.mu) / s.sigma) AS zv,
             s.n
      FROM filled f JOIN stats s USING (user_id)
      WHERE s.sigma > 0
    )
"""

_TS_DIST = """
      SELECT a.user_id AS key_a, b.user_id AS key_b,
             (CAST(SUM(CAST(floor(((a.zv - b.zv) * (a.zv - b.zv))
                    * CAST(1e12 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
              / CAST(1e12 AS DOUBLE)) AS dist
"""


@register(
    "ts_similarity_blocked_pairs",
    f"""
    WITH {_TS_CTES},
    paa AS (
      SELECT user_id, CAST(floor(idx * 6 / n) AS INT) AS seg,
             (CAST(SUM(CAST(floor(zv * CAST(1e10 AS DOUBLE)) AS BIGINT))
                   AS DOUBLE)
              / (CAST(COUNT(*) AS DOUBLE) * CAST(1e10 AS DOUBLE)))
               AS segmu
      FROM z GROUP BY 1, 2
    ),
    sax AS (
      SELECT user_id, string_agg(
        CASE WHEN segmu < CAST(-0.6745 AS DOUBLE) THEN 'a'
             WHEN segmu < CAST(0.0 AS DOUBLE) THEN 'b'
             WHEN segmu < CAST(0.6745 AS DOUBLE) THEN 'c'
             ELSE 'd' END, '' ORDER BY seg) AS word
      FROM paa GROUP BY user_id
    ),
    cand AS (
      SELECT x.user_id AS key_a, y.user_id AS key_b
      FROM sax x JOIN sax y
        ON x.word = y.word AND x.user_id < y.user_id
    ),
    dists AS (
      {_TS_DIST}
      FROM cand c
      JOIN z a ON a.user_id = c.key_a
      JOIN z b ON b.user_id = c.key_b AND b.idx = a.idx
      GROUP BY a.user_id, b.user_id
    )
    SELECT key_a, key_b, dist FROM dists
    """,
)
def ts_similarity_blocked_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import sax_words, ts_similarity_pairs, znorm_series

    e = load_tables(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v")
    )
    # eager checkpoint: SAX blocking and the verify pass read z as
    # concurrent branches of one action (the r12 rule)
    z = znorm_series(daily).localCheckpoint()
    blocks = sax_words(z, segments=6)
    return ts_similarity_pairs(z, blocks).select(
        "key_a", "key_b", "dist"
    )


@register(
    "ts_similarity_bruteforce_topk",
    f"""
    WITH {_TS_CTES.replace("FROM events GROUP BY",
                           "FROM events WHERE user_id < 300 GROUP BY")},
    dists AS (
      {_TS_DIST}
      FROM z a JOIN z b
        ON a.idx = b.idx AND a.user_id < b.user_id
      GROUP BY a.user_id, b.user_id
    )
    SELECT key_a, key_b, dist, CAST(rank AS BIGINT) AS rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY dist ASC, key_a ASC, key_b ASC) AS rank
      FROM dists
    ) WHERE rank <= 20
    """,
)
def ts_similarity_bruteforce_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Ground-truth verifier for the SAX-blocked path — like
    ``ann_bruteforce_topk``, BOUNDED by construction: all-pairs cost
    is users², so the exact scan runs on a fixed user slice
    (< 300 — the full population at sf≤0.01) and stays a
    constant-size job at any corpus scale."""
    from pyspark.sql import Window

    from ..operators.timeseries import ts_similarity_pairs, znorm_series

    e = load_tables(spark, sf_dir, "events").filter(F.col("user_id") < 300)
    daily = e.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v")
    )
    z = znorm_series(daily)
    w = Window.orderBy(F.asc("dist"), F.asc("key_a"), F.asc("key_b"))
    return (
        ts_similarity_pairs(z)
        .select("key_a", "key_b", "dist")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 20)
    )


# --------------------------------------------------------------------------
# Label-noise scan: points whose nearest label centroid (cosine) is
# not their own label — the first-pass mislabel detector over the
# embeddings table. Centroids are the exact fixed-point means of
# label_centroid_quality, so the whole scan replays in SQL.
# --------------------------------------------------------------------------
@register(
    "label_noise_scan",
    """
    WITH m AS (
      SELECT label, d.i AS i,
             CAST(SUM(CAST(floor(CAST(embedding[d.i] AS DOUBLE) * 1e10)
                           AS BIGINT)) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * 1e10) AS mu
      FROM embeddings CROSS JOIN (SELECT UNNEST(range(1, 65)) AS i) d
      GROUP BY label, d.i
    ),
    cent AS (SELECT label, list(mu ORDER BY i) AS cvec FROM m GROUP BY label),
    cn AS (
      SELECT label, cvec,
             sqrt(list_reduce(list_transform(cvec, x -> x * x),
                              (acc, v) -> acc + v)) AS cnorm
      FROM cent
    ),
    e AS (
      SELECT vec_id, label, embedding,
             sqrt(list_reduce(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (acc, v) -> acc + v)) AS nrm
      FROM embeddings
    ),
    allcos AS (
      SELECT e.vec_id, e.label AS own_label, c.label AS cand_label,
             list_reduce(list_transform(range(1, 65), i ->
                 CAST(e.embedding[i] AS DOUBLE) * c.cvec[i]),
                 (acc, v) -> acc + v) / (e.nrm * c.cnorm) AS cs
      FROM e CROSS JOIN cn c
    ),
    near AS (
      SELECT vec_id, own_label, cand_label AS nearest_label,
             cs AS nearest_cos
      FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY cs DESC, cand_label ASC) AS rnk
        FROM allcos
      ) WHERE rnk = 1
    ),
    own AS (
      SELECT vec_id, cs AS own_cos FROM allcos
      WHERE own_label = cand_label
    )
    SELECT n.vec_id, CAST(n.own_label AS INT) AS label,
           CAST(n.nearest_label AS INT) AS nearest_label,
           o.own_cos, n.nearest_cos
    FROM near n JOIN own o USING (vec_id)
    WHERE n.nearest_label <> n.own_label
    """,
)
def label_noise_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import label_noise_candidates

    em = load_tables(spark, sf_dir, "embeddings")
    return label_noise_candidates(em)
