"""Round-4e registry surface: multi-probe ANN, corpus-mix
allocation, n-gram novelty, robust stats, the window-function
toolbox, and threshold sweeps.

- multi-probe LSH recall certificate (single-bucket vs bit-flip
  probing vs brute force — recall for free, no extra tables)
- temperature-scaled source allocation (sqrt-share multinomial mix
  with largest-remainder integer seats)
- per-document 5-gram novelty (memorization/diversity signal)
- median/MAD robust outlier report per event type
- the window-function toolbox over orders (lag/lead/ntile/
  percent_rank/cume_dist in one pass)
- precision/recall threshold sweep of an embedding-projection
  scorer against labels

Determinism notes: sqrt is IEEE correctly-rounded so the
temperature weights are engine-exact (alpha is pinned to 0.5 —
other temperatures would need pow(), which is not); medians are
exact two-middle-rows averages, never interpolating estimators;
percent_rank/cume_dist are exact integer ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_tables
from . import register
from .similarity import _BUCKET, _COS, _NORM_CTE

# --------------------------------------------------------------------------
# Multi-probe LSH recall certificate.
# --------------------------------------------------------------------------
_MP_K = 5
_MP_NQ = 10

_MP_ORACLE = f"""
    WITH {_NORM_CTE},
    b AS (
      SELECT vec_id,
             CAST({_BUCKET.format(e='embedding')} AS BIGINT) AS bucket
      FROM embeddings
    ),
    nb AS (SELECT n.*, b.bucket FROM n JOIN b USING (vec_id)),
    qv AS (SELECT * FROM nb WHERE vec_id < {_MP_NQ}),
    qp AS (
      SELECT qv.vec_id, qv.embedding, qv.nrm, u.pb AS bucket
      FROM qv, UNNEST([qv.bucket, xor(qv.bucket, 1), xor(qv.bucket, 2),
                       xor(qv.bucket, 4), xor(qv.bucket, 8)]) AS u(pb)
    ),
    mcand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_COS} AS cosine
      FROM qp q JOIN nb c
        ON q.bucket = c.bucket AND c.vec_id != q.vec_id
    ),
    ncand AS (
      SELECT query_id, COUNT(*) AS n_cand FROM mcand GROUP BY query_id
    ),
    mtop AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS rnk FROM mcand
      ) WHERE rnk <= {_MP_K}
    ),
    scand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_COS} AS cosine
      FROM qv q JOIN nb c
        ON q.bucket = c.bucket AND c.vec_id != q.vec_id
    ),
    stop AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS rnk FROM scand
      ) WHERE rnk <= {_MP_K}
    ),
    sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_COS} AS cosine
      FROM qv q JOIN n c ON c.vec_id != q.vec_id
    ),
    bf AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS rnk FROM sims
      ) WHERE rnk <= {_MP_K}
    ),
    hs AS (
      SELECT bf.query_id, COUNT(stop.neighbor_id) AS h
      FROM bf LEFT JOIN stop
        ON bf.query_id = stop.query_id
       AND bf.neighbor_id = stop.neighbor_id
      GROUP BY bf.query_id
    ),
    hm AS (
      SELECT bf.query_id, COUNT(mtop.neighbor_id) AS h
      FROM bf LEFT JOIN mtop
        ON bf.query_id = mtop.query_id
       AND bf.neighbor_id = mtop.neighbor_id
      GROUP BY bf.query_id
    )
    SELECT hs.query_id,
           CAST(ncand.n_cand AS BIGINT) AS n_cand_multi,
           CAST(hs.h AS BIGINT) AS n_hits_single,
           CAST(hm.h AS BIGINT) AS n_hits_multi,
           (CAST(hs.h AS DOUBLE) / CAST({_MP_K}.0 AS DOUBLE))
             AS recall_single,
           (CAST(hm.h AS DOUBLE) / CAST({_MP_K}.0 AS DOUBLE))
             AS recall_multi
    FROM hs JOIN hm USING (query_id) JOIN ncand USING (query_id)
    """


@register("ann_multiprobe_recall", _MP_ORACLE)
def ann_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of single-bucket LSH vs multi-probe LSH (the exact
    bucket plus its 4 single-bit-flip neighbors) against brute
    force, with the multi-probe candidate count — the certificate
    showing probing buys recall without extra hash tables, and what
    it costs in candidates."""
    from ..operators.similarity import (
        cosine_topk,
        lsh_buckets,
        lsh_topk,
        multiprobe_lsh_topk,
        probe_buckets,
    )

    em = load_tables(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < _MP_NQ)
    bf = cosine_topk(em, q, k=_MP_K).select("query_id", "neighbor_id")
    single = lsh_topk(em, q, k=_MP_K).select(
        "query_id", F.col("neighbor_id").alias("s_n")
    )
    multi = multiprobe_lsh_topk(em, q, k=_MP_K).select(
        "query_id", F.col("neighbor_id").alias("m_n")
    )
    cb = lsh_buckets(em).select(
        F.col("vec_id").alias("neighbor_id"), "bucket"
    )
    qb = lsh_buckets(q)
    probes = probe_buckets(F.col("bucket"), 4)
    qp = qb.select(
        F.col("vec_id").alias("query_id"),
        F.explode(probes).alias("bucket"),
    )
    ncand = (
        qp.join(cb, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_cand_multi"))
    )
    hs = (
        bf.join(
            single,
            (bf.query_id == single.query_id)
            & (bf.neighbor_id == single.s_n),
            "left",
        )
        .groupBy(bf.query_id)
        .agg(F.count("s_n").alias("n_hits_single"))
    )
    hm = (
        bf.join(
            multi,
            (bf.query_id == multi.query_id)
            & (bf.neighbor_id == multi.m_n),
            "left",
        )
        .groupBy(bf.query_id)
        .agg(F.count("m_n").alias("n_hits_multi"))
    )
    return (
        hs.join(hm, "query_id")
        .join(ncand, "query_id")
        .select(
            "query_id",
            F.col("n_cand_multi").cast("long").alias("n_cand_multi"),
            F.col("n_hits_single").cast("long").alias("n_hits_single"),
            F.col("n_hits_multi").cast("long").alias("n_hits_multi"),
            (
                F.col("n_hits_single").cast("double")
                / F.lit(float(_MP_K))
            ).alias("recall_single"),
            (
                F.col("n_hits_multi").cast("double") / F.lit(float(_MP_K))
            ).alias("recall_multi"),
        )
    )


# --------------------------------------------------------------------------
# Temperature-scaled corpus mix.
# --------------------------------------------------------------------------
_MIX_TOTAL = 10000


@register(
    "source_temperature_mix",
    f"""
    WITH c AS (
      SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
    ),
    t AS (SELECT SUM(n_docs) AS t FROM c),
    w AS (
      SELECT source, n_docs,
             (CAST(n_docs AS DOUBLE) / CAST(t.t AS DOUBLE)) AS share,
             sqrt(CAST(n_docs AS DOUBLE) / CAST(t.t AS DOUBLE)) AS wv
      FROM c CROSS JOIN t
    ),
    ws AS (
      SELECT list_reduce(list_sort(list(wv)), (acc, x) -> acc + x) AS ws
      FROM w
    ),
    s AS (
      SELECT source, n_docs, share, (wv / ws.ws) AS temp_share
      FROM w CROSS JOIN ws
    ),
    seats AS (
      SELECT *,
             CAST(floor(CAST({_MIX_TOTAL} AS DOUBLE) * temp_share)
                  AS BIGINT) AS base,
             (CAST({_MIX_TOTAL} AS DOUBLE) * temp_share
              - floor(CAST({_MIX_TOTAL} AS DOUBLE) * temp_share)) AS frac
      FROM s
    ),
    lft AS (SELECT {_MIX_TOTAL} - SUM(base) AS lf FROM seats)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs, share, temp_share,
           CAST(base + CASE WHEN ROW_NUMBER() OVER (
                  ORDER BY frac DESC, source ASC) <= lft.lf
                THEN 1 ELSE 0 END AS BIGINT) AS alloc_docs
    FROM seats CROSS JOIN lft
    """,
)
def source_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many of a 10k-document training mix each source
    contributes under sqrt-share temperature flattening (alpha=0.5),
    with largest-remainder integer seats that sum exactly to the
    budget — the corpus-mixing step that keeps one dominant crawl
    from drowning small high-quality sources."""
    from ..operators.sampling import temperature_allocation

    d = load_tables(spark, sf_dir, "documents")
    return temperature_allocation(d, "source", total=_MIX_TOTAL)


# --------------------------------------------------------------------------
# Per-document n-gram novelty.
# --------------------------------------------------------------------------
@register(
    "doc_novelty_scores",
    """
    WITH sh AS (
      SELECT DISTINCT doc_id,
             array_to_string(
               s[CAST(u.i AS INT):CAST(u.i AS INT) + 4], ' ') AS shingle
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS s
            FROM documents) d,
           UNNEST(range(1, CAST(len(s) AS BIGINT) - 3)) AS u(i)
      WHERE len(s) >= 5
    ),
    f AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
    per AS (
      SELECT doc_id, COUNT(*) AS ns,
             SUM(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS nn
      FROM sh JOIN f USING (shingle) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(ns, 0) AS BIGINT) AS n_shingles,
           CAST(COALESCE(nn, 0) AS BIGINT) AS n_novel,
           CASE WHEN COALESCE(ns, 0) > 0
                THEN CAST(nn AS DOUBLE) / CAST(ns AS DOUBLE)
           END AS novelty
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
)
def doc_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of each document's distinct 5-gram shingles that
    appear in no other document — the memorization/diversity signal
    curation reads next to the dup rate. One shingle explode +
    frequency aggregate + equi-join back; no pair joins."""
    from ..operators.text import novelty_scores

    d = load_tables(spark, sf_dir, "documents")
    return novelty_scores(d, n=5)


# --------------------------------------------------------------------------
# Robust median/MAD outlier report.
# --------------------------------------------------------------------------
@register(
    "value_median_mad_by_type",
    """
    WITH sized AS (
      SELECT event_type, CAST(value AS DOUBLE) AS v, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY CAST(value AS DOUBLE),
               event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events
    ),
    med AS (
      SELECT event_type,
             ((MIN(v) + MAX(v)) / CAST(2.0 AS DOUBLE)) AS median
      FROM sized
      WHERE rn = floor((n + 1) / 2) OR rn = floor((n + 2) / 2)
      GROUP BY event_type
    ),
    dev AS (
      SELECT s.event_type, s.v, s.event_id, m.median,
             abs(s.v - m.median) AS d
      FROM sized s JOIN med m USING (event_type)
    ),
    dmid AS (
      SELECT event_type,
             ((MIN(d) + MAX(d)) / CAST(2.0 AS DOUBLE)) AS mad
      FROM (
        SELECT event_type, d,
               ROW_NUMBER() OVER (
                 PARTITION BY event_type ORDER BY d, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM dev
      )
      WHERE rn = floor((n + 1) / 2) OR rn = floor((n + 2) / 2)
      GROUP BY event_type
    )
    SELECT dev.event_type, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(dev.median) AS median, MIN(dmid.mad) AS mad,
           CAST(SUM(CASE WHEN dev.d > CAST(3.0 AS DOUBLE)
                              * (CAST(1.4826 AS DOUBLE) * dmid.mad)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev JOIN dmid USING (event_type)
    GROUP BY dev.event_type
    """,
)
def value_median_mad_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median, MAD, and robust-z outlier counts of the event
    value per type — the heavy-tail-safe twin of the z-score scan
    (`event_value_outliers`): mean/stddev are dragged by the very
    outliers they hunt, medians aren't. Medians are exact
    two-middle-row averages (deterministic under the event_id
    tiebreak), never estimator-interpolated."""
    from ..operators.drift import median_mad

    e = load_tables(spark, sf_dir, "events")
    return median_mad(e, "value", ["event_type"], "event_id", z=3.0)


# --------------------------------------------------------------------------
# Window-function toolbox.
# --------------------------------------------------------------------------
@register(
    "window_toolbox_orders",
    """
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           lag(o_totalprice) OVER wt AS prev_price,
           lead(o_totalprice) OVER wt AS next_price,
           CAST(ROW_NUMBER() OVER wt AS BIGINT) AS order_seq,
           CAST(NTILE(4) OVER wp AS INT) AS price_quartile,
           percent_rank() OVER wp AS price_pct_rank,
           cume_dist() OVER wp AS price_cume_dist
    FROM orders WHERE o_custkey < 200
    WINDOW wt AS (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey),
           wp AS (PARTITION BY o_custkey
                  ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_toolbox_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The analytic window-function surface in one pass per
    customer: lag/lead over order time, row_number sequence, NTILE
    quartiles, percent_rank and cume_dist over spend — exact
    integer-ratio semantics in both engines (ties broken by
    o_orderkey so every function is deterministic)."""
    o = load_tables(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < 200
    )
    wt = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    wp = Window.partitionBy("o_custkey").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.lag("o_totalprice").over(wt).alias("prev_price"),
        F.lead("o_totalprice").over(wt).alias("next_price"),
        F.row_number().over(wt).cast("long").alias("order_seq"),
        F.ntile(4).over(wp).cast("int").alias("price_quartile"),
        F.percent_rank().over(wp).alias("price_pct_rank"),
        F.cume_dist().over(wp).alias("price_cume_dist"),
    )


# --------------------------------------------------------------------------
# Precision/recall threshold sweep.
# --------------------------------------------------------------------------
_PR_PROJ = """list_reduce(list_transform(range(1, 65),
        d -> CAST(embedding[d] AS DOUBLE)
             * ((ascii(substr(md5('p0_' || CAST(d AS VARCHAR)), 1, 1))
                 % 2) * 2 - 1)),
        (acc, v) -> acc + v)"""
_PR_NT = 9


@register(
    "quality_pr_curve",
    f"""
    WITH base AS (
      SELECT {_PR_PROJ} AS s, (label = 0) AS y FROM embeddings
    ),
    span AS (SELECT MIN(s) AS mn, MAX(s) AS mx FROM base),
    spine AS (
      SELECT CAST(u.i AS INT) AS threshold_idx
      FROM UNNEST(range(1, {_PR_NT + 1})) AS u(i)
    ),
    fanned AS (
      SELECT sp.threshold_idx,
             (sv.mn + (sv.mx - sv.mn)
              * (CAST(sp.threshold_idx AS DOUBLE)
                 / CAST({_PR_NT + 1} AS DOUBLE))) AS t,
             (b.s >= (sv.mn + (sv.mx - sv.mn)
              * (CAST(sp.threshold_idx AS DOUBLE)
                 / CAST({_PR_NT + 1} AS DOUBLE)))) AS pred,
             b.y
      FROM base b CROSS JOIN span sv CROSS JOIN spine sp
    ),
    agg AS (
      SELECT threshold_idx, MIN(t) AS threshold,
             SUM(CASE WHEN pred AND y THEN 1 ELSE 0 END) AS tp,
             SUM(CASE WHEN pred AND NOT y THEN 1 ELSE 0 END) AS fp,
             SUM(CASE WHEN NOT pred AND y THEN 1 ELSE 0 END) AS fn
      FROM fanned GROUP BY threshold_idx
    )
    SELECT threshold_idx, threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           CASE WHEN tp + fp > 0
                THEN CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
           END AS precision,
           CASE WHEN tp + fn > 0
                THEN CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
           END AS recall
    FROM agg
    """,
)
def quality_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall sweep of a deterministic embedding-projection
    scorer (the plane-0 LSH projection) against the label-0 class —
    the threshold table behind "where do we cut the quality filter".
    Thresholds are the 9 interior points of the observed score
    range; tp/fp/fn from one hash aggregate over a constant ×9
    fan-out."""
    from ..operators.features import pr_curve
    from ..operators.similarity import plane_projection

    em = load_tables(spark, sf_dir, "embeddings")
    proj = plane_projection(0, 64)
    scored = em.select(
        proj.alias("score"), (F.col("label") == 0).alias("pos")
    )
    return pr_curve(scored, "score", "pos", n_thresholds=_PR_NT)
