"""Round-4 registry surface: lexical search, tokenizer prep, and
corpus-health operators.

- BPE pair counting (distributed tokenizer-training inner loop)
- inverted-index BM25 top-k (lexical retrieval baseline)
- TF-IDF cosine near-dup pairs (df-pruned posting-list join)
- hybrid retrieval (BM25 candidates → embedding-cosine rerank)
- duplicate-cluster size histogram (dataset health)
- per-group quota sampling (source caps in corpus mixes)
- per-label embedding centroid QA (exact fixed-point means)
- daily-series linear gap interpolation; per-type z-score outliers

Determinism notes: BM25's per-document score sums pivot the literal
query-term list into columns added left-to-right (no engine-chosen
float accumulation); centroid means and mean-cosine accumulate as
floor-quantized integers (the kmeans trainer's discipline) so the
oracle replays them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from . import register

# --------------------------------------------------------------------------
# BPE trainer inner loop: adjacent symbol-pair counts over the word-
# frequency table (vocabulary-sized, not corpus-sized).
# --------------------------------------------------------------------------


@register(
    "bpe_pair_counts",
    """
    WITH words AS (
      SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents
    ),
    wf AS (SELECT w, COUNT(*) AS f FROM words WHERE w <> '' GROUP BY w),
    pairs AS (
      SELECT substr(w, CAST(i AS INT), 2) AS pair, w, f
      FROM (SELECT w, f, UNNEST(range(1, CAST(len(w) AS BIGINT))) AS i
            FROM wf WHERE len(w) >= 2)
    )
    SELECT pair, CAST(SUM(f) AS BIGINT) AS pair_count,
           CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words
    FROM pairs GROUP BY pair
    ORDER BY pair_count DESC, pair LIMIT 200
    """,
)
def bpe_pair_counts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bpe_pair_counts

    d = load_tables(spark, sf_dir, "documents")
    return bpe_pair_counts(d, top_k=200)


# --------------------------------------------------------------------------
# BM25 keyword retrieval: posting-list equi-join only (never the
# whole corpus), fixed-order float accumulation via term pivot.
# --------------------------------------------------------------------------
_BM25_TERMS = ["filter", "hash", "join"]  # kept sorted


def _bm25_oracle(terms: list[str], k: int) -> str:
    # bm25_topk sorts+dedups its term list before pivoting, and the
    # pivot order IS the float accumulation order — sort here too so
    # the contract cannot be broken by a caller passing unsorted terms
    terms = sorted(set(terms))
    # idf quantized to an 1e-8 grid: JVM Math.log vs libm ln differ
    # by 1 ulp on this corpus's inputs — see operators/search.py
    idf = (
        "(floor(ln(CAST(1.0 AS DOUBLE) + ((CAST(n_docs AS DOUBLE)"
        " - CAST(df_t AS DOUBLE) + CAST(0.5 AS DOUBLE))"
        " / (CAST(df_t AS DOUBLE) + CAST(0.5 AS DOUBLE))))"
        " * CAST(1e8 AS DOUBLE)) / CAST(1e8 AS DOUBLE))"
    )
    # outer parens matter: the score is idf * ((tf*2.2)/denom),
    # Spark's association — without them SQL would fold idf*tf*2.2
    # first and drift by an ulp
    norm = (
        "(CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE)"
        " / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)"
        " * (CAST(0.25 AS DOUBLE) + ((CAST(0.75 AS DOUBLE)"
        " * CAST(dl AS DOUBLE)) / avgdl))))"
    )
    in_list = ", ".join(f"'{t}'" for t in terms)
    pivots = ",\n           ".join(
        f"SUM(CASE WHEN token = '{t}' THEN s END) AS s_{i}"
        for i, t in enumerate(terms)
    )
    total = "COALESCE(s_0, CAST(0 AS DOUBLE))"
    for i in range(1, len(terms)):
        total = f"({total} + COALESCE(s_{i}, CAST(0 AS DOUBLE)))"
    hits = " + ".join(
        f"CASE WHEN s_{i} IS NOT NULL THEN 1 ELSE 0 END"
        for i in range(len(terms))
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, t.token FROM documents,
        UNNEST(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    idx AS (
      SELECT token, doc_id, COUNT(*) AS tf FROM toks
      WHERE token IN ({in_list}) GROUP BY token, doc_id
    ),
    dls AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dls
    ),
    dfreq AS (SELECT token, COUNT(DISTINCT doc_id) AS df_t
              FROM idx GROUP BY token),
    scored AS (
      SELECT idx.doc_id, idx.token, {idf} * {norm} AS s
      FROM idx JOIN dfreq USING (token) JOIN dls USING (doc_id), stats
    ),
    per_doc AS (
      SELECT doc_id,
           {pivots}
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, {total} AS score,
           CAST(0 + {hits} AS BIGINT) AS n_terms_hit
    FROM per_doc
    ORDER BY score DESC, doc_id LIMIT {k}
    """


@register("bm25_search_topk", _bm25_oracle(_BM25_TERMS, 20))
def bm25_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import bm25_topk

    d = load_tables(spark, sf_dir, "documents")
    return bm25_topk(d, _BM25_TERMS, k=20)


# --------------------------------------------------------------------------
# Dataset health: exact-duplicate cluster size distribution.
# --------------------------------------------------------------------------
@register(
    "dup_cluster_histogram",
    """
    WITH c AS (
      SELECT md5(substr(text, 1, 40)) AS h, COUNT(*) AS cluster_size
      FROM documents GROUP BY 1
    )
    SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(cluster_size) AS BIGINT) AS n_docs
    FROM c GROUP BY cluster_size ORDER BY cluster_size
    """,
)
def dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clusters on a 40-char text prefix (boilerplate-header
    clustering) rather than the full text — this synthetic corpus
    has no exact full-text duplicates, and a histogram with one row
    proves nothing; prefix clusters exercise the real distribution
    shape. Full-text clustering is the operator's default."""
    from ..operators.dedup import cluster_size_histogram

    d = load_tables(spark, sf_dir, "documents")
    return cluster_size_histogram(
        d, F.md5(F.substring(F.col("text"), 1, 40))
    )


# --------------------------------------------------------------------------
# Corpus mixing: deterministic per-source cap.
# --------------------------------------------------------------------------
@register(
    "quota_sample_sources",
    """
    SELECT source, doc_id, rank_in_group FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rank_in_group
      FROM documents
    ) WHERE rank_in_group <= 10
    """,
)
def quota_sample_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import quota_sample

    d = load_tables(spark, sf_dir, "documents")
    return quota_sample(d, "source", "doc_id", 10).select(
        "source", "doc_id", F.col("rank_in_group").cast("long").alias(
            "rank_in_group"
        )
    )


# --------------------------------------------------------------------------
# Embedding QA: per-label centroid cohesion with exact fixed-point
# means (the kmeans trainer's replayable-arithmetic discipline).
# --------------------------------------------------------------------------
@register(
    "label_centroid_quality",
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
    cos AS (
      SELECT e.label,
             c.cnorm,
             list_reduce(list_transform(range(1, 65), i ->
                 CAST(e.embedding[i] AS DOUBLE) * c.cvec[i]),
                 (acc, v) -> acc + v) / (e.nrm * c.cnorm) AS cs
      FROM e JOIN cn c USING (label)
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           MAX(cnorm) AS centroid_norm,
           CAST(SUM(CAST(floor(cs * 1e12) AS BIGINT)) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * 1e12) AS mean_cos,
           MIN(cs) AS min_cos, MAX(cs) AS max_cos
    FROM cos GROUP BY label
    """,
)
def label_centroid_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import label_centroid_stats

    em = load_tables(spark, sf_dir, "embeddings")
    return label_centroid_stats(em)


# --------------------------------------------------------------------------
# Sparse lexical near-dup: TF-IDF cosine over posting lists with a
# df-prune (the quadratic-cost cap). Folds are token-ordered on both
# engines (sort_array ≡ list(... ORDER BY token)).
# --------------------------------------------------------------------------
@register(
    "tfidf_cosine_pairs",
    """
    WITH toks AS (
      SELECT doc_id, t.token FROM documents,
        UNNEST(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    idx AS (SELECT token, doc_id, COUNT(*) AS tf FROM toks
            GROUP BY token, doc_id),
    nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
    pruned AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df_t FROM idx
      GROUP BY token HAVING COUNT(DISTINCT doc_id) <= 50
    ),
    weighted AS (
      SELECT idx.doc_id, idx.token,
             CAST(tf AS DOUBLE)
               * (floor(ln(CAST(n AS DOUBLE) / CAST(df_t AS DOUBLE))
                        * CAST(1e8 AS DOUBLE)) / CAST(1e8 AS DOUBLE)) AS w
      FROM idx JOIN pruned USING (token), nd
    ),
    norms AS (
      SELECT doc_id,
             sqrt(list_reduce(
               list_transform(list(w ORDER BY token), x -> x * x),
               (acc, v) -> acc + v)) AS nrm
      FROM weighted GROUP BY doc_id
    ),
    dots AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             list_reduce(list(a.w * b.w ORDER BY a.token),
                         (acc, v) -> acc + v) AS dot
      FROM weighted a JOIN weighted b
        ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, dot / (na.nrm * nb.nrm) AS cosine
    FROM dots
    JOIN norms na ON na.doc_id = dots.id_a
    JOIN norms nb ON nb.doc_id = dots.id_b
    WHERE dot / (na.nrm * nb.nrm) >= CAST(0.3 AS DOUBLE)
    """,
)
def tfidf_cosine_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import tfidf_cosine_pairs

    d = load_tables(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(d, threshold=0.3, max_df=50)


# --------------------------------------------------------------------------
# Time-series repair: per-user daily value series with interior gaps
# linearly interpolated (operators/timeseries.py). Windows with
# IGNORE NULLS exist in both engines; the interpolation expression
# uses one fixed association so doubles match bit-for-bit.
# --------------------------------------------------------------------------
@register(
    "interpolated_daily_values",
    """
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events WHERE user_id < 40 GROUP BY 1, 2
    ),
    spine AS (
      SELECT b.user_id, CAST(gs.d AS DATE) AS day
      FROM (SELECT user_id, MIN(day) AS lo, MAX(day) AS hi
            FROM daily GROUP BY user_id) b,
           LATERAL (SELECT UNNEST(generate_series(b.lo, b.hi,
                                  INTERVAL 1 DAY)) AS d) gs
    ),
    j AS (
      SELECT s.user_id, s.day, d.v
      FROM spine s LEFT JOIN daily d USING (user_id, day)
    ),
    w AS (
      SELECT user_id, day, v,
        last_value(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS UNBOUNDED PRECEDING) AS pv,
        last_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS pd,
        first_value(v IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY day
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN v IS NOT NULL THEN day END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM j
    )
    SELECT user_id, day,
           CASE WHEN v IS NOT NULL THEN v
                ELSE (pv + ((nv - pv)
                  * (CAST(date_diff('day', pd, day) AS DOUBLE)
                     / CAST(date_diff('day', pd, nd) AS DOUBLE))))
           END AS v_filled,
           v IS NULL AS is_interpolated
    FROM w
    """,
)
def interpolated_daily_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import linear_interpolate_gaps

    e = load_tables(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    daily = (
        e.groupBy(
            "user_id", F.col("ts").cast("date").alias("day")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("v")
        )
    )
    return linear_interpolate_gaps(daily, "user_id", "day", "v")


# --------------------------------------------------------------------------
# Anomaly flagging: per-event-type z-score outliers. Moments are
# exact integer sums of fixed-point cents (floor(value*100)), so
# mean/variance/z are identical doubles on both engines — the
# winsorize/quantile family's cheap streaming-friendly sibling.
# --------------------------------------------------------------------------
@register(
    "event_value_outliers",
    """
    WITH c AS (
      SELECT event_id, event_type,
             value,
             CAST(floor(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    m AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
             sqrt((CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE))
                  - ((CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                     * (CAST(SUM(cents) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE)))) AS sigma
      FROM c GROUP BY event_type
    )
    SELECT c.event_id, c.event_type, c.value,
           ((CAST(c.cents AS DOUBLE) - m.mu) / m.sigma) AS z
    FROM c JOIN m USING (event_type)
    WHERE abs((CAST(c.cents AS DOUBLE) - m.mu) / m.sigma)
            > CAST(3.0 AS DOUBLE)
    """,
)
def event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")
    c = e.select(
        "event_id",
        "event_type",
        "value",
        F.floor(F.col("value") * F.lit(100)).alias("cents"),
    )
    n = F.count(F.lit(1))
    sum_c = F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
    # cast BEFORE multiplying: a long*long product overflows 2^63 for
    # |value| >= ~3e8 and Spark would wrap silently (DuckDB's mirror
    # widens to HUGEINT for the same reason)
    cents_dec = F.col("cents").cast("decimal(38,0)")
    sum_c2 = F.sum(cents_dec * cents_dec).cast("double")
    mu = sum_c / n.cast("double")
    m = c.groupBy("event_type").agg(
        n.alias("n"),
        mu.alias("mu"),
        F.sqrt((sum_c2 / n.cast("double")) - (mu * mu)).alias("sigma"),
    )
    z = (F.col("cents").cast("double") - F.col("mu")) / F.col("sigma")
    return (
        c.join(F.broadcast(m), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) > F.lit(3.0))
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: BM25 candidates -> embedding-cosine rerank. The
# oracle wraps the (already hash-proven) BM25 SQL as a candidate
# subquery and reranks via the fold-based cosine, mirroring the
# two-stage operator exactly.
# --------------------------------------------------------------------------
_HYBRID_QV = 7
_HYBRID_CANDS = 50
_HYBRID_K = 10

_HYBRID_ORACLE = f"""
    WITH cand AS (
      SELECT doc_id, score FROM ({_bm25_oracle(_BM25_TERMS, _HYBRID_CANDS)})
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
           WHERE vec_id = {_HYBRID_QV}),
    scored AS (
      SELECT c.doc_id, c.score,
             list_reduce(list_transform(range(1, 65), i ->
                 CAST(qv.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                 (acc, v) -> acc + v) / (qv.qn * e.nrm) AS cosine
      FROM cand c JOIN n e ON e.vec_id = c.doc_id, qv
    )
    SELECT doc_id, score, cosine, rank FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= {_HYBRID_K}
    """


@register("hybrid_search_topk", _HYBRID_ORACLE)
def hybrid_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import hybrid_topk

    d, em = (
        load_tables(spark, sf_dir, "documents"),
        load_tables(spark, sf_dir, "embeddings"),
    )
    return hybrid_topk(
        d,
        em,
        _BM25_TERMS,
        query_vec_id=_HYBRID_QV,
        n_candidates=_HYBRID_CANDS,
        k=_HYBRID_K,
    )
