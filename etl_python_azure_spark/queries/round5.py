"""Round-5 registry surface: corpus-curation depth + evaluation +
relational completeness.

- containment dedup (asymmetric |A∩B|/|A| — the subset-duplicate
  class Jaccard misses)
- train/val/test split leakage report (exact-dup fingerprints
  crossing hash-split boundaries — the contamination audit every
  corpus split needs)
- Gopher-style quality-rule pass rates per source
- token-budget coverage (which sources fill the training mix, with
  cumulative share)
- embedding norm health (the embedding-table QA gate)
- exact ROC AUC per group via Mann–Whitney rank-sum
- MMR diversified top-k retrieval (greedy λ-tradeoff re-rank)
- Adamic–Adar link prediction on the order bipartite graph
- seasonal-naive MASE screen on daily event series
- wide→long UNPIVOT with per-metric profiles

Determinism: same registry rules as everywhere — integer-ratio
divisions, DECIMAL-exact money/value sums, 1e-8 floor-quantized
transcendental terms (1/ln degree weights, |forecast errors|),
IEEE-exact double compositions with identical operation order in
both dialects, and a unique tiebreaker in every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_tables
from . import register

_HASH32 = (
    "CAST(from_hex(substr(md5(CAST({e} AS VARCHAR)), 1, 8))"
    "::BIT::UBIGINT AS BIGINT)"
)

# --------------------------------------------------------------------------
# Containment dedup: snippet docs (first half of every 7th document)
# are ≥ 0.8 CONTAINED in their source while their Jaccard is ~0.5 —
# the subset-duplicate class that motivates the asymmetric score.
# --------------------------------------------------------------------------


@register(
    "containment_dedup_pairs",
    """
    WITH off AS (SELECT MAX(doc_id) + 1 AS o FROM documents),
    base AS (SELECT doc_id, text FROM documents),
    snip AS (
      SELECT doc_id + (SELECT o FROM off) AS doc_id,
             array_to_string(
               t[1:greatest(len(t) // 2, 3)], ' ') AS text
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS t
            FROM documents WHERE doc_id % 7 = 0)
    ),
    corpus AS (
      SELECT doc_id, lower(text) AS text FROM base
      UNION ALL SELECT doc_id, text FROM snip
    ),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(i.n_inter AS BIGINT) AS n_inter,
           CAST(sa.sz AS BIGINT) AS sz_a,
           CAST(sb.sz AS BIGINT) AS sz_b,
           i.n_inter * 1.0 / sa.sz AS containment_a_in_b,
           i.n_inter * 1.0 / sb.sz AS containment_b_in_a,
           i.n_inter * 1.0 / (sa.sz + sb.sz - i.n_inter) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.n_inter * 1.0 / sa.sz >= 0.8
       OR i.n_inter * 1.0 / sb.sz >= 0.8
    """,
)
def containment_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup detection over a corpus with
    injected snippet-subset documents. A quoted snippet inside a
    longer page has high containment but middling Jaccard — the
    syndication/boilerplate duplicate class. Same shingle-equi-join
    scale shape as the Jaccard verifier (LSH-candidate-restricted at
    100 TB)."""
    from ..operators.dedup import containment_pairs

    d = load_tables(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    # snippet ids must clear the REAL id range at any scale factor
    # (a fixed +20000 collided with genuine doc_ids at the sf1
    # rehearsal, merging two documents' shingle sets under one id);
    # one bounded scalar to the driver, mirrored by the oracle's
    # MAX(doc_id)+1 subquery
    off = d.agg(F.max("doc_id")).first()[0] + 1
    w = F.split(F.col("text"), " ")
    snip = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(off)).alias("doc_id"),
        F.concat_ws(
            " ",
            F.slice(
                w, 1, F.greatest(
                    F.floor(F.size(w) / 2).cast("int"), F.lit(3)
                )
            ),
        ).alias("text"),
    )
    corpus = d.unionByName(snip)
    return containment_pairs(corpus, "doc_id", "text", n=3, threshold=0.8)


# --------------------------------------------------------------------------
# Split leakage: exact-dup fingerprints crossing train/val/test.
# --------------------------------------------------------------------------


@register(
    "split_leakage_report",
    f"""
    WITH h AS (
      SELECT md5(text) AS fp,
             CASE WHEN ({_HASH32.format(e='doc_id')} % 100) < 90
                    THEN 'train'
                  WHEN ({_HASH32.format(e='doc_id')} % 100) < 95
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + (SELECT MAX(doc_id) + 1 FROM documents)
                 AS doc_id, text
        FROM documents WHERE doc_id % 11 = 0
      )
    ),
    ps AS (SELECT DISTINCT fp, split FROM h)
    SELECT a.split AS split_a, b.split AS split_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_fps
    FROM ps a JOIN ps b ON a.fp = b.fp AND a.split < b.split
    GROUP BY 1, 2
    """,
)
def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test contamination audit: content fingerprints that
    appear in MORE than one hash split (re-ingested duplicates get
    fresh doc_ids, land in a different split, and leak evaluation
    data into training). The corpus re-injects every 11th document
    under a new id to model exactly that. Two hash aggregates + one
    fingerprint self-join — the split-hygiene check a corpus build
    runs after every ingest; at 100 TB it shuffles (fp, split)
    pairs, never text."""
    from ..operators.sampling import hash_bucket

    d = load_tables(spark, sf_dir, "documents").select("doc_id", "text")
    # fresh ids must clear the real range at any SF (see the
    # containment query's offset note); bounded scalar + oracle
    # MAX(doc_id)+1 subquery
    off = d.agg(F.max("doc_id")).first()[0] + 1
    reingest = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + F.lit(off)).alias("doc_id"), "text"
    )
    corpus = d.unionByName(reingest)
    b = hash_bucket("doc_id", 100)
    h = corpus.select(
        F.md5("text").alias("fp"),
        F.when(b < 90, "train").when(b < 95, "val").otherwise("test").alias(
            "split"
        ),
    )
    ps = h.distinct()
    a = ps.select(F.col("fp"), F.col("split").alias("split_a"))
    c = ps.select(F.col("fp"), F.col("split").alias("split_b"))
    return (
        a.join(c, "fp")
        .filter(F.col("split_a") < F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_fps"))
    )


# --------------------------------------------------------------------------
# Gopher-style quality rules, aggregated per source.
# --------------------------------------------------------------------------

_GOPHER_SW_SQL = "['the', 'a', 'of', 'and', 'to', 'in', 'is', 'be']"


@register(
    "gopher_quality_report",
    f"""
    WITH t AS (
      SELECT source, string_split(lower(text), ' ') AS w FROM documents
    ),
    f AS (
      SELECT source,
             len(w) AS nw,
             list_reduce(list_transform(w, s -> length(s)),
                         (a, b) -> a + b) AS nchars,
             len(list_filter(w,
                 s -> list_contains({_GOPHER_SW_SQL}, s))) AS nstop,
             len(list_distinct(w)) AS ndist
      FROM t
    ),
    r AS (
      SELECT source,
             CASE WHEN nw >= 10 AND nw <= 100000 THEN 1 ELSE 0 END AS r1,
             CASE WHEN nchars * 1.0 / nw >= 2.0
                   AND nchars * 1.0 / nw <= 10.0 THEN 1 ELSE 0 END AS r2,
             CASE WHEN nstop * 1.0 / nw >= 0.02 THEN 1 ELSE 0 END AS r3,
             CASE WHEN ndist * 1.0 / nw >= 0.2 THEN 1 ELSE 0 END AS r4
      FROM f
    )
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(r1) AS BIGINT) AS n_ok_word_count,
           CAST(SUM(r2) AS BIGINT) AS n_ok_mean_word_len,
           CAST(SUM(r3) AS BIGINT) AS n_ok_stopword_frac,
           CAST(SUM(r4) AS BIGINT) AS n_ok_distinct_ratio,
           (CAST(SUM(r1 * r2 * r3 * r4) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) AS pass_all_rate
    FROM r GROUP BY source
    """,
)
def gopher_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source pass rates of the Gopher-style quality rules
    (word-count bounds, mean word length, stopword fraction,
    distinct-word ratio) — the pre-training filter scorecard that
    decides which sources need cleaning before the mix. One
    tokenization, pure Column expressions, integer-ratio rules."""
    from ..operators.text import gopher_quality_flags

    d = load_tables(spark, sf_dir, "documents")
    # carry_cols rides `source` through the flag pass — one scan, no
    # join back (review catch: the join form paid a second documents
    # scan plus a doc_id shuffle)
    flags = gopher_quality_flags(d, carry_cols=["source"])
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("ok_word_count").cast("int")).cast("long").alias(
            "n_ok_word_count"
        ),
        F.sum(F.col("ok_mean_word_len").cast("int")).cast("long").alias(
            "n_ok_mean_word_len"
        ),
        F.sum(F.col("ok_stopword_frac").cast("int")).cast("long").alias(
            "n_ok_stopword_frac"
        ),
        F.sum(F.col("ok_distinct_ratio").cast("int")).cast("long").alias(
            "n_ok_distinct_ratio"
        ),
        (
            F.sum(F.col("pass_all").cast("int")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("pass_all_rate"),
    )


# --------------------------------------------------------------------------
# Token-budget coverage per source.
# --------------------------------------------------------------------------


@register(
    "corpus_budget_coverage",
    """
    WITH t AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tt FROM t),
    r AS (
      SELECT source, n_tokens,
             CAST(ROW_NUMBER() OVER (
               ORDER BY n_tokens DESC, source) AS INT) AS rank,
             CAST(SUM(n_tokens) OVER (
               ORDER BY n_tokens DESC, source
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT source, n_tokens, rank, cum_tokens,
           (CAST(n_tokens AS DOUBLE) / CAST(tt AS DOUBLE)) AS share,
           (CAST(cum_tokens AS DOUBLE) / CAST(tt AS DOUBLE)) AS cum_share
    FROM r CROSS JOIN tot
    """,
)
def corpus_budget_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources fill the token budget: per-source token counts
    with rank, cumulative tokens, and cumulative share — the 'top k
    sources cover 90% of the mix' curve behind every sampling-weight
    decision. One scan + one hash aggregate; the window runs over
    SOURCE-cardinality rows (broadcastable), never documents."""
    d = load_tables(spark, sf_dir, "documents")
    t = d.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long"))
        .cast("long")
        .alias("n_tokens")
    )
    w = Window.orderBy(F.desc("n_tokens"), F.asc("source"))
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    tot = t.agg(F.sum("n_tokens").cast("long").alias("tt"))
    # single-partition window is safe: rows = |sources|, already
    # aggregated (same rationale as adamic_adar's candidate ranks)
    r = t.select(
        "source",
        "n_tokens",
        F.row_number().over(w).alias("rank"),
        F.sum("n_tokens").over(wc).cast("long").alias("cum_tokens"),
    )
    return r.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        "rank",
        "cum_tokens",
        (F.col("n_tokens").cast("double") / F.col("tt").cast("double")).alias(
            "share"
        ),
        (
            F.col("cum_tokens").cast("double") / F.col("tt").cast("double")
        ).alias("cum_share"),
    )


# --------------------------------------------------------------------------
# Embedding norm health per label.
# --------------------------------------------------------------------------


@register(
    "embedding_norm_health",
    """
    WITH n AS (
      SELECT label,
             sqrt(list_reduce(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (acc, v) -> acc + v)) AS nrm
      FROM embeddings
    )
    SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero,
           MIN(nrm) AS min_norm, MAX(nrm) AS max_norm,
           CAST(SUM(CAST(floor(nrm * 1e10) AS BIGINT)) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * 1e10) AS mean_norm
    FROM n GROUP BY label
    """,
)
def embedding_norm_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-table QA gate: per-label vector counts, zero-vector
    count (a broken encoder's signature), and min/mean/max L2 norm
    (collapsed or exploded norms flag bad batches before they poison
    ANN indexes and cosine dedup). One scan, one hash aggregate;
    norms fold in index order so the report is engine-exact."""
    from ..operators.dedup import with_norm
    from ..operators.similarity import fixed_point_mean

    em = load_tables(spark, sf_dir, "embeddings")
    n = with_norm(em.select("label", "embedding")).select(
        "label", F.col("__norm").alias("nrm")
    )
    return n.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(F.when(F.col("nrm") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_zero"),
        F.min("nrm").alias("min_norm"),
        F.max("nrm").alias("max_norm"),
        fixed_point_mean(F.col("nrm"), "mean_norm", 1e10),
    )


# --------------------------------------------------------------------------
# Exact ROC AUC (Mann–Whitney) per source: does document length
# separate English from non-English?
# --------------------------------------------------------------------------


@register(
    "doc_length_auc_by_source",
    """
    WITH r AS (
      SELECT source, n_chars AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM documents
    ),
    rn AS (
      SELECT source, s, y,
             ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY s, y) AS rn
      FROM r
    ),
    mid AS (
      SELECT source, y,
             MIN(rn) OVER (PARTITION BY source, s)
             + MAX(rn) OVER (PARTITION BY source, s) AS m2
      FROM rn
    ),
    a AS (
      SELECT source,
             CAST(SUM(y) AS BIGINT) AS n_pos,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg,
             SUM(CASE WHEN y = 1 THEN m2 END) AS rs
      FROM mid GROUP BY source
    )
    SELECT source, n_pos, n_neg,
           CASE WHEN n_pos > 0 AND n_neg > 0 THEN
             CAST(rs - n_pos * (n_pos + 1) AS DOUBLE)
             / CAST(2 * n_pos * n_neg AS DOUBLE)
           END AS auc
    FROM a
    """,
)
def doc_length_auc_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of `n_chars` as a predictor of `lang = 'en'`,
    per source — the threshold-free discriminative-power check for
    any scalar quality signal (a near-0.5 AUC says the signal is
    useless for that source). Midrank tie handling stays integer
    until one division, so the value is engine-exact."""
    from ..operators.features import roc_auc_exact

    d = load_tables(spark, sf_dir, "documents").select(
        "source",
        F.col("n_chars").alias("score"),
        (F.col("lang") == "en").cast("int").alias("is_en"),
    )
    return roc_auc_exact(d, "source", "score", "is_en")


# --------------------------------------------------------------------------
# Seasonal-naive MASE screen on daily event-type series.
# --------------------------------------------------------------------------


@register(
    "mase_seasonal_screen",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2
    ),
    lagd AS (
      SELECT event_type,
             total,
             lag(total, 7) OVER (
               PARTITION BY event_type ORDER BY day) AS l7,
             lag(total, 1) OVER (
               PARTITION BY event_type ORDER BY day) AS l1
      FROM daily
    ),
    q AS (
      SELECT event_type,
             CAST(floor(abs(total - l7) * 1e8) AS BIGINT) AS qs,
             CAST(floor(abs(total - l1) * 1e8) AS BIGINT) AS qn
      FROM lagd WHERE l7 IS NOT NULL AND l1 IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_scored_days,
           (CAST(SUM(qs) AS DOUBLE) / 1e8)
             / CAST(COUNT(*) AS DOUBLE) AS seasonal_mae,
           (CAST(SUM(qn) AS DOUBLE) / 1e8)
             / CAST(COUNT(*) AS DOUBLE) AS naive_mae,
           CASE WHEN SUM(qn) <> 0 THEN
             (CAST(SUM(qs) AS DOUBLE) / 1e8)
             / (CAST(SUM(qn) AS DOUBLE) / 1e8)
           END AS mase
    FROM q GROUP BY event_type
    """,
)
def mase_seasonal_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is there weekly seasonality worth modeling? MASE of the
    seasonal-naive forecast (7 rows back) vs the one-step-naive
    baseline over daily per-type event totals; mase < 1 ⇒ the weekly
    pattern is real. Daily totals are DECIMAL-exact; |errors| are
    1e-8 floor-quantized and integer-summed (order-free both
    engines)."""
    from ..operators.timeseries import seasonal_mase

    e = load_tables(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(24,6)"))
        .cast("double")
        .alias("total")
    )
    return seasonal_mase(daily, "event_type", "day", "total", season_lag=7)


# --------------------------------------------------------------------------
# Adamic–Adar link prediction on the customer–supplier bipartite
# graph (bounded to a customer-key slice).
# --------------------------------------------------------------------------

_AA_CUST_CAP = 60
_AA_K = 20


@register(
    "adamic_adar_order_links",
    f"""
    WITH e0 AS (
      SELECT DISTINCT o.o_custkey AS u, l.l_suppkey + 100000 AS v
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_custkey < {_AA_CUST_CAP}
    ),
    und AS (
      SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
      FROM e0 WHERE u <> v
    ),
    adj AS (
      SELECT a AS node, b AS nbr FROM und
      UNION ALL SELECT b AS node, a AS nbr FROM und
    ),
    deg AS (SELECT nbr, COUNT(*) AS d
            FROM (SELECT node AS nbr FROM adj) GROUP BY nbr),
    wedges AS (
      SELECT l.node AS node_u, r.node AS node_v, l.nbr AS w
      FROM adj l JOIN adj r ON l.nbr = r.nbr AND l.node < r.node
    ),
    scored AS (
      SELECT node_u, node_v,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             CAST(SUM(CAST(floor(1e8 / ln(CAST(d.d AS DOUBLE)))
                           AS BIGINT)) AS DOUBLE) / 1e8 AS aa_score
      FROM wedges w JOIN deg d ON d.nbr = w.w
      GROUP BY node_u, node_v
    ),
    pred AS (
      SELECT s.* FROM scored s
      LEFT JOIN und ON und.a = s.node_u AND und.b = s.node_v
      WHERE und.a IS NULL
    )
    SELECT node_u, node_v, n_common, aa_score,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY aa_score DESC, node_u, node_v) AS rank
      FROM pred
    ) WHERE rank <= {_AA_K}
    """,
)
def adamic_adar_order_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 Adamic–Adar link predictions on the customer–supplier
    order graph (customers < 60): two customers sharing many
    low-degree suppliers are the likeliest next trade pair — the
    co-purchasing affinity signal, down-weighting hub suppliers.
    Wedge joins + one hash aggregate; 1/ln degree terms are 1e-8
    floor-quantized so the score replays exactly."""
    from ..operators.graph import adamic_adar_links

    t = load_tables(spark, sf_dir, "lineitem", "orders")
    li, o = t["lineitem"], t["orders"]
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("o_custkey") < _AA_CUST_CAP)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 100000).alias("dst"),
        )
        .distinct()
    )
    out = adamic_adar_links(edges, k=_AA_K)
    return out.select(
        "node_u", "node_v", "n_common", "aa_score", "rank"
    )


# --------------------------------------------------------------------------
# MMR diversified retrieval (unrolled greedy, k=5 over 10
# candidates, λ = 0.7), oracle-replayed round by round.
# --------------------------------------------------------------------------

_MMR_N = 10
_MMR_K = 5
# shared by the oracle SQL and the mmr_topk call so a fixture-dim or
# λ change can't silently desynchronize engine and oracle
_MMR_DIM = 64
_MMR_LAM = 0.7

_MMR_NORM = """
  n AS (
    SELECT vec_id, embedding,
           sqrt(list_reduce(
             list_transform(embedding,
                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
             (acc, v) -> acc + v)) AS nrm
    FROM embeddings
  )
"""

_MMR_DOT = (
    f"list_reduce(list_transform(range(1, {_MMR_DIM + 1}), "
    "i -> CAST({a}.embedding[i] AS DOUBLE) "
    "* CAST({b}.embedding[i] AS DOUBLE)), (acc, v) -> acc + v) "
    "/ ({a}.nrm * {b}.nrm)"
)


def _mmr_oracle(
    n_cand: int, k: int, cand_ctes: list[str] | None = None
) -> str:
    # identical literals to the engine side (mmr_topk uses F.lit(lam)
    # and F.lit(round(1.0 - lam, 12))) so the scores replay exactly
    lam = repr(_MMR_LAM)
    one_minus_lam = repr(round(1.0 - _MMR_LAM, 12))
    if cand_ctes is None:
        # default candidate tier: brute-force cosine top-N
        cand_ctes = [
            f"""sims AS MATERIALIZED (
      SELECT c.vec_id AS cid, {_MMR_DOT.format(a='q', b='c')} AS rel
      FROM n c, q WHERE c.vec_id <> 0
    )""",
            f"""cand AS MATERIALIZED (
      SELECT cid, rel FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rel DESC, cid) AS r
        FROM sims
      ) WHERE r <= {n_cand}
    )""",
        ]
    ctes = [
        # MATERIALIZED: DuckDB inlines a CTE once PER REFERENCE, and
        # cand/cs are referenced by every unrolled greedy round (the
        # correlated penalty subquery re-evaluated the corpus-wide
        # cosine scan per candidate row — 336 s at sf0.1; 0.4 s
        # materialized)
        _MMR_NORM,
        "q AS MATERIALIZED (SELECT * FROM n WHERE vec_id = 0)",
        *cand_ctes,
        f"""cs AS MATERIALIZED (
      SELECT a.vec_id AS cid, b.vec_id AS sid,
             {_MMR_DOT.format(a='a', b='b')} AS sim
      FROM n a JOIN cand ca ON ca.cid = a.vec_id
      JOIN n b ON b.vec_id <> a.vec_id
      JOIN cand cb ON cb.cid = b.vec_id
    )""",
        """sel1 AS (
      SELECT 1 AS rank, cid, rel, rel AS mmr_score
      FROM cand ORDER BY rel DESC, cid LIMIT 1
    )""",
        "all1 AS (SELECT * FROM sel1)",
    ]
    for r in range(2, k + 1):
        ctes.append(f"""sel{r} AS (
      SELECT {r} AS rank, cid, rel, mmr AS mmr_score FROM (
        SELECT c.cid, c.rel,
               {lam} * c.rel - {one_minus_lam} * (
                 SELECT MAX(s.sim) FROM cs s
                 WHERE s.cid = c.cid
                   AND s.sid IN (SELECT cid FROM all{r - 1})
               ) AS mmr
        FROM cand c
        WHERE c.cid NOT IN (SELECT cid FROM all{r - 1})
      ) ORDER BY mmr DESC, cid LIMIT 1
    )""")
        ctes.append(
            f"all{r} AS (SELECT * FROM all{r - 1} "
            f"UNION ALL SELECT * FROM sel{r})"
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CAST(rank AS INT) AS rank, cid AS vec_id,
           rel AS relevance, mmr_score
    FROM all{k}
    """
    )


@register("mmr_diversified_topk", _mmr_oracle(_MMR_N, _MMR_K))
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank for query vector 0: greedy k=5 from the
    top-10 cosine candidates, λ = 0.7 — the de-duplicating retrieval
    step RAG context assembly uses so near-identical passages don't
    crowd the window. The greedy loop runs on a bounded N×N
    candidate-sim table (localCheckpoint-ed once); the oracle
    replays all 5 rounds as unrolled CTEs."""
    from ..operators.similarity import mmr_topk

    em = load_tables(spark, sf_dir, "embeddings")
    return mmr_topk(
        em, query_id=0, n_candidates=_MMR_N, k=_MMR_K, lam=_MMR_LAM
    )


# --------------------------------------------------------------------------
# UNPIVOT (wide → long) with per-metric profiles.
# --------------------------------------------------------------------------


@register(
    "unpivot_order_metrics",
    """
    WITH long AS (
      SELECT l_returnflag AS flag, 'l_quantity' AS metric,
             CAST(l_quantity AS DOUBLE) AS val FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_extendedprice',
             CAST(l_extendedprice AS DOUBLE) FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_discount',
             CAST(l_discount AS DOUBLE) FROM lineitem
      UNION ALL
      SELECT l_returnflag, 'l_tax',
             CAST(l_tax AS DOUBLE) FROM lineitem
    )
    SELECT flag, metric, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(val AS DECIMAL(24,2))) AS DOUBLE) AS total,
           MIN(val) AS min_val, MAX(val) AS max_val
    FROM long GROUP BY flag, metric
    """,
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long UNPIVOT (`DataFrame.unpivot`, the melt every
    metrics store needs) over lineitem's four numeric measures,
    then a per-(returnflag, metric) profile — proves the operator
    and keeps the aggregate DECIMAL-exact. One scan; the unpivot is
    a zero-shuffle row expansion."""
    li = load_tables(spark, sf_dir, "lineitem")
    long = li.select(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("double"),
        F.col("l_extendedprice").cast("double"),
        F.col("l_discount").cast("double"),
        F.col("l_tax").cast("double"),
    ).unpivot(
        ids=["flag"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric",
        valueColumnName="val",
    )
    return long.groupBy("flag", "metric").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("val").cast("decimal(24,2)"))
        .cast("double")
        .alias("total"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )
