"""Round-6 registry surface: retrieval feedback, sketch
calibration, higher-order LM scoring, corpus growth/cluster health,
ANN-tier composition, and the composed-curation oracle.

- RM3 pseudo-relevance-feedback BM25 expansion (two-pass retrieval:
  mine expansion terms from the feedback docs, re-rank)
- MinHash estimate-vs-exact Jaccard calibration report (the
  sketch-certificate family: is k=8 accurate enough to trust?)
- trigram LM fluency scores (third-order sibling of the
  unigram/bigram scorers)
- connected-component near-dup cluster SIZES (the corpus-health
  histogram over transitive dup clusters)
- Heaps'-law vocabulary-growth fit (how much new vocabulary more
  crawling buys)
- IVF-tier MMR (the sublinear candidate tier composed with the
  diversity re-rank through the `candidates=` hook)
- composed-curation stage-count report (the full quality → exact →
  near → split → audit → quota chain replayed as one CTE oracle —
  the flagship pipeline's end-to-end numbers under the driver gate)

Determinism: the standing registry rules — md5-based hashing,
1e-8 floor-quantized ln terms, order-free integer sums of quantized
contributions wherever a float accumulation order is data-dependent,
integer-ratio divisions, unique tiebreakers in every top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from . import register
from .dedup import _SHINGLES_CTE
from .round4 import _BM25_TERMS, _bm25_oracle
from .round5 import _GOPHER_SW_SQL, _HASH32, _MMR_DOT, _MMR_K, _MMR_N, _mmr_oracle

# --------------------------------------------------------------------------
# RM3 pseudo-relevance-feedback BM25.
# --------------------------------------------------------------------------

_RM3_FB = 5
_RM3_M = 5
_RM3_K = 20

# same quantized-idf / tf-norm strings as _bm25_oracle (k1=1.2,
# b=0.75) — pass 2 reuses the formula over the expanded term set
_RM3_IDF = (
    "(floor(ln(CAST(1.0 AS DOUBLE) + ((CAST(n_docs AS DOUBLE)"
    " - CAST(df_t AS DOUBLE) + CAST(0.5 AS DOUBLE))"
    " / (CAST(df_t AS DOUBLE) + CAST(0.5 AS DOUBLE))))"
    " * CAST(1e8 AS DOUBLE)) / CAST(1e8 AS DOUBLE))"
)
_RM3_NORM = (
    "(CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE)"
    " / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)"
    " * (CAST(0.25 AS DOUBLE) + ((CAST(0.75 AS DOUBLE)"
    " * CAST(dl AS DOUBLE)) / avgdl))))"
)


def _rm3_oracle(terms: list[str], n_fb: int, m: int, k: int) -> str:
    terms = sorted(set(terms))
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
    WITH fb AS MATERIALIZED (
      SELECT doc_id, score FROM ({_bm25_oracle(terms, n_fb)})
    ),
    toks AS (
      SELECT doc_id, t.token FROM documents,
        UNNEST(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    idx AS MATERIALIZED (
      SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ),
    dls AS MATERIALIZED (
      SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1
    ),
    rel AS (
      SELECT i.token,
             SUM(CAST(floor(((CAST(i.tf AS DOUBLE) / CAST(d.dl AS DOUBLE))
                             * f.score) * CAST(1e8 AS DOUBLE))
                      AS BIGINT)) AS relq
      FROM idx i JOIN fb f USING (doc_id) JOIN dls d USING (doc_id)
      WHERE i.token NOT IN ({in_list})
      GROUP BY i.token
    ),
    exp AS (
      SELECT token FROM (
        SELECT token, ROW_NUMBER() OVER (ORDER BY relq DESC, token) AS r
        FROM rel
      ) WHERE r <= {m}
    ),
    terms2 AS (
      SELECT token FROM exp
      UNION ALL SELECT UNNEST([{in_list}]) AS token
    ),
    idx2 AS (
      SELECT i.* FROM idx i JOIN terms2 t ON i.token = t.token
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dls
    ),
    dfreq AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df_t FROM idx2 GROUP BY token
    ),
    scored AS (
      SELECT idx2.doc_id,
             CAST(floor(({_RM3_IDF} * {_RM3_NORM}) * CAST(1e8 AS DOUBLE))
                  AS BIGINT) AS sq
      FROM idx2 JOIN dfreq USING (token) JOIN dls USING (doc_id), stats
    )
    SELECT doc_id,
           CAST(SUM(sq) AS DOUBLE) / CAST(1e8 AS DOUBLE) AS score,
           CAST(COUNT(*) AS BIGINT) AS n_terms_hit
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id LIMIT {k}
    """


@register("rm3_expanded_bm25", _rm3_oracle(_BM25_TERMS, _RM3_FB, _RM3_M, _RM3_K))
def rm3_expanded_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RM3 pseudo-relevance feedback: BM25 pass 1, relevance-model
    term mining over the top-5 feedback docs (quantized integer-sum
    weights), re-rank the expanded query — the standard
    recall-boosting second retrieval pass. Pass 2's per-doc sum is
    order-free (1e-8-quantized integer accumulation) because the
    expanded term set is data-dependent and can't pivot to a fixed
    column order like `bm25_search_topk`."""
    from ..operators.search import rm3_bm25_topk

    d = load_tables(spark, sf_dir, "documents")
    return rm3_bm25_topk(
        d, _BM25_TERMS, k=_RM3_K, n_fb=_RM3_FB, m_expansion=_RM3_M
    )


# --------------------------------------------------------------------------
# MinHash estimate-vs-exact Jaccard calibration.
# --------------------------------------------------------------------------


@register(
    "minhash_jaccard_calibration",
    f"""
    WITH {_SHINGLES_CTE},
    seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
    sig AS MATERIALIZED (
      SELECT doc_id, seed,
             MIN(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS sig
      FROM sh, seeds GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, seed // 2 AS band,
             md5(MIN(sig) || MAX(sig)) AS band_sig
      FROM sig GROUP BY doc_id, seed // 2
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
                   AND a.doc_id < b.doc_id
    ),
    m AS (
      SELECT c.id_a, c.id_b,
             SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS nm
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.id_a
      JOIN sig sb ON sb.doc_id = c.id_b AND sb.seed = sa.seed
      GROUP BY c.id_a, c.id_b
    ),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    ex AS (
      SELECT i.id_a, i.id_b,
             i.n_inter * 1.0 / (sa.sz + sb.sz - i.n_inter) AS j
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.id_a
      JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE EXISTS (SELECT 1 FROM cand c
                    WHERE c.id_a = i.id_a AND c.id_b = i.id_b)
    ),
    per AS (
      SELECT CAST(m.nm AS DOUBLE) / CAST(8.0 AS DOUBLE) AS est,
             CAST(floor(e.j * CAST(1e8 AS DOUBLE)) AS BIGINT) AS qj,
             CAST(floor(abs(CAST(m.nm AS DOUBLE) / CAST(8.0 AS DOUBLE)
                            - e.j) * CAST(1e8 AS DOUBLE))
                  AS BIGINT) AS qe
      FROM m JOIN ex e ON e.id_a = m.id_a AND e.id_b = m.id_b
    )
    SELECT est AS est_jaccard,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           (CAST(SUM(qj) AS DOUBLE) / CAST(1e8 AS DOUBLE))
             / CAST(COUNT(*) AS DOUBLE) AS mean_exact_jaccard,
           (CAST(SUM(qe) AS DOUBLE) / CAST(1e8 AS DOUBLE))
             / CAST(COUNT(*) AS DOUBLE) AS mean_abs_err
    FROM per GROUP BY est
    """,
)
def minhash_jaccard_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Sketch-accuracy audit for the MinHash dedup tier: on the LSH
    candidate pairs, the k=8 signature-agreement estimate vs the
    exact Jaccard, grouped by the estimate's 1/8 grid. The table
    that says whether the configured (k, bands) is trustworthy
    BEFORE the sketch gates data at 100 TB — same candidate-join
    scale shape as the dedup itself, plus a 9-row aggregate."""
    from ..operators.dedup import minhash_calibration

    d = load_tables(spark, sf_dir, "documents")
    return minhash_calibration(
        d, "doc_id", "text", n=3, num_hashes=8, band_size=2
    )


# --------------------------------------------------------------------------
# Trigram LM fluency scores.
# --------------------------------------------------------------------------


@register(
    "trigram_lm_scores",
    """
    WITH tok AS (
      SELECT doc_id, CAST(u.i AS INT) AS pos, s[CAST(u.i AS INT)] AS token
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS s
            FROM documents) d,
           UNNEST(range(1, CAST(len(s) AS BIGINT) + 1)) AS u(i)
    ),
    tri AS MATERIALIZED (
      SELECT a.doc_id, a.token, b.token AS mid, c.token AS nxt
      FROM tok a
      JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
    ),
    big AS (
      SELECT a.token, b.token AS mid
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    ),
    c3 AS (SELECT token, mid, nxt, COUNT(*) AS c3 FROM tri GROUP BY 1, 2, 3),
    c2 AS (SELECT token, mid, COUNT(*) AS c2 FROM big GROUP BY 1, 2),
    v AS (SELECT COUNT(DISTINCT token) AS v FROM tok),
    model AS (
      SELECT c3.token, c3.mid, c3.nxt,
             floor(ln((c3.c3 + 1.0) / (c2.c2 + 1.0 * v.v))
                   * CAST(1e8 AS DOUBLE)) / CAST(1e8 AS DOUBLE) AS lp
      FROM c3 JOIN c2 USING (token, mid) CROSS JOIN v
    ),
    scored AS (
      SELECT g.doc_id, m.lp
      FROM tri g JOIN model m
        ON g.token = m.token AND g.mid = m.mid AND g.nxt = m.nxt
    ),
    per AS (
      SELECT doc_id, COUNT(*) AS n_trigrams,
             list_reduce(list_sort(list(lp)), (acc, x) -> acc + x) AS slp
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_trigrams AS BIGINT) AS n_trigrams,
           slp / n_trigrams AS avg_trigram_lp
    FROM per
    """,
)
def trigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average add-1 trigram log-probability under the
    corpus's own trigram model — the third-order fluency signal
    (`unigram_logprob_scores` → `bigram_logprob_scores` → this).
    Training is two hash aggregates over one positional explode;
    scoring is a shuffle equi-join on the trigram key (the trigram
    table outgrows broadcast at corpus scale); per-doc sums fold
    over the sorted log-prob list."""
    from ..operators.text import trigram_logprob_scores

    d = load_tables(spark, sf_dir, "documents")
    return trigram_logprob_scores(d)


# --------------------------------------------------------------------------
# Connected-component near-dup cluster sizes.
# --------------------------------------------------------------------------


@register(
    "cc_cluster_sizes",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT i.id_a, i.id_b FROM inter i
      JOIN sizes sa ON sa.doc_id = i.id_a
      JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE i.n_inter * 1.0 / (sa.sz + sb.sz - i.n_inter) >= 0.8
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT reach.id, edges.dst FROM reach JOIN edges ON reach.r = edges.src
    ),
    comp AS (SELECT id, MIN(r) AS rep FROM reach GROUP BY id),
    cs AS (SELECT rep, COUNT(*) AS cluster_size FROM comp GROUP BY rep)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(cluster_size) AS BIGINT) AS n_docs
    FROM cs GROUP BY cluster_size
    """,
)
def cc_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size histogram of the TRANSITIVE near-dup clusters (connected
    components over verified Jaccard pairs): (cluster_size,
    n_clusters, n_docs) — the corpus-health number behind "what
    fraction of the corpus is copies, and how big do copy families
    get". Min-label propagation (bounded rounds, localCheckpoint per
    round) followed by two tiny hash aggregates; the oracle replays
    the closure as a recursive CTE."""
    from ..operators.dedup import dedup_clusters, ngram_jaccard_pairs

    d = load_tables(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8)
    labels = dedup_clusters(pairs)
    sizes = labels.groupBy("cluster_rep").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters"),
        F.sum("cluster_size").cast("long").alias("n_docs"),
    ).select(
        F.col("cluster_size").cast("long").alias("cluster_size"),
        "n_clusters",
        "n_docs",
    )


# --------------------------------------------------------------------------
# Heaps'-law vocabulary-growth fit.
# --------------------------------------------------------------------------

_HEAPS_P = 10


@register(
    "heaps_law_vocab_fit",
    f"""
    WITH toks AS (
      SELECT least(CAST(floor(CAST(doc_id * {_HEAPS_P} AS DOUBLE)
                         / (SELECT CAST(MAX(doc_id) + 1 AS DOUBLE)
                            FROM documents)) AS INT),
                   {_HEAPS_P - 1}) AS b,
             t.token
      FROM documents,
        UNNEST(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    sc AS (SELECT b, COUNT(*) AS nt FROM toks GROUP BY b),
    fs AS (SELECT token, MIN(b) AS b FROM toks GROUP BY token),
    nv AS (SELECT b, COUNT(*) AS nvc FROM fs GROUP BY b),
    pts AS (
      SELECT sc.b,
             SUM(sc.nt) OVER (ORDER BY sc.b) AS ctok,
             SUM(COALESCE(nv.nvc, 0)) OVER (ORDER BY sc.b) AS cvoc
      FROM sc LEFT JOIN nv ON nv.b = sc.b
    ),
    terms AS (
      SELECT floor(ln(CAST(ctok AS DOUBLE)) * CAST(1e8 AS DOUBLE))
               / CAST(1e8 AS DOUBLE) AS x,
             floor(ln(CAST(cvoc AS DOUBLE)) * CAST(1e8 AS DOUBLE))
               / CAST(1e8 AS DOUBLE) AS y,
             ctok, cvoc
      FROM pts
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS p,
             CAST(SUM(CAST(floor(x * CAST(1e8 AS DOUBLE)) AS BIGINT))
                  AS DOUBLE) / CAST(1e8 AS DOUBLE) AS sx,
             CAST(SUM(CAST(floor(y * CAST(1e8 AS DOUBLE)) AS BIGINT))
                  AS DOUBLE) / CAST(1e8 AS DOUBLE) AS sy,
             CAST(SUM(CAST(floor((x * y) * CAST(1e8 AS DOUBLE)) AS BIGINT))
                  AS DOUBLE) / CAST(1e8 AS DOUBLE) AS sxy,
             CAST(SUM(CAST(floor((x * x) * CAST(1e8 AS DOUBLE)) AS BIGINT))
                  AS DOUBLE) / CAST(1e8 AS DOUBLE) AS sxx,
             MAX(ctok) AS ttok, MAX(cvoc) AS tvoc
      FROM terms
    )
    SELECT CAST(p AS BIGINT) AS n_points,
           CAST(ttok AS BIGINT) AS total_tokens,
           CAST(tvoc AS BIGINT) AS total_vocab,
           (p * sxy - sx * sy) / (p * sxx - sx * sx) AS heaps_beta,
           (sy - ((p * sxy - sx * sy) / (p * sxx - sx * sx)) * sx) / p
             AS heaps_ln_k
    FROM sums
    """,
)
def heaps_law_vocab_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law fit V(n) ≈ K·n^β over 10 id-ordered corpus slices
    — the vocabulary-growth curve that says how much NEW vocabulary
    more data buys (and flags synthetic/ID-heavy text when β → 1).
    Slice membership is integer arithmetic on the id (no global-sort
    window); vocabulary never rescans (per-token MIN slice); the
    log-log least squares runs over 10 bounded rows with every sum
    an exact integer sum of 1e-8-quantized terms."""
    from ..operators.text import heaps_law_fit

    d = load_tables(spark, sf_dir, "documents")
    return heaps_law_fit(d, "doc_id", "text", n_prefixes=_HEAPS_P)


# --------------------------------------------------------------------------
# IVF-tier MMR: the sublinear ANN candidate tier composed with the
# diversity re-rank through mmr_topk's `candidates=` hook.
# --------------------------------------------------------------------------

_IVF_MMR_CAND_CTES = [
    "cent AS (SELECT vec_id, embedding, nrm FROM n ORDER BY vec_id LIMIT 16)",
    f"""asg AS MATERIALIZED (
      SELECT id, cell FROM (
        SELECT c.vec_id AS id, ct.vec_id AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY c.vec_id
                 ORDER BY {_MMR_DOT.format(a='c', b='ct')} DESC, ct.vec_id
               ) AS rnk
        FROM n c CROSS JOIN cent ct
      ) WHERE rnk = 1
    )""",
    f"""probe AS (
      SELECT cell FROM (
        SELECT ct.vec_id AS cell,
               ROW_NUMBER() OVER (
                 ORDER BY {_MMR_DOT.format(a='q', b='ct')} DESC, ct.vec_id
               ) AS rnk
        FROM cent ct, q
      ) WHERE rnk <= 4
    )""",
    f"""ivfsims AS MATERIALIZED (
      SELECT a.id AS cid, {_MMR_DOT.format(a='q', b='c')} AS rel
      FROM probe p
      JOIN asg a ON a.cell = p.cell
      JOIN n c ON c.vec_id = a.id, q
      WHERE a.id <> 0
    )""",
    f"""cand AS MATERIALIZED (
      SELECT cid, rel FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY rel DESC, cid) AS r
        FROM ivfsims
      ) WHERE r <= {_MMR_N}
    )""",
]


@register(
    "mmr_ivf_topk", _mmr_oracle(_MMR_N, _MMR_K, cand_ctes=_IVF_MMR_CAND_CTES)
)
def mmr_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank fed by the IVF ANN tier instead of the
    brute-force verifier: query 0 probes its 4 nearest of 16 cells,
    the in-cell exact top-10 become the MMR candidates, and the
    greedy λ-tradeoff loop is UNCHANGED (the `candidates=` hook) —
    the production composition where candidate generation is
    sublinear and the re-rank stays bounded. Oracle replays both
    tiers: IVF assignment/probe CTEs feed the same unrolled greedy
    rounds as `mmr_diversified_topk`."""
    from ..operators.similarity import ivf_topk, mmr_topk

    em = load_tables(spark, sf_dir, "embeddings")
    cand = ivf_topk(
        em,
        em.filter(F.col("vec_id") == 0),
        k=_MMR_N,
        num_centroids=16,
        nprobe=4,
    ).select(F.col("neighbor_id").alias("cid"), F.col("cosine").alias("rel"))
    return mmr_topk(
        em, query_id=0, n_candidates=_MMR_N, k=_MMR_K, candidates=cand
    )


# --------------------------------------------------------------------------
# Composed-curation stage-count report: the full pipeline chain as
# one CTE oracle (r05 verdict item 4).
# --------------------------------------------------------------------------

_CURATION_QUOTA = 15  # bites at every SF (25 docs/source at sf0.01)

_CURATION_COUNT_COLS = [
    "n_input",
    "n_quality",
    "n_exact",
    "n_near",
    "n_leaked_fps",
    "n_train",
    "n_val",
    "n_test",
    "n_train_capped",
]


@register(
    "curation_counts_report",
    f"""
    WITH t AS (
      SELECT doc_id, source, text, string_split(lower(text), ' ') AS w
      FROM documents
    ),
    f AS (
      SELECT doc_id, source, text,
             len(w) AS nw,
             list_reduce(list_transform(w, s -> length(s)),
                         (a, b) -> a + b) AS nchars,
             len(list_filter(w,
                 s -> list_contains({_GOPHER_SW_SQL}, s))) AS nstop,
             len(list_distinct(w)) AS ndist
      FROM t
    ),
    q AS MATERIALIZED (
      SELECT doc_id, source, text FROM f
      WHERE nw >= 10 AND nw <= 100000
        AND nchars * 1.0 / nw >= 2.0 AND nchars * 1.0 / nw <= 10.0
        AND nstop * 1.0 / nw >= 0.02
        AND ndist * 1.0 / nw >= 0.2
    ),
    ex AS MATERIALIZED (
      SELECT doc_id, source, text FROM (
        SELECT doc_id, source, text,
               ROW_NUMBER() OVER (
                 PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM q
      ) WHERE rn = 1
    ),
    extoks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS tt FROM ex
    ),
    esh AS MATERIALIZED (
      SELECT DISTINCT doc_id, array_to_string(tt[i:i+2], ' ') AS shingle
      FROM extoks, UNNEST(range(1, greatest(len(tt) - 1, 1))) AS u(i)
    ),
    esz AS (SELECT doc_id, COUNT(*) AS sz FROM esh GROUP BY doc_id),
    seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
    sig AS (
      SELECT doc_id, seed,
             MIN(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS sig
      FROM esh, seeds GROUP BY doc_id, seed
    ),
    bands AS (
      SELECT doc_id, seed // 2 AS band,
             md5(MIN(sig) || MAX(sig)) AS band_sig
      FROM sig GROUP BY doc_id, seed // 2
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
                   AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM esh a JOIN esh b ON a.shingle = b.shingle
                            AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    dupd AS (
      SELECT DISTINCT i.id_b AS doc_id
      FROM inter i
      JOIN esz sa ON sa.doc_id = i.id_a
      JOIN esz sb ON sb.doc_id = i.id_b
      WHERE i.n_inter * 1.0 / (sa.sz + sb.sz - i.n_inter) >= 0.8
        AND EXISTS (SELECT 1 FROM cand c
                    WHERE c.id_a = i.id_a AND c.id_b = i.id_b)
    ),
    sp AS MATERIALIZED (
      SELECT doc_id, source, text,
             CASE WHEN ({_HASH32.format(e='doc_id')} % 100) < 90
                    THEN 'train'
                  WHEN ({_HASH32.format(e='doc_id')} % 100) < 95
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM ex WHERE doc_id NOT IN (SELECT doc_id FROM dupd)
    ),
    ps AS (SELECT DISTINCT md5(text) AS fp, split FROM sp),
    leaked AS (SELECT fp FROM ps GROUP BY fp HAVING COUNT(*) > 1),
    capped AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (
                 PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM sp WHERE split = 'train'
      ) WHERE rk <= {_CURATION_QUOTA}
    )
    SELECT
      CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_input,
      CAST((SELECT COUNT(*) FROM q) AS BIGINT) AS n_quality,
      CAST((SELECT COUNT(*) FROM ex) AS BIGINT) AS n_exact,
      CAST((SELECT COUNT(*) FROM sp) AS BIGINT) AS n_near,
      CAST((SELECT COUNT(*) FROM leaked) AS BIGINT) AS n_leaked_fps,
      CAST((SELECT COUNT(*) FROM sp WHERE split = 'train') AS BIGINT)
        AS n_train,
      CAST((SELECT COUNT(*) FROM sp WHERE split = 'val') AS BIGINT)
        AS n_val,
      CAST((SELECT COUNT(*) FROM sp WHERE split = 'test') AS BIGINT)
        AS n_test,
      CAST((SELECT COUNT(*) FROM capped) AS BIGINT) AS n_train_capped
    """,
)
def curation_counts_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline's end-to-end stage counts under
    the driver gate: runs the REAL `curate_corpus` (quality gate →
    exact dedup → LSH near-dedup → hash split → leakage audit →
    per-source quota → partitioned write to a scratch sink) and
    returns its count report as one row; the oracle replays the full
    chain as CTEs. This is the oracle twin the standalone stage
    queries (`gopher_quality_report`, `minhash_dedup_pairs`,
    `split_leakage_report`, `quota_sample_sources`) verify piecewise
    — here the COMPOSITION is what's proven."""
    import shutil
    import tempfile

    from ..plans.curation import curate_corpus

    sink = tempfile.mkdtemp(prefix="spark_graft_curation_counts_")
    try:
        counts = curate_corpus(
            spark, sf_dir, sink, quota_per_source=_CURATION_QUOTA
        )
    finally:
        # counts are plain ints by now; release the pipeline's
        # deliberately-leaked persist handles and the scratch sink
        spark.catalog.clearCache()
        shutil.rmtree(sink, ignore_errors=True)
    return spark.createDataFrame(
        [tuple(int(counts[c]) for c in _CURATION_COUNT_COLS)],
        ", ".join(f"{c} long" for c in _CURATION_COUNT_COLS),
    )
