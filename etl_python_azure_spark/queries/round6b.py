"""Round-6b registry surface: the embedding-space dedup scale tier,
ANN tuning sweeps, sketch-gated heavy hitters, readability scoring,
and changepoint screening.

- SemDeDup-style clustered semantic dedup (k-means cells restrict
  the exact-cosine verify — the embedding twin of the MinHash
  candidate-join, Abbas et al. 2023 pattern)
- IVF nprobe recall sweep (recall@5 at nprobe ∈ {1,2,4,8} in one
  report — the tuning table that picks the probe budget before an
  index ships)
- CMS-gated heavy hitters with exact verification (find-all
  φ-frequent tokens; sketch candidates, one scoped exact join)
- Flesch reading-ease per source (readability axis of the
  quality-scoring family)
- CUSUM changepoint screen over per-type daily value series (where
  did the level shift happen)
- LSH banding s-curve sweep (per-(bands,rows) detection rate vs
  exact Jaccard bin, next to the 1−(1−J^r)^b reference — the
  false-positive-cost vs recall table that picks the banding)
- SemDeDup recall audit (cell-restriction detection rate vs the
  brute-force cosine verifier, per cosine bin — the embedding twin
  of the banding sweep)
- incremental IVF index maintenance (delta batch assigned against
  the frozen quantizer, unioned, searched — the ANN twin of the
  CDC/merge family)

With these, every candidate-restricted tier in the engine carries
its own calibration/audit query: MinHash → estimate-vs-exact
calibration, banding → s-curve sweep, CMS → heavy-hitter FP flags,
IVF → nprobe recall sweep, SemDeDup cells → recall audit.

Determinism: the standing registry rules — floor-quantized fixed
point for any data-dependent float accumulation, sequential-fold
dot products (identical IEEE op order both engines), unique
tiebreakers in every top-k / argmax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables
from . import register
from .round4b import _CMS_BUCKET, _CMS_DEPTH, _CMS_WIDTH
from .similarity import (
    _COS,
    _KM_FINAL,
    _KM_ROUNDS,
    _NORM_CTE,
    _SEMDEDUP_K_SQL,
    _km_index_scaled,
    _lloyd_oracle_sql,
)

# --------------------------------------------------------------------------
# SemDeDup: clustered semantic near-dup pairs.
# --------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.46

_SEMDEDUP_ORACLE = f"""
    WITH {_NORM_CTE},
    {_lloyd_oracle_sql(_KM_ROUNDS, num_centroids=_SEMDEDUP_K_SQL)},
    asg AS MATERIALIZED (
      SELECT id, cell FROM (
        SELECT v.vec_id AS id, c.cid AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_reduce(list_transform(range(1, 65), i ->
                     CAST(v.embedding[i] AS DOUBLE) * c.cvec[i]),
                     (acc, x) -> acc + x) / (v.nrm * c.cnorm) DESC,
                   c.cid ASC) AS rnk
        FROM n v CROSS JOIN {_KM_FINAL} c
      ) WHERE rnk = 1
    ),
    pairs AS (
      SELECT aa.id AS id_a, ab.id AS id_b, aa.cell,
             list_reduce(list_transform(range(1, 65), i ->
                 CAST(a.embedding[i] AS DOUBLE)
                 * CAST(b.embedding[i] AS DOUBLE)),
               (acc, x) -> acc + x) / (a.nrm * b.nrm) AS cosine
      FROM asg aa
      JOIN asg ab ON aa.cell = ab.cell AND aa.id < ab.id
      JOIN n a ON a.vec_id = aa.id
      JOIN n b ON b.vec_id = ab.id
    )
    SELECT id_a, id_b, CAST(cell AS BIGINT) AS cell, cosine
    FROM pairs WHERE cosine >= {_SEMDEDUP_TAU}
    """


@register("semdedup_cluster_pairs", _SEMDEDUP_ORACLE)
def semdedup_cluster_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-duplicate pairs, SemDeDup-shaped: the frozen
    k-means quantizer (the train-once ``km_centroids_scaled``
    artifact, K = max(16, ⌊√n⌋) cells — the operator's scale
    contract, so this REGISTERED configuration is the subquadratic
    one, not a fixed-K rehearsal) buckets every vector, and exact
    cosine runs only within a cell — the candidate-restricted scale
    path whose recall the brute-force ``embedding_cosine_pairs``
    verifier audits. The oracle replays the full Lloyd training with
    the same data-dependent K (a scalar-subquery LIMIT in the seed
    CTE) plus the cell-restricted pair join."""
    from ..operators.similarity import semdedup_pairs

    em = load_tables(spark, sf_dir, "embeddings")
    return semdedup_pairs(
        em, _km_index_scaled(spark, sf_dir), threshold=_SEMDEDUP_TAU
    )


# --------------------------------------------------------------------------
# IVF nprobe recall sweep.
# --------------------------------------------------------------------------

_SWEEP_PROBES = [1, 2, 4, 8]
_SWEEP_K = 5
_SWEEP_NQ = 10


def _sweep_oracle() -> str:
    branches = []
    for np_ in _SWEEP_PROBES:
        branches.append(
            f"""isims{np_} AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cosine
      FROM probe_all p
      JOIN asg a ON a.cell = p.cell
      JOIN n q ON q.vec_id = p.qid
      JOIN n c ON c.vec_id = a.id
      WHERE c.vec_id != q.vec_id AND p.rnk <= {np_}
    ),
    ivf{np_} AS (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS rank FROM isims{np_}
      ) WHERE rank <= {_SWEEP_K}
    ),
    hits{np_} AS (
      SELECT {np_} AS nprobe, COUNT(*) AS n_hits
      FROM bf JOIN ivf{np_} USING (query_id, neighbor_id)
    )"""
        )
        # noqa: E501
    union = "\n      UNION ALL ".join(
        f"SELECT * FROM hits{np_}" for np_ in _SWEEP_PROBES
    )
    denom = _SWEEP_K * _SWEEP_NQ
    return f"""
    WITH {_NORM_CTE},
    cent AS (SELECT vec_id, embedding, nrm FROM n ORDER BY vec_id LIMIT 16),
    asg AS MATERIALIZED (
      SELECT id, cell FROM (
        SELECT q.vec_id AS id, c.vec_id AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id ORDER BY {_COS} DESC, c.vec_id
               ) AS rnk
        FROM n q CROSS JOIN cent c
      ) WHERE rnk = 1
    ),
    probe_all AS MATERIALIZED (
      SELECT qid, cell, rnk FROM (
        SELECT q.vec_id AS qid, c.vec_id AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id ORDER BY {_COS} DESC, c.vec_id
               ) AS rnk
        FROM n q CROSS JOIN cent c
        WHERE q.vec_id < {_SWEEP_NQ}
      ) WHERE rnk <= {max(_SWEEP_PROBES)}
    ),
    sims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_COS} AS cosine
      FROM n q JOIN n c ON c.vec_id != q.vec_id
      WHERE q.vec_id < {_SWEEP_NQ}
    ),
    bf AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
        ) AS rank FROM sims
      ) WHERE rank <= {_SWEEP_K}
    ),
    {",".join(branches)}
    SELECT CAST(nprobe AS BIGINT) AS nprobe,
           CAST(n_hits AS BIGINT) AS n_hits,
           CAST(n_hits AS DOUBLE) / CAST({denom} AS DOUBLE)
             AS recall_at_{_SWEEP_K}
    FROM ({union})
    """


@register("ivf_probe_recall_sweep", _sweep_oracle())
def ivf_probe_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@5 of the lowest-id-centroid IVF tier at nprobe ∈
    {1,2,4,8} in ONE report — the tuning sweep that picks the probe
    budget (recall vs cells-scanned) before an index configuration
    ships. Brute-force truth is computed once; each sweep point is a
    candidate-restricted rank join, so the whole table costs ~the
    sum of its points, not a fresh corpus scan per point."""
    from ..operators.similarity import cosine_topk, ivf_topk

    em = load_tables(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < _SWEEP_NQ)
    bf = cosine_topk(em, q, k=_SWEEP_K).select("query_id", "neighbor_id")
    denom = float(_SWEEP_K * _SWEEP_NQ)
    parts = []
    for np_ in _SWEEP_PROBES:
        iv = ivf_topk(
            em, q, k=_SWEEP_K, num_centroids=16, nprobe=np_
        ).select("query_id", "neighbor_id")
        parts.append(
            bf.join(iv, ["query_id", "neighbor_id"]).agg(
                F.lit(np_).cast("long").alias("nprobe"),
                F.count(F.lit(1)).cast("long").alias("n_hits"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "nprobe",
        "n_hits",
        (F.col("n_hits").cast("double") / F.lit(denom)).alias(
            f"recall_at_{_SWEEP_K}"
        ),
    )


# --------------------------------------------------------------------------
# CMS-gated heavy hitters with exact verification.
# --------------------------------------------------------------------------

_HH_PHI = "0.005"


@register(
    "heavy_hitter_tokens",
    f"""
    WITH toks AS (
      SELECT t.token FROM documents,
        UNNEST(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    n AS (SELECT COUNT(*) AS n_tok FROM toks),
    cells AS MATERIALIZED (
      SELECT seed, {_CMS_BUCKET.format(t="token")} AS bucket,
             COUNT(*) AS cnt
      FROM toks, UNNEST(range(0, {_CMS_DEPTH})) AS s(seed)
      GROUP BY 1, 2
    ),
    vocab AS (SELECT DISTINCT token FROM toks),
    probes AS (
      SELECT v.token, s.seed, {_CMS_BUCKET.format(t="v.token")} AS bucket
      FROM vocab v, UNNEST(range(0, {_CMS_DEPTH})) AS s(seed)
    ),
    est AS (
      SELECT token, MIN(COALESCE(cnt, 0)) AS e FROM probes
      LEFT JOIN cells USING (seed, bucket) GROUP BY token
    ),
    thresh AS (
      SELECT CAST(ceil(CAST({_HH_PHI} AS DOUBLE)
                       * CAST(n_tok AS DOUBLE)) AS BIGINT) AS th
      FROM n
    ),
    cand AS (SELECT token, e FROM est, thresh WHERE e >= th),
    exact AS (
      SELECT token, COUNT(*) AS c FROM toks
      WHERE token IN (SELECT token FROM cand) GROUP BY token
    )
    SELECT cand.token,
           CAST(cand.e AS BIGINT) AS cms_estimate,
           CAST(exact.c AS BIGINT) AS exact_count,
           thresh.th AS hh_threshold,
           exact.c >= thresh.th AS is_true_hh
    FROM cand JOIN exact USING (token), thresh
    """,
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Find-ALL φ-frequent tokens (φ = 0.5%) with the count-min
    sketch as the candidate gate and one exact count join scoped to
    the candidates — CMS only over-counts, so the candidate set is a
    superset of the true heavy set and ``is_true_hh`` exposes the
    sketch's false positives. The companion to
    ``cms_token_frequency``'s point queries: same depth×width
    mergeable cell table, vocabulary-sized probe pass, candidate-
    bounded exact pass."""
    from ..operators.aggregates import cms_heavy_hitters

    d = load_tables(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    return cms_heavy_hitters(
        toks, phi=float(_HH_PHI), depth=_CMS_DEPTH, width=_CMS_WIDTH
    )


# --------------------------------------------------------------------------
# Flesch reading ease per source.
# --------------------------------------------------------------------------


@register(
    "readability_by_source",
    """
    WITH f AS (
      SELECT source,
             len(string_split(lower(text), ' ')) AS w,
             len(regexp_extract_all(lower(text), '[aeiou]+')) AS sy,
             greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS s
      FROM documents
    ),
    scored AS (
      SELECT source,
             (CAST(206.835 AS DOUBLE)
              - CAST(1.015 AS DOUBLE)
                * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE)))
              - CAST(84.6 AS DOUBLE)
                * (CAST(sy AS DOUBLE) / CAST(w AS DOUBLE)) AS flesch
      FROM f WHERE w > 0
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(floor(flesch * CAST(1e8 AS DOUBLE)) AS BIGINT))
                AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * CAST(1e8 AS DOUBLE))
             AS mean_flesch
    FROM scored GROUP BY source
    """,
)
def readability_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean Flesch reading-ease per source — the readability axis of
    the quality-score family (vowel-group syllables, terminal-
    punctuation sentences). One Column-expression scan, one hash
    aggregate; the per-source mean is an exact integer sum of
    1e-8-quantized per-doc scores, so the float never depends on
    aggregation order."""
    from ..operators.text import flesch_reading_ease

    d = load_tables(spark, sf_dir, "documents")
    per_doc = flesch_reading_ease(
        d.select("source", "doc_id", "text"), id_col="source"
    )
    q = F.floor(F.col("flesch") * F.lit(1e8)).cast("long")
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.sum(q).cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(1e8))
        ).alias("mean_flesch"),
    )


# --------------------------------------------------------------------------
# CUSUM changepoint screen over per-type daily value series.
# --------------------------------------------------------------------------


@register(
    "cusum_value_changepoints",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2
    ),
    q AS (
      SELECT event_type, day,
             CAST(floor(v * CAST(1e8 AS DOUBLE)) AS BIGINT) AS qv
      FROM daily
    ),
    staged AS (
      SELECT event_type, day,
             SUM(qv) OVER (PARTITION BY event_type ORDER BY day
                           ROWS UNBOUNDED PRECEDING) AS cq,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY day) AS t,
             SUM(qv) OVER (PARTITION BY event_type) AS tot,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM q
    ),
    scored AS (
      SELECT *,
             (CAST(cq AS DOUBLE)
              - CAST(t AS DOUBLE)
                * (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)))
              / CAST(1e8 AS DOUBLE) AS s
      FROM staged
    ),
    top AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY event_type ORDER BY abs(s) DESC, day ASC
        ) AS rk FROM scored
      ) WHERE rk = 1
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_points,
           day AS cp_time,
           s AS cusum_at_cp,
           CAST(cq AS DOUBLE)
             / (CAST(t AS DOUBLE) * CAST(1e8 AS DOUBLE)) AS mean_before,
           CASE WHEN n > t THEN
             CAST(tot - cq AS DOUBLE)
               / (CAST(n - t AS DOUBLE) * CAST(1e8 AS DOUBLE))
           END AS mean_after
    FROM top
    """,
)
def cusum_value_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM changepoint screen over the daily value
    series: S_t = Σ(x−x̄), change day = argmax |S_t| — flags WHERE
    the level shifted before anyone fits a model. Daily sums are
    exact decimal, the CUSUM works on 1e-8 fixed-point integers, and
    the only doubles (μ, S_t) use identical IEEE ops in both engines
    so the argmax can't diverge. One window sort per type, nothing
    crosses groups."""
    from ..operators.timeseries import cusum_changepoint

    e = load_tables(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("v")
    )
    return cusum_changepoint(daily, "event_type", "day", "v")


# --------------------------------------------------------------------------
# LSH banding s-curve sweep.
# --------------------------------------------------------------------------

_SWEEP_BAND_SIZES = (1, 2, 4)
_SWEEP_NUM_HASHES = 8
# floor 0: keep EVERY co-shingle pair, so the report shows both ends
# of the s-curve — the low-J bins measure the candidate
# false-positive cost of a banding, the high-J bins its recall (the
# synthetic corpus is bimodal: ~11.5k near-zero-J pairs vs 25 true
# dups at sf0.01, which is exactly the shape a dedup corpus has)
_SWEEP_J_FLOOR = "0.0"
# The exact-truth tier runs on a FIXED deterministic stratum
# (doc_id < 600 — full coverage at sf0.01's 500 docs, a sample of
# larger corpora), mirroring semdedup_recall_audit's vec_id < 600:
# the calibration audit is quadratic in the SAMPLE, constant in the
# corpus, which is the only shape a brute-truth tier can have at
# 100 TB. Signatures are per-document, so stratum detection rates
# equal what the same pairs score in a full-corpus sweep.
_SWEEP_STRATUM_N = 600


def _pow_chain_sql(x: str, p: int) -> str:
    """Mirror of operators.dedup._mult_chain: explicit multiply tree."""
    y = x
    while p > 1:
        y = f"({y} * {y})"
        p //= 2
    return y


def _band_sweep_oracle() -> str:
    from .dedup import _shingles_cte

    ctes = [
        "seeds AS (SELECT UNNEST(range(0, 8)) AS seed)",
        """sig AS MATERIALIZED (
      SELECT doc_id, seed,
             MIN(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS sig
      FROM sh, seeds GROUP BY doc_id, seed
    )""",
        """inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )""",
        f"""ex AS MATERIALIZED (
      SELECT i.id_a, i.id_b,
             i.n_inter * 1.0 / (sa.sz + sb.sz - i.n_inter) AS j
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.id_a
      JOIN sizes sb ON sb.doc_id = i.id_b
      WHERE i.n_inter * 1.0 / (sa.sz + sb.sz - i.n_inter)
            >= CAST({_SWEEP_J_FLOOR} AS DOUBLE)
    )""",
    ]
    branches = []
    for r in _SWEEP_BAND_SIZES:
        n_bands = _SWEEP_NUM_HASHES // r
        jr = _pow_chain_sql("e.j", r)
        miss = _pow_chain_sql(f"(CAST(1.0 AS DOUBLE) - {jr})", n_bands)
        theory = f"(CAST(1.0 AS DOUBLE) - {miss})"
        ctes += [
            f"""bands{r} AS (
      SELECT doc_id, seed // {r} AS band,
             md5(MIN(sig) || MAX(sig)) AS band_sig
      FROM sig GROUP BY doc_id, seed // {r}
    )""",
            f"""cand{r} AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands{r} a
      JOIN bands{r} b ON a.band = b.band AND a.band_sig = b.band_sig
                      AND a.doc_id < b.doc_id
    )""",
            f"""per{r} AS (
      SELECT CAST({n_bands} AS BIGINT) AS bands,
             CAST({r} AS BIGINT) AS rows_per_band,
             CAST(floor(e.j * CAST(5.0 AS DOUBLE)) AS BIGINT) AS j_bin5,
             CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_detected,
             CAST(SUM(CASE WHEN c.id_a IS NOT NULL THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS detect_rate,
             (CAST(SUM(CAST(floor({theory} * CAST(1e8 AS DOUBLE))
                            AS BIGINT)) AS DOUBLE)
              / CAST(1e8 AS DOUBLE))
               / CAST(COUNT(*) AS DOUBLE) AS mean_theory_detect
      FROM ex e
      LEFT JOIN cand{r} c ON c.id_a = e.id_a AND c.id_b = e.id_b
      GROUP BY 3
    )""",
        ]
        branches.append(f"SELECT * FROM per{r}")
    return (
        "\n    WITH "
        + _shingles_cte(_SWEEP_STRATUM_N)
        + ",\n    "
        + ",\n    ".join(ctes)
        + "\n    "
        + "\n    UNION ALL ".join(branches)
    )


@register("lsh_band_sweep", _band_sweep_oracle())
def lsh_band_sweep_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding s-curve calibration: detection rate of each
    (bands, rows) split of the 8-hash MinHash signature over the
    true Jaccard pairs (J ≥ 0.2), per 0.2-wide Jaccard bin, next to
    the classic 1−(1−J^r)^b reference — the table that picks the
    banding configuration before the sketch gates a corpus. Truth
    tier is the exact co-shingle join, bounded to the deterministic
    ``doc_id < _SWEEP_STRATUM_N`` stratum (quadratic in the sample,
    constant in the corpus — the registered query now IS the shape
    this audit has at 100 TB); powers are explicit multiply chains
    so the reference column hashes identically."""
    from ..operators.dedup import lsh_band_sweep

    d = load_tables(spark, sf_dir, "documents")
    return lsh_band_sweep(
        d.filter(F.col("doc_id") < _SWEEP_STRATUM_N),
        "doc_id",
        "text",
        n=3,
        num_hashes=_SWEEP_NUM_HASHES,
        band_sizes=_SWEEP_BAND_SIZES,
        j_floor=float(_SWEEP_J_FLOOR),
    )


# --------------------------------------------------------------------------
# SemDeDup recall audit: cell-restriction detection rate vs the
# brute-force verifier, per cosine bin.
# --------------------------------------------------------------------------

# the truth tier is brute-force (quadratic BY DESIGN — it is the
# audit); the query runs it on a FIXED-SIZE deterministic stratum
# (the first 600 ids), so audit cost is CONSTANT in corpus size —
# exactly how the audit runs against a 100 TB corpus. Centroids
# stay trained on the FULL corpus; only the pair space is sampled.
_AUDIT_N = 600

_BRUTE_PAIRS_CTE = f"""
    n3 AS (SELECT * FROM n WHERE vec_id < {_AUDIT_N}),
    bpairs AS MATERIALIZED (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_reduce(list_transform(range(1, 65), i ->
                 CAST(a.embedding[i] AS DOUBLE)
                 * CAST(b.embedding[i] AS DOUBLE)),
               (acc, x) -> acc + x) / (a.nrm * b.nrm) AS cosine
      FROM n3 a JOIN n3 b ON a.vec_id < b.vec_id
      WHERE list_reduce(list_transform(range(1, 65), i ->
                CAST(a.embedding[i] AS DOUBLE)
                * CAST(b.embedding[i] AS DOUBLE)),
              (acc, x) -> acc + x) / (a.nrm * b.nrm) >= {_SEMDEDUP_TAU}
    )"""


@register(
    "semdedup_recall_audit",
    f"""
    WITH {_NORM_CTE},
    {_lloyd_oracle_sql(_KM_ROUNDS, num_centroids=_SEMDEDUP_K_SQL)},
    asg AS MATERIALIZED (
      SELECT id, cell FROM (
        SELECT v.vec_id AS id, c.cid AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY list_reduce(list_transform(range(1, 65), i ->
                     CAST(v.embedding[i] AS DOUBLE) * c.cvec[i]),
                     (acc, x) -> acc + x) / (v.nrm * c.cnorm) DESC,
                   c.cid ASC) AS rnk
        FROM n v CROSS JOIN {_KM_FINAL} c
      ) WHERE rnk = 1
    ),
    {_BRUTE_PAIRS_CTE},
    spairs AS (
      SELECT b.id_a, b.id_b
      FROM bpairs b
      JOIN asg aa ON aa.id = b.id_a
      JOIN asg ab ON ab.id = b.id_b AND ab.cell = aa.cell
    )
    SELECT CAST(floor(b.cosine * CAST(10.0 AS DOUBLE)) AS BIGINT)
             AS cos_bin10,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN s.id_a IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_detected,
           CAST(SUM(CASE WHEN s.id_a IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS detect_rate
    FROM bpairs b
    LEFT JOIN spairs s ON s.id_a = b.id_a AND s.id_b = b.id_b
    GROUP BY 1
    """,
)
def semdedup_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall audit every candidate-restricted tier carries
    here: which fraction of the BRUTE-FORCE cosine pairs (τ ≥ 0.46)
    the SemDeDup cell restriction actually finds, per 0.1-wide
    cosine bin — pairs split across cells are the misses, and they
    concentrate near the threshold. The embedding twin of
    `lsh_band_sweep` / `minhash_jaccard_calibration`. The truth tier
    is brute-force by definition, so the audit runs on a FIXED-SIZE
    deterministic stratum (first 600 ids — quadratic in the SAMPLE,
    constant in the corpus) against centroids trained on the full
    corpus — the exact shape this audit has at 100 TB."""
    from ..operators.dedup import embedding_cosine_pairs
    from ..operators.similarity import semdedup_pairs

    em = load_tables(spark, sf_dir, "embeddings")
    stratum = em.filter(F.col("vec_id") < _AUDIT_N)
    brute = embedding_cosine_pairs(stratum, threshold=_SEMDEDUP_TAU)
    sem = (
        semdedup_pairs(
            stratum, _km_index_scaled(spark, sf_dir), threshold=_SEMDEDUP_TAU
        )
        .select("id_a", "id_b")
        .withColumn("__hit", F.lit(1))
    )
    flagged = brute.join(sem, ["id_a", "id_b"], "left")
    return flagged.groupBy(
        F.floor(F.col("cosine") * F.lit(10.0)).cast("long").alias("cos_bin10")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("n_detected"),
        (
            F.sum(F.coalesce("__hit", F.lit(0))).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("detect_rate"),
    )


# --------------------------------------------------------------------------
# Incremental IVF index maintenance: assign a delta batch against
# the FROZEN quantizer, search the unioned inverted file.
# --------------------------------------------------------------------------


@register(
    "ann_ivf_incremental",
    f"""
    WITH {_NORM_CTE},
    corpus2 AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + (SELECT MAX(vec_id) + 1 FROM embeddings)
               AS vec_id, embedding
      FROM embeddings WHERE vec_id % 7 = 0
    ),
    n2 AS (
      SELECT vec_id, embedding,
             sqrt(list_reduce(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (acc, v) -> acc + v)) AS nrm
      FROM corpus2
    ),
    cent AS (SELECT vec_id, embedding, nrm FROM n ORDER BY vec_id LIMIT 16),
    asg AS MATERIALIZED (
      SELECT id, cell FROM (
        SELECT q.vec_id AS id, c.vec_id AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id ORDER BY
                   list_reduce(list_transform(range(1, 65), i ->
                       CAST(q.embedding[i] AS DOUBLE)
                       * CAST(c.embedding[i] AS DOUBLE)),
                     (acc, x) -> acc + x) / (q.nrm * c.nrm) DESC,
                   c.vec_id
               ) AS rnk
        FROM n2 q CROSS JOIN cent c
      ) WHERE rnk = 1
    ),
    probe AS (
      SELECT qid, cell FROM (
        SELECT q.vec_id AS qid, c.vec_id AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id ORDER BY {_COS} DESC, c.vec_id
               ) AS rnk
        FROM n q CROSS JOIN cent c
        WHERE q.vec_id < 10
      ) WHERE rnk <= 4
    ),
    isims AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_reduce(list_transform(range(1, 65), i ->
                 CAST(q.embedding[i] AS DOUBLE)
                 * CAST(c.embedding[i] AS DOUBLE)),
               (acc, x) -> acc + x) / (q.nrm * c.nrm) AS cosine
      FROM probe p
      JOIN asg a ON a.cell = p.cell
      JOIN n q ON q.vec_id = p.qid
      JOIN n2 c ON c.vec_id = a.id
      WHERE c.vec_id != q.vec_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rank FROM isims
    ) WHERE rank <= 5
    """,
)
def ann_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental inverted-file maintenance: a delta batch (every
    7th vector re-ingested under a MAX(id)+1-offset id) is assigned
    against the FROZEN lowest-id quantizer and UNIONED onto the
    existing index — the existing corpus is never re-read or
    re-shuffled — then queries search the combined file via
    `ivf_topk_from_index`. The ANN twin of the CDC/merge family:
    index maintenance is an append, retraining is a separate,
    drift-triggered decision. The oracle replays assignment over
    base ∪ delta with base-only centroids."""
    from ..operators.similarity import (
        ivf_assign,
        ivf_centroids,
        ivf_topk_from_index,
    )

    em = load_tables(spark, sf_dir, "embeddings")
    off = em.agg(F.max("vec_id")).first()[0] + 1
    delta = em.filter(F.col("vec_id") % 7 == 0).select(
        (F.col("vec_id") + F.lit(off)).alias("vec_id"), "embedding"
    )
    cents = ivf_centroids(em, num_centroids=16)
    index = ivf_assign(em, cents).unionByName(ivf_assign(delta, cents))
    q = em.filter(F.col("vec_id") < 10)
    return ivf_topk_from_index(index, q, cents, k=5, nprobe=4)
