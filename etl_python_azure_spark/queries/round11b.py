"""Round-11b registry surface — the post-queue wave.

With the r10-verdict queue drained (r11 window, bench rotation,
advice items, token-span family), this module adds the curation
capabilities a 100 TB training-data pipeline still reaches for:

- ``scoped_vs_global_dedup`` — FineWeb's central measurement: how
  much exact-duplicate mass is INVISIBLE to per-source (per-dump)
  dedup because the copies live in different sources. One scan, two
  window-min passes — the number that decides whether dedup must be
  global (shuffle the world) or can stay per-dump (embarrassingly
  parallel).
- ``quality_ensemble_rank`` — rank-average ensembling of independent
  quality signals (the robust-aggregation trick: percentile ranks
  are scale-free, so no signal dominates by units), per source so
  the ranking is distributed by construction.
- ``span_removal_rewrite`` — the TRANSFORM the span-coverage family
  reports on: excise cross-doc duplicated windows from every
  non-canonical holder and emit the rewritten text (Lee et al. 2022
  exact-substring dedup as an actual rewrite, not just a stat).
- ``semantic_decontamination`` — embedding-space benchmark
  decontamination (n-gram overlap misses paraphrases): sign-LSH
  blocked cosine against a reference set.
- ``matryoshka_recall_sweep`` — recall@k of prefix-truncated
  embeddings vs the full-dim ground truth (Kusupati et al. 2022
  MRL): the measured cost/recall dial for shrinking ANN indexes.
- ``part_ship_overlap_pairs`` — distributed interval-overlap join
  via grid binning with canonical-cell pair dedup (the classic
  scale pattern Spark lacks natively).
- ``token_budget_selection`` / ``curriculum_phase_manifest`` —
  budget-constrained corpus selection and curriculum phase
  assignment, both on a GLOBAL quality order computed with the
  bucket-offset distributed rank (no single-task window).
- ``doremi_mixture_weights`` — DoReMi-style multiplicative mixture
  reweighting, linearized, in 1e9-scale integer fixed point so the
  iteration replays bit-identically in both engines.
- ``dsir_vs_nb_agreement`` — 2×2 keep-decision contingency of the
  registry's two cheap selection signals.
- ``unimax_language_budgets`` — UniMax per-language token budgets as
  integer waterfilling with an epoch cap.
- ``l_diversity_report`` — the sensitive-attribute refinement of the
  k-anonymity audit.
- ``ann_matryoshka_topk`` — the Matryoshka production tier: IVF in
  the truncated prefix space, exact full-dim rerank of the
  candidate set.

Determinism: counts CAST AS BIGINT; doubles only from identical
operation order both engines; ranks carry a doc_id tiebreak; no
array/map/struct output columns; iterative algorithms (DoReMi,
UniMax) run in integer fixed point end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_tables
from . import _span_sql, register

# --------------------------------------------------------------------------
# Scoped (per-source) vs global exact dedup — the cross-source
# duplicate mass per-dump dedup cannot see.
# --------------------------------------------------------------------------

_SVG_ORACLE = """
    WITH f AS (
      SELECT doc_id, source, md5(text) AS fp FROM documents
    ),
    k AS (
      SELECT doc_id, source,
             MIN(doc_id) OVER (PARTITION BY fp) AS gkeep,
             MIN(doc_id) OVER (PARTITION BY source, fp) AS lkeep
      FROM f
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id = lkeep THEN 1 ELSE 0 END)
                AS BIGINT) AS local_unique,
           CAST(SUM(CASE WHEN doc_id = gkeep THEN 1 ELSE 0 END)
                AS BIGINT) AS global_unique,
           CAST(SUM(CASE WHEN doc_id = lkeep AND doc_id != gkeep
                    THEN 1 ELSE 0 END) AS BIGINT)
             AS cross_source_dups,
           CAST(SUM(CASE WHEN doc_id = lkeep AND doc_id != gkeep
                    THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS cross_source_dup_rate
    FROM k
    GROUP BY source
    """


@register("scoped_vs_global_dedup", _SVG_ORACLE)
def scoped_vs_global_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source delta between LOCAL (within-source) and GLOBAL
    exact keep-first dedup — FineWeb's core finding was that this
    choice changes model quality, and at 100 TB it decides the job
    shape: local dedup never shuffles across dumps, global dedup
    pays one corpus-wide hash shuffle. `cross_source_dups` counts
    docs a per-source pass would KEEP that a global pass drops —
    the duplicate mass invisible to scoped dedup.

    Scale shape: one scan; both keeper verdicts are window mins over
    the SAME md5 shuffle key (source,fp refines fp, so Spark plans
    one exchange on fp then a cheap sort — no second corpus
    shuffle); final rollup is a source-grain hash aggregate. Doc
    text never leaves the scan (only 32-byte fingerprints shuffle).
    """
    d = load_tables(spark, sf_dir, "documents")
    f = d.select("doc_id", "source", F.md5("text").alias("fp"))
    gkeep = F.min("doc_id").over(Window.partitionBy("fp"))
    lkeep = F.min("doc_id").over(Window.partitionBy("source", "fp"))
    k = f.select(
        "doc_id",
        "source",
        gkeep.alias("gkeep"),
        lkeep.alias("lkeep"),
    )
    is_l = (F.col("doc_id") == F.col("lkeep")).cast("long")
    is_g = (F.col("doc_id") == F.col("gkeep")).cast("long")
    is_x = (
        (F.col("doc_id") == F.col("lkeep"))
        & (F.col("doc_id") != F.col("gkeep"))
    ).cast("long")
    return k.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(is_l).cast("long").alias("local_unique"),
        F.sum(is_g).cast("long").alias("global_unique"),
        F.sum(is_x).cast("long").alias("cross_source_dups"),
        (
            F.sum(is_x).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("cross_source_dup_rate"),
    )


# --------------------------------------------------------------------------
# Rank-average quality ensembling.
# --------------------------------------------------------------------------

_QER_ORACLE = """
    WITH m AS (
      SELECT doc_id, source,
             len(string_split(lower(text), ' ')) AS n_words,
             length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
               * 1.0 / length(text) AS alpha_ratio,
             length(replace(lower(text), ' ', ''))
               * 1.0 / len(string_split(lower(text), ' '))
               AS avg_word_len
      FROM documents
    ),
    r AS (
      SELECT doc_id, source,
             PERCENT_RANK() OVER (
               PARTITION BY source ORDER BY alpha_ratio, doc_id
             ) AS r_alpha,
             PERCENT_RANK() OVER (
               PARTITION BY source ORDER BY n_words, doc_id
             ) AS r_words,
             PERCENT_RANK() OVER (
               PARTITION BY source ORDER BY avg_word_len, doc_id
             ) AS r_wlen
      FROM m
    )
    SELECT doc_id, source,
           (r_alpha + r_words + r_wlen) / 3.0 AS ensemble_rank,
           CAST(CASE WHEN (r_alpha + r_words + r_wlen) / 3.0 >= 0.9
                THEN 1 ELSE 0 END AS BIGINT) AS top_decile
    FROM r
    """


@register("quality_ensemble_rank", _QER_ORACLE)
def quality_ensemble_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-average ensemble of three independent quality signals
    (alphabetic ratio, word count, average word length): each signal
    becomes a within-source percentile rank (scale-free, so no
    signal dominates by units — the standard robust-aggregation
    move when combining heuristic scores with classifier logits),
    and the ensemble is their mean. `top_decile` marks the curation
    keep set a quota-based selector would take first.

    Scale shape: one scan computes all three signals; the three
    window ranks share ONE partitioning (source), so Spark plans a
    single exchange + three sorts — distributed by construction
    (sources are the natural unit: rank thresholds should not drift
    because one crawl dump grew). doc_id tiebreaks make every rank
    reproducible. percent_rank is (rank-1)/(n-1) in both engines —
    small-integer ratios, bit-exact.
    """
    d = load_tables(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    words = F.split(lower, " ")
    m = d.select(
        "doc_id",
        "source",
        F.size(words).alias("n_words"),
        (
            F.length(F.regexp_replace(lower, "[^a-z]", ""))
            * F.lit(1.0)
            / F.length(F.col("text"))
        ).alias("alpha_ratio"),
        (
            F.length(F.regexp_replace(lower, " ", ""))
            * F.lit(1.0)
            / F.size(words)
        ).alias("avg_word_len"),
    )

    def pr(col: str):
        return F.percent_rank().over(
            Window.partitionBy("source").orderBy(F.col(col), F.col("doc_id"))
        )

    r = m.select(
        "doc_id",
        "source",
        pr("alpha_ratio").alias("r_alpha"),
        pr("n_words").alias("r_words"),
        pr("avg_word_len").alias("r_wlen"),
    )
    ens = (F.col("r_alpha") + F.col("r_words") + F.col("r_wlen")) / F.lit(3.0)
    return r.select(
        "doc_id",
        "source",
        ens.alias("ensemble_rank"),
        (ens >= 0.9).cast("long").alias("top_decile"),
    )


# --------------------------------------------------------------------------
# Span removal as a rewrite (Lee et al. exact-substring dedup).
# --------------------------------------------------------------------------

_SRW_W = 8  # whitespace-token window, matching merged_span_coverage

_SRW_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    toks AS (
      SELECT doc_id, i AS pos, t[i] AS tok
      FROM base, UNNEST(range(1, len(t) + 1)) AS u(i)
    ),
    sp AS (
      SELECT doc_id, i AS pos, i + {_SRW_W - 1} AS e,
             md5(array_to_string(t[i:i+{_SRW_W - 1}], ' ')) AS fp
      FROM base,
           UNNEST(range(1, greatest(len(t) - {_SRW_W - 2}, 1))) AS u(i)
    ),
{_span_sql.ownership_flagged('sp')},{_span_sql.numbered_islands('flg')},
    bounds AS (
      SELECT doc_id, island, MIN(pos) AS s, MAX(e) AS e
      FROM isl2 GROUP BY 1, 2
    ),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok
      FROM toks t
      WHERE NOT EXISTS (
        SELECT 1 FROM bounds b
        WHERE b.doc_id = t.doc_id AND t.pos BETWEEN b.s AND b.e
      )
    ),
    reb AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
             string_agg(tok, ' ' ORDER BY pos) AS rewritten_text
      FROM kept GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(len(b.t) AS BIGINT) AS n_tokens,
           CAST(COALESCE(r.kept_tokens, 0) AS BIGINT) AS kept_tokens,
           CAST(len(b.t) - COALESCE(r.kept_tokens, 0) AS BIGINT)
             AS removed_tokens,
           COALESCE(r.rewritten_text, '') AS rewritten_text
    FROM base b LEFT JOIN reb r USING (doc_id)
    """


@register("span_removal_rewrite", _SRW_ORACLE)
def span_removal_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The span family's TRANSFORM: excise every cross-doc duplicated
    {W}-token window from all but its canonical (min-id) holder and
    emit the rewritten text — Lee et al. 2022 exact-substring dedup
    as the operation that actually changes the training corpus, not
    just a coverage stat. `merged_span_coverage` predicts what this
    removes; this produces the corpus after removal."""
    from ..operators.dedup import span_removal

    d = load_tables(spark, sf_dir, "documents")
    return span_removal(d, "doc_id", "text", window=_SRW_W)


# --------------------------------------------------------------------------
# Semantic (embedding-space) benchmark decontamination.
# --------------------------------------------------------------------------

_SD_TAU = 0.46  # cosine threshold with collision support in testdata

# DuckDB twins of the engine's fold-based cosine machinery (aliases
# a = corpus side, r = reference side); the bucket expression is the
# shared 4-plane sign-LSH from queries/similarity.py.
_SD_COS = """list_reduce(
             list_transform(range(1, 65),
               i -> CAST(a.embedding[i] AS DOUBLE)
                    * CAST(r.embedding[i] AS DOUBLE)),
             (acc, v) -> acc + v) / (a.nrm * r.nrm)"""


def _sd_oracle() -> str:
    from .similarity import _BUCKET, _NORM_CTE

    return f"""
    WITH {_NORM_CTE},
    b AS (
      SELECT vec_id,
             CAST({_BUCKET.format(e='embedding')} AS BIGINT) AS bucket
      FROM embeddings
    ),
    nb AS (SELECT n.*, b.bucket FROM n JOIN b USING (vec_id)),
    m AS (
      SELECT a.vec_id, {_SD_COS} AS cosine
      FROM nb a JOIN nb r
        ON a.bucket = r.bucket
       AND r.vec_id % 50 = 0 AND r.vec_id != a.vec_id
      WHERE {_SD_COS} >= {_SD_TAU}
    ),
    agg AS (
      SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
             MAX(cosine) AS max_cosine
      FROM m GROUP BY vec_id
    )
    SELECT e.vec_id,
           CAST(COALESCE(a.n_matches, 0) AS BIGINT) AS n_matches,
           a.max_cosine,
           CAST(CASE WHEN COALESCE(a.n_matches, 0) > 0
                THEN 1 ELSE 0 END AS BIGINT) AS is_contaminated
    FROM embeddings e LEFT JOIN agg a USING (vec_id)
    """


@register("semantic_decontamination", _sd_oracle())
def semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination against a reference set
    (every 50th vector stands in for the benchmark suite): n-gram
    span matching (`token_ngram_contamination`) misses paraphrases
    and translations; cosine against the benchmark's embeddings is
    the complementary detector the public decontamination stacks
    run second. Sign-LSH bucket blocking + broadcast reference —
    the corpus never shuffles."""
    from ..operators.similarity import semantic_contamination

    em = load_tables(spark, sf_dir, "embeddings")
    return semantic_contamination(
        em, em.filter(F.col("vec_id") % 50 == 0), threshold=_SD_TAU
    )


# --------------------------------------------------------------------------
# Matryoshka prefix-truncation recall sweep.
# --------------------------------------------------------------------------

_MRL_DIMS = (4, 16, 64)
_MRL_K = 5


def _mrl_topk_cte(d: int) -> str:
    """Ranked top-k CTE over the first *d* dims (renormalized)."""
    return f"""
    n{d} AS (
      SELECT vec_id, embedding,
             sqrt(list_reduce(
               list_transform(embedding[1:{d}],
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (acc, v) -> acc + v)) AS nrm
      FROM embeddings
    ),
    s{d} AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_reduce(
                 list_transform(range(1, {d + 1}),
                   i -> CAST(q.embedding[i] AS DOUBLE)
                        * CAST(c.embedding[i] AS DOUBLE)),
                 (acc, v) -> acc + v) / (q.nrm * c.nrm) DESC,
               c.vec_id
             ) AS rank
      FROM n{d} q JOIN n{d} c ON c.vec_id != q.vec_id
      WHERE q.vec_id < 10
    ),
    t{d} AS (SELECT query_id, neighbor_id FROM s{d} WHERE rank <= {_MRL_K})"""


def _mrl_oracle() -> str:
    full = max(_MRL_DIMS)
    ctes = ",".join(_mrl_topk_cte(d) for d in _MRL_DIMS)
    rows = " UNION ALL ".join(
        f"""SELECT CAST({d} AS BIGINT) AS trunc_dim,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM t{d} a
              JOIN t{full} g USING (query_id, neighbor_id)) AS hits"""
        for d in _MRL_DIMS
    )
    return f"""
    WITH {ctes},
    nq AS (
      SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n_queries
      FROM embeddings WHERE vec_id < 10
    ),
    r AS ({rows})
    SELECT r.trunc_dim, nq.n_queries,
           CAST(r.hits AS DOUBLE)
             / CAST(nq.n_queries * {_MRL_K} AS DOUBLE) AS recall
    FROM r, nq
    """


@register("matryoshka_recall_sweep", _mrl_oracle())
def matryoshka_recall_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of prefix-truncated embeddings against the full-dim
    exact top-k (Kusupati et al. 2022, Matryoshka Representation
    Learning): the measured dial for shrinking an ANN index —
    storing the first d of D dims cuts index bytes and scan cost to
    d/D, and this sweep says what ranking quality that buys. The
    full-dim row (trunc_dim = 64, recall 1.0) is the built-in
    sanity anchor.

    Scale shape: per dim, one broadcast of the (tiny) query set
    against the corpus — linear scans, no corpus shuffle; the hit
    join is k-rows-per-query sized. At 100 TB the truncated tier
    runs as the IVF prefilter (`ann_ivf_topk` on embedding[1:d])
    with full-dim rerank — this sweep is how that d gets chosen.
    """
    from ..operators.similarity import cosine_topk, truncated_cosine_topk

    em = load_tables(spark, sf_dir, "embeddings")
    q = em.filter(F.col("vec_id") < 10)
    full = max(_MRL_DIMS)
    truth = cosine_topk(em, q, k=_MRL_K).select("query_id", "neighbor_id")
    nq = q.agg(
        F.count_distinct(F.col("vec_id")).cast("long").alias("n_queries")
    )
    per_dim = []
    for d in _MRL_DIMS:
        tk = truncated_cosine_topk(em, q, d, k=_MRL_K).select(
            "query_id", "neighbor_id"
        )
        hits = tk.join(truth, ["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).cast("long").alias("hits")
        )
        per_dim.append(
            hits.select(
                F.lit(d).cast("long").alias("trunc_dim"), F.col("hits")
            )
        )
    rows = per_dim[0]
    for p in per_dim[1:]:
        rows = rows.unionByName(p)
    return rows.crossJoin(F.broadcast(nq)).select(
        "trunc_dim",
        "n_queries",
        (
            F.col("hits").cast("double")
            / (F.col("n_queries") * F.lit(_MRL_K)).cast("double")
        ).alias("recall"),
    )


# --------------------------------------------------------------------------
# Interval-overlap join (grid-binned) — same-part cross-supplier
# shipping-window contention.
# --------------------------------------------------------------------------

_IOP_ORACLE = """
    WITH iv AS (
      SELECT l_partkey, l_suppkey,
             CAST(l_shipdate AS DATE) AS s,
             CAST(l_shipdate AS DATE)
               + CAST(FLOOR(l_quantity) AS INTEGER) AS e
      FROM lineitem
    )
    SELECT a.l_partkey,
           CAST(COUNT(*) AS BIGINT) AS n_overlap_pairs,
           CAST(MAX(date_diff('day', greatest(a.s, b.s),
                              least(a.e, b.e)) + 1) AS BIGINT)
             AS max_overlap_days
    FROM iv a JOIN iv b
      ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
     AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.l_partkey
    """


@register("part_ship_overlap_pairs", _IOP_ORACLE)
def part_ship_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: for every part, count the
    cross-supplier pairs of shipments whose in-transit windows
    overlap (window = shipdate .. shipdate + quantity days — the
    testdata carries no receipt date, so transit length is derived
    from quantity) and the longest such overlap. The operator is
    the point: Spark has no interval join, and the naive
    formulation is a per-part cross product over the whole 7-year
    axis; `operators/intervals.py` grid-bins each interval to week
    cells, equi-joins on (part, cell), and keeps each pair exactly
    once via the canonical overlap-start cell — no dedup shuffle.
    The oracle is the plain theta-join: binning must be invisible
    in the result."""
    from ..operators.intervals import binned_overlap_pairs

    li = load_tables(spark, sf_dir, "lineitem")
    ship = F.to_date("l_shipdate")
    iv = li.select(
        "l_partkey",
        "l_suppkey",
        ship.alias("ship_date"),
        # explicit floor on BOTH engines: Spark's decimal→int cast
        # truncates while DuckDB's rounds half-away-from-zero — they
        # only coincided because TPC-H quantities are integral
        # (r11 ADVICE); floor() makes the agreement by construction
        F.date_add(ship, F.floor("l_quantity").cast("int")).alias(
            "end_date"
        ),
    )
    pairs = binned_overlap_pairs(
        iv,
        key_cols=["l_partkey"],
        start_col="ship_date",
        end_col="end_date",
        payload_cols=["l_suppkey"],
        bin_days=7,
        distinct_on="l_suppkey",
    )
    return pairs.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_overlap_pairs"),
        F.max("overlap_days").cast("long").alias("max_overlap_days"),
    )


# --------------------------------------------------------------------------
# Budget-constrained selection + curriculum phases on a GLOBAL
# quality order (distributed rank — no single-task window).
# --------------------------------------------------------------------------

# shared signal fragments (DuckDB side)
_QSCORE_SQL = (
    "length(regexp_replace(lower(text), '[^a-z]', '', 'g'))"
    " * 1.0 / length(text)"
)
_QWEIGHT_SQL = (
    "CAST(len(regexp_extract_all(lower(text),"
    " '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)"
)

_TBS_ORACLE = f"""
    WITH m AS (
      SELECT doc_id, source, {_QSCORE_SQL} AS score,
             {_QWEIGHT_SQL} AS w
      FROM documents
    ),
    r AS (
      SELECT *, SUM(w) OVER (
        ORDER BY score DESC, doc_id ROWS UNBOUNDED PRECEDING
      ) AS cw
      FROM m
    ),
    tot AS (
      SELECT CAST(FLOOR(SUM(w) * 0.5) AS BIGINT) AS budget FROM m
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN cw <= budget THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_kept,
           CAST(SUM(CASE WHEN cw <= budget THEN w ELSE 0 END)
                AS BIGINT) AS tokens_kept,
           CAST(MAX(budget) AS BIGINT) AS budget_tokens
    FROM r, tot
    GROUP BY source
    """


def _quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, score, w): the shared quality-score /
    token-weight frame behind the budget and curriculum queries."""
    from ..operators.text import bpe_ish_tokens

    d = load_tables(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    score = (
        F.length(F.regexp_replace(lower, "[^a-z]", ""))
        * F.lit(1.0)
        / F.length(F.col("text"))
    )
    return d.select(
        "doc_id",
        "source",
        score.alias("score"),
        F.size(bpe_ish_tokens("text")).cast("long").alias("w"),
    )


@register("token_budget_selection", _TBS_ORACLE)
def token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained corpus selection: order documents by
    quality (alphabetic ratio; doc_id tiebreak), keep the prefix
    whose running BPE-ish token total fits a budget of half the
    corpus tokens, and report the per-source keep profile — the
    "fill a 10B-token budget with the best documents" job every
    pretraining run schedules.

    Scale shape: the running total uses
    `operators.sampling.ranked_cumsum` — the bucket-offset
    distributed rank (epoch_shuffle's recipe on a value order), so
    NO single-task global window: within-bucket windows cover
    ~1/64 of the corpus each, offsets are a 65-row broadcast. The
    budget scalar is a 1-row broadcast crossJoin, not a collect.
    """
    from ..operators.sampling import ranked_cumsum

    m = _quality_weighted(spark, sf_dir)
    r = ranked_cumsum(m, "doc_id", "score", "w", carry_cols=["source"])
    tot = m.agg(
        F.floor(F.sum("w") * F.lit(0.5)).cast("long").alias("budget")
    )
    kept = F.col("cum_weight") <= F.col("budget")
    return (
        r.crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("tokens_total"),
            F.sum(kept.cast("long")).cast("long").alias("n_docs_kept"),
            F.sum(F.when(kept, F.col("w")).otherwise(F.lit(0)))
            .cast("long")
            .alias("tokens_kept"),
            F.max("budget").cast("long").alias("budget_tokens"),
        )
    )


_CPM_ORACLE = f"""
    WITH m AS (
      SELECT doc_id, source, {_QSCORE_SQL} AS score,
             {_QWEIGHT_SQL} AS w
      FROM documents
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id)
        AS rnk
      FROM m
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM m)
    SELECT CAST(1 + FLOOR(3.0 * (rnk - 1) / n_total) AS BIGINT)
             AS phase,
           source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS n_tokens,
           MIN(score) AS min_score,
           MAX(score) AS max_score
    FROM r, n
    GROUP BY 1, 2
    """


@register("curriculum_phase_manifest", _CPM_ORACLE)
def curriculum_phase_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Curriculum phase assignment: the corpus in global quality
    order split into three equal-count phases (highest-quality
    first — anti-curriculum flips the sign upstream), manifested at
    (phase, source) grain with doc/token mass and the score range
    each phase spans. The rank is the same bucket-offset
    distributed rank as `token_budget_selection` — phase boundaries
    are exact global ranks, not per-partition approximations."""
    from ..operators.sampling import ranked_cumsum

    m = _quality_weighted(spark, sf_dir)
    r = ranked_cumsum(m, "doc_id", "score", "w", carry_cols=["source"])
    n = m.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    phase = (
        F.lit(1)
        + F.floor(
            F.lit(3.0) * (F.col("rank") - 1) / F.col("n_total")
        )
    ).cast("long")
    return (
        r.crossJoin(F.broadcast(n))
        .groupBy(phase.alias("phase"), "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("w").cast("long").alias("n_tokens"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
    )


# --------------------------------------------------------------------------
# DoReMi-style multiplicative mixture reweighting (linearized,
# integer fixed-point so both engines iterate bit-identically).
# --------------------------------------------------------------------------

_DRM_T = 3  # multiplicative-weights iterations
_DRM_SCALE = 1_000_000_000  # 1e9 fixed-point weight scale


def _drm_oracle() -> str:
    s = _DRM_SCALE
    it = """,
    it{t} AS (
      SELECT source, n_docs, n_tokens, mult, w0,
             CAST((CAST(u AS HUGEINT) * {s})
                  // SUM(u) OVER () AS BIGINT) AS w
      FROM (
        SELECT *, (w * mult) // {s} AS u FROM it{p}
      )
    )"""
    iters = "".join(
        it.format(t=t, p=t - 1, s=s) for t in range(1, _DRM_T + 1)
    )
    return f"""
    WITH m AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM({_QWEIGHT_SQL}) AS BIGINT) AS n_tokens,
             SUM(CAST(FLOOR({_QSCORE_SQL} * {s}.0) AS BIGINT)) AS s_q
      FROM documents GROUP BY source
    ),
    base AS (
      SELECT source, n_docs, n_tokens,
             (s_q // n_docs)
               - CAST(SUM(s_q) OVER () // SUM(n_docs) OVER ()
                      AS BIGINT) AS e,
             CAST((CAST(n_tokens AS HUGEINT) * {s})
                  // SUM(n_tokens) OVER () AS BIGINT) AS w0
      FROM m
    ),
    it0 AS (
      SELECT source, n_docs, n_tokens,
             {s // 2} + ((e + {s}) // 2) AS mult,
             w0, w0 AS w
      FROM base
    ){iters}
    SELECT source, n_docs, n_tokens,
           CAST(w0 AS DOUBLE) / {s}.0 AS baseline_weight,
           CAST(w AS DOUBLE) / {s}.0 AS final_weight,
           CAST(w - w0 AS DOUBLE) / {s}.0 AS weight_delta
    FROM it{_DRM_T}
    """


@register("doremi_mixture_weights", _drm_oracle())
def doremi_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style training-mixture reweighting (Xie et al. 2023):
    start from the token-share baseline and run multiplicative
    weights over domains (sources), boosting domains whose quality
    signal exceeds the corpus mean — here the excess signal is the
    deterministic alpha-ratio proxy (a real run plugs in per-domain
    excess loss from a proxy/reference model pair; the ITERATION is
    the operator). Linearized update w ← w·(1 + lr·excess) with
    lr = 1/2, renormalized each round.

    Determinism: the whole iteration runs in 1e9-scale integer
    fixed point — means, multipliers, products, and normalizations
    are BIGINT truncating divisions, bit-identical in Spark and
    DuckDB; doubles appear only in the final projection (exact
    small-integer ratios). Scale shape: one corpus scan aggregates
    to the SOURCE grain; the T iterations are window passes over
    that domain-count-sized frame (single-task by construction and
    bounded by the number of domains — the corpus is never touched
    again)."""
    from ..operators.text import bpe_ish_tokens

    s = _DRM_SCALE
    d = load_tables(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    score = (
        F.length(F.regexp_replace(lower, "[^a-z]", ""))
        * F.lit(1.0)
        / F.length(F.col("text"))
    )
    m = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(bpe_ish_tokens("text")).cast("long"))
        .cast("long")
        .alias("n_tokens"),
        # decimal accumulation: per-doc quantized scores are ≤1e9, so
        # a BIGINT sum overflows near 1e10 docs — decimal(38,0) keeps
        # the fixed-point recipe exact at any corpus size (DuckDB's
        # SUM auto-promotes to HUGEINT, the same widening)
        F.sum(F.floor(score * F.lit(float(s))).cast("decimal(38,0)"))
        .alias("s_q"),
    )
    wall = Window.partitionBy()  # domain-count-sized frame (bounded)
    base = m.select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr(
            f"(s_q div n_docs) - "
            f"(sum(s_q) OVER () div sum(n_docs) OVER ())"
        ).alias("e"),
        # n_tokens·1e9 overflows BIGINT past ~9e9 tokens per domain;
        # widen the product (mirrors the oracle's HUGEINT)
        F.expr(
            f"(CAST(n_tokens AS DECIMAL(38,0)) * {s}) "
            f"div sum(n_tokens) OVER ()"
        ).alias("w0"),
    )
    cur = base.withColumn(
        "mult", F.expr(f"{s // 2}L + ((e + {s}L) div 2)")
    ).withColumn("w", F.col("w0"))
    for _t in range(_DRM_T):
        cur = (
            cur.withColumn("u", F.expr(f"(w * mult) div {s}L"))
            .withColumn("z", F.sum("u").over(wall))
            .withColumn("w", F.expr(f"(u * {s}L) div z"))
            .drop("u", "z")
        )
    return cur.select(
        "source",
        "n_docs",
        "n_tokens",
        (F.col("w0").cast("double") / F.lit(float(s))).alias(
            "baseline_weight"
        ),
        (F.col("w").cast("double") / F.lit(float(s))).alias(
            "final_weight"
        ),
        (
            (F.col("w") - F.col("w0")).cast("double") / F.lit(float(s))
        ).alias("weight_delta"),
    )


# --------------------------------------------------------------------------
# Selection-method agreement: DSIR vs the NB quality classifier.
# --------------------------------------------------------------------------


def _dva_oracle() -> str:
    from .round9 import _DSIR_ORACLE
    from .round11 import _NB_ORACLE

    return f"""
    WITH d AS ({_DSIR_ORACLE}),
    n AS ({_NB_ORACLE})
    SELECT CAST(d.target_like AS BIGINT) AS dsir_keep,
           CAST(n.pred_pos AS BIGINT) AS nb_keep,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(d.n_features) AS BIGINT) AS n_features
    FROM d JOIN n USING (doc_id)
    GROUP BY 1, 2
    """


@register("dsir_vs_nb_agreement", _dva_oracle())
def dsir_vs_nb_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement matrix between the two cheap selection signals the
    registry already ships — DSIR importance resampling
    (`dsir_importance_scores`, target = the English subcorpus) and
    the NB quality classifier (`nb_quality_classifier`, positives =
    curated sources): the 2×2 contingency of their keep decisions,
    with feature mass per cell. Before committing a 100 TB
    selection run, this is the sanity readout that says whether the
    signals are redundant (diagonal-heavy) or complementary — both
    scorers are one-scan linear jobs, so the matrix costs no more
    than running each."""
    from .round9 import dsir_importance_scores_q
    from .round11 import nb_quality_classifier

    d = dsir_importance_scores_q(spark, sf_dir).select(
        "doc_id", "target_like", "n_features"
    )
    n = nb_quality_classifier(spark, sf_dir).select("doc_id", "pred_pos")
    return (
        d.join(n, "doc_id")
        .groupBy(
            F.col("target_like").cast("long").alias("dsir_keep"),
            F.col("pred_pos").cast("long").alias("nb_keep"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_features").cast("long").alias("n_features"),
        )
    )


# --------------------------------------------------------------------------
# UniMax per-language token budgets (integer waterfilling).
# --------------------------------------------------------------------------

_UMX_T = 4  # waterfill rounds (>= number of cap-bind events needed)
_UMX_CAP_EPOCHS = 2  # max epochs any language may repeat
_UMX_BUDGET_NUM, _UMX_BUDGET_DEN = 3, 2  # budget = 1.5 x corpus tokens


def _umx_oracle() -> str:
    it = """,
    it{t} AS (
      SELECT lang, n_tokens, cap,
             alloc + add_ AS alloc,
             r - CAST(SUM(add_) OVER () AS BIGINT) AS r
      FROM (
        SELECT *,
               CASE WHEN alloc < cap THEN
                 LEAST(cap - alloc,
                       r // GREATEST(SUM(CASE WHEN alloc < cap
                                         THEN 1 ELSE 0 END) OVER (), 1))
               ELSE 0 END AS add_
        FROM it{p}
      )
    )"""
    iters = "".join(it.format(t=t, p=t - 1) for t in range(1, _UMX_T + 1))
    return f"""
    WITH m AS (
      SELECT lang,
             CAST(SUM({_QWEIGHT_SQL}) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    it0 AS (
      SELECT lang, n_tokens,
             n_tokens * {_UMX_CAP_EPOCHS} AS cap,
             CAST(0 AS BIGINT) AS alloc,
             CAST((CAST(SUM(n_tokens) OVER () AS HUGEINT)
                   * {_UMX_BUDGET_NUM}) // {_UMX_BUDGET_DEN}
                  AS BIGINT) AS r
      FROM m
    ){iters}
    SELECT lang, n_tokens,
           CAST(cap AS BIGINT) AS cap_tokens,
           CAST(alloc AS BIGINT) AS alloc_tokens,
           CAST(alloc AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS epochs,
           CAST(CASE WHEN alloc >= cap THEN 1 ELSE 0 END AS BIGINT)
             AS capped
    FROM it{_UMX_T}
    """


@register("unimax_language_budgets", _umx_oracle())
def unimax_language_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language sampling (Chung et al. 2023): spread a total
    token budget as uniformly as possible across languages, but cap
    every language at C epochs of its own data (repeating a
    low-resource language more than a few times hurts) and
    waterfill the leftover into the still-open languages. Budget =
    1.5× corpus tokens, C = 2 — small languages hit their cap, the
    head languages absorb the remainder, exactly the UniMax shape.

    Determinism: the whole waterfill is BIGINT arithmetic
    (truncating division; the final sub-|langs| remainder stays
    unallocated and is documented), so both engines agree exactly.
    Scale shape: ONE corpus scan aggregates to the language grain;
    the T waterfill rounds are window passes over the
    language-count-sized frame (single-task by construction,
    bounded by |languages|). The corpus is never touched again."""
    from ..operators.text import bpe_ish_tokens

    d = load_tables(spark, sf_dir, "documents")
    m = d.groupBy("lang").agg(
        F.sum(F.size(bpe_ish_tokens("text")).cast("long"))
        .cast("long")
        .alias("n_tokens")
    )
    wall = Window.partitionBy()  # |langs|-sized frame (bounded)
    cur = m.select(
        "lang",
        "n_tokens",
        (F.col("n_tokens") * F.lit(_UMX_CAP_EPOCHS)).alias("cap"),
        F.lit(0).cast("long").alias("alloc"),
        # widen the corpus-total product to DECIMAL(38,0) before the
        # truncating division — mirrors the oracle's HUGEINT
        # widening (and doremi's decimal fix) so the two engines
        # agree past the ~3e18-token point where a plain BIGINT
        # product would wrap (r11 ADVICE)
        F.expr(
            f"CAST((CAST(sum(n_tokens) OVER () AS DECIMAL(38,0))"
            f" * {_UMX_BUDGET_NUM}) div {_UMX_BUDGET_DEN} AS BIGINT)"
        ).alias("r"),
    )
    for _t in range(_UMX_T):
        cur = (
            cur.withColumn(
                "n_open",
                F.sum((F.col("alloc") < F.col("cap")).cast("long")).over(
                    wall
                ),
            )
            .withColumn(
                "add_",
                F.when(
                    F.col("alloc") < F.col("cap"),
                    F.least(
                        F.col("cap") - F.col("alloc"),
                        F.expr("r div greatest(n_open, 1L)"),
                    ),
                ).otherwise(F.lit(0).cast("long")),
            )
            .withColumn("alloc", F.col("alloc") + F.col("add_"))
            .withColumn("r", F.col("r") - F.sum("add_").over(wall))
            .drop("n_open", "add_")
        )
    return cur.select(
        "lang",
        "n_tokens",
        F.col("cap").cast("long").alias("cap_tokens"),
        F.col("alloc").cast("long").alias("alloc_tokens"),
        (
            F.col("alloc").cast("double") / F.col("n_tokens").cast("double")
        ).alias("epochs"),
        (F.col("alloc") >= F.col("cap")).cast("long").alias("capped"),
    )


# --------------------------------------------------------------------------
# l-diversity: the sensitive-attribute refinement of k-anonymity.
# --------------------------------------------------------------------------

_LDIV_L = 3

_LDIV_ORACLE = f"""
    WITH g AS (
      SELECT c_mktsegment, CAST(c_nationkey AS INT) AS c_nationkey,
             CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS band,
             COUNT(*) AS n
      FROM customer
      GROUP BY 1, 2, 3
    )
    SELECT c_mktsegment, c_nationkey,
           CAST(SUM(n) AS BIGINT) AS group_size,
           CAST(COUNT(*) AS BIGINT) AS distinct_sensitive,
           CAST(MAX(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
             AS top_sensitive_share,
           CAST(CASE WHEN COUNT(*) >= {_LDIV_L} THEN 1 ELSE 0 END
                AS BIGINT) AS l_diverse
    FROM g
    GROUP BY 1, 2
    """


@register("l_diversity_report", _LDIV_ORACLE)
def l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit over the same quasi-identifier groups as
    `k_anonymity_report` (market segment × nation): k-anonymity
    alone is defeated by a homogeneous sensitive attribute (every
    member of a large group sharing one value leaks it anyway), so
    each group must also carry ≥ l distinct sensitive values — here
    the account-balance band — and the top-value share approximates
    the recursive (c,l) check. Release hygiene for user-derived
    training tables.

    Scale shape: two stacked hash aggregates (QI+sensitive, then
    QI) — one shuffle on the fine key, map-side combine does the
    rest; no joins, no windows."""
    c = load_tables(spark, sf_dir, "customer")
    g = c.groupBy(
        "c_mktsegment",
        F.col("c_nationkey").cast("int").alias("c_nationkey"),
        F.floor(F.col("c_acctbal") / F.lit(2000.0))
        .cast("long")
        .alias("band"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return g.groupBy("c_mktsegment", "c_nationkey").agg(
        F.sum("n").cast("long").alias("group_size"),
        F.count(F.lit(1)).cast("long").alias("distinct_sensitive"),
        (F.max("n").cast("double") / F.sum("n").cast("double")).alias(
            "top_sensitive_share"
        ),
        (F.count(F.lit(1)) >= F.lit(_LDIV_L))
        .cast("long")
        .alias("l_diverse"),
    )


# --------------------------------------------------------------------------
# Matryoshka production tier: IVF on the 16-dim prefix, full-dim
# rerank of the candidate set.
# --------------------------------------------------------------------------

_MIR_D = 16  # truncated index dimension
_MIR_RK = 25  # candidates reranked per query


def _mir_oracle() -> str:
    from .similarity import _COS, _NORM_CTE

    tcos = f"""list_reduce(
             list_transform(range(1, {_MIR_D + 1}),
               i -> CAST(q.embedding[i] AS DOUBLE)
                    * CAST(c.embedding[i] AS DOUBLE)),
             (acc, v) -> acc + v) / (q.nrm * c.nrm)"""
    return f"""
    WITH {_NORM_CTE},
    nt AS (
      SELECT vec_id, embedding,
             sqrt(list_reduce(
               list_transform(embedding[1:{_MIR_D}],
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (acc, v) -> acc + v)) AS nrm
      FROM embeddings
    ),
    cent AS (SELECT vec_id, embedding, nrm FROM nt
             ORDER BY vec_id LIMIT 16),
    asg AS (
      SELECT id, cell FROM (
        SELECT q.vec_id AS id, c.vec_id AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id ORDER BY {tcos} DESC, c.vec_id
               ) AS rnk
        FROM nt q CROSS JOIN cent c
      ) WHERE rnk = 1
    ),
    probe AS (
      SELECT qid, cell FROM (
        SELECT q.vec_id AS qid, c.vec_id AS cell,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id ORDER BY {tcos} DESC, c.vec_id
               ) AS rnk
        FROM nt q CROSS JOIN cent c
        WHERE q.vec_id < 10
      ) WHERE rnk <= 4
    ),
    cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY q.vec_id ORDER BY {tcos} DESC, c.vec_id
               ) AS rnk
        FROM probe p
        JOIN asg a ON a.cell = p.cell
        JOIN nt q ON q.vec_id = p.qid
        JOIN nt c ON c.vec_id = a.id
        WHERE c.vec_id != q.vec_id
      ) WHERE rnk <= {_MIR_RK}
    ),
    sims AS (
      SELECT cand.query_id, cand.neighbor_id, {_COS} AS cosine
      FROM cand
      JOIN n q ON q.vec_id = cand.query_id
      JOIN n c ON c.vec_id = cand.neighbor_id
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
      ) AS rank
      FROM sims
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked
    WHERE rank <= 5
    """


@register("ann_matryoshka_topk", _mir_oracle())
def ann_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production tier `matryoshka_recall_sweep` only sizes: IVF
    built entirely in the 16-of-64-dim prefix space (index bytes and
    probe flops ÷4), 25 candidates per query retrieved by truncated
    cosine inside 4 probed cells of 16, then ONLY those candidates
    reranked with the full-dim cosine — the standard two-stage
    retrieve-then-rerank. Everything corpus-sized runs truncated;
    full vectors are touched for 25·|queries| rows."""
    from ..operators.similarity import matryoshka_ivf_rerank

    em = load_tables(spark, sf_dir, "embeddings")
    return matryoshka_ivf_rerank(
        em,
        em.filter(F.col("vec_id") < 10),
        trunc_dim=_MIR_D,
        k=5,
        rerank_k=_MIR_RK,
        num_centroids=16,
        nprobe=4,
    )


# --------------------------------------------------------------------------
# Duplicated-span loss-mask manifest (the non-destructive consumer
# of the span family: mask instead of excise).
# --------------------------------------------------------------------------

_DSI_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
    ),
    sp AS (
      SELECT doc_id, i AS pos, i + {_SRW_W - 1} AS e,
             md5(array_to_string(t[i:i+{_SRW_W - 1}], ' ')) AS fp
      FROM base,
           UNNEST(range(1, greatest(len(t) - {_SRW_W - 2}, 1))) AS u(i)
    ),
{_span_sql.ownership_flagged('sp')},{_span_sql.numbered_islands('flg')}
    SELECT doc_id,
           CAST(MIN(pos) AS BIGINT) AS mask_start,
           CAST(MAX(e) AS BIGINT) AS mask_end,
           CAST(MAX(e) - MIN(pos) + 1 AS BIGINT) AS mask_tokens
    FROM isl2
    GROUP BY doc_id, island
    """


@register("dup_span_mask_manifest", _DSI_ORACLE)
def dup_span_mask_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The non-destructive consumer of the span-dedup family: instead
    of excising duplicated spans (`span_removal_rewrite`), emit the
    merged mask intervals — (doc, start, end) in 1-based token
    positions — that a trainer applies as LOSS MASKS, keeping the
    text intact for context but not paying gradient on text the
    model has already seen elsewhere. Same owner semantics as the
    rewrite (the min-id holder trains on its copy), so the two
    consumers can never disagree about which copy is canonical.

    Scale shape: identical to the rewrite minus the token explode
    and rebuild — one span explode, one fp hash-aggregate, island
    windows over the duplicated subset, output is islands-sized
    (collision mass, not corpus mass)."""
    from ..operators.dedup import (
        _flagged_islands,
        _owner_flagged_spans,
        _span_positions,
    )

    d = load_tables(spark, sf_dir, "documents")
    sp = _span_positions(d, "doc_id", "text", _SRW_W, None)
    flagged = _owner_flagged_spans(sp, "doc_id", _SRW_W)
    return _flagged_islands(flagged, "doc_id").select(
        "doc_id",
        F.col("__s").cast("long").alias("mask_start"),
        F.col("__e").cast("long").alias("mask_end"),
        (F.col("__e") - F.col("__s") + 1).cast("long").alias("mask_tokens"),
    )
