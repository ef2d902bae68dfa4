"""Lexical search over the corpus: inverted index + BM25 ranking.

The retrieval-side primitives a training-data pipeline needs next to
ANN: term-level corpus statistics (df/tf), and a rankable relevance
score for keyword probes (dataset exploration, contamination
checks, eval-set retrieval baselines).

Scale shape: the inverted index is ONE token explode + hash
aggregate — the same shuffle an aggregation pays, no per-document
state. BM25 scoring for a keyword probe touches only the posting
lists of the query's terms (an equi-join on token), never the whole
corpus; document-length norms come from a broadcast-sized side
aggregate.

Determinism: per-(doc, term) scores are fixed-order scalar IEEE
expressions; the per-document score SUM pivots the (small, literal)
query term list into columns added left-to-right, so no float
accumulation order is left to the engine. ``ln`` parity between JVM
and libm is the registry's monitored assumption (matched empirically
across every sweep since r02).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def inverted_index(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Posting-list table: (token, doc_id, tf) from a whitespace
    tokenization (lowercased, empty tokens dropped)."""
    return (
        df.select(
            F.col(id_col),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("token", id_col)
        .agg(F.count("*").alias("tf"))
    )


def doc_lengths(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, dl): token count per document (same tokenization as
    :func:`inverted_index`)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != ""
    )
    return df.select(F.col(id_col), F.size(toks).cast("long").alias("dl"))


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-*k* documents for a keyword query under BM25.

    idf(t) = ln(1 + (N - df_t + 0.5)/(df_t + 0.5)) (the Robertson/
    Sparck-Jones "+1" form — never negative), tf normalization
    tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)). avgdl is an exact
    integer-ratio double (SUM(dl)/N), so every score is a fixed
    expression over exact inputs.

    The query term list is a literal, so per-term scores become
    pivoted columns summed in list order — engine-independent float
    accumulation (see module docstring). Only the query terms'
    posting lists are read: cost ∝ matching postings, not corpus.

    idf is quantized to fixed-point (``floor(ln·1e8)/1e8``): JVM
    ``Math.log`` and libm ``ln`` differ by 1 ulp on real inputs
    (measured on this corpus), which would leak into every
    downstream product; after quantization a flip requires the ulp
    to straddle a 1e-8 grid boundary (~2e-8 probability per distinct
    (N, df) pair — a handful per query), and every other score
    component is exact integer-ratio arithmetic, so scores match
    bit-for-bit across engines. 8 digits of idf is far below any
    rank-relevant difference.
    """
    terms = sorted(set(query_terms))
    idx = inverted_index(df, id_col, text_col).filter(
        F.col("token").isin(terms)
    )
    # zero-token documents (empty/whitespace/NULL text) are excluded
    # from N and avgdl: they hold no terms, and the SQL oracle's
    # length table is derived from the non-empty token stream, so
    # counting them here would diverge the idf/norm inputs the
    # moment such a document exists
    dls = doc_lengths(df, id_col, text_col).filter(F.col("dl") > 0)
    stats = dls.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    dfreq = idx.groupBy("token").agg(
        F.countDistinct(id_col).alias("df_t")
    )

    posts = (
        idx.join(F.broadcast(dfreq), "token")
        .join(dls, id_col)
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    raw_idf = F.log(
        F.lit(1.0)
        + (
            (F.col("n_docs").cast("double") - F.col("df_t").cast("double") + F.lit(0.5))
            / (F.col("df_t").cast("double") + F.lit(0.5))
        )
    )
    idf = F.floor(raw_idf * F.lit(1e8)).cast("double") / F.lit(1e8)
    tf = F.col("tf").cast("double")
    norm = tf * F.lit(k1 + 1.0) / (
        tf
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
    )
    scored = posts.select(
        F.col(id_col), "token", (idf * norm).alias("s")
    )

    # pivot the literal term list into columns; sum left-to-right so
    # the float addition order is fixed on every engine
    per_doc = scored.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("token") == t, F.col("s"))).alias(f"__s_{i}")
            for i, t in enumerate(terms)
        ]
    )
    total = F.coalesce(F.col("__s_0"), F.lit(0.0))
    for i in range(1, len(terms)):
        total = total + F.coalesce(F.col(f"__s_{i}"), F.lit(0.0))
    return (
        per_doc.select(
            F.col(id_col),
            total.alias("score"),
            sum(
                (F.when(F.col(f"__s_{i}").isNotNull(), 1).otherwise(0)
                 for i in range(len(terms))),
                F.lit(0),
            ).cast("long").alias("n_terms_hit"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All document pairs with TF-IDF cosine ≥ *threshold* — the
    sparse lexical twin of the embedding near-dup pass (same output
    contract as ``embedding_cosine_pairs``: id_a < id_b, cosine).

    Scale shape: candidate pairs come from a posting-list self-join
    on token, so cost ∝ Σ_t df_t² over SHARED tokens only — and the
    *max_df* prune (drop tokens appearing in more than max_df docs)
    caps the quadratic term the way prefix-filtering caps Jaccard:
    ultra-common tokens contribute negligible idf weight but
    dominate join fan-out, so dropping them is both the accuracy-
    preserving and the cost-capping move. No cross join anywhere.

    Determinism: idf is ulp-quantized like :func:`bm25_topk`;
    per-document norms and per-pair dots fold over token-SORTED
    weight lists (``sort_array(collect_list(...))`` ≡ DuckDB
    ``list(... ORDER BY token)``), so every float accumulates in
    canonical order and the cosine is replayable bit-for-bit.
    """
    idx = inverted_index(df, id_col, text_col)
    # corpus size as a lazy 1-row broadcast (bm25_topk's stats
    # pattern) — an eager .count() here would run a full corpus scan
    # at DataFrame-BUILD time (plan audits, `query explain`) and a
    # second one at execution
    nd = df.agg(F.countDistinct(id_col).cast("double").alias("__n"))
    dfreq = (
        idx.groupBy("token")
        .agg(F.countDistinct(id_col).alias("df_t"))
        .crossJoin(F.broadcast(nd))
    )
    if max_df is not None:
        dfreq = dfreq.filter(F.col("df_t") <= max_df)
    raw_idf = F.log(F.col("__n") / F.col("df_t").cast("double"))
    idfq = F.floor(raw_idf * F.lit(1e8)).cast("double") / F.lit(1e8)
    weighted = idx.join(F.broadcast(dfreq), "token").select(
        F.col(id_col),
        "token",
        (F.col("tf").cast("double") * idfq).alias("w"),
    )
    norms = (
        weighted.groupBy(id_col)
        .agg(
            F.expr(
                "aggregate(sort_array(collect_list(struct(token, w))),"
                " 0D, (acc, x) -> acc + x.w * x.w)"
            ).alias("__n2")
        )
        .select(F.col(id_col), F.sqrt("__n2").alias("__norm"))
    )
    a = weighted.select(
        F.col(id_col).alias("id_a"), "token", F.col("w").alias("wa")
    )
    b = weighted.select(
        F.col(id_col).alias("id_b"), "token", F.col("w").alias("wb")
    )
    dots = (
        a.join(b, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.expr(
                "aggregate(sort_array(collect_list(struct(token, wa, wb))),"
                " 0D, (acc, x) -> acc + x.wa * x.wb)"
            ).alias("__dot")
        )
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("__norm").alias("__na"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("__norm").alias("__nb"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("__dot") / (F.col("__na") * F.col("__nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
    )


def hybrid_topk(
    docs: DataFrame,
    embs: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    n_candidates: int = 100,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval: BM25 candidate generation + embedding-cosine
    rerank — the standard two-stage pattern (cheap lexical recall,
    semantic precision on a bounded candidate set).

    Stage 1 runs :func:`bm25_topk` for *n_candidates* (posting-list
    cost only); stage 2 joins ONLY those candidates to their vectors
    and ranks by cosine against the query vector (row
    *query_vec_id*), so the expensive similarity math touches
    n_candidates rows regardless of corpus size. Both stages are the
    already-oracle-checked building blocks; ranking is cosine-desc
    with an id tiebreak.

    Output: (id, score, cosine, rank) — BM25 score kept for
    diagnostics/blending downstream.
    """
    from .dedup import dot_expr, with_norm

    cand = bm25_topk(
        docs, query_terms, k=n_candidates, id_col=id_col, text_col=text_col
    ).select(id_col, "score")
    n = with_norm(embs.select(vec_id_col, vec_col), vec_col)
    qv = (
        n.filter(F.col(vec_id_col) == query_vec_id)
        .select(
            F.col(vec_col).alias("__vq"), F.col("__norm").alias("__nq")
        )
    )
    scored = (
        cand.join(n, cand[id_col] == n[vec_id_col])
        .crossJoin(F.broadcast(qv))
        .select(
            F.col(id_col),
            "score",
            (
                dot_expr("__vq", vec_col)
                / (F.col("__nq") * F.col("__norm"))
            ).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked candidate lists:

        rrf(d) = 1/(k + rank_a(d)) + 1/(k + rank_b(d))

    (absent list contributes 0). The standard score-free way to merge
    lexical and vector retrieval — no score normalization to tune,
    robust to incomparable score scales, and exactly reproducible
    (integer ranks, one division per list, fixed addition order).

    Scale shape: a full outer join of two top-N lists (N rows each,
    broadcast-sized) + one top-k — never touches the corpus.

    Output: (id, rrf_score, rank_a, rank_b, fused_rank).
    """
    a = ranked_a.select(
        F.col(id_col).alias("__id"), F.col(rank_col).alias("rank_a")
    )
    b = ranked_b.select(
        F.col(id_col).alias("__id"), F.col(rank_col).alias("rank_b")
    )
    j = a.join(b, "__id", "full_outer")
    term = lambda c: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(k) + F.col(c)).cast("double"), F.lit(0.0)
    )
    scored = j.select(
        F.col("__id").alias(id_col),
        (term("rank_a") + term("rank_b")).alias("rrf_score"),
        "rank_a",
        "rank_b",
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return (
        scored.select(
            "*", F.row_number().over(w).alias("fused_rank")
        )
        .filter(F.col("fused_rank") <= top)
    )


def rm3_bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    n_fb: int = 5,
    m_expansion: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """RM3-style pseudo-relevance-feedback retrieval: run BM25, mine
    expansion terms from the top-*n_fb* feedback documents, re-rank
    with the expanded term set — the classic recall-boosting second
    pass (query "join" also surfaces docs that say "merge" when the
    feedback docs use both).

    Expansion-term weight: rel(t) = Σ_{d ∈ FB} (tf(t,d)/dl(d)) ·
    score(d) — the relevance-model estimate P(t|R) with the BM25
    score as the document weight. Each contribution is 1e-8
    floor-quantized and INTEGER-summed (order-free), so term
    selection replays exactly in SQL; the top-*m_expansion* terms by
    (weight desc, term asc), excluding the original query terms,
    join the query.

    Pass 2 scores the expanded set with the same quantized-idf BM25
    formula, but per-doc accumulation cannot pivot a literal term
    list (the set is data-dependent) — instead each per-term score
    is 1e-8 floor-quantized and integer-summed, the same order-free
    discipline.

    Scale shape: pass 1 touches only the query terms' posting lists;
    the feedback set is *n_fb* rows (broadcast); term mining scans
    the feedback docs' postings only (semi-join on the FB ids); pass
    2 touches (|Q| + m) posting lists. Nothing corpus-wide moves
    except the one posting-list/doc-length build both passes share.
    Output: (doc_id, score, n_terms_hit) — top-k, ties on id.
    """
    terms = sorted(set(query_terms))
    fb = bm25_topk(df, terms, k=n_fb, id_col=id_col,
                   text_col=text_col, k1=k1, b=b).select(
        id_col, F.col("score").alias("__fbs")
    )
    idx = inverted_index(df, id_col, text_col)
    dls = doc_lengths(df, id_col, text_col).filter(F.col("dl") > 0)
    # expansion-term mining over the feedback docs' postings only
    rel = (
        idx.join(F.broadcast(fb), id_col)
        .join(dls, id_col)
        .filter(~F.col("token").isin(terms))
        .select(
            "token",
            F.floor(
                (
                    (F.col("tf").cast("double") / F.col("dl").cast("double"))
                    * F.col("__fbs")
                )
                * F.lit(1e8)
            ).cast("decimal(38,0)").alias("__q"),
        )
        .groupBy("token")
        .agg(F.sum("__q").alias("__relq"))
    )
    wexp = Window.orderBy(F.desc("__relq"), F.asc("token"))
    expansion = (
        # bounded window: the candidate term table is FB-vocabulary
        # sized (n_fb docs' distinct tokens), not corpus-sized
        rel.withColumn("__r", F.row_number().over(wexp))
        .filter(F.col("__r") <= m_expansion)
        .select("token")
    )
    term_set = expansion.unionByName(
        df.sparkSession.createDataFrame(
            [(t,) for t in terms], "token string"
        )
    )
    # pass 2: same BM25 formula over the expanded set; per-doc sums
    # are quantized + integer-summed (order-free, data-dependent set)
    idx2 = idx.join(F.broadcast(term_set), "token")
    stats = dls.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    dfreq = idx2.groupBy("token").agg(
        F.countDistinct(id_col).alias("df_t")
    )
    posts = (
        idx2.join(F.broadcast(dfreq), "token")
        .join(dls, id_col)
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    raw_idf = F.log(
        F.lit(1.0)
        + (
            (F.col("n_docs").cast("double")
             - F.col("df_t").cast("double") + F.lit(0.5))
            / (F.col("df_t").cast("double") + F.lit(0.5))
        )
    )
    idf = F.floor(raw_idf * F.lit(1e8)).cast("double") / F.lit(1e8)
    tf = F.col("tf").cast("double")
    norm = tf * F.lit(k1 + 1.0) / (
        tf
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
    )
    per_doc = (
        posts.select(
            F.col(id_col),
            F.floor((idf * norm) * F.lit(1e8))
            .cast("decimal(38,0)")
            .alias("__sq"),
        )
        .groupBy(id_col)
        .agg(
            (F.sum("__sq").cast("double") / F.lit(1e8)).alias("score"),
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        )
    )
    return per_doc.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
