"""Dedup queries over the `documents`/`embeddings` tables, each with
a DuckDB oracle (BASELINE.json north-star: dedup suite).

All hashing is md5-based so Spark and DuckDB agree bit-for-bit; see
:mod:`..operators.dedup` for the determinism rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from ..session import load_tables
from . import register

# shared oracle CTE: distinct word-3-gram shingles per doc


def _shingles_cte(max_doc_id: int | None = None) -> str:
    """The shared shingle CTEs, optionally restricted to the
    deterministic ``doc_id < max_doc_id`` stratum (the band-sweep
    calibration audit runs on a fixed-size stratum — quadratic in
    the SAMPLE, constant in the corpus)."""
    where = "" if max_doc_id is None else f" WHERE doc_id < {max_doc_id}"
    return f"""
  toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
           FROM documents{where}),
  sh AS (
    SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
    FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
  ),
  sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id)
"""


_SHINGLES_CTE = _shingles_cte()

_JACCARD_TAIL = """
  SELECT i.id_a, i.id_b,
         i.n_inter * 1.0 / (sa.sz + sb.sz - i.n_inter) AS jaccard
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.id_a
  JOIN sizes sb ON sb.doc_id = i.id_b
  WHERE i.n_inter * 1.0 / (sa.sz + sb.sz - i.n_inter) >= 0.8
"""


# --------------------------------------------------------------------------
# exact dedup — on a corpus with injected duplicates so the operator
# visibly collapses something (base documents are all distinct)
# --------------------------------------------------------------------------
@register(
    "exact_dedup",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
    )
    SELECT min(doc_id) AS doc_id, md5(text) AS fingerprint,
           COUNT(*) AS n_copies
    FROM corpus GROUP BY md5(text)
    """,
)
def exact_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    corpus = d.unionByName(dupes)
    return exact_dedup(corpus, "text", "doc_id")


# --------------------------------------------------------------------------
# exact pairwise n-gram Jaccard (O(n²) baseline)
# --------------------------------------------------------------------------
@register(
    "ngram_jaccard_pairs",
    f"""
    WITH {_SHINGLES_CTE},
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    {_JACCARD_TAIL}
    """,
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8)


# --------------------------------------------------------------------------
# MinHash + LSH banding → candidates → verified Jaccard (scale path)
# --------------------------------------------------------------------------
@register(
    "minhash_dedup_pairs",
    f"""
    WITH {_SHINGLES_CTE},
    seeds AS (SELECT UNNEST(range(0, 8)) AS seed),
    sig AS (
      SELECT doc_id, seed,
             MIN(md5(CAST(seed AS VARCHAR) || ':' || shingle)) AS sig
      FROM sh, seeds GROUP BY doc_id, seed
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
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    inter_c AS (
      SELECT i.* FROM inter i
      WHERE EXISTS (SELECT 1 FROM cand c
                    WHERE c.id_a = i.id_a AND c.id_b = i.id_b)
    )
    SELECT i.id_a, i.id_b,
           i.n_inter * 1.0 / (sa.sz + sb.sz - i.n_inter) AS jaccard
    FROM inter_c i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.n_inter * 1.0 / (sa.sz + sb.sz - i.n_inter) >= 0.8
    """,
)
def minhash_dedup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        d, "doc_id", "text", n=3, num_hashes=8, band_size=2, threshold=0.8
    )


# --------------------------------------------------------------------------
# near-dup clusters: pair list → connected components → keep list
# (oracle: transitive closure via recursive CTE, min id per component)
# --------------------------------------------------------------------------
@register(
    "near_dup_clusters",
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
    )
    SELECT id, MIN(r) AS cluster_rep FROM reach GROUP BY id
    """,
)
def near_dup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dedup_clusters

    d = load_tables(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8)
    return dedup_clusters(pairs).select(
        F.col("id").cast("bigint").alias("id"),
        F.col("cluster_rep").cast("bigint").alias("cluster_rep"),
    )


# --------------------------------------------------------------------------
# SimHash fingerprints + near-dup pairs by Hamming distance
# --------------------------------------------------------------------------
_SIMHASH_CTE = """
  tokc AS (
    SELECT doc_id, token, COUNT(*) AS cnt FROM (
      SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS token
      FROM documents
    ) GROUP BY doc_id, token
  ),
  bits AS (SELECT UNNEST(range(1, 33)) AS bit),
  votes AS (
    SELECT doc_id, bit,
           cnt * ((ascii(substr(md5(token), CAST(bit AS INT), 1)) % 2) * 2 - 1)
             AS vote
    FROM tokc, bits
  ),
  sums AS (SELECT doc_id, bit, SUM(vote) AS s FROM votes GROUP BY doc_id, bit),
  fp AS (
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0
                         THEN CAST(1 AS BIGINT) << (CAST(bit AS INT) - 1)
                         ELSE 0 END)
                AS BIGINT) AS simhash
    FROM sums GROUP BY doc_id
  )
"""


@register(
    "simhash_fingerprints",
    f"WITH {_SIMHASH_CTE} SELECT doc_id, simhash FROM fp",
)
def simhash_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")
    return simhash(d, "doc_id", "text", bits=32).select(
        "doc_id", F.col("simhash").cast("bigint").alias("simhash")
    )


@register(
    "simhash_near_pairs",
    f"""
    WITH {_SIMHASH_CTE}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
    """,
)
def simhash_near_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    # pigeonhole-blocked form (equi-join on fingerprint chunks) — the
    # brute crossJoin variant stays in the library as the verifier
    from ..operators.dedup import simhash_chunk_pairs

    d = load_tables(spark, sf_dir, "documents")
    out = simhash_chunk_pairs(d, "doc_id", "text", bits=32, max_hamming=1)
    return out.select("id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming"))


# --------------------------------------------------------------------------
# embedding cosine near-dup pairs (brute-force verifier form)
# --------------------------------------------------------------------------
@register(
    "embedding_cosine_pairs",
    """
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_reduce(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (acc, v) -> acc + v)) AS nrm
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_reduce(
             list_transform(range(1, 65),
               i -> CAST(a.embedding[i] AS DOUBLE)
                    * CAST(b.embedding[i] AS DOUBLE)),
             (acc, v) -> acc + v) / (a.nrm * b.nrm) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE list_reduce(
            list_transform(range(1, 65),
              i -> CAST(a.embedding[i] AS DOUBLE)
                   * CAST(b.embedding[i] AS DOUBLE)),
            (acc, v) -> acc + v) / (a.nrm * b.nrm) >= 0.46
    """,
)
def embedding_cosine_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_tables(spark, sf_dir, "embeddings")
    return embedding_cosine_pairs(em, "vec_id", "embedding", threshold=0.46)


# --------------------------------------------------------------------------
# embedding near-dup via multi-table LSH (the no-cross-join scale path)
# --------------------------------------------------------------------------


def _duck_bucket_expr(planes: list[int]) -> str:
    """DuckDB bucket expression mirroring similarity._plane_weights_expr."""
    cases = " + ".join(
        f"""CASE WHEN list_reduce(list_transform(range(1, 65),
          d -> CAST(embedding[d] AS DOUBLE)
               * ((ascii(substr(md5('p{p}_' || CAST(d AS VARCHAR)), 1, 1))
                   % 2) * 2 - 1)),
          (acc, v) -> acc + v) > 0 THEN {1 << i} ELSE 0 END"""
        for i, p in enumerate(planes)
    )
    return f"CAST(({cases}) AS BIGINT)"


_LSH_TABLES_SQL = ",\n".join(
    f"{_duck_bucket_expr([2 * t, 2 * t + 1])} AS b{t}" for t in range(3)
)


@register(
    "embedding_lsh_dup_pairs",
    f"""
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_reduce(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (acc, v) -> acc + v)) AS nrm,
             {_LSH_TABLES_SQL}
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           list_reduce(
             list_transform(range(1, 65),
               i -> CAST(a.embedding[i] AS DOUBLE)
                    * CAST(b.embedding[i] AS DOUBLE)),
             (acc, v) -> acc + v) / (a.nrm * b.nrm) AS cosine
    FROM n a JOIN n b
      ON a.vec_id < b.vec_id
     AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2)
    WHERE list_reduce(
            list_transform(range(1, 65),
              i -> CAST(a.embedding[i] AS DOUBLE)
                   * CAST(b.embedding[i] AS DOUBLE)),
            (acc, v) -> acc + v) / (a.nrm * b.nrm) >= 0.46
    """,
)
def embedding_lsh_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import embedding_lsh_dup_pairs

    em = load_tables(spark, sf_dir, "embeddings")
    return embedding_lsh_dup_pairs(
        em, "vec_id", "embedding", threshold=0.46, num_planes=2, num_tables=3
    )


# --------------------------------------------------------------------------
# blocked fuzzy matching — entity resolution over parts: block on
# (brand, size), verify with Levenshtein ≤ 8. Edit distance is an
# integer DP — exact in every engine.
# --------------------------------------------------------------------------
@register(
    "fuzzy_part_name_pairs",
    """
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           levenshtein(lower(a.p_name), lower(b.p_name)) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(lower(a.p_name), lower(b.p_name)) <= 8
    """,
)
def fuzzy_part_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import blocked_fuzzy_pairs

    p = load_tables(spark, sf_dir, "part")
    return blocked_fuzzy_pairs(
        p, "p_partkey", "p_name", ["p_brand", "p_size"], max_dist=8
    )


# --------------------------------------------------------------------------
# AllPairs/PPJoin prefix filtering — the EXACT scale path for the
# same ≥0.8 Jaccard join. The oracle is deliberately the brute-force
# SQL: prefix filtering must be lossless, and the hash match IS the
# proof (identical pairs, identical jaccard values).
# --------------------------------------------------------------------------
@register(
    "prefix_jaccard_pairs",
    f"""
    WITH {_SHINGLES_CTE},
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    {_JACCARD_TAIL}
    """,
)
def prefix_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import prefix_filter_jaccard_pairs

    d = load_tables(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.8)


# --------------------------------------------------------------------------
# Quality-aware representative selection: within each exact-dup
# cluster keep the BEST copy by an explicit priority, not the
# arbitrary min-id — the policy real corpus dedup wants (keep the
# longest / cleanest / most recent copy). Priority here is
# doc_id-derived so injected copies genuinely differ and ties still
# break deterministically (priority desc, doc_id asc).
# --------------------------------------------------------------------------
@register(
    "dedup_keep_best",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
    ),
    scored AS (
      SELECT doc_id, text, md5(text) AS fingerprint,
             CAST(doc_id % 7 AS DOUBLE) AS priority
      FROM corpus
    ),
    ranked AS (
      SELECT doc_id, fingerprint, priority,
             ROW_NUMBER() OVER (
               PARTITION BY fingerprint ORDER BY priority DESC, doc_id
             ) AS rn,
             COUNT(*) OVER (PARTITION BY fingerprint) AS n_copies
      FROM scored
    )
    SELECT doc_id, fingerprint, priority, n_copies
    FROM ranked WHERE rn = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_tables(spark, sf_dir, "documents").select("doc_id", "text")
    dupes = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    corpus = d.unionByName(dupes)
    scored = corpus.select(
        "doc_id",
        F.md5("text").alias("fingerprint"),
        (F.col("doc_id") % 7).cast("double").alias("priority"),
    )
    w = Window.partitionBy("fingerprint").orderBy(
        F.desc("priority"), F.asc("doc_id")
    )
    wc = Window.partitionBy("fingerprint")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("n_copies", F.count("*").over(wc))
        .filter(F.col("rn") == 1)
        .select("doc_id", "fingerprint", "priority", "n_copies")
    )


# --------------------------------------------------------------------------
# Incremental dedup: a delta of new documents (exact copies of every
# 7th doc, re-keyed +20000) lands on an existing corpus; only
# delta-involving near-dup pairs are produced — base×base is never
# re-paired (operators.dedup.incremental_lsh_pairs). The oracle
# states the ground truth directly: all pairs with Jaccard ≥ 0.8
# over the augmented corpus where one side is a delta doc. A copy
# shares its original's MinHash signature, so every delta-involving
# truth pair collides in the same bands the full run's (oracle-
# verified) pairs do.
# --------------------------------------------------------------------------
@register(
    "incremental_dedup_pairs",
    """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 20000 AS doc_id, text FROM documents
      WHERE doc_id % 7 = 0
    ),
    toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM corpus
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
      FROM toks, UNNEST(range(1, greatest(len(t) - 1, 1))) AS u(i)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      WHERE a.doc_id >= 20000 OR b.doc_id >= 20000
      GROUP BY 1, 2
    )
    SELECT i.id_a, i.id_b,
           i.n_inter * 1.0 / (sa.sz + sb.sz - i.n_inter) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE i.n_inter * 1.0 / (sa.sz + sb.sz - i.n_inter) >= 0.8
    """,
)
def incremental_dedup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import incremental_lsh_pairs

    d = load_tables(spark, sf_dir, "documents").select("doc_id", "text")
    delta = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 20000).alias("doc_id"), "text"
    )
    return incremental_lsh_pairs(
        d, delta, "doc_id", "text", n=3, num_hashes=8, band_size=2,
        threshold=0.8,
    )
