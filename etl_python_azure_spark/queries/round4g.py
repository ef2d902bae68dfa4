"""Round-4g registry surface: corpus signatures and PCA
composition.

- per-source tf-idf signature terms (the "what does this source
  talk about" audit a corpus mix review reads)
- per-label statistics of the top-PC projection (anisotropy audit:
  applies the learned component back to the corpus — composes the
  `pca_top_component` trajectory with a projection + moments pass)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_tables
from . import register
from .round4d import _PCA_DIM, _PCA_ITERS, _pca_cte_chain

# --------------------------------------------------------------------------
# Per-source tf-idf signature terms.
# --------------------------------------------------------------------------
_SIG_TOP = 5


@register(
    "source_signature_terms",
    f"""
    WITH tf AS (
      SELECT source, t.token, COUNT(*) AS tf
      FROM documents,
           UNNEST(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
      GROUP BY source, t.token
    ),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    s AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS s
          FROM documents),
    scored AS (
      SELECT tf.source, tf.token, tf.tf, df.df,
             (CAST(tf.tf AS DOUBLE)
              * (floor(ln(CAST(s.s AS DOUBLE) / CAST(df.df AS DOUBLE))
                       * CAST(1e8 AS DOUBLE))
                 / CAST(1e8 AS DOUBLE))) AS score
      FROM tf JOIN df USING (token) CROSS JOIN s
    )
    SELECT source, token AS term, CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df, score, CAST(rnk AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY source ORDER BY score DESC, token ASC) AS rnk
      FROM scored
    ) WHERE rnk <= {_SIG_TOP}
    """,
)
def source_signature_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 tf-idf terms per source — the domain-signature audit of
    a corpus mix (a source whose signature terms are boilerplate is
    a dedup/quality problem; one whose terms drift between snapshots
    changed its crawl). Two hash aggregates over one token explode +
    a per-source top-k window; idf on the 1e-8 ln grid."""
    d = load_tables(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    s = d.agg(F.countDistinct("source").alias("s"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(s))
        .select(
            "source",
            "token",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * (
                    F.floor(
                        F.log(
                            F.col("s").cast("double")
                            / F.col("df").cast("double")
                        )
                        * F.lit(1e8)
                    )
                    / F.lit(1e8)
                )
            ).alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("score"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _SIG_TOP)
        .select(
            "source",
            F.col("token").alias("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
            F.col("rank").cast("int").alias("rank"),
        )
    )


# --------------------------------------------------------------------------
# Per-label stats of the top-PC projection.
# --------------------------------------------------------------------------
def _proj_oracle(dim: int, iters: int) -> str:
    ctes, vfinal = _pca_cte_chain(dim, iters)
    ctes.append(f"""pr AS (
      SELECT e.vec_id,
             (CAST(CAST(SUM(CAST(floor(e.x * v.v * CAST(1e12 AS DOUBLE))
                   AS BIGINT)) AS VARCHAR) AS DOUBLE)
              / CAST(1e12 AS DOUBLE)) AS p
      FROM ex e JOIN {vfinal} v ON e.i = v.i
      GROUP BY e.vec_id
    )""")
    ctes.append("""st AS (
      SELECT lb.label, COUNT(*) AS n,
             CAST(SUM(CAST(floor(p * 1e10) AS BIGINT)) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * 1e10) AS mean_proj,
             CAST(SUM(CAST(floor(p * p * 1e10) AS BIGINT)) AS DOUBLE)
               / (CAST(COUNT(*) AS DOUBLE) * 1e10) AS msq
      FROM pr JOIN embeddings lb USING (vec_id)
      GROUP BY lb.label
    )""")
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT label, CAST(n AS BIGINT) AS n, mean_proj,
           (msq - mean_proj * mean_proj) AS var_proj
    FROM st
    """
    )


@register(
    "label_projection_stats", _proj_oracle(_PCA_DIM, _PCA_ITERS)
)
def label_projection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/variance of the top-principal-component projection per
    label — the anisotropy audit that APPLIES the learned PCA back
    to the corpus (labels whose projections separate cleanly on the
    top axis are what the label-noise scan exploits; overlapping
    ones say the dominant variance is label-independent). The oracle
    replays training AND application end to end; the Spark side
    reuses the fit-once component (`round4d._pca_comp1`)."""
    from ..operators.pca import project_onto_component
    from ..operators.similarity import fixed_point_mean
    from .round4d import _pca_comp1

    em = load_tables(spark, sf_dir, "embeddings")
    comp = _pca_comp1(spark, sf_dir)
    proj = project_onto_component(em, comp)
    st = (
        proj.join(em.select("vec_id", "label"), "vec_id")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            fixed_point_mean(F.col("proj"), "mean_proj", 1e10),
            fixed_point_mean(
                F.col("proj") * F.col("proj"), "msq", 1e10
            ),
        )
    )
    return st.select(
        "label",
        "n",
        "mean_proj",
        (
            F.col("msq") - F.col("mean_proj") * F.col("mean_proj")
        ).alias("var_proj"),
    )
