"""Round-4h registry surface: classifier evaluation and global rank
features.

- language-ID confusion matrix (the heuristic classifier evaluated
  against the ground-truth lang column — per-pair counts plus
  overall accuracy)
- reliability (calibration) bins for the embedding-projection
  scorer: predicted-score deciles vs observed positive rate
- co-occurrence recommender hit-rate@1: recommend each basket's
  top-lift partner item and measure how often it is present — the
  self-evaluation loop over `event_pair_rules`' association table
- global rank-normalized value summary per event type (quantile /
  rank transform over the TOTAL order via the two-pass
  `global_row_number`, never a single-partition window)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import load_tables
from . import register

# --------------------------------------------------------------------------
# Language-ID confusion matrix.
# --------------------------------------------------------------------------
_LANG_STOP_SQL = """
    stop(token, lang) AS (
      VALUES
        ('the','en'),('a','en'),('of','en'),('and','en'),('to','en'),
        ('in','en'),('is','en'),('it','en'),('for','en'),('on','en'),
        ('el','es'),('la','es'),('de','es'),('y','es'),('que','es'),
        ('en','es'),('un','es'),('una','es'),('por','es'),('con','es'),
        ('der','de'),('die','de'),('das','de'),('und','de'),('ist','de'),
        ('ein','de'),('eine','de'),('zu','de'),('mit','de'),('von','de'),
        ('le','fr'),('la','fr'),('de','fr'),('et','fr'),('un','fr'),
        ('une','fr'),('est','fr'),('pour','fr'),('que','fr'),('dans','fr')
    )
"""


@register(
    "lang_id_confusion",
    f"""
    WITH {_LANG_STOP_SQL},
    toks AS (
      SELECT doc_id, t.token FROM documents,
        UNNEST(string_split(lower(text), ' ')) AS t(token)
    ),
    hits AS (
      SELECT toks.doc_id, stop.lang, COUNT(*) AS n_hits
      FROM toks JOIN stop ON toks.token = stop.token
      GROUP BY toks.doc_id, stop.lang
    ),
    best AS (
      SELECT doc_id, lang AS lang_guess FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY doc_id ORDER BY n_hits DESC, lang ASC) AS rn
        FROM hits
      ) WHERE rn = 1
    ),
    labeled AS (
      SELECT d.lang AS lang_true,
             COALESCE(b.lang_guess, 'und') AS lang_guess
      FROM documents d LEFT JOIN best b USING (doc_id)
    ),
    cm AS (
      SELECT lang_true, lang_guess, COUNT(*) AS n
      FROM labeled GROUP BY lang_true, lang_guess
    ),
    acc AS (
      SELECT (CAST(SUM(CASE WHEN lang_true = lang_guess THEN n
                       ELSE 0 END) AS DOUBLE)
              / CAST(SUM(n) AS DOUBLE)) AS accuracy
      FROM cm
    )
    SELECT lang_true, lang_guess, CAST(n AS BIGINT) AS n, acc.accuracy
    FROM cm CROSS JOIN acc
    """,
)
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword language-ID heuristic
    against the ground-truth `lang` column, with overall accuracy —
    the evaluation every classifier in a data pipeline owes its
    operators. One explode + broadcast dim join + two aggregates."""
    from ..operators.text import language_id

    d = load_tables(spark, sf_dir, "documents")
    guessed = language_id(d)
    labeled = d.select("doc_id", F.col("lang").alias("lang_true")).join(
        guessed.select("doc_id", "lang_guess"), "doc_id"
    )
    cm = labeled.groupBy("lang_true", "lang_guess").agg(
        F.count(F.lit(1)).alias("n")
    )
    acc = cm.agg(
        (
            F.sum(
                F.when(
                    F.col("lang_true") == F.col("lang_guess"), F.col("n")
                ).otherwise(F.lit(0))
            ).cast("double")
            / F.sum("n").cast("double")
        ).alias("accuracy")
    )
    return cm.crossJoin(F.broadcast(acc)).select(
        "lang_true",
        "lang_guess",
        F.col("n").cast("long").alias("n"),
        "accuracy",
    )


# --------------------------------------------------------------------------
# Reliability (calibration) bins.
# --------------------------------------------------------------------------
_CAL_BINS = 10

# the SAME scorer quality_pr_curve sweeps (shared SQL text + shared
# Spark expression — review catch: a drifting copy would calibrate a
# different scorer than the one being swept)
from .round4e import _PR_PROJ as _CAL_PROJ  # noqa: E402


@register(
    "score_reliability_bins",
    f"""
    WITH base AS (
      SELECT {_CAL_PROJ} AS s,
             CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
      FROM embeddings
    ),
    span AS (SELECT MIN(s) AS mn, MAX(s) AS mx FROM base),
    binned AS (
      SELECT CASE WHEN sv.mx = sv.mn THEN 0
                  ELSE CAST(least({_CAL_BINS - 1}, CAST(floor(
                    (b.s - sv.mn) / (sv.mx - sv.mn)
                    * CAST({_CAL_BINS} AS DOUBLE)) AS INT)) AS INT)
             END AS bin,
             b.s, b.y
      FROM base b CROSS JOIN span sv
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
           (CAST(SUM(CAST(floor(s * CAST(1e10 AS DOUBLE)) AS BIGINT))
                 AS DOUBLE)
            / (CAST(COUNT(*) AS DOUBLE) * CAST(1e10 AS DOUBLE)))
             AS mean_score,
           (CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
             AS positive_rate
    FROM binned GROUP BY bin
    """,
)
def score_reliability_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table of the embedding-projection scorer: bucket
    the observed score range into deciles and report each bucket's
    mean score vs observed positive rate — the calibration diagram
    behind "can we read this score as a probability". Same
    deterministic equal-width binning discipline as the PSI monitor;
    mean scores are fixed-point exact."""
    em = load_tables(spark, sf_dir, "embeddings")
    from ..operators.similarity import fixed_point_mean, plane_projection

    proj = plane_projection(0, 64)
    base = em.select(
        proj.alias("s"),
        F.when(F.col("label") == 0, 1).otherwise(0).alias("y"),
    )
    span = base.agg(F.min("s").alias("mn"), F.max("s").alias("mx"))
    binned = base.crossJoin(F.broadcast(span)).select(
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(_CAL_BINS - 1),
                F.floor(
                    (F.col("s") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * F.lit(float(_CAL_BINS))
                ).cast("int"),
            )
        )
        .alias("bin"),
        "s",
        "y",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        fixed_point_mean(F.col("s"), "mean_score", 1e10),
        (
            F.sum("y").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("positive_rate"),
    )


# --------------------------------------------------------------------------
# Co-occurrence recommender hit-rate@1.
# --------------------------------------------------------------------------
@register(
    "cooccurrence_rec_hitrate",
    """
    WITH it AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
      FROM events
    ),
    cnt AS (SELECT event_type, COUNT(*) AS c FROM it GROUP BY 1),
    nb AS (
      SELECT COUNT(*) AS n FROM (SELECT DISTINCT user_id, d FROM it)
    ),
    p AS (
      SELECT a.event_type AS item_a, b.event_type AS item_b,
             COUNT(*) AS n_xy
      FROM it a JOIN it b
        ON a.user_id = b.user_id AND a.d = b.d
       AND a.event_type < b.event_type
      GROUP BY 1, 2
    ),
    rules AS (
      SELECT item_a AS antecedent, item_b AS rec,
             (CAST(n_xy * nb.n AS DOUBLE)
              / CAST(x.c * y.c AS DOUBLE)) AS lift
      FROM p JOIN cnt x ON x.event_type = p.item_a
             JOIN cnt y ON y.event_type = p.item_b
             CROSS JOIN nb
      UNION ALL
      SELECT item_b AS antecedent, item_a AS rec,
             (CAST(n_xy * nb.n AS DOUBLE)
              / CAST(x.c * y.c AS DOUBLE)) AS lift
      FROM p JOIN cnt x ON x.event_type = p.item_a
             JOIN cnt y ON y.event_type = p.item_b
             CROSS JOIN nb
    ),
    best AS (
      SELECT antecedent, rec FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY antecedent ORDER BY lift DESC, rec ASC) AS rn
        FROM rules
      ) WHERE rn = 1
    ),
    evald AS (
      SELECT i.user_id, i.d, i.event_type AS antecedent, b.rec,
             CASE WHEN EXISTS (
               SELECT 1 FROM it i2
               WHERE i2.user_id = i.user_id AND i2.d = i.d
                 AND i2.event_type = b.rec
             ) THEN 1 ELSE 0 END AS hit
      FROM it i JOIN best b ON b.antecedent = i.event_type
    )
    SELECT antecedent, rec AS recommended,
           CAST(COUNT(*) AS BIGINT) AS n_impressions,
           CAST(SUM(hit) AS BIGINT) AS n_hits,
           (CAST(SUM(hit) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
             AS hit_rate
    FROM evald GROUP BY antecedent, rec
    """,
)
def cooccurrence_rec_hitrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hit-rate@1 of the lift-based co-occurrence recommender: for
    every (basket, item) impression, recommend the item's top-lift
    partner (symmetrized from `basket_pair_stats`) and check whether
    the same basket contains it — the self-evaluation loop a
    co-occurrence recommender ships with. The EXISTS probe is a
    left-semi join on the basket key."""
    from ..operators.baskets import basket_pair_stats

    e = load_tables(spark, sf_dir, "events")
    items = e.select(
        "user_id", F.to_date("ts").alias("d"), "event_type"
    ).distinct()
    stats = basket_pair_stats(
        items, ["user_id", "d"], "event_type", assume_distinct=True
    )
    rules = stats.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("rec"),
        "lift",
    ).unionByName(
        stats.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("rec"),
            "lift",
        )
    )
    w = Window.partitionBy("antecedent").orderBy(
        F.desc("lift"), F.asc("rec")
    )
    best = (
        rules.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("antecedent", "rec")
    )
    impressions = items.join(
        F.broadcast(best),
        items.event_type == F.col("antecedent"),
    ).select("user_id", "d", "antecedent", "rec")
    # one LEFT join replaces the former semi+anti pair (which probed
    # the identical join twice): items is distinct on (user_id, d,
    # event_type), so a match is unique and `hit` is its indicator
    evald = impressions.join(
        items.select(
            "user_id",
            "d",
            F.col("event_type").alias("rec"),
            F.lit(1).alias("__m"),
        ),
        ["user_id", "d", "rec"],
        "left",
    ).withColumn("hit", F.coalesce("__m", F.lit(0)))
    return evald.groupBy(
        "antecedent", F.col("rec").alias("recommended")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_impressions"),
        F.sum("hit").cast("long").alias("n_hits"),
        (
            F.sum("hit").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("hit_rate"),
    )


# --------------------------------------------------------------------------
# Global rank-normalized value summary.
# --------------------------------------------------------------------------
@register(
    "rank_normalized_value_by_type",
    """
    WITH rn AS (
      SELECT event_type,
             ROW_NUMBER() OVER (
               ORDER BY CAST(value AS DOUBLE) NULLS FIRST, event_id)
               AS rn,
             COUNT(*) OVER () AS n
      FROM events
    ),
    q AS (
      SELECT event_type,
             (CAST(rn - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)) AS r
      FROM rn
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           (CAST(SUM(CAST(floor(r * CAST(1e10 AS DOUBLE)) AS BIGINT))
                 AS DOUBLE)
            / (CAST(COUNT(*) AS DOUBLE) * CAST(1e10 AS DOUBLE)))
             AS mean_rank
    FROM q GROUP BY event_type
    """,
)
def rank_normalized_value_by_type(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mean GLOBAL rank-normalized value per event type — the
    quantile/rank transform (to [0, 1]) every robust feature
    pipeline applies before mixing heterogeneous scales, summarized
    per type (a type whose mean rank ≫ 0.5 carries systematically
    large values). The global total-order rank comes from the
    two-pass `global_row_number` — the oracle's bare
    `ROW_NUMBER() OVER (ORDER BY …)` is the semantics, never the
    plan."""
    from ..operators.dedup import global_row_number
    from ..operators.similarity import fixed_point_mean

    e = load_tables(spark, sf_dir, "events")
    base = e.select(
        "event_type",
        F.col("value").cast("double").alias("v"),
        "event_id",
    )
    rn = global_row_number(base, ["v", "event_id"], out_col="rn")
    # max(rn) == n, read from the frame global_row_number already
    # persisted — not a second scan of the fact table (review catch)
    n1 = rn.agg(F.max("rn").alias("__n"))
    q = rn.crossJoin(F.broadcast(n1)).select(
        "event_type",
        (
            (F.col("rn") - 1).cast("double")
            / (F.col("__n") - 1).cast("double")
        ).alias("r"),
    )
    return q.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        fixed_point_mean(F.col("r"), "mean_rank", 1e10),
    )
